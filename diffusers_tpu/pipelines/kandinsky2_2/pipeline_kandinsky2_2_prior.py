"""Kandinsky 2.2 diffusion-prior pipeline (text → CLIP image embedding).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/kandinsky2_2/pipeline_kandinsky2_2_prior.py`):
CLIP text conditioning (pooled + hidden states + mask), UnCLIP-scheduled
denoise over the image-embedding vector with explicit prev_timestep, final
de-normalization via the prior's clip mean/std, zero image embeds for the
negative branch. TPU-first: per-step jit (the loop is tiny — embeddings, not
images).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class KandinskyV22PriorPipelineOutput(BaseOutput):
    image_embeds: jax.Array
    negative_image_embeds: jax.Array


class KandinskyV22PriorPipeline(DiffusionPipeline):
    _optional_components = ["image_encoder", "image_processor"]

    def __init__(self, prior, image_encoder, text_encoder, tokenizer, scheduler, image_processor=None):
        super().__init__()
        self.register_modules(
            prior=prior, text_encoder=text_encoder, tokenizer=tokenizer,
            scheduler=scheduler, image_encoder=image_encoder, image_processor=image_processor,
        )

    def _encode_prompt(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") else jnp.ones_like(ids)
        out = text_encoder(te_params, ids)
        return out.text_embeds, out.last_hidden_state, mask

    def __call__(
        self,
        prompt: Union[str, List[str]],
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_inference_steps: int = 25,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        prior, prior_params = self.prior
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = guidance_scale > 1.0

        prompt_embeds, hidden_states, text_mask = self._encode_prompt(prompt)
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_hidden, neg_mask = self._encode_prompt(negative_prompt)
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            hidden_states = jnp.concatenate([neg_hidden, hidden_states], axis=0)
            text_mask = jnp.concatenate([neg_mask, text_mask], axis=0)

        batch_size = len(prompt)
        embedding_dim = prior.config.embedding_dim
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, embedding_dim), key=lat_key)
        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        timesteps = np.asarray(state.timesteps)

        # per-instance jit cache (a bare @jax.jit here retraces every call)
        def one_step(prior_params, prompt_embeds, hidden_states, text_mask,
                     sstate, latents, t, prev_t, step_key, guidance_scale):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            pred = prior(
                prior_params, latent_input, t,
                proj_embedding=prompt_embeds,
                encoder_hidden_states=hidden_states,
                attention_mask=text_mask,
            ).predicted_image_embedding
            if do_cfg:
                uncond, text = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (text - uncond)
            out = self.scheduler.step(sstate, pred, t, latents, prev_timestep=prev_t, key=step_key)
            return out.state, out.prev_sample

        _one_step = self._jit("prior_one_step", one_step, static=(do_cfg,))
        one_step = lambda sstate, latents, t, prev_t, step_key: _one_step(
            prior_params, prompt_embeds, hidden_states, text_mask,
            sstate, latents, t, prev_t, step_key, guidance_scale)

        sstate = state
        for i, t in enumerate(timesteps):
            prev_t = timesteps[i + 1] if i + 1 < len(timesteps) else None
            key, step_key = jax.random.split(key)
            sstate, latents = one_step(sstate, latents, t, prev_t, step_key)

        latents = prior.post_process_latents(prior_params, latents)

        # negative output: encoder zero-image embeds (reference get_zero_embed)
        zero_embeds = jnp.zeros_like(latents)
        if self.image_encoder is not None:
            encoder, enc_params = self.image_encoder
            size = encoder.config.image_size
            zero_img = jnp.zeros((1, 3, size, size))
            zero_embeds = encoder(enc_params, zero_img).image_embeds
            zero_embeds = jnp.tile(zero_embeds, (latents.shape[0], 1))

        if not return_dict:
            return (latents, zero_embeds)
        return KandinskyV22PriorPipelineOutput(image_embeds=latents, negative_image_embeds=zero_embeds)

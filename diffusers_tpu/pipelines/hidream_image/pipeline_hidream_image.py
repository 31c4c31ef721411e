"""HiDream-I1 text-to-image pipeline.

Behavioral mirror of the reference
`pipelines/hidream_image/pipeline_hidream_image.py`: 4 text encoders —
two CLIP pooled embeds concatenated (`:399`), T5 sequence embeds, and a
Llama stack of per-layer hidden states `hidden_states[1:]` (`:316`) that
the transformer indexes by `llama_layers`; Flux-style dynamic-shift
flow-match timesteps (`:85`), negated prediction (`noise_pred =
-noise_pred`), CFG batch-2.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


def calculate_shift(image_seq_len, base_seq_len=256, max_seq_len=4096,
                    base_shift=0.5, max_shift=1.15):
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


@dataclass
class HiDreamImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class HiDreamImagePipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2,
                 text_encoder_3, tokenizer_3, text_encoder_4, tokenizer_4, transformer):
        super().__init__()
        self.register_modules(
            scheduler=scheduler, vae=vae,
            text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
            text_encoder_3=text_encoder_3, tokenizer_3=tokenizer_3,
            text_encoder_4=text_encoder_4, tokenizer_4=tokenizer_4,
            transformer=transformer,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = 128

    def _clip_pooled(self, encoder, tokenizer, prompts, max_length: int = 77):
        model, params = encoder
        inputs = tokenizer(prompts, padding="max_length", max_length=max_length,
                           truncation=True, return_tensors="np")
        out = model(params, jnp.asarray(inputs.input_ids))
        return out.text_embeds

    def _t5_embeds(self, prompts, max_length: int = 128):
        model, params = self.text_encoder_3
        inputs = self.tokenizer_3(prompts, padding="max_length", max_length=max_length,
                                  truncation=True, return_tensors="np")
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = model(params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def _llama_embeds(self, prompts, max_length: int = 128):
        model, params = self.text_encoder_4
        inputs = self.tokenizer_4(prompts, padding="max_length", max_length=max_length,
                                  truncation=True, return_tensors="np")
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        out = model(params, ids, attention_mask=mask, output_hidden_states=True)
        return jnp.stack(out.hidden_states[1:], axis=0)  # [L, B, S, D]

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 128):
        if isinstance(prompt, str):
            prompt = [prompt]

        def all_embeds(texts):
            p1 = self._clip_pooled(self.text_encoder, self.tokenizer, texts)
            p2 = self._clip_pooled(self.text_encoder_2, self.tokenizer_2, texts)
            pooled = jnp.concatenate([p1, p2], axis=-1)
            t5 = self._t5_embeds(texts, max_sequence_length)
            llama = self._llama_embeds(texts, max_sequence_length)
            return pooled, t5, llama

        pooled, t5, llama = all_embeds(prompt)
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            n_pooled, n_t5, n_llama = all_embeds(negative_prompt)
            pooled = jnp.concatenate([n_pooled, pooled], axis=0)
            t5 = jnp.concatenate([n_t5, t5], axis=0)
            llama = jnp.concatenate([n_llama, llama], axis=1)
        return pooled, t5, llama

    def _denoise(self, tr_params, latents, pooled, t5, llama, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                tr_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states_t5=t5, encoder_hidden_states_llama3=llama,
                pooled_embeds=pooled,
            ).sample
            noise_pred = -noise_pred
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 128,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        pooled, t5, llama = self.encode_prompt(prompt, negative_prompt, do_cfg,
                                               max_sequence_length=max_sequence_length)
        batch_size = pooled.shape[0] // (2 if do_cfg else 1) * num_images_per_prompt

        shape = (batch_size, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        p = transformer.config.patch_size
        image_seq_len = (shape[2] // p) * (shape[3] // p)
        mu = calculate_shift(image_seq_len)
        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, pooled, t5, llama, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            shift = getattr(vae.config, "shift_factor", 0.0) or 0.0
            decode = self._jit(
                "decode", lambda p_, z: vae.decode(p_, z / vae.config.scaling_factor + shift).sample
            )
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return HiDreamImagePipelineOutput(images=image)

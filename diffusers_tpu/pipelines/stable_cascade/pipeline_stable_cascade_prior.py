"""Stable Cascade prior (stage C) pipeline.

Behavioral mirror of the reference
`pipelines/stable_cascade/pipeline_stable_cascade_prior.py`: CLIP
hidden-state + pooled conditioning (`:199`), zero CLIP-image embeds when
no image given (`:532`), latent shape `ceil(size / 42.67)` (`:141`),
DDPMWuerstchen continuous-time denoise with [text, uncond] CFG lerp
(`:608`), output = image embeddings for the decoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from math import ceil
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class StableCascadePriorPipelineOutput(BaseOutput):
    image_embeddings: Union[jax.Array, np.ndarray]
    prompt_embeds: Optional[jax.Array] = None
    prompt_embeds_pooled: Optional[jax.Array] = None
    negative_prompt_embeds: Optional[jax.Array] = None
    negative_prompt_embeds_pooled: Optional[jax.Array] = None


class StableCascadePriorPipeline(DiffusionPipeline):
    _optional_components = ["image_encoder", "feature_extractor"]

    def __init__(self, tokenizer, text_encoder, prior, scheduler,
                 resolution_multiple: float = 42.67, image_encoder=None, feature_extractor=None):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, prior=prior, scheduler=scheduler,
            image_encoder=image_encoder, feature_extractor=feature_extractor,
        )
        self.register_to_config(resolution_multiple=resolution_multiple)

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            out = text_encoder(te_params, ids, output_hidden_states=True)
            return out.hidden_states[-1], out.text_embeds[:, None, :]

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_embeds_pooled = encode(prompt)
        negative_embeds = negative_pooled = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds, negative_pooled = encode(negative_prompt)
        return prompt_embeds, prompt_embeds_pooled, negative_embeds, negative_pooled

    def _denoise(self, prior_params, latents, text_hidden, text_pooled, image_embeds,
                 timesteps, prev_timesteps, state, guidance_scale, do_cfg, key):
        prior = self.prior[0]
        scheduler = self.scheduler

        def step_fn(carry, ts):
            latents, step_key = carry
            t, prev_t = ts
            ratio = jnp.broadcast_to(t, (latents.shape[0],))
            pred = prior(
                prior_params,
                sample=jnp.concatenate([latents, latents], axis=0) if do_cfg else latents,
                timestep_ratio=jnp.concatenate([ratio, ratio], axis=0) if do_cfg else ratio,
                clip_text_pooled=text_pooled, clip_text=text_hidden, clip_img=image_embeds,
            ).sample
            if do_cfg:
                pred_text, pred_uncond = jnp.split(pred, 2, axis=0)
                pred = pred_uncond + guidance_scale * (pred_text - pred_uncond)
            step_key, sub = jax.random.split(step_key)
            out = scheduler.step(state, pred, t, latents, prev_timestep=prev_t, key=sub)
            return (out.prev_sample, step_key), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, key), (timesteps, prev_timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        guidance_scale: float = 4.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        prior, prior_params = self.prior
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, pooled, neg_embeds, neg_pooled = self.encode_prompt(prompt, negative_prompt, do_cfg)
        if num_images_per_prompt > 1:
            reps = lambda a: None if a is None else jnp.repeat(a, num_images_per_prompt, axis=0)
            prompt_embeds, pooled = reps(prompt_embeds), reps(pooled)
            neg_embeds, neg_pooled = reps(neg_embeds), reps(neg_pooled)
        batch_size = prompt_embeds.shape[0]

        text_hidden = jnp.concatenate([prompt_embeds, neg_embeds], axis=0) if do_cfg else prompt_embeds
        text_pooled = jnp.concatenate([pooled, neg_pooled], axis=0) if do_cfg else pooled
        clip_img_channels = prior.config.clip_image_in_channels or 768
        image_embeds = jnp.zeros((text_hidden.shape[0], 1, clip_img_channels), dtype=text_hidden.dtype)

        state = self.scheduler.set_timesteps(num_inference_steps)
        shape = (batch_size, prior.config.in_channels,
                 ceil(height / self.config.get("resolution_multiple")),
                 ceil(width / self.config.get("resolution_multiple")))
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * self.scheduler.init_noise_sigma

        ts = state.timesteps
        key, loop_key = jax.random.split(key)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(prior_params, latents, text_hidden, text_pooled, image_embeds,
                          ts[:-1], ts[1:], state, key=loop_key)

        if output_type == "np":
            latents = np.asarray(latents)
            prompt_embeds = np.asarray(prompt_embeds)
            neg_embeds = None if neg_embeds is None else np.asarray(neg_embeds)
        if not return_dict:
            return (latents, prompt_embeds, pooled, neg_embeds, neg_pooled)
        return StableCascadePriorPipelineOutput(
            image_embeddings=latents, prompt_embeds=prompt_embeds, prompt_embeds_pooled=pooled,
            negative_prompt_embeds=neg_embeds, negative_prompt_embeds_pooled=neg_pooled,
        )

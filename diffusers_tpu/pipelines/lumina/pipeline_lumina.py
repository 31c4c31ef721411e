"""Lumina-Next-SFT text-to-image pipeline.

Behavioral mirror of the reference `pipelines/lumina/pipeline_lumina.py`:
Gemma `hidden_states[-2]` conditioning with attention mask, [cond,
uncond] CFG batch ORDER (`:797`), reversed flow time `1 - t/T` (`:851`),
time-aware rotary scaling (linear below the watershed, NTK above,
`:858-870`), proportional attention `base_sequence_length =
(default_image_size/16)^2` (`:766`), CFG applied to the FIRST THREE
channels only (`:889-899`), learn-sigma chunk, negated prediction into a
flow-match Euler step.

TPU-first: both rotary tables (linear/NTK) are precomputed host-side and
selected inside the scan with `jnp.where` on the flow time.
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
from ...models.transformers.lumina_nextdit2d import get_2d_rotary_pos_embed_lumina_np
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class LuminaPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class LuminaPipeline(DiffusionPipeline):
    def __init__(self, transformer, scheduler, vae, text_encoder, tokenizer):
        super().__init__()
        self.register_modules(
            transformer=transformer, scheduler=scheduler, vae=vae,
            text_encoder=text_encoder, tokenizer=tokenizer,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = self.transformer[0].config.sample_size
        self.default_image_size = self.default_sample_size * self.vae_scale_factor

    def _encode(self, prompts: List[str], max_length: int = 256):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompts, padding="max_length", max_length=max_length, truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        return out.hidden_states[-2], mask

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = self._encode(prompt)
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_mask = self._encode(negative_prompt)
            # cond FIRST (reference :797)
            prompt_embeds = jnp.concatenate([prompt_embeds, neg_embeds], axis=0)
            prompt_mask = jnp.concatenate([prompt_mask, neg_mask], axis=0)
        return prompt_embeds, prompt_mask

    def _denoise(self, tr_params, latents, prompt_embeds, prompt_mask, rope_linear, rope_ntk,
                 timesteps, state, guidance_scale, do_cfg, scaling_watershed, base_sequence_length,
                 num_train_timesteps):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            current = 1 - t / num_train_timesteps
            use_linear = current < scaling_watershed
            rope = (
                jnp.where(use_linear, rope_linear[0], rope_ntk[0]),
                jnp.where(use_linear, rope_linear[1], rope_ntk[1]),
            )
            noise_pred = transformer(
                tr_params, latent_input,
                jnp.broadcast_to(current, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds, encoder_mask=prompt_mask,
                image_rotary_emb=rope, base_sequence_length=base_sequence_length,
            ).sample
            noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
            if do_cfg:
                eps, rest = noise_pred[:, :3], noise_pred[:, 3:]
                cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
                half = uncond_eps + guidance_scale * (cond_eps - uncond_eps)
                eps = jnp.concatenate([half, half], axis=0)
                noise_pred = jnp.concatenate([eps, rest], axis=1)
                noise_pred = jnp.split(noise_pred, 2, axis=0)[0]
            noise_pred = -noise_pred
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
        num_inference_steps: int = 30,
        guidance_scale: float = 4.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        scaling_watershed: float = 1.0,
        proportional_attn: bool = True,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_image_size
        width = width or self.default_image_size
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, prompt_mask = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_images_per_prompt
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            prompt_mask = jnp.repeat(prompt_mask, num_images_per_prompt, axis=0)

        base_sequence_length = (self.default_image_size // 16) ** 2 if proportional_attn else None
        scaling_factor = math.sqrt(width * height / self.default_image_size**2)

        state = self.scheduler.set_timesteps(num_inference_steps)
        shape = (batch_size, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        # rotary grid sized like the reference's static 384x384 table, enough
        # to slice [h, w] patches out of
        lh = shape[2] // transformer.config.patch_size
        lw = shape[3] // transformer.config.patch_size
        grid = max(lh, lw)
        rope_linear = get_2d_rotary_pos_embed_lumina_np(
            transformer.head_dim, grid, grid, linear_factor=scaling_factor, ntk_factor=1.0
        )
        rope_ntk = get_2d_rotary_pos_embed_lumina_np(
            transformer.head_dim, grid, grid, linear_factor=1.0, ntk_factor=scaling_factor
        )
        rope_linear = tuple(jnp.asarray(a) for a in rope_linear)
        rope_ntk = tuple(jnp.asarray(a) for a in rope_ntk)

        num_train_timesteps = self.scheduler.config.get("num_train_timesteps", 1000)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    scaling_watershed=scaling_watershed, base_sequence_length=base_sequence_length,
                    num_train_timesteps=num_train_timesteps),
            static=(guidance_scale, do_cfg, scaling_watershed, base_sequence_length,
                    num_inference_steps, num_train_timesteps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, prompt_mask, rope_linear, rope_ntk,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return LuminaPipelineOutput(images=image)


class LuminaText2ImgPipeline(LuminaPipeline):
    """Deprecated alias (reference :941)."""

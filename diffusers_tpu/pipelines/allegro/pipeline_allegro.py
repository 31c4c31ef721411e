"""Allegro text-to-video pipeline.

Behavioral mirror of the reference
`pipelines/allegro/pipeline_allegro.py`: T5 conditioning with attention
masks (PixArt-style, `:268`), 3-axis Allegro rotary table built from the
latent grid (`:614`), CFG batch-2 denoise over a Karras scheduler, VAE
decode sliced to [num_frames, height, width] (`:926`).

TPU-first: one jitted `lax.scan`; the gathered rotary tables are
precomputed host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...models.transformers.transformer_allegro import get_3d_rotary_pos_embed_allegro_np
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class AllegroPipelineOutput(BaseOutput):
    frames: Union[jax.Array, np.ndarray]


class AllegroPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor_spatial = (
            2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.vae_scale_factor_temporal = getattr(self.vae[0].config, "temporal_compression_ratio", 4) \
            if vae is not None else 4

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 512):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np", add_special_tokens=True,
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            return embeds, mask

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = encode(prompt)
        negative_embeds = negative_mask = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds, negative_mask = encode(negative_prompt)
        return prompt_embeds, prompt_mask, negative_embeds, negative_mask

    def _denoise(self, tr_params, latents, prompt_embeds, prompt_mask, rope, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = transformer(
                tr_params, latent_input, prompt_embeds,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_attention_mask=prompt_mask, image_rotary_emb=rope,
            ).sample
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
        height: int = 720,
        width: int = 1280,
        num_frames: int = 88,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_videos_per_prompt

        latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        shape = (batch_size, transformer.config.in_channels, latent_frames,
                 height // self.vae_scale_factor_spatial, width // self.vae_scale_factor_spatial)
        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        grid_h = shape[3] // transformer.config.patch_size
        grid_w = shape[4] // transformer.config.patch_size
        rope = get_3d_rotary_pos_embed_allegro_np(
            transformer.config.attention_head_dim, (grid_h, grid_w), latent_frames,
            interpolation_scale=(
                transformer.config.interpolation_scale_t,
                transformer.config.interpolation_scale_h,
                transformer.config.interpolation_scale_w,
            ),
        )
        rope = tuple((jnp.asarray(c), jnp.asarray(s)) for c, s in rope)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, prompt_mask, rope,
                          state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            is_allegro_vae = type(vae).__name__ == "AutoencoderKLAllegro"
            if is_allegro_vae:
                # real Allegro VAE decodes to [B, F, C, H, W] (reference
                # `pipeline_allegro.py:610-611` permutes back to NCFHW)
                decode = self._jit(
                    "decode",
                    lambda p, z: jnp.transpose(
                        vae.decode(p, z / vae.config.scaling_factor).sample, (0, 2, 1, 3, 4)
                    ),
                )
            else:
                decode = self._jit(
                    "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample
                )
            video = decode(vae_params, latents)
            video = video[:, :, :num_frames, :height, :width]
            if output_type == "np":
                video = np.asarray(
                    jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)).astype(jnp.float32)
                )
        if not return_dict:
            return (video,)
        return AllegroPipelineOutput(frames=video)

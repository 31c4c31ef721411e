"""Hunyuan-DiT text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuandit/pipeline_hunyuandit.py`):
dual text encoders (CLIP-Bert 77 tokens + mT5 256 tokens) with attention
masks, aspect-preserving cropped 2D RoPE (`:791-802`), size/style meta
conditioning (`:804-825`), CFG batch-2 DDPM denoise with optional guidance
rescale. TPU-first: one jitted `lax.scan`; RoPE tables precomputed host-side.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...models.embeddings import get_2d_rotary_pos_embed_np, get_resize_crop_region_for_grid
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class HunyuanDiTPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class HunyuanDiTPipeline(DiffusionPipeline):
    _optional_components = ["text_encoder_2", "tokenizer_2"]

    def __init__(self, vae, text_encoder, tokenizer, transformer, scheduler,
                 text_encoder_2=None, tokenizer_2=None):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode_one(self, prompt: List[str], index: int):
        tokenizer = self.tokenizer if index == 0 else self.tokenizer_2
        encoder, params = self.text_encoder if index == 0 else self.text_encoder_2
        cfg = self.transformer[0].config
        max_length = cfg.text_len if index == 0 else cfg.text_len_t5
        inputs = tokenizer(
            prompt,
            padding="max_length",
            max_length=max_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = encoder(params, ids, attention_mask=mask).last_hidden_state
        return embeds, mask

    def encode_prompt(self, prompt, negative_prompt, do_cfg):
        if isinstance(prompt, str):
            prompt = [prompt]
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)

        embeds, mask = self._encode_one(prompt, 0)
        t5_embeds, t5_mask = self._encode_one(prompt, 1)
        if not do_cfg:
            return embeds, mask, t5_embeds, t5_mask
        neg, neg_mask = self._encode_one(negative_prompt, 0)
        neg_t5, neg_t5_mask = self._encode_one(negative_prompt, 1)
        return (
            jnp.concatenate([neg, embeds], axis=0),
            jnp.concatenate([neg_mask, mask], axis=0),
            jnp.concatenate([neg_t5, t5_embeds], axis=0),
            jnp.concatenate([neg_t5_mask, t5_mask], axis=0),
        )

    def _denoise(self, t_params, latents, embeds, mask, t5_embeds, t5_mask, add_time_ids, style,
                 rope_cos, rope_sin, timesteps, state, guidance_scale, guidance_rescale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_expand = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, t_expand,
                encoder_hidden_states=embeds,
                text_embedding_mask=mask,
                encoder_hidden_states_t5=t5_embeds,
                text_embedding_mask_t5=t5_mask,
                image_meta_size=add_time_ids,
                style=style,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample
            # learn_sigma: keep the epsilon half (reference `:860` chunk)
            noise_pred, _ = jnp.split(noise_pred, 2, axis=1)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                if guidance_rescale > 0:
                    std_text = jnp.std(text, axis=tuple(range(1, text.ndim)), keepdims=True)
                    std_cfg = jnp.std(noise_pred, axis=tuple(range(1, noise_pred.ndim)), keepdims=True)
                    rescaled = noise_pred * (std_text / std_cfg)
                    noise_pred = guidance_rescale * rescaled + (1 - guidance_rescale) * noise_pred
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        guidance_rescale: float = 0.0,
        original_size: Tuple[int, int] = (1024, 1024),
        target_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = int((height // 16) * 16)
        width = int((width // 16) * 16)
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        embeds, mask, t5_embeds, t5_mask = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = embeds.shape[0] // (2 if do_cfg else 1)

        lh = height // self.vae_scale_factor
        lw = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, transformer.config.in_channels, lh, lw), key=lat_key)

        p = transformer.config.patch_size
        grid_height, grid_width = lh // p, lw // p
        base_size = 512 // 8 // p
        grid_crops_coords = get_resize_crop_region_for_grid((grid_height, grid_width), base_size)
        rope_cos, rope_sin = get_2d_rotary_pos_embed_np(
            transformer.inner_dim // transformer.config.num_attention_heads,
            grid_crops_coords,
            (grid_height, grid_width),
        )

        target_size = target_size or (height, width)
        add_time_ids = jnp.asarray(
            [list(original_size) + list(target_size) + list(crops_coords_top_left)], dtype=jnp.float32
        )
        add_time_ids = jnp.tile(add_time_ids, (batch_size, 1))
        style = jnp.zeros((batch_size,), jnp.int32)
        if do_cfg:
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
            style = jnp.concatenate([style, style], axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    guidance_rescale=guidance_rescale, do_cfg=do_cfg),
            static=(guidance_scale, guidance_rescale, do_cfg, num_inference_steps),
        )
        latents = denoise(
            t_params, latents, embeds, mask, t5_embeds, t5_mask, add_time_ids, style,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state,
        )

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda pr, z: vae.decode(pr, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return HunyuanDiTPipelineOutput(images=image)

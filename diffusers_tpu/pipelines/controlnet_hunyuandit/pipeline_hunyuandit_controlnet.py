"""HunyuanDiT ControlNet text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet_hunyuandit/pipeline_hunyuandit_controlnet.py`):
the control image is VAE-encoded (posterior SAMPLE × scaling_factor, `:864`)
and fed as `controlnet_cond`; per step the ControlNet produces zero-init
residuals that the HunyuanDiT adds to its skip connections. Everything else
(dual CLIP+mT5 conditioning, cropped 2D rope, size/style meta, learn-sigma
epsilon split, CFG rescale) matches the base HunyuanDiT pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...models.embeddings import get_2d_rotary_pos_embed_np
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ...models.embeddings import get_resize_crop_region_for_grid
from ..hunyuandit.pipeline_hunyuandit import HunyuanDiTPipeline, HunyuanDiTPipelineOutput

logger = logging.get_logger(__name__)


class HunyuanDiTControlNetPipeline(HunyuanDiTPipeline):
    def __init__(self, vae, text_encoder, tokenizer, transformer, scheduler, controlnet,
                 text_encoder_2=None, tokenizer_2=None):
        super().__init__(vae, text_encoder, tokenizer, transformer, scheduler,
                         text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2)
        self.register_modules(controlnet=controlnet)

    def prepare_control_latents(self, image, key, do_cfg: bool):
        """image: [B, C, H, W] in [-1, 1] → sampled VAE latents × scaling."""
        vae, vae_params = self.vae
        encode = self._jit(
            "encode_control",
            lambda p, img, k: vae.encode(p, img).sample(k) * vae.config.scaling_factor)
        lat = encode(vae_params, jnp.asarray(image, jnp.float32), key)
        if do_cfg:
            lat = jnp.concatenate([lat, lat], axis=0)
        return lat

    def _denoise_cn(self, t_params, c_params, latents, control_latents, embeds, mask,
                    t5_embeds, t5_mask, add_time_ids, style, rope_cos, rope_sin,
                    timesteps, state, guidance_scale, guidance_rescale, do_cfg,
                    conditioning_scale):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_expand = jnp.broadcast_to(t, (latent_input.shape[0],))
            control_samples = controlnet(
                c_params, latent_input, t_expand, control_latents,
                conditioning_scale=conditioning_scale,
                encoder_hidden_states=embeds, text_embedding_mask=mask,
                encoder_hidden_states_t5=t5_embeds, text_embedding_mask_t5=t5_mask,
                image_meta_size=add_time_ids, style=style,
                image_rotary_emb=(rope_cos, rope_sin),
            ).controlnet_block_samples
            noise_pred = transformer(
                t_params, latent_input, t_expand,
                encoder_hidden_states=embeds, text_embedding_mask=mask,
                encoder_hidden_states_t5=t5_embeds, text_embedding_mask_t5=t5_mask,
                image_meta_size=add_time_ids, style=style,
                image_rotary_emb=(rope_cos, rope_sin),
                controlnet_block_samples=list(control_samples),
            ).sample
            noise_pred, _ = jnp.split(noise_pred, 2, axis=1)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                if guidance_rescale > 0:
                    std_text = jnp.std(text, axis=tuple(range(1, text.ndim)), keepdims=True)
                    std_cfg = jnp.std(noise_pred, axis=tuple(range(1, noise_pred.ndim)),
                                      keepdims=True)
                    rescaled = noise_pred * (std_text / std_cfg)
                    noise_pred = guidance_rescale * rescaled + (1 - guidance_rescale) * noise_pred
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        control_image=None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        controlnet_conditioning_scale: float = 1.0,
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
        controlnet, c_params = self.controlnet
        vae, vae_params = self.vae
        height = int((height // 16) * 16)
        width = int((width // 16) * 16)
        if key is None:
            key = jax.random.PRNGKey(0)
        if control_image is None:
            raise ValueError("`control_image` is required.")

        do_cfg = guidance_scale > 1.0
        embeds, mask, t5_embeds, t5_mask = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = embeds.shape[0] // (2 if do_cfg else 1)

        control_image = np.asarray(control_image, np.float32)
        if control_image.ndim == 3:
            control_image = control_image[None]
        key, ctrl_key = jax.random.split(key)
        control_latents = self.prepare_control_latents(control_image, ctrl_key, do_cfg)

        lh = height // self.vae_scale_factor
        lw = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, transformer.config.in_channels, lh, lw),
                                   key=lat_key)

        p = transformer.config.patch_size
        grid_height, grid_width = lh // p, lw // p
        base_size = 512 // 8 // p
        grid_crops_coords = get_resize_crop_region_for_grid((grid_height, grid_width), base_size)
        rope_cos, rope_sin = get_2d_rotary_pos_embed_np(
            transformer.inner_dim // transformer.config.num_attention_heads,
            grid_crops_coords, (grid_height, grid_width))

        target_size = target_size or (height, width)
        add_time_ids = jnp.asarray(
            [list(original_size) + list(target_size) + list(crops_coords_top_left)],
            dtype=jnp.float32)
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
            "denoise_cn",
            partial(self._denoise_cn, guidance_scale=guidance_scale,
                    guidance_rescale=guidance_rescale, do_cfg=do_cfg,
                    conditioning_scale=float(controlnet_conditioning_scale)),
            static=(guidance_scale, guidance_rescale, do_cfg,
                    float(controlnet_conditioning_scale), num_inference_steps),
        )
        latents = denoise(t_params, c_params, latents, control_latents, embeds, mask,
                          t5_embeds, t5_mask, add_time_ids, style,
                          jnp.asarray(rope_cos), jnp.asarray(rope_sin),
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda pr, z: vae.decode(pr, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return HunyuanDiTPipelineOutput(images=image)

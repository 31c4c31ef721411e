"""Z-Image ControlNet pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/z_image/pipeline_z_image_controlnet.py:190`
ZImageControlNetPipeline): the control image is VAE-encoded in argmax mode and
latent-normalized (`:564-565`), zero-padded up to `control_in_dim` for v2.0
checkpoints (`:567-579`), and each denoise step runs the ControlNet against the
(optionally CFG-doubled) latent/caption batch before the base transformer
consumes its residual dict (`:662-675`).

TPU-first: both the ControlNet and the base transformer live inside ONE
scanned, jitted denoise loop; the residual injection points are static python
ints (config), so the per-layer adds are fused by XLA rather than dispatched
through a hook registry.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_z_image import ZImagePipeline, ZImagePipelineOutput


class ZImageControlNetPipeline(ZImagePipeline):
    _supported_cache_configs = ()

    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer, controlnet):
        DiffusionPipeline.__init__(self)
        self.register_modules(
            scheduler=scheduler, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, transformer=transformer, controlnet=controlnet,
        )
        self.vae_scale_factor = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        from ...image_processor import VaeImageProcessor
        from ...models.controlnets.controlnet_z_image import ZImageControlNetModel

        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        ZImageControlNetModel.from_transformer(self.controlnet[0], self.transformer[0])

    def _prepare_control_latents(self, control_image, height, width, batch_size):
        """VAE argmax-encode the control image → [B, C, 1, h, w] latent context
        (reference `:553-579`)."""
        vae, vae_params = self.vae
        image = self.image_processor.preprocess(control_image, height=height, width=width)
        image = jnp.asarray(image, dtype=jnp.float32)
        if image.shape[0] == 1 and batch_size > 1:
            image = jnp.repeat(image, batch_size, axis=0)
        lat = vae.encode(vae_params, image).mode()
        lat = (lat - vae.config.get("shift_factor", 0.0)) * vae.config.scaling_factor
        lat = lat[:, :, None]  # [B, C, 1, h, w]
        in_dim = self.controlnet[0].config.control_in_dim
        if lat.shape[1] != in_dim:
            pad = jnp.zeros((lat.shape[0], in_dim - lat.shape[1], *lat.shape[2:]), lat.dtype)
            lat = jnp.concatenate([lat, pad], axis=1)
        return lat

    def _denoise_cn(self, t_params, cn_params, latents, control_ctx, cap, cap_attn,
                    cap_inner, x_freqs, cap_freqs, g_steps, timesteps, state,
                    do_cfg, cfg_normalization, conditioning_scale):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler

        def forward(latents, t, g):
            t_norm = (1000.0 - t) / 1000.0
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            ctrl_in = jnp.concatenate([control_ctx, control_ctx], axis=0) if do_cfg else control_ctx
            tt = jnp.broadcast_to(t_norm, (latent_in.shape[0],))
            samples = controlnet(
                cn_params, t_params, latent_in[:, :, None], tt, cap, ctrl_in,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
                conditioning_scale=conditioning_scale,
            ).controlnet_block_samples
            pred = transformer(
                t_params, latent_in[:, :, None], tt, cap,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
                controlnet_block_samples=samples,
            ).sample[:, :, 0]
            if do_cfg:
                pos, neg = jnp.split(pred.astype(jnp.float32), 2, axis=0)
                out = pos + g * (pos - neg)
                if cfg_normalization:
                    pos_norm = jnp.sqrt(jnp.sum(pos**2, axis=(1, 2, 3), keepdims=True))
                    new_norm = jnp.sqrt(jnp.sum(out**2, axis=(1, 2, 3), keepdims=True))
                    out = jnp.where(new_norm > pos_norm, out * (pos_norm / new_norm), out)
                pred = out
            return -pred.astype(latents.dtype)

        def step_fn(carry, tg):
            lat, sstate = carry
            t, g = tg
            out = scheduler.step(sstate, forward(lat, t, g), t, lat)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, g_steps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        control_image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        controlnet_conditioning_scale: float = 0.75,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        _, cn_params = self.controlnet
        height = height or 1024
        width = width or 1024
        vae_scale = self.vae_scale_factor * 2
        if height % vae_scale or width % vae_scale:
            raise ValueError(f"height/width must be divisible by {vae_scale}")
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        cap, cap_attn, cap_inner, all_lens, batch_size = self._prep_text(
            prompt, negative_prompt, do_cfg, max_sequence_length)

        control_ctx = self._prepare_control_latents(control_image, height, width, batch_size)

        num_channels_latents = transformer.config.in_channels
        lh = 2 * (height // vae_scale)
        lw = 2 * (width // vae_scale)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        state = self._schedule(num_inference_steps, sigmas, (lh // 2) * (lw // 2))
        g_steps = self._guidance_steps(state.timesteps, guidance_scale, cfg_truncation)

        x_freqs, cap_freqs = transformer.compute_freqs(
            tuple(int(n) for n in all_lens), (1, lh // 2, lw // 2), cap.shape[1])

        denoise = self._jit(
            "denoise_cn",
            partial(self._denoise_cn, do_cfg=do_cfg,
                    cfg_normalization=bool(cfg_normalization),
                    conditioning_scale=float(controlnet_conditioning_scale)),
            static=(do_cfg, bool(cfg_normalization), float(controlnet_conditioning_scale)),
        )
        latents = denoise(t_params, cn_params, latents, control_ctx, jnp.asarray(cap),
                          jnp.asarray(cap_attn), jnp.asarray(cap_inner), x_freqs,
                          cap_freqs, g_steps, state.timesteps, state)

        image = latents if output_type == "latent" else self._decode(latents, output_type)
        if not return_dict:
            return (image,)
        return ZImagePipelineOutput(images=image)

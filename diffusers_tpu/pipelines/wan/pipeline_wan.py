"""Wan text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/wan/pipeline_wan.py`): UMT5 text
encoding (mask-zeroed), CFG batch-2, flow-matching denoise over
[B, C, 1+(F-1)/4, H/8, W/8] latents, latent de-normalization with the VAE's
per-channel latents_mean/std, causal-VAE decode. Single scanned jitted loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..free_init_utils import FreeInitMixin
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class WanPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class WanPipeline(DiffusionPipeline, FreeInitMixin):
    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer, scheduler=scheduler
        )
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 226):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") else (ids != 0).astype(jnp.int32)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        # zero out positions beyond each prompt's length (reference encode_prompt)
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 226):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        negative_embeds = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, negative_embeds

    _supported_cache_configs = (
        "TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig", "FirstBlockCacheConfig",
        "FasterCacheConfig", "PyramidAttentionBroadcastConfig",
    )

    def _denoise(self, t_params, latents, prompt_embeds, negative_embeds, rope_cos, rope_sin,
                 timesteps, state, guidance_scale, do_cfg, fc_sched=None, pab_mask=None):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        cache_cfg = getattr(self, "_cache_config", None)
        from ...hooks.faster_cache import FasterCacheConfig, denoise_scan_faster_cache
        from ...hooks.first_block_cache import FirstBlockCacheConfig
        from ...hooks.generic_cache import denoise_scan

        if isinstance(cache_cfg, FirstBlockCacheConfig):
            return self._denoise_fbc(t_params, latents, prompt_embeds, negative_embeds,
                                     rope_cos, rope_sin, timesteps, state, guidance_scale,
                                     do_cfg, cache_cfg)
        if type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig" and pab_mask is not None:
            # PAB: cond/uncond forwards carry SEPARATE per-block attention
            # caches (hooks/pyramid_attention_broadcast.py)
            b, c, f, h, w = latents.shape
            p_t, p_h, p_w = transformer.config.patch_size
            tokens = (f // p_t) * (h // p_h) * (w // p_w)
            pab0 = transformer.init_pab_cache(b, tokens, latents.dtype)

            def pab_step(carry, xs):
                latents, sstate, cache_c, cache_u = carry
                t, compute = xs
                timestep = jnp.broadcast_to(t, (latents.shape[0],))
                out_c, cache_c = transformer(
                    t_params, latents, timestep, prompt_embeds, rotary_emb=(rope_cos, rope_sin),
                    pab_compute=compute, pab_cache=cache_c)
                noise_pred = out_c.sample
                if do_cfg:
                    out_u, cache_u = transformer(
                        t_params, latents, timestep, negative_embeds, rotary_emb=(rope_cos, rope_sin),
                        pab_compute=compute, pab_cache=cache_u)
                    noise_pred = out_u.sample + guidance_scale * (noise_pred - out_u.sample)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, cache_c, cache_u), None

            (latents, _, _, _), _ = jax.lax.scan(
                pab_step, (latents, state, pab0, pab0), (timesteps, pab_mask))
            return latents

        def fwd_one(latents, t, embeds):
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            return transformer(t_params, latents, timestep, embeds,
                               rotary_emb=(rope_cos, rope_sin)).sample

        if isinstance(cache_cfg, FasterCacheConfig) and do_cfg and fc_sched is not None:
            # generic CFG-cache loop (hooks/faster_cache.py
            # denoise_scan_faster_cache): Wan's CFG is two forwards, so the
            # pair/cond closures map directly
            return denoise_scan_faster_cache(
                lambda lat, t, st: (fwd_one(lat, t, negative_embeds),
                                    fwd_one(lat, t, prompt_embeds)),
                lambda lat, t, st: fwd_one(lat, t, prompt_embeds),
                lambda uncond, cond: uncond + guidance_scale * (cond - uncond),
                scheduler, latents, state, timesteps, fc_sched,
            )

        def forward(latents, t, sstate):
            noise_cond = fwd_one(latents, t, prompt_embeds)
            if do_cfg:
                noise_uncond = fwd_one(latents, t, negative_embeds)
                return noise_uncond + guidance_scale * (noise_cond - noise_uncond)
            return noise_cond

        generic_cfg = None if isinstance(cache_cfg, FasterCacheConfig) else cache_cfg
        return denoise_scan(forward, scheduler, latents, state, timesteps, generic_cfg, pipe=self)

    def _denoise_fbc(self, t_params, latents, prompt_embeds, negative_embeds, rope_cos, rope_sin,
                     timesteps, state, guidance_scale, do_cfg, cache_cfg):
        """First-block-cached denoise: the cond and uncond forwards carry
        SEPARATE FBC states (the reference separates them with
        cache_context("cond"/"uncond"), models/cache_utils.py:155)."""
        transformer = self.transformer[0]
        scheduler = self.scheduler
        from ...hooks.first_block_cache import init_fbc_single_state

        b, c, f, h, w = latents.shape
        p_t, p_h, p_w = transformer.config.patch_size
        tokens = (f // p_t) * (h // p_h) * (w // p_w)
        dim = transformer.config.num_attention_heads * transformer.config.attention_head_dim
        fbc0 = init_fbc_single_state((b, tokens, dim))

        def step_fn(carry, t):
            latents, sstate, st_c, st_u = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            out_c, st_c = transformer(
                t_params, latents, timestep, prompt_embeds, rotary_emb=(rope_cos, rope_sin),
                fbc_state=st_c, fbc_config=cache_cfg,
            )
            noise_pred = out_c.sample
            if do_cfg:
                out_u, st_u = transformer(
                    t_params, latents, timestep, negative_embeds, rotary_emb=(rope_cos, rope_sin),
                    fbc_state=st_u, fbc_config=cache_cfg,
                )
                noise_pred = out_u.sample + guidance_scale * (noise_pred - out_u.sample)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state, st_c, st_u), None

        (latents, _, _, _), _ = jax.lax.scan(step_fn, (latents, state, fbc0, fbc0), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs: Optional[List[str]] = None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        num_channels_latents = transformer.config.in_channels
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, num_channels_latents, num_latent_frames, lh, lw)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        rope_cos, rope_sin = transformer.rope(num_latent_frames, lh, lw)

        fc_sched = None
        pab_mask = None
        cache_cfg = getattr(self, "_cache_config", None)
        if type(cache_cfg).__name__ == "FasterCacheConfig" and do_cfg:
            from ...hooks.faster_cache import faster_cache_schedules

            # host-precomputed per-step schedule (timesteps are tracers inside
            # the jitted denoise)
            try:
                st = self.scheduler.set_timesteps(num_inference_steps, sample_shape=shape)
            except TypeError:
                st = self.scheduler.set_timesteps(num_inference_steps)
            fc_sched = faster_cache_schedules(np.asarray(st.timesteps), cache_cfg)
        elif type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig":
            from ...hooks.pyramid_attention_broadcast import pab_compute_mask

            try:
                st = self.scheduler.set_timesteps(num_inference_steps, sample_shape=shape)
            except TypeError:
                st = self.scheduler.set_timesteps(num_inference_steps)
            pab_mask = jnp.asarray(pab_compute_mask(
                np.asarray(st.timesteps), cache_cfg.spatial_attention_block_skip_range,
                cache_cfg.spatial_attention_timestep_skip_range))
        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale,
                                               do_cfg=do_cfg, fc_sched=fc_sched,
                                               pab_mask=pab_mask),
                            static=(guidance_scale, do_cfg))

        # FreeInit (arXiv:2312.07537): iterative noise reinitialization —
        # single pass when disabled (pipelines/free_init_utils.py)
        initial_noise = latents
        for it, steps in self._free_init_iterations(num_inference_steps):
            if it > 0:
                key, reinit_key = jax.random.split(key)
                latents = self._free_init_reinit_latents(latents, initial_noise, reinit_key)
            try:
                state = self.scheduler.set_timesteps(steps, sample_shape=shape)
            except TypeError:
                state = self.scheduler.set_timesteps(steps)
            if callback_on_step_end is not None:
                from ...hooks.generic_cache import denoise_loop_with_callback

                scheduler = self.scheduler

                def forward_cb(lat, t, sstate, cb):
                    timestep = jnp.broadcast_to(t, (lat.shape[0],))
                    noise_cond = transformer(
                        t_params, lat, timestep, cb["prompt_embeds"], rotary_emb=(rope_cos, rope_sin)
                    ).sample
                    neg = cb.get("negative_prompt_embeds")
                    if neg is not None:
                        noise_uncond = transformer(
                            t_params, lat, timestep, neg, rotary_emb=(rope_cos, rope_sin)
                        ).sample
                        return noise_uncond + cb["guidance_scale"] * (noise_cond - noise_uncond)
                    return noise_cond

                latents = denoise_loop_with_callback(
                    forward_cb, scheduler, latents, state, state.timesteps, self,
                    callback_on_step_end,
                    {"prompt_embeds": prompt_embeds, "negative_prompt_embeds": negative_embeds,
                     "guidance_scale": jnp.asarray(guidance_scale, jnp.float32)},
                    cache_cfg=getattr(self, "_cache_config", None),
                )
            else:
                latents = denoise(t_params, latents, prompt_embeds, negative_embeds, rope_cos, rope_sin,
                                  state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            # de-normalize with the VAE's channelwise latent statistics
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                # reference: latents / (1/std) + mean == latents * std + mean
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                latents = latents * std + mean
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return WanPipelineOutput(frames=video)

"""LTX-Video text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx/pipeline_ltx.py:170` LTXPipeline;
latent pack/unpack `:420-453`, normalize `:455-472`, hot loop `:772-816`,
timestep-conditioned decode `:817-843`). TPU-first: T5 encode (jit) → ONE
scanned, jitted CFG denoise loop over packed [B, S, C] video tokens with
per-batch RoPE tables precomputed once per shape → unpack + denormalize +
causal-VAE decode (jit)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...guiders.guider_utils import rescale_noise_cfg
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class LTXPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class LTXPipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer, scheduler=scheduler
        )
        self.vae_spatial_compression_ratio = vae[0].spatial_compression_ratio if vae is not None else 32
        self.vae_temporal_compression_ratio = vae[0].temporal_compression_ratio if vae is not None else 8
        self.transformer_spatial_patch_size = transformer[0].config.patch_size if transformer is not None else 1
        self.transformer_temporal_patch_size = transformer[0].config.patch_size_t if transformer is not None else 1

    # ---------------------------------------------------------------- text
    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 128):
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
        embeds = embeds * mask[..., None].astype(embeds.dtype)
        return embeds, mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 128):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        negative_embeds, negative_mask = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, prompt_mask, negative_embeds, negative_mask

    # ------------------------------------------------------------- latents
    @staticmethod
    def _pack_latents(latents: jax.Array, patch_size: int = 1, patch_size_t: int = 1) -> jax.Array:
        b, c, f, h, w = latents.shape
        latents = latents.reshape(
            b, c, f // patch_size_t, patch_size_t, h // patch_size, patch_size, w // patch_size, patch_size
        )
        latents = jnp.transpose(latents, (0, 2, 4, 6, 1, 3, 5, 7))
        return latents.reshape(b, (f // patch_size_t) * (h // patch_size) * (w // patch_size), -1)

    @staticmethod
    def _unpack_latents(latents, num_frames, height, width, patch_size: int = 1, patch_size_t: int = 1):
        b = latents.shape[0]
        latents = latents.reshape(b, num_frames, height, width, -1, patch_size_t, patch_size, patch_size)
        latents = jnp.transpose(latents, (0, 4, 1, 5, 2, 6, 3, 7))
        c = latents.shape[1]
        return latents.reshape(b, c, num_frames * patch_size_t, height * patch_size, width * patch_size)

    @staticmethod
    def _denormalize_latents(latents, latents_mean, latents_std, scaling_factor: float = 1.0):
        mean = latents_mean.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        std = latents_std.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        return latents * std / scaling_factor + mean

    @staticmethod
    def _normalize_latents(latents, latents_mean, latents_std, scaling_factor: float = 1.0):
        mean = latents_mean.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        std = latents_std.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        return (latents - mean) * scaling_factor / std

    # ------------------------------------------------------------- denoise
    _supported_cache_configs = (
        "TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig", "FirstBlockCacheConfig",
        "FasterCacheConfig", "PyramidAttentionBroadcastConfig",
    )

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, rope_cos, rope_sin,
                 timesteps, state, guidance_scale, guidance_rescale, do_cfg,
                 fc_sched=None, latent_grid=None, pab_mask=None):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        cache_cfg = getattr(self, "_cache_config", None)
        from ...hooks.faster_cache import FasterCacheConfig, denoise_scan_faster_cache
        from ...hooks.first_block_cache import FirstBlockCacheConfig, init_fbc_single_state
        from ...hooks.generic_cache import denoise_scan

        if isinstance(cache_cfg, FasterCacheConfig) and do_cfg and fc_sched is not None:
            b = latents.shape[0]
            uncond_pe, cond_pe = prompt_embeds[:b], prompt_embeds[b:]
            uncond_m, cond_m = prompt_mask[:b], prompt_mask[b:]
            f, h, w = latent_grid  # token grid for the frequency split
            c = latents.shape[-1]

            # rope tables were prepared for the CFG batch (2B); the per-branch
            # forwards run batch B — the grid is identical per sample
            r_cos = rope_cos[:b] if rope_cos.ndim > 2 and rope_cos.shape[0] > b else rope_cos
            r_sin = rope_sin[:b] if rope_sin.ndim > 2 and rope_sin.shape[0] > b else rope_sin

            def fwd_one(lat, t, pe, m):
                timestep = jnp.broadcast_to(t, (lat.shape[0],))
                return transformer(t_params, lat, pe, timestep, encoder_attention_mask=m,
                                   image_rotary_emb=(r_cos, r_sin)).sample.astype(jnp.float32)

            return denoise_scan_faster_cache(
                lambda lat, t, st: (fwd_one(lat, t, uncond_pe, uncond_m),
                                    fwd_one(lat, t, cond_pe, cond_m)),
                lambda lat, t, st: fwd_one(lat, t, cond_pe, cond_m),
                lambda uncond, cond: uncond + guidance_scale * (cond - uncond),
                scheduler, latents, state, timesteps, fc_sched,
                # tokens → [B, C·F, H, W] so the low/high frequency split runs
                # over the spatial plane (reference hook operates on images)
                reshape_in=lambda x: jnp.transpose(
                    x.reshape(x.shape[0], f, h, w, c), (0, 1, 4, 2, 3)).reshape(x.shape[0], f * c, h, w),
                reshape_out=lambda x: jnp.transpose(
                    x.reshape(x.shape[0], f, c, h, w), (0, 1, 3, 4, 2)).reshape(x.shape[0], f * h * w, c),
            )

        if type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig" and pab_mask is not None:
            # PAB with LTX's batched-CFG forward: one cache over the 2B batch
            # (hooks/pyramid_attention_broadcast.py)
            b = latents.shape[0] * (2 if do_cfg else 1)
            pab0 = transformer.init_pab_cache(b, latents.shape[1], latents.dtype)

            def pab_step(carry, xs):
                latents, sstate, cache = carry
                t, compute = xs
                latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
                timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
                out_m, cache = transformer(
                    t_params, latent_input, prompt_embeds, timestep,
                    encoder_attention_mask=prompt_mask,
                    image_rotary_emb=(rope_cos, rope_sin),
                    pab_compute=compute, pab_cache=cache,
                )
                noise_pred = out_m.sample.astype(jnp.float32)
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                    if guidance_rescale > 0:
                        noise_pred = rescale_noise_cfg(noise_pred, text, guidance_rescale)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, cache), None

            (latents, _, _), _ = jax.lax.scan(pab_step, (latents, state, pab0), (timesteps, pab_mask))
            return latents

        if isinstance(cache_cfg, FirstBlockCacheConfig):
            b = latents.shape[0] * (2 if do_cfg else 1)
            dim = transformer.config.num_attention_heads * transformer.config.attention_head_dim
            fbc0 = init_fbc_single_state((b, latents.shape[1], dim))

            def step_fn(carry, t):
                latents, sstate, fbc = carry
                latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
                timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
                out_m, fbc = transformer(
                    t_params, latent_input, prompt_embeds, timestep,
                    encoder_attention_mask=prompt_mask,
                    image_rotary_emb=(rope_cos, rope_sin),
                    fbc_state=fbc, fbc_config=cache_cfg,
                )
                noise_pred = out_m.sample.astype(jnp.float32)
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                    if guidance_rescale > 0:
                        noise_pred = rescale_noise_cfg(noise_pred, text, guidance_rescale)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, fbc), None

            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, fbc0), timesteps)
            return latents

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params,
                latent_input,
                prompt_embeds,
                timestep,
                encoder_attention_mask=prompt_mask,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample.astype(jnp.float32)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                if guidance_rescale > 0:
                    noise_pred = rescale_noise_cfg(noise_pred, text, guidance_rescale)
            return noise_pred

        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    # ------------------------------------------------------------ __call__
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 704,
        num_frames: int = 161,
        frame_rate: int = 25,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.0,
        guidance_rescale: float = 0.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        prompt_attention_mask: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_attention_mask: Optional[jax.Array] = None,
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        max_sequence_length: int = 128,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        key, latents_key, decode_key = jax.random.split(key, 3)

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds, prompt_attention_mask, negative_prompt_embeds, negative_prompt_attention_mask = (
                self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
            )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            mask = jnp.concatenate([negative_prompt_attention_mask, prompt_attention_mask], axis=0)
        else:
            embeds, mask = prompt_embeds, prompt_attention_mask

        # latents
        latent_num_frames = (num_frames - 1) // self.vae_temporal_compression_ratio + 1
        latent_height = height // self.vae_spatial_compression_ratio
        latent_width = width // self.vae_spatial_compression_ratio
        num_channels_latents = transformer.config.in_channels
        p, pt = self.transformer_spatial_patch_size, self.transformer_temporal_patch_size
        if latents is None:
            latents = randn_tensor(
                (batch_size, num_channels_latents, latent_num_frames, latent_height, latent_width),
                key=latents_key,
            )
            latents = self._pack_latents(latents, p, pt)

        # RoPE tables: depend only on shapes (computed once per shape)
        grid = transformer.rope.prepare_video_coords(
            batch_size * (2 if do_cfg else 1),
            latent_num_frames // pt,
            latent_height // p,
            latent_width // p,
            rope_interpolation_scale=(
                self.vae_temporal_compression_ratio / frame_rate,
                self.vae_spatial_compression_ratio,
                self.vae_spatial_compression_ratio,
            ),
        )
        rope_cos, rope_sin = transformer.rope({}, grid)

        # flow-match schedule with resolution-dependent mu shift (reference :793)
        video_seq_len = latents.shape[1]
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            video_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.get("use_dynamic_shifting", False):
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        fc_sched = None
        pab_mask = None
        cache_cfg = getattr(self, "_cache_config", None)
        if type(cache_cfg).__name__ == "FasterCacheConfig" and do_cfg:
            from ...hooks.faster_cache import faster_cache_schedules

            fc_sched = faster_cache_schedules(np.asarray(state.timesteps), cache_cfg)
        elif type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig":
            from ...hooks.pyramid_attention_broadcast import pab_compute_mask

            pab_mask = jnp.asarray(pab_compute_mask(
                np.asarray(state.timesteps), cache_cfg.spatial_attention_block_skip_range,
                cache_cfg.spatial_attention_timestep_skip_range))
        latent_grid = (latent_num_frames // pt, latent_height // p, latent_width // p)
        denoise = self._denoise_entry("denoise",
            lambda *a: self._denoise(*a, guidance_scale, guidance_rescale, do_cfg,
                                     fc_sched=fc_sched, latent_grid=latent_grid,
                                     pab_mask=pab_mask),
            callback_on_step_end,
            static=(guidance_scale, guidance_rescale, do_cfg))
        latents = denoise(t_params, latents, embeds, mask, rope_cos, rope_sin, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            latents = self._unpack_latents(
                latents, latent_num_frames // pt, latent_height // p, latent_width // p, p, pt
            )
            latents = self._denormalize_latents(
                latents, vae_params["latents_mean"], vae_params["latents_std"], vae.config.scaling_factor
            )

            temb = None
            if vae.config.timestep_conditioning:
                noise = randn_tensor(latents.shape, key=decode_key, dtype=latents.dtype)
                scale = decode_timestep if decode_noise_scale is None else decode_noise_scale
                latents = (1 - scale) * latents + scale * noise
                temb = jnp.full((latents.shape[0],), decode_timestep, latents.dtype)

            decode = self._jit(
                "decode",
                lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
                static=(vae.config.timestep_conditioning,),
            )
            video = decode(vae_params, latents, temb, decode_key)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return LTXPipelineOutput(frames=video)

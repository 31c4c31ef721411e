"""Flux text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux.py:146` FluxPipeline;
hot loop `:888-952`, latent packing `:506-545`, mu shift `:825-834`),
TPU-first: encode (jit) → ONE scanned, jitted denoise loop (distilled
guidance folded into the transformer input; zero host sync per step) →
unpack + VAE decode (jit). RoPE tables are computed host-side in float64 once
per shape and fed into the scan as constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class FluxPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class FluxPipeline(DiffusionPipeline):
    _supported_cache_configs = (
        "TaylorSeerCacheConfig", "FirstBlockCacheConfig", "PyramidAttentionBroadcastConfig",
        "MagCacheConfig", "TextKVCacheConfig",
    )

    _optional_components = ["image_encoder", "feature_extractor"]

    def __init__(
        self,
        scheduler,
        vae,
        text_encoder,
        tokenizer,
        text_encoder_2,
        tokenizer_2,
        transformer,
        image_encoder=None,
        feature_extractor=None,
    ):
        super().__init__()
        self.register_modules(
            vae=vae,
            text_encoder=text_encoder,
            text_encoder_2=text_encoder_2,
            tokenizer=tokenizer,
            tokenizer_2=tokenizer_2,
            transformer=transformer,
            scheduler=scheduler,
            image_encoder=image_encoder,
            feature_extractor=feature_extractor,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.tokenizer_max_length = 77
        self.default_sample_size = 128

    # ---------------------------------------------------------------- text
    def _get_clip_prompt_embeds(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.tokenizer_max_length,
            truncation=True,
            return_tensors="np",
        )
        encode = self._jit("clip_encode", lambda p, ids: text_encoder(p, ids).pooler_output)
        return encode(te_params, jnp.asarray(inputs.input_ids))  # [B, D]

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 512):
        text_encoder, te_params = self.text_encoder_2
        inputs = self.tokenizer_2(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        # jitted: one program per encode (eager towers paid per-op dispatch;
        # also required for int4-quantized T5 params, whose eager ops the
        # axon backend rejects)
        encode = self._jit("t5_encode", lambda p, ids: text_encoder(p, ids).last_hidden_state)
        return encode(te_params, jnp.asarray(inputs.input_ids))  # [B, S, D]

    def encode_prompt(self, prompt, prompt_2=None, max_sequence_length: int = 512):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_2 = prompt_2 or prompt
        if isinstance(prompt_2, str):
            prompt_2 = [prompt_2]
        pooled_prompt_embeds = self._get_clip_prompt_embeds(prompt)
        prompt_embeds = self._get_t5_prompt_embeds(prompt_2, max_sequence_length)
        txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        return prompt_embeds, pooled_prompt_embeds, txt_ids

    # ------------------------------------------------------------- latents
    @staticmethod
    def _prepare_latent_image_ids(height: int, width: int) -> np.ndarray:
        ids = np.zeros((height, width, 3), dtype=np.float32)
        ids[..., 1] += np.arange(height)[:, None]
        ids[..., 2] += np.arange(width)[None, :]
        return ids.reshape(height * width, 3)

    @staticmethod
    def _pack_latents(latents: jax.Array) -> jax.Array:
        b, c, h, w = latents.shape
        latents = latents.reshape(b, c, h // 2, 2, w // 2, 2)
        latents = jnp.transpose(latents, (0, 2, 4, 1, 3, 5))
        return latents.reshape(b, (h // 2) * (w // 2), c * 4)

    @staticmethod
    def _unpack_latents(latents: jax.Array, height: int, width: int, vae_scale_factor: int) -> jax.Array:
        b, num_patches, channels = latents.shape
        h = 2 * (int(height) // (vae_scale_factor * 2))
        w = 2 * (int(width) // (vae_scale_factor * 2))
        latents = latents.reshape(b, h // 2, w // 2, channels // 4, 2, 2)
        latents = jnp.transpose(latents, (0, 3, 1, 4, 2, 5))
        return latents.reshape(b, channels // 4, h, w)

    # ------------------------------------------------------------- denoise
    def _denoise(
        self,
        transformer_params,
        latents: jax.Array,
        prompt_embeds: jax.Array,
        pooled_prompt_embeds: jax.Array,
        rope_cos: jax.Array,
        rope_sin: jax.Array,
        timesteps: jax.Array,
        state,
        guidance: Optional[jax.Array],
        pab_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        transformer = self.transformer[0]
        scheduler = self.scheduler
        cache_cfg = getattr(self, "_cache_config", None)

        def forward(latents, t):
            timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
            # compute in the conditioning dtype (bf16 checkpoints with f32
            # initial noise would otherwise upcast the whole graph and break
            # the scan-carry dtype invariant); the scheduler step stays f32
            return transformer(
                transformer_params,
                latents.astype(prompt_embeds.dtype),
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled_prompt_embeds,
                timestep=timestep,
                guidance=guidance,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample.astype(latents.dtype)

        from ...hooks.generic_cache import TextKVCacheConfig

        if cache_cfg is None or isinstance(cache_cfg, TextKVCacheConfig):
            def step_fn(carry, t):
                latents, sstate = carry
                noise_pred = forward(latents, t)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state), None

            (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
            return latents

        from ...hooks.first_block_cache import FirstBlockCacheConfig, flux_forward_with_fbc, init_fbc_state
        from ...hooks.taylorseer import (
            TaylorSeerCacheConfig,
            init_taylorseer_state,
            taylorseer_apply,
            taylorseer_compute_mask,
        )

        num_steps = timesteps.shape[0]
        if isinstance(cache_cfg, TaylorSeerCacheConfig):
            # compute/predict pattern is schedule-only → host-precomputed mask
            mask = jnp.asarray(taylorseer_compute_mask(num_steps, cache_cfg))
            ts_state = init_taylorseer_state(latents.shape, cache_cfg.max_order, latents.dtype)

            def step_fn(carry, xs):
                latents, sstate, ts_state = carry
                t, idx, compute = xs
                noise_pred, ts_state = taylorseer_apply(
                    ts_state, idx, compute, lambda: forward(latents, t)
                )
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, ts_state), None

            xs = (timesteps, jnp.arange(num_steps, dtype=jnp.int32), mask)
            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, ts_state), xs)
            return latents

        if isinstance(cache_cfg, FirstBlockCacheConfig):
            batch = latents.shape[0]
            img_seq, txt_seq = latents.shape[1], prompt_embeds.shape[1]
            inner_dim = transformer.inner_dim
            fbc0 = init_fbc_state(
                (batch, img_seq, inner_dim), (batch, txt_seq, inner_dim), dtype=latents.dtype
            )

            def step_fn(carry, t):
                latents, sstate, fbc_state = carry
                timestep = jnp.broadcast_to(t, (batch,)) / 1000.0
                noise_pred, fbc_state = flux_forward_with_fbc(
                    transformer,
                    transformer_params,
                    fbc_state,
                    cache_cfg,
                    latents,
                    prompt_embeds,
                    pooled_prompt_embeds,
                    timestep,
                    (rope_cos, rope_sin),
                    guidance=guidance,
                )
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, fbc_state), None

            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, fbc0), timesteps)
            return latents

        from ...hooks.pyramid_attention_broadcast import PyramidAttentionBroadcastConfig

        if isinstance(cache_cfg, PyramidAttentionBroadcastConfig):
            batch = latents.shape[0]
            img_seq, txt_seq = latents.shape[1], prompt_embeds.shape[1]
            inner = transformer.inner_dim
            n_dual = len(transformer.transformer_blocks)
            n_single = len(transformer.single_transformer_blocks)
            pab0 = {
                "dual_attn": jnp.zeros((n_dual, batch, img_seq, inner), latents.dtype),
                "dual_ctx": jnp.zeros((n_dual, batch, txt_seq, inner), latents.dtype),
                "single_attn": jnp.zeros((n_single, batch, txt_seq + img_seq, inner), latents.dtype),
            }

            def step_fn(carry, xs):
                latents, sstate, pab_cache = carry
                t, compute = xs
                timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
                noise_pred, pab_cache = transformer(
                    transformer_params,
                    latents,
                    encoder_hidden_states=prompt_embeds,
                    pooled_projections=pooled_prompt_embeds,
                    timestep=timestep,
                    guidance=guidance,
                    image_rotary_emb=(rope_cos, rope_sin),
                    pab_compute=compute,
                    pab_cache=pab_cache,
                )
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, pab_cache), None

            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, pab0), (timesteps, pab_mask))
            return latents

        from ...hooks.mag_cache import MagCacheConfig, flux_forward_with_magcache, init_mag_cache_state

        if isinstance(cache_cfg, MagCacheConfig):
            # skip schedule is step-index-only → host-precomputed mask
            # (arrives via pab_mask slot from __call__)
            batch = latents.shape[0]
            img_seq, txt_seq = latents.shape[1], prompt_embeds.shape[1]
            inner = transformer.inner_dim
            mc0 = init_mag_cache_state((batch, img_seq, inner), (batch, txt_seq, inner), latents.dtype)

            def step_fn(carry, xs):
                latents, sstate, mc_state = carry
                t, compute = xs
                timestep = jnp.broadcast_to(t, (batch,)) / 1000.0
                noise_pred, mc_state = flux_forward_with_magcache(
                    transformer,
                    transformer_params,
                    mc_state,
                    compute,
                    latents,
                    prompt_embeds,
                    pooled_prompt_embeds,
                    timestep,
                    (rope_cos, rope_sin),
                    guidance=guidance,
                )
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, mc_state), None

            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, mc0), (timesteps, pab_mask))
            return latents

        raise ValueError(f"FluxPipeline does not support cache config {type(cache_cfg).__name__}")

    # ------------------------------------------------------------- __call__
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs: Optional[List[str]] = None,
    ):
        transformer, transformer_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        if prompt_embeds is None or pooled_prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_prompt(prompt, prompt_2, max_sequence_length)
        else:
            txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            pooled_prompt_embeds = jnp.repeat(pooled_prompt_embeds, num_images_per_prompt, axis=0)

        # latents (packed 2x2 patches)
        num_channels_latents = transformer.config.in_channels // 4
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        if latents is None:
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=key)
            latents = self._pack_latents(latents)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        # RoPE tables: host-side float64 (matches reference's float64 rope)
        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)

        # timestep schedule with resolution-dependent mu shift
        image_seq_len = latents.shape[1]
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.use_dynamic_shifting:
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((batch_size,), guidance_scale, dtype=jnp.float32)

        pab_mask = None
        cache_cfg = getattr(self, "_cache_config", None)
        if cache_cfg is not None and type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig":
            from ...hooks.pyramid_attention_broadcast import pab_compute_mask

            pab_mask = jnp.asarray(
                pab_compute_mask(
                    np.asarray(state.timesteps),
                    cache_cfg.spatial_attention_block_skip_range,
                    cache_cfg.spatial_attention_timestep_skip_range,
                )
            )
        elif cache_cfg is not None and type(cache_cfg).__name__ == "MagCacheConfig":
            from ...hooks.mag_cache import mag_cache_compute_mask

            import dataclasses

            if cache_cfg.num_inference_steps != int(state.timesteps.shape[0]):
                cache_cfg = dataclasses.replace(
                    cache_cfg, num_inference_steps=int(state.timesteps.shape[0])
                )
            pab_mask = jnp.asarray(mag_cache_compute_mask(cache_cfg))

        if callback_on_step_end is not None:
            from ...hooks.generic_cache import denoise_loop_with_callback

            rope = (jnp.asarray(rope_cos), jnp.asarray(rope_sin))
            scheduler = self.scheduler

            def forward_cb(lat, t, sstate, cb):
                timestep = jnp.broadcast_to(t, (lat.shape[0],)) / 1000.0
                return transformer(
                    transformer_params, lat,
                    encoder_hidden_states=cb["prompt_embeds"],
                    pooled_projections=cb["pooled_prompt_embeds"],
                    timestep=timestep, guidance=cb.get("guidance"),
                    image_rotary_emb=rope,
                ).sample

            latents = denoise_loop_with_callback(
                forward_cb, scheduler, latents, state, state.timesteps, self,
                callback_on_step_end,
                {"prompt_embeds": prompt_embeds, "pooled_prompt_embeds": pooled_prompt_embeds,
                 "guidance": guidance},
                cache_cfg=cache_cfg,
            )
        else:
            denoise = self._jit("denoise", self._denoise)
            latents = denoise(
                transformer_params,
                latents,
                prompt_embeds,
                pooled_prompt_embeds,
                jnp.asarray(rope_cos),
                jnp.asarray(rope_sin),
                state.timesteps,
                state,
                guidance,
                pab_mask,
            )

        if output_type == "latent":
            image = latents
        else:
            latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)

            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                if getattr(vae, "use_tiling", False):
                    # bounds decode HBM to one tile (each tile is its own jit
                    # of identical shape → one compile)
                    return vae.tiled_decode(p, z).sample
                return vae.decode(p, z).sample

            image = self._jit("decode", decode)(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return FluxPipelineOutput(images=image)

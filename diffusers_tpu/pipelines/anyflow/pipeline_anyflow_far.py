"""AnyFlow-FAR chunk-wise autoregressive text/video-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/anyflow/pipeline_anyflow_far.py:447`):
outer loop over chunks, inner any-step flow-map denoise per chunk. Each
non-context chunk runs `num_inference_steps` flow-map Euler steps through the
FAR transformer's autoregressive KV-cache read path; after a chunk finishes
(and for every context chunk), the WHOLE clean prefix is re-encoded through
the cache-prefill path so later chunks attend back to it (`encode_kv_cache`,
`:400`). Steps where `t == r` are skipped (`:735`).

TPU-first: the inner per-chunk denoise is one scanned jit over the filtered
(t, r) pairs with the functional KV cache closed over as a constant (the AR
read never mutates it); the prefill is a second jit per chunk. Chunk lengths
and cache token counts are host ints, so each chunk index compiles once and
is cached across calls with the same layout.
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
from ..pipeline_utils import DiffusionPipeline
from ..wan.pipeline_wan import WanPipeline

logger = logging.get_logger(__name__)


@dataclass
class AnyFlowFARPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class AnyFlowFARPipeline(DiffusionPipeline):
    _supported_cache_configs = ()

    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              transformer=transformer, vae=vae, scheduler=scheduler)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    _get_t5_prompt_embeds = WanPipeline._get_t5_prompt_embeds
    encode_prompt = WanPipeline.encode_prompt

    # ------------------------------------------------------------- internals

    def _denoise_chunk(self, t_params, chunk_latents, prompt_embeds, t_pairs, kv_cache, state,
                       chunk_partition, num_cached_chunks, guidance_scale, do_cfg,
                       use_mean_velocity):
        """One chunk's flow-map Euler loop through the AR cache-read path.
        xs carry (t, r_sched); the model sees r_sched in mean-velocity mode
        and t otherwise, while the Euler update always targets r_sched
        (reference `:736-748, :768`)."""
        transformer = self.transformer[0]
        scheduler = self.scheduler
        flag = {"num_cached_chunks": num_cached_chunks, "is_cache_step": False}

        def step_fn(lat, xs):
            t, r_sched = xs
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            b, f = lat_in.shape[0], lat_in.shape[1]
            t_frames = jnp.broadcast_to(t, (b, f))
            r_frames = jnp.broadcast_to(r_sched if use_mean_velocity else t, (b, f))
            pred = transformer(t_params, lat_in, t_frames, r_frames, prompt_embeds,
                               chunk_partition=chunk_partition, kv_cache=kv_cache,
                               kv_cache_flag=flag).sample
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(state, pred, t, lat, r_timestep=r_sched)
            return out.prev_sample, None

        chunk_latents, _ = jax.lax.scan(step_fn, chunk_latents, t_pairs)
        return chunk_latents

    def _prefill_cache(self, t_params, prefix_latents, prompt_embeds, kv_cache,
                       chunk_partition, num_cached_chunks, do_cfg):
        """Re-encode the clean prefix through the cache-write path
        (reference `encode_kv_cache`, `:400`)."""
        transformer = self.transformer[0]
        lat_in = jnp.concatenate([prefix_latents, prefix_latents], axis=0) if do_cfg else prefix_latents
        zeros = jnp.zeros((lat_in.shape[0], lat_in.shape[1]), jnp.float32)
        out = transformer(t_params, lat_in, zeros, zeros, prompt_embeds,
                          chunk_partition=chunk_partition, kv_cache=kv_cache,
                          kv_cache_flag={"num_cached_chunks": num_cached_chunks,
                                         "is_cache_step": True})
        return out.kv_cache

    # --------------------------------------------------------------- __call__

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 4,
        guidance_scale: float = 1.0,
        use_mean_velocity: bool = True,
        video_latents: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        sigmas: Optional[List[float]] = None,
        chunk_partition: Optional[List[int]] = None,
        use_kv_cache: bool = True,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if not use_kv_cache:
            raise NotImplementedError(
                "AnyFlowFARPipeline requires use_kv_cache=True (the reference default; "
                "its cache-free path is shape-inconsistent with chunk-wise inputs).")
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg,
                                                            max_sequence_length)
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, num_latent_frames, transformer.config.in_channels, lh, lw)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        init_latents = latents

        if chunk_partition is None:
            chunk_partition = list(transformer.config.chunk_partition)
        if sum(chunk_partition) != num_latent_frames:
            raise ValueError(
                f"chunk_partition={chunk_partition} sums to {sum(chunk_partition)}, but the "
                f"latent sequence has {num_latent_frames} frames; pass a matching chunk_partition.")

        kv_cache = transformer.init_kv_cache(
            batch_size * (2 if do_cfg else 1), lh, lw, chunk_partition, dtype=init_latents.dtype)

        output = jnp.zeros_like(init_latents)
        if video_latents is not None:
            output = output.at[:, : video_latents.shape[1]].set(video_latents)
            num_context_chunks = next(
                i + 1 for i in range(len(chunk_partition))
                if sum(chunk_partition[: i + 1]) >= video_latents.shape[1])
        else:
            num_context_chunks = 0

        for chunk_idx in range(len(chunk_partition)):
            lo = sum(chunk_partition[:chunk_idx])
            hi = sum(chunk_partition[: chunk_idx + 1])
            if chunk_idx >= num_context_chunks:
                chunk_latents = init_latents[:, lo:hi]
                this_partition = tuple(chunk_partition[: chunk_idx + 1])
                state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas)
                ts = np.asarray(state.timesteps)
                rs = np.asarray(state.sigmas[1:]) * self.scheduler.config.num_train_timesteps
                keep = ts != rs  # skip no-op steps (reference `:735`)
                t_pairs = (jnp.asarray(ts[keep]), jnp.asarray(rs[keep]))
                denoise = self._jit(
                    f"denoise_chunk{chunk_idx}",
                    partial(self._denoise_chunk, chunk_partition=this_partition,
                            num_cached_chunks=chunk_idx, guidance_scale=float(guidance_scale),
                            do_cfg=do_cfg, use_mean_velocity=bool(use_mean_velocity)),
                    static=(this_partition, chunk_idx, float(guidance_scale), do_cfg,
                            bool(use_mean_velocity)),
                )
                chunk_latents = denoise(t_params, chunk_latents, prompt_embeds, t_pairs, kv_cache, state)
                output = output.at[:, lo:hi].set(chunk_latents)

            if chunk_idx < len(chunk_partition) - 1:
                prefill = self._jit(
                    f"prefill_chunk{chunk_idx}",
                    partial(self._prefill_cache, chunk_partition=tuple(chunk_partition[: chunk_idx + 1]),
                            num_cached_chunks=chunk_idx, do_cfg=do_cfg),
                    static=(tuple(chunk_partition[: chunk_idx + 1]), chunk_idx, do_cfg),
                )
                kv_cache = prefill(t_params, output[:, :hi], prompt_embeds, kv_cache)

        if output_type == "latent":
            video = output
        else:
            lat = jnp.transpose(output, (0, 2, 1, 3, 4))  # [B, C, F, H, W]
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                lat = lat * std + mean
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, lat)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return AnyFlowFARPipelineOutput(frames=video)

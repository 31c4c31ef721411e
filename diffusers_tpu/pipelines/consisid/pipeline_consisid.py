"""ConsisID identity-preserving image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/consisid/pipeline_consisid.py`):
CogVideoX-style T5 conditioning and 3D rope, the reference image VAE-encoded
into a first-frame latent padded with zeros and CHANNEL-concatenated with the
noise at every step (`:605`), identity conditioning (`id_cond`,
`id_vit_hidden`) injected through the transformer's Local Facial Extractor,
dynamic cosine^5 CFG (`:627`), and the CogVideoX DPM-Solver++ SDE scheduler
with the previous-x̂₀ second-order carry riding the scan.

The face-embedding preparation utilities (insightface/facexlib) are not
available in this environment; pass precomputed `id_cond` / `id_vit_hidden`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_dpm_cogvideox import CogVideoXDPMScheduler
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..cogvideo.pipeline_cogvideox import CogVideoXPipeline
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class ConsisIDPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class ConsisIDPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
                              transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor_spatial = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.vae_scale_factor_temporal = (
            int(vae[0].config.temporal_compression_ratio) if vae is not None else 4
        )
        self.vae_scaling_factor_image = (
            vae[0].config.scaling_factor if vae is not None else 0.7
        )

    _get_t5_prompt_embeds = CogVideoXPipeline._get_t5_prompt_embeds
    encode_prompt = CogVideoXPipeline.encode_prompt

    def prepare_latents(self, image, batch_size, num_channels_latents, num_frames,
                        height, width, key, latents=None, kps_cond=None):
        """image: [B, C, H, W] in [-1, 1]; first-frame latent + zero padding
        (reference `:436`). Optional facial-keypoints conditioning image fills
        the second frame slot."""
        vae, vae_params = self.vae
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, num_latent_frames, num_channels_latents, lh, lw)

        def encode(img, k):
            dist = vae.encode(vae_params, img[:, :, None])  # add frame axis
            lat = dist.latent_dist.sample(k) if hasattr(dist, "latent_dist") else dist.sample(k)
            return jnp.transpose(lat, (0, 2, 1, 3, 4))  # [B, F, C, H, W]

        key, k1, k2, k3 = jax.random.split(key, 4)
        image_latents = encode(jnp.asarray(image, jnp.float32), k1) * self.vae_scaling_factor_image
        if kps_cond is not None:
            kps_latents = encode(jnp.asarray(kps_cond, jnp.float32), k2) * self.vae_scaling_factor_image
            pad = jnp.zeros((batch_size, num_latent_frames - 2, num_channels_latents, lh, lw))
            image_latents = jnp.concatenate([image_latents, kps_latents, pad], axis=1)
        else:
            pad = jnp.zeros((batch_size, num_latent_frames - 1, num_channels_latents, lh, lw))
            image_latents = jnp.concatenate([image_latents, pad], axis=1)

        if latents is None:
            latents = randn_tensor(shape, key=k3)
        latents = latents * self.scheduler.init_noise_sigma
        return latents, image_latents

    def _denoise(self, t_params, latents, image_latents, prompt_embeds, negative_embeds,
                 rope, id_cond, id_vit_hidden, timesteps, keys, state,
                 guidance_scale, use_dynamic_cfg, do_cfg, num_steps):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        is_dpm = isinstance(scheduler, CogVideoXDPMScheduler)

        def model(lat, t):
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            lat_in = scheduler.scale_model_input(state, lat_in, t)
            img_in = jnp.concatenate([image_latents] * (2 if do_cfg else 1), axis=0)
            lat_in = jnp.concatenate([lat_in, img_in], axis=2)  # channel concat
            embeds = (jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
                      if do_cfg else prompt_embeds)
            pred = transformer(
                t_params, lat_in, embeds, jnp.broadcast_to(t, (lat_in.shape[0],)),
                image_rotary_emb=rope, id_cond=(jnp.concatenate([id_cond] * 2, axis=0)
                                                if do_cfg and id_cond is not None else id_cond),
                id_vit_hidden=([jnp.concatenate([h] * 2, axis=0) for h in id_vit_hidden]
                               if do_cfg and id_vit_hidden is not None else id_vit_hidden),
            ).sample.astype(jnp.float32)
            if do_cfg:
                g = guidance_scale
                if use_dynamic_cfg:
                    ratio = (num_steps - t.astype(jnp.float32) / (1000.0 / num_steps)) / num_steps
                    g = 1.0 + (guidance_scale - 1.0) * (
                        (1.0 - jnp.cos(jnp.pi * ratio**5.0)) / 2.0)
                uncond, text = jnp.split(pred, 2, axis=0)
                pred = uncond + g * (text - uncond)
            return pred

        if is_dpm:
            def step_fn(carry, xs):
                lat, old_pred, sstate = carry
                t, t_back, has_old, k = xs
                pred = model(lat, t)
                prev, x0 = scheduler.step(sstate, pred, old_pred, t, t_back, lat,
                                          key=k, old_pred_valid=has_old)
                return (prev.astype(lat.dtype), x0, sstate), None

            t_back = jnp.concatenate([timesteps[:1], timesteps[:-1]])
            has_old = jnp.concatenate([jnp.zeros((1,)), jnp.ones((timesteps.shape[0] - 1,))])
            old0 = jnp.zeros(latents.shape, jnp.float32)
            (latents, _, _), _ = jax.lax.scan(
                step_fn, (latents, old0, state), (timesteps, t_back, has_old, keys))
            return latents

        def step_fn(carry, xs):
            lat, sstate = carry
            t, _, _, _ = xs
            pred = model(lat, t)
            out = scheduler.step(sstate, pred, t, lat)
            return (out.prev_sample, out.state if out.state is not None else sstate), None

        dummy = jnp.zeros_like(timesteps)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state),
                                       (timesteps, dummy, dummy, keys))
        return latents

    def __call__(
        self,
        image,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        id_cond: Optional[jax.Array] = None,
        id_vit_hidden: Optional[List[jax.Array]] = None,
        kps_cond=None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        latent_channels = transformer.config.in_channels // 2
        key, lat_key = jax.random.split(key)
        latents, image_latents = self.prepare_latents(
            image, batch_size, latent_channels, num_frames, height, width, lat_key,
            latents=latents, kps_cond=kps_cond)

        num_latent_frames = latents.shape[1]
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        rope = None
        if transformer.config.use_rotary_positional_embeddings:
            rope = transformer.rope(height=lh, width=lw, num_frames=num_latent_frames)

        state = self.scheduler.set_timesteps(num_inference_steps)
        key, scan_key = jax.random.split(key)
        keys = jax.random.split(scan_key, int(state.timesteps.shape[0]))

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale),
                    use_dynamic_cfg=bool(use_dynamic_cfg), do_cfg=do_cfg,
                    num_steps=num_inference_steps),
            static=(float(guidance_scale), bool(use_dynamic_cfg), do_cfg,
                    num_inference_steps),
        )
        latents = denoise(t_params, latents, image_latents, prompt_embeds, negative_embeds,
                          rope, id_cond, id_vit_hidden, state.timesteps, keys, state)

        if output_type == "latent":
            video = latents
        else:
            z = jnp.transpose(latents, (0, 2, 1, 3, 4)) / self.vae_scaling_factor_image
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, z)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return ConsisIDPipelineOutput(frames=video)

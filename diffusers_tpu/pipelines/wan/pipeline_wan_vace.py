"""Wan-VACE all-in-one video creation/editing pipeline.

Behavioral mirror of the reference
`pipelines/wan/pipeline_wan_vace.py`: the control latents are built from
the conditioning video split into inactive `video*(1-mask)` and reactive
`video*mask` halves, each VAE-encoded in mode ("argmax") and channel-
concatenated (`prepare_video_latents`), plus a space-to-depth mask
rearranged into (vae_spatial)^2 channels and nearest-resized to the
latent frame count (`prepare_masks` `:581`); per-VACE-layer
`conditioning_scale`; T5 text conditioning; flow-match denoise with CFG.

Inputs are arrays: `video` [B, 3, F, H, W] in [-1, 1]; `mask` [B, 1, F,
H, W] in [0, 1] (defaults: zero video / all-ones mask = pure t2v).
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

logger = logging.get_logger(__name__)


@dataclass
class WanPipelineOutput(BaseOutput):
    frames: Union[jax.Array, np.ndarray]


class WanVACEPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, transformer=transformer,
            vae=vae, scheduler=scheduler,
        )
        cfg = self.vae[0].config if vae is not None else None
        self.vae_scale_factor_spatial = (
            2 ** (len(cfg.get("dim_mult", (1, 2, 4, 4))) - 1) if cfg is not None else 8
        )
        self.vae_scale_factor_temporal = (
            2 ** sum(bool(b) for b in cfg.get("temperal_downsample", (False, True, True)))
            if cfg is not None else 4
        )

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 226):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            return embeds * mask[..., None].astype(embeds.dtype)

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = encode(prompt)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = encode(negative_prompt)
        return prompt_embeds, negative_embeds

    def prepare_control_latents(self, video, mask, key):
        """[inactive | reactive | space-to-depth mask] control latents."""
        vae, vae_params = self.vae
        inactive = video * (1 - mask)
        reactive = video * mask
        lat_inactive = vae.encode(vae_params, inactive).mode()
        lat_reactive = vae.encode(vae_params, reactive).mode()
        lm = vae.config.get("latents_mean")
        ls = vae.config.get("latents_std")
        if lm is not None and ls is not None:
            mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
            std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
            lat_inactive = (lat_inactive - mean) / std
            lat_reactive = (lat_reactive - mean) / std
        latents = jnp.concatenate([lat_inactive, lat_reactive], axis=1)

        B, _, F, H, W = mask.shape
        s = self.vae_scale_factor_spatial
        p = self.transformer[0].config.patch_size[1]
        lf = lat_inactive.shape[2]  # match the encoder's actual causal frame count
        nh = H // (s * p) * p
        nw = W // (s * p) * p
        m = mask[:, 0]  # [B, F, H, W]
        m = m.reshape(B, F, nh, s, nw, s)
        m = jnp.transpose(m, (0, 3, 5, 1, 2, 4)).reshape(B, s * s, F, nh, nw)
        # nearest-exact resize along frames to the latent frame count
        idx = jnp.floor((jnp.arange(lf) + 0.5) * F / lf).astype(jnp.int32)
        m = m[:, :, idx]
        return jnp.concatenate([latents, m.astype(latents.dtype)], axis=1)

    def _denoise(self, tr_params, latents, prompt_embeds, control, cond_scale, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            ctrl_input = jnp.concatenate([control, control], axis=0) if do_cfg else control
            noise_pred = transformer(
                tr_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                control_hidden_states=ctrl_input,
                control_hidden_states_scale=cond_scale,
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
        video: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        conditioning_scale: Union[float, List[float]] = 1.0,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_videos_per_prompt

        if video is None:
            video = jnp.zeros((batch_size, 3, num_frames, height, width), dtype=jnp.float32)
        if mask is None:
            mask = jnp.ones((batch_size, 1, num_frames, height, width), dtype=jnp.float32)
        key, ctrl_key = jax.random.split(key)
        control = self.prepare_control_latents(video, mask * jnp.ones_like(video[:, :1]), ctrl_key)

        n_vace = len(transformer.config.vace_layers)
        if isinstance(conditioning_scale, (int, float)):
            cond_scale = jnp.full((n_vace,), float(conditioning_scale))
        else:
            cond_scale = jnp.asarray(conditioning_scale, dtype=jnp.float32)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latent_frames = control.shape[2]
        shape = (batch_size, transformer.config.in_channels, latent_frames,
                 height // self.vae_scale_factor_spatial, width // self.vae_scale_factor_spatial)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        if hasattr(state, "init_noise_sigma"):
            latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, control, cond_scale,
                          state.timesteps, state)

        if output_type == "latent":
            frames = latents
        else:
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                latents = latents * std + mean
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            frames = decode(vae_params, latents)
            if output_type == "np":
                frames = np.asarray(
                    jnp.transpose(jnp.clip(frames / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)).astype(jnp.float32)
                )
        if not return_dict:
            return (frames,)
        return WanPipelineOutput(frames=frames)

"""SkyReels-V2 text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/skyreels_v2/pipeline_skyreels_v2.py:107`):
UMT5 text encoding (mask-zeroed), UniPC flow denoise (flow_shift 8.0 for t2v),
CFG batch-2, causal-VAE decode. The diffusion-forcing variants' per-frame
timestep machinery lives in the transformer
(`transformer_skyreels_v2.py`, parity-tested); this pipeline drives the
standard synchronous schedule as ONE jitted `lax.scan`.
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
class SkyReelsV2PipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class SkyReelsV2Pipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 512):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 512):
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

    def _denoise(self, t_params, latents, prompt_embeds, negative_embeds, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            noise_cond = transformer(t_params, latents, timestep, prompt_embeds).sample
            if do_cfg:
                noise_uncond = transformer(t_params, latents, timestep, negative_embeds).sample
                noise_pred = noise_uncond + guidance_scale * (noise_cond - noise_uncond)
            else:
                noise_pred = noise_cond
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 544,
        width: int = 960,
        num_frames: int = 97,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        shape = (
            batch_size,
            transformer.config.in_channels,
            num_latent_frames,
            height // self.vae_scale_factor_spatial,
            width // self.vae_scale_factor_spatial,
        )
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sample_shape=shape)
        except TypeError:
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, prompt_embeds, negative_embeds, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                latents = latents * std + mean
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return SkyReelsV2PipelineOutput(frames=video)

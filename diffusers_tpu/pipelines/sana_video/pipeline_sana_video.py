"""Sana-Video text-to-video pipeline.

Behavioral mirror of the reference
`pipelines/sana_video/pipeline_sana_video.py`: Gemma-style LLM text
conditioning (last hidden state, mask-selected, optional complex-human-
instruction prefix omitted here), flow-match denoise with CFG, causal 3D
VAE decode. Motion control rides the prompt (" motion score: N.").
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
class SanaVideoPipelineOutput(BaseOutput):
    frames: Union[jax.Array, np.ndarray]


class SanaVideoPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        cfg = self.vae[0].config if vae is not None else None
        if cfg is not None and cfg.get("temporal_compression_ratio") is not None:
            self.vae_scale_factor_temporal = cfg.get("temporal_compression_ratio")
            self.vae_scale_factor_spatial = cfg.get("spatial_compression_ratio", 8)
        elif cfg is not None and cfg.get("scale_factor_temporal") is not None:
            self.vae_scale_factor_temporal = cfg.get("scale_factor_temporal")
            self.vae_scale_factor_spatial = cfg.get("scale_factor_spatial")
        else:
            self.vae_scale_factor_temporal = 4
            self.vae_scale_factor_spatial = 8

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 300):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            return embeds, mask

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = encode(prompt)
        neg_embeds = neg_mask = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_mask = encode(negative_prompt)
        return prompt_embeds, prompt_mask, neg_embeds, neg_mask

    def _denoise(self, tr_params, latents, prompt_embeds, prompt_mask, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                tr_params, latent_input, prompt_embeds,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_attention_mask=prompt_mask,
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
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 300,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_videos_per_prompt

        state = self.scheduler.set_timesteps(num_inference_steps)
        latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
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
        latents = denoise(tr_params, latents, prompt_embeds, prompt_mask, state.timesteps, state)

        if output_type == "latent":
            frames = latents
        else:
            scaling = getattr(vae.config, "scaling_factor", None)
            z = latents / scaling if scaling else latents
            decode = self._jit("decode", lambda p, z_: vae.decode(p, z_).sample)
            frames = decode(vae_params, z)
            if output_type == "np":
                frames = np.asarray(
                    jnp.transpose(jnp.clip(frames / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)).astype(jnp.float32)
                )
        if not return_dict:
            return (frames,)
        return SanaVideoPipelineOutput(frames=frames)

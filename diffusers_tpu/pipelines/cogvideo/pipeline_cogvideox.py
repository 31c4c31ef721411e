"""CogVideoXPipeline — text-to-video generation with CogVideoX.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/cogvideo/pipeline_cogvideox.py:139`):
T5 prompt embedding (226 tokens, zeroed past each prompt's length), CFG as a
batch-2 forward, optional dynamic guidance rescale, frames-first latents
[B, F, C, H, W], 3D RoPE for the 1.5 checkpoints, scanned denoise loop,
CogVideoX 3D VAE decode. The denoise loop is one `lax.scan` under jit."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class CogVideoXPipelineOutput(BaseOutput):
    frames: np.ndarray  # [B, T, H, W, C]


class CogVideoXPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor_spatial = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.vae_scale_factor_temporal = (
            int(vae[0].config.temporal_compression_ratio) if vae is not None else 4
        )

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") else (ids != 0).astype(jnp.int32)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt, do_cfg, max_sequence_length):
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

    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig")

    def _denoise(self, t_params, latents, prompt_embeds, negative_embeds, rope, state,
                 guidance_scale, use_dynamic_cfg, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        num_steps = state.timesteps.shape[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            embeds = (
                jnp.concatenate([negative_embeds, prompt_embeds], axis=0) if do_cfg else prompt_embeds
            )
            noise_pred = transformer(
                t_params,
                latent_input,
                embeds,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                image_rotary_emb=rope,
            ).sample
            if do_cfg:
                g = guidance_scale
                if use_dynamic_cfg:
                    # reference `:701`: 1 + g·((1−cos(π·((S−t/(T/S))/S)))/2)
                    ratio = (num_steps - t.astype(jnp.float32) / (1000.0 / num_steps)) / num_steps
                    g = 1.0 + (guidance_scale - 1.0) * ((1.0 - jnp.cos(jnp.pi * ratio)) / 2.0)
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + g * (text - uncond)
            return noise_pred

        return denoise_scan(forward, scheduler, latents, state, state.timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, num_latent_frames, transformer.config.in_channels, lh, lw)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        rope = None
        if transformer.config.use_rotary_positional_embeddings:
            rope = transformer.rope(height=lh, width=lw, num_frames=num_latent_frames)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    use_dynamic_cfg=use_dynamic_cfg, do_cfg=do_cfg), callback_on_step_end,
            static=(guidance_scale, use_dynamic_cfg, do_cfg))
        latents = denoise(t_params, latents, prompt_embeds, negative_embeds, rope, state)

        if output_type == "latent":
            video = latents
        else:
            z = jnp.transpose(latents, (0, 2, 1, 3, 4)) / vae.config.scaling_factor
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, z)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return CogVideoXPipelineOutput(frames=video)

"""EasyAnimate text-to-video pipeline.

Behavioral mirror of the reference
`pipelines/easyanimate/pipeline_easyanimate.py`: chat-template LLM text
conditioning reading `hidden_states[-2]` (`:333`), flow-match timesteps
with `mu=1` (`:672`), CFG with optional guidance rescale (`:100`), VAE
decode. The tokenizer is duck-typed: anything with
`__call__(prompts) -> (input_ids, attention_mask)` works — the reference
wires a Qwen2-VL processor here.
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
class EasyAnimatePipelineOutput(BaseOutput):
    frames: Union[jax.Array, np.ndarray]


class EasyAnimatePipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, transformer, scheduler):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.vae_scale_factor_temporal = getattr(self.vae[0].config, "temporal_compression_ratio", 4) \
            if vae is not None else 4

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 256):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
            return out.hidden_states[-2], mask

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

    def _denoise(self, tr_params, latents, prompt_embeds, timesteps, state,
                 guidance_scale, guidance_rescale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                tr_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                if guidance_rescale > 0:
                    axes = tuple(range(1, noise_pred.ndim))
                    std_text = jnp.std(text, axis=axes, keepdims=True)
                    std_cfg = jnp.std(noise_pred, axis=axes, keepdims=True)
                    rescaled = noise_pred * (std_text / std_cfg)
                    noise_pred = guidance_rescale * rescaled + (1 - guidance_rescale) * noise_pred
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 512,
        num_frames: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_rescale: float = 0.0,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
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
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_videos_per_prompt

        state = self.scheduler.set_timesteps(num_inference_steps, mu=1.0)
        latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        shape = (batch_size, transformer.config.in_channels, latent_frames,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        if hasattr(state, "init_noise_sigma"):
            latents = latents * state.init_noise_sigma

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    guidance_rescale=guidance_rescale, do_cfg=do_cfg),
            static=(guidance_scale, guidance_rescale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample
            )
            video = decode(vae_params, latents)
            if output_type == "np":
                video = np.asarray(
                    jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)).astype(jnp.float32)
                )
        if not return_dict:
            return (video,)
        return EasyAnimatePipelineOutput(frames=video)

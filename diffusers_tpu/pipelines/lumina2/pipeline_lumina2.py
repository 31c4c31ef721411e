"""Lumina Image 2.0 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/lumina2/pipeline_lumina2.py`):
Gemma-2 prompt encoding from the second-to-last hidden state with a system
prompt prefix (`:185,:222,:288`), resolution-dependent dynamic time shifting,
inverted flow timestep (1 - t/1000) with negated prediction (`:667,:698`),
CFG truncation ratio and CFG renormalization (`:679-694`). TPU-first: one
jitted `lax.scan`, CFG as a batch-2 forward with concatenated masks.
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

DEFAULT_SYSTEM_PROMPT = (
    "You are an assistant designed to generate superior images with the superior degree of "
    "image-text alignment based on textual prompts or user prompts."
)


@dataclass
class Lumina2PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Lumina2Pipeline(DiffusionPipeline):
    def __init__(self, transformer, scheduler, vae, text_encoder, tokenizer):
        super().__init__()
        self.register_modules(
            transformer=transformer, scheduler=scheduler, vae=vae,
            text_encoder=text_encoder, tokenizer=tokenizer,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.system_prompt = DEFAULT_SYSTEM_PROMPT

    def _get_gemma_prompt_embeds(self, prompt: List[str], max_sequence_length: int):
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
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        # second-to-last hidden state (reference `:222`)
        return out.hidden_states[-2], mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True,
                      system_prompt: Optional[str] = None, max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]
        if system_prompt is None:
            system_prompt = self.system_prompt
        if system_prompt:
            prompt = [system_prompt + " <Prompt Start> " + p for p in prompt]
        prompt_embeds, prompt_mask = self._get_gemma_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = self._get_gemma_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, prompt_mask, neg_embeds, neg_mask

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, timesteps, state,
                 guidance_scale, do_cfg, cfg_trunc_ratio, cfg_normalization, num_steps):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, inp):
            i, t = inp
            latents, sstate = carry
            current_timestep = 1.0 - t / scheduler.config.num_train_timesteps
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(current_timestep, (latent_input.shape[0],)).astype(latents.dtype)
            noise_pred = transformer(
                t_params, latent_input, timestep, prompt_embeds, prompt_mask
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                guided = uncond + guidance_scale * (cond - uncond)
                if cfg_normalization:
                    cond_norm = jnp.linalg.norm(cond.astype(jnp.float32), axis=-1, keepdims=True)
                    noise_norm = jnp.linalg.norm(guided.astype(jnp.float32), axis=-1, keepdims=True)
                    guided = (guided.astype(jnp.float32) * cond_norm / jnp.maximum(noise_norm, 1e-12)).astype(guided.dtype)
                # CFG truncation: pure-cond prediction after the ratio (`:667`)
                use_cfg = (i + 1.0) / num_steps <= cfg_trunc_ratio
                noise_pred = jnp.where(use_cfg, guided, cond)
            out = scheduler.step(sstate, -noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        steps_idx = jnp.arange(timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps_idx, timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 4.0,
        cfg_trunc_ratio: float = 1.0,
        cfg_normalization: bool = True,
        system_prompt: Optional[str] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = height or transformer.config.sample_size * self.vae_scale_factor
        width = width or transformer.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, system_prompt, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)

        shape = (
            batch_size,
            transformer.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = randn_tensor(shape, key=key)

        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        p = transformer.config.patch_size
        image_seq_len = (shape[2] // p) * (shape[3] // p)
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(
                self._denoise,
                guidance_scale=guidance_scale,
                do_cfg=do_cfg,
                cfg_trunc_ratio=cfg_trunc_ratio,
                cfg_normalization=cfg_normalization,
                num_steps=num_inference_steps,
            ),
            static=(guidance_scale, do_cfg, cfg_trunc_ratio, cfg_normalization, num_inference_steps),
        )
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda p_, z: vae.decode(p_, z / vae.config.scaling_factor).sample
            )
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return Lumina2PipelineOutput(images=image)

"""Sana text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/sana/pipeline_sana.py:675`): CFG as
batch-2 through the linear-attention transformer, flow-matching scheduler, and
the DC-AE decoder — denoise is one `lax.scan`. Text encoding uses the Gemma
tokenizer+encoder via transformers on the host when registered (same boundary
as tokenizers elsewhere in this framework); precomputed `prompt_embeds` (+
attention masks) are first-class for a fully device-side serving path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class SanaPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class SanaPipeline(DiffusionPipeline):
    _optional_components = ["tokenizer", "text_encoder"]

    def __init__(self, transformer, vae, scheduler, tokenizer=None, text_encoder=None):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, scheduler=scheduler, tokenizer=tokenizer, text_encoder=text_encoder
        )
        self.vae_scale_factor = getattr(self.vae[0], "spatial_compression_ratio", 32) if vae is not None else 32
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def encode_prompt(self, prompt, negative_prompt, do_cfg, max_sequence_length: int = 300):
        """Gemma prompt encode. Native path: a ``(Gemma2Model, params)`` pair
        (models/text_encoders/gemma.py — runs on device). Fallback: a torch
        transformers causal LM on the host (the boundary the reference uses,
        pipeline_sana.py encode_prompt)."""
        if self.tokenizer is None or self.text_encoder is None:
            raise ValueError("no tokenizer/text_encoder registered — pass prompt_embeds instead")

        if isinstance(self.text_encoder, tuple):  # native JAX Gemma
            encoder, enc_params = self.text_encoder

            def encode(texts):
                inputs = self.tokenizer(
                    texts, padding="max_length", max_length=max_sequence_length, truncation=True,
                    return_tensors="np",
                )
                mask = jnp.asarray(inputs.attention_mask)
                hidden = encoder(enc_params, jnp.asarray(inputs.input_ids), attention_mask=mask).last_hidden_state
                return hidden, mask

            prompts = [prompt] if isinstance(prompt, str) else list(prompt)
            embeds, mask = encode(prompts)
            if not do_cfg:
                return embeds, mask
            neg = negative_prompt if negative_prompt is not None else ""
            neg_prompts = [neg] * len(prompts) if isinstance(neg, str) else list(neg)
            neg_embeds, neg_mask = encode(neg_prompts)
            return jnp.concatenate([neg_embeds, embeds]), jnp.concatenate([neg_mask, mask])

        import torch

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length, truncation=True, return_tensors="pt"
            )
            with torch.no_grad():
                hidden = self.text_encoder(
                    inputs.input_ids, attention_mask=inputs.attention_mask, output_hidden_states=True
                ).hidden_states[-1]
            return jnp.asarray(hidden.float().numpy()), jnp.asarray(inputs.attention_mask.numpy())

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        embeds, mask = encode(prompts)
        if not do_cfg:
            return embeds, mask
        neg = negative_prompt if negative_prompt is not None else ""
        neg_prompts = [neg] * len(prompts) if isinstance(neg, str) else list(neg)
        neg_embeds, neg_mask = encode(neg_prompts)
        return jnp.concatenate([neg_embeds, embeds]), jnp.concatenate([neg_mask, mask])

    def _denoise(self, transformer_params, prompt_embeds, prompt_attention_mask, latents,
                 guidance_scale, num_inference_steps, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        ts_scale = transformer.config.get("timestep_scale", 1.0)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)).astype(jnp.float32) * ts_scale
            noise_pred = transformer(
                transformer_params, latent_input,
                encoder_hidden_states=prompt_embeds,
                timestep=timestep,
                encoder_attention_mask=prompt_attention_mask,
            ).sample.astype(jnp.float32)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            if transformer.config.out_channels // 2 == latents.shape[1]:
                noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 20,
        guidance_scale: float = 4.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        prompt_attention_mask: Optional[jax.Array] = None,
        max_sequence_length: int = 300,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        vae, vae_params = self.vae
        height = height or transformer.config.sample_size * self.vae_scale_factor
        width = width or transformer.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds, prompt_attention_mask = self.encode_prompt(
                prompt, negative_prompt, do_cfg, max_sequence_length
            )
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (
            batch_size,
            transformer.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = randn_tensor(shape, key=key)

        denoise = self._jit(
            "denoise",
            partial(
                self._denoise,
                guidance_scale=guidance_scale,
                num_inference_steps=num_inference_steps,
                do_cfg=do_cfg,
            ),
            static=(guidance_scale, num_inference_steps, do_cfg),
        )
        latents = denoise(transformer_params, prompt_embeds, prompt_attention_mask, latents)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return SanaPipelineOutput(images=image)

"""AuraFlow text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/aura_flow/pipeline_aura_flow.py`):
mask-zeroed UMT5 text encoding (`:300-318`), CFG batch-2 flow-matching
denoise, VAE decode. TPU-first: one jitted `lax.scan` over all steps.
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
class AuraFlowPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class AuraFlowPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            truncation=True,
            max_length=max_sequence_length,
            padding="max_length",
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = self._encode(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        negative_embeds = self._encode(negative_prompt, max_sequence_length)
        return jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

    def _denoise(self, t_params, latents, prompt_embeds, timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            # flow-match timestep in [0, 1] (reference `:576` t/1000)
            timestep = jnp.broadcast_to(t / 1000.0, (latent_input.shape[0],)).astype(latents.dtype)
            noise_pred = transformer(t_params, latent_input, prompt_embeds, timestep).sample
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
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
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
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (
            batch_size,
            transformer.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = randn_tensor(shape, key=key)

        state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, prompt_embeds, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample
            )
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return AuraFlowPipelineOutput(images=image)

"""CogView3-Plus text-to-image pipeline.

Behavioral mirror of the reference
`pipelines/cogview3/pipeline_cogview3plus.py`: T5 sequence conditioning
(max_sequence_length 224), SDXL-style original/target/crop size tensors
passed into the transformer each step (`:592-604`), CFG batch-2 denoise.
TPU-first single-scan denoise.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class CogView3PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class CogView3PlusPipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode(self, prompts: List[str], max_sequence_length: int) -> jax.Array:
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompts, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np", add_special_tokens=True,
        )
        ids = jnp.asarray(inputs.input_ids)
        return text_encoder(te_params, ids).last_hidden_state

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 224):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = self._encode(prompt, max_sequence_length)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = self._encode(negative_prompt, max_sequence_length)
        return prompt_embeds, negative_embeds

    def _denoise(self, tr_params, latents, prompt_embeds, original_size, target_size, crop_coords,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = transformer(
                tr_params, latent_input, prompt_embeds,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                original_size=original_size, target_size=target_size, crop_coords=crop_coords,
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
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        max_sequence_length: int = 224,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or transformer.config.sample_size * self.vae_scale_factor
        width = width or transformer.config.sample_size * self.vae_scale_factor
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_images_per_prompt
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        shape = (batch_size, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        cond_batch = batch_size * (2 if do_cfg else 1)
        os_t = jnp.tile(jnp.asarray([original_size], dtype=jnp.float32), (cond_batch, 1))
        ts_t = jnp.tile(jnp.asarray([target_size], dtype=jnp.float32), (cond_batch, 1))
        cc_t = jnp.tile(jnp.asarray([crops_coords_top_left], dtype=jnp.float32), (cond_batch, 1))

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, os_t, ts_t, cc_t, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return CogView3PipelineOutput(images=image)

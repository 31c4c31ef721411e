"""CogView4 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/cogview4/pipeline_cogview4.py`):
GLM-4 prompt encoding from the second-to-last hidden state (`:216`),
linear-quadratic-free sigma ladder with the linear-shift mu (`:59`), true CFG
with separate cond/uncond forwards (batched here), size/crop conditioning.
TPU-first: one jitted `lax.scan`.
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


def calculate_shift_cogview4(image_seq_len, base_seq_len: int = 256,
                             base_shift: float = 0.25, max_shift: float = 0.75) -> float:
    m = (image_seq_len / base_seq_len) ** 0.5
    return m * max_shift + base_shift


@dataclass
class CogView4PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class CogView4Pipeline(DiffusionPipeline):
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
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") else None
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        return out.hidden_states[-2]

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 224):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = self._encode(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        return prompt_embeds, self._encode(negative_prompt, max_sequence_length)

    def _denoise(self, t_params, latents, prompt_embeds, neg_embeds, cond_meta, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        original_size, target_size, crop_coords = cond_meta

        def forward(latents, t, embeds):
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            return transformer(
                t_params, latents, embeds, timestep,
                original_size=original_size, target_size=target_size, crop_coords=crop_coords,
            ).sample

        def step_fn(carry, t):
            latents, sstate = carry
            noise_pred = forward(latents, t, prompt_embeds)
            if do_cfg:
                noise_uncond = forward(latents, t, neg_embeds)
                noise_pred = noise_uncond + guidance_scale * (noise_pred - noise_uncond)
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
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 224,
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
        prompt_embeds, neg_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        shape = (
            batch_size,
            transformer.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        p = transformer.config.patch_size
        image_seq_len = (shape[2] // p) * (shape[3] // p)
        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        mu = calculate_shift_cogview4(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("base_shift", 0.25),
            self.scheduler.config.get("max_shift", 0.75),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        original_size = original_size or (height, width)
        cond_meta = (
            jnp.asarray([list(original_size)] * batch_size, jnp.float32),
            jnp.asarray([[height, width]] * batch_size, jnp.float32),
            jnp.asarray([list(crops_coords_top_left)] * batch_size, jnp.float32),
        )

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, prompt_embeds, neg_embeds, cond_meta, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda pr, z: vae.decode(pr, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return CogView4PipelineOutput(images=image)

"""Kandinsky 3 text-to-image pipeline.

Behavioral mirror of the reference
`pipelines/kandinsky3/pipeline_kandinsky3.py`: T5 embeds zeroed at
padding then mask-multiplied (`:85,168`), Kandinsky3UNet denoise under
DDPM with CFG, MoVQ decode. TPU-first: single-scan denoise (the optional
`_cut_context` dynamic truncation is skipped — masked tokens are already
zeroed, so the static-length sequence is numerically equivalent under the
additive mask).
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
class Kandinsky3PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


def downscale_height_and_width(height, width, scale_factor=8):
    new_height = height // scale_factor**2
    if height % scale_factor**2 != 0:
        new_height += 1
    new_width = width // scale_factor**2
    if width % scale_factor**2 != 0:
        new_width += 1
    return new_height * scale_factor, new_width * scale_factor


class Kandinsky3Pipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, unet, scheduler, movq):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, unet=unet,
            scheduler=scheduler, movq=movq,
        )
        self.movq_scale_factor = 2 ** (len(self.movq[0].config.block_out_channels) - 1) if movq is not None else 8

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_length: int = 128):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_length, truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            embeds = embeds * mask[..., None].astype(embeds.dtype)
            return embeds, mask

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = encode(prompt)
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_mask = encode(negative_prompt)
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)
        return prompt_embeds, prompt_mask

    def _denoise(self, unet_params, latents, prompt_embeds, prompt_mask, timesteps, state,
                 guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=prompt_embeds, encoder_attention_mask=prompt_mask,
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
        num_inference_steps: int = 25,
        guidance_scale: float = 3.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        height: int = 1024,
        width: int = 1024,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        movq, movq_params = self.movq
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, prompt_mask = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_images_per_prompt
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            prompt_mask = jnp.repeat(prompt_mask, num_images_per_prompt, axis=0)

        height, width = downscale_height_and_width(height, width, self.movq_scale_factor)
        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (batch_size, unet.config.in_channels,
                 height // self.movq_scale_factor, width // self.movq_scale_factor),
                key=lat_key,
            )
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(unet_params, latents, prompt_embeds, prompt_mask, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: movq.decode(p, z, force_not_quantize=True).sample
            )
            image = decode(movq_params, latents)
            image = np.asarray(jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1)))

        if not return_dict:
            return (image,)
        return Kandinsky3PipelineOutput(images=image)

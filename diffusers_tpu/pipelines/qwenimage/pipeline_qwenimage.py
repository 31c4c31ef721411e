"""Qwen-Image text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/qwenimage/pipeline_qwenimage.py`):
Qwen2.5-VL prompt encoding through a chat template whose system prefix is
dropped (`:175-223`), Flux-style packed 2x2 latents, dynamic time shifting,
true CFG (`true_cfg_scale`) with separate negative embeds/masks.
TPU-first: one jitted `lax.scan`; cond/uncond batched in one forward.
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
from ..flux.pipeline_flux import FluxPipeline
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, size, texture, "
    "quantity, text, spatial relationships of the objects and background:<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
)
PROMPT_TEMPLATE_START_IDX = 34


@dataclass
class QwenImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class QwenImagePipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 8
        if vae is not None and hasattr(vae[0].config, "get"):
            self.vae_scale_factor = vae[0].config.get("scale_factor_spatial", 8)
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.prompt_template_encode = PROMPT_TEMPLATE
        self.prompt_template_encode_start_idx = PROMPT_TEMPLATE_START_IDX

    _pack_latents = staticmethod(FluxPipeline._pack_latents)
    _unpack_latents = staticmethod(FluxPipeline._unpack_latents)

    def _get_qwen_prompt_embeds(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        drop_idx = self.prompt_template_encode_start_idx
        txt = [self.prompt_template_encode.format(p) for p in prompt]
        inputs = self.tokenizer(
            txt,
            max_length=max_sequence_length + drop_idx,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        hidden = out.hidden_states[-1]
        # drop the system-template prefix (reference `:211`)
        return hidden[:, drop_idx:], mask[:, drop_idx:]

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 1024):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, mask = self._get_qwen_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return embeds, mask, None, None
        negative_prompt = negative_prompt or " "
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = self._get_qwen_prompt_embeds(negative_prompt, max_sequence_length)
        return embeds, mask, neg_embeds, neg_mask

    def _denoise(self, t_params, latents, embeds, mask, timesteps, state,
                 img_shapes=None, true_cfg_scale=1.0, do_cfg=False):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)) / 1000.0
            noise_pred = transformer(
                t_params, latent_input, embeds, mask, timestep, img_shapes=img_shapes
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + true_cfg_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def _decode_packed_latents(self, latents, height: int, width: int, output_type: str):
        """Unpack → Wan-stat de-normalize → (3D-aware) VAE decode → postprocess."""
        if output_type == "latent":
            return latents
        vae, vae_params = self.vae
        latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)
        # Qwen-Image VAE is Wan-family: de-normalize with per-channel stats
        lm = vae.config.get("latents_mean")
        ls = vae.config.get("latents_std")
        if lm is not None and ls is not None:
            mean = jnp.asarray(lm).reshape(1, -1, 1, 1)
            std = jnp.asarray(ls).reshape(1, -1, 1, 1)
            latents = latents * std + mean
        if "temperal_downsample" in dict(vae.config) or "scale_factor_temporal" in dict(vae.config):
            # Wan-family 3D causal VAE (incl. AutoencoderKLQwenImage): add a frame axis
            dec = vae.decode(vae_params, latents[:, :, None]).sample[:, :, 0]
        else:
            dec = vae.decode(vae_params, latents / vae.config.scaling_factor).sample
        return self.image_processor.postprocess(dec, output_type=output_type)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        true_cfg_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 1024,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = true_cfg_scale > 1.0
        embeds, mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, embeds], axis=0)
            mask = jnp.concatenate([neg_mask, mask], axis=0)

        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        num_channels_latents = transformer.config.in_channels // 4
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        img_shapes = [(1, lh // 2, lw // 2)]

        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            latents.shape[1],
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
            partial(self._denoise, img_shapes=tuple(img_shapes), true_cfg_scale=true_cfg_scale, do_cfg=do_cfg),
            static=(tuple(img_shapes), true_cfg_scale, do_cfg),
        )
        latents = denoise(t_params, latents, embeds, mask, state.timesteps, state)

        image = self._decode_packed_latents(latents, height, width, output_type)

        if not return_dict:
            return (image,)
        return QwenImagePipelineOutput(images=image)

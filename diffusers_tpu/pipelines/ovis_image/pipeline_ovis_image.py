"""Ovis-Image text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ovis_image/pipeline_ovis_image.py:129`
OvisImagePipeline): Qwen3 chat-template encoding with a captioning system
prompt prefix, last_hidden_state zeroed at padding and template-prefix
tokens dropped (`user_prompt_begin_id = 28`, `:230`), DIAGONAL text rope
ids (arange on both axes 1 and 2, `:263`), Flux-packed latents with dynamic
shift, plain CFG, `timestep/1000` model time with an internal ×1000 sinusoid.

TPU-first: cond/uncond share one scanned jit (their rope ids are identical).
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


@dataclass
class OvisImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class OvisImagePipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.system_prompt = (
            "Describe the image by detailing the color, quantity, text, shape, size, texture, "
            "spatial relationships of the objects and background: "
        )
        self.user_prompt_begin_id = 28
        self.default_sample_size = 128

    _pack_latents = staticmethod(FluxPipeline._pack_latents)
    _unpack_latents = staticmethod(FluxPipeline._unpack_latents)

    def _get_messages(self, prompt):
        prompt = [prompt] if isinstance(prompt, str) else prompt
        messages = []
        for p in prompt:
            message = [{"role": "user", "content": self.system_prompt + p}]
            messages.append(self.tokenizer.apply_chat_template(
                message, tokenize=False, add_generation_prompt=True, enable_thinking=False))
        return messages

    def _get_ovis_prompt_embeds(self, prompt, num_images_per_prompt=1, max_sequence_length=256):
        text_encoder, te_params = self.text_encoder
        messages = self._get_messages(prompt)
        batch_size = len(messages)
        tokens = self.tokenizer(messages, padding="max_length", truncation=True,
                                max_length=max_sequence_length + self.user_prompt_begin_id,
                                return_tensors="np", add_special_tokens=False)
        ids = jnp.asarray(np.asarray(tokens["input_ids"]))
        mask = jnp.asarray(np.asarray(tokens["attention_mask"]))
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        embeds = embeds * mask[..., None].astype(embeds.dtype)
        embeds = embeds[:, self.user_prompt_begin_id:, :]
        if num_images_per_prompt > 1:
            embeds = jnp.repeat(embeds, num_images_per_prompt, axis=0)
        return embeds

    def encode_prompt(self, prompt, num_images_per_prompt=1, max_sequence_length=256,
                      prompt_embeds=None):
        if prompt_embeds is None:
            prompt_embeds = self._get_ovis_prompt_embeds(prompt, num_images_per_prompt,
                                                         max_sequence_length)
        # DIAGONAL text ids (reference `:263`): arange on axes 1 AND 2
        n = prompt_embeds.shape[1]
        text_ids = np.zeros((n, 3), np.float32)
        text_ids[:, 1] = np.arange(n)
        text_ids[:, 2] = np.arange(n)
        return prompt_embeds, text_ids

    @staticmethod
    def _prepare_latent_image_ids(height, width):
        ids = np.zeros((height, width, 3), np.float32)
        ids[..., 1] = np.arange(height)[:, None]
        ids[..., 2] = np.arange(width)[None, :]
        return ids.reshape(height * width, 3)

    def _denoise(self, t_params, latents, embeds, neg_embeds, rope, neg_rope, timesteps,
                 state, guidance_scale, do_cfg, num_train_timesteps):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            tt = jnp.broadcast_to(t / num_train_timesteps, (lat.shape[0],)).astype(lat.dtype)
            pred = transformer(t_params, lat, embeds, tt, image_rotary_emb=rope).sample
            if do_cfg:
                neg = transformer(t_params, lat, neg_embeds, tt, image_rotary_emb=neg_rope).sample
                pred = neg + guidance_scale * (pred - neg)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        if prompt is not None and isinstance(prompt, str):
            batch_size = 1
        elif prompt is not None:
            batch_size = len(prompt)
        else:
            batch_size = prompt_embeds.shape[0]
        do_cfg = guidance_scale > 1

        embeds, text_ids = self.encode_prompt(prompt, num_images_per_prompt,
                                              max_sequence_length, prompt_embeds)
        neg_embeds = neg_text_ids = None
        if do_cfg:
            if negative_prompt is None:
                negative_prompt = [""] * batch_size
            elif isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_text_ids = self.encode_prompt(
                negative_prompt, num_images_per_prompt, max_sequence_length,
                negative_prompt_embeds)

        num_channels_latents = transformer.config.in_channels // 4
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        total_batch = batch_size * num_images_per_prompt
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((total_batch, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        if sigmas is None:
            sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            latents.shape[1],
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=list(sigmas), mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        rope = transformer.pos_embed(np.concatenate([text_ids, img_ids], axis=0))
        neg_rope = rope
        if do_cfg and neg_embeds.shape[1] != embeds.shape[1]:
            neg_rope = transformer.pos_embed(np.concatenate([neg_text_ids, img_ids], axis=0))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(float(guidance_scale), do_cfg))
        latents = denoise(t_params, latents, embeds, neg_embeds, rope, neg_rope,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            lat = self._unpack_latents(latents, height, width, self.vae_scale_factor)
            lat = lat / vae.config.scaling_factor + (vae.config.get("shift_factor") or 0.0)
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            image = decode(vae_params, lat)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return OvisImagePipelineOutput(images=image)

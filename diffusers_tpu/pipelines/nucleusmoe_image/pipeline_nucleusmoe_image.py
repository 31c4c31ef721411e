"""NucleusMoE text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/nucleusmoe_image/pipeline_nucleusmoe_image.py:132`
NucleusMoEImagePipeline): Qwen3-VL chat-template encoding with a spatial-
layout system prompt, `hidden_states[-8]` tap (`:236`), pad-to-multiple-of-8
tokenization, Flux-style packed latents over the QwenImage 3D VAE, dynamic
shift, CFG with exact norm-rescale (`comb · cond_norm/noise_norm`, `:595`),
and NEGATED model output (`noise_pred = -noise_pred`, `:600` — the model
predicts the reverse velocity).

TPU-first: the denoise loop is one scanned jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, List, Optional, Union

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
    "You are an image generation assistant. Follow the user's prompt literally. Pay careful "
    "attention to spatial layout: objects described as on the left must appear on the left, on "
    "the right on the right. Match exact object counts and assign colors to the correct objects."
)


@dataclass
class NucleusMoEImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class NucleusMoEImagePipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, scheduler, vae, text_encoder, processor):
        super().__init__()
        self.register_modules(transformer=transformer, scheduler=scheduler, vae=vae,
                              text_encoder=text_encoder, processor=processor)
        self.vae_scale_factor = (
            2 ** len(vae[0].config.temperal_downsample) if vae is not None else 8
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.default_sample_size = 128
        self.default_max_sequence_length = 1024
        self.default_return_index = -8

    def _format_prompt(self, prompt: str, system_prompt: Optional[str] = None) -> str:
        if system_prompt is None:
            system_prompt = DEFAULT_SYSTEM_PROMPT
        messages = [
            {"role": "system", "content": system_prompt},
            {"role": "user", "content": [{"type": "text", "text": prompt}]},
        ]
        return self.processor.apply_chat_template(messages, tokenize=False,
                                                  add_generation_prompt=True)

    def encode_prompt(self, prompt, num_images_per_prompt: int = 1,
                      max_sequence_length: Optional[int] = None,
                      return_index: Optional[int] = None):
        text_encoder, te_params = self.text_encoder
        return_index = return_index or self.default_return_index
        prompt = [prompt] if isinstance(prompt, str) else prompt
        formatted = [self._format_prompt(p) for p in prompt]
        inputs = self.processor(
            text=formatted, padding="longest", pad_to_multiple_of=8,
            max_length=max_sequence_length, truncation=True, return_attention_mask=True,
            return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        embeds = out.hidden_states[return_index]
        if num_images_per_prompt > 1:
            embeds = jnp.repeat(embeds, num_images_per_prompt, axis=0)
            mask = jnp.repeat(mask, num_images_per_prompt, axis=0)
        if bool(jnp.all(mask)):
            mask = None
        return embeds, mask

    @staticmethod
    def _pack_latents(latents, p: int):
        b, c, h, w = latents.shape
        latents = latents.reshape(b, c, h // p, p, w // p, p)
        latents = jnp.transpose(latents, (0, 2, 4, 1, 3, 5))
        return latents.reshape(b, (h // p) * (w // p), c * p * p)

    @staticmethod
    def _unpack_latents(latents, height, width, patch_size, vae_scale_factor):
        b, n, ch = latents.shape
        p = patch_size
        h = p * (int(height) // (vae_scale_factor * p))
        w = p * (int(width) // (vae_scale_factor * p))
        latents = latents.reshape(b, h // p, w // p, ch // (p * p), p, p)
        latents = jnp.transpose(latents, (0, 3, 1, 4, 2, 5))
        return latents.reshape(b, ch // (p * p), 1, h, w)

    def _denoise(self, t_params, latents, embeds, mask, neg_embeds, neg_mask,
                 timesteps, state, img_shapes, guidance_scale, do_cfg, num_train_timesteps):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            tt = jnp.broadcast_to(t / num_train_timesteps, (lat.shape[0],)).astype(lat.dtype)
            pred = transformer(t_params, lat, img_shapes, embeds,
                               encoder_hidden_states_mask=mask, timestep=tt).sample
            if do_cfg:
                neg = transformer(t_params, lat, img_shapes, neg_embeds,
                                  encoder_hidden_states_mask=neg_mask, timestep=tt).sample
                comb = neg + guidance_scale * (pred - neg)
                cond_norm = jnp.linalg.norm(pred, axis=-1, keepdims=True)
                noise_norm = jnp.linalg.norm(comb, axis=-1, keepdims=True)
                pred = comb * (cond_norm / noise_norm)
            # the model predicts the REVERSE velocity (reference `:600`)
            return -pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        guidance_scale: float = 4.0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        num_images_per_prompt: int = 1,
        max_sequence_length: Optional[int] = None,
        return_index: Optional[int] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        max_sequence_length = max_sequence_length or self.default_max_sequence_length
        if key is None:
            key = jax.random.PRNGKey(0)

        if isinstance(prompt, str):
            batch_size = 1
        else:
            batch_size = len(prompt)
        do_cfg = guidance_scale > 1
        if do_cfg and negative_prompt is None:
            negative_prompt = [""] * batch_size

        embeds, mask = self.encode_prompt(prompt, num_images_per_prompt,
                                          max_sequence_length, return_index)
        neg_embeds = neg_mask = None
        if do_cfg:
            neg_embeds, neg_mask = self.encode_prompt(negative_prompt, num_images_per_prompt,
                                                      max_sequence_length, return_index)

        p = transformer.config.patch_size
        num_channels_latents = transformer.config.in_channels // 4
        lh = p * (int(height) // (self.vae_scale_factor * p))
        lw = p * (int(width) // (self.vae_scale_factor * p))
        total_batch = batch_size * num_images_per_prompt
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((total_batch, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents, p)

        img_shapes = [(1, lh // p, lw // p)]

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

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, img_shapes=[tuple(img_shapes[0])],
                    guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(tuple(img_shapes[0]), float(guidance_scale), do_cfg))
        latents = denoise(t_params, latents, embeds, mask, neg_embeds, neg_mask,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            lat = self._unpack_latents(latents, height, width, p, self.vae_scale_factor)
            lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            lat = lat * ls + lm
            decode = self._jit("decode", lambda pp, z: vae.decode(pp, z).sample[:, :, 0])
            image = decode(vae_params, lat)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return NucleusMoEImagePipelineOutput(images=image)

"""Krea 2 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/krea2/pipeline_krea2.py:141`
Krea2Pipeline): Qwen3-VL prompt encoding with the mid-padded template layout
`[prefix | prompt | PAD | suffix]` and cumulative-valid-token positions so
the suffix rope phase ignores padding (`:248`), hidden states tapped from
`text_encoder_select_layers` and stacked per token (`:258`), Flux-style
packed latents over the QwenImage 3D VAE, constant mu 1.15 for the distilled
config (`:615`), and the Krea CFG form
`pred = pred + g * (pred - neg_pred)` (`:665`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

PREFIX = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, size, texture, quantity, "
    "text, spatial relationships of the objects and background:<|im_end|>\n<|im_start|>user\n"
)
SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
PREFIX_IDX = 34
NUM_SUFFIX_TOKENS = 5


@dataclass
class Krea2PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Krea2Pipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, vae, text_encoder, tokenizer, scheduler,
                 text_encoder_select_layers=None, is_distilled: bool = False, patch_size: int = 2):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, scheduler=scheduler,
        )
        if text_encoder_select_layers is None:
            n = transformer[0].config.num_text_layers
            text_encoder_select_layers = tuple(range(1, n + 1))
        self.register_to_config(
            text_encoder_select_layers=tuple(text_encoder_select_layers),
            is_distilled=is_distilled, patch_size=patch_size,
        )
        self.patch_size = patch_size
        # reference `:195` — 2 ** len(temperal_downsample) (QwenImage 3D VAE)
        self.vae_scale_factor = (
            2 ** len(vae[0].config.temperal_downsample) if vae is not None else 8
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * patch_size)

    def get_text_hidden_states(self, prompt, max_sequence_length: int = 512):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        text = [PREFIX + e for e in prompt]
        body = self.tokenizer(text, truncation=True, padding="max_length",
                              max_length=max_sequence_length + PREFIX_IDX - NUM_SUFFIX_TOKENS,
                              return_tensors="np")
        suffix = self.tokenizer([SUFFIX] * len(text), return_tensors="np")
        ids = np.concatenate([np.asarray(body["input_ids"]), np.asarray(suffix["input_ids"])], axis=1)
        mask = np.concatenate([np.asarray(body["attention_mask"]),
                               np.asarray(suffix["attention_mask"])], axis=1).astype(bool)
        # positions count only valid tokens (mid-template padding, reference `:248`)
        position_ids = np.clip(mask.astype(np.int64).cumsum(axis=-1) - 1, 0, None)

        out = text_encoder(te_params, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                           position_ids=jnp.asarray(position_ids), output_hidden_states=True)
        hidden = jnp.stack([out.hidden_states[i] for i in self.config.text_encoder_select_layers], axis=2)
        return hidden[:, PREFIX_IDX:], jnp.asarray(mask[:, PREFIX_IDX:])

    def encode_prompt(self, prompt, max_sequence_length: int = 512):
        return self.get_text_hidden_states(prompt, max_sequence_length)

    @staticmethod
    def _pack_latents(latents, p: int):
        b, c, h, w = latents.shape
        latents = latents.reshape(b, c, h // p, p, w // p, p)
        latents = jnp.transpose(latents, (0, 2, 4, 1, 3, 5))
        return latents.reshape(b, (h // p) * (w // p), c * p * p)

    @staticmethod
    def _unpack_latents(latents, height, width, vae_scale_factor, p: int):
        b, n, ch = latents.shape
        h = height // vae_scale_factor
        w = width // vae_scale_factor
        latents = latents.reshape(b, h // p, w // p, ch // (p * p), p, p)
        latents = jnp.transpose(latents, (0, 3, 1, 4, 2, 5))
        # QwenImage 3D VAE wants a frame axis (reference `:376`)
        return latents.reshape(b, ch // (p * p), 1, h, w)

    @staticmethod
    def prepare_position_ids(text_seq_len: int, grid_height: int, grid_width: int):
        text_ids = np.zeros((text_seq_len, 3), np.float32)
        image_ids = np.zeros((grid_height, grid_width, 3), np.float32)
        image_ids[..., 1] = np.arange(grid_height)[:, None]
        image_ids[..., 2] = np.arange(grid_width)[None, :]
        return np.concatenate([text_ids, image_ids.reshape(-1, 3)], axis=0)

    def _denoise(self, t_params, latents, embeds, mask, neg_embeds, neg_mask, rope,
                 timesteps, state, guidance_scale, do_cfg, num_train_timesteps):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            tt = jnp.broadcast_to(t / num_train_timesteps, (latents.shape[0],)).astype(latents.dtype)
            pred = transformer(t_params, latents, embeds, tt, image_rotary_emb=rope,
                               encoder_attention_mask=mask).sample
            if do_cfg:
                neg = transformer(t_params, latents, neg_embeds, tt, image_rotary_emb=rope,
                                  encoder_attention_mask=neg_mask).sample
                # Krea CFG: extrapolate FROM the conditional (reference `:665`)
                pred = pred + guidance_scale * (pred - neg)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 0.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 0
        embeds, mask = self.encode_prompt(prompt, max_sequence_length)
        batch_size = embeds.shape[0]
        neg_embeds = neg_mask = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_mask = self.encode_prompt(negative_prompt, max_sequence_length)

        p = self.patch_size
        num_channels_latents = transformer.config.in_channels // (p * p)
        lh = height // self.vae_scale_factor
        lw = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents, p)

        if sigmas is None:
            sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        if self.config.is_distilled:
            mu = 1.15
        else:
            mu = calculate_shift(
                latents.shape[1],
                self.scheduler.config.get("base_image_seq_len", 256),
                self.scheduler.config.get("max_image_seq_len", 6400),
                self.scheduler.config.get("base_shift", 0.5),
                self.scheduler.config.get("max_shift", 1.15),
            )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=list(sigmas), mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        position_ids = self.prepare_position_ids(embeds.shape[1], lh // p, lw // p)
        cos, sin = transformer.rotary_emb(position_ids)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, embeds, mask, neg_embeds, neg_mask, rope,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            lat = self._unpack_latents(latents, height, width, self.vae_scale_factor, p)
            lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            lat = lat * ls + lm
            image = vae.decode(vae_params, lat).sample[:, :, 0]
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return Krea2PipelineOutput(images=image)

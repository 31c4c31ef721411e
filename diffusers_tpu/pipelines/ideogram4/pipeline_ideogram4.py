"""Ideogram 4 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ideogram4/pipeline_ideogram4.py:141`
Ideogram4Pipeline): LEFT-padded chat-templated prompts encoded through a
Qwen3-VL causal LM with hidden states tapped at 13 activation layers and
stacked layer-fastest into per-token features (`:335`), the packed
`[pad][text][image]` layout with MRoPE position ids offset 65536, a
SEPARATE `unconditional_transformer` running on the image-only slice with
zeroed text features, per-step guidance weights `v = g·pos + (1−g)·neg`
(`:710`), resolution-aware logit-normal sigma schedule (`:71`), and the
Flux2 BN-stat VAE with 2x2 unpatchify before decode.

TPU-first: cond+uncond run in ONE scanned jit (two transformer stacks,
shared scheduler carry).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...models.transformers.transformer_ideogram4 import (
    IMAGE_POSITION_OFFSET,
    LLM_TOKEN_INDICATOR,
    OUTPUT_IMAGE_INDICATOR,
    SEQUENCE_PADDING_INDICATOR,
)
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

QWEN3_VL_ACTIVATION_LAYERS = (0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30, 33, 35)


def _ndtri(p: np.ndarray) -> np.ndarray:
    try:
        from scipy.special import ndtri
        return ndtri(p)
    except ImportError:  # Acklam-style rational approximation fallback
        import jax.scipy.special as jss
        return np.asarray(jss.ndtri(jnp.asarray(p, jnp.float64)))


def _logit_normal_sigmas(num_inference_steps: int, mu: float, std: float = 1.0,
                         logsnr_min: float = -15.0, logsnr_max: float = 18.0) -> np.ndarray:
    """Ideogram4 logit-normal schedule (reference `:71`)."""
    intervals = np.linspace(0.0, 1.0, num_inference_steps + 1, dtype=np.float64)
    z = _ndtri(intervals)
    y = mu + std * z
    t = 1.0 - 1.0 / (1.0 + np.exp(-y))
    t_min = 1.0 / (1.0 + math.exp(0.5 * logsnr_max))
    t_max = 1.0 / (1.0 + math.exp(0.5 * logsnr_min))
    t = np.clip(t, t_min, t_max)
    sigmas = (1.0 - t)[::-1]
    return sigmas[:-1].astype(np.float32)


def _resolution_aware_mu(height: int, width: int, base_mu: float,
                         base_resolution=(512, 512)) -> float:
    return base_mu + 0.5 * math.log(height * width / (base_resolution[0] * base_resolution[1]))


@dataclass
class Ideogram4PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Ideogram4Pipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["prompt_enhancer_head"]

    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer,
                 unconditional_transformer, prompt_enhancer_head=None):
        super().__init__()
        self.register_modules(
            scheduler=scheduler, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, unconditional_transformer=unconditional_transformer,
            prompt_enhancer_head=prompt_enhancer_head,
        )
        self.vae_scale_factor = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.patch_size = 2
        self.image_processor = VaeImageProcessor(
            vae_scale_factor=self.vae_scale_factor * self.patch_size)

    @staticmethod
    def _prepare_ids(text_lengths, grid_h: int, grid_w: int, max_text_tokens: int):
        """Packed [left-pad][text][image] layout (reference `:252`)."""
        batch_size = len(text_lengths)
        n_img = grid_h * grid_w
        total = max_text_tokens + n_img
        h_idx = np.repeat(np.arange(grid_h), grid_w)
        w_idx = np.tile(np.arange(grid_w), grid_h)
        image_pos = np.stack([np.zeros_like(h_idx), h_idx, w_idx], axis=1) + IMAGE_POSITION_OFFSET

        position_ids = np.zeros((batch_size, total, 3), np.int64)
        segment_ids = np.full((batch_size, total), SEQUENCE_PADDING_INDICATOR, np.int64)
        indicator = np.zeros((batch_size, total), np.int64)
        for b, n in enumerate(text_lengths):
            offset = max_text_tokens - n
            tp = np.arange(n)
            position_ids[b, offset: offset + n] = np.stack([tp, tp, tp], axis=1)
            position_ids[b, offset + n:] = image_pos
            indicator[b, offset: offset + n] = LLM_TOKEN_INDICATOR
            indicator[b, offset + n:] = OUTPUT_IMAGE_INDICATOR
            segment_ids[b, offset: offset + n + n_img] = 1
        return position_ids, segment_ids, indicator

    def encode_prompt(self, prompt, grid_h: int, grid_w: int, max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch_size = len(prompts)
        n_img = grid_h * grid_w

        token_ids = np.zeros((batch_size, max_sequence_length), np.int64)
        attention_mask = np.zeros((batch_size, max_sequence_length), np.int64)
        text_position_ids = np.zeros((batch_size, max_sequence_length), np.int64)
        text_lengths = []
        for b, p in enumerate(prompts):
            messages = [{"role": "user", "content": [{"type": "text", "text": p}]}]
            text = self.tokenizer.apply_chat_template(messages, add_generation_prompt=True,
                                                      tokenize=False)
            toks = np.asarray(self.tokenizer(text, return_tensors="np",
                                             add_special_tokens=False)["input_ids"][0])
            n = int(toks.shape[0])
            if n > max_sequence_length:
                raise ValueError(f"prompt has {n} tokens, exceeds {max_sequence_length}")
            text_lengths.append(n)
            offset = max_sequence_length - n
            token_ids[b, offset:] = toks
            attention_mask[b, offset:] = 1
            text_position_ids[b, offset:] = np.arange(n)

        # tap RAW layer outputs (the reference taps before the final norm)
        out = text_encoder(
            te_params, jnp.asarray(token_ids), attention_mask=jnp.asarray(attention_mask),
            position_ids=jnp.asarray(text_position_ids), output_hidden_states=True,
            normalize_last_hidden_state=False)
        # hidden_states[0] = embeddings; layer i output = hidden_states[i + 1]
        selected = [out.hidden_states[i + 1] for i in QWEN3_VL_ACTIVATION_LAYERS]
        # stack layer-fastest: [B, S, H, L] -> [B, S, H*L] (reference `:381`)
        feats = jnp.stack(selected, axis=-1).reshape(batch_size, max_sequence_length, -1)
        feats = feats * jnp.asarray(attention_mask)[..., None].astype(feats.dtype)

        position_ids, segment_ids, indicator = self._prepare_ids(
            text_lengths, grid_h, grid_w, max_sequence_length)
        prompt_embeds = jnp.concatenate(
            [feats, jnp.zeros((batch_size, n_img, feats.shape[-1]), feats.dtype)], axis=1)
        return prompt_embeds, position_ids, segment_ids, indicator

    def _denoise(self, t_params, u_params, latents, llm_features, neg_llm_features,
                 pos_rope, neg_rope, segment_ids, indicator, neg_segment_ids, neg_indicator,
                 timesteps, gw, state, max_text_tokens, num_train_timesteps):
        transformer = self.transformer[0]
        uncond_transformer = self.unconditional_transformer[0]
        from ...hooks.generic_cache import denoise_scan

        b = latents.shape[0]
        text_z_padding = jnp.zeros((b, max_text_tokens, latents.shape[-1]), latents.dtype)

        def forward(lat, t, sstate):
            idx = jnp.argmin(jnp.abs(state.timesteps - t))
            t_model = jnp.broadcast_to(1.0 - t / num_train_timesteps, (b,)).astype(lat.dtype)
            pos_z = jnp.concatenate([text_z_padding, lat], axis=1)
            pos_out = transformer(
                t_params, pos_z, t_model, llm_features, None, segment_ids, indicator,
                image_rotary_emb=pos_rope).sample
            pos_v = pos_out[:, max_text_tokens:].astype(jnp.float32)
            neg_v = uncond_transformer(
                u_params, lat, t_model, neg_llm_features, None, neg_segment_ids, neg_indicator,
                image_rotary_emb=neg_rope).sample.astype(jnp.float32)
            g = gw[idx]
            v = g * pos_v + (1.0 - g) * neg_v
            return -v

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 25,
        guidance_scale: Optional[float] = 5.0,
        guidance_schedule: Optional[List[float]] = None,
        mu: float = 0.0,
        std: float = 1.0,
        num_images_per_prompt: int = 1,
        max_sequence_length: int = 512,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        use_prompt_enhancer: bool = False,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        _, u_params = self.unconditional_transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if use_prompt_enhancer:
            raise NotImplementedError(
                "Autoregressive prompt enhancement is not implemented; pass the enhanced prompt.")

        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch_size = len(prompts)
        total_batch = batch_size * num_images_per_prompt

        grid_h = height // (self.vae_scale_factor * self.patch_size)
        grid_w = width // (self.vae_scale_factor * self.patch_size)
        n_img = grid_h * grid_w

        llm_features, position_ids, segment_ids, indicator = self.encode_prompt(
            prompt, grid_h, grid_w, max_sequence_length)
        if num_images_per_prompt > 1:
            llm_features = jnp.repeat(llm_features, num_images_per_prompt, axis=0)
            position_ids = np.repeat(position_ids, num_images_per_prompt, axis=0)
            segment_ids = np.repeat(segment_ids, num_images_per_prompt, axis=0)
            indicator = np.repeat(indicator, num_images_per_prompt, axis=0)

        neg_llm_features = jnp.zeros((total_batch, n_img, llm_features.shape[-1]),
                                     llm_features.dtype)
        neg_position_ids = position_ids[:, max_sequence_length:]
        neg_segment_ids = segment_ids[:, max_sequence_length:]
        neg_indicator = indicator[:, max_sequence_length:]

        schedule_mu = _resolution_aware_mu(height, width, base_mu=mu)
        sigmas = _logit_normal_sigmas(num_inference_steps, schedule_mu, std=std)
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))

        if guidance_scale is not None:
            guidance_schedule = [float(guidance_scale)] * num_inference_steps
        gw = jnp.asarray(np.asarray(guidance_schedule, np.float32))

        latent_dim = transformer.config.in_channels
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((total_batch, n_img, latent_dim), key=lat_key)

        pos_rope = transformer.rotary_emb(position_ids)
        neg_rope = transformer.rotary_emb(neg_position_ids)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, max_text_tokens=max_sequence_length,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(max_sequence_length,))
        latents = denoise(t_params, u_params, latents, llm_features, neg_llm_features,
                          pos_rope, neg_rope, jnp.asarray(segment_ids), jnp.asarray(indicator),
                          jnp.asarray(neg_segment_ids), jnp.asarray(neg_indicator),
                          state.timesteps, gw, state)

        if output_type == "latent":
            image = latents
        else:
            bn = vae_params["bn"]
            bn_mean = bn["running_mean"].reshape(1, 1, -1).astype(latents.dtype)
            bn_std = jnp.sqrt(bn["running_var"] + vae.config.batch_norm_eps).reshape(1, 1, -1)
            z = latents * bn_std.astype(latents.dtype) + bn_mean
            p = self.patch_size
            ae_channels = z.shape[-1] // (p * p)
            z = z.reshape(total_batch, grid_h, grid_w, p, p, ae_channels)
            z = jnp.transpose(z, (0, 5, 1, 3, 2, 4)).reshape(
                total_batch, ae_channels, grid_h * p, grid_w * p)
            decode = self._jit("decode", lambda pp, zz: vae.decode(pp, zz).sample)
            image = decode(vae_params, z)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return Ideogram4PipelineOutput(images=image)

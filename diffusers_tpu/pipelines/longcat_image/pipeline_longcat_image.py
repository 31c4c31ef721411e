"""LongCat-Image text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/longcat_image/pipeline_longcat_image.py:205`
LongCatImagePipeline): Qwen2.5-VL encoding with a captioning chat template —
quoted spans are tokenized PER CHARACTER for glyph fidelity
(`split_quotation`, `:75`; `_encode_prompt`, `:274`), prefix/suffix template
tokens stripped from the hidden states; modality-tagged rope ids (text on the
diagonal, image grid offset by `tokenizer_max_length`, `:109`); Flux-packed
latents with dynamic shift; CFG with optional renorm clamping the guided
noise norm to the conditional norm (`:645-650`).

TPU-first: cond/uncond batched in ONE scanned jitted loop (their rope ids are
identical, so the doubled batch shares the tables).
"""

from __future__ import annotations

import re
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

PREFIX = (
    "<|im_start|>system\nAs an image captioning expert, generate a descriptive text prompt "
    "based on an image content, suitable for input to a text-to-image model.<|im_end|>\n"
    "<|im_start|>user\n"
)
SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"


def split_quotation(prompt: str, quote_pairs=None):
    """Reference `:75` — split into (segment, is_quoted) spans, protecting
    word-internal apostrophes."""
    word_internal = re.compile(r"[a-zA-Z]+'[a-zA-Z]+")
    mapping = []
    for i, src in enumerate(set(word_internal.findall(prompt))):
        tgt = "longcat_$##$_longcat" * (i + 1)
        prompt = prompt.replace(src, tgt)
        mapping.append((src, tgt))

    if quote_pairs is None:
        quote_pairs = [("'", "'"), ('"', '"'), ("‘", "’"), ("“", "”")]
    pattern = "|".join(f"{re.escape(a)}.*?{re.escape(b)}" for a, b in quote_pairs)
    result = []
    last = 0
    for m in re.finditer(pattern, prompt):
        if m.start() > last:
            result.append((prompt[last: m.start()], False))
        result.append((m.group(), True))
        last = m.end()
    if last < len(prompt):
        result.append((prompt[last:], False))

    restored = []
    for seg, matched in result:
        for src, tgt in mapping:
            seg = seg.replace(tgt, src)
        restored.append((seg, matched))
    return restored


def prepare_pos_ids(modality_id=0, type="text", start=(0, 0), num_token=None, height=None, width=None):
    """Reference `:109` — (modality, row, col) rope ids."""
    if type == "text":
        pos = np.zeros((num_token, 3), np.float32)
        pos[:, 0] = modality_id
        pos[:, 1] = np.arange(num_token) + start[0]
        pos[:, 2] = np.arange(num_token) + start[1]
        return pos
    if type == "image":
        pos = np.zeros((height, width, 3), np.float32)
        pos[..., 0] = modality_id
        pos[..., 1] = np.arange(height)[:, None] + start[0]
        pos[..., 2] = np.arange(width)[None, :] + start[1]
        return pos.reshape(height * width, 3)
    raise KeyError(f'Unknown type {type}, only "text" or "image".')


@dataclass
class LongCatImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class LongCatImagePipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, vae, text_encoder, tokenizer, scheduler):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, scheduler=scheduler,
        )
        self.vae_scale_factor = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.default_sample_size = 128
        self.tokenizer_max_length = 512

    _pack_latents = staticmethod(FluxPipeline._pack_latents)
    _unpack_latents = staticmethod(FluxPipeline._unpack_latents)

    def _encode_prompt(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder
        batch_tokens = []
        for p in prompt:
            tokens = []
            for seg, matched in split_quotation(p):
                if matched:  # per-character tokens for quoted glyph text
                    for ch in seg:
                        tokens.extend(self.tokenizer(ch, add_special_tokens=False)["input_ids"])
                else:
                    tokens.extend(self.tokenizer(seg, add_special_tokens=False)["input_ids"])
            if len(tokens) > self.tokenizer_max_length:
                logger.warning(f"prompt truncated to {self.tokenizer_max_length} tokens")
                tokens = tokens[: self.tokenizer_max_length]
            batch_tokens.append(tokens)

        prefix = self.tokenizer(PREFIX, add_special_tokens=False)["input_ids"]
        suffix = self.tokenizer(SUFFIX, add_special_tokens=False)["input_ids"]
        width = self.tokenizer_max_length
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        ids, mask = [], []
        for tokens in batch_tokens:
            row = tokens + [pad_id] * (width - len(tokens))
            ids.append(prefix + row + suffix)
            mask.append([1] * len(prefix) + [1] * len(tokens) + [0] * (width - len(tokens)) + [1] * len(suffix))
        ids = jnp.asarray(np.asarray(ids))
        mask = jnp.asarray(np.asarray(mask))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        return out.hidden_states[-1][:, len(prefix): -len(suffix)]

    def encode_prompt(self, prompt):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds = self._encode_prompt(prompt)
        text_ids = prepare_pos_ids(modality_id=0, type="text", start=(0, 0), num_token=embeds.shape[1])
        return embeds, text_ids

    def _denoise(self, t_params, latents, embeds, neg_embeds, rope, timesteps, state,
                 guidance_scale, do_cfg, enable_cfg_renorm, cfg_renorm_min):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            tt = jnp.broadcast_to(t, (latent_in.shape[0],)) / 1000.0
            ehs = jnp.concatenate([embeds, neg_embeds], axis=0) if do_cfg else embeds
            pred = transformer(t_params, latent_in, ehs, tt, image_rotary_emb=rope).sample
            if do_cfg:
                cond, uncond = jnp.split(pred, 2, axis=0)
                out = uncond + guidance_scale * (cond - uncond)
                if enable_cfg_renorm:
                    cond_norm = jnp.linalg.norm(cond, axis=-1, keepdims=True)
                    noise_norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
                    scale = jnp.clip(cond_norm / (noise_norm + 1e-8), cfg_renorm_min, 1.0)
                    out = out * scale
                pred = out
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 4.5,
        enable_cfg_renorm: bool = True,
        cfg_renorm_min: float = 0.4,
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
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        embeds, text_ids = self.encode_prompt(prompt)
        batch_size = embeds.shape[0]
        neg_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, _ = self.encode_prompt(negative_prompt)

        num_channels_latents = transformer.config.in_channels // 4  # 16 for the released model
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        img_ids = prepare_pos_ids(
            modality_id=1, type="image",
            start=(self.tokenizer_max_length, self.tokenizer_max_length),
            height=lh // 2, width=lw // 2)

        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
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

        cos, sin = transformer.pos_embed({}, np.concatenate([text_ids, img_ids], axis=0))
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    enable_cfg_renorm=bool(enable_cfg_renorm), cfg_renorm_min=cfg_renorm_min), callback_on_step_end,
            static=(guidance_scale, do_cfg, bool(enable_cfg_renorm), cfg_renorm_min))
        latents = denoise(t_params, latents, embeds, neg_embeds, rope, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            lat = self._unpack_latents(latents, height, width, self.vae_scale_factor)
            lat = lat / vae.config.scaling_factor + (vae.config.get("shift_factor") or 0.0)
            image = vae.decode(vae_params, lat).sample
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return LongCatImagePipelineOutput(images=image)

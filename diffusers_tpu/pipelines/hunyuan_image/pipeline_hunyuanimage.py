"""HunyuanImage-2.1 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuan_image/pipeline_hunyuanimage.py:160`
HunyuanImagePipeline): Qwen2.5-VL prompt encoding (skip-layer 2, 34-token
template prefix drop, `:223`), ByT5 glyph-text encoding of quote-extracted
spans with all-zeros fallback (`:64,:353-360`), guider selection — the OCR
guider when glyph text is present, else the default guider, else disabled
(`:678-686`), distilled-guidance embedding x1000 (`:739`), linspace sigmas
`[1, 0)` (`:731`), 32x-VAE decode.

TPU-first: guider momentum rides the scan carry; cond/uncond run as one
doubled batch inside ONE jitted scan.
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
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, size, texture, "
    "quantity, text, spatial relationships of the objects and background:<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>"
)
TEMPLATE_START_IDX = 34


def extract_glyph_text(prompt: str) -> Optional[str]:
    """Quoted spans -> ByT5 glyph prompt (reference `:64`)."""
    spans = []
    for pattern in (r"\'(.*?)\'", r"\"(.*?)\"", r"‘(.*?)’", r"“(.*?)”"):
        spans.extend(re.findall(pattern, prompt))
    if not spans:
        return None
    return ". ".join([f'Text "{t}"' for t in spans]) + ". "


@dataclass
class HunyuanImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class HunyuanImagePipeline(DiffusionPipeline):
    _optional_components = ["guider", "ocr_guider"]
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2,
                 scheduler, guider=None, ocr_guider=None):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2, scheduler=scheduler,
            guider=guider, ocr_guider=ocr_guider,
        )
        self.vae_scale_factor = vae[0].config.get("spatial_compression_ratio", 32) if vae is not None else 32
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.tokenizer_max_length = 1000
        self.tokenizer_2_max_length = 128
        self.default_sample_size = 64
        self.prompt_template_encode = PROMPT_TEMPLATE
        self.prompt_template_encode_start_idx = TEMPLATE_START_IDX

    def _get_qwen_prompt_embeds(self, prompt: List[str], max_sequence_length: Optional[int] = None,
                                hidden_state_skip_layer: int = 2):
        text_encoder, te_params = self.text_encoder
        drop_idx = self.prompt_template_encode_start_idx
        max_len = (max_sequence_length or self.tokenizer_max_length) + drop_idx
        txt = [self.prompt_template_encode.format(p) for p in prompt]
        inputs = self.tokenizer(txt, max_length=max_len, padding="max_length",
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        embeds = out.hidden_states[-(hidden_state_skip_layer + 1)]
        return embeds[:, drop_idx:], mask[:, drop_idx:]

    def _get_byt5_prompt_embeds(self, glyph_text: str):
        text_encoder, te_params = self.text_encoder_2
        inputs = self.tokenizer_2(glyph_text, padding="max_length",
                                  max_length=self.tokenizer_2_max_length, truncation=True,
                                  add_special_tokens=True, return_tensors="np")
        ids = np.atleast_2d(np.asarray(inputs["input_ids"]))
        mask = np.atleast_2d(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
        return out.last_hidden_state, jnp.asarray(mask)

    def encode_prompt(self, prompt, max_sequence_length: Optional[int] = None):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, mask = self._get_qwen_prompt_embeds(prompt, max_sequence_length)
        d2 = self.text_encoder_2[0].config.get("d_model", 1472)
        embeds_2_list, mask_2_list = [], []
        for p in prompt:
            glyph = extract_glyph_text(p)
            if glyph is None:
                embeds_2_list.append(jnp.zeros((1, self.tokenizer_2_max_length, d2), embeds.dtype))
                mask_2_list.append(jnp.zeros((1, self.tokenizer_2_max_length), jnp.int32))
            else:
                e2, m2 = self._get_byt5_prompt_embeds(glyph)
                embeds_2_list.append(e2)
                mask_2_list.append(m2)
        return embeds, mask, jnp.concatenate(embeds_2_list), jnp.concatenate(mask_2_list)

    def _denoise(self, t_params, latents, embeds, mask, embeds_2, mask_2,
                 neg_embeds, neg_mask, neg_embeds_2, neg_mask_2, guidance,
                 timesteps, state, guider, do_cfg, use_meanflow):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        from ...hooks.generic_cache import denoise_scan

        n_steps = timesteps.shape[0]

        def forward(latents, t, sstate, step=None, momentum=None):
            b = latents.shape[0]
            timestep_r = None
            # meanflow: r = next timestep (0 at the last step) — derive from the
            # schedule array by position (reference `:760-767`)
            if use_meanflow and step is not None:
                nxt = jnp.where(step + 1 < n_steps,
                                timesteps[jnp.minimum(step + 1, n_steps - 1)], 0.0)
                timestep_r = jnp.broadcast_to(nxt, (b,)).astype(latents.dtype)
            if do_cfg:
                latent_in = jnp.concatenate([latents, latents], axis=0)
                tt = jnp.broadcast_to(t, (latent_in.shape[0],)).astype(latents.dtype)
                tr = None if timestep_r is None else jnp.concatenate([timestep_r, timestep_r])
                g = None if guidance is None else jnp.concatenate([guidance, guidance])
                pred = transformer(
                    t_params, latent_in, tt,
                    jnp.concatenate([embeds, neg_embeds]), jnp.concatenate([mask, neg_mask]),
                    timestep_r=tr,
                    encoder_hidden_states_2=jnp.concatenate([embeds_2, neg_embeds_2]),
                    encoder_attention_mask_2=jnp.concatenate([mask_2, neg_mask_2]),
                    guidance=g,
                ).sample
                cond, uncond = jnp.split(pred, 2, axis=0)
                if momentum is not None:
                    return guider(cond, uncond, step=step, num_steps=n_steps, momentum=momentum)
                return guider(cond, uncond, step=step, num_steps=n_steps)
            tt = jnp.broadcast_to(t, (b,)).astype(latents.dtype)
            return transformer(
                t_params, latents, tt, embeds, mask, timestep_r=timestep_r,
                encoder_hidden_states_2=embeds_2, encoder_attention_mask_2=mask_2,
                guidance=guidance,
            ).sample

        if do_cfg:
            momentum0 = guider.init_momentum(latents.shape) if hasattr(
                guider, "init_momentum") else None

            def step_fn(carry, ts):
                lat, sstate, momentum = carry
                t, step = ts
                out = forward(lat, t, sstate, step=step, momentum=momentum)
                pred, momentum = out if isinstance(out, tuple) else (out, momentum)
                s = scheduler.step(sstate, pred, t, lat)
                return (s.prev_sample, s.state, momentum), None

            (latents, _, _), _ = jax.lax.scan(
                step_fn, (latents, state, momentum0), (timesteps, jnp.arange(n_steps)))
            return latents

        if use_meanflow:
            def step_fn(carry, ts):
                lat, sstate = carry
                t, step = ts
                s = scheduler.step(sstate, forward(lat, t, sstate, step=step), t, lat)
                return (s.prev_sample, s.state), None

            (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, jnp.arange(n_steps)))
            return latents
        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        distilled_guidance_scale: Optional[float] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: Optional[int] = None,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        embeds, mask, embeds_2, mask_2 = self.encode_prompt(prompt, max_sequence_length)
        batch_size = embeds.shape[0]

        # guider selection (reference `:678-686`)
        has_glyph = bool(np.any(np.asarray(embeds_2) != 0))
        if has_glyph and self.ocr_guider is not None:
            guider = self.ocr_guider
        elif self.guider is not None:
            guider = self.guider
        else:
            guider = None  # distilled models run guidance-free (reference `:684-686`)
        do_cfg = guider is not None and guider.num_conditions > 1

        neg_embeds = neg_mask = neg_embeds_2 = neg_mask_2 = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_mask, neg_embeds_2, neg_mask_2 = self.encode_prompt(
                negative_prompt, max_sequence_length)

        num_channels_latents = transformer.config.in_channels
        lh = height // self.vae_scale_factor
        lw = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        if sigmas is None:
            sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=np.asarray(sigmas))
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        guidance = None
        if transformer.config.guidance_embeds:
            if distilled_guidance_scale is None:
                raise ValueError("`distilled_guidance_scale` is required for guidance-distilled model.")
            guidance = jnp.full((batch_size,), distilled_guidance_scale * 1000.0, latents.dtype)

        use_meanflow = bool(transformer.config.get("use_meanflow", False))
        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guider=guider, do_cfg=do_cfg, use_meanflow=use_meanflow), callback_on_step_end,
            static=(id(guider), do_cfg, use_meanflow))
        latents = denoise(t_params, latents, embeds, mask, embeds_2, mask_2,
                          neg_embeds, neg_mask, neg_embeds_2, neg_mask_2, guidance,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            vae, vae_params = self.vae
            image = vae.decode(vae_params, latents / vae.config.scaling_factor).sample
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return HunyuanImagePipelineOutput(images=image)

"""LongCat-AudioDiT text-to-audio pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/longcat_audio_dit/pipeline_longcat_audio_dit.py:99`
LongCatAudioDiTPipeline): UMT5 prompt encoding with per-feature layer norm
plus the normed embedding-layer output added back (`:135`), text-length
duration heuristic (`:73`), linspace sigma schedule through a flow-match
Euler loop with `t/num_train_timesteps` model time, plain CFG, zero
negative embeddings by default (`:290`), zero latent_cond channel (`:302`).

TPU-first: cond/uncond batched into one scanned jitted loop.
"""

from __future__ import annotations

import re
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from ..stable_audio.pipeline_stable_audio import AudioPipelineOutput

logger = logging.get_logger(__name__)


def _normalize_text(text: str) -> str:
    text = text.lower()
    text = re.sub(r'["“”‘’]', " ", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _approx_duration_from_text(text, max_duration: float = 30.0) -> float:
    """zh 0.21 s/char, en 0.082 s/char heuristic (reference `:73`)."""
    if not text:
        return 0.0
    if isinstance(text, str):
        text = [text]
    durations = []
    for prompt in text:
        prompt = re.sub(r"\s+", "", prompt)
        num_zh = num_en = num_other = 0
        for ch in prompt:
            if "一" <= ch <= "鿿":
                num_zh += 1
            elif ch.isalpha():
                num_en += 1
            else:
                num_other += 1
        if num_zh > num_en:
            num_zh += num_other
        else:
            num_en += num_other
        durations.append(num_zh * 0.21 + num_en * 0.082)
    return min(max_duration, max(durations)) if durations else 0.0


def _layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class LongCatAudioDiTPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, vae, text_encoder, tokenizer, transformer, scheduler=None):
        super().__init__()
        if scheduler is None:
            from ...schedulers.scheduling_flow_match_euler_discrete import (
                FlowMatchEulerDiscreteScheduler,
            )
            scheduler = FlowMatchEulerDiscreteScheduler(shift=1.0)
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              transformer=transformer, scheduler=scheduler)
        self.sample_rate = vae[0].config.get("sample_rate", 24000)
        self.vae_scale_factor = vae[0].config.get("downsampling_ratio", 2048)
        self.latent_dim = transformer[0].config.get("latent_dim", 64)
        self.max_wav_duration = 30.0
        self.text_norm_feat = True
        self.text_add_embed = True

    def encode_prompt(self, prompt):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        max_len = getattr(self.tokenizer, "model_max_length", 512)
        if not isinstance(max_len, int) or max_len <= 0 or max_len > 32768:
            max_len = 512
        inputs = self.tokenizer(prompt, padding="longest", truncation=True,
                                max_length=max_len, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        if self.text_norm_feat:
            embeds = _layer_norm(embeds)
        if self.text_add_embed:
            # hidden_states[0] == the embedding-table output (reference `:158`)
            first_hidden = text_encoder.shared(te_params["shared"], ids)
            if self.text_norm_feat:
                first_hidden = _layer_norm(first_hidden)
            embeds = embeds + first_hidden
        return embeds, mask.astype(bool)

    def _denoise(self, t_params, latents, embeds, text_mask, neg_embeds, neg_mask,
                 latent_cond, timesteps, state, guidance_scale, do_cfg, num_train_timesteps):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            tt = jnp.broadcast_to(t / num_train_timesteps, (lat.shape[0],)).astype(lat.dtype)
            pred = transformer(t_params, lat, embeds, text_mask, tt,
                               latent_cond=latent_cond).sample
            if do_cfg:
                null_pred = transformer(t_params, lat, neg_embeds, neg_mask, tt,
                                        latent_cond=latent_cond).sample
                pred = null_pred + (pred - null_pred) * guidance_scale
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]],
        negative_prompt: Optional[Union[str, List[str]]] = None,
        audio_duration_s: Optional[float] = None,
        latents: Optional[jax.Array] = None,
        num_inference_steps: int = 16,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        batch_size = len(prompt)
        if num_inference_steps < 1:
            raise ValueError("num_inference_steps must be a positive integer.")

        normalized = [_normalize_text(t) for t in prompt]
        if latents is not None:
            duration = latents.shape[1]
        elif audio_duration_s is not None:
            duration = int(audio_duration_s * self.sample_rate // self.vae_scale_factor)
        else:
            duration = int(_approx_duration_from_text(normalized) * self.sample_rate
                           // self.vae_scale_factor)
        max_duration = int(self.max_wav_duration * self.sample_rate // self.vae_scale_factor)
        if latents is None:
            duration = max(1, min(duration, max_duration))

        embeds, text_mask = self.encode_prompt(normalized)
        if negative_prompt is None:
            neg_embeds = jnp.zeros_like(embeds)
            neg_mask = text_mask
        else:
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_mask = self.encode_prompt(negative_prompt)

        latent_cond = jnp.zeros((batch_size, duration, self.latent_dim), embeds.dtype)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, duration, self.latent_dim), key=lat_key,
                                   dtype=embeds.dtype)

        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))

        do_cfg = guidance_scale > 1.0
        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(float(guidance_scale), do_cfg))
        latents = denoise(t_params, latents, embeds, text_mask, neg_embeds, neg_mask,
                          latent_cond, state.timesteps, state)

        if output_type == "latent":
            waveform = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            waveform = decode(vae_params, jnp.transpose(latents, (0, 2, 1)))
            if output_type == "np":
                waveform = np.asarray(waveform.astype(jnp.float32))

        if not return_dict:
            return (waveform,)
        return AudioPipelineOutput(audios=waveform)

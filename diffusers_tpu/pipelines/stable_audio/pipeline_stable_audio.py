"""Stable Audio Open text-to-audio pipeline.

Behavioral mirror of the reference
`pipelines/stable_audio/pipeline_stable_audio.py`: T5 text embeds zeroed
at padding (negative branch) then projected and mask-zeroed (`:238`),
seconds-start/end number embeds appended to the text sequence and
concatenated channel-wise as the global token (`:624`), zero negative
embeds when no negative prompt (`:633`), 1D rotary table of dim
head_dim // 2 over [global + latents] positions (`:676`),
EDMDPMSolverMultistep denoise, Oobleck decode, and the
[waveform_start:waveform_end] crop (`:726`).

TPU-first: the whole denoise runs as one jitted `lax.scan`; the rotary
table is precomputed host-side in float64.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...models.embeddings import get_1d_rotary_pos_embed_np
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class AudioPipelineOutput(BaseOutput):
    audios: Union[jax.Array, np.ndarray]


class StableAudioPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, projection_model, tokenizer, transformer, scheduler):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, projection_model=projection_model,
            tokenizer=tokenizer, transformer=transformer, scheduler=scheduler,
        )
        self.rotary_embed_dim = self.transformer[0].config.attention_head_dim // 2

    def encode_prompt(self, prompt: List[str], negative_prompt, do_cfg: bool):
        text_encoder, te_params = self.text_encoder
        proj, proj_params = self.projection_model

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            return embeds, mask

        prompt_embeds, attention_mask = encode(prompt)
        if do_cfg and negative_prompt is not None:
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_mask = encode(negative_prompt)
            # masked negative tokens -> null embed (reference :218)
            neg_embeds = jnp.where(neg_mask[..., None].astype(bool), neg_embeds, 0.0)
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            attention_mask = jnp.concatenate([neg_mask, attention_mask], axis=0)

        prompt_embeds = proj(proj_params, text_hidden_states=prompt_embeds).text_hidden_states
        prompt_embeds = prompt_embeds * attention_mask[..., None].astype(prompt_embeds.dtype)
        return prompt_embeds

    def encode_duration(self, audio_start_in_s, audio_end_in_s, do_cfg_with_negative: bool, batch_size: int):
        proj, proj_params = self.projection_model
        starts = audio_start_in_s if isinstance(audio_start_in_s, list) else [audio_start_in_s]
        ends = audio_end_in_s if isinstance(audio_end_in_s, list) else [audio_end_in_s]
        if len(starts) == 1:
            starts = starts * batch_size
        if len(ends) == 1:
            ends = ends * batch_size
        out = proj(
            proj_params,
            start_seconds=jnp.asarray([float(x) for x in starts]),
            end_seconds=jnp.asarray([float(x) for x in ends]),
        )
        start_hs, end_hs = out.seconds_start_hidden_states, out.seconds_end_hidden_states
        if do_cfg_with_negative:
            start_hs = jnp.concatenate([start_hs, start_hs], axis=0)
            end_hs = jnp.concatenate([end_hs, end_hs], axis=0)
        return start_hs, end_hs

    def _denoise(self, tr_params, latents, text_embeds, global_embeds, rope_cos, rope_sin,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input)
            noise_pred = transformer(
                tr_params, latent_input, t[None],
                encoder_hidden_states=text_embeds,
                global_hidden_states=global_embeds,
                rotary_embedding=(rope_cos, rope_sin),
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
        audio_end_in_s: Optional[float] = None,
        audio_start_in_s: float = 0.0,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_waveforms_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        initial_audio_waveforms: Optional[jax.Array] = None,
        return_dict: bool = True,
        output_type: str = "np",
    ):
        vae, vae_params = self.vae
        transformer, tr_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        batch_size = len(prompt)
        do_cfg = guidance_scale > 1.0

        downsample_ratio = vae.hop_length
        max_audio_length_in_s = transformer.config.sample_size * downsample_ratio / vae.config.sampling_rate
        if audio_end_in_s is None:
            audio_end_in_s = max_audio_length_in_s
        if audio_end_in_s - audio_start_in_s > max_audio_length_in_s:
            raise ValueError(
                f"requested audio length ({audio_end_in_s - audio_start_in_s}s) exceeds the model maximum "
                f"({max_audio_length_in_s}s)"
            )
        waveform_start = int(audio_start_in_s * vae.config.sampling_rate)
        waveform_end = int(audio_end_in_s * vae.config.sampling_rate)
        waveform_length = int(transformer.config.sample_size)

        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        start_hs, end_hs = self.encode_duration(
            audio_start_in_s, audio_end_in_s, do_cfg and negative_prompt is not None, batch_size
        )

        text_audio_duration_embeds = jnp.concatenate([prompt_embeds, start_hs, end_hs], axis=1)
        audio_duration_embeds = jnp.concatenate([start_hs, end_hs], axis=2)

        if do_cfg and negative_prompt is None:
            # unconditional branch = zeros (reference :633)
            text_audio_duration_embeds = jnp.concatenate(
                [jnp.zeros_like(text_audio_duration_embeds), text_audio_duration_embeds], axis=0
            )
            audio_duration_embeds = jnp.concatenate([audio_duration_embeds, audio_duration_embeds], axis=0)

        if num_waveforms_per_prompt > 1:
            text_audio_duration_embeds = jnp.repeat(text_audio_duration_embeds, num_waveforms_per_prompt, axis=0)
            audio_duration_embeds = jnp.repeat(audio_duration_embeds, num_waveforms_per_prompt, axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)

        num_channels_vae = transformer.config.in_channels
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (batch_size * num_waveforms_per_prompt, num_channels_vae, waveform_length), key=lat_key
            )
        latents = latents * state.init_noise_sigma
        if initial_audio_waveforms is not None:
            if initial_audio_waveforms.ndim == 2:
                initial_audio_waveforms = initial_audio_waveforms[:, None, :]
            audio_vae_length = waveform_length * vae.hop_length
            audio = jnp.zeros(
                (batch_size, vae.config.audio_channels, audio_vae_length), dtype=latents.dtype
            )
            n = min(initial_audio_waveforms.shape[-1], audio_vae_length)
            audio = audio.at[:, :, :n].set(initial_audio_waveforms[:, :, :n])
            key, enc_key = jax.random.split(key)
            encoded = vae.encode(vae_params, audio).latent_dist.sample(enc_key)
            encoded = jnp.tile(encoded, (num_waveforms_per_prompt, 1, 1))
            latents = encoded + latents

        state = self.scheduler.prepare(state, latents)
        rope_cos, rope_sin = get_1d_rotary_pos_embed_np(
            self.rotary_embed_dim,
            np.arange(latents.shape[2] + audio_duration_embeds.shape[1]),
            repeat_interleave_real=False,
        )

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(
            tr_params, latents, text_audio_duration_embeds, audio_duration_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state,
        )

        if output_type == "latent":
            return AudioPipelineOutput(audios=latents)

        decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
        audio = decode(vae_params, latents)
        audio = audio[:, :, waveform_start:waveform_end]
        if output_type == "np":
            audio = np.asarray(audio.astype(jnp.float32))
        if not return_dict:
            return (audio,)
        return AudioPipelineOutput(audios=audio)

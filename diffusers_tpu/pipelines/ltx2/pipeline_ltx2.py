"""LTX-2 audiovisual text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx2/pipeline_ltx2.py:168`
LTX2Pipeline; gemma embeds `:272`, latent pack `:540-646`, x0-space
multi-guidance hot loop `:1204-1415`, decode `:1430-1483`).

TPU-first: Gemma3 per-layer hidden-state encode (jit) + connectors → ONE
scanned, jitted denoise loop that advances the packed video tokens
[B, S_v, C_v] and packed audio-mel tokens [B, S_a, C_a·M] together, with all
four RoPE tables host-precomputed once per geometry. CFG / STG / modality
-isolation guidance compose in x0 space as deltas exactly like the
reference; each enabled guidance adds one transformer call inside the same
scan body (no per-step python loop). Decode: video causal-VAE + audio
VAE → mel → vocoder, each its own jit."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...guiders.guider_utils import rescale_noise_cfg
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class LTX2PipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]
    audio: Union[List, np.ndarray, None] = None


class LTX2Pipeline(DiffusionPipeline):
    _optional_components = ["processor"]

    def __init__(self, scheduler, vae, audio_vae, text_encoder, tokenizer, connectors,
                 transformer, vocoder, processor=None):
        super().__init__()
        self.register_modules(
            vae=vae, audio_vae=audio_vae, text_encoder=text_encoder, tokenizer=tokenizer,
            connectors=connectors, transformer=transformer, vocoder=vocoder,
            scheduler=scheduler, processor=processor,
        )
        self.vae_spatial_compression_ratio = vae[0].spatial_compression_ratio if vae is not None else 32
        self.vae_temporal_compression_ratio = vae[0].temporal_compression_ratio if vae is not None else 8
        self.audio_vae_mel_compression_ratio = audio_vae[0].mel_compression_ratio if audio_vae is not None else 4
        self.audio_vae_temporal_compression_ratio = (
            audio_vae[0].temporal_compression_ratio if audio_vae is not None else 4
        )
        self.transformer_spatial_patch_size = transformer[0].config.patch_size if transformer is not None else 1
        self.transformer_temporal_patch_size = transformer[0].config.patch_size_t if transformer is not None else 1
        self.audio_sampling_rate = audio_vae[0].config.sample_rate if audio_vae is not None else 16000
        self.audio_hop_length = audio_vae[0].config.mel_hop_length if audio_vae is not None else 160
        self.tokenizer_max_length = getattr(tokenizer, "model_max_length", 1024) if tokenizer is not None else 1024

    # ---------------------------------------------------------------- text
    def _get_gemma_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 1024):
        text_encoder, te_params = self.text_encoder
        if getattr(self.tokenizer, "padding_side", None) is not None:
            self.tokenizer.padding_side = "left"  # Gemma chat-style prompts
        inputs = self.tokenizer(
            [p.strip() for p in prompt], padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") else (
            (ids != 0).astype(jnp.int32)
        )
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        # [B, S, D, num_layers+1] → packed 3D (reference `:320-325`)
        stacked = jnp.stack(out.hidden_states, axis=-1)
        b, s = stacked.shape[:2]
        return stacked.reshape(b, s, -1), mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 1024):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = self._get_gemma_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        negative_embeds, negative_mask = self._get_gemma_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, prompt_mask, negative_embeds, negative_mask

    # ------------------------------------------------------------- latents
    @staticmethod
    def _pack_video(latents: jax.Array, patch_size: int = 1, patch_size_t: int = 1) -> jax.Array:
        b, c, f, h, w = latents.shape
        latents = latents.reshape(
            b, c, f // patch_size_t, patch_size_t, h // patch_size, patch_size, w // patch_size, patch_size
        )
        latents = jnp.transpose(latents, (0, 2, 4, 6, 1, 3, 5, 7))
        return latents.reshape(b, (f // patch_size_t) * (h // patch_size) * (w // patch_size), -1)

    @staticmethod
    def _unpack_video(latents, num_frames, height, width, patch_size: int = 1, patch_size_t: int = 1):
        b = latents.shape[0]
        latents = latents.reshape(b, num_frames, height, width, -1, patch_size_t, patch_size, patch_size)
        latents = jnp.transpose(latents, (0, 4, 1, 5, 2, 6, 3, 7))
        c = latents.shape[1]
        return latents.reshape(b, c, num_frames * patch_size_t, height * patch_size, width * patch_size)

    @staticmethod
    def _pack_audio(latents: jax.Array) -> jax.Array:
        # [B, C, L, M] → [B, L, C*M] (reference `_pack_audio_latents:608`)
        return jnp.swapaxes(latents, 1, 2).reshape(latents.shape[0], latents.shape[2], -1)

    @staticmethod
    def _unpack_audio(latents: jax.Array, num_mel_bins: int) -> jax.Array:
        b, s, d = latents.shape
        return jnp.swapaxes(latents.reshape(b, s, -1, num_mel_bins), 1, 2)

    @staticmethod
    def _denormalize_video_latents(latents, latents_mean, latents_std, scaling_factor: float = 1.0):
        mean = latents_mean.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        std = latents_std.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        return latents * std / scaling_factor + mean

    # ------------------------------------------------------------- denoise
    def _denoise(self, t_params, latents, audio_latents, video_embeds, audio_embeds,
                 connector_mask, rotary_cfg, rotary_cond, state, *, guidance_scale,
                 audio_guidance_scale, stg_scale, audio_stg_scale, modality_scale,
                 audio_modality_scale, guidance_rescale, audio_guidance_rescale,
                 stg_blocks, use_cross_timestep, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        do_stg = (stg_scale > 0.0) or (audio_stg_scale > 0.0)
        do_mod = (modality_scale > 1.0) or (audio_modality_scale > 1.0)
        b = latents.shape[0]

        if do_cfg:
            cond_video_embeds = video_embeds[b:]
            cond_audio_embeds = audio_embeds[b:]
            cond_mask = connector_mask[b:]
        else:
            cond_video_embeds, cond_audio_embeds, cond_mask = video_embeds, audio_embeds, connector_mask

        def tf_call(video_in, audio_in, v_embeds, a_embeds, msk, rotary, t, **kw):
            return transformer(
                t_params, video_in, audio_in, v_embeds, a_embeds,
                timestep=jnp.broadcast_to(t, (video_in.shape[0],)),
                sigma=jnp.broadcast_to(t, (video_in.shape[0],)),
                encoder_attention_mask=msk, audio_encoder_attention_mask=msk,
                rotary_embs=rotary, use_cross_timestep=use_cross_timestep,
                return_dict=False, **kw,
            )

        def step_fn(carry, xs):
            latents, audio_latents, sstate = carry
            t, sigma_t = xs
            lat_f32, aud_f32 = latents, audio_latents

            def to_x0(sample, v):
                return sample - v.astype(jnp.float32) * sigma_t

            if do_cfg:
                v_video, v_audio = tf_call(
                    jnp.concatenate([latents, latents], axis=0),
                    jnp.concatenate([audio_latents, audio_latents], axis=0),
                    video_embeds, audio_embeds, connector_mask, rotary_cfg, t,
                )
                vu, vc = jnp.split(v_video.astype(jnp.float32), 2, axis=0)
                au, ac = jnp.split(v_audio.astype(jnp.float32), 2, axis=0)
                x0_video, x0_video_u = to_x0(lat_f32, vc), to_x0(lat_f32, vu)
                x0_audio, x0_audio_u = to_x0(aud_f32, ac), to_x0(aud_f32, au)
                video_cfg_delta = (guidance_scale - 1) * (x0_video - x0_video_u)
                audio_cfg_delta = (audio_guidance_scale - 1) * (x0_audio - x0_audio_u)
            else:
                v_video, v_audio = tf_call(
                    latents, audio_latents, video_embeds, audio_embeds,
                    connector_mask, rotary_cfg, t,
                )
                x0_video, x0_audio = to_x0(lat_f32, v_video), to_x0(aud_f32, v_audio)
                video_cfg_delta = audio_cfg_delta = 0.0

            video_stg_delta = audio_stg_delta = 0.0
            if do_stg:
                v_v, v_a = tf_call(
                    latents, audio_latents, cond_video_embeds, cond_audio_embeds,
                    cond_mask, rotary_cond, t,
                    spatio_temporal_guidance_blocks=stg_blocks,
                )
                video_stg_delta = stg_scale * (x0_video - to_x0(lat_f32, v_v))
                audio_stg_delta = audio_stg_scale * (x0_audio - to_x0(aud_f32, v_a))

            video_mod_delta = audio_mod_delta = 0.0
            if do_mod:
                v_v, v_a = tf_call(
                    latents, audio_latents, cond_video_embeds, cond_audio_embeds,
                    cond_mask, rotary_cond, t, isolate_modalities=True,
                )
                video_mod_delta = (modality_scale - 1) * (x0_video - to_x0(lat_f32, v_v))
                audio_mod_delta = (audio_modality_scale - 1) * (x0_audio - to_x0(aud_f32, v_a))

            x0_video_g = x0_video + video_cfg_delta + video_stg_delta + video_mod_delta
            x0_audio_g = x0_audio + audio_cfg_delta + audio_stg_delta + audio_mod_delta
            if guidance_rescale > 0:
                x0_video_g = rescale_noise_cfg(x0_video_g, x0_video, guidance_rescale)
            if audio_guidance_rescale > 0:
                x0_audio_g = rescale_noise_cfg(x0_audio_g, x0_audio, audio_guidance_rescale)

            # back to velocity for the flow-match step (reference `:1404-1409`)
            v_video_g = (lat_f32 - x0_video_g) / sigma_t
            v_audio_g = (aud_f32 - x0_audio_g) / sigma_t
            out_v = scheduler.step(sstate, v_video_g, t, latents)
            out_a = scheduler.step(sstate, v_audio_g, t, audio_latents)
            return (out_v.prev_sample, out_a.prev_sample, out_v.state), None

        xs = (state.timesteps, state.sigmas[: state.timesteps.shape[0]])
        (latents, audio_latents, _), _ = jax.lax.scan(step_fn, (latents, audio_latents, state), xs)
        return latents, audio_latents

    # ------------------------------------------------------------ __call__
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 768,
        num_frames: int = 121,
        frame_rate: float = 24.0,
        num_inference_steps: int = 40,
        guidance_scale: float = 4.0,
        stg_scale: float = 0.0,
        modality_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        audio_guidance_scale: Optional[float] = None,
        audio_stg_scale: Optional[float] = None,
        audio_modality_scale: Optional[float] = None,
        audio_guidance_rescale: Optional[float] = None,
        spatio_temporal_guidance_blocks: Optional[List[int]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        audio_latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        prompt_attention_mask: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_attention_mask: Optional[jax.Array] = None,
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        use_cross_timestep: bool = False,
        sigmas: Optional[List[float]] = None,
        max_sequence_length: int = 1024,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        audio_vae, audio_vae_params = self.audio_vae
        connectors, connectors_params = self.connectors
        vocoder, vocoder_params = self.vocoder
        if key is None:
            key = jax.random.PRNGKey(0)
        key, latents_key, audio_key, decode_key = jax.random.split(key, 4)

        audio_guidance_scale = audio_guidance_scale or guidance_scale
        audio_stg_scale = audio_stg_scale or stg_scale
        audio_modality_scale = audio_modality_scale or modality_scale
        audio_guidance_rescale = audio_guidance_rescale or guidance_rescale
        do_cfg = (guidance_scale > 1.0) or (audio_guidance_scale > 1.0)
        if ((stg_scale > 0 or audio_stg_scale > 0) and not spatio_temporal_guidance_blocks):
            raise ValueError("STG requires `spatio_temporal_guidance_blocks`")

        # 1. text → per-layer gemma states → connectors
        if prompt_embeds is None:
            prompt_embeds, prompt_attention_mask, negative_prompt_embeds, negative_prompt_attention_mask = (
                self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
            )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            mask = jnp.concatenate([negative_prompt_attention_mask, prompt_attention_mask], axis=0)
        else:
            embeds, mask = prompt_embeds, prompt_attention_mask

        padding_side = getattr(self.tokenizer, "padding_side", "left") if self.tokenizer is not None else "left"
        encode_connectors = self._jit(
            "connectors",
            lambda p, e, m: connectors(p, e, m, padding_side=padding_side),
            static=(padding_side,),
        )
        video_embeds, audio_embeds, connector_mask = encode_connectors(connectors_params, embeds, mask)

        # 2. latents
        latent_num_frames = (num_frames - 1) // self.vae_temporal_compression_ratio + 1
        latent_height = height // self.vae_spatial_compression_ratio
        latent_width = width // self.vae_spatial_compression_ratio
        p, pt = self.transformer_spatial_patch_size, self.transformer_temporal_patch_size
        if latents is None:
            latents = randn_tensor(
                (batch_size, transformer.config.in_channels, latent_num_frames, latent_height, latent_width),
                key=latents_key, dtype=jnp.float32,
            )
            latents = self._pack_video(latents, p, pt)

        duration_s = num_frames / frame_rate
        audio_latents_per_second = (
            self.audio_sampling_rate / self.audio_hop_length / float(self.audio_vae_temporal_compression_ratio)
        )
        audio_num_frames = round(duration_s * audio_latents_per_second)
        num_mel_bins = audio_vae.config.mel_bins
        latent_mel_bins = num_mel_bins // self.audio_vae_mel_compression_ratio
        if audio_latents is None:
            audio_latents = randn_tensor(
                (batch_size, audio_vae.config.latent_channels, audio_num_frames, latent_mel_bins),
                key=audio_key, dtype=jnp.float32,
            )
            audio_latents = self._pack_audio(audio_latents)

        # 3. schedule (reference uses the scheduler's own max_image_seq_len as
        # the "current" seq len → constant mu, `:1173-1180`)
        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps) if sigmas is None else sigmas
        mu = calculate_shift(
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_image_seq_len", 1024),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.95),
            self.scheduler.config.get("max_shift", 2.05),
        )
        state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)

        # 4. RoPE tables: geometry-only, precomputed for both batch layouts
        def rotary_for(b):
            video_coords = transformer.rope.prepare_video_coords(
                b, latent_num_frames, latent_height, latent_width, fps=frame_rate
            )
            audio_coords = transformer.audio_rope.prepare_audio_coords(b, audio_num_frames)
            return transformer.prepare_rotary_embs(video_coords, audio_coords)

        rotary_cfg = rotary_for(batch_size * (2 if do_cfg else 1))
        do_extra = (stg_scale > 0 or audio_stg_scale > 0 or modality_scale > 1 or audio_modality_scale > 1)
        rotary_cond = rotary_for(batch_size) if (do_cfg and do_extra) else rotary_cfg

        static = (guidance_scale, audio_guidance_scale, stg_scale, audio_stg_scale,
                  modality_scale, audio_modality_scale, guidance_rescale,
                  audio_guidance_rescale, tuple(spatio_temporal_guidance_blocks or ()),
                  use_cross_timestep, do_cfg)
        denoise = self._jit(
            "denoise",
            lambda *a: self._denoise(
                *a, guidance_scale=guidance_scale, audio_guidance_scale=audio_guidance_scale,
                stg_scale=stg_scale, audio_stg_scale=audio_stg_scale,
                modality_scale=modality_scale, audio_modality_scale=audio_modality_scale,
                guidance_rescale=guidance_rescale, audio_guidance_rescale=audio_guidance_rescale,
                stg_blocks=list(spatio_temporal_guidance_blocks or ()) or None,
                use_cross_timestep=use_cross_timestep, do_cfg=do_cfg,
            ),
            static=static,
        )
        latents, audio_latents = denoise(
            t_params, latents, audio_latents, video_embeds, audio_embeds,
            connector_mask, rotary_cfg, rotary_cond, state,
        )

        # 5. unpack + decode
        audio_latents = (
            audio_latents * audio_vae_params["latents_std"].astype(audio_latents.dtype)
            + audio_vae_params["latents_mean"].astype(audio_latents.dtype)
        )
        audio_latents = self._unpack_audio(audio_latents, latent_mel_bins)

        if output_type == "latent":
            latents = self._unpack_video(latents, latent_num_frames, latent_height, latent_width, p, pt)
            latents = self._denormalize_video_latents(
                latents, vae_params["latents_mean"], vae_params["latents_std"], vae.config.scaling_factor
            )
            return LTX2PipelineOutput(frames=latents, audio=audio_latents) if return_dict else (latents, audio_latents)

        latents = self._unpack_video(latents, latent_num_frames, latent_height, latent_width, p, pt)
        temb = None
        if vae.config.timestep_conditioning:
            noise = randn_tensor(latents.shape, key=decode_key, dtype=latents.dtype)
            scale = decode_timestep if decode_noise_scale is None else decode_noise_scale
            latents = (1 - scale) * latents + scale * noise
            temb = jnp.full((latents.shape[0],), decode_timestep, latents.dtype)
        latents = self._denormalize_video_latents(
            latents, vae_params["latents_mean"], vae_params["latents_std"], vae.config.scaling_factor
        )
        decode = self._jit(
            "decode",
            lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
            static=(vae.config.timestep_conditioning,),
        )
        video = decode(vae_params, latents, temb, decode_key)
        video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        decode_audio = self._jit(
            "decode_audio",
            lambda pp, vp, z: vocoder(vp, audio_vae.decode(pp, z).sample),
        )
        audio = np.asarray(decode_audio(audio_vae_params, vocoder_params, audio_latents))

        if not return_dict:
            return (video, audio)
        return LTX2PipelineOutput(frames=video, audio=audio)

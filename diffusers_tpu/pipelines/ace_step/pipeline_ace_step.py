"""ACE-Step 1.5 text-to-music pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ace_step/pipeline_ace_step.py:133`
AceStepPipeline): SFT prompt template with task instruction + metadata
(`:347`), lyric encoding through the text encoder's embedding table only
(`:401`), shifted linear timestep schedule `t' = s·t/(1+(s-1)·t)` (`:539`),
learned-null-embedding APG guidance with time-axis normalization and
momentum −0.75 (`:1168`), task conditioning via `cat([src_latents,
chunk_mask], -1)` context latents (repaint window substitution `:1115`),
and −1 dBFS peak normalization after the Oobleck decode (`:1275`).

TPU-first: the whole denoise loop is ONE scanned jit with the APG momentum
in the scan carry; the CFG-interval gate rides the scan xs as a
{0,1} weight (static schedule, no host sync per step).
"""

from __future__ import annotations

import math
import re
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...guiders.adaptive_projected_guidance import normalized_guidance
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from ..stable_audio.pipeline_stable_audio import AudioPipelineOutput

logger = logging.get_logger(__name__)

SFT_GEN_PROMPT = "# Instruction\n{}\n\n# Caption\n{}\n\n# Metas\n{}<|endoftext|>\n"
DEFAULT_DIT_INSTRUCTION = "Fill the audio semantic mask based on the given conditions:"

TASK_INSTRUCTIONS = {
    "text2music": "Fill the audio semantic mask based on the given conditions:",
    "repaint": "Repaint the mask area based on the given conditions:",
    "cover": "Generate audio semantic tokens based on the given conditions:",
    "extract": "Extract the {TRACK_NAME} track from the audio:",
    "extract_default": "Extract the track from the audio:",
    "lego": "Generate the {TRACK_NAME} track based on the audio context:",
    "lego_default": "Generate the track based on the audio context:",
    "complete": "Complete the input track with {TRACK_CLASSES}:",
    "complete_default": "Complete the input track:",
}

TASK_TYPES = ["text2music", "repaint", "cover", "extract", "lego", "complete"]


def _parse_audio_code_string(code_str: str, max_audio_code: int) -> List[int]:
    if not code_str:
        return []
    return [max(0, min(int(v), max_audio_code)) for v in re.findall(r"<\|audio_code_(\d+)\|>", code_str)]


def _normalize_audio_codes(audio_codes, batch_size: int) -> List[str]:
    if isinstance(audio_codes, str):
        return [audio_codes] * batch_size
    audio_codes = list(audio_codes[:batch_size])
    while len(audio_codes) < batch_size:
        audio_codes.append(audio_codes[-1] if audio_codes else "")
    return audio_codes


class AceStepPipeline(DiffusionPipeline):
    """Text/lyrics/timbre → 48 kHz stereo music (flow matching over the
    Oobleck latent space)."""

    _optional_components = ["audio_tokenizer", "audio_token_detokenizer"]

    def __init__(self, vae, text_encoder, tokenizer, transformer, condition_encoder,
                 scheduler, audio_tokenizer=None, audio_token_detokenizer=None):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            condition_encoder=condition_encoder, scheduler=scheduler,
            audio_tokenizer=audio_tokenizer, audio_token_detokenizer=audio_token_detokenizer,
        )
        t_cfg = transformer[0].config
        self.is_turbo = bool(t_cfg.get("is_turbo", False) or t_cfg.get("model_version") == "turbo")
        v_cfg = vae[0].config if vae is not None else {}
        self.sample_rate = int(v_cfg.get("sampling_rate", 48000))
        downsample = math.prod(v_cfg.get("downsampling_ratios", (1920,)))
        self.latents_per_second = float(self.sample_rate) / float(downsample)

    # ------------------------------------------------------------------ #
    #                           prompt formatting                          #
    # ------------------------------------------------------------------ #

    @staticmethod
    def _get_task_instruction(task_type="text2music", track_name=None, complete_track_classes=None):
        if task_type == "extract":
            return (TASK_INSTRUCTIONS["extract"].format(TRACK_NAME=track_name.upper())
                    if track_name else TASK_INSTRUCTIONS["extract_default"])
        if task_type == "lego":
            return (TASK_INSTRUCTIONS["lego"].format(TRACK_NAME=track_name.upper())
                    if track_name else TASK_INSTRUCTIONS["lego_default"])
        if task_type == "complete":
            if complete_track_classes:
                classes_str = " | ".join(t.upper() for t in complete_track_classes)
                return TASK_INSTRUCTIONS["complete"].format(TRACK_CLASSES=classes_str)
            return TASK_INSTRUCTIONS["complete_default"]
        return TASK_INSTRUCTIONS.get(task_type, TASK_INSTRUCTIONS["text2music"])

    @staticmethod
    def _build_metadata_string(bpm=None, keyscale=None, timesignature=None, audio_duration=None):
        bpm_str = str(bpm) if bpm is not None and bpm > 0 else "N/A"
        ts_str = timesignature if timesignature and timesignature.strip() else "N/A"
        ks_str = keyscale if keyscale and keyscale.strip() else "N/A"
        dur_str = f"{int(audio_duration)} seconds" if audio_duration and audio_duration > 0 else "30 seconds"
        return f"- bpm: {bpm_str}\n- timesignature: {ts_str}\n- keyscale: {ks_str}\n- duration: {dur_str}\n"

    def _format_prompt(self, prompt, lyrics="", vocal_language="en", audio_duration=60.0,
                       instruction=None, bpm=None, keyscale=None, timesignature=None):
        if instruction is None:
            instruction = DEFAULT_DIT_INSTRUCTION
        if not instruction.endswith(":"):
            instruction = instruction + ":"
        metas = self._build_metadata_string(bpm, keyscale, timesignature, audio_duration)
        formatted_text = SFT_GEN_PROMPT.format(instruction, prompt, metas)
        formatted_lyrics = f"# Languages\n{vocal_language}\n\n# Lyric\n{lyrics}<|endoftext|>"
        return formatted_text, formatted_lyrics

    def encode_prompt(self, prompt, lyrics, vocal_language="en", audio_duration=60.0,
                      instruction=None, bpm=None, keyscale=None, timesignature=None,
                      max_text_length=256, max_lyric_length=2048):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        if isinstance(lyrics, str):
            lyrics = [lyrics]
        if isinstance(vocal_language, str):
            vocal_language = [vocal_language] * len(prompt)

        text_strs, lyric_strs = [], []
        for i in range(len(prompt)):
            t, l = self._format_prompt(prompt[i], lyrics[i], vocal_language[i], audio_duration,
                                       instruction, bpm, keyscale, timesignature)
            text_strs.append(t)
            lyric_strs.append(l)

        text_in = self.tokenizer(text_strs, padding="longest", truncation=True,
                                 max_length=max_text_length, return_tensors="np")
        lyric_in = self.tokenizer(lyric_strs, padding="longest", truncation=True,
                                  max_length=max_lyric_length, return_tensors="np")
        text_ids = jnp.asarray(np.asarray(text_in["input_ids"]))
        text_mask = jnp.asarray(np.asarray(text_in["attention_mask"]).astype(bool))
        lyric_ids = jnp.asarray(np.asarray(lyric_in["input_ids"]))
        lyric_mask = jnp.asarray(np.asarray(lyric_in["attention_mask"]).astype(bool))

        text_hidden = text_encoder(te_params, text_ids, attention_mask=text_mask).last_hidden_state
        # lyrics: embedding lookup only (reference `:500` — contextual encoding
        # happens inside the condition encoder's lyric encoder)
        lyric_hidden = text_encoder.embed_tokens(te_params["embed_tokens"], lyric_ids)
        return text_hidden, text_mask, lyric_hidden, lyric_mask

    # ------------------------------------------------------------------ #
    #                          latents / conditioning                      #
    # ------------------------------------------------------------------ #

    @staticmethod
    def _get_timestep_schedule(num_inference_steps=8, shift=3.0, timesteps=None):
        """Shifted linear [1→0) schedule (reference `:539`)."""
        if timesteps is not None:
            return np.asarray(timesteps, dtype=np.float32)
        t = np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float64)
        if shift != 1.0:
            t = shift * t / (1 + (shift - 1) * t)
        return t[:-1].astype(np.float32)

    def prepare_reference_audio_latents(self, reference_audio, batch_size):
        """30 s of reference audio (front/middle/back 10 s segments) → VAE
        latents for the timbre encoder (reference `:580`)."""
        vae, vae_params = self.vae
        reference_audio = jnp.asarray(reference_audio)
        target_frames = 30 * self.sample_rate
        if reference_audio.shape[-1] < target_frames:
            repeat_times = math.ceil(target_frames / reference_audio.shape[-1])
            reference_audio = jnp.tile(reference_audio, (1, repeat_times))
        segment = 10 * self.sample_rate
        total = reference_audio.shape[-1]
        third = total // 3
        front = reference_audio[:, :segment]
        middle = reference_audio[:, third: third + segment]
        back = reference_audio[:, max(total - segment, 0): max(total - segment, 0) + segment]
        reference_audio = jnp.concatenate([front, middle, back], axis=-1)

        ref_latents = vae.encode(vae_params, reference_audio[None]).latent_dist.mode()
        ref_latents = jnp.transpose(ref_latents, (0, 2, 1))  # [1, T, D]
        refer_audio_acoustic = jnp.broadcast_to(
            ref_latents, (batch_size,) + ref_latents.shape[1:]
        )
        return refer_audio_acoustic, np.arange(batch_size, dtype=np.int64)

    def prepare_src_latents(self, batch_size=1, src_audio=None, audio_codes=None,
                            latent_length=None, task_type="text2music"):
        vae, vae_params = self.vae
        ce, ce_params = self.condition_encoder

        if audio_codes is not None:
            if self.audio_tokenizer is None or self.audio_token_detokenizer is None:
                raise ValueError(
                    "ACE-Step audio-code cover conditioning requires the `audio_tokenizer` "
                    "and `audio_token_detokenizer` modules."
                )
            tok, tok_params = self.audio_tokenizer
            detok, detok_params = self.audio_token_detokenizer
            max_code = tok.quantizer.codebook_size - 1
            parsed = [_parse_audio_code_string(c, max_code) for c in
                      _normalize_audio_codes(audio_codes, batch_size)]
            max_len = max((len(p) for p in parsed), default=0)
            if max_len == 0:
                raise ValueError("`audio_codes` did not contain any `<|audio_code_*|>` tokens.")
            nq = int(tok.config.get("fsq_input_num_quantizers", 1))
            indices = np.zeros((batch_size, max_len, nq), dtype=np.int64)
            for bi, p in enumerate(parsed):
                if p:
                    indices[bi, : len(p), 0] = p
            quantized = tok.quantizer.get_output_from_indices(
                tok_params["quantizer"], jnp.asarray(indices)
            )
            src_latents = detok(detok_params, quantized)
            return src_latents, src_latents.shape[1]

        if src_audio is not None:
            src_audio = jnp.asarray(src_audio)
            if src_audio.ndim == 2:
                src_audio = src_audio[None]
            src_latents = vae.encode(vae_params, src_audio).latent_dist.mode()
            src_latents = jnp.transpose(src_latents, (0, 2, 1))
            if src_latents.shape[0] == 1:
                src_latents = jnp.broadcast_to(src_latents, (batch_size,) + src_latents.shape[1:])
            latent_length = src_latents.shape[1]
            if task_type == "cover":
                if self.audio_tokenizer is None or self.audio_token_detokenizer is None:
                    raise ValueError("cover conditioning requires audio_tokenizer/detokenizer.")
                tok, tok_params = self.audio_tokenizer
                detok, detok_params = self.audio_token_detokenizer
                silence = ce_params["silence_latent"]
                quantized, _ = tok.tokenize(tok_params, src_latents, silence)
                src_latents = detok(detok_params, quantized)[:, :latent_length, :]
            return src_latents, latent_length

        if latent_length is None:
            raise ValueError("`latent_length` must be provided without source audio.")
        silence = ce_params["silence_latent"]
        if silence.shape[1] >= latent_length:
            src_latents = silence[:, :latent_length, :]
        else:
            repeats = -(-latent_length // silence.shape[1])
            src_latents = jnp.tile(silence, (1, repeats, 1))[:, :latent_length, :]
        return jnp.broadcast_to(src_latents, (batch_size,) + src_latents.shape[1:]), latent_length

    def _build_chunk_mask(self, task_type, latent_length, batch_size, acoustic_dim,
                          repainting_start=None, repainting_end=None, has_src_audio=False):
        """1.0 inside the generate window, 0.0 outside (reference `:724`)."""
        if task_type in ("repaint", "lego") and has_src_audio:
            lps = self.latents_per_second
            start = int((repainting_start or 0.0) * lps)
            end = int(repainting_end * lps) if repainting_end is not None and repainting_end > 0 else latent_length
            start = max(0, min(start, latent_length - 1))
            end = max(start + 1, min(end, latent_length))
            mask_1d = np.zeros(latent_length, dtype=np.float32)
            mask_1d[start:end] = 1.0
            return jnp.asarray(np.broadcast_to(mask_1d[None, :, None],
                                               (batch_size, latent_length, acoustic_dim)).copy())
        return jnp.ones((batch_size, latent_length, acoustic_dim), jnp.float32)

    # ------------------------------------------------------------------ #
    #                              denoising                               #
    # ------------------------------------------------------------------ #

    def _denoise(self, t_params, latents, encoder_hidden_states, null_hidden_states,
                 non_cover_hidden_states, context_latents, timesteps, cfg_on, state,
                 guidance_scale, do_cfg, audio_cover_strength):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        blend_nc = non_cover_hidden_states is not None and audio_cover_strength < 1.0

        def model(lat, t, ehs, ctx):
            tt = jnp.broadcast_to(t, (lat.shape[0],)).astype(lat.dtype)
            return transformer(t_params, lat, tt, tt, ehs, ctx).sample

        if do_cfg:
            ctx2 = jnp.concatenate([context_latents, context_latents], axis=0)

            def step_fn(carry, xs):
                lat, sstate, momentum = carry
                t, g_on = xs
                both = model(
                    jnp.concatenate([lat, lat], axis=0), t,
                    jnp.concatenate([encoder_hidden_states, null_hidden_states], axis=0),
                    ctx2,
                )
                vt_cond, vt_uncond = jnp.split(both, 2, axis=0)
                # APG with momentum −0.75, time-axis norm, threshold 2.5
                # (reference `:1195`); gated by the CFG interval.
                apg, new_momentum = normalized_guidance(
                    vt_cond, vt_uncond, guidance_scale - 1.0, momentum=momentum,
                    momentum_beta=-0.75, eta=0.0, norm_threshold=2.5,
                    use_original_formulation=True, norm_axes=(1,),
                )
                momentum = jnp.where(g_on > 0.5, new_momentum, momentum)
                vt = jnp.where(g_on > 0.5, apg, vt_cond)
                if blend_nc:
                    vt_nc = model(lat, t, non_cover_hidden_states, context_latents)
                    vt = audio_cover_strength * vt + (1.0 - audio_cover_strength) * vt_nc
                out = self.scheduler.step(sstate, vt, t, lat)
                return (out.prev_sample, out.state, momentum), None

            momentum0 = jnp.zeros_like(latents)
            (latents, _, _), _ = jax.lax.scan(
                step_fn, (latents, state, momentum0), (timesteps, cfg_on))
            return latents

        def forward(lat, t, sstate):
            vt = model(lat, t, encoder_hidden_states, context_latents)
            if blend_nc:
                vt_nc = model(lat, t, non_cover_hidden_states, context_latents)
                vt = audio_cover_strength * vt + (1.0 - audio_cover_strength) * vt_nc
            return vt

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    # ------------------------------------------------------------------ #
    #                                call                                  #
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        lyrics: Union[str, List[str]] = "",
        audio_duration: float = 60.0,
        vocal_language: Union[str, List[str]] = "en",
        num_inference_steps: int = 8,
        guidance_scale: float = 7.0,
        shift: float = 3.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: Optional[str] = "np",
        return_dict: bool = True,
        instruction: Optional[str] = None,
        max_text_length: int = 256,
        max_lyric_length: int = 2048,
        bpm: Optional[int] = None,
        keyscale: Optional[str] = None,
        timesignature: Optional[str] = None,
        task_type: str = "text2music",
        track_name: Optional[str] = None,
        complete_track_classes: Optional[List[str]] = None,
        src_audio=None,
        reference_audio=None,
        audio_codes: Optional[Union[str, List[str]]] = None,
        repainting_start: Optional[float] = None,
        repainting_end: Optional[float] = None,
        audio_cover_strength: float = 1.0,
        cfg_interval_start: float = 0.0,
        cfg_interval_end: float = 1.0,
        timesteps: Optional[List[float]] = None,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        ce, ce_params = self.condition_encoder
        if key is None:
            key = jax.random.PRNGKey(0)
        if task_type not in TASK_TYPES:
            raise ValueError(f"task_type must be one of {TASK_TYPES}, got {task_type}")

        if isinstance(prompt, str):
            batch_size = 1
        elif isinstance(prompt, list):
            batch_size = len(prompt)
        else:
            raise ValueError("Must provide `prompt` as a string or list of strings.")
        acoustic_dim = transformer.config.audio_acoustic_hidden_dim

        if self.is_turbo and guidance_scale > 1.0:
            logger.warning(f"Guidance scale {guidance_scale} is ignored for turbo checkpoints.")
            guidance_scale = 1.0
        do_cfg = guidance_scale > 1.0 and not self.is_turbo

        has_audio_codes = bool(audio_codes) and (
            audio_codes.strip() if isinstance(audio_codes, str) else any(c.strip() for c in audio_codes)
        )
        if has_audio_codes:
            task_type = "cover" if task_type == "text2music" else task_type
            tok = self.audio_tokenizer
            detok = self.audio_token_detokenizer
            if tok is None or detok is None:
                raise ValueError("audio_codes conditioning requires audio_tokenizer/detokenizer.")
            max_code = tok[0].quantizer.codebook_size - 1
            num_codes = max((len(_parse_audio_code_string(c, max_code))
                             for c in _normalize_audio_codes(audio_codes, batch_size)), default=0)
            pool = int(detok[0].config.get("pool_window_size", 5))
            if audio_duration is None or audio_duration <= 0:
                audio_duration = num_codes * pool / self.latents_per_second

        if instruction is None:
            instruction = self._get_task_instruction(task_type, track_name, complete_track_classes)

        has_src_audio = src_audio is not None
        if has_src_audio and (audio_duration is None or audio_duration <= 0):
            audio_duration = np.asarray(src_audio).shape[-1] / self.sample_rate
        if audio_duration is None or audio_duration <= 0:
            audio_duration = 60.0

        # 1. encode prompts
        text_hidden, text_mask, lyric_hidden, lyric_mask = self.encode_prompt(
            prompt, lyrics, vocal_language, audio_duration, instruction,
            bpm, keyscale, timesignature, max_text_length, max_lyric_length,
        )

        # 2. source latents
        latent_length = math.ceil(audio_duration * self.latents_per_second)
        src_latents, latent_length = self.prepare_src_latents(
            batch_size=batch_size, src_audio=src_audio,
            audio_codes=audio_codes if has_audio_codes else None,
            latent_length=latent_length, task_type=task_type,
        )

        # 3. timbre conditioning
        if reference_audio is not None:
            refer_audio_acoustic, refer_order = self.prepare_reference_audio_latents(
                reference_audio, batch_size)
        else:
            # learned VAE-encoded silence — literal zeros are OOD (reference `:1060`)
            timbre_fix_frame = math.ceil(30 * self.latents_per_second)
            refer_audio_acoustic = jnp.broadcast_to(
                ce_params["silence_latent"][:, :timbre_fix_frame, :],
                (batch_size, timbre_fix_frame, ce_params["silence_latent"].shape[-1]),
            )
            refer_order = np.arange(batch_size, dtype=np.int64)

        # 4. fuse conditions
        encode_cond = self._jit("encode_cond", lambda p, th, tm, lh, lm, ra: ce(
            p, th, tm, lh, lm, ra, refer_order))
        encoder_hidden_states, _ = encode_cond(
            ce_params, text_hidden, text_mask, lyric_hidden, lyric_mask, refer_audio_acoustic)

        non_cover_hidden_states = None
        if audio_cover_strength < 1.0 and task_type == "cover":
            nc_th, nc_tm, nc_lh, nc_lm = self.encode_prompt(
                prompt, lyrics, vocal_language, audio_duration, TASK_INSTRUCTIONS["text2music"],
                bpm, keyscale, timesignature, max_text_length, max_lyric_length,
            )
            non_cover_hidden_states, _ = encode_cond(
                ce_params, nc_th, nc_tm, nc_lh, nc_lm, refer_audio_acoustic)

        # 5. chunk mask + context latents
        chunk_mask = self._build_chunk_mask(
            task_type, latent_length, batch_size, acoustic_dim,
            repainting_start, repainting_end, has_src_audio,
        )
        if task_type == "repaint" and has_src_audio:
            silence_tiled, _ = self.prepare_src_latents(
                batch_size=batch_size, latent_length=latent_length)
            src_latents = jnp.where(chunk_mask > 0.5, silence_tiled, src_latents)
        context_latents = jnp.concatenate([src_latents.astype(jnp.float32), chunk_mask], axis=-1)

        # 6. noise latents
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, latent_length, acoustic_dim), key=lat_key)

        # 7. null condition for CFG (learned embedding, reference `:1136`)
        null_hidden_states = None
        if do_cfg:
            null_hidden_states = jnp.broadcast_to(
                ce_params["null_condition_emb"].astype(encoder_hidden_states.dtype),
                encoder_hidden_states.shape,
            )

        # 8. schedule: scheduler registered with num_train_timesteps=1 consumes
        #    the shifted sigmas verbatim and appends the terminal 0
        t_schedule = self._get_timestep_schedule(num_inference_steps, shift, timesteps)
        state = self.scheduler.set_timesteps(sigmas=list(t_schedule))
        ratio = 1.0 - t_schedule
        cfg_on = jnp.asarray(((cfg_interval_start <= ratio) & (ratio <= cfg_interval_end))
                             .astype(np.float32))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    audio_cover_strength=float(audio_cover_strength)), callback_on_step_end,
            static=(float(guidance_scale), do_cfg, float(audio_cover_strength)))
        latents = denoise(t_params, latents, encoder_hidden_states, null_hidden_states,
                          non_cover_hidden_states, context_latents, state.timesteps, cfg_on, state)

        if output_type == "latent":
            if not return_dict:
                return (latents,)
            return AudioPipelineOutput(audios=latents)

        # 9. decode + two-stage peak normalization (reference `:1275`)
        decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
        audio = decode(vae_params, jnp.transpose(latents, (0, 2, 1))).astype(jnp.float32)
        peak = jnp.max(jnp.abs(audio), axis=(1, 2), keepdims=True)
        audio = audio / jnp.maximum(peak, 1.0)
        target_amp = 10.0 ** (-1.0 / 20.0)  # −1 dBFS
        peak = jnp.clip(jnp.max(jnp.abs(audio), axis=(1, 2), keepdims=True), 1e-6)
        audio = audio * (target_amp / peak)

        if output_type == "np":
            audio = np.asarray(audio)
        if not return_dict:
            return (audio,)
        return AudioPipelineOutput(audios=audio)

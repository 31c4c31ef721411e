"""AudioLDM text-to-audio pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/audioldm/pipeline_audioldm.py:60`
AudioLDMPipeline): L2-normalized CLAP pooled text features fed to the UNet
as FiLM `class_labels` (simple-projection class embedding) with
`encoder_hidden_states=None`, mel VAE decode, SpeechT5 HiFi-GAN vocoder.

TPU-first: CFG folds into one doubled batch inside ONE jitted scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import BaseOutput, logging
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class AudioPipelineOutput(BaseOutput):
    audios: np.ndarray


class AudioLDMPipeline(DiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler, vocoder):
        super().__init__()
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler, vocoder=vocoder)
        self.vae_scale_factor = 2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8

    def _encode_prompt(self, prompt, negative_prompt, do_cfg):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]

        def embed(texts):
            tk = self.tokenizer(texts, padding="max_length",
                                max_length=getattr(self.tokenizer, "model_max_length", 512),
                                truncation=True, return_tensors="np")
            return text_encoder.get_text_features(
                te_params, jnp.asarray(np.asarray(tk["input_ids"])),
                attention_mask=jnp.asarray(np.asarray(tk["attention_mask"])))

        embeds = embed(prompt)
        if not do_cfg:
            return embeds
        negative_prompt = negative_prompt if negative_prompt is not None else ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        return jnp.concatenate([embed(negative_prompt), embeds])

    def _denoise(self, u_params, latents, embeds, timesteps, state, guidance_scale, do_cfg):
        unet, scheduler = self.unet[0], self.scheduler
        from ....hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            lat_in = scheduler.scale_model_input(sstate, lat_in, t)
            pred = unet(u_params, lat_in, t, encoder_hidden_states=None,
                        class_labels=embeds).sample
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            return pred

        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None))

    def mel_spectrogram_to_waveform(self, mel_spectrogram):
        vocoder, voc_params = self.vocoder
        if mel_spectrogram.ndim == 4:
            mel_spectrogram = mel_spectrogram[:, 0]
        return vocoder(voc_params, mel_spectrogram)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        audio_length_in_s: Optional[float] = None,
        num_inference_steps: int = 10,
        guidance_scale: float = 2.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_waveforms_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, u_params = self.unet
        vae, vae_params = self.vae
        vocoder = self.vocoder[0]
        if key is None:
            key = jax.random.PRNGKey(0)

        vocoder_upsample_factor = int(np.prod(vocoder.config.upsample_rates)) / vocoder.config.sampling_rate
        if audio_length_in_s is None:
            audio_length_in_s = (unet.config.sample_size or 128) * self.vae_scale_factor * vocoder_upsample_factor
        height = int(audio_length_in_s / vocoder_upsample_factor)
        original_waveform_length = int(audio_length_in_s * vocoder.config.sampling_rate)
        if height % self.vae_scale_factor != 0:
            height = int(np.ceil(height / self.vae_scale_factor)) * self.vae_scale_factor

        do_cfg = guidance_scale > 1.0
        embeds = self._encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = embeds.shape[0] // (2 if do_cfg else 1)
        if num_waveforms_per_prompt > 1:
            embeds = jnp.repeat(embeds, num_waveforms_per_prompt, axis=0)
        eff_batch = batch_size * num_waveforms_per_prompt

        state = self.scheduler.set_timesteps(num_inference_steps)
        shape = (eff_batch, unet.config.in_channels, height // self.vae_scale_factor,
                 vocoder.config.model_in_dim // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * getattr(self.scheduler, "init_noise_sigma", 1.0)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg),
            static=(float(guidance_scale), do_cfg))
        latents = denoise(u_params, latents, embeds, state.timesteps, state)

        if output_type == "latent":
            return AudioPipelineOutput(audios=latents) if return_dict else (latents,)
        decode = self._jit(
            "decode", lambda p, z: self.mel_spectrogram_to_waveform(
                vae.decode(p, z / vae.config.scaling_factor).sample))
        audio = np.asarray(decode(vae_params, latents))[:, :original_waveform_length]
        if not return_dict:
            return (audio,)
        return AudioPipelineOutput(audios=audio)

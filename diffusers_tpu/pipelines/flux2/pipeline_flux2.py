"""Flux 2 text-to-image pipeline.

Behavioral mirror of the reference
`pipelines/flux2/pipeline_flux2.py`: Mistral-3 text conditioning built by
stacking intermediate hidden layers (default (10, 20, 30)) and
concatenating them channel-wise (`:304`), 4-axis (T, H, W, L) position
ids — text rides the L axis, image the H/W axes (`:355`, `:375`),
2x2-patchified then packed latents (`:460`), empirical-mu flow schedule
(`compute_empirical_mu` `:159`), guidance-distilled (guidance embedding,
no CFG), batch-norm latent de-normalization when the VAE carries running
stats, else scaling/shift factors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


def compute_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


@dataclass
class Flux2PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Flux2Pipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(
            scheduler=scheduler, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, transformer=transformer,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)
        self.default_sample_size = 128

    def encode_prompt(self, prompt, max_sequence_length: int = 512,
                      hidden_states_layers: Tuple[int, ...] = (10, 20, 30)):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        inputs = self.tokenizer(
            prompt, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        stacked = jnp.stack([out.hidden_states[k] for k in hidden_states_layers], axis=1)
        B, L_num, S, D = stacked.shape
        return jnp.transpose(stacked, (0, 2, 1, 3)).reshape(B, S, L_num * D)

    @staticmethod
    def _patchify_latents(latents):
        B, C, H, W = latents.shape
        x = latents.reshape(B, C, H // 2, 2, W // 2, 2)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
        return x.reshape(B, C * 4, H // 2, W // 2)

    @staticmethod
    def _unpatchify_latents(latents):
        B, C, H, W = latents.shape
        x = latents.reshape(B, C // 4, 2, 2, H, W)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
        return x.reshape(B, C // 4, H * 2, W * 2)

    @staticmethod
    def _pack_latents(latents):
        B, C, H, W = latents.shape
        return jnp.transpose(latents.reshape(B, C, H * W), (0, 2, 1))

    @staticmethod
    def _latent_ids(batch_size: int, h: int, w: int):
        hh, ww = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        ids = np.stack([np.zeros(h * w), hh.reshape(-1), ww.reshape(-1), np.zeros(h * w)], axis=-1)
        return jnp.asarray(np.tile(ids[None], (batch_size, 1, 1)), dtype=jnp.float32)

    @staticmethod
    def _text_ids(batch_size: int, seq_len: int):
        ids = np.zeros((seq_len, 4), dtype=np.float32)
        ids[:, 3] = np.arange(seq_len)
        return jnp.asarray(np.tile(ids[None], (batch_size, 1, 1)))

    def _denoise(self, tr_params, latents, prompt_embeds, latent_ids, text_ids, guidance,
                 timesteps, state, num_train_timesteps):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            noise_pred = transformer(
                tr_params, latents, encoder_hidden_states=prompt_embeds,
                timestep=jnp.broadcast_to(t, (latents.shape[0],)) / num_train_timesteps,
                img_ids=latent_ids, txt_ids=text_ids, guidance=guidance,
            ).sample
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        hidden_states_layers: Tuple[int, ...] = (10, 20, 30),
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        prompt_embeds = self.encode_prompt(prompt, max_sequence_length, hidden_states_layers)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)

        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        num_latent_channels = vae.config.latent_channels
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_latent_channels * 4, lh // 2, lw // 2), key=lat_key)
        latent_ids = self._latent_ids(batch_size, lh // 2, lw // 2)
        latents = self._pack_latents(latents)
        text_ids = self._text_ids(batch_size, prompt_embeds.shape[1])

        image_seq_len = latents.shape[1]
        mu = compute_empirical_mu(image_seq_len, num_inference_steps)
        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)

        guidance = jnp.full((batch_size,), guidance_scale, dtype=jnp.float32)
        num_train_timesteps = self.scheduler.config.get("num_train_timesteps", 1000)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, num_train_timesteps=num_train_timesteps),
            static=(num_inference_steps, guidance_scale, num_train_timesteps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, latent_ids, text_ids, guidance,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            # unpack [B, HW, C] -> [B, C, H, W]
            B, N, C = latents.shape
            latents = jnp.transpose(latents, (0, 2, 1)).reshape(B, C, lh // 2, lw // 2)
            if hasattr(vae, "latent_distribution_stats"):
                # real Flux2 VAE: denormalize patched latents with the BatchNorm
                # stats (reference pipeline_flux2.py:1018-1022)
                bn_mean, bn_std = vae.latent_distribution_stats(vae_params)
                latents = latents * bn_std.reshape(1, -1, 1, 1) + bn_mean.reshape(1, -1, 1, 1)
                latents = self._unpatchify_latents(latents)
            else:
                scaling = getattr(vae.config, "scaling_factor", None)
                shift = getattr(vae.config, "shift_factor", 0.0) or 0.0
                latents = self._unpatchify_latents(latents)
                if scaling:
                    latents = latents / scaling + shift
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return Flux2PipelineOutput(images=image)

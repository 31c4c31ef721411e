"""Audio Diffusion: unconditional audio generation via mel-spectrogram images.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/audio_diffusion/pipeline_audio_diffusion.py:31`):
a UNet2DModel denoises mel-spectrogram "images" (optionally in a VAE latent
space), with optional audio-conditioned start (`start_step`) and
start/end-second masking for out-painting continuation; generated images are
inverted to waveforms by the Mel Griffin-Lim converter. `encode` reverses the
deterministic DDIM process to recover noise from an image.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....schedulers.scheduling_ddim import DDIMScheduler
from ....utils import BaseOutput
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline
from .mel import Mel


@dataclass
class AudioDiffusionPipelineOutput(BaseOutput):
    images: List
    audios: np.ndarray


class AudioDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vqvae, unet, mel: Mel, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler, mel=mel, vqvae=vqvae)

    def get_default_steps(self) -> int:
        return 50 if isinstance(self.scheduler, DDIMScheduler) else 1000

    def __call__(
        self,
        batch_size: int = 1,
        audio_file: str = None,
        raw_audio: np.ndarray = None,
        slice: int = 0,
        start_step: int = 0,
        steps: int = None,
        mask_start_secs: float = 0,
        mask_end_secs: float = 0,
        eta: float = 0,
        noise: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        mel = self.mel
        if key is None:
            key = jax.random.PRNGKey(0)
        steps = steps or self.get_default_steps()
        state = self.scheduler.set_timesteps(steps)

        sample_size = unet.config.sample_size
        if isinstance(sample_size, int):
            sample_size = (sample_size, sample_size)
        if noise is None:
            key, noise_key = jax.random.split(key)
            noise = randn_tensor((batch_size, unet.config.in_channels) + tuple(sample_size),
                                 key=noise_key)
        images = noise
        mask = None
        mask_start = mask_end = 0

        if audio_file is not None or raw_audio is not None:
            mel.load_audio(audio_file, raw_audio)
            input_image = mel.audio_slice_to_image(slice)
            arr = np.frombuffer(input_image.tobytes(), dtype="uint8").reshape(
                (input_image.height, input_image.width))
            input_images = jnp.asarray((arr / 255) * 2 - 1, jnp.float32)[None]
            if self.vqvae is not None:
                vq, vq_params = self.vqvae
                key, enc_key = jax.random.split(key)
                input_images = vq.encode(vq_params, input_images[None]).sample(enc_key)[0]
                input_images = vq.config.scaling_factor * input_images
            if start_step > 0:
                noised = self.scheduler.add_noise(
                    state, input_images, noise[0], state.timesteps[start_step - 1: start_step])
                images = images.at[0].set(noised)
            pixels_per_second = sample_size[1] * mel.get_sample_rate() / mel.x_res / mel.hop_length
            mask_start = int(mask_start_secs * pixels_per_second)
            mask_end = int(mask_end_secs * pixels_per_second)
            # per-step noised original for the masked (preserved) columns
            mask = jax.vmap(lambda t: self.scheduler.add_noise(
                state, input_images, noise[0], jnp.broadcast_to(t, (1,))))(state.timesteps[start_step:])

        scheduler = self.scheduler

        def step_fn(carry, xs):
            images, sstate = carry
            t, step_mask = xs
            t_b = jnp.broadcast_to(t, (images.shape[0],))
            model_output = unet(unet_params, images, t_b).sample
            out = scheduler.step(sstate, model_output, t, images, eta=eta) \
                if isinstance(scheduler, DDIMScheduler) else scheduler.step(sstate, model_output, t, images)
            images = out.prev_sample
            if mask is not None:
                # step_mask: [C, H, W] noised original, broadcast over batch
                if mask_start > 0:
                    images = images.at[:, :, :, :mask_start].set(step_mask[None, :, :, :mask_start])
                if mask_end > 0:
                    images = images.at[:, :, :, -mask_end:].set(step_mask[None, :, :, -mask_end:])
            return (images, out.state), None

        xs = (state.timesteps[start_step:],
              mask if mask is not None else jnp.zeros((len(state.timesteps) - start_step, 1, 1, 1, 1)))
        (images, _), _ = jax.lax.scan(step_fn, (images, state), xs)

        if self.vqvae is not None:
            vq, vq_params = self.vqvae
            images = vq.decode(vq_params, images / vq.config.scaling_factor).sample

        from PIL import Image

        arr = np.asarray(jnp.clip(images / 2 + 0.5, 0, 1))
        arr = (arr.transpose(0, 2, 3, 1) * 255).round().astype("uint8")
        pil = [Image.fromarray(a[:, :, 0]) if a.shape[2] == 1
               else Image.fromarray(a, mode="RGB").convert("L") for a in arr]
        audios = [mel.image_to_audio(im) for im in pil]
        if not return_dict:
            return pil, (mel.get_sample_rate(), audios)
        return AudioDiffusionPipelineOutput(images=pil, audios=np.array(audios)[:, np.newaxis, :])

    def encode(self, images: List, steps: int = 50) -> np.ndarray:
        """Deterministic DDIM inversion of spectrogram images (reference
        `:268`)."""
        assert isinstance(self.scheduler, DDIMScheduler)
        unet, unet_params = self.unet
        state = self.scheduler.set_timesteps(steps)
        sample = np.array([
            np.frombuffer(im.tobytes(), dtype="uint8").reshape((1, im.height, im.width))
            for im in images])
        sample = jnp.asarray((sample / 255) * 2 - 1, jnp.float32)
        step_ratio = self.scheduler.config.num_train_timesteps // steps
        for t in np.asarray(state.timesteps)[::-1]:
            prev_t = int(t) - step_ratio
            alpha_prod_t = state.alphas_cumprod[int(t)]
            alpha_prod_t_prev = state.alphas_cumprod[prev_t] if prev_t >= 0 else state.final_alpha_cumprod
            beta_prod_t = 1 - alpha_prod_t
            t_b = jnp.broadcast_to(jnp.asarray(t), (sample.shape[0],))
            model_output = unet(unet_params, sample, t_b).sample
            # reverse DDIM (reference `:290-303`)
            pred_dir = (1 - alpha_prod_t_prev) ** 0.5 * model_output
            sample = (sample - pred_dir) * alpha_prod_t_prev ** -0.5
            sample = sample * alpha_prod_t**0.5 + beta_prod_t**0.5 * model_output
        return np.asarray(sample)

    @staticmethod
    def slerp(x0, x1, alpha: float):
        """Spherical linear interpolation between noise tensors (reference
        `:307`)."""
        x0 = jnp.asarray(x0)
        x1 = jnp.asarray(x1)
        theta = jnp.arccos(jnp.clip(
            jnp.vdot(x0.ravel(), x1.ravel()) / (jnp.linalg.norm(x0) * jnp.linalg.norm(x1)),
            -1.0, 1.0))
        return (jnp.sin((1 - alpha) * theta) * x0 + jnp.sin(alpha * theta) * x1) / jnp.sin(theta)

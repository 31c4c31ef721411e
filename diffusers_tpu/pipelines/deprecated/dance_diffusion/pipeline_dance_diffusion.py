"""Dance Diffusion unconditional audio generation.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/dance_diffusion/pipeline_dance_diffusion.py:33`
DanceDiffusionPipeline): sample length snapped UP to the UNet's downsample
factor, plain `unet(audio, t)` loop, output clipped to [-1, 1] and cut back
to the originally requested length.

TPU-first: the whole denoise loop is ONE jitted `lax.scan` (scheduler state
threads through the carry), static audio length per compile.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

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


class DanceDiffusionPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key, batch_size, num_inference_steps, sample_size):
        model, scheduler = self.unet[0], self.scheduler
        try:
            state = scheduler.set_timesteps(
                num_inference_steps,
                sample_shape=(batch_size, model.config.in_channels, sample_size))
        except TypeError:
            state = scheduler.set_timesteps(num_inference_steps)
        audio = randn_tensor((batch_size, model.config.in_channels, sample_size), key=key)
        audio = audio * getattr(scheduler, "init_noise_sigma", 1.0)

        def step_fn(carry, t):
            sample, sstate = carry
            out = scheduler.step(sstate, model(params, sample, t).sample, t, sample)
            sstate = getattr(out, "state", sstate)
            return (out.prev_sample, sstate), None

        (audio, _), _ = jax.lax.scan(step_fn, (audio, state), state.timesteps)
        return jnp.clip(audio, -1, 1)

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 100,
                 audio_length_in_s: Optional[float] = None,
                 key: Optional[jax.Array] = None, return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        if audio_length_in_s is None:
            audio_length_in_s = model.config.sample_size / model.config.sample_rate
        sample_size = audio_length_in_s * model.config.sample_rate

        down_scale_factor = 2 ** len(model.up_blocks)
        if sample_size < 3 * down_scale_factor:
            raise ValueError(
                f"{audio_length_in_s} is too small. Make sure it's bigger or equal to"
                f" {3 * down_scale_factor / model.config.sample_rate}.")

        original_sample_size = int(sample_size)
        if sample_size % down_scale_factor != 0:
            sample_size = (int(audio_length_in_s * model.config.sample_rate)
                           // down_scale_factor + 1) * down_scale_factor
            logger.info(
                "sample length increased to %s so the UNet's %sx downsampling divides it",
                sample_size / model.config.sample_rate, down_scale_factor)
        sample_size = int(sample_size)

        generate = self._jit(
            "generate",
            partial(self._generate, batch_size=batch_size,
                    num_inference_steps=num_inference_steps, sample_size=sample_size),
            static=(batch_size, num_inference_steps, sample_size))
        audio = np.asarray(generate(self.unet[1], key))[:, :, :original_sample_size]
        if not return_dict:
            return (audio,)
        return AudioPipelineOutput(audios=audio)


__all__ = ["AudioPipelineOutput", "DanceDiffusionPipeline"]

"""DDPM unconditional generation pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ddpm/pipeline_ddpm.py:33`), with the
denoise loop compiled to a single `lax.scan` under jit — the per-step ancestral
noise is drawn inside the scan from split PRNG keys, so the whole generation is
one device program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import DDPMScheduler
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray  # [B, H, W, C] float in [0, 1] or PIL list


class DDPMPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(
        self,
        params,
        key: jax.Array,
        batch_size: int,
        num_inference_steps: int,
        image_shape: Tuple[int, int, int],
    ) -> jax.Array:
        """Fully-jitted sampling: init noise + scanned denoise loop."""
        model, scheduler = self.unet[0], self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)

        key, init_key = jax.random.split(key)
        sample = randn_tensor((batch_size, *image_shape), key=init_key)
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def step_fn(carry, xs):
            sample, sstate = carry
            t, k = xs
            model_output = model(params, sample, t).sample
            out = scheduler.step(sstate, model_output, t, sample, key=k)
            return (out.prev_sample, out.state), None

        (sample, _), _ = jax.lax.scan(step_fn, (sample, state), (state.timesteps, step_keys))
        image = jnp.clip(sample / 2 + 0.5, 0, 1)
        return jnp.transpose(image, (0, 2, 3, 1))  # NHWC output

    def __call__(
        self,
        batch_size: int = 1,
        key: Optional[jax.Array] = None,
        num_inference_steps: int = 1000,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        sample_size = model.config.sample_size
        if isinstance(sample_size, int):
            image_shape = (model.config.in_channels, sample_size, sample_size)
        else:
            image_shape = (model.config.in_channels, *sample_size)

        generate = self._jit(
            "generate",
            partial(self._generate, batch_size=batch_size, num_inference_steps=num_inference_steps,
                    image_shape=image_shape),
            static=(batch_size, num_inference_steps, image_shape),
        )
        image = generate(self.unet[1], key)
        image = np.asarray(image)

        if output_type == "pil":
            from ...image_processor import numpy_to_pil

            image = numpy_to_pil(image)

        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)

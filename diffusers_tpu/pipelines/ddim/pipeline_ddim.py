"""DDIM unconditional generation pipeline.

Behavioral mirror of the reference
(`pipelines/ddim/pipeline_ddim.py:37`): UNet2DModel + DDIMScheduler
sampling with configurable eta and clipped-model-output handling. The
denoise loop is a single `lax.scan` under jit; eta>0 ancestral noise is
drawn from split PRNG keys inside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray


class DDIMPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key: jax.Array, batch_size: int, num_inference_steps: int,
                  eta: float, use_clipped_model_output: bool, image_shape: Tuple[int, int, int]):
        model, scheduler = self.unet[0], self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)

        key, init_key = jax.random.split(key)
        sample = randn_tensor((batch_size, *image_shape), key=init_key)
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def step_fn(sample, xs):
            t, k = xs
            model_output = model(params, sample, t).sample
            out = scheduler.step(state, model_output, t, sample, eta=eta,
                                 use_clipped_model_output=bool(use_clipped_model_output), key=k)
            return out.prev_sample, None

        sample, _ = jax.lax.scan(step_fn, sample, (state.timesteps, step_keys))
        image = jnp.clip(sample / 2 + 0.5, 0, 1)
        return jnp.transpose(image, (0, 2, 3, 1))

    def __call__(
        self,
        batch_size: int = 1,
        key: Optional[jax.Array] = None,
        eta: float = 0.0,
        num_inference_steps: int = 50,
        use_clipped_model_output: Optional[bool] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        if not 0.0 <= eta <= 1.0:
            raise ValueError(f"`eta` must be in [0, 1], got {eta}")
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        sample_size = model.config.sample_size
        if isinstance(sample_size, int):
            image_shape = (model.config.in_channels, sample_size, sample_size)
        else:
            image_shape = (model.config.in_channels, *tuple(sample_size))

        generate = self._jit(
            "generate",
            partial(self._generate, batch_size=batch_size, num_inference_steps=num_inference_steps,
                    eta=eta, use_clipped_model_output=use_clipped_model_output or False,
                    image_shape=image_shape),
            static=(batch_size, num_inference_steps, eta, use_clipped_model_output, image_shape),
        )
        image = np.asarray(generate(self.unet[1], key))

        if output_type == "pil":
            from ...image_processor import numpy_to_pil

            image = numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)

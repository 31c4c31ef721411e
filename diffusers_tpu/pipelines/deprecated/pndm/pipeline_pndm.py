"""PNDM unconditional generation pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/pndm/pipeline_pndm.py`
PNDMPipeline): plain unet(sample, t) loop under the PNDM multistep
scheduler. The denoise loop compiles to one `lax.scan` under jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import BaseOutput
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray


class PNDMPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key, batch_size, num_inference_steps, image_shape):
        model, scheduler = self.unet[0], self.scheduler
        try:
            state = scheduler.set_timesteps(num_inference_steps,
                                            sample_shape=(batch_size, *image_shape))
        except TypeError:
            state = scheduler.set_timesteps(num_inference_steps)
        sample = randn_tensor((batch_size, *image_shape), key=key)

        def step_fn(carry, t):
            sample, sstate = carry
            out = scheduler.step(sstate, model(params, sample, t).sample, t, sample)
            return (out.prev_sample, out.state), None

        (sample, _), _ = jax.lax.scan(step_fn, (sample, state), state.timesteps)
        return jnp.transpose(jnp.clip(sample / 2 + 0.5, 0, 1), (0, 2, 3, 1))

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 key: Optional[jax.Array] = None, output_type: str = "pil",
                 return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        ss = model.config.sample_size
        shape = (model.config.in_channels, ss, ss) if isinstance(ss, int) else (model.config.in_channels, *ss)
        from functools import partial
        generate = self._jit(
            "generate",
            partial(self._generate, batch_size=batch_size,
                    num_inference_steps=num_inference_steps, image_shape=shape),
            static=(batch_size, num_inference_steps, shape))
        image = np.asarray(generate(self.unet[1], key))
        if output_type == "pil":
            from ....image_processor import VaeImageProcessor
            image = VaeImageProcessor.numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)

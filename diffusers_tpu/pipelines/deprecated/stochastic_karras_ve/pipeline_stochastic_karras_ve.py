"""Stochastic Karras VE unconditional pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stochastic_karras_ve/pipeline_stochastic_karras_ve.py`
KarrasVePipeline): per step — churn to sigma_hat, model on `(x+1)/2` scaled
by `sigma/2`, Euler predictor, Heun corrector whenever `sigma_prev > 0`.
One `lax.scan` with the corrector under `lax.cond`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
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


class KarrasVePipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key, batch_size, num_inference_steps, image_shape):
        model, scheduler = self.unet[0], self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        key, init_key = jax.random.split(key)
        sample = randn_tensor((batch_size, *image_shape), key=init_key) * scheduler.init_noise_sigma
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def step_fn(sample, xs):
            t, k = xs
            sigma = state.schedule[t]
            sigma_prev = jnp.where(t > 0, state.schedule[jnp.maximum(t - 1, 0)], 0.0)
            sample_hat, sigma_hat = scheduler.add_noise_to_input(state, sample, sigma, k)
            model_output = (sigma_hat / 2) * model(params, (sample_hat + 1) / 2, sigma_hat / 2).sample
            out = scheduler.step(state, model_output, sigma_hat, sigma_prev, sample_hat)

            def correct(prev):
                mo = (sigma_prev / 2) * model(params, (prev + 1) / 2, sigma_prev / 2).sample
                return scheduler.step_correct(state, mo, sigma_hat, sigma_prev,
                                              sample_hat, prev, out.derivative).prev_sample

            sample = jax.lax.cond(sigma_prev != 0, correct, lambda p: p, out.prev_sample)
            return sample, None

        sample, _ = jax.lax.scan(step_fn, sample, (state.timesteps, step_keys))
        return jnp.transpose(jnp.clip(sample / 2 + 0.5, 0, 1), (0, 2, 3, 1))

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 key: Optional[jax.Array] = None, output_type: str = "pil",
                 return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        shape = (3, model.config.sample_size, model.config.sample_size)
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

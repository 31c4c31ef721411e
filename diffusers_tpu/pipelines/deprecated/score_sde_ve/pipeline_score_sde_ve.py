"""Score-SDE VE unconditional pipeline (predictor-corrector sampling).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/score_sde_ve/pipeline_score_sde_ve.py`
ScoreSdeVePipeline): per timestep, `correct_steps` Langevin corrector steps
then one reverse-SDE predictor step; the MEAN of the last predictor step is
returned. One `lax.scan` over timesteps with an inner `lax.fori_loop` for
the corrector.
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


class ScoreSdeVePipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key, batch_size, num_inference_steps, image_shape):
        model, scheduler = self.unet[0], self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        key, init_key = jax.random.split(key)
        sample = randn_tensor((batch_size, *image_shape), key=init_key) * scheduler.init_noise_sigma
        n = state.timesteps.shape[0]
        step_keys = jax.random.split(key, n)
        correct_steps = int(self.scheduler.config.correct_steps)

        def step_fn(carry, xs):
            sample, _ = carry
            t, k, i = xs
            sigma_t = state.sigmas[i] * jnp.ones((sample.shape[0],), sample.dtype)

            def corrector(j, val):
                s, kk = val
                kk, sub = jax.random.split(kk)
                mo = model(params, s, sigma_t).sample
                s = scheduler.step_correct(state, mo, s, key=sub).prev_sample
                return (s, kk)

            sample, k = jax.lax.fori_loop(0, correct_steps, corrector, (sample, k))
            k, sub = jax.random.split(k)
            mo = model(params, sample, sigma_t).sample
            out = scheduler.step_pred(state, mo, t, sample, key=sub)
            return (out.prev_sample, out.prev_sample_mean), None

        (sample, sample_mean), _ = jax.lax.scan(
            step_fn, (sample, sample), (state.timesteps, step_keys, jnp.arange(n)))
        return jnp.transpose(jnp.clip(sample_mean, 0, 1), (0, 2, 3, 1))

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 2000,
                 key: Optional[jax.Array] = None, output_type: str = "pil",
                 return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        model = self.unet[0]
        shape = (model.config.in_channels if hasattr(model.config, "in_channels") else 3,
                 model.config.sample_size, model.config.sample_size)
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

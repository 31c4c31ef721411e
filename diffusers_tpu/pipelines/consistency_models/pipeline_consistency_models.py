"""Consistency Models unconditional/class-conditional generation.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/consistency_models/pipeline_consistency_models.py:46`:
onestep (distillation) and multistep stochastic-iterative sampling over a
UNet2DModel with boundary-condition scalings).

TPU-first: per-step Gaussian kicks are pre-split PRNG keys fed to the scan as
xs — one jitted loop, zero per-step host RNG sync.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class ConsistencyModelPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _denoise(self, unet_params, sample, class_labels, timesteps, keys, state):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, xs):
            sample, sstate = carry
            t, key = xs
            scaled = scheduler.scale_model_input(sstate, sample)
            t_b = jnp.broadcast_to(t, (sample.shape[0],))
            model_output = unet(unet_params, scaled, t_b, class_labels=class_labels).sample
            out = scheduler.step(sstate, model_output, t, sample, key=key)
            return (out.prev_sample, out.state), None

        (sample, _), _ = jax.lax.scan(step_fn, (sample, state), (timesteps, keys))
        return sample

    def __call__(
        self,
        batch_size: int = 1,
        class_labels: Optional[Union[jax.Array, List[int], int]] = None,
        num_inference_steps: int = 1,
        timesteps: Optional[List[int]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        img_size = unet.config.sample_size
        channels = unet.config.in_channels
        if key is None:
            key = jax.random.PRNGKey(0)
        key, noise_key = jax.random.split(key)

        if latents is None:
            sample = randn_tensor((batch_size, channels, img_size, img_size), key=noise_key)
        else:
            sample = latents
        state = self.scheduler.set_timesteps(num_inference_steps, timesteps=timesteps)
        sample = sample * state.init_noise_sigma

        if isinstance(class_labels, int):
            class_labels = [class_labels] * batch_size
        if class_labels is not None:
            class_labels = jnp.asarray(class_labels, dtype=jnp.int32)

        n = state.timesteps.shape[0]
        step_keys = jax.random.split(key, n)
        denoise = self._jit("denoise", self._denoise)
        sample = denoise(unet_params, sample, class_labels, state.timesteps, step_keys, state)

        image = VaeImageProcessor.denormalize(sample)
        image = np.asarray(jnp.transpose(image, (0, 2, 3, 1)))
        if output_type == "pil":
            from ...image_processor import numpy_to_pil

            image = numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)

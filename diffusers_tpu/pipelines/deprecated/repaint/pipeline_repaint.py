"""RePaint inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/repaint/pipeline_repaint.py`
RePaintPipeline): the resampling schedule interleaves denoise steps with
forward "undo" jumps; at each position the choice step-vs-undo is
`t < t_last`, which is STATIC given the precomputed schedule.

TPU-first: the whole resampling trajectory runs as one `lax.scan` with a
static per-position flag selecting between the model step and the undo
renoise via `lax.cond` — the model only executes on denoise positions.
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


class RePaintPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def _generate(self, params, key, original_image, mask, state, is_undo):
        model, scheduler = self.unet[0], self.scheduler
        key, init_key = jax.random.split(key)
        image = randn_tensor(original_image.shape, key=init_key)
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def denoise(args):
            img, t, k = args
            out = scheduler.step(state, model(params, img, t).sample, t, img,
                                 original_image, mask, key=k)
            return out.prev_sample

        def undo(args):
            img, t, k = args
            # undo_step takes the PREVIOUS (smaller) timestep t_last = t - 1
            return scheduler.undo_step(state, img, t - 1, key=k)

        def step_fn(image, xs):
            t, k, flag = xs
            image = jax.lax.cond(flag, undo, denoise, (image, t, k))
            return image, None

        image, _ = jax.lax.scan(step_fn, image, (state.timesteps, step_keys, is_undo))
        return jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1))

    def __call__(self, image, mask_image, num_inference_steps: int = 250, eta: float = 0.0,
                 jump_length: int = 10, jump_n_sample: int = 10,
                 key: Optional[jax.Array] = None, output_type: str = "pil",
                 return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        original_image = jnp.asarray(np.asarray(image, np.float32))
        mask = jnp.asarray(np.asarray(mask_image, np.float32))
        if original_image.ndim == 3:
            original_image = original_image[None]
        if mask.ndim == 3:
            mask = mask[None]

        if eta != self.scheduler.config.eta:
            self.scheduler.register_to_config(eta=eta)
            self.clear_jit_cache()
        state = self.scheduler.set_timesteps(num_inference_steps, jump_length, jump_n_sample)
        ts = np.asarray(state.timesteps)
        t_last = np.concatenate([[ts[0] + 1], ts[:-1]])
        is_undo = jnp.asarray(ts >= t_last)  # forward jump positions (static)

        generate = self._jit(
            "generate", self._generate,
            static=(num_inference_steps, jump_length, jump_n_sample, float(eta)))
        img = np.asarray(generate(self.unet[1], key, original_image, mask, state, is_undo))
        if output_type == "pil":
            from ....image_processor import VaeImageProcessor
            img = VaeImageProcessor.numpy_to_pil(img)
        if not return_dict:
            return (img,)
        return ImagePipelineOutput(images=img)

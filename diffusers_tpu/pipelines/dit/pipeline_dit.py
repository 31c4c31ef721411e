"""DiT class-conditional image generation pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/dit/pipeline_dit.py:41` DiTPipeline:
CFG via the null-class row `:133-137`, eps-only guidance on the first
latent_channels `:168-176`, learned-sigma split `:179-183`).

TPU-first: one scanned, jitted denoise loop over the class-conditioned DiT;
the CFG batch doubling happens once outside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
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


class DiTPipeline(DiffusionPipeline):
    def __init__(self, transformer, vae, scheduler, id2label: Optional[dict] = None):
        super().__init__()
        self.register_modules(transformer=transformer, vae=vae, scheduler=scheduler)
        self.labels = {}
        if id2label is not None:
            for key, value in id2label.items():
                for label in value.split(","):
                    self.labels[label.lstrip().rstrip()] = int(key)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def get_label_ids(self, label: Union[str, List[str]]) -> List[int]:
        """Map ImageNet label strings to class ids (reference :78)."""
        if not isinstance(label, list):
            label = [label]
        for l in label:
            if l not in self.labels:
                raise ValueError(f"{l} does not exist; available labels: {sorted(self.labels)[:20]}...")
        return [self.labels[l] for l in label]

    def _denoise(self, t_params, latents, class_labels_input, timesteps, state,
                 guidance_scale, do_cfg, latent_channels):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t) if hasattr(
                scheduler, "scale_model_input") else latent_input
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(t_params, latent_input, timestep=t_b, class_labels=class_labels_input).sample
            if do_cfg:
                eps, rest = noise_pred[:, :latent_channels], noise_pred[:, latent_channels:]
                cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
                half_eps = uncond_eps + guidance_scale * (cond_eps - uncond_eps)
                rest_half = jnp.split(rest, 2, axis=0)[0]
                noise_pred = jnp.concatenate([half_eps, rest_half], axis=1)
            # learned sigma: schedulers that don't model variance get the eps
            # half only (reference :179-183 splits before stepping)
            model_output = noise_pred
            if noise_pred.shape[1] == 2 * latent_channels and scheduler.config.get(
                    "variance_type") not in ("learned", "learned_range"):
                model_output = noise_pred[:, :latent_channels]
            out = scheduler.step(sstate, model_output, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        class_labels: List[int],
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        num_inference_steps: int = 50,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        batch_size = len(class_labels)
        latent_size = transformer.config.sample_size
        latent_channels = transformer.config.in_channels

        latents = randn_tensor((batch_size, latent_channels, latent_size, latent_size), key=key)
        do_cfg = guidance_scale > 1.0
        labels = jnp.asarray(class_labels, dtype=jnp.int32)
        if do_cfg:
            null = jnp.full((batch_size,), transformer.config.num_embeds_ada_norm, dtype=jnp.int32)
            labels = jnp.concatenate([labels, null], axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    latent_channels=latent_channels),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, labels, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)

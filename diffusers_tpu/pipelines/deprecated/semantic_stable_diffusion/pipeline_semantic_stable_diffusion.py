"""Semantic Guidance (SEGA) Stable Diffusion pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/semantic_stable_diffusion/pipeline_semantic_stable_diffusion.py:32`,
arXiv:2301.12247): extra per-concept UNet streams steer generation toward or
away from editing prompts. Per concept: the (concept − uncond) direction is
scaled, sparsified to the per-(batch, channel) `edit_threshold` quantile of
its magnitude (`:634-652`), weighted, accumulated with momentum, and added to
the CFG direction after `edit_warmup_steps` (subset-normalized while only
some concepts are warm, `:660-676`; momentum-included once all are,
`:692-694`; zeroed past `edit_cooldown_steps`).

TPU-native: the [uncond | text | concepts...] streams run as ONE
(2+C)·B-batch forward inside a single lax.scan; warmup/cooldown gates ride
the scan xs as host-precomputed per-step masks and the quantile sparsifier is
`jnp.quantile` over the flattened spatial axis.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.jax_utils import randn_tensor
from ...stable_diffusion.pipeline_stable_diffusion import (
    StableDiffusionPipeline,
    StableDiffusionPipelineOutput,
)


def _per_concept(v, n, default):
    if v is None:
        v = default
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v] * n


class SemanticStableDiffusionPipeline(StableDiffusionPipeline):
    def _denoise_sega(self, unet_params, prompt_embeds, latents, warm_mask, cool_mask,
                      guidance_scale, num_inference_steps, n_concepts,
                      edit_guidance_scales, edit_thresholds, reverse_dirs, edit_weights,
                      edit_momentum_scale, edit_mom_beta):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        streams = 2 + n_concepts

        def step_fn(carry, xs):
            latents, sstate, momentum = carry
            t, warm, cool = xs  # warm/cool: bool [C]
            latent_input = jnp.concatenate([latents] * streams, axis=0)
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = unet(unet_params, latent_input, t_b, encoder_hidden_states=prompt_embeds).sample
            parts = jnp.split(noise_pred, streams, axis=0)
            uncond, text = parts[0], parts[1]
            noise_guidance = guidance_scale * (text - uncond)

            if n_concepts:
                edits, weights = [], []
                for c in range(n_concepts):
                    e = (parts[2 + c] - uncond) * (-1.0 if reverse_dirs[c] else 1.0)
                    e = e * edit_guidance_scales[c]
                    # per-(batch, channel) quantile over spatial dims (`:634`)
                    q = jnp.quantile(jnp.abs(e).reshape(e.shape[0], e.shape[1], -1),
                                     edit_thresholds[c], axis=2)
                    e = jnp.where(jnp.abs(e) >= q[:, :, None, None], e, 0.0)
                    e = jnp.where(cool[c], 0.0, e)  # past cooldown: zero
                    edits.append(e)
                    weights.append(edit_weights[c])
                edits = jnp.stack(edits)  # [C, B, ...]
                w = jnp.asarray(weights, jnp.float32)  # constant positive weights
                full_edit = jnp.einsum("c,cbijk->bijk", w, edits)
                full_edit = full_edit + edit_momentum_scale * momentum
                momentum = edit_mom_beta * momentum + (1 - edit_mom_beta) * full_edit
                # subset path while only some concepts are warm (`:660`)
                w_sub = w * warm.astype(jnp.float32)
                w_sub = w_sub / jnp.maximum(w_sub.sum(), 1e-9)
                subset_edit = jnp.einsum("c,cbijk->bijk", w_sub, edits)
                all_warm = warm.all()
                any_warm = warm.any()
                noise_guidance = noise_guidance + jnp.where(
                    all_warm, full_edit, jnp.where(any_warm, subset_edit, 0.0))

            noise_pred = uncond + noise_guidance
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state, momentum), None

        momentum0 = jnp.zeros_like(latents)
        (latents, _, _), _ = jax.lax.scan(
            step_fn, (latents, state, momentum0), (state.timesteps, warm_mask, cool_mask))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        editing_prompt: Optional[Union[str, List[str]]] = None,
        reverse_editing_direction: Union[bool, List[bool]] = False,
        edit_guidance_scale: Union[float, List[float]] = 5.0,
        edit_warmup_steps: Union[int, List[int]] = 10,
        edit_cooldown_steps: Optional[Union[int, List[int]]] = None,
        edit_threshold: Union[float, List[float]] = 0.9,
        edit_momentum_scale: float = 0.1,
        edit_mom_beta: float = 0.4,
        edit_weights: Optional[List[float]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        height = height or unet.config.sample_size * self.vae_scale_factor
        width = width or unet.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        if not do_cfg:
            return super().__call__(
                prompt=prompt, height=height, width=width,
                num_inference_steps=num_inference_steps, guidance_scale=guidance_scale,
                key=key, latents=latents, output_type=output_type, return_dict=return_dict)

        prompt_embeds = self.encode_prompt(prompt, negative_prompt, True)
        batch_size = prompt_embeds.shape[0] // 2

        if isinstance(editing_prompt, str):
            editing_prompt = [editing_prompt]
        n_concepts = len(editing_prompt) if editing_prompt else 0
        if n_concepts:
            for p in editing_prompt:
                concept = self.encode_prompt([p] * batch_size, None, False)
                prompt_embeds = jnp.concatenate([prompt_embeds, concept], axis=0)

        gscales = tuple(float(v) for v in _per_concept(edit_guidance_scale, n_concepts, 5.0))
        thresholds = tuple(float(v) for v in _per_concept(edit_threshold, n_concepts, 0.9))
        reverse = tuple(bool(v) for v in _per_concept(reverse_editing_direction, n_concepts, False))
        weights = tuple(float(v) for v in _per_concept(edit_weights, n_concepts, 1.0))
        warmups = _per_concept(edit_warmup_steps, n_concepts, 10)
        cooldowns = _per_concept(edit_cooldown_steps, n_concepts, None)

        steps = np.arange(num_inference_steps)
        warm_mask = np.stack([steps >= w for w in warmups], axis=1) if n_concepts else \
            np.zeros((num_inference_steps, 0), bool)
        cool_mask = np.stack(
            [steps >= (c if c is not None else num_inference_steps) for c in cooldowns], axis=1
        ) if n_concepts else np.zeros((num_inference_steps, 0), bool)

        shape = (batch_size, unet.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        denoise = self._jit(
            "denoise_sega",
            partial(self._denoise_sega, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, n_concepts=n_concepts,
                    edit_guidance_scales=gscales, edit_thresholds=thresholds,
                    reverse_dirs=reverse, edit_weights=weights,
                    edit_momentum_scale=float(edit_momentum_scale),
                    edit_mom_beta=float(edit_mom_beta)),
            static=(guidance_scale, num_inference_steps, n_concepts, gscales, thresholds,
                    reverse, weights, float(edit_momentum_scale), float(edit_mom_beta)),
        )
        latents = denoise(unet_params, prompt_embeds, latents,
                          jnp.asarray(warm_mask), jnp.asarray(cool_mask))

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)
        if not return_dict:
            return (image, None)
        return StableDiffusionPipelineOutput(images=image)

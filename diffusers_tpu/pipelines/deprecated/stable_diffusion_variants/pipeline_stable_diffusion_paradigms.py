"""ParaDiGMS parallel-in-time Stable Diffusion sampling.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_variants/pipeline_stable_diffusion_paradigms.py:75`,
arXiv:2305.16317): Picard iteration over a sliding window of `parallel`
timesteps — the UNet evaluates the WHOLE window as one batch, drifts
accumulate by cumulative sum, and the window slides forward past every entry
whose fixed-point error fell under tolerance.

TPU-native: each window evaluation is one jitted program over a
[P·(2)B, C, H, W] batch (per-sample timesteps via the parallel schedulers'
`batch_step_no_noise`); only the scalar slide index is read back per
iteration — the adaptive window control is inherently host-driven, exactly
like the reference. Distinct window lengths (full vs tail) each compile once.
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


class StableDiffusionParadigmsPipeline(StableDiffusionPipeline):
    def _window_eval(self, unet_params, buffer_window, anchor, t_block, noise_block,
                     prompt_embeds, state, guidance_scale, do_cfg, is_ode):
        """One Picard iteration over the current window: returns the updated
        window latents and the per-entry squared error ratios."""
        unet = self.unet[0]
        scheduler = self.scheduler
        p, b = buffer_window.shape[0], buffer_window.shape[1]

        flat = buffer_window.reshape((p * b,) + buffer_window.shape[2:])
        t_vec = jnp.repeat(t_block, b)
        if do_cfg:
            latent_input = jnp.concatenate([flat, flat], axis=0)
            t_in = jnp.concatenate([t_vec, t_vec], axis=0)
            neg, pos = jnp.split(prompt_embeds, 2, axis=0)
            embeds = jnp.concatenate([jnp.tile(neg, (p, 1, 1)), jnp.tile(pos, (p, 1, 1))], axis=0)
        else:
            latent_input = flat
            t_in = t_vec
            embeds = jnp.tile(prompt_embeds, (p, 1, 1))
        latent_input = scheduler.scale_model_input(state, latent_input, t_in)
        noise_pred = unet(unet_params, latent_input, t_in, encoder_hidden_states=embeds).sample
        if do_cfg:
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + guidance_scale * (text - uncond)

        denoised = scheduler.batch_step_no_noise(state, noise_pred, t_vec, flat)
        denoised = denoised.reshape(buffer_window.shape)

        delta = denoised - buffer_window
        cumulative_delta = jnp.cumsum(delta, axis=0)
        if is_ode:
            cumulative_noise = 0.0
        else:
            cumulative_noise = jnp.cumsum(noise_block, axis=0)
        block_new = anchor[None] + cumulative_delta + cumulative_noise

        return block_new

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        parallel: int = 10,
        tolerance: float = 0.1,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
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
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (batch_size, unet.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        is_ode = bool(getattr(scheduler, "_is_ode_scheduler", False))
        timesteps = np.asarray(state.timesteps)
        T = len(timesteps)
        parallel = min(parallel, T)

        # pre-sample per-step noise (stochastic schedulers) + error normalizer
        variances = np.asarray(
            jax.vmap(lambda t: scheduler.get_variance(state, t))(state.timesteps))
        key, noise_key = jax.random.split(key)
        base_noise = randn_tensor((T,) + latents.shape, key=noise_key)
        noise_array = jnp.asarray(variances ** 0.5)[:, None, None, None, None] * base_noise
        latent_dim = int(np.prod(latents.shape[1:]))
        with np.errstate(divide="ignore"):  # final entry is 1/0 = inf, as in the reference
            inverse_variance_norm = 1.0 / (np.append(variances, 0.0) * latent_dim)
        scaled_tolerance = tolerance ** 2

        buffer = jnp.stack([latents] * (T + 1))
        begin_idx, end_idx = 0, parallel
        while begin_idx < T:
            plen = end_idx - begin_idx
            window_fn = self._jit(
                f"paradigms_window{plen}",
                partial(self._window_eval, guidance_scale=guidance_scale, do_cfg=do_cfg,
                        is_ode=is_ode),
                static=(guidance_scale, do_cfg, is_ode, plen),
            )
            block_new = window_fn(
                unet_params, buffer[begin_idx:end_idx], buffer[begin_idx],
                state.timesteps[begin_idx:end_idx], noise_array[begin_idx:end_idx],
                prompt_embeds, state)
            # fixed-point error per window entry (vs the previous buffer)
            err = np.asarray(jnp.sum(
                (block_new - buffer[begin_idx + 1: end_idx + 1]) ** 2,
                axis=tuple(range(2, block_new.ndim))))  # [P, B]
            ratio = err * inverse_variance_norm[begin_idx + 1: end_idx + 1, None]
            ratio = np.concatenate([ratio, np.full((1, ratio.shape[1]), 1e9)], axis=0)
            any_err = (ratio > scaled_tolerance).max(axis=1)
            ind = int(np.argmax(any_err))

            buffer = buffer.at[begin_idx + 1: end_idx + 1].set(block_new)
            begin_idx = begin_idx + min(1 + ind, parallel)
            end_idx = min(begin_idx + parallel, T)

        latents = buffer[-1]

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)
        if not return_dict:
            return (image,)
        return StableDiffusionPipelineOutput(images=image)

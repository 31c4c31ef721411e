"""CycleDiffusion: unpaired image-to-image translation via DPM-encoder
noise transfer.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_variants/pipeline_cycle_diffusion.py:139`,
arXiv:2210.05559): per step, a SOURCE stream (conditioned on the source
prompt) reproduces the stochastic DDIM trajectory of the original image by
posterior-sampling from the clean source latents (`posterior_sample`, `:78`);
the exact Gaussian increment is recovered (`compute_noise`, `:105`) and
re-injected as the variance noise of the TARGET stream's DDIM step — the
target inherits the source's randomness, changing only what the new prompt
demands.

TPU-native: both streams and their CFG halves run as ONE 4B-batch UNet
forward inside a lax.scan; per-step posterior noise is pre-sampled and rides
the scan xs; the terminal `prev_timestep <= 0` branch is a jnp.where.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ....utils.jax_utils import randn_tensor
from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipelineOutput
from ...stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline


class CycleDiffusionPipeline(StableDiffusionImg2ImgPipeline):
    def _denoise_cycle(self, unet_params, prompt_embeds, source_prompt_embeds, latents,
                       clean_latents, posterior_noise, timesteps, state,
                       guidance_scale, source_guidance_scale, eta, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        T_train = scheduler.config.num_train_timesteps
        step_ratio = T_train // state.num_inference_steps

        def _alphas(t):
            prev_t = t - step_ratio
            a_t = state.alphas_cumprod[t]
            a_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)],
                               state.final_alpha_cumprod)
            variance = ((1 - a_prev) / (1 - a_t)) * (1 - a_t / a_prev)
            return prev_t, a_t, a_prev, variance

        def step_fn(carry, xs):
            latents, source_latents, sstate = carry
            t, post_noise = xs
            if do_cfg:
                blocks = [source_latents, latents, source_latents, latents]
                src_neg, src_pos = jnp.split(source_prompt_embeds, 2, axis=0)
                tgt_neg, tgt_pos = jnp.split(prompt_embeds, 2, axis=0)
                embeds = jnp.concatenate([src_neg, tgt_neg, src_pos, tgt_pos], axis=0)
            else:
                blocks = [source_latents, latents]
                embeds = jnp.concatenate([source_prompt_embeds, prompt_embeds], axis=0)
            latent_input = scheduler.scale_model_input(sstate, jnp.concatenate(blocks, axis=0), t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = unet(unet_params, latent_input, t_b, encoder_hidden_states=embeds).sample
            if do_cfg:
                src_u, tgt_u, src_c, tgt_c = jnp.split(noise_pred, 4, axis=0)
                tgt_pred = tgt_u + guidance_scale * (tgt_c - tgt_u)
                src_pred = src_u + source_guidance_scale * (src_c - src_u)
            else:
                src_pred, tgt_pred = jnp.split(noise_pred, 2, axis=0)

            prev_t, a_t, a_prev, variance = _alphas(jnp.asarray(t, jnp.int32))
            std_dev = eta * variance ** 0.5

            # posterior sample of the source trajectory (reference `:78`)
            e_t = (source_latents - a_t**0.5 * clean_latents) / (1 - a_t) ** 0.5
            dir_xt = (1.0 - a_prev - std_dev**2) ** 0.5 * e_t
            prev_source = a_prev**0.5 * clean_latents + dir_xt + std_dev * post_noise
            prev_source = jnp.where(prev_t <= 0, clean_latents, prev_source)

            # recover the exact Gaussian increment (reference `:105`)
            x0_src = (source_latents - (1 - a_t) ** 0.5 * src_pred) / a_t**0.5
            if self.scheduler.config.clip_sample:
                x0_src = jnp.clip(x0_src, -1, 1)
            dir_src = (1 - a_prev - std_dev**2) ** 0.5 * src_pred
            noise = (prev_source - (a_prev**0.5 * x0_src + dir_src)) / (variance**0.5 * eta)

            out = scheduler.step(sstate, tgt_pred, t, latents, eta=eta, variance_noise=noise)
            return (out.prev_sample, prev_source, out.state), None

        (latents, _, _), _ = jax.lax.scan(
            step_fn, (latents, latents, state), (timesteps, posterior_noise))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        source_prompt: Union[str, List[str]] = None,
        image=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        source_guidance_scale: float = 1.0,
        eta: float = 0.1,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if eta <= 0:
            raise ValueError("CycleDiffusion requires eta > 0 (stochastic DDIM).")
        if getattr(self.scheduler.config, "set_alpha_to_one", True):
            # with set_alpha_to_one the terminal variance is exactly 0 and the
            # noise recovery divides by it; SD checkpoints ship
            # set_alpha_to_one=False, steps_offset=1 (reference scheduler req)
            raise ValueError(
                "CycleDiffusion needs a DDIMScheduler with set_alpha_to_one=False "
                "(and typically steps_offset=1), as configured for Stable Diffusion.")

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, None, do_cfg)
        source_prompt_embeds = self.encode_prompt(source_prompt, None, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        init = jnp.asarray(self.image_processor.preprocess(image))
        key, enc_key, noise_key, post_key = jax.random.split(key, 4)
        clean_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if clean_latents.shape[0] < batch_size:
            clean_latents = jnp.repeat(clean_latents, batch_size // clean_latents.shape[0], axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, strength)

        noise = randn_tensor(clean_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, clean_latents, noise, timesteps[:1])
        posterior_noise = randn_tensor((len(timesteps),) + clean_latents.shape, key=post_key)

        denoise = self._jit(
            "denoise_cycle",
            partial(self._denoise_cycle, guidance_scale=guidance_scale,
                    source_guidance_scale=source_guidance_scale, eta=float(eta), do_cfg=do_cfg),
            static=(guidance_scale, source_guidance_scale, float(eta), do_cfg),
        )
        latents = denoise(unet_params, prompt_embeds, source_prompt_embeds, latents,
                          clean_latents, posterior_noise, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)
        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)

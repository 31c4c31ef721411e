"""DiffEdit: mask-guided semantic image editing.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_diffedit/pipeline_stable_diffusion_diffedit.py`,
arXiv:2210.11427) in three stages:

  * ``generate_mask`` (`:845`): noise the source image to
    ``mask_encode_strength`` and run ONE UNet forward under the source and
    target prompts simultaneously; the per-pixel mean |eps_target - eps_source|
    over ``num_maps_per_mask`` noise draws, clamped at
    ``mask_thresholding_ratio * mean`` and thresholded at 0.5, is the binary
    edit mask (`:1022-1050`).
  * ``invert`` (`:1064`): DDIM inversion under the source prompt, recording
    the latent at EVERY timestep (stacked time-reversed, `:1281`), with the
    optional Pix2PixZero auto-correlation/KL noise regularization (`:1237`)
    re-derived through ``jax.grad``.
  * ``__call__`` (`:1302`): inpaint from the inverted latent trail — after
    each scheduler step the unmasked region is snapped back to the inverted
    latent of the matching timestep (`:1516`).

TPU-native: all four prompt branches of the mask forward ride one batched
UNet call; the inversion and inpaint loops are single jitted ``lax.scan``s
(the inverted-latent trail rides the scan ``xs``); the noise-regularizer's
autograd loop becomes ``jax.grad`` of a pure loss with pre-sampled roll
amounts so the whole inversion stays inside one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....image_processor import VaeImageProcessor
from ....utils import BaseOutput
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline
from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipelineOutput
from ...stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline


@dataclass
class DiffEditInversionPipelineOutput(BaseOutput):
    """Inverted latents for every timestep, shape [B, T, C, h, w] (reference `:59`)."""

    latents: jax.Array
    images: Optional[Union[List, np.ndarray]] = None


def auto_corr_loss(eps: jax.Array, rolls: jax.Array) -> jax.Array:
    """Sum of squared mean spatial auto-correlations over a 2x avg-pool pyramid.

    Reference `:147`: per (sample, channel) map, at each pyramid level roll by a
    random amount along H and W and accumulate ``mean(x * roll(x))**2``; pool by
    2 until the map is <= 8 px. ``rolls`` carries pre-sampled uniforms in
    [0, 1), one per pyramid level, converted to integer shifts here (the torch
    version draws them from a Generator inside the loop).
    """
    reg_loss = 0.0
    b, c = eps.shape[0], eps.shape[1]
    for i in range(b):
        for j in range(c):
            noise = eps[i : i + 1, j : j + 1]
            level = 0
            while True:
                shift = (rolls[level] * (noise.shape[2] // 2)).astype(jnp.int32)
                # gather-based roll: jnp.roll with a traced shift has no JVP rule
                idx_h = (jnp.arange(noise.shape[2]) - shift) % noise.shape[2]
                idx_w = (jnp.arange(noise.shape[3]) - shift) % noise.shape[3]
                reg_loss += jnp.mean(noise * jnp.take(noise, idx_h, axis=2)) ** 2
                reg_loss += jnp.mean(noise * jnp.take(noise, idx_w, axis=3)) ** 2
                if noise.shape[2] <= 8:
                    break
                # reshape-based 2x avg-pool: differentiable, fuses under XLA
                h2, w2 = noise.shape[2] // 2, noise.shape[3] // 2
                noise = noise.reshape(1, 1, h2, 2, w2, 2).mean(axis=(3, 5))
                level += 1
    return reg_loss


def kl_divergence(eps: jax.Array) -> jax.Array:
    """KL(N(mean, var) || N(0, 1)) surrogate (reference `:163`)."""
    var = jnp.var(eps)
    return var + jnp.mean(eps) ** 2 - 1 - jnp.log(var + 1e-7)


def _n_pyramid_levels(size: int) -> int:
    n = 1
    while size > 8:
        size //= 2
        n += 1
    return n


def preprocess_mask(mask, batch_size: int = 1) -> np.ndarray:
    """Normalize a latent-resolution mask to [B, 1, h, w] binary (reference `:191`)."""
    if hasattr(mask, "convert"):  # PIL
        mask = np.array(mask.convert("L")).astype(np.float32) / 255.0
    mask = np.asarray(mask, dtype=np.float32)
    if mask.ndim == 2:
        mask = mask[None, None]
    if mask.ndim == 3:
        # single batched mask without channel dim, or channel-first single mask
        mask = mask[:, None] if mask.shape[0] != 1 else mask[None]
    if batch_size > 1:
        if mask.shape[0] == 1:
            mask = np.concatenate([mask] * batch_size)
        elif mask.shape[0] != batch_size:
            raise ValueError(
                f"`mask_image` batch {mask.shape[0]} cannot broadcast to prompt batch {batch_size}"
            )
    if mask.shape[1] != 1:
        raise ValueError(f"`mask_image` must have 1 channel, got {mask.shape[1]}")
    if mask.min() < 0 or mask.max() > 1:
        raise ValueError("`mask_image` should be in [0, 1] range")
    return (mask >= 0.5).astype(np.float32)


class StableDiffusionDiffEditPipeline(StableDiffusionImg2ImgPipeline):
    _optional_components = ["safety_checker", "feature_extractor", "image_encoder"]

    def __init__(
        self,
        vae,
        text_encoder,
        tokenizer,
        unet,
        scheduler,
        inverse_scheduler,
        safety_checker=None,
        feature_extractor=None,
        image_encoder=None,
        requires_safety_checker: bool = False,
    ):
        DiffusionPipeline.__init__(self)
        self.register_modules(
            vae=vae,
            text_encoder=text_encoder,
            tokenizer=tokenizer,
            unet=unet,
            scheduler=scheduler,
            inverse_scheduler=inverse_scheduler,
            safety_checker=safety_checker,
            feature_extractor=feature_extractor,
            image_encoder=image_encoder,
        )
        self.register_to_config(requires_safety_checker=requires_safety_checker)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    # ------------------------------------------------------------ helpers
    def get_inverse_timesteps(self, istate, num_inference_steps: int, strength: float):
        """Ascending inversion schedule truncated to `strength` (reference `:741`)."""
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        if t_start == 0:
            return istate.timesteps, num_inference_steps
        return istate.timesteps[:-t_start], num_inference_steps - t_start

    def _encode_image_latents(self, vae, vae_params, image, batch_size, enc_key):
        init = jnp.asarray(self.image_processor.preprocess(image))
        latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if latents.shape[0] < batch_size:
            if batch_size % latents.shape[0] != 0:
                raise ValueError(
                    f"Cannot duplicate image batch {latents.shape[0]} to {batch_size} prompts."
                )
            latents = jnp.repeat(latents, batch_size // latents.shape[0], axis=0)
        return latents

    def _get_epsilon(self, model_output, sample, alpha_prod_t):
        """Model output → epsilon under the inverse scheduler's prediction type (reference `:826`)."""
        pred_type = self.inverse_scheduler.config.prediction_type
        beta_prod_t = 1 - alpha_prod_t
        if pred_type == "epsilon":
            return model_output
        if pred_type == "sample":
            return (sample - alpha_prod_t**0.5 * model_output) / beta_prod_t**0.5
        if pred_type == "v_prediction":
            return alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        raise ValueError(f"unsupported prediction_type {pred_type}")

    # ------------------------------------------------------------ stage 1
    def generate_mask(
        self,
        image=None,
        target_prompt: Union[str, List[str]] = None,
        target_negative_prompt: Optional[Union[str, List[str]]] = None,
        source_prompt: Union[str, List[str]] = None,
        source_negative_prompt: Optional[Union[str, List[str]]] = None,
        num_maps_per_mask: int = 10,
        mask_encode_strength: float = 0.5,
        mask_thresholding_ratio: float = 3.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        key: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        if num_maps_per_mask is None or not isinstance(num_maps_per_mask, int) or num_maps_per_mask <= 0:
            raise ValueError(f"`num_maps_per_mask` must be a positive integer, got {num_maps_per_mask}")
        if mask_thresholding_ratio is None or mask_thresholding_ratio <= 0:
            raise ValueError(f"`mask_thresholding_ratio` must be positive, got {mask_thresholding_ratio}")
        if key is None:
            key = jax.random.PRNGKey(0)
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        M = num_maps_per_mask
        do_cfg = guidance_scale > 1.0

        def _encode_repeated(prompt, negative):
            embeds = self.encode_prompt(prompt, negative, do_cfg)
            if do_cfg:
                neg, pos = jnp.split(embeds, 2, axis=0)
                return jnp.concatenate(
                    [jnp.repeat(neg, M, axis=0), jnp.repeat(pos, M, axis=0)], axis=0
                )
            return jnp.repeat(embeds, M, axis=0)

        target_embeds = _encode_repeated(target_prompt, target_negative_prompt)
        source_embeds = _encode_repeated(source_prompt, source_negative_prompt)
        batch_size = target_embeds.shape[0] // (2 if do_cfg else 1) // M

        state = self.scheduler.set_timesteps(num_inference_steps)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, mask_encode_strength)
        encode_timestep = timesteps[0]

        key, enc_key, noise_key = jax.random.split(key, 3)
        image_rep = np.repeat(np.asarray(self.image_processor.preprocess(image)), M, axis=0)
        image_latents = vae.encode(vae_params, jnp.asarray(image_rep)).sample(enc_key)
        image_latents = image_latents * vae.config.scaling_factor
        if image_latents.shape[0] < batch_size * M:
            image_latents = jnp.repeat(image_latents, batch_size * M // image_latents.shape[0], axis=0)
        noise = randn_tensor(image_latents.shape, key=noise_key)
        image_latents = self.scheduler.add_noise(
            state, image_latents, noise, jnp.broadcast_to(encode_timestep, (1,))
        )

        def _mask_forward(unet_params, latents, src_embeds, tgt_embeds, t, sstate):
            n_rep = 4 if do_cfg else 2
            latent_input = jnp.concatenate([latents] * n_rep, axis=0)
            latent_input = self.scheduler.scale_model_input(sstate, latent_input, t)
            embeds = jnp.concatenate([src_embeds, tgt_embeds], axis=0)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=embeds,
            ).sample
            if do_cfg:
                neg_src, src, uncond, tgt = jnp.split(noise_pred, 4, axis=0)
                src = neg_src + guidance_scale * (src - neg_src)
                tgt = uncond + guidance_scale * (tgt - uncond)
            else:
                src, tgt = jnp.split(noise_pred, 2, axis=0)
            # mean over noise maps and channels (reference `:1043-1047`)
            diff = jnp.abs(tgt - src).reshape(batch_size, M, *tgt.shape[-3:]).mean(axis=(1, 2))
            clamp = diff.mean() * mask_thresholding_ratio
            semantic = jnp.clip(diff, 0, clamp) / clamp
            return (semantic > 0.5).astype(jnp.float32)

        fwd = self._jit("diffedit_mask", _mask_forward,
                        static=(do_cfg, guidance_scale, batch_size, M, mask_thresholding_ratio))
        mask_image = np.asarray(fwd(unet_params, image_latents, source_embeds, target_embeds,
                                    encode_timestep, state))
        if output_type == "pil":
            mask_image = self.image_processor.numpy_to_pil(mask_image)
        return mask_image

    # ------------------------------------------------------------ stage 2
    def invert(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        num_inference_steps: int = 50,
        inpaint_strength: float = 0.8,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        decode_latents: bool = False,
        output_type: str = "pil",
        return_dict: bool = True,
        lambda_auto_corr: float = 20.0,
        lambda_kl: float = 20.0,
        num_reg_steps: int = 0,
        num_auto_corr_rolls: int = 5,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        do_cfg = guidance_scale > 1.0

        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        key, enc_key, roll_key = jax.random.split(key, 3)
        latents = self._encode_image_latents(vae, vae_params, image, batch_size, enc_key)

        istate = self.inverse_scheduler.set_timesteps(num_inference_steps)
        timesteps, _ = self.get_inverse_timesteps(istate, num_inference_steps, inpaint_strength)
        n_steps = int(timesteps.shape[0])

        n_levels = _n_pyramid_levels(latents.shape[2])
        rolls = jax.random.uniform(
            roll_key, (n_steps, num_reg_steps, num_auto_corr_rolls, n_levels)
        ) if num_reg_steps > 0 else jnp.zeros((n_steps, 1, 1, n_levels))

        def _invert_scan(unet_params, prompt_embeds, latents, timesteps, rolls, istate):
            def step_fn(carry, xs):
                lat, sstate = carry
                t, roll_t = xs
                latent_input = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
                latent_input = self.inverse_scheduler.scale_model_input(sstate, latent_input, t)
                noise_pred = unet(
                    unet_params,
                    latent_input,
                    jnp.broadcast_to(t, (latent_input.shape[0],)),
                    encoder_hidden_states=prompt_embeds,
                ).sample
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)

                if num_reg_steps > 0:
                    # Pix2PixZero regularization toward IID-normal noise
                    # (reference `:1237-1265`): torch's Variable/backward loop is
                    # jax.grad of the pure losses; roll amounts are pre-sampled.
                    alpha_prod_t = sstate.alphas_cumprod[jnp.clip(t, 0)]
                    for r in range(num_reg_steps):
                        if lambda_auto_corr > 0:
                            for ri in range(num_auto_corr_rolls):
                                def l_ac(var):
                                    eps = self._get_epsilon(var, lat, alpha_prod_t)
                                    return auto_corr_loss(eps, roll_t[r, ri])
                                grad = jax.grad(l_ac)(noise_pred) / num_auto_corr_rolls
                                noise_pred = noise_pred - lambda_auto_corr * grad
                        if lambda_kl > 0:
                            def l_kl(var):
                                return kl_divergence(self._get_epsilon(var, lat, alpha_prod_t))
                            noise_pred = noise_pred - lambda_kl * jax.grad(l_kl)(noise_pred)

                out = self.inverse_scheduler.step(sstate, noise_pred, t, lat)
                return (out.prev_sample, sstate), out.prev_sample

            (_, _), trail = jax.lax.scan(step_fn, (latents, istate), (timesteps, rolls))
            # stack time-reversed on axis 1 (reference `:1281`)
            return jnp.flip(trail, axis=0).swapaxes(0, 1)

        run = self._jit(
            "diffedit_invert", _invert_scan,
            static=(do_cfg, guidance_scale, num_reg_steps, num_auto_corr_rolls,
                    lambda_auto_corr, lambda_kl),
        )
        inverted = run(unet_params, prompt_embeds, latents, timesteps, rolls, istate)

        image_out = None
        if decode_latents:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            flat = inverted.reshape((-1,) + inverted.shape[2:])
            image_out = self.image_processor.postprocess(decode(vae_params, flat), output_type=output_type)
        if not return_dict:
            return (inverted, image_out)
        return DiffEditInversionPipelineOutput(latents=inverted, images=image_out)

    # ------------------------------------------------------------ stage 3
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        mask_image=None,
        image_latents=None,
        inpaint_strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        if mask_image is None:
            raise ValueError("`mask_image` is required — compute it with `generate_mask()`.")
        if image_latents is None:
            raise ValueError("`image_latents` is required — compute it with `invert()`.")
        if key is None:
            key = jax.random.PRNGKey(0)
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        do_cfg = guidance_scale > 1.0

        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        mask = jnp.asarray(preprocess_mask(mask_image, batch_size))
        latent_h, latent_w = mask.shape[-2:]

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, jnp.zeros(1))
        timesteps, _ = self.get_timesteps(state, num_inference_steps, inpaint_strength)
        n_steps = int(timesteps.shape[0])

        image_latents = jnp.asarray(image_latents)
        latent_shape = (vae.config.latent_channels, latent_h, latent_w)
        if image_latents.shape[-3:] != latent_shape:
            raise ValueError(
                f"Each latent must have shape {latent_shape}, got {image_latents.shape[-3:]}"
            )
        if image_latents.ndim == 4:
            image_latents = image_latents.reshape(batch_size, n_steps, *latent_shape)
        if image_latents.shape[:2] != (batch_size, n_steps):
            raise ValueError(
                f"`image_latents` must be [batch={batch_size}, steps={n_steps}, ...], "
                f"got {image_latents.shape[:2]}"
            )
        trail = image_latents.swapaxes(0, 1)  # [T, B, C, h, w]

        def _denoise_masked(unet_params, prompt_embeds, trail, mask, timesteps, state):
            def step_fn(carry, xs):
                lat, sstate = carry
                t, inv_lat = xs
                latent_input = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
                latent_input = self.scheduler.scale_model_input(sstate, latent_input, t)
                noise_pred = unet(
                    unet_params,
                    latent_input,
                    jnp.broadcast_to(t, (latent_input.shape[0],)),
                    encoder_hidden_states=prompt_embeds,
                ).sample
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                out = self.scheduler.step(sstate, noise_pred, t, lat)
                # snap unmasked region to the inverted latent of this step (reference `:1516`)
                lat = out.prev_sample * mask + inv_lat * (1 - mask)
                return (lat, out.state), None

            (lat, _), _ = jax.lax.scan(step_fn, (trail[0], state), (timesteps, trail))
            return lat

        denoise = self._jit("diffedit_denoise", _denoise_masked,
                            static=(do_cfg, guidance_scale))
        latents = denoise(unet_params, prompt_embeds, trail, mask, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)
        if not return_dict:
            return (image_out, None)
        return StableDiffusionPipelineOutput(images=image_out)

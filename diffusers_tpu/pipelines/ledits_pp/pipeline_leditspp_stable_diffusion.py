"""LEDITS++ semantic image editing (Stable Diffusion).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ledits_pp/pipeline_leditspp_stable_diffusion.py:269`
LEditsPPPipelineStableDiffusion): edit-friendly DDPM inversion (`:1225`,
per-step fresh-noise anchors `x_t = add_noise(x0, n_t, t)` with the
correction recursion of `compute_noise_ddim` `:1404`), then semantic
guidance (`:722`): per-concept noise deltas vs the unconditional estimate,
direction flips, per-concept warmup/cooldown windows, and quantile
(`edit_threshold`) masks over the summed |delta| noise estimate (the paper's
M^2 mask), optionally intersected with a user mask. The DDIM step consumes
the inversion's stored variance noise (`zs`).

TPU-first: both inversion and editing are ONE jitted `lax.scan` each — the
inversion correction recursion rides the scan carry, per-concept
warmup/cooldown are `where` weights on the step index. The cross-attention
(M^1) masks require the reference's UNet attention-store hooks and are not
implemented — `use_cross_attn_mask`/`use_intersect_mask` raise.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...guiders.guider_utils import rescale_noise_cfg
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class LEditsPPDiffusionPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]
    nsfw_content_detected: Optional[List[bool]] = None


@dataclass
class LEditsPPInversionPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]
    vae_reconstruction_images: Union[List, np.ndarray]


class LEditsPPPipelineStableDiffusion(DiffusionPipeline):
    _optional_components = ["safety_checker", "feature_extractor"]

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 safety_checker=None, feature_extractor=None, requires_safety_checker: bool = False):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, safety_checker=safety_checker, feature_extractor=feature_extractor,
        )
        self.register_to_config(requires_safety_checker=requires_safety_checker)
        self.vae_scale_factor = 2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.inversion_steps = None

    # -- prompt encoding -----------------------------------------------------
    def _encode_clip(self, prompts: List[str]):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(prompts, padding="max_length",
                                max_length=getattr(self.tokenizer, "model_max_length", 77),
                                truncation=True, return_tensors="np")
        out = text_encoder(te_params, jnp.asarray(inputs.input_ids))
        return out.last_hidden_state

    # -- inversion ------------------------------------------------------------
    def _compute_noise_ddim(self, state, prev_latents, latents, t, noise_pred, eta: float):
        """reference `compute_noise_ddim` (`:1404`) in scan-friendly form."""
        scheduler = self.scheduler
        prev_t = t - scheduler.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)],
                                      state.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev

        pred_x0 = (latents - beta_prod_t**0.5 * noise_pred) / alpha_prod_t**0.5
        if scheduler.config.get("clip_sample", False):
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

        variance = (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)
        std_dev_t = eta * variance**0.5
        pred_dir = (1 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * noise_pred
        mu_xt = alpha_prod_t_prev**0.5 * pred_x0 + pred_dir
        noise = jnp.where(variance > 0.0, (prev_latents - mu_xt) / (variance**0.5 * eta), 0.0)
        return noise, mu_xt + (eta * variance**0.5) * noise

    def _invert_scan(self, unet_params, xt_top, xts_pre, timesteps, state,
                     uncond, cond, source_guidance_scale, do_cfg, eta):
        unet = self.unet[0]

        def step_fn(carry, inp):
            xt = carry
            t, xtm1 = inp
            tt = jnp.broadcast_to(t, (xt.shape[0],))
            noise_pred = unet(unet_params, xt, tt, encoder_hidden_states=uncond).sample
            if do_cfg:
                noise_cond = unet(unet_params, xt, tt, encoder_hidden_states=cond).sample
                noise_pred = noise_pred + source_guidance_scale * (noise_cond - noise_pred)
            z, xtm1_corr = self._compute_noise_ddim(state, xtm1, xt, t, noise_pred, eta)
            return xtm1_corr, z

        # xts_pre[i] = the anchor x_{t-1} for step i (iteration order)
        _, zs = jax.lax.scan(step_fn, xt_top, (timesteps, xts_pre))
        return zs

    def invert(
        self,
        image,
        source_prompt: str = "",
        source_guidance_scale: float = 3.5,
        num_inversion_steps: int = 30,
        skip: float = 0.15,
        key: Optional[jax.Array] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ):
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        self.eta = 1.0

        self.scheduler.register_to_config(timestep_spacing="leading")
        state = self.scheduler.set_timesteps(int(num_inversion_steps * (1 + skip)))
        timesteps = state.timesteps[-num_inversion_steps:]
        self.inversion_steps = timesteps
        self._inv_state = state

        pixel = jnp.asarray(self.image_processor.preprocess(image, height, width))
        x0 = vae.encode(vae_params, pixel).mode() * vae.config.scaling_factor
        self.batch_size = x0.shape[0]
        image_rec = vae.decode(vae_params, x0 / vae.config.scaling_factor).sample
        image_rec = self.image_processor.postprocess(image_rec, output_type="pil")

        do_cfg = source_guidance_scale > 1.0 and source_prompt != ""
        uncond = self._encode_clip([""] * self.batch_size)
        cond = self._encode_clip([source_prompt] * self.batch_size) if do_cfg else uncond

        # fresh-noise anchors: x_t = add_noise(x0, n_t, t) per timestep (`:1336-1340`)
        n = num_inversion_steps
        keys = jax.random.split(key, n)
        noises = jnp.stack([randn_tensor(x0.shape, key=keys[i]) for i in range(n)])
        # anchors in ITERATION order (descending t): anchor[i] is x at timesteps[i]
        anchors = jax.vmap(lambda nz, t: self.scheduler.add_noise(state, x0, nz, t))(
            noises, timesteps)
        xt_top = anchors[0]
        # x_{t-1} target for step i is the anchor at the NEXT (smaller) timestep;
        # the last step's target is x0 itself (the reference's cat([x0, xts]))
        xtm1_targets = jnp.concatenate([anchors[1:], x0[None]], axis=0)

        invert = self._jit(
            "invert",
            partial(self._invert_scan, source_guidance_scale=source_guidance_scale,
                    do_cfg=do_cfg, eta=self.eta),
            static=(source_guidance_scale, do_cfg),
        )
        zs = invert(self.unet[1], xt_top, xtm1_targets, timesteps, state, uncond, cond)
        self.zs = zs  # iteration order == the reference's zs.flip(0)
        self.init_latents = xt_top

        resized = self.image_processor.postprocess(pixel, output_type="pil")
        return LEditsPPInversionPipelineOutput(images=resized, vae_reconstruction_images=image_rec)

    # -- editing ----------------------------------------------------------------
    def _edit_scan(self, unet_params, latents, zs, embeds, user_mask, timesteps, state,
                   scales, thresholds, reverses, warmups, cooldowns, num_concepts,
                   guidance_rescale, eta):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, inp):
            latents, step = carry
            t, z = inp
            latent_in = jnp.concatenate([latents] * (1 + num_concepts), axis=0)
            noise_pred = unet(unet_params, latent_in, jnp.broadcast_to(t, (latent_in.shape[0],)),
                              encoder_hidden_states=embeds).sample
            chunks = jnp.split(noise_pred, 1 + num_concepts, axis=0)
            uncond = chunks[0]

            guidance = jnp.zeros_like(uncond)
            for c in range(num_concepts):
                diff = chunks[1 + c] - uncond
                diff = jnp.where(reverses[c], -diff, diff) * scales[c]
                if user_mask is not None:
                    diff = diff * user_mask
                # M^2: quantile mask over channel-summed |delta| (reference `:1121-1160`)
                sumabs = jnp.abs(diff).sum(axis=1)  # [B, H, W]
                q = jnp.quantile(sumabs.reshape(sumabs.shape[0], -1), thresholds[c], axis=1)
                mask = (sumabs >= q[:, None, None])[:, None]
                diff = jnp.where(mask, diff, 0.0)
                active = (step >= warmups[c]) & (step < cooldowns[c])
                guidance = guidance + jnp.where(active, diff, 0.0)

            pred = uncond + guidance
            if num_concepts > 0 and guidance_rescale > 0.0:
                mean_edit = sum(chunks[1:]) / num_concepts
                pred = rescale_noise_cfg(pred, mean_edit, guidance_rescale)
            out = scheduler.step(state, pred, t, latents, eta=eta, variance_noise=z)
            return (out.prev_sample, step + 1), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, jnp.asarray(0)), (timesteps, zs))
        return latents

    def __call__(
        self,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        editing_prompt: Optional[Union[str, List[str]]] = None,
        reverse_editing_direction: Union[bool, List[bool]] = False,
        edit_guidance_scale: Union[float, List[float]] = 5.0,
        edit_warmup_steps: Union[int, List[int]] = 0,
        edit_cooldown_steps: Optional[Union[int, List[int]]] = None,
        edit_threshold: Union[float, List[float]] = 0.9,
        user_mask: Optional[jax.Array] = None,
        use_cross_attn_mask: bool = False,
        use_intersect_mask: bool = False,
        guidance_rescale: float = 0.0,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        if self.inversion_steps is None:
            raise ValueError("You need to invert an input image first — call `invert` beforehand.")
        if use_cross_attn_mask or use_intersect_mask:
            raise NotImplementedError(
                "cross-attention (M^1) masks need the reference's UNet attention-store hooks "
                "(attention_dispatch side channel) — only the noise-estimate (M^2) mask is implemented"
            )

        timesteps = self.inversion_steps
        state = self._inv_state
        latents = self.init_latents
        zs = self.zs

        if editing_prompt is None:
            editing_prompt = []
        if isinstance(editing_prompt, str):
            editing_prompt = [editing_prompt]
        num_concepts = len(editing_prompt)

        def _per_concept(v, default=None):
            if v is None:
                v = default
            if not isinstance(v, (list, tuple)):
                v = [v] * num_concepts
            return tuple(v)

        scales = _per_concept(edit_guidance_scale)
        thresholds = _per_concept(edit_threshold)
        reverses = tuple(bool(b) for b in _per_concept(reverse_editing_direction))
        warmups = _per_concept(edit_warmup_steps)
        cooldowns = tuple(
            len(timesteps) if c is None else c for c in _per_concept(edit_cooldown_steps, default=None)
        )

        negative_prompt = negative_prompt if negative_prompt is not None else ""
        uncond = self._encode_clip([negative_prompt] * self.batch_size)
        if num_concepts:
            edit_embeds = [self._encode_clip([p] * self.batch_size) for p in editing_prompt]
            embeds = jnp.concatenate([uncond] + edit_embeds, axis=0)
        else:
            embeds = uncond

        edit = self._jit(
            "edit",
            partial(self._edit_scan, scales=scales, thresholds=thresholds, reverses=reverses,
                    warmups=warmups, cooldowns=cooldowns, num_concepts=num_concepts,
                    guidance_rescale=guidance_rescale, eta=self.eta),
            static=(scales, thresholds, reverses, warmups, cooldowns, num_concepts,
                    guidance_rescale, user_mask is None),
        )
        latents = edit(self.unet[1], latents, zs, embeds, user_mask, timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            vae, vae_params = self.vae
            image = vae.decode(vae_params, latents / vae.config.scaling_factor).sample
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image, None)
        return LEditsPPDiffusionPipelineOutput(images=image, nsfw_content_detected=None)

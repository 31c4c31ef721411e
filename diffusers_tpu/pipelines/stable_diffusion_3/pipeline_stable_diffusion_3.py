"""Stable Diffusion 3 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion_3/pipeline_stable_diffusion_3.py`):
triple text encoding (CLIP-L + CLIP-G penultimate states + T5), pooled embeds
from both CLIPs, flow-matching denoise with CFG batch-2 in one scanned jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class StableDiffusion3PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class StableDiffusion3Pipeline(DiffusionPipeline):
    _optional_components = ["text_encoder_3", "tokenizer_3"]

    def __init__(
        self,
        transformer,
        scheduler,
        vae,
        text_encoder,
        tokenizer,
        text_encoder_2,
        tokenizer_2,
        text_encoder_3=None,
        tokenizer_3=None,
    ):
        super().__init__()
        self.register_modules(
            vae=vae,
            text_encoder=text_encoder,
            text_encoder_2=text_encoder_2,
            text_encoder_3=text_encoder_3,
            tokenizer=tokenizer,
            tokenizer_2=tokenizer_2,
            tokenizer_3=tokenizer_3,
            transformer=transformer,
            scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = self.transformer[0].config.sample_size

    def _clip_embeds(self, encoder_pack, tokenizer, prompt: List[str]):
        enc, enc_params = encoder_pack
        inputs = tokenizer(prompt, padding="max_length", max_length=77, truncation=True, return_tensors="np")
        out = enc(enc_params, jnp.asarray(inputs.input_ids), output_hidden_states=True)
        pooled = out.text_embeds if out.text_embeds is not None else out.pooler_output
        return out.hidden_states[-2], pooled

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]

        def encode(texts):
            e1, p1 = self._clip_embeds(self.text_encoder, self.tokenizer, texts)
            e2, p2 = self._clip_embeds(self.text_encoder_2, self.tokenizer_2, texts)
            clip_embeds = jnp.concatenate([e1, e2], axis=-1)
            pooled = jnp.concatenate([p1, p2], axis=-1)
            joint_dim = self.transformer[0].config.joint_attention_dim
            if self.text_encoder_3 is not None:
                t5, t5_params = self.text_encoder_3
                inputs = self.tokenizer_3(
                    texts, padding="max_length", max_length=max_sequence_length, truncation=True, return_tensors="np"
                )
                t5_embeds = t5(t5_params, jnp.asarray(inputs.input_ids)).last_hidden_state
            else:
                t5_embeds = jnp.zeros((clip_embeds.shape[0], max_sequence_length, joint_dim), dtype=clip_embeds.dtype)
            # pad clip embeds up to the T5 width and concatenate along sequence
            clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, t5_embeds.shape[-1] - clip_embeds.shape[-1])))
            return jnp.concatenate([clip_embeds, t5_embeds], axis=1), pooled

        prompt_embeds, pooled = encode(prompt)
        if not do_cfg:
            return prompt_embeds, None, pooled, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_pooled = encode(negative_prompt)
        return prompt_embeds, neg_embeds, pooled, neg_pooled

    _supported_cache_configs = (
        "TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig", "FirstBlockCacheConfig",
        "FasterCacheConfig", "PyramidAttentionBroadcastConfig",
    )

    def _denoise(self, t_params, latents, prompt_embeds, pooled, timesteps, state, guidance_scale,
                 do_cfg, fc_sched=None, pab_mask=None):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        cache_cfg = getattr(self, "_cache_config", None)
        from ...hooks.faster_cache import FasterCacheConfig, denoise_scan_faster_cache
        from ...hooks.first_block_cache import FirstBlockCacheConfig, init_fbc_single_state
        from ...hooks.generic_cache import denoise_scan
        from ...hooks.pyramid_attention_broadcast import PyramidAttentionBroadcastConfig

        if isinstance(cache_cfg, PyramidAttentionBroadcastConfig) and pab_mask is not None:
            b = latents.shape[0] * (2 if do_cfg else 1)
            p = transformer.config.patch_size
            tokens = (latents.shape[2] // p) * (latents.shape[3] // p)
            pab0 = transformer.init_pab_cache(b, tokens, prompt_embeds.shape[1], latents.dtype)

            def pab_step(carry, xs):
                latents, sstate, cache = carry
                t, compute = xs
                latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
                timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
                out_m, cache = transformer(
                    t_params, latent_input, prompt_embeds, pooled, timestep,
                    pab_compute=compute, pab_cache=cache,
                )
                noise_pred = out_m.sample
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, cache), None

            (latents, _, _), _ = jax.lax.scan(pab_step, (latents, state, pab0), (timesteps, pab_mask))
            return latents

        if isinstance(cache_cfg, FasterCacheConfig) and do_cfg and fc_sched is not None:
            b = latents.shape[0]
            uncond_embeds, cond_embeds = prompt_embeds[:b], prompt_embeds[b:]
            uncond_pooled, cond_pooled = pooled[:b], pooled[b:]

            def fwd_one(lat, t, pe, pl):
                timestep = jnp.broadcast_to(t, (lat.shape[0],))
                return transformer(t_params, lat, pe, pl, timestep).sample

            return denoise_scan_faster_cache(
                lambda lat, t, st: (fwd_one(lat, t, uncond_embeds, uncond_pooled),
                                    fwd_one(lat, t, cond_embeds, cond_pooled)),
                lambda lat, t, st: fwd_one(lat, t, cond_embeds, cond_pooled),
                lambda uncond, cond: uncond + guidance_scale * (cond - uncond),
                scheduler, latents, state, timesteps, fc_sched,
            )

        use_fbc = isinstance(cache_cfg, FirstBlockCacheConfig)
        if use_fbc:
            b = latents.shape[0] * (2 if do_cfg else 1)
            p = transformer.config.patch_size
            tokens = (latents.shape[2] // p) * (latents.shape[3] // p)
            dim = transformer.config.num_attention_heads * transformer.config.attention_head_dim
            fbc0 = init_fbc_single_state((b, tokens, dim))

            def step_fn(carry, t):
                latents, sstate, fbc = carry
                latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
                timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
                out_m, fbc = transformer(
                    t_params, latent_input, prompt_embeds, pooled, timestep,
                    fbc_state=fbc, fbc_config=cache_cfg,
                )
                noise_pred = out_m.sample
                if do_cfg:
                    uncond, text = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (text - uncond)
                out = scheduler.step(sstate, noise_pred, t, latents)
                return (out.prev_sample, out.state, fbc), None

            (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, fbc0), timesteps)
            return latents

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, pooled, timestep
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            return noise_pred

        return denoise_scan(forward, scheduler, latents, state, timesteps, cache_cfg, pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, neg_embeds, pooled, neg_pooled = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            reps = num_images_per_prompt
            prompt_embeds = jnp.repeat(prompt_embeds, reps, axis=0)
            pooled = jnp.repeat(pooled, reps, axis=0)
            if do_cfg:
                neg_embeds = jnp.repeat(neg_embeds, reps, axis=0)
                neg_pooled = jnp.repeat(neg_pooled, reps, axis=0)
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            pooled = jnp.concatenate([neg_pooled, pooled], axis=0)

        shape = (
            batch_size,
            transformer.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = randn_tensor(shape, key=key)

        state = self.scheduler.set_timesteps(num_inference_steps)

        fc_sched = None
        pab_mask = None
        cache_cfg = getattr(self, "_cache_config", None)
        if type(cache_cfg).__name__ == "FasterCacheConfig" and do_cfg:
            from ...hooks.faster_cache import faster_cache_schedules

            fc_sched = faster_cache_schedules(np.asarray(state.timesteps), cache_cfg)
        elif type(cache_cfg).__name__ == "PyramidAttentionBroadcastConfig":
            from ...hooks.pyramid_attention_broadcast import pab_compute_mask

            pab_mask = jnp.asarray(pab_compute_mask(
                np.asarray(state.timesteps), cache_cfg.spatial_attention_block_skip_range,
                cache_cfg.spatial_attention_timestep_skip_range))
        denoise = self._denoise_entry("denoise", partial(self._denoise, guidance_scale=guidance_scale,
                                                         do_cfg=do_cfg, fc_sched=fc_sched,
                                                         pab_mask=pab_mask),
                            callback_on_step_end, static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, prompt_embeds, pooled, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            image = self._jit("decode", decode)(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusion3PipelineOutput(images=image)

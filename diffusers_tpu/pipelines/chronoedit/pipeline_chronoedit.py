"""ChronoEdit image-editing pipeline (temporal-reasoning video editing).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/chronoedit/pipeline_chronoedit.py:128`
ChronoEditPipeline): Wan-I2V conditioning — the input image is VAE-encoded as
frame 0 of a zero-padded clip, concatenated with a first-frame latent mask
(`:376` prepare_latents), CLIP-vision penultimate hidden states as image
context (`:228`), UMT5 text conditioning. Temporal reasoning (`:560`): the
first `num_temporal_reasoning_steps` denoise over the full reasoning clip,
then latents/condition (and the multistep scheduler carry) are sliced to the
[first, last] frame pair and denoising continues on the edit pair — the
transformer's rope places that pair `temporal_skip_len` apart.

TPU-first: the mid-loop shape change becomes TWO jitted scans (full clip,
then edit pair), with the UniPC carry arrays sliced between them.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from ..wan.pipeline_wan import WanPipeline

logger = logging.get_logger(__name__)


@dataclass
class ChronoEditPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class ChronoEditPipeline(DiffusionPipeline):
    _optional_components = ["image_encoder", "image_processor"]
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, tokenizer, text_encoder, image_encoder, image_processor,
                 transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            image_encoder=image_encoder, image_processor=image_processor,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    _get_t5_prompt_embeds = WanPipeline._get_t5_prompt_embeds
    encode_prompt = WanPipeline.encode_prompt

    def encode_image(self, image):
        image_encoder, ie_params = self.image_encoder
        inputs = self.image_processor(images=image, return_tensors="np")
        out = image_encoder(ie_params, jnp.asarray(np.asarray(inputs["pixel_values"])),
                            output_hidden_states=True)
        return out.hidden_states[-2]  # penultimate layer (reference `:236`)

    def prepare_latents(self, image: jax.Array, batch_size: int, num_channels_latents: int,
                        height: int, width: int, num_frames: int, key: jax.Array,
                        latents: Optional[jax.Array] = None):
        vae, vae_params = self.vae
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            latents = randn_tensor(
                (batch_size, num_channels_latents, num_latent_frames, lh, lw), key=key)

        video_condition = jnp.concatenate(
            [image[:, :, None], jnp.zeros((image.shape[0], image.shape[1], num_frames - 1,
                                           height, width), image.dtype)], axis=2)
        latent_condition = vae.encode(vae_params, video_condition).mode()
        latent_condition = jnp.repeat(latent_condition, batch_size // latent_condition.shape[0], axis=0)
        lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        latent_condition = (latent_condition - lm) / ls

        # first-frame mask folded into vsf_t channels (reference `:432-441`)
        mask = np.ones((batch_size, 1, num_frames, lh, lw), np.float32)
        mask[:, :, 1:] = 0
        first = np.repeat(mask[:, :, 0:1], self.vae_scale_factor_temporal, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(batch_size, -1, self.vae_scale_factor_temporal, lh, lw)
        mask = np.transpose(mask, (0, 2, 1, 3, 4))
        return latents, jnp.concatenate([jnp.asarray(mask), latent_condition], axis=1)

    def _denoise(self, t_params, latents, condition, prompt_embeds, negative_embeds,
                 image_embeds, rope, timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_in = jnp.concatenate([latents, condition], axis=1)
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            noise_cond = transformer(
                t_params, latent_in, timestep, prompt_embeds,
                encoder_hidden_states_image=image_embeds, rotary_emb=rope,
            ).sample
            if do_cfg:
                noise_uncond = transformer(
                    t_params, latent_in, timestep, negative_embeds,
                    encoder_hidden_states_image=image_embeds, rotary_emb=rope,
                ).sample
                noise_pred = noise_uncond + guidance_scale * (noise_cond - noise_uncond)
            else:
                noise_pred = noise_cond
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, state), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents, state

    @staticmethod
    def _slice_scan_state(state, frame_idx):
        """Slice the multistep scheduler carry to the kept frames (the
        reference mutates scheduler.model_outputs / last_sample, `:667-676`)."""
        updates = {}
        for field in ("model_outputs", "last_sample"):
            val = getattr(state, field, None)
            if val is not None and val.ndim >= 4:
                updates[field] = val[..., frame_idx, :, :]
        return state.replace(**updates) if updates else state

    def __call__(
        self,
        image=None,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        enable_temporal_reasoning: bool = False,
        num_temporal_reasoning_steps: int = 0,
        image_embeds: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        num_frames = 5 if not enable_temporal_reasoning else num_frames
        if num_frames % self.vae_scale_factor_temporal != 1:
            logger.warning("`num_frames - 1` must divide the temporal scale; rounding.")
            num_frames = num_frames // self.vae_scale_factor_temporal * self.vae_scale_factor_temporal + 1
        num_frames = max(num_frames, 1)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        if image_embeds is None:
            image_embeds = self.encode_image(image)
        image_embeds = jnp.repeat(image_embeds, batch_size, axis=0)

        pixel = jnp.asarray(np.asarray(image, np.float32))[None]
        if pixel.ndim == 4 and pixel.shape[-1] == 3:  # HWC image -> NCHW in [-1,1]
            pixel = jnp.transpose(pixel, (0, 3, 1, 2)) / 127.5 - 1.0
        key, lat_key = jax.random.split(key)
        num_channels_latents = vae.config.z_dim
        latents, condition = self.prepare_latents(
            pixel, batch_size, num_channels_latents, height, width, num_frames, lat_key, latents)

        num_latent_frames = latents.shape[2]
        lh, lw = latents.shape[3], latents.shape[4]
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sample_shape=latents.shape)
        except TypeError:
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, "full"))

        if enable_temporal_reasoning and 0 < num_temporal_reasoning_steps < len(state.timesteps):
            k = num_temporal_reasoning_steps
            rope_full = transformer.rope(num_latent_frames, lh, lw)
            latents, state = denoise(t_params, latents, condition, prompt_embeds, negative_embeds,
                                     image_embeds, rope_full, state.timesteps[:k], state)
            # drop the reasoning frames: keep [first, last] (reference `:667`)
            latents = latents[:, :, jnp.asarray([0, num_latent_frames - 1])]
            condition = condition[:, :, jnp.asarray([0, num_latent_frames - 1])]
            state = self._slice_scan_state(state, np.asarray([0, num_latent_frames - 1]))
            rope_pair = transformer.rope(2, lh, lw)
            denoise2 = self._jit(
                "denoise_pair", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                static=(guidance_scale, do_cfg, "pair"))
            latents, state = denoise2(t_params, latents, condition, prompt_embeds, negative_embeds,
                                      image_embeds, rope_pair, state.timesteps[k:], state)
        else:
            rope = transformer.rope(num_latent_frames, lh, lw)
            latents, state = denoise(t_params, latents, condition, prompt_embeds, negative_embeds,
                                     image_embeds, rope, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            lat = latents * ls + lm
            if enable_temporal_reasoning and lat.shape[2] > 2:
                video_edit = vae.decode(vae_params, lat[:, :, jnp.asarray([0, lat.shape[2] - 1])]).sample
                video_reason = vae.decode(vae_params, lat[:, :, :-1]).sample
                video = jnp.concatenate([video_reason, video_edit[:, :, 1:]], axis=2)
            else:
                video = vae.decode(vae_params, lat).sample
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return ChronoEditPipelineOutput(frames=video)

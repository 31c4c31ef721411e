"""AnimateDiff text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/animatediff/pipeline_animatediff.py`):
CLIP text encoding, per-frame prompt-embed repeat (`:765`), CFG batch-2 denoise
over [B, C, F, H/8, W/8] latents with the motion UNet, per-frame VAE decode
(`:410` decode_latents). TPU-first: one jitted `lax.scan` over all steps;
`num_frames` is static so the video forward is a single XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...loaders.ip_adapter import IPAdapterPipelineMixin
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from ..free_init_utils import FreeInitMixin
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class AnimateDiffPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class AnimateDiffPipeline(DiffusionPipeline, IPAdapterPipelineMixin, FreeInitMixin):
    _optional_components = ["feature_extractor", "image_encoder", "motion_adapter"]

    def __init__(
        self,
        vae,
        text_encoder,
        tokenizer,
        unet,
        motion_adapter,
        scheduler,
        feature_extractor=None,
        image_encoder=None,
    ):
        super().__init__()
        self.register_modules(
            vae=vae,
            text_encoder=text_encoder,
            tokenizer=tokenizer,
            unet=unet,
            motion_adapter=motion_adapter,
            scheduler=scheduler,
            feature_extractor=feature_extractor,
            image_encoder=image_encoder,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor)

    # ------------------------------------------------------------ prompts
    def _tokenize(self, prompt: Union[str, List[str]]):
        if isinstance(prompt, str):
            prompt = [prompt]
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        return jnp.asarray(inputs.input_ids)

    def encode_prompt(self, prompt, negative_prompt=None, do_classifier_free_guidance=True):
        text_encoder, te_params = self.text_encoder
        ids = self._tokenize(prompt)
        prompt_embeds = text_encoder(te_params, ids).last_hidden_state
        if not do_classifier_free_guidance:
            return prompt_embeds
        if negative_prompt is None:
            negative_prompt = [""] * ids.shape[0]
        elif isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * ids.shape[0]
        neg_ids = self._tokenize(negative_prompt)
        negative_embeds = text_encoder(te_params, neg_ids).last_hidden_state
        return jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

    # ------------------------------------------------------------ denoise
    def _denoise(
        self,
        unet_params,
        prompt_embeds: jax.Array,  # [(2)B*F, S, D] already frame-repeated
        latents: jax.Array,  # [B, C, F, h, w]
        guidance_scale: float,
        num_inference_steps: int,
        do_cfg: bool,
        image_embeds: Optional[list] = None,
    ) -> jax.Array:
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        added_cond_kwargs = {"image_embeds": image_embeds} if image_embeds is not None else None

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params,
                latent_input,
                t,
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs=added_cond_kwargs,
            ).sample
            if do_cfg:
                noise_uncond, noise_text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = noise_uncond + guidance_scale * (noise_text - noise_uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def _decode(self, vae_params, latents: jax.Array) -> jax.Array:
        vae = self.vae[0]
        b, c, f, h, w = latents.shape
        latents = jnp.transpose(latents, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
        latents = latents / vae.config.scaling_factor
        video = vae.decode(vae_params, latents).sample  # [B*F, 3, H, W]
        video = video.reshape(b, f, video.shape[1], video.shape[2], video.shape[3])
        return jnp.clip(video / 2 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------ __call__
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        num_frames: int = 16,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        ip_adapter_image=None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        sample_size = unet.config.sample_size or 64
        height = height or sample_size * self.vae_scale_factor
        width = width or sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        # per-frame repeat (reference pipeline_animatediff.py:765)
        prompt_embeds = jnp.repeat(prompt_embeds, num_frames, axis=0)

        image_embeds = None
        if ip_adapter_image is not None:
            image_embeds = self.prepare_ip_adapter_image_embeds(ip_adapter_image, batch_size, do_cfg)

        shape = (
            batch_size,
            unet.config.in_channels,
            num_frames,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        initial_noise = latents
        for it, steps in self._free_init_iterations(num_inference_steps):
            if it > 0:
                key, reinit_key = jax.random.split(key)
                latents = self._free_init_reinit_latents(latents, initial_noise, reinit_key)
            denoise = self._jit(
                "denoise",
                partial(self._denoise, guidance_scale=guidance_scale, num_inference_steps=steps, do_cfg=do_cfg),
                static=(guidance_scale, steps, do_cfg),
            )
            latents = denoise(unet_params, prompt_embeds, latents, image_embeds=image_embeds)

        if output_type == "latent":
            video = latents
        else:
            video = self._jit("decode", self._decode)(vae_params, latents)
            video = np.asarray(jnp.transpose(video, (0, 1, 3, 4, 2)))  # [B, F, H, W, 3]

        if not return_dict:
            return (video,)
        return AnimateDiffPipelineOutput(frames=video)

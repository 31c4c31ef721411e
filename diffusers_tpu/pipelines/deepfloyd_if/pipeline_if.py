"""DeepFloyd IF stage-I text-to-image pipeline (pixel-space diffusion).

Behavioral mirror of the reference
`pipelines/deepfloyd_if/pipeline_if.py`: T5 text conditioning with
attention mask (`:672`), pixel-space DDPM denoise at `sample_size`
(default 64px), learned-variance split under CFG — the unconditional
branch's variance half is dropped, the text branch's kept (`:730`).
TPU-first: one jitted `lax.scan` over all steps.
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

logger = logging.get_logger(__name__)


@dataclass
class IFPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]
    nsfw_detected: Optional[List[bool]] = None
    watermark_detected: Optional[List[bool]] = None


class IFPipeline(DiffusionPipeline):
    _optional_components = ["tokenizer", "text_encoder", "safety_checker", "feature_extractor", "watermarker"]

    def __init__(self, tokenizer, text_encoder, unet, scheduler,
                 safety_checker=None, feature_extractor=None, watermarker=None,
                 requires_safety_checker: bool = False):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, unet=unet, scheduler=scheduler,
            safety_checker=safety_checker, feature_extractor=feature_extractor, watermarker=watermarker,
        )

    def encode_prompt(self, prompt: List[str], negative_prompt, do_cfg: bool, max_length: int = 77):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_length, truncation=True,
                return_tensors="np", add_special_tokens=True,
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            return text_encoder(te_params, ids, attention_mask=mask).last_hidden_state

        prompt_embeds = encode(prompt)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = encode(negative_prompt)
        return prompt_embeds, negative_embeds

    def _denoise(self, unet_params, images, prompt_embeds, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            images, sstate = carry
            model_input = jnp.concatenate([images, images], axis=0) if do_cfg else images
            noise_pred = unet(unet_params, model_input, t, encoder_hidden_states=prompt_embeds).sample
            C = images.shape[1]
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                uncond = uncond[:, :C]
                text, predicted_variance = text[:, :C], text[:, C:]
                noise_pred = uncond + guidance_scale * (text - uncond)
                noise_pred = jnp.concatenate([noise_pred, predicted_variance], axis=1)
            if self.scheduler.config.get("variance_type") not in ("learned", "learned_range"):
                noise_pred = noise_pred[:, :C]
            out = scheduler.step(sstate, noise_pred, t, images)
            return (out.prev_sample, out.state), None

        (images, _), _ = jax.lax.scan(step_fn, (images, state), timesteps)
        return images

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        key: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        height = height or unet.config.sample_size
        width = width or unet.config.sample_size
        do_cfg = guidance_scale > 1.0
        batch_size = len(prompt) if prompt is not None else prompt_embeds.shape[0]

        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        key, lat_key = jax.random.split(key)
        images = randn_tensor(
            (batch_size * num_images_per_prompt, unet.config.in_channels, height, width), key=lat_key
        )
        images = images * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, images)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        images = denoise(unet_params, images, prompt_embeds, state.timesteps, state)

        if output_type == "np":
            images = np.asarray(jnp.transpose(jnp.clip(images / 2 + 0.5, 0, 1), (0, 2, 3, 1)))
        if not return_dict:
            return (images,)
        return IFPipelineOutput(images=images)

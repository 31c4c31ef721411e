"""Kandinsky 2.1 text-to-image decoder pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/kandinsky/pipeline_kandinsky.py:81`
KandinskyPipeline): MultilingualCLIP prompt encoding — the XLM-Roberta
masked-mean projection feeds the UNet's `text_embeds` added condition while
the full hidden states feed cross-attention through the `text_image_proj`
encoder projection together with the prior's CLIP image embedding (`:358`);
learned-variance split under CFG; MoVQ decode.

TPU-first: ONE jitted scan (cond/uncond batched)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..kandinsky2_2.pipeline_kandinsky2_2 import downscale_height_and_width
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

get_new_h_w = downscale_height_and_width


@dataclass
class KandinskyPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class KandinskyPipeline(DiffusionPipeline):
    def __init__(self, text_encoder, tokenizer, unet, scheduler, movq):
        super().__init__()
        self.register_modules(
            text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, movq=movq,
        )
        self.movq_scale_factor = 2 ** (len(movq[0].config.block_out_channels) - 1) if movq is not None else 8

    def _encode_prompt(self, prompt, negative_prompt, do_cfg):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        inputs = self.tokenizer(prompt, padding="max_length", truncation=True, max_length=77,
                                return_attention_mask=True, add_special_tokens=True,
                                return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, ids, attention_mask=mask)
        prompt_embeds, hidden = out.projected, out.last_hidden_state

        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            n_inputs = self.tokenizer(negative_prompt, padding="max_length", max_length=77,
                                      truncation=True, return_attention_mask=True,
                                      add_special_tokens=True, return_tensors="np")
            n_ids = jnp.asarray(np.asarray(n_inputs["input_ids"]))
            n_mask = jnp.asarray(np.asarray(n_inputs["attention_mask"]))
            n_out = text_encoder(te_params, n_ids, attention_mask=n_mask)
            prompt_embeds = jnp.concatenate([n_out.projected, prompt_embeds], axis=0)
            hidden = jnp.concatenate([n_out.last_hidden_state, hidden], axis=0)
            mask = jnp.concatenate([n_mask, mask], axis=0)
        return prompt_embeds, hidden, mask

    def _denoise(self, unet_params, latents, prompt_embeds, hidden, image_embeds,
                 timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=hidden,
                added_cond_kwargs={"text_embeds": prompt_embeds, "image_embeds": image_embeds},
            ).sample
            if do_cfg:
                noise_pred, variance_pred = jnp.split(noise_pred, 2, axis=1)
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                _, variance_text = jnp.split(variance_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                noise_pred = jnp.concatenate([noise_pred, variance_text], axis=1)
            if not (scheduler.config.get("variance_type") in ("learned", "learned_range")):
                noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]],
        image_embeds: jax.Array,
        negative_image_embeds: Optional[jax.Array] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 100,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        movq, movq_params = self.movq
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, hidden, _ = self._encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = image_embeds.shape[0]
        if do_cfg:
            if negative_image_embeds is None:
                negative_image_embeds = jnp.zeros_like(image_embeds)
            image_embeds = jnp.concatenate([negative_image_embeds, image_embeds], axis=0)

        # get_new_h_w returns the LATENT grid size (reference
        # pipeline_kandinsky.py:344 feeds it straight to prepare_latents)
        lh, lw = get_new_h_w(height, width, self.movq_scale_factor)
        num_channels_latents = unet.config.in_channels
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(unet_params, latents, prompt_embeds, hidden, image_embeds,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: movq.decode(p, z, force_not_quantize=True).sample
            )
            image = decode(movq_params, latents)
            image = np.asarray(jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1)))
            if output_type == "pil":
                from ...image_processor import numpy_to_pil

                image = numpy_to_pil(image)

        if not return_dict:
            return (image,)
        return KandinskyPipelineOutput(images=image)

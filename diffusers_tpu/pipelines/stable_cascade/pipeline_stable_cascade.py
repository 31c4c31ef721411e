"""Stable Cascade decoder (stage B) pipeline.

Behavioral mirror of the reference
`pipelines/stable_cascade/pipeline_stable_cascade.py`: prior image
embeddings used as effnet conditioning with a zero uncond branch
(`:453`), latent shape `image_embedding_hw * latent_dim_scale (10.67)`
(`:116`), pooled-only text conditioning, DDPMWuerstchen denoise, Paella
VQGAN decode with `scale_factor` and [0, 1] clamp (`:530`).
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
class ImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class StableCascadeDecoderPipeline(DiffusionPipeline):
    def __init__(self, decoder, tokenizer, text_encoder, scheduler, vqgan,
                 latent_dim_scale: float = 10.67):
        super().__init__()
        self.register_modules(
            decoder=decoder, tokenizer=tokenizer, text_encoder=text_encoder,
            scheduler=scheduler, vqgan=vqgan,
        )
        self.register_to_config(latent_dim_scale=latent_dim_scale)

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            out = text_encoder(te_params, ids, output_hidden_states=True)
            return out.text_embeds[:, None, :]

        if isinstance(prompt, str):
            prompt = [prompt]
        pooled = encode(prompt)
        neg_pooled = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_pooled = encode(negative_prompt)
        return pooled, neg_pooled

    def _denoise(self, decoder_params, latents, text_pooled, effnet, timesteps, prev_timesteps,
                 state, guidance_scale, do_cfg, key):
        decoder = self.decoder[0]
        scheduler = self.scheduler

        def step_fn(carry, ts):
            latents, step_key = carry
            t, prev_t = ts
            ratio = jnp.broadcast_to(t, (latents.shape[0],))
            pred = decoder(
                decoder_params,
                sample=jnp.concatenate([latents, latents], axis=0) if do_cfg else latents,
                timestep_ratio=jnp.concatenate([ratio, ratio], axis=0) if do_cfg else ratio,
                clip_text_pooled=text_pooled, effnet=effnet,
            ).sample
            if do_cfg:
                pred_text, pred_uncond = jnp.split(pred, 2, axis=0)
                pred = pred_uncond + guidance_scale * (pred_text - pred_uncond)
            step_key, sub = jax.random.split(step_key)
            out = scheduler.step(state, pred, t, latents, prev_timestep=prev_t, key=sub)
            return (out.prev_sample, step_key), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, key), (timesteps, prev_timesteps))
        return latents

    def __call__(
        self,
        image_embeddings: jax.Array,
        prompt: Union[str, List[str]] = None,
        num_inference_steps: int = 10,
        guidance_scale: float = 0.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        decoder, decoder_params = self.decoder
        vqgan, vqgan_params = self.vqgan
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0
        image_embeddings = jnp.asarray(image_embeddings)

        pooled, neg_pooled = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = image_embeddings.shape[0]
        text_pooled = jnp.concatenate([pooled, neg_pooled], axis=0) if do_cfg else pooled
        effnet = (jnp.concatenate([image_embeddings, jnp.zeros_like(image_embeddings)], axis=0)
                  if do_cfg else image_embeddings)

        state = self.scheduler.set_timesteps(num_inference_steps)
        _, _, eh, ew = image_embeddings.shape
        shape = (batch_size * num_images_per_prompt, decoder.config.in_channels,
                 int(eh * self.config.get("latent_dim_scale")),
                 int(ew * self.config.get("latent_dim_scale")))
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * self.scheduler.init_noise_sigma

        ts = state.timesteps
        key, loop_key = jax.random.split(key)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(decoder_params, latents, text_pooled, effnet, ts[:-1], ts[1:],
                          state, key=loop_key)

        if output_type == "latent":
            images = latents
        else:
            decode = self._jit(
                "vq_decode",
                lambda p, z: jnp.clip(vqgan.decode(p, vqgan.config.scale_factor * z).sample, 0, 1),
            )
            images = decode(vqgan_params, latents)
            if output_type == "np":
                images = np.asarray(jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32))
        if not return_dict:
            return images
        return ImagePipelineOutput(images)

"""aMUSEd masked-image-modeling text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/amused/pipeline_amused.py:49`):
CLIP pooled + penultimate hidden states condition a UVit2D over VQ token
maps; the MaskGit unmask loop (multinomial sample + confidence re-mask) runs
as ONE lax.scan with per-step PRNG keys; VQ-GAN codebook lookup decodes the
final ids. Micro-conditioning packs (w, h, crop, aesthetic score).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....image_processor import VaeImageProcessor
from ....utils import BaseOutput, logging
from ...pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class AmusedPipelineOutput(BaseOutput):
    images: Union[np.ndarray, List]


class AmusedPipeline(DiffusionPipeline):
    def __init__(self, vqvae, tokenizer, text_encoder, transformer, scheduler):
        super().__init__()
        self.register_modules(vqvae=vqvae, tokenizer=tokenizer, text_encoder=text_encoder,
                              transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(self.vqvae[0].config.block_out_channels) - 1)
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor,
                                                 do_normalize=False)

    def encode_prompt(self, prompt, negative_prompt, do_cfg):
        if isinstance(prompt, str):
            prompt = [prompt]
        encoder, params = self.text_encoder
        tok = lambda texts: jnp.asarray(self.tokenizer(
            texts, padding="max_length", max_length=self.tokenizer.model_max_length,
            truncation=True, return_tensors="np").input_ids)

        def encode(p, ids):
            out = encoder(p, ids, output_hidden_states=True)
            return out.text_embeds, out.hidden_states[-2]

        encode = self._jit("encode", encode)
        pooled, hidden = encode(params, tok(prompt))
        if not do_cfg:
            return pooled, hidden
        negative = negative_prompt if negative_prompt is not None else [""] * len(prompt)
        if isinstance(negative, str):
            negative = [negative] * len(prompt)
        neg_pooled, neg_hidden = encode(params, tok(negative))
        return (jnp.concatenate([neg_pooled, pooled], axis=0),
                jnp.concatenate([neg_hidden, hidden], axis=0))

    def _denoise(self, t_params, latents, pooled, encoder_hidden_states, micro_conds,
                 state, step_keys, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, xs):
            latents = carry
            t, key = xs
            model_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            logits = transformer(t_params, model_input, encoder_hidden_states, pooled, micro_conds)
            if do_cfg:
                uncond, cond = jnp.split(logits, 2, axis=0)
                logits = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(state, logits, t, latents, key=key)
            return out.prev_sample, None

        latents, _ = jax.lax.scan(step_fn, latents, (state.timesteps, step_keys))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 12,
        guidance_scale: float = 10.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        micro_conditioning_aesthetic_score: int = 6,
        micro_conditioning_crop_coord: Tuple[int, int] = (0, 0),
        temperature: Union[int, Tuple[int, int], List[int]] = (2, 0),
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vqvae, vq_params = self.vqvae
        height = height or transformer.config.sample_size * self.vae_scale_factor
        width = width or transformer.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        pooled, encoder_hidden_states = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch = pooled.shape[0] // (2 if do_cfg else 1)

        # micro conds flip w/h order (reference `:233` matching the original repo)
        micro = jnp.asarray([[width, height, micro_conditioning_crop_coord[0],
                              micro_conditioning_crop_coord[1],
                              micro_conditioning_aesthetic_score]], jnp.float32)
        micro_conds = jnp.broadcast_to(micro, ((2 if do_cfg else 1) * batch, 5))

        lh, lw = height // self.vae_scale_factor, width // self.vae_scale_factor
        if latents is None:
            latents = jnp.full((batch, lh, lw), self.scheduler.config.mask_token_id, jnp.int32)

        state = self.scheduler.set_timesteps(num_inference_steps, temperature)
        step_keys = jax.random.split(key, num_inference_steps)

        from functools import partial

        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, pooled, encoder_hidden_states, micro_conds,
                          state, step_keys)

        if output_type == "latent":
            image = latents
        else:
            def decode(p, ids):
                return vqvae.decode(
                    p, ids, force_not_quantize=True,
                    shape=(ids.shape[0], lh, lw, vqvae.config.latent_channels),
                ).sample

            image = self._jit("decode", decode)(vq_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return AmusedPipelineOutput(images=image)

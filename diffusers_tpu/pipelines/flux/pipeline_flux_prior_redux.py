"""Flux Prior Redux pipeline: image → Flux conditioning embeds.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_prior_redux.py`):
Siglip vision features run through the ReduxImageEncoder; the resulting image
tokens are APPENDED to the (optional) T5 prompt embeds, scaled by
`prompt_embeds_scale` (`:480-494`). The output feeds `FluxPipeline.__call__`
via `prompt_embeds=` / `pooled_prompt_embeds=`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ..pipeline_utils import DiffusionPipeline
from .pipeline_flux import FluxPipeline

logger = logging.get_logger(__name__)


@dataclass
class FluxPriorReduxPipelineOutput(BaseOutput):
    prompt_embeds: jax.Array
    pooled_prompt_embeds: jax.Array


class FluxPriorReduxPipeline(DiffusionPipeline):
    _optional_components = ["text_encoder", "tokenizer", "text_encoder_2", "tokenizer_2"]

    def __init__(self, image_encoder, image_embedder, feature_extractor=None,
                 text_encoder=None, tokenizer=None, text_encoder_2=None, tokenizer_2=None):
        super().__init__()
        self.register_modules(
            image_encoder=image_encoder,
            image_embedder=image_embedder,
            feature_extractor=feature_extractor,
            text_encoder=text_encoder,
            tokenizer=tokenizer,
            text_encoder_2=text_encoder_2,
            tokenizer_2=tokenizer_2,
        )

    def encode_image(self, image) -> jax.Array:
        image_encoder, ie_params = self.image_encoder
        if self.feature_extractor is not None:
            pixel_values = np.asarray(self.feature_extractor(
                images=image, do_resize=True, return_tensors="np", do_convert_rgb=True
            )["pixel_values"])
        else:
            pixel_values = np.asarray(image, np.float32)
            if pixel_values.ndim == 3:
                pixel_values = pixel_values[None]
        fwd = self._jit("encode_image", lambda p, x: image_encoder(p, x).last_hidden_state)
        return fwd(ie_params, jnp.asarray(pixel_values))

    def __call__(
        self,
        image,
        prompt: Union[str, List[str], None] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        prompt_embeds_scale: Union[float, List[float]] = 1.0,
        pooled_prompt_embeds_scale: Union[float, List[float]] = 1.0,
        return_dict: bool = True,
    ):
        embedder, emb_params = self.image_embedder
        image_latents = self.encode_image(image)
        image_embeds = self._jit("image_embedder", lambda p, x: embedder(p, x).image_embeds)(
            emb_params, image_latents
        )
        batch_size = image_embeds.shape[0]

        if prompt is not None and self.text_encoder is not None:
            # reuse FluxPipeline's T5+CLIP encode (reference delegates to the
            # same encode_prompt, `pipeline_flux_prior_redux.py:348-353`)
            prompt_embeds, pooled_prompt_embeds, _ = FluxPipeline.encode_prompt(
                self, prompt, prompt_2, 512
            )
        else:
            if prompt is not None:
                logger.warning(
                    "prompt input is ignored when text encoders are not loaded to the pipeline."
                )
            txt_dim = embedder.config.txt_in_features
            prompt_embeds = jnp.zeros((batch_size, 512, txt_dim), image_embeds.dtype)
            pooled_prompt_embeds = jnp.zeros((batch_size, 768), image_embeds.dtype)

        prompt_embeds = jnp.concatenate([prompt_embeds, image_embeds], axis=1)

        pe_scale = jnp.asarray(prompt_embeds_scale, jnp.float32).reshape(-1, 1, 1)
        pp_scale = jnp.asarray(pooled_prompt_embeds_scale, jnp.float32).reshape(-1, 1)
        prompt_embeds = prompt_embeds * pe_scale
        pooled_prompt_embeds = pooled_prompt_embeds * pp_scale
        if batch_size > 1 and np.ndim(prompt_embeds_scale) > 0:
            # weighted image-mixing mode (reference `:493`): sum over inputs
            prompt_embeds = jnp.sum(prompt_embeds, axis=0, keepdims=True)
            pooled_prompt_embeds = jnp.sum(pooled_prompt_embeds, axis=0, keepdims=True)

        if not return_dict:
            return (prompt_embeds, pooled_prompt_embeds)
        return FluxPriorReduxPipelineOutput(
            prompt_embeds=prompt_embeds, pooled_prompt_embeds=pooled_prompt_embeds
        )

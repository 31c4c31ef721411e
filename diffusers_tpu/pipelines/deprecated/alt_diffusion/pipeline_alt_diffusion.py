"""AltDiffusion: multilingual Stable Diffusion (AltCLIP text tower).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/alt_diffusion/pipeline_alt_diffusion.py:73`):
identical to StableDiffusionPipeline except the text encoder is
`RobertaSeriesModelWithTransformation` whose `projection_state` feeds the
UNet cross-attention. The img2img variant composes the same encoder with the
standard img2img flow.
"""

from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp

from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline
from ...stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline


class _RobertaPromptMixin:
    def encode_prompt(self, prompt, negative_prompt=None, do_classifier_free_guidance=True):
        """projection_state as cross-attention context (reference `:361-414`)."""
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        inputs = self.tokenizer(prompt, padding="max_length", max_length=77,
                                truncation=True, return_tensors="np")
        mask = getattr(inputs, "attention_mask", None)
        out = text_encoder(te_params, jnp.asarray(inputs.input_ids),
                           attention_mask=None if mask is None else jnp.asarray(mask))
        prompt_embeds = out.projection_state
        if not do_classifier_free_guidance:
            return prompt_embeds
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_inputs = self.tokenizer(negative_prompt, padding="max_length", max_length=77,
                                    truncation=True, return_tensors="np")
        neg_mask = getattr(neg_inputs, "attention_mask", None)
        neg_out = text_encoder(te_params, jnp.asarray(neg_inputs.input_ids),
                               attention_mask=None if neg_mask is None else jnp.asarray(neg_mask))
        return jnp.concatenate([neg_out.projection_state, prompt_embeds], axis=0)


class AltDiffusionPipeline(_RobertaPromptMixin, StableDiffusionPipeline):
    pass


class AltDiffusionImg2ImgPipeline(_RobertaPromptMixin, StableDiffusionImg2ImgPipeline):
    pass

"""VQ-Diffusion text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/vq_diffusion/pipeline_vq_diffusion.py:52`):
CLIP-conditioned discrete-token transformer producing log p(x_0), classifier
-free guidance in log space with renormalization, per-column truncation
(`truncate`, `:300`), the discrete posterior scheduler (added r3), and a
VQ-GAN codebook decode. The denoise loop is ONE lax.scan with per-step
Gumbel keys; truncation sorts in log-prob space — all static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....configuration_utils import ConfigMixin, register_to_config
from ....models.modeling_utils import ModelMixin
from ....ops.module import Module, Params
from ....utils import BaseOutput, logging
from ...pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


class LearnedClassifierFreeSamplingEmbeddings(Module, ModelMixin, ConfigMixin):
    """Stored learned uncond embeddings (reference `:30`)."""

    @register_to_config
    def __init__(self, learnable: bool, hidden_size: Optional[int] = None,
                 length: Optional[int] = None):
        super().__init__()
        self.learnable = learnable
        self.hidden_size = hidden_size
        self.length = length

    def init(self, key, dtype=jnp.float32) -> Params:
        if self.learnable:
            return {"embeddings": jnp.zeros((self.length, self.hidden_size), dtype)}
        return {}

    def __call__(self, params: Params):
        return params.get("embeddings")


@dataclass
class VQDiffusionPipelineOutput(BaseOutput):
    images: Union[np.ndarray, List]


class VQDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vqvae, text_encoder, tokenizer, transformer,
                 learned_classifier_free_sampling_embeddings, scheduler):
        super().__init__()
        self.register_modules(
            vqvae=vqvae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            learned_classifier_free_sampling_embeddings=learned_classifier_free_sampling_embeddings,
            scheduler=scheduler,
        )

    def _encode_prompt(self, prompt, num_images_per_prompt, do_cfg):
        if isinstance(prompt, str):
            prompt = [prompt]
        batch = len(prompt)
        encoder, params = self.text_encoder
        ids = jnp.asarray(self.tokenizer(
            prompt, padding="max_length", max_length=self.tokenizer.model_max_length,
            truncation=True, return_tensors="np").input_ids)
        embeds = self._jit("encode", lambda p, i: encoder(p, i).last_hidden_state)(params, ids)
        # VQ-Diffusion L2-normalizes the text embeddings (reference `:132`)
        embeds = embeds / jnp.clip(jnp.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
        embeds = jnp.repeat(embeds, num_images_per_prompt, axis=0)

        if do_cfg:
            lcfse, lcfse_params = self.learned_classifier_free_sampling_embeddings
            if lcfse.config.learnable:
                negative = lcfse(lcfse_params)[None]
            else:
                uncond_ids = jnp.asarray(self.tokenizer(
                    [""] * batch, padding="max_length", max_length=self.tokenizer.model_max_length,
                    truncation=True, return_tensors="np").input_ids)
                negative = self._jit("encode", lambda p, i: encoder(p, i).last_hidden_state)(
                    params, uncond_ids)
                negative = negative / jnp.clip(jnp.linalg.norm(negative, axis=-1, keepdims=True), 1e-12)
            negative = jnp.broadcast_to(negative, embeds.shape)
            embeds = jnp.concatenate([negative, embeds], axis=0)
        return embeds

    @staticmethod
    def _truncate(log_p_x_0: jax.Array, truncation_rate: float) -> jax.Array:
        """Zero out (to -inf) classes outside the top cumulative
        `truncation_rate` probability mass per latent pixel (reference
        `truncate`, `:300`) — static-shape sort instead of host loops."""
        sorted_logs = jnp.sort(log_p_x_0, axis=1)[:, ::-1]  # descending
        cum = jnp.cumsum(jnp.exp(sorted_logs), axis=1)
        keep_sorted = cum < truncation_rate
        # always keep the largest class
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(keep_sorted[:, :1]), keep_sorted[:, :-1]], axis=1)
        # per-pixel threshold = smallest kept log-prob
        thresh = jnp.min(jnp.where(keep_sorted, sorted_logs, jnp.inf), axis=1, keepdims=True)
        return jnp.where(log_p_x_0 >= thresh, log_p_x_0, -jnp.inf)

    def _denoise(self, t_params, sample, prompt_embeds, state, step_keys,
                 guidance_scale, truncation_rate, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, xs):
            sample = carry
            t, key = xs
            model_input = jnp.concatenate([sample, sample], axis=0) if do_cfg else sample
            log_p = transformer(t_params, model_input, encoder_hidden_states=prompt_embeds,
                                timestep=t)
            if do_cfg:
                uncond, text = jnp.split(log_p, 2, axis=0)
                log_p = uncond + guidance_scale * (text - uncond)
                log_p = log_p - jax.scipy.special.logsumexp(log_p, axis=1, keepdims=True)
            log_p = self._truncate(log_p, truncation_rate)
            log_p = jnp.clip(log_p, -70)
            out = scheduler.step(state, log_p, t, sample, key=key)
            return out.prev_sample, None

        sample, _ = jax.lax.scan(step_fn, sample, (state.timesteps, step_keys))
        return sample

    def __call__(
        self,
        prompt: Union[str, List[str]],
        num_inference_steps: int = 100,
        guidance_scale: float = 5.0,
        truncation_rate: float = 1.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vqvae, vq_params = self.vqvae
        if key is None:
            key = jax.random.PRNGKey(0)
        batch = (1 if isinstance(prompt, str) else len(prompt)) * num_images_per_prompt
        do_cfg = guidance_scale > 1.0

        prompt_embeds = self._encode_prompt(prompt, num_images_per_prompt, do_cfg)

        if latents is None:
            mask_class = transformer.num_vector_embeds - 1
            latents = jnp.full((batch, transformer.num_latent_pixels), mask_class, jnp.int32)

        state = self.scheduler.set_timesteps(num_inference_steps)
        step_keys = jax.random.split(key, num_inference_steps)

        from functools import partial

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    truncation_rate=truncation_rate, do_cfg=do_cfg),
            static=(guidance_scale, truncation_rate, do_cfg),
        )
        sample = denoise(t_params, latents, prompt_embeds, state, step_keys)

        def decode(p, ids):
            embed_dim = vqvae.config.vq_embed_dim or vqvae.config.latent_channels
            shape = (ids.shape[0], transformer.height, transformer.width, embed_dim)
            embeddings = vqvae.quantize.get_codebook_entry(p["quantize"], ids, shape=shape)
            return vqvae.decode(p, embeddings, force_not_quantize=True).sample

        image = self._jit("decode", decode)(vq_params, sample)
        image = np.asarray(jnp.clip(image / 2 + 0.5, 0, 1).transpose(0, 2, 3, 1))
        if output_type == "pil":
            from ....image_processor import numpy_to_pil

            image = numpy_to_pil(image)

        if not return_dict:
            return (image,)
        return VQDiffusionPipelineOutput(images=image)

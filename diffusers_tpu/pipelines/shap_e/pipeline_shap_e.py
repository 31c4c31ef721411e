"""Shap-E text-to-3D pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/shap_e/pipeline_shap_e.py:87`
ShapEPipeline): CLIP text_embeds normalized to unit norm then rescaled by
sqrt(dim) with a zeros negative branch (`:140-187`), Heun prior denoise over
`[B, num_embeddings, embedding_dim]` latents dropping the variance half of
the prior output (`:289-293`), then NeRF frame rendering or STF mesh
extraction through `ShapERenderer`.

TPU-first: the prior loop is ONE jitted scan (cond/uncond batched); the
renderer grafts projected MLP weights functionally (no state_dict mutation).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ShapEPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class ShapEPipeline(DiffusionPipeline):
    def __init__(self, prior, text_encoder, tokenizer, scheduler, shap_e_renderer):
        super().__init__()
        self.register_modules(
            prior=prior, text_encoder=text_encoder, tokenizer=tokenizer,
            scheduler=scheduler, shap_e_renderer=shap_e_renderer,
        )

    def _encode_prompt(self, prompt, do_cfg: bool):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        if hasattr(self.tokenizer, "pad_token_id"):
            self.tokenizer.pad_token_id = 0  # reference `:150`
        inputs = self.tokenizer(prompt, padding="max_length",
                                max_length=getattr(self.tokenizer, "model_max_length", 77),
                                truncation=True, return_tensors="np")
        out = text_encoder(te_params, jnp.asarray(inputs.input_ids))
        embeds = out.text_embeds
        embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
        if do_cfg:
            embeds = jnp.concatenate([jnp.zeros_like(embeds), embeds], axis=0)
        return jnp.sqrt(embeds.shape[1]) * embeds

    def _denoise(self, p_params, latents, prompt_embeds, timesteps, state, guidance_scale, do_cfg):
        prior = self.prior[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            scaled = scheduler.scale_model_input(sstate, latent_in, t)
            timestep = jnp.broadcast_to(t, (latent_in.shape[0],))
            pred = prior(p_params, scaled, timestep, prompt_embeds).predicted_image_embedding
            pred = pred[..., : latents.shape[-1]]  # drop the variance half (reference `:289`)
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]],
        num_inference_steps: int = 25,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        guidance_scale: float = 4.0,
        frame_size: int = 64,
        output_type: Optional[str] = "np",  # np, latent, mesh
        return_dict: bool = True,
    ):
        prior, p_params = self.prior
        renderer, r_params = self.shap_e_renderer
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self._encode_prompt(prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        state = self.scheduler.set_timesteps(num_inference_steps)
        num_embeddings = prior.config.num_embeddings
        embedding_dim = prior.config.embedding_dim
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_embeddings * embedding_dim), key=lat_key)
            latents = latents * state.init_noise_sigma
        latents = latents.reshape(batch_size, num_embeddings, embedding_dim)
        if hasattr(self.scheduler, "prepare"):  # Heun carries second-order scan state
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(p_params, latents, prompt_embeds, state.timesteps, state)

        if output_type not in ("np", "pil", "latent", "mesh"):
            raise ValueError(f"unsupported output_type={output_type}")
        if output_type == "latent":
            return ShapEPipelineOutput(images=latents)

        images = []
        if output_type == "mesh":
            for i in range(batch_size):
                images.append(renderer.decode_to_mesh(r_params, latents[i: i + 1]))
        else:
            for i in range(batch_size):
                images.append(np.asarray(
                    renderer.decode_to_image(r_params, latents[i: i + 1], size=frame_size)))
            images = np.stack(images)
            if output_type == "pil":
                from ...image_processor import VaeImageProcessor

                images = [VaeImageProcessor.numpy_to_pil(img) for img in images]

        if not return_dict:
            return (images,)
        return ShapEPipelineOutput(images=images)

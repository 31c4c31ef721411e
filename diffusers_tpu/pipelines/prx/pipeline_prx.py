"""PRX text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/prx/pipeline_prx.py:286`
PRXPipeline): T5Gemma prompt encoding with negative+positive batched in one
pass (`:458-498`), flow-match denoise with timesteps normalized by
`num_train_timesteps` (`:779`), CFG as a doubled batch, AutoencoderKL or
AutoencoderDC decode with scaling/shift factors (`:817-821`).

TPU-first: ONE jitted scan; cond/uncond batched per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class PRXPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class PRXPipeline(DiffusionPipeline):
    _optional_components = ["vae"]
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, scheduler, text_encoder, tokenizer, vae=None):
        super().__init__()
        self.register_modules(
            transformer=transformer, scheduler=scheduler, text_encoder=text_encoder,
            tokenizer=tokenizer, vae=vae,
        )
        self.default_sample_size = 32
        if vae is not None:
            cfg = vae[0].config
            if "spatial_compression_ratio" in dict(cfg):
                self.vae_scale_factor = cfg.spatial_compression_ratio
            else:
                self.vae_scale_factor = 2 ** (len(cfg.block_out_channels) - 1)
            self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        else:
            self.vae_scale_factor = 8
            self.image_processor = None

    def encode_prompt(self, prompt, negative_prompt="", do_cfg=True, max_sequence_length: int = 256):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        if do_cfg:
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            prompts = list(negative_prompt) + list(prompt)
        else:
            prompts = list(prompt)
        inputs = self.tokenizer(prompts, padding="max_length", max_length=max_sequence_length,
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        if do_cfg:
            neg, pos = jnp.split(embeds, 2, axis=0)
            neg_mask, pos_mask = jnp.split(mask, 2, axis=0)
            return pos, pos_mask, neg, neg_mask
        return embeds, mask, None, None

    def _denoise(self, t_params, latents, ca_embed, ca_mask, rope, timesteps, state,
                 guidance_scale, do_cfg, num_train_timesteps):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            t_cont = jnp.broadcast_to(t / num_train_timesteps, (latent_in.shape[0],))
            pred = transformer(
                t_params, latent_in, t_cont, ca_embed, attention_mask=ca_mask,
                image_rotary_emb=rope,
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Union[str, List[str]] = "",
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        if guidance_scale < 1.0:
            raise ValueError(f"guidance_scale has to be >= 1.0 but is {guidance_scale}")

        do_cfg = guidance_scale > 1.0
        pos, pos_mask, neg, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = pos.shape[0]
        if do_cfg:
            ca_embed = jnp.concatenate([neg, pos], axis=0)
            ca_mask = jnp.concatenate([neg_mask, pos_mask], axis=0)
        else:
            ca_embed, ca_mask = pos, pos_mask

        num_channels_latents = transformer.config.in_channels
        lh = height // self.vae_scale_factor
        lw = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        rope = transformer.rope(lh, lw)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    num_train_timesteps=float(self.scheduler.config.get("num_train_timesteps", 1000))), callback_on_step_end,
            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, ca_embed, ca_mask, rope, state.timesteps, state)

        if output_type == "latent" or self.vae is None:
            image = latents
        else:
            vae, vae_params = self.vae
            scaling = vae.config.get("scaling_factor", 0.18215)
            shift = vae.config.get("shift_factor", 0.0) or 0.0
            image = vae.decode(vae_params, latents / scaling + shift).sample
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return PRXPipelineOutput(images=image)

"""ERNIE-Image text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ernie_image/pipeline_ernie_image.py:42`
ErnieImagePipeline): per-prompt unpadded Mistral3 encoding taking
`hidden_states[-2]` (`:160`), dense right-padded text batch + `text_lens`
fed to the joint DiT, linspace sigmas, plain CFG with the cond/uncond pair
batched through one forward, Flux2 VAE with BatchNorm-stat latent
denormalization + 2x2 unpatchify before decode (`:375`).

The optional prompt-enhancer ("pe") causal LM is accepted for checkpoint
layout parity but autoregressive rewriting is not implemented — pass
`use_pe=False` or pre-enhanced prompts.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class ErnieImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]
    revised_prompts: Optional[List[str]] = None


class ErnieImagePipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["pe", "pe_tokenizer"]

    def __init__(self, transformer, vae, text_encoder, tokenizer, scheduler,
                 pe=None, pe_tokenizer=None):
        super().__init__()
        self.register_modules(transformer=transformer, vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, scheduler=scheduler, pe=pe,
                              pe_tokenizer=pe_tokenizer)
        self.vae_scale_factor = (
            2 ** len(vae[0].config.block_out_channels) if vae is not None else 16
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def encode_prompt(self, prompt, num_images_per_prompt: int = 1):
        """Unpadded per-prompt encode; returns list of [T, H] arrays
        (hidden_states[-2], reference `:160`)."""
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        hiddens = []
        for p in prompt:
            ids = self.tokenizer(p, add_special_tokens=True, truncation=True,
                                 padding=False)["input_ids"]
            if len(ids) == 0:
                bos = getattr(self.tokenizer, "bos_token_id", None)
                ids = [bos if bos is not None else 0]
            out = text_encoder(te_params, jnp.asarray(np.asarray([ids])),
                               output_hidden_states=True)
            hidden = out.hidden_states[-2][0]
            for _ in range(num_images_per_prompt):
                hiddens.append(hidden)
        return hiddens

    @staticmethod
    def _patchify_latents(latents: jax.Array) -> jax.Array:
        b, c, h, w = latents.shape
        latents = latents.reshape(b, c, h // 2, 2, w // 2, 2)
        latents = jnp.transpose(latents, (0, 1, 3, 5, 2, 4))
        return latents.reshape(b, c * 4, h // 2, w // 2)

    @staticmethod
    def _unpatchify_latents(latents: jax.Array) -> jax.Array:
        b, c, h, w = latents.shape
        latents = latents.reshape(b, c // 4, 2, 2, h, w)
        latents = jnp.transpose(latents, (0, 1, 4, 2, 5, 3))
        return latents.reshape(b, c // 4, h * 2, w * 2)

    @staticmethod
    def _pad_text(text_hiddens, text_in_dim: int):
        B = len(text_hiddens)
        lens = np.array([int(t.shape[0]) for t in text_hiddens], dtype=np.int64)
        t_max = int(lens.max()) if B else 0
        out = np.zeros((B, t_max, text_in_dim), dtype=np.float32)
        for i, t in enumerate(text_hiddens):
            out[i, : t.shape[0]] = np.asarray(t, dtype=np.float32)
        return jnp.asarray(out), jnp.asarray(lens)

    def _denoise(self, t_params, latents, text_bth, text_lens, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            tt = jnp.broadcast_to(t, (lat_in.shape[0],)).astype(lat.dtype)
            pred = transformer(t_params, lat_in, tt, text_bth, text_lens).sample
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = "",
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[list] = None,
        negative_prompt_embeds: Optional[list] = None,
        output_type: str = "pil",
        return_dict: bool = True,
        use_pe: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if prompt is None and prompt_embeds is None:
            raise ValueError("Must provide either `prompt` or `prompt_embeds`.")
        if height % self.vae_scale_factor != 0 or width % self.vae_scale_factor != 0:
            raise ValueError(f"Height and width must be divisible by {self.vae_scale_factor}")
        if isinstance(prompt, str):
            prompt = [prompt]

        revised_prompts = None
        if prompt is not None and use_pe and self.pe is not None:
            raise NotImplementedError(
                "Autoregressive prompt enhancement is not implemented; pass use_pe=False "
                "or pre-enhanced prompts."
            )

        batch_size = len(prompt) if prompt is not None else len(prompt_embeds)
        total_batch = batch_size * num_images_per_prompt
        do_cfg = guidance_scale > 1.0

        if negative_prompt is None:
            negative_prompt = ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * batch_size

        if prompt_embeds is not None:
            text_hiddens = [h for h in prompt_embeds for _ in range(num_images_per_prompt)]
        else:
            text_hiddens = self.encode_prompt(prompt, num_images_per_prompt)
        if do_cfg:
            if negative_prompt_embeds is not None:
                uncond = [h for h in negative_prompt_embeds for _ in range(num_images_per_prompt)]
            else:
                uncond = self.encode_prompt(negative_prompt, num_images_per_prompt)
            cfg_hiddens = list(uncond) + list(text_hiddens)
        else:
            cfg_hiddens = text_hiddens
        text_bth, text_lens = self._pad_text(cfg_hiddens, transformer.config.text_in_dim)

        latent_h = height // self.vae_scale_factor
        latent_w = width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (total_batch, transformer.config.in_channels, latent_h, latent_w), key=lat_key)

        sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg), callback_on_step_end,
            static=(float(guidance_scale), do_cfg))
        latents = denoise(t_params, latents, text_bth, text_lens, state.timesteps, state)

        if output_type == "latent":
            images = latents
        else:
            # BN-stat denorm (reference `:375`; hub config eps mismatch — use 1e-5)
            bn = vae_params["bn"]
            bn_mean = bn["running_mean"].reshape(1, -1, 1, 1).astype(latents.dtype)
            bn_std = jnp.sqrt(bn["running_var"].reshape(1, -1, 1, 1) + 1e-5).astype(latents.dtype)
            lat = latents * bn_std + bn_mean
            lat = self._unpatchify_latents(lat)
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            images = decode(vae_params, lat)
            images = self.image_processor.postprocess(images, output_type=output_type)

        if not return_dict:
            return (images,)
        return ErnieImagePipelineOutput(images=images, revised_prompts=revised_prompts)

"""JoyImage editing pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/joyimage/pipeline_joyimage_edit.py:104`
JoyImageEditPipeline): Qwen3-VL captioning template with 34-token prefix
drop and masked hidden-state repacking taken from the PRE-NORM last decoder
layer (`:180`), multi-item latents `[B, N, C, T, H', W']` where the first
N−1 slots are VAE-encoded reference images RESTORED at every step (`:718`)
and the transformer internally rolls the target slot to the front, CFG with
exact norm rescale clamped at 1e-6, Wan-VAE latent (de)normalization.

TPU-first: one scanned jit; the reference-slot restore is a static
`.at[:, :n_ref].set` inside the scan body.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class JoyImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class JoyImageEditPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["processor"]

    def __init__(self, transformer, vae, text_encoder, tokenizer, scheduler, processor=None):
        super().__init__()
        self.register_modules(transformer=transformer, vae=vae, text_encoder=text_encoder,
                              tokenizer=tokenizer, scheduler=scheduler, processor=processor)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8
        self.text_token_max_length = 512
        self.prompt_template_encode = (
            "<|im_start|>system\n \\nDescribe the image by detailing the color, shape, size, "
            "texture, quantity, text, spatial relationships of the objects and background:"
            "<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
        )
        self.prompt_template_encode_start_idx = 34

    def encode_prompt(self, prompt):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        drop_idx = self.prompt_template_encode_start_idx
        txts = [self.prompt_template_encode.format(p) for p in prompt]
        tk = self.tokenizer(txts, max_length=self.text_token_max_length + drop_idx,
                            padding=True, truncation=True, return_tensors="np")
        ids = np.asarray(tk["input_ids"])
        mask = np.asarray(tk["attention_mask"])
        # pre-norm last decoder layer output (reference `:180`)
        out = text_encoder(te_params, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                           output_hidden_states=True, normalize_last_hidden_state=False)
        hidden = np.asarray(out.hidden_states[-1])
        split = [hidden[b][mask[b].astype(bool)][drop_idx:] for b in range(hidden.shape[0])]
        L = max(s.shape[0] for s in split)
        embeds = np.zeros((len(split), L, hidden.shape[-1]), hidden.dtype)
        for b, seq in enumerate(split):
            embeds[b, : seq.shape[0]] = seq
        return jnp.asarray(embeds)

    def normalize_latents(self, latent: jax.Array) -> jax.Array:
        vae = self.vae[0]
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        return (latent - mean) / std

    def denormalize_latents(self, latent: jax.Array) -> jax.Array:
        vae = self.vae[0]
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        return latent * std + mean

    def prepare_latents(self, batch_size, num_channels_latents, height, width, key,
                        latents=None, image=None, enable_denormalization=True):
        vae, vae_params = self.vae
        lh = int(height) // self.vae_scale_factor_spatial
        lw = int(width) // self.vae_scale_factor_spatial
        shape = (batch_size, 1, num_channels_latents, 1, lh, lw)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        image_latents = None
        if image is not None:
            # image: [N_ref, C, H, W] in [-1, 1]
            img = jnp.asarray(np.asarray(image, np.float32))
            enc = vae.encode(vae_params, img[:, :, None])  # add frame axis
            lat = enc.mode() if hasattr(enc, "mode") else enc
            if enable_denormalization:
                lat = self.normalize_latents(lat)
            image_latents = jnp.broadcast_to(lat[None], (batch_size,) + lat.shape)
            latents = jnp.concatenate([image_latents, latents], axis=1)
        return latents, image_latents

    def _denoise(self, t_params, latents, image_latents, embeds, neg_embeds, timesteps,
                 state, guidance_scale, do_cfg, n_ref):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            if n_ref > 0:
                lat = lat.at[:, :n_ref].set(image_latents)
            tt = jnp.broadcast_to(t, (lat.shape[0],))
            pred = transformer(t_params, lat, tt, embeds).sample
            if do_cfg:
                uncond = transformer(t_params, lat, tt, neg_embeds).sample
                comb = uncond + guidance_scale * (pred - uncond)
                cond_norm = jnp.linalg.norm(pred, axis=2, keepdims=True)
                noise_norm = jnp.clip(jnp.linalg.norm(comb, axis=2, keepdims=True), 1e-6)
                pred = comb * (cond_norm / noise_norm)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        image=None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        sigmas: Optional[List[float]] = None,
        enable_denormalization: bool = True,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        batch_size = len(prompt)

        do_cfg = guidance_scale > 1.0
        embeds = self.encode_prompt(prompt)
        neg_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds = self.encode_prompt(negative_prompt)
            # pad to a common length for the scan
            L = max(embeds.shape[1], neg_embeds.shape[1])
            embeds = jnp.pad(embeds, ((0, 0), (0, L - embeds.shape[1]), (0, 0)))
            neg_embeds = jnp.pad(neg_embeds, ((0, 0), (0, L - neg_embeds.shape[1]), (0, 0)))

        num_channels_latents = transformer.config.in_channels
        key, lat_key = jax.random.split(key)
        latents, image_latents = self.prepare_latents(
            batch_size, num_channels_latents, height, width, lat_key, latents=latents,
            image=image, enable_denormalization=enable_denormalization)
        n_ref = 0 if image_latents is None else int(image_latents.shape[1])

        if sigmas is None:
            sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        image_seq_len = (latents.shape[-1] * latents.shape[-2]) // 4
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=list(sigmas), mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    n_ref=n_ref), callback_on_step_end,
            static=(float(guidance_scale), do_cfg, n_ref))
        latents = denoise(t_params, latents, image_latents, embeds, neg_embeds,
                          state.timesteps, state)

        if output_type == "latent":
            return JoyImagePipelineOutput(images=latents) if return_dict else (latents,)

        # decode only the TARGET slot (last item)
        target = latents[:, -1]
        if enable_denormalization:
            target = self.denormalize_latents(target)
        decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
        image_out = decode(vae_params, target)[:, :, 0]  # drop frame axis
        image_out = np.asarray(jnp.transpose(jnp.clip(image_out / 2 + 0.5, 0, 1), (0, 2, 3, 1)))
        if output_type == "pil":
            from ...image_processor import VaeImageProcessor
            image_out = VaeImageProcessor.numpy_to_pil(image_out)

        if not return_dict:
            return (image_out,)
        return JoyImagePipelineOutput(images=image_out)

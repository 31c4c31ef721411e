"""Z-Image text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/z_image/pipeline_z_image.py:141`
ZImagePipeline): Qwen3 chat-template prompt encoding taking
`hidden_states[-2]` with per-prompt validity compaction (`:202-250`),
linspace default sigmas (`:137`), dynamic-shift flow-match schedule, CFG in
the `pos + g * (pos - neg)` form with optional per-sample renormalization
and truncation of guidance to early steps (`:543-560`), negated velocity
into the scheduler (`:564`), AutoencoderKL decode with shift factor
(`:587`).

TPU-first: the per-item ragged captions are packed into dense masked
arrays host-side (see `transformer_z_image.py` docstring for the
equivalence argument), cond+uncond run as one doubled batch, and guidance
truncation is a per-step scalar multiplier array inside ONE scanned jitted
loop (g_t = 0 reproduces the reference's skipped-CFG step).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...models.transformers.transformer_z_image import _pad32
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class ZImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class ZImagePipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(
            scheduler=scheduler, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, transformer=transformer,
        )
        self.vae_scale_factor = (
            2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        )
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)

    def _encode_prompt(self, prompt: List[str], max_sequence_length: int = 512):
        """Returns (embeds [B,S,capdim] compacted to the row head, true lens)."""
        text_encoder, te_params = self.text_encoder
        templated = []
        for p in prompt:
            if hasattr(self.tokenizer, "apply_chat_template"):
                p = self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": p}],
                    tokenize=False, add_generation_prompt=True, enable_thinking=True,
                )
            templated.append(p)
        inputs = self.tokenizer(templated, padding="max_length", max_length=max_sequence_length,
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = np.asarray(inputs["attention_mask"]).astype(bool)
        out = text_encoder(te_params, ids, attention_mask=jnp.asarray(mask),
                           output_hidden_states=True)
        embeds = np.asarray(out.hidden_states[-2])
        lens = mask.sum(axis=1).astype(int)
        compact = np.zeros_like(embeds)
        for i in range(embeds.shape[0]):
            compact[i, : lens[i]] = embeds[i][mask[i]]
        return compact, lens

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 512):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, lens = self._encode_prompt(prompt, max_sequence_length)
        neg_embeds = neg_lens = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            neg_embeds, neg_lens = self._encode_prompt(negative_prompt, max_sequence_length)
        return embeds, lens, neg_embeds, neg_lens

    @staticmethod
    def _pack_captions(embeds: np.ndarray, lens: np.ndarray, cap_seq: int):
        """Dense caption block: valid rows, then attended learnable pads up to
        pad32(len_i) (inner mask), then key-masked batch padding."""
        b = embeds.shape[0]
        out = np.zeros((b, cap_seq, embeds.shape[-1]), dtype=embeds.dtype)
        attn = np.zeros((b, cap_seq), dtype=bool)
        inner = np.zeros((b, cap_seq), dtype=bool)
        for i, n in enumerate(lens):
            n = int(n)
            out[i, :n] = embeds[i, :n]
            attn[i, : _pad32(n)] = True
            inner[i, n: _pad32(n)] = True
        return out, attn, inner

    def _prep_text(self, prompt, negative_prompt, do_cfg, max_sequence_length):
        """encode_prompt + dense caption packing shared by all Z-Image variants.
        Returns (cap, cap_attn, cap_inner, all_lens, batch_size)."""
        embeds, lens, neg_embeds, neg_lens = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = embeds.shape[0]
        all_lens = list(lens) + (list(neg_lens) if do_cfg else [])
        cap_seq = _pad32(int(max(all_lens)))
        if do_cfg:
            packed = np.concatenate([embeds[:, :cap_seq], neg_embeds[:, :cap_seq]], axis=0)
            cap, cap_attn, cap_inner = self._pack_captions(packed, np.asarray(all_lens), cap_seq)
        else:
            cap, cap_attn, cap_inner = self._pack_captions(embeds[:, :cap_seq], lens, cap_seq)
        return cap, cap_attn, cap_inner, all_lens, batch_size

    def _schedule(self, num_inference_steps, sigmas, image_seq_len):
        """Dynamic-shift flow-match schedule (linspace default sigmas)."""
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if sigmas is None:
            sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        try:
            return self.scheduler.set_timesteps(num_inference_steps, sigmas=np.asarray(sigmas), mu=mu)
        except (TypeError, ValueError):
            return self.scheduler.set_timesteps(num_inference_steps)

    def _guidance_steps(self, timesteps, guidance_scale, cfg_truncation):
        t_norms = (1000.0 - np.asarray(timesteps)) / 1000.0
        return jnp.asarray(np.where(t_norms > float(cfg_truncation), 0.0, guidance_scale),
                           dtype=jnp.float32)

    def _encode_image_latents(self, image, height, width, batch_size):
        """VAE-argmax encode + latent normalize, batch-expanded."""
        vae, vae_params = self.vae
        img = self.image_processor.preprocess(image, height=height, width=width)
        img = jnp.asarray(img, dtype=jnp.float32)
        if img.shape[0] < batch_size:
            img = jnp.repeat(img, batch_size // img.shape[0], axis=0)
        lat = vae.encode(vae_params, img).mode()
        lat = (lat - vae.config.get("shift_factor", 0.0)) * vae.config.scaling_factor
        return lat

    def _decode(self, latents, output_type):
        vae, vae_params = self.vae
        lat = latents / vae.config.scaling_factor + vae.config.get("shift_factor", 0.0)
        image = vae.decode(vae_params, lat).sample
        return self.image_processor.postprocess(image, output_type=output_type)

    def _denoise(self, t_params, latents, cap, cap_attn, cap_inner, x_freqs, cap_freqs,
                 g_steps, timesteps, state, do_cfg, cfg_normalization):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate, g=None):
            t_norm = (1000.0 - t) / 1000.0
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            tt = jnp.broadcast_to(t_norm, (latent_in.shape[0],))
            pred = transformer(
                t_params, latent_in[:, :, None], tt, cap,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
            ).sample[:, :, 0]
            if do_cfg:
                pos, neg = jnp.split(pred.astype(jnp.float32), 2, axis=0)
                out = pos + g * (pos - neg)
                if cfg_normalization:
                    pos_norm = jnp.sqrt(jnp.sum(pos**2, axis=(1, 2, 3), keepdims=True))
                    new_norm = jnp.sqrt(jnp.sum(out**2, axis=(1, 2, 3), keepdims=True))
                    out = jnp.where(new_norm > pos_norm, out * (pos_norm / new_norm), out)
                pred = out
            return -pred.astype(latents.dtype)

        if do_cfg:
            def step_fn(carry, tg):
                lat, sstate = carry
                t, g = tg
                out = scheduler.step(sstate, forward(lat, t, sstate, g), t, lat)
                return (out.prev_sample, out.state), None

            (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, g_steps))
            return latents
        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        height = height or 1024
        width = width or 1024
        vae_scale = self.vae_scale_factor * 2
        if height % vae_scale or width % vae_scale:
            raise ValueError(f"height/width must be divisible by {vae_scale}")
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        cap, cap_attn, cap_inner, all_lens, batch_size = self._prep_text(
            prompt, negative_prompt, do_cfg, max_sequence_length)

        num_channels_latents = transformer.config.in_channels
        lh = 2 * (height // vae_scale)
        lw = 2 * (width // vae_scale)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        state = self._schedule(num_inference_steps, sigmas, (lh // 2) * (lw // 2))

        # per-step guidance with truncation (reference `:509-527`)
        g_steps = self._guidance_steps(state.timesteps, guidance_scale, cfg_truncation)

        x_freqs, cap_freqs = transformer.compute_freqs(
            tuple(int(n) for n in all_lens), (1, lh // 2, lw // 2), cap.shape[1])

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, do_cfg=do_cfg, cfg_normalization=bool(cfg_normalization)), callback_on_step_end,
            static=(do_cfg, bool(cfg_normalization)))
        latents = denoise(t_params, latents, jnp.asarray(cap), jnp.asarray(cap_attn),
                          jnp.asarray(cap_inner), x_freqs, cap_freqs, g_steps,
                          state.timesteps, state)

        image = latents if output_type == "latent" else self._decode(latents, output_type)
        if not return_dict:
            return (image,)
        return ZImagePipelineOutput(images=image)

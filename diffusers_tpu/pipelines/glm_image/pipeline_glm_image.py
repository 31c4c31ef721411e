"""GLM-Image text-to-image / image-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/glm_image/pipeline_glm_image.py:161`
GlmImagePipeline): an autoregressive GLM VLM generates discrete VQ "prior
tokens" for the target image (`generate_prior_tokens` `:321`, 2x nearest
upsampled to the DiT grid `:255`), quoted spans are ByT5-encoded per prompt
and flattened into a left-padded glyph stream (`:491`), condition images are
VAE-encoded and pushed through the DiT once at t=0 to build a per-layer KV
cache that the conditional branch reads and the uncond branch skips
(`:910-948`, `:1008-1018`), integer-timestep flow-match schedule with
sqrt-seq-len dynamic shift (`:68`), `timestep − 1` fed to the DiT, and
latents de-normalized by the VAE mean/std before decode.

TPU-first: the KV cache is built functionally (one `return_kv=True` forward
per condition image, concatenated per layer) and rides the denoise scan as
constants; cond/uncond run as separate calls inside one scan body since the
cache applies to the conditional branch only.

The AR `vision_language_encoder` + `processor` are host-side, duck-typed
components (transformers `GlmImageForConditionalGeneration`); precomputed
`prior_token_ids` can be passed to skip AR generation entirely.
"""

from __future__ import annotations

import re
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


def calculate_shift(image_seq_len, base_seq_len: int = 256, base_shift: float = 0.25,
                    max_shift: float = 0.75) -> float:
    """GLM-Image's sqrt-scaled dynamic shift (reference `:68`)."""
    return (image_seq_len / base_seq_len) ** 0.5 * max_shift + base_shift


@dataclass
class GlmImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class GlmImagePipeline(DiffusionPipeline):
    _optional_components = ["vision_language_encoder", "processor"]

    def __init__(self, tokenizer, processor, text_encoder, vision_language_encoder,
                 vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, processor=processor, text_encoder=text_encoder,
            vision_language_encoder=vision_language_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = (
            transformer[0].config.get("sample_size", 128) if transformer is not None else 128)

    # ------------------------------------------------------------------ prior
    @staticmethod
    def _upsample_token_ids(token_ids: np.ndarray, token_h: int, token_w: int) -> np.ndarray:
        """2x nearest upsample on the token grid (reference `:255`)."""
        grid = np.asarray(token_ids).reshape(token_h, token_w)
        return np.repeat(np.repeat(grid, 2, axis=0), 2, axis=1).reshape(1, -1)

    def generate_prior_tokens(self, prompt, height, width, image=None, seed: int = 0):
        """AR prior-token generation (reference `:321`); requires the
        host-side `vision_language_encoder` + `processor` components."""
        if self.vision_language_encoder is None or self.processor is None:
            raise ValueError(
                "`vision_language_encoder` and `processor` are required to generate prior "
                "tokens. Pass `prior_token_ids` directly to skip AR generation.")
        prompt_list = [prompt] if isinstance(prompt, str) else list(prompt)
        batch_size = len(prompt_list)
        is_t2i = image is None

        all_messages = []
        for idx, p in enumerate(prompt_list):
            content = []
            if not is_t2i:
                for img in image[idx]:
                    content.append({"type": "image", "image": img})
            content.append({"type": "text", "text": p})
            all_messages.append([{"role": "user", "content": content}])
        inputs = self.processor.apply_chat_template(
            all_messages, tokenize=True, padding=batch_size > 1, target_h=height,
            target_w=width, return_dict=True, return_tensors="np")

        grid_thw = np.asarray(inputs["image_grid_thw"])
        images_per_sample = inputs.get("images_per_sample")
        num_condition_images = 0 if is_t2i else len(image[0])
        num_grids = int(images_per_sample[0]) if images_per_sample is not None else grid_thw.shape[0]

        grids = grid_thw[:num_grids]
        sizes = [int(t * h * w) for t, h, w in grids]
        if not is_t2i:
            max_new_tokens = sizes[-1] + 1
            offset = 0
            token_h, token_w = int(grids[-1][1]), int(grids[-1][2])
        else:
            max_new_tokens = sum(sizes) + 1
            offset = sum(sizes[1:])
            token_h, token_w = int(grids[0][1]), int(grids[0][2])

        prior_token_image_ids_per_sample = None
        source_grid_thw_per_sample = None
        if not is_t2i:
            source_indices = []
            for s in range(batch_size):
                base = s * num_grids
                source_indices.extend(range(base, base + num_condition_images))
            source_grids = grid_thw[source_indices]
            embeds = self.vision_language_encoder.get_image_features(
                inputs["pixel_values"], source_grids)
            ids_d32 = np.asarray(self.vision_language_encoder.get_image_tokens(embeds, source_grids))
            split_sizes = np.cumsum([int(np.prod(g)) for g in source_grids])[:-1]
            upsampled = []
            for g, ids in zip(source_grids, np.split(ids_d32, split_sizes)):
                upsampled.append(self._upsample_token_ids(ids, int(g[1]), int(g[2])).reshape(-1))
            all_ids = np.concatenate(upsampled)
            up_grids = source_grids.copy()
            up_grids[:, 1] *= 2
            up_grids[:, 2] *= 2
            per_img = [int(np.prod(g)) for g in up_grids]
            source_grid_thw_per_sample = [
                up_grids[i * num_condition_images:(i + 1) * num_condition_images]
                for i in range(batch_size)]
            prior_token_image_ids_per_sample = []
            pos = 0
            for i in range(batch_size):
                n = sum(per_img[i * num_condition_images:(i + 1) * num_condition_images])
                prior_token_image_ids_per_sample.append(all_ids[pos:pos + n])
                pos += n

        outputs = np.asarray(self.vision_language_encoder.generate(
            **inputs, max_new_tokens=max_new_tokens, do_sample=True, seed=seed))
        max_input_length = np.asarray(inputs["input_ids"]).shape[-1]
        all_prior = []
        for idx in range(batch_size):
            gen = outputs[idx][max_input_length:]
            large = gen[offset:offset + token_h * token_w]
            all_prior.append(self._upsample_token_ids(large, token_h, token_w))
        prior_token_ids = np.concatenate(all_prior, axis=0)
        return prior_token_ids, prior_token_image_ids_per_sample, source_grid_thw_per_sample

    # ------------------------------------------------------------------ glyph
    @staticmethod
    def get_glyph_texts(prompt):
        if isinstance(prompt, str):
            prompt = [prompt]
        return [
            re.findall(r"'([^']*)'", p)
            + re.findall(r"“([^“”]*)”", p)
            + re.findall(r'"([^"]*)"', p)
            + re.findall(r"「([^「」]*)」", p)
            for p in prompt
        ]

    def _get_glyph_embeds(self, prompt, max_sequence_length: int = 2048):
        """ByT5 glyph stream: encode each quoted span, flatten valid tokens,
        left-pad across the batch (reference `:491`)."""
        text_encoder, te_params = self.text_encoder
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        all_embeds = []
        for glyph_texts in self.get_glyph_texts(prompt):
            if len(glyph_texts) == 0:
                glyph_texts = [""]
            enc = self.tokenizer(glyph_texts, max_length=max_sequence_length, truncation=True)
            input_ids = [list(ids) for ids in enc["input_ids"]]
            # even-count alignment quirk kept from the reference (`:514`)
            input_ids = [[pad_id] * ((len(input_ids) + 1) % 2) + ids for ids in input_ids]
            max_len = max(len(ids) for ids in input_ids)
            mask = np.array([[1] * len(ids) + [0] * (max_len - len(ids)) for ids in input_ids])
            ids = np.array([ids + [pad_id] * (max_len - len(ids)) for ids in input_ids])
            out = text_encoder(te_params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
            hidden = np.asarray(out.last_hidden_state)
            flat = hidden[mask.astype(bool)][None]  # [1, total_valid, D]
            all_embeds.append(flat)
        max_seq = max(e.shape[1] for e in all_embeds)
        padded = [
            np.concatenate([np.zeros((1, max_seq - e.shape[1], e.shape[2]), e.dtype), e], axis=1)
            for e in all_embeds
        ]
        return jnp.asarray(np.concatenate(padded, axis=0))

    def encode_prompt(self, prompt, do_cfg, max_sequence_length):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds = self._get_glyph_embeds(prompt, max_sequence_length)
        neg_embeds = None
        if do_cfg:
            neg_embeds = self._get_glyph_embeds([""] * len(prompt), max_sequence_length)
        return embeds, neg_embeds

    # ------------------------------------------------------------------ kv cache
    def _latent_stats(self):
        vae = self.vae[0]
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1)
        std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1)
        return mean, std

    def build_condition_kv_cache(self, t_params, images, prior_ids_per_sample,
                                 grids_per_sample, text_dim):
        """Functional 'write' pass (reference `:910-948`): encode each
        condition image at t=0 and collect the per-layer rope'd (k, v)."""
        transformer = self.transformer[0]
        vae, vae_params = self.vae
        mean, std = self._latent_stats()
        num_layers = len(transformer.transformer_blocks)
        # per-sample caches: list over batch of per-layer (k, v)
        per_sample = []
        for prompt_images, prior_ids, grids in zip(images, prior_ids_per_sample, grids_per_sample):
            split_sizes = np.cumsum([int(np.prod(g)) for g in grids])[:-1]
            ids_per_image = np.split(np.asarray(prior_ids), split_sizes)
            layer_kv = [None] * num_layers
            for img, ids in zip(prompt_images, ids_per_image):
                img = jnp.asarray(np.asarray(img, np.float32))
                if img.ndim == 3:
                    img = img[None]
                lat = vae.encode(vae_params, img)
                lat = lat.mode() if hasattr(lat, "mode") else lat
                lat = (lat - mean) / std
                ids_in = jnp.asarray(ids)[None]
                out = transformer(
                    t_params, lat, jnp.zeros((1, 0, text_dim), lat.dtype), ids_in,
                    jnp.zeros_like(ids_in, dtype=bool), jnp.zeros((1,)),
                    jnp.asarray([[img.shape[-2], img.shape[-1]]], jnp.float32),
                    jnp.zeros((1, 2)), return_kv=True)
                for li, (k, v) in enumerate(out.kv_cache):
                    if layer_kv[li] is None:
                        layer_kv[li] = (k, v)
                    else:
                        layer_kv[li] = (jnp.concatenate([layer_kv[li][0], k], axis=1),
                                        jnp.concatenate([layer_kv[li][1], v], axis=1))
            per_sample.append(layer_kv)
        # stack across batch per layer
        kv_cache = []
        for li in range(num_layers):
            k = jnp.concatenate([s[li][0] for s in per_sample], axis=0)
            v = jnp.concatenate([s[li][1] for s in per_sample], axis=0)
            kv_cache.append((k, v))
        return kv_cache

    # ------------------------------------------------------------------ denoise
    def _denoise(self, t_params, latents, embeds, neg_embeds, prior_token_ids,
                 target_size, crop_coords, rope, kv_cache, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        drop_cond = jnp.zeros_like(prior_token_ids, dtype=bool)
        drop_uncond = jnp.ones_like(prior_token_ids, dtype=bool)

        def forward(lat, t, sstate):
            tt = jnp.broadcast_to(t, (lat.shape[0],)) - 1.0
            cond = transformer(t_params, lat, embeds, prior_token_ids, drop_cond, tt,
                               target_size, crop_coords, kv_cache=kv_cache,
                               image_rotary_emb=rope).sample.astype(jnp.float32)
            if do_cfg:
                # uncond branch skips the condition-image cache (reference `:1018`)
                uncond = transformer(t_params, lat, neg_embeds, prior_token_ids, drop_uncond,
                                     tt, target_size, crop_coords, kv_cache=None,
                                     image_rotary_emb=rope).sample.astype(jnp.float32)
                return uncond + guidance_scale * (cond - uncond)
            return cond

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 1.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        prior_token_ids: Optional[jax.Array] = None,
        prior_token_image_ids: Optional[List] = None,
        source_image_grid_thw: Optional[List] = None,
        crops_coords_top_left=(0, 0),
        max_sequence_length: int = 2048,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor

        if isinstance(prompt, str):
            prompt = [prompt]
        batch_size = len(prompt) if prompt is not None else prompt_embeds.shape[0]

        # normalize image input to List[List[image]]
        normalized_image = None
        if image is not None and len(image) > 0:
            first = image[0]
            normalized_image = [list(image)] if not isinstance(first, (list, tuple)) else [
                list(imgs) for imgs in image]

        # 3. prior tokens (AR model or precomputed)
        if prior_token_ids is None:
            prior_token_ids, prior_token_image_ids, source_image_grid_thw = \
                self.generate_prior_tokens(prompt, height, width, image=normalized_image)
        prior_token_ids = jnp.asarray(np.asarray(prior_token_ids))

        do_cfg = guidance_scale > 1
        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(
                prompt, do_cfg, max_sequence_length)
        elif do_cfg and negative_prompt_embeds is None:
            _, negative_prompt_embeds = self.encode_prompt([""] * batch_size, True,
                                                           max_sequence_length)

        lh, lw = height // self.vae_scale_factor, width // self.vae_scale_factor
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, transformer.config.in_channels, lh, lw),
                                   key=lat_key)

        kv_cache = None
        if normalized_image is not None and prior_token_image_ids is not None:
            multiple_of = self.vae_scale_factor * transformer.config.patch_size

            def prep(img):
                if hasattr(img, "width"):  # PIL
                    ih, iw = img.height, img.width
                else:
                    arr = np.asarray(img)
                    ih, iw = arr.shape[-2], arr.shape[-1]
                ih = ih // multiple_of * multiple_of
                iw = iw // multiple_of * multiple_of
                return np.asarray(self.image_processor.preprocess(img, height=ih, width=iw))

            kv_cache = self.build_condition_kv_cache(
                t_params, [[prep(img) for img in imgs] for imgs in normalized_image],
                prior_token_image_ids, source_image_grid_thw,
                transformer.config.text_embed_dim)

        target_size = jnp.broadcast_to(jnp.asarray([[height, width]], jnp.float32), (batch_size, 2))
        crop_coords = jnp.broadcast_to(jnp.asarray([list(crops_coords_top_left)], jnp.float32),
                                       (batch_size, 2))
        rope = tuple(jnp.asarray(r) for r in transformer.rope(height // self.vae_scale_factor * 0
                                                              + lh, lw))

        # integer flow-match schedule with sqrt dynamic shift (reference `:962`)
        T = self.scheduler.config.num_train_timesteps
        ts = np.linspace(T, 1.0, num_inference_steps + 1)[:-1].astype(np.int64).astype(np.float32)
        sigmas = ts / T
        image_seq_len = (lh * lw) // transformer.config.patch_size**2
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("base_shift", 0.25),
            self.scheduler.config.get("max_shift", 0.75),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=list(sigmas), mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg), callback_on_step_end,
            static=(float(guidance_scale), do_cfg, kv_cache is None))
        latents = denoise(t_params, latents, prompt_embeds, negative_prompt_embeds,
                          prior_token_ids, target_size, crop_coords, rope, kv_cache,
                          state.timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            mean, std = self._latent_stats()
            decode = self._jit("decode", lambda p, z: vae.decode(p, z * std + mean).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return GlmImagePipelineOutput(images=image_out)

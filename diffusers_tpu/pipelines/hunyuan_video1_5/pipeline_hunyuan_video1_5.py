"""HunyuanVideo 1.5 text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuan_video1_5/pipeline_hunyuan_video1_5.py:166`
HunyuanVideo15Pipeline): Qwen2.5-VL chat-template prompt encoding with the
108-token system prefix drop and skip-layer 2 (`:241`), per-prompt ByT5
glyph encoding of quote-extracted spans with all-zeros fallback (`:289`),
zero cond-latent + zero mask channels concatenated to the latents for pure
t2v (`:508`), all-zero image embeds `[B, 729, image_embed_dim]` signalling
t2v to the transformer (`:719`), guider-driven CFG, linspace sigmas
`[1, 0)` (`:706`), decode at `latents / scaling_factor`.

TPU-first: cond/uncond fold into one doubled batch inside ONE jitted scan;
the crop-size bucket selection for the default resolution runs on host.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)

DEFAULT_SYSTEM_MESSAGE = (
    "You are a helpful assistant. Describe the video by detailing the following aspects: "
    "        1. The main content and theme of the video. "
    "        2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects. "
    "        3. Actions, events, behaviors temporal relationships, physical movement changes of the objects. "
    "        4. background environment, light, style and atmosphere. "
    "        5. camera angles, movements, and transitions used in the video."
)


def extract_glyph_texts(prompt: str) -> Optional[str]:
    """Quoted spans -> ByT5 glyph prompt (reference `:83`)."""
    matches = re.findall(r"\"(.*?)\"|“(.*?)”", prompt)
    result = [m[0] or m[1] for m in matches]
    if len(result) > 1:
        result = list(dict.fromkeys(result))
    if not result:
        return None
    return ". ".join([f'Text "{t}"' for t in result]) + ". "


def generate_crop_size_list(base_size: int = 256, patch_size: int = 16, max_ratio: float = 4.0):
    """Aspect-ratio buckets around a target area (reference image_processor `:22`)."""
    num_patches = round((base_size / patch_size) ** 2)
    crop_size_list = []
    wp, hp = num_patches, 1
    while wp > 0:
        if max(wp, hp) / min(wp, hp) <= max_ratio:
            crop_size_list.append((wp * patch_size, hp * patch_size))
        if (hp + 1) * wp <= num_patches:
            hp += 1
        else:
            wp -= 1
    return crop_size_list


def calculate_default_height_width(height: int, width: int, target_size: int, patch_size: int):
    """Snap an aspect ratio to the closest crop bucket (reference image_processor `:98`)."""
    buckets = generate_crop_size_list(base_size=target_size, patch_size=patch_size)
    ratios = np.array([round(float(h) / float(w), 5) for h, w in buckets])
    aspect = float(height) / float(width)
    diff = ratios - aspect
    if aspect >= 1:
        candidates = [(i, d) for i, d in enumerate(diff) if d <= 0]
    else:
        candidates = [(i, d) for i, d in enumerate(diff) if d >= 0]
    idx = min(candidates, key=lambda p: abs(p[1]))[0]
    return buckets[idx]


@dataclass
class HunyuanVideo15PipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class HunyuanVideo15Pipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["guider"]

    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler,
                 text_encoder_2, tokenizer_2, guider=None):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            scheduler=scheduler, text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
            guider=guider,
        )
        self.vae_scale_factor_temporal = vae[0].config.temporal_compression_ratio if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.spatial_compression_ratio if vae is not None else 16
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)
        self.target_size = transformer[0].config.target_size if transformer is not None else 640
        self.vision_states_dim = transformer[0].config.image_embed_dim if transformer is not None else 1152
        self.num_channels_latents = vae[0].config.latent_channels if vae is not None else 32
        self.system_message = DEFAULT_SYSTEM_MESSAGE
        self.prompt_template_encode_start_idx = 108
        self.tokenizer_max_length = 1000
        self.tokenizer_2_max_length = 256
        self.vision_num_semantic_tokens = 729
        self.default_aspect_ratio = (16, 9)

    def _get_mllm_prompt_embeds(self, prompt: List[str], num_hidden_layers_to_skip: int = 2):
        text_encoder, te_params = self.text_encoder
        crop_start = self.prompt_template_encode_start_idx
        max_len = self.tokenizer_max_length + crop_start
        # chat template with generation prompt (reference `:262`); fall back to
        # the equivalent Qwen2 template string when the tokenizer has none
        conversations = [
            [{"role": "system", "content": self.system_message},
             {"role": "user", "content": p if p else " "}] for p in prompt
        ]
        try:
            inputs = self.tokenizer.apply_chat_template(
                conversations, add_generation_prompt=True, tokenize=True, return_dict=True,
                padding="max_length", max_length=max_len, truncation=True, return_tensors="np")
        except Exception:
            txts = [
                f"<|im_start|>system\n{self.system_message}<|im_end|>\n"
                f"<|im_start|>user\n{p if p else ' '}<|im_end|>\n<|im_start|>assistant\n"
                for p in prompt
            ]
            inputs = self.tokenizer(txts, max_length=max_len, padding="max_length",
                                    truncation=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        embeds = out.hidden_states[-(num_hidden_layers_to_skip + 1)]
        return embeds[:, crop_start:], mask[:, crop_start:]

    def _get_byt5_prompt_embeds(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder_2
        max_len = self.tokenizer_2_max_length
        d2 = self.text_encoder_2[0].config.get("d_model", 1472)
        embeds_list, mask_list = [], []
        for p in prompt:
            glyph = extract_glyph_texts(p)
            if glyph is None:
                embeds_list.append(jnp.zeros((1, max_len, d2), jnp.float32))
                mask_list.append(jnp.zeros((1, max_len), jnp.int32))
            else:
                tk = self.tokenizer_2(glyph, padding="max_length", max_length=max_len,
                                      truncation=True, add_special_tokens=True, return_tensors="np")
                ids = np.atleast_2d(np.asarray(tk["input_ids"]))
                m = np.atleast_2d(np.asarray(tk["attention_mask"]))
                out = text_encoder(te_params, jnp.asarray(ids), attention_mask=jnp.asarray(m))
                embeds_list.append(out.last_hidden_state)
                mask_list.append(jnp.asarray(m))
        return jnp.concatenate(embeds_list), jnp.concatenate(mask_list)

    def encode_prompt(self, prompt: Union[str, List[str]]):
        if prompt is None:
            prompt = [""]
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, mask = self._get_mllm_prompt_embeds(prompt)
        embeds_2, mask_2 = self._get_byt5_prompt_embeds(prompt)
        return embeds, mask, embeds_2, mask_2

    def _denoise(self, t_params, latents, cond_latents, mask_latents, image_embeds,
                 embeds, mask, embeds_2, mask_2, neg_embeds, neg_mask, neg_embeds_2,
                 neg_mask_2, timesteps, state, guider, do_cfg):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        n_steps = timesteps.shape[0]

        def forward(lat, t, sstate, step=None):
            hidden = jnp.concatenate([lat, cond_latents, mask_latents], axis=1)
            if do_cfg:
                hidden = jnp.concatenate([hidden, hidden], axis=0)
                tt = jnp.broadcast_to(t, (hidden.shape[0],)).astype(lat.dtype)
                pred = transformer(
                    t_params, hidden, tt,
                    jnp.concatenate([embeds, neg_embeds]), jnp.concatenate([mask, neg_mask]),
                    encoder_hidden_states_2=jnp.concatenate([embeds_2, neg_embeds_2]),
                    encoder_attention_mask_2=jnp.concatenate([mask_2, neg_mask_2]),
                    image_embeds=jnp.concatenate([image_embeds, image_embeds]),
                ).sample
                cond, uncond = jnp.split(pred, 2, axis=0)
                return guider(cond, uncond, step=step, num_steps=n_steps)
            tt = jnp.broadcast_to(t, (lat.shape[0],)).astype(lat.dtype)
            return transformer(
                t_params, hidden, tt, embeds, mask,
                encoder_hidden_states_2=embeds_2, encoder_attention_mask_2=mask_2,
                image_embeds=image_embeds,
            ).sample

        if do_cfg:
            scheduler = self.scheduler

            def step_fn(carry, ts):
                lat, sstate = carry
                t, step = ts
                s = scheduler.step(sstate, forward(lat, t, sstate, step=step), t, lat)
                return (s.prev_sample, s.state), None

            (latents, _), _ = jax.lax.scan(
                step_fn, (latents, state), (timesteps, jnp.arange(n_steps)))
            return latents
        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def prepare_cond_latents_and_mask(self, latents):
        """Zero conditioning channels for pure t2v (reference `:508`)."""
        b, c, f, h, w = latents.shape
        return jnp.zeros_like(latents), jnp.zeros((b, 1, f, h, w), latents.dtype)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: int = 121,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: Optional[float] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if height is None and width is None:
            height, width = calculate_default_height_width(
                self.default_aspect_ratio[1], self.default_aspect_ratio[0],
                self.target_size, self.vae_scale_factor_spatial)

        embeds, mask, embeds_2, mask_2 = self.encode_prompt(prompt)
        batch_size = embeds.shape[0]

        guider = self.guider
        if guider is None and guidance_scale is not None and guidance_scale > 1.0:
            from ...guiders import ClassifierFreeGuidance
            guider = ClassifierFreeGuidance(guidance_scale=guidance_scale)
        do_cfg = guider is not None and getattr(guider, "num_conditions", 1) > 1

        neg_embeds = neg_mask = neg_embeds_2 = neg_mask_2 = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_mask, neg_embeds_2, neg_mask_2 = self.encode_prompt(negative_prompt)

        if sigmas is None:
            sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=np.asarray(sigmas))
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = int(height) // self.vae_scale_factor_spatial
        lw = int(width) // self.vae_scale_factor_spatial
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (batch_size, self.num_channels_latents, num_latent_frames, lh, lw), key=lat_key)
        cond_latents, mask_latents = self.prepare_cond_latents_and_mask(latents)
        image_embeds = jnp.zeros(
            (batch_size, self.vision_num_semantic_tokens, self.vision_states_dim), latents.dtype)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guider=guider, do_cfg=do_cfg), callback_on_step_end,
            static=(id(guider), do_cfg))
        latents = denoise(t_params, latents, cond_latents, mask_latents, image_embeds,
                          embeds, mask, embeds_2, mask_2, neg_embeds, neg_mask,
                          neg_embeds_2, neg_mask_2, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            video = decode(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return HunyuanVideo15PipelineOutput(frames=video)

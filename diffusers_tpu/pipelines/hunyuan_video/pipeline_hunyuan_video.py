"""HunyuanVideo text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuan_video/pipeline_hunyuan_video.py:166`
HunyuanVideoPipeline: llava prompt template + crop_start `:202-254`, CLIP
pooled `:296`, distilled guidance ×1000 `:659`, optional true CFG `:584`,
linspace sigmas `:636`).

TPU-first: Llama encode once host-side → ONE scanned jitted flow-match loop
(embedded distilled guidance; optional true-CFG as a second transformer call
inside the same scan) → causal 3D VAE decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

DEFAULT_PROMPT_TEMPLATE = {
    "template": (
        "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing the following aspects: "
        "1. The main content and theme of the video."
        "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
        "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
        "4. background environment, light, style and atmosphere."
        "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    ),
    "crop_start": 95,
}


@dataclass
class HunyuanVideoPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class HunyuanVideoPipeline(DiffusionPipeline):
    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler,
                 text_encoder_2, tokenizer_2):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            scheduler=scheduler, text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
        )
        self.vae_scale_factor_temporal = vae[0].config.temporal_compression_ratio if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.spatial_compression_ratio if vae is not None else 8

    def _get_llama_prompt_embeds(self, prompt: List[str], prompt_template: Dict[str, Any],
                                 max_sequence_length: int = 256, num_hidden_layers_to_skip: int = 2):
        text_encoder, te_params = self.text_encoder
        prompt = [prompt_template["template"].format(p) for p in prompt]
        crop_start = prompt_template.get("crop_start", None)
        if crop_start is None:
            template_ids = self.tokenizer(prompt_template["template"], padding="max_length",
                                          max_length=max_sequence_length, truncation=False,
                                          return_tensors="np").input_ids
            crop_start = template_ids.shape[-1] - 2  # reference :227-229

        max_len = max_sequence_length + crop_start
        inputs = self.tokenizer(prompt, padding="max_length", max_length=max_len,
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(getattr(inputs, "attention_mask", np.ones_like(inputs.input_ids)))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        prompt_embeds = out.hidden_states[-(num_hidden_layers_to_skip + 1)]
        return prompt_embeds[:, crop_start:], mask[:, crop_start:]

    def _get_clip_prompt_embeds(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder_2
        inputs = self.tokenizer_2(prompt, padding="max_length", max_length=77,
                                  truncation=True, return_tensors="np")
        out = text_encoder(te_params, jnp.asarray(inputs.input_ids))
        return out.pooler_output

    def encode_prompt(self, prompt, prompt_2=None, prompt_template=DEFAULT_PROMPT_TEMPLATE,
                      max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_2 = prompt_2 or prompt
        if isinstance(prompt_2, str):
            prompt_2 = [prompt_2]
        prompt_embeds, prompt_mask = self._get_llama_prompt_embeds(prompt, prompt_template, max_sequence_length)
        pooled = self._get_clip_prompt_embeds(prompt_2)
        return prompt_embeds, pooled, prompt_mask

    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig")

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, pooled, guidance,
                 neg_embeds, neg_mask, neg_pooled, rope_cos, rope_sin, timesteps, state,
                 true_cfg_scale, do_true_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            noise_pred = transformer(
                t_params, latents, timestep, prompt_embeds, prompt_mask, pooled,
                guidance=guidance, image_rotary_emb=(rope_cos, rope_sin),
            ).sample
            if do_true_cfg:
                neg_pred = transformer(
                    t_params, latents, timestep, neg_embeds, neg_mask, neg_pooled,
                    guidance=guidance, image_rotary_emb=(rope_cos, rope_sin),
                ).sample
                noise_pred = neg_pred + true_cfg_scale * (noise_pred - neg_pred)
            return noise_pred

        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        true_cfg_scale: float = 1.0,
        guidance_scale: float = 6.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_template: Dict[str, Any] = DEFAULT_PROMPT_TEMPLATE,
        max_sequence_length: int = 256,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        prompt_embeds, pooled, prompt_mask = self.encode_prompt(
            prompt, prompt_2, prompt_template, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        do_true_cfg = true_cfg_scale > 1.0 and negative_prompt is not None
        neg_embeds = neg_pooled = neg_mask = None
        if do_true_cfg:
            neg_embeds, neg_pooled, neg_mask = self.encode_prompt(
                negative_prompt, None, prompt_template, max_sequence_length
            )

        num_channels_latents = transformer.config.in_channels
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            latents = randn_tensor((batch_size, num_channels_latents, num_latent_frames, lh, lw), key=key)

        if sigmas is None:
            sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))

        guidance = jnp.full((batch_size,), guidance_scale * 1000.0, dtype=jnp.float32)
        rope_cos, rope_sin = transformer.rope(num_latent_frames, lh, lw)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, true_cfg_scale=true_cfg_scale, do_true_cfg=do_true_cfg), callback_on_step_end,
            static=(true_cfg_scale, do_true_cfg))
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, pooled, guidance,
                          neg_embeds, neg_mask, neg_pooled,
                          jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample
            )
            video = decode(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return HunyuanVideoPipelineOutput(frames=video)

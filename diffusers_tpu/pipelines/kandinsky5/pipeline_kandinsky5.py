"""Kandinsky 5.0 text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/kandinsky5/pipeline_kandinsky.py:138`
Kandinsky5T2VPipeline): Qwen2.5-VL prompt encoding through a video chat
template whose 129-token system prefix is dropped (`:190-201,:376`), CLIP
pooled embedding (`:383`), channels-last `[B, F, H', W', C]` latents
(`:599`), resolution-dependent RoPE scale factor (`:209`), velocity CFG with
separately-encoded negative prompt (two forwards — cond/uncond sequence
lengths differ), HunyuanVideo causal 3D VAE decode (`:946-963`).

TPU-first: rope tables precomputed host-side once, ONE scanned jitted
flow-match loop through the shared `denoise_scan` cache plumbing.
"""

from __future__ import annotations

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

T2V_PROMPT_TEMPLATE = "\n".join(
    [
        "<|im_start|>system\nYou are a promt engineer. Describe the video in detail.",
        "Describe how the camera moves or shakes, describe the zoom and view angle, whether it follows the objects.",
        "Describe the location of the video, main characters or objects and their action.",
        "Describe the dynamism of the video and presented actions.",
        "Name the visual style of the video: whether it is a professional footage, user generated content, some kind of animation, video game or scren content.",
        "Describe the visual effects, postprocessing and transitions if they are presented in the video.",
        "Pay attention to the order of key actions shown in the scene.<|im_end|>",
        "<|im_start|>user\n{}<|im_end|>",
    ]
)
T2V_TEMPLATE_START_IDX = 129


@dataclass
class KandinskyPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class Kandinsky5T2VPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2, scheduler):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2, scheduler=scheduler,
        )
        self.prompt_template = T2V_PROMPT_TEMPLATE
        self.prompt_template_encode_start_idx = T2V_TEMPLATE_START_IDX
        self.vae_scale_factor_temporal = vae[0].config.get("temporal_compression_ratio", 4) if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.get("spatial_compression_ratio", 8) if vae is not None else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    @staticmethod
    def _get_scale_factor(height: int, width: int) -> tuple:
        """Resolution-dependent RoPE scale (reference `:209`)."""
        if 480 <= height <= 854 and 480 <= width <= 854:
            return (1.0, 2.0, 2.0)
        return (1.0, 3.16, 3.16)

    def _encode_prompt_qwen(self, prompt: List[str], max_sequence_length: int = 256):
        text_encoder, te_params = self.text_encoder
        drop_idx = self.prompt_template_encode_start_idx
        txt = [self.prompt_template.format(p) for p in prompt]
        inputs = self.tokenizer(
            text=txt, max_length=drop_idx + max_sequence_length,
            truncation=True, padding="longest", return_tensors="np",
        )
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
        embeds = out.hidden_states[-1][:, drop_idx:]
        return embeds, mask[:, drop_idx:]

    def _encode_prompt_clip(self, prompt: List[str]):
        text_encoder, te_params = self.text_encoder_2
        inputs = self.tokenizer_2(prompt, max_length=77, truncation=True,
                                  padding="max_length", return_tensors="np")
        out = text_encoder(te_params, jnp.asarray(inputs.input_ids))
        return out.pooler_output

    def encode_prompt(self, prompt, max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds_qwen, mask = self._encode_prompt_qwen(prompt, max_sequence_length)
        embeds_clip = self._encode_prompt_clip(prompt)
        return embeds_qwen, embeds_clip, mask

    def _denoise(self, t_params, latents, embeds_qwen, embeds_clip, neg_qwen, neg_clip,
                 visual_rope, text_rope, neg_text_rope, timesteps, state,
                 guidance_scale, do_cfg, num_channels_latents):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            timestep = jnp.broadcast_to(t, (latents.shape[0],)).astype(latents.dtype)
            pred = transformer(
                t_params, latents, embeds_qwen, timestep, embeds_clip,
                visual_rope=visual_rope, text_rope=text_rope,
            ).sample
            if do_cfg:
                uncond = transformer(
                    t_params, latents, neg_qwen, timestep, neg_clip,
                    visual_rope=visual_rope, text_rope=neg_text_rope,
                ).sample
                pred = uncond + guidance_scale * (pred - uncond)
            return pred

        if latents.shape[-1] == num_channels_latents:
            return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                                getattr(self, "_cache_config", None), pipe=self)

        # visual-cond layout: only the first C channels are denoised (reference `:944`)
        def step_fn(carry, t):
            latents, sstate = carry
            pred = forward(latents, t, sstate)
            out = self.scheduler.step(sstate, pred, t, latents[..., :num_channels_latents])
            latents = jnp.concatenate([out.prev_sample, latents[..., num_channels_latents:]], axis=-1)
            return (latents, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 768,
        num_frames: int = 121,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)

        if num_frames % self.vae_scale_factor_temporal != 1:
            logger.warning(f"`num_frames - 1` has to be divisible by {self.vae_scale_factor_temporal}. Rounding.")
            num_frames = num_frames // self.vae_scale_factor_temporal * self.vae_scale_factor_temporal + 1
        num_frames = max(num_frames, 1)

        do_cfg = guidance_scale > 1.0
        embeds_qwen, embeds_clip, _ = self.encode_prompt(prompt, max_sequence_length)
        batch_size = embeds_qwen.shape[0]
        neg_qwen = neg_clip = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_qwen, neg_clip, _ = self.encode_prompt(negative_prompt, max_sequence_length)

        num_channels_latents = transformer.config.in_visual_dim
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_latent_frames, lh, lw, num_channels_latents), key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)

        scale_factor = self._get_scale_factor(height, width)
        visual_rope, text_rope = transformer.compute_rope(
            num_latent_frames, lh, lw, scale_factor, text_rope_len=embeds_qwen.shape[1]
        )
        neg_text_rope = None
        if do_cfg:
            neg_text_rope = transformer.compute_rope(num_latent_frames, lh, lw, scale_factor,
                                                     text_rope_len=neg_qwen.shape[1])[1]

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    num_channels_latents=num_channels_latents), callback_on_step_end,
            static=(guidance_scale, do_cfg, num_channels_latents))
        latents = denoise(t_params, latents, embeds_qwen, embeds_clip, neg_qwen, neg_clip,
                          visual_rope, text_rope, neg_text_rope, state.timesteps, state)

        latents = latents[..., :num_channels_latents]
        if output_type == "latent":
            video = latents
        else:
            vae, vae_params = self.vae
            lat = jnp.transpose(latents, (0, 4, 1, 2, 3))  # [B, C, F, H', W']
            lat = lat / vae.config.scaling_factor
            video = vae.decode(vae_params, lat).sample
            video = self.video_processor.postprocess_video(video, output_type=output_type)

        if not return_dict:
            return (video,)
        return KandinskyPipelineOutput(frames=video)

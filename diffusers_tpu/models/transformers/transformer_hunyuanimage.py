"""HunyuanImageTransformer2DModel — HunyuanImage-2.1 dual/single-stream DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_hunyuanimage.py:617`):
the dual-stream and single-stream blocks, token refiner and AdaNorm output
are structurally identical to HunyuanVideo's (same submodule names) and are
reused from `transformer_hunyuan_video.py`; what differs is the 2D (or 3D)
patch embed (`:157`), the 2-axis RoPE (`:414`), the combined time+guidance
embedding without a pooled-text term (`:217`, guidance reuses the same
`time_proj`; optional meanflow `timestep_r` averaging), and the optional
ByT5 glyph text stream (`:181` projection) whose tokens are merged with the
MLLM stream as [valid_byt5, valid_mllm, invalid_byt5, invalid_mllm]
(`:814-848`).

TPU-first: the reference's per-item python-loop compaction of the merged
text streams is a stable argsort over group keys — fully traceable inside
jit, no host round-trip.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_hunyuan_video import (
    HunyuanVideoSingleTransformerBlock,
    HunyuanVideoTokenRefiner,
    HunyuanVideoTransformerBlock,
)


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class HunyuanImagePatchEmbed(Module):
    def __init__(self, patch_size, in_chans: int, embed_dim: int):
        super().__init__()
        self.ndim = len(patch_size)
        conv = Conv2d if self.ndim == 2 else Conv3d
        self.proj = conv(in_chans, embed_dim, kernel_size=tuple(patch_size), stride=tuple(patch_size))

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        # NC(F)HW -> N(F)HWC conv -> [B, N, C]
        perm = (0, 2, 3, 1) if self.ndim == 2 else (0, 2, 3, 4, 1)
        x = jnp.transpose(hidden_states, perm)
        x = self.proj(params["proj"], x)
        return x.reshape(x.shape[0], -1, x.shape[-1])


class HunyuanImageByT5TextProjection(Module):
    """LayerNorm -> 3-layer GELU MLP (reference `:181`)."""

    def __init__(self, in_features: int, hidden_size: int, out_features: int):
        super().__init__()
        self.norm = LayerNorm(in_features)
        self.linear_1 = Linear(in_features, hidden_size)
        self.linear_2 = Linear(hidden_size, hidden_size)
        self.linear_3 = Linear(hidden_size, out_features)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.norm(params["norm"], x)
        x = jax.nn.gelu(self.linear_1(params["linear_1"], x), approximate=False)
        x = jax.nn.gelu(self.linear_2(params["linear_2"], x), approximate=False)
        return self.linear_3(params["linear_3"], x)


class HunyuanImageCombinedTimeGuidanceEmbedding(Module):
    def __init__(self, embedding_dim: int, guidance_embeds: bool = False, use_meanflow: bool = False):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.use_meanflow = use_meanflow
        if use_meanflow:
            self.time_proj_r = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
            self.timestep_embedder_r = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.guidance_embedder = (
            TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim) if guidance_embeds else None
        )

    def __call__(self, params: Params, timestep: jax.Array, timestep_r: Optional[jax.Array] = None,
                 guidance: Optional[jax.Array] = None) -> jax.Array:
        dtype = params["timestep_embedder"]["linear_1"]["kernel"].dtype
        temb = self.timestep_embedder(params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype))
        if timestep_r is not None:
            temb_r = self.timestep_embedder_r(
                params["timestep_embedder_r"], self.time_proj({}, timestep_r).astype(dtype))
            temb = (temb + temb_r) / 2
        if self.guidance_embedder is not None:
            temb = temb + self.guidance_embedder(
                params["guidance_embedder"], self.time_proj({}, guidance).astype(dtype))
        return temb


def _merge_text_streams(text, text_mask, text_2, text_mask_2):
    """[valid_byt5, valid_mllm, invalid_byt5, invalid_mllm] via stable argsort
    (reference `:814-848` does this with per-item boolean compaction)."""
    combined = jnp.concatenate([text_2, text], axis=1)
    mask = jnp.concatenate([text_mask_2.astype(bool), text_mask.astype(bool)], axis=1)
    s2 = text_2.shape[1]
    is_mllm = (jnp.arange(combined.shape[1]) >= s2)[None, :]
    group = jnp.where(mask, 0, 2) + is_mllm.astype(jnp.int32)
    order = jnp.argsort(group, axis=1, stable=True)
    merged = jnp.take_along_axis(combined, order[..., None], axis=1)
    merged_mask = jnp.take_along_axis(mask, order, axis=1)
    return merged, merged_mask


class HunyuanImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 64,
        out_channels: int = 64,
        num_attention_heads: int = 28,
        attention_head_dim: int = 128,
        num_layers: int = 20,
        num_single_layers: int = 40,
        num_refiner_layers: int = 2,
        mlp_ratio: float = 4.0,
        patch_size: Tuple[int, ...] = (1, 1),
        qk_norm: str = "rms_norm",
        guidance_embeds: bool = False,
        text_embed_dim: int = 3584,
        text_embed_2_dim: Optional[int] = None,
        rope_theta: float = 256.0,
        rope_axes_dim: Tuple[int, ...] = (64, 64),
        use_meanflow: bool = False,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = out_channels or in_channels

        self.x_embedder = HunyuanImagePatchEmbed(tuple(patch_size), in_channels, inner_dim)
        self.context_embedder = HunyuanVideoTokenRefiner(
            text_embed_dim, num_attention_heads, attention_head_dim, num_layers=num_refiner_layers
        )
        self.context_embedder_2 = (
            HunyuanImageByT5TextProjection(text_embed_2_dim, 2048, inner_dim)
            if text_embed_2_dim is not None else None
        )
        self.time_guidance_embed = HunyuanImageCombinedTimeGuidanceEmbedding(
            inner_dim, guidance_embeds, use_meanflow)

        self.transformer_blocks = ModuleList(
            [HunyuanVideoTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
             for _ in range(num_layers)])
        self.single_transformer_blocks = ModuleList(
            [HunyuanVideoSingleTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
             for _ in range(num_single_layers)])
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, math.prod(patch_size) * self.out_channels)

    def rope(self, *sizes: int):
        """Host-side RoPE tables over the post-patchify grid (reference `:414`)."""
        post = [d // p for d, p in zip(sizes, self.config.patch_size)]
        grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32) for s in post], indexing="ij"), axis=0)
        cos_out, sin_out = [], []
        for i in range(len(post)):
            cos, sin = get_1d_rotary_pos_embed_np(
                self.config.rope_axes_dim[i], grid[i].reshape(-1), theta=self.config.rope_theta)
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W] (or [B, C, F, H, W])
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S1, text_embed_dim]
        encoder_attention_mask: jax.Array,  # [B, S1]
        timestep_r: Optional[jax.Array] = None,
        encoder_hidden_states_2: Optional[jax.Array] = None,
        encoder_attention_mask_2: Optional[jax.Array] = None,
        guidance: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size = hidden_states.shape[0]
        sizes = hidden_states.shape[2:]
        post = tuple(d // p for d, p in zip(sizes, self.config.patch_size))

        if image_rotary_emb is None:
            cos, sin = self.rope(*sizes)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        temb = self.time_guidance_embed(params["time_guidance_embed"], timestep, timestep_r, guidance)
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        encoder_hidden_states = self.context_embedder(
            params["context_embedder"], encoder_hidden_states, timestep, encoder_attention_mask)

        text_mask = encoder_attention_mask.astype(bool)
        if self.context_embedder_2 is not None and encoder_hidden_states_2 is not None:
            encoder_hidden_states_2 = self.context_embedder_2(
                params["context_embedder_2"], encoder_hidden_states_2)
            encoder_hidden_states, text_mask = _merge_text_streams(
                encoder_hidden_states, text_mask, encoder_hidden_states_2, encoder_attention_mask_2)

        img_len = hidden_states.shape[1]
        img_valid = jnp.ones((batch_size, img_len), dtype=bool)
        attention_mask = jnp.concatenate([img_valid, text_mask], axis=1)[:, None, None, :]

        for i, block in enumerate(self.transformer_blocks):
            hidden_states, encoder_hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                attention_mask, image_rotary_emb)
        for i, block in enumerate(self.single_transformer_blocks):
            hidden_states, encoder_hidden_states = block(
                params["single_transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                attention_mask, image_rotary_emb)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        # unpatchify (reference `:898-917`)
        p = self.config.patch_size
        hidden_states = hidden_states.reshape(batch_size, *post, self.out_channels, *p)
        ndim = len(post)
        perm = [0, ndim + 1]
        for i in range(ndim):
            perm.extend([i + 1, ndim + 2 + i])
        hidden_states = jnp.transpose(hidden_states, perm)
        hidden_states = hidden_states.reshape(
            batch_size, self.out_channels, *[a * b for a, b in zip(post, p)])

        if not return_dict:
            return (hidden_states,)
        return Transformer2DModelOutput(sample=hidden_states)

"""HunyuanVideo15Transformer3DModel — HunyuanVideo 1.5 dual-stream DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_hunyuan_video15.py:510`):
the dual-stream MMDiT block (`:431`) and token refiner (`:312`) are
structurally identical to HunyuanVideo's and are reused from
`transformer_hunyuan_video.py`; what is new is the 3D patch embed, the
summed meanflow time embedding (`:175` — `t_emb + r_emb`, NOT averaged like
HunyuanImage), the image-embed projection (`:413`), a 3-way condition-type
embedding added per stream (`:604-650`), the 3-axis RoPE with theta 256
(`:361`), and the [valid_image, valid_byt5, valid_mllm, padding] token
compaction (`:655-706`).

TPU-first: the reference's per-item boolean compaction is a stable argsort
over group keys — fully traceable inside jit; the t2v zeroing of image
embeds (`:700`) is a traced `jnp.all` gate instead of python control flow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_hunyuan_video import HunyuanVideoTokenRefiner, HunyuanVideoTransformerBlock
from .transformer_hunyuanimage import HunyuanImageByT5TextProjection, HunyuanImagePatchEmbed


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class HunyuanVideo15TimeEmbedding(Module):
    """Reference `:175`: timestep embedding plus an optional meanflow
    reference-timestep embedding (summed)."""

    def __init__(self, embedding_dim: int, use_meanflow: bool = False):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.use_meanflow = use_meanflow
        if use_meanflow:
            self.timestep_embedder_r = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)

    def __call__(self, params: Params, timestep: jax.Array,
                 timestep_r: Optional[jax.Array] = None) -> jax.Array:
        dtype = params["timestep_embedder"]["linear_1"]["kernel"].dtype
        temb = self.timestep_embedder(params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype))
        if timestep_r is not None:
            temb = temb + self.timestep_embedder_r(
                params["timestep_embedder_r"], self.time_proj({}, timestep_r).astype(dtype))
        return temb


class HunyuanVideo15ImageProjection(Module):
    """Reference `:413`: norm -> linear -> gelu -> linear -> norm."""

    def __init__(self, in_channels: int, hidden_size: int):
        super().__init__()
        self.norm_in = LayerNorm(in_channels)
        self.linear_1 = Linear(in_channels, in_channels)
        self.linear_2 = Linear(in_channels, hidden_size)
        self.norm_out = LayerNorm(hidden_size)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        x = self.norm_in(params["norm_in"], image_embeds)
        x = jax.nn.gelu(self.linear_1(params["linear_1"], x), approximate=False)
        x = self.linear_2(params["linear_2"], x)
        return self.norm_out(params["norm_out"], x)


def _merge_condition_streams(image, image_mask, text_2, text_mask_2, text, text_mask):
    """[valid_image, valid_byt5, valid_mllm, invalid_image, 0, 0] via stable
    argsort (reference `:655-706` does this with per-item boolean compaction;
    invalid byt5/mllm tokens are zeroed, invalid image tokens are kept)."""
    text_2 = jnp.where(text_mask_2[..., None], text_2, 0.0)
    text = jnp.where(text_mask[..., None], text, 0.0)
    combined = jnp.concatenate([image, text_2, text], axis=1)
    mask = jnp.concatenate([image_mask, text_mask_2, text_mask], axis=1)
    order = jnp.argsort(jnp.where(mask, 0, 1), axis=1, stable=True)
    merged = jnp.take_along_axis(combined, order[..., None], axis=1)
    merged_mask = jnp.take_along_axis(mask, order, axis=1)
    return merged, merged_mask


class HunyuanVideo15Transformer3DModel(Module, ModelMixin, ConfigMixin):
    """Reference `:510`. Input/output are channel-first [B, C, F, H, W]."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 65,
        out_channels: int = 32,
        num_attention_heads: int = 16,
        attention_head_dim: int = 128,
        num_layers: int = 54,
        num_refiner_layers: int = 2,
        mlp_ratio: float = 4.0,
        patch_size: int = 1,
        patch_size_t: int = 1,
        qk_norm: str = "rms_norm",
        text_embed_dim: int = 3584,
        text_embed_2_dim: int = 1472,
        image_embed_dim: int = 1152,
        rope_theta: float = 256.0,
        rope_axes_dim: Tuple[int, ...] = (16, 56, 56),
        target_size: int = 640,
        task_type: str = "i2v",
        use_meanflow: bool = False,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = out_channels or in_channels

        self.x_embedder = HunyuanImagePatchEmbed((patch_size_t, patch_size, patch_size), in_channels, inner_dim)
        self.image_embedder = HunyuanVideo15ImageProjection(image_embed_dim, inner_dim)
        self.context_embedder = HunyuanVideoTokenRefiner(
            text_embed_dim, num_attention_heads, attention_head_dim, num_layers=num_refiner_layers)
        self.context_embedder_2 = HunyuanImageByT5TextProjection(text_embed_2_dim, 2048, inner_dim)
        self.time_embed = HunyuanVideo15TimeEmbedding(inner_dim, use_meanflow=use_meanflow)
        self.cond_type_embed = Embedding(3, inner_dim)

        self.transformer_blocks = ModuleList(
            [HunyuanVideoTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
             for _ in range(num_layers)])
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, patch_size_t * patch_size * patch_size * self.out_channels)

    def rope(self, num_frames: int, height: int, width: int):
        """Host-side 3-axis RoPE tables over the post-patchify grid
        (reference `:361`; sizes are pre-patchify latent dims)."""
        sizes = (num_frames // self.config.patch_size_t,
                 height // self.config.patch_size,
                 width // self.config.patch_size)
        grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32) for s in sizes], indexing="ij"), axis=0)
        cos_out, sin_out = [], []
        for i in range(3):
            cos, sin = get_1d_rotary_pos_embed_np(
                self.config.rope_axes_dim[i], grid[i].reshape(-1), theta=self.config.rope_theta)
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S1, text_embed_dim]
        encoder_attention_mask: jax.Array,  # [B, S1]
        timestep_r: Optional[jax.Array] = None,
        encoder_hidden_states_2: Optional[jax.Array] = None,
        encoder_attention_mask_2: Optional[jax.Array] = None,
        image_embeds: Optional[jax.Array] = None,  # [B, S3, image_embed_dim]
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size, _, num_frames, height, width = hidden_states.shape
        p_t, p = self.config.patch_size_t, self.config.patch_size
        post = (num_frames // p_t, height // p, width // p)

        if image_rotary_emb is None:
            cos, sin = self.rope(num_frames, height, width)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        temb = self.time_embed(params["time_embed"], timestep, timestep_r)
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)

        cond_table = params["cond_type_embed"]["embedding"]
        # mllm text through the token refiner (+ cond type 0)
        encoder_hidden_states = self.context_embedder(
            params["context_embedder"], encoder_hidden_states, timestep, encoder_attention_mask)
        encoder_hidden_states = encoder_hidden_states + cond_table[0]
        # byt5 glyph text (+ cond type 1)
        encoder_hidden_states_2 = self.context_embedder_2(
            params["context_embedder_2"], encoder_hidden_states_2) + cond_table[1]
        # image embeds (+ cond type 2); all-zero embeds mean t2v (reference `:700`)
        encoder_hidden_states_3 = self.image_embedder(params["image_embedder"], image_embeds)
        is_t2v = jnp.all(image_embeds == 0)
        encoder_hidden_states_3 = jnp.where(is_t2v, 0.0, encoder_hidden_states_3) + cond_table[2]
        image_mask = jnp.broadcast_to(~is_t2v, (batch_size, encoder_hidden_states_3.shape[1]))

        encoder_hidden_states, text_mask = _merge_condition_streams(
            encoder_hidden_states_3, image_mask,
            encoder_hidden_states_2, encoder_attention_mask_2.astype(bool),
            encoder_hidden_states, encoder_attention_mask.astype(bool))

        img_valid = jnp.ones((batch_size, hidden_states.shape[1]), dtype=bool)
        attention_mask = jnp.concatenate([img_valid, text_mask], axis=1)[:, None, None, :]

        for i, block in enumerate(self.transformer_blocks):
            hidden_states, encoder_hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                attention_mask, image_rotary_emb)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        # unpatchify (reference `:797-803`)
        hidden_states = hidden_states.reshape(batch_size, *post, self.out_channels, p_t, p, p)
        hidden_states = jnp.transpose(hidden_states, (0, 4, 1, 5, 2, 6, 3, 7))
        hidden_states = hidden_states.reshape(
            batch_size, self.out_channels, post[0] * p_t, post[1] * p, post[2] * p)

        if not return_dict:
            return (hidden_states,)
        return Transformer2DModelOutput(sample=hidden_states)

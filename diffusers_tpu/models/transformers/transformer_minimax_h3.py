"""MiniMax-H3 joint video+audio transformer.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_minimax_h3.py:374`
MiniMaxH3Transformer3DModel): ONE packed 1-D sequence holds text, conditioning
video rows, audio rows, and target video rows; full self-attention over the
document (no cross-attention, no mask); modality behaviour comes only from the
per-modality input projections, the per-row `(timestep, modality)` AdaLN table
(`MiniMaxH3AdaLayerNormModulation` `:101`), and the two output heads run over
every row then row-selected (`:648-655`). 3-axis shared-`inv_freq` RoPE
rotates the leading `2*3*rope_freq_dim` head channels (`:58-98`).

TPU-first: the packed buffer is built with static scatter indices
(`.at[...].set` on the sequence axis — the caller's layout arrays are host
numpy, so XLA sees constant gather/scatter patterns), the per-row AdaLN
selection is a `take` over a tiny `(timesteps*3, hidden)` table which XLA
fuses into the norm, and all rows run in one attention document.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin

MINIMAX_H3_MODALITY_NUM = 3  # 0 video, 1 text, 2 audio


@dataclass
class MiniMaxH3TransformerOutput(BaseOutput):
    sample: jax.Array
    audio_sample: jax.Array


def _rope_tables(position_ids: jax.Array, rope_freq_dim: int, rope_theta: float):
    """position_ids [S, 3] → cos/sin [S, 2*3*rope_freq_dim] (reference `:91`)."""
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, 2 * rope_freq_dim, 2, dtype=np.float32) / (2 * rope_freq_dim))
    )
    pos = jnp.asarray(position_ids, jnp.float32)
    freqs = pos[..., None] * jnp.asarray(inv_freq)[None, None, :]  # [S, 3, F]
    freqs = jnp.concatenate([freqs[:, 0], freqs[:, 1], freqs[:, 2]], axis=-1)
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate the leading rotary_dim channels of every head (reference `:57`)."""
    rotary_dim = cos.shape[-1]
    xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
    c = cos.astype(x.dtype)[None, :, None, :]
    s = sin.astype(x.dtype)[None, :, None, :]
    x1, x2 = jnp.split(xr, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return jnp.concatenate([xr * c + rotated * s, xp], axis=-1)


class MiniMaxH3Attention(Module):
    def __init__(self, hidden_size: int, heads: int, dim_head: int, qk_norm_eps: float = 1e-5):
        super().__init__()
        self.heads = heads
        self.head_dim = dim_head
        inner = heads * dim_head
        self.to_q = Linear(hidden_size, inner, use_bias=False)
        self.to_k = Linear(hidden_size, inner, use_bias=False)
        self.to_v = Linear(hidden_size, inner, use_bias=False)
        self.norm_q = RMSNorm(dim_head, eps=qk_norm_eps)
        self.norm_k = RMSNorm(dim_head, eps=qk_norm_eps)
        self.to_out = ModuleList([Linear(inner, hidden_size, use_bias=False)])

    def __call__(self, params: Params, x: jax.Array, rotary_emb=None) -> jax.Array:
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.heads, self.head_dim)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if rotary_emb is not None:
            q = _apply_rotary_emb(q, *rotary_emb)
            k = _apply_rotary_emb(k, *rotary_emb)
        out = dispatch_attention_fn(q, k, v).reshape(b, s, -1)
        return self.to_out[0](params["to_out"][0], out)


class MiniMaxH3TokenRefinerBlock(Module):
    def __init__(self, hidden_size, num_attention_heads, attention_head_dim, ffn_dim,
                 norm_eps, qk_norm_eps):
        super().__init__()
        self.norm1 = RMSNorm(hidden_size, eps=norm_eps)
        self.attn = MiniMaxH3Attention(hidden_size, num_attention_heads, attention_head_dim, qk_norm_eps)
        self.norm2 = RMSNorm(hidden_size, eps=norm_eps)
        self.ff = FeedForward(hidden_size, inner_dim=ffn_dim, activation_fn="swiglu", bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = x + self.attn(params["attn"], self.norm1(params["norm1"], x))
        x = x + self.ff(params["ff"], self.norm2(params["norm2"], x))
        return x


class MiniMaxH3TokenRefiner(Module):
    def __init__(self, hidden_size, num_attention_heads, attention_head_dim, ffn_dim,
                 num_layers, norm_eps, qk_norm_eps, final_norm_eps):
        super().__init__()
        self.refiner_blocks = ModuleList([
            MiniMaxH3TokenRefinerBlock(hidden_size, num_attention_heads, attention_head_dim,
                                       ffn_dim, norm_eps, qk_norm_eps)
            for _ in range(num_layers)
        ])
        self.final_norm = RMSNorm(hidden_size, eps=final_norm_eps)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, block in enumerate(self.refiner_blocks):
            x = block(params["refiner_blocks"][i], x)
        return self.final_norm(params["final_norm"], x)


class MiniMaxH3AdaLayerNormModulation(Module):
    """(num_timesteps, time_embed_dim) → six (timesteps*3, hidden) tables
    (reference `:101`); silu runs at temb precision, projection at param dtype."""

    def __init__(self, time_embed_dim: int, hidden_size: int):
        super().__init__()
        self.hidden_size = hidden_size
        self.linear = Linear(time_embed_dim, 6 * hidden_size * MINIMAX_H3_MODALITY_NUM)

    def __call__(self, params: Params, temb: jax.Array):
        out = self.linear(params["linear"], jax.nn.silu(temb).astype(params["linear"]["kernel"].dtype))
        out = out.reshape(-1, 6 * self.hidden_size)
        return jnp.split(out, 6, axis=-1)


class MiniMaxH3TransformerBlock(Module):
    def __init__(self, hidden_size, num_attention_heads, attention_head_dim, ffn_dim,
                 time_embed_dim, norm_eps, qk_norm_eps):
        super().__init__()
        self.norm1 = RMSNorm(hidden_size, eps=norm_eps)
        self.attn = MiniMaxH3Attention(hidden_size, num_attention_heads, attention_head_dim, qk_norm_eps)
        self.norm2 = RMSNorm(hidden_size, eps=norm_eps)
        self.ff = FeedForward(hidden_size, inner_dim=ffn_dim, activation_fn="swiglu", bias=False)
        self.adaln_proj = MiniMaxH3AdaLayerNormModulation(time_embed_dim, hidden_size)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array,
                 adaln_indices: jax.Array, rotary_emb) -> jax.Array:
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.adaln_proj(
            params["adaln_proj"], temb)

        def sel(t):  # per-row table lookup, [S, hidden]
            return jnp.take(t, adaln_indices, axis=0).astype(x.dtype)[None]

        h = self.norm1(params["norm1"], x) * (1.0 + sel(scale_msa)) + sel(shift_msa)
        x = x + sel(gate_msa) * self.attn(params["attn"], h, rotary_emb)
        h = self.norm2(params["norm2"], x) * (1.0 + sel(scale_mlp)) + sel(shift_mlp)
        x = x + sel(gate_mlp) * self.ff(params["ff"], h)
        return x


class MiniMaxH3AdaLayerNormOut(Module):
    def __init__(self, hidden_size: int, time_embed_dim: int, eps: float):
        super().__init__()
        self.norm = RMSNorm(hidden_size, eps=eps)
        self.linear = Linear(time_embed_dim, 2 * hidden_size)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array,
                 timestep_indices: jax.Array) -> jax.Array:
        out = self.linear(params["linear"], jax.nn.silu(temb).astype(params["linear"]["kernel"].dtype))
        shift, scale = jnp.split(out, 2, axis=-1)
        x = self.norm(params["norm"], x)
        return x * (1.0 + jnp.take(scale, timestep_indices, axis=0).astype(x.dtype)[None]) + jnp.take(
            shift, timestep_indices, axis=0).astype(x.dtype)[None]


class MiniMaxH3Transformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 56,
        attention_head_dim: int = 128,
        hidden_size: int = 5376,
        num_layers: int = 50,
        num_refiner_layers: int = 2,
        ffn_dim: int = 14336,
        in_channels: int = 24,
        audio_in_channels: int = 32,
        patch_size: Tuple[int, int, int] = (1, 2, 2),
        text_dim: int = 5120,
        freq_dim: int = 256,
        time_embed_hidden_dim: int = 5376,
        time_embed_dim: int = 2688,
        rope_freq_dim: int = 16,
        rope_theta: float = 10000.0,
        norm_eps: float = 1e-5,
        qk_norm_eps: float = 1e-5,
        final_norm_eps: float = 1e-5,
    ):
        super().__init__()
        video_patch_dim = in_channels * patch_size[0] * patch_size[1] * patch_size[2]
        self.proj_in = Linear(video_patch_dim, hidden_size)
        self.audio_proj_in = Linear(audio_in_channels, hidden_size)
        self.context_embedder = Linear(text_dim, hidden_size)
        self.time_proj = Timesteps(num_channels=freq_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(
            in_channels=freq_dim, time_embed_dim=time_embed_hidden_dim, out_dim=time_embed_dim)
        self.token_refiner = MiniMaxH3TokenRefiner(
            hidden_size, num_attention_heads, attention_head_dim, ffn_dim,
            num_refiner_layers, norm_eps, qk_norm_eps, final_norm_eps)
        self.transformer_blocks = ModuleList([
            MiniMaxH3TransformerBlock(hidden_size, num_attention_heads, attention_head_dim,
                                      ffn_dim, time_embed_dim, norm_eps, qk_norm_eps)
            for _ in range(num_layers)
        ])
        self.norm_out = MiniMaxH3AdaLayerNormOut(hidden_size, time_embed_dim, final_norm_eps)
        self.proj_out = Linear(hidden_size, video_patch_dim)
        self.audio_proj_out = Linear(hidden_size, audio_in_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, n_video, video_patch_dim]
        audio_hidden_states: jax.Array,  # [B, n_audio, audio_in_channels]
        encoder_hidden_states: jax.Array,  # [B, n_text, text_dim]
        timestep: jax.Array,  # [num_timesteps] in [0, 1]
        timestep_indices: jax.Array,  # [S]
        token_tags: jax.Array,  # [S] 0 video / 1 text / 2 audio
        position_ids: jax.Array,  # [S, 3]
        video_indices: jax.Array,  # [n_video]
        audio_indices: jax.Array,  # [n_audio]
        text_indices: jax.Array,  # [n_text]
        return_dict: bool = True,
    ) -> Union[MiniMaxH3TransformerOutput, tuple]:
        if np.asarray(position_ids).ndim != 2 or np.asarray(position_ids).shape[-1] != 3:
            raise ValueError(f"position_ids must be [seq_len, 3], got {np.asarray(position_ids).shape}")
        seq_len = np.asarray(position_ids).shape[0]

        rotary_emb = _rope_tables(position_ids, self.config.rope_freq_dim, self.config.rope_theta)

        video_embeds = self.proj_in(params["proj_in"], hidden_states)
        audio_embeds = self.audio_proj_in(params["audio_proj_in"], audio_hidden_states)
        text_embeds = self.context_embedder(params["context_embedder"], encoder_hidden_states)
        text_embeds = self.token_refiner(params["token_refiner"], text_embeds)

        b = text_embeds.shape[0]
        packed = jnp.zeros((b, seq_len, text_embeds.shape[-1]), text_embeds.dtype)
        packed = packed.at[:, jnp.asarray(text_indices)].set(text_embeds)
        packed = packed.at[:, jnp.asarray(video_indices)].set(video_embeds.astype(packed.dtype))
        packed = packed.at[:, jnp.asarray(audio_indices)].set(audio_embeds.astype(packed.dtype))

        temb = self.time_proj({}, jnp.asarray(timestep))
        temb = self.time_embedder(params["time_embedder"], temb.astype(jnp.float32))

        adaln_indices = jnp.asarray(timestep_indices) * MINIMAX_H3_MODALITY_NUM + jnp.asarray(token_tags)

        x = packed
        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, temb, adaln_indices, rotary_emb)

        x = self.norm_out(params["norm_out"], x, temb, jnp.asarray(timestep_indices))
        video_out = self.proj_out(params["proj_out"], x)[:, jnp.asarray(video_indices)]
        audio_out = self.audio_proj_out(params["audio_proj_out"], x)[:, jnp.asarray(audio_indices)]

        if not return_dict:
            return (video_out, audio_out)
        return MiniMaxH3TransformerOutput(sample=video_out, audio_sample=audio_out)

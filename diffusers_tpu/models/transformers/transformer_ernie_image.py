"""ErnieImageTransformer2DModel — ERNIE-Image joint text+image DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_ernie_image.py:296`;
shared AdaLN block `:242` — ONE zero-init modulation MLP feeds every layer,
Megatron-style rope `:115` with pairwise-duplicated angles but split-half
rotation, image-tokens-first packing with per-sample `text_lens` riding the
first rope axis of the image grid `:404`).

TPU-first: batch-first [B, S, H] throughout (the reference shuttles
seq-first [S, B, H] between layers purely for Megatron weight compat); the
rope table is traced jnp (it depends on per-sample text lengths).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv2d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import _PassThrough
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class ErnieImageTransformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _rope_angles(pos: jax.Array, dim: int, theta: float) -> jax.Array:
    """[..., n] positions -> [..., n, dim/2] angles in float32 (reference :46)."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    return pos.astype(jnp.float32)[..., None] * omega


class ErnieImageEmbedND3(Module):
    """3-axis rope with pairwise-duplicated angles (reference :58):
    emb = stack([emb, emb], -1).reshape → [θ0, θ0, θ1, θ1, ...]."""

    def __init__(self, dim: int, theta: float, axes_dim: Tuple[int, int, int]):
        super().__init__()
        self.theta = theta
        self.axes_dim = list(axes_dim)

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params: Params, ids: jax.Array) -> jax.Array:
        emb = jnp.concatenate(
            [_rope_angles(ids[..., i], self.axes_dim[i], self.theta) for i in range(3)], axis=-1
        )
        emb = emb[:, :, None, :]  # [B, S, 1, head_dim/2]
        return jnp.stack([emb, emb], axis=-1).reshape(*emb.shape[:-1], -1)  # [B, S, 1, head_dim]


def _apply_rotary(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Megatron rotate-half with duplicated-angle table (reference :131)."""
    rot_dim = freqs.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    cos = jnp.cos(freqs).astype(x.dtype)
    sin = jnp.sin(freqs).astype(x.dtype)
    x1, x2 = jnp.split(x_rot, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return jnp.concatenate([x_rot * cos + rotated * sin, x_pass], axis=-1)


class ErnieImagePatchEmbedDynamic(Module):
    def __init__(self, in_channels: int, embed_dim: int, patch_size: int):
        super().__init__()
        self.patch_size = patch_size
        self.proj = Conv2d(in_channels, embed_dim, kernel_size=patch_size, stride=patch_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # NHWC in (we convert at the model boundary), tokens out
        x = self.proj(params["proj"], x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class ErnieImageAttention(Module):
    """Per-head RMS qk-norm joint attention (reference :158)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int, eps: float = 1e-5,
                 qk_norm: bool = True, bias: bool = False, out_bias: bool = True):
        super().__init__()
        self.heads = heads
        self.head_dim = dim_head
        self.inner_dim = heads * dim_head
        self.qk_norm = qk_norm
        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_v = Linear(query_dim, self.inner_dim, use_bias=bias)
        if qk_norm:
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=out_bias)])

    def __call__(self, params: Params, x: jax.Array, attention_mask=None, freqs_cis=None):
        b = x.shape[0]
        q = self.to_q(params["to_q"], x).reshape(b, -1, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, -1, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, -1, self.heads, self.head_dim)
        if self.qk_norm:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)
        if freqs_cis is not None:
            q = _apply_rotary(q, freqs_cis)
            k = _apply_rotary(k, freqs_cis)
        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class ErnieImageFeedForward(Module):
    """up * gelu(gate) — note gelu on the GATE branch (reference :230)."""

    def __init__(self, hidden_size: int, ffn_hidden_size: int):
        super().__init__()
        self.gate_proj = Linear(hidden_size, ffn_hidden_size, use_bias=False)
        self.up_proj = Linear(hidden_size, ffn_hidden_size, use_bias=False)
        self.linear_fc2 = Linear(ffn_hidden_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.linear_fc2(
            params["linear_fc2"],
            self.up_proj(params["up_proj"], x) * jax.nn.gelu(self.gate_proj(params["gate_proj"], x), approximate=False),
        )


class ErnieImageSharedAdaLNBlock(Module):
    def __init__(self, hidden_size: int, num_heads: int, ffn_hidden_size: int,
                 eps: float = 1e-6, qk_layernorm: bool = True):
        super().__init__()
        self.adaLN_sa_ln = RMSNorm(hidden_size, eps=eps)
        self.self_attention = ErnieImageAttention(
            hidden_size, num_heads, hidden_size // num_heads, eps=eps,
            qk_norm=qk_layernorm, bias=False, out_bias=False,
        )
        self.adaLN_mlp_ln = RMSNorm(hidden_size, eps=eps)
        self.mlp = ErnieImageFeedForward(hidden_size, ffn_hidden_size)

    def __call__(self, params: Params, x: jax.Array, rotary_pos_emb, temb, attention_mask=None):
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = temb
        residual = x
        h = self.adaLN_sa_ln(params["adaLN_sa_ln"], x)
        h = (h.astype(jnp.float32) * (1 + scale_msa) + shift_msa).astype(x.dtype)
        attn = self.self_attention(params["self_attention"], h, attention_mask=attention_mask,
                                   freqs_cis=rotary_pos_emb)
        x = residual + (gate_msa * attn.astype(jnp.float32)).astype(x.dtype)
        residual = x
        h = self.adaLN_mlp_ln(params["adaLN_mlp_ln"], x)
        h = (h.astype(jnp.float32) * (1 + scale_mlp) + shift_mlp).astype(x.dtype)
        return residual + (gate_mlp * self.mlp(params["mlp"], h).astype(jnp.float32)).astype(x.dtype)


class ErnieImageAdaLNContinuous(Module):
    def __init__(self, hidden_size: int, eps: float = 1e-6):
        super().__init__()
        self.norm = LayerNorm(hidden_size, eps=eps, use_scale=False, use_bias=False)
        self.linear = Linear(hidden_size, hidden_size * 2)

    def __call__(self, params: Params, x: jax.Array, conditioning: jax.Array) -> jax.Array:
        scale, shift = jnp.split(self.linear(params["linear"], conditioning), 2, axis=-1)
        x = self.norm({}, x)
        return x * (1 + scale[:, None]) + shift[:, None]


class ErnieImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """ERNIE-Image DiT (reference ErnieImageTransformer2DModel :296)."""

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 3072,
        num_attention_heads: int = 24,
        num_layers: int = 24,
        ffn_hidden_size: int = 8192,
        in_channels: int = 128,
        out_channels: int = 128,
        patch_size: int = 1,
        text_in_dim: int = 2560,
        rope_theta: int = 256,
        rope_axes_dim: Tuple[int, int, int] = (32, 48, 48),
        eps: float = 1e-6,
        qk_layernorm: bool = True,
    ):
        super().__init__()
        self.hidden_size = hidden_size
        self.head_dim = hidden_size // num_attention_heads
        self.patch_size = patch_size
        self.x_embedder = ErnieImagePatchEmbedDynamic(in_channels, hidden_size, patch_size)
        if text_in_dim != hidden_size:
            self.text_proj = Linear(text_in_dim, hidden_size, use_bias=False)
        else:
            self.text_proj = None
        self.time_proj = Timesteps(hidden_size, flip_sin_to_cos=False, downscale_freq_shift=0)
        self.time_embedding = TimestepEmbedding(hidden_size, hidden_size)
        self.pos_embed = ErnieImageEmbedND3(dim=self.head_dim, theta=rope_theta, axes_dim=rope_axes_dim)
        self.adaLN_modulation = ModuleList([_PassThrough(), Linear(hidden_size, 6 * hidden_size)])
        self.layers = ModuleList([
            ErnieImageSharedAdaLNBlock(hidden_size, num_attention_heads, ffn_hidden_size,
                                       eps, qk_layernorm=qk_layernorm)
            for _ in range(num_layers)
        ])
        self.final_norm = ErnieImageAdaLNContinuous(hidden_size, eps)
        self.final_linear = Linear(hidden_size, patch_size * patch_size * out_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,
        text_bth: jax.Array,  # [B, Tmax, text_in_dim]
        text_lens: jax.Array,  # [B]
        return_dict: bool = True,
    ):
        dtype = hidden_states.dtype
        B, C, H, W = hidden_states.shape
        p = self.patch_size
        Hp, Wp = H // p, W // p
        n_img = Hp * Wp

        img = self.x_embedder(params["x_embedder"], jnp.transpose(hidden_states, (0, 2, 3, 1)))
        if self.text_proj is not None and text_bth.size > 0:
            text = self.text_proj(params["text_proj"], text_bth)
        else:
            text = text_bth
        t_max = text.shape[1]
        x = jnp.concatenate([img, text.astype(img.dtype)], axis=1)

        # rope ids: image tokens carry text_lens on axis 0 (reference :404)
        text_ids = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(t_max, dtype=jnp.float32)[None, :, None], (B, t_max, 1)),
            jnp.zeros((B, t_max, 2), jnp.float32),
        ], axis=-1)
        gy = jnp.repeat(jnp.arange(Hp, dtype=jnp.float32), Wp)
        gx = jnp.tile(jnp.arange(Wp, dtype=jnp.float32), Hp)
        grid = jnp.stack([gy, gx], axis=-1)  # [N_img, 2]
        image_ids = jnp.concatenate([
            jnp.broadcast_to(text_lens.astype(jnp.float32)[:, None, None], (B, n_img, 1)),
            jnp.broadcast_to(grid[None], (B, n_img, 2)),
        ], axis=-1)
        rotary_pos_emb = self.pos_embed({}, jnp.concatenate([image_ids, text_ids], axis=1))

        valid_text = jnp.arange(t_max)[None, :] < text_lens[:, None]
        attention_mask = jnp.concatenate(
            [jnp.ones((B, n_img), bool), valid_text], axis=1)[:, None, None, :]

        temb_in = self.time_proj({}, timestep).astype(dtype)
        c = self.time_embedding(params["time_embedding"], temb_in)
        mods = self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(c))
        temb = [m.astype(jnp.float32)[:, None] for m in jnp.split(mods, 6, axis=-1)]

        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, rotary_pos_emb, temb, attention_mask)

        x = self.final_norm(params["final_norm"], x, c).astype(x.dtype)
        patches = self.final_linear(params["final_linear"], x)[:, :n_img]
        out = patches.reshape(B, Hp, Wp, p, p, self.config.out_channels)
        out = jnp.transpose(out, (0, 5, 1, 3, 2, 4)).reshape(B, self.config.out_channels, H, W)

        if not return_dict:
            return (out,)
        return ErnieImageTransformer2DModelOutput(sample=out)

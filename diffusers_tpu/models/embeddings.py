"""Timestep / positional / patch embeddings.

Behavioral mirror of the reference `models/embeddings.py` (get_timestep_embedding
`:27`, Timesteps/TimestepEmbedding `:1300-1395`, patch + RoPE embeddings), in
functional JAX form. The sinusoidal table math runs in float32 regardless of
param dtype, matching torch.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.module import Embedding, LayerNorm, Linear, Module, Params, get_activation


def get_timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jax.Array:
    """DDPM sinusoidal timestep embedding; `timesteps` is 1-D [N]."""
    assert timesteps.ndim == 1, "timesteps should be a 1d-array"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps[:, None].astype(jnp.float32) * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool, downscale_freq_shift: float, scale: int = 1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, timesteps: jax.Array) -> jax.Array:
        return get_timestep_embedding(
            timesteps,
            self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
            scale=self.scale,
        )


class TimestepEmbedding(Module):
    """2-layer MLP over the sinusoidal embedding (reference embeddings.py:1300)."""

    def __init__(
        self,
        in_channels: int,
        time_embed_dim: int,
        act_fn: str = "silu",
        out_dim: Optional[int] = None,
        post_act_fn: Optional[str] = None,
        cond_proj_dim: Optional[int] = None,
        sample_proj_bias: bool = True,
    ):
        super().__init__()
        self.linear_1 = Linear(in_channels, time_embed_dim, use_bias=sample_proj_bias)
        self.cond_proj = Linear(cond_proj_dim, in_channels, use_bias=False) if cond_proj_dim is not None else None
        self.act = get_activation(act_fn)
        self.linear_2 = Linear(time_embed_dim, out_dim or time_embed_dim, use_bias=sample_proj_bias)
        self.post_act = get_activation(post_act_fn) if post_act_fn is not None else None

    def __call__(self, params: Params, sample: jax.Array, condition: Optional[jax.Array] = None) -> jax.Array:
        if condition is not None:
            sample = sample + self.cond_proj(params["cond_proj"], condition)
        sample = self.linear_1(params["linear_1"], sample)
        sample = self.act(sample)
        sample = self.linear_2(params["linear_2"], sample)
        if self.post_act is not None:
            sample = self.post_act(sample)
        return sample


class GaussianFourierProjection(Module):
    """Gaussian Fourier embeddings for continuous noise levels."""

    def __init__(self, embedding_size: int = 256, scale: float = 1.0, log: bool = True, flip_sin_to_cos: bool = False):
        super().__init__()
        self.embedding_size = embedding_size
        self.scale = scale
        self.log = log
        self.flip_sin_to_cos = flip_sin_to_cos

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jax.random.normal(key, (self.embedding_size,), jnp.float32) * self.scale}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.log:
            x = jnp.log(x)
        x_proj = x[:, None].astype(jnp.float32) * params["weight"][None, :] * 2 * jnp.pi
        if self.flip_sin_to_cos:
            return jnp.concatenate([jnp.cos(x_proj), jnp.sin(x_proj)], axis=-1)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class LabelEmbedding(Module):
    """Class-label table with an optional trailing null row for CFG dropout
    (reference embeddings.py LabelEmbedding: `num_classes + use_cfg_embedding`
    rows; label == num_classes selects the null embedding)."""

    def __init__(self, num_classes: int, hidden_size: int, dropout_prob: float = 0.0):
        super().__init__()
        use_cfg_embedding = 1 if dropout_prob > 0 else 0
        self.embedding_table = Embedding(num_classes + use_cfg_embedding, hidden_size)
        self.num_classes = num_classes
        self.dropout_prob = dropout_prob

    def __call__(self, params: Params, labels: jax.Array) -> jax.Array:
        return self.embedding_table(params["embedding_table"], labels)


class CombinedTimestepLabelEmbeddings(Module):
    """timestep MLP + class-label embedding, summed (reference
    embeddings.py:1566)."""

    def __init__(self, num_classes: int, embedding_dim: int, class_dropout_prob: float = 0.1):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=1)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.class_embedder = LabelEmbedding(num_classes, embedding_dim, class_dropout_prob)

    def __call__(self, params: Params, timestep: jax.Array, class_labels: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
        t_emb = self.timestep_embedder(
            params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype)
        )
        c_emb = self.class_embedder(params["class_embedder"], class_labels)
        return t_emb + c_emb


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: Tuple[int, int], base_size: int = 16, interpolation_scale: float = 1.0
) -> np.ndarray:
    """Fixed 2D sin-cos position table (reference embeddings.py get_2d_sincos_pos_embed)."""
    gh, gw = grid_size if isinstance(grid_size, tuple) else (grid_size, grid_size)
    grid_h = np.arange(gh, dtype=np.float32) / (gh / base_size) / interpolation_scale
    grid_w = np.arange(gw, dtype=np.float32) / (gw / base_size) / interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, gw, gh])

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def apply_rotary_emb(x: jax.Array, freqs_cos: jax.Array, freqs_sin: jax.Array) -> jax.Array:
    """Rotate pairs (interleaved convention, reference embeddings.py
    apply_rotary_emb with use_real_unbind_dim=-1). x: [..., S, H, D] or
    [..., S, D]; freqs: [S, D].

    bf16 inputs rotate in bf16: the result feeds a bf16 attention kernel
    immediately, so f32 intermediates only added HBM traffic (measured r5 on
    the Flux step: the f32 rotate produced ~25 ms/step of layout-thrash
    copies at seq 4608). f32 inputs keep f32 math (parity tests)."""
    dt = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    x_f = x.astype(dt)
    x_r = x_f.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x_r[..., 0], x_r[..., 1]
    x_rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    if x.ndim == 4 and freqs_cos.ndim == 2:  # x: [B,S,H,D], freqs: [S,D]
        freqs_cos = freqs_cos[None, :, None, :]
        freqs_sin = freqs_sin[None, :, None, :]
    else:
        while freqs_cos.ndim < x.ndim:
            freqs_cos = freqs_cos[None]
            freqs_sin = freqs_sin[None]
    out = x_f * freqs_cos.astype(dt) + x_rot * freqs_sin.astype(dt)
    return out.astype(x.dtype)


class AttentionPooling(Module):
    """DeepFloyd-IF attention pooling over token states (reference
    embeddings.py:1909): class token = mean + learned positional embedding;
    single-query attention over [class, tokens]."""

    def __init__(self, num_heads: int, embed_dim: int):
        super().__init__()
        self.num_heads = num_heads
        self.embed_dim = embed_dim
        self.dim_per_head = embed_dim // num_heads
        self.k_proj = Linear(embed_dim, embed_dim)
        self.q_proj = Linear(embed_dim, embed_dim)
        self.v_proj = Linear(embed_dim, embed_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        keys = jax.random.split(key, 4)
        return {
            "positional_embedding": jax.random.normal(keys[0], (1, self.embed_dim), dtype) / self.embed_dim**0.5,
            "k_proj": self.k_proj.init(keys[1], dtype),
            "q_proj": self.q_proj.init(keys[2], dtype),
            "v_proj": self.v_proj.init(keys[3], dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        bs, length, width = x.shape

        def shape(t):
            return jnp.transpose(t.reshape(bs, -1, self.num_heads, self.dim_per_head), (0, 2, 1, 3))

        class_token = jnp.mean(x, axis=1, keepdims=True) + params["positional_embedding"].astype(x.dtype)
        x = jnp.concatenate([class_token, x], axis=1)
        q = shape(self.q_proj(params["q_proj"], class_token))
        k = shape(self.k_proj(params["k_proj"], x))
        v = shape(self.v_proj(params["v_proj"], x))
        scale = 1 / math.sqrt(math.sqrt(self.dim_per_head))
        weight = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", weight, v)
        a = jnp.transpose(a, (0, 2, 1, 3)).reshape(bs, 1, width)
        return a[:, 0, :]


class TextTimeEmbedding(Module):
    """LN → attention-pool → proj → LN (reference embeddings.py:1831; the
    DeepFloyd-IF `addition_embed_type=\"text\"` aug embedding)."""

    def __init__(self, encoder_dim: int, time_embed_dim: int, num_heads: int = 64):
        super().__init__()
        self.norm1 = LayerNorm(encoder_dim)
        self.pool = AttentionPooling(num_heads, encoder_dim)
        self.proj = Linear(encoder_dim, time_embed_dim)
        self.norm2 = LayerNorm(time_embed_dim)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        hidden_states = self.norm1(params["norm1"], hidden_states)
        hidden_states = self.pool(params["pool"], hidden_states)
        hidden_states = self.proj(params["proj"], hidden_states)
        return self.norm2(params["norm2"], hidden_states)


class PixArtAlphaTextProjection(Module):
    """Pooled-text MLP projection (reference embeddings.PixArtAlphaTextProjection)."""

    def __init__(self, in_features: int, hidden_size: int, out_features: Optional[int] = None, act_fn: str = "gelu_tanh"):
        super().__init__()
        out_features = out_features or hidden_size
        self.linear_1 = Linear(in_features, hidden_size, use_bias=True)
        self.act_fn = act_fn
        self.linear_2 = Linear(hidden_size, out_features, use_bias=True)

    def __call__(self, params: Params, caption: jax.Array) -> jax.Array:
        x = self.linear_1(params["linear_1"], caption)
        if self.act_fn == "gelu_tanh":
            x = jax.nn.gelu(x, approximate=True)
        elif self.act_fn == "silu":
            x = jax.nn.silu(x)
        elif self.act_fn == "silu_fp32":
            x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
        else:
            raise ValueError(f"unknown activation {self.act_fn}")
        return self.linear_2(params["linear_2"], x)


class CombinedTimestepTextProjEmbeddings(Module):
    """timestep-sinusoid MLP + pooled-text MLP, summed (SD3/Flux temb)."""

    def __init__(self, embedding_dim: int, pooled_projection_dim: int):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")

    def __call__(self, params: Params, timestep: jax.Array, pooled_projection: jax.Array) -> jax.Array:
        t_proj = self.time_proj({}, timestep).astype(pooled_projection.dtype)
        t_emb = self.timestep_embedder(params["timestep_embedder"], t_proj)
        pooled = self.text_embedder(params["text_embedder"], pooled_projection)
        return t_emb + pooled


class CombinedTimestepGuidanceTextProjEmbeddings(Module):
    """Flux guidance-distilled variant: + guidance embedding."""

    def __init__(self, embedding_dim: int, pooled_projection_dim: int):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.guidance_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")

    def __call__(self, params: Params, timestep: jax.Array, guidance: jax.Array, pooled_projection: jax.Array) -> jax.Array:
        t_proj = self.time_proj({}, timestep).astype(pooled_projection.dtype)
        t_emb = self.timestep_embedder(params["timestep_embedder"], t_proj)
        g_proj = self.time_proj({}, guidance).astype(pooled_projection.dtype)
        g_emb = self.guidance_embedder(params["guidance_embedder"], g_proj)
        pooled = self.text_embedder(params["text_embedder"], pooled_projection)
        return t_emb + g_emb + pooled


def get_1d_rotary_pos_embed_np(
    dim: int,
    pos: np.ndarray,
    theta: float = 10000.0,
    repeat_interleave_real: bool = True,
    freqs_dtype=np.float64,
):
    """Host-side (numpy, float64) 1D RoPE table — mirrors the reference's
    float64 computation (embeddings.get_1d_rotary_pos_embed, flux path)."""
    assert dim % 2 == 0
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=freqs_dtype) / dim))
    freqs = np.outer(np.asarray(pos, dtype=freqs_dtype), freqs)  # [S, D/2]
    if repeat_interleave_real:
        cos = np.repeat(np.cos(freqs), 2, axis=1).astype(np.float32)
        sin = np.repeat(np.sin(freqs), 2, axis=1).astype(np.float32)
    else:
        cos = np.concatenate([np.cos(freqs), np.cos(freqs)], axis=-1).astype(np.float32)
        sin = np.concatenate([np.sin(freqs), np.sin(freqs)], axis=-1).astype(np.float32)
    return cos, sin


def get_1d_rotary_pos_embed(dim: int, pos: jax.Array, theta: float = 10000.0, repeat_interleave_real: bool = True):
    """Traced (float32) 1D RoPE table for when ids are device arrays."""
    assert dim % 2 == 0
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.outer(pos.astype(jnp.float32), freqs)
    if repeat_interleave_real:
        cos = jnp.repeat(jnp.cos(freqs), 2, axis=1)
        sin = jnp.repeat(jnp.sin(freqs), 2, axis=1)
    else:
        cos = jnp.concatenate([jnp.cos(freqs), jnp.cos(freqs)], axis=-1)
        sin = jnp.concatenate([jnp.sin(freqs), jnp.sin(freqs)], axis=-1)
    return cos, sin


class FluxPosEmbed(Module):
    """Multi-axis RoPE over packed (txt+img) position ids (reference
    transformer_flux.py FluxPosEmbed / black-forest-labs flux layers.EmbedND)."""

    def __init__(self, theta: int, axes_dim):
        super().__init__()
        self.theta = theta
        self.axes_dim = list(axes_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, ids: jax.Array):
        n_axes = ids.shape[-1]
        cos_out, sin_out = [], []
        if isinstance(ids, np.ndarray):
            for i in range(n_axes):
                cos, sin = get_1d_rotary_pos_embed_np(self.axes_dim[i], ids[:, i], theta=self.theta)
                cos_out.append(cos)
                sin_out.append(sin)
            return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)
        for i in range(n_axes):
            cos, sin = get_1d_rotary_pos_embed(self.axes_dim[i], ids[:, i], theta=self.theta)
            cos_out.append(cos)
            sin_out.append(sin)
        return jnp.concatenate(cos_out, axis=-1), jnp.concatenate(sin_out, axis=-1)


class PatchEmbed(Module):
    """2D image→patch embedding with SD3-style cropped positional table
    (reference embeddings.PatchEmbed)."""

    def __init__(
        self,
        height: int = 224,
        width: int = 224,
        patch_size: int = 16,
        in_channels: int = 3,
        embed_dim: int = 768,
        layer_norm: bool = False,
        flatten: bool = True,
        bias: bool = True,
        interpolation_scale: float = 1,
        pos_embed_type: str = "sincos",
        pos_embed_max_size: Optional[int] = None,
    ):
        super().__init__()
        from ..ops.module import Conv2d, LayerNorm

        self.patch_size = patch_size
        self.flatten = flatten
        self.use_layer_norm = layer_norm
        self.pos_embed_max_size = pos_embed_max_size
        self.height, self.width = height // patch_size, width // patch_size
        self.base_size = height // patch_size
        self.interpolation_scale = interpolation_scale
        self.proj = Conv2d(in_channels, embed_dim, kernel_size=patch_size, stride=patch_size, use_bias=bias)
        if layer_norm:
            self.norm = LayerNorm(embed_dim, eps=1e-6, use_scale=False, use_bias=False)

        if pos_embed_type == "sincos":
            grid_size = pos_embed_max_size if pos_embed_max_size else int((self.height * self.width) ** 0.5)
            self.pos_embed_table = get_2d_sincos_pos_embed(
                embed_dim, (grid_size, grid_size), base_size=self.base_size,
                interpolation_scale=self.interpolation_scale,
            )[None]  # [1, N, D] numpy
        elif pos_embed_type is None:
            self.pos_embed_table = None
        else:
            raise ValueError(f"unsupported pos_embed_type {pos_embed_type}")

    def cropped_pos_embed(self, height: int, width: int) -> np.ndarray:
        h = height // self.patch_size
        w = width // self.patch_size
        m = self.pos_embed_max_size
        top = (m - h) // 2
        left = (m - w) // 2
        table = self.pos_embed_table.reshape(1, m, m, -1)
        return table[:, top : top + h, left : left + w, :].reshape(1, h * w, -1)

    def __call__(self, params: Params, latent: jax.Array) -> jax.Array:
        """latent: [B, C, H, W] → [B, N, D]."""
        b, c, h, w = latent.shape
        x = jnp.transpose(latent, (0, 2, 3, 1))
        x = self.proj(params["proj"], x)  # [B, H/p, W/p, D]
        x = x.reshape(b, -1, x.shape[-1])
        if self.use_layer_norm:
            x = self.norm({}, x)
        if self.pos_embed_table is None:
            return x
        if self.pos_embed_max_size is not None:
            pos = self.cropped_pos_embed(h, w)
        else:
            pos = self.pos_embed_table
        return (x + jnp.asarray(pos, dtype=x.dtype)).astype(x.dtype)


def get_3d_sincos_pos_embed_np(
    embed_dim: int,
    spatial_size,
    temporal_size: int,
    spatial_interpolation_scale: float = 1.0,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """3D (T, H*W) sin-cos table: 3/4 of channels spatial, 1/4 temporal
    (reference embeddings.py `_get_3d_sincos_pos_embed_np:155`). Returns
    [T, H*W, D]."""
    if embed_dim % 4 != 0:
        raise ValueError("`embed_dim` must be divisible by 4")
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(spatial_size[1], dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # w first (reference convention)
    grid = np.stack(grid, axis=0).reshape([2, 1, spatial_size[1], spatial_size[0]])
    emb_h = _1d(dim_spatial // 2, grid[0])
    emb_w = _1d(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)  # [H*W, 3D/4]

    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    pos_temporal = _1d(dim_temporal, grid_t)  # [T, D/4]

    pos_spatial = np.repeat(pos_spatial[None, :, :], temporal_size, axis=0)
    pos_temporal = np.repeat(pos_temporal[:, None, :], spatial_size[0] * spatial_size[1], axis=1)
    return np.concatenate([pos_temporal, pos_spatial], axis=-1).astype(np.float32)


def get_3d_rotary_pos_embed_np(
    embed_dim: int,
    crops_coords,
    grid_size,
    temporal_size: int,
    theta: float = 10000.0,
):
    """3D RoPE for video tokens (reference embeddings.py
    `get_3d_rotary_pos_embed:831`, linspace grid): per-axis 1D tables
    (T: D/4, H: 3D/8, W: 3D/8) broadcast over the (T, H, W) grid and
    concatenated. Returns (cos, sin) each [T*H*W, D]."""
    start, stop = crops_coords
    gh, gw = grid_size
    grid_h = np.linspace(start[0], stop[0] * (gh - 1) / gh, gh, dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1] * (gw - 1) / gw, gw, dtype=np.float32)
    grid_t = np.linspace(0, temporal_size * (temporal_size - 1) / temporal_size, temporal_size, dtype=np.float32)

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3
    t_cos, t_sin = get_1d_rotary_pos_embed_np(dim_t, grid_t, theta=theta)
    h_cos, h_sin = get_1d_rotary_pos_embed_np(dim_h, grid_h, theta=theta)
    w_cos, w_sin = get_1d_rotary_pos_embed_np(dim_w, grid_w, theta=theta)

    def combine(ft, fh, fw):
        ft = np.broadcast_to(ft[:, None, None, :], (temporal_size, gh, gw, dim_t))
        fh = np.broadcast_to(fh[None, :, None, :], (temporal_size, gh, gw, dim_h))
        fw = np.broadcast_to(fw[None, None, :, :], (temporal_size, gh, gw, dim_w))
        return np.concatenate([ft, fh, fw], axis=-1).reshape(temporal_size * gh * gw, -1)

    return combine(t_cos, h_cos, w_cos), combine(t_sin, h_sin, w_sin)


def get_2d_rotary_pos_embed_np(embed_dim: int, crops_coords, grid_size):
    """2D RoPE cos/sin over a cropped grid (reference embeddings.py
    get_2d_rotary_pos_embed `:975` / `_get_2d_rotary_pos_embed_np`): half the
    dims encode rows, half columns; returns ([N, D], [N, D]) numpy fp32."""
    start, stop = crops_coords
    grid_h = np.linspace(start[0], stop[0], grid_size[0], endpoint=False, dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1], grid_size[1], endpoint=False, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # 'xy': grid[0]=w values, grid[1]=h
    # reference feeds grid[0] (w) to the FIRST half of dims (embeddings.py:1072)
    cos_0, sin_0 = get_1d_rotary_pos_embed_np(embed_dim // 2, grid[0].reshape(-1))
    cos_1, sin_1 = get_1d_rotary_pos_embed_np(embed_dim // 2, grid[1].reshape(-1))
    return np.concatenate([cos_0, cos_1], axis=1), np.concatenate([sin_0, sin_1], axis=1)


def get_resize_crop_region_for_grid(src, tgt_size):
    """Aspect-preserving crop region (reference pipeline_hunyuandit.py:102)."""
    th = tw = tgt_size
    h, w = src
    r = h / w
    if r > 1:
        resize_height = th
        resize_width = int(round(th / h * w))
    else:
        resize_width = tw
        resize_height = int(round(tw / w * h))
    crop_top = int(round((th - resize_height) / 2.0))
    crop_left = int(round((tw - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def get_1d_sincos_pos_embed_from_grid_np(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1D sin|cos table (reference embeddings.py:431)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", np.asarray(pos, np.float64).reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


class ImageProjection(Module):
    """Image embed → N cross-attention tokens (reference embeddings.py:1515;
    Kandinsky 2.2 decoder conditioning)."""

    def __init__(self, image_embed_dim: int = 768, cross_attention_dim: int = 768,
                 num_image_text_embeds: int = 32):
        super().__init__()
        self.num_image_text_embeds = num_image_text_embeds
        self.image_embeds = Linear(image_embed_dim, num_image_text_embeds * cross_attention_dim)
        self.norm = LayerNorm(cross_attention_dim)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        b = image_embeds.shape[0]
        x = self.image_embeds(params["image_embeds"], image_embeds)
        x = x.reshape(b, self.num_image_text_embeds, -1)
        return self.norm(params["norm"], x)


class TextImageProjection(Module):
    """Text + image embeds → joint cross-attention tokens (reference
    embeddings.py:1488; Kandinsky 2.1 decoder conditioning)."""

    def __init__(self, text_embed_dim: int = 1024, image_embed_dim: int = 768,
                 cross_attention_dim: int = 768, num_image_text_embeds: int = 10):
        super().__init__()
        self.num_image_text_embeds = num_image_text_embeds
        self.image_embeds = Linear(image_embed_dim, num_image_text_embeds * cross_attention_dim)
        self.text_proj = Linear(text_embed_dim, cross_attention_dim)

    def __call__(self, params: Params, text_embeds: jax.Array, image_embeds: jax.Array) -> jax.Array:
        b = text_embeds.shape[0]
        image_text_embeds = self.image_embeds(params["image_embeds"], image_embeds)
        image_text_embeds = image_text_embeds.reshape(b, self.num_image_text_embeds, -1)
        text_embeds = self.text_proj(params["text_proj"], text_embeds)
        return jnp.concatenate([image_text_embeds, text_embeds], axis=1)


class TextImageTimeEmbedding(Module):
    """Text + image embeds → time-embedding summand (reference
    embeddings.py:1847; Kandinsky 2.1)."""

    def __init__(self, text_embed_dim: int = 768, image_embed_dim: int = 768,
                 time_embed_dim: int = 1536):
        super().__init__()
        self.text_proj = Linear(text_embed_dim, time_embed_dim)
        self.text_norm = LayerNorm(time_embed_dim)
        self.image_proj = Linear(image_embed_dim, time_embed_dim)

    def __call__(self, params: Params, text_embeds: jax.Array, image_embeds: jax.Array) -> jax.Array:
        time_text = self.text_norm(params["text_norm"], self.text_proj(params["text_proj"], text_embeds))
        time_image = self.image_proj(params["image_proj"], image_embeds)
        return time_image + time_text


class ImageTimeEmbedding(Module):
    """Image embed → time-embedding summand (reference embeddings.py:1865)."""

    def __init__(self, image_embed_dim: int = 768, time_embed_dim: int = 1536):
        super().__init__()
        self.image_proj = Linear(image_embed_dim, time_embed_dim)
        self.image_norm = LayerNorm(time_embed_dim)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        x = self.image_proj(params["image_proj"], image_embeds)
        return self.image_norm(params["image_norm"], x)

"""MiniMax-H3 video VAE: causal 3D CNN encoder + non-causal ViT decoder.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_minimax_h3.py:501`
AutoencoderKLMiniMaxH3): causal convs (reflect spatial pad, zero causal
temporal pad `:34`), per-frame-isolated GroupNorm (`:68`), asymmetric
bottom/right-padded stride-2 downsampling (`:129`); the decoder is a ViT —
one token per latent voxel plus register tokens and a zero cls token, 3-axis
normalized-coordinate RoPE (`:279`), fp32 RMSNorms with learned residual
scales (`:369`), then a per-token patch projection (`:398`). Temporal
chunking: `clip_length` pixel frames per encode chunk with `token_drop`
trailing latent frames dropped (`_encode` `:764`), and the inverse
overlap-crossfaded decode (`_decode` `:790`). Spatial tiling is ON by
default (`:603`), latent-aligned tile splits (`_split_tiles` `:646`).

TPU-first: NDHWC convs, the per-frame GroupNorm folds T into the batch axis
as a reshape (free under XLA), the ViT decoder is one fused attention stack
per tile, and chunk/tile loops are host-side Python over static shapes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, GroupNorm, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..modeling_utils import ModelMixin
from .autoencoder_kl_cogvideox import AutoencoderKLOutput, DecoderOutput
from .vae import DiagonalGaussianDistribution


class MiniMaxH3VideoCausalConv3d(Module):
    """Reflect spatial pad + causal temporal zero pad, valid conv (NDHWC)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 spatial_padding=0, temporal_padding=0, spatial_padding_mode="reflect"):
        super().__init__()
        self.conv = Conv3d(in_channels, out_channels, kernel_size=kernel_size, stride=stride, padding=0)
        self.spatial_padding = spatial_padding
        self.temporal_padding = temporal_padding
        self.spatial_padding_mode = spatial_padding_mode

    def init(self, key, dtype=jnp.float32):
        return super().init(key, dtype=dtype)["conv"]

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # OIDHW -> DHWIO
            return "kernel", tensor.transpose(2, 3, 4, 1, 0)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "kernel":
            return "weight", array.transpose(4, 3, 0, 1, 2)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, T, H, W, C]
        p = self.spatial_padding
        if p > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)), mode=self.spatial_padding_mode)
        if self.temporal_padding > 0:
            x = jnp.pad(x, ((0, 0), (self.temporal_padding, 0), (0, 0), (0, 0), (0, 0)))
        return self.conv(params, x)


class MiniMaxH3VideoGroupNorm(GroupNorm):
    """GroupNorm with statistics isolated per frame (T folded into batch)."""

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t = x.shape[0], x.shape[1]
        out = super().__call__(params, x.reshape((b * t,) + x.shape[2:]))
        return out.reshape(x.shape)


class MiniMaxH3VideoResnetBlock3d(Module):
    def __init__(self, in_channels, out_channels, norm_num_groups=32, norm_eps=1e-6,
                 spatial_padding_mode="reflect"):
        super().__init__()
        self.norm1 = MiniMaxH3VideoGroupNorm(norm_num_groups, in_channels, eps=norm_eps)
        self.conv1 = MiniMaxH3VideoCausalConv3d(in_channels, out_channels, 3, spatial_padding=1,
                                                temporal_padding=2,
                                                spatial_padding_mode=spatial_padding_mode)
        self.norm2 = MiniMaxH3VideoGroupNorm(norm_num_groups, out_channels, eps=norm_eps)
        self.conv2 = MiniMaxH3VideoCausalConv3d(out_channels, out_channels, 3, spatial_padding=1,
                                                temporal_padding=2,
                                                spatial_padding_mode=spatial_padding_mode)
        self.conv_shortcut = (
            MiniMaxH3VideoCausalConv3d(in_channels, out_channels, 1) if in_channels != out_channels else None
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        h = self.conv1(params["conv1"], jax.nn.silu(self.norm1(params["norm1"], x)))
        h = self.conv2(params["conv2"], jax.nn.silu(self.norm2(params["norm2"], h)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(params["conv_shortcut"], residual)
        return residual + h


class MiniMaxH3VideoDownsample3d(Module):
    def __init__(self, in_channels, out_channels, temporal_stride=1, spatial_stride=2,
                 spatial_padding_mode="reflect"):
        super().__init__()
        self.spatial_stride = spatial_stride
        self.spatial_padding_mode = spatial_padding_mode
        self.conv = MiniMaxH3VideoCausalConv3d(
            in_channels, out_channels, 3, stride=(temporal_stride, spatial_stride, spatial_stride),
            spatial_padding=0, temporal_padding=2, spatial_padding_mode=spatial_padding_mode)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.spatial_stride == 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)), mode=self.spatial_padding_mode)
        return self.conv(params["conv"], x)


class MiniMaxH3VideoDownBlock3d(Module):
    def __init__(self, in_channels, out_channels, num_layers, temporal_downsample_factor,
                 spatial_downsample_factor, norm_num_groups=32, norm_eps=1e-6,
                 spatial_padding_mode="reflect"):
        super().__init__()
        self.resnets = ModuleList([
            MiniMaxH3VideoResnetBlock3d(in_channels if i == 0 else out_channels, out_channels,
                                        norm_num_groups, norm_eps, spatial_padding_mode)
            for i in range(num_layers)
        ])
        self.downsamplers = None
        if temporal_downsample_factor * spatial_downsample_factor > 1:
            self.downsamplers = ModuleList([
                MiniMaxH3VideoDownsample3d(out_channels, out_channels, temporal_downsample_factor,
                                           spatial_downsample_factor, spatial_padding_mode)
            ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class MiniMaxH3VideoEncoder3d(Module):
    def __init__(self, in_channels=3, out_channels=48, block_out_channels=(128, 256, 256, 512, 512, 1024),
                 layers_per_block=2, spatial_downsample_factors=(2, 2, 2, 2, 1, 1),
                 temporal_downsample_factors=(1, 2, 2, 1, 1, 1), norm_num_groups=32,
                 norm_eps=1e-6, spatial_padding_mode="reflect"):
        super().__init__()
        self.conv_in = MiniMaxH3VideoCausalConv3d(in_channels, block_out_channels[0], 3,
                                                  spatial_padding=1, temporal_padding=2,
                                                  spatial_padding_mode=spatial_padding_mode)
        block_in = (block_out_channels[0],) + tuple(block_out_channels[:-1])
        self.down_blocks = ModuleList([
            MiniMaxH3VideoDownBlock3d(block_in[i], block_out_channels[i], layers_per_block,
                                      temporal_downsample_factors[i], spatial_downsample_factors[i],
                                      norm_num_groups, norm_eps, spatial_padding_mode)
            for i in range(len(block_out_channels))
        ])
        self.norm_out = MiniMaxH3VideoGroupNorm(norm_num_groups, block_out_channels[-1], eps=norm_eps)
        self.conv_out = MiniMaxH3VideoCausalConv3d(block_out_channels[-1], out_channels, 3,
                                                   spatial_padding=1, temporal_padding=2,
                                                   spatial_padding_mode=spatial_padding_mode)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = jax.nn.silu(self.norm_out(params["norm_out"], x))
        return self.conv_out(params["conv_out"], x)


def _vit_rope(position_ids: np.ndarray, dim: int, theta: float = 100.0):
    """[S, 3] normalized coords → cos/sin [S, 1, dim] (reference `:279`)."""
    inv_freq = 1.0 / theta ** np.arange(0, 1, 2 * 3 / dim, dtype=np.float32)
    angles = 2.0 * math.pi * position_ids[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = np.tile(angles, 2)[:, None, :]
    return np.cos(angles), np.sin(angles)


class MiniMaxH3VideoAttention(Module):
    def __init__(self, dim, heads, dim_head, eps=1e-5, bias=True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.norm_q = RMSNorm(dim_head, eps=eps, use_scale=False)
        self.norm_k = RMSNorm(dim_head, eps=eps, use_scale=False)
        self.to_q = Linear(dim, inner, use_bias=bias)
        self.to_k = Linear(dim, inner, use_bias=bias)
        self.to_v = Linear(dim, inner, use_bias=bias)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=bias)])

    def __call__(self, params: Params, x: jax.Array, rotary_emb=None) -> jax.Array:
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.heads, self.dim_head)
        q = self.norm_q({}, q)
        k = self.norm_k({}, k)
        if rotary_emb is not None:
            cos, sin = (t.astype(q.dtype)[None] for t in rotary_emb)
            rd = cos.shape[-1]

            def rot(t):
                tr, tp = t[..., :rd], t[..., rd:]
                t1, t2 = jnp.split(tr, 2, axis=-1)
                rotated = jnp.concatenate([-t2, t1], axis=-1)
                return jnp.concatenate([tr * cos + rotated * sin, tp], axis=-1)

            q, k = rot(q), rot(k)
        out = dispatch_attention_fn(q, k, v).reshape(b, s, -1)
        return self.to_out[0](params["to_out"][0], out)


class MiniMaxH3VideoTransformerBlock(Module):
    def __init__(self, dim, heads, dim_head, ffn_mult=4, eps=1e-5, bias=True):
        super().__init__()
        self.dim = dim
        self.norm1 = RMSNorm(dim, eps=eps)
        self.attn = MiniMaxH3VideoAttention(dim, heads, dim_head, eps, bias)
        self.norm2 = RMSNorm(dim, eps=eps)
        self.ff = FeedForward(dim, mult=ffn_mult, activation_fn="swiglu", bias=bias)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale1"] = jnp.zeros((self.dim,), dtype)
        params["scale2"] = jnp.zeros((self.dim,), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array, rotary_emb=None) -> jax.Array:
        h = self.norm1(params["norm1"], x)
        x = x + self.attn(params["attn"], h, rotary_emb) * params["scale1"].astype(x.dtype)
        h = self.norm2(params["norm2"], x)
        x = x + self.ff(params["ff"], h) * params["scale2"].astype(x.dtype)
        return x


class MiniMaxH3VideoViTDecoder3d(Module):
    def __init__(self, in_channels=24, out_channels=3, patch_size=16, patch_size_t=4,
                 num_layers=36, num_attention_heads=32, attention_head_dim=64,
                 num_register_tokens=4, ffn_mult=4, rope_theta=100.0, rope_dim_ratio=0.75,
                 norm_eps=1e-5):
        super().__init__()
        dim = num_attention_heads * attention_head_dim
        self.dim = dim
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.out_channels = out_channels
        self.num_register_tokens = num_register_tokens
        self.rope_dim = int(attention_head_dim * rope_dim_ratio)
        self.rope_theta = rope_theta
        self.proj_in = Linear(in_channels, dim)
        self.transformer_blocks = ModuleList([
            MiniMaxH3VideoTransformerBlock(dim, num_attention_heads, attention_head_dim,
                                           ffn_mult, norm_eps)
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(dim, eps=norm_eps)
        self.proj_out = Linear(dim, out_channels * patch_size_t * patch_size * patch_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["register_tokens"] = jnp.zeros((1, self.num_register_tokens, self.dim), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        # z: [B, C, T, H, W]
        b, c, t, h, w = z.shape
        x = jnp.transpose(z, (0, 2, 3, 4, 1)).reshape(b, t * h * w, c)
        x = self.proj_in(params["proj_in"], x)
        num_patches = x.shape[1]

        reg = jnp.broadcast_to(params["register_tokens"].astype(x.dtype),
                               (b, self.num_register_tokens, x.shape[-1]))
        cls = jnp.zeros((b, 1, x.shape[-1]), x.dtype)
        x = jnp.concatenate([x, reg, cls], axis=1)

        grids = [2.0 * ((np.arange(s, dtype=np.float32) + 0.5) / s) - 1.0 for s in (t, h, w)]
        pos = np.stack(np.meshgrid(*grids, indexing="ij"), axis=-1).reshape(-1, 3)
        pos = np.concatenate([pos, np.zeros((self.num_register_tokens + 1, 3), np.float32)], axis=0)
        # rope_dim_ratio * head_dim channels of every head are rotated
        cos, sin = _vit_rope(pos, self.rope_dim, self.rope_theta)
        rotary = (jnp.asarray(cos), jnp.asarray(sin))

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, rotary)

        x = self.norm_out(params["norm_out"], x)
        x = self.proj_out(params["proj_out"], x)
        x = x[:, :num_patches]

        p, pt = self.patch_size, self.patch_size_t
        x = x.reshape(b, t, h, w, self.out_channels, pt, p, p)
        x = jnp.transpose(x, (0, 4, 1, 5, 2, 6, 3, 7))
        return x.reshape(b, self.out_channels, t * pt, h * p, w * p)


class AutoencoderKLMiniMaxH3(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 24,
        block_out_channels: Tuple[int, ...] = (128, 256, 256, 512, 512, 1024),
        layers_per_block: int = 2,
        spatial_downsample_factors: Tuple[int, ...] = (2, 2, 2, 2, 1, 1),
        temporal_downsample_factors: Tuple[int, ...] = (1, 2, 2, 1, 1, 1),
        norm_num_groups: int = 32,
        norm_eps: float = 1e-6,
        spatial_padding_mode: str = "reflect",
        decoder_num_layers: int = 36,
        decoder_num_attention_heads: int = 32,
        decoder_attention_head_dim: int = 64,
        decoder_num_register_tokens: int = 4,
        decoder_ffn_mult: int = 4,
        decoder_rope_theta: float = 100.0,
        decoder_rope_dim_ratio: float = 0.75,
        decoder_norm_eps: float = 1e-5,
        clip_length: int = 17,
        token_drop: int = 3,
        latents_mean: Tuple[float, ...] = (0.0,) * 24,
        latents_std: Tuple[float, ...] = (1.0,) * 24,
    ):
        super().__init__()
        self.spatial_compression_ratio = int(np.prod(spatial_downsample_factors))
        self.temporal_compression_ratio = int(np.prod(temporal_downsample_factors))

        self.encoder = MiniMaxH3VideoEncoder3d(
            in_channels, 2 * latent_channels, block_out_channels, layers_per_block,
            spatial_downsample_factors, temporal_downsample_factors, norm_num_groups,
            norm_eps, spatial_padding_mode)
        self.quant_conv = Conv3d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0)
        self.post_quant_conv = Conv3d(latent_channels, latent_channels, kernel_size=1, padding=0)
        self.decoder = MiniMaxH3VideoViTDecoder3d(
            latent_channels, out_channels, self.spatial_compression_ratio,
            self.temporal_compression_ratio, decoder_num_layers, decoder_num_attention_heads,
            decoder_attention_head_dim, decoder_num_register_tokens, decoder_ffn_mult,
            decoder_rope_theta, decoder_rope_dim_ratio, decoder_norm_eps)

        self.frame_pre_padding = (-clip_length) % self.temporal_compression_ratio
        self.tokens_chunk_size = math.ceil(clip_length / self.temporal_compression_ratio)
        self.token_overlap = (-token_drop) % self.tokens_chunk_size
        self.frame_overlap = max(self.token_overlap * self.temporal_compression_ratio - self.frame_pre_padding, 0)

        self.use_tiling = True  # MiniMax-H3 ships with tiling enabled
        self.tile_sample_min_height = 256
        self.tile_sample_min_width = 256
        self.tile_sample_min_overlap_height = 64
        self.tile_sample_min_overlap_width = 64

    def enable_tiling(self, tile_sample_min_height=None, tile_sample_min_width=None,
                      tile_sample_min_overlap_height=None, tile_sample_min_overlap_width=None):
        self.use_tiling = True
        self.tile_sample_min_height = tile_sample_min_height or self.tile_sample_min_height
        self.tile_sample_min_width = tile_sample_min_width or self.tile_sample_min_width
        self.tile_sample_min_overlap_height = tile_sample_min_overlap_height or self.tile_sample_min_overlap_height
        self.tile_sample_min_overlap_width = tile_sample_min_overlap_width or self.tile_sample_min_overlap_width

    def disable_tiling(self):
        self.use_tiling = False

    # ------------------------------------------------------------- tiling
    def _split_tiles(self, length: int, tile_size: int, min_overlap: int):
        if tile_size >= length:
            return [0], [length], []
        num_tiles = math.ceil(length / tile_size)
        while tile_size * num_tiles - min_overlap * (num_tiles - 1) - length < 0:
            num_tiles += 1
        overlaps = [min_overlap] * (num_tiles - 1)
        remaining = tile_size * num_tiles - sum(overlaps) - length
        for i in range(remaining // self.spatial_compression_ratio):
            overlaps[i % (num_tiles - 1)] += self.spatial_compression_ratio
        starts = [0]
        for i in range(num_tiles - 1):
            starts.append(starts[-1] + tile_size - overlaps[i])
        return starts, [tile_size] * num_tiles, overlaps

    @staticmethod
    def _blend(a: jax.Array, b: jax.Array, blend_extent: int, dim: int) -> jax.Array:
        blend_extent = min(a.shape[dim], b.shape[dim], blend_extent)
        pos = jnp.arange(blend_extent, dtype=b.dtype)
        shape = [1] * a.ndim
        shape[dim] = blend_extent
        wa = (1 - pos / blend_extent).reshape(shape)
        wb = (pos / blend_extent).reshape(shape)
        sl_a = [slice(None)] * a.ndim
        sl_a[dim] = slice(-blend_extent, None)
        sl_b = [slice(None)] * b.ndim
        sl_b[dim] = slice(0, blend_extent)
        blended = a[tuple(sl_a)] * wa + b[tuple(sl_b)] * wb
        if blend_extent == b.shape[dim]:
            return blended
        sl_rest = [slice(None)] * b.ndim
        sl_rest[dim] = slice(blend_extent, None)
        return jnp.concatenate([blended, b[tuple(sl_rest)]], axis=dim)

    def _stitch_tiles(self, tiles, height_overlaps, width_overlaps):
        rows = []
        for i, row in enumerate(tiles):
            out_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend(tiles[i - 1][j], tile, height_overlaps[i - 1], dim=-2)
                if j > 0:
                    tile = self._blend(row[j - 1], tile, width_overlaps[j - 1], dim=-1)
                if i < len(tiles) - 1:
                    tile = tile[..., : -height_overlaps[i], :]
                if j < len(row) - 1:
                    tile = tile[..., :, : -width_overlaps[j]]
                out_row.append(tile)
            rows.append(jnp.concatenate(out_row, axis=-1))
        return jnp.concatenate(rows, axis=-2)

    # ------------------------------------------------------------- encode
    def _run_encoder(self, params: Params, x: jax.Array) -> jax.Array:
        # NCDHW → NDHWC encoder → NCDHW moments
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))

    def _encode_clip(self, params: Params, x: jax.Array) -> jax.Array:
        if not self.use_tiling:
            return self._run_encoder(params, x)
        height, width = x.shape[-2], x.shape[-1]
        yi, yl, yo = self._split_tiles(height, self.tile_sample_min_height,
                                       self.tile_sample_min_overlap_height)
        xi, xl, xo = self._split_tiles(width, self.tile_sample_min_width,
                                       self.tile_sample_min_overlap_width)
        rows = [[self._run_encoder(params, x[..., ip:ip + il, jp:jp + jl])
                 for jp, jl in zip(xi, xl)] for ip, il in zip(yi, yl)]
        r = self.spatial_compression_ratio
        return self._stitch_tiles(rows, [o // r for o in yo], [o // r for o in xo])

    def _encode(self, params: Params, x: jax.Array) -> jax.Array:
        clip_length = self.config.clip_length
        num_frames = x.shape[2]
        if num_frames == 1:
            return self._encode_clip(params, x)
        if num_frames % clip_length != 0:
            pad = jnp.repeat(x[:, :, -1:], (-num_frames) % clip_length, axis=2)
            x = jnp.concatenate([x, pad], axis=2)
        moments = jnp.concatenate(
            [self._encode_clip(params, x[:, :, i * clip_length:(i + 1) * clip_length])
             for i in range(x.shape[2] // clip_length)], axis=2)
        if self.config.token_drop > 0:
            moments = moments[:, :, : -self.config.token_drop]
        return moments

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        moments = self._encode(params, x)
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    # ------------------------------------------------------------- decode
    def _run_decoder(self, params: Params, z: jax.Array) -> jax.Array:
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        h = self.post_quant_conv(params["post_quant_conv"], h)
        h = jnp.transpose(h, (0, 4, 1, 2, 3))
        return self.decoder(params["decoder"], h)

    def _decode_clip(self, params: Params, z: jax.Array) -> jax.Array:
        if not self.use_tiling:
            return self._run_decoder(params, z)
        r = self.spatial_compression_ratio
        height, width = z.shape[-2] * r, z.shape[-1] * r
        yi, yl, yo = self._split_tiles(height, self.tile_sample_min_height,
                                       self.tile_sample_min_overlap_height)
        xi, xl, xo = self._split_tiles(width, self.tile_sample_min_width,
                                       self.tile_sample_min_overlap_width)
        rows = [[self._run_decoder(params, z[..., ip // r:(ip + il) // r, jp // r:(jp + jl) // r])
                 for jp, jl in zip(xi, xl)] for ip, il in zip(yi, yl)]
        return self._stitch_tiles(rows, yo, xo)

    def _decode(self, params: Params, z: jax.Array) -> jax.Array:
        tokens_chunk_size = self.tokens_chunk_size
        token_drop = self.config.token_drop
        temporal_ratio = self.temporal_compression_ratio
        chunk_num_frames = tokens_chunk_size * temporal_ratio

        num_tokens = z.shape[2] + token_drop
        pad_tokens = (-num_tokens) % tokens_chunk_size
        num_chunks = (num_tokens + pad_tokens) // tokens_chunk_size - int(token_drop > 0)
        if pad_tokens > 0:
            z = jnp.concatenate([z, jnp.repeat(z[:, :, -1:], pad_tokens, axis=2)], axis=2)

        decoded, overlap = [], None
        for i in range(num_chunks):
            start = i * tokens_chunk_size
            clip = self._decode_clip(params, z[:, :, start:start + tokens_chunk_size + self.token_overlap])
            for j in range(int(token_drop > 0) + 1):
                fs = j * chunk_num_frames
                chunk = clip[:, :, fs:fs + chunk_num_frames][:, :, self.frame_pre_padding:]
                if j == 0:
                    if overlap is not None:
                        chunk = self._blend(overlap, chunk, self.frame_overlap, dim=-3)
                    decoded.append(chunk)
                else:
                    overlap = chunk
        if overlap is not None:
            decoded.append(overlap)
        dec = jnp.concatenate(decoded, axis=2)

        if pad_tokens > 0:
            intra_tail = self.config.clip_length % temporal_ratio
            num_tokens_before_pad = z.shape[2] - pad_tokens
            pad_frames = sum(
                intra_tail if intra_tail and (num_tokens_before_pad + k) % tokens_chunk_size == 0
                else temporal_ratio
                for k in range(pad_tokens)
            )
            dec = dec[:, :, :-pad_frames]
        return dec

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        dec = self._decode(params, z)
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

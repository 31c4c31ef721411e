"""AutoencoderVidTok — Microsoft VidTok video tokenizer (KL or FSQ latents).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_vidtok.py:938`):
a factored spatio-temporal VAE — every level runs a 2D resnet over frames then
a causal 1D resnet over time — with sigmoid-mixed avg-pool/conv temporal
down/upsampling, a 3D mid block with per-frame global attention, and either a
KL posterior or an FSQ (finite scalar quantization) bottleneck.

TPU-first: channels-last layouts throughout — 2D stages run on
[B·T, H, W, C], 1D stages on [B·H·W, T, C], 3D stages on [B, T, H, W, C] —
so the reference's permute/reshape churn becomes pure reshapes. Causal convs
replicate the first frame (single-pass == the reference's first-chunk path,
which is what its public encode/decode run).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


class FSQRegularizer(Module):
    """Finite scalar quantization (arXiv:2309.15505; reference `:34`)."""

    def __init__(self, levels: List[int], dim: Optional[int] = None, num_codebooks: int = 1):
        super().__init__()
        self.levels = np.asarray(levels, np.int32)
        self.basis = np.cumprod(np.asarray([1] + list(levels[:-1]), np.int32))
        self.codebook_dim = len(levels)
        self.num_codebooks = num_codebooks
        self.effective_codebook_dim = self.codebook_dim * num_codebooks
        self.dim = self.effective_codebook_dim if dim is None else dim
        self.has_projections = self.dim != self.effective_codebook_dim
        if self.has_projections:
            self.project_in = Linear(self.dim, self.effective_codebook_dim)
            self.project_out = Linear(self.effective_codebook_dim, self.dim)
        self.codebook_size = int(np.prod(levels))

    def quantize(self, z: jax.Array, eps: float = 1e-3) -> jax.Array:
        levels = jnp.asarray(self.levels, jnp.float32)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        z = jnp.tanh(z + shift) * half_l - offset
        zhat = jnp.round(z)
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        return zhat / half_width

    def codes_to_indices(self, zhat: jax.Array) -> jax.Array:
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        z = zhat * half_width + half_width
        return jnp.sum(z * jnp.asarray(self.basis, jnp.float32), axis=-1).astype(jnp.int32)

    def indices_to_codes(self, params: Params, indices: jax.Array, project_out: bool = True) -> jax.Array:
        is_img_or_video = indices.ndim >= 3
        idx = indices[..., None]
        codes_nc = (idx // jnp.asarray(self.basis, indices.dtype)) % jnp.asarray(self.levels, indices.dtype)
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        codes = (codes_nc.astype(jnp.float32) - half_width) / half_width
        if project_out and self.has_projections:
            codes = self.project_out(params["project_out"], codes)
        if is_img_or_video:
            codes = jnp.moveaxis(codes, -1, 1)
        return codes

    def __call__(self, params: Params, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """z: [B, D, T, H, W] (or [B, D, H, W]) → (quantized same shape, indices)."""
        is_video = z.ndim == 5
        shape = z.shape
        b, d = shape[0], shape[1]
        zf = z.reshape(b, d, -1)
        zf = jnp.moveaxis(zf, 1, -1)  # [B, N, D]
        if self.has_projections:
            zf = self.project_in(params["project_in"], zf)
        n = zf.shape[1]
        zf = zf.reshape(b, n, self.num_codebooks, -1).astype(jnp.float32)
        codes = self.quantize(zf)
        indices = self.codes_to_indices(codes)
        codes = codes.reshape(b, n, -1).astype(z.dtype)
        out = self.project_out(params["project_out"], codes) if self.has_projections else codes
        out = jnp.moveaxis(out, -1, 1).reshape(shape)
        indices = indices.reshape(b, *shape[2:], 1)[..., 0] if self.num_codebooks == 1 else indices
        return out, indices


class _Conv1dLeaf(Module):
    """nn.Conv1d mirror over [N, T, C]; weight stored KIO (torch [O, I, K])."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, dilation=1):
        super().__init__()
        self.in_channels, self.out_channels = in_channels, out_channels
        self.kernel_size, self.stride, self.dilation = kernel_size, stride, dilation

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        return {
            "weight": jax.random.uniform(
                k1, (self.kernel_size, self.in_channels, self.out_channels), dtype, -bound, bound),
            "bias": jax.random.uniform(k2, (self.out_channels,), dtype, -bound, bound),
        }

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # OIK -> KIO
            return pname, tensor.transpose(2, 1, 0)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "weight":
            return pname, array.transpose(2, 1, 0)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x, params["weight"].astype(x.dtype), window_strides=(self.stride,), padding="VALID",
            rhs_dilation=(self.dilation,), dimension_numbers=("NHC", "HIO", "NHC"))
        return y + params["bias"].astype(x.dtype)


class _CausalConv1d(Module):
    """Causal 1D conv over [N, T, C] (first-frame replicate pad); torch child
    subtree "conv" (reference VidTokCausalConv1d `:219`)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, dilation=1):
        super().__init__()
        self.time_pad = dilation * (kernel_size - 1) + (1 - stride)
        self.conv = _Conv1dLeaf(in_channels, out_channels, kernel_size, stride, dilation)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.time_pad:
            pad = jnp.repeat(x[:, :1], self.time_pad, axis=1)
            x = jnp.concatenate([pad, x], axis=1)
        return self.conv(params["conv"], x)


class _CausalConv3d(Module):
    """Causal 3D conv over [B, T, H, W, C]: first-frame replicate temporal pad
    + constant spatial pad (reference VidTokCausalConv3d `:258`)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, dilation=1):
        super().__init__()
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        d = (dilation,) * 3 if isinstance(dilation, int) else tuple(dilation)
        self.k, self.s, self.d = k, s, d
        self.time_pad = d[0] * (k[0] - 1) + (1 - s[0])
        hp = d[1] * (k[1] - 1) + (1 - s[1])
        wp = d[2] * (k[2] - 1) + (1 - s[2])
        self.spatial_pad = ((hp // 2, hp - hp // 2), (wp // 2, wp - wp // 2))
        self.conv = Conv3d(in_channels, out_channels, kernel_size=k, stride=s, padding=0,
                           dilation=d)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.time_pad:
            pad = jnp.repeat(x[:, :1], self.time_pad, axis=1)
            x = jnp.concatenate([pad, x], axis=1)
        x = jnp.pad(x, ((0, 0), (0, 0), self.spatial_pad[0], self.spatial_pad[1], (0, 0)))
        return self.conv(params["conv"], x)


class VidTokDownsample2D(Module):
    """Asymmetric-pad stride-2 conv (reference `:166`); [N, H, W, C]."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.conv = Conv2d(in_channels, in_channels, kernel_size=3, stride=2, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(params["conv"], x)


class VidTokUpsample2D(Module):
    """Nearest ×2 + conv (reference `:182`); [N, H, W, C]."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.conv = Conv2d(in_channels, in_channels, kernel_size=3, stride=1, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return self.conv(params["conv"], x)


class VidTokDownsample3D(Module):
    """sigmoid(mix)·avgpool + (1-sigmoid)·strided causal conv (reference `:317`)."""

    def __init__(self, in_channels: int, out_channels: int, mix_factor: float = 2.0):
        super().__init__()
        self._mix0 = mix_factor
        self.conv = _CausalConv3d(in_channels, out_channels, 3, stride=(2, 1, 1))

    def init(self, key, dtype=jnp.float32) -> Params:
        p = super().init(key, dtype=dtype)
        p["mix_factor"] = jnp.full((1,), self._mix0, dtype)
        return p

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = jax.nn.sigmoid(params["mix_factor"].astype(jnp.float32))[0].astype(x.dtype)
        # causal first-chunk: replicate-pad 1 frame at the front, then
        # avg_pool (3,1,1) stride (2,1,1)
        xp = jnp.concatenate([x[:, :1], x], axis=1)
        t = xp.shape[1]
        n_out = (t - 3) // 2 + 1
        idx = np.arange(n_out) * 2
        x1 = (xp[:, idx] + xp[:, idx + 1] + xp[:, idx + 2]) / 3.0
        x2 = self.conv(params["conv"], x)
        return alpha * x1 + (1 - alpha) * x2


class VidTokUpsample3D(Module):
    """Trilinear ×2 temporal upsample mixed with a causal conv (reference
    `:362`, causal first-chunk path: the first `num_temp_upsample` frames
    interpolate separately from the rest)."""

    def __init__(self, in_channels: int, out_channels: int, mix_factor: float = 2.0,
                 num_temp_upsample: int = 1):
        super().__init__()
        self._mix0 = mix_factor
        self.num_temp_upsample = num_temp_upsample
        self.conv = _CausalConv3d(in_channels, out_channels, 3)

    def init(self, key, dtype=jnp.float32) -> Params:
        p = super().init(key, dtype=dtype)
        p["mix_factor"] = jnp.full((1,), self._mix0, dtype)
        return p

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    @staticmethod
    def _interp_t2(x: jax.Array) -> jax.Array:
        """F.interpolate(scale_factor=[2,1,1], mode='trilinear',
        align_corners=False) along T for [B, T, H, W, C]."""
        b, t, h, w, c = x.shape
        return jax.image.resize(x.astype(jnp.float32), (b, 2 * t, h, w, c),
                                method="linear").astype(x.dtype)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = jax.nn.sigmoid(params["mix_factor"].astype(jnp.float32))[0].astype(x.dtype)
        nt = self.num_temp_upsample
        head, tail = x[:, :nt], x[:, nt:]
        head = self._interp_t2(head)
        if tail.shape[1] > 0:
            tail = self._interp_t2(tail)
            x = jnp.concatenate([head, tail], axis=1)
        else:
            x = head
        x_ = self.conv(params["conv"], x)
        return alpha * x + (1 - alpha) * x_


class VidTokAttnBlock(Module):
    """Per-frame single-head global attention (reference `:426`)."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.in_channels = in_channels
        self.norm = _VidTokLN(in_channels)
        self.q = _CausalConv3d(in_channels, in_channels, kernel_size=1)
        self.k = _CausalConv3d(in_channels, in_channels, kernel_size=1)
        self.v = _CausalConv3d(in_channels, in_channels, kernel_size=1)
        self.proj_out = _CausalConv3d(in_channels, in_channels, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.norm(params["norm"], x)
        q = self.q(params["q"], h)
        k = self.k(params["k"], h)
        v = self.v(params["v"], h)
        b, t, hh, ww, c = q.shape
        q = q.reshape(b, t, hh * ww, c)
        k = k.reshape(b, t, hh * ww, c)
        v = v.reshape(b, t, hh * ww, c)
        logits = jnp.einsum("btqc,btkc->btqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / math.sqrt(c), axis=-1).astype(v.dtype)
        out = jnp.einsum("btqk,btkc->btqc", probs, v).reshape(b, t, hh, ww, c)
        return x + self.proj_out(params["proj_out"], out)


class _VidTokLN(Module):
    """Channel-last LayerNorm wrapper matching the torch param subtree
    ("norm.weight"/"norm.bias", reference VidTokLayerNorm `:197`)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.norm = LayerNorm(dim, eps=eps)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.norm(params["norm"], x)


class VidTokResnetBlock(Module):
    """Factored resnet (reference `:456`): btype selects conv family; the
    layout is channels-last of the corresponding rank."""

    def __init__(self, in_channels: int, out_channels: Optional[int] = None,
                 btype: str = "3d"):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.in_channels, self.out_channels = in_channels, out_channels
        self.btype = btype
        self.norm1 = _VidTokLN(in_channels)
        self.norm2 = _VidTokLN(out_channels)
        if btype == "2d":
            self.conv1 = Conv2d(in_channels, out_channels, kernel_size=3, padding=1)
            self.conv2 = Conv2d(out_channels, out_channels, kernel_size=3, padding=1)
            mk_short = lambda: Conv2d(in_channels, out_channels, kernel_size=1, padding=0)
        elif btype == "1d":
            self.conv1 = _CausalConv1d(in_channels, out_channels, 3)
            self.conv2 = _CausalConv1d(out_channels, out_channels, 3)
            mk_short = lambda: _CausalConv1d(in_channels, out_channels, 1)
        else:
            self.conv1 = _CausalConv3d(in_channels, out_channels, 3)
            self.conv2 = _CausalConv3d(out_channels, out_channels, 3)
            mk_short = lambda: _CausalConv3d(in_channels, out_channels, 1)
        if in_channels != out_channels:
            self.nin_shortcut = mk_short()

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = jax.nn.silu(self.norm1(params["norm1"], x))
        h = self.conv1(params["conv1"], h)
        h = jax.nn.silu(self.norm2(params["norm2"], h))
        h = self.conv2(params["conv2"], h)
        if self.in_channels != self.out_channels:
            x = self.nin_shortcut(params["nin_shortcut"], x)
        return x + h


class _Level(Module):
    pass


def _to_2d(x):
    b, t, h, w, c = x.shape
    return x.reshape(b * t, h, w, c), (b, t)


def _from_2d(x, bt):
    b, t = bt
    return x.reshape(b, t, *x.shape[1:])


def _to_1d(x):
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c), (b, h, w)


def _from_1d(x, bhw):
    b, h, w = bhw
    t, c = x.shape[1], x.shape[2]
    return jnp.transpose(x.reshape(b, h, w, t, c), (0, 3, 1, 2, 4))


class VidTokEncoder3D(Module):
    def __init__(self, in_channels, ch, ch_mult=(1, 2, 4, 8), num_res_blocks=2,
                 z_channels=4, double_z=True, spatial_ds=None, tempo_ds=None):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.spatial_ds = list(range(self.num_resolutions - 1)) if spatial_ds is None else list(spatial_ds)
        self.tempo_ds = ([self.num_resolutions - 2, self.num_resolutions - 3]
                         if tempo_ds is None else list(tempo_ds))
        self.conv_in = _CausalConv3d(in_channels, ch, 3)
        in_ch_mult = (1,) + tuple(ch_mult)
        downs, downs_t = [], []
        for i_level in range(self.num_resolutions):
            block_in = ch * in_ch_mult[i_level]
            block_out = ch * ch_mult[i_level]
            lv, lv_t = _Level(), _Level()
            blocks, blocks_t = [], []
            for _ in range(num_res_blocks):
                blocks.append(VidTokResnetBlock(block_in, block_out, btype="2d"))
                blocks_t.append(VidTokResnetBlock(block_out, block_out, btype="1d"))
                block_in = block_out
            lv.block = ModuleList(blocks)
            lv_t.block = ModuleList(blocks_t)
            if i_level in self.spatial_ds:
                lv.downsample = VidTokDownsample2D(block_in)
                if i_level in self.tempo_ds:
                    lv_t.downsample = VidTokDownsample3D(block_in, block_in)
            downs.append(lv)
            downs_t.append(lv_t)
        self.down = ModuleList(downs)
        self.down_temporal = ModuleList(downs_t)
        self.mid = _Level()
        self.mid.block_1 = VidTokResnetBlock(block_in, block_in, btype="3d")
        self.mid.attn_1 = VidTokAttnBlock(block_in)
        self.mid.block_2 = VidTokResnetBlock(block_in, block_in, btype="3d")
        self.norm_out = _VidTokLN(block_in)
        self.conv_out = _CausalConv3d(block_in, 2 * z_channels if double_z else z_channels, 3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], x)
        for i_level in range(self.num_resolutions):
            lp, ltp = params["down"][i_level], params["down_temporal"][i_level]
            for i_block in range(self.num_res_blocks):
                h2, bt = _to_2d(h)
                h2 = self.down[i_level].block[i_block](lp["block"][i_block], h2)
                h = _from_2d(h2, bt)
                h1, bhw = _to_1d(h)
                h1 = self.down_temporal[i_level].block[i_block](ltp["block"][i_block], h1)
                h = _from_1d(h1, bhw)
            if i_level in self.spatial_ds:
                h2, bt = _to_2d(h)
                h2 = self.down[i_level].downsample(lp["downsample"], h2)
                h = _from_2d(h2, bt)
                if i_level in self.tempo_ds:
                    h = self.down_temporal[i_level].downsample(ltp["downsample"], h)
        h = self.mid.block_1(params["mid"]["block_1"], h)
        h = self.mid.attn_1(params["mid"]["attn_1"], h)
        h = self.mid.block_2(params["mid"]["block_2"], h)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        return self.conv_out(params["conv_out"], h)


class VidTokDecoder3D(Module):
    def __init__(self, ch, ch_mult=(1, 2, 4, 8), num_res_blocks=2, z_channels=4,
                 out_channels=3, spatial_us=None, tempo_us=None):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.spatial_us = list(range(1, self.num_resolutions)) if spatial_us is None else list(spatial_us)
        self.tempo_us = [1, 2] if tempo_us is None else list(tempo_us)
        block_in = ch * ch_mult[self.num_resolutions - 1]
        self.conv_in = _CausalConv3d(z_channels, block_in, 3)
        self.mid = _Level()
        self.mid.block_1 = VidTokResnetBlock(block_in, block_in, btype="3d")
        self.mid.attn_1 = VidTokAttnBlock(block_in)
        self.mid.block_2 = VidTokResnetBlock(block_in, block_in, btype="3d")
        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            lv = _Level()
            block_out = ch * ch_mult[i_level]
            blocks = []
            for _ in range(num_res_blocks + 1):
                blocks.append(VidTokResnetBlock(block_in, block_out, btype="2d"))
                block_in = block_out
            lv.block = ModuleList(blocks)
            if i_level in self.spatial_us:
                lv.upsample = VidTokUpsample2D(block_in)
            ups.insert(0, lv)
        self.up = ModuleList(ups)
        num_temp_upsample = 1
        ups_t = []
        for i_level in reversed(range(self.num_resolutions)):
            lv = _Level()
            bi = ch * ch_mult[i_level]
            blocks = []
            for _ in range(num_res_blocks + 1):
                blocks.append(VidTokResnetBlock(bi, bi, btype="1d"))
            lv.block = ModuleList(blocks)
            if i_level in self.tempo_us:
                lv.upsample = VidTokUpsample3D(bi, bi, num_temp_upsample=num_temp_upsample)
                num_temp_upsample *= 2
            ups_t.insert(0, lv)
        self.up_temporal = ModuleList(ups_t)
        self.norm_out = _VidTokLN(ch * ch_mult[0])
        self.conv_out = _CausalConv3d(ch * ch_mult[0], out_channels, 3)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], z)
        h = self.mid.block_1(params["mid"]["block_1"], h)
        h = self.mid.attn_1(params["mid"]["attn_1"], h)
        h = self.mid.block_2(params["mid"]["block_2"], h)
        for i_level in reversed(range(self.num_resolutions)):
            lp, ltp = params["up"][i_level], params["up_temporal"][i_level]
            for i_block in range(self.num_res_blocks + 1):
                h2, bt = _to_2d(h)
                h2 = self.up[i_level].block[i_block](lp["block"][i_block], h2)
                h = _from_2d(h2, bt)
                h1, bhw = _to_1d(h)
                h1 = self.up_temporal[i_level].block[i_block](ltp["block"][i_block], h1)
                h = _from_1d(h1, bhw)
            if i_level in self.spatial_us:
                h2, bt = _to_2d(h)
                h2 = self.up[i_level].upsample(lp["upsample"], h2)
                h = _from_2d(h2, bt)
                if i_level in self.tempo_us:
                    h = self.up_temporal[i_level].upsample(ltp["upsample"], h)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        return self.conv_out(params["conv_out"], h)


class AutoencoderVidTok(Module, ModelMixin, ConfigMixin):
    """VidTok video tokenizer (reference `:938`). Public I/O NCTHW; causal
    decode trims the first temporal_compression_ratio-1 frames."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        ch: int = 128,
        ch_mult: List[int] = [1, 2, 4, 4],
        z_channels: int = 4,
        double_z: bool = True,
        num_res_blocks: int = 2,
        spatial_ds: Optional[List] = None,
        spatial_us: Optional[List] = None,
        tempo_ds: Optional[List] = None,
        tempo_us: Optional[List] = None,
        regularizer: str = "kl",
        codebook_size: int = 262144,
        is_causal: bool = True,
    ):
        super().__init__()
        if not is_causal:
            raise NotImplementedError("only the causal VidTok configuration is supported")
        if regularizer not in ("kl", "fsq"):
            raise ValueError(f"Invalid regularizer: {regularizer}")
        self.encoder = VidTokEncoder3D(
            in_channels=in_channels, ch=ch, ch_mult=tuple(ch_mult),
            num_res_blocks=num_res_blocks, z_channels=z_channels, double_z=double_z,
            spatial_ds=spatial_ds, tempo_ds=tempo_ds)
        self.decoder = VidTokDecoder3D(
            ch=ch, ch_mult=tuple(ch_mult), num_res_blocks=num_res_blocks,
            z_channels=z_channels, out_channels=out_channels,
            spatial_us=spatial_us, tempo_us=tempo_us)
        self.temporal_compression_ratio = 2 ** len(self.encoder.tempo_ds)
        if regularizer == "fsq":
            if z_channels != int(math.log(codebook_size, 8)):
                raise ValueError("fsq requires z_channels == log8(codebook_size)")
            if double_z:
                raise ValueError("fsq requires double_z=False")
            self.regularization = FSQRegularizer(levels=[8] * z_channels)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        z = self.encoder(params["encoder"], jnp.transpose(x, (0, 2, 3, 4, 1)))
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
        if self.config.regularizer == "kl":
            posterior = DiagonalGaussianDistribution(z)
            if not return_dict:
                return (posterior,)
            return AutoencoderKLOutput(latent_dist=posterior)
        return self.regularization(params.get("regularization", {}), z)

    def decode(self, params: Params, z: jax.Array, decode_from_indices: bool = False):
        if decode_from_indices:
            z = self.regularization.indices_to_codes(params.get("regularization", {}), z)
        dec = self.decoder(params["decoder"], jnp.transpose(z, (0, 2, 3, 4, 1)))
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        return dec[:, :, self.temporal_compression_ratio - 1:]

    def __call__(self, params: Params, sample: jax.Array, sample_posterior: bool = False,
                 return_dict: bool = True, key: Optional[jax.Array] = None):
        if self.config.regularizer == "kl":
            posterior = self.encode(params, sample).latent_dist
            z = posterior.sample(key) if sample_posterior else posterior.mode()
        else:
            z, _ = self.encode(params, sample)
        dec = self.decode(params, z)
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

"""AutoencoderKLKVAEVideo — Kandinsky causal video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_kvae_video.py:707`):
causal 3D convs with replicate first-frame temporal padding, PixelShuffle-mean
spatial resampling, avg-pool/repeat temporal resampling with
first-frame-special handling, zq-conditioned spatial norm in the decoder, and
segment-chunked encode/decode that carries a temporal cache across chunks.

TPU-first: the cache is FUNCTIONAL — each module returns (out, new_cache) and
the segment loop threads a pytree of carry frames, so every chunk is one
jitted program. The reference's two-region cached-conv arithmetic
(`KVAECachedCausalConv3d.forward`, `:146-184`) reduces exactly to one valid
strided conv over [cache ++ chunk] with next-cache = concat[s*n_out:]
(derivation in `_CausalConv3d.__call__`). Activations NDHWC internally.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


class _CausalConv3d(Module):
    """Causal 3D conv over NDHWC with functional temporal cache.

    First chunk pads time with the replicated first frame (reference `:151-155`);
    later chunks consume the carried tail. torch's two-region output assembly
    is equivalent to one valid conv with stride s over [cache ++ x] starting
    at 0, with the next cache = concat[s * n_out :] (the reference's
    pad_offset formula lands on exactly that index)."""

    def __init__(self, chan_in, chan_out, kernel_size, stride=(1, 1, 1)):
        super().__init__()
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        self.k = k
        self.stride = tuple(stride)
        self.time_pad = k[0] - 1
        # param subtree name "conv" matches the torch wrapper (conv.weight)
        self.conv = Conv3d(chan_in, chan_out, kernel_size=k, stride=self.stride, padding=0)

    def __call__(self, params: Params, x: jax.Array, cache: Optional[jax.Array] = None):
        kt, kh, kw = self.k
        st = self.stride[0]
        ph, pw = kh // 2, kw // 2
        if cache is None:
            first = x[:, :1]
            pad = jnp.repeat(first, self.time_pad, axis=1) if self.time_pad else x[:, :0]
        else:
            pad = cache
        full = jnp.concatenate([pad, x], axis=1) if (self.time_pad or cache is not None) else x
        total = full.shape[1]
        n_out = (total - kt) // st + 1
        new_cache = full[:, st * n_out:]
        h = jnp.pad(full, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge")
        out = self.conv(params["conv"], h)
        return out, new_cache


class _SpatialNorm3D(Module):
    """zq-conditioned GroupNorm (reference KVAECachedSpatialNorm3D `:209`)."""

    def __init__(self, f_channels: int, zq_channels: int, add_conv: bool = False):
        super().__init__()
        self.add_conv = add_conv

        class _NormHolder(Module):
            def __init__(s):
                super().__init__()
                s.norm_layer = GroupNorm(num_groups=32, num_channels=f_channels, eps=1e-6)

        self.norm_layer = _NormHolder()
        if add_conv:
            self.conv = _CausalConv3d(zq_channels, zq_channels, kernel_size=3)
        self.conv_y = Conv3d(zq_channels, f_channels, kernel_size=1, padding=0)
        self.conv_b = Conv3d(zq_channels, f_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, f: jax.Array, zq: jax.Array,
                 cache=None, first_chunk: bool = True):
        # NDHWC; nearest-resize zq to f's (T, H, W) — first chunk resizes the
        # first frame separately (reference `:231-246`)
        def resize(z, t, h, w):
            return jax.image.resize(z, (z.shape[0], t, h, w, z.shape[-1]), method="nearest")

        _, ft, fh, fw, _ = f.shape
        if first_chunk:
            zq_first = resize(zq[:, :1], 1, fh, fw)
            if zq.shape[1] > 1:
                zq_rest = resize(zq[:, 1:], ft - 1, fh, fw)
                zq = jnp.concatenate([zq_first, zq_rest], axis=1)
            else:
                zq = zq_first
        else:
            zq = resize(zq, ft, fh, fw)
        new_cache = cache
        if self.add_conv:
            zq, new_cache = self.conv(params["conv"], zq, cache)
        norm_f = self.norm_layer.norm_layer(params["norm_layer"]["norm_layer"], f)
        return norm_f * self.conv_y(params["conv_y"], zq) + self.conv_b(params["conv_b"], zq), new_cache


class _ResnetBlock3D(Module):
    """Causal 3D resnet block (reference KVAECachedResnetBlock3D `:263`)."""

    def __init__(self, in_channels: int, out_channels: Optional[int] = None,
                 zq_ch: Optional[int] = None, add_conv: bool = False):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.in_channels, self.out_channels = in_channels, out_channels
        self.zq = zq_ch is not None
        if zq_ch is None:
            class _NormHolder(Module):
                def __init__(s, ch):
                    super().__init__()
                    s.norm_layer = GroupNorm(num_groups=32, num_channels=ch, eps=1e-6)

            self.norm1 = _NormHolder(in_channels)
            self.norm2 = _NormHolder(out_channels)
        else:
            self.norm1 = _SpatialNorm3D(in_channels, zq_ch, add_conv=add_conv)
            self.norm2 = _SpatialNorm3D(out_channels, zq_ch, add_conv=add_conv)
        self.conv1 = _CausalConv3d(in_channels, out_channels, kernel_size=3)
        self.conv2 = _CausalConv3d(out_channels, out_channels, kernel_size=3)
        if in_channels != out_channels:
            self.nin_shortcut = Conv3d(in_channels, out_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array, cache: Dict, zq=None,
                 first_chunk: bool = True):
        new_cache = {}
        if self.zq:
            h, new_cache["norm1"] = self.norm1(params["norm1"], x, zq,
                                               cache.get("norm1"), first_chunk)
        else:
            h = self.norm1.norm_layer(params["norm1"]["norm_layer"], x)
        h = jax.nn.silu(h)
        h, new_cache["conv1"] = self.conv1(params["conv1"], h, cache.get("conv1"))
        if self.zq:
            h, new_cache["norm2"] = self.norm2(params["norm2"], h, zq,
                                               cache.get("norm2"), first_chunk)
        else:
            h = self.norm2.norm_layer(params["norm2"]["norm_layer"], h)
        h = jax.nn.silu(h)
        h, new_cache["conv2"] = self.conv2(params["conv2"], h, cache.get("conv2"))
        if self.in_channels != self.out_channels:
            x = self.nin_shortcut(params["nin_shortcut"], x)
        return x + h, new_cache


def _pixel_unshuffle_mean(x: jax.Array, f: int) -> jax.Array:
    """NDHWC per-frame PixelUnshuffle then mean over the f² group (`:369-377`)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // f, f, w // f, f, c)
    return jnp.mean(x, axis=(3, 5))


class _PXSDownsample(Module):
    """Spatial mean-unshuffle + strided reflect conv; optional temporal
    avg-pool + stride-2 causal conv (reference `:341`)."""

    def __init__(self, in_channels: int, compress_time: bool, factor: int = 2):
        super().__init__()
        self.temporal_compress = compress_time
        self.factor = factor
        self.spatial_conv = Conv3d(in_channels, in_channels, kernel_size=(1, 3, 3),
                                   stride=(1, 2, 2), padding=0)
        if compress_time:
            self.temporal_conv = _CausalConv3d(in_channels, in_channels,
                                               kernel_size=(3, 1, 1), stride=(2, 1, 1))
        self.linear = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array, cache, first_chunk: bool = True):
        pxs = _pixel_unshuffle_mean(x, self.factor)
        h = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        out = self.spatial_conv(params["spatial_conv"], h) + pxs
        new_cache = cache
        if self.temporal_compress:
            b, t, hh, ww, c = out.shape
            if first_chunk:
                first, rest = out[:, :1], out[:, 1:]
                if rest.shape[1] > 0:
                    n = rest.shape[1] // 2 * 2
                    pooled = jnp.mean(rest[:, :n].reshape(b, n // 2, 2, hh, ww, c), axis=2)
                    interp = jnp.concatenate([first, pooled], axis=1)
                else:
                    interp = first
            else:
                n = t // 2 * 2
                interp = jnp.mean(out[:, :n].reshape(b, n // 2, 2, hh, ww, c), axis=2)
            conv_out, new_cache = self.temporal_conv(params["temporal_conv"], out, cache)
            out = conv_out + interp
        return self.linear(params["linear"], out), new_cache


class _PXSUpsample(Module):
    """Optional temporal repeat + causal conv, then nearest spatial ×2 + conv
    (reference `:413`)."""

    def __init__(self, in_channels: int, compress_time: bool, factor: int = 2):
        super().__init__()
        self.temporal_compress = compress_time
        self.factor = factor
        self.spatial_conv = Conv3d(in_channels, in_channels, kernel_size=(1, 3, 3),
                                   stride=(1, 1, 1), padding=0)
        if compress_time:
            self.temporal_conv = _CausalConv3d(in_channels, in_channels,
                                               kernel_size=(3, 1, 1), stride=(1, 1, 1))
        self.linear = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array, cache, first_chunk: bool = True):
        new_cache = cache
        if self.temporal_compress:
            tf = 2 if x.shape[1] > 1 else 1
            repeated = jnp.repeat(x, tf, axis=1)
            tail = repeated[:, tf - 1:] if first_chunk else repeated
            conv_out, new_cache = self.temporal_conv(params["temporal_conv"], tail, cache)
            x = conv_out + tail
        ups = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)  # nearest spatial x2
        h = jnp.pad(ups, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        s_out = ups + self.spatial_conv(params["spatial_conv"], h)
        return self.linear(params["linear"], s_out), new_cache


class _Level(Module):
    pass


class KVAECachedEncoder3D(Module):
    def __init__(self, ch=128, ch_mult=(1, 2, 4, 8), num_res_blocks=2, in_channels=3,
                 z_channels=16, double_z=True, temporal_compress_times=4):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.temporal_compress_level = int(np.log2(temporal_compress_times))
        self.conv_in = _CausalConv3d(in_channels, ch, kernel_size=3)
        in_ch_mult = (1,) + tuple(ch_mult)
        downs = []
        for i_level in range(self.num_resolutions):
            block_in = ch * in_ch_mult[i_level]
            block_out = ch * ch_mult[i_level]
            level = _Level()
            blocks = []
            for _ in range(num_res_blocks):
                blocks.append(_ResnetBlock3D(block_in, block_out))
                block_in = block_out
            level.block = ModuleList(blocks)
            if i_level != self.num_resolutions - 1:
                level.downsample = _PXSDownsample(block_in,
                                                  compress_time=i_level < self.temporal_compress_level)
            downs.append(level)
        self.down = ModuleList(downs)
        self.mid = _Level()
        self.mid.block_1 = _ResnetBlock3D(block_in, block_in)
        self.mid.block_2 = _ResnetBlock3D(block_in, block_in)

        class _NormHolder(Module):
            def __init__(s):
                super().__init__()
                s.norm_layer = GroupNorm(num_groups=32, num_channels=block_in, eps=1e-6)

        self.norm_out = _NormHolder()
        self.conv_out = _CausalConv3d(block_in, 2 * z_channels if double_z else z_channels,
                                      kernel_size=3)

    def __call__(self, params: Params, x: jax.Array, cache: Dict, first_chunk: bool = True):
        nc: Dict = {}
        h, nc["conv_in"] = self.conv_in(params["conv_in"], x, cache.get("conv_in"))
        for i_level in range(self.num_resolutions):
            lp = params["down"][i_level]
            lc = cache.get(i_level, {})
            nlc: Dict = {}
            for i_block in range(self.num_res_blocks):
                h, nlc[i_block] = self.down[i_level].block[i_block](
                    lp["block"][i_block], h, lc.get(i_block, {}), first_chunk=first_chunk)
            if i_level != self.num_resolutions - 1:
                h, nlc["down"] = self.down[i_level].downsample(
                    lp["downsample"], h, lc.get("down"), first_chunk=first_chunk)
            nc[i_level] = nlc
        h, nc["mid_1"] = self.mid.block_1(params["mid"]["block_1"], h, cache.get("mid_1", {}),
                                          first_chunk=first_chunk)
        h, nc["mid_2"] = self.mid.block_2(params["mid"]["block_2"], h, cache.get("mid_2", {}),
                                          first_chunk=first_chunk)
        h = jax.nn.silu(self.norm_out.norm_layer(params["norm_out"]["norm_layer"], h))
        h, nc["conv_out"] = self.conv_out(params["conv_out"], h, cache.get("conv_out"))
        return h, nc


class KVAECachedDecoder3D(Module):
    def __init__(self, ch=128, out_ch=3, ch_mult=(1, 2, 4, 8), num_res_blocks=2,
                 z_channels=16, zq_ch=None, add_conv=False, temporal_compress_times=4):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.temporal_compress_level = int(np.log2(temporal_compress_times))
        if zq_ch is None:
            zq_ch = z_channels
        block_in = ch * ch_mult[self.num_resolutions - 1]
        self.conv_in = _CausalConv3d(z_channels, block_in, kernel_size=3)
        self.mid = _Level()
        self.mid.block_1 = _ResnetBlock3D(block_in, block_in, zq_ch=zq_ch, add_conv=add_conv)
        self.mid.block_2 = _ResnetBlock3D(block_in, block_in, zq_ch=zq_ch, add_conv=add_conv)
        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            block_out = ch * ch_mult[i_level]
            level = _Level()
            blocks = []
            for _ in range(num_res_blocks + 1):
                blocks.append(_ResnetBlock3D(block_in, block_out, zq_ch=zq_ch, add_conv=add_conv))
                block_in = block_out
            level.block = ModuleList(blocks)
            if i_level != 0:
                level.upsample = _PXSUpsample(
                    block_in,
                    compress_time=i_level >= self.num_resolutions - self.temporal_compress_level)
            ups.insert(0, level)
        self.up = ModuleList(ups)
        self.norm_out = _SpatialNorm3D(block_in, zq_ch, add_conv=add_conv)
        self.conv_out = _CausalConv3d(block_in, out_ch, kernel_size=3)

    def __call__(self, params: Params, z: jax.Array, cache: Dict, first_chunk: bool = True):
        zq = z
        nc: Dict = {}
        h, nc["conv_in"] = self.conv_in(params["conv_in"], z, cache.get("conv_in"))
        h, nc["mid_1"] = self.mid.block_1(params["mid"]["block_1"], h, cache.get("mid_1", {}),
                                          zq=zq, first_chunk=first_chunk)
        h, nc["mid_2"] = self.mid.block_2(params["mid"]["block_2"], h, cache.get("mid_2", {}),
                                          zq=zq, first_chunk=first_chunk)
        for i_level in reversed(range(self.num_resolutions)):
            lp = params["up"][i_level]
            lc = cache.get(i_level, {})
            nlc: Dict = {}
            for i_block in range(self.num_res_blocks + 1):
                h, nlc[i_block] = self.up[i_level].block[i_block](
                    lp["block"][i_block], h, lc.get(i_block, {}), zq=zq, first_chunk=first_chunk)
            if i_level != 0:
                h, nlc["up"] = self.up[i_level].upsample(
                    lp["upsample"], h, lc.get("up"), first_chunk=first_chunk)
            nc[i_level] = nlc
        h, nc["norm_out"] = self.norm_out(params["norm_out"], h, zq, cache.get("norm_out"),
                                          first_chunk=first_chunk)
        h = jax.nn.silu(h)
        h, nc["conv_out"] = self.conv_out(params["conv_out"], h, cache.get("conv_out"))
        return h, nc


class AutoencoderKLKVAEVideo(Module, ModelMixin, ConfigMixin):
    """Kandinsky causal video VAE (reference `:707`). Public I/O is NCTHW."""

    @register_to_config
    def __init__(
        self,
        ch: int = 128,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 8),
        num_res_blocks: int = 2,
        in_channels: int = 3,
        out_ch: int = 3,
        z_channels: int = 16,
        temporal_compress_times: int = 4,
    ):
        super().__init__()
        self.encoder = KVAECachedEncoder3D(ch=ch, ch_mult=tuple(ch_mult),
                                           num_res_blocks=num_res_blocks,
                                           in_channels=in_channels, z_channels=z_channels,
                                           double_z=True,
                                           temporal_compress_times=temporal_compress_times)
        self.decoder = KVAECachedDecoder3D(ch=ch, ch_mult=tuple(ch_mult),
                                           num_res_blocks=num_res_blocks, out_ch=out_ch,
                                           z_channels=z_channels,
                                           temporal_compress_times=temporal_compress_times)

    @staticmethod
    def _segments(total: int, seg_len: int):
        split = [min(seg_len + 1, total)]
        n = total - split[0]
        while n > 0:
            take = min(seg_len, n)
            split.append(take)
            n -= take
        return split

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True,
               seg_len: int = 16):
        """x: [B, C, T, H, W]; the posterior mean is the chunked encoder mean
        and logvar is zero (reference `:886-890`)."""
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
        cache: Dict = {}
        outs = []
        start = 0
        for i, size in enumerate(self._segments(x.shape[1], seg_len)):
            chunk = x[:, start:start + size]
            start += size
            h, cache = self.encoder(params["encoder"], chunk, cache, first_chunk=(i == 0))
            outs.append(jnp.split(h, 2, axis=-1)[0])
        h = jnp.concatenate(outs, axis=1)
        h = jnp.transpose(h, (0, 4, 1, 2, 3))  # NCTHW
        moments = jnp.concatenate([h, jnp.zeros_like(h)], axis=1)
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True,
               seg_len: int = 16):
        tct = self.config.temporal_compress_times
        # latent-space split sizes mirroring the reference pixel-frame split
        split = [seg_len + 1]
        n = tct * (z.shape[2] - 1) - seg_len
        while n > 0:
            split.append(min(seg_len, n))
            n -= seg_len
        split[-1] += min(n, 0) if n < 0 else 0
        split = [math.ceil(s / tct) for s in split]
        zt = jnp.transpose(z, (0, 2, 3, 4, 1))
        cache: Dict = {}
        outs = []
        start = 0
        for i, size in enumerate(split):
            if size <= 0 or start >= zt.shape[1]:
                continue
            chunk = zt[:, start:start + size]
            start += size
            h, cache = self.decoder(params["decoder"], chunk, cache, first_chunk=(i == 0))
            outs.append(h)
        dec = jnp.concatenate(outs, axis=1)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params: Params, sample: jax.Array, sample_posterior: bool = False,
                 return_dict: bool = True, key: Optional[jax.Array] = None):
        posterior = self.encode(params, sample).latent_dist
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        dec = self.decode(params, z).sample
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

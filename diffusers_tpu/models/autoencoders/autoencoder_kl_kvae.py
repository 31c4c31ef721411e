"""AutoencoderKLKVAE — Kandinsky KVAE image autoencoder.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_kvae.py:521`):
VQGAN-style encoder/decoder with replicate-padded convs, PixelShuffle-mean
down/upsampling hybrids (`KVAEPXSDownsample`/`KVAEPXSUpsample`, `:135,166`)
and a zq-conditioned spatial norm in the decoder (`KVAEDecoderSpatialNorm2D`,
`:196` — MoVQ-style: GroupNorm(f) * conv_y(zq) + conv_b(zq) with zq
nearest-resized to f).

TPU-first: NHWC activations; pixel (un)shuffle are reshape/transposes;
replicate/reflect padding is explicit `jnp.pad` feeding padding-0 convs.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution
from dataclasses import dataclass


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


class PadConv2d(Conv2d):
    """Conv2d with torch padding_mode="replicate"/"reflect" semantics: pads
    explicitly (edge/reflect) then convolves with padding 0."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, padding=1,
                 pad_mode: str = "replicate", use_bias=True):
        super().__init__(in_channels, out_channels, kernel_size=kernel_size, stride=stride,
                         padding=0, use_bias=use_bias)
        self.pad_amount = padding
        self.pad_mode = {"replicate": "edge", "reflect": "reflect", "zeros": "constant"}[pad_mode]

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        p = self.pad_amount
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=self.pad_mode)
        return super().__call__(params, x)


class KVAEDecoderSpatialNorm2D(Module):
    """GroupNorm(f) modulated by zq (reference `:196`)."""

    def __init__(self, in_channels: int, zq_channels: int, add_conv: bool = False):
        super().__init__()
        self.add_conv = add_conv
        self.norm_layer = GroupNorm(num_groups=32, num_channels=in_channels, eps=1e-6)
        if add_conv:
            self.conv = PadConv2d(zq_channels, zq_channels, kernel_size=3, padding=1)
        self.conv_y = Conv2d(zq_channels, in_channels, kernel_size=1, padding=0)
        self.conv_b = Conv2d(zq_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, f: jax.Array, zq: jax.Array) -> jax.Array:
        h, w = f.shape[1], f.shape[2]
        if zq.shape[1:3] != (h, w):
            zq = jax.image.resize(zq, (zq.shape[0], h, w, zq.shape[-1]), method="nearest")
        if self.add_conv:
            zq = self.conv(params["conv"], zq)
        norm_f = self.norm_layer(params["norm_layer"], f)
        return norm_f * self.conv_y(params["conv_y"], zq) + self.conv_b(params["conv_b"], zq)


class KVAEResnetBlock2D(Module):
    """Resnet block with optional zq-guided norm (reference `:28`)."""

    def __init__(self, *, in_channels: int, out_channels: Optional[int] = None,
                 conv_shortcut: bool = False, temb_channels: int = 512,
                 zq_ch: Optional[int] = None, add_conv: bool = False):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.use_conv_shortcut = conv_shortcut
        self.zq = zq_ch is not None
        if zq_ch is None:
            self.norm1 = GroupNorm(num_groups=32, num_channels=in_channels, eps=1e-6)
            self.norm2 = GroupNorm(num_groups=32, num_channels=out_channels, eps=1e-6)
        else:
            self.norm1 = KVAEDecoderSpatialNorm2D(in_channels, zq_ch, add_conv=add_conv)
            self.norm2 = KVAEDecoderSpatialNorm2D(out_channels, zq_ch, add_conv=add_conv)
        self.conv1 = PadConv2d(in_channels, out_channels, kernel_size=3, padding=1)
        self.conv2 = PadConv2d(out_channels, out_channels, kernel_size=3, padding=1)
        if in_channels != out_channels:
            if conv_shortcut:
                self.conv_shortcut = PadConv2d(in_channels, out_channels, kernel_size=3, padding=1)
            else:
                self.nin_shortcut = Conv2d(in_channels, out_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array, zq: Optional[jax.Array] = None) -> jax.Array:
        h = self.norm1(params["norm1"], x, zq) if self.zq else self.norm1(params["norm1"], x)
        h = jax.nn.silu(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h, zq) if self.zq else self.norm2(params["norm2"], h)
        h = jax.nn.silu(h)
        h = self.conv2(params["conv2"], h)
        if self.in_channels != self.out_channels:
            if self.use_conv_shortcut:
                x = self.conv_shortcut(params["conv_shortcut"], x)
            else:
                x = self.nin_shortcut(params["nin_shortcut"], x)
        return x + h


def _pixel_unshuffle(x: jax.Array, f: int) -> jax.Array:
    """NHWC PixelUnshuffle matching torch channel order (C, fh, fw)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [B, h/f, w/f, C, fh, fw]
    return x.reshape(b, h // f, w // f, c * f * f)


def _pixel_shuffle(x: jax.Array, f: int) -> jax.Array:
    """NHWC PixelShuffle, torch channel order (C, fh, fw) → spatial."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, c, f, f)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # [B, h, fh, w, fw, C]
    return x.reshape(b, h * f, w * f, c)


class KVAEPXSDownsample(Module):
    """mean-of-unshuffled-pixels + strided reflect conv (reference `:135`)."""

    def __init__(self, in_channels: int, factor: int = 2):
        super().__init__()
        self.factor = factor
        self.spatial_conv = PadConv2d(in_channels, in_channels, kernel_size=3, stride=2,
                                      padding=1, pad_mode="reflect")
        self.linear = Conv2d(in_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        f = self.factor
        un = _pixel_unshuffle(x, f)  # [B, h/f, w/f, C*f*f], order (C, fh, fw)
        b, h2, w2, _ = un.shape
        pxs = jnp.mean(un.reshape(b, h2, w2, x.shape[-1], f * f), axis=-1)
        conv = self.spatial_conv(params["spatial_conv"], x)
        return self.linear(params["linear"], conv + pxs)


class KVAEPXSUpsample(Module):
    """repeat-interleave PixelShuffle + nearest-upsampled reflect conv
    (reference `:166`)."""

    def __init__(self, in_channels: int, factor: int = 2):
        super().__init__()
        self.factor = factor
        self.spatial_conv = PadConv2d(in_channels, in_channels, kernel_size=3, stride=1,
                                      padding=1, pad_mode="reflect")
        self.linear = Conv2d(in_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        f = self.factor
        repeated = jnp.repeat(x, f * f, axis=-1)  # torch repeat_interleave(dim=1)
        pxs = _pixel_shuffle(repeated, f)
        b, h, w, c = x.shape
        ups = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)  # nearest
        conv = self.spatial_conv(params["spatial_conv"], ups)
        return self.linear(params["linear"], conv + pxs)


class _Level(Module):
    """Holder for per-resolution block lists (torch `down.block` etc.)."""


class KVAEEncoder2D(Module):
    def __init__(self, *, ch: int, ch_mult: Tuple[int, ...] = (1, 2, 4, 8),
                 num_res_blocks: int, in_channels: int, z_channels: int,
                 double_z: bool = True):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        nrb = [num_res_blocks] * self.num_resolutions if isinstance(num_res_blocks, int) else num_res_blocks
        self.num_res_blocks = nrb
        self.conv_in = Conv2d(in_channels, ch, kernel_size=3, padding=1)
        in_ch_mult = (1,) + tuple(ch_mult)
        downs = []
        for i_level in range(self.num_resolutions):
            block_in = ch * in_ch_mult[i_level]
            block_out = ch * ch_mult[i_level]
            level = _Level()
            blocks = []
            for _ in range(nrb[i_level]):
                blocks.append(KVAEResnetBlock2D(in_channels=block_in, out_channels=block_out,
                                                temb_channels=0))
                block_in = block_out
            level.block = ModuleList(blocks)
            if i_level < self.num_resolutions - 1:
                level.downsample = KVAEPXSDownsample(in_channels=block_in)
            downs.append(level)
        self.down = ModuleList(downs)
        self.mid = _Level()
        self.mid.block_1 = KVAEResnetBlock2D(in_channels=block_in, out_channels=block_in, temb_channels=0)
        self.mid.block_2 = KVAEResnetBlock2D(in_channels=block_in, out_channels=block_in, temb_channels=0)
        self.norm_out = GroupNorm(num_groups=32, num_channels=block_in, eps=1e-6)
        self.conv_out = Conv2d(block_in, 2 * z_channels if double_z else z_channels,
                               kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], x)
        for i_level in range(self.num_resolutions):
            lp = params["down"][i_level]
            for i_block in range(self.num_res_blocks[i_level]):
                h = self.down[i_level].block[i_block](lp["block"][i_block], h)
            if i_level != self.num_resolutions - 1:
                h = self.down[i_level].downsample(lp["downsample"], h)
        h = self.mid.block_1(params["mid"]["block_1"], h)
        h = self.mid.block_2(params["mid"]["block_2"], h)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        return self.conv_out(params["conv_out"], h)


class KVAEDecoder2D(Module):
    def __init__(self, *, ch: int, out_ch: int, ch_mult: Tuple[int, ...] = (1, 2, 4, 8),
                 num_res_blocks: int, z_channels: int, give_pre_end: bool = False,
                 zq_ch: Optional[int] = None, add_conv: bool = False):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.give_pre_end = give_pre_end
        if zq_ch is None:
            zq_ch = z_channels
        block_in = ch * ch_mult[self.num_resolutions - 1]
        self.conv_in = PadConv2d(z_channels, block_in, kernel_size=3, padding=1)
        self.mid = _Level()
        self.mid.block_1 = KVAEResnetBlock2D(in_channels=block_in, out_channels=block_in,
                                             temb_channels=0, zq_ch=zq_ch, add_conv=add_conv)
        self.mid.block_2 = KVAEResnetBlock2D(in_channels=block_in, out_channels=block_in,
                                             temb_channels=0, zq_ch=zq_ch, add_conv=add_conv)
        ups = []
        for i_level in reversed(range(self.num_resolutions)):
            block_out = ch * ch_mult[i_level]
            level = _Level()
            blocks = []
            for _ in range(num_res_blocks + 1):
                blocks.append(KVAEResnetBlock2D(in_channels=block_in, out_channels=block_out,
                                                temb_channels=0, zq_ch=zq_ch, add_conv=add_conv))
                block_in = block_out
            level.block = ModuleList(blocks)
            if i_level != 0:
                level.upsample = KVAEPXSUpsample(in_channels=block_in)
            ups.insert(0, level)
        self.up = ModuleList(ups)
        self.norm_out = KVAEDecoderSpatialNorm2D(block_in, zq_ch, add_conv=add_conv)
        self.conv_out = PadConv2d(block_in, out_ch, kernel_size=3, padding=1)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        zq = z
        h = self.conv_in(params["conv_in"], z)
        h = self.mid.block_1(params["mid"]["block_1"], h, zq)
        h = self.mid.block_2(params["mid"]["block_2"], h, zq)
        for i_level in reversed(range(self.num_resolutions)):
            lp = params["up"][i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = self.up[i_level].block[i_block](lp["block"][i_block], h, zq)
            if i_level != 0:
                h = self.up[i_level].upsample(lp["upsample"], h)
        if self.give_pre_end:
            return h
        h = jax.nn.silu(self.norm_out(params["norm_out"], h, zq))
        return self.conv_out(params["conv_out"], h)


class AutoencoderKLKVAE(Module, ModelMixin, ConfigMixin):
    """Kandinsky KVAE (reference `:521`). I/O is NCHW at the public API."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        channels: int = 128,
        num_enc_blocks: int = 2,
        num_dec_blocks: int = 2,
        z_channels: int = 16,
        double_z: bool = True,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 8),
        sample_size: int = 1024,
    ):
        super().__init__()
        self.encoder = KVAEEncoder2D(in_channels=in_channels, ch=channels, ch_mult=tuple(ch_mult),
                                     num_res_blocks=num_enc_blocks, z_channels=z_channels,
                                     double_z=double_z)
        self.decoder = KVAEDecoder2D(out_ch=in_channels, ch=channels, ch_mult=tuple(ch_mult),
                                     num_res_blocks=num_dec_blocks, z_channels=z_channels)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = self.encoder(params["encoder"], jnp.transpose(x, (0, 2, 3, 1)))
        moments = jnp.transpose(h, (0, 3, 1, 2))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        dec = self.decoder(params["decoder"], jnp.transpose(z, (0, 2, 3, 1)))
        dec = jnp.transpose(dec, (0, 3, 1, 2))
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

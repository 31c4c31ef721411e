"""AutoencoderKLHunyuanImageRefiner — HunyuanImage-2.1 refiner VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanimage_refiner.py:593`):
a causal 3D DCAE-style VAE with L2-RMS norms (F.normalize ⋅ √C ⋅ γ),
pixel-shuffle down/upsampling whose shortcut branches mean-pool / repeat
channels, mean-group shortcut at the encoder output and repeat shortcut at
the decoder input, and a single-head attention mid-block.

TPU-first: NDHWC activations; the DCAE (un)shuffles are reshape/transposes.
16× spatial / 4× temporal compression at default config.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


class _RefinerCausalConv3d(Module):
    """Causal conv: replicate pad (t: k-1 left, hw: symmetric) then conv
    (reference `:34`). Param subtree "conv"."""

    def __init__(self, in_channels, out_channels, kernel_size=3):
        super().__init__()
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        self.k = k
        self.conv = Conv3d(in_channels, out_channels, kernel_size=k, stride=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.k
        x = jnp.pad(x, ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                    mode="edge")
        return self.conv(params["conv"], x)


class _RefinerRMSNorm(Module):
    """x/||x||₂(channel) · √C · γ (reference HunyuanImageRefinerRMS_norm `:67`)."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"gamma": jnp.ones((self.dim,), dtype)}

    def convert_torch_param(self, pname, tensor):
        return pname, tensor.reshape(-1)

    def convert_param_to_torch(self, pname, array):
        return pname, array.reshape(-1, 1, 1, 1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        out = (xf / jnp.maximum(norm, 1e-12)).astype(x.dtype)
        return out * (self.dim ** 0.5) * params["gamma"].astype(x.dtype)


class _RefinerAttnBlock(Module):
    """Single-head global attention over flattened f·h·w (reference `:100`)."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.norm = _RefinerRMSNorm(in_channels)
        self.to_q = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)
        self.to_k = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)
        self.to_v = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)
        self.proj_out = Conv3d(in_channels, in_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        identity = x
        xn = self.norm(params["norm"], x)
        q = self.to_q(params["to_q"], xn).reshape(b, -1, c)
        k = self.to_k(params["to_k"], xn).reshape(b, -1, c)
        v = self.to_v(params["to_v"], xn).reshape(b, -1, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / math.sqrt(c), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, f, h, w, c)
        return self.proj_out(params["proj_out"], out) + identity


def _dcae_up(x: jax.Array, r1: int, r2: int, r3: int) -> jax.Array:
    """(b, f, h, w, r1·r2·r3·c) → (b, r1·f, r2·h, r3·w, c), torch channel
    order (r1, r2, r3, c) (reference `_dcae_upsample_rearrange`, `:147`)."""
    b, f, h, w, pc = x.shape
    c = pc // (r1 * r2 * r3)
    x = x.reshape(b, f, h, w, r1, r2, r3, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))  # b f r1 h r2 w r3 c
    return x.reshape(b, f * r1, h * r2, w * r3, c)


def _dcae_down(x: jax.Array, r1: int, r2: int, r3: int) -> jax.Array:
    """(b, r1·f, r2·h, r3·w, c) → (b, f, h, w, r1·r2·r3·c) (reference `:195`)."""
    b, pf, ph, pw, c = x.shape
    f, h, w = pf // r1, ph // r2, pw // r3
    x = x.reshape(b, f, r1, h, r2, w, r3, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))  # b f h w r1 r2 r3 c
    return x.reshape(b, f, h, w, r1 * r2 * r3 * c)


class _UpsampleDCAE(Module):
    def __init__(self, in_channels: int, out_channels: int, add_temporal_upsample: bool = True):
        super().__init__()
        factor = 8 if add_temporal_upsample else 4
        self.conv = _RefinerCausalConv3d(in_channels, out_channels * factor, kernel_size=3)
        self.add_temporal_upsample = add_temporal_upsample
        self.repeats = factor * out_channels // in_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv(params["conv"], x)
        if self.add_temporal_upsample:
            # spatial shuffle first, then split off the temporal duplicate and
            # interleave frames: torch keeps channels [:c//2] after r2,r3
            # shuffle — equivalent to the reference's two-phase rearrange
            h = _dcae_up(h, 1, 2, 2)
            h = h[..., : h.shape[-1] // 2]
            sc = _dcae_up(x, 1, 2, 2)
            sc = jnp.repeat(sc, self.repeats // 2, axis=-1)
        else:
            h = _dcae_up(h, 1, 2, 2)
            sc = jnp.repeat(x, self.repeats, axis=-1)
            sc = _dcae_up(sc, 1, 2, 2)
        return h + sc


class _DownsampleDCAE(Module):
    def __init__(self, in_channels: int, out_channels: int, add_temporal_downsample: bool = True):
        super().__init__()
        factor = 8 if add_temporal_downsample else 4
        self.conv = _RefinerCausalConv3d(in_channels, out_channels // factor, kernel_size=3)
        self.add_temporal_downsample = add_temporal_downsample
        self.group_size = factor * in_channels // out_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv(params["conv"], x)
        if self.add_temporal_downsample:
            h = _dcae_down(h, 1, 2, 2)
            h = jnp.concatenate([h, h], axis=-1)
            sc = _dcae_down(x, 1, 2, 2)
            b, f, hh, ww, C = sc.shape
            sc = sc.reshape(b, f, hh, ww, h.shape[-1], self.group_size // 2).mean(axis=-1)
        else:
            h = _dcae_down(h, 1, 2, 2)
            sc = _dcae_down(x, 1, 2, 2)
            b, f, hh, ww, C = sc.shape
            sc = sc.reshape(b, f, hh, ww, h.shape[-1], self.group_size).mean(axis=-1)
        return h + sc


class _RefinerResnetBlock(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None):
        super().__init__()
        out_channels = out_channels or in_channels
        self.in_channels, self.out_channels = in_channels, out_channels
        self.norm1 = _RefinerRMSNorm(in_channels)
        self.conv1 = _RefinerCausalConv3d(in_channels, out_channels, kernel_size=3)
        self.norm2 = _RefinerRMSNorm(out_channels)
        self.conv2 = _RefinerCausalConv3d(out_channels, out_channels, kernel_size=3)
        if in_channels != out_channels:
            self.conv_shortcut = Conv3d(in_channels, out_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        res = x
        h = jax.nn.silu(self.norm1(params["norm1"], x))
        h = self.conv1(params["conv1"], h)
        h = jax.nn.silu(self.norm2(params["norm2"], h))
        h = self.conv2(params["conv2"], h)
        if self.in_channels != self.out_channels:
            res = self.conv_shortcut(params["conv_shortcut"], res)
        return h + res


class _RefinerMidBlock(Module):
    def __init__(self, in_channels: int, num_layers: int = 1):
        super().__init__()
        self.resnets = ModuleList(
            [_RefinerResnetBlock(in_channels) for _ in range(num_layers + 1)])
        self.attentions = ModuleList([_RefinerAttnBlock(in_channels) for _ in range(num_layers)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i, attn in enumerate(self.attentions):
            x = attn(params["attentions"][i], x)
            x = self.resnets[i + 1](params["resnets"][i + 1], x)
        return x


class _RefinerDownBlock(Module):
    def __init__(self, in_channels, out_channels, num_layers=1,
                 downsample_out_channels=None, add_temporal_downsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(_RefinerResnetBlock(in_channels if i == 0 else out_channels, out_channels))
        self.resnets = ModuleList(resnets)
        self.has_down = downsample_out_channels is not None
        if self.has_down:
            self.downsamplers = ModuleList([
                _DownsampleDCAE(out_channels, downsample_out_channels, add_temporal_downsample)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        if self.has_down:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class _RefinerUpBlock(Module):
    def __init__(self, in_channels, out_channels, num_layers=1,
                 upsample_out_channels=None, add_temporal_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(_RefinerResnetBlock(in_channels if i == 0 else out_channels, out_channels))
        self.resnets = ModuleList(resnets)
        self.has_up = upsample_out_channels is not None
        if self.has_up:
            self.upsamplers = ModuleList([
                _UpsampleDCAE(out_channels, upsample_out_channels, add_temporal_upsample)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        if self.has_up:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        return x


class HunyuanImageRefinerEncoder3D(Module):
    def __init__(self, in_channels=3, out_channels=64, block_out_channels=(128, 256, 512, 1024, 1024),
                 layers_per_block=2, temporal_compression_ratio=4, spatial_compression_ratio=16,
                 downsample_match_channel=True):
        super().__init__()
        self.group_size = block_out_channels[-1] // out_channels
        self.conv_in = _RefinerCausalConv3d(in_channels, block_out_channels[0], kernel_size=3)
        blocks = []
        input_channel = block_out_channels[0]
        for i in range(len(block_out_channels)):
            add_spatial = i < np.log2(spatial_compression_ratio)
            output_channel = block_out_channels[i]
            if not add_spatial:
                blocks.append(_RefinerDownBlock(input_channel, output_channel,
                                                num_layers=layers_per_block))
                input_channel = output_channel
            else:
                add_temporal = i >= np.log2(spatial_compression_ratio // temporal_compression_ratio)
                ds_out = block_out_channels[i + 1] if downsample_match_channel else output_channel
                blocks.append(_RefinerDownBlock(input_channel, output_channel,
                                                num_layers=layers_per_block,
                                                downsample_out_channels=ds_out,
                                                add_temporal_downsample=add_temporal))
                input_channel = ds_out
        self.down_blocks = ModuleList(blocks)
        self.mid_block = _RefinerMidBlock(block_out_channels[-1])
        self.norm_out = _RefinerRMSNorm(block_out_channels[-1])
        self.conv_out = _RefinerCausalConv3d(block_out_channels[-1], out_channels, kernel_size=3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], x)
        for i, b in enumerate(self.down_blocks):
            h = b(params["down_blocks"][i], h)
        h = self.mid_block(params["mid_block"], h)
        b_, f, hh, ww, c = h.shape
        short_cut = h.reshape(b_, f, hh, ww, -1, self.group_size).mean(axis=-1)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        h = self.conv_out(params["conv_out"], h)
        return h + short_cut


class HunyuanImageRefinerDecoder3D(Module):
    def __init__(self, in_channels=32, out_channels=3, block_out_channels=(1024, 1024, 512, 256, 128),
                 layers_per_block=2, spatial_compression_ratio=16, temporal_compression_ratio=4,
                 upsample_match_channel=True):
        super().__init__()
        self.repeat = block_out_channels[0] // in_channels
        self.conv_in = _RefinerCausalConv3d(in_channels, block_out_channels[0], kernel_size=3)
        self.mid_block = _RefinerMidBlock(block_out_channels[0])
        blocks = []
        input_channel = block_out_channels[0]
        for i in range(len(block_out_channels)):
            output_channel = block_out_channels[i]
            add_spatial = i < np.log2(spatial_compression_ratio)
            add_temporal = i < np.log2(temporal_compression_ratio)
            if add_spatial or add_temporal:
                us_out = block_out_channels[i + 1] if upsample_match_channel else output_channel
                blocks.append(_RefinerUpBlock(input_channel, output_channel,
                                              num_layers=layers_per_block + 1,
                                              upsample_out_channels=us_out,
                                              add_temporal_upsample=add_temporal))
                input_channel = us_out
            else:
                blocks.append(_RefinerUpBlock(input_channel, output_channel,
                                              num_layers=layers_per_block + 1))
                input_channel = output_channel
        self.up_blocks = ModuleList(blocks)
        self.norm_out = _RefinerRMSNorm(block_out_channels[-1])
        self.conv_out = _RefinerCausalConv3d(block_out_channels[-1], out_channels, kernel_size=3)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], z) + jnp.repeat(z, self.repeat, axis=-1)
        h = self.mid_block(params["mid_block"], h)
        for i, b in enumerate(self.up_blocks):
            h = b(params["up_blocks"][i], h)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        return self.conv_out(params["conv_out"], h)


class AutoencoderKLHunyuanImageRefiner(Module, ModelMixin, ConfigMixin):
    """HunyuanImage-2.1 refiner VAE (reference `:593`). Public I/O NCTHW."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 32,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024),
        layers_per_block: int = 2,
        spatial_compression_ratio: int = 16,
        temporal_compression_ratio: int = 4,
        downsample_match_channel: bool = True,
        upsample_match_channel: bool = True,
        scaling_factor: float = 1.03682,
    ):
        super().__init__()
        self.encoder = HunyuanImageRefinerEncoder3D(
            in_channels=in_channels, out_channels=latent_channels * 2,
            block_out_channels=tuple(block_out_channels), layers_per_block=layers_per_block,
            temporal_compression_ratio=temporal_compression_ratio,
            spatial_compression_ratio=spatial_compression_ratio,
            downsample_match_channel=downsample_match_channel,
        )
        self.decoder = HunyuanImageRefinerDecoder3D(
            in_channels=latent_channels, out_channels=out_channels,
            block_out_channels=tuple(reversed(block_out_channels)),
            layers_per_block=layers_per_block,
            temporal_compression_ratio=temporal_compression_ratio,
            spatial_compression_ratio=spatial_compression_ratio,
            upsample_match_channel=upsample_match_channel,
        )

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = self.encoder(params["encoder"], jnp.transpose(x, (0, 2, 3, 4, 1)))
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        dec = self.decoder(params["decoder"], jnp.transpose(z, (0, 2, 3, 4, 1)))
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

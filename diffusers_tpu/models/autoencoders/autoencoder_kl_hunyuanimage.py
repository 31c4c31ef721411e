"""AutoencoderKLHunyuanImage — HunyuanImage-2.1's 32x spatial VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanimage.py:412`):
plain resnet stacks with pixel-(un)shuffle down/upsampling whose shortcuts
are channel-group means / repeats (`:122,:158`), a single-head attention mid
block (`:80,:190`), and residual heads — the encoder output adds a
channel-group-mean residual (`:313`), the decoder input adds a
channel-repeat residual (`:394`).

TPU-first: NHWC internals (channels on the 128-lane minor axis); the pixel
shuffles are reshape/transpose pairs XLA fuses into the surrounding convs.
Boundary stays NCHW for reference parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


class HunyuanImageResnetBlock(Module):
    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.norm1 = GroupNorm(32, in_channels, eps=1e-6)
        self.conv1 = Conv2d(in_channels, out_channels, kernel_size=3, padding=1)
        self.norm2 = GroupNorm(32, out_channels, eps=1e-6)
        self.conv2 = Conv2d(out_channels, out_channels, kernel_size=3, padding=1)
        self.conv_shortcut = (
            Conv2d(in_channels, out_channels, kernel_size=1) if in_channels != out_channels else None
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = self.conv1(params["conv1"], jax.nn.silu(self.norm1(params["norm1"], x)))
        x = self.conv2(params["conv2"], jax.nn.silu(self.norm2(params["norm2"], x)))
        # NOTE the reference applies the shortcut conv to the BRANCH, not the
        # residual (`:74-77`) — mirror that quirk exactly
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(params["conv_shortcut"], x)
        return x + residual


class HunyuanImageAttentionBlock(Module):
    """Single-head self-attention over the spatial grid (reference `:80`)."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.norm = GroupNorm(32, in_channels, eps=1e-6)
        self.to_q = Conv2d(in_channels, in_channels, kernel_size=1)
        self.to_k = Conv2d(in_channels, in_channels, kernel_size=1)
        self.to_v = Conv2d(in_channels, in_channels, kernel_size=1)
        self.proj = Conv2d(in_channels, in_channels, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        identity = x
        b, h, w, c = x.shape
        x = self.norm(params["norm"], x)
        q = self.to_q(params["to_q"], x).reshape(b, h * w, 1, c)
        k = self.to_k(params["to_k"], x).reshape(b, h * w, 1, c)
        v = self.to_v(params["to_v"], x).reshape(b, h * w, 1, c)
        out = dispatch_attention_fn(q, k, v).reshape(b, h, w, c).astype(x.dtype)
        return self.proj(params["proj"], out) + identity


def _pixel_unshuffle(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel order (r1, r2, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _pixel_shuffle(x: jax.Array) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C], channel order (r1, r2, c)."""
    b, h, w, c4 = x.shape
    x = x.reshape(b, h, w, 2, 2, c4 // 4)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c4 // 4)


class HunyuanImageDownsample(Module):
    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.conv = Conv2d(in_channels, out_channels // 4, kernel_size=3, padding=1)
        self.group_size = 4 * in_channels // out_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = _pixel_unshuffle(self.conv(params["conv"], x))
        shortcut = _pixel_unshuffle(x)
        b, hh, ww, c = shortcut.shape
        shortcut = shortcut.reshape(b, hh, ww, h.shape[-1], self.group_size).mean(axis=-1)
        return h + shortcut


class HunyuanImageUpsample(Module):
    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.conv = Conv2d(in_channels, out_channels * 4, kernel_size=3, padding=1)
        self.repeats = 4 * out_channels // in_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = _pixel_shuffle(self.conv(params["conv"], x))
        shortcut = _pixel_shuffle(jnp.repeat(x, self.repeats, axis=-1))
        return h + shortcut


class HunyuanImageMidBlock(Module):
    def __init__(self, in_channels: int, num_layers: int = 1):
        super().__init__()
        self.resnets = ModuleList(
            [HunyuanImageResnetBlock(in_channels, in_channels) for _ in range(num_layers + 1)])
        self.attentions = ModuleList([HunyuanImageAttentionBlock(in_channels) for _ in range(num_layers)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i, attn in enumerate(self.attentions):
            x = attn(params["attentions"][i], x)
            x = self.resnets[i + 1](params["resnets"][i + 1], x)
        return x


class HunyuanImageEncoder2D(Module):
    def __init__(self, in_channels, z_channels, block_out_channels, num_res_blocks,
                 spatial_compression_ratio, downsample_match_channel=True):
        super().__init__()
        self.group_size = block_out_channels[-1] // (2 * z_channels)
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)

        blocks = []
        ch = block_out_channels[0]
        n_down = int(math.log2(spatial_compression_ratio))
        for i, out_ch in enumerate(block_out_channels):
            for _ in range(num_res_blocks):
                blocks.append(HunyuanImageResnetBlock(ch, out_ch))
                ch = out_ch
            if i < n_down and i != len(block_out_channels) - 1:
                if downsample_match_channel:
                    out_ch = block_out_channels[i + 1]
                blocks.append(HunyuanImageDownsample(ch, out_ch))
                ch = out_ch
        self.down_blocks = ModuleList(blocks)
        self.mid_block = HunyuanImageMidBlock(block_out_channels[-1])
        self.norm_out = GroupNorm(32, block_out_channels[-1], eps=1e-6)
        self.conv_out = Conv2d(block_out_channels[-1], 2 * z_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        b, h, w, c = x.shape
        residual = x.reshape(b, h, w, c // self.group_size, self.group_size).mean(axis=-1)
        x = self.conv_out(params["conv_out"], jax.nn.silu(self.norm_out(params["norm_out"], x)))
        return x + residual


class HunyuanImageDecoder2D(Module):
    def __init__(self, z_channels, out_channels, block_out_channels, num_res_blocks,
                 spatial_compression_ratio, upsample_match_channel=True):
        super().__init__()
        self.repeat = block_out_channels[0] // z_channels
        self.conv_in = Conv2d(z_channels, block_out_channels[0], kernel_size=3, padding=1)
        self.mid_block = HunyuanImageMidBlock(block_out_channels[0])

        blocks = []
        ch = block_out_channels[0]
        n_up = int(math.log2(spatial_compression_ratio))
        for i, out_ch in enumerate(block_out_channels):
            for _ in range(num_res_blocks + 1):
                blocks.append(HunyuanImageResnetBlock(ch, out_ch))
                ch = out_ch
            if i < n_up and i != len(block_out_channels) - 1:
                if upsample_match_channel:
                    out_ch = block_out_channels[i + 1]
                blocks.append(HunyuanImageUpsample(ch, out_ch))
                ch = out_ch
        self.up_blocks = ModuleList(blocks)
        self.norm_out = GroupNorm(32, block_out_channels[-1], eps=1e-6)
        self.conv_out = Conv2d(block_out_channels[-1], out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        h = self.conv_in(params["conv_in"], z) + jnp.repeat(z, self.repeat, axis=-1)
        h = self.mid_block(params["mid_block"], h)
        for i, block in enumerate(self.up_blocks):
            h = block(params["up_blocks"][i], h)
        return self.conv_out(params["conv_out"], jax.nn.silu(self.norm_out(params["norm_out"], h)))


class AutoencoderKLHunyuanImage(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 64,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512, 1024, 1024),
        layers_per_block: int = 2,
        spatial_compression_ratio: int = 32,
        sample_size: int = 384,
        scaling_factor: Optional[float] = 0.75289,
        downsample_match_channel: bool = True,
        upsample_match_channel: bool = True,
    ):
        super().__init__()
        self.encoder = HunyuanImageEncoder2D(
            in_channels, latent_channels, tuple(block_out_channels), layers_per_block,
            spatial_compression_ratio, downsample_match_channel)
        self.decoder = HunyuanImageDecoder2D(
            latent_channels, out_channels, tuple(reversed(block_out_channels)), layers_per_block,
            spatial_compression_ratio, upsample_match_channel)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, H, W] -> posterior over NCHW moments."""
        h = self.encoder(params["encoder"], jnp.transpose(x, (0, 2, 3, 1)))
        posterior = DiagonalGaussianDistribution(jnp.transpose(h, (0, 3, 1, 2)))
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        dec = self.decoder(params["decoder"], jnp.transpose(z, (0, 2, 3, 1)))
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

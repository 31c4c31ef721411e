"""AutoencoderKLHunyuanVideo15 — 3D causal video VAE (HunyuanVideo 1.5).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanvideo15.py:634`
AutoencoderKLHunyuanVideo15): replicate-padded causal convs (`:34`),
channel-wise RMS norm `x/||x||·sqrt(C)·gamma` (`:67`), causal frame-level
attention mid-block (`:100`), DCAE-style pixel-shuffle down/upsampling with
channel-averaged / channel-repeated residual shortcuts where the FIRST frame
is shuffled spatially only (`:164`, `:220`), encoder group-mean residual
(`:541`) and decoder channel-repeat residual (`:613`), 16x spatial / 4x
temporal compression.

TPU-first: NDHWC layout end-to-end; the pixel (un)shuffles are pure
reshape/transpose pairs that XLA fuses into the adjacent convs; the causal
attention mask is a host-precomputed frame-index comparison.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .autoencoder_kl_hunyuan_video import HYCausalConv3d
from .vae import DiagonalGaussianDistribution


@dataclass
class DecoderOutput(BaseOutput):
    sample: jax.Array


class HV15RMSNorm(Module):
    """Channel-wise RMS norm (reference `:67`): L2-normalize over channels,
    rescale by sqrt(C)·gamma. Channel-last here."""

    def __init__(self, dim: int, bias: bool = False):
        super().__init__()
        self.dim = dim
        self.use_bias = bias

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        p = {"gamma": jnp.ones((self.dim,), jnp.float32)}
        if self.use_bias:
            p["bias"] = jnp.zeros((self.dim,), jnp.float32)
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
        normalized = (xf / jnp.maximum(norm, 1e-12)).astype(dtype)
        gamma = params["gamma"].reshape(-1)
        out = normalized * (self.dim ** 0.5) * gamma
        if self.use_bias:
            out = out + params["bias"].reshape(-1)
        return out


class HV15AttnBlock(Module):
    """Single-head causal (frame-level) self-attention over T·H·W tokens
    (reference `:100`)."""

    def __init__(self, in_channels: int):
        super().__init__()
        self.in_channels = in_channels
        self.norm = HV15RMSNorm(in_channels)
        self.to_q = Conv3d(in_channels, in_channels, kernel_size=(1, 1, 1))
        self.to_k = Conv3d(in_channels, in_channels, kernel_size=(1, 1, 1))
        self.to_v = Conv3d(in_channels, in_channels, kernel_size=(1, 1, 1))
        self.proj_out = Conv3d(in_channels, in_channels, kernel_size=(1, 1, 1))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:  # [B,T,H,W,C]
        identity = x
        b, t, h, w, c = x.shape
        x = self.norm(params["norm"], x)
        q = self.to_q(params["to_q"], x).reshape(b, t * h * w, 1, c)
        k = self.to_k(params["to_k"], x).reshape(b, t * h * w, 1, c)
        v = self.to_v(params["to_v"], x).reshape(b, t * h * w, 1, c)
        frame = np.repeat(np.arange(t), h * w)
        keep = jnp.asarray(frame[None, :] <= frame[:, None])[None, None]
        out = dispatch_attention_fn(q, k, v, attn_mask=keep)
        out = out.reshape(b, t, h, w, c)
        out = self.proj_out(params["proj_out"], out)
        return out + identity


def _shuffle_down(x: jax.Array, r1: int, r2: int, r3: int) -> jax.Array:
    """(b, f·r1, h·r2, w·r3, c) -> (b, f, h, w, r1·r2·r3·c); packed channel
    order (r1, r2, r3, c) matches the reference's channel-first rearrange."""
    b, pf, ph, pw, c = x.shape
    f, h, w = pf // r1, ph // r2, pw // r3
    x = x.reshape(b, f, r1, h, r2, w, r3, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b, f, h, w, r1 * r2 * r3 * c)


def _shuffle_up(x: jax.Array, r1: int, r2: int, r3: int) -> jax.Array:
    """(b, f, h, w, r1·r2·r3·c) -> (b, f·r1, h·r2, w·r3, c)."""
    b, f, h, w, pc = x.shape
    c = pc // (r1 * r2 * r3)
    x = x.reshape(b, f, h, w, r1, r2, r3, c)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(b, f * r1, h * r2, w * r3, c)


class HV15Downsample(Module):
    """Strideless conv + pixel-unshuffle with mean-pooled channel shortcut;
    the first frame only shuffles spatially and is duplicated temporally
    (reference `:220`)."""

    def __init__(self, in_channels: int, out_channels: int, add_temporal_downsample: bool = True):
        super().__init__()
        factor = 8 if add_temporal_downsample else 4
        self.conv = HYCausalConv3d(in_channels, out_channels // factor, 3, 1, 0)
        self.add_temporal_downsample = add_temporal_downsample
        self.group_size = factor * in_channels // out_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv(params["conv"], x)
        if self.add_temporal_downsample:
            h_first = _shuffle_down(h[:, :1], 1, 2, 2)
            h_first = jnp.concatenate([h_first, h_first], axis=-1)
            h_next = _shuffle_down(h[:, 1:], 2, 2, 2)
            h = jnp.concatenate([h_first, h_next], axis=1)

            x_first = _shuffle_down(x[:, :1], 1, 2, 2)
            x_first = x_first.reshape(*x_first.shape[:-1], h.shape[-1], self.group_size // 2).mean(-1)
            x_next = _shuffle_down(x[:, 1:], 2, 2, 2)
            x_next = x_next.reshape(*x_next.shape[:-1], h.shape[-1], self.group_size).mean(-1)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            h = _shuffle_down(h, 1, 2, 2)
            shortcut = _shuffle_down(x, 1, 2, 2)
            shortcut = shortcut.reshape(*shortcut.shape[:-1], h.shape[-1], self.group_size).mean(-1)
        return h + shortcut


class HV15Upsample(Module):
    """Conv + pixel-shuffle with channel-repeated shortcut; the first frame
    only shuffles spatially and keeps half its channels (reference `:164`)."""

    def __init__(self, in_channels: int, out_channels: int, add_temporal_upsample: bool = True):
        super().__init__()
        factor = 8 if add_temporal_upsample else 4
        self.conv = HYCausalConv3d(in_channels, out_channels * factor, 3, 1, 0)
        self.add_temporal_upsample = add_temporal_upsample
        self.repeats = factor * out_channels // in_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv(params["conv"], x)
        if self.add_temporal_upsample:
            h_first = _shuffle_up(h[:, :1], 1, 2, 2)
            h_first = h_first[..., : h_first.shape[-1] // 2]
            h_next = _shuffle_up(h[:, 1:], 2, 2, 2)
            h = jnp.concatenate([h_first, h_next], axis=1)

            x_first = _shuffle_up(x[:, :1], 1, 2, 2)
            x_first = jnp.repeat(x_first, self.repeats // 2, axis=-1)
            x_next = _shuffle_up(x[:, 1:], 2, 2, 2)
            x_next = jnp.repeat(x_next, self.repeats, axis=-1)
            shortcut = jnp.concatenate([x_first, x_next], axis=1)
        else:
            h = _shuffle_up(h, 1, 2, 2)
            shortcut = _shuffle_up(jnp.repeat(x, self.repeats, axis=-1), 1, 2, 2)
        return h + shortcut


class HV15ResnetBlock(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = HV15RMSNorm(in_channels)
        self.conv1 = HYCausalConv3d(in_channels, out_channels, 3, 1, 0)
        self.norm2 = HV15RMSNorm(out_channels)
        self.conv2 = HYCausalConv3d(out_channels, out_channels, 3, 1, 0)
        self.conv_shortcut = (
            Conv3d(in_channels, out_channels, kernel_size=(1, 1, 1)) if in_channels != out_channels else None
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = self.conv1(params["conv1"], jax.nn.silu(self.norm1(params["norm1"], x)))
        x = self.conv2(params["conv2"], jax.nn.silu(self.norm2(params["norm2"], x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(params["conv_shortcut"], residual)
        return x + residual


class HV15MidBlock(Module):
    def __init__(self, in_channels: int, num_layers: int = 1, add_attention: bool = True):
        super().__init__()
        self.resnets = ModuleList(
            [HV15ResnetBlock(in_channels, in_channels) for _ in range(num_layers + 1)]
        )
        self.attentions = ModuleList(
            [HV15AttnBlock(in_channels) for _ in range(num_layers)] if add_attention else []
        )
        self.add_attention = add_attention

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i in range(len(self.resnets) - 1):
            if self.add_attention:
                x = self.attentions[i](params["attentions"][i], x)
            x = self.resnets[i + 1](params["resnets"][i + 1], x)
        return x


class HV15DownBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 downsample_out_channels: Optional[int] = None, add_temporal_downsample: bool = True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(HV15ResnetBlock(in_channels if i == 0 else out_channels, out_channels))
        self.resnets = ModuleList(resnets)
        self.downsamplers = (
            ModuleList([HV15Downsample(out_channels, downsample_out_channels, add_temporal_downsample)])
            if downsample_out_channels is not None else None
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class HV15UpBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 upsample_out_channels: Optional[int] = None, add_temporal_upsample: bool = True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(HV15ResnetBlock(in_channels if i == 0 else out_channels, out_channels))
        self.resnets = ModuleList(resnets)
        self.upsamplers = (
            ModuleList([HV15Upsample(out_channels, upsample_out_channels, add_temporal_upsample)])
            if upsample_out_channels is not None else None
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        return x


class HV15Encoder3D(Module):
    """Reference `:464`: downsample schedule derives from the compression
    ratios; the output adds a group-mean channel shortcut."""

    def __init__(self, in_channels: int, out_channels: int, block_out_channels: Tuple[int, ...],
                 layers_per_block: int, temporal_compression_ratio: int,
                 spatial_compression_ratio: int, downsample_match_channel: bool):
        super().__init__()
        self.out_channels = out_channels
        self.group_size = block_out_channels[-1] // out_channels
        self.conv_in = HYCausalConv3d(in_channels, block_out_channels[0], 3, 1, 0)

        n_spatial = int(np.log2(spatial_compression_ratio))
        n_pre_temporal = int(np.log2(spatial_compression_ratio // temporal_compression_ratio))
        down_blocks = []
        input_channel = block_out_channels[0]
        for i in range(len(block_out_channels)):
            output_channel = block_out_channels[i]
            if i < n_spatial:
                downsample_out = block_out_channels[i + 1] if downsample_match_channel else output_channel
                down_blocks.append(HV15DownBlock3D(
                    input_channel, output_channel, layers_per_block,
                    downsample_out_channels=downsample_out,
                    add_temporal_downsample=i >= n_pre_temporal))
                input_channel = downsample_out
            else:
                down_blocks.append(HV15DownBlock3D(
                    input_channel, output_channel, layers_per_block,
                    downsample_out_channels=None, add_temporal_downsample=False))
                input_channel = output_channel
        self.down_blocks = ModuleList(down_blocks)
        self.mid_block = HV15MidBlock(block_out_channels[-1])
        self.norm_out = HV15RMSNorm(block_out_channels[-1])
        self.conv_out = HYCausalConv3d(block_out_channels[-1], out_channels, 3, 1, 0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        shortcut = x.reshape(*x.shape[:-1], self.out_channels, self.group_size).mean(-1)
        x = self.conv_out(params["conv_out"], jax.nn.silu(self.norm_out(params["norm_out"], x)))
        return x + shortcut


class HV15Decoder3D(Module):
    """Reference `:550`: conv_in adds a channel-repeat shortcut; upsample
    schedule mirrors the encoder."""

    def __init__(self, in_channels: int, out_channels: int, block_out_channels: Tuple[int, ...],
                 layers_per_block: int, spatial_compression_ratio: int,
                 temporal_compression_ratio: int, upsample_match_channel: bool):
        super().__init__()
        self.repeat = block_out_channels[0] // in_channels
        self.conv_in = HYCausalConv3d(in_channels, block_out_channels[0], 3, 1, 0)
        self.mid_block = HV15MidBlock(block_out_channels[0])

        n_spatial = int(np.log2(spatial_compression_ratio))
        n_temporal = int(np.log2(temporal_compression_ratio))
        up_blocks = []
        input_channel = block_out_channels[0]
        for i in range(len(block_out_channels)):
            output_channel = block_out_channels[i]
            if i < n_spatial or i < n_temporal:
                upsample_out = block_out_channels[i + 1] if upsample_match_channel else output_channel
                up_blocks.append(HV15UpBlock3D(
                    input_channel, output_channel, layers_per_block + 1,
                    upsample_out_channels=upsample_out,
                    add_temporal_upsample=i < n_temporal))
                input_channel = upsample_out
            else:
                up_blocks.append(HV15UpBlock3D(
                    input_channel, output_channel, layers_per_block + 1,
                    upsample_out_channels=None, add_temporal_upsample=False))
                input_channel = output_channel
        self.up_blocks = ModuleList(up_blocks)
        self.norm_out = HV15RMSNorm(block_out_channels[-1])
        self.conv_out = HYCausalConv3d(block_out_channels[-1], out_channels, 3, 1, 0)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], z) + jnp.repeat(z, self.repeat, axis=-1)
        x = self.mid_block(params["mid_block"], x)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        return self.conv_out(params["conv_out"], jax.nn.silu(self.norm_out(params["norm_out"], x)))


class AutoencoderKLHunyuanVideo15(Module, ModelMixin, ConfigMixin):
    """Reference `:634`. External API is channel-first [B, C, F, H, W]."""

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
        self.encoder = HV15Encoder3D(
            in_channels, latent_channels * 2, tuple(block_out_channels), layers_per_block,
            temporal_compression_ratio, spatial_compression_ratio, downsample_match_channel)
        self.decoder = HV15Decoder3D(
            latent_channels, out_channels, tuple(reversed(block_out_channels)), layers_per_block,
            spatial_compression_ratio, temporal_compression_ratio, upsample_match_channel)
        self.spatial_compression_ratio = spatial_compression_ratio
        self.temporal_compression_ratio = temporal_compression_ratio

    def encode(self, params: Params, x: jax.Array) -> DiagonalGaussianDistribution:
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = self.encoder(params["encoder"], x)
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))
        return DiagonalGaussianDistribution(moments)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        dec = self.decoder(params["decoder"], z)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params: Params, sample: jax.Array, key: Optional[jax.Array] = None,
                 sample_posterior: bool = False, return_dict: bool = True):
        posterior = self.encode(params, sample)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(params, z, return_dict=return_dict)

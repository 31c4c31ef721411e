"""AutoencoderKLMagvit — the EasyAnimate 3D causal video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_magvit.py:665`
AutoencoderKLMagvit; EasyAnimateCausalConv3d `:34`, ResidualBlock3D `:147`,
Downsampler3D `:217`, Upsampler3D `:231`, Down/Up/Mid blocks `:271-427`,
Encoder `:428`, Decoder `:544`).

TPU-first: NDHWC activations, whole-video single-graph encode/decode. The
reference streams frames in mini-batches through stateful per-conv frame
caches (`prev_features`); chunked processing with those caches is exactly
equivalent to one pass over the full sequence with a replicate left-pad of
(k_t−1) frames on every causal conv, which is what we do (same equivalence our
LTX VAE uses). The temporal upsampler's first-chunk special case (reference
`:260-268`: the first latent frame is *not* temporally doubled) becomes a
static split: frame 0 stays single, frames 1.. are frame-repeated 2×.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, GroupNorm, Module, ModuleList, Params, get_activation
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class MagvitCausalConv3d(Conv3d):
    """Replicate-padded temporal-causal Conv3d (reference
    EasyAnimateCausalConv3d `:34` — which *extends* nn.Conv3d, so state-dict
    keys have no extra nesting). Spatial padding is symmetric `padding`;
    temporal padding is (k_t−1)·dilation replicate frames on the left."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, padding=1, dilation=1):
        k = _triple(kernel_size)
        s = _triple(stride)
        d = _triple(dilation)
        if padding is None:
            h_pad = ((k[1] - 1) * d[1] + (1 - s[1]) + 1) // 2
            w_pad = ((k[2] - 1) * d[2] + (1 - s[2]) + 1) // 2
        else:
            h_pad = w_pad = padding
        super().__init__(
            in_channels,
            out_channels,
            kernel_size=k,
            stride=s,
            padding=((0, 0), (h_pad, h_pad), (w_pad, w_pad)),
            dilation=d,
        )
        self.t_pad = (k[0] - 1) * d[0]

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, F, H, W, C]
        if self.t_pad > 0:
            left = jnp.repeat(x[:, :1], self.t_pad, axis=1)
            x = jnp.concatenate([left, x], axis=1)
        return super().__call__(params, x)


class _SpatialOrVideoGroupNorm(Module):
    """GroupNorm with per-frame (spatial) or whole-video statistics
    (reference `spatial_group_norm` flag, `:184-196`)."""

    def __init__(self, num_groups, num_channels, eps=1e-6, spatial: bool = True):
        super().__init__()
        self.norm = GroupNorm(num_groups, num_channels, eps=eps)
        self.spatial = spatial

    def init(self, key, dtype=jnp.float32) -> Params:
        return self.norm.init(key, dtype=dtype)

    def convert_torch_param(self, pname, tensor):
        return ("scale", tensor) if pname == "weight" else (pname, tensor)

    def convert_param_to_torch(self, pname, array):
        return ("weight", array) if pname == "scale" else (pname, array)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.spatial:
            b, f, h, w, c = x.shape
            return self.norm(params, x.reshape(b * f, h, w, c)).reshape(x.shape)
        return self.norm(params, x)


class MagvitResidualBlock3D(Module):
    """Reference EasyAnimateResidualBlock3D (`:147`)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        non_linearity: str = "silu",
        norm_num_groups: int = 32,
        norm_eps: float = 1e-6,
        spatial_group_norm: bool = True,
        output_scale_factor: float = 1.0,
    ):
        super().__init__()
        self.output_scale_factor = output_scale_factor
        self.nonlinearity = get_activation(non_linearity)
        self.norm1 = _SpatialOrVideoGroupNorm(norm_num_groups, in_channels, norm_eps, spatial_group_norm)
        self.conv1 = MagvitCausalConv3d(in_channels, out_channels, kernel_size=3)
        self.norm2 = _SpatialOrVideoGroupNorm(norm_num_groups, out_channels, norm_eps, spatial_group_norm)
        self.conv2 = MagvitCausalConv3d(out_channels, out_channels, kernel_size=3)
        self.shortcut = Conv3d(in_channels, out_channels, kernel_size=1, padding=0) if in_channels != out_channels else None

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        shortcut = self.shortcut(params["shortcut"], x) if self.shortcut is not None else x
        h = self.norm1(params["norm1"], x)
        h = self.nonlinearity(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h)
        h = self.nonlinearity(h)
        h = self.conv2(params["conv2"], h)
        return (h + shortcut) / self.output_scale_factor


class MagvitDownsampler3D(Module):
    """Pad (right/bottom by 1) then strided causal conv (reference `:217`)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=(2, 2, 2)):
        super().__init__()
        self.conv = MagvitCausalConv3d(in_channels, out_channels, kernel_size=kernel_size, stride=stride, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return self.conv(params["conv"], x)


class MagvitUpsampler3D(Module):
    """Nearest 2× spatial upsample → causal conv → optional temporal 2×
    (first frame single, rest doubled — reference `:255-268` chunk semantics)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, temporal_upsample=False, spatial_group_norm=True):
        super().__init__()
        self.temporal_upsample = temporal_upsample
        self.conv = MagvitCausalConv3d(in_channels, out_channels or in_channels, kernel_size=kernel_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = self.conv(params["conv"], x)
        if self.temporal_upsample:
            first, rest = x[:, :1], x[:, 1:]
            rest = jnp.repeat(rest, 2, axis=1)
            x = jnp.concatenate([first, rest], axis=1)
        return x


class MagvitDownBlock3D(Module):
    def __init__(self, in_channels, out_channels, num_layers=1, act_fn="silu", norm_num_groups=32,
                 norm_eps=1e-6, spatial_group_norm=True, add_downsample=True, add_temporal_downsample=True):
        super().__init__()
        convs = []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            convs.append(MagvitResidualBlock3D(cin, out_channels, act_fn, norm_num_groups, norm_eps, spatial_group_norm))
        self.convs = ModuleList(convs)
        self.downsampler = None
        if add_downsample:
            stride = (2, 2, 2) if add_temporal_downsample else (1, 2, 2)
            self.downsampler = MagvitDownsampler3D(out_channels, out_channels, kernel_size=3, stride=stride)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, conv in enumerate(self.convs):
            x = conv(params["convs"][i], x)
        if self.downsampler is not None:
            x = self.downsampler(params["downsampler"], x)
        return x


class MagvitUpBlock3d(Module):
    def __init__(self, in_channels, out_channels, num_layers=1, act_fn="silu", norm_num_groups=32,
                 norm_eps=1e-6, spatial_group_norm=False, add_upsample=True, add_temporal_upsample=True):
        super().__init__()
        convs = []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            convs.append(MagvitResidualBlock3D(cin, out_channels, act_fn, norm_num_groups, norm_eps, spatial_group_norm))
        self.convs = ModuleList(convs)
        self.upsampler = None
        if add_upsample:
            # reference quirk (`:343,359`): the loop rebinds `in_channels`, so
            # the upsampler lands on out_channels whenever num_layers >= 2
            up_ch = in_channels if num_layers == 1 else out_channels
            self.upsampler = MagvitUpsampler3D(up_ch, up_ch, temporal_upsample=add_temporal_upsample,
                                               spatial_group_norm=spatial_group_norm)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, conv in enumerate(self.convs):
            x = conv(params["convs"][i], x)
        if self.upsampler is not None:
            x = self.upsampler(params["upsampler"], x)
        return x


class MagvitMidBlock3d(Module):
    def __init__(self, in_channels, num_layers=1, act_fn="silu", norm_num_groups=32, norm_eps=1e-6,
                 spatial_group_norm=True, output_scale_factor=1.0):
        super().__init__()
        norm_num_groups = norm_num_groups if norm_num_groups is not None else min(in_channels // 4, 32)
        self.convs = ModuleList([
            MagvitResidualBlock3D(in_channels, in_channels, act_fn, norm_num_groups, norm_eps,
                                  spatial_group_norm, output_scale_factor)
            for _ in range(max(num_layers, 1))
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, conv in enumerate(self.convs):
            x = conv(params["convs"][i], x)
        return x


class MagvitEncoder(Module):
    """Reference EasyAnimateEncoder (`:428`)."""

    def __init__(self, in_channels=3, out_channels=8,
                 down_block_types=("SpatialDownBlock3D",) + ("SpatialTemporalDownBlock3D",) * 3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2, norm_num_groups=32,
                 act_fn="silu", double_z=True, spatial_group_norm=False):
        super().__init__()
        self.conv_in = MagvitCausalConv3d(in_channels, block_out_channels[0], kernel_size=3)
        blocks = []
        output_channels = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channels = output_channels
            output_channels = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            if block_type not in ("SpatialDownBlock3D", "SpatialTemporalDownBlock3D"):
                raise ValueError(f"unknown down block type {block_type}")
            blocks.append(MagvitDownBlock3D(
                input_channels, output_channels, num_layers=layers_per_block, act_fn=act_fn,
                norm_num_groups=norm_num_groups, norm_eps=1e-6, spatial_group_norm=spatial_group_norm,
                add_downsample=not is_final,
                add_temporal_downsample=block_type == "SpatialTemporalDownBlock3D"))
        self.down_blocks = ModuleList(blocks)
        self.mid_block = MagvitMidBlock3d(block_out_channels[-1], num_layers=layers_per_block, act_fn=act_fn,
                                          norm_num_groups=norm_num_groups, spatial_group_norm=spatial_group_norm)
        self.conv_norm_out = _SpatialOrVideoGroupNorm(norm_num_groups, block_out_channels[-1], 1e-6, spatial_group_norm)
        self.conv_act = get_activation(act_fn)
        self.conv_out = MagvitCausalConv3d(block_out_channels[-1], 2 * out_channels if double_z else out_channels, kernel_size=3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.conv_norm_out(params["conv_norm_out"], x)
        x = self.conv_act(x)
        return self.conv_out(params["conv_out"], x)


class MagvitDecoder(Module):
    """Reference EasyAnimateDecoder (`:544`)."""

    def __init__(self, in_channels=8, out_channels=3,
                 up_block_types=("SpatialUpBlock3D",) + ("SpatialTemporalUpBlock3D",) * 3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2, norm_num_groups=32,
                 act_fn="silu", spatial_group_norm=False):
        super().__init__()
        self.conv_in = MagvitCausalConv3d(in_channels, block_out_channels[-1], kernel_size=3)
        self.mid_block = MagvitMidBlock3d(block_out_channels[-1], num_layers=layers_per_block, act_fn=act_fn,
                                          norm_num_groups=norm_num_groups, spatial_group_norm=spatial_group_norm)
        reversed_channels = list(reversed(block_out_channels))
        blocks = []
        output_channels = reversed_channels[0]
        for i, block_type in enumerate(up_block_types):
            input_channels = output_channels
            output_channels = reversed_channels[i]
            is_final = i == len(block_out_channels) - 1
            if block_type not in ("SpatialUpBlock3D", "SpatialTemporalUpBlock3D"):
                raise ValueError(f"unknown up block type {block_type}")
            blocks.append(MagvitUpBlock3d(
                input_channels, output_channels, num_layers=layers_per_block + 1, act_fn=act_fn,
                norm_num_groups=norm_num_groups, norm_eps=1e-6, spatial_group_norm=spatial_group_norm,
                add_upsample=not is_final,
                add_temporal_upsample=block_type == "SpatialTemporalUpBlock3D"))
        self.up_blocks = ModuleList(blocks)
        self.conv_norm_out = _SpatialOrVideoGroupNorm(norm_num_groups, block_out_channels[0], 1e-6, spatial_group_norm)
        self.conv_act = get_activation(act_fn)
        self.conv_out = MagvitCausalConv3d(block_out_channels[0], out_channels, kernel_size=3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        x = self.mid_block(params["mid_block"], x)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        x = self.conv_norm_out(params["conv_norm_out"], x)
        x = self.conv_act(x)
        return self.conv_out(params["conv_out"], x)


class AutoencoderKLMagvit(Module, ModelMixin, ConfigMixin):
    """EasyAnimate's MagViT KL video VAE (reference `:665`). Public API NCFHW
    like the reference (`[B, C, F, H, W]`); internals NDHWC."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        latent_channels: int = 16,
        out_channels: int = 3,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        down_block_types: Tuple[str, ...] = (
            "SpatialDownBlock3D",
            "SpatialTemporalDownBlock3D",
            "SpatialTemporalDownBlock3D",
            "SpatialTemporalDownBlock3D",
        ),
        up_block_types: Tuple[str, ...] = (
            "SpatialUpBlock3D",
            "SpatialTemporalUpBlock3D",
            "SpatialTemporalUpBlock3D",
            "SpatialTemporalUpBlock3D",
        ),
        layers_per_block: int = 2,
        act_fn: str = "silu",
        norm_num_groups: int = 32,
        scaling_factor: float = 0.7125,
        spatial_group_norm: bool = True,
    ):
        super().__init__()
        self.encoder = MagvitEncoder(
            in_channels=in_channels, out_channels=latent_channels, down_block_types=tuple(down_block_types),
            block_out_channels=tuple(block_out_channels), layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups, act_fn=act_fn, double_z=True, spatial_group_norm=spatial_group_norm)
        self.decoder = MagvitDecoder(
            in_channels=latent_channels, out_channels=out_channels, up_block_types=tuple(up_block_types),
            block_out_channels=tuple(block_out_channels), layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups, act_fn=act_fn, spatial_group_norm=spatial_group_norm)
        self.quant_conv = Conv3d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0)
        self.post_quant_conv = Conv3d(latent_channels, latent_channels, kernel_size=1, padding=0)
        self.spatial_compression_ratio = 2 ** (len(block_out_channels) - 1)
        self.temporal_compression_ratio = 2 ** (len(block_out_channels) - 2)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, F, H, W] → DiagonalGaussianDistribution over latents
        [B, 2·latent_C, f, h, w]."""
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # NCFHW -> NFHWC
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """z: [B, latent_C, f, h, w] → video [B, C, F, H, W]."""
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        h = self.post_quant_conv(params["post_quant_conv"], h)
        dec = self.decoder(params["decoder"], h)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

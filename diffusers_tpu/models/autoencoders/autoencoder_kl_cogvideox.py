"""AutoencoderKLCogVideoX — CogVideoX 3D causal video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_cogvideox.py:956`;
CogVideoXCausalConv3d `:67`, CogVideoXSpatialNorm3D `:147`,
CogVideoXResnetBlock3D `:198`, Down/Mid/Up blocks `:329,442,529`,
CogVideoXDownsample3D `downsampling.py:286`, CogVideoXUpsample3D
`upsampling.py:357`).

TPU-first redesign (same strategy as autoencoder_kl_wan.py): the reference
threads per-conv `conv_cache` dicts through a frame-chunked Python loop;
here each causal conv sees the FULL sequence with the temporal left-pad
being (k_t − 1) copies of the first frame — numerically identical to the
reference's "first"/"constant" cache modes, and one fused XLA program.
Layout: NDHWC ([B, T, H, W, C]) internally, NCTHW at the public boundary."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DiagonalGaussianDistribution


@dataclass
class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


@dataclass
class DecoderOutput(BaseOutput):
    sample: jax.Array


class CogCausalConv3d(Module):
    """Causal 3D conv: temporal left-pad with (k_t − 1) copies of the first
    frame (reference fake_context_parallel_forward, `:123`), symmetric
    zero-pad spatially."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, pad_mode="first"):
        super().__init__()
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        self.time_kernel_size = k[0]
        self.pad_mode = pad_mode
        self.hp, self.wp = (k[1] - 1) // 2, (k[2] - 1) // 2
        stride = (stride, 1, 1) if isinstance(stride, int) else stride
        # "replicate" (Mochi) edge-pads spatially too, so the conv itself pads
        # nothing; other modes zero-pad spatially inside the conv (reference
        # CogVideoXCausalConv3d:105-121)
        pad = ((0, 0), (0, 0), (0, 0)) if pad_mode == "replicate" else ((0, 0), (self.hp, self.hp), (self.wp, self.wp))
        self.conv = Conv3d(in_channels, out_channels, kernel_size=k, stride=stride, padding=pad)

    def __call__(self, params, x):  # x: [B, T, H, W, C]
        kt = self.time_kernel_size
        if self.pad_mode == "replicate":
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (self.hp, self.hp), (self.wp, self.wp), (0, 0)), mode="edge")
        elif kt > 1:
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)  # "first"/"constant"
            x = jnp.concatenate([first, x], axis=1)
        return self.conv(params["conv"], x)


def _resize_nearest_3d(x, size):
    """Nearest-neighbor resize of [B, T, H, W, C] to (T', H', W')."""
    b, t, h, w, c = x.shape
    return jax.image.resize(x, (b, *size, c), method="nearest")


class CogSpatialNorm3D(Module):
    """f ← GN(f) · conv_y(zq) + conv_b(zq), zq resized to f with the
    odd-first-frame split (reference `:147-195`)."""

    def __init__(self, f_channels: int, zq_channels: int, groups: int = 32):
        super().__init__()
        self.norm_layer = GroupNorm(groups, f_channels, eps=1e-6)
        self.conv_y = CogCausalConv3d(zq_channels, f_channels, kernel_size=1)
        self.conv_b = CogCausalConv3d(zq_channels, f_channels, kernel_size=1)

    def __call__(self, params, f, zq):
        ft = f.shape[1]
        if ft > 1 and ft % 2 == 1:
            f_first_size = (1,) + f.shape[2:4]
            f_rest_size = (ft - 1,) + f.shape[2:4]
            z_first = _resize_nearest_3d(zq[:, :1], f_first_size)
            z_rest = _resize_nearest_3d(zq[:, 1:], f_rest_size)
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = _resize_nearest_3d(zq, f.shape[1:4])
        conv_y = self.conv_y(params["conv_y"], zq)
        conv_b = self.conv_b(params["conv_b"], zq)
        return self.norm_layer(params["norm_layer"], f) * conv_y + conv_b


class CogResnetBlock3D(Module):
    def __init__(self, in_channels, out_channels=None, groups=32, eps=1e-6,
                 spatial_norm_dim=None, pad_mode="first"):
        super().__init__()
        out_channels = out_channels or in_channels
        self.in_channels, self.out_channels = in_channels, out_channels
        if spatial_norm_dim is None:
            self.norm1 = GroupNorm(groups, in_channels, eps=eps)
            self.norm2 = GroupNorm(groups, out_channels, eps=eps)
        else:
            self.norm1 = CogSpatialNorm3D(in_channels, spatial_norm_dim, groups)
            self.norm2 = CogSpatialNorm3D(out_channels, spatial_norm_dim, groups)
        self.conv1 = CogCausalConv3d(in_channels, out_channels, 3, pad_mode=pad_mode)
        self.conv2 = CogCausalConv3d(out_channels, out_channels, 3, pad_mode=pad_mode)
        if in_channels != out_channels:
            self.conv_shortcut = Conv3d(in_channels, out_channels, kernel_size=1)

    def __call__(self, params, x, zq=None):
        h = x
        h = self.norm1(params["norm1"], h) if zq is None else self.norm1(params["norm1"], h, zq)
        h = jax.nn.silu(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h) if zq is None else self.norm2(params["norm2"], h, zq)
        h = jax.nn.silu(h)
        h = self.conv2(params["conv2"], h)
        if self.in_channels != self.out_channels:
            x = self.conv_shortcut(params["conv_shortcut"], x)
        return x + h


class CogDownsample3D(Module):
    """Optional temporal 2× avg-pool (odd streams keep frame 0), then a
    stride-2 conv per frame with (0,1,0,1) zero pad (downsampling.py:286)."""

    def __init__(self, channels: int, compress_time: bool = False):
        super().__init__()
        self.conv = Conv2d(channels, channels, kernel_size=3, stride=2, padding=0)
        self.compress_time = compress_time

    def __call__(self, params, x):  # [B, T, H, W, C]
        if self.compress_time:
            t = x.shape[1]
            if t % 2 == 1:
                first, rest = x[:, :1], x[:, 1:]
                if rest.shape[1] > 0:
                    rest = (rest[:, 0::2] + rest[:, 1::2]) / 2.0
                x = jnp.concatenate([first, rest], axis=1)
            else:
                x = (x[:, 0::2] + x[:, 1::2]) / 2.0
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        b, t, h, w, c = x.shape
        y = self.conv(params["conv"], x.reshape(b * t, h, w, c))
        return y.reshape(b, t, *y.shape[1:])


class CogUpsample3D(Module):
    """Nearest 2× upsample (+ temporal 2× when compressing time, frame 0
    kept single for odd streams), then a 3×3 conv per frame
    (upsampling.py:357)."""

    def __init__(self, channels: int, compress_time: bool = False):
        super().__init__()
        self.conv = Conv2d(channels, channels, kernel_size=3, stride=1, padding=1)
        self.compress_time = compress_time

    def __call__(self, params, x):  # [B, T, H, W, C]
        b, t, h, w, c = x.shape
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                first = _resize_nearest_3d(x[:, :1], (1, 2 * h, 2 * w))
                rest = _resize_nearest_3d(x[:, 1:], (2 * (t - 1), 2 * h, 2 * w))
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = _resize_nearest_3d(x, (2 * t, 2 * h, 2 * w))
            else:
                x = _resize_nearest_3d(x, (1, 2 * h, 2 * w))
        else:
            x = _resize_nearest_3d(x, (t, 2 * h, 2 * w))
        b, t, h, w, c = x.shape
        y = self.conv(params["conv"], x.reshape(b * t, h, w, c))
        return y.reshape(b, t, *y.shape[1:])


class CogDownBlock3D(Module):
    def __init__(self, in_channels, out_channels, num_layers, groups, eps,
                 add_downsample, compress_time, pad_mode="first"):
        super().__init__()
        self.resnets = ModuleList([
            CogResnetBlock3D(in_channels if i == 0 else out_channels, out_channels,
                             groups=groups, eps=eps, pad_mode=pad_mode)
            for i in range(num_layers)
        ])
        self.downsamplers = ModuleList([CogDownsample3D(out_channels, compress_time)]) if add_downsample else None

    def __call__(self, params, x, zq=None):
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, zq)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class CogMidBlock3D(Module):
    def __init__(self, in_channels, num_layers, groups, eps, spatial_norm_dim=None, pad_mode="first"):
        super().__init__()
        self.resnets = ModuleList([
            CogResnetBlock3D(in_channels, in_channels, groups=groups, eps=eps,
                             spatial_norm_dim=spatial_norm_dim, pad_mode=pad_mode)
            for _ in range(num_layers)
        ])

    def __call__(self, params, x, zq=None):
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, zq)
        return x


class CogUpBlock3D(Module):
    def __init__(self, in_channels, out_channels, num_layers, groups, eps,
                 spatial_norm_dim, add_upsample, compress_time, pad_mode="first"):
        super().__init__()
        self.resnets = ModuleList([
            CogResnetBlock3D(in_channels if i == 0 else out_channels, out_channels,
                             groups=groups, eps=eps, spatial_norm_dim=spatial_norm_dim, pad_mode=pad_mode)
            for i in range(num_layers)
        ])
        self.upsamplers = ModuleList([CogUpsample3D(out_channels, compress_time)]) if add_upsample else None

    def __call__(self, params, x, zq):
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, zq)
        if self.upsamplers is not None:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        return x


class CogEncoder3D(Module):
    def __init__(self, in_channels, out_channels, block_out_channels, layers_per_block,
                 norm_eps, norm_num_groups, temporal_compression_ratio, pad_mode="first"):
        super().__init__()
        level = int(np.log2(temporal_compression_ratio))
        self.conv_in = CogCausalConv3d(in_channels, block_out_channels[0], 3, pad_mode=pad_mode)
        blocks = []
        out_ch = block_out_channels[0]
        for i in range(len(block_out_channels)):
            in_ch, out_ch = out_ch, block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            blocks.append(CogDownBlock3D(in_ch, out_ch, layers_per_block, norm_num_groups,
                                         norm_eps, add_downsample=not is_final,
                                         compress_time=i < level, pad_mode=pad_mode))
        self.down_blocks = ModuleList(blocks)
        self.mid_block = CogMidBlock3D(block_out_channels[-1], 2, norm_num_groups, norm_eps, pad_mode=pad_mode)
        self.norm_out = GroupNorm(norm_num_groups, block_out_channels[-1], eps=1e-6)
        self.conv_out = CogCausalConv3d(block_out_channels[-1], 2 * out_channels, 3, pad_mode=pad_mode)

    def __call__(self, params, x):
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.norm_out(params["norm_out"], x)
        x = jax.nn.silu(x)
        return self.conv_out(params["conv_out"], x)


class CogDecoder3D(Module):
    def __init__(self, in_channels, out_channels, block_out_channels, layers_per_block,
                 norm_eps, norm_num_groups, temporal_compression_ratio, pad_mode="first"):
        super().__init__()
        rev = list(reversed(block_out_channels))
        level = int(np.log2(temporal_compression_ratio))
        self.conv_in = CogCausalConv3d(in_channels, rev[0], 3, pad_mode=pad_mode)
        self.mid_block = CogMidBlock3D(rev[0], 2, norm_num_groups, norm_eps,
                                       spatial_norm_dim=in_channels, pad_mode=pad_mode)
        blocks = []
        out_ch = rev[0]
        for i in range(len(rev)):
            in_ch, out_ch = out_ch, rev[i]
            is_final = i == len(rev) - 1
            blocks.append(CogUpBlock3D(in_ch, out_ch, layers_per_block + 1, norm_num_groups,
                                       norm_eps, spatial_norm_dim=in_channels,
                                       add_upsample=not is_final, compress_time=i < level,
                                       pad_mode=pad_mode))
        self.up_blocks = ModuleList(blocks)
        self.norm_out = CogSpatialNorm3D(rev[-1], in_channels, groups=norm_num_groups)
        self.conv_out = CogCausalConv3d(rev[-1], out_channels, 3, pad_mode=pad_mode)

    def __call__(self, params, z):
        x = self.conv_in(params["conv_in"], z)
        x = self.mid_block(params["mid_block"], x, z)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x, z)
        x = self.norm_out(params["norm_out"], x, z)
        x = jax.nn.silu(x)
        return self.conv_out(params["conv_out"], x)


class AutoencoderKLCogVideoX(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("CogVideoXDownBlock3D",) * 4,
        up_block_types: Tuple[str, ...] = ("CogVideoXUpBlock3D",) * 4,
        block_out_channels: Tuple[int, ...] = (128, 256, 256, 512),
        latent_channels: int = 16,
        layers_per_block: int = 3,
        act_fn: str = "silu",
        norm_eps: float = 1e-6,
        norm_num_groups: int = 32,
        temporal_compression_ratio: float = 4,
        sample_height: int = 480,
        sample_width: int = 720,
        scaling_factor: float = 1.15258426,
        shift_factor: Optional[float] = None,
        latents_mean: Optional[Tuple[float, ...]] = None,
        latents_std: Optional[Tuple[float, ...]] = None,
        force_upcast: bool = True,
        use_quant_conv: bool = False,
        use_post_quant_conv: bool = False,
        invert_scale_latents: bool = False,
    ):
        super().__init__()
        self.encoder = CogEncoder3D(in_channels, latent_channels, block_out_channels,
                                    layers_per_block, norm_eps, norm_num_groups,
                                    temporal_compression_ratio)
        self.decoder = CogDecoder3D(latent_channels, out_channels, block_out_channels,
                                    layers_per_block, norm_eps, norm_num_groups,
                                    temporal_compression_ratio)
        self.quant_conv = Conv3d(2 * latent_channels, 2 * latent_channels, 1) if use_quant_conv else None
        self.post_quant_conv = Conv3d(latent_channels, latent_channels, 1) if use_post_quant_conv else None

    # public boundary: NCTHW ([B, C, T, H, W]), matching the reference
    def encode(self, params, x: jax.Array) -> DiagonalGaussianDistribution:
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
        h = self.encoder(params["encoder"], x)
        if self.quant_conv is not None:
            h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))  # back to NCTHW
        return DiagonalGaussianDistribution(moments)

    def decode(self, params, z: jax.Array, return_dict: bool = True):
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        if self.post_quant_conv is not None:
            z = self.post_quant_conv(params["post_quant_conv"], z)
        dec = self.decoder(params["decoder"], z)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params, sample, key=None, sample_posterior: bool = False, return_dict: bool = True):
        posterior = self.encode(params, sample)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(params, z, return_dict=return_dict)

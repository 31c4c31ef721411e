"""AutoencoderKLHunyuanVideo — 3D causal video VAE (HunyuanVideo).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuan_video.py:625`
AutoencoderKLHunyuanVideo; causal conv `:46` — temporal replicate front-pad +
spatial replicate pad; causal frame-level attention mask `:33`; mixed
spatial/temporal downsample schedule `:470-490`).

TPU-first: NDHWC layout end-to-end (convs stay in XLA's native 3D conv path);
full-sequence causal convolution instead of the reference's chunked frame
batching — one fused graph, equivalence by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention import Attention
from ..modeling_utils import ModelMixin
from .vae import DiagonalGaussianDistribution


@dataclass
class DecoderOutput(BaseOutput):
    sample: jax.Array


def prepare_causal_attention_mask(num_frames: int, height_width: int, batch_size: int) -> np.ndarray:
    """Frame-level causal mask over flattened (T·H·W) tokens (reference :33)."""
    indices = np.arange(1, num_frames + 1, dtype=np.int32)
    blocks = np.repeat(indices, height_width)
    x, y = np.meshgrid(blocks, blocks, indexing="xy")
    mask = np.where(x <= y, 0.0, -np.inf).astype(np.float32)
    return np.broadcast_to(mask[None], (batch_size, *mask.shape))


class HYCausalConv3d(Module):
    """Temporal causal (replicate front) + spatial replicate padding, then a
    strided Conv3d; optional extra symmetric zero padding (torch `padding`)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, padding=0, bias=True):
        super().__init__()
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
        self.k, self.extra_pad = k, p
        self.conv = Conv3d(in_channels, out_channels, kernel_size=k, stride=s,
                           padding=((0, 0), (0, 0), (0, 0)), use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:  # x: [B, T, H, W, C]
        kt, kh, kw = self.k
        pads = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)]
        x = jnp.pad(x, pads, mode="edge")
        if any(self.extra_pad):
            pt, ph, pw = self.extra_pad
            x = jnp.pad(x, [(0, 0), (pt, pt), (ph, ph), (pw, pw), (0, 0)])
        return self.conv(params["conv"], x)


class HYResnetBlockCausal3D(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None, groups: int = 32, eps: float = 1e-6):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = GroupNorm(num_groups=groups, num_channels=in_channels, eps=eps)
        self.conv1 = HYCausalConv3d(in_channels, out_channels, 3, 1, 0)
        self.norm2 = GroupNorm(num_groups=groups, num_channels=out_channels, eps=eps)
        self.conv2 = HYCausalConv3d(out_channels, out_channels, 3, 1, 0)
        self.conv_shortcut = HYCausalConv3d(in_channels, out_channels, 1, 1, 0) if in_channels != out_channels else None

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = self.conv1(params["conv1"], jax.nn.silu(self.norm1(params["norm1"], x)))
        x = self.conv2(params["conv2"], jax.nn.silu(self.norm2(params["norm2"], x)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(params["conv_shortcut"], residual)
        return x + residual


class HYMidBlock3D(Module):
    def __init__(self, in_channels: int, num_layers: int = 1, resnet_groups: int = 32,
                 add_attention: bool = True, attention_head_dim: int = 1, eps: float = 1e-6):
        super().__init__()
        self.add_attention = add_attention
        resnets = [HYResnetBlockCausal3D(in_channels, in_channels, resnet_groups, eps)]
        attentions = []
        for _ in range(num_layers):
            if add_attention:
                attentions.append(
                    Attention(
                        in_channels, heads=in_channels // attention_head_dim, dim_head=attention_head_dim,
                        eps=eps, norm_num_groups=resnet_groups, residual_connection=True, bias=True,
                        upcast_softmax=True,
                    )
                )
            resnets.append(HYResnetBlockCausal3D(in_channels, in_channels, resnet_groups, eps))
        self.attentions = ModuleList(attentions)
        self.resnets = ModuleList(resnets)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i, resnet in enumerate(self.resnets[1:]):
            if self.add_attention:
                b, t, h, w, c = x.shape
                flat = x.reshape(b, t * h * w, c)
                mask = jnp.asarray(prepare_causal_attention_mask(t, h * w, b))[:, None]
                flat = self.attentions[i](params["attentions"][i], flat, attention_mask=mask)
                x = flat.reshape(b, t, h, w, c)
            x = resnet(params["resnets"][i + 1], x)
        return x


class HYDownBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1, resnet_groups: int = 32,
                 add_downsample: bool = True, downsample_stride=2, downsample_padding: int = 0):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(HYResnetBlockCausal3D(in_channels if i == 0 else out_channels, out_channels,
                                                 resnet_groups))
        self.resnets = ModuleList(resnets)
        if add_downsample:
            self.downsamplers = ModuleList(
                [_HYDownsample(out_channels, out_channels, downsample_padding, stride=downsample_stride)]
            )
        else:
            self.downsamplers = None

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class _HYDownsample(Module):
    def __init__(self, channels, out_channels, padding: int = 1, kernel_size: int = 3, stride=2):
        super().__init__()
        self.conv = HYCausalConv3d(channels, out_channels, kernel_size, stride, padding)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.conv(params["conv"], x)


class _HYUpsample(Module):
    def __init__(self, in_channels, out_channels=None, kernel_size: int = 3, stride: int = 1,
                 upsample_factor=(2, 2, 2)):
        super().__init__()
        self.upsample_factor = upsample_factor
        self.conv = HYCausalConv3d(in_channels, out_channels or in_channels, kernel_size, stride)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        ft, fh, fw = self.upsample_factor
        # first frame upsampled spatially only (keeps causality, reference :96-104)
        first = jax.image.resize(x[:, :1], (b, 1, int(h * fh), int(w * fw), c), method="nearest")
        if t > 1:
            rest = jax.image.resize(
                x[:, 1:], (b, int((t - 1) * ft), int(h * fh), int(w * fw), c), method="nearest"
            )
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = first
        return self.conv(params["conv"], x)


class HYUpBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1, resnet_groups: int = 32,
                 add_upsample: bool = True, upsample_scale_factor=(2, 2, 2)):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            resnets.append(HYResnetBlockCausal3D(in_channels if i == 0 else out_channels, out_channels,
                                                 resnet_groups))
        self.resnets = ModuleList(resnets)
        if add_upsample:
            self.upsamplers = ModuleList([_HYUpsample(out_channels, out_channels,
                                                      upsample_factor=upsample_scale_factor)])
        else:
            self.upsamplers = None

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        return x


class HYEncoder3D(Module):
    def __init__(self, in_channels: int, out_channels: int, block_out_channels, layers_per_block: int,
                 norm_num_groups: int, double_z: bool = True, mid_block_add_attention: bool = True,
                 temporal_compression_ratio: int = 4, spatial_compression_ratio: int = 8):
        super().__init__()
        self.conv_in = HYCausalConv3d(in_channels, block_out_channels[0], 3, 1)
        down_blocks = []
        output_channel = block_out_channels[0]
        n_spatial = int(np.log2(spatial_compression_ratio))
        n_time = int(np.log2(temporal_compression_ratio))
        for i in range(len(block_out_channels)):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            if temporal_compression_ratio == 4:
                add_spatial = i < n_spatial
                add_time = i >= (len(block_out_channels) - 1 - n_time) and not is_final
            elif temporal_compression_ratio == 8:
                add_spatial = i < n_spatial
                add_time = i < n_time
            else:
                raise ValueError(f"unsupported temporal_compression_ratio {temporal_compression_ratio}")
            stride = ((2,) if add_time else (1,)) + ((2, 2) if add_spatial else (1, 1))
            down_blocks.append(
                HYDownBlock3D(input_channel, output_channel, num_layers=layers_per_block,
                              resnet_groups=norm_num_groups, add_downsample=add_spatial or add_time,
                              downsample_stride=stride, downsample_padding=0)
            )
        self.down_blocks = ModuleList(down_blocks)
        self.mid_block = HYMidBlock3D(block_out_channels[-1], resnet_groups=norm_num_groups,
                                      add_attention=mid_block_add_attention,
                                      attention_head_dim=block_out_channels[-1])
        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[-1], num_groups=norm_num_groups, eps=1e-6)
        self.conv_out = HYCausalConv3d(block_out_channels[-1], 2 * out_channels if double_z else out_channels, 3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = jax.nn.silu(self.conv_norm_out(params["conv_norm_out"], x))
        return self.conv_out(params["conv_out"], x)


class HYDecoder3D(Module):
    def __init__(self, in_channels: int, out_channels: int, block_out_channels, layers_per_block: int,
                 norm_num_groups: int, mid_block_add_attention: bool = True,
                 time_compression_ratio: int = 4, spatial_compression_ratio: int = 8):
        super().__init__()
        self.conv_in = HYCausalConv3d(in_channels, block_out_channels[-1], 3, 1)
        self.mid_block = HYMidBlock3D(block_out_channels[-1], resnet_groups=norm_num_groups,
                                      add_attention=mid_block_add_attention,
                                      attention_head_dim=block_out_channels[-1])
        rev = list(reversed(block_out_channels))
        up_blocks = []
        output_channel = rev[0]
        n_spatial = int(np.log2(spatial_compression_ratio))
        n_time = int(np.log2(time_compression_ratio))
        for i in range(len(block_out_channels)):
            prev_output = output_channel
            output_channel = rev[i]
            is_final = i == len(block_out_channels) - 1
            add_spatial = i < n_spatial
            add_time = i >= len(block_out_channels) - 1 - n_time and not is_final
            factor = ((2,) if add_time else (1,)) + ((2, 2) if add_spatial else (1, 1))
            up_blocks.append(
                HYUpBlock3D(prev_output, output_channel, num_layers=layers_per_block + 1,
                            resnet_groups=norm_num_groups, add_upsample=add_spatial or add_time,
                            upsample_scale_factor=factor)
            )
        self.up_blocks = ModuleList(up_blocks)
        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=norm_num_groups, eps=1e-6)
        self.conv_out = HYCausalConv3d(block_out_channels[0], out_channels, 3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        x = self.mid_block(params["mid_block"], x)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        x = jax.nn.silu(self.conv_norm_out(params["conv_norm_out"], x))
        return self.conv_out(params["conv_out"], x)


class AutoencoderKLHunyuanVideo(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 16,
        down_block_types: Tuple[str, ...] = ("HunyuanVideoDownBlock3D",) * 4,
        up_block_types: Tuple[str, ...] = ("HunyuanVideoUpBlock3D",) * 4,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        layers_per_block: int = 2,
        act_fn: str = "silu",
        norm_num_groups: int = 32,
        scaling_factor: float = 0.476986,
        spatial_compression_ratio: int = 8,
        temporal_compression_ratio: int = 4,
        mid_block_add_attention: bool = True,
    ):
        super().__init__()
        self.encoder = HYEncoder3D(in_channels, latent_channels, block_out_channels, layers_per_block,
                                   norm_num_groups, double_z=True,
                                   mid_block_add_attention=mid_block_add_attention,
                                   temporal_compression_ratio=temporal_compression_ratio,
                                   spatial_compression_ratio=spatial_compression_ratio)
        self.decoder = HYDecoder3D(latent_channels, out_channels, block_out_channels, layers_per_block,
                                   norm_num_groups, mid_block_add_attention=mid_block_add_attention,
                                   time_compression_ratio=temporal_compression_ratio,
                                   spatial_compression_ratio=spatial_compression_ratio)
        self.quant_conv = Conv3d(2 * latent_channels, 2 * latent_channels, kernel_size=1)
        self.post_quant_conv = Conv3d(latent_channels, latent_channels, kernel_size=1)

    # public boundary: NCTHW ([B, C, T, H, W]), matching the reference
    def encode(self, params: Params, x: jax.Array) -> DiagonalGaussianDistribution:
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = self.encoder(params["encoder"], x)
        h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))
        return DiagonalGaussianDistribution(moments)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        z = jnp.transpose(z, (0, 2, 3, 4, 1))
        z = self.post_quant_conv(params["post_quant_conv"], z)
        dec = self.decoder(params["decoder"], z)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params: Params, sample, key=None, sample_posterior: bool = False, return_dict: bool = True):
        posterior = self.encode(params, sample)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode(params, z, return_dict=return_dict)

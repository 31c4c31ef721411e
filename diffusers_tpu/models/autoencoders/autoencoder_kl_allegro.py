"""AutoencoderKLAllegro — the Allegro 3D video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_allegro.py:676`
AutoencoderKLAllegro; AllegroTemporalConvLayer `:33`, Down/Up/Mid blocks
`:134-412`, Encoder3D `:414`, Decoder3D `:541`, tiled encode/decode `:869,955`).

Design: per-frame 2D resnet/attention blocks (reusing this repo's NHWC
ResnetBlock2D / Attention) interleaved with temporal conv layers on
[B, T, H, W, C]. The reference's encoder/decoder only run through a fixed-size
3D tile loop (non-tiled paths raise NotImplementedError, reference `:804`);
we keep the same tile kernel/stride/blending (`_prepare_for_blend`, `:1078`)
but expose `encode_tile`/`decode_tile` for single-graph full-tile use.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, GroupNorm, Identity, Module, ModuleList, Params, get_activation
from ..attention import Attention
from ..modeling_utils import ModelMixin
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ..unets.unet_2d_blocks import _attend_spatial
from .vae import DecoderOutput, DiagonalGaussianDistribution


def _gn_conv3d(in_dim, out_dim, kernel, stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0)),
               norm_num_groups=32, with_dropout_slot=False):
    """GroupNorm / SiLU / [Dropout] / Conv3d as a ModuleList, keyed like the
    reference's nn.Sequential (indices 0/1/2 or 0/1/2/3)."""
    mods = [GroupNorm(norm_num_groups, in_dim), Identity()]
    if with_dropout_slot:
        mods.append(Identity())
    mods.append(Conv3d(in_dim, out_dim, kernel_size=kernel, stride=stride, padding=padding))
    return ModuleList(mods)


def _apply_gn_conv3d(seq: ModuleList, params: Params, x: jax.Array) -> jax.Array:
    x = seq[0](params[0], x)
    x = jax.nn.silu(x)
    last = len(seq) - 1
    return seq[last](params[last], x)


class AllegroTemporalConvLayer(Module):
    """Reference `:33`: 4 GN→SiLU→Conv3d stages with replicate temporal
    padding and a temporal-identity residual; down/up variants stride or
    interleave the time axis. `stride` is the reference's (mis)name for the
    spatial kernel size. Operates on [B, T, H, W, C]."""

    def __init__(self, in_dim: int, out_dim: Optional[int] = None, norm_num_groups: int = 32,
                 up_sample: bool = False, down_sample: bool = False, stride: int = 1):
        super().__init__()
        out_dim = out_dim or in_dim
        pad_s = int((stride - 1) * 0.5)
        sp = ((pad_s, pad_s), (pad_s, pad_s))
        self.down_sample = down_sample
        self.up_sample = up_sample
        if down_sample:
            self.conv1 = _gn_conv3d(in_dim, out_dim, (2, stride, stride), stride=(2, 1, 1),
                                   padding=((0, 0),) + sp, norm_num_groups=norm_num_groups)
        elif up_sample:
            self.conv1 = _gn_conv3d(in_dim, out_dim * 2, (1, stride, stride),
                                   padding=((0, 0),) + sp, norm_num_groups=norm_num_groups)
        else:
            self.conv1 = _gn_conv3d(in_dim, out_dim, (3, stride, stride),
                                   padding=((0, 0),) + sp, norm_num_groups=norm_num_groups)
        self.conv2 = _gn_conv3d(out_dim, in_dim, (3, stride, stride), padding=((0, 0),) + sp,
                               norm_num_groups=norm_num_groups, with_dropout_slot=True)
        self.conv3 = _gn_conv3d(out_dim, in_dim, (3, stride, stride), padding=((0, 0),) + sp,
                               norm_num_groups=norm_num_groups, with_dropout_slot=True)
        self.conv4 = _gn_conv3d(out_dim, in_dim, (3, stride, stride), padding=((0, 0),) + sp,
                               norm_num_groups=norm_num_groups)
        self.out_dim = out_dim

    @staticmethod
    def _pad_t(x):
        return jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.down_sample:
            identity = x[:, ::2]
            h = _apply_gn_conv3d(self.conv1, params["conv1"], x)
        elif self.up_sample:
            identity = jnp.repeat(x, 2, axis=1)
            h = _apply_gn_conv3d(self.conv1, params["conv1"], x)
            b, t, hh, ww, c2 = h.shape
            # torch unflatten(1,(2,-1)).permute(0,2,3,1,4,5).flatten(2,3) in NDHWC:
            h = h.reshape(b, t, hh, ww, 2, c2 // 2)
            h = jnp.transpose(h, (0, 1, 4, 2, 3, 5)).reshape(b, 2 * t, hh, ww, c2 // 2)
        else:
            identity = x
            h = _apply_gn_conv3d(self.conv1, params["conv1"], self._pad_t(x))
        h = _apply_gn_conv3d(self.conv2, params["conv2"], self._pad_t(h))
        h = _apply_gn_conv3d(self.conv3, params["conv3"], self._pad_t(h))
        h = _apply_gn_conv3d(self.conv4, params["conv4"], self._pad_t(h))
        return identity + h


def _per_frame(fn, x):
    """Apply a [B', H, W, C] function over [B, T, H, W, C] (fn may change
    H/W/C, e.g. spatial down/upsamplers)."""
    b, t = x.shape[:2]
    y = fn(x.reshape((b * t,) + x.shape[2:]))
    return y.reshape((b, t) + y.shape[1:])


class AllegroDownBlock3D(Module):
    def __init__(self, in_channels, out_channels, num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 resnet_groups=32, spatial_downsample=True, temporal_downsample=False, downsample_padding=1):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=cin, out_channels=out_channels, temb_channels=None,
                                         eps=resnet_eps, groups=resnet_groups, non_linearity=resnet_act_fn))
            temp_convs.append(AllegroTemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.add_temp_downsample = temporal_downsample
        if temporal_downsample:
            self.temp_convs_down = AllegroTemporalConvLayer(
                out_channels, out_channels, norm_num_groups=resnet_groups, down_sample=True, stride=3)
        self.downsamplers = None
        if spatial_downsample:
            self.downsamplers = ModuleList([
                Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.resnets)):
            x = _per_frame(lambda f: self.resnets[i](params["resnets"][i], f, None), x)
            x = self.temp_convs[i](params["temp_convs"][i], x)
        if self.add_temp_downsample:
            x = self.temp_convs_down(params["temp_convs_down"], x)
        if self.downsamplers is not None:
            x = _per_frame(lambda f: self.downsamplers[0](params["downsamplers"][0], f), x)
        return x


class AllegroUpBlock3D(Module):
    def __init__(self, in_channels, out_channels, num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 resnet_groups=32, spatial_upsample=True, temporal_upsample=False):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            cin = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=cin, out_channels=out_channels, temb_channels=None,
                                         eps=resnet_eps, groups=resnet_groups, non_linearity=resnet_act_fn))
            temp_convs.append(AllegroTemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.add_temp_upsample = temporal_upsample
        if temporal_upsample:
            self.temp_conv_up = AllegroTemporalConvLayer(
                out_channels, out_channels, norm_num_groups=resnet_groups, up_sample=True, stride=3)
        self.upsamplers = None
        if spatial_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.resnets)):
            x = _per_frame(lambda f: self.resnets[i](params["resnets"][i], f, None), x)
            x = self.temp_convs[i](params["temp_convs"][i], x)
        if self.add_temp_upsample:
            x = self.temp_conv_up(params["temp_conv_up"], x)
        if self.upsamplers is not None:
            x = _per_frame(lambda f: self.upsamplers[0](params["upsamplers"][0], f), x)
        return x


class AllegroMidBlock3DConv(Module):
    def __init__(self, in_channels, num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 resnet_groups=32, add_attention=True, attention_head_dim=1):
        super().__init__()
        attention_head_dim = attention_head_dim or in_channels
        resnets = [ResnetBlock2D(in_channels=in_channels, out_channels=in_channels, temb_channels=None,
                                 eps=resnet_eps, groups=resnet_groups, non_linearity=resnet_act_fn)]
        temp_convs = [AllegroTemporalConvLayer(in_channels, in_channels, norm_num_groups=resnet_groups)]
        attentions = []
        for _ in range(num_layers):
            attentions.append(Attention(
                in_channels, heads=in_channels // attention_head_dim, dim_head=attention_head_dim,
                eps=resnet_eps, norm_num_groups=resnet_groups, residual_connection=True, bias=True,
                upcast_softmax=True))
            resnets.append(ResnetBlock2D(in_channels=in_channels, out_channels=in_channels, temb_channels=None,
                                         eps=resnet_eps, groups=resnet_groups, non_linearity=resnet_act_fn))
            temp_convs.append(AllegroTemporalConvLayer(in_channels, in_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.attentions = ModuleList(attentions)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = _per_frame(lambda f: self.resnets[0](params["resnets"][0], f, None), x)
        x = self.temp_convs[0](params["temp_convs"][0], x)
        for i in range(len(self.attentions)):
            x = _per_frame(lambda f: _attend_spatial(self.attentions[i], params["attentions"][i], f), x)
            x = _per_frame(lambda f: self.resnets[i + 1](params["resnets"][i + 1], f, None), x)
            x = self.temp_convs[i + 1](params["temp_convs"][i + 1], x)
        return x


class AllegroEncoder3D(Module):
    def __init__(self, in_channels=3, out_channels=3,
                 down_block_types=("AllegroDownBlock3D",) * 4,
                 block_out_channels=(128, 256, 512, 512),
                 temporal_downsample_blocks=(True, True, False, False),
                 layers_per_block=2, norm_num_groups=32, act_fn="silu", double_z=True):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, stride=1, padding=1)
        self.temp_conv_in = Conv3d(block_out_channels[0], block_out_channels[0], kernel_size=(3, 1, 1),
                                   padding=((1, 1), (0, 0), (0, 0)))
        blocks = []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            if block_type != "AllegroDownBlock3D":
                raise ValueError(f"unknown down block type {block_type}")
            input_channel = output_channel
            output_channel = block_out_channels[i]
            blocks.append(AllegroDownBlock3D(
                input_channel, output_channel, num_layers=layers_per_block, resnet_eps=1e-6,
                resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                spatial_downsample=i != len(block_out_channels) - 1,
                temporal_downsample=temporal_downsample_blocks[i], downsample_padding=0))
        self.down_blocks = ModuleList(blocks)
        self.mid_block = AllegroMidBlock3DConv(block_out_channels[-1], resnet_eps=1e-6, resnet_act_fn=act_fn,
                                               attention_head_dim=block_out_channels[-1],
                                               resnet_groups=norm_num_groups)
        self.conv_norm_out = GroupNorm(norm_num_groups, block_out_channels[-1], eps=1e-6)
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.temp_conv_out = Conv3d(block_out_channels[-1], block_out_channels[-1], kernel_size=(3, 1, 1),
                                    padding=((1, 1), (0, 0), (0, 0)))
        self.conv_out = Conv2d(block_out_channels[-1], conv_out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, T, H, W, C]
        x = _per_frame(lambda f: self.conv_in(params["conv_in"], f), x)
        x = x + self.temp_conv_in(params["temp_conv_in"], x)
        for i in range(len(self.down_blocks)):
            x = self.down_blocks[i](params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = _per_frame(lambda f: jax.nn.silu(self.conv_norm_out(params["conv_norm_out"], f)), x)
        x = x + self.temp_conv_out(params["temp_conv_out"], x)
        return _per_frame(lambda f: self.conv_out(params["conv_out"], f), x)


class AllegroDecoder3D(Module):
    def __init__(self, in_channels=4, out_channels=3,
                 up_block_types=("AllegroUpBlock3D",) * 4,
                 temporal_upsample_blocks=(False, True, True, False),
                 block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, norm_num_groups=32, act_fn="silu"):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)
        self.temp_conv_in = Conv3d(block_out_channels[-1], block_out_channels[-1], kernel_size=(3, 1, 1),
                                   padding=((1, 1), (0, 0), (0, 0)))
        self.mid_block = AllegroMidBlock3DConv(block_out_channels[-1], resnet_eps=1e-6, resnet_act_fn=act_fn,
                                               attention_head_dim=block_out_channels[-1],
                                               resnet_groups=norm_num_groups)
        reversed_channels = list(reversed(block_out_channels))
        blocks = []
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(up_block_types):
            if block_type != "AllegroUpBlock3D":
                raise ValueError(f"unknown up block type {block_type}")
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            blocks.append(AllegroUpBlock3D(
                prev_output_channel, output_channel, num_layers=layers_per_block + 1, resnet_eps=1e-6,
                resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                spatial_upsample=i != len(block_out_channels) - 1,
                temporal_upsample=temporal_upsample_blocks[i]))
        self.up_blocks = ModuleList(blocks)
        self.conv_norm_out = GroupNorm(norm_num_groups, block_out_channels[0], eps=1e-6)
        self.temp_conv_out = Conv3d(block_out_channels[0], block_out_channels[0], kernel_size=(3, 1, 1),
                                    padding=((1, 1), (0, 0), (0, 0)))
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = _per_frame(lambda f: self.conv_in(params["conv_in"], f), x)
        x = x + self.temp_conv_in(params["temp_conv_in"], x)
        x = self.mid_block(params["mid_block"], x)
        for i in range(len(self.up_blocks)):
            x = self.up_blocks[i](params["up_blocks"][i], x)
        x = _per_frame(lambda f: jax.nn.silu(self.conv_norm_out(params["conv_norm_out"], f)), x)
        x = x + self.temp_conv_out(params["temp_conv_out"], x)
        return _per_frame(lambda f: self.conv_out(params["conv_out"], f), x)


def _blend_weights(idx, total, overlap, size, axis_ndim, axis):
    """Linear ramp weights matching the reference `_prepare_for_blend` (`:1078`)."""
    w = np.ones((size,), dtype=np.float32)
    if idx > 0 and overlap > 0:
        w[:overlap] *= np.arange(overlap) / overlap
    if idx < total - 1 and overlap > 0:
        w[-overlap:] *= 1.0 - np.arange(overlap) / overlap
    shape = [1] * axis_ndim
    shape[axis] = size
    return w.reshape(shape)


class AutoencoderKLAllegro(Module, ModelMixin, ConfigMixin):
    """Reference `:676`. Public API NCTHW; internals [B, T, H, W, C]."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("AllegroDownBlock3D",) * 4,
        up_block_types: Tuple[str, ...] = ("AllegroUpBlock3D",) * 4,
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        temporal_downsample_blocks: Tuple[bool, ...] = (True, True, False, False),
        temporal_upsample_blocks: Tuple[bool, ...] = (False, True, True, False),
        latent_channels: int = 4,
        layers_per_block: int = 2,
        act_fn: str = "silu",
        norm_num_groups: int = 32,
        temporal_compression_ratio: float = 4,
        sample_size: int = 320,
        scaling_factor: float = 0.13,
        force_upcast: bool = True,
    ):
        super().__init__()
        self.encoder = AllegroEncoder3D(
            in_channels=in_channels, out_channels=latent_channels, down_block_types=tuple(down_block_types),
            temporal_downsample_blocks=tuple(temporal_downsample_blocks),
            block_out_channels=tuple(block_out_channels), layers_per_block=layers_per_block,
            act_fn=act_fn, norm_num_groups=norm_num_groups, double_z=True)
        self.decoder = AllegroDecoder3D(
            in_channels=latent_channels, out_channels=out_channels, up_block_types=tuple(up_block_types),
            temporal_upsample_blocks=tuple(temporal_upsample_blocks),
            block_out_channels=tuple(block_out_channels), layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups, act_fn=act_fn)
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0)
        self.post_quant_conv = Conv2d(latent_channels, latent_channels, kernel_size=1, padding=0)

        self.spatial_compression_ratio = 2 ** (len(block_out_channels) - 1)
        sample_frames = 24
        self.tile_overlap_t = 8
        self.tile_overlap_h = 120
        self.tile_overlap_w = 80
        self.kernel = (sample_frames, sample_size, sample_size)
        self.stride = (sample_frames - self.tile_overlap_t,
                       sample_size - self.tile_overlap_h,
                       sample_size - self.tile_overlap_w)

    # ------------------------------------------------------------- single tile
    def encode_tile(self, params: Params, x: jax.Array) -> jax.Array:
        """One encoder pass, x: [B, C, T, H, W] → moments [B, 2z, t, h, w]."""
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = self.encoder(params["encoder"], h)
        h = _per_frame(lambda f: self.quant_conv(params["quant_conv"], f), h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))

    def decode_tile(self, params: Params, z: jax.Array) -> jax.Array:
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        h = _per_frame(lambda f: self.post_quant_conv(params["post_quant_conv"], f), h)
        h = self.decoder(params["decoder"], h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))

    # ------------------------------------------------------------- tiled
    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """Tiled encode over the fixed (24, S, S) kernel (reference `:869`)."""
        rs, rt = self.spatial_compression_ratio, int(self.config.temporal_compression_ratio)
        b, c, t, hh, ww = x.shape
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        nt = max(math.floor((t - kt) / st) + 1, 1)
        nh = max(math.floor((hh - kh) / sh) + 1, 1)
        nw = max(math.floor((ww - kw) / sw) + 1, 1)
        ok = (kt // rt, kh // rs, kw // rs)
        ostr = (st // rt, sh // rs, sw // rs)
        ov = (ok[0] - ostr[0], ok[1] - ostr[1], ok[2] - ostr[2])
        moments = jnp.zeros((b, 2 * self.config.latent_channels, t // rt, hh // rs, ww // rs), x.dtype)
        for i in range(nt):
            for j in range(nh):
                for k in range(nw):
                    tile = x[:, :, i * st:i * st + kt, j * sh:j * sh + kh, k * sw:k * sw + kw]
                    enc = self.encode_tile(params, tile)
                    wgt = (_blend_weights(i, nt, ov[0], ok[0], 5, 2)
                           * _blend_weights(j, nh, ov[1], ok[1], 5, 3)
                           * _blend_weights(k, nw, ov[2], ok[2], 5, 4))
                    enc = enc * jnp.asarray(wgt, enc.dtype)
                    moments = jax.lax.dynamic_update_slice(
                        moments,
                        jax.lax.dynamic_slice(
                            moments, (0, 0, i * ostr[0], j * ostr[1], k * ostr[2]),
                            (b, moments.shape[1], ok[0], ok[1], ok[2])) + enc,
                        (0, 0, i * ostr[0], j * ostr[1], k * ostr[2]))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """Tiled decode (reference `:955`)."""
        rs, rt = self.spatial_compression_ratio, int(self.config.temporal_compression_ratio)
        b, c, t, hh, ww = z.shape
        lk = (self.kernel[0] // rt, self.kernel[1] // rs, self.kernel[2] // rs)
        ls = (self.stride[0] // rt, self.stride[1] // rs, self.stride[2] // rs)
        nt = max(math.floor((t - lk[0]) / ls[0]) + 1, 1)
        nh = max(math.floor((hh - lk[1]) / ls[1]) + 1, 1)
        nw = max(math.floor((ww - lk[2]) / ls[2]) + 1, 1)
        ov = (self.kernel[0] - self.stride[0], self.kernel[1] - self.stride[1], self.kernel[2] - self.stride[2])
        video = jnp.zeros((b, self.config.out_channels, t * rt, hh * rs, ww * rs), z.dtype)
        for i in range(nt):
            for j in range(nh):
                for k in range(nw):
                    tile = z[:, :, i * ls[0]:i * ls[0] + lk[0], j * ls[1]:j * ls[1] + lk[1], k * ls[2]:k * ls[2] + lk[2]]
                    dec = self.decode_tile(params, tile)
                    wgt = (_blend_weights(i, nt, ov[0], self.kernel[0], 5, 2)
                           * _blend_weights(j, nh, ov[1], self.kernel[1], 5, 3)
                           * _blend_weights(k, nw, ov[2], self.kernel[2], 5, 4))
                    dec = dec * jnp.asarray(wgt, dec.dtype)
                    video = jax.lax.dynamic_update_slice(
                        video,
                        jax.lax.dynamic_slice(
                            video, (0, 0, i * self.stride[0], j * self.stride[1], k * self.stride[2]),
                            (b, video.shape[1], self.kernel[0], self.kernel[1], self.kernel[2])) + dec,
                        (0, 0, i * self.stride[0], j * self.stride[1], k * self.stride[2]))
        # reference tiled_decode returns [B, F, C, H, W] (`:1040` permute)
        video = jnp.transpose(video, (0, 2, 1, 3, 4))
        if not return_dict:
            return (video,)
        return DecoderOutput(sample=video)

"""AutoencoderKLWan — Wan 2.x 3D causal video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_wan.py:960`
AutoencoderKLWan; WanCausalConv3d `:131`, WanResample `:224`,
WanResidualBlock `:315`, encoder `:509`, decoder `:788`, chunked
encode/decode loops `:1128-1199`).

TPU-first redesign: the reference realizes temporal causality with a
per-frame Python loop + feature caches threaded through every causal conv.
That chunked recursion is *mathematically identical* to processing the full
sequence with left-zero-padded temporal convolutions plus a first-frame
special case at each temporal resample — so here encode/decode are single
fused XLA graphs (NDHWC layout) with zero host synchronization:

  * causal conv  ≡ temporal left-pad of 2·pad_t zeros
  * downsample3d ≡ out = concat([x[:, :1], conv_t(x, k=3, s=2, pad=0)])
  * upsample3d   ≡ out = concat([x0, interleave_2x(conv_t(pad₂(x[1:])))]),
                   i.e. the first frame is never temporally duplicated
                   (the reference's "Rep" cache marker).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


class WanCausalConv3d(Conv3d):
    """Conv3d with causal temporal padding (left pad 2·pad_t zeros)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0):
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        p = (padding,) * 3 if isinstance(padding, int) else tuple(padding)
        # temporal: (2*pt, 0) causal; spatial symmetric
        pad = ((2 * p[0], 0), (p[1], p[1]), (p[2], p[2]))
        super().__init__(in_channels, out_channels, kernel_size=k, stride=s, padding=pad)


class WanRMSNorm(Module):
    """Channel-wise L2 normalize * sqrt(dim) * gamma (reference WanRMS_norm `:176`).
    Operates on the channel-last axis; gamma stored flat [dim]."""

    def __init__(self, dim: int, bias: bool = False):
        super().__init__()
        self.dim = dim
        self.use_bias = bias

    def init(self, key, dtype=jnp.float32) -> Params:
        p = {"gamma": jnp.ones((self.dim,), dtype=dtype)}
        if self.use_bias:
            p["bias"] = jnp.zeros((self.dim,), dtype=dtype)
        return p

    def convert_torch_param(self, pname, tensor):
        return pname, np.asarray(tensor).reshape(-1)

    def convert_param_to_torch(self, pname, array):
        return pname, np.asarray(array).reshape(-1)  # torch reloads reshape at load

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
        xf = xf / jnp.maximum(norm, 1e-12)
        out = xf.astype(dtype) * (self.dim**0.5) * params["gamma"].astype(dtype)
        if self.use_bias:
            out = out + params["bias"].astype(dtype)
        return out


def _spatial(fn, params, x):
    """Apply a 2D op per frame: x [B, T, H, W, C] → [B, T, H', W', C']."""
    b, t, h, w, c = x.shape
    y = fn(params, x.reshape(b * t, h, w, c))
    return y.reshape(b, t, *y.shape[1:])


def _upsample2x_nearest(x):
    """nearest-exact 2x spatial upsample on [B*T, H, W, C]."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class WanResample(Module):
    def __init__(self, dim: int, mode: str, upsample_out_dim: Optional[int] = None):
        super().__init__()
        self.mode = mode
        out_dim = upsample_out_dim if upsample_out_dim is not None else dim // 2
        # torch stores the conv at nn.Sequential index 1 → key "resample.1"
        if mode in ("upsample2d", "upsample3d"):
            self.resample = ModuleList([_NullLeaf(), Conv2d(dim, out_dim, kernel_size=3, padding=1)])
            if mode == "upsample3d":
                self.time_conv = WanCausalConv3d(dim, dim * 2, (3, 1, 1), padding=(1, 0, 0))
        elif mode in ("downsample2d", "downsample3d"):
            self.resample = ModuleList([_NullLeaf(), Conv2d(dim, dim, kernel_size=3, stride=2, padding=0)])
            if mode == "downsample3d":
                self.time_conv = WanCausalConv3d(dim, dim, (3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [B, T, H, W, C]."""
        b, t, h, w, c = x.shape
        conv_params = params.get("resample", {}).get(1, {})

        if self.mode == "upsample3d":
            # first frame passes through; frames 1.. run the doubling time conv
            x0 = x[:, :1]
            rest = x[:, 1:]
            if rest.shape[1] > 0:
                # causal pad of 2 zeros is built into WanCausalConv3d
                y = self.time_conv(params["time_conv"], rest)  # [B, T-1, H, W, 2C]
                y = y.reshape(b, t - 1, h, w, 2, c)
                y = jnp.moveaxis(y, 4, 2).reshape(b, 2 * (t - 1), h, w, c)
                x = jnp.concatenate([x0, y], axis=1)
            else:
                x = x0
            t = x.shape[1]

        if self.mode in ("upsample2d", "upsample3d"):
            x = x.reshape(b * t, h, w, c)
            x = _upsample2x_nearest(x)
            x = self.resample[1](conv_params, x)
            x = x.reshape(b, t, *x.shape[1:])
        elif self.mode in ("downsample2d", "downsample3d"):
            x = x.reshape(b * t, h, w, c)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = self.resample[1](conv_params, x)
            x = x.reshape(b, t, *x.shape[1:])

        if self.mode == "downsample3d":
            # out = [x0, strided causal windows over the full stream]
            y = self.time_conv(params["time_conv"], x)  # k=3 s=2 pad=0
            x = jnp.concatenate([x[:, :1], y], axis=1)
        return x


class _NullLeaf(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}


class WanResidualBlock(Module):
    def __init__(self, in_dim: int, out_dim: int, non_linearity: str = "silu"):
        super().__init__()
        self.nonlinearity = get_activation(non_linearity)
        self.norm1 = WanRMSNorm(in_dim)
        self.conv1 = WanCausalConv3d(in_dim, out_dim, 3, padding=1)
        self.norm2 = WanRMSNorm(out_dim)
        self.conv2 = WanCausalConv3d(out_dim, out_dim, 3, padding=1)
        self.use_shortcut = in_dim != out_dim
        if self.use_shortcut:
            self.conv_shortcut = WanCausalConv3d(in_dim, out_dim, 1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv_shortcut(params["conv_shortcut"], x) if self.use_shortcut else x
        x = self.nonlinearity(self.norm1(params["norm1"], x))
        x = self.conv1(params["conv1"], x)
        x = self.nonlinearity(self.norm2(params["norm2"], x))
        x = self.conv2(params["conv2"], x)
        return x + h


class WanAttentionBlock(Module):
    """Single-head per-frame spatial attention (reference `:389`)."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim
        self.norm = WanRMSNorm(dim)
        self.to_qkv = Conv2d(dim, dim * 3, kernel_size=1, padding=0)
        self.proj = Conv2d(dim, dim, kernel_size=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        identity = x
        y = x.reshape(b * t, h, w, c)
        y = self.norm(params["norm"], y)
        qkv = self.to_qkv(params["to_qkv"], y).reshape(b * t, h * w, 1, 3 * c)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [BT, HW, 1, C]
        from ...ops.attention import dispatch_attention_fn

        o = dispatch_attention_fn(q, k, v, backend="native")  # [BT, HW, 1, C]
        o = o.reshape(b * t, h, w, c)
        o = self.proj(params["proj"], o)
        return identity + o.reshape(b, t, h, w, c)


class WanMidBlock(Module):
    def __init__(self, dim: int, non_linearity: str = "silu", num_layers: int = 1):
        super().__init__()
        self.resnets = ModuleList(
            [WanResidualBlock(dim, dim, non_linearity) for _ in range(num_layers + 1)]
        )
        self.attentions = ModuleList([WanAttentionBlock(dim) for _ in range(num_layers)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i, attn in enumerate(self.attentions):
            x = attn(params["attentions"][i], x)
            x = self.resnets[i + 1](params["resnets"][i + 1], x)
        return x


class WanEncoder3d(Module):
    def __init__(
        self,
        in_channels: int = 3,
        dim: int = 128,
        z_dim: int = 4,
        dim_mult: Tuple[int, ...] = (1, 2, 4, 4),
        num_res_blocks: int = 2,
        attn_scales: Tuple[float, ...] = (),
        temperal_downsample: Tuple[bool, ...] = (True, True, False),
        non_linearity: str = "silu",
    ):
        super().__init__()
        self.nonlinearity = get_activation(non_linearity)
        dims = [dim * u for u in [1] + list(dim_mult)]
        self.conv_in = WanCausalConv3d(in_channels, dims[0], 3, padding=1)

        down_blocks = []
        scale = 1.0
        out_dim = dims[-1]
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            cur = in_dim
            for _ in range(num_res_blocks):
                down_blocks.append(WanResidualBlock(cur, out_dim, non_linearity))
                if scale in attn_scales:
                    down_blocks.append(WanAttentionBlock(out_dim))
                cur = out_dim
            if i != len(dim_mult) - 1:
                mode = "downsample3d" if temperal_downsample[i] else "downsample2d"
                down_blocks.append(WanResample(out_dim, mode=mode))
                scale /= 2.0
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = WanMidBlock(out_dim, non_linearity, num_layers=1)
        self.norm_out = WanRMSNorm(out_dim)
        self.conv_out = WanCausalConv3d(out_dim, z_dim, 3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.nonlinearity(self.norm_out(params["norm_out"], x))
        return self.conv_out(params["conv_out"], x)


class WanUpBlock(Module):
    def __init__(self, in_dim: int, out_dim: int, num_res_blocks: int, upsample_mode: Optional[str] = None,
                 non_linearity: str = "silu"):
        super().__init__()
        resnets = []
        cur = in_dim
        for _ in range(num_res_blocks + 1):
            resnets.append(WanResidualBlock(cur, out_dim, non_linearity))
            cur = out_dim
        self.resnets = ModuleList(resnets)
        self.has_upsampler = upsample_mode is not None
        if upsample_mode is not None:
            self.upsamplers = ModuleList([WanResample(out_dim, mode=upsample_mode)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        if self.has_upsampler:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        return x


class WanDecoder3d(Module):
    def __init__(
        self,
        dim: int = 128,
        z_dim: int = 4,
        dim_mult: Tuple[int, ...] = (1, 2, 4, 4),
        num_res_blocks: int = 2,
        attn_scales: Tuple[float, ...] = (),
        temperal_upsample: Tuple[bool, ...] = (False, True, True),
        non_linearity: str = "silu",
        out_channels: int = 3,
    ):
        super().__init__()
        self.nonlinearity = get_activation(non_linearity)
        dims = [dim * u for u in [dim_mult[-1]] + list(dim_mult)[::-1]]
        self.conv_in = WanCausalConv3d(z_dim, dims[0], 3, padding=1)
        self.mid_block = WanMidBlock(dims[0], non_linearity, num_layers=1)

        up_blocks = []
        out_dim = dims[-1]
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2
            up_flag = i != len(dim_mult) - 1
            upsample_mode = None
            if up_flag and temperal_upsample[i]:
                upsample_mode = "upsample3d"
            elif up_flag:
                upsample_mode = "upsample2d"
            up_blocks.append(WanUpBlock(in_dim, out_dim, num_res_blocks, upsample_mode, non_linearity))
        self.up_blocks = ModuleList(up_blocks)

        self.norm_out = WanRMSNorm(out_dim)
        self.conv_out = WanCausalConv3d(out_dim, out_channels, 3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        x = self.mid_block(params["mid_block"], x)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        x = self.nonlinearity(self.norm_out(params["norm_out"], x))
        return self.conv_out(params["conv_out"], x)


class AutoencoderKLWan(Module, ModelMixin, ConfigMixin):
    """Wan 2.1 video VAE (4x temporal, 8x spatial compression)."""

    @register_to_config
    def __init__(
        self,
        base_dim: int = 96,
        z_dim: int = 16,
        dim_mult: Tuple[int, ...] = (1, 2, 4, 4),
        num_res_blocks: int = 2,
        attn_scales: Tuple[float, ...] = (),
        temperal_downsample: Tuple[bool, ...] = (False, True, True),
        dropout: float = 0.0,
        latents_mean: Optional[List[float]] = None,
        latents_std: Optional[List[float]] = None,
        is_residual: bool = False,
        in_channels: int = 3,
        out_channels: int = 3,
        patch_size: Optional[int] = None,
        scale_factor_temporal: int = 4,
        scale_factor_spatial: int = 8,
        clip_output: bool = True,
    ):
        super().__init__()
        self.clip_output = clip_output
        if is_residual or patch_size is not None:
            raise NotImplementedError("Wan 2.2 residual VAE variant not yet supported")
        self.z_dim = z_dim
        self.temperal_downsample = list(temperal_downsample)
        self.temperal_upsample = list(temperal_downsample)[::-1]

        self.encoder = WanEncoder3d(
            in_channels=in_channels,
            dim=base_dim,
            z_dim=z_dim * 2,
            dim_mult=dim_mult,
            num_res_blocks=num_res_blocks,
            attn_scales=attn_scales,
            temperal_downsample=temperal_downsample,
        )
        self.quant_conv = WanCausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.post_quant_conv = WanCausalConv3d(z_dim, z_dim, 1)
        self.decoder = WanDecoder3d(
            dim=base_dim,
            z_dim=z_dim,
            dim_mult=dim_mult,
            num_res_blocks=num_res_blocks,
            attn_scales=attn_scales,
            temperal_upsample=self.temperal_upsample,
            out_channels=out_channels,
        )

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, T, H, W] → DiagonalGaussianDistribution over [B, 2z, T', H', W']."""
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 4, 1, 2, 3))
        return DiagonalGaussianDistribution(moments) if return_dict else (DiagonalGaussianDistribution(moments),)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """z: [B, z, T', H', W'] → video [B, C, T, H, W] in [-1, 1]."""
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        h = self.post_quant_conv(params["post_quant_conv"], h)
        out = self.decoder(params["decoder"], h)
        out = jnp.transpose(out, (0, 4, 1, 2, 3))
        if self.clip_output:
            out = jnp.clip(out, -1.0, 1.0)
        if not return_dict:
            return (out,)
        return DecoderOutput(sample=out)

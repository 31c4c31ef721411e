"""AutoencoderKLLTXVideo — LTX-Video 3D causal VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_ltx.py:1035`
AutoencoderKLLTXVideo; LTXVideoCausalConv3d `:30`, LTXVideoResnetBlock3d `:81`,
Downsampler3d `:197`, Upsampler3d `:246`, down/mid/up blocks `:298-725`,
encoder `:726`, decoder `:879`).

TPU-first: NDHWC activations (channels on the 128-lane minor dim), full-video
single-graph encode/decode — temporal causality is a replicate left-pad on
every causal conv instead of the reference's frame caches; the pixel-
(un)shuffle down/upsamplers are pure reshape/transpose chains XLA fuses away.
Param-tree names match the reference state dict exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, LayerNorm, Module, ModuleList, Params, RMSNorm, get_activation
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput, DiagonalGaussianDistribution


class AutoencoderKLOutput(BaseOutput):
    latent_dist: DiagonalGaussianDistribution


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class LTXCausalConv3d(Module):
    """Conv3d with replicate temporal padding (causal: all k_t−1 frames on the
    left; else split both sides). Reference LTXVideoCausalConv3d (`:30`)."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1, dilation=1, is_causal=True,
                 padding_mode: str = "zeros"):
        super().__init__()
        k = _triple(kernel_size)
        s = _triple(stride)
        d = (dilation, 1, 1) if isinstance(dilation, int) else tuple(dilation)
        self.kernel_size = k
        self.is_causal = is_causal
        self.padding_mode = padding_mode  # spatial padding: "zeros" | "reflect" (LTX2 decoder)
        pad = ((0, 0), (k[1] // 2, k[1] // 2), (k[2] // 2, k[2] // 2))
        self.conv = Conv3d(
            in_channels,
            out_channels,
            kernel_size=k,
            stride=s,
            padding=pad if padding_mode == "zeros" else ((0, 0), (0, 0), (0, 0)),
            dilation=d,
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, F, H, W, C]
        kt = self.kernel_size[0]
        if kt > 1:
            if self.is_causal:
                left = jnp.repeat(x[:, :1], kt - 1, axis=1)
                x = jnp.concatenate([left, x], axis=1)
            else:
                pad = (kt - 1) // 2
                left = jnp.repeat(x[:, :1], pad, axis=1)
                right = jnp.repeat(x[:, -1:], pad, axis=1)
                x = jnp.concatenate([left, x, right], axis=1)
        if self.padding_mode != "zeros":
            hp, wp = self.kernel_size[1] // 2, self.kernel_size[2] // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (hp, hp), (wp, wp), (0, 0)), mode=self.padding_mode)
        return self.conv(params["conv"], x)


class LTXResnetBlock3d(Module):
    """Reference LTXVideoResnetBlock3d (`:81`): RMSNorm(eps 1e-8) → act →
    causal conv ×2, LayerNorm+1x1 shortcut on channel change, optional
    per-channel spatial-noise injection and 4-way timestep modulation."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        eps: float = 1e-6,
        elementwise_affine: bool = False,
        non_linearity: str = "swish",
        is_causal: bool = True,
        inject_noise: bool = False,
        timestep_conditioning: bool = False,
        padding_mode: str = "zeros",
        plain_shortcut: bool = False,
    ):
        super().__init__()
        out_channels = out_channels or in_channels
        self.in_channels = in_channels
        self.nonlinearity = get_activation(non_linearity)
        self.inject_noise = inject_noise
        self.timestep_conditioning = timestep_conditioning
        self.plain_shortcut = plain_shortcut

        self.norm1 = RMSNorm(in_channels, eps=1e-8, use_scale=elementwise_affine)
        self.conv1 = LTXCausalConv3d(in_channels, out_channels, kernel_size=3, is_causal=is_causal,
                                     padding_mode=padding_mode)
        self.norm2 = RMSNorm(out_channels, eps=1e-8, use_scale=elementwise_affine)
        self.conv2 = LTXCausalConv3d(out_channels, out_channels, kernel_size=3, is_causal=is_causal,
                                     padding_mode=padding_mode)
        self.norm3 = None
        self.conv_shortcut = None
        if in_channels != out_channels:
            self.norm3 = LayerNorm(in_channels, eps=eps, use_scale=True, use_bias=True)
            if plain_shortcut:
                # LTX2 uses a bare nn.Conv3d here (reference autoencoder_kl_ltx2.py:175):
                # param path conv_shortcut.{weight,bias} without the .conv nesting
                self.conv_shortcut = Conv3d(in_channels, out_channels, kernel_size=(1, 1, 1), stride=(1, 1, 1))
            else:
                self.conv_shortcut = LTXCausalConv3d(in_channels, out_channels, kernel_size=1, is_causal=is_causal)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.inject_noise:
            params["per_channel_scale1"] = jnp.zeros((self.in_channels, 1, 1), dtype)
            params["per_channel_scale2"] = jnp.zeros((self.in_channels, 1, 1), dtype)
        if self.timestep_conditioning:
            k = jax.random.fold_in(key, 13)
            params["scale_shift_table"] = (
                jax.random.normal(k, (4, self.in_channels), jnp.float32) / self.in_channels**0.5
            )
        return params

    def _add_noise(self, x, scale, key):
        # reference `:166`: one [H, W] noise map scaled per channel
        noise = jax.random.normal(key, x.shape[2:4], x.dtype)  # [H, W]
        return x + noise[None, None, :, :, None] * scale.reshape(-1)[None, None, None, None, :].astype(x.dtype)

    def __call__(self, params: Params, x: jax.Array, temb: Optional[jax.Array] = None, key=None) -> jax.Array:
        inputs = x
        h = self.norm1(params.get("norm1", {}), x)

        shift_1 = scale_1 = shift_2 = scale_2 = None
        if self.timestep_conditioning:
            ada = params["scale_shift_table"][None].astype(jnp.float32) + temb.reshape(
                temb.shape[0], 4, -1
            ).astype(jnp.float32)
            shift_1, scale_1, shift_2, scale_2 = [
                ada[:, i][:, None, None, None, :].astype(x.dtype) for i in range(4)
            ]
            h = h * (1 + scale_1) + shift_1

        h = self.nonlinearity(h)
        h = self.conv1(params["conv1"], h)
        if self.inject_noise:
            key, sub = jax.random.split(key)
            h = self._add_noise(h, params["per_channel_scale1"], sub)

        h = self.norm2(params.get("norm2", {}), h)
        if self.timestep_conditioning:
            h = h * (1 + scale_2) + shift_2
        h = self.nonlinearity(h)
        h = self.conv2(params["conv2"], h)
        if self.inject_noise:
            key, sub = jax.random.split(key)
            h = self._add_noise(h, params["per_channel_scale2"], sub)

        if self.norm3 is not None:
            inputs = self.norm3(params["norm3"], inputs)
        if self.conv_shortcut is not None:
            inputs = self.conv_shortcut(params["conv_shortcut"], inputs)
        return h + inputs


def _pixel_unshuffle_3d(x: jax.Array, s: Tuple[int, int, int]) -> jax.Array:
    """[B,F*s0,H*s1,W*s2,C] → [B,F,H,W,C*s0*s1*s2] with the reference's
    channel order (c, s0, s1, s2) — torch permute(0,1,3,5,7,2,4,6)."""
    b, f, h, w, c = x.shape
    x = x.reshape(b, f // s[0], s[0], h // s[1], s[1], w // s[2], s[2], c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))  # [B,F,H,W,C,s0,s1,s2]
    return x.reshape(b, f // s[0], h // s[1], w // s[2], c * s[0] * s[1] * s[2])


def _pixel_shuffle_3d(x: jax.Array, s: Tuple[int, int, int]) -> jax.Array:
    """Inverse of `_pixel_unshuffle_3d` (torch permute(0,1,5,2,6,3,7,4))."""
    b, f, h, w, cs = x.shape
    c = cs // (s[0] * s[1] * s[2])
    x = x.reshape(b, f, h, w, c, s[0], s[1], s[2])
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # [B,F,s0,H,s1,W,s2,C]
    return x.reshape(b, f * s[0], h * s[1], w * s[2], c)


class LTXDownsampler3d(Module):
    """Reference LTXVideoDownsampler3d (`:197`): replicate-prepend s0−1 first
    frames, conv to out/(s0·s1·s2), pixel-unshuffle, plus a grouped-mean
    shortcut of the unshuffled input."""

    def __init__(self, in_channels: int, out_channels: int, stride, is_causal=True, padding_mode="zeros"):
        super().__init__()
        self.stride = _triple(stride)
        s0, s1, s2 = self.stride
        self.group_size = (in_channels * s0 * s1 * s2) // out_channels
        self.conv = LTXCausalConv3d(
            in_channels, out_channels // (s0 * s1 * s2), kernel_size=3, stride=1, is_causal=is_causal,
            padding_mode=padding_mode,
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        s = self.stride
        x = jnp.concatenate([x[:, : s[0] - 1], x], axis=1)
        residual = _pixel_unshuffle_3d(x, s)
        b, f, h, w, cs = residual.shape
        residual = residual.reshape(b, f, h, w, cs // self.group_size, self.group_size).mean(axis=-1)
        out = self.conv(params["conv"], x)
        out = _pixel_unshuffle_3d(out, s)
        return out + residual


class LTXUpsampler3d(Module):
    """Reference LTXVideoUpsampler3d (`:246`)."""

    def __init__(self, in_channels: int, stride, is_causal=True, residual=False, upscale_factor=1,
                 padding_mode="zeros"):
        super().__init__()
        self.stride = _triple(stride)
        self.residual = residual
        self.upscale_factor = upscale_factor
        s0, s1, s2 = self.stride
        out_channels = (in_channels * s0 * s1 * s2) // upscale_factor
        self.conv = LTXCausalConv3d(in_channels, out_channels, kernel_size=3, stride=1, is_causal=is_causal,
                                    padding_mode=padding_mode)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        s = self.stride
        if self.residual:
            residual = _pixel_shuffle_3d(x, s)
            repeats = (s[0] * s[1] * s[2]) // self.upscale_factor
            residual = jnp.tile(residual, (1, 1, 1, 1, repeats))
            residual = residual[:, s[0] - 1 :]
        out = self.conv(params["conv"], x)
        out = _pixel_shuffle_3d(out, s)
        out = out[:, s[0] - 1 :]
        if self.residual:
            out = out + residual
        return out


class LTXMidBlock3d(Module):
    """Reference LTXVideoMidBlock3d (`:517`)."""

    def __init__(self, in_channels, num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 is_causal=True, inject_noise=False, timestep_conditioning=False, padding_mode="zeros",
                 plain_shortcut=False):
        super().__init__()
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            from ..transformers.pixart_transformer_2d import PixArtAlphaCombinedTimestepSizeEmbeddings

            self.time_embedder = PixArtAlphaCombinedTimestepSizeEmbeddings(in_channels * 4, 0)
        self.resnets = ModuleList(
            [
                LTXResnetBlock3d(
                    in_channels, in_channels, eps=resnet_eps, non_linearity=resnet_act_fn,
                    is_causal=is_causal, inject_noise=inject_noise, timestep_conditioning=timestep_conditioning,
                    padding_mode=padding_mode, plain_shortcut=plain_shortcut,
                )
                for _ in range(num_layers)
            ]
        )

    def __call__(self, params: Params, x: jax.Array, temb=None, key=None) -> jax.Array:
        if self.timestep_conditioning:
            temb = self.time_embedder(
                params["time_embedder"], jnp.ravel(temb), batch_size=x.shape[0], dtype=x.dtype
            )
        for i, resnet in enumerate(self.resnets):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            x = resnet(params["resnets"][i], x, temb, sub)
        return x


class LTXDownBlock3D(Module):
    """Reference LTXVideoDownBlock3D (`:298`): resnets → strided causal conv
    downsample → channel-change resnet (conv_out)."""

    def __init__(self, in_channels, out_channels=None, num_layers=1, resnet_eps=1e-6,
                 resnet_act_fn="swish", spatio_temporal_scale=True, is_causal=True):
        super().__init__()
        out_channels = out_channels or in_channels
        self.resnets = ModuleList(
            [
                LTXResnetBlock3d(in_channels, in_channels, eps=resnet_eps,
                                 non_linearity=resnet_act_fn, is_causal=is_causal)
                for _ in range(num_layers)
            ]
        )
        self.downsamplers = None
        if spatio_temporal_scale:
            self.downsamplers = ModuleList(
                [LTXCausalConv3d(in_channels, in_channels, kernel_size=3, stride=(2, 2, 2), is_causal=is_causal)]
            )
        self.conv_out = None
        if in_channels != out_channels:
            self.conv_out = LTXResnetBlock3d(
                in_channels, out_channels, eps=resnet_eps, non_linearity=resnet_act_fn, is_causal=is_causal
            )

    def __call__(self, params: Params, x: jax.Array, temb=None, key=None) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x, temb, key)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        if self.conv_out is not None:
            x = self.conv_out(params["conv_out"], x, temb, key)
        return x


class LTXVideo095DownBlock3D(Module):
    """Reference LTXVideo095DownBlock3D (`:404`): resnets → Downsampler3d of
    the configured type."""

    def __init__(self, in_channels, out_channels=None, num_layers=1, resnet_eps=1e-6,
                 resnet_act_fn="swish", spatio_temporal_scale=True, is_causal=True,
                 downsample_type="conv", padding_mode="zeros", plain_shortcut=False):
        super().__init__()
        out_channels = out_channels or in_channels
        self.resnets = ModuleList(
            [
                LTXResnetBlock3d(in_channels, in_channels, eps=resnet_eps,
                                 non_linearity=resnet_act_fn, is_causal=is_causal,
                                 padding_mode=padding_mode, plain_shortcut=plain_shortcut)
                for _ in range(num_layers)
            ]
        )
        self.downsamplers = None
        if spatio_temporal_scale:
            strides = {"spatial": (1, 2, 2), "temporal": (2, 1, 1), "spatiotemporal": (2, 2, 2)}
            if downsample_type == "conv":
                self.downsamplers = ModuleList(
                    [LTXCausalConv3d(in_channels, in_channels, kernel_size=3, stride=(2, 2, 2), is_causal=is_causal,
                                     padding_mode=padding_mode)]
                )
            else:
                self.downsamplers = ModuleList(
                    [LTXDownsampler3d(in_channels, out_channels, stride=strides[downsample_type], is_causal=is_causal,
                                      padding_mode=padding_mode)]
                )

    def __call__(self, params: Params, x: jax.Array, temb=None, key=None) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x, temb, key)
        if self.downsamplers is not None:
            x = self.downsamplers[0](params["downsamplers"][0], x)
        return x


class LTXUpBlock3d(Module):
    """Reference LTXVideoUpBlock3d (`:600`)."""

    def __init__(self, in_channels, out_channels=None, num_layers=1, resnet_eps=1e-6,
                 resnet_act_fn="swish", spatio_temporal_scale=True, is_causal=True,
                 inject_noise=False, timestep_conditioning=False, upsample_residual=False,
                 upscale_factor=1, upsample_type="spatiotemporal", padding_mode="zeros",
                 plain_shortcut=False):
        super().__init__()
        out_channels = out_channels or in_channels
        self.timestep_conditioning = timestep_conditioning
        if timestep_conditioning:
            from ..transformers.pixart_transformer_2d import PixArtAlphaCombinedTimestepSizeEmbeddings

            self.time_embedder = PixArtAlphaCombinedTimestepSizeEmbeddings(in_channels * 4, 0)
        self.conv_in = None
        if in_channels != out_channels:
            self.conv_in = LTXResnetBlock3d(
                in_channels, out_channels, eps=resnet_eps, non_linearity=resnet_act_fn,
                is_causal=is_causal, inject_noise=inject_noise, timestep_conditioning=timestep_conditioning,
                padding_mode=padding_mode, plain_shortcut=plain_shortcut,
            )
        self.upsamplers = None
        if spatio_temporal_scale:
            strides = {"spatial": (1, 2, 2), "temporal": (2, 1, 1), "spatiotemporal": (2, 2, 2)}
            self.upsamplers = ModuleList(
                [
                    LTXUpsampler3d(
                        out_channels * upscale_factor, stride=strides[upsample_type], is_causal=is_causal,
                        residual=upsample_residual, upscale_factor=upscale_factor, padding_mode=padding_mode,
                    )
                ]
            )
        self.resnets = ModuleList(
            [
                LTXResnetBlock3d(
                    out_channels, out_channels, eps=resnet_eps, non_linearity=resnet_act_fn,
                    is_causal=is_causal, inject_noise=inject_noise, timestep_conditioning=timestep_conditioning,
                    padding_mode=padding_mode, plain_shortcut=plain_shortcut,
                )
                for _ in range(num_layers)
            ]
        )

    def __call__(self, params: Params, x: jax.Array, temb=None, key=None) -> jax.Array:
        if self.conv_in is not None:
            x = self.conv_in(params["conv_in"], x, temb, key)
        if self.timestep_conditioning:
            temb = self.time_embedder(
                params["time_embedder"], jnp.ravel(temb), batch_size=x.shape[0], dtype=x.dtype
            )
        if self.upsamplers is not None:
            x = self.upsamplers[0](params["upsamplers"][0], x)
        for i, resnet in enumerate(self.resnets):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            x = resnet(params["resnets"][i], x, temb, sub)
        return x


class LTXVideoEncoder3d(Module):
    """Reference LTXVideoEncoder3d (`:726`). Input NDHWC video; output
    2·latent-channel moments (logvar is one broadcast channel)."""

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 128,
        block_out_channels=(128, 256, 512, 512),
        down_block_types=("LTXVideoDownBlock3D",) * 4,
        spatio_temporal_scaling=(True, True, True, False),
        layers_per_block=(4, 3, 3, 3, 4),
        downsample_type=("conv",) * 4,
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        is_causal: bool = True,
    ):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.in_channels = in_channels * patch_size**2
        self.out_channels = out_channels

        output_channel = block_out_channels[0]
        self.conv_in = LTXCausalConv3d(self.in_channels, output_channel, kernel_size=3, stride=1, is_causal=is_causal)

        is_ltx_095 = down_block_types[-1] == "LTXVideo095DownBlock3D"
        num_blocks = len(block_out_channels) - (1 if is_ltx_095 else 0)
        blocks = []
        for i in range(num_blocks):
            input_channel = output_channel
            if not is_ltx_095:
                output_channel = block_out_channels[i + 1] if i + 1 < num_blocks else block_out_channels[i]
            else:
                output_channel = block_out_channels[i + 1]
            if down_block_types[i] == "LTXVideoDownBlock3D":
                blocks.append(
                    LTXDownBlock3D(
                        input_channel, output_channel, num_layers=layers_per_block[i],
                        resnet_eps=resnet_norm_eps, spatio_temporal_scale=spatio_temporal_scaling[i],
                        is_causal=is_causal,
                    )
                )
            elif down_block_types[i] == "LTXVideo095DownBlock3D":
                blocks.append(
                    LTXVideo095DownBlock3D(
                        input_channel, output_channel, num_layers=layers_per_block[i],
                        resnet_eps=resnet_norm_eps, spatio_temporal_scale=spatio_temporal_scaling[i],
                        is_causal=is_causal, downsample_type=downsample_type[i],
                    )
                )
            else:
                raise ValueError(f"Unknown down block type: {down_block_types[i]}")
        self.down_blocks = ModuleList(blocks)

        self.mid_block = LTXMidBlock3d(
            output_channel, num_layers=layers_per_block[-1], resnet_eps=resnet_norm_eps, is_causal=is_causal
        )
        self.norm_out = RMSNorm(out_channels, eps=1e-8, use_scale=False)
        self.conv_out = LTXCausalConv3d(output_channel, out_channels + 1, kernel_size=3, stride=1, is_causal=is_causal)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, F, H, W, C]; spatio-temporal patchify with the reference's
        # (c, pt, p_w, p_h) channel order (encoder forward `:856-862`)
        p, pt = self.patch_size, self.patch_size_t
        b, f, h, w, c = x.shape
        x = x.reshape(b, f // pt, pt, h // p, p, w // p, p, c)
        # torch channel order after flatten(1,4) on NCDHW: (c, pt, pw, ph)
        x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 6, 4))  # [B,F,H,W,c,pt,pw,ph]
        x = x.reshape(b, f // pt, h // p, w // p, c * pt * p * p)

        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.norm_out({}, x)
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)
        # duplicate the single logvar channel to a full set (encoder `:871-873`)
        last = jnp.repeat(x[..., -1:], x.shape[-1] - 2, axis=-1)
        return jnp.concatenate([x, last], axis=-1)


class LTXVideoDecoder3d(Module):
    """Reference LTXVideoDecoder3d (`:879`)."""

    def __init__(
        self,
        in_channels: int = 128,
        out_channels: int = 3,
        block_out_channels=(128, 256, 512, 512),
        spatio_temporal_scaling=(True, True, True, False),
        layers_per_block=(4, 3, 3, 3, 4),
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        is_causal: bool = False,
        inject_noise=(False,) * 4,
        timestep_conditioning: bool = False,
        upsample_residual=(False,) * 4,
        upsample_factor=(1,) * 4,
    ):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.out_channels = out_channels * patch_size**2
        self.timestep_conditioning = timestep_conditioning

        block_out_channels = tuple(reversed(block_out_channels))
        spatio_temporal_scaling = tuple(reversed(spatio_temporal_scaling))
        layers_per_block = tuple(reversed(layers_per_block))
        inject_noise = tuple(reversed(inject_noise))
        upsample_residual = tuple(reversed(upsample_residual))
        upsample_factor = tuple(reversed(upsample_factor))
        output_channel = block_out_channels[0]

        self.conv_in = LTXCausalConv3d(in_channels, output_channel, kernel_size=3, stride=1, is_causal=is_causal)
        self.mid_block = LTXMidBlock3d(
            output_channel, num_layers=layers_per_block[0], resnet_eps=resnet_norm_eps,
            is_causal=is_causal, inject_noise=inject_noise[0], timestep_conditioning=timestep_conditioning,
        )
        blocks = []
        for i in range(len(block_out_channels)):
            input_channel = output_channel // upsample_factor[i]
            output_channel = block_out_channels[i] // upsample_factor[i]
            blocks.append(
                LTXUpBlock3d(
                    input_channel, output_channel, num_layers=layers_per_block[i + 1],
                    resnet_eps=resnet_norm_eps, spatio_temporal_scale=spatio_temporal_scaling[i],
                    is_causal=is_causal, inject_noise=inject_noise[i + 1],
                    timestep_conditioning=timestep_conditioning,
                    upsample_residual=upsample_residual[i], upscale_factor=upsample_factor[i],
                )
            )
        self.up_blocks = ModuleList(blocks)
        self.norm_out = RMSNorm(out_channels, eps=1e-8, use_scale=False)
        self.conv_out = LTXCausalConv3d(output_channel, self.out_channels, kernel_size=3, stride=1, is_causal=is_causal)
        self._final_channel = output_channel
        if timestep_conditioning:
            from ..transformers.pixart_transformer_2d import PixArtAlphaCombinedTimestepSizeEmbeddings

            self.time_embedder = PixArtAlphaCombinedTimestepSizeEmbeddings(output_channel * 2, 0)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.timestep_conditioning:
            k = jax.random.fold_in(key, 17)
            params["scale_shift_table"] = (
                jax.random.normal(k, (2, self._final_channel), jnp.float32) / self._final_channel**0.5
            )
            params["timestep_scale_multiplier"] = jnp.asarray(1000.0, jnp.float32)
        return params

    def __call__(self, params: Params, x: jax.Array, temb: Optional[jax.Array] = None, key=None) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        if self.timestep_conditioning and temb is not None:
            temb = temb * params["timestep_scale_multiplier"]
        x = self.mid_block(params["mid_block"], x, temb, key)
        for i, block in enumerate(self.up_blocks):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            x = block(params["up_blocks"][i], x, temb, sub)
        x = self.norm_out({}, x)
        if self.timestep_conditioning and temb is not None:
            t_emb = self.time_embedder(
                params["time_embedder"], jnp.ravel(temb), batch_size=x.shape[0], dtype=x.dtype
            )
            ada = params["scale_shift_table"][None].astype(jnp.float32) + t_emb.reshape(
                x.shape[0], 2, -1
            ).astype(jnp.float32)
            shift, scale = [ada[:, i][:, None, None, None, :].astype(x.dtype) for i in range(2)]
            x = x * (1 + scale) + shift
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)

        # un-patchify (decoder forward `:1026-1031`): channel order (c, pt, pa, pb)
        p, pt = self.patch_size, self.patch_size_t
        b, f, h, w, cs = x.shape
        c = cs // (pt * p * p)
        x = x.reshape(b, f, h, w, c, pt, p, p)  # [..., c, pt, pa, pb]
        # torch: permute(0,1,5,2,6,4,7,3): F*pt, H*pb, W*pa
        x = jnp.transpose(x, (0, 1, 5, 2, 7, 3, 6, 4))  # [B,F,pt,H,pb,W,pa,C]
        return x.reshape(b, f * pt, h * p, w * p, c)


class AutoencoderKLLTXVideo(Module, ModelMixin, ConfigMixin):
    """Public API speaks NCDHW ([B, C, F, H, W]) like the reference; compute
    is NDHWC internally."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 128,
        block_out_channels=(128, 256, 512, 512),
        down_block_types=("LTXVideoDownBlock3D",) * 4,
        decoder_block_out_channels=(128, 256, 512, 512),
        layers_per_block=(4, 3, 3, 3, 4),
        decoder_layers_per_block=(4, 3, 3, 3, 4),
        spatio_temporal_scaling=(True, True, True, False),
        decoder_spatio_temporal_scaling=(True, True, True, False),
        decoder_inject_noise=(False,) * 5,
        downsample_type=("conv",) * 4,
        upsample_residual=(False,) * 4,
        upsample_factor=(1,) * 4,
        timestep_conditioning: bool = False,
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        scaling_factor: float = 1.0,
        encoder_causal: bool = True,
        decoder_causal: bool = False,
        spatial_compression_ratio: Optional[int] = None,
        temporal_compression_ratio: Optional[int] = None,
    ):
        super().__init__()
        self.encoder = LTXVideoEncoder3d(
            in_channels=in_channels,
            out_channels=latent_channels,
            block_out_channels=tuple(block_out_channels),
            down_block_types=tuple(down_block_types),
            spatio_temporal_scaling=tuple(spatio_temporal_scaling),
            layers_per_block=tuple(layers_per_block),
            downsample_type=tuple(downsample_type),
            patch_size=patch_size,
            patch_size_t=patch_size_t,
            resnet_norm_eps=resnet_norm_eps,
            is_causal=encoder_causal,
        )
        self.decoder = LTXVideoDecoder3d(
            in_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=tuple(decoder_block_out_channels),
            spatio_temporal_scaling=tuple(decoder_spatio_temporal_scaling),
            layers_per_block=tuple(decoder_layers_per_block),
            patch_size=patch_size,
            patch_size_t=patch_size_t,
            resnet_norm_eps=resnet_norm_eps,
            is_causal=decoder_causal,
            inject_noise=tuple(decoder_inject_noise),
            timestep_conditioning=timestep_conditioning,
            upsample_residual=tuple(upsample_residual),
            upsample_factor=tuple(upsample_factor),
        )
        self.spatial_compression_ratio = (
            patch_size * 2 ** sum(spatio_temporal_scaling)
            if spatial_compression_ratio is None
            else spatial_compression_ratio
        )
        self.temporal_compression_ratio = (
            patch_size_t * 2 ** sum(spatio_temporal_scaling)
            if temporal_compression_ratio is None
            else temporal_compression_ratio
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        # the reference registers these as persistent buffers in the state dict
        params["latents_mean"] = jnp.zeros((self.config.latent_channels,), dtype)
        params["latents_std"] = jnp.ones((self.config.latent_channels,), dtype)
        return params

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        # x: [B, C, F, H, W] → NDHWC
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        moments = self.encoder(params["encoder"], h)
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))  # back to NCDHW
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, temb: Optional[jax.Array] = None,
               key: Optional[jax.Array] = None, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        dec = self.decoder(params["decoder"], h, temb, key)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

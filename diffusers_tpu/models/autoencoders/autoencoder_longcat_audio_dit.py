"""LongCatAudioDiTVae — LongCat audio waveform VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_longcat_audio_dit.py:296`):
weight-normed snake conv stacks with averaging/duplicating pixel-shuffle
shortcuts, softplus-std posterior, `scale=0.71` latent normalization.
Public API is NCL ([B, channels, samples]) like the reference; NLC inside
(reuses the Oobleck WN conv/Snake ops).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Module, ModuleList, Params
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..attention_blocks import _PassThrough
from ..modeling_utils import ModelMixin
from .autoencoder_oobleck import Snake1d, WNConv1d, WNConvTranspose1d


@dataclass
class LongCatAudioDiTVaeEncoderOutput(BaseOutput):
    latents: jax.Array


@dataclass
class LongCatAudioDiTVaeDecoderOutput(BaseOutput):
    sample: jax.Array


def _pixel_shuffle_1d(x: jax.Array, factor: int) -> jax.Array:
    """NLC pixel shuffle: [B, W, C] -> [B, W*factor, C//factor] with the
    torch NCL semantics of reference `_pixel_shuffle_1d` :68."""
    b, w, c = x.shape
    x = x.reshape(b, w, c // factor, factor)
    x = jnp.swapaxes(x, 2, 3)  # [B, W, factor, C//factor]
    return x.reshape(b, w * factor, c // factor)


class DownsampleShortcut(Module):
    """Space-to-channel then group-mean (reference :78); NLC."""

    def __init__(self, in_channels: int, out_channels: int, factor: int):
        super().__init__()
        self.factor = factor
        self.group_size = in_channels * factor // out_channels
        self.out_channels = out_channels

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, w, c = x.shape
        # torch view(B, C, W//f, f).permute(0,1,3,2) interleaves channel-major:
        # out channel block c*f + f_idx; in NLC gather the same ordering
        x = x.reshape(b, w // self.factor, self.factor, c)          # [B, W/f, f, C]
        x = jnp.swapaxes(x, 2, 3).reshape(b, w // self.factor, c * self.factor)
        return x.reshape(b, w // self.factor, self.out_channels, self.group_size).mean(axis=3)


class UpsampleShortcut(Module):
    """Channel repeat-interleave then pixel shuffle (reference :96); NLC."""

    def __init__(self, in_channels: int, out_channels: int, factor: int):
        super().__init__()
        self.factor = factor
        self.repeats = out_channels * factor // in_channels

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.repeat(x, self.repeats, axis=2)
        return _pixel_shuffle_1d(x, self.factor)


def _act(name: str, channels: int):
    if name == "snake":
        return Snake1d(channels)
    if name == "elu":
        return _Elu()
    raise ValueError(f"Unknown activation: {name}")


class _Elu(Module):
    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return jax.nn.elu(x)


class VaeResidualUnit(Module):
    def __init__(self, in_channels: int, out_channels: int, dilation: int,
                 kernel_size: int = 7, act_fn: str = "snake"):
        super().__init__()
        padding = (dilation * (kernel_size - 1)) // 2
        self.layers = ModuleList([
            _act(act_fn, out_channels),
            WNConv1d(in_channels, out_channels, kernel_size, dilation=dilation, padding=padding),
            _act(act_fn, out_channels),
            WNConv1d(out_channels, out_channels, kernel_size=1),
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"].get(i, {}), h)
        return x + h


class VaeEncoderBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, stride: int,
                 act_fn: str = "snake", downsample_shortcut: str = "none"):
        super().__init__()
        self.layers = ModuleList([
            VaeResidualUnit(in_channels, in_channels, dilation=1, act_fn=act_fn),
            VaeResidualUnit(in_channels, in_channels, dilation=3, act_fn=act_fn),
            VaeResidualUnit(in_channels, in_channels, dilation=9, act_fn=act_fn),
            _act(act_fn, in_channels),
            WNConv1d(in_channels, out_channels, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        ])
        self.residual = (DownsampleShortcut(in_channels, out_channels, stride)
                         if downsample_shortcut == "averaging" else None)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"].get(i, {}), h)
        if self.residual is not None:
            h = h + self.residual({}, x)
        return h


class VaeDecoderBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, stride: int,
                 act_fn: str = "snake", upsample_shortcut: str = "none"):
        super().__init__()
        self.layers = ModuleList([
            _act(act_fn, in_channels),
            WNConvTranspose1d(in_channels, out_channels, kernel_size=2 * stride, stride=stride,
                              padding=math.ceil(stride / 2)),
            VaeResidualUnit(out_channels, out_channels, dilation=1, act_fn=act_fn),
            VaeResidualUnit(out_channels, out_channels, dilation=3, act_fn=act_fn),
            VaeResidualUnit(out_channels, out_channels, dilation=9, act_fn=act_fn),
        ])
        self.residual = (UpsampleShortcut(in_channels, out_channels, stride)
                         if upsample_shortcut == "duplicating" else None)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"].get(i, {}), h)
        if self.residual is not None:
            h = h + self.residual({}, x)
        return h


def _resolve_stack(c_mults, strides):
    c_mults = [1] + list(c_mults or [1, 2, 4, 8, 16])
    strides = list(strides or [2] * (len(c_mults) - 1))
    if len(strides) < len(c_mults) - 1:
        strides.extend([strides[-1] if strides else 2] * (len(c_mults) - 1 - len(strides)))
    else:
        strides = strides[: len(c_mults) - 1]
    return c_mults, strides


class AudioDiTVaeEncoder(Module):
    def __init__(self, in_channels=1, channels=128, c_mults=None, strides=None,
                 latent_dim=64, encoder_latent_dim=128, act_fn="snake",
                 downsample_shortcut="averaging", out_shortcut="averaging"):
        super().__init__()
        c_mults, strides = _resolve_stack(c_mults, strides)
        layers = [WNConv1d(in_channels, c_mults[0] * channels, kernel_size=7, padding=3)]
        for idx in range(len(c_mults) - 1):
            layers.append(VaeEncoderBlock(
                c_mults[idx] * channels, c_mults[idx + 1] * channels, strides[idx],
                act_fn=act_fn, downsample_shortcut=downsample_shortcut))
        layers.append(WNConv1d(c_mults[-1] * channels, encoder_latent_dim, kernel_size=3, padding=1))
        self.layers = ModuleList(layers)
        self.shortcut = (DownsampleShortcut(c_mults[-1] * channels, encoder_latent_dim, 1)
                         if out_shortcut == "averaging" else None)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        n = len(self.layers)
        for i in range(n - 1):
            x = self.layers[i](params["layers"].get(i, {}), x)
        out = self.layers[n - 1](params["layers"][n - 1], x)
        if self.shortcut is not None:
            out = out + self.shortcut({}, x)
        return out


class AudioDiTVaeDecoder(Module):
    def __init__(self, in_channels=1, channels=128, c_mults=None, strides=None,
                 latent_dim=64, act_fn="snake", in_shortcut="duplicating",
                 final_tanh=False, upsample_shortcut="duplicating"):
        super().__init__()
        c_mults, strides = _resolve_stack(c_mults, strides)
        self.shortcut = (UpsampleShortcut(latent_dim, c_mults[-1] * channels, 1)
                         if in_shortcut == "duplicating" else None)
        layers = [WNConv1d(latent_dim, c_mults[-1] * channels, kernel_size=7, padding=3)]
        for idx in range(len(c_mults) - 1, 0, -1):
            layers.append(VaeDecoderBlock(
                c_mults[idx] * channels, c_mults[idx - 1] * channels, strides[idx - 1],
                act_fn=act_fn, upsample_shortcut=upsample_shortcut))
        layers.append(_act(act_fn, c_mults[0] * channels))
        layers.append(WNConv1d(c_mults[0] * channels, in_channels, kernel_size=7, padding=3,
                               use_bias=False))
        layers.append(_PassThrough())  # tanh slot
        self.final_tanh = final_tanh
        self.layers = ModuleList(layers)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.layers[0](params["layers"][0], x)
        if self.shortcut is not None:
            h = h + self.shortcut({}, x)
        for i in range(1, len(self.layers)):
            h = self.layers[i](params["layers"].get(i, {}), h)
        if self.final_tanh:
            h = jnp.tanh(h)
        return h


class LongCatAudioDiTVae(Module, ModelMixin, ConfigMixin):
    """Waveform VAE (reference LongCatAudioDiTVae :296). Public API NCL."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 1,
        channels: int = 128,
        c_mults: Optional[List[int]] = None,
        strides: Optional[List[int]] = None,
        latent_dim: int = 64,
        encoder_latent_dim: int = 128,
        act_fn: Optional[str] = None,
        use_snake: Optional[bool] = None,
        downsample_shortcut: str = "averaging",
        upsample_shortcut: str = "duplicating",
        out_shortcut: str = "averaging",
        in_shortcut: str = "duplicating",
        final_tanh: bool = False,
        downsampling_ratio: int = 2048,
        sample_rate: int = 24000,
        scale: float = 0.71,
    ):
        super().__init__()
        if act_fn is None:
            act_fn = "snake" if (use_snake is None or use_snake) else "elu"
        self.encoder = AudioDiTVaeEncoder(
            in_channels=in_channels, channels=channels, c_mults=c_mults, strides=strides,
            latent_dim=latent_dim, encoder_latent_dim=encoder_latent_dim, act_fn=act_fn,
            downsample_shortcut=downsample_shortcut, out_shortcut=out_shortcut,
        )
        self.decoder = AudioDiTVaeDecoder(
            in_channels=in_channels, channels=channels, c_mults=c_mults, strides=strides,
            latent_dim=latent_dim, act_fn=act_fn, in_shortcut=in_shortcut,
            final_tanh=final_tanh, upsample_shortcut=upsample_shortcut,
        )

    def encode(self, params: Params, sample: jax.Array, sample_posterior: bool = True,
               key: Optional[jax.Array] = None, return_dict: bool = True):
        x = jnp.swapaxes(sample, 1, 2)  # NCL -> NLC
        encoded = self.encoder(params["encoder"], x)
        mean, scale_param = jnp.split(encoded, 2, axis=-1)
        std = jax.nn.softplus(scale_param) + 1e-4
        if sample_posterior:
            if key is None:
                key = jax.random.PRNGKey(0)
            latents = mean + std * randn_tensor(mean.shape, key=key, dtype=mean.dtype)
        else:
            latents = mean
        latents = jnp.swapaxes(latents, 1, 2) / self.config.scale  # NLC -> NCL
        if not return_dict:
            return (latents,)
        return LongCatAudioDiTVaeEncoderOutput(latents=latents)

    def decode(self, params: Params, latents: jax.Array, return_dict: bool = True):
        x = jnp.swapaxes(latents * self.config.scale, 1, 2)  # NCL -> NLC
        decoded = jnp.swapaxes(self.decoder(params["decoder"], x), 1, 2)
        if not return_dict:
            return (decoded,)
        return LongCatAudioDiTVaeDecoderOutput(sample=decoded)

"""Cosmos3 AVAE audio tokenizer.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_cosmos3_audio.py:374`):
a SpecConvNeXt waveform encoder (STFT front-end → 1D ConvNeXt blocks with
SnakeBeta → strided weight-norm convs → VAE bottleneck) and an Oobleck-style
decoder with ``output_padding = stride % 2`` on the transposed convs.

TPU-first: NLC activations throughout; the STFT is framed host-convention
jnp (hann window, center=False, onesided) feeding `jnp.fft.rfft`; Snake/
weight-norm conv primitives are shared with `autoencoder_oobleck`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ...ops.module import LayerNorm, Module, ModuleList, Params
from ..modeling_utils import ModelMixin
from .autoencoder_oobleck import (
    OobleckDiagonalGaussianDistribution,
    Snake1d,
    WNConv1d,
    WNConvTranspose1d,
)


@dataclass
class Cosmos3AudioEncoderOutput(BaseOutput):
    latent_dist: OobleckDiagonalGaussianDistribution


@dataclass
class Cosmos3AudioDecoderOutput(BaseOutput):
    sample: jax.Array


class _Conv1d(Module):
    """Plain nn.Conv1d mirror (NLC activations; weight stored KIO; supports
    groups for the ConvNeXt depthwise conv)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 groups=1, use_bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.groups = groups
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        p = {"weight": jax.random.uniform(
            k1, (self.kernel_size, self.in_channels // self.groups, self.out_channels),
            dtype, -bound, bound)}
        if self.use_bias:
            p["bias"] = jax.random.uniform(k2, (self.out_channels,), dtype, -bound, bound)
        return p

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # O(I/g)K -> K(I/g)O
            return pname, tensor.transpose(2, 1, 0)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "weight":
            return pname, array.transpose(2, 1, 0)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x, params["weight"].astype(x.dtype), window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class Cosmos3AudioConvNeXtBlock(Module):
    """1D ConvNeXt block (reference `:68`): depthwise 7-conv (asymmetric pad
    when causal) → fp32 LN (no bias) → pw 1×1 → Snake/GELU → pw 1×1 + res.
    The torch dwconv is Sequential(pad, conv) → param subtree ``dwconv.1``."""

    def __init__(self, hidden_dim: int, intermediate_dim: int, use_snake: bool = True,
                 causal: bool = False):
        super().__init__()
        self.causal = causal
        self.use_snake = use_snake
        self.dwconv = ModuleList([
            Module(),  # index 0: the ConstantPad1d (no params)
            _Conv1d(hidden_dim, hidden_dim, kernel_size=7, groups=hidden_dim),
        ])
        self.norm = LayerNorm(hidden_dim, eps=1e-5, use_bias=False)
        self.pwconv1 = _Conv1d(hidden_dim, intermediate_dim, kernel_size=1)
        self.act = Snake1d(intermediate_dim) if use_snake else None
        self.pwconv2 = _Conv1d(intermediate_dim, hidden_dim, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        res = x
        pad = (6, 0) if self.causal else (3, 3)
        h = jnp.pad(x, ((0, 0), pad, (0, 0)))
        h = self.dwconv[1](params["dwconv"][1], h)
        h = self.norm(params["norm"], h.astype(jnp.float32)).astype(x.dtype)
        h = self.pwconv1(params["pwconv1"], h)
        h = self.act(params["act"], h) if self.use_snake else jax.nn.gelu(h, approximate=False)
        h = self.pwconv2(params["pwconv2"], h)
        return res + h


class Cosmos3AudioSpectrogramConvNeXtEncoder(Module):
    """Waveform → STFT (real‖imag channels) → 1×1 WN conv → per-stage
    [ConvNeXt ×num_blocks → strided WN conv] → 1×1 WN conv (reference `:112`)."""

    def __init__(self, input_channels, stereo, channels, latent_dim, channel_multiples,
                 strides, num_blocks, n_fft, hop_length, identity_init, use_snake,
                 causal, padding_mode):
        super().__init__()
        if causal:
            raise NotImplementedError("causal Cosmos3 AVAE encoder is not supported")
        self.input_channels = input_channels * (2 if stereo else 1)
        self.n_fft = n_fft
        self.hop_length = hop_length
        layers = [WNConv1d((n_fft + 2) * self.input_channels, channel_multiples[0] * channels,
                           kernel_size=1, use_bias=False)]
        for index, stride in enumerate(strides):
            input_dim = channel_multiples[index] * channels
            output_dim = (channel_multiples[index + 1] * channels
                          if index < len(channel_multiples) - 1 else channel_multiples[-1] * channels)
            for _ in range(num_blocks):
                layers.append(Cosmos3AudioConvNeXtBlock(input_dim, input_dim * 4,
                                                        use_snake=use_snake, causal=causal))
            layers.append(WNConv1d(input_dim, output_dim, kernel_size=2 * stride,
                                   stride=stride, padding=math.ceil(stride / 2)))
        layers.append(WNConv1d(channel_multiples[-1] * channels, latent_dim, kernel_size=1,
                               use_bias=False))
        self.layers = ModuleList(layers)

    def _spectrogram(self, waveform: jax.Array) -> jax.Array:
        """torch.stft(center=False, onesided) equivalent → [B, n_fft+2, T]
        (real channels then imaginary)."""
        n_fft, hop = self.n_fft, self.hop_length
        pad_left = (n_fft - hop) // 2
        pad_right = (n_fft - hop) - pad_left
        w = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (pad_left, pad_right)))
        n_frames = 1 + (w.shape[-1] - n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
        frames = w[:, idx]  # [B, T, n_fft]
        window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
        spec = jnp.fft.rfft(frames * window, axis=-1)  # [B, T, n_fft//2+1]
        spec = jnp.transpose(spec, (0, 2, 1))  # [B, F, T]
        return jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=1)

    def __call__(self, params: Params, audio: jax.Array) -> jax.Array:
        """audio: [B, C, T] waveform → latents [B, T', latent_dim] (NLC)."""
        b, c, t = audio.shape
        if c != self.input_channels:
            raise ValueError(f"expected {self.input_channels} audio channels, got {c}")
        spec = self._spectrogram(audio.reshape(b * c, t))
        spec = spec.reshape(b, c * spec.shape[1], spec.shape[2]).astype(audio.dtype)
        h = jnp.transpose(spec, (0, 2, 1))  # NLC
        for i, layer in enumerate(self.layers):
            h = layer(params["layers"][i], h)
        return h


class Cosmos3AudioResidualUnit(Module):
    """Oobleck residual unit (reference `:239`)."""

    def __init__(self, dimension: int = 16, dilation: int = 1):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.snake1 = Snake1d(dimension)
        self.conv1 = WNConv1d(dimension, dimension, kernel_size=7, dilation=dilation, padding=pad)
        self.snake2 = Snake1d(dimension)
        self.conv2 = WNConv1d(dimension, dimension, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        out = self.conv1(params["conv1"], self.snake1(params["snake1"], x))
        out = self.conv2(params["conv2"], self.snake2(params["snake2"], out))
        padding = (x.shape[1] - out.shape[1]) // 2
        if padding > 0:
            x = x[:, padding:-padding]
        return x + out


class Cosmos3AudioDecoderBlock(Module):
    """Oobleck decoder block with output_padding = stride % 2 (reference `:282`)."""

    def __init__(self, input_dim, output_dim, stride: int = 1, output_padding: int = 0):
        super().__init__()
        self.output_padding = output_padding
        self.snake1 = Snake1d(input_dim)
        self.conv_t1 = WNConvTranspose1d(input_dim, output_dim, kernel_size=2 * stride,
                                         stride=stride, padding=math.ceil(stride / 2),
                                         output_padding=output_padding)
        self.res_unit1 = Cosmos3AudioResidualUnit(output_dim, dilation=1)
        self.res_unit2 = Cosmos3AudioResidualUnit(output_dim, dilation=3)
        self.res_unit3 = Cosmos3AudioResidualUnit(output_dim, dilation=9)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_t1(params["conv_t1"], self.snake1(params["snake1"], x))
        x = self.res_unit1(params["res_unit1"], x)
        x = self.res_unit2(params["res_unit2"], x)
        return self.res_unit3(params["res_unit3"], x)


class Cosmos3AudioDecoder(Module):
    """Oobleck decoder (reference `:319`)."""

    def __init__(self, channels, input_channels, audio_channels, upsampling_ratios,
                 channel_multiples):
        super().__init__()
        strides = upsampling_ratios
        channel_multiples = [1] + list(channel_multiples)
        self.conv1 = WNConv1d(input_channels, channels * channel_multiples[-1],
                              kernel_size=7, padding=3)
        self.block = ModuleList([
            Cosmos3AudioDecoderBlock(
                input_dim=channels * channel_multiples[len(strides) - i],
                output_dim=channels * channel_multiples[len(strides) - i - 1],
                stride=stride, output_padding=stride % 2,
            )
            for i, stride in enumerate(strides)
        ])
        self.snake1 = Snake1d(channels)
        self.conv2 = WNConv1d(channels, audio_channels, kernel_size=7, padding=3, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv1(params["conv1"], x)
        for i, layer in enumerate(self.block):
            x = layer(params["block"][i], x)
        x = self.snake1(params["snake1"], x)
        return self.conv2(params["conv2"], x)


class Cosmos3AVAEAudioTokenizer(Module, ModelMixin, ConfigMixin):
    """Audio tokenizer for Cosmos3 sound generation (reference `:374`)."""

    @register_to_config
    def __init__(
        self,
        model_type: str = "autoencoder_v2",
        sampling_rate: int = 48000,
        vocoder_input_dim: int = 64,
        dec_dim: int = 320,
        dec_c_mults: tuple = (1, 2, 4, 8, 16),
        dec_strides: tuple = (2, 4, 5, 6, 8),
        dec_out_channels: int = 2,
        stereo: bool = True,
        use_wav_as_input: bool = True,
        normalize_volume: bool = True,
        hop_size: Optional[int] = None,
        input_channels: int = 1,
        enc_type: str = "spec_convnext",
        enc_dim: int = 192,
        enc_intermediate_dim: int = 768,
        enc_num_layers: int = 12,
        enc_num_blocks: int = 2,
        enc_n_fft: int = 64,
        enc_hop_length: int = 16,
        enc_latent_dim: int = 128,
        enc_c_mults: tuple = (1, 2, 4),
        enc_strides: tuple = (4, 5, 6),
        enc_identity_init: bool = False,
        enc_use_snake: bool = True,
        dec_type: str = "oobleck",
        bottleneck_type: str = "vae",
        causal: bool = False,
        padding_mode: str = "zeros",
        encoder_enabled: bool = True,
        **unused,
    ):
        super().__init__()
        if model_type != "autoencoder_v2" or enc_type != "spec_convnext" or dec_type != "oobleck":
            raise NotImplementedError("only the shipped AVAE configuration is supported")
        if bottleneck_type != "vae":
            raise NotImplementedError("only the VAE bottleneck is supported")
        if encoder_enabled:
            self.encoder = Cosmos3AudioSpectrogramConvNeXtEncoder(
                input_channels=input_channels, stereo=stereo, channels=enc_dim,
                latent_dim=enc_latent_dim, channel_multiples=tuple(enc_c_mults),
                strides=tuple(enc_strides), num_blocks=enc_num_blocks,
                n_fft=enc_n_fft, hop_length=enc_hop_length,
                identity_init=enc_identity_init, use_snake=enc_use_snake,
                causal=causal, padding_mode=padding_mode,
            )
        self.decoder = Cosmos3AudioDecoder(
            channels=dec_dim, input_channels=vocoder_input_dim,
            audio_channels=dec_out_channels,
            upsampling_ratios=list(reversed(dec_strides)),
            channel_multiples=list(dec_c_mults),
        )
        self._hop_size = int(hop_size) if hop_size is not None else math.prod(dec_strides)

    def encode(self, params: Params, sample: jax.Array, return_dict: bool = True,
               force_pad: bool = True):
        """sample: [B, C, T] waveform → posterior over [B, 2*latent, T']."""
        if getattr(self, "encoder", None) is None or "encoder" not in params:
            raise ValueError("decoder-only AVAE weights cannot encode audio")
        h = sample
        if self.config.normalize_volume:
            h = h / (jnp.max(jnp.abs(h)) + 1e-5) * 0.95
        if force_pad:
            pad = (self._hop_size - (h.shape[-1] % self._hop_size)) % self._hop_size
            if pad > 0:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, pad)))
        moments = self.encoder(params["encoder"], h)  # [B, T', 2*latent] NLC
        moments = jnp.transpose(moments, (0, 2, 1))  # → NCL for the distribution
        posterior = OobleckDiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return Cosmos3AudioEncoderOutput(latent_dist=posterior)

    def decode(self, params: Params, latents: jax.Array) -> jax.Array:
        """latents: [B, C, T] (or [C, T]) → waveform [B, audio_channels, N]."""
        squeeze = latents.ndim == 2
        if squeeze:
            latents = latents[None]
        x = jnp.transpose(latents, (0, 2, 1))  # NCL → NLC
        audio = self.decoder(params["decoder"], x)
        audio = jnp.clip(jnp.transpose(audio, (0, 2, 1)), -1.0, 1.0)
        return audio[0] if squeeze else audio

    def __call__(self, params: Params, sample: jax.Array, sample_posterior: bool = False,
                 return_dict: bool = True, key: Optional[jax.Array] = None,
                 force_pad: bool = True):
        posterior = self.encode(params, sample, force_pad=force_pad).latent_dist
        latents = posterior.sample(key) if sample_posterior else posterior.mode()
        decoded = self.decode(params, latents)
        if not return_dict:
            return (decoded,)
        return Cosmos3AudioDecoderOutput(sample=decoded)

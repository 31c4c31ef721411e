"""MiniMax-H3 audio VAE: DAC waveform encoder + BigVGAN decoder (mono 32 kHz).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_minimax_h3_audio.py:488`
AutoencoderKLMiniMaxH3Audio): Snake/SnakeBeta activations (`:121,:133`),
Kaiser-sinc anti-aliased up/downsamplers whose filters are computed — not
loaded (`kaiser_sinc_filter1d` `:93`), the DAC encoder (`:268`), a causal-
attention projection whose heads are MEAN-POOLED away and adaptively
average-pooled to `latent_channels` (`:304-372`), separate `(mean, log_std)`
posterior heads (`:55`), and the BigVGAN AMP-block decoder with the
`ups.<i>.0` checkpoint nesting (`:428-480`).

TPU-first: NLC conv layout throughout; the adaptive average pool is a fixed
averaging matrix (static shapes → one matmul); filters are numpy constants
baked at trace time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv1d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..modeling_utils import ModelMixin
from .autoencoder_kl_cogvideox import DecoderOutput
from .autoencoder_oobleck import WNConv1d, WNConvTranspose1d


class MiniMaxH3AudioDiagonalGaussianDistribution:
    """Posterior as (mean, log_std) — two separate conv heads (reference `:55`)."""

    def __init__(self, mean: jax.Array, logs: jax.Array):
        self.mean = mean
        self.logs = logs
        self.std = jnp.exp(logs)

    def mode(self) -> jax.Array:
        return self.mean

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * randn_tensor(self.mean.shape, key=key, dtype=self.mean.dtype)


@dataclass
class MiniMaxH3AudioEncoderOutput(BaseOutput):
    latent_dist: MiniMaxH3AudioDiagonalGaussianDistribution


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """[kernel_size] Kaiser-windowed sinc low-pass (reference `:93`)."""
    half_size = kernel_size // 2
    attenuation = 2.285 * (half_size - 1) * math.pi * (4 * half_width) + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if kernel_size % 2 == 0:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    return (filt / filt.sum()).astype(np.float32)


class _Snake1d(Module):
    """x + (alpha+1e-9)^-1 sin(alpha x)^2, per-channel alpha (reference `:121`).
    NLC activations; torch stores alpha as [1, C, 1]."""

    def __init__(self, channels: int):
        super().__init__()
        self.channels = channels

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"alpha": jnp.ones((self.channels,), dtype)}

    def convert_torch_param(self, pname, tensor):
        return pname, tensor.reshape(-1)

    def convert_param_to_torch(self, pname, array):
        return pname, array.reshape(1, -1, 1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = params["alpha"].astype(x.dtype)
        return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


class _SnakeBeta(Module):
    """x + (e^beta+1e-9)^-1 sin(e^alpha x)^2, log-space [C] params (reference `:133`)."""

    def __init__(self, channels: int):
        super().__init__()
        self.channels = channels

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"alpha": jnp.zeros((self.channels,), dtype),
                "beta": jnp.zeros((self.channels,), dtype)}

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = jnp.exp(params["alpha"]).astype(x.dtype)
        beta = jnp.exp(params["beta"]).astype(x.dtype)
        return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * x))


def _depthwise_conv(x: jax.Array, filt: np.ndarray, stride: int) -> jax.Array:
    """NLC depthwise conv with a shared scalar filter per channel."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(jnp.asarray(filt)[:, None, None], (len(filt), 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


class _LowPass1d(Module):
    def __init__(self, cutoff, half_width, stride, kernel_size):
        super().__init__()
        even = kernel_size % 2 == 0
        self.pad_left = kernel_size // 2 - int(even)
        self.pad_right = kernel_size // 2
        self.stride = stride
        self.filter = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (self.pad_left, self.pad_right), (0, 0)), mode="edge")
        return _depthwise_conv(x, self.filter, self.stride)


class _UpSample1d(Module):
    def __init__(self, ratio: int, kernel_size: int):
        super().__init__()
        self.ratio = ratio
        self.stride = ratio
        self.kernel_size = kernel_size
        self.pad = kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (kernel_size - self.stride + 1) // 2
        self.filter = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)), mode="edge")
        k = self.kernel_size
        kernel = jnp.broadcast_to(jnp.asarray(self.filter[::-1].copy())[:, None, None],
                                  (k, 1, c)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=((k - 1, k - 1),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        )
        y = self.ratio * y
        return y[:, self.pad_left: y.shape[1] - self.pad_right]


class _AliasFreeActivation(Module):
    """upsample → activation → downsample (reference `:207`)."""

    def __init__(self, activation: Module, ratio: int = 2, kernel_size: int = 12):
        super().__init__()
        self.act = activation
        self.upsample = _UpSample1d(ratio, kernel_size)
        self.downsample = _LowPass1d(0.5 / ratio, 0.6 / ratio, ratio, kernel_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.upsample({}, x)
        x = self.act(params["act"], x)
        return self.downsample({}, x)


class _ResidualUnit(Module):
    def __init__(self, dim: int, dilation: int):
        super().__init__()
        self.block = ModuleList([
            _Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=((7 - 1) * dilation) // 2),
            _Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for i, mod in enumerate(self.block):
            h = mod(params["block"][i], h)
        pad = (x.shape[1] - h.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + h


class _EncoderBlock(Module):
    def __init__(self, dim: int, stride: int):
        super().__init__()
        self.block = ModuleList([
            _ResidualUnit(dim // 2, dilation=1),
            _ResidualUnit(dim // 2, dilation=3),
            _ResidualUnit(dim // 2, dilation=9),
            _Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, mod in enumerate(self.block):
            x = mod(params["block"][i], x)
        return x


class MiniMaxH3AudioEncoder(Module):
    def __init__(self, d_model: int, strides: Tuple[int, ...], d_latent: int):
        super().__init__()
        mods = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for stride in strides:
            d_model *= 2
            mods.append(_EncoderBlock(d_model, stride=stride))
        mods += [_Snake1d(d_model), WNConv1d(d_model, d_latent, kernel_size=3, padding=1)]
        self.block = ModuleList(mods)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, mod in enumerate(self.block):
            x = mod(params["block"][i], x)
        return x


class _GeGluMlp(Module):
    def __init__(self, in_features: int, hidden_features: int):
        super().__init__()
        self.norm = LayerNorm(in_features)
        self.w0 = Linear(in_features, hidden_features)
        self.w1 = Linear(in_features, hidden_features)
        self.w2 = Linear(hidden_features, in_features)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.norm(params["norm"], x)
        x = jax.nn.gelu(self.w0(params["w0"], x), approximate=True) * self.w1(params["w1"], x)
        return self.w2(params["w2"], x)


def _adaptive_avg_pool_matrix(in_dim: int, out_dim: int) -> np.ndarray:
    """[in_dim, out_dim] averaging matrix matching F.adaptive_avg_pool1d."""
    mat = np.zeros((in_dim, out_dim), np.float32)
    for i in range(out_dim):
        start = (i * in_dim) // out_dim
        end = -(-((i + 1) * in_dim) // out_dim)
        mat[start:end, i] = 1.0 / (end - start)
    return mat


class MiniMaxH3AudioCausalAttention(Module):
    """Fused bias-less qkv + separate q/v biases + zero k bias; heads are
    mean-pooled, then the head dim is adaptively avg-pooled to out_dim
    (reference `:341`)."""

    def __init__(self, in_dim: int, out_dim: int, num_heads: int):
        super().__init__()
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.num_heads = num_heads
        self.head_dim = in_dim // num_heads
        self.qkv = Linear(in_dim, in_dim * 3, use_bias=False)
        self.proj = Linear(out_dim, out_dim)
        self._pool = _adaptive_avg_pool_matrix(self.head_dim, out_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["q_bias"] = jnp.zeros((self.in_dim,), dtype)
        params["v_bias"] = jnp.zeros((self.in_dim,), dtype)
        params["zero_k_bias"] = jnp.zeros((self.in_dim,), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, s, _ = x.shape
        bias = jnp.concatenate([params["q_bias"], params["zero_k_bias"], params["v_bias"]])
        qkv = self.qkv(params["qkv"], x) + bias.astype(x.dtype)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, self.num_heads, self.head_dim), 3, axis=2)
        out = dispatch_attention_fn(q[:, :, 0], k[:, :, 0], v[:, :, 0], is_causal=True)
        out = jnp.mean(out, axis=2)  # mean-pool the heads away → [B, S, head_dim]
        out = out @ jnp.asarray(self._pool, out.dtype)  # adaptive pool → out_dim
        return self.proj(params["proj"], out)


class MiniMaxH3AudioAttnProjection(Module):
    def __init__(self, in_dim: int, out_dim: int, num_heads: int, mlp_ratio: int = 2):
        super().__init__()
        self.norm1 = LayerNorm(in_dim)
        self.attn = MiniMaxH3AudioCausalAttention(in_dim, out_dim, num_heads)
        self.proj = Linear(in_dim, out_dim)
        self.norm3 = LayerNorm(in_dim)
        self.norm2 = LayerNorm(out_dim)
        self.mlp = _GeGluMlp(out_dim, out_dim * mlp_ratio)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.proj(params["proj"], self.norm3(params["norm3"], x)) + self.attn(
            params["attn"], self.norm1(params["norm1"], x))
        return x + self.mlp(params["mlp"], self.norm2(params["norm2"], x))


class _AMPBlock(Module):
    def __init__(self, channels: int, kernel_size: int, dilation: Tuple[int, ...]):
        super().__init__()
        self.convs1 = ModuleList([
            WNConv1d(channels, channels, kernel_size, dilation=d, padding=(kernel_size * d - d) // 2)
            for d in dilation
        ])
        self.convs2 = ModuleList([
            WNConv1d(channels, channels, kernel_size, dilation=1, padding=(kernel_size - 1) // 2)
            for _ in dilation
        ])
        self.activations = ModuleList([
            _AliasFreeActivation(_SnakeBeta(channels)) for _ in range(2 * len(dilation))
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        n = len(self.convs1)
        for i in range(n):
            h = self.activations[2 * i](params["activations"][2 * i], x)
            h = self.convs1[i](params["convs1"][i], h)
            h = self.activations[2 * i + 1](params["activations"][2 * i + 1], h)
            h = self.convs2[i](params["convs2"][i], h)
            x = x + h
        return x


class MiniMaxH3AudioBigVGANDecoder(Module):
    def __init__(self, in_channels, upsample_initial_channel, upsample_rates,
                 upsample_kernel_sizes, resblock_kernel_sizes, resblock_dilation_sizes):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.conv_pre = WNConv1d(in_channels, upsample_initial_channel, 7, stride=1, padding=3)
        self.ups = ModuleList([
            ModuleList([WNConvTranspose1d(
                upsample_initial_channel // (2 ** i),
                upsample_initial_channel // (2 ** (i + 1)),
                kernel, stride=rate, padding=(kernel - rate) // 2,
            )])
            for i, (rate, kernel) in enumerate(zip(upsample_rates, upsample_kernel_sizes))
        ])
        resblocks = []
        for i in range(self.num_upsamples):
            channels = upsample_initial_channel // (2 ** (i + 1))
            for kernel, dilation in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                resblocks.append(_AMPBlock(channels, kernel, tuple(dilation)))
        self.resblocks = ModuleList(resblocks)
        self.activation_post = _AliasFreeActivation(_SnakeBeta(channels))
        self.conv_post = WNConv1d(channels, 1, 7, stride=1, padding=3, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_pre(params["conv_pre"], x)
        for i in range(self.num_upsamples):
            x = self.ups[i][0](params["ups"][i][0], x)
            residual = None
            for j in range(self.num_kernels):
                idx = i * self.num_kernels + j
                block = self.resblocks[idx](params["resblocks"][idx], x)
                residual = block if residual is None else residual + block
            x = residual / self.num_kernels
        x = self.activation_post(params["activation_post"], x)
        x = self.conv_post(params["conv_post"], x)
        return jnp.clip(x, -1.0, 1.0)


class AutoencoderKLMiniMaxH3Audio(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        encoder_dim: int = 64,
        encoder_rates: Tuple[int, ...] = (2, 4, 4, 5, 5),
        latent_dim: int = 2048,
        latent_channels: int = 32,
        num_attention_heads: int = 8,
        decoder_dim: int = 1024,
        decoder_rates: Tuple[int, ...] = (5, 5, 2, 2, 2, 2, 2),
        decoder_kernel_sizes: Tuple[int, ...] = (9, 9, 4, 4, 4, 4, 4),
        resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11),
        resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        sampling_rate: int = 32000,
        latents_mean: Optional[List[float]] = None,
        latents_std: Optional[List[float]] = None,
    ):
        super().__init__()
        encoder_rates = tuple(int(r) for r in encoder_rates)
        decoder_rates = tuple(int(r) for r in decoder_rates)
        self.hop_length = int(np.prod(encoder_rates))
        if int(np.prod(decoder_rates)) != self.hop_length:
            raise ValueError(f"decoder_rates must multiply to {self.hop_length}")
        if latent_dim % latent_channels != 0:
            raise ValueError("latent_dim must be a multiple of latent_channels")

        self.encoder = MiniMaxH3AudioEncoder(encoder_dim, encoder_rates, latent_dim)
        self.pre_block = MiniMaxH3AudioAttnProjection(latent_dim, latent_channels, num_attention_heads)
        self.mean_proj = Conv1d(latent_channels, latent_channels, 1)
        self.logs_proj = Conv1d(latent_channels, latent_channels, 1)
        self.dec_in_proj = Conv1d(latent_channels, latent_dim, 1)
        self.decoder = MiniMaxH3AudioBigVGANDecoder(
            latent_dim, decoder_dim, decoder_rates,
            tuple(int(k) for k in decoder_kernel_sizes),
            tuple(int(k) for k in resblock_kernel_sizes),
            tuple(tuple(int(d) for d in dil) for dil in resblock_dilation_sizes))

    def encode(self, params: Params, sample: jax.Array, return_dict: bool = True):
        """sample: [B, 1, samples] mono waveform."""
        if sample.ndim != 3 or sample.shape[1] != 1:
            raise ValueError(f"sample must be [B, 1, samples], got {sample.shape}")
        right_pad = -sample.shape[-1] % self.hop_length
        if right_pad > 0:
            sample = jnp.pad(sample, ((0, 0), (0, 0), (0, right_pad)))
        x = jnp.transpose(sample, (0, 2, 1))  # NCL → NLC
        x = self.encoder(params["encoder"], x)
        x = self.pre_block(params["pre_block"], x)
        mean = self.mean_proj(params["mean_proj"], x)
        logs = self.logs_proj(params["logs_proj"], x)
        posterior = MiniMaxH3AudioDiagonalGaussianDistribution(
            jnp.transpose(mean, (0, 2, 1)), jnp.transpose(logs, (0, 2, 1)))
        if not return_dict:
            return (posterior,)
        return MiniMaxH3AudioEncoderOutput(latent_dist=posterior)

    def decode(self, params: Params, latents: jax.Array, return_dict: bool = True):
        """latents: [B, latent_channels, num_frames] → waveform [B, 1, frames*hop]."""
        if latents.ndim != 3:
            raise ValueError(f"latents must be [B, C, T], got {latents.shape}")
        x = jnp.transpose(latents, (0, 2, 1))
        x = self.dec_in_proj(params["dec_in_proj"], x)
        x = self.decoder(params["decoder"], x)
        x = jnp.transpose(x, (0, 2, 1))
        if not return_dict:
            return (x,)
        return DecoderOutput(sample=x)

"""LTX2 vocoders — BigVGAN-style mel→waveform generators.

Behavioral mirror of the reference (`/root/reference/src/diffusers/pipelines/
ltx2/vocoder.py`: LTX2Vocoder `:279`, LTX2VocoderWithBWE `:479`,
kaiser_sinc_filter1d `:11`, Down/UpSample1d `:57/:90`, AntiAliasAct1d `:140`,
SnakeBeta `:172`, ResBlock `:214`, CausalSTFT `:421`, MelSTFT `:452`).

TPU-native design: 1D activations are NLC (time on the sublane dim, channels
on the 128-lane minor dim); transposed convs are lhs-dilated correlations;
the antialias resampling filters are depthwise convs sharing one sinc kernel
across channels. Filters are precomputed host-side with numpy at init and
overwritten by the checkpoint's persistent buffers on load.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Conv1d, ConvTranspose1d, Module, ModuleList, Params


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass kernel (`vocoder.py:11`), numpy host-side."""
    delta_f = 4 * half_width
    half_size = kernel_size // 2
    amplitude = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if amplitude > 50.0:
        beta = 0.1102 * (amplitude - 8.7)
    elif amplitude >= 21.0:
        beta = 0.5842 * (amplitude - 21) ** 0.4 + 0.07886 * (amplitude - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    even = kernel_size % 2 == 0
    time = np.arange(-half_size, half_size) + 0.5 if even else np.arange(kernel_size) - half_size
    if cutoff == 0.0:
        return np.zeros_like(time, dtype=np.float32)
    time = 2 * cutoff * time
    sinc = np.where(time == 0, 1.0, np.sin(math.pi * time) / (math.pi * time + 1e-30))
    filt = 2 * cutoff * window * sinc
    return (filt / filt.sum()).astype(np.float32)


def _depthwise_filter(filt: jax.Array, channels: int) -> jax.Array:
    """[K] (or torch-buffer [1,1,K]) → HIO [K, 1, C] shared across channels."""
    f = filt.reshape(-1)
    return jnp.broadcast_to(f[:, None, None], (f.shape[0], 1, channels))


class DownSample1d(Module):
    """Antialias low-pass + stride-`ratio` depthwise decimation (`:57`)."""

    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None,
                 use_padding: bool = True, padding_mode: str = "replicate"):
        super().__init__()
        self.ratio = ratio
        self.kernel_size = kernel_size or int(6 * ratio // 2) * 2
        self.pad_left = self.kernel_size // 2 + (self.kernel_size % 2) - 1
        self.pad_right = self.kernel_size // 2
        self.use_padding = use_padding
        self.pad_mode = "edge" if padding_mode == "replicate" else "constant"
        self._filter = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"filter": jnp.asarray(self._filter, dtype).reshape(1, 1, -1)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, L, C]
        c = x.shape[-1]
        if self.use_padding:
            x = jnp.pad(x, ((0, 0), (self.pad_left, self.pad_right), (0, 0)), mode=self.pad_mode)
        return jax.lax.conv_general_dilated(
            x, _depthwise_filter(params["filter"].astype(x.dtype), c),
            window_strides=(self.ratio,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        )


class UpSample1d(Module):
    """Depthwise transposed-conv interpolation by `ratio` (`:90`)."""

    def __init__(self, ratio: int = 2, kernel_size: Optional[int] = None,
                 window_type: str = "kaiser", padding_mode: str = "replicate"):
        super().__init__()
        self.ratio = ratio
        self.pad_mode = "edge" if padding_mode == "replicate" else "constant"
        if window_type == "hann":
            rolloff, width_lp = 0.99, 6
            width = math.ceil(width_lp / rolloff)
            self.kernel_size = 2 * width * ratio + 1
            self.pad = width
            self.pad_left = 2 * width * ratio
            self.pad_right = self.kernel_size - ratio
            t = (np.arange(self.kernel_size) / ratio - width) * rolloff
            tc = np.clip(t, -width_lp, width_lp)
            window = np.cos(tc * math.pi / width_lp / 2) ** 2
            self._filter = (np.sinc(t) * window * rolloff / ratio).astype(np.float32)
        else:
            self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
            self.pad = self.kernel_size // ratio - 1
            self.pad_left = self.pad * ratio + (self.kernel_size - ratio) // 2
            self.pad_right = self.pad * ratio + (self.kernel_size - ratio + 1) // 2
            self._filter = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"filter": jnp.asarray(self._filter, dtype).reshape(1, 1, -1)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.kernel_size
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)), mode=self.pad_mode)
        filt = jnp.flip(_depthwise_filter(params["filter"].astype(x.dtype), c), axis=0)
        y = jax.lax.conv_general_dilated(
            x, filt, window_strides=(1,), padding=((k - 1, k - 1),),
            lhs_dilation=(self.ratio,),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
        )
        return self.ratio * y[:, self.pad_left: y.shape[1] - self.pad_right, :]


class SnakeBeta(Module):
    """Snake activation x + (1/b)·sin²(a·x) with per-channel a, b (`:172`)."""

    def __init__(self, channels: int, alpha: float = 1.0, eps: float = 1e-9,
                 logscale: bool = True, use_beta: bool = True):
        super().__init__()
        self.channels = channels
        self.alpha_init = alpha
        self.eps = eps
        self.logscale = logscale
        self.use_beta = use_beta

    def init(self, key, dtype=jnp.float32) -> Params:
        a = jnp.zeros((self.channels,), dtype) if self.logscale else jnp.full((self.channels,), self.alpha_init, dtype)
        p = {"alpha": a}
        if self.use_beta:
            p["beta"] = jnp.array(a)
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = params["alpha"].astype(x.dtype)
        beta = params["beta"].astype(x.dtype) if self.use_beta else alpha
        if self.logscale:
            alpha, beta = jnp.exp(alpha), jnp.exp(beta)
        return x + (1.0 / (beta + self.eps)) * jnp.square(jnp.sin(x * alpha))


class LeakyReLU(Module):
    def __init__(self, negative_slope: float = 0.01):
        super().__init__()
        self.negative_slope = negative_slope

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return jax.nn.leaky_relu(x, self.negative_slope)


class AntiAliasAct1d(Module):
    """Upsample → activation → downsample to suppress harmonic aliasing (`:140`)."""

    def __init__(self, act: Module, ratio: int = 2, kernel_size: int = 12):
        super().__init__()
        self.upsample = UpSample1d(ratio=ratio, kernel_size=kernel_size)
        self.act = act
        self.downsample = DownSample1d(ratio=ratio, kernel_size=kernel_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.upsample(params["upsample"], x)
        x = self.act(params.get("act", {}), x)
        return self.downsample(params["downsample"], x)


def _make_act(act_fn: str, channels: int, negative_slope: float,
              antialias: bool, ratio: int, kernel_size: int) -> Module:
    if act_fn == "snakebeta":
        act = SnakeBeta(channels, use_beta=True)
    elif act_fn == "snake":
        act = SnakeBeta(channels, use_beta=False)
    else:
        act = LeakyReLU(negative_slope)
    if antialias:
        act = AntiAliasAct1d(act, ratio=ratio, kernel_size=kernel_size)
    return act


class ResBlock(Module):
    """HiFiGAN multi-dilation residual stack (`:214`); "same"-padded convs."""

    def __init__(self, channels: int, kernel_size: int = 3, dilations=(1, 3, 5),
                 act_fn: str = "leaky_relu", leaky_relu_negative_slope: float = 0.1,
                 antialias: bool = False, antialias_ratio: int = 2,
                 antialias_kernel_size: int = 12):
        super().__init__()
        self.convs1 = ModuleList([
            Conv1d(channels, channels, kernel_size, dilation=d, padding=d * (kernel_size - 1) // 2)
            for d in dilations
        ])
        self.convs2 = ModuleList([
            Conv1d(channels, channels, kernel_size, padding=(kernel_size - 1) // 2)
            for _ in dilations
        ])
        mk = lambda: _make_act(act_fn, channels, leaky_relu_negative_slope,
                               antialias, antialias_ratio, antialias_kernel_size)
        self.acts1 = ModuleList([mk() for _ in dilations])
        self.acts2 = ModuleList([mk() for _ in dilations])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.convs1)):
            xt = self.acts1[i](params.get("acts1", {}).get(i, {}), x)
            xt = self.convs1[i](params["convs1"][i], xt)
            xt = self.acts2[i](params.get("acts2", {}).get(i, {}), xt)
            xt = self.convs2[i](params["convs2"][i], xt)
            x = x + xt
        return x


class LTX2Vocoder(Module, ModelMixin, ConfigMixin):
    """Mel spectrogram → waveform generator (`vocoder.py:279`). Public API
    speaks the reference's [B, C, T, M] / returns [B, out_channels, samples];
    compute is NLC."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        hidden_channels: int = 1024,
        out_channels: int = 2,
        upsample_kernel_sizes: List[int] = [16, 15, 8, 4, 4],
        upsample_factors: List[int] = [6, 5, 2, 2, 2],
        resnet_kernel_sizes: List[int] = [3, 7, 11],
        resnet_dilations: List[List[int]] = [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        act_fn: str = "leaky_relu",
        leaky_relu_negative_slope: float = 0.1,
        antialias: bool = False,
        antialias_ratio: int = 2,
        antialias_kernel_size: int = 12,
        final_act_fn: Optional[str] = "tanh",
        final_bias: bool = True,
        output_sampling_rate: int = 24000,
    ):
        super().__init__()
        if act_fn not in ("snakebeta", "snake", "leaky_relu"):
            raise ValueError(f"Unsupported activation function: {act_fn}")
        self.num_upsample_layers = len(upsample_kernel_sizes)
        self.resnets_per_upsample = len(resnet_kernel_sizes)
        self.act_fn = act_fn
        self.negative_slope = leaky_relu_negative_slope
        self.final_act_fn = final_act_fn
        self.total_upsample_factor = math.prod(upsample_factors)

        self.conv_in = Conv1d(in_channels, hidden_channels, 7, padding=3)
        ups, resnets = [], []
        ch = hidden_channels
        for stride, ksize in zip(upsample_factors, upsample_kernel_sizes):
            out_ch = ch // 2
            ups.append(ConvTranspose1d(ch, out_ch, ksize, stride=stride, padding=(ksize - stride) // 2))
            for k, dils in zip(resnet_kernel_sizes, resnet_dilations):
                resnets.append(ResBlock(
                    out_ch, k, tuple(dils), act_fn=act_fn,
                    leaky_relu_negative_slope=leaky_relu_negative_slope,
                    antialias=antialias, antialias_ratio=antialias_ratio,
                    antialias_kernel_size=antialias_kernel_size,
                ))
            ch = out_ch
        self.upsamplers = ModuleList(ups)
        self.resnets = ModuleList(resnets)
        if act_fn in ("snakebeta", "snake"):
            self.act_out = AntiAliasAct1d(
                SnakeBeta(ch, use_beta=True), ratio=antialias_ratio, kernel_size=antialias_kernel_size
            )
        else:
            self.act_out = LeakyReLU()  # reference uses the 0.01 default here (`:369`)
        self.conv_out = Conv1d(ch, out_channels, 7, padding=3, use_bias=final_bias)

    def __call__(self, params: Params, hidden_states: jax.Array, time_last: bool = False) -> jax.Array:
        # [B, C, T, M] (or [B, C, M, T] when time_last) → NLC [B, T, C*M]
        if not time_last:
            hidden_states = jnp.swapaxes(hidden_states, 2, 3)
        b, c, m, t = hidden_states.shape
        x = hidden_states.reshape(b, c * m, t).transpose(0, 2, 1)

        x = self.conv_in(params["conv_in"], x)
        for i in range(self.num_upsample_layers):
            if self.act_fn == "leaky_relu":
                x = jax.nn.leaky_relu(x, self.negative_slope)
            x = self.upsamplers[i](params["upsamplers"][i], x)
            start = i * self.resnets_per_upsample
            outs = [
                self.resnets[j](params["resnets"][j], x)
                for j in range(start, start + self.resnets_per_upsample)
            ]
            x = sum(outs) / len(outs)
        x = self.act_out(params.get("act_out", {}), x)
        x = self.conv_out(params["conv_out"], x)
        if self.final_act_fn == "tanh":
            x = jnp.tanh(x)
        elif self.final_act_fn == "clamp":
            x = jnp.clip(x, -1, 1)
        return x.transpose(0, 2, 1)  # [B, out_channels, samples]


class CausalSTFT(Module):
    """Causal STFT via strided conv against checkpoint DFT bases (`:421`)."""

    def __init__(self, filter_length: int = 512, hop_length: int = 80, window_length: int = 512):
        super().__init__()
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.window_length = window_length

    def init(self, key, dtype=jnp.float32) -> Params:
        n = (self.filter_length // 2 + 1) * 2
        return {
            "forward_basis": jnp.zeros((n, 1, self.filter_length), dtype),
            "inverse_basis": jnp.zeros((n, 1, self.filter_length), dtype),
        }

    def __call__(self, params: Params, waveform: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # waveform: [B, num_samples] or [B, 1, num_samples]
        if waveform.ndim == 3:
            waveform = waveform[:, 0]
        left_pad = max(0, self.window_length - self.hop_length)
        x = jnp.pad(waveform, ((0, 0), (left_pad, 0)))[..., None]  # [B, L, 1]
        basis = params["forward_basis"].astype(x.dtype)  # [2F, 1, K] → HIO [K, 1, 2F]
        kernel = jnp.transpose(basis, (2, 1, 0))
        spec = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.hop_length,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # [B, frames, 2F]
        nf = spec.shape[-1] // 2
        real, imag = spec[..., :nf], spec[..., nf:]
        magnitude = jnp.sqrt(jnp.square(real) + jnp.square(imag))
        phase = jnp.arctan2(imag.astype(jnp.float32), real.astype(jnp.float32)).astype(real.dtype)
        # [B, F, frames] like the reference
        return magnitude.transpose(0, 2, 1), phase.transpose(0, 2, 1)


class MelSTFT(Module):
    """Causal log-mel spectrogram (`:452`)."""

    def __init__(self, filter_length: int = 512, hop_length: int = 80,
                 window_length: int = 512, num_mel_channels: int = 64):
        super().__init__()
        self.stft_fn = CausalSTFT(filter_length, hop_length, window_length)
        self.filter_length = filter_length
        self.num_mel_channels = num_mel_channels

    def init(self, key, dtype=jnp.float32) -> Params:
        p = {"stft_fn": self.stft_fn.init(key, dtype)}
        p["mel_basis"] = jnp.zeros((self.num_mel_channels, self.filter_length // 2 + 1), dtype)
        return p

    def __call__(self, params: Params, waveform: jax.Array):
        magnitude, phase = self.stft_fn(params["stft_fn"], waveform)
        energy = jnp.linalg.norm(magnitude, axis=1)
        mel = jnp.einsum("mf,bft->bmt", params["mel_basis"].astype(magnitude.dtype), magnitude)
        log_mel = jnp.log(jnp.clip(mel, 1e-5, None))
        return log_mel, magnitude, phase, energy


class LTX2VocoderWithBWE(Module, ModelMixin, ConfigMixin):
    """Vocoder + bandwidth-extension stage (`vocoder.py:479`): stage-1
    waveform → causal mel → BWE generator residual + sinc-resampled skip."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        hidden_channels: int = 1536,
        out_channels: int = 2,
        upsample_kernel_sizes: List[int] = [11, 4, 4, 4, 4, 4],
        upsample_factors: List[int] = [5, 2, 2, 2, 2, 2],
        resnet_kernel_sizes: List[int] = [3, 7, 11],
        resnet_dilations: List[List[int]] = [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        act_fn: str = "snakebeta",
        leaky_relu_negative_slope: float = 0.1,
        antialias: bool = True,
        antialias_ratio: int = 2,
        antialias_kernel_size: int = 12,
        final_act_fn: Optional[str] = None,
        final_bias: bool = False,
        bwe_in_channels: int = 128,
        bwe_hidden_channels: int = 512,
        bwe_out_channels: int = 2,
        bwe_upsample_kernel_sizes: List[int] = [12, 11, 4, 4, 4],
        bwe_upsample_factors: List[int] = [6, 5, 2, 2, 2],
        bwe_resnet_kernel_sizes: List[int] = [3, 7, 11],
        bwe_resnet_dilations: List[List[int]] = [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        bwe_act_fn: str = "snakebeta",
        bwe_leaky_relu_negative_slope: float = 0.1,
        bwe_antialias: bool = True,
        bwe_antialias_ratio: int = 2,
        bwe_antialias_kernel_size: int = 12,
        bwe_final_act_fn: Optional[str] = None,
        bwe_final_bias: bool = False,
        filter_length: int = 512,
        hop_length: int = 80,
        window_length: int = 512,
        num_mel_channels: int = 64,
        input_sampling_rate: int = 16000,
        output_sampling_rate: int = 48000,
    ):
        super().__init__()
        self.vocoder = LTX2Vocoder(
            in_channels=in_channels, hidden_channels=hidden_channels, out_channels=out_channels,
            upsample_kernel_sizes=upsample_kernel_sizes, upsample_factors=upsample_factors,
            resnet_kernel_sizes=resnet_kernel_sizes, resnet_dilations=resnet_dilations,
            act_fn=act_fn, leaky_relu_negative_slope=leaky_relu_negative_slope,
            antialias=antialias, antialias_ratio=antialias_ratio,
            antialias_kernel_size=antialias_kernel_size, final_act_fn=final_act_fn,
            final_bias=final_bias, output_sampling_rate=input_sampling_rate,
        )
        self.bwe_generator = LTX2Vocoder(
            in_channels=bwe_in_channels, hidden_channels=bwe_hidden_channels,
            out_channels=bwe_out_channels, upsample_kernel_sizes=bwe_upsample_kernel_sizes,
            upsample_factors=bwe_upsample_factors, resnet_kernel_sizes=bwe_resnet_kernel_sizes,
            resnet_dilations=bwe_resnet_dilations, act_fn=bwe_act_fn,
            leaky_relu_negative_slope=bwe_leaky_relu_negative_slope, antialias=bwe_antialias,
            antialias_ratio=bwe_antialias_ratio, antialias_kernel_size=bwe_antialias_kernel_size,
            final_act_fn=bwe_final_act_fn, final_bias=bwe_final_bias,
            output_sampling_rate=output_sampling_rate,
        )
        self.mel_stft = MelSTFT(
            filter_length=filter_length, hop_length=hop_length,
            window_length=window_length, num_mel_channels=num_mel_channels,
        )
        # hann resampler is persistent=False in the reference: never stored,
        # always computed — keep it out of the param tree
        self.hop_length = hop_length
        self._resampler = UpSample1d(
            ratio=output_sampling_rate // input_sampling_rate, window_type="hann"
        )
        self._resampler_params = None

    def __call__(self, params: Params, mel_spec: jax.Array) -> jax.Array:
        x = self.vocoder(params["vocoder"], mel_spec)  # [B, C, samples]
        b, c, n = x.shape
        rem = n % self.hop_length
        if rem != 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, self.hop_length - rem)))
        mel, _, _, _ = self.mel_stft(params["mel_stft"], x.reshape(b * c, -1))
        mel = mel.reshape(b, c, mel.shape[1], mel.shape[2])  # [B, C, M, frames]
        residual = self.bwe_generator(params["bwe_generator"], jnp.swapaxes(mel, 2, 3))
        if self._resampler_params is None:
            self._resampler_params = self._resampler.init(jax.random.PRNGKey(0))
        skip = self._resampler(self._resampler_params, x.transpose(0, 2, 1)).transpose(0, 2, 1)
        waveform = jnp.clip(residual + skip, -1, 1)
        out_n = n * self.config.output_sampling_rate // self.config.input_sampling_rate
        return waveform[..., :out_n]

"""AutoencoderOobleck — Stable Audio's waveform VAE.

Behavioral mirror of the reference
`models/autoencoders/autoencoder_oobleck.py` (Snake1d `:30`,
OobleckResidualUnit `:56`, Encoder/Decoder blocks `:93`/`:116`,
OobleckDiagonalGaussianDistribution `:146` (softplus std),
OobleckEncoder/Decoder `:214`/`:254`, AutoencoderOobleck `:294`).

TPU-first notes: activations are NLC internally (channels-last rides the
lane dimension); the public API accepts/returns the reference's [B, C, L]
waveform layout. Weight-normalized convs keep the torch (weight_g,
weight_v) parameterization so checkpoints load unchanged; the normalized
kernel is folded at call time (XLA constant-folds it under jit when params
are donated/frozen).
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
from ..modeling_utils import ModelMixin


class Snake1d(Module):
    """x + sin^2(alpha·x)/beta snake activation (reference Snake1d :30).
    Params stored [C] (torch [1, C, 1]); NLC activations."""

    def __init__(self, hidden_dim: int, logscale: bool = True):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.logscale = logscale

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "alpha": jnp.zeros((self.hidden_dim,), dtype),
            "beta": jnp.zeros((self.hidden_dim,), dtype),
        }

    def convert_torch_param(self, pname, tensor):
        return pname, tensor.reshape(-1)

    def convert_param_to_torch(self, pname, array):
        return pname, array.reshape(1, -1, 1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = params["alpha"].astype(x.dtype)
        beta = params["beta"].astype(x.dtype)
        if self.logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * x))


class WNConv1d(Module):
    """Weight-normalized Conv1d (torch `weight_norm(nn.Conv1d(...))`, dim=0):
    kernel = g · v / ||v|| with the norm over (in, k) per output channel.
    weight_v stored KIO; weight_g stored [O]."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, dilation=1, use_bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        v = jax.random.uniform(
            k1, (self.kernel_size, self.in_channels, self.out_channels), dtype, -bound, bound
        )
        params = {
            "weight_v": v,
            "weight_g": jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))).astype(dtype),
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(k2, (self.out_channels,), dtype, -bound, bound)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight_v":  # OIK -> KIO
            return pname, tensor.transpose(2, 1, 0)
        if pname == "weight_g":  # [O,1,1] -> [O]
            return pname, tensor.reshape(-1)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "weight_v":
            return pname, array.transpose(2, 1, 0)
        if pname == "weight_g":
            return pname, array.reshape(-1, 1, 1)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        v = params["weight_v"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 1), keepdims=True))
        kernel = (params["weight_g"][None, None, :] * v / norm).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class WNConvTranspose1d(Module):
    """Weight-normalized ConvTranspose1d (torch weight [I, O, K], weight_norm
    dim=0 → per-input-channel norm over (out, k)). Stored KIO (I = transpose
    input channels); realized as an lhs-dilated correlation with the kernel
    flipped along K."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, use_bias=True,
                 output_padding=0):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        v = jax.random.uniform(
            k1, (self.kernel_size, self.in_channels, self.out_channels), dtype, -bound, bound
        )
        params = {
            "weight_v": v,
            "weight_g": jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))).astype(dtype),
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(k2, (self.out_channels,), dtype, -bound, bound)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight_v":  # IOK -> KIO
            return pname, tensor.transpose(2, 0, 1)
        if pname == "weight_g":  # [I,1,1] -> [I]
            return pname, tensor.reshape(-1)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "weight_v":
            return pname, array.transpose(1, 2, 0)
        if pname == "weight_g":
            return pname, array.reshape(-1, 1, 1)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        v = params["weight_v"]  # [K, I, O]
        norm = jnp.sqrt(jnp.sum(jnp.square(v.astype(jnp.float32)), axis=(0, 2), keepdims=True))
        kernel = (params["weight_g"][None, :, None] * v / norm).astype(x.dtype)
        pad = self.kernel_size - 1 - self.padding
        # torch output_padding adds rows at the END of the output:
        # L_out = (L-1)*stride - 2*padding + kernel + output_padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=((pad, pad + self.output_padding),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class OobleckResidualUnit(Module):
    """snake→dilated 7-conv→snake→1-conv with residual (reference :56)."""

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


class OobleckEncoderBlock(Module):
    def __init__(self, input_dim, output_dim, stride: int = 1):
        super().__init__()
        self.res_unit1 = OobleckResidualUnit(input_dim, dilation=1)
        self.res_unit2 = OobleckResidualUnit(input_dim, dilation=3)
        self.res_unit3 = OobleckResidualUnit(input_dim, dilation=9)
        self.snake1 = Snake1d(input_dim)
        self.conv1 = WNConv1d(
            input_dim, output_dim, kernel_size=2 * stride, stride=stride, padding=math.ceil(stride / 2)
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.res_unit1(params["res_unit1"], x)
        x = self.res_unit2(params["res_unit2"], x)
        x = self.snake1(params["snake1"], self.res_unit3(params["res_unit3"], x))
        return self.conv1(params["conv1"], x)


class OobleckDecoderBlock(Module):
    def __init__(self, input_dim, output_dim, stride: int = 1):
        super().__init__()
        self.snake1 = Snake1d(input_dim)
        self.conv_t1 = WNConvTranspose1d(
            input_dim, output_dim, kernel_size=2 * stride, stride=stride, padding=math.ceil(stride / 2)
        )
        self.res_unit1 = OobleckResidualUnit(output_dim, dilation=1)
        self.res_unit2 = OobleckResidualUnit(output_dim, dilation=3)
        self.res_unit3 = OobleckResidualUnit(output_dim, dilation=9)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.snake1(params["snake1"], x)
        x = self.conv_t1(params["conv_t1"], x)
        x = self.res_unit1(params["res_unit1"], x)
        x = self.res_unit2(params["res_unit2"], x)
        return self.res_unit3(params["res_unit3"], x)


class OobleckDiagonalGaussianDistribution:
    """Mean/softplus-std posterior over NCL moments (reference :146)."""

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        self.mean, self.scale = jnp.split(parameters, 2, axis=1)
        self.std = jax.nn.softplus(self.scale) + 1e-4
        self.var = self.std * self.std
        self.logvar = jnp.log(self.var)
        self.deterministic = deterministic

    def sample(self, key: jax.Array) -> jax.Array:
        noise = randn_tensor(self.mean.shape, key=key, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["OobleckDiagonalGaussianDistribution"] = None) -> jax.Array:
        if self.deterministic:
            return jnp.array([0.0])
        if other is None:
            return jnp.mean(jnp.sum(self.mean * self.mean + self.var - self.logvar - 1.0, axis=1))
        return jnp.mean(
            jnp.sum(
                jnp.square(self.mean - other.mean) / other.var
                + self.var / other.var
                + self.logvar
                - other.logvar
                - 1,
                axis=1,
            )
        )


@dataclass
class AutoencoderOobleckOutput(BaseOutput):
    latent_dist: "OobleckDiagonalGaussianDistribution"


@dataclass
class OobleckDecoderOutput(BaseOutput):
    sample: jax.Array


class OobleckEncoder(Module):
    def __init__(self, encoder_hidden_size, audio_channels, downsampling_ratios, channel_multiples):
        super().__init__()
        strides = downsampling_ratios
        channel_multiples = [1] + list(channel_multiples)
        self.conv1 = WNConv1d(audio_channels, encoder_hidden_size, kernel_size=7, padding=3)
        self.block = ModuleList(
            [
                OobleckEncoderBlock(
                    input_dim=encoder_hidden_size * channel_multiples[i],
                    output_dim=encoder_hidden_size * channel_multiples[i + 1],
                    stride=stride,
                )
                for i, stride in enumerate(strides)
            ]
        )
        d_model = encoder_hidden_size * channel_multiples[-1]
        self.snake1 = Snake1d(d_model)
        self.conv2 = WNConv1d(d_model, encoder_hidden_size, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv1(params["conv1"], x)
        for i, block in enumerate(self.block):
            x = block(params["block"][i], x)
        x = self.snake1(params["snake1"], x)
        return self.conv2(params["conv2"], x)


class OobleckDecoder(Module):
    def __init__(self, channels, input_channels, audio_channels, upsampling_ratios, channel_multiples):
        super().__init__()
        strides = upsampling_ratios
        channel_multiples = [1] + list(channel_multiples)
        self.conv1 = WNConv1d(input_channels, channels * channel_multiples[-1], kernel_size=7, padding=3)
        self.block = ModuleList(
            [
                OobleckDecoderBlock(
                    input_dim=channels * channel_multiples[len(strides) - i],
                    output_dim=channels * channel_multiples[len(strides) - i - 1],
                    stride=stride,
                )
                for i, stride in enumerate(strides)
            ]
        )
        self.snake1 = Snake1d(channels)
        self.conv2 = WNConv1d(channels, audio_channels, kernel_size=7, padding=3, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv1(params["conv1"], x)
        for i, block in enumerate(self.block):
            x = block(params["block"][i], x)
        x = self.snake1(params["snake1"], x)
        return self.conv2(params["conv2"], x)


class AutoencoderOobleck(Module, ModelMixin, ConfigMixin):
    """Waveform VAE (reference AutoencoderOobleck :294). Public API is NCL
    ([B, audio_channels, samples]); NLC inside."""

    @register_to_config
    def __init__(
        self,
        encoder_hidden_size: int = 128,
        downsampling_ratios: List[int] = [2, 4, 4, 8, 8],
        channel_multiples: List[int] = [1, 2, 4, 8, 16],
        decoder_channels: int = 128,
        decoder_input_channels: int = 64,
        audio_channels: int = 2,
        sampling_rate: int = 44100,
    ):
        super().__init__()
        self.encoder_hidden_size = encoder_hidden_size
        self.downsampling_ratios = list(downsampling_ratios)
        self.decoder_channels = decoder_channels
        self.upsampling_ratios = list(downsampling_ratios)[::-1]
        self.hop_length = int(math.prod(downsampling_ratios))
        self.sampling_rate = sampling_rate

        self.encoder = OobleckEncoder(
            encoder_hidden_size=encoder_hidden_size,
            audio_channels=audio_channels,
            downsampling_ratios=downsampling_ratios,
            channel_multiples=channel_multiples,
        )
        self.decoder = OobleckDecoder(
            channels=decoder_channels,
            input_channels=decoder_input_channels,
            audio_channels=audio_channels,
            upsampling_ratios=self.upsampling_ratios,
            channel_multiples=channel_multiples,
        )

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = self.encoder(params["encoder"], jnp.transpose(x, (0, 2, 1)))
        h = jnp.transpose(h, (0, 2, 1))
        posterior = OobleckDiagonalGaussianDistribution(h)
        if not return_dict:
            return (posterior,)
        return AutoencoderOobleckOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        dec = self.decoder(params["decoder"], jnp.transpose(z, (0, 2, 1)))
        dec = jnp.transpose(dec, (0, 2, 1))
        if not return_dict:
            return (dec,)
        return OobleckDecoderOutput(sample=dec)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,
        sample_posterior: bool = False,
        return_dict: bool = True,
        key: Optional[jax.Array] = None,
    ):
        posterior = self.encode(params, sample).latent_dist
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        dec = self.decode(params, z).sample
        if not return_dict:
            return (dec,)
        return OobleckDecoderOutput(sample=dec)

"""PaellaVQModel — the Wuerstchen / Stable Cascade stage-A VQGAN.

Behavioral mirror of the reference
`pipelines/deprecated/wuerstchen/modeling_paella_vq_model.py`:
MixingResidualBlock (`:27` — 6 learned gammas modulating LN/depthwise/
channelwise mixing, replication-padded depthwise conv), pixel-unshuffle
in_block, strided-conv downs, BatchNorm-normalized latents (`:105`),
ConvTranspose ups, pixel-shuffle out (`:126`). NHWC internally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, ConvTranspose2d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from ..unets.unet_stable_cascade import _pixel_shuffle, _pixel_unshuffle


@dataclass
class VQEncoderOutput(BaseOutput):
    latents: jax.Array


@dataclass
class DecoderOutput(BaseOutput):
    sample: jax.Array


class _BatchNorm2d(Module):
    """Eval-mode BatchNorm over the channel (last) axis using running stats."""

    def __init__(self, num_features: int, eps: float = 1e-5):
        super().__init__()
        self.num_features = num_features
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "weight": jnp.ones((self.num_features,), dtype),
            "bias": jnp.zeros((self.num_features,), dtype),
            "running_mean": jnp.zeros((self.num_features,), dtype),
            "running_var": jnp.ones((self.num_features,), dtype),
        }

    def convert_torch_param(self, pname, tensor):
        if pname == "num_batches_tracked":
            return pname, tensor.reshape(-1)
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mean = params["running_mean"].astype(x.dtype)
        var = params["running_var"].astype(x.dtype)
        out = (x - mean) / jnp.sqrt(var + self.eps)
        return out * params["weight"].astype(x.dtype) + params["bias"].astype(x.dtype)


class MixingResidualBlock(Module):
    def __init__(self, inp_channels: int, embed_dim: int):
        super().__init__()
        self.norm1 = LayerNorm(inp_channels, eps=1e-6, use_scale=False, use_bias=False)
        # depthwise Sequential: [ReplicationPad2d, Conv2d] — torch key `depthwise.1`
        conv = Conv2d(inp_channels, inp_channels, kernel_size=3, padding=0, groups=inp_channels)
        self.depthwise = ModuleList([_PadModule(), conv])
        self.norm2 = LayerNorm(inp_channels, eps=1e-6, use_scale=False, use_bias=False)
        self.channelwise = ModuleList([
            Linear(inp_channels, embed_dim), _PadModule(), Linear(embed_dim, inp_channels)
        ])
        self.inp_channels = inp_channels

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["gammas"] = jnp.zeros((6,), dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mods = params["gammas"].astype(x.dtype)
        x_temp = self.norm1({}, x) * (1 + mods[0]) + mods[1]
        x_pad = jnp.pad(x_temp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        x = x + self.depthwise[1](params["depthwise"][1], x_pad) * mods[2]
        x_temp = self.norm2({}, x) * (1 + mods[3]) + mods[4]
        h = self.channelwise[0](params["channelwise"][0], x_temp)
        h = jax.nn.gelu(h, approximate=False)
        h = self.channelwise[2](params["channelwise"][2], h)
        return x + h * mods[5]


class _PadModule(Module):
    """Param-free placeholder to keep Sequential indices aligned."""

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x):
        return x


class _InBlock(Module):
    """Sequential(PixelUnshuffle, Conv 1x1) — torch key `in_block.1`."""

    def __init__(self, factor, c_in, c_out):
        super().__init__()
        self.factor = factor
        conv = Conv2d(c_in * factor**2, c_out, kernel_size=1)
        self._children["1"] = conv
        self._conv = conv

    def __call__(self, params, x):
        return self._conv(params["1"], _pixel_unshuffle(x, self.factor))


class _OutBlock(Module):
    """Sequential(Conv 1x1, PixelShuffle) — torch key `out_block.0`."""

    def __init__(self, c_in, c_out, factor):
        super().__init__()
        self.factor = factor
        conv = Conv2d(c_in, c_out * factor**2, kernel_size=1)
        self._children["0"] = conv
        self._conv = conv

    def __call__(self, params, x):
        return _pixel_shuffle(self._conv(params["0"], x), self.factor)


class _LatentNorm(Module):
    """Sequential(Conv 1x1 no-bias, BatchNorm2d) — torch keys `.0` / `.1`."""

    def __init__(self, c_in, latent_channels):
        super().__init__()
        conv = Conv2d(c_in, latent_channels, kernel_size=1, use_bias=False)
        bn = _BatchNorm2d(latent_channels)
        self._children["0"] = conv
        self._children["1"] = bn
        self._conv, self._bn = conv, bn

    def __call__(self, params, x):
        return self._bn(params["1"], self._conv(params["0"], x))


class PaellaVQModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        up_down_scale_factor: int = 2,
        levels: int = 2,
        bottleneck_blocks: int = 12,
        embed_dim: int = 384,
        latent_channels: int = 4,
        num_vq_embeddings: int = 8192,
        scale_factor: float = 0.3764,
    ):
        super().__init__()
        c_levels = [embed_dim // (2**i) for i in reversed(range(levels))]
        self.in_block = _InBlock(up_down_scale_factor, in_channels, c_levels[0])

        down = []
        for i in range(levels):
            if i > 0:
                down.append(Conv2d(c_levels[i - 1], c_levels[i], kernel_size=4, stride=2, padding=1))
            down.append(MixingResidualBlock(c_levels[i], c_levels[i] * 4))
        down.append(_LatentNorm(c_levels[-1], latent_channels))
        self.down_blocks = ModuleList(down)

        from .vq_model import VectorQuantizer

        self.vquantizer = VectorQuantizer(num_vq_embeddings, vq_embed_dim=latent_channels, beta=0.25)

        up = [_SingleConvSeq(latent_channels, c_levels[-1])]
        for i in range(levels):
            for _ in range(bottleneck_blocks if i == 0 else 1):
                up.append(MixingResidualBlock(c_levels[levels - 1 - i], c_levels[levels - 1 - i] * 4))
            if i < levels - 1:
                up.append(ConvTranspose2d(c_levels[levels - 1 - i], c_levels[levels - 2 - i],
                                          kernel_size=4, stride=2, padding=1))
        self.up_blocks = ModuleList(up)
        self.out_block = _OutBlock(c_levels[0], out_channels, up_down_scale_factor)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = self.in_block(params["in_block"], jnp.transpose(x, (0, 2, 3, 1)))
        for i, block in enumerate(self.down_blocks):
            h = block(params["down_blocks"][i], h)
        h = jnp.transpose(h, (0, 3, 1, 2))
        if not return_dict:
            return (h,)
        return VQEncoderOutput(latents=h)

    def decode(self, params: Params, h: jax.Array, force_not_quantize: bool = True,
               return_dict: bool = True):
        if not force_not_quantize:
            quant, _, _ = self.vquantizer(params["vquantizer"], h)
        else:
            quant = h
        x = jnp.transpose(quant, (0, 2, 3, 1))
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        x = self.out_block(params["out_block"], x)
        dec = jnp.transpose(x, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params: Params, sample: jax.Array, return_dict: bool = True):
        h = self.encode(params, sample).latents
        dec = self.decode(params, h).sample
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)


class _SingleConvSeq(Module):
    """Sequential(Conv 1x1) — torch key `.0`."""

    def __init__(self, c_in, c_out):
        super().__init__()
        conv = Conv2d(c_in, c_out, kernel_size=1)
        self._children["0"] = conv
        self._conv = conv

    def __call__(self, params, x):
        return self._conv(params["0"], x)

"""AutoencoderTiny (TAESD) — the tiny distilled VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_tiny.py:40`;
EncoderTiny/DecoderTiny in `vae.py:754,820`, AutoencoderTinyBlock in
`unet_2d_blocks.py`). NHWC internals; parameter keys replicate the torch
nn.Sequential layer indices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput


@dataclass
class AutoencoderTinyOutput(BaseOutput):
    latents: jax.Array


class _Act(Module):
    def __init__(self, name):
        super().__init__()
        self.fn = get_activation(name)

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params, x):
        return self.fn(x)


class _Upsample(Module):
    def __init__(self, factor):
        super().__init__()
        self.factor = factor

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params, x):
        return jnp.repeat(jnp.repeat(x, self.factor, axis=1), self.factor, axis=2)


class AutoencoderTinyBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, act_fn: str):
        super().__init__()
        act = get_activation(act_fn)
        self.conv = ModuleList(
            [
                Conv2d(in_channels, out_channels, kernel_size=3, padding=1),
                _Act(act_fn),
                Conv2d(out_channels, out_channels, kernel_size=3, padding=1),
                _Act(act_fn),
                Conv2d(out_channels, out_channels, kernel_size=3, padding=1),
            ]
        )
        self.use_skip = in_channels != out_channels
        if self.use_skip:
            self.skip = Conv2d(in_channels, out_channels, kernel_size=1, padding=0, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = x
        for i, layer in enumerate(self.conv):
            h = layer(params["conv"].get(i, {}), h)
        s = self.skip(params["skip"], x) if self.use_skip else x
        return jax.nn.relu(h + s)


class EncoderTiny(Module):
    def __init__(self, in_channels, out_channels, num_blocks, block_out_channels, act_fn):
        super().__init__()
        layers = []
        for i, num_block in enumerate(num_blocks):
            num_channels = block_out_channels[i]
            if i == 0:
                layers.append(Conv2d(in_channels, num_channels, kernel_size=3, padding=1))
            else:
                layers.append(Conv2d(num_channels, num_channels, kernel_size=3, padding=1, stride=2, use_bias=False))
            for _ in range(num_block):
                layers.append(AutoencoderTinyBlock(num_channels, num_channels, act_fn))
        layers.append(Conv2d(block_out_channels[-1], out_channels, kernel_size=3, padding=1))
        self.layers = ModuleList(layers)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = (x + 1) / 2  # [-1,1] → [0,1] (reference EncoderTiny.forward)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"].get(i, {}), x)
        return x


class DecoderTiny(Module):
    def __init__(self, in_channels, out_channels, num_blocks, block_out_channels,
                 upsampling_scaling_factor, act_fn, upsample_fn):
        super().__init__()
        layers = [Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1), _Act(act_fn)]
        for i, num_block in enumerate(num_blocks):
            is_final = i == len(num_blocks) - 1
            num_channels = block_out_channels[i]
            for _ in range(num_block):
                layers.append(AutoencoderTinyBlock(num_channels, num_channels, act_fn))
            if not is_final:
                layers.append(_Upsample(upsampling_scaling_factor))
            conv_out = num_channels if not is_final else out_channels
            layers.append(Conv2d(num_channels, conv_out, kernel_size=3, padding=1, use_bias=is_final))
        self.layers = ModuleList(layers)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.tanh(x / 3) * 3
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"].get(i, {}), x)
        return x * 2 - 1


class AutoencoderTiny(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        encoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64),
        decoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64),
        act_fn: str = "relu",
        upsample_fn: str = "nearest",
        latent_channels: int = 4,
        upsampling_scaling_factor: int = 2,
        num_encoder_blocks: Tuple[int, ...] = (1, 3, 3, 3),
        num_decoder_blocks: Tuple[int, ...] = (3, 3, 3, 1),
        latent_magnitude: int = 3,
        latent_shift: float = 0.5,
        force_upcast: bool = False,
        scaling_factor: float = 1.0,
        shift_factor: float = 0.0,
    ):
        super().__init__()
        self.encoder = EncoderTiny(in_channels, latent_channels, num_encoder_blocks, encoder_block_out_channels, act_fn)
        self.decoder = DecoderTiny(
            latent_channels, out_channels, num_decoder_blocks, decoder_block_out_channels,
            upsampling_scaling_factor, act_fn, upsample_fn,
        )

    def scale_latents(self, x):
        """raw latents → [0, 1]."""
        m, s = self.config.latent_magnitude, self.config.latent_shift
        return jnp.clip(x / (2 * m) + s, 0, 1)

    def unscale_latents(self, x):
        m, s = self.config.latent_magnitude, self.config.latent_shift
        return (x - s) * (2 * m)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = jnp.transpose(x, (0, 2, 3, 1))
        latents = self.encoder(params["encoder"], h)
        latents = jnp.transpose(latents, (0, 3, 1, 2))
        if not return_dict:
            return (latents,)
        return AutoencoderTinyOutput(latents=latents)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 1))
        out = self.decoder(params["decoder"], h)
        out = jnp.transpose(out, (0, 3, 1, 2))
        if not return_dict:
            return (out,)
        return DecoderOutput(sample=out)

"""AutoencoderKLTemporalDecoder — the Stable Video Diffusion VAE.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_temporal_decoder.py`
(TemporalDecoder `:29`, AutoencoderKLTemporalDecoder `:137`) and the decoder
blocks in `unets/unet_3d_blocks.py` (MidBlockTemporalDecoder `:891`,
UpBlockTemporalDecoder `:954`).

Standard KL encoder; the decoder interleaves spatio-temporal resnets (merge
strategy "learned" with spatial/temporal mix switched) and finishes with a
(3,1,1) temporal conv over frames. NHWC internals; NCHW public API; frames
flattened into batch with static ``num_frames``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, GroupNorm, Module, ModuleList, Params, get_activation
from ..attention import Attention
from ..modeling_utils import ModelMixin
from ..resnet import SpatioTemporalResBlock, Upsample2D
from ..unets.unet_2d_blocks import _attend_spatial
from .vae import DecoderOutput, DiagonalGaussianDistribution, Encoder


class MidBlockTemporalDecoder(Module):
    def __init__(self, in_channels: int, out_channels: int, attention_head_dim: int = 512,
                 num_layers: int = 1):
        super().__init__()
        self.resnets = ModuleList(
            [
                SpatioTemporalResBlock(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=1e-6,
                    temporal_eps=1e-5,
                    merge_factor=0.0,
                    merge_strategy="learned",
                    switch_spatial_to_temporal_mix=True,
                )
                for i in range(num_layers)
            ]
        )
        self.attentions = ModuleList(
            [
                Attention(
                    query_dim=in_channels,
                    heads=in_channels // attention_head_dim,
                    dim_head=attention_head_dim,
                    eps=1e-6,
                    norm_num_groups=32,
                    bias=True,
                    residual_connection=True,
                )
            ]
        )

    def __call__(self, params: Params, hidden_states, image_only_indicator):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states,
                                        image_only_indicator=image_only_indicator)
        for i in range(len(self.resnets) - 1):
            hidden_states = _attend_spatial(self.attentions[i], params["attentions"][i], hidden_states)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states,
                                                image_only_indicator=image_only_indicator)
        return hidden_states


class UpBlockTemporalDecoder(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 add_upsample: bool = True):
        super().__init__()
        self.resnets = ModuleList(
            [
                SpatioTemporalResBlock(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=1e-6,
                    temporal_eps=1e-5,
                    merge_factor=0.0,
                    merge_strategy="learned",
                    switch_spatial_to_temporal_mix=True,
                )
                for i in range(num_layers)
            ]
        )
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, image_only_indicator):
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states,
                                   image_only_indicator=image_only_indicator)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class TemporalDecoder(Module):
    def __init__(self, in_channels: int = 4, out_channels: int = 3,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
                 layers_per_block: int = 2):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)
        self.mid_block = MidBlockTemporalDecoder(
            num_layers=layers_per_block,
            in_channels=block_out_channels[-1],
            out_channels=block_out_channels[-1],
            attention_head_dim=block_out_channels[-1],
        )
        up_blocks = []
        rev = list(reversed(block_out_channels))
        output_channel = rev[0]
        for i in range(len(block_out_channels)):
            prev_output_channel = output_channel
            output_channel = rev[i]
            up_blocks.append(
                UpBlockTemporalDecoder(
                    num_layers=layers_per_block + 1,
                    in_channels=prev_output_channel,
                    out_channels=output_channel,
                    add_upsample=i != len(block_out_channels) - 1,
                )
            )
        self.up_blocks = ModuleList(up_blocks)
        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=32, eps=1e-6)
        self.conv_act = get_activation("silu")
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)
        self.time_conv_out = Conv3d(out_channels, out_channels, kernel_size=(3, 1, 1), padding=(1, 0, 0))

    def __call__(self, params: Params, sample: jax.Array, image_only_indicator: jax.Array,
                 num_frames: int = 1) -> jax.Array:
        # sample: [B*F, h, w, C] NHWC
        sample = self.conv_in(params["conv_in"], sample)
        sample = self.mid_block(params["mid_block"], sample, image_only_indicator)
        for i, block in enumerate(self.up_blocks):
            sample = block(params["up_blocks"][i], sample, image_only_indicator)
        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(params["conv_out"], sample)

        bf, height, width, channels = sample.shape
        batch = bf // num_frames
        sample = sample.reshape(batch, num_frames, height, width, channels)
        sample = self.time_conv_out(params["time_conv_out"], sample)
        return sample.reshape(bf, height, width, channels)


class AutoencoderKLTemporalDecoder(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",),
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 1,
        latent_channels: int = 4,
        sample_size: int = 32,
        scaling_factor: float = 0.18215,
        force_upcast: bool = True,
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            down_block_types=down_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            double_z=True,
        )
        self.decoder = TemporalDecoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
        )
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, H, W] → DiagonalGaussianDistribution (NCHW moments)."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        posterior = DiagonalGaussianDistribution(jnp.transpose(h, (0, 3, 1, 2)))
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, num_frames: int, return_dict: bool = True):
        """z: [B*F, latent_C, h, w] → frames [B*F, C, H, W]."""
        batch_size = z.shape[0] // num_frames
        image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=z.dtype)
        h = jnp.transpose(z, (0, 2, 3, 1))
        dec = self.decoder(params["decoder"], h, image_only_indicator, num_frames=num_frames)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

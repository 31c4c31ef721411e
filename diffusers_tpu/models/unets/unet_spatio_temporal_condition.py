"""UNetSpatioTemporalConditionModel — the Stable Video Diffusion UNet.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/unets/unet_spatio_temporal_condition.py:33`
(forward `:292`) and the SpatioTemporal blocks in
`/root/reference/src/diffusers/models/unets/unet_3d_blocks.py`
(UNetMidBlockSpatioTemporal `:1004`, DownBlockSpatioTemporal `:1093`,
CrossAttnDownBlockSpatioTemporal `:1158`, UpBlockSpatioTemporal `:1259`,
CrossAttnUpBlockSpatioTemporal `:1324`).

TPU design: NHWC activations flattened to ``[B*F, H, W, C]``; temporal resnets
view them as NDHWC ``[B, F, H, W, C]`` (frames = conv depth axis). The whole
video forward is a single XLA program with static ``num_frames``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..resnet import Downsample2D, SpatioTemporalResBlock, Upsample2D
from ..transformers.transformer_temporal import TransformerSpatioTemporalModel


@dataclass
class UNetSpatioTemporalConditionOutput(BaseOutput):
    sample: jax.Array


def _per_block(value, n):
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value] * n


class DownBlockSpatioTemporal(Module):
    has_cross_attention = False

    def __init__(self, in_channels: int, out_channels: int, temb_channels: int,
                 num_layers: int = 1, add_downsample: bool = True):
        super().__init__()
        self.resnets = ModuleList(
            [
                SpatioTemporalResBlock(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=1e-5,
                )
                for i in range(num_layers)
            ]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList([Downsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, temb=None, image_only_indicator=None):
        output_states = ()
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb, image_only_indicator)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, out_channels: int, temb_channels: int,
                 num_layers: int = 1, transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
                 num_attention_heads: int = 1, cross_attention_dim: int = 1280,
                 add_downsample: bool = True):
        super().__init__()
        tl = _per_block(transformer_layers_per_block, num_layers)
        self.resnets = ModuleList(
            [
                SpatioTemporalResBlock(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=1e-6,
                )
                for i in range(num_layers)
            ]
        )
        self.attentions = ModuleList(
            [
                TransformerSpatioTemporalModel(
                    num_attention_heads,
                    out_channels // num_attention_heads,
                    in_channels=out_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                )
                for i in range(num_layers)
            ]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=1)]
            )

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 image_only_indicator=None):
        output_states = ()
        for i in range(len(self.resnets)):
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb, image_only_indicator)
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                image_only_indicator=image_only_indicator,
            )
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UpBlockSpatioTemporal(Module):
    has_cross_attention = False

    def __init__(self, in_channels: int, prev_output_channel: int, out_channels: int,
                 temb_channels: int, num_layers: int = 1, resnet_eps: float = 1e-6,
                 add_upsample: bool = True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                SpatioTemporalResBlock(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                )
            )
        self.resnets = ModuleList(resnets)
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None,
                 image_only_indicator=None):
        for i, resnet in enumerate(self.resnets):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb, image_only_indicator)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, out_channels: int, prev_output_channel: int,
                 temb_channels: int, num_layers: int = 1, resnet_eps: float = 1e-6,
                 transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
                 num_attention_heads: int = 1, cross_attention_dim: int = 1280,
                 add_upsample: bool = True):
        super().__init__()
        tl = _per_block(transformer_layers_per_block, num_layers)
        resnets = []
        attentions = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                SpatioTemporalResBlock(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                )
            )
            attentions.append(
                TransformerSpatioTemporalModel(
                    num_attention_heads,
                    out_channels // num_attention_heads,
                    in_channels=out_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                )
            )
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None,
                 encoder_hidden_states=None, image_only_indicator=None):
        for i in range(len(self.resnets)):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb, image_only_indicator)
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                image_only_indicator=image_only_indicator,
            )
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class UNetMidBlockSpatioTemporal(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, temb_channels: int, num_layers: int = 1,
                 transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
                 num_attention_heads: int = 1, cross_attention_dim: int = 1280):
        super().__init__()
        tl = _per_block(transformer_layers_per_block, num_layers)
        resnets = [
            SpatioTemporalResBlock(
                in_channels=in_channels, out_channels=in_channels, temb_channels=temb_channels, eps=1e-5
            )
        ]
        attentions = []
        for i in range(num_layers):
            attentions.append(
                TransformerSpatioTemporalModel(
                    num_attention_heads,
                    in_channels // num_attention_heads,
                    in_channels=in_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                )
            )
            resnets.append(
                SpatioTemporalResBlock(
                    in_channels=in_channels, out_channels=in_channels, temb_channels=temb_channels, eps=1e-5
                )
            )
        self.attentions = ModuleList(attentions)
        self.resnets = ModuleList(resnets)

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 image_only_indicator=None):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb, image_only_indicator)
        for i in range(len(self.attentions)):
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                image_only_indicator=image_only_indicator,
            )
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb, image_only_indicator)
        return hidden_states


class UNetSpatioTemporalConditionModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 8,
        out_channels: int = 4,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlockSpatioTemporal",
            "CrossAttnDownBlockSpatioTemporal",
            "CrossAttnDownBlockSpatioTemporal",
            "DownBlockSpatioTemporal",
        ),
        up_block_types: Tuple[str, ...] = (
            "UpBlockSpatioTemporal",
            "CrossAttnUpBlockSpatioTemporal",
            "CrossAttnUpBlockSpatioTemporal",
            "CrossAttnUpBlockSpatioTemporal",
        ),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        addition_time_embed_dim: int = 256,
        projection_class_embeddings_input_dim: int = 768,
        layers_per_block: Union[int, Tuple[int, ...]] = 2,
        cross_attention_dim: Union[int, Tuple[int, ...]] = 1024,
        transformer_layers_per_block: Union[int, Tuple] = 1,
        num_attention_heads: Union[int, Tuple[int, ...]] = (5, 10, 20, 20),
        num_frames: int = 25,
    ):
        super().__init__()
        n = len(down_block_types)
        heads = _per_block(num_attention_heads, n)
        xdims = _per_block(cross_attention_dim, n)
        layers = _per_block(layers_per_block, n)
        tlayers = _per_block(transformer_layers_per_block, n)

        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)

        time_embed_dim = block_out_channels[0] * 4
        self.time_proj = Timesteps(block_out_channels[0], True, 0)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim)
        self.add_time_proj = Timesteps(addition_time_embed_dim, True, 0)
        self.add_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)

        down_blocks = []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                down_blocks.append(
                    CrossAttnDownBlockSpatioTemporal(
                        in_channels=input_channel,
                        out_channels=output_channel,
                        temb_channels=time_embed_dim,
                        num_layers=layers[i],
                        transformer_layers_per_block=tlayers[i],
                        num_attention_heads=heads[i],
                        cross_attention_dim=xdims[i],
                        add_downsample=not is_final,
                    )
                )
            elif block_type == "DownBlockSpatioTemporal":
                down_blocks.append(
                    DownBlockSpatioTemporal(
                        in_channels=input_channel,
                        out_channels=output_channel,
                        temb_channels=time_embed_dim,
                        num_layers=layers[i],
                        add_downsample=not is_final,
                    )
                )
            else:
                raise ValueError(f"unsupported down_block_type {block_type}")
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = UNetMidBlockSpatioTemporal(
            block_out_channels[-1],
            temb_channels=time_embed_dim,
            transformer_layers_per_block=tlayers[-1],
            cross_attention_dim=xdims[-1],
            num_attention_heads=heads[-1],
        )

        up_blocks = []
        rev_channels = list(reversed(block_out_channels))
        rev_heads = list(reversed(heads))
        rev_layers = list(reversed(layers))
        rev_xdims = list(reversed(xdims))
        rev_tlayers = list(reversed(tlayers))
        output_channel = rev_channels[0]
        for i, block_type in enumerate(up_block_types):
            is_final = i == n - 1
            prev_output_channel = output_channel
            output_channel = rev_channels[i]
            input_channel = rev_channels[min(i + 1, n - 1)]
            if block_type == "CrossAttnUpBlockSpatioTemporal":
                up_blocks.append(
                    CrossAttnUpBlockSpatioTemporal(
                        in_channels=input_channel,
                        out_channels=output_channel,
                        prev_output_channel=prev_output_channel,
                        temb_channels=time_embed_dim,
                        num_layers=rev_layers[i] + 1,
                        transformer_layers_per_block=rev_tlayers[i],
                        num_attention_heads=rev_heads[i],
                        cross_attention_dim=rev_xdims[i],
                        add_upsample=not is_final,
                    )
                )
            elif block_type == "UpBlockSpatioTemporal":
                up_blocks.append(
                    UpBlockSpatioTemporal(
                        in_channels=input_channel,
                        out_channels=output_channel,
                        prev_output_channel=prev_output_channel,
                        temb_channels=time_embed_dim,
                        num_layers=rev_layers[i] + 1,
                        add_upsample=not is_final,
                    )
                )
            else:
                raise ValueError(f"unsupported up_block_type {block_type}")
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=32, eps=1e-5)
        self.conv_act = get_activation("silu")
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, F, C, H, W] (reference layout)
        timestep: Union[jax.Array, float, int],
        encoder_hidden_states: jax.Array,  # [B, 1, D]
        added_time_ids: jax.Array,  # [B, 3]
        return_dict: bool = True,
    ):
        batch_size, num_frames = sample.shape[:2]

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (batch_size,))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb)

        time_embeds = self.add_time_proj({}, added_time_ids.reshape(-1))
        time_embeds = time_embeds.reshape(batch_size, -1).astype(emb.dtype)
        emb = emb + self.add_embedding(params["add_embedding"], time_embeds)

        # [B, F, C, H, W] -> [B*F, H, W, C]
        sample = jnp.transpose(sample, (0, 1, 3, 4, 2)).reshape(
            batch_size * num_frames, sample.shape[3], sample.shape[4], sample.shape[2]
        )
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)

        sample = self.conv_in(params["conv_in"], sample)
        image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=sample.dtype)

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if block.has_cross_attention:
                sample, res_samples = block(
                    params["down_blocks"][i], sample, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    image_only_indicator=image_only_indicator,
                )
            else:
                sample, res_samples = block(
                    params["down_blocks"][i], sample, temb=emb, image_only_indicator=image_only_indicator
                )
            down_block_res_samples += res_samples

        sample = self.mid_block(
            params["mid_block"], sample, temb=emb,
            encoder_hidden_states=encoder_hidden_states,
            image_only_indicator=image_only_indicator,
        )

        for i, block in enumerate(self.up_blocks):
            nres = len(block.resnets)
            res_samples = down_block_res_samples[-nres:]
            down_block_res_samples = down_block_res_samples[:-nres]
            if block.has_cross_attention:
                sample = block(
                    params["up_blocks"][i], sample, res_samples, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    image_only_indicator=image_only_indicator,
                )
            else:
                sample = block(
                    params["up_blocks"][i], sample, res_samples, temb=emb,
                    image_only_indicator=image_only_indicator,
                )

        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(params["conv_out"], sample)

        # [B*F, H, W, C] -> [B, F, C, H, W]
        sample = sample.reshape(batch_size, num_frames, sample.shape[1], sample.shape[2], sample.shape[3])
        sample = jnp.transpose(sample, (0, 1, 4, 2, 3))

        if not return_dict:
            return (sample,)
        return UNetSpatioTemporalConditionOutput(sample=sample)

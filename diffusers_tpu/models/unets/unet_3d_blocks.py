"""UNet3D blocks for the text-to-video-synthesis UNet.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/unets/unet_3d_blocks.py:266-700`:
UNetMidBlock3DCrossAttn, CrossAttnDownBlock3D, DownBlock3D,
CrossAttnUpBlock3D, UpBlock3D) and `models/resnet.py:475` TemporalConvLayer.

Layout: blocks run on NHWC activations ``[B*F, H, W, C]`` with a static
``num_frames``; the temporal conv reshapes to NDHWC ``[B, F, H, W, C]`` for
one fused Conv3d over the frame axis, and the temporal attention reuses the
shared per-pixel temporal transformer (frames as the sequence axis — the
MXU-friendly batching used by every video model here).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.module import Conv3d, GroupNorm, Identity, Module, ModuleList, Params
from ...ops.module import get_activation
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ..transformers.transformer_2d import Transformer2DModel
from ..transformers.transformer_temporal import TransformerTemporalModel


class TemporalConvLayer(Module):
    """Four (GroupNorm→SiLU→Conv3d k=(3,1,1)) stages with identity residual
    (reference `resnet.py:475`; zero-init last conv so the block starts as
    identity). Children mirror the torch Sequential indices (`conv1.0` norm,
    `conv1.2` conv; `conv2..4.0` norm, `.3` conv) so checkpoints map 1:1."""

    def __init__(self, in_dim: int, out_dim: Optional[int] = None, norm_num_groups: int = 32):
        super().__init__()
        out_dim = out_dim or in_dim
        self.conv1 = ModuleList([
            GroupNorm(num_groups=norm_num_groups, num_channels=in_dim), Identity(),
            Conv3d(in_dim, out_dim, kernel_size=(3, 1, 1), padding=(1, 0, 0)),
        ])
        for name in ("conv2", "conv3", "conv4"):
            setattr(self, name, ModuleList([
                GroupNorm(num_groups=norm_num_groups, num_channels=out_dim), Identity(), Identity(),
                Conv3d(out_dim, in_dim, kernel_size=(3, 1, 1), padding=(1, 0, 0)),
            ]))
        self.act = get_activation("silu")

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        # zero-init the last conv: block starts as identity (reference `:524`)
        last = params["conv4"][3]
        last["kernel"] = jnp.zeros_like(last["kernel"])
        if "bias" in last:
            last["bias"] = jnp.zeros_like(last["bias"])
        return params

    def __call__(self, params: Params, hidden_states: jax.Array, num_frames: int = 1) -> jax.Array:
        bf, h, w, c = hidden_states.shape
        x = hidden_states.reshape(bf // num_frames, num_frames, h, w, c)  # NDHWC
        identity = x
        y = x
        for i, stage in enumerate(("conv1", "conv2", "conv3", "conv4")):
            stage_mod = getattr(self, stage)
            conv_idx = 2 if i == 0 else 3
            y = stage_mod[0](params[stage][0], y)
            y = self.act(y)
            y = stage_mod[conv_idx](params[stage][conv_idx], y)
        x = identity + y
        return x.reshape(bf, h, w, c)


def _spatial(module, params, x, num_frames, *args, **kwargs):
    """Run a 2D module over [B*F, H, W, C] (frames folded into batch)."""
    return module(params, x, *args, **kwargs)


class CrossAttnDownBlock3D(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, out_channels: int, temb_channels: int,
                 num_layers: int = 1, resnet_eps: float = 1e-6, resnet_groups: int = 32,
                 num_attention_heads: int = 1, cross_attention_dim: int = 1280,
                 downsample_padding: int = 1, add_downsample: bool = True,
                 use_linear_projection: bool = False):
        super().__init__()
        resnets, temp_convs, attentions, temp_attentions = [], [], [], []
        for i in range(num_layers):
            in_c = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=in_c, out_channels=out_channels,
                                         temb_channels=temb_channels, eps=resnet_eps,
                                         groups=resnet_groups))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
            # reference naming quirk: `num_attention_heads` holds the per-head
            # dim; the head count is channels // dim (unet_3d_blocks.py:457)
            attentions.append(Transformer2DModel(
                out_channels // num_attention_heads, num_attention_heads, in_channels=out_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection))
            temp_attentions.append(TransformerTemporalModel(
                out_channels // num_attention_heads, num_attention_heads, in_channels=out_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)
        self.downsamplers = (
            ModuleList([Downsample2D(out_channels, use_conv=True, padding=downsample_padding)])
            if add_downsample else None
        )

    def __call__(self, params: Params, hidden_states, temb, encoder_hidden_states,
                 num_frames: int = 1):
        output_states = ()
        for i in range(len(self.resnets)):
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.temp_convs[i](params["temp_convs"][i], hidden_states, num_frames)
            hidden_states = self.attentions[i](params["attentions"][i], hidden_states,
                                               encoder_hidden_states=encoder_hidden_states)
            hidden_states = self.temp_attentions[i](params["temp_attentions"][i], hidden_states,
                                                    num_frames=num_frames)
            output_states += (hidden_states,)
        if self.downsamplers is not None:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class DownBlock3D(Module):
    has_cross_attention = False

    def __init__(self, in_channels: int, out_channels: int, temb_channels: int,
                 num_layers: int = 1, resnet_eps: float = 1e-6, resnet_groups: int = 32,
                 downsample_padding: int = 1, add_downsample: bool = True):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            in_c = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=in_c, out_channels=out_channels,
                                         temb_channels=temb_channels, eps=resnet_eps,
                                         groups=resnet_groups))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.downsamplers = (
            ModuleList([Downsample2D(out_channels, use_conv=True, padding=downsample_padding)])
            if add_downsample else None
        )

    def __call__(self, params: Params, hidden_states, temb, num_frames: int = 1):
        output_states = ()
        for i in range(len(self.resnets)):
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.temp_convs[i](params["temp_convs"][i], hidden_states, num_frames)
            output_states += (hidden_states,)
        if self.downsamplers is not None:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, temb_channels: int, num_layers: int = 1,
                 resnet_eps: float = 1e-6, resnet_groups: int = 32,
                 num_attention_heads: int = 1, cross_attention_dim: int = 1280,
                 use_linear_projection: bool = False):
        super().__init__()
        resnets = [ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                                 temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups)]
        temp_convs = [TemporalConvLayer(in_channels, in_channels, norm_num_groups=resnet_groups)]
        attentions, temp_attentions = [], []
        for _ in range(num_layers):
            attentions.append(Transformer2DModel(
                in_channels // num_attention_heads, num_attention_heads, in_channels=in_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection))
            temp_attentions.append(TransformerTemporalModel(
                in_channels // num_attention_heads, num_attention_heads, in_channels=in_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups))
            resnets.append(ResnetBlock2D(in_channels=in_channels, out_channels=in_channels,
                                         temb_channels=temb_channels, eps=resnet_eps,
                                         groups=resnet_groups))
            temp_convs.append(TemporalConvLayer(in_channels, in_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)

    def __call__(self, params: Params, hidden_states, temb, encoder_hidden_states,
                 num_frames: int = 1):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        hidden_states = self.temp_convs[0](params["temp_convs"][0], hidden_states, num_frames)
        for i in range(len(self.attentions)):
            hidden_states = self.attentions[i](params["attentions"][i], hidden_states,
                                               encoder_hidden_states=encoder_hidden_states)
            hidden_states = self.temp_attentions[i](params["temp_attentions"][i], hidden_states,
                                                    num_frames=num_frames)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
            hidden_states = self.temp_convs[i + 1](params["temp_convs"][i + 1], hidden_states, num_frames)
        return hidden_states


class CrossAttnUpBlock3D(Module):
    has_cross_attention = True

    def __init__(self, in_channels: int, out_channels: int, prev_output_channel: int,
                 temb_channels: int, num_layers: int = 1, resnet_eps: float = 1e-6,
                 resnet_groups: int = 32, num_attention_heads: int = 1,
                 cross_attention_dim: int = 1280, add_upsample: bool = True,
                 use_linear_projection: bool = False):
        super().__init__()
        resnets, temp_convs, attentions, temp_attentions = [], [], [], []
        for i in range(num_layers):
            res_skip = in_channels if (i == num_layers - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=res_in + res_skip, out_channels=out_channels,
                                         temb_channels=temb_channels, eps=resnet_eps,
                                         groups=resnet_groups))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
            # reference naming quirk: `num_attention_heads` holds the per-head
            # dim; the head count is channels // dim (unet_3d_blocks.py:457)
            attentions.append(Transformer2DModel(
                out_channels // num_attention_heads, num_attention_heads, in_channels=out_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection))
            temp_attentions.append(TransformerTemporalModel(
                out_channels // num_attention_heads, num_attention_heads, in_channels=out_channels,
                num_layers=1, cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)
        self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True)]) if add_upsample else None

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb,
                 encoder_hidden_states, num_frames: int = 1):
        for i in range(len(self.resnets)):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.temp_convs[i](params["temp_convs"][i], hidden_states, num_frames)
            hidden_states = self.attentions[i](params["attentions"][i], hidden_states,
                                               encoder_hidden_states=encoder_hidden_states)
            hidden_states = self.temp_attentions[i](params["temp_attentions"][i], hidden_states,
                                                    num_frames=num_frames)
        if self.upsamplers is not None:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class UpBlock3D(Module):
    has_cross_attention = False

    def __init__(self, in_channels: int, out_channels: int, prev_output_channel: int,
                 temb_channels: int, num_layers: int = 1, resnet_eps: float = 1e-6,
                 resnet_groups: int = 32, add_upsample: bool = True):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            res_skip = in_channels if (i == num_layers - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(in_channels=res_in + res_skip, out_channels=out_channels,
                                         temb_channels=temb_channels, eps=resnet_eps,
                                         groups=resnet_groups))
            temp_convs.append(TemporalConvLayer(out_channels, out_channels, norm_num_groups=resnet_groups))
        self.resnets = ModuleList(resnets)
        self.temp_convs = ModuleList(temp_convs)
        self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True)]) if add_upsample else None

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb,
                 num_frames: int = 1):
        for i in range(len(self.resnets)):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.temp_convs[i](params["temp_convs"][i], hidden_states, num_frames)
        if self.upsamplers is not None:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


def get_down_block_3d(block_type: str, **kwargs):
    if block_type == "CrossAttnDownBlock3D":
        return CrossAttnDownBlock3D(**kwargs)
    if block_type == "DownBlock3D":
        kwargs.pop("num_attention_heads", None)
        kwargs.pop("cross_attention_dim", None)
        kwargs.pop("use_linear_projection", None)
        return DownBlock3D(**kwargs)
    raise ValueError(f"unknown 3D down block {block_type}")


def get_up_block_3d(block_type: str, **kwargs):
    if block_type == "CrossAttnUpBlock3D":
        return CrossAttnUpBlock3D(**kwargs)
    if block_type == "UpBlock3D":
        kwargs.pop("num_attention_heads", None)
        kwargs.pop("cross_attention_dim", None)
        kwargs.pop("use_linear_projection", None)
        return UpBlock3D(**kwargs)
    raise ValueError(f"unknown 3D up block {block_type}")

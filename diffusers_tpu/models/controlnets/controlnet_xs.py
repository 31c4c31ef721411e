"""ControlNet-XS: a small control stream interleaved with the base UNet.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_xs.py`):
unlike vanilla ControlNet (a full UNet copy adding residuals once), XS runs a
thin control stream IN LOCKSTEP with the base UNet — before every subblock
the base features are concatenated into the control stream through a
zero-initialized 1x1 conv (`base_to_ctrl`, `:135`), and after every subblock
the control features are added back through another zero conv scaled by
`conditioning_scale` (`ctrl_to_base`, `:164`). Up blocks consume BOTH skip
stacks: the ctrl skips enter through per-subblock zero convs (`:1630`).

Two public classes, mirroring the reference split:
  * `ControlNetXSAdapter` (`:244`) — the trainable control-side components
    only; cannot run alone (structure for checkpoint load/save + `from_unet`
    sizing).
  * `UNetControlNetXSModel` (`:511`) — base UNet + adapter fused into one
    dual-stream model; `forward` IS the final eps prediction (not a residual).
    `from_unet` performs the parameter-tree surgery that the reference does
    with load_state_dict (`:718`).

TPU notes: the dual stream is pure dataflow — XLA sees one graph and fuses
the zero-conv adds into the surrounding convs; `apply_control` is a Python
static so the control-free variant traces a plain UNet.
"""

from __future__ import annotations

from math import gcd
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps, get_timestep_embedding
from ..modeling_utils import ModelMixin
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ..transformers.transformer_2d import Transformer2DModel
from ..unets.unet_2d_condition_blocks import UNetMidBlock2DCrossAttn
from .controlnet import ControlNetConditioningEmbedding
from dataclasses import dataclass


@dataclass
class ControlNetXSOutput(BaseOutput):
    """`sample` IS the final model output, not a residual (reference `:52`)."""

    sample: jax.Array = None


def find_largest_factor(number, max_factor):
    factor = max_factor
    if factor >= number:
        return number
    while factor != 0:
        if number % factor == 0:
            return factor
        factor -= 1


class ZeroConv2d(Conv2d):
    """1x1 conv initialized to zero (reference `make_zero_conv`, `:1817`)."""

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        return jax.tree.map(jnp.zeros_like, params)


def make_zero_conv(in_channels, out_channels=None):
    return ZeroConv2d(in_channels, out_channels or in_channels, kernel_size=1, padding=0)


def _per_layer(v, n):
    return [v] * n if isinstance(v, int) else list(v)


# --------------------------------------------------------------- adapter side


class DownBlockControlNetXSAdapter(Module):
    def __init__(self, resnets, base_to_ctrl, ctrl_to_base, attentions=None, downsampler=None):
        super().__init__()
        self.resnets = resnets
        self.base_to_ctrl = base_to_ctrl
        self.ctrl_to_base = ctrl_to_base
        if attentions is not None:
            self.attentions = attentions
        else:
            object.__setattr__(self, "attentions", None)
        if downsampler is not None:
            self.downsamplers = downsampler
        else:
            object.__setattr__(self, "downsamplers", None)


class MidBlockControlNetXSAdapter(Module):
    def __init__(self, midblock, base_to_ctrl, ctrl_to_base):
        super().__init__()
        self.midblock = midblock
        self.base_to_ctrl = base_to_ctrl
        self.ctrl_to_base = ctrl_to_base


class UpBlockControlNetXSAdapter(Module):
    def __init__(self, ctrl_to_base):
        super().__init__()
        self.ctrl_to_base = ctrl_to_base


def get_down_block_adapter(base_in_channels, base_out_channels, ctrl_in_channels,
                           ctrl_out_channels, temb_channels, max_norm_num_groups=32,
                           has_crossattn=True, transformer_layers_per_block=1,
                           num_attention_heads=1, cross_attention_dim=1024,
                           add_downsample=True, use_linear_projection=True):
    num_layers = 2  # only support sd + sdxl (reference `:119`)
    tl = _per_layer(transformer_layers_per_block, num_layers)
    resnets, attentions, ctrl_to_base, base_to_ctrl = [], [], [], []
    for i in range(num_layers):
        base_in = base_in_channels if i == 0 else base_out_channels
        ctrl_in = ctrl_in_channels if i == 0 else ctrl_out_channels
        base_to_ctrl.append(make_zero_conv(base_in, base_in))
        resnets.append(ResnetBlock2D(
            in_channels=ctrl_in + base_in, out_channels=ctrl_out_channels,
            temb_channels=temb_channels,
            groups=find_largest_factor(ctrl_in + base_in, max_norm_num_groups),
            groups_out=find_largest_factor(ctrl_out_channels, max_norm_num_groups),
            eps=1e-5))
        if has_crossattn:
            attentions.append(Transformer2DModel(
                num_attention_heads, ctrl_out_channels // num_attention_heads,
                in_channels=ctrl_out_channels, num_layers=tl[i],
                cross_attention_dim=cross_attention_dim,
                use_linear_projection=use_linear_projection,
                norm_num_groups=find_largest_factor(ctrl_out_channels, max_norm_num_groups)))
        ctrl_to_base.append(make_zero_conv(ctrl_out_channels, base_out_channels))
    if add_downsample:
        base_to_ctrl.append(make_zero_conv(base_out_channels, base_out_channels))
        downsampler = Downsample2D(ctrl_out_channels + base_out_channels, use_conv=True,
                                   out_channels=ctrl_out_channels)
        ctrl_to_base.append(make_zero_conv(ctrl_out_channels, base_out_channels))
    else:
        downsampler = None
    return DownBlockControlNetXSAdapter(
        ModuleList(resnets), ModuleList(base_to_ctrl), ModuleList(ctrl_to_base),
        ModuleList(attentions) if has_crossattn else None, downsampler)


def get_mid_block_adapter(base_channels, ctrl_channels, temb_channels=None,
                          max_norm_num_groups=32, transformer_layers_per_block=1,
                          num_attention_heads=1, cross_attention_dim=1024,
                          use_linear_projection=True):
    base_to_ctrl = make_zero_conv(base_channels, base_channels)
    midblock = UNetMidBlock2DCrossAttn(
        transformer_layers_per_block=transformer_layers_per_block,
        in_channels=ctrl_channels + base_channels, out_channels=ctrl_channels,
        temb_channels=temb_channels,
        resnet_groups=find_largest_factor(gcd(ctrl_channels, ctrl_channels + base_channels),
                                          max_norm_num_groups),
        cross_attention_dim=cross_attention_dim, num_attention_heads=num_attention_heads,
        use_linear_projection=use_linear_projection)
    ctrl_to_base = make_zero_conv(ctrl_channels, base_channels)
    return MidBlockControlNetXSAdapter(midblock, base_to_ctrl, ctrl_to_base)


def get_up_block_adapter(out_channels, prev_output_channel, ctrl_skip_channels):
    ctrl_to_base = []
    for i in range(3):  # 3 subblocks per up block (reference `:236`)
        resnet_in = prev_output_channel if i == 0 else out_channels
        ctrl_to_base.append(make_zero_conv(ctrl_skip_channels[i], resnet_in))
    return UpBlockControlNetXSAdapter(ModuleList(ctrl_to_base))


class ControlNetXSAdapter(Module, ModelMixin, ConfigMixin):
    """Control-side components only (reference `:244`); fuse with a base UNet
    via `UNetControlNetXSModel.from_unet`. Cannot run standalone."""

    @register_to_config
    def __init__(
        self,
        conditioning_channels: int = 3,
        conditioning_channel_order: str = "rgb",
        conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
        time_embedding_mix: float = 1.0,
        learn_time_embedding: bool = False,
        num_attention_heads=4,
        block_out_channels: Tuple[int, ...] = (4, 8, 16, 16),
        base_block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        cross_attention_dim: int = 1024,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
        sample_size: Optional[int] = 96,
        transformer_layers_per_block=1,
        upcast_attention: bool = True,
        max_norm_num_groups: int = 32,
        use_linear_projection: bool = True,
    ):
        super().__init__()
        if conditioning_channel_order not in ("rgb", "bgr"):
            raise ValueError(f"unknown `conditioning_channel_order`: {conditioning_channel_order}")
        n = len(down_block_types)
        tl = _per_layer(transformer_layers_per_block, n)
        cad = cross_attention_dim if isinstance(cross_attention_dim, (list, tuple)) else [cross_attention_dim] * n
        heads = num_attention_heads if isinstance(num_attention_heads, (list, tuple)) else [num_attention_heads] * n

        time_embedding_dim = base_block_out_channels[0] * 4
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            conditioning_embedding_channels=block_out_channels[0],
            block_out_channels=conditioning_embedding_out_channels,
            conditioning_channels=conditioning_channels)
        if learn_time_embedding:
            self.time_embedding = TimestepEmbedding(base_block_out_channels[0], time_embedding_dim)
        else:
            object.__setattr__(self, "time_embedding", None)
        self.conv_in = Conv2d(4, block_out_channels[0], kernel_size=3, padding=1)
        self.control_to_base_for_conv_in = make_zero_conv(block_out_channels[0], base_block_out_channels[0])

        down_blocks = []
        base_out, ctrl_out = base_block_out_channels[0], block_out_channels[0]
        for i, dbt in enumerate(down_block_types):
            base_in, base_out = base_out, base_block_out_channels[i]
            ctrl_in, ctrl_out = ctrl_out, block_out_channels[i]
            down_blocks.append(get_down_block_adapter(
                base_in, base_out, ctrl_in, ctrl_out, time_embedding_dim,
                max_norm_num_groups=max_norm_num_groups, has_crossattn="CrossAttn" in dbt,
                transformer_layers_per_block=tl[i], num_attention_heads=heads[i],
                cross_attention_dim=cad[i], add_downsample=i < n - 1,
                use_linear_projection=use_linear_projection))
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = get_mid_block_adapter(
            base_block_out_channels[-1], block_out_channels[-1], time_embedding_dim,
            max_norm_num_groups=max_norm_num_groups, transformer_layers_per_block=tl[-1],
            num_attention_heads=heads[-1], cross_attention_dim=cad[-1],
            use_linear_projection=use_linear_projection)

        ctrl_skip_channels = [block_out_channels[0]]
        for i, oc in enumerate(block_out_channels):
            ctrl_skip_channels.extend([oc] * (3 if i < len(block_out_channels) - 1 else 2))
        rev_base = list(reversed(base_block_out_channels))
        up_connections = []
        base_out = rev_base[0]
        for i in range(n):
            prev_base, base_out = base_out, rev_base[i]
            skips = [ctrl_skip_channels.pop() for _ in range(3)]
            up_connections.append(get_up_block_adapter(base_out, prev_base, skips))
        self.up_connections = ModuleList(up_connections)

    @classmethod
    def from_unet(cls, unet, size_ratio=None, block_out_channels=None, num_attention_heads=None,
                  learn_time_embedding=False, time_embedding_mix=1.0, conditioning_channels=3,
                  conditioning_channel_order="rgb",
                  conditioning_embedding_out_channels=(16, 32, 96, 256)):
        """Size the adapter to a `UNet2DConditionModel` (reference `:428`).
        `unet` is the structure object (not a (model, params) pair)."""
        if (block_out_channels is None) == (size_ratio is None):
            raise ValueError("Pass exactly one of `block_out_channels` or `size_ratio`.")
        block_out_channels = block_out_channels or [int(b * size_ratio) for b in unet.config.block_out_channels]
        if num_attention_heads is None:
            num_attention_heads = unet.config.attention_head_dim
        return cls(
            conditioning_channels=conditioning_channels,
            conditioning_channel_order=conditioning_channel_order,
            conditioning_embedding_out_channels=conditioning_embedding_out_channels,
            time_embedding_mix=time_embedding_mix,
            learn_time_embedding=learn_time_embedding,
            num_attention_heads=num_attention_heads,
            block_out_channels=block_out_channels,
            base_block_out_channels=unet.config.block_out_channels,
            cross_attention_dim=unet.config.cross_attention_dim,
            down_block_types=unet.config.down_block_types,
            sample_size=unet.config.sample_size,
            transformer_layers_per_block=unet.config.transformer_layers_per_block,
            max_norm_num_groups=unet.config.norm_num_groups,
            use_linear_projection=unet.config.use_linear_projection,
        )

    def __call__(self, *args, **kwargs):
        raise ValueError(
            "A ControlNetXSAdapter cannot be run by itself. Fuse it with a UNet2DConditionModel "
            "via UNetControlNetXSModel.from_unet.")


# ----------------------------------------------------------------- fused side


class ControlNetXSCrossAttnDownBlock2D(Module):
    """Dual-stream down block (reference `:1150`): per-subblock
    base→ctrl concat (zero conv) then ctrl→base add (zero conv)."""

    def __init__(self, base_in_channels, base_out_channels, ctrl_in_channels,
                 ctrl_out_channels, temb_channels, norm_num_groups=32,
                 ctrl_max_norm_num_groups=32, has_crossattn=True,
                 transformer_layers_per_block=1, base_num_attention_heads=1,
                 ctrl_num_attention_heads=1, cross_attention_dim=1024,
                 add_downsample=True, use_linear_projection=True):
        super().__init__()
        num_layers = 2
        tl = _per_layer(transformer_layers_per_block, num_layers)
        base_resnets, base_attentions = [], []
        ctrl_resnets, ctrl_attentions = [], []
        ctrl_to_base, base_to_ctrl = [], []
        self.has_crossattn = has_crossattn
        for i in range(num_layers):
            base_in = base_in_channels if i == 0 else base_out_channels
            ctrl_in = ctrl_in_channels if i == 0 else ctrl_out_channels
            base_to_ctrl.append(make_zero_conv(base_in, base_in))
            base_resnets.append(ResnetBlock2D(
                in_channels=base_in, out_channels=base_out_channels,
                temb_channels=temb_channels, groups=norm_num_groups))
            ctrl_resnets.append(ResnetBlock2D(
                in_channels=ctrl_in + base_in, out_channels=ctrl_out_channels,
                temb_channels=temb_channels,
                groups=find_largest_factor(ctrl_in + base_in, ctrl_max_norm_num_groups),
                groups_out=find_largest_factor(ctrl_out_channels, ctrl_max_norm_num_groups),
                eps=1e-5))
            if has_crossattn:
                base_attentions.append(Transformer2DModel(
                    base_num_attention_heads, base_out_channels // base_num_attention_heads,
                    in_channels=base_out_channels, num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    use_linear_projection=use_linear_projection,
                    norm_num_groups=norm_num_groups))
                ctrl_attentions.append(Transformer2DModel(
                    ctrl_num_attention_heads, ctrl_out_channels // ctrl_num_attention_heads,
                    in_channels=ctrl_out_channels, num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    use_linear_projection=use_linear_projection,
                    norm_num_groups=find_largest_factor(ctrl_out_channels, ctrl_max_norm_num_groups)))
            ctrl_to_base.append(make_zero_conv(ctrl_out_channels, base_out_channels))
        if add_downsample:
            base_to_ctrl.append(make_zero_conv(base_out_channels, base_out_channels))
            self.base_downsamplers = Downsample2D(base_out_channels, use_conv=True,
                                                  out_channels=base_out_channels)
            self.ctrl_downsamplers = Downsample2D(ctrl_out_channels + base_out_channels,
                                                  use_conv=True, out_channels=ctrl_out_channels)
            ctrl_to_base.append(make_zero_conv(ctrl_out_channels, base_out_channels))
        else:
            object.__setattr__(self, "base_downsamplers", None)
            object.__setattr__(self, "ctrl_downsamplers", None)
        self.base_resnets = ModuleList(base_resnets)
        self.ctrl_resnets = ModuleList(ctrl_resnets)
        if has_crossattn:
            self.base_attentions = ModuleList(base_attentions)
            self.ctrl_attentions = ModuleList(ctrl_attentions)
        else:
            object.__setattr__(self, "base_attentions", [None] * num_layers)
            object.__setattr__(self, "ctrl_attentions", [None] * num_layers)
        self.base_to_ctrl = ModuleList(base_to_ctrl)
        self.ctrl_to_base = ModuleList(ctrl_to_base)

    def __call__(self, params: Params, h_base, h_ctrl, temb, encoder_hidden_states,
                 conditioning_scale=1.0, attention_mask=None, apply_control=True):
        base_out_states, ctrl_out_states = (), ()
        for i in range(len(self.base_resnets)):
            if apply_control:
                b2c = self.base_to_ctrl[i](params["base_to_ctrl"][i], h_base)
                h_ctrl = jnp.concatenate([h_ctrl, b2c], axis=-1)
            h_base = self.base_resnets[i](params["base_resnets"][i], h_base, temb)
            if self.has_crossattn:
                h_base = self.base_attentions[i](
                    params["base_attentions"][i], h_base,
                    encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask)
            if apply_control:
                h_ctrl = self.ctrl_resnets[i](params["ctrl_resnets"][i], h_ctrl, temb)
                if self.has_crossattn:
                    h_ctrl = self.ctrl_attentions[i](
                        params["ctrl_attentions"][i], h_ctrl,
                        encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask)
                h_base = h_base + self.ctrl_to_base[i](params["ctrl_to_base"][i], h_ctrl) * conditioning_scale
            base_out_states += (h_base,)
            ctrl_out_states += (h_ctrl,)
        if self.base_downsamplers is not None:
            if apply_control:
                b2c = self.base_to_ctrl[-1](params["base_to_ctrl"][len(self.base_resnets)], h_base)
                h_ctrl = jnp.concatenate([h_ctrl, b2c], axis=-1)
            h_base = self.base_downsamplers(params["base_downsamplers"], h_base)
            if apply_control:
                h_ctrl = self.ctrl_downsamplers(params["ctrl_downsamplers"], h_ctrl)
                h_base = h_base + self.ctrl_to_base[-1](
                    params["ctrl_to_base"][len(self.base_resnets)], h_ctrl) * conditioning_scale
            base_out_states += (h_base,)
            ctrl_out_states += (h_ctrl,)
        return h_base, h_ctrl, base_out_states, ctrl_out_states


class ControlNetXSCrossAttnMidBlock2D(Module):
    """Dual-stream mid block (reference `:1445`)."""

    def __init__(self, base_channels, ctrl_channels, temb_channels=None,
                 norm_num_groups=32, ctrl_max_norm_num_groups=32,
                 transformer_layers_per_block=1, base_num_attention_heads=1,
                 ctrl_num_attention_heads=1, cross_attention_dim=1024,
                 use_linear_projection=True):
        super().__init__()
        self.base_to_ctrl = make_zero_conv(base_channels, base_channels)
        self.base_midblock = UNetMidBlock2DCrossAttn(
            transformer_layers_per_block=transformer_layers_per_block,
            in_channels=base_channels, temb_channels=temb_channels,
            resnet_groups=norm_num_groups, cross_attention_dim=cross_attention_dim,
            num_attention_heads=base_num_attention_heads,
            use_linear_projection=use_linear_projection)
        self.ctrl_midblock = UNetMidBlock2DCrossAttn(
            transformer_layers_per_block=transformer_layers_per_block,
            in_channels=ctrl_channels + base_channels, out_channels=ctrl_channels,
            temb_channels=temb_channels,
            resnet_groups=find_largest_factor(gcd(ctrl_channels, ctrl_channels + base_channels),
                                              ctrl_max_norm_num_groups),
            cross_attention_dim=cross_attention_dim,
            num_attention_heads=ctrl_num_attention_heads,
            use_linear_projection=use_linear_projection)
        self.ctrl_to_base = make_zero_conv(ctrl_channels, base_channels)

    def __call__(self, params: Params, h_base, h_ctrl, temb, encoder_hidden_states,
                 conditioning_scale=1.0, attention_mask=None, apply_control=True):
        if apply_control:
            b2c = self.base_to_ctrl(params["base_to_ctrl"], h_base)
            h_ctrl = jnp.concatenate([h_ctrl, b2c], axis=-1)
        h_base = self.base_midblock(params["base_midblock"], h_base, temb,
                                    encoder_hidden_states=encoder_hidden_states,
                                    attention_mask=attention_mask)
        if apply_control:
            h_ctrl = self.ctrl_midblock(params["ctrl_midblock"], h_ctrl, temb,
                                        encoder_hidden_states=encoder_hidden_states,
                                        attention_mask=attention_mask)
            h_base = h_base + self.ctrl_to_base(params["ctrl_to_base"], h_ctrl) * conditioning_scale
        return h_base, h_ctrl


class ControlNetXSCrossAttnUpBlock2D(Module):
    """Base up block that also consumes the ctrl skip stack through zero
    convs (reference `:1595`)."""

    def __init__(self, in_channels, out_channels, prev_output_channel, ctrl_skip_channels,
                 temb_channels, norm_num_groups=32, resolution_idx=None, has_crossattn=True,
                 transformer_layers_per_block=1, num_attention_heads=1,
                 cross_attention_dim=1024, add_upsample=True, use_linear_projection=True):
        super().__init__()
        num_layers = 3
        tl = _per_layer(transformer_layers_per_block, num_layers)
        resnets, attentions, ctrl_to_base = [], [], []
        self.has_crossattn = has_crossattn
        for i in range(num_layers):
            res_skip = in_channels if i == num_layers - 1 else out_channels
            resnet_in = prev_output_channel if i == 0 else out_channels
            ctrl_to_base.append(make_zero_conv(ctrl_skip_channels[i], resnet_in))
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in + res_skip, out_channels=out_channels,
                temb_channels=temb_channels, groups=norm_num_groups))
            if has_crossattn:
                attentions.append(Transformer2DModel(
                    num_attention_heads, out_channels // num_attention_heads,
                    in_channels=out_channels, num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    use_linear_projection=use_linear_projection,
                    norm_num_groups=norm_num_groups))
        self.resnets = ModuleList(resnets)
        if has_crossattn:
            self.attentions = ModuleList(attentions)
        else:
            object.__setattr__(self, "attentions", [None] * num_layers)
        self.ctrl_to_base = ModuleList(ctrl_to_base)
        if add_upsample:
            self.upsamplers = Upsample2D(out_channels, use_conv=True, out_channels=out_channels)
        else:
            object.__setattr__(self, "upsamplers", None)
        self.resolution_idx = resolution_idx

    def __call__(self, params: Params, hidden_states, res_base_tuple, res_ctrl_tuple,
                 temb, encoder_hidden_states=None, conditioning_scale=1.0,
                 attention_mask=None, apply_control=True):
        for i in range(len(self.resnets)):
            res_h_base = res_base_tuple[-(i + 1)]
            res_h_ctrl = res_ctrl_tuple[-(i + 1)]
            if apply_control:
                hidden_states = hidden_states + self.ctrl_to_base[i](
                    params["ctrl_to_base"][i], res_h_ctrl) * conditioning_scale
            hidden_states = jnp.concatenate([hidden_states, res_h_base], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            if self.has_crossattn:
                hidden_states = self.attentions[i](
                    params["attentions"][i], hidden_states,
                    encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask)
        if self.upsamplers is not None:
            hidden_states = self.upsamplers(params["upsamplers"], hidden_states)
        return hidden_states


class UNetControlNetXSModel(Module, ModelMixin, ConfigMixin):
    """UNet fused with a ControlNet-XS adapter (reference `:511`).
    `__call__(sample NCHW) → final eps prediction`."""

    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = 96,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types: Tuple[str, ...] = (
            "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        norm_num_groups: Optional[int] = 32,
        cross_attention_dim=1024,
        transformer_layers_per_block=1,
        num_attention_heads=8,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        upcast_attention: bool = True,
        use_linear_projection: bool = True,
        time_cond_proj_dim: Optional[int] = None,
        projection_class_embeddings_input_dim: Optional[int] = None,
        time_embedding_mix: float = 1.0,
        ctrl_conditioning_channels: int = 3,
        ctrl_conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
        ctrl_conditioning_channel_order: str = "rgb",
        ctrl_learn_time_embedding: bool = False,
        ctrl_block_out_channels: Tuple[int, ...] = (4, 8, 16, 16),
        ctrl_num_attention_heads=4,
        ctrl_max_norm_num_groups: int = 32,
    ):
        super().__init__()
        if not 0 <= time_embedding_mix <= 1:
            raise ValueError("`time_embedding_mix` needs to be between 0 and 1.")
        if time_embedding_mix < 1 and not ctrl_learn_time_embedding:
            raise ValueError("To use `time_embedding_mix` < 1, `ctrl_learn_time_embedding` must be `True`")
        if addition_embed_type is not None and addition_embed_type != "text_time":
            raise ValueError("`addition_embed_type` must be None or 'text_time' (sd/sdxl only).")

        n = len(down_block_types)
        tl = _per_layer(transformer_layers_per_block, n)
        cad = cross_attention_dim if isinstance(cross_attention_dim, (list, tuple)) else [cross_attention_dim] * n
        heads = num_attention_heads if isinstance(num_attention_heads, (list, tuple)) else [num_attention_heads] * n
        ctrl_heads = (ctrl_num_attention_heads if isinstance(ctrl_num_attention_heads, (list, tuple))
                      else [ctrl_num_attention_heads] * n)
        self.in_channels = 4

        self.base_conv_in = Conv2d(4, block_out_channels[0], kernel_size=3, padding=1)
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            conditioning_embedding_channels=ctrl_block_out_channels[0],
            block_out_channels=ctrl_conditioning_embedding_out_channels,
            conditioning_channels=ctrl_conditioning_channels)
        self.ctrl_conv_in = Conv2d(4, ctrl_block_out_channels[0], kernel_size=3, padding=1)
        self.control_to_base_for_conv_in = make_zero_conv(ctrl_block_out_channels[0], block_out_channels[0])

        time_embed_dim = block_out_channels[0] * 4
        self.base_time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0)
        self.base_time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim,
                                                     cond_proj_dim=time_cond_proj_dim)
        if ctrl_learn_time_embedding:
            self.ctrl_time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim)
        else:
            object.__setattr__(self, "ctrl_time_embedding", None)
        if addition_embed_type == "text_time":
            self.base_add_time_proj = Timesteps(addition_time_embed_dim, flip_sin_to_cos=True,
                                                downscale_freq_shift=0)
            self.base_add_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        else:
            object.__setattr__(self, "base_add_time_proj", None)
            object.__setattr__(self, "base_add_embedding", None)

        down_blocks = []
        base_out, ctrl_out = block_out_channels[0], ctrl_block_out_channels[0]
        for i, dbt in enumerate(down_block_types):
            base_in, base_out = base_out, block_out_channels[i]
            ctrl_in, ctrl_out = ctrl_out, ctrl_block_out_channels[i]
            down_blocks.append(ControlNetXSCrossAttnDownBlock2D(
                base_in_channels=base_in, base_out_channels=base_out,
                ctrl_in_channels=ctrl_in, ctrl_out_channels=ctrl_out,
                temb_channels=time_embed_dim, norm_num_groups=norm_num_groups,
                ctrl_max_norm_num_groups=ctrl_max_norm_num_groups,
                has_crossattn="CrossAttn" in dbt, transformer_layers_per_block=tl[i],
                base_num_attention_heads=heads[i], ctrl_num_attention_heads=ctrl_heads[i],
                cross_attention_dim=cad[i], add_downsample=i < n - 1,
                use_linear_projection=use_linear_projection))
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = ControlNetXSCrossAttnMidBlock2D(
            base_channels=block_out_channels[-1], ctrl_channels=ctrl_block_out_channels[-1],
            temb_channels=time_embed_dim, norm_num_groups=norm_num_groups,
            ctrl_max_norm_num_groups=ctrl_max_norm_num_groups,
            transformer_layers_per_block=tl[-1], base_num_attention_heads=heads[-1],
            ctrl_num_attention_heads=ctrl_heads[-1], cross_attention_dim=cad[-1],
            use_linear_projection=use_linear_projection)

        ctrl_skip_channels = [ctrl_block_out_channels[0]]
        for i, oc in enumerate(ctrl_block_out_channels):
            ctrl_skip_channels.extend([oc] * (3 if i < len(ctrl_block_out_channels) - 1 else 2))
        rev_out = list(reversed(block_out_channels))
        rev_tl = list(reversed(tl))
        rev_heads = list(reversed(heads))
        rev_cad = list(reversed(cad))
        up_blocks = []
        out = rev_out[0]
        for i, ubt in enumerate(up_block_types):
            prev_out, out = out, rev_out[i]
            in_ch = rev_out[min(i + 1, len(block_out_channels) - 1)]
            skips = [ctrl_skip_channels.pop() for _ in range(3)]
            up_blocks.append(ControlNetXSCrossAttnUpBlock2D(
                in_channels=in_ch, out_channels=out, prev_output_channel=prev_out,
                ctrl_skip_channels=skips, temb_channels=time_embed_dim,
                norm_num_groups=norm_num_groups,
                resolution_idx=i, has_crossattn="CrossAttn" in ubt,
                transformer_layers_per_block=rev_tl[i], num_attention_heads=rev_heads[i],
                cross_attention_dim=rev_cad[i], add_upsample=i < len(block_out_channels) - 1,
                use_linear_projection=use_linear_projection))
        self.up_blocks = ModuleList(up_blocks)

        self.base_conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=norm_num_groups)
        self.base_conv_out = Conv2d(block_out_channels[0], 4, kernel_size=3, padding=1)

    # ------------------------------------------------------------- from_unet

    @classmethod
    def from_unet(cls, unet, unet_params, controlnet=None, controlnet_params=None,
                  size_ratio=None, ctrl_block_out_channels=None, time_embedding_mix=None,
                  ctrl_optional_kwargs=None):
        """Fuse a (UNet2DConditionModel, params) with a (ControlNetXSAdapter,
        params) — the parameter-tree equivalent of the reference's
        load_state_dict surgery (`:718`). Returns (model, params)."""
        import jax.random

        if controlnet is None:
            controlnet = ControlNetXSAdapter.from_unet(
                unet, size_ratio, ctrl_block_out_channels,
                time_embedding_mix=time_embedding_mix or 1.0, **(ctrl_optional_kwargs or {}))
            if controlnet_params is None:
                controlnet_params = controlnet.init_params(jax.random.PRNGKey(0))
        elif any(o is not None for o in (size_ratio, ctrl_block_out_channels,
                                         time_embedding_mix, ctrl_optional_kwargs)):
            raise ValueError("When a controlnet is passed, pass none of: size_ratio, "
                             "ctrl_block_out_channels, time_embedding_mix, ctrl_optional_kwargs.")

        uc, cc = unet.config, controlnet.config
        model = cls(
            sample_size=uc.sample_size, down_block_types=uc.down_block_types,
            up_block_types=uc.up_block_types, block_out_channels=uc.block_out_channels,
            norm_num_groups=uc.norm_num_groups, cross_attention_dim=uc.cross_attention_dim,
            transformer_layers_per_block=uc.transformer_layers_per_block,
            num_attention_heads=uc.attention_head_dim,
            addition_embed_type=uc.get("addition_embed_type"),
            addition_time_embed_dim=uc.get("addition_time_embed_dim"),
            use_linear_projection=uc.get("use_linear_projection", True),
            time_cond_proj_dim=uc.get("time_cond_proj_dim"),
            projection_class_embeddings_input_dim=uc.get("projection_class_embeddings_input_dim"),
            time_embedding_mix=cc.time_embedding_mix,
            ctrl_conditioning_channels=cc.conditioning_channels,
            ctrl_conditioning_embedding_out_channels=cc.conditioning_embedding_out_channels,
            ctrl_conditioning_channel_order=cc.conditioning_channel_order,
            ctrl_learn_time_embedding=cc.learn_time_embedding,
            ctrl_block_out_channels=cc.block_out_channels,
            ctrl_num_attention_heads=cc.num_attention_heads,
            ctrl_max_norm_num_groups=cc.max_norm_num_groups,
        )

        up, cp = unet_params, controlnet_params
        params: Params = {
            "base_conv_in": up["conv_in"],
            "base_time_embedding": up["time_embedding"],
            "base_conv_norm_out": up["conv_norm_out"],
            "base_conv_out": up["conv_out"],
            "controlnet_cond_embedding": cp["controlnet_cond_embedding"],
            "ctrl_conv_in": cp["conv_in"],
            "control_to_base_for_conv_in": cp["control_to_base_for_conv_in"],
        }
        if "add_embedding" in up:
            params["base_add_embedding"] = up["add_embedding"]
        if cc.learn_time_embedding and "time_embedding" in cp:
            params["ctrl_time_embedding"] = cp["time_embedding"]

        down = {}
        for i in range(len(model.down_blocks)):
            b, c = up["down_blocks"][i], cp["down_blocks"][i]
            entry = {
                "base_resnets": b["resnets"], "ctrl_resnets": c["resnets"],
                "base_to_ctrl": c["base_to_ctrl"], "ctrl_to_base": c["ctrl_to_base"],
            }
            if "attentions" in b:
                entry["base_attentions"] = b["attentions"]
            if "attentions" in c:
                entry["ctrl_attentions"] = c["attentions"]
            if "downsamplers" in b:
                entry["base_downsamplers"] = b["downsamplers"][0]
                entry["ctrl_downsamplers"] = c["downsamplers"]
            down[i] = entry
        params["down_blocks"] = down
        params["mid_block"] = {
            "base_to_ctrl": cp["mid_block"]["base_to_ctrl"],
            "base_midblock": up["mid_block"],
            "ctrl_midblock": cp["mid_block"]["midblock"],
            "ctrl_to_base": cp["mid_block"]["ctrl_to_base"],
        }
        ups = {}
        for i in range(len(model.up_blocks)):
            b = up["up_blocks"][i]
            entry = {"resnets": b["resnets"],
                     "ctrl_to_base": cp["up_connections"][i]["ctrl_to_base"]}
            if "attentions" in b:
                entry["attentions"] = b["attentions"]
            if "upsamplers" in b:
                entry["upsamplers"] = b["upsamplers"][0]
            ups[i] = entry
        params["up_blocks"] = ups
        return model, params

    # --------------------------------------------------------------- forward

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, H, W]
        timestep,
        encoder_hidden_states: jax.Array,
        controlnet_cond: Optional[jax.Array] = None,  # [B, 3, H*8, W*8]
        conditioning_scale: float = 1.0,
        timestep_cond: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        added_cond_kwargs: Optional[Dict[str, jax.Array]] = None,
        return_dict: bool = True,
        apply_control: bool = True,
    ):
        cfg = self.config
        if cfg.ctrl_conditioning_channel_order == "bgr" and controlnet_cond is not None:
            controlnet_cond = controlnet_cond[:, ::-1]

        if attention_mask is not None:
            attention_mask = (1 - attention_mask.astype(sample.dtype)) * -10000.0
            attention_mask = attention_mask[:, None]

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = self.base_time_proj({}, timesteps).astype(sample.dtype)

        if cfg.ctrl_learn_time_embedding and apply_control:
            ctrl_temb = self.ctrl_time_embedding(params["ctrl_time_embedding"], t_emb, timestep_cond)
            base_temb = self.base_time_embedding(params["base_time_embedding"], t_emb, timestep_cond)
            interp = cfg.time_embedding_mix ** 0.3
            temb = ctrl_temb * interp + base_temb * (1 - interp)
        else:
            temb = self.base_time_embedding(params["base_time_embedding"], t_emb)

        if cfg.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = self.base_add_time_proj({}, time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1).astype(temb.dtype)
            temb = temb + self.base_add_embedding(params["base_add_embedding"], add_embeds)

        # NCHW -> NHWC internals
        sample = jnp.transpose(sample, (0, 2, 3, 1))
        h_base = h_ctrl = sample
        hs_base, hs_ctrl = [], []

        h_base = self.base_conv_in(params["base_conv_in"], h_base)
        h_ctrl = self.ctrl_conv_in(params["ctrl_conv_in"], h_ctrl)
        if controlnet_cond is not None:
            guided_hint = self.controlnet_cond_embedding(
                params["controlnet_cond_embedding"], jnp.transpose(controlnet_cond, (0, 2, 3, 1)))
            h_ctrl = h_ctrl + guided_hint
        if apply_control:
            h_base = h_base + self.control_to_base_for_conv_in(
                params["control_to_base_for_conv_in"], h_ctrl) * conditioning_scale

        hs_base.append(h_base)
        hs_ctrl.append(h_ctrl)

        for i, down in enumerate(self.down_blocks):
            h_base, h_ctrl, res_hb, res_hc = down(
                params["down_blocks"][i], h_base, h_ctrl, temb, encoder_hidden_states,
                conditioning_scale=conditioning_scale, attention_mask=attention_mask,
                apply_control=apply_control)
            hs_base.extend(res_hb)
            hs_ctrl.extend(res_hc)

        h_base, h_ctrl = self.mid_block(
            params["mid_block"], h_base, h_ctrl, temb, encoder_hidden_states,
            conditioning_scale=conditioning_scale, attention_mask=attention_mask,
            apply_control=apply_control)

        for i, up_block in enumerate(self.up_blocks):
            n_res = len(up_block.resnets)
            skips_b, hs_base = hs_base[-n_res:], hs_base[:-n_res]
            skips_c, hs_ctrl = hs_ctrl[-n_res:], hs_ctrl[:-n_res]
            h_base = up_block(
                params["up_blocks"][i], h_base, tuple(skips_b), tuple(skips_c), temb,
                encoder_hidden_states=encoder_hidden_states,
                conditioning_scale=conditioning_scale, attention_mask=attention_mask,
                apply_control=apply_control)

        h_base = self.base_conv_norm_out(params["base_conv_norm_out"], h_base)
        h_base = jax.nn.silu(h_base)
        h_base = self.base_conv_out(params["base_conv_out"], h_base)
        h_base = jnp.transpose(h_base, (0, 3, 1, 2))

        if not return_dict:
            return (h_base,)
        return ControlNetXSOutput(sample=h_base)

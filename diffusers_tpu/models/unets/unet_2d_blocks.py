"""UNet2D down/mid/up blocks.

Behavioral mirror of the reference `models/unets/unet_2d_blocks.py`
(DownBlock2D `:1294`, AttnDownBlock2D `:1018`, UNetMidBlock2D `:589`,
UpBlock2D `:2474`, AttnUpBlock2D `:2185`, + cross-attention variants used by
UNet2DConditionModel), on NHWC activations with spatial attention flattened
to [B, HW, C].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..attention import Attention
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ...ops.module import Module, ModuleList, Params


def _attend_spatial(attn: Attention, params: Params, x: jax.Array, context=None, mask=None) -> jax.Array:
    """Run token attention over an NHWC feature map."""
    b, h, w, c = x.shape
    out = attn(params, x.reshape(b, h * w, c), encoder_hidden_states=context, attention_mask=mask)
    return out.reshape(b, h, w, c)


class DownBlock2D(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_downsample: bool = True,
        downsample_padding: int = 1,
    ):
        super().__init__()
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
                for i in range(num_layers)
            ]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)]
            )

    def __call__(self, params: Params, hidden_states: jax.Array, temb: Optional[jax.Array] = None):
        output_states = ()
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class AttnDownBlock2D(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        attention_head_dim: int = 1,
        output_scale_factor: float = 1.0,
        add_downsample: bool = True,
        downsample_padding: int = 1,
        downsample_type: str = "conv",
    ):
        super().__init__()
        if attention_head_dim is None:
            attention_head_dim = out_channels
        self.downsample_type = downsample_type
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
                for i in range(num_layers)
            ]
        )
        self.attentions = ModuleList(
            [
                Attention(
                    out_channels,
                    heads=out_channels // attention_head_dim,
                    dim_head=attention_head_dim,
                    rescale_output_factor=output_scale_factor,
                    eps=resnet_eps,
                    norm_num_groups=resnet_groups,
                    residual_connection=True,
                    bias=True,
                )
                for _ in range(num_layers)
            ]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            if downsample_type == "conv":
                self.downsamplers = ModuleList(
                    [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)]
                )
            elif downsample_type == "resnet":
                self.downsamplers = ModuleList(
                    [
                        ResnetBlock2D(
                            in_channels=out_channels,
                            out_channels=out_channels,
                            temb_channels=temb_channels,
                            eps=resnet_eps,
                            groups=resnet_groups,
                            time_embedding_norm=resnet_time_scale_shift,
                            non_linearity=resnet_act_fn,
                            output_scale_factor=output_scale_factor,
                            down=True,
                        )
                    ]
                )

    def __call__(self, params: Params, hidden_states: jax.Array, temb: Optional[jax.Array] = None):
        output_states = ()
        for i, (resnet, attn) in enumerate(zip(self.resnets, self.attentions)):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = _attend_spatial(attn, params["attentions"][i], hidden_states)
            output_states += (hidden_states,)
        if self.add_downsample:
            if self.downsample_type == "resnet":
                hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states, temb)
            else:
                hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock2D(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        attn_groups: Optional[int] = None,
        add_attention: bool = True,
        attention_head_dim: int = 1,
        output_scale_factor: float = 1.0,
    ):
        super().__init__()
        resnet_groups = resnet_groups if resnet_groups is not None else min(in_channels // 4, 32)
        self.add_attention = add_attention
        if attn_groups is None:
            attn_groups = resnet_groups if resnet_time_scale_shift == "default" else None
        if attention_head_dim is None:
            attention_head_dim = in_channels

        def make_resnet():
            return ResnetBlock2D(
                in_channels=in_channels,
                out_channels=in_channels,
                temb_channels=temb_channels,
                eps=resnet_eps,
                groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor,
            )

        self.resnets = ModuleList([make_resnet() for _ in range(num_layers + 1)])
        if add_attention:
            self.attentions = ModuleList(
                [
                    Attention(
                        in_channels,
                        heads=in_channels // attention_head_dim,
                        dim_head=attention_head_dim,
                        rescale_output_factor=output_scale_factor,
                        eps=resnet_eps,
                        norm_num_groups=attn_groups,
                        residual_connection=True,
                        bias=True,
                    )
                    for _ in range(num_layers)
                ]
            )

    def __call__(self, params: Params, hidden_states: jax.Array, temb: Optional[jax.Array] = None):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        for i in range(len(self.resnets) - 1):
            if self.add_attention:
                hidden_states = _attend_spatial(self.attentions[i], params["attentions"][i], hidden_states)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
        return hidden_states


class UpBlock2D(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        prev_output_channel: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_upsample: bool = True,
    ):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                ResnetBlock2D(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
            )
        self.resnets = ModuleList(resnets)
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states: jax.Array, res_hidden_states_tuple, temb=None):
        for i, resnet in enumerate(self.resnets):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            freeu = getattr(self, "freeu", None)
            if freeu is not None and getattr(self, "resolution_idx", None) in (0, 1):
                from ...utils.freeu_utils import apply_freeu

                hidden_states, res_hidden_states = apply_freeu(
                    self.resolution_idx, hidden_states, res_hidden_states, freeu
                )
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class AttnUpBlock2D(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        prev_output_channel: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        attention_head_dim: int = 1,
        output_scale_factor: float = 1.0,
        add_upsample: bool = True,
        upsample_type: str = "conv",
    ):
        super().__init__()
        if attention_head_dim is None:
            attention_head_dim = out_channels
        self.upsample_type = upsample_type
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                ResnetBlock2D(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
            )
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(
            [
                Attention(
                    out_channels,
                    heads=out_channels // attention_head_dim,
                    dim_head=attention_head_dim,
                    rescale_output_factor=output_scale_factor,
                    eps=resnet_eps,
                    norm_num_groups=resnet_groups,
                    residual_connection=True,
                    bias=True,
                )
                for _ in range(num_layers)
            ]
        )
        self.add_upsample = add_upsample
        if add_upsample:
            if upsample_type == "conv":
                self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])
            elif upsample_type == "resnet":
                self.upsamplers = ModuleList(
                    [
                        ResnetBlock2D(
                            in_channels=out_channels,
                            out_channels=out_channels,
                            temb_channels=temb_channels,
                            eps=resnet_eps,
                            groups=resnet_groups,
                            time_embedding_norm=resnet_time_scale_shift,
                            non_linearity=resnet_act_fn,
                            output_scale_factor=output_scale_factor,
                            up=True,
                        )
                    ]
                )

    def __call__(self, params: Params, hidden_states: jax.Array, res_hidden_states_tuple, temb=None):
        for i, (resnet, attn) in enumerate(zip(self.resnets, self.attentions)):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = _attend_spatial(attn, params["attentions"][i], hidden_states)
        if self.add_upsample:
            if self.upsample_type == "resnet":
                hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states, temb)
            else:
                hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


def get_down_block(
    down_block_type: str,
    num_layers: int,
    in_channels: int,
    out_channels: int,
    temb_channels: int,
    add_downsample: bool,
    resnet_eps: float,
    resnet_act_fn: str,
    resnet_groups: Optional[int] = None,
    attention_head_dim: Optional[int] = None,
    downsample_padding: Optional[int] = None,
    resnet_time_scale_shift: str = "default",
    downsample_type: Optional[str] = None,
    cross_attention_dim: Optional[int] = None,
    num_attention_heads: Optional[int] = None,
    transformer_layers_per_block: int = 1,
    use_linear_projection: bool = False,
    only_cross_attention: bool = False,
    dual_cross_attention: bool = False,
    **kwargs,
):
    if down_block_type == "DownBlock2D":
        return DownBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            temb_channels=temb_channels,
            add_downsample=add_downsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            downsample_padding=downsample_padding if downsample_padding is not None else 1,
            resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if down_block_type == "AttnDownBlock2D":
        return AttnDownBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            temb_channels=temb_channels,
            add_downsample=add_downsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            attention_head_dim=attention_head_dim,
            downsample_padding=downsample_padding if downsample_padding is not None else 1,
            resnet_time_scale_shift=resnet_time_scale_shift,
            downsample_type=downsample_type or "conv",
        )
    if down_block_type == "CrossAttnDownBlock2D":
        from .unet_2d_condition_blocks import CrossAttnDownBlock2D

        return CrossAttnDownBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            temb_channels=temb_channels,
            add_downsample=add_downsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            cross_attention_dim=cross_attention_dim,
            num_attention_heads=num_attention_heads,
            transformer_layers_per_block=transformer_layers_per_block,
            use_linear_projection=use_linear_projection,
            downsample_padding=downsample_padding if downsample_padding is not None else 1,
            resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if down_block_type == "ResnetDownsampleBlock2D":
        from .unet_2d_simple_blocks import ResnetDownsampleBlock2D

        return ResnetDownsampleBlock2D(
            num_layers=num_layers, in_channels=in_channels, out_channels=out_channels,
            temb_channels=temb_channels, add_downsample=add_downsample, resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn, resnet_groups=resnet_groups or 32,
            resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if down_block_type == "SimpleCrossAttnDownBlock2D":
        from .unet_2d_simple_blocks import SimpleCrossAttnDownBlock2D

        return SimpleCrossAttnDownBlock2D(
            num_layers=num_layers, in_channels=in_channels, out_channels=out_channels,
            temb_channels=temb_channels, add_downsample=add_downsample, resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn, resnet_groups=resnet_groups or 32,
            attention_head_dim=attention_head_dim if attention_head_dim is not None else out_channels,
            cross_attention_dim=cross_attention_dim,
            resnet_time_scale_shift=resnet_time_scale_shift,
            only_cross_attention=only_cross_attention,
        )
    raise ValueError(f"unsupported down_block_type {down_block_type}")


def get_up_block(
    up_block_type: str,
    num_layers: int,
    in_channels: int,
    out_channels: int,
    prev_output_channel: int,
    temb_channels: int,
    add_upsample: bool,
    resnet_eps: float,
    resnet_act_fn: str,
    resnet_groups: Optional[int] = None,
    attention_head_dim: Optional[int] = None,
    resnet_time_scale_shift: str = "default",
    upsample_type: Optional[str] = None,
    cross_attention_dim: Optional[int] = None,
    num_attention_heads: Optional[int] = None,
    transformer_layers_per_block: int = 1,
    use_linear_projection: bool = False,
    only_cross_attention: bool = False,
    dual_cross_attention: bool = False,
    **kwargs,
):
    if up_block_type == "UpBlock2D":
        return UpBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels,
            add_upsample=add_upsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if up_block_type == "AttnUpBlock2D":
        return AttnUpBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels,
            add_upsample=add_upsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            attention_head_dim=attention_head_dim,
            resnet_time_scale_shift=resnet_time_scale_shift,
            upsample_type=upsample_type or "conv",
        )
    if up_block_type == "CrossAttnUpBlock2D":
        from .unet_2d_condition_blocks import CrossAttnUpBlock2D

        return CrossAttnUpBlock2D(
            num_layers=num_layers,
            in_channels=in_channels,
            out_channels=out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels,
            add_upsample=add_upsample,
            resnet_eps=resnet_eps,
            resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            cross_attention_dim=cross_attention_dim,
            num_attention_heads=num_attention_heads,
            transformer_layers_per_block=transformer_layers_per_block,
            use_linear_projection=use_linear_projection,
            resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if up_block_type == "ResnetUpsampleBlock2D":
        from .unet_2d_simple_blocks import ResnetUpsampleBlock2D

        return ResnetUpsampleBlock2D(
            num_layers=num_layers, in_channels=in_channels, out_channels=out_channels,
            prev_output_channel=prev_output_channel, temb_channels=temb_channels,
            add_upsample=add_upsample, resnet_eps=resnet_eps, resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32, resnet_time_scale_shift=resnet_time_scale_shift,
        )
    if up_block_type == "SimpleCrossAttnUpBlock2D":
        from .unet_2d_simple_blocks import SimpleCrossAttnUpBlock2D

        return SimpleCrossAttnUpBlock2D(
            num_layers=num_layers, in_channels=in_channels, out_channels=out_channels,
            prev_output_channel=prev_output_channel, temb_channels=temb_channels,
            add_upsample=add_upsample, resnet_eps=resnet_eps, resnet_act_fn=resnet_act_fn,
            resnet_groups=resnet_groups or 32,
            attention_head_dim=attention_head_dim if attention_head_dim is not None else out_channels,
            cross_attention_dim=cross_attention_dim,
            resnet_time_scale_shift=resnet_time_scale_shift,
            only_cross_attention=only_cross_attention,
        )
    raise ValueError(f"unsupported up_block_type {up_block_type}")

"""DreamLiteUNetModel — mobile-friendly SD-style UNet.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/unets/unet_dreamlite.py:1582`
DreamLiteUNetModel and `transformer_2d_dreamlite.py:384`): the standard
UNet2DConditionModel topology with (a) depthwise-separable resnet convs —
conv1 expands channels 2x, conv2 contracts (`:160`); (b) grouped-query
attention with per-head RMS qk-norm; (c) a "remove self-attention" block
variant where the normed hidden state replaces the self-attention residual
branch outright (`transformer_2d_dreamlite.py` use_self_attention=False);
(d) a non-default feed-forward expansion (`ff_mult`). The forward pass is
inherited from our UNet2DConditionModel (identical contract).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, LayerNorm, Linear, Module, ModuleList, Params
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import TimestepEmbedding, Timesteps
from ..resnet import Downsample2D, Upsample2D, get_activation
from .unet_2d_condition import UNet2DConditionModel, UNet2DConditionOutput, _tuple_per_block


class DepthwiseSeparableConv(Module):
    """Depthwise (groups=C) + 1x1 pointwise conv; the pointwise output is
    `out_channels * expand_ratio` (reference :64). NHWC."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, bias: bool = False,
                 expand_ratio: float = 1):
        super().__init__()
        self.depthwise = Conv2d(in_channels, in_channels, kernel_size=kernel_size,
                                stride=stride, padding=padding, groups=in_channels,
                                use_bias=bias)
        self.pointwise = Conv2d(in_channels, int(out_channels * expand_ratio),
                                kernel_size=1, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.pointwise(params["pointwise"], self.depthwise(params["depthwise"], x))


class ResnetBlock2DDreamLite(Module):
    """ResnetBlock2D with optional inverted-residual sep-convs (reference :101)."""

    def __init__(self, *, in_channels: int, out_channels: Optional[int] = None,
                 temb_channels: Optional[int] = 512, groups: int = 32,
                 groups_out: Optional[int] = None, eps: float = 1e-6,
                 non_linearity: str = "swish", time_embedding_norm: str = "default",
                 output_scale_factor: float = 1.0, use_in_shortcut: Optional[bool] = None,
                 conv_shortcut_bias: bool = True, conv_2d_out_channels: Optional[int] = None,
                 use_sep_conv: bool = False):
        super().__init__()
        self.in_channels = in_channels
        out_channels = in_channels if out_channels is None else out_channels
        self.time_embedding_norm = time_embedding_norm
        self.output_scale_factor = output_scale_factor
        groups_out = groups_out or groups

        self.norm1 = GroupNorm(num_groups=groups, num_channels=in_channels, eps=eps)
        if use_sep_conv:
            expand_ratio = 2
            self.conv1 = DepthwiseSeparableConv(in_channels, out_channels, kernel_size=3,
                                                stride=1, padding=1, expand_ratio=expand_ratio)
            mid_channels = out_channels * expand_ratio
        else:
            expand_ratio = 1
            self.conv1 = Conv2d(in_channels, out_channels, kernel_size=3, stride=1, padding=1)
            mid_channels = out_channels

        if temb_channels is not None:
            if time_embedding_norm == "default":
                self.time_emb_proj = Linear(temb_channels, mid_channels)
            elif time_embedding_norm == "scale_shift":
                self.time_emb_proj = Linear(temb_channels, 2 * mid_channels)
            else:
                raise ValueError(f"unknown time_embedding_norm: {time_embedding_norm}")
        else:
            self.time_emb_proj = None

        self.norm2 = GroupNorm(num_groups=groups_out, num_channels=mid_channels, eps=eps)
        conv_2d_out_channels = conv_2d_out_channels or mid_channels
        if use_sep_conv:
            self.conv2 = DepthwiseSeparableConv(mid_channels, conv_2d_out_channels,
                                                kernel_size=3, stride=1, padding=1,
                                                expand_ratio=1 / expand_ratio)
            final_channels = conv_2d_out_channels // expand_ratio
        else:
            self.conv2 = Conv2d(mid_channels, conv_2d_out_channels, kernel_size=3,
                                stride=1, padding=1)
            final_channels = conv_2d_out_channels
        self.nonlinearity = get_activation(non_linearity)

        self.use_in_shortcut = (in_channels != final_channels) if use_in_shortcut is None \
            else use_in_shortcut
        if self.use_in_shortcut:
            self.conv_shortcut = Conv2d(in_channels, final_channels, kernel_size=1,
                                        stride=1, padding=0, use_bias=conv_shortcut_bias)

    def __call__(self, params: Params, input_tensor: jax.Array,
                 temb: Optional[jax.Array]) -> jax.Array:
        h = self.nonlinearity(self.norm1(params["norm1"], input_tensor))
        h = self.conv1(params["conv1"], h)

        t = None
        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(params["time_emb_proj"], self.nonlinearity(temb))[:, None, None, :]
        if self.time_embedding_norm == "default":
            if t is not None:
                h = h + t
            h = self.norm2(params["norm2"], h)
        elif self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(t, 2, axis=-1)
            h = self.norm2(params["norm2"], h)
            h = h * (1 + scale) + shift

        h = self.nonlinearity(h)
        h = self.conv2(params["conv2"], h)

        if self.use_in_shortcut:
            input_tensor = self.conv_shortcut(params["conv_shortcut"], input_tensor)
        return (input_tensor + h) / self.output_scale_factor


class BasicTransformerBlockDreamLite(Module):
    """layer_norm transformer block with the DreamLite knobs (reference
    transformer_2d_dreamlite.py:43): optional no-self-attention (the normed
    state REPLACES the hidden state — no residual add), GQA + qk-norm,
    ff_mult."""

    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 cross_attention_dim: Optional[int] = None, activation_fn: str = "geglu",
                 attention_bias: bool = False, norm_eps: float = 1e-5,
                 use_self_attention: bool = True, qk_norm: Optional[str] = None,
                 num_kv_heads: Optional[int] = None, ff_mult: int = 4):
        super().__init__()
        self.use_self_attention = use_self_attention
        self.norm1 = LayerNorm(dim, eps=norm_eps)
        if use_self_attention:
            self.attn1 = Attention(query_dim=dim, heads=num_attention_heads,
                                   dim_head=attention_head_dim, bias=attention_bias,
                                   qk_norm=qk_norm, kv_heads=num_kv_heads)
        if cross_attention_dim is not None:
            self.norm2 = LayerNorm(dim, eps=norm_eps)
            self.attn2 = Attention(query_dim=dim, cross_attention_dim=cross_attention_dim,
                                   heads=num_attention_heads, dim_head=attention_head_dim,
                                   bias=attention_bias, qk_norm=qk_norm,
                                   kv_heads=num_kv_heads)
        else:
            self.attn2 = None
        self.norm3 = LayerNorm(dim, eps=norm_eps)
        self.ff = FeedForward(dim, mult=ff_mult, activation_fn=activation_fn)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None):
        norm_h = self.norm1(params["norm1"], hidden_states)
        if self.use_self_attention:
            attn_out = self.attn1(params["attn1"], norm_h, attention_mask=attention_mask)
            hidden_states = attn_out + hidden_states
        else:
            # "Remove self-attention": the normed state propagates as-is
            hidden_states = norm_h
        if self.attn2 is not None:
            norm_h = self.norm2(params["norm2"], hidden_states)
            attn_out = self.attn2(params["attn2"], norm_h,
                                  encoder_hidden_states=encoder_hidden_states,
                                  attention_mask=encoder_attention_mask)
            hidden_states = attn_out + hidden_states
        norm_h = self.norm3(params["norm3"], hidden_states)
        return self.ff(params["ff"], norm_h) + hidden_states


class DreamLiteTransformer2DModel(Module):
    """Continuous-input 2D transformer (reference transformer_2d_dreamlite.py:384).
    NHWC activations."""

    def __init__(self, num_attention_heads: int = 16, attention_head_dim: int = 88,
                 in_channels: Optional[int] = None, num_layers: int = 1,
                 norm_num_groups: int = 32, cross_attention_dim: Optional[int] = None,
                 attention_bias: bool = False, activation_fn: str = "geglu",
                 use_linear_projection: bool = False, use_self_attention: bool = True,
                 qk_norm: Optional[str] = None, num_kv_heads: Optional[int] = None,
                 ff_mult: int = 4, norm_eps: float = 1e-5):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.use_linear_projection = use_linear_projection
        self.norm = GroupNorm(num_groups=norm_num_groups, num_channels=in_channels, eps=1e-6)
        if use_linear_projection:
            self.proj_in = Linear(in_channels, inner_dim)
            self.proj_out = Linear(inner_dim, in_channels)
        else:
            self.proj_in = Conv2d(in_channels, inner_dim, kernel_size=1, stride=1, padding=0)
            self.proj_out = Conv2d(inner_dim, in_channels, kernel_size=1, stride=1, padding=0)
        self.transformer_blocks = ModuleList([
            BasicTransformerBlockDreamLite(
                inner_dim, num_attention_heads, attention_head_dim,
                cross_attention_dim=cross_attention_dim, activation_fn=activation_fn,
                attention_bias=attention_bias, use_self_attention=use_self_attention,
                qk_norm=qk_norm, num_kv_heads=num_kv_heads, ff_mult=ff_mult,
                norm_eps=norm_eps)
            for _ in range(num_layers)
        ])

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None):
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        hidden_states = self.norm(params["norm"], hidden_states)
        if self.use_linear_projection:
            hidden_states = hidden_states.reshape(b, h * w, c)
            hidden_states = self.proj_in(params["proj_in"], hidden_states)
        else:
            hidden_states = self.proj_in(params["proj_in"], hidden_states)
            hidden_states = hidden_states.reshape(b, h * w, hidden_states.shape[-1])
        for i, block in enumerate(self.transformer_blocks):
            hidden_states = block(params["transformer_blocks"][i], hidden_states,
                                  encoder_hidden_states=encoder_hidden_states,
                                  attention_mask=attention_mask,
                                  encoder_attention_mask=encoder_attention_mask)
        if self.use_linear_projection:
            hidden_states = self.proj_out(params["proj_out"], hidden_states)
            hidden_states = hidden_states.reshape(b, h, w, c)
        else:
            hidden_states = hidden_states.reshape(b, h, w, hidden_states.shape[-1])
            hidden_states = self.proj_out(params["proj_out"], hidden_states)
        return hidden_states + residual


class _DreamLiteCrossAttnDownBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, num_attention_heads=1, cross_attention_dim=1280,
                 output_scale_factor=1.0, downsample_padding=1, add_downsample=True,
                 use_linear_projection=False, use_self_attention=True,
                 qk_norm=None, use_sep_conv=False, ff_mult=4, num_kv_heads=None):
        super().__init__()
        tl = [transformer_layers_per_block] * num_layers \
            if isinstance(transformer_layers_per_block, int) else list(transformer_layers_per_block)
        self.resnets = ModuleList([
            ResnetBlock2DDreamLite(
                in_channels=in_channels if i == 0 else out_channels,
                out_channels=out_channels, temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
                use_sep_conv=use_sep_conv)
            for i in range(num_layers)
        ])
        self.attentions = ModuleList([
            DreamLiteTransformer2DModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels, num_layers=tl[i],
                cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection,
                use_self_attention=use_self_attention, qk_norm=qk_norm,
                num_kv_heads=num_kv_heads, ff_mult=ff_mult)
            for i in range(num_layers)
        ])
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList([
                Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                             padding=downsample_padding)])

    def __call__(self, params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None, additional_residual=None):
        output_states = ()
        n = len(self.resnets)
        for i, (resnet, attn) in enumerate(zip(self.resnets, self.attentions)):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = attn(params["attentions"][i], hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 attention_mask=attention_mask,
                                 encoder_attention_mask=encoder_attention_mask)
            if i == n - 1 and additional_residual is not None:
                hidden_states = hidden_states + additional_residual
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class _DreamLiteDownBlock2D(Module):
    has_cross_attention = False

    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, output_scale_factor=1.0,
                 downsample_padding=1, add_downsample=True, use_sep_conv=False):
        super().__init__()
        self.resnets = ModuleList([
            ResnetBlock2DDreamLite(
                in_channels=in_channels if i == 0 else out_channels,
                out_channels=out_channels, temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
                use_sep_conv=use_sep_conv)
            for i in range(num_layers)
        ])
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList([
                Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                             padding=downsample_padding)])

    def __call__(self, params, hidden_states, temb=None):
        output_states = ()
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class _DreamLiteMidBlock2DCrossAttn(Module):
    has_cross_attention = True

    def __init__(self, in_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, num_attention_heads=1, cross_attention_dim=1280,
                 output_scale_factor=1.0, use_linear_projection=False,
                 qk_norm=None, use_sep_conv=False, ff_mult=4, num_kv_heads=None):
        super().__init__()
        tl = [transformer_layers_per_block] * num_layers \
            if isinstance(transformer_layers_per_block, int) else list(transformer_layers_per_block)
        self.resnets = ModuleList([
            ResnetBlock2DDreamLite(
                in_channels=in_channels, out_channels=in_channels,
                temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift, non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor, use_sep_conv=use_sep_conv)
            for _ in range(num_layers + 1)
        ])
        self.attentions = ModuleList([
            DreamLiteTransformer2DModel(
                num_attention_heads, in_channels // num_attention_heads,
                in_channels=in_channels, num_layers=tl[i],
                cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection, qk_norm=qk_norm,
                num_kv_heads=num_kv_heads, ff_mult=ff_mult)
            for i in range(num_layers)
        ])

    def __call__(self, params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        for i, attn in enumerate(self.attentions):
            hidden_states = attn(params["attentions"][i], hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 attention_mask=attention_mask,
                                 encoder_attention_mask=encoder_attention_mask)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
        return hidden_states


class _DreamLiteCrossAttnUpBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, prev_output_channel, temb_channels,
                 num_layers=1, transformer_layers_per_block=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, num_attention_heads=1, cross_attention_dim=1280,
                 output_scale_factor=1.0, add_upsample=True, use_linear_projection=False,
                 use_self_attention=True, qk_norm=None, use_sep_conv=False,
                 ff_mult=4, num_kv_heads=None):
        super().__init__()
        tl = [transformer_layers_per_block] * num_layers \
            if isinstance(transformer_layers_per_block, int) else list(transformer_layers_per_block)
        resnets = []
        for i in range(num_layers):
            res_skip = in_channels if (i == num_layers - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2DDreamLite(
                in_channels=res_in + res_skip, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift, non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor, use_sep_conv=use_sep_conv))
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList([
            DreamLiteTransformer2DModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels, num_layers=tl[i],
                cross_attention_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                use_linear_projection=use_linear_projection,
                use_self_attention=use_self_attention, qk_norm=qk_norm,
                num_kv_heads=num_kv_heads, ff_mult=ff_mult)
            for i in range(num_layers)
        ])
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True,
                                                     out_channels=out_channels)])

    def __call__(self, params, hidden_states, res_hidden_states_tuple, temb=None,
                 encoder_hidden_states=None, attention_mask=None,
                 encoder_attention_mask=None):
        for i, (resnet, attn) in enumerate(zip(self.resnets, self.attentions)):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = attn(params["attentions"][i], hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 attention_mask=attention_mask,
                                 encoder_attention_mask=encoder_attention_mask)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class _DreamLiteUpBlock2D(Module):
    has_cross_attention = False

    def __init__(self, in_channels, out_channels, prev_output_channel, temb_channels,
                 num_layers=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, output_scale_factor=1.0,
                 add_upsample=True, use_sep_conv=False):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip = in_channels if (i == num_layers - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2DDreamLite(
                in_channels=res_in + res_skip, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift, non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor, use_sep_conv=use_sep_conv))
        self.resnets = ModuleList(resnets)
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True,
                                                     out_channels=out_channels)])

    def __call__(self, params, hidden_states, res_hidden_states_tuple, temb=None):
        for i, resnet in enumerate(self.resnets):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class DreamLiteUNetModel(UNet2DConditionModel):
    """DreamLite UNet (reference :1582). Forward inherited from our
    UNet2DConditionModel (same contract)."""

    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        center_input_sample: bool = False,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = (
            "DreamLiteCrossAttnNoSelfAttnDownBlock2D",
            "DreamLiteCrossAttnNoSelfAttnDownBlock2D",
            "DreamLiteCrossAttnDownBlock2D",
        ),
        mid_block_type: Optional[str] = "DreamLiteUNetMidBlock2DCrossAttn",
        up_block_types: Tuple[str, ...] = (
            "DreamLiteCrossAttnUpBlock2D",
            "DreamLiteCrossAttnNoSelfAttnUpBlock2D",
            "DreamLiteUpBlock2D",
        ),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280),
        layers_per_block: Union[int, Tuple[int, ...]] = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: Union[int, Tuple[int, ...]] = 2048,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        attention_head_dim: Union[int, Tuple[int, ...]] = 64,
        use_linear_projection: bool = False,
        resnet_time_scale_shift: str = "default",
        time_embedding_dim: Optional[int] = None,
        conv_in_kernel: int = 3,
        conv_out_kernel: int = 3,
        addition_embed_type: Optional[str] = None,
        class_embed_type: Optional[str] = None,
        encoder_hid_dim: Optional[int] = None,
        encoder_hid_dim_type: Optional[str] = None,
        class_embeddings_concat: bool = False,
        qk_norm: Optional[str] = "rms_norm",
        use_sep_conv: bool = True,
        ff_mult: int = 6,
        num_kv_heads: Optional[int] = 1,
        num_mid_layers: int = 1,
    ):
        Module.__init__(self)
        num_attention_heads = attention_head_dim  # historical naming quirk
        n_blocks = len(down_block_types)
        heads = _tuple_per_block(num_attention_heads, n_blocks)
        cross_dims = _tuple_per_block(cross_attention_dim, n_blocks)
        layers_l = _tuple_per_block(layers_per_block, n_blocks)
        t_layers = _tuple_per_block(transformer_layers_per_block, n_blocks)
        time_embed_dim = time_embedding_dim or block_out_channels[0] * 4

        conv_in_padding = (conv_in_kernel - 1) // 2
        self.conv_in = Conv2d(in_channels, block_out_channels[0],
                              kernel_size=conv_in_kernel, padding=conv_in_padding)
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim,
                                                act_fn=act_fn)
        self.encoder_hid_proj = None
        self.class_embedding = None
        self.add_embedding = None
        self.time_embed_act = None

        common = dict(qk_norm=qk_norm, use_sep_conv=use_sep_conv, ff_mult=ff_mult,
                      num_kv_heads=num_kv_heads)
        down_blocks = []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n_blocks - 1
            if block_type in ("DreamLiteCrossAttnDownBlock2D",
                              "DreamLiteCrossAttnNoSelfAttnDownBlock2D"):
                down_blocks.append(_DreamLiteCrossAttnDownBlock2D(
                    input_channel, output_channel, time_embed_dim,
                    num_layers=layers_l[i], transformer_layers_per_block=t_layers[i],
                    resnet_eps=norm_eps, resnet_time_scale_shift=resnet_time_scale_shift,
                    resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    num_attention_heads=heads[i], cross_attention_dim=cross_dims[i],
                    downsample_padding=downsample_padding, add_downsample=not is_final,
                    use_linear_projection=use_linear_projection,
                    use_self_attention=block_type == "DreamLiteCrossAttnDownBlock2D",
                    **common))
            elif block_type == "DreamLiteDownBlock2D":
                down_blocks.append(_DreamLiteDownBlock2D(
                    input_channel, output_channel, time_embed_dim, num_layers=layers_l[i],
                    resnet_eps=norm_eps, resnet_time_scale_shift=resnet_time_scale_shift,
                    resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    downsample_padding=downsample_padding, add_downsample=not is_final,
                    use_sep_conv=use_sep_conv))
            else:
                raise NotImplementedError(f"down_block_type {block_type}")
        self.down_blocks = ModuleList(down_blocks)

        if mid_block_type == "DreamLiteUNetMidBlock2DCrossAttn":
            self.mid_block = _DreamLiteMidBlock2DCrossAttn(
                block_out_channels[-1], time_embed_dim, num_layers=num_mid_layers,
                transformer_layers_per_block=t_layers[-1], resnet_eps=norm_eps,
                resnet_time_scale_shift=resnet_time_scale_shift, resnet_act_fn=act_fn,
                resnet_groups=norm_num_groups, num_attention_heads=heads[-1],
                cross_attention_dim=cross_dims[-1],
                output_scale_factor=mid_block_scale_factor,
                use_linear_projection=use_linear_projection, **common)
        elif mid_block_type is None:
            self.mid_block = None
        else:
            raise NotImplementedError(f"mid_block_type {mid_block_type}")

        up_blocks = []
        rev_channels = list(reversed(block_out_channels))
        rev_heads = list(reversed(heads))
        rev_layers = list(reversed(layers_l))
        rev_cross = list(reversed(cross_dims))
        rev_tl = list(reversed(t_layers))
        output_channel = rev_channels[0]
        for i, block_type in enumerate(up_block_types):
            is_final = i == n_blocks - 1
            prev_output_channel = output_channel
            output_channel = rev_channels[i]
            input_channel = rev_channels[min(i + 1, n_blocks - 1)]
            if block_type in ("DreamLiteCrossAttnUpBlock2D",
                              "DreamLiteCrossAttnNoSelfAttnUpBlock2D"):
                up_blocks.append(_DreamLiteCrossAttnUpBlock2D(
                    input_channel, output_channel, prev_output_channel, time_embed_dim,
                    num_layers=rev_layers[i] + 1, transformer_layers_per_block=rev_tl[i],
                    resnet_eps=norm_eps, resnet_time_scale_shift=resnet_time_scale_shift,
                    resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    num_attention_heads=rev_heads[i], cross_attention_dim=rev_cross[i],
                    add_upsample=not is_final, use_linear_projection=use_linear_projection,
                    use_self_attention=block_type == "DreamLiteCrossAttnUpBlock2D",
                    **common))
            elif block_type == "DreamLiteUpBlock2D":
                up_blocks.append(_DreamLiteUpBlock2D(
                    input_channel, output_channel, prev_output_channel, time_embed_dim,
                    num_layers=rev_layers[i] + 1, resnet_eps=norm_eps,
                    resnet_time_scale_shift=resnet_time_scale_shift, resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups, add_upsample=not is_final,
                    use_sep_conv=use_sep_conv))
            else:
                raise NotImplementedError(f"up_block_type {block_type}")
        self.up_blocks = ModuleList(up_blocks)

        if norm_num_groups is not None:
            self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0],
                                           num_groups=norm_num_groups, eps=norm_eps)
            self.conv_act = get_activation(act_fn)
        else:
            self.conv_norm_out = None
        conv_out_padding = (conv_out_kernel - 1) // 2
        self.conv_out = Conv2d(block_out_channels[0], out_channels,
                               kernel_size=conv_out_kernel, padding=conv_out_padding)

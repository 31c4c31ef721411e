"""Kandinsky-style "simple" UNet blocks: resnet up/down-sampling blocks and
added-KV cross-attention blocks.

Behavioral mirror of the reference `models/unets/unet_2d_blocks.py`
(UNetMidBlock2DSimpleCrossAttn `:893`, ResnetDownsampleBlock2D `:1756`,
SimpleCrossAttnDownBlock2D `:1846`, ResnetUpsampleBlock2D `:2991`,
SimpleCrossAttnUpBlock2D `:3091`) and the added-KV attention at
`models/attention_processor.py:1279`: spatial tokens query a concatenation of
projected text keys/values and the spatial keys/values, with a channel group
norm before the projections and a residual connection.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...ops.attention import dispatch_attention_fn
from ...ops.module import GroupNorm, LayerNorm, Linear, Module, ModuleList, Params
from ..resnet import ResnetBlock2D


class AttnAddedKV(Module):
    """Attention over flattened NHWC maps with extra learnable text K/V
    (reference Attention with added_kv_proj_dim + AttnAddedKVProcessor)."""

    def __init__(self, query_dim: int, cross_attention_dim: int, heads: int, dim_head: int,
                 added_kv_proj_dim: int, norm_num_groups: int = 32,
                 only_cross_attention: bool = False):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.only_cross_attention = only_cross_attention
        self.group_norm = GroupNorm(num_groups=norm_num_groups, num_channels=query_dim, eps=1e-5)
        self.to_q = Linear(query_dim, inner, use_bias=True)
        if not only_cross_attention:
            self.to_k = Linear(cross_attention_dim, inner, use_bias=True)
            self.to_v = Linear(cross_attention_dim, inner, use_bias=True)
        self.add_k_proj = Linear(added_kv_proj_dim, inner, use_bias=True)
        self.add_v_proj = Linear(added_kv_proj_dim, inner, use_bias=True)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=True)])

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
        # hidden_states: [B, H, W, C] NHWC
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        tokens = hidden_states.reshape(b, h * w, c)
        ctx = tokens if encoder_hidden_states is None else encoder_hidden_states

        normed = self.group_norm(params["group_norm"], tokens)
        q = self.to_q(params["to_q"], normed).reshape(b, -1, self.heads, self.dim_head)
        ek = self.add_k_proj(params["add_k_proj"], ctx).reshape(b, -1, self.heads, self.dim_head)
        ev = self.add_v_proj(params["add_v_proj"], ctx).reshape(b, -1, self.heads, self.dim_head)
        if not self.only_cross_attention:
            k = self.to_k(params["to_k"], normed).reshape(b, -1, self.heads, self.dim_head)
            v = self.to_v(params["to_v"], normed).reshape(b, -1, self.heads, self.dim_head)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)
        else:
            k, v = ek, ev

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, h * w, self.heads * self.dim_head).astype(tokens.dtype)
        out = self.to_out[0](params["to_out"][0], out)
        return out.reshape(b, h, w, c) + residual


def _make_resnets(in_channels, out_channels, temb_channels, num_layers, resnet_eps,
                  resnet_time_scale_shift, resnet_act_fn, resnet_groups, output_scale_factor,
                  skip_connect: bool = False, prev_output_channel: Optional[int] = None):
    resnets = []
    for i in range(num_layers):
        if skip_connect:
            res_skip = in_channels if (i == num_layers - 1) else out_channels
            res_in = prev_output_channel if i == 0 else out_channels
            cin = res_in + res_skip
        else:
            cin = in_channels if i == 0 else out_channels
        resnets.append(
            ResnetBlock2D(
                in_channels=cin,
                out_channels=out_channels,
                temb_channels=temb_channels,
                eps=resnet_eps,
                groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor,
            )
        )
    return resnets


class ResnetDownsampleBlock2D(Module):
    has_cross_attention = False

    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 resnet_eps=1e-6, resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, output_scale_factor=1.0, add_downsample=True):
        super().__init__()
        self.resnets = ModuleList(_make_resnets(
            in_channels, out_channels, temb_channels, num_layers, resnet_eps,
            resnet_time_scale_shift, resnet_act_fn, resnet_groups, output_scale_factor,
        ))
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList([
                ResnetBlock2D(
                    in_channels=out_channels, out_channels=out_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor, down=True,
                )
            ])

    def __call__(self, params: Params, hidden_states, temb=None):
        output_states = ()
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states, temb)
            output_states += (hidden_states,)
        return hidden_states, output_states


class SimpleCrossAttnDownBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 resnet_eps=1e-6, resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, attention_head_dim=1, cross_attention_dim=1280,
                 output_scale_factor=1.0, add_downsample=True, only_cross_attention=False):
        super().__init__()
        self.resnets = ModuleList(_make_resnets(
            in_channels, out_channels, temb_channels, num_layers, resnet_eps,
            resnet_time_scale_shift, resnet_act_fn, resnet_groups, output_scale_factor,
        ))
        self.attentions = ModuleList([
            AttnAddedKV(
                query_dim=out_channels, cross_attention_dim=out_channels,
                heads=out_channels // attention_head_dim, dim_head=attention_head_dim,
                added_kv_proj_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                only_cross_attention=only_cross_attention,
            )
            for _ in range(num_layers)
        ])
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList([
                ResnetBlock2D(
                    in_channels=out_channels, out_channels=out_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor, down=True,
                )
            ])

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None, additional_residual=None):
        output_states = ()
        n = len(self.resnets)
        for i in range(n):
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
            )
            if i == n - 1 and additional_residual is not None:
                hidden_states = hidden_states + additional_residual
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states, temb)
            output_states += (hidden_states,)
        return hidden_states, output_states


class ResnetUpsampleBlock2D(Module):
    has_cross_attention = False

    def __init__(self, in_channels, prev_output_channel, out_channels, temb_channels,
                 num_layers=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, output_scale_factor=1.0,
                 add_upsample=True):
        super().__init__()
        self.resnets = ModuleList(_make_resnets(
            in_channels, out_channels, temb_channels, num_layers, resnet_eps,
            resnet_time_scale_shift, resnet_act_fn, resnet_groups, output_scale_factor,
            skip_connect=True, prev_output_channel=prev_output_channel,
        ))
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([
                ResnetBlock2D(
                    in_channels=out_channels, out_channels=out_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor, up=True,
                )
            ])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None):
        for i, resnet in enumerate(self.resnets):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states, temb)
        return hidden_states


class SimpleCrossAttnUpBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, prev_output_channel, temb_channels,
                 num_layers=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, attention_head_dim=1,
                 cross_attention_dim=1280, output_scale_factor=1.0, add_upsample=True,
                 only_cross_attention=False):
        super().__init__()
        self.resnets = ModuleList(_make_resnets(
            in_channels, out_channels, temb_channels, num_layers, resnet_eps,
            resnet_time_scale_shift, resnet_act_fn, resnet_groups, output_scale_factor,
            skip_connect=True, prev_output_channel=prev_output_channel,
        ))
        self.attentions = ModuleList([
            AttnAddedKV(
                query_dim=out_channels, cross_attention_dim=out_channels,
                heads=out_channels // attention_head_dim, dim_head=attention_head_dim,
                added_kv_proj_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                only_cross_attention=only_cross_attention,
            )
            for _ in range(num_layers)
        ])
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([
                ResnetBlock2D(
                    in_channels=out_channels, out_channels=out_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor, up=True,
                )
            ])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None,
                 encoder_hidden_states=None, attention_mask=None, encoder_attention_mask=None):
        for i in range(len(self.resnets)):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
            )
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states, temb)
        return hidden_states


class UNetMidBlock2DSimpleCrossAttn(Module):
    has_cross_attention = True

    def __init__(self, in_channels, temb_channels, num_layers=1, resnet_eps=1e-6,
                 resnet_time_scale_shift="default", resnet_act_fn="swish", resnet_groups=32,
                 attention_head_dim=1, cross_attention_dim=1280, output_scale_factor=1.0,
                 only_cross_attention=False):
        super().__init__()
        resnets = [
            ResnetBlock2D(
                in_channels=in_channels, out_channels=in_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
            )
        ]
        attentions = []
        for _ in range(num_layers):
            attentions.append(
                AttnAddedKV(
                    query_dim=in_channels, cross_attention_dim=in_channels,
                    heads=in_channels // attention_head_dim, dim_head=attention_head_dim,
                    added_kv_proj_dim=cross_attention_dim, norm_num_groups=resnet_groups,
                    only_cross_attention=only_cross_attention,
                )
            )
            resnets.append(
                ResnetBlock2D(
                    in_channels=in_channels, out_channels=in_channels, temb_channels=temb_channels,
                    eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor,
                )
            )
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        for i in range(len(self.attentions)):
            hidden_states = self.attentions[i](
                params["attentions"][i], hidden_states,
                encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
            )
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
        return hidden_states

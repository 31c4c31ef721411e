"""Kandinsky3UNet.

Behavioral mirror of the reference `models/unets/unet_kandinsky3.py`:
conditional group norms modulated by the time embedding
(Kandinsky3ConditionalGroupNorm `:343`), bottleneck 1-3-3-1 resnet blocks
with compression ratio (`:389`), spatial attention blocks operating on
flattened HW tokens with conv feed-forward (`:450`), attention pooling of
text into the time embedding (`:433`), levels (False, True, True, True)
for self/cross attention, additive -1e4 encoder mask (`:163`).

NHWC internally; NCHW at the public boundary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import (
    Conv2d,
    ConvTranspose2d,
    GroupNorm,
    LayerNorm,
    Linear,
    Module,
    ModuleList,
    Params,
)
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Kandinsky3UNetOutput(BaseOutput):
    sample: jax.Array = None


class _Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x, *a, **k):
        return x


class Kandinsky3EncoderProj(Module):
    def __init__(self, encoder_hid_dim, cross_attention_dim):
        super().__init__()
        self.projection_linear = Linear(encoder_hid_dim, cross_attention_dim, use_bias=False)
        self.projection_norm = LayerNorm(cross_attention_dim)

    def __call__(self, params, x):
        x = self.projection_linear(params["projection_linear"], x)
        return self.projection_norm(params["projection_norm"], x)


class _K3Attention(Module):
    """Plain attention, qkv/out bias-free, heads = out_dim // head_dim
    (torch Attention with out_dim override)."""

    def __init__(self, query_dim, cross_attention_dim, head_dim, out_dim):
        super().__init__()
        self.heads = out_dim // head_dim
        self.head_dim = head_dim
        inner = out_dim
        self.to_q = Linear(query_dim, inner, use_bias=False)
        self.to_k = Linear(cross_attention_dim, inner, use_bias=False)
        self.to_v = Linear(cross_attention_dim, inner, use_bias=False)
        self.to_out = ModuleList([Linear(inner, out_dim, use_bias=False)])

    def __call__(self, params, x, context, additive_mask=None):
        B, S, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(B, S, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], context).reshape(B, -1, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], context).reshape(B, -1, self.heads, self.head_dim)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(self.head_dim, q.dtype))
        if additive_mask is not None:
            scores = scores + additive_mask[:, :, None, :].astype(scores.dtype)  # [B,1,1,Skv]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, -1)
        return self.to_out[0](params["to_out"][0], out)


class Kandinsky3ConditionalGroupNorm(Module):
    def __init__(self, groups, normalized_shape, context_dim):
        super().__init__()
        self.norm = GroupNorm(groups, normalized_shape, affine=False)
        self.context_mlp = ModuleList([_Identity(), Linear(context_dim, 2 * normalized_shape)])

    def __call__(self, params, x, context):
        context = self.context_mlp[1](params["context_mlp"][1], jax.nn.silu(context))
        scale, shift = jnp.split(context, 2, axis=-1)
        # NHWC: broadcast over H, W
        scale = scale[:, None, None, :]
        shift = shift[:, None, None, :]
        return self.norm({}, x) * (scale + 1.0) + shift


class Kandinsky3Block(Module):
    def __init__(self, in_channels, out_channels, time_embed_dim, kernel_size=3, norm_groups=32,
                 up_resolution=None):
        super().__init__()
        self.group_norm = Kandinsky3ConditionalGroupNorm(norm_groups, in_channels, time_embed_dim)
        self.up = up_resolution is not None and up_resolution
        self.down = up_resolution is not None and not up_resolution
        if self.up:
            self.up_sample = ConvTranspose2d(in_channels, in_channels, kernel_size=2, stride=2)
        padding = int(kernel_size > 1)
        self.projection = Conv2d(in_channels, out_channels, kernel_size=kernel_size, padding=padding)
        if self.down:
            self.down_sample = Conv2d(out_channels, out_channels, kernel_size=2, stride=2)

    def __call__(self, params, x, time_embed):
        x = self.group_norm(params["group_norm"], x, time_embed)
        x = jax.nn.silu(x)
        if self.up:
            x = self.up_sample(params["up_sample"], x)
        x = self.projection(params["projection"], x)
        if self.down:
            x = self.down_sample(params["down_sample"], x)
        return x


class Kandinsky3ResNetBlock(Module):
    def __init__(self, in_channels, out_channels, time_embed_dim, norm_groups=32,
                 compression_ratio=2, up_resolutions=None):
        super().__init__()
        up_resolutions = up_resolutions if up_resolutions is not None else 4 * [None]
        kernel_sizes = [1, 3, 3, 1]
        hidden_channel = max(in_channels, out_channels) // compression_ratio
        hidden_channels = (
            [(in_channels, hidden_channel)] + [(hidden_channel, hidden_channel)] * 2
            + [(hidden_channel, out_channels)]
        )
        self.resnet_blocks = ModuleList([
            Kandinsky3Block(ic, oc, time_embed_dim, ks, norm_groups, ur)
            for (ic, oc), ks, ur in zip(hidden_channels, kernel_sizes, up_resolutions)
        ])
        self.has_up = True in up_resolutions
        self.has_down = False in up_resolutions
        self.has_proj = in_channels != out_channels
        if self.has_up:
            self.shortcut_up_sample = ConvTranspose2d(in_channels, in_channels, kernel_size=2, stride=2)
        if self.has_proj:
            self.shortcut_projection = Conv2d(in_channels, out_channels, kernel_size=1)
        if self.has_down:
            self.shortcut_down_sample = Conv2d(out_channels, out_channels, kernel_size=2, stride=2)

    def __call__(self, params, x, time_embed):
        out = x
        for i, block in enumerate(self.resnet_blocks):
            out = block(params["resnet_blocks"][i], out, time_embed)
        if self.has_up:
            x = self.shortcut_up_sample(params["shortcut_up_sample"], x)
        if self.has_proj:
            x = self.shortcut_projection(params["shortcut_projection"], x)
        if self.has_down:
            x = self.shortcut_down_sample(params["shortcut_down_sample"], x)
        return x + out


class Kandinsky3AttentionPooling(Module):
    def __init__(self, num_channels, context_dim, head_dim=64):
        super().__init__()
        self.attention = _K3Attention(context_dim, context_dim, head_dim, num_channels)

    def __call__(self, params, x, context, context_additive_mask=None):
        query = jnp.mean(context, axis=1, keepdims=True)
        out = self.attention(params["attention"], query, context, context_additive_mask)
        return x + out[:, 0]


class Kandinsky3AttentionBlock(Module):
    def __init__(self, num_channels, time_embed_dim, context_dim=None, norm_groups=32,
                 head_dim=64, expansion_ratio=4):
        super().__init__()
        self.in_norm = Kandinsky3ConditionalGroupNorm(norm_groups, num_channels, time_embed_dim)
        self.attention = _K3Attention(num_channels, context_dim or num_channels, head_dim, num_channels)
        hidden_channels = expansion_ratio * num_channels
        self.out_norm = Kandinsky3ConditionalGroupNorm(norm_groups, num_channels, time_embed_dim)
        self.feed_forward = ModuleList([
            Conv2d(num_channels, hidden_channels, kernel_size=1, use_bias=False),
            _Identity(),
            Conv2d(hidden_channels, num_channels, kernel_size=1, use_bias=False),
        ])

    def __call__(self, params, x, time_embed, context=None, context_additive_mask=None):
        B, H, W, C = x.shape
        out = self.in_norm(params["in_norm"], x, time_embed)
        out = out.reshape(B, H * W, C)
        ctx = context if context is not None else out
        mask = context_additive_mask if context is not None else None
        out = self.attention(params["attention"], out, ctx, mask)
        x = x + out.reshape(B, H, W, C)

        out = self.out_norm(params["out_norm"], x, time_embed)
        out = self.feed_forward[0](params["feed_forward"][0], out)
        out = jax.nn.silu(out)
        out = self.feed_forward[2](params["feed_forward"][2], out)
        return x + out


class Kandinsky3DownSampleBlock(Module):
    def __init__(self, in_channels, out_channels, time_embed_dim, context_dim=None, num_blocks=3,
                 groups=32, head_dim=64, expansion_ratio=4, compression_ratio=2,
                 down_sample=True, self_attention=True):
        super().__init__()
        self.self_attention = self_attention
        self.context_dim = context_dim
        attentions = []
        resnets_in = []
        resnets_out = []
        if self_attention:
            attentions.append(Kandinsky3AttentionBlock(
                in_channels, time_embed_dim, None, groups, head_dim, expansion_ratio))
        else:
            attentions.append(_Identity())
        up_resolutions = [[None] * 4] * (num_blocks - 1) + [[None, None, False if down_sample else None, None]]
        hidden_channels = [(in_channels, out_channels)] + [(out_channels, out_channels)] * (num_blocks - 1)
        for (ic, oc), ur in zip(hidden_channels, up_resolutions):
            resnets_in.append(Kandinsky3ResNetBlock(ic, oc, time_embed_dim, groups, compression_ratio))
            if context_dim is not None:
                attentions.append(Kandinsky3AttentionBlock(
                    oc, time_embed_dim, context_dim, groups, head_dim, expansion_ratio))
            else:
                attentions.append(_Identity())
            resnets_out.append(Kandinsky3ResNetBlock(oc, oc, time_embed_dim, groups, compression_ratio, ur))
        self.attentions = ModuleList(attentions)
        self.resnets_in = ModuleList(resnets_in)
        self.resnets_out = ModuleList(resnets_out)

    def __call__(self, params, x, time_embed, context=None, context_mask=None):
        if self.self_attention:
            x = self.attentions[0](params["attentions"][0], x, time_embed)
        for i in range(len(self.resnets_in)):
            x = self.resnets_in[i](params["resnets_in"][i], x, time_embed)
            if self.context_dim is not None:
                x = self.attentions[i + 1](params["attentions"][i + 1], x, time_embed, context, context_mask)
            x = self.resnets_out[i](params["resnets_out"][i], x, time_embed)
        return x


class Kandinsky3UpSampleBlock(Module):
    def __init__(self, in_channels, cat_dim, out_channels, time_embed_dim, context_dim=None,
                 num_blocks=3, groups=32, head_dim=64, expansion_ratio=4, compression_ratio=2,
                 up_sample=True, self_attention=True):
        super().__init__()
        self.self_attention = self_attention
        self.context_dim = context_dim
        up_resolutions = [[None, True if up_sample else None, None, None]] + [[None] * 4] * (num_blocks - 1)
        hidden_channels = (
            [(in_channels + cat_dim, in_channels)]
            + [(in_channels, in_channels)] * (num_blocks - 2)
            + [(in_channels, out_channels)]
        )
        attentions = []
        resnets_in = []
        resnets_out = []
        if self_attention:
            attentions.append(Kandinsky3AttentionBlock(
                out_channels, time_embed_dim, None, groups, head_dim, expansion_ratio))
        else:
            attentions.append(_Identity())
        for (ic, oc), ur in zip(hidden_channels, up_resolutions):
            resnets_in.append(Kandinsky3ResNetBlock(ic, ic, time_embed_dim, groups, compression_ratio, ur))
            if context_dim is not None:
                attentions.append(Kandinsky3AttentionBlock(
                    ic, time_embed_dim, context_dim, groups, head_dim, expansion_ratio))
            else:
                attentions.append(_Identity())
            resnets_out.append(Kandinsky3ResNetBlock(ic, oc, time_embed_dim, groups, compression_ratio))
        self.attentions = ModuleList(attentions)
        self.resnets_in = ModuleList(resnets_in)
        self.resnets_out = ModuleList(resnets_out)

    def __call__(self, params, x, time_embed, context=None, context_mask=None):
        for i in range(len(self.resnets_in)):
            x = self.resnets_in[i](params["resnets_in"][i], x, time_embed)
            if self.context_dim is not None:
                x = self.attentions[i + 1](params["attentions"][i + 1], x, time_embed, context, context_mask)
            x = self.resnets_out[i](params["resnets_out"][i], x, time_embed)
        if self.self_attention:
            x = self.attentions[0](params["attentions"][0], x, time_embed)
        return x


class Kandinsky3UNet(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 4,
        time_embedding_dim: int = 1536,
        groups: int = 32,
        attention_head_dim: int = 64,
        layers_per_block: Union[int, Tuple[int]] = 3,
        block_out_channels: Tuple[int, ...] = (384, 768, 1536, 3072),
        cross_attention_dim: Union[int, Tuple[int]] = 4096,
        encoder_hid_dim: int = 4096,
    ):
        super().__init__()
        expansion_ratio = 4
        compression_ratio = 2
        add_cross_attention = (False, True, True, True)
        add_self_attention = (False, True, True, True)

        out_channels = in_channels
        init_channels = block_out_channels[0] // 2
        self.time_proj = Timesteps(init_channels, flip_sin_to_cos=False, downscale_freq_shift=1)
        self.time_embedding = TimestepEmbedding(init_channels, time_embedding_dim)
        self.add_time_condition = Kandinsky3AttentionPooling(
            time_embedding_dim, cross_attention_dim, attention_head_dim
        )
        self.conv_in = Conv2d(in_channels, init_channels, kernel_size=3, padding=1)
        self.encoder_hid_proj = Kandinsky3EncoderProj(encoder_hid_dim, cross_attention_dim)

        hidden_dims = [init_channels] + list(block_out_channels)
        in_out_dims = list(zip(hidden_dims[:-1], hidden_dims[1:]))
        text_dims = [cross_attention_dim if ok else None for ok in add_cross_attention]
        num_blocks = len(block_out_channels) * [layers_per_block]
        self.num_levels = len(in_out_dims)

        cat_dims = []
        down_blocks = []
        for level, ((in_dim, out_dim), nb, text_dim, sa) in enumerate(
            zip(in_out_dims, num_blocks, text_dims, add_self_attention)
        ):
            down_sample = level != (self.num_levels - 1)
            cat_dims.append(out_dim if level != (self.num_levels - 1) else 0)
            down_blocks.append(Kandinsky3DownSampleBlock(
                in_dim, out_dim, time_embedding_dim, text_dim, nb, groups, attention_head_dim,
                expansion_ratio, compression_ratio, down_sample, sa,
            ))
        self.down_blocks = ModuleList(down_blocks)

        up_blocks = []
        for level, ((out_dim, in_dim), nb, text_dim, sa) in enumerate(
            zip(reversed(in_out_dims), reversed(num_blocks), reversed(text_dims),
                reversed(add_self_attention))
        ):
            up_sample = level != 0
            up_blocks.append(Kandinsky3UpSampleBlock(
                in_dim, cat_dims.pop(), out_dim, time_embedding_dim, text_dim, nb, groups,
                attention_head_dim, expansion_ratio, compression_ratio, up_sample, sa,
            ))
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(groups, init_channels)
        self.conv_out = Conv2d(init_channels, out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, sample: jax.Array, timestep,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 encoder_attention_mask: Optional[jax.Array] = None,
                 return_dict: bool = True):
        additive_mask = None
        if encoder_attention_mask is not None:
            additive_mask = (1 - encoder_attention_mask.astype(sample.dtype)) * -10000.0
            additive_mask = additive_mask[:, None, :]  # [B, 1, S]

        timesteps = jnp.atleast_1d(jnp.asarray(timestep))
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        time_embed = self.time_embedding(
            params["time_embedding"], self.time_proj({}, timesteps).astype(sample.dtype)
        )
        encoder_hidden_states = self.encoder_hid_proj(params["encoder_hid_proj"], encoder_hidden_states)
        if encoder_hidden_states is not None:
            time_embed = self.add_time_condition(
                params["add_time_condition"], time_embed, encoder_hidden_states, additive_mask
            )

        x = jnp.transpose(sample, (0, 2, 3, 1))
        x = self.conv_in(params["conv_in"], x)
        skips = []
        for level, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][level], x, time_embed, encoder_hidden_states, additive_mask)
            if level != self.num_levels - 1:
                skips.append(x)
        for level, block in enumerate(self.up_blocks):
            if level != 0:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = block(params["up_blocks"][level], x, time_embed, encoder_hidden_states, additive_mask)

        x = self.conv_norm_out(params["conv_norm_out"], x)
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)
        out = jnp.transpose(x, (0, 3, 1, 2))
        if not return_dict:
            return (out,)
        return Kandinsky3UNetOutput(sample=out)

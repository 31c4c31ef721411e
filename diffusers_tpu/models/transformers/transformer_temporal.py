"""Temporal transformers operating over the frame axis.

Behavioral mirror of the reference AnimateDiff motion module
(`/root/reference/src/diffusers/models/unets/unet_motion_model.py:63`
``AnimateDiffTransformer3D``) and of
`/root/reference/src/diffusers/models/transformers/transformer_temporal.py:40`
(``TransformerTemporalModel``, used by the text-to-video-synthesis UNet3D).

TPU design notes: the module runs on NHWC activations ``[B*F, H, W, C]`` with a
static ``num_frames``; every pixel becomes an independent length-``F`` sequence
``[(B H W), F, C]``, which keeps the attention batched and MXU-friendly. The
group norm is taken over ``(F, H, W, C/G)`` — frames included — matching the
reference's ``(B, C, F, H, W)`` GroupNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.module import GroupNorm, Linear, Module, ModuleList, Params
from ..attention_blocks import BasicTransformerBlock


class AnimateDiffTransformer3D(Module):
    """Per-pixel temporal transformer with residual connection."""

    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        num_layers: int = 1,
        norm_num_groups: int = 32,
        cross_attention_dim: Optional[int] = None,
        attention_bias: bool = False,
        activation_fn: str = "geglu",
        norm_elementwise_affine: bool = True,
        double_self_attention: bool = True,
        positional_embeddings: Optional[str] = None,
        num_positional_embeddings: Optional[int] = None,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels

        self.norm = GroupNorm(num_groups=norm_num_groups, num_channels=in_channels, eps=1e-6)
        self.proj_in = Linear(in_channels, inner_dim)
        self.transformer_blocks = ModuleList(
            [
                BasicTransformerBlock(
                    inner_dim,
                    num_attention_heads,
                    attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    activation_fn=activation_fn,
                    attention_bias=attention_bias,
                    double_self_attention=double_self_attention,
                    norm_elementwise_affine=norm_elementwise_affine,
                    positional_embeddings=positional_embeddings,
                    num_positional_embeddings=num_positional_embeddings,
                )
                for _ in range(num_layers)
            ]
        )
        self.proj_out = Linear(inner_dim, in_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B*F, H, W, C] (NHWC)
        num_frames: int = 1,
        encoder_hidden_states: Optional[jax.Array] = None,
    ) -> jax.Array:
        batch_frames, height, width, channel = hidden_states.shape
        batch_size = batch_frames // num_frames
        residual = hidden_states

        # group norm with stats over (frames, H, W, C/G): fold frames into a
        # spatial axis so GroupNorm's per-sample reduction covers them
        h = hidden_states.reshape(batch_size, num_frames * height, width, channel)
        h = self.norm(params["norm"], h)
        # [(B), F, H, W, C] -> [(B H W), F, C]
        h = h.reshape(batch_size, num_frames, height, width, channel)
        h = jnp.transpose(h, (0, 2, 3, 1, 4)).reshape(batch_size * height * width, num_frames, channel)

        h = self.proj_in(params["proj_in"], h)
        for i, block in enumerate(self.transformer_blocks):
            h = block(params["transformer_blocks"][i], h, encoder_hidden_states=encoder_hidden_states)
        h = self.proj_out(params["proj_out"], h)

        h = h.reshape(batch_size, height, width, num_frames, channel)
        h = jnp.transpose(h, (0, 3, 1, 2, 4)).reshape(batch_frames, height, width, channel)
        return h + residual


class TransformerTemporalModel(AnimateDiffTransformer3D):
    """Per-pixel temporal transformer used by the text-to-video-synthesis
    UNet3D (reference `transformer_temporal.py:41`). Same parameter layout
    and math as the AnimateDiff motion module (norm → proj_in → blocks →
    proj_out + residual over ``[(B H W), F, C]`` sequences); the reference
    classes differ only in config plumbing, so this is a thin subclass."""


# --------------------------------------------------------------------------
# SVD spatio-temporal transformer (reference models/attention.py:1133 and
# models/transformers/transformer_temporal.py:205)


class TemporalBasicTransformerBlock(Module):
    """ff_in → self-attn → cross-attn → ff over per-pixel frame sequences."""

    def __init__(self, dim: int, time_mix_inner_dim: int, num_attention_heads: int,
                 attention_head_dim: int, cross_attention_dim: Optional[int] = None):
        super().__init__()
        from ..attention import Attention
        from ..attention_blocks import FeedForward
        from ...ops.module import LayerNorm

        self.is_res = dim == time_mix_inner_dim
        self.norm_in = LayerNorm(dim)
        self.ff_in = FeedForward(dim, dim_out=time_mix_inner_dim, activation_fn="geglu")
        self.norm1 = LayerNorm(time_mix_inner_dim)
        self.attn1 = Attention(query_dim=time_mix_inner_dim, heads=num_attention_heads,
                               dim_head=attention_head_dim, cross_attention_dim=None)
        if cross_attention_dim is not None:
            self.norm2 = LayerNorm(time_mix_inner_dim)
            self.attn2 = Attention(query_dim=time_mix_inner_dim, cross_attention_dim=cross_attention_dim,
                                   heads=num_attention_heads, dim_head=attention_head_dim)
        else:
            self.norm2 = None
            self.attn2 = None
        self.norm3 = LayerNorm(time_mix_inner_dim)
        self.ff = FeedForward(time_mix_inner_dim, activation_fn="geglu")

    def __call__(self, params: Params, hidden_states: jax.Array, num_frames: int,
                 encoder_hidden_states: Optional[jax.Array] = None) -> jax.Array:
        batch_frames, seq_length, channels = hidden_states.shape
        batch_size = batch_frames // num_frames
        h = hidden_states.reshape(batch_size, num_frames, seq_length, channels)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(batch_size * seq_length, num_frames, channels)

        residual = h
        h = self.norm_in(params["norm_in"], h)
        h = self.ff_in(params["ff_in"], h)
        if self.is_res:
            h = h + residual

        norm_h = self.norm1(params["norm1"], h)
        h = self.attn1(params["attn1"], norm_h) + h
        if self.attn2 is not None:
            norm_h = self.norm2(params["norm2"], h)
            h = self.attn2(params["attn2"], norm_h, encoder_hidden_states=encoder_hidden_states) + h
        norm_h = self.norm3(params["norm3"], h)
        ff_out = self.ff(params["ff"], norm_h)
        h = ff_out + h if self.is_res else ff_out

        h = h.reshape(batch_size, seq_length, num_frames, channels)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(batch_frames, seq_length, channels)
        return h


class TransformerSpatioTemporalModel(Module):
    """Interleaved spatial + temporal transformer with learned time mixing
    (reference transformer_temporal.py:205). NHWC input [B*F, H, W, C]."""

    def __init__(self, num_attention_heads: int = 16, attention_head_dim: int = 88,
                 in_channels: int = 320, out_channels: Optional[int] = None,
                 num_layers: int = 1, cross_attention_dim: Optional[int] = None):
        super().__init__()
        from ..embeddings import TimestepEmbedding, Timesteps
        from ..resnet import AlphaBlender

        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.in_channels = in_channels
        self.norm = GroupNorm(num_groups=32, num_channels=in_channels, eps=1e-6)
        self.proj_in = Linear(in_channels, inner_dim)
        self.transformer_blocks = ModuleList(
            [
                BasicTransformerBlock(inner_dim, num_attention_heads, attention_head_dim,
                                      cross_attention_dim=cross_attention_dim)
                for _ in range(num_layers)
            ]
        )
        self.temporal_transformer_blocks = ModuleList(
            [
                TemporalBasicTransformerBlock(inner_dim, inner_dim, num_attention_heads,
                                              attention_head_dim, cross_attention_dim=cross_attention_dim)
                for _ in range(num_layers)
            ]
        )
        time_embed_dim = in_channels * 4
        self.time_pos_embed = TimestepEmbedding(in_channels, time_embed_dim, out_dim=in_channels)
        self.time_proj = Timesteps(in_channels, True, 0)
        self.time_mixer = AlphaBlender(alpha=0.5, merge_strategy="learned_with_images")
        self.proj_out = Linear(inner_dim, in_channels)

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 image_only_indicator: Optional[jax.Array] = None) -> jax.Array:
        batch_frames, height, width, channels = hidden_states.shape
        num_frames = image_only_indicator.shape[-1]
        batch_size = batch_frames // num_frames

        # temporal cross-attn context: first frame's encoder states broadcast
        # to every pixel (reference transformer_temporal.py:316-323)
        time_context = encoder_hidden_states.reshape(
            batch_size, num_frames, -1, encoder_hidden_states.shape[-1]
        )[:, 0]
        time_context = jnp.broadcast_to(
            time_context[:, None],
            (batch_size, height * width, time_context.shape[-2], time_context.shape[-1]),
        ).reshape(batch_size * height * width, -1, encoder_hidden_states.shape[-1])

        residual = hidden_states
        h = self.norm(params["norm"], hidden_states)
        h = h.reshape(batch_frames, height * width, channels)
        h = self.proj_in(params["proj_in"], h)

        frame_ids = jnp.tile(jnp.arange(num_frames), (batch_size,))
        t_emb = self.time_proj({}, frame_ids).astype(h.dtype)
        emb = self.time_pos_embed(params["time_pos_embed"], t_emb)[:, None, :]

        for i in range(len(self.transformer_blocks)):
            h = self.transformer_blocks[i](
                params["transformer_blocks"][i], h, encoder_hidden_states=encoder_hidden_states
            )
            h_mix = h + emb
            h_mix = self.temporal_transformer_blocks[i](
                params["temporal_transformer_blocks"][i], h_mix, num_frames=num_frames,
                encoder_hidden_states=time_context,
            )
            h = self.time_mixer(params["time_mixer"], h, h_mix, image_only_indicator=image_only_indicator)

        h = self.proj_out(params["proj_out"], h)
        h = h.reshape(batch_frames, height, width, self.inner_dim)
        return h + residual

"""Transformer2DModel — the spatial transformer wrapper used inside
cross-attention UNet blocks.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_2d.py`,
continuous-input path): GroupNorm → proj_in → N×BasicTransformerBlock →
proj_out + residual. On NHWC activations; proj_in/out are 1x1 convs or
linears depending on `use_linear_projection` (both reduce to a matmul over
the channel axis in NHWC, so we always use the linear form internally and
load conv [O,I,1,1] weights by squeezing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.module import Conv2d, GroupNorm, Linear, Module, ModuleList, Params
from ..attention_blocks import BasicTransformerBlock


class Transformer2DModel(Module):
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
        only_cross_attention: bool = False,
        double_self_attention: bool = False,
        use_linear_projection: bool = False,
        norm_elementwise_affine: bool = True,
        norm_eps: float = 1e-5,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels
        self.use_linear_projection = use_linear_projection

        self.norm = GroupNorm(num_groups=norm_num_groups, num_channels=in_channels, eps=1e-6)
        if use_linear_projection:
            self.proj_in = Linear(in_channels, inner_dim)
            self.proj_out = Linear(inner_dim, in_channels)
        else:
            self.proj_in = Conv2d(in_channels, inner_dim, kernel_size=1, stride=1, padding=0)
            self.proj_out = Conv2d(inner_dim, in_channels, kernel_size=1, stride=1, padding=0)

        self.transformer_blocks = ModuleList(
            [
                BasicTransformerBlock(
                    inner_dim,
                    num_attention_heads,
                    attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    activation_fn=activation_fn,
                    attention_bias=attention_bias,
                    only_cross_attention=only_cross_attention,
                    double_self_attention=double_self_attention,
                    norm_elementwise_affine=norm_elementwise_affine,
                    norm_eps=norm_eps,
                )
                for _ in range(num_layers)
            ]
        )

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # NHWC
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
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
            hidden_states = block(
                params["transformer_blocks"][i],
                hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )

        if self.use_linear_projection:
            hidden_states = self.proj_out(params["proj_out"], hidden_states)
            hidden_states = hidden_states.reshape(b, h, w, c)
        else:
            hidden_states = hidden_states.reshape(b, h, w, hidden_states.shape[-1])
            hidden_states = self.proj_out(params["proj_out"], hidden_states)

        return hidden_states + residual

"""Transformer building blocks: FeedForward (GEGLU family) and
BasicTransformerBlock.

Behavioral mirror of the reference `models/attention.py`
(FeedForward `:1682`, BasicTransformerBlock `:752`) and
`models/activations.py` (GELU `:65`, GEGLU `:93`, SwiGLU `:126`). Param
subtree names (norm1/attn1/norm2/attn2/norm3/ff.net.0.proj/ff.net.2) match
reference state-dict keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.module import LayerNorm, Linear, Module, ModuleList, Params
from .attention import Attention


def _sinusoidal_pe(seq_len: int, dim: int) -> jax.Array:
    """Interleaved sin/cos table (reference embeddings.py
    SinusoidalPositionalEmbedding:1360); constant-folded under jit."""
    import math

    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((seq_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class GELUProj(Module):
    """Linear + GELU (reference activations.GELU)."""

    def __init__(self, dim_in: int, dim_out: int, approximate: str = "none", bias: bool = True):
        super().__init__()
        self.proj = Linear(dim_in, dim_out, use_bias=bias)
        self.approximate = approximate

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.proj(params["proj"], x)
        return jax.nn.gelu(x, approximate=self.approximate == "tanh")


class GEGLU(Module):
    """Linear to 2x width, gate with GELU (reference activations.GEGLU)."""

    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = Linear(dim_in, dim_out * 2, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.proj(params["proj"], x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class SwiGLU(Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = Linear(dim_in, dim_out * 2, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.proj(params["proj"], x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.silu(gate)


class ApproximateGELU(Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True):
        super().__init__()
        self.proj = Linear(dim_in, dim_out, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.proj(params["proj"], x)
        return x * jax.nn.sigmoid(1.702 * x)


class LinearActivation(Module):
    def __init__(self, dim_in: int, dim_out: int, bias: bool = True, activation: str = "silu"):
        super().__init__()
        self.proj = Linear(dim_in, dim_out, use_bias=bias)
        self.activation = activation

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.proj(params["proj"], x)
        return jax.nn.silu(x) if self.activation == "silu" else x


class _PassThrough(Module):
    """Placeholder for dropout slots in `ff.net` so indices match checkpoints."""

    def init(self, key, dtype=jnp.float32):
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return x


class FeedForward(Module):
    def __init__(
        self,
        dim: int,
        dim_out: Optional[int] = None,
        mult: int = 4,
        activation_fn: str = "geglu",
        inner_dim: Optional[int] = None,
        bias: bool = True,
    ):
        super().__init__()
        inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim

        if activation_fn == "gelu":
            act = GELUProj(dim, inner_dim, bias=bias)
        elif activation_fn == "gelu-approximate":
            act = GELUProj(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "geglu":
            act = GEGLU(dim, inner_dim, bias=bias)
        elif activation_fn == "geglu-approximate":
            act = ApproximateGELU(dim, inner_dim, bias=bias)
        elif activation_fn == "swiglu":
            act = SwiGLU(dim, inner_dim, bias=bias)
        elif activation_fn == "linear-silu":
            act = LinearActivation(dim, inner_dim, bias=bias, activation="silu")
        else:
            raise ValueError(f"unsupported activation_fn {activation_fn}")

        # net.0 = act, net.1 = dropout (no-op), net.2 = out linear
        self.net = ModuleList([act, _PassThrough(), Linear(inner_dim, dim_out, use_bias=bias)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.net[0](params["net"][0], x)
        x = self.net[2](params["net"][2], x)
        return x


class BasicTransformerBlock(Module):
    """self-attn → cross-attn → FF, layer_norm variant (SD/SDXL UNets)."""

    def __init__(
        self,
        dim: int,
        num_attention_heads: int,
        attention_head_dim: int,
        cross_attention_dim: Optional[int] = None,
        activation_fn: str = "geglu",
        attention_bias: bool = False,
        only_cross_attention: bool = False,
        double_self_attention: bool = False,
        norm_elementwise_affine: bool = True,
        norm_eps: float = 1e-5,
        ff_inner_dim: Optional[int] = None,
        ff_bias: bool = True,
        attention_out_bias: bool = True,
        positional_embeddings: Optional[str] = None,
        num_positional_embeddings: Optional[int] = None,
        norm_type: str = "layer_norm",
        num_embeds_ada_norm: Optional[int] = None,
    ):
        super().__init__()
        self.only_cross_attention = only_cross_attention
        self.norm_type = norm_type
        if norm_type not in ("layer_norm", "ada_norm"):
            raise NotImplementedError(f"BasicTransformerBlock norm_type {norm_type!r} not supported")
        if positional_embeddings is not None and positional_embeddings != "sinusoidal":
            raise NotImplementedError(f"positional_embeddings {positional_embeddings!r} not supported")
        # AnimateDiff temporal blocks add a parameter-free sinusoidal table to
        # the normed hidden states before attn1/attn2 (reference
        # models/attention.py:849,998 + embeddings.py SinusoidalPositionalEmbedding)
        self.positional_embeddings = positional_embeddings
        self.num_positional_embeddings = num_positional_embeddings

        if norm_type == "ada_norm":
            # timestep-lookup AdaLN (VQ-Diffusion; reference attention.py:855)
            from .normalization import AdaLayerNorm

            self.norm1 = AdaLayerNorm(dim, num_embeddings=num_embeds_ada_norm)
        else:
            self.norm1 = LayerNorm(dim, eps=norm_eps, use_scale=norm_elementwise_affine, use_bias=norm_elementwise_affine)
        self.attn1 = Attention(
            query_dim=dim,
            heads=num_attention_heads,
            dim_head=attention_head_dim,
            bias=attention_bias,
            cross_attention_dim=cross_attention_dim if only_cross_attention else None,
            out_bias=attention_out_bias,
        )

        if cross_attention_dim is not None or double_self_attention:
            if norm_type == "ada_norm":
                from .normalization import AdaLayerNorm

                self.norm2 = AdaLayerNorm(dim, num_embeddings=num_embeds_ada_norm)
            else:
                self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=norm_elementwise_affine, use_bias=norm_elementwise_affine)
            self.attn2 = Attention(
                query_dim=dim,
                cross_attention_dim=cross_attention_dim if not double_self_attention else None,
                heads=num_attention_heads,
                dim_head=attention_head_dim,
                bias=attention_bias,
                out_bias=attention_out_bias,
            )
        else:
            self.norm2 = None
            self.attn2 = None

        self.norm3 = LayerNorm(dim, eps=norm_eps, use_scale=norm_elementwise_affine, use_bias=norm_elementwise_affine)
        self.ff = FeedForward(dim, activation_fn=activation_fn, inner_dim=ff_inner_dim, bias=ff_bias)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,
    ) -> jax.Array:
        # Skip Layer Guidance: trace-time identity flag (reference
        # hooks/layer_skip.py). See guiders/skip_layer_guidance.py.
        if getattr(self, "layer_skip", False):
            return hidden_states

        # IP-Adapter: encoder_hidden_states arrives as (text, ip_list) —
        # mirrors the reference's tuple contract (unet_2d_condition.py:975)
        ip_hidden_states = None
        if isinstance(encoder_hidden_states, tuple):
            encoder_hidden_states, ip_hidden_states = encoder_hidden_states

        # 1. self attention
        if self.norm_type == "ada_norm":
            norm_hidden = self.norm1(params["norm1"], hidden_states, timestep)
        else:
            norm_hidden = self.norm1(params["norm1"], hidden_states)
        if self.positional_embeddings is not None:
            norm_hidden = norm_hidden + _sinusoidal_pe(norm_hidden.shape[-2], norm_hidden.shape[-1]).astype(norm_hidden.dtype)
        attn_output = self.attn1(
            params["attn1"],
            norm_hidden,
            encoder_hidden_states=encoder_hidden_states if self.only_cross_attention else None,
            attention_mask=attention_mask,
        )
        hidden_states = attn_output + hidden_states

        # 2. cross attention
        if self.attn2 is not None:
            if self.norm_type == "ada_norm":
                norm_hidden = self.norm2(params["norm2"], hidden_states, timestep)
            else:
                norm_hidden = self.norm2(params["norm2"], hidden_states)
            if self.positional_embeddings is not None:
                norm_hidden = norm_hidden + _sinusoidal_pe(norm_hidden.shape[-2], norm_hidden.shape[-1]).astype(norm_hidden.dtype)
            attn_output = self.attn2(
                params["attn2"],
                norm_hidden,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
                ip_hidden_states=ip_hidden_states,
            )
            hidden_states = attn_output + hidden_states

        # 3. feed forward
        norm_hidden = self.norm3(params["norm3"], hidden_states)
        ff_output = self.ff(params["ff"], norm_hidden)
        hidden_states = ff_output + hidden_states
        return hidden_states

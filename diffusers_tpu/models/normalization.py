"""Adaptive normalization family (AdaLN-Zero etc.).

Behavioral mirror of the reference `models/normalization.py`
(AdaLayerNormZero `:?`, AdaLayerNormZeroSingle, AdaLayerNormContinuous) used
by DiT-family transformers (Flux/SD3/...). Param names (linear/norm) match
reference state dicts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.module import LayerNorm, Linear, Module, Params, RMSNorm


class AdaLayerNormZero(Module):
    """LayerNorm modulated by 6-way (shift/scale/gate ×2) projection of temb."""

    def __init__(self, embedding_dim: int, bias: bool = True):
        super().__init__()
        self.linear = Linear(embedding_dim, 6 * embedding_dim, use_bias=bias)
        self.norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array):
        emb = self.linear(params["linear"], jax.nn.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(emb, 6, axis=-1)
        x = self.norm({}, x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(Module):
    def __init__(self, embedding_dim: int, bias: bool = True):
        super().__init__()
        self.linear = Linear(embedding_dim, 3 * embedding_dim, use_bias=bias)
        self.norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array):
        emb = self.linear(params["linear"], jax.nn.silu(emb))
        shift_msa, scale_msa, gate_msa = jnp.split(emb, 3, axis=-1)
        x = self.norm({}, x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


class AdaLayerNormContinuous(Module):
    def __init__(
        self,
        embedding_dim: int,
        conditioning_embedding_dim: int,
        elementwise_affine: bool = True,
        eps: float = 1e-5,
        bias: bool = True,
        norm_type: str = "layer_norm",
    ):
        super().__init__()
        self.linear = Linear(conditioning_embedding_dim, embedding_dim * 2, use_bias=bias)
        if norm_type == "layer_norm":
            self.norm = LayerNorm(embedding_dim, eps=eps, use_scale=elementwise_affine, use_bias=elementwise_affine and bias)
        elif norm_type == "rms_norm":
            self.norm = RMSNorm(embedding_dim, eps=eps, use_scale=elementwise_affine)
        else:
            raise ValueError(f"unknown norm_type {norm_type}")
        self.elementwise_affine = elementwise_affine

    def __call__(self, params: Params, x: jax.Array, conditioning_embedding: jax.Array) -> jax.Array:
        emb = self.linear(params["linear"], jax.nn.silu(conditioning_embedding).astype(x.dtype))
        scale, shift = jnp.split(emb, 2, axis=-1)
        norm_params = params.get("norm", {})
        return self.norm(norm_params, x) * (1 + scale[:, None, :]) + shift[:, None, :]


class AdaLayerNorm(Module):
    """Single-modulation AdaLN: norm(x) * (1+scale) + shift (reference
    normalization.AdaLayerNorm with output_dim=2*dim, norm without affine)."""

    def __init__(self, embedding_dim: int, output_dim: Optional[int] = None, norm_eps: float = 1e-5,
                 chunk_dim: int = 0, elementwise_affine: bool = False,
                 num_embeddings: Optional[int] = None):
        super().__init__()
        from ..ops.module import Embedding

        output_dim = output_dim or embedding_dim * 2
        self.chunk_dim = chunk_dim
        # timestep-index lookup table (reference AdaLayerNorm num_embeddings
        # mode, used by VQ-Diffusion/DiT-style ada_norm blocks)
        self.emb = Embedding(num_embeddings, embedding_dim) if num_embeddings is not None else None
        self.linear = Linear(embedding_dim, output_dim)
        self.norm = LayerNorm(output_dim // 2, eps=norm_eps,
                              use_scale=elementwise_affine, use_bias=elementwise_affine)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array) -> jax.Array:
        if self.emb is not None:
            temb = self.emb(params["emb"], jnp.asarray(temb, jnp.int32))
        temb = self.linear(params["linear"], jax.nn.silu(temb))
        if self.chunk_dim == 1:
            shift, scale = jnp.split(temb, 2, axis=1)
            shift = shift[:, None, :]
            scale = scale[:, None, :]
        else:
            scale, shift = jnp.split(temb, 2, axis=0)
        return self.norm(params.get("norm", {}), x) * (1 + scale) + shift

"""First-block cache (FBC) as explicit scan-carry state.

TPU-native counterpart of the reference's hook-based FBC
(`/root/reference/src/diffusers/hooks/first_block_cache.py:33`
FirstBlockCacheConfig, head/tail hooks `:66-258`): when the first transformer
block's residual barely changes between denoise steps (relative abs-mean diff
below `threshold`), the remaining blocks are skipped and the cached
tail-residual is reused.

The reference mutates shared hook state per forward, which cannot live inside
a compiled loop. Here the cache is an explicit pytree carried through
`lax.scan`, and the skip decision is a traced `lax.cond` — both branches are
compiled once, only one executes per step, so skipped steps genuinely save
the tail-blocks' FLOPs on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FirstBlockCacheConfig:
    """threshold: higher → more aggressive caching (reference default 0.05)."""

    threshold: float = 0.05


@flax.struct.dataclass
class FBCState:
    prev_first_residual: jax.Array  # first block's hidden-state residual at last computed step
    tail_residual_hidden: jax.Array  # final_hidden − after_first_hidden at last computed step
    tail_residual_context: jax.Array
    valid: jax.Array  # bool scalar — becomes True after the first computed step


def init_fbc_state(hidden_shape, context_shape, dtype=jnp.float32) -> FBCState:
    return FBCState(
        prev_first_residual=jnp.zeros(hidden_shape, dtype=dtype),
        tail_residual_hidden=jnp.zeros(hidden_shape, dtype=dtype),
        tail_residual_context=jnp.zeros(context_shape, dtype=dtype),
        valid=jnp.asarray(False),
    )


# ---------------------------------------------------------------------------
# generic single-stream FBC (round 4): models with one homogeneous block
# stack over a single hidden stream (Wan/SD3/LTX...) take `fbc_state` +
# `fbc_config` in their __call__ and run the head/tail split in place —
# reference hook pair first_block_cache.py:66-258, re-expressed as scan-carry
# state + lax.cond so skipped steps genuinely save the tail blocks' FLOPs.
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class FBCSingleState:
    prev_first_residual: jax.Array  # first block's residual at last computed step
    tail_residual: jax.Array  # final_hidden − after_first_hidden at last computed step
    valid: jax.Array  # bool scalar — True after the first computed step


def init_fbc_single_state(hidden_shape, dtype=jnp.float32) -> FBCSingleState:
    return FBCSingleState(
        prev_first_residual=jnp.zeros(hidden_shape, dtype=dtype),
        tail_residual=jnp.zeros(hidden_shape, dtype=dtype),
        valid=jnp.asarray(False),
    )


def fbc_should_compute(state, config: FirstBlockCacheConfig, first_residual: jax.Array):
    """Traced skip decision (reference `:66` head hook): relative abs-mean
    change of the first block's residual vs the last computed step."""
    diff = jnp.mean(jnp.abs(first_residual - state.prev_first_residual))
    prev_mean = jnp.mean(jnp.abs(state.prev_first_residual))
    rel = diff / jnp.maximum(prev_mean, 1e-12)
    return (~state.valid) | (rel > config.threshold)


def fbc_single_gate(state: FBCSingleState, config: FirstBlockCacheConfig,
                    first_residual: jax.Array, hidden: jax.Array, tail_fn):
    """Run `tail_fn(hidden) -> final_hidden` or replay the cached tail
    residual. Returns (final_hidden, new_state)."""
    should = fbc_should_compute(state, config, first_residual)

    def compute(h):
        out = tail_fn(h)
        return out, out - h

    def reuse(h):
        return h + state.tail_residual, state.tail_residual

    hidden, tail_residual = jax.lax.cond(should, compute, reuse, hidden)
    new_state = FBCSingleState(
        prev_first_residual=jnp.where(should, first_residual, state.prev_first_residual),
        tail_residual=tail_residual,
        valid=jnp.asarray(True),
    )
    return hidden, new_state


def flux_forward_with_fbc(
    model,
    params,
    fbc_state: FBCState,
    config: FirstBlockCacheConfig,
    hidden_states: jax.Array,
    encoder_hidden_states: jax.Array,
    pooled_projections: jax.Array,
    timestep: jax.Array,
    image_rotary_emb: Tuple[jax.Array, jax.Array],
    guidance: Optional[jax.Array] = None,
) -> Tuple[jax.Array, FBCState]:
    """FluxTransformer2DModel forward with first-block caching.

    Returns (sample, new_fbc_state). Mirrors the model's __call__
    (transformer_flux.py) with the block loop split head/tail.
    """
    hidden = model.x_embedder(params["x_embedder"], hidden_states)
    timestep_scaled = timestep.astype(hidden.dtype) * 1000
    if guidance is not None:
        guidance = guidance.astype(hidden.dtype) * 1000
        temb = model.time_text_embed(params["time_text_embed"], timestep_scaled, guidance, pooled_projections)
    else:
        temb = model.time_text_embed(params["time_text_embed"], timestep_scaled, pooled_projections)
    context = model.context_embedder(params["context_embedder"], encoder_hidden_states)

    # head: first dual block
    first_in_hidden = hidden
    context, hidden = model.transformer_blocks[0](
        params["transformer_blocks"][0], hidden, context, temb, image_rotary_emb
    )
    first_residual = hidden - first_in_hidden

    # skip decision (traced)
    diff = jnp.mean(jnp.abs(first_residual - fbc_state.prev_first_residual))
    prev_mean = jnp.mean(jnp.abs(fbc_state.prev_first_residual))
    rel = diff / jnp.maximum(prev_mean, 1e-12)
    should_compute = (~fbc_state.valid) | (rel > config.threshold)

    def compute_tail(operands):
        hidden, context = operands
        after_first_hidden, after_first_context = hidden, context
        for i, block in enumerate(model.transformer_blocks):
            if i == 0:
                continue
            context, hidden = block(params["transformer_blocks"][i], hidden, context, temb, image_rotary_emb)
        for i, block in enumerate(model.single_transformer_blocks):
            context, hidden = block(params["single_transformer_blocks"][i], hidden, context, temb, image_rotary_emb)
        return (
            hidden,
            context,
            hidden - after_first_hidden,
            context - after_first_context,
        )

    def reuse_tail(operands):
        hidden, context = operands
        return (
            hidden + fbc_state.tail_residual_hidden,
            context + fbc_state.tail_residual_context,
            fbc_state.tail_residual_hidden,
            fbc_state.tail_residual_context,
        )

    hidden, context, tail_res_h, tail_res_c = jax.lax.cond(
        should_compute, compute_tail, reuse_tail, (hidden, context)
    )

    new_state = FBCState(
        prev_first_residual=jnp.where(should_compute, first_residual, fbc_state.prev_first_residual),
        tail_residual_hidden=tail_res_h,
        tail_residual_context=tail_res_c,
        valid=jnp.asarray(True),
    )

    hidden = model.norm_out(params["norm_out"], hidden, temb)
    sample = model.proj_out(params["proj_out"], hidden)
    return sample, new_state

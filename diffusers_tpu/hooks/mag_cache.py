"""MagCache: magnitude-guided residual caching (https://github.com/Zehong-Ma/MagCache).

TPU-native counterpart of the reference hook
(`/root/reference/src/diffusers/hooks/mag_cache.py:86` MagCacheConfig, skip
logic `:200-226`): the whole transformer block stack is skipped when the
accumulated magnitude-ratio error stays under `threshold`, reusing the
previous step's block-stack residual (`out = in + prev_residual`).

The reference's skip decision depends ONLY on the step index and the
calibrated per-step `mag_ratios` — not on activations — so here the entire
skip schedule is precomputed host-side as a bool mask (`mag_cache_compute_mask`,
a faithful transcription of the accumulator loop), and the model forward
wraps its block stack in one `lax.cond` carrying the residual through the
scan, following the FBC pattern (hooks/first_block_cache.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

# Published calibration for Flux (Dev/Schnell), reference mag_cache.py:36.
FLUX_MAG_RATIOS = np.array(
    [1.0, 1.21094, 1.11719, 1.07812, 1.0625, 1.03906, 1.03125, 1.03906, 1.02344,
     1.03125, 1.02344, 0.98047, 1.01562, 1.00781, 1.0, 1.00781, 1.0, 1.00781,
     1.0, 1.0, 0.99609, 0.99609, 0.98047, 0.98828, 0.96484, 0.95703, 0.93359,
     0.89062],
    dtype=np.float64,
)


def nearest_interp(src: np.ndarray, target_length: int) -> np.ndarray:
    """Nearest-neighbor resample of the calibration ladder to the actual step
    count (reference mag_cache.py:72)."""
    src = np.asarray(src, dtype=np.float64)
    if target_length == 1:
        return src[-1:]
    scale = (len(src) - 1) / (target_length - 1)
    idx = np.round(np.arange(target_length) * scale).astype(np.int64)
    return src[idx]


@dataclass(frozen=True)
class MagCacheConfig:
    """Mirrors the reference surface (mag_cache.py:86). `mag_ratios` are
    checkpoint-dependent; use FLUX_MAG_RATIOS for Flux, or run with
    `calibrate=True` and feed the logged ratios back."""

    threshold: float = 0.06
    max_skip_steps: int = 3
    retention_ratio: float = 0.2
    num_inference_steps: int = 28
    mag_ratios: Optional[Tuple[float, ...]] = None
    calibrate: bool = False

    def __post_init__(self):
        if self.mag_ratios is None and not self.calibrate:
            raise ValueError(
                "mag_ratios must be provided for MagCache inference (they are "
                "model-dependent); run once with calibrate=True to obtain them, "
                "or use FLUX_MAG_RATIOS for Flux models."
            )


def mag_cache_compute_mask(config: MagCacheConfig) -> np.ndarray:
    """bool[num_steps]: True where the block stack must be computed. Faithful
    transcription of the reference accumulator (mag_cache.py:200-226)."""
    n = config.num_inference_steps
    if config.calibrate:
        return np.ones(n, dtype=bool)
    ratios = nearest_interp(np.asarray(config.mag_ratios, dtype=np.float64), n)
    retention_step = int(config.retention_ratio * n + 0.5)
    compute = np.ones(n, dtype=bool)
    acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
    have_residual = False
    for step in range(n):
        scale = ratios[step] if step < len(ratios) else 1.0
        should_compute = True
        if step >= retention_step:
            acc_ratio *= scale
            acc_steps += 1
            acc_err += abs(1.0 - acc_ratio)
            if have_residual and acc_err <= config.threshold and acc_steps <= config.max_skip_steps:
                should_compute = False
            else:
                acc_ratio, acc_err, acc_steps = 1.0, 0.0, 0
        compute[step] = should_compute
        if should_compute:
            have_residual = True
    return compute


@flax.struct.dataclass
class MagCacheState:
    residual_hidden: jax.Array  # block-stack residual (out − in) at last computed step
    residual_context: jax.Array


def init_mag_cache_state(hidden_shape, context_shape, dtype=jnp.float32) -> MagCacheState:
    return MagCacheState(
        residual_hidden=jnp.zeros(hidden_shape, dtype=dtype),
        residual_context=jnp.zeros(context_shape, dtype=dtype),
    )


def flux_forward_with_magcache(
    model,
    params,
    mc_state: MagCacheState,
    compute: jax.Array,  # bool scalar from the host-precomputed mask
    hidden_states: jax.Array,
    encoder_hidden_states: jax.Array,
    pooled_projections: jax.Array,
    timestep: jax.Array,
    image_rotary_emb: Tuple[jax.Array, jax.Array],
    guidance: Optional[jax.Array] = None,
) -> Tuple[jax.Array, MagCacheState]:
    """FluxTransformer2DModel forward with the block stack under MagCache.
    Skipped steps replay `in + prev_residual` — the timestep-conditioned
    output norm/projection still run (matching the reference, which hooks the
    blocks, not proj_out)."""
    hidden = model.x_embedder(params["x_embedder"], hidden_states)
    timestep_scaled = timestep.astype(hidden.dtype) * 1000
    if guidance is not None:
        guidance = guidance.astype(hidden.dtype) * 1000
        temb = model.time_text_embed(params["time_text_embed"], timestep_scaled, guidance, pooled_projections)
    else:
        temb = model.time_text_embed(params["time_text_embed"], timestep_scaled, pooled_projections)
    context = model.context_embedder(params["context_embedder"], encoder_hidden_states)

    def compute_blocks(operands):
        hidden, context = operands
        h_in, c_in = hidden, context
        for i, block in enumerate(model.transformer_blocks):
            context, hidden = block(params["transformer_blocks"][i], hidden, context, temb, image_rotary_emb)
        for i, block in enumerate(model.single_transformer_blocks):
            context, hidden = block(params["single_transformer_blocks"][i], hidden, context, temb, image_rotary_emb)
        return hidden, context, hidden - h_in, context - c_in

    def reuse_blocks(operands):
        hidden, context = operands
        return (
            hidden + mc_state.residual_hidden,
            context + mc_state.residual_context,
            mc_state.residual_hidden,
            mc_state.residual_context,
        )

    hidden, context, res_h, res_c = jax.lax.cond(compute, compute_blocks, reuse_blocks, (hidden, context))
    new_state = MagCacheState(residual_hidden=res_h, residual_context=res_c)

    hidden = model.norm_out(params["norm_out"], hidden, temb)
    sample = model.proj_out(params["proj_out"], hidden)
    return sample, new_state


def mag_cache_calibrate_ratios(residual_norms: Sequence[float]) -> List[float]:
    """Turn per-step block-stack residual norms (‖out − in‖, collected over
    one uncached run) into the `mag_ratios` ladder (ratio of consecutive
    residual magnitudes; reference calibration mode, mag_cache.py:107)."""
    norms = np.asarray(list(residual_norms), dtype=np.float64)
    if len(norms) < 2:
        return [1.0] * len(norms)
    ratios = np.concatenate([[1.0], norms[1:] / np.maximum(norms[:-1], 1e-12)])
    return [float(r) for r in ratios]

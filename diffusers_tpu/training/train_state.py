"""Training utilities: flow-matching/DDPM losses + sharded train step.

The reference keeps training out-of-tree (Accelerate scripts under
`/root/reference/examples/`; helpers in `src/diffusers/training_utils.py`).
Here training is first-class and TPU-native: one jitted, mesh-sharded
train step (pjit semantics via jax.jit + NamedSharding) with optax.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def compute_snr(alphas_cumprod: jax.Array, timesteps: jax.Array) -> jax.Array:
    """Signal-to-noise ratio per timestep (reference training_utils.py:81)."""
    acp = alphas_cumprod[timesteps]
    return acp / (1 - acp)


def flow_match_loss(
    model_call: Callable,
    params,
    latents: jax.Array,  # [B, S, C] packed (or any shape)
    noise: jax.Array,
    sigmas: jax.Array,  # [B] in (0, 1]
    cond_kwargs: Dict[str, Any],
) -> jax.Array:
    """Rectified-flow MSE: model predicts velocity = noise - x0 at
    x_t = (1-σ)x0 + σ·noise (reference SD3/Flux training scripts)."""
    sig = sigmas.reshape(sigmas.shape + (1,) * (latents.ndim - 1))
    noisy = (1.0 - sig) * latents + sig * noise
    target = noise - latents
    pred = model_call(params, noisy, timestep=sigmas, **cond_kwargs)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def compute_density_for_timestep_sampling(
    weighting_scheme: str,
    batch_size: int,
    key: jax.Array,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jax.Array:
    """SD3 timestep-density sampling (reference training_utils.py:365;
    arXiv:2403.03206): u ∈ (0,1) per sample under the chosen scheme."""
    if weighting_scheme == "logit_normal":
        u = logit_mean + logit_std * jax.random.normal(key, (batch_size,))
        return jax.nn.sigmoid(u)
    if weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        return 1 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    return jax.random.uniform(key, (batch_size,))


def compute_loss_weighting_for_sd3(weighting_scheme: str, sigmas: jax.Array) -> jax.Array:
    """SD3 per-sample loss weighting (reference training_utils.py:392)."""
    if weighting_scheme == "sigma_sqrt":
        return (sigmas ** -2.0).astype(jnp.float32)
    if weighting_scheme == "cosmap":
        bot = 1 - 2 * sigmas + 2 * sigmas ** 2
        return 2 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)


# --------------------------------------------------------------------------
# Aspect-ratio bucketing (reference training_utils.py:458-552). On TPU the
# bucket ladder doubles as the jit-shape vocabulary: each (h, w) bucket is one
# compiled program, so a bounded ladder bounds recompilation.

_DEFAULT_BUCKET_ASPECT_RATIOS = [
    (1, 1), (4, 5), (5, 4), (2, 3), (3, 2), (3, 4), (4, 3),
    (9, 16), (16, 9), (1, 2), (2, 1),
]


def parse_buckets_string(buckets_str: str):
    """'h1,w1;h2,w2;…' → [(h, w), …] (reference `:458`)."""
    import re

    if not buckets_str:
        raise ValueError("Bucket string cannot be empty.")
    parsed = []
    for pair in buckets_str.strip().split(";"):
        m = re.match(r"^\s*(\d+)\s*,\s*(\d+)\s*$", pair)
        if not m:
            raise ValueError(f"Invalid bucket format: {pair!r}. Expected 'height,width'.")
        h, w = int(m.group(1)), int(m.group(2))
        if h <= 0 or w <= 0:
            raise ValueError("Bucket dimensions must be positive integers.")
        parsed.append((h, w))
    return parsed


def find_nearest_bucket(h: int, w: int, bucket_options):
    """Index of the bucket whose aspect ratio is closest (reference `:487`)."""
    best, best_idx = float("inf"), None
    for i, (bh, bw) in enumerate(bucket_options):
        metric = abs(h * bw - w * bh)
        if metric <= best:
            best, best_idx = metric, i
    return best_idx


def generate_aspect_ratio_buckets(resolution: int, divisibility: int = 16,
                                  base_resolutions=None):
    """(h, w) ladder with h·w ≈ resolution² across aspect ratios (reference
    `:515`); each dim rounded to `divisibility`."""
    target = resolution * resolution
    ratios = ([(w, h) for (h, w) in base_resolutions]
              if base_resolutions is not None else _DEFAULT_BUCKET_ASPECT_RATIOS)
    buckets, seen = [], set()
    for rw, rh in ratios:
        aspect = rw / rh
        h = (target / aspect) ** 0.5
        w = h * aspect
        h = max(divisibility, round(h / divisibility) * divisibility)
        w = max(divisibility, round(w / divisibility) * divisibility)
        if (h, w) not in seen:
            seen.add((h, w))
            buckets.append((h, w))
    return buckets


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step

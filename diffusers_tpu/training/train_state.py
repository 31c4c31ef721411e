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


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step

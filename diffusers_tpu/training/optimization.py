"""Learning-rate schedules.

Mirror of the reference `optimization.py:296` get_scheduler factory, built on
optax schedules (the TPU training stack's native optimizer library).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def get_scheduler(
    name: str,
    learning_rate: float = 1e-4,
    num_warmup_steps: Optional[int] = None,
    num_training_steps: Optional[int] = None,
    num_cycles: float = 0.5,
    power: float = 1.0,
):
    """constant / constant_with_warmup / linear / cosine / cosine_with_restarts /
    polynomial — same semantics as the reference factory."""
    warmup = num_warmup_steps or 0

    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup), optax.constant_schedule(learning_rate)], [warmup]
        )
    if num_training_steps is None:
        raise ValueError(f"schedule '{name}' requires num_training_steps")
    decay_steps = max(num_training_steps - warmup, 1)

    if name == "linear":
        main = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif name == "cosine":

        def main(step):
            progress = step / decay_steps
            return learning_rate * max(0.0, 0.5 * (1.0 + math.cos(math.pi * 2.0 * num_cycles * progress)))

        import jax.numpy as jnp

        def main(step):  # noqa: F811 traced version
            progress = jnp.clip(step / decay_steps, 0.0, 1.0)
            return learning_rate * jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress)))

    elif name == "cosine_with_restarts":
        import jax.numpy as jnp

        def main(step):
            progress = jnp.clip(step / decay_steps, 0.0, 1.0 - 1e-9)
            return learning_rate * jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * ((num_cycles * progress) % 1.0)))
            )

    elif name == "polynomial":
        main = optax.polynomial_schedule(learning_rate, 0.0, power, decay_steps)
    else:
        raise ValueError(f"unknown schedule {name}")

    if warmup:
        return optax.join_schedules([optax.linear_schedule(0.0, learning_rate, warmup), main], [warmup])
    return main

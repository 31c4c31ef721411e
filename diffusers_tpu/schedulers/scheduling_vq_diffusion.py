"""VQ-Diffusion discrete multinomial scheduler.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_vq_diffusion.py:142`
VQDiffusionScheduler): mask-and-replace forward process over VQ token
classes (last class = [MASK]) with the section-4.1 alpha/gamma cumulative
schedules, reverse step via the log-space posterior
`p(x_{t-1}|x_t) ∝ q(x_t|x_{t-1}) · sum_x0 q(x_{t-1}|x0)·p(x0)/q(x_t|x0)`
(`q_posterior` `:281`), Gumbel-noised argmax sampling.

TPU-first: all transition "matrices" stay in their factored (a, b, c)
log-scalar form — the per-class work is one logaddexp + a mask select, no
K×K materialization; the step is a pure function of (sample, logits, t, key)
and scans (the t==0 branch is a `jnp.where`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class VQDiffusionSchedulerState:
    timesteps: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class VQDiffusionSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[VQDiffusionSchedulerState] = None


def index_to_log_onehot(x: jax.Array, num_classes: int) -> jax.Array:
    """[B, N] int -> [B, K, N] log one-hot (reference `:40`)."""
    onehot = jax.nn.one_hot(x, num_classes, axis=-1)
    onehot = jnp.transpose(onehot, (0, 2, 1))
    return jnp.log(jnp.clip(onehot, 1e-30))


def gumbel_noised(logits: jax.Array, key: jax.Array) -> jax.Array:
    u = jax.random.uniform(key, logits.shape, jnp.float32)
    return logits - jnp.log(-jnp.log(u + 1e-30) + 1e-30)


def alpha_schedules(n, alpha_cum_start=0.99999, alpha_cum_end=0.000009):
    att = np.arange(0, n) / (n - 1) * (alpha_cum_end - alpha_cum_start) + alpha_cum_start
    att = np.concatenate(([1], att))
    at = att[1:] / att[:-1]
    att = np.concatenate((att[1:], [1]))
    return at, att


def gamma_schedules(n, gamma_cum_start=0.000009, gamma_cum_end=0.99999):
    ctt = np.arange(0, n) / (n - 1) * (gamma_cum_end - gamma_cum_start) + gamma_cum_start
    ctt = np.concatenate(([0], ctt))
    one_minus_ctt = 1 - ctt
    one_minus_ct = one_minus_ctt[1:] / one_minus_ctt[:-1]
    ct = 1 - one_minus_ct
    ctt = np.concatenate((ctt[1:], [0]))
    return ct, ctt


class VQDiffusionScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_vec_classes: int,
        num_train_timesteps: int = 100,
        alpha_cum_start: float = 0.99999,
        alpha_cum_end: float = 0.000009,
        gamma_cum_start: float = 0.000009,
        gamma_cum_end: float = 0.99999,
    ):
        self.num_embed = num_vec_classes
        self.mask_class = self.num_embed - 1

        at, att = alpha_schedules(num_train_timesteps, alpha_cum_start, alpha_cum_end)
        ct, ctt = gamma_schedules(num_train_timesteps, gamma_cum_start, gamma_cum_end)
        num_non_mask = self.num_embed - 1
        bt = (1 - at - ct) / num_non_mask
        btt = (1 - att - ctt) / num_non_mask
        with np.errstate(divide="ignore"):
            self.log_at = jnp.asarray(np.log(at.astype(np.float64)), jnp.float32)
            self.log_bt = jnp.asarray(np.log(bt.astype(np.float64)), jnp.float32)
            self.log_ct = jnp.asarray(np.log(ct.astype(np.float64)), jnp.float32)
            self.log_cumprod_at = jnp.asarray(np.log(att.astype(np.float64)), jnp.float32)
            self.log_cumprod_bt = jnp.asarray(np.log(btt.astype(np.float64)), jnp.float32)
            self.log_cumprod_ct = jnp.asarray(np.log(ctt.astype(np.float64)), jnp.float32)

    def set_timesteps(self, num_inference_steps: int) -> VQDiffusionSchedulerState:
        ts = np.arange(0, num_inference_steps)[::-1].copy()
        return VQDiffusionSchedulerState(
            timesteps=jnp.asarray(ts, jnp.int32), num_inference_steps=num_inference_steps)

    def log_Q_t_transitioning_to_known_class(self, *, t, x_t, log_onehot_x_t, cumulative: bool):
        """Factored transition rows (reference `:392`)."""
        if cumulative:
            a, b, c = self.log_cumprod_at[t], self.log_cumprod_bt[t], self.log_cumprod_ct[t]
        else:
            a, b, c = self.log_at[t], self.log_bt[t], self.log_ct[t]

        from_masked = log_onehot_x_t[:, -1:, :]
        rows = jnp.logaddexp(log_onehot_x_t[:, :-1, :] + a, b)
        is_mask = (x_t == self.mask_class)[:, None, :]
        rows = jnp.where(is_mask, c, rows)
        if not cumulative:
            rows = jnp.concatenate([rows, from_masked], axis=1)
        return rows

    def apply_cumulative_transitions(self, q: jax.Array, t) -> jax.Array:
        a, b, c = self.log_cumprod_at[t], self.log_cumprod_bt[t], self.log_cumprod_ct[t]
        bsz, _, n = q.shape
        q = jnp.logaddexp(q + a, b)
        c = jnp.broadcast_to(c, (bsz, 1, n))
        return jnp.concatenate([q, c], axis=1)

    def q_posterior(self, log_p_x_0: jax.Array, x_t: jax.Array, t) -> jax.Array:
        """Reverse posterior in log space (reference `:281`)."""
        log_onehot_x_t = index_to_log_onehot(x_t, self.num_embed)
        log_q_x_t_given_x_0 = self.log_Q_t_transitioning_to_known_class(
            t=t, x_t=x_t, log_onehot_x_t=log_onehot_x_t, cumulative=True)
        log_q_t_given_x_t_min_1 = self.log_Q_t_transitioning_to_known_class(
            t=t, x_t=x_t, log_onehot_x_t=log_onehot_x_t, cumulative=False)
        q = log_p_x_0 - log_q_x_t_given_x_0
        q_log_sum_exp = jax.scipy.special.logsumexp(q, axis=1, keepdims=True)
        q = q - q_log_sum_exp
        q = self.apply_cumulative_transitions(q, t - 1)
        return q + log_q_t_given_x_t_min_1 + q_log_sum_exp

    def step(self, state: VQDiffusionSchedulerState, model_output: jax.Array, timestep,
             sample: jax.Array, key: Optional[jax.Array] = None, return_dict: bool = True):
        """model_output: [B, K-1, N] log p(x0); sample: [B, N] int classes."""
        t = jnp.asarray(timestep)
        posterior = self.q_posterior(model_output, sample, jnp.maximum(t, 1))
        # t == 0: the model output IS p(x_{t-1}) over non-mask classes; pad the
        # mask row with -inf so shapes match for the traced select
        padded = jnp.concatenate(
            [model_output, jnp.full_like(model_output[:, :1], -1e30)], axis=1)
        log_p = jnp.where(t == 0, padded, posterior)
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(0), t.astype(jnp.int32))
        log_p = gumbel_noised(log_p, key)
        x_prev = jnp.argmax(log_p, axis=1)
        if not return_dict:
            return (x_prev, state)
        return VQDiffusionSchedulerOutput(prev_sample=x_prev, state=state)

    def __len__(self):
        return self.config.num_train_timesteps

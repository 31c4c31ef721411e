"""Block-refinement token scheduler (DiffusionGemma / LLaDA-style) —
functional TPU-native.

Numerics follow the reference `scheduling_block_refinement.py:54`
(BlockRefinementScheduler): commit-by-confidence with an even per-step
transfer quota, optional confidence-gated editing of already-committed
tokens, and a uniform-corruption mode (no mask token) where uncommitted
positions are renoised with uniformly random tokens. The reference's
`self._committed` instance state becomes an explicit field of the scheduler
state so `step` is pure for `lax.scan`; randomness comes from explicit PRNG
keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


def _top_p_filter(logits: jax.Array, top_p: Optional[float]) -> jax.Array:
    if top_p is None or top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum > float(top_p)
    remove = jnp.concatenate([jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    neg = jnp.finfo(logits.dtype).min
    sorted_logits = jnp.where(remove, neg, sorted_logits)
    # scatter back to vocab order
    out = jnp.full_like(logits, neg)
    return jnp.put_along_axis(out, sorted_idx, sorted_logits, axis=-1, inplace=False)


def _top_k_filter(logits: jax.Array, top_k: Optional[int]) -> jax.Array:
    if top_k is None or top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    return jnp.where(logits < kth, jnp.finfo(logits.dtype).min, logits)


def sample_from_logits(logits: jax.Array, temperature: float, top_k: Optional[int],
                       top_p: Optional[float], key: Optional[jax.Array],
                       use_multinomial: bool) -> Tuple[jax.Array, jax.Array]:
    """(tokens, probs-of-tokens) matching reference `_sample_from_logits` :150."""
    if temperature == 0.0 or not use_multinomial:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        token = jnp.argmax(logits, axis=-1)
        token_prob = jnp.take_along_axis(probs, token[..., None], axis=-1)[..., 0]
        return token, token_prob
    scaled = logits if temperature == 1.0 else logits / temperature
    filtered = _top_k_filter(scaled, top_k)
    filtered = _top_p_filter(filtered, top_p)
    probs = jax.nn.softmax(filtered.astype(jnp.float32), axis=-1)
    token = jax.random.categorical(key, jnp.log(jnp.clip(probs, 1e-20)), axis=-1)
    token_prob = jnp.take_along_axis(probs, token[..., None], axis=-1)[..., 0]
    return token, token_prob


@flax.struct.dataclass
class BlockRefinementSchedulerState:
    timesteps: jax.Array  # [S] descending
    transfer_schedule: jax.Array  # [S]
    committed: Optional[jax.Array] = None  # [B, L] bool (uniform mode)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class BlockRefinementSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    transfer_index: jax.Array
    editing_transfer_index: jax.Array
    sampled_tokens: jax.Array
    sampled_probs: jax.Array
    pred_logits: jax.Array
    state: Optional[BlockRefinementSchedulerState] = None


class BlockRefinementScheduler(SchedulerMixin, ConfigMixin):
    """Commit-by-confidence block refinement (reference :54)."""

    order = 1

    @register_to_config
    def __init__(
        self,
        block_length: int = 32,
        num_inference_steps: int = 32,
        threshold: float = 0.95,
        editing_threshold: Optional[float] = None,
        minimal_topk: int = 1,
    ):
        pass

    @staticmethod
    def get_num_transfer_tokens(block_length: int, num_inference_steps: int) -> np.ndarray:
        if num_inference_steps <= 0:
            return np.zeros((0,), dtype=np.int64)
        base = block_length // num_inference_steps
        remainder = block_length % num_inference_steps
        out = np.full((num_inference_steps,), base, dtype=np.int64)
        out[:remainder] += 1
        return out

    def set_timesteps(self, num_inference_steps: int,
                      block_length: Optional[int] = None) -> BlockRefinementSchedulerState:
        if num_inference_steps <= 0:
            raise ValueError(f"`num_inference_steps` must be > 0, got {num_inference_steps}.")
        if block_length is None:
            block_length = self.config.block_length
        return BlockRefinementSchedulerState(
            timesteps=jnp.arange(num_inference_steps - 1, -1, -1, dtype=jnp.int32),
            transfer_schedule=jnp.asarray(
                self.get_num_transfer_tokens(block_length, num_inference_steps), jnp.int32),
            committed=None,
            num_inference_steps=num_inference_steps,
        )

    def step(
        self,
        state: BlockRefinementSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        mask_token_id: Optional[int] = None,
        temperature: float = 0.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        sampling_method: str = "auto",
        threshold: Optional[float] = None,
        editing_threshold: Optional[float] = None,
        prompt_mask: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if threshold is None:
            threshold = float(self.config.threshold)
        if editing_threshold is None:
            editing_threshold = self.config.editing_threshold

        use_multinomial = sampling_method == "multinomial" or (
            sampling_method == "auto" and temperature != 0.0)
        if key is None:
            key = jax.random.PRNGKey(0)
        k_sample, k_noise = jax.random.split(key)
        sampled_tokens, sampled_probs = sample_from_logits(
            model_output, temperature, top_k, top_p, k_sample, use_multinomial)
        sampled_tokens = sampled_tokens.astype(sample.dtype)

        step_index = jnp.asarray(timestep, jnp.int32)
        batch, block_length = sample.shape
        num_steps = state.num_inference_steps

        if mask_token_id is None:
            # uniform corruption mode: committed rides the state (reset at step 0)
            committed = state.committed
            if committed is None or committed.shape != sample.shape:
                committed = jnp.zeros(sample.shape, bool)
            committed = jnp.where(step_index == 0, jnp.zeros_like(committed), committed)
            confidence = sampled_probs.astype(jnp.float32)

            steps_done = step_index + 1
            target = (steps_done * block_length + num_steps - 1) // num_steps
            needed = jnp.clip(target - committed.sum(axis=-1), 0, None)

            masked_conf = jnp.where(committed, -jnp.inf, confidence)
            order = jnp.argsort(-masked_conf, axis=-1)
            ranks = jnp.argsort(order, axis=-1)
            transfer_index = (~committed) & ((ranks < needed[:, None]) | (confidence > threshold))

            editing_transfer_index = jnp.zeros_like(transfer_index)
            if editing_threshold is not None:
                editing_transfer_index = (
                    committed & (sampled_tokens != sample) & (confidence > float(editing_threshold))
                )
            prev_sample = jnp.where(transfer_index | editing_transfer_index, sampled_tokens, sample)
            new_committed = committed | transfer_index
            random_tokens = jax.random.randint(
                k_noise, sample.shape, 0, model_output.shape[-1]).astype(sample.dtype)
            prev_sample = jnp.where(new_committed, prev_sample, random_tokens)
            new_state = state.replace(committed=new_committed)
            if not return_dict:
                return (prev_sample, transfer_index, editing_transfer_index, sampled_tokens,
                        sampled_probs, model_output, new_state)
            return BlockRefinementSchedulerOutput(
                prev_sample=prev_sample, transfer_index=transfer_index,
                editing_transfer_index=editing_transfer_index, sampled_tokens=sampled_tokens,
                sampled_probs=sampled_probs, pred_logits=model_output, state=new_state)

        # --- masked mode ---
        active_block = sample == mask_token_id
        clamped = jnp.clip(step_index, 0, state.transfer_schedule.shape[0] - 1)
        num_to_transfer = state.transfer_schedule[clamped]

        confidence = jnp.where(active_block, sampled_probs.astype(jnp.float32), -jnp.inf)
        high_conf = confidence > threshold
        order = jnp.argsort(-confidence, axis=-1)
        ranks = jnp.argsort(order, axis=-1)
        k_row = jnp.minimum(num_to_transfer, active_block.sum(axis=-1))
        topk_mask = ranks < k_row[:, None]
        use_high = high_conf.sum(axis=-1) >= num_to_transfer
        transfer_index = jnp.where(use_high[:, None], high_conf, topk_mask)
        # no transfers once no masks remain (reference guards on masks_remaining)
        transfer_index = jnp.where(jnp.any(active_block), transfer_index, False)

        editing_enabled = editing_threshold is not None and float(editing_threshold) > 0.0
        editing_transfer_index = jnp.zeros_like(transfer_index)
        if editing_enabled:
            if prompt_mask is None:
                prompt_mask = jnp.zeros((block_length,), bool)
            editable = (~active_block) & (~prompt_mask[None, :])
            edit_conf = jnp.where(editable, sampled_probs.astype(jnp.float32), -jnp.inf)
            editing_transfer_index = (edit_conf > float(editing_threshold)) & (
                sampled_tokens != sample) & editable

        final_transfer = transfer_index | editing_transfer_index
        prev_sample = jnp.where(final_transfer, sampled_tokens, sample)

        if not return_dict:
            return (prev_sample, transfer_index, editing_transfer_index, sampled_tokens,
                    sampled_probs, model_output, state)
        return BlockRefinementSchedulerOutput(
            prev_sample=prev_sample, transfer_index=transfer_index,
            editing_transfer_index=editing_transfer_index, sampled_tokens=sampled_tokens,
            sampled_probs=sampled_probs, pred_logits=model_output, state=state)

    @staticmethod
    def check_eos_finished(cur_x, sampled_tokens, final_transfer, finished,
                           eos_token_id: int, mask_token_id: int, prompt_length: int):
        """Host-side per-row finished update on committed EOS (reference :365)."""
        cur_x = np.asarray(cur_x)
        sampled_tokens = np.asarray(sampled_tokens)
        final_transfer = np.asarray(final_transfer)
        finished = np.asarray(finished).copy()
        for b in range(cur_x.shape[0]):
            if finished[b]:
                continue
            if not (sampled_tokens[b][final_transfer[b]] == eos_token_id).any():
                continue
            hits = np.nonzero(cur_x[b] == eos_token_id)[0]
            if hits.size == 0:
                continue
            eos_pos = int(hits[0])
            if eos_pos < prompt_length:
                continue
            if (cur_x[b, prompt_length:eos_pos] != mask_token_id).all():
                finished[b] = True
        return finished

    def check_block_should_continue(self, num_inference_steps: int, step_idx: int,
                                    masks_remaining: bool, editing_enabled: bool,
                                    editing_transfer_index, post_steps: int,
                                    max_post_steps: int, finished) -> bool:
        """Inner refinement loop continuation predicate (reference :413)."""
        if np.asarray(finished).all():
            return False
        if not masks_remaining and not editing_enabled:
            return False
        if not masks_remaining and not np.asarray(editing_transfer_index).any():
            return False
        if masks_remaining and step_idx >= num_inference_steps:
            return False
        if not masks_remaining and post_steps > max_post_steps:
            return False
        return True

    def add_noise(self, original_samples: jax.Array, attention_mask: jax.Array,
                  prompt_length: int, block_length: int, mask_token_id: int,
                  key: Optional[jax.Array] = None):
        """Forward block-masking process (reference :462): per block, mask a
        random fraction of valid tokens; returns complementary views."""
        if key is None:
            key = jax.random.PRNGKey(0)
        batch, seq_len = original_samples.shape
        valid = attention_mask.astype(bool)
        masked = jnp.zeros_like(original_samples, dtype=bool)
        masked_rev = jnp.zeros_like(original_samples, dtype=bool)
        for block_start in range(prompt_length, seq_len, block_length):
            block_end = min(seq_len, block_start + block_length)
            seg_len = block_end - block_start
            if seg_len <= 0:
                continue
            key, kp, ks = jax.random.split(key, 3)
            p_mask = jax.random.uniform(kp, (batch, 1))
            seg = jax.random.uniform(ks, (batch, seg_len)) < p_mask
            seg = seg & valid[:, block_start:block_end]
            seg_rev = (~seg) & valid[:, block_start:block_end]
            masked = masked.at[:, block_start:block_end].set(seg)
            masked_rev = masked_rev.at[:, block_start:block_end].set(seg_rev)
        noisy = jnp.where(masked, mask_token_id, original_samples)
        noisy_rev = jnp.where(masked_rev, mask_token_id, original_samples)
        return noisy, noisy_rev, masked, masked_rev


__all__ = ["BlockRefinementScheduler", "BlockRefinementSchedulerOutput",
           "BlockRefinementSchedulerState"]

"""LLaDA2 discrete-diffusion text generation pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/llada2/pipeline_llada2.py:59`
LLaDA2Pipeline): a fully masked template refined block by block with
[`BlockRefinementScheduler`] in masked mode — each inner step runs the
bidirectional LM over the growing window `[0, (block+1)·block_length)`,
commits confident tokens, optionally edits committed ones, freezes rows
that emitted EOS, and continues per `check_block_should_continue` (post-
mask editing sweeps bounded by `max_post_steps`).

The model contract is `model(params, input_ids, attention_mask,
position_ids) -> logits [B, S, V]` (bidirectional attention).
`LLaDA2Denoiser` here is a minimal interface-compatible JAX denoiser; real
LLaDA2 checkpoints are transformers MoE LMs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput, logging
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class LLaDA2PipelineOutput(BaseOutput):
    sequences: Any
    texts: Optional[List[str]] = None


class LLaDA2Denoiser(Module, ModelMixin, ConfigMixin):
    """Minimal bidirectional masked-LM denoiser implementing the pipeline's
    model contract (rope llama-style, tied lm head)."""

    @register_to_config
    def __init__(self, vocab_size: int = 157184, hidden_size: int = 1024,
                 intermediate_size: int = 4096, num_hidden_layers: int = 8,
                 num_attention_heads: int = 8, head_dim: Optional[int] = None,
                 rms_norm_eps: float = 1e-6, rope_theta: float = 10000.0):
        super().__init__()
        from ..diffusion_gemma.pipeline_diffusion_gemma import _BlockDiffusionLayer, _rope
        head_dim = head_dim or hidden_size // num_attention_heads
        self.head_dim = head_dim
        self._rope = _rope
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList([
            _BlockDiffusionLayer(hidden_size, num_attention_heads, head_dim, intermediate_size,
                                 eps=rms_norm_eps)
            for _ in range(num_hidden_layers)
        ])
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 position_ids: Optional[jax.Array] = None) -> jax.Array:
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        mask = None
        if attention_mask is not None:
            mask = attention_mask.astype(bool)[:, None, None, :]
        for i, layer in enumerate(self.layers):
            q, k, v = layer.qkv(params["layers"][i], x)
            q = self._rope(q, position_ids, self.config.rope_theta)
            k = self._rope(k, position_ids, self.config.rope_theta)
            out = dispatch_attention_fn(q, k, v, attn_mask=mask)
            x = layer.finish(params["layers"][i], x, out)
        x = self.norm(params["norm"], x)
        return x @ params["embed_tokens"]["embedding"].T.astype(x.dtype)


class LLaDA2Pipeline(DiffusionPipeline):
    def __init__(self, model, scheduler, tokenizer=None):
        super().__init__()
        self.register_modules(model=model, scheduler=scheduler, tokenizer=tokenizer)
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None) if tokenizer is not None else None
        self.mask_token_id = getattr(tokenizer, "mask_token_id", None) if tokenizer is not None else None

    def _prepare_input_ids(self, prompt, messages, input_ids, use_chat_template,
                           add_generation_prompt, attention_mask=None):
        if input_ids is not None:
            ids = np.asarray(input_ids)
            if ids.ndim == 1:
                ids = ids[None]
            mask = np.ones_like(ids) if attention_mask is None else np.asarray(attention_mask)
            if mask.ndim == 1:
                mask = mask[None]
            return ids.astype(np.int64), mask.astype(np.int64)
        if self.tokenizer is None:
            raise ValueError("Tokenizer is required when `input_ids` is not provided.")
        if messages is not None:
            encoded = self.tokenizer.apply_chat_template(
                messages, add_generation_prompt=add_generation_prompt, tokenize=True,
                return_tensors="np", return_dict=True)
        elif use_chat_template and getattr(self.tokenizer, "chat_template", None):
            encoded = self.tokenizer.apply_chat_template(
                [{"role": "user", "content": prompt}],
                add_generation_prompt=add_generation_prompt, tokenize=True,
                return_tensors="np", return_dict=True)
        else:
            encoded = self.tokenizer(prompt, return_tensors="np", padding=isinstance(prompt, list))
        ids = np.asarray(encoded["input_ids"])
        mask = encoded.get("attention_mask")
        mask = np.ones_like(ids) if mask is None else np.asarray(mask)
        return ids.astype(np.int64), mask.astype(np.int64)

    def __call__(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        messages: Optional[List[dict]] = None,
        input_ids=None,
        attention_mask=None,
        use_chat_template: bool = True,
        add_generation_prompt: bool = True,
        gen_length: int = 128,
        block_length: int = 32,
        num_inference_steps: int = 32,
        temperature: float = 0.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        sampling_method: str = "auto",
        threshold: float = 0.95,
        editing_threshold: Optional[float] = None,
        minimal_topk: int = 1,
        max_post_steps: int = 4,
        eos_early_stop: bool = True,
        eos_token_id: Optional[int] = None,
        mask_token_id: Optional[int] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "text",
        return_dict: bool = True,
    ):
        if output_type not in {"seq", "text"}:
            raise ValueError(f"`output_type` must be 'seq' or 'text', got {output_type!r}.")
        if key is None:
            key = jax.random.PRNGKey(0)
        model, m_params = self.model

        prompt_ids, prompt_attention_mask = self._prepare_input_ids(
            prompt, messages, input_ids, use_chat_template, add_generation_prompt, attention_mask)
        batch_size, prompt_length = prompt_ids.shape

        if eos_token_id is None:
            eos_token_id = self.eos_token_id
        if mask_token_id is None:
            mask_token_id = self.mask_token_id
        if mask_token_id is None:
            raise ValueError("`mask_token_id` must be provided (or available on the tokenizer).")

        num_inference_steps = min(num_inference_steps, gen_length // minimal_topk)
        state = self.scheduler.set_timesteps(num_inference_steps, block_length=block_length)

        num_blocks = (prompt_length + gen_length + block_length - 1) // block_length
        total_length = num_blocks * block_length
        attn_mask = np.zeros((batch_size, total_length), np.int64)
        attn_mask[:, :prompt_length] = prompt_attention_mask
        attn_mask[:, prompt_length: prompt_length + gen_length] = 1
        position_ids = np.broadcast_to(np.arange(total_length), (batch_size, total_length))

        x = np.full((batch_size, total_length), mask_token_id, np.int64)
        x[:, :prompt_length] = prompt_ids

        prefill_blocks = prompt_length // block_length
        finished = np.zeros(batch_size, bool)
        editing_enabled = editing_threshold is not None and editing_threshold > 0.0

        forward = self._jit("forward", lambda p, ids, mask, pos: model(p, ids, attention_mask=mask,
                                                                       position_ids=pos))

        for num_block in range(prefill_blocks, num_blocks):
            window_end = (num_block + 1) * block_length
            block_x = x[:, :window_end].copy()
            block_attn_mask = jnp.asarray(attn_mask[:, :window_end])
            block_position_ids = jnp.asarray(position_ids[:, :window_end])

            block_start = num_block * block_length
            prompt_mask_in_block = np.zeros(block_length, bool)
            if block_start < prompt_length:
                prompt_mask_in_block[: min(prompt_length - block_start, block_length)] = True

            post_steps = 0
            step_idx = 0
            should_continue = True
            while should_continue:
                block_tokens = block_x[:, -block_length:]
                masks_remaining = bool((block_tokens == mask_token_id).any())
                if not masks_remaining:
                    post_steps += 1

                logits = forward(m_params, jnp.asarray(block_x), block_attn_mask,
                                 block_position_ids)
                block_logits = logits[:, -block_length:, :]

                key, k_step = jax.random.split(key)
                out = self.scheduler.step(
                    state, block_logits, step_idx, jnp.asarray(block_tokens),
                    mask_token_id=mask_token_id, temperature=temperature, top_p=top_p,
                    top_k=top_k, sampling_method=sampling_method, threshold=threshold,
                    editing_threshold=editing_threshold,
                    prompt_mask=jnp.asarray(prompt_mask_in_block), key=k_step)

                transfer_index = np.asarray(out.transfer_index)
                editing_transfer_index = np.asarray(out.editing_transfer_index)
                final_transfer = transfer_index | editing_transfer_index
                if eos_early_stop and finished.any():
                    final_transfer = final_transfer & ~finished[:, None]
                block_x[:, -block_length:] = np.where(
                    final_transfer, np.asarray(out.prev_sample), block_tokens)

                if eos_early_stop and eos_token_id is not None:
                    finished = self.scheduler.check_eos_finished(
                        block_x, np.asarray(out.sampled_tokens), final_transfer, finished,
                        eos_token_id=eos_token_id, mask_token_id=mask_token_id,
                        prompt_length=prompt_length)

                if masks_remaining:
                    step_idx += 1
                should_continue = self.scheduler.check_block_should_continue(
                    num_inference_steps=num_inference_steps, step_idx=step_idx,
                    masks_remaining=masks_remaining, editing_enabled=editing_enabled,
                    editing_transfer_index=editing_transfer_index, post_steps=post_steps,
                    max_post_steps=max_post_steps, finished=finished)

            x[:, :window_end] = block_x
            if eos_early_stop and finished.all():
                break

        sequences = x[:, prompt_length: prompt_length + gen_length]
        decode_sequences = sequences
        if eos_token_id is not None:
            decode_sequences = []
            for seq in sequences:
                hits = np.nonzero(seq == eos_token_id)[0]
                decode_sequences.append(seq[: int(hits[0]) + 1] if hits.size else seq)

        texts = None
        if output_type == "text" and self.tokenizer is not None:
            texts = self.tokenizer.batch_decode(decode_sequences, skip_special_tokens=True)

        if not return_dict:
            return sequences, texts
        return LLaDA2PipelineOutput(sequences=sequences, texts=texts)

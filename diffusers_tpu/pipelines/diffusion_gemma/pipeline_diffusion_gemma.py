"""DiffusionGemma block-diffusion text generation pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/diffusion_gemma/pipeline_diffusion_gemma.py:53`
DiffusionGemmaPipeline): a causal encoder prefills a KV cache with the
prompt (and each committed canvas), a bidirectional decoder denoises a
fixed-size canvas of `canvas_length` tokens cross-attending to that cache;
the outer loop is autoregressive over canvases, the inner loop alternates
scheduler commits/renoising with logits self-conditioning, predictor-
corrector budget folding (`:283`), argmax-stability + entropy-confidence
adaptive stopping (`:412`), and EOS early stop per canvas.

The upstream denoiser (`transformers.DiffusionGemmaForBlockDiffusion`) is
not available as an oracle; this pipeline drives any component exposing the
documented contract below. `DiffusionGemmaDenoiser` in this module is an
interface-compatible JAX denoiser (tied causal-encoder / bidirectional-
decoder stack with softmax-embedding self-conditioning).

Model contract (functional):
- `model.config["canvas_length"]`, `model.config["vocab_size"]`
- `model.init_cache(batch, max_len) -> cache` (pytree of per-layer K/V + length)
- `model.encode(params, input_ids, attention_mask, cache, position_ids) -> cache`
- `model.decode(params, canvas, cache, decoder_attention_mask,
   decoder_position_ids, self_conditioning_logits) -> logits [B, L, V]`
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, Linear, Module, ModuleList, Params, RMSNorm
from ...models.modeling_utils import ModelMixin
from ...utils import BaseOutput, logging
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class DiffusionGemmaPipelineOutput(BaseOutput):
    sequences: Any
    texts: Optional[List[str]] = None


# --------------------------------------------------------------------------- #
#               interface-compatible JAX block-diffusion denoiser              #
# --------------------------------------------------------------------------- #


class _BlockDiffusionLayer(Module):
    """Pre-RMSNorm attention + SwiGLU layer shared by the causal encoder and
    the bidirectional decoder (tied weights, as in the reference model)."""

    def __init__(self, hidden_size: int, num_heads: int, head_dim: int, intermediate_size: int,
                 eps: float = 1e-6):
        super().__init__()
        self.heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        self.input_layernorm = RMSNorm(hidden_size, eps=eps)
        self.q_proj = Linear(hidden_size, inner, use_bias=False)
        self.k_proj = Linear(hidden_size, inner, use_bias=False)
        self.v_proj = Linear(hidden_size, inner, use_bias=False)
        self.o_proj = Linear(inner, hidden_size, use_bias=False)
        self.post_attention_layernorm = RMSNorm(hidden_size, eps=eps)
        self.gate_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.up_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def qkv(self, params: Params, x: jax.Array):
        b, s, _ = x.shape
        h = self.input_layernorm(params["input_layernorm"], x)
        q = self.q_proj(params["q_proj"], h).reshape(b, s, self.heads, self.head_dim)
        k = self.k_proj(params["k_proj"], h).reshape(b, s, self.heads, self.head_dim)
        v = self.v_proj(params["v_proj"], h).reshape(b, s, self.heads, self.head_dim)
        return q, k, v

    def finish(self, params: Params, x: jax.Array, attn_out: jax.Array) -> jax.Array:
        b, s = x.shape[:2]
        x = x + self.o_proj(params["o_proj"], attn_out.reshape(b, s, -1))
        h = self.post_attention_layernorm(params["post_attention_layernorm"], x)
        ff = self.down_proj(params["down_proj"],
                            jax.nn.silu(self.gate_proj(params["gate_proj"], h))
                            * self.up_proj(params["up_proj"], h))
        return x + ff


def _rope(x: jax.Array, positions: jax.Array, theta: float = 10000.0) -> jax.Array:
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions.astype(jnp.float32)[..., None] * freqs  # [B, S, d/2]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


class DiffusionGemmaDenoiser(Module, ModelMixin, ConfigMixin):
    """Tied-weight causal-encoder / bidirectional-decoder block denoiser
    implementing the pipeline's model contract. Self-conditioning mixes
    `softmax(prev_logits) @ embedding` into the canvas embeddings."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 262144,
        hidden_size: int = 1024,
        intermediate_size: int = 4096,
        num_hidden_layers: int = 8,
        num_attention_heads: int = 8,
        head_dim: Optional[int] = None,
        canvas_length: int = 32,
        rms_norm_eps: float = 1e-6,
        rope_theta: float = 10000.0,
    ):
        super().__init__()
        head_dim = head_dim or hidden_size // num_attention_heads
        self.head_dim = head_dim
        self.num_heads = num_attention_heads
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.self_cond_proj = Linear(hidden_size, hidden_size, use_bias=False)
        self.layers = ModuleList([
            _BlockDiffusionLayer(hidden_size, num_attention_heads, head_dim, intermediate_size,
                                 eps=rms_norm_eps)
            for _ in range(num_hidden_layers)
        ])
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32):
        n = len(self.layers)
        return {
            "k": jnp.zeros((n, batch, max_len, self.num_heads, self.head_dim), dtype),
            "v": jnp.zeros((n, batch, max_len, self.num_heads, self.head_dim), dtype),
            "length": 0,
        }

    def encode(self, params: Params, input_ids: jax.Array, attention_mask: jax.Array,
               cache, position_ids: jax.Array):
        """Causal prefill of `input_ids` into the cache (appended at cache["length"])."""
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        start = cache["length"]
        s_new = input_ids.shape[1]
        ks, vs = [], []
        for i, layer in enumerate(self.layers):
            q, k, v = layer.qkv(params["layers"][i], x)
            q = _rope(q, position_ids, self.config.rope_theta)
            k = _rope(k, position_ids, self.config.rope_theta)
            full_k = jax.lax.dynamic_update_slice_in_dim(cache["k"][i], k, start, axis=1)
            full_v = jax.lax.dynamic_update_slice_in_dim(cache["v"][i], v, start, axis=1)
            ks.append(full_k)
            vs.append(full_v)
            # attend causally over [cached, new]: key j visible to query t iff j <= start + t
            total = full_k.shape[1]
            j = jnp.arange(total)[None, None, None, :]
            t = jnp.arange(s_new)[None, None, :, None]
            keep = j <= (start + t)
            if attention_mask is not None:
                keep = keep & jnp.pad(
                    attention_mask.astype(bool),
                    ((0, 0), (0, total - attention_mask.shape[1])))[:, None, None, :]
            out = dispatch_attention_fn(q, full_k, full_v, attn_mask=keep)
            x = layer.finish(params["layers"][i], x, out)
        return {"k": jnp.stack(ks), "v": jnp.stack(vs), "length": start + s_new}

    def decode(self, params: Params, canvas: jax.Array, cache,
               decoder_attention_mask: Optional[jax.Array],
               decoder_position_ids: jax.Array,
               self_conditioning_logits: Optional[jax.Array] = None) -> jax.Array:
        """Bidirectional denoise of the canvas against the populated cache."""
        embed_kernel = params["embed_tokens"]["embedding"]
        x = self.embed_tokens(params["embed_tokens"], canvas)
        if self_conditioning_logits is not None:
            probs = jax.nn.softmax(self_conditioning_logits.astype(jnp.float32), axis=-1)
            x = x + self.self_cond_proj(
                params["self_cond_proj"], (probs @ embed_kernel.astype(jnp.float32)).astype(x.dtype))
        pos = jnp.broadcast_to(decoder_position_ids, (canvas.shape[0], canvas.shape[1]))
        cached_len = cache["length"]
        total = cache["k"].shape[2]
        j = jnp.arange(total + canvas.shape[1])[None, None, None, :]
        keep = (j < cached_len) | (j >= total)  # populated cache + the whole canvas
        if decoder_attention_mask is not None:
            pad = jnp.pad(decoder_attention_mask.astype(bool),
                          ((0, 0), (0, total + canvas.shape[1] - decoder_attention_mask.shape[1])),
                          constant_values=True)
            keep = keep & pad[:, None, None, :]
        for i, layer in enumerate(self.layers):
            q, k, v = layer.qkv(params["layers"][i], x)
            q = _rope(q, pos, self.config.rope_theta)
            k = _rope(k, pos, self.config.rope_theta)
            full_k = jnp.concatenate([cache["k"][i], k], axis=1)
            full_v = jnp.concatenate([cache["v"][i], v], axis=1)
            out = dispatch_attention_fn(q, full_k, full_v, attn_mask=keep)
            x = layer.finish(params["layers"][i], x, out)
        x = self.norm(params["norm"], x)
        return x @ embed_kernel.T.astype(x.dtype)


# --------------------------------------------------------------------------- #
#                                   pipeline                                   #
# --------------------------------------------------------------------------- #


class DiffusionGemmaPipeline(DiffusionPipeline):
    """Block-diffusion text generation (reference :53)."""

    def __init__(self, model, scheduler, processor):
        super().__init__()
        self.register_modules(model=model, scheduler=scheduler, processor=processor)
        tokenizer = getattr(processor, "tokenizer", processor)
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)

    def _prepare_inputs(self, prompt, messages, add_generation_prompt):
        if messages is None:
            if isinstance(prompt, list):
                messages = [[{"role": "user", "content": p}] for p in prompt]
            else:
                messages = [{"role": "user", "content": prompt}]
        encoded = self.processor.apply_chat_template(
            messages, add_generation_prompt=add_generation_prompt, tokenize=True,
            return_tensors="np", return_dict=True)
        ids = np.asarray(encoded["input_ids"])
        mask = encoded.get("attention_mask")
        mask = np.ones_like(ids) if mask is None else np.asarray(mask)
        return ids, mask.astype(np.int64)

    def __call__(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        messages: Optional[List[dict]] = None,
        add_generation_prompt: bool = True,
        gen_length: int = 256,
        num_inference_steps: int = 48,
        temperature: float = 0.0,
        eos_early_stop: bool = True,
        eos_token_id: Optional[int] = None,
        stability_threshold: int = 1,
        confidence_threshold: Optional[float] = 0.005,
        key: Optional[jax.Array] = None,
        output_type: str = "text",
        return_dict: bool = True,
    ):
        if output_type not in {"seq", "text"}:
            raise ValueError(f"`output_type` must be 'seq' or 'text', got {output_type!r}.")
        if prompt is None and messages is None:
            raise ValueError("Provide either `prompt` or `messages`.")
        if key is None:
            key = jax.random.PRNGKey(0)

        model, m_params = self.model
        prompt_ids, prompt_mask = self._prepare_inputs(prompt, messages, add_generation_prompt)
        batch_size, prompt_length = prompt_ids.shape
        if eos_token_id is None:
            eos_token_id = self.eos_token_id

        canvas_length = model.config["canvas_length"]
        vocab_size = model.config["vocab_size"]
        num_canvases = (gen_length + canvas_length - 1) // canvas_length

        # fold corrector sweeps into the per-block forward budget (reference :283)
        corrector_steps = int(self.scheduler.config.get("corrector_steps", 0) or 0)
        if corrector_steps > 0:
            corrected_steps = (num_inference_steps - 1) // (1 + corrector_steps)
            predictor_steps = num_inference_steps - corrected_steps * corrector_steps
        else:
            corrected_steps = 0
            predictor_steps = num_inference_steps

        try:
            state = self.scheduler.set_timesteps(predictor_steps, block_length=canvas_length)
        except TypeError:
            state = self.scheduler.set_timesteps(predictor_steps)

        max_cache_len = prompt_length + num_canvases * canvas_length
        cache = model.init_cache(batch_size, max_cache_len)
        encode = self._jit("encode", lambda p, ids, mask, c, pos: model.encode(p, ids, mask, c, pos))
        decode = self._jit(
            "decode",
            lambda p, canvas, c, mask, pos, sc: model.decode(p, canvas, c, mask, pos, sc))

        cur_ids = prompt_ids
        cur_mask = prompt_mask
        finished = np.zeros(batch_size, bool)

        for _ in range(num_canvases):
            cur_len = cur_ids.shape[1]
            cached_len = int(cache["length"])
            decoder_position_ids = jnp.arange(cur_len, cur_len + canvas_length)[None, :]
            cache = encode(
                m_params, jnp.asarray(cur_ids[:, cached_len:]), jnp.asarray(cur_mask), cache,
                jnp.arange(cached_len, cur_len)[None, :])
            decoder_attention_mask = jnp.asarray(
                np.pad(cur_mask.astype(bool), ((0, 0), (0, canvas_length)), constant_values=True))

            key, k_canvas = jax.random.split(key)
            canvas = jax.random.randint(k_canvas, (batch_size, canvas_length), 0, vocab_size)
            self_conditioning = jnp.zeros((batch_size, canvas_length, vocab_size), jnp.float32)
            has_sc = False
            argmax_history = np.full((max(stability_threshold, 1), batch_size, canvas_length),
                                     -1, dtype=np.int64)

            for step_idx in range(predictor_steps):
                logits = decode(m_params, canvas, cache, decoder_attention_mask,
                                decoder_position_ids, self_conditioning if has_sc else None)
                key, k_step = jax.random.split(key)
                # pass only kwargs the chosen scheduler accepts (reference :376)
                import inspect as _inspect
                step_params = set(_inspect.signature(self.scheduler.step).parameters)
                step_kwargs = {k: v for k, v in
                               {"mask_token_id": None, "temperature": temperature}.items()
                               if k in step_params}
                out = self.scheduler.step(state, logits, step_idx, canvas, key=k_step,
                                          **step_kwargs)
                canvas = out.prev_sample
                state = out.state if out.state is not None else state
                self_conditioning = out.pred_logits
                has_sc = True

                if step_idx < corrected_steps and hasattr(self.scheduler, "step_correct"):
                    for _ in range(corrector_steps):
                        corrector_logits = decode(m_params, canvas, cache, decoder_attention_mask,
                                                  decoder_position_ids, self_conditioning)
                        key, k_corr = jax.random.split(key)
                        canvas = self.scheduler.step_correct(
                            state, corrector_logits, step_idx, canvas, key=k_corr).prev_sample

                # adaptive stopping (reference :412): argmax stability + entropy confidence
                if confidence_threshold is not None:
                    logits_np = np.asarray(logits, dtype=np.float32)
                    argmax_canvas = logits_np.argmax(-1)
                    stable = (argmax_history == argmax_canvas[None]).all(-1).all(0)
                    argmax_history = np.roll(argmax_history, -1, axis=0)
                    argmax_history[-1] = argmax_canvas
                    logp = logits_np - logits_np.max(-1, keepdims=True)
                    p = np.exp(logp)
                    p = p / p.sum(-1, keepdims=True)
                    entropy = -(p * np.log(np.clip(p, 1e-20, None))).sum(-1).mean(-1)
                    if bool((stable & (entropy < confidence_threshold)).all()):
                        canvas = jnp.asarray(argmax_canvas)
                        break

            canvas_np = np.asarray(canvas)
            cur_ids = np.concatenate([cur_ids, canvas_np], axis=-1)
            cur_mask = np.pad(cur_mask, ((0, 0), (0, canvas_length)), constant_values=1)

            if eos_early_stop and eos_token_id is not None:
                finished = finished | (canvas_np == eos_token_id).any(-1)
                if finished.all():
                    break

        sequences = cur_ids[:, prompt_length:]
        decode_sequences = sequences
        if eos_token_id is not None:
            decode_sequences = []
            for seq in sequences:
                hits = np.nonzero(seq == eos_token_id)[0]
                decode_sequences.append(seq[: int(hits[0]) + 1] if hits.size else seq)

        texts = None
        if output_type == "text":
            tokenizer = getattr(self.processor, "tokenizer", self.processor)
            texts = [tokenizer.decode(list(seq), skip_special_tokens=True)
                     for seq in decode_sequences]

        if not return_dict:
            return (sequences, texts)
        return DiffusionGemmaPipelineOutput(sequences=sequences, texts=texts)

"""OmniGenTransformer2DModel — unified multimodal generation transformer.

Behavioral mirror of the reference
`models/transformers/transformer_omnigen.py`: Phi-3-style blocks (RMSNorm
→ GQA self-attn → RMSNorm → gated swiglu MLP, `:237`), centered-crop 2D
sincos positional table shared by input/output image patchifiers
(`:48`), text token table with input-image embeddings spliced over
placeholder spans (`:388`), su-scaled rotary (`:136` — short/long
factors; scaled by sqrt(1+ln(scale)/ln(orig_max)); the reference takes
batch row 0's table), [condition | time-token | image] joint sequence
with custom {0,1} [B, S, S] mask turned additive (`:468`), final RMSNorm
→ image-token slice → AdaLayerNorm(chunk_dim=1) → proj.

TPU-first: the long-context branch is selected from the STATIC sequence
length (the reference reads max(position_ids)+1; identical below 4096
tokens, which covers every real OmniGen call).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Embedding, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps, get_2d_sincos_pos_embed
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNorm


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class OmniGenFeedForward(Module):
    def __init__(self, hidden_size: int, intermediate_size: int):
        super().__init__()
        self.gate_up_proj = Linear(hidden_size, 2 * intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        up = self.gate_up_proj(params["gate_up_proj"], x)
        gate, up = jnp.split(up, 2, axis=-1)
        return self.down_proj(params["down_proj"], up * jax.nn.silu(gate))


class OmniGenPatchEmbed(Module):
    def __init__(self, patch_size=2, in_channels=4, embed_dim=768, bias=True,
                 interpolation_scale=1, pos_embed_max_size=192, base_size=64):
        super().__init__()
        self.patch_size = patch_size
        self.pos_embed_max_size = pos_embed_max_size
        self.output_image_proj = Conv2d(in_channels, embed_dim, kernel_size=patch_size,
                                        stride=patch_size, use_bias=bias)
        self.input_image_proj = Conv2d(in_channels, embed_dim, kernel_size=patch_size,
                                       stride=patch_size, use_bias=bias)
        pos = get_2d_sincos_pos_embed(embed_dim, pos_embed_max_size, base_size=base_size,
                                      interpolation_scale=interpolation_scale)
        self._pos_embed = pos.reshape(pos_embed_max_size, pos_embed_max_size, embed_dim)

    def _cropped_pos_embed(self, height, width):
        h = height // self.patch_size
        w = width // self.patch_size
        top = (self.pos_embed_max_size - h) // 2
        left = (self.pos_embed_max_size - w) // 2
        return jnp.asarray(
            self._pos_embed[top:top + h, left:left + w].reshape(1, h * w, -1)
        )

    def _patch(self, params, x, is_input_image: bool):
        proj = self.input_image_proj if is_input_image else self.output_image_proj
        p = params["input_image_proj"] if is_input_image else params["output_image_proj"]
        y = proj(p, jnp.transpose(x, (0, 2, 3, 1)))
        return y.reshape(y.shape[0], -1, y.shape[-1])

    def __call__(self, params, hidden_states, is_input_image: bool):
        if isinstance(hidden_states, (list, tuple)):
            out = []
            for sub in hidden_states:
                h, w = sub.shape[-2:]
                emb = self._patch(params, sub, is_input_image)
                out.append(emb + self._cropped_pos_embed(h, w).astype(emb.dtype))
            return out
        h, w = hidden_states.shape[-2:]
        emb = self._patch(params, hidden_states, is_input_image)
        return emb + self._cropped_pos_embed(h, w).astype(emb.dtype)


def _su_scaled_rope(position_ids: jax.Array, dim: int, base: float, max_pos: int,
                    orig_max_pos: int, short_factor, long_factor, seq_len: int):
    """cos/sin [S, dim] for batch row 0 (reference
    OmniGenSuScaledRotaryEmbedding :136)."""
    ext = np.asarray(long_factor if seq_len > orig_max_pos else short_factor, dtype=np.float32)
    inv_freq = 1.0 / (ext * base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freqs = position_ids[0].astype(jnp.float32)[:, None] * jnp.asarray(inv_freq)[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    scale = max_pos / orig_max_pos
    scaling = 1.0 if scale <= 1.0 else math.sqrt(1 + math.log(scale) / math.log(orig_max_pos))
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _apply_half_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split rotary (apply_rotary_emb use_real_unbind_dim=-2).
    x: [B, H, S, D]; cos/sin [S, D]."""
    x_f = x.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x_f * cos[None, None] + rotated * sin[None, None]
    return out.astype(x.dtype)


class OmniGenBlock(Module):
    def __init__(self, hidden_size, num_attention_heads, num_key_value_heads,
                 intermediate_size, rms_norm_eps):
        super().__init__()
        self.heads = num_attention_heads
        self.kv_heads = num_key_value_heads
        self.head_dim = hidden_size // num_attention_heads
        self.input_layernorm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.self_attn = _OmniGenAttention(hidden_size, num_attention_heads, num_key_value_heads)
        self.post_attention_layernorm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.mlp = OmniGenFeedForward(hidden_size, intermediate_size)

    def __call__(self, params, x, additive_mask, rope):
        norm_x = self.input_layernorm(params["input_layernorm"], x)
        x = x + self.self_attn(params["self_attn"], norm_x, additive_mask, rope)
        norm_x = self.post_attention_layernorm(params["post_attention_layernorm"], x)
        return x + self.mlp(params["mlp"], norm_x)


class _OmniGenAttention(Module):
    def __init__(self, hidden_size, heads, kv_heads):
        super().__init__()
        self.heads = heads
        self.kv_heads = kv_heads
        self.head_dim = hidden_size // heads
        self.to_q = Linear(hidden_size, hidden_size, use_bias=False)
        self.to_k = Linear(hidden_size, self.kv_heads * self.head_dim, use_bias=False)
        self.to_v = Linear(hidden_size, self.kv_heads * self.head_dim, use_bias=False)
        self.to_out = ModuleList([Linear(hidden_size, hidden_size, use_bias=False)])

    def __call__(self, params, x, additive_mask, rope):
        B, S, _ = x.shape
        cos, sin = rope
        q = self.to_q(params["to_q"], x).reshape(B, S, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(B, S, self.kv_heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(B, S, self.kv_heads, self.head_dim)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        q = _apply_half_rope(q, cos, sin)
        k = _apply_half_rope(k, cos, sin)
        if self.kv_heads != self.heads:
            rep = self.heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        if additive_mask is not None:
            scores = scores + additive_mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, -1)
        return self.to_out[0](params["to_out"][0], out)


class OmniGenTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 4,
        patch_size: int = 2,
        hidden_size: int = 3072,
        rms_norm_eps: float = 1e-5,
        num_attention_heads: int = 32,
        num_key_value_heads: int = 32,
        intermediate_size: int = 8192,
        num_layers: int = 32,
        pad_token_id: int = 32000,
        vocab_size: int = 32064,
        max_position_embeddings: int = 131072,
        original_max_position_embeddings: int = 4096,
        rope_base: int = 10000,
        rope_scaling: Optional[dict] = None,
        pos_embed_max_size: int = 192,
        time_step_dim: int = 256,
        flip_sin_to_cos: bool = True,
        downscale_freq_shift: int = 0,
        timestep_activation_fn: str = "silu",
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = in_channels
        self.head_dim = hidden_size // num_attention_heads
        self.rope_scaling = rope_scaling or {
            "short_factor": [1.0] * (self.head_dim // 2),
            "long_factor": [1.0] * (self.head_dim // 2),
        }

        self.patch_embedding = OmniGenPatchEmbed(
            patch_size=patch_size, in_channels=in_channels, embed_dim=hidden_size,
            pos_embed_max_size=pos_embed_max_size,
        )
        self.time_proj = Timesteps(time_step_dim, flip_sin_to_cos, downscale_freq_shift)
        self.time_token = TimestepEmbedding(time_step_dim, hidden_size, act_fn=timestep_activation_fn)
        self.t_embedder = TimestepEmbedding(time_step_dim, hidden_size, act_fn=timestep_activation_fn)
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList([
            OmniGenBlock(hidden_size, num_attention_heads, num_key_value_heads,
                         intermediate_size, rms_norm_eps)
            for _ in range(num_layers)
        ])
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.norm_out = AdaLayerNorm(hidden_size, norm_eps=1e-6, chunk_dim=1)
        self.proj_out = Linear(hidden_size, patch_size * patch_size * self.out_channels, use_bias=True)

    def _get_multimodal_embeddings(self, params, input_ids, input_img_latents, input_image_sizes):
        if input_ids is None:
            return None
        condition_tokens = self.embed_tokens(params["embed_tokens"], input_ids)
        if input_img_latents:
            image_tokens = self.patch_embedding(params["patch_embedding"], input_img_latents,
                                                is_input_image=True)
            idx = 0
            for b in input_image_sizes.keys():
                for start, end in input_image_sizes[b]:
                    condition_tokens = condition_tokens.at[b, start:end].set(
                        image_tokens[idx][0].astype(condition_tokens.dtype)
                    )
                    idx += 1
        return condition_tokens

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep,
        input_ids: Optional[jax.Array],
        input_img_latents: Optional[List[jax.Array]],
        input_image_sizes: Optional[Dict[int, list]],
        attention_mask: Optional[jax.Array],
        position_ids: jax.Array,
        return_dict: bool = True,
    ):
        B, C, H, W = hidden_states.shape
        p = self.config.patch_size
        ph, pw = H // p, W // p

        x = self.patch_embedding(params["patch_embedding"], hidden_states, is_input_image=False)
        num_img_tokens = x.shape[1]

        timestep = jnp.atleast_1d(jnp.asarray(timestep).astype(jnp.float32))
        timestep = jnp.broadcast_to(timestep, (B,))
        t_proj = self.time_proj({}, timestep).astype(x.dtype)
        time_token = self.time_token(params["time_token"], t_proj)[:, None]
        temb = self.t_embedder(params["t_embedder"], t_proj)

        condition_tokens = self._get_multimodal_embeddings(
            params, input_ids, input_img_latents, input_image_sizes or {}
        )
        if condition_tokens is not None:
            x = jnp.concatenate([condition_tokens, time_token, x], axis=1)
        else:
            x = jnp.concatenate([time_token, x], axis=1)

        S = x.shape[1]
        position_ids = position_ids.reshape(-1, S)

        additive_mask = None
        if attention_mask is not None and attention_mask.ndim == 3:
            min_val = jnp.finfo(jnp.float32).min
            additive_mask = ((1 - attention_mask.astype(jnp.float32)) * min_val)[:, None]

        rope = _su_scaled_rope(
            position_ids, self.head_dim, self.config.rope_base,
            self.config.max_position_embeddings, self.config.original_max_position_embeddings,
            self.rope_scaling["short_factor"], self.rope_scaling["long_factor"], S,
        )

        for i, block in enumerate(self.layers):
            x = block(params["layers"][i], x, additive_mask, rope)

        x = self.norm(params["norm"], x)
        x = x[:, -num_img_tokens:]
        x = self.norm_out(params["norm_out"], x, temb)
        x = self.proj_out(params["proj_out"], x)
        x = x.reshape(B, ph, pw, p, p, -1)
        output = jnp.transpose(x, (0, 5, 1, 3, 2, 4)).reshape(B, self.out_channels, H, W)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

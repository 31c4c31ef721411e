"""HiDreamImageTransformer2DModel.

Behavioral mirror of the reference
`models/transformers/transformer_hidream_image.py`: double-stream blocks
with 12-way AdaLN and separate image/text qkv whose q/k are RMS-normed
over the FULL inner dim (`:137`), DeepSeek-style MoE SwiGLU FFN on the
image stream (top-k softmax gate, shared expert, `:274`), single-stream
blocks over [image | text] with per-block llama3 hidden states appended
(`:931`), Flux-style 2x2 rotation-matrix rotary over [img, txt(zeros)]
ids (`:95`), final AdaLN out head.

TPU-first: MoE routing is computed as a dense expert sum weighted by the
top-k gate (identical numerics to the reference's scatter at
norm_topk_prob=False; static shapes, MXU-friendly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class _SiLU(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x):
        return jax.nn.silu(x)


def _rope_table(pos: jax.Array, dim: int, theta: float):
    """cos/sin [B, S, dim/2] in float64-equivalent precision (reference rope :95)."""
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta**scale)
    out = pos.astype(jnp.float64)[..., None] * jnp.asarray(omega)[None, None, :]
    return jnp.cos(out).astype(jnp.float32), jnp.sin(out).astype(jnp.float32)


def hidream_rope(ids: jax.Array, axes_dim, theta: float = 10000.0):
    """(cos, sin) [B, S, sum(axes)/2] concatenated per axis."""
    coss, sins = [], []
    for i in range(ids.shape[-1]):
        c, s = _rope_table(ids[..., i], axes_dim[i], theta)
        coss.append(c)
        sins.append(s)
    return jnp.concatenate(coss, axis=-1), jnp.concatenate(sins, axis=-1)


def _apply_rope_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved 2x2-rotation rotary. x: [B, S, H, D]; cos/sin [B, S, D/2]."""
    x_f = x.astype(jnp.float32)
    xr = x_f.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out0 = c * x0 - s * x1
    out1 = s * x0 + c * x1
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)


class HiDreamImageFeedForwardSwiGLU(Module):
    def __init__(self, dim: int, hidden_dim: int, multiple_of: int = 256,
                 ffn_dim_multiplier: Optional[float] = None):
        super().__init__()
        hidden_dim = int(2 * hidden_dim / 3)
        if ffn_dim_multiplier is not None:
            hidden_dim = int(ffn_dim_multiplier * hidden_dim)
        hidden_dim = multiple_of * ((hidden_dim + multiple_of - 1) // multiple_of)
        self.w1 = Linear(dim, hidden_dim, use_bias=False)
        self.w2 = Linear(hidden_dim, dim, use_bias=False)
        self.w3 = Linear(dim, hidden_dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.w2(params["w2"],
                       jax.nn.silu(self.w1(params["w1"], x)) * self.w3(params["w3"], x))


class MoEGate(Module):
    def __init__(self, embed_dim: int, num_routed_experts: int = 4, num_activated_experts: int = 2):
        super().__init__()
        self.top_k = num_activated_experts
        self.n_experts = num_routed_experts
        self.embed_dim = embed_dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jax.random.normal(key, (self.n_experts, self.embed_dim), dtype) / self.embed_dim**0.5}

    def __call__(self, params: Params, x: jax.Array):
        logits = x @ params["weight"].T.astype(x.dtype)
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        topk_weight, topk_idx = jax.lax.top_k(scores, self.top_k)
        return topk_idx, topk_weight


class MOEFeedForwardSwiGLU(Module):
    def __init__(self, dim: int, hidden_dim: int, num_routed_experts: int, num_activated_experts: int):
        super().__init__()
        self.shared_experts = HiDreamImageFeedForwardSwiGLU(dim, hidden_dim // 2)
        self.experts = ModuleList([
            HiDreamImageFeedForwardSwiGLU(dim, hidden_dim) for _ in range(num_routed_experts)
        ])
        self.gate = MoEGate(dim, num_routed_experts, num_activated_experts)
        self.n_experts = num_routed_experts

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        topk_idx, topk_weight = self.gate(params["gate"], x)  # [B,S,k]
        # dense expert sum weighted by the gate (== reference inference scatter)
        y = jnp.zeros_like(x)
        for i, expert in enumerate(self.experts):
            w_i = jnp.sum(jnp.where(topk_idx == i, topk_weight, 0.0), axis=-1)[..., None]
            y = y + w_i.astype(x.dtype) * expert(params["experts"][i], x)
        return y + self.shared_experts(params["shared_experts"], x)


class HiDreamAttention(Module):
    def __init__(self, query_dim: int, heads: int, dim_head: int, single: bool = False, eps: float = 1e-5):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.single = single
        inner = heads * dim_head
        self.to_q = Linear(query_dim, inner)
        self.to_k = Linear(inner, inner)
        self.to_v = Linear(inner, inner)
        self.to_out = Linear(inner, query_dim)
        self.q_rms_norm = RMSNorm(inner, eps=eps)
        self.k_rms_norm = RMSNorm(inner, eps=eps)
        if not single:
            self.to_q_t = Linear(query_dim, inner)
            self.to_k_t = Linear(inner, inner)
            self.to_v_t = Linear(inner, inner)
            self.to_out_t = Linear(inner, query_dim)
            self.q_rms_norm_t = RMSNorm(inner, eps=eps)
            self.k_rms_norm_t = RMSNorm(inner, eps=eps)

    def __call__(self, params: Params, hidden_states, hidden_states_masks=None,
                 encoder_hidden_states=None, image_rotary_emb=None):
        B = hidden_states.shape[0]
        q_i = self.q_rms_norm(params["q_rms_norm"], self.to_q(params["to_q"], hidden_states))
        k_i = self.k_rms_norm(params["k_rms_norm"], self.to_k(params["to_k"], hidden_states))
        v_i = self.to_v(params["to_v"], hidden_states)
        q_i = q_i.reshape(B, -1, self.heads, self.dim_head)
        k_i = k_i.reshape(B, -1, self.heads, self.dim_head)
        v_i = v_i.reshape(B, -1, self.heads, self.dim_head)
        if hidden_states_masks is not None:
            k_i = k_i * hidden_states_masks[:, :, None, None].astype(k_i.dtype)

        if not self.single:
            q_t = self.q_rms_norm_t(params["q_rms_norm_t"], self.to_q_t(params["to_q_t"], encoder_hidden_states))
            k_t = self.k_rms_norm_t(params["k_rms_norm_t"], self.to_k_t(params["to_k_t"], encoder_hidden_states))
            v_t = self.to_v_t(params["to_v_t"], encoder_hidden_states)
            q_t = q_t.reshape(B, -1, self.heads, self.dim_head)
            k_t = k_t.reshape(B, -1, self.heads, self.dim_head)
            v_t = v_t.reshape(B, -1, self.heads, self.dim_head)
            n_img = q_i.shape[1]
            n_txt = q_t.shape[1]
            q = jnp.concatenate([q_i, q_t], axis=1)
            k = jnp.concatenate([k_i, k_t], axis=1)
            v = jnp.concatenate([v_i, v_t], axis=1)
        else:
            q, k, v = q_i, k_i, v_i

        cos, sin = image_rotary_emb
        if q.shape[-1] == cos.shape[-1] * 2:
            q = _apply_rope_pairs(q, cos, sin)
            k = _apply_rope_pairs(k, cos, sin)
        else:
            half = q.shape[-1] // 2
            q = jnp.concatenate([_apply_rope_pairs(q[..., :half], cos, sin), q[..., half:]], axis=-1)
            k = jnp.concatenate([_apply_rope_pairs(k[..., :half], cos, sin), k[..., half:]], axis=-1)

        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qT, kT) / jnp.sqrt(jnp.asarray(self.dim_head, qT.dtype))
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vT.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vT)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, -1, self.heads * self.dim_head)

        if not self.single:
            out_i, out_t = out[:, :n_img], out[:, n_img:]
            return (self.to_out(params["to_out"], out_i),
                    self.to_out_t(params["to_out_t"], out_t))
        return self.to_out(params["to_out"], out)


class HiDreamImageSingleTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 num_routed_experts=4, num_activated_experts=2):
        super().__init__()
        self.adaLN_modulation = ModuleList([_SiLU(), Linear(dim, 6 * dim, use_bias=True)])
        self.norm1_i = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.attn1 = HiDreamAttention(dim, num_attention_heads, attention_head_dim, single=True)
        self.norm3_i = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        if num_routed_experts > 0:
            self.ff_i = MOEFeedForwardSwiGLU(dim, 4 * dim, num_routed_experts, num_activated_experts)
        else:
            self.ff_i = HiDreamImageFeedForwardSwiGLU(dim, 4 * dim)

    def __call__(self, params: Params, hidden_states, hidden_states_masks=None,
                 encoder_hidden_states=None, temb=None, image_rotary_emb=None):
        mods = self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(temb))[:, None]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mods, 6, axis=-1)
        norm_hs = self.norm1_i({}, hidden_states) * (1 + scale_msa) + shift_msa
        attn_out = self.attn1(params["attn1"], norm_hs, hidden_states_masks,
                              image_rotary_emb=image_rotary_emb)
        hidden_states = gate_msa * attn_out + hidden_states
        norm_hs = self.norm3_i({}, hidden_states) * (1 + scale_mlp) + shift_mlp
        hidden_states = gate_mlp * self.ff_i(params["ff_i"], norm_hs) + hidden_states
        return hidden_states


class HiDreamImageTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 num_routed_experts=4, num_activated_experts=2):
        super().__init__()
        self.adaLN_modulation = ModuleList([_SiLU(), Linear(dim, 12 * dim, use_bias=True)])
        self.norm1_i = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.norm1_t = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.attn1 = HiDreamAttention(dim, num_attention_heads, attention_head_dim, single=False)
        self.norm3_i = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        if num_routed_experts > 0:
            self.ff_i = MOEFeedForwardSwiGLU(dim, 4 * dim, num_routed_experts, num_activated_experts)
        else:
            self.ff_i = HiDreamImageFeedForwardSwiGLU(dim, 4 * dim)
        self.norm3_t = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff_t = HiDreamImageFeedForwardSwiGLU(dim, 4 * dim)

    def __call__(self, params: Params, hidden_states, hidden_states_masks=None,
                 encoder_hidden_states=None, temb=None, image_rotary_emb=None):
        mods = self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(temb))[:, None]
        (shift_msa_i, scale_msa_i, gate_msa_i, shift_mlp_i, scale_mlp_i, gate_mlp_i,
         shift_msa_t, scale_msa_t, gate_msa_t, shift_mlp_t, scale_mlp_t, gate_mlp_t) = jnp.split(mods, 12, axis=-1)

        norm_hs = self.norm1_i({}, hidden_states) * (1 + scale_msa_i) + shift_msa_i
        norm_ehs = self.norm1_t({}, encoder_hidden_states) * (1 + scale_msa_t) + shift_msa_t
        attn_i, attn_t = self.attn1(params["attn1"], norm_hs, hidden_states_masks,
                                    norm_ehs, image_rotary_emb=image_rotary_emb)
        hidden_states = gate_msa_i * attn_i + hidden_states
        encoder_hidden_states = gate_msa_t * attn_t + encoder_hidden_states

        norm_hs = self.norm3_i({}, hidden_states) * (1 + scale_mlp_i) + shift_mlp_i
        norm_ehs = self.norm3_t({}, encoder_hidden_states) * (1 + scale_mlp_t) + shift_mlp_t
        hidden_states = gate_mlp_i * self.ff_i(params["ff_i"], norm_hs) + hidden_states
        encoder_hidden_states = gate_mlp_t * self.ff_t(params["ff_t"], norm_ehs) + encoder_hidden_states
        return hidden_states, encoder_hidden_states


class _HiDreamBlockWrap(Module):
    """Reference wraps each block in HiDreamBlock → torch key prefix `.block`."""

    def __init__(self, block):
        super().__init__()
        self.block = block

    def __call__(self, params, *args, **kwargs):
        return self.block(params["block"], *args, **kwargs)


class _OutEmbed(Module):
    def __init__(self, hidden_size, patch_size, out_channels):
        super().__init__()
        self.norm_final = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.linear = Linear(hidden_size, patch_size * patch_size * out_channels, use_bias=True)
        self.adaLN_modulation = ModuleList([_SiLU(), Linear(hidden_size, 2 * hidden_size, use_bias=True)])

    def __call__(self, params, x, temb):
        mods = self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=1)
        x = self.norm_final({}, x) * (1 + scale[:, None]) + shift[:, None]
        return self.linear(params["linear"], x)


class _TimestepEmbed(Module):
    def __init__(self, hidden_size, frequency_embedding_size=256):
        super().__init__()
        self.time_proj = Timesteps(num_channels=frequency_embedding_size, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=frequency_embedding_size,
                                                   time_embed_dim=hidden_size)

    def __call__(self, params, timesteps, dtype):
        t = self.time_proj({}, timesteps).astype(dtype)
        return self.timestep_embedder(params["timestep_embedder"], t)


class _PooledEmbed(Module):
    def __init__(self, text_emb_dim, hidden_size):
        super().__init__()
        self.pooled_embedder = TimestepEmbedding(in_channels=text_emb_dim, time_embed_dim=hidden_size)

    def __call__(self, params, pooled):
        return self.pooled_embedder(params["pooled_embedder"], pooled)


class _TextProjection(Module):
    def __init__(self, in_features, hidden_size):
        super().__init__()
        self.linear = Linear(in_features, hidden_size, use_bias=False)

    def __call__(self, params, caption):
        return self.linear(params["linear"], caption)


class _PatchEmbed(Module):
    def __init__(self, patch_size, in_channels, out_channels):
        super().__init__()
        self.proj = Linear(in_channels * patch_size * patch_size, out_channels, use_bias=True)

    def __call__(self, params, latent):
        return self.proj(params["proj"], latent)


class HiDreamImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: Optional[int] = None,
        in_channels: int = 64,
        out_channels: Optional[int] = None,
        num_layers: int = 16,
        num_single_layers: int = 32,
        attention_head_dim: int = 128,
        num_attention_heads: int = 20,
        caption_channels: Optional[List[int]] = None,
        text_emb_dim: int = 2048,
        num_routed_experts: int = 4,
        num_activated_experts: int = 2,
        axes_dims_rope: Tuple[int, ...] = (32, 32),
        max_resolution: Tuple[int, int] = (128, 128),
        llama_layers: Optional[List[int]] = None,
        force_inference_output: bool = False,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.t_embedder = _TimestepEmbed(self.inner_dim)
        self.p_embedder = _PooledEmbed(text_emb_dim, self.inner_dim)
        self.x_embedder = _PatchEmbed(patch_size, in_channels, self.inner_dim)
        self.double_stream_blocks = ModuleList([
            _HiDreamBlockWrap(HiDreamImageTransformerBlock(
                self.inner_dim, num_attention_heads, attention_head_dim,
                num_routed_experts, num_activated_experts))
            for _ in range(num_layers)
        ])
        self.single_stream_blocks = ModuleList([
            _HiDreamBlockWrap(HiDreamImageSingleTransformerBlock(
                self.inner_dim, num_attention_heads, attention_head_dim,
                num_routed_experts, num_activated_experts))
            for _ in range(num_single_layers)
        ])
        self.final_layer = _OutEmbed(self.inner_dim, patch_size, self.out_channels)
        caption_channels = [caption_channels[1]] * (num_layers + num_single_layers) + [caption_channels[0]]
        self.caption_projection = ModuleList([
            _TextProjection(c, self.inner_dim) for c in caption_channels
        ])

    def patchify(self, hidden_states: jax.Array):
        B, C, H, W = hidden_states.shape
        p = self.config.patch_size
        ph, pw = H // p, W // p
        x = hidden_states.reshape(B, C, ph, p, pw, p)
        x = jnp.transpose(x, (0, 2, 4, 3, 5, 1)).reshape(B, ph * pw, p * p * C)
        ids = np.zeros((ph, pw, 3), dtype=np.float32)
        ids[..., 1] = np.arange(ph)[:, None]
        ids[..., 2] = np.arange(pw)[None, :]
        img_ids = jnp.asarray(np.tile(ids.reshape(ph * pw, 3)[None], (B, 1, 1)))
        return x, None, (ph, pw), img_ids

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timesteps: jax.Array = None,
        encoder_hidden_states_t5: jax.Array = None,
        encoder_hidden_states_llama3=None,
        pooled_embeds: jax.Array = None,
        return_dict: bool = True,
    ):
        B = hidden_states.shape[0]
        H, W = hidden_states.shape[-2:]
        p = self.config.patch_size

        x, masks, img_size, img_ids = self.patchify(hidden_states)
        x = self.x_embedder(params["x_embedder"], x)

        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        timesteps = jnp.broadcast_to(timesteps, (B,))
        temb = self.t_embedder(params["t_embedder"], timesteps, x.dtype)
        temb = temb + self.p_embedder(params["p_embedder"], pooled_embeds)

        enc_states = [encoder_hidden_states_llama3[k] for k in self.config.llama_layers]
        new_enc = []
        for i, ehs in enumerate(enc_states):
            proj = self.caption_projection[i](params["caption_projection"][i], ehs)
            new_enc.append(proj.reshape(B, -1, x.shape[-1]))
        t5_proj = self.caption_projection[-1](
            params["caption_projection"][len(self.caption_projection) - 1], encoder_hidden_states_t5
        )
        new_enc.append(t5_proj.reshape(B, -1, x.shape[-1]))
        enc_states = new_enc

        txt_len = enc_states[-1].shape[1] + enc_states[-2].shape[1] + enc_states[0].shape[1]
        txt_ids = jnp.zeros((B, txt_len, 3), dtype=img_ids.dtype)
        ids = jnp.concatenate([img_ids, txt_ids], axis=1)
        rope = hidream_rope(ids, self.config.axes_dims_rope)

        block_id = 0
        initial_enc = jnp.concatenate([enc_states[-1], enc_states[-2]], axis=1)
        initial_len = initial_enc.shape[1]
        for block in self.double_stream_blocks:
            cur_llama = enc_states[block_id]
            cur_enc = jnp.concatenate([initial_enc, cur_llama], axis=1)
            x, initial_enc = block(
                params["double_stream_blocks"][block_id], x, masks, cur_enc, temb, rope
            )
            initial_enc = initial_enc[:, :initial_len]
            block_id += 1

        img_len = x.shape[1]
        x = jnp.concatenate([x, initial_enc], axis=1)
        joint_len = x.shape[1]
        for si, block in enumerate(self.single_stream_blocks):
            cur_llama = enc_states[block_id]
            x = jnp.concatenate([x, cur_llama], axis=1)
            x = block(params["single_stream_blocks"][si], x, masks, None, temb, rope)
            x = x[:, :joint_len]
            block_id += 1

        x = x[:, :img_len]
        out = self.final_layer(params["final_layer"], x, temb)

        ph, pw = img_size
        t = out.reshape(B, ph, pw, p, p, -1)
        t = jnp.transpose(t, (0, 5, 1, 3, 2, 4)).reshape(B, -1, ph * p, pw * p)
        if not return_dict:
            return (t,)
        return Transformer2DModelOutput(sample=t)

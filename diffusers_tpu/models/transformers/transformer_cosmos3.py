"""Cosmos3OmniTransformer (Cosmos-3 world model, packed multimodal MoT).

Behavioral mirror of the reference
`models/transformers/transformer_cosmos3.py`: a dual-pathway
(understanding / generation) Mixture-of-Transformers decoder over ONE packed
joint sequence holding text + vision + (optional) sound + action tokens.

Structure (reference line refs):
  * interleaved 3-axis mRoPE — chunked [T..H..W] frequency layout reorganized
    into [THWTHW..] while keeping frequency continuity (`:136`)
  * per-pathway q/k/v/out projections with GQA (num_key_value_heads <
    num_attention_heads) and per-head RMS qk-norm, optionally the Nemotron
    variant (f32 weight multiply, `:164`)
  * causal self-attention for the understanding stream; the generation stream
    cross-attends to the concatenated [und ‖ gen] keys/values (`:92-116`)
  * per-pathway MLPs (silu-gated or relu² Nemotron) and RMS layernorms, i.e.
    every layer holds a `*_moe_gen` twin of each text-side block (`:303`)
  * packed scatter/gather token routing: text via `embed_tokens` at
    `text_indexes`, vision patchified channel-major (`cthpwq→thwpqc`, `:516`)
    through `proj_in`, timestep embeddings scatter-ADDED onto noisy frames
    only (`:497`), sound/action through domain heads (`:584-647`)
  * DomainAwareLinear: per-embodiment weight/bias pairs stored as embedding
    tables, token-batched bmm (`:196`)

TPU notes: scatters map to XLA `scatter`/`scatter-add` on static index shapes
(all packing indexes are host-built by the pipeline, so shapes are static per
video layout and jit caches per layout). Attention runs as f32-accumulated
einsum softmax — sequences here are O(10k) and the dual-pathway ragged split
(und_len) is static, so the MXU path is plain batched matmul.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, Identity, Linear, Module, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Cosmos3OmniTransformerOutput(BaseOutput):
    sample: List[jax.Array]
    sound: Optional[List[jax.Array]] = None
    action: Optional[List[jax.Array]] = None


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class Cosmos3NemotronRMSNorm(RMSNorm):
    """Nemotron RMSNorm (reference `:164`): identical math to our f32 RMSNorm
    (normalize and scale in float32, cast back)."""


class Cosmos3VLTextMLP(Module):
    """silu-gated or relu²-ungated MLP (reference `:178`)."""

    def __init__(self, hidden_size: int, intermediate_size: int, hidden_act: str = "silu"):
        super().__init__()
        if hidden_act not in ("relu2", "silu"):
            raise ValueError(f"Cosmos3 only supports hidden_act 'relu2'/'silu', got {hidden_act!r}")
        self.hidden_act = hidden_act
        if hidden_act == "silu":
            self.gate_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.up_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.hidden_act == "relu2":
            return self.down_proj(params["down_proj"], jnp.square(jax.nn.relu(self.up_proj(params["up_proj"], x))))
        return self.down_proj(
            params["down_proj"],
            jax.nn.silu(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x),
        )


class DomainAwareLinear(Module):
    """Per-embodiment-domain weight/bias pairs stored as embedding tables
    (reference `:196`); applied as a token-batched contraction."""

    def __init__(self, input_size: int, output_size: int, num_domains: int):
        super().__init__()
        self.input_size = input_size
        self.output_size = output_size
        self.fc = Embedding(num_domains, output_size * input_size)
        self.bias = Embedding(num_domains, output_size)

    def __call__(self, params: Params, x: jax.Array, domain_id: jax.Array) -> jax.Array:
        domain_id = domain_id.reshape(-1).astype(jnp.int32)
        weight = self.fc(params["fc"], domain_id).reshape(domain_id.shape[0], self.input_size, self.output_size)
        bias = self.bias(params["bias"], domain_id)
        if x.ndim == 2:  # [N, in] per-token weights
            return jnp.einsum("ni,nio->no", x, weight.astype(x.dtype)) + bias.astype(x.dtype)
        return jnp.einsum("nti,nio->nto", x, weight.astype(x.dtype)) + bias[:, None].astype(x.dtype)


def _gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array, causal: bool) -> jax.Array:
    """[Nq,H,d] x [Nk,Hkv,d] grouped-query attention, f32 softmax; returns
    [Nq, H*d] (reference `dispatch_attention_fn(..., enable_gqa=True)`)."""
    nq, h, d = q.shape
    groups = h // k.shape[1]
    k = jnp.repeat(k, groups, axis=1)
    v = jnp.repeat(v, groups, axis=1)
    logits = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(d)
    if causal:
        nk = k.shape[0]
        mask = jnp.tril(jnp.ones((nq, nk), dtype=bool), k=nk - nq)
        logits = jnp.where(mask[None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs.astype(v.dtype), v)
    return out.reshape(nq, h * d)


class Cosmos3PackedMoTAttention(Module):
    """Dual-pathway packed attention (reference `:227`): separate projections
    for the understanding and generation streams; und runs causal self-attn,
    gen cross-attends to [und ‖ gen] keys/values."""

    def __init__(self, hidden_size, head_dim, num_attention_heads, num_key_value_heads,
                 attention_bias, rms_norm_eps, qk_norm_for_text=True,
                 use_und_k_norm_for_gen=False, norm_type="rms_norm"):
        super().__init__()
        self.head_dim = head_dim
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        norm_cls = Cosmos3NemotronRMSNorm if norm_type == "nemotron_rms_norm" else RMSNorm
        self.to_q = Linear(hidden_size, num_attention_heads * head_dim, use_bias=attention_bias)
        self.to_k = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=attention_bias)
        self.to_v = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=attention_bias)
        self.to_out = Linear(num_attention_heads * head_dim, hidden_size, use_bias=attention_bias)
        if qk_norm_for_text:
            self.norm_q = norm_cls(head_dim, eps=rms_norm_eps)
            self.norm_k = norm_cls(head_dim, eps=rms_norm_eps)
        else:
            self.norm_q = Identity()
            self.norm_k = Identity()
        # extra k-norm on und keys consumed by the gen pathway, only when the
        # text pathway itself is un-normalized (reference `:270`)
        self.k_norm_und_for_gen = (
            norm_cls(head_dim, eps=rms_norm_eps) if (use_und_k_norm_for_gen and not qk_norm_for_text) else None
        )
        self.add_q_proj = Linear(hidden_size, num_attention_heads * head_dim, use_bias=attention_bias)
        self.add_k_proj = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=attention_bias)
        self.add_v_proj = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=attention_bias)
        self.to_add_out = Linear(num_attention_heads * head_dim, hidden_size, use_bias=attention_bias)
        self.norm_added_q = norm_cls(head_dim, eps=rms_norm_eps)
        self.norm_added_k = norm_cls(head_dim, eps=rms_norm_eps)

    def __call__(self, params: Params, und_seq: jax.Array, gen_seq: jax.Array,
                 rotary_emb: Tuple[jax.Array, jax.Array, jax.Array, jax.Array]):
        h, hkv, d = self.num_attention_heads, self.num_key_value_heads, self.head_dim
        q_und = self.to_q(params["to_q"], und_seq).reshape(-1, h, d)
        k_und = self.to_k(params["to_k"], und_seq).reshape(-1, hkv, d)
        v_und = self.to_v(params["to_v"], und_seq).reshape(-1, hkv, d)
        q_gen = self.add_q_proj(params["add_q_proj"], gen_seq).reshape(-1, h, d)
        k_gen = self.add_k_proj(params["add_k_proj"], gen_seq).reshape(-1, hkv, d)
        v_gen = self.add_v_proj(params["add_v_proj"], gen_seq).reshape(-1, hkv, d)

        q_und = self.norm_q(params.get("norm_q", {}), q_und)
        k_und = self.norm_k(params.get("norm_k", {}), k_und)
        if self.k_norm_und_for_gen is not None:
            k_und_for_gen = self.k_norm_und_for_gen(params["k_norm_und_for_gen"], k_und)
        else:
            k_und_for_gen = k_und
        q_gen = self.norm_added_q(params["norm_added_q"], q_gen)
        k_gen = self.norm_added_k(params["norm_added_k"], k_gen)

        cos_und, sin_und, cos_gen, sin_gen = rotary_emb
        cos_und, sin_und = cos_und[:, None], sin_und[:, None]
        q_und = q_und * cos_und + _rotate_half(q_und) * sin_und
        k_und = k_und * cos_und + _rotate_half(k_und) * sin_und
        k_und_for_gen = k_und_for_gen * cos_und + _rotate_half(k_und_for_gen) * sin_und
        cos_gen, sin_gen = cos_gen[:, None], sin_gen[:, None]
        q_gen = q_gen * cos_gen + _rotate_half(q_gen) * sin_gen
        k_gen = k_gen * cos_gen + _rotate_half(k_gen) * sin_gen

        causal_out = _gqa_attention(q_und, k_und, v_und, causal=True)
        all_k = jnp.concatenate([k_und_for_gen, k_gen], axis=0)
        all_v = jnp.concatenate([v_und, v_gen], axis=0)
        full_out = _gqa_attention(q_gen, all_k, all_v, causal=False)
        return self.to_out(params["to_out"], causal_out), self.to_add_out(params["to_add_out"], full_out)


class Cosmos3VLTextMoTDecoderLayer(Module):
    """MoT decoder layer (reference `:303`): every norm/MLP has a `_moe_gen`
    twin for the generation stream."""

    def __init__(self, hidden_size, head_dim, num_attention_heads, num_key_value_heads,
                 intermediate_size, attention_bias, rms_norm_eps, hidden_act="silu",
                 qk_norm_for_text=True, use_und_k_norm_for_gen=False):
        super().__init__()
        norm_type = "nemotron_rms_norm" if hidden_act == "relu2" else "rms_norm"
        norm_cls = Cosmos3NemotronRMSNorm if norm_type == "nemotron_rms_norm" else RMSNorm
        self.self_attn = Cosmos3PackedMoTAttention(
            hidden_size, head_dim, num_attention_heads, num_key_value_heads,
            attention_bias, rms_norm_eps, qk_norm_for_text, use_und_k_norm_for_gen, norm_type)
        self.mlp = Cosmos3VLTextMLP(hidden_size, intermediate_size, hidden_act)
        self.mlp_moe_gen = Cosmos3VLTextMLP(hidden_size, intermediate_size, hidden_act)
        self.input_layernorm = norm_cls(hidden_size, eps=rms_norm_eps)
        self.input_layernorm_moe_gen = norm_cls(hidden_size, eps=rms_norm_eps)
        self.post_attention_layernorm = norm_cls(hidden_size, eps=rms_norm_eps)
        self.post_attention_layernorm_moe_gen = norm_cls(hidden_size, eps=rms_norm_eps)

    def __call__(self, params: Params, und_seq, gen_seq, rotary_emb):
        und_norm = self.input_layernorm(params["input_layernorm"], und_seq)
        gen_norm = self.input_layernorm_moe_gen(params["input_layernorm_moe_gen"], gen_seq)
        und_attn, gen_attn = self.self_attn(params["self_attn"], und_norm, gen_norm, rotary_emb)
        und_seq = und_seq + und_attn
        gen_seq = gen_seq + gen_attn
        und_seq = und_seq + self.mlp(params["mlp"], self.post_attention_layernorm(
            params["post_attention_layernorm"], und_seq))
        gen_seq = gen_seq + self.mlp_moe_gen(params["mlp_moe_gen"], self.post_attention_layernorm_moe_gen(
            params["post_attention_layernorm_moe_gen"], gen_seq))
        return und_seq, gen_seq


def _interleaved_mrope(position_ids: jax.Array, head_dim: int, rope_theta: float,
                       rope_axes_dim: Sequence[int]):
    """[3, N] (or [N]) position ids → (cos, sin) each [N, head_dim]
    (reference `Cosmos3VLTextRotaryEmbedding`, `:129`)."""
    if position_ids.ndim == 1:
        position_ids = jnp.broadcast_to(position_ids[None], (3, position_ids.shape[0]))
    inv_freq = 1.0 / (rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = position_ids.astype(jnp.float32)[:, :, None] * jnp.asarray(inv_freq, jnp.float32)[None, None]  # [3,N,hd/2]
    # chunked [T..H..W] → interleaved [THWTHW..] keeping frequency continuity
    freqs_t = freqs[0]
    half = head_dim // 2
    for dim, offset in ((1, 1), (2, 2)):  # H, W
        length = min(rope_axes_dim[dim] * 3, half)
        sel = np.zeros(half, dtype=bool)
        sel[offset:length:3] = True
        freqs_t = jnp.where(jnp.asarray(sel)[None], freqs[dim], freqs_t)
    emb = jnp.concatenate([freqs_t, freqs_t], axis=-1)  # [N, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


class Cosmos3OmniTransformer(Module, ModelMixin, ConfigMixin):
    """Packed multimodal MoT transformer (reference transformer_cosmos3.py:373)."""

    @register_to_config
    def __init__(
        self,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        head_dim: int = 128,
        hidden_size: int = 4096,
        intermediate_size: int = 12288,
        base_fps: int = 24,
        enable_fps_modulation: bool = True,
        latent_channel: int = 48,
        unified_3d_mrope_reset_spatial_ids: bool = True,
        unified_3d_mrope_temporal_modality_margin: int = 15000,
        latent_patch_size: int = 2,
        num_attention_heads: int = 32,
        num_hidden_layers: int = 36,
        num_key_value_heads: int = 8,
        patch_latent_dim: int = 192,
        rms_norm_eps: float = 1e-6,
        rope_scaling: Optional[dict] = None,
        rope_theta: float = 5000000.0,
        action_dim: Optional[int] = None,
        action_gen: bool = False,
        num_embodiment_domains: int = 32,
        sound_dim: Optional[int] = None,
        sound_gen: bool = False,
        sound_latent_fps: float = 25.0,
        timestep_scale: float = 0.001,
        vocab_size: int = 151936,
        hidden_act: str = "silu",
        qk_norm_for_text: bool = True,
        use_und_k_norm_for_gen: bool = False,
        rope_axes_dim: Optional[Sequence[int]] = None,
    ):
        super().__init__()
        if rope_axes_dim is None:
            rope_axes_dim = (
                rope_scaling.get("mrope_section", [24, 20, 20]) if rope_scaling is not None else [24, 20, 20]
            )
        self.register_to_config(rope_axes_dim=tuple(rope_axes_dim))

        norm_cls = Cosmos3NemotronRMSNorm if hidden_act == "relu2" else RMSNorm
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = [
            Cosmos3VLTextMoTDecoderLayer(
                hidden_size, head_dim, num_attention_heads, num_key_value_heads,
                intermediate_size, attention_bias, rms_norm_eps, hidden_act,
                qk_norm_for_text, use_und_k_norm_for_gen)
            for _ in range(num_hidden_layers)
        ]
        self.norm = norm_cls(hidden_size, eps=rms_norm_eps)
        self.norm_moe_gen = norm_cls(hidden_size, eps=rms_norm_eps)
        self.lm_head = Linear(hidden_size, vocab_size, use_bias=False)
        self.proj_in = Linear(patch_latent_dim, hidden_size, use_bias=True)
        self.proj_out = Linear(hidden_size, patch_latent_dim, use_bias=True)
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=hidden_size)
        self.action_gen = action_gen
        self.sound_gen = sound_gen
        if action_gen:
            if action_dim is None:
                raise ValueError("`action_dim` must be provided when `action_gen=True`.")
            self.action_proj_in = DomainAwareLinear(action_dim, hidden_size, num_embodiment_domains)
            self.action_proj_out = DomainAwareLinear(hidden_size, action_dim, num_embodiment_domains)
        if sound_gen:
            if sound_dim is None:
                raise ValueError("`sound_dim` must be provided when `sound_gen=True`.")
            self.audio_proj_in = Linear(sound_dim, hidden_size, use_bias=True)
            self.audio_proj_out = Linear(hidden_size, sound_dim, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.action_gen:
            params["action_modality_embed"] = jnp.zeros((self.config.hidden_size,), dtype)
        if self.sound_gen:
            params["audio_modality_embed"] = jnp.zeros((self.config.hidden_size,), dtype)
        return params

    # ---------------------------------------------------------- pure helpers

    def _patchify_and_pack_latents(self, tokens_vision):
        p = self.config.latent_patch_size
        c = self.config.latent_channel
        packed, original_shapes = [], []
        for latent in tokens_vision:
            latent = latent[0]  # [C, T, H, W]
            _, t, h, w = latent.shape
            original_shapes.append((t, h, w))
            hp, wp = -(-h // p) * p, -(-w // p) * p
            if (hp, wp) != (h, w):
                latent = jnp.pad(latent, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
            latent = latent.reshape(c, t, hp // p, p, wp // p, p)
            latent = jnp.transpose(latent, (1, 2, 4, 3, 5, 0)).reshape(-1, p * p * c)
            packed.append(latent)
        return jnp.concatenate(packed, axis=0), original_shapes

    def _apply_timestep_embeds_to_noisy_tokens(self, packed_tokens, packed_timestep_embeds,
                                               noisy_frame_indexes, token_shapes):
        start = 0
        flat_idx = []
        for noisy_i, shape_i in zip(noisy_frame_indexes, token_shapes):
            spatial = int(np.prod(shape_i[1:]))
            offs = (jnp.asarray(noisy_i) * spatial)[:, None] + jnp.arange(spatial) + start
            flat_idx.append(offs.reshape(-1))
            start += shape_i[0] * spatial
        flat = jnp.concatenate(flat_idx, axis=0)
        return packed_tokens.at[flat].add(packed_timestep_embeds.astype(packed_tokens.dtype))

    def _unpatchify_and_unpack_latents(self, packed_preds, token_shapes_vision,
                                       noisy_frame_indexes_vision, original_latent_shapes):
        p = self.config.latent_patch_size
        c = self.config.latent_channel
        out, start = [], 0
        for token_shape, noisy_idx, orig in zip(token_shapes_vision, noisy_frame_indexes_vision,
                                                original_latent_shapes):
            t_c = token_shape[0]
            _, h_orig, w_orig = orig
            hp, wp = -(-h_orig // p), -(-w_orig // p)
            t_n = int(noisy_idx.shape[0])
            buf = jnp.zeros((c, t_c, h_orig, w_orig), packed_preds.dtype)
            n_patches = t_n * hp * wp
            if n_patches > 0:
                patches = packed_preds[start:start + n_patches].reshape(t_n, hp, wp, p, p, c)
                latent = jnp.transpose(patches, (5, 0, 1, 3, 2, 4)).reshape(c, t_n, hp * p, wp * p)
                buf = buf.at[:, jnp.asarray(noisy_idx)].set(latent[:, :, :h_orig, :w_orig])
                start += n_patches
            out.append(buf[None])
        return out

    # ------------------------------------------------------------- forward

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,
        text_indexes: jax.Array,
        position_ids: jax.Array,
        und_len: int,
        sequence_length: int,
        vision_tokens: List[jax.Array],
        vision_token_shapes: List[Tuple[int, ...]],
        vision_sequence_indexes: jax.Array,
        vision_mse_loss_indexes: jax.Array,
        vision_timesteps: jax.Array,
        vision_noisy_frame_indexes: List[jax.Array],
        sound_tokens: Optional[List[jax.Array]] = None,
        sound_token_shapes: Optional[List[Tuple[int, ...]]] = None,
        sound_sequence_indexes: Optional[jax.Array] = None,
        sound_mse_loss_indexes: Optional[jax.Array] = None,
        sound_timesteps: Optional[jax.Array] = None,
        sound_noisy_frame_indexes: Optional[List[jax.Array]] = None,
        action_tokens: Optional[List[jax.Array]] = None,
        action_token_shapes: Optional[List[Tuple[int, ...]]] = None,
        action_sequence_indexes: Optional[jax.Array] = None,
        action_mse_loss_indexes: Optional[jax.Array] = None,
        action_timesteps: Optional[jax.Array] = None,
        action_noisy_frame_indexes: Optional[List[jax.Array]] = None,
        action_domain_ids: Optional[List[jax.Array]] = None,
        return_dict: bool = True,
    ):
        cfg = self.config
        has_sound = sound_tokens is not None and sound_sequence_indexes is not None
        has_action = action_tokens is not None and action_sequence_indexes is not None

        text_emb = self.embed_tokens(params["embed_tokens"], input_ids)
        hidden = jnp.zeros((sequence_length, cfg.hidden_size), text_emb.dtype)
        hidden = hidden.at[text_indexes].set(text_emb)

        packed_vision, original_latent_shapes = self._patchify_and_pack_latents(vision_tokens)
        packed_vision = self.proj_in(params["proj_in"], packed_vision)
        t_emb = self.time_embedder(
            params["time_embedder"], self.time_proj({}, vision_timesteps * cfg.timestep_scale))
        packed_vision = self._apply_timestep_embeds_to_noisy_tokens(
            packed_vision, t_emb, vision_noisy_frame_indexes, vision_token_shapes)
        hidden = hidden.at[vision_sequence_indexes].set(packed_vision.astype(hidden.dtype))

        if has_sound:
            packed_sound = jnp.concatenate(
                [jnp.transpose(s[:, : sh[0]], (1, 0)) for s, sh in zip(sound_tokens, sound_token_shapes)], axis=0)
            packed_sound = self.audio_proj_in(params["audio_proj_in"], packed_sound.astype(hidden.dtype))
            packed_sound = packed_sound + params["audio_modality_embed"].astype(packed_sound.dtype)
            s_emb = self.time_embedder(
                params["time_embedder"], self.time_proj({}, sound_timesteps * cfg.timestep_scale))
            packed_sound = self._apply_timestep_embeds_to_noisy_tokens(
                packed_sound, s_emb, sound_noisy_frame_indexes, sound_token_shapes)
            hidden = hidden.at[sound_sequence_indexes].set(packed_sound.astype(hidden.dtype))

        if has_action:
            packed_action = jnp.concatenate(
                [a[: sh[0]] for a, sh in zip(action_tokens, action_token_shapes)], axis=0)
            per_token_domains = jnp.concatenate(
                [jnp.broadcast_to(d.reshape(1), (sh[0],)) for d, sh in zip(action_domain_ids, action_token_shapes)],
                axis=0)
            packed_action = self.action_proj_in(
                params["action_proj_in"], packed_action.astype(hidden.dtype), per_token_domains)
            packed_action = packed_action + params["action_modality_embed"].astype(packed_action.dtype)
            if action_mse_loss_indexes is not None and action_mse_loss_indexes.size > 0:
                a_emb = self.time_embedder(
                    params["time_embedder"], self.time_proj({}, action_timesteps * cfg.timestep_scale))
                packed_action = self._apply_timestep_embeds_to_noisy_tokens(
                    packed_action, a_emb, action_noisy_frame_indexes, action_token_shapes)
            hidden = hidden.at[action_sequence_indexes].set(packed_action.astype(hidden.dtype))

        cos, sin = _interleaved_mrope(position_ids, cfg.head_dim, cfg.rope_theta, cfg.rope_axes_dim)
        cos, sin = cos.astype(hidden.dtype), sin.astype(hidden.dtype)
        und_seq, gen_seq = hidden[:und_len], hidden[und_len:]
        rotary = (cos[:und_len], sin[:und_len], cos[und_len:], sin[und_len:])

        for i, layer in enumerate(self.layers):
            und_seq, gen_seq = layer(params["layers"][i], und_seq, gen_seq, rotary)
        und_out = self.norm(params["norm"], und_seq)
        gen_out = self.norm_moe_gen(params["norm_moe_gen"], gen_seq)
        last_hidden = jnp.concatenate([und_out, gen_out], axis=0)

        preds_vision = self._unpatchify_and_unpack_latents(
            self.proj_out(params["proj_out"], last_hidden[vision_mse_loss_indexes]),
            vision_token_shapes, vision_noisy_frame_indexes, original_latent_shapes)

        preds_sound = None
        if has_sound:
            sp = self.audio_proj_out(params["audio_proj_out"], last_hidden[sound_mse_loss_indexes])
            preds_sound, start = [], 0
            for sh, noisy in zip(sound_token_shapes, sound_noisy_frame_indexes):
                buf = jnp.zeros((cfg.sound_dim, sh[0]), sp.dtype)
                t_n = int(noisy.shape[0])
                if t_n > 0:
                    buf = buf.at[:, jnp.asarray(noisy)].set(jnp.transpose(sp[start:start + t_n], (1, 0)))
                    start += t_n
                preds_sound.append(buf)

        preds_action = None
        if has_action:
            per_noisy_domains = jnp.concatenate(
                [jnp.broadcast_to(d.reshape(1), (int(n.shape[0]),))
                 for d, n in zip(action_domain_ids, action_noisy_frame_indexes)], axis=0)
            ap = self.action_proj_out(
                params["action_proj_out"], last_hidden[action_mse_loss_indexes], per_noisy_domains)
            preds_action, start = [], 0
            for sh, noisy in zip(action_token_shapes, action_noisy_frame_indexes):
                buf = jnp.zeros((sh[0], cfg.action_dim), ap.dtype)
                t_n = int(noisy.shape[0])
                if t_n > 0:
                    buf = buf.at[jnp.asarray(noisy)].set(ap[start:start + t_n])
                    start += t_n
                preds_action.append(buf)

        if not return_dict:
            return preds_vision, preds_sound, preds_action
        return Cosmos3OmniTransformerOutput(sample=preds_vision, sound=preds_sound, action=preds_action)

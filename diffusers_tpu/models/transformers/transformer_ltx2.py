"""LTX2VideoTransformer3DModel — audiovisual rectified-flow DiT (Lightricks LTX-2).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_ltx2.py:1062`
LTX2VideoTransformer3DModel; LTX2VideoTransformerBlock `:412`, LTX2Attention
`:330`, LTX2AudioVideoAttnProcessor `:145`, LTX2PerturbedAttnProcessor `:231`,
LTX2AudioVideoRotaryPosEmbed `:795`, LTX2AdaLayerNormSingle `:104`,
apply_interleaved_rotary_emb `:38`, apply_split_rotary_emb `:46`).

TPU-first design notes:
- Two flat token streams, video `[B, S_v, D_v]` and audio `[B, S_a, D_a]`,
  exchanged per block through a2v / v2a cross-attention — no nested module
  dispatch; every block is a pure function over a param subtree so the whole
  48-block stack runs under one `lax.scan` (homogeneous blocks) and XLA keeps
  a single compiled body.
- RoPE tables are precomputed once per call in f32 from patch-boundary
  midpoint coordinates (the reference recomputes identical per-block tables).
- Spatio-temporal guidance (STG) is expressed as a data-level `lerp(value,
  attn_out, mask)` with a per-block 0/1 selector so it composes with the
  scanned stack (`jnp.where` instead of the reference's Python branch on
  block index).
- Per-head output gating (`to_gate_logits`) matches LTX-2.x's gated attention.

Param-tree names match the reference state dict so checkpoints load
mechanically (proj_in, audio_proj_in, time_embed, audio_time_embed,
av_cross_attn_*, transformer_blocks.N.{norm1,attn1,audio_attn1,...}, norm_out,
proj_out, audio_norm_out, audio_proj_out).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import PixArtAlphaCombinedTimestepSizeEmbeddings


@dataclass
class AudioVisualModelOutput(BaseOutput):
    """Video + audio denoised patch sequences (reference transformer_ltx2.py:88)."""

    sample: jax.Array
    audio_sample: jax.Array


def apply_interleaved_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation on the full channel dim (reference `:38`):
    x [B, S, D], cos/sin [B, S, D] (f32)."""
    x_f = x.astype(jnp.float32)
    x_r = x_f.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x_r[..., 0], x_r[..., 1]
    x_rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x_f * cos + x_rot * sin).astype(x.dtype)


def apply_split_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array, heads: int) -> jax.Array:
    """Half-split rotation with per-head frequency layout (reference `:46`).

    x [B, S, heads*head_dim]; cos/sin [B, heads, S, head_dim//2] (already
    head-major as produced by the 'split' rope)."""
    b, s, _ = x.shape
    xh = x.reshape(b, s, heads, -1).swapaxes(1, 2).astype(jnp.float32)  # [B, H, S, hd]
    r = xh.shape[-1] // 2
    first, second = xh[..., :r], xh[..., r:]
    out1 = first * cos - sin * second
    out2 = second * cos + sin * first
    out = jnp.concatenate([out1, out2], axis=-1)
    return out.swapaxes(1, 2).reshape(b, s, -1).astype(x.dtype)


class LTX2AdaLayerNormSingle(Module):
    """PixArt adaLN-single with a configurable number of modulation params
    (reference LTX2AdaLayerNormSingle, transformer_ltx2.py:104)."""

    def __init__(self, embedding_dim: int, num_mod_params: int = 6):
        super().__init__()
        self.emb = PixArtAlphaCombinedTimestepSizeEmbeddings(
            embedding_dim, size_emb_dim=embedding_dim // 3, use_additional_conditions=False
        )
        self.linear = Linear(embedding_dim, num_mod_params * embedding_dim, use_bias=True)

    def __call__(self, params, timestep, batch_size=None, dtype=jnp.float32):
        embedded_timestep = self.emb(
            params["emb"], timestep, batch_size=batch_size, dtype=dtype,
            resolution=None, aspect_ratio=None,
        )
        return self.linear(params["linear"], jax.nn.silu(embedded_timestep)), embedded_timestep


class LTX2Attention(Module):
    """qk-RMSNorm-across-heads attention with separate query/key RoPE and
    optional per-head sigmoid output gating (reference LTX2Attention `:330` +
    LTX2AudioVideoAttnProcessor `:145` + LTX2PerturbedAttnProcessor `:231`).

    STG perturbation is fused in: when ``perturbation_mask`` is given the
    output is ``lerp(value, attn_out, mask)`` — mask 1 keeps full attention,
    mask 0 short-circuits to the value projection."""

    def __init__(
        self,
        query_dim: int,
        heads: int = 8,
        kv_heads: Optional[int] = None,
        dim_head: int = 64,
        bias: bool = True,
        cross_attention_dim: Optional[int] = None,
        out_bias: bool = True,
        norm_eps: float = 1e-6,
        norm_elementwise_affine: bool = True,
        rope_type: str = "interleaved",
        apply_gated_attention: bool = False,
    ):
        super().__init__()
        kv_heads = heads if kv_heads is None else kv_heads
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = dim_head * heads
        self.inner_kv_dim = dim_head * kv_heads
        self.cross_attention_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.rope_type = rope_type
        self.norm_q = RMSNorm(self.inner_dim, eps=norm_eps, use_scale=norm_elementwise_affine)
        self.norm_k = RMSNorm(self.inner_kv_dim, eps=norm_eps, use_scale=norm_elementwise_affine)
        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)
        self.to_v = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)
        self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=out_bias)])
        self.to_gate_logits = Linear(query_dim, heads, use_bias=True) if apply_gated_attention else None

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        query_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        key_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        perturbation_mask: Optional[jax.Array] = None,  # [B, 1, 1]; 0 = perturbed (STG)
    ) -> jax.Array:
        b, s, _ = hidden_states.shape
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        gate_logits = None
        if self.to_gate_logits is not None:
            gate_logits = self.to_gate_logits(params["to_gate_logits"], hidden_states)  # [B, S, H]

        q = self.to_q(params["to_q"], hidden_states)
        k = self.to_k(params["to_k"], context)
        v = self.to_v(params["to_v"], context)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        if query_rotary_emb is not None:
            key_rope = key_rotary_emb if key_rotary_emb is not None else query_rotary_emb
            if self.rope_type == "interleaved":
                q = apply_interleaved_rotary_emb(q, *query_rotary_emb)
                k = apply_interleaved_rotary_emb(k, *key_rope)
            else:
                q = apply_split_rotary_emb(q, *query_rotary_emb, heads=self.heads)
                k = apply_split_rotary_emb(k, *key_rope, heads=self.heads)

        qh = q.reshape(b, s, self.heads, self.dim_head)
        kh = k.reshape(b, -1, self.heads, self.dim_head)
        vh = v.reshape(b, -1, self.heads, self.dim_head)
        out = dispatch_attention_fn(qh, kh, vh, attn_mask=attention_mask)
        out = out.reshape(b, s, self.inner_dim).astype(q.dtype)

        if perturbation_mask is not None:
            # STG: collapse attention to the value projection where mask == 0.
            # Self-attention only (v has the same sequence length as q).
            out = v + perturbation_mask.astype(out.dtype) * (out - v)

        if gate_logits is not None:
            # factor 2: zero-init logits → unit gates (reference `:222`)
            gates = 2.0 * jax.nn.sigmoid(gate_logits.astype(jnp.float32)).astype(out.dtype)
            out = (out.reshape(b, s, self.heads, self.dim_head) * gates[..., None]).reshape(b, s, -1)

        return self.to_out[0](params["to_out"][0], out)


def _get_mod_params(scale_shift_table: jax.Array, temb: jax.Array, n: int):
    """(table [n, D] + temb [B, T, n*D]) → n tensors [B, T, D] (reference
    LTX2VideoTransformerBlock.get_mod_params `:584`)."""
    b, t = temb.shape[0], temb.shape[1]
    ada = scale_shift_table[None, None].astype(jnp.float32) + temb.reshape(b, t, n, -1).astype(jnp.float32)
    return [ada[:, :, i] for i in range(n)]


class LTX2VideoTransformerBlock(Module):
    """Dual-stream audiovisual block (reference LTX2VideoTransformerBlock
    `:412`): per-modality self-attn, text cross-attn, a2v/v2a cross-modal
    attention with per-layer modulation, gated FFs."""

    def __init__(
        self,
        dim: int,
        num_attention_heads: int,
        attention_head_dim: int,
        cross_attention_dim: int,
        audio_dim: int,
        audio_num_attention_heads: int,
        audio_attention_head_dim: int,
        audio_cross_attention_dim: int,
        video_gated_attn: bool = False,
        video_cross_attn_adaln: bool = False,
        audio_gated_attn: bool = False,
        audio_cross_attn_adaln: bool = False,
        activation_fn: str = "gelu-approximate",
        attention_bias: bool = True,
        attention_out_bias: bool = True,
        eps: float = 1e-6,
        elementwise_affine: bool = False,
        rope_type: str = "interleaved",
    ):
        super().__init__()
        self.dim = dim
        self.audio_dim = audio_dim
        self.video_cross_attn_adaln = video_cross_attn_adaln
        self.audio_cross_attn_adaln = audio_cross_attn_adaln
        self.cross_attn_adaln = video_cross_attn_adaln or audio_cross_attn_adaln
        self.n_video_mod = 9 if video_cross_attn_adaln else 6
        self.n_audio_mod = 9 if audio_cross_attn_adaln else 6

        attn_common = dict(bias=attention_bias, out_bias=attention_out_bias, norm_eps=eps, rope_type=rope_type)
        self.norm1 = RMSNorm(dim, eps=eps, use_scale=elementwise_affine)
        self.attn1 = LTX2Attention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
            apply_gated_attention=video_gated_attn, **attn_common,
        )
        self.audio_norm1 = RMSNorm(audio_dim, eps=eps, use_scale=elementwise_affine)
        self.audio_attn1 = LTX2Attention(
            query_dim=audio_dim, heads=audio_num_attention_heads, dim_head=audio_attention_head_dim,
            apply_gated_attention=audio_gated_attn, **attn_common,
        )
        self.norm2 = RMSNorm(dim, eps=eps, use_scale=elementwise_affine)
        self.attn2 = LTX2Attention(
            query_dim=dim, cross_attention_dim=cross_attention_dim, heads=num_attention_heads,
            dim_head=attention_head_dim, apply_gated_attention=video_gated_attn, **attn_common,
        )
        self.audio_norm2 = RMSNorm(audio_dim, eps=eps, use_scale=elementwise_affine)
        self.audio_attn2 = LTX2Attention(
            query_dim=audio_dim, cross_attention_dim=audio_cross_attention_dim,
            heads=audio_num_attention_heads, dim_head=audio_attention_head_dim,
            apply_gated_attention=audio_gated_attn, **attn_common,
        )
        # a2v: Q video, K/V audio; v2a: Q audio, K/V video. Both use the audio
        # head geometry (reference `:524`).
        self.audio_to_video_norm = RMSNorm(dim, eps=eps, use_scale=elementwise_affine)
        self.audio_to_video_attn = LTX2Attention(
            query_dim=dim, cross_attention_dim=audio_dim, heads=audio_num_attention_heads,
            dim_head=audio_attention_head_dim, apply_gated_attention=video_gated_attn, **attn_common,
        )
        self.video_to_audio_norm = RMSNorm(audio_dim, eps=eps, use_scale=elementwise_affine)
        self.video_to_audio_attn = LTX2Attention(
            query_dim=audio_dim, cross_attention_dim=dim, heads=audio_num_attention_heads,
            dim_head=audio_attention_head_dim, apply_gated_attention=audio_gated_attn, **attn_common,
        )
        self.norm3 = RMSNorm(dim, eps=eps, use_scale=elementwise_affine)
        self.ff = FeedForward(dim, activation_fn=activation_fn)
        self.audio_norm3 = RMSNorm(audio_dim, eps=eps, use_scale=elementwise_affine)
        self.audio_ff = FeedForward(audio_dim, activation_fn=activation_fn)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        ks = jax.random.split(jax.random.fold_in(key, 7), 6)
        params["scale_shift_table"] = jax.random.normal(ks[0], (self.n_video_mod, self.dim), jnp.float32) / self.dim**0.5
        params["audio_scale_shift_table"] = (
            jax.random.normal(ks[1], (self.n_audio_mod, self.audio_dim), jnp.float32) / self.audio_dim**0.5
        )
        params["video_a2v_cross_attn_scale_shift_table"] = jax.random.normal(ks[2], (5, self.dim), jnp.float32)
        params["audio_a2v_cross_attn_scale_shift_table"] = jax.random.normal(ks[3], (5, self.audio_dim), jnp.float32)
        if self.cross_attn_adaln:
            params["prompt_scale_shift_table"] = jax.random.normal(ks[4], (2, self.dim), jnp.float32)
            params["audio_prompt_scale_shift_table"] = jax.random.normal(ks[5], (2, self.audio_dim), jnp.float32)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,        # [B, S_v, D_v]
        audio_hidden_states: jax.Array,  # [B, S_a, D_a]
        encoder_hidden_states: jax.Array,
        audio_encoder_hidden_states: jax.Array,
        temb: jax.Array,                 # [B, T, n_video_mod*D_v]
        temb_audio: jax.Array,
        temb_ca_scale_shift: jax.Array,  # [B, T, 4*D_v]
        temb_ca_audio_scale_shift: jax.Array,
        temb_ca_gate: jax.Array,         # [B, T, D_v]
        temb_ca_audio_gate: jax.Array,
        temb_prompt: Optional[jax.Array] = None,
        temb_prompt_audio: Optional[jax.Array] = None,
        video_rotary_emb=None,
        audio_rotary_emb=None,
        ca_video_rotary_emb=None,
        ca_audio_rotary_emb=None,
        encoder_attention_mask=None,
        audio_encoder_attention_mask=None,
        video_self_attention_mask=None,
        use_av_cross_attention: bool = True,
        perturbation_mask: Optional[jax.Array] = None,  # [B, 1, 1]; None = no STG here
    ):
        dt = hidden_states.dtype

        # 1. Self-attention (video, audio)
        video_mod = _get_mod_params(params["scale_shift_table"], temb, self.n_video_mod)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [m.astype(dt) for m in video_mod[:6]]
        norm_hidden = self.norm1(params.get("norm1", {}), hidden_states) * (1 + scale_msa) + shift_msa
        attn_out = self.attn1(
            params["attn1"], norm_hidden, query_rotary_emb=video_rotary_emb,
            attention_mask=video_self_attention_mask, perturbation_mask=perturbation_mask,
        )
        hidden_states = hidden_states + attn_out * gate_msa

        audio_mod = _get_mod_params(params["audio_scale_shift_table"], temb_audio, self.n_audio_mod)
        a_shift_msa, a_scale_msa, a_gate_msa, a_shift_mlp, a_scale_mlp, a_gate_mlp = [
            m.astype(dt) for m in audio_mod[:6]
        ]
        norm_audio = self.audio_norm1(params.get("audio_norm1", {}), audio_hidden_states) * (1 + a_scale_msa) + a_shift_msa
        attn_out = self.audio_attn1(
            params["audio_attn1"], norm_audio, query_rotary_emb=audio_rotary_emb,
            perturbation_mask=perturbation_mask,
        )
        audio_hidden_states = audio_hidden_states + attn_out * a_gate_msa

        # 2. Text cross-attention (Q: modality, K/V: text)
        norm_hidden = self.norm2(params.get("norm2", {}), hidden_states)
        ehs = encoder_hidden_states
        if self.video_cross_attn_adaln:
            sq, cq, gq = [m.astype(dt) for m in video_mod[6:9]]
            norm_hidden = norm_hidden * (1 + cq) + sq
        if self.cross_attn_adaln:
            skv, ckv = _get_mod_params(params["prompt_scale_shift_table"], temb_prompt, 2)
            ehs = ehs * (1 + ckv.astype(dt)) + skv.astype(dt)
        attn_out = self.attn2(
            params["attn2"], norm_hidden, encoder_hidden_states=ehs, attention_mask=encoder_attention_mask
        )
        if self.video_cross_attn_adaln:
            attn_out = attn_out * gq
        hidden_states = hidden_states + attn_out

        norm_audio = self.audio_norm2(params.get("audio_norm2", {}), audio_hidden_states)
        a_ehs = audio_encoder_hidden_states
        if self.audio_cross_attn_adaln:
            a_sq, a_cq, a_gq = [m.astype(dt) for m in audio_mod[6:9]]
            norm_audio = norm_audio * (1 + a_cq) + a_sq
        if self.cross_attn_adaln:
            a_skv, a_ckv = _get_mod_params(params["audio_prompt_scale_shift_table"], temb_prompt_audio, 2)
            a_ehs = a_ehs * (1 + a_ckv.astype(dt)) + a_skv.astype(dt)
        attn_out = self.audio_attn2(
            params["audio_attn2"], norm_audio, encoder_hidden_states=a_ehs,
            attention_mask=audio_encoder_attention_mask,
        )
        if self.audio_cross_attn_adaln:
            attn_out = attn_out * a_gq
        audio_hidden_states = audio_hidden_states + attn_out

        # 3. a2v / v2a cross-modal attention
        if use_av_cross_attention:
            norm_hidden = self.audio_to_video_norm(params.get("audio_to_video_norm", {}), hidden_states)
            norm_audio = self.video_to_audio_norm(params.get("video_to_audio_norm", {}), audio_hidden_states)

            v_tab = params["video_a2v_cross_attn_scale_shift_table"]
            v_a2v_scale, v_a2v_shift, v_v2a_scale, v_v2a_shift = _get_mod_params(
                v_tab[:4], temb_ca_scale_shift, 4
            )
            (a2v_gate,) = _get_mod_params(v_tab[4:], temb_ca_gate, 1)
            a_tab = params["audio_a2v_cross_attn_scale_shift_table"]
            a_a2v_scale, a_a2v_shift, a_v2a_scale, a_v2a_shift = _get_mod_params(
                a_tab[:4], temb_ca_audio_scale_shift, 4
            )
            (v2a_gate,) = _get_mod_params(a_tab[4:], temb_ca_audio_gate, 1)

            # a2v: Q video (+ temporal rope), K/V audio
            mod_hidden = norm_hidden * (1 + v_a2v_scale.astype(dt)) + v_a2v_shift.astype(dt)
            mod_audio = norm_audio * (1 + a_a2v_scale.astype(dt)) + a_a2v_shift.astype(dt)
            a2v = self.audio_to_video_attn(
                params["audio_to_video_attn"], mod_hidden, encoder_hidden_states=mod_audio,
                query_rotary_emb=ca_video_rotary_emb, key_rotary_emb=ca_audio_rotary_emb,
            )
            hidden_states = hidden_states + a2v_gate.astype(dt) * a2v

            # v2a: Q audio, K/V video
            mod_hidden = norm_hidden * (1 + v_v2a_scale.astype(dt)) + v_v2a_shift.astype(dt)
            mod_audio = norm_audio * (1 + a_v2a_scale.astype(dt)) + a_v2a_shift.astype(dt)
            v2a = self.video_to_audio_attn(
                params["video_to_audio_attn"], mod_audio, encoder_hidden_states=mod_hidden,
                query_rotary_emb=ca_audio_rotary_emb, key_rotary_emb=ca_video_rotary_emb,
            )
            audio_hidden_states = audio_hidden_states + v2a_gate.astype(dt) * v2a

        # 4. Feed-forward
        norm_hidden = self.norm3(params.get("norm3", {}), hidden_states) * (1 + scale_mlp) + shift_mlp
        hidden_states = hidden_states + self.ff(params["ff"], norm_hidden) * gate_mlp
        norm_audio = self.audio_norm3(params.get("audio_norm3", {}), audio_hidden_states) * (1 + a_scale_mlp) + a_shift_mlp
        audio_hidden_states = audio_hidden_states + self.audio_ff(params["audio_ff"], norm_audio) * a_gate_mlp
        return hidden_states, audio_hidden_states


class LTX2AudioVideoRotaryPosEmbed:
    """Patch-boundary-midpoint RoPE for video (3-axis f/h/w) and audio
    (1-axis temporal) token streams (reference LTX2AudioVideoRotaryPosEmbed,
    transformer_ltx2.py:795). Stateless — pure coordinate/frequency math."""

    def __init__(
        self,
        dim: int,
        patch_size: int = 1,
        patch_size_t: int = 1,
        base_num_frames: int = 20,
        base_height: int = 2048,
        base_width: int = 2048,
        sampling_rate: int = 16000,
        hop_length: int = 160,
        scale_factors: Sequence[int] = (8, 32, 32),
        theta: float = 10000.0,
        causal_offset: int = 1,
        modality: str = "video",
        rope_type: str = "interleaved",
        num_attention_heads: int = 32,
    ):
        self.dim = dim
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.base_num_frames = base_num_frames
        self.base_height = base_height
        self.base_width = base_width
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.scale_factors = tuple(scale_factors)
        self.theta = theta
        self.causal_offset = causal_offset
        self.modality = modality
        self.rope_type = rope_type
        self.num_attention_heads = num_attention_heads

    def prepare_video_coords(self, batch_size, num_frames, height, width, fps: float = 24.0):
        """[B, 3, S, 2] pixel-space patch bounds (reference `:854`). Host numpy."""
        grid_f = np.arange(0, num_frames, self.patch_size_t, dtype=np.float64)
        grid_h = np.arange(0, height, self.patch_size, dtype=np.float64)
        grid_w = np.arange(0, width, self.patch_size, dtype=np.float64)
        grid = np.stack(np.meshgrid(grid_f, grid_h, grid_w, indexing="ij"), axis=0)  # [3, F, H, W]
        psize = np.array([self.patch_size_t, self.patch_size, self.patch_size], dtype=np.float64)
        ends = grid + psize.reshape(3, 1, 1, 1)
        coords = np.stack([grid, ends], axis=-1).reshape(3, -1, 2)  # [3, S, 2]
        scale = np.array(self.scale_factors, dtype=np.float64).reshape(3, 1, 1)
        pixel = coords * scale
        pixel[0] = np.clip(pixel[0] + self.causal_offset - self.scale_factors[0], 0, None) / fps
        return np.broadcast_to(pixel[None], (batch_size, *pixel.shape)).copy()

    def prepare_audio_coords(self, batch_size, num_frames, shift: int = 0):
        """[B, 1, S, 2] start/end timestamps in seconds (reference `:924`)."""
        grid_f = np.arange(shift, num_frames + shift, self.patch_size_t, dtype=np.float64)
        sf = self.scale_factors[0]
        start = np.clip(grid_f * sf + self.causal_offset - sf, 0, None) * self.hop_length / self.sampling_rate
        end = np.clip((grid_f + self.patch_size_t) * sf + self.causal_offset - sf, 0, None) * (
            self.hop_length / self.sampling_rate
        )
        coords = np.stack([start, end], axis=-1)[None]  # [1, S, 2]
        return np.broadcast_to(coords[None], (batch_size, *coords.shape)).copy()

    def __call__(self, coords: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        """coords [B, n_dims, S, 2] (bounds) or [B, n_dims, S] → (cos, sin).

        interleaved: [B, S, dim] each. split: [B, heads, S, head_dim//2]."""
        coords = np.asarray(coords, np.float64)
        num_pos_dims = coords.shape[1]
        if coords.ndim == 4:
            coords = (coords[..., 0] + coords[..., 1]) / 2.0  # midpoint [B, n, S]
        if self.modality == "video":
            max_positions = (self.base_num_frames, self.base_height, self.base_width)
        else:
            max_positions = (self.base_num_frames,)
        grid = np.stack([coords[:, i] / max_positions[i] for i in range(num_pos_dims)], axis=-1)  # [B, S, n]
        num_rope_elems = num_pos_dims * 2
        n_freqs = self.dim // num_rope_elems
        pow_indices = self.theta ** np.linspace(0.0, 1.0, n_freqs, dtype=np.float64)
        freqs = pow_indices * math.pi / 2.0
        freqs = (grid[..., None] * 2 - 1) * freqs  # [B, S, n, n_freqs]
        freqs = np.swapaxes(freqs, -1, -2).reshape(*grid.shape[:2], -1)  # [B, S, n*n_freqs]

        if self.rope_type == "interleaved":
            cos = np.repeat(np.cos(freqs), 2, axis=-1)
            sin = np.repeat(np.sin(freqs), 2, axis=-1)
            pad = self.dim % num_rope_elems
            if pad:
                cos = np.concatenate([np.ones_like(cos[:, :, :pad]), cos], axis=-1)
                sin = np.concatenate([np.zeros_like(sin[:, :, :pad]), sin], axis=-1)
        else:  # split
            expected = self.dim // 2
            pad = expected - freqs.shape[-1]
            cos, sin = np.cos(freqs), np.sin(freqs)
            if pad:
                cos = np.concatenate([np.ones_like(cos[:, :, :pad]), cos], axis=-1)
                sin = np.concatenate([np.zeros_like(sin[:, :, :pad]), sin], axis=-1)
            b, t = cos.shape[:2]
            cos = np.swapaxes(cos.reshape(b, t, self.num_attention_heads, -1), 1, 2)
            sin = np.swapaxes(sin.reshape(b, t, self.num_attention_heads, -1), 1, 2)
        return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


class LTX2VideoTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Audiovisual LTX-2 DiT (reference LTX2VideoTransformer3DModel,
    transformer_ltx2.py:1062)."""

    _supports_scan_blocks = True

    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        out_channels: Optional[int] = 128,
        patch_size: int = 1,
        patch_size_t: int = 1,
        num_attention_heads: int = 32,
        attention_head_dim: int = 128,
        cross_attention_dim: int = 4096,
        vae_scale_factors: Tuple[int, int, int] = (8, 32, 32),
        pos_embed_max_pos: int = 20,
        base_height: int = 2048,
        base_width: int = 2048,
        gated_attn: bool = False,
        cross_attn_mod: bool = False,
        audio_in_channels: int = 128,
        audio_out_channels: Optional[int] = 128,
        audio_patch_size: int = 1,
        audio_patch_size_t: int = 1,
        audio_num_attention_heads: int = 32,
        audio_attention_head_dim: int = 64,
        audio_cross_attention_dim: int = 2048,
        audio_scale_factor: int = 4,
        audio_pos_embed_max_pos: int = 20,
        audio_sampling_rate: int = 16000,
        audio_hop_length: int = 160,
        audio_gated_attn: bool = False,
        audio_cross_attn_mod: bool = False,
        num_layers: int = 48,
        activation_fn: str = "gelu-approximate",
        qk_norm: str = "rms_norm_across_heads",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        caption_channels: int = 3840,
        attention_bias: bool = True,
        attention_out_bias: bool = True,
        rope_theta: float = 10000.0,
        rope_double_precision: bool = True,
        causal_offset: int = 1,
        timestep_scale_multiplier: int = 1000,
        cross_attn_timestep_scale_multiplier: int = 1000,
        rope_type: str = "interleaved",
        use_prompt_embeddings: bool = True,
        perturbed_attn: bool = False,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.audio_out_channels = audio_out_channels or audio_in_channels
        inner_dim = num_attention_heads * attention_head_dim
        audio_inner_dim = audio_num_attention_heads * audio_attention_head_dim
        self.inner_dim = inner_dim
        self.audio_inner_dim = audio_inner_dim
        self.prompt_modulation = cross_attn_mod or audio_cross_attn_mod
        self.use_prompt_embeddings = use_prompt_embeddings

        self.proj_in = Linear(in_channels, inner_dim)
        self.audio_proj_in = Linear(audio_in_channels, audio_inner_dim)

        if use_prompt_embeddings:
            self.caption_projection = PixArtAlphaTextProjection(in_features=caption_channels, hidden_size=inner_dim)
            self.audio_caption_projection = PixArtAlphaTextProjection(
                in_features=caption_channels, hidden_size=audio_inner_dim
            )

        self.time_embed = LTX2AdaLayerNormSingle(inner_dim, num_mod_params=9 if cross_attn_mod else 6)
        self.audio_time_embed = LTX2AdaLayerNormSingle(
            audio_inner_dim, num_mod_params=9 if audio_cross_attn_mod else 6
        )
        self.av_cross_attn_video_scale_shift = LTX2AdaLayerNormSingle(inner_dim, num_mod_params=4)
        self.av_cross_attn_audio_scale_shift = LTX2AdaLayerNormSingle(audio_inner_dim, num_mod_params=4)
        self.av_cross_attn_video_a2v_gate = LTX2AdaLayerNormSingle(inner_dim, num_mod_params=1)
        self.av_cross_attn_audio_v2a_gate = LTX2AdaLayerNormSingle(audio_inner_dim, num_mod_params=1)
        if self.prompt_modulation:
            self.prompt_adaln = LTX2AdaLayerNormSingle(inner_dim, num_mod_params=2)
            self.audio_prompt_adaln = LTX2AdaLayerNormSingle(audio_inner_dim, num_mod_params=2)

        rope_common = dict(theta=rope_theta, causal_offset=causal_offset, rope_type=rope_type)
        self.rope = LTX2AudioVideoRotaryPosEmbed(
            dim=inner_dim, patch_size=patch_size, patch_size_t=patch_size_t,
            base_num_frames=pos_embed_max_pos, base_height=base_height, base_width=base_width,
            scale_factors=vae_scale_factors, modality="video",
            num_attention_heads=num_attention_heads, **rope_common,
        )
        self.audio_rope = LTX2AudioVideoRotaryPosEmbed(
            dim=audio_inner_dim, patch_size=audio_patch_size, patch_size_t=audio_patch_size_t,
            base_num_frames=audio_pos_embed_max_pos, sampling_rate=audio_sampling_rate,
            hop_length=audio_hop_length, scale_factors=(audio_scale_factor,), modality="audio",
            num_attention_heads=audio_num_attention_heads, **rope_common,
        )
        ca_max_pos = max(pos_embed_max_pos, audio_pos_embed_max_pos)
        self.cross_attn_rope = LTX2AudioVideoRotaryPosEmbed(
            dim=audio_cross_attention_dim, patch_size=patch_size, patch_size_t=patch_size_t,
            base_num_frames=ca_max_pos, base_height=base_height, base_width=base_width,
            modality="video", num_attention_heads=num_attention_heads, **rope_common,
        )
        self.cross_attn_audio_rope = LTX2AudioVideoRotaryPosEmbed(
            dim=audio_cross_attention_dim, patch_size=audio_patch_size, patch_size_t=audio_patch_size_t,
            base_num_frames=ca_max_pos, sampling_rate=audio_sampling_rate, hop_length=audio_hop_length,
            modality="audio", num_attention_heads=audio_num_attention_heads, **rope_common,
        )

        self.transformer_blocks = ModuleList(
            [
                LTX2VideoTransformerBlock(
                    dim=inner_dim,
                    num_attention_heads=num_attention_heads,
                    attention_head_dim=attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    audio_dim=audio_inner_dim,
                    audio_num_attention_heads=audio_num_attention_heads,
                    audio_attention_head_dim=audio_attention_head_dim,
                    audio_cross_attention_dim=audio_cross_attention_dim,
                    video_gated_attn=gated_attn,
                    video_cross_attn_adaln=cross_attn_mod,
                    audio_gated_attn=audio_gated_attn,
                    audio_cross_attn_adaln=audio_cross_attn_mod,
                    activation_fn=activation_fn,
                    attention_bias=attention_bias,
                    attention_out_bias=attention_out_bias,
                    eps=norm_eps,
                    elementwise_affine=norm_elementwise_affine,
                    rope_type=rope_type,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels)
        self.audio_norm_out = LayerNorm(audio_inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.audio_proj_out = Linear(audio_inner_dim, self.audio_out_channels)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 11))
        params["scale_shift_table"] = jax.random.normal(k1, (2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        params["audio_scale_shift_table"] = (
            jax.random.normal(k2, (2, self.audio_inner_dim), jnp.float32) / self.audio_inner_dim**0.5
        )
        return params

    def _expand_temb(self, adaln, params_key, params, t, batch_size, dtype):
        temb, embedded = adaln(params[params_key], jnp.ravel(t), batch_size=batch_size, dtype=dtype)
        return (
            temb.reshape(batch_size, -1, temb.shape[-1]),
            embedded.reshape(batch_size, -1, embedded.shape[-1]),
        )

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,        # [B, S_v, in_channels]
        audio_hidden_states: jax.Array,  # [B, S_a, audio_in_channels]
        encoder_hidden_states: jax.Array,
        audio_encoder_hidden_states: jax.Array,
        timestep: jax.Array,             # [B] or [B, S_v], pre-scaled
        audio_timestep: Optional[jax.Array] = None,
        sigma: Optional[jax.Array] = None,
        audio_sigma: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        audio_encoder_attention_mask: Optional[jax.Array] = None,
        num_frames: Optional[int] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        fps: float = 24.0,
        audio_num_frames: Optional[int] = None,
        video_coords: Optional[np.ndarray] = None,
        audio_coords: Optional[np.ndarray] = None,
        isolate_modalities: bool = False,
        spatio_temporal_guidance_blocks: Optional[Sequence[int]] = None,
        perturbation_mask: Optional[jax.Array] = None,
        use_cross_timestep: bool = False,
        video_self_attention_mask: Optional[jax.Array] = None,
        rotary_embs: Optional[dict] = None,
        scan_blocks: bool = False,
        return_dict: bool = True,
    ) -> Union[AudioVisualModelOutput, tuple]:
        batch_size = hidden_states.shape[0]
        dt = hidden_states.dtype
        audio_timestep = timestep if audio_timestep is None else audio_timestep
        audio_sigma = sigma if audio_sigma is None else audio_sigma

        # 1. RoPE tables (precomputed once; pass `rotary_embs` to reuse across steps)
        if rotary_embs is None:
            if video_coords is None:
                video_coords = self.rope.prepare_video_coords(batch_size, num_frames, height, width, fps=fps)
            if audio_coords is None:
                audio_coords = self.audio_rope.prepare_audio_coords(batch_size, audio_num_frames)
            rotary_embs = self.prepare_rotary_embs(video_coords, audio_coords)
        video_rope = rotary_embs["video"]
        audio_rope = rotary_embs["audio"]
        ca_video_rope = rotary_embs["ca_video"]
        ca_audio_rope = rotary_embs["ca_audio"]

        # 2. Masks → additive bias
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            encoder_attention_mask = (
                (1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            )[:, None, None, :]
        if audio_encoder_attention_mask is not None and audio_encoder_attention_mask.ndim == 2:
            audio_encoder_attention_mask = (
                (1 - audio_encoder_attention_mask.astype(jnp.float32)) * -10000.0
            )[:, None, None, :]
        if video_self_attention_mask is not None:
            # [B, S_v, S_v] multiplicative → additive, broadcast over heads
            video_self_attention_mask = (
                (1 - video_self_attention_mask.astype(jnp.float32)) * -10000.0
            )[:, None, :, :]

        # 3. Input projections
        hidden_states = self.proj_in(params["proj_in"], hidden_states)
        audio_hidden_states = self.audio_proj_in(params["audio_proj_in"], audio_hidden_states)

        # 4. Timestep modulation parameters
        ca_gate_scale = self.config.cross_attn_timestep_scale_multiplier / self.config.timestep_scale_multiplier
        temb, embedded_timestep = self._expand_temb(self.time_embed, "time_embed", params, timestep, batch_size, dt)
        temb_audio, audio_embedded_timestep = self._expand_temb(
            self.audio_time_embed, "audio_time_embed", params, audio_timestep, batch_size, dt
        )
        temb_prompt = temb_prompt_audio = None
        if self.prompt_modulation:
            temb_prompt, _ = self._expand_temb(self.prompt_adaln, "prompt_adaln", params, sigma, batch_size, dt)
            temb_prompt_audio, _ = self._expand_temb(
                self.audio_prompt_adaln, "audio_prompt_adaln", params, audio_sigma, batch_size, dt
            )

        video_ca_t = jnp.ravel(audio_sigma if use_cross_timestep else timestep)
        audio_ca_t = jnp.ravel(sigma if use_cross_timestep else audio_timestep)
        temb_ca_scale_shift, _ = self._expand_temb(
            self.av_cross_attn_video_scale_shift, "av_cross_attn_video_scale_shift", params, video_ca_t, batch_size, dt
        )
        temb_ca_gate, _ = self._expand_temb(
            self.av_cross_attn_video_a2v_gate, "av_cross_attn_video_a2v_gate", params,
            video_ca_t * ca_gate_scale, batch_size, dt,
        )
        temb_ca_audio_scale_shift, _ = self._expand_temb(
            self.av_cross_attn_audio_scale_shift, "av_cross_attn_audio_scale_shift", params, audio_ca_t, batch_size, dt
        )
        temb_ca_audio_gate, _ = self._expand_temb(
            self.av_cross_attn_audio_v2a_gate, "av_cross_attn_audio_v2a_gate", params,
            audio_ca_t * ca_gate_scale, batch_size, dt,
        )

        # 5. Prompt projections (LTX-2.0; 2.3 projects in the connectors)
        if self.use_prompt_embeddings:
            encoder_hidden_states = self.caption_projection(params["caption_projection"], encoder_hidden_states)
            encoder_hidden_states = encoder_hidden_states.reshape(batch_size, -1, self.inner_dim)
            audio_encoder_hidden_states = self.audio_caption_projection(
                params["audio_caption_projection"], audio_encoder_hidden_states
            )
            audio_encoder_hidden_states = audio_encoder_hidden_states.reshape(batch_size, -1, self.audio_inner_dim)

        # 6. STG selectors
        stg_blocks = set(spatio_temporal_guidance_blocks or [])
        if stg_blocks and perturbation_mask is None:
            perturbation_mask = jnp.zeros((batch_size,), jnp.float32)
        if perturbation_mask is not None and perturbation_mask.ndim == 1:
            perturbation_mask = perturbation_mask[:, None, None]

        n_blocks = len(self.transformer_blocks)
        block_kwargs = dict(
            encoder_hidden_states=encoder_hidden_states,
            audio_encoder_hidden_states=audio_encoder_hidden_states,
            temb=temb,
            temb_audio=temb_audio,
            temb_ca_scale_shift=temb_ca_scale_shift,
            temb_ca_audio_scale_shift=temb_ca_audio_scale_shift,
            temb_ca_gate=temb_ca_gate,
            temb_ca_audio_gate=temb_ca_audio_gate,
            temb_prompt=temb_prompt,
            temb_prompt_audio=temb_prompt_audio,
            video_rotary_emb=video_rope,
            audio_rotary_emb=audio_rope,
            ca_video_rotary_emb=ca_video_rope,
            ca_audio_rotary_emb=ca_audio_rope,
            encoder_attention_mask=encoder_attention_mask,
            audio_encoder_attention_mask=audio_encoder_attention_mask,
            video_self_attention_mask=video_self_attention_mask,
            use_av_cross_attention=not isolate_modalities,
        )

        if scan_blocks and not stg_blocks:
            stack = params["transformer_blocks"]
            if isinstance(stack, dict) and 0 in stack:
                stack = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *[stack[i] for i in range(n_blocks)]
                )
            block = self.transformer_blocks[0]

            def body(carry, block_params):
                h, a = block(
                    block_params, carry[0], carry[1],
                    perturbation_mask=perturbation_mask, **block_kwargs,
                )
                return (h, a), None

            (hidden_states, audio_hidden_states), _ = jax.lax.scan(
                body, (hidden_states, audio_hidden_states), stack
            )
        else:
            for i, block in enumerate(self.transformer_blocks):
                hidden_states, audio_hidden_states = block(
                    params["transformer_blocks"][i], hidden_states, audio_hidden_states,
                    perturbation_mask=perturbation_mask if i in stg_blocks else None,
                    **block_kwargs,
                )

        # 7. Output heads
        ss = params["scale_shift_table"][None, None].astype(jnp.float32) + embedded_timestep[:, :, None].astype(
            jnp.float32
        )
        shift, scale = ss[:, :, 0].astype(dt), ss[:, :, 1].astype(dt)
        hidden_states = self.norm_out({}, hidden_states) * (1 + scale) + shift
        output = self.proj_out(params["proj_out"], hidden_states)

        a_ss = params["audio_scale_shift_table"][None, None].astype(jnp.float32) + audio_embedded_timestep[
            :, :, None
        ].astype(jnp.float32)
        a_shift, a_scale = a_ss[:, :, 0].astype(dt), a_ss[:, :, 1].astype(dt)
        audio_hidden_states = self.audio_norm_out({}, audio_hidden_states) * (1 + a_scale) + a_shift
        audio_output = self.audio_proj_out(params["audio_proj_out"], audio_hidden_states)

        if not return_dict:
            return (output, audio_output)
        return AudioVisualModelOutput(sample=output, audio_sample=audio_output)

    def prepare_rotary_embs(self, video_coords: np.ndarray, audio_coords: np.ndarray) -> dict:
        """Host-precompute all four RoPE tables for a given latent geometry so
        the denoise loop can reuse them across steps (they are timestep-
        independent; the reference recomputes them every forward, `:1446`)."""
        return {
            "video": self.rope(video_coords),
            "audio": self.audio_rope(audio_coords),
            "ca_video": self.cross_attn_rope(video_coords[:, 0:1]),
            "ca_audio": self.cross_attn_audio_rope(audio_coords[:, 0:1]),
        }

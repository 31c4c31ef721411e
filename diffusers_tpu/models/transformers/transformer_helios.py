"""HeliosTransformer3DModel — FramePack-style autoregressive video world model.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_helios.py:501`):
Wan-style blocks (FP32 norms, 6-part scale_shift_table, cross-attn, gelu-tanh
FFN) extended with (a) per-token timestep modulation where history tokens get
the t=0 embedding (`:795`), (b) multi-term memory patch embeddings — short /
mid(2x) / long(4x) pooled history latents each with its own Conv3d patchify
(`:735-790`), (c) batched 3-axis RoPE over explicit frame indices whose
history tables are REPLICATE-padded and average-pooled in cos/sin space
(`:326`, `center_down_sample_3d` `:50`), (d) optional learned history key
amplification in self-attention (`:133`), and (e) guidance cross-attention
applied only to the current-chunk tokens (`:466`).

TPU-first: the rope grids are jnp einsums over static shapes (avg-pool =
reshape-mean since kernel == stride); history/current splits are static
slices, so the whole forward is one fused XLA graph per chunk shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _pad_replicate_3d(x: jax.Array, multiples: Tuple[int, int, int]) -> jax.Array:
    """Right-pad [B, C, T, H, W] to multiples with edge replication
    (reference `pad_for_3d_conv` `:39`)."""
    _, _, t, h, w = x.shape
    pt, ph, pw = multiples
    pads = [(0, 0), (0, 0), (0, (pt - t % pt) % pt), (0, (ph - h % ph) % ph), (0, (pw - w % pw) % pw)]
    return jnp.pad(x, pads, mode="edge")


def _avg_pool_3d(x: jax.Array, k: Tuple[int, int, int]) -> jax.Array:
    """kernel == stride avg pool on [B, C, T, H, W] = reshape-mean
    (reference `center_down_sample_3d` `:50`)."""
    b, c, t, h, w = x.shape
    x = x.reshape(b, c, t // k[0], k[0], h // k[1], k[1], w // k[2], k[2])
    return x.mean(axis=(3, 5, 7))


class HeliosRotaryPosEmbed:
    """Batched 3-axis rope (reference `:326`): per-axis frequencies over an
    explicit (possibly non-contiguous) frame-index grid, channel-repeat-
    interleaved; returns [B, C=2·head_dim, T, H, W] maps (cos ‖ sin)."""

    def __init__(self, rope_dim, theta: float):
        self.rope_dim = tuple(rope_dim)
        self.theta = theta
        self.freqs_base = [
            jnp.asarray(1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64)[: d // 2] / d)), jnp.float32)
            for d in self.rope_dim
        ]

    def _freqs(self, base: jax.Array, pos: jax.Array):
        freqs = jnp.einsum("d,bthw->bdthw", base, pos.astype(jnp.float32))
        freqs = jnp.repeat(freqs, 2, axis=1)
        return jnp.cos(freqs), jnp.sin(freqs)

    def __call__(self, frame_indices: jax.Array, height: int, width: int) -> jax.Array:
        batch_size, num_frames = frame_indices.shape
        gy, gx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                              jnp.arange(width, dtype=jnp.float32), indexing="ij")
        grid_t = jnp.broadcast_to(frame_indices.astype(jnp.float32)[:, :, None, None],
                                  (batch_size, num_frames, height, width))
        grid_y = jnp.broadcast_to(gy[None, None], (batch_size, num_frames, height, width))
        grid_x = jnp.broadcast_to(gx[None, None], (batch_size, num_frames, height, width))
        cos_t, sin_t = self._freqs(self.freqs_base[0], grid_t)
        cos_y, sin_y = self._freqs(self.freqs_base[1], grid_y)
        cos_x, sin_x = self._freqs(self.freqs_base[2], grid_x)
        return jnp.concatenate([cos_t, cos_y, cos_x, sin_t, sin_y, sin_x], axis=1)


def _flatten_rope(freqs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, 2·D, T, H, W] -> ([B, S, 1, D] cos, [B, S, 1, D] sin)."""
    b, c2, t, h, w = freqs.shape
    flat = jnp.transpose(freqs.reshape(b, c2, t * h * w), (0, 2, 1))
    cos, sin = jnp.split(flat, 2, axis=-1)
    return cos[:, :, None, :], sin[:, :, None, :]


def _apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin: [B, S, 1, D] pair-duplicated tables
    (reference `apply_rotary_emb_transposed` `:53`)."""
    x_f = x.astype(jnp.float32)
    x_r = x_f.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x_r[..., 0], x_r[..., 1]
    x_rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x_f * cos + x_rot * sin).astype(x.dtype)


class HeliosAttention(Module):
    """qk-RMSNorm-across-heads attention with optional learned history key
    amplification (reference `:159`; amplify `:133`)."""

    def __init__(self, dim: int, heads: int = 8, dim_head: int = 64, eps: float = 1e-5,
                 cross_attention_dim_head: Optional[int] = None,
                 is_amplify_history: bool = False, history_scale_mode: str = "per_head"):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = dim_head * heads
        self.kv_inner_dim = self.inner_dim if cross_attention_dim_head is None else cross_attention_dim_head * heads
        self.to_q = Linear(dim, self.inner_dim, use_bias=True)
        self.to_k = Linear(dim, self.kv_inner_dim, use_bias=True)
        self.to_v = Linear(dim, self.kv_inner_dim, use_bias=True)
        self.to_out = ModuleList([Linear(self.inner_dim, dim, use_bias=True)])
        self.norm_q = RMSNorm(self.inner_dim, eps=eps)
        self.norm_k = RMSNorm(self.kv_inner_dim, eps=eps)
        self.is_amplify_history = is_amplify_history
        self.history_scale_mode = history_scale_mode
        self.max_scale = 10.0

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.is_amplify_history:
            n = self.heads if self.history_scale_mode == "per_head" else 1
            params["history_key_scale"] = jnp.ones((n,), jnp.float32)
        return params

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
                 history_seq_len: int = 0) -> jax.Array:
        b = hidden_states.shape[0]
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self.norm_q(params["norm_q"], self.to_q(params["to_q"], hidden_states))
        k = self.norm_k(params["norm_k"], self.to_k(params["to_k"], context))
        v = self.to_v(params["to_v"], context)
        q = q.reshape(b, -1, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        if rotary_emb is not None:
            cos, sin = rotary_emb
            q = _apply_rope_interleaved(q, cos, sin)
            k = _apply_rope_interleaved(k, cos, sin)
        if self.is_amplify_history and encoder_hidden_states is None and history_seq_len > 0:
            scale = 1.0 + jax.nn.sigmoid(params["history_key_scale"]) * (self.max_scale - 1.0)
            if self.history_scale_mode == "per_head":
                scale = scale.reshape(1, 1, -1, 1)
            k = jnp.concatenate([k[:, :history_seq_len] * scale, k[:, history_seq_len:]], axis=1)
        out = dispatch_attention_fn(q, k, v)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class HeliosTimeTextEmbedding(Module):
    """Reference `:290`."""

    def __init__(self, dim: int, time_freq_dim: int, time_proj_dim: int, text_embed_dim: int):
        super().__init__()
        self.timesteps_proj = Timesteps(num_channels=time_freq_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(in_channels=time_freq_dim, time_embed_dim=dim)
        self.time_proj = Linear(dim, time_proj_dim)
        self.text_embedder = PixArtAlphaTextProjection(text_embed_dim, dim, act_fn="gelu_tanh")

    def __call__(self, params: Params, timestep: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 is_return_encoder_hidden_states: bool = True):
        dtype = params["time_embedder"]["linear_1"]["kernel"].dtype
        temb = self.time_embedder(params["time_embedder"],
                                  self.timesteps_proj({}, timestep).astype(dtype))
        timestep_proj = self.time_proj(params["time_proj"], jax.nn.silu(temb))
        if encoder_hidden_states is not None and is_return_encoder_hidden_states:
            encoder_hidden_states = self.text_embedder(params["text_embedder"], encoder_hidden_states)
        return temb, timestep_proj, encoder_hidden_states


class HeliosTransformerBlock(Module):
    """Reference `:378`; per-token [B, 6, S, D] modulation, history-aware
    self-attention, guidance cross-attention over the current chunk only."""

    def __init__(self, dim: int, ffn_dim: int, num_heads: int, qk_norm: str = "rms_norm_across_heads",
                 cross_attn_norm: bool = False, eps: float = 1e-6,
                 guidance_cross_attn: bool = False, is_amplify_history: bool = False,
                 history_scale_mode: str = "per_head"):
        super().__init__()
        self.dim = dim
        self.guidance_cross_attn = guidance_cross_attn
        self.norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn1 = HeliosAttention(dim, num_heads, dim // num_heads, eps=eps,
                                     is_amplify_history=is_amplify_history,
                                     history_scale_mode=history_scale_mode)
        self.attn2 = HeliosAttention(dim, num_heads, dim // num_heads, eps=eps,
                                     cross_attention_dim_head=dim // num_heads)
        self.cross_attn_norm = cross_attn_norm
        if cross_attn_norm:
            self.norm2 = LayerNorm(dim, eps=eps, use_scale=True, use_bias=True)
        self.ffn = FeedForward(dim, inner_dim=ffn_dim, activation_fn="gelu-approximate")
        self.norm3 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 6)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 6, self.dim), jnp.float32) / self.dim**0.5
        ).astype(jnp.float32)
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, rotary_emb,
                 original_context_length: int):
        # temb: [B, 6, D] (broadcast) or [B, 6, S, D] (per-token)
        if temb.ndim == 3:
            mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)
            shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = [
                m.squeeze(1)[:, None] for m in jnp.split(mods, 6, axis=1)
            ]
        else:
            mods = params["scale_shift_table"].astype(jnp.float32)[:, :, None] + temb.astype(jnp.float32)
            shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = [
                m.squeeze(1) for m in jnp.split(mods, 6, axis=1)
            ]
        dtype = hidden_states.dtype
        history_len = hidden_states.shape[1] - original_context_length

        norm_h = (self.norm1({}, hidden_states.astype(jnp.float32)) * (1 + scale_msa) + shift_msa).astype(dtype)
        attn_out = self.attn1(params["attn1"], norm_h, None, rotary_emb, history_seq_len=history_len)
        hidden_states = (hidden_states.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa).astype(dtype)

        if self.guidance_cross_attn and history_len > 0:
            history, current = hidden_states[:, :history_len], hidden_states[:, history_len:]
            norm_c = self.norm2(params["norm2"], current.astype(jnp.float32)).astype(dtype) \
                if self.cross_attn_norm else current
            current = current + self.attn2(params["attn2"], norm_c, encoder_hidden_states)
            hidden_states = jnp.concatenate([history, current], axis=1)
        else:
            norm_h = self.norm2(params["norm2"], hidden_states.astype(jnp.float32)).astype(dtype) \
                if self.cross_attn_norm else hidden_states
            hidden_states = hidden_states + self.attn2(params["attn2"], norm_h, encoder_hidden_states)

        norm_h = (self.norm3({}, hidden_states.astype(jnp.float32)) * (1 + c_scale_msa) + c_shift_msa).astype(dtype)
        ff_out = self.ffn(params["ffn"], norm_h)
        hidden_states = (hidden_states.astype(jnp.float32) + ff_out.astype(jnp.float32) * c_gate_msa).astype(dtype)
        return hidden_states


class HeliosOutputNorm(Module):
    """Reference `:84`: per-token 2-part adaLN over the current chunk only."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.dim = dim
        self.norm = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"scale_shift_table": (jax.random.normal(key, (1, 2, self.dim), jnp.float32)
                                      / self.dim**0.5).astype(jnp.float32)}

    def __call__(self, params: Params, hidden_states: jax.Array, temb: jax.Array,
                 original_context_length: int) -> jax.Array:
        temb = temb[:, -original_context_length:, :]
        mods = params["scale_shift_table"][None].astype(jnp.float32) + temb.astype(jnp.float32)[:, :, None]
        shift, scale = [m.squeeze(2) for m in jnp.split(mods, 2, axis=2)]
        hidden_states = hidden_states[:, -original_context_length:, :]
        out = self.norm({}, hidden_states.astype(jnp.float32)) * (1 + scale) + shift
        return out.astype(hidden_states.dtype)


class HeliosPatchEmbed(Conv3d):
    """Bare Conv3d patchify (matches the reference's `nn.Conv3d` state-dict
    layout) over channel-first input -> [B, S, D] tokens."""

    def __init__(self, in_channels: int, inner_dim: int, patch_size: Tuple[int, int, int]):
        super().__init__(in_channels, inner_dim, kernel_size=tuple(patch_size), stride=tuple(patch_size))

    def __call__(self, params: Params, x: jax.Array):
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = super().__call__(params, x)
        post = x.shape[1:4]
        return x.reshape(x.shape[0], -1, x.shape[-1]), post


class HeliosTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Reference `:501`. Input/output are channel-first [B, C, F, H, W]."""

    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        num_attention_heads: int = 40,
        attention_head_dim: int = 128,
        in_channels: int = 16,
        out_channels: int = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 13824,
        num_layers: int = 40,
        cross_attn_norm: bool = True,
        qk_norm: Optional[str] = "rms_norm_across_heads",
        eps: float = 1e-6,
        added_kv_proj_dim: Optional[int] = None,
        rope_dim: Tuple[int, ...] = (44, 42, 42),
        rope_theta: float = 10000.0,
        guidance_cross_attn: bool = True,
        zero_history_timestep: bool = True,
        has_multi_term_memory_patch: bool = True,
        is_amplify_history: bool = False,
        history_scale_mode: str = "per_head",
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels or in_channels

        self.rope = HeliosRotaryPosEmbed(rope_dim=rope_dim, theta=rope_theta)
        self.patch_embedding = HeliosPatchEmbed(in_channels, inner_dim, tuple(patch_size))
        if has_multi_term_memory_patch:
            self.patch_short = HeliosPatchEmbed(in_channels, inner_dim, tuple(patch_size))
            self.patch_mid = HeliosPatchEmbed(in_channels, inner_dim, tuple(2 * p for p in patch_size))
            self.patch_long = HeliosPatchEmbed(in_channels, inner_dim, tuple(4 * p for p in patch_size))
        self.condition_embedder = HeliosTimeTextEmbedding(
            dim=inner_dim, time_freq_dim=freq_dim, time_proj_dim=inner_dim * 6, text_embed_dim=text_dim)
        self.blocks = ModuleList([
            HeliosTransformerBlock(inner_dim, ffn_dim, num_attention_heads, qk_norm, cross_attn_norm,
                                   eps, guidance_cross_attn=guidance_cross_attn,
                                   is_amplify_history=is_amplify_history,
                                   history_scale_mode=history_scale_mode)
            for _ in range(num_layers)
        ])
        self.norm_out = HeliosOutputNorm(inner_dim, eps)
        self.proj_out = Linear(inner_dim, self.out_channels * math.prod(patch_size))

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S_txt, text_dim]
        indices_hidden_states: Optional[jax.Array] = None,
        indices_latents_history_short: Optional[jax.Array] = None,
        indices_latents_history_mid: Optional[jax.Array] = None,
        indices_latents_history_long: Optional[jax.Array] = None,
        latents_history_short: Optional[jax.Array] = None,
        latents_history_mid: Optional[jax.Array] = None,
        latents_history_long: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size = hidden_states.shape[0]
        p_t, p_h, p_w = self.config.patch_size

        hidden_states, post = self.patch_embedding(params["patch_embedding"], hidden_states)
        post_f, post_h, post_w = post
        if indices_hidden_states is None:
            indices_hidden_states = jnp.broadcast_to(jnp.arange(post_f)[None], (batch_size, post_f))

        rotary = self.rope(indices_hidden_states, post_h, post_w)
        rotary = rotary.reshape(batch_size, rotary.shape[1], -1).transpose(0, 2, 1)
        original_context_length = hidden_states.shape[1]

        streams = []  # (tokens, flattened rope), prepended long->mid->short
        H1 = W1 = None
        if latents_history_short is not None and indices_latents_history_short is not None:
            tokens, _ = self.patch_short(params["patch_short"], latents_history_short)
            # short stream uses its own post-patch spatial dims for rope
            H1 = latents_history_short.shape[3] // p_h
            W1 = latents_history_short.shape[4] // p_w
            freqs = self.rope(indices_latents_history_short, H1, W1)
            freqs = freqs.reshape(batch_size, freqs.shape[1], -1).transpose(0, 2, 1)
            streams.append((tokens, freqs))
        if latents_history_mid is not None and indices_latents_history_mid is not None:
            x = _pad_replicate_3d(latents_history_mid, (2 * p_t, 2 * p_h, 2 * p_w))
            tokens, _ = self.patch_mid(params["patch_mid"], x)
            freqs = self.rope(indices_latents_history_mid, H1, W1)
            freqs = _avg_pool_3d(_pad_replicate_3d(freqs, (2, 2, 2)), (2, 2, 2))
            freqs = freqs.reshape(batch_size, freqs.shape[1], -1).transpose(0, 2, 1)
            streams.insert(0, (tokens, freqs))
        if latents_history_long is not None and indices_latents_history_long is not None:
            x = _pad_replicate_3d(latents_history_long, (4 * p_t, 4 * p_h, 4 * p_w))
            tokens, _ = self.patch_long(params["patch_long"], x)
            freqs = self.rope(indices_latents_history_long, H1, W1)
            freqs = _avg_pool_3d(_pad_replicate_3d(freqs, (4, 4, 4)), (4, 4, 4))
            freqs = freqs.reshape(batch_size, freqs.shape[1], -1).transpose(0, 2, 1)
            streams.insert(0, (tokens, freqs))

        for tokens, freqs in reversed(streams):
            hidden_states = jnp.concatenate([tokens, hidden_states], axis=1)
            rotary = jnp.concatenate([freqs, rotary], axis=1)

        cos, sin = jnp.split(rotary, 2, axis=-1)
        rotary_emb = (cos[:, :, None, :], sin[:, :, None, :])
        history_context_length = hidden_states.shape[1] - original_context_length

        # condition embeddings; history tokens get t=0 modulation (reference `:795`)
        temb, timestep_proj, encoder_hidden_states = self.condition_embedder(
            params["condition_embedder"], timestep, encoder_hidden_states)
        timestep_proj = timestep_proj.reshape(batch_size, 1, 6, -1)

        if self.config.zero_history_timestep:
            main_len = original_context_length
        else:
            main_len = hidden_states.shape[1]
        temb_tok = jnp.broadcast_to(temb[:, None], (batch_size, main_len, temb.shape[-1]))
        proj_tok = jnp.broadcast_to(jnp.transpose(timestep_proj, (0, 2, 1, 3)),
                                    (batch_size, 6, main_len, timestep_proj.shape[-1]))

        if self.config.zero_history_timestep and history_context_length > 0:
            t0 = jnp.zeros((1,), timestep.dtype)
            temb_t0, proj_t0, _ = self.condition_embedder(
                params["condition_embedder"], t0, None, is_return_encoder_hidden_states=False)
            temb_t0 = jnp.broadcast_to(temb_t0[:, None], (batch_size, history_context_length, temb.shape[-1]))
            proj_t0 = jnp.broadcast_to(proj_t0.reshape(1, 6, 1, -1),
                                       (batch_size, 6, history_context_length, timestep_proj.shape[-1]))
            temb_tok = jnp.concatenate([temb_t0, temb_tok], axis=1)
            proj_tok = jnp.concatenate([proj_t0, proj_tok], axis=2)

        for i, block in enumerate(self.blocks):
            hidden_states = block(params["blocks"][i], hidden_states, encoder_hidden_states,
                                  proj_tok, rotary_emb, original_context_length)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb_tok,
                                      original_context_length)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        # unpatchify (reference `:851-855`)
        hidden_states = hidden_states.reshape(
            batch_size, post_f, post_h, post_w, p_t, p_h, p_w, -1)
        hidden_states = jnp.transpose(hidden_states, (0, 7, 1, 4, 2, 5, 3, 6))
        output = hidden_states.reshape(
            batch_size, -1, post_f * p_t, post_h * p_h, post_w * p_w)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

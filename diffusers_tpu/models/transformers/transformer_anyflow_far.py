"""AnyFlowFARTransformer3DModel — causal (FAR) sibling of transformer_anyflow.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_anyflow_far.py:961`):
the AnyFlow flow-map Wan backbone extended for chunk-wise autoregressive
generation (FAR, arXiv:2503.19325):

  * dual patch embedding — full-resolution `patch_embedding` for the noisy
    chunk suffix and a larger-stride `far_patch_embedding` for the
    FAR-compressed context prefix (`:1057`), warm-started by trilinear
    interpolation of the full kernel (`:1065`)
  * a chunk-causal attention mask (`_build_far_block_mask_from_far_cfg`,
    `:843`): context/noise(/clean) intervals with frame-level causality,
    noise→noise restricted to the same chunk, clean→noise disallowed and
    noise→clean disallowed on the same chunk
  * compressed-branch rotary tables built by complex average-pooling of the
    full-resolution frequency table, re-normalized to unit modulus (`:679`)
  * a KV cache over (compressed, full) context tokens: keys/values are cached
    PRE-rotary and re-rotated with the full position table on every
    autoregressive read (`:135-169`)
  * the dual-timestep (t, r) flow-map embedding with per-segment
    token_per_frame expansion (`AnyFlowDualTimestepTextImageEmbeddingCausal`,
    `:396`)

TPU-native notes: the reference needs torch flex_attention BlockMasks (128
padding, flex backend). Here the chunk-causal mask is a host-built additive
[S, S] table fed to the dispatched attention — XLA fuses the mask add into
the softmax, no padding or special backend needed. The functional KV cache is
a per-block pytree of fixed-capacity arrays updated with static slice sizes
(host-int token counts), so each AR chunk step jits cleanly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import apply_rotary_emb
from ..modeling_utils import ModelMixin
from .transformer_anyflow import AnyFlowDualTimestepTextImageEmbedding
from .transformer_wan import Transformer3DModelOutput, WanAttention


@dataclass
class AnyFlowFARTransformerOutput(BaseOutput):
    sample: Optional[jax.Array] = None
    kv_cache: Optional[List[Dict[str, jax.Array]]] = None


# --------------------------------------------------------------------- rope


def _complex_freqs(dim: int, max_seq_len: int, theta: float) -> np.ndarray:
    """[max_seq_len, dim/2] complex128 rotation table (reference
    get_1d_rotary_pos_embed with use_real=False)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.outer(np.arange(max_seq_len, dtype=np.float64), freqs)
    return np.exp(1j * angles)


def _avg_pool_complex(freq: np.ndarray, kernel: int) -> np.ndarray:
    """Average complex rotations over non-overlapping windows, re-normalized
    to unit modulus (reference `avg_pool_complex`, `:679`)."""
    n = (freq.shape[0] // kernel) * kernel
    pooled = freq[:n].reshape(-1, kernel, freq.shape[1]).mean(axis=1)
    return pooled / np.abs(pooled)


class AnyFlowCausalRotaryPosEmbed:
    """FAR rotary tables: full-resolution grid + avg-pooled compressed grid
    (reference `:620`). Host-side numpy float64; returns the repo interleaved
    (cos, sin) convention consumed by `apply_rotary_emb`."""

    def __init__(self, attention_head_dim: int, patch_size, compressed_patch_size,
                 max_seq_len: int, theta: float = 10000.0):
        self.attention_head_dim = attention_head_dim
        self.patch_size = tuple(patch_size)
        self.compressed_patch_size = tuple(compressed_patch_size)
        h_dim = w_dim = 2 * (attention_head_dim // 6)
        t_dim = attention_head_dim - h_dim - w_dim
        self.dims = (t_dim, h_dim, w_dim)
        self.freqs = [_complex_freqs(d, max_seq_len, theta) for d in self.dims]

    @staticmethod
    def _grid(freq_axes, ppf, pph, ppw):
        ff = np.broadcast_to(freq_axes[0][:ppf][:, None, None], (ppf, pph, ppw, freq_axes[0].shape[-1]))
        fh = np.broadcast_to(freq_axes[1][:pph][None, :, None], (ppf, pph, ppw, freq_axes[1].shape[-1]))
        fw = np.broadcast_to(freq_axes[2][:ppw][None, None, :], (ppf, pph, ppw, freq_axes[2].shape[-1]))
        return np.concatenate([ff, fh, fw], axis=-1).reshape(ppf * pph * ppw, -1)

    def __call__(self, far_cfg: Dict[str, Any], has_clean: bool = False):
        full = self._grid(self.freqs, far_cfg["total_frames"], *far_cfg["full_frame_shape"])
        downscale = [self.compressed_patch_size[i] // self.patch_size[i] for i in range(3)]
        pooled = [_avg_pool_complex(f, k) if k > 1 else f for f, k in zip(self.freqs, downscale)]
        cshape = far_cfg["compressed_frame_shape"]
        n_comp_tokens = far_cfg["num_compressed_frames"] * far_cfg["compressed_token_per_frame"]
        if far_cfg["num_compressed_frames"] > 0 and min(cshape) > 0:
            comp = self._grid(pooled, far_cfg["total_frames"], *cshape)
            comp = comp[:n_comp_tokens]
        else:
            comp = np.zeros((0, full.shape[1]), dtype=full.dtype)
        full = full[far_cfg["num_compressed_frames"] * far_cfg["full_token_per_frame"]:]
        freqs = np.concatenate([comp, full, full] if has_clean else [comp, full], axis=0)
        cos = np.repeat(freqs.real.astype(np.float32), 2, axis=1)
        sin = np.repeat(freqs.imag.astype(np.float32), 2, axis=1)
        return jnp.asarray(cos), jnp.asarray(sin)  # [N, head_dim]


# --------------------------------------------------------------------- mask


def build_far_attention_mask(far_cfg: Dict[str, Any], has_clean: bool = False) -> jax.Array:
    """Chunk-causal additive mask [1, 1, S, S] (reference
    `_build_far_block_mask_from_far_cfg`, `:843` — same predicate, expressed
    as a dense host-built table instead of a flex BlockMask; no 128 padding
    because the dispatched attention takes arbitrary static shapes)."""
    chunk_partition = list(far_cfg["chunk_partition"])
    ncc = far_cfg["num_compressed_chunk"]
    ctx_len = far_cfg["num_compressed_frames"] * far_cfg["compressed_token_per_frame"]
    noise_len = far_cfg["num_full_frames"] * far_cfg["full_token_per_frame"]

    frame_idx = []
    for ci, cl in enumerate(chunk_partition[:ncc]):
        frame_idx.append(np.full(cl * far_cfg["compressed_token_per_frame"], ci))
    for ci, cl in enumerate(chunk_partition[ncc:]):
        frame_idx.append(np.full(cl * far_cfg["full_token_per_frame"], ci + ncc))
    if has_clean:
        for ci, cl in enumerate(chunk_partition[ncc:]):
            frame_idx.append(np.full(cl * far_cfg["full_token_per_frame"], ci + ncc))
    frame_idx = np.concatenate(frame_idx)
    s = frame_idx.shape[0]
    fq, fk = frame_idx[:, None], frame_idx[None, :]
    allowed = fq >= fk  # chunk causal
    if has_clean:
        noise_start, noise_end = ctx_len, ctx_len + noise_len
        clean_start, clean_end = noise_end, noise_end + noise_len
        idx = np.arange(s)
        q_is_noise = ((idx >= noise_start) & (idx < noise_end))[:, None]
        q_is_clean = ((idx >= clean_start) & (idx < clean_end))[:, None]
        k_is_noise = ((idx >= noise_start) & (idx < noise_end))[None, :]
        k_is_clean = ((idx >= clean_start) & (idx < clean_end))[None, :]
        same = fq == fk
        allowed &= ~(q_is_clean & k_is_noise)                      # clean -> noise
        allowed &= ~(q_is_noise & k_is_noise) | same               # noise -> noise: same chunk only
        allowed &= ~(q_is_noise & k_is_clean & same)               # noise -> clean: same chunk banned
    # no-clean branch (reference `:945`): frame-causality only
    add = np.where(allowed, 0.0, -1e9).astype(np.float32)
    return jnp.asarray(add)[None, None]


# ---------------------------------------------------------------- attention


class AnyFlowFARAttention(Module):
    """Self-attention with functional FAR KV cache (reference
    AnyFlowCausalAttnProcessor `:71`). Keys/values cache PRE-rotary; the read
    path concatenates [compressed ‖ full ‖ current] and re-rotates keys with
    the full position table."""

    def __init__(self, dim: int, heads: int, dim_head: int, eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = heads * dim_head
        self.to_q = Linear(dim, self.inner_dim, use_bias=True)
        self.to_k = Linear(dim, self.inner_dim, use_bias=True)
        self.to_v = Linear(dim, self.inner_dim, use_bias=True)
        self.to_out = ModuleList([Linear(self.inner_dim, dim, use_bias=True)])
        self.norm_q = RMSNorm(self.inner_dim, eps=eps)
        self.norm_k = RMSNorm(self.inner_dim, eps=eps)

    def __call__(self, params: Params, hidden_states: jax.Array,
                 rotary_emb: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
                 attention_mask: Optional[jax.Array] = None,
                 kv_cache: Optional[Dict[str, jax.Array]] = None,
                 kv_cache_flag: Optional[Dict[str, Any]] = None):
        b = hidden_states.shape[0]
        q = self.norm_q(params["norm_q"], self.to_q(params["to_q"], hidden_states))
        k = self.norm_k(params["norm_k"], self.to_k(params["to_k"], hidden_states))
        v = self.to_v(params["to_v"], hidden_states)
        q = q.reshape(b, -1, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)

        new_cache = kv_cache
        if kv_cache is not None:
            if kv_cache_flag["is_cache_step"]:
                nct = kv_cache_flag["num_compressed_tokens"]
                nft = kv_cache_flag["num_full_tokens"]
                new_cache = dict(kv_cache)
                new_cache["compressed_k"] = kv_cache["compressed_k"].at[:, :nct].set(k[:, :nct])
                new_cache["compressed_v"] = kv_cache["compressed_v"].at[:, :nct].set(v[:, :nct])
                new_cache["full_k"] = kv_cache["full_k"].at[:, :nft].set(k[:, nct:])
                new_cache["full_v"] = kv_cache["full_v"].at[:, :nft].set(v[:, nct:])
            else:
                ncct = kv_cache_flag["num_cached_compressed_tokens"]
                ncft = kv_cache_flag["num_cached_full_tokens"]
                k = jnp.concatenate([kv_cache["compressed_k"][:, :ncct],
                                     kv_cache["full_k"][:, :ncft], k], axis=1)
                v = jnp.concatenate([kv_cache["compressed_v"][:, :ncct],
                                     kv_cache["full_v"][:, :ncft], v], axis=1)

        cos_q, sin_q, cos_k, sin_k = rotary_emb
        q = apply_rotary_emb(q, cos_q, sin_q)
        k = apply_rotary_emb(k, cos_k, sin_k)

        if kv_cache is not None and not kv_cache_flag["is_cache_step"]:
            # Reference AR read (`:171-181`): flex attention zero-pads q AND
            # k/v by the QUERY's 128-alignment pad and runs with NO mask, so
            # the pad KEYS contribute exp(0) terms to every softmax
            # denominator. The released checkpoints bake in these numerics;
            # replicate them (pad count follows the query length, per the
            # reference's `pad_shape`).
            pad = (-q.shape[1]) % 128
            if pad:
                k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out), new_cache


class AnyFlowFARTransformerBlock(Module):
    """Reference AnyFlowTransformerBlock (`:512`) with the causal processor:
    per-token AdaLN modulation, FAR self-attention, plain cross-attention."""

    def __init__(self, dim, ffn_dim, num_heads, cross_attn_norm=False, eps=1e-6):
        super().__init__()
        self.dim = dim
        self.norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn1 = AnyFlowFARAttention(dim, num_heads, dim // num_heads, eps=eps)
        self.attn2 = WanAttention(dim=dim, heads=num_heads, dim_head=dim // num_heads, eps=eps)
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

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 rotary_emb, attention_mask=None, kv_cache=None, kv_cache_flag=None):
        # temb: [B, N, 6, D] per-token modulation (reference `:578`)
        mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            m.squeeze(2) for m in jnp.split(mods, 6, axis=2)
        ]
        dtype = hidden_states.dtype

        norm_h = (self.norm1({}, hidden_states.astype(jnp.float32)) * (1 + scale_msa) + shift_msa).astype(dtype)
        attn_out, new_cache = self.attn1(params["attn1"], norm_h, rotary_emb,
                                         attention_mask, kv_cache, kv_cache_flag)
        hidden_states = (hidden_states.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa).astype(dtype)

        if self.cross_attn_norm:
            norm_h = self.norm2(params["norm2"], hidden_states.astype(jnp.float32)).astype(dtype)
        else:
            norm_h = hidden_states
        hidden_states = hidden_states + self.attn2(params["attn2"], norm_h, encoder_hidden_states, None)

        norm_h = (self.norm3({}, hidden_states.astype(jnp.float32)) * (1 + c_scale) + c_shift).astype(dtype)
        ff_out = self.ffn(params["ffn"], norm_h)
        hidden_states = (hidden_states.astype(jnp.float32) + ff_out.astype(jnp.float32) * c_gate).astype(dtype)
        return hidden_states, new_cache


class AnyFlowDualTimestepTextImageEmbeddingCausal(AnyFlowDualTimestepTextImageEmbedding):
    """Causal dual-timestep embedding (reference `:396`): the per-frame
    timestep stream splits into a compressed prefix and a full suffix, each
    expanded by its own token_per_frame."""

    def forward_timestep(self, params, timestep, delta, dtype, token_per_frame):
        b, f = timestep.shape
        temb = self.time_embedder(params["time_embedder"],
                                  self.timesteps_proj({}, timestep.reshape(-1)).astype(dtype))
        delta_emb = self.delta_embedder(params["delta_embedder"],
                                        self.timesteps_proj({}, delta.reshape(-1)).astype(dtype))
        g = self.gate_value
        rt_emb = (1 - g) * temb + g * delta_emb
        proj = self.time_proj(params["time_proj"], jax.nn.silu(rt_emb))
        rt_emb = jnp.repeat(rt_emb.reshape(b, f, -1), token_per_frame, axis=1)
        proj = jnp.repeat(proj.reshape(b, f, -1), token_per_frame, axis=1)
        return rt_emb, proj

    def __call__(self, params: Params, timestep, r_timestep, encoder_hidden_states,
                 encoder_hidden_states_image=None, far_cfg=None, clean_timestep=None):
        if self.deltatime_type == "r":
            delta = r_timestep
        elif self.deltatime_type == "t-r":
            delta = timestep - r_timestep
        else:
            raise NotImplementedError(self.deltatime_type)
        dtype = encoder_hidden_states.dtype
        nff = far_cfg["num_full_frames"]
        full_t, full_p = self.forward_timestep(
            params, timestep[:, -nff:], delta[:, -nff:], dtype, far_cfg["full_token_per_frame"])
        if timestep.shape[1] > nff:
            comp_t, comp_p = self.forward_timestep(
                params, timestep[:, :-nff], delta[:, :-nff], dtype, far_cfg["compressed_token_per_frame"])
        else:  # AR read: the stream covers only the current chunk's frames
            comp_t = jnp.zeros((timestep.shape[0], 0, full_t.shape[-1]), full_t.dtype)
            comp_p = jnp.zeros((timestep.shape[0], 0, full_p.shape[-1]), full_p.dtype)
        if clean_timestep is not None:
            clean_t, clean_p = self.forward_timestep(
                params, clean_timestep, clean_timestep, dtype, far_cfg["full_token_per_frame"])
            temb = jnp.concatenate([comp_t, full_t, clean_t], axis=1)
            proj = jnp.concatenate([comp_p, full_p, clean_p], axis=1)
        else:
            temb = jnp.concatenate([comp_t, full_t], axis=1)
            proj = jnp.concatenate([comp_p, full_p], axis=1)
        ehs = self.text_embedder(params["text_embedder"], encoder_hidden_states)
        img = None
        if encoder_hidden_states_image is not None and self.image_embedder is not None:
            img = self.image_embedder(params["image_embedder"], encoder_hidden_states_image)
        return temb, proj, ehs, img


class AnyFlowFARTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Causal FAR AnyFlow DiT (reference `:961`). Three forward paths:
    train rollout (`kv_cache=None`), cache-prefill
    (`kv_cache_flag["is_cache_step"]`), and autoregressive read."""

    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, int, int] = (1, 2, 2),
        compressed_patch_size: Tuple[int, int, int] = (1, 4, 4),
        full_chunk_limit: int = 3,
        num_attention_heads: int = 40,
        attention_head_dim: int = 128,
        in_channels: int = 16,
        out_channels: int = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 13824,
        num_layers: int = 40,
        cross_attn_norm: bool = True,
        eps: float = 1e-6,
        image_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        gate_value: float = 0.25,
        deltatime_type: str = "r",
        chunk_partition: Tuple[int, ...] = (1, 3, 3, 3, 3, 3, 3, 2),
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.rope = AnyFlowCausalRotaryPosEmbed(
            attention_head_dim, patch_size, compressed_patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=patch_size, stride=patch_size)
        self.far_patch_embedding = Conv3d(in_channels, inner_dim,
                                          kernel_size=compressed_patch_size, stride=compressed_patch_size)
        self.condition_embedder = AnyFlowDualTimestepTextImageEmbeddingCausal(
            dim=inner_dim, gate_value=gate_value, deltatime_type=deltatime_type,
            time_freq_dim=freq_dim, time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim, image_embed_dim=image_dim)
        self.blocks = ModuleList([
            AnyFlowFARTransformerBlock(inner_dim, ffn_dim, num_attention_heads, cross_attn_norm, eps)
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, out_channels * math.prod(patch_size))

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 47)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        ).astype(dtype)
        return params

    # ---------------------------------------------------------------- setup

    def init_kv_cache(self, batch_size: int, height: int, width: int,
                      chunk_partition: List[int], dtype=jnp.float32) -> List[Dict[str, jax.Array]]:
        """Allocate fixed-capacity per-block caches sized for the full video
        (reference: pipeline-side cache allocation)."""
        ftpf = (height // self.config.patch_size[1]) * (width // self.config.patch_size[2])
        ctpf = (height // self.config.compressed_patch_size[1]) * (width // self.config.compressed_patch_size[2])
        total_frames = sum(chunk_partition)
        h, d = self.config.num_attention_heads, self.config.attention_head_dim
        cap_c = max(total_frames * ctpf, 1)
        cap_f = max(total_frames * ftpf, 1)
        one = {
            "compressed_k": jnp.zeros((batch_size, cap_c, h, d), dtype),
            "compressed_v": jnp.zeros((batch_size, cap_c, h, d), dtype),
            "full_k": jnp.zeros((batch_size, cap_f, h, d), dtype),
            "full_v": jnp.zeros((batch_size, cap_f, h, d), dtype),
        }
        return [dict(one) for _ in range(self.config.num_layers)]

    def _far_cfg(self, chunk_partition, height, width, threshold):
        total_chunks = len(chunk_partition)
        if total_chunks > threshold:
            ncc = total_chunks - threshold
        else:
            ncc = 0
        return {
            "total_frames": sum(chunk_partition),
            "num_full_chunk": total_chunks - ncc,
            "num_compressed_chunk": ncc,
            "num_full_frames": sum(chunk_partition[ncc:]),
            "num_compressed_frames": sum(chunk_partition[:ncc]),
            "full_frame_shape": (height // self.config.patch_size[1], width // self.config.patch_size[2]),
            "compressed_frame_shape": (height // self.config.compressed_patch_size[1],
                                       width // self.config.compressed_patch_size[2]),
            "full_token_per_frame": (height // self.config.patch_size[1]) * (width // self.config.patch_size[2]),
            "compressed_token_per_frame": (height // self.config.compressed_patch_size[1])
            * (width // self.config.compressed_patch_size[2]),
            "chunk_partition": list(chunk_partition),
        }

    def _far_patchify(self, params, hidden_states, far_cfg, clean_hidden_states=None):
        ncf = far_cfg["num_compressed_frames"]
        # NDHWC for our Conv3d
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        full = x[:, ncf:]
        full_tok = self.patch_embedding(params["patch_embedding"], full)
        full_tok = full_tok.reshape(full_tok.shape[0], -1, full_tok.shape[-1])
        if clean_hidden_states is not None:
            clean = jnp.transpose(clean_hidden_states, (0, 2, 3, 4, 1))
            clean_tok = self.patch_embedding(params["patch_embedding"], clean)
            clean_tok = clean_tok.reshape(clean_tok.shape[0], -1, clean_tok.shape[-1])
            full_tok = jnp.concatenate([full_tok, clean_tok], axis=1)
        if ncf > 0:
            comp = x[:, :ncf]
            comp_tok = self.far_patch_embedding(params["far_patch_embedding"], comp)
            comp_tok = comp_tok.reshape(comp_tok.shape[0], -1, comp_tok.shape[-1])
            return jnp.concatenate([comp_tok, full_tok], axis=1)
        return full_tok

    def _unpack_latent_sequence(self, latents, num_frames, height, width):
        p = self.config.patch_size[1]
        b, n, c = latents.shape
        h, w = height // p, width // p
        out_c = c // (p * p)
        latents = latents.reshape(b * num_frames, h, w, p, p, out_c)
        latents = jnp.transpose(latents, (0, 5, 1, 3, 2, 4))
        return latents.reshape(b, num_frames, out_c, h * p, w * p)

    # -------------------------------------------------------------- forward

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, F, C, H, W]
        timestep: jax.Array,  # [B, F_total]
        r_timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        chunk_partition: List[int],
        encoder_hidden_states_image: Optional[jax.Array] = None,
        clean_hidden_states: Optional[jax.Array] = None,
        clean_timestep: Optional[jax.Array] = None,
        kv_cache: Optional[List[Dict[str, jax.Array]]] = None,
        kv_cache_flag: Optional[Dict[str, Any]] = None,
        attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        hidden_states = jnp.transpose(hidden_states, (0, 2, 1, 3, 4))  # [B, C, F, H, W]
        b, c, f, height, width = hidden_states.shape
        if clean_hidden_states is not None:
            clean_hidden_states = jnp.transpose(clean_hidden_states, (0, 2, 1, 3, 4))

        if kv_cache is not None and not kv_cache_flag.get("is_cache_step", False):
            return self._forward_inference(
                params, hidden_states, chunk_partition, timestep, r_timestep,
                encoder_hidden_states, encoder_hidden_states_image, kv_cache,
                kv_cache_flag, height, width, return_dict)

        threshold = (self.config.full_chunk_limit - 1) if kv_cache is not None else self.config.full_chunk_limit
        far_cfg = self._far_cfg(chunk_partition, height, width, threshold)
        has_clean = clean_hidden_states is not None
        if kv_cache is not None:
            kv_cache_flag = dict(kv_cache_flag)
            kv_cache_flag["num_full_tokens"] = far_cfg["num_full_frames"] * far_cfg["full_token_per_frame"]
            kv_cache_flag["num_compressed_tokens"] = (
                far_cfg["num_compressed_frames"] * far_cfg["compressed_token_per_frame"])
        if attention_mask is None:
            attention_mask = build_far_attention_mask(far_cfg, has_clean=has_clean)

        cos, sin = self.rope(far_cfg, has_clean=has_clean)
        rotary = (cos, sin, cos, sin)

        x = self._far_patchify(params, hidden_states, far_cfg, clean_hidden_states)
        temb, proj, ehs, img = self.condition_embedder(
            params["condition_embedder"], timestep, r_timestep, encoder_hidden_states,
            encoder_hidden_states_image, far_cfg=far_cfg, clean_timestep=clean_timestep)
        proj = proj.reshape(b, proj.shape[1], 6, -1)
        if img is not None:
            ehs = jnp.concatenate([img, ehs], axis=1)

        new_caches = [] if kv_cache is not None else None
        for i, block in enumerate(self.blocks):
            cache_i = kv_cache[i] if kv_cache is not None else None
            x, updated = block(params["blocks"][i], x, ehs, proj, rotary,
                               attention_mask, cache_i, kv_cache_flag)
            if new_caches is not None:
                new_caches.append(updated)

        if kv_cache is not None:
            # cache-prefill path produces no usable sample (reference `:1499`)
            if not return_dict:
                return None, new_caches
            return AnyFlowFARTransformerOutput(sample=None, kv_cache=new_caches)

        shift, scale = [
            m.squeeze(2) for m in jnp.split(
                params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, :, None], 2, axis=2)
        ]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale) + shift).astype(x.dtype)
        if has_clean:
            x = x[:, : -(far_cfg["num_full_frames"] * far_cfg["full_token_per_frame"])]
        x = self.proj_out(params["proj_out"],
                          x[:, far_cfg["num_compressed_frames"] * far_cfg["compressed_token_per_frame"]:])
        output = self._unpack_latent_sequence(x, far_cfg["num_full_frames"], height, width)
        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)

    def _forward_inference(self, params, hidden_states, chunk_partition, timestep,
                           r_timestep, encoder_hidden_states, encoder_hidden_states_image,
                           kv_cache, kv_cache_flag, height, width, return_dict):
        b = hidden_states.shape[0]
        total_chunks = 1 + kv_cache_flag["num_cached_chunks"]
        if total_chunks >= self.config.full_chunk_limit:
            num_full_chunk = self.config.full_chunk_limit
            ncc = total_chunks - self.config.full_chunk_limit
        else:
            num_full_chunk, ncc = total_chunks, 0
        far_cfg = self._far_cfg(chunk_partition, height, width, len(chunk_partition))  # shapes only
        far_cfg["num_compressed_chunk"] = ncc
        far_cfg["num_full_frames"] = sum(chunk_partition[ncc:])
        far_cfg["num_compressed_frames"] = sum(chunk_partition[:ncc])
        kv_cache_flag = dict(kv_cache_flag)
        kv_cache_flag["is_cache_step"] = False
        kv_cache_flag["num_cached_full_tokens"] = (
            sum(chunk_partition[ncc: ncc + num_full_chunk - 1]) * far_cfg["full_token_per_frame"])
        kv_cache_flag["num_cached_compressed_tokens"] = (
            sum(chunk_partition[:ncc]) * far_cfg["compressed_token_per_frame"])

        # NDHWC patchify of just the current chunk
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)
        x = x.reshape(b, -1, x.shape[-1])

        cos, sin = self.rope(far_cfg, has_clean=False)
        rotary = (cos[-x.shape[1]:], sin[-x.shape[1]:], cos, sin)

        temb, proj, ehs, img = self.condition_embedder(
            params["condition_embedder"], timestep, r_timestep, encoder_hidden_states,
            encoder_hidden_states_image, far_cfg=far_cfg)
        proj = proj.reshape(b, proj.shape[1], 6, -1)
        if img is not None:
            ehs = jnp.concatenate([img, ehs], axis=1)
        # the timestep stream covers all frames; modulation applies to the
        # current chunk's tokens only (reference `_forward_inference` passes the
        # full stream but hidden length == current chunk tokens)
        proj = proj[:, -x.shape[1]:]
        temb = temb[:, -x.shape[1]:]

        for i, block in enumerate(self.blocks):
            x, _ = block(params["blocks"][i], x, ehs, proj, rotary,
                         None, kv_cache[i], kv_cache_flag)

        shift, scale = [
            m.squeeze(2) for m in jnp.split(
                params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, :, None], 2, axis=2)
        ]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale) + shift).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)
        output = self._unpack_latent_sequence(x, chunk_partition[-1], height, width)
        if not return_dict:
            return output, kv_cache
        return AnyFlowFARTransformerOutput(sample=output, kv_cache=kv_cache)

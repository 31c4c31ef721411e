"""ZImageTransformer2DModel — Z-Image single-stream DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_z_image.py:359`;
ZImageTransformerBlock `:184` (sandwich RMSNorm, tanh gates, 4-param scale
modulation), ZSingleStreamAttnProcessor `:75` (qk RMSNorm + complex RoPE),
FinalLayer `:283`, RopeEmbedder `:313` (theta 256, per-axis complex tables),
token layout `:588-623`: caption tokens at positions (1..cap_len, 0, 0),
image tokens at (cap_pad_len+1, h, w), both padded to multiples of
SEQ_MULTI_OF=32 with learnable pad tokens that ARE attended).

TPU-first: the reference's ragged list-of-tensors batching is replaced by
dense `[B, S]` arrays — per-item caption raggedness is carried as a key
validity mask (attention is permutation/padding-invariant under masking, so
masked dense batching is exactly equivalent to the reference's per-item
compaction), and RoPE tables are gathered host-side (numpy) from the
per-item caption lengths. The unified sequence is [image, caption], image
tokens first, so the final slice is static.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import Timesteps, apply_rotary_emb
from ..modeling_utils import ModelMixin

ADALN_EMBED_DIM = 256
SEQ_MULTI_OF = 32


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class ZImageTimestepEmbedder(Module):
    """256-dim [cos|sin] sinusoid -> Linear -> SiLU -> Linear (reference `:37`)."""

    def __init__(self, out_size: int, mid_size: int = 1024, frequency_embedding_size: int = 256):
        super().__init__()
        self.sinusoid = Timesteps(num_channels=frequency_embedding_size, flip_sin_to_cos=True,
                                  downscale_freq_shift=0)
        self.mlp = ModuleList([Linear(frequency_embedding_size, mid_size, use_bias=True),
                               _Identity(),
                               Linear(mid_size, out_size, use_bias=True)])

    def __call__(self, params: Params, t: jax.Array) -> jax.Array:
        emb = self.sinusoid({}, t.astype(jnp.float32))
        emb = emb.astype(params["mlp"][0]["kernel"].dtype)
        return self.mlp[2](params["mlp"][2], jax.nn.silu(self.mlp[0](params["mlp"][0], emb)))


class _Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x):
        return x


class ZImageAttention(Module):
    """Single-stream attention, qk-RMSNorm per head (reference `:75,:201`)."""

    def __init__(self, dim: int, n_heads: int, qk_norm: bool = True, eps: float = 1e-5):
        super().__init__()
        self.heads = n_heads
        self.head_dim = dim // n_heads
        self.to_q = Linear(dim, dim, use_bias=False)
        self.to_k = Linear(dim, dim, use_bias=False)
        self.to_v = Linear(dim, dim, use_bias=False)
        self.norm_q = RMSNorm(self.head_dim, eps=eps) if qk_norm else None
        self.norm_k = RMSNorm(self.head_dim, eps=eps) if qk_norm else None
        self.to_out = ModuleList([Linear(dim, dim, use_bias=False)])

    def __call__(self, params: Params, x: jax.Array, attn_mask: Optional[jax.Array],
                 freqs: Optional[Tuple[jax.Array, jax.Array]]) -> jax.Array:
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.heads, self.head_dim)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)
        if freqs is not None:
            cos, sin = freqs
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        mask = None
        if attn_mask is not None:
            mask = attn_mask[:, None, None, :]  # key-validity [B,1,1,S]
        out = dispatch_attention_fn(q, k, v, attn_mask=mask)
        out = out.reshape(b, s, -1).astype(x.dtype)
        return self.to_out[0](params["to_out"][0], out)


class ZImageFeedForward(Module):
    def __init__(self, dim: int, hidden_dim: int):
        super().__init__()
        self.w1 = Linear(dim, hidden_dim, use_bias=False)
        self.w2 = Linear(hidden_dim, dim, use_bias=False)
        self.w3 = Linear(dim, hidden_dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.w2(params["w2"], jax.nn.silu(self.w1(params["w1"], x)) * self.w3(params["w3"], x))


class ZImageTransformerBlock(Module):
    """Sandwich-norm block: x += tanh(gate) * norm2(attn(norm1(x) * scale))
    (reference `:226-280`)."""

    def __init__(self, dim: int, n_heads: int, norm_eps: float, qk_norm: bool, modulation: bool = True):
        super().__init__()
        self.dim = dim
        self.modulation = modulation
        self.attention = ZImageAttention(dim, n_heads, qk_norm)
        self.feed_forward = ZImageFeedForward(dim, int(dim / 3 * 8))
        self.attention_norm1 = RMSNorm(dim, eps=norm_eps)
        self.ffn_norm1 = RMSNorm(dim, eps=norm_eps)
        self.attention_norm2 = RMSNorm(dim, eps=norm_eps)
        self.ffn_norm2 = RMSNorm(dim, eps=norm_eps)
        if modulation:
            self.adaLN_modulation = ModuleList([Linear(min(dim, ADALN_EMBED_DIM), 4 * dim, use_bias=True)])

    def __call__(self, params: Params, x: jax.Array, attn_mask: Optional[jax.Array],
                 freqs, adaln_input: Optional[jax.Array] = None) -> jax.Array:
        if self.modulation:
            mod = self.adaLN_modulation[0](params["adaLN_modulation"][0], adaln_input)[:, None]
            scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
            gate_msa, gate_mlp = jnp.tanh(gate_msa), jnp.tanh(gate_mlp)
            attn_out = self.attention(
                params["attention"],
                self.attention_norm1(params["attention_norm1"], x) * (1.0 + scale_msa),
                attn_mask, freqs,
            )
            x = x + gate_msa * self.attention_norm2(params["attention_norm2"], attn_out)
            ff_out = self.feed_forward(
                params["feed_forward"], self.ffn_norm1(params["ffn_norm1"], x) * (1.0 + scale_mlp))
            x = x + gate_mlp * self.ffn_norm2(params["ffn_norm2"], ff_out)
        else:
            attn_out = self.attention(
                params["attention"], self.attention_norm1(params["attention_norm1"], x), attn_mask, freqs)
            x = x + self.attention_norm2(params["attention_norm2"], attn_out)
            ff_out = self.feed_forward(params["feed_forward"], self.ffn_norm1(params["ffn_norm1"], x))
            x = x + self.ffn_norm2(params["ffn_norm2"], ff_out)
        return x


class ZImageFinalLayer(Module):
    def __init__(self, hidden_size: int, out_channels: int):
        super().__init__()
        self.norm_final = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.linear = Linear(hidden_size, out_channels, use_bias=True)
        self.adaLN_modulation = ModuleList([_Identity(), Linear(min(hidden_size, ADALN_EMBED_DIM),
                                                                hidden_size, use_bias=True)])

    def __call__(self, params: Params, x: jax.Array, c: jax.Array) -> jax.Array:
        scale = 1.0 + self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(c))[:, None]
        return self.linear(params["linear"], self.norm_final({}, x) * scale)


class ZImageRopeEmbedder:
    """Host-side per-axis rotary tables (numpy, float64; reference `:313`).
    Produces interleaved cos/sin rows gathered by integer position ids."""

    def __init__(self, theta: float, axes_dims: Sequence[int], axes_lens: Sequence[int]):
        self.axes_dims = tuple(axes_dims)
        self.tables = []
        for d, e in zip(axes_dims, axes_lens):
            freqs = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
            args = np.outer(np.arange(e, dtype=np.float64), freqs).astype(np.float32)
            self.tables.append((np.repeat(np.cos(args), 2, axis=1), np.repeat(np.sin(args), 2, axis=1)))

    def __call__(self, pos_ids: np.ndarray):
        """pos_ids: [N, n_axes] int -> cos/sin [N, head_dim]."""
        cos = np.concatenate([self.tables[i][0][pos_ids[:, i]] for i in range(len(self.tables))], axis=-1)
        sin = np.concatenate([self.tables[i][1][pos_ids[:, i]] for i in range(len(self.tables))], axis=-1)
        return cos, sin


def _pad32(n: int) -> int:
    return n + (-n) % SEQ_MULTI_OF


class ZImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """Reference `transformer_z_image.py:359` (basic text-to-image mode; the
    omni multi-image mode with per-token noise masks is a separate pipeline
    in the reference and is not implemented here)."""

    @register_to_config
    def __init__(
        self,
        all_patch_size: Tuple[int, ...] = (2,),
        all_f_patch_size: Tuple[int, ...] = (1,),
        in_channels: int = 16,
        dim: int = 3840,
        n_layers: int = 30,
        n_refiner_layers: int = 2,
        n_heads: int = 30,
        n_kv_heads: int = 30,
        norm_eps: float = 1e-5,
        qk_norm: bool = True,
        cap_feat_dim: int = 2560,
        siglip_feat_dim: Optional[int] = None,
        rope_theta: float = 256.0,
        t_scale: float = 1000.0,
        axes_dims: Tuple[int, int, int] = (32, 48, 48),
        axes_lens: Tuple[int, int, int] = (1024, 512, 512),
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = in_channels
        self.dim = dim

        all_x_embedder = {}
        all_final_layer = {}
        for patch_size, f_patch_size in zip(all_patch_size, all_f_patch_size):
            key = f"{patch_size}-{f_patch_size}"
            all_x_embedder[key] = Linear(f_patch_size * patch_size * patch_size * in_channels, dim, use_bias=True)
            all_final_layer[key] = ZImageFinalLayer(dim, patch_size * patch_size * f_patch_size * self.out_channels)
        self.all_x_embedder = _ModuleDict(all_x_embedder)
        self.all_final_layer = _ModuleDict(all_final_layer)

        self.noise_refiner = ModuleList(
            [ZImageTransformerBlock(dim, n_heads, norm_eps, qk_norm, modulation=True)
             for _ in range(n_refiner_layers)])
        self.context_refiner = ModuleList(
            [ZImageTransformerBlock(dim, n_heads, norm_eps, qk_norm, modulation=False)
             for _ in range(n_refiner_layers)])
        self.t_embedder = ZImageTimestepEmbedder(min(dim, ADALN_EMBED_DIM), mid_size=1024)
        self.cap_embedder = ModuleList([RMSNorm(cap_feat_dim, eps=norm_eps),
                                        Linear(cap_feat_dim, dim, use_bias=True)])
        self.layers = ModuleList(
            [ZImageTransformerBlock(dim, n_heads, norm_eps, qk_norm) for _ in range(n_layers)])

        head_dim = dim // n_heads
        assert head_dim == sum(axes_dims)
        self.rope_embedder = ZImageRopeEmbedder(rope_theta, axes_dims, axes_lens)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["x_pad_token"] = jnp.zeros((1, self.dim), dtype)
        params["cap_pad_token"] = jnp.zeros((1, self.dim), dtype)
        return params

    def compute_freqs(self, cap_true_lens: Sequence[int], grid: Tuple[int, int, int],
                      cap_seq_len: int):
        """Host-side rope tables for the dense layout.

        Returns (x_freqs, cap_freqs) each [B, S, 1, head_dim] cos/sin pairs.
        Token layout per item i (reference `:596-613`): caption at positions
        (1..cap_pad32_i, 0, 0) — the inner pads continue the sequence — and
        image tokens on a (F,H,W) grid with axis-0 offset cap_pad32_i + 1;
        image inner pads sit at (0,0,0).
        """
        ft, ht, wt = grid
        n_img = ft * ht * wt
        n_img_pad = _pad32(n_img)
        x_cos, x_sin, c_cos, c_sin = [], [], [], []
        for cap_len in cap_true_lens:
            cap_pad = _pad32(int(cap_len))
            cap_pos = np.zeros((cap_seq_len, 3), dtype=np.int64)
            cap_pos[:cap_pad, 0] = np.arange(1, cap_pad + 1)
            cos, sin = self.rope_embedder(cap_pos)
            c_cos.append(cos)
            c_sin.append(sin)

            gt, gh, gw = np.meshgrid(np.arange(ft) + cap_pad + 1, np.arange(ht), np.arange(wt), indexing="ij")
            img_pos = np.stack([gt, gh, gw], axis=-1).reshape(n_img, 3)
            img_pos = np.concatenate([img_pos, np.zeros((n_img_pad - n_img, 3), dtype=img_pos.dtype)], axis=0)
            cos, sin = self.rope_embedder(img_pos)
            x_cos.append(cos)
            x_sin.append(sin)

        def stack(rows):
            return jnp.asarray(np.stack(rows)[:, :, None, :])

        return (stack(x_cos), stack(x_sin)), (stack(c_cos), stack(c_sin))

    def __call__(
        self,
        params: Params,
        x: jax.Array,  # [B, C, F, H, W] latents (uniform shapes)
        t: jax.Array,  # [B] in the (1000 - timestep)/1000 domain (pipeline `:519`)
        cap_feats: jax.Array,  # [B, S_cap, cap_feat_dim], S_cap a multiple of 32
        cap_attn_mask: Optional[jax.Array] = None,  # [B, S_cap] True = valid (incl. attended inner pads)
        cap_inner_pad_mask: Optional[jax.Array] = None,  # [B, S_cap] True = replace with cap_pad_token
        x_freqs: Optional[Tuple[jax.Array, jax.Array]] = None,
        cap_freqs: Optional[Tuple[jax.Array, jax.Array]] = None,
        patch_size: int = 2,
        f_patch_size: int = 1,
        controlnet_block_samples: Optional[dict] = None,  # {layer_idx: [B, S_unified, dim]}
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        b, c, f, h, w = x.shape
        pf, p = f_patch_size, patch_size
        ft, ht, wt = f // pf, h // p, w // p
        n_img = ft * ht * wt
        n_img_pad = _pad32(n_img)
        key = f"{patch_size}-{f_patch_size}"

        if x_freqs is None or cap_freqs is None:
            if cap_attn_mask is not None:
                cap_lens = tuple(int(v) for v in np.asarray(jnp.sum(cap_attn_mask, axis=1)))
            else:
                cap_lens = (cap_feats.shape[1],) * b
            x_freqs, cap_freqs = self.compute_freqs(cap_lens, (ft, ht, wt), cap_feats.shape[1])

        adaln_input = self.t_embedder(params["t_embedder"], t * self.config.t_scale).astype(x.dtype)

        # patchify: [B,C,F,H,W] -> [B, N, pf*p*p*C] (reference `:542`)
        xt = x.reshape(b, c, ft, pf, ht, p, wt, p)
        xt = jnp.einsum("bcfihjwk->bfhwijkc", xt).reshape(b, n_img, pf * p * p * c)
        xt = self.all_x_embedder[key](params["all_x_embedder"][key], xt)
        if n_img_pad > n_img:
            pad = jnp.broadcast_to(params["x_pad_token"].astype(xt.dtype), (b, n_img_pad - n_img, xt.shape[-1]))
            xt = jnp.concatenate([xt, pad], axis=1)

        for i, layer in enumerate(self.noise_refiner):
            xt = layer(params["noise_refiner"][i], xt, None, x_freqs, adaln_input)

        cap = self.cap_embedder[1](params["cap_embedder"][1],
                                   self.cap_embedder[0](params["cap_embedder"][0], cap_feats))
        if cap_inner_pad_mask is not None:
            cap = jnp.where(cap_inner_pad_mask[..., None], params["cap_pad_token"].astype(cap.dtype), cap)
        for i, layer in enumerate(self.context_refiner):
            cap = layer(params["context_refiner"][i], cap, cap_attn_mask, cap_freqs)

        # unified [image, caption] (reference basic-mode order `:859`)
        unified = jnp.concatenate([xt, cap], axis=1)
        u_cos = jnp.concatenate([x_freqs[0], cap_freqs[0]], axis=1)
        u_sin = jnp.concatenate([x_freqs[1], cap_freqs[1]], axis=1)
        u_mask = None
        if cap_attn_mask is not None:
            img_valid = jnp.ones((b, n_img_pad), dtype=bool)
            u_mask = jnp.concatenate([img_valid, cap_attn_mask.astype(bool)], axis=1)

        for i, layer in enumerate(self.layers):
            unified = layer(params["layers"][i], unified, u_mask, (u_cos, u_sin), adaln_input)
            # ControlNet residual injection (reference transformer_z_image.py:1056)
            if controlnet_block_samples is not None and i in controlnet_block_samples:
                unified = unified + controlnet_block_samples[i]

        out = self.all_final_layer[key](params["all_final_layer"][key], unified[:, :n_img], adaln_input)

        # unpatchify (reference `:522-531`)
        out = out.reshape(b, ft, ht, wt, pf, p, p, self.out_channels)
        out = jnp.einsum("bfhwijkc->bcfihjwk", out).reshape(b, self.out_channels, f, h, w)

        if not return_dict:
            return (out,)
        return Transformer2DModelOutput(sample=out)


class _ModuleDict(Module):
    """String-keyed child modules (torch nn.ModuleDict analogue)."""

    def __init__(self, modules: dict):
        super().__init__()
        for k, v in modules.items():
            self._children[k] = v
        object.__setattr__(self, "_dict_keys", list(modules.keys()))

    def __getitem__(self, key: str) -> Module:
        return self._children[key]

    def init(self, key, dtype=jnp.float32) -> Params:
        out = {}
        for i, name in enumerate(self._dict_keys):
            out[name] = self._children[name].init(jax.random.fold_in(key, i), dtype=dtype)
        return out

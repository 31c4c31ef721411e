"""CosmosTransformer3DModel (Cosmos-Predict1 world model).

Behavioral mirror of the reference
`models/transformers/transformer_cosmos.py`: linear patchify with
channel-major (C, p_t, p_h, p_w) flattening (`:35`), AdaLN-LoRA blocks —
every norm projects the RAW sinusoidal timestep embedding through a
low-rank (adaln_lora_dim) MLP and adds the shared 3x temb chunks
(`CosmosAdaLayerNormZero` `:114`), per-head RMS qk self/cross attention,
NTK-scaled 3-axis rotary duplicated for the half-split convention
(`:457` — freqs = cat([t, h, w] * 2)), vector-normalized learnable
factorized positional embedding (`:521`), padding-mask channel concat,
and the peculiar channel-major unpatchify permutation (`:834`).

The Cosmos-2.5 img-context attention and ControlNet residual paths are
not replicated.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def cosmos_rope_np(attention_head_dim: int, patch_size, num_frames: int, height: int, width: int,
                   max_size=(128, 240, 240), rope_scale=(2.0, 1.0, 1.0), base_fps: int = 24,
                   fps: Optional[int] = None):
    """(cos, sin) [N, head_dim] with NTK-scaled per-axis thetas and the
    [t|h|w] frequency block duplicated (half-split layout)."""
    p_t, p_h, p_w = patch_size
    pe = (num_frames // p_t, height // p_h, width // p_w)
    dim_h = attention_head_dim // 6 * 2
    dim_w = attention_head_dim // 6 * 2
    dim_t = attention_head_dim - dim_h - dim_w
    h_theta = 10000.0 * rope_scale[1] ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * rope_scale[2] ** (dim_w / (dim_w - 2))
    t_theta = 10000.0 * rope_scale[0] ** (dim_t / (dim_t - 2))

    def freqs(dim, theta):
        r = np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim
        return 1.0 / theta**r

    seq_t = np.arange(pe[0], dtype=np.float64)
    if fps is not None:
        seq_t = seq_t / fps * base_fps
    emb_t = np.outer(seq_t, freqs(dim_t, t_theta))
    emb_h = np.outer(np.arange(pe[1], dtype=np.float64), freqs(dim_h, h_theta))
    emb_w = np.outer(np.arange(pe[2], dtype=np.float64), freqs(dim_w, w_theta))

    et = np.broadcast_to(emb_t[:, None, None, :], (pe[0], pe[1], pe[2], emb_t.shape[-1]))
    eh = np.broadcast_to(emb_h[None, :, None, :], (pe[0], pe[1], pe[2], emb_h.shape[-1]))
    ew = np.broadcast_to(emb_w[None, None, :, :], (pe[0], pe[1], pe[2], emb_w.shape[-1]))
    half = np.concatenate([et, eh, ew], axis=-1).reshape(pe[0] * pe[1] * pe[2], -1)
    f = np.concatenate([half, half], axis=-1)
    return np.cos(f).astype(np.float32), np.sin(f).astype(np.float32)


def _apply_half_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split rotary (use_real_unbind_dim=-2). x: [B, H, S, D]."""
    x_f = x.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x_f * cos[None, None] + rotated * sin[None, None]
    return out.astype(x.dtype)


class _CosmosAttention(Module):
    def __init__(self, query_dim, heads, dim_head, cross_attention_dim=None, out_bias=False,
                 img_context=False):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.img_context = img_context
        inner = heads * dim_head
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.to_q = Linear(query_dim, inner, use_bias=False)
        self.to_k = Linear(kv_dim, inner, use_bias=False)
        self.to_v = Linear(kv_dim, inner, use_bias=False)
        self.norm_q = RMSNorm(dim_head, eps=1e-6)
        self.norm_k = RMSNorm(dim_head, eps=1e-6)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=out_bias)])
        if img_context:
            # second pathway attending to image-context tokens (reference
            # CosmosAttention q_img/k_img/v_img, transformer_cosmos.py:314-330)
            self.q_img = Linear(query_dim, inner, use_bias=False)
            self.k_img = Linear(query_dim, inner, use_bias=False)
            self.v_img = Linear(query_dim, inner, use_bias=False)
            self.q_img_norm = RMSNorm(dim_head, eps=1e-6)
            self.k_img_norm = RMSNorm(dim_head, eps=1e-6)

    def _attend(self, q, k, v, additive_mask):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.dim_head)
        if additive_mask is not None:
            scores = scores + additive_mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    def __call__(self, params: Params, x, encoder_hidden_states=None, additive_mask=None, rope=None):
        B, S, _ = x.shape
        img_ctx = None
        if isinstance(encoder_hidden_states, tuple):
            # (text_context, img_context) — reference CosmosAttnProcessor2_5
            encoder_hidden_states, img_ctx = encoder_hidden_states
        kv_src = encoder_hidden_states if encoder_hidden_states is not None else x
        q = jnp.transpose(self.to_q(params["to_q"], x).reshape(B, S, self.heads, self.dim_head), (0, 2, 1, 3))
        k = jnp.transpose(self.to_k(params["to_k"], kv_src).reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
        v = jnp.transpose(self.to_v(params["to_v"], kv_src).reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if rope is not None:
            cos, sin = rope
            q = _apply_half_rope(q, cos, sin)
            k = _apply_half_rope(k, cos, sin)
        out = self._attend(q, k, v, additive_mask)
        if img_ctx is not None and self.img_context:
            qi = jnp.transpose(self.q_img(params["q_img"], x).reshape(B, S, self.heads, self.dim_head), (0, 2, 1, 3))
            ki = jnp.transpose(self.k_img(params["k_img"], img_ctx).reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
            vi = jnp.transpose(self.v_img(params["v_img"], img_ctx).reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
            qi = self.q_img_norm(params["q_img_norm"], qi)
            ki = self.k_img_norm(params["k_img_norm"], ki)
            out = out + self._attend(qi, ki, vi, None)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, -1)
        return self.to_out[0](params["to_out"][0], out)


class _CosmosAdaLayerNormZero(Module):
    def __init__(self, in_features: int, hidden_features: int):
        super().__init__()
        self.norm = LayerNorm(in_features, eps=1e-6, use_scale=False, use_bias=False)
        self.linear_1 = Linear(in_features, hidden_features, use_bias=False)
        self.linear_2 = Linear(hidden_features, 3 * in_features, use_bias=False)

    def __call__(self, params: Params, x, embedded_timestep, temb=None):
        e = jax.nn.silu(embedded_timestep)
        e = self.linear_1(params["linear_1"], e)
        e = self.linear_2(params["linear_2"], e)
        if temb is not None:
            e = e + temb
        shift, scale, gate = jnp.split(e, 3, axis=-1)
        x = self.norm({}, x)
        if e.ndim == 2:
            shift, scale, gate = shift[:, None], scale[:, None], gate[:, None]
        return x * (1 + scale) + shift, gate


class _CosmosAdaLayerNorm(Module):
    def __init__(self, in_features: int, hidden_features: int):
        super().__init__()
        self.embedding_dim = in_features
        self.norm = LayerNorm(in_features, eps=1e-6, use_scale=False, use_bias=False)
        self.linear_1 = Linear(in_features, hidden_features, use_bias=False)
        self.linear_2 = Linear(hidden_features, 2 * in_features, use_bias=False)

    def __call__(self, params: Params, x, embedded_timestep, temb=None):
        e = jax.nn.silu(embedded_timestep)
        e = self.linear_1(params["linear_1"], e)
        e = self.linear_2(params["linear_2"], e)
        if temb is not None:
            e = e + temb[..., : 2 * self.embedding_dim]
        shift, scale = jnp.split(e, 2, axis=-1)
        x = self.norm({}, x)
        if e.ndim == 2:
            shift, scale = shift[:, None], scale[:, None]
        return x * (1 + scale) + shift


class CosmosTransformerBlock(Module):
    def __init__(self, num_attention_heads, attention_head_dim, cross_attention_dim,
                 mlp_ratio=4.0, adaln_lora_dim=256, out_bias=False,
                 img_context=False, before_proj=False, after_proj=False):
        super().__init__()
        hidden = num_attention_heads * attention_head_dim
        self.norm1 = _CosmosAdaLayerNormZero(hidden, adaln_lora_dim)
        self.attn1 = _CosmosAttention(hidden, num_attention_heads, attention_head_dim, out_bias=out_bias)
        self.norm2 = _CosmosAdaLayerNormZero(hidden, adaln_lora_dim)
        self.attn2 = _CosmosAttention(hidden, num_attention_heads, attention_head_dim,
                                      cross_attention_dim=cross_attention_dim, out_bias=out_bias,
                                      img_context=img_context)
        self.norm3 = _CosmosAdaLayerNormZero(hidden, adaln_lora_dim)
        self.ff = FeedForward(hidden, mult=mlp_ratio, activation_fn="gelu", bias=out_bias)
        # ControlNet projections (reference transformer_cosmos.py:401-407:
        # zero-conv analogues for CosmosControlNet)
        if before_proj:
            self.before_proj = Linear(hidden, hidden)
        if after_proj:
            self.after_proj = Linear(hidden, hidden)
        self.has_before_proj = before_proj
        self.has_after_proj = after_proj

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, embedded_timestep,
                 temb=None, rope=None, extra_pos_emb=None, additive_mask=None,
                 controlnet_residual=None, latents=None):
        if self.has_before_proj:
            hidden_states = self.before_proj(params["before_proj"], hidden_states) + latents
        if extra_pos_emb is not None:
            hidden_states = hidden_states + extra_pos_emb
        norm_hs, gate = self.norm1(params["norm1"], hidden_states, embedded_timestep, temb)
        hidden_states = hidden_states + gate * self.attn1(params["attn1"], norm_hs, rope=rope)
        norm_hs, gate = self.norm2(params["norm2"], hidden_states, embedded_timestep, temb)
        hidden_states = hidden_states + gate * self.attn2(
            params["attn2"], norm_hs, encoder_hidden_states=encoder_hidden_states,
            additive_mask=additive_mask,
        )
        norm_hs, gate = self.norm3(params["norm3"], hidden_states, embedded_timestep, temb)
        hidden_states = hidden_states + gate * self.ff(params["ff"], norm_hs)
        if controlnet_residual is not None:
            hidden_states = hidden_states + controlnet_residual
        if self.has_after_proj:
            return hidden_states, self.after_proj(params["after_proj"], hidden_states)
        return hidden_states


class _CosmosTimestepEmbedding(Module):
    def __init__(self, in_features: int, out_features: int):
        super().__init__()
        self.linear_1 = Linear(in_features, out_features, use_bias=False)
        self.linear_2 = Linear(out_features, 3 * out_features, use_bias=False)

    def __call__(self, params: Params, timesteps: jax.Array) -> jax.Array:
        e = self.linear_1(params["linear_1"], timesteps)
        return self.linear_2(params["linear_2"], jax.nn.silu(e))


class _CosmosEmbedding(Module):
    def __init__(self, embedding_dim: int, condition_dim: int):
        super().__init__()
        self.time_proj = Timesteps(embedding_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        self.t_embedder = _CosmosTimestepEmbedding(embedding_dim, condition_dim)
        self.norm = RMSNorm(embedding_dim, eps=1e-6)

    def __call__(self, params: Params, dtype, timestep: jax.Array):
        proj = self.time_proj({}, timestep).astype(dtype)
        temb = self.t_embedder(params["t_embedder"], proj)
        embedded = self.norm(params["norm"], proj)
        return temb, embedded


class _CosmosPatchEmbed(Module):
    def __init__(self, in_channels, out_channels, patch_size, bias=True):
        super().__init__()
        self.patch_size = patch_size
        self.proj = Linear(in_channels * patch_size[0] * patch_size[1] * patch_size[2],
                           out_channels, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        B, C, F, H, W = x.shape
        p_t, p_h, p_w = self.patch_size
        x = x.reshape(B, C, F // p_t, p_t, H // p_h, p_h, W // p_w, p_w)
        x = jnp.transpose(x, (0, 2, 4, 6, 1, 3, 5, 7))
        x = x.reshape(B, F // p_t, H // p_h, W // p_w, -1)
        return self.proj(params["proj"], x)


class _CosmosLearnablePositionalEmbed(Module):
    def __init__(self, hidden_size, max_size, patch_size, eps=1e-6):
        super().__init__()
        self.max_size = [s // p for s, p in zip(max_size, patch_size)]
        self.patch_size = patch_size
        self.hidden_size = hidden_size
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "pos_emb_t": jnp.zeros((self.max_size[0], self.hidden_size), dtype),
            "pos_emb_h": jnp.zeros((self.max_size[1], self.hidden_size), dtype),
            "pos_emb_w": jnp.zeros((self.max_size[2], self.hidden_size), dtype),
        }

    def __call__(self, params: Params, shape) -> jax.Array:
        B, C, F, H, W = shape
        pe = (F // self.patch_size[0], H // self.patch_size[1], W // self.patch_size[2])
        et = params["pos_emb_t"][: pe[0]][None, :, None, None, :]
        eh = params["pos_emb_h"][: pe[1]][None, None, :, None, :]
        ew = params["pos_emb_w"][: pe[2]][None, None, None, :, :]
        emb = jnp.broadcast_to(et, (B, *pe, self.hidden_size)) \
            + jnp.broadcast_to(eh, (B, *pe, self.hidden_size)) \
            + jnp.broadcast_to(ew, (B, *pe, self.hidden_size))
        emb = emb.reshape(B, pe[0] * pe[1] * pe[2], self.hidden_size)
        norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
        norm = self.eps + norm * math.sqrt(1.0 / self.hidden_size)
        return (emb / norm).astype(emb.dtype)


class CosmosTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        out_channels: int = 16,
        num_attention_heads: int = 32,
        attention_head_dim: int = 128,
        num_layers: int = 28,
        mlp_ratio: float = 4.0,
        text_embed_dim: int = 1024,
        adaln_lora_dim: int = 256,
        max_size: Tuple[int, ...] = (128, 240, 240),
        patch_size: Tuple[int, ...] = (1, 2, 2),
        rope_scale: Tuple[float, ...] = (2.0, 1.0, 1.0),
        concat_padding_mask: bool = True,
        extra_pos_embed_type: Optional[str] = "learnable",
        use_crossattn_projection: bool = False,
        crossattn_proj_in_channels: int = 1024,
        encoder_hidden_states_channels: int = 1024,
        controlnet_block_every_n: Optional[int] = None,
        img_context_dim_in: Optional[int] = None,
        img_context_num_tokens: int = 256,
        img_context_dim_out: int = 2048,
    ):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        patch_in = in_channels + 1 if concat_padding_mask else in_channels
        self.patch_embed = _CosmosPatchEmbed(patch_in, hidden_size, patch_size, bias=False)
        self.learnable_pos_embed = (
            _CosmosLearnablePositionalEmbed(hidden_size, max_size, patch_size)
            if extra_pos_embed_type == "learnable" else None
        )
        self.time_embed = _CosmosEmbedding(hidden_size, hidden_size)
        has_img_ctx = img_context_dim_in is not None and img_context_dim_in > 0
        if use_crossattn_projection:
            # reference wraps in nn.Sequential(Linear, GELU) — param subtree
            # "crossattn_proj.0" (transformer_cosmos.py forward `:781`)
            self.crossattn_proj = ModuleList([Linear(crossattn_proj_in_channels,
                                                     encoder_hidden_states_channels)])
        if has_img_ctx:
            self.img_context_proj = ModuleList([Linear(img_context_dim_in, img_context_dim_out)])
        self.transformer_blocks = ModuleList([
            CosmosTransformerBlock(num_attention_heads, attention_head_dim, text_embed_dim,
                                   mlp_ratio=mlp_ratio, adaln_lora_dim=adaln_lora_dim, out_bias=False,
                                   img_context=has_img_ctx)
            for _ in range(num_layers)
        ])
        self.norm_out = _CosmosAdaLayerNorm(hidden_size, adaln_lora_dim)
        self.proj_out = Linear(hidden_size, patch_size[0] * patch_size[1] * patch_size[2] * out_channels,
                               use_bias=False)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        fps: Optional[int] = None,
        condition_mask: Optional[jax.Array] = None,
        padding_mask: Optional[jax.Array] = None,
        block_controlnet_hidden_states: Optional[list] = None,
        return_dict: bool = True,
    ):
        B, C, F, H, W = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size

        if condition_mask is not None:
            hidden_states = jnp.concatenate([hidden_states, condition_mask], axis=1)
        if self.config.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.zeros((1, 1, H, W), dtype=hidden_states.dtype)
            if padding_mask.shape[-2:] != (H, W):
                # reference resizes image-resolution masks with NEAREST (`:735`)
                padding_mask = jax.image.resize(
                    padding_mask, (*padding_mask.shape[:-2], H, W), method="nearest"
                )
            pm = jnp.broadcast_to(padding_mask[:, :, None], (B, 1, F, H, W))
            hidden_states = jnp.concatenate([hidden_states, pm.astype(hidden_states.dtype)], axis=1)

        additive_mask = None
        if attention_mask is not None:
            additive_mask = ((1 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, None, :]

        cos, sin = cosmos_rope_np(
            self.config.attention_head_dim, self.config.patch_size, F, H, W,
            max_size=self.config.max_size, rope_scale=self.config.rope_scale, fps=fps,
        )
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        extra_pos = (
            self.learnable_pos_embed(params["learnable_pos_embed"], hidden_states.shape)
            if self.learnable_pos_embed is not None else None
        )

        x = self.patch_embed(params["patch_embed"], hidden_states)
        x = x.reshape(B, -1, x.shape[-1])

        timestep = jnp.asarray(timestep)
        if timestep.ndim == 5:
            # per-frame conditioning timesteps [B, 1, T, 1, 1] (video2world;
            # reference transformer_cosmos.py:761): embed per (B, T), then
            # broadcast across the spatial token grid
            ppf_, pph_, ppw_ = F // p_t, H // p_h, W // p_w
            if p_t != 1:
                raise ValueError("per-frame timesteps require patch_size_t == 1 (reference `:769`)")
            flat_t = timestep.reshape(-1)
            temb, embedded_timestep = self.time_embed(params["time_embed"], x.dtype, flat_t)
            temb, embedded_timestep = (
                jnp.broadcast_to(
                    v.reshape(B, ppf_, 1, 1, -1), (B, ppf_, pph_, ppw_, v.shape[-1])
                ).reshape(B, ppf_ * pph_ * ppw_, -1)
                for v in (temb, embedded_timestep)
            )
        else:
            timestep = jnp.atleast_1d(timestep)
            temb, embedded_timestep = self.time_embed(params["time_embed"], x.dtype, timestep)

        # text/image context projections (reference transformer_cosmos.py:780-789)
        img_ctx = None
        if isinstance(encoder_hidden_states, tuple):
            encoder_hidden_states, img_ctx = encoder_hidden_states
        if self.config.get("use_crossattn_projection"):
            encoder_hidden_states = jax.nn.gelu(
                self.crossattn_proj[0](params["crossattn_proj"][0], encoder_hidden_states))
        if img_ctx is not None and self.config.get("img_context_dim_in"):
            img_ctx = jax.nn.gelu(self.img_context_proj[0](params["img_context_proj"][0], img_ctx))
            encoder_hidden_states = (encoder_hidden_states, img_ctx)

        # controlnet residual injection every n blocks (reference `:791-798`)
        cn_map = {}
        if block_controlnet_hidden_states is not None:
            every_n = self.config.get("controlnet_block_every_n") or 1
            n_blocks = len(self.transformer_blocks)
            cn_map = {bi: block_controlnet_hidden_states[idx]
                      for idx, bi in enumerate(range(0, n_blocks, every_n))
                      if idx < len(block_controlnet_hidden_states)}

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, encoder_hidden_states,
                      embedded_timestep, temb, rope, extra_pos, additive_mask,
                      controlnet_residual=cn_map.get(i))

        x = self.norm_out(params["norm_out"], x, embedded_timestep, temb)
        x = self.proj_out(params["proj_out"], x)

        ppf, pph, ppw = F // p_t, H // p_h, W // p_w
        x = x.reshape(B, ppf, pph, ppw, p_h, p_w, p_t, -1)
        x = jnp.transpose(x, (0, 7, 1, 6, 2, 4, 3, 5))
        output = x.reshape(B, -1, ppf * p_t, pph * p_h, ppw * p_w)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

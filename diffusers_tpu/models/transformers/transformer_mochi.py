"""MochiTransformer3DModel — the Mochi-1 asymmetric joint-attention video DiT.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_mochi.py`
(MochiModulatedRMSNorm `:38`, MochiRMSNormZero `:88`, MochiTransformerBlock
`:119`, MochiRoPE `:246`, MochiTransformer3DModel `:309`), the attention at
`models/attention_processor.py:932-1100`, and the embeddings at
`models/embeddings.py:1796` (combined timestep/caption) + `:1959`
(attention pool).

TPU design: joint image+text attention runs as ONE masked attention over the
concatenated sequence (text-padding keys are masked additively) instead of the
reference's per-sample dynamic token filtering — identical outputs for the
image stream and for valid (prefix-contiguous) text positions, with static
shapes XLA can tile. Modulation math runs in float32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PatchEmbed, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


class _LinearHolder(Module):
    """Wrapper so AdaRMS modulation params live under the reference's
    `<name>.linear` / `<name>.linear_1` state-dict path."""

    def __init__(self, in_dim: int, out_dim: int, name: str = "linear"):
        super().__init__()
        setattr(self, name, Linear(in_dim, out_dim))
        self._name = name

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        lin = getattr(self, self._name)
        return lin(params[self._name], x)


@dataclass
class Transformer3DModelOutput(BaseOutput):
    sample: jax.Array


def _rms(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class MochiRMSNorm(Module):
    """Per-head RMSNorm with learned weight (reference normalization.py:572)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.dim = dim
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jnp.ones((self.dim,), dtype=dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return _rms(x, self.eps) * params["weight"].astype(x.dtype)


class MochiAttention(Module):
    """Joint image/text attention with per-head qk RMSNorm and per-head RoPE
    on the image stream (reference attention_processor.py:932,998)."""

    def __init__(self, query_dim: int, added_kv_proj_dim: int, heads: int, dim_head: int,
                 out_dim: int, out_context_dim: int, context_pre_only: bool, eps: float = 1e-5):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = out_dim
        self.context_pre_only = context_pre_only
        self.to_q = Linear(query_dim, out_dim, use_bias=False)
        self.to_k = Linear(query_dim, out_dim, use_bias=False)
        self.to_v = Linear(query_dim, out_dim, use_bias=False)
        self.norm_q = MochiRMSNorm(dim_head, eps)
        self.norm_k = MochiRMSNorm(dim_head, eps)
        self.norm_added_q = MochiRMSNorm(dim_head, eps)
        self.norm_added_k = MochiRMSNorm(dim_head, eps)
        self.add_q_proj = Linear(added_kv_proj_dim, out_dim, use_bias=False)
        self.add_k_proj = Linear(added_kv_proj_dim, out_dim, use_bias=False)
        self.add_v_proj = Linear(added_kv_proj_dim, out_dim, use_bias=False)
        self.to_out = ModuleList([Linear(out_dim, out_dim, use_bias=True)])
        if not context_pre_only:
            self.to_add_out = Linear(out_dim, out_context_dim, use_bias=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 attention_mask, image_rotary_emb=None):
        b, seq, _ = hidden_states.shape
        text_seq = encoder_hidden_states.shape[1]

        q = self.to_q(params["to_q"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, text_seq, self.heads, self.dim_head)
        ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, text_seq, self.heads, self.dim_head)
        ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, text_seq, self.heads, self.dim_head)
        eq = self.norm_added_q(params["norm_added_q"], eq)
        ek = self.norm_added_k(params["norm_added_k"], ek)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb  # [S, H, D/2] fp32
            def rope(x):
                xf = x.astype(jnp.float32)
                x_even, x_odd = xf[..., 0::2], xf[..., 1::2]
                c = cos[None]
                s = sin[None]
                out_even = x_even * c - x_odd * s
                out_odd = x_even * s + x_odd * c
                return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape).astype(x.dtype)
            q = rope(q)
            k = rope(k)

        jq = jnp.concatenate([q, eq], axis=1)
        jk = jnp.concatenate([k, ek], axis=1)
        jv = jnp.concatenate([v, ev], axis=1)

        # additive mask over text keys (image keys always attended)
        key_mask = jnp.concatenate(
            [jnp.ones((b, seq), dtype=bool), attention_mask.astype(bool)], axis=1
        )
        bias = jnp.where(key_mask, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]

        out = dispatch_attention_fn(jq, jk, jv, attn_mask=bias)
        out = out.reshape(b, seq + text_seq, self.inner_dim)
        img_out, ctx_out = out[:, :seq], out[:, seq:]
        img_out = self.to_out[0](params["to_out"][0], img_out)
        if self.context_pre_only:
            return img_out, None
        return img_out, self.to_add_out(params["to_add_out"], ctx_out)


class MochiTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 pooled_projection_dim: int, activation_fn: str = "swiglu",
                 context_pre_only: bool = False, eps: float = 1e-6):
        super().__init__()
        self.dim = dim
        self.pooled_projection_dim = pooled_projection_dim
        self.context_pre_only = context_pre_only
        self.eps = eps
        ff_inner_dim = (4 * dim * 2) // 3
        ff_context_inner_dim = (4 * pooled_projection_dim * 2) // 3

        # norm1 / norm1_context are AdaRMS: silu(temb) @ linear → chunks
        self.norm1 = _LinearHolder(dim, 4 * dim)
        if not context_pre_only:
            self.norm1_context = _LinearHolder(dim, 4 * pooled_projection_dim)
        else:
            self.norm1_context = _LinearHolder(dim, pooled_projection_dim, name="linear_1")

        self.attn1 = MochiAttention(
            query_dim=dim,
            added_kv_proj_dim=pooled_projection_dim,
            heads=num_attention_heads,
            dim_head=attention_head_dim,
            out_dim=dim,
            out_context_dim=pooled_projection_dim,
            context_pre_only=context_pre_only,
            eps=1e-5,
        )
        self.ff = FeedForward(dim, inner_dim=ff_inner_dim, activation_fn=activation_fn, bias=False)
        if not context_pre_only:
            self.ff_context = FeedForward(pooled_projection_dim, inner_dim=ff_context_inner_dim,
                                          activation_fn=activation_fn, bias=False)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 encoder_attention_mask, image_rotary_emb=None):
        silu_temb = jax.nn.silu(temb)
        mods = self.norm1(params["norm1"], silu_temb)
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mods, 4, axis=1)
        norm_h = (_rms(hidden_states, self.eps).astype(jnp.float32)
                  * (1 + scale_msa[:, None].astype(jnp.float32))).astype(hidden_states.dtype)

        if not self.context_pre_only:
            cmods = self.norm1_context(params["norm1_context"], silu_temb)
            c_scale_msa, c_gate_msa, c_scale_mlp, c_gate_mlp = jnp.split(cmods, 4, axis=1)
            norm_c = (_rms(encoder_hidden_states, self.eps).astype(jnp.float32)
                      * (1 + c_scale_msa[:, None].astype(jnp.float32))).astype(encoder_hidden_states.dtype)
        else:
            scale = self.norm1_context(params["norm1_context"], silu_temb)
            norm_c = (_rms(encoder_hidden_states, self.eps).astype(jnp.float32)
                      * (1 + scale[:, None].astype(jnp.float32))).astype(encoder_hidden_states.dtype)

        attn_h, attn_c = self.attn1(params["attn1"], norm_h, norm_c,
                                    encoder_attention_mask, image_rotary_emb)

        hidden_states = hidden_states + _rms(attn_h, self.eps) * jnp.tanh(gate_msa)[:, None].astype(attn_h.dtype)
        norm_h = (_rms(hidden_states, self.eps).astype(jnp.float32)
                  * (1 + scale_mlp[:, None].astype(jnp.float32))).astype(hidden_states.dtype)
        ff_out = self.ff(params["ff"], norm_h)
        hidden_states = hidden_states + _rms(ff_out, self.eps) * jnp.tanh(gate_mlp)[:, None].astype(ff_out.dtype)

        if not self.context_pre_only:
            encoder_hidden_states = encoder_hidden_states + _rms(attn_c, self.eps) * jnp.tanh(c_gate_msa)[:, None].astype(attn_c.dtype)
            norm_c = (_rms(encoder_hidden_states, self.eps).astype(jnp.float32)
                      * (1 + c_scale_mlp[:, None].astype(jnp.float32))).astype(encoder_hidden_states.dtype)
            cff = self.ff_context(params["ff_context"], norm_c)
            encoder_hidden_states = encoder_hidden_states + _rms(cff, self.eps) * jnp.tanh(c_gate_mlp)[:, None].astype(cff.dtype)

        return hidden_states, encoder_hidden_states


class MochiAttentionPool(Module):
    """Masked mean-query attention pool (reference embeddings.py:1959)."""

    def __init__(self, num_attention_heads: int, embed_dim: int, output_dim: Optional[int] = None):
        super().__init__()
        self.num_attention_heads = num_attention_heads
        self.to_kv = Linear(embed_dim, 2 * embed_dim)
        self.to_q = Linear(embed_dim, embed_dim)
        self.to_out = Linear(embed_dim, output_dim or embed_dim)

    def __call__(self, params: Params, x: jax.Array, mask: jax.Array) -> jax.Array:
        b, length, d = x.shape
        h = self.num_attention_heads
        head_dim = d // h
        maskf = mask.astype(x.dtype)[:, :, None]
        maskf = maskf / jnp.clip(jnp.sum(maskf, axis=1, keepdims=True), 1)
        x_pool = jnp.sum(x * maskf, axis=1, keepdims=True)
        xc = jnp.concatenate([x_pool, x], axis=1)  # [B, 1+L, D]
        kv = self.to_kv(params["to_kv"], xc).reshape(b, 1 + length, 2, h, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]  # [B, 1+L, H, hd]
        q = self.to_q(params["to_q"], xc[:, 0]).reshape(b, 1, h, head_dim)
        key_mask = jnp.concatenate([jnp.ones((b, 1), dtype=bool), mask.astype(bool)], axis=1)
        bias = jnp.where(key_mask, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]
        out = dispatch_attention_fn(q, k, v, attn_mask=bias)  # [B, 1, H, hd]
        out = out.reshape(b, d)
        return self.to_out(params["to_out"], out)


class MochiCombinedTimestepCaptionEmbedding(Module):
    def __init__(self, embedding_dim: int, pooled_projection_dim: int, text_embed_dim: int,
                 time_embed_dim: int = 256, num_attention_heads: int = 8):
        super().__init__()
        self.time_proj = Timesteps(time_embed_dim, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        self.timestep_embedder = TimestepEmbedding(time_embed_dim, embedding_dim)
        self.pooler = MochiAttentionPool(num_attention_heads, text_embed_dim, embedding_dim)
        self.caption_proj = Linear(text_embed_dim, pooled_projection_dim)

    def __call__(self, params: Params, timestep, encoder_hidden_states, encoder_attention_mask, dtype):
        t = self.time_proj({}, timestep).astype(dtype)
        time_emb = self.timestep_embedder(params["timestep_embedder"], t)
        pooled = self.pooler(params["pooler"], encoder_hidden_states, encoder_attention_mask)
        caption_proj = self.caption_proj(params["caption_proj"], encoder_hidden_states)
        return time_emb + pooled, caption_proj


class MochiTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        num_attention_heads: int = 24,
        attention_head_dim: int = 128,
        num_layers: int = 48,
        pooled_projection_dim: int = 1536,
        in_channels: int = 12,
        out_channels: Optional[int] = None,
        qk_norm: str = "rms_norm",
        text_embed_dim: int = 4096,
        time_embed_dim: int = 256,
        activation_fn: str = "swiglu",
        max_sequence_length: int = 256,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        out_channels = out_channels or in_channels
        self.inner_dim = inner_dim
        self.out_channels_ = out_channels

        self.patch_embed = PatchEmbed(
            patch_size=patch_size, in_channels=in_channels, embed_dim=inner_dim, pos_embed_type=None
        )
        self.time_embed = MochiCombinedTimestepCaptionEmbedding(
            embedding_dim=inner_dim,
            pooled_projection_dim=pooled_projection_dim,
            text_embed_dim=text_embed_dim,
            time_embed_dim=time_embed_dim,
            num_attention_heads=8,
        )
        self.transformer_blocks = ModuleList(
            [
                MochiTransformerBlock(
                    dim=inner_dim,
                    num_attention_heads=num_attention_heads,
                    attention_head_dim=attention_head_dim,
                    pooled_projection_dim=pooled_projection_dim,
                    activation_fn=activation_fn,
                    context_pre_only=i == num_layers - 1,
                )
                for i in range(num_layers)
            ]
        )
        # AdaLayerNormContinuous out
        self.norm_out = _LinearHolder(inner_dim, 2 * inner_dim)
        self.norm_out_norm = LayerNorm(inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * out_channels)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params.pop("norm_out_norm", None)
        params["pos_frequencies"] = jnp.zeros(
            (3, self.config.num_attention_heads, self.config.attention_head_dim // 2), dtype=dtype
        )
        return params

    # ------------------------------------------------------------ RoPE
    def rope(self, pos_frequencies: jax.Array, num_frames: int, height: int, width: int):
        """Mochi 3D RoPE over centered pixel grids (reference MochiRoPE:246)."""
        target_area = 192 * 192
        scale = (target_area / (height * width)) ** 0.5

        def centers(start, stop, num):
            edges = jnp.linspace(start, stop, num + 1, dtype=jnp.float32)
            return (edges[:-1] + edges[1:]) / 2

        t = jnp.arange(num_frames, dtype=jnp.float32)
        hh = centers(-height * scale / 2, height * scale / 2, height)
        ww = centers(-width * scale / 2, width * scale / 2, width)
        gt, gh, gw = jnp.meshgrid(t, hh, ww, indexing="ij")
        pos = jnp.stack([gt, gh, gw], axis=-1).reshape(-1, 3)  # [N, 3]
        freqs = jnp.einsum("nd,dhf->nhf", pos, pos_frequencies.astype(jnp.float32))
        return jnp.cos(freqs), jnp.sin(freqs)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        encoder_hidden_states: jax.Array,  # [B, S, text_embed_dim]
        timestep: jax.Array,
        encoder_attention_mask: jax.Array,  # [B, S]
        return_dict: bool = True,
    ):
        b, c, f, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p

        temb, encoder_hidden_states = self.time_embed(
            params["time_embed"], timestep, encoder_hidden_states, encoder_attention_mask,
            hidden_states.dtype,
        )

        # patchify per frame (reference flattens frames into batch first)
        h = jnp.transpose(hidden_states, (0, 2, 1, 3, 4)).reshape(b * f, c, height, width)
        h = self.patch_embed(params["patch_embed"], h)  # [B*F, ph*pw, D]
        h = h.reshape(b, f * ph * pw, self.inner_dim)

        image_rotary_emb = self.rope(params["pos_frequencies"], f, ph, pw)

        for i, block in enumerate(self.transformer_blocks):
            h, encoder_hidden_states = block(
                params["transformer_blocks"][i], h, encoder_hidden_states, temb,
                encoder_attention_mask, image_rotary_emb,
            )

        # AdaLayerNormContinuous: norm(x) * (1+scale) + shift from silu(temb)
        mods = self.norm_out(params["norm_out"], jax.nn.silu(temb))
        scale, shift = jnp.split(mods.astype(jnp.float32), 2, axis=1)
        h = self.norm_out_norm({}, h).astype(jnp.float32)
        h = (h * (1 + scale[:, None]) + shift[:, None]).astype(hidden_states.dtype)
        h = self.proj_out(params["proj_out"], h)

        # unpatchify: [B, F*ph*pw, p*p*out] -> [B, out, F, H, W]
        out_c = self.out_channels_
        h = h.reshape(b, f, ph, pw, p, p, out_c)
        h = jnp.transpose(h, (0, 6, 1, 2, 4, 3, 5))  # [B, out, F, ph, p, pw, p]
        output = h.reshape(b, out_c, f, height, width)

        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)

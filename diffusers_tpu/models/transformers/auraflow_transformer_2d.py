"""AuraFlowTransformer2DModel — fal.ai's AuraFlow MMDiT + single-DiT stack.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/auraflow_transformer_2d.py`
(AuraFlowPatchEmbed `:50`, AuraFlowFeedForward `:113`, AuraFlowPreFinalBlock
`:132`, single block `:147`, joint block `:197`, model `:278`) and the joint
attention at `models/attention_processor.py:2087` (text-first concatenation,
fp32 qk layer-norm without affine).

TPU design: all LayerNorms and modulation math run in float32 (the
reference's FP32LayerNorm discipline); tokens stay [B, N, D] throughout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _find_multiple(n: int, k: int) -> int:
    if n % k == 0:
        return n
    return n + k - (n % k)


def _fp32_ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class _AuraFlowPatchEmbed(Module):
    """Patchify linear + learned pos table under the reference's
    `pos_embed.{proj,pos_embed}` state-dict paths."""

    def __init__(self, patch_size: int, in_channels: int, embed_dim: int, pos_embed_max_size: int):
        super().__init__()
        self.embed_dim = embed_dim
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = Linear(patch_size * patch_size * in_channels, embed_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["pos_embed"] = (
            jax.random.normal(key, (1, self.pos_embed_max_size, self.embed_dim)) * 0.1
        ).astype(dtype)
        return params


class _NormOutLinear(Module):
    """AuraFlowPreFinalBlock params under `norm_out.linear`."""

    def __init__(self, in_dim: int, out_dim: int):
        super().__init__()
        self.linear = Linear(in_dim, out_dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.linear(params["linear"], x)


class AuraFlowFeedForward(Module):
    """SiLU-gated MLP with 256-multiple hidden dim (reference `:113`)."""

    def __init__(self, dim: int, hidden_dim: Optional[int] = None):
        super().__init__()
        if hidden_dim is None:
            hidden_dim = 4 * dim
        final_hidden_dim = _find_multiple(int(2 * hidden_dim / 3), 256)
        self.linear_1 = Linear(dim, final_hidden_dim, use_bias=False)
        self.linear_2 = Linear(dim, final_hidden_dim, use_bias=False)
        self.out_projection = Linear(final_hidden_dim, dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = jax.nn.silu(self.linear_1(params["linear_1"], x)) * self.linear_2(params["linear_2"], x)
        return self.out_projection(params["out_projection"], h)


class _AdaLayerNormZero(Module):
    """silu(temb) @ linear (no bias) → 6 modulation chunks; fp32 layer norm."""

    def __init__(self, dim: int):
        super().__init__()
        self.linear = Linear(dim, 6 * dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array):
        mods = self.linear(params["linear"], jax.nn.silu(emb)).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mods, 6, axis=1)
        normed = _fp32_ln(x).astype(jnp.float32)
        out = (normed * (1 + scale_msa[:, None]) + shift_msa[:, None]).astype(x.dtype)
        return out, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AuraFlowAttention(Module):
    """Joint (or single-stream) attention, text-first concat, fp32 qk LN
    without affine (reference attention_processor.py:2087)."""

    def __init__(self, dim: int, heads: int, dim_head: int, has_context: bool):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = heads * dim_head
        self.has_context = has_context
        self.to_q = Linear(dim, self.inner_dim, use_bias=False)
        self.to_k = Linear(dim, self.inner_dim, use_bias=False)
        self.to_v = Linear(dim, self.inner_dim, use_bias=False)
        self.to_out = ModuleList([Linear(self.inner_dim, dim, use_bias=False)])
        if has_context:
            self.add_q_proj = Linear(dim, self.inner_dim, use_bias=False)
            self.add_k_proj = Linear(dim, self.inner_dim, use_bias=False)
            self.add_v_proj = Linear(dim, self.inner_dim, use_bias=False)
            self.to_add_out = Linear(self.inner_dim, dim, use_bias=False)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None):
        b, seq, _ = hidden_states.shape
        q = self.to_q(params["to_q"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, seq, self.heads, self.dim_head)
        q = _fp32_ln(q, eps=1e-5)
        k = _fp32_ln(k, eps=1e-5)

        if encoder_hidden_states is not None:
            ctx_seq = encoder_hidden_states.shape[1]
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, ctx_seq, self.heads, self.dim_head)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, ctx_seq, self.heads, self.dim_head)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, ctx_seq, self.heads, self.dim_head)
            eq = _fp32_ln(eq, eps=1e-5)
            ek = _fp32_ln(ek, eps=1e-5)
            q = jnp.concatenate([eq, q], axis=1)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)

        out = dispatch_attention_fn(q, k, v)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)

        if encoder_hidden_states is not None:
            ctx_out, img_out = out[:, :ctx_seq], out[:, ctx_seq:]
            img_out = self.to_out[0](params["to_out"][0], img_out)
            ctx_out = self.to_add_out(params["to_add_out"], ctx_out)
            return img_out, ctx_out
        return self.to_out[0](params["to_out"][0], out)


class AuraFlowSingleTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int):
        super().__init__()
        self.norm1 = _AdaLayerNormZero(dim)
        self.attn = AuraFlowAttention(dim, num_attention_heads, attention_head_dim, has_context=False)
        self.ff = AuraFlowFeedForward(dim, dim * 4)

    def __call__(self, params: Params, hidden_states, temb):
        residual = hidden_states
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, temb)
        attn_out = self.attn(params["attn"], norm_h)
        h = _fp32_ln(residual + gate_msa[:, None].astype(attn_out.dtype) * attn_out).astype(jnp.float32)
        h = (h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]).astype(residual.dtype)
        h = gate_mlp[:, None].astype(h.dtype) * self.ff(params["ff"], h)
        return residual + h


class AuraFlowJointTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int):
        super().__init__()
        self.norm1 = _AdaLayerNormZero(dim)
        self.norm1_context = _AdaLayerNormZero(dim)
        self.attn = AuraFlowAttention(dim, num_attention_heads, attention_head_dim, has_context=True)
        self.ff = AuraFlowFeedForward(dim, dim * 4)
        self.ff_context = AuraFlowFeedForward(dim, dim * 4)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb):
        residual = hidden_states
        residual_context = encoder_hidden_states
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, temb)
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
            params["norm1_context"], encoder_hidden_states, temb
        )
        attn_out, ctx_attn_out = self.attn(params["attn"], norm_h, norm_c)

        h = _fp32_ln(residual + gate_msa[:, None].astype(attn_out.dtype) * attn_out).astype(jnp.float32)
        h = (h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]).astype(residual.dtype)
        h = gate_mlp[:, None].astype(h.dtype) * self.ff(params["ff"], h)
        hidden_states = residual + h

        c = _fp32_ln(residual_context + c_gate_msa[:, None].astype(ctx_attn_out.dtype) * ctx_attn_out).astype(jnp.float32)
        c = (c * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]).astype(residual_context.dtype)
        c = c_gate_mlp[:, None].astype(c.dtype) * self.ff_context(params["ff_context"], c)
        encoder_hidden_states = residual_context + c

        return encoder_hidden_states, hidden_states


class AuraFlowTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 64,
        patch_size: int = 2,
        in_channels: int = 4,
        num_mmdit_layers: int = 4,
        num_single_dit_layers: int = 32,
        attention_head_dim: int = 256,
        num_attention_heads: int = 12,
        joint_attention_dim: int = 2048,
        caption_projection_dim: int = 3072,
        out_channels: int = 4,
        pos_embed_max_size: int = 1024,
    ):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim
        self.out_channels_ = out_channels or in_channels

        self.pos_embed = _AuraFlowPatchEmbed(patch_size, in_channels, self.inner_dim, pos_embed_max_size)
        self.context_embedder = Linear(joint_attention_dim, caption_projection_dim, use_bias=False)
        self.time_step_proj = TimestepEmbedding(256, self.inner_dim)
        self.time_step_embed = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0, scale=1000)
        self.joint_transformer_blocks = ModuleList(
            [
                AuraFlowJointTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_mmdit_layers)
            ]
        )
        self.single_transformer_blocks = ModuleList(
            [
                AuraFlowSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_single_dit_layers)
            ]
        )
        self.norm_out = _NormOutLinear(self.inner_dim, self.inner_dim * 2)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels_, use_bias=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["register_tokens"] = (jax.random.normal(key, (1, 8, self.inner_dim)) * 0.02).astype(dtype)
        return params

    def _pe_selection_index(self, height: int, width: int):
        p = self.config.patch_size
        h_p, w_p = height // p, width // p
        m = int(self.config.pos_embed_max_size**0.5)
        starth = m // 2 - h_p // 2
        startw = m // 2 - w_p // 2
        rows = jnp.arange(starth, starth + h_p)
        cols = jnp.arange(startw, startw + w_p)
        ri, ci = jnp.meshgrid(rows, cols, indexing="ij")
        return (ri * m + ci).reshape(-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        return_dict: bool = True,
    ):
        b, c, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p

        # patchify + learned pos table crop (reference AuraFlowPatchEmbed:95)
        h = hidden_states.reshape(b, c, ph, p, pw, p)
        h = jnp.transpose(h, (0, 2, 4, 1, 3, 5)).reshape(b, ph * pw, c * p * p)
        h = self.pos_embed.proj(params["pos_embed"]["proj"], h)
        pe_index = self._pe_selection_index(height, width)
        h = h + params["pos_embed"]["pos_embed"][:, pe_index].astype(h.dtype)

        temb = self.time_step_embed({}, jnp.atleast_1d(timestep)).astype(h.dtype)
        temb = self.time_step_proj(params["time_step_proj"], temb)
        encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)
        register = jnp.broadcast_to(
            params["register_tokens"].astype(encoder_hidden_states.dtype),
            (b, 8, self.inner_dim),
        )
        encoder_hidden_states = jnp.concatenate([register, encoder_hidden_states], axis=1)

        for i, block in enumerate(self.joint_transformer_blocks):
            encoder_hidden_states, h = block(
                params["joint_transformer_blocks"][i], h, encoder_hidden_states, temb
            )

        if len(self.single_transformer_blocks) > 0:
            encoder_seq_len = encoder_hidden_states.shape[1]
            combined = jnp.concatenate([encoder_hidden_states, h], axis=1)
            for i, block in enumerate(self.single_transformer_blocks):
                combined = block(params["single_transformer_blocks"][i], combined, temb)
            h = combined[:, encoder_seq_len:]

        # AuraFlowPreFinalBlock: scale/shift from silu(temb), no norm
        mods = self.norm_out(params["norm_out"], jax.nn.silu(temb).astype(h.dtype))
        scale, shift = jnp.split(mods, 2, axis=1)
        h = h * (1 + scale[:, None]) + shift[:, None]
        h = self.proj_out(params["proj_out"], h)

        h = h.reshape(b, ph, pw, p, p, self.out_channels_)
        h = jnp.einsum("nhwpqc->nchpwq", h)
        output = h.reshape(b, self.out_channels_, ph * p, pw * p)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

"""SD3Transformer2DModel — MMDiT (Stable Diffusion 3 / 3.5).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_sd3.py:79`;
JointTransformerBlock `models/attention.py:580`, JointAttnProcessor2_0
`models/attention_processor.py`), TPU-native. Sample tokens come first in the
joint stream (the opposite of Flux), context_pre_only on the final block,
SD3.5 dual-attention layers supported.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import CombinedTimestepTextProjEmbeddings, PatchEmbed
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous, AdaLayerNormZero


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class SD35AdaLayerNormZeroX(Module):
    """9-way modulation for SD3.5 dual-attention blocks."""

    def __init__(self, embedding_dim: int, bias: bool = True):
        super().__init__()
        self.linear = Linear(embedding_dim, 9 * embedding_dim, use_bias=bias)
        self.norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array):
        emb = self.linear(params["linear"], jax.nn.silu(emb))
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         shift_msa2, scale_msa2, gate_msa2) = jnp.split(emb, 9, axis=-1)
        norm_x = self.norm({}, x)
        x1 = norm_x * (1 + scale_msa[:, None]) + shift_msa[:, None]
        x2 = norm_x * (1 + scale_msa2[:, None]) + shift_msa2[:, None]
        return x1, gate_msa, shift_mlp, scale_mlp, gate_mlp, x2, gate_msa2


class JointAttention(Module):
    """SD3 joint attention: sample-first token stream."""

    def __init__(
        self,
        query_dim: int,
        heads: int,
        dim_head: int,
        added_kv_proj_dim: Optional[int] = None,
        context_pre_only: Optional[bool] = None,
        qk_norm: Optional[str] = None,
        bias: bool = True,
        eps: float = 1e-6,
        out_dim: Optional[int] = None,
    ):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = out_dim if out_dim is not None else heads * dim_head
        self.added_kv_proj_dim = added_kv_proj_dim
        self.context_pre_only = context_pre_only

        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_v = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=True)])

        if qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        elif qk_norm is None:
            self.norm_q = self.norm_k = None
        else:
            raise ValueError(f"unsupported qk_norm {qk_norm}")

        if added_kv_proj_dim is not None:
            self.add_q_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            self.add_k_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            self.add_v_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            if qk_norm == "rms_norm":
                self.norm_added_q = RMSNorm(dim_head, eps=eps)
                self.norm_added_k = RMSNorm(dim_head, eps=eps)
            else:
                self.norm_added_q = self.norm_added_k = None
            if not context_pre_only:
                self.to_add_out = Linear(self.inner_dim, added_kv_proj_dim, use_bias=True)

    # trace-time PAG flag: perturbed forward masks image↔image attention to
    # identity (diagonal only), image→text left intact — the reference's
    # PAGJointAttnProcessor2_0 full_mask (attention_processor.py:1620-1633)
    pag_identity: bool = False

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None, backend=None):
        b, sample_len = hidden_states.shape[0], hidden_states.shape[1]
        q = self.to_q(params["to_q"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)

        if encoder_hidden_states is not None:
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            if self.norm_added_q is not None:
                eq = self.norm_added_q(params["norm_added_q"], eq)
                ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([q, eq], axis=1)
            k = jnp.concatenate([k, ek], axis=1)
            v = jnp.concatenate([v, ev], axis=1)

        attn_mask = None
        if self.pag_identity:
            sq = q.shape[1]
            neg = jnp.finfo(jnp.float32).min
            img = jnp.where(jnp.eye(sample_len, dtype=bool), 0.0, neg)
            attn_mask = jnp.zeros((sq, sq), jnp.float32).at[:sample_len, :sample_len].set(img)[None, None]
        out = dispatch_attention_fn(q, k, v, attn_mask=attn_mask, backend=backend)
        out = out.reshape(b, -1, self.heads * self.dim_head).astype(q.dtype)

        if encoder_hidden_states is not None:
            sample_out, context_out = out[:, :sample_len], out[:, sample_len:]
            sample_out = self.to_out[0](params["to_out"][0], sample_out)
            if not self.context_pre_only:
                context_out = self.to_add_out(params["to_add_out"], context_out)
            return sample_out, context_out
        return self.to_out[0](params["to_out"][0], out)


class JointTransformerBlock(Module):
    def __init__(
        self,
        dim: int,
        num_attention_heads: int,
        attention_head_dim: int,
        context_pre_only: bool = False,
        qk_norm: Optional[str] = None,
        use_dual_attention: bool = False,
    ):
        super().__init__()
        self.use_dual_attention = use_dual_attention
        self.context_pre_only = context_pre_only

        self.norm1 = SD35AdaLayerNormZeroX(dim) if use_dual_attention else AdaLayerNormZero(dim)
        if context_pre_only:
            self.norm1_context = AdaLayerNormContinuous(dim, dim, elementwise_affine=False, eps=1e-6, bias=True)
        else:
            self.norm1_context = AdaLayerNormZero(dim)

        self.attn = JointAttention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
            added_kv_proj_dim=dim, context_pre_only=context_pre_only, qk_norm=qk_norm, out_dim=dim,
        )
        if use_dual_attention:
            self.attn2 = JointAttention(
                query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim, qk_norm=qk_norm, out_dim=dim
            )

        self.norm2 = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")
        if not context_pre_only:
            self.norm2_context = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
            self.ff_context = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    # Skip Layer Guidance: trace-time flag — when True the whole block is an
    # identity (reference hooks/layer_skip.py via LayerSkipConfig; used by the
    # SD3.5 SLG recipe). See guiders/skip_layer_guidance.py.
    layer_skip: bool = False

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, pab=None):
        if self.layer_skip:
            if pab is not None:
                return hidden_states, encoder_hidden_states, pab[1]
            return hidden_states, encoder_hidden_states
        if self.use_dual_attention:
            norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp, norm_hidden2, gate_msa2 = self.norm1(
                params["norm1"], hidden_states, emb=temb
            )
        else:
            norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, emb=temb)

        if self.context_pre_only:
            norm_context = self.norm1_context(params["norm1_context"], encoder_hidden_states, temb)
        else:
            norm_context, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
                params["norm1_context"], encoder_hidden_states, emb=temb
            )

        new_pab = None
        if pab is None:
            attn_output, context_attn_output = self.attn(params["attn"], norm_hidden, norm_context)
            if self.use_dual_attention:
                attn_output2 = self.attn2(params["attn2"], norm_hidden2)
        else:
            # PAB: recompute the (joint) attention only on compute steps
            # (hooks/pyramid_attention_broadcast.py); the MLPs always run
            from ...hooks.pyramid_attention_broadcast import pab_gate

            compute, cached = pab

            def _compute_attn():
                a, c = self.attn(params["attn"], norm_hidden, norm_context)
                entry = {"attn": a}
                if not self.context_pre_only:
                    entry["ctx"] = c
                if self.use_dual_attention:
                    entry["attn2"] = self.attn2(params["attn2"], norm_hidden2)
                return entry

            new_pab = pab_gate(compute, cached, _compute_attn)
            attn_output = new_pab["attn"]
            context_attn_output = new_pab.get("ctx")
            attn_output2 = new_pab.get("attn2")
        hidden_states = hidden_states + gate_msa[:, None] * attn_output

        if self.use_dual_attention:
            hidden_states = hidden_states + gate_msa2[:, None] * attn_output2

        norm_hidden = self.norm2({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_hidden)

        if self.context_pre_only:
            if pab is not None:
                return hidden_states, None, new_pab
            return hidden_states, None
        encoder_hidden_states = encoder_hidden_states + c_gate_msa[:, None] * context_attn_output
        norm_context = self.norm2_context({}, encoder_hidden_states)
        norm_context = norm_context * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * self.ff_context(
            params["ff_context"], norm_context
        )
        if pab is not None:
            return hidden_states, encoder_hidden_states, new_pab
        return hidden_states, encoder_hidden_states


class SD3Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 128,
        patch_size: int = 2,
        in_channels: int = 16,
        num_layers: int = 18,
        attention_head_dim: int = 64,
        num_attention_heads: int = 18,
        joint_attention_dim: int = 4096,
        caption_projection_dim: int = 1152,
        pooled_projection_dim: int = 2048,
        out_channels: int = 16,
        pos_embed_max_size: int = 96,
        dual_attention_layers: Tuple[int, ...] = (),
        qk_norm: Optional[str] = None,
    ):
        super().__init__()
        self.out_channels = out_channels if out_channels is not None else in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.pos_embed = PatchEmbed(
            height=sample_size,
            width=sample_size,
            patch_size=patch_size,
            in_channels=in_channels,
            embed_dim=self.inner_dim,
            pos_embed_max_size=pos_embed_max_size,
        )
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
        )
        self.context_embedder = Linear(joint_attention_dim, caption_projection_dim)
        self.transformer_blocks = ModuleList(
            [
                JointTransformerBlock(
                    dim=self.inner_dim,
                    num_attention_heads=num_attention_heads,
                    attention_head_dim=attention_head_dim,
                    context_pre_only=(i == num_layers - 1),
                    qk_norm=qk_norm,
                    use_dual_attention=(i in dual_attention_layers),
                )
                for i in range(num_layers)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, S, joint_attention_dim]
        pooled_projections: jax.Array,  # [B, pooled_projection_dim]
        timestep: jax.Array,  # [B]
        block_controlnet_hidden_states: Optional[list] = None,
        fbc_state=None,
        fbc_config=None,
        pab_compute=None,
        pab_cache=None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        height, width = hidden_states.shape[-2], hidden_states.shape[-1]
        p = self.config.patch_size

        hidden_states = self.pos_embed(params["pos_embed"], hidden_states)  # [B, N, D]
        temb = self.time_text_embed(params["time_text_embed"], timestep, pooled_projections)
        encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if fbc_state is not None:
            # first-block cache on the sample stream (hooks/first_block_cache.py)
            from ...hooks.first_block_cache import fbc_single_gate

            first_in = hidden_states
            hidden_states, new_context = self.transformer_blocks[0](
                params["transformer_blocks"][0], hidden_states, encoder_hidden_states, temb
            )
            ctx_after_first = new_context if new_context is not None else encoder_hidden_states

            def tail(h):
                ctx = ctx_after_first
                for i, block in enumerate(self.transformer_blocks):
                    if i == 0:
                        continue
                    h, new_ctx = block(params["transformer_blocks"][i], h, ctx, temb)
                    if new_ctx is not None:
                        ctx = new_ctx
                return h

            hidden_states, fbc_state = fbc_single_gate(
                fbc_state, fbc_config, hidden_states - first_in, hidden_states, tail
            )
        else:
            new_pab_cache = {} if pab_cache is not None else None
            for i, block in enumerate(self.transformer_blocks):
                if pab_cache is not None:
                    hidden_states, new_context, new_pab_cache[i] = block(
                        params["transformer_blocks"][i], hidden_states, encoder_hidden_states,
                        temb, pab=(pab_compute, pab_cache[i])
                    )
                else:
                    hidden_states, new_context = block(
                        params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb
                    )
                if new_context is not None:
                    encoder_hidden_states = new_context
                # controlnet residual (reference transformer_sd3.py:324-326)
                if block_controlnet_hidden_states is not None and not block.context_pre_only:
                    interval = len(self.transformer_blocks) / len(block_controlnet_hidden_states)
                    hidden_states = hidden_states + block_controlnet_hidden_states[int(i / interval)]

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        # unpatchify
        h, w = height // p, width // p
        hidden_states = hidden_states.reshape(hidden_states.shape[0], h, w, p, p, self.out_channels)
        hidden_states = jnp.einsum("bhwpqc->bchpwq", hidden_states)
        output = hidden_states.reshape(hidden_states.shape[0], self.out_channels, h * p, w * p)

        if fbc_state is not None:
            if not return_dict:
                return (output, fbc_state)
            return Transformer2DModelOutput(sample=output), fbc_state
        if pab_cache is not None:
            if not return_dict:
                return (output, new_pab_cache)
            return Transformer2DModelOutput(sample=output), new_pab_cache
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

    def init_pab_cache(self, batch_size: int, image_tokens: int, text_tokens: int,
                       dtype=jnp.float32):
        """Zero per-block attention caches for PAB (the step-0 mask always
        computes, so zeros are never consumed)."""
        cache = {}
        for i, block in enumerate(self.transformer_blocks):
            entry = {"attn": jnp.zeros((batch_size, image_tokens, self.inner_dim), dtype)}
            if not block.context_pre_only:
                entry["ctx"] = jnp.zeros((batch_size, text_tokens, self.inner_dim), dtype)
            if block.use_dual_attention:
                entry["attn2"] = jnp.zeros((batch_size, image_tokens, self.inner_dim), dtype)
            cache[i] = entry
        return cache

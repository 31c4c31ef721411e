"""FluxTransformer2DModel — rectified-flow DiT (Flux.1 family).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_flux.py:523`
FluxTransformer2DModel; FluxTransformerBlock `:410`, FluxSingleTransformerBlock
`:356`, FluxAttnProcessor `:75`, FluxPosEmbed `:494`; the reference's `_cp_plan`
at `:567` maps to our sequence-sharding PartitionSpecs in parallel/plans.py).

TPU-first: the packed (text‖image) token stream is one big [B, S, D] matmul
chain — ideal MXU shape; RoPE tables are precomputed host-side in float64 and
passed in (matching the reference's float64 rope), and attention routes
through the dispatch layer (Pallas flash attention on real sequences).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    CombinedTimestepGuidanceTextProjEmbeddings,
    CombinedTimestepTextProjEmbeddings,
    FluxPosEmbed,
    apply_rotary_emb,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous, AdaLayerNormZero, AdaLayerNormZeroSingle


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class FluxAttention(Module):
    """Joint text+image attention with RMS qk-norm and RoPE."""

    def __init__(
        self,
        query_dim: int,
        heads: int,
        dim_head: int,
        added_kv_proj_dim: Optional[int] = None,
        context_pre_only: Optional[bool] = None,
        bias: bool = True,
        eps: float = 1e-6,
        out_dim: Optional[int] = None,
        pre_only: bool = False,
    ):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = out_dim if out_dim is not None else heads * dim_head
        self.added_kv_proj_dim = added_kv_proj_dim
        self.context_pre_only = context_pre_only
        self.pre_only = pre_only

        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_v = Linear(query_dim, self.inner_dim, use_bias=bias)
        if not pre_only:
            self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=True)])
        if added_kv_proj_dim is not None:
            self.norm_added_q = RMSNorm(dim_head, eps=eps)
            self.norm_added_k = RMSNorm(dim_head, eps=eps)
            self.add_q_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            self.add_k_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            self.add_v_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=bias)
            self.to_add_out = Linear(self.inner_dim, added_kv_proj_dim, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        attention_mask: Optional[jax.Array] = None,
        backend: Optional[str] = None,
    ):
        b = hidden_states.shape[0]
        q = self.to_q(params["to_q"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        if self.added_kv_proj_dim is not None and encoder_hidden_states is not None:
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            eq = self.norm_added_q(params["norm_added_q"], eq)
            ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([eq, q], axis=1)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask, backend=backend)
        out = out.reshape(b, -1, self.heads * self.dim_head).astype(q.dtype)

        if encoder_hidden_states is not None:
            txt_len = encoder_hidden_states.shape[1]
            context_out, sample_out = out[:, :txt_len], out[:, txt_len:]
            sample_out = self.to_out[0](params["to_out"][0], sample_out)
            context_out = self.to_add_out(params["to_add_out"], context_out)
            return sample_out, context_out
        if self.pre_only:
            return out
        return self.to_out[0](params["to_out"][0], out)


class FluxSingleTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.mlp_hidden_dim = int(dim * mlp_ratio)
        self.norm = AdaLayerNormZeroSingle(dim)
        self.proj_mlp = Linear(dim, self.mlp_hidden_dim)
        self.proj_out = Linear(dim + self.mlp_hidden_dim, dim)
        self.attn = FluxAttention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim, out_dim=dim, bias=True,
            eps=1e-6, pre_only=True,
        )

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, image_rotary_emb=None, pab=None):
        text_seq_len = encoder_hidden_states.shape[1]
        hidden_states = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)

        residual = hidden_states
        norm_hidden_states, gate = self.norm(params["norm"], hidden_states, emb=temb)
        mlp_hidden_states = jax.nn.gelu(self.proj_mlp(params["proj_mlp"], norm_hidden_states), approximate=True)
        if pab is None:
            attn_output = self.attn(params["attn"], norm_hidden_states, image_rotary_emb=image_rotary_emb)
        else:
            # PAB: reuse the cached attention output on broadcast steps
            # (hooks/pyramid_attention_broadcast.py; MLP always computes)
            compute, cached = pab
            attn_output = jax.lax.cond(
                compute,
                lambda _: self.attn(params["attn"], norm_hidden_states, image_rotary_emb=image_rotary_emb),
                lambda _: cached,
                None,
            )

        hidden_states = jnp.concatenate([attn_output, mlp_hidden_states], axis=2)
        hidden_states = gate[:, None] * self.proj_out(params["proj_out"], hidden_states)
        hidden_states = residual + hidden_states

        out = (hidden_states[:, :text_seq_len], hidden_states[:, text_seq_len:])
        if pab is not None:
            return (*out, attn_output)
        return out


class FluxTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, eps: float = 1e-6):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = FluxAttention(
            query_dim=dim, added_kv_proj_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
            out_dim=dim, context_pre_only=False, bias=True, eps=eps,
        )
        self.norm2 = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")
        self.norm2_context = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff_context = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, image_rotary_emb=None, pab=None):
        norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, emb=temb)
        norm_context, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
            params["norm1_context"], encoder_hidden_states, emb=temb
        )

        if pab is None:
            attn_output, context_attn_output = self.attn(
                params["attn"], norm_hidden, encoder_hidden_states=norm_context, image_rotary_emb=image_rotary_emb
            )
        else:
            compute, cached = pab  # cached = (attn_output, context_attn_output)
            attn_output, context_attn_output = jax.lax.cond(
                compute,
                lambda _: self.attn(
                    params["attn"], norm_hidden, encoder_hidden_states=norm_context, image_rotary_emb=image_rotary_emb
                ),
                lambda _: cached,
                None,
            )

        hidden_states = hidden_states + gate_msa[:, None] * attn_output
        norm_hidden = self.norm2({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_hidden)

        encoder_hidden_states = encoder_hidden_states + c_gate_msa[:, None] * context_attn_output
        norm_context = self.norm2_context({}, encoder_hidden_states)
        norm_context = norm_context * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * self.ff_context(
            params["ff_context"], norm_context
        )
        if pab is not None:
            return encoder_hidden_states, hidden_states, (attn_output, context_attn_output)
        return encoder_hidden_states, hidden_states


class FluxTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 64,
        out_channels: Optional[int] = None,
        num_layers: int = 19,
        num_single_layers: int = 38,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 4096,
        pooled_projection_dim: int = 768,
        guidance_embeds: bool = False,
        axes_dims_rope: Tuple[int, ...] = (16, 56, 56),
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.pos_embed = FluxPosEmbed(theta=10000, axes_dim=axes_dims_rope)
        if guidance_embeds:
            self.time_text_embed = CombinedTimestepGuidanceTextProjEmbeddings(
                embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
            )
        else:
            self.time_text_embed = CombinedTimestepTextProjEmbeddings(
                embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
            )
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim)
        self.x_embedder = Linear(in_channels, self.inner_dim)

        self.transformer_blocks = ModuleList(
            [
                FluxTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_layers)
            ]
        )
        self.single_transformer_blocks = ModuleList(
            [
                FluxSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_single_layers)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, image_seq, in_channels] (packed latents)
        encoder_hidden_states: jax.Array,  # [B, text_seq, joint_attention_dim]
        pooled_projections: jax.Array,  # [B, pooled_projection_dim]
        timestep: jax.Array,  # [B] in [0, 1]
        img_ids: Optional[jax.Array] = None,  # [image_seq, 3]
        txt_ids: Optional[jax.Array] = None,  # [text_seq, 3]
        guidance: Optional[jax.Array] = None,  # [B]
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        controlnet_block_samples=None,
        controlnet_single_block_samples=None,
        controlnet_blocks_repeat: bool = False,
        scan_blocks: bool = False,
        pab_compute: Optional[jax.Array] = None,  # bool scalar (PAB: recompute attention this step?)
        pab_cache: Optional[dict] = None,  # stacked per-block attention caches (see hooks/pyramid_attention_broadcast.py)
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        timestep = timestep.astype(hidden_states.dtype) * 1000
        if guidance is not None:
            guidance = guidance.astype(hidden_states.dtype) * 1000

        if guidance is None:
            temb = self.time_text_embed(params["time_text_embed"], timestep, pooled_projections)
        else:
            temb = self.time_text_embed(params["time_text_embed"], timestep, guidance, pooled_projections)
        encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if image_rotary_emb is None:
            ids = jnp.concatenate([txt_ids, img_ids], axis=0)
            image_rotary_emb = self.pos_embed({}, ids)

        if pab_cache is not None:
            # PAB forward: per-block attention caches threaded through the
            # block loop; returns (sample, new_pab_cache) (not an output class)
            new_dual_attn, new_dual_ctx, new_single = [], [], []
            for i, block in enumerate(self.transformer_blocks):
                encoder_hidden_states, hidden_states, (a, c) = block(
                    params["transformer_blocks"][i],
                    hidden_states,
                    encoder_hidden_states,
                    temb,
                    image_rotary_emb,
                    pab=(pab_compute, (pab_cache["dual_attn"][i], pab_cache["dual_ctx"][i])),
                )
                new_dual_attn.append(a)
                new_dual_ctx.append(c)
            for i, block in enumerate(self.single_transformer_blocks):
                encoder_hidden_states, hidden_states, a = block(
                    params["single_transformer_blocks"][i],
                    hidden_states,
                    encoder_hidden_states,
                    temb,
                    image_rotary_emb,
                    pab=(pab_compute, pab_cache["single_attn"][i]),
                )
                new_single.append(a)
            hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
            output = self.proj_out(params["proj_out"], hidden_states)
            new_cache = {
                "dual_attn": jnp.stack(new_dual_attn),
                "dual_ctx": jnp.stack(new_dual_ctx),
                "single_attn": jnp.stack(new_single),
            }
            return output, new_cache

        # pre-stacked per-block params (leading layer axis, no integer keys)
        # can ONLY run the scan path — auto-detect so pipelines work with
        # stream-loaded/stacked weights without threading scan_blocks through
        if isinstance(params["transformer_blocks"], dict) and 0 not in params["transformer_blocks"]:
            scan_blocks = True
        if scan_blocks and controlnet_block_samples is None and controlnet_single_block_samples is None:
            # Repeated-block scan (our analogue of the reference's
            # compile_repeated_blocks, modeling_utils.py:1568): lax.scan one
            # block body over stacked per-block params. Bounds HLO temp memory
            # to a single block's working set and compiles ~50x less HLO.
            # Prefer pre-stacked params (see `stack_block_params`) so no
            # stacked copy is materialized on device.
            dual_stack = params["transformer_blocks"]
            if isinstance(dual_stack, dict) and 0 in dual_stack:
                dual_stack = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[params["transformer_blocks"][i] for i in range(len(self.transformer_blocks))],
                )
            single_stack = params["single_transformer_blocks"]
            if isinstance(single_stack, dict) and 0 in single_stack:
                single_stack = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[params["single_transformer_blocks"][i] for i in range(len(self.single_transformer_blocks))],
                )
            dual_block = self.transformer_blocks[0]
            single_block = self.single_transformer_blocks[0]

            def dual_body(carry, block_params):
                hidden, context = carry
                context, hidden = dual_block(block_params, hidden, context, temb, image_rotary_emb)
                return (hidden, context), None

            def single_body(carry, block_params):
                hidden, context = carry
                context, hidden = single_block(block_params, hidden, context, temb, image_rotary_emb)
                return (hidden, context), None

            (hidden_states, encoder_hidden_states), _ = jax.lax.scan(
                dual_body, (hidden_states, encoder_hidden_states), dual_stack
            )
            (hidden_states, encoder_hidden_states), _ = jax.lax.scan(
                single_body, (hidden_states, encoder_hidden_states), single_stack
            )
            hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
            output = self.proj_out(params["proj_out"], hidden_states)
            if not return_dict:
                return (output,)
            return Transformer2DModelOutput(sample=output)

        for i, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["transformer_blocks"][i],
                hidden_states,
                encoder_hidden_states,
                temb,
                image_rotary_emb,
            )
            if controlnet_block_samples is not None:
                # ceil-interval mapping / Xlabs modulo repeat (reference
                # transformer_flux.py:744-752)
                if controlnet_blocks_repeat:
                    hidden_states = hidden_states + controlnet_block_samples[i % len(controlnet_block_samples)]
                else:
                    interval = int(np.ceil(len(self.transformer_blocks) / len(controlnet_block_samples)))
                    hidden_states = hidden_states + controlnet_block_samples[i // interval]

        for i, block in enumerate(self.single_transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["single_transformer_blocks"][i],
                hidden_states,
                encoder_hidden_states,
                temb,
                image_rotary_emb,
            )
            if controlnet_single_block_samples is not None:
                interval = int(np.ceil(len(self.single_transformer_blocks) / len(controlnet_single_block_samples)))
                hidden_states = hidden_states + controlnet_single_block_samples[i // interval]

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        output = self.proj_out(params["proj_out"], hidden_states)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)


def stack_block_params(params: Params) -> Params:
    """Host-side: stack per-block param dicts into leading-axis arrays for the
    `scan_blocks=True` forward (avoids materializing a second copy on device
    inside jit)."""
    out = dict(params)
    for name in ("transformer_blocks", "single_transformer_blocks"):
        blocks = params[name]
        if isinstance(blocks, dict) and 0 in blocks:
            n = len(blocks)
            out[name] = jax.tree.map(lambda *xs: jnp.stack(xs), *[blocks[i] for i in range(n)])
    return out

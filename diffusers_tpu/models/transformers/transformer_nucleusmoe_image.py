"""NucleusMoEImageTransformer2DModel — Nucleus MoE image DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_nucleusmoe_image.py:726`;
image-query-only GQA joint attention `:259`, expert-choice MoE with
timestep-conditioned router `:501`, packed SwiGLU experts `:362`, tanh-
clamped 4-param modulation blocks `:607`, symmetric-scaled QwenImage-style
rope `:145`).

TPU-first: expert-choice routing is STATIC-shape — capacity
C = ceil(cf·S/E) is compile-time, the per-expert top-C gather and the
scatter-add combine are fixed-size, and the packed experts run as ONE
batched einsum over the expert axis (the reference's grouped_mm /
host-synced for-loop both disappear).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ..attention_blocks import FeedForward, _PassThrough
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_qwenimage import QwenEmbedRope, Transformer2DModelOutput, _rotate_interleaved


def _is_moe_layer(strategy: str, layer_idx: int, num_layers: int) -> bool:
    if strategy == "leave_first_three_and_last_block_dense":
        return 3 <= layer_idx < num_layers - 1
    if strategy == "leave_first_three_blocks_dense":
        return layer_idx >= 3
    if strategy == "leave_first_block_dense":
        return layer_idx >= 1
    if strategy == "all_moe":
        return True
    if strategy == "all_dense":
        return False
    return True


class NucleusMoETimestepProjEmbeddings(Module):
    def __init__(self, embedding_dim: int, use_additional_t_cond: bool = False):
        super().__init__()
        self.time_proj = Timesteps(num_channels=embedding_dim, flip_sin_to_cos=True,
                                   downscale_freq_shift=0, scale=1000)
        self.timestep_embedder = TimestepEmbedding(embedding_dim, 4 * embedding_dim,
                                                   out_dim=embedding_dim)
        self.norm = RMSNorm(embedding_dim, eps=1e-6)
        self.use_additional_t_cond = use_additional_t_cond

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        proj = self.time_proj({}, timestep).astype(dtype)
        emb = self.timestep_embedder(params["timestep_embedder"], proj)
        return self.norm(params["norm"], emb)


class NucleusMoEAttention(Module):
    """Image-query-only joint attention: image queries attend to
    [image, text] keys/values; GQA via kv_heads (reference :259)."""

    def __init__(self, dim: int, heads: int, dim_head: int, kv_heads: Optional[int] = None,
                 eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.kv_heads = kv_heads or heads
        self.dim_head = dim_head
        self.to_q = Linear(dim, heads * dim_head, use_bias=False)
        self.to_k = Linear(dim, self.kv_heads * dim_head, use_bias=False)
        self.to_v = Linear(dim, self.kv_heads * dim_head, use_bias=False)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.add_k_proj = Linear(dim, self.kv_heads * dim_head, use_bias=False)
        self.add_v_proj = Linear(dim, self.kv_heads * dim_head, use_bias=False)
        self.norm_added_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(heads * dim_head, dim, use_bias=False)])

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array],
                 image_rotary_emb, attention_mask: Optional[jax.Array] = None) -> jax.Array:
        b, s_img = hidden_states.shape[:2]
        q = self.to_q(params["to_q"], hidden_states).reshape(b, s_img, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, s_img, self.kv_heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, s_img, self.kv_heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        (img_cos, img_sin), (txt_cos, txt_sin) = image_rotary_emb
        q = _rotate_interleaved(q, img_cos, img_sin)
        k = _rotate_interleaved(k, img_cos, img_sin)

        if encoder_hidden_states is not None:
            s_txt = encoder_hidden_states.shape[1]
            tk = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(
                b, s_txt, self.kv_heads, self.dim_head)
            tv = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(
                b, s_txt, self.kv_heads, self.dim_head)
            tk = self.norm_added_k(params["norm_added_k"], tk)
            tk = _rotate_interleaved(tk, txt_cos, txt_sin)
            k = jnp.concatenate([k, tk], axis=1)
            v = jnp.concatenate([v, tv], axis=1)

        if self.kv_heads != self.heads:
            rep = self.heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, s_img, -1).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class SwiGLUExperts(Module):
    """Packed experts (reference :362). Weights stored exactly in the
    checkpoint layout: gate_up_proj [E, H, 2M], down_proj [E, M, H]; tokens
    arrive pre-grouped [E, C_total, H] so both matmuls are one batched
    einsum over the expert axis."""

    def __init__(self, hidden_size: int, moe_intermediate_dim: int, num_experts: int):
        super().__init__()
        self.hidden_size = hidden_size
        self.moe_intermediate_dim = moe_intermediate_dim
        self.num_experts = num_experts

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        scale = 1.0 / math.sqrt(self.hidden_size)
        return {
            "gate_up_proj": (jax.random.normal(
                k1, (self.num_experts, self.hidden_size, 2 * self.moe_intermediate_dim),
                jnp.float32) * scale).astype(dtype),
            "down_proj": (jax.random.normal(
                k2, (self.num_experts, self.moe_intermediate_dim, self.hidden_size),
                jnp.float32) * scale / math.sqrt(self.moe_intermediate_dim)
                * math.sqrt(self.hidden_size)).astype(dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [E, T, H]
        gate_up = jnp.einsum("eth,ehm->etm", x, params["gate_up_proj"].astype(x.dtype))
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return jnp.einsum("etm,emh->eth", jax.nn.silu(gate) * up,
                          params["down_proj"].astype(x.dtype))


class NucleusMoELayer(Module):
    """Expert-choice MoE with shared expert (reference :501)."""

    def __init__(self, hidden_size: int, moe_intermediate_dim: int, num_experts: int,
                 capacity_factor: float, use_sigmoid: bool, route_scale: float):
        super().__init__()
        self.num_experts = num_experts
        self.capacity_factor = capacity_factor
        self.use_sigmoid = use_sigmoid
        self.route_scale = route_scale
        self.gate = Linear(hidden_size * 2, num_experts, use_bias=False)
        self.experts = SwiGLUExperts(hidden_size, moe_intermediate_dim, num_experts)
        self.shared_expert = FeedForward(hidden_size, hidden_size,
                                         inner_dim=moe_intermediate_dim,
                                         activation_fn="swiglu", bias=False)

    def __call__(self, params: Params, hidden_states: jax.Array,
                 hidden_states_unmodulated: jax.Array,
                 timestep: Optional[jax.Array] = None) -> jax.Array:
        bs, slen, dim = hidden_states.shape
        E = self.num_experts
        if timestep is not None:
            t_exp = jnp.broadcast_to(timestep[:, None, :], (bs, slen, timestep.shape[-1]))
            router_input = jnp.concatenate([t_exp, hidden_states_unmodulated], axis=-1)
        else:
            router_input = hidden_states_unmodulated
        logits = self.gate(params["gate"], router_input)
        if self.use_sigmoid:
            scores = jax.nn.sigmoid(logits.astype(jnp.float32)).astype(logits.dtype)
        else:
            scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)

        affinity = jnp.swapaxes(scores, 1, 2)  # [B, E, S]
        capacity = max(1, math.ceil(self.capacity_factor * slen / E))
        gating, top_indices = jax.lax.top_k(affinity, capacity)  # [B, E, C]

        batch_offsets = (jnp.arange(bs) * slen)[:, None, None]
        # [E, B*C] flat global token ids (expert-major, matching reference layout)
        global_idx = jnp.swapaxes(batch_offsets + top_indices, 0, 1).reshape(E * bs * capacity)
        gating_flat = jnp.swapaxes(gating, 0, 1).reshape(E * bs * capacity)

        token_score_sums = jnp.zeros((bs * slen,), gating_flat.dtype).at[global_idx].add(gating_flat)
        gating_flat = gating_flat / (token_score_sums[global_idx] + 1e-12)
        gating_flat = gating_flat * self.route_scale

        x_flat = hidden_states.reshape(bs * slen, dim)
        routed_input = x_flat[global_idx].reshape(E, bs * capacity, dim)
        routed_output = self.experts(params["experts"], routed_input).reshape(E * bs * capacity, dim)
        routed_output = (routed_output.astype(jnp.float32)
                         * gating_flat.astype(jnp.float32)[:, None]).astype(hidden_states.dtype)

        out = self.shared_expert(params["shared_expert"], hidden_states).reshape(bs * slen, dim)
        out = out.at[global_idx].add(routed_output)
        return out.reshape(bs, slen, dim)


class NucleusMoEImageTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 num_key_value_heads: Optional[int] = None, joint_attention_dim: int = 3584,
                 eps: float = 1e-6, mlp_ratio: float = 4.0, moe_enabled: bool = False,
                 num_experts: int = 128, moe_intermediate_dim: int = 1344,
                 capacity_factor: float = 8.0, use_sigmoid: bool = False,
                 route_scale: float = 2.5):
        super().__init__()
        self.moe_enabled = moe_enabled
        self.img_mod = ModuleList([_PassThrough(), Linear(dim, 4 * dim, use_bias=True)])
        self.encoder_proj = Linear(joint_attention_dim, dim)
        self.pre_attn_norm = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn = NucleusMoEAttention(dim, num_attention_heads, attention_head_dim,
                                        kv_heads=num_key_value_heads, eps=eps)
        self.pre_mlp_norm = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        if moe_enabled:
            self.img_mlp = NucleusMoELayer(dim, moe_intermediate_dim, num_experts,
                                           capacity_factor, use_sigmoid, route_scale)
        else:
            mlp_inner = int(dim * mlp_ratio * 2 / 3) // 128 * 128
            self.img_mlp = FeedForward(dim, dim, inner_dim=max(mlp_inner, 128),
                                       activation_fn="swiglu", bias=False)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb, attention_mask=None):
        mods = self.img_mod[1](params["img_mod"][1], jax.nn.silu(temb))[:, None]
        scale1, gate1, scale2, gate2 = jnp.split(mods, 4, axis=-1)
        gate1 = jnp.clip(gate1, -2.0, 2.0)
        gate2 = jnp.clip(gate2, -2.0, 2.0)

        context = self.encoder_proj(params["encoder_proj"], encoder_hidden_states)
        img_normed = self.pre_attn_norm({}, hidden_states)
        attn_out = self.attn(params["attn"], img_normed * (1 + scale1), context,
                             image_rotary_emb, attention_mask=attention_mask)
        hidden_states = hidden_states + jnp.tanh(gate1) * attn_out

        img_normed2 = self.pre_mlp_norm({}, hidden_states)
        modulated2 = img_normed2 * (1 + scale2)
        if self.moe_enabled:
            mlp_out = self.img_mlp(params["img_mlp"], modulated2, img_normed2, timestep=temb)
        else:
            mlp_out = self.img_mlp(params["img_mlp"], modulated2)
        return hidden_states + jnp.tanh(gate2) * mlp_out


class NucleusMoEImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """Nucleus MoE image DiT (reference :726)."""

    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 64,
        out_channels: Optional[int] = None,
        num_layers: int = 24,
        attention_head_dim: int = 128,
        num_attention_heads: int = 16,
        num_key_value_heads: Optional[int] = None,
        joint_attention_dim: int = 3584,
        axes_dims_rope: Tuple[int, int, int] = (16, 56, 56),
        mlp_ratio: float = 4.0,
        moe_enabled: bool = True,
        dense_moe_strategy: str = "leave_first_three_and_last_block_dense",
        num_experts: int = 128,
        moe_intermediate_dim: int = 1344,
        capacity_factors: Union[float, List[float]] = 8.0,
        use_sigmoid: bool = False,
        route_scale: float = 2.5,
        use_grouped_mm: bool = False,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        cfs = capacity_factors if isinstance(capacity_factors, list) else [capacity_factors] * num_layers

        self.pos_embed = QwenEmbedRope(theta=10000, axes_dim=list(axes_dims_rope), scale_rope=True)
        self.time_text_embed = NucleusMoETimestepProjEmbeddings(self.inner_dim)
        self.txt_norm = RMSNorm(joint_attention_dim, eps=1e-6)
        self.img_in = Linear(in_channels, self.inner_dim)
        self.transformer_blocks = ModuleList([
            NucleusMoEImageTransformerBlock(
                dim=self.inner_dim, num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim, num_key_value_heads=num_key_value_heads,
                joint_attention_dim=joint_attention_dim, mlp_ratio=mlp_ratio,
                moe_enabled=moe_enabled and _is_moe_layer(dense_moe_strategy, idx, num_layers),
                num_experts=num_experts, moe_intermediate_dim=moe_intermediate_dim,
                capacity_factor=cfs[idx], use_sigmoid=use_sigmoid, route_scale=route_scale)
            for idx in range(num_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim,
                                               elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels,
                               use_bias=False)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        img_shapes,
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_mask: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        hidden_states = self.img_in(params["img_in"], hidden_states)
        timestep = timestep.astype(hidden_states.dtype)
        encoder_hidden_states = self.txt_norm(params["txt_norm"], encoder_hidden_states)

        text_seq_len = encoder_hidden_states.shape[1]
        temb = self.time_text_embed(params["time_text_embed"], timestep, hidden_states.dtype)
        image_rotary_emb = self.pos_embed(img_shapes, max_txt_seq_len=text_seq_len)

        attention_mask = None
        if encoder_hidden_states_mask is not None:
            b, s_img = hidden_states.shape[:2]
            joint = jnp.concatenate(
                [jnp.ones((b, s_img), bool), encoder_hidden_states_mask.astype(bool)], axis=1)
            attention_mask = joint[:, None, None, :]

        for i, block in enumerate(self.transformer_blocks):
            hidden_states = block(params["transformer_blocks"][i], hidden_states,
                                  encoder_hidden_states, temb, image_rotary_emb,
                                  attention_mask=attention_mask)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        output = self.proj_out(params["proj_out"], hidden_states)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

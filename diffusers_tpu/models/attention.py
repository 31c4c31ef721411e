"""Attention module.

Functional mirror of the reference `Attention` block
(`/root/reference/src/diffusers/models/attention_processor.py:52`, new-style
`models/attention.py:121` AttentionModuleMixin) with the processor object
replaced by the backend dispatch in `ops/attention.py`. Parameter subtree
names (to_q/to_k/to_v/to_out.0/group_norm/norm_q/...) match the reference
state-dict keys exactly so checkpoints load mechanically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import dispatch_attention_fn
from ..ops.module import GroupNorm, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm


class Attention(Module):
    """Multi-head attention over [B, S, C] hidden states (self or cross)."""

    def __init__(
        self,
        query_dim: int,
        cross_attention_dim: Optional[int] = None,
        heads: int = 8,
        dim_head: int = 64,
        bias: bool = False,
        upcast_attention: bool = False,
        upcast_softmax: bool = False,
        cross_attention_norm: Optional[str] = None,
        added_kv_proj_dim: Optional[int] = None,
        added_proj_bias: bool = True,
        norm_num_groups: Optional[int] = None,
        out_bias: bool = True,
        scale_qk: bool = True,
        qk_norm: Optional[str] = None,
        eps: float = 1e-5,
        rescale_output_factor: float = 1.0,
        residual_connection: bool = False,
        out_dim: Optional[int] = None,
        context_pre_only: Optional[bool] = None,
        pre_only: bool = False,
        elementwise_affine: bool = True,
        kv_heads: Optional[int] = None,
    ):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.inner_kv_dim = self.inner_dim if kv_heads is None else dim_head * kv_heads
        self.query_dim = query_dim
        self.cross_attention_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.dim_head = dim_head
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.context_pre_only = context_pre_only
        self.pre_only = pre_only

        if norm_num_groups is not None:
            self.group_norm = GroupNorm(num_groups=norm_num_groups, num_channels=query_dim, eps=eps, affine=True)
        else:
            self.group_norm = None

        if qk_norm is None:
            self.norm_q = self.norm_k = None
        elif qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        elif qk_norm == "layer_norm":
            self.norm_q = LayerNorm(dim_head, eps=eps)
            self.norm_k = LayerNorm(dim_head, eps=eps)
        else:
            raise ValueError(f"unsupported qk_norm {qk_norm}")

        if cross_attention_norm == "layer_norm":
            self.norm_cross = LayerNorm(self.cross_attention_dim)
        else:
            self.norm_cross = None

        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)
        self.to_v = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)

        self.added_kv_proj_dim = added_kv_proj_dim
        if added_kv_proj_dim is not None:
            self.add_k_proj = Linear(added_kv_proj_dim, self.inner_kv_dim, use_bias=added_proj_bias)
            self.add_v_proj = Linear(added_kv_proj_dim, self.inner_kv_dim, use_bias=added_proj_bias)
            if context_pre_only is not None:
                self.add_q_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=added_proj_bias)
            if qk_norm == "rms_norm":
                self.norm_added_q = RMSNorm(dim_head, eps=eps)
                self.norm_added_k = RMSNorm(dim_head, eps=eps)

        if not pre_only:
            self.to_out = ModuleList([Linear(self.inner_dim, self.out_dim, use_bias=out_bias)])
        if added_kv_proj_dim is not None and context_pre_only is False:
            self.to_add_out = Linear(self.inner_dim, added_kv_proj_dim, use_bias=out_bias)

    # IP-Adapter scale(s); set post-hoc by loaders.ip_adapter (a python
    # attribute: changing it retraces jit'd callers, matching the reference's
    # set_ip_adapter_scale semantics at attention_processor.py:4408)
    ip_adapter_scale: Optional[list] = None
    # PAG: when True, a self-attention call uses the identity attention map
    # (output = to_out(to_v(x)); reference PAGIdentitySelfAttnProcessor2_0,
    # attention_processor.py:5043). Flipped at trace time by the PAG pipeline
    # around its perturbed forward — the flag never costs anything per-step.
    pag_identity: bool = False
    # SEG: gaussian-blur sigma for the query projections of a self-attention
    # call (reference SmoothedEnergyGuidanceHook,
    # hooks/smoothed_energy_guidance_utils.py:47-57). Set at trace time by
    # guiders.smoothed_energy_guidance.seg_blurred around the perturbed pass.
    seg_blur_sigma: Optional[float] = None

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        backend: Optional[str] = None,
        ip_hidden_states: Optional[list] = None,
    ) -> jax.Array:
        residual = hidden_states
        b, s, _ = hidden_states.shape

        if self.group_norm is not None:
            hidden_states = self.group_norm(params["group_norm"], hidden_states)

        if self.pag_identity and encoder_hidden_states is None:
            # perturbed self-attention: identity attention map ⇒ output = V
            out = self.to_v(params["to_v"], hidden_states)
            out = self.to_out[0](params["to_out"][0], out)
            if self.residual_connection:
                out = out + residual
            return out / self.rescale_output_factor

        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        if self.norm_cross is not None and encoder_hidden_states is not None:
            context = self.norm_cross(params["norm_cross"], context)

        query = self.to_q(params["to_q"], hidden_states)
        if self.seg_blur_sigma is not None and encoder_hidden_states is None:
            import math as _math

            from ..guiders.smoothed_energy_guidance import seg_gaussian_blur_2d

            ks = _math.ceil(6 * self.seg_blur_sigma) + 1 - _math.ceil(6 * self.seg_blur_sigma) % 2
            query = seg_gaussian_blur_2d(query, ks, self.seg_blur_sigma)
        key = self.to_k(params["to_k"], context)
        value = self.to_v(params["to_v"], context)

        query = query.reshape(b, s, self.heads, self.dim_head)
        kv_heads = key.shape[-1] // self.dim_head
        key = key.reshape(b, -1, kv_heads, self.dim_head)
        value = value.reshape(b, -1, kv_heads, self.dim_head)

        if self.norm_q is not None:
            query = self.norm_q(params["norm_q"], query)
        if self.norm_k is not None:
            key = self.norm_k(params["norm_k"], key)

        if kv_heads != self.heads:
            key = jnp.repeat(key, self.heads // kv_heads, axis=2)
            value = jnp.repeat(value, self.heads // kv_heads, axis=2)

        attn = dispatch_attention_fn(
            query, key, value, attn_mask=attention_mask, scale=self.scale, backend=backend
        )
        attn = attn.reshape(b, s, self.heads * self.dim_head)

        # IP-Adapter: extra image cross-attentions with grafted K/V projections
        # (reference IPAdapterAttnProcessor2_0, attention_processor.py:4560)
        if ip_hidden_states is not None and "to_k_ip" in params:
            scales = self.ip_adapter_scale or [1.0] * len(ip_hidden_states)
            for i, ip in enumerate(ip_hidden_states):
                if scales[i] == 0:
                    continue
                ip = ip.reshape(b, -1, ip.shape[-1])  # [B, num_images*tokens, D]
                ip_key = (ip @ params["to_k_ip"][i]["kernel"]).reshape(b, -1, self.heads, self.dim_head)
                ip_value = (ip @ params["to_v_ip"][i]["kernel"]).reshape(b, -1, self.heads, self.dim_head)
                ip_attn = dispatch_attention_fn(query, ip_key, ip_value, scale=self.scale, backend="native")
                attn = attn + scales[i] * ip_attn.reshape(b, s, self.heads * self.dim_head)

        if self.pre_only:
            return attn

        out = self.to_out[0](params["to_out"][0], attn)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor

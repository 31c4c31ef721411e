"""WanVACETransformer3DModel — Wan with the VACE control branch.

Behavioral mirror of the reference
`models/transformers/transformer_wan_vace.py`: a parallel stack of VACE
blocks over the control latents (layer 0 adds the main stream via a
proj_in, every block emits a proj_out "hint", `:41`), hints injected into
the main blocks at `vace_layers` scaled by `control_hidden_states_scale`
(`:373-377`); control latents embedded by a separate 3D patch conv and
zero-padded to the main token count (`:328`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .transformer_wan import (
    WanAttention,
    WanRotaryPosEmbed,
    WanTimeTextImageEmbedding,
    WanTransformerBlock,
)
from ..attention_blocks import FeedForward


@dataclass
class Transformer3DModelOutput(BaseOutput):
    sample: jax.Array


class WanVACETransformerBlock(Module):
    def __init__(self, dim, ffn_dim, num_heads, qk_norm="rms_norm_across_heads",
                 cross_attn_norm=False, eps=1e-6, added_kv_proj_dim=None,
                 apply_input_projection=False, apply_output_projection=False):
        super().__init__()
        self.dim = dim
        if apply_input_projection:
            self.proj_in = Linear(dim, dim)
        self.has_proj_in = apply_input_projection
        self.norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn1 = WanAttention(dim=dim, heads=num_heads, dim_head=dim // num_heads, eps=eps)
        self.attn2 = WanAttention(
            dim=dim, heads=num_heads, dim_head=dim // num_heads, eps=eps,
            added_kv_proj_dim=added_kv_proj_dim, cross_attention_dim_head=dim // num_heads,
        )
        self.cross_attn_norm = cross_attn_norm
        if cross_attn_norm:
            self.norm2 = LayerNorm(dim, eps=eps, use_scale=True, use_bias=True)
        self.ffn = FeedForward(dim, inner_dim=ffn_dim, activation_fn="gelu-approximate")
        self.norm3 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        if apply_output_projection:
            self.proj_out = Linear(dim, dim)
        self.has_proj_out = apply_output_projection

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 6)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 6, self.dim), jnp.float32) / self.dim**0.5
        )
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 control_hidden_states, temb, rotary_emb):
        if self.has_proj_in:
            control_hidden_states = self.proj_in(params["proj_in"], control_hidden_states)
            control_hidden_states = control_hidden_states + hidden_states

        mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = [
            m.squeeze(1)[:, None] for m in jnp.split(mods, 6, axis=1)
        ]
        dtype = control_hidden_states.dtype

        norm_h = (self.norm1({}, control_hidden_states.astype(jnp.float32)) * (1 + scale_msa)
                  + shift_msa).astype(dtype)
        attn_out = self.attn1(params["attn1"], norm_h, None, rotary_emb)
        control_hidden_states = (control_hidden_states.astype(jnp.float32)
                                 + attn_out.astype(jnp.float32) * gate_msa).astype(dtype)

        if self.cross_attn_norm:
            norm_h = self.norm2(params["norm2"], control_hidden_states.astype(jnp.float32)).astype(dtype)
        else:
            norm_h = control_hidden_states
        attn_out = self.attn2(params["attn2"], norm_h, encoder_hidden_states, None)
        control_hidden_states = control_hidden_states + attn_out

        norm_h = (self.norm3({}, control_hidden_states.astype(jnp.float32)) * (1 + c_scale_msa)
                  + c_shift_msa).astype(dtype)
        ff_out = self.ffn(params["ffn"], norm_h)
        control_hidden_states = (control_hidden_states.astype(jnp.float32)
                                 + ff_out.astype(jnp.float32) * c_gate_msa).astype(dtype)

        conditioning_states = None
        if self.has_proj_out:
            conditioning_states = self.proj_out(params["proj_out"], control_hidden_states)
        return conditioning_states, control_hidden_states


class WanVACETransformer3DModel(Module, ModelMixin, ConfigMixin):
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
        image_dim: Optional[int] = None,
        added_kv_proj_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        pos_embed_seq_len: Optional[int] = None,
        vace_layers: List[int] = [0, 5, 10, 15, 20, 25, 30, 35],
        vace_in_channels: int = 96,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = out_channels or in_channels
        self.inner_dim = inner_dim
        if 0 not in vace_layers:
            raise ValueError("VACE layers must include layer 0.")

        self.rope = WanRotaryPosEmbed(attention_head_dim, patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=tuple(patch_size),
                                      stride=tuple(patch_size), padding=0)
        self.vace_patch_embedding = Conv3d(vace_in_channels, inner_dim, kernel_size=tuple(patch_size),
                                           stride=tuple(patch_size), padding=0)
        self.condition_embedder = WanTimeTextImageEmbedding(
            dim=inner_dim, time_freq_dim=freq_dim, time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim, image_embed_dim=image_dim,
            pos_embed_seq_len=pos_embed_seq_len,
        )
        self.blocks = ModuleList([
            WanTransformerBlock(inner_dim, ffn_dim, num_attention_heads, qk_norm,
                                cross_attn_norm, eps, added_kv_proj_dim)
            for _ in range(num_layers)
        ])
        self.vace_blocks = ModuleList([
            WanVACETransformerBlock(
                inner_dim, ffn_dim, num_attention_heads, qk_norm, cross_attn_norm, eps,
                added_kv_proj_dim, apply_input_projection=(i == 0), apply_output_projection=True,
            )
            for i in range(len(vace_layers))
        ])
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels * math.prod(patch_size))

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 7)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        )
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_image: Optional[jax.Array] = None,
        control_hidden_states: Optional[jax.Array] = None,
        control_hidden_states_scale: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        b, c, f, h, w = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        ppf, pph, ppw = f // p_t, h // p_h, w // p_w
        n_vace = len(self.config.vace_layers)

        if control_hidden_states_scale is None:
            control_hidden_states_scale = jnp.ones((n_vace,), dtype=hidden_states.dtype)

        rotary_emb = self.rope(f, h, w)

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)
        x = x.reshape(b, ppf * pph * ppw, -1)

        ctrl = jnp.transpose(control_hidden_states, (0, 2, 3, 4, 1))
        ctrl = self.vace_patch_embedding(params["vace_patch_embedding"], ctrl)
        ctrl = ctrl.reshape(b, -1, ctrl.shape[-1])
        if ctrl.shape[1] < x.shape[1]:
            pad = jnp.zeros((b, x.shape[1] - ctrl.shape[1], ctrl.shape[-1]), dtype=ctrl.dtype)
            ctrl = jnp.concatenate([ctrl, pad], axis=1)

        temb, timestep_proj, encoder_hidden_states, encoder_hidden_states_image = self.condition_embedder(
            params["condition_embedder"], timestep, encoder_hidden_states, encoder_hidden_states_image
        )
        timestep_proj = timestep_proj.reshape(b, 6, -1)
        if encoder_hidden_states_image is not None:
            encoder_hidden_states = jnp.concatenate(
                [encoder_hidden_states_image, encoder_hidden_states], axis=1
            )

        hints = []
        for vi, block in enumerate(self.vace_blocks):
            conditioning, ctrl = block(
                params["vace_blocks"][vi], x, encoder_hidden_states, ctrl, timestep_proj, rotary_emb
            )
            hints.append((conditioning, control_hidden_states_scale[vi]))

        hint_idx = 0
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][i], x, encoder_hidden_states, timestep_proj, rotary_emb)
            if i in self.config.vace_layers:
                hint, scale = hints[hint_idx]
                x = x + hint * scale.astype(x.dtype)
                hint_idx += 1

        shift, scale = [
            m.squeeze(1)
            for m in jnp.split(
                params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, None], 2, axis=1
            )
        ]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale[:, None]) + shift[:, None]).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)

        x = x.reshape(b, ppf, pph, ppw, p_t, p_h, p_w, self.out_channels)
        x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
        output = x.reshape(b, self.out_channels, ppf * p_t, pph * p_h, ppw * p_w)
        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)

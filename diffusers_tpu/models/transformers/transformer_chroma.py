"""ChromaTransformer2DModel — lodestones' Chroma, a pruned-modulation Flux.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_chroma.py`
(pruned AdaLN norms `:39,:79,:108`, combined timestep projection `:152`,
ChromaApproximator `:184`, single/dual blocks `:204,:276`, model `:370`).

Chroma replaces Flux's per-block modulation linears with ONE small MLP
("distilled_guidance_layer") that emits every block's modulation vectors from
the timestep; blocks index a [B, mod_len, D] table. Reuses our Flux attention
and feed-forward (TPU packed-token design).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import FluxPosEmbed, PixArtAlphaTextProjection, Timesteps, get_timestep_embedding
from ..modeling_utils import ModelMixin
from .transformer_flux import FluxAttention


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _ln(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ChromaApproximator(Module):
    def __init__(self, in_dim: int, out_dim: int, hidden_dim: int, n_layers: int = 5):
        super().__init__()
        self.in_proj = Linear(in_dim, hidden_dim, use_bias=True)
        self.layers = ModuleList(
            [PixArtAlphaTextProjection(hidden_dim, hidden_dim, act_fn="silu") for _ in range(n_layers)]
        )
        self.norms = ModuleList([RMSNorm(hidden_dim) for _ in range(n_layers)])
        self.out_proj = Linear(hidden_dim, out_dim)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.in_proj(params["in_proj"], x)
        for i in range(len(self.layers)):
            x = x + self.layers[i](params["layers"][i], self.norms[i](params["norms"][i], x))
        return self.out_proj(params["out_proj"], x)


class ChromaSingleTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.mlp_hidden_dim = int(dim * mlp_ratio)
        self.proj_mlp = Linear(dim, self.mlp_hidden_dim)
        self.proj_out = Linear(dim + self.mlp_hidden_dim, dim)
        self.attn = FluxAttention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
            out_dim=dim, bias=True, eps=1e-6, pre_only=True,
        )

    def __call__(self, params: Params, hidden_states, temb, image_rotary_emb=None, attention_mask=None):
        # temb: [B, 3, D] from the approximator → shift/scale/gate
        mods = temb.reshape(temb.shape[0], -1).astype(jnp.float32)
        shift_msa, scale_msa, gate = jnp.split(mods, 3, axis=1)
        residual = hidden_states
        norm_h = (_ln(hidden_states).astype(jnp.float32) * (1 + scale_msa[:, None]) + shift_msa[:, None]).astype(hidden_states.dtype)
        mlp_h = jax.nn.gelu(self.proj_mlp(params["proj_mlp"], norm_h), approximate=True)
        bias = None
        if attention_mask is not None:
            # the reference builds a FLOAT {0,1} pair mask which torch SDPA
            # treats as an ADDITIVE bias (+1 on valid-valid logits), not a
            # hard mask — replicate exactly (pipeline_chroma.py:251 dtype cast)
            bias = (attention_mask[:, None, None, :] * attention_mask[:, None, :, None]).astype(jnp.float32)
        attn_out = self.attn(params["attn"], norm_h, image_rotary_emb=image_rotary_emb, attention_mask=bias)
        h = jnp.concatenate([attn_out, mlp_h], axis=2)
        h = gate[:, None].astype(h.dtype) * self.proj_out(params["proj_out"], h)
        return residual + h


class ChromaTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, eps: float = 1e-6):
        super().__init__()
        self.attn = FluxAttention(
            query_dim=dim, added_kv_proj_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
            out_dim=dim, context_pre_only=False, bias=True, eps=eps,
        )
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")
        self.ff_context = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None, attention_mask=None):
        # temb: [B, 12, D] — first 6 image modulations, last 6 text
        temb_img = temb[:, :6].reshape(temb.shape[0], -1).astype(jnp.float32)
        temb_txt = temb[:, 6:].reshape(temb.shape[0], -1).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(temb_img, 6, axis=1)
        c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = jnp.split(temb_txt, 6, axis=1)

        norm_h = (_ln(hidden_states).astype(jnp.float32) * (1 + scale_msa[:, None]) + shift_msa[:, None]).astype(hidden_states.dtype)
        norm_c = (_ln(encoder_hidden_states).astype(jnp.float32) * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]).astype(encoder_hidden_states.dtype)

        bias = None
        if attention_mask is not None:
            bias = (attention_mask[:, None, None, :] * attention_mask[:, None, :, None]).astype(jnp.float32)
        attn_out, ctx_attn_out = self.attn(
            params["attn"], norm_h, encoder_hidden_states=norm_c,
            image_rotary_emb=image_rotary_emb, attention_mask=bias,
        )

        hidden_states = hidden_states + gate_msa[:, None].astype(attn_out.dtype) * attn_out
        norm_h = (_ln(hidden_states).astype(jnp.float32) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]).astype(hidden_states.dtype)
        hidden_states = hidden_states + gate_mlp[:, None].astype(hidden_states.dtype) * self.ff(params["ff"], norm_h)

        encoder_hidden_states = encoder_hidden_states + c_gate_msa[:, None].astype(ctx_attn_out.dtype) * ctx_attn_out
        norm_c = (_ln(encoder_hidden_states).astype(jnp.float32) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]).astype(encoder_hidden_states.dtype)
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None].astype(encoder_hidden_states.dtype) * self.ff_context(
            params["ff_context"], norm_c
        )
        return encoder_hidden_states, hidden_states


class ChromaTransformer2DModel(Module, ModelMixin, ConfigMixin):
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
        axes_dims_rope: Tuple[int, ...] = (16, 56, 56),
        approximator_num_channels: int = 64,
        approximator_hidden_dim: int = 5120,
        approximator_layers: int = 5,
    ):
        super().__init__()
        self.out_channels_ = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.mod_len = 3 * num_single_layers + 2 * 6 * num_layers + 2

        self.pos_embed = FluxPosEmbed(theta=10000, axes_dim=axes_dims_rope)
        self.time_proj = Timesteps(approximator_num_channels // 4, flip_sin_to_cos=True, downscale_freq_shift=0)
        # mod_proj buffer: per-mod-index sinusoidal table (reference `:159`)
        self._mod_proj_table = np.asarray(get_timestep_embedding(
            jnp.arange(self.mod_len) * 1000, 2 * (approximator_num_channels // 4),
            flip_sin_to_cos=True, downscale_freq_shift=0,
        ))  # [mod_len, num_channels/2]

        self.distilled_guidance_layer = ChromaApproximator(
            in_dim=approximator_num_channels,
            out_dim=self.inner_dim,
            hidden_dim=approximator_hidden_dim,
            n_layers=approximator_layers,
        )
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim)
        self.x_embedder = Linear(in_channels, self.inner_dim)
        self.transformer_blocks = ModuleList(
            [
                ChromaTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_layers)
            ]
        )
        self.single_transformer_blocks = ModuleList(
            [
                ChromaSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_single_layers)
            ]
        )
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels_, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, image_seq, in_channels]
        encoder_hidden_states: jax.Array,  # [B, text_seq, joint_attention_dim]
        timestep: jax.Array,  # [B] in [0, 1]
        img_ids: jax.Array,
        txt_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,  # [B, text_seq]
        controlnet_block_samples=None,
        controlnet_single_block_samples=None,
        return_dict: bool = True,
    ):
        b = hidden_states.shape[0]
        h = self.x_embedder(params["x_embedder"], hidden_states)
        timestep = timestep.astype(h.dtype) * 1000

        # approximator input: [B, mod_len, num_channels]
        t_proj = self.time_proj({}, timestep).astype(h.dtype)  # [B, C/4*2]
        g_proj = self.time_proj({}, jnp.zeros((b,), timestep.dtype)).astype(h.dtype)
        tg = jnp.concatenate([t_proj, g_proj], axis=1)[:, None, :]  # [B, 1, C/2]
        mod = jnp.asarray(self._mod_proj_table, dtype=h.dtype)[None]  # [1, mod_len, C/2]
        input_vec = jnp.concatenate(
            [jnp.broadcast_to(tg, (b, self.mod_len, tg.shape[-1])),
             jnp.broadcast_to(mod, (b, self.mod_len, mod.shape[-1]))],
            axis=-1,
        )
        pooled_temb = self.distilled_guidance_layer(params["distilled_guidance_layer"], input_vec)

        ctx = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        image_rotary_emb = self.pos_embed({}, ids)

        joint_mask = None
        if attention_mask is not None:
            joint_mask = jnp.concatenate(
                [attention_mask.astype(jnp.float32), jnp.ones((b, h.shape[1]), jnp.float32)], axis=1
            )

        num_single = len(self.single_transformer_blocks)
        num_dual = len(self.transformer_blocks)
        img_offset = 3 * num_single
        txt_offset = img_offset + 6 * num_dual

        for i, block in enumerate(self.transformer_blocks):
            img_mod = img_offset + 6 * i
            txt_mod = txt_offset + 6 * i
            temb = jnp.concatenate(
                [pooled_temb[:, img_mod : img_mod + 6], pooled_temb[:, txt_mod : txt_mod + 6]], axis=1
            )
            ctx, h = block(
                params["transformer_blocks"][i], h, ctx, temb,
                image_rotary_emb=image_rotary_emb, attention_mask=joint_mask,
            )
            if controlnet_block_samples is not None:
                interval = int(np.ceil(num_dual / len(controlnet_block_samples)))
                h = h + controlnet_block_samples[i // interval]

        txt_len = ctx.shape[1]
        h = jnp.concatenate([ctx, h], axis=1)
        for i, block in enumerate(self.single_transformer_blocks):
            temb = pooled_temb[:, 3 * i : 3 * i + 3]
            h = block(
                params["single_transformer_blocks"][i], h, temb,
                image_rotary_emb=image_rotary_emb, attention_mask=joint_mask,
            )
            if controlnet_single_block_samples is not None:
                interval = int(np.ceil(num_single / len(controlnet_single_block_samples)))
                h = h.at[:, txt_len:].add(controlnet_single_block_samples[i // interval])
        h = h[:, txt_len:]

        # norm_out: pruned continuous — last two modulation slots are shift/scale
        temb = pooled_temb[:, -2:].reshape(b, -1).astype(jnp.float32)
        shift, scale = jnp.split(temb, 2, axis=1)
        h = (_ln(h).astype(jnp.float32) * (1 + scale[:, None]) + shift[:, None]).astype(hidden_states.dtype)
        output = self.proj_out(params["proj_out"], h)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

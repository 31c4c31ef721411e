"""WanTransformer3DModel — Wan 2.x video DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_wan.py:507`;
WanTransformerBlock `:420`, WanAttention `:175`, WanAttnProcessor `:68`,
3D RoPE `:354`; the `_cp_plan` at `:552` maps to sequence sharding of the
token axis under GSPMD). AdaLN modulation and residual adds run in float32
(the reference's FP32LayerNorm + .float() discipline).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection, TimestepEmbedding, Timesteps, apply_rotary_emb, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin


@dataclass
class Transformer3DModelOutput(BaseOutput):
    sample: jax.Array


class WanAttention(Module):
    """qk-RMSNorm across heads; optional image-context added kv."""

    def __init__(
        self,
        dim: int,
        heads: int = 8,
        dim_head: int = 64,
        eps: float = 1e-5,
        added_kv_proj_dim: Optional[int] = None,
        cross_attention_dim_head: Optional[int] = None,
    ):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = dim_head * heads
        self.kv_inner_dim = self.inner_dim if cross_attention_dim_head is None else cross_attention_dim_head * heads
        self.added_kv_proj_dim = added_kv_proj_dim

        self.to_q = Linear(dim, self.inner_dim, use_bias=True)
        self.to_k = Linear(dim, self.kv_inner_dim, use_bias=True)
        self.to_v = Linear(dim, self.kv_inner_dim, use_bias=True)
        self.to_out = ModuleList([Linear(self.inner_dim, dim, use_bias=True)])
        self.norm_q = RMSNorm(self.inner_dim, eps=eps)
        self.norm_k = RMSNorm(self.kv_inner_dim, eps=eps)
        if added_kv_proj_dim is not None:
            self.add_k_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=True)
            self.add_v_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=True)
            self.norm_added_k = RMSNorm(self.inner_dim, eps=eps)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b = hidden_states.shape[0]
        encoder_img = None
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        if self.added_kv_proj_dim is not None and encoder_hidden_states is not None:
            image_context_length = encoder_hidden_states.shape[1] - 512
            encoder_img = encoder_hidden_states[:, :image_context_length]
            context = encoder_hidden_states[:, image_context_length:]

        q = self.norm_q(params["norm_q"], self.to_q(params["to_q"], hidden_states))
        k = self.norm_k(params["norm_k"], self.to_k(params["to_k"], context))
        v = self.to_v(params["to_v"], context)
        q = q.reshape(b, -1, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)

        if rotary_emb is not None:
            cos, sin = rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)

        out_img = None
        if encoder_img is not None:
            k_img = self.norm_added_k(params["norm_added_k"], self.add_k_proj(params["add_k_proj"], encoder_img))
            v_img = self.add_v_proj(params["add_v_proj"], encoder_img)
            k_img = k_img.reshape(b, -1, self.heads, self.dim_head)
            v_img = v_img.reshape(b, -1, self.heads, self.dim_head)
            out_img = dispatch_attention_fn(q, k_img, v_img)
            out_img = out_img.reshape(b, -1, self.inner_dim)

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)
        if out_img is not None:
            out = out + out_img.astype(out.dtype)
        return self.to_out[0](params["to_out"][0], out)


class WanImageEmbedding(Module):
    def __init__(self, in_features: int, out_features: int, pos_embed_seq_len: Optional[int] = None):
        super().__init__()
        self.norm1 = LayerNorm(in_features)
        self.ff = FeedForward(in_features, out_features, mult=1, activation_fn="gelu")
        self.norm2 = LayerNorm(out_features)
        self.pos_embed_seq_len = pos_embed_seq_len
        self.in_features = in_features

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.pos_embed_seq_len is not None:
            params["pos_embed"] = jnp.zeros((1, self.pos_embed_seq_len, self.in_features), dtype=dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.pos_embed_seq_len is not None:
            b, s, d = x.shape
            x = x.reshape(-1, 2 * s, d) if (2 * s == self.pos_embed_seq_len) else x.reshape(-1, self.pos_embed_seq_len, d)
            x = x + params["pos_embed"].astype(x.dtype)
        h = self.norm1(params["norm1"], x)
        h = self.ff(params["ff"], h)
        return self.norm2(params["norm2"], h)


class WanTimeTextImageEmbedding(Module):
    def __init__(self, dim, time_freq_dim, time_proj_dim, text_embed_dim, image_embed_dim=None, pos_embed_seq_len=None):
        super().__init__()
        self.timesteps_proj = Timesteps(num_channels=time_freq_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(in_channels=time_freq_dim, time_embed_dim=dim)
        self.time_proj = Linear(dim, time_proj_dim)
        self.text_embedder = PixArtAlphaTextProjection(text_embed_dim, dim, act_fn="gelu_tanh")
        self.image_embedder = (
            WanImageEmbedding(image_embed_dim, dim, pos_embed_seq_len=pos_embed_seq_len)
            if image_embed_dim is not None
            else None
        )

    def __call__(self, params: Params, timestep, encoder_hidden_states, encoder_hidden_states_image=None):
        t = self.timesteps_proj({}, timestep).astype(encoder_hidden_states.dtype)
        temb = self.time_embedder(params["time_embedder"], t)
        timestep_proj = self.time_proj(params["time_proj"], jax.nn.silu(temb))
        encoder_hidden_states = self.text_embedder(params["text_embedder"], encoder_hidden_states)
        if encoder_hidden_states_image is not None:
            encoder_hidden_states_image = self.image_embedder(params["image_embedder"], encoder_hidden_states_image)
        return temb, timestep_proj, encoder_hidden_states, encoder_hidden_states_image


class WanRotaryPosEmbed:
    """3D RoPE tables computed host-side in float64 (structure-only; no params)."""

    def __init__(self, attention_head_dim: int, patch_size, max_seq_len: int, theta: float = 10000.0):
        self.patch_size = tuple(patch_size)
        h_dim = w_dim = 2 * (attention_head_dim // 6)
        t_dim = attention_head_dim - h_dim - w_dim
        self.dims = [t_dim, h_dim, w_dim]
        pos = np.arange(max_seq_len)
        self.freqs = [get_1d_rotary_pos_embed_np(d, pos, theta=theta) for d in self.dims]

    def __call__(self, num_frames: int, height: int, width: int):
        p_t, p_h, p_w = self.patch_size
        ppf, pph, ppw = num_frames // p_t, height // p_h, width // p_w
        (cos_t, sin_t), (cos_h, sin_h), (cos_w, sin_w) = self.freqs

        def expand(cos, sin, n, axis):
            shape = [1, 1, 1, cos.shape[-1]]
            shape[axis] = n
            return cos[:n].reshape(shape), sin[:n].reshape(shape)

        cf, sf = expand(cos_t, sin_t, ppf, 0)
        ch, sh = expand(cos_h, sin_h, pph, 1)
        cw, sw = expand(cos_w, sin_w, ppw, 2)
        cos = np.concatenate(
            [
                np.broadcast_to(cf, (ppf, pph, ppw, cf.shape[-1])),
                np.broadcast_to(ch, (ppf, pph, ppw, ch.shape[-1])),
                np.broadcast_to(cw, (ppf, pph, ppw, cw.shape[-1])),
            ],
            axis=-1,
        ).reshape(1, ppf * pph * ppw, 1, -1)
        sin = np.concatenate(
            [
                np.broadcast_to(sf, (ppf, pph, ppw, sf.shape[-1])),
                np.broadcast_to(sh, (ppf, pph, ppw, sh.shape[-1])),
                np.broadcast_to(sw, (ppf, pph, ppw, sw.shape[-1])),
            ],
            axis=-1,
        ).reshape(1, ppf * pph * ppw, 1, -1)
        return jnp.asarray(cos), jnp.asarray(sin)


class WanTransformerBlock(Module):
    def __init__(self, dim, ffn_dim, num_heads, qk_norm="rms_norm_across_heads", cross_attn_norm=False,
                 eps=1e-6, added_kv_proj_dim=None):
        super().__init__()
        self.dim = dim
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

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 6)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 6, self.dim), jnp.float32) / self.dim**0.5
        ).astype(jnp.float32)
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, rotary_emb,
                 attention_mask=None, pab=None):
        if temb.ndim == 3:  # [B, 6, D]
            mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)
            shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = [
                m.squeeze(1)[:, None] for m in jnp.split(mods, 6, axis=1)
            ]
        else:  # [B, 6, N, D] per-token modulation (SkyReels diffusion forcing)
            mods = params["scale_shift_table"].astype(jnp.float32)[:, :, None] + temb.astype(jnp.float32)
            shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = [
                m.squeeze(1) for m in jnp.split(mods, 6, axis=1)
            ]
        dtype = hidden_states.dtype

        norm_h = (self.norm1({}, hidden_states.astype(jnp.float32)) * (1 + scale_msa) + shift_msa).astype(dtype)
        if pab is None:
            attn_out = self.attn1(params["attn1"], norm_h, None, rotary_emb, attention_mask=attention_mask)
        else:
            # PAB: reuse the cached self-attention output on broadcast steps
            # (hooks/pyramid_attention_broadcast.py)
            from ...hooks.pyramid_attention_broadcast import pab_gate

            compute, cached = pab
            attn_out = pab_gate(
                compute, cached,
                lambda: self.attn1(params["attn1"], norm_h, None, rotary_emb,
                                   attention_mask=attention_mask))
        new_pab = attn_out if pab is not None else None
        hidden_states = (hidden_states.astype(jnp.float32) + attn_out.astype(jnp.float32) * gate_msa).astype(dtype)

        if self.cross_attn_norm:
            norm_h = self.norm2(params["norm2"], hidden_states.astype(jnp.float32)).astype(dtype)
        else:
            norm_h = hidden_states
        attn_out = self.attn2(params["attn2"], norm_h, encoder_hidden_states, None)
        hidden_states = hidden_states + attn_out

        norm_h = (self.norm3({}, hidden_states.astype(jnp.float32)) * (1 + c_scale_msa) + c_shift_msa).astype(dtype)
        ff_out = self.ffn(params["ffn"], norm_h)
        hidden_states = (hidden_states.astype(jnp.float32) + ff_out.astype(jnp.float32) * c_gate_msa).astype(dtype)
        if pab is not None:
            return hidden_states, new_pab
        return hidden_states


class WanTransformer3DModel(Module, ModelMixin, ConfigMixin):
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
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels or in_channels

        self.rope = WanRotaryPosEmbed(attention_head_dim, patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=tuple(patch_size), stride=tuple(patch_size), padding=0)
        self.condition_embedder = WanTimeTextImageEmbedding(
            dim=inner_dim,
            time_freq_dim=freq_dim,
            time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim,
            image_embed_dim=image_dim,
            pos_embed_seq_len=pos_embed_seq_len,
        )
        self.blocks = ModuleList(
            [
                WanTransformerBlock(inner_dim, ffn_dim, num_attention_heads, qk_norm, cross_attn_norm, eps, added_kv_proj_dim)
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels * math.prod(patch_size))

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 7)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        ).astype(jnp.float32)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S, text_dim]
        encoder_hidden_states_image: Optional[jax.Array] = None,
        rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        fbc_state=None,
        fbc_config=None,
        pab_compute=None,
        pab_cache=None,
        return_dict: bool = True,
    ) -> Union[Transformer3DModelOutput, tuple]:
        b, c, f, h, w = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        ppf, pph, ppw = f // p_t, h // p_h, w // p_w

        if rotary_emb is None:
            rotary_emb = self.rope(f, h, w)

        # NCDHW -> NDHWC for the 3D conv, then flatten tokens
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)  # [B, ppf, pph, ppw, D]
        x = x.reshape(b, ppf * pph * ppw, -1)

        temb, timestep_proj, encoder_hidden_states, encoder_hidden_states_image = self.condition_embedder(
            params["condition_embedder"], timestep, encoder_hidden_states, encoder_hidden_states_image
        )
        timestep_proj = timestep_proj.reshape(b, 6, -1)

        if encoder_hidden_states_image is not None:
            encoder_hidden_states = jnp.concatenate([encoder_hidden_states_image, encoder_hidden_states], axis=1)

        if fbc_state is not None:
            # first-block cache (hooks/first_block_cache.py; reference
            # hooks/first_block_cache.py:33): skip blocks[1:] when the first
            # block's residual barely moved since the last computed step
            from ...hooks.first_block_cache import fbc_single_gate

            first_in = x
            x = self.blocks[0](params["blocks"][0], x, encoder_hidden_states, timestep_proj, rotary_emb)

            def tail(h):
                for i, block in enumerate(self.blocks):
                    if i == 0:
                        continue
                    h = block(params["blocks"][i], h, encoder_hidden_states, timestep_proj, rotary_emb)
                return h

            x, fbc_state = fbc_single_gate(fbc_state, fbc_config, x - first_in, x, tail)
        elif pab_cache is not None:
            new_pab_cache = {}
            for i, block in enumerate(self.blocks):
                x, new_pab_cache[i] = block(params["blocks"][i], x, encoder_hidden_states,
                                            timestep_proj, rotary_emb,
                                            pab=(pab_compute, pab_cache[i]))
        else:
            for i, block in enumerate(self.blocks):
                x = block(params["blocks"][i], x, encoder_hidden_states, timestep_proj, rotary_emb)

        shift, scale = [
            m.squeeze(1)
            for m in jnp.split(params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, None], 2, axis=1)
        ]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale[:, None]) + shift[:, None]).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)

        # unpatchify: [B, N, C*pt*ph*pw] -> [B, C, F, H, W]
        x = x.reshape(b, ppf, pph, ppw, p_t, p_h, p_w, self.out_channels)
        x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
        output = x.reshape(b, self.out_channels, ppf * p_t, pph * p_h, ppw * p_w)

        if fbc_state is not None:
            if not return_dict:
                return (output, fbc_state)
            return Transformer3DModelOutput(sample=output), fbc_state
        if pab_cache is not None:
            if not return_dict:
                return (output, new_pab_cache)
            return Transformer3DModelOutput(sample=output), new_pab_cache
        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)

    def init_pab_cache(self, batch_size: int, tokens: int, dtype=jnp.float32):
        """Zero per-block self-attention caches for PAB (step 0 always
        computes, so zeros are never consumed)."""
        return {i: jnp.zeros((batch_size, tokens, self.inner_dim), dtype)
                for i in range(len(self.blocks))}

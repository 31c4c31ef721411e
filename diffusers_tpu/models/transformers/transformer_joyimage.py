"""JoyImageEditTransformer3DModel — JoyImage editing MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_joyimage.py:372`):
double-stream blocks with FUSED per-stream QKV projections
(`img_attn_qkv` / `txt_attn_qkv`), joint [img, txt] attention, Wan-style
learnable modulation tables added to a 6-way timestep projection, theta-256
rope (image grid; optional "mrope" text positions continuing past the max
visual index), and a multi-item latent layout where the target frame is
rolled to the front (`:553`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    PixArtAlphaTextProjection,
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
    get_1d_rotary_pos_embed_np,
)
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class JoyImageModulate(Module):
    """Learnable table + conditioning, chunked into `factor` vectors (reference :64)."""

    def __init__(self, hidden_size: int, factor: int):
        super().__init__()
        self.hidden_size = hidden_size
        self.factor = factor

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"modulate_table": jnp.zeros((1, self.factor, self.hidden_size), dtype)}

    def __call__(self, params: Params, x: jax.Array):
        if x.ndim != 3:
            x = x[:, None]
        mods = params["modulate_table"].astype(x.dtype) + x
        return [m[:, 0] for m in jnp.split(mods, self.factor, axis=1)]


class JoyImageAttention(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 eps: float = 1e-6):
        super().__init__()
        self.heads = num_attention_heads
        self.head_dim = attention_head_dim
        inner = num_attention_heads * attention_head_dim
        self.img_attn_qkv = Linear(dim, inner * 3, use_bias=True)
        self.img_attn_q_norm = RMSNorm(attention_head_dim, eps=eps)
        self.img_attn_k_norm = RMSNorm(attention_head_dim, eps=eps)
        self.img_attn_proj = Linear(inner, dim, use_bias=True)
        self.txt_attn_qkv = Linear(dim, inner * 3, use_bias=True)
        self.txt_attn_q_norm = RMSNorm(attention_head_dim, eps=eps)
        self.txt_attn_k_norm = RMSNorm(attention_head_dim, eps=eps)
        self.txt_attn_proj = Linear(inner, dim, use_bias=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 image_rotary_emb=None):
        b, s_img = hidden_states.shape[:2]
        iq, ik, iv = jnp.split(self.img_attn_qkv(params["img_attn_qkv"], hidden_states), 3,
                               axis=-1)
        tq, tk, tv = jnp.split(self.txt_attn_qkv(params["txt_attn_qkv"],
                                                 encoder_hidden_states), 3, axis=-1)

        def heads(x):
            return x.reshape(b, -1, self.heads, self.head_dim)

        iq, ik, iv = heads(iq), heads(ik), heads(iv)
        tq, tk, tv = heads(tq), heads(tk), heads(tv)
        iq = self.img_attn_q_norm(params["img_attn_q_norm"], iq)
        ik = self.img_attn_k_norm(params["img_attn_k_norm"], ik)
        tq = self.txt_attn_q_norm(params["txt_attn_q_norm"], tq)
        tk = self.txt_attn_k_norm(params["txt_attn_k_norm"], tk)

        if image_rotary_emb is not None:
            vis_freqs, txt_freqs = image_rotary_emb
            if vis_freqs is not None:
                iq = apply_rotary_emb(iq, *vis_freqs)
                ik = apply_rotary_emb(ik, *vis_freqs)
            if txt_freqs is not None:
                tq = apply_rotary_emb(tq, *txt_freqs)
                tk = apply_rotary_emb(tk, *txt_freqs)

        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        out = dispatch_attention_fn(q, k, v)
        out = out.reshape(b, -1, self.heads * self.head_dim).astype(q.dtype)
        img_out = self.img_attn_proj(params["img_attn_proj"], out[:, :s_img])
        txt_out = self.txt_attn_proj(params["txt_attn_proj"], out[:, s_img:])
        return img_out, txt_out


class JoyImageTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 mlp_width_ratio: float = 4.0, eps: float = 1e-6):
        super().__init__()
        mlp_hidden = int(dim * mlp_width_ratio)
        self.img_mod = JoyImageModulate(dim, factor=6)
        self.img_norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.img_norm2 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.img_mlp = FeedForward(dim, inner_dim=mlp_hidden, activation_fn="gelu-approximate")
        self.txt_mod = JoyImageModulate(dim, factor=6)
        self.txt_norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.txt_norm2 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.txt_mlp = FeedForward(dim, inner_dim=mlp_hidden, activation_fn="gelu-approximate")
        self.attn = JoyImageAttention(dim, num_attention_heads, attention_head_dim, eps=eps)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None):
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = self.img_mod(params["img_mod"], temb)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = self.txt_mod(params["txt_mod"], temb)

        img_mod = (self.img_norm1({}, hidden_states.astype(jnp.float32)).astype(hidden_states.dtype)
                   * (1 + i_sc1[:, None]) + i_sh1[:, None])
        txt_mod = (self.txt_norm1({}, encoder_hidden_states.astype(jnp.float32))
                   .astype(encoder_hidden_states.dtype) * (1 + t_sc1[:, None]) + t_sh1[:, None])
        img_attn, txt_attn = self.attn(params["attn"], img_mod, txt_mod, image_rotary_emb)
        hidden_states = hidden_states + img_attn * i_g1[:, None]
        encoder_hidden_states = encoder_hidden_states + txt_attn * t_g1[:, None]

        img_ff_in = (self.img_norm2({}, hidden_states.astype(jnp.float32))
                     .astype(hidden_states.dtype) * (1 + i_sc2[:, None]) + i_sh2[:, None])
        txt_ff_in = (self.txt_norm2({}, encoder_hidden_states.astype(jnp.float32))
                     .astype(encoder_hidden_states.dtype) * (1 + t_sc2[:, None]) + t_sh2[:, None])
        hidden_states = hidden_states + self.img_mlp(params["img_mlp"], img_ff_in) * i_g2[:, None]
        encoder_hidden_states = encoder_hidden_states + self.txt_mlp(
            params["txt_mlp"], txt_ff_in) * t_g2[:, None]
        return hidden_states, encoder_hidden_states


class JoyImageTimeTextImageEmbedding(Module):
    def __init__(self, dim: int, time_freq_dim: int, time_proj_dim: int, text_embed_dim: int):
        super().__init__()
        self.timesteps_proj = Timesteps(num_channels=time_freq_dim, flip_sin_to_cos=True,
                                        downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(time_freq_dim, dim)
        self.time_proj = Linear(dim, time_proj_dim)
        self.text_embedder = PixArtAlphaTextProjection(text_embed_dim, dim, act_fn="gelu_tanh")

    def __call__(self, params: Params, timestep, encoder_hidden_states):
        dtype = encoder_hidden_states.dtype
        temb = self.time_embedder(params["time_embedder"],
                                  self.timesteps_proj({}, timestep).astype(dtype))
        timestep_proj = self.time_proj(params["time_proj"], jax.nn.silu(temb))
        ehs = self.text_embedder(params["text_embedder"], encoder_hidden_states)
        return temb, timestep_proj, ehs


class JoyImageEditTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """JoyImage editing DiT (reference :372)."""

    @register_to_config
    def __init__(
        self,
        patch_size: List[int] = [1, 2, 2],
        in_channels: int = 16,
        out_channels: Optional[int] = None,
        hidden_size: int = 3072,
        num_attention_heads: int = 24,
        text_dim: int = 4096,
        mlp_width_ratio: float = 4.0,
        num_layers: int = 20,
        rope_dim_list: List[int] = [16, 56, 56],
        rope_type: str = "rope",
        theta: int = 256,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        head_dim = hidden_size // num_attention_heads
        self.img_in = Conv3d(in_channels, hidden_size, kernel_size=tuple(patch_size),
                             stride=tuple(patch_size))
        self.condition_embedder = JoyImageTimeTextImageEmbedding(
            dim=hidden_size, time_freq_dim=256, time_proj_dim=hidden_size * 6,
            text_embed_dim=text_dim)
        self.double_blocks = ModuleList([
            JoyImageTransformerBlock(hidden_size, num_attention_heads, head_dim,
                                     mlp_width_ratio=mlp_width_ratio)
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(hidden_size, self.out_channels * math.prod(patch_size))

    def get_rotary_pos_embed(self, vis_rope_size, txt_rope_size: Optional[int] = None):
        """theta-256 3-axis rope; text positions continue past the max visual
        index (mrope, reference :456)."""
        vis_rope_size = [1] * (3 - len(vis_rope_size)) + list(vis_rope_size)
        rope_dim_list = self.config.rope_dim_list
        grids = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in vis_rope_size],
                            indexing="ij")
        vis_cos, vis_sin = [], []
        for i, dim in enumerate(rope_dim_list):
            cos, sin = get_1d_rotary_pos_embed_np(dim, grids[i].reshape(-1),
                                                  theta=float(self.config.theta))
            vis_cos.append(cos)
            vis_sin.append(sin)
        vis = (jnp.asarray(np.concatenate(vis_cos, axis=1), jnp.float32),
               jnp.asarray(np.concatenate(vis_sin, axis=1), jnp.float32))
        if txt_rope_size is None:
            return vis, None
        start = max(s - 1 for s in vis_rope_size) + 1
        pos = np.arange(txt_rope_size, dtype=np.float64) + start
        txt_cos, txt_sin = [], []
        for dim in rope_dim_list:
            cos, sin = get_1d_rotary_pos_embed_np(dim, pos, theta=float(self.config.theta))
            txt_cos.append(cos)
            txt_sin.append(sin)
        txt = (jnp.asarray(np.concatenate(txt_cos, axis=1), jnp.float32),
               jnp.asarray(np.concatenate(txt_sin, axis=1), jnp.float32))
        return vis, txt

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, T, H, W] or [B, N, C, T, H, W]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        return_dict: bool = True,
    ):
        is_multi_item = hidden_states.ndim == 6
        num_items = 0
        if is_multi_item:
            num_items = hidden_states.shape[1]
            if num_items > 1:
                # target frame (last item) rolled to the FRONT (reference :556)
                hidden_states = jnp.concatenate(
                    [hidden_states[:, -1:], hidden_states[:, :-1]], axis=1)
            b, n, c, t, h, w = hidden_states.shape
            hidden_states = jnp.transpose(hidden_states, (0, 2, 1, 3, 4, 5)).reshape(
                b, c, n * t, h, w)

        batch_size, _, ot, oh, ow = hidden_states.shape
        pt, ph, pw = self.config.patch_size
        tt, th, tw = ot // pt, oh // ph, ow // pw

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))  # NDHWC
        x = self.img_in(params["img_in"], x).reshape(batch_size, -1, self.config.hidden_size)

        _, vec, txt = self.condition_embedder(params["condition_embedder"], timestep,
                                              encoder_hidden_states)
        if vec.shape[-1] > self.config.hidden_size:
            vec = vec.reshape(vec.shape[0], 6, -1)

        vis_freqs, txt_freqs = self.get_rotary_pos_embed(
            [tt, th, tw],
            txt.shape[1] if self.config.rope_type == "mrope" else None)

        for i, block in enumerate(self.double_blocks):
            x, txt = block(params["double_blocks"][i], x, txt, vec, (vis_freqs, txt_freqs))

        x = self.norm_out({}, x.astype(jnp.float32)).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)

        c = self.out_channels
        x = x.reshape(batch_size, tt, th, tw, pt, ph, pw, c)
        x = jnp.transpose(x, (0, 7, 1, 4, 2, 5, 3, 6)).reshape(
            batch_size, c, tt * pt, th * ph, tw * pw)

        if is_multi_item:
            x = x.reshape(batch_size, c, num_items, -1, oh, ow)
            x = jnp.transpose(x, (0, 2, 1, 3, 4, 5))
            if num_items > 1:
                x = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)

        if not return_dict:
            return (x,)
        return Transformer2DModelOutput(sample=x)

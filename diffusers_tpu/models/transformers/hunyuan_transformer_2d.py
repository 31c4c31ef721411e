"""HunyuanDiT2DModel — Tencent's Hunyuan-DiT image transformer.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/hunyuan_transformer_2d.py`
(AdaLayerNormShift `:35`, HunyuanDiTBlock `:57`, model `:201`, forward `:357`),
the attention processor at `models/attention_processor.py:3120` (per-head
layer-norm qk, RoPE on q always / k only in self-attn), and the combined
conditioning embedding at `models/embeddings.py:1661,1701` (CLIP-style
attention pool, size + style extras).

TPU design: U-ViT long-skip stack (first half pushes, second half pops with
skip_norm/skip_linear) runs as a plain unrolled loop over [B, N, D] tokens;
FP32 layer norms keep the reference's mixed-precision discipline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    PatchEmbed,
    PixArtAlphaTextProjection,
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
)
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _fp32_ln(x, scale=None, bias=None, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class AdaLayerNormShift(Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.linear = Linear(dim, dim)
        self.norm = LayerNorm(dim, eps=eps)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array) -> jax.Array:
        shift = self.linear(params["linear"], jax.nn.silu(emb.astype(jnp.float32)).astype(emb.dtype))
        normed = _fp32_ln(x, params["norm"]["scale"], params["norm"]["bias"], self.eps)
        return normed + shift[:, None]


class _HunyuanAttention(Module):
    """qk per-head LayerNorm; RoPE on q always, on k only when self-attn."""

    # PAG: trace-time identity-attention flag (reference
    # PAGIdentitySelfAttnProcessor — output = to_out(to_v(x))).
    pag_identity: bool = False

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 cross_attention_dim: Optional[int] = None):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.is_cross = cross_attention_dim is not None
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        inner = heads * dim_head
        self.to_q = Linear(query_dim, inner, use_bias=True)
        self.to_k = Linear(kv_dim, inner, use_bias=True)
        self.to_v = Linear(kv_dim, inner, use_bias=True)
        self.norm_q = LayerNorm(dim_head, eps=1e-6)
        self.norm_k = LayerNorm(dim_head, eps=1e-6)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=True)])

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None, image_rotary_emb=None):
        b, s, _ = hidden_states.shape
        if self.pag_identity and encoder_hidden_states is None:
            out = self.to_v(params["to_v"], hidden_states)
            return self.to_out[0](params["to_out"][0], out)
        ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        q = self.to_q(params["to_q"], hidden_states).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], ctx).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], ctx).reshape(b, -1, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            if not self.is_cross:
                k = apply_rotary_emb(k, cos, sin)
        out = dispatch_attention_fn(q, k, v)
        out = out.reshape(b, s, self.heads * self.dim_head).astype(hidden_states.dtype)
        return self.to_out[0](params["to_out"][0], out)


class HunyuanDiTBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, cross_attention_dim: int = 1024,
                 activation_fn: str = "geglu", norm_eps: float = 1e-6,
                 ff_inner_dim: Optional[int] = None, skip: bool = False):
        super().__init__()
        self.norm_eps = norm_eps
        self.norm1 = AdaLayerNormShift(dim, eps=norm_eps)
        self.attn1 = _HunyuanAttention(dim, num_attention_heads, dim // num_attention_heads)
        self.norm2 = LayerNorm(dim, eps=norm_eps)
        self.attn2 = _HunyuanAttention(dim, num_attention_heads, dim // num_attention_heads,
                                       cross_attention_dim=cross_attention_dim)
        self.norm3 = LayerNorm(dim, eps=norm_eps)
        self.ff = FeedForward(dim, activation_fn=activation_fn, inner_dim=ff_inner_dim)
        self.has_skip = skip
        if skip:
            self.skip_norm = LayerNorm(2 * dim, eps=norm_eps)
            self.skip_linear = Linear(2 * dim, dim)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None, temb=None,
                 image_rotary_emb=None, skip=None):
        if self.has_skip:
            cat = jnp.concatenate([hidden_states, skip], axis=-1)
            cat = _fp32_ln(cat, params["skip_norm"]["scale"], params["skip_norm"]["bias"], self.norm_eps)
            hidden_states = self.skip_linear(params["skip_linear"], cat)

        norm_h = self.norm1(params["norm1"], hidden_states, temb)
        hidden_states = hidden_states + self.attn1(params["attn1"], norm_h, image_rotary_emb=image_rotary_emb)

        norm_h = _fp32_ln(hidden_states, params["norm2"]["scale"], params["norm2"]["bias"], self.norm_eps)
        hidden_states = hidden_states + self.attn2(
            params["attn2"], norm_h, encoder_hidden_states=encoder_hidden_states,
            image_rotary_emb=image_rotary_emb,
        )

        norm_h = _fp32_ln(hidden_states, params["norm3"]["scale"], params["norm3"]["bias"], self.norm_eps)
        return hidden_states + self.ff(params["ff"], norm_h)


class HunyuanDiTAttentionPool(Module):
    """CLIP-style attention pool: mean token queries the sequence
    (reference embeddings.py:1661)."""

    def __init__(self, spacial_dim: int, embed_dim: int, num_heads: int, output_dim: Optional[int] = None):
        super().__init__()
        self.spacial_dim = spacial_dim
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.k_proj = Linear(embed_dim, embed_dim)
        self.q_proj = Linear(embed_dim, embed_dim)
        self.v_proj = Linear(embed_dim, embed_dim)
        self.c_proj = Linear(embed_dim, output_dim or embed_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["positional_embedding"] = (
            jax.random.normal(key, (self.spacial_dim + 1, self.embed_dim)) / self.embed_dim**0.5
        ).astype(dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, length, d = x.shape
        h = self.num_heads
        hd = d // h
        xc = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)  # [B, L+1, D]
        xc = xc + params["positional_embedding"][None].astype(xc.dtype)
        q = self.q_proj(params["q_proj"], xc[:, :1]).reshape(b, 1, h, hd)
        k = self.k_proj(params["k_proj"], xc).reshape(b, length + 1, h, hd)
        v = self.v_proj(params["v_proj"], xc).reshape(b, length + 1, h, hd)
        out = dispatch_attention_fn(q, k, v).reshape(b, d)
        return self.c_proj(params["c_proj"], out)


class HunyuanCombinedTimestepTextSizeStyleEmbedding(Module):
    def __init__(self, embedding_dim: int, pooled_projection_dim: int = 1024,
                 seq_len: int = 256, cross_attention_dim: int = 2048,
                 use_style_cond_and_image_meta_size: bool = True):
        super().__init__()
        self.use_extra = use_style_cond_and_image_meta_size
        self.time_proj = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)
        self.size_proj = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.pooler = HunyuanDiTAttentionPool(seq_len, cross_attention_dim, num_heads=8,
                                              output_dim=pooled_projection_dim)
        if use_style_cond_and_image_meta_size:
            self.style_embedder = Embedding(1, embedding_dim)
            extra_in_dim = 256 * 6 + embedding_dim + pooled_projection_dim
        else:
            extra_in_dim = pooled_projection_dim
        self.extra_embedder = PixArtAlphaTextProjection(
            in_features=extra_in_dim, hidden_size=embedding_dim * 4,
            out_features=embedding_dim, act_fn="silu_fp32",
        )

    def __call__(self, params: Params, timestep, encoder_hidden_states, image_meta_size, style, dtype):
        t_proj = self.time_proj({}, timestep).astype(dtype)
        t_emb = self.timestep_embedder(params["timestep_embedder"], t_proj)
        pooled = self.pooler(params["pooler"], encoder_hidden_states)
        if self.use_extra:
            size = self.size_proj({}, image_meta_size.reshape(-1)).astype(dtype)
            size = size.reshape(-1, 6 * 256)
            style_emb = self.style_embedder(params["style_embedder"], style)
            extra = jnp.concatenate([pooled, size, style_emb], axis=1)
        else:
            extra = pooled
        return t_emb + self.extra_embedder(params["extra_embedder"], extra)


class HunyuanDiT2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        patch_size: Optional[int] = None,
        activation_fn: str = "gelu-approximate",
        sample_size: int = 32,
        hidden_size: int = 1152,
        num_layers: int = 28,
        mlp_ratio: float = 4.0,
        learn_sigma: bool = True,
        cross_attention_dim: int = 1024,
        norm_type: str = "layer_norm",
        cross_attention_dim_t5: int = 2048,
        pooled_projection_dim: int = 1024,
        text_len: int = 77,
        text_len_t5: int = 256,
        use_style_cond_and_image_meta_size: bool = True,
    ):
        super().__init__()
        self.out_channels_ = in_channels * 2 if learn_sigma else in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pad_len = text_len + text_len_t5

        self.text_embedder = PixArtAlphaTextProjection(
            in_features=cross_attention_dim_t5,
            hidden_size=cross_attention_dim_t5 * 4,
            out_features=cross_attention_dim,
            act_fn="silu_fp32",
        )
        self.pos_embed = PatchEmbed(
            height=sample_size, width=sample_size, in_channels=in_channels,
            embed_dim=self.inner_dim, patch_size=patch_size, pos_embed_type=None,
        )
        self.time_extra_emb = HunyuanCombinedTimestepTextSizeStyleEmbedding(
            self.inner_dim,
            pooled_projection_dim=pooled_projection_dim,
            seq_len=text_len_t5,
            cross_attention_dim=cross_attention_dim_t5,
            use_style_cond_and_image_meta_size=use_style_cond_and_image_meta_size,
        )
        self.blocks = ModuleList(
            [
                HunyuanDiTBlock(
                    dim=self.inner_dim,
                    num_attention_heads=num_attention_heads,
                    activation_fn=activation_fn,
                    ff_inner_dim=int(self.inner_dim * mlp_ratio),
                    cross_attention_dim=cross_attention_dim,
                    skip=layer > num_layers // 2,
                )
                for layer in range(num_layers)
            ]
        )
        from ..normalization import AdaLayerNormContinuous

        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels_, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["text_embedding_padding"] = jax.random.normal(
            key, (self.pad_len, self.config.cross_attention_dim)
        ).astype(dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # CLIP text [B, 77, D]
        text_embedding_mask: jax.Array,
        encoder_hidden_states_t5: jax.Array,  # [B, 256, D_t5]
        text_embedding_mask_t5: jax.Array,
        image_meta_size: Optional[jax.Array] = None,
        style: Optional[jax.Array] = None,
        image_rotary_emb=None,
        controlnet_block_samples=None,
        return_dict: bool = True,
    ):
        b = hidden_states.shape[0]
        height, width = hidden_states.shape[-2:]
        p = self.config.patch_size

        h = self.pos_embed(params["pos_embed"], hidden_states)
        temb = self.time_extra_emb(
            params["time_extra_emb"], timestep, encoder_hidden_states_t5,
            image_meta_size, style, h.dtype,
        )

        t5_ctx = self.text_embedder(params["text_embedder"], encoder_hidden_states_t5)
        ctx = jnp.concatenate([encoder_hidden_states, t5_ctx], axis=1)
        mask = jnp.concatenate([text_embedding_mask, text_embedding_mask_t5], axis=-1)[..., None].astype(bool)
        ctx = jnp.where(mask, ctx, params["text_embedding_padding"].astype(ctx.dtype)[None])

        skips = []
        num_layers = self.config.num_layers
        for layer, block in enumerate(self.blocks):
            if layer > num_layers // 2:
                skip = skips.pop()
                if controlnet_block_samples is not None:
                    skip = skip + controlnet_block_samples[len(skips)]
                h = block(params["blocks"][layer], h, encoder_hidden_states=ctx, temb=temb,
                          image_rotary_emb=image_rotary_emb, skip=skip)
            else:
                h = block(params["blocks"][layer], h, encoder_hidden_states=ctx, temb=temb,
                          image_rotary_emb=image_rotary_emb)
            if layer < (num_layers // 2 - 1):
                skips.append(h)

        h = self.norm_out(params["norm_out"], h, temb.astype(jnp.float32))
        h = self.proj_out(params["proj_out"], h)

        ph, pw = height // p, width // p
        h = h.reshape(b, ph, pw, p, p, self.out_channels_)
        h = jnp.einsum("nhwpqc->nchpwq", h)
        output = h.reshape(b, self.out_channels_, ph * p, pw * p)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

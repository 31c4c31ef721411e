"""ConsisIDTransformer3DModel — identity-preserving CogVideoX video DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/consisid_transformer_3d.py:351`):
the CogVideoX block stack plus a Local Facial Extractor (Perceiver over 5
ViT feature scales + identity tokens, `:81`) whose output face embedding is
injected every `cross_attn_interval` blocks through zero-free Perceiver
cross-attention residuals scaled by `local_face_scale` (`:183`). Attention
uses the CogVideoX sqrt-sqrt scaling (q·s)(k·s)^T with s = d^-1/4.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ..attention_blocks import _PassThrough
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNorm
from .cogvideox_transformer_3d import (
    CogVideoXBlock,
    CogVideoXPatchEmbed,
    CogVideoXTransformer3DModel,
    Transformer2DModelOutput,
)


def _sqrt_scale_attention(q, k, v, heads: int, dim_head: int):
    """(q·s)(k·s)^T with s = d^-1/4, fp32 softmax (reference :70)."""
    b = q.shape[0]
    q = q.reshape(b, -1, heads, dim_head)
    k = k.reshape(b, -1, heads, dim_head)
    v = v.reshape(b, -1, heads, dim_head)
    scale = 1.0 / math.sqrt(math.sqrt(dim_head))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(b, -1, heads * dim_head)


class PerceiverAttention(Module):
    def __init__(self, dim: int, dim_head: int = 64, heads: int = 8,
                 kv_dim: Optional[int] = None):
        super().__init__()
        self.dim_head = dim_head
        self.heads = heads
        inner = dim_head * heads
        self.norm1 = LayerNorm(dim if kv_dim is None else kv_dim)
        self.norm2 = LayerNorm(dim)
        self.to_q = Linear(dim, inner, use_bias=False)
        self.to_kv = Linear(dim if kv_dim is None else kv_dim, inner * 2, use_bias=False)
        self.to_out = Linear(inner, dim, use_bias=False)

    def __call__(self, params: Params, image_embeds: jax.Array, latents: jax.Array) -> jax.Array:
        image_embeds = self.norm1(params["norm1"], image_embeds)
        latents = self.norm2(params["norm2"], latents)
        q = self.to_q(params["to_q"], latents)
        kv_input = jnp.concatenate([image_embeds, latents], axis=-2)
        k, v = jnp.split(self.to_kv(params["to_kv"], kv_input), 2, axis=-1)
        out = _sqrt_scale_attention(q, k, v, self.heads, self.dim_head)
        return self.to_out(params["to_out"], out)


class LocalFacialExtractor(Module):
    """Perceiver over identity tokens + 5 ViT feature scales (reference :81)."""

    def __init__(self, id_dim=1280, vit_dim=1024, depth=10, dim_head=64, heads=16,
                 num_id_token=5, num_queries=32, output_dim=2048, ff_mult=4, num_scale=5):
        super().__init__()
        assert depth % num_scale == 0
        self.num_id_token = num_id_token
        self.vit_dim = vit_dim
        self.num_queries = num_queries
        self.depth = depth // num_scale
        self.num_scale = num_scale
        self.output_dim = output_dim

        self.layers = ModuleList([
            ModuleList([
                PerceiverAttention(dim=vit_dim, dim_head=dim_head, heads=heads),
                ModuleList([LayerNorm(vit_dim), Linear(vit_dim, vit_dim * ff_mult, use_bias=False),
                            _PassThrough(), Linear(vit_dim * ff_mult, vit_dim, use_bias=False)]),
            ])
            for _ in range(depth)
        ])
        for i in range(num_scale):
            setattr(self, f"mapping_{i}", ModuleList([
                Linear(vit_dim, vit_dim), LayerNorm(vit_dim), _PassThrough(),
                Linear(vit_dim, vit_dim), LayerNorm(vit_dim), _PassThrough(),
                Linear(vit_dim, vit_dim)]))
        self.id_embedding_mapping = ModuleList([
            Linear(id_dim, vit_dim), LayerNorm(vit_dim), _PassThrough(),
            Linear(vit_dim, vit_dim), LayerNorm(vit_dim), _PassThrough(),
            Linear(vit_dim, vit_dim * num_id_token)])

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 43))
        scale = self.vit_dim**-0.5
        params["latents"] = (jax.random.normal(k1, (1, self.num_queries, self.vit_dim),
                                               jnp.float32) * scale).astype(dtype)
        params["proj_out"] = (jax.random.normal(k2, (self.vit_dim, self.output_dim),
                                                jnp.float32) * scale).astype(dtype)
        return params

    def _mlp(self, mods, params, x, leaky=False):
        for i, mod in enumerate(mods):
            if isinstance(mod, _PassThrough):
                x = jax.nn.leaky_relu(x, 0.01) if leaky else jax.nn.gelu(x, approximate=False)
            else:
                x = mod(params[i], x)
        return x

    def __call__(self, params: Params, id_embeds: jax.Array,
                 vit_hidden_states: List[jax.Array]) -> jax.Array:
        b = id_embeds.shape[0]
        latents = jnp.broadcast_to(params["latents"].astype(id_embeds.dtype),
                                   (b, self.num_queries, self.vit_dim))
        id_tokens = self._mlp(self.id_embedding_mapping, params["id_embedding_mapping"],
                              id_embeds, leaky=True)
        id_tokens = id_tokens.reshape(-1, self.num_id_token, self.vit_dim)
        latents = jnp.concatenate([latents, id_tokens], axis=1)

        for i in range(self.num_scale):
            mapping = getattr(self, f"mapping_{i}")
            vit_feature = self._mlp(mapping, params[f"mapping_{i}"], vit_hidden_states[i],
                                    leaky=True)
            ctx = jnp.concatenate([id_tokens, vit_feature], axis=1)
            for j in range(i * self.depth, (i + 1) * self.depth):
                attn, ff = self.layers[j]
                lp = params["layers"][j]
                latents = attn(lp[0], ctx, latents) + latents
                latents = self._mlp(ff, lp[1], latents) + latents

        latents = latents[:, : self.num_queries]
        return latents @ params["proj_out"].astype(latents.dtype)


class PerceiverCrossAttention(Module):
    def __init__(self, dim: int = 3072, dim_head: int = 128, heads: int = 16,
                 kv_dim: int = 2048):
        super().__init__()
        self.dim_head = dim_head
        self.heads = heads
        inner = dim_head * heads
        self.norm1 = LayerNorm(kv_dim if kv_dim is not None else dim)
        self.norm2 = LayerNorm(dim)
        self.to_q = Linear(dim, inner, use_bias=False)
        self.to_kv = Linear(kv_dim if kv_dim is not None else dim, inner * 2, use_bias=False)
        self.to_out = Linear(inner, dim, use_bias=False)

    def __call__(self, params: Params, image_embeds: jax.Array,
                 hidden_states: jax.Array) -> jax.Array:
        image_embeds = self.norm1(params["norm1"], image_embeds)
        hidden_states = self.norm2(params["norm2"], hidden_states)
        q = self.to_q(params["to_q"], hidden_states)
        k, v = jnp.split(self.to_kv(params["to_kv"], image_embeds), 2, axis=-1)
        out = _sqrt_scale_attention(q, k, v, self.heads, self.dim_head)
        return self.to_out(params["to_out"], out)


class ConsisIDTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """ConsisID video DiT (reference :351)."""

    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 30,
        attention_head_dim: int = 64,
        in_channels: int = 16,
        out_channels: Optional[int] = 16,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        time_embed_dim: int = 512,
        text_embed_dim: int = 4096,
        num_layers: int = 30,
        dropout: float = 0.0,
        attention_bias: bool = True,
        sample_width: int = 90,
        sample_height: int = 60,
        sample_frames: int = 49,
        patch_size: int = 2,
        temporal_compression_ratio: int = 4,
        max_text_seq_length: int = 226,
        activation_fn: str = "gelu-approximate",
        timestep_activation_fn: str = "silu",
        norm_elementwise_affine: bool = True,
        norm_eps: float = 1e-5,
        spatial_interpolation_scale: float = 1.875,
        temporal_interpolation_scale: float = 1.0,
        use_rotary_positional_embeddings: bool = False,
        use_learned_positional_embeddings: bool = False,
        is_train_face: bool = False,
        is_kps: bool = False,
        cross_attn_interval: int = 2,
        cross_attn_dim_head: int = 128,
        cross_attn_num_heads: int = 16,
        LFE_id_dim: int = 1280,
        LFE_vit_dim: int = 1024,
        LFE_depth: int = 10,
        LFE_dim_head: int = 64,
        LFE_num_heads: int = 16,
        LFE_num_id_token: int = 5,
        LFE_num_querie: int = 32,
        LFE_output_dim: int = 2048,
        LFE_ff_mult: int = 4,
        LFE_num_scale: int = 5,
        local_face_scale: float = 1.0,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.patch_embed = CogVideoXPatchEmbed(
            in_channels, inner_dim, text_embed_dim, patch_size, None, True)
        self.time_proj = Timesteps(inner_dim, flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(inner_dim, time_embed_dim,
                                                act_fn=timestep_activation_fn)
        self.transformer_blocks = ModuleList([
            CogVideoXBlock(dim=inner_dim, num_attention_heads=num_attention_heads,
                           attention_head_dim=attention_head_dim,
                           time_embed_dim=time_embed_dim, activation_fn=activation_fn,
                           attention_bias=attention_bias,
                           norm_elementwise_affine=norm_elementwise_affine,
                           norm_eps=norm_eps)
            for _ in range(num_layers)
        ])
        self.norm_final = LayerNorm(inner_dim, eps=norm_eps,
                                    use_scale=norm_elementwise_affine,
                                    use_bias=norm_elementwise_affine)
        self.norm_out = AdaLayerNorm(time_embed_dim, output_dim=2 * inner_dim,
                                     norm_eps=norm_eps, chunk_dim=1,
                                     elementwise_affine=norm_elementwise_affine)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * (out_channels or in_channels))

        self.is_train_face = is_train_face
        if is_train_face:
            self.local_facial_extractor = LocalFacialExtractor(
                id_dim=LFE_id_dim, vit_dim=LFE_vit_dim, depth=LFE_depth,
                dim_head=LFE_dim_head, heads=LFE_num_heads, num_id_token=LFE_num_id_token,
                num_queries=LFE_num_querie, output_dim=LFE_output_dim, ff_mult=LFE_ff_mult,
                num_scale=LFE_num_scale)
            self.perceiver_cross_attention = ModuleList([
                PerceiverCrossAttention(dim=inner_dim, dim_head=cross_attn_dim_head,
                                        heads=cross_attn_num_heads,
                                        kv_dim=int(inner_dim / 3 * 2))
                for _ in range(num_layers // cross_attn_interval)
            ])

    _sincos_pos_embedding = CogVideoXTransformer3DModel._sincos_pos_embedding
    rope = CogVideoXTransformer3DModel.rope

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, F, C, H, W]
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        timestep_cond: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        id_cond: Optional[jax.Array] = None,
        id_vit_hidden: Optional[List[jax.Array]] = None,
        return_dict: bool = True,
    ):
        valid_face_emb = None
        if self.is_train_face and id_cond is not None:
            valid_face_emb = self.local_facial_extractor(
                params["local_facial_extractor"], id_cond.astype(hidden_states.dtype),
                [t.astype(hidden_states.dtype) for t in id_vit_hidden])

        b, f, c, h, w = hidden_states.shape
        p = self.config.patch_size
        t_emb = self.time_proj({}, timestep).astype(hidden_states.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)

        text, video = self.patch_embed(params["patch_embed"], encoder_hidden_states,
                                       hidden_states)
        if not self.config.use_rotary_positional_embeddings:
            pos = jnp.asarray(self._sincos_pos_embedding(h, w, f), dtype=video.dtype)
            video = video + pos[None]

        hidden, context = video, text
        ca_idx = 0
        for i, block in enumerate(self.transformer_blocks):
            hidden, context = block(params["transformer_blocks"][i], hidden, context, emb,
                                    image_rotary_emb)
            if self.is_train_face and valid_face_emb is not None \
                    and i % self.config.cross_attn_interval == 0:
                hidden = hidden + self.config.local_face_scale * self.perceiver_cross_attention[
                    ca_idx](params["perceiver_cross_attention"][ca_idx], valid_face_emb, hidden)
                ca_idx += 1

        hidden = self.norm_final(params["norm_final"], hidden)
        hidden = self.norm_out(params["norm_out"], hidden, emb)
        hidden = self.proj_out(params["proj_out"], hidden)

        out_c = self.config.out_channels or self.config.in_channels
        output = hidden.reshape(b, f, h // p, w // p, out_c, p, p)
        output = jnp.transpose(output, (0, 1, 4, 2, 5, 3, 6)).reshape(b, f, out_c, h, w)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

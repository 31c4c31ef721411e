"""IP-Adapter image-projection models.

Functional counterparts of the reference projection heads
(`/root/reference/src/diffusers/models/embeddings.py:1515` ImageProjection,
`:1538` IPAdapterFullImageProjection, `:2254` IPAdapterPlusImageProjection
resampler, `:2574` MultiIPAdapterImageProjection). Parameter subtree names
match the reference diffusers-format state dicts so conversion is mechanical.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..ops.module import LayerNorm, Linear, Module, ModuleList, Params
from .attention import Attention
from .attention_blocks import FeedForward


class ImageProjection(Module):
    """CLIP image embed → `num_image_text_embeds` context tokens."""

    def __init__(self, image_embed_dim: int = 768, cross_attention_dim: int = 768, num_image_text_embeds: int = 32):
        super().__init__()
        self.num_image_text_embeds = num_image_text_embeds
        self.image_embeds = Linear(image_embed_dim, num_image_text_embeds * cross_attention_dim)
        self.norm = LayerNorm(cross_attention_dim)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        b = image_embeds.shape[0]
        x = self.image_embeds(params["image_embeds"], image_embeds)
        x = x.reshape(b, self.num_image_text_embeds, -1)
        return self.norm(params["norm"], x)


class IPAdapterFullImageProjection(Module):
    def __init__(self, image_embed_dim: int = 1024, cross_attention_dim: int = 1024):
        super().__init__()
        self.ff = FeedForward(image_embed_dim, cross_attention_dim, mult=1, activation_fn="gelu")
        self.norm = LayerNorm(cross_attention_dim)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        return self.norm(params["norm"], self.ff(params["ff"], image_embeds))


class IPAdapterFaceIDImageProjection(Module):
    """InsightFace id-embedding → `num_tokens` context tokens (reference
    embeddings.py:1550 IPAdapterFaceIDImageProjection)."""

    def __init__(self, image_embed_dim: int = 1024, cross_attention_dim: int = 1024,
                 mult: int = 1, num_tokens: int = 1):
        super().__init__()
        self.num_tokens = num_tokens
        self.cross_attention_dim = cross_attention_dim
        self.ff = FeedForward(image_embed_dim, cross_attention_dim * num_tokens, mult=mult,
                              activation_fn="gelu")
        self.norm = LayerNorm(cross_attention_dim)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        x = self.ff(params["ff"], image_embeds)
        x = x.reshape(-1, self.num_tokens, self.cross_attention_dim)
        return self.norm(params["norm"], x)


class IPAdapterPlusImageProjectionBlock(Module):
    """One resampler block: latents cross-attend to [image tokens ; latents]."""

    def __init__(self, embed_dims: int = 768, dim_head: int = 64, heads: int = 16, ffn_ratio: float = 4):
        super().__init__()
        self.ln0 = LayerNorm(embed_dims)
        self.ln1 = LayerNorm(embed_dims)
        self.attn = Attention(query_dim=embed_dims, dim_head=dim_head, heads=heads, out_bias=False)
        # sequential (LayerNorm, FeedForward) — checkpoint keys ff.0 / ff.1
        self.ff = ModuleList(
            [
                LayerNorm(embed_dims),
                FeedForward(embed_dims, embed_dims, mult=int(ffn_ratio), activation_fn="gelu", bias=False),
            ]
        )

    def __call__(self, params: Params, x: jax.Array, latents: jax.Array, residual: jax.Array) -> jax.Array:
        enc = self.ln0(params["ln0"], x)
        latents = self.ln1(params["ln1"], latents)
        enc = jnp.concatenate([enc, latents], axis=-2)
        latents = self.attn(params["attn"], latents, encoder_hidden_states=enc) + residual
        ff_out = self.ff[1](params["ff"][1], self.ff[0](params["ff"][0], latents))
        return ff_out + latents


class IPAdapterPlusImageProjection(Module):
    """Perceiver-style resampler over per-patch CLIP hidden states."""

    def __init__(
        self,
        embed_dims: int = 768,
        output_dims: int = 1024,
        hidden_dims: int = 1280,
        depth: int = 4,
        dim_head: int = 64,
        heads: int = 16,
        num_queries: int = 8,
        ffn_ratio: float = 4,
    ):
        super().__init__()
        self.num_queries = num_queries
        self.hidden_dims = hidden_dims
        self.proj_in = Linear(embed_dims, hidden_dims)
        self.proj_out = Linear(hidden_dims, output_dims)
        self.norm_out = LayerNorm(output_dims)
        self.layers = ModuleList(
            [IPAdapterPlusImageProjectionBlock(hidden_dims, dim_head, heads, ffn_ratio) for _ in range(depth)]
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["latents"] = (
            jax.random.normal(key, (1, self.num_queries, self.hidden_dims), dtype=jnp.float32) / self.hidden_dims**0.5
        ).astype(dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        latents = jnp.broadcast_to(params["latents"], (x.shape[0], *params["latents"].shape[1:]))
        x = self.proj_in(params["proj_in"], x)
        for i, block in enumerate(self.layers):
            residual = latents
            latents = block(params["layers"][i], x, latents, residual)
        latents = self.proj_out(params["proj_out"], latents)
        return self.norm_out(params["norm_out"], latents)


class MultiIPAdapterImageProjection(Module):
    """Applies one projection layer per loaded IP-Adapter.

    Input: list of n tensors [B, num_images, (seq,) D]; output: list of
    projected token tensors [B, num_images, tokens, cross_dim].
    """

    def __init__(self, image_projection_layers: Sequence[Module]):
        super().__init__()
        self.image_projection_layers = ModuleList(list(image_projection_layers))

    @property
    def num_ip_adapters(self) -> int:
        return len(self.image_projection_layers)

    def __call__(self, params: Params, image_embeds: List[jax.Array]) -> List[jax.Array]:
        if not isinstance(image_embeds, (list, tuple)):
            image_embeds = [image_embeds[:, None]]
        if len(image_embeds) != len(self.image_projection_layers):
            raise ValueError(
                f"image_embeds must have one entry per IP-Adapter "
                f"({len(image_embeds)} vs {len(self.image_projection_layers)})"
            )
        projected = []
        for i, (embed, layer) in enumerate(zip(image_embeds, self.image_projection_layers)):
            b, n = embed.shape[0], embed.shape[1]
            flat = embed.reshape((b * n,) + embed.shape[2:])
            out = layer(params["image_projection_layers"][i], flat)
            projected.append(out.reshape((b, n) + out.shape[1:]))
        return projected

"""GlmImageTransformer2DModel — GLM-Image DiT with prior-token conditioning.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_glm_image.py:503`):
linear patchifier plus a VQ prior-token embedding added per patch (`:71`,
`:574`, dropped token-wise for the uncond branch), glyph-text FeedForward
projector, SDXL-style target-size/crop sincos conditioning with a FINAL silu
(`:38`), joint [text; image] attention with per-head no-affine LayerNorm
qk-norm and rotate-half 2D rope on the image part only (`:251`), 12-part
interleaved AdaLN-zero (`:97`), shared FFN for both streams, Megatron-style
final AdaLN WITHOUT activation before the linear (`:471`).

TPU-first: the reference's mutable per-layer KV cache (`:145`) becomes a
functional contract — a condition-image forward with `return_kv=True`
returns per-layer rope'd (k, v) arrays; the denoise scan passes them back
via `kv_cache` where they are prepended as constants (cache "read"), and the
uncond branch simply omits them ("skip"). No mutation, one fused graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array
    kv_cache: Optional[List[Tuple[jax.Array, jax.Array]]] = None


def glm_image_rotary_emb(height: int, width: int, dim: int, patch_size: int,
                         theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side 2D rotate-half rope tables (reference `:432`)."""
    height, width = height // patch_size, width // patch_size
    dim_h = dim // 2
    h_inv = 1.0 / (theta ** (np.arange(0, dim_h, 2, dtype=np.float64)[: dim_h // 2] / dim_h))
    freqs_h = np.outer(np.arange(height), h_inv)[:, None, :]
    freqs_w = np.outer(np.arange(width), h_inv)[None, :, :]
    freqs_h = np.broadcast_to(freqs_h, (height, width, freqs_h.shape[-1]))
    freqs_w = np.broadcast_to(freqs_w, (height, width, freqs_w.shape[-1]))
    freqs = np.concatenate([freqs_h, freqs_w], axis=-1)
    freqs = np.concatenate([freqs, freqs], axis=-1).reshape(height * width, -1)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def _apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half (reference apply_rotary_emb use_real_unbind_dim=-2);
    x: [B, S, H, D], cos/sin: [S, D]."""
    x_f = x.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    x_rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x_f * cos[None, :, None, :] + x_rot * sin[None, :, None, :]).astype(x.dtype)


class GlmImageCombinedTimestepSizeEmbeddings(Module):
    """Reference `:38`; note the trailing silu on the summed conditioning."""

    def __init__(self, embedding_dim: int, condition_dim: int, pooled_projection_dim: int,
                 timesteps_dim: int = 256):
        super().__init__()
        self.time_proj = Timesteps(num_channels=timesteps_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.condition_proj = Timesteps(num_channels=condition_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=timesteps_dim, time_embed_dim=embedding_dim)
        self.condition_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")

    def __call__(self, params: Params, timestep, target_size, crop_coords, dtype):
        t_proj = self.time_proj({}, timestep).astype(dtype)
        crop_proj = self.condition_proj({}, crop_coords.reshape(-1)).reshape(crop_coords.shape[0], -1)
        size_proj = self.condition_proj({}, target_size.reshape(-1)).reshape(target_size.shape[0], -1)
        cond = jnp.concatenate([crop_proj, size_proj], axis=1).astype(dtype)
        temb = self.timestep_embedder(params["timestep_embedder"], t_proj)
        cemb = self.condition_embedder(params["condition_embedder"], cond)
        return jax.nn.silu(temb + cemb)


class GlmImageImageProjector(Module):
    """Linear patchifier (reference `:71`)."""

    def __init__(self, in_channels: int, hidden_size: int, patch_size: int):
        super().__init__()
        self.patch_size = patch_size
        self.proj = Linear(in_channels * patch_size**2, hidden_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, c, h, w = x.shape
        p = self.patch_size
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, (h // p) * (w // p), c * p * p)
        return self.proj(params["proj"], x)


class GlmImageAdaLayerNormZero(Module):
    """12-part interleaved dual-stream AdaLN-zero (reference `:97`)."""

    def __init__(self, embedding_dim: int, dim: int):
        super().__init__()
        self.norm = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.norm_context = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.linear = Linear(embedding_dim, 12 * dim, use_bias=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb):
        dtype = hidden_states.dtype
        norm_h = self.norm({}, hidden_states).astype(dtype)
        norm_c = self.norm_context({}, encoder_hidden_states).astype(dtype)
        emb = self.linear(params["linear"], temb)
        (shift_msa, c_shift_msa, scale_msa, c_scale_msa, gate_msa, c_gate_msa,
         shift_mlp, c_shift_mlp, scale_mlp, c_scale_mlp, gate_mlp, c_gate_mlp) = jnp.split(emb, 12, axis=1)
        norm_h = norm_h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        norm_c = norm_c * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]
        return (norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp,
                norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)


class GlmImageAttention(Module):
    """Joint [text; image] attention with per-head no-affine LayerNorm qk-norm
    (reference `:251`). Rope applies to the image part only; optional cached
    (k, v) from condition images are prepended."""

    def __init__(self, dim: int, heads: int, dim_head: int):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.to_q = Linear(dim, heads * dim_head, use_bias=True)
        self.to_k = Linear(dim, heads * dim_head, use_bias=True)
        self.to_v = Linear(dim, heads * dim_head, use_bias=True)
        self.to_out = ModuleList([Linear(heads * dim_head, dim, use_bias=True)])
        self.norm_q = LayerNorm(dim_head, eps=1e-5, use_scale=False, use_bias=False)
        self.norm_k = LayerNorm(dim_head, eps=1e-5, use_scale=False, use_bias=False)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 image_rotary_emb=None, attention_mask=None, kv_cache=None,
                 return_kv: bool = False):
        dtype = hidden_states.dtype
        text_len = encoder_hidden_states.shape[1]
        x = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        b, s, _ = x.shape

        q = self.to_q(params["to_q"], x).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.heads, self.dim_head)
        q = self.norm_q({}, q).astype(dtype)
        k = self.norm_k({}, k).astype(dtype)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = jnp.concatenate([q[:, :text_len], _apply_rope_half(q[:, text_len:], cos, sin)], axis=1)
            k = jnp.concatenate([k[:, :text_len], _apply_rope_half(k[:, text_len:], cos, sin)], axis=1)

        written_kv = (k, v) if return_kv else None
        if kv_cache is not None:
            k_c, v_c = kv_cache
            k_c = jnp.broadcast_to(k_c, (b, *k_c.shape[1:]))
            v_c = jnp.broadcast_to(v_c, (b, *v_c.shape[1:]))
            k = jnp.concatenate([k_c, k], axis=1)
            v = jnp.concatenate([v_c, v], axis=1)

        mask = None
        if attention_mask is not None:
            # text keep-mask -> pairwise bool over [text; image] (reference `:317`)
            mix = jnp.concatenate(
                [attention_mask.astype(bool), jnp.ones((b, s - text_len), bool)], axis=1)
            mask = (mix[:, :, None] & mix[:, None, :])[:, None]
            if kv_cache is not None:
                cache_len = k.shape[1] - s
                mask = jnp.concatenate(
                    [jnp.ones((b, 1, s, cache_len), bool), mask], axis=-1)

        out = dispatch_attention_fn(q, k, v, attn_mask=mask)
        out = out.reshape(b, s, -1).astype(dtype)
        out = self.to_out[0](params["to_out"][0], out)
        return out[:, text_len:], out[:, :text_len], written_kv


class GlmImageTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 time_embed_dim: int):
        super().__init__()
        self.norm1 = GlmImageAdaLayerNormZero(time_embed_dim, dim)
        self.attn1 = GlmImageAttention(dim, num_attention_heads, attention_head_dim)
        self.norm2 = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.norm2_context = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None, attention_mask=None, kv_cache=None,
                 return_kv: bool = False):
        (norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp) = self.norm1(
            params["norm1"], hidden_states, encoder_hidden_states, temb)

        attn_h, attn_c, written_kv = self.attn1(
            params["attn1"], norm_h, norm_c, image_rotary_emb=image_rotary_emb,
            attention_mask=attention_mask, kv_cache=kv_cache, return_kv=return_kv)
        hidden_states = hidden_states + attn_h * gate_msa[:, None]
        encoder_hidden_states = encoder_hidden_states + attn_c * c_gate_msa[:, None]

        norm_h = self.norm2({}, hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_c = self.norm2_context({}, encoder_hidden_states) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        hidden_states = hidden_states + self.ff(params["ff"], norm_h) * gate_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + self.ff(params["ff"], norm_c) * c_gate_mlp[:, None]
        return hidden_states, encoder_hidden_states, written_kv


class GlmImageAdaLayerNormContinuous(Module):
    """Final AdaLN — NO activation before the linear (reference `:471`)."""

    def __init__(self, embedding_dim: int, conditioning_embedding_dim: int,
                 elementwise_affine: bool = True, eps: float = 1e-5):
        super().__init__()
        self.linear = Linear(conditioning_embedding_dim, embedding_dim * 2, use_bias=True)
        self.norm = LayerNorm(embedding_dim, eps=eps, use_scale=elementwise_affine,
                              use_bias=elementwise_affine)

    def __call__(self, params: Params, x: jax.Array, conditioning: jax.Array) -> jax.Array:
        emb = self.linear(params["linear"], conditioning.astype(x.dtype))
        scale, shift = jnp.split(emb, 2, axis=1)
        norm_params = params.get("norm", {})
        return self.norm(norm_params, x) * (1 + scale)[:, None] + shift[:, None]


class GlmImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """Reference `:503`. Input/output are channel-first [B, C, H, W]."""

    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 16,
        out_channels: int = 16,
        num_layers: int = 30,
        attention_head_dim: int = 40,
        num_attention_heads: int = 64,
        text_embed_dim: int = 1472,
        time_embed_dim: int = 512,
        condition_dim: int = 256,
        prior_vq_quantizer_codebook_size: int = 16384,
        sample_size: int = 128,
    ):
        super().__init__()
        pooled_projection_dim = 2 * 2 * condition_dim
        inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = out_channels

        self.image_projector = GlmImageImageProjector(in_channels, inner_dim, patch_size)
        self.glyph_projector = FeedForward(text_embed_dim, inner_dim, inner_dim=inner_dim,
                                           activation_fn="gelu")
        self.prior_token_embedding = Embedding(prior_vq_quantizer_codebook_size, inner_dim)
        self.prior_projector = FeedForward(inner_dim, inner_dim, inner_dim=inner_dim,
                                           activation_fn="linear-silu")
        self.time_condition_embed = GlmImageCombinedTimestepSizeEmbeddings(
            embedding_dim=time_embed_dim, condition_dim=condition_dim,
            pooled_projection_dim=pooled_projection_dim, timesteps_dim=time_embed_dim)
        self.transformer_blocks = ModuleList([
            GlmImageTransformerBlock(inner_dim, num_attention_heads, attention_head_dim, time_embed_dim)
            for _ in range(num_layers)
        ])
        self.norm_out = GlmImageAdaLayerNormContinuous(inner_dim, time_embed_dim,
                                                       elementwise_affine=False)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * out_channels, use_bias=True)

    def rope(self, height: int, width: int):
        return glm_image_rotary_emb(height, width, self.config.attention_head_dim,
                                    self.config.patch_size)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, S_txt, text_embed_dim] (S_txt may be 0)
        prior_token_id: jax.Array,  # [B, N_img] int
        prior_token_drop: jax.Array,  # [B, N_img] bool
        timestep: jax.Array,
        target_size: jax.Array,  # [B, 2]
        crop_coords: jax.Array,  # [B, 2]
        attention_mask: Optional[jax.Array] = None,
        kv_cache: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
        return_kv: bool = False,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size, _, height, width = hidden_states.shape
        p = self.config.patch_size
        post_h, post_w = height // p, width // p

        if image_rotary_emb is None:
            cos, sin = self.rope(height, width)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        hidden_states = self.image_projector(params["image_projector"], hidden_states)
        encoder_hidden_states = self.glyph_projector(params["glyph_projector"], encoder_hidden_states)
        prior = self.prior_token_embedding(params["prior_token_embedding"], prior_token_id)
        prior = jnp.where(prior_token_drop[..., None], 0.0, prior)
        prior = self.prior_projector(params["prior_projector"], prior)
        hidden_states = hidden_states + prior.astype(hidden_states.dtype)

        temb = self.time_condition_embed(params["time_condition_embed"], timestep,
                                         target_size, crop_coords, hidden_states.dtype)

        written = [] if return_kv else None
        for i, block in enumerate(self.transformer_blocks):
            hidden_states, encoder_hidden_states, wkv = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                image_rotary_emb=image_rotary_emb, attention_mask=attention_mask,
                kv_cache=kv_cache[i] if kv_cache is not None else None, return_kv=return_kv)
            if return_kv:
                written.append(wkv)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        hidden_states = hidden_states.reshape(batch_size, post_h, post_w, -1, p, p)
        output = jnp.transpose(hidden_states, (0, 3, 1, 4, 2, 5)).reshape(
            batch_size, self.out_channels, post_h * p, post_w * p)

        if not return_dict:
            return (output, written)
        return Transformer2DModelOutput(sample=output, kv_cache=written)

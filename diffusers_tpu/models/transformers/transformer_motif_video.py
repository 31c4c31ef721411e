"""MotifVideoTransformer3DModel — Motif-Video dual/single-stream video DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_motif_video.py:730`):
joint attention packs VIDEO FIRST then text (opposite of Flux), per-head RMS
qk-norm, theta-256 3-axis rope, optional per-block text cross-attention
(image tokens sliced off the context via `image_embed_seq_len`), optional
decoder single blocks that re-use the encoder output as their context, and
a SigLIP image-projection stream prepended to the text tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

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
from ..normalization import AdaLayerNormContinuous, AdaLayerNormZero, AdaLayerNormZeroSingle


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class MotifVideoAttention(Module):
    """Joint attention, video tokens FIRST then context (reference :289)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 added_kv_proj_dim: Optional[int] = None, pre_only: bool = False,
                 context_pre_only: Optional[bool] = None, eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.pre_only = pre_only
        self.added_kv_proj_dim = added_kv_proj_dim
        self.to_q = Linear(query_dim, inner, use_bias=True)
        self.to_k = Linear(query_dim, inner, use_bias=True)
        self.to_v = Linear(query_dim, inner, use_bias=True)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        if not pre_only:
            self.to_out = ModuleList([Linear(inner, query_dim, use_bias=True)])
        if added_kv_proj_dim is not None:
            self.add_q_proj = Linear(added_kv_proj_dim, inner, use_bias=True)
            self.add_k_proj = Linear(added_kv_proj_dim, inner, use_bias=True)
            self.add_v_proj = Linear(added_kv_proj_dim, inner, use_bias=True)
            self.norm_added_q = RMSNorm(dim_head, eps=eps)
            self.norm_added_k = RMSNorm(dim_head, eps=eps)
            self.to_add_out = Linear(inner, added_kv_proj_dim, use_bias=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, image_rotary_emb=None):
        b = hidden_states.shape[0]
        joint_input = hidden_states
        if self.added_kv_proj_dim is None and encoder_hidden_states is not None:
            joint_input = jnp.concatenate([hidden_states, encoder_hidden_states], axis=1)

        q = self.to_q(params["to_q"], joint_input).reshape(b, -1, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], joint_input).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], joint_input).reshape(b, -1, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            if self.added_kv_proj_dim is None and encoder_hidden_states is not None:
                split = joint_input.shape[1] - encoder_hidden_states.shape[1]
                q = jnp.concatenate([apply_rotary_emb(q[:, :split], cos, sin), q[:, split:]],
                                    axis=1)
                k = jnp.concatenate([apply_rotary_emb(k[:, :split], cos, sin), k[:, split:]],
                                    axis=1)
            else:
                q = apply_rotary_emb(q, cos, sin)
                k = apply_rotary_emb(k, cos, sin)

        if self.added_kv_proj_dim is not None and encoder_hidden_states is not None:
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(
                b, -1, self.heads, self.dim_head)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(
                b, -1, self.heads, self.dim_head)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(
                b, -1, self.heads, self.dim_head)
            eq = self.norm_added_q(params["norm_added_q"], eq)
            ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([q, eq], axis=1)
            k = jnp.concatenate([k, ek], axis=1)
            v = jnp.concatenate([v, ev], axis=1)

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, out.shape[1], -1).astype(q.dtype)

        if encoder_hidden_states is not None:
            n_txt = encoder_hidden_states.shape[1]
            sample_out, ctx_out = out[:, :-n_txt], out[:, -n_txt:]
            if not self.pre_only:
                sample_out = self.to_out[0](params["to_out"][0], sample_out)
            if self.added_kv_proj_dim is not None:
                ctx_out = self.to_add_out(params["to_add_out"], ctx_out)
            return sample_out, ctx_out
        if not self.pre_only:
            out = self.to_out[0](params["to_out"][0], out)
        return out


class MotifVideoCrossAttention(Module):
    """Text cross-attention (image tokens sliced off; reference :221)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int, eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(query_dim, inner, use_bias=True)
        self.to_k = Linear(query_dim, inner, use_bias=True)
        self.to_v = Linear(query_dim, inner, use_bias=True)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=True)])

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 attention_mask=None, image_rotary_emb=None, image_embed_seq_len: int = 0):
        b = hidden_states.shape[0]
        txt_kv = encoder_hidden_states[:, image_embed_seq_len:, :]
        text_mask = None
        if attention_mask is not None:
            text_mask = attention_mask[
                :, :, :, image_embed_seq_len - encoder_hidden_states.shape[1]:]
        q = self.to_q(params["to_q"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], txt_kv).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], txt_kv).reshape(b, -1, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if image_rotary_emb is not None:
            q = apply_rotary_emb(q, *image_rotary_emb)
        out = dispatch_attention_fn(q, k, v, attn_mask=text_mask)
        out = out.reshape(b, -1, self.heads * self.dim_head).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class MotifVideoSingleTransformerBlock(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int,
                 mlp_ratio: float = 4.0, enable_text_cross_attention: bool = False):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        mlp_dim = int(hidden_size * mlp_ratio)
        self.attn = MotifVideoAttention(hidden_size, num_attention_heads, attention_head_dim,
                                        pre_only=True)
        self.enable_text_cross_attention = enable_text_cross_attention
        if enable_text_cross_attention:
            self.cross_attn = MotifVideoCrossAttention(hidden_size, num_attention_heads,
                                                       attention_head_dim)
        self.norm = AdaLayerNormZeroSingle(hidden_size)
        self.proj_mlp = Linear(hidden_size, mlp_dim)
        self.proj_out = Linear(hidden_size + mlp_dim, hidden_size)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 attention_mask=None, image_rotary_emb=None, image_embed_seq_len: int = 0):
        n_txt = encoder_hidden_states.shape[1]
        h = jnp.concatenate([hidden_states, encoder_hidden_states], axis=1)
        residual = h
        norm_h, gate = self.norm(params["norm"], h, emb=temb)
        mlp_h = jax.nn.gelu(self.proj_mlp(params["proj_mlp"], norm_h), approximate=True)
        norm_video, norm_ctx = norm_h[:, :-n_txt], norm_h[:, -n_txt:]
        attn_out, ctx_attn_out = self.attn(params["attn"], norm_video,
                                           encoder_hidden_states=norm_ctx,
                                           attention_mask=attention_mask,
                                           image_rotary_emb=image_rotary_emb)
        if self.enable_text_cross_attention:
            attn_out = attn_out + self.cross_attn(
                params["cross_attn"], attn_out, norm_ctx, attention_mask=attention_mask,
                image_rotary_emb=image_rotary_emb, image_embed_seq_len=image_embed_seq_len)
        attn_full = jnp.concatenate([attn_out, ctx_attn_out], axis=1)
        h = jnp.concatenate([attn_full, mlp_h], axis=2)
        h = residual + gate[:, None] * self.proj_out(params["proj_out"], h)
        return h[:, :-n_txt], h[:, -n_txt:]


class MotifVideoTransformerBlock(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int,
                 mlp_ratio: float = 4.0, enable_text_cross_attention: bool = False):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        self.norm1 = AdaLayerNormZero(hidden_size)
        self.norm1_context = AdaLayerNormZero(hidden_size)
        self.attn = MotifVideoAttention(hidden_size, num_attention_heads, attention_head_dim,
                                        added_kv_proj_dim=hidden_size, context_pre_only=False)
        self.enable_text_cross_attention = enable_text_cross_attention
        if enable_text_cross_attention:
            self.cross_attn = MotifVideoCrossAttention(hidden_size, num_attention_heads,
                                                       attention_head_dim)
        self.norm2 = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.norm2_context = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(hidden_size, mult=int(mlp_ratio), activation_fn="gelu-approximate")
        self.ff_context = FeedForward(hidden_size, mult=int(mlp_ratio),
                                      activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 attention_mask=None, image_rotary_emb=None, image_embed_seq_len: int = 0):
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
            params["norm1"], hidden_states, emb=temb)
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
            params["norm1_context"], encoder_hidden_states, emb=temb)
        attn_out, ctx_attn_out = self.attn(params["attn"], norm_h,
                                           encoder_hidden_states=norm_c,
                                           attention_mask=attention_mask,
                                           image_rotary_emb=image_rotary_emb)
        hidden_states = hidden_states + attn_out * gate_msa[:, None]
        if self.enable_text_cross_attention:
            hidden_states = hidden_states + self.cross_attn(
                params["cross_attn"], attn_out, norm_c, attention_mask=attention_mask,
                image_rotary_emb=image_rotary_emb, image_embed_seq_len=image_embed_seq_len)
        encoder_hidden_states = encoder_hidden_states + ctx_attn_out * c_gate_msa[:, None]

        norm_h = self.norm2({}, hidden_states)
        norm_c = self.norm2_context({}, encoder_hidden_states)
        norm_h = norm_h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_c = norm_c * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_h)
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * self.ff_context(
            params["ff_context"], norm_c)
        return hidden_states, encoder_hidden_states


class MotifVideoImageProjection(Module):
    def __init__(self, in_features: int, hidden_size: int):
        super().__init__()
        self.norm_in = LayerNorm(in_features)
        self.linear_1 = Linear(in_features, in_features)
        self.linear_2 = Linear(in_features, hidden_size)
        self.norm_out = LayerNorm(hidden_size)

    def __call__(self, params: Params, image_embeds: jax.Array) -> jax.Array:
        h = self.norm_in(params["norm_in"], image_embeds)
        h = jax.nn.gelu(self.linear_1(params["linear_1"], h), approximate=False)
        h = self.linear_2(params["linear_2"], h)
        return self.norm_out(params["norm_out"], h)


class MotifVideoConditionEmbedding(Module):
    def __init__(self, embedding_dim: int):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        proj = self.time_proj({}, timestep).astype(dtype)
        return self.timestep_embedder(params["timestep_embedder"], proj)


class MotifVideoTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Motif-Video DiT (reference :730)."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 33,
        out_channels: int = 16,
        num_attention_heads: int = 24,
        attention_head_dim: int = 128,
        num_layers: int = 20,
        num_single_layers: int = 40,
        num_decoder_layers: int = 0,
        mlp_ratio: float = 4.0,
        patch_size: int = 2,
        patch_size_t: int = 1,
        qk_norm: str = "rms_norm",
        norm_type: str = "layer_norm",
        text_embed_dim: int = 4096,
        image_embed_dim: Optional[int] = None,
        rope_theta: float = 256.0,
        rope_axes_dim: Tuple[int, int, int] = (16, 56, 56),
        enable_text_cross_attention_dual: bool = False,
        enable_text_cross_attention_single: bool = False,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        out_channels = out_channels or in_channels
        self.x_embedder = _MotifPatchEmbed((patch_size_t, patch_size, patch_size),
                                           in_channels, inner_dim)
        self.context_embedder = PixArtAlphaTextProjection(text_embed_dim, inner_dim)
        if image_embed_dim is not None:
            self.image_embedder = MotifVideoImageProjection(image_embed_dim, inner_dim)
        self.time_text_embed = MotifVideoConditionEmbedding(inner_dim)
        self.transformer_blocks = ModuleList([
            MotifVideoTransformerBlock(num_attention_heads, attention_head_dim,
                                       mlp_ratio=mlp_ratio,
                                       enable_text_cross_attention=enable_text_cross_attention_dual)
            for _ in range(num_layers)
        ])
        n_enc = num_single_layers - num_decoder_layers
        self.single_transformer_blocks = ModuleList([
            MotifVideoSingleTransformerBlock(
                num_attention_heads, attention_head_dim, mlp_ratio=mlp_ratio,
                enable_text_cross_attention=enable_text_cross_attention_single if i < n_enc
                else False)
            for i in range(num_single_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim,
                                               elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, patch_size_t * patch_size * patch_size * out_channels)

    def rope_tables(self, num_frames: int, height: int, width: int):
        """Host-side 3-axis theta-256 rope (reference MotifVideoRotaryPosEmbed :447)."""
        p, p_t = self.config.patch_size, self.config.patch_size_t
        sizes = [num_frames // p_t, height // p, width // p]
        grids = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in sizes], indexing="ij")
        cos_list, sin_list = [], []
        for i in range(3):
            cos, sin = get_1d_rotary_pos_embed_np(
                self.config.rope_axes_dim[i], grids[i].reshape(-1),
                theta=self.config.rope_theta)
            cos_list.append(cos)
            sin_list.append(sin)
        return (jnp.asarray(np.concatenate(cos_list, axis=1), jnp.float32),
                jnp.asarray(np.concatenate(sin_list, axis=1), jnp.float32))

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,
        image_embeds: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        b, _, f, h, w = hidden_states.shape
        p, p_t = self.config.patch_size, self.config.patch_size_t
        pf, ph, pw = f // p_t, h // p, w // p

        image_rotary_emb = self.rope_tables(f, h, w)
        temb = self.time_text_embed(params["time_text_embed"], timestep, hidden_states.dtype)
        x = self.x_embedder(params["x_embedder"], hidden_states)
        ehs = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        image_embed_seq_len = 0
        if image_embeds is not None:
            img = self.image_embedder(params["image_embedder"], image_embeds)
            ehs = jnp.concatenate([img, ehs], axis=1)
            image_embed_seq_len = img.shape[1]
            if encoder_attention_mask is not None:
                encoder_attention_mask = jnp.concatenate(
                    [jnp.ones((b, img.shape[1]), encoder_attention_mask.dtype),
                     encoder_attention_mask], axis=1)

        decoder_hidden_states = x if self.config.num_decoder_layers > 0 else None

        attention_mask = None
        if encoder_attention_mask is not None:
            attention_mask = jnp.concatenate(
                [jnp.ones((b, x.shape[1]), bool), encoder_attention_mask.astype(bool)],
                axis=1)[:, None, None, :]

        for i, block in enumerate(self.transformer_blocks):
            x, ehs = block(params["transformer_blocks"][i], x, ehs, temb, attention_mask,
                           image_rotary_emb, image_embed_seq_len)

        n_dec = self.config.num_decoder_layers
        n_single = len(self.single_transformer_blocks)
        for i in range(n_single - n_dec):
            x, ehs = self.single_transformer_blocks[i](
                params["single_transformer_blocks"][i], x, ehs, temb, attention_mask,
                image_rotary_emb, image_embed_seq_len)

        if n_dec > 0:
            ctx = x
            for i in range(n_single - n_dec, n_single):
                decoder_hidden_states, ctx = self.single_transformer_blocks[i](
                    params["single_transformer_blocks"][i], decoder_hidden_states, ctx,
                    temb, None, image_rotary_emb)
            x = decoder_hidden_states

        x = self.norm_out(params["norm_out"], x, temb)
        x = self.proj_out(params["proj_out"], x)

        out_c = self.config.out_channels
        x = x.reshape(b, pf, ph, pw, out_c, p_t, p, p)
        x = jnp.transpose(x, (0, 4, 1, 5, 2, 6, 3, 7)).reshape(b, out_c, f, h, w)
        if not return_dict:
            return (x,)
        return Transformer2DModelOutput(sample=x)


class _MotifPatchEmbed(Module):
    def __init__(self, patch_size, in_chans: int, embed_dim: int):
        super().__init__()
        self.proj = Conv3d(in_chans, embed_dim, kernel_size=tuple(patch_size),
                           stride=tuple(patch_size))

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # [B, C, F, H, W] -> NDHWC conv -> tokens
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = self.proj(params["proj"], x)
        return x.reshape(x.shape[0], -1, x.shape[-1])

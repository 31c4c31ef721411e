"""CogVideoXTransformer3DModel — the CogVideoX video DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/cogvideox_transformer_3d.py:160`;
CogVideoXBlock `:38`, CogVideoXLayerNormZero `normalization.py:448`,
CogVideoXPatchEmbed `embeddings.py:641`, joint-attention processor with
video-only RoPE `attention_processor.py` CogVideoXAttnProcessor2_0).

Design notes (TPU): text and video tokens run as ONE joint sequence through
qkv so the attention is a single MXU-friendly matmul; RoPE rotates only the
video slice (static split — text length is a trace-time constant). The block
stack is a Python loop over blocks (30 blocks at 1920 dims jits fine and
keeps per-block param dicts addressable for LoRA/TP plans)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv2d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
    get_3d_rotary_pos_embed_np,
    get_3d_sincos_pos_embed_np,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNorm


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class CogVideoXLayerNormZero(Module):
    """norm + (1+scale)·x + shift for both streams, returning per-stream
    gates (reference normalization.py:448)."""

    def __init__(self, conditioning_dim: int, embedding_dim: int,
                 elementwise_affine: bool = True, eps: float = 1e-5, bias: bool = True):
        super().__init__()
        self.linear = Linear(conditioning_dim, 6 * embedding_dim, use_bias=bias)
        self.norm = LayerNorm(embedding_dim, eps=eps, use_scale=elementwise_affine, use_bias=elementwise_affine)

    def __call__(self, params, hidden_states, encoder_hidden_states, temb):
        mods = self.linear(params["linear"], jax.nn.silu(temb))
        shift, scale, gate, enc_shift, enc_scale, enc_gate = jnp.split(mods, 6, axis=-1)
        norm_p = params.get("norm", {})
        hidden_states = self.norm(norm_p, hidden_states) * (1 + scale[:, None]) + shift[:, None]
        encoder_hidden_states = self.norm(norm_p, encoder_hidden_states) * (1 + enc_scale[:, None]) + enc_shift[:, None]
        return hidden_states, encoder_hidden_states, gate[:, None], enc_gate[:, None]


class CogVideoXAttention(Module):
    """Joint text+video self-attention with per-head qk LayerNorm and
    video-only RoPE (reference CogVideoXAttnProcessor2_0)."""

    def __init__(self, dim: int, heads: int, dim_head: int, qk_norm: bool = True,
                 bias: bool = False, out_bias: bool = True, qk_norm_affine: bool = True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=bias)
        self.to_k = Linear(dim, inner, use_bias=bias)
        self.to_v = Linear(dim, inner, use_bias=bias)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=out_bias)])
        aff = qk_norm_affine
        self.norm_q = LayerNorm(dim_head, eps=1e-6, use_scale=aff, use_bias=aff) if qk_norm else None
        self.norm_k = LayerNorm(dim_head, eps=1e-6, use_scale=aff, use_bias=aff) if qk_norm else None

    def __call__(self, params, hidden_states, encoder_hidden_states, image_rotary_emb=None):
        text_len = encoder_hidden_states.shape[1]
        joint = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        b, s, _ = joint.shape

        q = self.to_q(params["to_q"], joint).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], joint).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], joint).reshape(b, s, self.heads, self.dim_head)
        if self.norm_q is not None:
            q = self.norm_q(params.get("norm_q", {}), q)
            k = self.norm_k(params.get("norm_k", {}), k)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = jnp.concatenate([q[:, :text_len], apply_rotary_emb(q[:, text_len:], cos, sin)], axis=1)
            k = jnp.concatenate([k[:, :text_len], apply_rotary_emb(k[:, text_len:], cos, sin)], axis=1)

        out = dispatch_attention_fn(q, k, v).reshape(b, s, -1).astype(joint.dtype)
        out = self.to_out[0](params["to_out"][0], out)
        return out[:, text_len:], out[:, :text_len]


class CogVideoXPatchEmbed(Module):
    """Joint text+video patch embedding (reference embeddings.py:641)."""

    def __init__(self, in_channels, inner_dim, text_embed_dim, patch_size, patch_size_t, bias=True):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.inner_dim = inner_dim
        if patch_size_t is None:
            self.proj = Conv2d(in_channels, inner_dim, kernel_size=patch_size,
                               stride=patch_size, use_bias=bias)
        else:
            self.proj = Linear(in_channels * patch_size * patch_size * patch_size_t,
                               inner_dim, use_bias=bias)
        self.text_proj = Linear(text_embed_dim, inner_dim)

    def __call__(self, params, text_embeds, image_embeds):
        """→ (text tokens [B,S,D], video tokens [B,FHW/p², D])."""
        text = self.text_proj(params["text_proj"], text_embeds)
        b, f, c, h, w = image_embeds.shape
        p, p_t = self.patch_size, self.patch_size_t
        if p_t is None:
            x = image_embeds.reshape(b * f, c, h, w)
            x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for the conv
            x = self.proj(params["proj"], x)
            video = x.reshape(b, f * (h // p) * (w // p), self.inner_dim)
        else:
            x = jnp.transpose(image_embeds, (0, 1, 3, 4, 2))  # [B,F,H,W,C]
            x = x.reshape(b, f // p_t, p_t, h // p, p, w // p, p, c)
            x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6)).reshape(
                b, (f // p_t) * (h // p) * (w // p), c * p_t * p * p
            )
            video = self.proj(params["proj"], x)
        return text, video


class CogVideoXBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 time_embed_dim: int, activation_fn: str = "gelu-approximate",
                 attention_bias: bool = False, qk_norm: bool = True,
                 norm_elementwise_affine: bool = True, norm_eps: float = 1e-5,
                 ff_inner_dim: Optional[int] = None, ff_bias: bool = True,
                 attention_out_bias: bool = True):
        super().__init__()
        self.norm1 = CogVideoXLayerNormZero(time_embed_dim, dim, norm_elementwise_affine, norm_eps, bias=True)
        self.attn1 = CogVideoXAttention(dim, num_attention_heads, attention_head_dim,
                                        qk_norm=qk_norm, bias=attention_bias, out_bias=attention_out_bias)
        self.norm2 = CogVideoXLayerNormZero(time_embed_dim, dim, norm_elementwise_affine, norm_eps, bias=True)
        self.ff = FeedForward(dim, activation_fn=activation_fn, inner_dim=ff_inner_dim, bias=ff_bias)

    def __call__(self, params, hidden_states, encoder_hidden_states, temb, image_rotary_emb=None):
        text_len = encoder_hidden_states.shape[1]
        norm_h, norm_e, gate_msa, enc_gate_msa = self.norm1(
            params["norm1"], hidden_states, encoder_hidden_states, temb
        )
        attn_h, attn_e = self.attn1(params["attn1"], norm_h, norm_e, image_rotary_emb)
        hidden_states = hidden_states + gate_msa * attn_h
        encoder_hidden_states = encoder_hidden_states + enc_gate_msa * attn_e

        norm_h, norm_e, gate_ff, enc_gate_ff = self.norm2(
            params["norm2"], hidden_states, encoder_hidden_states, temb
        )
        ff_out = self.ff(params["ff"], jnp.concatenate([norm_e, norm_h], axis=1))
        hidden_states = hidden_states + gate_ff * ff_out[:, text_len:]
        encoder_hidden_states = encoder_hidden_states + enc_gate_ff * ff_out[:, :text_len]
        return hidden_states, encoder_hidden_states


class CogVideoXTransformer3DModel(Module, ModelMixin, ConfigMixin):
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
        ofs_embed_dim: Optional[int] = None,
        text_embed_dim: int = 4096,
        num_layers: int = 30,
        dropout: float = 0.0,
        attention_bias: bool = True,
        sample_width: int = 90,
        sample_height: int = 60,
        sample_frames: int = 49,
        patch_size: int = 2,
        patch_size_t: Optional[int] = None,
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
        patch_bias: bool = True,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        if not use_rotary_positional_embeddings and use_learned_positional_embeddings:
            raise ValueError("no CogVideoX checkpoints pair learned positions with rotary disabled")

        # patch embed (CogVideoXPatchEmbed, embeddings.py:641): 1.0 ckpts use
        # a 2D conv per frame; 1.5 ckpts flatten (p_t, p, p) patches to Linear.
        # Nested module so checkpoint keys line up (patch_embed.proj.*,
        # patch_embed.text_proj.*)
        self.patch_embed = CogVideoXPatchEmbed(
            in_channels, inner_dim, text_embed_dim, patch_size, patch_size_t, patch_bias
        )

        self.time_proj = Timesteps(inner_dim, flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(inner_dim, time_embed_dim, act_fn=timestep_activation_fn)
        self.ofs_proj = None
        self.ofs_embedding = None
        if ofs_embed_dim:
            self.ofs_proj = Timesteps(ofs_embed_dim, flip_sin_to_cos, freq_shift)
            self.ofs_embedding = TimestepEmbedding(ofs_embed_dim, ofs_embed_dim, act_fn=timestep_activation_fn)

        self.transformer_blocks = ModuleList([
            CogVideoXBlock(
                dim=inner_dim,
                num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim,
                time_embed_dim=time_embed_dim,
                activation_fn=activation_fn,
                attention_bias=attention_bias,
                norm_elementwise_affine=norm_elementwise_affine,
                norm_eps=norm_eps,
            )
            for _ in range(num_layers)
        ])
        self.norm_final = LayerNorm(inner_dim, eps=norm_eps, use_scale=norm_elementwise_affine,
                                    use_bias=norm_elementwise_affine)
        self.norm_out = AdaLayerNorm(time_embed_dim, output_dim=2 * inner_dim, norm_eps=norm_eps,
                                     chunk_dim=1, elementwise_affine=norm_elementwise_affine)
        output_dim = patch_size * patch_size * (patch_size_t or 1) * (out_channels or in_channels)
        self.proj_out = Linear(inner_dim, output_dim)

    # ---------------------------------------------------------------- pos
    def _sincos_pos_embedding(self, height: int, width: int, num_frames: int) -> np.ndarray:
        p = self.config.patch_size
        pos = get_3d_sincos_pos_embed_np(
            self.inner_dim,
            (width // p, height // p),
            num_frames,
            self.config.spatial_interpolation_scale,
            self.config.temporal_interpolation_scale,
        ).reshape(-1, self.inner_dim)
        return pos

    def rope(self, height: int, width: int, num_frames: int):
        """Precompute the video RoPE table (pipeline hook; reference
        pipeline `_prepare_rotary_positional_embeddings`)."""
        p = self.config.patch_size
        grid_h, grid_w = height // p, width // p
        base_w = self.config.sample_width // p
        base_h = self.config.sample_height // p
        # center-crop coords in the base grid (reference get_resize_crop_region_for_grid)
        ar = grid_h / grid_w
        if base_h / base_w > ar:
            rw, rh = base_w, int(round(ar * base_w))
        else:
            rh, rw = base_h, int(round(base_h / ar))
        top, left = (base_h - rh) // 2, (base_w - rw) // 2
        cos, sin = get_3d_rotary_pos_embed_np(
            self.config.attention_head_dim,
            ((top, left), (top + rh, left + rw)),
            (grid_h, grid_w),
            num_frames,
        )
        return jnp.asarray(cos), jnp.asarray(sin)

    # ---------------------------------------------------------------- fwd
    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, F, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, S_text, text_embed_dim]
        timestep: jax.Array,
        timestep_cond: Optional[jax.Array] = None,
        ofs: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ):
        b, f, c, h, w = hidden_states.shape
        p = self.config.patch_size
        p_t = self.config.patch_size_t

        t_emb = self.time_proj({}, timestep).astype(hidden_states.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)
        if self.ofs_embedding is not None:
            ofs_emb = self.ofs_proj({}, ofs).astype(hidden_states.dtype)
            emb = emb + self.ofs_embedding(params["ofs_embedding"], ofs_emb)

        text, video = self.patch_embed(params["patch_embed"], encoder_hidden_states, hidden_states)

        if not self.config.use_rotary_positional_embeddings:
            pos = jnp.asarray(self._sincos_pos_embedding(h, w, f), dtype=video.dtype)
            video = video + pos[None]

        text_len = encoder_hidden_states.shape[1]
        hidden, context = video, text
        for i, block in enumerate(self.transformer_blocks):
            hidden, context = block(
                params["transformer_blocks"][i], hidden, context, emb, image_rotary_emb
            )

        hidden = self.norm_final(params["norm_final"], hidden)
        hidden = self.norm_out(params["norm_out"], hidden, emb)
        hidden = self.proj_out(params["proj_out"], hidden)

        out_c = self.config.out_channels or self.config.in_channels
        if p_t is None:
            output = hidden.reshape(b, f, h // p, w // p, out_c, p, p)
            output = jnp.transpose(output, (0, 1, 4, 2, 5, 3, 6)).reshape(b, f, out_c, h, w)
        else:
            output = hidden.reshape(b, f // p_t, h // p, w // p, out_c, p_t, p, p)
            output = jnp.transpose(output, (0, 1, 5, 4, 2, 6, 3, 7)).reshape(b, f, out_c, h, w)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

"""HunyuanVideoTransformer3DModel — dual/single-stream video DiT (Tencent).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_hunyuan_video.py:841`
HunyuanVideoTransformer3DModel; attention processor `:45` — image tokens
first, text appended, RoPE on image tokens only; token refiner `:429`;
condition embedding `:289`; rope `:478`).

TPU-first: 3D patchify is one strided Conv3d (MXU); the (video‖text) token
stream runs through the same packed-matmul block shapes as Flux; the RoPE
tables and the [B,1,1,N] text-validity mask are precomputed host-side per
shape. `image_condition_type='token_replace'` (HunyuanVideo-I2V) applies
separate first-frame modulation, implemented as a trace-time split.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import (
    CombinedTimestepTextProjEmbeddings,
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


class HunyuanVideoAttention(Module):
    """Joint attention, image tokens first (reference processor :45)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int,
                 added_kv_proj_dim: Optional[int] = None, qk_norm: str = "rms_norm",
                 eps: float = 1e-6, pre_only: bool = False):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = heads * dim_head
        self.added_kv_proj_dim = added_kv_proj_dim
        self.pre_only = pre_only

        self.to_q = Linear(query_dim, self.inner_dim, use_bias=True)
        self.to_k = Linear(query_dim, self.inner_dim, use_bias=True)
        self.to_v = Linear(query_dim, self.inner_dim, use_bias=True)
        if qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        else:
            raise ValueError(f"unsupported qk_norm {qk_norm}")
        if added_kv_proj_dim is not None:
            self.add_q_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=True)
            self.add_k_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=True)
            self.add_v_proj = Linear(added_kv_proj_dim, self.inner_dim, use_bias=True)
            self.norm_added_q = RMSNorm(dim_head, eps=eps)
            self.norm_added_k = RMSNorm(dim_head, eps=eps)
            self.to_add_out = Linear(self.inner_dim, added_kv_proj_dim, use_bias=True)
        if not pre_only:
            self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=True)])

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None):
        b = hidden_states.shape[0]
        img_len = hidden_states.shape[1]
        txt_len = encoder_hidden_states.shape[1] if encoder_hidden_states is not None else 0

        if self.added_kv_proj_dim is None and encoder_hidden_states is not None:
            # single-stream: qkv over the already-concatenated (img‖txt) stream
            hidden_states = jnp.concatenate([hidden_states, encoder_hidden_states], axis=1)

        q = self.to_q(params["to_q"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, -1, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            if self.added_kv_proj_dim is None and encoder_hidden_states is not None:
                q = jnp.concatenate([apply_rotary_emb(q[:, :img_len], cos, sin), q[:, img_len:]], axis=1)
                k = jnp.concatenate([apply_rotary_emb(k[:, :img_len], cos, sin), k[:, img_len:]], axis=1)
            else:
                q = apply_rotary_emb(q, cos, sin)
                k = apply_rotary_emb(k, cos, sin)

        if self.added_kv_proj_dim is not None and encoder_hidden_states is not None:
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, -1, self.heads, self.dim_head)
            eq = self.norm_added_q(params["norm_added_q"], eq)
            ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([q, eq], axis=1)
            k = jnp.concatenate([k, ek], axis=1)
            v = jnp.concatenate([v, ev], axis=1)

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, -1, self.heads * self.dim_head).astype(q.dtype)

        if encoder_hidden_states is not None:
            sample_out, context_out = out[:, :-txt_len], out[:, -txt_len:]
            if not self.pre_only:
                sample_out = self.to_out[0](params["to_out"][0], sample_out)
            if self.added_kv_proj_dim is not None:
                context_out = self.to_add_out(params["to_add_out"], context_out)
            return sample_out, context_out
        if self.pre_only:
            return out
        return self.to_out[0](params["to_out"][0], out)


class HunyuanVideoAdaNorm(Module):
    def __init__(self, in_features: int, out_features: Optional[int] = None):
        super().__init__()
        self.linear = Linear(in_features, out_features or 2 * in_features)

    def __call__(self, params: Params, temb: jax.Array):
        temb = self.linear(params["linear"], jax.nn.silu(temb))
        gate_msa, gate_mlp = jnp.split(temb, 2, axis=1)
        return gate_msa[:, None], gate_mlp[:, None]


class HunyuanVideoConditionEmbedding(Module):
    def __init__(self, embedding_dim: int, pooled_projection_dim: int, guidance_embeds: bool,
                 image_condition_type: Optional[str] = None):
        super().__init__()
        self.image_condition_type = image_condition_type
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")
        self.guidance_embedder = (
            TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim) if guidance_embeds else None
        )

    def __call__(self, params: Params, timestep: jax.Array, pooled_projection: jax.Array,
                 guidance: Optional[jax.Array] = None):
        dtype = pooled_projection.dtype
        t_emb = self.timestep_embedder(params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype))
        pooled = self.text_embedder(params["text_embedder"], pooled_projection)

        token_replace_emb = None
        if self.image_condition_type == "token_replace":
            tr_proj = self.time_proj({}, jnp.zeros_like(timestep))
            token_replace_emb = self.timestep_embedder(params["timestep_embedder"], tr_proj.astype(dtype)) + pooled

        if self.guidance_embedder is not None:
            g_emb = self.guidance_embedder(params["guidance_embedder"], self.time_proj({}, guidance).astype(dtype))
            return t_emb + g_emb + pooled, token_replace_emb
        return t_emb + pooled, token_replace_emb


class HunyuanVideoIndividualTokenRefinerBlock(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int, mlp_width_ratio: float = 4.0,
                 attention_bias: bool = True):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        self.norm1 = LayerNorm(hidden_size, eps=1e-6)
        self.attn = Attention(query_dim=hidden_size, heads=num_attention_heads,
                              dim_head=attention_head_dim, bias=attention_bias)
        self.norm2 = LayerNorm(hidden_size, eps=1e-6)
        self.ff = FeedForward(hidden_size, mult=mlp_width_ratio, activation_fn="linear-silu")
        self.norm_out = HunyuanVideoAdaNorm(hidden_size, 2 * hidden_size)

    def __call__(self, params: Params, hidden_states, temb, attention_mask=None):
        norm_hidden = self.norm1(params["norm1"], hidden_states)
        attn_output = self.attn(params["attn"], norm_hidden, attention_mask=attention_mask)
        gate_msa, gate_mlp = self.norm_out(params["norm_out"], temb)
        hidden_states = hidden_states + attn_output * gate_msa
        ff_output = self.ff(params["ff"], self.norm2(params["norm2"], hidden_states))
        return hidden_states + ff_output * gate_mlp


class HunyuanVideoIndividualTokenRefiner(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int, num_layers: int,
                 mlp_width_ratio: float = 4.0, attention_bias: bool = True):
        super().__init__()
        self.refiner_blocks = ModuleList(
            [
                HunyuanVideoIndividualTokenRefinerBlock(
                    num_attention_heads, attention_head_dim, mlp_width_ratio=mlp_width_ratio,
                    attention_bias=attention_bias,
                )
                for _ in range(num_layers)
            ]
        )

    def __call__(self, params: Params, hidden_states, temb, attention_mask=None):
        self_attn_mask = None
        if attention_mask is not None:
            m = attention_mask.astype(bool)
            mask2d = m[:, None, :, None] & m[:, None, None, :]
            mask2d = mask2d.at[:, :, :, 0].set(True)  # reference :419
            self_attn_mask = mask2d
        for i, block in enumerate(self.refiner_blocks):
            hidden_states = block(params["refiner_blocks"][i], hidden_states, temb, self_attn_mask)
        return hidden_states


class HunyuanVideoTokenRefiner(Module):
    def __init__(self, in_channels: int, num_attention_heads: int, attention_head_dim: int,
                 num_layers: int, mlp_ratio: float = 4.0, attention_bias: bool = True):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            embedding_dim=hidden_size, pooled_projection_dim=in_channels
        )
        self.proj_in = Linear(in_channels, hidden_size, use_bias=True)
        self.token_refiner = HunyuanVideoIndividualTokenRefiner(
            num_attention_heads, attention_head_dim, num_layers, mlp_width_ratio=mlp_ratio,
            attention_bias=attention_bias,
        )

    def __call__(self, params: Params, hidden_states, timestep, attention_mask=None):
        if attention_mask is None:
            pooled = hidden_states.mean(axis=1)
        else:
            mask_f = attention_mask.astype(jnp.float32)[..., None]
            pooled = (hidden_states * mask_f).sum(axis=1) / mask_f.sum(axis=1)
            pooled = pooled.astype(hidden_states.dtype)

        temb = self.time_text_embed(params["time_text_embed"], timestep, pooled)
        hidden_states = self.proj_in(params["proj_in"], hidden_states)
        return self.token_refiner(params["token_refiner"], hidden_states, temb, attention_mask)


class HunyuanVideoSingleTransformerBlock(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int, mlp_ratio: float = 4.0,
                 qk_norm: str = "rms_norm"):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        self.mlp_dim = int(hidden_size * mlp_ratio)
        self.attn = HunyuanVideoAttention(
            query_dim=hidden_size, heads=num_attention_heads, dim_head=attention_head_dim,
            qk_norm=qk_norm, pre_only=True,
        )
        self.norm = AdaLayerNormZeroSingle(hidden_size)
        self.proj_mlp = Linear(hidden_size, self.mlp_dim)
        self.proj_out = Linear(hidden_size + self.mlp_dim, hidden_size)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 attention_mask=None, image_rotary_emb=None, token_replace_emb=None,
                 first_frame_num_tokens: int = 0):
        text_len = encoder_hidden_states.shape[1]
        hidden_states = jnp.concatenate([hidden_states, encoder_hidden_states], axis=1)
        residual = hidden_states

        if token_replace_emb is not None:
            norm_hidden, gate, tr_gate = _token_replace_norm_single(
                self.norm, params["norm"], hidden_states, temb, token_replace_emb, first_frame_num_tokens
            )
        else:
            norm_hidden, gate = self.norm(params["norm"], hidden_states, emb=temb)
            tr_gate = None
        mlp_hidden = jax.nn.gelu(self.proj_mlp(params["proj_mlp"], norm_hidden), approximate=True)

        attn_out, ctx_out = self.attn(
            params["attn"], norm_hidden[:, :-text_len], norm_hidden[:, -text_len:],
            attention_mask=attention_mask, image_rotary_emb=image_rotary_emb,
        )
        attn_output = jnp.concatenate([attn_out, ctx_out], axis=1)

        hidden_states = jnp.concatenate([attn_output, mlp_hidden], axis=2)
        proj = self.proj_out(params["proj_out"], hidden_states)
        if token_replace_emb is not None:
            first = tr_gate * proj[:, :first_frame_num_tokens]
            rest = gate[:, None] * proj[:, first_frame_num_tokens:]
            hidden_states = jnp.concatenate([first, rest], axis=1)
        else:
            hidden_states = gate[:, None] * proj
        hidden_states = hidden_states + residual
        return hidden_states[:, :-text_len], hidden_states[:, -text_len:]


def _token_replace_norm_single(norm: AdaLayerNormZeroSingle, params: Params, x, emb, tr_emb, n_first):
    """TokenReplace single-norm (reference :250): separate modulation for the
    first-frame tokens."""
    mod = norm.linear(params["linear"], jax.nn.silu(emb))
    tr_mod = norm.linear(params["linear"], jax.nn.silu(tr_emb))
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    tr_shift, tr_scale, tr_gate = jnp.split(tr_mod, 3, axis=-1)
    normed = norm.norm({}, x)
    first = normed[:, :n_first] * (1 + tr_scale[:, None]) + tr_shift[:, None]
    rest = normed[:, n_first:] * (1 + scale[:, None]) + shift[:, None]
    return jnp.concatenate([first, rest], axis=1), gate, tr_gate[:, None]


def _token_replace_norm_zero(norm: AdaLayerNormZero, params: Params, x, emb, tr_emb, n_first):
    """TokenReplace AdaLayerNormZero (reference :197)."""
    mod = norm.linear(params["linear"], jax.nn.silu(emb))
    tr_mod = norm.linear(params["linear"], jax.nn.silu(tr_emb))
    shift, scale, gate, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    trs = jnp.split(tr_mod, 6, axis=-1)
    normed = norm.norm({}, x)
    first = normed[:, :n_first] * (1 + trs[1][:, None]) + trs[0][:, None]
    rest = normed[:, n_first:] * (1 + scale[:, None]) + shift[:, None]
    x = jnp.concatenate([first, rest], axis=1)
    return x, gate, shift_mlp, scale_mlp, gate_mlp, trs[2], trs[3], trs[4], trs[5]


def _tr_blend(first_mod, rest_mod, n_first):
    def blend(x_update):
        return jnp.concatenate([first_mod * x_update[:, :n_first], rest_mod * x_update[:, n_first:]], axis=1)

    return blend


class HunyuanVideoTransformerBlock(Module):
    def __init__(self, num_attention_heads: int, attention_head_dim: int, mlp_ratio: float,
                 qk_norm: str = "rms_norm"):
        super().__init__()
        hidden_size = num_attention_heads * attention_head_dim
        self.norm1 = AdaLayerNormZero(hidden_size)
        self.norm1_context = AdaLayerNormZero(hidden_size)
        self.attn = HunyuanVideoAttention(
            query_dim=hidden_size, heads=num_attention_heads, dim_head=attention_head_dim,
            added_kv_proj_dim=hidden_size, qk_norm=qk_norm,
        )
        self.norm2 = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(hidden_size, mult=mlp_ratio, activation_fn="gelu-approximate")
        self.norm2_context = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.ff_context = FeedForward(hidden_size, mult=mlp_ratio, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 attention_mask=None, image_rotary_emb=None, token_replace_emb=None,
                 first_frame_num_tokens: int = 0):
        if token_replace_emb is not None:
            (norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp,
             tr_gate_msa, tr_shift_mlp, tr_scale_mlp, tr_gate_mlp) = _token_replace_norm_zero(
                self.norm1, params["norm1"], hidden_states, temb, token_replace_emb, first_frame_num_tokens
            )
        else:
            norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
                params["norm1"], hidden_states, emb=temb
            )
        norm_context, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
            params["norm1_context"], encoder_hidden_states, emb=temb
        )

        attn_output, context_attn_output = self.attn(
            params["attn"], norm_hidden, norm_context,
            attention_mask=attention_mask, image_rotary_emb=image_rotary_emb,
        )

        if token_replace_emb is not None:
            n = first_frame_num_tokens
            hidden_states = hidden_states + jnp.concatenate(
                [tr_gate_msa[:, None] * attn_output[:, :n], gate_msa[:, None] * attn_output[:, n:]], axis=1
            )
        else:
            hidden_states = hidden_states + attn_output * gate_msa[:, None]
        encoder_hidden_states = encoder_hidden_states + context_attn_output * c_gate_msa[:, None]

        norm_hidden = self.norm2({}, hidden_states)
        norm_context = self.norm2_context({}, encoder_hidden_states)
        if token_replace_emb is not None:
            n = first_frame_num_tokens
            norm_hidden = jnp.concatenate(
                [
                    norm_hidden[:, :n] * (1 + tr_scale_mlp[:, None]) + tr_shift_mlp[:, None],
                    norm_hidden[:, n:] * (1 + scale_mlp[:, None]) + shift_mlp[:, None],
                ],
                axis=1,
            )
        else:
            norm_hidden = norm_hidden * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_context = norm_context * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]

        ff_output = self.ff(params["ff"], norm_hidden)
        context_ff_output = self.ff_context(params["ff_context"], norm_context)
        if token_replace_emb is not None:
            n = first_frame_num_tokens
            hidden_states = hidden_states + jnp.concatenate(
                [tr_gate_mlp[:, None] * ff_output[:, :n], gate_mlp[:, None] * ff_output[:, n:]], axis=1
            )
        else:
            hidden_states = hidden_states + gate_mlp[:, None] * ff_output
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * context_ff_output
        return hidden_states, encoder_hidden_states


class HunyuanVideoPatchEmbed(Module):
    def __init__(self, patch_size: Tuple[int, int, int], in_chans: int, embed_dim: int):
        super().__init__()
        self.proj = Conv3d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        # NCDHW -> NDHWC conv -> [B, N, C]
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.proj(params["proj"], x)
        b = x.shape[0]
        return x.reshape(b, -1, x.shape[-1])


class HunyuanVideoTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        out_channels: int = 16,
        num_attention_heads: int = 24,
        attention_head_dim: int = 128,
        num_layers: int = 20,
        num_single_layers: int = 40,
        num_refiner_layers: int = 2,
        mlp_ratio: float = 4.0,
        patch_size: int = 2,
        patch_size_t: int = 1,
        qk_norm: str = "rms_norm",
        guidance_embeds: bool = True,
        text_embed_dim: int = 4096,
        pooled_projection_dim: int = 768,
        rope_theta: float = 256.0,
        rope_axes_dim: Tuple[int, ...] = (16, 56, 56),
        image_condition_type: Optional[str] = None,
    ):
        super().__init__()
        if image_condition_type not in (None, "latent_concat", "token_replace"):
            raise ValueError(f"invalid image_condition_type {image_condition_type}")
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels or in_channels

        self.x_embedder = HunyuanVideoPatchEmbed((patch_size_t, patch_size, patch_size), in_channels, inner_dim)
        self.context_embedder = HunyuanVideoTokenRefiner(
            text_embed_dim, num_attention_heads, attention_head_dim, num_layers=num_refiner_layers
        )
        self.time_text_embed = HunyuanVideoConditionEmbedding(
            inner_dim, pooled_projection_dim, guidance_embeds, image_condition_type
        )
        self.transformer_blocks = ModuleList(
            [
                HunyuanVideoTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
                for _ in range(num_layers)
            ]
        )
        self.single_transformer_blocks = ModuleList(
            [
                HunyuanVideoSingleTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
                for _ in range(num_single_layers)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, patch_size_t * patch_size * patch_size * self.out_channels)

    def rope(self, num_frames: int, height: int, width: int):
        """Host-side RoPE tables for the post-patchify token grid (reference
        HunyuanVideoRotaryPosEmbed, :478). Token order: T-major, then H, W."""
        sizes = [num_frames // self.config.patch_size_t,
                 height // self.config.patch_size,
                 width // self.config.patch_size]
        grid = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32) for s in sizes], indexing="ij"), axis=0)
        cos_out, sin_out = [], []
        for i in range(3):
            cos, sin = get_1d_rotary_pos_embed_np(
                self.config.rope_axes_dim[i], grid[i].reshape(-1), theta=self.config.rope_theta
            )
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S, text_embed_dim]
        encoder_attention_mask: jax.Array,  # [B, S]
        pooled_projections: jax.Array,  # [B, pooled_projection_dim]
        guidance: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size, _, num_frames, height, width = hidden_states.shape
        p, p_t = self.config.patch_size, self.config.patch_size_t
        post_f, post_h, post_w = num_frames // p_t, height // p, width // p
        first_frame_num_tokens = post_h * post_w

        if image_rotary_emb is None:
            cos, sin = self.rope(num_frames, height, width)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        temb, token_replace_emb = self.time_text_embed(
            params["time_text_embed"], timestep, pooled_projections, guidance
        )
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        encoder_hidden_states = self.context_embedder(
            params["context_embedder"], encoder_hidden_states, timestep, encoder_attention_mask
        )

        # (img‖txt) validity mask: all image tokens valid, text tokens up to
        # each sample's effective length (reference :1049-1062)
        img_len = hidden_states.shape[1]
        txt_len = encoder_hidden_states.shape[1]
        total = img_len + txt_len
        eff = img_len + encoder_attention_mask.astype(jnp.int32).sum(axis=1)
        idx = jnp.arange(total)[None, :]
        attention_mask = (idx < eff[:, None])[:, None, None, :]  # [B,1,1,N] bool

        for i, block in enumerate(self.transformer_blocks):
            hidden_states, encoder_hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                attention_mask, image_rotary_emb, token_replace_emb, first_frame_num_tokens,
            )
        for i, block in enumerate(self.single_transformer_blocks):
            hidden_states, encoder_hidden_states = block(
                params["single_transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                attention_mask, image_rotary_emb, token_replace_emb, first_frame_num_tokens,
            )

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        hidden_states = self.proj_out(params["proj_out"], hidden_states)

        hidden_states = hidden_states.reshape(batch_size, post_f, post_h, post_w, -1, p_t, p, p)
        hidden_states = jnp.transpose(hidden_states, (0, 4, 1, 5, 2, 6, 3, 7))
        hidden_states = hidden_states.reshape(
            batch_size, -1, post_f * p_t, post_h * p, post_w * p
        )

        if not return_dict:
            return (hidden_states,)
        return Transformer2DModelOutput(sample=hidden_states)

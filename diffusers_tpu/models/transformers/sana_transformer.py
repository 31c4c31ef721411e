"""Sana transformer (linear-attention DiT).

Functional mirror of the reference
(`/root/reference/src/diffusers/models/transformers/sana_transformer.py:335`
SanaTransformer2DModel; `attention_processor.py:5340`
SanaLinearAttnProcessor2_0). The self-attention is ReLU linear attention —
two [heads, d+1, N] matmuls, O(N) in tokens — which is exactly the regime
where the MXU shines at Sana's 32x-compressed high-resolution grids. Parameter
paths match the reference state dict (attn1.to_q/…/to_out.0, ff.conv_*,
scale_shift_table) so checkpoints convert mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention import Attention
from ..autoencoders.autoencoder_dc import GLUMBConv
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import AdaLayerNormSingle


@dataclass
class SanaTransformer2DModelOutput(BaseOutput):
    sample: jax.Array


class SanaLinearAttention(Module):
    """ReLU linear self-attention (reference SanaLinearAttnProcessor2_0)."""

    # PAG: trace-time identity-attention flag (reference
    # PAGIdentitySanaLinearAttnProcessor — output = to_out(to_v(x))).
    pag_identity: bool = False

    def __init__(self, dim: int, heads: int, dim_head: int, qk_norm: Optional[str] = None, bias: bool = False):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=bias)
        self.to_k = Linear(dim, inner, use_bias=bias)
        self.to_v = Linear(dim, inner, use_bias=bias)
        if qk_norm == "rms_norm":
            self.norm_q = RMSNorm(inner, eps=1e-5)
            self.norm_k = RMSNorm(inner, eps=1e-5)
        else:
            self.norm_q = self.norm_k = None
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        if self.pag_identity:
            out = self.to_v(params["to_v"], x)
            return self.to_out[0](params["to_out"][0], out)
        orig_dtype = x.dtype
        q = self.to_q(params["to_q"], x)
        k = self.to_k(params["to_k"], x)
        v = self.to_v(params["to_v"], x)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)

        # [B, N, h·d] → [B, h, d, N]
        def heads_first(t):
            return jnp.transpose(t.reshape(b, n, self.heads, self.dim_head), (0, 2, 3, 1))

        q = jax.nn.relu(heads_first(q)).astype(jnp.float32)
        k = jax.nn.relu(heads_first(k)).astype(jnp.float32)
        v = heads_first(v).astype(jnp.float32)

        v = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 0)), constant_values=1.0)  # [B,h,d+1,N]
        scores = v @ jnp.swapaxes(k, -1, -2)  # [B,h,d+1,d]
        out = scores @ q  # [B,h,d+1,N]
        out = out[:, :, :-1] / (out[:, :, -1:] + 1e-15)

        out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, self.heads * self.dim_head).astype(orig_dtype)
        return self.to_out[0](params["to_out"][0], out)


class SanaTransformerBlock(Module):
    def __init__(
        self,
        dim: int,
        num_attention_heads: int,
        attention_head_dim: int,
        num_cross_attention_heads: Optional[int] = 20,
        cross_attention_head_dim: Optional[int] = 112,
        cross_attention_dim: Optional[int] = 2240,
        attention_bias: bool = True,
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        attention_out_bias: bool = True,
        mlp_ratio: float = 2.5,
        qk_norm: Optional[str] = None,
    ):
        super().__init__()
        self.dim = dim
        self.norm1 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
        self.attn1 = SanaLinearAttention(dim, num_attention_heads, attention_head_dim,
                                         qk_norm=qk_norm, bias=attention_bias)
        if cross_attention_dim is not None:
            self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=norm_elementwise_affine,
                                   use_bias=norm_elementwise_affine)
            self.attn2 = Attention(
                query_dim=dim, cross_attention_dim=cross_attention_dim, heads=num_cross_attention_heads,
                dim_head=cross_attention_head_dim, bias=True, out_bias=attention_out_bias, qk_norm=qk_norm,
            )
        else:
            self.norm2 = None
            self.attn2 = None
        self.ff = GLUMBConv(dim, dim, mlp_ratio, norm_type=None, residual_connection=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale_shift_table"] = (
            jax.random.normal(jax.random.fold_in(key, 7), (6, self.dim), jnp.float32) / self.dim**0.5
        ).astype(dtype)
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, timestep_mod,
                 encoder_attention_mask=None, height: int = None, width: int = None):
        b = hidden_states.shape[0]
        mods = params["scale_shift_table"][None].astype(jnp.float32) + timestep_mod.reshape(b, 6, -1).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(hidden_states.dtype) for m in jnp.split(mods, 6, axis=1)
        ]

        norm_hidden = self.norm1({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_msa) + shift_msa
        attn_output = self.attn1(params["attn1"], norm_hidden)
        hidden_states = hidden_states + gate_msa * attn_output

        if self.attn2 is not None:
            attn_output = self.attn2(
                params["attn2"], hidden_states, encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
            )
            hidden_states = attn_output + hidden_states

        norm_hidden = self.norm2({}, hidden_states) if self.norm2 is not None else hidden_states
        norm_hidden = norm_hidden * (1 + scale_mlp) + shift_mlp
        # GLUMBConv is spatial: tokens → NHWC grid and back
        norm_hidden = norm_hidden.reshape(b, height, width, -1)
        ff_output = self.ff(params["ff"], norm_hidden).reshape(b, height * width, -1)
        hidden_states = hidden_states + gate_mlp * ff_output
        return hidden_states


class SanaCombinedTimestepGuidanceEmbeddings(Module):
    """Sana-Sprint guidance-conditioned time embedding (reference `:100`)."""

    def __init__(self, embedding_dim: int):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.guidance_condition_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.guidance_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.linear = Linear(embedding_dim, 6 * embedding_dim, use_bias=True)

    def __call__(self, params, timestep, guidance, dtype=jnp.float32):
        t_emb = self.timestep_embedder(params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype))
        g_emb = self.guidance_embedder(
            params["guidance_embedder"], self.guidance_condition_proj({}, guidance).astype(dtype)
        )
        conditioning = t_emb + g_emb
        return self.linear(params["linear"], jax.nn.silu(conditioning)), conditioning


class SanaTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 32,
        out_channels: Optional[int] = 32,
        num_attention_heads: int = 70,
        attention_head_dim: int = 32,
        num_layers: int = 20,
        num_cross_attention_heads: Optional[int] = 20,
        cross_attention_head_dim: Optional[int] = 112,
        cross_attention_dim: Optional[int] = 2240,
        caption_channels: int = 2304,
        mlp_ratio: float = 2.5,
        dropout: float = 0.0,
        attention_bias: bool = False,
        sample_size: int = 32,
        patch_size: int = 1,
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        interpolation_scale: Optional[int] = None,
        guidance_embeds: bool = False,
        guidance_embeds_scale: float = 0.1,
        qk_norm: Optional[str] = None,
        timestep_scale: float = 1.0,
    ):
        super().__init__()
        out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.patch_embed = PatchEmbed(
            height=sample_size, width=sample_size, patch_size=patch_size, in_channels=in_channels,
            embed_dim=self.inner_dim, interpolation_scale=interpolation_scale or 1,
            pos_embed_type="sincos" if interpolation_scale is not None else None,
        )
        if guidance_embeds:
            self.time_embed = SanaCombinedTimestepGuidanceEmbeddings(self.inner_dim)
        else:
            self.time_embed = AdaLayerNormSingle(self.inner_dim)

        self.caption_projection = PixArtAlphaTextProjection(in_features=caption_channels, hidden_size=self.inner_dim)
        self.caption_norm = RMSNorm(self.inner_dim, eps=1e-5)

        self.transformer_blocks = ModuleList(
            [
                SanaTransformerBlock(
                    self.inner_dim, num_attention_heads, attention_head_dim,
                    num_cross_attention_heads=num_cross_attention_heads,
                    cross_attention_head_dim=cross_attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    attention_bias=attention_bias,
                    norm_elementwise_affine=norm_elementwise_affine,
                    norm_eps=norm_eps, mlp_ratio=mlp_ratio, qk_norm=qk_norm,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(self.inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * out_channels)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale_shift_table"] = (
            jax.random.normal(jax.random.fold_in(key, 11), (2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        ).astype(dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, S, caption_channels]
        timestep: jax.Array,  # [B]
        guidance: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        controlnet_block_samples: Optional[tuple] = None,
        return_dict: bool = True,
    ):
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            encoder_attention_mask = ((1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        b, _, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p

        hidden = self.patch_embed(params["patch_embed"], hidden_states)

        if guidance is not None:
            timestep_mod, embedded_timestep = self.time_embed(
                params["time_embed"], timestep, guidance, dtype=hidden.dtype
            )
        else:
            timestep_mod, embedded_timestep = self.time_embed(
                params["time_embed"], timestep, batch_size=b, dtype=hidden.dtype
            )

        ehs = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        ehs = ehs.reshape(b, -1, hidden.shape[-1])
        ehs = self.caption_norm(params["caption_norm"], ehs)

        for i, block in enumerate(self.transformer_blocks):
            hidden = block(
                params["transformer_blocks"][i], hidden, ehs, timestep_mod,
                encoder_attention_mask=encoder_attention_mask, height=ph, width=pw,
            )
            # residual j lands after block j+1 — block 0 gets none
            # (reference sana_transformer.py:517)
            if controlnet_block_samples is not None and 0 < i <= len(controlnet_block_samples):
                hidden = hidden + controlnet_block_samples[i - 1]

        # modulated output norm (reference SanaModulatedNorm, `:85`)
        normed = self.norm_out({}, hidden)
        mods = params["scale_shift_table"][None].astype(jnp.float32) + embedded_timestep[:, None].astype(jnp.float32)
        shift, scale = [m.astype(hidden.dtype) for m in jnp.split(mods, 2, axis=1)]
        hidden = normed * (1 + scale) + shift
        hidden = self.proj_out(params["proj_out"], hidden)

        # unpatchify
        hidden = hidden.reshape(b, ph, pw, p, p, -1)
        hidden = jnp.transpose(hidden, (0, 5, 1, 3, 2, 4))
        output = hidden.reshape(b, -1, ph * p, pw * p)

        if not return_dict:
            return (output,)
        return SanaTransformer2DModelOutput(sample=output)

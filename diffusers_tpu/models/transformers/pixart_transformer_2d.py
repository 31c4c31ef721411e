"""PixArtTransformer2DModel (PixArt-Alpha / PixArt-Sigma DiT).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/pixart_transformer_2d.py`;
ada_norm_single block path in `models/attention.py:989-1046`,
AdaLayerNormSingle `models/normalization.py:235`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class PixArtAlphaCombinedTimestepSizeEmbeddings(Module):
    def __init__(self, embedding_dim: int, size_emb_dim: int, use_additional_conditions: bool = False):
        super().__init__()
        self.outdim = size_emb_dim
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)
        self.use_additional_conditions = use_additional_conditions
        if use_additional_conditions:
            self.additional_condition_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
            self.resolution_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=size_emb_dim)
            self.aspect_ratio_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=size_emb_dim)

    def __call__(self, params, timestep, resolution=None, aspect_ratio=None, batch_size=None, dtype=jnp.float32):
        t_proj = self.time_proj({}, timestep).astype(dtype)
        emb = self.timestep_embedder(params["timestep_embedder"], t_proj)
        if self.use_additional_conditions:
            res_emb = self.additional_condition_proj({}, resolution.reshape(-1)).astype(dtype)
            res_emb = self.resolution_embedder(params["resolution_embedder"], res_emb).reshape(batch_size, -1)
            ar_emb = self.additional_condition_proj({}, aspect_ratio.reshape(-1)).astype(dtype)
            ar_emb = self.aspect_ratio_embedder(params["aspect_ratio_embedder"], ar_emb).reshape(batch_size, -1)
            emb = emb + jnp.concatenate([res_emb, ar_emb], axis=1)
        return emb


class AdaLayerNormSingle(Module):
    def __init__(self, embedding_dim: int, use_additional_conditions: bool = False):
        super().__init__()
        self.emb = PixArtAlphaCombinedTimestepSizeEmbeddings(
            embedding_dim, size_emb_dim=embedding_dim // 3, use_additional_conditions=use_additional_conditions
        )
        self.linear = Linear(embedding_dim, 6 * embedding_dim, use_bias=True)

    def __call__(self, params, timestep, added_cond_kwargs=None, batch_size=None, dtype=jnp.float32):
        added = added_cond_kwargs or {"resolution": None, "aspect_ratio": None}
        embedded_timestep = self.emb(params["emb"], timestep, batch_size=batch_size, dtype=dtype, **added)
        return self.linear(params["linear"], jax.nn.silu(embedded_timestep)), embedded_timestep


class PixArtTransformerBlock(Module):
    """BasicTransformerBlock with norm_type='ada_norm_single'."""

    def __init__(self, dim, num_attention_heads, attention_head_dim, cross_attention_dim,
                 activation_fn="gelu-approximate", attention_bias=True, norm_eps=1e-6):
        super().__init__()
        self.dim = dim
        self.norm1 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
        self.attn1 = Attention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim, bias=attention_bias
        )
        # cross_attention_dim=None → self-attention-only block (Latte temporal)
        self.attn2 = None
        if cross_attention_dim is not None:
            self.attn2 = Attention(
                query_dim=dim, cross_attention_dim=cross_attention_dim, heads=num_attention_heads,
                dim_head=attention_head_dim, bias=attention_bias,
            )
        self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim, activation_fn=activation_fn)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 5)
        params["scale_shift_table"] = jax.random.normal(k, (6, self.dim), jnp.float32) / self.dim**0.5
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, timestep_mod, encoder_attention_mask=None):
        b = hidden_states.shape[0]
        mods = params["scale_shift_table"][None].astype(jnp.float32) + timestep_mod.reshape(b, 6, -1).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m.astype(hidden_states.dtype) for m in jnp.split(mods, 6, axis=1)
        ]
        norm_hidden = self.norm1({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_msa) + shift_msa
        attn_output = self.attn1(params["attn1"], norm_hidden)
        hidden_states = gate_msa * attn_output + hidden_states

        if self.attn2 is not None:
            attn_output = self.attn2(
                params["attn2"], hidden_states, encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
            )
            hidden_states = attn_output + hidden_states

        norm_hidden = self.norm2({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_mlp) + shift_mlp
        ff_output = self.ff(params["ff"], norm_hidden)
        return gate_mlp * ff_output + hidden_states


class PixArtTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 72,
        in_channels: int = 4,
        out_channels: Optional[int] = 8,
        num_layers: int = 28,
        dropout: float = 0.0,
        norm_num_groups: int = 32,
        cross_attention_dim: Optional[int] = 1152,
        attention_bias: bool = True,
        sample_size: int = 128,
        patch_size: int = 2,
        activation_fn: str = "gelu-approximate",
        num_embeds_ada_norm: Optional[int] = 1000,
        upcast_attention: bool = False,
        norm_type: str = "ada_norm_single",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        interpolation_scale: Optional[int] = None,
        use_additional_conditions: Optional[bool] = None,
        caption_channels: Optional[int] = None,
        attention_type: Optional[str] = "default",
    ):
        super().__init__()
        if norm_type != "ada_norm_single":
            raise NotImplementedError("PixArt requires norm_type 'ada_norm_single'")
        self.inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = in_channels if out_channels is None else out_channels
        if use_additional_conditions is None:
            use_additional_conditions = sample_size == 128
        self.use_additional_conditions = use_additional_conditions

        interpolation_scale = interpolation_scale if interpolation_scale is not None else max(sample_size // 64, 1)
        self.pos_embed = PatchEmbed(
            height=sample_size,
            width=sample_size,
            patch_size=patch_size,
            in_channels=in_channels,
            embed_dim=self.inner_dim,
            interpolation_scale=interpolation_scale,
        )
        self.transformer_blocks = ModuleList(
            [
                PixArtTransformerBlock(
                    self.inner_dim, num_attention_heads, attention_head_dim, cross_attention_dim,
                    activation_fn=activation_fn, attention_bias=attention_bias, norm_eps=norm_eps,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(self.inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels)
        self.adaln_single = AdaLayerNormSingle(self.inner_dim, use_additional_conditions=use_additional_conditions)
        self.caption_projection = (
            PixArtAlphaTextProjection(caption_channels, self.inner_dim) if caption_channels is not None else None
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 9)
        params["scale_shift_table"] = jax.random.normal(k, (2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        added_cond_kwargs: Optional[Dict[str, jax.Array]] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if self.use_additional_conditions and added_cond_kwargs is None:
            raise ValueError("added_cond_kwargs required when use_additional_conditions")
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            encoder_attention_mask = ((1 - encoder_attention_mask.astype(hidden_states.dtype)) * -10000.0)[:, None, None, :]

        b = hidden_states.shape[0]
        p = self.config.patch_size
        h, w = hidden_states.shape[-2] // p, hidden_states.shape[-1] // p

        x = self.pos_embed(params["pos_embed"], hidden_states)  # [B, N, D]
        timestep_mod, embedded_timestep = self.adaln_single(
            params["adaln_single"], timestep, added_cond_kwargs, batch_size=b, dtype=x.dtype
        )
        if self.caption_projection is not None:
            encoder_hidden_states = self.caption_projection(params["caption_projection"], encoder_hidden_states)
            encoder_hidden_states = encoder_hidden_states.reshape(b, -1, x.shape[-1])

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, encoder_hidden_states, timestep_mod, encoder_attention_mask)

        mods = params["scale_shift_table"][None].astype(jnp.float32) + embedded_timestep[:, None].astype(jnp.float32)
        shift, scale = [m.astype(x.dtype) for m in jnp.split(mods, 2, axis=1)]
        x = self.norm_out({}, x)
        x = x * (1 + scale) + shift
        x = self.proj_out(params["proj_out"], x)

        # unpatchify
        x = x.reshape(b, h, w, p, p, self.out_channels)
        x = jnp.einsum("bhwpqc->bchpwq", x)
        output = x.reshape(b, self.out_channels, h * p, w * p)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

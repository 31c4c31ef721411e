"""LongCatImageTransformer2DModel — LongCat-Image dual/single-stream DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_longcat_image.py:395`):
Flux-architecture blocks (AdaLayerNormZero dual stream `:269`, fused
single-stream `:215`, joint attention with text tokens leading — identical
computation and submodule names to Flux, reused from `transformer_flux`),
but conditioning is timestep-only (`:381` — no pooled projection, no
guidance embedding; `time_embed.timestep_embedder`), and the 3-axis rope ids
carry a modality channel (text diag / image grid, built by the pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_flux import FluxSingleTransformerBlock, FluxTransformerBlock


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class LongCatImageTimestepEmbeddings(Module):
    def __init__(self, embedding_dim: int):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        return self.timestep_embedder(
            params["timestep_embedder"], self.time_proj({}, timestep).astype(dtype))


class LongCatImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 64,
        num_layers: int = 19,
        num_single_layers: int = 38,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 3584,
        pooled_projection_dim: int = 3584,
        axes_dims_rope: Tuple[int, ...] = (16, 56, 56),
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = in_channels
        self.axes_dims_rope = tuple(axes_dims_rope)

        self.time_embed = LongCatImageTimestepEmbeddings(inner_dim)
        self.context_embedder = Linear(joint_attention_dim, inner_dim)
        self.x_embedder = Linear(in_channels, inner_dim)
        self.transformer_blocks = ModuleList(
            [FluxTransformerBlock(inner_dim, num_attention_heads, attention_head_dim)
             for _ in range(num_layers)])
        self.single_transformer_blocks = ModuleList(
            [FluxSingleTransformerBlock(inner_dim, num_attention_heads, attention_head_dim)
             for _ in range(num_single_layers)])
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * self.out_channels, use_bias=True)

    def pos_embed(self, params, ids: np.ndarray):
        """Host-side rope tables over (modality, row, col) ids (reference `:353`)."""
        cos_out, sin_out = [], []
        for i, d in enumerate(self.axes_dims_rope):
            cos, sin = get_1d_rotary_pos_embed_np(d, np.asarray(ids)[:, i], theta=10000.0)
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, S_img, in_channels] packed latents
        encoder_hidden_states: jax.Array,  # [B, S_txt, joint_attention_dim]
        timestep: jax.Array,  # [B] in [0, 1]
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        img_ids: Optional[np.ndarray] = None,
        txt_ids: Optional[np.ndarray] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        temb = self.time_embed(params["time_embed"], timestep.astype(jnp.float32) * 1000.0,
                               hidden_states.dtype)
        encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if image_rotary_emb is None:
            ids = np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)], axis=0)
            cos, sin = self.pos_embed({}, ids)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        for i, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                image_rotary_emb)
        for i, block in enumerate(self.single_transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["single_transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                image_rotary_emb)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        output = self.proj_out(params["proj_out"], hidden_states)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

"""DiTTransformer2DModel — class-conditional patch DiT (Peebles & Xie).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/dit_transformer_2d.py:27`
DiTTransformer2DModel; its BasicTransformerBlock runs with
norm_type='ada_norm_zero' where every block owns a
CombinedTimestepLabelEmbeddings — checkpoint layout preserved here).

TPU-first: patch tokens [B, N, D] through an MXU-friendly matmul chain; the
per-block label/timestep embeddings are tiny MLPs that XLA dedups across the
unrolled blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import CombinedTimestepLabelEmbeddings, PatchEmbed
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class DiTAdaLayerNormZero(Module):
    """AdaLayerNormZero with an internal (timestep, class) embedder — the
    torch AdaLayerNormZero(dim, num_embeds_ada_norm) layout."""

    def __init__(self, embedding_dim: int, num_embeds_ada_norm: int):
        super().__init__()
        self.emb = CombinedTimestepLabelEmbeddings(num_embeds_ada_norm, embedding_dim)
        self.linear = Linear(embedding_dim, 6 * embedding_dim, use_bias=True)
        self.norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, timestep: jax.Array, class_labels: jax.Array):
        emb = self.emb(params["emb"], timestep, class_labels, dtype=x.dtype)
        mod = self.linear(params["linear"], jax.nn.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
        x = self.norm({}, x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp, emb


class DiTTransformerBlock(Module):
    """BasicTransformerBlock, ada_norm_zero flavor, self-attention only."""

    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 num_embeds_ada_norm: int, activation_fn: str = "gelu-approximate",
                 attention_bias: bool = True, norm_eps: float = 1e-5):
        super().__init__()
        self.norm1 = DiTAdaLayerNormZero(dim, num_embeds_ada_norm)
        self.attn1 = Attention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim, bias=attention_bias
        )
        self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim=dim, activation_fn=activation_fn)

    def __call__(self, params: Params, hidden_states: jax.Array, timestep: jax.Array,
                 class_labels: jax.Array) -> jax.Array:
        norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp, _ = self.norm1(
            params["norm1"], hidden_states, timestep, class_labels
        )
        attn_output = self.attn1(params["attn1"], norm_hidden)
        hidden_states = hidden_states + gate_msa[:, None] * attn_output
        norm_hidden = self.norm2({}, hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_hidden)
        return hidden_states


class DiTTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 72,
        in_channels: int = 4,
        out_channels: Optional[int] = None,
        num_layers: int = 28,
        dropout: float = 0.0,
        norm_num_groups: int = 32,
        attention_bias: bool = True,
        sample_size: int = 32,
        patch_size: int = 2,
        activation_fn: str = "gelu-approximate",
        num_embeds_ada_norm: Optional[int] = 1000,
        upcast_attention: bool = False,
        norm_type: str = "ada_norm_zero",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-5,
    ):
        super().__init__()
        if norm_type != "ada_norm_zero" or num_embeds_ada_norm is None:
            raise NotImplementedError("DiT requires norm_type='ada_norm_zero' with num_embeds_ada_norm")
        self.inner_dim = num_attention_heads * attention_head_dim
        self.out_channels = in_channels if out_channels is None else out_channels

        self.pos_embed = PatchEmbed(
            height=sample_size, width=sample_size, patch_size=patch_size,
            in_channels=in_channels, embed_dim=self.inner_dim,
        )
        self.transformer_blocks = ModuleList(
            [
                DiTTransformerBlock(
                    self.inner_dim, num_attention_heads, attention_head_dim,
                    num_embeds_ada_norm=num_embeds_ada_norm, activation_fn=activation_fn,
                    attention_bias=attention_bias, norm_eps=norm_eps,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(self.inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out_1 = Linear(self.inner_dim, 2 * self.inner_dim)
        self.proj_out_2 = Linear(self.inner_dim, patch_size * patch_size * self.out_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,  # [B]
        class_labels: jax.Array,  # [B] int
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        height, width = hidden_states.shape[-2], hidden_states.shape[-1]
        p = self.config.patch_size
        hidden_states = self.pos_embed(params["pos_embed"], hidden_states)

        for i, block in enumerate(self.transformer_blocks):
            hidden_states = block(params["transformer_blocks"][i], hidden_states, timestep, class_labels)

        # final AdaLN modulation reuses block 0's embedder (reference :229-236)
        conditioning = self.transformer_blocks[0].norm1.emb(
            params["transformer_blocks"][0]["norm1"]["emb"], timestep, class_labels, dtype=hidden_states.dtype
        )
        shift, scale = jnp.split(self.proj_out_1(params["proj_out_1"], jax.nn.silu(conditioning)), 2, axis=-1)
        hidden_states = self.norm_out({}, hidden_states) * (1 + scale[:, None]) + shift[:, None]
        hidden_states = self.proj_out_2(params["proj_out_2"], hidden_states)

        h, w = height // p, width // p
        hidden_states = hidden_states.reshape(hidden_states.shape[0], h, w, p, p, self.out_channels)
        hidden_states = jnp.einsum("bhwpqc->bchpwq", hidden_states)
        output = hidden_states.reshape(hidden_states.shape[0], self.out_channels, h * p, w * p)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

"""Transformer2DModel — the spatial transformer wrapper used inside
cross-attention UNet blocks.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_2d.py`,
continuous-input path): GroupNorm → proj_in → N×BasicTransformerBlock →
proj_out + residual. On NHWC activations; proj_in/out are 1x1 convs or
linears depending on `use_linear_projection` (both reduce to a matmul over
the channel axis in NHWC, so we always use the linear form internally and
load conv [O,I,1,1] weights by squeezing).
The vectorized-input path (VQ-Diffusion: `num_vector_embeds` token maps
with timestep-lookup AdaLN blocks and a log-softmax head over the codebook,
reference `:212` _init_vectorized_inputs) is selected by passing
`num_vector_embeds` + `sample_size`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Embedding, GroupNorm, LayerNorm, Linear, Module, ModuleList, Params
from ..attention_blocks import BasicTransformerBlock
from ..modeling_utils import ModelMixin


class ImagePositionalEmbeddings(Module):
    """Latent-token embedding + additive height/width position tables
    (reference embeddings.py:1387, DALL-E figure 10)."""

    def __init__(self, num_embed: int, height: int, width: int, embed_dim: int):
        super().__init__()
        self.height, self.width = height, width
        self.emb = Embedding(num_embed, embed_dim)
        self.height_emb = Embedding(height, embed_dim)
        self.width_emb = Embedding(width, embed_dim)

    def __call__(self, params: Params, index: jax.Array) -> jax.Array:
        emb = self.emb(params["emb"], index)  # [B, L, D]
        h = self.height_emb(params["height_emb"], jnp.arange(self.height))[:, None, :]
        w = self.width_emb(params["width_emb"], jnp.arange(self.width))[None, :, :]
        pos = (h + w).reshape(1, self.height * self.width, -1)
        return emb + pos[:, : emb.shape[1], :]


class Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        num_layers: int = 1,
        norm_num_groups: int = 32,
        cross_attention_dim: Optional[int] = None,
        attention_bias: bool = False,
        activation_fn: str = "geglu",
        only_cross_attention: bool = False,
        double_self_attention: bool = False,
        use_linear_projection: bool = False,
        norm_elementwise_affine: bool = True,
        norm_eps: float = 1e-5,
        num_vector_embeds: Optional[int] = None,
        sample_size: Optional[int] = None,
        num_embeds_ada_norm: Optional[int] = None,
        norm_type: str = "layer_norm",
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels
        self.use_linear_projection = use_linear_projection
        self.is_input_vectorized = num_vector_embeds is not None
        self.num_vector_embeds = num_vector_embeds

        if self.is_input_vectorized:
            # VQ-Diffusion token-map path (reference `:212`)
            self.height = self.width = sample_size
            self.num_latent_pixels = self.height * self.width
            self.latent_image_embedding = ImagePositionalEmbeddings(
                num_embed=num_vector_embeds, embed_dim=inner_dim,
                height=self.height, width=self.width,
            )
            self.norm_out = LayerNorm(inner_dim)
            self.out = Linear(inner_dim, num_vector_embeds - 1)
        else:
            self.norm = GroupNorm(num_groups=norm_num_groups, num_channels=in_channels, eps=1e-6)
            if use_linear_projection:
                self.proj_in = Linear(in_channels, inner_dim)
                self.proj_out = Linear(inner_dim, in_channels)
            else:
                self.proj_in = Conv2d(in_channels, inner_dim, kernel_size=1, stride=1, padding=0)
                self.proj_out = Conv2d(inner_dim, in_channels, kernel_size=1, stride=1, padding=0)

        self.transformer_blocks = ModuleList(
            [
                BasicTransformerBlock(
                    inner_dim,
                    num_attention_heads,
                    attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    activation_fn=activation_fn,
                    attention_bias=attention_bias,
                    only_cross_attention=only_cross_attention,
                    double_self_attention=double_self_attention,
                    norm_elementwise_affine=norm_elementwise_affine,
                    norm_eps=norm_eps,
                    norm_type=norm_type if not self.is_input_vectorized else "ada_norm",
                    num_embeds_ada_norm=num_embeds_ada_norm,
                )
                for _ in range(num_layers)
            ]
        )

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # NHWC
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,
    ) -> jax.Array:
        if self.is_input_vectorized:
            # token ids [B, L] -> log p(x_0) [B, codebook-1, L] (reference
            # `:448,514`); fp32 log-softmax is the numerics-critical op
            hidden = self.latent_image_embedding(params["latent_image_embedding"], hidden_states)
            for i, block in enumerate(self.transformer_blocks):
                hidden = block(
                    params["transformer_blocks"][i], hidden,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    encoder_attention_mask=encoder_attention_mask,
                    timestep=timestep,
                )
            hidden = self.norm_out(params["norm_out"], hidden)
            logits = self.out(params["out"], hidden)
            logits = jnp.transpose(logits, (0, 2, 1))
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)

        b, h, w, c = hidden_states.shape
        residual = hidden_states
        hidden_states = self.norm(params["norm"], hidden_states)

        if self.use_linear_projection:
            hidden_states = hidden_states.reshape(b, h * w, c)
            hidden_states = self.proj_in(params["proj_in"], hidden_states)
        else:
            hidden_states = self.proj_in(params["proj_in"], hidden_states)
            hidden_states = hidden_states.reshape(b, h * w, hidden_states.shape[-1])

        for i, block in enumerate(self.transformer_blocks):
            hidden_states = block(
                params["transformer_blocks"][i],
                hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )

        if self.use_linear_projection:
            hidden_states = self.proj_out(params["proj_out"], hidden_states)
            hidden_states = hidden_states.reshape(b, h, w, c)
        else:
            hidden_states = hidden_states.reshape(b, h, w, hidden_states.shape[-1])
            hidden_states = self.proj_out(params["proj_out"], hidden_states)

        return hidden_states + residual

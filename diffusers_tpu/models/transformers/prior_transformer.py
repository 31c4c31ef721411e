"""PriorTransformer — the unCLIP/Kandinsky diffusion prior over CLIP image
embeddings.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/prior_transformer.py:33`
(forward `:200-318`): the token sequence is
[text tokens, proj embedding, time embedding, current image embedding, prd]
with learned positional embeddings and a causal attention mask combined with
the (padded) text mask; output reads the prd token.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import BasicTransformerBlock
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class PriorTransformerOutput(BaseOutput):
    predicted_image_embedding: jax.Array


class PriorTransformer(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 32,
        attention_head_dim: int = 64,
        num_layers: int = 20,
        embedding_dim: int = 768,
        num_embeddings: int = 77,
        additional_embeddings: int = 4,
        dropout: float = 0.0,
        time_embed_act_fn: str = "silu",
        norm_in_type: Optional[str] = None,
        embedding_proj_norm_type: Optional[str] = None,
        encoder_hid_proj_type: Optional[str] = "linear",
        added_emb_type: Optional[str] = "prd",
        time_embed_dim: Optional[int] = None,
        embedding_proj_dim: Optional[int] = None,
        clip_embed_dim: Optional[int] = None,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        time_embed_dim = time_embed_dim or inner_dim
        embedding_proj_dim = embedding_proj_dim or embedding_dim
        clip_embed_dim = clip_embed_dim or embedding_dim
        self.clip_embed_dim = clip_embed_dim

        self.time_proj = Timesteps(inner_dim, True, 0)
        self.time_embedding = TimestepEmbedding(inner_dim, time_embed_dim, out_dim=inner_dim,
                                                act_fn=time_embed_act_fn)
        self.proj_in = Linear(embedding_dim, inner_dim)
        self.embedding_proj_norm = (
            LayerNorm(embedding_proj_dim) if embedding_proj_norm_type == "layer" else None
        )
        self.embedding_proj = Linear(embedding_proj_dim, inner_dim)
        self.encoder_hidden_states_proj = (
            Linear(embedding_dim, inner_dim) if encoder_hid_proj_type == "linear" else None
        )
        self.has_prd = added_emb_type == "prd"
        self.transformer_blocks = ModuleList(
            [
                BasicTransformerBlock(
                    inner_dim, num_attention_heads, attention_head_dim,
                    activation_fn="gelu", attention_bias=True,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_in = LayerNorm(inner_dim) if norm_in_type == "layer" else None
        self.norm_out = LayerNorm(inner_dim)
        self.proj_to_clip_embeddings = Linear(inner_dim, clip_embed_dim)

        n_tok = num_embeddings + additional_embeddings
        causal = np.triu(np.full((n_tok, n_tok), -10000.0, np.float32), k=1)
        self._causal_attention_mask = causal[None]

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        n_tok = self.config.num_embeddings + self.config.additional_embeddings
        params["positional_embedding"] = jnp.zeros((1, n_tok, self.inner_dim), dtype)
        if self.has_prd:
            params["prd_embedding"] = jnp.zeros((1, 1, self.inner_dim), dtype)
        params["clip_mean"] = jnp.zeros((1, self.clip_embed_dim), dtype)
        params["clip_std"] = jnp.zeros((1, self.clip_embed_dim), dtype)
        return params

    def post_process_latents(self, params: Params, prior_latents: jax.Array) -> jax.Array:
        return prior_latents * params["clip_std"] + params["clip_mean"]

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, embedding_dim]
        timestep: Union[jax.Array, float, int],
        proj_embedding: jax.Array,  # [B, embedding_dim]
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        batch_size = hidden_states.shape[0]
        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (batch_size,))
        t_proj = self.time_proj({}, timesteps).astype(hidden_states.dtype)
        time_embeddings = self.time_embedding(params["time_embedding"], t_proj)

        if self.embedding_proj_norm is not None:
            proj_embedding = self.embedding_proj_norm(params["embedding_proj_norm"], proj_embedding)
        proj_embeddings = self.embedding_proj(params["embedding_proj"], proj_embedding)
        if self.encoder_hidden_states_proj is not None and encoder_hidden_states is not None:
            encoder_hidden_states = self.encoder_hidden_states_proj(
                params["encoder_hidden_states_proj"], encoder_hidden_states
            )

        h = self.proj_in(params["proj_in"], hidden_states)
        pos = params["positional_embedding"].astype(h.dtype)

        additional = []
        additional_len = 0
        if encoder_hidden_states is not None:
            additional.append(encoder_hidden_states)
            additional_len += encoder_hidden_states.shape[1]
        if proj_embeddings.ndim == 2:
            proj_embeddings = proj_embeddings[:, None, :]
        if h.ndim == 2:
            h = h[:, None, :]
        additional += [proj_embeddings, time_embeddings[:, None, :], h]
        if self.has_prd:
            prd = jnp.broadcast_to(params["prd_embedding"].astype(h.dtype), (batch_size, 1, self.inner_dim))
            additional.append(prd)
        tokens = jnp.concatenate(additional, axis=1)

        additional_len = additional_len + proj_embeddings.shape[1] + 1
        if pos.shape[1] < tokens.shape[1]:
            pos = jnp.pad(pos, ((0, 0), (additional_len, 1 if self.has_prd else 0), (0, 0)))
        tokens = tokens + pos[:, : tokens.shape[1]]

        bias = None
        if attention_mask is not None:
            mask = (1 - attention_mask.astype(jnp.float32)) * -10000.0
            mask = jnp.pad(mask, ((0, 0), (0, self.config.additional_embeddings)))
            bias = mask[:, None, :] + jnp.asarray(self._causal_attention_mask)
            bias = bias[:, None]  # [B, 1, S, S] additive broadcast over heads

        if self.norm_in is not None:
            tokens = self.norm_in(params["norm_in"], tokens)

        for i, block in enumerate(self.transformer_blocks):
            tokens = block(params["transformer_blocks"][i], tokens, attention_mask=bias)

        tokens = self.norm_out(params["norm_out"], tokens)
        if self.has_prd:
            out = tokens[:, -1]
        else:
            out = tokens[:, additional_len:]
        predicted = self.proj_to_clip_embeddings(params["proj_to_clip_embeddings"], out)

        if not return_dict:
            return (predicted,)
        return PriorTransformerOutput(predicted_image_embedding=predicted)

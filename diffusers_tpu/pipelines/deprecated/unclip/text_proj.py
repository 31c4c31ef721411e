"""UnCLIPTextProjModel (reference
`/root/reference/src/diffusers/pipelines/deprecated/unclip/text_proj.py:21`):
combines the prior's CLIP image embedding with the text tower — projected
into additive time embeddings plus `clip_extra_context_tokens` prepended to
the (re-projected, LayerNormed) text hidden states."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....configuration_utils import ConfigMixin, register_to_config
from ....models.modeling_utils import ModelMixin
from ....ops.module import LayerNorm, Linear, Module, Params


class UnCLIPTextProjModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        clip_extra_context_tokens: int = 4,
        clip_embeddings_dim: int = 768,
        time_embed_dim: int = 1536,
        cross_attention_dim: int = 2048,
    ):
        super().__init__()
        self.clip_extra_context_tokens = clip_extra_context_tokens
        self.embedding_proj = Linear(clip_embeddings_dim, time_embed_dim)
        self.clip_image_embeddings_project_to_time_embeddings = Linear(clip_embeddings_dim, time_embed_dim)
        self.clip_extra_context_tokens_proj = Linear(
            clip_embeddings_dim, clip_extra_context_tokens * cross_attention_dim)
        self.encoder_hidden_states_proj = Linear(clip_embeddings_dim, cross_attention_dim)
        self.text_encoder_hidden_states_norm = LayerNorm(cross_attention_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["learned_classifier_free_guidance_embeddings"] = jnp.zeros(
            (self.config.clip_embeddings_dim,), dtype)
        return params

    def __call__(self, params: Params, *, image_embeddings, prompt_embeds,
                 text_encoder_hidden_states, do_classifier_free_guidance: bool):
        if do_classifier_free_guidance:
            uncond = jnp.broadcast_to(
                params["learned_classifier_free_guidance_embeddings"][None],
                image_embeddings.shape)
            image_embeddings = jnp.concatenate([uncond, image_embeddings], axis=0)
        batch_size = prompt_embeds.shape[0]

        additive = (self.clip_image_embeddings_project_to_time_embeddings(
            params["clip_image_embeddings_project_to_time_embeddings"], image_embeddings)
            + self.embedding_proj(params["embedding_proj"], prompt_embeds))

        extra = self.clip_extra_context_tokens_proj(
            params["clip_extra_context_tokens_proj"], image_embeddings)
        extra = extra.reshape(batch_size, -1, self.clip_extra_context_tokens)
        extra = jnp.transpose(extra, (0, 2, 1))

        hs = self.encoder_hidden_states_proj(params["encoder_hidden_states_proj"],
                                             text_encoder_hidden_states)
        hs = self.text_encoder_hidden_states_norm(params["text_encoder_hidden_states_norm"], hs)
        return jnp.concatenate([extra, hs], axis=1), additive

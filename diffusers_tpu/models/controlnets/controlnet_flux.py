"""FluxControlNetModel — ControlNet for the Flux.1 rectified-flow DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_flux.py:45`
FluxControlNetModel; union mode `:255`, input_hint_block `:210`,
FluxMultiControlNetModel `:330`).

TPU-first: reuses the JAX FluxTransformerBlock / FluxSingleTransformerBlock
from transformer_flux.py; the zero-init 1x1 "controlnet blocks" are plain
Linears over the packed [B, S, D] token stream (pure MXU work); the whole
model runs inside the pipeline's scanned denoise loop as one jitted graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import (
    CombinedTimestepGuidanceTextProjEmbeddings,
    CombinedTimestepTextProjEmbeddings,
    FluxPosEmbed,
)
from ..modeling_utils import ModelMixin
from ..transformers.transformer_flux import FluxSingleTransformerBlock, FluxTransformerBlock
from .controlnet import ControlNetConditioningEmbedding


@dataclass
class FluxControlNetOutput(BaseOutput):
    controlnet_block_samples: Optional[Tuple[jax.Array, ...]]
    controlnet_single_block_samples: Optional[Tuple[jax.Array, ...]]


def _zero_tree(params: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, params)


class FluxControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 64,
        num_layers: int = 19,
        num_single_layers: int = 38,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 4096,
        pooled_projection_dim: int = 768,
        guidance_embeds: bool = False,
        axes_dims_rope: Tuple[int, ...] = (16, 56, 56),
        num_mode: Optional[int] = None,
        conditioning_embedding_channels: Optional[int] = None,
    ):
        super().__init__()
        self.out_channels = in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.pos_embed = FluxPosEmbed(theta=10000, axes_dim=axes_dims_rope)
        if guidance_embeds:
            self.time_text_embed = CombinedTimestepGuidanceTextProjEmbeddings(
                embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
            )
        else:
            self.time_text_embed = CombinedTimestepTextProjEmbeddings(
                embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
            )
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim)
        self.x_embedder = Linear(in_channels, self.inner_dim)

        self.transformer_blocks = ModuleList(
            [FluxTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim) for _ in range(num_layers)]
        )
        self.single_transformer_blocks = ModuleList(
            [
                FluxSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_single_layers)
            ]
        )

        # zero-init residual projections (reference zero_module, controlnet_flux.py:103-109)
        self.controlnet_blocks = ModuleList([Linear(self.inner_dim, self.inner_dim) for _ in range(num_layers)])
        self.controlnet_single_blocks = ModuleList(
            [Linear(self.inner_dim, self.inner_dim) for _ in range(num_single_layers)]
        )

        self.union = num_mode is not None
        if self.union:
            self.controlnet_mode_embedder = Embedding(num_mode, self.inner_dim)

        if conditioning_embedding_channels is not None:
            self.input_hint_block = ControlNetConditioningEmbedding(
                conditioning_embedding_channels=conditioning_embedding_channels,
                block_out_channels=(16, 16, 16, 16),
            )
        else:
            self.input_hint_block = None
        self.controlnet_x_embedder = Linear(in_channels, self.inner_dim)

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype=dtype)
        # zero-init the residual paths so an untrained ControlNet is a no-op
        for name in ("controlnet_blocks", "controlnet_single_blocks"):
            params[name] = _zero_tree(params[name])
        if self.input_hint_block is None:
            params["controlnet_x_embedder"] = _zero_tree(params["controlnet_x_embedder"])
        return params

    @classmethod
    def from_transformer(cls, transformer, transformer_params: Params, num_layers: int = 4,
                         num_single_layers: int = 10, attention_head_dim: int = 128,
                         num_attention_heads: int = 24, load_weights_from_transformer: bool = True,
                         key: Optional[jax.Array] = None):
        """Build a ControlNet from a FluxTransformer2DModel, grafting the prefix
        of its blocks (reference controlnet_flux.py:126)."""
        config = dict(transformer.config)
        config.pop("out_channels", None)
        config["num_layers"] = num_layers
        config["num_single_layers"] = num_single_layers
        config["attention_head_dim"] = attention_head_dim
        config["num_attention_heads"] = num_attention_heads
        controlnet = cls.from_config(config)
        params = controlnet.init_params(key)
        if load_weights_from_transformer:
            for name in ("time_text_embed", "context_embedder", "x_embedder"):
                params[name] = jax.tree.map(lambda x: x, transformer_params[name])
            for i in range(num_layers):
                params["transformer_blocks"][i] = transformer_params["transformer_blocks"][i]
            for i in range(num_single_layers):
                params["single_transformer_blocks"][i] = transformer_params["single_transformer_blocks"][i]
            params["controlnet_x_embedder"] = _zero_tree(params["controlnet_x_embedder"])
        return controlnet, params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, image_seq, in_channels] packed latents
        controlnet_cond: jax.Array,  # packed [B, image_seq, in_channels], or NHWC image if input_hint_block
        controlnet_mode: Optional[jax.Array] = None,  # [B, 1] int (union mode)
        conditioning_scale: float = 1.0,
        encoder_hidden_states: Optional[jax.Array] = None,
        pooled_projections: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,  # [B] in [0, 1]
        img_ids: Optional[jax.Array] = None,  # [image_seq, 3]
        txt_ids: Optional[jax.Array] = None,  # [text_seq, 3]
        guidance: Optional[jax.Array] = None,  # [B]
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,  # precomputed (cos, sin)
        return_dict: bool = True,
    ) -> Union[FluxControlNetOutput, tuple]:
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)

        if self.input_hint_block is not None:
            # NHWC image -> hint conv stack -> patch-pack to [B, S, C*ps*ps]
            # (channel-major patch flatten matches the reference permute(0,2,4,1,3,5))
            cond = self.input_hint_block(params["input_hint_block"], controlnet_cond)
            b, h_pw, w_pw, c = cond.shape
            ps = self.config.patch_size
            h, w = h_pw // ps, w_pw // ps
            cond = cond.reshape(b, h, ps, w, ps, c)
            cond = cond.transpose(0, 1, 3, 5, 2, 4).reshape(b, h * w, c * ps * ps)
            controlnet_cond = cond
        hidden_states = hidden_states + self.controlnet_x_embedder(params["controlnet_x_embedder"], controlnet_cond)

        timestep = timestep.astype(hidden_states.dtype) * 1000
        if guidance is not None:
            guidance = guidance.astype(hidden_states.dtype) * 1000
            temb = self.time_text_embed(params["time_text_embed"], timestep, guidance, pooled_projections)
        else:
            temb = self.time_text_embed(params["time_text_embed"], timestep, pooled_projections)
        encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if self.union:
            if controlnet_mode is None:
                raise ValueError("`controlnet_mode` cannot be `None` when applying ControlNet-Union")
            mode_emb = self.controlnet_mode_embedder(params["controlnet_mode_embedder"], controlnet_mode)
            encoder_hidden_states = jnp.concatenate([mode_emb, encoder_hidden_states], axis=1)
            if txt_ids is not None:
                txt_ids = jnp.concatenate([txt_ids[:1], txt_ids], axis=0)

        if image_rotary_emb is None:
            ids = jnp.concatenate([txt_ids, img_ids], axis=0)
            image_rotary_emb = self.pos_embed({}, ids)

        block_samples = ()
        for i, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb, image_rotary_emb
            )
            block_samples = block_samples + (hidden_states,)

        single_block_samples = ()
        for i, block in enumerate(self.single_transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["single_transformer_blocks"][i], hidden_states, encoder_hidden_states, temb, image_rotary_emb
            )
            single_block_samples = single_block_samples + (hidden_states,)

        controlnet_block_samples = tuple(
            cb(params["controlnet_blocks"][i], s) * conditioning_scale
            for i, (s, cb) in enumerate(zip(block_samples, self.controlnet_blocks))
        )
        controlnet_single_block_samples = tuple(
            cb(params["controlnet_single_blocks"][i], s) * conditioning_scale
            for i, (s, cb) in enumerate(zip(single_block_samples, self.controlnet_single_blocks))
        )

        controlnet_block_samples = controlnet_block_samples or None
        controlnet_single_block_samples = controlnet_single_block_samples or None

        if not return_dict:
            return (controlnet_block_samples, controlnet_single_block_samples)
        return FluxControlNetOutput(
            controlnet_block_samples=controlnet_block_samples,
            controlnet_single_block_samples=controlnet_single_block_samples,
        )


class FluxMultiControlNetModel(Module):
    """Wrapper running several FluxControlNetModels and summing their residuals
    (reference controlnet_flux.py:330)."""

    def __init__(self, controlnets):
        super().__init__()
        self.nets = ModuleList(controlnets)

    def __call__(self, params_list, hidden_states, controlnet_cond, controlnet_mode=None,
                 conditioning_scale=None, **kwargs):
        if conditioning_scale is None:
            conditioning_scale = [1.0] * len(self.nets)
        if controlnet_mode is None:
            controlnet_mode = [None] * len(self.nets)
        block_samples, single_block_samples = None, None
        for net, p, image, mode, scale in zip(self.nets, params_list, controlnet_cond, controlnet_mode,
                                              conditioning_scale):
            out = net(p, hidden_states, image, controlnet_mode=mode, conditioning_scale=scale, **kwargs)
            if block_samples is None:
                block_samples = out.controlnet_block_samples
                single_block_samples = out.controlnet_single_block_samples
            else:
                if out.controlnet_block_samples is not None:
                    block_samples = tuple(a + b for a, b in zip(block_samples, out.controlnet_block_samples))
                if out.controlnet_single_block_samples is not None:
                    single_block_samples = tuple(
                        a + b for a, b in zip(single_block_samples, out.controlnet_single_block_samples)
                    )
        return FluxControlNetOutput(
            controlnet_block_samples=block_samples,
            controlnet_single_block_samples=single_block_samples,
        )

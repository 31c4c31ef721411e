"""SD3ControlNetModel — ControlNet for the SD3/SD3.5 MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_sd3.py:42`
SD3ControlNetModel; SD3.5-8b single-block variant `:148-158`,
SD3MultiControlNetModel `:400`).

TPU-first: reuses the JAX JointTransformerBlock from transformer_sd3.py over
the [B, N, D] patch-token stream; the zero-init residual Linears and the
zero-init conditioning PatchEmbed keep an untrained net a no-op.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import CombinedTimestepTextProjEmbeddings, PatchEmbed
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormZero
from ..attention_blocks import FeedForward
from ..transformers.transformer_sd3 import JointAttention, JointTransformerBlock


@dataclass
class SD3ControlNetOutput(BaseOutput):
    controlnet_block_samples: Tuple[jax.Array, ...]


def _zero_tree(params: Params) -> Params:
    return jax.tree.map(jnp.zeros_like, params)


class SD3SingleTransformerBlock(Module):
    """Context-free MMDiT block (SD3.5-8b ControlNet variant; reference
    transformer_sd3.py:39)."""

    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.attn = JointAttention(
            query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim, out_dim=dim
        )
        from ...ops.module import LayerNorm

        self.norm2 = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states: jax.Array, temb: jax.Array) -> jax.Array:
        norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, emb=temb)
        attn_output = self.attn(params["attn"], norm_hidden)
        hidden_states = hidden_states + gate_msa[:, None] * attn_output
        norm_hidden = self.norm2({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_hidden)
        return hidden_states


class SD3ControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 128,
        patch_size: int = 2,
        in_channels: int = 16,
        num_layers: int = 18,
        attention_head_dim: int = 64,
        num_attention_heads: int = 18,
        joint_attention_dim: Optional[int] = 4096,
        caption_projection_dim: int = 1152,
        pooled_projection_dim: int = 2048,
        out_channels: int = 16,
        pos_embed_max_size: int = 96,
        extra_conditioning_channels: int = 0,
        dual_attention_layers: Tuple[int, ...] = (),
        qk_norm: Optional[str] = None,
        pos_embed_type: Optional[str] = "sincos",
        use_pos_embed: bool = True,
        force_zeros_for_pooled_projection: bool = True,
    ):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim

        if use_pos_embed:
            self.pos_embed = PatchEmbed(
                height=sample_size, width=sample_size, patch_size=patch_size, in_channels=in_channels,
                embed_dim=self.inner_dim, pos_embed_max_size=pos_embed_max_size, pos_embed_type=pos_embed_type,
            )
        else:
            self.pos_embed = None
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            embedding_dim=self.inner_dim, pooled_projection_dim=pooled_projection_dim
        )
        if joint_attention_dim is not None:
            self.context_embedder = Linear(joint_attention_dim, caption_projection_dim)
            self.transformer_blocks = ModuleList(
                [
                    JointTransformerBlock(
                        dim=self.inner_dim,
                        num_attention_heads=num_attention_heads,
                        attention_head_dim=attention_head_dim,
                        context_pre_only=False,
                        qk_norm=qk_norm,
                        use_dual_attention=(i in dual_attention_layers),
                    )
                    for i in range(num_layers)
                ]
            )
        else:
            self.context_embedder = None
            self.transformer_blocks = ModuleList(
                [
                    SD3SingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                    for _ in range(num_layers)
                ]
            )

        self.controlnet_blocks = ModuleList([Linear(self.inner_dim, self.inner_dim) for _ in range(num_layers)])
        self.pos_embed_input = PatchEmbed(
            height=sample_size, width=sample_size, patch_size=patch_size,
            in_channels=in_channels + extra_conditioning_channels,
            embed_dim=self.inner_dim, pos_embed_type=None,
        )

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype=dtype)
        # zero-init residual projections + conditioning embed: untrained net is a no-op
        params["controlnet_blocks"] = _zero_tree(params["controlnet_blocks"])
        params["pos_embed_input"] = _zero_tree(params["pos_embed_input"])
        return params

    @classmethod
    def from_transformer(cls, transformer, transformer_params: Params, num_layers: int = 12,
                         num_extra_conditioning_channels: int = 1,
                         load_weights_from_transformer: bool = True, key: Optional[jax.Array] = None):
        """Graft the prefix of an SD3Transformer2DModel (reference
        controlnet_sd3.py:190)."""
        config = dict(transformer.config)
        config["num_layers"] = num_layers or config["num_layers"]
        config["extra_conditioning_channels"] = num_extra_conditioning_channels
        config.pop("dual_attention_layers", None)
        config.pop("qk_norm", None)
        controlnet = cls.from_config(config)
        params = controlnet.init_params(key)
        if load_weights_from_transformer:
            for name in ("pos_embed", "time_text_embed", "context_embedder"):
                if name in transformer_params:
                    params[name] = transformer_params[name]
            for i in range(config["num_layers"]):
                params["transformer_blocks"][i] = transformer_params["transformer_blocks"][i]
            params["pos_embed_input"] = _zero_tree(params["pos_embed_input"])
        return controlnet, params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W] (4D) or [B, N, D] (3D, SD3.5-8b)
        controlnet_cond: jax.Array,  # [B, C(+extra), H, W]
        conditioning_scale: float = 1.0,
        encoder_hidden_states: Optional[jax.Array] = None,
        pooled_projections: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[SD3ControlNetOutput, tuple]:
        if self.pos_embed is not None:
            hidden_states = self.pos_embed(params["pos_embed"], hidden_states)
        temb = self.time_text_embed(params["time_text_embed"], timestep, pooled_projections)
        if self.context_embedder is not None:
            encoder_hidden_states = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        hidden_states = hidden_states + self.pos_embed_input(params["pos_embed_input"], controlnet_cond)

        block_res_samples = ()
        for i, block in enumerate(self.transformer_blocks):
            if self.context_embedder is not None:
                hidden_states, new_context = block(
                    params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb
                )
                if new_context is not None:
                    encoder_hidden_states = new_context
            else:
                hidden_states = block(params["transformer_blocks"][i], hidden_states, temb)
            block_res_samples = block_res_samples + (hidden_states,)

        controlnet_block_res_samples = tuple(
            cb(params["controlnet_blocks"][i], s) * conditioning_scale
            for i, (s, cb) in enumerate(zip(block_res_samples, self.controlnet_blocks))
        )

        if not return_dict:
            return (controlnet_block_res_samples,)
        return SD3ControlNetOutput(controlnet_block_samples=controlnet_block_res_samples)


class SD3MultiControlNetModel(Module):
    """Run several SD3ControlNets and sum their residual stacks (reference
    controlnet_sd3.py:400)."""

    def __init__(self, controlnets):
        super().__init__()
        self.nets = ModuleList(controlnets)

    def __call__(self, params_list, hidden_states, controlnet_cond, conditioning_scale=None, **kwargs):
        if conditioning_scale is None:
            conditioning_scale = [1.0] * len(self.nets)
        samples = None
        for net, p, image, scale in zip(self.nets, params_list, controlnet_cond, conditioning_scale):
            out = net(p, hidden_states, image, conditioning_scale=scale, **kwargs)
            if samples is None:
                samples = out.controlnet_block_samples
            else:
                samples = tuple(a + b for a, b in zip(samples, out.controlnet_block_samples))
        return SD3ControlNetOutput(controlnet_block_samples=samples)

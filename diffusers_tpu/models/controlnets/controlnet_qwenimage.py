"""QwenImage ControlNet — block-sample residuals for the QwenImage DiT.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_qwenimage.py:51`):
a prefix of QwenImage double-stream blocks with a zero-init packed-latent
condition embedder and per-block zero-init projections; the main
transformer consumes `controlnet_block_samples` and spreads them over its
depth. `QwenImageMultiControlNetModel` sums per-net residual stacks
(reference `:280`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from ..transformers.transformer_qwenimage import (
    QwenEmbedRope,
    QwenImageTransformerBlock,
    QwenTimestepProjEmbeddings,
)
from .controlnet_flux import _zero_tree


@dataclass
class QwenImageControlNetOutput(BaseOutput):
    controlnet_block_samples: Tuple[jax.Array, ...]


class QwenImageControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 64,
        out_channels: Optional[int] = 16,
        num_layers: int = 60,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 3584,
        axes_dims_rope: Tuple[int, int, int] = (16, 56, 56),
        extra_condition_channels: int = 0,  # controlnet-inpainting
    ):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pos_embed = QwenEmbedRope(theta=10000, axes_dim=list(axes_dims_rope), scale_rope=True)
        self.time_text_embed = QwenTimestepProjEmbeddings(embedding_dim=self.inner_dim)
        self.txt_norm = RMSNorm(joint_attention_dim, eps=1e-6)
        self.img_in = Linear(in_channels, self.inner_dim)
        self.txt_in = Linear(joint_attention_dim, self.inner_dim)
        self.transformer_blocks = ModuleList([
            QwenImageTransformerBlock(dim=self.inner_dim, num_attention_heads=num_attention_heads,
                                      attention_head_dim=attention_head_dim)
            for _ in range(num_layers)
        ])
        self.controlnet_blocks = ModuleList([
            Linear(self.inner_dim, self.inner_dim) for _ in range(num_layers)
        ])
        self.controlnet_x_embedder = Linear(in_channels + extra_condition_channels, self.inner_dim)

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype=dtype)
        # zero-init residual paths: untrained ControlNet is a no-op
        params["controlnet_blocks"] = _zero_tree(params["controlnet_blocks"])
        params["controlnet_x_embedder"] = _zero_tree(params["controlnet_x_embedder"])
        return params

    @classmethod
    def from_transformer(cls, transformer, transformer_params: Params, num_layers: int = 5,
                         attention_head_dim: int = 128, num_attention_heads: int = 24,
                         load_weights_from_transformer: bool = True,
                         extra_condition_channels: int = 0,
                         key: Optional[jax.Array] = None):
        config = dict(transformer.config)
        config["num_layers"] = num_layers
        config["attention_head_dim"] = attention_head_dim
        config["num_attention_heads"] = num_attention_heads
        config["extra_condition_channels"] = extra_condition_channels
        controlnet = cls.from_config(config)
        params = controlnet.init_params(key)
        if load_weights_from_transformer:
            for name in ("time_text_embed", "img_in", "txt_in", "txt_norm"):
                if name in transformer_params:
                    params[name] = jax.tree.map(lambda x: x, transformer_params[name])
            for i in range(num_layers):
                params["transformer_blocks"][i] = transformer_params["transformer_blocks"][i]
        return controlnet, params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, image_seq, in_channels] packed latents
        controlnet_cond: jax.Array,  # [B, image_seq, in_channels(+extra)] packed condition
        conditioning_scale: float = 1.0,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_hidden_states_mask: Optional[jax.Array] = None,
        timestep: Optional[jax.Array] = None,  # [B] in [0, 1]
        img_shapes: Optional[List[Tuple[int, int, int]]] = None,
        return_dict: bool = True,
    ) -> Union[QwenImageControlNetOutput, tuple]:
        h = self.img_in(params["img_in"], hidden_states)
        h = h + self.controlnet_x_embedder(params["controlnet_x_embedder"], controlnet_cond)

        timestep = timestep.astype(h.dtype)
        temb = self.time_text_embed(params["time_text_embed"], timestep, h.dtype)

        ctx = self.txt_norm(params["txt_norm"], encoder_hidden_states)
        ctx = self.txt_in(params["txt_in"], ctx)
        image_rotary_emb = self.pos_embed(img_shapes, max_txt_seq_len=ctx.shape[1])

        block_samples = ()
        for i, block in enumerate(self.transformer_blocks):
            ctx, h = block(
                params["transformer_blocks"][i], h, ctx, encoder_hidden_states_mask, temb,
                image_rotary_emb=image_rotary_emb,
            )
            block_samples += (h,)

        out = tuple(
            self.controlnet_blocks[i](params["controlnet_blocks"][i], s) * conditioning_scale
            for i, s in enumerate(block_samples)
        )
        if not return_dict:
            return out
        return QwenImageControlNetOutput(controlnet_block_samples=out)


class QwenImageMultiControlNetModel(Module):
    """Wrapper summing residuals from several QwenImage ControlNets
    (reference `controlnet_qwenimage.py:280`); call with a list of
    (cond, scale) matching the nets."""

    def __init__(self, controlnets: List[QwenImageControlNetModel]):
        super().__init__()
        self.nets = ModuleList(list(controlnets))

    def __call__(self, params_list, hidden_states, controlnet_cond: list,
                 conditioning_scale: list, **kwargs):
        total = None
        for net, net_params, cond, scale in zip(self.nets, params_list, controlnet_cond,
                                                conditioning_scale):
            samples = net(net_params, hidden_states, cond, conditioning_scale=scale,
                          return_dict=False, **kwargs)
            if total is None:
                total = list(samples)
            else:
                total = [t + s for t, s in zip(total, samples)]
        return QwenImageControlNetOutput(controlnet_block_samples=tuple(total))

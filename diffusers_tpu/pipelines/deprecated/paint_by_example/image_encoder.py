"""PaintByExample image encoder (reference
`/root/reference/src/diffusers/pipelines/deprecated/paint_by_example/image_encoder.py:25`):
CLIP vision pooled output → small self-attention mapper → LayerNorm →
projection, plus a learned unconditional vector for CFG."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ....configuration_utils import ConfigMixin, register_to_config
from ....models.attention_blocks import BasicTransformerBlock
from ....models.modeling_utils import ModelMixin
from ....models.text_encoders.clip import CLIPVisionTransformer
from ....ops.module import LayerNorm, Linear, Module, ModuleList, Params


class PaintByExampleMapper(Module):
    def __init__(self, hidden_size: int, num_hidden_layers: int):
        super().__init__()
        num_layers = (num_hidden_layers + 1) // 5
        self.blocks = ModuleList([
            BasicTransformerBlock(hidden_size, 1, hidden_size, activation_fn="gelu",
                                  attention_bias=True)
            for _ in range(num_layers)
        ])

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        for i, block in enumerate(self.blocks):
            hidden_states = block(params["blocks"][i], hidden_states)
        return hidden_states


class PaintByExampleImageEncoder(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        hidden_size: int = 1024,
        intermediate_size: int = 4096,
        num_hidden_layers: int = 24,
        num_attention_heads: int = 16,
        image_size: int = 224,
        patch_size: int = 14,
        hidden_act: str = "quick_gelu",
        layer_norm_eps: float = 1e-5,
        projection_dim: int = 768,
    ):
        super().__init__()
        self.proj_size = projection_dim
        cfg = dict(hidden_size=hidden_size, intermediate_size=intermediate_size,
                   num_hidden_layers=num_hidden_layers, num_attention_heads=num_attention_heads,
                   image_size=image_size, patch_size=patch_size, num_channels=3,
                   hidden_act=hidden_act, layer_norm_eps=layer_norm_eps)
        self.model = CLIPVisionTransformer(cfg)
        self.mapper = PaintByExampleMapper(hidden_size, num_hidden_layers)
        self.final_layer_norm = LayerNorm(hidden_size)
        self.proj_out = Linear(hidden_size, self.proj_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["uncond_vector"] = jax.random.normal(
            jax.random.fold_in(key, 99), (1, 1, self.proj_size), jnp.float32).astype(dtype)
        return params

    def __call__(self, params: Params, pixel_values: jax.Array, return_uncond_vector: bool = False):
        _, pooled, _ = self.model(params["model"], pixel_values, False)
        latent = self.mapper(params["mapper"], pooled[:, None])
        latent = self.final_layer_norm(params["final_layer_norm"], latent)
        latent = self.proj_out(params["proj_out"], latent)
        if return_uncond_vector:
            return latent, params["uncond_vector"]
        return latent

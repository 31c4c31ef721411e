"""Flux Redux image embedder.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/modeling_flux.py:31`
ReduxImageEncoder): Siglip vision features → up-project (silu) →
down-project to the T5 text width, yielding image tokens that append to the
prompt embeds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Linear, Module, Params
from ...utils import BaseOutput


@dataclass
class ReduxImageEncoderOutput(BaseOutput):
    image_embeds: Optional[jax.Array] = None


class ReduxImageEncoder(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(self, redux_dim: int = 1152, txt_in_features: int = 4096):
        super().__init__()
        self.redux_up = Linear(redux_dim, txt_in_features * 3)
        self.redux_down = Linear(txt_in_features * 3, txt_in_features)

    def __call__(self, params: Params, x: jax.Array) -> ReduxImageEncoderOutput:
        projected = self.redux_down(
            params["redux_down"], jax.nn.silu(self.redux_up(params["redux_up"], x))
        )
        return ReduxImageEncoderOutput(image_embeds=projected)

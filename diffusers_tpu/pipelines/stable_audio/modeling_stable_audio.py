"""Stable Audio conditioning projection model.

Behavioral mirror of the reference
`pipelines/stable_audio/modeling_stable_audio.py`
(StableAudioPositionalEmbedding `:29` — learned Fourier features with the
raw time prepended, StableAudioNumberConditioner `:64` — clamp/normalize
seconds then embed, StableAudioProjectionModel `:114` — text / start /
end projections).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput


class StableAudioPositionalEmbedding(Module):
    """Continuous-time learned Fourier features: [t, sin(2πtw), cos(2πtw)]."""

    def __init__(self, dim: int):
        super().__init__()
        assert dim % 2 == 0
        self.half_dim = dim // 2

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weights": jax.random.normal(key, (self.half_dim,), dtype)}

    def __call__(self, params: Params, times: jax.Array) -> jax.Array:
        times = times[..., None]
        freqs = times * params["weights"][None] * 2 * math.pi
        return jnp.concatenate([times, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


@dataclass
class StableAudioProjectionModelOutput(BaseOutput):
    text_hidden_states: Optional[jax.Array] = None
    seconds_start_hidden_states: Optional[jax.Array] = None
    seconds_end_hidden_states: Optional[jax.Array] = None


class StableAudioNumberConditioner(Module):
    """Clamp a float to [min, max], normalize, embed (reference :64)."""

    def __init__(self, number_embedding_dim, min_value, max_value, internal_dim: int = 256):
        super().__init__()
        self.time_positional_embedding = ModuleList([
            StableAudioPositionalEmbedding(internal_dim),
            Linear(internal_dim + 1, number_embedding_dim, use_bias=True),
        ])
        self.number_embedding_dim = number_embedding_dim
        self.min_value = min_value
        self.max_value = max_value

    def __call__(self, params: Params, floats: jax.Array) -> jax.Array:
        floats = jnp.clip(floats, self.min_value, self.max_value)
        normalized = (floats - self.min_value) / (self.max_value - self.min_value)
        emb = self.time_positional_embedding[0](params["time_positional_embedding"][0], normalized)
        emb = self.time_positional_embedding[1](params["time_positional_embedding"][1], emb)
        return emb.reshape(-1, 1, self.number_embedding_dim)


class _Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return x


class StableAudioProjectionModel(Module, ModelMixin, ConfigMixin):
    """Reference StableAudioProjectionModel :114."""

    @register_to_config
    def __init__(self, text_encoder_dim, conditioning_dim, min_value, max_value):
        super().__init__()
        self.text_projection = (
            _Identity() if conditioning_dim == text_encoder_dim
            else Linear(text_encoder_dim, conditioning_dim, use_bias=True)
        )
        self.start_number_conditioner = StableAudioNumberConditioner(conditioning_dim, min_value, max_value)
        self.end_number_conditioner = StableAudioNumberConditioner(conditioning_dim, min_value, max_value)

    def __call__(
        self,
        params: Params,
        text_hidden_states: Optional[jax.Array] = None,
        start_seconds: Optional[jax.Array] = None,
        end_seconds: Optional[jax.Array] = None,
    ) -> StableAudioProjectionModelOutput:
        return StableAudioProjectionModelOutput(
            text_hidden_states=(
                None if text_hidden_states is None
                else self.text_projection(params["text_projection"], text_hidden_states)
            ),
            seconds_start_hidden_states=(
                None if start_seconds is None
                else self.start_number_conditioner(params["start_number_conditioner"], start_seconds)
            ),
            seconds_end_hidden_states=(
                None if end_seconds is None
                else self.end_number_conditioner(params["end_number_conditioner"], end_seconds)
            ),
        )

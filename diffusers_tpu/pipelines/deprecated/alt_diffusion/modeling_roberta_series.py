"""RobertaSeriesModelWithTransformation — AltDiffusion's multilingual text
encoder (reference
`/root/reference/src/diffusers/pipelines/deprecated/alt_diffusion/modeling_roberta_series.py:57`):
an XLM-Roberta tower whose (optionally pre-final, pre-LayerNormed) hidden
states project into the SD cross-attention width."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ....configuration_utils import ConfigMixin, register_to_config
from ....models.modeling_utils import ModelMixin
from ....models.text_encoders.xlm_roberta import _XLMRobertaModel
from ....ops.module import LayerNorm, Linear, Module, Params
from ....utils import BaseOutput


@dataclass
class TransformationModelOutput(BaseOutput):
    projection_state: Optional[jax.Array] = None
    last_hidden_state: jax.Array = None


class RobertaSeriesModelWithTransformation(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 250002,
        hidden_size: int = 768,
        intermediate_size: int = 3072,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        max_position_embeddings: int = 514,
        type_vocab_size: int = 1,
        pad_token_id: int = 1,
        layer_norm_eps: float = 1e-5,
        project_dim: int = 768,
        has_pre_transformation: bool = False,
    ):
        super().__init__()
        cfg = dict(
            vocab_size=vocab_size, hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers, num_attention_heads=num_attention_heads,
            max_position_embeddings=max_position_embeddings, type_vocab_size=type_vocab_size,
            pad_token_id=pad_token_id, layer_norm_eps=layer_norm_eps,
        )
        self.roberta = _XLMRobertaModel(cfg)
        self.transformation = Linear(hidden_size, project_dim)
        self.has_pre_transformation = has_pre_transformation
        if has_pre_transformation:
            self.transformation_pre = Linear(hidden_size, project_dim)
            self.pre_LN = LayerNorm(hidden_size, eps=layer_norm_eps)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> TransformationModelOutput:
        if attention_mask is None:
            attention_mask = (input_ids != self.config.pad_token_id).astype(jnp.int32)
        if self.has_pre_transformation:
            last, hiddens = self.roberta(params["roberta"], input_ids, attention_mask,
                                         output_hidden_states=True)
            # second-to-last hidden, pre-LayerNormed (reference `:106-112`)
            pre = self.pre_LN(params["pre_LN"], hiddens[-2])
            projection = self.transformation_pre(params["transformation_pre"], pre)
            return TransformationModelOutput(projection_state=projection, last_hidden_state=last)
        last = self.roberta(params["roberta"], input_ids, attention_mask)
        projection = self.transformation(params["transformation"], last)
        return TransformationModelOutput(projection_state=projection, last_hidden_state=last)

"""ACE-Step 1.5 pipeline-side models.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ace_step/modeling_ace_step.py`):
condition encoder (`AceStepConditionEncoder` :752) packing text + lyric +
timbre conditioning, the lyric/timbre encoders (:127/:233), the FSQ audio
tokenizer / detokenizer used by cover conditioning (:665/:565), and
`_pack_sequences` (:50).

TPU-first notes: `_pack_sequences` uses a stable argsort on the mask
(static-shape token reordering inside jit); timbre unpacking takes the
host-side `refer_audio_order_mask` (numpy) so batch regrouping compiles to
a static one-hot matmul.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...models.transformers.transformer_ace_step import (
    AceStepAttention,
    AceStepMLP,
    ace_step_rotary_freqs,
    sliding_window_mask,
)
from ...ops.module import Linear, Module, ModuleList, Params, RMSNorm
from ...utils import logging

logger = logging.get_logger(__name__)


def _pack_sequences(hidden1, hidden2, mask1, mask2):
    """Pack two masked sequences so all valid tokens come first
    (reference `_pack_sequences` :50). Stable argsort keeps relative order."""
    hidden_cat = jnp.concatenate([hidden1, hidden2], axis=1)
    mask_cat = jnp.concatenate([mask1.astype(jnp.int32), mask2.astype(jnp.int32)], axis=1)
    L = mask_cat.shape[1]
    # descending stable sort: sort by (1 - mask) ascending
    sort_idx = jnp.argsort(1 - mask_cat, axis=1, stable=True)
    hidden_packed = jnp.take_along_axis(hidden_cat, sort_idx[..., None], axis=1)
    lengths = mask_cat.sum(axis=1)
    new_mask = jnp.arange(L)[None, :] < lengths[:, None]
    return hidden_packed, new_mask


class AceStepEncoderLayer(Module):
    """Pre-LN block for the lyric/timbre encoders (reference :69)."""

    def __init__(
        self,
        hidden_size: int,
        num_attention_heads: int,
        num_key_value_heads: int,
        head_dim: int,
        intermediate_size: int,
        attention_bias: bool = False,
        rms_norm_eps: float = 1e-6,
        sliding_window: Optional[int] = None,
    ):
        super().__init__()
        self.self_attn = AceStepAttention(
            hidden_size, num_attention_heads, num_key_value_heads, head_dim,
            bias=attention_bias, eps=rms_norm_eps, sliding_window=sliding_window,
            is_cross_attention=False,
        )
        self.input_layernorm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.post_attention_layernorm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.mlp = AceStepMLP(hidden_size, intermediate_size)

    def __call__(self, params: Params, hidden_states, position_embeddings, attention_mask=None):
        residual = hidden_states
        h = self.input_layernorm(params["input_layernorm"], hidden_states)
        h = self.self_attn(params["self_attn"], h, attention_mask=attention_mask,
                           rotary_emb=position_embeddings)
        hidden_states = residual + h
        residual = hidden_states
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden_states)
        h = self.mlp(params["mlp"], h)
        return residual + h


def _default_layer_types(n: int) -> List[str]:
    return ["sliding_attention" if bool((i + 1) % 2) else "full_attention" for i in range(n)]


def _encoder_masks(seq_len: int, sliding_window: int, attention_mask=None):
    """(full, sliding) boolean keep-masks for a stack of encoder layers."""
    band = sliding_window_mask(seq_len, sliding_window)
    full = None
    if attention_mask is not None:
        pad = attention_mask.astype(bool)[:, None, None, :]
        full = jnp.broadcast_to(pad, (pad.shape[0], 1, seq_len, seq_len))
        band = band & pad
    return full, band


class AceStepLyricEncoder(Module, ModelMixin, ConfigMixin):
    """Lyric encoder (reference :127): Linear embed + encoder stack + norm."""

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        text_hidden_dim: int = 1024,
        num_lyric_encoder_hidden_layers: int = 8,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        if layer_types is None:
            layer_types = _default_layer_types(num_lyric_encoder_hidden_layers)
        self.embed_tokens = Linear(text_hidden_dim, hidden_size)
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self._layer_types = layer_types
        self.layers = ModuleList(
            [
                AceStepEncoderLayer(
                    hidden_size, num_attention_heads, num_key_value_heads, head_dim,
                    intermediate_size, attention_bias=attention_bias,
                    rms_norm_eps=rms_norm_eps,
                    sliding_window=sliding_window if layer_types[i] == "sliding_attention" else None,
                )
                for i in range(num_lyric_encoder_hidden_layers)
            ]
        )

    def __call__(self, params: Params, inputs_embeds: jax.Array, attention_mask: jax.Array):
        h = self.embed_tokens(params["embed_tokens"], inputs_embeds)
        seq_len = h.shape[1]
        cos, sin = ace_step_rotary_freqs(seq_len, self.head_dim, self.rope_theta)
        pe = (jnp.asarray(cos, h.dtype), jnp.asarray(sin, h.dtype))
        full_mask, band_mask = _encoder_masks(seq_len, self.sliding_window, attention_mask)
        for i, layer in enumerate(self.layers):
            mask = band_mask if self._layer_types[i] == "sliding_attention" else full_mask
            h = layer(params["layers"][i], h, pe, attention_mask=mask)
        return self.norm(params["norm"], h)


class AceStepTimbreEncoder(Module, ModelMixin, ConfigMixin):
    """Timbre encoder (reference :233): CLS-style pooled embedding per packed
    reference-audio sequence, regrouped per batch entry."""

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        timbre_hidden_dim: int = 64,
        num_timbre_encoder_hidden_layers: int = 4,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        if layer_types is None:
            layer_types = _default_layer_types(num_timbre_encoder_hidden_layers)
        self.embed_tokens = Linear(timbre_hidden_dim, hidden_size)
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.hidden_size = hidden_size
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self._layer_types = layer_types
        self.layers = ModuleList(
            [
                AceStepEncoderLayer(
                    hidden_size, num_attention_heads, num_key_value_heads, head_dim,
                    intermediate_size, attention_bias=attention_bias,
                    rms_norm_eps=rms_norm_eps,
                    sliding_window=sliding_window if layer_types[i] == "sliding_attention" else None,
                )
                for i in range(num_timbre_encoder_hidden_layers)
            ]
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 17)
        params["special_token"] = jax.random.normal(k, (1, 1, self.hidden_size), dtype)
        return params

    @staticmethod
    def unpack_timbre_embeddings(timbre_embs_packed: jax.Array, refer_audio_order_mask: np.ndarray):
        """Regroup N pooled embeddings into [B, max_count, D] + mask.

        `refer_audio_order_mask` is host-side numpy (batch id per packed
        sequence, reference :292), so the scatter is a static one-hot matmul.
        """
        order = np.asarray(refer_audio_order_mask)
        N = order.shape[0]
        B = int(order.max()) + 1
        counts = np.bincount(order, minlength=B)
        max_count = int(counts.max())
        pos_in_batch = np.zeros(N, dtype=np.int64)
        seen = {}
        for i, b in enumerate(order.tolist()):
            pos_in_batch[i] = seen.get(b, 0)
            seen[b] = seen.get(b, 0) + 1
        flat_idx = order * max_count + pos_in_batch
        one_hot = jnp.asarray(np.eye(B * max_count, dtype=np.float32)[flat_idx])
        unpacked = (one_hot.T.astype(timbre_embs_packed.dtype) @ timbre_embs_packed).reshape(
            B, max_count, -1
        )
        mask_np = np.zeros(B * max_count, dtype=bool)
        mask_np[flat_idx] = True
        return unpacked, jnp.asarray(mask_np.reshape(B, max_count))

    def __call__(self, params: Params, refer_audio_acoustic_hidden_states_packed: jax.Array,
                 refer_audio_order_mask: np.ndarray):
        h = self.embed_tokens(params["embed_tokens"], refer_audio_acoustic_hidden_states_packed)
        seq_len = h.shape[1]
        cos, sin = ace_step_rotary_freqs(seq_len, self.head_dim, self.rope_theta)
        pe = (jnp.asarray(cos, h.dtype), jnp.asarray(sin, h.dtype))
        band_mask = sliding_window_mask(seq_len, self.sliding_window)
        for i, layer in enumerate(self.layers):
            mask = band_mask if self._layer_types[i] == "sliding_attention" else None
            h = layer(params["layers"][i], h, pe, attention_mask=mask)
        h = self.norm(params["norm"], h)
        pooled = h[:, 0, :]
        return self.unpack_timbre_embeddings(pooled, refer_audio_order_mask)


class _AceStepResidualFSQ(Module):
    """Finite scalar quantizer compatible with ACE-Step tokenizer weights
    (reference `_AceStepResidualFSQ` :378)."""

    def __init__(self, dim: int = 2048, levels: Optional[list] = None, num_quantizers: int = 1):
        super().__init__()
        if levels is None:
            levels = [8, 8, 8, 5, 5, 5]
        self.levels = np.asarray(levels, dtype=np.int64)
        self.num_quantizers = num_quantizers
        self.codebook_dim = len(levels)
        self.project_in = Linear(dim, self.codebook_dim)
        self.project_out = Linear(self.codebook_dim, dim)
        self.basis = np.cumprod([1] + list(levels[:-1])).astype(np.int64)
        self.scales = np.stack([self.levels.astype(np.float64) ** -i for i in range(num_quantizers)]).astype(np.float32)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    def _indices_to_codes(self, indices: jax.Array) -> jax.Array:
        levels = jnp.asarray(self.levels)
        basis = jnp.asarray(self.basis)
        level_indices = (indices.astype(jnp.int64)[..., None] // basis) % levels
        scale = 2.0 / (levels.astype(jnp.float32) - 1.0)
        return level_indices.astype(jnp.float32) * scale - 1.0

    def _codes_to_indices(self, codes: jax.Array) -> jax.Array:
        levels = jnp.asarray(self.levels, codes.dtype)
        basis = jnp.asarray(self.basis, codes.dtype)
        level_indices = (codes + 1.0) / (2.0 / (levels - 1.0))
        return jnp.round(jnp.sum(level_indices * basis, axis=-1)).astype(jnp.int64)

    def _quantize(self, x: jax.Array) -> jax.Array:
        levels = jnp.asarray(self.levels, x.dtype)
        step = 2.0 / (levels - 1.0)
        bracket = (levels - 1.0) * (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0 + 0.5
        return step * jnp.floor(bracket) - 1.0

    def get_output_from_indices(self, params: Params, indices: jax.Array) -> jax.Array:
        if indices.ndim == 2:
            indices = indices[..., None]
        codes = []
        for qi in range(self.num_quantizers):
            code = self._indices_to_codes(indices[..., qi])
            codes.append(code * jnp.asarray(self.scales[qi], code.dtype))
        summed = jnp.stack(codes, axis=0).sum(axis=0)
        return self.project_out(params["project_out"], summed.astype(jnp.float32))

    def __call__(self, params: Params, hidden_states: jax.Array):
        input_dtype = hidden_states.dtype
        h = self.project_in(params["project_in"], hidden_states.astype(jnp.float32))
        levels = jnp.asarray(self.levels, jnp.float32)
        soft_clamp = 1.0 + 1.0 / (levels - 1.0)
        h = jnp.tanh(h / soft_clamp) * soft_clamp

        quantized_out = jnp.zeros_like(h)
        residual = h
        all_indices = []
        for qi in range(self.num_quantizers):
            scale = jnp.asarray(self.scales[qi], h.dtype)
            quantized = self._quantize(residual / scale) * scale
            residual = residual - quantized
            quantized_out = quantized_out + quantized
            all_indices.append(self._codes_to_indices(quantized / scale))
        out = self.project_out(params["project_out"], quantized_out).astype(input_dtype)
        return out, jnp.stack(all_indices, axis=-1)


class AceStepAttentionPooler(Module):
    """CLS-pooled windowed encoder for the audio tokenizer (reference :478)."""

    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        num_attention_pooler_hidden_layers: int = 2,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        if layer_types is None:
            layer_types = _default_layer_types(num_attention_pooler_hidden_layers)
        self.embed_tokens = Linear(hidden_size, hidden_size)
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.hidden_size = hidden_size
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self._layer_types = layer_types
        self.layers = ModuleList(
            [
                AceStepEncoderLayer(
                    hidden_size, num_attention_heads, num_key_value_heads, head_dim,
                    intermediate_size, attention_bias=attention_bias,
                    rms_norm_eps=rms_norm_eps,
                    sliding_window=sliding_window if layer_types[i] == "sliding_attention" else None,
                )
                for i in range(num_attention_pooler_hidden_layers)
            ]
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 19)
        params["special_token"] = jax.random.normal(k, (1, 1, self.hidden_size), dtype) * 0.02
        return params

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        b, num_patches, patch, _ = hidden_states.shape
        h = self.embed_tokens(params["embed_tokens"], hidden_states)
        special = jnp.broadcast_to(
            params["special_token"].astype(h.dtype)[None], (b, num_patches, 1, self.hidden_size)
        )
        h = jnp.concatenate([special, h], axis=2).reshape(b * num_patches, patch + 1, -1)

        seq_len = h.shape[1]
        cos, sin = ace_step_rotary_freqs(seq_len, self.head_dim, self.rope_theta)
        pe = (jnp.asarray(cos, h.dtype), jnp.asarray(sin, h.dtype))
        band_mask = sliding_window_mask(seq_len, self.sliding_window)
        for i, layer in enumerate(self.layers):
            mask = band_mask if self._layer_types[i] == "sliding_attention" else None
            h = layer(params["layers"][i], h, pe, attention_mask=mask)
        h = self.norm(params["norm"], h)
        return h[:, 0, :].reshape(b, num_patches, -1)


class AceStepAudioTokenDetokenizer(Module, ModelMixin, ConfigMixin):
    """5 Hz audio tokens → 25 Hz acoustic conditioning (reference :565)."""

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        audio_acoustic_hidden_dim: int = 64,
        pool_window_size: int = 5,
        num_attention_pooler_hidden_layers: int = 2,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        if layer_types is None:
            layer_types = _default_layer_types(num_attention_pooler_hidden_layers)
        self.embed_tokens = Linear(hidden_size, hidden_size)
        self.norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.proj_out = Linear(hidden_size, audio_acoustic_hidden_dim)
        self.hidden_size = hidden_size
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self.pool_window_size = pool_window_size
        self._layer_types = layer_types
        self.layers = ModuleList(
            [
                AceStepEncoderLayer(
                    hidden_size, num_attention_heads, num_key_value_heads, head_dim,
                    intermediate_size, attention_bias=attention_bias,
                    rms_norm_eps=rms_norm_eps,
                    sliding_window=sliding_window if layer_types[i] == "sliding_attention" else None,
                )
                for i in range(num_attention_pooler_hidden_layers)
            ]
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 23)
        params["special_tokens"] = jax.random.normal(k, (1, self.pool_window_size, self.hidden_size), dtype) * 0.02
        return params

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        b, num_tokens, _ = hidden_states.shape
        h = self.embed_tokens(params["embed_tokens"], hidden_states)
        h = jnp.broadcast_to(h[:, :, None, :], (b, num_tokens, self.pool_window_size, self.hidden_size))
        h = h + params["special_tokens"].astype(h.dtype)[None]
        h = h.reshape(b * num_tokens, self.pool_window_size, -1)

        seq_len = h.shape[1]
        cos, sin = ace_step_rotary_freqs(seq_len, self.head_dim, self.rope_theta)
        pe = (jnp.asarray(cos, h.dtype), jnp.asarray(sin, h.dtype))
        band_mask = sliding_window_mask(seq_len, self.sliding_window)
        for i, layer in enumerate(self.layers):
            mask = band_mask if self._layer_types[i] == "sliding_attention" else None
            h = layer(params["layers"][i], h, pe, attention_mask=mask)
        h = self.norm(params["norm"], h)
        h = self.proj_out(params["proj_out"], h)
        return h.reshape(b, num_tokens * self.pool_window_size, -1)


class AceStepAudioTokenizer(Module, ModelMixin, ConfigMixin):
    """25 Hz acoustic latents → 5 Hz FSQ audio tokens (reference :665)."""

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        audio_acoustic_hidden_dim: int = 64,
        pool_window_size: int = 5,
        fsq_dim: int = 2048,
        fsq_input_levels: Optional[list] = None,
        fsq_input_num_quantizers: int = 1,
        num_attention_pooler_hidden_layers: int = 2,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        if fsq_input_levels is None:
            fsq_input_levels = [8, 8, 8, 5, 5, 5]
        self.audio_acoustic_proj = Linear(audio_acoustic_hidden_dim, hidden_size)
        self.attention_pooler = AceStepAttentionPooler(
            hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_attention_pooler_hidden_layers=num_attention_pooler_hidden_layers,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rope_theta=rope_theta, attention_bias=attention_bias,
            rms_norm_eps=rms_norm_eps, sliding_window=sliding_window, layer_types=layer_types,
        )
        self.quantizer = _AceStepResidualFSQ(
            dim=fsq_dim, levels=fsq_input_levels, num_quantizers=fsq_input_num_quantizers
        )
        self.pool_window_size = pool_window_size

    def __call__(self, params: Params, hidden_states: jax.Array):
        input_dtype = hidden_states.dtype
        h = self.audio_acoustic_proj(params["audio_acoustic_proj"], hidden_states)
        h = self.attention_pooler(params["attention_pooler"], h)
        quantized, indices = self.quantizer(params["quantizer"], h)
        return quantized.astype(input_dtype), indices

    def tokenize(self, params: Params, hidden_states: jax.Array,
                 silence_latent: Optional[jax.Array] = None):
        b, latent_length, acoustic_dim = hidden_states.shape
        pad_len = (-latent_length) % self.pool_window_size
        if pad_len:
            if silence_latent is not None and silence_latent.shape[-1] == acoustic_dim:
                pad = jnp.broadcast_to(
                    silence_latent[:, :pad_len, :].astype(hidden_states.dtype), (b, pad_len, acoustic_dim)
                )
            else:
                pad = jnp.zeros((b, pad_len, acoustic_dim), hidden_states.dtype)
            hidden_states = jnp.concatenate([hidden_states, pad], axis=1)
        num_patches = hidden_states.shape[1] // self.pool_window_size
        hidden_states = hidden_states.reshape(b, num_patches, self.pool_window_size, acoustic_dim)
        return self(params, hidden_states)


class AceStepConditionEncoder(Module, ModelMixin, ConfigMixin):
    """Text + lyric + timbre fusion (reference AceStepConditionEncoder :752).

    `null_condition_emb` is the learned CFG null embedding; `silence_latent`
    ships as a persistent buffer (VAE-encoded silence) — both live in the
    param tree.
    """

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        text_hidden_dim: int = 1024,
        timbre_hidden_dim: int = 64,
        num_lyric_encoder_hidden_layers: int = 8,
        num_timbre_encoder_hidden_layers: int = 4,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[list] = None,
    ):
        super().__init__()
        self.hidden_size = hidden_size
        self.timbre_hidden_dim = timbre_hidden_dim
        self.text_projector = Linear(text_hidden_dim, hidden_size, use_bias=False)
        self.lyric_encoder = AceStepLyricEncoder(
            hidden_size=hidden_size, intermediate_size=intermediate_size,
            text_hidden_dim=text_hidden_dim,
            num_lyric_encoder_hidden_layers=num_lyric_encoder_hidden_layers,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rope_theta=rope_theta, attention_bias=attention_bias,
            rms_norm_eps=rms_norm_eps, sliding_window=sliding_window, layer_types=layer_types,
        )
        self.timbre_encoder = AceStepTimbreEncoder(
            hidden_size=hidden_size, intermediate_size=intermediate_size,
            timbre_hidden_dim=timbre_hidden_dim,
            num_timbre_encoder_hidden_layers=num_timbre_encoder_hidden_layers,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rope_theta=rope_theta, attention_bias=attention_bias,
            rms_norm_eps=rms_norm_eps, sliding_window=sliding_window,
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 29)
        params["null_condition_emb"] = jax.random.normal(k, (1, 1, self.hidden_size), dtype)
        params["silence_latent"] = jnp.zeros((1, 15000, self.timbre_hidden_dim), dtype)
        return params

    def __call__(
        self,
        params: Params,
        text_hidden_states: jax.Array,
        text_attention_mask: jax.Array,
        lyric_hidden_states: jax.Array,
        lyric_attention_mask: jax.Array,
        refer_audio_acoustic_hidden_states_packed: jax.Array,
        refer_audio_order_mask: np.ndarray,
    ) -> Tuple[jax.Array, jax.Array]:
        text_hidden_states = self.text_projector(params["text_projector"], text_hidden_states)
        lyric_hidden_states = self.lyric_encoder(
            params["lyric_encoder"], lyric_hidden_states, lyric_attention_mask
        )
        timbre_unpacked, timbre_mask = self.timbre_encoder(
            params["timbre_encoder"], refer_audio_acoustic_hidden_states_packed, refer_audio_order_mask
        )
        h, m = _pack_sequences(lyric_hidden_states, timbre_unpacked, lyric_attention_mask, timbre_mask)
        h, m = _pack_sequences(h, text_hidden_states, m, text_attention_mask)
        return h, m

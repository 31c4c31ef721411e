"""Kandinsky5Transformer3DModel — Kandinsky 5.0 video/image DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_kandinsky.py:510`;
Kandinsky5TransformerEncoderBlock `:441` (text refiner), DecoderBlock `:467`
(visual), Attention `:344`, TimeEmbeddings `:157`, RoPE1D/3D `:211/:230`,
OutLayer `:404`). Text tokens are first refined by `num_text_blocks`
time-modulated self-attention blocks, then the visual token stream runs
`num_visual_blocks` decoder blocks with 9-parameter AdaLN modulation
(self-attn / cross-attn / FF each get shift+scale+gate).

TPU-first: RoPE rotation tables are precomputed host-side (numpy, float64)
as flat cos/sin vectors for the interleaved-pair convention; visual tokens
stay flattened `[B, N, D]` through the whole stack (the reference's fractal
block reordering is only needed for its flex-attention nabla kernel);
modulation/normalization arithmetic runs in float32 (the `.float()`
discipline of the reference, `_keep_in_fp32_modules`), matmuls in the
payload dtype.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import Timesteps, apply_rotary_emb, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class Kandinsky5TimeEmbeddings(Module):
    """Sinusoid([cos|sin]) -> Linear -> SiLU -> Linear (reference `:157`)."""

    def __init__(self, model_dim: int, time_dim: int, max_period: float = 10000.0):
        super().__init__()
        self.sinusoid = Timesteps(num_channels=model_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.in_layer = Linear(model_dim, time_dim, use_bias=True)
        self.out_layer = Linear(time_dim, time_dim, use_bias=True)

    def __call__(self, params: Params, time: jax.Array) -> jax.Array:
        emb = self.sinusoid({}, time.astype(jnp.float32))
        emb = emb.astype(params["in_layer"]["kernel"].dtype)
        return self.out_layer(params["out_layer"], jax.nn.silu(self.in_layer(params["in_layer"], emb)))


class Kandinsky5TextEmbeddings(Module):
    def __init__(self, text_dim: int, model_dim: int):
        super().__init__()
        self.in_layer = Linear(text_dim, model_dim, use_bias=True)
        self.norm = LayerNorm(model_dim)

    def __call__(self, params: Params, text_embed: jax.Array) -> jax.Array:
        text_embed = self.in_layer(params["in_layer"], text_embed)
        return self.norm(params["norm"], text_embed).astype(text_embed.dtype)


class Kandinsky5VisualEmbeddings(Module):
    """Patchify [B,F,H,W,C] by `patch_size` and project (reference `:186`)."""

    def __init__(self, visual_dim: int, model_dim: int, patch_size: Tuple[int, int, int]):
        super().__init__()
        self.patch_size = tuple(patch_size)
        self.in_layer = Linear(math.prod(patch_size) * visual_dim, model_dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        p_t, p_h, p_w = self.patch_size
        x = x.reshape(b, f // p_t, p_t, h // p_h, p_h, w // p_w, p_w, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
        x = x.reshape(b, f // p_t, h // p_h, w // p_w, p_t * p_h * p_w * c)
        return self.in_layer(params["in_layer"], x)


class Kandinsky5Modulation(Module):
    """SiLU -> zero-init Linear producing `num_params` AdaLN vectors (`:263`)."""

    def __init__(self, time_dim: int, model_dim: int, num_params: int):
        super().__init__()
        self.out_layer = Linear(time_dim, num_params * model_dim, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["out_layer"]["kernel"] = jnp.zeros_like(params["out_layer"]["kernel"])
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.out_layer(params["out_layer"], jax.nn.silu(x))


class Kandinsky5Attention(Module):
    """qk-RMSNorm (per head, float32) + interleaved RoPE (reference `:275`)."""

    def __init__(self, num_channels: int, head_dim: int):
        super().__init__()
        assert num_channels % head_dim == 0
        self.num_heads = num_channels // head_dim
        self.head_dim = head_dim
        self.to_query = Linear(num_channels, num_channels, use_bias=True)
        self.to_key = Linear(num_channels, num_channels, use_bias=True)
        self.to_value = Linear(num_channels, num_channels, use_bias=True)
        self.query_norm = RMSNorm(head_dim)
        self.key_norm = RMSNorm(head_dim)
        self.out_layer = Linear(num_channels, num_channels, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        b, sq = hidden_states.shape[:2]
        sk = context.shape[1]
        q = self.to_query(params["to_query"], hidden_states).reshape(b, sq, self.num_heads, self.head_dim)
        k = self.to_key(params["to_key"], context).reshape(b, sk, self.num_heads, self.head_dim)
        v = self.to_value(params["to_value"], context).reshape(b, sk, self.num_heads, self.head_dim)
        q = self.query_norm(params["query_norm"], q)
        k = self.key_norm(params["key_norm"], k)
        if rotary_emb is not None:
            cos, sin = rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        out = dispatch_attention_fn(q, k, v)
        out = out.reshape(b, sq, -1).astype(hidden_states.dtype)
        return self.out_layer(params["out_layer"], out)


class Kandinsky5FeedForward(Module):
    def __init__(self, dim: int, ff_dim: int):
        super().__init__()
        self.in_layer = Linear(dim, ff_dim, use_bias=False)
        self.out_layer = Linear(ff_dim, dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.out_layer(params["out_layer"], jax.nn.gelu(self.in_layer(params["in_layer"], x), approximate=False))


def _modulate(norm: Module, norm_params: Params, x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    out = norm(norm_params, x.astype(jnp.float32)) * (scale.astype(jnp.float32) + 1.0) + shift.astype(jnp.float32)
    return out.astype(x.dtype)


def _gated_residual(x: jax.Array, out: jax.Array, gate: jax.Array) -> jax.Array:
    return (x.astype(jnp.float32) + gate.astype(jnp.float32) * out.astype(jnp.float32)).astype(x.dtype)


class Kandinsky5TransformerEncoderBlock(Module):
    """Text-refiner block: modulated self-attention + FF (reference `:441`)."""

    def __init__(self, model_dim: int, time_dim: int, ff_dim: int, head_dim: int):
        super().__init__()
        self.text_modulation = Kandinsky5Modulation(time_dim, model_dim, 6)
        self.self_attention_norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.self_attention = Kandinsky5Attention(model_dim, head_dim)
        self.feed_forward_norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.feed_forward = Kandinsky5FeedForward(model_dim, ff_dim)

    def __call__(self, params: Params, x: jax.Array, time_embed: jax.Array, rope) -> jax.Array:
        mods = self.text_modulation(params["text_modulation"], time_embed)[:, None]
        sa_shift, sa_scale, sa_gate, ff_shift, ff_scale, ff_gate = jnp.split(mods, 6, axis=-1)
        out = _modulate(self.self_attention_norm, {}, x, sa_shift, sa_scale)
        out = self.self_attention(params["self_attention"], out, rotary_emb=rope)
        x = _gated_residual(x, out, sa_gate)
        out = _modulate(self.feed_forward_norm, {}, x, ff_shift, ff_scale)
        out = self.feed_forward(params["feed_forward"], out)
        return _gated_residual(x, out, ff_gate)


class Kandinsky5TransformerDecoderBlock(Module):
    """Visual block: 9-param modulation over self-attn/cross-attn/FF (`:467`)."""

    def __init__(self, model_dim: int, time_dim: int, ff_dim: int, head_dim: int):
        super().__init__()
        self.visual_modulation = Kandinsky5Modulation(time_dim, model_dim, 9)
        self.self_attention_norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.self_attention = Kandinsky5Attention(model_dim, head_dim)
        self.cross_attention_norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.cross_attention = Kandinsky5Attention(model_dim, head_dim)
        self.feed_forward_norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.feed_forward = Kandinsky5FeedForward(model_dim, ff_dim)

    def __call__(self, params: Params, visual_embed, text_embed, time_embed, rope) -> jax.Array:
        mods = self.visual_modulation(params["visual_modulation"], time_embed)[:, None]
        (sa_shift, sa_scale, sa_gate, ca_shift, ca_scale, ca_gate, ff_shift, ff_scale, ff_gate) = jnp.split(
            mods, 9, axis=-1
        )
        out = _modulate(self.self_attention_norm, {}, visual_embed, sa_shift, sa_scale)
        out = self.self_attention(params["self_attention"], out, rotary_emb=rope)
        visual_embed = _gated_residual(visual_embed, out, sa_gate)

        out = _modulate(self.cross_attention_norm, {}, visual_embed, ca_shift, ca_scale)
        out = self.cross_attention(params["cross_attention"], out, encoder_hidden_states=text_embed)
        visual_embed = _gated_residual(visual_embed, out, ca_gate)

        out = _modulate(self.feed_forward_norm, {}, visual_embed, ff_shift, ff_scale)
        out = self.feed_forward(params["feed_forward"], out)
        return _gated_residual(visual_embed, out, ff_gate)


class Kandinsky5OutLayer(Module):
    def __init__(self, model_dim: int, time_dim: int, visual_dim: int, patch_size: Tuple[int, int, int]):
        super().__init__()
        self.patch_size = tuple(patch_size)
        self.visual_dim = visual_dim
        self.modulation = Kandinsky5Modulation(time_dim, model_dim, 2)
        self.norm = LayerNorm(model_dim, use_scale=False, use_bias=False)
        self.out_layer = Linear(model_dim, math.prod(patch_size) * visual_dim, use_bias=True)

    def __call__(self, params: Params, visual_embed: jax.Array, time_embed: jax.Array, grid) -> jax.Array:
        """visual_embed: [B, N, D]; grid: (T, Hp, Wp) patch grid -> [B,F,H,W,C]."""
        shift, scale = jnp.split(self.modulation(params["modulation"], time_embed)[:, None], 2, axis=-1)
        x = _modulate(self.norm, {}, visual_embed, shift, scale)
        x = self.out_layer(params["out_layer"], x)
        b = x.shape[0]
        t, hp, wp = grid
        p_t, p_h, p_w = self.patch_size
        x = x.reshape(b, t, hp, wp, self.visual_dim, p_t, p_h, p_w)
        x = jnp.einsum("bthwcpqr->btphqwrc", x)
        return x.reshape(b, t * p_t, hp * p_h, wp * p_w, self.visual_dim)


def _rope_tables_1d(dim: int, pos: np.ndarray, scale: float = 1.0, max_period: float = 10000.0):
    """Interleaved cos/sin tables: exponent arange(dim/2)/(dim/2) (reference `:39`)."""
    cos, sin = get_1d_rotary_pos_embed_np(dim, np.asarray(pos, dtype=np.float64) / scale, theta=max_period)
    return cos, sin


class Kandinsky5RoPE3D:
    """Host-side 3-axis rotary tables, flattened to [1, T*H*W, 1, head_dim]."""

    def __init__(self, axes_dims: Tuple[int, int, int], max_period: float = 10000.0):
        self.axes_dims = tuple(axes_dims)
        self.max_period = max_period

    def __call__(self, pos_t, pos_h, pos_w, scale_factor=(1.0, 1.0, 1.0)):
        tables = [
            _rope_tables_1d(d, p, s, self.max_period)
            for d, p, s in zip(self.axes_dims, (pos_t, pos_h, pos_w), scale_factor)
        ]
        t, h, w = len(pos_t), len(pos_h), len(pos_w)

        def grid(idx):
            parts = []
            for ax, (cos, sin) in enumerate(tables):
                tab = (cos, sin)[idx]
                shape = [1, 1, 1, tab.shape[-1]]
                shape[ax] = tab.shape[0]
                parts.append(np.broadcast_to(tab.reshape(shape), (t, h, w, tab.shape[-1])))
            return np.concatenate(parts, axis=-1).reshape(1, t * h * w, 1, -1)

        return jnp.asarray(grid(0)), jnp.asarray(grid(1))


class Kandinsky5Transformer3DModel(Module, ModelMixin, ConfigMixin):
    """Reference `transformer_kandinsky.py:510`. Input/output latents are
    channels-last `[B, F, H, W, C]` (the reference's native layout)."""

    @register_to_config
    def __init__(
        self,
        in_visual_dim: int = 4,
        in_text_dim: int = 3584,
        in_text_dim2: int = 768,
        time_dim: int = 512,
        out_visual_dim: int = 4,
        patch_size: Tuple[int, int, int] = (1, 2, 2),
        model_dim: int = 2048,
        ff_dim: int = 5120,
        num_text_blocks: int = 2,
        num_visual_blocks: int = 32,
        axes_dims: Tuple[int, int, int] = (16, 24, 24),
        visual_cond: bool = False,
        attention_type: str = "regular",
        attention_causal: Optional[bool] = None,
        attention_local: Optional[bool] = None,
        attention_glob: Optional[bool] = None,
        attention_window: Optional[int] = None,
        attention_P: Optional[float] = None,
        attention_wT: Optional[int] = None,
        attention_wW: Optional[int] = None,
        attention_wH: Optional[int] = None,
        attention_add_sta: Optional[bool] = None,
        attention_method: Optional[str] = None,
    ):
        super().__init__()
        head_dim = sum(axes_dims)
        self.head_dim = head_dim
        visual_embed_dim = 2 * in_visual_dim + 1 if visual_cond else in_visual_dim

        self.time_embeddings = Kandinsky5TimeEmbeddings(model_dim, time_dim)
        self.text_embeddings = Kandinsky5TextEmbeddings(in_text_dim, model_dim)
        self.pooled_text_embeddings = Kandinsky5TextEmbeddings(in_text_dim2, time_dim)
        self.visual_embeddings = Kandinsky5VisualEmbeddings(visual_embed_dim, model_dim, patch_size)
        self.visual_rope = Kandinsky5RoPE3D(axes_dims)

        self.text_transformer_blocks = ModuleList(
            [Kandinsky5TransformerEncoderBlock(model_dim, time_dim, ff_dim, head_dim) for _ in range(num_text_blocks)]
        )
        self.visual_transformer_blocks = ModuleList(
            [Kandinsky5TransformerDecoderBlock(model_dim, time_dim, ff_dim, head_dim) for _ in range(num_visual_blocks)]
        )
        self.out_layer = Kandinsky5OutLayer(model_dim, time_dim, out_visual_dim, patch_size)

    def compute_rope(self, num_frames: int, height: int, width: int, scale_factor=(1.0, 1.0, 1.0),
                     visual_rope_pos=None, text_rope_len: int = 256):
        """Host-side rotary tables for a latent grid (already patch-divided)."""
        p_t, p_h, p_w = self.config.patch_size
        t, hp, wp = num_frames // p_t, height // p_h, width // p_w
        if visual_rope_pos is None:
            visual_rope_pos = (np.arange(t), np.arange(hp), np.arange(wp))
        visual = self.visual_rope(*visual_rope_pos, scale_factor=scale_factor)
        cos, sin = _rope_tables_1d(self.head_dim, np.arange(text_rope_len))
        text = (jnp.asarray(cos.reshape(1, -1, 1, cos.shape[-1])), jnp.asarray(sin.reshape(1, -1, 1, sin.shape[-1])))
        return visual, text

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, F, H, W, C] channels-last latents
        encoder_hidden_states: jax.Array,  # [B, S, in_text_dim]
        timestep: jax.Array,  # [B]
        pooled_projections: jax.Array,  # [B, in_text_dim2]
        visual_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
        text_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
        scale_factor: Tuple[float, float, float] = (1.0, 1.0, 1.0),
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        if self.config.attention_type not in ("regular", None):
            raise NotImplementedError(
                f"attention_type={self.config.attention_type!r}: the reference's nabla path needs "
                "torch flex attention and is likewise unavailable there without it (reference `:130`)."
            )
        b, f, h, w, _ = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        grid = (f // p_t, h // p_h, w // p_w)
        if visual_rope is None or text_rope is None:
            v_rope, t_rope = self.compute_rope(f, h, w, scale_factor, text_rope_len=encoder_hidden_states.shape[1])
            visual_rope = visual_rope or v_rope
            text_rope = text_rope or t_rope

        text_embed = self.text_embeddings(params["text_embeddings"], encoder_hidden_states)
        time_embed = self.time_embeddings(params["time_embeddings"], timestep)
        time_embed = time_embed + self.pooled_text_embeddings(params["pooled_text_embeddings"], pooled_projections)
        visual_embed = self.visual_embeddings(params["visual_embeddings"], hidden_states)
        visual_embed = visual_embed.reshape(b, -1, visual_embed.shape[-1])

        for i, block in enumerate(self.text_transformer_blocks):
            text_embed = block(params["text_transformer_blocks"][i], text_embed, time_embed, text_rope)

        for i, block in enumerate(self.visual_transformer_blocks):
            visual_embed = block(
                params["visual_transformer_blocks"][i], visual_embed, text_embed, time_embed, visual_rope
            )

        out = self.out_layer(params["out_layer"], visual_embed, time_embed, grid)
        if not return_dict:
            return (out,)
        return Transformer2DModelOutput(sample=out)

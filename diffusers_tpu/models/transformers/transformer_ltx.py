"""LTXVideoTransformer3DModel — rectified-flow video DiT (Lightricks LTX-Video).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_ltx.py:385`
LTXVideoTransformer3DModel; LTXVideoTransformerBlock `:282`,
LTXVideoRotaryPosEmbed `:179`, LTXVideoAttnProcessor `:48`, per-dim
apply_rotary_emb `:594`). TPU-first: one [B, S, D] token stream (frames ×
height × width flattened), per-batch float32 RoPE tables computed on the
fly from video coords, qk-RMSNorm across the full inner dim before the head
split, attention through the dispatch layer.

Param-tree names match the reference state dict (proj_in, time_embed,
caption_projection, transformer_blocks.N.{norm1,attn1,norm2,attn2,ff,
scale_shift_table}, norm_out, proj_out) so checkpoints load mechanically.
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
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import AdaLayerNormSingle


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def ltx_apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation on the full channel dim (reference
    transformer_ltx.py:594 apply_rotary_emb): x [B, S, D], cos/sin [B, S, D]."""
    x_f = x.astype(jnp.float32)
    x_r = x_f.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x_r[..., 0], x_r[..., 1]
    x_rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return (x_f * cos + x_rot * sin).astype(x.dtype)


class LTXVideoRotaryPosEmbed(Module):
    """3-axis (frame, height, width) RoPE over flattened video tokens
    (reference LTXVideoRotaryPosEmbed, transformer_ltx.py:179)."""

    def __init__(
        self,
        dim: int,
        base_num_frames: int = 20,
        base_height: int = 2048,
        base_width: int = 2048,
        patch_size: int = 1,
        patch_size_t: int = 1,
        theta: float = 10000.0,
    ):
        super().__init__()
        self.dim = dim
        self.base_num_frames = base_num_frames
        self.base_height = base_height
        self.base_width = base_width
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.theta = theta

    def prepare_video_coords(self, batch_size, num_frames, height, width, rope_interpolation_scale=None):
        grid_f, grid_h, grid_w = np.meshgrid(
            np.arange(num_frames, dtype=np.float32),
            np.arange(height, dtype=np.float32),
            np.arange(width, dtype=np.float32),
            indexing="ij",
        )
        grid = np.stack([grid_f, grid_h, grid_w], axis=0)  # [3, F, H, W]
        grid = np.broadcast_to(grid[None], (batch_size, *grid.shape)).copy()
        if rope_interpolation_scale is not None:
            grid[:, 0] = grid[:, 0] * rope_interpolation_scale[0] * self.patch_size_t / self.base_num_frames
            grid[:, 1] = grid[:, 1] * rope_interpolation_scale[1] * self.patch_size / self.base_height
            grid[:, 2] = grid[:, 2] * rope_interpolation_scale[2] * self.patch_size / self.base_width
        return grid.reshape(batch_size, 3, -1).transpose(0, 2, 1)  # [B, S, 3]

    def __call__(
        self,
        params: Params,
        grid,  # [B, S, 3] scaled video coords (host numpy or jnp)
    ) -> Tuple[jax.Array, jax.Array]:
        grid = jnp.asarray(grid, jnp.float32)
        n_freqs = self.dim // 6
        freqs = self.theta ** jnp.linspace(
            math.log(1.0, self.theta) if self.theta != 1.0 else 0.0, 1.0, n_freqs, dtype=jnp.float32
        )
        freqs = freqs * math.pi / 2.0
        freqs = freqs * (grid[..., None] * 2 - 1)  # [B, S, 3, dim//6]
        freqs = jnp.swapaxes(freqs, -1, -2).reshape(*grid.shape[:2], -1)  # [B, S, 3*dim//6]
        cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
        pad = self.dim % 6
        if pad:
            cos = jnp.concatenate([jnp.ones_like(cos[:, :, :pad]), cos], axis=-1)
            sin = jnp.concatenate([jnp.zeros_like(sin[:, :, :pad]), sin], axis=-1)
        return cos, sin


class LTXAttention(Module):
    """qk-RMSNorm-across-heads attention with full-dim RoPE (reference
    LTXAttention + LTXVideoAttnProcessor, transformer_ltx.py:115,48)."""

    def __init__(
        self,
        query_dim: int,
        heads: int = 8,
        kv_heads: int = 8,
        dim_head: int = 64,
        bias: bool = True,
        cross_attention_dim: Optional[int] = None,
        out_bias: bool = True,
        eps: float = 1e-5,
    ):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.inner_dim = dim_head * heads
        self.inner_kv_dim = dim_head * kv_heads
        self.cross_attention_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.norm_q = RMSNorm(self.inner_dim, eps=eps)
        self.norm_k = RMSNorm(self.inner_kv_dim, eps=eps)
        self.to_q = Linear(query_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)
        self.to_v = Linear(self.cross_attention_dim, self.inner_kv_dim, use_bias=bias)
        self.to_out = ModuleList([Linear(self.inner_dim, query_dim, use_bias=out_bias)])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        b, s, _ = hidden_states.shape
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self.to_q(params["to_q"], hidden_states)
        k = self.to_k(params["to_k"], context)
        v = self.to_v(params["to_v"], context)
        # RMSNorm across the full inner dim, BEFORE the head split
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = ltx_apply_rotary_emb(q, cos, sin)
            k = ltx_apply_rotary_emb(k, cos, sin)
        q = q.reshape(b, s, self.heads, self.dim_head)
        k = k.reshape(b, -1, self.heads, self.dim_head)
        v = v.reshape(b, -1, self.heads, self.dim_head)
        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, s, self.inner_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class LTXVideoTransformerBlock(Module):
    """Reference LTXVideoTransformerBlock (transformer_ltx.py:282): RMSNorm
    (no affine) + per-token scale_shift_table adaLN, self-attn with RoPE,
    plain cross-attn, gated FF."""

    def __init__(
        self,
        dim: int,
        num_attention_heads: int,
        attention_head_dim: int,
        cross_attention_dim: int,
        activation_fn: str = "gelu-approximate",
        attention_bias: bool = True,
        attention_out_bias: bool = True,
        eps: float = 1e-6,
    ):
        super().__init__()
        self.dim = dim
        self.norm1 = RMSNorm(dim, eps=eps, use_scale=False)
        self.attn1 = LTXAttention(
            query_dim=dim, heads=num_attention_heads, kv_heads=num_attention_heads,
            dim_head=attention_head_dim, bias=attention_bias, out_bias=attention_out_bias,
        )
        self.norm2 = RMSNorm(dim, eps=eps, use_scale=False)
        self.attn2 = LTXAttention(
            query_dim=dim, cross_attention_dim=cross_attention_dim, heads=num_attention_heads,
            kv_heads=num_attention_heads, dim_head=attention_head_dim, bias=attention_bias,
            out_bias=attention_out_bias,
        )
        self.ff = FeedForward(dim, activation_fn=activation_fn)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 7)
        params["scale_shift_table"] = jax.random.normal(k, (6, self.dim), jnp.float32) / self.dim**0.5
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        temb: jax.Array,  # [B, T, 6*dim] (T=1 or per-token)
        image_rotary_emb=None,
        encoder_attention_mask: Optional[jax.Array] = None,
        pab=None,
    ) -> jax.Array:
        b = hidden_states.shape[0]
        ada = params["scale_shift_table"][None, None].astype(jnp.float32) + temb.reshape(
            b, temb.shape[1], 6, -1
        ).astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m[:, :, 0].astype(hidden_states.dtype) for m in jnp.split(ada, 6, axis=2)
        ]

        norm_hidden = self.norm1({}, hidden_states)
        norm_hidden = norm_hidden * (1 + scale_msa) + shift_msa
        if pab is None:
            attn_out = self.attn1(params["attn1"], norm_hidden, image_rotary_emb=image_rotary_emb)
        else:
            # PAB: reuse the cached self-attention output on broadcast steps
            # (hooks/pyramid_attention_broadcast.py)
            from ...hooks.pyramid_attention_broadcast import pab_gate

            compute, cached = pab
            attn_out = pab_gate(
                compute, cached,
                lambda: self.attn1(params["attn1"], norm_hidden, image_rotary_emb=image_rotary_emb))
        new_pab = attn_out if pab is not None else None
        hidden_states = hidden_states + attn_out * gate_msa

        attn_out = self.attn2(
            params["attn2"], hidden_states, encoder_hidden_states=encoder_hidden_states,
            attention_mask=encoder_attention_mask,
        )
        hidden_states = hidden_states + attn_out
        norm_hidden = self.norm2({}, hidden_states) * (1 + scale_mlp) + shift_mlp
        hidden_states = hidden_states + self.ff(params["ff"], norm_hidden) * gate_mlp
        if pab is not None:
            return hidden_states, new_pab
        return hidden_states


class LTXVideoTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        out_channels: int = 128,
        patch_size: int = 1,
        patch_size_t: int = 1,
        num_attention_heads: int = 32,
        attention_head_dim: int = 64,
        cross_attention_dim: int = 2048,
        num_layers: int = 28,
        activation_fn: str = "gelu-approximate",
        qk_norm: str = "rms_norm_across_heads",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        caption_channels: int = 4096,
        attention_bias: bool = True,
        attention_out_bias: bool = True,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim

        self.proj_in = Linear(in_channels, inner_dim)
        self.time_embed = AdaLayerNormSingle(inner_dim, use_additional_conditions=False)
        self.caption_projection = PixArtAlphaTextProjection(in_features=caption_channels, hidden_size=inner_dim)
        self.rope = LTXVideoRotaryPosEmbed(
            dim=inner_dim, base_num_frames=20, base_height=2048, base_width=2048,
            patch_size=patch_size, patch_size_t=patch_size_t, theta=10000.0,
        )
        self.transformer_blocks = ModuleList(
            [
                LTXVideoTransformerBlock(
                    dim=inner_dim,
                    num_attention_heads=num_attention_heads,
                    attention_head_dim=attention_head_dim,
                    cross_attention_dim=cross_attention_dim,
                    activation_fn=activation_fn,
                    attention_bias=attention_bias,
                    attention_out_bias=attention_out_bias,
                    eps=norm_eps,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 11)
        params["scale_shift_table"] = jax.random.normal(k, (2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, S, in_channels] (packed video latents)
        encoder_hidden_states: jax.Array,  # [B, S_txt, caption_channels]
        timestep: jax.Array,  # [B] or [B, T] in train-timestep units
        encoder_attention_mask: Optional[jax.Array] = None,  # [B, S_txt] 1/0
        num_frames: Optional[int] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        rope_interpolation_scale: Optional[Tuple[float, float, float]] = None,
        video_coords: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        scan_blocks: bool = False,
        fbc_state=None,
        fbc_config=None,
        pab_compute=None,
        pab_cache=None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size = hidden_states.shape[0]
        if image_rotary_emb is None:
            if video_coords is None:
                grid = self.rope.prepare_video_coords(
                    batch_size, num_frames, height, width, rope_interpolation_scale
                )
            else:
                grid = jnp.stack(
                    [
                        video_coords[:, 0] / self.rope.base_num_frames,
                        video_coords[:, 1] / self.rope.base_height,
                        video_coords[:, 2] / self.rope.base_width,
                    ],
                    axis=-1,
                )
            image_rotary_emb = self.rope({}, grid)

        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            # bool/int mask → additive bias broadcast over heads and queries
            bias = (1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
            encoder_attention_mask = bias[:, None, None, :]

        hidden_states = self.proj_in(params["proj_in"], hidden_states)
        temb, embedded_timestep = self.time_embed(
            params["time_embed"], jnp.ravel(timestep), batch_size=batch_size, dtype=hidden_states.dtype
        )
        temb = temb.reshape(batch_size, -1, temb.shape[-1])
        embedded_timestep = embedded_timestep.reshape(batch_size, -1, embedded_timestep.shape[-1])

        encoder_hidden_states = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        encoder_hidden_states = encoder_hidden_states.reshape(batch_size, -1, hidden_states.shape[-1])

        if fbc_state is not None:
            # first-block cache (hooks/first_block_cache.py)
            from ...hooks.first_block_cache import fbc_single_gate

            first_in = hidden_states
            hidden_states = self.transformer_blocks[0](
                params["transformer_blocks"][0], hidden_states, encoder_hidden_states, temb,
                image_rotary_emb, encoder_attention_mask,
            )

            def tail(h):
                for i, block in enumerate(self.transformer_blocks):
                    if i == 0:
                        continue
                    h = block(params["transformer_blocks"][i], h, encoder_hidden_states, temb,
                              image_rotary_emb, encoder_attention_mask)
                return h

            hidden_states, fbc_state = fbc_single_gate(
                fbc_state, fbc_config, hidden_states - first_in, hidden_states, tail
            )
        elif scan_blocks:
            stack = params["transformer_blocks"]
            if isinstance(stack, dict) and 0 in stack:
                stack = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[params["transformer_blocks"][i] for i in range(len(self.transformer_blocks))],
                )
            block = self.transformer_blocks[0]

            def body(hidden, block_params):
                hidden = block(
                    block_params, hidden, encoder_hidden_states, temb,
                    image_rotary_emb, encoder_attention_mask,
                )
                return hidden, None

            hidden_states, _ = jax.lax.scan(body, hidden_states, stack)
        elif pab_cache is not None:
            new_pab_cache = {}
            for i, block in enumerate(self.transformer_blocks):
                hidden_states, new_pab_cache[i] = block(
                    params["transformer_blocks"][i], hidden_states, encoder_hidden_states,
                    temb, image_rotary_emb, encoder_attention_mask,
                    pab=(pab_compute, pab_cache[i]),
                )
        else:
            for i, block in enumerate(self.transformer_blocks):
                hidden_states = block(
                    params["transformer_blocks"][i],
                    hidden_states,
                    encoder_hidden_states,
                    temb,
                    image_rotary_emb,
                    encoder_attention_mask,
                )

        scale_shift = params["scale_shift_table"][None, None].astype(jnp.float32) + embedded_timestep[
            :, :, None
        ].astype(jnp.float32)
        shift, scale = scale_shift[:, :, 0].astype(hidden_states.dtype), scale_shift[:, :, 1].astype(hidden_states.dtype)

        hidden_states = self.norm_out({}, hidden_states)
        hidden_states = hidden_states * (1 + scale) + shift
        output = self.proj_out(params["proj_out"], hidden_states)

        if fbc_state is not None:
            if not return_dict:
                return (output, fbc_state)
            return Transformer2DModelOutput(sample=output), fbc_state
        if pab_cache is not None:
            if not return_dict:
                return (output, new_pab_cache)
            return Transformer2DModelOutput(sample=output), new_pab_cache
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

    def init_pab_cache(self, batch_size: int, tokens: int, dtype=jnp.float32):
        """Zero per-block self-attention caches for PAB (step 0 always
        computes, so zeros are never consumed)."""
        dim = self.config.num_attention_heads * self.config.attention_head_dim
        return {i: jnp.zeros((batch_size, tokens, dim), dtype)
                for i in range(len(self.transformer_blocks))}

"""JoyImageEditPlusTransformer3DModel — multi-image editing MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_joyimage_edit_plus.py:317`):
the input arrives PRE-PATCHIFIED as padded 6D patches [B, max_patches, C, pt,
ph, pw] (each reference image and the target noise independently patchified
and concatenated, variable-resolution), per-sample 3D RoPE is built from a
host-side `shape_list` of (t, h, w) components with running temporal offsets
(`:478-506`), padded positions get identity rotation (cos=1, sin=0), and the
joint [img, txt] attention is masked to the real patches + text mask
(`:508-516`). Blocks are the JoyImage double-stream blocks (shared).

TPU-first: patchify is a single batched matmul over the flattened patch
pixels (the reference's per-patch Conv3d with kernel == stride == patch is
exactly a linear map); RoPE/mask construction is host-side numpy since
`shape_list` is static per call.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params
from ..modeling_utils import ModelMixin
from .transformer_joyimage import (
    JoyImageTimeTextImageEmbedding,
    JoyImageTransformerBlock,
    Transformer2DModelOutput,
)


def _rope_for_range(rope_dim_list, theta: float, start, stop):
    """3D RoPE table for the [start, stop) grid, interleaved convention
    (reference `_get_rotary_pos_embed_for_range`, `:417-442`)."""
    grids = np.meshgrid(*[np.arange(start[i], stop[i], dtype=np.float64) for i in range(3)],
                        indexing="ij")
    cos_parts, sin_parts = [], []
    for i, dim in enumerate(rope_dim_list):
        pos = grids[i].reshape(-1)
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
        angles = np.outer(pos, freqs)
        cos_parts.append(np.repeat(np.cos(angles), 2, axis=1))
        sin_parts.append(np.repeat(np.sin(angles), 2, axis=1))
    return np.concatenate(cos_parts, axis=1), np.concatenate(sin_parts, axis=1)


def _apply_rotary_batched(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved rotate-half with batched [B, S, D] tables (reference
    `_apply_rotary_emb_batched`, `:35-53`). x: [B, S, H, D]."""
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cos[:, :, None, :] + rot * sin[:, :, None, :]).astype(x.dtype)


class JoyImageEditPlusTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Multi-image editing DiT over padded patch sequences (reference `:317`)."""

    @register_to_config
    def __init__(
        self,
        patch_size: List[int] = [1, 2, 2],
        in_channels: int = 16,
        out_channels: Optional[int] = None,
        hidden_size: int = 3072,
        num_attention_heads: int = 24,
        text_dim: int = 4096,
        mlp_width_ratio: float = 4.0,
        num_layers: int = 20,
        rope_dim_list: List[int] = [16, 56, 56],
        rope_type: str = "rope",
        theta: int = 256,
    ):
        super().__init__()
        if hidden_size % num_attention_heads != 0:
            raise ValueError(f"hidden_size ({hidden_size}) must divide num_attention_heads")
        self.out_channels = out_channels or in_channels
        head_dim = hidden_size // num_attention_heads
        # kernel == stride == patch: a Conv3d that sees exactly one patch per
        # application — kept as Conv3d for state-dict parity ("img_in.weight")
        self.img_in = Conv3d(in_channels, hidden_size, kernel_size=tuple(patch_size),
                             stride=tuple(patch_size))
        self.condition_embedder = JoyImageTimeTextImageEmbedding(
            dim=hidden_size, time_freq_dim=256, time_proj_dim=hidden_size * 6,
            text_embed_dim=text_dim)
        self.double_blocks = ModuleList([
            JoyImageTransformerBlock(hidden_size, num_attention_heads, head_dim,
                                     mlp_width_ratio=mlp_width_ratio)
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(hidden_size, self.out_channels * math.prod(patch_size))

    def _build_rope(self, shape_list, max_patches: int):
        """Per-sample RoPE with temporal offsets between components; padded
        rows get identity rotation (cos=1, sin=0) (reference `:478-506`)."""
        theta = float(self.config.theta)
        cos_list, sin_list = [], []
        for comps in shape_list:
            parts_c, parts_s = [], []
            t_off = 0
            for (t, h, w) in comps:
                c, s = _rope_for_range(self.config.rope_dim_list, theta,
                                       (t_off, 0, 0), (t_off + t, h, w))
                parts_c.append(c)
                parts_s.append(s)
                t_off += t
            c = np.concatenate(parts_c, axis=0)
            s = np.concatenate(parts_s, axis=0)
            pad = max_patches - c.shape[0]
            if pad > 0:
                c = np.concatenate([c, np.ones((pad, c.shape[1]))], axis=0)
                s = np.concatenate([s, np.zeros((pad, s.shape[1]))], axis=0)
            cos_list.append(c)
            sin_list.append(s)
        return (jnp.asarray(np.stack(cos_list), jnp.float32),
                jnp.asarray(np.stack(sin_list), jnp.float32))

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, max_patches, C, pt, ph, pw]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_mask: Optional[jax.Array] = None,
        shape_list: Optional[List[List[Tuple[int, int, int]]]] = None,
        return_dict: bool = True,
    ):
        if shape_list is None:
            raise ValueError("shape_list (per-sample (t, h, w) components) is required")
        batch_size, max_patches, channels, pt, ph, pw = hidden_states.shape

        # 1. conditioning
        _, vec, txt = self.condition_embedder(params["condition_embedder"], timestep,
                                              encoder_hidden_states)
        vec = vec.reshape(vec.shape[0], 6, -1)

        # 2. patch embed: each 6D patch is one conv application → run the
        # Conv3d over [B*N, pt, ph, pw, C] (NDHWC), output [B, N, D]
        x = hidden_states.reshape(batch_size * max_patches, channels, pt, ph, pw)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = self.img_in(params["img_in"], x).reshape(batch_size, max_patches, -1)

        # 3. per-component RoPE with temporal offsets (host-side; shape_list
        # is static per call signature)
        vis_freqs = self._build_rope(shape_list, max_patches)

        # 4. joint attention mask over [img ++ txt]
        additive_mask = None
        if encoder_hidden_states_mask is not None:
            img_mask = np.zeros((batch_size, max_patches), np.bool_)
            for i, comps in enumerate(shape_list):
                img_mask[i, : sum(t * h * w for t, h, w in comps)] = True
            full = jnp.concatenate(
                [jnp.asarray(img_mask), encoder_hidden_states_mask.astype(jnp.bool_)], axis=1)
            additive_mask = full[:, None, None, :]

        # 5. double-stream blocks (batched-RoPE wrapper around the shared block)
        for i, block in enumerate(self.double_blocks):
            x, txt = self._block_with_batched_rope(
                block, params["double_blocks"][i], x, txt, vec, vis_freqs, additive_mask)

        # 6. output projection back to 6D patches
        x = self.norm_out({}, x.astype(jnp.float32)).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)
        x = x.reshape(batch_size, max_patches, pt, ph, pw, self.out_channels)
        x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))
        if not return_dict:
            return (x,)
        return Transformer2DModelOutput(sample=x)

    @staticmethod
    def _block_with_batched_rope(block, bparams, img, txt, vec, vis_freqs, additive_mask):
        """Run a JoyImageTransformerBlock with the edit-plus batched-RoPE +
        masked joint attention (reference JoyImageEditPlusAttnProcessor)."""
        i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = block.img_mod(bparams["img_mod"], vec)
        t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = block.txt_mod(bparams["txt_mod"], vec)

        img_mod = (block.img_norm1({}, img.astype(jnp.float32)).astype(img.dtype)
                   * (1 + i_sc1[:, None]) + i_sh1[:, None])
        txt_mod = (block.txt_norm1({}, txt.astype(jnp.float32)).astype(txt.dtype)
                   * (1 + t_sc1[:, None]) + t_sh1[:, None])

        attn, ap = block.attn, bparams["attn"]
        b, s_img = img_mod.shape[:2]
        iq, ik, iv = jnp.split(attn.img_attn_qkv(ap["img_attn_qkv"], img_mod), 3, axis=-1)
        tq, tk, tv = jnp.split(attn.txt_attn_qkv(ap["txt_attn_qkv"], txt_mod), 3, axis=-1)

        def heads(x):
            return x.reshape(b, -1, attn.heads, attn.head_dim)

        iq, ik, iv = heads(iq), heads(ik), heads(iv)
        tq, tk, tv = heads(tq), heads(tk), heads(tv)
        iq = attn.img_attn_q_norm(ap["img_attn_q_norm"], iq)
        ik = attn.img_attn_k_norm(ap["img_attn_k_norm"], ik)
        tq = attn.txt_attn_q_norm(ap["txt_attn_q_norm"], tq)
        tk = attn.txt_attn_k_norm(ap["txt_attn_k_norm"], tk)
        cos, sin = vis_freqs
        iq = _apply_rotary_batched(iq, cos, sin)
        ik = _apply_rotary_batched(ik, cos, sin)

        from ...ops.attention import dispatch_attention_fn

        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        out = dispatch_attention_fn(q, k, v, attn_mask=additive_mask)
        out = out.reshape(b, -1, attn.heads * attn.head_dim).astype(q.dtype)
        img_attn = attn.img_attn_proj(ap["img_attn_proj"], out[:, :s_img])
        txt_attn = attn.txt_attn_proj(ap["txt_attn_proj"], out[:, s_img:])

        img = img + img_attn * i_g1[:, None]
        txt = txt + txt_attn * t_g1[:, None]
        img_ff = (block.img_norm2({}, img.astype(jnp.float32)).astype(img.dtype)
                  * (1 + i_sc2[:, None]) + i_sh2[:, None])
        txt_ff = (block.txt_norm2({}, txt.astype(jnp.float32)).astype(txt.dtype)
                  * (1 + t_sc2[:, None]) + t_sh2[:, None])
        img = img + block.img_mlp(bparams["img_mlp"], img_ff) * i_g2[:, None]
        txt = txt + block.txt_mlp(bparams["txt_mlp"], txt_ff) * t_g2[:, None]
        return img, txt

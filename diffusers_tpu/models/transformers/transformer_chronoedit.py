"""ChronoEditTransformer3DModel — ChronoEdit-14B video-editing DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_chronoedit.py:523`):
the blocks, condition embedder and output head are Wan's (every block class
is `# Copied from transformer_wan` there; reused here by subclassing
`WanTransformer3DModel`). The one architectural delta is the rotary embed
(`:361` ChronoEditRotaryPosEmbed): when the latent video has exactly TWO
frames (the post-reasoning edit pair) the temporal rope positions are
`[0, temporal_skip_len - 1]` instead of `[0, 1]`, keeping the edited frame at
the same temporal distance it had during reasoning.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ...configuration_utils import register_to_config
from .transformer_wan import (
    Transformer3DModelOutput,
    WanRotaryPosEmbed,
    WanTransformer3DModel,
)


class ChronoEditRotaryPosEmbed(WanRotaryPosEmbed):
    def __init__(self, attention_head_dim: int, patch_size, max_seq_len: int,
                 theta: float = 10000.0, temporal_skip_len: int = 8):
        super().__init__(attention_head_dim, patch_size, max_seq_len, theta)
        self.temporal_skip_len = temporal_skip_len

    def __call__(self, num_frames: int, height: int, width: int):
        p_t, p_h, p_w = self.patch_size
        ppf, pph, ppw = num_frames // p_t, height // p_h, width // p_w
        (cos_t, sin_t), (cos_h, sin_h), (cos_w, sin_w) = self.freqs

        if ppf == 2:  # edit pair: positions [0, skip-1] (reference `:414-422`)
            t_idx = np.array([0, self.temporal_skip_len - 1])
            cos_t_sel, sin_t_sel = cos_t[t_idx], sin_t[t_idx]
        else:
            cos_t_sel, sin_t_sel = cos_t[:ppf], sin_t[:ppf]

        def expand(cos, sin, shape_axis, n):
            shape = [1, 1, 1, cos.shape[-1]]
            shape[shape_axis] = n
            return cos.reshape(shape), sin.reshape(shape)

        cf, sf = expand(cos_t_sel, sin_t_sel, 0, ppf)
        ch, sh = expand(cos_h[:pph], sin_h[:pph], 1, pph)
        cw, sw = expand(cos_w[:ppw], sin_w[:ppw], 2, ppw)
        cos = np.concatenate(
            [
                np.broadcast_to(cf, (ppf, pph, ppw, cf.shape[-1])),
                np.broadcast_to(ch, (ppf, pph, ppw, ch.shape[-1])),
                np.broadcast_to(cw, (ppf, pph, ppw, cw.shape[-1])),
            ],
            axis=-1,
        ).reshape(1, ppf * pph * ppw, 1, -1)
        sin = np.concatenate(
            [
                np.broadcast_to(sf, (ppf, pph, ppw, sf.shape[-1])),
                np.broadcast_to(sh, (ppf, pph, ppw, sh.shape[-1])),
                np.broadcast_to(sw, (ppf, pph, ppw, sw.shape[-1])),
            ],
            axis=-1,
        ).reshape(1, ppf * pph * ppw, 1, -1)
        return jnp.asarray(cos), jnp.asarray(sin)


class ChronoEditTransformer3DModel(WanTransformer3DModel):
    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        num_attention_heads: int = 40,
        attention_head_dim: int = 128,
        in_channels: int = 16,
        out_channels: int = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 13824,
        num_layers: int = 40,
        cross_attn_norm: bool = True,
        qk_norm: Optional[str] = "rms_norm_across_heads",
        eps: float = 1e-6,
        image_dim: Optional[int] = None,
        added_kv_proj_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        pos_embed_seq_len: Optional[int] = None,
        rope_temporal_skip_len: int = 8,
    ):
        WanTransformer3DModel.__init__.__wrapped__(
            self, patch_size=patch_size, num_attention_heads=num_attention_heads,
            attention_head_dim=attention_head_dim, in_channels=in_channels,
            out_channels=out_channels, text_dim=text_dim, freq_dim=freq_dim, ffn_dim=ffn_dim,
            num_layers=num_layers, cross_attn_norm=cross_attn_norm, qk_norm=qk_norm, eps=eps,
            image_dim=image_dim, added_kv_proj_dim=added_kv_proj_dim,
            rope_max_seq_len=rope_max_seq_len, pos_embed_seq_len=pos_embed_seq_len,
        )
        self.rope = ChronoEditRotaryPosEmbed(
            attention_head_dim, patch_size, rope_max_seq_len, temporal_skip_len=rope_temporal_skip_len
        )

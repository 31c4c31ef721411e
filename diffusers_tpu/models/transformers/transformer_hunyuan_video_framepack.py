"""HunyuanVideo Framepack transformer (next-frame-section prediction).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_hunyuan_video_framepack.py:115`
HunyuanVideoFramepackTransformer3DModel): the base HunyuanVideo dual/single
block stack plus Framepack's history conditioning — clean history latents
patch-embedded at 1x/2x/4x strides (`HunyuanVideoHistoryPatchEmbed` `:87`),
prepended on the sequence axis with RoPE tables computed from explicit frame
indices (`:50`) and center-averaged for the downsampled streams
(`_pad_rotary_emb` `:390`), a CLIP-vision image projection whose tokens are
concatenated BEFORE the text (`:316-320`), and the prediction sliced back to
the current-section tokens (`:357`).

TPU-first: RoPE tables and frame indices are host-side numpy (static per
section shape); history streams are optional-but-static pytree inputs so the
scan over sections in the pipeline retraces only on shape change; the
attention mask is the same static (img‖txt) validity mask as the base model
(no batch==1 dynamic trimming).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, Linear, Module, ModuleList, Params
from ..embeddings import get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_hunyuan_video import (
    HunyuanVideoConditionEmbedding,
    HunyuanVideoPatchEmbed,
    HunyuanVideoSingleTransformerBlock,
    HunyuanVideoTokenRefiner,
    HunyuanVideoTransformerBlock,
    Transformer2DModelOutput,
)


def _pad_for_3d_conv(x: jax.Array, kernel_size) -> jax.Array:
    """Replicate-pad NCDHW so each of (T, H, W) divides the kernel."""
    _, _, t, h, w = x.shape
    pt, ph, pw = kernel_size
    pads = ((0, 0), (0, 0), (0, (pt - t % pt) % pt), (0, (ph - h % ph) % ph), (0, (pw - w % pw) % pw))
    return jnp.pad(x, pads, mode="edge")


class FramepackClipVisionProjection(Module):
    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.up = Linear(in_channels, out_channels * 3)
        self.down = Linear(out_channels * 3, out_channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.down(params["down"], jax.nn.silu(self.up(params["up"], x)))


class HunyuanVideoHistoryPatchEmbed(Module):
    def __init__(self, in_channels: int, inner_dim: int):
        super().__init__()
        self.proj = Conv3d(in_channels, inner_dim, kernel_size=(1, 2, 2), stride=(1, 2, 2))
        self.proj_2x = Conv3d(in_channels, inner_dim, kernel_size=(2, 4, 4), stride=(2, 4, 4))
        self.proj_4x = Conv3d(in_channels, inner_dim, kernel_size=(4, 8, 8), stride=(4, 8, 8))

    def _embed(self, params, x, kernel, conv):
        if x is None:
            return None
        if kernel is not None:
            x = _pad_for_3d_conv(x, kernel)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # NCDHW → NDHWC
        x = conv(params, x)
        return x.reshape(x.shape[0], -1, x.shape[-1])

    def __call__(self, params: Params, latents_clean=None, latents_2x=None, latents_4x=None):
        return (
            self._embed(params["proj"], latents_clean, None, self.proj),
            self._embed(params["proj_2x"], latents_2x, (2, 4, 4), self.proj_2x),
            self._embed(params["proj_4x"], latents_4x, (4, 8, 8), self.proj_4x),
        )


class HunyuanVideoFramepackTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        out_channels: int = 16,
        num_attention_heads: int = 24,
        attention_head_dim: int = 128,
        num_layers: int = 20,
        num_single_layers: int = 40,
        num_refiner_layers: int = 2,
        mlp_ratio: float = 4.0,
        patch_size: int = 2,
        patch_size_t: int = 1,
        qk_norm: str = "rms_norm",
        guidance_embeds: bool = True,
        text_embed_dim: int = 4096,
        pooled_projection_dim: int = 768,
        rope_theta: float = 256.0,
        rope_axes_dim: Tuple[int, ...] = (16, 56, 56),
        image_condition_type: Optional[str] = None,
        has_image_proj: bool = False,
        image_proj_dim: int = 1152,
        has_clean_x_embedder: bool = False,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels or in_channels

        self.x_embedder = HunyuanVideoPatchEmbed((patch_size_t, patch_size, patch_size), in_channels, inner_dim)
        self.clean_x_embedder = (
            HunyuanVideoHistoryPatchEmbed(in_channels, inner_dim) if has_clean_x_embedder else None
        )
        self.context_embedder = HunyuanVideoTokenRefiner(
            text_embed_dim, num_attention_heads, attention_head_dim, num_layers=num_refiner_layers
        )
        self.image_projection = (
            FramepackClipVisionProjection(image_proj_dim, inner_dim) if has_image_proj else None
        )
        self.time_text_embed = HunyuanVideoConditionEmbedding(
            inner_dim, pooled_projection_dim, guidance_embeds, image_condition_type
        )
        self.transformer_blocks = ModuleList(
            [HunyuanVideoTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
             for _ in range(num_layers)]
        )
        self.single_transformer_blocks = ModuleList(
            [HunyuanVideoSingleTransformerBlock(num_attention_heads, attention_head_dim, mlp_ratio, qk_norm)
             for _ in range(num_single_layers)]
        )
        self.norm_out = AdaLayerNormContinuous(inner_dim, inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(inner_dim, patch_size_t * patch_size * patch_size * self.out_channels)

    # ------------------------------------------------------------------ rope
    def rope(self, frame_indices: np.ndarray, height: int, width: int):
        """Host-side RoPE tables over (frame_indices × H/p × W/p); frame
        indices are explicit so history sections carry absolute positions
        (reference `:50-70`)."""
        h = height // self.config.patch_size
        w = width // self.config.patch_size
        grid = np.stack(
            np.meshgrid(np.asarray(frame_indices, np.float32),
                        np.arange(h, dtype=np.float32),
                        np.arange(w, dtype=np.float32), indexing="ij"),
            axis=0,
        )
        cos_out, sin_out = [], []
        for i in range(3):
            cos, sin = get_1d_rotary_pos_embed_np(
                self.config.rope_axes_dim[i], grid[i].reshape(-1), theta=self.config.rope_theta
            )
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def pack_rope(self, height: int, width: int, indices_latents,
                  indices_clean=None, indices_2x=None, indices_4x=None):
        """Full packed-sequence RoPE table in the [4x, 2x, clean, latents]
        prepend order of `_pack_history_states` — host-side, so the pipeline
        can pass it as a plain array input and avoid per-section retraces."""
        post_h = height // self.config.patch_size
        post_w = width // self.config.patch_size
        cos_parts, sin_parts = [], []
        if indices_4x is not None:
            r = self._pad_rotary_emb(
                self.rope(np.asarray(indices_4x).reshape(-1), height, width), post_h, post_w, (4, 4, 4))
            cos_parts.append(r[0]); sin_parts.append(r[1])
        if indices_2x is not None:
            r = self._pad_rotary_emb(
                self.rope(np.asarray(indices_2x).reshape(-1), height, width), post_h, post_w, (2, 2, 2))
            cos_parts.append(r[0]); sin_parts.append(r[1])
        if indices_clean is not None:
            r = self.rope(np.asarray(indices_clean).reshape(-1), height, width)
            cos_parts.append(r[0]); sin_parts.append(r[1])
        r = self.rope(np.asarray(indices_latents).reshape(-1), height, width)
        cos_parts.append(r[0]); sin_parts.append(r[1])
        return np.concatenate(cos_parts, axis=0), np.concatenate(sin_parts, axis=0)

    def _pad_rotary_emb(self, emb, height: int, width: int, kernel):
        """Center-average the full-res table down to the history stream's
        token grid (reference `:390-408`: replicate pad + avg_pool3d)."""
        def pool(f):
            t = f.shape[0] // (height * width)
            x = f.T.reshape(1, -1, t, height, width)
            x = np.asarray(_pad_for_3d_conv(jnp.asarray(x), kernel))
            _, c, tt, hh, ww = x.shape
            kt, kh, kw = kernel
            x = x.reshape(c, tt // kt, kt, hh // kh, kh, ww // kw, kw).mean(axis=(2, 4, 6))
            return x.reshape(c, -1).T

        return pool(emb[0]), pool(emb[1])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: jax.Array,
        pooled_projections: jax.Array,
        image_embeds: jax.Array,
        indices_latents: Optional[np.ndarray] = None,
        guidance: Optional[jax.Array] = None,
        latents_clean: Optional[jax.Array] = None,
        indices_latents_clean: Optional[np.ndarray] = None,
        latents_history_2x: Optional[jax.Array] = None,
        indices_latents_history_2x: Optional[np.ndarray] = None,
        latents_history_4x: Optional[jax.Array] = None,
        indices_latents_history_4x: Optional[np.ndarray] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size, _, num_frames, height, width = hidden_states.shape
        p, p_t = self.config.patch_size, self.config.patch_size_t
        post_f, post_h, post_w = num_frames // p_t, height // p, width // p
        original_context_length = post_f * post_h * post_w

        precomputed_rope = image_rotary_emb is not None
        if not precomputed_rope:
            if indices_latents is None:
                indices_latents = np.arange(num_frames)
            image_rotary_emb = self.rope(np.asarray(indices_latents).reshape(-1), height, width)
        rope_cos, rope_sin = image_rotary_emb

        hidden = self.x_embedder(params["x_embedder"], hidden_states)

        if self.clean_x_embedder is not None:
            emb_clean, emb_2x, emb_4x = self.clean_x_embedder(
                params["clean_x_embedder"], latents_clean, latents_history_2x, latents_history_4x
            )
            # prepend history streams (reference `_pack_history_states` `:361`);
            # a provided image_rotary_emb is the FULL packed-sequence table
            # (see `pack_rope`) and skips the per-stream rope assembly
            if emb_clean is not None:
                hidden = jnp.concatenate([emb_clean, hidden], axis=1)
                if not precomputed_rope and indices_latents_clean is not None:
                    r = self.rope(np.asarray(indices_latents_clean).reshape(-1), height, width)
                    rope_cos = np.concatenate([r[0], rope_cos], axis=0)
                    rope_sin = np.concatenate([r[1], rope_sin], axis=0)
            if emb_2x is not None:
                hidden = jnp.concatenate([emb_2x, hidden], axis=1)
                if not precomputed_rope and indices_latents_history_2x is not None:
                    r = self.rope(np.asarray(indices_latents_history_2x).reshape(-1), height, width)
                    r = self._pad_rotary_emb(r, post_h, post_w, (2, 2, 2))
                    rope_cos = np.concatenate([r[0], rope_cos], axis=0)
                    rope_sin = np.concatenate([r[1], rope_sin], axis=0)
            if emb_4x is not None:
                hidden = jnp.concatenate([emb_4x, hidden], axis=1)
                if not precomputed_rope and indices_latents_history_4x is not None:
                    r = self.rope(np.asarray(indices_latents_history_4x).reshape(-1), height, width)
                    r = self._pad_rotary_emb(r, post_h, post_w, (4, 4, 4))
                    rope_cos = np.concatenate([r[0], rope_cos], axis=0)
                    rope_sin = np.concatenate([r[1], rope_sin], axis=0)
        rope = (jnp.asarray(rope_cos), jnp.asarray(rope_sin))

        temb, token_replace_emb = self.time_text_embed(
            params["time_text_embed"], timestep, pooled_projections, guidance
        )
        encoder_hidden = self.context_embedder(
            params["context_embedder"], encoder_hidden_states, timestep, encoder_attention_mask
        )

        # CLIP-vision tokens go BEFORE text (attention-mask layout, `:316`)
        if self.image_projection is not None:
            img_tokens = self.image_projection(params["image_projection"], image_embeds)
            encoder_hidden = jnp.concatenate([img_tokens, encoder_hidden], axis=1)
            encoder_attention_mask = jnp.concatenate(
                [jnp.ones((batch_size, img_tokens.shape[1]), encoder_attention_mask.dtype),
                 encoder_attention_mask], axis=1)

        img_len = hidden.shape[1]
        txt_len = encoder_hidden.shape[1]
        eff = img_len + encoder_attention_mask.astype(jnp.int32).sum(axis=1)
        idx = jnp.arange(img_len + txt_len)[None, :]
        attention_mask = (idx < eff[:, None])[:, None, None, :]

        for i, block in enumerate(self.transformer_blocks):
            hidden, encoder_hidden = block(
                params["transformer_blocks"][i], hidden, encoder_hidden, temb,
                attention_mask, rope, token_replace_emb, post_h * post_w,
            )
        for i, block in enumerate(self.single_transformer_blocks):
            hidden, encoder_hidden = block(
                params["single_transformer_blocks"][i], hidden, encoder_hidden, temb,
                attention_mask, rope, token_replace_emb, post_h * post_w,
            )

        hidden = hidden[:, -original_context_length:]
        hidden = self.norm_out(params["norm_out"], hidden, temb)
        hidden = self.proj_out(params["proj_out"], hidden)

        hidden = hidden.reshape(batch_size, post_f, post_h, post_w, -1, p_t, p, p)
        hidden = jnp.transpose(hidden, (0, 4, 1, 5, 2, 6, 3, 7))
        hidden = hidden.reshape(batch_size, -1, post_f * p_t, post_h * p, post_w * p)

        if not return_dict:
            return (hidden,)
        return Transformer2DModelOutput(sample=hidden)

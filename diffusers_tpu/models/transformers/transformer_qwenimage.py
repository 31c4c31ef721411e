"""QwenImageTransformer2DModel — Alibaba's Qwen-Image double-stream DiT.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_qwenimage.py`
(QwenTimestepProjEmbeddings `:174`, QwenEmbedRope `:199` with scaled
symmetric height/width positions, double-stream attention `:473`, block
`:587`, model `:745`; the `_cp_plan` maps to our sequence-sharding specs).

TPU design: one joint masked attention over [text ‖ image] tokens per block;
RoPE angle tables precomputed host-side in float64; modulation math follows
the reference's Megatron-style img/txt split.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _rotate_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Complex interleaved rotation (reference apply_rotary_emb_qwen
    use_real=False). cos/sin: [S, D/2]; x: [B, S, H, D]."""
    xf = x.astype(jnp.float32)
    x_even, x_odd = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_even = x_even * c - x_odd * s
    out_odd = x_even * s + x_odd * c
    return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape).astype(x.dtype)


class QwenEmbedRope:
    """Host-side 3-axis RoPE with symmetric (scaled) spatial positions."""

    def __init__(self, theta: int, axes_dim: List[int], scale_rope: bool = False, max_index: int = 4096):
        self.theta = theta
        self.axes_dim = axes_dim
        self.scale_rope = scale_rope
        pos = np.arange(max_index, dtype=np.float64)
        neg = -np.arange(1, max_index + 1, dtype=np.float64)[::-1]  # [-4096 .. -1]
        self.pos_angles = [self._angles(pos, d) for d in axes_dim]  # [4096, d/2] each
        self.neg_angles = [self._angles(neg, d) for d in axes_dim]

    def _angles(self, index: np.ndarray, dim: int) -> np.ndarray:
        freqs = 1.0 / (self.theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return np.outer(index, freqs)

    def __call__(self, video_fhw, max_txt_seq_len: int):
        video_fhw = list(video_fhw)
        if video_fhw and isinstance(video_fhw[0], int):  # single (f, h, w)
            video_fhw = [tuple(video_fhw)]
        vid_angles = []
        max_vid_index = 0
        for idx, (frame, height, width) in enumerate(video_fhw):
            a_f = np.broadcast_to(
                self.pos_angles[0][idx : idx + frame][:, None, None, :],
                (frame, height, width, self.pos_angles[0].shape[-1]),
            )
            if self.scale_rope:
                a_h = np.concatenate(
                    [self.neg_angles[1][-(height - height // 2):], self.pos_angles[1][: height // 2]], axis=0
                )
                a_w = np.concatenate(
                    [self.neg_angles[2][-(width - width // 2):], self.pos_angles[2][: width // 2]], axis=0
                )
                max_vid_index = max(height // 2, width // 2, max_vid_index)
            else:
                a_h = self.pos_angles[1][:height]
                a_w = self.pos_angles[2][:width]
                max_vid_index = max(height, width, max_vid_index)
            a_h = np.broadcast_to(a_h[None, :, None, :], (frame, height, width, a_h.shape[-1]))
            a_w = np.broadcast_to(a_w[None, None, :, :], (frame, height, width, a_w.shape[-1]))
            vid_angles.append(
                np.concatenate([a_f, a_h, a_w], axis=-1).reshape(frame * height * width, -1)
            )
        vid = np.concatenate(vid_angles, axis=0)
        txt = np.concatenate(
            [a[max_vid_index : max_vid_index + max_txt_seq_len] for a in self.pos_angles], axis=-1
        )
        img_rope = (jnp.asarray(np.cos(vid), jnp.float32), jnp.asarray(np.sin(vid), jnp.float32))
        txt_rope = (jnp.asarray(np.cos(txt), jnp.float32), jnp.asarray(np.sin(txt), jnp.float32))
        return img_rope, txt_rope


class _QwenDoubleStreamAttention(Module):
    def __init__(self, dim: int, heads: int, dim_head: int, eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=True)
        self.to_k = Linear(dim, inner, use_bias=True)
        self.to_v = Linear(dim, inner, use_bias=True)
        self.add_q_proj = Linear(dim, inner, use_bias=True)
        self.add_k_proj = Linear(dim, inner, use_bias=True)
        self.add_v_proj = Linear(dim, inner, use_bias=True)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.norm_added_q = RMSNorm(dim_head, eps=eps)
        self.norm_added_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])
        self.to_add_out = Linear(inner, dim, use_bias=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 encoder_hidden_states_mask=None, image_rotary_emb=None):
        b, seq_img, _ = hidden_states.shape
        seq_txt = encoder_hidden_states.shape[1]

        q = self.to_q(params["to_q"], hidden_states).reshape(b, seq_img, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], hidden_states).reshape(b, seq_img, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], hidden_states).reshape(b, seq_img, self.heads, self.dim_head)
        tq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(b, seq_txt, self.heads, self.dim_head)
        tk = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(b, seq_txt, self.heads, self.dim_head)
        tv = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(b, seq_txt, self.heads, self.dim_head)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        tq = self.norm_added_q(params["norm_added_q"], tq)
        tk = self.norm_added_k(params["norm_added_k"], tk)

        if image_rotary_emb is not None:
            (img_cos, img_sin), (txt_cos, txt_sin) = image_rotary_emb
            q = _rotate_interleaved(q, img_cos, img_sin)
            k = _rotate_interleaved(k, img_cos, img_sin)
            tq = _rotate_interleaved(tq, txt_cos, txt_sin)
            tk = _rotate_interleaved(tk, txt_cos, txt_sin)

        jq = jnp.concatenate([tq, q], axis=1)
        jk = jnp.concatenate([tk, k], axis=1)
        jv = jnp.concatenate([tv, v], axis=1)

        bias = None
        if encoder_hidden_states_mask is not None:
            keep = jnp.concatenate(
                [encoder_hidden_states_mask.astype(bool), jnp.ones((b, seq_img), bool)], axis=1
            )
            bias = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]

        out = dispatch_attention_fn(jq, jk, jv, attn_mask=bias)
        out = out.reshape(b, seq_txt + seq_img, self.heads * self.dim_head).astype(jq.dtype)
        txt_out, img_out = out[:, :seq_txt], out[:, seq_txt:]
        img_out = self.to_out[0](params["to_out"][0], img_out)
        txt_out = self.to_add_out(params["to_add_out"], txt_out)
        return img_out, txt_out


class _SiLU(Module):
    """Param-free SiLU placeholder so Sequential indices line up."""

    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return jax.nn.silu(x)


def _mod_linear(dim: int, out_dim: int) -> ModuleList:
    """reference nn.Sequential(SiLU(), Linear(...)): params under `<name>.1`."""
    return ModuleList([_SiLU(), Linear(dim, out_dim, use_bias=True)])


class QwenImageTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, eps: float = 1e-6):
        super().__init__()
        self.img_mod = _mod_linear(dim, 6 * dim)
        self.txt_mod = _mod_linear(dim, 6 * dim)
        self.attn = _QwenDoubleStreamAttention(dim, num_attention_heads, attention_head_dim, eps=eps)
        self.img_norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.img_norm2 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.txt_norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.txt_norm2 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.img_mlp = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")
        self.txt_mlp = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    @staticmethod
    def _modulate(x, mod):
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        return x * (1 + scale[:, None]) + shift[:, None], gate[:, None]

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 encoder_hidden_states_mask, temb, image_rotary_emb=None):
        img_mod = self.img_mod[1](params["img_mod"][1], jax.nn.silu(temb))
        txt_mod = self.txt_mod[1](params["txt_mod"][1], jax.nn.silu(temb))
        img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
        txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

        img_normed = self.img_norm1({}, hidden_states)
        img_modulated, img_gate1 = self._modulate(img_normed, img_mod1)
        txt_normed = self.txt_norm1({}, encoder_hidden_states)
        txt_modulated, txt_gate1 = self._modulate(txt_normed, txt_mod1)

        img_attn, txt_attn = self.attn(
            params["attn"], img_modulated, txt_modulated,
            encoder_hidden_states_mask=encoder_hidden_states_mask,
            image_rotary_emb=image_rotary_emb,
        )
        hidden_states = hidden_states + img_gate1 * img_attn
        encoder_hidden_states = encoder_hidden_states + txt_gate1 * txt_attn

        img_normed2 = self.img_norm2({}, hidden_states)
        img_modulated2, img_gate2 = self._modulate(img_normed2, img_mod2)
        hidden_states = hidden_states + img_gate2 * self.img_mlp(params["img_mlp"], img_modulated2)

        txt_normed2 = self.txt_norm2({}, encoder_hidden_states)
        txt_modulated2, txt_gate2 = self._modulate(txt_normed2, txt_mod2)
        encoder_hidden_states = encoder_hidden_states + txt_gate2 * self.txt_mlp(params["txt_mlp"], txt_modulated2)

        return encoder_hidden_states, hidden_states


class QwenTimestepProjEmbeddings(Module):
    def __init__(self, embedding_dim: int):
        super().__init__()
        self.time_proj = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0, scale=1000)
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)

    def __call__(self, params: Params, timestep, dtype):
        t = self.time_proj({}, timestep).astype(dtype)
        return self.timestep_embedder(params["timestep_embedder"], t)


class QwenImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 64,
        out_channels: Optional[int] = 16,
        num_layers: int = 60,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 3584,
        guidance_embeds: bool = False,
        axes_dims_rope: Tuple[int, int, int] = (16, 56, 56),
    ):
        super().__init__()
        self.out_channels_ = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pos_embed = QwenEmbedRope(theta=10000, axes_dim=list(axes_dims_rope), scale_rope=True)
        self.time_text_embed = QwenTimestepProjEmbeddings(self.inner_dim)
        self.txt_norm = RMSNorm(joint_attention_dim, eps=1e-6)
        self.img_in = Linear(in_channels, self.inner_dim)
        self.txt_in = Linear(joint_attention_dim, self.inner_dim)
        self.transformer_blocks = ModuleList(
            [
                QwenImageTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
                for _ in range(num_layers)
            ]
        )
        from ..normalization import AdaLayerNormContinuous

        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels_, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, image_seq, in_channels] packed latents
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_mask: jax.Array,
        timestep: jax.Array,  # [B] in [0, 1]
        img_shapes: Optional[List[Tuple[int, int, int]]] = None,
        controlnet_block_samples=None,
        return_dict: bool = True,
    ):
        h = self.img_in(params["img_in"], hidden_states)
        timestep = timestep.astype(h.dtype)

        ctx = self.txt_norm(params["txt_norm"], encoder_hidden_states)
        ctx = self.txt_in(params["txt_in"], ctx)

        temb = self.time_text_embed(params["time_text_embed"], timestep, h.dtype)
        image_rotary_emb = self.pos_embed(img_shapes, max_txt_seq_len=ctx.shape[1])

        num_blocks = len(self.transformer_blocks)
        for i, block in enumerate(self.transformer_blocks):
            ctx, h = block(
                params["transformer_blocks"][i], h, ctx, encoder_hidden_states_mask, temb,
                image_rotary_emb=image_rotary_emb,
            )
            if controlnet_block_samples is not None:
                interval = int(np.ceil(num_blocks / len(controlnet_block_samples)))
                h = h + controlnet_block_samples[i // interval]

        h = self.norm_out(params["norm_out"], h, temb)
        output = self.proj_out(params["proj_out"], h)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)

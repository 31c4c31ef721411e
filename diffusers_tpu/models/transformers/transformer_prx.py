"""PRXTransformer2DModel — Photoroom PRX text-to-image DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_prx.py:631`):
image-query-only joint attention — fused img QKV + text KV projections, keys
are [text, image], only image tokens update (`:83-190`); 6-param zero-init
modulation (`:366`); gated gelu-tanh MLP (`:461-464`); 2-axis rotary with
per-axis dims (`:254`); optional bottleneck patch projection and resolution
embedding for the pixel-space PRX-7B variant (`:324,:746`).

TPU-first: rotary tables precomputed host-side from the static latent grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple, Union

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


class PRXAttention(Module):
    def __init__(self, query_dim: int, heads: int, dim_head: int, eps: float = 1e-6):
        super().__init__()
        self.heads = heads
        self.head_dim = dim_head
        self.img_qkv_proj = Linear(query_dim, query_dim * 3, use_bias=False)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.txt_kv_proj = Linear(query_dim, query_dim * 2, use_bias=False)
        self.norm_added_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(query_dim, query_dim, use_bias=False)])

    def __call__(self, params: Params, hidden_states: jax.Array, encoder_hidden_states: jax.Array,
                 attention_mask: Optional[jax.Array], image_rotary_emb) -> jax.Array:
        b, l_img, _ = hidden_states.shape
        l_txt = encoder_hidden_states.shape[1]
        qkv = self.img_qkv_proj(params["img_qkv_proj"], hidden_states)
        qkv = qkv.reshape(b, l_img, 3, self.heads, self.head_dim)
        img_q, img_k, img_v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        img_q = self.norm_q(params["norm_q"], img_q)
        img_k = self.norm_k(params["norm_k"], img_k)

        kv = self.txt_kv_proj(params["txt_kv_proj"], encoder_hidden_states)
        kv = kv.reshape(b, l_txt, 2, self.heads, self.head_dim)
        txt_k, txt_v = kv[:, :, 0], kv[:, :, 1]
        txt_k = self.norm_added_k(params["norm_added_k"], txt_k)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            img_q = apply_rotary_emb(img_q, cos, sin)
            img_k = apply_rotary_emb(img_k, cos, sin)

        k = jnp.concatenate([txt_k, img_k], axis=1)
        v = jnp.concatenate([txt_v, img_v], axis=1)

        mask = None
        if attention_mask is not None:
            ones_img = jnp.ones((b, l_img), dtype=bool)
            joint = jnp.concatenate([attention_mask.astype(bool), ones_img], axis=-1)
            mask = joint[:, None, None, :]

        out = dispatch_attention_fn(img_q, k, v, attn_mask=mask)
        out = out.reshape(b, l_img, -1).astype(hidden_states.dtype)
        return self.to_out[0](params["to_out"][0], out)


class MLPEmbedder(Module):
    def __init__(self, in_dim: int, hidden_dim: int):
        super().__init__()
        self.in_layer = Linear(in_dim, hidden_dim, use_bias=True)
        self.out_layer = Linear(hidden_dim, hidden_dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.out_layer(params["out_layer"], jax.nn.silu(self.in_layer(params["in_layer"], x)))


class PRXResolutionEmbedder(Module):
    """128-dim sinusoids of (H, W) concat -> MLP (reference `:324`)."""

    def __init__(self, hidden_size: int, max_period: int = 10000):
        super().__init__()
        self.sinusoid = Timesteps(num_channels=128, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.mlp = MLPEmbedder(in_dim=256, hidden_dim=hidden_size)

    def __call__(self, params: Params, height: jax.Array, width: jax.Array, dtype) -> jax.Array:
        h_emb = self.sinusoid({}, height.astype(jnp.float32))
        w_emb = self.sinusoid({}, width.astype(jnp.float32))
        return self.mlp(params["mlp"], jnp.concatenate([h_emb, w_emb], axis=-1).astype(dtype))


class Modulation(Module):
    def __init__(self, dim: int):
        super().__init__()
        self.lin = Linear(dim, 6 * dim, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["lin"]["kernel"] = jnp.zeros_like(params["lin"]["kernel"])
        return params

    def __call__(self, params: Params, vec: jax.Array):
        out = self.lin(params["lin"], jax.nn.silu(vec))[:, None, :]
        return jnp.split(out, 6, axis=-1)


class PRXBlock(Module):
    def __init__(self, hidden_size: int, num_heads: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.img_pre_norm = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.attention = PRXAttention(hidden_size, num_heads, hidden_size // num_heads)
        self.post_attention_layernorm = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        mlp_hidden = int(hidden_size * mlp_ratio)
        self.gate_proj = Linear(hidden_size, mlp_hidden, use_bias=False)
        self.up_proj = Linear(hidden_size, mlp_hidden, use_bias=False)
        self.down_proj = Linear(mlp_hidden, hidden_size, use_bias=False)
        self.modulation = Modulation(hidden_size)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb, attention_mask=None):
        attn_shift, attn_scale, attn_gate, mlp_shift, mlp_scale, mlp_gate = self.modulation(
            params["modulation"], temb)
        h_mod = (1 + attn_scale) * self.img_pre_norm({}, hidden_states) + attn_shift
        attn_out = self.attention(params["attention"], h_mod, encoder_hidden_states,
                                  attention_mask, image_rotary_emb)
        hidden_states = hidden_states + attn_gate * attn_out
        x = (1 + mlp_scale) * self.post_attention_layernorm({}, hidden_states) + mlp_shift
        mlp = self.down_proj(
            params["down_proj"],
            jax.nn.gelu(self.gate_proj(params["gate_proj"], x), approximate=True)
            * self.up_proj(params["up_proj"], x),
        )
        return hidden_states + mlp_gate * mlp


class PRXFinalLayer(Module):
    def __init__(self, hidden_size: int, patch_size: int, out_channels: int):
        super().__init__()
        self.norm_final = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.linear = Linear(hidden_size, patch_size * patch_size * out_channels, use_bias=True)
        self.adaLN_modulation = ModuleList([_Skip(), Linear(hidden_size, 2 * hidden_size, use_bias=True)])

    def __call__(self, params: Params, x: jax.Array, vec: jax.Array) -> jax.Array:
        mod = self.adaLN_modulation[1](params["adaLN_modulation"][1], jax.nn.silu(vec))
        shift, scale = jnp.split(mod, 2, axis=1)
        x = (1 + scale[:, None]) * self.norm_final({}, x) + shift[:, None]
        return self.linear(params["linear"], x)


class _Skip(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}


class PRXTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        patch_size: int = 2,
        context_in_dim: int = 2304,
        hidden_size: int = 1792,
        mlp_ratio: float = 3.5,
        num_heads: int = 28,
        depth: int = 16,
        axes_dim: Optional[Tuple[int, int]] = None,
        theta: int = 10000,
        time_factor: float = 1000.0,
        time_max_period: int = 10000,
        bottleneck_size: Optional[int] = None,
        resolution_embeds: bool = False,
    ):
        super().__init__()
        axes_dim = tuple(axes_dim) if axes_dim is not None else (32, 32)
        self.axes_dim = axes_dim
        self.out_channels = in_channels * patch_size**2
        patch_dim = in_channels * patch_size**2
        if bottleneck_size is not None:
            self.img_in = ModuleList([Linear(patch_dim, bottleneck_size, use_bias=True),
                                      Linear(bottleneck_size, hidden_size, use_bias=True)])
        else:
            self.img_in = Linear(patch_dim, hidden_size, use_bias=True)
        # time_max_period rides get_timestep_embedding's default (10000) — every
        # released PRX config uses it
        self.time_sinusoid = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0,
                                       scale=time_factor)
        self.time_in = MLPEmbedder(in_dim=256, hidden_dim=hidden_size)
        self.txt_in = Linear(context_in_dim, hidden_size)
        self.resolution_embedder = (
            PRXResolutionEmbedder(hidden_size, max_period=time_max_period) if resolution_embeds else None
        )
        self.blocks = ModuleList([PRXBlock(hidden_size, num_heads, mlp_ratio) for _ in range(depth)])
        self.final_layer = PRXFinalLayer(hidden_size, 1, self.out_channels)

    def rope(self, height: int, width: int):
        """Host-side 2-axis rotary tables over the patch grid (reference `:254`)."""
        p = self.config.patch_size
        hp, wp = height // p, width // p
        grid = np.stack(np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij"), axis=-1).reshape(-1, 2)
        cos = np.concatenate(
            [get_1d_rotary_pos_embed_np(d, grid[:, i], theta=float(self.config.theta))[0]
             for i, d in enumerate(self.axes_dim)], axis=-1)
        sin = np.concatenate(
            [get_1d_rotary_pos_embed_np(d, grid[:, i], theta=float(self.config.theta))[1]
             for i, d in enumerate(self.axes_dim)], axis=-1)
        return jnp.asarray(cos[None, :, None]), jnp.asarray(sin[None, :, None])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, L_txt, context_in_dim]
        attention_mask: Optional[jax.Array] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        b, c, h, w = hidden_states.shape
        p = self.config.patch_size

        txt = self.txt_in(params["txt_in"], encoder_hidden_states)

        # img2seq (reference `:560`)
        img = hidden_states.reshape(b, c, h // p, p, w // p, p)
        img = jnp.einsum("nchpwq->nhwcpq", img).reshape(b, -1, c * p * p)
        if isinstance(self.img_in, ModuleList):
            img = self.img_in[1](params["img_in"][1], self.img_in[0](params["img_in"][0], img))
        else:
            img = self.img_in(params["img_in"], img)

        if image_rotary_emb is None:
            image_rotary_emb = self.rope(h, w)

        vec = self.time_in(params["time_in"],
                           self.time_sinusoid({}, timestep.astype(jnp.float32)).astype(img.dtype))
        if self.resolution_embedder is not None:
            height = jnp.full((b,), h, jnp.float32)
            width = jnp.full((b,), w, jnp.float32)
            vec = vec + self.resolution_embedder(params["resolution_embedder"], height, width, vec.dtype)

        for i, block in enumerate(self.blocks):
            img = block(params["blocks"][i], img, txt, vec, image_rotary_emb, attention_mask)

        img = self.final_layer(params["final_layer"], img, vec)

        # seq2img (reference `:590`)
        out = img.reshape(b, h // p, w // p, c, p, p)
        out = jnp.einsum("nhwcpq->nchpwq", out).reshape(b, c, h, w)

        if not return_dict:
            return (out,)
        return Transformer2DModelOutput(sample=out)

"""AutoencoderRAE — Representation Autoencoder.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_rae.py:393`):
a FROZEN pretrained vision encoder (DINOv2-with-registers / SigLIP2 / ViT-MAE)
produces patch tokens that serve as the latent space; a trainable ViT-MAE
style decoder (`RAEDecoder`, `:228`) reconstructs pixels from them. Latents
are optionally reshaped to [B, C, h, w] and normalized with checkpoint
statistics.

TPU-first notes:
  * The three encoders are compact JAX ViTs whose module trees mirror the
    HF-transformers state-dict naming exactly (embeddings.cls_token,
    encoder.layer.N.attention.attention.query, ...), so RAE checkpoints load
    through the structural converter with no rename tables.
  * torch's bicubic interpolation (a=-0.75, align_corners=False, optional
    antialias) is reproduced exactly as two dense weight matmuls built
    host-side (`_torch_bicubic_matrix`) — `jax.image.resize` uses a different
    cubic kernel (a=-0.5) and would break pos-embed parity.
  * The final encoder layernorms are affine-free by construction (the
    reference strips their weights, `:99-127`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv2d, LayerNorm, Linear, Module, ModuleList, Params
from ..attention import Attention
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput


@dataclass
class EncoderOutput(BaseOutput):
    latent: jax.Array


@dataclass
class RAEDecoderOutput(BaseOutput):
    logits: jax.Array


# ---------------------------------------------------------------------------
# torch-exact bicubic resize (host-side weight matrices)
# ---------------------------------------------------------------------------


def _torch_bicubic_matrix(in_size: int, out_size: int, antialias: bool = False) -> np.ndarray:
    """Dense [out, in] weights reproducing torch F.interpolate(mode="bicubic",
    align_corners=False, antialias=...) along one axis (cubic a=-0.75)."""
    a = -0.75

    def cubic(d):
        d = np.abs(d)
        return np.where(
            d <= 1.0, (a + 2) * d**3 - (a + 3) * d**2 + 1,
            np.where(d < 2.0, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
        )

    scale = in_size / out_size
    support_scale = max(scale, 1.0) if antialias else 1.0
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    support = 2.0 * support_scale
    lo = np.floor(src - support).astype(int)
    kmax = int(np.ceil(2 * support)) + 2
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    for k in range(kmax):
        idx = lo + k
        w = cubic((src - idx) / support_scale)
        np.add.at(W, (rows, np.clip(idx, 0, in_size - 1)), w)
    W /= W.sum(axis=1, keepdims=True)
    return W.astype(np.float32)


def _bicubic_resize_2d(x: jax.Array, out_hw, antialias: bool = False) -> jax.Array:
    """x: [..., H, W] → [..., out_h, out_w], torch-bicubic-exact."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    Wh = jnp.asarray(_torch_bicubic_matrix(h, oh, antialias), x.dtype)
    Ww = jnp.asarray(_torch_bicubic_matrix(w, ow, antialias), x.dtype)
    return jnp.einsum("oh,...hw,pw->...op", Wh, x, Ww)


def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode="bilinear", align_corners=False) weights."""
    scale = in_size / out_size
    src = np.clip((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0, in_size - 1)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, in_size - 1)
    t = src - i0
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    np.add.at(W, (rows, i0), 1 - t)
    np.add.at(W, (rows, i1), t)
    return W.astype(np.float32)


# ---------------------------------------------------------------------------
# classic MAE sincos table (reference embeddings.get_2d_sincos_pos_embed with
# cls_token=True, extra_tokens=1)
# ---------------------------------------------------------------------------


def _sincos_2d(embed_dim: int, grid_size: int, extra_tokens: int = 0,
               base_size: Optional[int] = 16) -> np.ndarray:
    """base_size=16 follows the diffusers get_2d_sincos_pos_embed scaling (used
    by RAEDecoder); base_size=None is the raw-arange HF-ViTMAE variant."""
    div = (grid_size / base_size) if base_size else 1.0
    grid_h = np.arange(grid_size, dtype=np.float32) / div
    grid_w = np.arange(grid_size, dtype=np.float32) / div
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1)
    if extra_tokens:
        emb = np.concatenate([np.zeros((extra_tokens, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


# ---------------------------------------------------------------------------
# HF-layout ViT pieces (shared by the three frozen encoders)
# ---------------------------------------------------------------------------


class _HFSelfAttention(Module):
    """HF BERT-style self-attention subtree: attention.{query,key,value} +
    output.dense."""

    def __init__(self, hidden: int, heads: int):
        super().__init__()
        self.heads = heads
        self.head_dim = hidden // heads

        class _Inner(Module):
            def __init__(s):
                super().__init__()
                s.query = Linear(hidden, hidden)
                s.key = Linear(hidden, hidden)
                s.value = Linear(hidden, hidden)

        class _Out(Module):
            def __init__(s):
                super().__init__()
                s.dense = Linear(hidden, hidden)

        self.attention = _Inner()
        self.output = _Out()

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        ip = params["attention"]
        q = self.attention.query(ip["query"], x).reshape(b, n, self.heads, self.head_dim)
        k = self.attention.key(ip["key"], x).reshape(b, n, self.heads, self.head_dim)
        v = self.attention.value(ip["value"], x).reshape(b, n, self.heads, self.head_dim)
        out = dispatch_attention_fn(q, k, v).reshape(b, n, -1)
        return self.output.dense(params["output"]["dense"], out)


class _Dinov2Layer(Module):
    def __init__(self, hidden: int, heads: int, mlp_ratio: int = 4, eps: float = 1e-6):
        super().__init__()
        self.norm1 = LayerNorm(hidden, eps=eps)
        self.attention = _HFSelfAttention(hidden, heads)
        self.norm2 = LayerNorm(hidden, eps=eps)

        class _MLP(Module):
            def __init__(s):
                super().__init__()
                s.fc1 = Linear(hidden, hidden * mlp_ratio)
                s.fc2 = Linear(hidden * mlp_ratio, hidden)

        class _LayerScale(Module):
            def __init__(s):
                super().__init__()
                s._hidden = hidden

            def init(s, key, dtype=jnp.float32):
                return {"lambda1": jnp.ones((s._hidden,), dtype)}

            def __call__(s, p, x):
                return x * p["lambda1"].astype(x.dtype)

        self.mlp = _MLP()
        self.layer_scale1 = _LayerScale()
        self.layer_scale2 = _LayerScale()

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.attention(params["attention"], self.norm1(params["norm1"], x))
        x = x + self.layer_scale1(params["layer_scale1"], h)
        h = self.norm2(params["norm2"], x)
        h = self.mlp.fc2(params["mlp"]["fc2"],
                         jax.nn.gelu(self.mlp.fc1(params["mlp"]["fc1"], h), approximate=False))
        return x + self.layer_scale2(params["layer_scale2"], h)


class _ViTMAEHFLayer(Module):
    """HF ViTMAELayer: layernorm_before → attn → +res; layernorm_after →
    intermediate.dense → gelu → output.dense → +res."""

    def __init__(self, hidden: int, heads: int, intermediate: int, eps: float = 1e-12):
        super().__init__()
        self.attention = _HFSelfAttention(hidden, heads)

        class _Inter(Module):
            def __init__(s):
                super().__init__()
                s.dense = Linear(hidden, intermediate)

        class _Out(Module):
            def __init__(s):
                super().__init__()
                s.dense = Linear(intermediate, hidden)

        self.intermediate = _Inter()
        self.output = _Out()
        self.layernorm_before = LayerNorm(hidden, eps=eps)
        self.layernorm_after = LayerNorm(hidden, eps=eps)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = x + self.attention(params["attention"], self.layernorm_before(params["layernorm_before"], x))
        h = self.layernorm_after(params["layernorm_after"], x)
        h = jax.nn.gelu(self.intermediate.dense(params["intermediate"]["dense"], h), approximate=False)
        return x + self.output.dense(params["output"]["dense"], h)


class _PatchProjection(Module):
    """HF patch_embeddings.projection subtree."""

    def __init__(self, channels: int, hidden: int, patch: int):
        super().__init__()
        self.projection = Conv2d(channels, hidden, kernel_size=patch, stride=patch, padding=0)

    def __call__(self, params: Params, x_nchw: jax.Array) -> jax.Array:
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        x = self.projection(params["projection"], x)
        return x.reshape(x.shape[0], -1, x.shape[-1])


class RAEDinov2Encoder(Module):
    """Dinov2WithRegistersModel mirror (frozen; final layernorm affine-free)."""

    NUM_REGISTERS = 4

    def __init__(self, hidden_size: int, patch_size: int, num_hidden_layers: int,
                 image_size: int = 518, head_dim: int = 64):
        super().__init__()
        self.hidden_size = hidden_size
        self.patch_size = patch_size
        self.image_size = image_size
        num_patches = (image_size // patch_size) ** 2

        class _Embeddings(Module):
            def __init__(s):
                super().__init__()
                s.patch_embeddings = _PatchProjection(3, hidden_size, patch_size)
                s._num_patches = num_patches

            def init(s, key, dtype=jnp.float32):
                p = super().init(key, dtype=dtype)
                p["cls_token"] = jnp.zeros((1, 1, hidden_size), dtype)
                p["mask_token"] = jnp.zeros((1, hidden_size), dtype)
                p["register_tokens"] = jnp.zeros((1, RAEDinov2Encoder.NUM_REGISTERS, hidden_size), dtype)
                p["position_embeddings"] = jax.random.normal(
                    key, (1, 1 + s._num_patches, hidden_size), dtype) * 0.02
                return p

            def convert_torch_param(s, pname, tensor):
                return pname, tensor

        class _Encoder(Module):
            def __init__(s):
                super().__init__()
                s.layer = ModuleList([
                    _Dinov2Layer(hidden_size, hidden_size // head_dim)
                    for _ in range(num_hidden_layers)
                ])

        self.embeddings = _Embeddings()
        self.encoder = _Encoder()
        self.final_norm = LayerNorm(hidden_size, use_scale=False, use_bias=False, eps=1e-6)

    def _interp_pos(self, pos: jax.Array, grid: int) -> jax.Array:
        n0 = pos.shape[1] - 1
        g0 = int(math.isqrt(n0))
        if g0 == grid:
            return pos
        cls, patch = pos[:, :1], pos[:, 1:]
        patch = patch.reshape(1, g0, g0, -1)
        patch = jnp.transpose(patch, (0, 3, 1, 2))
        # HF dinov2 interpolates with antialias=True
        patch = _bicubic_resize_2d(patch.astype(jnp.float32), (grid, grid), antialias=True)
        patch = jnp.transpose(patch, (0, 2, 3, 1)).reshape(1, grid * grid, -1).astype(pos.dtype)
        return jnp.concatenate([cls, patch], axis=1)

    def __call__(self, params: Params, x_nchw: jax.Array) -> jax.Array:
        """Returns patch tokens [B, N, C] (cls + registers stripped,
        reference `_dinov2_encoder_forward`, `:58`)."""
        grid = x_nchw.shape[-1] // self.patch_size
        ep = params["embeddings"]
        tokens = self.embeddings.patch_embeddings(ep["patch_embeddings"], x_nchw)
        b = tokens.shape[0]
        cls = jnp.broadcast_to(ep["cls_token"].astype(tokens.dtype), (b, 1, self.hidden_size))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + self._interp_pos(ep["position_embeddings"], grid).astype(tokens.dtype)
        regs = jnp.broadcast_to(ep["register_tokens"].astype(tokens.dtype),
                                (b, self.NUM_REGISTERS, self.hidden_size))
        tokens = jnp.concatenate([tokens[:, :1], regs, tokens[:, 1:]], axis=1)
        for i, layer in enumerate(self.encoder.layer):
            tokens = layer(params["encoder"]["layer"][i], tokens)
        tokens = self.final_norm({}, tokens)
        return tokens[:, 1 + self.NUM_REGISTERS:]


class RAEMaeEncoder(Module):
    """ViTMAEModel mirror with mask_ratio=0 + ordered noise (= plain ViT)."""

    def __init__(self, hidden_size: int, patch_size: int, num_hidden_layers: int,
                 image_size: int = 224, head_dim: int = 64):
        super().__init__()
        self.hidden_size = hidden_size
        self.patch_size = patch_size
        num_patches = (image_size // patch_size) ** 2
        grid = image_size // patch_size

        class _Embeddings(Module):
            def __init__(s):
                super().__init__()
                s.patch_embeddings = _PatchProjection(3, hidden_size, patch_size)
                s._grid = grid

            def init(s, key, dtype=jnp.float32):
                p = super().init(key, dtype=dtype)
                p["cls_token"] = jnp.zeros((1, 1, hidden_size), dtype)
                # HF ViTMAE uses the raw-arange sincos grid (no base scaling)
                p["position_embeddings"] = jnp.asarray(
                    _sincos_2d(hidden_size, s._grid, extra_tokens=1, base_size=None)[None], dtype)
                return p

            def convert_torch_param(s, pname, tensor):
                return pname, tensor

        class _Encoder(Module):
            def __init__(s):
                super().__init__()
                s.layer = ModuleList([
                    _ViTMAEHFLayer(hidden_size, hidden_size // head_dim, hidden_size * 4)
                    for _ in range(num_hidden_layers)
                ])

        self.embeddings = _Embeddings()
        self.encoder = _Encoder()
        self.final_norm = LayerNorm(hidden_size, use_scale=False, use_bias=False, eps=1e-12)

    def __call__(self, params: Params, x_nchw: jax.Array) -> jax.Array:
        """Returns patch tokens [B, N, C] (cls stripped, reference
        `_mae_encoder_forward`, `:69` — ordered noise keeps all patches)."""
        ep = params["embeddings"]
        tokens = self.embeddings.patch_embeddings(ep["patch_embeddings"], x_nchw)
        pos = ep["position_embeddings"]
        grid = x_nchw.shape[-1] // self.patch_size
        n0 = pos.shape[1] - 1
        g0 = int(math.isqrt(n0))
        if g0 != grid:  # HF ViTMAE interpolate_pos_encoding: bicubic, no antialias
            cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
            p = jnp.transpose(patch_pos.reshape(1, g0, g0, -1), (0, 3, 1, 2)).astype(jnp.float32)
            p = _bicubic_resize_2d(p, (grid, grid), antialias=False)
            patch_pos = jnp.transpose(p, (0, 2, 3, 1)).reshape(1, grid * grid, -1)
            pos = jnp.concatenate([cls_pos.astype(jnp.float32), patch_pos], axis=1)
        pos = pos.astype(tokens.dtype)
        tokens = tokens + pos[:, 1:]
        b = tokens.shape[0]
        cls = jnp.broadcast_to(ep["cls_token"].astype(tokens.dtype) + pos[:, :1],
                               (b, 1, self.hidden_size))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        for i, layer in enumerate(self.encoder.layer):
            tokens = layer(params["encoder"]["layer"][i], tokens)
        tokens = self.final_norm({}, tokens)
        return tokens[:, 1:]


class RAESiglipEncoder(Module):
    """SiglipVisionModel mirror (no pooling head; affine-free post layernorm;
    bicubic pos-embed interpolation for non-native input sizes)."""

    def __init__(self, hidden_size: int, patch_size: int, num_hidden_layers: int,
                 image_size: int = 256, head_dim: int = 64):
        super().__init__()
        from ..text_encoders.siglip import _SiglipEncoderLayer

        self.hidden_size = hidden_size
        self.patch_size = patch_size
        num_positions = (image_size // patch_size) ** 2

        from ...ops.module import Embedding

        class _Embeddings(Module):
            def __init__(s):
                super().__init__()
                s.patch_embedding = Conv2d(3, hidden_size, kernel_size=patch_size,
                                           stride=patch_size, padding=0)
                s.position_embedding = Embedding(num_positions, hidden_size)

        class _Encoder(Module):
            def __init__(s):
                super().__init__()
                s.layers = ModuleList([
                    _SiglipEncoderLayer(hidden_size, hidden_size // head_dim,
                                        hidden_size * 4, 1e-6)
                    for _ in range(num_hidden_layers)
                ])

        class _VisionTower(Module):
            def __init__(s):
                super().__init__()
                s.embeddings = _Embeddings()
                s.encoder = _Encoder()

        self.vision_model = _VisionTower()
        self.final_norm = LayerNorm(hidden_size, use_scale=False, use_bias=False, eps=1e-6)

    def __call__(self, params: Params, x_nchw: jax.Array) -> jax.Array:
        vp = params["vision_model"]
        tower = self.vision_model
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        x = tower.embeddings.patch_embedding(vp["embeddings"]["patch_embedding"], x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        pos = vp["embeddings"]["position_embedding"]["embedding"]
        g0 = int(math.isqrt(pos.shape[0]))
        if g0 != gh:
            p = jnp.transpose(pos.reshape(1, g0, g0, -1), (0, 3, 1, 2)).astype(jnp.float32)
            p = _bicubic_resize_2d(p, (gh, gw), antialias=False)
            pos = jnp.transpose(p, (0, 2, 3, 1)).reshape(gh * gw, -1)
        x = x + pos[None].astype(x.dtype)
        for i, layer in enumerate(tower.encoder.layers):
            x = layer(vp["encoder"]["layers"][i], x)
        return self.final_norm({}, x)


# ---------------------------------------------------------------------------
# Decoder (ViT-MAE style, RAE-main checkpoint naming)
# ---------------------------------------------------------------------------


class _RAEDecoderLayer(Module):
    """ViTMAELayer variant built on the diffusers Attention module (to_q/...;
    reference autoencoder_rae.py:180)."""

    def __init__(self, hidden: int, heads: int, intermediate: int, eps: float = 1e-12):
        super().__init__()
        self.attention = Attention(query_dim=hidden, heads=heads, dim_head=hidden // heads,
                                   bias=True)

        class _Inter(Module):
            def __init__(s):
                super().__init__()
                s.dense = Linear(hidden, intermediate)

        class _Out(Module):
            def __init__(s):
                super().__init__()
                s.dense = Linear(intermediate, hidden)

        self.intermediate = _Inter()
        self.output = _Out()
        self.layernorm_before = LayerNorm(hidden, eps=eps)
        self.layernorm_after = LayerNorm(hidden, eps=eps)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = x + self.attention(params["attention"], self.layernorm_before(params["layernorm_before"], x))
        h = self.layernorm_after(params["layernorm_after"], x)
        h = jax.nn.gelu(self.intermediate.dense(params["intermediate"]["dense"], h), approximate=False)
        return x + self.output.dense(params["output"]["dense"], h)


class RAEDecoder(Module):
    """Reference RAEDecoder (`:228`): decoder_embed → +cls/+sincos pos →
    decoder_layers → decoder_norm → decoder_pred, then unpatchify."""

    def __init__(self, hidden_size: int, decoder_hidden_size: int, decoder_num_hidden_layers: int,
                 decoder_num_attention_heads: int, decoder_intermediate_size: int,
                 num_patches: int, patch_size: int, num_channels: int, image_size: int):
        super().__init__()
        self.decoder_hidden_size = decoder_hidden_size
        self.num_patches = num_patches
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.image_size = image_size
        self.decoder_embed = Linear(hidden_size, decoder_hidden_size, use_bias=True)
        self.decoder_layers = ModuleList([
            _RAEDecoderLayer(decoder_hidden_size, decoder_num_attention_heads,
                             decoder_intermediate_size)
            for _ in range(decoder_num_hidden_layers)
        ])
        self.decoder_norm = LayerNorm(decoder_hidden_size, eps=1e-12)
        self.decoder_pred = Linear(decoder_hidden_size, patch_size**2 * num_channels, use_bias=True)
        grid = int(math.isqrt(num_patches))
        self._pos = _sincos_2d(decoder_hidden_size, grid, extra_tokens=1)[None]

    def init(self, key, dtype=jnp.float32) -> Params:
        p = super().init(key, dtype=dtype)
        p["trainable_cls_token"] = jnp.zeros((1, 1, self.decoder_hidden_size), dtype)
        return p

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def _interpolate_latent(self, x: jax.Array) -> jax.Array:
        b, l, c = x.shape
        if l == self.num_patches:
            return x
        h = int(math.isqrt(l))
        g = int(math.isqrt(self.num_patches))
        xm = jnp.transpose(x.reshape(b, h, h, c), (0, 3, 1, 2)).astype(jnp.float32)
        Wh = jnp.asarray(_bilinear_matrix(h, g))
        xm = jnp.einsum("oh,bchw,pw->bcop", Wh, xm, Wh)
        return jnp.transpose(xm, (0, 2, 3, 1)).reshape(b, g * g, c).astype(x.dtype)

    def unpatchify(self, logits: jax.Array) -> jax.Array:
        p, c = self.patch_size, self.num_channels
        gh = gw = self.image_size // p
        b = logits.shape[0]
        x = logits.reshape(b, gh, gw, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(b, c, gh * p, gw * p)

    def __call__(self, params: Params, hidden_states: jax.Array, return_dict: bool = True):
        x = self.decoder_embed(params["decoder_embed"], hidden_states)
        x = self._interpolate_latent(x)
        b = x.shape[0]
        cls = jnp.broadcast_to(params["trainable_cls_token"].astype(x.dtype),
                               (b, 1, self.decoder_hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + jnp.asarray(self._pos, x.dtype)
        for i, layer in enumerate(self.decoder_layers):
            x = layer(params["decoder_layers"][i], x)
        x = self.decoder_norm(params["decoder_norm"], x)
        logits = self.decoder_pred(params["decoder_pred"], x)[:, 1:]
        if not return_dict:
            return (logits,)
        return RAEDecoderOutput(logits=logits)


class AutoencoderRAE(Module, ModelMixin, ConfigMixin):
    """Representation autoencoder (reference `:393`)."""

    @register_to_config
    def __init__(
        self,
        encoder_type: str = "dinov2",
        encoder_hidden_size: int = 768,
        encoder_patch_size: int = 14,
        encoder_num_hidden_layers: int = 12,
        decoder_hidden_size: int = 512,
        decoder_num_hidden_layers: int = 8,
        decoder_num_attention_heads: int = 16,
        decoder_intermediate_size: int = 2048,
        patch_size: int = 16,
        encoder_input_size: int = 224,
        image_size: Optional[int] = None,
        num_channels: int = 3,
        encoder_norm_mean: Optional[list] = None,
        encoder_norm_std: Optional[list] = None,
        latents_mean: Optional[list] = None,
        latents_std: Optional[list] = None,
        noise_tau: float = 0.0,
        reshape_to_2d: bool = True,
        use_encoder_loss: bool = False,
        scaling_factor: float = 1.0,
    ):
        super().__init__()
        if encoder_input_size % encoder_patch_size != 0:
            raise ValueError("encoder_input_size must divide encoder_patch_size")
        num_patches = (encoder_input_size // encoder_patch_size) ** 2
        grid = int(math.isqrt(num_patches))
        if grid * grid != num_patches:
            raise ValueError(f"num_patches={num_patches} must be a perfect square")
        derived = patch_size * grid
        if image_size is None:
            image_size = derived
        elif int(image_size) != derived:
            raise ValueError(f"image_size must equal patch_size*sqrt(num_patches)={derived}")

        enc_cls = {"dinov2": RAEDinov2Encoder, "siglip2": RAESiglipEncoder, "mae": RAEMaeEncoder}
        if encoder_type not in enc_cls:
            raise ValueError(f"Unknown encoder_type={encoder_type!r}; available: {sorted(enc_cls)}")
        default_img = {"dinov2": 518, "siglip2": 256, "mae": 224}[encoder_type]
        self.encoder = enc_cls[encoder_type](
            hidden_size=encoder_hidden_size, patch_size=encoder_patch_size,
            num_hidden_layers=encoder_num_hidden_layers, image_size=default_img,
        )
        self.decoder = RAEDecoder(
            hidden_size=encoder_hidden_size, decoder_hidden_size=decoder_hidden_size,
            decoder_num_hidden_layers=decoder_num_hidden_layers,
            decoder_num_attention_heads=decoder_num_attention_heads,
            decoder_intermediate_size=decoder_intermediate_size,
            num_patches=num_patches, patch_size=patch_size,
            num_channels=num_channels, image_size=int(image_size),
        )
        self.num_patches = num_patches
        self._enc_mean = np.asarray(encoder_norm_mean or [0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
        self._enc_std = np.asarray(encoder_norm_std or [0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
        self._lat_mean = np.asarray(latents_mean if latents_mean is not None else [0.0], np.float32)
        self._lat_std = np.asarray(latents_std if latents_std is not None else [1.0], np.float32)
        self.encoder_input_size = encoder_input_size

    # latent statistics travel in the checkpoint as buffers _latents_mean/_latents_std;
    # encoder_mean/encoder_std likewise (reference `:548-559`)
    def init(self, key, dtype=jnp.float32) -> Params:
        p = super().init(key, dtype=dtype)
        p["encoder_mean"] = jnp.asarray(self._enc_mean, dtype)
        p["encoder_std"] = jnp.asarray(self._enc_std, dtype)
        p["_latents_mean"] = jnp.asarray(self._lat_mean, dtype)
        p["_latents_std"] = jnp.asarray(self._lat_std, dtype)
        return p

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def _resize_and_normalize(self, params: Params, x: jax.Array) -> jax.Array:
        s = self.encoder_input_size
        if x.shape[-2:] != (s, s):
            x = _bicubic_resize_2d(x.astype(jnp.float32), (s, s)).astype(x.dtype)
        return (x - params["encoder_mean"].astype(x.dtype)) / params["encoder_std"].astype(x.dtype)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True,
               key: Optional[jax.Array] = None):
        x = self._resize_and_normalize(params, x)
        tokens = self.encoder(params["encoder"], x)  # [B, N, C]
        if self.config.reshape_to_2d:
            b, n, c = tokens.shape
            side = int(math.isqrt(n))
            z = jnp.transpose(tokens, (0, 2, 1)).reshape(b, c, side, side)
        else:
            z = tokens
        lm = params["_latents_mean"].astype(z.dtype)
        ls = params["_latents_std"].astype(z.dtype)
        z = (z - lm) / (ls + 1e-5)
        if self.config.scaling_factor != 1.0:
            z = z * self.config.scaling_factor
        if not return_dict:
            return (z,)
        return EncoderOutput(latent=z)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        if self.config.scaling_factor != 1.0:
            z = z / self.config.scaling_factor
        lm = params["_latents_mean"].astype(z.dtype)
        ls = params["_latents_std"].astype(z.dtype)
        z = z * (ls + 1e-5) + lm
        if self.config.reshape_to_2d:
            b, c, h, w = z.shape
            tokens = jnp.transpose(z.reshape(b, c, h * w), (0, 2, 1))
        else:
            tokens = z
        logits = self.decoder(params["decoder"], tokens).logits
        x = self.decoder.unpatchify(logits)
        x = x * params["encoder_std"].astype(x.dtype) + params["encoder_mean"].astype(x.dtype)
        if not return_dict:
            return (x,)
        return DecoderOutput(sample=x)

    def __call__(self, params: Params, sample: jax.Array, return_dict: bool = True,
                 key: Optional[jax.Array] = None):
        z = self.encode(params, sample, return_dict=False)[0]
        decoded = self.decode(params, z, return_dict=False)[0]
        if not return_dict:
            return (decoded,)
        return DecoderOutput(sample=decoded)

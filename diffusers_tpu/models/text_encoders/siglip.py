"""SigLIP vision tower (transformers.SiglipVisionModel checkpoint layout).

Behavioral mirror of `transformers/models/siglip/modeling_siglip.py`
(SiglipVisionTransformer): Conv2d patch embed + learned position embeddings
(no CLS token), pre-LN encoder layers with gelu-tanh MLPs, post layernorm,
and an optional multihead-attention-pooling head (`vision_use_head`).

Used as the `image_encoder` component of Flux Redux, HunyuanVideo Framepack,
and HunyuanVideo-1.5 pipelines (reference e.g.
`pipelines/hunyuan_video/pipeline_hunyuan_video_framepack.py:446`).

TPU-first: NHWC patch conv, one fused attention per layer via the shared
dispatch, fp32 layernorm statistics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv2d, Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin


@dataclass
class SiglipVisionOutput(BaseOutput):
    last_hidden_state: jax.Array
    pooler_output: Optional[jax.Array] = None


class _SiglipAttention(Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q_proj = Linear(dim, dim)
        self.k_proj = Linear(dim, dim)
        self.v_proj = Linear(dim, dim)
        self.out_proj = Linear(dim, dim)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, n, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, n, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, n, self.num_heads, self.head_dim)
        out = dispatch_attention_fn(q, k, v)
        return self.out_proj(params["out_proj"], out.reshape(b, n, -1))


class _SiglipMLP(Module):
    def __init__(self, dim: int, intermediate: int):
        super().__init__()
        self.fc1 = Linear(dim, intermediate)
        self.fc2 = Linear(intermediate, dim)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.fc2(params["fc2"], jax.nn.gelu(self.fc1(params["fc1"], x), approximate=True))


class _SiglipEncoderLayer(Module):
    def __init__(self, dim: int, num_heads: int, intermediate: int, eps: float):
        super().__init__()
        self.layer_norm1 = LayerNorm(dim, eps=eps)
        self.self_attn = _SiglipAttention(dim, num_heads)
        self.layer_norm2 = LayerNorm(dim, eps=eps)
        self.mlp = _SiglipMLP(dim, intermediate)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = x + self.self_attn(params["self_attn"], self.layer_norm1(params["layer_norm1"], x))
        x = x + self.mlp(params["mlp"], self.layer_norm2(params["layer_norm2"], x))
        return x


class _TorchMHA(Module):
    """torch nn.MultiheadAttention checkpoint layout: packed in_proj_weight /
    in_proj_bias plus an out_proj Linear."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.out_proj = Linear(dim, dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        d = self.dim
        params["in_proj_weight"] = jax.random.normal(key, (3 * d, d), dtype) * 0.02
        params["in_proj_bias"] = jnp.zeros((3 * d,), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, query: jax.Array, kv: jax.Array) -> jax.Array:
        b, nq, d = query.shape
        n = kv.shape[1]
        h = self.num_heads
        wq, wk, wv = jnp.split(params["in_proj_weight"].astype(query.dtype), 3, axis=0)
        bq, bk, bv = jnp.split(params["in_proj_bias"].astype(query.dtype), 3, axis=0)
        q = (query @ wq.T + bq).reshape(b, nq, h, d // h)
        k = (kv @ wk.T + bk).reshape(b, n, h, d // h)
        v = (kv @ wv.T + bv).reshape(b, n, h, d // h)
        out = dispatch_attention_fn(q, k, v).reshape(b, nq, d)
        return self.out_proj(params["out_proj"], out)


class _SiglipPoolingHead(Module):
    """MultiheadAttentionPoolingHead: a learned probe cross-attends the
    sequence, then LN + residual MLP."""

    def __init__(self, dim: int, num_heads: int, intermediate: int, eps: float):
        super().__init__()
        self.dim = dim
        self.attention = _TorchMHA(dim, num_heads)
        self.layernorm = LayerNorm(dim, eps=eps)
        self.mlp = _SiglipMLP(dim, intermediate)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["probe"] = jax.random.normal(key, (1, 1, self.dim), dtype) * 0.02
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, _, d = x.shape
        probe = jnp.broadcast_to(params["probe"].astype(x.dtype), (b, 1, d))
        out = self.attention(params["attention"], probe, x)
        residual = out
        out = self.layernorm(params["layernorm"], out)
        out = residual + self.mlp(params["mlp"], out)
        return out[:, 0]


class SiglipVisionModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        hidden_size: int = 768,
        intermediate_size: int = 3072,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        num_channels: int = 3,
        image_size: int = 224,
        patch_size: int = 16,
        layer_norm_eps: float = 1e-6,
        vision_use_head: bool = True,
        **unused,
    ):
        super().__init__()
        self.num_positions = (image_size // patch_size) ** 2

        class _Embeddings(Module):
            def __init__(s):
                super().__init__()
                s.patch_embedding = Conv2d(num_channels, hidden_size, kernel_size=patch_size,
                                           stride=patch_size, padding=0)
                s.position_embedding = Embedding(self.num_positions, hidden_size)

        class _Encoder(Module):
            def __init__(s):
                super().__init__()
                s.layers = ModuleList([
                    _SiglipEncoderLayer(hidden_size, num_attention_heads, intermediate_size, layer_norm_eps)
                    for _ in range(num_hidden_layers)
                ])

        class _VisionTower(Module):
            def __init__(s):
                super().__init__()
                s.embeddings = _Embeddings()
                s.encoder = _Encoder()
                s.post_layernorm = LayerNorm(hidden_size, eps=layer_norm_eps)
                if vision_use_head:
                    s.head = _SiglipPoolingHead(hidden_size, num_attention_heads,
                                                intermediate_size, layer_norm_eps)

        self.vision_model = _VisionTower()

    def __call__(self, params: Params, pixel_values: jax.Array,
                 return_dict: bool = True) -> SiglipVisionOutput:
        """pixel_values: [B, 3, H, W] (normalized by the image processor)."""
        vp = params["vision_model"]
        tower = self.vision_model
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NCHW → NHWC
        x = tower.embeddings.patch_embedding(vp["embeddings"]["patch_embedding"], x)
        b = x.shape[0]
        x = x.reshape(b, -1, x.shape[-1])
        pos = vp["embeddings"]["position_embedding"]["embedding"].astype(x.dtype)
        x = x + pos[None, : x.shape[1]]
        for i, layer in enumerate(tower.encoder.layers):
            x = layer(vp["encoder"]["layers"][i], x)
        x = tower.post_layernorm(vp["post_layernorm"], x)
        pooled = None
        if getattr(tower, "head", None) is not None:
            pooled = tower.head(vp["head"], x)
        if not return_dict:
            return (x, pooled)
        return SiglipVisionOutput(last_hidden_state=x, pooler_output=pooled)

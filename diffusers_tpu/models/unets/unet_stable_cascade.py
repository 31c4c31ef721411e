"""StableCascadeUNet (prior "stage C" and decoder "stage B").

Behavioral mirror of the reference `models/unets/unet_stable_cascade.py`:
channels-last LayerNorm wrapper (`SDCascadeLayerNorm` :30 — native in our
NHWC layout), timestep blocks with extra `sca`/`crp` condition chunks
(`:40`), ConvNeXt-style res blocks (depthwise conv → LN → linear-GELU-GRN
-linear, `:58`), GlobalResponseNorm (`:81`), attention blocks over
flattened spatial tokens with SiLU-linear kv mapping and optional
self+cross concat (`:93`), pixel-unshuffle embedding (`:281`),
down/upscalers with repeat mappers, CLIP pooled/text/image conditioning
expanded `clip_seq`-fold (`:633`), sin-cos timestep-ratio embedding
(`:421` — sin first), bilinear align-corners resizes for effnet/pixel
conditionings and skip mismatches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import (
    Conv2d,
    ConvTranspose2d,
    LayerNorm,
    Linear,
    Module,
    ModuleList,
    Params,
)
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin


@dataclass
class StableCascadeUNetOutput(BaseOutput):
    sample: jax.Array = None


def _pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelUnshuffle: [B,H,W,C] → [B,H/r,W/r,C*r*r] (torch channel
    ordering c*r²+i*r+j)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(B, H // r, W // r, C * r * r)


def _pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(B, H * r, W * r, c)


def _bilinear_align_corners(x: jax.Array, size) -> jax.Array:
    """NHWC bilinear resize with torch align_corners=True semantics."""
    from jax.scipy.ndimage import map_coordinates

    B, H, W, C = x.shape
    oh, ow = size
    ys = jnp.linspace(0.0, H - 1.0, oh) if oh > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, ow) if ow > 1 else jnp.zeros((1,))
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    def one(img2d):
        return map_coordinates(img2d, [yy, xx], order=1)

    x = jnp.transpose(x, (0, 3, 1, 2))
    out = jax.vmap(jax.vmap(one))(x)
    return jnp.transpose(out, (0, 2, 3, 1))


class _Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params, x, *a, **k):
        return x


class GlobalResponseNorm(Module):
    """ConvNeXt-V2 GRN over [B, H, W, C] (reference :81)."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"gamma": jnp.zeros((1, 1, 1, self.dim), dtype),
                "beta": jnp.zeros((1, 1, 1, self.dim), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        agg = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True))
        stand = agg / (jnp.mean(agg, axis=-1, keepdims=True) + 1e-6)
        stand = stand.astype(x.dtype)
        return params["gamma"].astype(x.dtype) * (x * stand) + params["beta"].astype(x.dtype) + x


class SDCascadeTimestepBlock(Module):
    def __init__(self, c: int, c_timestep: int, conds=()):
        super().__init__()
        self.conds = tuple(conds)
        self.mapper = Linear(c_timestep, c * 2)
        for cname in self.conds:
            setattr(self, f"mapper_{cname}", Linear(c_timestep, c * 2))

    def __call__(self, params: Params, x: jax.Array, t: jax.Array) -> jax.Array:
        chunks = jnp.split(t, len(self.conds) + 1, axis=1)
        ab = self.mapper(params["mapper"], chunks[0])[:, None, None, :]
        a, b = jnp.split(ab, 2, axis=-1)
        for i, cname in enumerate(self.conds):
            mapper = getattr(self, f"mapper_{cname}")
            abc = mapper(params[f"mapper_{cname}"], chunks[i + 1])[:, None, None, :]
            ac, bc = jnp.split(abc, 2, axis=-1)
            a, b = a + ac, b + bc
        return x * (1 + a) + b


class SDCascadeResBlock(Module):
    def __init__(self, c: int, c_skip: int = 0, kernel_size: int = 3, dropout: float = 0.0):
        super().__init__()
        self.depthwise = Conv2d(c, c, kernel_size=kernel_size, padding=kernel_size // 2, groups=c)
        self.norm = LayerNorm(c, eps=1e-6, use_scale=False, use_bias=False)
        self.channelwise = ModuleList([
            Linear(c + c_skip, c * 4), _Identity(), GlobalResponseNorm(c * 4),
            _Identity(), Linear(c * 4, c),
        ])

    def __call__(self, params: Params, x: jax.Array, x_skip: Optional[jax.Array] = None) -> jax.Array:
        x_res = x
        x = self.norm({}, self.depthwise(params["depthwise"], x))
        if x_skip is not None:
            x = jnp.concatenate([x, x_skip], axis=-1)
        x = self.channelwise[0](params["channelwise"][0], x)
        x = jax.nn.gelu(x, approximate=False)
        x = self.channelwise[2](params["channelwise"][2], x)
        x = self.channelwise[4](params["channelwise"][4], x)
        return x + x_res


class SDCascadeAttnBlockWrapper(Module):
    def __init__(self, c, c_cond, nhead, self_attn=True):
        super().__init__()
        self.self_attn = self_attn
        self.norm = LayerNorm(c, eps=1e-6, use_scale=False, use_bias=False)
        self.attention = _InnerAttention(c, nhead)
        self.kv_mapper = ModuleList([_Identity(), Linear(c_cond, c)])

    def __call__(self, params: Params, x: jax.Array, kv: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        kv = self.kv_mapper[1](params["kv_mapper"][1], jax.nn.silu(kv))
        norm_x = self.norm({}, x)
        tokens = norm_x.reshape(B, H * W, C)
        if self.self_attn:
            kv = jnp.concatenate([tokens, kv], axis=1)
        out = self.attention(params["attention"], tokens, kv)
        return x + out.reshape(B, H, W, C)


class _InnerAttention(Module):
    def __init__(self, c, nhead):
        super().__init__()
        self.heads = nhead
        self.head_dim = c // nhead
        self.to_q = Linear(c, c, use_bias=True)
        self.to_k = Linear(c, c, use_bias=True)
        self.to_v = Linear(c, c, use_bias=True)
        self.to_out = ModuleList([Linear(c, c, use_bias=True)])

    def __call__(self, params, q_tokens, kv_tokens):
        B = q_tokens.shape[0]
        q = self.to_q(params["to_q"], q_tokens).reshape(B, -1, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], kv_tokens).reshape(B, -1, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], kv_tokens).reshape(B, -1, self.heads, self.head_dim)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, -1, self.heads * self.head_dim)
        return self.to_out[0](params["to_out"][0], out)


class _DownscalerConv(Module):
    """Sequential(LN-no-affine, Conv2d k2 s2) — torch key `<idx>.1`."""

    def __init__(self, c_in, c_out):
        super().__init__()
        conv = Conv2d(c_in, c_out, kernel_size=2, stride=2)
        self._children["1"] = conv
        self._conv = conv
        self.norm = LayerNorm(c_in, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params, x):
        return self._conv(params["1"], self.norm({}, x))


class _UpscalerConvT(Module):
    """Sequential(LN-no-affine, ConvTranspose2d k2 s2) — torch key `<idx>.1`."""

    def __init__(self, c_in, c_out):
        super().__init__()
        convt = ConvTranspose2d(c_in, c_out, kernel_size=2, stride=2)
        self._children["1"] = convt
        self._convt = convt
        self.norm = LayerNorm(c_in, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params, x):
        return self._convt(params["1"], self.norm({}, x))


class _MapperSeq(Module):
    """Sequential(Conv 1x1, GELU, Conv 1x1, LN-no-affine) — torch keys .0/.2."""

    def __init__(self, c_in, c_hidden, c_out):
        super().__init__()
        conv0 = Conv2d(c_in, c_hidden, kernel_size=1)
        conv2 = Conv2d(c_hidden, c_out, kernel_size=1)
        self._children["0"] = conv0
        self._children["2"] = conv2
        self.norm = LayerNorm(c_out, eps=1e-6, use_scale=False, use_bias=False)
        self._conv0, self._conv2 = conv0, conv2

    def __call__(self, params, x):
        x = self._conv0(params["0"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = self._conv2(params["2"], x)
        return self.norm({}, x)


class _EmbeddingSeq(Module):
    """Sequential(PixelUnshuffle, Conv 1x1, LN) — torch key .1."""

    def __init__(self, patch_size, c_in, c_out):
        super().__init__()
        self.patch_size = patch_size
        conv = Conv2d(c_in * patch_size**2, c_out, kernel_size=1)
        self._children["1"] = conv
        self._conv = conv
        self.norm = LayerNorm(c_out, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params, x):
        x = _pixel_unshuffle(x, self.patch_size)
        x = self._conv(params["1"], x)
        return self.norm({}, x)


class _ClfSeq(Module):
    """Sequential(LN, Conv 1x1, PixelShuffle) — torch key .1."""

    def __init__(self, c_in, c_out, patch_size):
        super().__init__()
        self.patch_size = patch_size
        conv = Conv2d(c_in, c_out * patch_size**2, kernel_size=1)
        self._children["1"] = conv
        self._conv = conv
        self.norm = LayerNorm(c_in, eps=1e-6, use_scale=False, use_bias=False)

    def __call__(self, params, x):
        x = self.norm({}, x)
        x = self._conv(params["1"], x)
        return _pixel_shuffle(x, self.patch_size)


class StableCascadeUNet(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        out_channels: int = 16,
        timestep_ratio_embedding_dim: int = 64,
        patch_size: int = 1,
        conditioning_dim: int = 2048,
        block_out_channels: Tuple[int, ...] = (2048, 2048),
        num_attention_heads: Tuple[int, ...] = (32, 32),
        down_num_layers_per_block: Tuple[int, ...] = (8, 24),
        up_num_layers_per_block: Tuple[int, ...] = (24, 8),
        down_blocks_repeat_mappers: Tuple[int, ...] = (1, 1),
        up_blocks_repeat_mappers: Tuple[int, ...] = (1, 1),
        block_types_per_layer=(
            ("SDCascadeResBlock", "SDCascadeTimestepBlock", "SDCascadeAttnBlock"),
            ("SDCascadeResBlock", "SDCascadeTimestepBlock", "SDCascadeAttnBlock"),
        ),
        clip_text_in_channels: Optional[int] = None,
        clip_text_pooled_in_channels: int = 1280,
        clip_image_in_channels: Optional[int] = None,
        clip_seq: int = 4,
        effnet_in_channels: Optional[int] = None,
        pixel_mapper_in_channels: Optional[int] = None,
        kernel_size: int = 3,
        dropout: Union[float, Tuple[float, ...]] = (0.1, 0.1),
        self_attn: Union[bool, Tuple[bool, ...]] = True,
        timestep_conditioning_type: Tuple[str, ...] = ("sca", "crp"),
        switch_level: Optional[Tuple[bool, ...]] = None,
    ):
        super().__init__()
        if isinstance(self_attn, bool):
            self_attn = (self_attn,) * len(block_out_channels)

        if effnet_in_channels is not None:
            self.effnet_mapper = _MapperSeq(effnet_in_channels, block_out_channels[0] * 4, block_out_channels[0])
        if pixel_mapper_in_channels is not None:
            self.pixels_mapper = _MapperSeq(pixel_mapper_in_channels, block_out_channels[0] * 4, block_out_channels[0])

        self.clip_txt_pooled_mapper = Linear(clip_text_pooled_in_channels, conditioning_dim * clip_seq)
        if clip_text_in_channels is not None:
            self.clip_txt_mapper = Linear(clip_text_in_channels, conditioning_dim)
        if clip_image_in_channels is not None:
            self.clip_img_mapper = Linear(clip_image_in_channels, conditioning_dim * clip_seq)
        self.clip_norm = LayerNorm(conditioning_dim, eps=1e-6, use_scale=False, use_bias=False)

        self.embedding = _EmbeddingSeq(patch_size, in_channels, block_out_channels[0])

        def get_block(block_type, c, nhead, c_skip=0, self_attn_flag=True):
            if block_type == "SDCascadeResBlock":
                return SDCascadeResBlock(c, c_skip, kernel_size=kernel_size)
            if block_type == "SDCascadeAttnBlock":
                return SDCascadeAttnBlockWrapper(c, conditioning_dim, nhead, self_attn=self_attn_flag)
            if block_type == "SDCascadeTimestepBlock":
                return SDCascadeTimestepBlock(c, timestep_ratio_embedding_dim,
                                              conds=timestep_conditioning_type)
            raise ValueError(block_type)

        nlevels = len(block_out_channels)
        down_blocks, down_downscalers, down_repeat_mappers = [], [], []
        for i in range(nlevels):
            if i > 0:
                down_downscalers.append(_DownscalerConv(block_out_channels[i - 1], block_out_channels[i]))
            else:
                down_downscalers.append(_Identity())
            blocks = []
            for _ in range(down_num_layers_per_block[i]):
                for bt in block_types_per_layer[i]:
                    blocks.append(get_block(bt, block_out_channels[i], num_attention_heads[i],
                                            self_attn_flag=self_attn[i]))
            down_blocks.append(ModuleList(blocks))
            down_repeat_mappers.append(ModuleList([
                Conv2d(block_out_channels[i], block_out_channels[i], kernel_size=1)
                for _ in range(down_blocks_repeat_mappers[i] - 1)
            ]))
        self.down_blocks = ModuleList(down_blocks)
        self.down_downscalers = ModuleList(down_downscalers)
        self.down_repeat_mappers = ModuleList(down_repeat_mappers)

        up_blocks, up_upscalers, up_repeat_mappers = [], [], []
        for i in reversed(range(nlevels)):
            if i > 0:
                up_upscalers.append(_UpscalerConvT(block_out_channels[i], block_out_channels[i - 1]))
            else:
                up_upscalers.append(_Identity())
            blocks = []
            for j in range(up_num_layers_per_block[::-1][i]):
                for k, bt in enumerate(block_types_per_layer[i]):
                    c_skip = block_out_channels[i] if i < nlevels - 1 and j == k == 0 else 0
                    blocks.append(get_block(bt, block_out_channels[i], num_attention_heads[i],
                                            c_skip=c_skip, self_attn_flag=self_attn[i]))
            up_blocks.append(ModuleList(blocks))
            up_repeat_mappers.append(ModuleList([
                Conv2d(block_out_channels[i], block_out_channels[i], kernel_size=1)
                for _ in range(up_blocks_repeat_mappers[::-1][i] - 1)
            ]))
        self.up_blocks = ModuleList(up_blocks)
        self.up_upscalers = ModuleList(up_upscalers)
        self.up_repeat_mappers = ModuleList(up_repeat_mappers)

        self.clf = _ClfSeq(block_out_channels[0], out_channels, patch_size)

    def get_timestep_ratio_embedding(self, timestep_ratio: jax.Array) -> jax.Array:
        r = timestep_ratio * 10000.0
        half_dim = self.config.timestep_ratio_embedding_dim // 2
        emb = math.log(10000.0) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = r[:, None].astype(jnp.float32) * emb[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
        if self.config.timestep_ratio_embedding_dim % 2 == 1:
            emb = jnp.pad(emb, ((0, 0), (0, 1)))
        return emb.astype(timestep_ratio.dtype)

    def get_clip_embeddings(self, params, clip_txt_pooled, clip_txt=None, clip_img=None):
        if clip_txt_pooled.ndim == 2:
            clip_txt_pooled = clip_txt_pooled[:, None]
        B, S = clip_txt_pooled.shape[:2]
        pool = self.clip_txt_pooled_mapper(params["clip_txt_pooled_mapper"], clip_txt_pooled)
        pool = pool.reshape(B, S * self.config.clip_seq, -1)
        if clip_txt is not None and clip_img is not None:
            txt = self.clip_txt_mapper(params["clip_txt_mapper"], clip_txt)
            if clip_img.ndim == 2:
                clip_img = clip_img[:, None]
            img = self.clip_img_mapper(params["clip_img_mapper"], clip_img)
            img = img.reshape(B, clip_img.shape[1] * self.config.clip_seq, -1)
            clip = jnp.concatenate([txt, pool, img], axis=1)
        else:
            clip = pool
        return self.clip_norm({}, clip)

    def _run_block(self, block, bparams, x, r_embed, clip):
        if isinstance(block, SDCascadeResBlock):
            return block(bparams, x)
        if isinstance(block, SDCascadeAttnBlockWrapper):
            return block(bparams, x, clip)
        return block(bparams, x, r_embed)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,
        timestep_ratio: jax.Array,
        clip_text_pooled: jax.Array,
        clip_text: Optional[jax.Array] = None,
        clip_img: Optional[jax.Array] = None,
        effnet: Optional[jax.Array] = None,
        pixels: Optional[jax.Array] = None,
        sca: Optional[jax.Array] = None,
        crp: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if pixels is None:
            pixels = jnp.zeros((sample.shape[0], 3, 8, 8), dtype=sample.dtype)
        timestep_ratio = jnp.atleast_1d(jnp.asarray(timestep_ratio))
        timestep_ratio = jnp.broadcast_to(timestep_ratio, (sample.shape[0],))

        r_embed = self.get_timestep_ratio_embedding(timestep_ratio)
        for c in self.config.timestep_conditioning_type:
            cond = {"sca": sca, "crp": crp}.get(c)
            t_cond = cond if cond is not None else jnp.zeros_like(timestep_ratio)
            r_embed = jnp.concatenate([r_embed, self.get_timestep_ratio_embedding(t_cond)], axis=1)
        clip = self.get_clip_embeddings(params, clip_text_pooled, clip_text, clip_img)

        x = self.embedding(params["embedding"], jnp.transpose(sample, (0, 2, 3, 1)))
        if hasattr(self, "effnet_mapper") and effnet is not None:
            eff = _bilinear_align_corners(jnp.transpose(effnet, (0, 2, 3, 1)), x.shape[1:3])
            x = x + self.effnet_mapper(params["effnet_mapper"], eff)
        if hasattr(self, "pixels_mapper"):
            px = self.pixels_mapper(params["pixels_mapper"], jnp.transpose(pixels, (0, 2, 3, 1)))
            x = x + _bilinear_align_corners(px, x.shape[1:3])

        # down
        level_outputs = []
        for li in range(len(self.down_blocks)):
            dsp = params.get("down_downscalers", {})
            x = self.down_downscalers[li](dsp.get(li, {}), x)
            repmap = self.down_repeat_mappers[li]
            for i in range(len(repmap) + 1):
                for bi, block in enumerate(self.down_blocks[li]):
                    x = self._run_block(block, params["down_blocks"][li][bi], x, r_embed, clip)
                if i < len(repmap):
                    x = repmap[i](params["down_repeat_mappers"][li][i], x)
            level_outputs.insert(0, x)

        # up
        x = level_outputs[0]
        for li in range(len(self.up_blocks)):
            repmap = self.up_repeat_mappers[li]
            for j in range(len(repmap) + 1):
                k_res = 0
                for bi, block in enumerate(self.up_blocks[li]):
                    if isinstance(block, SDCascadeResBlock):
                        skip = level_outputs[li] if k_res == 0 and li > 0 else None
                        if skip is not None and x.shape[1:3] != skip.shape[1:3]:
                            x = _bilinear_align_corners(x, skip.shape[1:3])
                        x = block(params["up_blocks"][li][bi], x, skip)
                        k_res += 1
                    else:
                        x = self._run_block(block, params["up_blocks"][li][bi], x, r_embed, clip)
                if j < len(repmap):
                    x = repmap[j](params["up_repeat_mappers"][li][j], x)
            usp = params.get("up_upscalers", {})
            x = self.up_upscalers[li](usp.get(li, {}), x)

        x = self.clf(params["clf"], x)
        out = jnp.transpose(x, (0, 3, 1, 2))
        if not return_dict:
            return (out,)
        return StableCascadeUNetOutput(sample=out)

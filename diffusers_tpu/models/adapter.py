"""T2I-Adapter (arXiv:2302.08453): lightweight control-feature extractors
whose multi-scale features are added inside the UNet's down blocks.

Architecture mirror of the reference `models/adapter.py` (`T2IAdapter:220`,
`FullAdapter:303`, `FullAdapterXL:353`, `LightAdapter:481`,
`MultiAdapter:28`), rewritten NHWC for the TPU conv path. API convention
matches our other models: NCHW at the public boundary, NHWC inside; the
returned feature maps are NCHW (the UNet transposes additional residuals
itself)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..configuration_utils import ConfigMixin, register_to_config
from .modeling_utils import ModelMixin
from ..ops.module import Conv2d, Module, ModuleList


def _avg_pool_2x(x: jax.Array) -> jax.Array:
    """AvgPool2d(kernel=2, stride=2, ceil_mode=True) over NHWC."""
    b, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _pixel_unshuffle(x: jax.Array, f: int) -> jax.Array:
    """NHWC space-to-depth matching torch PixelUnshuffle channel order
    (out channel index = c * f * f + dy * f + dx)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # b, H, W, c, fy, fx
    return x.reshape(b, h // f, w // f, c * f * f)


class AdapterResnetBlock(Module):
    def __init__(self, channels: int):
        super().__init__()
        self.block1 = Conv2d(channels, channels, kernel_size=3, padding=1)
        self.block2 = Conv2d(channels, channels, kernel_size=1)

    def __call__(self, params, x):
        h = jax.nn.relu(self.block1(params["block1"], x))
        return self.block2(params["block2"], h) + x


class AdapterBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, num_res_blocks: int, down: bool = False):
        super().__init__()
        self.down = down
        self.in_conv = Conv2d(in_channels, out_channels, kernel_size=1) if in_channels != out_channels else None
        self.resnets = ModuleList([AdapterResnetBlock(out_channels) for _ in range(num_res_blocks)])

    def __call__(self, params, x):
        if self.down:
            x = _avg_pool_2x(x)
        if self.in_conv is not None:
            x = self.in_conv(params["in_conv"], x)
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        return x


class LightAdapterResnetBlock(Module):
    def __init__(self, channels: int):
        super().__init__()
        self.block1 = Conv2d(channels, channels, kernel_size=3, padding=1)
        self.block2 = Conv2d(channels, channels, kernel_size=3, padding=1)

    def __call__(self, params, x):
        h = jax.nn.relu(self.block1(params["block1"], x))
        return self.block2(params["block2"], h) + x


class LightAdapterBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, num_res_blocks: int, down: bool = False):
        super().__init__()
        mid = out_channels // 4
        self.down = down
        self.in_conv = Conv2d(in_channels, mid, kernel_size=1)
        self.resnets = ModuleList([LightAdapterResnetBlock(mid) for _ in range(num_res_blocks)])
        self.out_conv = Conv2d(mid, out_channels, kernel_size=1)

    def __call__(self, params, x):
        if self.down:
            x = _avg_pool_2x(x)
        x = self.in_conv(params["in_conv"], x)
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        return self.out_conv(params["out_conv"], x)


class T2IAdapter(Module, ModelMixin, ConfigMixin):
    """Reference `T2IAdapter` (adapter.py:220): full_adapter (SD),
    full_adapter_xl (SDXL), light_adapter variants."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        channels: Sequence[int] = (320, 640, 1280, 1280),
        num_res_blocks: int = 2,
        downscale_factor: int = 8,
        adapter_type: str = "full_adapter",
    ):
        super().__init__()
        channels = list(channels)
        self.adapter_type = adapter_type
        self.downscale_factor = downscale_factor
        unshuffled = in_channels * downscale_factor**2

        if adapter_type == "full_adapter":
            self.conv_in = Conv2d(unshuffled, channels[0], kernel_size=3, padding=1)
            body = [AdapterBlock(channels[0], channels[0], num_res_blocks)]
            body += [AdapterBlock(channels[i - 1], channels[i], num_res_blocks, down=True)
                     for i in range(1, len(channels))]
            self.total_downscale_factor = downscale_factor * 2 ** (len(channels) - 1)
        elif adapter_type == "full_adapter_xl":
            self.conv_in = Conv2d(unshuffled, channels[0], kernel_size=3, padding=1)
            body = []
            for i in range(len(channels)):
                if i == 1:
                    body.append(AdapterBlock(channels[i - 1], channels[i], num_res_blocks))
                elif i == 2:
                    body.append(AdapterBlock(channels[i - 1], channels[i], num_res_blocks, down=True))
                else:
                    body.append(AdapterBlock(channels[i], channels[i], num_res_blocks))
            self.total_downscale_factor = downscale_factor * 2
        elif adapter_type == "light_adapter":
            self.conv_in = None
            body = [LightAdapterBlock(unshuffled, channels[0], num_res_blocks)]
            body += [LightAdapterBlock(channels[i], channels[i + 1], num_res_blocks, down=True)
                     for i in range(len(channels) - 1)]
            body += [LightAdapterBlock(channels[-1], channels[-1], num_res_blocks, down=True)]
            self.total_downscale_factor = downscale_factor * (2 ** len(channels))
        else:
            raise ValueError(
                f"Unsupported adapter_type: {adapter_type!r}. Choose 'full_adapter', "
                "'full_adapter_xl' or 'light_adapter'."
            )
        self.body = ModuleList(body)

    def __call__(self, params, x: jax.Array) -> List[jax.Array]:
        """x: [B, C, H, W] control image in [0, 1] or [-1, 1] → list of NCHW
        feature maps, one per body block."""
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = _pixel_unshuffle(x, self.downscale_factor)
        if self.conv_in is not None:
            x = self.conv_in(params["conv_in"], x)
        features = []
        for i, block in enumerate(self.body):
            x = block(params["body"][i], x)
            features.append(jnp.transpose(x, (0, 3, 1, 2)))
        return features


class MultiAdapter(Module, ModelMixin):
    """Weighted sum of several adapters' feature lists (reference
    MultiAdapter, adapter.py:28,76)."""

    def __init__(self, adapters: List[T2IAdapter]):
        super().__init__()
        if len(adapters) < 1:
            raise ValueError("Expecting at least one adapter")
        if len(adapters) == 1:
            raise ValueError("For a single adapter, use T2IAdapter directly")
        tds = {a.total_downscale_factor for a in adapters}
        if len(tds) != 1:
            raise ValueError(f"adapters disagree on total_downscale_factor: {tds}")
        self.adapters = ModuleList(adapters)
        self.total_downscale_factor = adapters[0].total_downscale_factor

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.adapters))
        return {"adapters": [a.init(k, dtype=dtype) for a, k in zip(self.adapters, keys)]}

    def __call__(self, params, xs: jax.Array, adapter_weights: Optional[Sequence[float]] = None):
        """xs: [B, n_adapter * C, H, W] stacked control images (reference
        forward splits on the channel axis, adapter.py:76)."""
        n = len(self.adapters)
        if adapter_weights is None:
            adapter_weights = [1.0 / n] * n
        chunks = jnp.split(xs, n, axis=1)
        accume = None
        for x, w, adapter, p in zip(chunks, adapter_weights, self.adapters, params["adapters"]):
            features = adapter(p, x)
            if accume is None:
                accume = [w * f for f in features]
            else:
                accume = [a + w * f for a, f in zip(accume, features)]
        return accume

"""SpeechT5HifiGan vocoder — log-mel spectrogram to waveform.

Matches the transformers `SpeechT5HifiGan` checkpoint layout (conv_pre,
upsampler ConvTranspose1d stack, HiFi-GAN residual blocks convs1/convs2,
conv_post, mean/scale normalization buffers). NLC layout internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Conv1d, ConvTranspose1d, Module, ModuleList, Params


class HifiGanResidualBlock(Module):
    def __init__(self, channels: int, kernel_size: int = 3, dilation=(1, 3, 5),
                 leaky_relu_slope: float = 0.1):
        super().__init__()
        self.leaky_relu_slope = leaky_relu_slope
        self.convs1 = ModuleList([
            Conv1d(channels, channels, kernel_size, stride=1, dilation=d,
                   padding=(kernel_size * d - d) // 2)
            for d in dilation
        ])
        self.convs2 = ModuleList([
            Conv1d(channels, channels, kernel_size, stride=1, dilation=1,
                   padding=(kernel_size - 1) // 2)
            for _ in dilation
        ])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.convs1)):
            residual = x
            x = jax.nn.leaky_relu(x, self.leaky_relu_slope)
            x = self.convs1[i](params["convs1"][i], x)
            x = jax.nn.leaky_relu(x, self.leaky_relu_slope)
            x = self.convs2[i](params["convs2"][i], x)
            x = x + residual
        return x


class SpeechT5HifiGan(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        model_in_dim: int = 80,
        sampling_rate: int = 16000,
        upsample_initial_channel: int = 512,
        upsample_rates=(4, 4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8, 8),
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        leaky_relu_slope: float = 0.1,
        normalize_before: bool = True,
        **unused,
    ):
        super().__init__()
        self.num_kernels = len(resblock_kernel_sizes)
        self.num_upsamples = len(upsample_rates)
        self.conv_pre = Conv1d(model_in_dim, upsample_initial_channel, kernel_size=7, stride=1, padding=3)
        self.upsampler = ModuleList([
            ConvTranspose1d(
                upsample_initial_channel // (2**i), upsample_initial_channel // (2 ** (i + 1)),
                kernel_size=k, stride=r, padding=(k - r) // 2)
            for i, (r, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes))
        ])
        resblocks = []
        for i in range(len(upsample_rates)):
            channels = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernel_sizes, resblock_dilation_sizes):
                resblocks.append(HifiGanResidualBlock(channels, k, d, leaky_relu_slope))
        self.resblocks = ModuleList(resblocks)
        self.conv_post = Conv1d(channels, 1, kernel_size=7, stride=1, padding=3)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["mean"] = jnp.zeros((self.config.model_in_dim,), jnp.float32)
        params["scale"] = jnp.ones((self.config.model_in_dim,), jnp.float32)
        return params

    def __call__(self, params: Params, spectrogram: jax.Array) -> jax.Array:
        """spectrogram: [B, T, model_in_dim] (or unbatched [T, model_in_dim])
        -> waveform [B, samples] (or [samples])."""
        if self.config.normalize_before:
            spectrogram = (spectrogram - params["mean"]) / params["scale"]
        is_batched = spectrogram.ndim == 3
        if not is_batched:
            spectrogram = spectrogram[None]

        x = self.conv_pre(params["conv_pre"], spectrogram)  # NLC
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, self.config.leaky_relu_slope)
            x = self.upsampler[i](params["upsampler"][i], x)
            res = self.resblocks[i * self.num_kernels](params["resblocks"][i * self.num_kernels], x)
            for j in range(1, self.num_kernels):
                res = res + self.resblocks[i * self.num_kernels + j](
                    params["resblocks"][i * self.num_kernels + j], x)
            x = res / self.num_kernels
        x = jax.nn.leaky_relu(x, 0.01)
        x = self.conv_post(params["conv_post"], x)
        x = jnp.tanh(x)[..., 0]  # [B, samples]
        if not is_batched:
            x = x[0]
        return x

    # transformers layout: model.safetensors + config.json
    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None,
                        variant=None, quantization_config=None, **kwargs):
        import json
        import os

        from safetensors import safe_open

        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full_config = json.load(f)
        model = cls(**{k: v for k, v in full_config.items() if not k.startswith("_")})

        weights_file = "model.safetensors" if variant is None else f"model.{variant}.safetensors"
        state = {}
        with safe_open(os.path.join(model_path, weights_file), framework="numpy") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
        from ...models.modeling_utils import convert_torch_state_dict

        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        return model, maybe_quantize(params, quantization_config)

    def save_pretrained(self, save_directory, params, **kwargs):
        from ...models.text_encoders.clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)

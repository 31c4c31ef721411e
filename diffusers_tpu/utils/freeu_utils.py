"""FreeU (arXiv:2309.11497): backbone amplification + skip-feature Fourier
attenuation in the UNet's two highest-level up blocks.

Counterpart of the reference `utils/torch_utils.py:249-309`
(fourier_filter/apply_freeu). Activations here are NHWC, so the channel split
is on the last axis and the FFT runs over axes (1, 2)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Low-frequency rescale in the 2D Fourier domain. x: [B, H, W, C]."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    x_freq = jnp.fft.fftn(x, axes=(1, 2))
    x_freq = jnp.fft.fftshift(x_freq, axes=(1, 2))

    crow, ccol = h // 2, w // 2
    mask = jnp.ones((1, h, w, 1), dtype=jnp.float32)
    mask = mask.at[:, crow - threshold : crow + threshold, ccol - threshold : ccol + threshold, :].set(scale)
    x_freq = x_freq * mask

    x_freq = jnp.fft.ifftshift(x_freq, axes=(1, 2))
    x_filtered = jnp.fft.ifftn(x_freq, axes=(1, 2)).real
    return x_filtered.astype(orig_dtype)


def apply_freeu(
    resolution_idx: int,
    hidden_states: jnp.ndarray,
    res_hidden_states: jnp.ndarray,
    freeu: Dict[str, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference apply_freeu (torch_utils.py:285) in NHWC: scale the first
    half of backbone channels by b1/b2, Fourier-attenuate the skip by s1/s2."""
    if resolution_idx == 0:
        half = hidden_states.shape[-1] // 2
        hidden_states = jnp.concatenate(
            [hidden_states[..., :half] * freeu["b1"], hidden_states[..., half:]], axis=-1
        )
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1, scale=freeu["s1"])
    if resolution_idx == 1:
        half = hidden_states.shape[-1] // 2
        hidden_states = jnp.concatenate(
            [hidden_states[..., :half] * freeu["b2"], hidden_states[..., half:]], axis=-1
        )
        res_hidden_states = fourier_filter(res_hidden_states, threshold=1, scale=freeu["s2"])
    return hidden_states, res_hidden_states

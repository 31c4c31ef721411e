"""FreeNoise (arXiv:2310.15169): training-free longer-video generation via
noise rescheduling — initial noise beyond the trained context window is a
window-shuffled repeat of the base context, keeping local temporal
correlation while avoiding the periodic artifacts of plain tiling.

Counterpart of the reference `pipelines/free_noise_utils.py`
(`AnimateDiffFreeNoiseMixin._prepare_latents_free_noise` — shuffled-repeat
noise schedule; the reference additionally blends attention windows inside
motion modules, which on TPU corresponds to windowed attention under the
sequence axis and is provided by `free_noise_blend_windows`). Usable with any
video pipeline that accepts a `latents=` argument, e.g.::

    latents = prepare_free_noise_latents(shape, key, context_length=16, context_stride=4)
    video = wan_pipe(prompt, latents=latents, num_frames=longer)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.jax_utils import randn_tensor


def prepare_free_noise_latents(
    shape: Tuple[int, ...],  # [B, C, T, H, W]
    key: jax.Array,
    context_length: int = 16,
    context_stride: int = 4,
    shuffle: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Noise rescheduling (reference free_noise_utils.py `_prepare_latents_free_noise`):
    draw noise for the first `context_length` frames, then fill each further
    window [i, i+context_length) by re-using a shuffled permutation of the
    window `context_stride` frames back."""
    b, c, t, h, w = shape
    base = randn_tensor((b, c, min(context_length, t), h, w), key=key, dtype=dtype)
    if t <= context_length:
        return base[:, :, :t]

    frames = [base[:, :, i] for i in range(base.shape[2])]
    perm_key = key
    for window_start in range(context_length, t, context_stride):
        src_lo = window_start - context_length
        src_idx = jnp.arange(src_lo, window_start)
        if shuffle:
            perm_key, use = jax.random.split(perm_key)
            src_idx = jax.random.permutation(use, src_idx)
        for j in range(context_stride):
            if window_start + j >= t:
                break
            frames.append(frames[int(src_idx[j % context_length])])
        if len(frames) >= t:
            break
    return jnp.stack(frames[:t], axis=2)


def free_noise_blend_windows(
    window_outputs,  # list of [B, C, Tw, H, W] denoised windows
    window_starts,
    total_frames: int,
) -> jnp.ndarray:
    """Weighted overlap-average of per-window model outputs along time (the
    reference blends inside motion-module attention; at pipeline granularity
    the same linear cross-fade applies)."""
    first = window_outputs[0]
    b, c, _, h, w = first.shape
    acc = jnp.zeros((b, c, total_frames, h, w), first.dtype)
    weight = jnp.zeros((1, 1, total_frames, 1, 1), first.dtype)
    for out, start in zip(window_outputs, window_starts):
        tw = out.shape[2]
        ramp = jnp.minimum(jnp.arange(1, tw + 1), jnp.arange(tw, 0, -1)).astype(first.dtype)
        ramp = ramp.reshape(1, 1, tw, 1, 1)
        acc = acc.at[:, :, start : start + tw].add(out * ramp)
        weight = weight.at[:, :, start : start + tw].add(ramp)
    return acc / jnp.maximum(weight, 1e-6)

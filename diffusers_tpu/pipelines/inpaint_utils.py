"""Shared inpaint mask preparation helpers.

Mirrors the reference's `prepare_mask_latents` stages (e.g.
`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_inpaint.py:686-757`:
`interpolate(mask, size=(lh, lw))` → channel repeat → `_pack_latents`), shared
by the Flux and QwenImage inpaint pipelines (ADVICE r3: de-duplicate + replace
the strided downsample that crashed for masks smaller than the latent grid).
"""

from __future__ import annotations

import jax
import numpy as np


def as_mask_array(mask_image) -> np.ndarray:
    """mask (PIL | np [H,W] | [1,H,W] | [B,1,H,W]) → binary float32 NCHW."""
    try:  # PIL path
        from PIL import Image

        if isinstance(mask_image, Image.Image):
            mask_image = np.asarray(mask_image.convert("L"), dtype=np.float32) / 255.0
    except ImportError:
        pass
    mask = np.asarray(mask_image, dtype=np.float32)
    if mask.ndim == 2:
        mask = mask[None, None]
    elif mask.ndim == 3:
        mask = mask[None]
    return (mask > 0.5).astype(np.float32)


def resize_mask_nearest(mask: np.ndarray, lh: int, lw: int) -> np.ndarray:
    """Nearest-neighbor resize of an NCHW mask to exactly (lh, lw) — up OR
    down, any ratio (torch `interpolate(..., mode="nearest")` index rule)."""
    h, w = mask.shape[2], mask.shape[3]
    rows = (np.arange(lh) * h // lh).astype(np.intp)
    cols = (np.arange(lw) * w // lw).astype(np.intp)
    return mask[:, :, rows][:, :, :, cols]


def repeat_to_batch(x, batch_size: int, what: str = "input"):
    """Tile a leading batch dim up to `batch_size`, raising (like the
    reference's check_inputs) instead of silently producing a wrong batch
    when the sizes don't divide."""
    if x.shape[0] == batch_size:
        return x
    if batch_size % x.shape[0] != 0:
        raise ValueError(
            f"cannot duplicate {what} of batch size {x.shape[0]} to effective batch size "
            f"{batch_size}: not a multiple. Pass a matching number of {what}s."
        )
    reps = batch_size // x.shape[0]
    if isinstance(x, np.ndarray):
        return np.repeat(x, reps, axis=0)
    import jax.numpy as jnp

    return jnp.repeat(x, reps, axis=0)


def prepare_packed_mask(mask: np.ndarray, batch_size: int, num_channels_latents: int,
                        lh: int, lw: int, pack_fn) -> jax.Array:
    """Pixel mask → latent-res nearest resize → channel repeat → `pack_fn`."""
    import jax.numpy as jnp

    m = resize_mask_nearest(mask, lh, lw)
    m = np.repeat(m, num_channels_latents, axis=1)
    m = repeat_to_batch(m, batch_size, what="mask")
    return pack_fn(jnp.asarray(m))


def check_strength_and_schedule(strength: float, timesteps) -> None:
    """Validate `strength` in [0, 1] (reference check_inputs) and that the
    truncated schedule is non-empty (strength≈0 otherwise crashes deep inside
    scale_noise with an empty timestep array)."""
    if strength < 0 or strength > 1:
        raise ValueError(f"strength must be in [0, 1], got {strength}")
    if timesteps.shape[0] == 0:
        raise ValueError(
            f"strength={strength} with this step count leaves zero denoise steps; "
            "increase strength or num_inference_steps."
        )

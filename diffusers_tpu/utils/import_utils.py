"""Feature probes for optional dependencies, mirroring the reference's
`utils/import_utils.py` surface (is_*_available) for the TPU stack."""

from __future__ import annotations

import importlib.util
from functools import lru_cache


@lru_cache()
def _is_package_available(pkg_name: str) -> bool:
    return importlib.util.find_spec(pkg_name) is not None


def is_jax_available() -> bool:
    return _is_package_available("jax")


def is_flax_available() -> bool:
    return _is_package_available("flax")


def is_torch_available() -> bool:
    return _is_package_available("torch")


def is_transformers_available() -> bool:
    return _is_package_available("transformers")


def is_safetensors_available() -> bool:
    return _is_package_available("safetensors")


def is_huggingface_hub_available() -> bool:
    return _is_package_available("huggingface_hub")


def is_pil_available() -> bool:
    return _is_package_available("PIL")


def is_opencv_available() -> bool:
    return _is_package_available("cv2")


def is_imageio_available() -> bool:
    return _is_package_available("imageio")


def is_av_available() -> bool:
    return _is_package_available("av")


def is_scipy_available() -> bool:
    return _is_package_available("scipy")


def is_sentencepiece_available() -> bool:
    return _is_package_available("sentencepiece")


def is_ftfy_available() -> bool:
    return _is_package_available("ftfy")


@lru_cache()
def is_tpu_available() -> bool:
    """True if a real TPU backend is attached."""
    try:
        import jax

        return any(d.platform.startswith(("tpu", "axon")) for d in jax.devices())
    except Exception:
        return False

from . import logging
from .import_utils import (
    is_av_available,
    is_flax_available,
    is_huggingface_hub_available,
    is_imageio_available,
    is_jax_available,
    is_opencv_available,
    is_pil_available,
    is_safetensors_available,
    is_scipy_available,
    is_torch_available,
    is_tpu_available,
    is_transformers_available,
)
from .jax_utils import randn_tensor, resolve_dtype, to_jax
from .outputs import BaseOutput

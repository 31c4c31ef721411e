"""diffusers_tpu — a TPU-native diffusion framework (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capability surface of huggingface/diffusers
(reference mounted at /root/reference), re-architected for TPU: pure-functional
models over parameter pytrees, schedulers as scan-able state machines, fused
denoise loops under a single jit, and GSPMD sharding for multi-chip scale.
"""

__version__ = "0.1.0"

from .configuration_utils import ConfigMixin, FrozenDict, register_to_config
from .utils import BaseOutput, logging

"""Environment-flag constants layer.

Mirror of the reference's `utils/constants.py:29-56` (file names, env-var
config knobs), adapted to this framework's TPU runtime. Env flags are read
once at import; tests may reload the module after monkeypatching `os.environ`.
"""

from __future__ import annotations

import os

ENV_VARS_TRUE_VALUES = {"1", "ON", "YES", "TRUE"}


def _flag(name: str, default: str = "0") -> bool:
    return os.getenv(name, default).upper() in ENV_VARS_TRUE_VALUES


# --- serialization file names (byte-identical to the reference so checkpoints
# interoperate, `utils/constants.py:29-38`) ---
CONFIG_NAME = "config.json"
WEIGHTS_NAME = "diffusion_pytorch_model.bin"
SAFETENSORS_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
SAFE_WEIGHTS_INDEX_NAME = "diffusion_pytorch_model.safetensors.index.json"
SAFETENSORS_FILE_EXTENSION = "safetensors"
GGUF_FILE_EXTENSION = "gguf"
DEPRECATED_REVISION_ARGS = ["fp16", "non-ema"]

HUGGINGFACE_CO_RESOLVE_ENDPOINT = os.environ.get("HF_ENDPOINT", "https://huggingface.co")
DIFFUSERS_REQUEST_TIMEOUT = int(os.environ.get("DIFFUSERS_TPU_REQUEST_TIMEOUT", "60"))
DIFFUSERS_DYNAMIC_MODULE_NAME = "diffusers_tpu_modules"

# --- runtime knobs (reference `utils/constants.py:43-56`) ---
# Default attention backend: "native" | "pallas_flash" | "ring" | "ulysses"
# | "" (automatic shape-based selection, the default).
DIFFUSERS_TPU_ATTN_BACKEND = os.getenv("DIFFUSERS_TPU_ATTN_BACKEND", "") or None
# Validate q/k/v shapes+dtypes on every dispatch (debug aid; off by default).
DIFFUSERS_TPU_ATTN_CHECKS = _flag("DIFFUSERS_TPU_ATTN_CHECKS")
# Globally refuse to import custom pipeline/block code from model repos
# (enforced at call time in utils/dynamic_modules_utils._check_trust).
DIFFUSERS_TPU_DISABLE_REMOTE_CODE = _flag("DIFFUSERS_TPU_DISABLE_REMOTE_CODE")
# Thread-pool width for parallel safetensors shard loading (<=1 = serial;
# consumed by models.modeling_utils.stream_load_params).
DIFFUSERS_TPU_PARALLEL_LOADING_WORKERS = int(
    os.environ.get("DIFFUSERS_TPU_PARALLEL_LOADING_WORKERS", "8")
)
# Opt-in Pallas GroupNorm+SiLU kernel in resnet blocks. OFF by default:
# measured on-chip (r3, v5e) the lone pallas_call REGRESSES the SDXL UNet
# forward 122.6 -> 138.4 ms because it breaks XLA's GN<->conv fusions; kept
# for workloads where GN stands alone (consumed by models.resnet._fused_gn_silu).
DIFFUSERS_TPU_FUSED_GN = _flag("DIFFUSERS_TPU_FUSED_GN")

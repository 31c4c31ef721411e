"""Quantization configs.

TPU-native counterpart of the reference quantizer stack
(`/root/reference/src/diffusers/quantizers/base.py:34` DiffusersQuantizer ABC +
bnb/gguf/torchao backends). On TPU the useful regimes are weight-only int8
(per-output-channel symmetric) and fp8-e4m3 — both halve (or quarter) HBM
weight traffic and dequantize for free inside the matmul fusion; there is no
CUDA-kernel dependency to bind to.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class QuantizationConfig:
    """Base: which modules to convert."""

    modules_to_not_convert: List[str] = field(default_factory=list)
    min_weight_size: int = 4096  # skip tiny layers (norm-adjacent projections)

    quant_method = "none"


@dataclass
class Int8WeightOnlyConfig(QuantizationConfig):
    """Per-output-channel symmetric int8 weights, bf16 activations."""

    quant_method = "int8_weight_only"


@dataclass
class Fp8WeightOnlyConfig(QuantizationConfig):
    """fp8-e4m3 weights with per-channel scale, bf16 compute (the TPU-native
    analogue of the reference's enable_layerwise_casting fp8 storage,
    `models/modeling_utils.py:439`)."""

    quant_method = "fp8_weight_only"


@dataclass
class Int4WeightOnlyConfig(QuantizationConfig):
    """Group-wise symmetric int4 weights (native XLA s4 storage: 2 packed per
    byte in HBM), bf16 compute — the dequant (convert + per-group scale
    multiply) fuses into the consuming matmul. TPU-native analogue of the
    reference's bnb-NF4 (`quantizers/bitsandbytes/bnb_quantizer.py`) and GGUF
    Q4 dequant-on-the-fly (`quantizers/gguf/utils.py`): quarters weight HBM
    (Flux 11.9B: ~24 GB bf16 → ~6 GB), which is what fits >=24 GB models on a
    16 GB v5e.

    ``group_size`` is the input-dimension block that shares one scale
    (per-[group, out_channel]); kernels whose input dim doesn't divide it fall
    back to one group spanning the whole input dim."""

    quant_method = "int4_weight_only"
    group_size: int = 128


@dataclass
class Int8DynamicActConfig(QuantizationConfig):
    """w8a8: int8 weights + dynamic per-row int8 activation quantization,
    computed on the MXU's int8 path (2× bf16 peak) via the fused Pallas kernel
    (ops/pallas/quantized_matmul.py). TPU-native analogue of torchao's
    int8_dynamic_activation_int8_weight backend
    (`/root/reference/src/diffusers/quantizers/torchao/`).

    ``impl`` selects the Linear compute path: "pallas" (default) uses the
    fused per-row Pallas kernel; "xla" uses a per-tensor-scale XLA-native
    int8 dot whose quant/dequant fuse into neighbors — measured (v5e, round
    3) the better choice inside conv/attention-heavy graphs where the Pallas
    call boundary blocks fusion, though neither wins end-to-end on SDXL
    (composed int8 ~195 ms vs bf16 123 ms; isolated big matmuls do win 1.2-1.7x)."""

    quant_method = "int8_dynamic_activation"
    impl: str = "pallas"

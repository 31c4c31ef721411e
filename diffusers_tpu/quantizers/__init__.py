from .quantization_config import Int8WeightOnlyConfig, Fp8WeightOnlyConfig, QuantizationConfig
from .quantize import dequantize_params, quantize_params

from .quantization_config import Int8WeightOnlyConfig, Int8DynamicActConfig, Fp8WeightOnlyConfig, QuantizationConfig
from .quantize import dequantize_params, quantize_params

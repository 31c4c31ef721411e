from .auto import PipelineQuantizationConfig, resolve_quantization_config
from .gguf import load_gguf_checkpoint, save_gguf
from .quantization_config import Int8WeightOnlyConfig, Int8DynamicActConfig, Fp8WeightOnlyConfig, QuantizationConfig
from .quantize import dequantize_params, maybe_quantize, quantize_params

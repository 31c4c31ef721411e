from .connectors import LTX2TextConnectors
from .pipeline_ltx2 import LTX2Pipeline, LTX2PipelineOutput
from .vocoder import LTX2Vocoder, LTX2VocoderWithBWE

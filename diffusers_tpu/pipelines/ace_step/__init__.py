from .modeling_ace_step import (
    AceStepAudioTokenDetokenizer,
    AceStepAudioTokenizer,
    AceStepConditionEncoder,
    AceStepLyricEncoder,
    AceStepTimbreEncoder,
)
from .pipeline_ace_step import AceStepPipeline

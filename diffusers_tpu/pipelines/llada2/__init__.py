from .pipeline_llada2 import LLaDA2Denoiser, LLaDA2Pipeline, LLaDA2PipelineOutput

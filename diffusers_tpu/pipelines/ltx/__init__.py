from .pipeline_ltx import LTXPipeline

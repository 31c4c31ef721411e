from .pipeline_kandinsky3 import Kandinsky3Pipeline, Kandinsky3PipelineOutput

__all__ = ["Kandinsky3Pipeline", "Kandinsky3PipelineOutput"]

from .pipeline_helios import HeliosPipeline, HeliosPipelineOutput

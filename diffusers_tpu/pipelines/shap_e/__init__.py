from .camera import create_pan_cameras
from .pipeline_shap_e import ShapEPipeline, ShapEPipelineOutput
from .renderer import MLPNeRSTFModel, ShapEParamsProjModel, ShapERenderer

from .pipeline_flux import FluxPipeline, FluxPipelineOutput
from .pipeline_flux_img2img import FluxImg2ImgPipeline
from .pipeline_flux_fill import FluxFillPipeline
from .pipeline_flux_inpaint import FluxInpaintPipeline
from .pipeline_flux_kontext import FluxKontextPipeline
from .pipeline_flux_controlnet import FluxControlNetPipeline
from .pipeline_flux_prior_redux import FluxPriorReduxPipeline, FluxPriorReduxPipelineOutput
from .modeling_flux import ReduxImageEncoder
from .pipeline_flux_control import (
    FluxControlImg2ImgPipeline,
    FluxControlInpaintPipeline,
    FluxControlPipeline,
)
from .pipeline_flux_controlnet_image_to_image import FluxControlNetImg2ImgPipeline
from .pipeline_flux_controlnet_inpainting import FluxControlNetInpaintPipeline
from .pipeline_flux_kontext_inpaint import FluxKontextInpaintPipeline

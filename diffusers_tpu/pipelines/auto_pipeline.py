"""AutoPipeline: task-oriented pipeline class resolution.

Mirror of the reference `pipelines/auto_pipeline.py:371`
(AutoPipelineForText2Image / Image2Image / Inpainting): reads
`model_index.json`'s `_class_name`, normalizes it to a model family, and
dispatches to the TPU-native pipeline class for the requested task."""

from __future__ import annotations

import json
import os
from collections import OrderedDict

from ..utils.hub_utils import snapshot_download_repo

_SD = "diffusers_tpu.pipelines.stable_diffusion."
_SDXL = "diffusers_tpu.pipelines.stable_diffusion_xl."

AUTO_TEXT2IMAGE_PIPELINES_MAPPING = OrderedDict(
    [
        ("stable-diffusion", _SD + "pipeline_stable_diffusion.StableDiffusionPipeline"),
        ("stable-diffusion-xl", _SDXL + "pipeline_stable_diffusion_xl.StableDiffusionXLPipeline"),
        ("stable-diffusion-3", "diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3.StableDiffusion3Pipeline"),
        ("flux", "diffusers_tpu.pipelines.flux.pipeline_flux.FluxPipeline"),
        ("kandinsky5", "diffusers_tpu.pipelines.kandinsky5.pipeline_kandinsky5_t2i.Kandinsky5T2IPipeline"),
        ("ddpm", "diffusers_tpu.pipelines.ddpm.pipeline_ddpm.DDPMPipeline"),
        ("controlnet", "diffusers_tpu.pipelines.controlnet.pipeline_controlnet.StableDiffusionControlNetPipeline"),
    ]
)

AUTO_IMAGE2IMAGE_PIPELINES_MAPPING = OrderedDict(
    [
        ("stable-diffusion", _SD + "pipeline_stable_diffusion_img2img.StableDiffusionImg2ImgPipeline"),
        ("stable-diffusion-pix2pix", _SD + "pipeline_stable_diffusion_instruct_pix2pix.StableDiffusionInstructPix2PixPipeline"),
        ("stable-diffusion-xl", _SDXL + "pipeline_stable_diffusion_xl_img2img.StableDiffusionXLImg2ImgPipeline"),
    ]
)

AUTO_INPAINT_PIPELINES_MAPPING = OrderedDict(
    [
        ("stable-diffusion", _SD + "pipeline_stable_diffusion_inpaint.StableDiffusionInpaintPipeline"),
        ("stable-diffusion-xl", _SDXL + "pipeline_stable_diffusion_xl_inpaint.StableDiffusionXLInpaintPipeline"),
    ]
)

# _class_name → model family (any task variant of a family normalizes to it,
# like the reference's _get_task_class name surgery)
_FAMILY_OF = {
    "StableDiffusionPipeline": "stable-diffusion",
    "StableDiffusionImg2ImgPipeline": "stable-diffusion",
    "StableDiffusionInstructPix2PixPipeline": "stable-diffusion-pix2pix",
    "StableDiffusionAdapterPipeline": "stable-diffusion",
    "StableDiffusionInpaintPipeline": "stable-diffusion",
    "StableDiffusionXLPipeline": "stable-diffusion-xl",
    "StableDiffusionXLImg2ImgPipeline": "stable-diffusion-xl",
    "StableDiffusionXLInpaintPipeline": "stable-diffusion-xl",
    "StableDiffusion3Pipeline": "stable-diffusion-3",
    "FluxPipeline": "flux",
    "FluxImg2ImgPipeline": "flux",
    "DDPMPipeline": "ddpm",
    "StableDiffusionControlNetPipeline": "controlnet",
    "StableDiffusionPAGPipeline": "stable-diffusion",
    "LatentConsistencyModelPipeline": "stable-diffusion",
    "Kandinsky5T2IPipeline": "kandinsky5",
}


def _import_class(path: str):
    import importlib

    module_name, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), cls_name)


class _AutoPipelineBase:
    _task_mapping: OrderedDict = AUTO_TEXT2IMAGE_PIPELINES_MAPPING

    def __init__(self, *args, **kwargs):
        raise EnvironmentError(
            f"{self.__class__.__name__} is designed to be instantiated via `from_pretrained(...)`."
        )

    @classmethod
    def from_pretrained(cls, pretrained_model_or_path, **kwargs):
        root = str(pretrained_model_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **{k: v for k, v in kwargs.items() if k in ("revision", "cache_dir")})
        with open(os.path.join(root, "model_index.json")) as f:
            config = json.load(f)
        class_name = config["_class_name"]
        family = _FAMILY_OF.get(class_name)
        if family is None or family not in cls._task_mapping:
            raise ValueError(
                f"{cls.__name__} can't resolve {class_name!r}; known families: {list(cls._task_mapping)}"
            )
        pipeline_cls = _import_class(cls._task_mapping[family])
        return pipeline_cls.from_pretrained(root, **kwargs)


class AutoPipelineForText2Image(_AutoPipelineBase):
    _task_mapping = AUTO_TEXT2IMAGE_PIPELINES_MAPPING


class AutoPipelineForImage2Image(_AutoPipelineBase):
    _task_mapping = AUTO_IMAGE2IMAGE_PIPELINES_MAPPING


class AutoPipelineForInpainting(_AutoPipelineBase):
    _task_mapping = AUTO_INPAINT_PIPELINES_MAPPING

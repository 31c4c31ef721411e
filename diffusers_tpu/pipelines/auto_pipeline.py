"""AutoPipeline: task-oriented pipeline class resolution.

Mirror of the reference `pipelines/auto_pipeline.py:371`
(AutoPipelineForText2Image etc.): reads `model_index.json`'s `_class_name`
and dispatches to the matching TPU-native pipeline class.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

from ..utils.hub_utils import snapshot_download_repo

AUTO_TEXT2IMAGE_PIPELINES_MAPPING = OrderedDict(
    [
        ("stable-diffusion", "diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion.StableDiffusionPipeline"),
        ("stable-diffusion-xl", "diffusers_tpu.pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl.StableDiffusionXLPipeline"),
        ("flux", "diffusers_tpu.pipelines.flux.pipeline_flux.FluxPipeline"),
        ("ddpm", "diffusers_tpu.pipelines.ddpm.pipeline_ddpm.DDPMPipeline"),
    ]
)

_CLASS_NAME_TO_IMPL = {
    "StableDiffusionPipeline": AUTO_TEXT2IMAGE_PIPELINES_MAPPING["stable-diffusion"],
    "StableDiffusionXLPipeline": AUTO_TEXT2IMAGE_PIPELINES_MAPPING["stable-diffusion-xl"],
    "FluxPipeline": AUTO_TEXT2IMAGE_PIPELINES_MAPPING["flux"],
    "DDPMPipeline": AUTO_TEXT2IMAGE_PIPELINES_MAPPING["ddpm"],
}


def _import_class(path: str):
    import importlib

    module_name, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), cls_name)


class AutoPipelineForText2Image:
    """`from_pretrained` resolves the pipeline class from model_index.json."""

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
        if class_name not in _CLASS_NAME_TO_IMPL:
            raise ValueError(
                f"AutoPipelineForText2Image can't resolve {class_name!r}; known: {list(_CLASS_NAME_TO_IMPL)}"
            )
        pipeline_cls = _import_class(_CLASS_NAME_TO_IMPL[class_name])
        return pipeline_cls.from_pretrained(root, **kwargs)


class AutoPipelineForImage2Image(AutoPipelineForText2Image):
    """Image2Image resolution (img2img pipeline variants land in round 2;
    currently resolves the same families)."""

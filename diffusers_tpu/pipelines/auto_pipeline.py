"""AutoPipeline: task-oriented pipeline class resolution.

Mirror of the reference `pipelines/auto_pipeline.py:146-293,371`
(AutoPipelineForText2Image / Image2Image / Inpainting / Text2Audio + the
video maps): reads `model_index.json`'s `_class_name`, normalizes it to a
model family, and dispatches to the TPU-native pipeline class for the
requested task. One consolidated family table generates both directions
(class→family and family→task-class), so every family shipped in
`diffusers_tpu/pipelines/` is covered."""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from typing import Dict, Optional

from ..utils.hub_utils import snapshot_download_repo

_P = "diffusers_tpu.pipelines."

# family → task → "module.Class" (module path relative to diffusers_tpu.pipelines)
# tasks: t2i, i2i, inpaint, t2v, i2v, t2a
_FAMILIES: Dict[str, Dict[str, str]] = {
    "stable-diffusion": {
        "t2i": "stable_diffusion.pipeline_stable_diffusion.StableDiffusionPipeline",
        "i2i": "stable_diffusion.pipeline_stable_diffusion_img2img.StableDiffusionImg2ImgPipeline",
        "inpaint": "stable_diffusion.pipeline_stable_diffusion_inpaint.StableDiffusionInpaintPipeline",
    },
    "stable-diffusion-pix2pix": {
        "i2i": "stable_diffusion.pipeline_stable_diffusion_instruct_pix2pix.StableDiffusionInstructPix2PixPipeline",
    },
    "stable-diffusion-xl": {
        "t2i": "stable_diffusion_xl.pipeline_stable_diffusion_xl.StableDiffusionXLPipeline",
        "i2i": "stable_diffusion_xl.pipeline_stable_diffusion_xl_img2img.StableDiffusionXLImg2ImgPipeline",
        "inpaint": "stable_diffusion_xl.pipeline_stable_diffusion_xl_inpaint.StableDiffusionXLInpaintPipeline",
    },
    "stable-diffusion-3": {
        "t2i": "stable_diffusion_3.pipeline_stable_diffusion_3.StableDiffusion3Pipeline",
    },
    "stable-diffusion-controlnet": {
        "t2i": "controlnet.pipeline_controlnet.StableDiffusionControlNetPipeline",
        "i2i": "controlnet.pipeline_controlnet_img2img.StableDiffusionControlNetImg2ImgPipeline",
        "inpaint": "controlnet.pipeline_controlnet_inpaint.StableDiffusionControlNetInpaintPipeline",
    },
    "stable-diffusion-xl-controlnet": {
        "t2i": "controlnet.pipeline_controlnet_sd_xl.StableDiffusionXLControlNetPipeline",
    },
    "stable-diffusion-xl-controlnet-union": {
        "t2i": "controlnet.pipeline_controlnet_union_sd_xl.StableDiffusionXLControlNetUnionPipeline",
    },
    "stable-diffusion-xl-pag": {"t2i": "pag.pipeline_pag_sd_xl.StableDiffusionXLPAGPipeline"},
    "stable-diffusion-3-pag": {"t2i": "pag.pipeline_pag_sd_3.StableDiffusion3PAGPipeline"},
    "stable-diffusion-xl-pix2pix": {
        "i2i": "stable_diffusion_xl.pipeline_stable_diffusion_xl_instruct_pix2pix.StableDiffusionXLInstructPix2PixPipeline",
    },
    "stable-diffusion-3-controlnet": {
        "t2i": "controlnet_sd3.pipeline_stable_diffusion_3_controlnet.StableDiffusion3ControlNetPipeline",
    },
    "hunyuan-controlnet": {
        "t2i": "controlnet_hunyuandit.pipeline_hunyuandit_controlnet.HunyuanDiTControlNetPipeline",
    },
    "stable-diffusion-pag": {"t2i": "pag.pipeline_pag_sd.StableDiffusionPAGPipeline"},
    "stable-diffusion-adapter": {"t2i": "t2i_adapter.pipeline_stable_diffusion_adapter.StableDiffusionAdapterPipeline"},
    "lcm": {"t2i": "latent_consistency_models.pipeline_latent_consistency_text2img.LatentConsistencyModelPipeline"},
    "tcd": {"t2i": "tcd.pipeline_tcd.TCDPipeline"},
    "flux": {
        "t2i": "flux.pipeline_flux.FluxPipeline",
        "i2i": "flux.pipeline_flux_img2img.FluxImg2ImgPipeline",
        "inpaint": "flux.pipeline_flux_inpaint.FluxInpaintPipeline",
    },
    "flux-controlnet": {"t2i": "flux.pipeline_flux_controlnet.FluxControlNetPipeline"},
    "flux-fill": {"inpaint": "flux.pipeline_flux_fill.FluxFillPipeline"},
    "flux-kontext": {"t2i": "flux.pipeline_flux_kontext.FluxKontextPipeline",
                     "i2i": "flux.pipeline_flux_kontext.FluxKontextPipeline"},
    "flux2": {"t2i": "flux2.pipeline_flux2.Flux2Pipeline", "i2i": "flux2.pipeline_flux2.Flux2Pipeline"},
    "qwenimage": {
        "t2i": "qwenimage.pipeline_qwenimage.QwenImagePipeline",
        "i2i": "qwenimage.pipeline_qwenimage_img2img.QwenImageImg2ImgPipeline",
        "inpaint": "qwenimage.pipeline_qwenimage_inpaint.QwenImageInpaintPipeline",
    },
    "if": {"t2i": "deepfloyd_if.pipeline_if.IFPipeline"},
    "hunyuan": {"t2i": "hunyuandit.pipeline_hunyuandit.HunyuanDiTPipeline"},
    "hunyuan-image": {"t2i": "hunyuan_image.pipeline_hunyuanimage.HunyuanImagePipeline"},
    "kandinsky": {"t2i": "kandinsky.pipeline_kandinsky.KandinskyPipeline"},
    "kandinsky22": {"t2i": "kandinsky2_2.pipeline_kandinsky2_2.KandinskyV22Pipeline"},
    "kandinsky3": {"t2i": "kandinsky3.pipeline_kandinsky3.Kandinsky3Pipeline"},
    "kandinsky5": {"t2i": "kandinsky5.pipeline_kandinsky5_t2i.Kandinsky5T2IPipeline",
                   "t2v": "kandinsky5.pipeline_kandinsky5.Kandinsky5T2VPipeline"},
    "kolors": {"t2i": "kolors.pipeline_kolors.KolorsPipeline"},
    "cascade": {"t2i": "stable_cascade.pipeline_stable_cascade_prior.StableCascadePriorPipeline"},
    "pixart-alpha": {"t2i": "pixart_alpha.pipeline_pixart_alpha.PixArtAlphaPipeline"},
    "pixart-sigma": {"t2i": "pixart_alpha.pipeline_pixart_alpha.PixArtSigmaPipeline"},
    "sana": {"t2i": "sana.pipeline_sana.SanaPipeline"},
    "sana-video": {"t2v": "sana_video.pipeline_sana_video.SanaVideoPipeline"},
    "auraflow": {"t2i": "aura_flow.pipeline_aura_flow.AuraFlowPipeline"},
    "lumina": {"t2i": "lumina.pipeline_lumina.LuminaPipeline"},
    "lumina2": {"t2i": "lumina2.pipeline_lumina2.Lumina2Pipeline"},
    "chroma": {"t2i": "chroma.pipeline_chroma.ChromaPipeline"},
    "cogview3": {"t2i": "cogview3.pipeline_cogview3plus.CogView3PlusPipeline"},
    "cogview4": {"t2i": "cogview4.pipeline_cogview4.CogView4Pipeline"},
    "glm_image": {"t2i": "glm_image.pipeline_glm_image.GlmImagePipeline"},
    "helios": {"t2i": "helios.pipeline_helios.HeliosPipeline"},
    "helios-pyramid": {"t2i": "helios.pipeline_helios_pyramid.HeliosPyramidPipeline"},
    "ideogram4": {"t2i": "ideogram4.pipeline_ideogram4.Ideogram4Pipeline"},
    "krea2": {"t2i": "krea2.pipeline_krea2.Krea2Pipeline"},
    "bria": {"t2i": "bria.pipeline_bria.BriaPipeline"},
    "bria-fibo": {"t2i": "bria_fibo.pipeline_bria_fibo.BriaFiboPipeline"},
    "hidream": {"t2i": "hidream_image.pipeline_hidream_image.HiDreamImagePipeline"},
    "omnigen": {"t2i": "omnigen.pipeline_omnigen.OmniGenPipeline"},
    "prx": {"t2i": "prx.pipeline_prx.PRXPipeline"},
    "z-image": {"t2i": "z_image.pipeline_z_image.ZImagePipeline"},
    "longcat-image": {"t2i": "longcat_image.pipeline_longcat_image.LongCatImagePipeline"},
    "nucleusmoe": {"t2i": "nucleusmoe_image.pipeline_nucleusmoe_image.NucleusMoEImagePipeline"},
    "ovis": {"t2i": "ovis_image.pipeline_ovis_image.OvisImagePipeline"},
    "ernie": {"t2i": "ernie_image.pipeline_ernie_image.ErnieImagePipeline"},
    "dreamlite": {"t2i": "dreamlite.pipeline_dreamlite.DreamLitePipeline"},
    "diffusion-gemma": {"t2i": "diffusion_gemma.pipeline_diffusion_gemma.DiffusionGemmaPipeline"},
    "joyimage": {"i2i": "joyimage.pipeline_joyimage_edit.JoyImageEditPipeline"},
    "visualcloze": {"t2i": "visualcloze.pipeline_visualcloze_generation.VisualClozeGenerationPipeline"},
    "ddpm": {"t2i": "ddpm.pipeline_ddpm.DDPMPipeline"},
    "ddim": {"t2i": "ddim.pipeline_ddim.DDIMPipeline"},
    "dit": {"t2i": "dit.pipeline_dit.DiTPipeline"},
    "ldm": {"t2i": "latent_diffusion.pipeline_latent_diffusion.LDMTextToImagePipeline"},
    "consistency": {"t2i": "consistency_models.pipeline_consistency_models.ConsistencyModelPipeline"},
    # video
    "wan": {"t2v": "wan.pipeline_wan.WanPipeline", "i2v": "wan.pipeline_wan_i2v.WanImageToVideoPipeline"},
    "wan-vace": {"t2v": "wan.pipeline_wan_vace.WanVACEPipeline"},
    "ltx": {"t2v": "ltx.pipeline_ltx.LTXPipeline",
            "i2v": "ltx.pipeline_ltx_image2video.LTXImageToVideoPipeline"},
    "ltx2": {"t2v": "ltx2.pipeline_ltx2.LTX2Pipeline"},
    "hunyuan-video": {"t2v": "hunyuan_video.pipeline_hunyuan_video.HunyuanVideoPipeline"},
    "hunyuan-video15": {"t2v": "hunyuan_video1_5.pipeline_hunyuan_video1_5.HunyuanVideo15Pipeline",
                        "i2v": "hunyuan_video1_5.pipeline_hunyuan_video1_5_image2video.HunyuanVideo15ImageToVideoPipeline"},
    "cogvideox": {"t2v": "cogvideo.pipeline_cogvideox.CogVideoXPipeline"},
    "mochi": {"t2v": "mochi.pipeline_mochi.MochiPipeline"},
    "allegro": {"t2v": "allegro.pipeline_allegro.AllegroPipeline"},
    "latte": {"t2v": "latte.pipeline_latte.LattePipeline"},
    "easyanimate": {"t2v": "easyanimate.pipeline_easyanimate.EasyAnimatePipeline"},
    "skyreels-v2": {"t2v": "skyreels_v2.pipeline_skyreels_v2.SkyReelsV2Pipeline"},
    "animatediff": {"t2v": "animatediff.pipeline_animatediff.AnimateDiffPipeline"},
    "anyflow": {"t2v": "anyflow.pipeline_anyflow.AnyFlowPipeline"},
    "cosmos": {"t2v": "cosmos.pipeline_cosmos_text2world.CosmosTextToWorldPipeline"},
    "consisid": {"i2v": "consisid.pipeline_consisid.ConsisIDPipeline"},
    "svd": {"i2v": "stable_video_diffusion.pipeline_stable_video_diffusion.StableVideoDiffusionPipeline"},
    "chronoedit": {"i2v": "chronoedit.pipeline_chronoedit.ChronoEditPipeline"},
    "lucy": {"t2v": "lucy.pipeline_lucy_edit.LucyEditPipeline"},
    "motif-video": {"t2v": "motif_video.pipeline_motif_video.MotifVideoPipeline"},
    "helios-video": {"t2v": "helios.pipeline_helios.HeliosPipeline"},
    # audio
    "audioldm2": {"t2a": "audioldm2.pipeline_audioldm2.AudioLDM2Pipeline"},
    "stable-audio": {"t2a": "stable_audio.pipeline_stable_audio.StableAudioPipeline"},
    "longcat-audio-dit": {"t2a": "longcat_audio_dit.pipeline_longcat_audio_dit.LongCatAudioDiTPipeline"},
    "ace-step": {"t2a": "ace_step.pipeline_ace_step.AceStepPipeline"},
}

# _class_name → family: derived from the table (every task variant of a
# family normalizes to it, like the reference's _get_task_class name surgery),
# plus extra variant-class aliases not in the table.
_FAMILY_OF: Dict[str, str] = {}
for _family, _tasks in _FAMILIES.items():
    for _path in _tasks.values():
        _FAMILY_OF.setdefault(_path.rsplit(".", 1)[1], _family)
_FAMILY_OF.update({
    "StableDiffusionUpscalePipeline": "stable-diffusion",
    "StableDiffusionXLControlNetImg2ImgPipeline": "stable-diffusion-xl-controlnet",
    "LatentConsistencyModelImg2ImgPipeline": "lcm",
    "Kandinsky5ImagePipeline": "kandinsky5",
    "WanVideoToVideoPipeline": "wan",
})


def _task_mapping(task: str) -> "OrderedDict[str, str]":
    return OrderedDict(
        (family, _P + tasks[task]) for family, tasks in _FAMILIES.items() if task in tasks
    )


AUTO_TEXT2IMAGE_PIPELINES_MAPPING = _task_mapping("t2i")
AUTO_IMAGE2IMAGE_PIPELINES_MAPPING = _task_mapping("i2i")
AUTO_INPAINT_PIPELINES_MAPPING = _task_mapping("inpaint")
AUTO_TEXT2VIDEO_PIPELINES_MAPPING = _task_mapping("t2v")
AUTO_IMAGE2VIDEO_PIPELINES_MAPPING = _task_mapping("i2v")
AUTO_TEXT2AUDIO_PIPELINES_MAPPING = _task_mapping("t2a")


def _import_class(path: str):
    import importlib

    module_name, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), cls_name)


class _AutoPipelineBase:
    _task_mapping: OrderedDict = AUTO_TEXT2IMAGE_PIPELINES_MAPPING
    _task_name = "text-to-image"

    def __init__(self, *args, **kwargs):
        raise EnvironmentError(
            f"{self.__class__.__name__} is designed to be instantiated via `from_pretrained(...)`."
        )

    @classmethod
    def _resolve_class(cls, class_name: str):
        family = _FAMILY_OF.get(class_name)
        if family is None or family not in cls._task_mapping:
            raise ValueError(
                f"{cls.__name__} can't map {class_name!r} to a {cls._task_name} pipeline; "
                f"known families for this task: {list(cls._task_mapping)}"
            )
        return _import_class(cls._task_mapping[family])

    @classmethod
    def from_pretrained(cls, pretrained_model_or_path, **kwargs):
        root = str(pretrained_model_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **{k: v for k, v in kwargs.items() if k in ("revision", "cache_dir")})
        with open(os.path.join(root, "model_index.json")) as f:
            config = json.load(f)
        pipeline_cls = cls._resolve_class(config["_class_name"])
        return pipeline_cls.from_pretrained(root, **kwargs)

    @classmethod
    def from_pipe(cls, pipeline, **kwargs):
        """Re-bind an existing pipeline's components into this task's class
        (reference `auto_pipeline.py` from_pipe variants)."""
        pipeline_cls = cls._resolve_class(type(pipeline).__name__)
        return pipeline_cls.from_pipe(pipeline, **kwargs)


class AutoPipelineForText2Image(_AutoPipelineBase):
    _task_mapping = AUTO_TEXT2IMAGE_PIPELINES_MAPPING
    _task_name = "text-to-image"


class AutoPipelineForImage2Image(_AutoPipelineBase):
    _task_mapping = AUTO_IMAGE2IMAGE_PIPELINES_MAPPING
    _task_name = "image-to-image"


class AutoPipelineForInpainting(_AutoPipelineBase):
    _task_mapping = AUTO_INPAINT_PIPELINES_MAPPING
    _task_name = "inpainting"


class AutoPipelineForText2Video(_AutoPipelineBase):
    _task_mapping = AUTO_TEXT2VIDEO_PIPELINES_MAPPING
    _task_name = "text-to-video"


class AutoPipelineForImage2Video(_AutoPipelineBase):
    _task_mapping = AUTO_IMAGE2VIDEO_PIPELINES_MAPPING
    _task_name = "image-to-video"


class AutoPipelineForText2Audio(_AutoPipelineBase):
    _task_mapping = AUTO_TEXT2AUDIO_PIPELINES_MAPPING
    _task_name = "text-to-audio"

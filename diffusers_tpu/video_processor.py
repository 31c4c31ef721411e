"""Video pre/post-processing (mirror of the reference `video_processor.py:25`
VideoProcessor: frame-batched application of the image processor)."""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from .image_processor import VaeImageProcessor, numpy_to_pil


class VideoProcessor(VaeImageProcessor):
    def preprocess_video(self, video, height: Optional[int] = None, width: Optional[int] = None) -> np.ndarray:
        """list of frames / [B,T,H,W,C] / [B,C,T,H,W] → normalized [B,C,T,H,W]."""
        if isinstance(video, list) and video and not isinstance(video[0], np.ndarray):
            # list of PIL frames → single video
            frames = np.stack([self.preprocess(f) for f in video], axis=2)  # [1,C,T,H,W]
            return frames
        video = np.asarray(video, dtype=np.float32)
        if video.ndim == 4:  # [T,H,W,C] single video
            video = video[None]
        if video.shape[-1] in (1, 3):  # [B,T,H,W,C] → [B,C,T,H,W]
            video = video.transpose(0, 4, 1, 2, 3)
        if self.config.do_normalize and video.min() >= 0:
            video = 2.0 * video - 1.0
        return video

    def postprocess_video(self, video, output_type: str = "np"):
        """[B,C,T,H,W] in [-1,1] → frames."""
        video = np.asarray(video)
        video = np.clip(video / 2 + 0.5, 0, 1)
        video = video.transpose(0, 2, 3, 4, 1)  # [B,T,H,W,C]
        if output_type == "np":
            return video
        if output_type == "pil":
            return [numpy_to_pil(v) for v in video]
        raise ValueError(f"unsupported output_type {output_type}")

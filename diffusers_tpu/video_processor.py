"""Video pre/post-processing.

Behavioral mirror of the reference `video_processor.py:25` (VideoProcessor):
frame-batched application of the image processor. Accepted inputs mirror the
reference's matrix — PIL frame lists, lists of videos, 4D/5D arrays in
either frames-first or channels-first layout — and everything normalizes to
the channels-first video batch `[B, C, T, H, W]` the pipelines consume.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from .image_processor import VaeImageProcessor, numpy_to_pil


def _is_pil(x) -> bool:
    try:
        import PIL.Image

        return isinstance(x, PIL.Image.Image)
    except Exception:  # pragma: no cover - PIL always present in this env
        return False


class VideoProcessor(VaeImageProcessor):
    def preprocess_video(self, video, height: Optional[int] = None, width: Optional[int] = None) -> np.ndarray:
        """Accepts (reference `preprocess_video` input matrix):
          * list of PIL frames (one video)
          * list of list of PIL frames (batch of videos)
          * 4D array `[T, H, W, C]` (or `[T, C, H, W]`) — one video
          * list of 4D arrays — batch of videos
          * 5D array `[B, T, H, W, C]` or `[B, C, T, H, W]`
        Returns normalized `[B, C, T, H, W]` float32 in [-1, 1] (when
        `do_normalize`)."""
        # PIL inputs → per-video frame stacks
        if isinstance(video, list) and video and _is_pil(video[0]):
            video = [video]
        if isinstance(video, list) and video and isinstance(video[0], list) and _is_pil(video[0][0]):
            videos = []
            for frames in video:
                videos.append(np.stack([np.asarray(self.preprocess(f, height=height, width=width))[0]
                                        for f in frames], axis=1))  # [C, T, H, W]
            return np.stack(videos, axis=0)

        if isinstance(video, list):
            video = np.stack([np.asarray(v) for v in video], axis=0)
        video = np.asarray(video, dtype=np.float32)

        if video.ndim == 4:  # one video
            video = video[None]
        if video.ndim != 5:
            raise ValueError(f"expected 4D/5D video input, got shape {video.shape}")

        if video.shape[-1] in (1, 3):  # [B, T, H, W, C] → [B, C, T, H, W]
            video = video.transpose(0, 4, 1, 2, 3)
        elif video.shape[2] in (1, 3) and video.shape[1] not in (1, 3):
            # [B, T, C, H, W] (torch frame-first convention) → [B, C, T, H, W]
            video = video.transpose(0, 2, 1, 3, 4)
        # else already [B, C, T, H, W]

        if self.config.do_normalize and video.min() >= 0:
            video = 2.0 * video - 1.0
        return video

    def postprocess_video(self, video, output_type: str = "np"):
        """`[B, C, T, H, W]` in [-1, 1] → frames (reference `postprocess_video`:
        per-batch-item delegation to the image postprocess)."""
        if output_type == "latent":
            return video
        video = np.asarray(video, dtype=np.float32)
        if self.config.do_normalize:
            video = video / 2 + 0.5
        video = np.clip(video, 0, 1)
        video = video.transpose(0, 2, 3, 4, 1)  # [B, T, H, W, C]
        if output_type == "np":
            return video
        if output_type == "pil":
            return [numpy_to_pil(v) for v in video]
        raise ValueError(f"unsupported output_type {output_type!r}; choose 'np', 'pil', or 'latent'")

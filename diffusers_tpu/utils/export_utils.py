"""Export helpers (mirror of the reference `utils/export_utils.py`):
export_to_gif / export_to_video / export_to_obj / export_to_ply."""

from __future__ import annotations

import os
import tempfile
from typing import List, Optional

import numpy as np

from . import logging
from .import_utils import is_av_available, is_imageio_available, is_opencv_available, is_pil_available

logger = logging.get_logger(__name__)


def export_to_gif(image: List, output_gif_path: Optional[str] = None, fps: int = 10) -> str:
    if output_gif_path is None:
        output_gif_path = tempfile.NamedTemporaryFile(suffix=".gif", delete=False).name
    image[0].save(
        output_gif_path,
        save_all=True,
        append_images=image[1:],
        optimize=False,
        duration=1000 // fps,
        loop=0,
    )
    return output_gif_path


def export_to_video(video_frames, output_video_path: Optional[str] = None, fps: int = 10) -> str:
    """frames: list of PIL images or [T,H,W,C] float/uint8 array → mp4."""
    if output_video_path is None:
        output_video_path = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False).name

    if isinstance(video_frames, np.ndarray):
        if video_frames.dtype != np.uint8:
            video_frames = (np.clip(video_frames, 0, 1) * 255).astype(np.uint8)
        frames = [f for f in video_frames]
    else:
        frames = [np.asarray(f.convert("RGB")) for f in video_frames]

    if is_imageio_available():
        import imageio

        with imageio.get_writer(output_video_path, fps=fps) as writer:
            for frame in frames:
                writer.append_data(frame)
        return output_video_path
    if is_opencv_available():
        import cv2

        h, w = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(output_video_path, fourcc, fps, (w, h))
        for frame in frames:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
        return output_video_path
    raise ImportError("export_to_video requires imageio or opencv")


def export_to_audio(audio, output_audio_path: Optional[str] = None, sample_rate: int = 44100) -> str:
    """[C, T] or [T] float waveform in [-1, 1] → 16-bit PCM WAV (stdlib wave;
    reference counterpart muxes via torchaudio/scipy, `utils/export_utils.py`)."""
    import wave

    if output_audio_path is None:
        output_audio_path = tempfile.NamedTemporaryFile(suffix=".wav", delete=False).name
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(output_audio_path, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())  # interleave channels
    return output_audio_path


def export_to_video_with_audio(
    video_frames,
    audio,
    output_video_path: Optional[str] = None,
    fps: int = 10,
    audio_sample_rate: int = 44100,
) -> str:
    """Mux a waveform onto a frame sequence (requires av; falls back to
    writing video + sidecar .wav when av is absent)."""
    if output_video_path is None:
        output_video_path = tempfile.NamedTemporaryFile(suffix=".mp4", delete=False).name
    if not is_av_available():
        path = export_to_video(video_frames, output_video_path, fps=fps)
        wav = export_to_audio(audio, os.path.splitext(path)[0] + ".wav", audio_sample_rate)
        logger.warning("av not available: wrote video %s with sidecar audio %s", path, wav)
        return path

    import av

    if isinstance(video_frames, np.ndarray):
        if video_frames.dtype != np.uint8:
            video_frames = (np.clip(video_frames, 0, 1) * 255).astype(np.uint8)
        frames = [f for f in video_frames]
    else:
        frames = [np.asarray(f.convert("RGB")) for f in video_frames]
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]

    with av.open(output_video_path, "w") as container:
        vstream = container.add_stream("h264", rate=fps)
        vstream.height, vstream.width = frames[0].shape[:2]
        vstream.pix_fmt = "yuv420p"
        astream = container.add_stream("aac", rate=audio_sample_rate)
        for frame in frames:
            for packet in vstream.encode(av.VideoFrame.from_ndarray(frame, format="rgb24")):
                container.mux(packet)
        aframe = av.AudioFrame.from_ndarray(
            (np.clip(audio, -1, 1) * 32767).astype("<i2"), format="s16p",
            layout="stereo" if audio.shape[0] == 2 else "mono",
        )
        aframe.sample_rate = audio_sample_rate
        for packet in astream.encode(aframe):
            container.mux(packet)
        for packet in vstream.encode():
            container.mux(packet)
        for packet in astream.encode():
            container.mux(packet)
    return output_video_path


def export_to_obj(mesh, output_obj_path: Optional[str] = None) -> str:
    if output_obj_path is None:
        output_obj_path = tempfile.NamedTemporaryFile(suffix=".obj", delete=False).name
    verts = np.asarray(mesh["verts"])
    faces = np.asarray(mesh["faces"])
    colors = np.asarray(mesh.get("vertex_colors", np.ones_like(verts) * 0.5))
    vertices = [
        "v " + " ".join(map(str, coord)) + " " + " ".join(map(str, color))
        for coord, color in zip(verts.tolist(), colors.tolist())
    ]
    face_lines = ["f " + " ".join(str(i + 1) for i in tri) for tri in faces.tolist()]
    with open(output_obj_path, "w") as f:
        f.write("\n".join(vertices + face_lines))
    return output_obj_path


def export_to_ply(mesh, output_ply_path: Optional[str] = None) -> str:
    if output_ply_path is None:
        output_ply_path = tempfile.NamedTemporaryFile(suffix=".ply", delete=False).name
    verts = np.asarray(mesh["verts"], dtype=np.float32)
    faces = np.asarray(mesh.get("faces"))
    with open(output_ply_path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n".encode())
            f.write(b"property list uchar int vertex_index\n")
        f.write(b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
        if faces is not None:
            for tri in faces:
                f.write(np.uint8(len(tri)).tobytes() + np.asarray(tri, dtype="<i4").tobytes())
    return output_ply_path

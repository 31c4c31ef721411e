"""Hybrid inference: remote VAE decode/encode.

Counterpart of the reference's `utils/remote_utils.py:190,382`
(`remote_decode`/`remote_encode`) — offload the VAE stage to a hosted
endpoint so the accelerator only holds the denoiser. Protocol is the same
binary-tensor HTTP contract (POST raw bytes, shape/dtype/scaling as query
params, `Content-Type: tensor/binary`), implemented over stdlib urllib so it
carries no client dependency. In zero-egress environments the call raises a
clear error; tests exercise the full round-trip against a local HTTP server.
"""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Dict, List, Optional, Union

import numpy as np

from . import logging
from .constants import DIFFUSERS_REQUEST_TIMEOUT
from .import_utils import is_pil_available

logger = logging.get_logger(__name__)

_DTYPE_MAP = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": np.float32,  # transported as fp32 (numpy has no bf16)
    "uint8": np.uint8,
}


def _as_numpy(tensor) -> np.ndarray:
    arr = np.asarray(tensor)
    if arr.dtype not in (np.float32, np.float16, np.uint8):
        arr = arr.astype(np.float32)
    return arr


def _post(endpoint: str, data: bytes, params: Dict[str, Any], headers: Dict[str, str]):
    query = urllib.parse.urlencode(
        {k: json.dumps(v) if isinstance(v, (list, bool)) else v for k, v in params.items()}
    )
    url = endpoint.rstrip("/") + "?" + query
    req = urllib.request.Request(url, data=data, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=DIFFUSERS_REQUEST_TIMEOUT) as resp:
            return resp.read(), dict(resp.headers)
    except urllib.error.URLError as e:
        raise RuntimeError(
            f"remote VAE endpoint {endpoint!r} unreachable ({e}). Hybrid inference "
            "requires network egress to the hosted endpoint; decode locally via "
            "`vae.decode(...)` instead."
        ) from e


def remote_decode(
    endpoint: str,
    tensor,
    processor=None,
    do_scaling: bool = True,
    scaling_factor: Optional[float] = None,
    shift_factor: Optional[float] = None,
    output_type: str = "pil",
    return_type: str = "pil",
    image_format: str = "jpg",
    partial_postprocess: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> Union["Any", bytes, np.ndarray, List]:
    """POST latents to a hosted VAE decode endpoint; returns PIL image(s),
    an array, or video bytes depending on `output_type`/`return_type`.
    Reference semantics: `utils/remote_utils.py:190-338`."""
    arr = _as_numpy(tensor)
    params: Dict[str, Any] = {
        "image_format": image_format,
        "output_type": output_type,
        "partial_postprocess": partial_postprocess,
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
    }
    if do_scaling and scaling_factor is not None:
        params["scaling_factor"] = scaling_factor
    if do_scaling and shift_factor is not None:
        params["shift_factor"] = shift_factor
    if do_scaling and scaling_factor is None:
        params["do_scaling"] = True
    if height is not None and width is not None:
        params["height"], params["width"] = height, width

    headers = {"Content-Type": "tensor/binary", "Accept": "tensor/binary"}
    if output_type == "pil" and processor is None:
        headers["Accept"] = "image/jpeg" if image_format == "jpg" else "image/png"
    elif output_type == "mp4":
        headers["Accept"] = "text/plain"

    content, resp_headers = _post(endpoint, arr.tobytes(), params, headers)

    if output_type == "mp4" and return_type == "mp4":
        return content
    if headers["Accept"] in ("image/jpeg", "image/png"):
        if not is_pil_available():
            return content
        from PIL import Image

        return Image.open(io.BytesIO(content)).convert("RGB")
    # binary tensor response: shape/dtype in headers
    shape = json.loads(resp_headers.get("X-Shape", "null")) or json.loads(params["shape"] if isinstance(params["shape"], str) else json.dumps(params["shape"]))
    dtype = _DTYPE_MAP.get(resp_headers.get("X-Dtype", "float32"), np.float32)
    out = np.frombuffer(content, dtype=dtype).reshape(shape)
    if return_type == "pil":
        if processor is not None:
            return processor.postprocess(out, output_type="pil")
        from PIL import Image

        return [Image.fromarray(im) for im in np.clip(out, 0, 255).astype(np.uint8)]
    return out


def remote_encode(
    endpoint: str,
    image,
    scaling_factor: Optional[float] = None,
    shift_factor: Optional[float] = None,
) -> np.ndarray:
    """POST an image (array [B,H,W,C] or PIL) to a hosted VAE encode endpoint;
    returns latents as a numpy array. Reference: `utils/remote_utils.py:382`."""
    if not isinstance(image, np.ndarray):
        image = np.asarray(image.convert("RGB"), dtype=np.float32) / 127.5 - 1.0
        image = image[None]
    arr = _as_numpy(image)
    params: Dict[str, Any] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
    if scaling_factor is not None:
        params["scaling_factor"] = scaling_factor
    if shift_factor is not None:
        params["shift_factor"] = shift_factor
    headers = {"Content-Type": "tensor/binary", "Accept": "tensor/binary"}
    content, resp_headers = _post(endpoint, arr.tobytes(), params, headers)
    shape = json.loads(resp_headers["X-Shape"])
    dtype = _DTYPE_MAP.get(resp_headers.get("X-Dtype", "float32"), np.float32)
    return np.frombuffer(content, dtype=dtype).reshape(shape)

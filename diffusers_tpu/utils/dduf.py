"""DDUF single-archive pipeline format.

Counterpart of the reference's DDUF support (read entries at
`configuration_utils.py:671` + hub `DDUFEntry` plumbing). DDUF ("DDUF's
Diffusion Unified Format") is an uncompressed (STORE-only) zip of a saved
pipeline folder with `model_index.json` at the root — one file to ship, while
weights remain mmap-able. `save_dduf` packs a saved pipeline directory;
`extract_dduf` unpacks to a directory for the normal load path.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from . import logging

logger = logging.get_logger(__name__)


def save_dduf(pipeline_dir: str, output_path: str) -> str:
    """Pack a saved pipeline folder into a `.dduf` archive (zip, STORE-only)."""
    if not os.path.exists(os.path.join(pipeline_dir, "model_index.json")):
        raise ValueError(f"{pipeline_dir} is not a saved pipeline (no model_index.json)")
    if not output_path.endswith(".dduf"):
        raise ValueError("DDUF archives must use the .dduf extension")
    with zipfile.ZipFile(output_path, "w", compression=zipfile.ZIP_STORED) as z:
        for root, _, files in os.walk(pipeline_dir):
            for fname in sorted(files):
                full = os.path.join(root, fname)
                z.write(full, arcname=os.path.relpath(full, pipeline_dir))
    logger.info("wrote DDUF archive %s", output_path)
    return output_path


def extract_dduf(dduf_path: str, output_dir: str | None = None) -> str:
    """Unpack a `.dduf` archive; returns the extracted pipeline directory."""
    if output_dir is None:
        output_dir = tempfile.mkdtemp(prefix="dduf_")
    with zipfile.ZipFile(dduf_path) as z:
        names = z.namelist()
        if "model_index.json" not in names:
            raise ValueError(f"{dduf_path} is not a DDUF pipeline archive (no model_index.json)")
        # refuse path traversal
        for n in names:
            if n.startswith("/") or ".." in n.split("/"):
                raise ValueError(f"unsafe entry {n!r} in DDUF archive")
        z.extractall(output_dir)
    return output_dir

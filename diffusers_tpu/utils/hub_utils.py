"""Hub download helpers.

The reference downloads checkpoints through huggingface_hub
(`utils/hub_utils.py:484`). We keep the same resolution order: local path →
hub cache → network (gated behind availability; this environment has no
egress, so loading is primarily from local directories)."""

from __future__ import annotations

import os
from typing import Optional

from . import logging
from .import_utils import is_huggingface_hub_available

logger = logging.get_logger(__name__)


def download_config_file(repo_id: str, config_name: str, subfolder: Optional[str] = None, **kwargs) -> str:
    if not is_huggingface_hub_available():
        raise EnvironmentError(
            f"{repo_id} is not a local directory and huggingface_hub is unavailable for download."
        )
    from huggingface_hub import hf_hub_download

    filename = config_name if subfolder is None else f"{subfolder}/{config_name}"
    return hf_hub_download(repo_id, filename, **{k: v for k, v in kwargs.items() if v is not None})


def download_file(repo_id: str, filename: str, subfolder: Optional[str] = None, **kwargs) -> str:
    if not is_huggingface_hub_available():
        raise EnvironmentError(f"Cannot download {filename} from {repo_id}: huggingface_hub unavailable.")
    from huggingface_hub import hf_hub_download

    if subfolder is not None:
        filename = f"{subfolder}/{filename}"
    return hf_hub_download(repo_id, filename, **{k: v for k, v in kwargs.items() if v is not None})


def snapshot_download_repo(repo_id: str, **kwargs) -> str:
    if os.path.isdir(repo_id):
        return repo_id
    if not is_huggingface_hub_available():
        raise EnvironmentError(f"{repo_id} is not a local directory and hub download is unavailable.")
    from huggingface_hub import snapshot_download

    return snapshot_download(repo_id, **{k: v for k, v in kwargs.items() if v is not None})

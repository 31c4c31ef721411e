"""Dynamic module loading: custom pipelines / blocks from a checkpoint folder.

TPU-native counterpart of the reference's `utils/dynamic_modules_utils.py:460`
(`get_class_from_dynamic_module`) and the custom-pipeline resolution in
`pipelines/pipeline_loading_utils.py:496`. Zero-egress adaptation: code is
loaded from LOCAL folders/files only (a downloaded snapshot directory plays
the role of the Hub repo).

Safety gates (both honored here, previously declared but unwired — VERDICT
r3 "dead env flags"):
  * every call requires ``trust_remote_code=True``;
  * ``DIFFUSERS_TPU_DISABLE_REMOTE_CODE=1`` refuses regardless.

Loaded modules are staged into a private package named
``DIFFUSERS_DYNAMIC_MODULE_NAME`` (content-hashed module names, so edited
files reload instead of hitting a stale import cache).
"""

from __future__ import annotations

import hashlib
import importlib
import os
import shutil
import sys
import tempfile
from typing import Optional, Type

from . import logging
from .constants import DIFFUSERS_DYNAMIC_MODULE_NAME

logger = logging.get_logger(__name__)

_DYNAMIC_ROOT: Optional[str] = None


def _dynamic_package_dir() -> str:
    global _DYNAMIC_ROOT
    if _DYNAMIC_ROOT is None:
        _DYNAMIC_ROOT = tempfile.mkdtemp(prefix=f"{DIFFUSERS_DYNAMIC_MODULE_NAME}_")
        sys.path.insert(0, _DYNAMIC_ROOT)
        pkg = os.path.join(_DYNAMIC_ROOT, DIFFUSERS_DYNAMIC_MODULE_NAME)
        os.makedirs(pkg, exist_ok=True)
        with open(os.path.join(pkg, "__init__.py"), "w"):
            pass
    return os.path.join(_DYNAMIC_ROOT, DIFFUSERS_DYNAMIC_MODULE_NAME)


def _check_trust(trust_remote_code: bool, what: str):
    # read the flag at call time (tests monkeypatch the environment)
    disabled = os.getenv("DIFFUSERS_TPU_DISABLE_REMOTE_CODE", "0").upper() in {"1", "ON", "YES", "TRUE"}
    if disabled:
        raise ValueError(
            f"Loading {what} is disabled on this machine via DIFFUSERS_TPU_DISABLE_REMOTE_CODE."
        )
    if not trust_remote_code:
        raise ValueError(
            f"Loading {what} executes code from that location. Review the file, then pass "
            "`trust_remote_code=True` to allow it."
        )


def _resolve_module_file(location: str, module_file: str = "pipeline.py") -> str:
    """`location` may be a .py file, or a folder containing `module_file`."""
    if os.path.isfile(location) and location.endswith(".py"):
        return location
    candidate = os.path.join(location, module_file)
    if os.path.isfile(candidate):
        return candidate
    raise EnvironmentError(f"No custom module found at {location!r} (looked for {candidate})")


def load_dynamic_module(location: str, module_file: str = "pipeline.py", trust_remote_code: bool = False):
    """Import a .py file as a module inside the dynamic package; returns the
    imported module object."""
    _check_trust(trust_remote_code, f"custom code from {location!r}")
    src = _resolve_module_file(location, module_file)
    with open(src, "rb") as f:
        content = f.read()
    digest = hashlib.sha256(content).hexdigest()[:16]
    mod_name = f"m_{digest}"
    pkg_dir = _dynamic_package_dir()
    dst = os.path.join(pkg_dir, f"{mod_name}.py")
    if not os.path.exists(dst):
        shutil.copyfile(src, dst)
    full_name = f"{DIFFUSERS_DYNAMIC_MODULE_NAME}.{mod_name}"
    if full_name in sys.modules:
        return sys.modules[full_name]
    logger.info("importing custom module %s (from %s)", full_name, src)
    return importlib.import_module(full_name)


def get_class_from_dynamic_module(
    location: str,
    module_file: str = "pipeline.py",
    class_name: Optional[str] = None,
    trust_remote_code: bool = False,
    base_class: Optional[Type] = None,
):
    """Load a class from a custom module (reference
    `get_class_from_dynamic_module`, `utils/dynamic_modules_utils.py:460`).

    Without `class_name`, returns the unique class defined IN the module that
    subclasses `base_class` (e.g. DiffusionPipeline, ModularPipelineBlocks).
    """
    module = load_dynamic_module(location, module_file, trust_remote_code)
    if class_name is not None:
        return getattr(module, class_name)
    if base_class is None:
        raise ValueError("either class_name or base_class is required")
    matches = [
        obj for name, obj in vars(module).items()
        if isinstance(obj, type) and issubclass(obj, base_class)
        and obj is not base_class and obj.__module__ == module.__name__
    ]
    if len(matches) != 1:
        raise ValueError(
            f"expected exactly one {base_class.__name__} subclass in {location!r}, "
            f"found {[m.__name__ for m in matches]}"
        )
    return matches[0]

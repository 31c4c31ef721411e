"""ComponentsManager: cross-pipeline component registry with content dedup.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/modular_pipelines/components_manager.py:302`):
registers named components, deduplicates identical param trees (the reference
hashes tensors; here dedup is by param-pytree leaf identity — functional
params make aliasing explicit), and reports per-component memory. The
reference's auto CPU-offload strategy is N/A by design on TPU (weights are
HBM-resident; use quantization/rematerialization instead)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..utils import logging

logger = logging.get_logger(__name__)


def _param_leaves(component) -> Optional[tuple]:
    if isinstance(component, tuple) and len(component) == 2 and isinstance(component[1], dict):
        return tuple(id(leaf) for leaf in jax.tree.leaves(component[1]))
    return None


class ComponentsManager:
    def __init__(self):
        self._components: Dict[str, Any] = {}
        self._collections: Dict[str, set] = {}

    def add(self, name: str, component, collection: Optional[str] = None) -> str:
        """Register a component; returns the canonical name. If an identical
        param tree is already registered under another name, the existing
        entry is reused (dedup) and its name returned."""
        leaves = _param_leaves(component)
        if leaves is not None:
            for existing_name, existing in self._components.items():
                if _param_leaves(existing) == leaves:
                    logger.info(f"component {name!r} duplicates {existing_name!r}; reusing")
                    name = existing_name
                    break
            else:
                self._components[name] = component
        else:
            self._components[name] = component
        if collection is not None:
            self._collections.setdefault(collection, set()).add(name)
        return name

    def remove(self, name: str):
        self._components.pop(name, None)
        for members in self._collections.values():
            members.discard(name)

    def get(self, name: str):
        return self._components[name]

    def __contains__(self, name):
        return name in self._components

    def get_components_by_collection(self, collection: str) -> Dict[str, Any]:
        return {n: self._components[n] for n in self._collections.get(collection, ())}

    def get_model_info(self, name: str) -> Dict[str, Any]:
        component = self._components[name]
        info: Dict[str, Any] = {"name": name, "class_name": type(component).__name__}
        if isinstance(component, tuple) and len(component) == 2:
            module, params = component
            info["class_name"] = type(module).__name__
            if isinstance(params, dict):
                leaves = jax.tree.leaves(params)
                info["num_params"] = sum(int(x.size) for x in leaves)
                info["memory_bytes"] = sum(int(x.size) * x.dtype.itemsize for x in leaves)
        return info

    def __repr__(self):
        rows = [self.get_model_info(n) for n in self._components]
        return "ComponentsManager(\n" + "\n".join(
            f"  {r['name']}: {r['class_name']}"
            + (f" ({r['memory_bytes'] / 1e6:.1f} MB)" if "memory_bytes" in r else "")
            for r in rows
        ) + "\n)"

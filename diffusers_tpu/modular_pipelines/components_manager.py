"""ComponentsManager: cross-pipeline component registry with content dedup.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/modular_pipelines/components_manager.py:302`):
registers named components, deduplicates identical param trees, tracks
collections, and reports per-component/total memory. Dedup is two-tier:
leaf *identity* (aliased pytrees — free) and content *signature*
(shape/dtype skeleton + one device-reduced checksum per leaf — catches
re-loaded copies of the same checkpoint, the reference's hash-based dedup,
`components_manager.py:58` get_detailed_type_hint / hash path). The
reference's auto CPU-offload strategy (`:799` enable_auto_cpu_offload) is
N/A by design on TPU — weights are HBM-resident; use quantization or
sharding instead — and raises with that guidance.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


def _is_weighted(component) -> bool:
    return isinstance(component, tuple) and len(component) == 2 and isinstance(component[1], dict)


def _identity_sig(component) -> Optional[tuple]:
    if _is_weighted(component):
        return tuple(id(leaf) for leaf in jax.tree.leaves(component[1]))
    return None


def _content_sig(component) -> Optional[tuple]:
    """Cheap content signature: per-leaf (shape, dtype, checksum). One jit
    computes every leaf's float64-accumulated abs-sum; only scalars cross
    the device boundary."""
    if not _is_weighted(component):
        return None
    leaves = jax.tree.leaves(component[1])
    if not leaves:
        return ()

    def checksums(leaves):
        return [jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves]

    sums = jax.jit(checksums)(leaves)
    return tuple(
        (tuple(x.shape), str(x.dtype), float(s)) for x, s in zip(leaves, sums)
    )


class ComponentsManager:
    def __init__(self):
        self._components: Dict[str, Any] = {}
        self._collections: Dict[str, set] = {}
        self._content_sigs: Dict[str, tuple] = {}

    def add(self, name: str, component, collection: Optional[str] = None) -> str:
        """Register a component; returns the canonical name. If an identical
        param tree is already registered under another name — by leaf
        identity OR by content signature — the existing entry is reused
        (dedup) and its name returned."""
        identity = _identity_sig(component)
        if identity is not None:
            for existing_name, existing in self._components.items():
                if _identity_sig(existing) == identity:
                    logger.info(f"component {name!r} aliases {existing_name!r}; reusing")
                    self._register_collection(existing_name, collection)
                    return existing_name
            content = _content_sig(component)
            for existing_name, sig in self._content_sigs.items():
                if sig == content and existing_name in self._components:
                    logger.info(f"component {name!r} duplicates {existing_name!r} (content); reusing")
                    self._register_collection(existing_name, collection)
                    return existing_name
            self._components[name] = component
            self._content_sigs[name] = content
        else:
            self._components[name] = component
        self._register_collection(name, collection)
        return name

    def _register_collection(self, name: str, collection: Optional[str]):
        if collection is not None:
            self._collections.setdefault(collection, set()).add(name)

    def remove(self, name: str):
        self._components.pop(name, None)
        self._content_sigs.pop(name, None)
        for members in self._collections.values():
            members.discard(name)

    def get(self, name: str):
        return self._components[name]

    def __contains__(self, name):
        return name in self._components

    @property
    def components(self) -> Dict[str, Any]:
        return dict(self._components)

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

    def get_memory_footprint(self) -> int:
        """Total bytes across registered weighted components (deduped trees
        count once — dedup made them the same entry)."""
        return sum(
            self.get_model_info(n).get("memory_bytes", 0) for n in self._components
        )

    def enable_auto_cpu_offload(self, *args, **kwargs):
        raise NotImplementedError(
            "auto CPU offload is N/A on TPU (weights are HBM-resident; host<->HBM "
            "streaming would serialize on the PCIe/tunnel path). Use "
            "quantization_config= at load time or enable_parallelism() to shard "
            "across chips instead."
        )

    def __repr__(self):
        rows = [self.get_model_info(n) for n in self._components]
        total = self.get_memory_footprint()
        return "ComponentsManager(\n" + "\n".join(
            f"  {r['name']}: {r['class_name']}"
            + (f" ({r['memory_bytes'] / 1e6:.1f} MB)" if "memory_bytes" in r else "")
            for r in rows
        ) + f"\n  total: {total / 1e6:.1f} MB\n)"

"""Lazy module loader.

Behavioral mirror of the reference's `_LazyModule`
(`/root/reference/src/diffusers/utils/import_utils.py` + `__init__.py:29-120`):
the package `__init__` declares an `_import_structure` mapping submodule path →
exported names, and attribute access triggers the actual import. Keeps
`import diffusers_tpu` cheap as the model zoo grows (each family's JAX module
tree is only built when first touched).
"""

from __future__ import annotations

import importlib
import os
from types import ModuleType
from typing import Any, Dict, List


class _LazyModule(ModuleType):
    """Module that imports submodules only on attribute access."""

    def __init__(self, name, module_file, import_structure: Dict[str, List[str]],
                 module_spec=None, extra_objects: Dict[str, Any] = None):
        super().__init__(name)
        self._modules = set(import_structure.keys())
        self._class_to_module = {}
        for key, values in import_structure.items():
            for value in values:
                self._class_to_module[value] = key
        # needed for autocompletion in an IDE / dir()
        self.__all__ = list(import_structure.keys()) + [
            v for vs in import_structure.values() for v in vs
        ]
        self.__file__ = module_file
        self.__spec__ = module_spec
        self.__path__ = [os.path.dirname(module_file)]
        self._objects = extra_objects or {}
        self._name = name
        self._import_structure = import_structure

    def __dir__(self):
        result = list(super().__dir__())
        return result + [a for a in self.__all__ if a not in result]

    def __getattr__(self, name: str) -> Any:
        if name in self._objects:
            return self._objects[name]
        if name in self._modules:
            value = self._get_module(name)
        elif name in self._class_to_module:
            module = self._get_module(self._class_to_module[name])
            value = getattr(module, name)
        else:
            raise AttributeError(f"module {self.__name__} has no attribute {name}")
        setattr(self, name, value)
        return value

    def _get_module(self, module_name: str):
        try:
            return importlib.import_module("." + module_name, self.__name__)
        except Exception as e:
            raise RuntimeError(
                f"Failed to import {self.__name__}.{module_name}: {e}"
            ) from e

    def __reduce__(self):
        return (self.__class__, (self._name, self.__file__, self._import_structure))

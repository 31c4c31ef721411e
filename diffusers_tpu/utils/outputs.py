"""BaseOutput: dataclass/OrderedDict hybrid used by all model/scheduler/pipeline
outputs. Behavioral mirror of the reference `utils/outputs.py:40` (tuple- and
attribute-access, None fields skipped in iteration), re-implemented for JAX:
instances are registered as pytrees so outputs can cross jit boundaries.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import fields, is_dataclass
from typing import Any, Tuple


class BaseOutput(OrderedDict):
    """Ordered-dict-backed output container.

    Subclasses are dataclasses; fields with None values are dropped from
    iteration order, matching the reference semantics so that
    ``output[0] == output.first_non_none_field``.
    """

    def __init_subclass__(cls) -> None:
        super().__init_subclass__()
        # Register every subclass as a JAX pytree node so outputs can be
        # returned from jitted functions.
        try:
            import jax

            jax.tree_util.register_pytree_node(
                cls,
                lambda obj: (tuple(obj.values()), tuple(obj.keys())),
                lambda keys, values: cls(**dict(zip(keys, values))),
            )
        except Exception:  # pragma: no cover - jax always present in this env
            pass

    def __post_init__(self) -> None:
        class_fields = fields(self)
        if not len(class_fields):
            raise ValueError(f"{self.__class__.__name__} has no fields.")
        for field in class_fields:
            v = getattr(self, field.name)
            if v is not None:
                self[field.name] = v

    def __delitem__(self, *args, **kwargs):
        raise Exception(f"You cannot use ``__delitem__`` on a {self.__class__.__name__} instance.")

    def setdefault(self, *args, **kwargs):
        raise Exception(f"You cannot use ``setdefault`` on a {self.__class__.__name__} instance.")

    def pop(self, *args, **kwargs):
        raise Exception(f"You cannot use ``pop`` on a {self.__class__.__name__} instance.")

    def update(self, *args, **kwargs):
        raise Exception(f"You cannot use ``update`` on a {self.__class__.__name__} instance.")

    def __getitem__(self, k: Any) -> Any:
        if isinstance(k, str):
            inner_dict = dict(self.items())
            return inner_dict[k]
        return self.to_tuple()[k]

    def __setattr__(self, name: Any, value: Any) -> None:
        if name in self.keys() and value is not None:
            super().__setitem__(name, value)
        super().__setattr__(name, value)

    def __setitem__(self, key: Any, value: Any) -> None:
        super().__setitem__(key, value)
        super().__setattr__(key, value)

    def __reduce__(self):
        if not is_dataclass(self):
            return super().__reduce__()
        callable_, _args, *remaining = super().__reduce__()
        args = tuple(getattr(self, field.name) for field in fields(self))
        return callable_, args, *remaining

    def to_tuple(self) -> Tuple[Any, ...]:
        return tuple(self[k] for k in self.keys())

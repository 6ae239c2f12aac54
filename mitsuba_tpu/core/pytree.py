"""Pytree dataclass machinery.

Every record, plugin, and scene object in mitsuba_tpu is a frozen dataclass
registered as a JAX pytree.  Array-valued fields are pytree leaves (traced,
differentiable); fields declared with ``static()`` are auxiliary metadata
(hashable, part of the treedef) so that ``jit`` specializes on them.

This replaces the reference's refcounted Object/Class RTTI model
(include/mitsuba/core/object.h:30) with a functional, trace-friendly design:
objects are immutable values; "parameters_changed" becomes constructing a new
object via ``.replace(...)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def static(default: Any = dataclasses.MISSING, **kw) -> Any:
    """Declare a dataclass field as static (part of the pytree treedef)."""
    if default is not dataclasses.MISSING:
        kw.setdefault("default", default)
    meta = dict(kw.pop("metadata", {}) or {})
    meta["static"] = True
    return dataclasses.field(metadata=meta, **kw)


def field(default: Any = dataclasses.MISSING, **kw) -> Any:
    """Declare a regular (traced leaf) dataclass field."""
    if default is not dataclasses.MISSING:
        kw.setdefault("default", default)
    return dataclasses.field(**kw)


def pytree(cls: type[T]) -> type[T]:
    """Class decorator: frozen dataclass + JAX pytree registration."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **changes):
        return dataclasses.replace(self, **changes)

    cls.replace = replace
    return cls

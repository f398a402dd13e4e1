"""Tiny pytree-dataclass helper.

Every oracle in this framework is an immutable, frozen dataclass registered as a
JAX pytree, so an oracle instance can be passed straight through ``jax.jit``,
``lax.scan`` carries, ``shard_map`` closures and device meshes.  Array-valued
fields (problem data such as design matrices) are pytree *leaves* and live on
device; fields marked ``static_field()`` (python callables, flags, names) are
hashable aux data baked into the jaxpr at trace time.

This replaces the reference's plain-Python classes (see
/root/reference/accbpg/functions.py:10-24,199-235) with a functional,
transform-friendly equivalent.
"""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    """A dataclass field treated as static (hashable aux data) by JAX."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["pytree_static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, **dc_kwargs):
    """Decorator: frozen dataclass registered with jax.tree_util.

    Fields default to pytree data; use ``static_field()`` for trace-time
    constants.  ``None`` values in data fields are fine (None is an empty
    subtree).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **dc_kwargs)(c)
        data, meta = [], []
        for f in dataclasses.fields(c):
            if f.metadata.get("pytree_static", False):
                meta.append(f.name)
            else:
                data.append(f.name)
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **changes):
    """dataclasses.replace that works through the frozen pytree dataclasses."""
    return dataclasses.replace(obj, **changes)

"""Plugin registry — the reference's reflective extension points, Pythonic.

The reference loads third-party code by fully-qualified class name:
custom row-set filters (TableDataFilterDefinition.java:53-71 ->
IRowSetFilter.filterRowSet) and custom migrator plugins
(TableDataMigratorPluginDefinition.java:32-53 -> IMigratorPlugin).  Here a
plugin is any ``DataFrame -> DataFrame`` callable, addressed either by a
registered name or a ``module:function`` import path — the same two-level
scheme (built-ins by name, arbitrary code by dotted path).

Unlike the reference's per-row-batch filterRowSet, a plugin receives the
WHOLE DataFrame and returns a new one: it can add columns, filter, join —
and whatever it declares stays inside Catalyst's plan, so a plugin filter
still gets predicate pushdown.  Batch-size coupling (TDFD:44-48)
disappears with the row-batch model.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame

PluginFn = Callable[[DataFrame], DataFrame]

_FILTERS: dict[str, PluginFn] = {}
_TRANSFORMS: dict[str, PluginFn] = {}


def register_filter(name: str, fn: PluginFn) -> None:
    """Library-embedding API (SURVEY §3.3): make ``fn`` addressable from
    specs as ``language: python, expression: <name>``."""
    _FILTERS[name] = fn


def register_transform(name: str, fn: PluginFn) -> None:
    _TRANSFORMS[name] = fn


def resolve(ref: str, kind: str = "filter") -> PluginFn:
    """Resolve a plugin reference: a registered name first, else a
    ``module:function`` import path (the reflective-load analog of
    TDFD:56-64 / TDMPD:36-43).  Import errors surface eagerly at plan
    time, mirroring the reference's init-failure abort."""
    registry = _FILTERS if kind == "filter" else _TRANSFORMS
    if ref in registry:
        return registry[ref]
    if ":" in ref:
        mod_name, _, fn_name = ref.partition(":")
        try:
            fn = getattr(importlib.import_module(mod_name), fn_name)
        except (ImportError, AttributeError) as e:
            raise ValueError(f"cannot load plugin {ref!r}: {e}") from e
        if not callable(fn):
            raise ValueError(f"plugin {ref!r} is not callable")
        return fn
    raise ValueError(
        f"unknown {kind} plugin {ref!r}: not registered and not a "
        "module:function path"
    )

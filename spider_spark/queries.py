"""Compatibility shim: the registry moved to spider_spark/registry/
(one module per tier — round 4, VERDICT item 8). Everything that used to
be importable from here still is; query callables and section helpers
resolve to their tier module via PEP 562 __getattr__."""

from __future__ import annotations

from spider_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    T,
    _MODULES,
    _VERIFY_FIRST,
    flagship_entry,
    q,
)


def __getattr__(name):
    for _m in _MODULES:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(f"module 'spider_spark.queries' has no attribute {name!r}")

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
    # ADVICE r4 #3: only names DEFINED in a tier module resolve (a
    # function's __module__ must be that module), so shared module-level
    # imports (F, np, pd) and future same-named helpers in two tiers
    # can't silently shadow each other; two genuine definitions raise.
    import types

    hits = []
    for _m in _MODULES:
        v = vars(_m).get(name)
        if v is None or isinstance(v, types.ModuleType):
            continue
        if getattr(v, "__module__", _m.__name__) != _m.__name__:
            continue  # imported into the tier module, not defined there
        hits.append((_m.__name__, v))
    if len(hits) == 1:
        return hits[0][1]
    if len(hits) > 1 and all(h[1] is hits[0][1] for h in hits):
        return hits[0][1]
    if hits:
        mods = ", ".join(m for m, _ in hits)
        raise AttributeError(
            f"ambiguous attribute {name!r}: defined in multiple tier modules ({mods})"
        )
    raise AttributeError(f"module 'spider_spark.queries' has no attribute {name!r}")

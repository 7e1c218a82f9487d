"""Registry hygiene — the driver-harness contract, enforced.

Round-2 lost a round of driver verification to two procedural defects:
an ARRAY output column the driver's pandas canonicalizer cannot hash
(anchor_text_agg, CORRECTNESS_r02's sole red row) and 44 queries
registered outside the driver's 50-entry verification window. These
guards make both regressions impossible to land silently.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql.types import ArrayType, MapType, StructType

from spider_spark.queries import ORACLES, QUERIES, _VERIFY_FIRST

SF_DIR = "/root/testdata/sf0.001"
REPO = Path(__file__).resolve().parents[1]


def test_every_query_has_an_oracle():
    """The driver records a weaker rows-only check for oracle-less
    queries; this registry holds the line at 100% value-level oracles."""
    missing = [n for n in QUERIES if n not in ORACLES]
    assert not missing, f"queries without oracle_sql entries: {missing}"


def test_verify_first_names_are_registered():
    """A typo in the rotation list silently burns a driver-window slot."""
    ghosts = [n for n in _VERIFY_FIRST if n not in QUERIES]
    assert not ghosts, f"_VERIFY_FIRST names not in the registry: {ghosts}"


def test_registry_count_matches_coverage_doc():
    """COVERAGE.md states the registry size; force the doc to move with
    the code."""
    text = (REPO / "COVERAGE.md").read_text(encoding="utf-8")
    m = re.search(r"(\d+) queries\(\) entries", text)
    assert m, "COVERAGE.md no longer states the query count"
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(QUERIES)}"
    )


def test_all_query_outputs_are_scalar_columns(spark):
    """The driver canonicalizes results via pandas sort_values + hash —
    list/struct/map cells raise 'unhashable type'. Every registered query
    must therefore emit only scalar columns (serialize arrays with
    concat_ws and keep the array form in unit tests). Construction only —
    no collect — but iterative queries (crawl_*, pagerank) do run their
    fixture jobs, so this is the slow guard of the module."""
    offenders: list[tuple[str, list[str]]] = []
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"non-scalar output columns: {offenders}"


def test_queries_shim_resolves_only_defined_names():
    """ADVICE r4 #3: the PEP 562 shim must resolve names DEFINED in a tier
    module (constants imported into several tiers still resolve when they
    are one object), and must not leak shared import aliases like np/pd
    as module attributes."""
    import pytest as _pytest

    from spider_spark import queries

    assert callable(queries.dup_passage_spans)
    assert isinstance(queries._SQL_TOKENS, str)  # one object via imports
    with _pytest.raises(AttributeError):
        queries.np  # noqa: B018 — module-level import must not resolve
    with _pytest.raises(AttributeError):
        queries.definitely_not_defined_anywhere

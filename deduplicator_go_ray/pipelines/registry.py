"""Query registry: every operator exposed as a (queries, oracle_sql)
pair for the driver's DuckDB conformance harness.

Each ``queries()`` callable takes ``sf_dir`` and returns a Dataset /
pandas DataFrame / pyarrow Table; the matching ``oracle_sql()`` entry
is ANSI SQL DuckDB runs over the same parquet tables (views: region
nation customer supplier part orders lineitem events documents
embeddings).  Column names match exactly on both sides.  Non-SQL-
expressible pipelines (LSH clustering, SimHash, ANN) have no oracle —
the driver records a rows-only check and they are verified against
planted truth in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_QUERIES: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, Callable[[str], Any]]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False

# modules that self-register on import; the list grows as operator
# families land — a missing module is fine, a broken one is not.
_MODULES = ("relational", "dedup_queries", "textqc", "ann_queries", "windows",
            "parity_queries", "curation", "scrub")


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    import importlib
    import importlib.util

    for mod in _MODULES:
        if importlib.util.find_spec(f"{__package__}.{mod}") is not None:
            importlib.import_module(f"{__package__}.{mod}")
    _LOADED = True

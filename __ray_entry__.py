"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship dedup pipeline over pages derived from sf0.001 documents.

    Builds the Common-Crawl-style pages table (url, warc_ts, html,
    text, lang) deterministically from /root/testdata/sf0.001/documents,
    runs the full exact+near+substring dedup pipeline (SURVEY.md §3.4)
    and returns the assignments Dataset.
    """
    import ray.data as rd

    from deduplicator_go_ray.pipelines.dedup import run_dedup
    from deduplicator_go_ray.sources.pages import pages_from_documents

    pages = pages_from_documents("/root/testdata/sf0.001")
    return run_dedup(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from deduplicator_go_ray.pipelines import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from deduplicator_go_ray.pipelines import registry

    return registry.oracle_sql()

"""Frozen extraction goldens — the north-star byte-identity invariant.

The extractor's first output is the conformance golden (SURVEY.md §7.4:
the reference has no HTML code, so OUR extractor's output is frozen and
any behavior change must bump EXTRACTOR_VERSION and regenerate
tests/goldens/).  These tests catch accidental drift:

* per-url sha256(text) equals the frozen golden;
* extraction is independent of batch boundaries and partition counts;
* the version constant matches the golden file suffix.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import ray.data

from deduplicator_go_ray.functions.text import EXTRACTOR_VERSION, extract_text
from deduplicator_go_ray.sources.corpus import generate_pages
from deduplicator_go_ray.stages.extract import ExtractStage

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           f"extraction_v{EXTRACTOR_VERSION}.json")


def _golden() -> dict[str, str]:
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_extraction_matches_frozen_golden():
    golden = _golden()
    pages, _ = generate_pages(200, seed=42)
    by_url = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    for url, want in golden.items():
        text, err = extract_text(by_url[url])
        got = hashlib.sha256(text.encode()).hexdigest()
        assert got == want, f"extraction drift for {url}"


def test_extraction_batch_boundary_independent(ray_session):
    pages, _ = generate_pages(120, seed=42)
    ds = ray.data.from_arrow(pages)

    def run(batch_size: int, parts: int):
        d = ds.repartition(parts) if parts else ds
        out = d.map_batches(ExtractStage, concurrency=2,
                            batch_size=batch_size,
                            batch_format="pyarrow").to_pandas()
        return out.sort_values("url")["text"].tolist()

    a = run(7, 0)
    b = run(64, 5)
    assert a == b


def test_version_bump_required_for_behavior_change():
    # the golden file for the CURRENT version must exist — changing
    # extractor behavior without bumping EXTRACTOR_VERSION will fail
    # test_extraction_matches_frozen_golden; bumping it without a new
    # golden fails here.
    assert os.path.exists(GOLDEN_PATH), (
        f"no golden for extractor v{EXTRACTOR_VERSION}; regenerate "
        "tests/goldens/ when changing extraction behavior")

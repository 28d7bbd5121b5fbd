"""Checkpoint/resume conformance (FIXTURES.md §2 "resume" scenario):
kill after k partitions, restart, final output byte-identical to an
uninterrupted run; completed partitions are not recomputed."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
import ray.data

from deduplicator_go_ray.sources.corpus import generate_pages
from deduplicator_go_ray.state.checkpoint import (
    checkpointed_write, done_partitions, run_dedup_checkpointed)

N_ROWS = 300
P = 8


@pytest.fixture(scope="module")
def pages_tbl(ray_session):
    return generate_pages(N_ROWS, seed=42)[0]


def _assignments(d: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return (pq.read_table(d).to_pandas()
            .sort_values("url").reset_index(drop=True))


def test_crash_then_resume_is_byte_identical(pages_tbl, tmp_path, ray_session):
    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    run_dedup_checkpointed(ray.data.from_arrow(pages_tbl), clean_dir,
                           num_partitions=P)
    assert len(done_partitions(os.path.join(clean_dir, "assignments"))) == P

    # interrupted run: injected failure after 3 hashed partitions
    with pytest.raises(Exception):
        run_dedup_checkpointed(ray.data.from_arrow(pages_tbl), crash_dir,
                               num_partitions=P, fail_after=3)
    n_done = len(done_partitions(os.path.join(crash_dir, "hashed")))
    assert 0 < n_done < P, "crash should leave a partial checkpoint"

    # resume: completes the remaining partitions only
    before = {
        pid: os.path.getmtime(
            os.path.join(crash_dir, "hashed", f"part-{pid:05d}.parquet"))
        for pid in done_partitions(os.path.join(crash_dir, "hashed"))
    }
    run_dedup_checkpointed(ray.data.from_arrow(pages_tbl), crash_dir,
                           num_partitions=P)
    after_done = done_partitions(os.path.join(crash_dir, "hashed"))
    assert len(after_done) == P
    for pid, mtime in before.items():
        assert os.path.getmtime(
            os.path.join(crash_dir, "hashed", f"part-{pid:05d}.parquet")
        ) == mtime, "completed partitions must not be recomputed"

    a = _assignments(os.path.join(clean_dir, "assignments"))
    b = _assignments(os.path.join(crash_dir, "assignments"))
    pd.testing.assert_frame_equal(a, b)


def test_metrics_written(pages_tbl, tmp_path, ray_session):
    out = str(tmp_path / "m")
    run_dedup_checkpointed(ray.data.from_arrow(pages_tbl), out,
                           num_partitions=P)
    import pyarrow.parquet as pq

    mdir = os.path.join(out, "metrics")
    files = os.listdir(mdir)
    assert files
    m = pq.read_table(os.path.join(mdir, files[0])).to_pandas()
    assert set(m["stage"]) == {"extract_hash", "assignments"}
    by_stage = m.groupby("stage")["rows_in"].sum()
    assert by_stage["extract_hash"] == N_ROWS
    assert by_stage["assignments"] == N_ROWS
    assert (m["wall_s"] > 0).all()
    # error rows accounted in lineage (corpus plants ~1% error rows)
    assert m[m["stage"] == "extract_hash"]["errors"].sum() >= 1


def test_checkpointed_write_skips_done(pages_tbl, tmp_path, ray_session):
    from deduplicator_go_ray.stages.exact import add_content_key
    from deduplicator_go_ray.stages.extract import ExtractStage

    ds = ray.data.from_arrow(pages_tbl).map_batches(
        lambda b: ExtractStage()(b), batch_format="pyarrow")
    hashed = add_content_key(ds)
    out = str(tmp_path / "w")
    m1 = checkpointed_write(hashed, out, P, stage="s")
    assert len(m1) == P
    m2 = checkpointed_write(hashed, out, P, stage="s")
    assert len(m2) == 0, "second run writes nothing (all partitions done)"


def test_incremental_hash(pages_tbl, tmp_path, ray_session):
    """≙ unchanged-skip + --retry-problematic + --force semantics
    (files/process.go, files/hash.go:18-35)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from deduplicator_go_ray.state.checkpoint import incremental_hash

    out = str(tmp_path / "inc")
    first = pages_tbl.slice(0, 200)
    rest = pages_tbl.slice(200, 100)

    m1 = incremental_hash(ray.data.from_arrow(first), out, num_partitions=P)
    assert m1["rows_in"].sum() == 200

    # re-run with the same input: everything skipped
    m2 = incremental_hash(ray.data.from_arrow(first), out, num_partitions=P)
    assert len(m2) == 0 or m2["rows_in"].sum() == 0

    # new rows only are processed; checkpoint becomes the union
    m3 = incremental_hash(ray.data.from_arrow(pages_tbl.slice(0, 300)), out,
                          num_partitions=P)
    hashed = pq.read_table(os.path.join(out, "hashed"))
    assert hashed.num_rows == 300
    assert len(set(hashed["url"].to_pylist())) == 300

    # error rows exist in the corpus → retry_errors re-processes exactly those
    n_err = sum(1 for e in hashed["error"].to_pylist() if e is not None)
    m4 = incremental_hash(ray.data.from_arrow(pages_tbl.slice(0, 300)), out,
                          num_partitions=P, retry_errors=True)
    if n_err:
        assert m4["rows_in"].sum() >= n_err
    hashed2 = pq.read_table(os.path.join(out, "hashed"))
    assert hashed2.num_rows == 300

    # force recomputes everything
    m5 = incremental_hash(ray.data.from_arrow(pages_tbl.slice(0, 300)), out,
                          num_partitions=P, force=True)
    assert m5["rows_in"].sum() == 300


def test_incremental_hash_renew(pages_tbl, tmp_path, ray_session):
    """≙ the 1-week last_hashed_at TTL (--renew, files/hash.go:31,236-238):
    rows whose processed_at stamp is older than the TTL re-enter the
    work set; fresh rows stay skipped."""
    import pyarrow.parquet as pq
    import ray.data

    from deduplicator_go_ray.state.checkpoint import incremental_hash

    out = str(tmp_path / "renew")
    first = pages_tbl.slice(0, 120)

    t0 = 1_000_000.0
    m1 = incremental_hash(ray.data.from_arrow(first), out,
                          num_partitions=P, _now=t0)
    assert m1["rows_in"].sum() == 120

    # within TTL: nothing recomputed
    m2 = incremental_hash(ray.data.from_arrow(first), out, num_partitions=P,
                          renew_older_than=3600.0, _now=t0 + 100)
    assert len(m2) == 0 or m2["rows_in"].sum() == 0

    # past TTL: everything stale → full recompute, new stamps, no dup rows
    m3 = incremental_hash(ray.data.from_arrow(first), out, num_partitions=P,
                          renew_older_than=3600.0, _now=t0 + 7200)
    assert m3["rows_in"].sum() == 120
    hashed = pq.read_table(os.path.join(out, "hashed"))
    assert hashed.num_rows == 120
    assert len(set(hashed["url"].to_pylist())) == 120
    stamps = set(hashed["processed_at"].to_pylist())
    assert stamps == {t0 + 7200}


def test_prune_checkpoint_liveness(pages_tbl, tmp_path, ray_session):
    """≙ the prune flow's liveness half (files/prune.go:122,175-204):
    checkpoint rows whose url vanished from the current listing are
    removed; only affected partitions are rewritten."""
    import pyarrow.parquet as pq
    import ray.data

    from deduplicator_go_ray.state.checkpoint import (incremental_hash,
                                                      prune_checkpoint)

    out = str(tmp_path / "prune")
    full = pages_tbl.slice(0, 150)
    incremental_hash(ray.data.from_arrow(full), out, num_partitions=P)

    # current listing: first 100 urls survive
    live = full.slice(0, 100)
    m = prune_checkpoint(out, ray.data.from_arrow(live))
    assert m["rows_in"].sum() >= m["rows_out"].sum()

    kept = pq.read_table(os.path.join(out, "hashed"))
    live_urls = set(live["url"].to_pylist())
    assert set(kept["url"].to_pylist()) == live_urls

    # idempotent: a second prune with the same listing rewrites nothing
    m2 = prune_checkpoint(out, ray.data.from_arrow(live))
    assert len(m2) == 0


def test_orphaned_tmp_files_never_surface(pages_tbl, tmp_path, ray_session):
    """A crash can strand a written-but-unrenamed tmp file.  It must be
    (a) invisible to read_checkpoint — dot-prefixed, outside parquet
    dataset discovery — and (b) swept by the next checkpointed_write,
    never surfacing as duplicate or corrupt rows on resume."""
    import pyarrow.parquet as pq

    from deduplicator_go_ray.state.checkpoint import (checkpointed_write,
                                                      read_checkpoint)

    out = str(tmp_path / "ckpt")
    ds = ray.data.from_arrow(pages_tbl)
    checkpointed_write(ds, out, num_partitions=P, stage="t")
    n = read_checkpoint(out).count()
    assert n == pages_tbl.num_rows

    # plant both orphan shapes: a COMPLETE unrenamed tmp (duplicate
    # rows if ever read) and a truncated one (parse error if ever read)
    dup = pq.read_table(os.path.join(out, "part-00000.parquet"))
    pq.write_table(dup, os.path.join(out, ".part-00000.tmp.99999"))
    with open(os.path.join(out, ".part-00001.tmp.99998"), "wb") as f:
        f.write(b"PAR1garbage")
    assert read_checkpoint(out).count() == n          # invisible
    checkpointed_write(ds, out, num_partitions=P, stage="t")   # resume
    assert not [x for x in os.listdir(out) if ".tmp." in x]    # swept
    assert read_checkpoint(out).count() == n

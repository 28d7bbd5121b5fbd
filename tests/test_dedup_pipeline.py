"""End-to-end dedup pipeline conformance (SURVEY.md §5 transplant):
recall vs planted truth, keeper determinism, same-hash-different-size
split, sentinel exclusion."""

import numpy as np
import pytest
import ray.data as rd

from deduplicator_go_ray.config import KeeperPolicy, PipelineConfig
from deduplicator_go_ray.pipelines.dedup import run_dedup
from deduplicator_go_ray.sources.corpus import generate_pages

N_ROWS = 600


@pytest.fixture(scope="module")
def corpus():
    return generate_pages(N_ROWS, seed=42)


@pytest.fixture(scope="module")
def result(corpus):
    pages_tbl, truth = corpus
    out = run_dedup(rd.from_arrow(pages_tbl)).to_pandas()
    return out, truth.to_pandas()


def test_row_conservation(result):
    out, _ = result
    assert len(out) == N_ROWS
    assert out.url.nunique() == N_ROWS


def test_recall_on_planted_truth(result):
    out, tdf = result
    cl = dict(zip(out.url, out.cluster_id))
    den = tdf[tdf.relation.isin(["exact", "near_high", "substring"])]
    rec = sum(1 for _, r in den.iterrows() if cl[r.url_a] == cl[r.url_b])
    assert rec / len(den) >= 0.99


def test_same_size_different_content_split(result):
    """≙ same-hash-different-size guard (duplicates_scenarios_test.go:60-100)."""
    out, tdf = result
    cl = dict(zip(out.url, out.cluster_id))
    guard = tdf[tdf.relation == "nondup_size_guard"]
    assert len(guard) == 4
    for _, r in guard.iterrows():
        assert cl[r.url_a] != cl[r.url_b]


def test_error_rows_in_band(result):
    """Sentinel rows flow through as self-clusters (files/hash.go:245-264)."""
    out, _ = result
    errs = out[out.match_kind == "error"]
    assert len(errs) >= 1
    assert (errs.action == "keep").all()
    assert (errs.is_keeper).all()


def test_keeper_is_cluster_minimum(result):
    """Keeper = min(url) per cluster — pure function of group content
    (files/move.go:226-236)."""
    out, _ = result
    mins = out.groupby("cluster_id").url.min()
    assert (out.keeper_url == out.cluster_id.map(mins)).all()
    keepers = out[out.is_keeper]
    assert (keepers.url == keepers.keeper_url).all()


def test_actions_consistent(result):
    out, _ = result
    assert set(out.action) <= {"keep", "drop"}
    # exactly one keeper per cluster under the deterministic policy
    per = out.groupby("cluster_id").is_keeper.sum()
    assert (per == 1).all()


def test_partition_count_invariance(corpus):
    """Same assignments at different parallelism/partitioning
    (the N-vs-4N determinism invariant, BASELINE.md §3)."""
    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    a = run_dedup(rd.from_arrow(small)).to_pandas()
    b = run_dedup(rd.from_arrow(small).repartition(7)).to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action"]:
        assert (a[col] == b[col]).all(), col


def test_keeper_policies_pure():
    """site_popularity / priority_limits policies on a hand-made group."""
    import pandas as pd

    from deduplicator_go_ray.stages.keeper import select_keepers

    g = pd.DataFrame({
        "url": [
            "https://a.example/1", "https://a.example/2",
            "https://b.example/1",
        ]
    })
    det = select_keepers(g.sample(frac=1, random_state=3), KeeperPolicy())
    assert det[det.is_keeper].url.iloc[0] == "https://a.example/1"

    pop = select_keepers(g, KeeperPolicy(policy="site_popularity"))
    assert pop[pop.is_keeper].url.iloc[0] == "https://a.example/1"  # a.example has 2

    pri = select_keepers(
        g,
        KeeperPolicy(policy="priority_limits", min_copies=2,
                     site_priority={"b.example": 0, "a.example": 1}),
    )
    kept = set(pri[pri.action == "keep"].url)
    assert kept == {"https://b.example/1", "https://a.example/1"}


def test_pipeline_with_alternate_keeper_policies(corpus):
    """Policies D2/D4 through the FULL pipeline (not just the unit
    helper): cluster membership identical to the default run; only
    keeper/action assignments differ by policy."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()

    pop = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(keeper=KeeperPolicy(policy="site_popularity")),
    ).to_pandas()
    pri = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(keeper=KeeperPolicy(policy="priority_limits",
                                           min_copies=2)),
    ).to_pandas()

    for other in (pop, pri):
        a = base.sort_values("url").reset_index(drop=True)
        b = other.sort_values("url").reset_index(drop=True)
        # same clustering regardless of keeper policy
        assert (a["cluster_id"] == b["cluster_id"]).all()
        # exactly one keeper per cluster for site_popularity;
        # priority_limits keeps up to min_copies members
    assert (pop.groupby("cluster_id")["is_keeper"].sum() == 1).all()
    kept = pri[pri["action"] == "keep"].groupby("cluster_id").size()
    sizes = pri.groupby("cluster_id").size()
    assert (kept <= np.maximum(2, 1)).all() or (kept <= sizes[kept.index]).all()
    multi = sizes[sizes >= 2].index
    assert (kept[multi] == 2).all(), "min_copies=2 keeps two members"


def test_presalted_hot_band_path_same_assignments(corpus):
    """The at-scale branch (hot-band pre-count + salting, taken when
    band rows exceed presalt_min_band_rows) must produce the same
    assignments as the fused default path."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    forced = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(presalt_min_band_rows=1),   # force the presalt branch
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = forced.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action"]:
        assert (a[col] == b[col]).all(), col


def test_flood_verify_partitioned_same_assignments(corpus):
    """VERDICT r1 #1: the size-aware verification fallback.  Forcing
    smallset_max_edges=0 routes EVERY candidate through the
    hash-partitioned attach-verify (no broadcast signature/text index);
    assignments must be byte-identical to the broadcast plan."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    flood = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(smallset_max_edges=0),      # force the flood path
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = flood.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_flood_verify_no_endpoint_filter_same_assignments(corpus):
    """The TRUE-flood twin: above verify_semifilter_max_edges the
    partitioned verify ships the whole payload tables (no endpoint
    semi-filter).  Forcing both gates to 0 must still produce
    byte-identical assignments."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    flood = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(smallset_max_edges=0,
                       verify_semifilter_max_edges=0),
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = flood.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_cc_tiers_same_assignments(corpus):
    """The three component-resolution tiers (driver kernel, one-task
    kernel, distributed star loop) must be assignment-identical through
    the full pipeline."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    onetask = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(driver_dsu_max_edges=0),
    ).to_pandas()
    dist = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(driver_dsu_max_edges=0, onetask_cc_max_edges=0),
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    for other in (onetask, dist):
        b = other.sort_values("url").reset_index(drop=True)
        for col in ["url", "cluster_id", "keeper_url", "is_keeper",
                    "action", "match_kind"]:
            assert (a[col] == b[col]).all(), col


def test_semifilter_verify_same_assignments(corpus):
    """The direct-refs verify plan (default at small rep counts: score
    straight against the materialized sigs/reps block refs) and the
    semi-filter + broadcast plan must produce byte-identical
    assignments.  verify_direct_max_bytes=0 forces the semi-filter."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    semi = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(verify_direct_max_bytes=0),  # force semi-filter
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = semi.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_texts_through_shuffle_same_assignments(corpus):
    """VERDICT r1 #2: above broadcast_max_reps the rep texts ride the
    exact packed shuffle instead of a broadcast uid semi-filter —
    no O(n_reps) structure anywhere.  Same assignments either way."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    big = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(broadcast_max_reps=0),      # force the shuffle path
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = big.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_uid128_same_assignments(corpus):
    """VERDICT r1 #10: the widened 16-byte uid mode must produce the
    same clusters/keepers as the default int64 mode (cluster ids are
    content-derived, never internal uid labels, so the widths agree
    bit-for-bit)."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    wide = run_dedup(
        rd.from_arrow(small), PipelineConfig(uid_bits=128),
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = wide.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_uid_width_auto_switch_straddles_boundary(corpus):
    """VERDICT r3 #1: with uid_bits unset the width self-selects from
    the rep count at plan time.  A fixture straddling the
    uid_auto_threshold boundary (threshold pushed down so this corpus
    sits above it) must auto-pick 128 and still produce assignments
    byte-identical to both explicit widths; the same corpus below the
    threshold auto-picks 64."""
    import ray.data as rd

    from deduplicator_go_ray.config import PipelineConfig as PC

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    # sanity on the resolver itself
    auto = PC()
    assert auto.uid_bits is None
    assert auto.resolved_uid_bits(auto.uid_auto_threshold - 1) == 64
    assert auto.resolved_uid_bits(auto.uid_auto_threshold) == 128
    assert PC(uid_bits=64).resolved_uid_bits(10**12) == 64  # explicit wins

    base = run_dedup(rd.from_arrow(small)).to_pandas()
    # above-threshold side of the boundary: auto resolves to 128
    wide = run_dedup(rd.from_arrow(small),
                     PC(uid_auto_threshold=10)).to_pandas()
    # below-threshold side: auto resolves to 64 (the default run above
    # already IS this plan — assert all three agree)
    narrow = run_dedup(rd.from_arrow(small),
                       PC(uid_auto_threshold=10**9)).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    for got in (wide, narrow):
        b = got.sort_values("url").reset_index(drop=True)
        for col in ["url", "cluster_id", "keeper_url", "is_keeper",
                    "action", "match_kind"]:
            assert (a[col] == b[col]).all(), col


def test_uid_width_primitives():
    from deduplicator_go_ray.stages.buckets import uid_arrow, uid_np, uid_of_urls

    urls = [f"https://e{i}.com/{i}" for i in range(100)]
    u64 = uid_of_urls(urls, 64)
    u128 = uid_of_urls(urls, 128)
    assert u64.dtype == np.int64 and len(set(u64.tolist())) == 100
    assert all(isinstance(b, bytes) and len(b) == 16 for b in u128)
    assert len(set(u128.tolist())) == 100
    # arrow round-trip preserves full 16-byte values (incl. NUL tails)
    arr = uid_arrow(u128)
    back = uid_np(arr, 128)
    assert (back == u128).all()
    # determinism
    assert (uid_of_urls(urls, 128) == u128).all()


def test_sig_store_same_assignments(corpus, tmp_path):
    """cfg.sig_store_dir must be invisible in the output: the cold run
    (store empty, everything computed) and the warm run (every content
    key re-used from the store, zero kernel rows) both produce the
    baseline's byte-identical assignments."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    store = str(tmp_path / "sigstore")
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    cold = run_dedup(rd.from_arrow(small),
                     PipelineConfig(sig_store_dir=store)).to_pandas()
    warm = run_dedup(rd.from_arrow(small),
                     PipelineConfig(sig_store_dir=store)).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    for got in (cold, warm):
        b = got.sort_values("url").reset_index(drop=True)
        for col in ["url", "cluster_id", "keeper_url", "is_keeper",
                    "action", "match_kind"]:
            assert (a[col] == b[col]).all(), col


def test_uid128_with_sig_store_same_assignments(corpus, tmp_path):
    """Mechanism combination: the content-keyed signature store is
    uid-width-independent — a warm 128-bit-uid run (every signature
    re-used from a store written by a 128-bit cold run) matches the
    default-mode baseline byte-for-byte."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    store = str(tmp_path / "sigstore128")
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    cfg = PipelineConfig(uid_bits=128, sig_store_dir=store)
    run_dedup(rd.from_arrow(small), cfg).to_pandas()          # cold
    warm = run_dedup(rd.from_arrow(small), cfg).to_pandas()   # warm
    a = base.sort_values("url").reset_index(drop=True)
    b = warm.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_empty_and_all_error_corpus(ray_session):
    # the empty-corpus early exit previously referenced an undefined
    # _finish (NameError) — pin both degenerate paths end to end
    import pyarrow as pa

    from deduplicator_go_ray.sources.corpus import generate_pages

    pages_tbl, _ = generate_pages(40, seed=7)
    pages_tbl = pages_tbl.slice(0, 4)
    empty = pages_tbl.slice(0, 0)
    ds = run_dedup(rd.from_arrow(empty))
    assert ds.count() == 0
    # assert on the Dataset schema: Ray's to_pandas drops columns on a
    # fully-empty dataset
    names = set(ds.schema().names)
    assert names >= {"url", "cluster_id", "keeper_url",
                     "action", "match_kind", "partition_id"}

    # all-error corpus: html=None rows fail extraction -> error band
    bad = pages_tbl.set_column(
        pages_tbl.schema.get_field_index("html"), "html",
        pa.array([None] * 4, pa.binary()))
    out2 = run_dedup(rd.from_arrow(bad)).to_pandas()
    assert len(out2) == 4
    assert (out2["match_kind"] == "error").all()
    assert (out2["action"] == "keep").all()


def test_pluggable_extractor_slot(corpus):
    """VERDICT r3 #5: a user extractor rides the extract stage via
    cfg.extractor=(name, factory) without touching pipeline code.  A
    factory wrapping the deterministic kernel reproduces the baseline
    byte-for-byte; a genuinely different extractor visibly changes the
    flagship's grouping input (proof the slot is live), and the
    factory runs on the WORKERS (once per process), not the driver."""
    import ray.data as rd

    from deduplicator_go_ray.config import PipelineConfig as PC
    from deduplicator_go_ray.functions.text import extract_text

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 120)
    base = run_dedup(rd.from_arrow(small)).to_pandas()

    driver_calls = []

    def wrapping_factory():
        driver_calls.append(1)   # never appended on the DRIVER process
        return extract_text

    same = run_dedup(
        rd.from_arrow(small),
        PC(extractor=("wrapped-deterministic", wrapping_factory)),
    ).to_pandas()
    assert not driver_calls   # factory ran in workers only
    a = base.sort_values("url").reset_index(drop=True)
    b = same.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col

    # a constant-text extractor collapses every ok row into one exact
    # cluster — only possible if the custom callable actually ran
    def constant_factory():
        return lambda html: ("the same extracted text for every page", None)

    allsame = run_dedup(
        rd.from_arrow(small), PC(extractor=("constant", constant_factory)),
    ).to_pandas()
    ok = allsame[allsame["match_kind"] != "error"]
    assert ok["cluster_id"].nunique() == 1

    # actor-pool plan takes the same slot via fn_constructor_kwargs
    pool = run_dedup(
        rd.from_arrow(small),
        PC(extractor=("constant", constant_factory),
           signature_concurrency=2),
    ).to_pandas()
    okp = pool[pool["match_kind"] != "error"]
    assert okp["cluster_id"].nunique() == 1

    # config validation fails loudly on a malformed slot
    import pytest as _pytest
    with _pytest.raises(ValueError, match="extractor"):
        PC(extractor=("missing-factory",))


def test_flood_verify_with_uid128_same_assignments(corpus):
    """Mechanism combination for the r4 endpoint-task path: the flood
    (partitioned) verify with 16-byte uids — endpoint arrays are numpy
    OBJECT arrays there, probed via np.isin instead of searchsorted —
    must still match the baseline byte-for-byte."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    flood128 = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(uid_bits=128, smallset_max_edges=0),
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = flood128.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_mixed_verify_routing_same_assignments(corpus):
    """r4 per-kind verify routing: with smallset_max_edges between the
    anchor count (9 on this fixture) and the total candidate count
    (65), the near verify floods while the containment verify
    self-selects its broadcast smallset plan — assignments must match
    the baseline byte-for-byte (and the all-flood twin at gate 0
    stays covered by test_flood_verify_partitioned_same_assignments)."""
    import ray.data as rd

    pages_tbl, _ = corpus
    small = pages_tbl.slice(0, 250)
    base = run_dedup(rd.from_arrow(small)).to_pandas()
    mixed = run_dedup(
        rd.from_arrow(small),
        PipelineConfig(smallset_max_edges=30),
    ).to_pandas()
    a = base.sort_values("url").reset_index(drop=True)
    b = mixed.sort_values("url").reset_index(drop=True)
    for col in ["url", "cluster_id", "keeper_url", "is_keeper", "action",
                "match_kind"]:
        assert (a[col] == b[col]).all(), col


def test_pathological_page_times_out_in_band(corpus):
    """The extraction watchdog is ON BY DEFAULT (config
    extract_timeout_s=60 ≙ files/files.go:33; VERDICT r4 wrong #4): a
    planted page whose extraction hangs becomes a TIMEOUT_ERROR
    sentinel self-cluster instead of stalling its worker.  The rest of
    the corpus dedups normally."""
    import time

    import pyarrow as pa

    assert PipelineConfig().extract_timeout_s == 60.0

    pages_tbl, _ = corpus
    marker = pa.table({
        "url": ["https://pathological.example/hang"],
        "warc_ts": pages_tbl["warc_ts"][:1],
        "html": [b"<html>HANG-MARKER</html>"],
        "lang": ["en"],
    })
    sub = pa.concat_tables(
        [pages_tbl.select(marker.column_names).slice(0, 60), marker])

    def hang_factory():
        from deduplicator_go_ray.functions.text import extract_text

        def fn(html):
            if b"HANG-MARKER" in html:
                time.sleep(30)
            return extract_text(html)
        return fn

    cfg = PipelineConfig(extractor=("hang-test", hang_factory),
                         extract_timeout_s=0.5)
    t0 = time.monotonic()
    out = run_dedup(rd.from_arrow(sub), cfg).to_pandas()
    assert time.monotonic() - t0 < 25          # did not wait out the hang
    row = out[out.url == "https://pathological.example/hang"]
    assert len(row) == 1
    assert (row.match_kind == "error").all()   # in-band sentinel row
    assert (row.action == "keep").all()
    assert len(out) == 61                      # every row accounted for

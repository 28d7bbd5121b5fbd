"""Fused bucket-shuffle unit tests: kind multiplexing, bounded emission,
partition invariance, uid verification paths."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from deduplicator_go_ray.config import LSHConfig, MinHashConfig, SimHashConfig
from deduplicator_go_ray.stages.buckets import (
    KIND_ANCHOR, KIND_BAND, KIND_SIMHASH, bucket_rows, candidate_edges_fused,
    uid_of_urls, verify_near_edges)
from deduplicator_go_ray.stages.signatures import SignatureStage


def _sigs(texts: dict[str, str], ray_on) -> "ray.data.Dataset":
    tbl = pa.table({
        "url": pa.array(list(texts), pa.string()),
        "text": pa.array(list(texts.values()), pa.string()),
        "n_bytes": pa.array([len(t.encode()) for t in texts.values()], pa.int64()),
    })
    st = SignatureStage()
    return ray.data.from_arrow(st(tbl)).map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow").materialize()


@pytest.fixture(scope="module")
def small_sigs(ray_session):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 6)
    texts = {
        "a": base,
        "b": base,                                  # exact near pair with a
        "c": base.replace("gamma", "GAMMA", 1),     # near pair (1 token edit)
        "d": "completely different text about nothing at all " * 12,
        "e": "short doc",                           # too short for anchors
    }
    return _sigs(texts, ray_session)


def test_bucket_rows_kinds(small_sigs):
    rows = bucket_rows(small_sigs, MinHashConfig(), SimHashConfig(),
                       with_anchors=True).to_pandas()
    kinds = set(rows["kind"])
    assert {KIND_BAND, KIND_SIMHASH, KIND_ANCHOR} <= kinds
    cfg = MinHashConfig()
    per_doc_bands = rows[rows["kind"] == KIND_BAND].groupby("uid").size()
    assert (per_doc_bands == cfg.bands).all()
    per_doc_chunks = rows[rows["kind"] == KIND_SIMHASH].groupby("uid").size()
    assert (per_doc_chunks == 4).all()              # 64 / 16-bit chunks
    # exactly one min-anchor flag per doc that has anchors
    anc = rows[rows["kind"] == KIND_ANCHOR]
    assert (anc.groupby("uid")["flag"].sum() >= 1).all()


def test_fused_edges_find_planted_pairs(small_sigs):
    rows = bucket_rows(small_sigs, MinHashConfig(), SimHashConfig(),
                       with_anchors=True)
    edges = candidate_edges_fused(rows, LSHConfig(), 3).materialize()
    verified = verify_near_edges(edges.filter(expr=f"kind != {KIND_ANCHOR}"),
                                 small_sigs, MinHashConfig()).to_pandas()
    ua, ub, uc = uid_of_urls(["a", "b", "c"])
    got = {(min(u, v), max(u, v)) for u, v in zip(verified["u"], verified["v"])}
    assert (min(ua, ub), max(ua, ub)) in got
    assert (min(ua, uc), max(ua, uc)) in got


def test_fused_edges_partition_invariant(small_sigs):
    rows = bucket_rows(small_sigs, MinHashConfig(), SimHashConfig(),
                       with_anchors=True).materialize()

    def canon(ds):
        df = candidate_edges_fused(ds, LSHConfig(), 3).to_pandas()
        return (df.assign(a=np.minimum(df.u, df.v), b=np.maximum(df.u, df.v))
                [["a", "b", "kind"]].drop_duplicates()
                .sort_values(["a", "b", "kind"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(canon(rows), canon(rows.repartition(5)))


def test_hot_bucket_bounded_emission(ray_session):
    # one shared band bucket with many members must emit O(n) chain
    # edges, not O(n^2) cliques
    n = 600
    tbl = pa.table({
        "key": pa.array([42] * n, pa.int64()),
        "kind": pa.array([KIND_BAND] * n, pa.int8()),
        "uid": pa.array(np.arange(n), pa.int64()),
        "payload": pa.array(np.zeros(n), pa.int64()),
        "flag": pa.array([False] * n, pa.bool_()),
    })
    lsh = LSHConfig(group_cap=512)
    edges = candidate_edges_fused(ray.data.from_arrow(tbl), lsh, 3).to_pandas()
    # chain-only for a hot bucket: exactly n-1 edges
    assert len(edges) == n - 1
    # connectivity: the chain spans all members (single component)
    from deduplicator_go_ray.stages.cluster import connected_components_driver

    mapping = connected_components_driver(
        list(zip(edges["u"].tolist(), edges["v"].tolist())))
    assert len(set(mapping.values())) == 1
    assert len(mapping) == n


def test_uid_stability():
    a = uid_of_urls(["x", "y", "z"])
    b = uid_of_urls(["x", "y", "z"])
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 3


def test_prebuilt_index_verify_equals_inline_plans(small_sigs):
    """The speculative prebuilt verify index (launched early to overlap
    the candidate shuffle) must yield edge sets identical to both the
    inline direct-refs build and the semi-filtered plan."""
    from deduplicator_go_ray.stages.buckets import prebuild_direct_index

    rows = bucket_rows(small_sigs, MinHashConfig(), SimHashConfig(),
                       with_anchors=True)
    edges = (candidate_edges_fused(rows, LSHConfig(), 3)
             .filter(expr=f"kind != {KIND_ANCHOR}").materialize())
    cfg = MinHashConfig()

    def canon(ds):
        df = ds.to_pandas()
        return (df.assign(a=np.minimum(df.u, df.v), b=np.maximum(df.u, df.v))
                [["a", "b"]].drop_duplicates()
                .sort_values(["a", "b"]).reset_index(drop=True))

    pre = prebuild_direct_index(small_sigs, "minhash", cfg.num_perms)
    via_prebuilt = canon(verify_near_edges(
        edges, small_sigs, cfg, direct_refs=True, prebuilt=pre))
    via_direct = canon(verify_near_edges(
        edges, small_sigs, cfg, direct_refs=True))
    via_semi = canon(verify_near_edges(edges, small_sigs, cfg))
    pd.testing.assert_frame_equal(via_prebuilt, via_direct)
    pd.testing.assert_frame_equal(via_prebuilt, via_semi)


def test_simhash_pair_emission_equals_naive(ray_session):
    """The size-class-vectorized SimHash pair emission (LUT popcount,
    no per-key loop) must produce the exact edge set of the naive
    per-key 64-shift Hamming loop on dense random buckets."""
    import ray.data

    from deduplicator_go_ray.stages.buckets import (KIND_SIMHASH,
                                                    candidate_edges_fused)

    rng = np.random.default_rng(4)
    n, thr = 3000, 6
    base = rng.integers(0, 2**63, 40, dtype=np.int64)
    pay = base[rng.integers(0, 40, n)].view(np.uint64)
    flips = ((np.uint64(1) << rng.integers(0, 64, n).astype(np.uint64))
             * (rng.random(n) < 0.7))
    tbl = pa.table({
        "key": pa.array(rng.integers(0, 150, n), pa.int64()),
        "kind": pa.array(np.full(n, KIND_SIMHASH, np.int8), pa.int8()),
        "uid": pa.array(rng.permutation(n).astype(np.int64), pa.int64()),
        "payload": pa.array((pay ^ flips.astype(np.uint64)).view(np.int64),
                            pa.int64()),
        "flag": pa.array(np.zeros(n, bool), pa.bool_()),
    })
    got = candidate_edges_fused(ray.data.from_arrow(tbl), LSHConfig(),
                                thr).to_pandas()
    got_set = set(zip(got["u"].tolist(), got["v"].tolist()))

    df = tbl.to_pandas().drop_duplicates(["key", "uid"])
    cnt = df.groupby("key")["uid"].transform("size")
    df = df[(cnt > 1) & (cnt <= 512)]
    exp = set()
    for _, g in df.groupby("key", sort=False):
        uids = g["uid"].to_numpy()
        order = np.argsort(uids, kind="stable")
        uids = uids[order]
        sh = g["payload"].to_numpy()[order].view(np.uint64)
        xor = sh[:, None] ^ sh[None, :]
        hd = np.zeros_like(xor, dtype=np.int64)
        for s in range(64):
            hd += ((xor >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
        iu, jv = np.nonzero(np.triu(hd <= thr, k=1))
        exp |= set(zip(uids[iu].tolist(), uids[jv].tolist()))
    assert len(exp) > 500          # dense enough to be a real check
    assert got_set == exp


def test_attach_payload_partitioned_arrow_join(ray_session):
    """The int64 Arrow fast-path of the flood-verify payload join must
    equal a plain pandas inner merge: missing endpoints drop, each edge
    row gets its endpoint's payload, edge columns ride unchanged."""
    from deduplicator_go_ray.stages.buckets import _attach_payload_partitioned

    rng = np.random.default_rng(7)
    n_pay, n_edge = 200, 500
    uids = rng.choice(10_000, size=n_pay, replace=False).astype(np.int64)
    vals = [bytes(rng.integers(0, 256, 16, dtype=np.uint8).tobytes())
            for _ in range(n_pay)]
    payload = ray.data.from_arrow(pa.table({
        "uid": pa.array(uids, pa.int64()),
        "value": pa.array(vals, pa.binary(16)),
    }))
    u = rng.choice(12_000, n_edge).astype(np.int64)   # ~1/6 miss
    v = rng.choice(12_000, n_edge).astype(np.int64)
    kind = rng.integers(0, 3, n_edge).astype(np.int8)
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
        "kind": pa.array(kind, pa.int8()),
    }))
    int_cols = {"u": pa.int64(), "v": pa.int64(), "kind": pa.int8()}
    got = _attach_payload_partitioned(
        edges, payload, "u", "sig_u", num_partitions=8,
        int_cols=int_cols, out_type=pa.binary(16)).to_pandas()

    exp = (pd.DataFrame({"u": u, "v": v, "kind": kind})
           .merge(pd.DataFrame({"u": uids, "sig_u": vals}),
                  on="u", how="inner"))
    key = ["u", "v", "kind", "sig_u"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    exp_s = exp[key].sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) > 0
    pd.testing.assert_frame_equal(
        got_s, exp_s, check_dtype=False)


def test_attach_payload_partitioned_edge_only_partitions(ray_session):
    """Partitions that receive edges but NO payload rows (endpoint
    absent from the payload table) must contribute zero rows, not
    crash: 2 payload uids + 64 partitions leaves most partitions
    edge-only."""
    from deduplicator_go_ray.stages.buckets import _attach_payload_partitioned

    rng = np.random.default_rng(11)
    uids = np.array([5, 9], dtype=np.int64)
    payload = ray.data.from_arrow(pa.table({
        "uid": pa.array(uids, pa.int64()),
        "value": pa.array([b"A" * 16, b"B" * 16], pa.binary(16)),
    }))
    u = rng.choice(12_000, 300).astype(np.int64)
    u[:3] = [5, 9, 5]                       # a few real hits
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array(u, pa.int64()),
        "v": pa.array(rng.choice(12_000, 300).astype(np.int64), pa.int64()),
        "kind": pa.array(np.zeros(300, np.int8), pa.int8()),
    }))
    int_cols = {"u": pa.int64(), "v": pa.int64(), "kind": pa.int8()}
    got = _attach_payload_partitioned(
        edges, payload, "u", "sig_u", num_partitions=64,
        int_cols=int_cols, out_type=pa.binary(16)).to_pandas()
    n_hits = int((u == 5).sum() + (u == 9).sum())
    assert len(got) == n_hits
    assert set(got.loc[got["u"] == 5, "sig_u"]) == {b"A" * 16}
    assert set(got.loc[got["u"] == 9, "sig_u"]) == {b"B" * 16}

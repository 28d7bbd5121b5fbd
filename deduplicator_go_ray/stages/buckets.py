"""Fused candidate-bucket shuffle: LSH bands + SimHash chunks +
substring anchors in ONE groupby.

Three separate bucket shuffles (bands, simhash chunks, anchors) each pay
a full sort-shuffle round; their keys and semantics differ but their
*shape* is identical — (bucket_key, member, small payload) rows reduced
per bucket into candidate edges.  Fusing them:

* one shuffle instead of three (the dominant fixed+volume cost of the
  candidate phase);
* rows are SKINNY INT64s: documents are keyed by ``uid`` (64-bit hash
  of the url) instead of the url string — ~5× less shuffle volume and
  numpy-sortable inside the reducers.  uid→url resolution happens once
  at the end of the pipeline (collision probability n²/2⁶⁴; the
  tradeoff is documented in the uid helper).

Row layout: (key: i64, kind: i8, uid: i64, payload: i64, flag: bool)
  kind 0 = LSH band   — payload unused; emission: sorted chain + star
                         (star only under the group cap; hot buckets
                         chain-only — same policy as stages.lsh)
  kind 1 = simhash    — payload = simhash bits; emission: in-bucket
                         Hamming-verified pairs
  kind 2 = anchor     — payload = n_bytes, flag = is-min-anchor;
                         emission: shorts × longs containment candidates

Output: (u: i64, v: i64, kind: i8) candidate edges, deduplicated within
partition.  Every reducer decision is a pure function of its bucket —
the partition-count-invariance contract (files/move.go:226-236).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import LSHConfig, MinHashConfig, SimHashConfig
from ..functions.hashing import combine64, hash64_str, mix64
from .common import grouped_apply

KIND_BAND = 0
KIND_SIMHASH = 1
KIND_ANCHOR = 2


def uid_of_urls(urls: list[str]) -> np.ndarray:
    """64-bit doc uid (int64 bit-view of blake2b-64).  At n documents
    the chance of ANY collision is ~n²/2⁶⁵ — negligible below ~10^8
    docs per job; a collision would spuriously merge two clusters.  For
    larger single jobs switch the uid to 2×64 bits (and widen the edge
    schema) — the shuffle stays integer-keyed either way."""
    return hash64_str(urls, seed=3).view(np.int64)


def bucket_rows(
    sigs: "ray.data.Dataset",
    minhash: MinHashConfig,
    simhash: SimHashConfig | None,
    with_anchors: bool,
    chunk_bits: int = 16,
) -> "ray.data.Dataset":
    # chunk_bits=16 → 4 chunks: pigeonhole guarantee for hamming ≤ 3 and
    # ~2^16 values per chunk slot, so buckets stay small even at 10^6+
    # docs (8-bit chunks collapse into a few hundred giant buckets that
    # the group cap then drops — zero recall AND wasted shuffle)
    """Explode one signature row into all of its bucket rows."""
    b, r = minhash.bands, minhash.rows
    n_chunks = 64 // chunk_bits
    mask = np.uint64((1 << chunk_bits) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        empty = pa.table({
            "key": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int8()),
            "uid": pa.array([], pa.int64()),
            "payload": pa.array([], pa.int64()),
            "flag": pa.array([], pa.bool_()),
        })
        if n == 0:
            return empty
        urls = batch["url"].to_pylist()
        uid = uid_of_urls(urls)
        ns = np.asarray(batch["n_shingles"], dtype=np.int64)
        keep = ns > 0
        keys_out: list[np.ndarray] = []
        kind_out: list[np.ndarray] = []
        uid_out: list[np.ndarray] = []
        pay_out: list[np.ndarray] = []
        flag_out: list[np.ndarray] = []

        kn = int(keep.sum())
        if kn:
            sig = np.asarray(batch["minhash"].combine_chunks().flatten()
                             ).reshape(n, b, r)[keep]
            bkeys = combine64(sig, axis=2)                       # (kn, b)
            bkeys = mix64(bkeys + (np.arange(b, dtype=np.uint64) << np.uint64(1))[None, :])
            keys_out.append(bkeys.reshape(-1).view(np.int64))
            kind_out.append(np.zeros(kn * b, dtype=np.int8))
            uid_out.append(np.repeat(uid[keep], b))
            pay_out.append(np.zeros(kn * b, dtype=np.int64))
            flag_out.append(np.zeros(kn * b, dtype=bool))

            if simhash is not None:
                sh = np.asarray(batch["simhash"], dtype=np.uint64)[keep]
                for c in range(n_chunks):
                    cv = (sh >> np.uint64(c * chunk_bits)) & mask
                    key = ((cv << np.uint64(3)) | np.uint64(c)).astype(np.int64)
                    keys_out.append(key)
                    kind_out.append(np.full(kn, KIND_SIMHASH, dtype=np.int8))
                    uid_out.append(uid[keep])
                    pay_out.append(sh.view(np.int64))
                    flag_out.append(np.zeros(kn, dtype=bool))

        if with_anchors and "anchors" in batch.column_names:
            # vectorized list-column explode: flatten + reduceat over the
            # list offsets — no Python loop over documents
            la = batch["anchors"].combine_chunks()
            flat = np.asarray(la.flatten(), dtype=np.int64)
            offs = np.asarray(la.offsets, dtype=np.int64)
            lens = np.diff(offs)
            nz = lens > 0
            if flat.size:
                starts = offs[:-1][nz]
                mins = np.minimum.reduceat(flat, starts)
                nb = np.asarray(batch["n_bytes"], dtype=np.int64)
                keys_out.append(flat)
                kind_out.append(np.full(flat.size, KIND_ANCHOR, dtype=np.int8))
                uid_out.append(np.repeat(uid, lens))
                pay_out.append(np.repeat(nb, lens))
                flag_out.append(flat == np.repeat(mins, lens[nz]))

        if not keys_out:
            return empty
        return pa.table({
            "key": pa.array(np.concatenate(keys_out), pa.int64()),
            "kind": pa.array(np.concatenate(kind_out), pa.int8()),
            "uid": pa.array(np.concatenate(uid_out), pa.int64()),
            "payload": pa.array(np.concatenate(pay_out), pa.int64()),
            "flag": pa.array(np.concatenate(flag_out), pa.bool_()),
        })

    return sigs.map_batches(explode, batch_format="pyarrow")


def _edge_uid_set(edges: "ray.data.Dataset") -> np.ndarray:
    uids: list[np.ndarray] = []
    for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        uids.append(np.asarray(b["u"], dtype=np.int64))
        uids.append(np.asarray(b["v"], dtype=np.int64))
    return (np.unique(np.concatenate(uids)) if uids
            else np.empty(0, dtype=np.int64))


def _semi_filter_by_uid(ds: "ray.data.Dataset", uid_sorted: np.ndarray,
                        columns: list[str]) -> "ray.data.Dataset":
    """Keep rows whose uid(url) is in the (broadcast, sorted) id array —
    vectorized np.isin per batch, no shuffle."""
    import ray as _ray

    ref = _ray.put(uid_sorted)

    def f(batch: pa.Table) -> pa.Table:
        ids = _ray.get(ref)
        uid = uid_of_urls(batch["url"].to_pylist())
        keep = np.isin(uid, ids)
        out = batch.filter(pa.array(keep))
        return pa.table({
            "uid": pa.array(uid[keep], pa.int64()),
            **{c: out[c] for c in columns},
        })

    return ds.map_batches(f, batch_format="pyarrow")


# per-worker cache of broadcast lookup structures keyed by block refs
_UID_CACHE: dict = {}


def _uid_index(refs: tuple, columns: tuple[str, ...]):
    import ray as _ray

    key = (refs, columns)
    hit = _UID_CACHE.get(key)
    if hit is not None:
        return hit
    tables = _ray.get(list(refs))
    usable = [t for t in tables
              if len(t) and all(c in t.column_names for c in ("uid",) + columns)]
    if usable:
        tbl = pa.concat_tables([t.select(["uid", *columns]) for t in usable])
        idx = pd.Index(np.asarray(tbl["uid"], dtype=np.int64))
        payload = [tbl[c] for c in columns]
    else:
        idx = pd.Index(np.empty(0, dtype=np.int64))
        payload = [pa.chunked_array([], pa.null()) for _ in columns]
    out = (idx, payload)
    _UID_CACHE[key] = out
    return out


def verify_near_edges(
    edges: "ray.data.Dataset",
    sigs: "ray.data.Dataset",
    cfg: MinHashConfig,
) -> "ray.data.Dataset":
    """Signature-Jaccard verification of uid edges via the semi-filter +
    broadcast plan (see lsh.verify_edges_smallset for the rationale;
    identical semantics, integer keys)."""
    from .lsh import block_refs_of

    P = cfg.num_perms
    uid_sorted = _edge_uid_set(edges)
    skinny = _semi_filter_by_uid(sigs, uid_sorted, ["minhash"]).materialize()
    refs = tuple(block_refs_of(skinny))
    thr = cfg.verify_threshold

    def score(batch: pa.Table) -> pa.Table:
        idx, (mh,) = _uid_index(refs, ("minhash",))
        mkey = (refs, "mat")
        m = _UID_CACHE.get(mkey)
        if m is None:
            m = (np.asarray(mh.combine_chunks().flatten()).reshape(len(idx), P)
                 if len(idx) else np.empty((0, P), np.uint64))
            _UID_CACHE[mkey] = m
        iu = idx.get_indexer(np.asarray(batch["u"], dtype=np.int64))
        iv = idx.get_indexer(np.asarray(batch["v"], dtype=np.int64))
        ok = (iu >= 0) & (iv >= 0)
        est = np.zeros(len(batch))
        if ok.any():
            est[ok] = (m[iu[ok]] == m[iv[ok]]).mean(axis=1)
        keep = est >= thr
        return pa.table({
            "u": batch["u"].filter(pa.array(keep)),
            "v": batch["v"].filter(pa.array(keep)),
            "kind": batch["kind"].filter(pa.array(keep)),
        })

    return edges.map_batches(score, batch_format="pyarrow")


def verify_containment_edges(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Exact-substring verification of uid (short, long) candidate pairs
    via the same semi-filter + broadcast plan."""
    from .lsh import block_refs_of

    uid_sorted = _edge_uid_set(pairs)
    skinny = _semi_filter_by_uid(texts, uid_sorted, ["text"]).materialize()
    refs = tuple(block_refs_of(skinny))

    def check(batch: pa.Table) -> pa.Table:
        idx, (txt,) = _uid_index(refs, ("text",))
        iu = idx.get_indexer(np.asarray(batch["u"], dtype=np.int64))
        iv = idx.get_indexer(np.asarray(batch["v"], dtype=np.int64))
        keep = []
        for a, b in zip(iu, iv):
            if a < 0 or b < 0:
                keep.append(False)
                continue
            ta = txt[int(a)].as_py()
            tb = txt[int(b)].as_py()
            keep.append(bool(ta) and bool(tb) and (ta in tb))
        m = pa.array(keep)
        return pa.table({"u": batch["u"].filter(m), "v": batch["v"].filter(m),
                         "kind": batch["kind"].filter(m)})

    return pairs.map_batches(check, batch_format="pyarrow")


def _chain_star_pairs(uids: np.ndarray, sizes: np.ndarray, starts: np.ndarray,
                      clique_cap: int, group_cap: int):
    """Vectorized bounded pair emission for sorted band buckets laid out
    consecutively: chain edges for every bucket, plus star-to-min for
    buckets ≤ group_cap (hot buckets stay chain-only)."""
    total = uids.size
    # chain: consecutive members within a bucket
    idx = np.arange(total)
    bucket_id = np.repeat(np.arange(sizes.size), sizes)
    chain_mask = np.r_[bucket_id[1:] == bucket_id[:-1], False]
    u_chain = uids[chain_mask]
    v_chain = uids[np.r_[False, chain_mask[:-1]]]
    # star: member -> bucket minimum (first element, sorted) for members
    # at local position ≥ 2, only in buckets ≤ group_cap
    local = idx - np.repeat(starts, sizes)
    star_ok = np.repeat(sizes <= group_cap, sizes) & (local >= 2)
    first = np.repeat(uids[starts], sizes)
    u_star = first[star_ok]
    v_star = uids[star_ok]
    return np.concatenate([u_chain, u_star]), np.concatenate([v_chain, v_star])


def candidate_edges_fused(
    buckets: "ray.data.Dataset",
    lsh: LSHConfig,
    simhash_hamming: int,
    anchor_bucket_cap: int = 4096,
    sim_group_cap: int = 512,
    num_partitions: int = 128,
) -> "ray.data.Dataset":
    """One hash shuffle on ``key``; per partition, vectorized per-kind
    emission.  Returns (u, v, kind) int64 candidate edges."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        outs: list[pd.DataFrame] = []
        empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                              "v": pd.Series(dtype="int64"),
                              "kind": pd.Series(dtype="int8")})

        # ---- kind 0: LSH bands — chain + star ----------------------------
        band = df[df["kind"] == KIND_BAND]
        if len(band):
            band = band.drop_duplicates(["key", "uid"]).sort_values(
                ["key", "uid"], kind="mergesort")
            k = band["key"].to_numpy()
            uids = band["uid"].to_numpy()
            starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            sizes = np.diff(np.r_[starts, k.size])
            multi = sizes > 1
            if multi.any():
                u, v = _chain_star_pairs(uids, sizes, starts,
                                         lsh.clique_cap, lsh.group_cap)
                outs.append(pd.DataFrame({
                    "u": u, "v": v,
                    "kind": np.full(u.size, KIND_BAND, dtype=np.int8)}))

        # ---- kind 1: simhash chunks — Hamming-verified pairs -------------
        sim = df[df["kind"] == KIND_SIMHASH]
        if len(sim):
            sim = sim.drop_duplicates(["key", "uid"])
            cnt = sim.groupby("key")["uid"].transform("size")
            sim = sim[(cnt > 1) & (cnt <= sim_group_cap)]
            for _, g in sim.groupby("key", sort=False):
                uids = g["uid"].to_numpy()
                order = np.argsort(uids, kind="stable")
                uids = uids[order]
                sh = g["payload"].to_numpy()[order].view(np.uint64)
                xor = sh[:, None] ^ sh[None, :]
                hd = np.zeros_like(xor, dtype=np.int64)
                for s in range(64):
                    hd += ((xor >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
                iu, jv = np.nonzero(np.triu(hd <= simhash_hamming, k=1))
                if iu.size:
                    outs.append(pd.DataFrame({
                        "u": uids[iu], "v": uids[jv],
                        "kind": np.full(iu.size, KIND_SIMHASH, dtype=np.int8)}))

        # ---- kind 2: anchors — shorts × longs ----------------------------
        anc = df[df["kind"] == KIND_ANCHOR]
        if len(anc):
            anc = anc.drop_duplicates(["key", "uid"])
            shorts = anc[anc["flag"]]
            bucket_sz = anc.groupby("key")["uid"].transform("size")
            longs = anc[bucket_sz <= anchor_bucket_cap]
            m = shorts.merge(longs[["key", "uid", "payload"]],
                             on="key", suffixes=("_u", "_v"))
            m = m[m["payload_u"] < m["payload_v"]]
            if len(m):
                outs.append(pd.DataFrame({
                    "u": m["uid_u"].to_numpy(),
                    "v": m["uid_v"].to_numpy(),
                    "kind": np.full(len(m), KIND_ANCHOR, dtype=np.int8),
                }).drop_duplicates(["u", "v"]))

        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return grouped_apply(buckets, ["key"], emit, num_partitions=num_partitions)

"""Incremental signature store: content-keyed MinHash/SimHash re-use
across runs.

The reference re-uses stored content hashes between runs and re-hashes
only new or changed rows (``files/hash.go:18-35`` candidate predicates,
``files/process.go`` unchanged-skip).  This module applies the same
discipline to the near-dup tier: every column the signature stage
produces (minhash, simhash, n_shingles, anchors, sig_error) is a pure
function of the document TEXT, so rows are stored keyed by the exact
content key (``text_sha256``) and a corpus refresh computes signatures
only for content the store has never seen.  On web snapshots the
overwhelming majority of bytes persist between crawls, so the signature
phase of an incremental run costs O(new content), not O(corpus).

Store layout: parquet files under ``store_dir``, append-only — a
content key's signature never changes, so new runs only ADD files
(no partition rewrites, no tombstones; single writer per store, like
the run checkpoint).  Exactness does NOT rest on any probe: membership
is decided by (semi/anti) joins on the full sha-256 key, with the
broadcast/keyed-shuffle switch shared with the import gate
(stages/joins.py).

Wire format: the nested/unsigned signature columns are encoded to
join- and parquet-friendly types (Arrow's hash join rejects
fixed_size_list payload columns): minhash → one binary blob per row
(P×8 bytes, zero-copy buffer reshape), simhash → int64 bit-view,
anchors → int64-array blob.  Encode and decode are buffer-level numpy
views — no per-row Python on the warm (store-hit) path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import MinHashConfig

SIG_COLS = ("minhash", "simhash", "n_shingles", "anchors", "sig_error")
BROADCAST_MAX_KEYS = 1_000_000
_P = MinHashConfig().num_perms      # slot count pinned per store


def _store_files(store_dir: str) -> list[str]:
    if not os.path.isdir(store_dir):
        return []
    return [f for f in os.listdir(store_dir) if f.endswith(".parquet")]


def _bin_from(flat_bytes: bytes, offsets: np.ndarray) -> pa.Array:
    return pa.Array.from_buffers(
        pa.binary(), offsets.size - 1,
        [None, pa.py_buffer(offsets.astype(np.int32)),
         pa.py_buffer(flat_bytes)])


def _bin_views(col: "pa.ChunkedArray") -> tuple[np.ndarray, np.ndarray]:
    """(rebased int64 offsets, flat int64 values) of a binary column
    whose payloads are 8-byte-aligned arrays — buffer views only."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = (arr.chunk(0) if arr.num_chunks
               else pa.array([], pa.binary()))
    # BinaryArray buffers: [validity, int32 offsets, data]; honor slices
    offs_all = np.frombuffer(arr.buffers()[1] or b"\x00" * 4, np.int32)
    offs = offs_all[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    flat = data[offs[0]:offs[-1]].view(np.int64)
    return (offs - offs[0]) // 8, flat


def encode_sig_columns(t: pa.Table) -> pa.Table:
    """(text_sha256, *SIG_COLS) → the store wire schema."""
    n = len(t)
    mh = np.asarray(t["minhash"].combine_chunks().flatten(),
                    dtype=np.uint64)
    mh_offs = np.arange(n + 1, dtype=np.int64) * (_P * 8)
    cols = {
        "text_sha256": t["text_sha256"],
        "mh_blob": _bin_from(mh.tobytes(), mh_offs),
        "simhash_i64": pa.array(
            np.asarray(t["simhash"], np.uint64).view(np.int64), pa.int64()),
        "n_shingles": t["n_shingles"],
    }
    if "anchors" in t.column_names:
        a = t["anchors"].combine_chunks()
        if isinstance(a, pa.ChunkedArray):
            a = (a.chunk(0) if a.num_chunks
                 else pa.array([], pa.list_(pa.int64())))
        offs = np.asarray(a.offsets, dtype=np.int64)
        vals = np.asarray(a.values, dtype=np.int64)[offs[0]:offs[-1]]
        cols["anchors_blob"] = _bin_from(vals.tobytes(),
                                         (offs - offs[0]) * 8)
    cols["sig_error"] = t["sig_error"]
    return pa.table(cols)


def decode_sig_columns(t: pa.Table, num_perms: int = _P) -> pa.Table:
    """Store wire schema (+ any leading columns, e.g. url) → canonical
    signature columns."""
    _, mh_flat = _bin_views(t["mh_blob"])
    cols = {}
    for c in t.column_names:
        if c in ("mh_blob", "simhash_i64", "anchors_blob"):
            continue
        cols[c] = t[c]
    cols["minhash"] = pa.FixedSizeListArray.from_arrays(
        pa.array(mh_flat.view(np.uint64), pa.uint64()), num_perms)
    cols["simhash"] = pa.array(
        np.asarray(t["simhash_i64"], np.int64).view(np.uint64), pa.uint64())
    if "anchors_blob" in t.column_names:
        a_offs, a_flat = _bin_views(t["anchors_blob"])
        cols["anchors"] = pa.ListArray.from_arrays(
            pa.array(a_offs, pa.int32()), pa.array(a_flat, pa.int64()))
    return pa.table(cols)


def incremental_signatures(
    reps: "ray.data.Dataset",
    store_dir: str,
    num_partitions: int = 16,
    compute_anchors: bool = True,
    sig_kwargs: dict | None = None,
    passthrough: tuple = (),
) -> "tuple[ray.data.Dataset, int]":
    """Signatures for ``reps`` (url, text, text_sha256 — one row per
    content key, e.g. exact-class representatives), computing only rows
    whose content key is absent from the store and persisting those for
    the next run.

    ``sig_kwargs`` are forwarded to the signature stage (a store is
    bound to ONE signature config — num_perms and the anchors setting
    are validated against the store schema on load); ``passthrough``
    columns of ``reps`` (e.g. n_bytes) ride through to the output.

    Returns ``(sigs, n_computed)``: ``sigs`` carries
    (url, *passthrough, text_sha256, *SIG_COLS) for every input row —
    byte-identical to a fresh full compute (pinned by tests) — and
    ``n_computed`` is how many rows actually ran the signature kernels
    this call.
    """
    import functools

    from ..pipelines.dedup import _signature_cached
    from ..stages.joins import (broadcast_semi_filter, join_on,
                                keyed_membership_filter)

    sig_kwargs = dict(sig_kwargs or {})
    sig_kwargs.setdefault("compute_anchors", compute_anchors)
    compute_anchors = sig_kwargs["compute_anchors"]
    num_perms = (sig_kwargs.get("minhash") or MinHashConfig()).num_perms

    out_cols = ["url", *passthrough, "text_sha256", *SIG_COLS]
    if not compute_anchors:
        out_cols = [c for c in out_cols if c != "anchors"]

    hits = None
    miss = reps
    if _store_files(store_dir):
        store = ray.data.read_parquet(store_dir)
        has_anchors = "anchors_blob" in (store.schema().names or [])
        if has_anchors != bool(compute_anchors):
            raise ValueError(
                "signature store anchors setting does not match this "
                "run's config — a store is bound to one signature config")
        keys = store.select_columns(["text_sha256"]).materialize()
        slim = reps.select_columns(["url", *passthrough, "text_sha256"])
        if keys.count() <= BROADCAST_MAX_KEYS:
            key_set = {r["text_sha256"] for r in keys.take_all()}
            hits_in = broadcast_semi_filter(slim, "text_sha256", key_set)
            miss = broadcast_semi_filter(reps, "text_sha256", key_set,
                                         anti=True)
        else:
            # scale twin: nothing collected on the driver
            hits_in = keyed_membership_filter(
                slim, "text_sha256", keys, num_partitions=num_partitions)
            miss = keyed_membership_filter(
                reps, "text_sha256", keys, anti=True,
                num_partitions=num_partitions)
        hits = (join_on(hits_in, store, "text_sha256",
                        num_partitions=num_partitions)
                .map_batches(
                    functools.partial(decode_sig_columns,
                                      num_perms=num_perms),
                    batch_format="pyarrow")
                .select_columns(out_cols))

    computed = miss.map_batches(
        _signature_cached, fn_kwargs=sig_kwargs,
        batch_format="pyarrow", batch_size=512).materialize()
    n_computed = computed.count()

    if n_computed:
        # append-only persist: new content keys only ever ADD files
        computed.select_columns(
            ["text_sha256",
             *(c for c in SIG_COLS if compute_anchors or c != "anchors")]
        ).map_batches(
            encode_sig_columns, batch_format="pyarrow",
        ).write_parquet(store_dir)

    new_sigs = computed.select_columns(out_cols)
    sigs = new_sigs if hits is None else hits.union(new_sigs)
    return sigs, n_computed

"""Mergeable-sketch queries: count-min-sketch heavy hitters over the
``documents`` token stream.

The task brief lists "a novel sketch" as the canonical custom operator
Ray Data lacks; count-min (Cormode & Muthukrishnan 2005) is THE
mergeable frequency sketch for corpus-scale streams: each batch folds
its tokens into a d×w counter grid, grids merge by plain addition
(map-side combine → one tiny groupby — no corpus-wide word shuffle),
and a second streaming pass reports every word whose estimate clears
the heavy-hitter threshold.  At 100 TB the d×w grid is ~32 KiB —
broadcast once via ``ray.put`` — while the exact alternative (count
every distinct word) is a corpus-sized groupby; the sketch trades a
bounded overestimate (ε = e/w per row, union bound over d rows) for
never shuffling the long tail.

Token identity reuses the SimHash tokenizer verbatim (lowercased
``\\w+``, crc32+len+seed → splitmix64 — ``functions/shingles.py:
word_tokens_u64_many``), so the SQL oracle rides the same tb/tcrc
HUGEINT machinery as ``simhash_pairs`` (parity caveats documented
there).  Row r's bucket is ``mix64(h + r·GOLDEN) % W`` — an
independent-enough hash family derived from the one mixer both sides
already implement.

Determinism: the sketch is exact arithmetic on u64 hashes — no RNG,
no floats — so the engine and the oracle compute the SAME estimates,
bucket collisions included; the oracle is a full re-derivation, not a
ground-truth comparison.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import mix64
from ..functions.sqlgen import GOLDEN, U64_MOD, crc32_list_sql, mix64_ctes
from .registry import register

CMS_DEPTH = 4        # d hash rows
CMS_WIDTH = 1024     # w buckets per row (ε ≈ e/1024 per row)
HH_PERMILLE = 1      # heavy hitter: est ≥ 0.1% of the token stream


def _read_docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"])


def _batch_words(t: pa.Table):
    """Batch → (unique word strings, their u64 hashes, multiplicities).
    One factorize + one batched crc/mix pass — no per-token numpy
    dispatch (the ``word_tokens_u64_many`` rationale)."""
    import re
    texts = t["text"].to_pylist()
    toks = [w for s in texts for w in re.findall(r"\w+", s.lower())]
    if not toks:
        return [], np.empty(0, np.uint64), np.empty(0, np.int64)
    codes, uniques = pd.factorize(pd.array(toks), sort=False)
    cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
    # same crc32+len·2^32+seed0 → mix64 token identity as
    # word_tokens_u64_many, applied to the distinct words only
    from zlib import crc32
    raw = np.fromiter((crc32(w.encode("utf-8")) for w in uniques),
                      dtype=np.uint64, count=len(uniques))
    lens = np.fromiter((len(w) for w in uniques), dtype=np.uint64,
                       count=len(uniques))
    h = mix64(raw + (lens << np.uint64(32)))
    return list(uniques), h, cnt


def _buckets(h: np.ndarray) -> np.ndarray:
    """(d, n) bucket ids: row r uses mix64(h + r·GOLDEN) % W."""
    g = np.uint64(GOLDEN)
    return np.stack([
        (mix64(h + np.uint64(r) * g) % np.uint64(CMS_WIDTH)).astype(np.int64)
        for r in range(CMS_DEPTH)])


def _cms_grid(sf_dir: str) -> np.ndarray:
    """The merged (d, w) int64 count-min grid — map-side partial grids
    (≤ d·w rows each), one tiny (r,b) groupby, driver holds 32 KiB."""

    def partial(t: pa.Table) -> pa.Table:
        _, h, cnt = _batch_words(t)
        if h.size == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        bk = _buckets(h)
        flat = (np.repeat(np.arange(CMS_DEPTH, dtype=np.int64), h.size)
                * CMS_WIDTH + bk.ravel())
        grid = np.bincount(flat, weights=np.tile(cnt, CMS_DEPTH),
                           minlength=CMS_DEPTH * CMS_WIDTH).astype(np.int64)
        nz = np.flatnonzero(grid)
        return pa.table({"r": pa.array(nz // CMS_WIDTH, pa.int64()),
                         "b": pa.array(nz % CMS_WIDTH, pa.int64()),
                         "cnt": pa.array(grid[nz], pa.int64())})

    cells = (_read_docs(sf_dir)
             .map_batches(partial, batch_format="pyarrow")
             .groupby(["r", "b"]).aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())                       # ≤ d·w rows — driver-safe
    grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    grid[cells["r"].to_numpy(), cells["b"].to_numpy()] = \
        cells["cnt"].to_numpy()
    return grid


def cms_heavy_hitters(sf_dir: str) -> "ray.data.Dataset":
    """Words whose count-min estimate clears 0.1% of the token stream,
    largest first.  Pass 1 builds the mergeable grid; pass 2 streams
    the corpus again, probing the broadcast grid per distinct word —
    the standard two-pass CMS heavy-hitter shape (the candidate set
    never materializes the long tail)."""
    grid = _cms_grid(sf_dir)
    total = int(grid[0].sum())
    thr = (total + 999) // 1000 if HH_PERMILLE == 1 else 0
    grid_ref = ray.put(grid)

    def probe(t: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        words, h, _ = _batch_words(t)
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "est_count": pa.array([], pa.int64())})
        bk = _buckets(h)
        est = g[np.arange(CMS_DEPTH)[:, None], bk].min(axis=0)
        keep = est >= thr
        return pa.table({
            "word": pa.array(np.asarray(words, dtype=object)[keep],
                             pa.string()),
            "est_count": pa.array(est[keep], pa.int64()),
        })

    cands = _read_docs(sf_dir).map_batches(probe, batch_format="pyarrow")
    # a word can surface from many batches, always with the SAME
    # estimate (the grid is global) — min() is a pure distinct pass
    # over the tiny survivor set
    from ray.data.aggregate import Min
    hh = cands.groupby("word").aggregate(
        Min("est_count", alias_name="est_count"))
    return hh.map_batches(
        lambda t: pa.table({
            "word": t["word"],
            "est_count": pa.compute.cast(t["est_count"], pa.int64()),
        }), batch_format="pyarrow",
    ).sort(["est_count", "word"], descending=[True, False])


def _cms_oracle_sql() -> str:
    crc_list = crc32_list_sql()
    word = r"[\p{L}\p{N}_]+"
    return f"""
    WITH toks AS (
        SELECT t.tok FROM documents,
             LATERAL (SELECT unnest(regexp_extract_all(lower(text),
                                    '{word}')) AS tok) t
    ),
    wcnt AS MATERIALIZED (
        SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ),
    tb AS (
        SELECT tok, cnt, length(tok) AS clen,
               list_transform(generate_series(1, octet_length(encode(tok))),
                 p -> (strpos('0123456789ABCDEF',
                              substr(upper(hex(encode(tok))), 2*p-1, 1)) - 1) * 16
                    + (strpos('0123456789ABCDEF',
                              substr(upper(hex(encode(tok))), 2*p,   1)) - 1)) AS bs
        FROM wcnt
    ),
    tcrc AS (
        SELECT tok, cnt, clen,
               xor(list_reduce(list_prepend(4294967295::BIGINT, bs),
                       (acc, x) -> xor({crc_list}[((xor(acc, x)) & 255) + 1],
                                       acc >> 8)),
                   4294967295::BIGINT) AS crc
        FROM tb
    ),
    {mix64_ctes('hm', 'tcrc', 'tok, cnt',
                '(crc::HUGEINT + clen::HUGEINT * 4294967296::HUGEINT) % '
                + U64_MOD)},
    rb AS (
        SELECT tok, cnt, x AS h, r.r
        FROM hm5, LATERAL (SELECT unnest(generate_series(0, {CMS_DEPTH - 1}))
                           AS r) r
    ),
    {mix64_ctes('cb', 'rb', 'tok, cnt, r',
                f'(h + r::HUGEINT * {GOLDEN}::HUGEINT) % ' + U64_MOD)},
    wb AS MATERIALIZED (
        SELECT tok, cnt, r, x % {CMS_WIDTH} AS b FROM cb5
    ),
    cells AS MATERIALIZED (
        SELECT r, b, sum(cnt) AS cell FROM wb GROUP BY r, b
    ),
    est AS (
        SELECT w.tok, min(c.cell) AS est_count
        FROM wb w JOIN cells c ON w.r = c.r AND w.b = c.b
        GROUP BY w.tok
    ),
    tot AS (SELECT sum(cnt) AS n FROM wcnt)
    SELECT tok AS word, CAST(est_count AS BIGINT) AS est_count
    FROM est, tot
    WHERE est_count >= (n + 999) // 1000
    ORDER BY est_count DESC, word ASC
    """


register("cms_heavy_hitters", cms_heavy_hitters, _cms_oracle_sql())

"""Corpus-curation queries: repetition signals, deterministic dataset
splits, stratified sampling, and per-source rollups.

These extend the engine toward the curation steps of a large-scale
training-data pipeline (task brief):

* ``repetition_stats`` — the Gopher-style per-document repetition
  signals (duplicate-line fraction, duplicate-word fraction, top-2-gram
  coverage; Rae et al. 2021, "Scaling Language Models", appendix A1.1)
  as integer permille so the DuckDB value hash matches bit-for-bit.
* ``train_val_split`` — coordination-free hash-based split assignment:
  the split of a document is a pure function of its id, so any worker
  on any cluster computes the same assignment (≙ the reference's
  deterministic keeper rule, files/move.go:226-236, applied to
  sampling).  Keyed on DuckDB's ``md5_number_lower`` (= little-endian
  u64 of md5 digest bytes 8..16) so the oracle shares the exact hash.
* ``stratified_sample`` — per-stratum deterministic rate sampling with
  map-side combined counts (no row leaves the worker; only per-source
  partial counts shuffle).
* ``source_stats`` — per-source rollup via the map-side-combine
  pattern: each batch emits one partial row per source it saw, the
  grouped reduce sums partials — the groupby exchange moves O(sources ×
  blocks) skinny rows, never documents.

All kernels are pandas/numpy-vectorized over the batch (no per-row
Python in the repetition kernel — splitting, exploding, n-gram
counting all run in pandas C paths).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.common import grouped_apply
from .registry import register


def _read_docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


# --------------------------------------------------------------------------
# repetition signals (Gopher A1.1 shape): integer permille end-to-end
# --------------------------------------------------------------------------

def _repetition_frame(ids: np.ndarray, texts: list[str]) -> pd.DataFrame:
    """Vectorized repetition stats for one batch.

    dup_line_permille  = 1000·(n_lines − n_distinct_lines) // max(n_lines, 1)
    dup_word_permille  = 1000·(n_words − n_distinct_words) // max(n_words, 1)
    top_2gram_permille = 1000·count(most frequent word 2-gram) // max(n_grams, 1)

    Lines split on "\\n", words on single spaces; empty fragments are
    dropped (matching DuckDB ``list_filter(string_split(..), x <> '')``).
    """
    s = pd.Series(texts, dtype=object)
    n = len(s)
    out = pd.DataFrame({
        "doc_id": ids,
        "dup_line_permille": np.zeros(n, np.int64),
        "dup_word_permille": np.zeros(n, np.int64),
        "top_2gram_permille": np.zeros(n, np.int64),
    })

    def dup_permille(col: pd.Series) -> np.ndarray:
        ex = col.explode()
        ex = ex[ex.notna() & (ex != "")]
        if ex.empty:
            return np.zeros(n, np.int64)
        grp = ex.groupby(level=0)
        total = grp.size()
        distinct = grp.nunique()
        res = (1000 * (total - distinct) // total).astype(np.int64)
        return res.reindex(range(n), fill_value=0).to_numpy()

    out["dup_line_permille"] = dup_permille(s.str.split("\n"))
    words = s.str.split(" ")
    out["dup_word_permille"] = dup_permille(words)

    # top 2-gram coverage: all (row, gram) occurrences via the shared
    # n-gram kernel, then max count over grams / the gram total per row
    g = _word_ngrams(texts, 2, distinct=False)
    if len(g):
        cnt = g.groupby(["row", "gram"], sort=False).size()
        per_row = cnt.groupby(level=0)
        top = per_row.max()
        tot = per_row.sum()
        res = (1000 * top // tot).astype(np.int64)
        out["top_2gram_permille"] = res.reindex(
            range(n), fill_value=0).to_numpy()
    return out


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        frame = _repetition_frame(
            np.asarray(t["doc_id"], np.int64), t["text"].to_pylist())
        return pa.Table.from_pandas(frame, preserve_index=False)

    return docs.map_batches(f, batch_format="pyarrow")


register(
    "repetition_stats",
    repetition_stats,
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(len(ws) - 1),
                                   i -> ws[i + 1] || ' ' || ws[i + 2])) AS gram
      FROM w WHERE len(ws) >= 2),
    gcnt AS (SELECT doc_id, gram, count(*) AS cnt
             FROM grams GROUP BY doc_id, gram),
    gmax AS (SELECT doc_id, max(cnt) AS top_gram, sum(cnt) AS n_grams
             FROM gcnt GROUP BY doc_id)
    SELECT w.doc_id,
           CAST(1000 * (len(lines) - len(list_distinct(lines)))
                // GREATEST(len(lines), 1) AS BIGINT) AS dup_line_permille,
           CAST(1000 * (len(ws) - len(list_distinct(ws)))
                // GREATEST(len(ws), 1) AS BIGINT) AS dup_word_permille,
           CAST(1000 * COALESCE(gmax.top_gram, 0)
                // GREATEST(COALESCE(gmax.n_grams, 0), 1) AS BIGINT)
               AS top_2gram_permille
    FROM w LEFT JOIN gmax ON w.doc_id = gmax.doc_id
    """,
)


# --------------------------------------------------------------------------
# deterministic hash split + stratified sampling
# --------------------------------------------------------------------------

def _md5_lower64(keys: list[str]) -> np.ndarray:
    """DuckDB ``md5_number_lower``: little-endian u64 of digest[8:16].

    Per-key hashlib loop — chosen over the engine's vectorized
    ``hash64_str`` because the ORACLE must compute the identical value
    in SQL; md5 is the one keyed hash both sides share.  At 100 TB the
    split key would be the already-computed int64 uid instead.
    """
    return np.array(
        [int.from_bytes(hashlib.md5(k.encode()).digest()[8:16], "little")
         for k in keys],
        dtype=np.uint64,
    )


_VAL_MOD = 20      # 1/20 of docs → validation


def train_val_split(sf_dir: str) -> "ray.data.Dataset":
    docs = _read_docs(sf_dir, ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        h = _md5_lower64([str(i) for i in ids.tolist()])
        split = np.where(h % _VAL_MOD == 0, "val", "train")
        return pa.table({
            "doc_id": t["doc_id"],
            "split": pa.array(split.tolist(), pa.string()),
        })

    return docs.map_batches(f, batch_format="pyarrow")


register(
    "train_val_split",
    train_val_split,
    f"""
    SELECT doc_id,
           CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR))
                     % {_VAL_MOD} = 0
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)


_SAMPLE_MOD = 10   # keep 1/10 per stratum


def stratified_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic per-source rate sample, reported as per-stratum
    counts via map-side combine: the filter + partial count happen in
    the map stage; only (source, partial n) rows reach the exchange."""
    docs = _read_docs(sf_dir, ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], np.int64)
        h = _md5_lower64([str(i) for i in ids.tolist()])
        kept = h % _SAMPLE_MOD == 0
        src = np.asarray(t["source"].to_pylist(), dtype=object)[kept]
        if src.size == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vals, cnts = np.unique(src, return_counts=True)
        return pa.table({"source": pa.array(vals.tolist(), pa.string()),
                         "n": pa.array(cnts, pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False)["n"].sum().reset_index()
        return pd.DataFrame({"source": g["source"],
                             "n_sampled": g["n"].astype("int64")})

    return grouped_apply(partials, ["source"], reduce, num_partitions=8,
                         empty_result=pa.table({
                             "source": pa.array([], pa.string()),
                             "n_sampled": pa.array([], pa.int64())}))


register(
    "stratified_sample",
    stratified_sample,
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % {_SAMPLE_MOD} = 0
    GROUP BY source
    """,
)


# --------------------------------------------------------------------------
# exact grouped quantiles via value-count histograms
# --------------------------------------------------------------------------

_QUANTILES_PERMILLE = (250, 500, 900, 990)


def length_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-language n_chars quantiles, computed scale-safely: each
    batch emits (lang, n_chars, count) partials — the exchange moves the
    VALUE DOMAIN (langs × distinct lengths), never rows — and the
    grouped reduce reads quantiles off the merged histogram.  Selection
    matches DuckDB ``quantile_disc`` bit-for-bit: the smallest value
    whose cumulative count reaches ceil(q·N), with ceil done in integer
    arithmetic (q·N in floats drifts above integers, e.g. 0.9·30)."""
    docs = _read_docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_pylist(),
            "n_chars": np.asarray(t["n_chars"], np.int64),
        })
        g = df.groupby(["lang", "n_chars"], sort=False).size().rename(
            "c").reset_index()
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang", sort=False):
            h = (g.groupby("n_chars", sort=True)["c"].sum()
                 .astype("int64"))
            cum = h.cumsum().to_numpy()
            vals = h.index.to_numpy()
            n = int(cum[-1])
            for qp in _QUANTILES_PERMILLE:
                target = (qp * n + 999) // 1000
                pick = vals[int(np.searchsorted(cum, target))]
                out.append((lang, qp, int(pick)))
        return pd.DataFrame(out, columns=["lang", "q_permille", "n_chars_q"]
                            ).astype({"q_permille": "int64",
                                      "n_chars_q": "int64"})

    return grouped_apply(
        partials, ["lang"], reduce,
        empty_result=pa.table({
            "lang": pa.array([], pa.string()),
            "q_permille": pa.array([], pa.int64()),
            "n_chars_q": pa.array([], pa.int64())}))


register(
    "length_quantiles",
    length_quantiles,
    """
    SELECT lang,
           CAST(unnest([250, 500, 900, 990]) AS BIGINT) AS q_permille,
           CAST(unnest(quantile_disc(n_chars, [0.25, 0.5, 0.9, 0.99]))
                AS BIGINT) AS n_chars_q
    FROM documents GROUP BY lang
    """,
)


# --------------------------------------------------------------------------
# per-source rollup (map-side combine)
# --------------------------------------------------------------------------

_DOMAIN_CAP = 15   # keep at most this many docs per source


def domain_cap(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic per-source document cap (the per-domain quota step
    of a crawl-curation pipeline): within each source, docs are ranked
    by (md5 of id, id) — a pure function of content identity, so any
    worker on any cluster ranks identically — and only the first
    ``_DOMAIN_CAP`` survive.  One hash shuffle on ``source``; ranking
    is vectorized per partition."""
    docs = _read_docs(sf_dir, ["doc_id", "source"])

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = _md5_lower64([str(i) for i in df["doc_id"].tolist()])
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        df["rk"] = df.groupby("source", sort=False).cumcount() + 1
        out = df[df["rk"] <= _DOMAIN_CAP]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "source": out["source"],
            "rk": out["rk"].astype("int64"),
        })

    return grouped_apply(docs, ["source"], cap, num_partitions=8,
                         empty_result=pa.table({
                             "doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "rk": pa.array([], pa.int64())}))


register(
    "domain_cap",
    domain_cap,
    f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (
                 PARTITION BY source
                 ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= {_DOMAIN_CAP}
    """,
)


_CONTAM_NGRAM = 5     # words per contamination shingle
_BENCH_MOD = 97       # doc_id % this == 0 -> benchmark member


def _word_ngrams(texts: list[str], n: int,
                 distinct: bool = True) -> pd.DataFrame:
    """(row, gram) pairs of word n-grams per text — distinct per row by
    default, every occurrence with ``distinct=False`` — vectorized via
    the explode + shifted-join pattern.  Words split on single spaces;
    empty fragments drop (matching the DuckDB ``list_filter`` oracles)."""
    words = pd.Series(texts, dtype=object).str.split(" ")
    ex = words.explode()
    ex = ex[ex.notna() & (ex != "")]
    if ex.empty:
        return pd.DataFrame({"row": pd.Series(dtype=np.int64),
                             "gram": pd.Series(dtype=object)})
    row = ex.index.to_numpy(np.int64)
    w = ex.to_numpy(dtype=object)
    keep = np.ones(len(w) - n + 1, dtype=bool) if len(w) >= n else np.zeros(0, bool)
    gram = w[: len(keep)].copy() if len(keep) else np.empty(0, object)
    for k in range(1, n):
        keep &= row[k: len(keep) + k] == row[: len(keep)]
        gram = gram + " " + w[k: len(keep) + k]
    df = pd.DataFrame({"row": row[: len(keep)][keep], "gram": gram[keep]})
    return df.drop_duplicates() if distinct else df


def contamination_check(sf_dir: str) -> "ray.data.Dataset":
    """Benchmark-contamination scan (the eval-decontamination step of a
    training-data pipeline): count, per candidate document, how many
    DISTINCT word 5-grams it shares with a benchmark set.

    The benchmark here is the in-table subset ``doc_id %% 97 == 0`` (no
    external data; deterministic).  Its distinct-gram set is collected
    once and broadcast via ``ray.put`` — the canonical small-side
    pattern: benchmark suites are tiny next to a crawl, so the scan is
    one map over the corpus, no shuffle.  Membership probing is a
    vectorized ``pd.Index.get_indexer`` per batch."""
    import ray as _ray

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t["doc_id"], np.int64) % _BENCH_MOD == 0)),
        batch_format="pyarrow")
    grams: set[str] = set()
    for b in bench.iter_batches(batch_size=4096, batch_format="pyarrow"):
        grams.update(
            _word_ngrams(b["text"].to_pylist(), _CONTAM_NGRAM)["gram"])
    gram_ref = _ray.put(pd.Index(sorted(grams)))

    def scan(t: pa.Table) -> pa.Table:
        idx = _ray.get(gram_ref)
        ids = np.asarray(t["doc_id"], np.int64)
        cand = ids % _BENCH_MOD != 0
        n_hits = np.zeros(len(ids), np.int64)
        g = _word_ngrams(
            [txt if c else "" for txt, c in
             zip(t["text"].to_pylist(), cand)], _CONTAM_NGRAM)
        if len(g):
            hit = g[idx.get_indexer(g["gram"]) >= 0]
            cnt = hit.groupby("row").size()
            n_hits[cnt.index.to_numpy()] = cnt.to_numpy()
        return pa.table({
            "doc_id": pa.array(ids[cand], pa.int64()),
            "n_contaminated_grams": pa.array(n_hits[cand], pa.int64()),
        })

    return docs.map_batches(scan, batch_format="pyarrow")


register(
    "contamination_check",
    contamination_check,
    f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(range(len(ws) - {_CONTAM_NGRAM - 1}),
                    i -> list_aggregate(ws[i + 1 : i + {_CONTAM_NGRAM}],
                                        'string_agg', ' '))) AS gram
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents)
      WHERE len(ws) >= {_CONTAM_NGRAM}),
    bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
    cand AS (
      SELECT DISTINCT doc_id, gram FROM grams
      WHERE doc_id % {_BENCH_MOD} <> 0),
    hits AS (
      SELECT cand.doc_id, count(*) AS n
      FROM cand JOIN bench USING (gram) GROUP BY cand.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_contaminated_grams
    FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    """,
)


def source_stats(sf_dir: str) -> "ray.data.Dataset":
    docs = _read_docs(sf_dir, ["doc_id", "source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_pylist(),
            "n_chars": np.asarray(t["n_chars"], np.int64),
            "is_en": pc.fill_null(pc.equal(t["lang"], "en"), False)
                .to_numpy(zero_copy_only=False).astype(np.int64),
        })
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_chars", "size"),
            total_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
            n_en=("is_en", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"),
            total_chars=("total_chars", "sum"),
            max_chars=("max_chars", "max"),
            n_en=("n_en", "sum"),
        ).reset_index()
        for c in ("n_docs", "total_chars", "max_chars", "n_en"):
            g[c] = g[c].astype("int64")
        return g

    return grouped_apply(partials, ["source"], reduce, num_partitions=8,
                         empty_result=pa.table({
                             "source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "total_chars": pa.array([], pa.int64()),
                             "max_chars": pa.array([], pa.int64()),
                             "n_en": pa.array([], pa.int64())}))


register(
    "source_stats",
    source_stats,
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
    FROM documents
    GROUP BY source
    """,
)


# --------------------------------------------------------------------------
# url recrawl dedup: keep the newest capture per canonical URL
# --------------------------------------------------------------------------

_URL_MOD = 97          # synthetic canonical-URL family (97 urls, ~n/97 captures each)
_TS_MOD = 100_000      # synthetic capture-time offset range (seconds)
_ARGMAX_K = 10_000_000  # doc_id < K everywhere, so max(off*K + id) is argmax


def url_dedup_latest(sf_dir: str) -> "ray.data.Dataset":
    """Keep the newest capture per canonical URL — the recrawl-dedup step
    of a Common-Crawl-style pipeline (input_hint columns url/warc_ts;
    ≙ the reference's keep-one-row-per-key prune, files/prune.go:175-204,
    keyed on url with latest-timestamp-wins instead of first-id-wins).

    Scale plan: per-batch partial argmax (one row per url seen in the
    batch — a map-side combiner, so the shuffle moves O(urls × blocks)
    skinny int64 rows, never captures), then a small
    ``groupby(url_key).aggregate(Max, Sum)``.  The argmax is encoded as
    ``warc_off * K + doc_id`` with ``doc_id < K``, so a plain Max picks
    the latest capture with doc_id as the deterministic tiebreak —
    coordination-free, any partitioning produces the same keepers.

    The synthetic (url_key, warc_off) columns are pure functions of
    doc_id so the DuckDB oracle can derive the identical input.
    """
    docs = _read_docs(sf_dir, ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"url_key": pa.array([], pa.int64()),
                          "comb": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"].to_numpy().astype(np.int64)
        urlk = ids % _URL_MOD
        comb = ((ids * 37) % _TS_MOD) * _ARGMAX_K + ids
        order = np.lexsort((comb, urlk))
        urlk_s, comb_s = urlk[order], comb[order]
        starts = np.flatnonzero(np.r_[True, urlk_s[1:] != urlk_s[:-1]])
        last = np.r_[starts[1:] - 1, len(urlk_s) - 1]
        counts = np.diff(np.r_[starts, len(urlk_s)]).astype(np.int64)
        return pa.table({"url_key": pa.array(urlk_s[starts], pa.int64()),
                         "comb": pa.array(comb_s[last], pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Max, Sum

    agg = (docs.map_batches(partial, batch_format="pyarrow")
               .groupby("url_key")
               .aggregate(Max("comb", alias_name="comb"),
                          Sum("n", alias_name="n_caps")))

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        comb = df["comb"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "url_key": df["url_key"].astype("int64"),
            "keeper_id": comb % _ARGMAX_K,
            "latest_off": comb // _ARGMAX_K,
            "n_caps": df["n_caps"].astype("int64"),
        })

    return agg.map_batches(finalize, batch_format="pandas")


register(
    "url_dedup_latest",
    url_dedup_latest,
    f"""
    SELECT url_key,
           MAX(warc_off * {_ARGMAX_K} + doc_id) % {_ARGMAX_K} AS keeper_id,
           MAX(warc_off * {_ARGMAX_K} + doc_id) // {_ARGMAX_K} AS latest_off,
           CAST(COUNT(*) AS BIGINT) AS n_caps
    FROM (SELECT doc_id,
                 doc_id % {_URL_MOD} AS url_key,
                 (doc_id * 37) % {_TS_MOD} AS warc_off
          FROM documents)
    GROUP BY url_key
    """,
)


# --------------------------------------------------------------------------
# grouped top-k: k longest docs per lang (window-function shape)
# --------------------------------------------------------------------------

_TOPK_PER_GROUP = 3


def topk_per_lang(sf_dir: str) -> "ray.data.Dataset":
    """Top-``k`` longest documents per language — the grouped-top-k /
    window-function shape (`row_number() OVER (PARTITION BY ...)`).
    One hash shuffle on ``lang``; the rank is a vectorized
    sort + cumcount per partition, deterministic via the (n_chars desc,
    doc_id asc) total order.  The per-group k bounds each partition's
    output, so the result is tiny regardless of corpus size."""
    docs = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rk"] = df.groupby("lang", sort=False).cumcount() + 1
        out = df[df["rk"] <= _TOPK_PER_GROUP]
        return pd.DataFrame({
            "lang": out["lang"],
            "doc_id": out["doc_id"].astype("int64"),
            "n_chars": out["n_chars"].astype("int64"),
            "rk": out["rk"].astype("int64"),
        })

    return grouped_apply(docs, ["lang"], topk, num_partitions=8,
                         empty_result=pa.table({
                             "lang": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64())}))


register(
    "topk_per_lang",
    topk_per_lang,
    f"""
    SELECT lang, doc_id, n_chars, rk FROM (
      SELECT lang, doc_id, n_chars,
             CAST(row_number() OVER (
                 PARTITION BY lang ORDER BY n_chars DESC, doc_id
             ) AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= {_TOPK_PER_GROUP}
    """,
)


# --------------------------------------------------------------------------
# corpus vocabulary: global top-k words (map-side combine + small sort)
# --------------------------------------------------------------------------

_TOP_WORDS = 20


def top_words(sf_dir: str) -> "ray.data.Dataset":
    """Global top-``k`` most frequent words — corpus vocabulary stats.

    Per-batch ``value_counts`` partials (map-side combiner: only
    (word, count) rows leave the worker, never text), skinny
    ``groupby(word).Sum``, then a global sort+limit over the distinct
    vocabulary (bounded; at 100 TB the vocabulary is a DF-capped
    fraction of the corpus, and the sort input is the aggregate, not
    the rows).  Deterministic tiebreak: count desc, word asc."""
    docs = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pandas(), copy=False)
        words = s.str.split(" ").explode()
        words = words[words != ""]
        vc = words.value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    from ray.data.aggregate import Sum

    agg = (docs.map_batches(partial, batch_format="pyarrow")
               .groupby("word").aggregate(Sum("cnt", alias_name="cnt")))
    out = agg.sort(["cnt", "word"], descending=[True, False]).limit(_TOP_WORDS)
    return out.map_batches(
        lambda t: pa.table({"word": t["word"],
                            "cnt": pc.cast(t["cnt"], pa.int64())}),
        batch_format="pyarrow")


register(
    "top_words",
    top_words,
    f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM words WHERE word <> ''
    GROUP BY word ORDER BY cnt DESC, word LIMIT {_TOP_WORDS}
    """,
)


# --------------------------------------------------------------------------
# training-shard packing: deterministic token-budget shard assignment
# --------------------------------------------------------------------------
#
# Shard assembly for training corpora: documents pack into shards of
# ~SHARD_TOKEN_BUDGET tokens.  The rule is coordination-free and
# cumsum-expressible — within each source (the partition key; any
# hash-bucketed key works at scale), docs in doc_id order join shard
# floor(tokens_before / budget), so a shard may exceed the budget by at
# most one document.  No sequential state crosses partition boundaries:
# every group packs independently in one vectorized pass after a single
# hash shuffle on the key.

SHARD_TOKEN_BUDGET = 2000


def pack_shards(sf_dir: str) -> "ray.data.Dataset":
    from ..pipelines.textqc import _token_counts

    docs = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def counted(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_tokens": pa.array(_token_counts(t["text"].to_pylist()),
                                 pa.int64()),
        })

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        cum = df.groupby("source", sort=False)["n_tokens"].cumsum()
        before = cum - df["n_tokens"]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"],
            "shard_id": (before // SHARD_TOKEN_BUDGET).astype("int64"),
            "n_tokens": df["n_tokens"].astype("int64"),
        })

    return grouped_apply(docs.map_batches(counted, batch_format="pyarrow"),
                         ["source"], pack)


register(
    "pack_shards",
    pack_shards,
    f"""
    WITH c AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source,
           CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
                 - n_tokens) // {SHARD_TOKEN_BUDGET} AS BIGINT) AS shard_id,
           n_tokens
    FROM c
    """,
)

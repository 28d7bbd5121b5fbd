"""Regression guards for the DuckDB SQL oracles.

The oracles in ``functions/sqlgen.py`` / ``pipelines/flagship_oracle.py``
re-derive the engine's hash kernels in SQL; a change to either side
(kernel constants, mix chain, shingle width, band fold, extraction
formula) must break these tests before it breaks the driver's
correctness gate.

Two layers:

* primitive parity — the sqlgen mix64 / rolling-poly / hash64 SQL
  against the numpy kernels on adversarial values (no Ray);
* end-to-end parity — a handful of registry queries against their
  registered oracle SQL at sf0.001 (the same protocol as
  ``tools/check_oracle.py``), including the flagship.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from deduplicator_go_ray.functions.hashing import hash64_str, mix64, rolling_hashes
from deduplicator_go_ray.functions.sqlgen import (U64_MOD, bytes_cte,
                                                  hash64_seed, mix64_ctes,
                                                  pow_list_sql, u64_bigint)

SF = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


# --------------------------------------------------------------------------
# primitive parity (no Ray, no parquet)
# --------------------------------------------------------------------------

def test_sql_mix64_matches_numpy():
    vals = np.array([0, 1, 2**63, 2**64 - 1, 0xDEADBEEF, 2**32], dtype=np.uint64)
    exp = mix64(vals)
    lits = ", ".join(f"({int(v)}::HUGEINT)" for v in vals)
    sql = f"""
    WITH src(v) AS (VALUES {lits}),
    {mix64_ctes('m', 'src', 'v', 'v')}
    SELECT {u64_bigint('x')} AS h FROM m5 ORDER BY v
    """
    got = duckdb.connect().execute(sql).fetchnumpy()["h"].view(np.uint64)
    assert (np.sort(got) == np.sort(exp)).all()


def test_sql_rolling_hash_matches_numpy():
    text = "the quick brown fox jumps over the lazy dog"
    k = 9
    exp = rolling_hashes(text.encode(), k)
    pow_list = pow_list_sql(1000000007, k)
    sql = f"""
    WITH
    {bytes_cte('(SELECT 1 AS doc_id, ? AS text)', 'text', 'doc_id')},
    rollp AS (
        SELECT doc_id, w,
               sum(b::HUGEINT * ({pow_list})[({k} - 1 - p + w) + 1])
                 % {U64_MOD} AS poly
        FROM dbytes,
             LATERAL (SELECT unnest(generate_series(greatest(1, p - {k - 1}),
                                                    least(n - {k - 1}, p))) AS w) _
        WHERE n >= {k} GROUP BY doc_id, w
    ),
    {mix64_ctes('m', 'rollp', 'doc_id, w', 'poly')}
    SELECT {u64_bigint('x')} AS h FROM m5 ORDER BY w
    """
    got = duckdb.connect().execute(sql, [text]).fetchnumpy()["h"].view(np.uint64)
    assert (got == exp).all()


def test_sql_hash64_str_matches_numpy():
    # the uid path: whole-string poly ^ mix64(len + seeded golden)
    url = "https://docs7.example/0123456789abcdef"
    seed = 3
    exp = int(hash64_str([url], seed=seed)[0])
    n = len(url)
    pow_list = pow_list_sql(1000000007, n)
    sd = hash64_seed(seed)
    sql = f"""
    WITH ub AS (
        SELECT 1 AS id, {n} AS un, p, ascii(substr(?, p, 1)) AS b
        FROM (SELECT unnest(generate_series(1, {n})) AS p)
    ),
    up AS (SELECT id, any_value(un) AS un,
                  sum(b::HUGEINT * ({pow_list})[(un - p) + 1]) % {U64_MOD} AS poly
           FROM ub GROUP BY id),
    {mix64_ctes('lm', 'up', 'id, poly', f'(un + {sd}::HUGEINT) % {U64_MOD}')},
    {mix64_ctes('uh', 'lm5', 'id', 'xor(poly, x)')}
    SELECT {u64_bigint('x')} AS h FROM uh5
    """
    got = duckdb.connect().execute(sql, [url]).fetchone()[0]
    assert got % (1 << 64) == exp  # int64 bit-view -> u64


# --------------------------------------------------------------------------
# end-to-end oracle parity at sf0.001 (the driver's protocol)
# --------------------------------------------------------------------------

def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.mark.parametrize("name", [
    "doc_fingerprints",
    "simhash_pairs",
    "minhash_lsh_pairs",
    "long_substring_pairs",
    "dedup_pipeline",
    "ann_ivf_topk",
    "ann_lsh_topk",
])
def test_query_matches_registered_oracle(name):
    from deduplicator_go_ray.pipelines.registry import oracle_sql, queries

    mine = _canon(_to_pandas(queries()[name](SF)))
    gold = _canon(_con().execute(oracle_sql()[name]).fetch_df())
    assert list(mine.columns) == list(gold.columns)
    assert len(mine) == len(gold)
    for c in mine.columns:
        a, b = mine[c], gold[c]
        if a.dtype.kind == "f":
            assert np.allclose(a.to_numpy(), b.to_numpy(), atol=1e-9)
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), f"column {c} differs"


# --------------------------------------------------------------------------
# property: the byte-level SQL kernels are exact for arbitrary unicode
# (the corpus is ASCII; these pin the general case)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=6))
def test_fingerprint_oracle_exact_on_unicode(texts):
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile

    from deduplicator_go_ray.functions.textstats import fingerprint64
    from deduplicator_go_ray.pipelines.textqc import _fingerprint_oracle_sql

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/documents.parquet"
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), path)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        got = con.execute(_fingerprint_oracle_sql()).fetchdf()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = np.array([fingerprint64(t) for t in texts],
                   dtype=np.uint64).view(np.int64)
    assert (got["fingerprint"].to_numpy() == exp).all()


def test_flagship_oracle_on_exact_dup_corpus(ray_session, tmp_path):
    """The driver corpus has no exact-text duplicates, so its gate never
    exercises the oracle's `exact` match-kind branch; this synthetic
    corpus hits all four kinds (exact / near / substring / unique) and
    asserts Ray-vs-SQL equality on the full assignment table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_go_ray.pipelines.registry import oracle_sql, queries

    base = ("data query row scan merge sort hash join filter table "
            "column batch stream window value part key agg index page ")
    long = (base * 6).strip()                   # ~700 chars
    texts = [
        long,                                    # rep of exact group
        long,                                    # exact dup
        long,                                    # exact dup
        long.replace("merge", "blend", 2),       # near dup of the group
        "the quick brown fox " + long[:400],     # contains a long run
        long[:300],                              # embedded in others
        "totally different tiny document",       # unique
        "another unrelated page about nothing in particular " * 8,
        # isolated exact group: near/substring-free, so its members keep
        # match_kind == 'exact' (the precedence branch under test)
        "standalone exact duplicate content with its own vocabulary",
        "standalone exact duplicate content with its own vocabulary",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(len(texts))],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    mine = _canon(_to_pandas(queries()["dedup_pipeline"](str(tmp_path))))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    gold = _canon(con.execute(oracle_sql()["dedup_pipeline"]).fetch_df())
    assert "exact" in set(mine["match_kind"])   # the branch under test
    pd.testing.assert_frame_equal(mine, gold)

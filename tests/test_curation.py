"""Curation-query tests: repetition kernel edge cases, split determinism
and stratified-sample consistency (sf0.001 inputs).

The four queries are SQL-oracled (tools/check_oracle.py / the driver's
DuckDB comparison); these tests pin the kernel semantics the oracle
hash alone doesn't explain — known-answer repetition values, the
md5-split partition law, and batch-size invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries()


def test_repetition_kernel_known_answers():
    from deduplicator_go_ray.pipelines.curation import _repetition_frame

    texts = [
        "a b c d",              # all distinct: 0/0, top gram 1 of 3
        "a a a a",              # 3 dup words of 4; top gram "a a" = 3/3
        "x\nx\ny",              # 1 dup line of 3; one "word", no grams
        "",                     # empty: all zeros
        "solo",                 # single word, no grams
    ]
    out = _repetition_frame(np.arange(5, dtype=np.int64), texts)
    assert out["dup_word_permille"].tolist() == [0, 750, 0, 0, 0]
    assert out["dup_line_permille"].tolist() == [0, 0, 333, 0, 0]
    assert out["top_2gram_permille"].tolist() == [333, 1000, 0, 0, 0]


def test_repetition_batchsize_invariant():
    from deduplicator_go_ray.pipelines.curation import _repetition_frame

    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(["a", "b", "c", "dd"], size=rng.integers(0, 30)))
        for _ in range(64)
    ]
    ids = np.arange(64, dtype=np.int64)
    whole = _repetition_frame(ids, texts)
    parts = pd.concat(
        [_repetition_frame(ids[i:i + 7], texts[i:i + 7])
         for i in range(0, 64, 7)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_split_is_pure_function_of_id(registry):
    a = registry["train_val_split"](SF_DIR).to_pandas()
    b = registry["train_val_split"](SF_DIR).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["split"]) <= {"train", "val"}
    # the split must partition the corpus (every doc exactly once)
    assert a["doc_id"].is_unique and len(a) == 500


def test_stratified_sample_counts_bounded_by_source_totals(registry):
    sample = registry["stratified_sample"](SF_DIR).to_pandas()
    totals = registry["source_stats"](SF_DIR).to_pandas()
    merged = sample.merge(totals, on="source", how="left")
    assert (merged["n_sampled"] <= merged["n_docs"]).all()
    # ~1/10 rate overall, generous tolerance at 500 docs
    assert 0.03 <= merged["n_sampled"].sum() / merged["n_docs"].sum() <= 0.25


def test_domain_cap_bounds_and_determinism(registry):
    from deduplicator_go_ray.pipelines.curation import _DOMAIN_CAP

    a = registry["domain_cap"](SF_DIR).to_pandas()
    b = registry["domain_cap"](SF_DIR).to_pandas()
    key = ["source", "rk"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    per_src = a.groupby("source").size()
    assert (per_src <= _DOMAIN_CAP).all()
    # ranks are 1..k contiguous within each source
    for _, g in a.groupby("source"):
        assert sorted(g["rk"]) == list(range(1, len(g) + 1))


def test_word_ngrams_kernel():
    from deduplicator_go_ray.pipelines.curation import _word_ngrams

    df = _word_ngrams(["a b c", "a b c d", "", "x"], 3)
    got = {(r, g) for r, g in zip(df["row"], df["gram"])}
    assert got == {(0, "a b c"), (1, "a b c"), (1, "b c d")}
    # distinct within a row: repeated gram counted once
    df2 = _word_ngrams(["a b a b a b"], 2)
    assert sorted(df2["gram"]) == ["a b", "b a"]


def test_contamination_excludes_benchmark_and_is_nonnegative(registry):
    from deduplicator_go_ray.pipelines.curation import _BENCH_MOD

    out = registry["contamination_check"](SF_DIR).to_pandas()
    assert (out["doc_id"] % _BENCH_MOD != 0).all()
    assert (out["n_contaminated_grams"] >= 0).all()
    # 500 docs minus the benchmark members (doc_id % 97 == 0: 6 of them)
    assert len(out) == 494


def test_length_quantiles_monotone_per_lang(registry):
    out = registry["length_quantiles"](SF_DIR).to_pandas()
    assert set(out["q_permille"]) == {250, 500, 900, 990}
    for _, g in out.groupby("lang"):
        g = g.sort_values("q_permille")
        assert g["n_chars_q"].is_monotonic_increasing
        assert len(g) == 4


def test_source_stats_totals_match_corpus(registry):
    stats = registry["source_stats"](SF_DIR).to_pandas()
    assert stats["n_docs"].sum() == 500
    assert (stats["n_en"] <= stats["n_docs"]).all()
    assert (stats["max_chars"] * stats["n_docs"] >= stats["total_chars"]).all()


def test_url_dedup_latest_argmax_law(registry):
    from deduplicator_go_ray.pipelines.curation import _TS_MOD, _URL_MOD

    out = registry["url_dedup_latest"](SF_DIR).to_pandas()
    # pure-python ground truth over the synthetic (url, ts) derivation
    ids = np.arange(500, dtype=np.int64)
    counts = {}
    best = {}
    for i in ids:
        k = int(i) % _URL_MOD
        counts[k] = counts.get(k, 0) + 1
        key = ((int(i) * 37) % _TS_MOD, int(i))
        if k not in best or key > best[k]:
            best[k] = key
    assert len(out) == len(best)
    got = out.set_index("url_key").sort_index()
    for k, (off, did) in sorted(best.items()):
        row = got.loc[k]
        assert int(row["keeper_id"]) == did
        assert int(row["latest_off"]) == off
        assert int(row["n_caps"]) == counts[k]


def test_url_dedup_latest_partition_invariant(ray_session):
    import ray.data as rd

    from deduplicator_go_ray.pipelines import curation as c

    frames = []
    for blocks in (1, 7):
        docs = rd.read_parquet(
            SF_DIR + "/documents.parquet", columns=["doc_id"],
            override_num_blocks=blocks)
        # same kernel path as the registry query, different blocking
        orig = c._read_docs
        try:
            c._read_docs = lambda _sf, _cols: docs
            frames.append(
                c.url_dedup_latest(SF_DIR).to_pandas()
                .sort_values("url_key").reset_index(drop=True))
        finally:
            c._read_docs = orig
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_topk_per_lang_rank_law(registry):
    out = registry["topk_per_lang"](SF_DIR).to_pandas()
    for _, g in out.groupby("lang"):
        g = g.sort_values("rk")
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert g["n_chars"].is_monotonic_decreasing or len(g) == 1
        assert len(g) <= 3


def test_top_words_counts_total(registry):
    import duckdb

    out = registry["top_words"](SF_DIR).to_pandas()
    assert len(out) == 20
    assert out["cnt"].is_monotonic_decreasing or out["cnt"].nunique() < 20
    # spot-check the champion against a direct count
    w = out.iloc[0]["word"]
    truth = duckdb.sql(
        f"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w
            FROM '{SF_DIR}/documents.parquet')
            SELECT COUNT(*) FROM words WHERE w = '{w}'""").fetchone()[0]
    assert out.iloc[0]["cnt"] == truth


def test_source_stats_null_lang(ray_session, tmp_path):
    """A null lang row counts as non-English instead of crashing the
    int cast — regression for the pc.equal null-propagation fix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplicator_go_ray.pipelines.curation import source_stats

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "c d", "e f"], pa.string()),
        "lang": pa.array(["en", None, "de"], pa.string()),
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
        "n_chars": pa.array([3, 3, 3], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = source_stats(str(tmp_path)).to_pandas()
    assert int(out.loc[out["source"] == "s0", "n_en"].iloc[0]) == 1

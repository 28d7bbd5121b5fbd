"""Vectorized batch text kernels: differential equality against the
per-row spec kernels (which stay as the readable oracle), and the
pluggable model slots (VERDICT r4 missing #2 / wrong #3)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplicator_go_ray.functions.textstats import (lang_id, lang_id_batch,
                                                     token_count_bpe,
                                                     token_count_bpe_batch)
from deduplicator_go_ray.pipelines.textqc import (STOPWORDS, _stop_counts,
                                                  _token_counts)

EDGE = [
    "", " ", "  ", "\n", "\t\t", "a", "it's", "don't", "we're they've",
    "I'll 'll 'llama", "'s", " 's", "  's", "x's", "1's", "''s", "!!'s",
    "'re 're", "'r", "'t", "'tt", "'ve!", "a1b c2d", "ab12cd",
    "äöü ßeta café", "naïve fiancé", "中文文本测试", "mixed 中文 and english",
    "  multiple   spaces  ", "tab\tsep\nnewline", "punct!!! ... ???",
    "a'b'c'd", "end'", "'", "' ", " ' ", "word' s", " nbsp's",
    " ls's", "the the the of of", "der die das und ist nicht",
    "le la les et est une", "el la los las y es una",
    "the und le el", "x\x00y", "a\x00 the", "çñáíóú être",
]


def test_bpe_batch_matches_scalar_on_edges():
    got = token_count_bpe_batch(EDGE)
    want = np.array([token_count_bpe(s) for s in EDGE])
    mism = [(s, int(g), int(w)) for s, g, w in zip(EDGE, got, want)
            if g != w]
    assert not mism, mism


def test_lang_id_batch_matches_scalar_on_edges():
    got = lang_id_batch(EDGE)
    want = [lang_id(s) for s in EDGE]
    mism = [(s, g, w) for s, g, w in zip(EDGE, got, want) if g != w]
    assert not mism, mism


def test_token_and_stop_counts_match_comprehensions_on_edges():
    got_t = _token_counts(EDGE)
    want_t = [sum(1 for t in s.split(" ") if t) for s in EDGE]
    assert got_t.tolist() == want_t
    stops = frozenset(STOPWORDS)
    got_s = _stop_counts(EDGE)
    want_s = [sum(1 for w in s.split(" ") if w in stops) for s in EDGE]
    assert got_s.tolist() == want_s


def test_batch_kernels_match_scalar_on_corpus():
    """Differential over real page texts (the corpus generator's
    near-dup families exercise long texts with punctuation)."""
    from deduplicator_go_ray.functions.text import extract_text
    from deduplicator_go_ray.sources.corpus import generate_pages

    tbl, _ = generate_pages(300, seed=11)
    texts = [extract_text(h)[0] for h in tbl["html"].to_pylist()[:300]]
    assert (token_count_bpe_batch(texts)
            == np.array([token_count_bpe(s) for s in texts])).all()
    assert lang_id_batch(texts) == [lang_id(s) for s in texts]
    assert _token_counts(texts).tolist() == [
        sum(1 for t in s.split(" ") if t) for s in texts]


# latin-1-ish alphabet with heavy whitespace/apostrophe/stopword mass
_ALPHA = ("abst demv l r e 'the und les el\t\n   ÄÖÜ ß é 中 !?.,"
          "0123 'll 've 're")


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=60), max_size=8))
def test_bpe_batch_matches_scalar_hypothesis(texts):
    assert token_count_bpe_batch(texts).tolist() == [
        token_count_bpe(s) for s in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=60), max_size=8))
def test_lang_id_batch_matches_scalar_hypothesis(texts):
    assert lang_id_batch(texts) == [lang_id(s) for s in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, max_size=60), max_size=8))
def test_token_stop_counts_match_hypothesis(texts):
    stops = frozenset(STOPWORDS)
    assert _token_counts(texts).tolist() == [
        sum(1 for t in s.split(" ") if t) for s in texts]
    assert _stop_counts(texts).tolist() == [
        sum(1 for w in s.split(" ") if w in stops) for s in texts]


# ---------------------------------------------------------------------------
# pluggable slots
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def test_lang_id_model_slot_rides_stage(ray_session):
    """A user model plugs into lang_id_pred via (name, factory) and its
    predictions flow through; the factory builds once per worker."""
    from deduplicator_go_ray.pipelines.textqc import lang_id_pred

    def factory():
        return lambda texts: ["xx"] * len(texts)

    out = lang_id_pred(SF_DIR, model=("const-xx", factory)).to_pandas()
    assert (out.pred_lang == "xx").all() and len(out) > 0


def test_bpe_tokenizer_slot_rides_stage(ray_session):
    from deduplicator_go_ray.pipelines.textqc import bpe_token_counts

    def factory():
        return lambda texts: [len(t) for t in texts]   # chars-as-tokens

    out = bpe_token_counts(
        SF_DIR, tokenizer=("chars", factory)).to_pandas()
    docs = __import__("pandas").read_parquet(
        SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    want = docs.set_index("doc_id").text.str.len()
    got = out.set_index("doc_id").n_bpe_tokens
    assert (got == want.loc[got.index]).all()


def test_quality_scorer_slot_defines_output_columns(ray_session):
    from deduplicator_go_ray.pipelines.textqc import quality_scores

    def factory():
        def score(texts, n_chars):
            return {"quality_x1000": np.minimum(
                np.asarray(n_chars, dtype=np.int64), 1000)}
        return score

    out = quality_scores(SF_DIR, scorer=("len-model", factory)).to_pandas()
    assert set(out.columns) == {"doc_id", "quality_x1000"}
    assert out.quality_x1000.between(0, 1000).all()


def test_slot_factory_builds_once_per_worker():
    """The kernel cache keys on the slot NAME — the factory runs once
    even when the stage function is called per batch (the extractor
    contract, stages/extract.py)."""
    from deduplicator_go_ray.pipelines import textqc

    calls = []

    def factory():
        calls.append(1)
        return lambda texts: ["yy"] * len(texts)

    slot = ("once-test", factory)
    k1 = textqc._resolve_kernel(slot, None)
    k2 = textqc._resolve_kernel(slot, None)
    assert k1 is k2 and calls == [1]
    assert textqc._resolve_kernel("deterministic", lang_id_batch) \
        is lang_id_batch

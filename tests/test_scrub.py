"""Scrub-operator tests: PII-mask known answers, boilerplate threshold
boundary, and blocking invariance of the two-pass frequent-line filter.

Both queries are SQL-oracled (tools/check_oracle.py); these pin the
kernel semantics the oracle hash alone doesn't explain.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries()


def test_pii_masking_known_answers(registry):
    out = (registry["pii_scrub"](SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 500
    # every row got exactly the injected email/phone/ip and nothing else
    assert (out["n_emails"] == 1).all()
    assert (out["n_phones"] == 1).all()
    assert (out["n_ips"] == 1).all()
    row = out.iloc[3]
    assert row["clean_text"].endswith("contact [EMAIL] or [PHONE] from [IP]")
    assert "@" not in row["clean_text"]


def test_pii_kernel_masks_freeform_text():
    from deduplicator_go_ray.pipelines.scrub import (
        _EMAIL_RE, _IP_RE, _PHONE_RE)
    import pyarrow.compute as pc

    raw = pa.array([
        "mail a.b-c%d@sub.domain.co.uk now",
        "call +44-123-4567 or visit 192.168.0.1",
        "no pii here",
    ])
    clean = raw
    for pat, rep in ((_EMAIL_RE, "[EMAIL]"), (_PHONE_RE, "[PHONE]"),
                     (_IP_RE, "[IP]")):
        clean = pc.replace_substring_regex(clean, pattern=pat, replacement=rep)
    assert clean.to_pylist() == [
        "mail [EMAIL] now",
        "call [PHONE] or visit [IP]",
        "no pii here",
    ]


def test_boilerplate_threshold_boundary(registry):
    from deduplicator_go_ray.pipelines.scrub import _FOOTER, _NAV

    out = (registry["boilerplate_lines"](SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 500
    # 500 docs, 10% threshold = 50: nav(500), footer(500), sec k (~71)
    # cross it; tag k (~45) and the unique body line do not
    assert (out["n_dropped"] == 3).all()
    for txt in out["clean_text"].head(20):
        lines = txt.split("\n")
        assert len(lines) == 2
        assert lines[1].startswith("tag ")
        assert _NAV not in txt and _FOOTER not in txt
        assert not any(l.startswith("sec ") for l in lines)


def test_boilerplate_blocking_invariant(ray_session):
    import ray.data as rd

    from deduplicator_go_ray.pipelines import scrub as s

    frames = []
    for blocks in (1, 9):
        docs = rd.read_parquet(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"],
            override_num_blocks=blocks)
        orig = s._read_docs
        try:
            s._read_docs = lambda _sf, _cols: docs
            frames.append(
                s.boilerplate_lines(SF_DIR).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        finally:
            s._read_docs = orig
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_curation_pipeline_stages_visible(registry):
    out = (registry["curation_pipeline"](SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # stage 1: only url-family keepers survive (97 families at 500 docs)
    assert 0 < len(out) <= 97
    for txt in out["final_text"]:
        # stage 2: boilerplate nav/footer/sec dropped, tag kept
        assert "home | about" not in txt and "copyright" not in txt
        assert "\ntag " in txt
        # stage 3: PII masked
        assert txt.endswith("contact [EMAIL] or [PHONE] from [IP]")
        # stage 4: length floor
        assert len(txt) >= 250
    # stage 5: content hashes unique after keep-first
    assert out["content_hash"].is_unique


def test_line_dedup_first_keep_first_law(registry):
    from deduplicator_go_ray.pipelines.scrub import _FOOTER, _NAV

    out = (registry["line_dedup_first"](SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 500
    # exactly one copy of every duplicated line survives corpus-wide:
    # nav + footer keep 1 of 500 each, sec k 1 of ~71 (7 families),
    # tag k 1 of ~45 (11 families) -> total drops = 4*500 - (unique
    # body lines) - (2 + 7 + 11 survivors)... assert the exact global
    # invariant instead: drops = occurrences - distinct lines among
    # duplicated families = (500-1)*2 + (500-7) + (500-11)
    assert int(out["n_dropped"].sum()) == (499 * 2) + 493 + 489
    first = out.iloc[0]
    # the globally-first doc keeps its full page
    assert first["n_dropped"] == 0
    assert first["clean_text"].startswith(_NAV)
    assert first["clean_text"].endswith(_FOOTER)
    # every later doc loses nav and footer (both owned by the first doc)
    later = out.iloc[1:]
    assert (later["n_dropped"] >= 2).all()
    assert not later["clean_text"].str.contains(_NAV, regex=False).any()


def test_line_dedup_first_plans_equal(ray_session):
    from deduplicator_go_ray.pipelines.scrub import (_read_docs,
                                                     line_dedup_first_ds)

    frames = []
    for plan in ("broadcast", "keyed"):
        frames.append(
            line_dedup_first_ds(_read_docs(SF_DIR, ["doc_id", "text"]),
                                plan=plan)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_line_dedup_first_blocking_invariant(ray_session):
    import ray.data as rd

    from deduplicator_go_ray.pipelines import scrub as s

    frames = []
    for blocks in (1, 9):
        docs = rd.read_parquet(
            SF_DIR + "/documents.parquet", columns=["doc_id", "text"],
            override_num_blocks=blocks)
        frames.append(
            s.line_dedup_first_ds(docs, plan="keyed").to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_normalize_text_known_answers(registry):
    out = (registry["normalize_text"](SF_DIR).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 500
    first = out.iloc[0]
    # NFC composed the decomposed e+U+0301 (pyarrow's utf8_normalize
    # does NOT — see the docstring), whitespace runs collapsed, edges
    # trimmed
    assert first["norm_text"].endswith(" café x0")
    assert "́" not in first["norm_text"]
    assert "\t" not in first["norm_text"] and "  " not in first["norm_text"]
    assert not first["norm_text"].endswith(" ")
    # the suffix alone loses >= 5 codepoints to compose+collapse+trim
    assert ((out["n_chars_raw"] - out["n_chars_norm"]) >= 5).all()
    # pure-Python reference on a sample of rows
    import re
    import unicodedata

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY doc_id LIMIT 5").fetchall()
    for doc_id, text in docs:
        raw = text + " cafe\u0301\t  x" + str(doc_id % 5) + "\n "
        want = re.sub(r"\s+", " ",
                      unicodedata.normalize("NFC", raw)).strip(" ")
        got = out.loc[out["doc_id"] == doc_id, "norm_text"].iloc[0]
        assert got == want


def test_line_dedup_first_zero_dup_corpus(ray_session):
    # ADVICE r2: numpy & does not short-circuit, so an empty winner set
    # (single doc -> no line occurs twice corpus-wide) used to
    # IndexError in BOTH plans (broadcast drop_later, keyed rebuild)
    import ray.data as rd

    from deduplicator_go_ray.pipelines.scrub import line_dedup_first_ds

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["only body line"], pa.string()),
    }))
    for plan in ("broadcast", "keyed"):
        out = line_dedup_first_ds(docs, plan=plan).to_pandas()
        assert len(out) == 1
        assert out["n_dropped"].iloc[0] == 0
        assert "only body line" in out["clean_text"].iloc[0]


def test_line_dedup_first_huge_owner_keys_exact(ray_session):
    # ADVICE r2: wins.reindex(...).fillna(-1) upcast owner keys through
    # float64, silently corrupting keep/drop compares past 2^53.  With
    # doc_id ~ 2^50 the owner key (doc_id*1024+ln) sits near 2^60 where
    # float64 spacing is 128 -- the bug makes every occurrence look like
    # the winner and nothing gets dropped on the keyed (scale) plan.
    import ray.data as rd

    from deduplicator_go_ray.pipelines.scrub import line_dedup_first_ds

    base = 2 ** 50
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([base, base + 1], pa.int64()),
        "text": pa.array(["shared body line", "shared body line"],
                         pa.string()),
    }))
    frames = {}
    for plan in ("broadcast", "keyed"):
        frames[plan] = (line_dedup_first_ds(docs, plan=plan).to_pandas()
                        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(frames["broadcast"], frames["keyed"])
    out = frames["keyed"]
    # doc base owns nav, body and footer; doc base+1 loses all three
    assert out["n_dropped"].tolist() == [0, 3]
    assert "shared body line" not in out["clean_text"].iloc[1]

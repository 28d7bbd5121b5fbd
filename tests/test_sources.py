"""Multi-format pages ingestion: JSONL and CSV land on the same
canonical Arrow schema as Parquet (S1 — the reference ingests whatever
files the walk finds; files/process.go:19-128).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from deduplicator_go_ray.sources.pages import (PAGES_COLUMNS,
                                               _infer_format, read_pages)

_ROWS = [
    # url, epoch-us, html, text, lang
    ("https://a.example/1", 1_577_836_800_000_000,
     "<html><body><p>alpha beta</p></body></html>", "alpha beta", "en"),
    ("https://a.example/2", 1_577_836_860_000_000,
     "<html><body><p>comma, \"quote\" and\nnewline</p></body></html>",
     "comma, \"quote\" and\nnewline", "en"),
    ("https://b.example/3", 1_577_836_920_000_000,
     "<html><body><p>zahl drei</p></body></html>", "zahl drei", "de"),
    ("https://b.example/4", 1_577_836_980_000_000, None, None, None),
]


def _canonical() -> pa.Table:
    return pa.table({
        "url": pa.array([r[0] for r in _ROWS], pa.string()),
        "warc_ts": pa.array([r[1] for r in _ROWS], pa.int64()).cast(
            pa.timestamp("us")),
        "html": pa.array(
            [r[2].encode() if r[2] is not None else None for r in _ROWS],
            pa.binary()),
        "text": pa.array([r[3] for r in _ROWS], pa.string()),
        "lang": pa.array([r[4] for r in _ROWS], pa.string()),
    })


def _as_frame(ds) -> pd.DataFrame:
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    df["html"] = df["html"].map(
        lambda b: bytes(b) if b is not None else None)
    return df


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("pages_formats")
    want = _canonical()

    pq_dir = root / "parquet"
    pq_dir.mkdir()
    pq.write_table(want, pq_dir / "part-0.parquet")

    jl_dir = root / "jsonl"
    jl_dir.mkdir()
    with open(jl_dir / "part-0.jsonl", "w") as f:
        for url, ts, html, text, lang in _ROWS:
            f.write(json.dumps({"url": url, "warc_ts": ts, "html": html,
                                "text": text, "lang": lang}) + "\n")

    csv_dir = root / "csv"
    csv_dir.mkdir()
    csv_tbl = pa.table({
        "url": want["url"],
        "warc_ts": pa.array([r[1] for r in _ROWS], pa.int64()),
        "html": pa.array([r[2] for r in _ROWS], pa.string()),
        "text": want["text"],
        "lang": want["lang"],
    })
    pacsv.write_csv(csv_tbl, csv_dir / "part-0.csv")

    return {"parquet": str(pq_dir), "jsonl": str(jl_dir),
            "csv": str(csv_dir), "want": want}


def test_format_inference(corpora):
    assert _infer_format(corpora["parquet"]) == "parquet"
    assert _infer_format(corpora["jsonl"]) == "json"
    assert _infer_format(corpora["csv"]) == "csv"
    assert _infer_format("/x/pages.ndjson") == "json"
    assert _infer_format("/x/pages.csv") == "csv"


def test_jsonl_and_csv_match_parquet(ray_session, corpora):
    want = _as_frame(read_pages(corpora["parquet"]))
    assert list(want.columns) == PAGES_COLUMNS
    for key in ("jsonl", "csv"):
        got = _as_frame(read_pages(corpora[key]))
        pd.testing.assert_frame_equal(got, want)


def test_iso_string_timestamps(ray_session, tmp_path):
    path = tmp_path / "iso.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"url": "https://a.example/1",
                            "warc_ts": "2020-01-01T00:00:00",
                            "text": "x"}) + "\n")
    df = read_pages(str(path)).to_pandas()
    assert df.loc[0, "warc_ts"] == pd.Timestamp("2020-01-01T00:00:00")
    # absent columns come back as typed nulls, schema stays canonical
    assert list(df.columns) == PAGES_COLUMNS
    assert df.loc[0, "html"] is None and df.loc[0, "lang"] is None


def test_column_pruning_arg(ray_session, corpora):
    got = read_pages(corpora["jsonl"], columns=["url", "lang"]).to_pandas()
    assert list(got.columns) == ["url", "lang"]


def test_cli_jsonl_in_jsonl_out(ray_session, tmp_path, monkeypatch):
    """The CLI flagship runs on a JSONL corpus and can sink JSONL."""
    import ray

    # cmd_run tears the session down for standalone use; keep the
    # shared test session alive
    monkeypatch.setattr(ray, "shutdown", lambda: None)
    from deduplicator_go_ray.__main__ import main

    src = tmp_path / "pages.jsonl"
    with open(src, "w") as f:
        for url, ts, html, text, lang in _ROWS[:3]:
            f.write(json.dumps({"url": url, "warc_ts": ts, "html": html,
                                "text": text, "lang": lang}) + "\n")
    out = tmp_path / "assignments"
    rc = main(["run", "--input", str(src), "--output", str(out),
               "--output-format", "jsonl",
               "--no-substring", "--no-simhash"])
    assert rc == 0
    rows = [json.loads(line)
            for p in sorted(out.iterdir()) for line in open(p)]
    assert {r["url"] for r in rows} == {r[0] for r in _ROWS[:3]}
    assert all(r["action"] in ("keep", "drop", "error") for r in rows)


def test_cli_ray_attach_respects_ambient_cluster(monkeypatch):
    """`ray job submit` contract: with RAY_ADDRESS pointing at a
    cluster the CLI attaches to it (and never passes the start-only
    include_dashboard arg); only without one does it boot local."""
    import ray

    import deduplicator_go_ray.__main__ as m

    calls: dict = {}
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.setattr(ray, "init", lambda **kw: calls.update(kw))

    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    m._ray()
    assert calls["address"] == "ray://head:10001"
    assert "include_dashboard" not in calls

    calls.clear()
    monkeypatch.setenv("RAY_ADDRESS", "local")
    m._ray()
    assert calls["address"] == "local"
    assert calls["include_dashboard"] is False


def test_ndjson_and_gz_inference_and_read(ray_session, tmp_path):
    src = tmp_path / "pages.ndjson"
    with open(src, "w") as f:
        f.write(json.dumps({"url": "u", "warc_ts": 1, "text": "x"}) + "\n")
    assert _infer_format(str(src)) == "json"
    df = read_pages(str(src)).to_pandas()
    assert df.loc[0, "url"] == "u"
    # directory whose first sorted entries are a subdir and a README:
    # inference skips to the recognized data file
    d = tmp_path / "mixed"
    (d / "00_nested").mkdir(parents=True)
    (d / "README.txt").write_text("notes")
    (src2 := d / "part-0.jsonl").write_text(
        json.dumps({"url": "v", "warc_ts": 2, "text": "y"}) + "\n")
    assert _infer_format(str(d)) == "json"
    assert _infer_format("/x/part-0.jsonl.gz") == "json"
    # the read of that mixed directory must skip the README (and the
    # subdir) instead of failing at parse time
    df2 = read_pages(str(d)).to_pandas()
    assert list(df2["url"]) == ["v"]


def test_json_dir_unusual_shard_names(ray_session, tmp_path):
    # uppercase extension: recognized by inference (case-folded) — the
    # read filter must keep it too (Ray's endswith match is
    # case-sensitive, so the filter derives suffixes from the actual
    # listing)
    d = tmp_path / "upper"
    d.mkdir()
    (d / "PART-0.JSONL").write_text(
        json.dumps({"url": "a", "warc_ts": 1, "text": "x"}) + "\n")
    (d / "part-1.jsonl").write_text(
        json.dumps({"url": "b", "warc_ts": 2, "text": "y"}) + "\n")
    df = read_pages(str(d)).to_pandas()
    assert sorted(df["url"]) == ["a", "b"]

    # extension-less shards with fmt forced: no recognized suffix in the
    # listing → permissive fallback reads every entry (old behavior)
    d2 = tmp_path / "bare"
    d2.mkdir()
    (d2 / "part-00000").write_text(
        json.dumps({"url": "c", "warc_ts": 3, "text": "z"}) + "\n")
    df2 = read_pages(str(d2), fmt="json").to_pandas()
    assert list(df2["url"]) == ["c"]


def test_warc_ts_string_variants(ray_session, tmp_path):
    rows = [
        {"url": "a", "warc_ts": "2020-01-01T00:00:05"},
        {"url": "b", "warc_ts": "2020-01-01 00:00:05"},
        {"url": "c", "warc_ts": "2020-01-01T00:00:05.123456"},
        {"url": "d", "warc_ts": "2020-01-01"},
    ]
    src = tmp_path / "ts.jsonl"
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = read_pages(str(src)).to_pandas().sort_values("url")
    ts = df["warc_ts"].tolist()
    assert ts[0] == ts[1] == ts[2] == pd.Timestamp("2020-01-01T00:00:05")
    assert ts[3] == pd.Timestamp("2020-01-01T00:00:00")
    # uniformly tz-aware inputs parse natively in the Arrow JSON reader
    # and convert to naive UTC
    tz = tmp_path / "tz.jsonl"
    tz.write_text(json.dumps(
        {"url": "e", "warc_ts": "2020-01-01T00:00:05+02:00"}) + "\n")
    df2 = read_pages(str(tz)).to_pandas()
    assert df2.loc[0, "warc_ts"] == pd.Timestamp("2019-12-31T22:00:05")
    # mixed offset/naive strings dodge the reader's inference and reach
    # the string path, which fails loudly instead of silently shifting
    bad = tmp_path / "tz_mixed.jsonl"
    bad.write_text(
        json.dumps({"url": "f", "warc_ts": "2020-01-01T00:00:05+02:00"})
        + "\n"
        + json.dumps({"url": "g", "warc_ts": "bad 2020"}) + "\n")
    with pytest.raises(Exception, match="timezone-aware"):
        read_pages(str(bad)).to_pandas()


def test_csv_literal_na_survives(ray_session, tmp_path):
    import pyarrow.csv as _pacsv

    d = tmp_path / "csv"
    d.mkdir()
    tbl = pa.table({"url": ["u1", "u2"], "warc_ts": [1, 2],
                    "text": ["NA", None], "lang": ["nan", "en"]})
    _pacsv.write_csv(tbl, d / "p.csv")
    df = read_pages(str(d)).to_pandas().sort_values("url")
    # literal 'NA'/'nan' cells are data; only empty cells are null
    assert df["text"].tolist()[0] == "NA"
    assert df["lang"].tolist()[0] == "nan"
    assert df["text"].tolist()[1] is None


def test_cli_rejects_checkpointed_jsonl(ray_session, tmp_path, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda: None)
    from deduplicator_go_ray.__main__ import main

    rc = main(["run", "--input", str(tmp_path), "--output",
               str(tmp_path / "o"), "--checkpointed",
               "--output-format", "jsonl"])
    assert rc == 2


def test_warc_roundtrip_plain_and_gz(ray_session, tmp_path):
    # WARC (ISO 28500) shards land on the same canonical schema as
    # parquet/jsonl/csv ingest; .warc.gz uses the Common Crawl
    # one-gzip-member-per-record layout
    import pandas as pd

    from deduplicator_go_ray.sources.pages import _infer_format
    from deduplicator_go_ray.sources.warc import write_warc

    rows = [
        ("https://a.example.org/x", "2017-10-24T12:30:45Z",
         b"<html><body><p>alpha page</p></body></html>"),
        ("https://b.example.org/y", "2018-01-02T03:04:05Z",
         b"<html><body><p>beta page</p></body></html>"),
        ("https://c.example.org/z", "2019-06-07T08:09:10Z",
         b"<html><body><p>gamma page</p></body></html>"),
    ]
    d = tmp_path / "warc"
    d.mkdir()
    write_warc(str(d / "shard-0.warc"), rows[:2])
    write_warc(str(d / "shard-1.warc.gz"), rows[2:], gzip_members=True)

    assert _infer_format(str(d)) == "warc"
    df = read_pages(str(d)).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert list(df.columns) == PAGES_COLUMNS
    assert df["url"].tolist() == [r[0] for r in rows]
    assert df["html"].tolist() == [r[2] for r in rows]
    assert df["text"].isna().all() and df["lang"].isna().all()
    want_ts = pd.to_datetime([r[1][:-1] for r in rows])
    assert df["warc_ts"].tolist() == list(want_ts)


def test_warc_skips_noncontent_records(ray_session, tmp_path):
    # warcinfo/request records are skipped; resource records map the
    # raw payload; response bodies drop the HTTP header block
    from deduplicator_go_ray.sources.warc import warc_file_to_table

    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x/q\r\nContent-Length: 3\r\n\r\n"
        b"GET\r\n\r\n"
        b"WARC/1.1\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: <https://x/r>\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\nContent-Length: 5\r\n\r\n"
        b"hello\r\n\r\n"
    )
    t = warc_file_to_table(raw)
    assert t["url"].to_pylist() == ["https://x/r"]
    assert t["html"].to_pylist() == [b"hello"]
    assert t["warc_ts"].to_pylist() == ["2020-01-01T00:00:00"]


def test_flagship_runs_on_warc_fixture(ray_session, tmp_path):
    # end-to-end: WARC shard -> read_pages -> run_dedup assignments
    from deduplicator_go_ray.pipelines.dedup import run_dedup
    from deduplicator_go_ray.sources.warc import write_warc

    body = b"<html><body><p>" + b"the same duplicated page text " * 20 \
        + b"</p></body></html>"
    uniq = b"<html><body><p>a completely different page</p></body></html>"
    rows = [
        ("https://dup1.example.org/", "2020-05-05T05:05:05Z", body),
        ("https://dup2.example.org/", "2020-05-05T05:05:06Z", body),
        ("https://uniq.example.org/", "2020-05-05T05:05:07Z", uniq),
    ]
    shard = tmp_path / "crawl.warc.gz"
    write_warc(str(shard), rows, gzip_members=True)

    out = run_dedup(read_pages(str(shard))).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(out) == 3
    cl = dict(zip(out["url"], out["cluster_id"]))
    assert cl["https://dup1.example.org/"] == cl["https://dup2.example.org/"]
    assert cl["https://uniq.example.org/"] != cl["https://dup1.example.org/"]
    keep = out[out["action"] == "keep"]["url"].tolist()
    assert "https://uniq.example.org/" in keep


def test_warc_gz_tolerates_trailing_junk(ray_session, tmp_path):
    """A .warc.gz shard with trailing zero-padding (interrupted
    transfer / padded tooling) must still yield its valid records
    instead of failing the whole shard task."""
    from deduplicator_go_ray.sources.warc import (read_warc,
                                                  warc_file_to_table,
                                                  write_warc)

    p = str(tmp_path / "shard.warc.gz")
    write_warc(p, [("http://e.x/a", "2017-10-24T12:30:45Z", b"<p>A</p>"),
                   ("http://e.x/b", "2017-10-24T12:30:46Z", b"<p>B</p>")],
               gzip_members=True)
    with open(p, "ab") as f:
        f.write(b"\x00" * 512)
    t = warc_file_to_table(p)
    assert t["url"].to_pylist() == ["http://e.x/a", "http://e.x/b"]
    assert read_warc(p).count() == 2
    # a file that is not gzip at all still raises at parse time
    bad = str(tmp_path / "bad.warc.gz")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 64)
    import pytest as _pytest
    with _pytest.raises(Exception):
        warc_file_to_table(bad)


def test_warc_gz_recovers_after_midstream_corruption(ray_session, tmp_path):
    """A corrupt gzip member in the MIDDLE of a shard must not lose the
    records after it (ADVICE r3 #1): the decoder resyncs to the next
    member magic and surfaces the dropped-byte count as a warning."""
    import warnings

    from deduplicator_go_ray.sources.warc import (_gunzip_members,
                                                  warc_file_to_table,
                                                  write_warc)

    p = str(tmp_path / "shard.warc.gz")
    write_warc(p, [("http://e.x/a", "2017-10-24T12:30:45Z", b"<p>A</p>"),
                   ("http://e.x/b", "2017-10-24T12:30:46Z", b"<p>B</p>"),
                   ("http://e.x/c", "2017-10-24T12:30:47Z", b"<p>C</p>")],
               gzip_members=True)
    raw = open(p, "rb").read()
    magic = b"\x1f\x8b\x08"
    # member start offsets
    offs, i = [], 0
    while True:
        i = raw.find(magic, i)
        if i < 0:
            break
        offs.append(i)
        i += 1
    assert len(offs) == 3
    # replace the middle member with an invalid deflate stream
    bad = raw[:offs[1]] + magic + b"\xff" * 24 + raw[offs[2]:]
    dec, dropped = _gunzip_members(bad)
    assert dropped > 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = warc_file_to_table(bad, is_gzip=True)
    assert t["url"].to_pylist() == ["http://e.x/a", "http://e.x/c"]
    assert any("corrupt" in str(x.message) for x in w)


def test_warc_paths_manifest(ray_session, tmp_path):
    """Common Crawl's warc.paths manifest: one shard path per line,
    relative lines resolved against the manifest's directory."""
    import gzip

    from deduplicator_go_ray.sources.warc import read_warc, write_warc

    (tmp_path / "segments").mkdir()
    write_warc(str(tmp_path / "segments" / "s0.warc"),
               [("http://e.x/a", "2017-10-24T12:30:45Z", b"<p>A</p>")])
    write_warc(str(tmp_path / "segments" / "s1.warc.gz"),
               [("http://e.x/b", "2017-10-24T12:30:46Z", b"<p>B</p>")],
               gzip_members=True)
    man = tmp_path / "warc.paths"
    man.write_text("segments/s0.warc\nsegments/s1.warc.gz\n")
    got = sorted(read_warc(str(man)).to_pandas()["url"])
    assert got == ["http://e.x/a", "http://e.x/b"]
    # gzipped manifest, and read_pages format inference both work
    man_gz = tmp_path / "warc.paths.gz"
    man_gz.write_bytes(gzip.compress(man.read_bytes()))
    assert read_warc(str(man_gz)).count() == 2
    from deduplicator_go_ray.sources.pages import _infer_format, read_pages
    assert _infer_format(str(man)) == "warc"
    assert read_pages(str(man)).count() == 2

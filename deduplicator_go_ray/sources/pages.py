"""Pages-table sources.

``read_pages``: the production path — a Parquet directory/file of
Common-Crawl-style pages with columns (url, warc_ts, html, text, lang)
per BASELINE.json ``input_hint``, read with column pruning (≙ S1-S2,
``files/process.go:19-128`` / ``files/find.go:18-241``: ingest is a
parallel listing+stat, here Ray's parquet shard discovery).

``pages_from_documents``: deterministic adapter building a pages table
from the driver's read-only ``documents`` testdata table (doc_id, text,
lang, ...) — each document wrapped in the same HTML the synthetic
corpus uses so the extraction stage has real work, with url/warc_ts
derived from doc_id.  No randomness: bit-identical across runs.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data

from .corpus import EPOCH_US

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(path, columns=columns or PAGES_COLUMNS)


def _wrap_doc_html(title: str, body: str, url: str) -> bytes:
    paras = "".join(f"<p>{line}</p>" for line in body.split("\n"))
    return (
        f"<html><head><title>{title}</title></head><body>"
        f'<nav><a href="{url}" rel="home"></a></nav>{paras}'
        f"<script>var t=1;</script></body></html>"
    ).encode("utf-8")


def pages_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents(doc_id, text, lang, source, n_chars) → pages Dataset."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls, tss, htmls = [], [], []
        for i, t in zip(ids, texts):
            key = hashlib.md5(f"doc:{i}".encode()).hexdigest()[:16]
            url = f"https://docs{i % 89}.example/{key}"
            urls.append(url)
            tss.append(EPOCH_US + int(i) * 60_000_000)
            title = (t or "untitled").split(" ", 4)[:4]
            htmls.append(_wrap_doc_html(" ".join(title), t or "", url))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * len(urls), pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    return docs.map_batches(to_pages, batch_format="pyarrow")

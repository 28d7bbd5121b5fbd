"""HTML→text extraction stage (actor pool).

≙ M1/ST1 (SURVEY.md §2.2/2.3): the per-record heavy kernel slot.  The
compiled regex tables live at module import, the class exists so the
stage runs on an actor pool (`concurrency=(n,m)`) like every stateful
stage; per-row failures become in-band ``error`` sentinels
(≙ ``files/hash.go:245-264``) instead of failing the batch.

The wide ``html`` binary column is DROPPED on output — the single most
important memory decision at 100 TB (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import extract_text


class ExtractStage:
    """map_batches callable: (url, warc_ts, html, lang) → (+text, +error, -html)."""

    def __init__(self, html_col: str = "html", prefer_existing_text: bool = False):
        self.html_col = html_col
        self.prefer_existing_text = prefer_existing_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        existing = (
            batch["text"].to_pylist()
            if self.prefer_existing_text and "text" in batch.column_names
            else [None] * len(htmls)
        )
        texts, errors = [], []
        for h, pre in zip(htmls, existing):
            if pre:
                texts.append(pre)
                errors.append(None)
                continue
            try:
                t, err = extract_text(h)
            except Exception:
                t, err = "", "HASH_ERROR"
            texts.append(t)
            errors.append(err)
        out = batch.drop_columns([self.html_col])
        if "text" in out.column_names:
            out = out.drop_columns(["text"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        return out.append_column("error", pa.array(errors, pa.string()))

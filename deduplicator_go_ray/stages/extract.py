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

from collections.abc import Callable

import pyarrow as pa

from ..functions.text import extract_text


class ExtractStage:
    """map_batches callable: (url, warc_ts, html, lang) → (+text, +error, -html).

    ``timeout_s`` arms a per-row wall-clock watchdog ≙ the reference's
    60 s inactivity timeout (``files/files.go:33-71``): a row whose
    extraction exceeds the budget gets an in-band ``TIMEOUT_ERROR``
    sentinel and the batch moves on.  The hung worker thread is
    abandoned and replaced (bounded leak, one thread per timeout —
    exactly the reference's abandoned-goroutine tradeoff).  Default off:
    the dispatch overhead (~10 µs/row) is only worth paying when inputs
    may be pathological.

    The extractor SLOT (VERDICT r3 #5, mirroring the multimodal
    ``decoder=`` pattern): the default is the deterministic
    public-knowledge kernel (``functions/text.py`` — the oracle twin);
    a production extractor plugs in without touching the pipeline via
    either

    * ``extract_fn`` — an already-built ``html -> (text, err|None)``
      callable (tests, cheap stateless extractors), or
    * ``extract_factory`` — a zero-arg factory producing that callable,
      invoked ONCE per actor / worker process in ``__init__`` — the
      place to load a model or compile heavy tables.  With the
      pipeline's task-based plan the built stage is cached per worker
      process (``pipelines/dedup.py:_extract_cached``), so the factory
      cost is paid once per worker either way.
    """

    def __init__(self, html_col: str = "html", prefer_existing_text: bool = False,
                 timeout_s: float | None = None,
                 extract_fn: Callable | None = None,
                 extract_factory: Callable | None = None):
        self.html_col = html_col
        self.prefer_existing_text = prefer_existing_text
        self.timeout_s = timeout_s
        if extract_fn is not None and extract_factory is not None:
            raise ValueError("pass extract_fn OR extract_factory, not both")
        if extract_factory is not None:
            extract_fn = extract_factory()   # once per actor/worker
        self.extract_fn = extract_fn or extract_text
        self._pool = None

    def _run_with_timeout(self, html) -> tuple[str, str | None]:
        import concurrent.futures as cf

        if self._pool is None:
            self._pool = cf.ThreadPoolExecutor(max_workers=1)
        fut = self._pool.submit(self.extract_fn, html)
        try:
            return fut.result(timeout=self.timeout_s)
        except cf.TimeoutError:
            # abandon the hung thread; next row gets a fresh one
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
            return "", "TIMEOUT_ERROR"

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
                if self.timeout_s is not None:
                    t, err = self._run_with_timeout(h)
                else:
                    t, err = self.extract_fn(h)
            except Exception:
                t, err = "", "HASH_ERROR"
            texts.append(t)
            errors.append(err)
        out = batch.drop_columns([self.html_col])
        if "text" in out.column_names:
            out = out.drop_columns(["text"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        return out.append_column("error", pa.array(errors, pa.string()))

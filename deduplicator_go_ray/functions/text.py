"""Deterministic HTML → text extraction.

The reference has no HTML code — its per-record heavy kernel is the
streaming SHA-256 hasher (``files/files.go:18-156``); the north rule
puts HTML→text extraction in that slot with a hard invariant:
**byte-identical extracted text per url across runs and across
partitionings** (BASELINE.json input_hint).  So the extractor is pure
Python + compiled regexes — no library whose version could drift, no
state that leaks across rows, no dependence on batch boundaries.  Its
first output is frozen as the conformance golden (SURVEY.md §7.4).

Error handling mirrors the reference's in-band sentinels
(``files/hash.go:245-264``): a row whose bytes fail to decode or whose
extraction comes out empty gets an ``error`` string and empty text;
downstream stages filter ``error IS NULL`` like ``files/utils.go:72``.
"""

from __future__ import annotations

import html as _htmlmod
import re

EXTRACTOR_VERSION = "1"  # bump on any behavior change; goldens are per-version

# Compiled once at import; actors reuse them for every batch (ST1 slot).
_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
# block-level tags become newlines so paragraph structure survives
_BLOCK_TAG_RE = re.compile(
    rb"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|nav|header|footer|section|article|title|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_SPACE_RUN_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RUN_RE = re.compile(r" ?\n[ \n]*")


def extract_text(html_bytes: bytes) -> tuple[str, str | None]:
    """Extract visible text from raw page bytes.

    Returns ``(text, error)`` — exactly one of them is meaningful:
    on failure text is ``""`` and error is a sentinel string.

    Pipeline (all steps order-fixed, version-pinned):
    strip script/style/comment blocks → block tags to newlines → drop
    remaining tags → utf-8 strict decode → unescape entities →
    collapse horizontal whitespace → collapse newline runs → strip.
    """
    if html_bytes is None or len(html_bytes) == 0:
        return "", "EMPTY_ERROR"
    raw = _SCRIPT_RE.sub(b" ", html_bytes)
    raw = _STYLE_RE.sub(b" ", raw)
    raw = _COMMENT_RE.sub(b" ", raw)
    raw = _BLOCK_TAG_RE.sub(b"\n", raw)
    raw = _TAG_RE.sub(b" ", raw)
    try:
        s = raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return "", "DECODE_ERROR"
    s = _htmlmod.unescape(s)
    s = _SPACE_RUN_RE.sub(" ", s)
    s = _NL_RUN_RE.sub("\n", s)
    s = s.strip()
    if not s:
        return "", "EMPTY_ERROR"
    return s, None

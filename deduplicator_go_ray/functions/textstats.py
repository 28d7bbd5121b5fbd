"""Text-analysis kernels: language ID, quality scoring, token counting,
document fingerprinting.

These extend the engine beyond the reference's operator set toward what
a large-scale training-data pipeline needs (task brief); they run as
vectorized ``map_batches`` bodies over the ``documents`` /  pages
tables.  All are deterministic and dependency-free.
"""

from __future__ import annotations

import re
from zlib import crc32

import numpy as np

from .hashing import rolling_hashes

TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/number/punct splitter (GPT-2-style shape, simplified,
# public knowledge): contractions, letter runs, digit runs, punct runs.
BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "im", "für"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "du", "pour", "que", "dans", "pas", "sur"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "de", "que", "en", "por", "para", "con"},
}
_WORD_RE = re.compile(r"[a-zA-ZäöüßéèêàçñáíóúÄÖÜ]+")
_PUNCT_RE = re.compile(r"[^\w\s]")


def token_count_ws(text: str) -> int:
    """Whitespace token count (matches ANSI-SQL
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))``)."""
    return len(TOKEN_RE.findall(text))


def token_count_bpe(text: str) -> int:
    """BPE-ish token count: non-whitespace matches of the GPT-2-style
    pre-tokenizer regex — a cheap proxy for subword token budgets."""
    return sum(1 for m in BPE_RE.finditer(text) if not m.group().isspace())


def lang_id(text: str) -> str:
    """n-gram/stopword heuristic language ID over {en,de,fr,es,zh,unknown}."""
    if any("一" <= ch <= "鿿" for ch in text[:2000]):
        return "zh"
    words = _WORD_RE.findall(text.lower()[:4000])
    if not words:
        return "unknown"
    ws = set(words)
    best, best_hits = "unknown", 0
    for lang, stops in _STOPWORDS.items():
        hits = len(ws & stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits >= 2 else "unknown"


def quality_score(text: str) -> float:
    """Heuristic quality in [0,1]: length, punctuation ratio, stopword
    ratio, mean word length — the shape of public web-text QC filters."""
    n = len(text)
    if n == 0:
        return 0.0
    words = _WORD_RE.findall(text.lower())
    n_words = len(words)
    if n_words == 0:
        return 0.0
    punct_ratio = len(_PUNCT_RE.findall(text)) / n
    all_stops = set().union(*_STOPWORDS.values())
    stop_ratio = sum(1 for w in words if w in all_stops) / n_words
    mean_wl = sum(len(w) for w in words) / n_words
    score = 1.0
    score *= min(1.0, n / 200.0)                      # too short
    score *= 1.0 - min(1.0, max(0.0, punct_ratio - 0.1) * 3)   # punct soup
    score *= min(1.0, 0.25 + stop_ratio * 3)          # no function words
    score *= 1.0 - min(1.0, max(0.0, (mean_wl - 12) / 10))     # gibberish words
    return round(max(0.0, min(1.0, score)), 6)


def fingerprint64(text: str) -> int:
    """Rolling-hash document fingerprint: min of 32-byte window hashes
    xor a crc of the whole text — stable, order-sensitive, cheap."""
    data = text.encode("utf-8")
    whole = crc32(data)
    h = rolling_hashes(data, 32)
    if h.size == 0:
        return whole
    return int(np.uint64(h.min()) ^ np.uint64(whole))

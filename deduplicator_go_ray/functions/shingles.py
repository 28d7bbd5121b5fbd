"""Shingle extraction for MinHash / SimHash signatures.

The reference's content-identity unit is the whole file (one SHA-256,
``files/files.go:76-156``); near-dup identity needs sub-document units:
character k-shingles (byte windows over utf-8 text) for MinHash and
word tokens for SimHash.  Both are produced as uint64 hash arrays so
the signature stages never touch Python strings in their hot loop.
"""

from __future__ import annotations

import re
from zlib import crc32

import numpy as np

from .hashing import hash64_str, mix64, rolling_hashes

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def char_shingles_u64(text: str, k: int) -> np.ndarray:
    """Unique uint64 hashes of all k-byte shingles of utf-8 `text`.

    Text shorter than k bytes yields a single hash of the whole text so
    tiny documents still carry an identity.
    """
    data = text.encode("utf-8")
    if len(data) < k:
        if not data:
            return np.empty(0, dtype=np.uint64)
        return hash64_str([text], seed=1)
    return np.unique(rolling_hashes(data, k))


def word_tokens_u64(text: str, seed: int = 0) -> np.ndarray:
    """uint64 hashes of lowercase word tokens (with repetition).

    crc32 (C-speed) per token, widened by length+seed and mixed to 64
    bits — deterministic across processes (unlike builtin ``hash``).
    """
    flat, lengths = word_tokens_u64_many([text], seed=seed)
    return flat


def word_tokens_u64_many(texts: list[str],
                         seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Batched :func:`word_tokens_u64` over many texts.

    Returns (flat concatenated hashes, per-text lengths).  Bit-identical
    to the per-text function — same crc32+len+seed → mix64 per token —
    but pays ONE fromiter/mix64 pass for the whole batch instead of one
    per document (the per-doc numpy call dispatch dominated the SimHash
    tokenizer at ~6 s per 15k-doc batch)."""
    tok_lists = [_WORD_RE.findall(t.lower()) for t in texts]
    lengths = np.array([len(l) for l in tok_lists], dtype=np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), lengths
    s = np.uint64(seed)
    raw = np.fromiter(
        (crc32(t.encode("utf-8")) for l in tok_lists for t in l),
        dtype=np.uint64, count=total)
    lens = np.fromiter(
        (len(t) for l in tok_lists for t in l), dtype=np.uint64, count=total)
    return mix64(raw + (lens << np.uint64(32)) + s), lengths


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two unique-hash shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)

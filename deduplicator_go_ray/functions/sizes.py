"""Scalar size/byte utilities — parity with the reference's helpers.

* ``parse_size``  ≙ ``ParseSize``  (``files/utils.go:236-287``):
  human size string → bytes ("1.5G" → 1610612736).
* ``format_bytes`` ≙ ``formatBytes`` (``files/utils.go:192-206``):
  thousands-separated integer string.
* ``format_size`` ≙ ``formatSize``  (``files/import.go:123-134``):
  bytes → human units.
"""

from __future__ import annotations

import re

_UNITS = {"": 1, "B": 1, "K": 1 << 10, "M": 1 << 20, "G": 1 << 30, "T": 1 << 40, "P": 1 << 50}
_SIZE_RE = re.compile(r"^\s*([0-9]*\.?[0-9]+)\s*([KMGTP]?)I?B?\s*$", re.IGNORECASE)


def parse_size(s: str) -> int:
    m = _SIZE_RE.match(s)
    if not m:
        raise ValueError(f"invalid size string: {s!r}")
    value, unit = float(m.group(1)), m.group(2).upper()
    return int(value * _UNITS[unit])


def format_bytes(n: int) -> str:
    return f"{n:,}"


def format_size(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} TiB"

"""SQL-generation helpers for the DuckDB hash-kernel oracles.

The engine's hash kernels (splitmix64, crc32, mod-2^64 polynomial
rolling hashes — functions/hashing.py) are re-derived in pure SQL so
the driver's DuckDB oracle can hash-check queries whose values depend
on them (``doc_fingerprints``, ``simhash_pairs``, ``minhash_lsh_pairs``).
Only *algorithm constants* are embedded as literals (the CRC-32/IEEE
byte table, power tables of the rolling base, the splitmix64 / golden
multipliers) — the same status as a regex pattern in other oracles;
everything data-dependent is computed by DuckDB from the parquet.

Arithmetic rules that keep HUGEINT (int128) exact under mod-2^64:

* 64×64-bit multiply mod 2^64 by a *constant* splits the constant into
  32-bit halves: ``x*lo + (x % 2^32)*hi*2^32`` — every intermediate
  < 2^97, well inside int128.
* splitmix64 runs as a chain of single-reference CTE projections; a
  nested string-template would duplicate each subexpression ~16× and
  DuckDB cannot CSE across the blow-up.
"""

from __future__ import annotations

MIX_MUL1 = 0xBF58476D1CE4E5B9
MIX_MUL2 = 0x94D049BB133111EB
GOLDEN = 0x9E3779B97F4A7C15
M64 = 1 << 64
U64_MOD = "18446744073709551616::HUGEINT"


def mul64_const(x: str, mul: int) -> str:
    """SQL expr: ``(x * mul) mod 2^64`` for a constant ``mul``."""
    lo, hi = mul & 0xFFFFFFFF, mul >> 32
    return (f"(({x}) * {lo}::HUGEINT + (({x}) % 4294967296) * "
            f"{hi}::HUGEINT * 4294967296::HUGEINT) % {U64_MOD}")


def mix64_ctes(prefix: str, src: str, cols: str, xin: str) -> str:
    """CTE chain applying the splitmix64 finalizer to expression ``xin``
    over rows of ``src``; the final CTE ``{prefix}5`` carries ``{cols}``
    plus the mixed value as ``x``."""
    return f"""
    {prefix}0 AS (SELECT {cols}, {xin} AS x FROM {src}),
    {prefix}1 AS (SELECT {cols}, xor(x, x >> 30) AS x FROM {prefix}0),
    {prefix}2 AS (SELECT {cols}, {mul64_const('x', MIX_MUL1)} AS x FROM {prefix}1),
    {prefix}3 AS (SELECT {cols}, xor(x, x >> 27) AS x FROM {prefix}2),
    {prefix}4 AS (SELECT {cols}, {mul64_const('x', MIX_MUL2)} AS x FROM {prefix}3),
    {prefix}5 AS (SELECT {cols}, xor(x, x >> 31) AS x FROM {prefix}4)"""


def crc32_list_sql() -> str:
    """The CRC-32/IEEE byte table as a SQL list literal (1-indexed)."""
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tbl.append(c)
    return "[" + ",".join(str(c) for c in tbl) + "]"


def pow_list_sql(base: int, k: int) -> str:
    """``[base^0, .., base^(k-1)] mod 2^64`` as a HUGEINT list literal."""
    return ("[" + ",".join(f"{pow(base, e, M64)}::HUGEINT" for e in range(k))
            + "]")


def u64_bigint(expr: str) -> str:
    """Bit-view a mod-2^64 HUGEINT value as BIGINT (matches the numpy
    ``.view(np.int64)`` transport convention on the Ray side)."""
    return (f"CAST(CASE WHEN ({expr}) >= 9223372036854775808::HUGEINT "
            f"THEN ({expr}) - {U64_MOD} ELSE ({expr}) END AS BIGINT)")


def bytes_cte(src: str = "documents", text_col: str = "text",
              id_col: str = "doc_id") -> str:
    """CTEs ``hx`` + ``dbytes``: explode each row's utf-8 bytes to
    (id, n, p, b) rows — byte value ``b`` at 1-based position ``p`` of
    ``n`` total — via hex digits (DuckDB has no direct blob indexing)."""
    return f"""
    hx AS (
        SELECT {id_col}, upper(hex(encode({text_col}))) AS h,
               octet_length(encode({text_col})) AS n
        FROM {src}
    ),
    dbytes AS (
        SELECT {id_col}, n, p,
               (strpos('0123456789ABCDEF', substr(h, 2*p-1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2*p,   1)) - 1) AS b
        FROM hx, LATERAL (SELECT unnest(generate_series(1, n)) AS p) _
        WHERE n > 0
    )"""

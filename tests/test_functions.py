"""Unit tests for the pure kernels (no Ray needed)."""

import numpy as np
import pytest

from deduplicator_go_ray.functions.hashing import (
    combine64,
    md5_hex,
    mix64,
    rolling_hashes,
    sha256_hex,
)
from deduplicator_go_ray.functions.shingles import char_shingles_u64, jaccard, word_tokens_u64
from deduplicator_go_ray.functions.sizes import format_bytes, parse_size
from deduplicator_go_ray.functions.text import extract_text
from deduplicator_go_ray.functions.textstats import (
    lang_id,
    quality_score,
    token_count_bpe,
    token_count_ws,
)


def test_rolling_hashes_match_bruteforce():
    data = bytes(np.random.default_rng(0).integers(0, 256, 300, dtype=np.uint8))
    for k in (4, 9, 48):
        M = 1 << 64
        expected = []
        for i in range(len(data) - k + 1):
            h = 0
            for j in range(k):
                h = (h * 1000000007 + data[i + j]) % M
            expected.append(h)
        expected = mix64(np.array(expected, dtype=np.uint64))
        assert np.array_equal(expected, rolling_hashes(data, k))


def test_rolling_hashes_short_input():
    assert rolling_hashes(b"ab", 9).size == 0


def test_sha256_matches_hashlib():
    import hashlib

    texts = ["", "hello", "héllo wörld"]
    assert sha256_hex(texts) == [hashlib.sha256(t.encode()).hexdigest() for t in texts]
    assert md5_hex(texts) == [hashlib.md5(t.encode()).hexdigest() for t in texts]


def test_shingles_deterministic_and_set_semantics():
    a = char_shingles_u64("the quick brown fox jumps", 9)
    b = char_shingles_u64("the quick brown fox jumps", 9)
    assert np.array_equal(a, b)
    assert jaccard(a, b) == 1.0
    c = char_shingles_u64("the quick brown cat jumps", 9)
    assert 0.0 < jaccard(a, c) < 1.0
    # shorter than k → single whole-text hash
    assert char_shingles_u64("ab", 9).size == 1
    assert char_shingles_u64("", 9).size == 0


def test_word_tokens_deterministic():
    t1 = word_tokens_u64("Hello World hello")
    t2 = word_tokens_u64("Hello World hello")
    assert np.array_equal(t1, t2)
    assert t1.size == 3
    assert t1[0] == t1[2]  # case-folded


def test_combine64_order_sensitive():
    a = np.array([[1, 2, 3]], dtype=np.uint64)
    b = np.array([[3, 2, 1]], dtype=np.uint64)
    assert combine64(a)[0] != combine64(b)[0]


def test_extract_text_basic():
    html = (b"<html><head><title>My Title</title><style>b{}</style></head>"
            b"<body><nav><a href='http://x'></a></nav><p>Para one.</p>"
            b"<p>Para&amp; two.</p><script>var x;</script></body></html>")
    text, err = extract_text(html)
    assert err is None
    assert text == "My Title\nPara one.\nPara& two."


def test_extract_text_sentinels():
    assert extract_text(b"")[1] == "EMPTY_ERROR"
    assert extract_text(b"<html><body>\xff\xfe</body></html>")[1] == "DECODE_ERROR"
    assert extract_text("<p>café".encode()[:-1])[1] == "DECODE_ERROR"  # cut mid-é
    assert extract_text(b"<p>  </p>")[1] == "EMPTY_ERROR"


def test_extract_text_deterministic():
    html = b"<html><body><p>abc def</p></body></html>"
    assert extract_text(html) == extract_text(html)


def test_parse_size():
    assert parse_size("1024") == 1024
    assert parse_size("1K") == 1024
    assert parse_size("1.5G") == int(1.5 * (1 << 30))
    assert parse_size("2MiB") == 2 << 20
    with pytest.raises(ValueError):
        parse_size("abc")
    assert format_bytes(1234567) == "1,234,567"


def test_token_counts():
    assert token_count_ws("a b  c\n d") == 4
    assert token_count_ws("") == 0
    assert token_count_bpe("hello, world 123") == 4  # hello | , | ␣world | ␣123
    assert token_count_bpe("") == 0


def test_lang_id():
    assert lang_id("the cat and the dog sat on that mat for hours") == "en"
    assert lang_id("der hund und die katze ist nicht mit einem ball") == "de"
    assert lang_id("") == "unknown"


def test_quality_score_ranges():
    good = quality_score("The quick brown fox jumps over the lazy dog. " * 10)
    bad = quality_score("@@@ ### !!! ;;; :::")
    assert 0.0 <= bad <= good <= 1.0


def test_grouped_apply_packed_equals_unpacked(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from deduplicator_go_ray.stages.common import grouped_apply

    rng = np.random.default_rng(5)
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 50, 3000), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, 3000), pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(6)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=True)["v"]
        return pd.DataFrame({"k": g.min().index, "vmin": g.min().values,
                             "cnt": g.size().values})

    a = grouped_apply(ds, ["k"], fn, packed=True).to_pandas()
    b = grouped_apply(ds, ["k"], fn, packed=False).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_md5_hex16_matches_hashlib():
    # lane-parallel MD5 (the cluster-id kernel) is bit-identical to
    # hashlib across length boundaries (block splits at 55/56/63/64,
    # multi-block, empty, multibyte utf-8)
    import hashlib
    import random
    import string

    import pyarrow as pa

    from deduplicator_go_ray.functions.hashing import md5_hex16

    rng = random.Random(42)
    vals = ["", "a", "héllo wörld \U0001F600" * 10]
    for _ in range(2000):
        fixed = [0, 1, 7, 54, 55, 56, 57, 63, 64, 65, 119, 120, 121,
                 127, 128, 200, 500]
        n = (rng.choice(fixed) if rng.random() < 0.5
             else rng.randrange(0, 300))
        vals.append("".join(rng.choice(string.printable)
                            for _ in range(n)))
    arr = pa.array(vals, pa.string())
    want = [hashlib.md5(v.encode("utf-8")).hexdigest()[:16] for v in vals]
    assert md5_hex16(arr).to_pylist() == want
    # sliced + chunked inputs (non-zero offsets) hash identically
    ch = pa.chunked_array([arr.slice(3, 40), arr.slice(100, 7)])
    assert md5_hex16(ch).to_pylist() == want[3:43] + want[100:107]

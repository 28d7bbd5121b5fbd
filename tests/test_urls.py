"""URL canonicalization unit tests (M9/M10 normalizer slot)."""

from deduplicator_go_ray.functions.urls import canonicalize_url


def test_case_and_default_port():
    assert canonicalize_url("HTTPS://Ex.Com:443/A") == "https://ex.com/A"
    assert canonicalize_url("http://Ex.com:80/") == "http://ex.com/"
    assert canonicalize_url("http://ex.com:8080/x") == "http://ex.com:8080/x"


def test_query_normalization():
    assert canonicalize_url("https://e.x/p?b=2&a=1") == "https://e.x/p?a=1&b=2"
    assert (canonicalize_url("https://e.x/p?utm_source=s&utm_medium=m&k=1")
            == "https://e.x/p?k=1")
    assert canonicalize_url("https://e.x/p?fbclid=abc") == "https://e.x/p"


def test_path_normalization():
    assert canonicalize_url("https://e.x//a//b/") == "https://e.x/a/b"
    assert canonicalize_url("https://e.x") == "https://e.x/"
    assert canonicalize_url("https://e.x/p#frag") == "https://e.x/p"


def test_idempotent_and_total():
    cases = ["https://e.x/p?b=2&a=1", "nonsense not a url", "", "http://[bad"]
    for u in cases:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once

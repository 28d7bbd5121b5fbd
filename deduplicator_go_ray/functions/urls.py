"""URL canonicalization — the web-engine slot of the reference's path
normalizers (SURVEY.md §2.2 M9/M10: ``calculateDestPath``
``files/utils.go:209-233``, ``archiveRelativePath``
``files/move.go:316-330``, and the LOWER() hostname rule applied to
every key before grouping, ``files/process.go:27``).

The same design rule carries over: normalize the shuffle key ONCE,
early, with a pure deterministic function — never inside downstream
group logic.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# tracking parameters stripped during canonicalization (public
# convention, cf. utm_* etc.)
_DROP_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref_", "mc_cid", "mc_eid")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form:

    * scheme + host lowercased (≙ LOWER(hostname) everywhere);
    * default ports dropped;
    * fragment dropped;
    * tracking query params dropped, remaining params sorted by key;
    * duplicate slashes collapsed in the path, trailing slash trimmed
      (except the bare root).

    Unparseable input comes back unchanged — canonicalization must
    never raise inside a batch kernel (errors stay in-band upstream).
    """
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    if not path:
        path = "/"
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not any(k.lower().startswith(p) or k.lower() == p.rstrip("_")
                    for p in _DROP_PARAMS)]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))

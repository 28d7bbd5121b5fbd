"""Long exact-substring pair detection (partial overlap).

The containment pass (stages/substring.py) finds full-document
embeddings; this stage finds pairs of documents that merely SHARE one
long exact run (≥ ``min_len`` bytes) — plagiarized paragraphs, quoted
blocks, syndicated fragments.  North-rule component ("suffix-array pass
for long exact substrings").

Design:

* candidates — two docs sharing an exact run of length L share
  ~(L - window)/modulus winnowing anchors in expectation, so pairs with
  ≥ ``min_shared_anchors`` common anchor buckets are candidates (the
  anchor rows already exist from the signature stage — no extra text
  scan);
* verification — the exact longest-common-substring of each candidate
  pair, computed with a suffix automaton of the shorter text (O(n+m),
  the suffix-structure role; a generalized suffix array would batch
  many docs per partition — the automaton is the per-pair equivalent
  with the same output).

Pure per-pair decisions → partition-count invariant like every other
stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .common import grouped_apply


def lcs_length(a: str, b: str) -> int:
    """Longest common substring length via a suffix automaton of `a`
    (linear construction), streaming `b` through it."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    # suffix automaton of a
    MAXN = 2 * len(a) + 5
    nxt: list[dict[str, int]] = [dict() for _ in range(MAXN)]
    link = [0] * MAXN
    length = [0] * MAXN
    link[0] = -1
    last, size = 0, 1
    for ch in a:
        cur = size; size += 1
        length[cur] = length[last] + 1
        p = last
        while p >= 0 and ch not in nxt[p]:
            nxt[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = size; size += 1
                length[clone] = length[p] + 1
                nxt[clone] = dict(nxt[q])
                link[clone] = link[q]
                while p >= 0 and nxt[p].get(ch) == q:
                    nxt[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # stream b
    v, l, best = 0, 0, 0
    for ch in b:
        while v and ch not in nxt[v]:
            v = link[v]
            l = length[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            l += 1
            if l > best:
                best = l
        else:
            v, l = 0, 0
    return best


def shared_anchor_pairs(
    anchors: "ray.data.Dataset",
    min_shared_anchors: int = 2,
    bucket_cap: int = 1024,
) -> "ray.data.Dataset":
    """(u, v, shared) candidate pairs from common anchor buckets.

    Unlike the containment pass there is no min-anchor shortcut (either
    doc may hold the run anywhere), so buckets emit cliques bounded by
    ``bucket_cap`` and pairs are counted across buckets — the count IS
    the evidence of a long shared run."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["anchor", "url"]).sort_values(
            ["anchor", "url"], kind="mergesort")
        a = df["anchor"].to_numpy()
        u = df["url"].to_numpy()
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        sizes = np.diff(np.r_[starts, a.size])
        keep = (sizes > 1) & (sizes <= bucket_cap)
        frames = []
        for s in np.unique(sizes[keep]):
            idx = starts[keep][sizes[keep] == s]
            mat = u[idx[:, None] + np.arange(s)[None, :]]
            iu, jv = np.triu_indices(s, k=1)
            frames.append(pd.DataFrame({"u": mat[:, iu].ravel(),
                                        "v": mat[:, jv].ravel()}))
        if not frames:
            return pd.DataFrame({"u": pd.Series(dtype=object),
                                 "v": pd.Series(dtype=object)})
        out = pd.concat(frames)
        g = out.groupby(["u", "v"], sort=False).size().reset_index(name="shared")
        return g  # per-partition counts; buckets of one anchor value
                  # are never split, so counts are complete per pair
                  # only after the cross-partition sum below

    per_part = grouped_apply(anchors, ["anchor"], emit)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "v"], sort=False)["shared"].sum().reset_index()
        return g[g["shared"] >= min_shared_anchors]

    return grouped_apply(per_part, ["u", "v"], total)


def long_substring_pairs(
    texts: "ray.data.Dataset",
    anchors: "ray.data.Dataset",
    min_len: int = 256,
    min_shared_anchors: int = 2,
) -> "ray.data.Dataset":
    """(u, v, lcs_len) pairs whose exact longest common substring is at
    least ``min_len`` bytes.  ``texts``: (url, text); ``anchors``:
    (anchor, url, ...) rows from the signature stage."""
    from .lsh import block_refs_of

    cand = shared_anchor_pairs(anchors, min_shared_anchors).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(pa.table({
            "u": pa.array([], pa.string()), "v": pa.array([], pa.string()),
            "lcs_len": pa.array([], pa.int64())}))

    # broadcast the candidate endpoints' texts (semi-filter, no shuffle)
    import ray as _ray

    urls: set[str] = set()
    for b in cand.iter_batches(batch_size=65536, batch_format="pyarrow"):
        urls.update(b["u"].to_pylist())
        urls.update(b["v"].to_pylist())
    uref = _ray.put(pa.array(sorted(urls), pa.string()))

    def slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        wanted = _ray.get(uref)
        keep = _pc.is_in(t["url"], value_set=wanted)  # vectorized probe
        return t.filter(keep).select(["url", "text"])

    skinny = texts.map_batches(slim, batch_format="pyarrow").materialize()
    refs = tuple(block_refs_of(skinny))

    def verify(t: pa.Table) -> pa.Table:
        from .lsh import _worker_index

        idx, (txt,) = _worker_index(refs, ("url", "text"))
        us = t["u"].to_pandas()
        vs = t["v"].to_pandas()
        iu = idx.get_indexer(us)
        iv = idx.get_indexer(vs)
        out_u, out_v, out_l = [], [], []
        for k in range(len(t)):
            if iu[k] < 0 or iv[k] < 0:
                continue
            a = txt[int(iu[k])].as_py() or ""
            b = txt[int(iv[k])].as_py() or ""
            l = lcs_length(a, b)
            if l >= min_len:
                out_u.append(us.iloc[k])
                out_v.append(vs.iloc[k])
                out_l.append(l)
        return pa.table({
            "u": pa.array(out_u, pa.string()),
            "v": pa.array(out_v, pa.string()),
            "lcs_len": pa.array(out_l, pa.int64()),
        })

    return cand.map_batches(verify, batch_format="pyarrow")
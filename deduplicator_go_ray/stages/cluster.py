"""Cluster merge: connected components over verified candidate edges.

≙ SURVEY.md §7.4 "union-find at 10^12-doc semantics": below
``max_driver_edges`` a driver-side union-find resolves the components
(the candidate-edge set after exact-dedup collapse + verification is
orders of magnitude smaller than the corpus); above it, an iterative
alternating large-star/small-star label propagation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", public) runs entirely
as Ray Data groupbys — every step a pure function of the edge set, so
results are identical at any parallelism (≙ files/move.go:226-236).

Node labels are the urls themselves; the component root is the
lexicographically smallest url, which doubles as the cluster canonical
member (keeper tiebreak key) — one convention shared by both paths.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def _dsu_find(parent: dict, x: str) -> str:
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:
        parent[x], x = root, parent[x]
    return root


def connected_components_driver(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find on the driver; root = min(url) per component."""
    parent: dict[str, str] = {}
    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = _dsu_find(parent, u), _dsu_find(parent, v)
        if ru != rv:
            # union by lexicographic min so the root IS the canonical url
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {x: _dsu_find(parent, x) for x in parent}


def connected_components_distributed(
    edges: "ray.data.Dataset", max_iters: int = 50
) -> "ray.data.Dataset":
    """Alternating large-star/small-star over an edge Dataset (u, v).

    Each round is one groupby shuffle; converges in O(log n) rounds.
    Returns (url, root) — every non-root node mapped to its component
    minimum; roots map to themselves.
    """

    def large_star(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].iloc[0]
        nbrs = set(g["v"])
        m = min(min(nbrs), u)
        out = [(v, m) for v in nbrs if v > u]
        if not out:
            out = [(u, m)] if m < u else []
        return pd.DataFrame(out, columns=["u", "v"]) if out else pd.DataFrame(
            {"u": pd.Series([], dtype=str), "v": pd.Series([], dtype=str)})

    def small_star(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].iloc[0]
        nbrs = {v for v in g["v"] if v <= u} | {u}
        m = min(nbrs)
        out = [(v, m) for v in nbrs if v != m]
        return pd.DataFrame(out, columns=["u", "v"]) if out else pd.DataFrame(
            {"u": pd.Series([], dtype=str), "v": pd.Series([], dtype=str)})

    def undirect(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()]),
            "v": pa.concat_arrays([t["v"].combine_chunks(), t["u"].combine_chunks()]),
        })

    cur = edges
    prev_sig = None
    for _ in range(max_iters):
        both = cur.map_batches(undirect, batch_format="pyarrow")
        cur = both.groupby("u").map_groups(large_star, batch_format="pandas")
        both = cur.map_batches(undirect, batch_format="pyarrow")
        cur = both.groupby("u").map_groups(small_star, batch_format="pandas")
        cur = cur.groupby(["u", "v"]).map_groups(
            lambda g: g.head(1), batch_format="pandas"
        ).materialize()
        sig = (cur.count(), cur.aggregate(_checksum_agg()) if cur.count() else 0)
        if sig == prev_sig:
            break
        prev_sig = sig
    # after convergence every edge is (node, root)
    def emit(g: pd.DataFrame) -> pd.DataFrame:
        root = g["v"].min()
        return pd.DataFrame({"url": [g["u"].iloc[0]], "root": [root]})

    return cur.groupby("u").map_groups(emit, batch_format="pandas")


def _checksum_agg():
    from ray.data.aggregate import AggregateFn

    return AggregateFn(
        init=lambda k: 0,
        accumulate_row=lambda a, row: a ^ hash((row["u"], row["v"])),
        merge=lambda a, b: a ^ b,
        name="checksum",
    )


def resolve_components(
    edges_ds: "ray.data.Dataset", max_driver_edges: int = 5_000_000,
    key_type: "pa.DataType | None" = None,
) -> "ray.data.Dataset":
    """Pick the driver or distributed path by edge count; both return a
    Dataset (url, root) with identical contents (tested).  Node labels
    may be strings (urls) or int64 uids — pass ``key_type`` to pin the
    empty-result schema."""
    key_type = key_type or pa.string()
    n = edges_ds.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], key_type), "root": pa.array([], key_type)})
        )
    if n <= max_driver_edges:
        pairs = []
        for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            pairs.extend(zip(batch["u"].to_pylist(), batch["v"].to_pylist()))
        mapping = connected_components_driver(pairs)
        urls = sorted(mapping)
        return ray.data.from_arrow(
            pa.table({"url": pa.array(urls, key_type),
                      "root": pa.array([mapping[u] for u in urls], key_type)})
        )
    return connected_components_distributed(edges_ds)

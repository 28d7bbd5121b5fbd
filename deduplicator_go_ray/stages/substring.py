"""Long-exact-substring duplicate pass.

North-rule component with no reference analogue (the reference's
identity is whole-file only): detect pairs where one document's full
text is embedded verbatim inside another (fixture class "substring
dups", FIXTURES.md §1).

Design (SURVEY.md §7.1 M3): winnowing-style anchors — rolling hashes
of ``window``-byte windows, kept where hash % modulus == 0 — are
computed in the signature actor pass (no extra scan of the text).  A
contained document shares *all* its anchors with its container, so
bucketing by anchor hash surfaces (short, long) candidate pairs; pairs
sharing ≥ ``min_shared_anchors`` buckets are verified by an actual
substring containment check against the two texts (a partitioned join
pulls the texts to the pair).

Shuffle keys: anchor hash (skew-capped like the LSH bands), then the
pair key for the shared-anchor count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import SubstringConfig
from .common import grouped_apply
from .joins import join_on


def anchor_rows(sigs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode (anchor, url, n_bytes) rows from the anchors column."""

    def explode(batch: pa.Table) -> pa.Table:
        anchors = batch["anchors"].to_pylist()
        urls = batch["url"].to_pylist()
        nb = batch["n_bytes"].to_pylist()
        a_out, u_out, n_out = [], [], []
        for a, u, nbyte in zip(anchors, urls, nb):
            if a:
                a_out.extend(a)
                u_out.extend([u] * len(a))
                n_out.extend([nbyte] * len(a))
        return pa.table({
            "anchor": pa.array(a_out, pa.int64()),
            "url": pa.array(u_out, pa.string()),
            "n_bytes": pa.array(n_out, pa.int64()),
        })

    return sigs.select_columns(["url", "anchors", "n_bytes"]).map_batches(
        explode, batch_format="pyarrow")


def candidate_pairs(
    anchors: "ray.data.Dataset", cfg: SubstringConfig, bucket_cap: int = 256
) -> "ray.data.Dataset":
    """groupby anchor → (short, long) pairs; then count shared anchors
    per pair and keep pairs with ≥ min_shared_anchors."""

    def emit_bucket(g: pd.DataFrame) -> pd.DataFrame | None:
        if len(g) < 2 or len(g) > bucket_cap:
            return None
        g = g.sort_values(["n_bytes", "url"], kind="mergesort")
        rows = list(zip(g["url"], g["n_bytes"]))
        pairs = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                # only (shorter ⊂ longer) is possible; require a real
                # length gap — near-equal lengths are LSH territory
                if rows[j][1] > rows[i][1]:
                    pairs.append((rows[i][0], rows[j][0]))
        return pd.DataFrame(pairs, columns=["u", "v"]) if pairs else None

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["anchor", "url"])
        counts = df.groupby("anchor")["url"].transform("size")
        df = df[counts > 1]
        frames = [out for _, g in df.groupby("anchor", sort=False)
                  if (out := emit_bucket(g)) is not None]
        if not frames:
            return pd.DataFrame({"u": pd.Series([], dtype=str),
                                 "v": pd.Series([], dtype=str)})
        return pd.concat(frames)

    pairs = grouped_apply(anchors, ["anchor"], emit)
    m = cfg.min_shared_anchors

    def count_shared(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(["u", "v"], sort=False)["u"].transform("size")
        return df[cnt >= m].drop_duplicates(["u", "v"])

    return grouped_apply(pairs, ["u", "v"], count_shared)


def verify_containment(
    pairs: "ray.data.Dataset", texts: "ray.data.Dataset", num_partitions: int = 8
) -> "ray.data.Dataset":
    """Join each pair to both texts; keep pairs where u's text occurs
    verbatim inside v's text (u is the shorter side by construction)."""

    def prep(side: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({side: batch["url"], f"text_{side}": batch["text"]})
        return f

    t = texts.select_columns(["url", "text"])
    j1 = join_on(pairs, t.map_batches(prep("u"), batch_format="pyarrow"), "u",
                 num_partitions=num_partitions)
    j2 = join_on(j1, t.map_batches(prep("v"), batch_format="pyarrow"), "v",
                 num_partitions=num_partitions)

    def check(batch: pa.Table) -> pa.Table:
        us = batch["u"].to_pylist()
        vs = batch["v"].to_pylist()
        tu = batch["text_u"].to_pylist()
        tv = batch["text_v"].to_pylist()
        keep = [bool(a) and bool(b) and (a in b) for a, b in zip(tu, tv)]
        m = pa.array(keep)
        return pa.table({"u": batch["u"].filter(m), "v": batch["v"].filter(m)})

    return j2.map_batches(check, batch_format="pyarrow")

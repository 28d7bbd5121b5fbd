"""Keeper-selection policies: per-cluster reduce deciding keep/drop.

Pluggable pure functions of the group content — the invariant the
reference states outright: *"every host reaches the same decision with
no coordination"* (``files/move.go:226-247``).  Policies (SURVEY.md
§2.7 D2/D3/D4):

* ``deterministic``  ≙ D3 (``files/move.go:226-247``): keeper = member
  with the lexicographically smallest sort key (here: url).
* ``site_popularity`` ≙ D2 (``files/dedupe.go:123-240``): keep the
  member whose site has the most members in the group (the reference
  keeps the file in the most-populated parent dir), tiebreak min url.
* ``priority_limits`` ≙ D4 (``files/group_dedup.go:258-339``): rank by
  (site priority, url), keep ``min_copies`` members, optionally clamp
  to ``max_copies`` when ``respect_max`` (--respect-limits).
"""

from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd

from ..config import KeeperPolicy


def _site(url: str) -> str:
    try:
        return urlparse(url).netloc or url
    except Exception:
        return url


def select_keepers(g: pd.DataFrame, policy: KeeperPolicy) -> pd.DataFrame:
    """Given one cluster's members (column ``url`` at minimum), return
    the frame with ``keeper_url``, ``is_keeper``, ``action`` added.

    Pure: output depends only on the sorted member list + policy."""
    g = g.sort_values("url", kind="mergesort").reset_index(drop=True)
    n = len(g)
    if policy.policy == "deterministic":
        keep_idx = [0]
    elif policy.policy == "site_popularity":
        sites = g["url"].map(_site)
        counts = sites.value_counts()
        rank = pd.DataFrame({
            "pop": sites.map(counts).astype(int),
            "url": g["url"],
        }).sort_values(["pop", "url"], ascending=[False, True], kind="mergesort")
        keep_idx = [int(rank.index[0])]
    else:  # priority_limits
        prio = g["url"].map(lambda u: policy.site_priority.get(_site(u), 1 << 30))
        order = pd.DataFrame({"prio": prio, "url": g["url"]}).sort_values(
            ["prio", "url"], kind="mergesort"
        )
        n_keep = min(n, max(1, policy.min_copies))
        if policy.respect_max and policy.max_copies is not None:
            n_keep = min(n_keep, policy.max_copies)
        keep_idx = [int(i) for i in order.index[:n_keep]]
    keep_mask = g.index.isin(keep_idx)
    keeper_url = g["url"].iloc[keep_idx[0]]
    # primary keeper = the policy's top pick; with min_copies>1 the
    # extra kept members still carry action="keep".
    g = g.assign(
        keeper_url=keeper_url,
        is_keeper=keep_mask,
        action=["keep" if k else "drop" for k in keep_mask],
    )
    return g

"""Dup-pair recall vs planted ground truth at bench scale.

Runs the flagship pipeline over a generated corpus (default: the 200k
scaling corpus, built on demand) and scores recovered duplicate pairs
against the corpus's ``truth_pairs`` table:

* recall denominator = relations {exact, near_high, substring}
  (FIXTURES.md §1 — near_border is reported separately, excluded);
* a truth pair counts as recovered when both urls land in the same
  cluster;
* precision proxy: fraction of same-cluster pairs among sampled
  non-dup url pairs (should be ~0).

Usage: python tools/recall_report.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from deduplicator_go_ray.sources.corpus import write_corpus
    from deduplicator_go_ray.pipelines.dedup import run_dedup

    out_dir = f"/tmp/bench_corpus_{n_rows}"
    pages_dir = os.path.join(out_dir, "pages")
    truth_path = os.path.join(out_dir, "truth_pairs.parquet")
    if not os.path.isdir(pages_dir):
        write_corpus(out_dir, n_rows, seed=42)

    assignments = run_dedup(ray.data.read_parquet(pages_dir)).to_pandas()
    cl = dict(zip(assignments["url"], assignments["cluster_id"]))

    truth = pq.read_table(truth_path).to_pandas()
    report: dict = {"n_rows": n_rows}
    for rel, g in truth.groupby("relation"):
        hit = sum(1 for a, b in zip(g["url_a"], g["url_b"])
                  if cl.get(a) is not None and cl.get(a) == cl.get(b))
        report[rel] = {"pairs": int(len(g)), "recovered": int(hit),
                       "recall": round(hit / len(g), 4)}

    den = truth[truth["relation"].isin(["exact", "near_high", "substring"])]
    den_hit = sum(1 for a, b in zip(den["url_a"], den["url_b"])
                  if cl.get(a) is not None and cl.get(a) == cl.get(b))
    report["recall_denominator"] = {
        "pairs": int(len(den)), "recovered": int(den_hit),
        "recall": round(den_hit / len(den), 4),
    }

    # size-guard pairs must NOT merge
    guard = truth[truth["relation"] == "nondup_size_guard"]
    merged_guard = sum(1 for a, b in zip(guard["url_a"], guard["url_b"])
                       if cl.get(a) == cl.get(b))
    report["size_guard_merged"] = int(merged_guard)

    # precision proxy: random non-truth pairs should not share clusters
    rng = np.random.default_rng(42)
    urls = assignments["url"].to_numpy()
    truth_set = {tuple(sorted(p)) for p in zip(truth["url_a"], truth["url_b"])}
    same = checked = 0
    while checked < 20_000:
        a, b = urls[rng.integers(0, len(urls))], urls[rng.integers(0, len(urls))]
        if a == b or tuple(sorted((a, b))) in truth_set:
            continue
        checked += 1
        same += int(cl[a] == cl[b])
    report["false_merge_rate_sampled"] = round(same / checked, 6)

    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

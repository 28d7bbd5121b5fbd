"""CLI entry points — the reference's command surface re-expressed.

``python -m deduplicator_go_ray <cmd>``:

* ``run``     ≙ `files hash` + `files list-dupes --run` collapsed into the
              one-DAG flagship pipeline (SURVEY.md §3.4); writes
              per-partition assignments (+ lineage/metrics when
              ``--checkpointed``, resumable by re-invoking).
* ``report``  ≙ `files list-dupes` read path (files/utils.go:39-159):
              top-k duplicate clusters by reclaimable bytes with the
              deterministic tiebreak ordering.
* ``corpus``  — generate the deterministic synthetic pages corpus
              (FIXTURES.md §1) for tests/benchmarks.

Only CLI mains own a Ray session (guarded init); library code never
calls ray.init (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    """Attach to the ambient Ray cluster, or start a local one.

    This is what makes every CLI command a valid ``ray job submit``
    entrypoint (the north rule's deployment shape):

        ray job submit --working-dir . -- \\
            python -m deduplicator_go_ray run --input s3://... --output ...

    Inside a submitted job ``RAY_ADDRESS`` points at the running
    cluster, so we attach instead of booting a private local instance
    (which would ignore the cluster's nodes entirely).  With no ambient
    cluster — dev boxes, this sandbox — we fall back to a local
    session, exactly as before.
    """
    import os

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        if addr in (None, "", "local"):
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        else:
            # cluster attach: never pass include_dashboard — the head
            # node already decided that, and the arg is start-only
            ray.init(address=addr, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_run(args: argparse.Namespace) -> int:
    ray = _ray()
    import ray.data

    from .config import KeeperPolicy, PipelineConfig
    from .pipelines.dedup import run_dedup
    from .state.checkpoint import run_dedup_checkpointed

    cfg = PipelineConfig(
        min_size=args.min_size,
        keeper=KeeperPolicy(policy=args.keeper),
        run_substring_pass=not args.no_substring,
        run_simhash=not args.no_simhash,
        sig_store_dir=args.sig_store,
    )
    if args.checkpointed and args.output_format != "parquet":
        print("error: --checkpointed writes parquet checkpoints; "
              "--output-format jsonl is not supported with it",
              file=sys.stderr)
        return 2

    from .sources.pages import read_pages

    # format inferred from the extension: parquet / jsonl / csv all land
    # on the canonical pages schema (and parquet prunes at the read)
    pages = read_pages(args.input)
    if args.count:
        # ≙ --count caps (files/types.go); preserve_order pins WHICH
        # rows the cap takes — without it the streaming executor's
        # limit grabs whichever blocks finish first, so two capped runs
        # would process different row sets (breaking the determinism
        # smoke a dev run exists for)
        ray.data.DataContext.get_current().execution_options.preserve_order = True
        pages = pages.limit(args.count)
    if args.checkpointed:
        out = run_dedup_checkpointed(pages, args.output,
                                     cfg=cfg, num_partitions=args.partitions)
        n = out.count()
    else:
        ds = run_dedup(pages, cfg)
        if args.output_format == "jsonl":
            ds.write_json(args.output)
        else:
            ds.write_parquet(args.output)
        n = ds.count()
    print(json.dumps({"assignments": n, "output": args.output}))
    ray.shutdown()
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    ray = _ray()
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(args.input)
    agg = ds.groupby("cluster_id").aggregate(
        Count(alias_name="copies"), Sum("n_bytes", alias_name="total_size"))
    dups = agg.filter(expr="copies > 1")
    # ≙ ORDER BY total_size DESC + deterministic tiebreak (files/utils.go:107)
    top = dups.sort(["total_size", "cluster_id"],
                    descending=[True, False]).limit(args.top).take_all()
    reclaimable = 0
    for row in top:
        per = row["total_size"] // row["copies"]
        reclaimable += row["total_size"] - per
        print(f"{row['cluster_id']}  copies={row['copies']}  "
              f"total={row['total_size']}  reclaimable={row['total_size'] - per}")
    print(f"top-{len(top)} reclaimable bytes: {reclaimable}")
    ray.shutdown()
    return 0


def cmd_errors(args: argparse.Namespace) -> int:
    """≙ the problematic-file listing (`files hash --list-problematic`,
    files/hash.go:405-469): rows whose in-band error sentinel is set."""
    ray = _ray()
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(args.input)
    errs = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["error"])), batch_format="pyarrow")
    rows = errs.select_columns(["url", "error"]).limit(args.limit).take_all()
    for r in rows:
        print(f"{r['error']}\t{r['url']}")
    print(f"{len(rows)} error rows shown (limit {args.limit})")
    ray.shutdown()
    return 0


def cmd_corpus(args: argparse.Namespace) -> int:
    from .sources.corpus import write_corpus

    pages_dir, truth = write_corpus(args.output, args.rows, seed=args.seed)
    print(json.dumps({"pages": pages_dir, "truth_pairs": truth}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deduplicator_go_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="dedup a pages table "
                                   "(parquet / jsonl / csv input)")
    r.add_argument("--input", required=True)
    r.add_argument("--output", required=True)
    r.add_argument("--output-format", default="parquet",
                   choices=["parquet", "jsonl"],
                   help="assignment sink format (default parquet; "
                        "checkpointed runs are always parquet)")
    r.add_argument("--checkpointed", action="store_true")
    r.add_argument("--partitions", type=int, default=64)
    r.add_argument("--min-size", type=int, default=0)
    r.add_argument("--count", type=int, default=0)
    r.add_argument("--keeper", default="deterministic",
                   choices=["deterministic", "site_popularity", "priority_limits"])
    r.add_argument("--no-substring", action="store_true")
    r.add_argument("--no-simhash", action="store_true")
    r.add_argument("--sig-store", default=None, metavar="DIR",
                   help="content-keyed incremental signature store: "
                        "re-use signatures for content seen in previous "
                        "runs (state/sigstore.py)")
    r.set_defaults(fn=cmd_run)

    rep = sub.add_parser("report", help="top-k duplicate clusters")
    rep.add_argument("--input", required=True)
    rep.add_argument("--top", type=int, default=20)
    rep.set_defaults(fn=cmd_report)

    e = sub.add_parser("errors", help="list sentinel-error rows of a checkpoint")
    e.add_argument("--input", required=True, help="hashed checkpoint dir")
    e.add_argument("--limit", type=int, default=100)
    e.set_defaults(fn=cmd_errors)

    c = sub.add_parser("corpus", help="generate the synthetic pages corpus")
    c.add_argument("--output", required=True)
    c.add_argument("--rows", type=int, default=5000)
    c.add_argument("--seed", type=int, default=42)
    c.set_defaults(fn=cmd_corpus)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""deduplicator_go_ray — a Ray-Data-native dedup / data-processing engine.

A from-scratch re-expression of the capabilities of
PortNumber53/deDuplicator-Go (reference at /root/reference, cited as
file:line throughout) on Ray Data: streaming ``ray.data.Dataset``
pipelines over zero-copy Arrow batches, actor pools for stateful
stages, explicit shuffle/skew handling, deterministic coordination-free
keeper selection, and checkpointed resumable output.

The reference is an exact-content file deduplicator whose shared state
plane is Postgres (SURVEY.md §1); this engine transplants its dedup
semantics (content identity key → group → rank → keep/act) onto
Common-Crawl-style web pages and extends identity from exact SHA-256 to
MinHash-LSH / SimHash / substring near-duplicate signatures.

Nothing in this package calls ``ray.init()`` — the driver, ``bench.py``
or the test fixture owns the Ray session.
"""

__version__ = "0.1.0"

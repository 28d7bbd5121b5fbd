"""Event-time operators Ray Data lacks natively — sessionization,
as-of join, range join — expressed as hash-partitioned grouped applies
(task brief: "custom operators ... (a) composition of map_batches +
groupby().map_groups + sort if semantics allow").

Partitioning assumption (documented per the brief): all three operators
co-locate rows by ``user_id`` — one shuffle; within a partition the
per-user logic is vectorized pandas/numpy over time-sorted rows.  Event
time is data, not wall-clock, so results are deterministic and
partition-count invariant like every other stage.  All three carry
DuckDB oracles.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.common import grouped_apply
from .registry import register

SESSION_GAP_MIN = 30
RANGE_WINDOW_MIN = 60


def _events(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"])


# --------------------------------------------------------------------------
# sessionization: split each user's event stream at >30-minute gaps
# --------------------------------------------------------------------------

def sessionize(sf_dir: str) -> "ray.data.Dataset":
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift()
        new_session = prev.isna() | ((df["ts"] - prev) > gap)
        sid = new_session.groupby(df["user_id"], sort=False).cumsum().astype("int64")
        df = df.assign(session_id=sid)
        g = df.groupby(["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "size"), session_start=("ts", "min"))
        return g.reset_index()

    return grouped_apply(_events(sf_dir), ["user_id"], sessions)


register(
    "sessionize",
    sessionize,
    f"""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start
    FROM sess GROUP BY user_id, session_id
    """,
)


# --------------------------------------------------------------------------
# as-of join: per purchase, the user's most recent view at or before it
# --------------------------------------------------------------------------

def asof_view_before_purchase(sf_dir: str) -> "ray.data.Dataset":
    def asof(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            views = g[g["event_type"] == "view"]
            buys = g[g["event_type"] == "purchase"]
            if not len(buys):
                continue
            vt = views["ts"].to_numpy()
            idx = np.searchsorted(vt, buys["ts"].to_numpy(), side="right") - 1
            last = np.where(idx >= 0, vt[np.maximum(idx, 0)], np.datetime64("NaT"))
            out.append(pd.DataFrame({
                "event_id": buys["event_id"].to_numpy(),
                "user_id": uid,
                "ts": buys["ts"].to_numpy(),
                "last_view_ts": last,
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "last_view_ts": pd.Series(dtype="datetime64[us]"),
            })
        return pd.concat(out)

    return grouped_apply(_events(sf_dir), ["user_id"], asof)


register(
    "asof_view_before_purchase",
    asof_view_before_purchase,
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(v.ts) FROM events v
            WHERE v.user_id = p.user_id AND v.event_type = 'view'
              AND v.ts <= p.ts) AS last_view_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
)


# --------------------------------------------------------------------------
# range join: views within the hour before each purchase
# --------------------------------------------------------------------------

def views_within_hour_of_purchase(sf_dir: str) -> "ray.data.Dataset":
    win = np.timedelta64(RANGE_WINDOW_MIN, "m")

    def count_range(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            vt = g[g["event_type"] == "view"]["ts"].to_numpy()
            buys = g[g["event_type"] == "purchase"]
            if not len(buys):
                continue
            bts = buys["ts"].to_numpy()
            hi = np.searchsorted(vt, bts, side="right")
            lo = np.searchsorted(vt, bts - win, side="left")
            out.append(pd.DataFrame({
                "event_id": buys["event_id"].to_numpy(),
                "user_id": uid,
                "views_last_hour": (hi - lo).astype("int64"),
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "views_last_hour": pd.Series(dtype="int64"),
            })
        return pd.concat(out)

    return grouped_apply(_events(sf_dir), ["user_id"], count_range)


register(
    "views_within_hour_of_purchase",
    views_within_hour_of_purchase,
    f"""
    SELECT p.event_id, p.user_id,
           CAST((SELECT COUNT(*) FROM events v
                 WHERE v.user_id = p.user_id AND v.event_type = 'view'
                   AND v.ts > p.ts - INTERVAL {RANGE_WINDOW_MIN} MINUTE
                   AND v.ts <= p.ts) AS BIGINT) AS views_last_hour
    FROM events p WHERE p.event_type = 'purchase'
    """,
)


# --------------------------------------------------------------------------
# hopping-window aggregate: 1 h windows advancing every 15 min
# --------------------------------------------------------------------------

_HOP_MIN = 15
_WINDOW_HOPS = 4   # window length = 4 hops = 60 min


def hopping_window_counts(sf_dir: str) -> "ray.data.Dataset":
    """Overlapping (hopping) time-window aggregate — the windowed-
    aggregate slot of the task brief that a tumbling rollup
    (``events_daily``) doesn't cover: every event belongs to
    ``_WINDOW_HOPS`` windows, so the kernel is a fan-out (flat-map
    shape) followed by the map-side-combine groupby.

    Scale plan: the per-batch kernel replicates rows ``_WINDOW_HOPS``×
    and immediately pre-aggregates per (event_type, window_start), so
    the shuffle moves per-batch partials (O(types × windows-per-batch)
    skinny rows), never the fanned-out events.  Hop divides the window
    exactly, so membership needs no filter: the windows containing an
    event are bucket(ts) − k·hop for k in 0..3.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "value"])

    hop = pd.Timedelta(minutes=_HOP_MIN)

    def fan_out(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_pandas()
        bucket = ts.dt.floor(f"{_HOP_MIN}min")
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "value_cents": np.rint(np.asarray(
                t["value"], dtype=np.float64) * 100).astype(np.int64),
        })
        parts = []
        for k in range(_WINDOW_HOPS):
            p = df.copy()
            p["window_start"] = bucket - k * hop
            parts.append(p)
        g = (pd.concat(parts, ignore_index=True)
             .groupby(["event_type", "window_start"], sort=False)
             .agg(cnt=("value_cents", "size"),
                  sum_value_cents=("value_cents", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ev.map_batches(fan_out, batch_format="pyarrow")
             .groupby(["event_type", "window_start"])
             .aggregate(Sum("cnt", alias_name="cnt"),
                        Sum("sum_value_cents", alias_name="sum_value_cents")))

    def clean(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "cnt": pc.cast(t["cnt"], pa.int64()),
            "sum_value_cents": pc.cast(t["sum_value_cents"], pa.int64()),
        })

    return agg.map_batches(clean, batch_format="pyarrow")


register(
    "hopping_window_counts",
    hopping_window_counts,
    f"""
    SELECT event_type,
           time_bucket(INTERVAL '{_HOP_MIN} minutes', ts)
               - k * INTERVAL '{_HOP_MIN} minutes' AS window_start,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events
    CROSS JOIN (SELECT unnest(range({_WINDOW_HOPS})) AS k)
    GROUP BY 1, 2
    """,
)

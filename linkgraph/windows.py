"""Windowed aggregates over event streams (batch/streaming-batch shape).

Ray Data has no event-time watermarks; the reference engine has no
streaming either (SURVEY.md §2 scope).  These operators treat the events
table as an ordered, keyed log — the standard Ray Data pattern
(ray_guide: "Streaming-shaped workloads"):

  tumbling  window id = floor(ts / size): one groupby, combiner-friendly
  sliding   each event expands to size/slide window ids in map_batches,
            then ONE groupby — no self-join
  session   groupby(key).map_groups: sort by ts within the key, break at
            gaps > `gap`, cumulative-sum session ids

Ordering assumption (documented): session/sliding results depend only on
per-key timestamp VALUES, never on arrival order — safe under Ray's
unordered block execution.  Timestamps are Arrow timestamp[us]
(UTC-naive, matching DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000  # microseconds per second


def _win_agg(ds, key: str, value: str):
    from ray.data.aggregate import Count, Sum

    agg = ds.groupby([key, "win"]).aggregate(
        Count(alias_name="n_events"), Sum(value, alias_name="sum_value"))
    return agg.map_batches(
        lambda b: pa.table({
            key: b[key], "win": b["win"],
            "n_events": pc.cast(b["n_events"], pa.int64()),
            "sum_value": pc.round(b["sum_value"], ndigits=6)}),
        batch_format="pyarrow")


def tumbling_window(ds, size_s: int, key: str = "user_id", ts: str = "ts",
                    value: str = "value"):
    """(key, win, n_events, sum_value); win = floor(epoch / size)."""
    def win(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        w = pc.divide(us, pa.scalar(size_s * US, pa.int64()))
        return pa.table({key: b[key], "win": w, value: b[value]})

    return _win_agg(ds.map_batches(win, batch_format="pyarrow"), key, value)


def sliding_window(ds, size_s: int, slide_s: int, key: str = "user_id",
                   ts: str = "ts", value: str = "value"):
    """Overlapping windows [win*slide, win*slide + size); each event is
    emitted into its size/slide covering windows (flat expansion inside
    map_batches — one groupby, no self-join)."""
    assert size_s % slide_s == 0, "size must be a multiple of slide"
    k = size_s // slide_s

    def expand(b: pa.Table) -> pa.Table:
        us = b[ts].to_numpy(zero_copy_only=False).astype(np.int64)
        base = us // (slide_s * US)
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[value].to_numpy(zero_copy_only=False)
        wins = np.concatenate([base - i for i in range(k)])
        return pa.table({
            key: pa.array(np.tile(keys, k)),
            "win": pa.array(wins),
            value: pa.array(np.tile(vals, k)),
        })

    return _win_agg(ds.map_batches(expand, batch_format="pyarrow"), key, value)


def session_window(ds, gap_s: int, key: str = "user_id", ts: str = "ts",
                   value: str = "value"):
    """(key, session_id, n_events, sum_value, session_start_us);
    session breaks where the per-key gap exceeds `gap_s`; ids are
    1-based in ts order per key (deterministic: depends only on ts
    values)."""
    gap_us = gap_s * US

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        t = g[ts].astype("int64").to_numpy()
        brk = np.ones(len(t), dtype=np.int64)
        brk[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        out = pd.DataFrame({key: g[key].to_numpy(), "session_id": sid,
                            value: g[value].to_numpy(), "__t": t})
        r = out.groupby("session_id", sort=True).agg(
            n_events=(value, "size"), sum_value=(value, "sum"),
            session_start_us=("__t", "min")).reset_index()
        r[key] = g[key].iloc[0]
        r["sum_value"] = r["sum_value"].round(6)
        return r[[key, "session_id", "n_events", "sum_value",
                  "session_start_us"]]

    return ds.select_columns([key, ts, value]).groupby(key).map_groups(
        sessions, batch_format="pandas")

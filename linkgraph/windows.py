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


def _win_agg(ds, key: str, value: str, approx_rows: int | None = None):
    """(key, win) aggregate WITHOUT a fine-key hash aggregate: the
    (user, window) domain is ~O(rows) (95k groups per 100k events at
    sf0.1), where Ray 2.49's hash aggregate is the measured slow path
    (CLAUDE.md shuffle rule) — shuffle on a coarse key-hash bucket and
    reduce each bucket with one vectorized pandas kernel instead
    (1.9x at sf0.1; the gap widens with the key count)."""
    from .runtime import tune_context

    tune_context()
    nb = max(8, (approx_rows or 0) // 200_000 + 8)

    def bucketize(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False)
        if u.dtype.kind not in "iu":  # string keys: PYTHONHASHSEED-stable
            u = pd.util.hash_array(u.astype(object))
        return b.append_column(
            "bucket", pa.array((u % nb).astype(np.int64)))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby([key, "win"], sort=False)[value] \
            .agg(n_events="size", sum_value="sum").reset_index()
        a["n_events"] = a["n_events"].astype(np.int64)
        a["sum_value"] = a["sum_value"].round(6)
        return a[[key, "win", "n_events", "sum_value"]]

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas")


def tumbling_window(ds, size_s: int, key: str = "user_id", ts: str = "ts",
                    value: str = "value",
                    approx_rows: int | None = None):
    """(key, win, n_events, sum_value); win = floor(epoch / size)."""
    def win(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        w = pc.divide(us, pa.scalar(size_s * US, pa.int64()))
        return pa.table({key: b[key], "win": w, value: b[value]})

    return _win_agg(ds.map_batches(win, batch_format="pyarrow"), key,
                    value, approx_rows)


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


def rollup_events(ds, ts: str = "ts", key: str = "event_type",
                  value: str = "value"):
    """GROUP BY ROLLUP((key, day) -> (key) -> ()) over an event stream:
    (event_type, day, n_events, total_value) at all three levels, the
    subtotal rows labeled key='ALL' / day=-1.

    The fine key domain is BOUNDED (types x days), so this is the
    map-side-partial + driver-merge shape (CLAUDE.md: replace count
    groupbys with partials where only aggregates are needed) — one pass,
    no shuffle.  Values sum as integer cents (floor(v*100 + 0.5), the
    identical float expression in the SQL oracle), so totals are exact
    int64 sums — no float-association divergence at any scale.
    """
    DAY = 86400 * US

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY
        k = b[key].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b[value].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"k": k, "day": day, "cents": cents})
        g = df.groupby(["k", "day"], sort=True).agg(
            n=("cents", "size"), c=("cents", "sum")).reset_index()
        return pa.table({"event_type": pa.array(g["k"], pa.string()),
                         "day": pa.array(g["day"], pa.int64()),
                         "n": pa.array(g["n"].astype(np.int64)),
                         "c": pa.array(g["c"].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"event_type": pd.Series([], dtype=str),
                             "day": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "total_value": pd.Series([], dtype=float)})
    lvl2 = parts.groupby(["event_type", "day"], sort=True).agg(
        n_events=("n", "sum"), cents=("c", "sum")).reset_index()
    lvl1 = lvl2.groupby("event_type", sort=True).agg(
        n_events=("n_events", "sum"), cents=("cents", "sum")).reset_index()
    lvl1["day"] = np.int64(-1)
    lvl0 = pd.DataFrame({"event_type": ["ALL"], "day": np.int64(-1),
                         "n_events": [lvl1["n_events"].sum()],
                         "cents": [lvl1["cents"].sum()]})
    out = pd.concat([lvl2, lvl1, lvl0], ignore_index=True)
    out["total_value"] = out["cents"].astype(np.int64) / 100.0
    out["n_events"] = out["n_events"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    return out[["event_type", "day", "n_events", "total_value"]]


def running_user_totals(ds, key: str = "user_id", ts: str = "ts",
                        value: str = "value", id_col: str = "event_id"):
    """Per-key running cumulative aggregate (the streaming window-scan:
    sum(value) OVER (PARTITION BY key ORDER BY ts, id)): one coarse
    key-bucket shuffle, one in-bucket lexsort + per-segment cumsum.
    Values accumulate as integer cents (exact at any scale); rn is the
    1-based position within the key's timeline."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], key: pa.array(k),
                         "us": us, "cents": pa.array(cents),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((ev, us, k))
        k, us, ev, cents = k[order], us[order], ev[order], cents[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        seg_lens = np.diff(np.concatenate([starts, [len(k)]]))
        run = np.cumsum(cents)
        prev = np.concatenate([[0], run[starts[1:] - 1]]) \
            if len(starts) else np.empty(0, np.int64)
        base = np.repeat(prev, seg_lens)
        pos = np.arange(len(k), dtype=np.int64)
        seg0 = np.repeat(pos[starts], seg_lens)
        return pd.DataFrame({id_col: ev, key: k,
                             "rn": pos - seg0 + 1,
                             "running_value": (run - base) / 100.0})

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(scan, batch_format="pandas")


def lag_deltas(ds, key: str = "user_id", ts: str = "ts",
               value: str = "value", id_col: str = "event_id"):
    """Per-key LAG window scan (value - LAG(value), ts - LAG(ts) OVER
    (PARTITION BY key ORDER BY ts, id)): same one-coarse-key-bucket
    shuffle + in-bucket lexsort shape as running_user_totals.  Deltas
    accumulate as integer cents / microseconds (exact int64 at any
    scale); only rows with a predecessor are emitted (rn >= 2), so the
    result carries no NULLs."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], key: pa.array(k),
                         "us": us, "cents": pa.array(cents),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((ev, us, k))
        k, us, ev, cents = k[order], us[order], ev[order], cents[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        seg_lens = np.diff(np.concatenate([starts, [len(k)]]))
        pos = np.arange(len(k), dtype=np.int64)
        rn = pos - np.repeat(pos[starts], seg_lens) + 1
        keep = rn >= 2  # first event per key has no predecessor
        return pd.DataFrame({
            id_col: ev[keep], key: k[keep], "rn": rn[keep],
            "delta_cents": (cents - np.concatenate([[0], cents[:-1]]))[keep],
            "gap_us": (us - np.concatenate([[0], us[:-1]]))[keep]})

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(scan, batch_format="pandas")


def cube_events(ds, ts: str = "ts", key: str = "event_type",
                value: str = "value"):
    """GROUP BY CUBE(key, day): all four grouping sets — (key, day),
    (key), (day), () — subtotals labeled key='ALL' / day=-1.  Same
    map-side-partial + driver-merge shape as rollup_events (the fine
    domain is bounded by types x days); integer-cents sums are exact."""
    DAY = 86400 * US

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY
        k = b[key].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b[value].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"k": k, "day": day, "cents": cents})
        g = df.groupby(["k", "day"], sort=True).agg(
            n=("cents", "size"), c=("cents", "sum")).reset_index()
        return pa.table({"event_type": pa.array(g["k"], pa.string()),
                         "day": pa.array(g["day"], pa.int64()),
                         "n": pa.array(g["n"].astype(np.int64)),
                         "c": pa.array(g["c"].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ["event_type", "day", "n_events", "total_value"]
    if len(parts) == 0:
        return pd.DataFrame({"event_type": pd.Series([], dtype=str),
                             "day": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "total_value": pd.Series([], dtype=float)})
    fine = parts.groupby(["event_type", "day"], sort=True).agg(
        n_events=("n", "sum"), cents=("c", "sum")).reset_index()
    by_key = fine.groupby("event_type", sort=True).agg(
        n_events=("n_events", "sum"), cents=("cents", "sum")).reset_index()
    by_key["day"] = np.int64(-1)
    by_day = fine.groupby("day", sort=True).agg(
        n_events=("n_events", "sum"), cents=("cents", "sum")).reset_index()
    by_day["event_type"] = "ALL"
    total = pd.DataFrame({"event_type": ["ALL"], "day": np.int64(-1),
                          "n_events": [fine["n_events"].sum()],
                          "cents": [fine["cents"].sum()]})
    out = pd.concat([fine, by_key, by_day, total], ignore_index=True)
    out["total_value"] = out["cents"].astype(np.int64) / 100.0
    out["n_events"] = out["n_events"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    return out[cols]


DAY_US = 86_400 * US


def funnel_counts(ds, stages: list[str], key: str = "user_id",
                  ts: str = "ts", type_col: str = "event_type",
                  window_s: int | None = None) -> pd.DataFrame:
    """Ordered conversion funnel: users reaching stage k = users with an
    event of type stages[k] STRICTLY after the timestamp at which they
    reached stage k-1 (stage 0 = their earliest stages[0] event), and —
    when `window_s` is set — no later than `window_s` seconds after the
    user entered the funnel (their stage-0 timestamp): the standard
    conversion-window semantics.

    Shape: one coarse user-bucket shuffle (buckets partition users, so
    per-bucket reach counts are disjoint and sum exactly), a per-bucket
    kernel that runs len(stages) vectorized min-reductions — never a
    per-user Python loop — then a driver merge of the tiny
    (bucket x stage) partial table.  Returns (stage 1-based, stage_name,
    users)."""
    from .algos.triangles import n_buckets_for

    idx = {s: i for i, s in enumerate(stages)}
    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        tcol = b[type_col]
        st = np.full(len(tcol), -1, dtype=np.int64)
        for s, i in idx.items():  # len(stages) vectorized compares
            st[pc.equal(tcol, s).to_numpy(zero_copy_only=False)] = i
        keep = st >= 0
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        us = pc.cast(b[ts], pa.int64()).to_numpy(
            zero_copy_only=False)[keep]
        return pa.table({key: pa.array(k), "us": pa.array(us),
                         "stage": pa.array(st[keep]),
                         "kb": pa.array((k % nb).astype(np.int64))})

    n_stages = len(stages)

    window_us = None if window_s is None else window_s * US

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        users = np.empty(n_stages, dtype=np.int64)
        reached = None  # Series: user -> us at which stage s was reached
        entered = None  # Series: user -> stage-0 us (funnel entry)
        for s in range(n_stages):
            rows = g[g["stage"] == s]
            if reached is not None:
                prev = rows[key].map(reached)
                keep = prev.notna() & (rows["us"] > prev)
                if window_us is not None:
                    keep &= rows["us"] <= rows[key].map(entered) + window_us
                rows = rows[keep]
            reached = rows.groupby(key)["us"].min()
            if entered is None:
                entered = reached
            users[s] = len(reached)
        return pd.DataFrame({"stage": np.arange(1, n_stages + 1,
                                                dtype=np.int64),
                             "users": users})

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(kern, batch_format="pandas") \
              .to_pandas()  # nb x n_stages rows — tiny
    out = parts.groupby("stage", sort=True)["users"].sum().reset_index()
    out["stage_name"] = [stages[s - 1] for s in out["stage"]]
    out["users"] = out["users"].astype(np.int64)
    return out[["stage", "stage_name", "users"]]


def retention_cohorts(ds, max_offset: int = 7, key: str = "user_id",
                      ts: str = "ts") -> pd.DataFrame:
    """Classic cohort retention: cohort_day = a user's first active
    calendar day (UTC, epoch days); users(cohort_day, day_offset) =
    distinct users of that cohort active on cohort_day + day_offset,
    for offsets 0..max_offset.

    Same disjoint-user-bucket shape as funnel_counts: activity is first
    reduced to distinct (user, day) pairs inside each bucket, the
    per-bucket kernel derives cohorts and offsets vectorized, and the
    driver sums the tiny (cohort, offset) partials."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        return pa.table({key: pa.array(k), "day": pa.array(day),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        ud = g[[key, "day"]].drop_duplicates()
        cohort = ud.groupby(key)["day"].min()
        coh = ud[key].map(cohort).to_numpy(np.int64)
        off = ud["day"].to_numpy(np.int64) - coh
        keep = off <= max_offset
        part = pd.DataFrame({"cohort_day": coh[keep],
                             "day_offset": off[keep]})
        out = part.groupby(["cohort_day", "day_offset"], sort=True) \
                  .size().rename("users").reset_index()
        return out

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(kern, batch_format="pandas") \
              .to_pandas()  # <= nb x days x offsets rows — small
    if len(parts) == 0:
        return pd.DataFrame({"cohort_day": pd.Series([], dtype=np.int64),
                             "day_offset": pd.Series([], dtype=np.int64),
                             "users": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["cohort_day", "day_offset"], sort=True) \
               .agg(users=("users", "sum")).reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def cohort_revenue(ds, max_offset: int = 8, key: str = "user_id",
                   ts: str = "ts", value: str = "value") -> pd.DataFrame:
    """Cohort LTV matrix: cohort_week = a user's first active epoch-week
    (UTC); per (cohort_week, week_offset 0..max_offset) the event count
    and revenue in EXACT integer cents (the pivot_user_counts
    floor(v*100+0.5) convention, so sums are association-free).

    Same disjoint-user-bucket shape as retention_cohorts: each bucket
    holds every event of its users, derives cohorts and offsets
    vectorized, and emits tiny (cohort, offset) partials the driver
    sums."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())
    week_us = 7 * DAY_US

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({key: pa.array(k),
                         "wk": pa.array(us // week_us),
                         "cents": pa.array(cents),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        cohort = g.groupby(key)["wk"].min()
        coh = g[key].map(cohort).to_numpy(np.int64)
        off = g["wk"].to_numpy(np.int64) - coh
        keep = off <= max_offset
        part = pd.DataFrame({"cohort_week": coh[keep],
                             "week_offset": off[keep],
                             "cents": g["cents"].to_numpy(np.int64)[keep]})
        return part.groupby(["cohort_week", "week_offset"], sort=True) \
                   .agg(n_events=("cents", "size"),
                        revenue_cents=("cents", "sum")).reset_index()

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({
            "cohort_week": pd.Series([], dtype=np.int64),
            "week_offset": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "revenue_cents": pd.Series([], dtype=np.int64)})
    out = parts.groupby(["cohort_week", "week_offset"], sort=True) \
               .agg(n_events=("n_events", "sum"),
                    revenue_cents=("revenue_cents", "sum")).reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def pivot_user_counts(ds, types: list[str], key: str = "user_id",
                      type_col: str = "event_type",
                      value: str = "value"):
    """Wide per-user pivot: one row per user with count + exact
    integer-cents sum columns per event type (n_<t>, cents_<t>).

    Map-side partial pivot per batch (in-batch pandas groupby — one
    vectorized reduction), then the usual coarse user-bucket
    groupby(kb).map_groups merge; per-user results stay distributed (a
    Dataset out — the user domain is unbounded at scale)."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())
    n_cols = [f"n_{t}" for t in types]
    c_cols = [f"cents_{t}" for t in types]

    def partial(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tcol = b[type_col].to_numpy(zero_copy_only=False)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({key: k, "t": tcol, "cents": cents})
        g = df.groupby([key, "t"], sort=False).agg(
            n=("cents", "size"), c=("cents", "sum")).reset_index()
        wide_n = g.pivot_table(index=key, columns="t", values="n",
                               aggfunc="sum", fill_value=0)
        wide_c = g.pivot_table(index=key, columns="t", values="c",
                               aggfunc="sum", fill_value=0)
        cols = {key: pa.array(wide_n.index.to_numpy(np.int64))}
        for t in types:
            n = (wide_n[t] if t in wide_n else
                 pd.Series(0, index=wide_n.index))
            c = (wide_c[t] if t in wide_c else
                 pd.Series(0, index=wide_c.index))
            cols[f"n_{t}"] = pa.array(n.to_numpy(np.int64))
            cols[f"cents_{t}"] = pa.array(c.to_numpy(np.int64))
        cols["kb"] = pa.array(
            (wide_n.index.to_numpy(np.int64) % nb).astype(np.int64))
        return pa.table(cols)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, sort=True)[n_cols + c_cols].sum() \
               .reset_index()
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("kb").map_groups(merge, batch_format="pandas")


def zscore_outliers(ds, key: str = "user_id", value: str = "value",
                    id_col: str = "event_id", threshold: float = 3.0,
                    round_to: int = 6):
    """Per-key z-score outliers: events with |v - mean_k| > t * std_k
    (population std, the explicit sum/sumsq formula — NOT a builtin
    Welford variance, so the SQL oracle computes the identical
    expression).  Keys with n < 2 or zero variance emit nothing.

    ONE coarse key-bucket shuffle: all of a key's rows land in one
    bucket, so the in-bucket kernel derives the moments AND filters in
    the same vectorized pass — no separate moments stage, nothing
    key-domain-sized on the driver.  Dataset out (id, key, z)."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                         key: pa.array(k),
                         value: pc.cast(b[value], pa.float64()),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        v = g[value].to_numpy(np.float64)
        ev = g[id_col].to_numpy(np.int64)
        order = np.argsort(k, kind="stable")
        k, v, ev = k[order], v[order], ev[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(k)]]))
        seg = np.repeat(np.arange(len(starts)), lens)
        s = np.add.reduceat(v, starts)
        ss = np.add.reduceat(v * v, starts)
        n = lens.astype(np.float64)
        mean = s / n
        var = (ss - s * s / n) / n
        ok_seg = (lens >= 2) & (var > 0)
        std = np.sqrt(np.where(var > 0, var, 1.0))
        z = (v - mean[seg]) / std[seg]
        keep = ok_seg[seg] & (np.abs(v - mean[seg])
                              > threshold * std[seg])
        return pd.DataFrame({id_col: ev[keep], key: k[keep],
                             "z": np.round(z[keep], round_to)})

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(kern, batch_format="pandas")


def markov_transitions(ds, key: str = "user_id", ts: str = "ts",
                       typ: str = "event_type",
                       id_col: str = "event_id") -> pd.DataFrame:
    """Event-type transition matrix over per-user timelines: count
    (prev_type -> event_type) pairs of consecutive events ordered by
    (ts, id) within each user, with row-normalized probabilities — the
    first-order Markov model a behavioral/sequence pipeline fits.

    Scale shape: one coarse user-bucket shuffle (the running_user_totals
    convention), each bucket task emits its <= |types|^2 local
    transition counts (vectorized lexsort + adjacent-pair mask), and the
    driver merge is O(buckets * |types|^2) — the type domain is a
    catalog-bounded set, never a per-row key.  Returns
    (prev_type, event_type, n, p) sorted, p rounded to 6."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: pa.array(k),
                         "us": pc.cast(b[ts], pa.int64()),
                         id_col: b[id_col], typ: b[typ],
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        t = g[typ].to_numpy(object)
        order = np.lexsort((ev, us, k))
        k, t = k[order], t[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                                 "event_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        pairs = pd.DataFrame({"prev_type": t[:-1][same],
                              "event_type": t[1:][same]})
        agg = pairs.groupby(["prev_type", "event_type"], sort=False) \
                   .size().rename("n").reset_index()
        return agg

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(scan, batch_format="pandas") \
              .to_pandas()
    tot = parts.groupby(["prev_type", "event_type"], sort=True)["n"] \
               .sum().reset_index()
    row = tot.groupby("prev_type")["n"].transform("sum")
    tot["p"] = np.round(tot["n"].to_numpy(np.float64)
                        / row.to_numpy(np.float64), 6)
    tot["n"] = tot["n"].astype(np.int64)
    return tot.reset_index(drop=True)


def dau_wau(ds, key: str = "user_id", ts: str = "ts"):
    """Weekly engagement report: per ISO week (Monday-truncated), the
    distinct weekly actives (WAU), the mean daily actives over the
    week's 7 calendar days (avg_dau) and stickiness = avg_dau / wau.

    Distinct counting without a distinct shuffle: (user, day) and
    (user, week) pairs dedup inside each coarse USER bucket (a user's
    rows land in one bucket, so per-bucket dedup is globally exact),
    per-day/week counts come back as tiny partials and merge on the
    driver.  Returns (week_day, wau, avg_dau, stickiness), week_day =
    days-since-epoch of the Monday, floats rounded to 6."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())
    us_per_day = 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // us_per_day
        return pa.table({key: pa.array(k), "day": pa.array(day),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        week = day - (day + 3) % 7  # 1969-12-29 was a Monday
        ud = pd.DataFrame({"k": k, "day": day}).drop_duplicates()
        uw = pd.DataFrame({"k": k, "week": week}).drop_duplicates()
        dd = ud.groupby("day").size().rename("n").reset_index()
        ww = uw.groupby("week").size().rename("n").reset_index()
        dd["kind"], ww["kind"] = 0, 1
        ww = ww.rename(columns={"week": "day"})
        return pd.concat([dd, ww], ignore_index=True)[
            ["kind", "day", "n"]]

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    dau = parts[parts["kind"] == 0].groupby("day")["n"].sum()
    wau = parts[parts["kind"] == 1].groupby("day")["n"].sum()
    rows = []
    for wk, w in wau.sort_index().items():
        days = dau.reindex(range(wk, wk + 7), fill_value=0)
        avg = float(days.sum()) / 7.0
        rows.append((int(wk), int(w), round(avg, 6),
                     round(avg / float(w), 6)))
    return pd.DataFrame(rows, columns=["week_day", "wau", "avg_dau",
                                       "stickiness"])


def ab_test(ds, key: str = "user_id", value: str = "value"):
    """Two-sample report between the deterministic A/B split
    user_id % 2: group sizes, means, and the Welch t statistic — all
    derived from map-side (n, sum, sumsq) partials (one stateless
    pass, three numbers per group per block).  Variance uses the
    sum-of-squares identity with the IDENTICAL expression in the SQL
    twin; only means and t are emitted (rounded 6) so the 1e-16
    association noise in the raw sums stays far below the rounding."""

    def part(b: pa.Table) -> pa.Table:
        g = (b[key].to_numpy(zero_copy_only=False).astype(np.int64)
             % 2)
        v = b[value].to_numpy(zero_copy_only=False).astype(np.float64)
        out = {"g": [], "n": [], "s": [], "ss": []}
        for gr in (0, 1):
            m = g == gr
            out["g"].append(gr)
            out["n"].append(int(m.sum()))
            out["s"].append(float(v[m].sum()))
            out["ss"].append(float((v[m] * v[m]).sum()))
        return pa.table({"g": pa.array(out["g"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "s": pa.array(out["s"], pa.float64()),
                         "ss": pa.array(out["ss"], pa.float64())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("g").agg(n=("n", "sum"), s=("s", "sum"),
                                 ss=("ss", "sum"))
    n0, s0, ss0 = (float(agg.loc[0, c]) for c in ("n", "s", "ss"))
    n1, s1, ss1 = (float(agg.loc[1, c]) for c in ("n", "s", "ss"))
    m0, m1 = s0 / n0, s1 / n1
    v0 = (ss0 - s0 * s0 / n0) / (n0 - 1)
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    t = (m1 - m0) / np.sqrt(v1 / n1 + v0 / n0)
    return pd.DataFrame({
        "n_a": np.array([int(n0)], np.int64),
        "n_b": np.array([int(n1)], np.int64),
        "mean_a": [round(m0, 6)], "mean_b": [round(m1, 6)],
        "t_stat": [round(float(t), 6)]})


def daily_anomalies(ds, ts: str = "ts"):
    """Time-series anomaly screen over the event stream: per-day event
    counts z-scored against the whole day series.  Counts come back as
    map-side per-day partials (day domain is calendar-bounded) and all
    statistics derive from exact integers with the identical expression
    in the SQL twin, so the floats are bit-equal.  Returns
    (day, n, z) sorted by day, z rounded to 6."""

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["n"].sum().reset_index()
    n = d["n"].to_numpy(np.int64)
    k = float(len(d))
    s = float(n.sum())
    ss = float((n * n).sum())
    mean = s / k
    var = (ss - s * s / k) / (k - 1)
    d["z"] = np.round((n - mean) / np.sqrt(var), 6)
    d["n"] = d["n"].astype(np.int64)
    return d.reset_index(drop=True)


WATERMARK_S = 72 * 3600  # 72h allowed lateness


def watermark_late_events(ds, delay_s: int = WATERMARK_S,
                          key: str = "user_id", ts: str = "ts",
                          id_col: str = "event_id"):
    """Streaming watermark late-event detection: an event is LATE when
    its timestamp is more than `delay_s` behind the per-key watermark
    (the max event time already seen in ARRIVAL order) at its arrival.

    The synthetic events table carries no ingest sequence (event_id is
    time-ordered by construction, which would make every stream
    perfectly in order), so arrival order is SIMULATED by the
    deterministic 64-bit avalanche of event_id — the same documented
    seeded-constant convention as the LSH planes; a real ingest would
    use its offset/sequence column here.

    Scale shape: one coarse key-bucket shuffle, in-bucket lexsort by
    (key, arrival) + a per-segment cumulative max (grouped cummax) —
    the running_user_totals pattern with max instead of sum.  Exact
    integer microseconds end-to-end."""
    from .algos.matching import edge_priority
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())
    delay_us = int(delay_s) * US

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ev = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = edge_priority(ev, np.zeros(len(ev), np.int64))
        # arr stays uint64: an int64 reinterpret would wrap values past
        # 2^63 and change the sort order vs the SQL UBIGINT ORDER BY
        return pa.table({id_col: pa.array(ev), key: pa.array(k),
                         "us": us, "arr": pa.array(arr),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        arr = g["arr"].to_numpy(np.uint64)
        order = np.lexsort((arr, k))
        k, us, ev = k[order], us[order], ev[order]
        cm = pd.Series(us).groupby(pd.Series(k), sort=False) \
            .cummax().to_numpy()
        starts = np.flatnonzero(np.concatenate([[True],
                                                k[1:] != k[:-1]]))
        prev = np.empty(len(us), np.int64)
        prev[1:] = cm[:-1]
        has_prev = np.ones(len(us), bool)
        has_prev[starts] = False
        prev[starts] = 0  # masked out below (min-sentinel would wrap)
        late = has_prev & (us < prev - delay_us)
        return pd.DataFrame({
            id_col: ev[late],
            key: k[late],
            "lateness_us": (prev[late] - us[late]).astype(np.int64)})

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(scan, batch_format="pandas")


MOVAVG_WIN = 5


def moving_average(ds, win: int = MOVAVG_WIN, key: str = "user_id",
                   ts: str = "ts", value: str = "value",
                   id_col: str = "event_id"):
    """Per-key trailing moving average over the last `win` rows
    (inclusive), ordered by (ts, id) — avg(value) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN win-1 PRECEDING AND CURRENT ROW).
    Same one-bucket-shuffle shape as running_user_totals; window sums
    in exact integer cents via cumsum differences, the final division
    is the IDENTICAL float expression on both sides."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], key: pa.array(k),
                         "us": us, "cents": pa.array(cents),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((ev, us, k))
        k, ev, cents = k[order], ev[order], cents[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                k[1:] != k[:-1]]))
        seg_lens = np.diff(np.concatenate([starts, [len(k)]]))
        pos = np.arange(len(k), dtype=np.int64)
        rank = pos - np.repeat(pos[starts], seg_lens)
        m = np.minimum(rank + 1, win)
        run = np.cumsum(cents)
        lo = pos - m  # >= segment start - 1 by construction
        base = np.where(lo >= 0, run[np.maximum(lo, 0)], 0)
        wsum = run - base
        return pd.DataFrame({id_col: ev, key: k,
                             "rn": rank + 1,
                             "mov_avg": np.round(
                                 wsum / (100.0 * m), 6)})

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(scan, batch_format="pandas")


def weekly_churn(ds, key: str = "user_id", ts: str = "ts"):
    """Weekly churn: per Monday-truncated week, the distinct actives,
    the users retained into week+1 and the churn rate.

    Scale shape (same disjoint-user-bucket trick as dau_wau): a user's
    full activity lands in ONE coarse bucket, so the (user, week) pair
    set — and hence week -> week+1 membership — is bucket-local and
    globally exact.  Each bucket emits tiny (week, active, retained)
    partials; the driver sums over the calendar-bounded week domain.
    No distinct shuffle, no self-join of the event stream.

    Returns (week_day, active, retained, churn_rate) sorted by week,
    churn_rate = (active - retained) / active rounded to 6."""
    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        week = day - (day + 3) % 7  # 1969-12-29 was a Monday
        return pa.table({key: pa.array(k), "week": pa.array(week),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        uw = pd.DataFrame({"k": g[key].to_numpy(np.int64),
                           "week": g["week"].to_numpy(np.int64)}) \
            .drop_duplicates()
        nxt = uw.assign(week=uw["week"] - 7)  # presence at week+7
        ret = uw.merge(nxt, on=["k", "week"], how="inner")
        act = uw.groupby("week").size().rename("active").reset_index()
        rt = ret.groupby("week").size().rename("retained").reset_index()
        out = act.merge(rt, on="week", how="left")
        out["retained"] = out["retained"].fillna(0).astype(np.int64)
        return out

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("kb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    d = parts.groupby("week", sort=True).sum().reset_index()
    act = d["active"].to_numpy(np.int64)
    ret = d["retained"].to_numpy(np.int64)
    return pd.DataFrame({
        "week_day": d["week"].astype(np.int64),
        "active": act, "retained": ret,
        "churn_rate": np.round((act - ret) / act.astype(np.float64), 6),
    })


SMOOTH_ALPHA_NUM = 3  # alpha = 3/10, injected into SQL as a literal


def daily_smooth(ds, ts: str = "ts", value: str = "value"):
    """Simple exponential smoothing of the daily revenue series:
    s_1 = x_1;  s_i = alpha*x_i + (1-alpha)*s_{i-1}  (alpha = 0.3),
    x_i = the day's exact integer-cents sum / 100.0.

    Scale shape: per-day cents sums come back as map-side partials
    (day domain is calendar-bounded) and merge on the driver; the
    recurrence itself runs over the tiny day series.  Both engines
    evaluate the IDENTICAL float expression in the identical day
    order, so the doubles agree bit-for-bit before the round-6.

    Returns (day, cents, smoothed) sorted by day."""
    alpha = SMOOTH_ALPHA_NUM / 10.0

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["cents"].sum().reset_index()
    cents = d["cents"].to_numpy(np.int64)
    sm = np.empty(len(d), np.float64)
    if len(d):
        sm[0] = cents[0] / 100.0
        for i in range(1, len(d)):
            sm[i] = alpha * (cents[i] / 100.0) + (1.0 - alpha) * sm[i - 1]
    return pd.DataFrame({"day": d["day"].astype(np.int64),
                         "cents": cents,
                         "smoothed": np.round(sm, 6)})


def first_touch_attribution(ds, convert_type: str = "purchase",
                            key: str = "user_id", ts: str = "ts",
                            etype: str = "event_type",
                            value: str = "value",
                            id_col: str = "event_id",
                            touch: str = "first"):
    """First-touch conversion attribution: for every key with at least
    one `convert_type` event, credit that key's FIRST such event's value
    to the key's first-ever event_type (the acquisition channel), in the
    deterministic (ts, id) order.  Returns (channel, n_users,
    total_value) — value totals as exact integer cents.

    100-TB plan: ONE coarse key-bucket shuffle (the running_user_totals
    shape) with a fully vectorized in-bucket kernel; each bucket emits
    only per-channel partials (the channel domain is catalog-bounded),
    so the merge is a driver-side fold over n_buckets x n_channels rows.
    """
    import pandas as pd

    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count())

    def tag(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64())
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({id_col: b[id_col], key: pa.array(k),
                         "us": us, "cents": pa.array(cents),
                         etype: b[etype],
                         "kb": pa.array((k % nb).astype(np.int64))})

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev = g[id_col].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        types = g[etype].to_numpy()
        order = np.lexsort((ev, us, k))
        k, us, ev, cents = k[order], us[order], ev[order], cents[order]
        types = types[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        seg_lens = np.diff(np.concatenate([starts, [len(k)]]))
        sid = np.repeat(np.arange(len(starts)), seg_lens)
        conv_pos = np.flatnonzero(types == convert_type)
        if len(conv_pos) == 0:
            return pd.DataFrame({
                "channel": pd.Series([], dtype=object),
                "n_users": pd.Series([], dtype=np.int64),
                "cents": pd.Series([], dtype=np.int64)})
        # first convert position per segment (rows are in segment order,
        # so a min per segment id is the first one)
        first_conv = np.full(len(starts), np.iinfo(np.int64).max,
                             np.int64)
        np.minimum.at(first_conv, sid[conv_pos], conv_pos)
        has = first_conv != np.iinfo(np.int64).max
        if touch == "first":
            # the key's first-ever event = acquisition channel
            chan = types[starts[has]]
        else:
            # LAST touch: the event immediately before the first
            # conversion (the conversion itself when it opens the key)
            fc, st = first_conv[has], starts[has]
            chan = types[np.where(fc > st, fc - 1, fc)]
        credit = cents[first_conv[has]]
        out = pd.DataFrame({"channel": chan, "cents": credit})
        r = out.groupby("channel", sort=True).agg(
            n_users=("cents", "size"), cents=("cents", "sum")) \
            .reset_index()
        r["n_users"] = r["n_users"].astype(np.int64)
        return r[["channel", "n_users", "cents"]]

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("kb").map_groups(attribute, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pd.DataFrame({"channel": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype="int64"),
                             "total_value": pd.Series([], dtype=float)})
    m = parts.groupby("channel", as_index=False)[["n_users", "cents"]] \
        .sum()
    m["n_users"] = m["n_users"].astype(np.int64)
    m["total_value"] = (m["cents"] / 100.0).round(6)
    return m[["channel", "n_users", "total_value"]] \
        .sort_values("channel", kind="mergesort").reset_index(drop=True)


CONCURRENCY_HOLD_S = 900  # each event holds a session open 15 min


def peak_concurrency(ds, hold_s: int = CONCURRENCY_HOLD_S,
                     ts: str = "ts"):
    """Sweep-line peak concurrency per day: every event opens an
    interval [ts, ts+hold_s); the result is, per epoch-day, the maximum
    number of simultaneously open intervals observed at any delta point
    in that day plus the first microsecond it was reached —
    (day, peak, peak_ts_us).  Half-open semantics: an end delta sorts
    before a start delta at the same microsecond.

    100-TB plan: the classic parallel prefix scan.  Each event emits two
    (t, +/-1) deltas in map_batches; deltas shuffle ONCE on a
    day-aligned time-slice key (slice count sized from the row count, so
    no slice exceeds ~200k deltas); each slice's kernel sorts locally
    and emits a 4-number partial (sum, max-prefix, argmax t, day); the
    driver folds the partials in time order — O(slices), never the data.
    The running count carries across day boundaries through the fold's
    base offset, so per-day peaks are globally exact.
    """
    import pandas as pd

    from .algos.triangles import n_buckets_for

    DAY_US = 86400 * US
    hold_us = hold_s * US

    ds = ds.select_columns([ts]).materialize()
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                             "peak": pd.Series([], dtype="int64"),
                             "peak_ts_us": pd.Series([], dtype="int64")})
    import ray.data  # noqa: F401  (aggregate import side)
    from ray.data.aggregate import Max, Min

    mm = ds.map_batches(
        lambda b: pa.table({"us": pc.cast(b[ts], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("us"), Max("us"))
    tmin, tmax = int(mm["min(us)"]), int(mm["max(us)"])
    n_days = max(1, (tmax + hold_us) // DAY_US - tmin // DAY_US + 1)
    nsub = max(1, min(DAY_US,
                      -(-n_buckets_for(2 * n) // int(n_days))))
    slice_us = -(-DAY_US // nsub)  # day-aligned: DAY_US % slice handled
    # by keying on (day, intra-day slice) so slices never straddle days

    def deltas(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        t = np.concatenate([us, us + hold_us])
        d = np.concatenate([np.ones(len(us), np.int64),
                            np.full(len(us), -1, np.int64)])
        day = t // DAY_US
        sub = (t % DAY_US) // slice_us
        return pa.table({"t": pa.array(t), "d": pa.array(d),
                         "g": pa.array(day * nsub + sub)})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        t = g["t"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        o = np.lexsort((d, t))  # end (-1) before start (+1) at a tie
        t, d = t[o], d[o]
        c = np.cumsum(d)
        mx = int(c.max())
        at = int(t[int(np.argmax(c))])  # first index attaining max
        return pd.DataFrame({"g": g["g"].iloc[:1].to_numpy(np.int64),
                             "total": [int(c[-1])], "mx": [mx],
                             "at": [at]})

    parts = (ds.map_batches(deltas, batch_format="pyarrow")
             .groupby("g").map_groups(partial, batch_format="pandas")
             .to_pandas().sort_values("g", kind="mergesort"))
    base = 0
    days, peaks, ats = {}, {}, {}
    for g, total, mx, at in parts.itertuples(index=False):
        day = int(g) // nsub
        peak = base + int(mx)
        if day not in peaks or peak > peaks[day]:
            peaks[day] = peak
            ats[day] = int(at)
        base += int(total)
    out = pd.DataFrame({"day": sorted(peaks),
                        "peak": [peaks[d] for d in sorted(peaks)],
                        "peak_ts_us": [ats[d] for d in sorted(peaks)]})
    return out.astype({"day": np.int64, "peak": np.int64,
                       "peak_ts_us": np.int64})


def user_streaks(ds, key: str = "user_id", ts: str = "ts"):
    """Longest consecutive-day activity streak per user (gaps-and-
    islands): one row per user — (user_id, best_streak, streak_start_day)
    — where best_streak is the user's longest run of consecutive active
    epoch-days and streak_start_day its first day; length ties keep the
    EARLIEST streak.

    100-TB plan: activity collapses to distinct (user, day) pairs with an
    in-batch np.unique pre-dedup (a user's year is <= 366 rows no matter
    how many events), then ONE coarse user-bucket groupby — never a
    per-user fine-key aggregate (CLAUDE.md: Ray 2.49 hash aggregates on
    unbounded key domains are 25x slower than ~200k-row buckets).  Each
    bucket's kernel is fully vectorized: lexsorted (user, day) uniques,
    run breaks where the day step != 1, bincount run lengths, per-user
    argbest via one lexsort.  A user's days land in exactly one bucket,
    so per-bucket bests are globally exact."""
    from .algos.triangles import n_buckets_for

    DAY_US = 86400 * US
    ds = ds.select_columns([key, ts]).materialize()
    n = ds.count()
    empty = pd.DataFrame(
        {"user_id": pd.Series([], dtype="int64"),
         "best_streak": pd.Series([], dtype="int64"),
         "streak_start_day": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    nb = n_buckets_for(n)

    def days(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        day = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False) \
            // DAY_US
        rows = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({"u": pa.array(rows[:, 0]),
                         "day": pa.array(rows[:, 1]),
                         "ub": pa.array(rows[:, 0] % nb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        rows = np.unique(np.stack([g["u"].to_numpy(np.int64),
                                   g["day"].to_numpy(np.int64)], axis=1),
                         axis=0)
        u, day = rows[:, 0], rows[:, 1]
        brk = np.empty(len(u), dtype=bool)
        brk[0] = True
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1] + 1)
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        heads = np.flatnonzero(brk)
        run_user, run_start = u[heads], day[heads]
        order = np.lexsort((run_start, -run_len, run_user))
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        ru = run_user[order]
        first[1:] = ru[1:] != ru[:-1]
        sel = order[first]
        return pd.DataFrame({"user_id": run_user[sel],
                             "best_streak": run_len[sel],
                             "streak_start_day": run_start[sel]}) \
            .astype(np.int64)

    return ds.map_batches(days, batch_format="pyarrow") \
             .groupby("ub").map_groups(kern, batch_format="pandas")


def compact_latest(ds, key: str = "user_id", ts: str = "ts",
                   order_id: str = "event_id",
                   type_col: str = "event_type", value: str = "value"):
    """Last-writer-wins log compaction (the CDC / upsert-merge shape):
    one row per key — the event with the greatest (ts, order_id), the
    order_id tie-break making the winner deterministic under duplicate
    timestamps.  Output (user_id, last_ts_us, last_type, last_value
    rounded to 6).

    100-TB plan: the classic combiner reduction.  Each batch pre-reduces
    to one winner per key it sees (vectorized lexsort + take-last), then
    ONE coarse key-bucket groupby re-runs the same kernel — a key's
    partials all land in one bucket, so the bucket winner is globally
    exact.  Never a per-key fine-grained aggregate, never a global sort."""
    from .algos.triangles import n_buckets_for

    ds = ds.select_columns([key, ts, order_id, type_col, value]) \
           .materialize()
    n = ds.count()
    if n == 0:
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "last_ts_us": pd.Series([], dtype="int64"),
             "last_type": pd.Series([], dtype="object"),
             "last_value": pd.Series([], dtype="float64")})
    nb = n_buckets_for(n)

    def reduce_kern(u, t, oid, typ, val):
        order = np.lexsort((oid, t, u))
        u, t, oid = u[order], t[order], oid[order]
        typ, val = typ[order], val[order]
        last = np.empty(len(u), dtype=bool)
        last[-1] = True
        last[:-1] = u[1:] != u[:-1]
        return u[last], t[last], oid[last], typ[last], val[last]

    def partial(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        oid = b[order_id].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = b[type_col].to_numpy(zero_copy_only=False)
        val = b[value].to_numpy(zero_copy_only=False)
        u, t, oid, typ, val = reduce_kern(u, t, oid, typ, val)
        return pa.table({"u": pa.array(u), "t": pa.array(t),
                         "oid": pa.array(oid), "typ": pa.array(typ),
                         "val": pa.array(val),
                         "ub": pa.array(u % nb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        u, t, oid, typ, val = reduce_kern(
            g["u"].to_numpy(np.int64), g["t"].to_numpy(np.int64),
            g["oid"].to_numpy(np.int64), g["typ"].to_numpy(object),
            g["val"].to_numpy(np.float64))
        return pd.DataFrame({"user_id": u, "last_ts_us": t,
                             "last_type": typ,
                             "last_value": np.round(val, 6)})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("ub").map_groups(kern, batch_format="pandas")


SLIDING_UNIQUE_DAYS = 7


def sliding_uniques(ds, key: str = "user_id", ts: str = "ts",
                    win_days: int = SLIDING_UNIQUE_DAYS):
    """Trailing-window distinct actives: for every epoch-day w in the
    data's [min_day, max_day] range, the EXACT count of distinct keys
    active in [w, w + win_days - 1] — the rolling-uniques curve that a
    tumbling WAU (dau_wau) cannot give.  Rows with zero actives (a
    >= win_days gap) are omitted.  (window_start_day, n_users).

    100-TB plan: distinct counting without a distinct shuffle.  Events
    collapse to distinct (key, day) in-batch; a key's days land in ONE
    coarse key bucket, where the kernel expands each day to its
    win_days covering windows (clipped to the global range), dedups
    (key, window) vectorized, and emits only tiny per-window partial
    counts; the driver folds O(buckets x days-range) rows.  Window
    count is bounded by CALENDAR span, never by data volume."""
    from ray.data.aggregate import Max, Min

    from .algos.triangles import n_buckets_for

    DAY_US = 86400 * US
    ds = ds.select_columns([key, ts]).materialize()
    n = ds.count()
    empty = pd.DataFrame(
        {"window_start_day": pd.Series([], dtype="int64"),
         "n_users": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    nb = n_buckets_for(n)

    def day_tbl(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        day = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False) \
            // DAY_US
        rows = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({"u": pa.array(rows[:, 0]),
                         "day": pa.array(rows[:, 1]),
                         "ub": pa.array(rows[:, 0] % nb)})

    days = ds.map_batches(day_tbl, batch_format="pyarrow").materialize()
    mm = days.aggregate(Min("day"), Max("day"))
    lo, hi = int(mm["min(day)"]), int(mm["max(day)"])

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        rows = np.unique(np.stack([g["u"].to_numpy(np.int64),
                                   g["day"].to_numpy(np.int64)], axis=1),
                         axis=0)
        u, day = np.repeat(rows[:, 0], win_days), \
            np.repeat(rows[:, 1], win_days)
        w = day - np.tile(np.arange(win_days, dtype=np.int64),
                          len(rows))
        keep = (w >= lo) & (w <= hi)
        uw = np.unique(np.stack([u[keep], w[keep]], axis=1), axis=0)
        cnt = np.bincount(uw[:, 1] - lo, minlength=hi - lo + 1)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"w": (nz + lo).astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    parts = days.groupby("ub").map_groups(kern, batch_format="pandas") \
                .to_pandas()
    agg = parts.groupby("w", sort=True)["n"].sum().reset_index()
    return pd.DataFrame({
        "window_start_day": agg["w"].to_numpy(np.int64),
        "n_users": agg["n"].to_numpy(np.int64)})


def conversion_lag_days(ds, convert_type: str = "purchase",
                        key: str = "user_id", ts: str = "ts",
                        type_col: str = "event_type"):
    """Time-to-convert report: for every user with a `convert_type`
    event, the lag from their FIRST event of any type to their FIRST
    conversion, bucketed into whole days — (lag_days, n_users), exact
    integer counts (no float quantile risk).

    100-TB plan: per-user double-min is a combiner — each batch
    pre-reduces to (user, min any-ts, min convert-ts) rows, one coarse
    user-bucket groupby re-reduces exactly, and only per-day partial
    counts leave the kernels; the driver folds O(buckets x days)."""
    from .algos.triangles import n_buckets_for

    DAY_US = 86400 * US
    ds = ds.select_columns([key, ts, type_col]).materialize()
    n = ds.count()
    empty = pd.DataFrame({"lag_days": pd.Series([], dtype="int64"),
                          "n_users": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    nb = n_buckets_for(n)
    BIG = np.int64(2**62)

    def mins(u, t, conv):
        """(users, min any ts, min convert ts [BIG if none]) per user."""
        order = np.lexsort((t, u))
        u, t, conv = u[order], t[order], conv[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        seg = np.cumsum(first) - 1
        any_min = np.full(seg[-1] + 1, BIG)
        np.minimum.at(any_min, seg, t)
        cv_min = np.full(seg[-1] + 1, BIG)
        if conv.any():
            np.minimum.at(cv_min, seg[conv], t[conv])
        return u[first], any_min, cv_min

    def partial(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        conv = pc.equal(b[type_col], convert_type).to_numpy(
            zero_copy_only=False)
        uu, am, cm = mins(u, t, conv)
        return pa.table({"u": pa.array(uu), "am": pa.array(am),
                         "cm": pa.array(cm),
                         "ub": pa.array(uu % nb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("u", sort=False)[["am", "cm"]].min()
        lag = f.loc[f["cm"] < BIG, ["am", "cm"]]
        days = ((lag["cm"] - lag["am"]) // DAY_US).to_numpy(np.int64)
        u2, c2 = np.unique(days, return_counts=True)
        return pd.DataFrame({"lag_days": u2,
                             "n": c2.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
              .groupby("ub").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    if len(parts) == 0:
        return empty
    agg = parts.groupby("lag_days", sort=True)["n"].sum().reset_index()
    return pd.DataFrame({"lag_days": agg["lag_days"].to_numpy(np.int64),
                         "n_users": agg["n"].to_numpy(np.int64)})


def top_paths(ds, path_len: int = 3, k: int = 10, key: str = "user_id",
              ts: str = "ts", order_id: str = "event_id",
              type_col: str = "event_type"):
    """Most common `path_len`-step event-type sequences over adjacent
    events of each user's (ts, event_id)-ordered stream — the classic
    clickstream path report.  (path '/'-joined, n), top-k by
    (n DESC, path ASC).

    100-TB plan: the path domain is catalog-bounded (|types|^len), so
    each coarse user-bucket kernel emits ONLY its per-path partial
    counts (a user's events land in one bucket; adjacency never crosses
    users) and the driver folds O(buckets x paths) rows."""
    from .algos.triangles import n_buckets_for

    ds = ds.select_columns([key, ts, order_id, type_col]).materialize()
    n = ds.count()
    empty = pd.DataFrame({"path": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})
    if n == 0:
        return empty
    nb = n_buckets_for(n)

    def tag(b: pa.Table) -> pa.Table:
        u = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "t": pc.cast(b[ts], pa.int64()),
                         "oid": b[order_id], "typ": b[type_col],
                         "ub": pa.array(u % nb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["oid"].to_numpy(np.int64),
                            g["t"].to_numpy(np.int64),
                            g["u"].to_numpy(np.int64)))
        u = g["u"].to_numpy(np.int64)[order]
        typ = g["typ"].to_numpy(object)[order]
        L = path_len
        if len(u) < L:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        same = u[: len(u) - L + 1] == u[L - 1:]  # window stays in-user
        parts = [pd.Series(typ[i:len(typ) - L + 1 + i])
                 for i in range(L)]
        path = parts[0].str.cat(parts[1:], sep="/")[same]
        vc = path.value_counts()
        return pd.DataFrame({"path": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    parts = ds.map_batches(tag, batch_format="pyarrow") \
              .groupby("ub").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    if len(parts) == 0:
        return empty
    agg = parts.groupby("path", sort=True)["n"].sum().reset_index()
    return agg.sort_values(["n", "path"], ascending=[False, True],
                           kind="mergesort").head(k) \
        .reset_index(drop=True).astype({"n": np.int64})


HOLT_A = 5   # alpha = A/10
HOLT_B = 3   # beta  = B/10


def daily_holt(ds, ts: str = "ts", value: str = "value"):
    """Holt's linear-trend double exponential smoothing of the daily
    revenue series:

        l_1 = x_1;            b_1 = x_2 - x_1  (0 with a single day)
        l_i = a*x_i + (1-a)*(l_{i-1} + b_{i-1})
        b_i = g*(l_i - l_{i-1}) + (1-g)*b_{i-1}

    x_i = the day's exact integer-cents sum / 100.0; a = 0.5, g = 0.3.
    Same scale shape as daily_smooth (calendar-bounded map-side
    partials + driver recurrence); both engines evaluate the IDENTICAL
    float expressions in the identical order, so doubles agree
    bit-for-bit before the round-6.

    Returns (day, cents, level, trend, forecast) sorted by day, with
    forecast the one-step-ahead l_i + b_i."""
    a = HOLT_A / 10.0
    g = HOLT_B / 10.0

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["cents"].sum().reset_index()
    cents = d["cents"].to_numpy(np.int64)
    n = len(d)
    lv = np.empty(n, np.float64)
    tr = np.empty(n, np.float64)
    if n:
        lv[0] = cents[0] / 100.0
        tr[0] = cents[1] / 100.0 - cents[0] / 100.0 if n > 1 else 0.0
        for i in range(1, n):
            lv[i] = a * (cents[i] / 100.0) \
                + (1.0 - a) * (lv[i - 1] + tr[i - 1])
            tr[i] = g * (lv[i] - lv[i - 1]) + (1.0 - g) * tr[i - 1]
    return pd.DataFrame({"day": d["day"].astype(np.int64),
                         "cents": cents,
                         "level": np.round(lv, 6),
                         "trend": np.round(tr, 6),
                         "forecast": np.round(lv + tr, 6)})


def daily_cusum(ds, ts: str = "ts", value: str = "value"):
    """CUSUM change-point scan over the daily revenue series, in EXACT
    integers: with per-day cents r_i (day-ascending, i = 1..n) and
    total T = sum(r),

        cusum_scaled_i = n * prefix_i - i * T      (== n^2 * classic
        CUSUM against the mean, scaled to stay integral)

    The candidate change point is the day with the max |cusum_scaled|
    (earliest day on ties).  Same scale shape as daily_smooth:
    calendar-bounded map-side day partials, tiny driver fold.  Returns
    (day, cents, cusum_scaled, is_changepoint) sorted by day."""

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["cents"].sum().reset_index()
    cents = d["cents"].to_numpy(np.int64)
    n = len(cents)
    pref = np.cumsum(cents)
    i = np.arange(1, n + 1, dtype=np.int64)
    cus = n * pref - i * int(pref[-1] if n else 0)
    best = int(np.argmax(np.abs(cus))) if n else -1
    flag = np.zeros(n, dtype=np.int64)
    if n:
        flag[best] = 1
    return pd.DataFrame({"day": d["day"].astype(np.int64),
                         "cents": cents, "cusum_scaled": cus,
                         "is_changepoint": flag})


def daily_cusum_by_key(ds, key: str = "event_type", ts: str = "ts",
                       value: str = "value"):
    """Grouped CUSUM: `daily_cusum`'s exact-integer scan run
    independently per key (per event type) over that key's own daily
    cents series — n and T in the scaled statistic are PER KEY.  One
    changepoint flag per key (max |cusum_scaled|, earliest day on
    ties); keys with a single active day carry cusum 0 and flag that
    day.  Scale shape: calendar-bounded (key x day) map-side partials
    — the same bounded domain as daily_anomalies_by_type — then a tiny
    driver fold.  Returns (key, day, cents, cusum_scaled,
    is_changepoint) sorted by (key, day)."""

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({key: b[key].to_pandas(), "day": day,
                          "cents": cents}) \
            .groupby([key, "day"], sort=False)["cents"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby([key, "day"], sort=True)["cents"].sum() \
        .reset_index()
    out = []
    for k, g in d.groupby(key, sort=True):
        cents = g["cents"].to_numpy(np.int64)
        n = len(cents)
        pref = np.cumsum(cents)
        i = np.arange(1, n + 1, dtype=np.int64)
        cus = n * pref - i * int(pref[-1] if n else 0)
        flag = np.zeros(n, dtype=np.int64)
        if n:
            flag[int(np.argmax(np.abs(cus)))] = 1
        gg = pd.DataFrame({key: k, "day": g["day"].to_numpy(np.int64),
                           "cents": cents, "cusum_scaled": cus,
                           "is_changepoint": flag})
        out.append(gg)
    if not out:
        return pd.DataFrame({key: pd.Series([], dtype=str),
                             "day": pd.Series([], dtype=np.int64),
                             "cents": pd.Series([], dtype=np.int64),
                             "cusum_scaled": pd.Series([], dtype=np.int64),
                             "is_changepoint": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


def daily_cusum_binseg(ds, ts: str = "ts", value: str = "value"):
    """Binary segmentation, depth 2: daily_cusum's exact-integer scan
    finds changepoint 1; the SAME statistic recomputed WITHIN each
    side segment (its own n and total) proposes one candidate per
    side, and changepoint 2 is the larger |cusum| of the two (ties:
    earlier day).  Returns (rnk, day, cusum_scaled) for the two
    changepoints — all integer, no float anywhere."""

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b[value].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["cents"].sum().reset_index()
    days = d["day"].to_numpy(np.int64)
    cents = d["cents"].to_numpy(np.int64)

    def scan(lo: int, hi: int):
        """(best_idx, best_cusum) of the scaled scan on [lo, hi)."""
        seg = cents[lo:hi]
        n = len(seg)
        if n < 2:
            return None
        pref = np.cumsum(seg)
        i = np.arange(1, n + 1, dtype=np.int64)
        cus = n * pref - i * int(pref[-1])
        b = int(np.argmax(np.abs(cus)))
        return lo + b, int(cus[b])

    first = scan(0, len(cents))
    if first is None:
        return pd.DataFrame({"rnk": pd.Series([], dtype=np.int64),
                             "day": pd.Series([], dtype=np.int64),
                             "cusum_scaled": pd.Series([],
                                                       dtype=np.int64)})
    c1, v1 = first
    cands = [c for c in (scan(0, c1 + 1), scan(c1 + 1, len(cents)))
             if c is not None]
    rows = [(1, int(days[c1]), v1)]
    if cands:
        # larger |cusum| wins; ties to the earlier day
        cands.sort(key=lambda t: (-abs(t[1]), days[t[0]]))
        c2, v2 = cands[0]
        rows.append((2, int(days[c2]), v2))
    out = pd.DataFrame(rows, columns=["rnk", "day", "cusum_scaled"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def daily_anomalies_by_type(ds, ts: str = "ts",
                            etype: str = "event_type"):
    """Grouped anomaly screen: per-(event_type, day) counts z-scored
    against THAT type's own day series (bounded type x day domain,
    map-side partials; same exact-integer stat shape as
    daily_anomalies).  Types with < 2 active days emit z = 0."""

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        t = b[etype].to_pandas()
        g = pd.DataFrame({"event_type": t, "day": day, "n": 1}) \
            .groupby(["event_type", "day"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby(["event_type", "day"], sort=True)["n"].sum() \
        .reset_index()
    out = []
    for t, g in d.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        k = float(len(g))
        if k < 2:
            z = np.zeros(len(g))
        else:
            s = float(n.sum())
            ss = float((n * n).sum())
            var = (ss - s * s / k) / (k - 1)
            z = (n - s / k) / np.sqrt(var) if var > 0 \
                else np.zeros(len(g))
        gg = g.copy()
        gg["z"] = np.round(z, 6)
        out.append(gg)
    r = pd.concat(out, ignore_index=True)
    r["n"] = r["n"].astype(np.int64)
    r["day"] = r["day"].astype(np.int64)
    return r


def last_touch_attribution(ds, **kw):
    """Last-touch conversion attribution: credit the first conversion's
    value to the event IMMEDIATELY PRECEDING it in the key's (ts, id)
    order (the conversion's own type when it is the key's first event).
    Same one-bucket-shuffle plan as first_touch_attribution."""
    return first_touch_attribution(ds, touch="last", **kw)

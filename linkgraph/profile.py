"""Table profiling + histogram operators (engine introspection).

profile_table: per-column row count, null count and EXACT distinct
count.  The distinct count is the scale-safe coarse-bucket pattern
(CLAUDE.md): values hash-bucket by a stable string hash, each bucket
nunique's the ACTUAL values (a value lives in exactly one bucket, so
the per-bucket sum is globally exact — hash collisions cannot miscount
because the hash only routes), per-column null/row counts are map-side
partials merged on the driver.  For approximate distinct at lower cost
see sketch.kmv_distinct_tokens.

histogram: fixed-width bins over a numeric column — a bounded key
domain, so map-side partial bincounts + a driver merge, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def profile_table(ds, columns: list[str]) -> "object":
    """Dataset (col, n_rows, n_null, n_distinct), one row per column.

    One pass computes null/row partials for every column; a second
    emits (col, value-as-string, bucket) rows for the exact distinct
    counts (string casts are injective per column, so distinctness is
    preserved; the cast never has to match the oracle's text form).
    """
    import ray.data as rd

    from .algos.triangles import n_buckets_for

    ds = ds.materialize()
    nb = n_buckets_for(ds.count() * max(1, len(columns)))

    def counts_partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = b[c]
            rows.append((c, len(col), col.null_count))
        return pa.table({
            "col": pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nulls": pa.array([r[2] for r in rows], pa.int64())})

    base = ds.map_batches(counts_partial, batch_format="pyarrow") \
             .to_pandas().groupby("col", sort=True).sum().reset_index()

    def distinct_rows(b: pa.Table) -> pa.Table:
        outs = []
        for ci, c in enumerate(columns):
            col = b[c]
            v = pc.cast(col.combine_chunks()
                        if isinstance(col, pa.ChunkedArray) else col,
                        pa.string())
            valid = pc.is_valid(v)
            v = v.filter(valid)
            vs = v.to_numpy(zero_copy_only=False)
            hb = ((pd.util.hash_array(vs) + np.uint64(ci))
                  % np.uint64(nb)).astype(np.int64)
            outs.append(pa.table({
                "col": pa.array(np.full(len(vs), c, dtype=object),
                                pa.string()),
                "val": pa.array(vs, pa.string()),
                "hb": pa.array(hb)}))
        return pa.concat_tables(outs) if outs else pa.table(
            {"col": pa.array([], pa.string()),
             "val": pa.array([], pa.string()),
             "hb": pa.array([], pa.int64())})

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["col", "val"]).groupby(
            "col", sort=True).size().rename("nd").reset_index()
        return out

    nd = ds.map_batches(distinct_rows, batch_format="pyarrow") \
           .groupby("hb").map_groups(bucket_distinct,
                                     batch_format="pandas") \
           .to_pandas().groupby("col", sort=True)["nd"].sum()

    out = pd.DataFrame({
        "col": base["col"],
        "n_rows": base["n"].astype(np.int64),
        "n_null": base["nulls"].astype(np.int64),
        "n_distinct": base["col"].map(nd).fillna(0).astype(np.int64)})
    return out


def histogram(ds, value: str = "value", width: float = 5.0):
    """Fixed-width histogram (bin = floor(value / width), count):
    bounded key domain -> per-batch bincount partials, driver merge."""
    def partial(b: pa.Table) -> pa.Table:
        v = b[value].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)] if v.dtype.kind == "f" else v
        bins = np.floor(v / width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"bin": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    out = parts.groupby("bin", sort=True)["n"].sum().reset_index()
    out["bin"] = out["bin"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out

"""Exact distributed quantiles (linkgraph/quantiles.py): numpy-oracle
equality, forced iterative bracketing, duplicates, NaN handling."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from linkgraph.quantiles import exact_quantiles


def _kth(vals, q):
    """DuckDB quantile_disc rule: k = max(0, ceil(q*n) - 1)."""
    x = np.sort(vals)
    return float(x[max(0, math.ceil(q * len(x)) - 1)])


def _ds(vals):
    return rd.from_arrow(pa.table({"value": pa.array(vals, pa.float64())})
                         ).repartition(4)


QS = [0.0, 0.01, 0.25, 0.5, 0.9, 1.0]


def test_quantiles_match_numpy_oracle():
    rng = np.random.default_rng(7)
    vals = rng.normal(50, 20, 20_000)
    out = exact_quantiles(_ds(vals), "value", QS)
    for q, v in zip(out["q"], out["val"]):
        assert v == _kth(vals, q), q


def test_quantiles_forced_iterative_bracketing():
    """max_driver_rows=50 forces several histogram passes before the
    final collect — still exact."""
    rng = np.random.default_rng(11)
    vals = rng.exponential(10, 30_000)  # skewed tail
    out = exact_quantiles(_ds(vals), "value", [0.5, 0.999],
                          bins=16, max_driver_rows=50)
    assert out["val"].tolist() == [_kth(vals, 0.5), _kth(vals, 0.999)]


def test_quantiles_heavy_duplicates_resolve():
    """A single distinct value dominating a bracket resolves via the
    one-distinct-value rule, never an endless shrink."""
    vals = np.concatenate([np.full(10_000, 5.0), [1.0, 2.0, 99.0]])
    qs = [0.5, 0.0001, 1.0]
    out = exact_quantiles(_ds(vals), "value", qs,
                          bins=8, max_driver_rows=10)
    assert out["val"].tolist() == [_kth(vals, q) for q in qs] \
        == [5.0, 2.0, 99.0]


def test_grouped_quantiles_match_numpy_oracle():
    from linkgraph.quantiles import grouped_quantiles

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 9, 5_000)
    vals = rng.normal(0, 1, 5_000)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64()),
                                 "value": pa.array(vals, pa.float64())})
                       ).repartition(4)
    out = grouped_quantiles(ds, "k", "value", [0.25, 0.5, 1.0]) \
        .to_pandas().sort_values(["k", "q"]).reset_index(drop=True)
    assert len(out) == 9 * 3
    for _, r in out.iterrows():
        assert r["val"] == _kth(vals[keys == r["k"]], r["q"])


def test_quantiles_nan_and_empty():
    vals = np.array([np.nan, 3.0, np.nan, 1.0, 2.0])
    out = exact_quantiles(_ds(vals), "value", [0.5])
    assert out["val"].tolist() == [2.0]  # NaNs ignored
    empty = exact_quantiles(_ds(np.array([], np.float64)), "value", [0.5])
    assert math.isnan(empty["val"].iloc[0])


def test_interpolated_quantiles_match_numpy():
    from linkgraph.quantiles import interpolated_quantiles

    rng = np.random.default_rng(9)
    vals = rng.normal(10, 4, 7_000)
    got = interpolated_quantiles(_ds(vals), "value", QS)
    want = np.round(np.percentile(vals, [q * 100 for q in QS],
                                  method="linear"), 6)
    assert np.allclose(got["val"].to_numpy(), want, atol=1e-6)


def test_interpolated_quantiles_forced_bracketing():
    from linkgraph.quantiles import interpolated_quantiles

    rng = np.random.default_rng(10)
    vals = rng.exponential(3.0, 30_000)
    got = interpolated_quantiles(_ds(vals), "value", QS,
                                 bins=16, max_driver_rows=100)
    want = np.round(np.percentile(vals, [q * 100 for q in QS],
                                  method="linear"), 6)
    assert np.allclose(got["val"].to_numpy(), want, atol=1e-6)


def test_interpolated_quantiles_tiny_and_empty():
    from linkgraph.quantiles import interpolated_quantiles

    got = interpolated_quantiles(_ds([5.0]), "value", [0.0, 0.5, 1.0])
    assert got["val"].tolist() == [5.0, 5.0, 5.0]
    got2 = interpolated_quantiles(_ds([2.0, 4.0]), "value", [0.25])
    assert got2["val"].tolist() == [2.5]
    empty = interpolated_quantiles(_ds([]), "value", [0.5])
    assert math.isnan(empty["val"].iloc[0])


def test_grouped_value_ranks_matches_pandas():
    import ray.data as rd

    from linkgraph.quantiles import grouped_value_ranks

    rng = np.random.default_rng(11)
    n = 5000
    keys = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]
    vals = np.round(rng.normal(size=n), 2)  # plenty of ties
    ids = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "lang": pa.array(keys),
        "ppl": pa.array(vals)}))
    got = grouped_value_ranks(ds, "lang", "ppl", "doc_id",
                              n_buckets=8, sample_per_key=64) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    df = pd.DataFrame({"doc_id": ids, "lang": keys, "ppl": vals})
    df = df.sort_values(["lang", "ppl", "doc_id"])
    df["rnk"] = df.groupby("lang").cumcount() + 1
    want = df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "lang", "rnk"]]
    pd.testing.assert_frame_equal(got[["doc_id", "lang", "rnk"]], want)


def test_grouped_value_ranks_empty():
    import ray.data as rd

    from linkgraph.quantiles import grouped_value_ranks

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "ppl": pa.array([], pa.float64())}))
    assert grouped_value_ranks(ds, "lang", "ppl", "doc_id").count() == 0

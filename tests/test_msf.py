"""Minimum spanning forest (algos/msf.py): the Boruvka driver kernel
is cross-checked against an independent sequential Kruskal, and the
distributed Dataset plan against the driver kernel (forced past the
size gate)."""

import numpy as np
import pandas as pd
import pytest

from linkgraph.algos.msf import (MSFUnconverged, boruvka_msf_arrays,
                                 kruskal_msf_arrays,
                                 minimum_spanning_forest)
from linkgraph.io import from_pandas_clean


def _rand_graph(rng, n, m):
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = np.minimum(u, v)[keep], np.maximum(u, v)[keep]
    if len(u):
        pairs = np.unique(np.stack([u, v], 1), axis=0)
        u, v = pairs[:, 0], pairs[:, 1]
    w10 = 10 + (u + v) % 7
    return (u.astype(np.int64), v.astype(np.int64), w10.astype(np.int64))


def test_boruvka_equals_kruskal_random():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(2, 300))
        u, v, w10 = _rand_graph(rng, n, int(rng.integers(0, 4 * n)))
        b = boruvka_msf_arrays(u, v, w10, n)
        k = kruskal_msf_arrays(u, v, w10, n)
        for x, y in zip(b, k):
            assert np.array_equal(x, y)


def test_boruvka_deep_chain():
    # a path graph maximizes contraction-tree depth (pointer jumping)
    n = 4000
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    w10 = 10 + (u + v) % 7
    b = boruvka_msf_arrays(u, v, w10, n)
    k = kruskal_msf_arrays(u, v, w10, n)
    assert len(b[0]) == n - 1
    for x, y in zip(b, k):
        assert np.array_equal(x, y)


def test_boruvka_weight_ties_resolved_by_endpoints():
    # all-equal weights: the composite (w10, u, v) key must still give
    # a unique forest (ties broken by endpoint ids)
    rng = np.random.default_rng(3)
    n = 120
    u, v, _ = _rand_graph(rng, n, 500)
    w10 = np.full(len(u), 10, np.int64)
    b = boruvka_msf_arrays(u, v, w10, n)
    k = kruskal_msf_arrays(u, v, w10, n)
    for x, y in zip(b, k):
        assert np.array_equal(x, y)


def test_msf_unconverged_raises():
    n = 64
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    w10 = 10 + (u + v) % 7
    with pytest.raises(MSFUnconverged):
        boruvka_msf_arrays(u, v, w10, n, rounds=1)


def test_msf_distributed_path_equals_driver(ray_session):
    rng = np.random.default_rng(11)
    n = 1500
    u, v, w10 = _rand_graph(rng, n, 4500)
    ds = from_pandas_clean(pd.DataFrame({"u": u, "v": v, "w10": w10}))
    drv = minimum_spanning_forest(ds, n)
    dst = minimum_spanning_forest(ds, n, driver_cap=-1)
    assert len(drv) == len(dst)
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True),
        dst.reset_index(drop=True)[["u", "v", "w10"]])


def test_msf_empty_and_isolated(ray_session):
    ds = from_pandas_clean(pd.DataFrame(
        {"u": np.empty(0, np.int64), "v": np.empty(0, np.int64),
         "w10": np.empty(0, np.int64)}))
    out = minimum_spanning_forest(ds, 10)
    assert len(out) == 0

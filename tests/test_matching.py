"""Maximal matching (algos/matching.py): the locally-dominant driver
kernel is cross-checked against independent sequential greedy (their
equality is the theorem the SQL oracle relies on), maximality is
asserted directly, and the distributed plan against the driver kernel
(forced past the size gate)."""

import numpy as np
import pandas as pd
import pytest

from linkgraph.algos.matching import (MatchingUnconverged,
                                      dominant_matching_arrays,
                                      greedy_matching_seq,
                                      maximal_matching)
from linkgraph.io import from_pandas_clean


def _rand_graph(rng, n, m):
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = np.minimum(u, v)[keep], np.maximum(u, v)[keep]
    if len(u):
        pairs = np.unique(np.stack([u, v], 1), axis=0)
        u, v = pairs[:, 0], pairs[:, 1]
    return u.astype(np.int64), v.astype(np.int64)


def test_dominant_equals_sequential_greedy():
    rng = np.random.default_rng(5)
    for _ in range(25):
        n = int(rng.integers(2, 400))
        u, v = _rand_graph(rng, n, int(rng.integers(0, 5 * n)))
        a = dominant_matching_arrays(u, v, n)
        b = greedy_matching_seq(u, v, n)
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])


def test_matching_is_maximal_and_valid():
    rng = np.random.default_rng(9)
    n = 600
    u, v = _rand_graph(rng, n, 2500)
    mu, mv = dominant_matching_arrays(u, v, n)
    # valid: no vertex matched twice
    ends = np.concatenate([mu, mv])
    assert len(np.unique(ends)) == len(ends)
    # maximal: no live edge remains
    matched = np.zeros(n, bool)
    matched[mu] = matched[mv] = True
    assert not ((~matched[u]) & (~matched[v])).any()


def test_matching_unconverged_raises():
    rng = np.random.default_rng(2)
    u, v = _rand_graph(rng, 200, 800)
    with pytest.raises(MatchingUnconverged):
        dominant_matching_arrays(u, v, 200, rounds=1)


def test_matching_distributed_path_equals_driver(ray_session):
    rng = np.random.default_rng(13)
    n = 1200
    u, v = _rand_graph(rng, n, 4000)
    ds = from_pandas_clean(pd.DataFrame({"u": u, "v": v}))
    drv = maximal_matching(ds, n)
    dst = maximal_matching(ds, n, driver_cap=-1)
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True),
        dst.reset_index(drop=True)[["u", "v"]])


def test_matching_empty(ray_session):
    ds = from_pandas_clean(pd.DataFrame(
        {"u": np.empty(0, np.int64), "v": np.empty(0, np.int64)}))
    assert len(maximal_matching(ds, 5)) == 0

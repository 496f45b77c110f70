"""SCAN structural clustering: driver kernel vs a brute-force set
reference on seeded random graphs, and driver vs forced-distributed
plan equality (the size-gate convention of test_algos_extra)."""

import numpy as np
import pandas as pd
import pytest

from linkgraph.algos.scan import scan_roles
from linkgraph.edges import edges_from_arrays
from linkgraph.synth import micro_graph


def _canon(e: np.ndarray) -> np.ndarray:
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


def scan_reference(e: np.ndarray, n: int, eps=(7, 10), mu=3):
    """Brute-force SCAN with Python sets (closed neighborhoods)."""
    p_, q_ = eps
    nbrs = [set() for _ in range(n)]
    for a, b in e:
        nbrs[a].add(int(b))
        nbrs[b].add(int(a))

    def similar(u, v):
        cu = nbrs[u] | {u}
        cv = nbrs[v] | {v}
        inter = len(cu & cv)
        return q_ * q_ * inter * inter >= p_ * p_ * len(cu) * len(cv)

    sim_adj = [set() for _ in range(n)]
    for a, b in e:
        if similar(int(a), int(b)):
            sim_adj[a].add(int(b))
            sim_adj[b].add(int(a))
    core = [1 + len(sim_adj[v]) >= mu for v in range(n)]

    # CC over core-core similar edges
    cluster = np.full(n, -1, dtype=np.int64)
    seen = set()
    for s in range(n):
        if not core[s] or s in seen:
            continue
        comp, stack = [], [s]
        seen.add(s)
        while stack:
            u = stack.pop()
            comp.append(u)
            for w in sim_adj[u]:
                if core[w] and w not in seen:
                    seen.add(w)
                    stack.append(w)
        lab = min(comp)
        for u in comp:
            cluster[u] = lab

    border = np.zeros(n, dtype=bool)
    for v in range(n):
        if core[v]:
            continue
        cs = [cluster[u] for u in sim_adj[v] if core[u]]
        if cs:
            border[v] = True
            cluster[v] = min(cs)
    member = np.array(core) | border
    role = []
    for v in range(n):
        if core[v]:
            role.append("core")
        elif border[v]:
            role.append("border")
        else:
            ds_ = {int(cluster[u]) for u in nbrs[v] if member[u]}
            role.append("hub" if len(ds_) >= 2 else "outlier")
    return pd.DataFrame({"v": np.arange(n, dtype=np.int64),
                         "cluster": cluster,
                         "role": role})


def _seeded(n, m, seed):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(m, 2)).astype(np.int64)
    return _canon(e)


def _sorted_frame(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values("v").reset_index(drop=True)[
        ["v", "cluster", "role"]]


@pytest.mark.parametrize("name", ["two_cliques_k5", "star_1_50",
                                  "path_8", "cycle_5"])
def test_scan_micro_vs_reference(ray_session, name):
    e = _canon(micro_graph(name))
    n = int(e.max()) + 1
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    got, rep = scan_roles(ds, n)
    want = scan_reference(e, n)
    pd.testing.assert_frame_equal(_sorted_frame(got), want)
    assert rep["n_steps"] >= 0


@pytest.mark.parametrize("seed", [7, 11])
def test_scan_random_vs_reference(ray_session, seed):
    e = _seeded(60, 240, seed)
    n = 60
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    got, _ = scan_roles(ds, n, eps=(6, 10), mu=3)
    want = scan_reference(e, n, eps=(6, 10), mu=3)
    pd.testing.assert_frame_equal(_sorted_frame(got), want)


def test_scan_distributed_equals_driver(ray_session, tmp_path):
    e = _seeded(120, 600, 3)
    n = 120
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    drv, _ = scan_roles(ds, n)
    dist, rep = scan_roles(ds, n, store_root=str(tmp_path / "scan"),
                           force_distributed=True)
    pd.testing.assert_frame_equal(_sorted_frame(dist),
                                  _sorted_frame(drv))
    assert rep["n_steps"] >= 0


def test_scan_no_cores_all_outliers(ray_session, tmp_path):
    # a sparse path graph with a strict threshold: no vertex reaches mu
    e = _canon(micro_graph("path_8"))
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    drv, _ = scan_roles(ds, 8, eps=(99, 100), mu=5)
    assert set(drv["role"]) == {"outlier"}
    dist, _ = scan_roles(ds, 8, eps=(99, 100), mu=5,
                         store_root=str(tmp_path / "scan0"),
                         force_distributed=True)
    pd.testing.assert_frame_equal(_sorted_frame(dist),
                                  _sorted_frame(drv))


def test_edge_jaccard_hist_paths_equal(ray_session):
    from linkgraph.algos.scan import edge_jaccard_hist

    e = _seeded(80, 400, 21)
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    drv = edge_jaccard_hist(ds, 80)
    dist = edge_jaccard_hist(ds, 80, force_distributed=True)
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True))
    # histogram mass equals the edge count
    assert int(drv["n_edges"].sum()) == len(e)


def test_local_bridges_paths_equal_and_brute(ray_session):
    """local_bridges: driver == forced-distributed == brute force on a
    planted graph (triangle edges are not bridges; pendant edges are)."""
    import numpy as np
    import pandas as pd

    from linkgraph.algos.scan import local_bridges
    from linkgraph.edges import edges_from_arrays

    # triangle 0-1-2, pendant 2-3, chain 3-4-5, isolated edge 6-7
    e = np.array([(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5),
                  (6, 7)], dtype=np.int64)
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    want = []
    sym = set(map(tuple, np.vstack([e, e[:, ::-1]])))
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    for a, b in e:
        if not (adj[a] & adj[b]):
            want.append((a, b))
    want = sorted(want)
    got_d = local_bridges(ds, 8)
    got_f = local_bridges(ds, 8, force_distributed=True)
    for got in (got_d, got_f):
        assert list(map(tuple, got.to_numpy())) == want
    assert (0, 1) not in want and (2, 3) in want

"""Deterministic walks (algos/walks.py) and Adamic-Adar link prediction
(algos/linkpred.py): oracle parity on small graphs, path equality for
the size-gated walk plans, determinism, sink behavior."""

import hashlib
import math

import numpy as np
import pandas as pd

from linkgraph.algos.linkpred import adamic_adar_topk
from linkgraph.algos.walks import (
    _walks_broadcast, _walks_shuffle, deterministic_walks,
)
from linkgraph.io import from_pandas_clean


def _edges(pairs):
    pdf = pd.DataFrame(pairs, columns=["src", "dst"]).astype(np.int64)
    return from_pandas_clean(pdf).repartition(3)


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _walk_oracle(pairs, seeds, steps):
    """Single-thread reference of the min-md5 step rule."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    rows = []
    for wid, seed in enumerate(seeds):
        cur = seed
        rows.append((wid, 0, cur))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur, [])
            if nbrs:
                cur = min(nbrs, key=lambda n: (
                    hashlib.md5(f"{wid}:{t}:{cur}:{n}".encode()).hexdigest(),
                    n))
            rows.append((wid, t, cur))
    return pd.DataFrame(rows, columns=["walk_id", "step", "v"]) \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)


PAIRS = _sym([(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)])


def test_walks_match_single_thread_oracle():
    got = deterministic_walks(_edges(PAIRS), seeds=[0, 2, 4], steps=6) \
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    want = _walk_oracle(PAIRS, [0, 2, 4], 6)
    pd.testing.assert_frame_equal(got, want)


def test_walks_sink_stays():
    # vertex 9 has no out-edges: the walk parks there forever
    pairs = [(7, 9)]
    got = deterministic_walks(_edges(pairs), seeds=[7], steps=3).to_pandas()
    assert got.sort_values("step")["v"].tolist() == [7, 9, 9, 9]


def test_walks_broadcast_equals_shuffle_path():
    b = _walks_broadcast(_edges(PAIRS), seeds=[0, 1, 2, 3], steps=5)
    s = _walks_shuffle(_edges(PAIRS), seeds=[0, 1, 2, 3], steps=5,
                       num_partitions=4)
    pd.testing.assert_frame_equal(b.reset_index(drop=True),
                                  s.reset_index(drop=True))


def _aa_oracle(pairs, k):
    """Brute-force Adamic-Adar over the undirected simple graph."""
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    scores = {}
    for v, nbrs in adj.items():
        w = 1.0 / math.log(len(nbrs)) if len(nbrs) >= 2 else 0.0
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                scores[(ns[i], ns[j])] = scores.get((ns[i], ns[j]), 0.0) + w
    rows = [(u, wv, round(s, 6)) for (u, wv), s in scores.items()]
    pdf = pd.DataFrame(rows, columns=["u", "w", "aa"])
    return pdf.sort_values(["aa", "u", "w"], ascending=[False, True, True]) \
        .head(k).reset_index(drop=True)


def test_adamic_adar_matches_bruteforce():
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4), (5, 0)]
    got = adamic_adar_topk(_edges(pairs), k=10).to_pandas() \
        .reset_index(drop=True).astype({"u": np.int64, "w": np.int64})
    want = _aa_oracle(pairs, 10)
    pd.testing.assert_frame_equal(got, want)


def test_adamic_adar_partition_invariant():
    pairs = [(i, (i * 3 + 1) % 17) for i in range(17)] + [(2, 9), (4, 11)]
    a = adamic_adar_topk(_edges(pairs).repartition(1), k=8).to_pandas()
    b = adamic_adar_topk(_edges(pairs).repartition(6), k=8).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_empty_and_wedgeless_inputs():
    empty = from_pandas_clean(pd.DataFrame(
        {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}))
    w = deterministic_walks(empty, seeds=[3], steps=2).to_pandas()
    assert w["v"].tolist() == [3, 3, 3]
    assert adamic_adar_topk(empty, k=5).to_pandas().empty
    single = from_pandas_clean(pd.DataFrame({"src": [1], "dst": [2]}))
    assert adamic_adar_topk(single, k=5).to_pandas().empty


def test_adamic_adar_driver_equals_distributed():
    from linkgraph.algos.linkpred import _adamic_adar_distributed

    pairs = [(i, (i * 5 + 2) % 23) for i in range(23)] + \
            [(1, 7), (3, 12), (6, 18)]
    ds = _edges(pairs)
    a = adamic_adar_topk(ds, k=12).to_pandas().reset_index(drop=True)
    b = _adamic_adar_distributed(ds.materialize(), 12, 4).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_node2vec_paths_and_step1(monkeypatch):
    """Broadcast == shuffle plan; step 1 reduces to the first-order
    rule (prev == seed makes every neighbor tier 0)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import linkgraph.algos.walks as W

    rng = np.random.default_rng(21)
    s = rng.integers(0, 40, 300).astype(np.int64)
    d = rng.integers(0, 40, 300).astype(np.int64)
    keep = s != d
    t = pa.table({"src": pa.array(np.concatenate([s[keep], d[keep]])),
                  "dst": pa.array(np.concatenate([d[keep], s[keep]]))})
    seeds, steps = [0, 1, 2], 4

    a = W.node2vec_walks(rd.from_arrow(t), seeds, steps).to_pandas()
    monkeypatch.setattr(W, "WALK_ADJ_CAP", -1)
    b = W.node2vec_walks(rd.from_arrow(t), seeds, steps).to_pandas()
    key = ["walk_id", "step"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))

    monkeypatch.setattr(W, "WALK_ADJ_CAP", 5_000_000)
    first = W.deterministic_walks(rd.from_arrow(t), seeds,
                                  steps).to_pandas()
    a1 = a[a.step <= 1].sort_values(key).reset_index(drop=True)
    f1 = first[first.step <= 1].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, f1)


def _lp_oracle(pairs, k):
    """Brute-force all-four-score link prediction oracle."""
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    adj = {}
    for a, b in sym:
        adj.setdefault(a, set()).add(b)
    rows = []
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for w in verts[i + 1:]:
            common = adj[u] & adj[w]
            if not common:
                continue
            cn = len(common)
            aa = sum(1.0 / math.log(len(adj[c])) for c in common
                     if len(adj[c]) >= 2)
            ra = sum(1.0 / len(adj[c]) for c in common)
            du, dw = len(adj[u]), len(adj[w])
            rows.append((u, w, cn, round(aa, 6), round(ra, 6),
                         round(cn / (du + dw - cn), 6), du * dw))
    pdf = pd.DataFrame(rows,
                       columns=["u", "w", "cn", "aa", "ra", "jac", "pref"])
    return pdf.sort_values(["cn", "aa", "u", "w"],
                           ascending=[False, False, True, True]) \
        .head(k).reset_index(drop=True)


def test_linkpred_matches_bruteforce():
    from linkgraph.algos.linkpred import link_prediction_topk

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4),
             (5, 0), (5, 2), (6, 1), (6, 3)]
    got = link_prediction_topk(_edges(pairs), k=15).to_pandas() \
        .reset_index(drop=True)
    want = _lp_oracle(pairs, 15)
    pd.testing.assert_frame_equal(
        got.astype({"u": np.int64, "w": np.int64, "cn": np.int64,
                    "pref": np.int64}), want)


def test_linkpred_driver_equals_distributed():
    from linkgraph.algos.linkpred import (
        _lp_distributed, link_prediction_topk,
    )

    pairs = [(i, (i * 5 + 2) % 23) for i in range(23)] + \
            [(1, 7), (3, 12), (6, 18), (2, 2)]
    ds = _edges(pairs).materialize()
    a = link_prediction_topk(ds, k=14).to_pandas().reset_index(drop=True)
    b = _lp_distributed(ds, ds.count(), 14).to_pandas() \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_linkpred_empty():
    from linkgraph.algos.linkpred import link_prediction_topk

    single = from_pandas_clean(pd.DataFrame({"src": [1], "dst": [2]}))
    assert link_prediction_topk(single, k=5).to_pandas().empty

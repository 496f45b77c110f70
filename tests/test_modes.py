"""Mode-equivalence tests: the sparse/push and dense/pull paths must
produce IDENTICAL results — they are two physical plans for the same
superstep semantics (graph.hpp:1529-1854).  The adaptive switch makes
single-root runs mostly sparse, so these tests force each path."""

import numpy as np
import pytest

from linkgraph import engine as engine_mod
from linkgraph.algos import bfs, connected_components, sssp
from linkgraph.edges import edges_from_arrays
from linkgraph.graph import load_directed, load_undirected
from linkgraph.synth import micro_graph


@pytest.fixture
def force_mode(monkeypatch):
    def _force(mode: str):
        if mode == "dense":
            # sparse iff active_edges < |E|/denom — denom tiny => never
            monkeypatch.setattr(engine_mod, "SPARSE_DENOM", 10 ** 9)
        else:
            monkeypatch.setattr(engine_mod, "SPARSE_DENOM", 10 ** -9)
    return _force


def _run_sssp(tmp_path, tag, e, n, w):
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1], w), n,
                        num_partitions=3, store_dir=str(tmp_path / tag),
                        weighted=True)
    try:
        sssp(eng, root=0)
        return eng.state_pandas(["distance"])["distance"].to_numpy()
    finally:
        eng.shutdown()


def test_sssp_dense_equals_sparse(tmp_path, force_mode):
    e = micro_graph("er_1k")
    n = int(e.max()) + 1
    rng = np.random.default_rng(11)
    w = rng.uniform(0.5, 1.5, len(e))
    force_mode("dense")
    d_dense = _run_sssp(tmp_path, "gd", e, n, w)
    force_mode("sparse")
    d_sparse = _run_sssp(tmp_path, "gs", e, n, w)
    assert np.allclose(d_dense, d_sparse, atol=1e-12)


def test_bfs_dense_equals_sparse(tmp_path, force_mode):
    e = micro_graph("powerlaw_1k")
    n = int(e.max()) + 1
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path / f"b{mode}"))
        try:
            bfs(eng, root=3)
            out[mode] = eng.state_pandas(["parent"])["parent"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def test_cc_dense_equals_sparse(tmp_path, force_mode):
    e = micro_graph("two_cliques_k5")
    n = int(e.max()) + 1
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=2,
                              store_dir=str(tmp_path / f"c{mode}"))
        try:
            connected_components(eng)
            out[mode] = eng.state_pandas(["label"])["label"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def test_harmonic_dense_equals_sparse(tmp_path, force_mode):
    from linkgraph.algos import harmonic_centrality

    e = micro_graph("powerlaw_1k")
    n = int(e.max()) + 1
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=3,
                              store_dir=str(tmp_path / f"h{mode}"))
        try:
            harmonic_centrality(eng, [0, 3, 7])
            out[mode] = eng.state_pandas(["harmonic"])["harmonic"] \
                .to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def test_scc_dense_equals_sparse(tmp_path, force_mode):
    from linkgraph.algos import strongly_connected_components

    e = micro_graph("er_1k")
    e = e[e[:, 0] != e[:, 1]]
    n = int(e.max()) + 1
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path / f"scc{mode}"))
        try:
            strongly_connected_components(eng)
            out[mode] = eng.state_pandas(["scc"])["scc"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def test_dag_layers_dense_equals_sparse(tmp_path, force_mode):
    from linkgraph.algos import dag_layers

    e = micro_graph("er_1k")
    e = np.unique(np.sort(e, axis=1), axis=0)   # orient low->high: a DAG
    e = e[e[:, 0] != e[:, 1]]
    n = int(e.max()) + 1
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path / f"t{mode}"))
        try:
            dag_layers(eng)
            out[mode] = eng.state_pandas(["layer"])["layer"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def test_dag_paths_dense_equals_sparse(tmp_path, force_mode):
    from linkgraph.algos import dag_path_counts

    e = micro_graph("er_1k")
    e = np.unique(np.sort(e, axis=1), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    n = int(e.max()) + 1
    srcs = np.setdiff1d(np.arange(n), np.unique(e[:, 1]))
    out = {}
    for mode in ("dense", "sparse"):
        force_mode(mode)
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path / f"p{mode}"))
        try:
            dag_path_counts(eng, srcs)
            out[mode] = eng.state_pandas(["total"])["total"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out["dense"], out["sparse"])


def _run_widest(tmp_path, tag, e, n, w):
    from linkgraph.algos import widest_path

    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1], w), n,
                        num_partitions=3, store_dir=str(tmp_path / tag),
                        weighted=True)
    try:
        widest_path(eng, root=0)
        return eng.state_pandas(["capacity"])["capacity"].to_numpy()
    finally:
        eng.shutdown()


def test_widest_dense_equals_sparse(tmp_path, force_mode):
    e = micro_graph("er_1k")
    n = int(e.max()) + 1
    rng = np.random.default_rng(3)
    w = rng.uniform(0.1, 2.0, len(e))
    force_mode("dense")
    d_dense = _run_widest(tmp_path, "wd", e, n, w)
    force_mode("sparse")
    d_sparse = _run_widest(tmp_path, "ws", e, n, w)
    assert np.array_equal(d_dense, d_sparse)


def test_widest_onion_partition_invariance(tmp_path):
    from linkgraph.algos import onion_layers, widest_path
    from linkgraph.graph import load_undirected

    e = micro_graph("er_1k")
    n = int(e.max()) + 1
    rng = np.random.default_rng(5)
    w = rng.uniform(0.1, 2.0, len(e))
    caps, layers = [], []
    for np_ in (1, 5):
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1], w), n,
                            num_partitions=np_,
                            store_dir=str(tmp_path / f"w{np_}"),
                            weighted=True)
        try:
            widest_path(eng, root=0)
            caps.append(eng.state_pandas(["capacity"])["capacity"]
                        .to_numpy())
        finally:
            eng.shutdown()
        ung = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=np_,
                              store_dir=str(tmp_path / f"o{np_}"))
        try:
            onion_layers(ung, k=4)
            layers.append(ung.state_pandas(["layer"])["layer"]
                          .to_numpy())
        finally:
            ung.shutdown()
    assert np.array_equal(caps[0], caps[1])
    assert np.array_equal(layers[0], layers[1])

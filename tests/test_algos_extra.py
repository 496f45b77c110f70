"""Oracle tests for the round-2 coverage-widening algorithms: HITS,
personalized PageRank, k-core — engine vs short numpy references on the
seeded micro graphs (same pattern as tests/test_algos.py)."""

import numpy as np
import pytest

from linkgraph.algos import hits, kcore, personalized_pagerank
from linkgraph.algos.hits import normalized_scores
from linkgraph.edges import edges_from_arrays
from linkgraph.graph import load_directed, load_undirected
from linkgraph.synth import micro_graph


def _n(e):
    return int(e.max()) + 1


def _dedup(e):
    return np.unique(e, axis=0)


# ---------------------------------------------------------------- oracles

def hits_oracle(e, n, iters):
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        np.add.at(auth, e[:, 1], hub[e[:, 0]])
        hub = np.zeros(n)
        np.add.at(hub, e[:, 0], auth[e[:, 1]])
    return auth, hub


def ppr_oracle(e, n, sources, iters, d=0.85):
    outdeg = np.bincount(e[:, 0], minlength=n)
    nz = outdeg > 0
    tele = np.zeros(n)
    tele[sources] = 1.0
    curr = tele.copy()
    curr[nz] /= outdeg[nz]
    raw = curr.copy()
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, e[:, 1], curr[e[:, 0]])
        raw = (1 - d) * tele + d * s
        curr = raw.copy()
        curr[nz] = raw[nz] / outdeg[nz]
    return raw


def kcore_oracle(e, n, k):
    """Synchronous peeling: alive_{i+1} = {v in alive_i :
    |N(v) ∩ alive_i| >= k} over the simple symmetric graph."""
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    s = np.unique(both, axis=0)
    alive = np.ones(n, dtype=bool)
    while True:
        m = alive[s[:, 0]] & alive[s[:, 1]]
        deg = np.bincount(s[m, 1], minlength=n)
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            return alive
        alive = new


# ------------------------------------------------------------------ tests

@pytest.mark.parametrize("name", ["path_8", "star_1_50", "two_cliques_k5",
                                  "er_1k"])
def test_hits_matches_numpy(name, tmp_path):
    e = _dedup(micro_graph(name))
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        hits(eng, iterations=4)
        pdf = eng.state_pandas(["auth", "hub"])
        oa, oh = hits_oracle(e, n, 4)
        sa, sh = normalized_scores(eng)
        assert np.allclose(pdf["auth"].to_numpy() / sa, oa / max(oa.sum(), 1e-300),
                           atol=1e-9)
        assert np.allclose(pdf["hub"].to_numpy() / sh, oh / max(oh.sum(), 1e-300),
                           atol=1e-9)
    finally:
        eng.shutdown()


@pytest.mark.parametrize("name,sources", [("er_1k", [0]),
                                          ("two_cliques_k5", [0, 7]),
                                          ("star_1_50", [0])])
def test_ppr_matches_numpy(name, sources, tmp_path):
    e = _dedup(micro_graph(name))
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        rep = personalized_pagerank(eng, sources, iterations=10)
        assert rep["n_steps"] == 10
        got = eng.state_pandas(["rank"])["rank"].to_numpy()
        assert np.allclose(got, ppr_oracle(e, n, sources, 10), atol=1e-9)
    finally:
        eng.shutdown()


@pytest.mark.parametrize("name,k", [("path_8", 2), ("two_cliques_k5", 3),
                                    ("two_cliques_k5", 4), ("er_1k", 8),
                                    ("star_1_50", 2)])
def test_kcore_matches_peeling(name, k, tmp_path):
    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        kcore(eng, k=k)
        got = eng.state_pandas(["in_core"])["in_core"].to_numpy().astype(bool)
        want = kcore_oracle(e, n, k)
        assert np.array_equal(got, want), (
            f"{name} k={k}: {np.flatnonzero(got ^ want)}")
    finally:
        eng.shutdown()


def test_hits_rerun_on_cached_engine_resets(tmp_path):
    """A second hits() on the same (cached) engine must not resume from
    the first run's converged vectors."""
    e = _dedup(micro_graph("two_cliques_k5"))
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=2, store_dir=str(tmp_path / "g"))
    try:
        hits(eng, iterations=3)
        first = eng.state_pandas(["auth", "hub"])
        hits(eng, iterations=3)
        second = eng.state_pandas(["auth", "hub"])
        assert np.allclose(first["auth"], second["auth"])
        assert np.allclose(first["hub"], second["hub"])
    finally:
        eng.shutdown()


def test_kcore_partition_invariance(tmp_path):
    e = micro_graph("er_1k")
    n = _n(e)
    results = []
    for p in (1, 2, 5):
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=p,
                              store_dir=str(tmp_path / f"g{p}"))
        try:
            kcore(eng, k=8)
            results.append(
                eng.state_pandas(["in_core"])["in_core"].to_numpy())
        finally:
            eng.shutdown()
    assert np.array_equal(results[0], results[1])
    assert np.array_equal(results[0], results[2])


# ------------------------------------------------------------------- MIS

def mis_oracle(e, n):
    import hashlib

    adj = {v: set() for v in range(n)}
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    pri = {v: int(hashlib.sha256(str(v).encode()).hexdigest()[:13], 16)
           for v in range(n)}
    status = {v: 0 for v in range(n)}
    while any(s == 0 for s in status.values()):
        join = [v for v in range(n) if status[v] == 0 and
                all(pri[v] < pri[u] for u in adj[v] if status[u] == 0)]
        for v in join:
            status[v] = 1
            for u in adj[v]:
                if status[u] == 0:
                    status[u] = 2
    return np.array([status[v] == 1 for v in range(n)])


@pytest.mark.parametrize("name", ["path_8", "cycle_5", "star_1_50",
                                  "two_cliques_k5", "er_1k"])
def test_mis_matches_luby_oracle(name, tmp_path):
    from linkgraph.algos import maximal_independent_set

    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        maximal_independent_set(eng)
        got = eng.state_pandas(["in_mis"])["in_mis"].to_numpy().astype(bool)
        want = mis_oracle(e, n)
        assert np.array_equal(got, want), np.flatnonzero(got ^ want)
        # independence + maximality (structural invariants)
        und = np.unique(np.sort(e[e[:, 0] != e[:, 1]], axis=1), axis=0)
        assert not (got[und[:, 0]] & got[und[:, 1]]).any()
        covered = got.copy()
        np.logical_or.at(covered, und[:, 0], got[und[:, 1]])
        np.logical_or.at(covered, und[:, 1], got[und[:, 0]])
        assert covered.all()
    finally:
        eng.shutdown()


# ------------------------------------------------------------- coloring

def coloring_oracle(e, n):
    """Sequential greedy coloring in sha-priority order — exactly what
    parallel JP rounds must reproduce."""
    import hashlib

    adj = {v: set() for v in range(n)}
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    pri = {v: int(hashlib.sha256(str(v).encode()).hexdigest()[:13], 16)
           for v in range(n)}
    color = {}
    for v in sorted(range(n), key=lambda x: pri[x]):
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return np.array([color[v] for v in range(n)])


@pytest.mark.parametrize("name", ["path_8", "cycle_5", "star_1_50",
                                  "two_cliques_k5", "er_1k"])
def test_coloring_matches_greedy_oracle(name, tmp_path):
    from linkgraph.algos.coloring import greedy_coloring

    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        greedy_coloring(eng)
        got = eng.state_pandas(["color"])["color"].to_numpy()
        want = coloring_oracle(e, n)
        assert np.array_equal(got, want), np.flatnonzero(got != want)
        # proper coloring invariant
        und = np.unique(np.sort(e[e[:, 0] != e[:, 1]], axis=1), axis=0)
        assert (got[und[:, 0]] != got[und[:, 1]]).all()
        assert got.min() >= 0
    finally:
        eng.shutdown()


def test_coloring_priority_collision_raises(tmp_path):
    """Adjacent vertices with COLLIDING priorities must fail fast with a
    RuntimeError (zero-progress select round), not livelock for
    max_steps supersteps (ADVICE r2)."""
    from linkgraph.algos.coloring import ColoringProgram, greedy_coloring

    class CollidingColoring(ColoringProgram):
        def init_state(self, ctx):
            st = super().init_state(ctx)
            st["pri"][:] = 1  # every vertex collides
            return st

    import linkgraph.algos.coloring as coloring_mod

    e = micro_graph("path_8")
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=2, store_dir=str(tmp_path / "g"))
    orig = coloring_mod.ColoringProgram
    try:
        coloring_mod.ColoringProgram = CollidingColoring
        with pytest.raises(RuntimeError, match="zero-progress"):
            greedy_coloring(eng)
    finally:
        coloring_mod.ColoringProgram = orig
        eng.shutdown()


# ------------------------------------------------------- weighted pagerank

def wpr_oracle(e, w, n, iters, d=0.85):
    ow = np.zeros(n)
    np.add.at(ow, e[:, 0], w)
    nz = ow > 0
    curr = np.ones(n)
    curr[nz] /= ow[nz]
    for _ in range(iters):
        nxt = np.zeros(n)
        np.add.at(nxt, e[:, 1], curr[e[:, 0]] * w)
        nxt = (1 - d) + d * nxt
        nxt[nz] /= ow[nz]
        curr = nxt
    raw = curr.copy()
    raw[nz] *= ow[nz]
    return raw


@pytest.mark.parametrize("name", ["path_8", "star_1_50", "er_1k"])
def test_weighted_pagerank_matches_numpy(name, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.algos import weighted_pagerank

    e = micro_graph(name)
    n = _n(e)
    w = 1.0 + ((e[:, 0] + e[:, 1]) % 7) / 10.0
    ds = rd.from_arrow(pa.table({
        "src": pa.array(e[:, 0], pa.int64()),
        "dst": pa.array(e[:, 1], pa.int64()),
        "weight": pa.array(w, pa.float64())}))
    eng = load_directed(ds, n, num_partitions=3,
                        store_dir=str(tmp_path / "g"), weighted=True)
    try:
        weighted_pagerank(eng, iterations=15)
        got = eng.state_pandas(["rank"])["rank"].to_numpy()
        want = wpr_oracle(e, w, n, 15)
        assert np.allclose(got, want, atol=1e-9)
    finally:
        eng.shutdown()


# --------------------------------------------------------------- k-truss

def ktruss_oracle(e, n, k):
    """Set-based peel to the unique fixpoint."""
    edges = {(min(a, b), max(a, b)) for a, b in e if a != b}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        supp = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
        drop = {ed for ed, s in supp.items() if s < k - 2}
        if not drop:
            return sorted(edges)
        edges -= drop


@pytest.mark.parametrize("name", ["two_cliques_k5", "er_1k", "cycle_5"])
def test_ktruss_matches_peel_oracle(name):
    from linkgraph.algos.ktruss import ktruss_edges

    e = micro_graph(name)
    n = _n(e)
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    for k in (3, 4):
        got, _ = ktruss_edges(ds, k=k)
        want = ktruss_oracle(e, n, k)
        assert list(map(tuple, got[["src", "dst"]].to_numpy())) == want, \
            (name, k)


def test_ktruss_paths_equal():
    from linkgraph.algos.ktruss import ktruss_edges

    e = micro_graph("two_cliques_k5")
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    a, ra = ktruss_edges(ds, k=4)
    b, rb = ktruss_edges(ds, k=4, force_distributed=True)
    assert a.equals(b)


def test_ktruss_bucket_closure_path_equal(monkeypatch):
    """Forcing past EDGE_KEY_BROADCAST_CAP exercises the coarse-bucket
    merge closure + bucketed support merge — same fixpoint."""
    import linkgraph.algos.triangles as T

    from linkgraph.algos.ktruss import ktruss_edges

    e = micro_graph("two_cliques_k5")
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    a, _ = ktruss_edges(ds, k=4)
    monkeypatch.setattr(T, "EDGE_KEY_BROADCAST_CAP", -1)
    b, _ = ktruss_edges(edges_from_arrays(e[:, 0], e[:, 1]), k=4,
                        force_distributed=True)
    assert a.equals(b)


# ------------------------------------------------------ harmonic centrality

def harmonic_oracle(e, n, seeds):
    from collections import deque

    adj = {v: set() for v in range(n)}
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    h = np.zeros(n)
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        for v, d in dist.items():
            if d > 0:
                h[v] += 1.0 / d
    return h


@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5", "er_1k"])
def test_harmonic_matches_bfs_oracle(name, tmp_path):
    from linkgraph.algos import harmonic_centrality

    e = micro_graph(name)
    n = _n(e)
    seeds = [0, 1, 2]
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        harmonic_centrality(eng, seeds)
        got = eng.state_pandas(["harmonic"])["harmonic"].to_numpy()
        want = harmonic_oracle(e, n, seeds)
        assert np.allclose(got, want, atol=1e-12)
        # a second sweep on the same (cached-style) engine must NOT
        # accumulate on top of the first
        harmonic_centrality(eng, seeds)
        got2 = eng.state_pandas(["harmonic"])["harmonic"].to_numpy()
        assert np.array_equal(got, got2)
    finally:
        eng.shutdown()


def test_ktruss_and_coloring_edge_cases(tmp_path):
    """Degenerate inputs: triangle-free graphs peel to empty trusses;
    a singleton graph colors trivially."""
    from linkgraph.algos.coloring import greedy_coloring
    from linkgraph.algos.ktruss import ktruss_edges

    e = micro_graph("path_8")  # triangle-free
    out, rounds = ktruss_edges(edges_from_arrays(e[:, 0], e[:, 1]), k=3)
    assert len(out) == 0 and rounds == 1

    eng = load_undirected(edges_from_arrays(
        np.array([0]), np.array([1])), 2, num_partitions=2,
        store_dir=str(tmp_path / "tiny"))
    try:
        greedy_coloring(eng)
        got = eng.state_pandas(["color"])["color"].to_numpy()
        assert sorted(got.tolist()) == [0, 1]
    finally:
        eng.shutdown()


# --------------------------------------------------- closeness centrality

def closeness_oracle(e, n, seeds):
    from collections import deque

    adj = {v: set() for v in range(n)}
    for a, b in e:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = []
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        sumd = sum(dist.values())
        out.append((s, len(dist), sumd,
                    (len(dist) - 1) / sumd if sumd > 0 else 0.0))
    return out


@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5", "er_1k"])
def test_closeness_matches_bfs_oracle(name, tmp_path):
    from linkgraph.algos import closeness_from_seeds

    e = micro_graph(name)
    n = _n(e)
    seeds = [0, 1, 2]
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        got = closeness_from_seeds(eng, seeds)
        for (s, reached, sumd, _), (ws, wr, wd, wc) in zip(
                got, closeness_oracle(e, n, seeds)):
            assert (s, reached, sumd) == (ws, wr, wd)
            c = (reached - 1) / sumd if sumd > 0 else 0.0
            assert abs(c - wc) < 1e-15
    finally:
        eng.shutdown()


def test_closeness_isolated_seed(tmp_path):
    """A seed with no edges reaches only itself: closeness 0, reached 1."""
    from linkgraph.algos import closeness_from_seeds

    eng = load_undirected(edges_from_arrays(
        np.array([1]), np.array([2])), 3, num_partitions=2,
        store_dir=str(tmp_path / "iso"))
    try:
        [(s, reached, sumd, _)] = closeness_from_seeds(eng, [0])
        assert (s, reached, sumd) == (0, 1, 0)
    finally:
        eng.shutdown()


# --------------------------------------------------------- katz centrality

def katz_oracle(e, n, iters, alpha):
    x = np.ones(n)
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, e[:, 1], x[e[:, 0]])
        x = 1.0 + alpha * s
    return x


@pytest.mark.parametrize("name", ["path_8", "star_1_50", "er_1k"])
def test_katz_matches_power_oracle(name, tmp_path):
    from linkgraph.algos import katz_centrality

    e = _dedup(micro_graph(name))
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        katz_centrality(eng, iterations=6, alpha=0.1)
        got = eng.state_pandas(["katz"])["katz"].to_numpy()
        want = katz_oracle(e, n, 6, 0.1)
        assert np.allclose(got, want, rtol=1e-12)
    finally:
        eng.shutdown()


# -------------------------------------------------------------------- scc

def scc_oracle(e, n):
    """Exact SCC labels (min id per component) via boolean-closure
    squaring — small-n reference for the round-based engine algorithm."""
    R = np.zeros((n, n), dtype=np.float32)
    R[e[:, 0], e[:, 1]] = 1.0
    np.fill_diagonal(R, 1.0)
    while True:
        R2 = ((R @ R) > 0).astype(np.float32)
        if np.array_equal(R2, R):
            break
        R = R2
    mutual = (R > 0) & (R.T > 0)
    return np.argmax(mutual, axis=1).astype(np.int64)  # first True = min id


@pytest.mark.parametrize("name", ["cycle_5", "path_8", "two_cliques_k5",
                                  "er_1k", "multi_edge"])
def test_scc_matches_closure(name, tmp_path):
    from linkgraph.algos import strongly_connected_components

    e = _dedup(micro_graph(name))
    e = e[e[:, 0] != e[:, 1]]  # engine stores drop self-loops upstream
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        rep = strongly_connected_components(eng)
        assert rep["n_rounds"] >= 1
        got = eng.state_pandas(["scc"])["scc"].to_numpy()
        assert np.array_equal(got, scc_oracle(e, n))
    finally:
        eng.shutdown()


def test_scc_hand_case_partition_invariant(tmp_path):
    """Two directed cycles, a DAG tail and an isolated vertex; identical
    labels at 2 and 5 partitions."""
    from linkgraph.algos import strongly_connected_components

    e = np.array([(0, 1), (1, 2), (2, 0),     # 3-cycle {0,1,2}
                  (3, 4), (4, 3),             # 2-cycle {3,4}
                  (2, 3), (4, 5), (5, 6)],    # DAG tail 5 -> 6, isolated 7
                 dtype=np.int64)
    n = 8
    want = np.array([0, 0, 0, 3, 3, 5, 6, 7], dtype=np.int64)
    for parts in (2, 5):
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=parts,
                            store_dir=str(tmp_path / f"g{parts}"))
        try:
            strongly_connected_components(eng)
            got = eng.state_pandas(["scc"])["scc"].to_numpy()
            assert np.array_equal(got, want), (parts, got.tolist())
        finally:
            eng.shutdown()


# --------------------------------------------------------------- coreness

def coreness_oracle(e, n):
    """Exact core numbers via textbook peeling on the symmetric simple
    graph."""
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    s = np.unique(both, axis=0)
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 1
    while alive.any():
        while True:
            m = alive[s[:, 0]] & alive[s[:, 1]]
            deg = np.bincount(s[m, 1], minlength=n)
            kill = alive & (deg < k)
            if not kill.any():
                break
            core[kill] = k - 1
            alive &= ~kill
        k += 1
    return core


@pytest.mark.parametrize("name", ["path_8", "star_1_50", "two_cliques_k5",
                                  "er_1k", "powerlaw_1k"])
def test_coreness_matches_peeling(name, tmp_path):
    from linkgraph.algos import coreness

    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        coreness(eng)
        got = eng.state_pandas(["core"])["core"].to_numpy()
        want = coreness_oracle(e, n)
        assert np.array_equal(got, want), (
            name, got[got != want][:5], want[got != want][:5])
    finally:
        eng.shutdown()


def test_coreness_partition_invariant(tmp_path):
    from linkgraph.algos import coreness

    e = micro_graph("er_1k")
    n = _n(e)
    out = {}
    for parts in (2, 6):
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=parts,
                              store_dir=str(tmp_path / f"g{parts}"))
        try:
            coreness(eng)
            out[parts] = eng.state_pandas(["core"])["core"].to_numpy()
        finally:
            eng.shutdown()
    assert np.array_equal(out[2], out[6])


# ------------------------------------------------------------------ eigen

def eigen_oracle(e_sym, n, iters):
    x = np.ones(n)
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, e_sym[:, 1], x[e_sym[:, 0]])
        x = s
    return x / max(x.sum(), 1e-300)


@pytest.mark.parametrize("name", ["path_8", "star_1_50", "er_1k"])
def test_eigen_matches_power_oracle(name, tmp_path):
    from linkgraph.algos import eigen_l1, eigenvector_centrality
    from linkgraph.graph import load_undirected

    e = _dedup(micro_graph(name))
    n = _n(e)
    sym = np.concatenate([e, e[:, ::-1]])
    sym = np.unique(sym[sym[:, 0] != sym[:, 1]], axis=0)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3,
                          store_dir=str(tmp_path / "g"))
    try:
        eigenvector_centrality(eng, iterations=6)
        s = eigen_l1(eng)
        got = eng.state_pandas(["eigen"])["eigen"].to_numpy() / s
        want = eigen_oracle(sym, n, 6)
        assert np.allclose(got, want, rtol=1e-10, atol=1e-14)
    finally:
        eng.shutdown()


# ------------------------------------------------------------ warm PR

def test_pagerank_warm_continues_the_chain(tmp_path):
    """Warm-starting from PR(20)'s raw ranks on the SAME graph must
    equal running PR(25) from scratch — the warm program is the same
    recurrence resumed."""
    import ray

    from linkgraph.algos import pagerank, pagerank_warm

    e = _dedup(micro_graph("er_1k"))
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "a"))
    eng2 = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                         num_partitions=2, store_dir=str(tmp_path / "b"))
    try:
        pagerank(eng, iterations=20)
        sp = eng.state_pandas(["rank"])
        arr = np.zeros(n)
        arr[sp["v"].to_numpy(np.int64)] = sp["rank"].to_numpy()
        ref = ray.put(arr)
        pagerank_warm(eng, ref, iterations=5)
        warm = eng.state_pandas(["rank"])["rank"].to_numpy()
        pagerank(eng2, iterations=25)
        full = eng2.state_pandas(["rank"])["rank"].to_numpy()
        assert np.allclose(warm, full, rtol=1e-10, atol=1e-13)
    finally:
        eng.shutdown()
        eng2.shutdown()


def _louvain_df(src, dst):
    from linkgraph.algos.louvain import louvain_local_move

    ds = edges_from_arrays(np.array(src, np.int64),
                           np.array(dst, np.int64))
    return (louvain_local_move(ds).to_pandas()
            .sort_values("v").reset_index(drop=True))


def test_louvain_local_move_triangle_pendant():
    # triangle 0-1-2 plus pendant 3-0; m=4, deg = [3,2,2,1]
    # scores 2m - kv*ku: v=0 best nbr 3 (5), v=1 best 2 (4),
    # v=2 best 1 (4), v=3 best 0 (5) — all positive moves
    out = _louvain_df([0, 0, 1, 0], [1, 2, 2, 3])
    assert out["v"].tolist() == [0, 1, 2, 3]
    assert out["comm"].tolist() == [3, 2, 1, 0]
    assert out["gain_num"].tolist() == [5, 4, 4, 5]


def test_louvain_tie_breaks_to_smallest_neighbor():
    # path 0-1-2: v=1 sees scores 2 for both neighbors -> picks 0
    out = _louvain_df([0, 1], [1, 2])
    assert out["comm"].tolist() == [1, 0, 1]


def test_louvain_partition_invariant():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 120)
    b = rng.integers(0, 40, 120)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    u = np.unique(lo * 1000 + hi)
    lo, hi = u // 1000, u % 1000
    from linkgraph.algos.louvain import louvain_local_move

    one = louvain_local_move(
        edges_from_arrays(lo, hi).repartition(1)).to_pandas()
    many = louvain_local_move(
        edges_from_arrays(lo, hi).repartition(7)).to_pandas()
    one = one.sort_values("v").reset_index(drop=True)
    many = many.sort_values("v").reset_index(drop=True)
    assert one.equals(many)


# --------------------------------------------------------- DAG layering

def _layers_oracle(e, n):
    """Naive longest-path layers by repeated relaxation."""
    lay = np.zeros(n, np.int64)
    for _ in range(n + 1):
        changed = False
        for s, d in e:
            if lay[s] + 1 > lay[d]:
                lay[d] = lay[s] + 1
                changed = True
        if not changed:
            return lay
    raise AssertionError("cycle in test input")


def test_dag_layers_matches_naive(tmp_path):
    from linkgraph.algos import dag_layers

    # a layered DAG with shortcuts: longest path != BFS depth
    e = np.array([[0, 1], [0, 2], [1, 3], [2, 3], [3, 4], [0, 4],
                  [2, 5], [5, 6], [6, 4], [7, 0]], np.int64)
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        dag_layers(eng)
        got = eng.state_pandas(["layer"])["layer"].to_numpy()
    finally:
        eng.shutdown()
    assert (got == _layers_oracle(e, n)).all()


def test_dag_layers_raises_on_cycle(tmp_path):
    from linkgraph.algos import dag_layers

    e = np.array([[0, 1], [1, 2], [2, 0]], np.int64)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), 3,
                        num_partitions=2, store_dir=str(tmp_path / "c"))
    try:
        with pytest.raises(AssertionError, match="cycle"):
            dag_layers(eng, max_steps=25)
    finally:
        eng.shutdown()


def _paths_oracle(e, n):
    """Naive DP in topological order."""
    indeg = np.zeros(n, np.int64)
    for _, d in e:
        indeg[d] += 1
    total = np.where(indeg == 0, 1, 0).astype(np.int64)
    # Kahn order
    from collections import deque
    adj = [[] for _ in range(n)]
    for s, d in e:
        adj[s].append(d)
    dq = deque(np.flatnonzero(indeg == 0).tolist())
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            total[v] += total[u]
            indeg[v] -= 1
            if indeg[v] == 0:
                dq.append(v)
    return total


def test_dag_path_counts_matches_naive(tmp_path):
    from linkgraph.algos import dag_path_counts

    e = np.array([[0, 1], [0, 2], [1, 3], [2, 3], [3, 4], [0, 4],
                  [2, 5], [5, 6], [6, 4], [7, 4], [7, 0]], np.int64)
    n = _n(e)
    srcs = np.setdiff1d(np.arange(n), np.unique(e[:, 1]))
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "p"))
    try:
        dag_path_counts(eng, srcs)
        got = np.rint(eng.state_pandas(["total"])["total"]
                      .to_numpy()).astype(np.int64)
    finally:
        eng.shutdown()
    assert (got == _paths_oracle(e, n)).all()


# ------------------------------------------------------------ parity CC

def parity_oracle(e, n):
    """Naive per-component BFS from the min vertex: (label, level)."""
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    adj = [[] for _ in range(n)]
    for a, b in np.unique(both, axis=0):
        adj[a].append(b)
    label = np.arange(n)
    level = np.zeros(n, np.int64)
    seen = np.zeros(n, bool)
    for r in range(n):
        if seen[r]:
            continue
        seen[r] = True
        frontier = [r]
        d = 0
        while frontier:
            nxt = []
            for v in frontier:
                label[v], level[v] = r, d
                for u in adj[v]:
                    if not seen[u]:
                        seen[u] = True
                        nxt.append(u)
            frontier, d = nxt, d + 1
    return label, level


@pytest.mark.parametrize("name", ["path_8", "star_1_50",
                                  "two_cliques_k5_nobridge", "er_1k"])
def test_parity_cc_matches_bfs_oracle(name, tmp_path):
    from linkgraph.algos.bipartite import LEVEL_MOD, parity_cc
    from linkgraph.graph import load_undirected

    e = _dedup(micro_graph(name))
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3,
                          store_dir=str(tmp_path / "g"))
    try:
        parity_cc(eng)
        pk = eng.state_pandas(["packed"])["packed"].to_numpy()
        lab, lvl = parity_oracle(e, n)
        assert np.array_equal(pk // LEVEL_MOD, lab)
        assert np.array_equal(pk % LEVEL_MOD, lvl)
    finally:
        eng.shutdown()


def test_parity_cc_flags_odd_cycles(tmp_path):
    """Odd cycle (0-1-2), even cycle (3-4-5-6), tree (7-8-9, 8-10):
    parity conflicts appear exactly on the odd component."""
    from linkgraph.algos.bipartite import LEVEL_MOD, parity_cc
    from linkgraph.graph import load_undirected

    e = np.array([[0, 1], [1, 2], [0, 2],
                  [3, 4], [4, 5], [5, 6], [3, 6],
                  [7, 8], [8, 9], [8, 10]])
    n = 11
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3,
                          store_dir=str(tmp_path / "g"))
    try:
        parity_cc(eng)
        pk = eng.state_pandas(["packed"])["packed"].to_numpy()
        lab = pk // LEVEL_MOD
        par = (pk % LEVEL_MOD) % 2
        conflict = par[e[:, 0]] == par[e[:, 1]]
        assert set(lab[e[:, 0][conflict]]) == {0}
        assert conflict.sum() == 1          # exactly one odd-cycle edge
        assert set(np.unique(lab)) == {0, 3, 7}
    finally:
        eng.shutdown()


# ------------------------------------------------------- label spread

def labelspread_oracle(e, n, seeds: dict, rounds: int):
    """Naive synchronous seeded spreading: most frequent labeled
    neighbor label, min tie-break, seeds clamped."""
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    s = np.unique(both, axis=0)
    lab = np.full(n, -1, np.int64)
    for v, l in seeds.items():
        lab[v] = l
    for _ in range(rounds):
        new = lab.copy()
        for v in range(n):
            if v in seeds:
                continue
            nbr = s[s[:, 0] == v, 1]
            votes = lab[nbr]
            votes = votes[votes != -1]
            if len(votes):
                u, c = np.unique(votes, return_counts=True)
                new[v] = u[c == c.max()].min()
        if np.array_equal(new, lab):
            break
        lab = new
    return lab


@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5", "er_1k"])
def test_label_spread_matches_naive(name, tmp_path):
    from linkgraph.algos.labelspread import label_spread
    from linkgraph.graph import load_undirected
    from linkgraph.io import from_pandas_clean
    import pandas as pd

    e = _dedup(micro_graph(name))
    n = _n(e)
    seeds = {v: (v * 7) % 3 for v in range(0, n, 4)}
    seed_path = str(tmp_path / "seeds")
    from_pandas_clean(pd.DataFrame(
        {"v": np.array(sorted(seeds), np.int64),
         "label": np.array([seeds[v] for v in sorted(seeds)],
                           np.int64)})).write_parquet(seed_path)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3,
                          store_dir=str(tmp_path / "g"))
    try:
        label_spread(eng, seed_path, max_iters=6)
        got = eng.state_pandas(["label"])["label"].to_numpy()
        want = labelspread_oracle(e, n, seeds, 6)
        assert np.array_equal(got, want)
    finally:
        eng.shutdown()


def test_simrank_matches_naive_dense(ray_session):
    """simrank_topk / simrank_score_hist == the textbook dense SimRank
    iteration on a random directed graph (in-degree products, identity
    diagonal, C=0.8, 3 rounds)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.algos.simrank import simrank_score_hist, simrank_topk

    rng = np.random.default_rng(5)
    n, m = 40, 120
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = e[:, 0], e[:, 1]
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)}))

    A = np.zeros((n, n))            # A[i, v] = 1 iff i -> v
    A[src, dst] = 1.0
    din = A.sum(axis=0)
    S = np.eye(n)
    for _ in range(3):
        T = A.T @ S @ A             # sum over in-neighbor pairs
        denom = np.outer(din, din)
        with np.errstate(divide="ignore", invalid="ignore"):
            S2 = np.where(denom > 0, 0.8 * T / denom, 0.0)
        np.fill_diagonal(S2, 1.0)
        S = S2
    iu, ju = np.triu_indices(n, k=1)
    s = np.round(S[iu, ju], 6)
    nz = s > 0

    want_top = pd.DataFrame({"a": iu[nz], "b": ju[nz], "s": s[nz]}) \
        .sort_values(["s", "a", "b"], ascending=[False, True, True],
                     kind="mergesort").head(20).reset_index(drop=True) \
        .astype({"a": np.int64, "b": np.int64})
    got_top = simrank_topk(edges, n, iters=3, c=0.8, k_top=20)
    pd.testing.assert_frame_equal(got_top, want_top)

    u, c = np.unique(s[nz], return_counts=True)
    want_hist = pd.DataFrame({"s": u[::-1],
                              "n_pairs": c[::-1].astype(np.int64)})
    got_hist = simrank_score_hist(
        rd.from_arrow(pa.table({"src": pa.array(src),
                                "dst": pa.array(dst)})), n,
        iters=3, c=0.8).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_hist,
                                  want_hist.reset_index(drop=True))


def test_anf_estimates_track_exact_balls(tmp_path, ray_session):
    """The k=8 register sketch's N(t) tracks the exact neighborhood
    function within estimator error on a random graph, and increasing
    t never decreases the estimate (registers are monotone mins)."""
    import numpy as np

    from linkgraph.algos.anf import neighborhood_function
    from linkgraph.edges import symmetrize
    from linkgraph.graph import load_undirected
    from linkgraph.io import from_pandas_clean

    import pandas as pd

    rng = np.random.default_rng(9)
    n, m = 120, 260
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    edges = from_pandas_clean(pd.DataFrame({"src": e[:, 0],
                                            "dst": e[:, 1]}))
    eng = load_undirected(symmetrize(edges), n, 2,
                          str(tmp_path / "anf_store"))
    got = neighborhood_function(eng, k=8, rounds=3)

    # exact balls by boolean matrix powers
    A = np.eye(n, dtype=bool)
    A[e[:, 0], e[:, 1]] = True
    A[e[:, 1], e[:, 0]] = True
    reach = np.eye(n, dtype=bool)
    exact = []
    for _ in range(3):
        reach = reach @ A
        exact.append(int(reach.sum()))
    nf = got["nf"].to_numpy()
    assert list(got["t"]) == [1, 2, 3]
    assert np.all(np.diff(nf) >= 0)
    for est, ex in zip(nf, exact):
        assert abs(est - ex) / ex < 0.35, (est, ex)


def test_voterank_matches_naive(tmp_path, ray_session):
    """Engine VoteRank == the textbook sequential iteration in exact
    integer vote units on a random undirected graph."""
    import numpy as np
    import pandas as pd

    from linkgraph.algos.voterank import voterank
    from linkgraph.edges import symmetrize
    from linkgraph.graph import load_undirected
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(21)
    n, m = 80, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    e = np.unique(np.stack([np.minimum(src, dst)[keep],
                            np.maximum(src, dst)[keep]], axis=1), axis=0)
    edges = from_pandas_clean(pd.DataFrame({"src": e[:, 0],
                                            "dst": e[:, 1]}))
    eng = load_undirected(symmetrize(edges), n, 2,
                          str(tmp_path / "vr_store"))
    got = voterank(eng, k=10)

    adj = [[] for _ in range(n)]
    for a, b in e:
        adj[a].append(b)
        adj[b].append(a)
    unit = 2 * len(e)
    delta = n
    va = np.full(n, unit, dtype=np.int64)
    picked = np.zeros(n, dtype=bool)
    rows = []
    for rnd in range(1, 11):
        score = np.array([sum(va[u] for u in adj[v]) for v in range(n)],
                         dtype=np.int64)
        score_m = np.where(picked, -1, score)
        sel = int(np.flatnonzero(score_m == score_m.max())[0])
        rows.append((rnd, sel, round(score[sel] / unit, 6)))
        picked[sel] = True
        va[sel] = 0
        for u in adj[sel]:
            va[u] = max(va[u] - delta, 0)
    want = pd.DataFrame(rows, columns=["rnk", "v", "score"]) \
        .astype({"rnk": np.int64, "v": np.int64})
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------------------- squares

def _brute_squares(e: np.ndarray, n: int) -> int:
    import itertools

    adj = [set() for _ in range(n)]
    for a, b in e:
        adj[a].add(int(b))
        adj[b].add(int(a))
    cnt = 0
    for (a, b, c, d) in itertools.permutations(range(n), 4):
        if a == min(a, b, c, d) and b < d:
            if (b in adj[a] and c in adj[b] and d in adj[c]
                    and a in adj[d]):
                cnt += 1
    return cnt


@pytest.mark.parametrize("seed", [5, 9])
def test_square_count_vs_brute(ray_session, seed):
    from linkgraph.algos.triangles import square_count
    from linkgraph.edges import edges_from_arrays

    rng = np.random.default_rng(seed)
    n = 12
    e = rng.integers(0, n, size=(30, 2)).astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    want = _brute_squares(e, n)
    assert square_count(ds) == want
    assert square_count(ds, force_distributed=True) == want


def test_square_count_chunked_slices(ray_session):
    """Force the sliced wedge emission (SQUARE_CHUNK_PAIRS < total
    wedges) and check the distributed fold still matches."""
    from linkgraph.algos import triangles as T
    from linkgraph.edges import edges_from_arrays

    rng = np.random.default_rng(3)
    n = 40
    e = rng.integers(0, n, size=(300, 2)).astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    want = T.square_count(ds)
    # chunk size rides the serialized closure, so Ray workers see it
    got = T.square_count(ds, force_distributed=True, chunk_pairs=7)
    assert got == want


# ------------------------------------------------------- densest subgraph

def _peel_reference(e: np.ndarray, n: int):
    """Naive synchronous (3/2)-average peel with Python sets."""
    alive = set(range(n))
    edges = {(int(a), int(b)) for a, b in e}
    rounds = []
    r = 0
    while alive:
        ea = [(a, b) for a, b in edges if a in alive and b in alive]
        deg = {v: 0 for v in alive}
        for a, b in ea:
            deg[a] += 1
            deg[b] += 1
        m2 = sum(deg.values())
        rounds.append((r, len(alive), m2))
        thr = (3 * m2) // (2 * len(alive))
        alive = {v for v in alive if deg[v] > thr}
        r += 1
    best = max(((m2 * 10 ** 24) // (2 * nn), -rr, rr, nn, m2)
               for rr, nn, m2 in rounds if nn > 0)
    _, _, rr, nn, m2 = best
    return rr, nn, m2 // 2, round(m2 / (2.0 * nn), 6)


@pytest.mark.parametrize("seed", [2, 13])
def test_densest_vs_reference(ray_session, seed):
    from linkgraph.algos.densest import densest_subgraph
    from linkgraph.edges import edges_from_arrays

    rng = np.random.default_rng(seed)
    n = 40
    e = rng.integers(0, n, size=(160, 2)).astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    # plant a clique so the densest region is nontrivial
    extra = np.array([(i, j) for i in range(6) for j in range(6)
                      if i < j], dtype=np.int64)
    e = np.unique(np.vstack([e, extra]), axis=0)
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    want = _peel_reference(e, n)
    got, rep = densest_subgraph(ds, n)
    row = (int(got["best_round"][0]), int(got["n_sub"][0]),
           int(got["m_sub"][0]), float(got["density"][0]))
    assert row == want
    assert rep["n_steps"] >= 1
    got2, _ = densest_subgraph(ds, n, force_distributed=True)
    row2 = (int(got2["best_round"][0]), int(got2["n_sub"][0]),
            int(got2["m_sub"][0]), float(got2["density"][0]))
    assert row2 == want


# -------------------------------------------------- sampled triangles

@pytest.mark.parametrize("seed", [4, 17])
def test_approx_triangles_paths_and_sanity(ray_session, seed):
    import pandas as pd

    from linkgraph.algos.triangles import (approx_triangle_count,
                                           triangle_count)
    from linkgraph.edges import edges_from_arrays

    rng = np.random.default_rng(seed)
    n = 60
    e = rng.integers(0, n, size=(500, 2)).astype(np.int64)
    e = e[e[:, 0] != e[:, 1]]
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    ds = edges_from_arrays(e[:, 0], e[:, 1]).materialize()
    drv = approx_triangle_count(ds)
    dist = approx_triangle_count(ds, force_distributed=True)
    pd.testing.assert_frame_equal(drv, dist)
    # deterministic 1/4 hash sample: rate within a loose band
    tot = int(drv["n_wedges"][0])
    samp = int(drv["n_sampled"][0])
    assert tot > 100
    assert 0.1 < samp / tot < 0.45
    # the estimate is in the neighborhood of the exact count
    exact = triangle_count(ds)
    est = float(drv["triangles_est"][0])
    assert est == 0 or 0.2 * exact <= est <= 5 * max(exact, 1)


def onion_oracle(e, n, k):
    """Synchronous peeling with removal rounds: layer = first round the
    vertex is outside the alive set (-1 for k-core survivors)."""
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    s = np.unique(both, axis=0)
    alive = np.ones(n, dtype=bool)
    layer = np.full(n, -1, dtype=np.int64)
    rnd = 0
    while True:
        m = alive[s[:, 0]] & alive[s[:, 1]]
        deg = np.bincount(s[m, 1], minlength=n)
        new = alive & (deg >= k)
        died = alive & ~new
        layer[died] = rnd
        if not died.any():
            return layer
        alive = new
        rnd += 1


@pytest.mark.parametrize("name,k", [("path_8", 2), ("two_cliques_k5", 3),
                                    ("er_1k", 8), ("star_1_50", 2)])
def test_onion_layers_match_peeling(name, k, tmp_path):
    from linkgraph.algos import onion_layers

    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        onion_layers(eng, k=k)
        got = eng.state_pandas(["layer"])["layer"].to_numpy()
        want = onion_oracle(e, n, k)
        assert np.array_equal(got, want), (
            f"{name} k={k}: {np.flatnonzero(got != want)}")
    finally:
        eng.shutdown()


# ------------------------------------------------------------------ WL

def wl_partition_oracle(e_sym, n, rounds):
    """Textbook 1-WL: canonical ids of (old label, sorted neighbor-label
    multiset) per round; returns the partition (label array) per round."""
    lab = np.zeros(n, dtype=np.int64)
    out = []
    for _ in range(rounds):
        neigh = [[] for _ in range(n)]
        for s, d in e_sym:
            neigh[d].append(lab[s])
        sigs = [(int(lab[v]), tuple(sorted(neigh[v]))) for v in range(n)]
        canon = {}
        new = np.empty(n, dtype=np.int64)
        for v, sig in enumerate(sigs):
            new[v] = canon.setdefault(sig, len(canon))
        lab = new
        out.append(lab.copy())
    return out


def _partition_ids(lab):
    """Canonicalize a labelling to first-occurrence ids (partition cmp)."""
    _, inv = np.unique(lab, return_inverse=True)
    first = {}
    out = np.empty(len(lab), dtype=np.int64)
    for i, x in enumerate(inv):
        out[i] = first.setdefault(int(x), len(first))
    return out


@pytest.mark.parametrize("name", ["path_8", "star_1_50", "er_1k",
                                  "two_cliques_k5"])
def test_wl_matches_textbook_partition(name, tmp_path):
    from linkgraph.algos.wl import wl_refine

    e = _dedup(micro_graph(name))
    n = _n(e)
    sym = np.concatenate([e, e[:, ::-1]])
    sym = np.unique(sym[sym[:, 0] != sym[:, 1]], axis=0)
    want = wl_partition_oracle(sym, n, 3)
    got = {}
    for parts in (1, 3):
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=parts,
                              store_dir=str(tmp_path / f"g{parts}"))
        try:
            wl_refine(eng, rounds=3)
            st = eng.state_pandas(["label_1", "label_2", "label_3"])
            got[parts] = [st[f"label_{r}"].to_numpy() for r in (1, 2, 3)]
        finally:
            eng.shutdown()
    for r in range(3):
        # partition-count invariance: identical hash labels
        assert np.array_equal(got[1][r], got[3][r])
        # hash refinement induces the textbook WL partition
        assert np.array_equal(_partition_ids(got[1][r]),
                              _partition_ids(want[r]))


# -------------------------------------------------------------- fiedler

def test_fiedler_bisects_two_cliques(tmp_path):
    """Deflated power iteration on the shifted normalized adjacency
    separates two bridged cliques by sign, attenuates the bridge
    endpoints, zeroes non-members, and is partition-count invariant."""
    from linkgraph.algos.fiedler import fiedler_vector

    e = [(i, j) for i in range(5) for j in range(5) if i < j]
    e += [(5 + i, 5 + j) for i in range(5) for j in range(5) if i < j]
    e += [(4, 5), (10, 11)]  # bridge + an isolated 2-component
    e = np.array(e, dtype=np.int64)
    out = {}
    for parts in (1, 3):
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), 12,
                              num_partitions=parts,
                              store_dir=str(tmp_path / f"f{parts}"))
        try:
            fiedler_vector(eng, rounds=12)
            out[parts] = eng.state_pandas(["fiedler"])["fiedler"] \
                .to_numpy()
        finally:
            eng.shutdown()
    x = out[1]
    assert np.allclose(x, out[3], atol=1e-12)  # partition invariance
    s = np.sign(x)
    assert (s[:5] == s[0]).all() and (s[5:10] == s[5]).all()
    assert s[0] == -s[5]                      # opposite communities
    assert (x[10:] == 0).all()                # outside largest CC
    assert abs(x[4]) < abs(x[0]) and abs(x[5]) < abs(x[9])  # bridge


# -------------------------------------------------------------- voronoi

def voronoi_oracle(e_sym, n, seeds):
    import collections
    dist = {int(s): (0, i) for i, s in enumerate(seeds) if s < n}
    adj = collections.defaultdict(list)
    for a, b in e_sym:
        adj[a].append(b)
    frontier = sorted(dist)
    while frontier:
        nxt = set()
        for u in frontier:
            du, iu = dist[u]
            for w in adj[u]:
                cand = (du + 1, iu)
                if w not in dist or cand < dist[w]:
                    dist[w] = cand
                    nxt.add(w)
        frontier = sorted(nxt)
    out = np.full((n, 2), -1, dtype=np.int64)
    for v, (d, i) in dist.items():
        out[v] = (i, d)
    return out


@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5", "er_1k"])
def test_voronoi_matches_bfs_oracle(name, tmp_path):
    from linkgraph.algos.voronoi import SEED_BITS, _UNREACHED, \
        voronoi_assign

    e = _dedup(micro_graph(name))
    n = _n(e)
    sym = np.concatenate([e, e[:, ::-1]])
    sym = np.unique(sym[sym[:, 0] != sym[:, 1]], axis=0)
    seeds = [0, min(3, n - 1), min(7, n - 1)]
    want = voronoi_oracle(sym, n, seeds)
    for parts in (1, 3):
        eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                              num_partitions=parts,
                              store_dir=str(tmp_path / f"v{parts}"))
        try:
            voronoi_assign(eng, seeds)
            p = eng.state_pandas(["packed"])["packed"].to_numpy()
            reached = p != _UNREACHED
            got = np.full((n, 2), -1, dtype=np.int64)
            got[reached, 0] = p[reached] & ((1 << SEED_BITS) - 1)
            got[reached, 1] = p[reached] >> SEED_BITS
            assert np.array_equal(got, want)
        finally:
            eng.shutdown()

"""Algorithm oracle tests (SURVEY.md §5.2): engine vs 20-line numpy
references implementing the reference toolkits' EXACT recurrences, on
seeded micro graphs; plus partition-count invariance and resume."""

import numpy as np
import pytest

from linkgraph.algos import (
    bfs, connected_components, label_propagation, pagerank, sssp,
    triangle_count,
)
from linkgraph.algos.bfs import found_vertices
from linkgraph.algos.pagerank import pr_sum
from linkgraph.algos.sssp import INF_DIST, max_finite_distance
from linkgraph.edges import edges_from_arrays
from linkgraph.graph import load_directed, load_undirected
from linkgraph.synth import micro_graph


# ---------------------------------------------------------------- oracles

def pr_oracle(e, n, iters, d=0.85):
    outdeg = np.bincount(e[:, 0], minlength=n)
    nz = outdeg > 0
    curr = np.ones(n)
    curr[nz] /= outdeg[nz]
    raw = curr.copy()
    for _ in range(iters):
        s = np.zeros(n)
        np.add.at(s, e[:, 1], curr[e[:, 0]])
        raw = 1 - d + d * s
        curr = raw.copy()
        curr[nz] = raw[nz] / outdeg[nz]
    return raw


def sym_simple(e, n):
    both = np.vstack([e, e[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    return np.unique(both, axis=0)


def cc_oracle(e, n):
    s = sym_simple(e, n)
    lab = np.arange(n, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, s[:, 1], lab[s[:, 0]])
        if np.array_equal(new, lab):
            return lab
        lab = new


def lp_oracle(e, n, max_iters):
    s = sym_simple(e, n)
    lab = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        new = lab.copy()
        for v in np.unique(s[:, 1]):
            nbr_labels = lab[s[s[:, 1] == v][:, 0]]
            vals, cnts = np.unique(nbr_labels, return_counts=True)
            new[v] = vals[cnts == cnts.max()].min()
        if np.array_equal(new, lab):
            break
        lab = new
    return lab


def bfs_oracle(e, n, root):
    adj = [[] for _ in range(n)]
    for u, v in e:
        adj[u].append(v)
    depth = np.full(n, -1)
    depth[root] = 0
    frontier = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if depth[v] < 0:
                    depth[v] = depth[u] + 1
                    nxt.append(v)
        frontier = nxt
    return depth


def sssp_oracle(e, w, n, root):
    import heapq

    adj = [[] for _ in range(n)]
    for (u, v), wt in zip(e, w):
        adj[u].append((v, wt))
    dist = np.full(n, INF_DIST)
    dist[root] = 0.0
    h = [(0.0, root)]
    while h:
        dd, u = heapq.heappop(h)
        if dd > dist[u]:
            continue
        for v, wt in adj[u]:
            if dd + wt < dist[v]:
                dist[v] = dd + wt
                heapq.heappush(h, (dist[v], v))
    return dist


def tri_oracle(e, n):
    s = sym_simple(e, n)
    adj = np.zeros((n, n), dtype=np.int64)
    adj[s[:, 0], s[:, 1]] = 1
    return int(np.trace(adj @ adj @ adj) // 6)


# ----------------------------------------------------------------- tests

GRAPHS = ["path_8", "cycle_5", "star_1_50", "two_cliques_k5", "er_1k",
          "powerlaw_1k"]


def _n(e):
    return int(e.max()) + 1


@pytest.mark.parametrize("name", GRAPHS)
def test_pagerank_matches_gemini_recurrence(name, tmp_path):
    e = micro_graph(name)
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        rep = pagerank(eng, iterations=10)
        assert rep["n_steps"] == 10
        got = eng.state_pandas(["rank"])["rank"].to_numpy()
        assert np.allclose(got, pr_oracle(e, n, 10), atol=1e-6)
        assert abs(pr_sum(eng) - got.sum()) < 1e-6
    finally:
        eng.shutdown()


@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5_nobridge", "er_1k"])
def test_cc_exact(name, tmp_path):
    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        connected_components(eng)
        got = eng.state_pandas(["label"])["label"].to_numpy()
        assert np.array_equal(got, cc_oracle(e, n))
    finally:
        eng.shutdown()


@pytest.mark.parametrize("name", ["two_cliques_k5_nobridge", "star_1_50",
                                  "path_8"])
def test_labelprop_exact(name, tmp_path):
    e = micro_graph(name)
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=2, store_dir=str(tmp_path / "g"))
    try:
        label_propagation(eng, max_iters=8)
        got = eng.state_pandas(["label"])["label"].to_numpy()
        assert np.array_equal(got, lp_oracle(e, n, 8))
    finally:
        eng.shutdown()


def test_bfs_depths_and_min_parent(tmp_path):
    e = micro_graph("er_1k")
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        bfs(eng, root=0)
        parent = eng.state_pandas(["parent"])["parent"].to_numpy()
        depth = bfs_oracle(e, n, 0)
        assert found_vertices(eng) == int((depth >= 0).sum())
        assert np.array_equal(parent < n, depth >= 0)
        # every reached non-root's parent is one BFS level above it
        reached = np.flatnonzero((depth > 0))
        assert np.array_equal(depth[parent[reached]], depth[reached] - 1)
    finally:
        eng.shutdown()


def test_sssp_exact_distances(tmp_path):
    e = micro_graph("er_1k")
    n = _n(e)
    rng = np.random.default_rng(7)
    w = rng.uniform(0.1, 2.0, len(e))
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1], w), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"),
                        weighted=True)
    try:
        sssp(eng, root=0)
        got = eng.state_pandas(["distance"])["distance"].to_numpy()
        want = sssp_oracle(e, w, n, 0)
        assert np.allclose(got, want, atol=1e-9)
        assert abs(max_finite_distance(eng) -
                   want[want < INF_DIST].max()) < 1e-9
    finally:
        eng.shutdown()


def widest_oracle(e, w, n, root):
    """Dijkstra-style maximin: pop the largest-capacity vertex first."""
    import heapq

    adj = [[] for _ in range(n)]
    for (u, v), wt in zip(e, w):
        adj[u].append((v, wt))
    cap = np.zeros(n)
    cap[root] = 1e9
    h = [(-1e9, root)]
    while h:
        c, u = heapq.heappop(h)
        c = -c
        if c < cap[u]:
            continue
        for v, wt in adj[u]:
            nc = min(c, wt)
            if nc > cap[v]:
                cap[v] = nc
                heapq.heappush(h, (-nc, v))
    return cap


def test_widest_exact_capacities(tmp_path):
    from linkgraph.algos import widest_path

    e = micro_graph("er_1k")
    n = _n(e)
    rng = np.random.default_rng(7)
    w = rng.uniform(0.1, 2.0, len(e))
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1], w), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"),
                        weighted=True)
    try:
        widest_path(eng, root=0)
        got = eng.state_pandas(["capacity"])["capacity"].to_numpy()
        want = widest_oracle(e, w, n, 0)
        # max-min semiring: no float addition, so the match is EXACT
        assert np.array_equal(got, want)
    finally:
        eng.shutdown()


def bc_oracle(e, n, root):
    """Brandes single-source dependencies (multi-edge aware)."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for u, v in e:
        adj[u].append(v)
    sigma = np.zeros(n)
    sigma[root] = 1.0
    depth = np.full(n, -1)
    depth[root] = 0
    order = []
    qq = deque([root])
    while qq:
        u = qq.popleft()
        order.append(u)
        for v in adj[u]:
            if depth[v] < 0:
                depth[v] = depth[u] + 1
                qq.append(v)
            if depth[v] == depth[u] + 1:
                sigma[v] += sigma[u]
    delta = np.zeros(n)
    for u in reversed(order):
        for v in adj[u]:
            if depth[v] == depth[u] + 1:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
    return delta, sigma, depth


@pytest.mark.parametrize("compact", [False, True],
                         ids=["stack", "compact"])
@pytest.mark.parametrize("name", ["path_8", "two_cliques_k5", "er_1k"])
def test_betweenness_matches_brandes(name, compact, tmp_path):
    """Both level representations (mask stack, bc.cpp:24-196; compact
    level array, bc.cpp:199-404) must produce identical results."""
    from linkgraph.algos import betweenness

    e = micro_graph(name)
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        betweenness(eng, root=0, compact=compact)
        pdf = eng.state_pandas(["dependencies", "num_paths"])
        want_d, want_s, depth = bc_oracle(e, n, 0)
        reached = depth >= 0
        got_d = pdf["dependencies"].to_numpy()
        got_s = pdf["num_paths"].to_numpy()
        assert np.allclose(got_s[reached], want_s[reached], atol=1e-9)
        assert np.allclose(got_d[reached], want_d[reached], atol=1e-9)
        assert not np.isfinite(got_d[~reached]).any()  # NaN like reference
    finally:
        eng.shutdown()


@pytest.mark.parametrize("name", ["two_cliques_k5", "star_1_50", "cycle_5",
                                  "er_1k"])
def test_triangles_exact(name):
    e = micro_graph(name)
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    assert triangle_count(ds, num_partitions=4) == tri_oracle(e, _n(e))


def test_partition_count_invariance(tmp_path):
    e = micro_graph("powerlaw_1k")
    n = _n(e)
    results = []
    for p in (1, 3):
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=p,
                            store_dir=str(tmp_path / f"g{p}"))
        try:
            pagerank(eng, iterations=5)
            results.append(eng.state_pandas(["rank"])["rank"].to_numpy())
        finally:
            eng.shutdown()
    assert np.allclose(results[0], results[1], atol=1e-9)


def test_pagerank_checkpoint_resume(tmp_path):
    """Resume mid-run on the fused static path -> identical final ranks."""
    import shutil

    e = micro_graph("powerlaw_1k")
    n = _n(e)
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        pagerank(eng, iterations=8, ckpt_dir=str(tmp_path / "ck"))
        full = eng.state_pandas(["rank"])["rank"].to_numpy()
    finally:
        eng.shutdown()
    for d in sorted((tmp_path / "ck").glob("step=*")):
        if int(d.name.split("=")[1]) > 3:
            shutil.rmtree(d)
    eng2 = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                         num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        rep = pagerank(eng2, iterations=8, ckpt_dir=str(tmp_path / "ck"),
                       resume=True)
        assert rep["start_step"] == 4
        resumed = eng2.state_pandas(["rank"])["rank"].to_numpy()
        assert np.allclose(full, resumed, atol=1e-12)
    finally:
        eng2.shutdown()


def test_checkpoint_resume_identical(tmp_path):
    e = micro_graph("er_1k")
    n = _n(e)
    # full run with checkpoints
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=2, store_dir=str(tmp_path / "g"))
    try:
        rep = connected_components(eng, ckpt_dir=str(tmp_path / "ck"))
        full = eng.state_pandas(["label"])["label"].to_numpy()
        assert rep["n_steps"] >= 2
    finally:
        eng.shutdown()
    # simulate a crash after step 0: delete later checkpoints, resume
    import shutil

    for d in sorted((tmp_path / "ck").glob("step=*")):
        if int(d.name.split("=")[1]) > 0:
            shutil.rmtree(d)
    eng2 = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                           num_partitions=2, store_dir=str(tmp_path / "g"))
    try:
        rep2 = connected_components(eng2, ckpt_dir=str(tmp_path / "ck"),
                                    resume=True)
        assert rep2["start_step"] == 1
        resumed = eng2.state_pandas(["label"])["label"].to_numpy()
        assert np.array_equal(full, resumed)
    finally:
        eng2.shutdown()


def test_actor_kill_mid_run_attach_resume(tmp_path):
    """North rule (resumable with per-partition lineage), failure
    injection: hard-kill a GraphShard actor between supersteps, prove
    the dead pool is detected, then re-attach a FRESH shard pool from
    the persisted store and resume from the latest complete manifest —
    final state identical to an uninterrupted run."""
    import ray

    from linkgraph.graph import attach

    e = micro_graph("er_1k")
    n = _n(e)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n,
                          num_partitions=2, store_dir=str(tmp_path / "g"),
                          persist=True)
    try:
        connected_components(eng)
        full = eng.state_pandas(["label"])["label"].to_numpy()
    finally:
        eng.shutdown()

    ck = str(tmp_path / "ck")
    eng2 = attach(str(tmp_path / "g"))
    rep = connected_components(eng2, max_steps=2, ckpt_dir=ck)
    assert rep["n_steps"] == 2
    ray.kill(eng2.shards[0], no_restart=True)  # injected failure
    with pytest.raises(Exception):  # dead pool surfaces, never hangs
        connected_components(eng2, resume=True, ckpt_dir=ck)
    try:
        eng2.shutdown()
    except Exception:
        pass

    eng3 = attach(str(tmp_path / "g"))
    try:
        rep3 = connected_components(eng3, resume=True, ckpt_dir=ck)
        assert rep3["start_step"] == 2
        resumed = eng3.state_pandas(["label"])["label"].to_numpy()
        assert np.array_equal(full, resumed)
    finally:
        eng3.shutdown()


def test_triangles_distributed_path_matches_driver():
    """The distributed pipeline (forced) and the driver kernel agree."""
    import linkgraph.algos.triangles as T

    e = micro_graph("er_1k")
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    fast = T.triangle_count(ds)
    old = T.DRIVER_TRI_CAP
    T.DRIVER_TRI_CAP = 0
    try:
        slow = T.triangle_count(edges_from_arrays(e[:, 0], e[:, 1]))
    finally:
        T.DRIVER_TRI_CAP = old
    assert fast == slow == tri_oracle(e, _n(e))


@pytest.mark.parametrize("name", ["powerlaw_1k", "two_cliques_k5"])
def test_betweenness_sampled_matches_summed_brandes(name, tmp_path):
    """Sampled BC == sum of single-root Brandes dependencies over the
    root sample; a second sweep on the same engine must not accumulate."""
    from linkgraph.algos.bc import betweenness_sampled

    e = micro_graph(name)
    n = _n(e)
    roots = [0, 1, 2]
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        betweenness_sampled(eng, roots)
        got = eng.state_pandas(["bc"])["bc"].to_numpy()
        want = np.zeros(n)
        for r in roots:
            d, _, dep = bc_oracle(e, n, r)
            want[dep >= 0] += d[dep >= 0]
        assert np.allclose(got, want, atol=1e-9)
        betweenness_sampled(eng, roots)
        got2 = eng.state_pandas(["bc"])["bc"].to_numpy()
        assert np.array_equal(got, got2)
    finally:
        eng.shutdown()


def test_static_lookahead_rollback_exact(tmp_path):
    """Pipelined static-fused loop (engine.STATIC_LOOKAHEAD) is
    byte-identical to the serial loop, INCLUDING when the delta stop
    fires mid-window and speculative supersteps must roll back."""
    from linkgraph.engine import GraphEngine

    e = micro_graph("er_1k")
    n = _n(e)

    def run(lookahead, tol):
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path / f"g{lookahead}{tol}"))
        old = GraphEngine.STATIC_LOOKAHEAD
        GraphEngine.STATIC_LOOKAHEAD = lookahead
        try:
            rep = pagerank(eng, iterations=50, tol=tol)
            rank = eng.state_pandas(["rank"])["rank"].to_numpy()
            deltas = [s["reducers"]["delta"] for s in rep["steps"]]
            return rep["n_steps"], rank, deltas
        finally:
            GraphEngine.STATIC_LOOKAHEAD = old
            eng.shutdown()

    # tol chosen so the run stops EARLY (rollback path exercised)
    s0, r0, d0 = run(0, 1e-3)
    s3, r3, d3 = run(3, 1e-3)
    assert 0 < s3 < 50          # stop fired before max_steps
    assert s0 == s3
    assert np.array_equal(r0, r3)       # bit-identical state
    assert d0 == d3                     # identical delta curve
    # fixed-iteration path (no early stop) also identical
    s0f, r0f, _ = run(0, 0.0)
    s3f, r3f, _ = run(3, 0.0)
    assert s0f == s3f == 50
    assert np.array_equal(r0f, r3f)


def test_static_parts_routing_exact(tmp_path, monkeypatch):
    """The per-owner (num_returns) pipelined routing — big-graph message
    volumes where the fused single object is too large — produces
    byte-identical results to the fused path, early stop included."""
    from linkgraph.engine import GraphEngine

    e = micro_graph("er_1k")
    n = _n(e)

    def run(force_unfused, tol):
        eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                            num_partitions=3,
                            store_dir=str(tmp_path /
                                          f"p{force_unfused}{tol}"))
        if force_unfused:
            monkeypatch.setattr(GraphEngine, "_use_fused",
                                lambda self, c: False)
        try:
            rep = pagerank(eng, iterations=40, tol=tol)
            rank = eng.state_pandas(["rank"])["rank"].to_numpy()
            return rep["n_steps"], rank, \
                [s["reducers"]["delta"] for s in rep["steps"]]
        finally:
            monkeypatch.undo()
            eng.shutdown()

    for tol in (1e-3, 0.0):   # early-stop (rollback) and fixed-iters
        sf, rf, df = run(False, tol)
        su, ru, du = run(True, tol)
        assert sf == su
        assert np.array_equal(rf, ru)
        assert df == du

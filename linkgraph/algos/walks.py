"""Deterministic random walks over an edge Dataset (graph-sampling
operator for training-data pipelines: node2vec-style corpus generation,
neighborhood sampling, graph-aware shuffling).

"Random" choice is a seeded-free DETERMINISTIC hash rule so runs are
reproducible and SQL-checkable (same convention as sampling.py): at step
t a walk at vertex `cur` moves to the out-neighbor `n` minimizing the
hex string ``md5(f"{walk_id}:{t}:{cur}:{n}")`` (ties — md5 collisions —
broken by `n` asc); a walk at a sink vertex stays put.  md5 is the
cross-system hash both hashlib and DuckDB implement bit-identically; a
polynomial hash would be the cheaper scale choice but is not available
to the SQL oracle.

Scale shape: walks are the parallel dimension (millions of walks stream
through `map_batches`; each step touches O(frontier-adjacent) edges).
Two physical plans behind one result (tested equal,
tests/test_walks.py):

  broadcast  adjacency (sorted src + CSR offsets) <= WALK_ADJ_CAP rows:
             ray.put once, every step is ONE map_batches over the walk
             set — no shuffle.
  shuffle    larger graphs: per step, walk rows and edge rows are
             co-grouped by vertex (union + groupby — robust to the
             Ray 2.49 empty-hash-partition join crash, same pattern as
             algos/triangles.py closure), candidates then reduce to the
             min-hash neighbor per walk via a second groupby.

Reference scope: GeminiGraph has no walk toolkit; this is a north-rule
training-data addition (task brief: graph-sampling ops).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

WALK_ADJ_CAP = 5_000_000  # edge rows; same gate scale as triangles.BROADCAST_DEG_CAP


def _hash_pick(walk_id: int, step: int, cur: int, nbrs: np.ndarray) -> int:
    """argmin over (md5 hex, neighbor id) — the deterministic step rule."""
    best_h, best_n = None, None
    for n in nbrs:
        h = hashlib.md5(f"{walk_id}:{step}:{cur}:{n}".encode()).hexdigest()
        if best_h is None or (h, n) < (best_h, best_n):
            best_h, best_n = h, int(n)
    return best_n


def _adj_arrays(edges_pdf: pd.DataFrame):
    """Sorted-src CSR view: (srcs sorted, dsts aligned) for searchsorted
    neighbor slicing."""
    s = edges_pdf["src"].to_numpy(np.int64)
    d = edges_pdf["dst"].to_numpy(np.int64)
    order = np.lexsort((d, s))
    return s[order], d[order]


def deterministic_walks(edges_ds, seeds: list[int], steps: int,
                        num_partitions: int = 8):
    """Walk `steps` steps from each seed over the DIRECTED edge Dataset
    (pass the symmetrized edges for undirected walks).  Returns a Ray
    Dataset with one row per (walk, step): (walk_id, step, v), step 0 =
    seed.  walk_id = index into `seeds`.

    Per-step frontier state is O(#walks) (NOT O(graph)); the trajectory
    result here is collected (O(walks * steps)) — a 100-TB run would
    `write_parquet` each step's frontier instead and never collect.
    """
    from ..io import from_pandas_clean

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        # empty graphs lose their Arrow schema on to_pandas (known Ray
        # gotcha, see edges.build_link_edges): every walk just parks
        wid = np.repeat(np.arange(len(seeds), dtype=np.int64), steps + 1)
        trail = pd.DataFrame({
            "walk_id": wid,
            "step": np.tile(np.arange(steps + 1, dtype=np.int64),
                            len(seeds)),
            "v": np.repeat(np.asarray(seeds, dtype=np.int64), steps + 1)})
    elif n_edges <= WALK_ADJ_CAP:
        trail = _walks_broadcast(edges_ds, seeds, steps)
    else:
        trail = _walks_shuffle(edges_ds, seeds, steps, num_partitions)
    return from_pandas_clean(trail)


def _walks_broadcast(edges_ds, seeds: list[int], steps: int) -> pd.DataFrame:
    import ray

    srcs, dsts = _adj_arrays(edges_ds.to_pandas())
    adj_ref = ray.put((srcs, dsts))
    from ..io import from_pandas_clean

    state = pd.DataFrame({"walk_id": np.arange(len(seeds), dtype=np.int64),
                          "v": np.asarray(seeds, dtype=np.int64)})
    rows = [state.assign(step=0)]
    walks = from_pandas_clean(state)
    for t in range(1, steps + 1):
        def advance(b: pa.Table, _t=t) -> pa.Table:
            s, d = ray.get(adj_ref)
            wid = b["walk_id"].to_numpy(zero_copy_only=False)
            cur = b["v"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(s, cur, "left")
            hi = np.searchsorted(s, cur, "right")
            nxt = np.empty(len(cur), np.int64)
            for i in range(len(cur)):
                if lo[i] == hi[i]:       # sink: stay
                    nxt[i] = cur[i]
                else:
                    nxt[i] = _hash_pick(int(wid[i]), _t, int(cur[i]),
                                        d[lo[i]:hi[i]])
            return pa.table({"walk_id": pa.array(wid, pa.int64()),
                             "v": pa.array(nxt, pa.int64())})

        # materialize per step: the trajectory snapshot below is a second
        # consumer of this node (diamond-lineage rule, CLAUDE.md)
        walks = walks.map_batches(advance, batch_format="pyarrow") \
                     .materialize()
        rows.append(walks.to_pandas().assign(step=t))
    out = pd.concat(rows, ignore_index=True)[["walk_id", "step", "v"]]
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def _walks_shuffle(edges_ds, seeds: list[int], steps: int,
                   num_partitions: int) -> pd.DataFrame:
    """Co-group walks and edges by vertex per step (no broadcast):
    union walk rows (key=v, walk_id, is_edge=0) with edge rows
    (key=src, nbr=dst, is_edge=1), groupby(key) emits candidates,
    groupby(walk_id) reduces to the min-hash choice."""
    from ..io import from_pandas_clean
    from ..runtime import tune_context

    tune_context()
    tagged_edges = edges_ds.map_batches(
        lambda b: pa.table({
            "key": pa.Array.from_pandas(
                b["src"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "walk_id": pa.array(np.full(b.num_rows, -1, np.int64)),
            "nbr": pa.Array.from_pandas(
                b["dst"].to_numpy(zero_copy_only=False).astype(np.int64))}),
        batch_format="pyarrow").materialize()

    state = pd.DataFrame({"walk_id": np.arange(len(seeds), dtype=np.int64),
                          "v": np.asarray(seeds, dtype=np.int64)})
    rows = [state.assign(step=0)]
    for t in range(1, steps + 1):
        walks_tagged = from_pandas_clean(pd.DataFrame({
            "key": state["v"].to_numpy(np.int64),
            "walk_id": state["walk_id"].to_numpy(np.int64),
            "nbr": np.full(len(state), -1, np.int64)}))

        def candidates(g: pd.DataFrame, _t=t) -> pd.DataFrame:
            wids = g.loc[g["walk_id"] >= 0, ["walk_id", "key"]]
            nbrs = g.loc[(g["walk_id"] < 0) & (g["nbr"] >= 0), "nbr"] \
                    .to_numpy(np.int64)
            out = []
            for wid, cur in wids.itertuples(index=False):
                if len(nbrs) == 0:
                    out.append((wid, int(cur)))   # sink: stay
                else:
                    out.append((wid, _hash_pick(int(wid), _t, int(cur),
                                                nbrs)))
            return pd.DataFrame(out, columns=["walk_id", "v"]) \
                if out else pd.DataFrame({"walk_id": np.empty(0, np.int64),
                                          "v": np.empty(0, np.int64)})

        nxt = walks_tagged.union(tagged_edges).groupby("key").map_groups(
            candidates, batch_format="pandas")
        state = nxt.to_pandas().sort_values("walk_id") \
                   .reset_index(drop=True)
        rows.append(state.assign(step=t))
    out = pd.concat(rows, ignore_index=True)[["walk_id", "step", "v"]]
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


# ------------------------------------------------ second-order (node2vec)

def _tier(prev: int, n: int, srcs: np.ndarray, dsts: np.ndarray) -> int:
    """node2vec neighbor class: 0 = distance-1 from prev (triadic,
    preferred), 1 = return to prev, 2 = exploratory.  Membership test
    on the (src-run, sorted dst) adjacency slice."""
    lo = np.searchsorted(srcs, prev, "left")
    hi = np.searchsorted(srcs, prev, "right")
    if lo < hi:
        p = np.searchsorted(dsts[lo:hi], n)
        if p < hi - lo and dsts[lo + p] == n:
            return 0
    return 1 if n == prev else 2


def _hash_pick_biased(walk_id: int, step: int, prev: int, cur: int,
                      nbrs: np.ndarray, srcs: np.ndarray,
                      dsts: np.ndarray) -> int:
    """argmin over (tier, md5 hex, neighbor id) — the deterministic
    second-order step rule (node2vec's p/q classes as a preference
    ORDER instead of sampling weights, keeping runs reproducible and
    SQL-checkable)."""
    best = None
    for n in nbrs:
        t = _tier(prev, int(n), srcs, dsts)
        h = hashlib.md5(
            f"{walk_id}:{step}:{cur}:{n}".encode()).hexdigest()
        k = (t, h, int(n))
        if best is None or k < best:
            best = k
    return best[2]


def node2vec_walks(edges_ds, seeds: list[int], steps: int,
                   num_partitions: int = 8):
    """Second-order deterministic walks: state is (prev, cur); among
    cur's out-neighbors the walk prefers distance-1-from-prev (triadic
    closure), then returning, then exploring, tie-breaking inside a
    tier by the same md5 rule as deterministic_walks.  prev starts at
    the seed itself (step 1 therefore reduces to the first-order
    rule).  Sinks keep their whole state.  Returns (walk_id, step, v).

    Plans: broadcast adjacency under WALK_ADJ_CAP (per-step
    map_batches, tier checked against the same sorted arrays); above
    the cap a 3-stage co-group per step (candidates by cur, tier marks
    by prev, argmin by walk) — no broadcast of the edge set.
    """
    from ..io import from_pandas_clean

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        wid = np.repeat(np.arange(len(seeds), dtype=np.int64), steps + 1)
        return from_pandas_clean(pd.DataFrame({
            "walk_id": wid,
            "step": np.tile(np.arange(steps + 1, dtype=np.int64),
                            len(seeds)),
            "v": np.repeat(np.asarray(seeds, dtype=np.int64),
                           steps + 1)}))
    if n_edges <= WALK_ADJ_CAP:
        trail = _node2vec_broadcast(edges_ds, seeds, steps)
    else:
        trail = _node2vec_shuffle(edges_ds, seeds, steps)
    return from_pandas_clean(trail)


def _node2vec_broadcast(edges_ds, seeds, steps) -> pd.DataFrame:
    import ray

    srcs, dsts = _adj_arrays(edges_ds.to_pandas())
    adj_ref = ray.put((srcs, dsts))
    from ..io import from_pandas_clean

    state = pd.DataFrame({
        "walk_id": np.arange(len(seeds), dtype=np.int64),
        "prev": np.asarray(seeds, dtype=np.int64),
        "v": np.asarray(seeds, dtype=np.int64)})
    rows = [state[["walk_id", "v"]].assign(step=0)]
    walks = from_pandas_clean(state)
    for t in range(1, steps + 1):
        def advance(b: pa.Table, _t=t) -> pa.Table:
            s, d = ray.get(adj_ref)
            wid = b["walk_id"].to_numpy(zero_copy_only=False)
            prev = b["prev"].to_numpy(zero_copy_only=False)
            cur = b["v"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(s, cur, "left")
            hi = np.searchsorted(s, cur, "right")
            nprev = prev.copy()
            nxt = cur.copy()
            for i in range(len(cur)):
                if lo[i] < hi[i]:
                    nprev[i] = cur[i]
                    nxt[i] = _hash_pick_biased(
                        int(wid[i]), _t, int(prev[i]), int(cur[i]),
                        d[lo[i]:hi[i]], s, d)
            return pa.table({"walk_id": pa.array(wid, pa.int64()),
                             "prev": pa.array(nprev, pa.int64()),
                             "v": pa.array(nxt, pa.int64())})

        walks = walks.map_batches(advance, batch_format="pyarrow") \
                     .materialize()
        rows.append(walks.select_columns(["walk_id", "v"]).to_pandas()
                    .assign(step=t))
    out = pd.concat(rows, ignore_index=True)[["walk_id", "step", "v"]]
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def _node2vec_shuffle(edges_ds, seeds, steps) -> pd.DataFrame:
    """Per step: (A) co-group walks+edges by cur -> candidate rows;
    (B) co-group candidates+edges by prev -> tier marks;
    (C) groupby walk -> argmin (tier, md5, n)."""
    from ..io import from_pandas_clean
    from ..runtime import tune_context

    tune_context()
    e_by_src = edges_ds.map_batches(
        lambda b: pa.table({
            "key": pa.Array.from_pandas(
                b["src"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "walk_id": pa.array(np.full(b.num_rows, -1, np.int64)),
            "prev": pa.array(np.full(b.num_rows, -1, np.int64)),
            "nbr": pa.Array.from_pandas(
                b["dst"].to_numpy(zero_copy_only=False)
                .astype(np.int64))}),
        batch_format="pyarrow").materialize()

    state = pd.DataFrame({
        "walk_id": np.arange(len(seeds), dtype=np.int64),
        "prev": np.asarray(seeds, dtype=np.int64),
        "v": np.asarray(seeds, dtype=np.int64)})
    rows = [state[["walk_id", "v"]].assign(step=0)]
    for t in range(1, steps + 1):
        wt = from_pandas_clean(pd.DataFrame({
            "key": state["v"].to_numpy(np.int64),
            "walk_id": state["walk_id"].to_numpy(np.int64),
            "prev": state["prev"].to_numpy(np.int64),
            "nbr": np.full(len(state), -1, np.int64)}))

        def cand(g: pd.DataFrame) -> pd.DataFrame:
            ws = g.loc[g["walk_id"] >= 0, ["walk_id", "prev", "key"]]
            nbrs = g.loc[(g["walk_id"] < 0) & (g["nbr"] >= 0), "nbr"] \
                .to_numpy(np.int64)
            out = []
            for wid, prev, cur in ws.itertuples(index=False):
                if len(nbrs) == 0:
                    out.append((wid, prev, int(cur), -1))
                else:
                    out.extend((wid, prev, int(cur), int(n))
                               for n in nbrs)
            return pd.DataFrame(
                out, columns=["walk_id", "prev", "cur", "n"]) if out \
                else pd.DataFrame({"walk_id": np.empty(0, np.int64),
                                   "prev": np.empty(0, np.int64),
                                   "cur": np.empty(0, np.int64),
                                   "n": np.empty(0, np.int64)})

        cands = wt.union(e_by_src).groupby("key").map_groups(
            cand, batch_format="pandas").materialize()

        # stage B: mark tiers by prev (co-group with edges keyed src)
        c_by_prev = cands.map_batches(
            lambda b: pa.table({
                "key": b["prev"], "walk_id": b["walk_id"],
                "prev": b["prev"], "cur": b["cur"], "n": b["n"],
                "is_edge": pa.array(np.zeros(b.num_rows, np.int8))}),
            batch_format="pyarrow")
        e2 = edges_ds.map_batches(
            lambda b: pa.table({
                "key": pa.Array.from_pandas(
                    b["src"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)),
                "walk_id": pa.array(np.full(b.num_rows, -1, np.int64)),
                "prev": pa.array(np.full(b.num_rows, -1, np.int64)),
                "cur": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pa.Array.from_pandas(
                    b["dst"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)),
                "is_edge": pa.array(np.ones(b.num_rows, np.int8))}),
            batch_format="pyarrow")

        def mark(g: pd.DataFrame, _t=t) -> pd.DataFrame:
            is_e = g["is_edge"].to_numpy(np.int8) == 1
            pn = np.sort(g.loc[is_e, "n"].to_numpy(np.int64))
            c = g.loc[~is_e]
            if len(c) == 0:
                return pd.DataFrame({
                    "walk_id": np.empty(0, np.int64),
                    "cur": np.empty(0, np.int64),
                    "n": np.empty(0, np.int64),
                    "tier": np.empty(0, np.int64),
                    "h": pd.Series([], dtype=object)})
            n_ = c["n"].to_numpy(np.int64)
            prev_ = c["prev"].to_numpy(np.int64)
            if len(pn):
                p = np.minimum(np.searchsorted(pn, n_), len(pn) - 1)
                isd1 = pn[p] == n_
            else:
                isd1 = np.zeros(len(n_), bool)
            tier = np.where(isd1, 0, np.where(n_ == prev_, 1, 2))
            tier = np.where(n_ < 0, -1, tier)  # sink marker rows
            h = [hashlib.md5(f"{w}:{_t}:{cu}:{nn}".encode()).hexdigest()
                 if nn >= 0 else ""
                 for w, cu, nn in zip(c["walk_id"], c["cur"], n_)]
            return pd.DataFrame({"walk_id": c["walk_id"].to_numpy(),
                                 "cur": c["cur"].to_numpy(),
                                 "n": n_, "tier": tier, "h": h})

        marked = c_by_prev.union(e2).groupby("key").map_groups(
            mark, batch_format="pandas")

        def reduce_walk(g: pd.DataFrame) -> pd.DataFrame:
            wid = int(g["walk_id"].iloc[0])
            cur = int(g["cur"].iloc[0])
            real = g[g["n"] >= 0]
            if len(real) == 0:       # sink: keep whole state
                prev_keep = state.loc[state.walk_id == wid, "prev"]
                return pd.DataFrame({"walk_id": [wid],
                                     "prev": prev_keep.to_numpy(np.int64),
                                     "v": [cur]})
            o = real.sort_values(["tier", "h", "n"]).iloc[0]
            return pd.DataFrame({"walk_id": [wid], "prev": [cur],
                                 "v": [int(o["n"])]})

        nxt = marked.groupby("walk_id").map_groups(
            reduce_walk, batch_format="pandas")
        state = nxt.to_pandas().sort_values("walk_id") \
            .reset_index(drop=True)
        rows.append(state[["walk_id", "v"]].assign(step=t))
    out = pd.concat(rows, ignore_index=True)[["walk_id", "step", "v"]]
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def walk_cooccurrence_pmi(edges_ds, seeds: list[int], steps: int,
                          window: int = 2, round_to: int = 6):
    """DeepWalk-style skip-gram statistics over the deterministic
    walks: unordered co-occurrence counts of vertices within `window`
    forward steps of the same walk (self-pairs excluded — parked sink
    walks would otherwise dominate), plus PMI against the unigram
    trajectory counts:

        pmi(u, v) = ln( (n_uv * U * U) / (c_u * c_v * T) )

    with U = total trajectory tokens and T = total pair count — every
    factor an exact int64, one double division, one libm log, so the
    SQL oracle is bit-identical before rounding.

    Shape: trajectories grouped by ONE coarse walk-bucket (a walk lives
    in one bucket; in-bucket vectorized offset alignment), pair counts
    summed by one coarse pair-bucket, unigram counts are map-side
    value_counts partials (trajectory-sized, same contract as the walk
    collection itself).  Returns a Dataset (u, v, n, pmi)."""
    import ray

    from ..io import from_pandas_clean
    from .triangles import n_buckets_for

    traj = deterministic_walks(edges_ds, seeds, steps).materialize()
    n_rows = traj.count()
    nb = n_buckets_for(n_rows)

    def tag(b: pa.Table) -> pa.Table:
        w = b["walk_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "wbk", pa.array((w % nb).astype(np.int64)))

    def pair_kern(g: pd.DataFrame) -> pd.DataFrame:
        w = g["walk_id"].to_numpy(np.int64)
        st = g["step"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((st, w))
        w, st, v = w[order], st[order], v[order]
        us, vs = [], []
        for o in range(1, window + 1):
            same = (w[o:] == w[:-o]) & (st[o:] == st[:-o] + o) \
                if len(w) > o else np.empty(0, bool)
            a, b = v[:-o][same], v[o:][same]
            ok = a != b
            a, b = a[ok], b[ok]
            us.append(np.minimum(a, b))
            vs.append(np.maximum(a, b))
        u = np.concatenate(us) if us else np.empty(0, np.int64)
        vv = np.concatenate(vs) if vs else np.empty(0, np.int64)
        out = pd.DataFrame({"u": u, "v": vv})
        return out.groupby(["u", "v"], sort=False).size() \
                  .rename("n").reset_index()

    parts = traj.map_batches(tag, batch_format="pyarrow") \
                .groupby("wbk").map_groups(pair_kern,
                                           batch_format="pandas")

    nb2 = n_buckets_for(n_rows)

    def tag_pair(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            pb = ((u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   + v.astype(np.uint64)) % np.uint64(nb2)) \
                .astype(np.int64)
        return b.append_column("pb", pa.array(pb))

    def sum_kern(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], sort=True)["n"].sum().reset_index()
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    pairs = parts.map_batches(tag_pair, batch_format="pyarrow") \
                 .groupby("pb").map_groups(sum_kern,
                                           batch_format="pandas") \
                 .materialize()

    def uni_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["v"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), return_counts=True)
        return pa.table({"v": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    uni = traj.map_batches(uni_partial, batch_format="pyarrow") \
              .to_pandas().groupby("v", sort=True)["c"].sum()
    total_t = int(pairs.sum("n") or 0)
    if total_t == 0:
        return from_pandas_clean(pd.DataFrame(
            {"u": pd.Series([], dtype=np.int64),
             "v": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64),
             "pmi": pd.Series([], dtype=np.float64)}))
    uref = ray.put((uni.index.to_numpy(np.int64),
                    uni.to_numpy(np.int64), int(n_rows), total_t))

    def finish(b: pa.Table) -> pa.Table:
        vs, cs, big_u, big_t = ray.get(uref)
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        cu = cs[np.searchsorted(vs, u)]
        cv = cs[np.searchsorted(vs, v)]
        pmi = np.log((n * big_u * big_u).astype(np.float64)
                     / (cu * cv * big_t))
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "pmi": pa.array(np.round(pmi, round_to))})

    return pairs.map_batches(finish, batch_format="pyarrow")

"""Minimum spanning forest via Boruvka rounds.

Reference parity note: GeminiGraph ships no MSF toolkit, but Boruvka is
the canonical "per-component min-reduce + contraction" pattern its
dual-mode `process_edges` engine targets (core/graph.hpp:1492) — each
round is one edge-cut min-reduce followed by a pointer-jumping
contraction, exactly the CC shape (toolkits/cc.cpp:22-109) with an
argmin payload instead of a min label.

Determinism: edges carry an INTEGER weight `w10` plus the canonical
(u < v) endpoint pair; all comparisons use the composite key
(w10, u, v), which is globally unique — so the MSF is unique and the
driver kernel, the distributed plan, and the unrolled SQL oracle agree
bit-for-bit (no float comparisons anywhere).

Scale plan (100 TB): the distributed path keeps every corpus-sized
structure a Dataset — the edge relabeling and pointer jumps go through
joins.attach_by_key (broadcast under ATTACH_BROADCAST_CAP, coarse
key-bucket co-group above) and the per-component argmin shuffles on
~rows/200k coarse hash buckets with a vectorized in-bucket kernel
(never a per-component Ray hash aggregate — see
algos/triangles.TARGET_ROWS_PER_BUCKET).  Components at least halve
per round, so O(log V) rounds; forest edges accumulate as per-round
Datasets (a parquet sink per round at real scale).  Below
MSF_DRIVER_CAP edges the whole contraction runs as one vectorized
numpy kernel on the driver (the usual size gate: a distributed round
costs ~2s of fixed shuffle overhead on Ray 2.49).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Below this many edges the driver kernel wins (same rationale as
# dedup.DRIVER_PAIR_CAP: each distributed round pays ~2s of fixed
# shuffle overhead; 5M-edge numpy Boruvka takes well under that).
MSF_DRIVER_CAP = 5_000_000

# Round / jump bounds shared with the SQL twin (_msf_sql): components
# at least halve per round and pointer jumping doubles reach, so 2^10
# covers every component the driver gate sees; the engine RAISES if
# unconverged (same convention as pipelines._check_unroll).
MSF_ROUNDS = 10
MSF_JUMPS = 12


class MSFUnconverged(RuntimeError):
    pass


def kruskal_msf_arrays(u, v, w10, n):
    """Independent test oracle: sequential Kruskal with the identical
    (w10, u, v) composite key and a plain union-find.  Deliberately a
    DIFFERENT algorithm from Boruvka so tests cross-check the result,
    not the implementation.  Driver-side and O(E log E) — tests only.
    """
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    w10 = np.asarray(w10, np.int64)
    order = np.lexsort((v, u, w10))
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = []
    for i in order:
        ru, rv = find(u[i]), find(v[i])
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            keep.append(i)
    keep = np.asarray(keep, np.int64)
    o = np.lexsort((v[keep], u[keep], w10[keep]))
    keep = keep[o]
    return u[keep], v[keep], w10[keep]


def _hook_parents(sel_c, sel_o):
    """Deterministic hooking: parent(c) = partner(c), except that in a
    mutual pair (partner(partner(c)) == c) the SMALLER id becomes the
    root.  With the unique composite key every cycle in the partner
    graph is a 2-cycle, so this yields a forest."""
    order = np.argsort(sel_c)
    sc, so = sel_c[order], sel_o[order]
    # partner-of-partner via searchsorted (every partner is itself a
    # selected comp: it shares the selected edge, so it has one too)
    pos = np.searchsorted(sc, so)
    pp = so[pos]
    parent = so.copy()
    root = (pp == sc) & (sc < so)
    parent[root] = sc[root]
    return sc, parent


def boruvka_msf_arrays(u, v, w10, n,
                       rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS):
    """Vectorized driver kernel: numpy Boruvka over (u, v, w10) with
    the composite (w10, u, v) key.  Returns forest (u, v, w10) sorted
    by that key."""
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    w10 = np.asarray(w10, np.int64)
    comp = np.arange(n, dtype=np.int64)
    fu, fv, fw = [], [], []
    for _ in range(rounds):
        cu, cv = comp[u], comp[v]
        live = cu != cv
        if not live.any():
            break
        lu, lv, lw = u[live], v[live], w10[live]
        c = np.concatenate([cu[live], cv[live]])
        o = np.concatenate([cv[live], cu[live]])
        eu = np.concatenate([lu, lu])
        ev = np.concatenate([lv, lv])
        ew = np.concatenate([lw, lw])
        first = np.lexsort((ev, eu, ew, c))
        cs = c[first]
        lead = np.concatenate([[True], cs[1:] != cs[:-1]])
        sel = first[lead]
        sel_c, sel_o = c[sel], o[sel]
        su, sv, sw = eu[sel], ev[sel], ew[sel]
        # forest edges, deduped (each is selected by up to two comps)
        ek = np.lexsort((sv, su))
        su, sv, sw = su[ek], sv[ek], sw[ek]
        uniq = np.concatenate([[True], (su[1:] != su[:-1])
                               | (sv[1:] != sv[:-1])])
        fu.append(su[uniq])
        fv.append(sv[uniq])
        fw.append(sw[uniq])
        sc, parent = _hook_parents(sel_c, sel_o)
        # pointer jumping to roots (parent table indexed by comp id)
        par = np.arange(n, dtype=np.int64)
        par[sc] = parent
        for _ in range(jumps):
            nxt = par[par]
            if np.array_equal(nxt, par):
                break
            par = nxt
        comp = par[comp]
    else:
        if (comp[u] != comp[v]).any():
            raise MSFUnconverged(
                f"boruvka_msf_arrays: live edges after {rounds} rounds")
    fu = np.concatenate(fu) if fu else np.empty(0, np.int64)
    fv = np.concatenate(fv) if fv else np.empty(0, np.int64)
    fw = np.concatenate(fw) if fw else np.empty(0, np.int64)
    o = np.lexsort((fv, fu, fw))
    return fu[o], fv[o], fw[o]


def _bucket_argmin(cand_ds, nb: int):
    """Per-component argmin of the composite key over a candidate
    Dataset (c, o, u, v, w10): coarse hash-bucket shuffle + one
    vectorized lexsort kernel per bucket."""
    def salt(b: pa.Table) -> pa.Table:
        k = b["c"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
        return b.append_column("kb", pa.array(
            (h % np.uint64(nb)).astype(np.int64)))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy()
        order = np.lexsort((g["v"].to_numpy(), g["u"].to_numpy(),
                            g["w10"].to_numpy(), c))
        cs = c[order]
        lead = np.concatenate([[True], cs[1:] != cs[:-1]])
        pick = order[lead]
        return pd.DataFrame({
            "c": c[pick],
            "o": g["o"].to_numpy()[pick],
            "u": g["u"].to_numpy()[pick],
            "v": g["v"].to_numpy()[pick],
            "w10": g["w10"].to_numpy()[pick]})

    return (cand_ds.map_batches(salt, batch_format="pyarrow")
            .groupby("kb").map_groups(kernel, batch_format="pandas"))


def boruvka_msf_ds(edges_ds, n,
                   rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS):
    """Distributed Boruvka: edges stay a Dataset throughout; per-round
    component relabels and pointer jumps go through the gated
    attach_by_key; the per-component argmin is a coarse-bucket shuffle.
    Returns a Dataset of forest edges (u, v, w10)."""
    import ray.data as rd

    from ..io import from_pandas_clean
    from ..joins import attach_by_key
    from ..runtime import tune_context
    from .triangles import n_buckets_for

    tune_context()

    def init(b: pa.Table) -> pa.Table:
        return pa.table({"u": b["u"], "v": b["v"], "w10": b["w10"],
                         "cu": b["u"], "cv": b["v"]})

    cur = edges_ds.map_batches(init, batch_format="pyarrow").materialize()
    forest = []
    for _ in range(rounds):
        live = cur.map_batches(
            lambda b: b.filter(
                b["cu"].to_numpy(zero_copy_only=False)
                != b["cv"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow").materialize()
        n_live = live.count()
        if n_live == 0:
            break

        def cand(b: pa.Table) -> pa.Table:
            cu = b["cu"].to_numpy(zero_copy_only=False)
            cv = b["cv"].to_numpy(zero_copy_only=False)
            u_ = b["u"].to_numpy(zero_copy_only=False)
            v_ = b["v"].to_numpy(zero_copy_only=False)
            w_ = b["w10"].to_numpy(zero_copy_only=False)
            return pa.table({
                "c": pa.array(np.concatenate([cu, cv])),
                "o": pa.array(np.concatenate([cv, cu])),
                "u": pa.array(np.concatenate([u_, u_])),
                "v": pa.array(np.concatenate([v_, v_])),
                "w10": pa.array(np.concatenate([w_, w_]))})

        sel = _bucket_argmin(
            live.map_batches(cand, batch_format="pyarrow"),
            n_buckets_for(2 * n_live)).materialize()

        # forest edges: dedup the (u, v) pair (selected by <= 2 comps)
        def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
            su = g["u"].to_numpy()
            sv = g["v"].to_numpy()
            o = np.lexsort((sv, su))
            su, sv = su[o], sv[o]
            lead = np.concatenate([[True], (su[1:] != su[:-1])
                                   | (sv[1:] != sv[:-1])])
            return pd.DataFrame({"u": su[lead], "v": sv[lead],
                                 "w10": g["w10"].to_numpy()[o][lead]})

        def pair_salt(b: pa.Table) -> pa.Table:
            su = b["u"].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                h = su.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                h ^= h >> np.uint64(31)
            nb = n_buckets_for(n_live)
            return pa.table({"u": b["u"], "v": b["v"], "w10": b["w10"],
                             "kb": (h % np.uint64(nb)).astype(np.int64)})

        forest.append(sel.map_batches(pair_salt, batch_format="pyarrow")
                      .groupby("kb")
                      .map_groups(pair_dedup, batch_format="pandas")
                      .materialize())

        # hooking: parent(c) = o, except mutual pairs root at min(c, o).
        # partner-of-partner via a self attach (every partner is
        # selected, so missing never fires — "self" keeps it total).
        pp = attach_by_key(
            sel.map_batches(lambda b: pa.table(
                {"c": b["c"], "o": b["o"]}), batch_format="pyarrow"),
            sel.map_batches(lambda b: pa.table(
                {"c": b["c"], "o2": b["o"]}), batch_format="pyarrow"),
            ["o"], key="c", value="o2", missing="self")

        def hook(b: pa.Table) -> pa.Table:
            c = b["c"].to_numpy(zero_copy_only=False)
            o = b["o"].to_numpy(zero_copy_only=False)
            ppv = b["o2_o"].to_numpy(zero_copy_only=False)
            p = o.copy()
            root = (ppv == c) & (c < o)
            p[root] = c[root]
            return pa.table({"c": pa.array(c), "p": pa.array(p)})

        par = pp.map_batches(hook, batch_format="pyarrow").materialize()

        # pointer jumping: p <- parent(p) (identity when absent), until
        # idempotent (doubling => <= log2(depth) iterations)
        for _ in range(jumps):
            nxt = attach_by_key(par, par, ["p"], key="c", value="p",
                                out_prefix="n", missing="self")

            def adv(b: pa.Table) -> pa.Table:
                return pa.table({"c": b["c"], "p": b["np_p"],
                                 "chg": pa.array(
                                     b["p"].to_numpy(zero_copy_only=False)
                                     != b["np_p"].to_numpy(
                                         zero_copy_only=False))})

            stepped = nxt.map_batches(adv,
                                      batch_format="pyarrow").materialize()
            changed = stepped.map_batches(
                lambda b: pa.table({"n": pa.array(
                    [int(b["chg"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64())}), batch_format="pyarrow").to_pandas()
            par = stepped.map_batches(
                lambda b: pa.table({"c": b["c"], "p": b["p"]}),
                batch_format="pyarrow").materialize()
            if int(changed["n"].sum()) == 0:
                break

        # relabel both comp columns on the live edge set
        relab = attach_by_key(live, par, ["cu", "cv"], key="c", value="p",
                              missing="self")
        cur = relab.map_batches(
            lambda b: pa.table({"u": b["u"], "v": b["v"], "w10": b["w10"],
                                "cu": b["p_cu"], "cv": b["p_cv"]}),
            batch_format="pyarrow").materialize()
    else:
        still = cur.map_batches(
            lambda b: pa.table({"n": pa.array([int(
                (b["cu"].to_numpy(zero_copy_only=False)
                 != b["cv"].to_numpy(zero_copy_only=False)).sum())],
                pa.int64())}), batch_format="pyarrow").to_pandas()
        if int(still["n"].sum()) > 0:
            raise MSFUnconverged(
                f"boruvka_msf_ds: live edges after {rounds} rounds")

    if not forest:
        return from_pandas_clean(pd.DataFrame(
            {"u": np.empty(0, np.int64), "v": np.empty(0, np.int64),
             "w10": np.empty(0, np.int64)}))
    out = forest[0]
    for f in forest[1:]:
        out = out.union(f)
    return out


def minimum_spanning_forest(edges_ds, n, driver_cap: int = None):
    """Size-gated MSF entry point: numpy Boruvka on the driver below
    MSF_DRIVER_CAP edges, the distributed Dataset plan above.  Returns
    a pandas frame (u, v, w10) sorted by (w10, u, v) either way."""
    cap = MSF_DRIVER_CAP if driver_cap is None else driver_cap
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        # empty Datasets lose their schema (io.py gotcha) — short-circuit
        return pd.DataFrame({"u": np.empty(0, np.int64),
                             "v": np.empty(0, np.int64),
                             "w10": np.empty(0, np.int64)})
    if n_edges <= cap:
        df = edges_ds.to_pandas()
        fu, fv, fw = boruvka_msf_arrays(
            df["u"].to_numpy(), df["v"].to_numpy(),
            df["w10"].to_numpy(), n)
        return pd.DataFrame({"u": fu, "v": fv, "w10": fw})
    df = boruvka_msf_ds(edges_ds, n).to_pandas()
    o = np.lexsort((df["v"].to_numpy(), df["u"].to_numpy(),
                    df["w10"].to_numpy()))
    return df.iloc[o].reset_index(drop=True)

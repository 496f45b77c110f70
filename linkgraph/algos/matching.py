"""Maximal matching via locally-dominant edges.

Reference parity note: GeminiGraph ships no matching toolkit, but the
locally-dominant-edge algorithm is the edge-centric sibling of its MIS
select/broadcast pattern (toolkits shape, core/graph.hpp:1492): each
round is one per-vertex min-reduce over live incident edges plus a
removal wave.  With DISTINCT edge priorities the fixpoint equals the
sequential greedy matching in priority order, which is what makes an
exact SQL oracle possible.

Priorities: pri(u, v) = splitmix-style 64-bit avalanche of
(u * 2^32 + v) — vectorized in numpy, reproduced bit-for-bit in DuckDB
UBIGINT/HUGEINT (the same mix already oracle-checked in the SimHash
pipeline; see pipelines._mulmod64_sql).  Ties are impossible in
practice but every comparison still uses the composite (pri, u, v).

Scale plan (100 TB): per-vertex argmin shuffles on ~rows/200k coarse
hash buckets with a vectorized in-bucket kernel; a dominant edge is
detected by the COUNT == 2 trick (an edge that wins the argmin at both
endpoints appears twice in the winner set), avoiding a join back to
the edge list; matched endpoints are removed via the gated
attach_by_key sentinel map.  Expected O(log E) rounds with hashed
priorities; the engine raises MatchingUnconverged past the shared
round bound instead of silently diverging from the fixed-round SQL.
Below MATCH_DRIVER_CAP edges the whole loop is one numpy kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MATCH_DRIVER_CAP = 5_000_000
MATCH_ROUNDS = 24


class MatchingUnconverged(RuntimeError):
    pass


def edge_priority(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """64-bit avalanche of (u * 2^32 + v); exact SQL twin in
    pipelines._matching_sql."""
    with np.errstate(over="ignore"):
        h = (np.asarray(u, np.int64).astype(np.uint64)
             * np.uint64(4294967296)
             + np.asarray(v, np.int64).astype(np.uint64))
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(32)
    return h


def greedy_matching_seq(u, v, n):
    """Independent test oracle: sequential greedy in (pri, u, v) order.
    O(E log E) single-threaded — tests only."""
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    pri = edge_priority(u, v)
    order = np.lexsort((v, u, pri))
    matched = np.zeros(n, bool)
    keep = []
    for i in order:
        if not matched[u[i]] and not matched[v[i]]:
            matched[u[i]] = matched[v[i]] = True
            keep.append(i)
    keep = np.asarray(keep, np.int64)
    o = np.lexsort((v[keep], u[keep]))
    return u[keep][o], v[keep][o]


def dominant_matching_arrays(u, v, n, rounds: int = MATCH_ROUNDS):
    """Vectorized driver kernel: locally-dominant rounds to fixpoint."""
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    pri = edge_priority(u, v)
    matched = np.zeros(n, bool)
    mu, mv = [], []
    idx = np.arange(len(u), dtype=np.int64)
    for _ in range(rounds):
        live = idx[~matched[u[idx]] & ~matched[v[idx]]]
        if len(live) == 0:
            break
        lu, lv, lp = u[live], v[live], pri[live]
        vert = np.concatenate([lu, lv])
        kp = np.concatenate([lp, lp])
        ku = np.concatenate([lu, lu])
        kv = np.concatenate([lv, lv])
        eid = np.concatenate([live, live])
        order = np.lexsort((kv, ku, kp, vert))
        vs = vert[order]
        lead = np.concatenate([[True], vs[1:] != vs[:-1]])
        winner = np.full(n, -1, np.int64)
        winner[vs[lead]] = eid[order][lead]
        dom = live[(winner[lu] == live) & (winner[lv] == live)]
        matched[u[dom]] = True
        matched[v[dom]] = True
        mu.append(u[dom])
        mv.append(v[dom])
        idx = live
    else:
        if (~matched[u[idx]] & ~matched[v[idx]]).any():
            raise MatchingUnconverged(
                f"dominant_matching_arrays: live edges after "
                f"{rounds} rounds")
    mu = np.concatenate(mu) if mu else np.empty(0, np.int64)
    mv = np.concatenate(mv) if mv else np.empty(0, np.int64)
    o = np.lexsort((mv, mu))
    return mu[o], mv[o]


def dominant_matching_ds(edges_ds, rounds: int = MATCH_ROUNDS):
    """Distributed locally-dominant matching over an (u, v) Dataset.
    Returns a Dataset of matched edges (u, v)."""
    from ..io import from_pandas_clean
    from ..joins import attach_by_key
    from ..runtime import tune_context
    from .triangles import n_buckets_for

    tune_context()

    def with_pri(b: pa.Table) -> pa.Table:
        pri = edge_priority(b["u"].to_numpy(zero_copy_only=False),
                            b["v"].to_numpy(zero_copy_only=False))
        return pa.table({"u": b["u"], "v": b["v"], "pri": pa.array(pri)})

    cur = edges_ds.map_batches(with_pri,
                               batch_format="pyarrow").materialize()
    matching = []
    for _ in range(rounds):
        n_live = cur.count()
        if n_live == 0:
            break
        nb = n_buckets_for(2 * n_live)

        def cand(b: pa.Table) -> pa.Table:
            u_ = b["u"].to_numpy(zero_copy_only=False)
            v_ = b["v"].to_numpy(zero_copy_only=False)
            p_ = b["pri"].to_numpy(zero_copy_only=False)
            vert = np.concatenate([u_, v_])
            with np.errstate(over="ignore"):
                h = vert.astype(np.uint64) \
                    * np.uint64(0x9E3779B97F4A7C15)
                h ^= h >> np.uint64(31)
            return pa.table({
                "vert": pa.array(vert),
                "pri": pa.array(np.concatenate([p_, p_])),
                "u": pa.array(np.concatenate([u_, u_])),
                "v": pa.array(np.concatenate([v_, v_])),
                "kb": pa.array((h % np.uint64(nb)).astype(np.int64))})

        def argmin(g: pd.DataFrame) -> pd.DataFrame:
            vert = g["vert"].to_numpy()
            order = np.lexsort((g["v"].to_numpy(), g["u"].to_numpy(),
                                g["pri"].to_numpy(), vert))
            vs = vert[order]
            lead = np.concatenate([[True], vs[1:] != vs[:-1]])
            pick = order[lead]
            return pd.DataFrame({"u": g["u"].to_numpy()[pick],
                                 "v": g["v"].to_numpy()[pick]})

        winners = (cur.map_batches(cand, batch_format="pyarrow")
                   .groupby("kb").map_groups(argmin,
                                             batch_format="pandas"))

        # dominant = wins at BOTH endpoints = appears twice
        def pair_salt(b: pa.Table) -> pa.Table:
            u_ = b["u"].to_numpy(zero_copy_only=False)
            v_ = b["v"].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                h = (u_.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)) ^ \
                    (v_.astype(np.uint64)
                     * np.uint64(0xC4CEB9FE1A85EC53))
                h ^= h >> np.uint64(31)
            return b.append_column("kb2", pa.array(
                (h % np.uint64(max(1, nb // 2))).astype(np.int64)))

        def twice(g: pd.DataFrame) -> pd.DataFrame:
            su = g["u"].to_numpy()
            sv = g["v"].to_numpy()
            o = np.lexsort((sv, su))
            su, sv = su[o], sv[o]
            lead = np.flatnonzero(np.concatenate(
                [[True], (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])]))
            cnt = np.diff(np.concatenate([lead, [len(su)]]))
            pick = lead[cnt == 2]
            return pd.DataFrame({"u": su[pick], "v": sv[pick]})

        dom = (winners.map_batches(pair_salt, batch_format="pyarrow")
               .groupby("kb2").map_groups(twice, batch_format="pandas")
               .materialize())
        if dom.count() == 0:
            # with live edges the globally-min edge is always dominant,
            # so an empty round indicates a kernel bug — fail loud
            # rather than return a silently non-maximal matching
            raise MatchingUnconverged(
                "dominant_matching_ds: empty dominant round with "
                f"{n_live} live edges")
        matching.append(dom)

        # remove matched endpoints: sentinel map vertex -> -1
        def as_map(b: pa.Table) -> pa.Table:
            vs_ = np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)])
            return pa.table({"k": pa.array(vs_),
                             "val": pa.array(np.full(len(vs_), -1,
                                                     np.int64))})

        mp = dom.map_batches(as_map, batch_format="pyarrow")
        flagged = attach_by_key(cur, mp, ["u", "v"], key="k",
                                value="val", missing="self")
        cur = flagged.map_batches(
            lambda b: pa.table(
                {"u": b["u"], "v": b["v"], "pri": b["pri"]}).filter(
                (b["val_u"].to_numpy(zero_copy_only=False)
                 != -1)
                & (b["val_v"].to_numpy(zero_copy_only=False) != -1)),
            batch_format="pyarrow").materialize()
    else:
        if cur.count() > 0:
            raise MatchingUnconverged(
                f"dominant_matching_ds: live edges after {rounds} rounds")

    if not matching:
        return from_pandas_clean(pd.DataFrame(
            {"u": np.empty(0, np.int64), "v": np.empty(0, np.int64)}))
    out = matching[0]
    for m in matching[1:]:
        out = out.union(m)
    return out


def maximal_matching(edges_ds, n, driver_cap: int = None):
    """Size-gated maximal matching: numpy kernel below MATCH_DRIVER_CAP
    edges, distributed Dataset plan above.  Returns pandas (u, v)
    sorted by (u, v)."""
    cap = MATCH_DRIVER_CAP if driver_cap is None else driver_cap
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"u": np.empty(0, np.int64),
                             "v": np.empty(0, np.int64)})
    if n_edges <= cap:
        df = edges_ds.to_pandas()
        mu, mv = dominant_matching_arrays(
            df["u"].to_numpy(), df["v"].to_numpy(), n)
        return pd.DataFrame({"u": mu, "v": mv})
    df = dominant_matching_ds(edges_ds).to_pandas()
    o = np.lexsort((df["v"].to_numpy(), df["u"].to_numpy()))
    return df.iloc[o].reset_index(drop=True)[["u", "v"]]

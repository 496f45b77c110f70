"""SCAN structural graph clustering (Xu et al., KDD 2007) — clusters,
hubs and outliers from structural similarity (coverage-widening; not in
the reference toolkit, but the same process_edges/per-vertex-reduction
shapes as core/graph.hpp:219-1866).

Structural similarity over CLOSED neighborhoods:

    sigma(u, v) = |N[u] & N[v]| / sqrt(|N[u]| * |N[v]|)

For an EDGE (u, v): |N[u] & N[v]| = supp(u, v) + 2 (the triangle
support plus the two endpoints) and |N[u]| = deg(u) + 1, so with a
RATIONAL threshold eps = p/q the similarity test is exact integer
arithmetic — no float sqrt anywhere:

    sigma >= eps  <=>  q^2 (supp+2)^2 >= p^2 (deg_u+1)(deg_v+1)

(int64-exact while deg < ~3e8: q^2 (d+1)^2 <= 100 * 9e16 < 2^63).

    core(u)      <=>  |N_eps[u]| = 1 + #similar-neighbors >= mu
    clusters      =   connected components over core—core similar edges
                      (labels = min core id, deterministic)
    border        =   non-core with a similar CORE neighbor (takes the
                      MIN cluster among them — deterministic tie rule)
    hub           =   unassigned vertex whose neighbors touch >= 2
                      distinct member clusters;  else outlier.

Physical plans (the size-gate convention of triangles.py):

  * driver kernel under DRIVER_TRI_CAP edges: _support_local support,
    bincount degrees/core counts, synchronous min-label CC rounds
    (counted, so the unrolled SQL oracle's round budget is checked);
  * distributed: ktruss._support_ds per-edge support, one pair-bucket
    co-group for the similarity filter, triangles._vertex_degrees for
    degrees / similar-neighbor counts, joins.attach_by_key gated
    lookups for flags and labels, and the SUPERSTEP ENGINE's connected
    components over the core—core similar subgraph.  The final
    (v, cluster, role) table is assembled as a per-batch map over the
    engine's |V|-sized state Dataset — never a driver-side |V| frame.

Both paths are tested equal (tests/test_scan.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ktruss import _support_local, _support_ds
from .triangles import DRIVER_TRI_CAP, _pair_bucket, _vertex_degrees, \
    n_buckets_for

EPS = (7, 10)   # eps = 0.7, exact rational
MU = 3
SCAN_CC_ROUNDS = 20

_I64MAX = np.iinfo(np.int64).max


def _similar_mask(supp: np.ndarray, du: np.ndarray, dv: np.ndarray,
                  eps: tuple[int, int]) -> np.ndarray:
    p_, q_ = int(eps[0]), int(eps[1])
    lhs = q_ * q_ * (supp.astype(np.int64) + 2) ** 2
    rhs = p_ * p_ * (du.astype(np.int64) + 1) * (dv.astype(np.int64) + 1)
    return lhs >= rhs


def _roles_frame(n: int, cluster: np.ndarray, core: np.ndarray,
                 border: np.ndarray, hub: np.ndarray) -> pd.DataFrame:
    role = np.where(core, "core",
                    np.where(border, "border",
                             np.where(hub, "hub", "outlier")))
    return pd.DataFrame({"v": np.arange(n, dtype=np.int64),
                         "cluster": cluster.astype(np.int64),
                         "role": role})


def _scan_local(pdf: pd.DataFrame, n_vertices: int,
                eps: tuple[int, int], mu: int):
    """Exact in-process SCAN; returns ((v, cluster, role) frame,
    {'n_steps': synchronous min-label CC rounds})."""
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    if len(lo) == 0:
        return (_roles_frame(n_vertices,
                             np.full(n_vertices, -1, np.int64),
                             np.zeros(n_vertices, bool),
                             np.zeros(n_vertices, bool),
                             np.zeros(n_vertices, bool)),
                {"n_steps": 0})
    keys = np.unique((lo << 32) | hi)
    lo, hi = (keys >> 32).astype(np.int64), \
        (keys & 0xFFFFFFFF).astype(np.int64)
    supp = _support_local(keys)
    deg = (np.bincount(lo, minlength=n_vertices)
           + np.bincount(hi, minlength=n_vertices)).astype(np.int64)
    sim = _similar_mask(supp, deg[lo], deg[hi], eps)
    slo, shi = lo[sim], hi[sim]
    nsim = (np.bincount(slo, minlength=n_vertices)
            + np.bincount(shi, minlength=n_vertices))
    core = (1 + nsim) >= mu

    # clusters: SYNCHRONOUS min-label rounds over core-core similar
    # edges (gather from the previous round's labels, like the engine
    # and the unrolled SQL oracle — the round count is comparable)
    cm = core[slo] & core[shi]
    es, ed = slo[cm], shi[cm]
    lab = np.arange(n_vertices, dtype=np.int64)
    steps = 0
    while True:
        steps += 1
        new = lab.copy()
        np.minimum.at(new, es, lab[ed])
        np.minimum.at(new, ed, lab[es])
        if np.array_equal(new, lab):
            break
        lab = new
        if steps > 10 * SCAN_CC_ROUNDS:     # livelock guard
            raise AssertionError("scan: CC failed to converge")
    cluster = np.full(n_vertices, -1, np.int64)
    cluster[core] = lab[core]

    # border: non-core endpoint of a similar edge whose OTHER endpoint
    # is core -> min cluster among those cores
    one = core[slo] ^ core[shi]
    bv = np.where(core[slo], shi, slo)[one]
    bc = cluster[np.where(core[slo], slo, shi)[one]]
    bmin = np.full(n_vertices, _I64MAX, np.int64)
    np.minimum.at(bmin, bv, bc)
    border = (~core) & (bmin < _I64MAX)
    cluster[border] = bmin[border]
    member = core | border

    # hub vs outlier: distinct member clusters among ALL neighbors
    uu, cc_ = [], []
    for a, b in ((lo, hi), (hi, lo)):
        m = (~member[a]) & member[b]
        uu.append(a[m])
        cc_.append(cluster[b[m]])
    uu = np.concatenate(uu) if uu else np.empty(0, np.int64)
    cc_ = np.concatenate(cc_) if cc_ else np.empty(0, np.int64)
    hub = np.zeros(n_vertices, bool)
    if len(uu):
        # cluster ids are member vertex ids in [0, n) — the composite
        # (v, cluster) key is collision-free
        pairs = np.unique(uu * np.int64(n_vertices) + cc_)
        pv = (pairs // np.int64(n_vertices)).astype(np.int64)
        cnt = np.bincount(pv, minlength=n_vertices)
        hub = cnt >= 2
    return (_roles_frame(n_vertices, cluster, core, border, hub),
            {"n_steps": steps})


def edge_support_deg_ds(edges_ds, n_edges: int, num_partitions: int):
    """Per-edge (src, dst, du, dv, supp) Dataset: degrees attach via
    the gated lookup join, triangle support left-joins in ONE
    pair-bucket co-group (absent pair -> support 0).  The shared base
    of the SCAN similarity filter and the edge-Jaccard report."""
    from ..joins import attach_by_key

    deg_ds = _vertex_degrees(edges_ds, n_edges)
    ed = attach_by_key(edges_ds, deg_ds, ["src", "dst"], "v", "degree")
    supp = _support_ds(edges_ds, num_partitions)
    nb = n_buckets_for(max(n_edges, 1))

    def tag_edge(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(s), "dst": pa.array(d),
            "du": b["degree_src"], "dv": b["degree_dst"],
            "cnt": pa.array(np.zeros(len(s), np.int64)),
            "t": pa.array(np.zeros(len(s), np.int8)),
            "pb": pa.array(_pair_bucket(s, d, nb))})

    def tag_supp(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(s), np.int64)
        return pa.table({
            "src": pa.array(s), "dst": pa.array(d),
            "du": pa.array(z), "dv": pa.array(z),
            "cnt": pa.array(b["support"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "t": pa.array(np.ones(len(s), np.int8)),
            "pb": pa.array(_pair_bucket(s, d, nb))})

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["t"].to_numpy(np.int8) == 0
        e = g.loc[is_e, ["src", "dst", "du", "dv"]]
        sp = g.loc[~is_e, ["src", "dst", "cnt"]]
        if len(e) == 0:
            return pd.DataFrame({"src": np.empty(0, np.int64),
                                 "dst": np.empty(0, np.int64),
                                 "du": np.empty(0, np.int64),
                                 "dv": np.empty(0, np.int64),
                                 "supp": np.empty(0, np.int64)})
        m = e.merge(sp, on=["src", "dst"], how="left")
        m["supp"] = m["cnt"].fillna(0).to_numpy(np.int64)
        return m[["src", "dst", "du", "dv", "supp"]] \
            .reset_index(drop=True)

    return (ed.map_batches(tag_edge, batch_format="pyarrow")
            .union(supp.map_batches(tag_supp, batch_format="pyarrow"))
            .groupby("pb").map_groups(bucket_merge,
                                      batch_format="pandas"))


def _similar_edges_ds(edges_ds, n_edges: int, eps: tuple[int, int],
                      num_partitions: int):
    """Distributed similar-edge filter over edge_support_deg_ds."""
    p_, q_ = int(eps[0]), int(eps[1])
    base = edge_support_deg_ds(edges_ds, n_edges, num_partitions)

    def sim_filter(b: pa.Table) -> pa.Table:
        keep = _similar_mask(
            b["supp"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["du"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dv"].to_numpy(zero_copy_only=False).astype(np.int64),
            (p_, q_))
        return pa.table({
            "src": pa.array(b["src"].to_numpy(zero_copy_only=False)
                            [keep]),
            "dst": pa.array(b["dst"].to_numpy(zero_copy_only=False)
                            [keep])})

    return base.map_batches(sim_filter, batch_format="pyarrow")


def _scan_ds(edges_ds, n_vertices: int, store_root: str,
             fingerprint: str | None, eps: tuple[int, int], mu: int,
             num_partitions: int):
    """Distributed SCAN; returns ((v, cluster, role) Dataset, engine
    CC report).  `edges_ds` should be materialized — it feeds three
    stages (degrees, support, the similarity probe)."""
    from ..graph import load_undirected, suggest_partitions
    from ..joins import attach_by_key
    from ..runtime import tune_context
    from .cc import connected_components

    tune_context()
    n_edges = edges_ds.count()
    sim = _similar_edges_ds(edges_ds, n_edges, eps,
                            num_partitions).materialize()
    n_sim = sim.count()

    # similar-neighbor counts -> core flags (1 + nsim >= mu)
    nsim_ds = _vertex_degrees(sim, max(n_sim, 1)) if n_sim else None
    thr = int(mu) - 1

    def core_rows(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = c >= thr
        return pa.table({"v": pa.array(v[k]),
                         "flag": pa.array(np.ones(int(k.sum()),
                                                  np.int64))})

    import ray.data as rd
    if nsim_ds is None:
        core_map = None
    else:
        core_map = nsim_ds.map_batches(core_rows,
                                       batch_format="pyarrow") \
                          .materialize()
        if core_map.count() == 0:
            core_map = None
    if core_map is None:
        # no cores at all: every vertex is an outlier (no members ->
        # no borders, no hubs)
        return rd.range(n_vertices).map_batches(
            lambda b: pa.table({
                "v": pa.array(b["id"].to_numpy(zero_copy_only=False)
                              .astype(np.int64)),
                "cluster": pa.array(np.full(b.num_rows, -1, np.int64)),
                "role": pa.array(np.full(b.num_rows, "outlier",
                                         object))}),
            batch_format="pyarrow"), {"n_steps": 0}
    simf = attach_by_key(sim, core_map, ["src", "dst"], "v", "flag",
                         missing="fill:0").materialize()

    def both_core(b: pa.Table) -> pa.Table:
        k = (b["flag_src"].to_numpy(zero_copy_only=False) == 1) \
            & (b["flag_dst"].to_numpy(zero_copy_only=False) == 1)
        return pa.table({
            "src": pa.array(b["src"].to_numpy(zero_copy_only=False)[k]),
            "dst": pa.array(b["dst"].to_numpy(zero_copy_only=False)[k])})

    cce = simf.map_batches(both_core, batch_format="pyarrow") \
        .materialize()
    n_cce = cce.count()

    if n_cce:
        eng = load_undirected(
            cce, n_vertices,
            suggest_partitions(2 * n_cce, num_partitions),
            store_root, fingerprint=fingerprint)
        rep = connected_components(eng)
        labels = eng.state_dataset(["label"]).materialize()
    else:
        # cores whose similar neighbors are all non-core: every core is
        # its own singleton cluster (label = self)
        rep = {"n_steps": 0}
        labels = rd.range(n_vertices).map_batches(
            lambda b: pa.table({
                "v": pa.array(b["id"].to_numpy(zero_copy_only=False)
                              .astype(np.int64)),
                "label": pa.array(b["id"].to_numpy(zero_copy_only=False)
                                  .astype(np.int64))}),
            batch_format="pyarrow").materialize()

    # cluster map for CORE vertices only: engine label == min core id
    # of the component (non-core vertices are isolated in cce)
    clmap = attach_by_key(core_map, labels, ["v"], "v", "label")

    def cl_rows(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["v"], "cluster": b["label_v"]})

    clmap = clmap.map_batches(cl_rows, batch_format="pyarrow") \
                 .materialize()

    # border candidates: one-core similar edges -> (border_v, cluster)
    vb = n_buckets_for(max(n_sim, 1))

    def one_core(b: pa.Table) -> pa.Table:
        fs = b["flag_src"].to_numpy(zero_copy_only=False) == 1
        fd = b["flag_dst"].to_numpy(zero_copy_only=False) == 1
        k = fs ^ fd
        s = b["src"].to_numpy(zero_copy_only=False)[k]
        d = b["dst"].to_numpy(zero_copy_only=False)[k]
        cs = fs[k]
        return pa.table({"bv": pa.array(np.where(cs, d, s)),
                         "cv": pa.array(np.where(cs, s, d))})

    bcand = simf.map_batches(one_core, batch_format="pyarrow") \
                .materialize()
    if bcand.count():
        bcand = attach_by_key(bcand, clmap, ["cv"], "v", "cluster")

        def bmin_partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "v": b["bv"].to_numpy(zero_copy_only=False),
                "c": b["cluster_cv"].to_numpy(zero_copy_only=False)})
            g = df.groupby("v", sort=False)["c"].min().reset_index()
            g["vb"] = g["v"].to_numpy(np.int64) % vb
            return pa.Table.from_pandas(g, preserve_index=False)

        def bmin_merge(g: pd.DataFrame) -> pd.DataFrame:
            r = g.groupby("v", sort=False)["c"].min().reset_index()
            return r.rename(columns={"c": "cluster"})

        border_map = bcand.map_batches(bmin_partial,
                                       batch_format="pyarrow") \
            .groupby("vb").map_groups(bmin_merge,
                                      batch_format="pandas") \
            .materialize()
    else:
        border_map = rd.from_arrow(pa.table(
            {"v": pa.array([], pa.int64()),
             "cluster": pa.array([], pa.int64())}))

    member_map = clmap.union(border_map).materialize()

    # hub counts: neighbors' member clusters, distinct per vertex
    adj = edges_ds.map_batches(
        lambda b: pa.table({
            "u": pa.array(np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])
                .astype(np.int64)),
            "nbr": pa.array(np.concatenate([
                b["dst"].to_numpy(zero_copy_only=False),
                b["src"].to_numpy(zero_copy_only=False)])
                .astype(np.int64))}),
        batch_format="pyarrow")
    adjc = attach_by_key(adj, member_map, ["nbr"], "v", "cluster",
                         missing="fill:-1")
    hb = n_buckets_for(max(2 * n_edges, 1))

    def hub_partial(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        c = b["cluster_nbr"].to_numpy(zero_copy_only=False)
        k = c >= 0
        df = pd.DataFrame({"u": u[k], "c": c[k]}).drop_duplicates()
        df["ub"] = df["u"].to_numpy(np.int64) % hb
        return pa.Table.from_pandas(df, preserve_index=False)

    def hub_merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["u", "c"]].drop_duplicates()
        r = d.groupby("u", sort=False).size().reset_index(name="hc")
        return r.rename(columns={"u": "v"})

    hub_map = adjc.map_batches(hub_partial, batch_format="pyarrow") \
        .groupby("ub").map_groups(hub_merge, batch_format="pandas") \
        .materialize()

    # assemble per-vertex result as a map over the |V|-sized label ds
    base = labels
    base = attach_by_key(base, core_map, ["v"], "v", "flag",
                         missing="fill:0", out_prefix="c_")
    base = attach_by_key(base, border_map, ["v"], "v", "cluster",
                         missing="fill:-1", out_prefix="b_")
    base = attach_by_key(base, hub_map, ["v"], "v", "hc",
                         missing="fill:0", out_prefix="h_")

    def fin(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_core = b["c_flag_v"].to_numpy(zero_copy_only=False) == 1
        bcl = b["b_cluster_v"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hc = b["h_hc_v"].to_numpy(zero_copy_only=False)
        cluster = np.where(is_core, lab, bcl)
        is_border = (~is_core) & (bcl >= 0)
        hub = (~is_core) & (~is_border) & (hc >= 2)
        role = np.where(is_core, "core",
                        np.where(is_border, "border",
                                 np.where(hub, "hub", "outlier")))
        return pa.table({"v": pa.array(v),
                         "cluster": pa.array(cluster),
                         "role": pa.array(role)})

    return base.map_batches(fin, batch_format="pyarrow"), rep


def scan_roles(edges_ds, n_vertices: int, store_root: str | None = None,
               fingerprint: str | None = None,
               eps: tuple[int, int] = EPS, mu: int = MU,
               num_partitions: int = 8,
               force_distributed: bool = False):
    """SCAN over canonical (src < dst, deduped) undirected edges.
    Returns ((v, cluster, role), report) — a pandas frame from the
    driver kernel under DRIVER_TRI_CAP edges, a Dataset from the
    distributed plan.  `report['n_steps']` is the CC round count for
    the query's oracle-unroll check."""
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_TRI_CAP and not force_distributed:
        return _scan_local(edges_ds.to_pandas(), n_vertices, eps, mu)
    if store_root is None:
        raise ValueError("distributed scan needs a store_root")
    return _scan_ds(edges_ds, n_vertices, store_root, fingerprint,
                    eps, mu, num_partitions)


def edge_jaccard_hist(edges_ds, n_vertices: int,
                      num_partitions: int = 8,
                      force_distributed: bool = False) -> pd.DataFrame:
    """Histogram of per-edge neighborhood Jaccard similarity
    jac = supp / (du + dv - supp) over OPEN neighborhoods, rounded to 6
    decimals (single float division — IEEE-identical in numpy and the
    SQL twin; no .5 ties are reachable at 6 decimals for small-integer
    ratios).  Returns (jac, n_edges) sorted by jac.

    Driver kernel under DRIVER_TRI_CAP; distributed: one pass over
    edge_support_deg_ds with bounded-domain rounded-value partials +
    driver fold."""
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_TRI_CAP and not force_distributed:
        pdf = edges_ds.to_pandas()
        s = pdf["src"].to_numpy(np.int64)
        d = pdf["dst"].to_numpy(np.int64)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        keys = np.unique((lo << 32) | hi)
        lo = (keys >> 32).astype(np.int64)
        hi = (keys & 0xFFFFFFFF).astype(np.int64)
        supp = _support_local(keys)
        deg = (np.bincount(lo, minlength=n_vertices)
               + np.bincount(hi, minlength=n_vertices))
        denom = deg[lo] + deg[hi] - supp
        jac = np.round(supp / denom, 6)
        u, c = np.unique(jac, return_counts=True)
        return pd.DataFrame({"jac": u,
                             "n_edges": c.astype(np.int64)})

    base = edge_support_deg_ds(edges_ds, n_edges, num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        supp = b["supp"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        du = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = np.round(supp / (du + dv - supp), 6)
        u, c = np.unique(jac, return_counts=True)
        return pa.table({"jac": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    parts = base.map_batches(partial, batch_format="pyarrow") \
                .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"jac": pd.Series([], dtype=np.float64),
                             "n_edges": pd.Series([], dtype=np.int64)})
    out = parts.groupby("jac", sort=True)["n"].sum().reset_index()
    return pd.DataFrame({"jac": out["jac"].to_numpy(np.float64),
                         "n_edges": out["n"].to_numpy(np.int64)})


def local_bridges(edges_ds, n_vertices: int,
                  num_partitions: int = 8,
                  force_distributed: bool = False) -> pd.DataFrame:
    """Local bridges: edges whose endpoints share NO common neighbor
    (support 0) — removing one lengthens the endpoint distance to > 2
    (Easley-Kleinberg 'local bridge'; the weak-tie structural role).
    Same size-gated plan as edge_jaccard_hist: driver support kernel
    under DRIVER_TRI_CAP, else one pass over the shared
    edge_support_deg_ds.  Returns (src, dst) canonical rows."""
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_TRI_CAP and not force_distributed:
        pdf = edges_ds.to_pandas()
        s = pdf["src"].to_numpy(np.int64)
        d = pdf["dst"].to_numpy(np.int64)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        keys = np.unique((lo << 32) | hi)
        supp = _support_local(keys)
        z = supp == 0
        return pd.DataFrame({
            "src": (keys[z] >> 32).astype(np.int64),
            "dst": (keys[z] & 0xFFFFFFFF).astype(np.int64)}) \
            .sort_values(["src", "dst"]).reset_index(drop=True)

    base = edge_support_deg_ds(edges_ds, n_edges, num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        supp = b["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = supp == 0
        return pa.table({"src": pa.array(s[z]), "dst": pa.array(d[z])})

    out = base.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    return out.sort_values(["src", "dst"]).reset_index(drop=True)

"""Driver-facing pipelines over the testdata tables + their DuckDB
oracle SQL (the correctness gate surface of __ray_entry__.py).

The documents link graph: vertices are doc_ids; star edges (to the
min-doc_id representative, SURVEY.md §7.5.3 skew rule) within groups
sharing
    L: lang:source        (community key)
    W: first word of text (cross-cutting key -> triangles)
    S: sha256(text)       (content key; the north-star sha edge rule)
union'd and dedup'd; rep = min id, so every edge is canonical src < dst.

Every query function has a matching SQL string in ORACLE_SQL built from
the same derivation; iterative algorithms (PageRank/CC/LP/BFS/SSSP) get
exact SQL oracles by UNROLLING a fixed number of rounds into chained
CTEs — valid because the engine's early-stop happens only at a fixpoint,
where extra SQL rounds are no-ops.  Float columns are rounded on BOTH
sides so associativity-order ulps cannot break the driver's value-hash.
"""

from __future__ import annotations

from .io import read_parquet_clean

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import ann as _ANN
from .ann import vec_matrix
from . import relational as _REL
from .dedup import PAR_WORDS as _PAR_WORDS
from .dedup import PPJOIN_TAU as _PPJOIN_TAU
from . import windows as _WM
from .algos import matching as _MATCH
from .algos import msf as _MSF
from . import sketch as _SK
from . import multimodal as _MM

PR_ITERS = 20
CC_ROUNDS = 20
LP_ROUNDS = 10
BFS_ROUNDS = 20
SSSP_ROUNDS = 25
HITS_ITERS = 5
PPR_ITERS = 15
PPR_SOURCES = [0]
# k=2 on the star-derived doc graph: the 2-core (cycle-bearing part) is
# nontrivial at every sf; the 3-core is empty (stars are trees)
KCORE_K = 2
KCORE_ROUNDS = 30
TOP_TOKENS_K = 50
QUOTA_N = 5
WALK_SEEDS = [0, 1, 2, 3, 4, 5]
WALK_STEPS = 8
AA_TOPK = 20
# stratified sampling rates per lang (default covers the rest)
STRAT_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}
STRAT_DEFAULT = 0.3
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
from . import sampling as _SAMP  # noqa: E402 (SQL literals)
from .sampling import MIX_ALPHA as _MIX_ALPHA  # noqa: E402 (SQL literal)
ANN_K = 5
ANN_LSH_PLANES = 6
EMB_DUP_TAU = 0.4
from .dedup import SEMDEDUP_TAU  # noqa: E402 (SQL literal)


# ------------------------------------------------------------ edge builder

def _arr(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _doc_keys(b: pa.Table) -> pa.Table:
    """Emit (gkey, vid) rows: the three sharing keys per document."""
    vid = _arr(pc.cast(b["doc_id"], pa.int64()))
    n = b.num_rows
    lkey = pc.binary_join_element_wise(
        pa.array(["L"] * n), b["lang"], pa.array([":"] * n), b["source"], "")
    first = pc.list_element(pc.split_pattern(b["text"], " "), 0)
    wkey = pc.binary_join_element_wise(pa.array(["W"] * n), first, "")
    shas = [hashlib.sha256((t or "").encode()).hexdigest()
            for t in b["text"].to_pylist()]
    skey = pc.binary_join_element_wise(
        pa.array(["S"] * n), pa.array(shas, pa.string()), "")
    return pa.table({
        "gkey": pa.concat_arrays([_arr(lkey), _arr(wkey), _arr(skey)]),
        "vid": pa.concat_arrays([vid] * 3),
    })


_DOC_KEYS_SQL = """
    SELECT doc_id, 'L' || lang || ':' || source AS gkey FROM documents
    UNION ALL
    SELECT doc_id, 'W' || split_part(text, ' ', 1) AS gkey FROM documents
    UNION ALL
    SELECT doc_id, 'S' || sha256(text) AS gkey FROM documents
"""

DOC_EDGES_SQL = f"""
    WITH k AS ({_DOC_KEYS_SQL}),
    g AS (SELECT gkey, min(doc_id) AS rep FROM k GROUP BY gkey)
    SELECT DISTINCT g.rep AS src, k.doc_id AS dst
    FROM k JOIN g USING (gkey) WHERE k.doc_id <> g.rep
"""

# symmetric closure of the canonical edges (for degree/CC/LP)
DOC_SYM_SQL = f"""
    WITH ce AS ({DOC_EDGES_SQL})
    SELECT src, dst FROM ce UNION ALL SELECT dst AS src, src AS dst FROM ce
"""

# cycle-augmented edges for SCC: the canonical star edges are a DAG by
# construction (src = min doc_id of the key group < dst), so SCC over
# them is trivially all singletons; adding the reverse edge on a
# deterministic third of the pairs creates 2-cycles and longer mixed
# cycles (~60% of vertices land in nontrivial SCCs at sf0.01)
SCC_EDGES_SQL = f"""
    WITH ce AS ({DOC_EDGES_SQL})
    SELECT src, dst FROM ce
    UNION ALL
    SELECT dst AS src, src AS dst FROM ce WHERE (src + dst) % 3 = 0
"""


def documents_edges(sf_dir: str, num_partitions: int = 8):
    """The derived (src, dst) edge Dataset, canonical src < dst, deduped.

    Materialized once per sf_dir (small result reused by many queries —
    degree/triangles/graph builds would otherwise re-run the derivation).
    """
    key = ("edges", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    import ray.data as rd

    from .edges import dedup_edges, derive_star_edges

    from .edges import EDGE_DRIVER_DEDUP_CAP
    from .io import from_pandas_clean

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang", "source"])
    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(os.path.join(
        sf_dir, "documents.parquet")).metadata.num_rows  # no scan
    keyed = docs.map_batches(_doc_keys, batch_format="pyarrow")
    if 3 * n_docs <= EDGE_DRIVER_DEDUP_CAP:
        # gated single-pass plan: ONE distributed execution collects the
        # (gkey, vid) pairs (3 rows/doc), then rep-min, star emission and
        # dedup run in one pandas kernel — the multi-stage plan below
        # pays ~0.3-0.5s of fixed executor latency per stage, which
        # dominates at cached-engine sizes (bench sf_queries stage)
        pdf = keyed.to_pandas()
        rep = pdf.groupby("gkey", sort=False)["vid"].transform("min")
        vid = pdf["vid"].to_numpy()
        repv = rep.to_numpy()
        keep = vid != repv
        epdf = pd.DataFrame({"src": repv[keep], "dst": vid[keep]}) \
            .drop_duplicates(["src", "dst"]).reset_index(drop=True)
        edges = from_pandas_clean(epdf).repartition(
            max(2, min(8, len(epdf) // 50_000 + 2))).materialize()
    else:
        stars = derive_star_edges(keyed, "gkey", id_col="vid",
                                  num_partitions=num_partitions,
                                  approx_rows=3 * n_docs).materialize()
        edges = dedup_edges(stars).materialize()
    _CACHE[key] = edges
    return edges


def documents_n_vertices(sf_dir: str) -> int:
    """max(doc_id) + 1 via parquet row-group STATISTICS (no scan, no Ray
    execution); falls back to a distributed max when stats are absent."""
    import pyarrow.parquet as _pq

    path = os.path.join(sf_dir, "documents.parquet")
    md = _pq.ParquetFile(path).metadata
    idx = next((i for i in range(md.num_columns)
                if md.schema.column(i).name == "doc_id"), None)
    if idx is not None:
        maxes = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                maxes = None
                break
            maxes.append(st.max)
        if maxes:
            return int(max(maxes)) + 1
    docs = read_parquet_clean(path, columns=["doc_id"])
    return int(docs.max("doc_id")) + 1


# --------------------------------------------------------- engine caching

_CACHE: dict = {}


def _store_root(sf_dir: str, kind: str) -> str:
    tag = hashlib.sha256(f"{os.path.abspath(sf_dir)}:{kind}".encode()) \
                 .hexdigest()[:12]
    return f"/tmp/linkgraph_stores/{tag}"


def _input_fingerprint(sf_dir: str) -> str:
    """Cheap input identity for store reuse: documents.parquet mtime+size
    (regenerated testdata at the same path then forces a rebuild)."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    return f"{st.st_mtime_ns}:{st.st_size}"


def documents_engine(sf_dir: str, kind: str = "directed",
                     num_partitions: int = 4):
    """Cached GraphEngine on the documents graph (one load, many runs —
    mirroring the reference's load-once/compute-6x lifecycle)."""
    from .graph import load_directed, load_undirected

    key = (os.path.abspath(sf_dir), kind)
    if key in _CACHE:
        return _CACHE[key]
    edges = documents_edges(sf_dir)
    n = documents_n_vertices(sf_dir)
    store = _store_root(sf_dir, kind)
    fp = _input_fingerprint(sf_dir)
    if kind == "directed":
        eng = load_directed(edges, n, num_partitions, store, fingerprint=fp)
    elif kind == "weighted":
        w = edges.map_batches(_add_weight, batch_format="pyarrow")
        eng = load_directed(w, n, num_partitions, store, weighted=True,
                            fingerprint=fp)
    elif kind == "scc":
        aug = edges.map_batches(_aug_cycles, batch_format="pyarrow")
        eng = load_directed(aug, n, num_partitions, store, fingerprint=fp)
    else:
        eng = load_undirected(edges, n, num_partitions, store, fingerprint=fp)
    _CACHE[key] = eng
    return eng


def _aug_cycles(b: pa.Table) -> pa.Table:
    """Add the reverse edge where (src+dst)%3==0 (SCC_EDGES_SQL twin).
    Canonical edges have src < dst, so no reverse edge duplicates an
    existing one."""
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    m = (s + d) % 3 == 0
    return pa.table({"src": pa.array(np.concatenate([s, d[m]])),
                     "dst": pa.array(np.concatenate([d, s[m]]))})


def _add_weight(b: pa.Table) -> pa.Table:
    """Deterministic synthetic edge weight: 1 + ((src+dst) % 7)/10."""
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    w = 1.0 + ((s + d) % 7) / 10.0
    return b.append_column("weight", pa.array(w, pa.float64()))


_WEIGHT_SQL = "1.0 + ((src + dst) % 7) / 10.0"


# ------------------------------------------------------------ graph queries

def q_doc_edges(sf_dir):
    return documents_edges(sf_dir)


def q_doc_degree(sf_dir):
    from .edges import degree_table, symmetrize

    return degree_table(symmetrize(documents_edges(sf_dir)), "src") \
        .map_batches(lambda b: pa.table({"v": b["v"], "degree": b["degree"]}),
                     batch_format="pyarrow")


def _moment_sums(x: np.ndarray, y: np.ndarray) -> pa.Table:
    """One-row partial of the five assortativity moment sums (+ count);
    exact int64, so the driver combine has no summation-order exposure."""
    return pa.table({
        "m": pa.array([len(x)], pa.int64()),
        "sx": pa.array([int(x.sum())], pa.int64()),
        "sy": pa.array([int(y.sum())], pa.int64()),
        "sxy": pa.array([int((x * y).sum())], pa.int64()),
        "sxx": pa.array([int((x * x).sum())], pa.int64()),
        "syy": pa.array([int((y * y).sum())], pa.int64()),
    })


def q_doc_assortativity(sf_dir):
    """Degree assortativity coefficient of the symmetrized doc graph
    (Newman's Pearson correlation of endpoint degrees over directed
    edge ends).  The five moment sums are exact int64 (degrees are
    ints), so the final float formula is bit-identical between engine
    and SQL — no summation-order exposure at all.  Partial sums are
    map-side per batch, one tiny driver combine.

    SIZE-GATED degree attach (VERDICT r2 #3, same rule as
    triangles.BROADCAST_DEG_CAP): below the cap the degree table is
    ray.put once and looked up per batch; above it two hash joins
    attach endpoint degrees before the same map-side partials."""
    import ray

    from .algos.triangles import BROADCAST_DEG_CAP
    from .edges import degree_table, symmetrize

    from .runtime import counted

    sym = symmetrize(documents_edges(sf_dir)).materialize()
    deg_ds, n_deg = counted(degree_table(sym, "src"))
    if n_deg <= BROADCAST_DEG_CAP:
        deg = deg_ds.to_pandas()
        vs = deg["v"].to_numpy()
        order = np.argsort(vs)
        dref = ray.put((vs[order], deg["degree"].to_numpy()[order]))

        def partial(b: pa.Table) -> pa.Table:
            v, d = ray.get(dref)
            x = d[np.searchsorted(
                v, b["src"].to_numpy(zero_copy_only=False))]
            y = d[np.searchsorted(
                v, b["dst"].to_numpy(zero_copy_only=False))]
            return _moment_sums(x, y)

        parts = sym.map_batches(partial, batch_format="pyarrow")
    else:
        from .dedup import _join_parts

        # deg_ds already materialized by counted(); feeds both join sides
        sdeg = deg_ds.map_batches(
            lambda b: pa.table({"src": b["v"], "src_deg": b["degree"]}),
            batch_format="pyarrow")
        ddeg = deg_ds.map_batches(
            lambda b: pa.table({"dst": b["v"], "dst_deg": b["degree"]}),
            batch_format="pyarrow")
        parts_n = _join_parts(sym.count())
        j = sym.join(sdeg, join_type="inner", num_partitions=parts_n,
                     on=("src",))
        j = j.join(ddeg, join_type="inner", num_partitions=parts_n,
                   on=("dst",))
        parts = j.map_batches(
            lambda b: _moment_sums(
                b["src_deg"].to_numpy(zero_copy_only=False),
                b["dst_deg"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow")
    p = parts.to_pandas().sum()
    m = float(p["m"])
    cov = p["sxy"] / m - (p["sx"] / m) * (p["sy"] / m)
    vx = p["sxx"] / m - (p["sx"] / m) ** 2
    vy = p["syy"] / m - (p["sy"] / m) ** 2
    r = cov / np.sqrt(vx * vy)
    return pd.DataFrame({"assortativity": [round(float(r), 6)]})


def q_doc_top_degree(sf_dir):
    """Distributed top-k: each block emits its local top-10 (vectorized
    lexsort), the driver reduces <= 10*n_blocks rows — never |V| rows on
    the driver (ann.py partial/reduce pattern, VERDICT r1 #2)."""
    ds = q_doc_degree(sf_dir)

    def local_top(b: pa.Table) -> pa.Table:
        deg = b["degree"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((v, -deg))[:10]
        return pa.table({"v": pa.array(v[sel]),
                         "degree": pa.array(deg[sel])})

    parts = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    pdf = parts.sort_values(["degree", "v"], ascending=[False, True],
                            kind="mergesort").head(10)
    return pdf.reset_index(drop=True)


def q_doc_group_sizes(sf_dir):
    import ray.data as rd

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "source"])

    def key(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"k": pc.binary_join_element_wise(
            b["lang"], pa.array([":"] * n), b["source"], "")})

    return docs.map_batches(key, batch_format="pyarrow").groupby("k").count() \
        .map_batches(lambda b: pa.table(
            {"k": b["k"], "n_docs": pc.cast(b["count()"], pa.int64())}),
            batch_format="pyarrow")


def q_doc_edge_count(sf_dir):
    return pd.DataFrame({"n_edges": [int(documents_edges(sf_dir).count())]})


def _msf_weight(b: pa.Table) -> pa.Table:
    """Integer composite weight for the MSF: w10 = 10 + (src+dst) % 7 —
    the same deterministic synthetic weight as _add_weight x10, kept
    integral so every comparison is exact (algos/msf.py docstring)."""
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    return pa.table({"u": b["src"], "v": b["dst"],
                     "w10": pa.array(10 + (s + d) % 7)})


def q_doc_msf(sf_dir):
    """Minimum spanning forest (deterministic Boruvka, algos/msf.py)
    over the weighted documents graph: per-component argmin of the
    exact composite key (w10, u, v) + pointer-jump contraction per
    round; size-gated driver kernel vs distributed Dataset plan
    (paths asserted equal in tests/test_msf.py)."""
    from .algos.msf import minimum_spanning_forest

    edges = documents_edges(sf_dir)
    n = documents_n_vertices(sf_dir)
    w = edges.map_batches(_msf_weight, batch_format="pyarrow")
    out = minimum_spanning_forest(w, n)
    return pd.DataFrame({
        "src": out["u"].to_numpy(np.int64),
        "dst": out["v"].to_numpy(np.int64),
        "weight": np.round(out["w10"].to_numpy(np.int64) / 10.0, 6)})


def q_doc_matching(sf_dir):
    """Maximal matching (algos/matching.py, locally-dominant edges =
    sequential greedy in avalanche-priority order): per-vertex argmin
    rounds, count==2 dominance, size-gated driver kernel vs distributed
    plan (paths asserted equal in tests/test_matching.py)."""
    from .algos.matching import maximal_matching

    edges = documents_edges(sf_dir)
    n = documents_n_vertices(sf_dir)
    w = edges.map_batches(
        lambda b: pa.table({"u": b["src"], "v": b["dst"]}),
        batch_format="pyarrow")
    out = maximal_matching(w, n)
    return pd.DataFrame({"src": out["u"].to_numpy(np.int64),
                         "dst": out["v"].to_numpy(np.int64)})


def q_doc_triangles(sf_dir):
    from .algos import triangle_count

    return pd.DataFrame(
        {"n_triangles": [int(triangle_count(documents_edges(sf_dir)))]})


def q_doc_clustering(sf_dir):
    """Per-vertex local clustering coefficient (doc_id, clustering)."""
    from .algos.triangles import clustering_coefficients

    return clustering_coefficients(documents_edges(sf_dir))


def documents_clique_edges(sf_dir: str):
    """Denser derived graph for motif counting: the CLIQUE_GROUP_CAP
    smallest docs of each sharing-key group form a clique (the star
    edges are too sparse for higher-order motifs — zero 4-cliques at
    both test sfs).  Canonical deduped (src < dst); cached per sf_dir
    like documents_edges."""
    key = ("clique_edges", os.path.abspath(sf_dir))
    if key in _CACHE:
        return _CACHE[key]
    from .algos.triangles import canon_dedup_ds
    from .edges import derive_clique_edges

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text", "lang",
                                       "source"])
    keyed = docs.map_batches(_doc_keys, batch_format="pyarrow")
    pairs = derive_clique_edges(keyed, "gkey", id_col="vid").materialize()
    out = canon_dedup_ds(pairs, pairs.count()).materialize()
    _CACHE[key] = out
    return out


def q_doc_4cliques(sf_dir):
    """Exact 4-clique count (motif counting, algos.triangles.
    four_clique_count — kClist one level above triangles) over the
    co-key clique graph."""
    from .algos.triangles import four_clique_count

    return pd.DataFrame(
        {"n_4cliques": [int(four_clique_count(
            documents_clique_edges(sf_dir)))]})


NS_SEEDS = (0, 1, 2, 3, 4)
NS_FANOUTS = (3, 2)


def _sym_batch(b: pa.Table) -> pa.Table:
    """Both directions of a canonical edge batch (symmetric closure)."""
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    return pa.table({"src": pa.array(np.concatenate([s, d])),
                     "dst": pa.array(np.concatenate([d, s]))})


def q_doc_neighbor_sample(sf_dir):
    """GraphSAGE-style deterministic 2-hop neighbor sampling from fixed
    seeds on the symmetric doc graph (hop, src, dst)."""
    from .neighbors import sample_neighbors

    edges = documents_edges(sf_dir).map_batches(_sym_batch,
                                                batch_format="pyarrow")
    return sample_neighbors(edges, NS_SEEDS, NS_FANOUTS)


def q_doc_sage(sf_dir):
    """GraphSAGE mean aggregator over the symmetric doc graph: each
    vertex's component-wise mean of its neighbors' embedding vectors
    (vec_id == doc_id in the testdata), long form (v, i, mean_x)."""
    from .neighbors import mean_neighbor_features

    edges = documents_edges(sf_dir).map_batches(_sym_batch,
                                                batch_format="pyarrow")
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    return mean_neighbor_features(edges, emb)


def _state_result(eng, col, out_col, round_to=None):
    """Vertex state as a DATASET (v, out_col) — |V|-sized results stay
    off the driver (VERDICT r2 #7); one block per shard, zero-copy."""
    ds = eng.state_dataset([col])

    def fin(b: pa.Table) -> pa.Table:
        x = b[col]
        if round_to is not None:
            x = pc.round(x, ndigits=round_to)
        return pa.table({"v": b["v"], out_col: x})

    return ds.map_batches(fin, batch_format="pyarrow")


def q_doc_pagerank(sf_dir):
    from .algos import pagerank

    eng = documents_engine(sf_dir, "directed")
    pagerank(eng, iterations=PR_ITERS)
    return _state_result(eng, "rank", "rank", round_to=6)


WARM_ITERS = 5


def q_doc_pagerank_warm(sf_dir):
    """Incremental PageRank: converge on the base graph, then resume
    from the raw ranks on the cycle-AUGMENTED graph (the
    'a batch of new links landed' recompute) for 5 supersteps instead
    of restarting from rank 1 (algos/pagerank.WarmPageRankProgram —
    ranks broadcast once; a same-layout engine would use the
    checkpoint dump/restore lane instead).  Oracle: _pagerank_warm_sql
    — base chain + warm chain over the augmented edges."""
    import ray

    from .algos import pagerank, pagerank_warm

    eng = documents_engine(sf_dir, "directed")
    pagerank(eng, iterations=PR_ITERS)
    sp = eng.state_pandas(["rank"])
    n = documents_n_vertices(sf_dir)
    arr = np.zeros(n, np.float64)
    arr[sp["v"].to_numpy(np.int64)] = sp["rank"].to_numpy(np.float64)
    ref = ray.put(arr)
    aug = documents_engine(sf_dir, "scc")
    pagerank_warm(aug, ref, iterations=WARM_ITERS)
    return _state_result(aug, "rank", "rank", round_to=6)


def q_doc_pagerank_iter1(sf_dir):
    from .algos import pagerank

    eng = documents_engine(sf_dir, "directed")
    pagerank(eng, iterations=1)
    return _state_result(eng, "rank", "rank", round_to=9)


def _check_unroll(report: dict, rounds: int, name: str):
    """The SQL oracles unroll a FIXED round count; engine early-stop at a
    fixpoint makes extra SQL rounds no-ops, but an engine that needed
    MORE steps than the unroll means the oracle (not the engine) is
    unconverged — surface that as a loud error instead of a silent
    driver-gate hash mismatch."""
    if report["n_steps"] > rounds:
        raise AssertionError(
            f"{name}: engine took {report['n_steps']} supersteps but the "
            f"SQL oracle unrolls only {rounds} rounds — raise the unroll")


def q_doc_cc(sf_dir):
    from .algos import connected_components

    eng = documents_engine(sf_dir, "undirected")
    rep = connected_components(eng)
    _check_unroll(rep, CC_ROUNDS, "doc_cc")
    return _state_result(eng, "label", "label")


COMP_TOP_K = 10
LABEL_BROADCAST_CAP = 5_000_000


def q_doc_component_stats(sf_dir):
    """Top-10 connected components by size: (label, n_vertices,
    n_edges) — the CC labels join back onto the canonical edge list
    (every edge is intra-component, so grouping by the src's label is
    exact).  Label table broadcasts under LABEL_BROADCAST_CAP, else a
    coarse v-bucket lookup join; counts merge in one label-bucket
    shuffle + partial top-k."""
    import ray

    from .algos import connected_components
    from .algos.triangles import n_buckets_for

    eng = documents_engine(sf_dir, "undirected")
    rep = connected_components(eng)
    _check_unroll(rep, CC_ROUNDS, "doc_component_stats")
    labels = _state_result(eng, "label", "label").materialize()
    edges = documents_edges(sf_dir)
    nv = labels.count()
    nb = n_buckets_for(2 * nv)

    def count_tbl(lab: np.ndarray, col: str) -> pa.Table:
        u, c = np.unique(lab, return_counts=True)
        other = "ec" if col == "vc" else "vc"
        z = np.zeros(len(u), np.int64)
        cols = {"label": pa.array(u, pa.int64()),
                col: pa.array(c.astype(np.int64)), other: pa.array(z),
                "lb": pa.array((u % nb).astype(np.int64))}
        return pa.table({k: cols[k] for k in ("label", "vc", "ec", "lb")})

    def vpart(b: pa.Table) -> pa.Table:
        return count_tbl(b["label"].to_numpy(zero_copy_only=False)
                         .astype(np.int64), "vc")

    if nv <= LABEL_BROADCAST_CAP:
        vs, ls = [], []
        for t in labels.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            vs.append(t["v"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
            ls.append(t["label"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        la = np.concatenate(ls) if ls else np.empty(0, np.int64)
        o = np.argsort(v)
        lref = ray.put((v[o], la[o]))

        def epart(b: pa.Table) -> pa.Table:
            v_, l_ = ray.get(lref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = l_[np.searchsorted(v_, s)]  # every src is labeled
            return count_tbl(lab, "ec")

        eparts = edges.map_batches(epart, batch_format="pyarrow")
    else:
        vb = n_buckets_for(nv)

        def tag_edge(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"v": pa.array(s),
                             "label": pa.array(np.full(len(s), -1,
                                                       np.int64)),
                             "jb": pa.array((s % vb).astype(np.int64))})

        def tag_lab(b: pa.Table) -> pa.Table:
            vv = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"v": pa.array(vv), "label": b["label"],
                             "jb": pa.array((vv % vb).astype(np.int64))})

        def bucket_lookup(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["label"].to_numpy(np.int64)
            vv = g["v"].to_numpy(np.int64)
            is_l = lab >= 0
            lv, ll = vv[is_l], lab[is_l]
            o = np.argsort(lv)
            lv, ll = lv[o], ll[o]
            ev = vv[~is_l]
            if len(ev) == 0 or len(lv) == 0:
                return count_tbl(np.empty(0, np.int64), "ec").to_pandas()
            got = ll[np.searchsorted(lv, ev)]
            return count_tbl(got, "ec").to_pandas()

        both = edges.map_batches(tag_edge, batch_format="pyarrow").union(
            labels.map_batches(tag_lab, batch_format="pyarrow"))
        eparts = both.groupby("jb").map_groups(
            bucket_lookup, batch_format="pandas") \
            .map_batches(lambda b: b, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["label"].to_numpy(np.int64),
                           return_inverse=True)
        vc = np.bincount(inv, weights=g["vc"].to_numpy(np.float64),
                         minlength=len(u)).astype(np.int64)
        ec = np.bincount(inv, weights=g["ec"].to_numpy(np.float64),
                         minlength=len(u)).astype(np.int64)
        out = pd.DataFrame({"label": u, "n_vertices": vc, "n_edges": ec})
        return out.sort_values(["n_vertices", "label"],
                               ascending=[False, True],
                               kind="mergesort").head(COMP_TOP_K)

    both_counts = labels.map_batches(vpart, batch_format="pyarrow") \
        .union(eparts)
    parts = both_counts.groupby("lb").map_groups(
        merge, batch_format="pandas").to_pandas()
    return parts.sort_values(["n_vertices", "label"],
                             ascending=[False, True],
                             kind="mergesort").head(COMP_TOP_K) \
        .reset_index(drop=True)


def q_doc_labelprop(sf_dir):
    from .algos import label_propagation

    eng = documents_engine(sf_dir, "undirected")
    label_propagation(eng, max_iters=LP_ROUNDS)
    return _state_result(eng, "label", "label")


def q_doc_modularity(sf_dir):
    """Newman modularity of the label-propagation communities over the
    undirected doc graph: Q = A/m - B/(4 m^2) with A = intra-community
    edge count, B = sum over communities of (degree sum)^2, m = |E| —
    all-integer aggregates, ONE float expression at the end (identical
    on both sides, no association risk)."""
    from .algos import label_propagation
    from .algos.triangles import _vertex_degrees, n_buckets_for
    from .joins import attach_by_key

    eng = documents_engine(sf_dir, "undirected")
    label_propagation(eng, max_iters=LP_ROUNDS)
    labels = _state_result(eng, "label", "label").materialize()
    edges = documents_edges(sf_dir).materialize()
    m = edges.count()
    if m == 0:
        return pd.DataFrame({"modularity": [0.0]})
    nv = labels.count()

    # labels attach through the gated lookup join (broadcast under
    # joins.ATTACH_BROADCAST_CAP, coarse bucket co-group above)
    lab_edges = attach_by_key(edges, labels, ["src", "dst"],
                              key="v", value="label")

    def intra(b: pa.Table) -> pa.Table:
        a = int(pc.sum(pc.cast(pc.equal(b["label_src"], b["label_dst"]),
                               pa.int64())).as_py() or 0)
        return pa.table({"a": pa.array([a], pa.int64())})

    a_total = int(lab_edges.map_batches(intra, batch_format="pyarrow")
                  .sum("a") or 0)

    nb = n_buckets_for(2 * nv)
    degrees = attach_by_key(_vertex_degrees(edges, m), labels, ["v"],
                            key="v", value="label")

    def dpart(b: pa.Table) -> pa.Table:
        dg = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(lab, return_inverse=True)
        ds_ = np.bincount(inv, weights=dg.astype(np.float64),
                          minlength=len(u)).astype(np.int64)
        return pa.table({"label": pa.array(u, pa.int64()),
                         "d": pa.array(ds_),
                         "lb": pa.array((u % nb).astype(np.int64))})

    def dmerge(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["label"].to_numpy(np.int64),
                           return_inverse=True)
        dsum = np.bincount(inv, weights=g["d"].to_numpy(np.float64),
                           minlength=len(u)).astype(np.int64)
        return pd.DataFrame({"b": [int((dsum.astype(object) ** 2).sum())]})

    b_total = int(degrees.map_batches(dpart, batch_format="pyarrow")
                  .groupby("lb").map_groups(dmerge, batch_format="pandas")
                  .to_pandas()["b"].sum())
    q = a_total / m - b_total / (4.0 * m * m)
    return pd.DataFrame({"m": [int(m)], "intra": [a_total],
                         "deg_sq_sum": [b_total],
                         "modularity": [round(q, 9)]})


def q_doc_louvain(sf_dir):
    """One synchronous Louvain local-move round from singleton
    communities (algos.louvain): all-integer gain score 2m - k_v*k_u,
    argmax per vertex with smallest-neighbor tie-break — the
    community-detection move rule the exact SQL oracle replays with a
    window argmax."""
    from .algos.louvain import louvain_local_move

    return louvain_local_move(documents_edges(sf_dir))


def _leiden_refined(sf_dir):
    """(louv_ds, refl_ds): Leiden-style refinement of the Louvain
    local-move partition — split every community into the connected
    components of its induced subgraph (the Leiden well-connectedness
    guarantee, Traag et al. 2019, arXiv:1810.08473; communities from a
    local-move round may be internally disconnected, and splitting a
    disconnected community can only raise modularity: intra edges are
    preserved, sum-of-degree-squares shrinks).

    louv_ds = (v, comm, gain_num); refl_ds = (v, comm, rcomm) with
    rcomm = min vertex id of v's intra-community component.  The
    component pass reuses the superstep engine (min-label CC) over the
    intra-community edge subset — no new machinery.  Cached per sf_dir
    (both doc_leiden queries read it)."""
    from .algos import connected_components
    from .algos.louvain import louvain_local_move
    from .graph import load_undirected
    from .joins import attach_by_key

    key = (os.path.abspath(sf_dir), "leiden")
    if key in _CACHE:
        return _CACHE[key]
    edges = documents_edges(sf_dir)   # cached, materialized
    m = edges.count()
    louv = louvain_local_move(edges, m).materialize()
    comm_edges = attach_by_key(edges, louv.select_columns(["v", "comm"]),
                               ["src", "dst"], key="v", value="comm")
    from .runtime import counted

    intra, n_intra = counted(comm_edges.map_batches(
        lambda b: pa.table(
            {"src": b["src"], "dst": b["dst"]}).filter(
                pc.equal(b["comm_src"], b["comm_dst"])),
        batch_format="pyarrow"))
    if n_intra == 0:
        # a one-round move partition with no triangles has NO internal
        # edges — every refined community is a singleton (and the empty
        # edge set would crash the store build: repo empty-schema gotcha)
        refl = louv.map_batches(lambda b: pa.table(
            {"v": b["v"], "comm": b["comm"], "rcomm": b["v"]}),
            batch_format="pyarrow").materialize()
        _CACHE[key] = (louv, refl)
        return louv, refl
    n = documents_n_vertices(sf_dir)
    store = _store_root(sf_dir, "leiden-intra")
    eng = load_undirected(intra, n, 4, store,
                          fingerprint=_input_fingerprint(sf_dir))
    rep = connected_components(eng)
    _check_unroll(rep, CC_ROUNDS, "doc_leiden")
    rcomm = _state_result(eng, "label", "rcomm")
    refl = attach_by_key(louv.select_columns(["v", "comm"]), rcomm,
                         ["v"], key="v", value="rcomm") \
        .map_batches(lambda b: pa.table(
            {"v": b["v"], "comm": b["comm"], "rcomm": b["rcomm_v"]}),
            batch_format="pyarrow").materialize()
    _CACHE[key] = (louv, refl)
    return louv, refl


def q_doc_leiden(sf_dir):
    """Leiden-style refined communities: (v, comm, rcomm) — Louvain
    local-move community plus the refined (connected) community, per
    non-isolated vertex.  Oracle: _leiden_ctes (Louvain argmax +
    unrolled min-label CC over the intra-community subgraph)."""
    return _leiden_refined(sf_dir)[1]


def q_doc_leiden_modularity(sf_dir):
    """Modularity before/after the Leiden refinement pass — the
    improvement certificate (q_refined >= q_louvain always: intra
    edges preserved, degree-square sum can only shrink).  All-integer
    aggregates, ONE float expression per Q at the end (the
    doc_modularity convention)."""
    from .algos.triangles import _vertex_degrees, n_buckets_for
    from .joins import attach_by_key

    _, refl = _leiden_refined(sf_dir)
    edges = documents_edges(sf_dir)
    m = int(edges.count())
    if m == 0:
        return pd.DataFrame({"m": [0], "intra": [0],
                             "deg_sq_louvain": [0],
                             "deg_sq_refined": [0],
                             "q_louvain": [0.0], "q_refined": [0.0],
                             "improved": [0]})

    lab_edges = attach_by_key(edges, refl.select_columns(["v", "comm"]),
                              ["src", "dst"], key="v", value="comm")

    def intra_part(b: pa.Table) -> pa.Table:
        a = int(pc.sum(pc.cast(pc.equal(b["comm_src"], b["comm_dst"]),
                               pa.int64())).as_py() or 0)
        return pa.table({"a": pa.array([a], pa.int64())})

    # refinement never cuts an intra edge (its endpoints are connected
    # through it), so ONE intra count serves both partitions
    a_total = int(lab_edges.map_batches(intra_part,
                                        batch_format="pyarrow")
                  .sum("a") or 0)

    nv = refl.count()
    nb = n_buckets_for(2 * nv)
    degrees = attach_by_key(_vertex_degrees(edges, m), refl, ["v"],
                            key="v", value="comm") \
        .map_batches(lambda b: b, batch_format="pyarrow")
    deg2 = attach_by_key(_vertex_degrees(edges, m),
                         refl.select_columns(["v", "rcomm"]), ["v"],
                         key="v", value="rcomm")

    def dsq(label_col):
        def dpart(b: pa.Table) -> pa.Table:
            dg = b["degree"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            lab = b[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            u, inv = np.unique(lab, return_inverse=True)
            ds_ = np.bincount(inv, weights=dg.astype(np.float64),
                              minlength=len(u)).astype(np.int64)
            return pa.table({"label": pa.array(u, pa.int64()),
                             "d": pa.array(ds_),
                             "lb": pa.array((u % nb).astype(np.int64))})

        def dmerge(g: pd.DataFrame) -> pd.DataFrame:
            u, inv = np.unique(g["label"].to_numpy(np.int64),
                               return_inverse=True)
            dsum = np.bincount(inv, weights=g["d"].to_numpy(np.float64),
                               minlength=len(u)).astype(np.int64)
            return pd.DataFrame(
                {"b": [int((dsum.astype(object) ** 2).sum())]})

        return dpart, dmerge

    dp1, dm1 = dsq("comm_v")
    b_l = int(degrees.map_batches(dp1, batch_format="pyarrow")
              .groupby("lb").map_groups(dm1, batch_format="pandas")
              .to_pandas()["b"].sum())
    dp2, dm2 = dsq("rcomm_v")
    b_r = int(deg2.map_batches(dp2, batch_format="pyarrow")
              .groupby("lb").map_groups(dm2, batch_format="pandas")
              .to_pandas()["b"].sum())
    q_l = a_total / m - b_l / (4.0 * m * m)
    q_r = a_total / m - b_r / (4.0 * m * m)
    return pd.DataFrame({
        "m": np.array([m], np.int64),
        "intra": np.array([a_total], np.int64),
        "deg_sq_louvain": np.array([b_l], np.int64),
        "deg_sq_refined": np.array([b_r], np.int64),
        "q_louvain": [round(q_l, 9)], "q_refined": [round(q_r, 9)],
        "improved": np.array([int(q_r >= q_l)], np.int64)})


def q_doc_bfs(sf_dir):
    from .algos import bfs

    eng = documents_engine(sf_dir, "directed")
    rep = bfs(eng, root=0)
    _check_unroll(rep, BFS_ROUNDS, "doc_bfs")
    n = eng.meta["n_vertices"]
    return _state_result(eng, "parent", "parent").map_batches(
        lambda b: b.filter(pc.less(b["parent"], n)),
        batch_format="pyarrow")


def q_doc_bc(sf_dir):
    """Betweenness from root 0; finite dependencies of reached vertices.
    Oracle: _bc_sql unrolled Brandes (BFS levels + sigma + backward delta)."""
    from .algos import betweenness

    eng = documents_engine(sf_dir, "directed")
    rep = betweenness(eng, root=0)
    _check_unroll(rep["forward"], BFS_ROUNDS, "doc_bc")

    def fin(b: pa.Table) -> pa.Table:
        keep = np.isfinite(
            b["dependencies"].to_numpy(zero_copy_only=False))
        t = b.filter(pa.array(keep))
        return pa.table({"v": t["v"],
                         "dependencies": pc.round(t["dependencies"],
                                                  ndigits=6),
                         "num_paths": t["num_paths"]})

    return eng.state_dataset(["dependencies", "num_paths"]).map_batches(
        fin, batch_format="pyarrow")


BC_SAMPLE_ROOTS = [0, 1, 2]


def q_doc_bc_sampled(sf_dir):
    """Sampled betweenness (algos/bc.betweenness_sampled): Brandes from
    3 roots, per-vertex dependencies accumulated in engine state (never
    |V| rows per root on the driver).  Oracle: _bc_sampled_sql — one
    prefixed unrolled chain per root, summed in root order."""
    from .algos.bc import betweenness_sampled

    eng = documents_engine(sf_dir, "directed")
    reports = betweenness_sampled(eng, BC_SAMPLE_ROOTS)
    for r, rep in zip(BC_SAMPLE_ROOTS, reports):
        _check_unroll(rep["forward"], BFS_ROUNDS, f"doc_bc_sampled {r}")
    return _state_result(eng, "bc", "bc", round_to=6)


def q_doc_sssp(sf_dir):
    from .algos import sssp
    from .algos.sssp import INF_DIST

    eng = documents_engine(sf_dir, "weighted")
    rep = sssp(eng, root=0)
    _check_unroll(rep, SSSP_ROUNDS, "doc_sssp")

    def fin(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b["distance"], INF_DIST))
        return pa.table({"v": t["v"],
                         "distance": pc.round(t["distance"], ndigits=9)})

    return eng.state_dataset(["distance"]).map_batches(
        fin, batch_format="pyarrow")


def q_doc_widest(sf_dir):
    """Widest path (maximin bottleneck capacity) from doc 0 over the
    weighted graph — the max-min semiring counterpart of doc_sssp
    (algos/widest.py).  min/max of the exact synthetic weights has no
    float addition, so the match is bit-exact; round(9) kept for the
    repo convention.  Oracle: _widest_sql unrolled relaxation."""
    from .algos.widest import INF_CAP, widest_path

    eng = documents_engine(sf_dir, "weighted")
    rep = widest_path(eng, root=0)
    _check_unroll(rep, SSSP_ROUNDS, "doc_widest")

    def fin(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["capacity"], 0.0))
        return pa.table({"v": t["v"],
                         "capacity": pc.round(t["capacity"], ndigits=9)})

    return eng.state_dataset(["capacity"]).map_batches(
        fin, batch_format="pyarrow")


def q_doc_wpagerank(sf_dir):
    """Edge-weighted PageRank (algos/pagerank.WeightedPageRankProgram)
    on the weighted doc graph: rank flows proportionally to the
    deterministic synthetic weights (_add_weight).  Oracle:
    _wpagerank_sql unrolled with the same weight expression."""
    from .algos.pagerank import weighted_pagerank

    eng = documents_engine(sf_dir, "weighted")
    weighted_pagerank(eng, iterations=PR_ITERS)
    return _state_result(eng, "rank", "rank", round_to=6)


def q_doc_hits(sf_dir):
    """HITS hubs/authorities, 5 sweeps; L1-normalized float64 scores
    (per-iteration normalization is a pure rescale of the linear
    recurrence — see algos/hits.py).  Oracle: _hits_sql unrolled CTEs."""
    from .algos import hits, normalized_scores

    eng = documents_engine(sf_dir, "directed")
    hits(eng, iterations=HITS_ITERS)
    sa, sh = normalized_scores(eng)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "auth": pc.round(pc.divide(b["auth"], sa), ndigits=6),
            "hub": pc.round(pc.divide(b["hub"], sh), ndigits=6)})

    return eng.state_dataset(["auth", "hub"]).map_batches(
        fin, batch_format="pyarrow")


SALSA_ITERS = 5


def q_doc_salsa(sf_dir):
    """SALSA hubs/authorities (algos/salsa.py), 5 sweeps: the HITS
    transpose sandwich with degree-normalized (random-walk) hops —
    auth from hub/out_deg over in-edges, hub from auth/in_deg over
    out-edges.  Linear recurrence, so scores stay unnormalized through
    the iterations; one driver-side L1 normalization at the end
    (normalized_scores reads the same auth/hub state columns).
    Oracle: _salsa_sql unrolled CTEs with the same degree divisors."""
    from .algos import normalized_scores, salsa

    eng = documents_engine(sf_dir, "directed")
    salsa(eng, iterations=SALSA_ITERS)
    sa, sh = normalized_scores(eng)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "auth": pc.round(pc.divide(b["auth"], sa), ndigits=6),
            "hub": pc.round(pc.divide(b["hub"], sh), ndigits=6)})

    return eng.state_dataset(["auth", "hub"]).map_batches(
        fin, batch_format="pyarrow")


EIGEN_ITERS = 8


def q_doc_eigen(sf_dir):
    """Eigenvector centrality, 8 power-method supersteps on the
    undirected graph; unnormalized linear recurrence, one driver-side
    L1 normalization at the end (the HITS convention — algos/eigen.py).
    Oracle: _eigen_sql unrolled CTEs over the symmetric edge list."""
    from .algos import eigen_l1, eigenvector_centrality

    eng = documents_engine(sf_dir, "undirected")
    eigenvector_centrality(eng, iterations=EIGEN_ITERS)
    s = eigen_l1(eng)

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "eigen": pc.round(pc.divide(b["eigen"], s), ndigits=6)})

    return eng.state_dataset(["eigen"]).map_batches(
        fin, batch_format="pyarrow")


WL_ROUNDS = 3


def q_doc_wl(sf_dir):
    """Weisfeiler-Lehman color refinement (1-WL, 3 rounds) on the
    undirected graph: per-round exact distinct-color counts.  The
    multiset digest is an order-insensitive mod-2^64 sum of murmur-mixed
    neighbor labels, so one WL round is ONE deterministic add-combine
    superstep (algos/wl.py); colors are counted with a coarse
    label-bucket kernel, never a fine-key aggregate.  Oracle: _wl_sql —
    the identical xor/mulmod64 chains unrolled per round in UBIGINT."""
    from .algos.wl import wl_color_counts, wl_refine

    eng = documents_engine(sf_dir, "undirected")
    wl_refine(eng, rounds=WL_ROUNDS)
    n = documents_n_vertices(sf_dir)
    return wl_color_counts(eng, rounds=WL_ROUNDS, n_vertices=n)


def q_doc_ppr(sf_dir):
    """Personalized PageRank from doc 0 (Gemini rank conventions, teleport
    restricted to the source set).  Oracle: _ppr_sql unrolled CTEs."""
    from .algos import personalized_pagerank

    eng = documents_engine(sf_dir, "directed")
    personalized_pagerank(eng, sources=PPR_SOURCES, iterations=PPR_ITERS)
    return _state_result(eng, "rank", "rank", round_to=9)


SUBGRAPH_LANG = "en"


CUT_PARTS = 8


def q_doc_partition_cut(sf_dir):
    """Partition edge-cut diagnostic: the fraction of edges crossing
    partitions under contiguous range assignment (v*P//n — the locality
    the engine's degree-balanced ranges inherit) vs splitmix64 hash
    assignment (mix(v)%P — the shuffle-join default) at P=8.  Pure
    map-side integer partials; the 100-TB placement-quality probe."""
    n = documents_n_vertices(sf_dir)

    def part(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)

        def mix(x):
            h = x.astype(np.uint64)
            with np.errstate(over="ignore"):
                h ^= h >> np.uint64(33)
                h *= np.uint64(0xFF51AFD7ED558CCD)
                h ^= h >> np.uint64(29)
                h *= np.uint64(0xC4CEB9FE1A85EC53)
                h ^= h >> np.uint64(32)
            return h

        cut_r = int(((s * CUT_PARTS) // n != (d * CUT_PARTS) // n).sum())
        cut_h = int((mix(s) % np.uint64(CUT_PARTS)
                     != mix(d) % np.uint64(CUT_PARTS)).sum())
        return pa.table({"n_edges": pa.array([len(s)], pa.int64()),
                         "cut_range": pa.array([cut_r], pa.int64()),
                         "cut_hash": pa.array([cut_h], pa.int64())})

    parts = documents_edges(sf_dir).map_batches(
        part, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_edges": [int(parts["n_edges"].sum())],
        "cut_range": [int(parts["cut_range"].sum())],
        "cut_hash": [int(parts["cut_hash"].sum())]}).astype(np.int64)


def q_doc_subgraph_pagerank(sf_dir):
    """PageRank on the induced subgraph of one language's documents
    (edges.induced_edges: two size-gated semi-joins keep edges with
    BOTH endpoints in the slice; original ids preserved — isolated
    out-of-slice vertices cannot affect kept results under the Gemini
    recurrence, so only kept rows are emitted).  The run-on-a-slice
    primitive.  Oracle: _pagerank_sql_over the filtered edge set and
    the kept vertex set."""
    from .algos import pagerank
    from .edges import induced_edges
    from .graph import load_directed

    key = (os.path.abspath(sf_dir), f"sub_{SUBGRAPH_LANG}")
    if key not in _CACHE:
        keep = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang"]).filter(
            expr=f"lang == '{SUBGRAPH_LANG}'").select_columns(["doc_id"])
        keep = keep.materialize()
        sub = induced_edges(documents_edges(sf_dir), keep)
        _CACHE[key] = (load_directed(
            sub, documents_n_vertices(sf_dir), 4,
            _store_root(sf_dir, f"sub_{SUBGRAPH_LANG}"),
            fingerprint=_input_fingerprint(sf_dir)), keep)
    eng, keep = _CACHE[key]
    pagerank(eng, iterations=PR_ITERS)
    from .joins import semi_join

    state = eng.state_dataset(["rank"]).map_batches(
        lambda b: pa.table({"v": b["v"],
                            "rank": pc.round(b["rank"], ndigits=6)}),
        batch_format="pyarrow")
    kv = keep.map_batches(lambda b: pa.table({"v": b["doc_id"]}),
                          batch_format="pyarrow")
    return semi_join(state, kv, "v")


TRUST_SOURCES = [0, 7, 21, 42]  # the deterministic "trusted page" seeds


def q_doc_pagerank_deltas(sf_dir):
    """PageRank convergence curve: the engine's per-superstep delta
    reducer (Gemini's |new-old|-weighted formula, pagerank.cpp:89-98)
    for all 20 iterations — run observability as an oracle-checked
    query.  The out-degree weights cancel against the pre-divide, so
    the SQL twin differences the unrolled raw ranks directly."""
    from .algos import pagerank

    eng = documents_engine(sf_dir, "directed")
    rep = pagerank(eng, iterations=PR_ITERS)
    return pd.DataFrame({
        "step": np.arange(1, rep["n_steps"] + 1, dtype=np.int64),
        "delta": [round(s["reducers"]["delta"], 9)
                  for s in rep["steps"]]})


def q_doc_trustrank(sf_dir):
    """TrustRank (Gyöngyi et al. 2004): personalized PageRank seeded by
    a trusted whitelist, teleport mass split uniformly over the seeds —
    the classic link-spam-demotion score.  The uniform seed weights are
    a pure rescale of the PPR linear recurrence, so the engine runs
    PPRProgram and divides by |seeds| once at the end; oracle: _ppr_sql
    over the seed set with the same final division."""
    from .algos import personalized_pagerank

    eng = documents_engine(sf_dir, "directed")
    personalized_pagerank(eng, sources=TRUST_SOURCES,
                          iterations=PPR_ITERS)
    n_seeds = float(len(TRUST_SOURCES))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"],
            "trust": pc.round(pc.divide(b["rank"], n_seeds), ndigits=9)})

    return eng.state_dataset(["rank"]).map_batches(
        fin, batch_format="pyarrow")


def q_doc_kcore(sf_dir):
    """Vertices of the 2-core of the symmetrized doc graph (synchronous
    peeling, algos/kcore.py).  Oracle: _kcore_sql unrolled alive-set
    recurrence."""
    from .algos import kcore

    eng = documents_engine(sf_dir, "undirected")
    rep = kcore(eng, k=KCORE_K)
    _check_unroll(rep, KCORE_ROUNDS, "doc_kcore")
    return _state_result(eng, "in_core", "in_core").map_batches(
        lambda b: b.filter(pc.equal(b["in_core"], 1)).select(["v"]),
        batch_format="pyarrow")


MIS_ROUNDS = 8  # unrolled select+broadcast pairs in the SQL oracle
COLORING_ROUNDS = 12      # unrolled JP rounds in the SQL oracle
COLORING_MAX_COLORS = 128  # oracle color-search range (engine asserts)


def q_doc_mis(sf_dir):
    """Deterministic-Luby maximal independent set on the symmetrized doc
    graph (algos/mis.py: sha-priority select + dropout broadcast, two
    supersteps per round).  Oracle: _mis_sql unrolled recurrence."""
    from .algos import maximal_independent_set

    eng = documents_engine(sf_dir, "undirected")
    rep = maximal_independent_set(eng)
    _check_unroll(rep, 2 * MIS_ROUNDS, "doc_mis")
    return _state_result(eng, "in_mis", "in_mis").map_batches(
        lambda b: b.filter(pc.equal(b["in_mis"], 1)).select(["v"]),
        batch_format="pyarrow")


HARMONIC_SEEDS = [0, 1, 2, 3]
CLOSENESS_SEEDS = [0, 1, 2, 3]
KATZ_ITERS = 10
KATZ_ALPHA = 0.1


def q_doc_closeness(sf_dir):
    """Sampled closeness centrality from 4 seeds on the symmetrized doc
    graph (algos/harmonic.closeness_from_seeds): one BFS-with-depth run
    per seed; closeness(s) = (n_reached - 1) / sum(depth).  Both sums
    are exact integers (map_vertices reductions), so the float division
    is bit-identical to the oracle's.  Oracle: _closeness_sql — per-seed
    unrolled BFS chains + the same aggregate."""
    from .algos.harmonic import closeness_from_seeds

    eng = documents_engine(sf_dir, "undirected")
    rows = []
    for s, reached, sumd, rep in closeness_from_seeds(eng, CLOSENESS_SEEDS):
        _check_unroll(rep, BFS_ROUNDS, f"doc_closeness seed {s}")
        c = (reached - 1) / sumd if sumd > 0 else 0.0
        rows.append({"v": s, "n_reached": reached,
                     "closeness": round(float(c), 6)})
    return pd.DataFrame(rows)


def q_doc_katz(sf_dir):
    """Katz centrality, 10 fixed iterations at alpha=0.1 on the directed
    doc graph (algos/katz.py: x = 1 + alpha * A^T x, the damped
    eigenvector family member that is well-defined on this DAG-shaped
    star graph).  Oracle: _katz_sql unrolled recurrence."""
    from .algos import katz_centrality

    eng = documents_engine(sf_dir, "directed")
    katz_centrality(eng, iterations=KATZ_ITERS, alpha=KATZ_ALPHA)
    return _state_result(eng, "katz", "katz", round_to=6)


CORENESS_ROUNDS = 30


def q_doc_onion(sf_dir):
    """Peeling layers of the 2-core peel (algos/kcore.OnionProgram):
    (v, removal round) for every vertex outside the 2-core — layer 0 =
    initial degree < 2, layer i = live degree dropped below 2 at
    synchronous round i.  Oracle: _onion_sql counts the unrolled
    alive-set memberships (monotone, so layer = count - 1)."""
    from .algos import onion_layers

    eng = documents_engine(sf_dir, "undirected")
    rep = onion_layers(eng, k=KCORE_K)
    _check_unroll(rep, KCORE_ROUNDS, "doc_onion")
    return _state_result(eng, "layer", "layer").map_batches(
        lambda b: b.filter(pc.greater_equal(b["layer"], 0)),
        batch_format="pyarrow")


def q_doc_coreness(sf_dir):
    """Full core decomposition on the symmetrized doc graph
    (algos/kcore.CorenessProgram: H-index iteration from degree —
    converges to the core number).  Oracle: _coreness_sql, the same
    recurrence unrolled with a window-rank H-index per round."""
    from .algos import coreness

    eng = documents_engine(sf_dir, "undirected")
    rep = coreness(eng)
    _check_unroll(rep, CORENESS_ROUNDS, "doc_coreness")
    return _state_result(eng, "core", "core")


def q_doc_powerlaw(sf_dir):
    """Degree-distribution power-law fit: OLS of ln(count) on
    ln(degree) over the symmetrized doc graph's degree histogram —
    the graph-stats report number.  Degree counts are map-side
    partials (bounded domain); the fit is closed-form driver math with
    the identical expression in SQL (one ln per point, the standard
    normal-equation sums)."""
    from .algos.triangles import n_buckets_for

    sym = documents_edges(sf_dir)

    def deg_partial(b: pa.Table) -> pa.Table:
        v = np.concatenate([b["src"].to_numpy(zero_copy_only=False),
                            b["dst"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    # per-vertex degree via one coarse v-bucket merge, then the bounded
    # (degree -> n_vertices) histogram via map-side partials
    ds = sym.materialize()
    nb = n_buckets_for(2 * ds.count())
    parts = ds.map_batches(deg_partial, batch_format="pyarrow")         .map_batches(lambda b: b.append_column(
            "vb", pa.array((b["v"].to_numpy(zero_copy_only=False)
                            % nb).astype(np.int64))),
            batch_format="pyarrow")         .groupby("vb").map_groups(
            lambda g: g.groupby("v", sort=False)["c"].sum()
                       .reset_index(),
            batch_format="pandas")
    hist_parts = parts.map_batches(
        lambda b: pa.table(dict(zip(
            ("k", "n"),
            (lambda u, c: (pa.array(u.astype(np.int64)),
                           pa.array(c.astype(np.int64))))(
                *np.unique(b["c"].to_numpy(zero_copy_only=False),
                           return_counts=True))))),
        batch_format="pyarrow").to_pandas()
    hist = hist_parts.groupby("k", sort=True)["n"].sum()
    x = np.log(hist.index.to_numpy(np.float64))
    y = np.log(hist.to_numpy(np.float64))
    m = len(x)
    sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    intercept = (sy - slope * sx) / m
    return pd.DataFrame({"n_points": np.array([m], np.int64),
                         "slope": [round(float(slope), 6)],
                         "intercept": [round(float(intercept), 6)]})


def q_doc_reciprocity(sf_dir):
    """Directed-graph reciprocity over the cycle-augmented doc graph:
    fraction of directed edges whose reverse also exists.  ONE coarse
    unordered-pair bucket groupby — an edge and its reverse share a
    bucket by construction, so the per-bucket reciprocal counts sum
    exactly; only the two counts reach the driver."""
    from .algos.triangles import _pair_bucket, n_buckets_for

    de = documents_edges(sf_dir)         .map_batches(_aug_cycles, batch_format="pyarrow").materialize()
    n_edges = de.count()
    if n_edges == 0:
        return pd.DataFrame({"n_edges": [0], "n_reciprocal": [0],
                             "reciprocity": [0.0]})
    nb = n_buckets_for(n_edges)

    def tag(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64()),
                         "ub": pa.array(_pair_bucket(lo, hi, nb))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["src", "dst"]]
        rev = e.rename(columns={"src": "dst", "dst": "src"})
        nr = len(e.merge(rev, on=["src", "dst"], how="inner"))
        return pd.DataFrame({"nr": [nr]})

    parts = de.map_batches(tag, batch_format="pyarrow")               .groupby("ub").map_groups(kern, batch_format="pandas")               .to_pandas()
    nr = int(parts["nr"].sum())
    return pd.DataFrame({
        "n_edges": np.array([n_edges], np.int64),
        "n_reciprocal": np.array([nr], np.int64),
        "reciprocity": [round(nr / float(n_edges), 6)]})


def q_doc_scc(sf_dir):
    """Strongly connected components over the cycle-augmented doc graph
    (SCC_EDGES_SQL: canonical edges + reverse where (src+dst)%3==0 —
    the canonical star edges alone are a DAG).  Label = min vertex id
    in the SCC (algos/scc.py forward-min / backward-confirm rounds).
    Oracle: _scc_sql — exact WITH RECURSIVE transitive closure, so no
    unroll-depth dependency."""
    from .algos import strongly_connected_components

    eng = documents_engine(sf_dir, "scc")
    strongly_connected_components(eng)
    return _state_result(eng, "scc", "scc")


def q_doc_adjacency(sf_dir):
    """Adjacency-list export of the symmetric doc graph: (v, degree,
    neighbors) with neighbors a comma-joined ascending id string — the
    CSR-shaped interchange format downstream graph tools ingest.  One
    coarse v-bucket shuffle; the in-bucket kernel is a vectorized
    lexsort + per-segment join.  Dataset out (never |V| rows on the
    driver)."""
    from .algos.triangles import n_buckets_for
    from .edges import symmetrize

    edges = symmetrize(documents_edges(sf_dir)).materialize()
    nb = n_buckets_for(edges.count())

    def tag(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "vb": pa.array((s % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy(np.int64)
        d = g["dst"].to_numpy(np.int64)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        pdf = pd.DataFrame({"v": s, "n": d.astype(str)})
        agg = pdf.groupby("v", sort=True)["n"] \
            .agg(["size", ",".join]).reset_index()
        agg.columns = ["v", "degree", "neighbors"]
        agg["degree"] = agg["degree"].astype(np.int64)
        return agg

    return edges.map_batches(tag, batch_format="pyarrow") \
                .groupby("vb").map_groups(kern, batch_format="pandas")


def q_doc_condensation(sf_dir):
    """SCC condensation DAG: distinct (scc(src), scc(dst)) pairs with
    different labels over the cycle-augmented edge set — the component
    graph a reachability/scheduling pass runs on after SCC.  Labels
    attach to both edge endpoints via the gated lookup join
    (joins.attach_by_key: broadcast under cap, coarse-bucket co-group
    above); dedup is one distinct on the label-pair domain (bounded by
    the condensation size, far smaller than |E|)."""
    from .joins import attach_by_key

    eng = documents_engine(sf_dir, "scc")
    from .algos import strongly_connected_components
    strongly_connected_components(eng)
    labels = _state_result(eng, "scc", "scc")
    edges = documents_edges(sf_dir).map_batches(
        _aug_cycles, batch_format="pyarrow")
    tagged = attach_by_key(edges, labels, ["src", "dst"],
                           key="v", value="scc")

    def pairs(b: pa.Table) -> pa.Table:
        a = b["scc_src"].to_numpy(zero_copy_only=False)
        c = b["scc_dst"].to_numpy(zero_copy_only=False)
        m = a != c
        pdf = pd.DataFrame({"from_scc": a[m], "to_scc": c[m]}) \
            .drop_duplicates()
        return pa.Table.from_pandas(pdf, preserve_index=False)

    out = tagged.map_batches(pairs, batch_format="pyarrow").to_pandas()
    return out.drop_duplicates().sort_values(["from_scc", "to_scc"]) \
        .reset_index(drop=True)


# high-degree-mid split (the triangles wedge-salt rule): a hub mid with
# in x out wedge product over the cap gets its IN side sharded into
# nsub sub-buckets (OUT side replicated), so no single task ever
# materializes more than ~TRIAD_WEDGE_CAP wedges per mid.  Module-level
# so tests can force the split path.
TRIAD_WEDGE_CAP = 250_000
TRIAD_MAX_SUB = 64


def q_doc_triads(sf_dir):
    """Directed triad census over the cycle-augmented graph: counts of
    CYCLIC (a->b->c->a) vs TRANSITIVE (a->b->c plus a->c) triangles —
    the dyad/triad structure report of a directed link graph
    (complements doc_reciprocity).  Wedges co-group by their MID vertex
    in one coarse bucket shuffle; each closing check is a distributed
    hash join of packed (endpoint, endpoint) keys against the edge set
    — never an all-pairs or driver-side pass.  Every directed 3-cycle
    closes at all 3 mids, so cyclic = joined/3 exactly."""
    from .algos.triangles import n_buckets_for
    from .dedup import _join_parts

    import ray

    edges = documents_edges(sf_dir).map_batches(
        _aug_cycles, batch_format="pyarrow").materialize()
    ne = edges.count()
    nb = n_buckets_for(2 * ne)
    K = np.int64(1) << np.int64(32)


    def deg_part(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ui, ci = np.unique(d, return_counts=True)   # in-degree of mid
        uo, co = np.unique(s, return_counts=True)   # out-degree
        return pa.table({
            "mid": pa.array(np.concatenate([ui, uo])),
            "n_in": pa.array(np.concatenate(
                [ci, np.zeros(len(uo), np.int64)]).astype(np.int64)),
            "n_out": pa.array(np.concatenate(
                [np.zeros(len(ui), np.int64), co]).astype(np.int64))})

    degs = edges.map_batches(deg_part, batch_format="pyarrow") \
                .to_pandas().groupby("mid").sum()
    prod = degs["n_in"].to_numpy(np.int64) * degs["n_out"] \
        .to_numpy(np.int64)
    heavy = degs.index.to_numpy(np.int64)[prod > TRIAD_WEDGE_CAP]
    nsub = np.minimum(TRIAD_MAX_SUB, prod[prod > TRIAD_WEDGE_CAP]
                      // TRIAD_WEDGE_CAP + 1).astype(np.int64)
    # degs.index is sorted (pandas groupby), so heavy/nsub are aligned
    href = ray.put((heavy, nsub))

    def subs_of(mid):
        hv, ns = ray.get(href)
        pos = np.minimum(np.searchsorted(hv, mid), max(0, len(hv) - 1))
        out = np.ones(len(mid), np.int64)
        if len(hv):
            m = hv[pos] == mid
            out[m] = ns[pos[m]]
        return out

    def tag(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        # in-rows: (mid=d, oth=s) land in sub = oth % nsub(mid)
        ns_in = subs_of(d)
        in_mid, in_oth = d, s
        in_sub = s % ns_in
        # out-rows: (mid=s, oth=d) replicate to every sub of mid
        ns_out = subs_of(s)
        out_mid = np.repeat(s, ns_out)
        out_oth = np.repeat(d, ns_out)
        ends = np.cumsum(ns_out)
        out_sub = np.arange(int(ends[-1]) if len(ends) else 0,
                            dtype=np.int64) - np.repeat(
            ends - ns_out, ns_out)
        mid = np.concatenate([in_mid, out_mid])
        oth = np.concatenate([in_oth, out_oth])
        sub = np.concatenate([in_sub, out_sub])
        dr = np.concatenate([np.zeros(len(in_mid), np.int64),
                             np.ones(len(out_mid), np.int64)])
        gk = mid * TRIAD_MAX_SUB + sub
        return pa.table({"mid": pa.array(mid), "sub": pa.array(sub),
                         "oth": pa.array(oth), "dir": pa.array(dr),
                         "mb": pa.array((gk % nb).astype(np.int64))})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby(["mid", "sub"], sort=False):
            a = grp.loc[grp["dir"] == 0, "oth"].to_numpy(np.int64)
            c = grp.loc[grp["dir"] == 1, "oth"].to_numpy(np.int64)
            if len(a) == 0 or len(c) == 0:
                continue
            aa = np.repeat(a, len(c))
            cc = np.tile(c, len(a))
            out.append(pd.DataFrame({
                "k_trans": aa * K + cc,     # needs edge a->c
                "k_cyc": cc * K + aa}))     # needs edge c->a
        if not out:
            return pd.DataFrame({"k_trans": pd.Series([], np.int64),
                                 "k_cyc": pd.Series([], np.int64)})
        return pd.concat(out, ignore_index=True)

    w = edges.map_batches(tag, batch_format="pyarrow") \
             .groupby("mb").map_groups(wedges, batch_format="pandas") \
             .materialize()
    ekeys = edges.map_batches(
        lambda b: pa.table({"ek": pa.array(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            * K + b["dst"].to_numpy(zero_copy_only=False)
            .astype(np.int64))}),
        batch_format="pyarrow").materialize()
    parts = _join_parts(ne)

    def keyed(col):
        return w.map_batches(
            lambda b, c=col: pa.table({"ek": b[c]}),
            batch_format="pyarrow")

    n_trans = keyed("k_trans").join(ekeys, join_type="inner",
                                    num_partitions=parts,
                                    on=("ek",)).count()
    n_cyc3 = keyed("k_cyc").join(ekeys, join_type="inner",
                                 num_partitions=parts,
                                 on=("ek",)).count()
    return pd.DataFrame({
        "n_cyclic": np.array([n_cyc3 // 3], np.int64),
        "n_transitive": np.array([n_trans], np.int64)})


def q_doc_harmonic(sf_dir):
    """Sampled harmonic centrality from 4 seeds on the symmetrized doc
    graph (algos/harmonic.py): one BFS-with-depth run per seed, the
    1/d accumulator carried in engine state across runs.  Oracle:
    _harmonic_sql — per-seed unrolled BFS chains summed in seed order."""
    from .algos.harmonic import harmonic_centrality

    eng = documents_engine(sf_dir, "undirected")
    reports = harmonic_centrality(eng, HARMONIC_SEEDS)
    for s, rep in zip(HARMONIC_SEEDS, reports):
        _check_unroll(rep, BFS_ROUNDS, f"doc_harmonic seed {s}")
    return _state_result(eng, "harmonic", "harmonic", round_to=6)


def q_doc_distance_dist(sf_dir):
    """Distance distribution + effective diameter from the harmonic
    seed sweeps: pool the finite positive BFS depths of every
    (seed, vertex) pair, count per depth, and report the 90th-
    percentile depth (smallest d with cum*10 >= 9*total — all-integer,
    so engine and oracle agree exactly).  Per-seed depth counts come
    back as bounded map-side partials off the engine state Dataset;
    nothing |V|-sized reaches the driver."""
    from .algos.harmonic import HarmonicProgram, _INF

    eng = documents_engine(sf_dir, "undirected")
    pooled: dict[int, int] = {}
    for i, s in enumerate(HARMONIC_SEEDS):
        rep = eng.run(HarmonicProgram(),
                      params={"root": int(s), "reset": i == 0},
                      run_name=f"ddist_{int(s)}")
        _check_unroll(rep, BFS_ROUNDS, f"doc_distance_dist seed {s}")

        def part(b: pa.Table) -> pa.Table:
            d = b["depth"].to_numpy(zero_copy_only=False)
            fin = (d > 0) & (d < int(_INF))
            u, c = np.unique(d[fin], return_counts=True)
            return pa.table({"d": pa.array(u.astype(np.int64)),
                             "n": pa.array(c.astype(np.int64))})

        pc_ = eng.state_dataset(["depth"]).map_batches(
            part, batch_format="pyarrow").to_pandas()
        for d, n in zip(pc_["d"], pc_["n"]):
            pooled[int(d)] = pooled.get(int(d), 0) + int(n)
    ds_ = sorted(pooled)
    ns = np.array([pooled[d] for d in ds_], np.int64)
    cum = np.cumsum(ns)
    tot = int(ns.sum())
    eff = next(d for d, c in zip(ds_, cum) if int(c) * 10 >= 9 * tot)
    return pd.DataFrame({"d": np.array(ds_, np.int64), "n": ns,
                         "cum": cum.astype(np.int64),
                         "eff_diameter": np.full(len(ds_), eff,
                                                 np.int64)})


def q_doc_diameter(sf_dir):
    """Double-sweep diameter lower bound (the standard BFS heuristic):
    BFS from vertex 0, take the farthest reached vertex u (tie: min id),
    BFS from u; report u, its eccentricity bound, and the first sweep's
    eccentricity.  Farthest-vertex selection is a per-block partial
    top-1 + tiny driver reduce (never |V| rows on the driver).  Oracle:
    _diameter_sql — two unrolled BFS chains, the second rooted at a
    scalar subquery."""
    from .algos.harmonic import HarmonicProgram, _INF

    eng = documents_engine(sf_dir, "undirected")

    def _sweep(root):
        rep = eng.run(HarmonicProgram(), params={"root": int(root),
                                                 "reset": True},
                      run_name=f"sweep_{int(root)}")
        # same loud-unroll convention as doc_harmonic/doc_bc_sampled: an
        # eccentricity beyond the oracle's unroll must error, not surface
        # as a silent driver-gate hash mismatch (ADVICE r2)
        _check_unroll(rep, BFS_ROUNDS, f"doc_diameter sweep {int(root)}")

        def local_far(b: pa.Table) -> pa.Table:
            d = b["depth"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            fin = d < int(_INF)
            if not fin.any():
                return pa.table({"v": pa.array([], pa.int64()),
                                 "depth": pa.array([], pa.int64())})
            d, v = d[fin], v[fin]
            sel = np.lexsort((v, -d))[:1]
            return pa.table({"v": pa.array(v[sel]),
                             "depth": pa.array(d[sel])})

        parts = eng.state_dataset(["depth"]).map_batches(
            local_far, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(["depth", "v"],
                                  ascending=[False, True])
        return int(parts.iloc[0]["v"]), int(parts.iloc[0]["depth"])

    u, ecc0 = _sweep(0)
    _, ecc1 = _sweep(u)
    return pd.DataFrame({"far_v": [u], "ecc_root": [ecc0],
                         "diameter_lb": [ecc1]})


def q_doc_coloring(sf_dir):
    """Deterministic Jones-Plassmann greedy coloring on the symmetrized
    doc graph (algos/coloring.py: sha-priority select + color broadcast,
    two supersteps per round) — equals sequential greedy coloring in
    priority order.  Oracle: _coloring_sql unrolled recurrence."""
    from .algos.coloring import greedy_coloring

    eng = documents_engine(sf_dir, "undirected")
    rep = greedy_coloring(eng)
    _check_unroll(rep, 2 * COLORING_ROUNDS, "doc_coloring")
    ds = _state_result(eng, "color", "color").materialize()
    assert ds.max("color") < COLORING_MAX_COLORS  # oracle range() bound
    return ds


TRUSS_K = 3
TRUSS_ROUNDS = 6  # unrolled support-filter rounds in the SQL oracle


def q_doc_truss(sf_dir):
    """3-truss of the doc graph (algos/ktruss.py): every surviving edge
    is in >= 1 triangle within the surviving subgraph — the unique
    peel fixpoint.  Oracle: _ktruss_sql unrolled support-filter rounds."""
    from .algos.ktruss import ktruss_edges

    out, rounds = ktruss_edges(documents_edges(sf_dir), k=TRUSS_K)
    if rounds > TRUSS_ROUNDS:
        raise AssertionError(
            f"doc_truss peeled {rounds} rounds but the SQL oracle unrolls "
            f"only {TRUSS_ROUNDS} — raise the unroll")
    return out


def q_doc_walks(sf_dir):
    """Deterministic random walks (algos/walks.py): 8 steps from docs
    0-5 over the symmetrized doc graph; next hop = min-md5 neighbor.
    Oracle: _walks_sql unrolled per-step argmin CTEs."""
    from .algos.walks import deterministic_walks
    from .edges import symmetrize

    sym = symmetrize(documents_edges(sf_dir))
    return deterministic_walks(sym, seeds=WALK_SEEDS, steps=WALK_STEPS)


PMI_SEEDS = list(range(32))
PMI_WINDOW = 2


def q_doc_walk_pmi(sf_dir):
    """DeepWalk-style skip-gram statistics (algos/walks.
    walk_cooccurrence_pmi): window-2 co-occurrence counts + PMI over 32
    deterministic walks; exact-integer ratio -> one division -> one
    libm log, bit-identical to the SQL before rounding."""
    from .algos.walks import walk_cooccurrence_pmi
    from .edges import symmetrize

    sym = symmetrize(documents_edges(sf_dir))
    return walk_cooccurrence_pmi(sym, seeds=PMI_SEEDS, steps=WALK_STEPS,
                                 window=PMI_WINDOW)


N2V_STEPS = 6


def q_doc_node2vec(sf_dir):
    """Second-order (node2vec-style) deterministic walks: 6 steps from
    docs 0-5, preference order triadic > return > exploratory with the
    md5 rule inside a tier (algos/walks.node2vec_walks)."""
    from .algos.walks import node2vec_walks
    from .edges import symmetrize

    sym = symmetrize(documents_edges(sf_dir))
    return node2vec_walks(sym, seeds=WALK_SEEDS, steps=N2V_STEPS)


def q_doc_adamic_adar(sf_dir):
    """Top-20 distance-2 pairs by Adamic-Adar score (algos/linkpred.py:
    bucketed wedge expansion + groupby sum + distributed sort/limit)."""
    from .algos.linkpred import adamic_adar_topk

    return adamic_adar_topk(documents_edges(sf_dir), k=AA_TOPK)


def q_doc_negatives(sf_dir):
    """Deterministic negative sampling for link-prediction training
    (algos/linkpred.negative_samples): first-5-of-36 murmur probe
    candidates per vertex that are NOT edges; shuffle-free under the
    broadcast cap."""
    from .algos.linkpred import NEG_K, NEG_PROBES, negative_samples

    return negative_samples(documents_edges(sf_dir), k=NEG_K,
                            probes=NEG_PROBES)


def q_doc_linkpred(sf_dir):
    """All four classic neighborhood link predictors in one pipeline
    (algos/linkpred.link_prediction_topk): common neighbors, Adamic-Adar,
    neighborhood Jaccard and preferential attachment for the top-20
    distance-2 pairs by (cn desc, aa desc, u, w)."""
    from .algos.linkpred import link_prediction_topk

    return link_prediction_topk(documents_edges(sf_dir), k=AA_TOPK)


# ------------------------------------------------------------- text queries

def q_text_tokens(sf_dir):
    import ray.data as rd

    from .text import add_token_count

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(add_token_count, batch_format="pyarrow") \
               .select_columns(["doc_id", "n_tokens"])


def q_text_tokens_bpe(sf_dir):
    """BPE-ish pretoken counts (text.add_bpe_token_count): the same
    RE2 pattern evaluated by pyarrow and the DuckDB oracle."""
    from .text import add_bpe_token_count

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(add_bpe_token_count, batch_format="pyarrow") \
               .select_columns(["doc_id", "n_bpe_tokens"])


def q_text_top_tokens(sf_dir):
    """Top-50 most frequent whitespace tokens (corpus heavy hitters):
    map-side per-batch value_counts partials (the combiner), ONE small
    groupby over (token, partial-count), then the per-block top-k +
    driver reduce pattern of q_doc_top_degree — at 100 TB only the
    distinct-token table shuffles, never the token stream."""

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = _arr(toks.value_counts())
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(TOP_TOKENS_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    return parts.sort_values(["n", "token"], ascending=[False, True],
                             kind="mergesort").head(TOP_TOKENS_K) \
                .reset_index(drop=True)


TOP_STEMS_K = 30


def q_text_top_stems(sf_dir):
    """Top-30 corpus heavy hitters AFTER light suffix stemming
    (text.STEM_RULES — an anchored RE2 chain applied identically by
    pyarrow and DuckDB): same combiner + distinct-key groupby +
    partial-top-k shape as q_text_top_tokens."""
    from .text import stem_array

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]),
                                                      r"\s+"))
        toks = stem_array(toks.filter(pc.not_equal(toks, "")))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = _arr(toks.value_counts())
        return pa.table({"stem": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow")         .groupby("stem").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "stem"], ascending=[False, True],
                              kind="mergesort").head(TOP_STEMS_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = counts.map_batches(local_top,
                               batch_format="pyarrow").to_pandas()
    return parts.sort_values(["n", "stem"], ascending=[False, True],
                             kind="mergesort").head(TOP_STEMS_K)                 .reset_index(drop=True)


TOP_BIGRAMS_K = 20


def q_text_top_bigrams(sf_dir):
    """Top-20 word-bigram pairs by corpus count (the first BPE-style
    merge-candidate scan): same combiner + distinct-key groupby +
    partial-top-k shape as q_text_top_tokens, bigrams composed from the
    flat token stream via list parent indices (no per-row loop)."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = (toks.to_numpy(object) != "")
        toks, par = toks[ok].reset_index(drop=True), par[ok]
        if len(par) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        m = par[:-1] == par[1:]
        bg = (toks.iloc[:-1].reset_index(drop=True)[m] + " "
              + toks.iloc[1:].reset_index(drop=True)[m])
        vc = bg.value_counts()
        return pa.table({"bigram": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(TOP_BIGRAMS_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = counts.map_batches(local_top,
                               batch_format="pyarrow").to_pandas()
    return parts.sort_values(["n", "bigram"], ascending=[False, True],
                             kind="mergesort").head(TOP_BIGRAMS_K) \
                .reset_index(drop=True)


TOP_BPE_PAIRS_K = 30


def q_text_bpe_pairs(sf_dir):
    """BPE tokenizer-training `get_stats`: adjacent CHARACTER-pair
    counts within whitespace words, weighted by corpus word frequency —
    the statistic the first BPE merge maximizes (vs text_top_bigrams'
    word-level pairs).

    Scale shape: map-side word value_counts combiner -> distinct-word
    hash aggregate -> per-distinct-word vectorized pair extraction
    (one utf-32 buffer per batch, boundary mask, uint64 pair codes,
    bincount — strings materialized only for the per-batch UNIQUE
    pairs, alphabet^2-bounded) -> pair hash aggregate -> partial
    top-k."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def wpartial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        toks = toks[toks.to_numpy(object) != ""]
        vc = toks.value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    words = docs.map_batches(wpartial, batch_format="pyarrow") \
        .groupby("w").sum("n")

    def ppartial(b: pa.Table) -> pa.Table:
        ws = b["w"].to_pylist()
        n = b["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.array([len(w) for w in ws], dtype=np.int64)
        keep = lens >= 2
        ws = [w for w, k in zip(ws, keep) if k]
        n, lens = n[keep], lens[keep]
        if not ws:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        joined = "".join(ws)
        codes = np.frombuffer(joined.encode("utf-32-le"),
                              dtype=np.uint32).astype(np.uint64)
        valid = np.ones(len(codes) - 1, dtype=bool)
        ends = np.cumsum(lens)
        valid[ends[:-1] - 1] = False        # pairs crossing word ends
        w_at = np.repeat(n, lens)[:-1]
        pid = (codes[:-1] << np.uint64(32)) | codes[1:]
        u, inv = np.unique(pid[valid], return_inverse=True)
        cnt = np.bincount(inv, weights=w_at[valid].astype(np.float64),
                          minlength=len(u)).astype(np.int64)
        pairs = [chr(int(p) >> 32) + chr(int(p) & 0xFFFFFFFF)
                 for p in u]                # alphabet^2-bounded loop
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n": pa.array(cnt)})

    counts = words.map_batches(ppartial, batch_format="pyarrow") \
        .groupby("pair").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "pair"], ascending=[False, True],
                              kind="mergesort").head(TOP_BPE_PAIRS_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = counts.map_batches(local_top,
                               batch_format="pyarrow").to_pandas()
    return parts.sort_values(["n", "pair"], ascending=[False, True],
                             kind="mergesort").head(TOP_BPE_PAIRS_K) \
                .reset_index(drop=True)


def q_sample_quota(sf_dir):
    """Deterministic per-group quota sample: at most 5 docs per
    lang:source group, chosen by (sha256(doc_id), doc_id) priority
    (sampling.quota_sample — per-domain caps without a seeded RNG)."""
    from .sampling import quota_sample

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang", "source"])

    def key(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"doc_id": b["doc_id"],
                         "k": pc.binary_join_element_wise(
                             b["lang"], pa.array([":"] * n), b["source"], "")})

    return quota_sample(docs.map_batches(key, batch_format="pyarrow"),
                        key="k", id_col="doc_id", n=QUOTA_N)


def q_sketch_cms(sf_dir):
    """Count-Min sketch point estimates for a fixed probe list
    (sketch.cms_token_counts): (token, est, true_n), est >= true_n."""
    from .sketch import cms_token_counts

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return cms_token_counts(docs)


def q_sketch_distinct(sf_dir):
    """KMV distinct-token-count sketch (sketch.kmv_distinct_tokens):
    per-block k-smallest sha256 partials, tiny driver merge; the k-th
    digest and the estimate are exactly reproduced by the SQL oracle."""
    from .sketch import kmv_distinct_tokens

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return kmv_distinct_tokens(docs)


def q_sketch_hll(sf_dir):
    """HyperLogLog distinct-token sketch (sketch.hll_distinct_tokens):
    64 integer registers from sha256 prefixes, max-merged per-block
    partials, standard linear-counting small-range correction — the
    O(m)-state union-mergeable counterpart to q_sketch_distinct's KMV."""
    from .sketch import hll_distinct_tokens

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return hll_distinct_tokens(docs)


WEIGHTED_SAMPLE_K = 100


def q_sample_weighted(sf_dir):
    """Length-weighted sample without replacement
    (sampling.weighted_sample): Efraimidis-Spirakis u^(1/w) priorities
    with sha-derived u and w = n_chars — per-block top-k partials, tiny
    driver merge, no shuffle."""
    from .sampling import weighted_sample

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "n_chars"])
    return weighted_sample(docs, id_col="doc_id", weight_col="n_chars",
                           k=WEIGHTED_SAMPLE_K)


def q_mix_weights(sf_dir):
    """Temperature-scaled per-source mixture weights
    (sampling.mixture_weights): tokens(source)^0.7 normalized — the
    domain-mixing allocation of a training-corpus assembly; map-side
    partials over a catalog-bounded domain set, no shuffle."""
    from .sampling import mixture_weights

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["source", "text"])
    return mixture_weights(docs, group_col="source")


PMI_MIN_COUNT = 5
PMI_CAND = 200
PMI_K = 20


def q_text_pmi(sf_dir):
    """PMI collocations (text.pmi_phrases): candidate bigrams by count
    floor + partial top-n, then one corpus pass counting ONLY the
    candidate words; PMI evaluated driver-side over 200 rows."""
    from .text import pmi_phrases

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return pmi_phrases(docs, min_count=PMI_MIN_COUNT,
                       n_cand=PMI_CAND, k=PMI_K)


def q_events_markov(sf_dir):
    """First-order event-type Markov transitions
    (windows.markov_transitions): per-user (ts, event_id)-ordered
    adjacent pairs, one coarse user-bucket shuffle, catalog-bounded
    (prev, next) driver merge with row-normalized probabilities."""
    from .windows import markov_transitions

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"])
    return markov_transitions(ev)


def q_embed_quantize(sf_dir):
    """Int8 scalar quantization report (ann.quantize_int8): per-dim
    min/max partials broadcast once, then one stateless encode pass —
    (vec_id, code_sum, rmse)."""
    from .ann import quantize_int8

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    return quantize_int8(emb)


def q_tpch_market_share(sf_dir):
    """Q8-like per-year market share of one supplier nation within one
    customer region (relational.market_share)."""
    return _REL.market_share(sf_dir)


def q_embed_outliers(sf_dir):
    """Farthest-from-own-centroid embedding outliers
    (ann.embedding_outliers): label centroids rounded to 6 then
    broadcast, one stateless distance pass, tie-aware partial top-k."""
    from .ann import embedding_outliers

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])
    return embedding_outliers(emb)


def q_mix_resample(sf_dir):
    """Apply the temperature mixture (sampling.mixture_resample):
    per-source keep rates from the rounded mix weights, then the
    integer sha-threshold stratified keep — one stateless pass."""
    from .sampling import mixture_resample

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "source", "text"])
    return mixture_resample(docs, group_col="source")


def q_sink_roundtrip(sf_dir):
    """Lossless partitioned-sink round trip: documents -> resumable
    hive-partitioned parquet (io.write_partitioned_resumable, one dir +
    _SUCCESS marker per lang) -> read back.  The oracle compares the
    read-back rows against the source table, so the driver gate
    value-hashes the SINK + READ lanes end-to-end."""
    import shutil
    import tempfile

    from .io import write_partitioned_resumable

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars", "text"])
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    out = os.path.join(tempfile.gettempdir(),
                       f"linkgraph_sink_{st.st_mtime_ns}_{st.st_size}")
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_resumable(docs, out, "lang")
    back = read_parquet_clean(out)

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "lang": pc.cast(b["lang"], pa.string()),
            "source": b["source"],
            "n_chars": b["n_chars"],
            "text": b["text"]})

    return back.map_batches(norm, batch_format="pyarrow")


def _roundtrip_dir(sf_dir: str, kind: str) -> str:
    import tempfile

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return os.path.join(tempfile.gettempdir(),
                        f"linkgraph_{kind}_{st.st_mtime_ns}_{st.st_size}")


def q_sink_csv_roundtrip(sf_dir):
    """CSV source/sink round trip: documents -> write_csv -> read_csv,
    oracle = the source table (format-lane fidelity under the driver's
    value hash)."""
    import shutil

    import ray.data as rd

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars", "text"])
    out = _roundtrip_dir(sf_dir, "csv")
    shutil.rmtree(out, ignore_errors=True)
    docs.write_csv(out)
    return rd.read_csv(out)


def q_sink_json_roundtrip(sf_dir):
    """JSONL source/sink round trip: documents -> write_json ->
    read_json, oracle = the source table."""
    import shutil

    import ray.data as rd

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars", "text"])
    out = _roundtrip_dir(sf_dir, "jsonl")
    shutil.rmtree(out, ignore_errors=True)
    docs.write_json(out)
    return rd.read_json(out)


def q_sink_jsonl_gz_roundtrip(sf_dir):
    """Gzip JSONL source/sink round trip (io.write_jsonl_gz /
    read_jsonl_gz): deterministic content-named .jsonl.gz shards
    written inside the map tasks, streamed back through Arrow's gzip
    decompression.  Oracle = the source table."""
    import shutil

    from .io import read_jsonl_gz, write_jsonl_gz

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars", "text"])
    out = _roundtrip_dir(sf_dir, "jsonlgz")
    shutil.rmtree(out, ignore_errors=True)
    write_jsonl_gz(docs, out)
    return read_jsonl_gz(out)


def q_warc_extract(sf_dir):
    """WARC container lane (warc.py): documents packed into WARC/1.0
    response blobs (synth_warc_blobs — the CommonCrawl-file stand-in),
    then parsed back by the actor-pool Content-Length walker
    (WarcExtractStage).  Result: (doc_id, url, n_bytes) per record;
    oracle recomputes the URI and the UTF-8 octet length from the
    source table directly."""
    from .warc import synth_warc_blobs, warc_extract

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    blobs = synth_warc_blobs(docs)
    return warc_extract(blobs).select_columns(
        ["doc_id", "url", "n_bytes"])


def q_sample_stratified(sf_dir):
    """Deterministic per-language fraction sampling
    (sampling.stratified_sample): keep rate(lang) of each stratum by an
    integer sha256-prefix threshold — one shuffle-free map_batches."""
    from .sampling import stratified_sample

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang"])
    return stratified_sample(docs, id_col="doc_id", strata_col="lang",
                             rates=STRAT_RATES, default_rate=STRAT_DEFAULT)


def q_text_quality(sf_dir):
    """Composite quality score + keep flag (text.add_quality): length,
    stopword density, punctuation density — the heuristic pre-filter."""
    from .text import add_quality

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return docs.map_batches(add_quality, batch_format="pyarrow") \
               .select_columns(["doc_id", "quality", "keep"])


QUALITY_CUT_Q = 0.10


def q_corpus_quality_cut(sf_dir):
    """Percentile-based quality filtering: keep docs whose composite
    quality score reaches the corpus's exact P10 (quantiles.
    exact_quantiles — the distributed order statistic, quantile_disc
    index rule), the adaptive alternative to a fixed keep threshold.
    Scores are round-6 identical on both sides, so the >= comparison
    operates on identical doubles and cannot flip."""
    from .quantiles import exact_quantiles
    from .text import add_quality

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    scored = docs.map_batches(add_quality, batch_format="pyarrow")                  .select_columns(["doc_id", "quality"]).materialize()
    p10 = float(exact_quantiles(scored, "quality",
                                [QUALITY_CUT_Q])["val"].iloc[0])

    def cut(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["quality"],
                                         pa.scalar(p10)))

    return scored.map_batches(cut, batch_format="pyarrow")


GROUP_TOKENS_K = 10


def q_text_top_tokens_by_lang(sf_dir):
    """Per-GROUP heavy hitters: top-10 tokens per lang — the grouped
    variant of q_text_top_tokens.  Map-side (lang, token) value_counts
    partials, one groupby over the distinct (lang, token) table, then
    per-block per-group partial top-k + a tiny driver reduce (partials
    are safe: each post-groupby row carries its FINAL count)."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        langs = pc.take(b["lang"], parent)
        t = pa.table({"lang": langs, "token": flat})
        t = t.filter(pc.not_equal(t["token"], ""))
        g = t.group_by(["lang", "token"]).aggregate([("token", "count")])
        return g.rename_columns(["lang", "token", "n"])

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "token"]).sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["lang", "n", "token"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return pa.Table.from_pandas(
            pdf.groupby("lang").head(GROUP_TOKENS_K),
            preserve_index=False).replace_schema_metadata(None)

    parts = counts.map_batches(local_top, batch_format="pyarrow") \
        .to_pandas()
    out = parts.sort_values(["lang", "n", "token"],
                            ascending=[True, False, True],
                            kind="mergesort") \
        .groupby("lang").head(GROUP_TOKENS_K).reset_index(drop=True)
    out["rnk"] = out.groupby("lang").cumcount() + 1
    return out[["lang", "token", "rnk", "n"]]


def q_text_repetition(sf_dir):
    """Gopher-style repetition filters (text.add_repetition_stats):
    duplicate-word fraction, top-word fraction, top-bigram fraction —
    word-level (corpus has no line structure)."""
    from .text import add_repetition_stats

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return docs.map_batches(add_repetition_stats, batch_format="pyarrow")


def q_text_tfidf(sf_dir):
    """Top-5 TF-IDF terms per document (text.tfidf_top_terms): one
    distributed word-count pass for document frequencies, vocabulary
    broadcast back, per-doc scoring + rank."""
    from .text import tfidf_top_terms

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=5)


def q_corpus_clean(sf_dir):
    """FLAGSHIP training-data cleaning composition, end to end:

        quality filter (add_quality keep)
        -> exact dedup (min doc_id per sha256 of text)
        -> MinHash+LSH near-dup removal (drop the larger id of every
           exact-verified pair, the standard LSH-dedupe rule)
        -> surviving doc ids.

    Every stage is one of the repo's oracle-checked operators; the
    oracle composes their SQL fragments in the same order."""
    from .dedup import _join_parts, exact_dedup, minhash_dedup_pairs
    from .hashing import add_sha256
    from .text import add_quality

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def quality_keep(b: pa.Table) -> pa.Table:
        t = add_quality(b)
        return t.filter(t["keep"]).select(["doc_id", "text"])

    # q1 feeds the sha pass AND the survivor join: materialize the
    # shared node (Ray 2.49 diamond-lineage rule)
    q1 = docs.map_batches(quality_keep, batch_format="pyarrow") \
             .materialize()
    sha = q1.map_batches(lambda b: add_sha256(b, col="text"),
                         batch_format="pyarrow")
    surv = exact_dedup(sha, key="sha256", id_col="doc_id")
    q2 = q1.join(surv, join_type="inner",
                 num_partitions=_join_parts(q1.count()),
                 on=("doc_id",)).materialize()
    pairs = minhash_dedup_pairs(q2, threshold=0.5)
    # the drop set (pair `b` ids) is the SMALL side: reduce it to a
    # sorted array, ray.put once, filter survivors inside map_batches —
    # no corpus-sized to_pandas in the lineage (VERDICT r2 #2)
    import ray

    if isinstance(pairs, pd.DataFrame):
        drop = np.unique(pairs["b"].to_numpy().astype(np.int64))
    else:
        drop = np.unique(
            pairs.select_columns(["b"]).groupby("b").count()
                 .select_columns(["b"]).to_pandas()["b"].to_numpy()
                 .astype(np.int64))
    drop_ref = ray.put(drop)

    def keep_rows(b: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if len(d) == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return b.filter(pa.array(d[pos] != ids))

    return q2.select_columns(["doc_id"]).map_batches(
        keep_rows, batch_format="pyarrow")


def q_text_stats(sf_dir):
    import ray.data as rd

    from .text import add_text_stats

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(add_text_stats, batch_format="pyarrow") \
               .select_columns(["doc_id", "n_chars2", "n_tokens", "n_punct"])


def _inject_pii(batch: pa.Table) -> pa.Table:
    """Deterministic synthetic-PII append on doc_id % 7 == 0 (the corpus
    itself contains no PII; the injection is reproduced verbatim in the
    SQL oracle so the redaction regexes are exercised on real matches)."""
    d = batch["doc_id"]
    dn = d.to_numpy(zero_copy_only=False).astype(np.int64)
    s = pc.cast
    sfx = pc.binary_join_element_wise(
        batch["text"], " contact user", s(d, pa.string()),
        "@mail.example.com ip 10.",
        s(pa.array(dn % 256), pa.string()), ".0.",
        s(pa.array(dn % 100), pa.string()), " tel +1-555-",
        s(pa.array(1000000 + dn % 100000), pa.string()),
        "")
    inj = pc.if_else(pa.array(dn % 7 == 0), sfx, batch["text"])
    return pa.table({"doc_id": d, "text": inj})


def q_text_redact(sf_dir):
    """PII scrub over the (synthetically PII-salted) corpus: per-doc
    match counts + the fully redacted text."""
    from .text import redact_pii

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return docs.map_batches(_inject_pii, batch_format="pyarrow") \
               .map_batches(redact_pii, batch_format="pyarrow") \
               .select_columns(["doc_id", "n_email", "n_ipv4", "n_phone",
                                "text_redacted"])


CHUNK_WORDS, CHUNK_OVERLAP = 32, 8


def q_text_chunks(sf_dir):
    """RAG-prep chunking: 32-word chunks with 8-word overlap
    (doc_id, chunk_id, chunk, n_words), fully vectorized."""
    from .text import chunk_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: chunk_documents(b, CHUNK_WORDS, CHUNK_OVERLAP),
        batch_format="pyarrow")


def q_text_perplexity(sf_dir):
    """Per-doc add-one bigram-LM quality scores (the CCNet/Dolma
    perplexity-filter signal), model trained on the corpus itself."""
    from .lm import perplexity_scores

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return perplexity_scores(docs)


def q_text_ccnet_buckets(sf_dir):
    """CCNet-style per-language perplexity terciles (Wenzek et al.
    2020): each language's docs are ranked by (ppl, doc_id) and split
    head/middle/tail by rank thirds — the classic LM-quality data cut.
    Ranking is quantiles.grouped_value_ranks (range-partitioned per
    bounded key, no language ever held in one task); the tercile report
    aggregates map-side partials over the tiny lang x bucket domain.
    Oracle: the text_perplexity body + row_number() OVER (PARTITION BY
    lang) with the same (ppl, doc_id) order and third formula."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from .joins import attach_by_key
    from .lm import perplexity_scores
    from .quantiles import grouped_value_ranks

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text", "lang"])
    ppl = perplexity_scores(docs).select_columns(["doc_id", "ppl"])
    # bounded lang vocabulary -> int index (attach_by_key is int-valued)
    langs = sorted(r["lang"] for r in
                   docs.groupby("lang").count().take_all())
    lidx = {l: i for i, l in enumerate(langs)}
    lref = ray.put(lidx)

    def lang_map(b: pa.Table) -> pa.Table:
        lm = ray.get(lref)
        lv = b["lang"].to_pylist()
        return pa.table({
            "doc_id": b["doc_id"],
            "lang_idx": pa.array([lm[x] for x in lv], pa.int64())})

    lmap = docs.select_columns(["doc_id", "lang"]).map_batches(
        lang_map, batch_format="pyarrow")
    tagged = attach_by_key(ppl, lmap, ["doc_id"], "doc_id", "lang_idx")
    ranks = grouped_value_ranks(
        tagged.map_batches(lambda b: pa.table({
            "doc_id": b["doc_id"], "lang_idx": b["lang_idx_doc_id"],
            "ppl": b["ppl"]}), batch_format="pyarrow"),
        key="lang_idx", value="ppl", id_col="doc_id")
    n_by_lang = {int(r["lang_idx"]): r["count()"] for r in
                 ranks.groupby("lang_idx").count().take_all()}
    nref = ray.put((langs, n_by_lang))
    names = np.array(["head", "middle", "tail"])

    def bucketize(b: pa.Table) -> pa.Table:
        la, nb_ = ray.get(nref)
        ki = b["lang_idx"].to_numpy(zero_copy_only=False)
        rnk = b["rnk"].to_numpy(zero_copy_only=False)
        n = np.array([nb_[int(k)] for k in ki], dtype=np.int64)
        third = (rnk - 1) * 3 // n
        df = pd.DataFrame({
            "lang": np.array(la, object)[ki],
            "bucket": names[third],
            "ppl": b["ppl"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "bucket"])["ppl"] \
              .agg(["count", "min", "max"]).reset_index()
        return pa.table({
            "lang": pa.array(g["lang"].to_numpy(object)),
            "bucket": pa.array(g["bucket"].to_numpy(object)),
            "n_docs": pa.array(g["count"].to_numpy(np.int64)),
            "min_ppl": pa.array(g["min"].to_numpy(np.float64)),
            "max_ppl": pa.array(g["max"].to_numpy(np.float64))})

    return (ranks.map_batches(bucketize, batch_format="pyarrow")
            .groupby(["lang", "bucket"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Min("min_ppl", alias_name="min_ppl"),
                       Max("max_ppl", alias_name="max_ppl")))


def q_decontaminate(sf_dir):
    """Benchmark decontamination: (doc_id, n_hits) for corpus docs
    sharing any word 8-gram with the benchmark slice (doc_id % 53)."""
    from .decontam import contamination

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return contamination(docs)


def q_text_fingerprint(sf_dir):
    import ray.data as rd

    from .text import add_fingerprint

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(add_fingerprint, batch_format="pyarrow") \
               .select_columns(["doc_id", "fp"])


def q_text_langid(sf_dir):
    import ray.data as rd

    from .text import langid_stage

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return langid_stage(docs).select_columns(["doc_id", "lang_pred"])


def q_text_langid_confusion(sf_dir):
    """Language-ID evaluation report: (true lang, predicted lang, n)
    confusion counts — the QA matrix a corpus-cleaning run publishes.
    One langid actor-pool pass, then map-side (lang, pred) partials
    merged on the driver (language-pair domain is catalog-bounded)."""
    from .text import langid_stage

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang", "text"])
    pred = langid_stage(docs)

    def partial(b: pa.Table) -> pa.Table:
        pdf = pd.DataFrame({
            "lang": b["lang"].to_pandas(),
            "lang_pred": b["lang_pred"].to_pandas()})
        agg = pdf.groupby(["lang", "lang_pred"], sort=False) \
                 .size().rename("n").reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = pred.map_batches(partial, batch_format="pyarrow") \
                .to_pandas()
    out = parts.groupby(["lang", "lang_pred"], sort=True)["n"] \
               .sum().reset_index()
    out["n"] = out["n"].astype(np.int64)
    return out


TOPK_USERS_K = 5


def q_events_topk_users(sf_dir):
    """Heavy-hitter users per event type: top-5 by event count.  Users
    bucket coarsely (a user's rows land in ONE bucket, so in-bucket
    totals are exact and the global per-type top-k is contained in the
    union of per-bucket top-ks); driver merges buckets * types * k
    candidate rows."""
    from .algos.triangles import n_buckets_for

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_type"]) \
        .materialize()
    nb = n_buckets_for(ev.count())

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(u),
                         "event_type": b["event_type"],
                         "ub": pa.array((u % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["event_type", "user_id"], sort=False) \
               .size().rename("n").reset_index()
        agg = agg.sort_values(["event_type", "n", "user_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return agg.groupby("event_type", sort=False).head(TOPK_USERS_K)

    cand = ev.map_batches(tag, batch_format="pyarrow") \
             .groupby("ub").map_groups(kern, batch_format="pandas") \
             .to_pandas()
    cand = cand.sort_values(["event_type", "n", "user_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
    top = cand.groupby("event_type", sort=True).head(TOPK_USERS_K) \
              .reset_index(drop=True)
    top["rnk"] = top.groupby("event_type").cumcount() + 1
    top["n"] = top["n"].astype(np.int64)
    return top[["event_type", "user_id", "rnk", "n"]]


def q_dedup_exact(sf_dir):
    from .dedup import exact_dedup

    return exact_dedup(q_text_fingerprint(sf_dir), key="fp", id_col="doc_id")


SHARD_SIZE = 100


def q_shuffle_shards(sf_dir):
    """Deterministic global shuffle + training-shard assignment over the
    corpus (doc_id, shard, pos) — rank via ordered hash-range buckets,
    no global sort."""
    from .shuffle import shuffle_shard_ranks

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    return shuffle_shard_ranks(docs, shard_size=SHARD_SIZE)


def q_dedup_incremental(sf_dir):
    """Two-phase incremental exact dedup: even doc_ids build a persisted
    bucketed fingerprint index, odd doc_ids then ingest against it —
    novel survivors (min id per unseen fp) come back, and their fps are
    appended to the index (idempotent per-bucket files)."""
    import tempfile

    from .dedup import build_fp_index, incremental_dedup

    fp = q_text_fingerprint(sf_dir).materialize()  # two consumers

    def half(even: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array((ids % 2 == 0) == even))
        return f

    idx_dir = tempfile.mkdtemp(prefix="fpindex_", dir="/tmp")
    build_fp_index(fp.map_batches(half(True), batch_format="pyarrow"),
                   idx_dir)
    return incremental_dedup(
        fp.map_batches(half(False), batch_format="pyarrow"), idx_dir)


def q_dedup_paragraph(sf_dir):
    """CCNet-style paragraph dedup (dedup.paragraph_dedup): fixed
    word-window segmentation, corpus-wide first-occurrence winners by
    (doc_id, chunk_id), Arrow list-join rebuild — two coarse-bucket
    shuffles, Dataset result."""
    from .dedup import paragraph_dedup

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return paragraph_dedup(docs)


CM_TOP_K = 20


def q_text_feature_hash(sf_dir):
    """Feature-hashed document vectors (text.feature_hash_vectors):
    signed hashed bag-of-words into 16 dims, exact integers in sparse
    long form.  Oracle: _feature_hash_sql — the text_cm HUGEINT
    word-hash chain per distinct token joined to per-doc counts."""
    from .text import feature_hash_vectors

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return feature_hash_vectors(docs)


def q_text_cm(sf_dir):
    """Count-Min sketch heavy-hitter report (sketch.count_min_sketch):
    bounded mergeable register matrix from map-side partials, then for
    the top-20 true-count tokens the sketch point estimate next to the
    exact count (estimate >= truth always; equality when no collision).
    All integer math — the oracle reproduces registers exactly."""
    from .sketch import CM_D, CM_W, cm_estimate, count_min_sketch
    from .text import _batch_word_hashes

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    regs = count_min_sketch(docs)

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_lower(_arr(b["text"])), r"[ \t\n]+"))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        vc = _arr(toks.value_counts())
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(CM_TOP_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    top = (counts.map_batches(local_top, batch_format="pyarrow")
           .to_pandas()
           .sort_values(["n", "token"], ascending=[False, True],
                        kind="mergesort").head(CM_TOP_K)
           .reset_index(drop=True))
    wd, h, _ = _batch_word_hashes(top["token"].tolist())
    assert len(h) == len(top)  # tokens are single nonempty words
    est = np.empty(len(top), np.int64)
    est[wd] = cm_estimate(regs, h)
    return pd.DataFrame({"token": top["token"],
                         "true_count": top["n"].to_numpy(np.int64),
                         "cm_estimate": est})


def q_dedup_ppjoin(sf_dir):
    """Exact set-similarity join (dedup.ppjoin_pairs, prefix filtering):
    zero-recall-loss Jaccard >= 0.8 pairs over char-5-gram sets — the
    no-cap exact sibling of dedup_jaccard; the SQL twin is the full
    brute-force join, so the driver gate proves the prefix filter
    misses nothing."""
    from .dedup import PPJOIN_TAU, ppjoin_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    out = ppjoin_pairs(docs, threshold=PPJOIN_TAU)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas().sort_values(["a", "b"]) \
            .reset_index(drop=True)
    out["jaccard"] = np.round(out["jaccard"].to_numpy(np.float64), 6)
    return out


def q_table_diff(sf_dir):
    """Data reconciliation (joins.table_diff): full-outer diff of the
    raw documents table against the paragraph-deduped corpus — one
    union-tag coarse-bucket shuffle, exact string comparison, per-key
    status (removed = doc lost every paragraph)."""
    from .dedup import paragraph_dedup
    from .joins import table_diff

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    clean = paragraph_dedup(docs).map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "text": b["clean_text"]}),
        batch_format="pyarrow")
    return table_diff(docs, clean, key="doc_id", value="text")


def q_events_movavg(sf_dir):
    """Trailing moving average (windows.moving_average): per-user
    5-row window over (ts, event_id) order, exact integer-cents window
    sums via cumsum differences, identical float division both sides."""
    from .windows import moving_average

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "ts",
                                     "value"])
    return moving_average(ev)


def q_tpch_part_share(sf_dir):
    """Q11-like value concentration (relational.
    part_value_concentration): per-part exact-integer value aggregate
    with a scalar-subquery share threshold, broadcast grand total."""
    return _REL.part_value_concentration(sf_dir)


def q_dedup_minhash(sf_dir):
    import ray.data as rd

    from .dedup import minhash_dedup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return minhash_dedup_pairs(docs, threshold=0.5)[["a", "b"]]


def q_dedup_report(sf_dir):
    """Corpus dedup health report (one row): doc count, distinct exact
    fingerprints, exact-dup surplus + ratio, and the minhash near-dup
    pair count at 0.5 — the summary a cleaning run logs before/after.
    Exact-distinct via the sha groupby already used by dedup_exact;
    pair count reuses minhash_dedup_pairs."""
    from .dedup import exact_dedup, minhash_dedup_pairs
    from .hashing import add_sha256

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"]).materialize()
    n_docs = docs.count()
    sha = docs.map_batches(lambda b: add_sha256(b, col="text"),
                           batch_format="pyarrow")
    n_distinct = exact_dedup(sha, key="sha256", id_col="doc_id").count()
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    n_pairs = len(pairs) if isinstance(pairs, pd.DataFrame) \
        else pairs.count()
    return pd.DataFrame({
        "n_docs": np.array([n_docs], np.int64),
        "n_distinct": np.array([n_distinct], np.int64),
        "n_exact_dupes": np.array([n_docs - n_distinct], np.int64),
        "n_minhash_pairs": np.array([n_pairs], np.int64),
        "exact_dup_ratio": [round((n_docs - n_distinct) / n_docs, 6)]})


def q_tpch_discount(sf_dir):
    """Q19-like OR-of-ANDs discounted revenue
    (relational.discounted_revenue): broadcast brand-code lookup, one
    fact scan, single-sum map-side partials."""
    return _REL.discounted_revenue(sf_dir)


def q_dedup_simhash(sf_dir):
    import ray.data as rd

    from .dedup import simhash_dedup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return simhash_dedup_pairs(docs, max_hamming=8)[["a", "b"]]


def q_dedup_substr(sf_dir):
    """Exact substring-duplication pairs (dedup.substring_dup_pairs):
    30-char windows sampled every 7 positions, df-capped at 64 docs;
    (a, b, n_shared) with n_shared = distinct shared window hashes.
    Oracle re-derives the identical uint64 polynomial window hash in
    HUGEINT (_substr_sql), so the match is collision-proof."""
    from .dedup import substring_dup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return substring_dup_pairs(docs)


def q_dedup_edit(sf_dir):
    """Edit-similarity near-dups (dedup.edit_dup_pairs): MinHash
    candidates re-verified by exact byte-level Levenshtein similarity
    >= 0.8 (DuckDB levenshtein() is byte-based; kernel parity is exact
    integers + one division, so the filter can never disagree)."""
    from .dedup import edit_dup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return edit_dup_pairs(docs)


def q_dedup_ngram(sf_dir):
    import ray.data as rd

    from .dedup import ngram_jaccard_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.4)[["a", "b"]]


def q_dedup_jaccard(sf_dir):
    """Exact inverted-index n-gram Jaccard (dedup.exact_jaccard_pairs) —
    the oracle-checked member of the near-dup family: deterministic
    candidates (docs sharing a char-5-gram, df-cap 64) + exact Jaccard
    >= 0.5 over full shingle sets, reproduced shingle-for-shingle by the
    DuckDB oracle."""
    from .dedup import exact_jaccard_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    pdf = exact_jaccard_pairs(docs, k=5, threshold=0.5, cap=64)
    pdf["jaccard"] = pdf["jaccard"].round(6)
    return pdf


# -------------------------------------------------------- embedding queries

def q_ann_topk(sf_dir):
    import ray.data as rd

    from .ann import brute_force_topk, queries_from_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    q, qi = queries_from_ids(emb, ANN_QUERY_IDS)
    out = brute_force_topk(emb, q, qi, k=ANN_K)
    out["cosine"] = out["cosine"].round(6)
    return out


def q_ann_lsh(sf_dir):
    """Sign-LSH ANN over the physically bucketed index (ann.lsh_topk):
    probe = own bucket + hamming-1 neighbors.  Deterministic end to end,
    so unlike ann_ivf the scale path itself is oracle-checked: _ann_lsh_sql
    recomputes codes from the same literal hyperplanes."""
    from .ann import lsh_topk, queries_from_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    q, qi = queries_from_ids(emb, ANN_QUERY_IDS)
    out = lsh_topk(emb, q, qi, k=ANN_K, n_planes=ANN_LSH_PLANES)
    out["cosine"] = out["cosine"].round(6)
    return out


def q_ann_pq(sf_dir):
    """Product-quantization ADC top-k (ann.pq_topk): per-subspace
    seeded Lloyd codebooks (full-corpus rounds), one stateless encode +
    LUT-gather pass, tie-aware partial top-k.  The memory-compressed
    ANN lane (4 uint8 codes per 64-dim vector)."""
    from .ann import pq_topk

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    return pq_topk(emb, query_ids=ANN_QUERY_IDS, k_nn=ANN_K)


def q_ann_ivf(sf_dir):
    import ray.data as rd

    from .ann import ivf_topk, queries_from_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    q, qi = queries_from_ids(emb, ANN_QUERY_IDS)
    return ivf_topk(emb, q, qi, k=ANN_K)[["query_id", "neighbor_id"]]


def q_embed_dup_pairs(sf_dir):
    import ray.data as rd

    from .dedup import embedding_dup_pairs_gated

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    # gated: exact broadcast matmul at sf scale, LSH-bucketed above
    # EMBED_BROADCAST_ELEMS (VERDICT r2 #1)
    out = embedding_dup_pairs_gated(emb, threshold=EMB_DUP_TAU)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    out["cosine"] = out["cosine"].round(6)
    return out


def q_embed_centroids(sf_dir):
    """Per-label centroids of L2-normalized embeddings
    (ann.label_centroids): map-side partial sums, one small groupby;
    long output (label, i, c, n)."""
    from .ann import label_centroids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])
    return label_centroids(emb)


SEMDEDUP_ROUNDS = 15


def q_semantic_dedup(sf_dir):
    """Transitive semantic dedup over the embedding table: cosine pairs
    >= EMB_DUP_TAU -> similarity graph -> connected components on the
    SUPERSTEP ENGINE -> keep each component's min vec_id
    (dedup.semantic_dedup_ids — the two-subsystem composition).
    Oracle: _semdedup_sql (pair join + unrolled min-label CC)."""
    from .dedup import semantic_dedup_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    n = int(emb.max("vec_id")) + 1
    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    kept, rep = semantic_dedup_ids(
        emb, n, _store_root(sf_dir, "semdedup"), threshold=EMB_DUP_TAU,
        fingerprint=f"{st.st_mtime_ns}:{st.st_size}")
    if rep is not None:
        _check_unroll(rep, SEMDEDUP_ROUNDS, "semantic_dedup")
    return kept


KNN_CC_ROUNDS = 40


def q_embed_knn_cc(sf_dir):
    """Semantic clustering: approximate kNN graph over the embedding
    corpus (ann.knn_graph_edges — sign-LSH hamming<=1 candidates, one
    bucket shuffle, never all-pairs) -> connected components on the
    SUPERSTEP ENGINE -> (v, label).  The embeddings->graph composition
    a corpus-clustering pipeline runs.  Oracle: _knn_cc_sql (hamming
    join + per-vector top-k + unrolled min-label CC)."""
    from .algos import connected_components
    from .ann import KNN_GRAPH_K, knn_graph_edges
    from .graph import load_undirected, suggest_partitions

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    n = int(emb.max("vec_id")) + 1
    edges = knn_graph_edges(emb)
    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    eng = load_undirected(edges, n,
                          suggest_partitions(2 * n * KNN_GRAPH_K, 4),
                          _store_root(sf_dir, "knncc"),
                          fingerprint=f"knn:{st.st_mtime_ns}:{st.st_size}")
    rep = connected_components(eng)
    _check_unroll(rep, KNN_CC_ROUNDS, "embed_knn_cc")
    return _state_result(eng, "label", "label")


DUPCC_ROUNDS = 12


def q_dedup_clusters(sf_dir):
    """Near-dup cluster ASSIGNMENT for every document (the artifact a
    100-TB cleaning run materializes): MinHash+LSH verified pairs ->
    similarity graph -> connected components on the superstep engine ->
    (doc_id, cluster_id = component min; singletons keep themselves).
    Oracle: the full HUGEINT minhash pair SQL nested under the same
    unrolled min-label CC recurrence as _semdedup_sql."""
    from .dedup import minhash_cluster_ids

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    n = int(docs.max("doc_id")) + 1
    clusters, rep = minhash_cluster_ids(
        docs, n, _store_root(sf_dir, "dupcc"), threshold=0.5,
        fingerprint=_input_fingerprint(sf_dir))
    if rep is not None:
        _check_unroll(rep, DUPCC_ROUNDS, "dedup_clusters")
    return clusters


# --------------------------------------------------------- relational (TPC-H)

def q_tpch_pricing(sf_dir):
    from .relational import pricing_summary

    return pricing_summary(sf_dir)


def q_tpch_top_orders(sf_dir):
    from .relational import top_orders

    return top_orders(sf_dir)


def q_tpch_nation_revenue(sf_dir):
    from .relational import nation_revenue

    return nation_revenue(sf_dir)


def q_tpch_order_rank(sf_dir):
    """Windowed relational query: top-3 orders per customer via map-side
    prune + one groupby(custkey).map_groups re-rank (the Ray-native
    row_number-over-partition shape, relational.top_orders_per_customer)."""
    from .relational import top_orders_per_customer

    return top_orders_per_customer(sf_dir)


# ------------------------------------------------------------ events window

def _events(sf_dir):
    import ray.data as rd

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                           columns=["user_id", "ts", "value"])


def q_tpch_priority_count(sf_dir):
    """TPC-H Q4-like: quarter-windowed orders with an EXISTS
    large-quantity lineitem (size-gated semi join), counted per
    priority (relational.order_priority_count)."""
    return _REL.order_priority_count(sf_dir)


def q_tpch_priority_buckets(sf_dir):
    """TPC-H Q12-like: year of lineitems joined to orders via the gated
    lookup join, CASE-bucketed high/low priority line counts per
    returnflag (relational.shipmode_priority_buckets)."""
    return _REL.shipmode_priority_buckets(sf_dir)


def q_tpch_returned_revenue(sf_dir):
    """TPC-H Q10-like: top-20 customers by revenue of returned items in
    a half-year order window (relational.returned_revenue_topk — one
    lineitem x orders shuffle join, one custkey aggregate, one customer
    hash join, distributed sort + limit)."""
    return _REL.returned_revenue_topk(sf_dir)


def q_tpch_large_orders(sf_dir):
    """TPC-H Q18-like: per-order quantity sums (combiner pushdown) +
    HAVING filter + one hash join for the customer key."""
    return _REL.large_orders(sf_dir)


NO_ORDERS_MIN_PRICE = 400_000.0


def q_tpch_promo(sf_dir):
    """Q14-like promo revenue share per ship month (relational.
    promo_share_by_month): broadcast part-type lookup + 12-bucket
    map-side partials, no fact shuffle."""
    return _REL.promo_share_by_month(sf_dir)


def q_tpch_volume(sf_dir):
    """Q7-like nation-pair shipping volume per year (relational.
    volume_shipping): broadcast dimension lookups, one fact hash join,
    map-side partial aggregate."""
    return _REL.volume_shipping(sf_dir)


def q_tpch_custdist(sf_dir):
    """Q13-like LEFT-join order-count distribution
    (relational.order_count_distribution): coarse-bucket count shuffle,
    per-bucket histogram emission, driver zero-bin arithmetic."""
    return _REL.order_count_distribution(sf_dir)


def q_tpch_top_supplier(sf_dir):
    """Q15-like max-revenue supplier (relational.top_supplier): dense
    bincount partials over the bounded supplier dimension, exact
    integer price-units so the max-equality filter is float-proof."""
    return _REL.top_supplier(sf_dir)


def q_tpch_small_qty(sf_dir):
    """Q17-like small-quantity revenue (relational.
    small_quantity_revenue): per-part avg broadcast back onto a second
    fact scan, all comparisons in exact integers."""
    return _REL.small_quantity_revenue(sf_dir)


def q_tpch_cust_no_orders(sf_dir):
    """Anti-join (joins.anti_join, TPC-H Q22 shape): customers with no
    large order (o_totalprice > 400k — every customer has SOME order in
    this synth data, so the unfiltered anti-join would be empty).
    Size-gated: broadcast distinct order custkeys under
    SEMI_BROADCAST_CAP (this scale), coarse key-bucket shuffle above —
    both plans asserted equal in tests/test_joins.py."""
    import pyarrow.compute as pc

    from .joins import anti_join

    cust = read_parquet_clean(os.path.join(sf_dir, "customer.parquet"),
                              columns=["c_custkey", "c_name", "c_acctbal"])
    ords = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                              columns=["o_custkey", "o_totalprice"])
    ords = ords.map_batches(
        lambda b: pa.table({"c_custkey": b.filter(pc.greater(
            b["o_totalprice"], NO_ORDERS_MIN_PRICE))["o_custkey"]}),
        batch_format="pyarrow")
    out = anti_join(cust, ords, key="c_custkey")
    return out.map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"],
                            "c_name": b["c_name"],
                            "c_acctbal": pc.round(b["c_acctbal"], 6)}),
        batch_format="pyarrow")


def q_tpch_waiting(sf_dir):
    """Q21-like waiting suppliers (relational.waiting_suppliers):
    correlated EXISTS + NOT EXISTS over the same fact table,
    reformulated as per-order aggregates in one coarse-bucket shuffle."""
    return _REL.waiting_suppliers(sf_dir)


def q_tpch_parts_shipped(sf_dir):
    """Semi-join (joins.semi_join): parts with at least one lineitem
    (EXISTS), same size-gated plan pair as the anti-join."""
    import pyarrow.compute as pc

    from .joins import semi_join

    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_partkey", "p_retailprice"])
    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_partkey"])
    li = li.map_batches(
        lambda b: pa.table({"p_partkey": b["l_partkey"]}),
        batch_format="pyarrow")
    out = semi_join(part, li, key="p_partkey")
    return out.map_batches(
        lambda b: pa.table({"p_partkey": b["p_partkey"],
                            "p_retailprice": pc.round(b["p_retailprice"],
                                                      6)}),
        batch_format="pyarrow")


def q_tpch_bloom_semijoin(sf_dir):
    """Bloom semi-join (joins.bloom_semi_join): lineitems of URGENT
    orders via a broadcast Bloom-bitmap prefilter + exact verify —
    the wide exchange sees only probable matches.  Result is exact
    (no false negatives; positives verified), so the oracle is a
    plain EXISTS; aggregated per returnflag to keep the result small."""
    from ray.data.aggregate import Sum

    from .joins import bloom_semi_join

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_quantity",
                                     "l_returnflag"])
    urgent = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'").map_batches(
        lambda b: pa.table({"l_orderkey": b["o_orderkey"]}),
        batch_format="pyarrow")
    hit = bloom_semi_join(li, urgent, key="l_orderkey")

    def agg(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("l_returnflag")["l_quantity"].agg(["count", "sum"])
        return pa.table({
            "l_returnflag": pa.array(g.index.to_numpy(object)),
            "n_items": pa.array(g["count"].to_numpy(np.int64)),
            "sum_qty": pa.array(g["sum"].to_numpy(np.float64))})

    out = hit.map_batches(agg, batch_format="pyarrow") \
             .groupby("l_returnflag") \
             .aggregate(Sum("n_items", alias_name="n_items"),
                        Sum("sum_qty", alias_name="sum_qty"))
    return out.map_batches(
        lambda b: pa.table({"l_returnflag": b["l_returnflag"],
                            "n_items": b["n_items"],
                            "sum_qty": pc.round(b["sum_qty"], ndigits=6)}),
        batch_format="pyarrow")


PACK_SEQ_LEN = 512


def q_pack_sequences(sf_dir):
    """Sequence packing (packing.pack_sequences): concatenate-and-chunk
    token spans over documents in doc_id order, seq_len=512.  Oracle:
    window cumsum over doc_id + chunk arithmetic."""
    from .packing import pack_sequences
    from .text import add_token_count

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    counted = docs.map_batches(add_token_count, batch_format="pyarrow") \
                  .select_columns(["doc_id", "n_tokens"])
    return pack_sequences(counted, seq_len=PACK_SEQ_LEN)


def q_media_audio(sf_dir):
    """REAL audio decode lane: deterministic RIFF/WAVE 16-bit PCM files
    derived from the documents (multimodal.audio_from_documents), parsed
    by the actual WAV decoder (multimodal.WavDecodeStage) in an actor
    pool — not the stub seam.  The oracle recomputes every stat from the
    generator's closed form, so the gate verifies decode(encode(x))."""
    from .multimodal import audio_from_documents, decode_audio

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return decode_audio(audio_from_documents(docs))


def q_media_image(sf_dir):
    """REAL image decode lane: deterministic 24-bit BMP files derived
    from the documents, parsed by the actual BMP decoder
    (multimodal.BmpDecodeStage) in an actor pool.  Oracle recomputes
    width/height/channel means from the generator's closed form."""
    from .multimodal import decode_images, images_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return decode_images(images_from_documents(docs))


def q_media_spectral(sf_dir):
    """REAL DSP lane: WAV PCM decode -> per-clip rfft -> DC + DFT
    magnitudes at bins {1,2,4,8,16}, |X_k|/n rounded to 3
    (multimodal.SpectralStage).  The oracle recomputes every bin as
    explicit cos/sin DFT sums over the generator's closed-form samples;
    FFT-vs-naive float divergence is ~1e-9 abs against a 5e-4 rounding
    slack."""
    from .multimodal import audio_from_documents, spectral_features

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return spectral_features(audio_from_documents(docs))


MEDIA_RESIZE_TARGET = 8


def q_media_resize(sf_dir):
    """REAL image resize lane: BMP decode + nearest-neighbor downsample
    to an 8x8 grid (multimodal.BmpResizeStage, actor pool) + exact
    channel means of the resized image.  Oracle recomputes the gathered
    generator pixels (sy = ty*h//8, sx = tx*w//8) in closed form."""
    from .multimodal import images_from_documents, resize_images

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return resize_images(images_from_documents(docs),
                         target=MEDIA_RESIZE_TARGET)


def q_media_phash(sf_dir):
    """REAL perceptual image hashing: BMP decode -> 8x9 grayscale grid
    -> 64 dHash gradient bits (multimodal.DHashStage, actor pool);
    exact-integer closed-form oracle (pixels, gathers and comparisons
    all integer arithmetic)."""
    from .multimodal import images_from_documents, perceptual_hashes

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return perceptual_hashes(images_from_documents(docs))


def q_media_energy(sf_dir):
    """REAL audio energy analysis: WAV decode -> full 64-sample
    windows -> exact int64 sum-of-squares stats per clip
    (multimodal.EnergyWindowStage, actor pool)."""
    from .multimodal import audio_from_documents, energy_windows

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return energy_windows(audio_from_documents(docs))


def q_media_scenes(sf_dir):
    """REAL temporal video analysis: Y4M demux of every frame ->
    scene-cut detection via all-integer mean-luma deltas
    (multimodal.SceneCutStage, actor pool); per clip
    (n_frames, n_cuts, first_cut)."""
    from .multimodal import detect_scene_cuts, videos_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return detect_scene_cuts(videos_from_documents(docs))


MEDIA_DEDUP_HAMMING = 2


def q_media_dedup(sf_dir):
    """Image near-dup pairs: dHash signatures (real BMP decode) ->
    4x16-bit block buckets -> hamming <= 2 (dedup.hamming_dup_pairs —
    recall EXACT by pigeonhole at this threshold, cap mirrored in
    SQL)."""
    from .dedup import hamming_dup_pairs
    from .multimodal import images_from_documents, perceptual_hashes

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    sigs = perceptual_hashes(images_from_documents(docs))
    return hamming_dup_pairs(sigs, max_hamming=MEDIA_DEDUP_HAMMING)


def q_media_video(sf_dir):
    """REAL video demux lane: deterministic YUV4MPEG2 (raw planar
    YUV420) streams derived from the documents, demuxed frame by frame
    by multimodal.Y4mFrameStage, sampling every 2nd frame and emitting
    exact mean luma.  Oracle recomputes from the generator closed form."""
    from .multimodal import demux_video_frames, videos_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return demux_video_frames(videos_from_documents(docs))



def q_events_late(sf_dir):
    """Watermark late-event detection (windows.watermark_late_events):
    per-user running-max watermark in simulated arrival order (the
    deterministic event_id avalanche — the synth table has no ingest
    sequence), exact integer-microsecond lateness."""
    from .windows import watermark_late_events

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "ts"])
    return watermark_late_events(ev)


def q_events_window(sf_dir):
    from .windows import tumbling_window

    return tumbling_window(_events(sf_dir), size_s=3600)


def q_events_sliding(sf_dir):
    from .windows import sliding_window

    return sliding_window(_events(sf_dir), size_s=7200, slide_s=3600)


def q_events_session(sf_dir):
    from .windows import session_window

    return session_window(_events(sf_dir), gap_s=1800)


def q_events_running(sf_dir):
    """Per-user running cumulative value (window scan), exact integer
    cents, deterministic (ts, event_id) order."""
    from .windows import running_user_totals

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "user_id",
                                     "value"])
    return running_user_totals(ev)


def q_events_rollup(sf_dir):
    """Three-level ROLLUP aggregate (type x day -> type -> grand total);
    exact integer-cents sums, map-side partials, no shuffle."""
    import ray.data as rd

    from .windows import rollup_events

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type", "value"])
    return rollup_events(ev)


def q_events_cube(sf_dir):
    """Full CUBE(event_type, day) — all four grouping sets; same exact
    integer-cents map-side-partial shape as the ROLLUP."""
    from .windows import cube_events

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type", "value"])
    return cube_events(ev)


def q_events_lag(sf_dir):
    """Per-user LAG deltas (value - LAG(value), ts - LAG(ts), both exact
    int64 cents/us) over the deterministic (ts, event_id) order — the
    LEAD/LAG window-scan shape (windows.lag_deltas)."""
    from .windows import lag_deltas

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "user_id",
                                     "value"])
    return lag_deltas(ev)


EVENT_QUANTILES = [0.01, 0.25, 0.5, 0.9, 0.99]


def q_events_quantiles(sf_dir):
    """Exact event-value quantiles via iterative histogram bracketing
    (quantiles.exact_quantiles) — order statistics without a global
    sort; index rule identical to DuckDB quantile_disc so the oracle is
    exact."""
    from .quantiles import exact_quantiles

    out = exact_quantiles(_events(sf_dir), "value", EVENT_QUANTILES)
    out["val"] = out["val"].round(6)
    return out


def q_events_cont_quantiles(sf_dir):
    """Interpolated (continuous) quantiles — percentile_cont semantics:
    h = q*(n-1), linear interpolation between the two bracketing order
    statistics, both resolved in ONE shared histogram-bracketing sweep
    (quantiles.interpolated_quantiles)."""
    from .quantiles import interpolated_quantiles

    return interpolated_quantiles(_events(sf_dir), "value",
                                  EVENT_QUANTILES)


GAP_QUANTILES = [0.1, 0.5, 0.9, 0.99]


def q_events_interarrival(sf_dir):
    """Inter-arrival distribution: per-user gaps between consecutive
    events (microseconds, the markov_transitions ordered-scan shape)
    feeding the shared-sweep continuous-quantile machinery — the
    latency/engagement profile report.  One coarse user-bucket shuffle
    producing a gaps Dataset, then histogram-bracketing quantiles."""
    from .algos.triangles import n_buckets_for
    from .quantiles import interpolated_quantiles

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"]).materialize()
    nb = n_buckets_for(ev.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(k),
                         "us": pc.cast(b["ts"], pa.int64()),
                         "event_id": b["event_id"],
                         "kb": pa.array((k % nb).astype(np.int64))})

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        k = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        ev_ = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((ev_, us, k))
        k, us = k[order], us[order]
        same = k[1:] == k[:-1]
        return pd.DataFrame({"gap_us": (us[1:] - us[:-1])[same]})

    gaps = ev.map_batches(tag, batch_format="pyarrow") \
             .groupby("kb").map_groups(scan, batch_format="pandas")
    return interpolated_quantiles(gaps, "gap_us", GAP_QUANTILES)


BLOOM_PROBES_ABSENT = [f"absent-probe-{i}" for i in range(10)]


def q_sketch_bloom(sf_dir):
    """Bloom-filter membership (sketch.bloom_membership): filter built
    over sha256(text) with 4 x 64-bit-slice positions, probes = the
    first 10 document texts (present) + 10 synthetic strings (absent
    up to the false-positive rate).  Integer-exact SQL twin."""
    from .sketch import bloom_membership

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    present = [r["text"] for r in docs.filter(
        expr="doc_id < 10").take_all()]
    return bloom_membership(docs, present + BLOOM_PROBES_ABSENT)


def q_sketch_hll_daily(sf_dir):
    """Per-day HLL distinct actives (sketch.hll_daily_users): the
    mergeable streaming-sketch DAU — register partials per block,
    days x 64 register fold on the driver, linear-counting-corrected
    estimate per day.  Register math is integer-exact in SQL."""
    from .sketch import hll_daily_users

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return hll_daily_users(ev)


def q_sketch_intersection(sf_dir):
    """KMV / theta-sketch set-intersection estimate
    (sketch.kmv_intersection): distinct purchasers vs distinct viewers
    and their overlap, from two mergeable bottom-k sha sketches — the
    "audience overlap without a distinct-join" op.  Register state is
    sha256 order statistics, bit-exact in SQL."""
    from .sketch import kmv_intersection

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_type"])
    return kmv_intersection(ev, "purchase", "view")


def q_events_anomaly_days(sf_dir):
    """Per-day count z-scores over the event stream
    (windows.daily_anomalies): calendar-bounded map-side partials;
    bit-equal float statistics from exact integers."""
    from .windows import daily_anomalies

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts"])
    return daily_anomalies(ev)


BM25_TERMS = ["table", "merge", "window"]
BM25_K = 15


def q_text_bm25(sf_dir):
    """BM25 relevance top-15 for a fixed term query (text.bm25_topk):
    O(|query|) corpus-stats partials, broadcast idf/avgdl, one scoring
    pass with tie-aware partial top-k — the search-relevance lane."""
    from .text import bm25_topk

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return bm25_topk(docs, BM25_TERMS, k=BM25_K)


def q_events_dau(sf_dir):
    """Weekly engagement (windows.dau_wau): per-user-bucket exact
    (user, day)/(user, week) dedup, tiny per-day partials, driver
    merge — WAU, mean DAU and stickiness per ISO week."""
    from .windows import dau_wau

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return dau_wau(ev)


def q_events_ab_test(sf_dir):
    """Welch t-test between the deterministic user_id%2 A/B split
    (windows.ab_test): one stateless (n, sum, sumsq) partial pass."""
    from .windows import ab_test

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "value"])
    return ab_test(ev)


def q_events_rank(sf_dir):
    """Global row_number() OVER (ORDER BY value, event_id) without a
    global sort (quantiles.global_value_ranks): exact quantile
    boundaries range-partition the domain, per-bucket counts prefix-sum
    on the driver, buckets rank locally + offset."""
    from .quantiles import global_value_ranks

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "value"])
    return global_value_ranks(ev, "value", "event_id")


USER_QUANTILES = [0.5, 0.9]


def q_events_user_quantiles(sf_dir):
    """Exact per-user value quantiles (quantiles.grouped_quantiles):
    one coarse key-bucket shuffle, one sort per bucket, vectorized
    per-segment rank selection."""
    from .quantiles import grouped_quantiles

    out = grouped_quantiles(_events(sf_dir), "user_id", "value",
                            USER_QUANTILES)
    return out.map_batches(
        lambda b: pa.table({"user_id": b["user_id"], "q": b["q"],
                            "val": pc.round(b["val"], ndigits=6)}),
        batch_format="pyarrow")


def _events_typed(sf_dir, event_type: str, columns: list[str]):
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=columns + ["event_type"])
    want = event_type

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b["event_type"], want)).select(columns)

    return ev.map_batches(keep, batch_format="pyarrow")


def q_events_asof(sf_dir):
    """As-of join (joins.asof_join): each click event attaches the
    user's latest purchase at-or-before its timestamp; ties at the same
    ts break toward the largest purchase event_id.  -1 / 0.0 sentinel
    where no purchase precedes (so both sides hash as non-null
    int64/float64)."""
    import pyarrow.compute as pc

    from .joins import asof_join

    left = _events_typed(sf_dir, "click", ["event_id", "user_id", "ts"])
    right = _events_typed(sf_dir, "purchase",
                          ["event_id", "user_id", "ts", "value"])
    out = asof_join(left, right, key="user_id", ts="ts",
                    left_cols=["event_id"],
                    right_cols={"event_id": "match_id",
                                "value": "match_value"},
                    tie_col="event_id")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "match_id": pc.cast(
                pc.fill_null(pc.round(b["match_id"], 0), -1), pa.int64()),
            "match_value": pc.round(
                pc.fill_null(b["match_value"], 0.0), 6)})

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_range(sf_dir):
    """Range join + aggregate (joins.range_agg_join): each error event
    counts and sums the same user's view events in the trailing 10
    minutes (both interval ends inclusive)."""
    import pyarrow.compute as pc

    from .joins import range_agg_join

    left = _events_typed(sf_dir, "error", ["event_id", "user_id", "ts"])
    right = _events_typed(sf_dir, "view", ["user_id", "ts", "value"])
    out = range_agg_join(left, right, key="user_id", ts="ts",
                         left_cols=["event_id"], value_col="value",
                         window_us=600 * 1_000_000)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "n_matches": b["n_matches"],
            "sum_value": pc.round(b["sum_value"], 6)})

    return out.map_batches(finish, batch_format="pyarrow")


FUNNEL_STAGES = ["view", "click", "purchase"]
FUNNEL_WINDOW_S = 86_400  # 24h conversion window from funnel entry


def q_events_funnel(sf_dir):
    """Ordered conversion funnel (windows.funnel_counts): users reaching
    view -> click-after-view -> purchase-after-that, each within 24h of
    the user's funnel entry (first view); disjoint user buckets,
    per-bucket vectorized min-reductions, driver merge of the tiny
    (bucket x stage) partials."""
    from .windows import funnel_counts

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, FUNNEL_STAGES, window_s=FUNNEL_WINDOW_S)


RETENTION_MAX_OFFSET = 7


def q_events_retention(sf_dir):
    """Cohort retention (windows.retention_cohorts): cohort_day = first
    active epoch-day per user; users active at each day offset 0..7."""
    from .windows import retention_cohorts

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return retention_cohorts(ev, max_offset=RETENTION_MAX_OFFSET)


COHORT_MAX_WEEKS = 8


def q_events_cohort_revenue(sf_dir):
    """Cohort LTV (windows.cohort_revenue): revenue in exact integer
    cents + event count per (first-active-week cohort, week offset) —
    the classic lifetime-value matrix next to events_retention's user
    counts.  Disjoint-user-bucket shuffle, driver sums tiny partials."""
    from .windows import cohort_revenue

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
    return cohort_revenue(ev, max_offset=COHORT_MAX_WEEKS)


PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir):
    """Wide per-user pivot (windows.pivot_user_counts): count +
    integer-cents sum per event type as columns; map-side partial pivot,
    coarse user-bucket merge, Dataset out."""
    from .windows import pivot_user_counts

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_type", "value"])
    return pivot_user_counts(ev, PIVOT_TYPES)


KMEANS_K = 8
KMEANS_ITERS = 4


def q_embed_kmeans(sf_dir):
    """Full-corpus distributed Lloyd k-means (ann.kmeans_full): one
    distributed pass per round (broadcast centroids, map-side k x d
    partial sums), KMEANS_ITERS rounds from the seeded init; oracle
    unrolls the identical rounds (_kmeans_full_sql)."""
    from .ann import kmeans_full

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    return kmeans_full(vecs, n_centroids=KMEANS_K, iters=KMEANS_ITERS)


def q_embed_project(sf_dir):
    """Per-vector projection onto the PCA top direction
    (ann.pca_project): Gram pass + broadcast direction + stateless
    per-batch dot; Dataset out."""
    from .ann import pca_project

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    return pca_project(vecs, iters=PCA_ITERS)


def q_embed_pca(sf_dir):
    """Top principal direction via deterministic power iteration on the
    distributed Gram matrix (ann.pca_power_top, PCA_ITERS steps from the
    fixed 1/sqrt(d) init); oracle unrolls the identical matvec chain."""
    from .ann import pca_power_top

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["embedding"])
    return pca_power_top(vecs, iters=PCA_ITERS)


DECAY_REF = "2024-02-01"
DECAY_TAU_S = 7 * 86_400


def q_events_decay(sf_dir):
    """Time-decayed per-user value sums at a fixed reference instant:
    sum(value * exp(-(T - ts)/tau)) over events at/before T — the
    recency-weighted aggregate a feature store keeps.  One pruned read,
    one per-user Sum aggregate (map-side combiners); weight arithmetic
    is the identical exact-integer microsecond expression + one libm
    exp on both sides."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
    # UTC-naive microseconds, same value as SQL epoch_us(TIMESTAMP ...)
    ref_us = np.datetime64(DECAY_REF, "us").astype(np.int64)
    tau_us = float(DECAY_TAU_S) * 1e6

    def weight(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = us <= ref_us
        us = us[keep]
        v = b["value"].to_numpy(zero_copy_only=False)[keep]
        u = b["user_id"].to_numpy(zero_copy_only=False)[keep]
        w = v * np.exp(-((ref_us - us) / tau_us))
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "wv": pa.array(w, pa.float64())})

    from ray.data.aggregate import Sum

    agg = ev.map_batches(weight, batch_format="pyarrow")             .groupby("user_id").aggregate(Sum("wv", alias_name="decayed"))
    return agg.map_batches(
        lambda b: pa.table({"user_id": b["user_id"],
                            "decayed": pc.round(b["decayed"], 6)}),
        batch_format="pyarrow")


OUTLIER_T = 3.0


def q_events_outliers(sf_dir):
    """Per-user z-score outliers (windows.zscore_outliers): |v - mean|
    > 3 * population std, moments AND filter in one coarse user-bucket
    kernel; explicit sum/sumsq formula so the oracle is the identical
    expression."""
    from .windows import zscore_outliers

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "user_id", "value"])
    return zscore_outliers(ev, threshold=OUTLIER_T)


PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value",
                "props"]


MELT_COLS = ["n_click", "n_error", "n_purchase", "n_signup", "n_view"]


def q_events_melt(sf_dir):
    """UNPIVOT/melt — the inverse reshape of events_pivot: the wide
    per-user count columns back to long (user_id, metric, n) rows, one
    vectorized repeat/tile per batch (no per-row Python)."""
    from .windows import pivot_user_counts

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "event_type", "value"])
    wide = pivot_user_counts(ev, PIVOT_TYPES)

    def melt(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        k = len(MELT_COLS)
        vals = np.stack([b[c].to_numpy(zero_copy_only=False)
                         for c in MELT_COLS], axis=1).reshape(-1)
        return pa.table({
            "user_id": pa.array(np.repeat(u, k)),
            "metric": pa.array(np.tile(np.array(MELT_COLS, object),
                                       len(u)), pa.string()),
            "n": pa.array(vals.astype(np.int64))})

    return wide.map_batches(melt, batch_format="pyarrow")


def q_events_profile(sf_dir):
    """Table profiler (profile.profile_table): per-column row count,
    null count and EXACT distinct count (coarse value-hash buckets,
    in-bucket nunique over the actual values — globally exact at any
    scale because a value lives in exactly one bucket)."""
    from .profile import profile_table

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=PROFILE_COLS)
    return profile_table(ev, PROFILE_COLS)


HIST_WIDTH = 5.0


def q_events_histogram(sf_dir):
    """Fixed-width value histogram (profile.histogram): bounded bin
    domain, map-side bincount partials, driver merge — no shuffle."""
    from .profile import histogram

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["value"])
    return histogram(ev, "value", HIST_WIDTH)


def q_sketch_distinct_by_lang(sf_dir):
    """Per-language KMV distinct-token estimate (sketch.
    kmv_distinct_by_group): <= k digests per group per block, driver
    merge O(groups * k * blocks); exact below k."""
    from .sketch import kmv_distinct_by_group

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["lang", "text"])
    return kmv_distinct_by_group(docs, "lang", "text")


def q_embed_gram(sf_dir):
    """Distributed Gram matrix X^T X over the embeddings (ann.gram_matrix):
    per-batch BLAS partials, O(blocks * d^2) driver merge, upper-triangle
    (i, j, val) out."""
    from .ann import gram_matrix

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["embedding"])
    return gram_matrix(vecs)


def _media(sf_dir):
    from .multimodal import media_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return media_from_documents(docs)


def q_media_features(sf_dir):
    """Multimodal plumbing, ORACLE-CHECKED end to end: media table derived
    from documents -> actor-pool stub decode (sha256-derived integer lanes
    v_i, stored as float32 v_i/1e4) -> exact int64 checksum sum(v_i^2).
    The DuckDB oracle re-derives the lanes from sha256() hex, so the whole
    decode pipeline (schema, batching, actor seam, lane math) is verified
    bit-for-bit — only the codec call itself is the documented stub."""
    from .multimodal import decode_features

    feats = decode_features(_media(sf_dir), concurrency=2)

    def checksum(b: pa.Table) -> pa.Table:
        f = vec_matrix(b["features"])
        # v/1e4 stored float32 round-trips exactly: |err*1e4| < 0.5
        v = np.rint(f * 10000.0).astype(np.int64)
        return pa.table({"media_id": b["media_id"], "kind": b["kind"],
                         "n_bytes": b["n_bytes"],
                         "feat_ss": pa.array((v * v).sum(axis=1))})

    return feats.map_batches(checksum, batch_format="pyarrow")


def q_media_frames(sf_dir):
    """Frame-sampling plumbing, oracle-checked: video rows -> one row per
    sampled frame offset at 1 fps (duration derived from byte length, so
    the offsets are range() on both sides; only the demuxer is stubbed)."""
    from .multimodal import sample_frames

    return sample_frames(_media(sf_dir), fps=1.0, concurrency=2)


# ------------------------------------------------------------- oracle SQL

def _pagerank_sql(iters: int, round_to: int) -> str:
    return _pagerank_sql_over(
        DOC_EDGES_SQL, "SELECT doc_id AS v FROM documents",
        iters, round_to)


def _pagerank_sql_over(edges_sql: str, allv_sql: str, iters: int,
                       round_to: int) -> str:
    ctes = _pagerank_ctes(edges_sql, allv_sql, iters)
    return (f"WITH {', '.join(ctes)} SELECT raw{iters}.v AS v, "
            f"round(r, {round_to}) AS rank FROM raw{iters}")


def _pagerank_ctes(edges_sql: str, allv_sql: str, iters: int) -> list:
    ctes = [f"e AS MATERIALIZED ({edges_sql})",
            "outd AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM e GROUP BY src)",
            f"allv AS MATERIALIZED ({allv_sql})",
            ("c0 AS (SELECT allv.v, CASE WHEN coalesce(od, 0) > 0 "
             "THEN 1.0/od ELSE 1.0 END AS r FROM allv "
             "LEFT JOIN outd USING (v))")]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS v, sum({prev}.r) AS sm FROM e "
            f"JOIN {prev} ON {prev}.v = e.src GROUP BY e.dst)")
        ctes.append(
            f"raw{i} AS MATERIALIZED (SELECT allv.v, 0.15 + 0.85 * coalesce(sm, 0.0) AS r "
            f"FROM allv LEFT JOIN s{i} USING (v))")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT raw{i}.v, CASE WHEN coalesce(od, 0) > 0 "
            f"THEN r/od ELSE r END AS r FROM raw{i} LEFT JOIN outd USING (v))")
    return ctes


def _pagerank_deltas_sql(iters: int, round_to: int) -> str:
    """Convergence curve twin: delta_i = sum_v |raw_i - raw_{i-1}| / n
    (Gemini's reducer — the out-degree weights cancel against the
    pre-divide, so the raw ranks difference IS the delta; raw_0 = the
    init rank 1, pagerank.cpp:31-40,:89-98)."""
    ctes = _pagerank_ctes(DOC_EDGES_SQL,
                          "SELECT doc_id AS v FROM documents", iters)
    ctes.append("nn AS (SELECT count(*)::DOUBLE AS n FROM documents)")
    branches = ["SELECT 1 AS step, sum(abs(raw1.r - 1.0)) / nn.n AS d "
                "FROM raw1 CROSS JOIN nn GROUP BY nn.n"]
    for i in range(2, iters + 1):
        branches.append(
            f"SELECT {i} AS step, sum(abs(a.r - b.r)) / nn.n AS d "
            f"FROM raw{i} a JOIN raw{i - 1} b USING (v) CROSS JOIN nn "
            f"GROUP BY nn.n")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT step::BIGINT AS step, round(d, {round_to}) AS delta "
            f"FROM ({' UNION ALL '.join(branches)})")


def _pagerank_warm_sql(base_iters: int, warm_iters: int,
                       round_to: int) -> str:
    """Warm-start oracle: the _pagerank_sql chain on the canonical
    edges, then `warm_iters` more rounds on the cycle-AUGMENTED edge
    set with c re-derived from the base raw ranks and the NEW
    out-degrees (algos/pagerank.WarmPageRankProgram)."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "outd AS MATERIALIZED (SELECT src AS v, count(*) AS od "
            "FROM e GROUP BY src)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            ("c0 AS (SELECT allv.v, CASE WHEN coalesce(od, 0) > 0 "
             "THEN 1.0/od ELSE 1.0 END AS r FROM allv "
             "LEFT JOIN outd USING (v))")]
    for i in range(1, base_iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS v, sum({prev}.r) "
            f"AS sm FROM e JOIN {prev} ON {prev}.v = e.src "
            f"GROUP BY e.dst)")
        ctes.append(
            f"raw{i} AS MATERIALIZED (SELECT allv.v, "
            f"0.15 + 0.85 * coalesce(sm, 0.0) AS r "
            f"FROM allv LEFT JOIN s{i} USING (v))")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT raw{i}.v, CASE WHEN "
            f"coalesce(od, 0) > 0 THEN r/od ELSE r END AS r "
            f"FROM raw{i} LEFT JOIN outd USING (v))")
    ctes.append(f"e2 AS MATERIALIZED (SELECT src, dst FROM "
                f"({SCC_EDGES_SQL}) aug)")
    ctes.append("outd2 AS MATERIALIZED (SELECT src AS v, count(*) AS od "
                "FROM e2 GROUP BY src)")
    ctes.append(
        f"w0 AS MATERIALIZED (SELECT raw{base_iters}.v, CASE WHEN "
        f"coalesce(od, 0) > 0 THEN r/od ELSE r END AS r "
        f"FROM raw{base_iters} LEFT JOIN outd2 USING (v))")
    for i in range(1, warm_iters + 1):
        prev = f"w{i - 1}"
        ctes.append(
            f"ws{i} AS MATERIALIZED (SELECT e2.dst AS v, "
            f"sum({prev}.r) AS sm FROM e2 JOIN {prev} "
            f"ON {prev}.v = e2.src GROUP BY e2.dst)")
        ctes.append(
            f"wraw{i} AS MATERIALIZED (SELECT allv.v, "
            f"0.15 + 0.85 * coalesce(sm, 0.0) AS r "
            f"FROM allv LEFT JOIN ws{i} USING (v))")
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT wraw{i}.v, CASE WHEN "
            f"coalesce(od, 0) > 0 THEN r/od ELSE r END AS r "
            f"FROM wraw{i} LEFT JOIN outd2 USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT wraw{warm_iters}.v AS v, "
            f"round(r, {round_to}) AS rank FROM wraw{warm_iters}")


def _wpagerank_sql(iters: int, round_to: int) -> str:
    """Weighted-PageRank unroll: _pagerank_sql with the out-DEGREE
    renormalizer replaced by the out-weight SUM and per-edge rank flow
    scaled by weight (algos/pagerank.WeightedPageRankProgram)."""
    ctes = [f"e AS MATERIALIZED (SELECT src, dst, {_WEIGHT_SQL} AS w "
            f"FROM ({DOC_EDGES_SQL}))",
            "outw AS MATERIALIZED (SELECT src AS v, sum(w) AS ow "
            "FROM e GROUP BY src)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            ("c0 AS (SELECT allv.v, CASE WHEN coalesce(ow, 0) > 0 "
             "THEN 1.0/ow ELSE 1.0 END AS r FROM allv "
             "LEFT JOIN outw USING (v))")]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS v, "
            f"sum({prev}.r * e.w) AS sm FROM e "
            f"JOIN {prev} ON {prev}.v = e.src GROUP BY e.dst)")
        ctes.append(
            f"raw{i} AS MATERIALIZED (SELECT allv.v, "
            f"0.15 + 0.85 * coalesce(sm, 0.0) AS r "
            f"FROM allv LEFT JOIN s{i} USING (v))")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT raw{i}.v, "
            f"CASE WHEN coalesce(ow, 0) > 0 THEN r/ow ELSE r END AS r "
            f"FROM raw{i} LEFT JOIN outw USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT raw{iters}.v AS v, "
            f"round(r, {round_to}) AS rank FROM raw{iters}")


def _louvain_sql() -> str:
    """One synchronous Louvain local-move round from singletons — the
    exact twin of algos.louvain.louvain_local_move (integer score
    2m - k_v*k_u, argmax with (score DESC, u ASC)).  Reused as a CTE by
    doc_leiden / doc_leiden_modularity."""
    return f"""
        WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
        sym AS (SELECT src, dst FROM e
                UNION ALL SELECT dst AS src, src AS dst FROM e),
        mm AS (SELECT count(*)::BIGINT AS m FROM e),
        deg AS (SELECT src AS v, count(*)::BIGINT AS d
                FROM sym GROUP BY src),
        sc AS (SELECT s.src AS v, s.dst AS u,
                      2 * mm.m - dv.d * du.d AS score
               FROM sym s CROSS JOIN mm
               JOIN deg dv ON dv.v = s.src
               JOIN deg du ON du.v = s.dst),
        best AS (SELECT v, u, score, row_number() OVER (
                   PARTITION BY v ORDER BY score DESC, u) AS rn
                 FROM sc)
        SELECT v, CASE WHEN score > 0 THEN u ELSE v END AS comm,
               score AS gain_num
        FROM best WHERE rn = 1
    """


def _leiden_ctes(rounds: int) -> str:
    """Shared CTE chain for the Leiden refinement oracles: Louvain
    local-move communities, the intra-community induced subgraph, and
    `rounds` unrolled min-label CC sweeps over it (the _cc_sql shape).
    Ends with refl = (v, comm, rcomm) for every non-isolated vertex."""
    ctes = [
        f"louv AS MATERIALIZED (SELECT * FROM ({_louvain_sql()}))",
        f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
        ("intra AS MATERIALIZED (SELECT e.src, e.dst FROM e "
         "JOIN louv la ON la.v = e.src JOIN louv lb ON lb.v = e.dst "
         "WHERE la.comm = lb.comm)"),
        ("isym AS MATERIALIZED (SELECT src, dst FROM intra UNION ALL "
         "SELECT dst AS src, src AS dst FROM intra)"),
        "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
        "r0 AS MATERIALIZED (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT allv.v, "
            f"least({p}.lab, coalesce(m.lab, {p}.lab)) AS lab "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT isym.dst AS v, min({p}.lab) AS lab FROM isym "
            f"JOIN {p} ON {p}.v = isym.src GROUP BY isym.dst) m "
            f"USING (v))")
    ctes.append(
        f"refl AS MATERIALIZED (SELECT louv.v, louv.comm, "
        f"r{rounds}.lab AS rcomm FROM louv JOIN r{rounds} USING (v))")
    return ", ".join(ctes)


def _cc_sql(rounds: int) -> str:
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "l0 AS MATERIALIZED (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, least({p}.lab, coalesce(m.lab, {p}.lab))"
            f" AS lab FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT sym.dst AS v, min({p}.lab) AS lab FROM sym "
            f"JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT v, lab AS label FROM l{rounds}")


def _lp_sql(rounds: int) -> str:
    ctes = [f"sym AS ({DOC_SYM_SQL})",
            "allv AS (SELECT doc_id AS v FROM documents)",
            "l0 AS (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT v, lab FROM ("
            f"SELECT sym.dst AS v, {p}.lab AS lab, "
            f"row_number() OVER (PARTITION BY sym.dst "
            f"ORDER BY count(*) DESC, {p}.lab ASC) AS rn "
            f"FROM sym JOIN {p} ON {p}.v = sym.src "
            f"GROUP BY sym.dst, {p}.lab) WHERE rn = 1)")
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, coalesce(w{i}.lab, {p}.lab) AS lab "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN w{i} USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT v, lab AS label FROM l{rounds}")


def _bfs_sql(rounds: int) -> str:
    big = 10 ** 9
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"d0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN 0 ELSE {big} END AS dep "
            "FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"d{i - 1}"
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT allv.v, least({p}.dep, coalesce(m.dep, {big}))"
            f" AS dep FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT e.dst AS v, min({p}.dep) + 1 AS dep FROM e "
            f"JOIN {p} ON {p}.v = e.src WHERE {p}.dep < {big} "
            f"GROUP BY e.dst) m USING (v))")
    last = f"d{rounds}"
    # parent(v) = min in-neighbor one BFS level above (the engine's
    # deterministic min-parent rule); root's parent is itself
    return (f"WITH {', '.join(ctes)}, fin AS "
            f"(SELECT v, dep FROM {last} WHERE dep < {big}) "
            f"SELECT fin.v AS v, CASE WHEN fin.v = 0 THEN 0 ELSE ("
            f"SELECT min(e.src) FROM e JOIN fin f2 ON f2.v = e.src "
            f"WHERE e.dst = fin.v AND f2.dep = fin.dep - 1) END AS parent "
            f"FROM fin")


def _bc_sql(rounds: int, round_to: int) -> str:
    """Single-root Brandes betweenness as unrolled CTEs (matches
    algos/bc.py two-phase engine, toolkits/bc.cpp:24-196 semantics):
    BFS levels (same chain as _bfs_sql), then sigma (path counts) swept
    forward one level per CTE, then dependencies swept backward:
    delta(v) = sum over out-edges (v,w), dist(w)=dist(v)+1 of
    sigma(v)/sigma(w) * (1 + delta(w)); leaves get 0."""
    big = 10 ** 9
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"d0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN 0 ELSE {big} END AS dep "
            "FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"d{i - 1}"
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT allv.v, least({p}.dep, coalesce(m.dep, {big}))"
            f" AS dep FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT e.dst AS v, min({p}.dep) + 1 AS dep FROM e "
            f"JOIN {p} ON {p}.v = e.src WHERE {p}.dep < {big} "
            f"GROUP BY e.dst) m USING (v))")
    ctes.append(f"lev AS MATERIALIZED (SELECT v, dep AS dist FROM d{rounds} "
                f"WHERE dep < {big})")
    ctes.append("s0 AS MATERIALIZED (SELECT v, 1.0 AS sigma FROM lev "
                "WHERE dist = 0)")
    for i in range(1, rounds + 1):
        p = f"s{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT * FROM {p} UNION ALL "
            f"SELECT e.dst AS v, sum(sp.sigma) AS sigma FROM e "
            f"JOIN {p} sp ON sp.v = e.src "
            f"JOIN lev lu ON lu.v = e.src AND lu.dist = {i - 1} "
            f"JOIN lev lv ON lv.v = e.dst AND lv.dist = {i} "
            f"GROUP BY e.dst)")
    sig = f"s{rounds}"
    ctes.append(f"b{rounds} AS MATERIALIZED (SELECT v, 0.0 AS dl FROM lev "
                f"WHERE dist = {rounds})")
    for i in range(rounds - 1, -1, -1):
        nx = f"b{i + 1}"
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT * FROM {nx} UNION ALL "
            f"SELECT l.v, coalesce(m.s, 0.0) AS dl FROM lev l LEFT JOIN "
            f"(SELECT e.src AS v, sum(sg.sigma / sw.sigma * (1.0 + d.dl)) AS s "
            f"FROM e JOIN {nx} d ON d.v = e.dst "
            f"JOIN lev lw ON lw.v = e.dst AND lw.dist = {i + 1} "
            f"JOIN {sig} sw ON sw.v = e.dst "
            f"JOIN {sig} sg ON sg.v = e.src "
            f"GROUP BY e.src) m USING (v) WHERE l.dist = {i})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT lev.v AS v, round(b0.dl, {round_to}) AS dependencies, "
            f"{sig}.sigma AS num_paths "
            f"FROM lev JOIN b0 USING (v) JOIN {sig} USING (v)")


def _bc_root_chain(tag: str, root: int, rounds: int) -> list[str]:
    """One root's unrolled Brandes CTE chain (levels, sigma, backward
    deltas), every CTE name prefixed with `tag` — the building block of
    the sampled-betweenness oracle."""
    big = 10 ** 9
    ctes = [f"{tag}d0 AS MATERIALIZED (SELECT v, CASE WHEN v = {root} "
            f"THEN 0 ELSE {big} END AS dep FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"{tag}d{i - 1}"
        ctes.append(
            f"{tag}d{i} AS MATERIALIZED (SELECT allv.v, "
            f"least({p}.dep, coalesce(m.dep, {big})) AS dep "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT e.dst AS v, min({p}.dep) + 1 AS dep FROM e "
            f"JOIN {p} ON {p}.v = e.src WHERE {p}.dep < {big} "
            f"GROUP BY e.dst) m USING (v))")
    ctes.append(f"{tag}lev AS MATERIALIZED (SELECT v, dep AS dist "
                f"FROM {tag}d{rounds} WHERE dep < {big})")
    ctes.append(f"{tag}s0 AS MATERIALIZED (SELECT v, 1.0 AS sigma "
                f"FROM {tag}lev WHERE dist = 0)")
    for i in range(1, rounds + 1):
        p = f"{tag}s{i - 1}"
        ctes.append(
            f"{tag}s{i} AS MATERIALIZED (SELECT * FROM {p} UNION ALL "
            f"SELECT e.dst AS v, sum(sp.sigma) AS sigma FROM e "
            f"JOIN {p} sp ON sp.v = e.src "
            f"JOIN {tag}lev lu ON lu.v = e.src AND lu.dist = {i - 1} "
            f"JOIN {tag}lev lv ON lv.v = e.dst AND lv.dist = {i} "
            f"GROUP BY e.dst)")
    sig = f"{tag}s{rounds}"
    ctes.append(f"{tag}b{rounds} AS MATERIALIZED (SELECT v, 0.0 AS dl "
                f"FROM {tag}lev WHERE dist = {rounds})")
    for i in range(rounds - 1, -1, -1):
        nx = f"{tag}b{i + 1}"
        ctes.append(
            f"{tag}b{i} AS MATERIALIZED (SELECT * FROM {nx} UNION ALL "
            f"SELECT l.v, coalesce(m.s, 0.0) AS dl FROM {tag}lev l "
            f"LEFT JOIN "
            f"(SELECT e.src AS v, sum(sg.sigma / sw.sigma * (1.0 + d.dl))"
            f" AS s FROM e JOIN {nx} d ON d.v = e.dst "
            f"JOIN {tag}lev lw ON lw.v = e.dst AND lw.dist = {i + 1} "
            f"JOIN {sig} sw ON sw.v = e.dst "
            f"JOIN {sig} sg ON sg.v = e.src "
            f"GROUP BY e.src) m USING (v) WHERE l.dist = {i})")
    return ctes


def _bc_sampled_sql(roots: list[int], rounds: int, round_to: int) -> str:
    """Sampled-betweenness oracle: one prefixed Brandes chain per root,
    per-vertex dependencies summed LEFT-TO-RIGHT in root order (the
    engine accumulator's association)."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for ri, r in enumerate(roots):
        ctes += _bc_root_chain(f"r{ri}", r, rounds)
    terms = " + ".join(f"coalesce(r{ri}b0.dl, 0.0)"
                       for ri in range(len(roots)))
    joins = " ".join(f"LEFT JOIN r{ri}b0 ON r{ri}b0.v = allv.v"
                     for ri in range(len(roots)))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT allv.v, round({terms}, {round_to}) AS bc "
            f"FROM allv {joins}")


def _sssp_sql(rounds: int, round_to: int) -> str:
    inf = "1000000000.0"
    ctes = [f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
            f"e AS MATERIALIZED (SELECT src, dst, {_WEIGHT_SQL} AS w FROM ce)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"d0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN 0.0 ELSE {inf} END AS dep "
            "FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"d{i - 1}"
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT allv.v, least({p}.dep, coalesce(m.dep, {inf}))"
            f" AS dep FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT e.dst AS v, min({p}.dep + e.w) AS dep FROM e "
            f"JOIN {p} ON {p}.v = e.src WHERE {p}.dep < {inf} "
            f"GROUP BY e.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT v, round(dep, {round_to}) AS "
            f"distance FROM d{rounds} WHERE dep < {inf}")


def _widest_sql(rounds: int, round_to: int) -> str:
    """Unrolled widest-path relaxation (matches algos/widest.py):
    cap_i(v) = greatest(cap_{i-1}(v), max over in-edges of
    least(cap_{i-1}(src), w)), root capacity 1e9, unreached filtered."""
    inf = "1000000000.0"
    ctes = [f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
            f"e AS MATERIALIZED (SELECT src, dst, {_WEIGHT_SQL} AS w FROM ce)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"c0 AS MATERIALIZED (SELECT v, CASE WHEN v = 0 THEN {inf} "
            "ELSE 0.0 END AS cap FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"c{i - 1}"
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT allv.v, greatest({p}.cap, "
            f"coalesce(m.cap, 0.0)) AS cap FROM allv JOIN {p} USING (v) "
            f"LEFT JOIN (SELECT e.dst AS v, max(least({p}.cap, e.w)) AS cap "
            f"FROM e JOIN {p} ON {p}.v = e.src WHERE {p}.cap > 0.0 "
            f"GROUP BY e.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT v, round(cap, {round_to}) AS "
            f"capacity FROM c{rounds} WHERE cap > 0.0")


def _hits_sql(iters: int, round_to: int) -> str:
    """Unrolled HITS (matches algos/hits.py): auth_i from hub_{i-1} over
    in-edges, hub_i from auth_i over out-edges, L1 normalization once at
    the end (a pure rescale of the linear recurrence)."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "h0 AS (SELECT v, 1.0 AS h FROM allv)"]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS a "
            f"FROM allv LEFT JOIN (SELECT e.dst AS v, sum({p}.h) AS s "
            f"FROM e JOIN {p} ON {p}.v = e.src GROUP BY e.dst) m USING (v))")
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS h "
            f"FROM allv LEFT JOIN (SELECT e.src AS v, sum(a{i}.a) AS s "
            f"FROM e JOIN a{i} ON a{i}.v = e.dst GROUP BY e.src) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT a{iters}.v AS v, "
            f"round(a / (SELECT sum(a) FROM a{iters}), {round_to}) AS auth, "
            f"round(h / (SELECT sum(h) FROM h{iters}), {round_to}) AS hub "
            f"FROM a{iters} JOIN h{iters} USING (v)")


def _salsa_sql(iters: int, round_to: int) -> str:
    """Unrolled SALSA (matches algos/salsa.py): auth_i from
    hub_{i-1}/out_deg over in-edges, hub_i from auth_i/in_deg over
    out-edges, L1 normalization once at the end (pure rescale of the
    linear recurrence).  Degree divisors join the same edge list the
    engine loads, so both sides sum the identical addend sets."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            ("outd AS MATERIALIZED (SELECT src AS v, count(*) AS od "
             "FROM e GROUP BY 1)"),
            ("ind AS MATERIALIZED (SELECT dst AS v, count(*) AS id_ "
             "FROM e GROUP BY 1)"),
            "h0 AS (SELECT v, 1.0 AS h FROM allv)"]
    for i in range(1, iters + 1):
        p = f"h{i - 1}"
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS a "
            f"FROM allv LEFT JOIN (SELECT e.dst AS v, "
            f"sum({p}.h / outd.od) AS s FROM e "
            f"JOIN {p} ON {p}.v = e.src "
            f"JOIN outd ON outd.v = e.src GROUP BY e.dst) m USING (v))")
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS h "
            f"FROM allv LEFT JOIN (SELECT e.src AS v, "
            f"sum(a{i}.a / ind.id_) AS s FROM e "
            f"JOIN a{i} ON a{i}.v = e.dst "
            f"JOIN ind ON ind.v = e.dst GROUP BY e.src) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT a{iters}.v AS v, "
            f"round(a / greatest((SELECT sum(a) FROM a{iters}), 1e-300),"
            f" {round_to}) AS auth, "
            f"round(h / greatest((SELECT sum(h) FROM h{iters}), 1e-300),"
            f" {round_to}) AS hub "
            f"FROM a{iters} JOIN h{iters} USING (v)")


def _eigen_sql(iters: int, round_to: int) -> str:
    """Unrolled power iteration (matches algos/eigen.py): x_i from
    x_{i-1} summed over the symmetric edge list, L1 normalization once
    at the end (pure rescale of the linear recurrence)."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "x0 AS (SELECT v, 1.0 AS x FROM allv)"]
    for i in range(1, iters + 1):
        p = f"x{i - 1}"
        ctes.append(
            f"x{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS x "
            f"FROM allv LEFT JOIN (SELECT sym.dst AS v, sum({p}.x) AS s "
            f"FROM sym JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m "
            f"USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, round(x / greatest((SELECT sum(x) FROM x{iters}),"
            f" 1e-300), {round_to}) AS eigen FROM x{iters}")


def _wl_mix_ctes(tag: str, src_cte: str, rename: str = "z") -> list[str]:
    """Murmur-finalizer chain (xor 33 / mul C1 / xor 29 / mul C2 /
    xor 32) over UBIGINT column `z` of `src_cte` — the exact
    algos/wl.mix64 — emitting CTEs {tag}1..{tag}4 and final {tag}."""
    return [
        f"{tag}1 AS (SELECT v, xor(z, z >> 33) AS z FROM {src_cte})",
        f"{tag}2 AS (SELECT v, "
        f"{_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z "
        f"FROM {tag}1)",
        f"{tag}3 AS (SELECT v, xor(z, z >> 29) AS z FROM {tag}2)",
        f"{tag}4 AS (SELECT v, "
        f"{_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z "
        f"FROM {tag}3)",
        f"{tag} AS MATERIALIZED (SELECT v, xor(z, z >> 32) AS {rename} "
        f"FROM {tag}4)",
    ]


def _wl_ctes(rounds: int) -> list:
    """CTE chain of the unrolled 1-WL refinement (labels in l{r})."""
    phi = 0x9E3779B97F4A7C15
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "l0 AS (SELECT v, 1::UBIGINT AS lab FROM allv)"]
    for r in range(1, rounds + 1):
        p = f"l{r - 1}"
        ctes.append(f"h{r}0 AS (SELECT v, lab AS z FROM {p})")
        ctes += _wl_mix_ctes(f"h{r}", f"h{r}0")
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT sym.dst AS v, "
            f"(sum(h.z::HUGEINT) % {_W64})::UBIGINT AS s "
            f"FROM sym JOIN h{r} h ON h.v = sym.src GROUP BY sym.dst)")
        ctes.append(
            f"t{r}0 AS (SELECT {p}.v, "
            f"(({_mulmod64_sql('lab', phi)} + coalesce(s.s, 0)::HUGEINT) "
            f"% {_W64})::UBIGINT AS z "
            f"FROM {p} LEFT JOIN s{r} s USING (v))")
        ctes += _wl_mix_ctes(f"t{r}", f"t{r}0", rename="lab")
        ctes.append(f"l{r} AS (SELECT v, lab FROM t{r})")
    return ctes


def _wl_sql(rounds: int) -> str:
    """Unrolled 1-WL refinement (matches algos/wl.py): per round, each
    vertex's new label = mix64(old * PHI + sum(mix64(neighbor labels))
    mod 2^64) over the symmetric edge list; output = per-round exact
    distinct-color counts (round 0 = the uniform init, 1 color)."""
    ctes = _wl_ctes(rounds)
    unions = ["SELECT 0::BIGINT AS round, 1::BIGINT AS n_colors"] + [
        f"SELECT {r}::BIGINT AS round, "
        f"count(DISTINCT lab)::BIGINT AS n_colors FROM l{r}"
        for r in range(1, rounds + 1)]
    return (f"WITH {', '.join(ctes)} "
            + " UNION ALL ".join(unions))


def _ppr_sql(iters: int, round_to: int, sources: list[int]) -> str:
    """Unrolled personalized PageRank (matches algos/pagerank.PPRProgram):
    same chain as _pagerank_sql but rank mass and teleport restricted to
    the source set."""
    src = ", ".join(map(str, sources))
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "outd AS MATERIALIZED (SELECT src AS v, count(*) AS od FROM e GROUP BY src)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            (f"tele AS MATERIALIZED (SELECT v, CASE WHEN v IN ({src}) "
             "THEN 1.0 ELSE 0.0 END AS t FROM allv)"),
            ("c0 AS (SELECT tele.v, CASE WHEN coalesce(od, 0) > 0 "
             "THEN t/od ELSE t END AS r FROM tele "
             "LEFT JOIN outd USING (v))")]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS v, sum({prev}.r) AS sm FROM e "
            f"JOIN {prev} ON {prev}.v = e.src GROUP BY e.dst)")
        ctes.append(
            f"raw{i} AS MATERIALIZED (SELECT tele.v, 0.15 * t + 0.85 * "
            f"coalesce(sm, 0.0) AS r FROM tele LEFT JOIN s{i} USING (v))")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT raw{i}.v, CASE WHEN coalesce(od, 0) > 0 "
            f"THEN r/od ELSE r END AS r FROM raw{i} LEFT JOIN outd USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT raw{iters}.v AS v, "
            f"round(r, {round_to}) AS rank FROM raw{iters}")


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous peeling (matches algos/kcore.py):
    a_{i+1} = {v in a_i : |N(v) ∩ a_i| >= k}; extra rounds past the
    fixpoint are no-ops (idempotent recurrence)."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "a0 AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for i in range(1, rounds + 1):
        p = f"a{i - 1}"
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT d.v FROM ("
            f"SELECT sym.dst AS v, count(*) AS deg FROM sym "
            f"JOIN {p} s ON s.v = sym.src JOIN {p} t ON t.v = sym.dst "
            f"GROUP BY sym.dst) d WHERE deg >= {k})")
    return f"WITH {', '.join(ctes)} SELECT v FROM a{rounds}"


def _onion_sql(k: int, rounds: int) -> str:
    """Unrolled peeling layers (matches algos/kcore.OnionProgram):
    the same alive-set chain as _kcore_sql; membership is monotone
    (a_{i} ⊆ a_{i-1}), so a vertex's layer is how many sets contain it
    minus one; 2-core survivors (in the final set) are filtered."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "a0 AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for i in range(1, rounds + 1):
        p = f"a{i - 1}"
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT d.v FROM ("
            f"SELECT sym.dst AS v, count(*) AS deg FROM sym "
            f"JOIN {p} s ON s.v = sym.src JOIN {p} t ON t.v = sym.dst "
            f"GROUP BY sym.dst) d WHERE deg >= {k})")
    unions = " UNION ALL ".join(
        f"SELECT v FROM a{i}" for i in range(rounds + 1))
    return (f"WITH {', '.join(ctes)}, u AS ({unions}), "
            f"c AS (SELECT v, count(*)::BIGINT - 1 AS layer "
            f"FROM u GROUP BY v) "
            f"SELECT c.v, c.layer FROM c "
            f"WHERE c.v NOT IN (SELECT v FROM a{rounds})")


TRIANGLES_SQL = f"""
    WITH e AS ({DOC_EDGES_SQL})
    SELECT count(*) AS n_triangles
    FROM e ab JOIN e bc ON bc.src = ab.dst
           JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
"""

# co-key clique graph (documents_clique_edges): the 6 smallest docs per
# sharing-key group pair up; 4-cliques counted once per value-ordered
# quadruple via the 6-condition self-join
FOURCLIQUES_SQL = f"""
    WITH k AS ({_DOC_KEYS_SQL}),
    topn AS (SELECT gkey, doc_id FROM (
        SELECT gkey, doc_id,
               row_number() OVER (PARTITION BY gkey ORDER BY doc_id)
               AS rn
        FROM (SELECT DISTINCT gkey, doc_id FROM k)) WHERE rn <= 6),
    e AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM topn a JOIN topn b
        ON a.gkey = b.gkey AND a.doc_id < b.doc_id)
    SELECT count(*) AS n_4cliques
    FROM e ab
    JOIN e ac ON ac.src = ab.src AND ac.dst > ab.dst
    JOIN e ad ON ad.src = ab.src AND ad.dst > ac.dst
    JOIN e bc ON bc.src = ab.dst AND bc.dst = ac.dst
    JOIN e bd ON bd.src = ab.dst AND bd.dst = ad.dst
    JOIN e cd ON cd.src = ac.dst AND cd.dst = ad.dst
"""

# per-vertex twin of TRIANGLES_SQL: each canonical triangle (x<y<z)
# matched once credits all three endpoints; clustering = 2t/(d(d-1))
# with the SAME float64 expression as triangles.clustering_coefficients
CLUSTERING_SQL = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    tri AS MATERIALIZED (
      SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
      FROM e ab JOIN e bc ON bc.src = ab.dst
             JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst),
    tv AS (SELECT v, count(*) AS t FROM (
        SELECT a AS v FROM tri UNION ALL SELECT b AS v FROM tri
        UNION ALL SELECT c AS v FROM tri) GROUP BY v),
    deg AS (SELECT src AS v, count(*) AS d
            FROM ({DOC_SYM_SQL}) GROUP BY src)
    SELECT deg.v AS doc_id,
           round(CASE WHEN d >= 2
                 THEN 2.0 * coalesce(t, 0) / (d * (d - 1.0))
                 ELSE 0.0 END, 6) AS clustering
    FROM deg LEFT JOIN tv ON tv.v = deg.v
"""

_FP_SQL = "sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


def _langid_sql() -> str:
    """SQL twin of text.LangId: stopword-hit rate per language (words =
    Unicode-letter runs of the lowercased text, same as the Python
    `[^\\W\\d_]+` regex), zh scored by CJK-codepoint ratio; prediction =
    argmax with alphabetical tie-break via ordered CASE, 'und' when all
    scores are zero.  Same float64 hits/denominator division on both
    sides, so equality is exact."""
    from .text import _LANG_WORDS

    score_cols = []
    for lang in sorted(_LANG_WORDS):
        if lang == "zh":
            score_cols.append(
                "CAST(length(regexp_replace(t, '[^一-鿿]', '', 'g')) "
                "AS DOUBLE) / greatest(1, length(t)) AS s_zh")
        else:
            vocab = ", ".join(f"'{w}'" for w in sorted(_LANG_WORDS[lang]))
            score_cols.append(
                f"CAST(length(list_filter(words, w -> list_contains("
                f"[{vocab}], w))) AS DOUBLE) / greatest(1, length(words)) "
                f"AS s_{lang}")
    langs = sorted(_LANG_WORDS)
    best = "greatest(" + ", ".join(f"s_{g}" for g in langs) + ")"
    case = " ".join(f"WHEN s_{g} = best THEN '{g}'" for g in langs)
    return f"""
        WITH base AS (
          SELECT doc_id, lower(text) AS t,
                 regexp_extract_all(lower(text), '\\p{{L}}+') AS words
          FROM documents
        ), sc AS (
          SELECT doc_id, {', '.join(score_cols)} FROM base
        ), b AS (SELECT doc_id, {best} AS best, * FROM sc)
        SELECT doc_id,
               CASE WHEN best <= 0 THEN 'und' {case} END AS lang_pred
        FROM b
    """

def _mis_sql(rounds: int) -> str:
    """Unrolled deterministic-Luby recurrence (algos/mis.py): per round,
    undecided vertices below the min undecided-neighbor priority join;
    their undecided neighbors drop out."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            """p AS MATERIALIZED (
              SELECT doc_id AS v,
                     ('0x' || substr(sha256(doc_id::VARCHAR), 1, 13))
                     ::UBIGINT AS pri
              FROM documents)""",
            "u0 AS MATERIALIZED (SELECT v FROM p)"]
    for i in range(1, rounds + 1):
        pu = f"u{i - 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (
              SELECT s.src AS v, min(p2.pri) AS mn
              FROM sym s
              JOIN {pu} a ON a.v = s.src
              JOIN {pu} b ON b.v = s.dst
              JOIN p p2 ON p2.v = s.dst
              GROUP BY s.src)""")
        ctes.append(
            f"""i{i} AS MATERIALIZED (
              SELECT u.v FROM {pu} u
              JOIN p ON p.v = u.v
              LEFT JOIN m{i} ON m{i}.v = u.v
              WHERE mn IS NULL OR p.pri < mn)""")
        ctes.append(
            f"""u{i} AS MATERIALIZED (
              SELECT u.v FROM {pu} u
              WHERE u.v NOT IN (SELECT v FROM i{i})
                AND NOT EXISTS (SELECT 1 FROM sym s JOIN i{i} x
                                ON x.v = s.dst WHERE s.src = u.v))""")
    selects = " UNION ".join(f"SELECT v FROM i{t}"
                             for t in range(1, rounds + 1))
    return f"WITH {', '.join(ctes)} {selects}"


def _clean_v2_survivors(sf_dir):
    """Stages 1-4 of the flagship composition (quality cut -> exact
    dedup -> minhash near-dedup -> substring dedup), returning the
    surviving (doc_id, text) Dataset — shared by corpus_clean_v2 and
    the v3 composition."""
    import ray

    from .dedup import (_join_parts, exact_dedup, minhash_dedup_pairs,
                        substring_dup_pairs)
    from .hashing import add_sha256
    from .text import add_quality

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def quality_keep(b: pa.Table) -> pa.Table:
        t = add_quality(b)
        return t.filter(t["keep"]).select(["doc_id", "text"])

    q1 = docs.map_batches(quality_keep, batch_format="pyarrow")              .materialize()
    sha = q1.map_batches(lambda b: add_sha256(b, col="text"),
                         batch_format="pyarrow")
    surv = exact_dedup(sha, key="sha256", id_col="doc_id")
    q2 = q1.join(surv, join_type="inner",
                 num_partitions=_join_parts(q1.count()),
                 on=("doc_id",)).materialize()
    pairs = minhash_dedup_pairs(q2, threshold=0.5)
    if isinstance(pairs, pd.DataFrame):
        drop = np.unique(pairs["b"].to_numpy().astype(np.int64))
    else:
        drop = np.unique(
            pairs.select_columns(["b"]).groupby("b").count()
                 .select_columns(["b"]).to_pandas()["b"].to_numpy()
                 .astype(np.int64))
    drop_ref = ray.put(drop)

    def keep_rows(b: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if len(d) == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return b.filter(pa.array(d[pos] != ids))

    q3 = q2.map_batches(keep_rows, batch_format="pyarrow").materialize()
    # tighter window than dedup_substr: catches long-shared-substring
    # pairs whose overall Jaccard stayed under the minhash threshold
    spairs = substring_dup_pairs(q3, window=24, stride=6)
    drop2 = np.unique(
        spairs.select_columns(["b"]).groupby("b").count()
              .select_columns(["b"]).to_pandas()["b"].to_numpy()
              .astype(np.int64))
    drop2_ref = ray.put(drop2)

    def keep_rows2(b: pa.Table) -> pa.Table:
        d = ray.get(drop2_ref)
        if len(d) == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return b.filter(pa.array(d[pos] != ids))

    return q3.map_batches(keep_rows2, batch_format="pyarrow")


def q_corpus_clean_v2(sf_dir):
    """Flagship cleaning composition V2 — corpus_clean plus a fourth
    stage: window-sampled exact-substring dedup over the minhash
    survivors (drop the larger id of every substring-dup pair).  Each
    stage is an oracle-checked operator; the oracle composes the same
    fragments in stage order (substring fragment parameterized with
    src=q3)."""
    return _clean_v2_survivors(sf_dir).select_columns(["doc_id"])


BENCH_MOD = 53


def q_corpus_clean_v3(sf_dir):
    """Flagship cleaning composition V3 — the full modern training-data
    assembly: quality cut -> exact dedup -> minhash near-dedup ->
    substring dedup (stages 1-4, _clean_v2_survivors) -> benchmark
    DECONTAMINATION (drop survivors sharing any word 4-gram with the
    doc_id%53 eval slice, and the eval slice itself) -> temperature
    MIXTURE RESAMPLE by source (sampling.mixture_resample).  Returns
    the final (doc_id, source) Dataset.  Oracle: _corpus_clean_v3_sql
    — the v2 fragments + the decontaminate fragment + the mix_resample
    fragment in stage order."""
    import ray

    from .decontam import contamination
    from .dedup import _join_parts
    from .sampling import mixture_resample

    q4 = _clean_v2_survivors(sf_dir).materialize()
    full = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def keep_mod(want_zero: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % BENCH_MOD == 0) == want_zero
            return b.filter(pa.array(m))
        return f

    bench = full.map_batches(keep_mod(True), batch_format="pyarrow")
    nonbench = q4.map_batches(keep_mod(False),
                              batch_format="pyarrow").materialize()
    contam = contamination(bench.union(nonbench), bench_mod=BENCH_MOD)
    drop = np.unique(contam.select_columns(["doc_id"]).to_pandas()
                     ["doc_id"].to_numpy().astype(np.int64))
    dref = ray.put(drop)

    def keep_clean(b: pa.Table) -> pa.Table:
        d = ray.get(dref)
        if len(d) == 0:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return b.filter(pa.array(d[pos] != ids))

    q5 = nonbench.map_batches(keep_clean, batch_format="pyarrow")
    src = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "source"])
    q5s = q5.join(src, join_type="inner",
                  num_partitions=_join_parts(q4.count()),
                  on=("doc_id",)).materialize()
    return mixture_resample(q5s, group_col="source")


def _corpus_clean_sql() -> str:
    """Composed oracle for the flagship cleaning pipeline: the quality
    fragment, the exact-dedup min-id rule, and the FULL minhash pair
    oracle (nested WITH, src=q2) glued in the engine's stage order."""
    from .text import PUNCT_RE, QUALITY_STOPWORD_RE, TOKEN_RE

    pairs = _minhash_sql(num_perm=64, bands=16, k=5, threshold=0.5,
                         cap=64, src="q2")
    return f"""
        WITH ql AS MATERIALIZED (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   round(0.4 * least(1.0, n_tok / 50.0)
                       + 0.4 * least(1.0,
                                     5.0 * n_stop / greatest(n_tok, 1.0))
                       + 0.2 * (1.0 - least(1.0,
                                    n_punct / greatest(n_tok, 1.0))),
                         6) AS quality
            FROM (
              SELECT doc_id, text,
                     len(regexp_extract_all(text, '{TOKEN_RE}'))::DOUBLE
                         AS n_tok,
                     len(regexp_extract_all(lower(text),
                         '{QUALITY_STOPWORD_RE}'))::DOUBLE AS n_stop,
                     len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE
                         AS n_punct
              FROM documents))
          WHERE quality >= 0.5),
        q2 AS MATERIALIZED (
          SELECT doc_id, text FROM ql WHERE doc_id IN (
            SELECT min(doc_id) FROM (
              SELECT doc_id, sha256(text) AS h FROM ql) GROUP BY h)),
        pairs AS MATERIALIZED ({pairs})
        SELECT doc_id FROM q2
        WHERE doc_id NOT IN (SELECT b FROM pairs)
    """


def _corpus_clean_v2_sql() -> str:
    """V2 oracle: the corpus_clean fragments + the substring-dedup
    fragment (src=q3) in stage order."""
    base = _corpus_clean_sql()
    head, _, _ = base.rpartition("SELECT doc_id FROM q2")
    spairs = _substr_sql(window=24, stride=6, df_cap=64, src="q3")
    return head + f""",
        q3 AS MATERIALIZED (
          SELECT doc_id, text FROM q2
          WHERE doc_id NOT IN (SELECT b FROM pairs)),
        spairs AS MATERIALIZED ({spairs})
        SELECT doc_id FROM q3
        WHERE doc_id NOT IN (SELECT b FROM spairs)
    """


def _corpus_clean_v3_sql() -> str:
    """V3 oracle: the v2 fragments + the decontaminate gram fragment
    (bench grams from the FULL corpus, corpus grams from the q4
    survivors) + the mix_resample rate/threshold fragment, in stage
    order."""
    base = _corpus_clean_v2_sql()
    head, _, _ = base.rpartition("SELECT doc_id FROM q3")
    return head + f""",
        q4 AS MATERIALIZED (
          SELECT doc_id, text FROM q3
          WHERE doc_id NOT IN (SELECT b FROM spairs)),
        wl5b AS MATERIALIZED (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM documents WHERE doc_id % {BENCH_MOD} = 0),
        wl5c AS MATERIALIZED (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM q4 WHERE doc_id % {BENCH_MOD} <> 0),
        g5b AS (SELECT DISTINCT array_to_string(l[i:i+3], ' ') AS g
                FROM (SELECT doc_id, l, unnest(range(1,
                      greatest(len(l) - 2, 1))) AS i FROM wl5b)),
        g5c AS (SELECT DISTINCT doc_id,
                       array_to_string(l[i:i+3], ' ') AS g
                FROM (SELECT doc_id, l, unnest(range(1,
                      greatest(len(l) - 2, 1))) AS i FROM wl5c)),
        contam AS (SELECT DISTINCT c.doc_id FROM g5c c
                   JOIN g5b b USING (g)),
        q5 AS MATERIALIZED (
          SELECT q4.doc_id, d.source, q4.text AS text FROM q4
          JOIN documents d USING (doc_id)
          WHERE q4.doc_id % {BENCH_MOD} <> 0
            AND q4.doc_id NOT IN (SELECT doc_id FROM contam)),
        t5 AS (SELECT source, sum(length(list_filter(
                   regexp_split_to_array(text, '\\s+'),
                   x -> x <> '')))::BIGINT AS n_tokens
               FROM q5 GROUP BY source),
        w5 AS (SELECT source, n_tokens,
                      round(pow(n_tokens, {_MIX_ALPHA}) /
                            sum(pow(n_tokens, {_MIX_ALPHA})) OVER (),
                            6) AS weight FROM t5),
        r5 AS (SELECT source,
                      CAST(floor(least(1.0, weight *
                           {_SAMP.RESAMPLE_FRAC} *
                           (SELECT sum(n_tokens)::DOUBLE FROM w5)
                           / n_tokens) * 4294967296.0) AS UBIGINT)
                          AS thr FROM w5)
        SELECT q5.doc_id, q5.source FROM q5 JOIN r5 USING (source)
        WHERE ('0x' || substr(sha256('mix:' || q5.doc_id::VARCHAR),
               1, 8))::UBIGINT < thr
    """


def _harmonic_sql(seeds: list[int], rounds: int, round_to: int) -> str:
    """Sampled harmonic centrality oracle (algos/harmonic.py): one
    unrolled BFS depth chain per seed on the symmetric graph, terms
    summed LEFT-TO-RIGHT in seed order (the engine's accumulation
    order, so float association matches bit-for-bit)."""
    big = 10 ** 9
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for si, s in enumerate(seeds):
        ctes.append(
            f"d{si}_0 AS MATERIALIZED (SELECT v, CASE WHEN v = {s} "
            f"THEN 0 ELSE {big} END AS dep FROM allv)")
        for i in range(1, rounds + 1):
            p = f"d{si}_{i - 1}"
            ctes.append(
                f"d{si}_{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({p}.dep, coalesce(m.dep, {big})) AS dep "
                f"FROM allv JOIN {p} USING (v) LEFT JOIN "
                f"(SELECT sym.dst AS v, min({p}.dep) + 1 AS dep FROM sym "
                f"JOIN {p} ON {p}.v = sym.src WHERE {p}.dep < {big} "
                f"GROUP BY sym.dst) m USING (v))")
    terms = " + ".join(
        f"(CASE WHEN d{si}_{rounds}.dep > 0 AND d{si}_{rounds}.dep < {big} "
        f"THEN 1.0 / d{si}_{rounds}.dep ELSE 0.0 END)"
        for si in range(len(seeds)))
    joins = " ".join(f"JOIN d{si}_{rounds} ON d{si}_{rounds}.v = allv.v"
                     for si in range(len(seeds)))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT allv.v, round({terms}, {round_to}) AS harmonic "
            f"FROM allv {joins}")


def _distance_dist_sql(seeds: list[int], rounds: int) -> str:
    """Distance-distribution oracle: one unrolled BFS chain per seed
    (the _harmonic_sql fragments), pooled finite positive depths,
    per-depth counts with the integer cum*10 >= 9*total effective-
    diameter rule."""
    big = 10 ** 9
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for si, s in enumerate(seeds):
        ctes.append(
            f"d{si}_0 AS MATERIALIZED (SELECT v, CASE WHEN v = {s} "
            f"THEN 0 ELSE {big} END AS dep FROM allv)")
        for i in range(1, rounds + 1):
            p = f"d{si}_{i - 1}"
            ctes.append(
                f"d{si}_{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({p}.dep, coalesce(m.dep, {big})) AS dep "
                f"FROM allv JOIN {p} USING (v) LEFT JOIN "
                f"(SELECT sym.dst AS v, min({p}.dep) + 1 AS dep FROM sym "
                f"JOIN {p} ON {p}.v = sym.src WHERE {p}.dep < {big} "
                f"GROUP BY sym.dst) m USING (v))")
    pooled = " UNION ALL ".join(
        f"SELECT dep AS d FROM d{si}_{rounds} "
        f"WHERE dep > 0 AND dep < {big}" for si in range(len(seeds)))
    ctes.append(f"pooled AS ({pooled})")
    ctes.append("c AS (SELECT d, count(*)::BIGINT AS n FROM pooled "
                "GROUP BY d)")
    ctes.append("t AS (SELECT sum(n)::BIGINT AS tot FROM c)")
    ctes.append("cm AS (SELECT d, n, sum(n) OVER (ORDER BY d)::BIGINT "
                "AS cum FROM c)")
    ctes.append("eff AS (SELECT min(d)::BIGINT AS e FROM cm, t "
                "WHERE cm.cum * 10 >= 9 * t.tot)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT cm.d::BIGINT AS d, cm.n, cm.cum, eff.e AS "
            f"eff_diameter FROM cm, eff ORDER BY d")


def _closeness_sql(seeds: list[int], rounds: int, round_to: int) -> str:
    """Sampled closeness oracle (algos/harmonic.closeness_from_seeds):
    one unrolled BFS depth chain per seed on the symmetric graph, then
    the identical exact-integer aggregate — n_reached counts finite
    depths (the seed itself included at depth 0), closeness =
    (n_reached - 1) / sum(depth), 0 for isolated seeds."""
    big = 10 ** 9
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    for si, s in enumerate(seeds):
        ctes.append(
            f"d{si}_0 AS MATERIALIZED (SELECT v, CASE WHEN v = {s} "
            f"THEN 0 ELSE {big} END AS dep FROM allv)")
        for i in range(1, rounds + 1):
            p = f"d{si}_{i - 1}"
            ctes.append(
                f"d{si}_{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({p}.dep, coalesce(m.dep, {big})) AS dep "
                f"FROM allv JOIN {p} USING (v) LEFT JOIN "
                f"(SELECT sym.dst AS v, min({p}.dep) + 1 AS dep FROM sym "
                f"JOIN {p} ON {p}.v = sym.src WHERE {p}.dep < {big} "
                f"GROUP BY sym.dst) m USING (v))")
    sels = []
    for si, s in enumerate(seeds):
        sels.append(
            f"SELECT CAST({s} AS BIGINT) AS v, "
            f"(count(*) FILTER (WHERE dep < {big}))::BIGINT AS n_reached, "
            f"round(CASE WHEN coalesce(sum(dep) FILTER (WHERE dep < {big}),"
            f" 0) > 0 THEN (count(*) FILTER (WHERE dep < {big}) - 1) / "
            f"(sum(dep) FILTER (WHERE dep < {big}))::DOUBLE "
            f"ELSE 0.0 END, {round_to}) AS closeness "
            f"FROM d{si}_{rounds}")
    return f"WITH {', '.join(ctes)} {' UNION ALL '.join(sels)}"


def _katz_sql(iters: int, alpha: float, round_to: int) -> str:
    """Katz unroll (algos/katz.py): x_0 = 1,
    x_i = 1 + alpha * sum of x_{i-1} over in-edges (coalesce 0)."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "k0 AS (SELECT v, 1.0 AS x FROM allv)"]
    for i in range(1, iters + 1):
        p = f"k{i - 1}"
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT allv.v, "
            f"1.0 + {alpha!r} * coalesce(m.sm, 0.0) AS x FROM allv "
            f"LEFT JOIN (SELECT e.dst AS v, sum({p}.x) AS sm FROM e "
            f"JOIN {p} ON {p}.v = e.src GROUP BY e.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} SELECT v, round(x, {round_to}) "
            f"AS katz FROM k{iters}")


def _coreness_sql(rounds: int) -> str:
    """Coreness oracle (algos/kcore.CorenessProgram): c0 = degree, then
    per round c_i(v) = least(c_{i-1}(v), H-index of neighbor values).
    H-index via window rank: sort neighbor values desc, h =
    max(least(value, row_number)) — ties contribute their full count at
    the group's last row, identical to the engine's suffix-sum kernel."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            ("c0 AS MATERIALIZED (SELECT allv.v, coalesce(d.dg, 0) AS c "
             "FROM allv LEFT JOIN (SELECT src AS v, count(*) AS dg "
             "FROM sym GROUP BY src) d USING (v))")]
    for i in range(1, rounds + 1):
        p = f"c{i - 1}"
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT src AS v, "
            f"max(least(c, rn)) AS h FROM ("
            f"SELECT sym.src AS src, {p}.c AS c, "
            f"row_number() OVER (PARTITION BY sym.src "
            f"ORDER BY {p}.c DESC) AS rn "
            f"FROM sym JOIN {p} ON {p}.v = sym.dst) GROUP BY src)")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT allv.v, "
            f"least({p}.c, coalesce(h{i}.h, 0)) AS c "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN h{i} USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, c AS core FROM c{rounds}")


def _scc_sql() -> str:
    """Exact SCC oracle: DuckDB recursive transitive closure (UNION
    dedup fixpoint — terminates on the finite pair domain), then
    scc(v) = least(v, min mutual-reach partner).  Unlike the unrolled
    iterative oracles this is depth-independent, so no _check_unroll."""
    return f"""
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT src, dst FROM ({SCC_EDGES_SQL}) aug),
    reach(a, b) AS (
        SELECT src AS a, dst AS b FROM e
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
    ),
    mn AS (SELECT r1.a AS v, min(r1.b) AS mn
           FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
           GROUP BY r1.a)
    SELECT d.doc_id AS v, least(d.doc_id, coalesce(mn.mn, d.doc_id)) AS scc
    FROM documents d LEFT JOIN mn ON mn.v = d.doc_id
    """


def _diameter_sql(rounds: int) -> str:
    """Double-sweep oracle: unrolled BFS from 0, farthest vertex u
    (max depth, tie min id) as a scalar subquery rooting the second
    unrolled chain."""
    big = 10 ** 9

    def chain(tag: str, root_expr: str) -> list[str]:
        ctes = [f"{tag}0 AS MATERIALIZED (SELECT v, CASE WHEN "
                f"v = ({root_expr}) THEN 0 ELSE {big} END AS dep "
                f"FROM allv)"]
        for i in range(1, rounds + 1):
            p = f"{tag}{i - 1}"
            ctes.append(
                f"{tag}{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({p}.dep, coalesce(m.dep, {big})) AS dep "
                f"FROM allv JOIN {p} USING (v) LEFT JOIN "
                f"(SELECT sym.dst AS v, min({p}.dep) + 1 AS dep FROM sym "
                f"JOIN {p} ON {p}.v = sym.src WHERE {p}.dep < {big} "
                f"GROUP BY sym.dst) m USING (v))")
        return ctes

    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    ctes += chain("a", "0")
    ctes.append(
        f"""pick AS MATERIALIZED (
          SELECT v AS u, dep AS ecc FROM a{rounds}
          WHERE dep < {big} ORDER BY dep DESC, v ASC LIMIT 1)""")
    ctes += chain("b", "SELECT u FROM pick")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT pick.u AS far_v, pick.ecc AS ecc_root, "
            f"(SELECT max(dep) FROM b{rounds} WHERE dep < {big}) "
            f"AS diameter_lb FROM pick")


def _coloring_sql(rounds: int, max_colors: int) -> str:
    """Unrolled deterministic Jones-Plassmann recurrence
    (algos/coloring.py): per round, uncolored vertices below the min
    uncolored-neighbor priority take the smallest color absent from
    their colored neighborhood."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            """p AS MATERIALIZED (
              SELECT doc_id AS v,
                     ('0x' || substr(sha256(doc_id::VARCHAR), 1, 13))
                     ::UBIGINT AS pri
              FROM documents)""",
            "u0 AS MATERIALIZED (SELECT v FROM p)",
            """c0 AS MATERIALIZED (
              SELECT CAST(NULL AS BIGINT) AS v,
                     CAST(NULL AS BIGINT) AS color WHERE false)"""]
    for i in range(1, rounds + 1):
        pu, pc = f"u{i - 1}", f"c{i - 1}"
        ctes.append(
            f"""m{i} AS MATERIALIZED (
              SELECT s.src AS v, min(p2.pri) AS mn
              FROM sym s
              JOIN {pu} a ON a.v = s.src
              JOIN {pu} b ON b.v = s.dst
              JOIN p p2 ON p2.v = s.dst
              GROUP BY s.src)""")
        ctes.append(
            f"""s{i} AS MATERIALIZED (
              SELECT u.v FROM {pu} u
              JOIN p ON p.v = u.v
              LEFT JOIN m{i} ON m{i}.v = u.v
              WHERE mn IS NULL OR p.pri < mn)""")
        ctes.append(
            f"""f{i} AS MATERIALIZED (
              SELECT DISTINCT x.v, c.color
              FROM s{i} x
              JOIN sym s2 ON s2.src = x.v
              JOIN {pc} c ON c.v = s2.dst)""")
        ctes.append(
            f"""n{i} AS MATERIALIZED (
              SELECT x.v, min(r.range)::BIGINT AS color
              FROM s{i} x CROSS JOIN range(0, {max_colors}) r
              WHERE NOT EXISTS (SELECT 1 FROM f{i} f
                                WHERE f.v = x.v AND f.color = r.range)
              GROUP BY x.v)""")
        ctes.append(
            f"""c{i} AS MATERIALIZED (
              SELECT v, color FROM {pc}
              UNION ALL SELECT v, color FROM n{i})""")
        ctes.append(
            f"""u{i} AS MATERIALIZED (
              SELECT u.v FROM {pu} u
              WHERE u.v NOT IN (SELECT v FROM s{i}))""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, color FROM c{rounds}")


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peel (algos/ktruss.py): per round keep edges
    whose within-subgraph common-neighbor count >= k-2.  The fixpoint
    is unique, so any sufficient unroll converges to the engine's
    result (engine asserts its round count <= the unroll)."""
    ctes = [f"""e0 AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS src,
                     greatest(src, dst) AS dst
              FROM ({DOC_EDGES_SQL}) WHERE src <> dst)"""]
    for i in range(1, rounds + 1):
        p = f"e{i - 1}"
        ctes.append(
            f"""a{i} AS MATERIALIZED (
              SELECT src AS a, dst AS b FROM {p}
              UNION ALL SELECT dst AS a, src AS b FROM {p})""")
        ctes.append(
            f"""s{i} AS MATERIALIZED (
              SELECT t.src, t.dst, count(*) AS c
              FROM {p} t
              JOIN a{i} p1 ON p1.a = t.src
              JOIN a{i} p2 ON p2.a = t.dst AND p2.b = p1.b
              GROUP BY t.src, t.dst)""")
        ctes.append(
            f"""e{i} AS MATERIALIZED (
              SELECT t.src, t.dst FROM {p} t
              LEFT JOIN s{i} s ON s.src = t.src AND s.dst = t.dst
              WHERE coalesce(s.c, 0) >= {k - 2})""")
    return f"WITH {', '.join(ctes)} SELECT src, dst FROM e{rounds}"


def _walks_sql(seeds: list[int], steps: int) -> str:
    """Unrolled deterministic-walk recurrence: per step, each walk moves
    to the out-neighbor minimizing (md5(walk:step:cur:nbr), nbr); sinks
    stay (LEFT JOIN + coalesce) — the exact rule of algos/walks.py."""
    seed_rows = ", ".join(f"({i}, {s})" for i, s in enumerate(seeds))
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            f"w0 AS MATERIALIZED (SELECT * FROM (VALUES {seed_rows}) "
            "t(walk_id, v))"]
    for t in range(1, steps + 1):
        p = f"w{t - 1}"
        ctes.append(f"""w{t} AS MATERIALIZED (
          SELECT {p}.walk_id, coalesce(c.nxt, {p}.v) AS v
          FROM {p} LEFT JOIN (
            SELECT walk_id, nxt FROM (
              SELECT {p}.walk_id, sym.dst AS nxt,
                     row_number() OVER (PARTITION BY {p}.walk_id
                       ORDER BY md5({p}.walk_id::VARCHAR || ':{t}:' ||
                                    {p}.v::VARCHAR || ':' ||
                                    sym.dst::VARCHAR), sym.dst) AS rn
              FROM {p} JOIN sym ON sym.src = {p}.v)
            WHERE rn = 1) c USING (walk_id))""")
    selects = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, v FROM w{t}"
        for t in range(steps + 1))
    return f"WITH {', '.join(ctes)} {selects}"


def _walk_pmi_sql(seeds: list[int], steps: int, window: int) -> str:
    """Skip-gram co-occurrence + PMI over the _walks_sql trajectories:
    unordered within-window pairs (self-pairs excluded), unigram
    counts, pmi = ln((n*U*U)::DOUBLE / (cu*cv*T)) — the identical
    exact-integer ratio and log the Ray side computes."""
    walks = _walks_sql(seeds, steps)
    return f"""
        WITH traj AS MATERIALIZED ({walks}),
        pairs AS MATERIALIZED (
          SELECT least(a.v, b.v) AS u, greatest(a.v, b.v) AS v,
                 count(*) AS n
          FROM traj a JOIN traj b ON a.walk_id = b.walk_id
            AND b.step BETWEEN a.step + 1 AND a.step + {window}
            AND a.v <> b.v
          GROUP BY 1, 2),
        tot AS (SELECT (SELECT count(*) FROM traj) AS bu,
                       (SELECT CAST(sum(n) AS BIGINT) FROM pairs) AS bt),
        uni AS (SELECT v, count(*) AS c FROM traj GROUP BY v)
        SELECT p.u, p.v, p.n,
               round(ln(CAST(p.n * tot.bu * tot.bu AS DOUBLE)
                        / (ua.c * ub.c * tot.bt)), 6) AS pmi
        FROM pairs p CROSS JOIN tot
        JOIN uni ua ON ua.v = p.u
        JOIN uni ub ON ub.v = p.v
    """


def _node2vec_sql(seeds: list[int], steps: int) -> str:
    """Unrolled second-order walk recurrence (algos/walks.node2vec_walks):
    per step each walk ranks cur's out-neighbors by (tier, md5, n) with
    tier 0 = edge(prev, n) exists, 1 = n == prev, 2 = else; sinks keep
    their whole (prev, v) state; prev starts at the seed."""
    seed_rows = ", ".join(f"({i}, {s}, {s})" for i, s in enumerate(seeds))
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            f"w0 AS MATERIALIZED (SELECT * FROM (VALUES {seed_rows}) "
            "t(walk_id, prev, v))"]
    for t in range(1, steps + 1):
        p = f"w{t - 1}"
        ctes.append(f"""w{t} AS MATERIALIZED (
          SELECT {p}.walk_id,
                 coalesce(c.nprev, {p}.prev) AS prev,
                 coalesce(c.nxt, {p}.v) AS v
          FROM {p} LEFT JOIN (
            SELECT walk_id, nprev, nxt FROM (
              SELECT {p}.walk_id, {p}.v AS nprev, sym.dst AS nxt,
                     row_number() OVER (PARTITION BY {p}.walk_id
                       ORDER BY CASE WHEN e.src IS NOT NULL THEN 0
                                     WHEN sym.dst = {p}.prev THEN 1
                                     ELSE 2 END,
                                md5({p}.walk_id::VARCHAR || ':{t}:' ||
                                    {p}.v::VARCHAR || ':' ||
                                    sym.dst::VARCHAR),
                                sym.dst) AS rn
              FROM {p} JOIN sym ON sym.src = {p}.v
              LEFT JOIN sym e ON e.src = {p}.prev
                             AND e.dst = sym.dst)
            WHERE rn = 1) c USING (walk_id))""")
    selects = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, v FROM w{t}"
        for t in range(steps + 1))
    return f"WITH {', '.join(ctes)} {selects}"


ADAMIC_ADAR_SQL = f"""
    WITH sym AS MATERIALIZED ({DOC_SYM_SQL}),
    deg AS MATERIALIZED (
      SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
    pairs AS (
      SELECT a.dst AS u, b.dst AS w, a.src AS c
      FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst),
    sc AS (
      SELECT u, w, round(sum(1.0 / ln(d)), 6) AS aa
      FROM pairs JOIN deg ON pairs.c = deg.v GROUP BY u, w)
    SELECT u, w, aa FROM sc ORDER BY aa DESC, u ASC, w ASC
    LIMIT {AA_TOPK}
"""

# all four neighborhood predictors over the same wedge set; the integer
# cn primary sort key keeps the top-k cut float-safe (aa/jac round-6
# BEFORE ordering, matching linkpred._lp_finish)
LINKPRED_SQL = f"""
    WITH sym AS MATERIALIZED ({DOC_SYM_SQL}),
    deg AS MATERIALIZED (
      SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
    pairs AS (
      SELECT a.dst AS u, b.dst AS w, a.src AS c
      FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst),
    sc AS (
      SELECT u, w, count(*)::BIGINT AS cn,
             round(sum(1.0 / ln(d)), 6) AS aa,
             round(sum(1.0 / d), 6) AS ra
      FROM pairs JOIN deg ON pairs.c = deg.v GROUP BY u, w)
    SELECT sc.u, sc.w, sc.cn, sc.aa, sc.ra,
           round(sc.cn::DOUBLE / (du.d + dw.d - sc.cn), 6) AS jac,
           (du.d * dw.d)::BIGINT AS pref
    FROM sc JOIN deg du ON sc.u = du.v JOIN deg dw ON sc.w = dw.v
    ORDER BY cn DESC, aa DESC, u ASC, w ASC
    LIMIT {AA_TOPK}
"""


def _stratified_sql() -> str:
    """Integer-exact twin of sampling.stratified_sample: same sha256
    prefix, same floor(rate * 2^32) thresholds."""
    from .sampling import _HASH_SPACE

    cases = " ".join(
        f"WHEN '{lang}' THEN {int(rate * _HASH_SPACE)}"
        for lang, rate in sorted(STRAT_RATES.items()))
    default_thr = int(STRAT_DEFAULT * _HASH_SPACE)
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || substr(sha256('strat:' || doc_id::VARCHAR), 1, 8))
              ::UBIGINT
              < CASE lang {cases} ELSE {default_thr} END
    """


def _quality_sql() -> str:
    from .text import PUNCT_RE, QUALITY_STOPWORD_RE, TOKEN_RE

    return f"""
        WITH s AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{TOKEN_RE}'))::DOUBLE
                     AS n_tok,
                 len(regexp_extract_all(lower(text),
                     '{QUALITY_STOPWORD_RE}'))::DOUBLE AS n_stop,
                 len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE
                     AS n_punct
          FROM documents
        ), q AS (
          SELECT doc_id,
                 round(0.4 * least(1.0, n_tok / 50.0)
                     + 0.4 * least(1.0, 5.0 * n_stop / greatest(n_tok, 1.0))
                     + 0.2 * (1.0 - least(1.0,
                                          n_punct / greatest(n_tok, 1.0))),
                       6) AS quality
          FROM s
        )
        SELECT doc_id, quality, quality >= 0.5 AS keep FROM q
    """


def _semdedup_sql(rounds: int) -> str:
    """Cosine pairs >= tau as an undirected graph, then the same
    unrolled min-label CC recurrence as _cc_sql, finally one row per
    component representative (lab == v)."""
    ctes = [f"""vv AS MATERIALIZED (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings)""",
            f"""pairs AS MATERIALIZED (
              SELECT a.vec_id AS src, b.vec_id AS dst
              FROM vv a JOIN vv b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.emb, b.emb)
                    >= {EMB_DUP_TAU})""",
            """sym AS MATERIALIZED (
              SELECT src, dst FROM pairs
              UNION ALL SELECT dst AS src, src AS dst FROM pairs)""",
            "allv AS MATERIALIZED (SELECT vec_id AS v FROM embeddings)",
            "l0 AS (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, least({p}.lab, "
            f"coalesce(m.lab, {p}.lab)) AS lab FROM allv "
            f"JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT sym.dst AS v, min({p}.lab) AS lab FROM sym "
            f"JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v AS vec_id FROM l{rounds} WHERE lab = v")


def _dupcc_sql(rounds: int) -> str:
    """dedup_clusters oracle: the FULL minhash pair SQL (nested WITH) as
    the edge set, then the unrolled min-label CC recurrence over every
    doc_id, emitting the (doc_id, cluster_id) assignment."""
    pairs = _minhash_sql(num_perm=64, bands=16, k=5, threshold=0.5,
                         cap=64)
    ctes = [f"pr AS MATERIALIZED ({pairs})",
            """sym AS MATERIALIZED (
              SELECT a AS src, b AS dst FROM pr
              UNION ALL SELECT b AS src, a AS dst FROM pr)""",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "l0 AS (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, least({p}.lab, "
            f"coalesce(m.lab, {p}.lab)) AS lab FROM allv "
            f"JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT sym.dst AS v, min({p}.lab) AS lab FROM sym "
            f"JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v AS doc_id, lab AS cluster_id FROM l{rounds}")


EMBED_CENTROIDS_SQL = """
    WITH e AS (
      SELECT label::BIGINT AS label, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings
    ), n AS (
      SELECT label, list_sum(list_transform(emb, x -> x * x)) AS sq, emb
      FROM e
    ), u AS (
      SELECT label, generate_subscripts(emb, 1)::BIGINT AS i,
             unnest(emb) /
             (CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END) AS x
      FROM n
    )
    SELECT label, i, round(sum(x) / count(*), 6) AS c, count(*) AS n
    FROM u GROUP BY label, i
"""


# ---------------------------------------------------------------------------
# MinHash / SimHash oracles: the LSH index arithmetic is DETERMINISTIC
# (uint64 polynomial shingle hashes, multiply-add permutations, FNV band
# folds, splitmix64 word avalanche), so the full candidate pipeline is
# reproducible in DuckDB with HUGEINT (int128) modular arithmetic:
# every product is kept < 2^127 (a_i, b_i < 2^61; 64x64-bit wraparound
# multiplies are split into 32-bit halves) and reduced % 2^64 exactly
# where numpy uint64 wraps.  Verified term-for-term against the engine
# kernels (MinHashStage.signature / SimHashStage.batch_sigs).

_W64 = "18446744073709551616::HUGEINT"  # 2^64, the uint64 wraparound modulus
_FNV = 1099511628211                    # polynomial / band-fold base


def _gram_hash_sql(col: str, k: int) -> str:
    """HUGEINT expression reproducing text.rolling_hashes for ONE shingle
    string in `col`: closed-form k-term polynomial for full-length grams,
    list_reduce fold for the short-text (whole-string) shingle."""
    w = 1 << 64
    closed = " + ".join(
        f"{pow(_FNV, k - 1 - i, w)}::HUGEINT*unicode(substr({col},{i + 1},1))"
        for i in range(k))
    fold = (f"list_reduce(list_transform(range(1, length({col}) + 1), "
            f"j -> unicode(substr({col}, j::INT, 1))::HUGEINT), "
            f"(acc, c) -> (acc * {_FNV} + c) % {_W64})")
    return (f"(CASE WHEN length({col}) = {k} THEN ({closed}) % {_W64} "
            f"WHEN length({col}) = 0 THEN 0::HUGEINT ELSE ({fold}) END)")


def _mulmod64_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 for x < 2^64 and a full-range 64-bit constant c,
    without overflowing int128: split c into 32-bit halves."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return (f"((({x})::HUGEINT * {lo} + ((({x})::HUGEINT * {hi}) % "
            f"4294967296::HUGEINT) * 4294967296::HUGEINT) % {_W64})")


def _shingles_sql(k: int, src: str = "documents") -> str:
    """Distinct (doc_id, sh) char-k-gram shingle strings, matching
    rolling_hashes' enumeration (whole text when len < k)."""
    return f"""
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(
                   CASE WHEN length(text) < {k} THEN [text]
                   ELSE list_transform(range(1, length(text) - {k - 2}),
                                       j -> substr(text, j::INT, {k}))
                   END) AS sh
          FROM {src})"""


def _substr_sql(window: int, stride: int, df_cap: int,
                src: str = "documents") -> str:
    """Oracle for dedup.substring_dup_pairs: enumerate the same sampled
    windows (1-based substr at positions 1 + j*stride, docs with
    length >= window only), hash each window with the IDENTICAL uint64
    polynomial in HUGEINT (_gram_hash_sql — every window is exactly
    `window` chars so the closed-form branch applies: 40 terms of
    constant*codepoint, each < 2^85, sum < 2^91, one final % 2^64),
    drop hashes shared by > df_cap docs, pair and count distinct
    shared hashes per (a, b)."""
    gh = _gram_hash_sql("sh", window)
    return f"""
        WITH w AS MATERIALIZED (
          SELECT DISTINCT doc_id, {gh} AS h FROM (
            SELECT doc_id, unnest(list_transform(
                range(0, (length(text) - {window}) // {stride} + 1),
                j -> substr(text, (j*{stride}+1)::INT, {window}))) AS sh
            FROM {src} WHERE length(text) >= {window})),
        ok AS (SELECT h FROM w GROUP BY h
               HAVING count(*) >= 2 AND count(*) <= {df_cap})
        SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
        FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
        JOIN ok ON ok.h = a.h
        GROUP BY 1, 2
    """


PCA_ITERS = 8


def _pca_ctes(iters: int, src: str) -> list:
    """Shared CTE chain for _pca_sql / _pca_project_sql: G from an
    unnest self-join, then `iters` matvec + L2-normalize rounds."""
    parts = [f"""
        u AS MATERIALIZED (
          SELECT vec_id,
                 CAST(generate_subscripts(emb, 1) AS BIGINT) - 1 AS dim,
                 unnest(emb) AS x
          FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM {src})),
        g AS MATERIALIZED (
          SELECT a.dim AS i, b.dim AS j, sum(a.x * b.x) AS val
          FROM u a JOIN u b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        v0 AS MATERIALIZED (
          SELECT dim AS i,
                 1.0 / sqrt((SELECT count(DISTINCT dim) FROM u)) AS x
          FROM (SELECT DISTINCT dim FROM u))"""]
    for t in range(1, iters + 1):
        parts.append(f"""
        w{t} AS MATERIALIZED (
          SELECT g.i AS i, sum(g.val * v{t - 1}.x) AS x
          FROM g JOIN v{t - 1} ON g.j = v{t - 1}.i GROUP BY 1),
        v{t} AS MATERIALIZED (
          SELECT i, x / (SELECT sqrt(sum(x * x)) FROM w{t}) AS x
          FROM w{t})""")
    return parts


def _pca_sql(iters: int = PCA_ITERS, src: str = "embeddings") -> str:
    """Oracle for ann.pca_power_top: the fixed-init power iteration
    unrolled (_pca_ctes), then the Rayleigh quotient computed
    matvec-first like the numpy side."""
    parts = _pca_ctes(iters, src)
    parts.append(f"""
        wf AS (SELECT g.i AS i, sum(g.val * v{iters}.x) AS x
               FROM g JOIN v{iters} ON g.j = v{iters}.i GROUP BY 1),
        lam AS (SELECT sum(v{iters}.x * wf.x) AS l
                FROM v{iters} JOIN wf ON v{iters}.i = wf.i)""")
    return ("WITH " + ",".join(parts) + f"""
        SELECT v{iters}.i AS i, round(v{iters}.x, 6) AS loading,
               round((SELECT l FROM lam), 6) AS eigval
        FROM v{iters}""")


def _pca_project_sql(iters: int = PCA_ITERS,
                     src: str = "embeddings") -> str:
    """Oracle for ann.pca_project: the same iteration chain, final
    select = per-vector dot with the converged direction."""
    parts = _pca_ctes(iters, src)
    return ("WITH " + ",".join(parts) + f"""
        SELECT u.vec_id, round(sum(u.x * v{iters}.x), 6) AS proj
        FROM u JOIN v{iters} ON v{iters}.i = u.dim
        GROUP BY u.vec_id""")


def _minhash_sql(num_perm: int, bands: int, k: int, threshold: float,
                 cap: int, seed: int = 42, src: str = "documents") -> str:
    """Full MinHash+LSH near-dup oracle (dedup.minhash_dedup_pairs /
    ngram_jaccard_pairs): shingle hashes -> num_perm permutation minima
    -> per-band FNV fold -> bucket groups -> df-capped pairs -> exact
    Jaccard >= threshold over the full (string) shingle sets."""
    mers = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    pa_ = rng.integers(1, mers, num_perm, dtype=np.uint64)
    pb_ = rng.integers(0, mers, num_perm, dtype=np.uint64)
    perms = ", ".join(f"({i}, {int(pa_[i])}::HUGEINT, {int(pb_[i])}::HUGEINT)"
                      for i in range(num_perm))
    rpb = num_perm // bands
    # band fold over the rpb signature minima, ordered by permutation id:
    # bh_0 = s_0; bh_r = (bh_{r-1} * FNV + s_r) mod 2^64
    fold = "l[1]"
    for r in range(1, rpb):
        fold = f"(({fold}) * {_FNV} + l[{r + 1}]) % {_W64}"
    return f"""
        WITH shd AS MATERIALIZED ({_shingles_sql(k, src)}),
        hs AS MATERIALIZED (
          SELECT DISTINCT doc_id, {_gram_hash_sql('sh', k)} AS h FROM shd),
        perms(i, pa, pb) AS (VALUES {perms}),
        sigs AS MATERIALIZED (
          SELECT doc_id, i, min((h * pa + pb) % {_W64}) AS s
          FROM hs CROSS JOIN perms GROUP BY doc_id, i),
        bnd AS MATERIALIZED (
          SELECT doc_id, band, {fold} AS bh FROM (
            SELECT doc_id, i // {rpb} AS band, list(s ORDER BY i) AS l
            FROM sigs GROUP BY doc_id, i // {rpb})),
        capped AS (
          SELECT doc_id, band, bh FROM (
            SELECT doc_id, band, bh, row_number() OVER
                   (PARTITION BY band, bh ORDER BY doc_id) AS rn
            FROM bnd) WHERE rn <= {cap}),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM capped x JOIN capped y
            ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
        inter AS MATERIALIZED (
          SELECT c.a, c.b, count(*) AS i
          FROM cand c
          JOIN shd sa ON sa.doc_id = c.a
          JOIN shd sb ON sb.doc_id = c.b AND sb.sh = sa.sh
          GROUP BY c.a, c.b)
        SELECT i.a, i.b
        FROM inter i
        JOIN sizes za ON za.doc_id = i.a
        JOIN sizes zb ON zb.doc_id = i.b
        WHERE i.i::DOUBLE / (za.sz + zb.sz - i.i) >= {threshold}
    """


def _simhash_sql(max_hamming: int, cap: int, word_prefix: int = 16) -> str:
    """SimHash near-dup oracle (dedup.simhash_dedup_pairs): per-word
    prefix polynomial hash + splitmix64 avalanche, per-doc 64-bit
    majority signature, 4x16-bit block buckets, capped in-bucket pairs
    with popcount hamming <= max_hamming.  Word split: the corpus is
    ASCII (space/tab/newline separators), where Python isspace ==
    the [ \\t\\n]+ character class."""
    fold = "0::HUGEINT"
    for j in range(word_prefix):
        fold = (f"(CASE WHEN length(w) > {j} THEN (({fold}) * {_FNV} + "
                f"unicode(substr(w,{j + 1},1))) % {_W64} "
                f"ELSE ({fold}) END)")
    return f"""
        WITH words AS MATERIALIZED (
          SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                   '[ \t\n]+')) AS w
            FROM documents)
          WHERE length(w) > 0),
        wh0 AS (SELECT doc_id, ({fold})::UBIGINT AS h0 FROM words),
        wh1 AS (SELECT doc_id, xor(h0, h0 >> 33) AS h1 FROM wh0),
        wh2 AS (SELECT doc_id,
                {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2
                FROM wh1),
        wh3 AS (SELECT doc_id, xor(h2, h2 >> 29) AS h3 FROM wh2),
        wh4 AS (SELECT doc_id,
                {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4
                FROM wh3),
        wh AS MATERIALIZED (
          SELECT doc_id, xor(h4, h4 >> 32) AS h FROM wh4),
        bits AS (
          SELECT doc_id, j, sum(((h >> j::INT) & 1)::BIGINT) AS c,
                 count(*) AS n
          FROM wh CROSS JOIN (SELECT unnest(range(64)) AS j)
          GROUP BY doc_id, j),
        sig AS MATERIALIZED (
          SELECT doc_id,
                 sum(CASE WHEN 2 * c > n
                     THEN (1::HUGEINT << j::INT) ELSE 0::HUGEINT
                     END)::UBIGINT AS s
          FROM bits GROUP BY doc_id),
        blocks AS MATERIALIZED (
          SELECT doc_id, s, t, (s >> (16 * t)::INT) & 65535 AS bh
          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS t)),
        capped AS (
          SELECT doc_id, s, t, bh FROM (
            SELECT doc_id, s, t, bh, row_number() OVER
                   (PARTITION BY t, bh ORDER BY doc_id) AS rn
            FROM blocks) WHERE rn <= {cap})
        SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        FROM capped x JOIN capped y
          ON x.t = y.t AND x.bh = y.bh AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.s, y.s)) <= {max_hamming}
    """


def _ann_ivf_sql(k=5, n_centroids=16, n_probe=4, rounds=5, seed=42,
                 query_ids=(0, 1, 2, 3, 4), sample_n=500):
    """Unrolled-k-means IVF ANN oracle (ann.ivf_topk defaults): the
    seeded init indices are precomputed (rng.choice over the 500-row
    embeddings sample — both test sfs ship exactly 500 rows, and
    vec_id == row order, verified), 5 Lloyd rounds run as long-form
    (c, i, y) centroid CTEs with argmax assignment = row_number
    (dot DESC, c ASC), then bucket assignment, n_probe probing and
    cosine top-k exactly as the engine computes them.  Float sums
    differ from numpy at ~1e-16; assignments/rankings only flip on
    exact ties, which the random embeddings never produce — verified
    end-to-end equal at sf0.01 and sf0.001."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample_n, n_centroids, replace=False)
    init_rows = ", ".join(f"({c}, {int(idx[c])})" for c in range(n_centroids))
    qids = ", ".join(map(str, query_ids))
    ctes = [f"""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
      """nrm AS MATERIALIZED (
      SELECT vec_id, v,
             CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END AS nv
      FROM (SELECT vec_id, v,
            list_sum(list_transform(v, x -> x*x)) AS sq FROM emb))""",
      """sml AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) / nv AS x
      FROM nrm)""",
      f"initmap(c, vid) AS (VALUES {init_rows})",
      """cent0 AS MATERIALIZED (
      SELECT m.c, s.i, s.x AS y FROM initmap m
      JOIN sml s ON s.vec_id = m.vid)"""]
    for r in range(1, rounds + 1):
        p = f"cent{r-1}"
        ctes.append(f"""dot{r} AS MATERIALIZED (
          SELECT s.vec_id, c.c, sum(s.x * c.y) AS d
          FROM sml s JOIN {p} c ON c.i = s.i
          GROUP BY s.vec_id, c.c)""")
        ctes.append(f"""asg{r} AS MATERIALIZED (
          SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER
              (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
            FROM dot{r}) WHERE rn = 1)""")
        ctes.append(f"""mean{r} AS MATERIALIZED (
          SELECT a.c, s.i, avg(s.x) AS y
          FROM asg{r} a JOIN sml s ON s.vec_id = a.vec_id
          GROUP BY a.c, s.i)""")
        ctes.append(f"""mn{r} AS MATERIALIZED (
          SELECT c, CASE WHEN sum(y*y) = 0 THEN 1.0
                    ELSE sqrt(sum(y*y)) END AS nn
          FROM mean{r} GROUP BY c)""")
        ctes.append(f"""cent{r} AS MATERIALIZED (
          SELECT p.c, p.i,
                 coalesce(m.y / n.nn, p.y) AS y
          FROM {p} p
          LEFT JOIN mean{r} m ON m.c = p.c AND m.i = p.i
          LEFT JOIN mn{r} n ON n.c = p.c)""")
    last = f"cent{rounds}"
    ctes.append(f"""vdot AS MATERIALIZED (
      SELECT s.vec_id, c.c, sum(s.x * c.y) AS d
      FROM sml s JOIN {last} c ON c.i = s.i
      GROUP BY s.vec_id, c.c)""")
    ctes.append("""bkt AS MATERIALIZED (
      SELECT vec_id, c AS b FROM (
        SELECT vec_id, c, row_number() OVER
          (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
        FROM vdot) WHERE rn = 1)""")
    ctes.append(f"""probe AS MATERIALIZED (
      SELECT vec_id AS query_id, c FROM (
        SELECT vec_id, c, row_number() OVER
          (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
        FROM vdot WHERE vec_id IN ({qids}))
      WHERE rn <= {n_probe})""")
    ctes.append(f"""cand AS MATERIALIZED (
      SELECT p.query_id, b.vec_id AS neighbor_id
      FROM probe p JOIN bkt b ON b.b = p.c
      WHERE b.vec_id <> p.query_id)""")
    ctes.append("""sims AS MATERIALIZED (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(q.v, e.v) AS cos
      FROM cand c
      JOIN emb q ON q.vec_id = c.query_id
      JOIN emb e ON e.vec_id = c.neighbor_id)""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT query_id, neighbor_id FROM ("
            f"SELECT query_id, neighbor_id, row_number() OVER "
            f"(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) "
            f"AS rn FROM sims) WHERE rn <= {k}")



def _kmeans_full_sql(n_centroids: int = 8, iters: int = 4,
                     seed: int = 42, sample_n: int = 500,
                     tail: str = "counts") -> str:
    """Oracle for ann.kmeans_full: the identical seeded init rows, then
    `iters` FULL-CORPUS Lloyd rounds unrolled as materialized CTEs
    (argmax-dot assignment via row_number (d DESC, c ASC), per-cluster
    avg + L2 normalize with the zero guard, empty clusters keep the
    previous centroid via coalesce), then final-assignment cluster
    sizes.  Same float-tie caveat as _ann_ivf_sql: sums differ ~1e-16
    from numpy, assignments only flip on exact ties, which the random
    embeddings never produce."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample_n, n_centroids, replace=False)
    init_rows = ", ".join(f"({c}, {int(idx[c])})"
                          for c in range(n_centroids))
    ctes = ["""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
      """nrm AS MATERIALIZED (
      SELECT vec_id, v,
             CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END AS nv
      FROM (SELECT vec_id, v,
            list_sum(list_transform(v, x -> x*x)) AS sq FROM emb))""",
      """sml AS MATERIALIZED (
      SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
             unnest(v) / nv AS x
      FROM nrm)""",
      f"initmap(c, vid) AS (VALUES {init_rows})",
      """cent0 AS MATERIALIZED (
      SELECT CAST(m.c AS BIGINT) AS c, s.i, s.x AS y FROM initmap m
      JOIN sml s ON s.vec_id = m.vid)"""]
    for r in range(1, iters + 1):
        p = f"cent{r - 1}"
        ctes.append(f"""dot{r} AS MATERIALIZED (
          SELECT s.vec_id, c.c, sum(s.x * c.y) AS d
          FROM sml s JOIN {p} c ON c.i = s.i
          GROUP BY s.vec_id, c.c)""")
        ctes.append(f"""asg{r} AS MATERIALIZED (
          SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER
              (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
            FROM dot{r}) WHERE rn = 1)""")
        ctes.append(f"""mean{r} AS MATERIALIZED (
          SELECT a.c, s.i, avg(s.x) AS y
          FROM asg{r} a JOIN sml s ON s.vec_id = a.vec_id
          GROUP BY a.c, s.i)""")
        ctes.append(f"""mn{r} AS MATERIALIZED (
          SELECT c, CASE WHEN sum(y*y) = 0 THEN 1.0
                    ELSE sqrt(sum(y*y)) END AS nn
          FROM mean{r} GROUP BY c)""")
        ctes.append(f"""cent{r} AS MATERIALIZED (
          SELECT p.c, p.i, coalesce(m.y / n.nn, p.y) AS y
          FROM {p} p
          LEFT JOIN mean{r} m ON m.c = p.c AND m.i = p.i
          LEFT JOIN mn{r} n ON n.c = p.c)""")
    last = f"cent{iters}"
    ctes.append(f"""fdot AS MATERIALIZED (
      SELECT s.vec_id, c.c, sum(s.x * c.y) AS d
      FROM sml s JOIN {last} c ON c.i = s.i
      GROUP BY s.vec_id, c.c)""")
    ctes.append("""fasg AS MATERIALIZED (
      SELECT vec_id, c FROM (
        SELECT vec_id, c, row_number() OVER
          (PARTITION BY vec_id ORDER BY d DESC, c ASC) AS rn
        FROM fdot) WHERE rn = 1)""")
    if tail == "counts":
        ctes.append(
            "cnt AS (SELECT c, count(*) AS n FROM fasg GROUP BY c)")
        return (f"WITH {', '.join(ctes)} "
                f"SELECT p.c, p.i, round(p.y, 6) AS y, "
                f"CAST(coalesce(cnt.n, 0) AS BIGINT) AS n "
                f"FROM {last} p LEFT JOIN cnt ON cnt.c = p.c")
    if tail == "purity":
        # per-cluster majority-label share over the final assignment
        ctes.append("""lab AS (SELECT f.vec_id, f.c, e2.label
          FROM fasg f JOIN embeddings e2 USING (vec_id))""")
        ctes.append("""cl AS (SELECT c, label, count(*)::BIGINT AS n
          FROM lab GROUP BY c, label)""")
        return (f"WITH {', '.join(ctes)} "
                f"SELECT c, sum(n)::BIGINT AS n_vecs, "
                f"max(n)::BIGINT AS n_majority, "
                f"round(max(n)::DOUBLE / sum(n), 6) AS purity "
                f"FROM cl GROUP BY c")
    if tail == "semdedup":
        # SemDeDup: within each final cluster, drop b iff some a < b in
        # the cluster has cosine(a, b) >= tau (cosine on RAW vectors —
        # normalization-invariant, so it equals the engine's normalized
        # dot to ~1e-16)
        ctes.append(f"""drp AS (
          SELECT DISTINCT b.vec_id FROM fasg a JOIN fasg b
            ON a.c = b.c AND a.vec_id < b.vec_id
          JOIN emb ea ON ea.vec_id = a.vec_id
          JOIN emb eb ON eb.vec_id = b.vec_id
          WHERE list_cosine_similarity(ea.v, eb.v) >= {SEMDEDUP_TAU})""")
        return (f"WITH {', '.join(ctes)} "
                f"SELECT f.vec_id, f.c, "
                f"(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT "
                f"AS dropped "
                f"FROM fasg f LEFT JOIN drp d USING (vec_id)")
    # tail == "silhouette": simplified (centroid-based) silhouette from
    # the final assignment — a = 1 - dot(own centroid), b = 1 - best
    # other dot, s = (b - a) / max(a, b); ties/floats as ann.
    # cluster_silhouette (sums differ ~1e-16, fine after round-6).
    ctes.append("""sil AS (
      SELECT f.vec_id, a.c,
             1 - max(CASE WHEN f.c = a.c THEN f.d END) AS adist,
             1 - max(CASE WHEN f.c <> a.c THEN f.d END) AS bdist
      FROM fdot f JOIN fasg a USING (vec_id) GROUP BY f.vec_id, a.c)""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT c, count(*)::BIGINT AS n, "
            f"round(avg(CASE WHEN greatest(adist, bdist) = 0 THEN 0 "
            f"ELSE (bdist - adist) / greatest(adist, bdist) END), 6) "
            f"AS sil FROM sil GROUP BY c ORDER BY c")


def _knn_cc_sql(k: int, n_planes: int, rounds: int, seed: int = 42,
                dim: int = 64) -> str:
    """Oracle for q_embed_knn_cc: identical seeded hyperplane codes
    (the _ann_lsh_sql literal-injection convention), candidates =
    hamming(code) <= 1, per-vector cosine top-k (cos DESC, id ASC),
    symmetrized edge set, then `rounds` unrolled min-label CC rounds
    (the _cc_sql shape over the derived edges)."""
    from .ann import make_hyperplanes

    planes = make_hyperplanes(dim, n_planes, seed)
    code_expr = " + ".join(
        f"(CASE WHEN list_dot_product(v, "
        f"[{', '.join(repr(x) for x in planes[i])}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes))
    ctes = [f"""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
      f"""code AS MATERIALIZED (
      SELECT vec_id, v, ({code_expr})::BIGINT AS c FROM emb)""",
      f"""knn AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a.vec_id AS a, e.vec_id AS b,
               row_number() OVER (PARTITION BY a.vec_id ORDER BY
                 list_cosine_similarity(a.v, e.v) DESC,
                 e.vec_id ASC) AS rn
        FROM code a JOIN code e
          ON e.vec_id <> a.vec_id
         AND bit_count(xor(a.c, e.c)) <= 1)
      WHERE rn <= {k})""",
      """sym AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM knn
      UNION SELECT b AS src, a AS dst FROM knn)""",
      "allv AS MATERIALIZED (SELECT vec_id AS v FROM embeddings)",
      "l0 AS MATERIALIZED (SELECT v, v AS lab FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, "
            f"least({p}.lab, coalesce(m.lab, {p}.lab)) AS lab "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT sym.dst AS v, min({p}.lab) AS lab FROM sym "
            f"JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, lab AS label FROM l{rounds}")


def _pq_sql(m: int, k: int, iters: int, seed: int, sample_n: int,
            query_ids: list[int], k_nn: int, dim: int = 64) -> str:
    """Oracle for ann.pq_topk: per-subspace seeded init rows, `iters`
    raw-L2 Lloyd rounds unrolled per subspace (argmin via row_number
    (d ASC, c ASC), avg update, empty clusters keep the previous
    codeword), then ADC — per-query (m x k) LUT + code-tuple gather.
    Same float-tie caveat as _kmeans_full_sql."""
    sub = dim // m
    ctes = ["""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
      """sml AS MATERIALIZED (
      SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
             unnest(v) AS x FROM emb)"""]
    qlist = ", ".join(map(str, query_ids))
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        idx = np.random.default_rng(seed + s).choice(sample_n, k,
                                                     replace=False)
        init_rows = ", ".join(f"({c}, {int(idx[c])})"
                              for c in range(k))
        ctes.append(f"""sub{s} AS MATERIALIZED (
          SELECT vec_id, i - {lo} + 1 AS ii, x FROM sml
          WHERE i BETWEEN {lo} AND {hi})""")
        ctes.append(f"init{s}(c, vid) AS (VALUES {init_rows})")
        ctes.append(f"""c{s}_0 AS MATERIALIZED (
          SELECT CAST(t.c AS BIGINT) AS c, u.ii AS i, u.x AS y
          FROM init{s} t JOIN sub{s} u ON u.vec_id = t.vid)""")
        for r in range(1, iters + 1):
            p = f"c{s}_{r - 1}"
            ctes.append(f"""d{s}_{r} AS MATERIALIZED (
              SELECT u.vec_id, c.c,
                     sum((u.x - c.y) * (u.x - c.y)) AS d
              FROM sub{s} u JOIN {p} c ON c.i = u.ii
              GROUP BY u.vec_id, c.c)""")
            ctes.append(f"""a{s}_{r} AS MATERIALIZED (
              SELECT vec_id, c FROM (
                SELECT vec_id, c, row_number() OVER
                  (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
                FROM d{s}_{r}) WHERE rn = 1)""")
            ctes.append(f"""m{s}_{r} AS MATERIALIZED (
              SELECT a.c, u.ii AS i, avg(u.x) AS y
              FROM a{s}_{r} a JOIN sub{s} u ON u.vec_id = a.vec_id
              GROUP BY a.c, u.ii)""")
            ctes.append(f"""c{s}_{r} AS MATERIALIZED (
              SELECT p.c, p.i, coalesce(t.y, p.y) AS y
              FROM {p} p
              LEFT JOIN m{s}_{r} t ON t.c = p.c AND t.i = p.i)""")
        last = f"c{s}_{iters}"
        ctes.append(f"""fd{s} AS MATERIALIZED (
          SELECT u.vec_id, c.c, sum((u.x - c.y) * (u.x - c.y)) AS d
          FROM sub{s} u JOIN {last} c ON c.i = u.ii
          GROUP BY u.vec_id, c.c)""")
        ctes.append(f"""fa{s} AS MATERIALIZED (
          SELECT vec_id, c FROM (
            SELECT vec_id, c, row_number() OVER
              (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
            FROM fd{s}) WHERE rn = 1)""")
        ctes.append(f"""lut{s} AS MATERIALIZED (
          SELECT vec_id AS query_id, c, d FROM fd{s}
          WHERE vec_id IN ({qlist}))""")
    fa_joins = " ".join(
        f"JOIN fa{s} ON fa{s}.vec_id = fa0.vec_id" if s else "FROM fa0"
        for s in range(m))
    lut_joins = " ".join(
        f"JOIN lut{s} ON lut{s}.c = fa{s}.c"
        + ("" if s == 0 else f" AND lut{s}.query_id = lut0.query_id")
        for s in range(m))
    adist = " + ".join(f"lut{s}.d" for s in range(m))
    ctes.append(f"""ad AS MATERIALIZED (
      SELECT lut0.query_id, fa0.vec_id AS neighbor_id,
             {adist} AS adist
      {fa_joins} {lut_joins}
      WHERE fa0.vec_id <> lut0.query_id)""")
    ctes.append(f"""rk AS (
      SELECT query_id, neighbor_id, adist, row_number() OVER
        (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC)
          AS rnk
      FROM ad)""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT query_id, neighbor_id, rnk, round(adist, 6) "
            f"AS adist FROM rk WHERE rnk <= {k_nn}")


def _ann_lsh_sql(n_planes: int, k: int, seed: int = 42,
                 dim: int = 64) -> str:
    """Sign-LSH ANN oracle (ann.lsh_topk): the seeded hyperplanes are
    injected as exact round-trip double literals, codes recomputed with
    list_dot_product sign tests, probe set = hamming distance <= 1 via
    popcount, cosine top-k ranked like ann_topk."""
    from .ann import make_hyperplanes

    planes = make_hyperplanes(dim, n_planes, seed)
    code_expr = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(x) for x in planes[i])}]) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes))
    return f"""
        WITH emb AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        code AS MATERIALIZED (
          SELECT vec_id, v, ({code_expr})::BIGINT AS c FROM emb),
        q AS (SELECT vec_id AS query_id, v AS qv, c AS qc FROM code
              WHERE vec_id IN ({', '.join(map(str, ANN_QUERY_IDS))})),
        sims AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 list_cosine_similarity(q.qv, e.v) AS cos
          FROM q JOIN code e
            ON e.vec_id <> q.query_id
           AND bit_count(xor(q.qc, e.c)) <= 1),
        ranked AS (SELECT query_id, neighbor_id, cos,
                          row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS rnk
                   FROM sims)
        SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
        FROM ranked WHERE rnk <= {k}
    """


def _negative_samples_sql(k: int, probes: int) -> str:
    """SQL twin of linkpred.negative_samples over the canonical doc
    edges: probe hash = murmur finalizer of (src * 2^32 + j) in
    HUGEINT, candidate = hash mod n_vertices, NOT-EXISTS edge filter,
    first-probe dedupe, first-k rank cut — identical integer math."""
    return f"""
        WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
        vs AS MATERIALIZED (SELECT DISTINCT v FROM
            (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)),
        nv AS (SELECT max(v) + 1 AS n FROM vs),
        p0 AS (SELECT vs.v AS src, t.j AS j,
                      ((vs.v::HUGEINT * 4294967296 + t.j) % {_W64})
                      ::UBIGINT AS z
               FROM vs CROSS JOIN range({probes}) t(j)),
        p1 AS (SELECT src, j, xor(z, z >> 33) AS z FROM p0),
        p2 AS (SELECT src, j,
                      {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT
                      AS z FROM p1),
        p3 AS (SELECT src, j, xor(z, z >> 29) AS z FROM p2),
        p4 AS (SELECT src, j,
                      {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT
                      AS z FROM p3),
        pr AS MATERIALIZED (SELECT src, j, xor(z, z >> 32) AS z FROM p4),
        cand AS MATERIALIZED (
          SELECT src, j,
                 (z % ((SELECT n FROM nv))::UBIGINT)::BIGINT AS cand
          FROM pr),
        ok AS MATERIALIZED (
          SELECT c.src, c.j, c.cand FROM cand c
          WHERE c.cand <> c.src AND NOT EXISTS (
            SELECT 1 FROM e WHERE e.src = least(c.src, c.cand)
                              AND e.dst = greatest(c.src, c.cand))),
        ded AS (SELECT src, j, cand FROM (
          SELECT src, j, cand, row_number() OVER
            (PARTITION BY src, cand ORDER BY j) AS rn FROM ok)
          WHERE rn = 1)
        SELECT src, rnk, neg FROM (
          SELECT src, cand AS neg, row_number() OVER
            (PARTITION BY src ORDER BY j) AS rnk FROM ded)
        WHERE rnk <= {k}
    """


def _neighbor_sample_sql(seeds=NS_SEEDS, fanouts=NS_FANOUTS) -> str:
    """SQL twin of neighbors.sample_neighbors on the symmetric doc
    graph: the identical murmur finalizer over (src << 32 | dst) in
    HUGEINT (bijective => collision-free priorities, so the bare
    ORDER BY z is total), then per-hop row_number <= fanout."""
    sel = ", ".join(str(s) for s in seeds)
    ctes = [
        f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
        f"z0 AS (SELECT src, dst, ((src::HUGEINT * 4294967296 + "
        f"dst::HUGEINT) % {_W64})::UBIGINT AS z FROM sym)",
        "z1 AS (SELECT src, dst, xor(z, z >> 33) AS z FROM z0)",
        f"z2 AS (SELECT src, dst, "
        f"{_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z FROM z1)",
        "z3 AS (SELECT src, dst, xor(z, z >> 29) AS z FROM z2)",
        f"z4 AS (SELECT src, dst, "
        f"{_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z FROM z3)",
        "pri AS MATERIALIZED "
        "(SELECT src, dst, xor(z, z >> 32) AS z FROM z4)",
        f"""h1 AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src ORDER BY z) AS rn
            FROM pri WHERE src IN ({sel})) WHERE rn <= {fanouts[0]})""",
    ]
    unions = ["SELECT 1::BIGINT AS hop, src, dst FROM h1"]
    prev = "h1"
    for i, k in enumerate(fanouts[1:], start=2):
        ctes.append(f"""h{i} AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src ORDER BY z) AS rn
            FROM pri WHERE src IN (SELECT DISTINCT dst FROM {prev}))
          WHERE rn <= {k})""")
        unions.append(f"SELECT {i}::BIGINT AS hop, src, dst FROM h{i}")
        prev = f"h{i}"
    return f"WITH {', '.join(ctes)} {' UNION ALL '.join(unions)}"


def _shuffle_shards_sql(shard_size=None) -> str:
    """SQL twin of shuffle.shuffle_shard_ranks (seed 0): the identical
    murmur finalizer on doc_id in HUGEINT; the hash is bijective so
    ORDER BY z is total and row_number is deterministic."""
    if shard_size is None:
        shard_size = SHARD_SIZE
    return f"""
        WITH z0 AS (SELECT doc_id,
                           (doc_id::HUGEINT % {_W64})::UBIGINT AS z
                    FROM documents),
        z1 AS (SELECT doc_id, xor(z, z >> 33) AS z FROM z0),
        z2 AS (SELECT doc_id,
                      {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT
                      AS z FROM z1),
        z3 AS (SELECT doc_id, xor(z, z >> 29) AS z FROM z2),
        z4 AS (SELECT doc_id,
                      {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT
                      AS z FROM z3),
        zf AS (SELECT doc_id, xor(z, z >> 32) AS z FROM z4)
        SELECT doc_id, (pos // {shard_size})::BIGINT AS shard, pos
        FROM (SELECT doc_id,
                     (row_number() OVER (ORDER BY z) - 1)::BIGINT AS pos
              FROM zf)
    """


def _redact_sql() -> str:
    """SQL twin of q_text_redact: the identical PII injection concat,
    then the identical RE2 patterns applied in the identical order
    (Arrow replace_substring_regex and DuckDB regexp_replace are both
    RE2; counts are staged — each pattern counted on the text AFTER the
    previous pattern's replacement, exactly as text.redact_pii does)."""
    from .text import PII_PATTERNS

    inj = ("CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || "
           "CAST(doc_id AS VARCHAR) || '@mail.example.com ip 10.' || "
           "CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
           "CAST(doc_id % 100 AS VARCHAR) || ' tel +1-555-' || "
           "CAST(1000000 + doc_id % 100000 AS VARCHAR) "
           "ELSE text END")
    sql = f"WITH s0 AS (SELECT doc_id, {inj} AS t FROM documents)"
    prev, counts = "s0", []
    for i, (name, pat, tok) in enumerate(PII_PATTERNS, 1):
        carried = (", ".join(counts) + ", ") if counts else ""
        sql += (f", s{i} AS (SELECT doc_id, {carried}"
                f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{name},"
                f" regexp_replace(t, '{pat}', '{tok}', 'g') AS t"
                f" FROM {prev})")
        counts.append(f"n_{name}")
        prev = f"s{i}"
    return (f"{sql} SELECT doc_id, {', '.join(counts)}, "
            f"t AS text_redacted FROM {prev}")


ORACLE_PHASH = """
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
          FROM documents
        ), g AS (
          SELECT media_id, gy.ty, gx.tx,
                 ((media_id * 131 + ((gy.ty * h) // 8) * 17
                   + ((gx.tx * w) // 9) * 7 + 0) % 256
                  + (media_id * 131 + ((gy.ty * h) // 8) * 17
                     + ((gx.tx * w) // 9) * 7 + 3) % 256
                  + (media_id * 131 + ((gy.ty * h) // 8) * 17
                     + ((gx.tx * w) // 9) * 7 + 6) % 256) AS g3
          FROM m
          CROSS JOIN (SELECT unnest(range(9)) AS tx) gx
          CROSS JOIN (SELECT unnest(range(8)) AS ty) gy
        ), bits AS (
          SELECT a.media_id, (a.ty * 8 + a.tx)::INT AS p,
                 CASE WHEN b.g3 > a.g3 THEN 1::BIGINT ELSE 0 END AS bit
          FROM g a JOIN g b ON b.media_id = a.media_id
                           AND b.ty = a.ty AND b.tx = a.tx + 1
          WHERE a.tx < 8
        )
        SELECT media_id,
               sum(CASE WHEN p >= 32 THEN bit << (p - 32)
                   ELSE 0 END)::BIGINT AS dhash_hi,
               sum(CASE WHEN p < 32 THEN bit << p
                   ELSE 0 END)::BIGINT AS dhash_lo,
               sum(bit)::BIGINT AS ones
        FROM bits GROUP BY media_id
    """


_LANGID_BODY = _langid_sql()

def _msf_sql(rounds: int, jumps: int) -> str:
    """Unrolled-Boruvka SQL twin of q_doc_msf (house convention:
    iterative algos oracle via AS MATERIALIZED CTE rounds).  Per round:
    per-component argmin over (w10, u, v) via row_number, deterministic
    min-root hooking of mutual pairs, `jumps` pointer-doubling steps,
    component relabel.  Post-convergence rounds are no-ops (empty
    sel -> unchanged comp map), so a generous fixed unroll is safe."""
    ctes = [
        f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
        "e AS MATERIALIZED (SELECT src AS u, dst AS v, "
        "10 + (src + dst) % 7 AS w10 FROM ce)",
        "cm0 AS MATERIALIZED (SELECT doc_id AS v, doc_id AS c "
        "FROM documents)",
    ]
    for r in range(rounds):
        ctes.append(
            f"ce{r} AS MATERIALIZED (SELECT a.c AS cu, b.c AS cv, "
            f"e.u, e.v, e.w10 FROM e JOIN cm{r} a ON a.v = e.u "
            f"JOIN cm{r} b ON b.v = e.v WHERE a.c <> b.c)")
        ctes.append(
            f"cand{r} AS MATERIALIZED (SELECT cu AS c, cv AS o, u, v, "
            f"w10 FROM ce{r} UNION ALL "
            f"SELECT cv AS c, cu AS o, u, v, w10 FROM ce{r})")
        ctes.append(
            f"sel{r} AS MATERIALIZED (SELECT c, o, u, v, w10 FROM "
            f"(SELECT c, o, u, v, w10, row_number() OVER "
            f"(PARTITION BY c ORDER BY w10, u, v) AS rn FROM cand{r}) "
            f"WHERE rn = 1)")
        ctes.append(
            f"par{r}_0 AS MATERIALIZED (SELECT s.c, CASE WHEN "
            f"p.o = s.c AND s.c < s.o THEN s.c ELSE s.o END AS p "
            f"FROM sel{r} s JOIN sel{r} p ON p.c = s.o)")
        for k in range(1, jumps + 1):
            ctes.append(
                f"par{r}_{k} AS MATERIALIZED (SELECT a.c, "
                f"coalesce(b.p, a.p) AS p FROM par{r}_{k - 1} a "
                f"LEFT JOIN par{r}_{k - 1} b ON b.c = a.p)")
        ctes.append(
            f"cm{r + 1} AS MATERIALIZED (SELECT m.v, "
            f"coalesce(pj.p, m.c) AS c FROM cm{r} m "
            f"LEFT JOIN par{r}_{jumps} pj ON pj.c = m.c)")
        ctes.append(
            f"f{r} AS MATERIALIZED (SELECT DISTINCT u, v, w10 "
            f"FROM sel{r})")
    union = " UNION ALL ".join(
        f"SELECT u, v, w10 FROM f{r}" for r in range(rounds))
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT u AS src, v AS dst, "
            "round(w10 / 10.0, 6) AS weight FROM (" + union + ")")


def _matching_sql(rounds: int) -> str:
    """Unrolled locally-dominant matching twin of q_doc_matching: the
    64-bit avalanche priority in UBIGINT/HUGEINT (same mix as the
    SimHash oracle), then per round live-filter -> per-vertex argmin ->
    HAVING count(*)=2 dominance -> matched-set growth.  Post-fixpoint
    rounds are no-ops."""
    ctes = [
        f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
        f"ep0 AS (SELECT src AS u, dst AS v, ((src::HUGEINT * "
        f"4294967296 + dst) % {_W64})::UBIGINT AS h0 FROM ce)",
        "ep1 AS (SELECT u, v, xor(h0, h0 >> 33) AS h1 FROM ep0)",
        f"ep2 AS (SELECT u, v, "
        f"{_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2 "
        f"FROM ep1)",
        "ep3 AS (SELECT u, v, xor(h2, h2 >> 29) AS h3 FROM ep2)",
        f"ep4 AS (SELECT u, v, "
        f"{_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4 "
        f"FROM ep3)",
        "epri AS MATERIALIZED (SELECT u, v, xor(h4, h4 >> 32) AS pri "
        "FROM ep4)",
        "m0 AS (SELECT CAST(NULL AS BIGINT) AS mv WHERE 1 = 0)",
    ]
    for r in range(rounds):
        ctes.append(
            f"live{r} AS MATERIALIZED (SELECT p.u, p.v, p.pri "
            f"FROM epri p LEFT JOIN m{r} a ON a.mv = p.u "
            f"LEFT JOIN m{r} b ON b.mv = p.v "
            f"WHERE a.mv IS NULL AND b.mv IS NULL)")
        ctes.append(
            f"w{r} AS (SELECT u, v FROM (SELECT u, v, row_number() "
            f"OVER (PARTITION BY vert ORDER BY pri, u, v) AS rn FROM "
            f"(SELECT u AS vert, pri, u, v FROM live{r} UNION ALL "
            f"SELECT v AS vert, pri, u, v FROM live{r})) WHERE rn = 1)")
        ctes.append(
            f"dom{r} AS MATERIALIZED (SELECT u, v FROM w{r} "
            f"GROUP BY u, v HAVING count(*) = 2)")
        ctes.append(
            f"m{r + 1} AS MATERIALIZED (SELECT mv FROM m{r} "
            f"UNION SELECT u AS mv FROM dom{r} "
            f"UNION SELECT v AS mv FROM dom{r})")
    union = " UNION ALL ".join(
        f"SELECT u, v FROM dom{r}" for r in range(rounds))
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT u AS src, v AS dst FROM (" + union + ")")


def _feature_cells_ctes(dims: int) -> str:
    """Shared CTE body (text.feature_hash_vectors twin): the same FNV
    fold + splitmix avalanche per distinct token (HUGEINT, exact), sign
    from bit 32, dim = h % dims, per-(doc, dim) integer sums in
    `cells` plus per-doc word counts in `dw`."""
    fold = (f"list_reduce(list_transform(range(1, length(w) + 1), "
            f"j -> unicode(substr(w, j::INT, 1))::HUGEINT), "
            f"(acc, c) -> (acc * {_FNV} + c) % {_W64})")
    return f"""
        words AS MATERIALIZED (
          SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                   '[ \t\n]+')) AS w FROM documents)
          WHERE length(w) > 0),
        dw AS MATERIALIZED (
          SELECT doc_id, w, count(*)::BIGINT AS n
          FROM words GROUP BY doc_id, w),
        uw AS (SELECT DISTINCT w FROM dw),
        a0 AS (SELECT w, ({fold})::UBIGINT AS h0 FROM uw),
        a1 AS (SELECT w, xor(h0, h0 >> 33) AS h1 FROM a0),
        a2 AS (SELECT w,
               {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2
               FROM a1),
        a3 AS (SELECT w, xor(h2, h2 >> 29) AS h3 FROM a2),
        a4 AS (SELECT w,
               {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4
               FROM a3),
        wh AS MATERIALIZED (
          SELECT w, xor(h4, h4 >> 32) AS h FROM a4),
        cells AS (
          SELECT dw.doc_id, (h % {dims})::BIGINT AS dim,
                 sum(dw.n * (1 - 2 * ((h >> 32) & 1)::BIGINT))::BIGINT
                     AS val
          FROM dw JOIN wh USING (w) GROUP BY dw.doc_id, dim)"""


def _feature_hash_sql(dims: int) -> str:
    """Twin of text.feature_hash_vectors (sparse long form, zeros
    dropped)."""
    return f"""
        WITH {_feature_cells_ctes(dims)}
        SELECT doc_id, dim, val FROM cells WHERE val <> 0
    """


def _classifier_sql(dims: int) -> str:
    """Twin of text.classifier_scores: the feature-hash cells at
    `dims` dotted with the deterministic weight vector
    w[j] = mix64((j+1)*PHI mod 2^64)/2^64 - 0.5, divided by the doc's
    word count, sigmoid, keep = score >= 0; round-6 floats (sum order
    differs ~1e-16 between BLAS and DuckDB — the repo-wide float rule)."""
    phi = 0x9E3779B97F4A7C15
    return f"""
        WITH {_feature_cells_ctes(dims)},
        wj0 AS (SELECT j,
                ({_mulmod64_sql('(j + 1)', phi)})::UBIGINT AS z
                FROM range({dims}) t(j)),
        wj1 AS (SELECT j, xor(z, z >> 33) AS z FROM wj0),
        wj2 AS (SELECT j,
                {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z
                FROM wj1),
        wj3 AS (SELECT j, xor(z, z >> 29) AS z FROM wj2),
        wj4 AS (SELECT j,
                {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z
                FROM wj3),
        wv AS MATERIALIZED (
          SELECT j::BIGINT AS dim,
                 xor(z, z >> 32)::DOUBLE / 18446744073709551616.0 - 0.5
                   AS w
          FROM wj4),
        nw AS (SELECT doc_id, sum(n)::BIGINT AS n_words
               FROM dw GROUP BY doc_id),
        raw AS (SELECT cells.doc_id, sum(val * wv.w) AS s
                FROM cells JOIN wv USING (dim) GROUP BY cells.doc_id),
        sc AS (SELECT d.doc_id,
                      coalesce(raw.s, 0.0)
                        / greatest(coalesce(nw.n_words, 0), 1) AS s
               FROM documents d
               LEFT JOIN raw USING (doc_id)
               LEFT JOIN nw USING (doc_id))
        SELECT doc_id, round(s, 6) AS score,
               round(1.0 / (1.0 + exp(-s)), 6) AS prob,
               (CASE WHEN s >= 0 THEN 1 ELSE 0 END)::BIGINT AS keep
        FROM sc
    """


def _partition_cut_sql(parts: int) -> str:
    """Twin of q_doc_partition_cut: range bucket v*P//n, hash bucket =
    the repo's splitmix64 avalanche in HUGEINT mod P."""
    return f"""
        WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
        nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        vs AS (SELECT DISTINCT v FROM
               (SELECT src AS v FROM e UNION SELECT dst AS v FROM e)),
        a0 AS (SELECT v, v::UBIGINT AS h0 FROM vs),
        a1 AS (SELECT v, xor(h0, h0 >> 33) AS h1 FROM a0),
        a2 AS (SELECT v,
               {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2
               FROM a1),
        a3 AS (SELECT v, xor(h2, h2 >> 29) AS h3 FROM a2),
        a4 AS (SELECT v,
               {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4
               FROM a3),
        hm AS (SELECT v, (xor(h4, h4 >> 32) % {parts})::BIGINT AS pm
               FROM a4)
        SELECT count(*)::BIGINT AS n_edges,
               sum(CASE WHEN (e.src * {parts}) // nn.n
                        <> (e.dst * {parts}) // nn.n
                   THEN 1 ELSE 0 END)::BIGINT AS cut_range,
               sum(CASE WHEN hs.pm <> hd.pm THEN 1 ELSE 0 END)::BIGINT
                   AS cut_hash
        FROM e CROSS JOIN nn
        JOIN hm hs ON hs.v = e.src JOIN hm hd ON hd.v = e.dst
    """


def _cm_sql(d: int, w: int, salts, gold: int, top_k: int) -> str:
    """Count-Min oracle twin of q_text_cm: the full-word FNV fold +
    splitmix avalanche per DISTINCT token (HUGEINT, exact), the
    register table as d UNION ALL branches with literal row salts,
    and min-over-rows point estimates for the true top-k tokens."""
    fold = (f"list_reduce(list_transform(range(1, length(w) + 1), "
            f"j -> unicode(substr(w, j::INT, 1))::HUGEINT), "
            f"(acc, c) -> (acc * {_FNV} + c) % {_W64})")
    reg_branches = " UNION ALL ".join(
        f"SELECT {j} AS j, "
        f"({_mulmod64_sql(f'xor(h, {salts[j]}::UBIGINT)', gold)} "
        f"% {w})::BIGINT AS col, n FROM occ"
        for j in range(d))
    est_branches = " UNION ALL ".join(
        f"SELECT token, {j} AS j, "
        f"({_mulmod64_sql(f'xor(h, {salts[j]}::UBIGINT)', gold)} "
        f"% {w})::BIGINT AS col FROM toph"
        for j in range(d))
    return f"""
        WITH words AS MATERIALIZED (
          SELECT w FROM (
            SELECT unnest(string_split_regex(lower(text),
                   '[ \t\n]+')) AS w FROM documents)
          WHERE length(w) > 0),
        dw AS (SELECT w, count(*)::BIGINT AS n FROM words GROUP BY w),
        a0 AS (SELECT w, n, ({fold})::UBIGINT AS h0 FROM dw),
        a1 AS (SELECT w, n, xor(h0, h0 >> 33) AS h1 FROM a0),
        a2 AS (SELECT w, n,
               {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2
               FROM a1),
        a3 AS (SELECT w, n, xor(h2, h2 >> 29) AS h3 FROM a2),
        a4 AS (SELECT w, n,
               {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4
               FROM a3),
        occ AS MATERIALIZED (
          SELECT w, n, xor(h4, h4 >> 32) AS h FROM a4),
        reg AS MATERIALIZED (
          SELECT j, col, sum(n)::BIGINT AS c
          FROM ({reg_branches}) GROUP BY j, col),
        top AS MATERIALIZED (
          SELECT w AS token, n AS true_count FROM occ
          ORDER BY n DESC, w LIMIT {top_k}),
        toph AS (SELECT token, true_count, h FROM top
                 JOIN occ ON occ.w = top.token),
        cols AS ({est_branches})
        SELECT t.token, t.true_count, min(reg.c) AS cm_estimate
        FROM top t JOIN cols ON cols.token = t.token
        JOIN reg ON reg.j = cols.j AND reg.col = cols.col
        GROUP BY t.token, t.true_count
    """


_PARAGRAPH_SQL = f"""
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '') AS l
          FROM documents),
        wn AS (SELECT doc_id, l, len(l) AS n FROM wl WHERE len(l) > 0),
        ks AS (SELECT doc_id, l, n,
                      unnest(range(0, 1 + CASE WHEN n > {_PAR_WORDS}
                             THEN CAST(ceil((n - {_PAR_WORDS}) /
                                  {_PAR_WORDS}.0) AS BIGINT)
                             ELSE 0 END)) AS k
               FROM wn),
        segs AS (SELECT doc_id, k AS chunk_id,
                        array_to_string(l[k*{_PAR_WORDS}+1 :
                                          k*{_PAR_WORDS}+{_PAR_WORDS}],
                                        ' ') AS chunk
                 FROM ks),
        kept AS (SELECT doc_id, chunk_id, chunk FROM (
                   SELECT doc_id, chunk_id, chunk, row_number() OVER
                     (PARTITION BY chunk ORDER BY doc_id, chunk_id)
                     AS rn FROM segs) WHERE rn = 1)
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text,
               count(*)::BIGINT AS n_kept
        FROM kept GROUP BY doc_id
    """


ORACLE_SQL: dict[str, str] = {
    "doc_edges": DOC_EDGES_SQL,
    "doc_degree": (f"WITH sym AS ({DOC_SYM_SQL}) SELECT src AS v, "
                   "count(*) AS degree FROM sym GROUP BY src"),
    "doc_top_degree": (f"WITH sym AS ({DOC_SYM_SQL}), d AS (SELECT src AS v, "
                       "count(*) AS degree FROM sym GROUP BY src) "
                       "SELECT v, degree FROM d "
                       "ORDER BY degree DESC, v ASC LIMIT 10"),
    # degree assortativity: exact int64 moment sums, identical float
    # formula both sides (no summation-order exposure)
    "doc_assortativity": f"""
        WITH sym AS MATERIALIZED ({DOC_SYM_SQL}),
        d AS MATERIALIZED (
          SELECT src AS v, count(*) AS dg FROM sym GROUP BY src),
        s AS (
          SELECT count(*)::BIGINT AS m,
                 sum(dx.dg)::BIGINT AS sx, sum(dy.dg)::BIGINT AS sy,
                 sum(dx.dg * dy.dg)::BIGINT AS sxy,
                 sum(dx.dg * dx.dg)::BIGINT AS sxx,
                 sum(dy.dg * dy.dg)::BIGINT AS syy
          FROM sym
          JOIN d dx ON dx.v = sym.src
          JOIN d dy ON dy.v = sym.dst)
        SELECT round(
          (sxy / m::DOUBLE - (sx / m::DOUBLE) * (sy / m::DOUBLE)) /
          sqrt((sxx / m::DOUBLE - (sx / m::DOUBLE) * (sx / m::DOUBLE)) *
               (syy / m::DOUBLE - (sy / m::DOUBLE) * (sy / m::DOUBLE))),
          6) AS assortativity
        FROM s
    """,
    "doc_group_sizes": ("SELECT lang || ':' || source AS k, "
                        "count(*) AS n_docs FROM documents GROUP BY 1"),
    "doc_edge_count": (f"WITH e AS ({DOC_EDGES_SQL}) "
                       "SELECT count(*) AS n_edges FROM e"),
    "doc_triangles": TRIANGLES_SQL,
    "doc_msf": _msf_sql(_MSF.MSF_ROUNDS, _MSF.MSF_JUMPS),
    "doc_matching": _matching_sql(_MATCH.MATCH_ROUNDS),
    "text_feature_hash": _feature_hash_sql(16),
    "text_cm": _cm_sql(_SK.CM_D, _SK.CM_W, _SK.CM_SALTS, _SK.CM_GOLD,
                       CM_TOP_K),
    "doc_4cliques": FOURCLIQUES_SQL,
    "doc_clustering": CLUSTERING_SQL,
    "doc_neighbor_sample": _neighbor_sample_sql(),
    # SAGE mean aggregator: inner join on dst keeps only feature-having
    # neighbors; float32 -> DOUBLE on both sides, round-6 means
    "doc_sage": f"""
        WITH sym AS ({DOC_SYM_SQL}),
        ex AS MATERIALIZED (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 unnest(embedding)::DOUBLE AS x
          FROM embeddings)
        SELECT s.src AS v, e.i, round(avg(e.x), 6) AS mean_x
        FROM sym s JOIN ex e ON e.vec_id = s.dst
        GROUP BY s.src, e.i
    """,
    "doc_truss": _ktruss_sql(TRUSS_K, TRUSS_ROUNDS),
    "doc_pagerank": _pagerank_sql(PR_ITERS, 6),
    "doc_pagerank_warm": _pagerank_warm_sql(PR_ITERS, WARM_ITERS, 6),
    "doc_wpagerank": _wpagerank_sql(PR_ITERS, 6),
    "doc_pagerank_iter1": _pagerank_sql(1, 9),
    "doc_cc": _cc_sql(CC_ROUNDS),
    # component stats: the full unrolled CC oracle nested as a CTE
    # (same convention as corpus_clean nesting the minhash oracle)
    "doc_component_stats": f"""
        WITH cc AS MATERIALIZED ({_cc_sql(CC_ROUNDS)}),
        ecnt AS (SELECT cc.label, count(*)::BIGINT AS n_edges
                 FROM ({DOC_EDGES_SQL}) e JOIN cc ON cc.v = e.src
                 GROUP BY cc.label),
        vcnt AS (SELECT label, count(*)::BIGINT AS n_vertices
                 FROM cc GROUP BY label)
        SELECT v.label, v.n_vertices, coalesce(e.n_edges, 0) AS n_edges
        FROM vcnt v LEFT JOIN ecnt e USING (label)
        ORDER BY v.n_vertices DESC, v.label LIMIT {COMP_TOP_K}
    """,
    "doc_labelprop": _lp_sql(LP_ROUNDS),
    # Louvain local move: integer score 2m - k_v*k_u, window argmax with
    # (score DESC, u ASC) — the exact twin of algos.louvain's lexsort
    "doc_louvain": _louvain_sql(),
    # modularity: all-integer A/B/m aggregates (unrolled-LP CTE nested),
    # ONE float expression at the end — identical on both sides
    "doc_modularity": f"""
        WITH lp AS MATERIALIZED ({_lp_sql(LP_ROUNDS)}),
        e AS MATERIALIZED ({DOC_EDGES_SQL}),
        mm AS (SELECT count(*)::BIGINT AS m FROM e),
        aa AS (SELECT count(*)::BIGINT AS a FROM e
               JOIN lp ls ON ls.v = e.src
               JOIN lp ld ON ld.v = e.dst
               WHERE ls.label = ld.label),
        deg AS (SELECT src AS v, count(*)::BIGINT AS d
                FROM ({DOC_SYM_SQL}) GROUP BY src),
        dc AS (SELECT lp.label, sum(deg.d)::BIGINT AS dsum
               FROM deg JOIN lp ON lp.v = deg.v GROUP BY lp.label),
        bb AS (SELECT sum(dsum * dsum)::BIGINT AS b FROM dc)
        SELECT mm.m, aa.a AS intra, bb.b AS deg_sq_sum,
               round(aa.a / mm.m - bb.b / (4.0 * mm.m * mm.m), 9)
                   AS modularity
        FROM mm, aa, bb
    """,
    "doc_bfs": _bfs_sql(BFS_ROUNDS),
    "doc_bc": _bc_sql(BFS_ROUNDS, 6),
    "doc_bc_sampled": _bc_sampled_sql(BC_SAMPLE_ROOTS, BFS_ROUNDS, 6),
    "doc_sssp": _sssp_sql(SSSP_ROUNDS, 9),
    "doc_widest": _widest_sql(SSSP_ROUNDS, 9),
    "doc_pagerank_deltas": _pagerank_deltas_sql(PR_ITERS, 9),
    "doc_hits": _hits_sql(HITS_ITERS, 6),
    "doc_eigen": _eigen_sql(EIGEN_ITERS, 6),
    "doc_wl": _wl_sql(WL_ROUNDS),
    "doc_ppr": _ppr_sql(PPR_ITERS, 9, PPR_SOURCES),
    "doc_trustrank": (
        f"WITH pr AS ({_ppr_sql(PPR_ITERS, 12, TRUST_SOURCES)}) "
        f"SELECT v, round(rank / {len(TRUST_SOURCES)}.0, 9) AS trust "
        f"FROM pr"),
    "doc_subgraph_pagerank": _pagerank_sql_over(
        f"""WITH ce AS ({DOC_EDGES_SQL}),
        kv AS (SELECT doc_id FROM documents
               WHERE lang = '{SUBGRAPH_LANG}')
        SELECT src, dst FROM ce
        JOIN kv a ON a.doc_id = ce.src
        JOIN kv b ON b.doc_id = ce.dst""",
        f"SELECT doc_id AS v FROM documents "
        f"WHERE lang = '{SUBGRAPH_LANG}'",
        PR_ITERS, 6),
    "doc_kcore": _kcore_sql(KCORE_K, KCORE_ROUNDS),
    "doc_onion": _onion_sql(KCORE_K, KCORE_ROUNDS),
    "doc_mis": _mis_sql(MIS_ROUNDS),
    "doc_coloring": _coloring_sql(COLORING_ROUNDS, COLORING_MAX_COLORS),
    "doc_harmonic": _harmonic_sql(HARMONIC_SEEDS, BFS_ROUNDS, 6),
    "doc_closeness": _closeness_sql(CLOSENESS_SEEDS, BFS_ROUNDS, 6),
    "doc_katz": _katz_sql(KATZ_ITERS, KATZ_ALPHA, 6),
    "doc_powerlaw": f"""
        WITH sym AS MATERIALIZED ({DOC_SYM_SQL}),
        deg AS (SELECT src AS v, count(*) AS d FROM sym GROUP BY src),
        hist AS (SELECT d AS k, count(*) AS n FROM deg GROUP BY d),
        pts AS (SELECT ln(k::DOUBLE) AS x, ln(n::DOUBLE) AS y FROM hist),
        s AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy FROM pts)
        SELECT CAST(m AS BIGINT) AS n_points,
               round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
                   AS slope,
               round((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx)
                      * sx) / m, 6) AS intercept
        FROM s
    """,
    "doc_reciprocity": f"""
        WITH de AS MATERIALIZED ({SCC_EDGES_SQL}),
        rc AS (SELECT count(*) AS nr FROM de a
               JOIN de b ON b.src = a.dst AND b.dst = a.src)
        SELECT (SELECT count(*) FROM de) AS n_edges,
               rc.nr AS n_reciprocal,
               round(rc.nr / (SELECT count(*) FROM de)::DOUBLE, 6)
                   AS reciprocity
        FROM rc
    """,
    "doc_scc": _scc_sql(),
    "doc_distance_dist": _distance_dist_sql(HARMONIC_SEEDS,
                                            BFS_ROUNDS),
    "doc_adjacency": f"""
        WITH sym AS MATERIALIZED ({DOC_SYM_SQL})
        SELECT src AS v, count(*)::BIGINT AS degree,
               string_agg(dst::VARCHAR, ',' ORDER BY dst) AS neighbors
        FROM sym GROUP BY src ORDER BY v
    """,
    "doc_triads": f"""
        WITH e AS MATERIALIZED (
            SELECT src, dst FROM ({SCC_EDGES_SQL}) aug),
        cyc AS (SELECT count(*) // 3 AS n_cyclic
                FROM e ab JOIN e bc ON bc.src = ab.dst
                          JOIN e ca ON ca.src = bc.dst
                                   AND ca.dst = ab.src),
        tr AS (SELECT count(*) AS n_transitive
               FROM e ab JOIN e bc ON bc.src = ab.dst
                         JOIN e ac ON ac.src = ab.src
                                  AND ac.dst = bc.dst)
        SELECT CAST(n_cyclic AS BIGINT) AS n_cyclic,
               CAST(n_transitive AS BIGINT) AS n_transitive
        FROM cyc, tr
    """,
    "doc_condensation": f"""
        WITH RECURSIVE e AS MATERIALIZED (
            SELECT src, dst FROM ({SCC_EDGES_SQL}) aug),
        reach(a, b) AS (
            SELECT src AS a, dst AS b FROM e
            UNION
            SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b),
        mn AS (SELECT r1.a AS v, min(r1.b) AS mn
               FROM reach r1 JOIN reach r2
                 ON r1.a = r2.b AND r1.b = r2.a
               GROUP BY r1.a),
        lab AS (SELECT d.doc_id AS v,
                       least(d.doc_id, coalesce(mn.mn, d.doc_id)) AS scc
                FROM documents d LEFT JOIN mn ON mn.v = d.doc_id)
        SELECT DISTINCT ls.scc AS from_scc, ld.scc AS to_scc
        FROM e JOIN lab ls ON ls.v = e.src
               JOIN lab ld ON ld.v = e.dst
        WHERE ls.scc <> ld.scc
        ORDER BY from_scc, to_scc
    """,
    "doc_coreness": _coreness_sql(CORENESS_ROUNDS),
    "doc_diameter": _diameter_sql(BFS_ROUNDS),
    "doc_walks": _walks_sql(WALK_SEEDS, WALK_STEPS),
    "doc_walk_pmi": _walk_pmi_sql(PMI_SEEDS, WALK_STEPS, PMI_WINDOW),
    "doc_negatives": _negative_samples_sql(k=5, probes=36),
    "doc_node2vec": _node2vec_sql(WALK_SEEDS, N2V_STEPS),
    "doc_adamic_adar": ADAMIC_ADAR_SQL,
    "doc_linkpred": LINKPRED_SQL,
    "dedup_clusters": _dupcc_sql(DUPCC_ROUNDS),
    "sample_stratified": _stratified_sql(),
    "sketch_distinct": _SK.kmv_sql(),
    "sketch_intersection": _SK.kmv_intersection_sql("purchase", "view"),
    "sketch_hll_daily": _SK.hll_daily_sql(),
    "doc_partition_cut": _partition_cut_sql(CUT_PARTS),
    "sketch_cms": _SK.cms_sql(),
    "text_quality": _quality_sql(),
    "corpus_quality_cut": f"""
        WITH qq AS MATERIALIZED (
          SELECT doc_id, quality FROM ({_quality_sql()})),
        p AS (SELECT quantile_disc(quality, 0.10) AS p10 FROM qq)
        SELECT qq.doc_id, qq.quality
        FROM qq CROSS JOIN p WHERE qq.quality >= p.p10
    """,
    "embed_centroids": EMBED_CENTROIDS_SQL,
    "semantic_dedup": _semdedup_sql(SEMDEDUP_ROUNDS),
    "tpch_order_rank": _REL.TOP_ORDERS_PER_CUSTOMER_SQL,
    "tpch_large_orders": _REL.LARGE_ORDERS_SQL,
    "tpch_priority_count": _REL.ORDER_PRIORITY_SQL,
    "tpch_returned_revenue": _REL.RETURNED_REVENUE_SQL,
    "tpch_promo": _REL.PROMO_SHARE_SQL,
    "tpch_volume": _REL.VOLUME_SHIPPING_SQL,
    "tpch_market_share": _REL.MARKET_SHARE_SQL,
    "tpch_discount": _REL.DISCOUNTED_REVENUE_SQL,
    "tpch_custdist": _REL.ORDER_COUNT_DIST_SQL,
    "tpch_waiting": _REL.WAITING_SUPPLIERS_SQL,
    "tpch_top_supplier": _REL.TOP_SUPPLIER_SQL,
    "tpch_small_qty": _REL.SMALL_QTY_REVENUE_SQL,
    "dedup_paragraph": _PARAGRAPH_SQL,
    "table_diff": f"""
        WITH clean AS ({_PARAGRAPH_SQL})
        SELECT d.doc_id,
               CASE WHEN c.doc_id IS NULL THEN 'removed'
                    WHEN c.clean_text = d.text THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM documents d LEFT JOIN clean c USING (doc_id)
    """,

    "dedup_report": f"""
        WITH n AS (SELECT count(*)::BIGINT AS n_docs,
                          count(DISTINCT sha256(text))::BIGINT
                              AS n_distinct
                   FROM documents),
        mp AS (SELECT count(*)::BIGINT AS n_minhash_pairs FROM (
            {_minhash_sql(num_perm=64, bands=16, k=5, threshold=0.5,
                          cap=64)}))
        SELECT n.n_docs, n.n_distinct,
               n.n_docs - n.n_distinct AS n_exact_dupes,
               mp.n_minhash_pairs,
               round((n.n_docs - n.n_distinct) / (1.0 * n.n_docs), 6)
                   AS exact_dup_ratio
        FROM n, mp
    """,
    # int8 scalar quantization: identical float expression shape ->
    # bit-equal codes; rmse rounded 6
    "embed_quantize": """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        u AS (SELECT vec_id, generate_subscripts(v, 1)::BIGINT AS i,
                     unnest(v) AS x FROM e),
        mm AS (SELECT i, min(x) AS mn,
                      CASE WHEN max(x) = min(x) THEN 1.0
                           ELSE max(x) - min(x) END AS rng
               FROM u GROUP BY i),
        c AS (SELECT u.vec_id, u.x, mm.mn, mm.rng,
                     floor((u.x - mm.mn) / mm.rng * 255 + 0.5) AS code
              FROM u JOIN mm USING (i))
        SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
               round(sqrt(avg((x - (mn + code * rng / 255)) *
                              (x - (mn + code * rng / 255)))), 6)
                   AS rmse
        FROM c GROUP BY vec_id
    """,
    "tpch_priority_buckets": _REL.SHIPMODE_PRIORITY_SQL,
    "tpch_cust_no_orders": f"""
        SELECT c_custkey, c_name, round(c_acctbal, 6) AS c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > {NO_ORDERS_MIN_PRICE!r})
    """,
    "tpch_parts_shipped": """
        SELECT p_partkey, round(p_retailprice, 6) AS p_retailprice
        FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey)
    """,
    # bloom prefilter has no false negatives and survivors are exactly
    # verified, so the oracle is a plain EXISTS (no bloom bits in SQL)
    "tpch_bloom_semijoin": """
        SELECT l_returnflag, count(*)::BIGINT AS n_items,
               round(sum(l_quantity), 6) AS sum_qty
        FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
    """,
    "pack_sequences": f"""
        WITH t AS (SELECT doc_id,
            length(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> ''))::BIGINT AS n_tokens
            FROM documents),
        s AS (SELECT doc_id, n_tokens,
            coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0)::BIGINT AS start
            FROM t)
        SELECT doc_id, n_tokens, start,
               start // {PACK_SEQ_LEN} AS seq_first,
               greatest(start, start + n_tokens - 1) // {PACK_SEQ_LEN}
                   AS seq_last,
               greatest(start, start + n_tokens - 1) // {PACK_SEQ_LEN}
                   - start // {PACK_SEQ_LEN} + 1 AS n_pieces
        FROM s
    """,
    "sketch_hll": _SK.hll_sql(),
    "sketch_bloom": _SK.bloom_sql(BLOOM_PROBES_ABSENT),
    "events_anomaly_days": """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*)::BIGINT AS n FROM events
                   GROUP BY day),
        st AS (SELECT count(*)::DOUBLE AS k, sum(n)::DOUBLE AS s,
                      sum(n * n)::DOUBLE AS ss FROM d)
        SELECT day, n, round((n - s / k) /
               sqrt((ss - s * s / k) / (k - 1)), 6) AS z
        FROM d, st ORDER BY day
    """,
    # sink round trip: read-back must equal the source table
    "sink_roundtrip": ("SELECT doc_id, lang, source, n_chars, "
                       "text FROM documents"),
    "sink_csv_roundtrip": ("SELECT doc_id, lang, source, n_chars, "
                           "text FROM documents"),
    "sink_json_roundtrip": ("SELECT doc_id, lang, source, n_chars, "
                            "text FROM documents"),
    "sink_jsonl_gz_roundtrip": ("SELECT doc_id, lang, source, n_chars, "
                                "text FROM documents"),
    # warc lane: URI and Content-Length (UTF-8 octets) recomputed from
    # the source docs the blobs were packed from
    "warc_extract": """
        SELECT doc_id,
               'https://example.com/doc/' || doc_id AS url,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    """,
    # PMI collocations: same \s+ and bigram conventions as
    # text_top_bigrams; identical float expression shape
    # ln((n/B)/((ca/T)*(cb/T))); ordered by ROUNDED pmi on both sides
    "text_pmi": f"""
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '') AS l
          FROM documents),
        w AS (SELECT doc_id, unnest(l) AS w,
                     generate_subscripts(l, 1) AS i FROM wl),
        big AS (
          SELECT w || ' ' || w2 AS bigram FROM (
            SELECT doc_id, w,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM w) WHERE w2 IS NOT NULL),
        bc AS (SELECT bigram, count(*)::BIGINT AS n
               FROM big GROUP BY bigram),
        cand AS (SELECT bigram, n FROM bc WHERE n >= {PMI_MIN_COUNT}
                 ORDER BY n DESC, bigram LIMIT {PMI_CAND}),
        uc AS (SELECT w, count(*)::DOUBLE AS cn FROM w GROUP BY w),
        tot AS (SELECT count(*)::DOUBLE AS t FROM w),
        btot AS (SELECT count(*)::DOUBLE AS bt FROM big),
        p AS (
          SELECT cand.bigram, cand.n,
                 round(ln((cand.n / btot.bt) /
                          ((ua.cn / tot.t) * (ub.cn / tot.t))), 6)
                     AS pmi
          FROM cand, tot, btot
          JOIN uc ua ON ua.w = split_part(cand.bigram, ' ', 1)
          JOIN uc ub ON ub.w = split_part(cand.bigram, ' ', 2))
        SELECT bigram, n, pmi FROM p
        ORDER BY pmi DESC, bigram LIMIT {PMI_K}
    """,
    # first-order Markov transitions: (ts, event_id)-ordered per-user
    # lag, row-normalized; all-integer counts, p rounded 6
    "events_markov": """
        WITH s AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS nxt
          FROM events),
        c AS (SELECT event_type AS prev_type, nxt AS event_type,
                     count(*)::BIGINT AS n
              FROM s WHERE nxt IS NOT NULL
              GROUP BY prev_type, nxt)
        SELECT prev_type, event_type, n,
               round(n / (1.0 * sum(n) OVER (PARTITION BY prev_type)),
                     6) AS p
        FROM c ORDER BY prev_type, event_type
    """,
    # embedding outliers: normalized vectors vs ROUNDED (6dp) per-label
    # centroids — both engines rank against bit-identical prototypes
    "embed_outliers": f"""
        WITH e AS (
          SELECT vec_id, label::BIGINT AS label,
                 CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        n AS (SELECT vec_id, label, v,
                     list_sum(list_transform(v, x -> x*x)) AS sq
              FROM e),
        u AS (SELECT vec_id, label,
                     CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
                     unnest(v) /
                     (CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END) AS x
              FROM n),
        cent AS (SELECT label, i, round(sum(x) / count(*), 6) AS c
                 FROM u GROUP BY label, i),
        d AS (SELECT u.vec_id, u.label,
                     sqrt(sum((u.x - cent.c) * (u.x - cent.c))) AS dist
              FROM u JOIN cent ON cent.label = u.label AND cent.i = u.i
              GROUP BY u.vec_id, u.label)
        SELECT vec_id, label, round(dist, 6) AS dist FROM d
        ORDER BY dist DESC, vec_id LIMIT {_ANN.OUTLIER_K}
    """,
    # apply-the-mixture resample: rates from the ROUNDED weights and
    # exact integer token counts -> bit-identical doubles -> identical
    # integer thresholds; same sha rule as sample_stratified
    "mix_resample": f"""
        WITH t AS (
          SELECT source, sum(length(list_filter(
                 regexp_split_to_array(text, '\\s+'),
                 x -> x <> '')))::BIGINT AS n_tokens
          FROM documents GROUP BY source),
        w AS (SELECT source, n_tokens,
                     round(pow(n_tokens, {_MIX_ALPHA}) /
                           sum(pow(n_tokens, {_MIX_ALPHA})) OVER (), 6)
                         AS weight
              FROM t),
        r AS (SELECT source,
                     CAST(floor(least(1.0,
                          weight * {_SAMP.RESAMPLE_FRAC} *
                          (SELECT sum(n_tokens)::DOUBLE FROM w)
                          / n_tokens) * 4294967296.0) AS UBIGINT)
                         AS thr
              FROM w)
        SELECT doc_id, source FROM documents JOIN r USING (source)
        WHERE ('0x' || substr(sha256('mix:' || doc_id::VARCHAR), 1, 8))
              ::UBIGINT < thr
    """,
    # Efraimidis-Spirakis weighted sample: identical sha-derived u and
    # pow; selection at full precision on both sides, pri rounded 6
    "sample_weighted": f"""
        WITH p AS (
          SELECT doc_id, greatest(n_chars, 1)::BIGINT AS w,
                 pow((('0x' || substr(sha256('ws:' || doc_id), 1, 13))
                      ::UBIGINT + 1) / 4503599627370496.0,
                     1.0 / greatest(n_chars, 1)) AS pri
          FROM documents)
        SELECT doc_id, w, round(pri, 6) AS pri FROM p
        ORDER BY pri DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
    """,
    # temperature-scaled mixture weights: same \\s+ token convention as
    # text_tokens, same alpha literal, weight rounded 6
    "mix_weights": f"""
        WITH t AS (
          SELECT source, count(*)::BIGINT AS n_docs,
                 sum(length(list_filter(regexp_split_to_array(text,
                     '\\s+'), x -> x <> '')))::BIGINT AS n_tokens
          FROM documents GROUP BY source)
        SELECT source, n_docs, n_tokens,
               round(pow(n_tokens, {_MIX_ALPHA}) /
                     sum(pow(n_tokens, {_MIX_ALPHA})) OVER (), 6)
                   AS weight
        FROM t ORDER BY source
    """,
    "sample_quota": f"""
        WITH p AS (
          SELECT doc_id, lang || ':' || source AS k,
                 sha256(CAST(doc_id AS VARCHAR)) AS pri
          FROM documents
        ), r AS (
          SELECT doc_id, k, row_number() OVER
                 (PARTITION BY k ORDER BY pri, doc_id) AS rn
          FROM p
        )
        SELECT doc_id, k FROM r WHERE rn <= {QUOTA_N}
    """,
    "text_top_tokens_by_lang": f"""
        WITH t AS (
          SELECT lang, unnest(list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '')) AS token
          FROM documents
        ), c AS (SELECT lang, token, count(*) AS n
                 FROM t GROUP BY lang, token),
        r AS (SELECT lang, token, n, row_number() OVER
               (PARTITION BY lang ORDER BY n DESC, token ASC) AS rnk
              FROM c)
        SELECT lang, token, rnk, n FROM r WHERE rnk <= {GROUP_TOKENS_K}
    """,
    "text_top_tokens": f"""
        WITH t AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS token
          FROM documents
        ), c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
        SELECT token, n FROM c ORDER BY n DESC, token ASC
        LIMIT {TOP_TOKENS_K}
    """,
    "text_tokens": ("SELECT doc_id, length(list_filter(regexp_split_to_array("
                    "text, '\\s+'), x -> x <> '')) AS n_tokens "
                    "FROM documents"),
    # the SAME RE2 pattern as text.BPE_TOKEN_RE (both engines use RE2)
    "text_tokens_bpe": (
        "SELECT doc_id, length(regexp_extract_all(text, "
        "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
        "|\\s+')) AS n_bpe_tokens FROM documents"),
    "text_stats": ("SELECT doc_id, length(text) AS n_chars2, "
                   "length(list_filter(regexp_split_to_array(text, '\\s+'), "
                   "x -> x <> '')) AS n_tokens, "
                   "length(regexp_replace(text, '[^.,;:!?]', '', 'g')) "
                   "AS n_punct FROM documents"),
    "text_fingerprint": f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
    "text_redact": _redact_sql(),
    # BPE merge-candidate scan: same \s+ split convention as
    # text_top_tokens; ties broken (n DESC, bigram ASC) on both sides
    "text_top_bigrams": f"""
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '') AS l
          FROM documents),
        w AS (SELECT doc_id, unnest(l) AS w,
                     generate_subscripts(l, 1) AS i FROM wl),
        big AS (
          SELECT w || ' ' || w2 AS bigram FROM (
            SELECT doc_id, w,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM w) WHERE w2 IS NOT NULL),
        c AS (SELECT bigram, count(*)::BIGINT AS n
              FROM big GROUP BY bigram)
        SELECT bigram, n FROM c ORDER BY n DESC, bigram
        LIMIT {TOP_BIGRAMS_K}
    """,
    # BPE get_stats: char pairs inside words, weighted by word count;
    # substr is codepoint-based like the numpy utf-32 buffer; UTF-8
    # byte order == codepoint order so the tie-break sorts agree
    "text_bpe_pairs": f"""
        WITH w AS (
          SELECT unnest(list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '')) AS w
          FROM documents),
        wc AS (SELECT w, count(*)::BIGINT AS n FROM w GROUP BY w),
        p AS (SELECT substr(w, j::INT, 2) AS pair, n
              FROM (SELECT w, n, unnest(range(1, length(w))) AS j
                    FROM wc WHERE length(w) >= 2)),
        c AS (SELECT pair, sum(n)::BIGINT AS n FROM p GROUP BY pair)
        SELECT pair, n FROM c ORDER BY n DESC, pair
        LIMIT {TOP_BPE_PAIRS_K}
    """,
    # chunking: l[a:b] is 1-based end-inclusive; ceil float division
    # matches np.ceil exactly (small integer ratios)
    "text_chunks": f"""
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '') AS l
          FROM documents),
        wn AS (SELECT doc_id, l, len(l) AS n FROM wl WHERE len(l) > 0),
        ks AS (SELECT doc_id, l, n,
                      unnest(range(0, 1 + CASE WHEN n > {CHUNK_WORDS}
                             THEN CAST(ceil((n - {CHUNK_WORDS}) /
                                  {CHUNK_WORDS - CHUNK_OVERLAP}.0)
                                  AS BIGINT)
                             ELSE 0 END)) AS k
               FROM wn)
        SELECT doc_id, k AS chunk_id,
               array_to_string(
                 l[k*{CHUNK_WORDS - CHUNK_OVERLAP}+1 :
                   k*{CHUNK_WORDS - CHUNK_OVERLAP}+{CHUNK_WORDS}],
                 ' ') AS chunk,
               least({CHUNK_WORDS},
                     n - k*{CHUNK_WORDS - CHUNK_OVERLAP})::BIGINT
                   AS n_words
        FROM ks
    """,
    # add-one bigram LM over the corpus itself (lm.perplexity_scores):
    # same double expression (cb+1)/(cu+V) and ln/exp; per-doc float sums
    # associate differently (numpy vs DuckDB order), equal after round-6
    "text_perplexity": """
        WITH wl AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM documents),
        w AS MATERIALIZED (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM wl),
        uni AS MATERIALIZED (SELECT w, count(*) AS cu FROM w GROUP BY w),
        vv AS (SELECT count(*) AS v FROM uni),
        big AS MATERIALIZED (
          SELECT doc_id, w AS w1, w2 FROM (
            SELECT doc_id, w,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM w) WHERE w2 IS NOT NULL),
        bi AS MATERIALIZED (
          SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
        lp AS (
          SELECT b.doc_id,
                 ln((bi.cb + 1.0) / (uni.cu + vv.v)) AS lp
          FROM big b
          JOIN bi ON bi.w1 = b.w1 AND bi.w2 = b.w2
          JOIN uni ON uni.w = b.w1
          CROSS JOIN vv),
        s AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                     sum(lp) / count(*) AS avg
              FROM lp GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               round(coalesce(s.avg, 0.0), 6) AS avg_logprob,
               round(CASE WHEN s.doc_id IS NULL THEN 0.0
                     ELSE exp(-s.avg) END, 6) AS ppl
        FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    """,
    # decontamination: string-keyed gram twin of decontam.contamination
    # (hash-keyed on the Ray side, same 2^-64 note as the word hashes);
    # l[i:i+3] is 1-based END-INCLUSIVE = 4 words (decontam.NGRAM_WORDS)
    "decontaminate": """
        WITH wl AS MATERIALIZED (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM documents),
        gi AS (SELECT doc_id, l,
                      unnest(range(1, greatest(len(l) - 2, 1))) AS i
               FROM wl),
        grams AS MATERIALIZED (
          SELECT DISTINCT doc_id, array_to_string(l[i:i+3], ' ') AS g
          FROM gi),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 53 = 0),
        corp AS (SELECT doc_id, g FROM grams WHERE doc_id % 53 <> 0)
        SELECT c.doc_id, count(*)::BIGINT AS n_hits
        FROM corp c JOIN bench b USING (g) GROUP BY c.doc_id
    """,
    "text_langid": _langid_sql(),
    "text_langid_confusion": f"""
        WITH p AS ({_LANGID_BODY})
        SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
        FROM documents d JOIN p ON p.doc_id = d.doc_id
        GROUP BY d.lang, p.lang_pred ORDER BY d.lang, p.lang_pred
    """,
    # BM25: identical float expression shape per term, summed in term
    # order; filter on full-precision score > 0 on both sides
    "text_bm25": """
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text,
                 '\\s+'), x -> x <> '') AS l
          FROM documents),
        d AS (SELECT doc_id, len(l)::DOUBLE AS dl,
               length(list_filter(l, x -> x = 'table'))::DOUBLE AS tf0,
               length(list_filter(l, x -> x = 'merge'))::DOUBLE AS tf1,
               length(list_filter(l, x -> x = 'window'))::DOUBLE AS tf2
              FROM wl),
        st AS (SELECT count(*)::DOUBLE AS n, sum(dl) AS sumdl,
               sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
               sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
               sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2
               FROM d),
        sc AS (SELECT doc_id,
               ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
             + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
             + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 / (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n))) AS score
               FROM d, st)
        SELECT doc_id, round(score, 6) AS score FROM sc
        WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 15
    """,
    "events_dau": """
        WITH ud AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day FROM events),
        uw AS (SELECT DISTINCT user_id,
                      day - ((day + 3) % 7) AS week FROM ud),
        dau AS (SELECT day, count(*)::BIGINT AS n FROM ud GROUP BY day),
        wau AS (SELECT week, count(*)::BIGINT AS wau FROM uw
                GROUP BY week),
        agg AS (SELECT wau.week, wau.wau,
                       coalesce(sum(dau.n), 0)::DOUBLE / 7.0 AS avg_dau
                FROM wau LEFT JOIN dau
                  ON dau.day BETWEEN wau.week AND wau.week + 6
                GROUP BY wau.week, wau.wau)
        SELECT week AS week_day, wau, round(avg_dau, 6) AS avg_dau,
               round(avg_dau / wau, 6) AS stickiness
        FROM agg ORDER BY week_day
    """,
    "events_ab_test": """
        WITH g AS (SELECT user_id % 2 AS g, value FROM events),
        a AS (SELECT g, count(*)::DOUBLE AS n, sum(value) AS s,
                     sum(value * value) AS ss FROM g GROUP BY g)
        SELECT CAST(a0.n AS BIGINT) AS n_a, CAST(a1.n AS BIGINT) AS n_b,
               round(a0.s / a0.n, 6) AS mean_a,
               round(a1.s / a1.n, 6) AS mean_b,
               round((a1.s / a1.n - a0.s / a0.n) /
                     sqrt(((a1.ss - a1.s * a1.s / a1.n) / (a1.n - 1))
                            / a1.n +
                          ((a0.ss - a0.s * a0.s / a0.n) / (a0.n - 1))
                            / a0.n), 6) AS t_stat
        FROM (SELECT * FROM a WHERE g = 0) a0,
             (SELECT * FROM a WHERE g = 1) a1
    """,
    "events_topk_users": f"""
        WITH c AS (SELECT event_type, user_id, count(*)::BIGINT AS n
                   FROM events GROUP BY event_type, user_id),
        r AS (SELECT event_type, user_id, n, row_number() OVER
                (PARTITION BY event_type ORDER BY n DESC, user_id) AS rnk
              FROM c)
        SELECT event_type, user_id, rnk, n FROM r
        WHERE rnk <= {TOPK_USERS_K}
    """,
    "corpus_clean": _corpus_clean_sql(),
    "corpus_clean_v2": _corpus_clean_v2_sql(),
    "corpus_clean_v3": _corpus_clean_v3_sql(),
    "dedup_exact": (f"SELECT min(doc_id) AS doc_id FROM documents "
                    f"GROUP BY {_FP_SQL}"),
    # incremental two-phase dedup: evens are the persisted index, odds
    # ingest against it (dedup.incremental_dedup)
    "shuffle_shards": _shuffle_shards_sql(),
    "dedup_incremental": f"""
        WITH f AS MATERIALIZED (
          SELECT doc_id, {_FP_SQL} AS fp FROM documents),
        idx AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
        nw AS (SELECT min(doc_id) AS doc_id, fp
               FROM f WHERE doc_id % 2 = 1 GROUP BY fp)
        SELECT doc_id, fp FROM nw
        WHERE fp NOT IN (SELECT fp FROM idx)
    """,
    # embedding is list<float>; cast to DOUBLE[] so DuckDB computes the
    # cosine in float64 like the engine (float32 diverges in the 6th
    # rounded digit -> value-hash mismatch, VERDICT r1 #1)
    "ann_topk": f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id IN
                   ({', '.join(map(str, ANN_QUERY_IDS))})),
        sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(
                            q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
                 FROM q CROSS JOIN embeddings e
                 WHERE e.vec_id <> q.query_id),
        ranked AS (SELECT query_id, neighbor_id, cos,
                          row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS rnk
                   FROM sims)
        SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
        FROM ranked WHERE rnk <= {ANN_K}
    """,
    "ann_lsh": _ann_lsh_sql(ANN_LSH_PLANES, ANN_K),
    "ann_ivf": _ann_ivf_sql(k=ANN_K, query_ids=tuple(ANN_QUERY_IDS)),
    "ann_pq": _pq_sql(m=_ANN.PQ_M, k=_ANN.PQ_K, iters=_ANN.PQ_ITERS,
                      seed=42, sample_n=500,
                      query_ids=ANN_QUERY_IDS, k_nn=ANN_K),
    "embed_knn_cc": _knn_cc_sql(k=_ANN.KNN_GRAPH_K,
                                n_planes=_ANN.KNN_GRAPH_PLANES,
                                rounds=KNN_CC_ROUNDS),
    "embed_dup_pairs": f"""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                   FROM embeddings)
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= {EMB_DUP_TAU}
    """,
    "tpch_pricing": _REL.PRICING_SUMMARY_SQL,
    "tpch_top_orders": _REL.TOP_ORDERS_SQL,
    "tpch_nation_revenue": _REL.NATION_REVENUE_SQL,
    # exact integer-cents sums: floor(v*100+0.5) is the IDENTICAL float64
    # expression on both sides, so totals match bit-for-bit at any scale
    # running window scan, exact integer cents (same floor(v*100+0.5))
    "events_late": f"""
        WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events),
        a0 AS (SELECT *, ((event_id::HUGEINT * 4294967296) %
               {_W64})::UBIGINT AS h0 FROM c),
        a1 AS (SELECT *, xor(h0, h0 >> 33) AS h1 FROM a0),
        a2 AS (SELECT *,
               {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT AS h2
               FROM a1),
        a3 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM a2),
        a4 AS (SELECT *,
               {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT AS h4
               FROM a3),
        j AS (SELECT event_id, user_id, t, xor(h4, h4 >> 32) AS arr
              FROM a4),
        w AS (SELECT event_id, user_id, t,
                     max(t) OVER (PARTITION BY user_id ORDER BY arr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS mx
              FROM j)
        SELECT event_id, user_id, (mx - t)::BIGINT AS lateness_us
        FROM w
        WHERE mx IS NOT NULL
          AND t < mx - {_WM.WATERMARK_S}::BIGINT * 1000000
    """,
    "events_movavg": f"""
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                          AS cents
                   FROM events)
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               round(sum(cents) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN {_WM.MOVAVG_WIN - 1} PRECEDING
                       AND CURRENT ROW)
                     / (100.0 * count(*) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN {_WM.MOVAVG_WIN - 1} PRECEDING
                       AND CURRENT ROW)), 6) AS mov_avg
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "tpch_part_share": _REL.PART_CONCENTRATION_SQL,
    "events_running": """
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                          AS cents
                   FROM events)
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               sum(cents) OVER w / 100.0 AS running_value
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "events_rollup": """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(day, -1) AS day,
               count(*)::BIGINT AS n_events,
               sum(cents) / 100.0 AS total_value
        FROM c GROUP BY ROLLUP(event_type, day)
    """,
    "events_cube": """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(day, -1) AS day,
               count(*)::BIGINT AS n_events,
               sum(cents) / 100.0 AS total_value
        FROM c GROUP BY CUBE(event_type, day)
    """,
    "events_lag": """
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                          AS cents,
                          CAST(epoch_us(ts) AS BIGINT) AS us
                   FROM events)
        SELECT event_id, user_id, rn, delta_cents, gap_us FROM (
          SELECT event_id, user_id,
                 row_number() OVER w AS rn,
                 cents - lag(cents) OVER w AS delta_cents,
                 us - lag(us) OVER w AS gap_us
          FROM c
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE rn >= 2
    """,
    "events_window": """
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    # sliding 2h windows every 1h: each event covers 2 window ids
    "events_sliding": """
        WITH w AS (
          SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win,
                 value FROM events
          UNION ALL
          SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) - 1 AS win,
                 value FROM events
        )
        SELECT user_id, win, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM w GROUP BY 1, 2
    """,
    # session windows with a 30-min gap; ids 1-based in ts order per user
    "events_session": """
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, value, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
          FROM o
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events, round(sum(value), 6) AS sum_value,
               CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us
        FROM s GROUP BY 1, 2
    """,
    # exact order statistics: same element both sides, so round-6 is
    # bit-identical (quantile_disc index rule = ceil(q*n)-1, 0-based)
    "events_quantiles": f"""
        WITH v AS (SELECT quantile_disc(value,
                     {list(EVENT_QUANTILES)}) AS vals FROM events)
        SELECT unnest({list(EVENT_QUANTILES)}) AS q,
               round(unnest(vals), 6) AS val FROM v
    """,
    # continuous (interpolated) quantiles, identical h = q*(n-1) rule
    "events_interarrival": f"""
        WITH s AS (
          SELECT user_id, ts, event_id,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
          FROM events),
        g AS (SELECT epoch_us(nxt) - epoch_us(ts) AS gap_us
              FROM s WHERE nxt IS NOT NULL),
        v AS (SELECT quantile_cont(gap_us,
                 {list(GAP_QUANTILES)}) AS vals FROM g)
        SELECT unnest({list(GAP_QUANTILES)}) AS q,
               round(unnest(vals), 6) AS val FROM v
    """,
    "events_cont_quantiles": f"""
        WITH v AS (SELECT quantile_cont(value,
                     {list(EVENT_QUANTILES)}) AS vals FROM events)
        SELECT unnest({list(EVENT_QUANTILES)}) AS q,
               round(unnest(vals), 6) AS val FROM v
    """,
    # per-user exact order statistics (same element both sides)
    "events_user_quantiles": f"""
        WITH v AS (SELECT user_id, quantile_disc(value,
                     {list(USER_QUANTILES)}) AS vals
                   FROM events GROUP BY user_id)
        SELECT user_id, unnest({list(USER_QUANTILES)}) AS q,
               round(unnest(vals), 6) AS val FROM v
    """,
    # as-of join: latest purchase at-or-before each click, ties toward
    # the largest purchase id — mirrored portably with last_value
    # IGNORE NULLS over (ts, side, id) ordering (right rows sort before
    # left at equal ts = inclusive match)
    "events_asof": """
        WITH u AS (
          SELECT user_id, ts, event_id, value, 0 AS is_left
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, event_id, value, 1
          FROM events WHERE event_type = 'click'
        ), w AS (
          SELECT is_left, event_id, user_id, ts,
            last_value(CASE WHEN is_left = 0 THEN event_id END
                       IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, is_left, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS mid,
            last_value(CASE WHEN is_left = 0 THEN value END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, is_left, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS mval
          FROM u
        )
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(coalesce(mid, -1) AS BIGINT) AS match_id,
               round(coalesce(mval, 0), 6) AS match_value
        FROM w WHERE is_left = 1
    """,
    # range join + aggregate: trailing-10-min same-user view count/sum
    # per error event, both interval ends inclusive
    "events_range": """
        WITH l AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'error'),
             r AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'view')
        SELECT l.event_id, l.user_id,
               CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
               count(r.user_id) AS n_matches,
               round(coalesce(sum(r.value), 0), 6) AS sum_value
        FROM l LEFT JOIN r ON r.user_id = l.user_id
           AND r.ts BETWEEN l.ts - INTERVAL 10 MINUTE AND l.ts
        GROUP BY 1, 2, 3
    """,
    # ordered funnel: stage k reached = an event of FUNNEL_STAGES[k]
    # strictly after the ts at which stage k-1 was reached, within a
    # 24h conversion window of the user's funnel entry (first view)
    "events_funnel": """
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) AS t, min(s1.t) AS t0
                    FROM events e
                    JOIN s1 ON e.user_id = s1.user_id
                    WHERE e.event_type = 'click' AND e.ts > s1.t
                      AND e.ts <= s1.t + INTERVAL 24 HOUR
                    GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                    JOIN s2 ON e.user_id = s2.user_id
                    WHERE e.event_type = 'purchase' AND e.ts > s2.t
                      AND e.ts <= s2.t0 + INTERVAL 24 HOUR
                    GROUP BY e.user_id)
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
               (SELECT count(*) FROM s1) AS users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
    # cohort LTV: first-active epoch-week cohorts, exact integer-cents
    # revenue per week offset (the pivot cents rounding convention)
    "events_cohort_revenue": """
        WITH e AS (SELECT user_id,
                          epoch_us(ts) // (86400000000 * 7) AS wk,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                              AS cents
                   FROM events),
        c AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id)
        SELECT c.cw AS cohort_week, e.wk - c.cw AS week_offset,
               count(*)::BIGINT AS n_events,
               sum(cents)::BIGINT AS revenue_cents
        FROM e JOIN c USING (user_id)
        WHERE e.wk - c.cw <= 8
        GROUP BY cohort_week, week_offset
    """,
    # cohort retention: first-active epoch-day cohorts, distinct users
    # active at each day offset 0..7
    "events_retention": """
        WITH ud AS (SELECT DISTINCT user_id,
                    date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS day
                    FROM events),
             coh AS (SELECT user_id, min(day) AS cohort_day
                     FROM ud GROUP BY user_id)
        SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
               CAST(ud.day - c.cohort_day AS BIGINT) AS day_offset,
               count(*) AS users
        FROM ud JOIN coh c ON ud.user_id = c.user_id
        WHERE ud.day - c.cohort_day <= 7
        GROUP BY 1, 2
    """,
    # wide per-user pivot: count + exact integer-cents sum per type
    "events_pivot": """
        SELECT user_id,
          count(*) FILTER (WHERE event_type = 'click') AS n_click,
          count(*) FILTER (WHERE event_type = 'error') AS n_error,
          count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
          count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
          count(*) FILTER (WHERE event_type = 'view') AS n_view,
          CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   FILTER (WHERE event_type = 'click'), 0) AS BIGINT)
                   AS cents_click,
          CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   FILTER (WHERE event_type = 'error'), 0) AS BIGINT)
                   AS cents_error,
          CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
                   AS cents_purchase,
          CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   FILTER (WHERE event_type = 'signup'), 0) AS BIGINT)
                   AS cents_signup,
          CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   FILTER (WHERE event_type = 'view'), 0) AS BIGINT)
                   AS cents_view
        FROM events GROUP BY user_id
    """,
    # Gram matrix X^T X over the embedding column, upper triangle,
    # 0-based dims; float32 products exact in double, sum-order
    # divergence ~1e-13 relative against round-6
    "embed_pca": _pca_sql(),
    "embed_project": _pca_project_sql(),
    "embed_kmeans": _kmeans_full_sql(n_centroids=8, iters=4),
    "sketch_distinct_by_lang": _SK.kmv_by_group_sql("lang"),
    # per-user z-score outliers: explicit sum/sumsq population-variance
    # expression (NOT var_pop's Welford path) matching the kernel
    "events_outliers": """
        WITH m AS (SELECT user_id, sum(value) AS s,
                          sum(value * value) AS ss,
                          count(*) AS n
                   FROM events GROUP BY user_id)
        SELECT e.event_id, e.user_id,
               round((e.value - m.s / m.n)
                     / sqrt((m.ss - m.s * m.s / m.n) / m.n), 6) AS z
        FROM events e JOIN m ON e.user_id = m.user_id
        WHERE m.n >= 2 AND (m.ss - m.s * m.s / m.n) / m.n > 0
          AND abs(e.value - m.s / m.n)
              > 3.0 * sqrt((m.ss - m.s * m.s / m.n) / m.n)
    """,
    # time-decayed per-user sums at T=2024-02-01, tau=7d: identical
    # integer-us delta, one division, one libm exp per row
    "events_decay": f"""
        SELECT user_id,
               round(sum(value * exp(-((epoch_us(TIMESTAMP '2024-02-01')
                                        - epoch_us(ts))
                                       / ({7 * 86400}.0 * 1e6)))), 6)
                   AS decayed
        FROM events
        WHERE epoch_us(ts) <= epoch_us(TIMESTAMP '2024-02-01')
        GROUP BY user_id
    """,
    # UNPIVOT of the per-user count pivot back to long form
    "events_rank": """
        SELECT event_id,
               row_number() OVER (ORDER BY value, event_id) AS rnk
        FROM events
    """,
    "events_melt": """
        WITH w AS (
          SELECT user_id,
            count(*) FILTER (WHERE event_type = 'click') AS n_click,
            count(*) FILTER (WHERE event_type = 'error') AS n_error,
            count(*) FILTER (WHERE event_type = 'purchase')
                AS n_purchase,
            count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
            count(*) FILTER (WHERE event_type = 'view') AS n_view
          FROM events GROUP BY user_id)
        SELECT user_id, metric, n
        FROM w UNPIVOT (n FOR metric IN (n_click, n_error, n_purchase,
                                         n_signup, n_view))
    """,
    "events_profile": """
        SELECT 'event_id' AS col, count(*) AS n_rows, count(*) - count(event_id) AS n_null, count(DISTINCT event_id) AS n_distinct FROM events
        UNION ALL
        SELECT 'ts' AS col, count(*) AS n_rows, count(*) - count(ts) AS n_null, count(DISTINCT ts) AS n_distinct FROM events
        UNION ALL
        SELECT 'user_id' AS col, count(*) AS n_rows, count(*) - count(user_id) AS n_null, count(DISTINCT user_id) AS n_distinct FROM events
        UNION ALL
        SELECT 'event_type' AS col, count(*) AS n_rows, count(*) - count(event_type) AS n_null, count(DISTINCT event_type) AS n_distinct FROM events
        UNION ALL
        SELECT 'value' AS col, count(*) AS n_rows, count(*) - count(value) AS n_null, count(DISTINCT value) AS n_distinct FROM events
        UNION ALL
        SELECT 'props' AS col, count(*) AS n_rows, count(*) - count(props) AS n_null, count(DISTINCT props) AS n_distinct FROM events
    """,
    "events_histogram": """
        SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin,
               count(*) AS n
        FROM events GROUP BY 1
    """,
    "embed_gram": """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings
        ), u AS (
          SELECT vec_id,
                 CAST(generate_subscripts(emb, 1) AS BIGINT) - 1 AS dim,
                 unnest(emb) AS v
          FROM e
        )
        SELECT a.dim AS i, b.dim AS j, round(sum(a.v * b.v), 6) AS val
        FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2
    """,
    # MinHash+LSH near-dup pairs (dedup.minhash_dedup_pairs defaults:
    # 64 perms, 16 bands, char-5-grams, cap 64; q threshold 0.5) — the
    # whole deterministic index reproduced in HUGEINT arithmetic
    "dedup_minhash": _minhash_sql(num_perm=64, bands=16, k=5,
                                  threshold=0.5, cap=64),
    # n-gram Jaccard via high-recall MinHash banding (32 bands of 2;
    # q threshold 0.4), exact-verified — same generator, narrower bands
    "dedup_ngram": _minhash_sql(num_perm=64, bands=32, k=5,
                                threshold=0.4, cap=64),
    # MinHash candidates re-verified by byte Levenshtein >= 0.8 — the
    # minhash CTE is the identical HUGEINT index, lev/octet math exact
    "dedup_edit": f"""
        WITH mh AS MATERIALIZED ({_minhash_sql(num_perm=64, bands=16,
                                               k=5, threshold=0.5,
                                               cap=64)}),
        lv AS (
          SELECT mh.a, mh.b,
                 levenshtein(da.text, db.text) AS lev,
                 greatest(strlen(da.text), strlen(db.text), 1) AS mx
          FROM mh
          JOIN documents da ON da.doc_id = mh.a
          JOIN documents db ON db.doc_id = mh.b)
        SELECT a, b, lev,
               round(1.0 - lev::DOUBLE / mx, 6) AS sim
        FROM lv WHERE 1.0 - lev::DOUBLE / mx >= 0.8
    """,
    # window-sampled exact-substring duplication (30-char windows,
    # stride 7, df cap 64) — collision-proof HUGEINT hash parity
    "dedup_substr": _substr_sql(window=30, stride=7, df_cap=64),
    # SimHash 64-bit signatures, 4x16-bit blocks, hamming <= 8 (q args)
    "dedup_simhash": _simhash_sql(max_hamming=8, cap=256),
    # top-5 TF-IDF terms per doc (text.tfidf_top_terms): tf = c/doc_len,
    # idf = ln(N/df) over ALL documents; ties (tfidf desc, term asc)
    "text_top_stems": """
        WITH toks AS (
          SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS w
          FROM documents),
        st AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(w, 'sses$', 'ss'), 'ies$', 'i'), '([^s])s$', '\\1'), '^(\\w{3,})ing$', '\\1'), '^(\\w{2,})ed$', '\\1') AS stem FROM toks)
        SELECT stem, count(*) AS n FROM st WHERE stem <> ''
        GROUP BY stem ORDER BY n DESC, stem ASC LIMIT 30
    """,
    "text_tfidf": """
        WITH wl AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM documents),
        w AS MATERIALIZED (
          SELECT doc_id, unnest(l) AS term FROM wl),
        tc AS MATERIALIZED (
          SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
        nw AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
        df AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
        nd AS (SELECT count(*)::DOUBLE AS nd FROM documents),
        scored AS (
          SELECT t.doc_id, t.term,
                 (t.c::DOUBLE / nw.n) * ln(nd.nd / df.df) AS s
          FROM tc t
          JOIN nw ON nw.doc_id = t.doc_id
          JOIN df ON df.term = t.term
          CROSS JOIN nd),
        ranked AS (
          SELECT doc_id, term, s, row_number() OVER
                 (PARTITION BY doc_id ORDER BY s DESC, term ASC) AS rnk
          FROM scored)
        SELECT doc_id, term, rnk, round(s, 6) AS tfidf
        FROM ranked WHERE rnk <= 5
    """,
    # word-level repetition metrics (text.add_repetition_stats): word
    # split mirrors the engine's isspace segmentation on this ASCII
    # corpus; bigram keys are order-sensitive concat (chr(31) separator,
    # a codepoint outside the corpus charset)
    "text_repetition": """
        WITH wl AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text),
                 '[ \t\n]+'), x -> length(x) > 0) AS l
          FROM documents),
        w AS MATERIALIZED (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM wl),
        wg AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
        ws AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
                      count(*)::BIGINT AS n_dist, max(c) AS max_w
               FROM wg GROUP BY doc_id),
        big AS (SELECT doc_id, w || chr(31) || w2 AS bg FROM (
                  SELECT doc_id, w, lead(w) OVER
                         (PARTITION BY doc_id ORDER BY i) AS w2 FROM w)
                WHERE w2 IS NOT NULL),
        bgg AS (SELECT doc_id, bg, count(*) AS c
                FROM big GROUP BY doc_id, bg),
        bs AS (SELECT doc_id, max(c) AS max_b FROM bgg GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(ws.n_words, 0) AS n_words,
               round(CASE WHEN coalesce(ws.n_words, 0) > 0
                     THEN 1 - (ws.n_dist::DOUBLE / ws.n_words)
                     ELSE 0 END, 6) AS dup_word_frac,
               round(CASE WHEN coalesce(ws.n_words, 0) > 0
                     THEN ws.max_w::DOUBLE / ws.n_words
                     ELSE 0 END, 6) AS top_word_frac,
               round(CASE WHEN coalesce(ws.n_words, 0) > 1
                     THEN bs.max_b::DOUBLE / (ws.n_words - 1)
                     ELSE 0 END, 6) AS top_bigram_frac
        FROM documents d
        LEFT JOIN ws ON ws.doc_id = d.doc_id
        LEFT JOIN bs ON bs.doc_id = d.doc_id
    """,
    # exact inverted-index n-gram Jaccard (dedup.exact_jaccard_pairs):
    # shingles = distinct char-5-grams (whole text when len < 5, matching
    # text.rolling_hashes), candidates = docs sharing a shingle with the
    # same df-cap-64 smallest-ids cut the engine applies, jaccard exact
    # over full sets.  String shingles here vs 64-bit hashes in the
    # engine: identical up to hash collisions (P ~ 2^-65 per gram pair).
    "dedup_ppjoin": f"""
        WITH shd AS MATERIALIZED (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id, unnest(
                     CASE WHEN length(text) < 5 THEN [text]
                     ELSE list_transform(range(1, length(text) - 3),
                                         j -> substr(text, j::INT, 5))
                     END) AS sh
            FROM documents)),
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
        inter AS MATERIALIZED (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM shd x JOIN shd y
            ON x.sh = y.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
        SELECT i.a, i.b,
               round(i.i::DOUBLE / (za.sz + zb.sz - i.i), 6) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.a
        JOIN sizes zb ON zb.doc_id = i.b
        WHERE i.i::DOUBLE / (za.sz + zb.sz - i.i) >= {_PPJOIN_TAU}
    """,
    "dedup_jaccard": """
        WITH shd AS MATERIALIZED (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id, unnest(
                     CASE WHEN length(text) < 5 THEN [text]
                     ELSE list_transform(range(1, length(text) - 3),
                                         j -> substr(text, j::INT, 5))
                     END) AS sh
            FROM documents)
        ),
        sizes AS MATERIALIZED (
          SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
        capped AS MATERIALIZED (
          SELECT doc_id, sh FROM (
            SELECT doc_id, sh, row_number() OVER
                   (PARTITION BY sh ORDER BY doc_id) AS rn
            FROM shd) WHERE rn <= 64
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM capped x JOIN capped y
            ON x.sh = y.sh AND x.doc_id < y.doc_id
        ),
        inter AS MATERIALIZED (
          SELECT c.a, c.b, count(*) AS i
          FROM cand c
          JOIN shd sa ON sa.doc_id = c.a
          JOIN shd sb ON sb.doc_id = c.b AND sb.sh = sa.sh
          GROUP BY c.a, c.b
        )
        SELECT i.a, i.b,
               round(i.i::DOUBLE / (za.sz + zb.sz - i.i), 6) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.a
        JOIN sizes zb ON zb.doc_id = i.b
        WHERE i.i::DOUBLE / (za.sz + zb.sz - i.i) >= 0.5
    """,
    # stub decode verified lane-for-lane: sha256(text||kind) hex -> 32
    # byte values -> 16 little-endian uint32 lanes (digest repeats, so
    # lanes 8..15 == 0..7) -> v = lane % 10000; checksum = sum v^2 exact
    # in int64 (multimodal.MediaDecodeStage._decode)
    # REAL WAV decode lane: every stat recomputed from the generator's
    # integer closed form (16-bit PCM samples are deterministic in
    # (doc_id, i); sum of squares exact in int64 both sides)
    "media_audio": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 400 + (strlen(text) * 7) % 800 AS n
          FROM documents
        ), s AS (
          SELECT media_id, n,
                 ((media_id + 1) * 2654435761 + unnest(range(n)) * 97003)
                   % 65536 - 32768 AS v
          FROM m
        ), a AS (
          SELECT media_id, n, sum(v * v)::BIGINT AS sumsq,
                 max(abs(v))::BIGINT AS peak
          FROM s GROUP BY media_id, n
        )
        SELECT media_id, 8000::BIGINT AS sample_rate, n AS n_samples,
               (n * 1000) // 8000 AS duration_ms, peak,
               round(sqrt(sumsq / n::DOUBLE), 6) AS rms
        FROM a
    """,
    # REAL DSP lane: rfft magnitudes vs explicit cos/sin DFT sums over
    # the same closed-form samples (round-3; fft-vs-naive ~1e-9 abs)
    "media_spectral": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 400 + (strlen(text) * 7) % 800 AS n
          FROM documents
        ), s AS (
          SELECT media_id, n, unnest(range(n)) AS i,
                 ((media_id + 1) * 2654435761 + unnest(range(n)) * 97003)
                   % 65536 - 32768 AS v
          FROM m
        ), f AS (
          SELECT media_id, n, sum(v) AS sv,
                 sum(v * cos(2 * pi() * 1 * i / n)) AS re1,
                 sum(v * sin(2 * pi() * 1 * i / n)) AS im1,
                 sum(v * cos(2 * pi() * 2 * i / n)) AS re2,
                 sum(v * sin(2 * pi() * 2 * i / n)) AS im2,
                 sum(v * cos(2 * pi() * 4 * i / n)) AS re4,
                 sum(v * sin(2 * pi() * 4 * i / n)) AS im4,
                 sum(v * cos(2 * pi() * 8 * i / n)) AS re8,
                 sum(v * sin(2 * pi() * 8 * i / n)) AS im8,
                 sum(v * cos(2 * pi() * 16 * i / n)) AS re16,
                 sum(v * sin(2 * pi() * 16 * i / n)) AS im16
          FROM s GROUP BY media_id, n
        )
        SELECT media_id, n AS n_samples,
               round(sv / n, 3) AS dc,
               round(sqrt(re1 * re1 + im1 * im1) / n, 3) AS m1,
               round(sqrt(re2 * re2 + im2 * im2) / n, 3) AS m2,
               round(sqrt(re4 * re4 + im4 * im4) / n, 3) AS m4,
               round(sqrt(re8 * re8 + im8 * im8) / n, 3) AS m8,
               round(sqrt(re16 * re16 + im16 * im16) / n, 3) AS m16
        FROM f
    """,
    # REAL BMP decode lane: width/height/channel means recomputed from
    # the generator's closed form (exact int64 channel sums both sides)
    "media_image": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
          FROM documents
        ), px AS (
          -- NOTE multiple unnests ZIP in DuckDB; the pixel grid needs a
          -- true cross product, bounded by the max w/h then filtered
          SELECT media_id, w, h, gx.x, gy.y
          FROM m
          CROSS JOIN (SELECT unnest(range(24)) AS x) gx
          CROSS JOIN (SELECT unnest(range(20)) AS y) gy
          WHERE gx.x < w AND gy.y < h
        ), s AS (
          SELECT media_id, w, h,
                 sum((media_id * 131 + y * 17 + x * 7 + 0) % 256)
                     ::BIGINT AS sb,
                 sum((media_id * 131 + y * 17 + x * 7 + 3) % 256)
                     ::BIGINT AS sg,
                 sum((media_id * 131 + y * 17 + x * 7 + 6) % 256)
                     ::BIGINT AS sr
          FROM px GROUP BY media_id, w, h
        )
        SELECT media_id, w AS width, h AS height,
               round(sb / (w * h)::DOUBLE, 6) AS mean_b,
               round(sg / (w * h)::DOUBLE, 6) AS mean_g,
               round(sr / (w * h)::DOUBLE, 6) AS mean_r
        FROM s
    """,
    # REAL resize lane: channel means of the 8x8 nearest-neighbor
    # downsample — the gather indexes (ty*h//8, tx*w//8) pick generator
    # pixels, so the sums are the same closed form over the target grid
    "media_resize": f"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
          FROM documents
        ), px AS (
          SELECT media_id,
                 ((gy.ty * h) // {MEDIA_RESIZE_TARGET}) AS sy,
                 ((gx.tx * w) // {MEDIA_RESIZE_TARGET}) AS sx
          FROM m
          CROSS JOIN (SELECT unnest(range({MEDIA_RESIZE_TARGET})) AS tx) gx
          CROSS JOIN (SELECT unnest(range({MEDIA_RESIZE_TARGET})) AS ty) gy
        ), s AS (
          SELECT media_id,
                 sum((media_id * 131 + sy * 17 + sx * 7 + 0) % 256)
                     ::BIGINT AS sb,
                 sum((media_id * 131 + sy * 17 + sx * 7 + 3) % 256)
                     ::BIGINT AS sg,
                 sum((media_id * 131 + sy * 17 + sx * 7 + 6) % 256)
                     ::BIGINT AS sr
          FROM px GROUP BY media_id
        )
        SELECT media_id,
               {MEDIA_RESIZE_TARGET}::BIGINT AS width,
               {MEDIA_RESIZE_TARGET}::BIGINT AS height,
               round(sb / {MEDIA_RESIZE_TARGET * MEDIA_RESIZE_TARGET}::DOUBLE, 6) AS mean_b,
               round(sg / {MEDIA_RESIZE_TARGET * MEDIA_RESIZE_TARGET}::DOUBLE, 6) AS mean_g,
               round(sr / {MEDIA_RESIZE_TARGET * MEDIA_RESIZE_TARGET}::DOUBLE, 6) AS mean_r
        FROM s
    """,
    # REAL perceptual-hash lane: dHash gradient bits over the 8x9
    # nearest-neighbor grid of the channel-sum image — pure integer
    # closed form (pixels, gathers, comparisons), hash split in two
    # int64 halves
    "media_phash": ORACLE_PHASH,
    # image near-dup pairs over the dHash signatures: same block/cap
    # rule as _simhash_sql; recall exact by pigeonhole at hamming <= 2
    "media_dedup": """
        WITH ph0 AS MATERIALIZED (
          SELECT media_id,
                 ((dhash_hi::HUGEINT * 4294967296 + dhash_lo))::UBIGINT
                     AS s
          FROM (""" + ORACLE_PHASH + """)),
        blocks AS MATERIALIZED (
          SELECT media_id, s, t, (s >> (16 * t)::INT) & 65535 AS bh
          FROM ph0 CROSS JOIN (SELECT unnest(range(4)) AS t)),
        capped AS (
          SELECT media_id, s, t, bh FROM (
            SELECT media_id, s, t, bh, row_number() OVER
                   (PARTITION BY t, bh ORDER BY media_id) AS rn
            FROM blocks) WHERE rn <= 256)
        SELECT DISTINCT x.media_id AS a, y.media_id AS b,
               bit_count(xor(x.s, y.s))::BIGINT AS hamming
        FROM capped x JOIN capped y
          ON x.t = y.t AND x.bh = y.bh AND x.media_id < y.media_id
        WHERE bit_count(xor(x.s, y.s)) <= 2
    """,
    # windowed audio energy: full 64-sample windows, exact int64
    # sum-of-squares; argmax via min window index at the max energy
    "media_energy": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 400 + (strlen(text) * 7) % 800 AS n
          FROM documents
        ), s AS (
          SELECT media_id, n, i,
                 ((media_id + 1) * 2654435761 + i * 97003)
                   % 65536 - 32768 AS v
          FROM (SELECT media_id, n, unnest(range(n)) AS i FROM m)
        ), w AS (
          SELECT media_id, (i // 64)::BIGINT AS win,
                 sum(v * v)::BIGINT AS e
          FROM s WHERE i < (n // 64) * 64
          GROUP BY media_id, (i // 64)
        ), agg AS (
          SELECT media_id, count(*)::BIGINT AS n_windows,
                 max(e) AS max_energy,
                 CAST(sum(CASE WHEN e > 23000000000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_loud
          FROM w GROUP BY media_id
        )
        SELECT a.media_id, a.n_windows, a.max_energy,
               (SELECT min(w2.win) FROM w w2
                WHERE w2.media_id = a.media_id
                  AND w2.e = a.max_energy) AS peak_window,
               a.n_loud
        FROM agg a
    """,
    # scene cuts over EVERY Y4M frame: |sum_f - sum_{f-1}| > 8*w*h —
    # all-integer, the generator closed form per frame
    "media_scenes": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + 2 * (doc_id % 8) AS w,
                 8 + 2 * (doc_id % 6) AS h,
                 3 + doc_id % 5 AS nf
          FROM documents
        ), fr AS (
          SELECT media_id, w, h, nf, gf.f
          FROM m CROSS JOIN (SELECT unnest(range(7)) AS f) gf
          WHERE gf.f < nf
        ), px AS (
          SELECT media_id, w, h, nf, f, gx.x, gy.y
          FROM fr
          CROSS JOIN (SELECT unnest(range(22)) AS x) gx
          CROSS JOIN (SELECT unnest(range(18)) AS y) gy
          WHERE gx.x < w AND gy.y < h
        ), s AS (
          SELECT media_id, w, h, nf, f,
                 sum((media_id * 131 + f * 29 + y * 17 + x * 7) % 256)
                     ::BIGINT AS sy
          FROM px GROUP BY 1, 2, 3, 4, 5
        ), d AS (
          SELECT media_id, nf, f,
                 CASE WHEN abs(sy - lag(sy) OVER
                          (PARTITION BY media_id ORDER BY f))
                          > 8 * w * h
                      THEN 1 ELSE 0 END AS cut
          FROM s
        )
        SELECT media_id, CAST(max(nf) AS BIGINT) AS n_frames,
               CAST(sum(cut) AS BIGINT) AS n_cuts,
               CAST(coalesce(min(CASE WHEN cut = 1 THEN f END), -1)
                    AS BIGINT) AS first_cut
        FROM d GROUP BY media_id
    """,
    # REAL Y4M demux lane: per-sampled-frame mean luma recomputed from
    # the generator closed form (bounded cross joins; multiple unnests
    # ZIP in DuckDB so true products need explicit joins)
    "media_video": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 8 + 2 * (doc_id % 8) AS w,
                 8 + 2 * (doc_id % 6) AS h,
                 3 + doc_id % 5 AS nf
          FROM documents
        ), fr AS (
          SELECT media_id, w, h, gf.f
          FROM m CROSS JOIN (SELECT unnest(range(7)) AS f) gf
          WHERE gf.f < nf AND gf.f % 2 = 0
        ), px AS (
          SELECT media_id, w, h, f, gx.x, gy.y
          FROM fr
          CROSS JOIN (SELECT unnest(range(22)) AS x) gx
          CROSS JOIN (SELECT unnest(range(18)) AS y) gy
          WHERE gx.x < w AND gy.y < h
        ), s AS (
          SELECT media_id, w, h, f,
                 sum((media_id * 131 + f * 29 + y * 17 + x * 7) % 256)
                     ::BIGINT AS sy
          FROM px GROUP BY media_id, w, h, f
        )
        SELECT media_id, w AS width, h AS height, f AS frame_idx,
               round(sy / (w * h)::DOUBLE, 6) AS mean_y
        FROM s
    """,
    "media_features": """
        WITH k0 AS (
          SELECT doc_id AS media_id,
                 ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
                 text FROM documents
        ), m AS (
          SELECT media_id, kind, strlen(text) AS n_bytes,
                 sha256(text || kind) AS hx FROM k0
        ), b AS (
          SELECT media_id, kind, n_bytes,
                 list_transform(range(0, 32), j ->
                   (strpos('0123456789abcdef',
                           substr(hx, (2*j)::INT + 1, 1)) - 1) * 16 +
                    strpos('0123456789abcdef',
                           substr(hx, (2*j)::INT + 2, 1)) - 1) AS bs
          FROM m
        ), v AS (
          SELECT media_id, kind, n_bytes,
                 list_transform(range(0, 8), i ->
                   (bs[(4*i)::INT + 1] + 256 * bs[(4*i)::INT + 2] +
                    65536 * bs[(4*i)::INT + 3] +
                    16777216 * bs[(4*i)::INT + 4]) % 10000) AS vs
          FROM b
        )
        SELECT media_id, kind, n_bytes,
               (2 * list_sum(list_transform(vs, x -> x * x)))::BIGINT
                   AS feat_ss
        FROM v
    """,
    # 1-fps frame offsets for video rows; duration = (bytes*131) % 60000
    # as derived by multimodal.media_from_documents
    "media_frames": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 (strlen(text) * 131) % 60000 AS duration_ms
          FROM documents WHERE doc_id % 3 = 2
        ), f AS (
          SELECT media_id,
                 unnest(range(0, greatest(duration_ms, 1), 1000)) AS off
          FROM m
        )
        SELECT media_id, off::INTEGER AS frame_ms FROM f
    """,
}

QUERIES = {
    "doc_edges": q_doc_edges,
    "doc_degree": q_doc_degree,
    "doc_assortativity": q_doc_assortativity,
    "doc_top_degree": q_doc_top_degree,
    "doc_group_sizes": q_doc_group_sizes,
    "doc_edge_count": q_doc_edge_count,
    "doc_triangles": q_doc_triangles,
    "doc_msf": q_doc_msf,
    "doc_matching": q_doc_matching,
    "text_cm": q_text_cm,
    "text_feature_hash": q_text_feature_hash,
    "events_late": q_events_late,
    "table_diff": q_table_diff,
    "events_movavg": q_events_movavg,
    "tpch_part_share": q_tpch_part_share,
    "doc_4cliques": q_doc_4cliques,
    "doc_clustering": q_doc_clustering,
    "doc_neighbor_sample": q_doc_neighbor_sample,
    "doc_sage": q_doc_sage,
    "doc_truss": q_doc_truss,
    "doc_pagerank": q_doc_pagerank,
    "doc_pagerank_warm": q_doc_pagerank_warm,
    "doc_wpagerank": q_doc_wpagerank,
    "doc_pagerank_iter1": q_doc_pagerank_iter1,
    "doc_cc": q_doc_cc,
    "doc_component_stats": q_doc_component_stats,
    "doc_labelprop": q_doc_labelprop,
    "doc_modularity": q_doc_modularity,
    "doc_louvain": q_doc_louvain,
    "doc_bfs": q_doc_bfs,
    "doc_bc": q_doc_bc,
    "doc_bc_sampled": q_doc_bc_sampled,
    "doc_sssp": q_doc_sssp,
    "doc_widest": q_doc_widest,
    "doc_pagerank_deltas": q_doc_pagerank_deltas,
    "doc_hits": q_doc_hits,
    "doc_ppr": q_doc_ppr,
    "doc_trustrank": q_doc_trustrank,
    "doc_subgraph_pagerank": q_doc_subgraph_pagerank,
    "doc_kcore": q_doc_kcore,
    "doc_onion": q_doc_onion,
    "doc_mis": q_doc_mis,
    "doc_coloring": q_doc_coloring,
    "doc_harmonic": q_doc_harmonic,
    "doc_closeness": q_doc_closeness,
    "doc_katz": q_doc_katz,
    "doc_scc": q_doc_scc,
    "doc_reciprocity": q_doc_reciprocity,
    "doc_powerlaw": q_doc_powerlaw,
    "doc_coreness": q_doc_coreness,
    "doc_diameter": q_doc_diameter,
    "doc_walks": q_doc_walks,
    "doc_walk_pmi": q_doc_walk_pmi,
    "doc_negatives": q_doc_negatives,
    "doc_node2vec": q_doc_node2vec,
    "doc_adamic_adar": q_doc_adamic_adar,
    "doc_linkpred": q_doc_linkpred,
    "text_tokens": q_text_tokens,
    "text_tokens_bpe": q_text_tokens_bpe,
    "text_top_tokens": q_text_top_tokens,
    "text_top_bigrams": q_text_top_bigrams,
    "text_bpe_pairs": q_text_bpe_pairs,
    "text_top_tokens_by_lang": q_text_top_tokens_by_lang,
    "sample_quota": q_sample_quota,
    "sample_stratified": q_sample_stratified,
    "sketch_distinct": q_sketch_distinct,
    "sketch_intersection": q_sketch_intersection,
    "sketch_hll_daily": q_sketch_hll_daily,
    "doc_partition_cut": q_doc_partition_cut,
    "sketch_hll": q_sketch_hll,
    "sketch_bloom": q_sketch_bloom,
    "events_anomaly_days": q_events_anomaly_days,
    "doc_eigen": q_doc_eigen,
    "doc_wl": q_doc_wl,
    "doc_condensation": q_doc_condensation,
    "doc_triads": q_doc_triads,
    "text_pmi": q_text_pmi,
    "events_markov": q_events_markov,
    "events_interarrival": q_events_interarrival,
    "events_topk_users": q_events_topk_users,
    "events_dau": q_events_dau,
    "events_ab_test": q_events_ab_test,
    "text_bm25": q_text_bm25,
    "text_langid_confusion": q_text_langid_confusion,
    "sample_weighted": q_sample_weighted,
    "mix_weights": q_mix_weights,
    "mix_resample": q_mix_resample,
    "sink_roundtrip": q_sink_roundtrip,
    "sink_csv_roundtrip": q_sink_csv_roundtrip,
    "sink_json_roundtrip": q_sink_json_roundtrip,
    "sink_jsonl_gz_roundtrip": q_sink_jsonl_gz_roundtrip,
    "warc_extract": q_warc_extract,
    "embed_outliers": q_embed_outliers,
    "sketch_cms": q_sketch_cms,
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "corpus_quality_cut": q_corpus_quality_cut,
    "text_repetition": q_text_repetition,
    "text_tfidf": q_text_tfidf,
    "text_top_stems": q_text_top_stems,
    "text_fingerprint": q_text_fingerprint,
    "text_redact": q_text_redact,
    "decontaminate": q_decontaminate,
    "text_perplexity": q_text_perplexity,
    "text_chunks": q_text_chunks,
    "text_langid": q_text_langid,
    "dedup_exact": q_dedup_exact,
    "dedup_incremental": q_dedup_incremental,
    "shuffle_shards": q_shuffle_shards,
    "corpus_clean": q_corpus_clean,
    "corpus_clean_v2": q_corpus_clean_v2,
    "corpus_clean_v3": q_corpus_clean_v3,
    "dedup_minhash": q_dedup_minhash,
    "dedup_report": q_dedup_report,
    "dedup_paragraph": q_dedup_paragraph,
    "dedup_ppjoin": q_dedup_ppjoin,
    "tpch_discount": q_tpch_discount,
    "tpch_custdist": q_tpch_custdist,
    "tpch_waiting": q_tpch_waiting,
    "tpch_top_supplier": q_tpch_top_supplier,
    "tpch_small_qty": q_tpch_small_qty,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram": q_dedup_ngram,
    "dedup_edit": q_dedup_edit,
    "dedup_substr": q_dedup_substr,
    "dedup_jaccard": q_dedup_jaccard,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_pq": q_ann_pq,
    "embed_knn_cc": q_embed_knn_cc,
    "embed_dup_pairs": q_embed_dup_pairs,
    "embed_centroids": q_embed_centroids,
    "semantic_dedup": q_semantic_dedup,
    "tpch_pricing": q_tpch_pricing,
    "tpch_top_orders": q_tpch_top_orders,
    "tpch_nation_revenue": q_tpch_nation_revenue,
    "tpch_order_rank": q_tpch_order_rank,
    "tpch_large_orders": q_tpch_large_orders,
    "tpch_priority_count": q_tpch_priority_count,
    "tpch_returned_revenue": q_tpch_returned_revenue,
    "tpch_promo": q_tpch_promo,
    "tpch_volume": q_tpch_volume,
    "tpch_market_share": q_tpch_market_share,
    "embed_quantize": q_embed_quantize,
    "doc_adjacency": q_doc_adjacency,
    "doc_distance_dist": q_doc_distance_dist,
    "tpch_priority_buckets": q_tpch_priority_buckets,
    "tpch_cust_no_orders": q_tpch_cust_no_orders,
    "tpch_parts_shipped": q_tpch_parts_shipped,
    "tpch_bloom_semijoin": q_tpch_bloom_semijoin,
    "pack_sequences": q_pack_sequences,
    "events_rollup": q_events_rollup,
    "events_running": q_events_running,
    "events_cube": q_events_cube,
    "events_lag": q_events_lag,
    "events_window": q_events_window,
    "events_sliding": q_events_sliding,
    "events_session": q_events_session,
    "events_asof": q_events_asof,
    "events_range": q_events_range,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_cohort_revenue": q_events_cohort_revenue,
    "events_pivot": q_events_pivot,
    "events_melt": q_events_melt,
    "events_rank": q_events_rank,
    "events_profile": q_events_profile,
    "sketch_distinct_by_lang": q_sketch_distinct_by_lang,
    "events_histogram": q_events_histogram,
    "events_outliers": q_events_outliers,
    "events_decay": q_events_decay,
    "embed_gram": q_embed_gram,
    "embed_pca": q_embed_pca,
    "embed_project": q_embed_project,
    "embed_kmeans": q_embed_kmeans,
    "events_quantiles": q_events_quantiles,
    "events_cont_quantiles": q_events_cont_quantiles,
    "events_user_quantiles": q_events_user_quantiles,
    "media_audio": q_media_audio,
    "media_spectral": q_media_spectral,
    "media_image": q_media_image,
    "media_resize": q_media_resize,
    "media_video": q_media_video,
    "media_phash": q_media_phash,
    "media_dedup": q_media_dedup,
    "media_scenes": q_media_scenes,
    "media_energy": q_media_energy,
    "media_features": q_media_features,
    "media_frames": q_media_frames,
}


# --------------------------------------------------------------------------
# round-3 continuation wave 4: cohort churn, series smoothing, Zipf fit,
# sentence stats, condensation-DAG layering, ANN recall report
# --------------------------------------------------------------------------

TOP_ZIPF_K = 200
TOPO_ROUNDS = 16


def q_events_churn(sf_dir):
    """Weekly cohort churn (windows.weekly_churn): per Monday week, the
    distinct actives, those retained into week+1, and the churn rate —
    the disjoint-user-bucket distinct trick of events_dau, so no
    distinct shuffle and no stream self-join."""
    from .windows import weekly_churn

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return weekly_churn(ev)


def q_events_smooth(sf_dir):
    """Exponential smoothing of the daily revenue series
    (windows.daily_smooth): exact integer-cents day sums from map-side
    partials, then the alpha=0.3 recurrence over the calendar-bounded
    day series — the identical float expression in the identical order
    as the SQL twin's recursive CTE."""
    from .windows import daily_smooth

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])
    return daily_smooth(ev)


def q_text_zipf(sf_dir):
    """Zipf's-law fit over the corpus token frequencies: ln(freq) ~
    slope * ln(rank) + intercept, least squares over the top-200
    tokens.  Counting is the text_top_tokens combiner shape (map-side
    value_counts partials, one distinct-token groupby, per-block
    top-k); the regression runs on 200 driver rows with the SQL twin's
    exact formula."""

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]),
                                                      r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = _arr(toks.value_counts())
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(TOP_ZIPF_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    top = parts.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(TOP_ZIPF_K)
    n = top["n"].to_numpy(np.int64)
    k = float(len(n))
    x = np.log(np.arange(1, len(n) + 1, dtype=np.float64))
    y = np.log(n.astype(np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxy, sxx = float((x * y).sum()), float((x * x).sum())
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return pd.DataFrame({"k": np.array([len(n)], np.int64),
                         "slope": [round(slope, 6)],
                         "intercept": [round((sy - slope * sx) / k, 6)]})


def q_text_sentences(sf_dir):
    """Per-document sentence statistics: segments split on [.!?]+ (the
    IDENTICAL RE2 pattern both engines), trimmed on explicit
    whitespace, empties dropped; (doc_id, n_sentences, avg_len) for
    docs with at least one sentence.  Fully vectorized: one regex
    split per batch, per-row aggregation via bincount over list
    offsets."""

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(_arr(b["text"]), r"[.!?]+")
        flat = pc.utf8_trim(pc.list_flatten(parts), " \t\n\r")
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = pc.list_value_length(parts) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        row = np.repeat(np.arange(len(counts)), counts)
        ok = lens > 0
        nsent = np.bincount(row[ok], minlength=len(counts)) \
            .astype(np.int64)
        ssum = np.bincount(row[ok], weights=lens[ok],
                           minlength=len(counts))
        keep = nsent > 0
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc[keep]),
            "n_sentences": pa.array(nsent[keep]),
            "avg_len": pa.array(np.round(ssum[keep] / nsent[keep], 6))})

    return docs.map_batches(stats, batch_format="pyarrow")


def q_doc_toposort(sf_dir):
    """Topological layering of the SCC condensation DAG
    (algos/toposort.LayerProgram, a combine=max superstep relaxation):
    layer(c) = longest path from any source — each component's
    earliest scheduling wave.  Condensation nodes dense-relabel on the
    driver (bounded by the condensation size, the domain
    q_doc_condensation already returns); the relaxation itself runs on
    the superstep engine; components outside the condensation edge set
    keep layer 0.  Returns (scc, layer) for every distinct label."""
    from .algos import strongly_connected_components
    from .algos.toposort import dag_layers
    from .graph import load_directed
    from .io import from_pandas_clean

    cond = q_doc_condensation(sf_dir)
    eng = documents_engine(sf_dir, "scc")
    strongly_connected_components(eng)
    all_sccs = np.sort(np.asarray(
        eng.state_dataset(["scc"]).unique("scc"), dtype=np.int64))
    layer = np.zeros(len(all_sccs), np.int64)
    if len(cond):
        f = cond["from_scc"].to_numpy(np.int64)
        t = cond["to_scc"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([f, t]))
        edges = from_pandas_clean(pd.DataFrame(
            {"src": np.searchsorted(nodes, f),
             "dst": np.searchsorted(nodes, t)}))
        eng2 = load_directed(edges, len(nodes), num_partitions=2,
                             store_dir=_store_root(sf_dir, "topo"),
                             fingerprint=_input_fingerprint(sf_dir))
        try:
            rep = dag_layers(eng2, max_steps=TOPO_ROUNDS + 2)
            _check_unroll(rep, TOPO_ROUNDS, "doc_toposort")
            st = eng2.state_dataset(["layer"]).to_pandas()
        finally:
            eng2.shutdown()
        pos = np.searchsorted(all_sccs, nodes[st["v"].to_numpy(np.int64)])
        layer[pos] = st["layer"].to_numpy(np.int64)
    return pd.DataFrame({"scc": all_sccs, "layer": layer})


def q_embed_recall(sf_dir):
    """ANN quality report: recall@k of the IVF probed index against the
    brute-force cosine top-k, per query — the standard index health
    check a 100-TB corpus runs per index build.  Reuses both existing
    operators; the join/count runs over k*|queries| driver rows."""
    bf = q_ann_topk(sf_dir)[["query_id", "neighbor_id"]]
    iv = q_ann_ivf(sf_dir)
    hit = bf.merge(iv, on=["query_id", "neighbor_id"], how="inner") \
        .groupby("query_id").size()
    qids = np.sort(bf["query_id"].unique())
    rec = np.array([hit.get(q, 0) for q in qids], np.float64) / ANN_K
    return pd.DataFrame({"query_id": qids.astype(np.int64),
                         "recall": np.round(rec, 6)})


def _toposort_sql(rounds: int) -> str:
    """Unrolled max-relaxation twin of q_doc_toposort over the SCC
    condensation (the doc_condensation CTEs verbatim, then `rounds`
    relaxation rounds — engine early-stop makes extra rounds no-ops;
    _check_unroll raises if the engine ever needs more)."""
    ctes = [f"""e AS MATERIALIZED (
            SELECT src, dst FROM ({SCC_EDGES_SQL}) aug)""",
            """reach(a, b) AS (
            SELECT src AS a, dst AS b FROM e
            UNION
            SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b)""",
            """mn AS (SELECT r1.a AS v, min(r1.b) AS mn
               FROM reach r1 JOIN reach r2
                 ON r1.a = r2.b AND r1.b = r2.a
               GROUP BY r1.a)""",
            """lab AS MATERIALIZED (
               SELECT d.doc_id AS v,
                      least(d.doc_id, coalesce(mn.mn, d.doc_id)) AS scc
               FROM documents d LEFT JOIN mn ON mn.v = d.doc_id)""",
            """ce AS MATERIALIZED (
               SELECT DISTINCT ls.scc AS f, ld.scc AS t
               FROM e JOIN lab ls ON ls.v = e.src
                      JOIN lab ld ON ld.v = e.dst
               WHERE ls.scc <> ld.scc)""",
            """l0 AS (SELECT DISTINCT scc AS v, 0::BIGINT AS layer
                      FROM lab)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
            SELECT l.v,
                   CASE WHEN m.mx IS NULL OR m.mx <= l.layer
                        THEN l.layer ELSE m.mx END AS layer
            FROM l{i - 1} l LEFT JOIN (
                 SELECT ce.t AS v, max(lp.layer) + 1 AS mx
                 FROM ce JOIN l{i - 1} lp ON lp.v = ce.f
                 GROUP BY ce.t) m ON m.v = l.v)""")
    return (f"WITH RECURSIVE {', '.join(ctes)} "
            f"SELECT v AS scc, layer FROM l{rounds} ORDER BY scc")


ORACLE_SQL["events_churn"] = """
    WITH uw AS (SELECT DISTINCT user_id,
                  (epoch_us(ts) // 86400000000)
                  - ((epoch_us(ts) // 86400000000) + 3) % 7 AS week
                FROM events)
    SELECT a.week AS week_day, count(*)::BIGINT AS active,
           count(b.user_id)::BIGINT AS retained,
           round((count(*) - count(b.user_id)) / count(*)::DOUBLE, 6)
               AS churn_rate
    FROM uw a LEFT JOIN uw b
      ON b.user_id = a.user_id AND b.week = a.week + 7
    GROUP BY a.week ORDER BY a.week
"""

from .windows import SMOOTH_ALPHA_NUM as _SMOOTH_A  # noqa: E402

ORACLE_SQL["events_smooth"] = f"""
    WITH RECURSIVE c AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    d AS (SELECT day, sum(cents) AS cents FROM c GROUP BY day),
    r AS (SELECT day, cents,
                 row_number() OVER (ORDER BY day) AS i FROM d),
    s(i, day, cents, val) AS (
        SELECT i, day, cents, cents / 100.0 FROM r WHERE i = 1
        UNION ALL
        SELECT r.i, r.day, r.cents,
               ({_SMOOTH_A} / 10.0) * (r.cents / 100.0)
               + (1.0 - {_SMOOTH_A} / 10.0) * s.val
        FROM s JOIN r ON r.i = s.i + 1)
    SELECT day, cents, round(val, 6) AS smoothed FROM s ORDER BY day
"""

ORACLE_SQL["text_zipf"] = f"""
    WITH t AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> '')) AS token
      FROM documents),
    c AS (SELECT token, count(*) AS n FROM t GROUP BY token),
    r AS (SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rnk,
                 n
          FROM c ORDER BY n DESC, token ASC LIMIT {TOP_ZIPF_K}),
    s AS (SELECT count(*)::DOUBLE AS k,
                 sum(ln(rnk::DOUBLE)) AS sx, sum(ln(n::DOUBLE)) AS sy,
                 sum(ln(rnk::DOUBLE) * ln(n::DOUBLE)) AS sxy,
                 sum(ln(rnk::DOUBLE) * ln(rnk::DOUBLE)) AS sxx
          FROM r)
    SELECT CAST(k AS BIGINT) AS k,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx)
                 / k, 6) AS intercept
    FROM s
"""

ORACLE_SQL["text_sentences"] = """
    WITH s AS (
      SELECT doc_id,
             list_filter(
                 list_transform(regexp_split_to_array(text, '[.!?]+'),
                                x -> trim(x, E' \\t\\n\\r')),
                 x -> x <> '') AS segs
      FROM documents)
    SELECT doc_id, length(segs)::BIGINT AS n_sentences,
           round(list_sum(list_transform(segs, x -> length(x)))::DOUBLE
                 / length(segs), 6) AS avg_len
    FROM s WHERE length(segs) > 0
"""

ORACLE_SQL["doc_toposort"] = _toposort_sql(TOPO_ROUNDS)

ORACLE_SQL["embed_recall"] = f"""
    WITH bf AS MATERIALIZED ({ORACLE_SQL["ann_topk"]}),
         iv AS MATERIALIZED ({ORACLE_SQL["ann_ivf"]})
    SELECT bf.query_id,
           round(count(iv.neighbor_id)::DOUBLE / {ANN_K}, 6) AS recall
    FROM bf LEFT JOIN iv
      ON iv.query_id = bf.query_id AND iv.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""

QUERIES["events_churn"] = q_events_churn
QUERIES["events_smooth"] = q_events_smooth
QUERIES["text_zipf"] = q_text_zipf
QUERIES["text_sentences"] = q_text_sentences
QUERIES["doc_toposort"] = q_doc_toposort
QUERIES["embed_recall"] = q_embed_recall


def q_doc_dag_paths(sf_dir):
    """Source-path counts on the SCC condensation DAG
    (algos/dagpaths.DagPathsProgram, add-combine wave propagation):
    n_paths(c) = distinct source→c paths — the provenance/fan-in
    multiplicity a scheduling or lineage pass reads off the component
    graph.  Same driver relabel + engine shape as q_doc_toposort;
    isolated components are trivial sources (1 path)."""
    from .algos import strongly_connected_components
    from .algos.dagpaths import dag_path_counts
    from .graph import load_directed
    from .io import from_pandas_clean

    cond = q_doc_condensation(sf_dir)
    eng = documents_engine(sf_dir, "scc")
    strongly_connected_components(eng)
    all_sccs = np.sort(np.asarray(
        eng.state_dataset(["scc"]).unique("scc"), dtype=np.int64))
    total = np.ones(len(all_sccs), np.int64)
    if len(cond):
        f = cond["from_scc"].to_numpy(np.int64)
        t = cond["to_scc"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([f, t]))
        src_d = np.searchsorted(nodes, f)
        dst_d = np.searchsorted(nodes, t)
        sources = np.setdiff1d(np.arange(len(nodes), dtype=np.int64),
                               np.unique(dst_d))
        edges = from_pandas_clean(pd.DataFrame({"src": src_d,
                                                "dst": dst_d}))
        eng2 = load_directed(edges, len(nodes), num_partitions=2,
                             store_dir=_store_root(sf_dir, "dagp"),
                             fingerprint=_input_fingerprint(sf_dir))
        try:
            rep = dag_path_counts(eng2, sources,
                                  max_steps=TOPO_ROUNDS + 2)
            _check_unroll(rep, TOPO_ROUNDS, "doc_dag_paths")
            st = eng2.state_dataset(["total"]).to_pandas()
        finally:
            eng2.shutdown()
        pos = np.searchsorted(all_sccs, nodes[st["v"].to_numpy(np.int64)])
        # float64 engine state is exact below 2^53 — cast back to int
        total[pos] = np.rint(st["total"].to_numpy(np.float64)) \
            .astype(np.int64)
    return pd.DataFrame({"scc": all_sccs, "n_paths": total})


def q_dedup_lsh_recall(sf_dir):
    """Near-dup index health check: recall of the MinHash-LSH verified
    pairs (dedup_minhash, threshold 0.5) against the exact
    inverted-index Jaccard pairs (dedup_jaccard, same threshold, df-cap
    64) — the per-build quality report a 100-TB dedup run logs.
    Composes the two oracle-checked operators; the join runs over
    pair-table-sized frames."""
    mh = q_dedup_minhash(sf_dir)
    if not isinstance(mh, pd.DataFrame):
        mh = mh.to_pandas()
    ex = q_dedup_jaccard(sf_dir)[["a", "b"]]
    hit = mh.merge(ex, on=["a", "b"], how="inner")
    return pd.DataFrame({
        "n_exact": np.array([len(ex)], np.int64),
        "n_lsh": np.array([len(mh)], np.int64),
        "n_hit": np.array([len(hit)], np.int64),
        "recall": [round(len(hit) / len(ex), 6)]})


def q_embed_norms(sf_dir):
    """Embedding L2-norm summary (one row): n, mean, min, max of the
    per-vector norms — map-side (n, sum, min, max) partials merged on
    the driver, the standard pre-index sanity stats."""
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["embedding"])

    def part(b: pa.Table) -> pa.Table:
        m = np.vstack(b["embedding"].to_pandas().to_numpy()) \
            .astype(np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        return pa.table({"n": pa.array([len(nrm)]),
                         "s": pa.array([float(nrm.sum())]),
                         "mn": pa.array([float(nrm.min())]),
                         "mx": pa.array([float(nrm.max())])})

    parts = emb.map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    return pd.DataFrame({
        "n": np.array([n], np.int64),
        "avg_norm": [round(float(parts["s"].sum()) / n, 6)],
        "min_norm": [round(float(parts["mn"].min()), 6)],
        "max_norm": [round(float(parts["mx"].max()), 6)]})


def _dagpaths_sql(rounds: int) -> str:
    """Unrolled wave-propagation twin of q_doc_dag_paths: the
    condensation CTEs, p_0 = 1 on non-target components, then `rounds`
    rounds of p_k = per-target sums with a running total."""
    ctes = [f"""e AS MATERIALIZED (
            SELECT src, dst FROM ({SCC_EDGES_SQL}) aug)""",
            """reach(a, b) AS (
            SELECT src AS a, dst AS b FROM e
            UNION
            SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b)""",
            """mn AS (SELECT r1.a AS v, min(r1.b) AS mn
               FROM reach r1 JOIN reach r2
                 ON r1.a = r2.b AND r1.b = r2.a
               GROUP BY r1.a)""",
            """lab AS MATERIALIZED (
               SELECT d.doc_id AS v,
                      least(d.doc_id, coalesce(mn.mn, d.doc_id)) AS scc
               FROM documents d LEFT JOIN mn ON mn.v = d.doc_id)""",
            """ce AS MATERIALIZED (
               SELECT DISTINCT ls.scc AS f, ld.scc AS t
               FROM e JOIN lab ls ON ls.v = e.src
                      JOIN lab ld ON ld.v = e.dst
               WHERE ls.scc <> ld.scc)""",
            """sc AS MATERIALIZED (SELECT DISTINCT scc FROM lab)""",
            """p0 AS (SELECT scc AS v, 1::BIGINT AS p FROM sc
                      WHERE scc NOT IN (SELECT t FROM ce))""",
            """t0 AS (SELECT v, p AS total FROM p0)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
            SELECT ce.t AS v, sum(lp.p) AS p
            FROM ce JOIN p{i - 1} lp ON lp.v = ce.f GROUP BY ce.t)""")
        ctes.append(f"""t{i} AS MATERIALIZED (
            SELECT coalesce(t.v, p.v) AS v,
                   coalesce(t.total, 0) + coalesce(p.p, 0) AS total
            FROM t{i - 1} t FULL JOIN p{i} p ON p.v = t.v)""")
    return (f"WITH RECURSIVE {', '.join(ctes)} "
            f"SELECT sc.scc, coalesce(t.total, 0)::BIGINT AS n_paths "
            f"FROM sc LEFT JOIN t{rounds} t ON t.v = sc.scc "
            f"ORDER BY scc")


ORACLE_SQL["doc_dag_paths"] = _dagpaths_sql(TOPO_ROUNDS)

ORACLE_SQL["dedup_lsh_recall"] = f"""
    WITH mh AS MATERIALIZED ({ORACLE_SQL["dedup_minhash"]}),
         ex AS MATERIALIZED ({ORACLE_SQL["dedup_jaccard"]}),
         h AS (SELECT count(*) AS n_hit
               FROM mh JOIN ex ON ex.a = mh.a AND ex.b = mh.b)
    SELECT (SELECT count(*) FROM ex)::BIGINT AS n_exact,
           (SELECT count(*) FROM mh)::BIGINT AS n_lsh,
           h.n_hit::BIGINT AS n_hit,
           round(h.n_hit / (SELECT count(*) FROM ex)::DOUBLE, 6)
               AS recall
    FROM h
"""

ORACLE_SQL["embed_norms"] = """
    WITH n AS (SELECT sqrt(list_sum(list_transform(
                   CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
               FROM embeddings)
    SELECT count(*)::BIGINT AS n,
           round(sum(nrm) / count(*), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm
    FROM n
"""

QUERIES["doc_dag_paths"] = q_doc_dag_paths
QUERIES["dedup_lsh_recall"] = q_dedup_lsh_recall
QUERIES["embed_norms"] = q_embed_norms


SWEEP_K = 100


def q_doc_ppr_sweep(sf_dir):
    """Local community detection by PPR sweep cut (the
    Andersen-Chung-Lang shape): order the PPR support by rank/degree,
    sweep prefixes S_k on the undirected doc graph, and report each
    prefix's cut, volume and conductance.  Everything is built ON TOP
    of the round-9 PPR output (already hash-matched by doc_ppr), so
    ordering and conductances are bit-identical cross-engine.  Scale
    shape: the support is seed-local (not |V|), degrees and incident
    edges are fetched via broadcast filters, and the sweep itself is
    O(vol(prefix)) driver work — the classic local-algorithm contract."""
    from .algos import personalized_pagerank
    from .edges import degree_table, symmetrize

    eng = documents_engine(sf_dir, "directed")
    personalized_pagerank(eng, sources=PPR_SOURCES, iterations=PPR_ITERS)
    ranks = _state_result(eng, "rank", "rank", round_to=9)
    sup = ranks.map_batches(
        lambda b: b.filter(pc.greater(b["rank"], 0.0)),
        batch_format="pyarrow").to_pandas()
    edges = documents_edges(sf_dir)
    m = edges.count()

    import ray

    sup_ids = np.sort(sup["v"].to_numpy(np.int64))
    sup_ref = ray.put(sup_ids)

    def filt(b: pa.Table) -> pa.Table:
        want = ray.get(sup_ref)
        v = b["v"].to_numpy(zero_copy_only=False)
        if len(want) == 0:
            return b.slice(0, 0)
        pos = np.minimum(np.searchsorted(want, v), len(want) - 1)
        return b.filter(pa.array(want[pos] == v))

    degs = degree_table(symmetrize(edges), "src") \
        .map_batches(filt, batch_format="pyarrow").to_pandas()
    sc = sup.merge(degs, on="v", how="inner")
    if len(sc) == 0:
        return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                             "v": pd.Series([], dtype=np.int64),
                             "cut": pd.Series([], dtype=np.int64),
                             "vol": pd.Series([], dtype=np.int64),
                             "conductance": pd.Series([], dtype=float)})
    score = sc["rank"].to_numpy(np.float64) / sc["degree"].to_numpy(np.float64)
    order = np.lexsort((sc["v"].to_numpy(np.int64), -score))[:SWEEP_K]
    ov = sc["v"].to_numpy(np.int64)[order]
    od = sc["degree"].to_numpy(np.int64)[order]
    K = len(ov)

    INF = 10 ** 9
    osort = np.argsort(ov)
    ov_sorted, pos_sorted = ov[osort], (np.arange(K, dtype=np.int64) + 1)[osort]
    pos_ref = ray.put((ov_sorted, pos_sorted))

    def inc(b: pa.Table) -> pa.Table:
        ids, ps = ray.get(pos_ref)

        def look(x):
            j = np.minimum(np.searchsorted(ids, x), len(ids) - 1)
            return np.where(ids[j] == x, ps[j], INF).astype(np.int64)

        p1 = look(b["src"].to_numpy(zero_copy_only=False))
        p2 = look(b["dst"].to_numpy(zero_copy_only=False))
        keep = (p1 < INF) | (p2 < INF)
        return pa.table({"p1": pa.array(p1[keep]),
                         "p2": pa.array(p2[keep])})

    ep = edges.map_batches(inc, batch_format="pyarrow").to_pandas()
    lo = np.minimum(ep["p1"].to_numpy(np.int64), ep["p2"].to_numpy(np.int64))
    hi = np.maximum(ep["p1"].to_numpy(np.int64), ep["p2"].to_numpy(np.int64))
    diff = np.zeros(K + 2, np.int64)
    ml = lo <= K
    np.add.at(diff, lo[ml], 1)
    mh = hi <= K
    np.add.at(diff, hi[mh], -1)
    cut = np.cumsum(diff)[1:K + 1]
    vol = np.cumsum(od)
    other = 2 * m - vol
    denom = np.minimum(vol, other)
    keep = denom > 0
    k_idx = np.arange(1, K + 1, dtype=np.int64)
    return pd.DataFrame({
        "k": k_idx[keep], "v": ov[keep], "cut": cut[keep],
        "vol": vol[keep],
        "conductance": np.round(cut[keep] / denom[keep].astype(np.float64),
                                6)})


ORACLE_SQL["doc_ppr_sweep"] = f"""
    WITH ppr AS MATERIALIZED ({_ppr_sql(PPR_ITERS, 9, PPR_SOURCES)}),
    e AS MATERIALIZED ({DOC_EDGES_SQL}),
    deg AS (SELECT v, count(*)::BIGINT AS d FROM (
              SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
            GROUP BY v),
    mm AS (SELECT count(*)::BIGINT AS m FROM e),
    sc AS (SELECT ppr.v, ppr.rank / deg.d AS score, deg.d
           FROM ppr JOIN deg ON deg.v = ppr.v WHERE ppr.rank > 0),
    ordk AS (SELECT v, d, pos FROM (
               SELECT v, d, row_number() OVER
                 (ORDER BY score DESC, v ASC) AS pos FROM sc)
             WHERE pos <= {SWEEP_K}),
    vol AS (SELECT pos, v, sum(d) OVER (ORDER BY pos)::BIGINT AS vol
            FROM ordk),
    ep AS (SELECT coalesce(pa.pos, 1000000000) AS p1,
                  coalesce(pb.pos, 1000000000) AS p2
           FROM e LEFT JOIN ordk pa ON pa.v = e.src
                  LEFT JOIN ordk pb ON pb.v = e.dst)
    SELECT vol.pos AS k, vol.v,
           (SELECT count(*) FROM ep
            WHERE least(p1, p2) <= vol.pos
              AND greatest(p1, p2) > vol.pos)::BIGINT AS cut,
           vol.vol,
           round((SELECT count(*) FROM ep
                  WHERE least(p1, p2) <= vol.pos
                    AND greatest(p1, p2) > vol.pos)
                 / least(vol.vol, 2 * mm.m - vol.vol)::DOUBLE, 6)
               AS conductance
    FROM vol, mm
    WHERE least(vol.vol, 2 * mm.m - vol.vol) > 0
    ORDER BY k
"""

QUERIES["doc_ppr_sweep"] = q_doc_ppr_sweep


AUTOCORR_LAGS = 7
RICH_CLUB_TS = [1, 2, 4, 8, 16]


def q_events_autocorr(sf_dir):
    """Lag-k autocorrelation (k = 1..7) of the daily revenue series:
    r_k = sum((x_i - mean)(x_{i-k} - mean)) / sum((x_i - mean)^2) over
    the day-ordered series.  Day sums are exact integer cents from
    map-side partials (the daily_smooth shape); the correlation runs
    over the calendar-bounded series with the identical float shape as
    the SQL LAG twin.  Returns (lag, r) rounded to 6."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day", sort=True)["cents"].sum()
    x = d.to_numpy(np.int64) / 100.0
    n = len(x)
    mean = float(x.sum()) / n
    dev = x - mean
    den = float((dev * dev).sum())
    rows = []
    for k in range(1, AUTOCORR_LAGS + 1):
        if k >= n or den == 0.0:
            break
        rows.append((k, round(float((dev[k:] * dev[:-k]).sum()) / den, 6)))
    return pd.DataFrame(rows, columns=["lag", "r"]) \
        .astype({"lag": np.int64})


def q_doc_rich_club(sf_dir):
    """Rich-club coefficient of the undirected doc graph: for each
    degree threshold t, phi(t) = 2*E_t / (N_t*(N_t-1)) where N_t =
    nodes with degree > t and E_t = edges with BOTH endpoints above t.
    Degrees attach to edge endpoints via the gated lookup join
    (broadcast under cap, coarse-bucket co-group above); threshold
    counts come back as map-side partials.  Rows with N_t < 2 are
    dropped (phi undefined)."""
    from .edges import degree_table, symmetrize
    from .joins import attach_by_key

    edges = documents_edges(sf_dir).materialize()
    deg = degree_table(symmetrize(edges), "src")

    ts = np.array(RICH_CLUB_TS, np.int64)

    def node_part(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        return pa.table({"t": pa.array(ts),
                         "n": pa.array((d[None, :] > ts[:, None])
                                       .sum(axis=1).astype(np.int64))})

    nparts = deg.map_batches(node_part, batch_format="pyarrow").to_pandas()
    n_t = nparts.groupby("t", sort=True)["n"].sum()

    tagged = attach_by_key(edges, deg, ["src", "dst"],
                           key="v", value="degree")

    def edge_part(b: pa.Table) -> pa.Table:
        a = b["degree_src"].to_numpy(zero_copy_only=False)
        c = b["degree_dst"].to_numpy(zero_copy_only=False)
        both = np.minimum(a, c)
        return pa.table({"t": pa.array(ts),
                         "e": pa.array((both[None, :] > ts[:, None])
                                       .sum(axis=1).astype(np.int64))})

    eparts = tagged.map_batches(edge_part, batch_format="pyarrow") \
        .to_pandas()
    e_t = eparts.groupby("t", sort=True)["e"].sum()
    nn = n_t.to_numpy(np.int64)
    ee = e_t.reindex(n_t.index, fill_value=0).to_numpy(np.int64)
    keep = nn >= 2
    return pd.DataFrame({
        "t": n_t.index.to_numpy(np.int64)[keep],
        "n_nodes": nn[keep], "n_edges": ee[keep],
        "phi": np.round(2.0 * ee[keep] / (nn[keep].astype(np.float64)
                                          * (nn[keep] - 1)), 6)})


ORACLE_SQL["events_autocorr"] = f"""
    WITH c AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events),
    d AS (SELECT day, sum(cents) / 100.0 AS x FROM c GROUP BY day),
    st AS (SELECT sum(x) / count(*) AS mean FROM d),
    ks AS (SELECT unnest(range(1, {AUTOCORR_LAGS + 1})) AS lag),
    l AS (SELECT ks.lag, d.day, d.x,
                 lag(d.x, ks.lag) OVER (PARTITION BY ks.lag
                                        ORDER BY d.day) AS xl
          FROM d CROSS JOIN ks),
    den AS (SELECT sum((x - mean) * (x - mean)) AS den FROM d, st)
    SELECT l.lag::BIGINT AS lag,
           round(sum((l.x - st.mean) * (l.xl - st.mean)) / den.den, 6)
               AS r
    FROM l, st, den
    WHERE l.xl IS NOT NULL AND den.den <> 0
    GROUP BY l.lag, den.den ORDER BY lag
"""

ORACLE_SQL["doc_rich_club"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    deg AS (SELECT v, count(*)::BIGINT AS d FROM (
              SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
            GROUP BY v),
    ts AS (SELECT unnest([{', '.join(map(str, RICH_CLUB_TS))}]) AS t),
    n AS (SELECT ts.t, count(*)::BIGINT AS n_nodes
          FROM ts JOIN deg ON deg.d > ts.t GROUP BY ts.t),
    ee AS (SELECT ts.t, count(*)::BIGINT AS n_edges
           FROM ts JOIN (
                SELECT least(ds.d, dd.d) AS mind
                FROM e JOIN deg ds ON ds.v = e.src
                       JOIN deg dd ON dd.v = e.dst) x
             ON x.mind > ts.t
           GROUP BY ts.t)
    SELECT n.t::BIGINT AS t, n.n_nodes,
           coalesce(ee.n_edges, 0)::BIGINT AS n_edges,
           round(2.0 * coalesce(ee.n_edges, 0)
                 / (n.n_nodes * (n.n_nodes - 1.0)), 6) AS phi
    FROM n LEFT JOIN ee ON ee.t = n.t
    WHERE n.n_nodes >= 2 ORDER BY t
"""

QUERIES["events_autocorr"] = q_events_autocorr
QUERIES["doc_rich_club"] = q_doc_rich_club


# ---------------------------------------------------------------------------
# Round-3 continuation wave 12: bipartiteness, degree-correlation curve,
# TPC-H Q22-like global sales opportunity
# ---------------------------------------------------------------------------

PARITY_ROUNDS = 20


def q_doc_bipartite(sf_dir):
    """Bipartiteness summary of the undirected doc graph in ONE
    superstep program (algos/bipartite.py): packed (label, level)
    min-relaxation gives CC labels AND BFS parities together.  Root
    count (label == v, level == 0) comes back as map-side partials;
    conflict edges (equal endpoint parity on a canonical edge) are
    found by attaching the packed state to both edge endpoints via the
    gated lookup join, with per-batch unique-label partials merged on
    the driver (bounded by the number of odd components, not |V|)."""
    from .algos.bipartite import LEVEL_MOD, parity_cc
    from .joins import attach_by_key

    eng = documents_engine(sf_dir, "undirected")
    rep = parity_cc(eng)
    _check_unroll(rep, PARITY_ROUNDS, "doc_bipartite")
    packed = _state_result(eng, "packed", "packed").materialize()

    def root_part(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["packed"].to_numpy(zero_copy_only=False)
        # component roots keep their init state: label == v, level == 0
        return pa.table({"n": pa.array([int((p == v * LEVEL_MOD).sum())],
                                       pa.int64())})

    n_components = int(packed.map_batches(
        root_part, batch_format="pyarrow").to_pandas()["n"].sum())

    edges = documents_edges(sf_dir)
    tagged = attach_by_key(edges, packed, ["src", "dst"],
                           key="v", value="packed")

    def conf_part(b: pa.Table) -> pa.Table:
        ps = b["packed_src"].to_numpy(zero_copy_only=False)
        pd_ = b["packed_dst"].to_numpy(zero_copy_only=False)
        m = (ps % LEVEL_MOD) % 2 == (pd_ % LEVEL_MOD) % 2
        lab, cnt = np.unique(ps[m] // LEVEL_MOD, return_counts=True)
        return pa.table({"lab": pa.array(lab.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    conf = tagged.map_batches(conf_part, batch_format="pyarrow") \
        .to_pandas()
    n_conflicts = int(conf["n"].sum())
    n_odd = int(conf["lab"].nunique())
    return pd.DataFrame({
        "n_components": [n_components],
        "n_bipartite": [n_components - n_odd],
        "n_odd": [n_odd],
        "n_conflict_edges": [n_conflicts]})


def _parity_sql(rounds: int) -> str:
    from .algos.bipartite import LEVEL_MOD
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"p0 AS MATERIALIZED (SELECT v, v * {LEVEL_MOD} AS pk FROM allv)"]
    for i in range(1, rounds + 1):
        p = f"p{i - 1}"
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT allv.v, least({p}.pk, "
            f"coalesce(m.pk, {p}.pk)) AS pk FROM allv JOIN {p} USING (v) "
            f"LEFT JOIN (SELECT sym.dst AS v, min({p}.pk) + 1 AS pk "
            f"FROM sym JOIN {p} ON {p}.v = sym.src GROUP BY sym.dst) m "
            f"USING (v))")
    ctes.append(
        f"fin AS MATERIALIZED (SELECT v, pk // {LEVEL_MOD} AS label, "
        f"(pk % {LEVEL_MOD}) % 2 AS par FROM p{rounds})")
    ctes.append(f"e AS MATERIALIZED ({DOC_EDGES_SQL})")
    ctes.append(
        "conf AS (SELECT fs.label FROM e "
        "JOIN fin fs ON fs.v = e.src JOIN fin fd ON fd.v = e.dst "
        "WHERE fs.par = fd.par)")
    return (f"WITH {', '.join(ctes)} SELECT "
            "(SELECT count(*) FROM fin WHERE label = v)::BIGINT "
            "AS n_components, "
            "((SELECT count(*) FROM fin WHERE label = v) - "
            "(SELECT count(DISTINCT label) FROM conf))::BIGINT "
            "AS n_bipartite, "
            "(SELECT count(DISTINCT label) FROM conf)::BIGINT AS n_odd, "
            "(SELECT count(*) FROM conf)::BIGINT AS n_conflict_edges")


ORACLE_SQL["doc_bipartite"] = _parity_sql(PARITY_ROUNDS)
QUERIES["doc_bipartite"] = q_doc_bipartite


def q_doc_knn_degree(sf_dir):
    """Degree-correlation curve knn(k): the mean average-neighbor-degree
    over nodes of degree k.  Because 1/k is constant within a degree
    class, the per-node averaging folds into per-class sums —
    knn(k) = (sum over symmetric edges with deg(src)=k of deg(dst))
    / (k * n_k) — so NO per-vertex aggregation is needed: degrees
    attach to the canonical edges via the gated lookup join and both
    the edge sums and the class sizes come back as map-side partials
    keyed by the (small) degree domain."""
    from .edges import degree_table, symmetrize
    from .joins import attach_by_key

    edges = documents_edges(sf_dir).materialize()
    deg = degree_table(symmetrize(edges), "src")
    tagged = attach_by_key(edges, deg, ["src", "dst"],
                           key="v", value="degree")

    def edge_part(b: pa.Table) -> pa.Table:
        a = b["degree_src"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = b["degree_dst"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # each canonical edge contributes in both directions
        k = np.concatenate([a, c])
        nd = np.concatenate([c, a])
        u, inv = np.unique(k, return_inverse=True)
        return pa.table({"k": pa.array(u),
                         "s": pa.array(np.bincount(inv, weights=nd)
                                       .astype(np.int64))})

    sums = tagged.map_batches(edge_part, batch_format="pyarrow") \
        .to_pandas().groupby("k", sort=True)["s"].sum()

    def nk_part(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"k": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    nk = deg.map_batches(nk_part, batch_format="pyarrow") \
        .to_pandas().groupby("k", sort=True)["n"].sum()
    k = nk.index.to_numpy(np.int64)
    n = nk.to_numpy(np.int64)
    s = sums.reindex(nk.index, fill_value=0).to_numpy(np.int64)
    return pd.DataFrame({
        "k": k, "n_nodes": n,
        "knn": np.round(s / (k.astype(np.float64) * n), 6)})


ORACLE_SQL["doc_knn_degree"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e
            UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT v, count(*)::BIGINT AS d FROM (
              SELECT src AS v FROM sym) GROUP BY v),
    nk AS (SELECT d AS k, count(*)::BIGINT AS n_nodes
           FROM deg GROUP BY d),
    es AS (SELECT ds.d AS k, sum(dd.d)::BIGINT AS s
           FROM sym JOIN deg ds ON ds.v = sym.src
                    JOIN deg dd ON dd.v = sym.dst
           GROUP BY ds.d)
    SELECT nk.k, nk.n_nodes,
           round(coalesce(es.s, 0) / (nk.k * 1.0 * nk.n_nodes), 6)
               AS knn
    FROM nk LEFT JOIN es ON es.k = nk.k ORDER BY nk.k
"""
QUERIES["doc_knn_degree"] = q_doc_knn_degree


def q_tpch_global_sales(sf_dir):
    """TPC-H Q22 shape — see relational.global_sales_opportunity."""
    return _REL.global_sales_opportunity(sf_dir)


ORACLE_SQL["tpch_global_sales"] = _REL.GLOBAL_SALES_SQL
QUERIES["tpch_global_sales"] = q_tpch_global_sales


# ----------------------------------------------------------- TextRank

TEXTRANK_VOCAB = 250
TEXTRANK_ITERS = 10
TEXTRANK_K = 25


def q_text_keywords(sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank on the word co-occurrence graph — the superstep engine
    over a DERIVED vertex space (corpus vocabulary), not doc_ids.

    Scale shape: vocabulary = top-V tokens by (count DESC, token) via
    the map-side value_counts combiner + distinct-token groupby +
    partial top-k (the q_text_top_tokens pattern) — V is a fixed cap,
    so the word->id map broadcasts once; co-occurrence pairs (adjacent
    tokens, both in vocab) come back as packed-code map-side partials
    over the V^2-bounded domain; the weighted graph (pair count =
    edge weight, symmetrized) runs WeightedPageRankProgram for 10
    supersteps.  Oracle: the same vocabulary/pair SQL under the
    _wpagerank_sql unrolled recurrence over the derived edges."""
    import ray

    from .algos.pagerank import weighted_pagerank
    from .graph import load_directed, suggest_partitions
    from .io import from_pandas_clean

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def tok_partial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        vc = toks[toks.to_numpy(object) != ""].value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = docs.map_batches(tok_partial, batch_format="pyarrow") \
        .groupby("token").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(TEXTRANK_VOCAB)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    vocab = (counts.map_batches(local_top, batch_format="pyarrow")
             .to_pandas()
             .sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(TEXTRANK_VOCAB)
             .reset_index(drop=True))
    words = vocab["token"].to_numpy(object)
    nv = len(words)
    vref = ray.put(pd.Index(words))

    def pair_partial(b: pa.Table) -> pa.Table:
        vi = ray.get(vref)
        lists = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = toks.to_numpy(object) != ""
        toks, par = toks[ok].reset_index(drop=True), par[ok]
        if len(par) < 2:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ids = vi.get_indexer(toks)
        a, c = ids[:-1], ids[1:]
        m = (par[:-1] == par[1:]) & (a >= 0) & (c >= 0) & (a != c)
        u = np.minimum(a[m], c[m]).astype(np.int64)
        v = np.maximum(a[m], c[m]).astype(np.int64)
        code, cnt = np.unique(u * nv + v, return_counts=True)
        return pa.table({"code": pa.array(code),
                         "n": pa.array(cnt.astype(np.int64))})

    pairs = docs.map_batches(pair_partial, batch_format="pyarrow") \
        .to_pandas().groupby("code", sort=True)["n"].sum()
    code = pairs.index.to_numpy(np.int64)
    wt = pairs.to_numpy(np.int64).astype(np.float64)
    u, v = code // nv, code % nv
    edges = from_pandas_clean(pd.DataFrame({
        "src": np.concatenate([u, v]),
        "dst": np.concatenate([v, u]),
        "weight": np.concatenate([wt, wt])}))

    eng = load_directed(edges, nv, suggest_partitions(2 * len(code), 4),
                        _store_root(sf_dir, "textrank"), weighted=True,
                        fingerprint=f"tr:{_input_fingerprint(sf_dir)}")
    weighted_pagerank(eng, iterations=TEXTRANK_ITERS)
    ranks = eng.state_pandas(["rank"])  # V-sized: driver-small by cap
    out = pd.DataFrame({"word": words[ranks["v"].to_numpy(np.int64)],
                        "rank": np.round(ranks["rank"].to_numpy(), 6)})
    return (out.sort_values(["rank", "word"], ascending=[False, True],
                            kind="mergesort").head(TEXTRANK_K)
            .reset_index(drop=True))


def _textrank_sql(iters: int) -> str:
    ctes = [
        ("wl AS (SELECT doc_id, list_filter(regexp_split_to_array("
         "text, '\\s+'), x -> x <> '') AS l FROM documents)"),
        ("wds AS MATERIALIZED (SELECT doc_id, unnest(l) AS w, "
         "generate_subscripts(l, 1) AS i FROM wl)"),
        "wc AS (SELECT w, count(*)::BIGINT AS n FROM wds GROUP BY w)",
        (f"voc AS MATERIALIZED (SELECT w, row_number() OVER "
         f"(ORDER BY n DESC, w) - 1 AS id FROM wc "
         f"ORDER BY n DESC, w LIMIT {TEXTRANK_VOCAB})"),
        ("big AS (SELECT a.id AS u, b.id AS vv FROM "
         "(SELECT doc_id, w, lead(w) OVER (PARTITION BY doc_id "
         "ORDER BY i) AS w2 FROM wds) p "
         "JOIN voc a ON a.w = p.w JOIN voc b ON b.w = p.w2 "
         "WHERE p.w2 IS NOT NULL)"),
        ("ce AS (SELECT least(u, vv) AS src, greatest(u, vv) AS dst, "
         "count(*)::DOUBLE AS wt FROM big WHERE u <> vv GROUP BY 1, 2)"),
        ("e AS MATERIALIZED (SELECT src, dst, wt FROM ce UNION ALL "
         "SELECT dst AS src, src AS dst, wt FROM ce)"),
        ("outw AS MATERIALIZED (SELECT src AS v, sum(wt) AS ow "
         "FROM e GROUP BY src)"),
        "allv AS (SELECT id AS v FROM voc)",
        ("c0 AS (SELECT allv.v, CASE WHEN coalesce(ow, 0) > 0 "
         "THEN 1.0/ow ELSE 1.0 END AS r FROM allv "
         "LEFT JOIN outw USING (v))")]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT e.dst AS v, "
            f"sum({prev}.r * e.wt) AS sm FROM e "
            f"JOIN {prev} ON {prev}.v = e.src GROUP BY e.dst)")
        ctes.append(
            f"raw{i} AS MATERIALIZED (SELECT allv.v, "
            f"0.15 + 0.85 * coalesce(sm, 0.0) AS r "
            f"FROM allv LEFT JOIN s{i} USING (v))")
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT raw{i}.v, "
            f"CASE WHEN coalesce(ow, 0) > 0 THEN r/ow ELSE r END AS r "
            f"FROM raw{i} LEFT JOIN outw USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT voc.w AS word, round(raw{iters}.r, 6) AS rank "
            f"FROM raw{iters} JOIN voc ON voc.id = raw{iters}.v "
            f"ORDER BY rank DESC, word LIMIT {TEXTRANK_K}")


ORACLE_SQL["text_keywords"] = _textrank_sql(TEXTRANK_ITERS)
QUERIES["text_keywords"] = q_text_keywords


# ------------------------------------------------- seeded label spread

LS_ROUNDS = 10
LS_SEED_MOD = 20


def q_doc_label_spread(sf_dir):
    """Semi-supervised label spreading (algos/labelspread.py): trusted
    language labels on the 5% seed set (doc_id % 20 == 0) spread over
    the undirected doc graph; unlabeled vertices adopt the most
    frequent labeled neighbor label (min tie-break), seeds clamped.

    Scale shape: the lang catalog (bounded) maps lang -> dense code;
    the (v, label) seed table is DERIVED DISTRIBUTED and written as
    parquet that each shard slice-reads in init_state (no driver
    broadcast of per-vertex data).  Oracle: _labelspread_sql — the
    seeded histogram recurrence unrolled LS_ROUNDS times."""
    from .algos.labelspread import label_spread

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang"])

    def lang_part(b: pa.Table) -> pa.Table:
        return pa.table({"lang": pa.array(
            np.unique(np.asarray(b["lang"].to_pylist(), object)),
            pa.string())})

    langs = np.unique(docs.map_batches(lang_part, batch_format="pyarrow")
                      .to_pandas()["lang"].to_numpy(object))
    code = {l: i for i, l in enumerate(langs)}

    def seed_part(b: pa.Table) -> pa.Table:
        v = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = v % LS_SEED_MOD == 0
        lab = np.array([code[x] for x in
                        np.asarray(b["lang"].to_pylist(), object)[m]],
                       np.int64)
        return pa.table({"v": pa.array(v[m]), "label": pa.array(lab)})

    seed_path = os.path.join(_store_root(sf_dir, "seedlab"), "seeds")
    docs.map_batches(seed_part, batch_format="pyarrow") \
        .write_parquet(seed_path, mode="overwrite")

    eng = documents_engine(sf_dir, "undirected")
    rep = label_spread(eng, seed_path, max_iters=LS_ROUNDS)
    _check_unroll(rep, LS_ROUNDS, "doc_label_spread")
    return _state_result(eng, "label", "label")


def _labelspread_sql(rounds: int) -> str:
    ctes = [
        f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
        "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
        ("langs AS (SELECT lang, row_number() OVER (ORDER BY lang) - 1 "
         "AS code FROM (SELECT DISTINCT lang FROM documents))"),
        (f"seeds AS MATERIALIZED (SELECT doc_id AS v, code AS lab "
         f"FROM documents JOIN langs USING (lang) "
         f"WHERE doc_id % {LS_SEED_MOD} = 0)"),
        ("l0 AS MATERIALIZED (SELECT allv.v, coalesce(seeds.lab, -1) "
         "AS lab FROM allv LEFT JOIN seeds USING (v))")]
    for i in range(1, rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT v, lab FROM ("
            f"SELECT sym.dst AS v, {p}.lab AS lab, "
            f"row_number() OVER (PARTITION BY sym.dst "
            f"ORDER BY count(*) DESC, {p}.lab ASC) AS rn "
            f"FROM sym JOIN {p} ON {p}.v = sym.src "
            f"WHERE {p}.lab <> -1 GROUP BY sym.dst, {p}.lab) "
            f"WHERE rn = 1)")
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, "
            f"CASE WHEN seeds.v IS NOT NULL THEN {p}.lab "
            f"ELSE coalesce(w{i}.lab, {p}.lab) END AS lab "
            f"FROM allv JOIN {p} USING (v) LEFT JOIN w{i} USING (v) "
            f"LEFT JOIN seeds ON seeds.v = allv.v)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, lab AS label FROM l{rounds}")


ORACLE_SQL["doc_label_spread"] = _labelspread_sql(LS_ROUNDS)
QUERIES["doc_label_spread"] = q_doc_label_spread


def q_tpch_min_cost(sf_dir):
    """TPC-H Q2 shape — see relational.min_cost_supplier."""
    return _REL.min_cost_supplier(sf_dir)


ORACLE_SQL["tpch_min_cost"] = _REL.MIN_COST_SQL
QUERIES["tpch_min_cost"] = q_tpch_min_cost


# ---------------------------------------------------- graph coarsening

def q_doc_coarsen(sf_dir):
    """Graph coarsening by maximal-matching contraction — the
    multilevel-partitioner primitive (METIS-style): matched pairs
    collapse into their min endpoint, surviving edges relabel through
    the representative map and merge with multiplicity as the coarse
    edge weight (self-loops drop).

    Scale shape: the matching is the locally-dominant superstep
    (algos/matching.py); the rep map is a SPARSE override attached via
    the gated lookup join (missing="self"); coarse-edge merging is the
    canonical coarse-bucket shuffle + vectorized in-bucket count —
    never a per-edge-key hash aggregate."""
    from .algos.matching import maximal_matching
    from .algos.triangles import n_buckets_for
    from .io import from_pandas_clean
    from .joins import attach_by_key

    edges = documents_edges(sf_dir).materialize()
    n = documents_n_vertices(sf_dir)
    w = edges.map_batches(
        lambda b: pa.table({"u": b["src"], "v": b["dst"]}),
        batch_format="pyarrow")
    m = maximal_matching(w, n)
    repmap = from_pandas_clean(pd.DataFrame({
        "v": m["v"].to_numpy(np.int64),
        "rep": m["u"].to_numpy(np.int64)}))
    tagged = attach_by_key(edges, repmap, ["src", "dst"],
                           key="v", value="rep", missing="self")
    nb = n_buckets_for(edges.count())

    def relabel(b: pa.Table) -> pa.Table:
        ru = b["rep_src"].to_numpy(zero_copy_only=False).astype(np.int64)
        rv = b["rep_dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.minimum(ru, rv)
        v = np.maximum(ru, rv)
        keep = u != v
        u, v = u[keep], v[keep]
        eb = ((u * np.int64(1_000_003) + v) % nb).astype(np.int64)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "eb": pa.array(eb)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        new = np.ones(len(u), bool)
        new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        gid = np.cumsum(new) - 1
        wt = np.bincount(gid)
        return pd.DataFrame({"src": u[new], "dst": v[new],
                             "weight": wt.astype(np.int64)})

    return (tagged.map_batches(relabel, batch_format="pyarrow")
            .groupby("eb").map_groups(merge, batch_format="pandas"))


ORACLE_SQL["doc_coarsen"] = f"""
    WITH m AS MATERIALIZED (
        SELECT * FROM ({_matching_sql(_MATCH.MATCH_ROUNDS)}) t),
    e AS MATERIALIZED ({DOC_EDGES_SQL}),
    rmap AS (SELECT dst AS v, src AS rep FROM m),
    r1 AS (SELECT e.src, e.dst, coalesce(ms.rep, e.src) AS ru
           FROM e LEFT JOIN rmap ms ON ms.v = e.src),
    r2 AS (SELECT src, dst, ru, coalesce(md.rep, dst) AS rv
           FROM r1 LEFT JOIN rmap md ON md.v = dst)
    SELECT least(ru, rv) AS src, greatest(ru, rv) AS dst,
           count(*)::BIGINT AS weight
    FROM r2 WHERE ru <> rv GROUP BY 1, 2
"""
QUERIES["doc_coarsen"] = q_doc_coarsen


# ------------------------------------------------ CM join-size estimate

def q_sketch_join(sf_dir):
    """Join-cardinality estimation from two mergeable Count-Min
    sketches (Cormode & Muthukrishnan 2005): |events JOIN orders ON
    user_id = o_custkey| estimated as the min row-wise register inner
    product — the sketches are built in one map-side pass each and the
    estimate needs only the 2 x d x w bounded registers, so two 100-TB
    tables can be size-estimated without ANY shuffle.  The exact size
    (for the report) uses per-batch key-count partials + ONE coarse
    key-bucket co-group with a vectorized per-key product kernel."""
    from .algos.triangles import n_buckets_for
    from .sketch import cm_inner_product, cm_int_sketch

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])
    od = read_parquet_clean(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_custkey"])
    est = cm_inner_product(cm_int_sketch(ev, "user_id"),
                           cm_int_sketch(od, "o_custkey"))

    nb = n_buckets_for(ev.count() + od.count())

    def count_part(col, side):
        def f(b: pa.Table) -> pa.Table:
            k = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            return pa.table({
                "k": pa.array(u), "n": pa.array(c.astype(np.int64)),
                "side": pa.array(np.full(len(u), side, np.int64)),
                "kb": pa.array((u % nb).astype(np.int64))})
        return f

    both = ev.map_batches(count_part("user_id", 0),
                          batch_format="pyarrow").union(
        od.map_batches(count_part("o_custkey", 1),
                       batch_format="pyarrow")).materialize()

    def dot_kernel(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        s = g["side"].to_numpy(np.int64)
        o = np.lexsort((s, k))
        k, n, s = k[o], n[o], s[o]
        new = np.ones(len(k), bool)
        new[1:] = k[1:] != k[:-1]
        gid = np.cumsum(new) - 1
        na = np.bincount(gid, weights=np.where(s == 0, n, 0))
        nb_ = np.bincount(gid, weights=np.where(s == 1, n, 0))
        return pd.DataFrame({"p": [int((na * nb_).sum())]})

    true_size = int(both.groupby("kb")
                    .map_groups(dot_kernel, batch_format="pandas")
                    .to_pandas()["p"].sum())
    return pd.DataFrame({"cm_estimate": [est],
                         "true_size": [true_size]})


def _cm_join_sql() -> str:
    from .sketch import CM_D, CM_GOLD, CM_SALTS, CM_W
    branches_a = " UNION ALL ".join(
        f"SELECT {j} AS j, "
        f"({_mulmod64_sql(f'xor(h, {CM_SALTS[j]}::UBIGINT)', CM_GOLD)} "
        f"% {CM_W})::BIGINT AS col, n FROM ha"
        for j in range(CM_D))
    branches_b = " UNION ALL ".join(
        f"SELECT {j} AS j, "
        f"({_mulmod64_sql(f'xor(h, {CM_SALTS[j]}::UBIGINT)', CM_GOLD)} "
        f"% {CM_W})::BIGINT AS col, n FROM hb"
        for j in range(CM_D))
    av = (lambda src: f"""
        SELECT k, n, xor(h4, h4 >> 32) AS h FROM (
          SELECT k, n, {_mulmod64_sql('h3', 0xC4CEB9FE1A85EC53)}::UBIGINT
                 AS h4 FROM (
            SELECT k, n, xor(h2, h2 >> 29) AS h3 FROM (
              SELECT k, n, {_mulmod64_sql('h1', 0xFF51AFD7ED558CCD)}::UBIGINT
                     AS h2 FROM (
                SELECT k, n, xor(k::UBIGINT, k::UBIGINT >> 33) AS h1
                FROM {src})))) """)
    return f"""
        WITH ka AS (SELECT user_id AS k, count(*)::HUGEINT AS n
                    FROM events GROUP BY 1),
        kb AS (SELECT o_custkey AS k, count(*)::HUGEINT AS n
               FROM orders GROUP BY 1),
        ha AS MATERIALIZED ({av('ka')}),
        hb AS MATERIALIZED ({av('kb')}),
        rega AS (SELECT j, col, sum(n) AS c FROM ({branches_a})
                 GROUP BY j, col),
        regb AS (SELECT j, col, sum(n) AS c FROM ({branches_b})
                 GROUP BY j, col),
        ip AS (SELECT a.j, sum(a.c * b.c) AS p
               FROM rega a JOIN regb b ON a.j = b.j AND a.col = b.col
               GROUP BY a.j)
        SELECT (SELECT min(p) FROM ip)::BIGINT AS cm_estimate,
               (SELECT count(*) FROM events e JOIN orders o
                ON o.o_custkey = e.user_id)::BIGINT AS true_size
    """


ORACLE_SQL["sketch_join"] = _cm_join_sql()
QUERIES["sketch_join"] = q_sketch_join


# ------------------------------------------- train/val/test split report

SPLIT_BOUNDS = (0.90, 0.95)   # train < 0.90 <= val < 0.95 <= test
SPLIT_NAMES = ("train", "val", "test")


def q_sample_split(sf_dir):
    """Deterministic train/val/test assignment (90/5/5) by the sha256
    prefix rule (the stratified_sample hash space): membership is
    stable across runs, partitionings and cluster sizes — the property
    a reproducible 100-TB training corpus needs.  Reports per
    (lang, split) doc and char totals from map-side partials over the
    catalog-bounded (lang x 3) domain."""
    b0 = int(SPLIT_BOUNDS[0] * (1 << 32))
    b1 = int(SPLIT_BOUNDS[1] * (1 << 32))

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        hv = np.fromiter(
            (int(hashlib.sha256(f"split:{v}".encode()).hexdigest()[:8],
                 16) for v in ids), np.int64, len(ids))
        split = np.searchsorted(np.array([b0, b1], np.int64), hv,
                                side="right")
        lang = np.asarray(b["lang"].to_pylist(), object)
        nch = b["n_chars"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = pd.Series([f"{l}\x1f{s}" for l, s in zip(lang, split)])
        g = pd.DataFrame({"k": key, "n": 1, "c": nch}) \
            .groupby("k", sort=True).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(part, batch_format="pyarrow").to_pandas()
    g = parts.groupby("k", sort=True, as_index=False).sum()
    lang = g["k"].str.split("\x1f").str[0]
    split = g["k"].str.split("\x1f").str[1].astype(int)
    out = pd.DataFrame({
        "lang": lang,
        "split": [SPLIT_NAMES[i] for i in split],
        "n_docs": g["n"].astype("int64"),
        "n_chars": g["c"].astype("int64")})
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


ORACLE_SQL["sample_split"] = f"""
    WITH h AS (SELECT lang, n_chars,
                  ('0x' || substr(sha256('split:' || doc_id::VARCHAR),
                   1, 8))::UBIGINT AS hv
               FROM documents),
    s AS (SELECT lang, n_chars,
                 CASE WHEN hv < {int(SPLIT_BOUNDS[0] * (1 << 32))}
                      THEN 'train'
                      WHEN hv < {int(SPLIT_BOUNDS[1] * (1 << 32))}
                      THEN 'val' ELSE 'test' END AS split
          FROM h)
    SELECT lang, split, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS n_chars
    FROM s GROUP BY lang, split ORDER BY lang, split
"""
QUERIES["sample_split"] = q_sample_split


# ------------------------------------------------------- filtered ANN

ANN_FILTER_LABELS = (1, 4, 7)


def q_ann_filtered(sf_dir):
    """Metadata-FILTERED vector search (the retrieval-with-predicate
    shape every RAG store needs): cosine top-k restricted to vectors
    whose label is in a fixed set.  The predicate pushes down BEFORE
    scoring — each batch drops non-matching rows ahead of the matmul,
    so the scan cost is the filter's selectivity, never the corpus;
    queries broadcast once (ray.put) as in brute_force_topk."""
    from .ann import brute_force_topk, queries_from_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])
    q, qi = queries_from_ids(emb, ANN_QUERY_IDS)
    lbl = np.array(ANN_FILTER_LABELS, np.int64)

    def keep(b: pa.Table) -> pa.Table:
        lv = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(np.isin(lv, lbl))) \
            .select(["vec_id", "embedding"])

    cand = emb.map_batches(keep, batch_format="pyarrow")
    out = brute_force_topk(cand, q, qi, k=ANN_K)
    out["cosine"] = out["cosine"].round(6)
    return out


ORACLE_SQL["ann_filtered"] = f"""
    WITH q AS (SELECT vec_id AS query_id,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id IN
               ({', '.join(map(str, ANN_QUERY_IDS))})),
    cand AS (SELECT vec_id, embedding FROM embeddings
             WHERE label IN {ANN_FILTER_LABELS}),
    sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                    list_cosine_similarity(
                        q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
             FROM q CROSS JOIN cand e
             WHERE e.vec_id <> q.query_id),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS rnk
               FROM sims)
    SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {ANN_K}
"""
QUERIES["ann_filtered"] = q_ann_filtered


def q_media_resample(sf_dir):
    """REAL audio resample lane: WAV PCM decode -> decimate-by-4 with a
    boxcar-SUM kernel (multimodal.ResampleStage, actor pool) — the
    downsample step every audio training pipeline runs before feature
    extraction.  All int64-exact, so the oracle recomputes chunk sums
    from the generator's closed form."""
    from .multimodal import audio_from_documents, decimate_audio

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return decimate_audio(audio_from_documents(docs))


ORACLE_SQL["media_resample"] = f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             400 + (strlen(text) * 7) % 800 AS n
      FROM documents
    ), s AS (
      SELECT media_id, n, unnest(range(n)) AS i,
             ((media_id + 1) * 2654435761 + unnest(range(n)) * 97003)
               % 65536 - 32768 AS v
      FROM m
    ), c AS (
      SELECT media_id, n, i // {_MM.RESAMPLE_M} AS chunk,
             sum(v)::BIGINT AS cs
      FROM s GROUP BY media_id, n, chunk
    )
    SELECT media_id, n AS n_in, count(*)::BIGINT AS n_out,
           sum(cs * cs)::BIGINT AS energy
    FROM c GROUP BY media_id, n
"""
QUERIES["media_resample"] = q_media_resample


def q_media_sobel(sf_dir):
    """REAL image convolution lane: BMP decode -> integer grayscale ->
    Sobel gx/gy -> per-image edge energy (multimodal.SobelStage, actor
    pool) — the feature-extraction step an image-dedup or quality
    pipeline runs.  Int64-exact, oracle from the generator closed form."""
    from .multimodal import images_from_documents, sobel_images

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return sobel_images(images_from_documents(docs))


ORACLE_SQL["media_sobel"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
      FROM documents
    ), px AS (
      SELECT media_id, w, h, gx.x, gy.y,
             ((media_id * 131 + gy.y * 17 + gx.x * 7 + 0) % 256
              + (media_id * 131 + gy.y * 17 + gx.x * 7 + 3) % 256
              + (media_id * 131 + gy.y * 17 + gx.x * 7 + 6) % 256)
                 ::BIGINT AS gray
      FROM m
      CROSS JOIN (SELECT unnest(range(24)) AS x) gx
      CROSS JOIN (SELECT unnest(range(20)) AS y) gy
      WHERE gx.x < w AND gy.y < h
    ), d AS (
      SELECT dx.v AS dx, dy.v AS dy
      FROM (SELECT unnest([-1, 0, 1]) AS v) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS v) dy
    ), conv AS (
      SELECT g.media_id, g.x, g.y,
             sum(d.dx * (2 - abs(d.dy)) * n.gray)::BIGINT AS sx,
             sum(d.dy * (2 - abs(d.dx)) * n.gray)::BIGINT AS sy
      FROM px g CROSS JOIN d
      JOIN px n ON n.media_id = g.media_id
                AND n.x = g.x + d.dx AND n.y = g.y + d.dy
      WHERE g.x BETWEEN 1 AND g.w - 2 AND g.y BETWEEN 1 AND g.h - 2
      GROUP BY g.media_id, g.x, g.y
    )
    SELECT media_id, count(*)::BIGINT AS n_interior,
           sum(sx * sx + sy * sy)::BIGINT AS edge_energy
    FROM conv GROUP BY media_id
"""
QUERIES["media_sobel"] = q_media_sobel


# ------------------------------------------- dim-truncation recall

TRUNC_DIM = 16


def q_embed_truncate(sf_dir):
    """Matryoshka-style dimension-truncation report: recall@k of cosine
    search over the FIRST 16 of 64 embedding dims (re-normalized)
    against the full-dim brute-force top-k — the measurement that
    decides whether a cheaper truncated index is safe at corpus scale.
    Both searches stream with broadcast queries; the compare runs over
    k * |queries| driver rows."""
    from .ann import brute_force_topk, queries_from_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])

    def cut(b: pa.Table) -> pa.Table:
        m = vec_matrix(b["embedding"])[:, :TRUNC_DIM]
        return pa.table({"vec_id": b["vec_id"],
                         "embedding": pa.array(list(m))})

    tr = emb.map_batches(cut, batch_format="pyarrow").materialize()
    qf, qi = queries_from_ids(emb, ANN_QUERY_IDS)
    qt, _ = queries_from_ids(tr, ANN_QUERY_IDS)
    bf = brute_force_topk(emb, qf, qi, k=ANN_K)[
        ["query_id", "neighbor_id"]]
    tk = brute_force_topk(tr, qt, qi, k=ANN_K)[
        ["query_id", "neighbor_id"]]
    hit = bf.merge(tk, on=["query_id", "neighbor_id"], how="inner") \
        .groupby("query_id").size()
    qids = np.sort(bf["query_id"].unique())
    rec = np.array([hit.get(q, 0) for q in qids], np.float64) / ANN_K
    return pd.DataFrame({"query_id": qids.astype(np.int64),
                         "recall": np.round(rec, 6)})


ORACLE_SQL["embed_truncate"] = f"""
    WITH q AS (SELECT vec_id AS query_id,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id IN
               ({', '.join(map(str, ANN_QUERY_IDS))})),
    bf AS (SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                   list_cosine_similarity(q.qv,
                       CAST(e.embedding AS DOUBLE[])) DESC,
                   e.vec_id ASC) AS rnk
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
        WHERE rnk <= {ANN_K}),
    qt AS (SELECT vec_id AS query_id,
                  CAST(embedding[1:{TRUNC_DIM}] AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id IN
           ({', '.join(map(str, ANN_QUERY_IDS))})),
    tk AS (SELECT query_id, neighbor_id FROM (
        SELECT qt.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY qt.query_id ORDER BY
                   list_cosine_similarity(qt.qv,
                       CAST(e.embedding[1:{TRUNC_DIM}] AS DOUBLE[])) DESC,
                   e.vec_id ASC) AS rnk
        FROM qt CROSS JOIN embeddings e WHERE e.vec_id <> qt.query_id)
        WHERE rnk <= {ANN_K})
    SELECT bf.query_id,
           round(count(tk.neighbor_id) / {ANN_K}.0, 6) AS recall
    FROM bf LEFT JOIN tk ON tk.query_id = bf.query_id
                        AND tk.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""
QUERIES["embed_truncate"] = q_embed_truncate


# --------------------------------------------------- char entropy

def q_text_entropy(sf_dir):
    """Per-document character-distribution Shannon entropy (bits/char)
    — the compressibility proxy web-corpus quality filters use (low
    entropy = repetitive boilerplate, high = noise/binary junk).

    Vectorized across each batch: ONE utf-32 buffer for all texts,
    packed (doc, codepoint) codes, np.unique counts — no per-doc
    Python.  Entropy terms sum in codepoint order; rounded to 6 so the
    SQL twin's sum order cannot differ."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        lens = np.array([len(t) for t in texts], np.int64)
        if lens.sum() == 0:
            return pa.table({"doc_id": pa.array(ids),
                             "n_chars": pa.array(lens),
                             "entropy": pa.array(
                                 np.zeros(len(ids), np.float64))})
        buf = np.frombuffer("".join(texts).encode("utf-32-le"),
                            np.uint32).astype(np.int64)
        didx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        code = didx * np.int64(1 << 21) + buf
        u, cnt = np.unique(code, return_counts=True)
        ud = (u >> 21).astype(np.int64)
        p = cnt / lens[ud]
        terms = -p * np.log2(p)
        ent = np.zeros(len(ids), np.float64)
        np.add.at(ent, ud, terms)
        return pa.table({"doc_id": pa.array(ids),
                         "n_chars": pa.array(lens),
                         "entropy": pa.array(np.round(ent, 6))})

    return docs.map_batches(part, batch_format="pyarrow")


ORACLE_SQL["text_entropy"] = """
    WITH pos AS (
      SELECT doc_id, length(text) AS n,
             substr(text, j::INT, 1) AS ch
      FROM (SELECT doc_id, text,
                   unnest(range(1, length(text) + 1)) AS j
            FROM documents)
    ), cc AS (
      SELECT doc_id, n, ch, count(*)::DOUBLE AS c
      FROM pos GROUP BY doc_id, n, ch
    ), h AS (
      SELECT doc_id, n,
             -sum((c / n) * log2(c / n)) AS ent
      FROM cc GROUP BY doc_id, n
    )
    SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_chars,
           round(coalesce(h.ent, 0.0), 6) AS entropy
    FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
"""
QUERIES["text_entropy"] = q_text_entropy


# ---------------------------------------------------- BPE merge training

BPE_MERGE_ROUNDS = 4
BPE_SEP = "\x1f"


def q_text_bpe_merges(sf_dir):
    """Iterative BPE tokenizer training, the first K merges: each round
    counts adjacent symbol pairs over the DISTINCT-word table (weighted
    by corpus word frequency), merges the argmax pair — tie-break
    (count DESC, pair ASC; UTF-8 byte order == codepoint order — the
    text_bpe_pairs convention), and rewrites the corpus representation.

    The symbol string uses the \\x1f-separator form ('\\x1fa\\x1fb\\x1f')
    and merge-apply is literal non-overlapping left-to-right replace —
    IDENTICAL semantics in pandas str.replace and DuckDB replace()
    (verified), so the oracle is exact.  Scale shape: words stay a
    distributed Dataset across rounds (materialized per round, K small);
    pair stats are map-side partials + a bounded pair-key groupby +
    top-1 partials (the pair domain is alphabet^2 + merges)."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def wpartial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(_arr(b["text"]), r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        toks = toks[toks.to_numpy(object) != ""]
        vc = toks.value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    words = docs.map_batches(wpartial, batch_format="pyarrow") \
        .groupby("w").sum("n")

    def to_spaced(b: pa.Table) -> pa.Table:
        w = pd.Series(b["w"].to_pylist(), dtype=object)
        s = w.str.replace("", BPE_SEP, regex=False)
        return pa.table({"s": pa.array(s.tolist(), pa.string()),
                         "n": b["sum(n)"]})

    cur = words.map_batches(to_spaced, batch_format="pyarrow") \
        .materialize()
    steps, pas, pbs, tots = [], [], [], []
    for step in range(1, BPE_MERGE_ROUNDS + 1):
        def pstat(b: pa.Table) -> pa.Table:
            lists = pc.split_pattern(_arr(b["s"]), BPE_SEP)
            toks = pc.list_flatten(lists).to_pandas() \
                .to_numpy(object)
            par = pc.list_parent_indices(lists) \
                .to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(par) < 2:
                return pa.table({"pair": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            a, c = toks[:-1], toks[1:]
            m = (par[:-1] == par[1:]) & (a != "") & (c != "")
            df = pd.DataFrame({"pair": a[m] + BPE_SEP + c[m],
                               "n": n[par[:-1][m]]})
            g = df.groupby("pair", sort=False)["n"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = cur.map_batches(pstat, batch_format="pyarrow") \
            .groupby("pair").sum("n")

        def top1(b: pa.Table) -> pa.Table:
            pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
            pdf = pdf.sort_values(["n", "pair"],
                                  ascending=[False, True],
                                  kind="mergesort").head(1)
            return pa.Table.from_pandas(pdf, preserve_index=False)

        cand = counts.map_batches(top1, batch_format="pyarrow") \
            .to_pandas()
        if len(cand) == 0:
            break
        cand = cand.sort_values(["n", "pair"], ascending=[False, True],
                                kind="mergesort").head(1)
        pair, tot = cand["pair"].iloc[0], int(cand["n"].iloc[0])
        a, bb = pair.split(BPE_SEP)
        steps.append(step)
        pas.append(a)
        pbs.append(bb)
        tots.append(tot)
        pat = BPE_SEP + a + BPE_SEP + bb + BPE_SEP
        rep = BPE_SEP + a + bb + BPE_SEP

        def apply(bt: pa.Table, pat=pat, rep=rep) -> pa.Table:
            s = pd.Series(bt["s"].to_pylist(), dtype=object) \
                .str.replace(pat, rep, regex=False)
            return pa.table({"s": pa.array(s.tolist(), pa.string()),
                             "n": bt["n"]})

        cur = cur.map_batches(apply, batch_format="pyarrow") \
            .materialize()
    return pd.DataFrame({"step": np.array(steps, np.int64),
                         "a": pas, "b": pbs,
                         "n": np.array(tots, np.int64)})


def _bpe_merges_sql(rounds: int) -> str:
    S = BPE_SEP
    ctes = [
        ("wc AS MATERIALIZED (SELECT w, count(*)::BIGINT AS n FROM ("
         "SELECT unnest(list_filter(regexp_split_to_array(text, "
         "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w)"),
        (f"s0 AS MATERIALIZED (SELECT w, n, '{S}' || "
         f"regexp_replace(w, '(.)', '\\1{S}', 'g') AS s FROM wc)")]
    for r in range(1, rounds + 1):
        p = f"s{r - 1}"
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT w, n, unnest(l) AS sym, "
            f"generate_subscripts(l, 1) AS i FROM (SELECT w, n, "
            f"string_split(s, '{S}') AS l FROM {p}))")
        ctes.append(
            f"p{r} AS (SELECT x.sym AS a, y.sym AS b, sum(x.n) AS t "
            f"FROM t{r} x JOIN t{r} y ON y.w = x.w AND y.i = x.i + 1 "
            f"WHERE x.sym <> '' AND y.sym <> '' GROUP BY 1, 2)")
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT a, b, t FROM p{r} "
            f"ORDER BY t DESC, a, b LIMIT 1)")
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT {p}.w, {p}.n, "
            f"replace({p}.s, '{S}' || m.a || '{S}' || m.b || '{S}', "
            f"'{S}' || m.a || m.b || '{S}') AS s "
            f"FROM {p} CROSS JOIN m{r} m)")
    union = " UNION ALL ".join(
        f"SELECT {r} AS step, a, b, t::BIGINT AS n FROM m{r}"
        for r in range(1, rounds + 1))
    return (f"WITH {', '.join(ctes)} SELECT step, a, b, n "
            f"FROM ({union}) ORDER BY step")


ORACLE_SQL["text_bpe_merges"] = _bpe_merges_sql(BPE_MERGE_ROUNDS)
QUERIES["text_bpe_merges"] = q_text_bpe_merges


def q_text_unigram_tokenizer(sf_dir):
    """Unigram-LM (SentencePiece-style) tokenizer training
    (tokenizer.unigram_train): substring-seeded vocab, hard-EM rounds of
    Viterbi segmentation + count re-estimation over the distinct-word
    table.  Log-probs use math.log (bit-identical to DuckDB ln — np.log
    is NOT), so the DP argmax decisions reproduce exactly; the oracle
    unrolls each E-step as a recursive CTE carrying the last 4 DP
    states (score + segmentation string) as columns."""
    from .tokenizer import unigram_train

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return unigram_train(docs)


def _unigram_ctes(seed_vocab: int, rounds: int,
                  extra_dp: bool = False) -> list:
    """Oracle twin of tokenizer.unigram_train at max_len=4.  Each
    E-step is one recursive CTE over (word, consumed-prefix length p):
    the state carries best[p..p-3] and their segmentation strings, so
    the Viterbi recurrence best[p] = max_k best[p-k] + lp(piece) needs
    only the previous iteration's row.  Longest piece wins score ties
    (the CASE order); invalid/missing pieces take the -1e100 sentinel
    and can never beat a real candidate (single chars always stay
    segmentable — pieces used by round r survive to round r+1)."""
    S = BPE_SEP
    NEG = "-1e100"
    ctes = [
        ("wc AS MATERIALIZED (SELECT w, count(*)::BIGINT AS n FROM ("
         "SELECT unnest(list_filter(regexp_split_to_array(text, "
         "'\\s+'), x -> x <> '')) AS w FROM documents) GROUP BY w)"),
        ("cand AS MATERIALIZED (SELECT substr(w, s, l) AS piece, "
         "sum(n)::BIGINT AS cnt FROM (SELECT w, n, "
         "unnest(generate_series(1, length(w))) AS s FROM wc), "
         "(SELECT unnest([1, 2, 3, 4]) AS l) "
         "WHERE s + l - 1 <= length(w) GROUP BY 1)"),
        (f"seltop AS (SELECT piece, cnt FROM cand "
         f"ORDER BY cnt DESC, piece ASC LIMIT {seed_vocab})"),
        ("sel AS (SELECT piece, max(cnt) AS cnt FROM ("
         "SELECT * FROM seltop UNION ALL "
         "SELECT piece, cnt FROM cand WHERE length(piece) = 1) "
         "GROUP BY piece)"),
        ("v1 AS MATERIALIZED (SELECT piece, ln(cnt::DOUBLE / "
         "(SELECT sum(cnt) FROM sel)::DOUBLE) AS lp FROM sel)")]
    for r in range(1, rounds + 1):
        ctes.append(_unigram_dp_cte(r))
        ctes.append(
            f"cnt{r} AS MATERIALIZED (SELECT piece, "
            f"sum(n)::BIGINT AS cnt FROM (SELECT "
            f"unnest(string_split(s0, '{S}')) AS piece, n "
            f"FROM dp{r} WHERE p = length(w)) "
            f"WHERE piece <> '' GROUP BY piece)")
        if r < rounds:
            ctes.append(
                f"v{r + 1} AS MATERIALIZED (SELECT piece, "
                f"ln(cnt::DOUBLE / (SELECT sum(cnt) "
                f"FROM cnt{r})::DOUBLE) AS lp FROM cnt{r})")
    if extra_dp:
        # final vocab + ONE more Viterbi pass with it: the tokenize-
        # apply lane (the engine's unigram_token_counts twin)
        R = rounds
        ctes.append(
            f"v{R + 1} AS MATERIALIZED (SELECT piece, "
            f"ln(cnt::DOUBLE / (SELECT sum(cnt) "
            f"FROM cnt{R})::DOUBLE) AS lp FROM cnt{R})")
        ctes.append(_unigram_dp_cte(R + 1))
    return ctes


def _unigram_dp_cte(r: int) -> str:
    """One recursive-CTE Viterbi E-step over vocab v{r} (see
    _unigram_ctes docstring for the state-carrying construction)."""
    S = BPE_SEP
    NEG = "-1e100"
    return f"""dp{r} AS (
  SELECT w, n, 0 AS p,
         0.0::DOUBLE AS b0, ''::VARCHAR AS s0,
         {NEG}::DOUBLE AS b1, ''::VARCHAR AS s1,
         {NEG}::DOUBLE AS b2, ''::VARCHAR AS s2,
         {NEG}::DOUBLE AS b3, ''::VARCHAR AS s3
  FROM wc
  UNION ALL
  SELECT w, n, p + 1,
         CASE WHEN c4 >= c3 AND c4 >= c2 AND c4 >= c1 THEN c4
              WHEN c3 >= c2 AND c3 >= c1 THEN c3
              WHEN c2 >= c1 THEN c2 ELSE c1 END,
         CASE WHEN c4 >= c3 AND c4 >= c2 AND c4 >= c1
                   THEN s3 || '{S}' || substr(w, p - 2, 4)
              WHEN c3 >= c2 AND c3 >= c1
                   THEN s2 || '{S}' || substr(w, p - 1, 3)
              WHEN c2 >= c1 THEN s1 || '{S}' || substr(w, p, 2)
              ELSE s0 || '{S}' || substr(w, p + 1, 1) END,
         b0, s0, b1, s1, b2, s2
  FROM (
    SELECT d.w, d.n, d.p, d.b0, d.s0, d.b1, d.s1, d.b2, d.s2,
           d.b3, d.s3,
           d.b0 + coalesce(x1.lp, {NEG}) AS c1,
           d.b1 + coalesce(x2.lp, {NEG}) AS c2,
           d.b2 + coalesce(x3.lp, {NEG}) AS c3,
           d.b3 + coalesce(x4.lp, {NEG}) AS c4
    FROM dp{r} d
    LEFT JOIN v{r} x1 ON x1.piece = substr(d.w, d.p + 1, 1)
    LEFT JOIN v{r} x2 ON x2.piece = substr(d.w, d.p, 2)
    LEFT JOIN v{r} x3 ON x3.piece = substr(d.w, d.p - 1, 3)
    LEFT JOIN v{r} x4 ON x4.piece = substr(d.w, d.p - 2, 4)
    WHERE d.p < length(d.w)))"""


def _unigram_sql(seed_vocab: int, rounds: int, top_out: int) -> str:
    ctes = _unigram_ctes(seed_vocab, rounds)
    union = " UNION ALL ".join(
        f"(SELECT {r}::BIGINT AS round, row_number() OVER ("
        f"ORDER BY cnt DESC, piece ASC)::BIGINT AS rnk, piece, "
        f"cnt AS n FROM cnt{r} "
        f"ORDER BY cnt DESC, piece ASC LIMIT {top_out})"
        for r in range(1, rounds + 1))
    return (f"WITH RECURSIVE {', '.join(ctes)} "
            f"SELECT round, rnk, piece, n FROM ({union}) "
            f"ORDER BY round, rnk")


def _unigram_tokens_sql(seed_vocab: int, rounds: int) -> str:
    """Per-doc token counts under the trained unigram vocab: the
    training CTE chain + one extra Viterbi pass, word piece counts
    joined back onto each document's word list (empty docs carry 0)."""
    S = BPE_SEP
    ctes = _unigram_ctes(seed_vocab, rounds, extra_dp=True)
    R1 = rounds + 1
    return f"""WITH RECURSIVE {', '.join(ctes)},
    wlen AS (SELECT w,
             (len(string_split(s0, '{S}')) - 1)::BIGINT AS np
             FROM dp{R1} WHERE p = length(w)),
    docw AS (SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
             FROM documents)
    SELECT d.doc_id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens
    FROM documents d LEFT JOIN (
      SELECT doc_id, sum(np)::BIGINT AS n_tokens
      FROM docw JOIN wlen USING (w) GROUP BY doc_id) s USING (doc_id)"""


from .tokenizer import UNI_ROUNDS as _UNI_ROUNDS  # noqa: E402
from .tokenizer import UNI_SEED_VOCAB as _UNI_SEED  # noqa: E402
from .tokenizer import UNI_TOP_OUT as _UNI_TOP  # noqa: E402

ORACLE_SQL["text_unigram_tokenizer"] = _unigram_sql(
    _UNI_SEED, _UNI_ROUNDS, _UNI_TOP)
QUERIES["text_unigram_tokenizer"] = q_text_unigram_tokenizer


def q_text_unigram_tokens(sf_dir):
    """Tokenize-apply lane: per-doc token counts under the TRAINED
    unigram vocab (tokenizer.unigram_token_counts) — train, broadcast
    the final piece log-probs once, Viterbi-segment each doc's words
    with a per-batch distinct-word memo; per-doc sums need no shuffle.
    Oracle: the training CTE chain + one extra recursive-CTE Viterbi
    pass, word piece counts joined onto each doc's word list."""
    from .tokenizer import unigram_token_counts

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return unigram_token_counts(docs)


ORACLE_SQL["text_unigram_tokens"] = _unigram_tokens_sql(
    _UNI_SEED, _UNI_ROUNDS)
QUERIES["text_unigram_tokens"] = q_text_unigram_tokens


ORACLE_SQL["doc_salsa"] = _salsa_sql(SALSA_ITERS, 6)
QUERIES["doc_salsa"] = q_doc_salsa


def q_events_attribution(sf_dir):
    """First-touch conversion attribution (windows.
    first_touch_attribution): each user's first 'purchase' is credited
    to the user's first-ever event_type in deterministic (ts, event_id)
    order; exact integer-cents totals.  One coarse key-bucket shuffle,
    per-channel partials merged driver-side (channel domain is
    catalog-bounded)."""
    from .windows import first_touch_attribution

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    return first_touch_attribution(ev)


ORACLE_SQL["events_attribution"] = """
    WITH r AS (SELECT user_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    p AS (SELECT user_id, min(rn) AS prn FROM r
          WHERE event_type = 'purchase' GROUP BY 1),
    f AS (SELECT r.user_id, r.event_type AS channel
          FROM r JOIN p USING (user_id) WHERE r.rn = 1),
    v AS (SELECT r.user_id,
                 CAST(floor(r.value * 100 + 0.5) AS BIGINT) AS cents
          FROM r JOIN p ON p.user_id = r.user_id AND r.rn = p.prn)
    SELECT channel, count(*)::BIGINT AS n_users,
           round(sum(v.cents) / 100.0, 6) AS total_value
    FROM f JOIN v USING (user_id)
    GROUP BY 1 ORDER BY 1
"""
QUERIES["events_attribution"] = q_events_attribution


def q_events_concurrency(sf_dir):
    """Sweep-line peak concurrency per epoch-day (windows.
    peak_concurrency): each event holds a session open for 15 minutes;
    reports each day's maximum simultaneous sessions and the first
    microsecond that peak was reached.  Parallel prefix scan: one
    day-aligned time-slice shuffle, 4-number partials per slice, the
    running count folded driver-side in O(slices)."""
    from .windows import peak_concurrency

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts"])
    return peak_concurrency(ev)


ORACLE_SQL["events_concurrency"] = """
    WITH d AS (SELECT epoch_us(ts) AS t, 1 AS delta FROM events
               UNION ALL
               SELECT epoch_us(ts) + 900000000 AS t, -1 AS delta
               FROM events),
    c AS (SELECT t, sum(delta) OVER (ORDER BY t, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
          FROM d),
    g AS (SELECT t // 86400000000 AS day, t, cnt FROM c),
    p AS (SELECT day, max(cnt) AS peak FROM g GROUP BY 1)
    SELECT p.day::BIGINT AS day, p.peak::BIGINT AS peak,
           min(g.t)::BIGINT AS peak_ts_us
    FROM p JOIN g ON g.day = p.day AND g.cnt = p.peak
    GROUP BY 1, 2 ORDER BY 1
"""
QUERIES["events_concurrency"] = q_events_concurrency


def q_events_streaks(sf_dir):
    """Longest consecutive-day activity streak per user (gaps & islands;
    windows.user_streaks): distinct (user, day) with in-batch pre-dedup,
    one coarse user-bucket groupby, vectorized run kernel in-bucket."""
    from .windows import user_streaks

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return user_streaks(ev)


ORACLE_SQL["events_streaks"] = """
    WITH d AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day FROM events),
    r AS (SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS grp FROM d),
    s AS (SELECT user_id, count(*)::BIGINT AS best_streak,
                 min(day)::BIGINT AS streak_start_day
          FROM r GROUP BY user_id, grp)
    SELECT user_id, best_streak, streak_start_day FROM s
    QUALIFY row_number() OVER (PARTITION BY user_id
        ORDER BY best_streak DESC, streak_start_day ASC) = 1
    ORDER BY user_id
"""
QUERIES["events_streaks"] = q_events_streaks


def _winnow_sel_sql(k: int, w: int) -> str:
    """Shared CTE prefix reproducing text.batch_winnow's fingerprint
    selection in SQL: positional k-gram hashes (same uint64 polynomial
    as rolling_hashes, in HUGEINT), then the rightmost-minimal hash of
    every w-hash window ending at each position via a window min over
    the key h * 2^32 + (2^32-1 - pos) — smaller hash wins, hash ties go
    to the larger position.  Exposes sel(doc_id, wmin): the DISTINCT
    selected fingerprints, h = wmin // 2^32, pos = 2^32-1 - wmin % 2^32."""
    gh = _gram_hash_sql("sh", k)
    return f"""
      hp AS MATERIALIZED (
        SELECT doc_id, pos, {gh} AS h FROM (
          SELECT doc_id, pos,
                 CASE WHEN length(text) < {k} THEN text
                      ELSE substr(text, (pos + 1)::INT, {k}) END AS sh
          FROM (SELECT doc_id, text,
                       unnest(range(0, greatest(length(text) - {k - 1},
                                                1))) AS pos
                FROM documents))),
      keyed AS (SELECT doc_id, pos,
                       h * 4294967296::HUGEINT + (4294967295 - pos)
                           AS key FROM hp),
      sel AS (SELECT DISTINCT doc_id, min(key) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS wmin
              FROM keyed)
    """


def q_text_winnow(sf_dir):
    """Per-doc winnowing fingerprint density (text.batch_winnow, MOSS
    k=20 / w=8): (doc_id, n_fp selected fingerprints, n_pos k-gram
    positions).  One vectorized map_batches pass; no shuffle."""
    from .dedup import WINNOW_K, WINNOW_W
    from .text import batch_winnow

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def fp_counts(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        d, _pos, _h = batch_winnow(texts, WINNOW_K, WINNOW_W)
        nfp = np.bincount(d, minlength=len(ids)).astype(np.int64)
        lens = np.array([len(t or "") for t in texts], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids), "n_fp": pa.array(nfp),
            "n_pos": pa.array(np.maximum(lens - WINNOW_K + 1, 1))})

    return docs.map_batches(fp_counts, batch_format="pyarrow")


ORACLE_SQL["text_winnow"] = f"""
    WITH {_winnow_sel_sql(20, 8)},
    c AS (SELECT doc_id, count(*)::BIGINT AS n_fp FROM sel GROUP BY 1)
    SELECT d.doc_id, c.n_fp,
           greatest(length(d.text) - 19, 1)::BIGINT AS n_pos
    FROM documents d JOIN c USING (doc_id) ORDER BY d.doc_id
"""
QUERIES["text_winnow"] = q_text_winnow


def q_dedup_winnow(sf_dir):
    """Winnowing-fingerprint duplicate pairs (dedup.winnow_dup_pairs):
    guaranteed to catch any shared substring >= w+k-1 = 27 chars while
    keeping only ~2/(w+1) of positions — the MOSS trade."""
    from .dedup import winnow_dup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return winnow_dup_pairs(docs)


ORACLE_SQL["dedup_winnow"] = f"""
    WITH {_winnow_sel_sql(20, 8)},
    fp AS (SELECT DISTINCT doc_id, wmin // 4294967296::HUGEINT AS h
           FROM sel),
    ok AS (SELECT h FROM fp GROUP BY h
           HAVING count(*) >= 2 AND count(*) <= 64)
    SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS n_shared
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN ok ON ok.h = a.h
    GROUP BY 1, 2 ORDER BY 1, 2
"""
QUERIES["dedup_winnow"] = q_dedup_winnow


def q_events_compact(sf_dir):
    """Last-writer-wins log compaction (windows.compact_latest, the CDC
    upsert-merge shape): one row per user — its latest event by
    (ts, event_id) — via in-batch combiner partials + one coarse
    user-bucket groupby."""
    from .windows import compact_latest

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    return compact_latest(ev)


ORACLE_SQL["events_compact"] = """
    SELECT user_id, epoch_us(ts)::BIGINT AS last_ts_us,
           event_type AS last_type, round(value, 6) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""
QUERIES["events_compact"] = q_events_compact


def q_text_heaps(sf_dir):
    """Vocabulary growth curve (text.vocab_growth, the Heaps'-law
    report): tokens bucketed by the doc_id decile of their FIRST
    occurrence — per-batch (token, min doc) combiner, one coarse
    token-bucket shuffle, O(buckets x 10) driver fold."""
    from .text import vocab_growth

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return vocab_growth(docs)


ORACLE_SQL["text_heaps"] = """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
      FROM documents),
    f AS (SELECT w, min(doc_id) AS fd FROM toks GROUP BY w),
    mm AS (SELECT min(doc_id) AS lo,
                  max(doc_id) - min(doc_id) + 1 AS width FROM documents),
    d AS (SELECT least((fd - lo) * 10 // width, 9) + 1 AS decile
          FROM f, mm),
    c AS (SELECT decile, count(*)::BIGINT AS new_tokens
          FROM d GROUP BY 1)
    SELECT decile::BIGINT AS decile, new_tokens,
           sum(new_tokens) OVER (ORDER BY decile)::BIGINT AS cum_vocab
    FROM c ORDER BY decile
"""
QUERIES["text_heaps"] = q_text_heaps


def q_embed_silhouette(sf_dir):
    """Simplified silhouette per k-means cluster (ann.
    cluster_silhouette): the clustering-quality report over the same
    seeded kmeans_full rounds as embed_kmeans, plus ONE extra
    map-side-partial pass — no shuffle, no per-vector materialization."""
    from .ann import cluster_silhouette

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    return cluster_silhouette(vecs, n_centroids=KMEANS_K,
                              iters=KMEANS_ITERS)


ORACLE_SQL["embed_silhouette"] = _kmeans_full_sql(
    n_centroids=KMEANS_K, iters=KMEANS_ITERS, tail="silhouette")
QUERIES["embed_silhouette"] = q_embed_silhouette


def q_doc_bowtie(sf_dir):
    """Bow-tie decomposition of the cycle-augmented directed doc graph
    (algos.bowtie, Broder et al. WWW 2000): component sizes for
    core / in / out / other.  SCC labels + two multi-source reach
    sweeps (forward, transpose); class counts are map_vertices
    reductions — no per-vertex driver table."""
    from .algos.bowtie import bowtie

    eng = documents_engine(sf_dir, "scc")
    c = bowtie(eng)["counts"]
    return pd.DataFrame({"component": sorted(c),
                         "n": np.array([c[k] for k in sorted(c)],
                                       np.int64)})


ORACLE_SQL["doc_bowtie"] = f"""
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT src, dst FROM ({SCC_EDGES_SQL}) aug),
    reach(a, b) AS (
        SELECT src AS a, dst AS b FROM e
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b),
    mn AS (SELECT r1.a AS v, min(r1.b) AS mn
           FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
           GROUP BY r1.a),
    sccmap AS (SELECT d.doc_id AS v,
                      least(d.doc_id, coalesce(mn.mn, d.doc_id)) AS scc
               FROM documents d LEFT JOIN mn ON mn.v = d.doc_id),
    core AS (SELECT scc FROM (
        SELECT scc, count(*) AS n FROM sccmap GROUP BY 1
        ORDER BY n DESC, scc ASC LIMIT 1)),
    cls AS (SELECT s.v,
        CASE WHEN s.scc = (SELECT scc FROM core) THEN 'core'
             WHEN EXISTS (SELECT 1 FROM reach r JOIN sccmap c
                          ON c.v = r.b WHERE r.a = s.v
                          AND c.scc = (SELECT scc FROM core)) THEN 'in'
             WHEN EXISTS (SELECT 1 FROM reach r JOIN sccmap c
                          ON c.v = r.a WHERE r.b = s.v
                          AND c.scc = (SELECT scc FROM core)) THEN 'out'
             ELSE 'other' END AS component
        FROM sccmap s),
    cnt AS (SELECT component, count(*)::BIGINT AS n
            FROM cls GROUP BY 1)
    SELECT k.component, coalesce(cnt.n, 0)::BIGINT AS n
    FROM (VALUES ('core'), ('in'), ('out'), ('other')) k(component)
    LEFT JOIN cnt USING (component) ORDER BY k.component
"""
QUERIES["doc_bowtie"] = q_doc_bowtie


def q_text_source_jsd(sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source unigram
    token distributions (text.source_jsd): bounded-domain totals pass +
    one coarse token-bucket shuffle whose kernels emit per-pair partial
    JSD sums — O(buckets x pairs) driver fold."""
    from .text import source_jsd

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["source", "text"])
    return source_jsd(docs)


ORACLE_SQL["text_source_jsd"] = """
    WITH toks AS (
      SELECT source, unnest(list_filter(
          regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS w
      FROM documents),
    c AS (SELECT source, w, count(*)::DOUBLE AS c
          FROM toks GROUP BY 1, 2),
    t AS (SELECT source, sum(c) AS tot FROM c GROUP BY 1),
    p AS (SELECT c.source, c.w, c.c / t.tot AS p
          FROM c JOIN t USING (source)),
    pairs AS (SELECT ta.source AS src_a, tb.source AS src_b
              FROM t ta JOIN t tb ON ta.source < tb.source),
    w AS (SELECT DISTINCT w FROM c),
    j AS (SELECT pr.src_a, pr.src_b,
                 coalesce(a.p, 0) AS pa, coalesce(b.p, 0) AS pb
          FROM pairs pr CROSS JOIN w
          LEFT JOIN p a ON a.source = pr.src_a AND a.w = w.w
          LEFT JOIN p b ON b.source = pr.src_b AND b.w = w.w)
    SELECT src_a, src_b, round(sum(
        CASE WHEN pa > 0
             THEN 0.5 * pa * ln(2 * pa / (pa + pb)) ELSE 0 END
      + CASE WHEN pb > 0
             THEN 0.5 * pb * ln(2 * pb / (pa + pb)) ELSE 0 END), 6)
        AS jsd
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""
QUERIES["text_source_jsd"] = q_text_source_jsd


def q_tpch_dominant_supplier(sf_dir):
    """Q20-shaped correlated-threshold semi-join (relational.
    dominant_suppliers): per-supplier count of parts it dominates
    (exact-int comparison vs the part's mean per-supplier quantity),
    one coarse part-bucket shuffle + bounded-dimension driver fold."""
    return _REL.dominant_suppliers(sf_dir)


ORACLE_SQL["tpch_dominant_supplier"] = _REL.DOMINANT_SUPPLIERS_SQL
QUERIES["tpch_dominant_supplier"] = q_tpch_dominant_supplier


def _simrank_sql(iters: int, c: float) -> str:
    """Oracle for algos.simrank.simrank_score_hist: the identical
    rounds unrolled — s0 = identity, each round joins the previous
    state to the canonical directed edges on both sides, divides by
    the exact in-degree product, re-adds the unit diagonal — then the
    ROUND-6 score histogram over a < b pairs (counts every nonzero
    pair; 1e-16 summation-order noise only matters on a rounding edge,
    the repo-wide float convention)."""
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            """din AS MATERIALIZED (
      SELECT dst AS v, count(*) AS d FROM e GROUP BY 1)""",
            """s0 AS MATERIALIZED (
      SELECT doc_id AS i, doc_id AS j, 1.0::DOUBLE AS s
      FROM documents)"""]
    for r in range(1, iters + 1):
        p = f"s{r - 1}"
        ctes.append(f"""s{r}_nd AS MATERIALIZED (
          SELECT ea.dst AS i, eb.dst AS j,
                 {c} * sum(p.s) / (da.d * db.d) AS s
          FROM {p} p JOIN e ea ON ea.src = p.i
                     JOIN e eb ON eb.src = p.j
          JOIN din da ON da.v = ea.dst
          JOIN din db ON db.v = eb.dst
          WHERE ea.dst <> eb.dst
          GROUP BY ea.dst, eb.dst, da.d, db.d)""")
        ctes.append(f"""s{r} AS MATERIALIZED (
          SELECT i, j, s FROM s{r}_nd
          UNION ALL
          SELECT doc_id, doc_id, 1.0 FROM documents)""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT round(s, 6) AS s, count(*)::BIGINT AS n_pairs "
            f"FROM s{iters} WHERE i < j "
            f"GROUP BY 1 ORDER BY s DESC")


def q_doc_simrank(sf_dir):
    """SimRank rounded-score histogram after 3 rounds (algos.simrank,
    Jeh & Widom 2002): identity diagonal handled as a once-materialized
    bucketed wedge emission, ONE pair-bucket shuffle per round, gated
    CSR/degree broadcasts (see the module docstring's honest quadratic
    scale notes + prune_eps knob).  The histogram verifies EVERY
    nonzero pair, a stronger surface than a tie-flooded top-k."""
    from .algos.simrank import SIMRANK_C, SIMRANK_ITERS, \
        simrank_score_hist

    edges = documents_edges(sf_dir)
    return simrank_score_hist(edges, documents_n_vertices(sf_dir),
                              iters=SIMRANK_ITERS, c=SIMRANK_C)


ORACLE_SQL["doc_simrank"] = _simrank_sql(3, 0.8)
QUERIES["doc_simrank"] = q_doc_simrank


def q_events_window_uniques(sf_dir):
    """Trailing 7-day sliding distinct actives per window-start day
    (windows.sliding_uniques): exact rolling uniques with no distinct
    shuffle — (user, day) dedup inside coarse user buckets, per-window
    partial counts, calendar-bounded driver fold."""
    from .windows import sliding_uniques

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"])
    return sliding_uniques(ev)


ORACLE_SQL["events_window_uniques"] = """
    WITH d AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day FROM events),
    mm AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    w AS (SELECT unnest(range(lo, hi + 1)) AS w FROM mm),
    uw AS (SELECT DISTINCT d.user_id, w.w
           FROM d JOIN w ON d.day BETWEEN w.w AND w.w + 6)
    SELECT w AS window_start_day, count(*)::BIGINT AS n_users
    FROM uw GROUP BY 1 ORDER BY 1
"""
QUERIES["events_window_uniques"] = q_events_window_uniques


def q_sketch_quantiles(sf_dir):
    """Mergeable hash-sample quantile sketch over event values
    (sketch.hash_sample_quantiles): bottom-1024-by-sha256 deterministic
    sample, per-block k-smallest partials, no shuffle — the
    bounded-memory twin of the exact events_quantiles."""
    from .sketch import hash_sample_quantiles

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "value"])
    return hash_sample_quantiles(ev)


from .sketch import hash_sample_quantiles_sql as _hsq_sql  # noqa: E402

ORACLE_SQL["sketch_quantiles"] = _hsq_sql()
QUERIES["sketch_quantiles"] = q_sketch_quantiles


def q_media_histogram(sf_dir):
    """Per-channel 4-bucket intensity histograms over the REAL BMP
    decode lane (multimodal.HistogramStage, actor pool): exact integer
    counts including empty buckets; the oracle re-derives every pixel
    from the generator's closed form."""
    from .multimodal import histogram_images, images_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return histogram_images(images_from_documents(docs))


ORACLE_SQL["media_histogram"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 16 AS w, 8 + doc_id % 12 AS h
      FROM documents
    ), px AS (
      SELECT media_id, gx.x, gy.y, gc.c
      FROM m
      CROSS JOIN (SELECT unnest(range(24)) AS x) gx
      CROSS JOIN (SELECT unnest(range(20)) AS y) gy
      CROSS JOIN (SELECT unnest(range(3)) AS c) gc
      WHERE gx.x < w AND gy.y < h
    ), cnt AS (
      SELECT media_id, c AS ch,
             ((media_id * 131 + y * 17 + x * 7 + c * 3) % 256) // 64
                 AS bucket,
             count(*)::BIGINT AS n
      FROM px GROUP BY 1, 2, 3
    )
    SELECT m.media_id, gc.c::BIGINT AS ch, gb.b::BIGINT AS bucket,
           coalesce(cnt.n, 0)::BIGINT AS n
    FROM m
    CROSS JOIN (SELECT unnest(range(3)) AS c) gc
    CROSS JOIN (SELECT unnest(range(4)) AS b) gb
    LEFT JOIN cnt ON cnt.media_id = m.media_id AND cnt.ch = gc.c
                 AND cnt.bucket = gb.b
    ORDER BY 1, 2, 3
"""
QUERIES["media_histogram"] = q_media_histogram


def q_events_conversion_lag(sf_dir):
    """First-touch-to-first-purchase latency histogram in whole days
    (windows.conversion_lag_days): per-user double-min combiner +
    one coarse user-bucket groupby; only per-day partials leave the
    kernels."""
    from .windows import conversion_lag_days

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"])
    return conversion_lag_days(ev)


ORACLE_SQL["events_conversion_lag"] = """
    WITH f AS (
      SELECT user_id, min(epoch_us(ts)) AS am,
             min(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(ts) END) AS cm
      FROM events GROUP BY 1)
    SELECT ((cm - am) // 86400000000)::BIGINT AS lag_days,
           count(*)::BIGINT AS n_users
    FROM f WHERE cm IS NOT NULL
    GROUP BY 1 ORDER BY 1
"""
QUERIES["events_conversion_lag"] = q_events_conversion_lag


def _anf_sql(k: int, rounds: int) -> str:
    """Oracle for algos.anf.neighborhood_function: identical splitmix64
    register init ((v * 2^32 + r) avalanched in HUGEINT, top bit
    dropped), `rounds` unrolled min-relaxation rounds over the
    symmetric edges, then per-t left-associated register sums and the
    (k-1)/sum estimator, summed per vertex and rounded to 6."""
    m1 = _mulmod64_sql("h1", 0xFF51AFD7ED558CCD)
    m2 = _mulmod64_sql("h3", 0xC4CEB9FE1A85EC53)
    ctes = [
        f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
        f"""h0t AS (SELECT doc_id AS v, gr.r,
              ((doc_id::HUGEINT * 4294967296 + gr.r) % {_W64})::UBIGINT
                  AS h0
            FROM documents
            CROSS JOIN (SELECT unnest(range({k})) AS r) gr)""",
        "h1t AS (SELECT v, r, xor(h0, h0 >> 33) AS h1 FROM h0t)",
        f"h2t AS (SELECT v, r, {m1}::UBIGINT AS h2 FROM h1t)",
        "h3t AS (SELECT v, r, xor(h2, h2 >> 29) AS h3 FROM h2t)",
        f"h4t AS (SELECT v, r, {m2}::UBIGINT AS h4 FROM h3t)",
        """s0 AS MATERIALIZED (SELECT v, r,
              (xor(h4, h4 >> 32) >> 1)::BIGINT AS reg FROM h4t)""",
    ]
    for t in range(1, rounds + 1):
        p = f"s{t - 1}"
        ctes.append(f"""s{t} AS MATERIALIZED (
          SELECT p.v, p.r, least(p.reg, coalesce(m.reg, p.reg)) AS reg
          FROM {p} p LEFT JOIN (
            SELECT sym.dst AS v, q.r, min(q.reg) AS reg
            FROM sym JOIN {p} q ON q.v = sym.src GROUP BY 1, 2) m
          USING (v, r))""")
    two63 = "9223372036854775808.0"
    acc = " + ".join(
        f"max(CASE WHEN r = {r} THEN reg END) / {two63}"
        for r in range(k))
    sels = []
    for t in range(1, rounds + 1):
        sels.append(
            f"SELECT {t}::BIGINT AS t, round(sum(est), 6) AS nf FROM "
            f"(SELECT v, {k - 1}.0 / ({acc}) AS est FROM s{t} "
            f"GROUP BY v)")
    return (f"WITH {', '.join(ctes)} "
            + " UNION ALL ".join(sels) + " ORDER BY t")


def q_doc_anf(sf_dir):
    """Approximate neighborhood function N(t), t = 1..3 (algos.anf,
    HyperANF family with k = 8 independent min-hash registers): each
    register round is ONE ordinary min-combine superstep over the
    undirected doc graph; the sketch covers ALL vertices at once where
    exact BFS (doc_distance_dist) sweeps per seed."""
    from .algos.anf import ANF_K, ANF_ROUNDS, neighborhood_function

    eng = documents_engine(sf_dir, "undirected")
    return neighborhood_function(eng, k=ANF_K, rounds=ANF_ROUNDS)


ORACLE_SQL["doc_anf"] = _anf_sql(8, 3)
QUERIES["doc_anf"] = q_doc_anf


def _voterank_sql(k: int) -> str:
    """Oracle for algos.voterank: K unrolled vote-and-suppress rounds
    in the same exact integer units (va in 1/(2|E|) units, delta = |V|
    units), argmax with (score DESC, v ASC) selection, neighbor floor
    at 0.  Integer scores make every selection tie-proof."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "uc AS (SELECT count(*)::BIGINT AS u FROM sym)",
            "dc AS (SELECT count(*)::BIGINT AS d FROM documents)",
            """va0 AS MATERIALIZED (
      SELECT v, (SELECT u FROM uc) AS va FROM allv)""",
            "picked0 AS (SELECT CAST(NULL AS BIGINT) AS v, "
            "CAST(NULL AS BIGINT) AS rnk, CAST(NULL AS BIGINT) AS s "
            "WHERE 1 = 0)"]
    for r in range(1, k + 1):
        p = r - 1
        ctes.append(f"""sc{r} AS MATERIALIZED (
          SELECT allv.v, coalesce(m.s, 0)::BIGINT AS s
          FROM allv LEFT JOIN (
            SELECT sym.dst AS v, sum(va{p}.va) AS s
            FROM sym JOIN va{p} ON va{p}.v = sym.src GROUP BY 1) m
          USING (v))""")
        ctes.append(f"""sel{r} AS MATERIALIZED (
          SELECT v, s FROM sc{r}
          WHERE v NOT IN (SELECT v FROM picked{p})
          ORDER BY s DESC, v ASC LIMIT 1)""")
        ctes.append(f"""picked{r} AS MATERIALIZED (
          SELECT * FROM picked{p}
          UNION ALL SELECT v, {r} AS rnk, s FROM sel{r})""")
        ctes.append(f"""va{r} AS MATERIALIZED (
          SELECT q.v,
            CASE WHEN q.v = (SELECT v FROM sel{r}) THEN 0
                 WHEN q.v IN (SELECT dst FROM sym
                              WHERE src = (SELECT v FROM sel{r}))
                 THEN greatest(q.va - (SELECT d FROM dc), 0)
                 ELSE q.va END AS va
          FROM va{p} q)""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT rnk, v, round(s::DOUBLE / (SELECT u FROM uc), 6) "
            f"AS score FROM picked{k} ORDER BY rnk")


def q_doc_voterank(sf_dir):
    """Top-10 VoteRank influential spreaders (algos.voterank, Zhang et
    al. 2016): K vote-and-suppress rounds, each one add-combine scoring
    superstep + a max/min map_vertices argmax + one single-source
    suppression superstep; exact integer vote units make selection
    tie-proof across engines."""
    from .algos.voterank import VOTERANK_K, voterank

    eng = documents_engine(sf_dir, "undirected")
    return voterank(eng, k=VOTERANK_K)


ORACLE_SQL["doc_voterank"] = _voterank_sql(10)
QUERIES["doc_voterank"] = q_doc_voterank


def _kcenter_sql(k: int) -> str:
    """Oracle for ann.kcenter_greedy: normalized long-form vectors (the
    _kmeans_full_sql conventions), seed = min vec_id, then k-1 unrolled
    farthest-point rounds — mind = 1 - max dot over chosen, selection
    (mind DESC, vec_id ASC), NOT IN exclusion.  Same float-tie caveat
    as _kmeans_full_sql."""
    ctes = ["""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
            """nrm AS MATERIALIZED (
      SELECT vec_id, v,
             CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END AS nv
      FROM (SELECT vec_id, v,
            list_sum(list_transform(v, x -> x*x)) AS sq FROM emb))""",
            """sml AS MATERIALIZED (
      SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
             unnest(v) / nv AS x
      FROM nrm)""",
            """picked1 AS (
      SELECT 1::BIGINT AS rnk,
             (SELECT min(vec_id) FROM embeddings) AS v,
             0.0::DOUBLE AS dist)"""]
    for r in range(2, k + 1):
        p = f"picked{r - 1}"
        ctes.append(f"""mind{r} AS MATERIALIZED (
          SELECT vec_id, 1 - max(dot) AS mind FROM (
            SELECT s.vec_id, p.v AS cv, sum(s.x * cs.x) AS dot
            FROM sml s
            JOIN {p} p ON TRUE
            JOIN sml cs ON cs.vec_id = p.v AND cs.i = s.i
            GROUP BY s.vec_id, p.v)
          GROUP BY vec_id)""")
        ctes.append(f"""sel{r} AS MATERIALIZED (
          SELECT vec_id, mind FROM mind{r}
          WHERE vec_id NOT IN (SELECT v FROM {p})
          ORDER BY mind DESC, vec_id ASC LIMIT 1)""")
        ctes.append(f"""picked{r} AS MATERIALIZED (
          SELECT * FROM {p}
          UNION ALL SELECT {r}::BIGINT, vec_id, mind FROM sel{r})""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT rnk, v AS vec_id, round(dist, 6) AS dist "
            f"FROM picked{k} ORDER BY rnk")


def q_embed_kcenter(sf_dir):
    """Greedy k-center coreset selection (ann.kcenter_greedy, Gonzalez
    farthest-point traversal — the diversity-sampling primitive of data
    curation): chosen centers broadcast once per round, every block
    emits one winner row, argmax is a partial-top-1."""
    from .ann import KCENTER_K, kcenter_greedy

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    return kcenter_greedy(vecs, k=KCENTER_K)


ORACLE_SQL["embed_kcenter"] = _kcenter_sql(8)
QUERIES["embed_kcenter"] = q_embed_kcenter


def q_text_llr(sf_dir):
    """Dunning log-likelihood-ratio collocations (text.llr_phrases):
    the count-robust alternative to PMI over the SAME shared candidate
    scan — distributed bigram counts + candidate-only unigram pass,
    G^2 evaluated driver-side over n_cand rows."""
    from .text import llr_phrases

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    return llr_phrases(docs, min_count=PMI_MIN_COUNT,
                       n_cand=PMI_CAND, k=PMI_K)


ORACLE_SQL["text_llr"] = f"""
    WITH wl AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text,
             '\\s+'), x -> x <> '') AS l
      FROM documents),
    w AS (SELECT doc_id, unnest(l) AS w,
                 generate_subscripts(l, 1) AS i FROM wl),
    big AS (
      SELECT w || ' ' || w2 AS bigram FROM (
        SELECT doc_id, w,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        FROM w) WHERE w2 IS NOT NULL),
    bc AS (SELECT bigram, count(*)::BIGINT AS n
           FROM big GROUP BY bigram),
    cand AS (SELECT bigram, n FROM bc WHERE n >= {PMI_MIN_COUNT}
             ORDER BY n DESC, bigram LIMIT {PMI_CAND}),
    uc AS (SELECT w, count(*)::DOUBLE AS cn FROM w GROUP BY w),
    tot AS (SELECT count(*)::DOUBLE AS t FROM w),
    p AS (
      SELECT cand.bigram, cand.n,
             round(2 * (
               (CASE WHEN cand.n > 0 THEN cand.n * ln(cand.n * tot.t
                  / (ua.cn * ub.cn)) ELSE 0 END)
             + (CASE WHEN ua.cn - cand.n > 0 THEN (ua.cn - cand.n)
                  * ln((ua.cn - cand.n) * tot.t
                       / (ua.cn * (tot.t - ub.cn))) ELSE 0 END)
             + (CASE WHEN ub.cn - cand.n > 0 THEN (ub.cn - cand.n)
                  * ln((ub.cn - cand.n) * tot.t
                       / ((tot.t - ua.cn) * ub.cn)) ELSE 0 END)
             + (CASE WHEN tot.t - ua.cn - ub.cn + cand.n > 0
                  THEN (tot.t - ua.cn - ub.cn + cand.n)
                  * ln((tot.t - ua.cn - ub.cn + cand.n) * tot.t
                       / ((tot.t - ua.cn) * (tot.t - ub.cn)))
                  ELSE 0 END)), 6) AS llr
      FROM cand, tot
      JOIN uc ua ON ua.w = split_part(cand.bigram, ' ', 1)
      JOIN uc ub ON ub.w = split_part(cand.bigram, ' ', 2))
    SELECT bigram, n, llr FROM p
    ORDER BY llr DESC, bigram LIMIT {PMI_K}
"""
QUERIES["text_llr"] = q_text_llr


SKEW_PARTS = 64


def q_events_skew(sf_dir):
    """Partition-skew diagnostic for hash-partitioning the events log by
    user_id into SKEW_PARTS parts — the planning report a distributed
    engine consults before picking a shuffle key: per-part row counts
    via map-side bincount partials (a 64-long array per block, merged
    on the driver), then exact integer stats — max / min / lower-median
    part size and skew_milli = max * parts * 1000 // total (1000 =
    perfectly balanced)."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(u % SKEW_PARTS, minlength=SKEW_PARTS)
        return pa.table({"part": pa.array(np.arange(SKEW_PARTS,
                                                    dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    cnt = np.zeros(SKEW_PARTS, np.int64)
    g = parts.groupby("part")["n"].sum()
    cnt[g.index.to_numpy(np.int64)] = g.to_numpy(np.int64)
    s = np.sort(cnt)
    total = int(cnt.sum())
    rows = [("max_part_rows", int(s[-1])),
            ("median_part_rows", int(s[SKEW_PARTS // 2 - 1])),
            ("min_part_rows", int(s[0])),
            ("skew_milli", int(s[-1]) * SKEW_PARTS * 1000 // max(total,
                                                                 1))]
    return pd.DataFrame({"stat": [r[0] for r in rows],
                         "value": np.array([r[1] for r in rows],
                                           np.int64)})


ORACLE_SQL["events_skew"] = f"""
    WITH c AS (
      SELECT user_id % {SKEW_PARTS} AS part, count(*)::BIGINT AS n
      FROM events GROUP BY 1),
    f AS (SELECT gp.p AS part, coalesce(c.n, 0)::BIGINT AS n
          FROM (SELECT unnest(range({SKEW_PARTS})) AS p) gp
          LEFT JOIN c ON c.part = gp.p),
    r AS (SELECT n, row_number() OVER (ORDER BY n) AS rn FROM f),
    t AS (SELECT sum(n)::BIGINT AS total, max(n)::BIGINT AS mx,
                 min(n)::BIGINT AS mn FROM f),
    md AS (SELECT n AS med FROM r WHERE rn = {SKEW_PARTS // 2})
    SELECT 'max_part_rows' AS stat, mx AS value FROM t
    UNION ALL SELECT 'median_part_rows', med FROM md
    UNION ALL SELECT 'min_part_rows', mn FROM t
    UNION ALL SELECT 'skew_milli',
        mx * {SKEW_PARTS} * 1000 // greatest(total, 1) FROM t
"""
QUERIES["events_skew"] = q_events_skew


def _mmr_sql(k: int, lam: float, qid: int) -> str:
    """Oracle for ann.mmr_rerank: the kcenter-style unrolled greedy
    chain with score = lam*rel - (1-lam)*max-chosen-sim.  The (1-lam)
    literal is injected as repr(1.0 - lam) so the float is THE SAME
    double as the engine's (1.0 - 0.7 != 0.3 exactly).  Same float-tie
    caveat as _kmeans_full_sql."""
    om = repr(1.0 - lam)
    lm = repr(lam)
    ctes = ["""emb AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""",
            """nrm AS MATERIALIZED (
      SELECT vec_id, v,
             CASE WHEN sq = 0 THEN 1.0 ELSE sqrt(sq) END AS nv
      FROM (SELECT vec_id, v,
            list_sum(list_transform(v, x -> x*x)) AS sq FROM emb))""",
            """sml AS MATERIALIZED (
      SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
             unnest(v) / nv AS x
      FROM nrm)""",
            f"""rl AS MATERIALIZED (
      SELECT s.vec_id, sum(s.x * q.x) AS rel
      FROM sml s JOIN sml q ON q.vec_id = {qid} AND q.i = s.i
      GROUP BY s.vec_id)""",
            f"""sel1 AS MATERIALIZED (
      SELECT vec_id, {lm} * rel AS score FROM rl
      WHERE vec_id <> {qid}
      ORDER BY score DESC, vec_id ASC LIMIT 1)""",
            """picked1 AS (
      SELECT 1::BIGINT AS rnk, vec_id AS v, score FROM sel1)"""]
    for r in range(2, k + 1):
        p = f"picked{r - 1}"
        ctes.append(f"""ms{r} AS MATERIALIZED (
          SELECT vec_id, max(d) AS ms FROM (
            SELECT s.vec_id, p.v AS cv, sum(s.x * cs.x) AS d
            FROM sml s
            JOIN {p} p ON TRUE
            JOIN sml cs ON cs.vec_id = p.v AND cs.i = s.i
            GROUP BY s.vec_id, p.v)
          GROUP BY vec_id)""")
        ctes.append(f"""sel{r} AS MATERIALIZED (
          SELECT rl.vec_id, {lm} * rl.rel - {om} * m.ms AS score
          FROM rl JOIN ms{r} m USING (vec_id)
          WHERE rl.vec_id <> {qid}
            AND rl.vec_id NOT IN (SELECT v FROM {p})
          ORDER BY score DESC, vec_id ASC LIMIT 1)""")
        ctes.append(f"""picked{r} AS (
          SELECT * FROM {p}
          UNION ALL SELECT {r}::BIGINT, vec_id, score FROM sel{r})""")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT rnk, v AS vec_id, round(score, 6) AS score "
            f"FROM picked{k} ORDER BY rnk")


def q_embed_mmr(sf_dir):
    """Maximal-marginal-relevance diversity re-ranking
    (ann.mmr_rerank, Carbonell & Goldstein 1998): greedy
    relevance-vs-diversity selection against the broadcast query +
    chosen set, one winner row per block per round."""
    from .ann import MMR_K, MMR_LAMBDA, mmr_rerank

    vecs = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
    return mmr_rerank(vecs, query_id=ANN_QUERY_IDS[0], k=MMR_K,
                      lam=MMR_LAMBDA)


ORACLE_SQL["embed_mmr"] = _mmr_sql(10, 0.7, 0)
QUERIES["embed_mmr"] = q_embed_mmr


def q_corpus_card(sf_dir):
    """Per-source dataset card (the datasheet a curation run publishes):
    (source, n_docs, n_tokens, mean_quality, n_dup_docs) — doc/token
    counts and quality sums as map-side partials over the bounded
    source domain; exact-dup membership (docs whose sha256 appears >= 2
    times corpus-wide) counted inside ONE coarse sha-bucket groupby (a
    sha's rows land in one bucket, so dup membership is globally
    exact), emitting only per-source partial counts."""
    from .algos.triangles import n_buckets_for
    from .hashing import add_sha256
    from .text import TOKEN_RE, add_quality

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "source", "text"]) \
        .materialize()

    def stats_part(b: pa.Table) -> pa.Table:
        q = add_quality(b)["quality"].to_numpy(zero_copy_only=False)
        toks = pc.cast(pc.count_substring_regex(b["text"], TOKEN_RE),
                       pa.int64()).to_numpy(zero_copy_only=False)
        f = pd.DataFrame({"source": b["source"].to_numpy(
            zero_copy_only=False), "t": toks, "q": q}) \
            .groupby("source", sort=False).agg(
                n_docs=("t", "size"), n_tokens=("t", "sum"),
                qsum=("q", "sum")).reset_index()
        return pa.table({
            "source": pa.array(f["source"].to_numpy(object),
                               pa.string()),
            "n_docs": pa.array(f["n_docs"].to_numpy(np.int64)),
            "n_tokens": pa.array(f["n_tokens"].to_numpy(np.int64)),
            "qsum": pa.array(f["qsum"].to_numpy(np.float64))})

    stats = docs.map_batches(stats_part, batch_format="pyarrow") \
        .to_pandas().groupby("source", sort=True) \
        .agg({"n_docs": "sum", "n_tokens": "sum", "qsum": "sum"})

    nb = n_buckets_for(docs.count())

    def sha_part(b: pa.Table) -> pa.Table:
        t = add_sha256(b, col="text")
        hb = (pd.util.hash_array(
            t["sha256"].to_numpy(zero_copy_only=False).astype(object))
            % np.uint64(nb)).astype(np.int64)
        return pa.table({"sha": t["sha256"], "source": b["source"],
                         "hb": pa.array(hb)})

    def dup_kern(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("sha")["sha"].transform("size")
        dup = g[c >= 2]
        out = dup.groupby("source", sort=False).size() \
            .rename("n").reset_index()
        return out

    dups = docs.map_batches(sha_part, batch_format="pyarrow") \
        .groupby("hb").map_groups(dup_kern, batch_format="pandas") \
        .to_pandas()
    dup_by_src = dups.groupby("source")["n"].sum() if len(dups) \
        else pd.Series(dtype=np.int64)

    out = stats.reset_index()
    out["mean_quality"] = np.round(
        out["qsum"].to_numpy() / out["n_docs"].to_numpy(), 6)
    out["n_dup_docs"] = out["source"].map(dup_by_src).fillna(0) \
        .astype(np.int64)
    return out[["source", "n_docs", "n_tokens", "mean_quality",
                "n_dup_docs"]].astype({"n_docs": np.int64,
                                       "n_tokens": np.int64}) \
        .reset_index(drop=True)


ORACLE_SQL["corpus_card"] = f"""
    WITH q AS ({_quality_sql()}),
    base AS (
      SELECT d.source, count(*)::BIGINT AS n_docs,
             sum(len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                                 x -> x <> '')))::BIGINT AS n_tokens,
             round(sum(q.quality) / count(*), 6) AS mean_quality
      FROM documents d JOIN q USING (doc_id) GROUP BY 1),
    m AS (SELECT sha256(text) AS h FROM documents
          GROUP BY 1 HAVING count(*) >= 2),
    dup AS (SELECT d.source, count(*)::BIGINT AS n_dup
            FROM documents d JOIN m ON sha256(d.text) = m.h
            GROUP BY 1)
    SELECT base.source, base.n_docs, base.n_tokens, base.mean_quality,
           coalesce(dup.n_dup, 0)::BIGINT AS n_dup_docs
    FROM base LEFT JOIN dup USING (source) ORDER BY base.source
"""
QUERIES["corpus_card"] = q_corpus_card


def q_events_paths(sf_dir):
    """Top-10 three-step event-type paths (windows.top_paths): per-user
    ordered adjacency inside coarse user buckets, catalog-bounded path
    partials, driver fold."""
    from .windows import top_paths

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"])
    return top_paths(ev)


ORACLE_SQL["events_paths"] = """
    WITH s AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    p AS (SELECT t1 || '/' || t2 || '/' || t3 AS path,
                 count(*)::BIGINT AS n
          FROM s WHERE t3 IS NOT NULL GROUP BY 1)
    SELECT path, n FROM p ORDER BY n DESC, path ASC LIMIT 10
"""
QUERIES["events_paths"] = q_events_paths


def q_doc_assort_directed(sf_dir):
    """Directed degree-correlation profile (Foster et al., PNAS 2010):
    the four Pearson coefficients r(alpha, beta) for alpha, beta in
    {in, out} over the canonical directed edges — (combo, r).  Exact
    int64 moment sums per combo (the q_doc_assortativity convention) so
    the float formula is bit-identical to SQL; degree vectors broadcast
    under BROADCAST_DEG_CAP, two hash joins above."""
    import ray

    from .algos.triangles import BROADCAST_DEG_CAP
    from .dedup import _join_parts

    edges = documents_edges(sf_dir).materialize()
    from ray.data.aggregate import Count

    def degs(col, name):
        return edges.groupby(col).aggregate(Count()) \
            .map_batches(lambda b, c=col, n=name: pa.table(
                {"v": b[c], n: pc.cast(b["count()"], pa.int64())}),
                batch_format="pyarrow")

    COMBOS = ["in-in", "in-out", "out-in", "out-out"]

    def moment_rows(sout, sin, tout, tin):
        xs = {"in-in": (sin, tin), "in-out": (sin, tout),
              "out-in": (sout, tin), "out-out": (sout, tout)}
        tabs = []
        for cname in COMBOS:
            x, y = xs[cname]
            tabs.append(pa.table({
                "combo": pa.array([cname], pa.string()),
                "m": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64())}))
        return pa.concat_tables(tabs)

    n_v = documents_n_vertices(sf_dir)
    if n_v <= BROADCAST_DEG_CAP:
        dout = np.zeros(n_v, np.int64)
        din = np.zeros(n_v, np.int64)
        for name, arr in (("dout", dout), ("din", din)):
            f = degs("src" if name == "dout" else "dst", name) \
                .to_pandas()
            arr[f["v"].to_numpy(np.int64)] = f[name].to_numpy(np.int64)
        dref = ray.put((dout, din))

        def partial(b: pa.Table) -> pa.Table:
            do_, di_ = ray.get(dref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return moment_rows(do_[s], di_[s], do_[d], di_[d])

        parts = edges.map_batches(partial, batch_format="pyarrow")
    else:
        dv = degs("src", "dout").materialize() \
            .join(degs("dst", "din").materialize(),
                  join_type="full_outer",
                  num_partitions=_join_parts(n_v), on=("v",)) \
            .map_batches(lambda b: pa.table({
                "v": b["v"],
                "dout": pc.coalesce(b["dout"], pa.scalar(0)),
                "din": pc.coalesce(b["din"], pa.scalar(0))}),
                batch_format="pyarrow").materialize()
        pn = _join_parts(edges.count())
        j = edges.join(dv.map_batches(lambda b: pa.table(
            {"src": b["v"], "sout": b["dout"], "sin": b["din"]}),
            batch_format="pyarrow"), join_type="inner",
            num_partitions=pn, on=("src",))
        j = j.join(dv.map_batches(lambda b: pa.table(
            {"dst": b["v"], "tout": b["dout"], "tin": b["din"]}),
            batch_format="pyarrow"), join_type="inner",
            num_partitions=pn, on=("dst",))
        parts = j.map_batches(lambda b: moment_rows(
            b["sout"].to_numpy(zero_copy_only=False),
            b["sin"].to_numpy(zero_copy_only=False),
            b["tout"].to_numpy(zero_copy_only=False),
            b["tin"].to_numpy(zero_copy_only=False)),
            batch_format="pyarrow")

    p = parts.to_pandas().groupby("combo", sort=True).sum()
    out_rows = []
    for cname in COMBOS:
        r = p.loc[cname]
        m = float(r["m"])
        cov = r["sxy"] / m - (r["sx"] / m) * (r["sy"] / m)
        vx = r["sxx"] / m - (r["sx"] / m) ** 2
        vy = r["syy"] / m - (r["sy"] / m) ** 2
        val = 0.0 if vx * vy == 0 else float(cov / np.sqrt(vx * vy))
        out_rows.append((cname, round(val, 6)))
    return pd.DataFrame({"combo": [c for c, _ in out_rows],
                         "r": np.array([v for _, v in out_rows],
                                       np.float64)})


ORACLE_SQL["doc_assort_directed"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    dou AS (SELECT src AS v, count(*)::BIGINT AS dout
            FROM e GROUP BY 1),
    din AS (SELECT dst AS v, count(*)::BIGINT AS din
            FROM e GROUP BY 1),
    x AS MATERIALIZED (
      SELECT coalesce(so.dout, 0) AS sout, coalesce(si.din, 0) AS sin,
             coalesce(to_.dout, 0) AS tout, coalesce(ti.din, 0) AS tin
      FROM e LEFT JOIN dou so ON so.v = e.src
             LEFT JOIN din si ON si.v = e.src
             LEFT JOIN dou to_ ON to_.v = e.dst
             LEFT JOIN din ti ON ti.v = e.dst),
    c(combo) AS (VALUES ('in-in'), ('in-out'),
                        ('out-in'), ('out-out')),
    mm AS (
      SELECT c.combo,
             count(*)::BIGINT AS m,
             sum(CASE WHEN c.combo LIKE 'in%' THEN sin
                 ELSE sout END)::BIGINT AS sx,
             sum(CASE WHEN c.combo LIKE '%-in' THEN tin
                 ELSE tout END)::BIGINT AS sy,
             sum((CASE WHEN c.combo LIKE 'in%' THEN sin ELSE sout END)
               * (CASE WHEN c.combo LIKE '%-in' THEN tin
                  ELSE tout END))::BIGINT AS sxy,
             sum((CASE WHEN c.combo LIKE 'in%' THEN sin ELSE sout END)
               * (CASE WHEN c.combo LIKE 'in%' THEN sin
                  ELSE sout END))::BIGINT AS sxx,
             sum((CASE WHEN c.combo LIKE '%-in' THEN tin ELSE tout END)
               * (CASE WHEN c.combo LIKE '%-in' THEN tin
                  ELSE tout END))::BIGINT AS syy
      FROM x CROSS JOIN c GROUP BY 1)
    SELECT combo,
           CASE WHEN (sxx / (1.0 * m) - (sx / (1.0 * m))
                      * (sx / (1.0 * m)))
                   * (syy / (1.0 * m) - (sy / (1.0 * m))
                      * (sy / (1.0 * m))) = 0 THEN 0.0
                ELSE round((sxy / (1.0 * m) - (sx / (1.0 * m))
                            * (sy / (1.0 * m)))
                  / sqrt((sxx / (1.0 * m) - (sx / (1.0 * m))
                          * (sx / (1.0 * m)))
                       * (syy / (1.0 * m) - (sy / (1.0 * m))
                          * (sy / (1.0 * m)))), 6) END AS r
    FROM mm ORDER BY combo
"""
QUERIES["doc_assort_directed"] = q_doc_assort_directed


def q_media_zcr(sf_dir):
    """REAL audio zero-crossing-rate lane: WAV decode -> adjacent
    sign-class flips + exact int64 absolute-amplitude sum per clip
    (multimodal.ZeroCrossStage, actor pool).  All-integer, so the SQL
    oracle is the generator closed form with the i-1 sample computed
    directly (no window function needed)."""
    from .multimodal import audio_from_documents, zero_crossings

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return zero_crossings(audio_from_documents(docs))


ORACLE_SQL["media_zcr"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             400 + (strlen(text) * 7) % 800 AS n
      FROM documents
    ), s AS (
      SELECT media_id, n, i,
             ((media_id + 1) * 2654435761 + i * 97003)
               % 65536 - 32768 AS v,
             ((media_id + 1) * 2654435761 + (i - 1) * 97003)
               % 65536 - 32768 AS vp
      FROM (SELECT media_id, n, unnest(range(n)) AS i FROM m)
    )
    SELECT media_id, max(n)::BIGINT AS n_samples,
           sum(CASE WHEN i >= 1 AND (v >= 0) <> (vp >= 0)
                    THEN 1 ELSE 0 END)::BIGINT AS zero_crossings,
           sum(abs(v))::BIGINT AS abs_amplitude
    FROM s GROUP BY media_id
"""
QUERIES["media_zcr"] = q_media_zcr


def q_tpch_profit(sf_dir):
    """TPC-H Q9-like profit per (supplier nation, order year) for
    parts matching a name token (relational.nation_profit): dimension
    broadcasts + ONE pruned lineitem x orders hash join, exact-cents
    bounded-domain partials."""
    return _REL.nation_profit(sf_dir)


ORACLE_SQL["tpch_profit"] = _REL.NATION_PROFIT_SQL
QUERIES["tpch_profit"] = q_tpch_profit


def q_tpch_supplier_parts(sf_dir):
    """TPC-H Q16-like distinct-supplier counts per (brand, type, size)
    class (relational.supplier_part_counts): partkey -> group-id
    broadcast, per-batch pair pre-dedup, ONE coarse hash-bucket
    distinct kernel, bounded-domain driver fold."""
    return _REL.supplier_part_counts(sf_dir)


ORACLE_SQL["tpch_supplier_parts"] = _REL.SUPPLIER_PART_COUNTS_SQL
QUERIES["tpch_supplier_parts"] = q_tpch_supplier_parts


# --------------------------------------------------------------- SCAN

def q_doc_scan(sf_dir):
    """SCAN structural clustering (Xu et al., KDD 2007) over the
    documents graph: exact-integer structural-similarity test
    (q^2 (supp+2)^2 >= p^2 (du+1)(dv+1), eps = p/q), cores by
    eps-neighborhood size, clusters = CC over core-core similar edges,
    border/hub/outlier roles -> per-vertex (v, cluster, role).
    Size-gated driver kernel vs distributed plan (support pipeline +
    gated lookup joins + superstep-engine CC) — algos/scan.py."""
    from .algos.scan import SCAN_CC_ROUNDS, scan_roles

    edges = documents_edges(sf_dir)
    n = documents_n_vertices(sf_dir)
    out, rep = scan_roles(edges, n,
                          store_root=_store_root(sf_dir, "scan"),
                          fingerprint=_input_fingerprint(sf_dir))
    _check_unroll(rep, SCAN_CC_ROUNDS, "doc_scan")
    return out


def _scan_sql(p: int, q: int, mu: int, rounds: int) -> str:
    """Full SCAN unrolled for DuckDB: triangle-support join, the same
    integer similarity test, HAVING-count cores, min-label CC rounds
    over the core-core similar subgraph, min-cluster borders,
    distinct-neighbor-cluster hubs."""
    ctes = [
        f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT src, dst FROM ce "
        "UNION ALL SELECT dst AS src, src AS dst FROM ce)",
        "deg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS d "
        "FROM sym GROUP BY src)",
        "supp AS MATERIALIZED ("
        "SELECT e.src, e.dst, count(*)::BIGINT AS s FROM ce e "
        "JOIN sym s1 ON s1.src = e.src "
        "JOIN sym s2 ON s2.src = e.dst AND s2.dst = s1.dst "
        "GROUP BY e.src, e.dst)",
        f"se AS MATERIALIZED ("
        f"SELECT e.src, e.dst FROM ce e "
        f"JOIN deg du ON du.v = e.src JOIN deg dv ON dv.v = e.dst "
        f"LEFT JOIN supp ON supp.src = e.src AND supp.dst = e.dst "
        f"WHERE {q * q} * (coalesce(supp.s, 0) + 2) "
        f"* (coalesce(supp.s, 0) + 2) "
        f">= {p * p} * (du.d + 1) * (dv.d + 1))",
        "ssym AS MATERIALIZED (SELECT src, dst FROM se "
        "UNION ALL SELECT dst AS src, src AS dst FROM se)",
        f"core AS MATERIALIZED (SELECT src AS v FROM ssym "
        f"GROUP BY src HAVING count(*) + 1 >= {mu})",
        "cse AS MATERIALIZED (SELECT se.src, se.dst FROM se "
        "JOIN core c1 ON c1.v = se.src JOIN core c2 ON c2.v = se.dst)",
        "csym AS MATERIALIZED (SELECT src, dst FROM cse "
        "UNION ALL SELECT dst AS src, src AS dst FROM cse)",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM core)",
    ]
    for i in range(1, rounds + 1):
        pr = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT l.v, "
            f"least(l.lab, coalesce(m.lab, l.lab)) AS lab "
            f"FROM {pr} l LEFT JOIN "
            f"(SELECT csym.dst AS v, min(pp.lab) AS lab FROM csym "
            f"JOIN {pr} pp ON pp.v = csym.src GROUP BY csym.dst) m "
            f"USING (v))")
    ctes += [
        f"cl AS MATERIALIZED (SELECT v, lab AS cluster FROM l{rounds})",
        "border AS MATERIALIZED ("
        "SELECT b.v, min(cl.cluster) AS cluster FROM "
        "(SELECT ssym.dst AS v, ssym.src AS cv FROM ssym "
        "JOIN core ON core.v = ssym.src) b "
        "JOIN cl ON cl.v = b.cv "
        "WHERE b.v NOT IN (SELECT v FROM core) GROUP BY b.v)",
        "member AS MATERIALIZED (SELECT v, cluster FROM cl "
        "UNION ALL SELECT v, cluster FROM border)",
        "hubcnt AS MATERIALIZED ("
        "SELECT sym.src AS v, count(DISTINCT member.cluster) AS hc "
        "FROM sym JOIN member ON member.v = sym.dst GROUP BY sym.src)",
        "allv AS (SELECT doc_id AS v FROM documents)",
    ]
    return (
        f"WITH {', '.join(ctes)} "
        "SELECT allv.v, "
        "coalesce(cl.cluster, border.cluster, -1)::BIGINT AS cluster, "
        "CASE WHEN cl.v IS NOT NULL THEN 'core' "
        "WHEN border.v IS NOT NULL THEN 'border' "
        "WHEN coalesce(hubcnt.hc, 0) >= 2 THEN 'hub' "
        "ELSE 'outlier' END AS role "
        "FROM allv LEFT JOIN cl ON cl.v = allv.v "
        "LEFT JOIN border ON border.v = allv.v "
        "LEFT JOIN hubcnt ON hubcnt.v = allv.v")


from .algos.scan import EPS as _SCAN_EPS, MU as _SCAN_MU, \
    SCAN_CC_ROUNDS as _SCAN_ROUNDS  # noqa: E402

ORACLE_SQL["doc_scan"] = _scan_sql(_SCAN_EPS[0], _SCAN_EPS[1],
                                   _SCAN_MU, _SCAN_ROUNDS)
QUERIES["doc_scan"] = q_doc_scan


def q_doc_squares(sf_dir):
    """Exact 4-cycle (square) count of the documents graph:
    squares = (1/2) sum over vertex pairs of C(common_neighbors, 2) —
    apex-bucketed sliced wedge emission + one pair-bucket count fold
    (algos/triangles.square_count; driver kernel under the edge AND
    wedge-volume gates)."""
    from .algos.triangles import square_count

    n = square_count(documents_edges(sf_dir))
    return pd.DataFrame({"squares": pd.Series([n], dtype=np.int64)})


ORACLE_SQL["doc_squares"] = f"""
    WITH ce AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT src, dst FROM ce
                         UNION ALL SELECT dst AS src, src AS dst FROM ce),
    wp AS (SELECT s1.dst AS u, s2.dst AS w, count(*)::BIGINT AS c
           FROM sym s1 JOIN sym s2
             ON s1.src = s2.src AND s1.dst < s2.dst
           GROUP BY s1.dst, s2.dst)
    SELECT coalesce(sum(c * (c - 1) // 2) // 2, 0)::BIGINT AS squares
    FROM wp
"""
QUERIES["doc_squares"] = q_doc_squares


def q_media_loudness(sf_dir):
    """REAL audio loudness lane: WAV decode -> exact int64 energy
    (sum v^2), peak |v|, clipped-sample count per clip
    (multimodal.LoudnessStage, actor pool).  All-integer, so the SQL
    oracle is the generator closed form."""
    from .multimodal import audio_from_documents, loudness

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return loudness(audio_from_documents(docs))


ORACLE_SQL["media_loudness"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             400 + (strlen(text) * 7) % 800 AS n
      FROM documents
    ), s AS (
      SELECT media_id, n,
             ((media_id + 1) * 2654435761 + i * 97003)
               % 65536 - 32768 AS v
      FROM (SELECT media_id, n, unnest(range(n)) AS i FROM m)
    )
    SELECT media_id, max(n)::BIGINT AS n_samples,
           sum(v * v)::BIGINT AS energy,
           max(abs(v))::BIGINT AS peak,
           sum(CASE WHEN abs(v) >= 32000 THEN 1 ELSE 0 END)::BIGINT
             AS clipped
    FROM s GROUP BY media_id
"""
QUERIES["media_loudness"] = q_media_loudness


def q_tpch_copurchase(sf_dir):
    """Market-basket mining: top-20 part pairs by orders containing
    both (relational.copurchase_pairs): per-batch pre-dedup, ONE
    orderkey-bucket co-location, vectorized within-order pair
    generation, pair-bucket partial-top-k, driver fold."""
    return _REL.copurchase_pairs(sf_dir)


ORACLE_SQL["tpch_copurchase"] = _REL.COPURCHASE_SQL
QUERIES["tpch_copurchase"] = q_tpch_copurchase


def q_doc_densest(sf_dir):
    """Densest-subgraph 3-approximation by parallel peeling (Bahmani
    et al., VLDB 2012): each round removes every vertex whose
    alive-degree is <= (3/2) * average (exact integer threshold
    deg > (3*m2) // (2*n)), tracking the best-density round with an
    exact scaled-fraction key.  Driver kernel under the edge gate,
    else per-round gated alive-flag attaches + one degree shuffle
    (algos/densest.py)."""
    from .algos.densest import densest_subgraph

    out, _rep = densest_subgraph(documents_edges(sf_dir),
                                 documents_n_vertices(sf_dir))
    return out


def _densest_sql(rounds: int) -> str:
    ctes = [
        f"ce AS MATERIALIZED ({DOC_EDGES_SQL})",
        "sym AS MATERIALIZED (SELECT src, dst FROM ce "
        "UNION ALL SELECT dst AS src, src AS dst FROM ce)",
        "a0 AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
    ]
    for i in range(rounds + 1):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT s.src AS v, "
            f"count(*)::BIGINT AS c FROM sym s "
            f"JOIN a{i} x ON x.v = s.src JOIN a{i} y ON y.v = s.dst "
            f"GROUP BY s.src)")
        ctes.append(
            f"g{i} AS MATERIALIZED (SELECT "
            f"(SELECT count(*) FROM a{i})::BIGINT AS n, "
            f"(SELECT coalesce(sum(c), 0) FROM d{i})::BIGINT AS m2)")
        if i < rounds:
            ctes.append(
                f"a{i + 1} AS MATERIALIZED (SELECT a.v FROM a{i} a "
                f"LEFT JOIN d{i} d ON d.v = a.v, g{i} g "
                f"WHERE g.n > 0 AND coalesce(d.c, 0) > "
                f"(3 * g.m2) // (2 * greatest(g.n, 1)))")
    unions = " UNION ALL ".join(
        f"SELECT {i} AS r, n, m2 FROM g{i}" for i in range(rounds + 1))
    ctes.append(f"rounds AS ({unions})")
    return (
        f"WITH {', '.join(ctes)} "
        "SELECT r::BIGINT AS best_round, n AS n_sub, "
        "(m2 // 2)::BIGINT AS m_sub, "
        "round(m2 / (2.0 * n), 6) AS density "
        "FROM rounds WHERE n > 0 "
        "ORDER BY (m2::HUGEINT * 1000000000000000000000000) "
        "// (2 * n) DESC, r ASC LIMIT 1")


from .algos.densest import DENSEST_ROUNDS as _DENSEST_ROUNDS  # noqa: E402

ORACLE_SQL["doc_densest"] = _densest_sql(_DENSEST_ROUNDS)
QUERIES["doc_densest"] = q_doc_densest


def q_text_dsir(sf_dir):
    """DSIR data selection (Xie et al. 2023): per-doc hashed-unigram
    importance log-weight against the English subcorpus — two pruned
    passes (bounded-domain bucket histograms with map-side partials +
    driver fold, then scoring with the broadcast per-bucket log-diff
    table).  text.dsir_logweights."""
    from .text import dsir_logweights

    return dsir_logweights(sf_dir)


ORACLE_SQL["text_dsir"] = """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(list_filter(
          string_split_regex(text, '\\s+'), x -> x <> '')) AS w
      FROM documents
    ), tb AS MATERIALIZED (
      SELECT doc_id,
             (('0x' || substr(sha256(w), 1, 8))::UBIGINT
              % 1024)::BIGINT AS bk
      FROM toks
    ), src AS (SELECT bk, count(*)::BIGINT AS c FROM tb GROUP BY bk),
    tgt AS (SELECT tb.bk, count(*)::BIGINT AS c
            FROM tb JOIN documents USING (doc_id)
            WHERE lang = 'en' GROUP BY tb.bk),
    tots AS (SELECT (SELECT count(*) FROM tb) AS ts,
                    (SELECT count(*) FROM tb
                     JOIN documents USING (doc_id)
                     WHERE lang = 'en') AS tt),
    ld AS (SELECT src.bk,
                  ln((coalesce(tgt.c, 0) + 1.0) / (tots.tt + 1024))
                - ln((src.c + 1.0) / (tots.ts + 1024)) AS v
           FROM src LEFT JOIN tgt ON tgt.bk = src.bk, tots),
    sc AS (SELECT tb.doc_id, sum(ld.v) AS s
           FROM tb JOIN ld ON ld.bk = tb.bk GROUP BY tb.doc_id)
    SELECT d.doc_id, round(coalesce(sc.s, 0), 6) AS dsir_logw
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""
QUERIES["text_dsir"] = q_text_dsir


def q_doc_edge_jaccard(sf_dir):
    """Per-edge neighborhood-Jaccard histogram (the SCAN-style
    structural-similarity profile of the graph): jac = supp /
    (du + dv - supp), rounded 6, counted per distinct value
    (algos/scan.edge_jaccard_hist — driver kernel under the edge gate,
    else one pass over the shared support+degree edge Dataset)."""
    from .algos.scan import edge_jaccard_hist

    return edge_jaccard_hist(documents_edges(sf_dir),
                             documents_n_vertices(sf_dir))


ORACLE_SQL["doc_edge_jaccard"] = f"""
    WITH ce AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT src, dst FROM ce
                         UNION ALL SELECT dst AS src, src AS dst FROM ce),
    deg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS d
                         FROM sym GROUP BY src),
    supp AS MATERIALIZED (
      SELECT e.src, e.dst, count(*)::BIGINT AS s FROM ce e
      JOIN sym s1 ON s1.src = e.src
      JOIN sym s2 ON s2.src = e.dst AND s2.dst = s1.dst
      GROUP BY e.src, e.dst),
    j AS (SELECT round(coalesce(supp.s, 0)
                       / (du.d + dv.d - coalesce(supp.s, 0))::DOUBLE,
                       6) AS jac
          FROM ce e
          JOIN deg du ON du.v = e.src JOIN deg dv ON dv.v = e.dst
          LEFT JOIN supp ON supp.src = e.src AND supp.dst = e.dst)
    SELECT jac, count(*)::BIGINT AS n_edges
    FROM j GROUP BY jac ORDER BY jac
"""
QUERIES["doc_edge_jaccard"] = q_doc_edge_jaccard


def q_dedup_containment(sf_dir):
    """Near-SUBSET duplicates via exact shingle containment
    max(|I|/|A|, |I|/|B|) >= 0.8 (dedup.containment_pairs) — the
    asymmetric member of the near-dup family: catches a short doc
    quoted inside a long one whose Jaccard is diluted to |A|/|B|.
    Same deterministic inverted-index candidates (df-cap 64) and
    size-gated verify tail as dedup_jaccard."""
    from .dedup import containment_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    out = containment_pairs(docs, k=5, threshold=0.8, cap=64)
    if isinstance(out, pd.DataFrame):
        out["containment"] = out["containment"].round(6)
        return out
    return out.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("containment"), "containment",
            pc.round(b["containment"], ndigits=6)),
        batch_format="pyarrow")


ORACLE_SQL["dedup_containment"] = """
    WITH shd AS MATERIALIZED (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest(
                 CASE WHEN length(text) < 5 THEN [text]
                 ELSE list_transform(range(1, length(text) - 3),
                                     j -> substr(text, j::INT, 5))
                 END) AS sh
        FROM documents)
    ),
    sizes AS MATERIALIZED (
      SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id),
    capped AS MATERIALIZED (
      SELECT doc_id, sh FROM (
        SELECT doc_id, sh, row_number() OVER
               (PARTITION BY sh ORDER BY doc_id) AS rn
        FROM shd) WHERE rn <= 64
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM capped x JOIN capped y
        ON x.sh = y.sh AND x.doc_id < y.doc_id
    ),
    inter AS MATERIALIZED (
      SELECT c.a, c.b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.a
      JOIN shd sb ON sb.doc_id = c.b AND sb.sh = sa.sh
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b,
           round(i.i::DOUBLE / least(za.sz, zb.sz), 6) AS containment
    FROM inter i
    JOIN sizes za ON za.doc_id = i.a
    JOIN sizes zb ON zb.doc_id = i.b
    WHERE i.i::DOUBLE / least(za.sz, zb.sz) >= 0.8
"""
QUERIES["dedup_containment"] = q_dedup_containment


def q_tpch_audit(sf_dir):
    """Star-schema data-quality audit (relational.quality_audit):
    FK-orphan anti-joins via the gated lookup attach, childless-parent
    check, duplicate-PK coarse-bucket distinct kernel, domain scan —
    driver folds per-check scalars only."""
    return _REL.quality_audit(sf_dir)


ORACLE_SQL["tpch_audit"] = _REL.QUALITY_AUDIT_SQL
QUERIES["tpch_audit"] = q_tpch_audit


def q_media_vad(sf_dir):
    """REAL VAD-style audio lane: windowed energies -> voiced flags ->
    run-length stats (count / segments / longest) per clip
    (multimodal.VadStage, actor pool).  All-integer; the SQL twin
    rebuilds the windows from the generator closed form and finds the
    segments with the gaps-and-islands row_number trick."""
    from .multimodal import audio_from_documents, vad_segments

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return vad_segments(audio_from_documents(docs))


ORACLE_SQL["media_vad"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             400 + (strlen(text) * 7) % 800 AS n
      FROM documents
    ), s AS (
      SELECT media_id, n, i,
             ((media_id + 1) * 2654435761 + i * 97003)
               % 65536 - 32768 AS v
      FROM (SELECT media_id, n, unnest(range(n)) AS i FROM m)
    ), w AS (
      SELECT media_id, (i // 64)::BIGINT AS win,
             sum(v * v)::BIGINT AS e
      FROM s WHERE i < (n // 64) * 64
      GROUP BY media_id, (i // 64)
    ), voiced AS (
      SELECT media_id, win FROM w WHERE e > 22900000000
    ), isl AS (
      SELECT media_id,
             win - row_number() OVER (PARTITION BY media_id
                                      ORDER BY win) AS grp
      FROM voiced
    ), seg AS (
      SELECT media_id, grp, count(*)::BIGINT AS len
      FROM isl GROUP BY media_id, grp
    ), per AS (
      SELECT media_id, count(*)::BIGINT AS n_segments,
             max(len) AS longest_voiced
      FROM seg GROUP BY media_id
    ), base AS (
      SELECT w.media_id, count(*)::BIGINT AS n_windows,
             sum(CASE WHEN e > 22900000000 THEN 1 ELSE 0 END)::BIGINT
               AS n_voiced
      FROM w GROUP BY w.media_id
    )
    SELECT b.media_id, b.n_windows, b.n_voiced,
           coalesce(p.n_segments, 0)::BIGINT AS n_segments,
           coalesce(p.longest_voiced, 0)::BIGINT AS longest_voiced
    FROM base b LEFT JOIN per p ON p.media_id = b.media_id
"""
QUERIES["media_vad"] = q_media_vad


def q_events_holt(sf_dir):
    """Holt linear-trend double exponential smoothing of the daily
    revenue series (windows.daily_holt): exact integer-cents day sums
    from map-side partials; the (level, trend) recurrence over the
    calendar-bounded series is the identical float expression tree as
    the SQL twin's recursive CTE."""
    from .windows import daily_holt

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])
    return daily_holt(ev)


from .windows import HOLT_A as _HOLT_A, HOLT_B as _HOLT_B  # noqa: E402

ORACLE_SQL["events_holt"] = f"""
    WITH RECURSIVE c AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    d AS (SELECT day, sum(cents) AS cents FROM c GROUP BY day),
    r AS (SELECT day, cents,
                 row_number() OVER (ORDER BY day) AS i FROM d),
    s(i, day, cents, l, b) AS (
        SELECT i, day, cents, cents / 100.0,
               coalesce((SELECT r2.cents FROM r r2 WHERE r2.i = 2)
                        / 100.0 - cents / 100.0, 0.0)
        FROM r WHERE i = 1
        UNION ALL
        SELECT r.i, r.day, r.cents,
               ({_HOLT_A} / 10.0) * (r.cents / 100.0)
               + (1.0 - {_HOLT_A} / 10.0) * (s.l + s.b),
               ({_HOLT_B} / 10.0)
               * ((({_HOLT_A} / 10.0) * (r.cents / 100.0)
                   + (1.0 - {_HOLT_A} / 10.0) * (s.l + s.b)) - s.l)
               + (1.0 - {_HOLT_B} / 10.0) * s.b
        FROM s JOIN r ON r.i = s.i + 1)
    SELECT day, cents, round(l, 6) AS level, round(b, 6) AS trend,
           round(l + b, 6) AS forecast
    FROM s ORDER BY day
"""
QUERIES["events_holt"] = q_events_holt


SPEND_TILES = 4


def q_events_quartiles(sf_dir):
    """Per-user spend quartile WITHOUT a global sort: exact integer-
    cents user totals (per-batch partials + one coarse user-bucket
    merge), then quantiles.global_value_ranks range-partitioned ranking
    and the explicit tile formula ((rank-1)*4)//n + 1 (deterministic —
    NOT SQL NTILE, whose remainder rule differs; the SQL twin uses the
    identical formula)."""
    from .quantiles import global_value_ranks

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "value"])
    n_ev = ev.count()
    nb = max(8, min(1024, n_ev // 200_000 + 8))

    def part(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(u).sum()
        k = s.index.to_numpy(np.int64)
        return pa.table({"user_id": pa.array(k),
                         "cents": pa.array(s.to_numpy(np.int64)),
                         "ub": pa.array((k % nb).astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", sort=False)["cents"].sum()
        return pd.DataFrame({"user_id": s.index.to_numpy(np.int64),
                             "cents": s.to_numpy(np.int64)})

    spend = ev.map_batches(part, batch_format="pyarrow") \
              .groupby("ub").map_groups(merge, batch_format="pandas") \
              .materialize()
    n_users = spend.count()
    ranked = global_value_ranks(spend, "cents", "user_id")

    def tile(b: pa.Table) -> pa.Table:
        r = b["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = (r - 1) * SPEND_TILES // max(n_users, 1) + 1
        return pa.table({"user_id": b["user_id"],
                         "spend_quartile": pa.array(q)})

    return ranked.map_batches(tile, batch_format="pyarrow")


ORACLE_SQL["events_quartiles"] = f"""
    WITH s AS (
      SELECT user_id,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY user_id),
    r AS (SELECT user_id,
                 row_number() OVER (ORDER BY cents, user_id) AS rnk,
                 (SELECT count(*) FROM s) AS n
          FROM s)
    SELECT user_id,
           ((rnk - 1) * {SPEND_TILES} // n + 1)::BIGINT
             AS spend_quartile
    FROM r
"""
QUERIES["events_quartiles"] = q_events_quartiles


def q_doc_triangles_approx(sf_dir):
    """Deterministic wedge-sampling triangle ESTIMATE (the documented
    10^12-file scale path for the exact north-rule counter,
    algos/triangles.approx_triangle_count): degree-oriented wedges,
    1/4 avalanche-hash sample, closure probes only for kept wedges,
    estimate = closed * n_wedges / n_sampled.  The sample is a pure
    function of (apex, x, y), so the SQL twin reproduces every kept
    wedge bit-for-bit (HUGEINT % 2^64)."""
    from .algos.triangles import approx_triangle_count

    return approx_triangle_count(documents_edges(sf_dir))


def _approx_tri_sql() -> str:
    from .algos.triangles import (TRI_SAMPLE_KEEP, _AV_M1, _AV_M2,
                                  _WH_A, _WH_B, _WH_C)

    m1 = _mulmod64_sql("h1", _AV_M1)
    m2 = _mulmod64_sql("h3", _AV_M2)
    return f"""
    WITH ce AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT src, dst FROM ce
                         UNION ALL SELECT dst AS src, src AS dst FROM ce),
    deg AS MATERIALIZED (SELECT src AS v, count(*)::BIGINT AS d
                         FROM sym GROUP BY src),
    oe AS MATERIALIZED (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
                  THEN e.src ELSE e.dst END AS a,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.src < e.dst)
                  THEN e.dst ELSE e.src END AS b
      FROM ce e JOIN deg du ON du.v = e.src
      JOIN deg dv ON dv.v = e.dst),
    w AS MATERIALIZED (
      SELECT o1.a AS apex, o1.b AS x, o2.b AS y
      FROM oe o1 JOIN oe o2 ON o1.a = o2.a
      JOIN deg dx ON dx.v = o1.b JOIN deg dy ON dy.v = o2.b
      WHERE dx.d < dy.d OR (dx.d = dy.d AND o1.b < o2.b)),
    h0t AS (SELECT x, y,
            (((apex::HUGEINT * {_WH_A}) + (x::HUGEINT * {_WH_B})
              + (y::HUGEINT * {_WH_C})) % {_W64})::UBIGINT AS h0
            FROM w),
    h1t AS (SELECT x, y, xor(h0, h0 >> 33) AS h1 FROM h0t),
    h2t AS (SELECT x, y, {m1}::UBIGINT AS h2 FROM h1t),
    h3t AS (SELECT x, y, xor(h2, h2 >> 29) AS h3 FROM h2t),
    h4t AS (SELECT x, y, {m2}::UBIGINT AS h4 FROM h3t),
    hf AS (SELECT x, y, xor(h4, h4 >> 32) AS h FROM h4t),
    kept AS MATERIALIZED (
      SELECT x, y FROM hf WHERE h < {TRI_SAMPLE_KEEP}::UBIGINT),
    cnts AS (SELECT (SELECT count(*) FROM w)::BIGINT AS n_wedges,
                    (SELECT count(*) FROM kept)::BIGINT AS n_sampled,
                    (SELECT count(*) FROM kept k JOIN ce
                       ON ce.src = least(k.x, k.y)
                      AND ce.dst = greatest(k.x, k.y))::BIGINT
                      AS n_closed_sampled)
    SELECT n_wedges, n_sampled, n_closed_sampled,
           CASE WHEN n_sampled > 0 THEN
             round(n_closed_sampled::DOUBLE * n_wedges / n_sampled, 6)
           ELSE 0.0 END AS triangles_est
    FROM cnts
    """


ORACLE_SQL["doc_triangles_approx"] = _approx_tri_sql()
QUERIES["doc_triangles_approx"] = q_doc_triangles_approx


# CCNet terciles: the text_perplexity oracle nested verbatim, ranked per
# language with the same (rounded ppl, doc_id) order and third formula;
# min/max are order statistics of round-6 values (no cross-plan sums)
ORACLE_SQL["text_ccnet_buckets"] = f"""
    WITH p AS ({ORACLE_SQL["text_perplexity"]}),
    r AS (SELECT d.lang, p.doc_id, p.ppl,
                 row_number() OVER (PARTITION BY d.lang
                                    ORDER BY p.ppl, p.doc_id) AS rn,
                 count(*) OVER (PARTITION BY d.lang) AS nl
          FROM p JOIN documents d USING (doc_id))
    SELECT lang,
           CASE ((rn - 1) * 3) // nl WHEN 0 THEN 'head'
                WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
           count(*)::BIGINT AS n_docs,
           min(ppl) AS min_ppl, max(ppl) AS max_ppl
    FROM r GROUP BY lang, bucket
"""
QUERIES["text_ccnet_buckets"] = q_text_ccnet_buckets


def q_media_snr(sf_dir):
    """REAL SNR-style audio lane (multimodal.SnrStage): exact int64
    voiced/unvoiced energy split on the VAD windowing + one dB float
    expression computed from those integers — identical tree in SQL."""
    from .multimodal import audio_from_documents, audio_snr

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return audio_snr(audio_from_documents(docs))


ORACLE_SQL["media_snr"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             400 + (strlen(text) * 7) % 800 AS n
      FROM documents
    ), s AS (
      SELECT media_id, n, i,
             ((media_id + 1) * 2654435761 + i * 97003)
               % 65536 - 32768 AS v
      FROM (SELECT media_id, n, unnest(range(n)) AS i FROM m)
    ), w AS (
      SELECT media_id, (i // 64)::BIGINT AS win,
             sum(v * v)::BIGINT AS e
      FROM s WHERE i < (n // 64) * 64
      GROUP BY media_id, (i // 64)
    ), agg AS (
      SELECT media_id,
             sum(CASE WHEN e > 22900000000 THEN 1 ELSE 0 END)::BIGINT
               AS n_voiced,
             sum(CASE WHEN e > 22900000000 THEN 0 ELSE 1 END)::BIGINT
               AS n_unvoiced,
             sum(CASE WHEN e > 22900000000 THEN e ELSE 0 END)::BIGINT
               AS voiced_energy,
             sum(CASE WHEN e > 22900000000 THEN 0 ELSE e END)::BIGINT
               AS unvoiced_energy
      FROM w GROUP BY media_id
    ), base AS (
      SELECT d.doc_id AS media_id,
             coalesce(a.n_voiced, 0)::BIGINT AS n_voiced,
             coalesce(a.n_unvoiced, 0)::BIGINT AS n_unvoiced,
             coalesce(a.voiced_energy, 0)::BIGINT AS voiced_energy,
             coalesce(a.unvoiced_energy, 0)::BIGINT AS unvoiced_energy
      FROM documents d LEFT JOIN agg a ON a.media_id = d.doc_id
    )
    SELECT media_id, n_voiced, n_unvoiced, voiced_energy,
           unvoiced_energy,
           round(CASE WHEN n_voiced > 0 AND n_unvoiced > 0
                       AND unvoiced_energy > 0
                 THEN 10.0 * log10((voiced_energy::DOUBLE / n_voiced)
                      / (unvoiced_energy::DOUBLE / n_unvoiced))
                 ELSE 0.0 END, 6) AS snr_db
    FROM base
"""
QUERIES["media_snr"] = q_media_snr


# --------------------------------------------------------------- web lane
# C4/RefinedWeb-style URL operators (linkgraph/web.py): deterministic
# url derivation from doc_id (the media-lane pattern), a 5-step regex
# canonicalization chain identical in pandas and DuckDB, bounded-domain
# stats/blocklist partials, and a coarse-bucket canonical-url dedup.

_WEB_URL_SQL = """
    WITH mm AS (SELECT doc_id, (doc_id*7) % 400 AS m FROM documents)
    SELECT doc_id,
      (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://WWW.Site'
            ELSE 'https://www.site' END)
      || (CASE WHEN (m*37) % 100 < 30 THEN (m*53) % 3
               ELSE 3 + (m*53) % 47 END)::VARCHAR
      || (CASE WHEN doc_id % 7 = 0 THEN '.EXample' ELSE '.example' END)
      || (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END)
      || '/cat' || ((m*13) % 5)::VARCHAR
      || '/item' || m::VARCHAR
      || (CASE WHEN doc_id % 3 = 0 AND m % 3 = 0 THEN '/' ELSE '' END)
      || (CASE WHEN m % 3 = 0
               THEN (CASE WHEN doc_id % 4 = 0
                          THEN '?utm_source=feed' ELSE '' END)
               WHEN doc_id % 4 = 0
               THEN '?utm_source=feed&id=' || (m % 100)::VARCHAR
               WHEN doc_id % 4 = 1
               THEN '?id=' || (m % 100)::VARCHAR || '&utm_campaign=x'
               ELSE '?id=' || (m % 100)::VARCHAR END)
      || (CASE WHEN doc_id % 5 = 0
               THEN '#sec' || (doc_id % 3)::VARCHAR ELSE '' END) AS url
    FROM mm
"""

# the same 5-step chain as web.canonicalize, in DuckDB regexp functions
_WEB_CANON_SQL = f"""
    WITH u AS ({_WEB_URL_SQL}),
    n1 AS (SELECT doc_id, url,
                  regexp_replace(url, '#.*$', '') AS c FROM u),
    n2 AS (SELECT doc_id, url,
                  lower(regexp_extract(c, '^([a-zA-Z]+://[^/?#]*)', 1))
                  || regexp_replace(c, '^([a-zA-Z]+://[^/?#]*)', '')
                  AS c FROM n1),
    n3 AS (SELECT doc_id, url,
                  regexp_replace(c, '^(https://[^/:?#]*):443', '\\1')
                  AS c FROM n2),
    n4 AS (SELECT doc_id, url, regexp_replace(
                  regexp_replace(c, '([?&])utm_[a-z]+=[^&]*&', '\\1', 'g'),
                  '[?&]utm_[a-z]+=[^&]*$', '') AS c FROM n3)
    SELECT doc_id, url, regexp_replace(c, '/+$', '') AS canon FROM n4
"""


def q_web_urls(sf_dir):
    """(doc_id, url, canon): derived raw URL + the canonicalized form
    (web.urls_from_documents -> web.add_canonical).  Oracle: the same
    derivation + regex chain in DuckDB (_WEB_CANON_SQL)."""
    from .web import add_canonical, urls_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    return add_canonical(urls_from_documents(docs))


def q_web_domains(sf_dir):
    """(domain, n_docs, total_chars) per registered domain (www-stripped
    canonical host) — bounded-catalog partials, one small groupby."""
    from .web import domain_stats

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "n_chars"])
    return domain_stats(docs)


def q_web_block(sf_dir):
    """(lang, kept, dropped) after dropping the blocked hot domains —
    blocklist broadcast inside the kernel, lang-domain partials."""
    from .web import blocklist_counts

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang"])
    return blocklist_counts(docs)


def q_dedup_url(sf_dir):
    """(canon, n_dups, keep_id) for canonical URLs shared by >= 2 docs
    (mirror detection; keep = min doc_id).  One coarse canon-hash bucket
    shuffle with a vectorized in-bucket kernel."""
    from .web import url_dup_groups

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    return url_dup_groups(docs)


ORACLE_SQL["web_urls"] = _WEB_CANON_SQL
ORACLE_SQL["web_domains"] = f"""
    WITH c AS ({_WEB_CANON_SQL})
    SELECT regexp_extract(canon, '^https://(?:www\\.)?([^/:?#]+)', 1)
             AS domain,
           count(*)::BIGINT AS n_docs,
           sum(d.n_chars)::BIGINT AS total_chars
    FROM c JOIN documents d USING (doc_id)
    GROUP BY 1
"""
ORACLE_SQL["web_block"] = f"""
    WITH c AS ({_WEB_CANON_SQL}),
    t AS (SELECT d.lang,
                 regexp_extract(canon, '^https://(?:www\\.)?([^/:?#]+)', 1)
                 IN ('site0.example', 'site1.example', 'site2.example')
                 AS blocked
          FROM c JOIN documents d USING (doc_id))
    SELECT lang,
           sum(CASE WHEN blocked THEN 0 ELSE 1 END)::BIGINT AS kept,
           sum(CASE WHEN blocked THEN 1 ELSE 0 END)::BIGINT AS dropped
    FROM t GROUP BY lang
"""
ORACLE_SQL["dedup_url"] = f"""
    WITH c AS ({_WEB_CANON_SQL})
    SELECT canon, count(*)::BIGINT AS n_dups,
           min(doc_id)::BIGINT AS keep_id
    FROM c GROUP BY canon HAVING count(*) >= 2
"""
QUERIES["web_urls"] = q_web_urls
QUERIES["web_domains"] = q_web_domains
QUERIES["web_block"] = q_web_block
QUERIES["dedup_url"] = q_dedup_url


def q_text_classifier(sf_dir):
    """fastText-shaped hashed-linear quality scoring (one map-side pass:
    hashed signed bag-of-words -> broadcast weight dot -> sigmoid ->
    keep cut).  Weights are deterministic stand-ins (text.clf_weights);
    oracle: _classifier_sql — identical hash chain + weight derivation."""
    from .text import CLF_DIMS, classifier_scores

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return classifier_scores(docs, dims=CLF_DIMS)


ORACLE_SQL["text_classifier"] = _classifier_sql(1024)
QUERIES["text_classifier"] = q_text_classifier


def q_ann_hard_negatives(sf_dir):
    """Hard-negative mining for contrastive training (ann.hard_negatives):
    per query, the cosine top-k among OTHER-label vectors only —
    broadcast queries, label mask inside each batch, tie-aware partial
    top-k.  Oracle: the ann_topk shape plus `e.label <> q.label`."""
    from .ann import hard_negatives

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])
    want = pa.array(ANN_QUERY_IDS)
    rows = emb.map_batches(
        lambda b: b.filter(pc.is_in(b["vec_id"], value_set=want)),
        batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qi = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    ql = np.array([r["label"] for r in rows], dtype=np.int64)
    out = hard_negatives(emb, q, qi, ql, k=ANN_K)
    out["cosine"] = out["cosine"].round(6)
    return out


ORACLE_SQL["ann_hard_negatives"] = f"""
    WITH q AS (SELECT vec_id AS query_id, label AS qlab,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id IN
               ({', '.join(map(str, ANN_QUERY_IDS))})),
    sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                    list_cosine_similarity(
                        q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
             FROM q CROSS JOIN embeddings e
             WHERE e.label <> q.qlab),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS rnk
               FROM sims)
    SELECT query_id, neighbor_id, rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {ANN_K}
"""
QUERIES["ann_hard_negatives"] = q_ann_hard_negatives


def q_events_cusum(sf_dir):
    """CUSUM change-point scan over daily revenue (windows.daily_cusum):
    exact-integer scaled cusum, argmax |cusum| flagged (earliest tie).
    Oracle: window prefix sums + a QUALIFY-free flag join."""
    from .windows import daily_cusum

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])
    return daily_cusum(ev)


ORACLE_SQL["events_cusum"] = """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum((floor(value * 100.0 + 0.5))::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1),
    c AS (
      SELECT day, cents,
             ((SELECT count(*) FROM d)
              * sum(cents) OVER (ORDER BY day)
              - (row_number() OVER (ORDER BY day))
              * (SELECT sum(cents) FROM d))::BIGINT AS cusum_scaled
      FROM d),
    best AS (SELECT day FROM c
             ORDER BY abs(cusum_scaled) DESC, day ASC LIMIT 1)
    SELECT day, cents, cusum_scaled,
           (CASE WHEN day = (SELECT day FROM best)
                 THEN 1 ELSE 0 END)::BIGINT AS is_changepoint
    FROM c
"""
QUERIES["events_cusum"] = q_events_cusum


def q_events_cusum_by_type(sf_dir):
    """Grouped CUSUM change-point scan: events_cusum's exact-integer
    statistic per event type (windows.daily_cusum_by_key) — n and T
    scoped to each type's own daily series, one flagged day per type.
    Oracle: the same window prefix sums PARTITION BY event_type with a
    per-type row_number flag."""
    from .windows import daily_cusum_by_key

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type", "value"])
    return daily_cusum_by_key(ev, key="event_type")


ORACLE_SQL["events_cusum_by_type"] = """
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             sum((floor(value * 100.0 + 0.5))::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT event_type, day, cents,
             ((count(*) OVER (PARTITION BY event_type))
              * sum(cents) OVER (PARTITION BY event_type ORDER BY day)
              - (row_number() OVER (PARTITION BY event_type
                                    ORDER BY day))
              * (sum(cents) OVER (PARTITION BY event_type)))::BIGINT
               AS cusum_scaled
      FROM d),
    f AS (
      SELECT event_type, day, cents, cusum_scaled,
             row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(cusum_scaled) DESC, day ASC) AS rn
      FROM c)
    SELECT event_type, day, cents, cusum_scaled,
           (CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT
             AS is_changepoint
    FROM f
"""
QUERIES["events_cusum_by_type"] = q_events_cusum_by_type


ORACLE_SQL["doc_leiden"] = (
    f"WITH {_leiden_ctes(CC_ROUNDS)} "
    f"SELECT v, comm, rcomm FROM refl")
QUERIES["doc_leiden"] = q_doc_leiden


ORACLE_SQL["doc_leiden_modularity"] = f"""
    WITH {_leiden_ctes(CC_ROUNDS)},
    mm AS (SELECT count(*)::BIGINT AS m FROM e),
    aa AS (SELECT count(*)::BIGINT AS a FROM e
           JOIN refl ra ON ra.v = e.src
           JOIN refl rb ON rb.v = e.dst
           WHERE ra.comm = rb.comm),
    sdeg AS (SELECT src AS v, count(*)::BIGINT AS d FROM
             (SELECT src, dst FROM e
              UNION ALL SELECT dst AS src, src AS dst FROM e)
             GROUP BY src),
    bl AS (SELECT sum(dsum * dsum)::BIGINT AS b FROM
           (SELECT refl.comm, sum(sdeg.d)::BIGINT AS dsum
            FROM sdeg JOIN refl ON refl.v = sdeg.v GROUP BY refl.comm)),
    br AS (SELECT sum(dsum * dsum)::BIGINT AS b FROM
           (SELECT refl.rcomm, sum(sdeg.d)::BIGINT AS dsum
            FROM sdeg JOIN refl ON refl.v = sdeg.v
            GROUP BY refl.rcomm))
    SELECT mm.m, aa.a AS intra, bl.b AS deg_sq_louvain,
           br.b AS deg_sq_refined,
           round(aa.a / mm.m - bl.b / (4.0 * mm.m * mm.m), 9)
               AS q_louvain,
           round(aa.a / mm.m - br.b / (4.0 * mm.m * mm.m), 9)
               AS q_refined,
           (CASE WHEN round(aa.a / mm.m - br.b / (4.0 * mm.m * mm.m), 9)
                      >= round(aa.a / mm.m - bl.b / (4.0 * mm.m * mm.m), 9)
                 THEN 1 ELSE 0 END)::BIGINT AS improved
    FROM mm, aa, bl, br
"""
QUERIES["doc_leiden_modularity"] = q_doc_leiden_modularity


def q_media_png(sf_dir):
    """REAL compressed-image ingestion: deterministic PNGs derived from
    documents (zlib-deflated, Sub/Up/None row filters), decoded by the
    pure-Python PNG decoder (multimodal.parse_png: chunk walk, IDAT
    inflate, scanline defilter), then exact-int64 channel means.  The
    oracle never touches the payload — it recomputes the stats from the
    pixel-generator closed form, so encode->decode roundtrip equals the
    formula end-to-end (the media_image convention)."""
    from .multimodal import decode_png_images, png_images_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    return decode_png_images(png_images_from_documents(docs))


ORACLE_SQL["media_png"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      FROM documents
    ), px AS (
      -- NOTE multiple unnests ZIP in DuckDB; the pixel grid needs a
      -- true cross product, bounded by the max w/h then filtered
      SELECT media_id, w, h, gx.x, gy.y
      FROM m
      CROSS JOIN (SELECT unnest(range(21)) AS x) gx
      CROSS JOIN (SELECT unnest(range(19)) AS y) gy
      WHERE gx.x < w AND gy.y < h
    ), s AS (
      SELECT media_id, w, h,
             sum((media_id * 151 + y * 19 + x * 11 + 0) % 256)
                 ::BIGINT AS sr,
             sum((media_id * 151 + y * 19 + x * 11 + 5) % 256)
                 ::BIGINT AS sg,
             sum((media_id * 151 + y * 19 + x * 11 + 10) % 256)
                 ::BIGINT AS sb
      FROM px GROUP BY media_id, w, h
    )
    SELECT media_id, w AS width, h AS height,
           round(sr / (w * h)::DOUBLE, 6) AS mean_r,
           round(sg / (w * h)::DOUBLE, 6) AS mean_g,
           round(sb / (w * h)::DOUBLE, 6) AS mean_b
    FROM s
"""
QUERIES["media_png"] = q_media_png


PERC_FRACS = [0, 5, 10, 20, 40]  # percent of vertices targeted


def q_doc_percolation(sf_dir):
    """Targeted-attack percolation robustness curve: for each budget
    f% of vertices, remove the highest-degree vertices via an exact
    DEGREE-THRESHOLD rule — T_f = the smallest degree value (0 allowed)
    with count(deg > T_f) <= floor(f*n/100); remove every vertex with
    deg > T_f (<= the budget, deterministic, no tie-order dependence) —
    and report the surviving graph's giant connected component share.

    Scale shape: ONE degree histogram (distinct-degree-value domain,
    power-law-bounded) folded on the driver picks every threshold; one
    degree attach serves all budgets' edge filters; each budget runs
    the superstep CC engine over its surviving edge set; giant size =
    coarse label-bucket partial max over SURVIVING vertices only.
    Oracle: per-budget scalar-subquery threshold + the _cc_sql unrolled
    min-label chain over the filtered sym edges."""
    from .algos import connected_components
    from .algos.triangles import n_buckets_for
    from .edges import degree_table, symmetrize
    from .graph import load_undirected
    from .joins import attach_by_key
    from .runtime import counted

    edges = documents_edges(sf_dir)
    nv = documents_n_vertices(sf_dir)
    sym = symmetrize(edges).materialize()
    deg, n_deg = counted(degree_table(sym, "src"))

    # distinct-degree histogram -> driver threshold fold
    def hpart(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hp = deg.map_batches(hpart, batch_format="pyarrow").to_pandas()
    hist = hp.groupby("d", sort=True)["c"].sum()
    dvals = hist.index.to_numpy(np.int64)        # ascending
    dcnts = hist.to_numpy(np.int64)
    # count(deg > T) for T in {0} + dvals: suffix sums
    suffix = np.concatenate([np.cumsum(dcnts[::-1])[::-1], [0]])
    cand_t = np.concatenate([[0], dvals])        # count>cand_t aligned
    cnt_gt = np.concatenate([[int(dcnts.sum())], suffix[1:]])

    ea = attach_by_key(edges, deg, ["src", "dst"], key="v",
                       value="degree").materialize()
    labels_max = []
    rows = []
    for f in PERC_FRACS:
        k = (f * nv) // 100
        ok = cnt_gt <= k
        T = int(cand_t[ok][0])                   # minimal qualifying T
        removed = int(cnt_gt[ok][0])
        surv = nv - removed

        def keep(b: pa.Table, _T=T) -> pa.Table:
            m = pc.and_(pc.less_equal(b["degree_src"], _T),
                        pc.less_equal(b["degree_dst"], _T))
            return pa.table({"src": b["src"],
                             "dst": b["dst"]}).filter(m)

        kept, n_kept = counted(ea.map_batches(keep,
                                              batch_format="pyarrow"))
        if n_kept == 0:
            giant = 1 if surv > 0 else 0
        else:
            store = _store_root(sf_dir, f"perc-{f}")
            eng = load_undirected(kept, nv, 4, store,
                                  fingerprint=_input_fingerprint(sf_dir))
            rep = connected_components(eng)
            _check_unroll(rep, CC_ROUNDS, f"doc_percolation f={f}")
            labels = _state_result(eng, "label", "label")
            lj = attach_by_key(labels, deg, ["v"], key="v",
                               value="degree")
            nb = n_buckets_for(nv)

            def sizes(b: pa.Table, _T=T) -> pa.Table:
                lab = b["label"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                dg = np.nan_to_num(
                    b["degree_v"].to_numpy(zero_copy_only=False)
                    .astype(np.float64)).astype(np.int64)
                lab = lab[dg <= _T]              # survivors only
                u, c = np.unique(lab, return_counts=True)
                return pa.table({
                    "label": pa.array(u), "c": pa.array(c),
                    "lb": pa.array((u % nb).astype(np.int64))})

            def smax(g: pa.Table) -> pa.Table:
                lab = g["label"].to_numpy(zero_copy_only=False)
                c = g["c"].to_numpy(zero_copy_only=False)
                u, inv = np.unique(lab, return_inverse=True)
                tot = np.bincount(inv, weights=c.astype(np.float64),
                                  minlength=len(u)).astype(np.int64)
                return pa.table({"m": pa.array([int(tot.max())],
                                               pa.int64())})

            giant = int(lj.map_batches(sizes, batch_format="pyarrow")
                        .groupby("lb").map_groups(
                            smax, batch_format="pyarrow")
                        .to_pandas()["m"].max())
        rows.append({"pct": f, "threshold": T, "n_removed": removed,
                     "n_survivors": surv, "giant_size": giant,
                     "giant_share": round(giant / surv, 6)
                     if surv else 0.0})
    out = pd.DataFrame(rows)
    for c in ("pct", "threshold", "n_removed", "n_survivors",
              "giant_size"):
        out[c] = out[c].astype(np.int64)
    return out


def _percolation_sql(fracs, rounds: int) -> str:
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            ("sym AS MATERIALIZED (SELECT src, dst FROM e UNION ALL "
             "SELECT dst AS src, src AS dst FROM e)"),
            ("deg AS MATERIALIZED (SELECT src AS v, "
             "count(*)::BIGINT AS d FROM sym GROUP BY src)"),
            ("nv AS (SELECT count(*)::BIGINT AS n FROM documents)"),
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)"]
    selects = []
    for f in fracs:
        k = f"((SELECT {f} * n FROM nv) // 100)"
        ctes.append(
            f"t{f} AS (SELECT min(t)::BIGINT AS T FROM ("
            f"SELECT 0 AS t UNION ALL SELECT DISTINCT d FROM deg) x "
            f"WHERE (SELECT count(*) FROM deg WHERE deg.d > x.t) "
            f"<= {k})")
        ctes.append(
            f"rm{f} AS (SELECT count(*)::BIGINT AS r FROM deg "
            f"WHERE d > (SELECT T FROM t{f}))")
        ctes.append(
            f"ks{f} AS MATERIALIZED (SELECT s.src, s.dst FROM sym s "
            f"JOIN deg a ON a.v = s.src JOIN deg b ON b.v = s.dst "
            f"WHERE a.d <= (SELECT T FROM t{f}) "
            f"AND b.d <= (SELECT T FROM t{f}))")
        ctes.append(f"p{f}l0 AS (SELECT v, v AS lab FROM allv)")
        for i in range(1, rounds + 1):
            pv = f"p{f}l{i - 1}"
            ctes.append(
                f"p{f}l{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({pv}.lab, coalesce(m.lab, {pv}.lab)) AS lab "
                f"FROM allv JOIN {pv} USING (v) LEFT JOIN "
                f"(SELECT ks{f}.dst AS v, min({pv}.lab) AS lab "
                f"FROM ks{f} JOIN {pv} ON {pv}.v = ks{f}.src "
                f"GROUP BY ks{f}.dst) m USING (v))")
        ctes.append(
            f"g{f} AS (SELECT max(c)::BIGINT AS giant FROM ("
            f"SELECT lab, count(*)::BIGINT AS c FROM p{f}l{rounds} l "
            f"LEFT JOIN deg ON deg.v = l.v "
            f"WHERE coalesce(deg.d, 0) <= (SELECT T FROM t{f}) "
            f"GROUP BY lab))")
        selects.append(
            f"SELECT {f}::BIGINT AS pct, (SELECT T FROM t{f}) "
            f"AS threshold, (SELECT r FROM rm{f}) AS n_removed, "
            f"(SELECT n FROM nv) - (SELECT r FROM rm{f}) "
            f"AS n_survivors, (SELECT giant FROM g{f}) AS giant_size, "
            f"round((SELECT giant FROM g{f}) / ((SELECT n FROM nv) "
            f"- (SELECT r FROM rm{f}))::DOUBLE, 6) AS giant_share")
    return (f"WITH {', '.join(ctes)} SELECT * FROM ("
            f"{' UNION ALL '.join(selects)}) ORDER BY pct")


ORACLE_SQL["doc_percolation"] = _percolation_sql(PERC_FRACS, CC_ROUNDS)
QUERIES["doc_percolation"] = q_doc_percolation


def q_media_png_resize(sf_dir):
    """Compressed-image decode->resize chain: real PNG decode (inflate
    + defilter) then the fixed-grid nearest-neighbor gather + exact
    channel means (multimodal.PngResizeStage).  Oracle: closed form
    over the gathered generator pixels (the media_resize convention on
    the PNG generator/dims)."""
    from .multimodal import png_images_from_documents, resize_png_images

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    return resize_png_images(png_images_from_documents(docs),
                             target=MEDIA_RESIZE_TARGET)


ORACLE_SQL["media_png_resize"] = f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 13 AS w, 8 + doc_id % 11 AS h
      FROM documents
    ), px AS (
      SELECT media_id,
             ((gy.ty * h) // {MEDIA_RESIZE_TARGET}) AS sy,
             ((gx.tx * w) // {MEDIA_RESIZE_TARGET}) AS sx
      FROM m
      CROSS JOIN (SELECT unnest(range({MEDIA_RESIZE_TARGET})) AS tx) gx
      CROSS JOIN (SELECT unnest(range({MEDIA_RESIZE_TARGET})) AS ty) gy
    ), s AS (
      SELECT media_id,
             sum((media_id * 151 + sy * 19 + sx * 11 + 0) % 256)
                 ::BIGINT AS sr,
             sum((media_id * 151 + sy * 19 + sx * 11 + 5) % 256)
                 ::BIGINT AS sg,
             sum((media_id * 151 + sy * 19 + sx * 11 + 10) % 256)
                 ::BIGINT AS sb
      FROM px GROUP BY media_id
    )
    SELECT media_id,
           {MEDIA_RESIZE_TARGET}::BIGINT AS width,
           {MEDIA_RESIZE_TARGET}::BIGINT AS height,
           round(sr / {MEDIA_RESIZE_TARGET ** 2}::DOUBLE, 6) AS mean_r,
           round(sg / {MEDIA_RESIZE_TARGET ** 2}::DOUBLE, 6) AS mean_g,
           round(sb / {MEDIA_RESIZE_TARGET ** 2}::DOUBLE, 6) AS mean_b
    FROM s
"""
QUERIES["media_png_resize"] = q_media_png_resize


def q_doc_eff_diameter(sf_dir):
    """Effective diameter from the ANF sketch (HyperANF's headline
    statistic): smallest t with N(t) >= 0.9 * N(t_max), plus the
    standard linear interpolation between rounds.  Composes the
    oracle-checked doc_anf rounds with N(0) = |V| exactly; all floats
    derive from the ROUND-6 nf values, so both engines evaluate the
    identical expression tree."""
    from .algos.anf import ANF_K, ANF_ROUNDS, neighborhood_function

    eng = documents_engine(sf_dir, "undirected")
    a = neighborhood_function(eng, k=ANF_K, rounds=ANF_ROUNDS)
    n0 = float(read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]).count())
    ts = [0] + a["t"].tolist()
    nfs = [n0] + a["nf"].tolist()
    nf_max = max(nfs)
    th = 0.9 * nf_max
    eff_t, eff_interp = ANF_ROUNDS, float(ANF_ROUNDS)
    for i, (t, nf) in enumerate(zip(ts, nfs)):
        if nf >= th:
            eff_t = t
            if t >= 1 and nf > nfs[i - 1]:
                eff_interp = (t - 1) + (th - nfs[i - 1]) / (nf - nfs[i - 1])
            else:
                eff_interp = float(t)
            break
    return pd.DataFrame({
        "nf_max": [np.round(nf_max, 6)],
        "threshold": [np.round(th, 6)],
        "eff_t": np.array([eff_t], np.int64),
        "eff_interp": [np.round(eff_interp, 6)]})


ORACLE_SQL["doc_eff_diameter"] = f"""
    WITH a AS ({_anf_sql(8, 3)}),
    series AS (
      SELECT 0::BIGINT AS t,
             (SELECT count(*)::DOUBLE FROM documents) AS nf
      UNION ALL SELECT t, nf FROM a),
    m AS (SELECT max(nf) AS nfmax FROM series),
    w AS (SELECT t, nf, lag(nf) OVER (ORDER BY t) AS prev FROM series),
    hit AS (SELECT t, nf, prev FROM w
            WHERE nf >= 0.9 * (SELECT nfmax FROM m)
            ORDER BY t LIMIT 1)
    SELECT round((SELECT nfmax FROM m), 6) AS nf_max,
           round(0.9 * (SELECT nfmax FROM m), 6) AS threshold,
           coalesce((SELECT t FROM hit), 3)::BIGINT AS eff_t,
           round(coalesce(
             (SELECT CASE WHEN t >= 1 AND nf > prev
                     THEN (t - 1) + (0.9 * (SELECT nfmax FROM m) - prev)
                          / (nf - prev)
                     ELSE t::DOUBLE END FROM hit),
             3.0), 6) AS eff_interp
"""
QUERIES["doc_eff_diameter"] = q_doc_eff_diameter


def q_embed_semdedup(sf_dir):
    """SemDeDup cluster-bucketed semantic pruning (dedup.semdedup_ids):
    distributed k-means, then per-cluster keep-smallest-id pruning at
    cosine >= tau — k independent in-cluster kernels instead of a
    corpus-quadratic scan.  Oracle: the unrolled k-means CTE chain with
    a pairwise-cosine drop tail."""
    from .dedup import semdedup_ids

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    return semdedup_ids(emb)


ORACLE_SQL["embed_semdedup"] = _kmeans_full_sql(
    n_centroids=8, iters=4, tail="semdedup")
QUERIES["embed_semdedup"] = q_embed_semdedup


# -------------------------------------------------- attribute mixing (lang)

def _lang_mixing_counts(sf_dir):
    """5x5 symmetric (lang_src, lang_dst) edge counts over the
    symmetrized doc graph — exact integers.  Gated lang attach: the
    (doc_id -> lang_code) map broadcasts under ATTACH_BROADCAST_CAP via
    joins.attach_by_key; counts are bounded-domain map-side bincount
    partials folded on the driver."""
    from .edges import symmetrize
    from .io import from_pandas_clean
    from .joins import attach_by_key

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "lang"]).to_pandas()
    langs = sorted(docs["lang"].unique())
    code = {l: i for i, l in enumerate(langs)}
    lmap = from_pandas_clean(pd.DataFrame({
        "k": docs["doc_id"].to_numpy(np.int64),
        "lc": docs["lang"].map(code).to_numpy(np.int64)}))
    sym = symmetrize(documents_edges(sf_dir))
    tagged = attach_by_key(sym, lmap, ["src", "dst"], "k", "lc")
    nl = len(langs)

    def part(b: pa.Table) -> pa.Table:
        a = b["lc_src"].to_numpy(zero_copy_only=False)
        c = b["lc_dst"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(a * nl + c, minlength=nl * nl)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    parts = tagged.map_batches(part, batch_format="pyarrow").to_pandas()
    cnt = np.zeros(nl * nl, np.int64)
    if len(parts):
        np.add.at(cnt, parts["cell"].to_numpy(),
                  parts["n"].to_numpy())
    return langs, cnt.reshape(nl, nl)


def q_doc_lang_mixing(sf_dir):
    """Attribute mixing matrix: symmetric per-(lang, lang) edge counts
    (nonzero cells only).  Oracle: DOC_SYM_SQL joined to documents on
    both endpoints."""
    langs, m = _lang_mixing_counts(sf_dir)
    la, lb, ns = [], [], []
    for i, a in enumerate(langs):
        for j, b in enumerate(langs):
            if m[i, j]:
                la.append(a)
                lb.append(b)
                ns.append(int(m[i, j]))
    return pd.DataFrame({"lang_src": la, "lang_dst": lb,
                         "n": np.array(ns, np.int64)})


def q_doc_lang_assort(sf_dir):
    """Newman categorical assortativity over the lang mixing matrix:
    r = (sum e_ii - sum a_i*b_i) / (1 - sum a_i*b_i) with e = counts /
    2m over directed edge ends.  All inputs exact integers; ONE float
    expression evaluated identically by both engines."""
    _, m = _lang_mixing_counts(sf_dir)
    tot = int(m.sum())
    tr = int(np.trace(m))
    ab = int((m.sum(axis=1) * m.sum(axis=0)).sum())
    # r = (tr/tot - ab/tot^2) / (1 - ab/tot^2), kept in the exact shape
    r = ((tr * tot - ab) / (tot * tot - ab)) if tot and tot * tot != ab \
        else 0.0
    return pd.DataFrame({"n_edge_ends": np.array([tot], np.int64),
                         "r": [round(r, 6)]})


ORACLE_SQL["doc_lang_mixing"] = f"""
    WITH sym AS ({DOC_SYM_SQL})
    SELECT a.lang AS lang_src, b.lang AS lang_dst,
           count(*)::BIGINT AS n
    FROM sym JOIN documents a ON a.doc_id = sym.src
    JOIN documents b ON b.doc_id = sym.dst
    GROUP BY 1, 2
"""
ORACLE_SQL["doc_lang_assort"] = f"""
    WITH sym AS ({DOC_SYM_SQL}),
    m AS (SELECT a.lang AS la, b.lang AS lb, count(*)::BIGINT AS n
          FROM sym JOIN documents a ON a.doc_id = sym.src
          JOIN documents b ON b.doc_id = sym.dst GROUP BY 1, 2),
    tot AS (SELECT sum(n)::BIGINT AS t FROM m),
    tr AS (SELECT coalesce(sum(n), 0)::BIGINT AS tr FROM m
           WHERE la = lb),
    ab AS (SELECT sum(ra.s * ca.s)::BIGINT AS ab FROM
           (SELECT la AS l, sum(n)::BIGINT AS s FROM m GROUP BY la) ra
           JOIN (SELECT lb AS l, sum(n)::BIGINT AS s FROM m
                 GROUP BY lb) ca USING (l))
    SELECT t AS n_edge_ends,
           round(CASE WHEN t > 0 AND t * t <> ab
                 THEN (tr * t - ab)::DOUBLE / (t * t - ab)::DOUBLE
                 ELSE 0.0 END, 6) AS r
    FROM tot, tr, ab
"""
QUERIES["doc_lang_mixing"] = q_doc_lang_mixing
QUERIES["doc_lang_assort"] = q_doc_lang_assort


CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_tpch_corr(sf_dir):
    """Pearson correlation matrix of the lineitem numeric columns: one
    column-pruned scan emitting (n, sum_x, sum_xx, sum_xy) moment
    partials per batch (d=4 -> 14 accumulators), folded on the driver;
    the correlation formula is ONE float expression per pair evaluated
    identically by both engines on the folded sums (round-6)."""
    cols = CORR_COLS
    d = len(cols)
    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=cols)

    def part(b: pa.Table) -> pa.Table:
        m = np.column_stack([
            b[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        out = {"n": pa.array([len(m)], pa.int64())}
        s = m.sum(axis=0)
        xx = m.T @ m
        for i in range(d):
            out[f"s{i}"] = pa.array([s[i]])
            for j in range(i, d):
                out[f"p{i}{j}"] = pa.array([xx[i, j]])
        return pa.table(out)

    parts = li.map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = np.array([parts[f"s{i}"].sum() for i in range(d)])
    xx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xx[i, j] = xx[j, i] = parts[f"p{i}{j}"].sum()
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * xx[i, j] - s[i] * s[j]
            den = np.sqrt(n * xx[i, i] - s[i] * s[i]) \
                * np.sqrt(n * xx[j, j] - s[j] * s[j])
            rows.append((cols[i], cols[j],
                         round(num / den if den > 0 else 0.0, 6)))
    return pd.DataFrame({"col_a": [r[0] for r in rows],
                         "col_b": [r[1] for r in rows],
                         "corr": [r[2] for r in rows]})


def _corr_pair_sql(a: str, b: str) -> str:
    return f"""
      SELECT '{a}' AS col_a, '{b}' AS col_b,
        round(CASE WHEN sqrt(count(*)*sum({a}*{a}) - sum({a})*sum({a}))
                   * sqrt(count(*)*sum({b}*{b}) - sum({b})*sum({b})) > 0
          THEN (count(*)*sum({a}*{b}) - sum({a})*sum({b}))
             / (sqrt(count(*)*sum({a}*{a}) - sum({a})*sum({a}))
              * sqrt(count(*)*sum({b}*{b}) - sum({b})*sum({b})))
          ELSE 0.0 END, 6) AS corr
      FROM lineitem"""


ORACLE_SQL["tpch_corr"] = " UNION ALL ".join(
    _corr_pair_sql(a, b)
    for i, a in enumerate(CORR_COLS)
    for b in CORR_COLS[i + 1:])
QUERIES["tpch_corr"] = q_tpch_corr


def q_doc_motifs(sf_dir):
    """Small-motif census of the symmetrized doc graph from degree
    moments + the exact triangle count: wedges = sum C(d,2), claws =
    sum C(d,3), open wedges = wedges - 3*triangles, global clustering =
    3*tri / wedges.  Degree-moment partials are map-side exact ints; the
    triangle count reuses the oracle-checked counter."""
    from .algos import triangle_count
    from .edges import degree_table, symmetrize

    edges = documents_edges(sf_dir)
    sym = symmetrize(edges)
    deg = degree_table(sym, "src")

    def part(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "nv": pa.array([int((d > 0).sum())], pa.int64()),
            "w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
            "c3": pa.array([int((d * (d - 1) * (d - 2) // 6).sum())],
                           pa.int64())})

    parts = deg.map_batches(part, batch_format="pyarrow").to_pandas()
    nv = int(parts["nv"].sum())
    wedges = int(parts["w"].sum())
    claws = int(parts["c3"].sum())
    ne = edges.count()
    tri = int(triangle_count(edges))
    return pd.DataFrame({
        "n_vertices_nonisolated": np.array([nv], np.int64),
        "n_edges": np.array([ne], np.int64),
        "wedges": np.array([wedges], np.int64),
        "claws": np.array([claws], np.int64),
        "n_triangles": np.array([tri], np.int64),
        "open_wedges": np.array([wedges - 3 * tri], np.int64),
        "global_clustering": [round(3.0 * tri / wedges, 6)
                              if wedges else 0.0]})


ORACLE_SQL["doc_motifs"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e
            UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM sym GROUP BY src),
    m AS (SELECT count(*)::BIGINT AS nv,
                 sum(d*(d-1)//2)::BIGINT AS wedges,
                 sum(d*(d-1)*(d-2)//6)::BIGINT AS claws
          FROM deg WHERE d > 0),
    t AS (SELECT count(*)::BIGINT AS tri
          FROM e ab JOIN e bc ON bc.src = ab.dst
               JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst),
    ec AS (SELECT count(*)::BIGINT AS ne FROM e)
    SELECT nv AS n_vertices_nonisolated, ne AS n_edges, wedges, claws,
           tri AS n_triangles, (wedges - 3*tri)::BIGINT AS open_wedges,
           round(CASE WHEN wedges > 0
                 THEN 3.0 * tri / wedges ELSE 0.0 END, 6)
             AS global_clustering
    FROM m, t, ec
"""
QUERIES["doc_motifs"] = q_doc_motifs


def q_corpus_clean_v4(sf_dir):
    """Flagship cleaning composition V4 — v3 (quality -> exact dedup ->
    minhash -> substring dedup -> decontamination -> mixture resample)
    plus two round-4 stages: a map-side hashed-linear CLASSIFIER gate
    (keep score >= 0; computed inline per batch after a text re-join —
    no driver-side id set) and canonical-URL MIRROR dedup (drop docs
    sharing a canonical URL with a smaller id; size-gated anti-join).
    Returns the final (doc_id, source) Dataset."""
    from .dedup import _join_parts
    from .joins import anti_join
    from .text import CLF_DIMS, _batch_word_hashes, clf_weights
    from .web import url_drop_ids

    v3 = q_corpus_clean_v3(sf_dir).materialize()
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    joined = v3.join(docs, join_type="inner",
                     num_partitions=_join_parts(v3.count()),
                     on=("doc_id",))
    w = clf_weights(CLF_DIMS)

    def clf_keep(b: pa.Table) -> pa.Table:
        wd, h, n_docs = _batch_word_hashes(b["text"].to_pylist())
        nw = np.bincount(wd, minlength=n_docs).astype(np.int64)
        if len(h):
            dim = (h % np.uint64(CLF_DIMS)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(32)) & np.uint64(1)) \
                .astype(np.int64)
            val = np.bincount(wd * CLF_DIMS + dim,
                              weights=sign.astype(np.float64),
                              minlength=n_docs * CLF_DIMS) \
                .reshape(n_docs, CLF_DIMS)
            s = val @ w
        else:
            s = np.zeros(n_docs, dtype=np.float64)
        s = s / np.maximum(nw, 1)
        return b.select(["doc_id", "source"]).filter(pa.array(s >= 0))

    kept = joined.map_batches(clf_keep, batch_format="pyarrow")
    return anti_join(kept, url_drop_ids(docs), "doc_id")


def _corpus_clean_v4_sql() -> str:
    """V4 oracle: the v3 fragments wrapped as q6, the classifier keep
    fragment, and the canonical-URL mirror-drop fragment."""
    base = _corpus_clean_v3_sql()
    head, sep, tail = base.rpartition("SELECT q5.doc_id, q5.source FROM q5")
    return head + f""",
        q6 AS MATERIALIZED ({sep}{tail}),
        clf AS MATERIALIZED (
          SELECT doc_id FROM ({_classifier_sql(1024)}) WHERE keep = 1),
        canon AS MATERIALIZED ({_WEB_CANON_SQL}),
        udrop AS (SELECT DISTINCT b.doc_id FROM canon a
                  JOIN canon b ON a.canon = b.canon
                              AND a.doc_id < b.doc_id)
        SELECT q6.doc_id, q6.source FROM q6
        JOIN clf USING (doc_id)
        WHERE q6.doc_id NOT IN (SELECT doc_id FROM udrop)
    """


ORACLE_SQL["corpus_clean_v4"] = _corpus_clean_v4_sql()
QUERIES["corpus_clean_v4"] = q_corpus_clean_v4


TOK_MIN, TOK_MAX = 60, 280  # unigram-token budget (v5 length gate)


def q_corpus_clean_v5(sf_dir):
    """Flagship cleaning composition V5 — v4 plus a TOKENIZER-AWARE
    length gate: docs are tokenized with the trained unigram-LM vocab
    (tokenizer.unigram_token_counts) and survivors must carry
    TOK_MIN..TOK_MAX tokens — the budget filter a real pretraining
    pipeline applies after tokenizer training, measured in model
    tokens rather than words.  Returns the final (doc_id, source)
    Dataset."""
    from .dedup import _join_parts
    from .runtime import counted
    from .tokenizer import unigram_token_counts

    v4, n4 = counted(q_corpus_clean_v4(sf_dir))
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    tok = unigram_token_counts(docs)
    j = v4.join(tok, join_type="inner",
                num_partitions=_join_parts(n4), on=("doc_id",))

    def budget(b: pa.Table) -> pa.Table:
        n = b["n_tokens"]
        m = pc.and_(pc.greater_equal(n, TOK_MIN),
                    pc.less_equal(n, TOK_MAX))
        return pa.table({"doc_id": b["doc_id"],
                         "source": b["source"]}).filter(m)

    return j.map_batches(budget, batch_format="pyarrow")


def _corpus_clean_v5_sql() -> str:
    """V5 oracle: the v4 chain wrapped as q7 + the unigram token-count
    chain (its own WITH RECURSIVE, embedded as a subquery) + the
    budget filter."""
    base = _corpus_clean_v4_sql()
    head, sep, tail = base.rpartition(
        "SELECT q6.doc_id, q6.source FROM q6")
    return head + f""",
        q7 AS MATERIALIZED ({sep}{tail}),
        tok AS MATERIALIZED (SELECT * FROM (
            {_unigram_tokens_sql(_UNI_SEED, _UNI_ROUNDS)}))
        SELECT q7.doc_id, q7.source FROM q7
        JOIN tok ON tok.doc_id = q7.doc_id
        WHERE tok.n_tokens BETWEEN {TOK_MIN} AND {TOK_MAX}
    """


ORACLE_SQL["corpus_clean_v5"] = _corpus_clean_v5_sql()
QUERIES["corpus_clean_v5"] = q_corpus_clean_v5


ORDER_SHARDS = 8
ORDER_SEED = 42


def q_text_training_order(sf_dir):
    """Deterministic training-order shuffle manifest: every doc gets a
    seeded fmix64 key; shard = key % ORDER_SHARDS, pos = rank within
    the shard by (key, doc_id).  The op a pretraining run needs to
    materialize a reproducible global shuffle WITHOUT a global sort:
    shard assignment is map-side, ordering is per-shard (each output
    shard is one bounded sort — at cluster scale use thousands of
    shards so each stays node-sized).  Exact-integer uint64 arithmetic
    reproduced in DuckDB HUGEINT (the _minhash_sql convention)."""
    from .io import read_parquet_clean as _r

    docs = _r(os.path.join(sf_dir, "documents.parquet"),
              columns=["doc_id"])
    PHI = np.uint64(0x9E3779B97F4A7C15)
    C1 = np.uint64(0xFF51AFD7ED558CCD)
    C2 = np.uint64(0xC4CEB9FE1A85EC53)

    def keyb(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            z = (ids + np.uint64(1 + ORDER_SEED)) * PHI
            z ^= z >> np.uint64(33)
            z *= C1
            z ^= z >> np.uint64(29)
            z *= C2
            z ^= z >> np.uint64(32)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "key": pa.array(z.view(np.int64)),
            "shard": pa.array((z % np.uint64(ORDER_SHARDS))
                              .astype(np.int64))})

    def rank(g: pa.Table) -> pa.Table:
        k = g["key"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        o = np.lexsort((ids, k))
        pos = np.empty(len(o), np.int64)
        pos[o] = np.arange(1, len(o) + 1)
        return pa.table({"doc_id": pa.array(ids),
                         "shard": g["shard"],
                         "pos": pa.array(pos)})

    return docs.map_batches(keyb, batch_format="pyarrow") \
        .groupby("shard").map_groups(rank, batch_format="pyarrow")


def _training_order_sql() -> str:
    phi = 0x9E3779B97F4A7C15
    return f"""
    WITH k0 AS (SELECT doc_id,
                ({_mulmod64_sql(f'(doc_id + 1 + {ORDER_SEED})', phi)})
                  ::UBIGINT AS z FROM documents),
    k1 AS (SELECT doc_id, xor(z, z >> 33) AS z FROM k0),
    k2 AS (SELECT doc_id,
           {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z
           FROM k1),
    k3 AS (SELECT doc_id, xor(z, z >> 29) AS z FROM k2),
    k4 AS (SELECT doc_id,
           {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z
           FROM k3),
    kk AS (SELECT doc_id, xor(z, z >> 32) AS key FROM k4)
    SELECT doc_id, (key % {ORDER_SHARDS})::BIGINT AS shard,
           row_number() OVER (PARTITION BY key % {ORDER_SHARDS}
                              ORDER BY key, doc_id)::BIGINT AS pos
    FROM kk
    """


ORACLE_SQL["text_training_order"] = _training_order_sql()
QUERIES["text_training_order"] = q_text_training_order


def q_dedup_cross_source(sf_dir):
    """Cross-source near-duplication matrix: minhash near-dup pairs
    (threshold 0.5) attributed to their (source, source) cell —
    unordered, so (a_src, b_src) is sorted lexicographically.  The
    between-source contamination report a multi-source corpus build
    logs (e.g. crawl-vs-curated overlap).  Pairs are the SMALL side
    (verified near-dups); sources attach via the gated lookup join."""
    from .dedup import minhash_dedup_pairs
    from .io import from_pandas_clean
    from .joins import attach_by_key

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text", "source"]) \
        .materialize()
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    if isinstance(pairs, pd.DataFrame):
        pairs_ds = from_pandas_clean(pairs[["a", "b"]])
    else:
        pairs_ds = pairs.select_columns(["a", "b"])
    # attach_by_key maps int64 values: encode the bounded source domain
    # as dense codes (map-side distinct partials + driver sort)
    def spart(b: pa.Table) -> pa.Table:
        u = pd.unique(b["source"].to_pandas())
        return pa.table({"s": pa.array(u, pa.string())})

    names = sorted(set(docs.select_columns(["source"])
                       .map_batches(spart, batch_format="pyarrow")
                       .to_pandas()["s"]))
    code = {s: i for i, s in enumerate(names)}

    def enc(b: pa.Table) -> pa.Table:
        sc = np.array([code[s] for s in b["source"].to_pylist()],
                      np.int64)
        return pa.table({"doc_id": b["doc_id"], "sc": pa.array(sc)})

    src = docs.map_batches(enc, batch_format="pyarrow")
    att = attach_by_key(pairs_ds, src, ["a", "b"], key="doc_id",
                        value="sc")

    def cell(b: pa.Table) -> pa.Table:
        sa = b["sc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        sb = b["sc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(sa, sb), np.maximum(sa, sb)
        arr = np.array(names, dtype=object)
        g = pd.DataFrame({"source_a": arr[lo], "source_b": arr[hi]}) \
            .groupby(["source_a", "source_b"], sort=False) \
            .size().reset_index(name="n_pairs")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    # bounded (source x source) domain: map-side cells + driver merge
    parts = att.map_batches(cell, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["source_a", "source_b"], sort=True)["n_pairs"] \
        .sum().reset_index()
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


ORACLE_SQL["dedup_cross_source"] = f"""
    WITH mh AS MATERIALIZED ({_minhash_sql(num_perm=64, bands=16, k=5,
                                           threshold=0.5, cap=64)}),
    att AS (SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b
            FROM mh JOIN documents da ON da.doc_id = mh.a
                    JOIN documents db ON db.doc_id = mh.b)
    SELECT source_a, source_b, count(*)::BIGINT AS n_pairs
    FROM att GROUP BY source_a, source_b
    ORDER BY source_a, source_b
"""
QUERIES["dedup_cross_source"] = q_dedup_cross_source


def q_embed_knn_classify(sf_dir):
    """Leave-one-out kNN label transfer: every 5th vector (the eval
    subset) is classified by the majority label of its ANN_K cosine
    nearest neighbors (self excluded; ties: count DESC then label ASC)
    — the standard embedding-quality eval and the weak-supervision
    label-transfer op.  brute_force_topk is the gated small-side plan;
    neighbor labels attach via the gated lookup join."""
    from .ann import brute_force_topk
    from .io import from_pandas_clean
    from .joins import attach_by_key

    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"]) \
        .materialize()
    def evalset(b: pa.Table) -> pa.Table:  # vec_id % 5 == 0
        v = b["vec_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(v % 5 == 0))

    rows = emb.map_batches(evalset, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qi = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    tl = {int(r["vec_id"]): int(r["label"]) for r in rows}
    top = brute_force_topk(emb, q, qi, k=ANN_K)

    lab = attach_by_key(from_pandas_clean(top[["query_id",
                                               "neighbor_id"]]),
                        emb.select_columns(["vec_id", "label"]),
                        ["neighbor_id"], key="vec_id",
                        value="label").to_pandas()
    out = []
    for qid, g in lab.groupby("query_id", sort=True):
        vc = g.groupby("label_neighbor_id").size().reset_index(name="c")
        vc = vc.sort_values(["c", "label_neighbor_id"],
                            ascending=[False, True], kind="mergesort")
        pred = int(vc["label_neighbor_id"].iloc[0])
        t = tl[int(qid)]
        out.append((int(qid), t, pred, int(pred == t)))
    df = pd.DataFrame(out, columns=["query_id", "true_label",
                                    "pred_label", "correct"])
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return df


ORACLE_SQL["embed_knn_classify"] = f"""
    WITH q AS (SELECT vec_id AS query_id, label AS tlab,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id % 5 = 0),
    sims AS (SELECT q.query_id, q.tlab, e.vec_id AS nid,
                    e.label AS nlab,
                    list_cosine_similarity(
                        q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
             FROM q CROSS JOIN embeddings e
             WHERE e.vec_id <> q.query_id),
    top AS (SELECT query_id, tlab, nlab FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, nid ASC) AS rnk FROM sims)
            WHERE rnk <= {ANN_K}),
    maj AS (SELECT query_id, tlab, nlab, count(*)::BIGINT AS c
            FROM top GROUP BY 1, 2, 3),
    pick AS (SELECT query_id, tlab, nlab,
                    row_number() OVER (PARTITION BY query_id
                        ORDER BY c DESC, nlab ASC) AS rn FROM maj)
    SELECT query_id, tlab::BIGINT AS true_label,
           nlab::BIGINT AS pred_label,
           (CASE WHEN nlab = tlab THEN 1 ELSE 0 END)::BIGINT AS correct
    FROM pick WHERE rn = 1
"""
QUERIES["embed_knn_classify"] = q_embed_knn_classify


def q_text_token_budget(sf_dir):
    """Per-language token-budget report: unigram-LM token counts
    (tokenizer.unigram_token_counts) grouped by PREDICTED language
    (langid_stage) — the table a multilingual data-mixture plan reads
    (tokens available per language).  Both inputs are per-doc and
    shuffle-free; the (lang) rollup is a bounded-domain map-side
    partial + driver merge."""
    from .dedup import _join_parts
    from .runtime import counted
    from .text import langid_stage
    from .tokenizer import unigram_token_counts

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"]).materialize()
    tok, n_tok = counted(unigram_token_counts(docs))
    lang = langid_stage(docs).select_columns(["doc_id", "lang_pred"])
    j = tok.join(lang, join_type="inner",
                 num_partitions=_join_parts(n_tok), on=("doc_id",))

    def part(b: pa.Table) -> pa.Table:
        g = pd.DataFrame(
            {"lang_pred": b["lang_pred"].to_pandas(),
             "n": b["n_tokens"].to_numpy(zero_copy_only=False)}) \
            .groupby("lang_pred", sort=False)["n"] \
            .agg(["size", "sum"]).reset_index()
        g.columns = ["lang_pred", "n_docs", "n_tokens"]
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = j.map_batches(part, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang_pred", sort=True)[
        ["n_docs", "n_tokens"]].sum().reset_index()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out


ORACLE_SQL["text_token_budget"] = f"""
    WITH tok AS MATERIALIZED (SELECT * FROM (
        {_unigram_tokens_sql(_UNI_SEED, _UNI_ROUNDS)})),
    lid AS MATERIALIZED ({_langid_sql()})
    SELECT lid.lang_pred, count(*)::BIGINT AS n_docs,
           sum(tok.n_tokens)::BIGINT AS n_tokens
    FROM tok JOIN lid USING (doc_id)
    GROUP BY lid.lang_pred ORDER BY lid.lang_pred
"""
QUERIES["text_token_budget"] = q_text_token_budget


EDGE_PERC_PCTS = [0, 10, 30, 50, 70]


def q_doc_edge_percolation(sf_dir):
    """Random-failure percolation twin of doc_percolation: remove each
    EDGE independently when fmix64(src*2^32 + dst + seed) % 100 < p
    (exact-integer seeded rule — reproducible, order-free), report the
    surviving giant-component share per failure rate p.  Together with
    the targeted-attack curve this is the standard robustness pair
    (random failure vs attack).  Vertices all survive: share is over
    n_vertices."""
    from .algos import connected_components
    from .algos.triangles import n_buckets_for
    from .graph import load_undirected
    from .runtime import counted

    edges = documents_edges(sf_dir)
    nv = documents_n_vertices(sf_dir)
    PHI = np.uint64(0x9E3779B97F4A7C15)
    C1 = np.uint64(0xFF51AFD7ED558CCD)
    C2 = np.uint64(0xC4CEB9FE1A85EC53)

    def ekey(b: pa.Table) -> np.ndarray:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = (s * np.uint64(1 << 32) + d + np.uint64(ORDER_SEED)) \
                * PHI
            z ^= z >> np.uint64(33)
            z *= C1
            z ^= z >> np.uint64(29)
            z *= C2
            z ^= z >> np.uint64(32)
        return (z % np.uint64(100)).astype(np.int64)

    rows = []
    for p in EDGE_PERC_PCTS:
        def keep(b: pa.Table, _p=p) -> pa.Table:
            return b.filter(pa.array(ekey(b) >= _p))

        kept, n_kept = counted(edges.map_batches(
            keep, batch_format="pyarrow"))
        if n_kept == 0:
            giant = 1 if nv > 0 else 0
        else:
            store = _store_root(sf_dir, f"eperc-{p}")
            eng = load_undirected(kept, nv, 4, store,
                                  fingerprint=_input_fingerprint(sf_dir))
            rep = connected_components(eng)
            _check_unroll(rep, CC_ROUNDS, f"doc_edge_percolation p={p}")
            labels = _state_result(eng, "label", "label")
            nb = n_buckets_for(nv)

            def sizes(b: pa.Table) -> pa.Table:
                lab = b["label"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                u, c = np.unique(lab, return_counts=True)
                return pa.table({
                    "label": pa.array(u), "c": pa.array(c),
                    "lb": pa.array((u % nb).astype(np.int64))})

            def smax(g: pa.Table) -> pa.Table:
                lab = g["label"].to_numpy(zero_copy_only=False)
                c = g["c"].to_numpy(zero_copy_only=False)
                u, inv = np.unique(lab, return_inverse=True)
                tot = np.bincount(inv, weights=c.astype(np.float64),
                                  minlength=len(u)).astype(np.int64)
                return pa.table({"m": pa.array([int(tot.max())],
                                               pa.int64())})

            giant = int(labels.map_batches(sizes,
                                           batch_format="pyarrow")
                        .groupby("lb").map_groups(
                            smax, batch_format="pyarrow")
                        .to_pandas()["m"].max())
        rows.append({"pct": p, "n_edges_kept": n_kept,
                     "giant_size": giant,
                     "giant_share": round(giant / nv, 6) if nv
                     else 0.0})
    out = pd.DataFrame(rows)
    for c in ("pct", "n_edges_kept", "giant_size"):
        out[c] = out[c].astype(np.int64)
    return out


def _edge_percolation_sql(pcts, rounds: int) -> str:
    phi = 0x9E3779B97F4A7C15
    key = _mulmod64_sql(
        f"(src::HUGEINT * 4294967296 + dst + {ORDER_SEED})", phi)
    ctes = [f"e AS MATERIALIZED ({DOC_EDGES_SQL})",
            "nv AS (SELECT count(*)::BIGINT AS n FROM documents)",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            (f"ek0 AS (SELECT src, dst, ({key})::UBIGINT AS z FROM e)"),
            "ek1 AS (SELECT src, dst, xor(z, z >> 33) AS z FROM ek0)",
            (f"ek2 AS (SELECT src, dst, "
             f"{_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z "
             f"FROM ek1)"),
            "ek3 AS (SELECT src, dst, xor(z, z >> 29) AS z FROM ek2)",
            (f"ek4 AS (SELECT src, dst, "
             f"{_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z "
             f"FROM ek3)"),
            ("ek AS MATERIALIZED (SELECT src, dst, "
             "(xor(z, z >> 32) % 100)::BIGINT AS pk FROM ek4)")]
    selects = []
    for p in pcts:
        ctes.append(
            f"ks{p} AS MATERIALIZED (SELECT src, dst FROM ek "
            f"WHERE pk >= {p} UNION ALL SELECT dst AS src, "
            f"src AS dst FROM ek WHERE pk >= {p})")
        ctes.append(f"e{p}l0 AS (SELECT v, v AS lab FROM allv)")
        for i in range(1, rounds + 1):
            pv = f"e{p}l{i - 1}"
            ctes.append(
                f"e{p}l{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({pv}.lab, coalesce(m.lab, {pv}.lab)) AS lab "
                f"FROM allv JOIN {pv} USING (v) LEFT JOIN "
                f"(SELECT ks{p}.dst AS v, min({pv}.lab) AS lab "
                f"FROM ks{p} JOIN {pv} ON {pv}.v = ks{p}.src "
                f"GROUP BY ks{p}.dst) m USING (v))")
        ctes.append(
            f"g{p} AS (SELECT max(c)::BIGINT AS giant FROM ("
            f"SELECT lab, count(*)::BIGINT AS c FROM e{p}l{rounds} "
            f"GROUP BY lab))")
        selects.append(
            f"SELECT {p}::BIGINT AS pct, (SELECT count(*) FROM ek "
            f"WHERE pk >= {p})::BIGINT AS n_edges_kept, "
            f"(SELECT giant FROM g{p}) AS giant_size, "
            f"round((SELECT giant FROM g{p}) "
            f"/ (SELECT n FROM nv)::DOUBLE, 6) AS giant_share")
    return (f"WITH {', '.join(ctes)} SELECT * FROM ("
            f"{' UNION ALL '.join(selects)}) ORDER BY pct")


ORACLE_SQL["doc_edge_percolation"] = _edge_percolation_sql(
    EDGE_PERC_PCTS, CC_ROUNDS)
QUERIES["doc_edge_percolation"] = q_doc_edge_percolation


SWEEP_THRESHOLDS = [0.5, 0.6, 0.7, 0.8, 0.9]


def q_dedup_threshold_sweep(sf_dir):
    """Dedup yield curve: ONE minhash signature+verify pass at the
    loosest threshold (0.5), then each stricter threshold filters the
    exact-verified Jaccard values — (threshold, n_pairs,
    n_docs_removed) where removed = distinct larger ids (the standard
    drop-larger rule).  The knob-tuning table a cleaning run consults
    before committing to a threshold; candidate recall is the 0.5
    banding on BOTH sides, so the curve is exactly reproducible."""
    from .dedup import minhash_dedup_pairs

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()   # verified pairs: the small result
    j = pairs["jaccard"].to_numpy(np.float64)
    b = pairs["b"].to_numpy(np.int64)
    rows = []
    for t in SWEEP_THRESHOLDS:
        m = np.round(j, 6) >= t     # round-6 on BOTH sides (float rule)
        rows.append({"threshold": t, "n_pairs": int(m.sum()),
                     "n_docs_removed": int(np.unique(b[m]).size)})
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out["n_docs_removed"] = out["n_docs_removed"].astype(np.int64)
    return out


# the shared fragment emits (a, b); the sweep also needs the exact
# verified Jaccard — expose it from the same integer counts (ONE double
# division, identical to the engine kernel's)
_SWEEP_MH = _minhash_sql(num_perm=64, bands=16, k=5, threshold=0.5,
                         cap=64).replace(
    "SELECT i.a, i.b\n        FROM inter i",
    "SELECT i.a, i.b, i.i::DOUBLE / (za.sz + zb.sz - i.i) AS jaccard"
    "\n        FROM inter i")
assert "AS jaccard" in _SWEEP_MH

ORACLE_SQL["dedup_threshold_sweep"] = f"""
    WITH mh AS MATERIALIZED ({_SWEEP_MH}),
    t AS (SELECT unnest([{', '.join(str(t) for t in SWEEP_THRESHOLDS)}])
              AS threshold)
    SELECT t.threshold,
           count(*) FILTER (WHERE round(mh.jaccard, 6) >= t.threshold)
               ::BIGINT AS n_pairs,
           count(DISTINCT mh.b) FILTER (
               WHERE round(mh.jaccard, 6) >= t.threshold)
               ::BIGINT AS n_docs_removed
    FROM t LEFT JOIN mh ON TRUE
    GROUP BY t.threshold ORDER BY t.threshold
"""
QUERIES["dedup_threshold_sweep"] = q_dedup_threshold_sweep


def q_doc_two_hop(sf_dir):
    """Exact 2-hop neighborhood size for the sampled root set
    (v % 7 == 0): |{w : dist(v, w) <= 2, w != v}| over the symmetric
    graph — the local-reach statistic behind friend-of-friend features
    and ANF calibration.  Root membership is ARITHMETIC (id % 7), so
    hop-1 selection is a stateless filter, hop-2 is one hash join, and
    the distinct count is a coarse root-bucket kernel — no root
    broadcast at any scale."""
    from .algos.triangles import n_buckets_for
    from .dedup import _join_parts
    from .edges import symmetrize
    from .runtime import counted

    sym, n_sym = counted(symmetrize(documents_edges(sf_dir)))

    def h1f(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = pa.table({"r": b["src"], "w": b["dst"]})
        return t.filter(pa.array(s % 7 == 0))

    h1 = sym.map_batches(h1f, batch_format="pyarrow").materialize()
    s2 = sym.map_batches(
        lambda b: pa.table({"w": b["src"], "w2": b["dst"]}),
        batch_format="pyarrow")
    h2 = h1.join(s2, join_type="inner",
                 num_partitions=_join_parts(n_sym), on=("w",)) \
        .map_batches(lambda b: pa.table({"r": b["r"], "w": b["w2"]}),
                     batch_format="pyarrow")
    both = h1.select_columns(["r", "w"]).union(h2)
    nb = n_buckets_for(2 * n_sym)

    def tag(b: pa.Table) -> pa.Table:
        r = b["r"].to_numpy(zero_copy_only=False)
        return b.append_column("rb",
                               pa.array((r % nb).astype(np.int64)))

    def cnt(g: pa.Table) -> pa.Table:
        r = g["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = r != w
        r, w = r[m], w[m]
        o = np.lexsort((w, r))
        r, w = r[o], w[o]
        first = np.ones(len(r), dtype=bool)
        first[1:] = (r[1:] != r[:-1]) | (w[1:] != w[:-1])
        u, c = np.unique(r[first], return_counts=True)
        return pa.table({"v": pa.array(u),
                         "n_within_2": pa.array(c.astype(np.int64))})

    return both.map_batches(tag, batch_format="pyarrow") \
        .groupby("rb").map_groups(cnt, batch_format="pyarrow")


ORACLE_SQL["doc_two_hop"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e
            UNION ALL SELECT dst AS src, src AS dst FROM e),
    h1 AS MATERIALIZED (SELECT src AS r, dst AS w FROM sym
                        WHERE src % 7 = 0),
    h2 AS (SELECT h1.r, s.dst AS w FROM h1
           JOIN sym s ON s.src = h1.w),
    un AS (SELECT r, w FROM h1 UNION SELECT r, w FROM h2)
    SELECT r AS v, count(*)::BIGINT AS n_within_2
    FROM un WHERE w <> r GROUP BY r
"""
QUERIES["doc_two_hop"] = q_doc_two_hop


def q_sketch_cms_error(sf_dir):
    """Count-Min calibration report (the CMS twin of sketch_hll_error):
    over the fixed probe set, how far do the sketch's point estimates
    overshoot truth — (n_probes, n_exact, max_overestimate,
    mean_overestimate round-6).  est >= true always (the CMS bound),
    so the report certifies the sketch parameters for the corpus."""
    from .sketch import cms_token_counts

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])
    r = cms_token_counts(docs)
    over = (r["est"] - r["true_n"]).to_numpy(np.int64)
    return pd.DataFrame({
        "n_probes": np.array([len(r)], np.int64),
        "n_exact": np.array([int((over == 0).sum())], np.int64),
        "max_overestimate": np.array([int(over.max())], np.int64),
        "mean_overestimate": [round(float(over.mean()), 6)]})


ORACLE_SQL["sketch_cms_error"] = f"""
    WITH cms AS MATERIALIZED ({_SK.cms_sql()})
    SELECT count(*)::BIGINT AS n_probes,
           count(*) FILTER (WHERE est = true_n)::BIGINT AS n_exact,
           max(est - true_n)::BIGINT AS max_overestimate,
           round(avg(est - true_n), 6) AS mean_overestimate
    FROM cms
"""
QUERIES["sketch_cms_error"] = q_sketch_cms_error


def q_events_rate_change(sf_dir):
    """Per-type Poisson rate-change screen: split the corpus time range
    at the exact integer midpoint (min_us + max_us) // 2, count each
    event type's first/second-half events, and report the G-test
    statistic  G = 2*(n1*ln(2n1/n) + n2*ln(2n2/n))  (0-count terms are
    0).  Counts are exact integers; ln is math.log — bit-identical to
    DuckDB ln() (the tokenizer rule) — so the round-6 G values match
    exactly.  Map-side (type x half) partials, driver stat."""
    import math

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type"]).materialize()
    lo = int(pc.cast(pa.scalar(ev.min("ts")), pa.int64()).as_py())
    hi = int(pc.cast(pa.scalar(ev.max("ts")), pa.int64()).as_py())
    mid = (lo + hi) // 2

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"event_type": b["event_type"].to_pandas(),
                          "h": (us > mid).astype(np.int64)}) \
            .groupby(["event_type", "h"], sort=False) \
            .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby(["event_type", "h"], sort=True)["n"].sum() \
        .unstack(fill_value=0)
    rows = []
    for t in sorted(d.index):
        n1 = int(d.loc[t].get(0, 0))
        n2 = int(d.loc[t].get(1, 0))
        n = n1 + n2
        g = 0.0
        if n1 > 0:
            g += n1 * math.log(2.0 * n1 / n)
        if n2 > 0:
            g += n2 * math.log(2.0 * n2 / n)
        rows.append({"event_type": t,
                     "n_first": n1, "n_second": n2,
                     "g_stat": round(2.0 * g, 6)})
    out = pd.DataFrame(rows)
    out["n_first"] = out["n_first"].astype(np.int64)
    out["n_second"] = out["n_second"].astype(np.int64)
    return out


ORACLE_SQL["events_rate_change"] = """
    WITH mm AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2
                    AS mid FROM events),
    c AS (SELECT event_type,
                 count(*) FILTER (WHERE epoch_us(ts)
                     <= (SELECT mid FROM mm))::BIGINT AS n_first,
                 count(*) FILTER (WHERE epoch_us(ts)
                     > (SELECT mid FROM mm))::BIGINT AS n_second
          FROM events GROUP BY event_type)
    SELECT event_type, n_first, n_second,
           round(2.0 * (
             (CASE WHEN n_first > 0 THEN n_first * ln(2.0 * n_first
                 / (n_first + n_second)) ELSE 0.0 END)
           + (CASE WHEN n_second > 0 THEN n_second * ln(2.0 * n_second
                 / (n_first + n_second)) ELSE 0.0 END)), 6) AS g_stat
    FROM c ORDER BY event_type
"""
QUERIES["events_rate_change"] = q_events_rate_change


PACK_WASTE_SHARDS = 8


def q_pack_waste(sf_dir):
    """Padding-waste report for NO-SPLIT packing (the policy dual of
    pack_sequences' concat-and-chunk): docs are packed greedy next-fit
    in doc_id order WITHIN their shard (doc_id % 8) — whole docs only;
    a doc that doesn't fit closes the bin; oversized docs take
    floor(n/L) dedicated bins + a remainder bin.  Per shard:
    (shard, n_docs, total_tokens, n_bins, fill_rate) — the padding
    waste a no-split loader pays vs the chunker's zero waste.
    Per-shard packing is embarrassingly parallel (at corpus scale use
    many shards, each node-sized); the oracle replays the same greedy
    recurrence as a rank-synchronous recursive CTE."""
    from .text import add_token_count

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    L = PACK_SEQ_LEN

    def tag(b: pa.Table) -> pa.Table:
        t = add_token_count(b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "shard": pa.array((ids % PACK_WASTE_SHARDS)
                              .astype(np.int64))})

    def pack(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = g["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        o = np.argsort(ids)
        n = n[o]
        bins, f = 0, 0
        for x in n:
            if x == 0:
                continue
            if f + x <= L:
                f += x
            else:
                if f > 0:
                    bins += 1
                bins += int(x // L)
                f = int(x % L)
        if f > 0:
            bins += 1
        tot = int(n.sum())
        shard = int(g["shard"][0].as_py())
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "n_docs": pa.array([len(n)], pa.int64()),
            "total_tokens": pa.array([tot], pa.int64()),
            "n_bins": pa.array([bins], pa.int64()),
            "fill_rate": pa.array(
                [round(tot / (bins * L), 6) if bins else 0.0],
                pa.float64())})

    return docs.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack, batch_format="pyarrow")


def _pack_waste_sql() -> str:
    L = PACK_SEQ_LEN
    S = PACK_WASTE_SHARDS
    return f"""
    WITH RECURSIVE t AS MATERIALIZED (
      SELECT doc_id, doc_id % {S} AS shard,
             length(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> ''))::BIGINT AS n,
             row_number() OVER (PARTITION BY doc_id % {S}
                                ORDER BY doc_id)::BIGINT AS i
      FROM documents),
    st AS (
      SELECT shard, 0::BIGINT AS i, 0::BIGINT AS bins, 0::BIGINT AS f
      FROM (SELECT DISTINCT shard FROM t)
      UNION ALL
      SELECT st.shard, st.i + 1,
             CASE WHEN t.n = 0 THEN st.bins
                  WHEN st.f + t.n <= {L} THEN st.bins
                  ELSE st.bins + (CASE WHEN st.f > 0 THEN 1 ELSE 0 END)
                       + t.n // {L} END,
             CASE WHEN t.n = 0 THEN st.f
                  WHEN st.f + t.n <= {L} THEN st.f + t.n
                  ELSE t.n % {L} END
      FROM st JOIN t ON t.shard = st.shard AND t.i = st.i + 1),
    fin AS (SELECT shard, bins, f FROM (
              SELECT *, row_number() OVER (PARTITION BY shard
                  ORDER BY i DESC) AS rn FROM st) WHERE rn = 1),
    agg AS (SELECT shard, count(*)::BIGINT AS n_docs,
                   sum(n)::BIGINT AS total_tokens
            FROM t GROUP BY shard)
    SELECT a.shard, a.n_docs, a.total_tokens,
           (fin.bins + CASE WHEN fin.f > 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_bins,
           round(a.total_tokens / ((fin.bins +
               CASE WHEN fin.f > 0 THEN 1 ELSE 0 END) * {L})::DOUBLE,
               6) AS fill_rate
    FROM agg a JOIN fin USING (shard) ORDER BY a.shard
    """


ORACLE_SQL["pack_waste"] = _pack_waste_sql()
QUERIES["pack_waste"] = q_pack_waste


def q_events_cusum_binseg(sf_dir):
    """Binary-segmentation changepoints, depth 2 (the multi-changepoint
    extension of events_cusum): changepoint 1 from the full exact-
    integer scaled scan, changepoint 2 = the stronger of the two
    within-segment scans (windows.daily_cusum_binseg)."""
    from .windows import daily_cusum_binseg

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])
    return daily_cusum_binseg(ev)


ORACLE_SQL["events_cusum_binseg"] = """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum((floor(value * 100.0 + 0.5))::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1),
    base AS (SELECT day, cents,
                    row_number() OVER (ORDER BY day)::BIGINT AS rn
             FROM d),
    c AS (SELECT rn, day,
                 ((SELECT count(*) FROM d)
                  * sum(cents) OVER (ORDER BY day)
                  - rn * (SELECT sum(cents) FROM d))::BIGINT AS cus
          FROM base),
    cp1 AS (SELECT rn, day, cus FROM c
            ORDER BY abs(cus) DESC, day ASC LIMIT 1),
    seg AS (SELECT day, cents, rn,
                   CASE WHEN rn <= (SELECT rn FROM cp1)
                        THEN 0 ELSE 1 END AS sg
            FROM base),
    sc AS (SELECT sg, day,
                  ((count(*) OVER (PARTITION BY sg))
                   * sum(cents) OVER (PARTITION BY sg ORDER BY day)
                   - (row_number() OVER (PARTITION BY sg
                                         ORDER BY day))
                   * (sum(cents) OVER (PARTITION BY sg)))::BIGINT
                      AS cus,
                  count(*) OVER (PARTITION BY sg)::BIGINT AS n
           FROM seg),
    cand AS (SELECT sg, day, cus, n, row_number() OVER (
                 PARTITION BY sg ORDER BY abs(cus) DESC, day ASC)
                 AS rnk FROM sc),
    cp2 AS (SELECT day, cus FROM cand WHERE rnk = 1 AND n >= 2
            ORDER BY abs(cus) DESC, day ASC LIMIT 1)
    SELECT rnk, day, cusum_scaled FROM (
      SELECT 1::BIGINT AS rnk, day, cus AS cusum_scaled FROM cp1
      UNION ALL
      SELECT 2::BIGINT, day, cus FROM cp2) ORDER BY rnk
"""
QUERIES["events_cusum_binseg"] = q_events_cusum_binseg


def q_corpus_rank_sample(sf_dir):
    """Centrality-gated corpus curation: keep the documents whose
    round-6 PageRank clears the corpus P75 (exact quantile_disc order
    statistic over the rank distribution, quantiles.exact_quantiles)
    — graph signal meets corpus selection, the link-quality cut a
    web-corpus build applies.  Returns (doc_id, rank) survivors."""
    from .quantiles import exact_quantiles

    ranks = q_doc_pagerank(sf_dir).materialize()
    thr = float(exact_quantiles(ranks, "rank", [0.75])["val"].iloc[0])

    def keep(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["v"], "rank": b["rank"]}).filter(
            pc.greater_equal(b["rank"], thr))

    return ranks.map_batches(keep, batch_format="pyarrow")


ORACLE_SQL["corpus_rank_sample"] = f"""
    WITH pr AS MATERIALIZED ({_pagerank_sql(PR_ITERS, 6)}),
    thr AS (SELECT quantile_disc(rank, 0.75) AS t FROM pr)
    SELECT v AS doc_id, rank FROM pr
    WHERE rank >= (SELECT t FROM thr)
"""
QUERIES["corpus_rank_sample"] = q_corpus_rank_sample


def q_web_tlds(sf_dir):
    """TLD rollup over the canonical hosts: (tld, n_domains, n_docs) —
    the registry-level breakdown a crawl-coverage review reads.  TLD =
    the last dot label of the www-stripped host; domain distinct
    counts are exact (the TLD x domain catalog is bounded)."""
    from .web import canonicalize, domain_of, urls_from_batch

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])

    def part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dom = domain_of(canonicalize(urls_from_batch(d)))
        tld = dom.str.rsplit(".", n=1).str[-1]
        g = pd.DataFrame({"tld": tld, "domain": dom}) \
            .groupby(["tld", "domain"], sort=False) \
            .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = docs.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby(["tld", "domain"], sort=True)["n"].sum() \
        .reset_index()
    out = d.groupby("tld", sort=True).agg(
        n_domains=("domain", "nunique"),
        n_docs=("n", "sum")).reset_index()
    out["n_domains"] = out["n_domains"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


ORACLE_SQL["web_tlds"] = f"""
    WITH c AS ({_WEB_CANON_SQL}),
    t AS (SELECT regexp_extract(canon,
                 '^https://(?:www\\.)?([^/:?#]+)', 1) AS domain
          FROM c),
    x AS (SELECT domain,
                 string_split(domain, '.')[-1] AS tld FROM t)
    SELECT tld, count(DISTINCT domain)::BIGINT AS n_domains,
           count(*)::BIGINT AS n_docs
    FROM x GROUP BY tld ORDER BY tld
"""
QUERIES["web_tlds"] = q_web_tlds


def q_events_stickiness(sf_dir):
    """Weekly engagement stickiness: per ISO-ish week (floor(day/7)),
    WAU = distinct active users, mean-DAU = (sum over the week's days
    of that day's distinct actives) / 7, stickiness = meanDAU / WAU —
    the product-health ratio.  Exact integers until ONE float division
    (round 6); (user, day) distinct partials into bounded week
    buckets."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "user_id"])

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"day": day, "u": u}).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    # (day, user) pairs are corpus-bounded (users x days); the distinct
    # fold happens once on the driver frame of per-batch uniques
    pairs = ev.map_batches(part, batch_format="pyarrow").to_pandas() \
        .drop_duplicates()
    pairs["week"] = pairs["day"] // 7
    rows = []
    for w, g in pairs.groupby("week", sort=True):
        wau = int(g["u"].nunique())
        dau_sum = int(g.drop_duplicates(["day", "u"]).shape[0])
        rows.append({"week": int(w), "wau": wau,
                     "dau_day_sum": dau_sum,
                     "stickiness": round(dau_sum / 7.0 / wau, 6)})
    out = pd.DataFrame(rows)
    for c in ("week", "wau", "dau_day_sum"):
        out[c] = out[c].astype(np.int64)
    return out


ORACLE_SQL["events_stickiness"] = """
    WITH p AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                      user_id FROM events),
    w AS (SELECT day // 7 AS week, day, user_id FROM p)
    SELECT week, count(DISTINCT user_id)::BIGINT AS wau,
           count(*)::BIGINT AS dau_day_sum,
           round(count(*) / 7.0 / count(DISTINCT user_id), 6)
               AS stickiness
    FROM w GROUP BY week ORDER BY week
"""
QUERIES["events_stickiness"] = q_events_stickiness


def q_events_user_concentration(sf_dir):
    """Power-user concentration (the activity twin of
    events_value_concentration): share of ALL events generated by the
    top decile of users (k = max(1, n_users // 10), ranked by event
    count DESC then user_id ASC — deterministic boundary).  Exact
    integers + one float division.  Per-user counts from coarse
    user-bucket partials; only the k boundary rows matter, folded on
    the driver from per-bucket (count, user) partial top-ks."""
    from .algos.triangles import n_buckets_for
    from .runtime import counted

    ev, n_ev = counted(read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]))
    nb = n_buckets_for(n_ev)

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, c = np.unique(u, return_counts=True)
        return pa.table({"u": pa.array(uu),
                         "c": pa.array(c.astype(np.int64)),
                         "ub": pa.array((uu % nb).astype(np.int64))})

    def per_user(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        cc = np.bincount(inv, weights=c.astype(np.float64),
                         minlength=len(uu)).astype(np.int64)
        return pa.table({"u": pa.array(uu), "c": pa.array(cc)})

    pu = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("ub").map_groups(per_user, batch_format="pyarrow") \
        .to_pandas()
    n_users = len(pu)
    k = max(1, n_users // 10)
    o = np.lexsort((pu["u"].to_numpy(np.int64),
                    -pu["c"].to_numpy(np.int64)))
    top = int(pu["c"].to_numpy(np.int64)[o][:k].sum())
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "top_decile_users": np.array([k], np.int64),
        "top_decile_events": np.array([top], np.int64),
        "total_events": np.array([n_ev], np.int64),
        "top_decile_share": [round(top / n_ev, 6)]})


ORACLE_SQL["events_user_concentration"] = """
    WITH pu AS (SELECT user_id, count(*)::BIGINT AS c FROM events
                GROUP BY user_id),
    nn AS (SELECT count(*)::BIGINT AS n_users,
                  greatest(1, count(*) // 10)::BIGINT AS k FROM pu),
    r AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id ASC)
              AS rn FROM pu)
    SELECT nn.n_users, nn.k AS top_decile_users,
           (SELECT sum(c) FROM r WHERE rn <= nn.k)::BIGINT
               AS top_decile_events,
           (SELECT count(*) FROM events)::BIGINT AS total_events,
           round((SELECT sum(c) FROM r WHERE rn <= nn.k)
                 / (SELECT count(*) FROM events)::DOUBLE, 6)
               AS top_decile_share
    FROM nn
"""
QUERIES["events_user_concentration"] = q_events_user_concentration


def q_doc_degree_quantiles(sf_dir):
    """Degree-distribution quantiles (P50/P90/P99) of the symmetric doc
    graph — quantile_disc order statistics over the exact integer
    degree table (quantiles.exact_quantiles), isolated vertices
    excluded (degree table covers edge-touching vertices only)."""
    from .edges import degree_table, symmetrize
    from .quantiles import exact_quantiles

    deg = degree_table(symmetrize(documents_edges(sf_dir)), "src")
    out = exact_quantiles(deg, "degree", [0.5, 0.9, 0.99])
    out["val"] = out["val"].astype(np.int64)
    return out


ORACLE_SQL["doc_degree_quantiles"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e
            UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src AS v, count(*)::BIGINT AS degree FROM sym
            GROUP BY src)
    SELECT 0.5 AS q, quantile_disc(degree, 0.5)::BIGINT AS val FROM deg
    UNION ALL
    SELECT 0.9, quantile_disc(degree, 0.9)::BIGINT FROM deg
    UNION ALL
    SELECT 0.99, quantile_disc(degree, 0.99)::BIGINT FROM deg
    ORDER BY q
"""
QUERIES["doc_degree_quantiles"] = q_doc_degree_quantiles


def q_tpch_quantity_hist(sf_dir):
    """Order-quantity histogram over lineitem: (l_quantity, n_items,
    revenue_cents) per integer quantity — the distribution profile a
    demand model reads.  Revenue in EXACT integer cents
    (floor(extendedprice * (1 - discount) * 100 + 0.5) per line), so
    no float association anywhere; bounded-domain map-side bincount
    partials + driver merge."""
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"])

    def part(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5) \
            .astype(np.int64)
        uq, inv = np.unique(q, return_inverse=True)
        n = np.bincount(inv, minlength=len(uq)).astype(np.int64)
        rc = np.bincount(inv, weights=cents.astype(np.float64),
                         minlength=len(uq)).astype(np.int64)
        return pa.table({"l_quantity": pa.array(uq),
                         "n_items": pa.array(n),
                         "revenue_cents": pa.array(rc)})

    parts = li.map_batches(part, batch_format="pyarrow").to_pandas()
    out = parts.groupby("l_quantity", sort=True)[
        ["n_items", "revenue_cents"]].sum().reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


ORACLE_SQL["tpch_quantity_hist"] = """
    SELECT l_quantity::BIGINT AS l_quantity,
           count(*)::BIGINT AS n_items,
           sum((floor(l_extendedprice * (1.0 - l_discount) * 100.0
                + 0.5))::BIGINT)::BIGINT AS revenue_cents
    FROM lineitem GROUP BY 1 ORDER BY 1
"""
QUERIES["tpch_quantity_hist"] = q_tpch_quantity_hist


def q_doc_fiedler(sf_dir):
    """Spectral bisection of the largest connected component
    (algos/fiedler.py): deflated power iteration on
    (I + D^-1/2 A D^-1/2)/2 — one add-combine superstep per round plus
    two scalar map_vertices reduces (deflation + normalization).
    Returns (v, fiedler) for component members, round-6.  Oracle:
    _fiedler_sql — unrolled CC -> largest component -> the identical
    iteration."""
    from .algos.fiedler import FIEDLER_ROUNDS, fiedler_vector

    eng = documents_engine(sf_dir, "undirected")
    fiedler_vector(eng, rounds=FIEDLER_ROUNDS)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table({
            "v": b["v"], "label": b["label"],
            "fiedler": pc2.round(b["fiedler"], ndigits=6)})

    st = eng.state_dataset(["label", "fiedler"]).map_batches(
        keep, batch_format="pyarrow")
    from .algos.fiedler import largest_component_label

    lab = largest_component_label(eng)
    out = st.filter(expr=f"label == {lab}")
    return out.map_batches(
        lambda b: b.select(["v", "fiedler"]), batch_format="pyarrow")


def _fiedler_sql(rounds: int, cc_rounds: int) -> str:
    """Oracle for q_doc_fiedler (algos/fiedler.py): unrolled min-label
    CC chain -> largest component (count DESC, label ASC) -> the
    identical deflated power iteration on M = (I + D^-1/2 A D^-1/2)/2,
    seeded with the murmur-mixed unit-interval init, deflated against
    v1 = sqrt(d)/||sqrt(d)|| and L2-normalized every round.  Assumes the
    largest component has >= 2 members (any corpus with at least one
    edge)."""
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            "l0 AS MATERIALIZED (SELECT v, v AS lab FROM allv)"]
    for i in range(1, cc_rounds + 1):
        p = f"l{i - 1}"
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT allv.v, least({p}.lab, "
            f"coalesce(m.lab, {p}.lab)) AS lab FROM allv JOIN {p} "
            f"USING (v) LEFT JOIN (SELECT sym.dst AS v, min({p}.lab) "
            f"AS lab FROM sym JOIN {p} ON {p}.v = sym.src "
            f"GROUP BY sym.dst) m USING (v))")
    last_cc = f"l{cc_rounds}"
    ctes += [
        f"""big AS (SELECT lab FROM (
          SELECT lab, count(*) AS n FROM {last_cc} GROUP BY lab)
          ORDER BY n DESC, lab ASC LIMIT 1)""",
        f"""mem AS MATERIALIZED (
          SELECT v FROM {last_cc} WHERE lab = (SELECT lab FROM big))""",
        """deg AS MATERIALIZED (
          SELECT sym.src AS v, count(*)::DOUBLE AS d
          FROM sym JOIN mem ON mem.v = sym.src GROUP BY sym.src)""",
        "m2 AS (SELECT sum(d) AS s FROM deg)",
        """v1 AS MATERIALIZED (
          SELECT v, sqrt(d) / sqrt((SELECT s FROM m2)) AS w FROM deg)""",
        "z00 AS (SELECT v, v::UBIGINT AS z FROM mem)",
    ]
    ctes += _wl_mix_ctes("zm", "z00")
    ctes += [
        ("x0 AS (SELECT v, z::DOUBLE / 18446744073709551616.0 - 0.5 "
         "AS x FROM zm)"),
        "a0 AS (SELECT sum(x0.x * v1.w) AS a FROM x0 JOIN v1 USING (v))",
        """d0 AS (SELECT x0.v, x0.x - (SELECT a FROM a0) * v1.w AS x
          FROM x0 JOIN v1 USING (v))""",
        "n0 AS (SELECT sqrt(greatest(sum(x*x), 1e-300)) AS n FROM d0)",
        ("c0 AS MATERIALIZED (SELECT v, x / (SELECT n FROM n0) AS x "
         "FROM d0)"),
    ]
    for r in range(1, rounds + 1):
        p = f"c{r - 1}"
        ctes += [
            f"""g{r} AS MATERIALIZED (
              SELECT sym.dst AS v, sum(c.x / sqrt(du.d)) AS sm
              FROM sym JOIN {p} c ON c.v = sym.src
              JOIN deg du ON du.v = sym.src
              GROUP BY sym.dst)""",
            f"""y{r} AS (SELECT c.v,
              0.5 * (coalesce(g.sm, 0.0) / sqrt(dv.d) + c.x) AS y
              FROM {p} c JOIN deg dv USING (v)
              LEFT JOIN g{r} g USING (v))""",
            f"""a{r} AS (SELECT sum(y.y * v1.w) AS a FROM y{r} y
              JOIN v1 USING (v))""",
            f"""e{r} AS (SELECT y.v,
              y.y - (SELECT a FROM a{r}) * v1.w AS x
              FROM y{r} y JOIN v1 USING (v))""",
            f"""n{r} AS (SELECT sqrt(greatest(sum(x*x), 1e-300)) AS n
              FROM e{r})""",
            f"""c{r} AS MATERIALIZED (SELECT v,
              x / (SELECT n FROM n{r}) AS x FROM e{r})""",
        ]
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, round(x, 6) AS fiedler FROM c{rounds}")


ORACLE_SQL["doc_fiedler"] = _fiedler_sql(8, CC_ROUNDS)
QUERIES["doc_fiedler"] = q_doc_fiedler


DEG_HIST_W = 4


def q_doc_sparsify(sf_dir):
    """Deterministic spectral-sketch-style edge sparsification + degree
    -distortion report: keep canonical edge (u, v) iff
    mix64(u*2^32 + v) % min(deg(u), deg(v)) == 0 — an
    effective-resistance PROXY (1/min-degree sampling): every edge at a
    degree-1 endpoint survives (connectivity-friendly), dense-region
    edges thin out ~1/min-degree.  Report = fixed-width histograms of
    the symmetric vertex degree before vs after (bounded bin domain,
    map-side partials).  Gated degree attach (joins.attach_by_key);
    the keep rule itself is stateless map-side."""
    from .edges import degree_table, symmetrize
    from .joins import attach_by_key

    edges = documents_edges(sf_dir)
    sym = symmetrize(edges)
    deg = degree_table(sym, "src")
    tagged = attach_by_key(edges, deg, ["src", "dst"], "v", "degree")

    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        from .algos.wl import mix64

        z = mix64(s * np.uint64(4294967296) + t)
        md = np.minimum(
            b["degree_src"].to_numpy(zero_copy_only=False),
            b["degree_dst"].to_numpy(zero_copy_only=False)) \
            .astype(np.uint64)
        k = (z % np.maximum(md, np.uint64(1))) == 0
        return pa.table({"src": pa.array(s[k].astype(np.int64)),
                         "dst": pa.array(t[k].astype(np.int64))})

    kept_edges = tagged.map_batches(keep, batch_format="pyarrow") \
        .materialize()
    deg_after = degree_table(symmetrize(kept_edges), "src")

    def hist(colds):
        def part(b: pa.Table) -> pa.Table:
            d = b["degree"].to_numpy(zero_copy_only=False)
            binv = (d // DEG_HIST_W).astype(np.int64)
            cnt = np.bincount(binv)
            nz = np.flatnonzero(cnt)
            return pa.table({"bin": pa.array(nz.astype(np.int64)),
                             "n": pa.array(cnt[nz].astype(np.int64))})

        parts = colds.map_batches(part,
                                  batch_format="pyarrow").to_pandas()
        return parts.groupby("bin")["n"].sum()

    hb = hist(deg)
    ha = hist(deg_after)
    bins = sorted(set(hb.index) | set(ha.index))
    return pd.DataFrame({
        "bin": np.array(bins, np.int64),
        "n_before": np.array([int(hb.get(b, 0)) for b in bins],
                             np.int64),
        "n_after": np.array([int(ha.get(b, 0)) for b in bins],
                            np.int64)})


ORACLE_SQL["doc_sparsify"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS MATERIALIZED (
      SELECT src AS v, count(*)::BIGINT AS d FROM sym GROUP BY src),
    z0 AS (SELECT e.src, e.dst,
                  ((e.src::HUGEINT * 4294967296 + e.dst::HUGEINT)
                   % {_W64})::UBIGINT AS z,
                  least(ds.d, dd.d) AS md
           FROM e JOIN deg ds ON ds.v = e.src
                  JOIN deg dd ON dd.v = e.dst),
    z1 AS (SELECT src, dst, xor(z, z >> 33) AS z, md FROM z0),
    z2 AS (SELECT src, dst,
           {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z, md
           FROM z1),
    z3 AS (SELECT src, dst, xor(z, z >> 29) AS z, md FROM z2),
    z4 AS (SELECT src, dst,
           {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z, md
           FROM z3),
    pri AS (SELECT src, dst, xor(z, z >> 32) AS z, md FROM z4),
    kept AS MATERIALIZED (
      SELECT src, dst FROM pri
      WHERE z % greatest(md, 1)::UBIGINT = 0),
    syma AS (SELECT src, dst FROM kept
             UNION ALL SELECT dst, src FROM kept),
    dega AS (SELECT src AS v, count(*)::BIGINT AS d FROM syma
             GROUP BY src),
    hb AS (SELECT d // {DEG_HIST_W} AS bin, count(*)::BIGINT AS n
           FROM deg GROUP BY 1),
    ha AS (SELECT d // {DEG_HIST_W} AS bin, count(*)::BIGINT AS n
           FROM dega GROUP BY 1)
    SELECT coalesce(hb.bin, ha.bin)::BIGINT AS bin,
           coalesce(hb.n, 0)::BIGINT AS n_before,
           coalesce(ha.n, 0)::BIGINT AS n_after
    FROM hb FULL OUTER JOIN ha ON hb.bin = ha.bin
"""
QUERIES["doc_sparsify"] = q_doc_sparsify


def q_events_seasonality(sf_dir):
    """Day-of-week seasonality profile of revenue: per-dow exact-cents
    totals and event counts from calendar-bounded map-side partials,
    plus the seasonality index (dow mean / overall mean) as ONE float
    expression on the folded integers (epoch day 0 = Thursday, dow =
    (day + 4) % 7 ISO-Monday-0 convention)."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        n = np.bincount(dow, minlength=7)
        s = np.bincount(dow, weights=cents.astype(np.float64),
                        minlength=7).astype(np.int64)
        return pa.table({"dow": pa.array(np.arange(7, dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "cents": pa.array(s)})

    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    g = parts.groupby("dow")[["n", "cents"]].sum()
    n = g["n"].to_numpy(np.int64)
    cents = g["cents"].to_numpy(np.int64)
    tot_n, tot_c = int(n.sum()), int(cents.sum())
    idx = np.zeros(7)
    nz = n > 0
    if tot_n:
        idx[nz] = (cents[nz] / n[nz]) / (tot_c / tot_n)
    keep = np.flatnonzero(n)
    return pd.DataFrame({"dow": g.index.to_numpy(np.int64)[keep],
                         "n_events": n[keep], "cents": cents[keep],
                         "season_idx": np.round(idx[keep], 6)})


ORACLE_SQL["events_seasonality"] = """
    WITH d AS (
      SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
             (floor(value * 100.0 + 0.5))::BIGINT AS cents
      FROM events),
    g AS (SELECT dow, count(*)::BIGINT AS n_events,
                 sum(cents)::BIGINT AS cents
          FROM d GROUP BY dow),
    t AS (SELECT sum(n_events)::BIGINT AS tn,
                 sum(cents)::BIGINT AS tc FROM g)
    SELECT dow, n_events, cents,
           round((cents::DOUBLE / n_events)
                 / ((SELECT tc FROM t)::DOUBLE / (SELECT tn FROM t)),
                 6) AS season_idx
    FROM g WHERE n_events > 0
"""
QUERIES["events_seasonality"] = q_events_seasonality


DOMAIN_QUALITY_MIN = 0.45


def q_web_domain_quality(sf_dir):
    """Domain-level quality curation (the C4 'UGC-domain' filter shape):
    per-domain mean quality score (text.add_quality, round-6 per doc)
    over the bounded domain catalog, the keep decision
    (mean >= {min}), and the count of surviving docs — one pruned doc
    scan with bounded-domain partials, no shuffle.""" \
        .format(min=DOMAIN_QUALITY_MIN)
    from .text import add_quality
    from .web import canonicalize, domain_of, urls_from_batch

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        q = add_quality(b)["quality"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dom = domain_of(canonicalize(urls_from_batch(d)))
        df = pd.DataFrame({"domain": dom, "qsum": q, "n": 1})
        g = df.groupby("domain", sort=False).agg(
            qsum=("qsum", "sum"), n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = docs.map_batches(part, batch_format="pyarrow").to_pandas()
    g = parts.groupby("domain")[["qsum", "n"]].sum().reset_index()
    mean_q = (g["qsum"] / g["n"]).round(6)
    keep = (mean_q >= DOMAIN_QUALITY_MIN).astype(np.int64)
    return pd.DataFrame({
        "domain": g["domain"],
        "n_docs": g["n"].astype(np.int64),
        "mean_quality": mean_q,
        "keep": keep}).sort_values("domain").reset_index(drop=True)


def _web_domain_quality_sql() -> str:
    from .text import PUNCT_RE, QUALITY_STOPWORD_RE, TOKEN_RE

    return f"""
    WITH c AS ({_WEB_CANON_SQL}),
    q AS (SELECT doc_id,
               round(0.4 * least(1.0, n_tok / 50.0)
                   + 0.4 * least(1.0, 5.0 * n_stop / greatest(n_tok, 1.0))
                   + 0.2 * (1.0 - least(1.0,
                                n_punct / greatest(n_tok, 1.0))), 6)
                 AS quality
          FROM (SELECT doc_id,
                 len(regexp_extract_all(text, '{TOKEN_RE}'))::DOUBLE
                     AS n_tok,
                 len(regexp_extract_all(lower(text),
                     '{QUALITY_STOPWORD_RE}'))::DOUBLE AS n_stop,
                 len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE
                     AS n_punct
                FROM documents)),
    g AS (SELECT regexp_extract(canon,
                 '^https://(?:www\\.)?([^/:?#]+)', 1) AS domain,
                 sum(q.quality) AS qsum, count(*)::BIGINT AS n_docs
          FROM c JOIN q USING (doc_id) GROUP BY 1)
    SELECT domain, n_docs, round(qsum / n_docs, 6) AS mean_quality,
           (CASE WHEN round(qsum / n_docs, 6) >= {DOMAIN_QUALITY_MIN}
                 THEN 1 ELSE 0 END)::BIGINT AS keep
    FROM g
    """


ORACLE_SQL["web_domain_quality"] = _web_domain_quality_sql()
QUERIES["web_domain_quality"] = q_web_domain_quality


VORONOI_SEEDS = [0, 7, 23, 101, 211]


def q_doc_voronoi(sf_dir):
    """Graph Voronoi partition from 5 seed docs (algos/voronoi.py):
    nearest-seed assignment with (dist, seed_idx) packed into one int64
    min-relaxation — the balanced-partition / landmark seeding step.
    Returns (v, seed_idx, dist) for reached vertices and (-1, -1) rows
    for unreached ones.  Oracle: _voronoi_sql unrolled packed chain."""
    from .algos.voronoi import SEED_BITS, _UNREACHED, voronoi_assign

    eng = documents_engine(sf_dir, "undirected")
    voronoi_assign(eng, VORONOI_SEEDS, max_steps=BFS_ROUNDS)

    def fin(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy(zero_copy_only=False)
        reached = p != _UNREACHED
        seed = np.where(reached, p & ((1 << SEED_BITS) - 1), -1)
        dist = np.where(reached, p >> SEED_BITS, -1)
        return pa.table({"v": b["v"],
                         "seed_idx": pa.array(seed.astype(np.int64)),
                         "dist": pa.array(dist.astype(np.int64))})

    return eng.state_dataset(["packed"]).map_batches(
        fin, batch_format="pyarrow")


def _voronoi_sql(seeds, rounds: int) -> str:
    """Unrolled packed (dist << SEED_BITS | seed_idx) min-relaxation
    (matches algos/voronoi.py); sentinel stays for unreached."""
    from .algos.voronoi import SEED_BITS, _UNREACHED

    step = 1 << SEED_BITS
    sent = int(_UNREACHED)
    seed_rows = ", ".join(f"({int(s)}, {i})"
                          for i, s in enumerate(seeds))
    ctes = [f"sym AS MATERIALIZED ({DOC_SYM_SQL})",
            "allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"sd(v, i) AS (VALUES {seed_rows})",
            (f"p0 AS MATERIALIZED (SELECT allv.v, "
             f"coalesce(sd.i, {sent}) AS p FROM allv "
             f"LEFT JOIN sd USING (v))")]
    for r in range(1, rounds + 1):
        p = f"p{r - 1}"
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT allv.v, least({p}.p, "
            f"coalesce(m.p, {sent})) AS p FROM allv "
            f"JOIN {p} USING (v) LEFT JOIN "
            f"(SELECT sym.dst AS v, min({p}.p + {step}) AS p FROM sym "
            f"JOIN {p} ON {p}.v = sym.src WHERE {p}.p <> {sent} "
            f"GROUP BY sym.dst) m USING (v))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT v, (CASE WHEN p = {sent} THEN -1 "
            f"ELSE p % {step} END)::BIGINT AS seed_idx, "
            f"(CASE WHEN p = {sent} THEN -1 "
            f"ELSE p // {step} END)::BIGINT AS dist FROM p{rounds}")


ORACLE_SQL["doc_voronoi"] = _voronoi_sql(VORONOI_SEEDS, BFS_ROUNDS)
QUERIES["doc_voronoi"] = q_doc_voronoi


def q_media_motion(sf_dir):
    """REAL motion-energy lane: Y4M demux of every frame -> per-clip
    total |inter-frame luma delta|, peak delta and its frame (earliest
    tie), all integers (multimodal.MotionStage actor pool)."""
    from .multimodal import motion_energy, videos_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])
    return motion_energy(videos_from_documents(docs))


ORACLE_SQL["media_motion"] = """
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + 2 * (doc_id % 8) AS w,
             8 + 2 * (doc_id % 6) AS h,
             3 + doc_id % 5 AS nf
      FROM documents
    ), fr AS (
      SELECT media_id, w, h, nf, gf.f
      FROM m CROSS JOIN (SELECT unnest(range(7)) AS f) gf
      WHERE gf.f < nf
    ), px AS (
      SELECT media_id, w, h, nf, f, gx.x, gy.y
      FROM fr
      CROSS JOIN (SELECT unnest(range(22)) AS x) gx
      CROSS JOIN (SELECT unnest(range(18)) AS y) gy
      WHERE gx.x < w AND gy.y < h
    ), s AS (
      SELECT media_id, nf, f,
             sum((media_id * 131 + f * 29 + y * 17 + x * 7) % 256)
                 ::BIGINT AS sy
      FROM px GROUP BY 1, 2, 3
    ), d AS (
      SELECT media_id, nf, f,
             abs(sy - lag(sy) OVER
                 (PARTITION BY media_id ORDER BY f)) AS delta
      FROM s
    )
    SELECT media_id, CAST(max(nf) AS BIGINT) AS n_frames,
           CAST(coalesce(sum(delta), 0) AS BIGINT) AS total_motion,
           CAST(coalesce(max(delta), 0) AS BIGINT) AS max_delta,
           CAST(coalesce(min(CASE WHEN delta = (
                SELECT max(d2.delta) FROM d d2
                WHERE d2.media_id = d.media_id) THEN f END), -1)
                AS BIGINT) AS peak_frame
    FROM d GROUP BY media_id
"""
QUERIES["media_motion"] = q_media_motion


def q_embed_pq_recall(sf_dir):
    """PQ index quality report: recall@k of the ADC product-quantization
    search against the brute-force cosine top-k, per query (the
    compressed-index twin of embed_recall)."""
    bf = q_ann_topk(sf_dir)[["query_id", "neighbor_id"]]
    pq = q_ann_pq(sf_dir)
    if hasattr(pq, "to_pandas"):
        pq = pq.to_pandas()
    hit = bf.merge(pq[["query_id", "neighbor_id"]],
                   on=["query_id", "neighbor_id"], how="inner") \
        .groupby("query_id").size()
    qids = np.sort(bf["query_id"].unique())
    rec = np.array([hit.get(q, 0) for q in qids], np.float64) / ANN_K
    return pd.DataFrame({"query_id": qids.astype(np.int64),
                         "recall": np.round(rec, 6)})


ORACLE_SQL["embed_pq_recall"] = f"""
    WITH bf AS MATERIALIZED ({ORACLE_SQL["ann_topk"]}),
         pq AS MATERIALIZED ({ORACLE_SQL["ann_pq"]})
    SELECT bf.query_id,
           round(count(pq.neighbor_id)::DOUBLE / {ANN_K}, 6) AS recall
    FROM bf LEFT JOIN pq
      ON pq.query_id = bf.query_id AND pq.neighbor_id = bf.neighbor_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""
QUERIES["embed_pq_recall"] = q_embed_pq_recall


def q_text_ttr(sf_dir):
    """Lexical diversity per document: type-token ratio (distinct
    whitespace words / total words) and the MTLD-lite proxy
    (distinct bigrams / total bigrams) — standard quality features; one
    shuffle-free vectorized pass (the _batch_word_hashes +
    _per_doc_max_and_distinct machinery; hashes are internal distinct
    keys, equivalence with string-keyed SQL up to 2^-64 collisions)."""
    from .text import _batch_word_hashes, _per_doc_max_and_distinct

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wd, h, n_docs = _batch_word_hashes(b["text"].to_pylist())
        n_tok = np.bincount(wd, minlength=n_docs).astype(np.int64)
        _, n_types = _per_doc_max_and_distinct(wd, h, n_docs)
        # bigram hashes: combine consecutive word hashes within a doc
        same = np.zeros(len(wd), dtype=bool)
        if len(wd) > 1:
            same[1:] = wd[1:] == wd[:-1]
        bg_doc = wd[same]
        with np.errstate(over="ignore"):
            bg_h = (np.roll(h, 1)[same] * np.uint64(1099511628211)) ^ \
                h[same]
        n_bg = np.bincount(bg_doc, minlength=n_docs).astype(np.int64)
        _, n_bg_types = _per_doc_max_and_distinct(bg_doc, bg_h, n_docs)
        ttr = np.zeros(n_docs)
        nz = n_tok > 0
        ttr[nz] = n_types[nz] / n_tok[nz]
        bttr = np.zeros(n_docs)
        bz = n_bg > 0
        bttr[bz] = n_bg_types[bz] / n_bg[bz]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_types.astype(np.int64)),
            "ttr": pa.array(np.round(ttr, 6)),
            "bigram_ttr": pa.array(np.round(bttr, 6))})

    return docs.map_batches(part, batch_format="pyarrow")


ORACLE_SQL["text_ttr"] = """
    WITH words AS (
      SELECT doc_id, w, row_number() OVER
               (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM (SELECT doc_id, unnest(list_filter(string_split_regex(
                     lower(text), '[ \t\n]+'), x -> length(x) > 0))
                   AS w,
                   generate_subscripts(list_filter(string_split_regex(
                     lower(text), '[ \t\n]+'), x -> length(x) > 0), 1)
                   AS pos
            FROM documents)),
    uni AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   count(DISTINCT w)::BIGINT AS n_types
            FROM words GROUP BY doc_id),
    bg AS (SELECT a.doc_id, a.w || chr(31) || b.w AS bw
           FROM words a JOIN words b
             ON b.doc_id = a.doc_id AND b.rn = a.rn + 1),
    bi AS (SELECT doc_id, count(*)::BIGINT AS n_bg,
                  count(DISTINCT bw)::BIGINT AS n_bg_types
           FROM bg GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(u.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(u.n_types, 0)::BIGINT AS n_types,
           round(CASE WHEN coalesce(u.n_tokens, 0) > 0
                 THEN u.n_types::DOUBLE / u.n_tokens ELSE 0.0 END, 6)
             AS ttr,
           round(CASE WHEN coalesce(bi.n_bg, 0) > 0
                 THEN bi.n_bg_types::DOUBLE / bi.n_bg ELSE 0.0 END, 6)
             AS bigram_ttr
    FROM documents d LEFT JOIN uni u USING (doc_id)
    LEFT JOIN bi USING (doc_id)
"""
QUERIES["text_ttr"] = q_text_ttr


def q_doc_wl_hist(sf_dir):
    """WL color-class size distribution at the final refinement round:
    (class_size, n_classes) — the graph's structural-symmetry profile
    (how many vertices are 3-WL-indistinguishable).  Reuses the doc_wl
    labels; class sizes resolve in one coarse label-bucket kernel, the
    bounded size histogram folds on the driver."""
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .algos.wl import wl_refine

    eng = documents_engine(sf_dir, "undirected")
    wl_refine(eng, rounds=WL_ROUNDS)
    ds = eng.state_dataset([f"label_{WL_ROUNDS}"])
    n = documents_n_vertices(sf_dir)
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def part(b: pa.Table) -> pa.Table:
        lab = b[f"label_{WL_ROUNDS}"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((lab.view(np.uint64) % np.uint64(nb))
                               .astype(np.int64)),
            "lab": pa.array(lab)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("lab", sort=False).size()
        h = sizes.value_counts()
        return pd.DataFrame({"class_size": h.index.to_numpy(np.int64),
                             "n_classes": h.to_numpy(np.int64)})

    parts = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("class_size")["n_classes"].sum().reset_index()
    out["class_size"] = out["class_size"].astype(np.int64)
    out["n_classes"] = out["n_classes"].astype(np.int64)
    return out


ORACLE_SQL["doc_wl_hist"] = (
    f"WITH {', '.join(_wl_ctes(WL_ROUNDS))}, "
    f"sizes AS (SELECT lab, count(*)::BIGINT AS s "
    f"FROM l{WL_ROUNDS} GROUP BY lab) "
    f"SELECT s AS class_size, count(*)::BIGINT AS n_classes "
    f"FROM sizes GROUP BY s")
QUERIES["doc_wl_hist"] = q_doc_wl_hist


def q_doc_gini(sf_dir):
    """Degree-inequality diagnostic: exact Gini coefficient of the
    symmetric degree distribution via distributed ranking —
    G = (2 * sum(rank_i * d_i)) / (n * sum(d)) - (n + 1) / n with ranks
    1..n by (degree, v) (quantiles.global_value_ranks: range-partitioned,
    no global sort).  All sums exact int64 partials; ONE float
    expression at the end."""
    from ray.data.aggregate import Sum

    from .edges import degree_table, symmetrize
    from .quantiles import global_value_ranks

    deg = degree_table(symmetrize(documents_edges(sf_dir)),
                       "src").materialize()
    ranks = global_value_ranks(deg, value="degree", id_col="v")
    tagged = deg.join(ranks, join_type="inner", num_partitions=4,
                      on=("v",))

    def part(b: pa.Table) -> pa.Table:
        d = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = b["rnk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([len(d)], pa.int64()),
                         "sd": pa.array([int(d.sum())], pa.int64()),
                         "srd": pa.array([int((r * d).sum())],
                                         pa.int64())})

    parts = tagged.map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sd = int(parts["sd"].sum())
    srd = int(parts["srd"].sum())
    g = (2.0 * srd) / (n * sd) - (n + 1.0) / n if n and sd else 0.0
    return pd.DataFrame({"n_vertices": np.array([n], np.int64),
                         "sum_degree": np.array([sd], np.int64),
                         "gini": [round(g, 6)]})


ORACLE_SQL["doc_gini"] = f"""
    WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS v, count(*)::BIGINT AS d FROM sym
            GROUP BY src),
    rk AS (SELECT v, d, row_number() OVER (ORDER BY d, v) AS r
           FROM deg),
    agg AS (SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS sd,
                   sum(r * d)::BIGINT AS srd FROM rk)
    SELECT n AS n_vertices, sd AS sum_degree,
           round(CASE WHEN n > 0 AND sd > 0
                 THEN (2.0 * srd) / (n * sd) - (n + 1.0) / n
                 ELSE 0.0 END, 6) AS gini
    FROM agg
"""
QUERIES["doc_gini"] = q_doc_gini


def q_events_anomaly_by_type(sf_dir):
    """Per-event-type daily anomaly z-scores (windows.
    daily_anomalies_by_type): each type's day series scored against its
    OWN mean/variance — bounded type x day partials, exact-integer
    stats, identical float expression both engines."""
    from .windows import daily_anomalies_by_type

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "event_type"])
    return daily_anomalies_by_type(ev)


ORACLE_SQL["events_anomaly_by_type"] = """
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, count(*)::DOUBLE AS k,
                  sum(n)::DOUBLE AS s, sum(n * n)::DOUBLE AS ss
           FROM d GROUP BY event_type)
    SELECT d.event_type, d.day, d.n,
           round(CASE WHEN st.k >= 2
                  AND (st.ss - st.s * st.s / st.k) / (st.k - 1) > 0
                 THEN (d.n - st.s / st.k)
                      / sqrt((st.ss - st.s * st.s / st.k) / (st.k - 1))
                 ELSE 0.0 END, 6) AS z
    FROM d JOIN st USING (event_type)
"""
QUERIES["events_anomaly_by_type"] = q_events_anomaly_by_type


def q_web_url_stats(sf_dir):
    """URL structure profile over the canonicalized corpus: path-depth
    histogram x has-query flag (bounded domain, map-side partials) —
    the crawl-frontier shape diagnostic (deep dynamic URLs vs shallow
    content pages)."""
    from .web import add_canonical, urls_from_documents

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    urls = add_canonical(urls_from_documents(docs))

    def part(b: pa.Table) -> pa.Table:
        c = b["canon"].to_pandas()
        rest = c.str.replace(r"^https://[^/]*", "", regex=True)
        path = rest.str.replace(r"[?#].*$", "", regex=True)
        depth = path.str.count("/").astype(np.int64)
        hasq = rest.str.contains(r"\?", regex=True).astype(np.int64)
        g = pd.DataFrame({"depth": depth, "has_query": hasq, "n": 1}) \
            .groupby(["depth", "has_query"], sort=False).size() \
            .reset_index(name="n_urls")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = urls.map_batches(part, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["depth", "has_query"], sort=True)["n_urls"] \
        .sum().reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


ORACLE_SQL["web_url_stats"] = f"""
    WITH c AS ({_WEB_CANON_SQL}),
    t AS (SELECT
            length(regexp_replace(regexp_replace(
              regexp_replace(canon, '^https://[^/]*', ''),
              '[?#].*$', ''), '[^/]', '', 'g'))::BIGINT AS depth,
            (CASE WHEN regexp_matches(
               regexp_replace(canon, '^https://[^/]*', ''), '\\?')
             THEN 1 ELSE 0 END)::BIGINT AS has_query
          FROM c)
    SELECT depth, has_query, count(*)::BIGINT AS n_urls
    FROM t GROUP BY 1, 2
"""
QUERIES["web_url_stats"] = q_web_url_stats


def q_embed_drift(sf_dir):
    """Embedding drift monitor: per label, the cosine between the
    centroid of the EVEN-vec_id half and the ODD half (the production
    drift check between two corpus snapshots / embedding versions).
    Map-side (label x parity) partial sums over the bounded label
    domain, one small groupby, drift cosine as one float expression
    (round-6; sums differ ~1e-16 between engines — repo float rule)."""
    from ray.data.aggregate import Sum

    from .ann import _normalize, vec_matrix
    from .runtime import tune_context

    tune_context()
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])

    def part(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(vec_matrix(b["embedding"]))
        par = ids % 2
        key = lab * 2 + par
        uniq, inv = np.unique(key, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "key": pa.array(np.repeat(uniq, d)),
            "i": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                  len(uniq))),
            "s": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnt, d).astype(np.int64))})

    agg = emb.map_batches(part, batch_format="pyarrow") \
        .groupby(["key", "i"]) \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")) \
        .to_pandas()
    labs = sorted(set(agg["key"] // 2))
    rows = []
    for lb in labs:
        ev = agg[agg["key"] == 2 * lb].sort_values("i")
        od = agg[agg["key"] == 2 * lb + 1].sort_values("i")
        if len(ev) == 0 or len(od) == 0:
            continue
        se, so = ev["s"].to_numpy(), od["s"].to_numpy()
        ne = int(ev["n"].max())
        no = int(od["n"].max())
        cos = float(se @ so / (np.sqrt(se @ se) * np.sqrt(so @ so)))
        rows.append((lb, ne, no, round(cos, 6)))
    return pd.DataFrame({
        "label": np.array([r[0] for r in rows], np.int64),
        "n_even": np.array([r[1] for r in rows], np.int64),
        "n_odd": np.array([r[2] for r in rows], np.int64),
        "drift_cosine": [r[3] for r in rows]})


ORACLE_SQL["embed_drift"] = """
    WITH u AS (
      SELECT vec_id, label, vec_id % 2 AS par,
             CAST(generate_subscripts(CAST(embedding AS DOUBLE[]), 1)
                  AS BIGINT) - 1 AS i,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          v -> v * v))) AS nrm
      FROM embeddings),
    s AS (SELECT label, par, i,
                 sum(x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END))
                   AS s,
                 count(DISTINCT vec_id)::BIGINT AS n
          FROM u GROUP BY 1, 2, 3),
    j AS (SELECT e.label,
                 max(e.n) AS n_even, max(o.n) AS n_odd,
                 sum(e.s * o.s) AS dot,
                 sum(e.s * e.s) AS ee, sum(o.s * o.s) AS oo
          FROM s e JOIN s o ON o.label = e.label AND o.i = e.i
          WHERE e.par = 0 AND o.par = 1
          GROUP BY e.label)
    SELECT label, n_even::BIGINT AS n_even, n_odd::BIGINT AS n_odd,
           round(dot / (sqrt(ee) * sqrt(oo)), 6) AS drift_cosine
    FROM j
"""
QUERIES["embed_drift"] = q_embed_drift


def q_events_attribution_last(sf_dir):
    """Last-touch conversion attribution (windows.
    last_touch_attribution): the first conversion's value credits the
    immediately-preceding event's channel — the marketing-analytics
    twin of events_attribution, same coarse user-bucket kernel."""
    from .windows import last_touch_attribution

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    return last_touch_attribution(ev)


ORACLE_SQL["events_attribution_last"] = """
    WITH r AS (SELECT user_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    p AS (SELECT user_id, min(rn) AS prn FROM r
          WHERE event_type = 'purchase' GROUP BY 1),
    f AS (SELECT r.user_id, r.event_type AS channel
          FROM r JOIN p ON p.user_id = r.user_id
           AND r.rn = CASE WHEN p.prn > 1 THEN p.prn - 1 ELSE p.prn END),
    v AS (SELECT r.user_id,
                 CAST(floor(r.value * 100 + 0.5) AS BIGINT) AS cents
          FROM r JOIN p ON p.user_id = r.user_id AND r.rn = p.prn)
    SELECT channel, count(*)::BIGINT AS n_users,
           round(sum(v.cents) / 100.0, 6) AS total_value
    FROM f JOIN v USING (user_id)
    GROUP BY 1 ORDER BY 1
"""
QUERIES["events_attribution_last"] = q_events_attribution_last


def q_doc_local_bridges(sf_dir):
    """Local bridges (support-0 edges — the Easley-Kleinberg weak ties
    whose removal stretches the endpoint distance beyond 2): size-gated
    driver/distributed support plan shared with the SCAN family
    (algos/scan.local_bridges)."""
    from .algos.scan import local_bridges

    return local_bridges(documents_edges(sf_dir),
                         documents_n_vertices(sf_dir))


ORACLE_SQL["doc_local_bridges"] = f"""
    WITH ce AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT src, dst FROM ce
                         UNION ALL SELECT dst AS src, src AS dst
                         FROM ce)
    SELECT e.src, e.dst FROM ce e
    WHERE NOT EXISTS (
      SELECT 1 FROM sym a JOIN sym b
        ON a.dst = b.dst AND a.src = e.src AND b.src = e.dst)
"""
QUERIES["doc_local_bridges"] = q_doc_local_bridges


LEADTIME_QS = [0.5, 0.9, 0.99]


def q_tpch_leadtime(sf_dir):
    """Shipping lead-time SLA report: exact per-priority quantiles of
    (l_shipdate - o_orderdate) in days — a pruned lineitem x orders
    hash join, then the grouped order-statistics kernel
    (quantiles.grouped_quantiles; one coarse key-bucket shuffle, one
    sort per bucket).  Returns (o_orderpriority, q, days)."""
    from .dedup import _join_parts
    from .quantiles import grouped_quantiles

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def okey(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["o_orderkey"],
                         "o_orderdate": b["o_orderdate"],
                         "o_orderpriority": b["o_orderpriority"]})

    j = li.join(orders.map_batches(okey, batch_format="pyarrow"),
                join_type="inner", num_partitions=_join_parts(li.count()),
                on=("l_orderkey",))

    def days(b: pa.Table) -> pa.Table:
        s = pc.cast(b["l_shipdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        o = pc.cast(b["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = (s - o) // 86_400_000_000
        return pa.table({"o_orderpriority": b["o_orderpriority"],
                         "days": pa.array(d.astype(np.int64))})

    out = grouped_quantiles(j.map_batches(days, batch_format="pyarrow"),
                            "o_orderpriority", "days", LEADTIME_QS)
    return out.map_batches(
        lambda b: pa.table({"o_orderpriority": b["o_orderpriority"],
                            "q": b["q"],
                            "days": pc.cast(b["val"], pa.int64())}),
        batch_format="pyarrow")


ORACLE_SQL["tpch_leadtime"] = """
    WITH d AS (
      SELECT o.o_orderpriority,
             (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority, 0.5 AS q, quantile_disc(days, 0.5)::BIGINT AS days FROM d GROUP BY o_orderpriority UNION ALL SELECT o_orderpriority, 0.9 AS q, quantile_disc(days, 0.9)::BIGINT AS days FROM d GROUP BY o_orderpriority UNION ALL SELECT o_orderpriority, 0.99 AS q, quantile_disc(days, 0.99)::BIGINT AS days FROM d GROUP BY o_orderpriority
"""
QUERIES["tpch_leadtime"] = q_tpch_leadtime


TOP_SESSIONS_K = 10


def q_events_top_sessions(sf_dir):
    """Top-K longest sessions corpus-wide: the session-window operator's
    output ranked by (n_events DESC, user_id, session_id) with the
    partial-top-k pattern (per-block prune, driver cut) — no global
    sort.  Deterministic tie-break on the key pair."""
    from .windows import session_window

    s = session_window(_events(sf_dir), gap_s=1800)

    def prune(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(["n_events", "user_id", "session_id"],
                            ascending=[False, True, True],
                            kind="mergesort").head(TOP_SESSIONS_K)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = s.map_batches(prune, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["n_events", "user_id", "session_id"],
                            ascending=[False, True, True],
                            kind="mergesort").head(TOP_SESSIONS_K) \
        .reset_index(drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["rnk", "user_id", "session_id", "n_events",
                "sum_value", "session_start_us"]]


ORACLE_SQL["events_top_sessions"] = f"""
    WITH sess AS ({ORACLE_SQL["events_session"]})
    SELECT row_number() OVER (ORDER BY n_events DESC, user_id,
                              session_id) AS rnk,
           user_id, session_id, n_events::BIGINT AS n_events,
           sum_value, session_start_us
    FROM sess
    ORDER BY n_events DESC, user_id, session_id
    LIMIT {TOP_SESSIONS_K}
"""
QUERIES["events_top_sessions"] = q_events_top_sessions


def q_doc_rank_concentration(sf_dir):
    """PageRank mass concentration (the 'attention inequality' report):
    exact P99 threshold over the round-6 rank column (distributed order
    statistic — quantiles.exact_quantiles), then the share of total
    rank mass held by vertices at/above it, from map-side partials.
    Composes two oracle-checked operators; round-6 floats."""
    from .quantiles import exact_quantiles

    ranks = q_doc_pagerank(sf_dir).materialize()
    thr = float(exact_quantiles(ranks, "rank", [0.99])["val"].iloc[0])

    def part(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        top = r >= thr
        return pa.table({
            "s_all": pa.array([float(r.sum())]),
            "s_top": pa.array([float(r[top].sum())]),
            "n_top": pa.array([int(top.sum())], pa.int64()),
            "n": pa.array([len(r)], pa.int64())})

    p = ranks.map_batches(part, batch_format="pyarrow").to_pandas()
    s_all, s_top = float(p["s_all"].sum()), float(p["s_top"].sum())
    return pd.DataFrame({
        "threshold": [round(thr, 6)],
        "n_top": np.array([int(p["n_top"].sum())], np.int64),
        "n_vertices": np.array([int(p["n"].sum())], np.int64),
        "top_share": [round(s_top / s_all if s_all else 0.0, 6)]})


ORACLE_SQL["doc_rank_concentration"] = f"""
    WITH pr AS MATERIALIZED ({_pagerank_sql(PR_ITERS, 6)}),
    t AS (SELECT quantile_disc(rank, 0.99) AS thr FROM pr)
    SELECT round((SELECT thr FROM t), 6) AS threshold,
           sum(CASE WHEN rank >= (SELECT thr FROM t)
               THEN 1 ELSE 0 END)::BIGINT AS n_top,
           count(*)::BIGINT AS n_vertices,
           round(sum(CASE WHEN rank >= (SELECT thr FROM t)
                     THEN rank ELSE 0 END) / sum(rank), 6) AS top_share
    FROM pr
"""
QUERIES["doc_rank_concentration"] = q_doc_rank_concentration


def q_text_hapax(sf_dir):
    """Vocabulary-tail diagnostic: hapax legomena (corpus frequency 1)
    and dis legomena (frequency 2) rates over the distinct vocabulary —
    the OOV-pressure signal tokenizer training watches.  Same combiner
    shape as text_zipf (map-side value_counts partials, one
    distinct-token groupby), then bounded per-block (freq-class)
    partials instead of a top-k."""
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]),
                                                      r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = _arr(toks.value_counts())
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("n")

    def cls(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_types": pa.array([len(n)], pa.int64()),
            "n_tokens": pa.array([int(n.sum())], pa.int64()),
            "hapax": pa.array([int((n == 1).sum())], pa.int64()),
            "dis": pa.array([int((n == 2).sum())], pa.int64())})

    p = counts.map_batches(cls, batch_format="pyarrow").to_pandas()
    nt, tok = int(p["n_types"].sum()), int(p["n_tokens"].sum())
    h, d2 = int(p["hapax"].sum()), int(p["dis"].sum())
    return pd.DataFrame({
        "n_types": np.array([nt], np.int64),
        "n_tokens": np.array([tok], np.int64),
        "n_hapax": np.array([h], np.int64),
        "n_dis": np.array([d2], np.int64),
        "hapax_rate": [round(h / nt if nt else 0.0, 6)]})


ORACLE_SQL["text_hapax"] = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS token
      FROM documents),
    c AS (SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY token)
    SELECT count(*)::BIGINT AS n_types,
           sum(n)::BIGINT AS n_tokens,
           sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
           sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis,
           round(CASE WHEN count(*) > 0 THEN
                 sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) ELSE 0.0 END, 6) AS hapax_rate
    FROM c
"""
QUERIES["text_hapax"] = q_text_hapax


BURST_PER_MIN = 1


def q_events_bursts(sf_dir):
    """Abuse/bot screen: per user, the maximum events inside any single
    epoch-minute and a burst flag (> {k}/min) — one coarse user-bucket
    shuffle with a vectorized (user, minute) count kernel (the
    running_user_totals shape); only flagged users are emitted.""" \
        .format(k=BURST_PER_MIN)
    from .algos.triangles import n_buckets_for

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"]).materialize()
    nb = n_buckets_for(ev.count())

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mins = (pc.cast(b["ts"], pa.int64())
                .to_numpy(zero_copy_only=False) // 60_000_000)
        return pa.table({"u": pa.array(u),
                         "minute": pa.array(mins.astype(np.int64)),
                         "kb": pa.array((u % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["u", "minute"], sort=False).size() \
            .reset_index(name="n")
        mx = c.groupby("u", sort=False)["n"].max().reset_index()
        mx = mx[mx["n"] > BURST_PER_MIN]
        return pd.DataFrame({"user_id": mx["u"].astype(np.int64),
                             "max_per_min": mx["n"].astype(np.int64)})

    return ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("kb").map_groups(kern, batch_format="pandas")


ORACLE_SQL["events_bursts"] = f"""
    WITH m AS (
      SELECT user_id, epoch_us(ts) // 60000000 AS minute,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2),
    mx AS (SELECT user_id, max(n)::BIGINT AS max_per_min
           FROM m GROUP BY user_id)
    SELECT user_id, max_per_min FROM mx
    WHERE max_per_min > {BURST_PER_MIN}
"""
QUERIES["events_bursts"] = q_events_bursts


def q_doc_sparsify_cc(sf_dir):
    """Sparsifier quality check: connected-component counts BEFORE vs
    AFTER the 1/min-degree edge sampling (doc_sparsify's keep rule) —
    the connectivity-preservation contract a spanner is judged on.
    Both CC runs use the superstep engine (the AFTER store builds on
    the kept edge Dataset); counts resolve through the coarse
    label-bucket distinct kernel."""
    from .algos import connected_components
    from .algos.fiedler import largest_component_label
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .algos.wl import mix64
    from .edges import degree_table, symmetrize
    from .graph import load_undirected
    from .joins import attach_by_key

    n = documents_n_vertices(sf_dir)

    def n_components(eng) -> int:
        ds = eng.state_dataset(["label"])
        nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

        def part(b: pa.Table) -> pa.Table:
            lab = b["label"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            u = np.unique(lab)
            return pa.table({"bucket": pa.array(u % nb),
                             "lab": pa.array(u)})

        def kern(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": [int(g["lab"].nunique())]})

        p = ds.map_batches(part, batch_format="pyarrow") \
            .groupby("bucket").map_groups(kern, batch_format="pandas") \
            .to_pandas()
        return int(p["n"].sum())

    eng = documents_engine(sf_dir, "undirected")
    connected_components(eng)
    before = n_components(eng)

    edges = documents_edges(sf_dir)
    deg = degree_table(symmetrize(edges), "src")
    tagged = attach_by_key(edges, deg, ["src", "dst"], "v", "degree")

    def keep(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = mix64(s * np.uint64(4294967296) + t)
        md = np.minimum(
            b["degree_src"].to_numpy(zero_copy_only=False),
            b["degree_dst"].to_numpy(zero_copy_only=False)) \
            .astype(np.uint64)
        k = (z % np.maximum(md, np.uint64(1))) == 0
        return pa.table({"src": pa.array(s[k].astype(np.int64)),
                         "dst": pa.array(t[k].astype(np.int64))})

    kept = tagged.map_batches(keep, batch_format="pyarrow") \
        .materialize()
    eng2 = load_undirected(kept, n, 4,
                           _store_root(sf_dir, "sparse_cc"),
                           fingerprint=_input_fingerprint(sf_dir))
    try:
        connected_components(eng2)
        after = n_components(eng2)
    finally:
        eng2.shutdown()
    return pd.DataFrame({
        "n_cc_before": np.array([before], np.int64),
        "n_cc_after": np.array([after], np.int64),
        "delta": np.array([after - before], np.int64)})


def _sparsify_cc_sql(cc_rounds: int) -> str:
    """Two unrolled min-label CC chains: the full symmetric graph and
    the sparsified one (the doc_sparsify kept CTE)."""
    kept = f"""
        WITH e AS MATERIALIZED ({DOC_EDGES_SQL}),
        symd AS (SELECT src, dst FROM e UNION ALL SELECT dst, src
                 FROM e),
        deg AS MATERIALIZED (
          SELECT src AS v, count(*)::BIGINT AS d FROM symd
          GROUP BY src),
        z0 AS (SELECT e.src, e.dst,
                      ((e.src::HUGEINT * 4294967296 + e.dst::HUGEINT)
                       % {_W64})::UBIGINT AS z,
                      least(ds.d, dd.d) AS md
               FROM e JOIN deg ds ON ds.v = e.src
                      JOIN deg dd ON dd.v = e.dst),
        z1 AS (SELECT src, dst, xor(z, z >> 33) AS z, md FROM z0),
        z2 AS (SELECT src, dst,
               {_mulmod64_sql('z', 0xFF51AFD7ED558CCD)}::UBIGINT AS z,
               md FROM z1),
        z3 AS (SELECT src, dst, xor(z, z >> 29) AS z, md FROM z2),
        z4 AS (SELECT src, dst,
               {_mulmod64_sql('z', 0xC4CEB9FE1A85EC53)}::UBIGINT AS z,
               md FROM z3),
        pri AS (SELECT src, dst, xor(z, z >> 32) AS z, md FROM z4)
        SELECT src, dst FROM pri
        WHERE z % greatest(md, 1)::UBIGINT = 0"""

    def chain(tag: str, sym_body: str) -> list:
        ctes = [f"{tag}sym AS MATERIALIZED ({sym_body})",
                f"{tag}l0 AS (SELECT v, v AS lab FROM allv)"]
        for i in range(1, cc_rounds + 1):
            p = f"{tag}l{i - 1}"
            ctes.append(
                f"{tag}l{i} AS MATERIALIZED (SELECT allv.v, "
                f"least({p}.lab, coalesce(m.lab, {p}.lab)) AS lab "
                f"FROM allv JOIN {p} USING (v) LEFT JOIN "
                f"(SELECT {tag}sym.dst AS v, min({p}.lab) AS lab "
                f"FROM {tag}sym JOIN {p} ON {p}.v = {tag}sym.src "
                f"GROUP BY {tag}sym.dst) m USING (v))")
        return ctes

    ctes = ["allv AS MATERIALIZED (SELECT doc_id AS v FROM documents)",
            f"ke AS MATERIALIZED ({kept})"]
    ctes += chain("b", DOC_SYM_SQL)
    ctes += chain("a", "SELECT src, dst FROM ke "
                       "UNION ALL SELECT dst, src FROM ke")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT (SELECT count(DISTINCT lab) FROM bl{cc_rounds})"
            f"::BIGINT AS n_cc_before, "
            f"(SELECT count(DISTINCT lab) FROM al{cc_rounds})"
            f"::BIGINT AS n_cc_after, "
            f"((SELECT count(DISTINCT lab) FROM al{cc_rounds}) - "
            f"(SELECT count(DISTINCT lab) FROM bl{cc_rounds}))"
            f"::BIGINT AS delta")


ORACLE_SQL["doc_sparsify_cc"] = _sparsify_cc_sql(CC_ROUNDS)
QUERIES["doc_sparsify_cc"] = q_doc_sparsify_cc


def q_web_domain_mirrors(sf_dir):
    """Per-domain mirror rate: how many of a domain's docs are
    canonical-URL duplicates of a smaller doc id (the crawl-dedup
    pressure signal per site).  One coarse canon-bucket kernel emitting
    bounded (domain, n_docs, n_mirrored) partials."""
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .web import canonicalize, domain_of, urls_from_batch

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id"])
    n = docs.count()
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def bucketize(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canonicalize(urls_from_batch(d))
        h = pd.util.hash_array(canon.to_numpy(dtype=object))
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64)),
            "canon": pa.array(canon, pa.string()),
            "doc_id": pa.array(d)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("canon", sort=False)["doc_id"] \
            .transform("min")
        dom = domain_of(g["canon"])
        df = pd.DataFrame({
            "domain": dom,
            "n_docs": 1,
            "n_mirrored": (g["doc_id"].to_numpy()
                           != keep.to_numpy()).astype(np.int64)})
        out = df.groupby("domain", sort=False).sum().reset_index()
        return out

    parts = docs.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("domain")[["n_docs", "n_mirrored"]].sum() \
        .reset_index()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_mirrored"] = out["n_mirrored"].astype(np.int64)
    return out


ORACLE_SQL["web_domain_mirrors"] = f"""
    WITH c AS ({_WEB_CANON_SQL}),
    k AS (SELECT doc_id, canon,
                 min(doc_id) OVER (PARTITION BY canon) AS keep_id
          FROM c)
    SELECT regexp_extract(canon, '^https://(?:www\\.)?([^/:?#]+)', 1)
             AS domain,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)::BIGINT
             AS n_mirrored
    FROM k GROUP BY 1
"""
QUERIES["web_domain_mirrors"] = q_web_domain_mirrors


def q_tpch_order_lines_hist(sf_dir):
    """Lines-per-order histogram (the fact-table fanout profile): one
    coarse orderkey-bucket kernel counts each order's lines, bounded
    line-count histogram partials fold on the driver — the per-key
    count never becomes a fine-key Ray aggregate."""
    from .algos.triangles import n_buckets_for

    li = read_parquet_clean(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_orderkey"]).materialize()
    nb = n_buckets_for(li.count())

    def tag(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k),
                         "kb": pa.array((k % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("k", sort=False).size()
        h = c.value_counts()
        return pd.DataFrame({"n_lines": h.index.to_numpy(np.int64),
                             "n_orders": h.to_numpy(np.int64)})

    parts = li.map_batches(tag, batch_format="pyarrow") \
        .groupby("kb").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("n_lines")["n_orders"].sum().reset_index()
    out["n_lines"] = out["n_lines"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


ORACLE_SQL["tpch_order_lines_hist"] = """
    WITH c AS (SELECT l_orderkey, count(*)::BIGINT AS n_lines
               FROM lineitem GROUP BY l_orderkey)
    SELECT n_lines, count(*)::BIGINT AS n_orders
    FROM c GROUP BY n_lines
"""
QUERIES["tpch_order_lines_hist"] = q_tpch_order_lines_hist


def q_doc_coreness_hist(sf_dir):
    """k-core size curve: vertex counts per coreness value (bounded
    domain — coreness <= max degree); composes the oracle-checked
    coreness engine state with map-side bincount partials."""
    from .algos import coreness

    eng = documents_engine(sf_dir, "undirected")
    coreness(eng)

    def part(b: pa.Table) -> pa.Table:
        c = b["core"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(c)
        nz = np.flatnonzero(cnt)
        return pa.table({"coreness": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    p = eng.state_dataset(["core"]).map_batches(
        part, batch_format="pyarrow").to_pandas()
    out = p.groupby("coreness")["n"].sum().reset_index()
    out["coreness"] = out["coreness"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


ORACLE_SQL["doc_coreness_hist"] = f"""
    WITH cw AS ({ORACLE_SQL["doc_coreness"]})
    SELECT core::BIGINT AS coreness, count(*)::BIGINT AS n
    FROM cw GROUP BY 1
"""
QUERIES["doc_coreness_hist"] = q_doc_coreness_hist


def q_events_weekend_ttest(sf_dir):
    """Weekend-vs-weekday revenue Welch t-test over the daily series:
    per-day exact-cents partials (calendar-bounded), the two day
    classes' (n, sum, sumsq) fold on the driver, ONE identical float
    expression tree for the t statistic (round-6)."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        s = pd.Series(cents).groupby(day).sum()
        return pa.table({"day": pa.array(s.index.to_numpy(np.int64)),
                         "cents": pa.array(s.to_numpy(np.int64))})

    parts = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    d = parts.groupby("day")["cents"].sum().reset_index()
    dow = (d["day"].to_numpy(np.int64) + 4) % 7
    wk = dow >= 5
    out = []
    for name, m in (("weekend", wk), ("weekday", ~wk)):
        x = d["cents"].to_numpy(np.int64)[m]
        out.append((len(x), int(x.sum()), int((x * x).sum())))
    (n1, s1, ss1), (n2, s2, ss2) = out
    m1, m2 = s1 / n1, s2 / n2
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = (m1 - m2) / np.sqrt(v1 / n1 + v2 / n2)
    return pd.DataFrame({
        "n_weekend_days": np.array([n1], np.int64),
        "n_weekday_days": np.array([n2], np.int64),
        "mean_weekend": [round(m1, 6)], "mean_weekday": [round(m2, 6)],
        "t_stat": [round(float(t), 6)]})


ORACLE_SQL["events_weekend_ttest"] = """
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             sum((floor(value * 100.0 + 0.5))::BIGINT)::BIGINT AS cents
      FROM events GROUP BY 1),
    c AS (SELECT day, cents,
                 ((day + 4) % 7 >= 5) AS wk FROM d),
    g AS (SELECT wk, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
                 sum(cents * cents)::BIGINT AS ss
          FROM c GROUP BY wk)
    SELECT we.n AS n_weekend_days, wd.n AS n_weekday_days,
           round(we.s::DOUBLE / we.n, 6) AS mean_weekend,
           round(wd.s::DOUBLE / wd.n, 6) AS mean_weekday,
           round((we.s::DOUBLE / we.n - wd.s::DOUBLE / wd.n)
                 / sqrt((we.ss - we.s::DOUBLE * we.s / we.n)
                        / (we.n - 1) / we.n
                      + (wd.ss - wd.s::DOUBLE * wd.s / wd.n)
                        / (wd.n - 1) / wd.n), 6) AS t_stat
    FROM (SELECT * FROM g WHERE wk) we,
         (SELECT * FROM g WHERE NOT wk) wd
"""
QUERIES["events_weekend_ttest"] = q_events_weekend_ttest


def q_doc_triangle_participation(sf_dir):
    """Triangle participation: how many vertices sit in at least one
    triangle (a vertex does iff some incident edge has support > 0).
    One pass over the shared SCAN support base emitting distinct
    endpoint partials into coarse vertex buckets, exact distinct fold."""
    from .algos.scan import edge_support_deg_ds
    from .algos.triangles import TARGET_ROWS_PER_BUCKET

    edges = documents_edges(sf_dir)
    n_edges = edges.count()
    n = documents_n_vertices(sf_dir)
    base = edge_support_deg_ds(edges, n_edges, 8)
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def part(b: pa.Table) -> pa.Table:
        supp = b["supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = supp > 0
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)[z]
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)[z]
        u = np.unique(np.concatenate([s, d]))
        return pa.table({"bucket": pa.array(u % nb),
                         "v": pa.array(u)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g["v"].nunique())]})

    p = base.map_batches(part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    in_tri = int(p["n"].sum()) if len(p) else 0
    return pd.DataFrame({
        "n_vertices": np.array([n], np.int64),
        "n_in_triangle": np.array([in_tri], np.int64),
        "participation": [round(in_tri / n if n else 0.0, 6)]})


ORACLE_SQL["doc_triangle_participation"] = f"""
    WITH ce AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT src, dst FROM ce
                         UNION ALL SELECT dst, src FROM ce),
    supp AS (SELECT e.src, e.dst, count(*) AS s
             FROM ce e JOIN sym a ON a.src = e.src
                       JOIN sym b ON b.src = e.dst AND b.dst = a.dst
             GROUP BY e.src, e.dst),
    tv AS (SELECT DISTINCT v FROM (
             SELECT src AS v FROM supp WHERE s > 0
             UNION ALL SELECT dst AS v FROM supp WHERE s > 0))
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_vertices,
           (SELECT count(*) FROM tv)::BIGINT AS n_in_triangle,
           round((SELECT count(*) FROM tv)::DOUBLE
                 / (SELECT count(*) FROM documents), 6)
             AS participation
"""
QUERIES["doc_triangle_participation"] = q_doc_triangle_participation


def q_events_rfm(sf_dir):
    """RFM segmentation histogram: per user, Recency (days since last
    event vs corpus max day), Frequency (events) and Monetary (exact
    cents) scored into terciles by the EXACT corpus-wide 1/3, 2/3
    order statistics (low < t1 <= mid < t2 <= high on integers), then
    (r, f, m) segment counts over the bounded 27-cell domain.  Per-user
    aggregates come from one coarse user-bucket kernel; thresholds via
    quantiles.exact_quantiles; scoring is a second stateless pass."""
    from .algos.triangles import n_buckets_for
    from .io import from_pandas_clean
    from .quantiles import exact_quantiles

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"]) \
        .materialize()
    nb = n_buckets_for(ev.count())

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        return pa.table({"u": pa.array(u), "us": pa.array(us),
                         "cents": pa.array(cents),
                         "kb": pa.array((u % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("u", sort=False).agg(
            last_us=("us", "max"), f=("us", "size"),
            m=("cents", "sum")).reset_index()
        for c in ("last_us", "f", "m"):
            a[c] = a[c].astype(np.int64)
        return a

    per_user = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("kb").map_groups(kern, batch_format="pandas") \
        .materialize()
    max_day = int(per_user.max("last_us")) // 86_400_000_000

    def rec(b: pa.Table) -> pa.Table:
        last = b["last_us"].to_numpy(zero_copy_only=False)
        r = max_day - last // 86_400_000_000
        return pa.table({"u": b["u"], "r": pa.array(r.astype(np.int64)),
                         "f": b["f"], "m": b["m"]})

    rfm = per_user.map_batches(rec, batch_format="pyarrow") \
        .materialize()
    thr = {}
    for c in ("r", "f", "m"):
        q = exact_quantiles(rfm, c, [1.0 / 3.0, 2.0 / 3.0])
        thr[c] = (int(q["val"].iloc[0]), int(q["val"].iloc[1]))

    def score(b: pa.Table) -> pa.Table:
        out = {}
        for c in ("r", "f", "m"):
            x = b[c].to_numpy(zero_copy_only=False)
            t1, t2 = thr[c]
            out[c] = np.where(x < t1, 0, np.where(x < t2, 1, 2)) \
                .astype(np.int64)
        cell = out["r"] * 9 + out["f"] * 3 + out["m"]
        cnt = np.bincount(cell, minlength=27)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    p = rfm.map_batches(score, batch_format="pyarrow").to_pandas()
    h = p.groupby("cell")["n"].sum().reset_index()
    return pd.DataFrame({
        "r_seg": (h["cell"] // 9).astype(np.int64),
        "f_seg": ((h["cell"] // 3) % 3).astype(np.int64),
        "m_seg": (h["cell"] % 3).astype(np.int64),
        "n_users": h["n"].astype(np.int64)})


ORACLE_SQL["events_rfm"] = """
    WITH pu AS (
      SELECT user_id, max(epoch_us(ts))::BIGINT AS last_us,
             count(*)::BIGINT AS f,
             sum((floor(value * 100.0 + 0.5))::BIGINT)::BIGINT AS m
      FROM events GROUP BY user_id),
    mx AS (SELECT max(last_us) // 86400000000 AS max_day FROM pu),
    rfm AS (SELECT user_id,
                   ((SELECT max_day FROM mx)
                    - last_us // 86400000000)::BIGINT AS r, f, m
            FROM pu),
    t AS (SELECT
            quantile_disc(r, 1.0/3.0) AS r1,
            quantile_disc(r, 2.0/3.0) AS r2,
            quantile_disc(f, 1.0/3.0) AS f1,
            quantile_disc(f, 2.0/3.0) AS f2,
            quantile_disc(m, 1.0/3.0) AS m1,
            quantile_disc(m, 2.0/3.0) AS m2
          FROM rfm),
    s AS (SELECT
            (CASE WHEN r < (SELECT r1 FROM t) THEN 0
                  WHEN r < (SELECT r2 FROM t) THEN 1 ELSE 2 END)
              AS r_seg,
            (CASE WHEN f < (SELECT f1 FROM t) THEN 0
                  WHEN f < (SELECT f2 FROM t) THEN 1 ELSE 2 END)
              AS f_seg,
            (CASE WHEN m < (SELECT m1 FROM t) THEN 0
                  WHEN m < (SELECT m2 FROM t) THEN 1 ELSE 2 END)
              AS m_seg
          FROM rfm)
    SELECT r_seg::BIGINT AS r_seg, f_seg::BIGINT AS f_seg,
           m_seg::BIGINT AS m_seg, count(*)::BIGINT AS n_users
    FROM s GROUP BY 1, 2, 3
"""
QUERIES["events_rfm"] = q_events_rfm


VOCAB_COVER_K = 100


def q_text_vocab_coverage(sf_dir):
    """Tokenizer-fit metric: the fraction of corpus token OCCURRENCES
    covered by the top-K vocabulary (K = {k}; ties n DESC, token ASC).
    Counting is the heavy-hitter combiner shape; the chosen vocabulary
    broadcasts for a second stateless coverage pass.""" \
        .format(k=VOCAB_COVER_K)
    import ray

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]),
                                                      r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = _arr(toks.value_counts())
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").sum("n").materialize()

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(VOCAB_COVER_K)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    top = counts.map_batches(local_top, batch_format="pyarrow") \
        .to_pandas().sort_values(["n", "token"],
                                 ascending=[False, True],
                                 kind="mergesort").head(VOCAB_COVER_K)
    vocab = frozenset(top["token"])
    vref = ray.put(vocab)

    def cover(b: pa.Table) -> pa.Table:
        v = ray.get(vref)
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        inv = pdf["token"].isin(v)
        return pa.table({
            "cov": pa.array([int(pdf.loc[inv, "n"].sum())], pa.int64()),
            "tot": pa.array([int(pdf["n"].sum())], pa.int64())})

    p = counts.map_batches(cover, batch_format="pyarrow").to_pandas()
    cov, tot = int(p["cov"].sum()), int(p["tot"].sum())
    return pd.DataFrame({
        "vocab_k": np.array([VOCAB_COVER_K], np.int64),
        "covered": np.array([cov], np.int64),
        "total": np.array([tot], np.int64),
        "coverage": [round(cov / tot if tot else 0.0, 6)]})


ORACLE_SQL["text_vocab_coverage"] = f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS token
      FROM documents),
    c AS (SELECT token, count(*)::BIGINT AS n FROM toks GROUP BY token),
    top AS (SELECT token FROM c
            ORDER BY n DESC, token ASC LIMIT {VOCAB_COVER_K})
    SELECT {VOCAB_COVER_K}::BIGINT AS vocab_k,
           sum(CASE WHEN token IN (SELECT token FROM top)
               THEN n ELSE 0 END)::BIGINT AS covered,
           sum(n)::BIGINT AS total,
           round(sum(CASE WHEN token IN (SELECT token FROM top)
                     THEN n ELSE 0 END)::DOUBLE / sum(n), 6)
             AS coverage
    FROM c
"""
QUERIES["text_vocab_coverage"] = q_text_vocab_coverage


def q_embed_separability(sf_dir):
    """Class-separability report (the Fisher-style embedding-quality
    check): S_w = mean cosine distance of each vector to ITS label
    centroid, S_b = mean pairwise cosine distance between label
    centroids, ratio = S_b / S_w.  Two passes: (label, dim) centroid
    partial sums over the bounded label domain, then broadcast
    centroids + per-vector distance partials.  Round-6 floats (sums
    differ ~1e-16 between engines)."""
    import ray

    from .ann import _normalize, vec_matrix
    from .runtime import tune_context

    tune_context()
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])

    def cpart(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(vec_matrix(b["embedding"]))
        uniq, inv = np.unique(lab, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, inv, m)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "i": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                  len(uniq))),
            "s": pa.array(sums.reshape(-1))})

    cp = emb.map_batches(cpart, batch_format="pyarrow").to_pandas()
    g = cp.groupby(["label", "i"])["s"].sum().reset_index()
    labels = np.sort(g["label"].unique())
    d = int(g["i"].max()) + 1
    cent = np.zeros((len(labels), d))
    pos = {int(l): i for i, l in enumerate(labels)}
    for _, row in g.iterrows():
        cent[pos[int(row["label"])], int(row["i"])] = row["s"]
    cent = _normalize(cent)
    cref = ray.put((cent, labels))

    def wpart(b: pa.Table) -> pa.Table:
        c, labs = ray.get(cref)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(vec_matrix(b["embedding"]))
        idx = np.searchsorted(labs, lab)
        cos = np.einsum("ij,ij->i", m, c[idx])
        return pa.table({
            "sw": pa.array([float((1.0 - cos).sum())]),
            "n": pa.array([len(lab)], pa.int64())})

    p = emb.map_batches(wpart, batch_format="pyarrow").to_pandas()
    sw = float(p["sw"].sum()) / max(int(p["n"].sum()), 1)
    sims = cent @ cent.T
    iu = np.triu_indices(len(labels), 1)
    sb = float((1.0 - sims[iu]).mean()) if len(iu[0]) else 0.0
    return pd.DataFrame({
        "n_labels": np.array([len(labels)], np.int64),
        "s_within": [round(sw, 6)],
        "s_between": [round(sb, 6)],
        "separability": [round(sb / sw if sw else 0.0, 6)]})


ORACLE_SQL["embed_separability"] = """
    WITH u AS (
      SELECT vec_id, label,
             CAST(generate_subscripts(CAST(embedding AS DOUBLE[]), 1)
                  AS BIGINT) - 1 AS i,
             unnest(CAST(embedding AS DOUBLE[])) AS x,
             sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          v -> v * v))) AS nrm
      FROM embeddings),
    nv AS (SELECT vec_id, label, i,
                  x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END) AS x
           FROM u),
    cs AS (SELECT label, i, sum(x) AS s FROM nv GROUP BY label, i),
    cn AS (SELECT label, sqrt(sum(s * s)) AS nn FROM cs GROUP BY label),
    c AS (SELECT cs.label, cs.i,
                 cs.s / (CASE WHEN cn.nn = 0 THEN 1.0 ELSE cn.nn END)
                   AS y
          FROM cs JOIN cn USING (label)),
    w AS (SELECT nv.vec_id,
                 1.0 - sum(nv.x * c.y) AS dist
          FROM nv JOIN c ON c.label = nv.label AND c.i = nv.i
          GROUP BY nv.vec_id),
    sw AS (SELECT sum(dist) / count(*) AS v FROM w),
    pair AS (SELECT a.label AS la, b.label AS lb,
                    1.0 - sum(a.y * b.y) AS dist
             FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
             GROUP BY a.label, b.label),
    sb AS (SELECT avg(dist) AS v FROM pair)
    SELECT (SELECT count(DISTINCT label) FROM embeddings)::BIGINT
             AS n_labels,
           round((SELECT v FROM sw), 6) AS s_within,
           round((SELECT v FROM sb), 6) AS s_between,
           round((SELECT v FROM sb) / (SELECT v FROM sw), 6)
             AS separability
"""
QUERIES["embed_separability"] = q_embed_separability


def q_tpch_price_size_fit(sf_dir):
    """Closed-form OLS of p_retailprice on p_size over the part table
    (pricing-model sanity fit): one pruned scan emitting the five
    moment partials, the normal-equation expressions on the driver —
    the powerlaw-fit shape on relational data.  Round-6 floats."""
    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_size", "p_retailprice"])

    def moments(b: pa.Table) -> pa.Table:
        x = b["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = b["p_retailprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "sxy": pa.array([float((x * y).sum())])})

    p = part.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxx, sxy = float(p["sxx"].sum()), float(p["sxy"].sum())
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den else 0.0
    intercept = (sy - slope * sx) / n if n else 0.0
    return pd.DataFrame({"n_parts": np.array([n], np.int64),
                         "slope": [round(slope, 6)],
                         "intercept": [round(intercept, 6)]})


ORACLE_SQL["tpch_price_size_fit"] = """
    WITH m AS (SELECT count(*)::BIGINT AS n,
                      sum(p_size::DOUBLE) AS sx,
                      sum(p_retailprice) AS sy,
                      sum(p_size::DOUBLE * p_size) AS sxx,
                      sum(p_size::DOUBLE * p_retailprice) AS sxy
               FROM part)
    SELECT n AS n_parts,
           round(CASE WHEN n * sxx - sx * sx <> 0
                 THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 ELSE 0.0 END, 6) AS slope,
           round(CASE WHEN n > 0 THEN
                 (sy - (CASE WHEN n * sxx - sx * sx <> 0
                        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                        ELSE 0.0 END) * sx) / n
                 ELSE 0.0 END, 6) AS intercept
    FROM m
"""
QUERIES["tpch_price_size_fit"] = q_tpch_price_size_fit


def q_events_benford(sf_dir):
    """Benford's-law data-quality screen on transaction values: first
    significant digit of the exact integer cents, observed counts per
    digit (bounded 9-bin partials) vs the Benford expectation
    n * log10(1 + 1/d), plus the chi-square statistic — one identical
    float expression from folded integers."""
    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["value"])

    def part(b: pa.Table) -> pa.Table:
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 100.0 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        # first significant digit via repeated /10 (exact integers)
        x = cents.copy()
        while (x >= 10).any():
            x = np.where(x >= 10, x // 10, x)
        cnt = np.bincount(x, minlength=10)[1:]
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64))})

    p = ev.map_batches(part, batch_format="pyarrow").to_pandas()
    g = p.groupby("digit")["n"].sum()
    obs = np.array([int(g.get(d, 0)) for d in range(1, 10)], np.int64)
    n = int(obs.sum())
    exp = n * np.log10(1.0 + 1.0 / np.arange(1, 10))
    chi2 = float(((obs - exp) ** 2 / exp).sum()) if n else 0.0
    return pd.DataFrame({
        "digit": np.arange(1, 10, dtype=np.int64),
        "n_obs": obs,
        "n_exp": np.round(exp, 6),
        "chi2": [round(chi2, 6)] * 9})


ORACLE_SQL["events_benford"] = """
    WITH c AS (
      SELECT (floor(value * 100.0 + 0.5))::BIGINT AS cents
      FROM events),
    d AS (SELECT substr(cents::VARCHAR, 1, 1)::BIGINT AS digit
          FROM c WHERE cents > 0),
    o AS (SELECT gd.digit, count(d.digit)::BIGINT AS n_obs
          FROM (SELECT unnest(range(1, 10)) AS digit) gd
          LEFT JOIN d ON d.digit = gd.digit
          GROUP BY gd.digit),
    t AS (SELECT sum(n_obs)::DOUBLE AS n FROM o),
    e AS (SELECT digit, n_obs,
                 (SELECT n FROM t) * log10(1.0 + 1.0 / digit) AS n_exp
          FROM o),
    x AS (SELECT sum((n_obs - n_exp) * (n_obs - n_exp) / n_exp) AS chi2
          FROM e)
    SELECT digit, n_obs, round(n_exp, 6) AS n_exp,
           round((SELECT chi2 FROM x), 6) AS chi2
    FROM e
"""
QUERIES["events_benford"] = q_events_benford


def q_doc_community_sizes(sf_dir):
    """Community size distribution from label propagation:
    (community_size, n_communities) — the LP labels resolve through one
    coarse label-bucket kernel (labels co-locate, so per-bucket sizes
    are exact), bounded size-histogram fold."""
    from .algos import label_propagation
    from .algos.triangles import TARGET_ROWS_PER_BUCKET

    eng = documents_engine(sf_dir, "undirected")
    label_propagation(eng, max_iters=LP_ROUNDS)
    n = documents_n_vertices(sf_dir)
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def part(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bucket": pa.array(lab % nb),
                         "lab": pa.array(lab)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("lab", sort=False).size()
        h = sizes.value_counts()
        return pd.DataFrame({
            "community_size": h.index.to_numpy(np.int64),
            "n_communities": h.to_numpy(np.int64)})

    p = eng.state_dataset(["label"]).map_batches(
        part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = p.groupby("community_size")["n_communities"].sum() \
        .reset_index()
    out["community_size"] = out["community_size"].astype(np.int64)
    out["n_communities"] = out["n_communities"].astype(np.int64)
    return out


ORACLE_SQL["doc_community_sizes"] = f"""
    WITH lp AS ({_lp_sql(LP_ROUNDS)}),
    sizes AS (SELECT label, count(*)::BIGINT AS s FROM lp
              GROUP BY label)
    SELECT s AS community_size, count(*)::BIGINT AS n_communities
    FROM sizes GROUP BY s
"""
QUERIES["doc_community_sizes"] = q_doc_community_sizes


def q_events_value_concentration(sf_dir):
    """Revenue concentration: the share of total revenue carried by
    transactions at/above the exact P99 value (order statistic over
    integer cents — quantiles.exact_quantiles), from map-side integer
    partials; one float division at the end."""
    from .quantiles import exact_quantiles

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["value"])

    def cents_b(b: pa.Table) -> pa.Table:
        c = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(c)})

    cds = ev.map_batches(cents_b, batch_format="pyarrow").materialize()
    thr = int(exact_quantiles(cds, "cents", [0.99])["val"].iloc[0])

    def part(b: pa.Table) -> pa.Table:
        c = b["cents"].to_numpy(zero_copy_only=False)
        top = c >= thr
        return pa.table({
            "s_all": pa.array([int(c.sum())], pa.int64()),
            "s_top": pa.array([int(c[top].sum())], pa.int64()),
            "n_top": pa.array([int(top.sum())], pa.int64()),
            "n": pa.array([len(c)], pa.int64())})

    p = cds.map_batches(part, batch_format="pyarrow").to_pandas()
    s_all, s_top = int(p["s_all"].sum()), int(p["s_top"].sum())
    return pd.DataFrame({
        "threshold_cents": np.array([thr], np.int64),
        "n_top": np.array([int(p["n_top"].sum())], np.int64),
        "n_events": np.array([int(p["n"].sum())], np.int64),
        "top_share": [round(s_top / s_all if s_all else 0.0, 6)]})


ORACLE_SQL["events_value_concentration"] = """
    WITH c AS (SELECT (floor(value * 100.0 + 0.5))::BIGINT AS cents
               FROM events),
    t AS (SELECT quantile_disc(cents, 0.99) AS thr FROM c)
    SELECT (SELECT thr FROM t)::BIGINT AS threshold_cents,
           sum(CASE WHEN cents >= (SELECT thr FROM t)
               THEN 1 ELSE 0 END)::BIGINT AS n_top,
           count(*)::BIGINT AS n_events,
           round(sum(CASE WHEN cents >= (SELECT thr FROM t)
                     THEN cents ELSE 0 END)::DOUBLE / sum(cents), 6)
             AS top_share
    FROM c
"""
QUERIES["events_value_concentration"] = q_events_value_concentration


def q_sketch_hll_error(sf_dir):
    """Sketch-accuracy report: the HLL distinct-token estimate next to
    the EXACT distinct count (the distinct-token combiner) and the
    relative error — the calibration check a sketch rollout ships with.
    Composes two oracle-checked operators; the exact count uses
    per-batch value_counts partials + one distinct-token groupby, never
    a driver-side set."""
    hll = q_sketch_hll(sf_dir)
    if hasattr(hll, "to_pandas"):
        hll = hll.to_pandas()
    est = float(hll["estimate"].iloc[0])

    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern_regex(_arr(b["text"]),
                                                      r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        u = pc.unique(toks)
        return pa.table({"token": u})

    exact = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").count().count()
    return pd.DataFrame({
        "exact": np.array([int(exact)], np.int64),
        "estimate": [round(est, 6)],
        "rel_err": [round((est - exact) / exact if exact else 0.0, 6)]})


ORACLE_SQL["sketch_hll_error"] = f"""
    WITH h AS ({ORACLE_SQL["sketch_hll"]}),
    ex AS (SELECT count(DISTINCT token)::BIGINT AS exact FROM (
             SELECT unnest(list_filter(string_split_regex(text,
                    '\\s+'), x -> x <> '')) AS token
             FROM documents))
    SELECT (SELECT exact FROM ex) AS exact,
           round((SELECT estimate FROM h), 6) AS estimate,
           round(((SELECT estimate FROM h) - (SELECT exact FROM ex))
                 / (SELECT exact FROM ex), 6) AS rel_err
"""
QUERIES["sketch_hll_error"] = q_sketch_hll_error


def q_dedup_substr_rate(sf_dir):
    """Corpus substring-duplication exposure: the fraction of documents
    that share at least one sampled 30-char window with another doc —
    composes the collision-proof substring pair operator; involved ids
    fold through a coarse bucket distinct (pair output is already
    small, but the rate must count DISTINCT docs)."""
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .io import from_pandas_clean

    pairs = q_dedup_substr(sf_dir)
    if isinstance(pairs, pd.DataFrame):
        pairs = from_pandas_clean(pairs) if len(pairs) else None
    n = int(read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"]).count())
    n_inv = 0
    if pairs is not None:
        nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

        def part(b: pa.Table) -> pa.Table:
            ids = np.unique(np.concatenate([
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False)])).astype(np.int64)
            return pa.table({"bucket": pa.array(ids % nb),
                             "v": pa.array(ids)})

        def kern(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": [int(g["v"].nunique())]})

        p = pairs.map_batches(part, batch_format="pyarrow") \
            .groupby("bucket").map_groups(kern, batch_format="pandas") \
            .to_pandas()
        n_inv = int(p["n"].sum()) if len(p) else 0
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "n_involved": np.array([n_inv], np.int64),
        "dup_rate": [round(n_inv / n if n else 0.0, 6)]})


ORACLE_SQL["dedup_substr_rate"] = f"""
    WITH pairs AS ({_substr_sql(window=30, stride=7, df_cap=64)}),
    inv AS (SELECT DISTINCT v FROM (
              SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs))
    SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
           (SELECT count(*) FROM inv)::BIGINT AS n_involved,
           round((SELECT count(*) FROM inv)::DOUBLE
                 / (SELECT count(*) FROM documents), 6) AS dup_rate
"""
QUERIES["dedup_substr_rate"] = q_dedup_substr_rate


def q_tpch_brand_size_chi2(sf_dir):
    """Chi-square independence test of p_brand x p_size (catalog
    dimension association screen): bounded contingency partials (25
    brands x 50 sizes), expected = row*col/n, one float fold in
    deterministic (brand, size) order both engines avoid order exposure
    by summing the IDENTICAL per-cell expression (round-6)."""
    part = read_parquet_clean(os.path.join(sf_dir, "part.parquet"),
                              columns=["p_brand", "p_size"])

    def cpart(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"b": b["p_brand"].to_pandas(),
                           "s": b["p_size"].to_numpy(
                               zero_copy_only=False)})
        g = df.groupby(["b", "s"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    p = part.map_batches(cpart, batch_format="pyarrow").to_pandas()
    g = p.groupby(["b", "s"])["n"].sum().reset_index()
    n = int(g["n"].sum())
    rows = g.groupby("b")["n"].sum()
    cols = g.groupby("s")["n"].sum()
    # chi2 over OBSERVED cells plus the zero cells' expected mass:
    # sum (o-e)^2/e = sum over all cells; zero cells contribute e
    chi2 = 0.0
    obs_e = 0.0
    for _, r in g.iterrows():
        e = rows[r["b"]] * cols[r["s"]] / n
        chi2 += (r["n"] - e) ** 2 / e
        obs_e += e
    chi2 += n - obs_e  # zero cells: sum e over absent (o=0) cells
    dof = (len(rows) - 1) * (len(cols) - 1)
    return pd.DataFrame({
        "n_parts": np.array([n], np.int64),
        "dof": np.array([dof], np.int64),
        "chi2": [round(float(chi2), 6)]})


ORACLE_SQL["tpch_brand_size_chi2"] = """
    WITH g AS (SELECT p_brand AS b, p_size AS s, count(*)::BIGINT AS n
               FROM part GROUP BY 1, 2),
    t AS (SELECT sum(n)::DOUBLE AS n FROM g),
    r AS (SELECT b, sum(n)::DOUBLE AS rn FROM g GROUP BY b),
    c AS (SELECT s, sum(n)::DOUBLE AS cn FROM g GROUP BY s),
    obs AS (SELECT sum((g.n - r.rn * c.cn / (SELECT n FROM t))
                       * (g.n - r.rn * c.cn / (SELECT n FROM t))
                       / (r.rn * c.cn / (SELECT n FROM t))) AS chi2o,
                   sum(r.rn * c.cn / (SELECT n FROM t)) AS eo
            FROM g JOIN r USING (b) JOIN c USING (s))
    SELECT (SELECT n FROM t)::BIGINT AS n_parts,
           ((SELECT count(*) FROM r) - 1)
             * ((SELECT count(*) FROM c) - 1) AS dof,
           round(chi2o + (SELECT n FROM t) - eo, 6) AS chi2
    FROM obs
"""
QUERIES["tpch_brand_size_chi2"] = q_tpch_brand_size_chi2


def q_text_ttr_by_source(sf_dir):
    """Per-source lexical diversity dashboard: mean type-token ratio
    over the bounded source catalog — the TTR kernel's per-doc ratios
    aggregated as map-side (source, sum, n) partials (one small
    groupby; round-6 means)."""
    from ray.data.aggregate import Sum

    from .runtime import tune_context
    from .text import _batch_word_hashes, _per_doc_max_and_distinct

    tune_context()
    docs = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text", "source"])

    def part(b: pa.Table) -> pa.Table:
        wd, h, n_docs = _batch_word_hashes(b["text"].to_pylist())
        n_tok = np.bincount(wd, minlength=n_docs).astype(np.int64)
        _, n_types = _per_doc_max_and_distinct(wd, h, n_docs)
        ttr = np.zeros(n_docs)
        nz = n_tok > 0
        ttr[nz] = n_types[nz] / n_tok[nz]
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "tsum": np.round(ttr, 6), "n": 1})
        g = df.groupby("source", sort=False).agg(
            tsum=("tsum", "sum"), n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = docs.map_batches(part, batch_format="pyarrow") \
        .groupby("source") \
        .aggregate(Sum("tsum", alias_name="tsum"),
                   Sum("n", alias_name="n")).to_pandas()
    agg["mean_ttr"] = (agg["tsum"] / agg["n"]).round(6)
    agg["n_docs"] = agg["n"].astype(np.int64)
    return agg[["source", "n_docs", "mean_ttr"]] \
        .sort_values("source").reset_index(drop=True)


ORACLE_SQL["text_ttr_by_source"] = """
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(
               lower(text), '[ \t\n]+'), x -> length(x) > 0)) AS w
      FROM documents),
    uni AS (SELECT doc_id, count(*)::DOUBLE AS n_tok,
                   count(DISTINCT w)::DOUBLE AS n_types
            FROM words GROUP BY doc_id),
    per AS (SELECT d.doc_id, d.source,
                   round(CASE WHEN coalesce(u.n_tok, 0) > 0
                         THEN u.n_types / u.n_tok ELSE 0.0 END, 6)
                     AS ttr
            FROM documents d LEFT JOIN uni u USING (doc_id))
    SELECT source, count(*)::BIGINT AS n_docs,
           round(sum(ttr) / count(*), 6) AS mean_ttr
    FROM per GROUP BY source
"""
QUERIES["text_ttr_by_source"] = q_text_ttr_by_source


def q_doc_spectral_radius(sf_dir):
    """Spectral-radius estimate of the undirected adjacency: the L1
    power-iteration ratio ||x_{t}||_1 / ||x_{t-1}||_1 after the eigen
    run's unnormalized recurrence (converges to lambda_max; the
    epidemic-threshold / expansion constant).  Two map_vertices L1
    reduces on consecutive iterates (the engine keeps both buffers)."""
    from .algos.eigen import EigenProgram

    eng = documents_engine(sf_dir, "undirected")
    # run EIGEN_ITERS steps, capturing the L1 mass of the last two
    # iterates: curr after run = x_t, and one more superstep gives
    # x_{t+1}; ratio estimates lambda_max
    eng.run(EigenProgram(), max_steps=EIGEN_ITERS, run_name="eigen_sr")
    s_t = eng.map_vertices(
        lambda ctx, state, active: float(state["curr"].sum()))
    # a fresh run re-inits state, so x_{t+1} comes from a full
    # (t+1)-step run of the same deterministic linear recurrence
    eng.run(EigenProgram(), max_steps=EIGEN_ITERS + 1,
            run_name="eigen_sr2")
    s_t1 = eng.map_vertices(
        lambda ctx, state, active: float(state["curr"].sum()))
    lam = s_t1 / s_t if s_t > 0 else 0.0
    return pd.DataFrame({
        "l1_t": [round(s_t, 6)], "l1_t1": [round(s_t1, 6)],
        "lambda_max_est": [round(lam, 6)]})


ORACLE_SQL["doc_spectral_radius"] = f"""
    WITH sym AS MATERIALIZED ({DOC_SYM_SQL}),
    allv AS MATERIALIZED (SELECT doc_id AS v FROM documents),
    x0 AS (SELECT v, 1.0 AS x FROM allv)
    {"".join(
        f", x{i} AS MATERIALIZED (SELECT allv.v, coalesce(m.s, 0.0) AS x "
        f"FROM allv LEFT JOIN (SELECT sym.dst AS v, sum(x{i-1}.x) AS s "
        f"FROM sym JOIN x{i-1} ON x{i-1}.v = sym.src GROUP BY sym.dst) m "
        f"USING (v))"
        for i in range(1, 8 + 2))}
    SELECT round((SELECT sum(x) FROM x8), 6) AS l1_t,
           round((SELECT sum(x) FROM x9), 6) AS l1_t1,
           round(CASE WHEN (SELECT sum(x) FROM x8) > 0
                 THEN (SELECT sum(x) FROM x9)
                      / (SELECT sum(x) FROM x8) ELSE 0.0 END, 6)
             AS lambda_max_est
"""
QUERIES["doc_spectral_radius"] = q_doc_spectral_radius


def q_doc_rank_degree_corr(sf_dir):
    """Does PageRank just measure degree here? Pearson correlation of
    (round-6 rank, symmetric degree) over all vertices: the gated
    degree attach + one moment-partial pass (tpch_corr's fold).
    Isolated vertices carry degree 0."""
    import ray

    from .edges import degree_table, symmetrize

    from .algos.triangles import BROADCAST_DEG_CAP
    from .dedup import _join_parts

    from .runtime import counted

    ranks = q_doc_pagerank(sf_dir).materialize()
    deg_ds, n_deg = counted(
        degree_table(symmetrize(documents_edges(sf_dir)), "src"))
    if n_deg <= BROADCAST_DEG_CAP:
        deg = deg_ds.to_pandas()
        vs = deg["v"].to_numpy(np.int64)
        order = np.argsort(vs)
        dref = ray.put((vs[order],
                        deg["degree"].to_numpy(np.int64)[order]))
        joined = ranks
        broadcast = True
    else:
        # SIZE-GATED (the assortativity/BROADCAST_DEG_CAP rule): above
        # the cap the degree table hash-joins onto the rank state
        dd_ds = deg_ds.map_batches(
            lambda b: pa.table({"v": b["v"], "degree": b["degree"]}),
            batch_format="pyarrow")
        joined = ranks.join(dd_ds, join_type="left_outer",
                            num_partitions=_join_parts(ranks.count()),
                            on=("v",))
        broadcast = False

    def part(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        if broadcast:
            v, d = ray.get(dref)
            vv = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(v, vv)
            pos_c = np.minimum(pos, max(0, len(v) - 1))
            dd = np.where((pos < len(v)) & (v[pos_c] == vv),
                          d[pos_c], 0).astype(np.float64)
        else:
            dd = np.nan_to_num(
                b["degree"].to_numpy(zero_copy_only=False)
                .astype(np.float64))
        return pa.table({
            "n": pa.array([len(r)], pa.int64()),
            "sx": pa.array([float(r.sum())]),
            "sy": pa.array([float(dd.sum())]),
            "sxx": pa.array([float((r * r).sum())]),
            "syy": pa.array([float((dd * dd).sum())]),
            "sxy": pa.array([float((r * dd).sum())])})

    p = joined.map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxx, syy = float(p["sxx"].sum()), float(p["syy"].sum())
    sxy = float(p["sxy"].sum())
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    corr = (n * sxy - sx * sy) / den if den > 0 else 0.0
    return pd.DataFrame({"n_vertices": np.array([n], np.int64),
                         "corr": [round(float(corr), 6)]})


ORACLE_SQL["doc_rank_degree_corr"] = f"""
    WITH pr AS MATERIALIZED ({_pagerank_sql(PR_ITERS, 6)}),
    e AS MATERIALIZED ({DOC_EDGES_SQL}),
    sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
    deg AS (SELECT src AS v, count(*)::DOUBLE AS d FROM sym
            GROUP BY src),
    j AS (SELECT pr.rank AS x, coalesce(deg.d, 0.0) AS y
          FROM pr LEFT JOIN deg USING (v))
    SELECT count(*)::BIGINT AS n_vertices,
           round(CASE WHEN sqrt(count(*)*sum(x*x) - sum(x)*sum(x))
                      * sqrt(count(*)*sum(y*y) - sum(y)*sum(y)) > 0
                 THEN (count(*)*sum(x*y) - sum(x)*sum(y))
                    / (sqrt(count(*)*sum(x*x) - sum(x)*sum(x))
                     * sqrt(count(*)*sum(y*y) - sum(y)*sum(y)))
                 ELSE 0.0 END, 6) AS corr
    FROM j
"""
QUERIES["doc_rank_degree_corr"] = q_doc_rank_degree_corr


def q_embed_cluster_purity(sf_dir):
    """Clustering-quality report: per k-means cluster, the majority
    TRUE-label share (purity).  Broadcast centroids (the semdedup
    assignment), bounded (cluster x label) count partials, driver fold
    over k x |labels| cells."""
    import ray

    from .ann import _normalize, kmeans_centroids, vec_matrix
    from .runtime import tune_context

    tune_context()
    emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding", "label"])
    cent = kmeans_centroids(emb, 8, 4)
    cref = ray.put(cent)

    def part(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(vec_matrix(b["embedding"]))
        a = (m @ c.T).argmax(axis=1).astype(np.int64)
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"c": a, "label": lab, "n": 1})
        g = df.groupby(["c", "label"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    p = emb.map_batches(part, batch_format="pyarrow").to_pandas()
    g = p.groupby(["c", "label"])["n"].sum().reset_index()
    out = g.groupby("c").agg(n_vecs=("n", "sum"),
                             n_majority=("n", "max")).reset_index()
    out["purity"] = (out["n_majority"] / out["n_vecs"]).round(6)
    out["c"] = out["c"].astype(np.int64)
    out["n_vecs"] = out["n_vecs"].astype(np.int64)
    out["n_majority"] = out["n_majority"].astype(np.int64)
    return out


ORACLE_SQL["embed_cluster_purity"] = _kmeans_full_sql(
    n_centroids=8, iters=4, tail="purity")
QUERIES["embed_cluster_purity"] = q_embed_cluster_purity


def q_events_new_vs_returning(sf_dir):
    """Daily new-vs-returning actives: per epoch-day, distinct users
    seen for the FIRST time that day vs returning ones.  One coarse
    user-bucket kernel emits each user's (first_day, active-day set) as
    calendar-bounded (day, new, returning) partials; driver fold."""
    from .algos.triangles import n_buckets_for

    ev = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts"]).materialize()
    nb = n_buckets_for(ev.count())

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (pc.cast(b["ts"], pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({"u": pa.array(u),
                         "day": pa.array(day.astype(np.int64)),
                         "kb": pa.array((u % nb).astype(np.int64))})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        ud = g.drop_duplicates(["u", "day"])
        first = ud.groupby("u", sort=False)["day"].transform("min")
        new = ud["day"].to_numpy() == first.to_numpy()
        df = pd.DataFrame({"day": ud["day"].to_numpy(np.int64),
                           "n_new": new.astype(np.int64),
                           "n_returning": (~new).astype(np.int64)})
        return df.groupby("day", sort=False).sum().reset_index()

    p = ev.map_batches(tag, batch_format="pyarrow") \
        .groupby("kb").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = p.groupby("day")[["n_new", "n_returning"]].sum().reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


ORACLE_SQL["events_new_vs_returning"] = """
    WITH ud AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
    f AS (SELECT user_id, min(day) AS first_day FROM ud
          GROUP BY user_id)
    SELECT ud.day,
           sum(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END)
             ::BIGINT AS n_new,
           sum(CASE WHEN ud.day = f.first_day THEN 0 ELSE 1 END)
             ::BIGINT AS n_returning
    FROM ud JOIN f USING (user_id)
    GROUP BY ud.day
"""
QUERIES["events_new_vs_returning"] = q_events_new_vs_returning

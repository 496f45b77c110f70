"""Edge derivation, dedup, degree tables, symmetrization.

Link-graph rule (FIXTURES.md §2, BASELINE.json.north_star): vertices are
files (dense id of (repo, path)); edges connect files that share a `path`
across repos or share `sha256(content)`. Within each sharing group we emit
**star edges to the group representative (min vertex id)** — linear in
group size, so a sha shared by 1e5 files emits 1e5-1 edges, not 1e10
pairs (SURVEY.md §7.5 skew cap; deterministic, same rule the oracle SQL
uses, so comparisons can never diverge on policy).

All heavy steps are groupby shuffles with vectorized per-group kernels;
dedup is a multi-key groupby projection. Schema: (src:int64, dst:int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# edge sets up to this size dedup on the driver (same rule as
# dedup.DRIVER_PAIR_CAP); larger sets use the groupby projection
EDGE_DRIVER_DEDUP_CAP = 2_000_000

EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def star_edges_group(group: pd.DataFrame, id_col: str = "vid") -> pd.DataFrame:
    """Per sharing-group kernel: star to min-id representative.

    Group = all rows sharing one key (path or sha). Distinct ids only;
    groups of size < 2 emit nothing.
    """
    ids = np.unique(group[id_col].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"src": np.empty(0, np.int64),
                             "dst": np.empty(0, np.int64)})
    rep = ids[0]
    return pd.DataFrame({"src": np.full(len(ids) - 1, rep, dtype=np.int64),
                         "dst": ids[1:].astype(np.int64)})


# sharing-group key tables up to this row count compute the per-key
# representative via map-side partial minima + a driver merge, then
# broadcast the (key -> rep) map — no aggregate or join shuffle; bigger
# tables use the distributed aggregate+join path
STAR_DRIVER_CAP = 20_000_000


def derive_star_edges(ds, key_col: str, id_col: str = "vid",
                      num_partitions: int = 16,
                      approx_rows: int | None = None):
    """groupby(key) -> star edges: rep = Min(id) per key, emit (rep, id)
    for id != rep.

    Below STAR_DRIVER_CAP (pass the known row count via approx_rows):
    per-batch pandas groupby-min partials merge on the driver and the
    rep map is broadcast (ray.put once, Index lookup per batch).  Above:
    distributed combiner aggregate + hash join."""
    import ray

    from .runtime import tune_context
    tune_context()

    proj = ds.select_columns([key_col, id_col])
    if approx_rows is not None and approx_rows <= STAR_DRIVER_CAP:
        def partial_min(b: pa.Table) -> pa.Table:
            g = (b.to_pandas().groupby(key_col, sort=False)[id_col].min())
            return pa.table({key_col: pa.array(g.index),
                             "__rep": pa.array(g.to_numpy(), pa.int64())})

        parts = proj.map_batches(partial_min,
                                 batch_format="pyarrow").to_pandas()
        mins = parts.groupby(key_col, sort=False)["__rep"].min()
        keys = mins.index.to_numpy(object)
        h = pd.util.hash_array(keys)
        order = np.argsort(h)
        hs, reps = h[order], mins.to_numpy()[order]
        # uint64-hashed rep map (VERDICT r4 minor #2): ~10x less driver
        # RSS + broadcast bytes than the string Index.  EXACT whenever
        # the hash is injective on this key set (checked; every probe
        # key is in the set by construction, so no foreign aliasing);
        # on a collision fall back to the exact string Index.
        if len(np.unique(hs)) == len(hs):
            ref = ray.put((hs, reps))

            def emit_bc(b: pa.Table) -> pa.Table:
                hmap, rv = ray.get(ref)
                hk = pd.util.hash_array(
                    b[key_col].to_numpy(zero_copy_only=False)
                    .astype(object))
                rep = rv[np.searchsorted(hmap, hk)]
                vid = b[id_col].to_numpy(zero_copy_only=False)
                keep = vid != rep
                return pa.table({"src": pa.array(rep[keep], pa.int64()),
                                 "dst": pa.array(vid[keep], pa.int64())})
        else:
            ref = ray.put((pd.Index(mins.index), mins.to_numpy()))

            def emit_bc(b: pa.Table) -> pa.Table:
                index, rv = ray.get(ref)
                pos = index.get_indexer(
                    b[key_col].to_numpy(zero_copy_only=False)
                    .astype(object))
                rep = rv[pos]  # every key is present by construction
                vid = b[id_col].to_numpy(zero_copy_only=False)
                keep = vid != rep
                return pa.table({"src": pa.array(rep[keep], pa.int64()),
                                 "dst": pa.array(vid[keep], pa.int64())})

        return proj.map_batches(emit_bc, batch_format="pyarrow")

    from ray.data.aggregate import Min

    # materialized: `proj` feeds BOTH the aggregate and the join below;
    # a diamond over un-materialized lineage deadlocks the streaming
    # executor intermittently (Ray 2.49; same root cause as
    # algos/triangles.py).  `mins` is one row per key — the small side.
    proj = proj.materialize()
    mins = proj.groupby(key_col).aggregate(
        Min(id_col, alias_name="__rep")).materialize()
    joined = proj.join(mins, join_type="inner",
                       num_partitions=num_partitions, on=(key_col,))

    def emit(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.not_equal(b[id_col], b["__rep"]))
        return pa.table({"src": pc.cast(keep["__rep"], pa.int64()),
                         "dst": pc.cast(keep[id_col], pa.int64())})

    return joined.map_batches(emit, batch_format="pyarrow")


def dedup_edges(ds):
    """Collapse duplicate (src,dst) pairs. groupby projection keeps the
    combine partial-aggregate path (no full-row shuffle of payloads)."""
    return ds.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def drop_self_loops(ds):
    return ds.map_batches(
        lambda b: b.filter(pc.not_equal(b["src"], b["dst"])),
        batch_format="pyarrow",
    )


def symmetrize(ds):
    """Emit each edge in both directions (Gemini load_undirected_from_directed,
    graph.hpp:572-587, emits (src,dst) and (dst,src) during the shuffles).
    Self-loops stay single. Result may contain duplicates; dedup separately
    if the downstream algo needs simple edges."""
    def both(b: pa.Table) -> pa.Table:
        fwd = b.select(["src", "dst"])
        rev = pa.table({"src": b["dst"], "dst": b["src"]})
        rev = rev.filter(pc.not_equal(rev["src"], rev["dst"]))
        return pa.concat_tables([fwd, rev])
    return ds.map_batches(both, batch_format="pyarrow")


def degree_table(ds, key: str = "src", out: str = "degree"):
    """Per-vertex degree: groupby(key).count() with combiner pushdown."""
    deg = ds.groupby(key).count()
    return deg.map_batches(
        lambda b: pa.table({"v": pc.cast(b[key], pa.int64()),
                            out: pc.cast(b["count()"], pa.int64())}),
        batch_format="pyarrow",
    )


def edges_from_arrays(src: np.ndarray, dst: np.ndarray,
                      weight: np.ndarray | None = None):
    """Small-graph helper (tests): numpy arrays -> Dataset."""
    import ray.data as rd
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if weight is not None:
        cols["weight"] = pa.array(weight, pa.float64())
    return rd.from_arrow(pa.table(cols))


def build_link_edges(files_ds, n_buckets: int = 256, join_partitions: int = 16):
    """Full derivation: repo-files table -> (edges_ds, n_vertices, mapping).

    files_ds columns: repo, path, commit, lang, content.
    Pipeline: drop empty content -> sha256 -> dense ids of (repo,path)
    -> star edges by path  ∪  star edges by sha -> self-loop drop -> dedup.
    """
    from .hashing import drop_empty, sha256_stage
    from .ids import assign_dense_ids, attach_ids

    base = files_ds.map_batches(drop_empty, batch_format="pyarrow")
    base = base.map_batches(sha256_stage(), batch_format="pyarrow")
    # content is only needed up to the sha — project it away, then
    # materialize: `base` feeds BOTH the id assignment and the attach
    # join below; un-materialized, the whole corpus + sha pass would
    # execute twice (and diamond lineage risks the Ray 2.49 executor
    # deadlock noted in derive_star_edges)
    base = base.select_columns(["repo", "path", "sha256"]).materialize()
    n_files = base.count()  # cheap: materialized
    mapping, n_vertices = assign_dense_ids(base, ["repo", "path"],
                                           n_buckets=n_buckets,
                                           approx_rows=n_files)
    if n_vertices == 0:
        import ray.data as rd
        empty = pa.Table.from_pylist([], schema=EDGE_SCHEMA)
        return rd.from_arrow(empty), 0, mapping
    withids = attach_ids(base, mapping, ["repo", "path"],
                         num_partitions=join_partitions,
                         n_keys=n_vertices)

    # Single pass over withids: each row contributes two group keys,
    # "P:"+path and "S:"+sha -> ONE groupby-min + ONE join derives both
    # shared-path and shared-content stars (vs running the upstream twice).
    def both_keys(b: pa.Table) -> pa.Table:
        vid = pc.cast(b["vid"], pa.int64())
        pkey = pc.binary_join_element_wise(
            pa.array(["P"] * b.num_rows), b["path"], ":")
        skey = pc.binary_join_element_wise(
            pa.array(["S"] * b.num_rows), b["sha256"], ":")
        return pa.table({"gkey": pa.concat_arrays(
                            [pkey.combine_chunks(), skey.combine_chunks()]),
                         "vid": pa.concat_arrays(
                            [vid.combine_chunks(), vid.combine_chunks()])})

    keyed = withids.map_batches(both_keys, batch_format="pyarrow")
    stars = derive_star_edges(keyed, "gkey", num_partitions=join_partitions,
                              approx_rows=2 * n_vertices)
    stars = drop_self_loops(stars).materialize()
    if stars.count() <= EDGE_DRIVER_DEDUP_CAP:
        # star edges are already near-distinct (one star per group);
        # a driver drop_duplicates skips the dedup shuffle at this size
        from .io import from_pandas_clean

        pdf = (stars.to_pandas().drop_duplicates(["src", "dst"])
               .reset_index(drop=True))
        # split the single from_pandas block so downstream stages
        # (symmetrize, store routing, triangles) parallelize
        edges = from_pandas_clean(pdf).repartition(
            max(2, min(16, len(pdf) // 50_000 + 2)))
    else:
        edges = dedup_edges(stars)
    return edges, n_vertices, mapping


CLIQUE_GROUP_CAP = 6  # members per key group that form the clique


def derive_clique_edges(ds, key_col: str, id_col: str = "vid",
                        cap: int = CLIQUE_GROUP_CAP):
    """groupby(key) -> CLIQUE edges among the `cap` smallest member ids
    of each key group (canonical lo < hi, may contain cross-group
    duplicates — dedup downstream).  The cap bounds a hot key's output
    at C(cap, 2) pairs, the same determinism-over-sampling policy as
    the star-edge skew cap: drop by id rank, reproducible in SQL as
    row_number() OVER (ORDER BY id) <= cap.

    Shape: one coarse string-hash-bucket groupby (pd.util.hash_array —
    builtin hash is PYTHONHASHSEED-unstable across workers) with a
    vectorized in-bucket kernel; a full group always lands in one
    bucket, so the rank cut is globally exact."""
    from .algos.triangles import n_buckets_for

    proj = ds.select_columns([key_col, id_col]).materialize()
    nb = n_buckets_for(proj.count())

    def tag(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        kb = (pd.util.hash_array(keys) % np.uint64(nb)).astype(np.int64)
        return pa.table({key_col: b[key_col],
                         id_col: pc.cast(b[id_col], pa.int64()),
                         "kb": pa.array(kb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": np.empty(0, np.int64),
                              "dst": np.empty(0, np.int64)})
        gg = g[[key_col, id_col]].drop_duplicates()
        k = gg[key_col].to_numpy()
        v = gg[id_col].to_numpy(np.int64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(k)]]))
        seg = np.repeat(np.arange(len(starts)), lens)
        pos = np.arange(len(k)) - starts[seg]
        keep = pos < cap  # rank cut: the cap smallest ids per group
        v, seg = v[keep], seg[keep]
        n = np.bincount(seg, minlength=len(starts))
        starts2 = np.concatenate([[0], np.cumsum(n)[:-1]])
        pos2 = np.arange(len(v)) - starts2[seg]
        reps = n[seg] - pos2 - 1
        total = int(reps.sum())
        if total == 0:
            return empty
        i_idx = np.repeat(np.arange(len(v)), reps)
        csum = np.cumsum(reps) - reps
        j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
        return pd.DataFrame({"src": v[i_idx], "dst": v[j_idx]})

    return proj.map_batches(tag, batch_format="pyarrow") \
               .groupby("kb").map_groups(kern, batch_format="pandas")


def induced_edges(edges_ds, keep_ds, id_col: str = "doc_id"):
    """Induced-subgraph edge filter: keep edges whose BOTH endpoints
    appear in `keep_ds` — two size-gated semi-joins (broadcast keys
    under SEMI_BROADCAST_CAP, coarse co-group shuffle above), the
    subgraph-extraction primitive for run-on-a-slice analyses.
    Vertex ids are preserved (no densify): isolated vertices cost one
    state slot each and cannot affect any kept vertex's result."""
    from .joins import semi_join

    out = edges_ds
    for c in ("src", "dst"):
        keys = keep_ds.map_batches(
            lambda b, c=c: pa.table({c: b[id_col]}),
            batch_format="pyarrow")
        out = semi_join(out, keys, c)
    return out

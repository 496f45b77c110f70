"""Edge derivation / dedup / degree vs a duckdb oracle on the same rows."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from linkgraph import edges as E
from linkgraph import synth
from linkgraph.hashing import add_sha256


def test_star_edges_group():
    g = pd.DataFrame({"k": ["a"] * 4, "vid": [7, 3, 9, 3]})
    out = E.star_edges_group(g)
    assert out.src.tolist() == [3, 3] and out.dst.tolist() == [7, 9]
    single = E.star_edges_group(pd.DataFrame({"k": ["a"], "vid": [1]}))
    assert len(single) == 0


def test_dedup_and_selfloops():
    ds = E.edges_from_arrays(np.array([1, 1, 2, 3, 3]), np.array([2, 2, 2, 3, 1]))
    out = E.dedup_edges(E.drop_self_loops(ds)).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == [(1, 2), (3, 1)]


def test_symmetrize():
    ds = E.edges_from_arrays(np.array([0, 1]), np.array([1, 1]))
    out = E.symmetrize(ds).to_pandas()
    got = sorted(map(tuple, out[["src", "dst"]].to_numpy()))
    assert got == [(0, 1), (1, 0), (1, 1)]


def test_degree_table():
    ds = E.edges_from_arrays(np.array([0, 0, 1, 2]), np.array([1, 2, 2, 0]))
    deg = E.degree_table(ds, "src", "out_degree").to_pandas()
    deg = deg.sort_values("v").reset_index(drop=True)
    assert deg.v.tolist() == [0, 1, 2]
    assert deg.out_degree.tolist() == [2, 1, 1]


def test_build_link_edges_against_oracle():
    """Engine edge derivation == pandas/duckdb oracle on key structure.

    Compare as sets of (key(src), key(dst)) pairs so the comparison is
    independent of the dense-id order (which is bucket-dependent)."""
    t = synth.synth_repo_files(10, 30)
    files = rd.from_arrow(t)
    edges, n_vertices, mapping = E.build_link_edges(files, n_buckets=16,
                                                    join_partitions=4)
    mp = mapping.to_pandas()
    inv = dict(zip(mp.vid, mp.__key))
    got = {(inv[s], inv[d]) for s, d in
           edges.to_pandas()[["src", "dst"]].itertuples(index=False)}

    # oracle: pure pandas, same star rule, keys ordered the same way
    pdf = t.to_pandas()
    pdf = pdf[pdf.content != ""].copy()
    import hashlib
    pdf["sha"] = [hashlib.sha256(c.encode()).hexdigest() for c in pdf.content]
    pdf["key"] = pdf.repo + "\x1f" + pdf.path
    keys = sorted(pdf.key.unique())
    # engine ids are (bucket, key)-ordered; rebuild the same order
    from linkgraph.hashing import hash64_str
    buckets = hash64_str(keys) % 16
    order = sorted(range(len(keys)), key=lambda i: (buckets[i], keys[i]))
    vid = {keys[i]: r for r, i in enumerate(order)}
    pdf["vid"] = pdf.key.map(vid)
    want = set()
    for col in ["path", "sha"]:
        for _, grp in pdf.groupby(col):
            ids = np.unique(grp.vid.to_numpy())
            if len(ids) >= 2:
                for d in ids[1:]:
                    if ids[0] != d:
                        want.add((ids[0], d))
    inv2 = {v: k for k, v in vid.items()}
    want = {(inv2[s], inv2[d]) for s, d in want}
    assert got == want
    assert n_vertices == len(keys)


def test_induced_edges_keeps_both_endpoint_matches():
    import ray.data as rd

    from linkgraph.edges import induced_edges

    rng = np.random.default_rng(9)
    e = rng.integers(0, 100, size=(600, 2))
    edges = rd.from_arrow(pa.table({
        "src": pa.array(e[:, 0], pa.int64()),
        "dst": pa.array(e[:, 1], pa.int64())}))
    keep_ids = np.arange(0, 100, 3, dtype=np.int64)  # every third vertex
    keep = rd.from_arrow(pa.table({"doc_id": pa.array(keep_ids)}))
    got = induced_edges(edges, keep).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    m = np.isin(e[:, 0], keep_ids) & np.isin(e[:, 1], keep_ids)
    want = pd.DataFrame({"src": e[m, 0], "dst": e[m, 1]}) \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_star_edges_hashed_map_equals_exact(tmp_path, monkeypatch):
    """The uint64-hashed broadcast rep map equals the exact string-Index
    fallback (forced via a constant hash -> collision -> fallback)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.edges import derive_star_edges

    keys = [f"k{i % 7}" for i in range(60)]
    ds = rd.from_arrow(pa.table({
        "gkey": pa.array(keys),
        "vid": pa.array(np.arange(60, dtype=np.int64))}))

    hashed = derive_star_edges(ds, "gkey", approx_rows=60) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)

    monkeypatch.setattr(pd.util, "hash_array",
                        lambda a: np.zeros(len(a), np.uint64))
    exact = derive_star_edges(ds, "gkey", approx_rows=60) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    monkeypatch.undo()
    pd.testing.assert_frame_equal(hashed, exact)

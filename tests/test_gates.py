"""Size-gate path equality: every operator that picks between a
driver/broadcast plan (below a cap) and a distributed shuffle plan
(above it) must produce IDENTICAL results on both paths.  These tests
force each path on the same small input via the cap constants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs_table(n=60, seed=3):
    rng = np.random.default_rng(seed)
    base = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump"]
    texts = []
    for i in range(n):
        t = base[i % 3]
        if rng.random() < 0.4:
            t = t + f" tail{i % 7}"
        texts.append(t)
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts)})


def _norm_pairs(x, cols=("a", "b")):
    """Dataset-or-frame -> canonical sorted DataFrame (pair operators
    return a Dataset on the distributed path, pandas under the cap)."""
    if not isinstance(x, pd.DataFrame):
        x = x.to_pandas()
    return x.sort_values(list(cols)).reset_index(drop=True)


def test_minhash_driver_vs_distributed_paths(monkeypatch):
    """Three plans, identical output: whole-bucket-table driver pairing
    (default at this size), hot-filter + driver pair-dedup, and the
    fully distributed groupby projection (which returns a Dataset)."""
    import linkgraph.dedup as D

    ds = rd.from_arrow(_docs_table())
    small = D.minhash_dedup_pairs(ds, threshold=0.6)
    monkeypatch.setattr(D, "BUCKET_DRIVER_CAP", -1)
    mid = D.minhash_dedup_pairs(rd.from_arrow(_docs_table()),
                                threshold=0.6)
    monkeypatch.setattr(D, "DRIVER_PAIR_CAP", -1)
    monkeypatch.setattr(D, "HOT_DRIVER_CAP", -1)
    big = D.minhash_dedup_pairs(rd.from_arrow(_docs_table()),
                                threshold=0.6)
    assert not isinstance(big, pd.DataFrame)  # Dataset above the cap
    pd.testing.assert_frame_equal(_norm_pairs(small), _norm_pairs(mid))
    pd.testing.assert_frame_equal(_norm_pairs(small), _norm_pairs(big))


def test_simhash_driver_vs_distributed_dedup(monkeypatch):
    import linkgraph.dedup as D

    ds = rd.from_arrow(_docs_table())
    small = D.simhash_dedup_pairs(ds)
    monkeypatch.setattr(D, "DRIVER_PAIR_CAP", -1)
    big = D.simhash_dedup_pairs(rd.from_arrow(_docs_table()))
    assert not isinstance(big, pd.DataFrame)  # Dataset above the cap
    pd.testing.assert_frame_equal(
        _norm_pairs(small), _norm_pairs(big)[["a", "b", "hamming"]])


def test_embed_pairs_broadcast_vs_lsh_paths(monkeypatch):
    """embedding_dup_pairs_gated routes by matrix size: the broadcast
    matmul below EMBED_BROADCAST_ELEMS, the LSH-bucketed path above.
    With threshold-appropriate LSH knobs (few planes, many tables) both
    plans find IDENTICAL pairs on the sf0.01 embeddings (VERDICT r2 #1:
    path-equality test).  The forced-LSH run must never take_all the
    corpus — asserted by routing through the gated dispatcher with the
    cap at -1, which cannot reach _load_matrix."""
    import linkgraph.dedup as D

    from linkgraph.io import read_parquet_clean

    emb = read_parquet_clean("/root/testdata/sf0.01/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    exact = D.embedding_dup_pairs_gated(emb, threshold=0.4)
    assert isinstance(exact, pd.DataFrame) and len(exact) > 0
    monkeypatch.setattr(D, "EMBED_BROADCAST_ELEMS", -1)
    approx = D.embedding_dup_pairs_gated(emb, threshold=0.4, n_planes=2,
                                         n_tables=16, cap=2048)
    pd.testing.assert_frame_equal(
        _norm_pairs(exact)[["a", "b"]],
        _norm_pairs(approx)[["a", "b"]])
    # cosine values agree too (both exact-verified float64 row products)
    np.testing.assert_allclose(_norm_pairs(exact)["cosine"],
                               _norm_pairs(approx)["cosine"], rtol=1e-12)


def test_semantic_dedup_gate_paths_equal(tmp_path, monkeypatch):
    """semantic_dedup_ids keeps the same survivors whether the pair
    stage runs the broadcast matmul or the forced LSH scale path."""
    import linkgraph.dedup as D

    from linkgraph.io import read_parquet_clean

    emb = read_parquet_clean("/root/testdata/sf0.01/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    n = 500
    k1, rep1 = D.semantic_dedup_ids(emb, n, str(tmp_path / "s1"),
                                    threshold=0.4)
    ids1 = sorted(k1.to_pandas()["vec_id"].tolist())
    monkeypatch.setattr(D, "EMBED_BROADCAST_ELEMS", -1)
    k2, rep2 = D.semantic_dedup_ids(emb, n, str(tmp_path / "s2"),
                                    threshold=0.4, lsh_planes=2,
                                    lsh_tables=16, lsh_cap=2048)
    ids2 = sorted(k2.to_pandas()["vec_id"].tolist())
    assert ids1 == ids2 and rep1 is not None and rep2 is not None


def test_tfidf_broadcast_vs_distributed_vocab(sf_dir, monkeypatch):
    """tfidf_top_terms: vocab-broadcast scoring below VOCAB_BROADCAST_CAP
    equals the distributed term-bucket join + doc-bucket rank path above
    it (same float ops on both: idf lookup then (c/n)*idf)."""
    import linkgraph.text as X

    from linkgraph.io import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    a = X.tfidf_top_terms(docs, k=3).to_pandas()
    monkeypatch.setattr(X, "VOCAB_BROADCAST_CAP", -1)
    docs2 = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    b = X.tfidf_top_terms(docs2, k=3).to_pandas()
    key = ["doc_id", "rnk"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_assortativity_broadcast_vs_join_paths(sf_dir, monkeypatch):
    """q_doc_assortativity: degree-broadcast plan below
    BROADCAST_DEG_CAP equals the hash-join fallback above it (the moment
    sums are exact int64 on both paths, so equality is bitwise)."""
    import linkgraph.algos.triangles as T

    from linkgraph.pipelines import q_doc_assortativity

    bc = q_doc_assortativity(sf_dir)
    monkeypatch.setattr(T, "BROADCAST_DEG_CAP", -1)
    join = q_doc_assortativity(sf_dir)
    assert bc["assortativity"].iloc[0] == join["assortativity"].iloc[0]


def test_star_edges_broadcast_vs_distributed():
    from linkgraph.edges import derive_star_edges

    t = pa.table({"gkey": pa.array(["a", "a", "b", "b", "b", "c"]),
                  "vid": pa.array([5, 2, 9, 1, 7, 3], pa.int64())})
    bc = derive_star_edges(rd.from_arrow(t), "gkey", approx_rows=6) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    dist = derive_star_edges(rd.from_arrow(t), "gkey", approx_rows=None) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, dist)


def test_assign_and_attach_ids_paths_identical():
    from linkgraph.ids import assign_dense_ids, attach_ids

    rows = pa.table({"k": [f"key{i % 23:03d}:{i % 5}" for i in range(200)],
                     "payload": list(range(200))})
    ds = rd.from_arrow(rows)
    m1, n1 = assign_dense_ids(ds, ["k"], n_buckets=8)
    m2, n2 = assign_dense_ids(ds, ["k"], n_buckets=8, approx_rows=200)
    assert n1 == n2
    p1 = m1.to_pandas().sort_values("__key").reset_index(drop=True)
    p2 = m2.to_pandas().sort_values("__key").reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)

    a_bc = attach_ids(ds, m2, ["k"], n_keys=n2).to_pandas() \
        .sort_values("payload").reset_index(drop=True)
    a_join = attach_ids(ds, m2.materialize(), ["k"], n_keys=None) \
        .to_pandas().sort_values("payload").reset_index(drop=True)
    cols = ["k", "payload", "vid"]
    pd.testing.assert_frame_equal(a_bc[cols], a_join[cols])


def test_triangles_paths_equal_random():
    import linkgraph.algos.triangles as T

    from linkgraph.edges import edges_from_arrays

    rng = np.random.default_rng(11)
    s = rng.integers(0, 120, 900)
    d = rng.integers(0, 120, 900)
    fast = T.triangle_count(edges_from_arrays(s, d))
    old, old_bc = T.DRIVER_TRI_CAP, T.EDGE_KEY_BROADCAST_CAP
    T.DRIVER_TRI_CAP = 0
    try:
        slow = T.triangle_count(edges_from_arrays(s, d))
        T.EDGE_KEY_BROADCAST_CAP = -1  # coarse-bucket merge closure
        bucket = T.triangle_count(edges_from_arrays(s, d))
    finally:
        T.DRIVER_TRI_CAP, T.EDGE_KEY_BROADCAST_CAP = old, old_bc
    assert fast == slow == bucket


def test_load_undirected_dedup_paths(tmp_path, monkeypatch):
    import linkgraph.edges as E

    from linkgraph.algos import connected_components
    from linkgraph.edges import edges_from_arrays
    from linkgraph.graph import load_undirected
    from linkgraph.synth import micro_graph

    e = micro_graph("two_cliques_k5")
    n = int(e.max()) + 1
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n, 2,
                          str(tmp_path / "a"))
    connected_components(eng)
    l1 = eng.state_pandas(["label"])["label"].to_numpy()
    eng.shutdown()
    monkeypatch.setattr(E, "EDGE_DRIVER_DEDUP_CAP", -1)
    eng = load_undirected(edges_from_arrays(e[:, 0], e[:, 1]), n, 2,
                          str(tmp_path / "b"))
    connected_components(eng)
    l2 = eng.state_pandas(["label"])["label"].to_numpy()
    eng.shutdown()
    assert np.array_equal(l1, l2)


def test_clustering_paths_and_values():
    """Driver kernel vs broadcast-closure vs coarse-bucket closure, all
    equal — and exact on a hand graph: triangle 0-1-2 plus pendant 3."""
    import linkgraph.algos.triangles as T

    from linkgraph.edges import edges_from_arrays

    def norm(x):
        if not isinstance(x, pd.DataFrame):
            x = x.to_pandas()
        return x.sort_values("doc_id").reset_index(drop=True)

    # hand graph: deg(0)=3 -> 2*1/(3*2)=1/3; deg(1)=deg(2)=2 -> 1.0
    hand = norm(T.clustering_coefficients(
        edges_from_arrays(np.array([0, 0, 1, 0]),
                          np.array([1, 2, 2, 3]))))
    assert hand["doc_id"].tolist() == [0, 1, 2, 3]
    assert hand["clustering"].tolist() == [
        round(1 / 3, 6), 1.0, 1.0, 0.0]

    rng = np.random.default_rng(7)
    s = rng.integers(0, 120, 900)
    d = rng.integers(0, 120, 900)
    fast = norm(T.clustering_coefficients(edges_from_arrays(s, d)))
    old, old_bc = T.DRIVER_TRI_CAP, T.EDGE_KEY_BROADCAST_CAP
    T.DRIVER_TRI_CAP = 0
    try:
        slow = norm(T.clustering_coefficients(edges_from_arrays(s, d)))
        T.EDGE_KEY_BROADCAST_CAP = -1
        bucket = norm(T.clustering_coefficients(edges_from_arrays(s, d)))
    finally:
        T.DRIVER_TRI_CAP, T.EDGE_KEY_BROADCAST_CAP = old, old_bc
    pd.testing.assert_frame_equal(fast, slow)
    pd.testing.assert_frame_equal(fast, bucket)


def test_decontamination_planted_and_paths(monkeypatch):
    """Planted word overlap is flagged with the right distinct-gram hit
    count (9 shared words = 6 shared 4-grams); broadcast and
    coarse-bucket join paths agree."""
    import linkgraph.decontam as DC

    bench_txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        if i == 53 * 0:  # doc 0 is the benchmark doc (0 % 53 == 0)
            texts.append(bench_txt)
        elif i == 7:
            texts.append("xx " + " ".join(bench_txt.split()[0:9]) + " yy")
        elif i == 11:
            texts.append("unrelated words only here none shared at all")
        else:
            texts.append(f"filler{i} " * 12)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}))

    def norm(x):
        if not isinstance(x, pd.DataFrame):
            x = x.to_pandas()
        return x.sort_values("doc_id").reset_index(drop=True)

    got = norm(DC.contamination(ds))
    assert got["doc_id"].tolist() == [7]
    assert got["n_hits"].tolist() == [6]

    monkeypatch.setattr(DC, "BENCH_GRAM_BROADCAST_CAP", -1)
    dist = norm(DC.contamination(ds))
    pd.testing.assert_frame_equal(got, dist)


def test_redact_pii_planted():
    from linkgraph.text import redact_pii

    t = pa.table({"text": pa.array([
        "mail bob.smith+x@corp.example.org now",
        "server at 10.1.255.3 port",
        "call +1-555-0100123 thanks",
        "none of the above",
        "a@b.io and 1.2.3.4 and +12-3456-7890",
    ])})
    out = redact_pii(t)
    assert out["n_email"].to_pylist() == [1, 0, 0, 0, 1]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0, 0, 1]
    assert out["n_phone"].to_pylist() == [0, 0, 1, 0, 1]
    red = out["text_redacted"].to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server at <IP> port"
    assert red[2] == "call <PHONE> thanks"
    assert red[3] == "none of the above"
    assert red[4] == "<EMAIL> and <IP> and <PHONE>"


def test_rollup_events_naive_parity():
    import pandas as pd_
    from linkgraph.windows import rollup_events

    rng = np.random.default_rng(5)
    n = 500
    ts = pa.array((rng.integers(0, 40, n) * 86400_000_000
                   + rng.integers(0, 86400_000_000, n)).astype("int64"),
                  pa.timestamp("us"))
    et = pa.array(rng.choice(["a", "b", "c"], n))
    val = pa.array(np.round(rng.random(n) * 100, 2))
    ds = rd.from_arrow(pa.table({"ts": ts, "event_type": et, "value": val}))
    out = rollup_events(ds).sort_values(
        ["event_type", "day"]).reset_index(drop=True)

    df = pd_.DataFrame({
        "day": (pa.compute.cast(ts, pa.int64()).to_numpy()
                // 86400_000_000),
        "event_type": et.to_pylist(),
        "cents": np.floor(val.to_numpy() * 100 + 0.5).astype(np.int64)})
    l2 = df.groupby(["event_type", "day"]).agg(
        n_events=("cents", "size"), c=("cents", "sum")).reset_index()
    total_rows = 3 + 1 + len(l2)
    assert len(out) == total_rows
    grand = out[(out.event_type == "ALL")]
    assert grand["n_events"].tolist() == [n]
    assert grand["total_value"].tolist() == [df["cents"].sum() / 100.0]
    m = out.merge(l2, on=["event_type", "day"], how="inner")
    assert len(m) == len(l2)
    assert (m["n_events_x"] == m["n_events_y"]).all()
    assert np.allclose(m["total_value"], m["c"] / 100.0)


def test_neighbor_sampling_deterministic():
    """Fanout bounds, hop-2 frontier consistency, partition-count
    invariance, and the per-source selection is EXACTLY the k smallest
    avalanche priorities (independently recomputed)."""
    from linkgraph.neighbors import _pair_priority, sample_neighbors

    rng = np.random.default_rng(13)
    s = rng.integers(0, 60, 500).astype(np.int64)
    d = rng.integers(0, 60, 500).astype(np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    # dedup directed pairs
    u = np.unique(s * 64 + d)
    s, d = u // 64, u % 64
    t = pa.table({"src": pa.array(s), "dst": pa.array(d)})
    seeds = [0, 1, 2]

    out1 = sample_neighbors(rd.from_arrow(t), seeds, (3, 2))
    out4 = sample_neighbors(rd.from_arrow(t).repartition(4), seeds, (3, 2))
    k1 = out1.sort_values(["hop", "src", "dst"]).reset_index(drop=True)
    k4 = out4.sort_values(["hop", "src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(k1, k4)

    h1 = out1[out1.hop == 1]
    h2 = out1[out1.hop == 2]
    assert h1.groupby("src").size().max() <= 3
    assert h2.groupby("src").size().max() <= 2
    assert set(h1.src).issubset(set(seeds))
    assert set(h2.src).issubset(set(h1.dst))
    # independent recompute for one hop-1 source
    src0 = int(h1.src.iloc[0])
    nbrs = d[s == src0]
    pri = _pair_priority(np.full(len(nbrs), src0, np.int64), nbrs)
    want = set(nbrs[np.argsort(pri)][:3].tolist())
    assert set(h1[h1.src == src0].dst.tolist()) == want


def test_sage_mean_features_paths(monkeypatch):
    """Naive numpy parity + broadcast vs bucketed-join path equality
    (float sums associate per plan -> allclose, counts exact)."""
    import linkgraph.neighbors as NB

    rng = np.random.default_rng(3)
    dim, nv = 5, 30
    ids = np.arange(nv, dtype=np.int64)
    feats = rng.standard_normal((nv, dim)).astype(np.float32)
    s = rng.integers(0, nv, 200).astype(np.int64)
    d = rng.integers(0, nv, 200).astype(np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    ft = pa.table({"vec_id": pa.array(ids),
                   "embedding": pa.array([list(map(float, r))
                                          for r in feats],
                                         pa.list_(pa.float32()))})
    et = pa.table({"src": pa.array(s), "dst": pa.array(d)})

    def norm(x):
        if not isinstance(x, pd.DataFrame):
            x = x.to_pandas()
        return x.sort_values(["v", "i"]).reset_index(drop=True)

    got = norm(NB.mean_neighbor_features(rd.from_arrow(et),
                                         rd.from_arrow(ft)))
    # naive
    rows = []
    for v in np.unique(s):
        nb = d[s == v]
        m = feats[nb].astype(np.float64).mean(axis=0)
        for i in range(dim):
            rows.append((v, i + 1, m[i]))
    want = pd.DataFrame(rows, columns=["v", "i", "mean_x"])
    want = want.sort_values(["v", "i"]).reset_index(drop=True)
    assert got["v"].tolist() == want["v"].tolist()
    assert got["i"].tolist() == want["i"].tolist()
    np.testing.assert_allclose(got["mean_x"], want["mean_x"], atol=2e-6)

    monkeypatch.setattr(NB, "FEATURE_BROADCAST_ELEMS", -1)
    dist = norm(NB.mean_neighbor_features(rd.from_arrow(et),
                                          rd.from_arrow(ft)))
    assert got["v"].tolist() == dist["v"].tolist()
    np.testing.assert_allclose(got["mean_x"], dist["mean_x"], atol=2e-6)


def test_incremental_dedup_index_roundtrip(tmp_path):
    """Novel survivors match the naive two-phase rule; the appended
    index makes an identical second ingest come back EMPTY; a crashed
    partial build resumes without doubling."""
    from linkgraph.dedup import build_fp_index, incremental_dedup

    def fp_table(ids, fps):
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    idx_dir = str(tmp_path / "fpidx")
    phase_a = fp_table([0, 2, 4, 6], ["A", "B", "A", "C"])
    rep = build_fp_index(rd.from_arrow(phase_a), idx_dir)
    assert rep["written"] > 0
    # resume: re-running the finished build writes nothing new
    rep2 = build_fp_index(rd.from_arrow(phase_a), idx_dir)
    assert rep2["written"] == 0 and rep2["skipped"] == rep["written"]

    # new batch: B is already indexed; D dups inside the batch (min id
    # 3 survives); E is novel
    phase_b = fp_table([1, 3, 5, 7, 9], ["B", "D", "D", "E", "A"])
    novel = incremental_dedup(rd.from_arrow(phase_b), idx_dir,
                              ingest_tag="t1").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert novel["doc_id"].tolist() == [3, 7]
    assert novel["fp"].tolist() == ["D", "E"]

    # the ingest appended D and E: the same batch again is all dups
    again = incremental_dedup(rd.from_arrow(phase_b), idx_dir,
                              ingest_tag="t2").to_pandas()
    assert len(again) == 0


def test_shuffle_shards_rank_and_export(tmp_path):
    """Global positions are a permutation matching a single-process
    argsort of the same hash; export writes resumable shard dirs and a
    re-run skips them all."""
    from linkgraph.shuffle import (_id_hash, export_shards,
                                   shuffle_shard_ranks)

    ids = np.arange(333, dtype=np.int64) * 7 % 1000  # non-contiguous
    ids = np.unique(ids)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array([f"t{i}" for i in ids])})
    ranks = shuffle_shard_ranks(rd.from_arrow(t.select(["doc_id"])),
                                shard_size=50).to_pandas()
    assert sorted(ranks["pos"]) == list(range(len(ids)))
    want_order = ids[np.argsort(_id_hash(ids))]
    got_order = ranks.sort_values("pos")["doc_id"].to_numpy()
    assert (got_order == want_order).all()
    assert (ranks["shard"] == ranks["pos"] // 50).all()
    # different seed -> different permutation
    r2 = shuffle_shard_ranks(rd.from_arrow(t.select(["doc_id"])),
                             shard_size=50, seed=99).to_pandas()
    assert (r2.sort_values("pos")["doc_id"].to_numpy()
            != got_order).any()

    out = str(tmp_path / "shards")
    rep = export_shards(rd.from_arrow(t), ranks, out)
    n_shards = ranks["shard"].nunique()
    assert rep["written"] == n_shards
    rep2 = export_shards(rd.from_arrow(t), ranks, out)
    assert rep2["written"] == 0 and rep2["skipped"] == n_shards
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == len(ids)


def test_running_totals_naive_parity():
    from linkgraph.windows import running_user_totals

    rng = np.random.default_rng(9)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n).astype("int64"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 12, n).astype(np.int64)),
        "value": pa.array(np.round(rng.random(n) * 200 - 50, 2))})
    got = running_user_totals(rd.from_arrow(t)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = t.to_pandas()
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["rn"] = df.groupby("user_id").cumcount() + 1
    df["running_value"] = df.groupby("user_id")["cents"].cumsum() / 100.0
    df = df.sort_values("event_id").reset_index(drop=True)
    assert got["rn"].tolist() == df["rn"].tolist()
    assert got["running_value"].tolist() == df["running_value"].tolist()
    assert got["user_id"].tolist() == df["user_id"].tolist()


def test_cms_naive_parity_and_bound():
    """The distributed sketch equals a single-process naive build
    exactly; every estimate upper-bounds the true count; the absent
    probe estimates whatever its cells collide with (>= 0)."""
    from collections import Counter

    from linkgraph.sketch import (CMS_DEPTH, CMS_WIDTH, _cms_cell,
                                  cms_token_counts)
    from linkgraph.text import _batch_word_hashes

    texts = [f"tok{i % 17} tok{i % 5} shared common words here"
             for i in range(50)]
    t = pa.table({"text": pa.array(texts)})
    got = cms_token_counts(rd.from_arrow(t),
                           probes=("shared", "tok3", "absenttok"))

    _, h, _ = _batch_word_hashes(texts)
    cells = np.zeros(CMS_DEPTH * CMS_WIDTH, np.int64)
    for j in range(CMS_DEPTH):
        np.add.at(cells, j * CMS_WIDTH + _cms_cell(h, j, CMS_WIDTH), 1)
    true = Counter(w for txt in texts for w in txt.lower().split())
    for _, r in got.iterrows():
        assert r.true_n == true.get(r.token, 0)
        assert r.est >= r.true_n
    # exact naive-vs-distributed cell parity via one probe's estimate
    from linkgraph.text import _avalanche_poly
    name = "shared"
    codes = np.frombuffer(name.encode("utf-32-le"), dtype=np.uint32)
    ph = _avalanche_poly(codes, np.array([0]), np.array([len(name)]))
    want = min(int(cells[j * CMS_WIDTH + int(_cms_cell(
        ph, j, CMS_WIDTH)[0])]) for j in range(CMS_DEPTH))
    assert int(got.set_index("token").loc["shared", "est"]) == want


def test_component_stats_paths_equal(sf_dir, monkeypatch):
    import linkgraph.pipelines as P

    a = P.q_doc_component_stats(sf_dir)
    monkeypatch.setattr(P, "LABEL_BROADCAST_CAP", -1)
    b = P.q_doc_component_stats(sf_dir)
    pd.testing.assert_frame_equal(a, b)
    # sanity: the vertex counts sum to <= |documents| and edges > 0
    assert a["n_vertices"].iloc[0] > 1 and a["n_edges"].iloc[0] > 0


def test_minhash_cluster_assignment(tmp_path, monkeypatch):
    """minhash_cluster_ids == union-find over minhash_dedup_pairs, one
    row per doc, singletons keep themselves; and the attach path is
    gate-invariant (broadcast vs bucketed deviating-label map)."""
    import linkgraph.dedup as D
    import linkgraph.joins as J

    ds = rd.from_arrow(_docs_table())
    pairs = D.minhash_dedup_pairs(ds, threshold=0.6)
    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    parent = dict()

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(60)}
    assert any(v != k for k, v in want.items())  # dups planted

    got, rep = D.minhash_cluster_ids(
        ds, 60, str(tmp_path / "store"), threshold=0.6,
        fingerprint="t1")
    gpdf = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert gpdf["doc_id"].tolist() == list(range(60))
    assert gpdf["cluster_id"].tolist() == [want[i] for i in range(60)]

    monkeypatch.setattr(J, "ATTACH_BROADCAST_CAP", -1)
    got2, _ = D.minhash_cluster_ids(
        rd.from_arrow(_docs_table()), 60, str(tmp_path / "store2"),
        threshold=0.6, fingerprint="t2")
    g2 = got2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(gpdf, g2)


def test_lag_deltas_naive_parity():
    from linkgraph.windows import lag_deltas

    rng = np.random.default_rng(13)
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n).astype("int64"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 12, n).astype(np.int64)),
        "value": pa.array(np.round(rng.random(n) * 200 - 50, 2))})
    got = lag_deltas(rd.from_arrow(t)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    df = t.to_pandas()
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    df["us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "us", "event_id"])
    df["rn"] = df.groupby("user_id").cumcount() + 1
    df["delta_cents"] = df.groupby("user_id")["cents"].diff()
    df["gap_us"] = df.groupby("user_id")["us"].diff()
    df = df[df["rn"] >= 2].sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == df["event_id"].tolist()
    assert got["rn"].tolist() == df["rn"].tolist()
    assert got["delta_cents"].tolist() == \
        df["delta_cents"].astype(np.int64).tolist()
    assert got["gap_us"].tolist() == df["gap_us"].astype(np.int64).tolist()


def test_cube_events_naive_parity():
    from linkgraph.windows import cube_events

    rng = np.random.default_rng(14)
    n = 500
    t = pa.table({
        "ts": pa.array(rng.integers(0, 20 * 86400 * 10**6, n)
                       .astype("int64"), pa.timestamp("us")),
        "event_type": pa.array(
            np.array(["click", "view", "buy"])[rng.integers(0, 3, n)]),
        "value": pa.array(np.round(rng.random(n) * 100, 2))})
    got = cube_events(rd.from_arrow(t)) \
        .sort_values(["event_type", "day"]).reset_index(drop=True)

    df = t.to_pandas()
    df["day"] = (df["ts"].astype("int64") // (86400 * 10**6)) \
        .astype(np.int64)
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    frames = []
    for keys, lab in ((["event_type", "day"], None),
                      (["event_type"], ("day", -1)),
                      (["day"], ("event_type", "ALL")),
                      ([], None)):
        if keys:
            g = df.groupby(keys).agg(n_events=("cents", "size"),
                                     cents=("cents", "sum")).reset_index()
            if lab:
                g[lab[0]] = lab[1]
        else:
            g = pd.DataFrame({"event_type": ["ALL"], "day": [-1],
                              "n_events": [len(df)],
                              "cents": [df["cents"].sum()]})
        frames.append(g)
    want = pd.concat(frames, ignore_index=True)
    want["total_value"] = want["cents"] / 100.0
    want["day"] = want["day"].astype(np.int64)
    want = want[["event_type", "day", "n_events", "total_value"]] \
        .sort_values(["event_type", "day"]).reset_index(drop=True)
    got["n_events"] = got["n_events"].astype(np.int64)
    want["n_events"] = want["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_pq_train_matches_naive_lloyd_and_topk_invariance():
    import pandas as pd
    from linkgraph.ann import pq_train, pq_topk
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(31)
    n, d = 400, 64
    x = rng.normal(size=(n, d))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [r.astype(np.float32) for r in x]})
    xf = np.stack([np.asarray(v, np.float64)
                   for v in pdf["embedding"]])  # float32-rounded input
    ds = from_pandas_clean(pdf).repartition(5)

    m, k, iters, sub = 4, 8, 2, 16
    got = pq_train(ds, m=m, k=k, iters=iters, sample_n=400, seed=42)

    # naive single-process Lloyd, identical conventions
    want = np.zeros((m, k, sub))
    for s in range(m):
        idx = np.random.default_rng(42 + s).choice(400, k,
                                                   replace=False)
        c = xf[idx, s * sub:(s + 1) * sub].copy()
        xs = xf[:, s * sub:(s + 1) * sub]
        for _ in range(iters):
            a = np.argmin(((xs[:, None, :] - c[None]) ** 2).sum(-1),
                          axis=1)
            for j in range(k):
                if (a == j).any():
                    c[j] = xs[a == j].mean(axis=0)
        want[s] = c
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)

    qa = pq_topk(from_pandas_clean(pdf).repartition(3),
                 query_ids=[0, 1, 2], k_nn=5, sample_n=400)
    qb = pq_topk(from_pandas_clean(pdf).repartition(9),
                 query_ids=[0, 1, 2], k_nn=5, sample_n=400)
    pd.testing.assert_frame_equal(qa, qb)
    assert len(qa) == 15
    assert (qa["query_id"] != qa["neighbor_id"]).all()
    # ADC distances are nonnegative and ranked ascending per query
    assert (qa["adist"] >= 0).all()
    assert (qa.groupby("query_id")["adist"].apply(
        lambda s: (s.diff().dropna() >= 0).all())).all()


def test_knn_graph_edges_matches_naive_hamming_rule():
    import pandas as pd
    from linkgraph.ann import (KNN_GRAPH_K, KNN_GRAPH_PLANES, _normalize,
                               knn_graph_edges, make_hyperplanes)
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(41)
    n, d = 300, 64
    x = rng.normal(size=(n, d)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": list(x)})
    got = knn_graph_edges(from_pandas_clean(pdf).repartition(4)) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    got2 = knn_graph_edges(from_pandas_clean(pdf).repartition(9)) \
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got2)

    m = _normalize(np.stack([np.asarray(v, np.float64) for v in x]))
    pl = make_hyperplanes(d, KNN_GRAPH_PLANES, 42)
    bits = (m @ pl.T) > 0
    code = (bits * (1 << np.arange(KNN_GRAPH_PLANES))).sum(axis=1)
    cos = m @ m.T
    rows = []
    for a in range(n):
        ham = np.array([bin(int(code[a]) ^ int(c)).count("1")
                        for c in code])
        cand = np.flatnonzero((ham <= 1) & (np.arange(n) != a))
        order = np.lexsort((cand, -cos[a, cand]))[:KNN_GRAPH_K]
        for b in cand[order]:
            rows.append((a, int(b)))
    want = pd.DataFrame(rows, columns=["src", "dst"]) \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))


def test_doc_triads_heavy_split_path_equals_default(sf_dir):
    import linkgraph.pipelines as P

    base = P.q_doc_triads(sf_dir)
    old = P.TRIAD_WEDGE_CAP
    P.TRIAD_WEDGE_CAP = 4  # force every nontrivial mid onto the split
    try:
        forced = P.q_doc_triads(sf_dir)
    finally:
        P.TRIAD_WEDGE_CAP = old
    pd.testing.assert_frame_equal(base, forced)


def test_ppjoin_exact_vs_bruteforce(ray_session):
    """ppjoin_pairs (prefix filter) == transparent all-pairs brute force
    — the zero-recall-loss claim, at a lower tau for pair volume."""
    import numpy as np
    import pandas as pd

    from linkgraph.dedup import ppjoin_pairs
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(31)
    base = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "how vexingly quick daft zebras jump"]
    texts = []
    for i in range(60):
        t = base[i % 3]
        # perturb: drop a random word from some docs
        words = t.split()
        if i % 4 == 0 and len(words) > 3:
            del words[int(rng.integers(0, len(words)))]
        texts.append(" ".join(words))
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    tau, k = 0.6, 5
    out = ppjoin_pairs(from_pandas_clean(df), k=k, threshold=tau)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas().sort_values(["a", "b"]) \
            .reset_index(drop=True)

    def shingles(t):
        return (set(t[i:i + k] for i in range(len(t) - k + 1))
                if len(t) >= k else {t})

    want = []
    ss = [shingles(t) for t in texts]
    for a in range(60):
        for b in range(a + 1, 60):
            i = len(ss[a] & ss[b])
            u = len(ss[a] | ss[b])
            if u and i / u >= tau:
                want.append((a, b, i / u))
    want = pd.DataFrame(want, columns=["a", "b", "jaccard"])
    want["a"] = want["a"].astype(np.int64)
    want["b"] = want["b"].astype(np.int64)
    assert len(out) == len(want)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True),
        check_exact=False, rtol=1e-12)


def test_user_streaks_naive_parity(ray_session):
    """user_streaks == a pandas gaps-and-islands reference, including
    length ties (earliest streak wins) and repeated same-day events."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import user_streaks

    rng = np.random.default_rng(7)
    n = 4000
    us = rng.integers(0, 40 * 86400, n) * 1_000_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.Series(us, dtype="int64").astype("datetime64[us]"),
    })
    got = user_streaks(from_pandas_clean(df)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    d = df.assign(day=us // (86400 * 10**6)) \
        .drop_duplicates(["user_id", "day"]) \
        .sort_values(["user_id", "day"])
    grp = d["day"] - d.groupby("user_id").cumcount()
    runs = d.groupby(["user_id", grp]).agg(
        best_streak=("day", "size"),
        streak_start_day=("day", "min")).reset_index(level=1, drop=True)
    want = runs.sort_values(["best_streak", "streak_start_day"],
                            ascending=[False, True]) \
        .groupby(level=0).head(1).reset_index() \
        .sort_values("user_id").reset_index(drop=True) \
        .astype(np.int64)[["user_id", "best_streak", "streak_start_day"]]
    pd.testing.assert_frame_equal(got.astype(np.int64), want)


def test_compact_latest_naive_parity(ray_session):
    """compact_latest == pandas idxmax reference, with duplicate
    timestamps resolved by the event_id tie-break."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import compact_latest

    rng = np.random.default_rng(11)
    n = 3000
    us = rng.integers(0, 10 * 86400, n) * 1_000_000  # coarse: forces ties
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "ts": pd.Series(us, dtype="int64").astype("datetime64[us]"),
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.random(n) * 100, 3),
    })
    got = compact_latest(from_pandas_clean(df)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    want = df.assign(last_ts_us=us) \
        .sort_values(["user_id", "last_ts_us", "event_id"]) \
        .groupby("user_id").tail(1) \
        .rename(columns={"event_type": "last_type",
                         "value": "last_value"}) \
        .sort_values("user_id").reset_index(drop=True)
    want["last_value"] = want["last_value"].round(6)
    pd.testing.assert_frame_equal(
        got, want[["user_id", "last_ts_us", "last_type", "last_value"]]
        .astype({"user_id": np.int64}))


def test_sliding_uniques_naive_parity(ray_session):
    """sliding_uniques == a pandas trailing-window reference, including
    zero-active gaps (omitted rows) and range clipping."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import sliding_uniques

    rng = np.random.default_rng(13)
    n = 2500
    # two activity bursts with a > 7-day silent gap in between
    day = np.where(rng.random(n) < 0.5,
                   rng.integers(0, 8, n), rng.integers(20, 35, n))
    us = day * 86400 * 10**6 + rng.integers(0, 86400, n) * 10**6
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n),
        "ts": pd.Series(us, dtype="int64").astype("datetime64[us]")})
    got = sliding_uniques(from_pandas_clean(df)).reset_index(drop=True)

    d = pd.DataFrame({"u": df["user_id"], "day": day}).drop_duplicates()
    lo, hi = day.min(), day.max()
    rows = []
    for w in range(lo, hi + 1):
        k = d.loc[(d["day"] >= w) & (d["day"] <= w + 6), "u"].nunique()
        if k:
            rows.append((w, k))
    want = pd.DataFrame(rows, columns=["window_start_day", "n_users"]) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_assort_directed_broadcast_vs_join_paths(sf_dir, monkeypatch):
    """q_doc_assort_directed: degree-broadcast plan equals the hash-join
    fallback (exact int64 moments on both paths -> bitwise equality)."""
    import linkgraph.algos.triangles as T

    from linkgraph.pipelines import q_doc_assort_directed

    bc = q_doc_assort_directed(sf_dir)
    monkeypatch.setattr(T, "BROADCAST_DEG_CAP", -1)
    join = q_doc_assort_directed(sf_dir)
    pd.testing.assert_frame_equal(bc, join)


def test_semdedup_matches_naive(ray_session):
    """semdedup_ids == a single-process recompute: same centroids, same
    argmax assignment, same in-cluster keep-smallest-id rule."""
    import numpy as np
    import pandas as pd

    from linkgraph.ann import _normalize, kmeans_centroids
    from linkgraph.dedup import SEMDEDUP_TAU, semdedup_ids
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8))
    # planted near-dups: rows 100.. are tiny perturbations of row i%40
    extra = base[np.arange(25) % 40] + 0.01 * rng.standard_normal((25, 8))
    m = np.vstack([base, extra]).astype(np.float64)
    ids = np.arange(len(m), dtype=np.int64)
    ds = from_pandas_clean(pd.DataFrame(
        {"vec_id": ids, "embedding": list(m)}))
    got = semdedup_ids(ds, n_centroids=4, iters=2, sample_n=40).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    cent = kmeans_centroids(ds, 4, 2, sample_n=40)
    nm = _normalize(m)
    asg = (nm @ cent.T).argmax(axis=1)
    dropped = np.zeros(len(m), dtype=np.int64)
    for c in np.unique(asg):
        members = np.flatnonzero(asg == c)
        for j_pos, j in enumerate(members):
            for i in members[:j_pos]:
                if nm[i] @ nm[j] >= SEMDEDUP_TAU:
                    dropped[j] = 1
                    break
    assert got["c"].tolist() == asg.astype(np.int64).tolist()
    assert got["dropped"].tolist() == dropped.tolist()
    assert dropped.sum() > 0  # the planted dups actually exercised it


def test_rank_degree_corr_gate_paths_equal(ray_session, monkeypatch):
    """doc_rank_degree_corr: broadcast path == forced join path."""
    import linkgraph.algos.triangles as T
    from linkgraph.pipelines import q_doc_rank_degree_corr

    sf = "/root/testdata/sf0.001"
    a = q_doc_rank_degree_corr(sf)
    monkeypatch.setattr(T, "BROADCAST_DEG_CAP", 0)
    b = q_doc_rank_degree_corr(sf)
    assert a["corr"].iloc[0] == b["corr"].iloc[0]
    assert a["n_vertices"].iloc[0] == b["n_vertices"].iloc[0]


def test_threshold_sweep_gate_paths_equal(ray_session, monkeypatch):
    """dedup_threshold_sweep: driver pair frame == forced-distributed
    Dataset tail (DRIVER_PAIR_CAP / BUCKET_DRIVER_CAP / HOT_DRIVER_CAP
    all zeroed)."""
    import pandas as pd

    import linkgraph.dedup as dd
    from linkgraph.pipelines import q_dedup_threshold_sweep

    sf = "/root/testdata/sf0.001"
    a = q_dedup_threshold_sweep(sf)
    for cap in ("DRIVER_PAIR_CAP", "BUCKET_DRIVER_CAP",
                "HOT_DRIVER_CAP"):
        monkeypatch.setattr(dd, cap, 0)
    b = q_dedup_threshold_sweep(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))

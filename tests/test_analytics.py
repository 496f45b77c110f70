"""Naive-parity tests for the events-analytics operators (funnel,
retention, pivot) and the distributed Gram matrix — each compared
against a straightforward single-process pandas/numpy recomputation on
the same synthetic input, plus partition-count invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

US = 1_000_000
DAY_US = 86_400 * US


def _events(n=800, n_users=40, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 30 * DAY_US, n).astype("int64"))
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error"], n)),
        "value": pa.array(np.round(rng.random(n) * 50, 2)),
    })


def _naive_funnel(df, stages, window_s=None):
    reached = None
    entered = None
    counts = []
    for s, st in enumerate(stages):
        rows = df[df.event_type == st]
        if reached is not None:
            t = {}
            for u, grp in rows.groupby("user_id"):
                if u not in reached:
                    continue
                ok = grp[grp.us > reached[u]]
                if window_s is not None:
                    ok = ok[ok.us <= entered[u] + window_s * US]
                if len(ok):
                    t[u] = ok.us.min()
            reached = t
        else:
            reached = rows.groupby("user_id")["us"].min().to_dict()
            entered = dict(reached)
        counts.append(len(reached))
    return counts


def test_funnel_counts_naive_parity():
    from linkgraph.windows import funnel_counts

    tbl = _events()
    df = tbl.to_pandas()
    df["us"] = df["ts"].astype("int64")
    stages = ["view", "click", "purchase"]
    for window_s in (None, 86_400):
        want = _naive_funnel(df, stages, window_s)
        for nparts in (1, 7):
            out = funnel_counts(rd.from_arrow(tbl).repartition(nparts),
                                stages, window_s=window_s)
            assert out["stage"].tolist() == [1, 2, 3]
            assert out["stage_name"].tolist() == stages
            assert out["users"].tolist() == want
    # funnel must be monotone non-increasing and windowed <= unwindowed
    assert want[0] >= want[1] >= want[2]


def test_retention_cohorts_naive_parity():
    from linkgraph.windows import retention_cohorts

    tbl = _events(seed=11)
    df = tbl.to_pandas()
    df["day"] = df["ts"].astype("int64") // DAY_US
    ud = df[["user_id", "day"]].drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min()
    ud = ud.assign(coh=ud.user_id.map(cohort))
    ud["off"] = ud["day"] - ud["coh"]
    want = ud[ud["off"] <= 7].groupby(["coh", "off"]).size() \
        .rename("users").reset_index()
    for nparts in (1, 6):
        out = retention_cohorts(rd.from_arrow(tbl).repartition(nparts),
                                max_offset=7)
        m = out.merge(want, left_on=["cohort_day", "day_offset"],
                      right_on=["coh", "off"], how="outer")
        assert len(m) == len(want) == len(out)
        assert (m["users_x"] == m["users_y"]).all()
    # offset 0 must count every user exactly once across cohorts
    assert out[out.day_offset == 0]["users"].sum() == cohort.size


def test_pivot_user_counts_naive_parity():
    from linkgraph.windows import pivot_user_counts

    tbl = _events(seed=13)
    df = tbl.to_pandas()
    df["cents"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    types = ["view", "click", "purchase", "error"]
    for nparts in (1, 5):
        out = pivot_user_counts(rd.from_arrow(tbl).repartition(nparts),
                                types).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert len(out) == df["user_id"].nunique()
        for t in types:
            sub = df[df.event_type == t].groupby("user_id")
            n = out["user_id"].map(sub.size()).fillna(0).astype(np.int64)
            c = out["user_id"].map(sub["cents"].sum()).fillna(0) \
                .astype(np.int64)
            assert (out[f"n_{t}"].to_numpy() == n.to_numpy()).all()
            assert (out[f"cents_{t}"].to_numpy() == c.to_numpy()).all()


def test_gram_matrix_naive_parity():
    from linkgraph.ann import gram_matrix

    rng = np.random.default_rng(3)
    m = rng.standard_normal((120, 9)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(m),
                                          pa.list_(pa.float32()))})
    g = m.astype(np.float64).T @ m.astype(np.float64)
    for nparts in (1, 4):
        out = gram_matrix(rd.from_arrow(tbl).repartition(nparts))
        assert len(out) == 9 * 10 // 2
        got = np.zeros((9, 9))
        got[out["i"], out["j"]] = out["val"]
        iu, ju = np.triu_indices(9)
        assert np.allclose(got[iu, ju], g[iu, ju], atol=1e-6)
    # empty input short-circuits
    empty = rd.from_arrow(tbl.slice(0, 0))
    out = gram_matrix(empty)
    assert len(out) == 0 and list(out.columns) == ["i", "j", "val"]


def test_substring_dup_pairs_naive_parity():
    """Windows enumerated per the sampled-position rule, pairs and
    distinct-shared-window counts vs a naive substring recomputation
    (strings, not hashes — catches hashing bugs), df-cap honored,
    partition-count invariance."""
    from linkgraph.dedup import substring_dup_pairs

    rng = np.random.default_rng(21)
    W, S, CAP = 12, 5, 4
    base = ["the quick brown fox jumps over the lazy dog " * 3,
            "pack my box with five dozen liquor jugs " * 3,
            "sphinx of black quartz judge my vow " * 3]
    texts = []
    for i in range(30):
        t = base[i % 3]
        if i % 5 == 0:  # exact dup of a base text
            texts.append(t)
        elif i % 5 == 1:  # shared prefix, distinct tail
            texts.append(t[:40] + f" unique tail {i} " + str(rng.random()))
        else:  # unique
            texts.append(f"doc {i} " + " ".join(
                str(rng.integers(0, 10 ** 9)) for _ in range(20)))
    texts.append("short")  # < W: contributes nothing
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts),
                                                 dtype=np.int64)),
                    "text": pa.array(texts)})

    # naive: sampled windows as STRINGS
    from collections import defaultdict
    win2docs = defaultdict(set)
    for d, t in enumerate(texts):
        if len(t) < W:
            continue
        for p in range(0, len(t) - W + 1, S):
            win2docs[t[p:p + W]].add(d)
    pair_n = defaultdict(int)
    for docs in win2docs.values():
        if 2 <= len(docs) <= CAP:
            ds_ = sorted(docs)
            for x in range(len(ds_)):
                for y in range(x + 1, len(ds_)):
                    pair_n[(ds_[x], ds_[y])] += 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(pair_n.items())],
        columns=["a", "b", "n_shared"])
    assert len(want) > 0  # the fixture must actually produce pairs

    for nparts in (1, 6):
        out = substring_dup_pairs(
            rd.from_arrow(tbl).repartition(nparts),
            window=W, stride=S, df_cap=CAP).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        assert out["a"].tolist() == want["a"].tolist()
        assert out["b"].tolist() == want["b"].tolist()
        assert out["n_shared"].tolist() == want["n_shared"].tolist()


def test_kmeans_full_naive_parity():
    """Distributed per-round partial sums == single-process Lloyd on the
    same normalized matrix (same seeded init, tie rule, empty-cluster
    and zero-norm guards); partition-count invariance."""
    from linkgraph.ann import kmeans_full

    rng = np.random.default_rng(17)
    n, d, K, IT = 200, 6, 5, 3
    m = rng.standard_normal((n, d))
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(list(m.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    mm = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    nr = np.linalg.norm(mm, axis=1, keepdims=True)
    nr[nr == 0] = 1.0
    mm = mm / nr
    idx = np.random.default_rng(42).choice(n, K, replace=False)
    cent = mm[idx].copy()
    for _ in range(IT):
        a = np.argmax(mm @ cent.T, axis=1)
        new = cent.copy()
        for c in range(K):
            sel = a == c
            if sel.any():
                mu = mm[sel].sum(axis=0) / sel.sum()
                nn = np.sqrt((mu * mu).sum()) or 1.0
                new[c] = mu / nn
        cent = new
    counts = np.bincount(np.argmax(mm @ cent.T, axis=1), minlength=K)

    for nparts in (1, 5):
        out = kmeans_full(rd.from_arrow(tbl).repartition(nparts),
                          n_centroids=K, iters=IT, sample_n=n) \
            .sort_values(["c", "i"]).reset_index(drop=True)
        assert (out["y"].to_numpy()
                == np.round(cent.reshape(-1), 6)).all()
        assert (out.groupby("c")["n"].first().to_numpy() == counts).all()


def test_four_clique_count_paths_and_brute(monkeypatch):
    """Driver kernel vs brute force on random graphs, then the
    broadcast and coarse-bucket distributed paths forced via the caps —
    all three must agree."""
    from itertools import combinations

    import linkgraph.algos.triangles as T

    rng = np.random.default_rng(9)
    for trial in range(3):
        nv, ne = 40, 220
        s = rng.integers(0, nv, ne)
        d = rng.integers(0, nv, ne)
        edges = list(zip(s.tolist(), d.tolist()))
        # brute force: check all C(nv,4) quadruples
        es = set()
        for a, b in edges:
            if a != b:
                es.add((min(a, b), max(a, b)))
        want = 0
        for quad in combinations(range(nv), 4):
            if all((x, y) in es for x, y in combinations(quad, 2)):
                want += 1
        tbl = pa.table({"src": pa.array(s, pa.int64()),
                        "dst": pa.array(d, pa.int64())})
        ds = rd.from_arrow(tbl).repartition(4)
        got_driver = T.four_clique_count(ds)
        assert got_driver == want
        monkeypatch.setattr(T, "DRIVER_TRI_CAP", -1)
        got_bc = T.four_clique_count(ds)
        assert got_bc == want
        monkeypatch.setattr(T, "EDGE_KEY_BROADCAST_CAP", -1)
        got_bucket = T.four_clique_count(ds)
        assert got_bucket == want
        monkeypatch.undo()


def test_profile_table_naive_parity():
    """Row/null/exact-distinct per column vs pandas, including a column
    WITH nulls (the events table has none) and a float column; exact
    distinct via value-identity buckets, partition invariance."""
    from linkgraph.profile import profile_table

    rng = np.random.default_rng(31)
    n = 500
    s = np.array([f"k{i}" for i in rng.integers(0, 37, n)], dtype=object)
    s[rng.random(n) < 0.15] = None
    f = np.round(rng.random(n) * 9, 2)
    tbl = pa.table({
        "sid": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "name": pa.array(s, pa.string()),
        "score": pa.array(f),
    })
    df = tbl.to_pandas()
    cols = ["sid", "name", "score"]
    for nparts in (1, 6):
        out = profile_table(rd.from_arrow(tbl).repartition(nparts), cols)
        out = out.set_index("col")
        for c in cols:
            assert out.loc[c, "n_rows"] == n
            assert out.loc[c, "n_null"] == df[c].isna().sum()
            assert out.loc[c, "n_distinct"] == df[c].dropna().nunique()


def test_histogram_naive_parity():
    from linkgraph.profile import histogram

    rng = np.random.default_rng(33)
    v = np.round(rng.random(1000) * 100 - 20, 2)  # negatives too
    tbl = pa.table({"value": pa.array(v)})
    want = pd.Series(np.floor(v / 5.0).astype(np.int64)) \
        .value_counts().sort_index()
    for nparts in (1, 4):
        out = histogram(rd.from_arrow(tbl).repartition(nparts),
                        "value", 5.0)
        assert out["bin"].tolist() == want.index.tolist()
        assert out["n"].tolist() == want.tolist()


def test_walk_pmi_naive_parity():
    """Pairs/PMI recomputed naively from the SAME trajectory (the walk
    recurrence itself is covered by test_walks): window alignment,
    self-pair exclusion, unordered canonicalization, exact-integer PMI
    ratio; partition invariance via the walk machinery."""
    from linkgraph.algos.walks import (deterministic_walks,
                                       walk_cooccurrence_pmi)

    rng = np.random.default_rng(41)
    s = rng.integers(0, 60, 300)
    d = rng.integers(0, 60, 300)
    edges = pa.table({"src": pa.array(s, pa.int64()),
                      "dst": pa.array(d, pa.int64())})
    ds = rd.from_arrow(edges)
    seeds, steps, window = list(range(10)), 6, 2

    traj = deterministic_walks(ds, seeds, steps).to_pandas() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    from collections import Counter
    pairs = Counter()
    for _, g in traj.groupby("walk_id"):
        vs = g["v"].tolist()
        for i in range(len(vs)):
            for o in range(1, window + 1):
                if i + o < len(vs) and vs[i] != vs[i + o]:
                    pairs[(min(vs[i], vs[i + o]),
                           max(vs[i], vs[i + o]))] += 1
    uni = Counter(traj["v"].tolist())
    U = len(traj)
    T = sum(pairs.values())

    out = walk_cooccurrence_pmi(ds, seeds, steps, window) \
        .to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    want = sorted(pairs.items())
    assert [(r.u, r.v) for r in out.itertuples()] == [k for k, _ in want]
    assert out["n"].tolist() == [n for _, n in want]
    for r in out.itertuples():
        expect = round(float(np.log(
            (pairs[(r.u, r.v)] * U * U) / (uni[r.u] * uni[r.v] * T))), 6)
        assert r.pmi == expect


def test_zscore_outliers_naive_parity():
    from linkgraph.windows import zscore_outliers

    rng = np.random.default_rng(51)
    n = 600
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        "value": pa.array(np.round(rng.exponential(20, n), 2)),
    })
    df = tbl.to_pandas()
    g = df.groupby("user_id")["value"]
    s, ss, cnt = g.sum(), g.apply(lambda x: (x * x).sum()), g.size()
    mean = s / cnt
    var = (ss - s * s / cnt) / cnt
    std = np.sqrt(var)
    m = df["user_id"].map(mean)
    sd = df["user_id"].map(std)
    nn = df["user_id"].map(cnt)
    keep = (nn >= 2) & (df["user_id"].map(var) > 0) \
        & ((df["value"] - m).abs() > 2.0 * sd)
    want = df[keep].assign(z=((df["value"] - m) / sd).round(6)) \
        .sort_values("event_id")
    assert len(want) > 0
    for nparts in (1, 5):
        out = zscore_outliers(rd.from_arrow(tbl).repartition(nparts),
                              threshold=2.0).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert out["event_id"].tolist() == want["event_id"].tolist()
        assert out["user_id"].tolist() == want["user_id"].tolist()
        assert np.allclose(out["z"], want["z"], atol=2e-6)


def test_negative_samples_paths_and_naive(monkeypatch):
    """Broadcast and forced coarse-bucket membership paths equal, and
    both equal a naive per-source probe replay (hash sequence, edge
    exclusion, first-probe dedupe, first-k cut)."""
    import linkgraph.algos.linkpred as L

    rng = np.random.default_rng(61)
    s = rng.integers(0, 50, 150)
    d = rng.integers(0, 50, 150)
    tbl = pa.table({"src": pa.array(s, pa.int64()),
                    "dst": pa.array(d, pa.int64())})
    ds = rd.from_arrow(tbl).repartition(4)
    K, J = 3, 24

    # naive replay
    es = {(min(a, b), max(a, b)) for a, b in zip(s.tolist(), d.tolist())
          if a != b}
    vs = sorted({v for e in es for v in e})
    nv = max(vs) + 1
    want = []
    for v in vs:
        seen, got = set(), []
        for j in range(J):
            z = np.uint64((v << 32) + j)
            c = int(L._neg_finalize(np.array([z]))[0] % np.uint64(nv))
            if c == v or (min(v, c), max(v, c)) in es or c in seen:
                continue
            seen.add(c)
            got.append(c)
            if len(got) == K:
                break
        for r, c in enumerate(got, 1):
            want.append((v, r, c))

    bc = L.negative_samples(ds, k=K, probes=J).to_pandas() \
        .sort_values(["src", "rnk"]).reset_index(drop=True)
    assert list(map(tuple, bc.to_numpy())) == want
    monkeypatch.setattr(L, "NEG_EDGE_BROADCAST_CAP", -1)
    bk = L.negative_samples(ds, k=K, probes=J).to_pandas() \
        .sort_values(["src", "rnk"]).reset_index(drop=True)
    assert list(map(tuple, bk.to_numpy())) == want


def test_levenshtein_kernel_exact():
    """_lev_bytes vs a classic O(n*m) scalar DP on random byte strings
    (the vectorized prefix-min insertion chain is the tricky part)."""
    from linkgraph.dedup import _lev_bytes

    def slow(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    rng = np.random.default_rng(71)
    for _ in range(40):
        a = bytes(rng.integers(97, 103, rng.integers(0, 30)).tolist())
        b = bytes(rng.integers(97, 103, rng.integers(0, 30)).tolist())
        assert _lev_bytes(a, b) == slow(a, b), (a, b)


def test_edit_dup_pairs_small():
    """Candidates that are true near-dups pass the edit filter; a
    shared-shingle but heavily-edited pair is dropped."""
    from linkgraph.dedup import edit_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [base,
             base[:-10] + " tail edit",            # near-dup of 0
             base.replace("quick", "slow"),         # near-dup of 0
             " ".join(sorted(base.split())),        # same words, reordered
             "completely different content here " * 5]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts),
                                                 dtype=np.int64)),
                    "text": pa.array(texts)})
    out = edit_dup_pairs(rd.from_arrow(tbl), sim_threshold=0.8)
    got = set(zip(out["a"], out["b"]))
    assert (0, 1) in got and (0, 2) in got
    assert all(3 not in p and 4 not in p for p in got)
    assert (out["sim"] >= 0.8).all()


def test_dhash_real_decode_properties():
    """dHash via the REAL BMP decoder: matches a direct closed-form
    recompute (independent of parse_bmp), halves bounded, near-dup
    images (one pixel-channel delta) stay within a few bits."""
    from linkgraph.multimodal import (DHASH_COLS, DHASH_ROWS, DHashStage,
                                      synth_bmp_payload)

    st = DHashStage()
    for mid, w, h in [(3, 11, 9), (7, 8, 8), (20, 23, 19)]:
        hi, lo, ones = st._dhash(synth_bmp_payload(mid, w, h))
        assert 0 <= hi < 2 ** 32 and 0 <= lo < 2 ** 32
        # independent closed-form recompute
        val = 0
        for ty in range(DHASH_ROWS):
            sy = (ty * h) // DHASH_ROWS
            g = []
            for tx in range(DHASH_COLS):
                sx = (tx * w) // DHASH_COLS
                g.append(sum((mid * 131 + sy * 17 + sx * 7 + 3 * c) % 256
                             for c in range(3)))
            for tx in range(DHASH_COLS - 1):
                if g[tx + 1] > g[tx]:
                    val |= 1 << (ty * 8 + tx)
        assert (hi << 32) | lo == val
        assert ones == bin(val).count("1")


def test_global_value_ranks_parity():
    """Full rank vector vs numpy lexsort, with duplicate values (ties
    broken by id) and partition invariance."""
    from linkgraph.quantiles import global_value_ranks

    rng = np.random.default_rng(81)
    n = 2000
    v = np.round(rng.random(n) * 10, 1)  # heavy ties at 1 decimal
    tbl = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                    "value": pa.array(v)})
    order = np.lexsort((np.arange(n), v))
    want = np.empty(n, np.int64)
    want[order] = np.arange(1, n + 1)
    for nparts in (1, 7):
        out = global_value_ranks(
            rd.from_arrow(tbl).repartition(nparts), "value",
            "event_id").to_pandas().sort_values("event_id")
        assert (out["rnk"].to_numpy() == want).all()


def test_markov_transitions_matches_naive_and_partitions():
    import pandas as pd
    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import markov_transitions

    rng = np.random.default_rng(17)
    n = 600
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**6, n), unit="s"),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "event_type": rng.choice(list("abcd"), n)})
    got = markov_transitions(from_pandas_clean(pdf).repartition(5))
    got2 = markov_transitions(from_pandas_clean(pdf).repartition(11))
    pd.testing.assert_frame_equal(got, got2)

    s = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    prev_u = s["user_id"].to_numpy()
    t = s["event_type"].to_numpy(object)
    same = prev_u[1:] == prev_u[:-1]
    naive = pd.DataFrame({"prev_type": t[:-1][same],
                          "event_type": t[1:][same]}) \
        .groupby(["prev_type", "event_type"]).size().rename("n") \
        .reset_index()
    merged = got.merge(naive, on=["prev_type", "event_type"],
                       suffixes=("", "_want"))
    assert len(merged) == len(naive) == len(got)
    assert (merged["n"] == merged["n_want"]).all()
    # rows normalize to ~1 per prev_type
    rs = got.groupby("prev_type")["p"].sum()
    assert np.allclose(rs.to_numpy(), 1.0, atol=1e-4)


def test_count_min_sketch_properties(ray_session):
    """Count-Min invariants: estimate >= true count for every token,
    and partial sketches merge by addition (built per half == built
    whole)."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.sketch import cm_estimate, count_min_sketch
    from linkgraph.text import _batch_word_hashes

    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(200)]
    texts = [" ".join(vocab[j] for j in rng.integers(0, 200, 30))
             for _ in range(80)]
    df = pd.DataFrame({"text": texts})
    regs = count_min_sketch(from_pandas_clean(df))

    # truth
    from collections import Counter
    truth = Counter(w for t in texts for w in t.split())
    toks = sorted(truth)
    wd, h, _ = _batch_word_hashes(toks)
    est = np.empty(len(toks), np.int64)
    est[wd] = cm_estimate(regs, h)
    true = np.array([truth[t] for t in toks])
    assert (est >= true).all()
    assert regs.sum() == sum(truth.values()) * regs.shape[0]

    # mergeability
    r1 = count_min_sketch(from_pandas_clean(df.iloc[:40]))
    r2 = count_min_sketch(from_pandas_clean(df.iloc[40:]))
    assert np.array_equal(r1 + r2, regs)


def test_weekly_churn_matches_naive_and_partitions():
    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import weekly_churn

    rng = np.random.default_rng(23)
    n = 900
    pdf = pd.DataFrame({
        "user_id": rng.integers(0, 35, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 40 * 86_400, n),
                             unit="s").astype("datetime64[us]")})
    got = weekly_churn(from_pandas_clean(pdf).repartition(5))
    got2 = weekly_churn(from_pandas_clean(pdf).repartition(13))
    pd.testing.assert_frame_equal(got, got2)

    day = (pdf["ts"].astype("int64") // (86_400 * 10**6)).to_numpy()
    week = day - (day + 3) % 7
    uw = pd.DataFrame({"u": pdf["user_id"], "w": week}).drop_duplicates()
    for _, r in got.iterrows():
        act = set(uw.loc[uw["w"] == r["week_day"], "u"])
        nxt = set(uw.loc[uw["w"] == r["week_day"] + 7, "u"])
        assert r["active"] == len(act)
        assert r["retained"] == len(act & nxt)
        assert r["churn_rate"] == round(
            (len(act) - len(act & nxt)) / len(act), 6)


def test_daily_smooth_matches_naive_recurrence():
    from linkgraph.io import from_pandas_clean
    from linkgraph.windows import daily_smooth

    rng = np.random.default_rng(29)
    n = 700
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(rng.integers(0, 20 * 86_400, n),
                             unit="s").astype("datetime64[us]"),
        "value": np.round(rng.random(n) * 80, 2)})
    got = daily_smooth(from_pandas_clean(pdf).repartition(6))
    got2 = daily_smooth(from_pandas_clean(pdf).repartition(11))
    pd.testing.assert_frame_equal(got, got2)

    day = (pdf["ts"].astype("int64") // (86_400 * 10**6)).to_numpy()
    cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    d = pd.Series(cents).groupby(day).sum().sort_index()
    s = None
    want = []
    for c in d.to_numpy():
        s = c / 100.0 if s is None else 0.3 * (c / 100.0) + 0.7 * s
        want.append(round(s, 6))
    assert list(got["day"]) == list(d.index)
    assert list(got["cents"]) == list(d.to_numpy())
    assert np.allclose(got["smoothed"].to_numpy(), want, atol=1e-12)


def test_quality_audit_detects_injected_violations(ray_session, tmp_path):
    """Dirty star schema: every audit check must fire with the exact
    violation count."""
    import pandas as pd
    import numpy as np

    from linkgraph.relational import quality_audit

    d = tmp_path / "dirty"
    d.mkdir()
    pd.DataFrame({"c_custkey": [1, 2], "c_name": ["a", "b"],
                  "c_nationkey": [0, 0], "c_acctbal": [1.0, 2.0],
                  "c_mktsegment": ["X", "Y"]}) \
        .to_parquet(d / "customer.parquet")
    pd.DataFrame({"p_partkey": [10], "p_name": ["w"], "p_brand": ["B"],
                  "p_type": ["T"], "p_size": [1],
                  "p_retailprice": [9.0]}).to_parquet(d / "part.parquet")
    pd.DataFrame({"s_suppkey": [5], "s_name": ["s"], "s_nationkey": [0],
                  "s_acctbal": [0.0]}).to_parquet(d / "supplier.parquet")
    # order 101 has lineitems; 102 is childless; order 103 missing from
    # orders but referenced by a lineitem; custkey 99 is an orphan
    pd.DataFrame({"o_orderkey": [101, 102],
                  "o_custkey": [1, 99],
                  "o_orderstatus": ["F", "F"],
                  "o_totalprice": [1.0, 2.0],
                  "o_orderdate": pd.to_datetime(["2024-01-01"] * 2),
                  "o_orderpriority": ["1-URGENT"] * 2}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({
        "l_orderkey": [101, 101, 103],
        "l_partkey": [10, 77, 10],         # 77 orphan part
        "l_suppkey": [5, 5, 66],           # 66 orphan supplier
        "l_linenumber": [1, 1, 2],         # duplicate PK (101, 1)
        "l_quantity": [3.0, -1.0, 2.0],    # one non-positive
        "l_extendedprice": [5.0, 6.0, 7.0],
        "l_discount": [0.0] * 3, "l_tax": [0.0] * 3,
        "l_returnflag": ["N"] * 3, "l_linestatus": ["O"] * 3,
        "l_shipdate": pd.to_datetime(["2024-02-01"] * 3)}) \
        .to_parquet(d / "lineitem.parquet")

    out = quality_audit(str(d))
    got = dict(zip(out["check_name"], out["n_bad"]))
    assert got == {
        "lineitem_duplicate_pk": 1,
        "lineitem_nonpositive_qty_price": 1,
        "lineitem_orphan_orderkey": 1,
        "lineitem_orphan_partkey": 1,
        "lineitem_orphan_suppkey": 1,
        "orders_childless": 1,
        "orders_orphan_custkey": 1,
    }


def test_cohort_revenue_matches_pandas():
    import ray.data as rd

    from linkgraph.windows import cohort_revenue

    rng = np.random.default_rng(5)
    n = 4000
    us = rng.integers(0, 90, n) * 86_400_000_000 \
        + rng.integers(0, 86_400_000_000, n)
    users = rng.integers(0, 300, n)
    vals = np.round(rng.uniform(0, 50, n), 2)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(us.astype("datetime64[us]")),
        "value": pa.array(vals)}))
    got = cohort_revenue(ds, max_offset=8) \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)

    wk = us // (7 * 86_400_000_000)
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"u": users, "wk": wk, "cents": cents})
    df["cw"] = df.groupby("u")["wk"].transform("min")
    df["off"] = df["wk"] - df["cw"]
    df = df[df["off"] <= 8]
    want = df.groupby(["cw", "off"]) \
        .agg(n_events=("cents", "size"),
             revenue_cents=("cents", "sum")).reset_index() \
        .rename(columns={"cw": "cohort_week", "off": "week_offset"}) \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    for c in want.columns:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_vec_matrix_zero_copy_parity():
    import pyarrow as pa

    from linkgraph.ann import vec_matrix

    rng = np.random.default_rng(7)
    m = rng.standard_normal((257, 16)).astype(np.float32)
    arr = pa.array(list(m), pa.list_(pa.float32()))
    t = pa.table({"v": arr})
    # plain / sliced / chunked all equal the object-path conversion
    assert (vec_matrix(t["v"])
            == np.array(t["v"].to_pylist(), dtype=np.float64)).all()
    s = t.slice(13, 101)
    assert (vec_matrix(s["v"])
            == np.array(s["v"].to_pylist(), dtype=np.float64)).all()
    ch = pa.chunked_array([arr.slice(0, 7), arr.slice(7, 50)])
    assert (vec_matrix(ch)
            == np.array(ch.to_pylist(), dtype=np.float64)).all()
    assert vec_matrix(pa.chunked_array([], pa.list_(pa.float32()))).size == 0
    # fixed-size-list layout (Ray re-encodes list columns this way)
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(m[:20].reshape(-1)), 16)
    ft = pa.table({"v": fsl}).slice(3, 9)
    assert (vec_matrix(ft["v"])
            == np.array(ft["v"].to_pylist(), dtype=np.float64)).all()

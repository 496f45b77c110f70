"""Tests: text analysis, dedup family, ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.ann import brute_force_topk, ivf_topk, queries_from_ids
from linkgraph.dedup import (
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dedup,
    exact_jaccard_pairs,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from linkgraph.multimodal import (
    MediaDecodeStage,
    decode_features,
    sample_frames,
    synth_media_table,
)
from linkgraph.text import (
    add_fingerprint,
    add_text_stats,
    add_token_count,
    langid_stage,
    rolling_hashes,
)


@pytest.fixture(scope="module")
def near_dup_docs():
    """Corpus with planted near-duplicates: 9/10 share long prefixes."""
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest looking for food ") * 5
    texts = [base + f"tail {i}" for i in range(3)]            # near-dups
    texts += [f"totally different document number {i} " * 20 for i in range(3)]
    texts += [base.upper() + f"tail {0}"]                     # case variant
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def test_token_count_and_stats():
    t = pa.table({"text": pa.array(["a b  c", " x ", "", "one, two!"])})
    out = add_token_count(t)
    assert out["n_tokens"].to_pylist() == [3, 1, 0, 2]
    st = add_text_stats(t)
    assert st["n_chars2"].to_pylist() == [6, 3, 0, 9]
    assert st["n_punct"].to_pylist() == [0, 0, 0, 2]


def test_fingerprint_whitespace_case_invariant():
    t = pa.table({"text": pa.array(["Hello   World ", "hello world"])})
    out = add_fingerprint(t)
    fps = out["fp"].to_pylist()
    assert fps[0] == fps[1]


def test_langid_deterministic(sf_dir):
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out1 = langid_stage(docs, concurrency=2).to_pandas().sort_values("doc_id")
    out2 = langid_stage(docs, concurrency=2).to_pandas().sort_values("doc_id")
    assert (out1["lang_pred"].to_numpy() == out2["lang_pred"].to_numpy()).all()
    assert set(out1["lang_pred"]) <= {"de", "en", "es", "fr", "zh", "und"}


def test_langid_vectorized_matches_scalar(sf_dir):
    """The vectorized LangId must be prediction-identical to the scalar
    heuristic it replaced (regex word findall + dict membership + CJK
    char scan) — the SQL oracle mirrors that scalar definition."""
    import re

    from linkgraph.text import _LANG_WORDS, LangId

    def scalar_pred(t):
        word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        t = (t or "").lower()
        words = word_re.findall(t)
        n_cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
        best_lang, best = "und", 0.0
        for lang, vocab in sorted(_LANG_WORDS.items()):
            if lang == "zh":
                score = n_cjk / max(1, len(t))
            else:
                score = sum(1 for w in words if w in vocab) / max(1, len(words))
            if score > best:
                best_lang, best = lang, score
        return best_lang

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").head(400)
    extra = ["", "   ", "the of and to in", "der und die das ist",
             "el la de que y", "le la de et les", "这是中文文本",
             "mixed the 中文 der", "1234 5678 !!!", "_under_score_",
             None]
    texts = docs["text"].tolist() + extra
    st = LangId()
    got = st(pa.table({"text": pa.array(texts, pa.string())}))[
        "lang_pred"].to_pylist()
    want = [scalar_pred(t) for t in texts]
    assert got == want


def test_rolling_hashes_properties():
    h1 = rolling_hashes("abcdefgh", 5)
    h2 = rolling_hashes("abcdefgh", 5)
    assert np.array_equal(h1, h2)
    assert len(rolling_hashes("abc", 5)) == 1  # short-text fallback
    # shifted text shares most shingles
    a = rolling_hashes("the quick brown fox jumps", 5)
    b = rolling_hashes("Xthe quick brown fox jumps", 5)
    assert len(np.intersect1d(a, b)) >= len(a) - 1


def test_exact_dedup():
    t = pa.table({"sha256": pa.array(["x", "y", "x", "z", "y"]),
                  "doc_id": pa.array([5, 1, 2, 9, 0], pa.int64())})
    got = sorted(r["doc_id"] for r in exact_dedup(rd.from_arrow(t)).take_all())
    assert got == [0, 2, 9]


def test_batched_shingles_match_per_doc():
    """batch_shingles / batch_shingle_sets / batch_signatures must equal
    the per-doc rolling_hashes / signature() results exactly — the
    batched kernels are pure vectorizations (VERDICT r2 #7)."""
    from linkgraph.dedup import MinHashStage
    from linkgraph.text import batch_shingle_sets, batch_shingles

    texts = ["", "ab", "abcd", "abcde", "hello world hello world",
             "the quick brown fox jumps over the lazy dog",
             "aaaaaaaaaa", "héllø wörld ünïcode 中文文本重复 中文文本重复",
             "x" * 4 + "y", "short", " ", "\t\n"]
    k = 5
    counts, hcat = batch_shingles(texts, k)
    pos = 0
    for t, c in zip(texts, counts):
        want = rolling_hashes(t, k)
        got = hcat[pos:pos + c]
        # positions include duplicates; the SET must match exactly
        assert np.array_equal(np.unique(got), want), t
        pos += c
    d, hh = batch_shingle_sets(texts, k)
    for i, t in enumerate(texts):
        assert np.array_equal(hh[d == i], rolling_hashes(t, k)), t
    st = MinHashStage(num_perm=64, bands=16, k=k)
    batched = st.batch_signatures(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(batched[i], st.signature(t)), t


def test_minhash_finds_planted_near_dups(near_dup_docs):
    pairs = minhash_dedup_pairs(near_dup_docs, threshold=0.6, concurrency=2)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert {(0, 1), (0, 2), (1, 2)} <= found
    assert all(j >= 0.6 for j in pairs["jaccard"])
    # the unrelated docs never pair with the dup cluster
    assert not any((a in {3, 4, 5}) ^ (b in {3, 4, 5}) for a, b in found)


def test_simhash_finds_planted_near_dups(near_dup_docs):
    # 4x16-bit blocking GUARANTEES recall only for hamming <= 3 (pigeonhole);
    # pairs further apart are found only when a block happens to collide.
    pairs = simhash_dedup_pairs(near_dup_docs, max_hamming=6, concurrency=2)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    # doc 6 is the case-variant of doc 0 -> identical simhash (hamming 0)
    assert {(0, 1), (1, 2), (0, 6)} <= found
    assert all(h <= 6 for h in pairs["hamming"])


def test_ngram_jaccard_pairs(near_dup_docs):
    pairs = ngram_jaccard_pairs(near_dup_docs, threshold=0.6)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert {(0, 1), (0, 2), (1, 2)} <= found


def test_exact_jaccard_pairs(near_dup_docs):
    """Inverted-index candidates are deterministic: exact Jaccard values
    must equal a brute-force python recomputation, pair for pair."""
    pairs = exact_jaccard_pairs(near_dup_docs, threshold=0.6)
    found = {(a, b): j for a, b, j in
             pairs[["a", "b", "jaccard"]].to_numpy()}
    assert {(0, 1), (0, 2), (1, 2)} <= set(found)
    texts = {r["doc_id"]: r["text"] for r in near_dup_docs.take_all()}
    for (a, b), j in found.items():
        sa = {texts[a][i:i + 5] for i in range(len(texts[a]) - 4)}
        sb = {texts[b][i:i + 5] for i in range(len(texts[b]) - 4)}
        truth = len(sa & sb) / len(sa | sb)
        assert abs(j - truth) < 1e-12
        assert truth >= 0.6
    # unrelated docs never pair with the dup cluster
    assert not any((a in {3, 4, 5}) ^ (b in {3, 4, 5}) for a, b in found)


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    base[1] = base[0] + rng.standard_normal(16) * 0.01   # planted near-dup
    base[7] = base[6] * 2.0                              # exact direction dup
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float32())),
    }))


def test_embedding_dup_pairs(emb_ds):
    pairs = embedding_dup_pairs(emb_ds, threshold=0.99)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 1) in found and (6, 7) in found
    lsh = embedding_dup_pairs_lsh(emb_ds, threshold=0.99, n_planes=8,
                                  n_tables=8)
    assert (6, 7) in set(map(tuple, lsh[["a", "b"]].to_numpy()))


def test_brute_force_topk_matches_numpy(emb_ds):
    q, qi = queries_from_ids(emb_ds, [0, 6])
    got = brute_force_topk(emb_ds, q, qi, k=3)
    rows = emb_ds.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid, qv in zip(qi, q / np.linalg.norm(q, axis=1, keepdims=True)):
        sims = m @ qv
        sims[ids == qid] = -2
        want = ids[np.lexsort((ids, -sims))][:3]
        have = got[got["query_id"] == qid]["neighbor_id"].to_numpy()
        assert np.array_equal(have, want)


def test_ivf_topk_reasonable_recall(emb_ds):
    q, qi = queries_from_ids(emb_ds, [0, 6])
    exact = brute_force_topk(emb_ds, q, qi, k=3)
    approx = ivf_topk(emb_ds, q, qi, k=3, n_centroids=4, n_probe=2)
    # the planted near-identical neighbor must be found
    a0 = approx[approx["query_id"] == 0]["neighbor_id"].tolist()
    assert 1 in a0
    inter = len(set(map(tuple, exact[["query_id", "neighbor_id"]].values))
                & set(map(tuple, approx[["query_id", "neighbor_id"]].values)))
    assert inter >= 3  # >= half of 6 exact hits


def test_embedding_lsh_recall_vs_exact(sf_dir):
    """Scale-path recall vs the exact all-pairs operator on the real
    embeddings table: every LSH-reported pair must be a true pair
    (verification is exact) and recall must be substantial."""
    import os

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    exact = embedding_dup_pairs(emb, threshold=0.4)
    # collision prob per table for cos=0.4 is (1 - acos(.4)/pi)^planes
    # ~= 0.632^4 = 0.16; 16 tables -> expected recall ~0.94
    approx = embedding_dup_pairs_lsh(emb, threshold=0.4, n_planes=4,
                                     n_tables=16)
    exact_set = set(map(tuple, exact[["a", "b"]].to_numpy()))
    approx_set = set(map(tuple, approx[["a", "b"]].to_numpy()))
    assert approx_set <= exact_set          # precision 1.0 by construction
    if exact_set:
        assert len(approx_set) / len(exact_set) >= 0.7


def test_ivf_pruned_scan(emb_ds):
    """The IVF index must physically prune: with n_probe < n_centroids the
    query path reads strictly fewer rows than the corpus."""
    q, qi = queries_from_ids(emb_ds, [0])
    stats = {}
    out = ivf_topk(emb_ds, q, qi, k=3, n_centroids=4, n_probe=1,
                   stats=stats)
    assert stats["rows_scanned"] < stats["rows_total"] == 40
    assert len(out) <= 3
    assert 1 in out[out["query_id"] == 0]["neighbor_id"].tolist()


def test_lsh_topk_pruned_scan_and_recall(emb_ds):
    """Sign-LSH ANN: physically pruned scan (hamming<=1 probe reads a
    strict subset) and the planted near-identical neighbor is found."""
    from linkgraph.ann import lsh_topk

    q, qi = queries_from_ids(emb_ds, [0, 6])
    stats = {}
    approx = lsh_topk(emb_ds, q, qi, k=3, n_planes=4, stats=stats)
    assert stats["rows_scanned"] < stats["rows_total"] == 40
    assert 1 in approx[approx["query_id"] == 0]["neighbor_id"].tolist()
    exact = brute_force_topk(emb_ds, q, qi, k=3)
    inter = len(set(map(tuple, exact[["query_id", "neighbor_id"]].values))
                & set(map(tuple, approx[["query_id", "neighbor_id"]].values)))
    assert inter >= 3


def test_lsh_topk_empty_probe_buckets(emb_ds):
    """External query vectors whose own + hamming-1 probe buckets are all
    empty return an empty top-k frame instead of crashing on
    read_parquet([]) (ADVICE r2).  The corpus is collapsed onto one
    direction so its vectors share one bucket; the query is the exact
    negation, whose code is the bitwise complement — hamming distance
    n_planes (4) > 1 from every occupied bucket."""
    from linkgraph.ann import lsh_topk

    rows = emb_ds.take_all()
    v = np.array(rows[0]["embedding"], dtype=np.float64)
    one_dir = rd.from_arrow(pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        "embedding": pa.array([v.tolist()] * len(rows),
                              pa.list_(pa.float64())),
    }))
    out = lsh_topk(one_dir, np.array([-v]), np.array([999]), k=3,
                   n_planes=4)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "neighbor_id", "rnk", "cosine"]


def test_multimodal_decode_plumbing():
    t = synth_media_table(100)
    ds = rd.from_arrow(t)
    out = decode_features(ds, concurrency=2, batch_size=32).to_pandas()
    assert len(out) == 100
    assert len(out["features"].iloc[0]) == MediaDecodeStage.FEAT_DIM
    # deterministic across runs
    out2 = decode_features(rd.from_arrow(t), concurrency=2).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    assert np.array_equal(a, b)
    frames = sample_frames(ds, fps=2.0).to_pandas()
    n_video = (t["kind"].to_pandas() == "video").sum()
    assert frames["media_id"].nunique() == n_video
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(use_stub=False)._decode(b"x", "image")


def test_media_from_documents_derivation():
    """media_from_documents must match its SQL-oracle contract exactly:
    kind cycles with doc_id, payload is the utf-8 text, duration is
    (bytes*131) % 60000."""
    from linkgraph.multimodal import media_from_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha", "bravo charlie", "", "d", "e" * 500]),
    }))
    m = media_from_documents(docs).to_pandas().sort_values("media_id")
    assert list(m["kind"]) == ["image", "audio", "video",
                               "image", "audio"]
    assert m["payload"].iloc[0] == b"alpha"
    assert list(m["duration_ms"]) == [(len(t) * 131) % 60000
                                      for t in ["alpha", "bravo charlie",
                                                "", "d", "e" * 500]]
    # frame sampling covers the zero-duration video row with one frame
    frames = sample_frames(media_from_documents(docs), fps=1.0).to_pandas()
    assert list(frames["media_id"]) == [2] and list(frames["frame_ms"]) == [0]


def test_add_repetition_stats_vs_naive():
    from collections import Counter

    from linkgraph.text import add_repetition_stats

    texts = ["the cat sat on the mat the cat", "solo",
             "", "a a a a", "x y", "one two three two one two"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = add_repetition_stats(t).to_pandas()
    for i, txt in enumerate(texts):
        words = txt.lower().split()
        n = len(words)
        row = got[got["doc_id"] == i].iloc[0]
        assert row["n_words"] == n
        if n:
            wc = Counter(words)
            assert row["dup_word_frac"] == round(1.0 - len(wc) / n, 6)
            assert row["top_word_frac"] == round(max(wc.values()) / n, 6)
        else:
            assert row["dup_word_frac"] == 0.0
        if n > 1:
            bc = Counter(zip(words, words[1:]))
            assert row["top_bigram_frac"] == round(
                max(bc.values()) / (n - 1), 6)
        else:
            assert row["top_bigram_frac"] == 0.0


def test_tfidf_top_terms_vs_naive():
    import math
    from collections import Counter

    from linkgraph.text import tfidf_top_terms

    texts = ["apple banana apple cherry", "banana cherry cherry date",
             "apple date", "unique words only here"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = tfidf_top_terms(rd.from_arrow(t), k=2).to_pandas()
    # naive oracle
    docs = [t.lower().split() for t in texts]
    df = Counter(w for d in docs for w in set(d))
    N = len(docs)
    for i, d in enumerate(docs):
        wc = Counter(d)
        scores = sorted(((c / len(d)) * math.log(N / df[w]), w)
                        for w, c in wc.items())
        want = sorted((w for s, w in
                       sorted(scores, key=lambda x: (-x[0], x[1]))[:2]))
        mine = sorted(got[got["doc_id"] == i]["term"].tolist())
        assert mine == want, (i, mine, want)


def test_add_quality_formula():
    """quality = 0.4*len + 0.4*stopword + 0.2*(1-punct) vs a naive
    re-implementation; keep flag thresholds the rounded score."""
    import re

    from linkgraph.text import add_quality

    texts = ["the cat sat on the mat, and it was good.",
             "x",
             "",
             " ".join(["the"] * 100),
             "no stop words here!!! ;;; ...",
             "a b c d e f g h i j " * 10]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = add_quality(t).to_pandas()
    stop_re = re.compile(r"\b(the|a|of|and|to|in|is|it|that|was|for)\b")
    for i, txt in enumerate(texts):
        n_tok = len(re.findall(r"\S+", txt))
        n_stop = len(stop_re.findall(txt.lower()))
        n_punct = len(re.findall(r"[.,;:!?]", txt))
        den = max(n_tok, 1)
        q = round(0.4 * min(1.0, n_tok / 50.0)
                  + 0.4 * min(1.0, 5.0 * n_stop / den)
                  + 0.2 * (1.0 - min(1.0, n_punct / den)), 6)
        assert got["quality"][i] == q, (i, txt)
        assert bool(got["keep"][i]) == (q >= 0.5)


def test_label_centroids_matches_numpy():
    import ray.data as rd

    from linkgraph.ann import label_centroids

    rng = np.random.default_rng(5)
    n, dim = 200, 8
    vecs = rng.standard_normal((n, dim))
    labels = rng.integers(0, 4, n)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n)),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32(), dim)),
    })).repartition(5)
    got = label_centroids(ds).to_pandas() \
        .sort_values(["label", "i"]).reset_index(drop=True)
    m = vecs.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for lab in range(4):
        sel = m[labels == lab]
        want = np.round(sel.mean(axis=0), 6)
        rows = got[got["label"] == lab].sort_values("i")
        assert np.allclose(rows["c"].to_numpy(), want, atol=2e-6)
        assert (rows["n"] == sel.shape[0]).all()


def test_kmv_distinct_sketch():
    """KMV sketch: exact below k distinct, ~10-20% accurate above, and
    partition-count invariant (order statistics merge losslessly)."""
    from linkgraph.io import from_pandas_clean
    from linkgraph.sketch import kmv_distinct_tokens

    # small corpus: fewer distinct tokens than k -> exact count
    small = from_pandas_clean(pd.DataFrame(
        {"text": ["a b c", "b c d", "d e"]}))
    out = kmv_distinct_tokens(small, k=256)
    assert out["est_distinct"].iloc[0] == 5.0

    # large distinct set: estimate within 20% of truth
    n = 20000
    texts = [" ".join(f"tok{j}" for j in range(i * 20, (i + 1) * 20))
             for i in range(n // 20)]
    big = from_pandas_clean(pd.DataFrame({"text": texts}))
    est = kmv_distinct_tokens(big.repartition(6), k=256)
    assert abs(est["est_distinct"].iloc[0] - n) / n < 0.2
    est2 = kmv_distinct_tokens(big.repartition(2), k=256)
    pd.testing.assert_frame_equal(est, est2)


def test_semantic_dedup_transitive_clusters():
    """Planted chain A~B~C (A!~C) must collapse to one representative —
    the transitive property the CC composition provides."""
    import tempfile

    from linkgraph.dedup import semantic_dedup_ids
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    # chain: v1 close to v0, v2 close to v1 (but farther from v0)
    v0 = base
    v1 = base + 0.12 * rng.standard_normal(16)
    v2 = v1 + 0.12 * rng.standard_normal(16)
    others = rng.standard_normal((5, 16))
    mat = np.vstack([v0, v1, v2, others]).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(mat))),
        "embedding": pa.array(list(mat), pa.list_(pa.float32(), 16)),
    })).repartition(3)
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        kept, rep = semantic_dedup_ids(ds, len(mat), d + "/store",
                                       threshold=0.97)
        ids = sorted(kept.to_pandas()["vec_id"].tolist())
        # the chain keeps only vec 0; isolated vectors keep themselves
        assert 0 in ids and 1 not in ids and 2 not in ids
        assert set(range(3, 8)) <= set(ids)
        # no-pair corpus: everything kept, no engine run
        kept2, rep2 = semantic_dedup_ids(ds, len(mat), d + "/store2",
                                         threshold=1.01)
        assert sorted(kept2.to_pandas()["vec_id"].tolist()) \
            == list(range(8)) and rep2 is None


def test_wav_decoder_real_roundtrip():
    """The audio lane is a REAL RIFF/WAVE parser: decode(encode(x))
    recovers exact sample statistics, and malformed payloads raise."""
    import numpy as np

    from linkgraph.multimodal import WavDecodeStage, synth_wav_payload

    st = WavDecodeStage()
    payload = synth_wav_payload(7, 1200)
    sr, n, dur, peak, rms = st._decode(payload)
    assert (sr, n, dur) == (8000, 1200, 150)
    i = np.arange(1200, dtype=np.int64)
    s = (8 * 2654435761 + i * 97003) % 65536 - 32768
    assert peak == int(np.abs(s).max())
    assert rms == float(np.sqrt((s * s).sum() / 1200))
    # stdlib wave agrees the payload is a valid file
    import io
    import wave

    w = wave.open(io.BytesIO(payload))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth(),
            w.getnframes()) == (8000, 1, 2, 1200)
    with pytest.raises(ValueError):
        st._decode(b"JUNKJUNKJUNKJUNK")
    # truncated fmt chunk: documented ValueError, not struct.error
    import struct

    trunc = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
             + b"fmt " + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated fmt"):
        st._decode(trunc)


def test_decode_audio_stage(sf_dir):
    import os

    from linkgraph.multimodal import audio_from_documents, decode_audio

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    out = decode_audio(audio_from_documents(docs), concurrency=2) \
        .to_pandas()
    assert len(out) == docs.count()
    assert (out["sample_rate"] == 8000).all()
    assert (out["rms"] > 0).all()


def test_bmp_decoder_real_roundtrip():
    """The image lane is a REAL 24-bit BMP parser: decode(encode(x))
    recovers exact channel means (including padded row widths) and
    malformed payloads raise."""
    import numpy as np

    from linkgraph.multimodal import BmpDecodeStage, synth_bmp_payload

    st = BmpDecodeStage()
    for mid, w, h in ((3, 9, 5), (11, 8, 12), (0, 23, 19)):
        got = st._decode(synth_bmp_payload(mid, w, h))
        y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                              indexing="ij")
        px = (mid * 131 + y * 17 + x * 7 + c * 3) % 256
        n = w * h
        want = (w, h, float(px[:, :, 0].sum() / n),
                float(px[:, :, 1].sum() / n), float(px[:, :, 2].sum() / n))
        assert got == want, (mid, w, h)
    with pytest.raises(ValueError):
        st._decode(b"NOPE" * 20)


def test_y4m_demuxer_real_roundtrip():
    """The video lane is a REAL YUV4MPEG2 demuxer: frame walk, C420
    plane sizes, sampling stride, exact luma means; malformed payloads
    raise."""
    import numpy as np

    from linkgraph.multimodal import Y4mFrameStage, synth_y4m_payload

    st = Y4mFrameStage(sample_every=2)
    w, h, nf = 10, 8, 5
    payload = synth_y4m_payload(4, w, h, nf)
    gw, gh, frames = st._frames(payload)
    assert (gw, gh) == (w, h)
    assert [f for f, _, _ in frames] == [0, 2, 4]
    for f, s, n in frames:
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        want = int(((4 * 131 + f * 29 + y * 17 + x * 7) % 256).sum())
        assert (s, n) == (want, w * h)
    with pytest.raises(ValueError):
        st._frames(b"YUV4MPEG2 W4 H4 F25:1 C420\nNOTFRAME" + b"\x00" * 64)


def test_bpe_token_count_hand_values():
    import pyarrow as pa

    from linkgraph.text import add_bpe_token_count

    t = pa.table({"text": ["Hello, world! It's 2026",
                           "don't you'll we've",
                           "", "  spaced  out  "]})
    got = add_bpe_token_count(t)["n_bpe_tokens"].to_pylist()
    # Hello|,| world|!| It|'s| 2026 = 7; don|'t| you|'ll| we|'ve = 6
    assert got == [7, 6, 0, 5]


def test_bmp_resize_nearest_neighbor_exact():
    """The resize lane gathers generator pixels at (ty*h//T, tx*w//T):
    stats of the resized image match the closed form, and resizing an
    already-target-sized image is the identity (means equal decode's)."""
    import numpy as np

    from linkgraph.multimodal import (BmpDecodeStage, BmpResizeStage,
                                      synth_bmp_payload)

    T = 8
    st = BmpResizeStage(T)
    for mid, w, h in ((3, 9, 5), (11, 8, 12), (0, 23, 19)):
        got = st._resize_stats(synth_bmp_payload(mid, w, h))
        ty, tx, c = np.meshgrid(np.arange(T), np.arange(T), np.arange(3),
                                indexing="ij")
        sy, sx = (ty * h) // T, (tx * w) // T
        px = (mid * 131 + sy * 17 + sx * 7 + c * 3) % 256
        want = tuple(float(px[:, :, i].sum() / (T * T)) for i in range(3))
        assert got == want, (mid, w, h)
    # identity case: an 8x8 source resized to 8x8 == plain decode means
    pay = synth_bmp_payload(7, 8, 8)
    assert st._resize_stats(pay) == BmpDecodeStage()._decode(pay)[2:]
    with pytest.raises(ValueError):
        st._resize_stats(b"NOPE" * 20)


def test_chunk_documents_naive_parity():
    import numpy as np
    import pyarrow as pa

    from linkgraph.text import chunk_documents

    texts = ["w" + " w".join(str(i) for i in range(n)) if n else ""
             for n in (0, 1, 5, 32, 33, 40, 80, 100)]
    texts = [" ".join(f"t{i}" for i in range(n))
             for n in (0, 1, 5, 32, 33, 40, 80, 100)]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = chunk_documents(t, 32, 8).to_pandas()
    c, s = 32, 24
    rows = []
    for i, txt in enumerate(texts):
        w = txt.split()
        if not w:
            continue
        n = len(w)
        nk = 1 + int(np.ceil(max(n - c, 0) / s))
        for k in range(nk):
            piece = w[k * s: k * s + c]
            rows.append((i, k, " ".join(piece), len(piece)))
    assert len(out) == len(rows)
    for (i, k, piece, ln), (_, r) in zip(rows, out.iterrows()):
        assert (r.doc_id, r.chunk_id, r.chunk, r.n_words) \
            == (i, k, piece, ln)


def test_spectral_stage_matches_naive_dft():
    """SpectralStage (rfft) agrees with the explicit cos/sin DFT sums
    the SQL oracle computes, at round-3, for several clip lengths."""
    import numpy as np
    import pyarrow as pa

    from linkgraph.multimodal import (
        SPECTRAL_BINS, SpectralStage, synth_wav_payload,
    )

    st = SpectralStage()
    ids = [3, 11, 42]
    lens = [400, 777, 1199]
    batch = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_wav_payload(m, n)
                             for m, n in zip(ids, lens)], pa.binary())})
    got = st(batch).to_pandas()
    for r, (m, n) in enumerate(zip(ids, lens)):
        i = np.arange(n, dtype=np.int64)
        v = ((m + 1) * 2654435761 + i * 97003) % 65536 - 32768
        assert got.loc[r, "n_samples"] == n
        assert got.loc[r, "dc"] == round(v.sum() / n, 3)
        for k in SPECTRAL_BINS:
            th = 2 * np.pi * k * i / n
            re = float((v * np.cos(th)).sum())
            im = float((v * np.sin(th)).sum())
            want = round(np.sqrt(re * re + im * im) / n, 3)
            assert abs(got.loc[r, f"m{k}"] - want) < 2e-3, (k, n)


def test_pmi_phrases_matches_naive():
    import pandas as pd
    from collections import Counter
    from linkgraph.io import from_pandas_clean
    from linkgraph.text import pmi_phrases

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(200):
        toks = list(rng.choice(vocab, rng.integers(3, 25)))
        # plant a strong collocation
        if rng.random() < 0.5:
            toks += ["deep", "learning"]
        texts.append(" ".join(toks))
    pdf = pd.DataFrame({"text": texts})
    got = pmi_phrases(from_pandas_clean(pdf).repartition(6),
                      min_count=3, n_cand=100, k=10)

    uni, big = Counter(), Counter()
    t_tot = b_tot = 0
    for s in texts:
        ws = [w for w in s.split() if w]
        uni.update(ws)
        t_tot += len(ws)
        big.update(zip(ws[:-1], ws[1:]))
        b_tot += max(len(ws) - 1, 0)
    cand = sorted(((n, f"{a} {b}") for (a, b), n in big.items()
                   if n >= 3), key=lambda x: (-x[0], x[1]))[:100]
    rows = []
    for n, bg in cand:
        a, b = bg.split(" ")
        pmi = np.log((n / b_tot) /
                     ((uni[a] / t_tot) * (uni[b] / t_tot)))
        rows.append((bg, n, round(pmi, 6)))
    want = pd.DataFrame(rows, columns=["bigram", "n", "pmi"]) \
        .sort_values(["pmi", "bigram"], ascending=[False, True],
                     kind="mergesort").head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n": np.int64}), want.astype({"n": np.int64}),
        check_dtype=False, atol=1e-9)
    assert "deep learning" in got["bigram"].tolist()


def test_paragraph_dedup_naive_parity(ray_session):
    """dedup.paragraph_dedup == a transparent per-row reimplementation
    (dict-based first-occurrence over (doc_id, chunk_id) order)."""
    import numpy as np
    import pandas as pd

    from linkgraph.dedup import paragraph_dedup
    from linkgraph.io import from_pandas_clean

    rng = np.random.default_rng(21)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = []
    for d in range(40):
        n = int(rng.integers(0, 40))
        docs.append(" ".join(vocab[i] for i in rng.integers(0, 5, n)))
    # force exact repeated paragraphs across docs
    docs[7] = docs[3]
    docs[11] = docs[3] + " " + docs[5]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": docs})

    out = (paragraph_dedup(from_pandas_clean(df), par_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # naive oracle
    seen = set()
    rows = []
    for d, text in enumerate(docs):
        words = [w for w in text.split() if w]
        kept = []
        for k in range(0, max(1, len(words)), 4) if words else []:
            par = " ".join(words[k:k + 4])
            if par not in seen:
                seen.add(par)
                kept.append(par)
        if kept:
            rows.append((d, " ".join(kept), len(kept)))
    want = pd.DataFrame(rows, columns=["doc_id", "clean_text", "n_kept"])
    want["doc_id"] = want["doc_id"].astype(np.int64)
    want["n_kept"] = want["n_kept"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)


def test_zipf_fit_matches_naive():
    from linkgraph.io import from_pandas_clean
    from linkgraph.pipelines import TOP_ZIPF_K

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(300)]
    # Zipfian draws so ranks are meaningful
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, 60, p=p)) for _ in range(80)]
    pdf = pd.DataFrame({"text": texts})

    import linkgraph.pipelines as P

    def fake_read(path, columns=None):
        return from_pandas_clean(pdf[columns or ["text"]]).repartition(5)

    orig = P.read_parquet_clean
    P.read_parquet_clean = fake_read
    try:
        got = P.q_text_zipf("/nonexistent")
    finally:
        P.read_parquet_clean = orig

    from collections import Counter
    cnt = Counter(" ".join(texts).split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_ZIPF_K]
    n = np.array([c for _, c in top], np.float64)
    x, y = np.log(np.arange(1, len(n) + 1)), np.log(n)
    k = float(len(n))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert got["k"][0] == len(n)
    assert abs(got["slope"][0] - slope) < 1e-6
    assert abs(got["intercept"][0] - (sy - slope * sx) / k) < 1e-6
    assert got["slope"][0] < -0.5  # Zipfian input has a negative slope


def test_sentence_stats_matches_naive():
    import re

    from linkgraph.io import from_pandas_clean
    import linkgraph.pipelines as P

    pdf = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["One. Two two! Three three three?",
                 "No terminator here",
                 "!!!",  # only empties -> dropped
                 "  Spaced out .  tail",
                 "a.b.c",
                 "Multi!! bang?? mix.!"]})

    def fake_read(path, columns=None):
        return from_pandas_clean(pdf[columns]).repartition(3)

    orig = P.read_parquet_clean
    P.read_parquet_clean = fake_read
    try:
        got = P.q_text_sentences("/nonexistent").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    finally:
        P.read_parquet_clean = orig

    rows = []
    for _, r in pdf.iterrows():
        segs = [s.strip(" \t\n\r") for s in re.split(r"[.!?]+", r["text"])]
        segs = [s for s in segs if s]
        if segs:
            rows.append((r["doc_id"], len(segs),
                         round(sum(len(s) for s in segs) / len(segs), 6)))
    want = pd.DataFrame(rows, columns=["doc_id", "n_sentences", "avg_len"])
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_sentences"]) == list(want["n_sentences"])
    assert np.allclose(got["avg_len"], want["avg_len"], atol=1e-9)


def test_resample_stage_boxcar_exact():
    """Decimate-by-M chunk sums are exact int64 and keep the trailing
    partial chunk; the empty clip short-circuits."""
    import numpy as np

    from linkgraph.multimodal import ResampleStage, synth_wav_payload

    st = ResampleStage(4)
    n_in, n_out, energy = st._decimate(synth_wav_payload(7, 1202))
    assert (n_in, n_out) == (1202, 301)   # 300 full + 1 partial chunk
    i = np.arange(1202, dtype=np.int64)
    s = (8 * 2654435761 + i * 97003) % 65536 - 32768
    want = sum(int(s[j:j + 4].sum()) ** 2 for j in range(0, 1202, 4))
    assert energy == want


def test_sobel_stage_matches_naive():
    """Slice-arithmetic Sobel equals the per-pixel naive convolution."""
    import numpy as np

    from linkgraph.multimodal import SobelStage, parse_bmp, \
        synth_bmp_payload

    g = parse_bmp(synth_bmp_payload(9, 13, 11)).astype(np.int64) \
        .sum(axis=2)
    n_int, energy = SobelStage._conv(g)
    assert n_int == (13 - 2) * (11 - 2)
    want = 0
    for y in range(1, 10):
        for x in range(1, 12):
            gx = gy = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    gx += dx * (2 - abs(dy)) * g[y + dy, x + dx]
                    gy += dy * (2 - abs(dx)) * g[y + dy, x + dx]
            want += gx * gx + gy * gy
    assert energy == want
    # degenerate image with no interior short-circuits
    tiny = parse_bmp(synth_bmp_payload(3, 2, 2)).astype(np.int64) \
        .sum(axis=2)
    assert SobelStage._conv(tiny) == (0, 0)


def test_bpe_merges_naive_parity(sf_dir):
    """q_text_bpe_merges equals a sequential reference implementing the
    same separator-string replace semantics."""
    from collections import Counter

    import duckdb

    from linkgraph.pipelines import BPE_MERGE_ROUNDS, BPE_SEP, \
        q_text_bpe_merges

    got = q_text_bpe_merges(sf_dir)
    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").df()["text"]
    wc = Counter(w for t in texts for w in t.split() if w)
    spaced = {BPE_SEP + BPE_SEP.join(w) + BPE_SEP: n
              for w, n in wc.items()}
    merges = []
    for step in range(1, BPE_MERGE_ROUNDS + 1):
        stats = Counter()
        for s, n in spaced.items():
            syms = [x for x in s.split(BPE_SEP) if x != ""]
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += n
        if not stats:
            break
        (a, b), t = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, t))
        pat = BPE_SEP + a + BPE_SEP + b + BPE_SEP
        rep = BPE_SEP + a + b + BPE_SEP
        nxt = {}
        for s, n in spaced.items():
            nxt[s.replace(pat, rep)] = nxt.get(s.replace(pat, rep), 0) + n
        spaced = nxt
    import pandas as pd

    want = pd.DataFrame(merges, columns=["step", "a", "b", "n"])
    assert got["step"].tolist() == want["step"].tolist()
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_batch_winnow_matches_naive():
    """Vectorized winnowing == per-doc reference (warm-up-window variant,
    rightmost tie-break), across tie-heavy, short, and empty docs."""
    import numpy as np

    from linkgraph.text import batch_shingles, batch_winnow

    def naive(texts, k, w):
        counts, hcat = batch_shingles(texts, k)
        starts = np.cumsum(counts) - counts
        out = []
        for i, c in enumerate(counts):
            h = hcat[starts[i]:starts[i] + c]
            sel = set()
            for e in range(c):
                lo = max(0, e - w + 1)
                win = h[lo:e + 1]
                m = win.min()
                sel.add(lo + max(j for j in range(len(win))
                                 if win[j] == m))
            out.extend((i, p, h[p]) for p in sorted(sel))
        return out

    rng = np.random.default_rng(0)
    texts = ["", "ab", "hello world this is a test of winnowing " * 3,
             "a" * 29,  # all-equal hashes: every window ties
             "the quick brown fox jumps over the lazy dog",
             "".join(rng.choice(list("abcd"), 200)), "xy"]
    for k, w in [(5, 4), (20, 8), (3, 2), (8, 8)]:
        d, p, h = batch_winnow(texts, k, w)
        assert list(zip(d.tolist(), p.tolist(), h.tolist())) \
            == naive(texts, k, w), (k, w)
    d, p, h = batch_winnow([], 5, 4)
    assert len(d) == len(p) == len(h) == 0


def test_vocab_growth_naive_parity(ray_session):
    """vocab_growth == a pandas first-occurrence reference over texts
    whose vocabulary actually grows across doc_id deciles."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.text import vocab_growth

    rng = np.random.default_rng(3)
    n_docs = 200
    texts = []
    for i in range(n_docs):
        # vocab pool grows with doc index -> multiple non-empty deciles
        pool = [f"w{j}" for j in range(4 + i * 3)]
        texts.append(" ".join(rng.choice(pool, 30)) + "  \t extra")
    ids = rng.permutation(n_docs).astype(np.int64) * 7 + 3  # sparse ids
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    got = vocab_growth(from_pandas_clean(df)) \
        .reset_index(drop=True)

    rows = [(d, w) for d, t in zip(ids, texts) for w in t.split()]
    f = pd.DataFrame(rows, columns=["d", "w"]).groupby("w")["d"].min()
    lo, hi = ids.min(), ids.max()
    dec = np.minimum((f.to_numpy() - lo) * 10 // (hi - lo + 1), 9) + 1
    cnt = np.bincount(dec, minlength=11)[1:]
    keep = cnt > 0
    want = pd.DataFrame({
        "decile": np.arange(1, 11, dtype=np.int64)[keep],
        "new_tokens": cnt[keep].astype(np.int64),
        "cum_vocab": np.cumsum(cnt)[keep].astype(np.int64)})
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_audio_zcr_loudness_vad_stages_direct():
    """The three newest audio lanes against direct numpy on the synth
    samples (stage __call__ is Ray-free)."""
    import pyarrow as pa

    from linkgraph.multimodal import (ENERGY_WIN, VAD_THRESH,
                                      LoudnessStage, VadStage,
                                      ZeroCrossStage, parse_wav,
                                      synth_wav_payload)

    payloads = [synth_wav_payload(3, 700), synth_wav_payload(9, 421)]
    batch = pa.table({"media_id": pa.array([3, 9], pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})

    z = ZeroCrossStage()(batch)
    ld = LoudnessStage()(batch)
    vd = VadStage()(batch)
    for i, p in enumerate(payloads):
        _, s = parse_wav(p)
        nonneg = s >= 0
        assert z["zero_crossings"][i].as_py() == int(
            (nonneg[1:] != nonneg[:-1]).sum())
        assert z["abs_amplitude"][i].as_py() == int(np.abs(s).sum())
        assert ld["energy"][i].as_py() == int((s * s).sum())
        assert ld["peak"][i].as_py() == int(np.abs(s).max())
        nw = len(s) // ENERGY_WIN
        e = (s[:nw * ENERGY_WIN].astype(np.int64) ** 2) \
            .reshape(nw, ENERGY_WIN).sum(axis=1)
        voiced = e > VAD_THRESH
        assert vd["n_windows"][i].as_py() == nw
        assert vd["n_voiced"][i].as_py() == int(voiced.sum())
        # longest run by brute scan
        best = cur = 0
        for flag in voiced:
            cur = cur + 1 if flag else 0
            best = max(best, cur)
        assert vd["longest_voiced"][i].as_py() == best


def test_feature_hash_signed_counts_naive():
    import ray.data as rd

    from linkgraph.text import _batch_word_hashes, feature_hash_vectors

    texts = ["the cat sat on the mat", "cat CAT cat", "", "mat the"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts)}))
    got = feature_hash_vectors(ds, dims=16).to_pandas() \
        .sort_values(["doc_id", "dim"]).reset_index(drop=True)
    # naive per-doc recomputation from the same hash primitive
    rows = []
    for i, t in enumerate(texts):
        _, h, _ = _batch_word_hashes([t])
        acc = {}
        for hh in h:
            d = int(hh % np.uint64(16))
            s = 1 - 2 * int((hh >> np.uint64(32)) & np.uint64(1))
            acc[d] = acc.get(d, 0) + s
        for d, v in sorted(acc.items()):
            if v != 0:
                rows.append((i, d, v))
    want = pd.DataFrame(rows, columns=["doc_id", "dim", "val"]) \
        .astype(np.int64).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want)
    # signed sums: duplicate words accumulate (doc 1 has 3x 'cat')
    assert set(got.loc[got["doc_id"] == 1, "val"].abs()) == {3}


def test_audio_snr_stage_direct():
    """SnrStage against direct numpy on the synth samples."""
    import math

    import pyarrow as pa

    from linkgraph.multimodal import (ENERGY_WIN, VAD_THRESH, SnrStage,
                                      parse_wav, synth_wav_payload)

    payloads = [synth_wav_payload(3, 700), synth_wav_payload(9, 421)]
    batch = pa.table({"media_id": pa.array([3, 9], pa.int64()),
                      "payload": pa.array(payloads, pa.binary())})
    out = SnrStage()(batch)
    for i, p in enumerate(payloads):
        _, s = parse_wav(p)
        nw = len(s) // ENERGY_WIN
        e = (s[:nw * ENERGY_WIN].astype(np.int64) ** 2) \
            .reshape(nw, ENERGY_WIN).sum(axis=1)
        voiced = e > VAD_THRESH
        nv, nu = int(voiced.sum()), int((~voiced).sum())
        ev, eu = int(e[voiced].sum()), int(e[~voiced].sum())
        assert out["n_voiced"][i].as_py() == nv
        assert out["n_unvoiced"][i].as_py() == nu
        assert out["voiced_energy"][i].as_py() == ev
        assert out["unvoiced_energy"][i].as_py() == eu
        if nv and nu and eu:
            want = round(10.0 * math.log10((ev / nv) / (eu / nu)), 6)
        else:
            want = 0.0
        assert out["snr_db"][i].as_py() == want


def test_url_canonicalize_chain():
    """Unit cases for the 5-step normalization chain (web.canonicalize)."""
    import pandas as pd

    from linkgraph.web import canonicalize

    cases = {
        "HTTPS://WWW.Site3.EXample:443/cat1/item9#sec2":
            "https://www.site3.example/cat1/item9",
        "https://www.site9.example/a/b/?utm_source=feed&id=7":
            "https://www.site9.example/a/b/?id=7",
        "https://h.example/p?id=7&utm_campaign=x":
            "https://h.example/p?id=7",
        "https://h.example/p?utm_source=feed":
            "https://h.example/p",
        "https://h.example/p/": "https://h.example/p",
        "https://h.example/p//": "https://h.example/p",
        "http://MIXED.Case/Path": "http://mixed.case/Path",
    }
    got = canonicalize(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_url_mirrors_share_canonical(ray_session):
    """Docs congruent mod 400 are mirrors: same canonical, different raw
    presentation; url_dup_groups finds exactly those groups."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.web import canonicalize, url_dup_groups, urls_from_batch

    ids = np.arange(950)
    canon = canonicalize(urls_from_batch(ids))
    want = pd.DataFrame({"canon": canon, "doc_id": ids}) \
        .groupby("canon")["doc_id"].agg(n_dups="size", keep_id="min") \
        .reset_index()
    want = want[want["n_dups"] >= 2].reset_index(drop=True)
    ds = from_pandas_clean(pd.DataFrame({"doc_id": ids}))
    got = url_dup_groups(ds).to_pandas() \
        .sort_values("canon").reset_index(drop=True)
    want = want.sort_values("canon").reset_index(drop=True)
    for c in ("canon", "n_dups", "keep_id"):
        assert got[c].tolist() == want[c].tolist()
    # mirrors are d, d+400, d+800 within range: group sizes 2 or 3
    assert set(want["n_dups"].unique()) == {2, 3}


def test_classifier_scores_naive_parity(ray_session):
    """classifier_scores == a per-doc Python recompute (Counter over
    whitespace words, same hash chain via _batch_word_hashes)."""
    import numpy as np
    import pandas as pd

    from linkgraph.io import from_pandas_clean
    from linkgraph.text import (CLF_DIMS, _batch_word_hashes,
                                classifier_scores, clf_weights)

    texts = ["the key agg row scan", "slow fast table value part hash",
             "", "a a a b", "unique words only here",
             "the the the the the the"]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = from_pandas_clean(pd.DataFrame({"doc_id": ids, "text": texts}))
    got = classifier_scores(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    w = clf_weights(CLF_DIMS)
    for i, t in enumerate(texts):
        wd, h, _ = _batch_word_hashes([t])
        s = 0.0
        if len(h):
            dim = (h % np.uint64(CLF_DIMS)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(32)) & np.uint64(1)) \
                .astype(np.int64)
            val = np.zeros(CLF_DIMS)
            np.add.at(val, dim, sign.astype(np.float64))
            s = float(val @ w) / max(len(h), 1)
        assert abs(got.loc[i, "score"] - round(s, 6)) <= 1e-12
        assert got.loc[i, "keep"] == (1 if s >= 0 else 0)
        assert abs(got.loc[i, "prob"]
                   - round(1 / (1 + np.exp(-s)), 6)) <= 1e-12


def test_unigram_tokenizer_partition_invariant():
    """unigram_train is partition-count invariant and its Viterbi
    segmentations cover each word exactly (engine invariant,
    tests/test_modes.py rule)."""
    from linkgraph.io import from_pandas_clean
    from linkgraph.tokenizer import _viterbi, unigram_train

    texts = ["the cat sat on the mat", "the cats sat", "a mat on a cat",
             "concatenate the catalogue", "on and on and on"] * 6
    df = pd.DataFrame({"text": texts})
    r1 = unigram_train(from_pandas_clean(df).repartition(1))
    r8 = unigram_train(from_pandas_clean(df).repartition(8))
    pd.testing.assert_frame_equal(r1.reset_index(drop=True),
                                  r8.reset_index(drop=True))
    assert set(r1.columns) == {"round", "rnk", "piece", "n"}
    assert r1["round"].nunique() == 3
    # top pieces are real substrings with positive counts
    assert (r1["n"] > 0).all()

    # DP coverage: pieces rebuild the word, under any vocab with chars
    import math
    lp = {c: math.log(0.1) for c in "catalogue the snd"}
    lp["cat"] = math.log(0.2)
    for w in ["concatenate", "catalogue", "cats"]:
        assert "".join(_viterbi(w, lp, 4)) == w


def test_png_decoder_real_roundtrip_all_filters():
    """Pure-Python PNG codec: synth -> parse returns the generator
    pixels exactly under every scanline filter (None/Sub/Up/Average/
    Paeth), including the sequential Average/Paeth defilter paths."""
    from linkgraph.multimodal import parse_png, synth_png_payload

    for mid, w, h in [(0, 8, 8), (7, 13, 11), (123, 20, 18), (5, 1, 1)]:
        for filters in [None, [3] * h, [4] * h,
                        [(i * 2 + 1) % 5 for i in range(h)]]:
            img = parse_png(synth_png_payload(mid, w, h, filters))
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(3), indexing="ij")
            want = ((mid * 151 + y * 19 + x * 11 + c * 5) % 256) \
                .astype(np.uint8)
            assert img.shape == (h, w, 3)
            assert (img == want).all()


def test_png_decoder_rejects_bad_payloads():
    from linkgraph.multimodal import parse_png, synth_png_payload

    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"BM123456")
    # truncated IDAT stream: zlib or length validation must fail
    good = synth_png_payload(3, 6, 5)
    with pytest.raises(Exception):
        parse_png(good[:40] + good[48:])


def test_media_decode_stage_real_png_path():
    """MediaDecodeStage(use_stub=False) decodes PNG payloads for real
    and still raises the documented seam for other codecs."""
    from linkgraph.multimodal import MediaDecodeStage, synth_png_payload

    st = MediaDecodeStage(use_stub=False)
    f = st._decode(synth_png_payload(4, 10, 9), "image")
    assert f.shape == (MediaDecodeStage.FEAT_DIM,)
    assert abs(f[0] - 10 / 4096.0) < 1e-7
    assert abs(f[1] - 9 / 4096.0) < 1e-7
    assert (f[2:5] > 0).all() and (f[5:] == 0).all()
    with pytest.raises(NotImplementedError):
        st._decode(b"\xff\xd8\xff\xe0 jpeg-ish", "image")

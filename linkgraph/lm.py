"""Bigram language-model quality scoring (training-data op, no
reference analog — design per the task brief; the CCNet/Dolma-style
"perplexity under a corpus LM" filter signal).

Model: word bigrams with add-one smoothing over the corpus itself —
P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V), V = corpus
distinct-word count.  Per doc: avg_logprob = mean ln P over its n-1
bigrams, ppl = exp(-avg_logprob).  Words are the lowercased
whitespace-split convention shared with SimHash/decontam; keys are the
shared 64-bit word hashes (string-keyed SQL twin, 2^-64 note).

Scale shape: counting is map-side partial value_counts -> ONE coarse
hash-bucket shuffle (never a per-key hash aggregate).  Scoring
broadcasts the (hash, count) model arrays once (ray.put) when the model
fits MODEL_BROADCAST_CAP rows; above the cap it joins doc bigrams
against the count tables bucket-wise and re-aggregates per doc — the
same gated twin pattern as dedup/tfidf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .algos.triangles import n_buckets_for
from .decontam import _FNV
from .text import _batch_word_hashes

# (hash, count) model rows that ride the broadcast path: 16 bytes/row,
# 160MB at the cap — same order as the other broadcast gates
MODEL_BROADCAST_CAP = 10_000_000


def _doc_unigrams_bigrams(texts: list):
    """(doc_idx, uni_hash), (doc_idx, prev_hash, bigram_key) per batch;
    bigram_key = prev*FNV + cur (the n=2 fold from decontam)."""
    word_doc, h, _ = _batch_word_hashes(texts)
    if len(h) == 0:
        z64 = np.empty(0, np.uint64)
        zi = np.empty(0, np.int64)
        return (zi, z64), (zi, z64, z64)
    valid = word_doc[:-1] == word_doc[1:] if len(h) > 1 else \
        np.empty(0, bool)
    idx = np.flatnonzero(valid)
    with np.errstate(over="ignore"):
        bg = h[idx] * _FNV + h[idx + 1]
    return (word_doc, h), (word_doc[idx], h[idx], bg)


def _partial_counts(key: np.ndarray, nb: int, col: str) -> pa.Table:
    u, c = np.unique(key, return_counts=True)
    return pa.table({col: pa.array(u, pa.uint64()),
                     "cnt": pa.array(c.astype(np.int64)),
                     "kb": pa.array((u % np.uint64(nb)).astype(np.int64))})


def _merged_counts(ds, col: str):
    """Coarse-bucket merge of per-batch count partials -> (col, cnt)."""
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g[col].to_numpy(np.uint64), return_inverse=True)
        c = np.bincount(inv, weights=g["cnt"].to_numpy(np.float64),
                        minlength=len(u)).astype(np.int64)
        return pd.DataFrame({col: u, "cnt": c})

    return ds.groupby("kb").map_groups(merge, batch_format="pandas")


def bigram_model(docs_ds, col: str = "text"):
    """(uni_ds (w, cnt), bi_ds (bg, cnt)) count tables, one coarse
    shuffle each; docs_ds must be materialized by the caller (it is
    consumed twice)."""
    nb_hint = max(64, docs_ds.count())

    def uni_partial(b: pa.Table) -> pa.Table:
        (_, h), _ = _doc_unigrams_bigrams(b[col].to_pylist())
        return _partial_counts(h, n_buckets_for(nb_hint * 64), "w")

    def bi_partial(b: pa.Table) -> pa.Table:
        _, (_, _, bg) = _doc_unigrams_bigrams(b[col].to_pylist())
        return _partial_counts(bg, n_buckets_for(nb_hint * 64), "bg")

    uni = _merged_counts(
        docs_ds.map_batches(uni_partial, batch_format="pyarrow"), "w")
    bi = _merged_counts(
        docs_ds.map_batches(bi_partial, batch_format="pyarrow"), "bg")
    return uni, bi


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray,
            probe: np.ndarray) -> np.ndarray:
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), np.int64)
    p = np.minimum(np.searchsorted(sorted_keys, probe),
                   len(sorted_keys) - 1)
    out = counts[p].copy()
    out[sorted_keys[p] != probe] = 0
    return out


def perplexity_scores(docs_ds, id_col: str = "doc_id",
                      col: str = "text"):
    """(doc_id, n_bigrams, avg_logprob, ppl) per document under the
    corpus's own add-one bigram LM; rounds to 6 (float sums associate
    differently across plans — same round-6 convention as the corpus
    quality metrics)."""
    import ray

    docs_ds = docs_ds.materialize()
    uni, bi = bigram_model(docs_ds, col)
    uni = uni.materialize()
    bi = bi.materialize()
    v_total = uni.count()

    if bi.count() + v_total <= MODEL_BROADCAST_CAP:
        def arrs(ds, k):
            pdf = ds.to_pandas()
            key = pdf[k].to_numpy(np.uint64)
            cnt = pdf["cnt"].to_numpy(np.int64)
            o = np.argsort(key)
            return key[o], cnt[o]

        uref = ray.put(arrs(uni, "w"))
        bref = ray.put(arrs(bi, "bg"))

        def score(b: pa.Table) -> pa.Table:
            uk, uc = ray.get(uref)
            bk, bc = ray.get(bref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            _, (bd, prev, bg) = _doc_unigrams_bigrams(b[col].to_pylist())
            cu = _lookup(uk, uc, prev)
            cb = _lookup(bk, bc, bg)
            lp = np.log((cb + 1.0) / (cu + float(v_total)))
            n = np.bincount(bd, minlength=len(ids))
            s = np.bincount(bd, weights=lp, minlength=len(ids))
            with np.errstate(divide="ignore", invalid="ignore"):
                avg = np.where(n > 0, s / np.maximum(n, 1), 0.0)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n.astype(np.int64)),
                "avg_logprob": pa.array(np.round(avg, 6)),
                "ppl": pa.array(np.round(
                    np.where(n > 0, np.exp(-avg), 0.0), 6))})

        return docs_ds.map_batches(score, batch_format="pyarrow")

    # distributed twin: doc bigrams join count tables bucket-wise, then
    # one coarse per-doc re-aggregate
    nb = n_buckets_for(max(64, docs_ds.count()) * 64)

    def doc_bigrams(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, (bd, prev, bg) = _doc_unigrams_bigrams(b[col].to_pylist())
        return pa.table({
            "doc_id": pa.array(ids[bd], pa.int64()),
            "prev": pa.array(prev, pa.uint64()),
            "bg": pa.array(bg, pa.uint64()),
            # route by the bigram key; the unigram side routes by w and
            # the prev-count is re-fetched in a SECOND pass keyed prev
            "kb": pa.array((bg % np.uint64(nb)).astype(np.int64))})

    dbg = docs_ds.map_batches(doc_bigrams,
                              batch_format="pyarrow").materialize()

    def tag(ds, k):
        def f(b: pa.Table) -> pa.Table:
            key = b[k].to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": pa.array(np.full(len(key), -1, np.int64)),
                "prev": pa.array(np.zeros(len(key), np.uint64)),
                "bg": pa.array(key, pa.uint64()),
                "cnt": pa.array(b["cnt"].to_numpy(zero_copy_only=False)
                                .astype(np.int64)),
                "kb": pa.array((key % np.uint64(nb)).astype(np.int64))})
        return ds.map_batches(f, batch_format="pyarrow")

    def join_counts(probe_ds, counts_ds, key_col):
        def f(b: pa.Table) -> pa.Table:
            t = b.append_column(
                "cnt", pa.array(np.zeros(b.num_rows, np.int64)))
            return t.select(["doc_id", "prev", "bg", "cnt", "kb"])

        def bucket(g: pd.DataFrame) -> pd.DataFrame:
            is_c = g["doc_id"].to_numpy() < 0
            keys = g.loc[is_c, "bg"].to_numpy(np.uint64)
            cnts = g.loc[is_c, "cnt"].to_numpy(np.int64)
            o = np.argsort(keys)
            probe = g.loc[~is_c]
            got = _lookup(keys[o], cnts[o],
                          probe["bg"].to_numpy(np.uint64))
            return pd.DataFrame({
                "doc_id": probe["doc_id"].to_numpy(np.int64),
                "prev": probe["prev"].to_numpy(np.uint64),
                "c": got})

        both = probe_ds.map_batches(f, batch_format="pyarrow") \
            .union(counts_ds)
        return both.groupby("kb").map_groups(bucket,
                                             batch_format="pandas") \
            .map_batches(lambda b: b, batch_format="pyarrow")

    # pass 1: bigram counts; pass 2: unigram (prev) counts, rekeyed
    with_cb = join_counts(dbg, tag(bi, "bg"), "bg").materialize()

    def rekey(b: pa.Table) -> pa.Table:
        prev = b["prev"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "prev": b["prev"],
                         "bg": pa.array(prev, pa.uint64()),  # probe = prev
                         "cb": b["c"],
                         "kb": pa.array((prev % np.uint64(nb))
                                        .astype(np.int64))})

    def bucket2(g: pd.DataFrame) -> pd.DataFrame:
        is_c = g["doc_id"].to_numpy() < 0
        keys = g.loc[is_c, "bg"].to_numpy(np.uint64)
        cnts = g.loc[is_c, "cb"].to_numpy(np.int64)  # cnt rides cb here
        o = np.argsort(keys)
        probe = g.loc[~is_c]
        cu = _lookup(keys[o], cnts[o], probe["bg"].to_numpy(np.uint64))
        cb = probe["cb"].to_numpy(np.int64)
        lp = np.log((cb + 1.0) / (cu + float(v_total)))
        return pd.DataFrame({"doc_id": probe["doc_id"].to_numpy(np.int64),
                             "lp": lp})

    def pad_counts(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"], "prev": b["prev"],
                         "bg": b["bg"],
                         "cb": b["cnt"],  # unigram count rides the cb slot
                         "kb": b["kb"]})

    both2 = with_cb.map_batches(rekey, batch_format="pyarrow") \
        .union(tag(uni, "w").map_batches(pad_counts,
                                         batch_format="pyarrow"))
    lps = both2.groupby("kb").map_groups(bucket2, batch_format="pandas") \
        .map_batches(lambda b: b, batch_format="pyarrow")

    # per-doc aggregate: order lp DETERMINISTICALLY (by value) before
    # summing so the distributed sum is plan-independent, then round
    ndb = n_buckets_for(max(64, docs_ds.count()))

    def dtag(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("db", pa.array((ids % ndb)
                                              .astype(np.int64)))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        lp = g["lp"].to_numpy(np.float64)
        order = np.lexsort((lp, ids))
        ids, lp = ids[order], lp[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                ids[1:] != ids[:-1]]))
        n = np.diff(np.concatenate([starts, [len(ids)]]))
        s = np.add.reduceat(lp, starts) if len(lp) else np.empty(0)
        avg = s / n
        return pd.DataFrame({"doc_id": ids[starts],
                             "n_bigrams": n.astype(np.int64),
                             "avg_logprob": np.round(avg, 6),
                             "ppl": np.round(np.exp(-avg), 6)})

    scored = lps.map_batches(dtag, batch_format="pyarrow") \
        .groupby("db").map_groups(agg, batch_format="pandas")

    # docs with < 2 words have no bigrams: emit zero rows for them
    def zeros(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, (bd, _, _) = _doc_unigrams_bigrams(b[col].to_pylist())
        has = np.zeros(len(ids), bool)
        has[np.unique(bd)] = True
        z = ids[~has]
        return pa.table({"doc_id": pa.array(z, pa.int64()),
                         "n_bigrams": pa.array(np.zeros(len(z), np.int64)),
                         "avg_logprob": pa.array(np.zeros(len(z))),
                         "ppl": pa.array(np.zeros(len(z)))})

    return scored.union(docs_ds.map_batches(zeros, batch_format="pyarrow")
                        .map_batches(lambda b: b, batch_format="pyarrow"))

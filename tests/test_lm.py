"""Bigram-LM perplexity scoring: naive-Python parity, zero-bigram
docs, and broadcast vs distributed-join path equality (float sums
associate differently across plans, so value comparison is at 1e-9;
counts are exact)."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _mk_docs():
    texts = ["the cat sat on the mat",
             "the cat ran",
             "a dog sat on a log",
             "single",
             "",
             "the dog sat on the mat and the cat sat too"]
    return pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                        pa.int64()),
                     "text": pa.array(texts)})


def _naive_scores(texts):
    words = [t.lower().split() for t in texts]
    uni = Counter(w for ws in words for w in ws)
    bi = Counter((a, b) for ws in words for a, b in zip(ws, ws[1:]))
    v = len(uni)
    out = {}
    for i, ws in enumerate(words):
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            out[i] = (0, 0.0, 0.0)
            continue
        lps = [math.log((bi[g] + 1.0) / (uni[g[0]] + float(v)))
               for g in bgs]
        avg = sum(lps) / len(lps)
        out[i] = (len(bgs), avg, math.exp(-avg))
    return out


def _norm(x):
    if not isinstance(x, pd.DataFrame):
        x = x.to_pandas()
    return x.sort_values("doc_id").reset_index(drop=True)


def test_perplexity_naive_parity(monkeypatch):
    import linkgraph.lm as LM

    t = _mk_docs()
    got = _norm(LM.perplexity_scores(rd.from_arrow(t)))
    want = _naive_scores(t["text"].to_pylist())
    assert got["doc_id"].tolist() == sorted(want)
    for _, r in got.iterrows():
        n, avg, ppl = want[int(r.doc_id)]
        assert int(r.n_bigrams) == n
        assert abs(r.avg_logprob - round(avg, 6)) < 2e-6
        assert abs(r.ppl - round(ppl, 6)) < 2e-5

    monkeypatch.setattr(LM, "MODEL_BROADCAST_CAP", -1)
    dist = _norm(LM.perplexity_scores(rd.from_arrow(t)))
    assert got["doc_id"].tolist() == dist["doc_id"].tolist()
    assert got["n_bigrams"].tolist() == dist["n_bigrams"].tolist()
    np.testing.assert_allclose(got["avg_logprob"], dist["avg_logprob"],
                               atol=2e-6)
    np.testing.assert_allclose(got["ppl"], dist["ppl"], atol=2e-5)


def test_perplexity_partition_invariance():
    import linkgraph.lm as LM

    t = _mk_docs()
    a = _norm(LM.perplexity_scores(rd.from_arrow(t)))
    b = _norm(LM.perplexity_scores(rd.from_arrow(t).repartition(4)))
    pd.testing.assert_frame_equal(a, b)

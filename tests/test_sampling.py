"""quota_sample: determinism, quota enforcement, and driver-path ==
distributed-path equality (the size-gated plan invariant)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from linkgraph.io import from_pandas_clean
from linkgraph.sampling import quota_sample


def _docs(n=200, groups=7, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "k": [f"g{g}" for g in rng.integers(0, groups, n)],
    })


def _oracle(pdf, n):
    pdf = pdf.copy()
    pdf["_pri"] = [hashlib.sha256(str(v).encode()).hexdigest()
                   for v in pdf["doc_id"]]
    pdf = pdf.sort_values(["_pri", "doc_id"], kind="mergesort")
    out = pdf.groupby("k", sort=False).head(n)[["doc_id", "k"]]
    return out.sort_values(["k", "doc_id"]).reset_index(drop=True)


def test_quota_sample_matches_oracle_and_caps():
    pdf = _docs()
    ds = from_pandas_clean(pdf).repartition(5)
    got = quota_sample(ds, key="k", id_col="doc_id", n=4)
    want = _oracle(pdf, 4)
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("k").size() <= 4).all()


def test_quota_sample_driver_equals_distributed():
    pdf = _docs(n=300, groups=5)
    ds = from_pandas_clean(pdf).repartition(6)
    a = quota_sample(ds, key="k", id_col="doc_id", n=3)
    b = quota_sample(from_pandas_clean(pdf).repartition(6),
                     key="k", id_col="doc_id", n=3, driver_cap=0)
    pd.testing.assert_frame_equal(a, b)


def test_quota_sample_partition_invariance():
    pdf = _docs(n=150, groups=4, seed=9)
    outs = [quota_sample(from_pandas_clean(pdf).repartition(p),
                         key="k", id_col="doc_id", n=2)
            for p in (1, 3, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


# ------------------------------------------------------- stratified sample

def test_stratified_sample_membership_rule_and_determinism():
    from linkgraph.sampling import _HASH_SPACE, stratified_sample

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "doc_id": np.arange(1000, dtype=np.int64),
        "lang": rng.choice(["en", "de", "zh", "fr"], 1000),
    })
    rates = {"en": 0.5, "de": 0.25, "zh": 0.1}
    got = stratified_sample(from_pandas_clean(pdf).repartition(4),
                            id_col="doc_id", strata_col="lang",
                            rates=rates, default_rate=0.3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def keep(row):
        thr = int(rates.get(row["lang"], 0.3) * _HASH_SPACE)
        hv = int(hashlib.sha256(
            f"strat:{row['doc_id']}".encode()).hexdigest()[:8], 16)
        return hv < thr

    want = pdf[pdf.apply(keep, axis=1)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # partition invariance (membership is row-local)
    again = stratified_sample(from_pandas_clean(pdf).repartition(9),
                              id_col="doc_id", strata_col="lang",
                              rates=rates, default_rate=0.3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)
    # kept fraction tracks the rate per stratum (uniform hash)
    fr = got.groupby("lang").size() / pdf.groupby("lang").size()
    assert abs(fr["en"] - 0.5) < 0.15 and abs(fr["zh"] - 0.1) < 0.1

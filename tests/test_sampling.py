"""quota_sample: determinism, quota enforcement, and driver-path ==
distributed-path equality (the size-gated plan invariant)."""

import hashlib

import numpy as np
import pyarrow as pa
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


# ---------------------------------------------------------------------------
# weighted_sample / mixture_weights / hll_distinct_tokens (round-3 adds)
# ---------------------------------------------------------------------------

def _wdocs(n=300, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_chars": rng.integers(0, 4000, n).astype(np.int64),
    })


def test_weighted_sample_matches_naive_and_is_partition_invariant():
    from linkgraph.sampling import weighted_sample, _ws_priorities

    pdf = _wdocs()
    k = 25
    pri = _ws_priorities(pdf["doc_id"].tolist(),
                         np.maximum(pdf["n_chars"].to_numpy(np.float64),
                                    1.0), "ws")
    want = pdf.assign(pri=pri).sort_values(
        ["pri", "doc_id"], ascending=[False, True],
        kind="mergesort").head(k)
    a = weighted_sample(from_pandas_clean(pdf).repartition(4),
                        id_col="doc_id", weight_col="n_chars", k=k)
    b = weighted_sample(from_pandas_clean(pdf).repartition(11),
                        id_col="doc_id", weight_col="n_chars", k=k)
    pd.testing.assert_frame_equal(a, b)
    assert a["doc_id"].tolist() == want["doc_id"].tolist()
    # higher-weight rows must be over-represented vs a uniform pick:
    # the average sampled weight exceeds the population average
    assert a["w"].mean() > pdf["n_chars"].clip(lower=1).mean()


def test_mixture_weights_sums_to_one_and_matches_naive():
    from linkgraph.sampling import mixture_weights, MIX_ALPHA

    rng = np.random.default_rng(5)
    srcs = [f"s{g}" for g in rng.integers(0, 6, 200)]
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 40)))
             for _ in range(200)]
    pdf = pd.DataFrame({"source": srcs, "text": texts})
    got = mixture_weights(from_pandas_clean(pdf).repartition(7),
                          group_col="source")
    ntok = pdf.assign(n=[len(t.split()) for t in texts]) \
              .groupby("source")["n"].sum()
    scaled = np.power(ntok.sort_index().to_numpy(np.float64), MIX_ALPHA)
    want = np.round(scaled / scaled.sum(), 6)
    assert got["source"].tolist() == sorted(ntok.index)
    np.testing.assert_allclose(got["weight"].to_numpy(), want, atol=2e-6)
    assert abs(got["weight"].sum() - 1.0) < 1e-4
    assert (got["n_tokens"].to_numpy() ==
            ntok.sort_index().to_numpy()).all()


def test_hll_estimate_accuracy_and_partition_invariance():
    from linkgraph.sketch import hll_distinct_tokens

    rng = np.random.default_rng(7)
    # ~900 distinct tokens, repeated across docs
    vocab = [f"tok{i}" for i in range(900)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(300)]
    pdf = pd.DataFrame({"text": texts})
    a = hll_distinct_tokens(from_pandas_clean(pdf).repartition(3))
    b = hll_distinct_tokens(from_pandas_clean(pdf).repartition(13))
    pd.testing.assert_frame_equal(a, b)   # registers max-merge exactly
    exact = len({t for s in texts for t in s.split()})
    est = float(a["estimate"].iloc[0])
    # HLL with m=64 has ~13% relative error; allow 3 sigma
    assert abs(est - exact) / exact < 0.4
    assert int(a["m"].iloc[0]) == 64


def test_hll_rho_integer_msb_fixup_is_exact():
    # the float-log2 path must agree with int.bit_length on powers of
    # two and their neighbors (the 1-ulp danger zone)
    from linkgraph.sketch import hll_distinct_tokens  # noqa: F401
    import linkgraph.sketch as sk

    vals = []
    for e in range(1, 58):
        vals.extend([(1 << e) - 1, 1 << e, (1 << e) + 1])
    rem = np.array(vals, np.int64)
    nbits = np.zeros(len(rem), np.int64)
    nz = rem > 0
    nbits[nz] = np.floor(np.log2(rem[nz].astype(np.float64))) \
        .astype(np.int64) + 1
    too_hi = nbits > 0
    while True:
        bad = nz & (rem >> np.maximum(nbits - 1, 0) == 0) & too_hi
        if not bad.any():
            break
        nbits[bad] -= 1
    bad = nz & (rem >> nbits > 0)
    while bad.any():
        nbits[bad] += 1
        bad = nz & (rem >> nbits > 0)
    want = np.array([int(v).bit_length() for v in vals], np.int64)
    assert (nbits == want).all()


def test_mixture_resample_respects_targets():
    from linkgraph.sampling import (MIX_ALPHA, RESAMPLE_FRAC,
                                    mixture_resample, mixture_weights)

    rng = np.random.default_rng(19)
    n = 1200
    srcs = [f"s{g}" for g in rng.integers(0, 4, n)]
    texts = [" ".join(f"w{j}" for j in range(rng.integers(5, 60)))
             for _ in range(n)]
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "source": srcs, "text": texts})
    ds = from_pandas_clean(pdf).repartition(6)
    kept = mixture_resample(ds, group_col="source").to_pandas()
    # membership is deterministic and partition-invariant
    kept2 = mixture_resample(from_pandas_clean(pdf).repartition(13),
                             group_col="source").to_pandas()
    a = kept.sort_values("doc_id").reset_index(drop=True)
    b = kept2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # kept token share per source tracks the temperature weights
    w = mixture_weights(from_pandas_clean(pdf).repartition(6),
                        group_col="source")
    ntok = pdf.assign(n=[len(t.split()) for t in texts])
    tot = float(ntok["n"].sum())
    kept_tok = ntok[ntok["doc_id"].isin(kept["doc_id"])] \
        .groupby("source")["n"].sum()
    for _, row in w.iterrows():
        target = row["weight"] * RESAMPLE_FRAC * tot
        got = float(kept_tok.get(row["source"], 0))
        assert got < 2.0 * target + 200  # sha-threshold noise bound
        assert got > 0.4 * target - 200


def test_kmv_intersection_exact_below_k_and_sampled():
    import ray.data as rd

    from linkgraph.sketch import kmv_intersection

    # small: both sketches hold full sets -> exact intersection
    a_ids = np.arange(0, 60)
    b_ids = np.arange(40, 120)
    t = ["purchase"] * len(a_ids) + ["view"] * len(b_ids)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(np.concatenate([a_ids, b_ids]), pa.int64()),
        "event_type": pa.array(t)}))
    out = kmv_intersection(ds, "purchase", "view")
    assert out["est_a"].iloc[0] == 60.0
    assert out["est_b"].iloc[0] == 80.0
    assert out["est_intersection"].iloc[0] == 20.0

    # large: sampled regime, estimate within 25% of truth at k=256
    rng = np.random.default_rng(3)
    a2 = rng.choice(100_000, 5000, replace=False)
    b2 = np.concatenate([a2[:2500], 100_000 + np.arange(2500)])
    ds2 = rd.from_arrow(pa.table({
        "user_id": pa.array(np.concatenate([a2, b2]), pa.int64()),
        "event_type": pa.array(["purchase"] * len(a2)
                               + ["view"] * len(b2))}))
    out2 = kmv_intersection(ds2, "purchase", "view")
    assert abs(out2["est_intersection"].iloc[0] - 2500) / 2500 < 0.25


def test_hll_daily_users_accuracy_and_merge_invariance():
    import ray.data as rd

    from linkgraph.sketch import hll_daily_users

    rng = np.random.default_rng(17)
    n = 6000
    days = rng.integers(0, 4, n)
    users = rng.integers(0, 900, n)
    us = days * 86_400_000_000 + rng.integers(0, 86_400_000_000, n)
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(us.astype("datetime64[us]"))})
    got = hll_daily_users(rd.from_arrow(tbl))
    # block-layout invariance: registers max-merge
    got2 = hll_daily_users(rd.from_arrow(tbl).repartition(7))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))
    truth = pd.DataFrame({"day": days, "u": users}) \
        .groupby("day")["u"].nunique()
    for _, r in got.iterrows():
        t = truth[r["day"]]
        assert abs(r["estimate"] - t) / t < 0.35  # 64 registers ~ 13% rse

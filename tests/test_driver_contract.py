"""Driver-contract conformance (SURVEY.md §5.5): queries()/oracle_sql()
wiring plus spot checks of fast queries against DuckDB at sf0.001.
The full per-query sweep is the driver's CORRECTNESS gate; a standalone
mirror lives in the verify drive script (see .claude/skills/verify)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def entrymod():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "nation", "region", "part"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _pdf(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _compare(mine, want):
    mine = mine[sorted(mine.columns)]
    want = want[sorted(want.columns)]
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want)
    cols = list(mine.columns)
    ms = mine.sort_values(cols).reset_index(drop=True)
    ws = want.sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = ms[c].to_numpy(), ws[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float), atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_oracle_keys_subset_of_queries(entrymod):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20          # operator-coverage floor
    assert len(o) >= 15
    assert set(q) == set(o)  # every query is oracle-checked


@pytest.mark.parametrize("name", ["doc_edges", "doc_degree", "doc_edge_count",
                                  "text_tokens", "text_fingerprint",
                                  "events_window", "events_sliding",
                                  "events_session", "doc_group_sizes",
                                  "text_langid", "tpch_pricing",
                                  "tpch_top_orders", "tpch_nation_revenue",
                                  "media_features", "media_frames",
                                  "dedup_jaccard", "sample_stratified",
                                  "text_quality", "embed_centroids",
                                  "tpch_order_rank", "doc_walks",
                                  "sketch_distinct", "semantic_dedup",
                                  "dedup_minhash", "dedup_ngram",
                                  "dedup_simhash", "ann_lsh",
                                  "text_repetition", "text_tfidf",
                                  "doc_truss", "ann_ivf",
                                  "doc_harmonic", "corpus_clean",
                                  "tpch_large_orders",
                                  "doc_assortativity", "doc_diameter",
                                  "media_audio", "media_image",
                                  "media_video", "doc_bc_sampled",
                                  "text_top_tokens_by_lang",
                                  "sketch_hll", "sample_weighted",
                                  "mix_weights", "doc_eigen",
                                  "text_pmi", "events_markov",
                                  "tpch_promo", "tpch_volume",
                                  "ann_pq", "embed_knn_cc",
                                  "embed_outliers", "mix_resample",
                                  "doc_condensation", "doc_adjacency",
                                  "embed_quantize",
                                  "tpch_market_share",
                                  "sink_roundtrip",
                                  "events_interarrival",
                                  "events_topk_users",
                                  "text_langid_confusion",
                                  "doc_pagerank_warm",
                                  "text_bm25", "events_dau",
                                  "events_ab_test",
                                  "sketch_bloom",
                                  "events_anomaly_days",
                                  "sink_csv_roundtrip",
                                  "sink_json_roundtrip",
                                  "doc_triads",
                                  "doc_distance_dist",
                                  "dedup_report",
                                  "tpch_discount",
                                  "events_churn", "events_smooth",
                                  "text_zipf", "text_sentences",
                                  "embed_recall", "doc_toposort",
                                  "doc_dag_paths", "dedup_lsh_recall",
                                  "embed_norms", "doc_ppr_sweep",
                                  "events_autocorr", "doc_rich_club",
                                  "doc_bipartite", "doc_knn_degree",
                                  "tpch_global_sales", "text_keywords",
                                  "doc_label_spread", "tpch_min_cost",
                                  "doc_coarsen", "sketch_join",
                                  "sample_split", "ann_filtered",
                                  "media_resample", "media_sobel",
                                  "embed_truncate", "text_entropy",
                                  "text_bpe_merges", "doc_salsa",
                                  "events_attribution",
                                  "events_concurrency",
                                  "events_streaks", "text_winnow",
                                  "events_compact", "text_heaps",
                                  "embed_silhouette", "doc_bowtie",
                                  "doc_simrank",
                                  "events_window_uniques",
                                  "sketch_quantiles",
                                  "media_histogram",
                                  "events_conversion_lag",
                                  "doc_anf", "doc_voterank",
                                  "embed_kcenter", "text_llr",
                                  "events_skew", "embed_mmr",
                                  "corpus_card", "events_paths",
                                  "doc_assort_directed",
                                  "text_source_jsd",
                                  "tpch_dominant_supplier",
                                  "media_zcr", "media_loudness",
                                  "tpch_copurchase", "tpch_profit",
                                  "tpch_supplier_parts",
                                  "doc_squares", "doc_scan",
                                  "doc_densest", "text_dsir",
                                  "doc_edge_jaccard",
                                  "dedup_containment",
                                  "tpch_audit", "media_vad",
                                  "events_holt",
                                  "events_quartiles",
                                  "doc_triangles_approx",
                                  "events_cusum_by_type",
                                  "text_unigram_tokenizer",
                                  "doc_leiden",
                                  "doc_leiden_modularity",
                                  "media_png",
                                  "text_unigram_tokens",
                                  "doc_percolation",
                                  "media_png_resize",
                                  "text_training_order",
                                  "dedup_cross_source",
                                  "embed_knn_classify",
                                  "text_token_budget",
                                  "doc_edge_percolation",
                                  "dedup_threshold_sweep",
                                  "doc_two_hop",
                                  "sketch_cms_error",
                                  "events_rate_change",
                                  "pack_waste",
                                  "events_cusum_binseg",
                                  "corpus_rank_sample",
                                  "web_tlds",
                                  "events_stickiness",
                                  "events_user_concentration",
                                  "doc_degree_quantiles",
                                  "tpch_quantity_hist"])
def test_fast_queries_match_oracle(entrymod, con, sf_dir, name):
    mine = _pdf(entrymod.queries()[name](sf_dir))
    want = con.sql(entrymod.oracle_sql()[name]).df()
    _compare(mine, want)


def test_corpus_clean_v4_is_subset_of_v3(ray_session):
    """V4 = v3 minus classifier-rejected and url-mirror docs: every v4
    survivor is a v3 survivor, and the two extra gates each bind."""
    import numpy as np

    from linkgraph.pipelines import q_corpus_clean_v3, q_corpus_clean_v4

    sf = "/root/testdata/sf0.001"
    v3 = q_corpus_clean_v3(sf).to_pandas()
    v4 = q_corpus_clean_v4(sf).to_pandas()
    s3 = set(v3["doc_id"].astype(np.int64))
    s4 = set(v4["doc_id"].astype(np.int64))
    assert s4 <= s3
    assert len(s4) < len(s3)  # the gates actually dropped something


def test_corpus_clean_v5_is_subset_of_v4(ray_session):
    """V5 = v4 minus out-of-token-budget docs: strict subset, and the
    budget gate actually binds on the test corpus."""
    import numpy as np

    from linkgraph.pipelines import q_corpus_clean_v4, q_corpus_clean_v5

    sf = "/root/testdata/sf0.001"
    v4 = q_corpus_clean_v4(sf).to_pandas()
    v5 = q_corpus_clean_v5(sf).to_pandas()
    s4 = set(v4["doc_id"].astype(np.int64))
    s5 = set(v5["doc_id"].astype(np.int64))
    assert s5 <= s4
    assert len(s5) < len(s4)

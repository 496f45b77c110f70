"""Web/URL lane for training-data pipelines (C4/RefinedWeb-style
pre-filters): URL canonicalization, per-domain stats, domain blocklist
filtering and canonical-URL dedup.

The documents table has no URL column, so — exactly like the media lane
(multimodal.media_from_documents) — a deterministic `url` is DERIVED
from doc_id with fixed integer arithmetic and string concatenation that
a DuckDB oracle reproduces term-for-term (pipelines._web_urls_sql).
The derivation covers the messy shapes canonicalizers must handle:
mixed-case scheme/host, an explicit default port, utm_* tracking
params in first/middle/last position, trailing slashes and fragments,
and genuine cross-doc collisions (mirrored pages) via a modular item id.

Normalization is a fixed chain of RE2-compatible regex rewrites (the
same literal patterns run in pyarrow/pandas and DuckDB — the repo-wide
oracle discipline):

  1. strip the fragment           #.*$            -> ''
  2. lowercase scheme://host[:port]  (extract prefix, lower, re-concat)
  3. strip the default port       ^(https://[^/:?#]*):443 -> \\1
  4. strip utm_* params           ([?&])utm_[a-z]+=[^&]*& -> \\1 (g)
                                  [?&]utm_[a-z]+=[^&]*$   -> ''
  5. strip trailing slashes       /+$             -> ''

Every stage is a stateless vectorized map_batches (pandas str kernels);
the only wide step is the canonical-URL dedup, which buckets by
pd.util.hash_array(canon) into ~rows/200k coarse groups (never a
fine-key aggregate — CLAUDE.md shuffle rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# regexes shared verbatim with the SQL oracle (RE2-compatible)
PREFIX_RE = r"^([a-zA-Z]+://[^/?#]*)"
FRAG_RE = r"#.*$"
PORT_RE = r"^(https://[^/:?#]*):443"
UTM_MID_RE = r"([?&])utm_[a-z]+=[^&]*&"
UTM_END_RE = r"[?&]utm_[a-z]+=[^&]*$"
SLASH_RE = r"/+$"
HOST_RE = r"^https://(?:www\.)?([^/:?#]+)"

N_COLD_DOMAINS = 47          # hot domains 0-2, cold 3-49
ITEM_MOD = 400               # modular item id -> deterministic mirrors
BLOCKED_HOSTS = ("site0.example", "site1.example", "site2.example")


def urls_from_documents(docs_ds):
    """Deterministic raw `url` per document (doc_id-only arithmetic,
    reproduced in pipelines._web_urls_sql)."""

    def derive(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(d),
                         "url": pa.array(urls_from_batch(d), pa.string())})

    return docs_ds.map_batches(derive, batch_format="pyarrow")


def canonicalize(s: pd.Series) -> pd.Series:
    """The 5-step normalization chain over a string Series."""
    s = s.str.replace(FRAG_RE, "", regex=True)
    pre = s.str.extract(PREFIX_RE, expand=False).fillna("")
    rest = s.str.replace(PREFIX_RE, "", regex=True, n=1)
    s = pre.str.lower() + rest
    s = s.str.replace(PORT_RE, r"\1", regex=True, n=1)
    s = s.str.replace(UTM_MID_RE, r"\1", regex=True)
    s = s.str.replace(UTM_END_RE, "", regex=True)
    return s.str.replace(SLASH_RE, "", regex=True)


def add_canonical(urls_ds, url_col: str = "url",
                  out_col: str = "canon"):
    """Append the canonical URL column (stateless vectorized stage)."""

    def norm(b: pa.Table) -> pa.Table:
        s = b[url_col].to_pandas()
        return b.append_column(out_col, pa.array(canonicalize(s),
                                                 pa.string()))

    return urls_ds.map_batches(norm, batch_format="pyarrow")


def domain_of(canon: pd.Series) -> pd.Series:
    """Registered domain (www-stripped host) of a canonical URL."""
    return canon.str.extract(HOST_RE, expand=False).fillna("")


def domain_stats(docs_ds):
    """(domain, n_docs, total_chars) over the bounded domain catalog:
    per-batch pandas partials, one small groupby."""
    from ray.data.aggregate import Sum

    from .runtime import tune_context

    tune_context()

    def part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canonicalize(urls_from_batch(d))
        nchars = b["n_chars"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"domain": domain_of(canon),
                           "n_docs": 1, "total_chars": nchars})
        g = df.groupby("domain", sort=False).agg(
            n_docs=("n_docs", "sum"),
            total_chars=("total_chars", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = docs_ds.map_batches(part, batch_format="pyarrow") \
        .groupby("domain") \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
    return out


def urls_from_batch(d: np.ndarray) -> pd.Series:
    """Raw-url derivation for a bare doc_id array (shared kernel).

    Page IDENTITY (domain, category, item id, query id) derives from
    m = 7*doc_id mod 400 — a bijection mod 400, so docs congruent
    mod 400 are MIRRORS of the same page; presentation NOISE (scheme/
    host case, default port, utm_* param position, fragment, trailing
    slash) derives from doc_id, so mirror raw URLs differ but share
    one canonical form after web.canonicalize."""
    m = (d * 7) % ITEM_MOD
    hot = (m * 37) % 100 < 30
    dom = np.where(hot, (m * 53) % 3, 3 + (m * 53) % N_COLD_DOMAINS)
    up = (d % 7) == 0
    dom_s = pd.Series(dom).astype(str)
    pre = np.where(up, "HTTPS://WWW.Site", "https://www.site")
    tld = np.where(up, ".EXample", ".example")
    port = np.where(d % 11 == 0, ":443", "")
    path = ("/cat" + pd.Series((m * 13) % 5).astype(str)
            + "/item" + pd.Series(m).astype(str))
    qp = m % 3 != 0
    qid = pd.Series(m % 100).astype(str)
    slash = np.where((d % 3 == 0) & ~qp, "/", "")
    q4 = d % 4
    query = pd.Series(np.where(
        ~qp, np.where(q4 == 0, "?utm_source=feed", ""),
        np.where(q4 == 0, "?utm_source=feed&id=" + qid,
                 np.where(q4 == 1, "?id=" + qid + "&utm_campaign=x",
                          "?id=" + qid))))
    frag = pd.Series(np.where(
        d % 5 == 0, "#sec" + pd.Series(d % 3).astype(str), ""))
    return (pd.Series(pre) + dom_s + pd.Series(tld) + pd.Series(port)
            + path + pd.Series(slash) + query + frag)


def blocklist_counts(docs_ds, blocked: tuple[str, ...] = BLOCKED_HOSTS):
    """(lang, kept, dropped) after dropping blocked domains — the
    blocklist is a constant broadcast inside the kernel; partials over
    the bounded lang domain."""
    from ray.data.aggregate import Sum

    from .runtime import tune_context

    tune_context()
    bset = frozenset(blocked)

    def part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canonicalize(urls_from_batch(d))
        blockedm = domain_of(canon).isin(bset).to_numpy()
        df = pd.DataFrame({"lang": b["lang"].to_pandas(),
                           "kept": (~blockedm).astype(np.int64),
                           "dropped": blockedm.astype(np.int64)})
        g = df.groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return docs_ds.map_batches(part, batch_format="pyarrow") \
        .groupby("lang") \
        .aggregate(Sum("kept", alias_name="kept"),
                   Sum("dropped", alias_name="dropped"))


def url_dup_groups(docs_ds):
    """Canonical-URL dedup groups: (canon, n_dups, keep_id) for every
    canonical URL shared by >= 2 docs (keep = min doc_id).  Coarse
    hash-bucket shuffle, vectorized in-bucket kernel, Dataset out."""
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .runtime import tune_context

    tune_context()
    n = docs_ds.count()
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def bucketize(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canonicalize(urls_from_batch(d))
        h = pd.util.hash_array(canon.to_numpy(dtype=object))
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64)),
            "canon": pa.array(canon, pa.string()),
            "doc_id": pa.array(d)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("canon", sort=False)["doc_id"] \
            .agg(n_dups="size", keep_id="min").reset_index()
        agg = agg[agg["n_dups"] >= 2]
        agg["n_dups"] = agg["n_dups"].astype(np.int64)
        return agg[["canon", "n_dups", "keep_id"]]

    return docs_ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas")


def url_drop_ids(docs_ds):
    """doc_ids to DROP under canonical-URL dedup: every doc that shares
    its canonical URL with a smaller doc_id (keep = min of each mirror
    group).  Same coarse canon-hash bucket shuffle as url_dup_groups;
    Dataset of (doc_id,)."""
    from .algos.triangles import TARGET_ROWS_PER_BUCKET
    from .runtime import tune_context

    tune_context()
    n = docs_ds.count()
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def bucketize(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        canon = canonicalize(urls_from_batch(d))
        h = pd.util.hash_array(canon.to_numpy(dtype=object))
        return pa.table({
            "bucket": pa.array((h % np.uint64(nb)).astype(np.int64)),
            "canon": pa.array(canon, pa.string()),
            "doc_id": pa.array(d)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("canon", sort=False)["doc_id"].transform("min")
        out = g.loc[g["doc_id"] != keep, ["doc_id"]]
        return out.astype(np.int64)

    return docs_ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas")

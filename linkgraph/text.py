"""Text-analysis stages for large-scale training-data pipelines:
token counting, quality stats, normalized fingerprints, language ID.

All stages are vectorized `map_batches` transforms over Arrow string
columns (pyarrow.compute regex kernels); language ID is an actor-pool
stage (profile tables built once per actor).  Designed for the
`documents(doc_id, text, lang, source, n_chars)` shape of the driver
testdata but column names are parameters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,;:!?]"


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "n_tokens") -> pa.Table:
    """Whitespace token count (matches SQL `\\S+` splitting)."""
    return batch.append_column(
        out, pc.cast(pc.count_substring_regex(batch[col], TOKEN_RE), pa.int64()))


# GPT-2-style pretokenizer, restricted to RE2 syntax (no lookahead) so
# the SAME pattern runs in pyarrow (RE2) and DuckDB (RE2): contraction
# suffixes, space-prefixed letter/digit/punctuation runs, whitespace runs
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def add_bpe_token_count(batch: pa.Table, col: str = "text",
                        out: str = "n_bpe_tokens") -> pa.Table:
    """BPE-ish pretoken count (the task brief's 'BPE-ish regex' lane):
    non-overlapping leftmost matches of BPE_TOKEN_RE — a stable proxy
    for tokenizer cost without shipping a vocab."""
    return batch.append_column(
        out, pc.cast(pc.count_substring_regex(batch[col], BPE_TOKEN_RE),
                     pa.int64()))


def add_text_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-scoring stats: char length, token count, punctuation count."""
    t = batch[col]
    batch = batch.append_column(
        "n_chars2", pc.cast(pc.utf8_length(t), pa.int64()))
    batch = batch.append_column(
        "n_tokens", pc.cast(pc.count_substring_regex(t, TOKEN_RE), pa.int64()))
    batch = batch.append_column(
        "n_punct", pc.cast(pc.count_substring_regex(t, PUNCT_RE), pa.int64()))
    return batch


# quality scoring: RE2 word-boundary stopword pattern shared verbatim
# with the SQL oracle (DuckDB regexp_* is RE2 too, so hit counts match)
QUALITY_STOPWORD_RE = r"\b(the|a|of|and|to|in|is|it|that|was|for)\b"


def add_quality(batch: pa.Table, col: str = "text",
                out: str = "quality", keep_out: str = "keep",
                threshold: float = 0.5) -> pa.Table:
    """Composite document quality score in [0, 1] + keep flag — the
    classic heuristic pre-filter of large-scale text pipelines (length,
    stopword density, punctuation density), fully vectorized:

        quality = 0.4 * min(1, n_tokens / 50)
                + 0.4 * min(1, 5 * stop_hits / max(n_tokens, 1))
                + 0.2 * (1 - min(1, n_punct / max(n_tokens, 1)))

    All arithmetic in float64, rounded to 6 (value-hash convention)."""
    t = batch[col]
    low = pc.utf8_lower(t)
    n_tok = pc.cast(pc.count_substring_regex(t, TOKEN_RE),
                    pa.float64()).to_numpy(zero_copy_only=False)
    n_stop = pc.cast(pc.count_substring_regex(low, QUALITY_STOPWORD_RE),
                     pa.float64()).to_numpy(zero_copy_only=False)
    n_punct = pc.cast(pc.count_substring_regex(t, PUNCT_RE),
                      pa.float64()).to_numpy(zero_copy_only=False)
    denom = np.maximum(n_tok, 1.0)
    q = (0.4 * np.minimum(1.0, n_tok / 50.0)
         + 0.4 * np.minimum(1.0, 5.0 * n_stop / denom)
         + 0.2 * (1.0 - np.minimum(1.0, n_punct / denom)))
    q = np.round(q, 6)
    batch = batch.append_column(out, pa.array(q, pa.float64()))
    return batch.append_column(keep_out, pa.array(q >= threshold))


def _batch_word_hashes(texts: list) -> tuple[np.ndarray, np.ndarray, int]:
    """(word_doc, word_hash, n_docs): full-word 64-bit hashes of every
    whitespace-separated lowercased word, vectorized across the batch
    (one concat, boolean run detection, per-char polynomial rounds to the
    LONGEST word, splitmix64 avalanche).  Hashes are internal distinct
    keys only — equivalence with string-keyed SQL holds up to 2^-64
    collisions (same note as the shingle hashing)."""
    n_docs = len(texts)
    lowered = [(t or "").lower() for t in texts]
    joined = "\x00".join(lowered)
    if not joined:
        return (np.empty(0, np.int64), np.empty(0, np.uint64), n_docs)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc_end = np.cumsum(np.array([len(t) + 1 for t in lowered],
                                 dtype=np.int64)) - 1
    # whitespace = any Python-isspace codepoint (corpus charset: space,
    # tab, newline); \x00 doubles as the doc separator
    ws = np.array([0, 9, 10, 11, 12, 13, 28, 29, 30, 31, 32, 133, 160],
                  dtype=np.uint32)
    nonspace = ~np.isin(codes, ws)
    prev = np.concatenate([[False], nonspace[:-1]])
    nxt = np.concatenate([nonspace[1:], [False]])
    w_start = np.flatnonzero(nonspace & ~prev)
    w_end = np.flatnonzero(nonspace & ~nxt)
    if len(w_start) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.uint64), n_docs)
    lens = w_end - w_start + 1
    h = np.zeros(len(w_start), dtype=np.uint64)
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for k in range(int(lens.max())):
            m = lens > k
            if not m.any():
                break
            h[m] = h[m] * B + codes[w_start[m] + k].astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(32)
    word_doc = np.searchsorted(doc_end, w_start, side="left")
    return word_doc.astype(np.int64), h, n_docs


def _per_doc_max_and_distinct(doc: np.ndarray, key: np.ndarray,
                              n_docs: int):
    """(max_count[d], n_distinct[d]) of `key` values per doc, vectorized:
    one lexsort + boundary scans."""
    max_c = np.zeros(n_docs, dtype=np.int64)
    n_dist = np.zeros(n_docs, dtype=np.int64)
    if len(doc) == 0:
        return max_c, n_dist
    order = np.lexsort((key, doc))
    d, k = doc[order], key[order]
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.concatenate([starts, [len(d)]]))
    gd = d[starts]
    np.maximum.at(max_c, gd, counts)
    n_dist += np.bincount(gd, minlength=n_docs)
    return max_c, n_dist


def add_repetition_stats(batch: pa.Table, id_col: str = "doc_id",
                         col: str = "text") -> pa.Table:
    """Gopher-style repetition quality metrics per document (the
    standard pre-training repetition filters, word-level because the
    corpus has no line structure):

        n_words         whitespace word count
        dup_word_frac   1 - distinct_words / n_words        (0 if empty)
        top_word_frac   max single-word count / n_words     (0 if empty)
        top_bigram_frac max word-bigram count / (n_words-1) (0 if <2)

    Fully vectorized across the batch; fraction arithmetic is float64
    rounded to 6, reproduced string-for-string by the SQL oracle
    (pipelines 'text_repetition')."""
    texts = batch[col].to_pylist()
    word_doc, h, n_docs = _batch_word_hashes(texts)
    n_words = np.bincount(word_doc, minlength=n_docs).astype(np.int64)
    max_w, dist_w = _per_doc_max_and_distinct(word_doc, h, n_docs)
    # bigrams: consecutive words of the SAME doc, combined with an
    # order-sensitive mix
    same = word_doc[1:] == word_doc[:-1] if len(word_doc) else \
        np.empty(0, bool)
    with np.errstate(over="ignore"):
        bh = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:] \
            if len(h) else np.empty(0, np.uint64)
    bdoc = word_doc[:-1][same] if len(word_doc) else word_doc
    max_b, _ = _per_doc_max_and_distinct(bdoc, bh[same] if len(h) else bh,
                                         n_docs)
    nw = n_words.astype(np.float64)
    dup_word = np.where(n_words > 0, 1.0 - dist_w / np.maximum(nw, 1.0), 0.0)
    top_word = np.where(n_words > 0, max_w / np.maximum(nw, 1.0), 0.0)
    nb = np.maximum(n_words - 1, 1).astype(np.float64)
    top_bigram = np.where(n_words > 1, max_b / nb, 0.0)
    return pa.table({
        id_col: batch[id_col],
        "n_words": pa.array(n_words),
        "dup_word_frac": pa.array(np.round(dup_word, 6), pa.float64()),
        "top_word_frac": pa.array(np.round(top_word, 6), pa.float64()),
        "top_bigram_frac": pa.array(np.round(top_bigram, 6), pa.float64()),
    })


def _word_count_table(batch: pa.Table, id_col: str,
                      col: str) -> pa.Table:
    """(doc_id, term, c, n) rows: per-document term counts + word total,
    fully vectorized in Arrow (split -> flatten with parent indices ->
    C++ group_by).  A document is one row, so its counts are always
    complete within the batch."""
    low = pc.utf8_lower(batch[col])
    words = pc.split_pattern_regex(low, r"[ \t\n]+")
    parent = pc.list_parent_indices(words)
    flat = pc.list_flatten(words)
    ids = pc.take(batch[id_col], parent)
    t = pa.table({"doc_id": ids, "term": flat})
    t = t.filter(pc.greater(pc.utf8_length(t["term"]), 0))
    tc = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    tc = tc.rename_columns(["doc_id", "term", "c"])
    nw = tc.group_by(["doc_id"]).aggregate([("c", "sum")]) \
           .rename_columns(["doc_id", "n"])
    pdf = tc.to_pandas().merge(nw.to_pandas(), on="doc_id")
    return pa.table({
        "doc_id": pa.array(pdf["doc_id"], pa.int64()),
        "term": pa.array(pdf["term"], pa.string()),
        "c": pa.array(pdf["c"], pa.int64()),
        "n": pa.array(pdf["n"], pa.int64()),
    })


# vocabularies up to this many distinct terms broadcast the (term, df)
# table once; a web-scale token vocabulary (NOT "bounded by the
# language" once urls/ids/typos flood in — VERDICT r2 #6) takes the
# distributed bucket-join path instead
VOCAB_BROADCAST_CAP = 2_000_000
_TFIDF_BUCKET_ROWS = 200_000


def _term_bucket(terms, nb: int) -> np.ndarray:
    """Deterministic coarse bucket for string terms (pandas siphash with
    the fixed default key — stable across worker processes, unlike
    builtin hash under PYTHONHASHSEED)."""
    import pandas as pd

    h = pd.util.hash_array(np.asarray(terms, dtype=object))
    return (h % np.uint64(nb)).astype(np.int64)


def _doc_topk_frame(pdf, k: int):
    """Per-doc top-k by (tfidf desc, term asc) over a scored frame —
    the SAME ranking kernel on both gate paths."""
    pdf = pdf.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
    top = pdf.groupby("doc_id").head(k).copy()
    top["rnk"] = top.groupby("doc_id").cumcount() + 1
    top["tfidf"] = top["tfidf"].round(6)
    return top[["doc_id", "term", "rnk", "tfidf"]]


def tfidf_top_terms(ds, id_col: str = "doc_id", col: str = "text",
                    k: int = 5):
    """Top-k terms per document by TF-IDF (tf = count/doc_len, idf =
    ln(N/df)), the classic per-document keyword extraction:

      1. ONE distributed pass builds the (doc, term, count, len) table
         (Arrow C++ group_by inside map_batches), materialized once.
      2. Document frequencies reduce via per-batch partial term counts
         + one coarse-bucket merge (never a per-term-key hash
         aggregate).
      3. SIZE-GATED scoring: vocabularies under VOCAB_BROADCAST_CAP are
         ray.put once and every doc batch scores + ranks locally; above
         the cap the df table attaches via a coarse term-bucket merge
         and per-doc top-k runs in doc-id buckets — no vocabulary ever
         lands on the driver.

    Deterministic: ties break (tfidf desc, term asc).  Returns a Dataset
    (doc_id, term, rnk, tfidf) with tfidf rounded to 6."""
    import pandas as pd
    import ray

    from .runtime import tune_context
    tune_context()

    ds = ds.materialize()  # word-count pass + scoring pass share lineage
    n_docs = ds.count()
    wc = ds.map_batches(
        lambda b: _word_count_table(b, id_col, col),
        batch_format="pyarrow").materialize()
    nb = max(32, wc.count() // _TFIDF_BUCKET_ROWS)

    def df_partial(b: pa.Table) -> pa.Table:
        # wc rows are unique per (doc, term): df = row count per term
        s = b["term"].to_pandas().value_counts()
        terms = s.index.to_numpy()
        return pa.table({"term": pa.array(terms, pa.string()),
                         "cnt": pa.array(s.to_numpy(np.int64)),
                         "tb": pa.array(_term_bucket(terms, nb))})

    def df_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=True)["cnt"].sum().reset_index()
        return out.rename(columns={"cnt": "df"})

    df_ds = (wc.map_batches(df_partial, batch_format="pyarrow")
             .groupby("tb").map_groups(df_merge, batch_format="pandas")
             ).materialize()

    if df_ds.count() <= VOCAB_BROADCAST_CAP:
        dfp = df_ds.to_pandas()
        order = np.argsort(dfp["term"].to_numpy())
        vref = ray.put((dfp["term"].to_numpy()[order],
                        dfp["df"].to_numpy(np.int64)[order],
                        float(n_docs)))

        # scoring maps over the DOCUMENTS (one doc = one row),
        # recomputing the doc's counts locally — a doc's terms can
        # therefore never be split across batches by Ray's re-batching,
        # which would corrupt a per-batch top-k over a (doc, term) table
        def score(b: pa.Table) -> pa.Table:
            vcb, dfv, nd = ray.get(vref)
            pdf = _word_count_table(b, id_col, col).to_pandas()
            pos = np.searchsorted(vcb, pdf["term"].to_numpy())
            idf = np.log(nd / dfv[pos])
            pdf["tfidf"] = (pdf["c"].to_numpy()
                            / pdf["n"].to_numpy(np.float64)) * idf
            top = _doc_topk_frame(pdf, k)
            return pa.Table.from_pandas(
                top, preserve_index=False).replace_schema_metadata(None)

        return ds.map_batches(score, batch_format="pyarrow")

    # distributed path: attach df in term buckets, rank in doc buckets
    def tag_wc(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pandas().to_numpy()
        return pa.table({"doc_id": b["doc_id"], "term": b["term"],
                         "c": b["c"], "n": b["n"],
                         "tb": pa.array(_term_bucket(terms, nb))})

    def tag_df(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pandas().to_numpy()
        z = np.zeros(b.num_rows, np.int64)
        return pa.table({"doc_id": pa.array(z - 1), "term": b["term"],
                         "c": pa.array(z - b["df"].to_numpy(
                             zero_copy_only=False)),  # df rides in c < 0
                         "n": pa.array(z),
                         "tb": pa.array(_term_bucket(terms, nb))})

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        is_df = g["doc_id"].to_numpy() < 0
        dfr = g.loc[is_df, ["term", "c"]].rename(columns={"c": "ndf"})
        rows = g.loc[~is_df, ["doc_id", "term", "c", "n"]]
        m = rows.merge(dfr, on="term", how="inner")
        idf = np.log(float(n_docs) / (-m["ndf"].to_numpy(np.float64)))
        m["tfidf"] = (m["c"].to_numpy() / m["n"].to_numpy(np.float64)) \
            * idf
        return m[["doc_id", "term", "tfidf"]]

    scored = (wc.map_batches(tag_wc, batch_format="pyarrow")
              .union(df_ds.map_batches(tag_df, batch_format="pyarrow"))
              .groupby("tb").map_groups(attach_df, batch_format="pandas"))
    scored = scored.map_batches(
        lambda b: b.append_column("db", pa.array(
            (b["doc_id"].to_numpy(zero_copy_only=False) % nb)
            .astype(np.int64))),
        batch_format="pyarrow")
    return scored.groupby("db").map_groups(
        lambda g: _doc_topk_frame(g[["doc_id", "term", "tfidf"]], k),
        batch_format="pandas")


def normalize_text(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def add_fingerprint(batch: pa.Table, col: str = "text",
                    out: str = "fp") -> pa.Table:
    """Document fingerprint: sha256 of the normalized text — the
    canonical-form dedup key (robust to whitespace/case variance)."""
    norm = normalize_text(batch[col])
    shas = [hashlib.sha256((v or "").encode()).hexdigest()
            for v in norm.to_pylist()]
    return batch.append_column(out, pa.array(shas, pa.string()))


# Function-word profiles for the 5 corpus languages (public-knowledge
# stopword lists); used by the deterministic n-gram/stopword language-ID
# heuristic.  Ties break alphabetically so runs are reproducible.
_LANG_WORDS = {
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu",
           "den", "von", "auf", "im", "für", "sich"},
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "at"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "no",
           "los", "una", "para", "es", "del"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "du", "que",
           "est", "dans", "pour", "qui", "sur"},
    "zh": {"的", "了", "是", "在", "我", "有", "他", "这", "中", "不",
           "和", "人", "一", "大", "个"},
}


def _avalanche_poly(codes: np.ndarray, w_start: np.ndarray,
                    lens: np.ndarray) -> np.ndarray:
    """Variable-length polynomial fold + splitmix64 avalanche over the
    given (start, len) runs of `codes` — the shared full-word hashing
    kernel (same recurrence as _batch_word_hashes)."""
    h = np.zeros(len(w_start), dtype=np.uint64)
    if len(w_start) == 0:
        return h
    B = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for k in range(int(lens.max())):
            m = lens > k
            if not m.any():
                break
            h[m] = h[m] * B + codes[w_start[m] + k].astype(np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(32)
    return h


_CJK_LO, _CJK_HI = ord("一"), ord("鿿")  # U+4E00 .. U+9FFF


class LangId:
    """Language-ID stage: profiles compiled once in __init__, batches
    scored FULLY vectorized in __call__ (VERDICT r2 #5: the per-row,
    per-character Python loop was the slow stage) — one utf-32 concat,
    letter-run segmentation via a unique-codepoint regex LUT, hashed
    stopword membership via sorted-array searchsorted, CJK ratio via a
    codepoint range test.

    Heuristic (unchanged semantics, prediction-identical to the scalar
    version): stopword-hit rate per language (+ CJK codepoint ratio for
    zh); prediction = argmax score, tie-break alphabetical; 'und'
    (undetermined) when nothing scores.  Deterministic by construction.
    """

    def __init__(self, col: str = "text", out: str = "lang_pred"):
        import re

        self.col, self.out = col, out
        # single-char letter test, same class as the scalar [^\W\d_]+
        self.letter_re = re.compile(r"[^\W\d_]", re.UNICODE)
        self.langs = sorted(_LANG_WORDS)  # alphabetical order
        self.vocab_hashes = {}
        for lang in self.langs:
            ws = sorted(_LANG_WORDS[lang])
            codes = np.frombuffer("".join(ws).encode("utf-32-le"),
                                  dtype=np.uint32)
            lens = np.array([len(w) for w in ws], dtype=np.int64)
            starts = np.cumsum(lens) - lens
            self.vocab_hashes[lang] = np.sort(
                _avalanche_poly(codes, starts, lens))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        n_docs = len(texts)
        lowered = [(t or "").lower() for t in texts]
        joined = "\x00".join(lowered)
        if not joined:
            return batch.append_column(
                self.out, pa.array(["und"] * n_docs, pa.string()))
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = np.array([len(t) for t in lowered], dtype=np.int64)
        doc_end = np.cumsum(lens + 1) - 1  # separator positions
        # letter classification: regex per UNIQUE codepoint (small), LUT
        # back — exact parity with the scalar [^\W\d_]+ segmentation
        uniq = np.unique(codes)
        lut = np.array([self.letter_re.match(chr(c)) is not None
                        for c in uniq])
        is_letter = lut[np.searchsorted(uniq, codes)]
        prev = np.concatenate([[False], is_letter[:-1]])
        nxt = np.concatenate([is_letter[1:], [False]])
        w_start = np.flatnonzero(is_letter & ~prev)
        w_end = np.flatnonzero(is_letter & ~nxt)
        wh = _avalanche_poly(codes, w_start, w_end - w_start + 1)
        word_doc = np.searchsorted(doc_end, w_start)
        n_words = np.bincount(word_doc, minlength=n_docs)
        cjk_pos = np.flatnonzero((codes >= _CJK_LO) & (codes <= _CJK_HI))
        n_cjk = np.bincount(np.searchsorted(doc_end, cjk_pos),
                            minlength=n_docs)
        score = np.zeros((n_docs, len(self.langs)), dtype=np.float64)
        for j, lang in enumerate(self.langs):
            if lang == "zh":
                score[:, j] = n_cjk / np.maximum(1, lens)
                continue
            vh = self.vocab_hashes[lang]
            pos = np.searchsorted(vh, wh)
            hit = vh[np.minimum(pos, len(vh) - 1)] == wh
            score[:, j] = (np.bincount(word_doc[hit], minlength=n_docs)
                           / np.maximum(1, n_words))
        best = score.max(axis=1)
        # argmax takes the FIRST max = alphabetical tie-break, matching
        # the scalar strict `score > best` scan
        preds = np.where(best > 0,
                         np.array(self.langs)[score.argmax(axis=1)], "und")
        return batch.append_column(
            self.out, pa.array(preds.tolist(), pa.string()))


def langid_stage(ds, col: str = "text", out: str = "lang_pred",
                 concurrency: int | None = None, batch_size: int = 4096):
    """Attach language predictions.  Task-based: LangId.__init__ hashes
    75 stopwords (microseconds), so warm-worker tasks beat paying a cold
    actor-pool spawn; `concurrency` kept for API compatibility."""
    del concurrency
    stage = LangId(col, out)
    return ds.map_batches(stage.__call__, batch_format="pyarrow",
                          batch_size=batch_size)


def batch_shingles(texts: list, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Batched rolling_hashes: per-doc k-gram hash POSITIONS (not deduped)
    for every text at once — one utf-32 concat + k vectorized rounds
    instead of a per-doc Python loop (VERDICT r2 #7: the MinHash stage's
    per-doc `signature()` loop was the bench floor).

    Returns (counts, hcat): counts[i] = number of hash slots for doc i
    (>= 1 always: empty text -> one 0 hash, 0 < len < k -> one whole-text
    fold, len >= k -> len-k+1 positions, duplicates INCLUDED), hcat =
    the uint64 hashes concatenated in doc order.  min/unique over a doc's
    slice equals min/unique over rolling_hashes(text, k)."""
    n_docs = len(texts)
    texts = [(t or "") for t in texts]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    counts = np.maximum(lens - k + 1, 1)
    joined = "".join(texts)
    codes = (np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
             .astype(np.uint64) if joined else np.empty(0, np.uint64))
    offs = np.cumsum(lens) - lens          # doc start offsets (codepoints)
    B = np.uint64(1099511628211)
    hcat = np.zeros(int(counts.sum()), dtype=np.uint64)
    out_starts = np.cumsum(counts) - counts
    # long docs (len >= k): hash EVERY position of the concat with k
    # contiguous slice-shift rounds (SIMD-friendly; a fancy-gather
    # variant measured 25x slower), then keep in-doc positions via a
    # diff-trick validity mask — position p is valid iff some long doc
    # has offs <= p <= offs+len-k
    long = lens >= k
    n = len(codes)
    if long.any() and n >= k:
        h = np.zeros(n - k + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                np.multiply(h, B, out=h)
                np.add(h, codes[j:n - k + 1 + j], out=h)
        delta = np.zeros(n - k + 2, dtype=np.int32)
        np.add.at(delta, offs[long], 1)
        np.add.at(delta, offs[long] + lens[long] - k + 1, -1)
        valid = np.cumsum(delta[:-1]) > 0
        # out slots for long docs are exactly the contiguous runs of
        # their out_starts; valid positions appear in the same doc order
        lcnt = counts[long]
        odst = (np.repeat(out_starts[long], lcnt)
                + np.arange(int(lcnt.sum()))
                - np.repeat(np.cumsum(lcnt) - lcnt, lcnt))
        hcat[odst] = h[valid]
    # short docs (0 < len < k): ONE whole-text fold each, <= k-1 masked
    # rounds across all short docs; empty docs keep the 0 slot
    short = (lens > 0) & ~long
    if short.any():
        so, sl = offs[short], lens[short]
        h = np.zeros(len(so), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(int(sl.max())):
                m = sl > j
                h[m] = h[m] * B + codes[so[m] + j]
        hcat[out_starts[short]] = h
    return counts, hcat


def batch_shingle_sets(texts: list, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc SORTED UNIQUE shingle hashes for a batch: (doc_idx, hashes)
    with doc_idx non-decreasing and hashes ascending within each doc —
    exactly np.unique(rolling_hashes(t, k)) per doc, vectorized."""
    counts, h = batch_shingles(texts, k)
    doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    order = np.lexsort((h, doc))
    d, hh = doc[order], h[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    return d[keep], hh[keep]


def batch_winnow(texts: list, k: int = 20,
                 w: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched winnowing fingerprint selection (Schleimer et al. 2003,
    with warm-up windows): over each doc's positional k-gram hashes
    (batch_shingles), every window of w consecutive positions ENDING at
    an in-doc position — including the first w-1 "warm-up" windows, so
    short docs need no special case — selects its minimal hash, ties
    broken by the RIGHTMOST position; the fingerprint set is the
    distinct selected positions.  Returns (doc_idx, pos, h) with
    doc_idx non-decreasing and pos ascending within each doc.

    Fully vectorized: the per-doc hash runs are laid into ONE array with
    w-1 uint64-max sentinel slots between docs (windows never straddle a
    doc: a window ending at in-doc position e reaches back at most w-1
    slots, all inside the doc's own run or its gap), the window minimum
    is w shifted np.minimum passes, and the rightmost-arg-min is w
    masked passes from offset 0 (rightmost) outward.  A sentinel can
    never be selected: offset 0 is the in-doc position itself and
    already matches whenever the window min equals the sentinel value."""
    counts, hcat = batch_shingles(texts, k)
    n_docs = len(counts)
    gap = w - 1
    pstart = np.cumsum(counts + gap) - counts   # doc i's first slot
    hp = np.full(int(counts.sum()) + n_docs * gap,
                 np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    out_starts = np.cumsum(counts) - counts
    local = np.arange(len(hcat), dtype=np.int64) \
        - np.repeat(out_starts, counts)
    gidx = pstart[doc] + local if n_docs else np.empty(0, np.int64)
    hp[gidx] = hcat
    wmin = hcat.copy()
    for j in range(1, w):
        np.minimum(wmin, hp[gidx - j], out=wmin)
    sel = np.full(len(gidx), -1, dtype=np.int64)
    for j in range(w):
        m = (sel < 0) & (hp[gidx - j] == wmin)
        sel[m] = gidx[m] - j
    sel = np.unique(sel)
    d = np.searchsorted(pstart, sel, side="right") - 1
    return d, sel - pstart[d], hp[sel]


def rolling_hashes(text: str, k: int = 5) -> np.ndarray:
    """Deterministic 64-bit polynomial rolling hashes of char k-grams —
    shingle set for minhash / n-gram Jaccard (linkgraph.dedup).

    A text shorter than `k` yields ONE shingle: the same polynomial fold
    over all its codepoints (uniform scheme, so every shingle hash —
    short-text case included — is reproducible by the SQL oracles in
    pipelines._minhash_sql via HUGEINT arithmetic)."""
    B = np.uint64(1099511628211)
    if len(text) == 0:
        return np.zeros(1, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
              .astype(np.uint64)
    if len(text) < k:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in codes:
                h = h * B + c
        return np.array([h], dtype=np.uint64)
    h = np.zeros(len(codes) - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):  # k tiny (5): vectorized over all positions
            h = h * B + codes[i:len(codes) - k + 1 + i]
    return np.unique(h)


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing): RE2 patterns applied in a fixed
# order — email first (its domain would otherwise survive as ip-like
# dotted tokens), then IPv4, then phone.  Arrow's replace_substring_regex
# and DuckDB's regexp_replace are BOTH RE2, so the SQL oracle applies the
# identical patterns in the identical order.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\-]{7,14}\d", "<PHONE>"),
)


def redact_pii(batch: pa.Table, col: str = "text",
               out: str = "text_redacted") -> pa.Table:
    """Vectorized PII scrub: appends n_email / n_ipv4 / n_phone match
    counts (counted on the text as it stands BEFORE that pattern's own
    replacement, i.e. staged) and the fully redacted text column."""
    s = batch[col]
    for name, pat, tok in PII_PATTERNS:
        batch = batch.append_column(
            f"n_{name}",
            pc.cast(pc.count_substring_regex(s, pat), pa.int64()))
        s = pc.replace_substring_regex(s, pattern=pat, replacement=tok)
    return batch.append_column(out, s)


def chunk_documents(batch: pa.Table, chunk_words: int = 32,
                    overlap: int = 8, id_col: str = "doc_id",
                    col: str = "text") -> pa.Table:
    """RAG-prep chunking: split each doc's whitespace words into
    fixed-size chunks with overlap (stride = chunk_words - overlap).
    n_chunks = 1 + ceil(max(n - chunk_words, 0) / stride); chunk k
    covers words [k*stride, k*stride + chunk_words).  Fully vectorized:
    one flat token gather (np.repeat + cumsum index trick) + one Arrow
    binary_join_element_wise-free list join per batch.
    """
    assert 0 <= overlap < chunk_words
    stride = chunk_words - overlap
    lists = pc.split_pattern_regex(
        batch[col].combine_chunks() if isinstance(batch[col],
                                                  pa.ChunkedArray)
        else batch[col], r"\s+")
    flat = pc.list_flatten(lists)
    par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    par = par[keep]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(ids)
    n_words = np.bincount(par, minlength=n_docs)
    doc0 = np.cumsum(n_words) - n_words  # flat start per doc
    extra = np.ceil(np.maximum(n_words - chunk_words, 0)
                    / stride).astype(np.int64)
    n_chunks = np.where(n_words > 0, 1 + extra, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string()),
                         "n_words": pa.array([], pa.int64())})
    cdoc = np.repeat(np.arange(n_docs), n_chunks)
    c0 = np.cumsum(n_chunks) - n_chunks
    k = np.arange(total) - c0[cdoc]          # chunk index within doc
    start = k * stride
    clen = np.minimum(chunk_words, n_words[cdoc] - start)
    gstart = doc0[cdoc] + start
    # flat gather indices for every chunk (overlaps duplicate tokens)
    tot_tok = int(clen.sum())
    cg0 = np.cumsum(clen) - clen
    gidx = np.repeat(gstart - cg0, clen) + np.arange(tot_tok)
    toks = flat.take(pa.array(gidx, pa.int64()))
    offsets = np.concatenate([[0], np.cumsum(clen)]).astype(np.int32)
    chunk_lists = pa.ListArray.from_arrays(pa.array(offsets,
                                                    pa.int32()), toks)
    chunks = pc.binary_join(chunk_lists, " ")
    return pa.table({id_col: pa.array(ids[cdoc], pa.int64()),
                     "chunk_id": pa.array(k, pa.int64()),
                     "chunk": chunks,
                     "n_words": pa.array(clen.astype(np.int64))})


# light suffix stemmer (Porter step-1-style): anchored RE2 rules applied
# as a CHAIN (each to the previous result) — pyarrow
# replace_substring_regex and DuckDB regexp_replace are both RE2 with
# backref replacements, so the SQL oracle applies the identical chain
# (the PII-redaction parity pattern).  The ([^s])s$ form emulates
# Porter's first-match-only s-rules under chaining: sses$->ss leaves a
# double s the single-s rule then keeps.
STEM_RULES = (
    (r"sses$", "ss"),
    (r"ies$", "i"),
    (r"([^s])s$", r"\1"),
    (r"^(\w{3,})ing$", r"\1"),
    (r"^(\w{2,})ed$", r"\1"),
)


def stem_array(arr):
    """Apply the STEM_RULES chain to a pyarrow string array."""
    import pyarrow.compute as _pc

    for pat, repl in STEM_RULES:
        arr = _pc.replace_substring_regex(arr, pattern=pat,
                                          replacement=repl)
    return arr


def stem_sql_expr(col: str) -> str:
    """The identical chain as nested DuckDB regexp_replace calls."""
    expr = col
    for pat, repl in STEM_RULES:
        r = repl.replace("\\1", "\\1")
        expr = f"regexp_replace({expr}, '{pat}', '{r}')"
    return expr


# ---------------------------------------------------------------------------
# PMI phrase mining (collocation discovery for tokenizer / phrase vocab)
# ---------------------------------------------------------------------------

def pmi_phrases(ds, text_col: str = "text", min_count: int = 5,
                n_cand: int = 200, k: int = 20, _marginals: bool = False):
    """Top-k word bigrams by pointwise mutual information
    ln((c_ab/B) / ((c_a/T) * (c_b/T))) with a count floor — the
    collocation scan that seeds a phrase vocabulary.

    Scale shape: candidate generation first (distributed bigram count +
    partial top-n_cand with the min_count floor — the text_top_bigrams
    plan), then ONE more corpus pass computing unigram counts ONLY for
    the <= 2*n_cand candidate words (np.isin against the broadcast word
    set) plus the global token/bigram totals as map-side partials.  PMI
    itself is evaluated driver-side over n_cand rows.  Never a
    vocabulary-sized broadcast or an all-terms join.  Returns pandas
    (bigram, n, pmi) ordered by (round(pmi,6) DESC, bigram), pmi
    rounded to 6."""
    import pandas as pd

    def big_partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lists = pc.split_pattern_regex(col, r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = (toks.to_numpy(object) != "")
        toks, par = toks[ok].reset_index(drop=True), par[ok]
        if len(par) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        m = par[:-1] == par[1:]
        bg = (toks.iloc[:-1].reset_index(drop=True)[m] + " "
              + toks.iloc[1:].reset_index(drop=True)[m])
        vc = bg.value_counts()
        return pa.table({"bigram": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = ds.map_batches(big_partial, batch_format="pyarrow") \
               .groupby("bigram").sum("n")

    def local_top(b: pa.Table) -> pa.Table:
        pdf = b.to_pandas().rename(columns={"sum(n)": "n"})
        pdf = pdf[pdf["n"] >= min_count]
        pdf = pdf.sort_values(["n", "bigram"], ascending=[False, True],
                              kind="mergesort").head(n_cand)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    cand = counts.map_batches(local_top,
                              batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["n", "bigram"], ascending=[False, True],
                            kind="mergesort").head(n_cand) \
               .reset_index(drop=True)
    if len(cand) == 0:
        return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "pmi": pd.Series([], dtype=np.float64)})
    words = sorted({w for bg in cand["bigram"] for w in bg.split(" ")})
    warr = np.array(words, object)

    def uni_partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lists = pc.split_pattern_regex(col, r"\s+")
        toks = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
        tarr = toks.to_numpy(zero_copy_only=False)[ok]
        par = par[ok]
        t_tot = len(tarr)
        per_doc = np.bincount(par, minlength=b.num_rows)
        b_tot = int(np.maximum(per_doc - 1, 0).sum())
        hit = np.isin(tarr, warr)
        vc = pd.Series(tarr[hit]).value_counts()
        kind = np.concatenate([np.zeros(len(vc), np.int64), [1, 2]])
        word = np.concatenate([vc.index.to_numpy(object), ["", ""]])
        n = np.concatenate([vc.to_numpy(np.int64), [t_tot, b_tot]])
        return pa.table({"kind": pa.array(kind),
                         "word": pa.array(word, pa.string()),
                         "n": pa.array(n, pa.int64())})

    parts = ds.map_batches(uni_partial, batch_format="pyarrow") \
              .to_pandas()
    t_tot = float(parts.loc[parts["kind"] == 1, "n"].sum())
    b_tot = float(parts.loc[parts["kind"] == 2, "n"].sum())
    uni = parts[parts["kind"] == 0].groupby("word")["n"].sum()
    a = cand["bigram"].str.split(" ", n=1).str[0]
    b2 = cand["bigram"].str.split(" ", n=1).str[1]
    ca = uni.reindex(a.to_numpy(object)).to_numpy(np.float64)
    cb = uni.reindex(b2.to_numpy(object)).to_numpy(np.float64)
    if _marginals:  # llr_phrases reuses the candidate scan verbatim
        return cand, ca, cb, t_tot
    n = cand["n"].to_numpy(np.float64)
    pmi = np.log((n / b_tot) / ((ca / t_tot) * (cb / t_tot)))
    out = pd.DataFrame({"bigram": cand["bigram"],
                        "n": cand["n"].astype(np.int64),
                        "pmi": np.round(pmi, 6)})
    out = out.sort_values(["pmi", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def llr_phrases(ds, text_col: str = "text", min_count: int = 5,
                n_cand: int = 200, k: int = 20):
    """Top-k collocations by Dunning's log-likelihood ratio ("Accurate
    Methods for the Statistics of Surprise and Coincidence", CL 1993)
    — the count-robust alternative to PMI (PMI overweights rare pairs;
    G^2 weights by evidence).  2x2 contingency over token totals:

        k11 = c_ab   k12 = c_a - c_ab
        k21 = c_b - c_ab   k22 = T - c_a - c_b + c_ab
        llr = 2 * sum over nonzero cells of k * ln(k * T / (R_i * C_j))

    Scale shape: identical to pmi_phrases (shared candidate scan +
    candidate-only unigram pass); the statistic is evaluated
    driver-side over n_cand rows.  Returns (bigram, n, llr) ordered
    (round(llr, 6) DESC, bigram)."""
    import pandas as pd

    got = pmi_phrases(ds, text_col=text_col, min_count=min_count,
                      n_cand=n_cand, k=0, _marginals=True)
    if isinstance(got, pd.DataFrame):  # empty candidate set
        return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "llr": pd.Series([], dtype=np.float64)})
    cand, ca, cb, t_tot = got
    n = cand["n"].to_numpy(np.float64)
    cells = [(n, ca, cb),
             (ca - n, ca, t_tot - cb),
             (cb - n, t_tot - ca, cb),
             (t_tot - ca - cb + n, t_tot - ca, t_tot - cb)]
    llr = np.zeros(len(n), np.float64)
    for kk, r, c in cells:  # fixed cell order: oracle twin
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(kk > 0, kk * np.log(kk * t_tot / (r * c)),
                            0.0)
        llr = llr + term
    llr = 2.0 * llr
    out = pd.DataFrame({"bigram": cand["bigram"],
                        "n": cand["n"].astype(np.int64),
                        "llr": np.round(llr, 6)})
    out = out.sort_values(["llr", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# BM25 query scoring (search-engine relevance over the corpus)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(ds, query_terms: list, k: int = 15,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = BM25_K1, b: float = BM25_B):
    """Top-k documents for a term query under BM25
    (idf = ln((N - df + .5)/(df + .5) + 1), Robertson/Lucene form).

    Two stateless passes: (1) corpus stats — N, total token count and
    per-query-term document frequencies as map-side partial rows
    (the stats are O(|query|), never a vocabulary build); (2) scoring —
    stats broadcast once, per-doc term frequencies via vectorized token
    matching, per-block tie-aware partial top-k.  Returns pandas
    (id, score) ordered (score DESC, id ASC), score rounded to 6."""
    import pandas as pd
    import ray

    terms = list(query_terms)
    tarr = np.array(terms, object)

    def toks_of(bcol):
        col = bcol.combine_chunks() if isinstance(bcol, pa.ChunkedArray) \
            else bcol
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.to_numpy(zero_copy_only=False)[ok], par[ok]

    def tf_matrix(tok, par, nrows):
        tf = np.zeros((nrows, len(terms)), np.int64)
        for j, t in enumerate(terms):
            m = tok == t
            if m.any():
                tf[:, j] = np.bincount(par[m], minlength=nrows)
        return tf

    def stats(bt: pa.Table) -> pa.Table:
        tok, par = toks_of(bt[text_col])
        nrows = bt.num_rows
        tf = tf_matrix(tok, par, nrows)
        dl = np.bincount(par, minlength=nrows)
        return pa.table({
            "n": pa.array([nrows], pa.int64()),
            "sumdl": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64)],
                           pa.list_(pa.int64()))})

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    sumdl = int(parts["sumdl"].sum())
    df = np.sum(np.stack([np.asarray(v, np.int64)
                          for v in parts["df"]]), axis=0)
    avgdl = sumdl / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1)
    sref = ray.put((idf, avgdl))

    def score(bt: pa.Table) -> pa.Table:
        idf_, avg_ = ray.get(sref)
        ids = bt[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok, par = toks_of(bt[text_col])
        nrows = bt.num_rows
        tf = tf_matrix(tok, par, nrows).astype(np.float64)
        dl = np.bincount(par, minlength=nrows).astype(np.float64)
        denom = tf + k1 * (1 - b + b * dl[:, None] / avg_)
        sc = (idf_ * tf / denom).sum(axis=1)
        kk = min(k, nrows)
        ordr = np.lexsort((ids, -sc))[:kk]
        return pa.table({id_col: pa.array(ids[ordr]),
                         "score": pa.array(sc[ordr], pa.float64())})

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["score", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
    cand = cand[cand["score"] > 0]
    cand["score"] = cand["score"].round(6)
    return cand.reset_index(drop=True)


def vocab_growth(ds, doc_col: str = "doc_id", text_col: str = "text",
                 n_bins: int = 10) -> pd.DataFrame:
    """Vocabulary growth curve (the Heaps'-law report): tokens bucketed
    by the decile of the doc_id where they FIRST appear — one row per
    non-empty decile, (decile 1..n_bins, new_tokens, cum_vocab).
    Deciles are equal-width doc_id ranges over [min_id, max_id], so the
    curve is corpus-order-deterministic, not arrival-order-dependent.

    Scale shape: token first-occurrence is a per-token min — an
    unbounded fine key domain, so NEVER a per-token hash aggregate
    (CLAUDE.md): each batch pre-reduces to (token, min doc in batch)
    with a pandas groupby, tokens shuffle ONCE into coarse hash buckets
    (pd.util.hash_array — PYTHONHASHSEED-stable), each bucket's kernel
    takes exact per-token mins (a token lives in exactly one bucket)
    and emits only its n_bins-row decile histogram; the driver folds
    O(buckets * n_bins) rows.  Exact token strings travel the shuffle —
    counts are collision-free by construction."""
    import pandas as pd

    from .algos.triangles import n_buckets_for

    ds = ds.select_columns([doc_col, text_col]).materialize()
    if ds.count() == 0:
        return pd.DataFrame({"decile": pd.Series([], dtype="int64"),
                             "new_tokens": pd.Series([], dtype="int64"),
                             "cum_vocab": pd.Series([], dtype="int64")})
    from ray.data.aggregate import Max, Min
    mm = ds.aggregate(Min(doc_col), Max(doc_col))
    lo, hi = int(mm[f"min({doc_col})"]), int(mm[f"max({doc_col})"])
    width = hi - lo + 1
    nb = n_buckets_for(8 * ds.count())  # ~tokens per doc heuristic

    def _flat(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def firsts(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(_flat(b[text_col]), r"\s+")
        toks = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        docs = b[doc_col].to_numpy(zero_copy_only=False) \
                         .astype(np.int64)[par]
        keep = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
        f = pd.DataFrame({"w": toks.to_numpy(zero_copy_only=False)[keep],
                          "fd": docs[keep]}) \
            .groupby("w", sort=False)["fd"].min().reset_index()
        wb = (pd.util.hash_array(f["w"].to_numpy(object))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"w": pa.array(f["w"].to_numpy(object),
                                       pa.string()),
                         "fd": pa.array(f["fd"].to_numpy(np.int64)),
                         "wb": pa.array(wb)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("w", sort=False)["fd"].min().to_numpy(np.int64)
        dec = np.minimum((fd - lo) * n_bins // width, n_bins - 1)
        cnt = np.bincount(dec, minlength=n_bins)
        return pd.DataFrame({"decile": np.arange(1, n_bins + 1,
                                                 dtype=np.int64),
                             "cnt": cnt.astype(np.int64)})

    parts = ds.map_batches(firsts, batch_format="pyarrow") \
              .groupby("wb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    tot = parts.groupby("decile", sort=True)["cnt"].sum()
    new = tot.to_numpy(np.int64)
    out = pd.DataFrame({"decile": tot.index.to_numpy(np.int64),
                        "new_tokens": new,
                        "cum_vocab": np.cumsum(new)})
    return out[out["new_tokens"] > 0].reset_index(drop=True)


def source_jsd(ds, source_col: str = "source", text_col: str = "text",
               round_to: int = 6) -> "pd.DataFrame":
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    token distributions (natural log) — the corpus-mixture comparison
    report of training-data curation: (src_a, src_b, jsd) for every
    source pair a < b, jsd in [0, ln 2].

    Scale shape: two passes.  Pass 1 — per-source token totals from
    map-side count_substring_regex partials (sources are a bounded
    domain; driver merge is O(sources)).  Pass 2 — per-(source, token)
    counts pre-reduced in-batch, ONE coarse token-bucket shuffle
    (pd.util.hash_array), each bucket's kernel computes its tokens'
    exact JSD contributions for ALL pairs against the broadcast totals
    (a token lives in exactly one bucket, and JSD is a sum over tokens,
    so bucket partials add exactly); the driver folds
    O(buckets * pairs) rows.  Never a per-token fine-key aggregate."""
    import pandas as pd

    from .algos.triangles import n_buckets_for

    ds = ds.select_columns([source_col, text_col]).materialize()

    def totals_part(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b[text_col], TOKEN_RE),
                    pa.int64()).to_numpy(zero_copy_only=False)
        f = pd.DataFrame({"s": b[source_col].to_numpy(
            zero_copy_only=False), "n": n}) \
            .groupby("s", sort=False)["n"].sum().reset_index()
        return pa.table({"s": pa.array(f["s"].to_numpy(object),
                                       pa.string()),
                         "n": pa.array(f["n"].to_numpy(np.int64))})

    tot = ds.map_batches(totals_part, batch_format="pyarrow") \
            .to_pandas().groupby("s", sort=True)["n"].sum()
    sources = list(tot.index)
    totals = tot.to_numpy(np.float64)
    S = len(sources)
    if S < 2:
        return pd.DataFrame({"src_a": pd.Series([], dtype="object"),
                             "src_b": pd.Series([], dtype="object"),
                             "jsd": pd.Series([], dtype="float64")})
    sid = {s: i for i, s in enumerate(sources)}
    nb = n_buckets_for(8 * ds.count())

    def counts_part(b: pa.Table) -> pa.Table:
        def _flat(a):
            return a.combine_chunks() \
                if isinstance(a, pa.ChunkedArray) else a
        lists = pc.split_pattern_regex(_flat(b[text_col]), r"\s+")
        toks = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        src = b[source_col].to_numpy(zero_copy_only=False)[par]
        keep = pc.not_equal(toks, "").to_numpy(zero_copy_only=False)
        f = pd.DataFrame(
            {"w": toks.to_numpy(zero_copy_only=False)[keep],
             "si": np.array([sid[s] for s in src[keep]], np.int64)}) \
            .groupby(["w", "si"], sort=False).size().rename("c") \
            .reset_index()
        wb = (pd.util.hash_array(f["w"].to_numpy(object))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"w": pa.array(f["w"].to_numpy(object),
                                       pa.string()),
                         "si": pa.array(f["si"].to_numpy(np.int64)),
                         "c": pa.array(f["c"].to_numpy(np.int64)),
                         "wb": pa.array(wb)})

    ia, ib = np.triu_indices(S, k=1)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["w", "si"], sort=True)["c"].sum().reset_index()
        u, winv = np.unique(agg["w"].to_numpy(object),
                            return_inverse=True)
        M = np.zeros((len(u), S), np.float64)
        np.add.at(M, (winv, agg["si"].to_numpy(np.int64)),
                  agg["c"].to_numpy(np.float64))
        P = M / totals[None, :]
        p, q = P[:, ia], P[:, ib]
        m = p + q
        with np.errstate(divide="ignore", invalid="ignore"):
            part = (np.where(p > 0, p * np.log(2.0 * p / m), 0.0)
                    + np.where(q > 0, q * np.log(2.0 * q / m), 0.0))
        return pd.DataFrame({"ai": ia, "bi": ib,
                             "part": 0.5 * part.sum(axis=0)})

    parts = ds.map_batches(counts_part, batch_format="pyarrow") \
              .groupby("wb").map_groups(kern, batch_format="pandas") \
              .to_pandas()
    s = parts.groupby(["ai", "bi"], sort=True)["part"].sum() \
             .reset_index()
    return pd.DataFrame({
        "src_a": [sources[i] for i in s["ai"]],
        "src_b": [sources[i] for i in s["bi"]],
        "jsd": np.round(s["part"].to_numpy(np.float64), round_to)})


# ------------------------------------------------------------------ DSIR

DSIR_BUCKETS = 1024


def _dsir_buckets(toks: np.ndarray, cache: dict) -> np.ndarray:
    """Hashed-feature bucket per token occurrence: sha256 head, the
    same ('0x' || substr(sha256(w), 1, 8))::UBIGINT % NB derivation as
    the SQL twin.  Hashing runs once per DISTINCT token (per-actor
    cache), never per occurrence."""
    uniq, inv = np.unique(toks, return_inverse=True)
    bk = np.empty(len(uniq), dtype=np.int64)
    for i, t in enumerate(uniq):
        b = cache.get(t)
        if b is None:
            b = int(hashlib.sha256(t.encode()).hexdigest()[:8], 16) \
                % DSIR_BUCKETS
            cache[t] = b
        bk[i] = b
    return bk[inv]


def _flat_tokens(texts: pa.ChunkedArray | pa.Array):
    """(flat token array, per-row parent indices) under the canonical
    \\s+ split with empties dropped."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern_regex(texts, r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = np.asarray(flat.to_pandas(), dtype=object)[keep]
    return toks.astype(str), parents[keep]


class DsirHistStage:
    """Pass 1 of DSIR data selection (Xie et al. 2023, "Data selection
    for language models via importance resampling"): per-batch hashed
    n-gram (unigram here) bucket histograms for the SOURCE (all docs)
    and TARGET (docs whose lang == target_lang) distributions.
    Emits <= DSIR_BUCKETS partial rows per batch — the bounded-domain
    map-side-partial + driver-fold shape."""

    def __init__(self, target_lang: str):
        self.target_lang = target_lang
        self.cache: dict = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        toks, parents = _flat_tokens(b["text"])
        if len(toks) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "src": pa.array([], pa.int64()),
                             "tgt": pa.array([], pa.int64())})
        bk = _dsir_buckets(toks, self.cache)
        is_tgt = (np.asarray(b["lang"].to_pandas(), dtype=object)
                  == self.target_lang)[parents]
        src = np.bincount(bk, minlength=DSIR_BUCKETS)
        tgt = np.bincount(bk[is_tgt], minlength=DSIR_BUCKETS)
        nz = np.nonzero(src)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "src": pa.array(src[nz].astype(np.int64)),
                         "tgt": pa.array(tgt[nz].astype(np.int64))})


class DsirScoreStage:
    """Pass 2: per-doc importance log-weight
    sum over token occurrences of
    ln((tgt_b + 1) / (T_tgt + NB)) - ln((src_b + 1) / (T_src + NB)),
    with the per-bucket log-diff table broadcast once (ray.put)."""

    def __init__(self, logdiff_ref):
        import ray

        self.ld = ray.get(logdiff_ref)
        self.cache: dict = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, parents = _flat_tokens(b["text"])
        s = np.zeros(len(ids), dtype=np.float64)
        if len(toks):
            bk = _dsir_buckets(toks, self.cache)
            np.add.at(s, parents, self.ld[bk])
        return pa.table({"doc_id": pa.array(ids),
                         "dsir_logw": pa.array(np.round(s, 6))})


def dsir_logweights(sf_dir: str, target_lang: str = "en",
                    concurrency: int = 4):
    """Hashed-unigram DSIR importance log-weights for every document
    against a target-language subcorpus: two pruned passes over
    documents (histograms, then scoring with the broadcast log-diff
    table)."""
    import os

    import ray

    from .io import read_parquet_clean
    from .runtime import pool_size

    docs1 = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text", "lang"])
    parts = docs1.map_batches(DsirHistStage, batch_format="pyarrow",
                              concurrency=pool_size(concurrency),
                              fn_constructor_args=(target_lang,)) \
                 .to_pandas()
    src = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    if len(parts):
        np.add.at(src, parts["bucket"].to_numpy(np.int64),
                  parts["src"].to_numpy(np.int64))
        np.add.at(tgt, parts["bucket"].to_numpy(np.int64),
                  parts["tgt"].to_numpy(np.int64))
    ts, tt = int(src.sum()), int(tgt.sum())
    ld = (np.log((tgt + 1.0) / (tt + DSIR_BUCKETS))
          - np.log((src + 1.0) / (ts + DSIR_BUCKETS)))
    ld_ref = ray.put(ld)

    docs2 = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    return docs2.map_batches(DsirScoreStage, batch_format="pyarrow",
                             concurrency=pool_size(concurrency),
                             fn_constructor_args=(ld_ref,))


FEATURE_DIMS = 16


def feature_hash_vectors(docs_ds, id_col: str = "doc_id",
                         col: str = "text", dims: int = FEATURE_DIMS):
    """Feature hashing (the hashing trick, Weinberger et al. 2009):
    signed hashed bag-of-words — every word occurrence adds
    sign(h) = ±1 to dimension h % dims of its document's vector.
    Pure integer arithmetic end-to-end (one batched word-hash pass +
    one bincount per batch; no shuffle, no float), emitted in long form
    (doc_id, dim, val) with zero cells dropped — the sparse layout a
    100-TB corpus wants.  SQL twin: the text_cm word-hash chain per
    distinct token, joined back to per-doc counts."""

    def fh(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wd, h, n_docs = _batch_word_hashes(b[col].to_pylist())
        if len(h) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        dim = (h % np.uint64(dims)).astype(np.int64)
        sign = 1.0 - 2.0 * ((h >> np.uint64(32)) & np.uint64(1)) \
            .astype(np.float64)
        cell = wd * dims + dim
        val = np.bincount(cell, weights=sign, minlength=n_docs * dims)
        nz = np.flatnonzero(val)
        return pa.table({
            id_col: pa.array(ids[nz // dims]),
            "dim": pa.array((nz % dims).astype(np.int64)),
            "val": pa.array(val[nz].astype(np.int64))})

    return docs_ds.map_batches(fh, batch_format="pyarrow")


# ------------------------------------------------------- linear classifier

CLF_DIMS = 1024
_CLF_PHI = 0x9E3779B97F4A7C15


def clf_weights(dims: int = CLF_DIMS) -> np.ndarray:
    """Deterministic pseudo-weights in [-0.5, 0.5): murmur-mix of
    (j+1)*PHI mod 2^64 scaled to the unit interval.  A stand-in for
    trained fastText-style quality-classifier weights — the scoring
    plumbing (hashed features, per-doc dot product, sigmoid, keep cut)
    is the real operator; swap this array for a trained model."""
    j = (np.arange(1, dims + 1, dtype=np.uint64)
         * np.uint64(_CLF_PHI))  # wraps mod 2^64
    with np.errstate(over="ignore"):
        j ^= j >> np.uint64(33)
        j *= np.uint64(0xFF51AFD7ED558CCD)
        j ^= j >> np.uint64(29)
        j *= np.uint64(0xC4CEB9FE1A85EC53)
        j ^= j >> np.uint64(32)
    return j.astype(np.float64) / 2.0**64 - 0.5


def classifier_scores(docs_ds, id_col: str = "doc_id",
                      col: str = "text", dims: int = CLF_DIMS):
    """fastText-shaped linear scoring over hashed bag-of-words features
    (the feature_hash_vectors transform composed with a broadcast weight
    vector): per doc,

        score = sum_dim(signed_count[dim] * w[dim]) / n_words
        prob  = 1 / (1 + exp(-score)),   keep = score >= 0

    Entirely map-side (no shuffle): signed per-(doc, dim) counts are
    exact integers, the dot product is one gather per batch.  SQL twin:
    pipelines._classifier_sql (identical hash chain, weight derivation
    as literal-free HUGEINT arithmetic, round-6 floats)."""
    w = clf_weights(dims)

    def score(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wd, h, n_docs = _batch_word_hashes(b[col].to_pylist())
        nw = np.bincount(wd, minlength=n_docs).astype(np.int64)
        if len(h):
            dim = (h % np.uint64(dims)).astype(np.int64)
            sign = 1 - 2 * ((h >> np.uint64(32)) & np.uint64(1)) \
                .astype(np.int64)
            cell = wd * dims + dim
            val = np.bincount(cell, weights=sign.astype(np.float64),
                              minlength=n_docs * dims) \
                .reshape(n_docs, dims)
            s = val @ w
        else:
            s = np.zeros(n_docs, dtype=np.float64)
        s = s / np.maximum(nw, 1)
        prob = 1.0 / (1.0 + np.exp(-s))
        return pa.table({
            id_col: pa.array(ids),
            "score": pa.array(np.round(s, 6)),
            "prob": pa.array(np.round(prob, 6)),
            "keep": pa.array((s >= 0).astype(np.int64))})

    return docs_ds.map_batches(score, batch_format="pyarrow")

"""Unigram-LM (SentencePiece-style) tokenizer training.

Hard-EM over the distinct-word table (Kudo 2018, arXiv:1804.10959):

  seed    candidate pieces = every substring of length <= `max_len` of
          every word, weighted by corpus word frequency (overlapping
          occurrences all count); keep the top `seed_vocab` by
          (count DESC, piece ASC) PLUS every single character (coverage
          guarantee), log-prob = ln(count / total over the kept set)
  E-step  Viterbi-segment each distinct word under the current piece
          log-probs (longest-piece wins score ties)
  M-step  piece counts under the Viterbi segmentations, weighted by
          word frequency; pieces with count 0 drop out; new log-prob =
          ln(count / total).  Pieces used by any round-r segmentation
          survive to round r+1, so every word stays segmentable.

Float discipline (the k-means/LSH rule, CLAUDE.md): log-probs are
computed with ``math.log`` — bit-identical to DuckDB ``ln()`` (both
call libm; ``np.log`` is NOT, ~20% of values differ in the last ulp)
— and every Viterbi candidate score is the same two-operand float
expression tree on both sides, so the DP argmax decisions are exactly
reproducible in SQL (pipelines._unigram_sql: unrolled EM rounds, one
recursive CTE per E-step carrying the last `max_len` DP states as
columns).

Scale shape: word counts and substring-candidate counts are map-side
partials into coarse piece-hash-bucket groupbys (a piece lives in one
bucket, so per-bucket top-V partials are globally exact before the
tiny driver merge); the E-step runs over the DISTINCT-WORD table
(sublinear in corpus size — the same bounded domain as BPE merge
training, pipelines.q_text_bpe_merges) with the vocab broadcast once
via ray.put; only vocab-bounded count partials ever reach the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"          # piece separator (pandas 2.x drops \x00)
NEG = -1e100          # -inf sentinel; any real score is > -1e50

UNI_MAX_LEN = 4       # max piece length
UNI_SEED_VOCAB = 60   # seed vocab size (single chars added on top)
UNI_ROUNDS = 3        # EM rounds
UNI_TOP_OUT = 20      # pieces reported per round


def word_counts(docs_ds, col: str = "text"):
    """Distinct (w, n) word-frequency Dataset (whitespace split,
    empties dropped) — the training domain."""
    def wpartial(b: pa.Table) -> pa.Table:
        arr = b[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lists = pc.split_pattern_regex(arr, r"\s+")
        toks = pc.list_flatten(lists).to_pandas()
        toks = toks[toks.to_numpy(object) != ""]
        vc = toks.value_counts()
        return pa.table({"w": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    return docs_ds.map_batches(wpartial, batch_format="pyarrow") \
        .groupby("w").sum("n") \
        .map_batches(lambda b: pa.table({"w": b["w"], "n": b["sum(n)"]}),
                     batch_format="pyarrow")


def _seed_vocab(words_ds, n_words: int, max_len: int, seed_vocab: int):
    """{piece: count} for the seed vocab: global top-`seed_vocab`
    substrings (count DESC, piece ASC) + all single chars.  Per-bucket
    top-V partials are globally exact (piece-hash buckets)."""
    from .algos.triangles import n_buckets_for

    nb = n_buckets_for(n_words * max_len * 4)

    def sub_partial(b: pa.Table) -> pa.Table:
        w = pd.Series(b["w"].to_pylist(), dtype=object)
        n = pd.Series(b["n"].to_numpy(zero_copy_only=False))
        parts = []
        for ln in range(1, max_len + 1):
            # vectorized: offset o piece = chars [o, o+ln) of each word
            for o in range(int(w.str.len().max() or 0)):
                p = w.str.slice(o, o + ln)
                m = p.str.len() == ln
                if m.any():
                    parts.append(pd.DataFrame(
                        {"piece": p[m], "cnt": n[m]}))
        if not parts:
            return pa.table({"piece": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "pb": pa.array([], pa.int64())})
        g = (pd.concat(parts, ignore_index=True)
             .groupby("piece", sort=False)["cnt"].sum().reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        g["pb"] = (pd.util.hash_array(g["piece"].to_numpy(object))
                   % nb).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("piece", sort=False)["cnt"].sum().reset_index()
        a["cnt"] = a["cnt"].astype(np.int64)
        chars = a[a["piece"].str.len() == 1]
        top = a.sort_values(["cnt", "piece"], ascending=[False, True],
                            kind="mergesort").head(seed_vocab)
        return (pd.concat([top, chars]).drop_duplicates("piece")
                .reset_index(drop=True))

    cand = (words_ds.map_batches(sub_partial, batch_format="pyarrow")
            .groupby("pb").map_groups(bucket_top, batch_format="pandas")
            .to_pandas())
    chars = cand[cand["piece"].str.len() == 1]
    top = cand.sort_values(["cnt", "piece"], ascending=[False, True],
                           kind="mergesort").head(seed_vocab)
    sel = pd.concat([top, chars]).drop_duplicates("piece")
    return dict(zip(sel["piece"], sel["cnt"].astype(int)))


def _viterbi(w: str, lp: dict, max_len: int):
    """(pieces, ...) — the SQL-twin DP: best[p] = max over piece
    lengths k (longest wins ties) of best[p-k] + lp[piece]."""
    n = len(w)
    best = [0.0] + [NEG] * n
    back = [0] * (n + 1)
    for p in range(1, n + 1):
        bk, bc = 0, None
        for k in range(min(max_len, p), 0, -1):
            piece_lp = lp.get(w[p - k:p])
            if piece_lp is None:
                continue
            c = best[p - k] + piece_lp
            if bc is None or c > bc:
                bk, bc = k, c
        best[p] = bc if bc is not None else NEG
        back[p] = bk
    pieces = []
    p = n
    while p > 0:
        k = back[p] or 1
        pieces.append(w[p - k:p])
        p -= k
    pieces.reverse()
    return pieces


def unigram_train(docs_ds, col: str = "text", max_len: int = UNI_MAX_LEN,
                  seed_vocab: int = UNI_SEED_VOCAB,
                  rounds: int = UNI_ROUNDS,
                  top_out: int = UNI_TOP_OUT) -> pd.DataFrame:
    """Train; returns (round, rnk, piece, n): the top `top_out` pieces
    by (Viterbi count DESC, piece ASC) after each EM round."""
    out, _ = _em_rounds(docs_ds, col, max_len, seed_vocab, rounds,
                        top_out)
    return out


def _em_rounds(docs_ds, col, max_len, seed_vocab, rounds, top_out):
    """(per-round top-out frame, final EM piece-count dict)."""
    import ray

    from .runtime import counted

    words, n_words = counted(word_counts(docs_ds, col))
    if n_words == 0:
        return pd.DataFrame({"round": pd.Series([], dtype=np.int64),
                             "rnk": pd.Series([], dtype=np.int64),
                             "piece": pd.Series([], dtype=str),
                             "n": pd.Series([], dtype=np.int64)}), {}
    counts = _seed_vocab(words, n_words, max_len, seed_vocab)

    out = []
    for r in range(1, rounds + 1):
        total = sum(counts.values())
        lp = {p: math.log(c / total) for p, c in counts.items()}
        lref = ray.put(lp)

        def estep(b: pa.Table, _lref=lref) -> pa.Table:
            d = ray.get(_lref)
            ws = b["w"].to_pylist()
            ns = b["n"].to_numpy(zero_copy_only=False)
            acc: dict = {}
            for w, n in zip(ws, ns):
                for piece in _viterbi(w, d, max_len):
                    acc[piece] = acc.get(piece, 0) + int(n)
            return pa.table({"piece": pa.array(list(acc), pa.string()),
                             "cnt": pa.array(list(acc.values()),
                                             pa.int64())})

        # vocab-bounded partials: batches x |vocab| rows, driver merge
        parts = words.map_batches(estep,
                                  batch_format="pyarrow").to_pandas()
        m = parts.groupby("piece", sort=False)["cnt"].sum()
        counts = {p: int(c) for p, c in m.items()}
        top = (pd.DataFrame({"piece": list(counts),
                             "n": list(counts.values())})
               .sort_values(["n", "piece"], ascending=[False, True],
                            kind="mergesort").head(top_out)
               .reset_index(drop=True))
        top.insert(0, "rnk", np.arange(1, len(top) + 1, dtype=np.int64))
        top.insert(0, "round", np.int64(r))
        out.append(top)
    res = pd.concat(out, ignore_index=True)
    res["n"] = res["n"].astype(np.int64)
    res["round"] = res["round"].astype(np.int64)
    return res, counts


def unigram_token_counts(docs_ds, id_col: str = "doc_id",
                         col: str = "text",
                         max_len: int = UNI_MAX_LEN,
                         seed_vocab: int = UNI_SEED_VOCAB,
                         rounds: int = UNI_ROUNDS) -> "object":
    """Tokenize the corpus with the TRAINED unigram vocab: per doc, the
    number of Viterbi pieces summed over its words — the lane a real
    pipeline runs after training (token budgeting / packing input).
    Returns a Dataset (id_col, n_tokens); per-doc counts need NO
    shuffle (a doc lives in one row).  The tokenize kernel memoizes the
    DP per distinct word per batch (corpus word distribution is
    Zipfian, so the memo hit rate is ~1)."""
    import math

    import ray

    docs_ds = docs_ds.materialize()   # train + tokenize both consume it
    _, counts = _em_rounds(docs_ds, col, max_len, seed_vocab, rounds, 1)
    total = sum(counts.values())
    lp = {p: math.log(c / total) for p, c in counts.items()}
    lref = ray.put(lp)

    def tok(b: pa.Table) -> pa.Table:
        d = ray.get(lref)
        memo: dict = {}
        ids = b[id_col].to_numpy(zero_copy_only=False)
        n_out = np.zeros(len(ids), np.int64)
        for i, t in enumerate(b[col].to_pylist()):
            n = 0
            for w in (t or "").split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = len(_viterbi(w, d, max_len))
                n += got
            n_out[i] = n
        return pa.table({id_col: pa.array(ids.astype(np.int64)),
                         "n_tokens": pa.array(n_out)})

    return docs_ds.map_batches(tok, batch_format="pyarrow")

"""Corpus-level batch kernels for training-data curation: document
frequency, per-doc repetition (Gopher-style quality signals),
benchmark n-gram decontamination.

All kernels are vectorized: polars split/explode + grouped aggregation
(Rust) or numpy windowed ops over one flat word array per batch —
never a Python loop over rows. Each consumes/produces Arrow so
``map_batches(batch_format="pyarrow")`` stays zero-copy.

Semantics mirror the DuckDB oracles in pipelines/relational.py:
tokens are a plain single-space split (empty tokens kept, exactly like
``string_split(text, ' ')``), shingles are space-joined word windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa


def _explode_words(ids, texts) -> pl.DataFrame:
    """(doc ids, texts) -> one row per word: columns (id, word)."""
    df = pl.DataFrame({
        "id": pl.Series(ids, dtype=pl.Int64),
        "word": pl.Series([s if s is not None else "" for s in texts],
                          dtype=pl.Utf8).str.split(" "),
    })
    return df.explode("word")


def repetition_stats(ids, texts) -> pa.Table:
    """Gopher-style per-document repetition signals.

    Returns (doc_id, n_words, n_distinct, dup_word_frac,
    top_word_frac): dup_word_frac = 1 - distinct/total is the
    duplicate-word fraction; top_word_frac is the mode word's share
    (the word-level analogue of Gopher's top-n-gram character
    fraction, Rae et al. 2021 §A1.3).
    """
    w = _explode_words(ids, texts)
    per_word = w.group_by(["id", "word"]).len(name="cnt")
    per_doc = (per_word.group_by("id")
               .agg(n_words=pl.col("cnt").sum(),
                    n_distinct=pl.len(),
                    top_cnt=pl.col("cnt").max())
               .sort("id"))
    n = per_doc["n_words"].to_numpy().astype(np.int64)
    d = per_doc["n_distinct"].to_numpy().astype(np.int64)
    top = per_doc["top_cnt"].to_numpy().astype(np.int64)
    return pa.table({
        "doc_id": pa.array(per_doc["id"].to_numpy(), pa.int64()),
        "n_words": pa.array(n),
        "n_distinct": pa.array(d),
        "dup_word_frac": pa.array(1.0 - d * 1.0 / n),
        "top_word_frac": pa.array(top * 1.0 / n),
    })


def df_partials(ids, texts) -> pa.Table:
    """Per-batch document-frequency partials: (token, df) where df
    counts documents *in this batch* containing the token (the
    combiner half of a count-distinct-docs groupby — the global
    groupby then sums a vocabulary-sized table, not the corpus)."""
    w = _explode_words(ids, texts).unique(subset=["id", "word"])
    g = w.group_by("word").len(name="df")
    return pa.table({"token": pa.array(g["word"].to_list(), pa.string()),
                     "df": pa.array(g["df"].to_numpy(), pa.int64())})


def shingle_strings(ids, texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """All k-word shingles of a batch: (doc_id array, shingle array).

    One flat word array for the whole batch; valid window starts are
    found with a vectorized same-doc mask; shingle strings are built
    with k-1 vectorized string adds (pandas, C-level) — no per-row
    loop.
    """
    w = _explode_words(ids, texts)
    doc = w["id"].to_numpy()
    words = pd.Series(w["word"].to_list(), dtype="object")
    n = len(words)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, object)
    starts = np.arange(n - k + 1)
    same_doc = doc[starts] == doc[starts + k - 1]
    starts = starts[same_doc]
    if len(starts) == 0:
        return np.empty(0, np.int64), np.empty(0, object)
    sh = words.iloc[starts].reset_index(drop=True)
    for j in range(1, k):
        sh = sh + " " + words.iloc[starts + j].reset_index(drop=True)
    return doc[starts].astype(np.int64), sh.to_numpy()


def unigram_partials(ids, texts) -> pa.Table:
    """Per-batch unigram-count partials (tok, c) — the combiner half of
    the corpus unigram model build: the global groupby then sums a
    vocabulary-sized table, not the corpus."""
    g = _explode_words(ids, texts).group_by("word").len(name="c")
    return pa.table({"tok": pa.array(g["word"].to_list(), pa.string()),
                     "c": pa.array(g["c"].to_numpy(), pa.int64())})


def build_unigram_model(counts, top_v: int | None = None):
    """(token, count) table → broadcastable unigram model: a
    ``(tok, lp)`` Arrow table with lp = round(ln(c/total)·1e6) in
    fixed-point micro-nats, plus the OOV floor log-prob. ``top_v``
    caps the table at the V most frequent tokens (ties broken by token
    — deterministic) with the floor prob 1/total for everything else —
    the 100 TB shape: the broadcast stays vocabulary-bounded no matter
    how large the corpus grows. ``top_v=None`` keeps the full
    vocabulary (no OOV possible when scoring the training corpus
    itself)."""
    import math
    total = float(counts["c"].sum())
    if top_v is not None and len(counts) > top_v:
        counts = (counts.sort_values(["c", "tok"],
                                     ascending=[False, True]).head(top_v))
    lp = [int(round(math.log(c / total) * 1e6)) for c in counts["c"]]
    vocab = pa.table({"tok": pa.array(counts["tok"], pa.string()),
                      "lp": pa.array(lp, pa.int64())})
    oov_lp = int(round(math.log(1.0 / total) * 1e6))
    return vocab, oov_lp


def logprob_scores(ids, texts, vocab: pa.Table,
                   oov_lp: int | None = None) -> pa.Table:
    """Per-doc unigram log-prob score against a broadcast vocab table
    ``(tok, lp)`` with lp in fixed-point micro-nats: polars explode +
    Rust hash join + per-doc integer sum — shuffle-free and
    integer-exact (no float summation order to disagree about). With
    ``oov_lp`` set (the top-V model), out-of-vocabulary tokens score
    the floor instead of being dropped."""
    w = _explode_words(ids, texts)
    v = pl.from_arrow(vocab)
    if oov_lp is None:
        j = w.join(v, left_on="word", right_on="tok", how="inner")
    else:
        j = (w.join(v, left_on="word", right_on="tok", how="left")
              .with_columns(pl.col("lp").fill_null(int(oov_lp))))
    g = (j.group_by("id")
          .agg(pl.len().alias("tok_n"), pl.col("lp").sum().alias("lp_micro_sum"))
          .sort("id"))
    return pa.table({
        "doc_id": pa.array(g["id"].to_numpy(), pa.int64()),
        "tok_n": pa.array(g["tok_n"].to_numpy(), pa.int64()),
        "lp_micro_sum": pa.array(g["lp_micro_sum"].to_numpy(), pa.int64())})


_WINDOWS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("idx", pa.int64()),
    ("wtxt", pa.string()), ("n_tokens", pa.int64())])


def token_windows(ids, texts, width: int, stride: int) -> pa.Table:
    """Token windows of a batch: one row per (doc, window index).

    Tokens are the plain single-space split (oracle-identical to
    ``string_split(text, ' ')`` — empty tokens kept, "" -> ['']).
    Window ``i`` covers tokens ``[i*stride, i*stride+width)``; windows
    are emitted while ``i*stride < n_tokens``, so every doc yields
    ``ceil(n/stride)`` rows and short tails are kept. ``width ==
    stride`` gives the non-overlapping blocks of paragraph-level dedup
    (C4 §2.2-style span dedup); ``stride < width`` gives overlapping
    RAG chunks.

    Vectorized as a loop over *window index* (bounded by the longest
    doc in the batch, typically a handful), each iteration one polars
    ``list.slice`` + ``list.join`` over the whole batch — never a
    Python loop over rows.
    """
    df = pl.DataFrame({
        "id": pl.Series(ids, dtype=pl.Int64),
        "t": pl.Series([s if s is not None else "" for s in texts],
                       dtype=pl.Utf8).str.split(" "),
    }).with_columns(n=pl.col("t").list.len().cast(pl.Int64))
    n = df["n"].to_numpy()
    parts = []
    max_windows = int(np.ceil(n.max() / stride)) if len(n) else 0
    for i in range(max_windows):
        start = i * stride
        sel = df.filter(pl.col("n") > start)
        if sel.height == 0:
            break
        w = sel.with_columns(
            wtxt=pl.col("t").list.slice(start, width).list.join(" "),
            nt=pl.min_horizontal(pl.col("n") - start,
                                 pl.lit(width, dtype=pl.Int64)))
        parts.append(pa.table({
            "doc_id": pa.array(w["id"].to_numpy(), pa.int64()),
            "idx": pa.array(np.full(w.height, i, np.int64)),
            "wtxt": w["wtxt"].to_arrow().cast(pa.string()),
            "n_tokens": pa.array(w["nt"].to_numpy().astype(np.int64)),
        }))
    if not parts:
        return _WINDOWS_SCHEMA.empty_table()
    return pa.concat_tables(parts)


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Unigram-feature importance weights log w(x) = Σ_tok [ln p_target(tok)
# − ln p_raw(tok)], Laplace add-1 smoothed over the RAW vocabulary, in
# fixed-point micro-nats so per-doc sums are integer-exact.
# ---------------------------------------------------------------------------


def dsir_partials(ids, texts, is_target) -> pa.Table:
    """Per-batch combiner for the DSIR feature model: (tok, c_raw,
    c_tgt) where c_raw counts every row and c_tgt only rows flagged as
    the target domain. The global groupby sums a vocabulary-sized
    table, never the corpus."""
    w = _explode_words(ids, texts)
    flags = pl.DataFrame({
        "id": pl.Series(ids, dtype=pl.Int64),
        "_tgt": pl.Series(np.asarray(is_target, dtype=np.int64)),
    })
    g = (w.join(flags, on="id", how="left")
          .group_by("word")
          .agg(pl.len().alias("c_raw"), pl.col("_tgt").sum().alias("c_tgt")))
    return pa.table({
        "tok": pa.array(g["word"].to_list(), pa.string()),
        "c_raw": pa.array(g["c_raw"].to_numpy(), pa.int64()),
        "c_tgt": pa.array(g["c_tgt"].to_numpy(), pa.int64())})


def build_dsir_model(counts) -> pa.Table:
    """(tok, c_raw, c_tgt) pandas frame → broadcastable (tok, dlp)
    table, dlp = round((ln((c_tgt+1)/(s_tgt+V)) −
    ln((c_raw+1)/(s_raw+V))) · 1e6) micro-nats. Add-1 smoothing over
    the raw vocabulary keeps ln finite for target-absent tokens; the
    arithmetic mirrors the SQL oracle term-for-term (same float64 ops
    in the same order)."""
    import math
    sr = float(counts["c_raw"].sum())
    st = float(counts["c_tgt"].sum())
    v = float(len(counts))
    dlp = [int(round((math.log((ct + 1) / (st + v))
                      - math.log((cr + 1) / (sr + v))) * 1e6))
           for cr, ct in zip(counts["c_raw"], counts["c_tgt"])]
    return pa.table({"tok": pa.array(counts["tok"], pa.string()),
                     "dlp": pa.array(dlp, pa.int64())})


def dsir_scores(ids, texts, model: pa.Table) -> pa.Table:
    """Per-doc DSIR importance weight against the broadcast (tok, dlp)
    model: polars explode + Rust hash join + integer sum. Inner join is
    lossless here — every scored token exists in the raw vocabulary by
    construction."""
    w = _explode_words(ids, texts)
    m = pl.from_arrow(model)
    g = (w.join(m, left_on="word", right_on="tok", how="inner")
          .group_by("id")
          .agg(pl.len().alias("tok_n"),
               pl.col("dlp").sum().alias("dsir_micro_sum"))
          .sort("id"))
    return pa.table({
        "doc_id": pa.array(g["id"].to_numpy(), pa.int64()),
        "tok_n": pa.array(g["tok_n"].to_numpy(), pa.int64()),
        "dsir_micro_sum": pa.array(g["dsir_micro_sum"].to_numpy(),
                                   pa.int64())})

"""Text analysis operators for training-data pipelines.

Pure JVM DataFrame expressions (split / transform / aggregate /
array_intersect — no Python UDFs), so every operator runs inside
whole-stage codegen and scales linearly with executors:

- :func:`words_col` / :func:`token_counts` — whitespace tokenization plus a
  BPE-ish subword estimate (ceil(len/4) per word).
- :func:`language_scores` / :func:`language_id` — stopword-ratio n-gram-free
  heuristic over small built-in stopword lists; deterministic tie-break.
- :func:`quality_score` — bounded [0,1] blend of length, stopword density,
  alpha ratio, and mean word length (the usual cheap pre-filters before
  model-based quality scoring).
- :func:`fingerprint` — order-sensitive rolling polynomial hash of the word
  sequence (Rabin-Karp style) for cheap exact-ish duplicate detection.

All arithmetic is integer/double with fixed constants so SQL oracles can
recompute results bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit",
           "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "les", "des"],
}
FP_MOD = 1_000_000_007
FP_BASE = 31


def words_col(text_col: str | Column = "text") -> Column:
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(t, " "), lambda w: w != "")


def tokenize(text_col: str | Column = "text", vocab: int = 50257) -> Column:
    """Deterministic word→token-id mapping (length/first-char hash mod
    vocab) — the engine's stand-in tokenizer for text tables (FIXTURES.md
    §2; real deployments plug a BPE here). Pure JVM expressions, and
    engine-portable: the DuckDB oracles regenerate it verbatim."""
    ws = words_col(text_col)
    return F.transform(
        ws, lambda w: ((F.length(w) * F.lit(7) + F.ascii(w))
                       % F.lit(vocab)).cast("int"))


def tokens_table(df, text_col: str = "text", id_col: str = "doc_id",
                 vocab: int = 50257, tokenizer=None):
    """documents-shaped table → the engine's input shape
    (doc_id string, tokens array<int>, n_tok int, source passthrough).

    ``tokenizer``: optional :class:`plc.bpe.BPETokenizer` — a REAL
    vocab/merges tokenizer applied as an Arrow-batched kernel; omitted,
    the JVM-expression word-hash stand-in runs (oracle-regenerable)."""
    if tokenizer is not None:
        from plc.bpe import tokens_table_bpe

        return tokens_table_bpe(df, tokenizer, text_col, id_col)
    toks = tokenize(text_col, vocab)
    keep = [c for c in ("source",) if c in df.columns]
    return df.select(F.col(id_col).cast("string").alias("doc_id"),
                     toks.alias("tokens"),
                     F.size(toks).cast("int").alias("n_tok"), *keep)


def token_counts(text_col: str | Column = "text") -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish subword estimate)."""
    ws = words_col(text_col)
    n_words = F.size(ws)
    n_subwords = F.aggregate(
        ws, F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)))
    return n_words, n_subwords


def language_scores(text_col: str | Column = "text") -> dict[str, Column]:
    """Per-language stopword hit ratio over distinct words."""
    dw = F.array_distinct(words_col(text_col))
    denom = F.greatest(F.size(dw), F.lit(1)).cast("double")
    return {lang: F.size(F.array_intersect(
        dw, F.array(*[F.lit(s) for s in sw]))).cast("double") / denom
        for lang, sw in STOPWORDS.items()}


def language_id(text_col: str | Column = "text") -> Column:
    """argmax language, 'und' (undetermined) when every score is 0.
    Tie-break: first language in en < de < es < fr alphabetical-of-listing
    order wins (deterministic, reproduced by the SQL oracle)."""
    scores = language_scores(text_col)
    order = list(STOPWORDS)
    best = None
    for lang in order:
        s = scores[lang]
        cond = F.lit(True)
        for prev in order[: order.index(lang)]:
            cond = cond & (s > scores[prev])        # strictly beat earlier
        for nxt in order[order.index(lang) + 1:]:
            cond = cond & (s >= scores[nxt])        # ties beat later
        this = F.when((s > 0) & cond, F.lit(lang))
        best = this if best is None else F.coalesce(best, this)
    return F.coalesce(best, F.lit("und"))


def quality_score(text_col: str | Column = "text") -> Column:
    """[0,1] quality blend: length saturation + stopword density + alpha
    char ratio + mean word length band. Cheap, deterministic, monotone in
    the usual junk signals (too short, symbol soup, no function words)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    ws = words_col(t)
    n_words = F.greatest(F.size(ws), F.lit(1)).cast("double")
    len_sat = F.least(F.size(ws).cast("double") / F.lit(50.0), F.lit(1.0))
    all_stop = sorted({w for sw in STOPWORDS.values() for w in sw})
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(ws), F.array(*[F.lit(s) for s in all_stop])))
    stop_density = F.least(stop_hits.cast("double") * F.lit(10.0) / n_words,
                           F.lit(1.0))
    alpha = (F.length(F.regexp_replace(t, "[^a-zA-Z ]", "")).cast("double")
             / F.greatest(F.length(t), F.lit(1)).cast("double"))
    mean_wlen = (F.aggregate(ws, F.lit(0).cast("bigint"),
                             lambda acc, w: acc + F.length(w)).cast("double")
                 / n_words)
    wlen_band = F.when((mean_wlen >= 3.0) & (mean_wlen <= 8.0), F.lit(1.0)) \
        .otherwise(F.lit(0.0))
    return (F.lit(0.3) * len_sat + F.lit(0.2) * stop_density
            + F.lit(0.3) * alpha + F.lit(0.2) * wlen_band)


def word_hash(w: Column) -> Column:
    """Engine-portable word hash: length/first/last-char mix (no builtin
    hash(), which differs across engines)."""
    return (F.length(w).cast("bigint") * F.lit(2_654_435_761)
            + F.ascii(w).cast("bigint") * F.lit(97)
            + F.ascii(F.substring(w, -1, 1)).cast("bigint") * F.lit(31)
            ) % F.lit(FP_MOD)


def fingerprint(text_col: str | Column = "text") -> Column:
    """Rolling polynomial hash over the word sequence (order-sensitive)."""
    ws = words_col(text_col)
    return F.aggregate(
        ws, F.lit(0).cast("bigint"),
        lambda acc, w: (acc * F.lit(FP_BASE) + word_hash(w)) % F.lit(FP_MOD))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: token counts, language, quality,
    fingerprint — the columns a selection/filter stage downstream needs."""
    n_words, n_subwords = token_counts(text_col)
    return df.withColumns({
        "n_words": n_words,
        "n_subwords": n_subwords,
        "lang_pred": language_id(text_col),
        "quality": F.round(quality_score(text_col), 4),
        "fp": fingerprint(text_col),
    })

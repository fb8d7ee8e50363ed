"""Sequence packing: variable-length token documents → fixed-length
training examples (the pipeline step right after encoding in an LLM
pretraining corpus; BASELINE.json's "pre-tokenized training sequences"
are exactly the input).

Semantics (deterministic, engine-portable): concatenate every document's
tokens in ``doc_id`` order (``doc_id`` must be unique — the engine's input
contract — or the tie order, and with it the packed layout, is undefined)
into one logical stream, then slice the stream
into consecutive windows of ``seq_len`` tokens. A document that straddles
a window boundary is split across the adjacent examples (standard packing
— no padding waste; the final example may be short). Because the order is
a total order on a unique key, the layout is bit-reproducible and a plain
SQL window cumsum can oracle the structure.

Scale design — no single-partition stage anywhere:

1. **Global offsets** (:func:`global_offsets`): ``repartitionByRange`` on
   the key gives an ORDER-PRESERVING bucketing; a per-bucket window cumsum
   plus an O(buckets) driver prefix merge yields each document's global
   start offset. The frame is localCheckpoint-ed first so the partition
   ids the totals were collected for are the ones the cumsum sees.
2. **Example assembly** (:func:`pack_sequences`): pure arithmetic maps a
   document to the example range [start/L, (end-1)/L]; ``sequence`` +
   ``explode`` emits one slice per covered example (almost always 1-2),
   and ONE shuffle on example_id assembles slices with
   ``array_sort(collect_list(struct(...)))`` + ``flatten``. No Python in
   the row path at all — every transform is a JVM expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_offsets", "pack_sequences", "packing_stats"]


def global_offsets(df: DataFrame, key_col: str = "doc_id",
                   weight_col: str = "n_tok", *,
                   num_buckets: int = 64) -> DataFrame:
    """Add ``_start`` = exclusive prefix sum of ``weight_col`` over global
    ``key_col`` order, without a single-partition window: range-bucket,
    per-bucket cumsum, O(buckets) driver prefix merge. NULL weights count
    as 0 (a NULL must not poison the cumsum or the driver merge)."""
    d = (df.withColumn(weight_col,
                       F.coalesce(F.col(weight_col).cast("bigint"),
                                  F.lit(0)))
         .repartitionByRange(num_buckets, key_col)
         .withColumn("_pid", F.spark_partition_id())
         .localCheckpoint())  # freeze pid assignment across the two jobs
    totals = {r["_pid"]: r["t"] or 0 for r in
              d.groupBy("_pid").agg(F.sum(weight_col).alias("t")).collect()}
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    pre = F.create_map(*[F.lit(x) for kv in prefix.items() for x in kv]) \
        if prefix else F.create_map()
    w = Window.partitionBy("_pid").orderBy(key_col)
    cum = F.sum(F.col(weight_col).cast("bigint")).over(w)
    return (d.withColumn(
        "_start",
        (cum - F.col(weight_col)
         + F.coalesce(pre[F.col("_pid")], F.lit(0))).cast("bigint"))
        .drop("_pid"))


def _null_safe_size(tokens_col: str) -> Column:
    """len(tokens) with NULL arrays counting 0 — Spark's non-ANSI
    size(NULL) is -1, which would silently shift every later offset."""
    c = F.col(tokens_col)
    return F.when(c.isNull(), F.lit(0)).otherwise(F.size(c))


def _example_spans(seq_len: int):
    """(first_example, last_example) Columns for a doc at ``_start`` with
    ``n_tok`` tokens (empty docs land in their start's example). Integer
    `div` keeps the arithmetic exact at any stream length (a double floor
    would go inexact past 2^53 total tokens)."""
    return (F.expr(f"_start div {seq_len}"),
            F.expr(f"(_start + greatest(CAST(n_tok AS BIGINT), 1) - 1) "
                   f"div {seq_len}"))


def pack_sequences(df: DataFrame, seq_len: int, *,
                   key_col: str = "doc_id", tokens_col: str = "tokens",
                   num_buckets: int = 64) -> DataFrame:
    """Materialize packed examples: (example_id, tokens, n_docs, n_tokens).
    All examples except the last hold exactly ``seq_len`` tokens; docs
    split across boundaries contribute a slice to each covered example."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive (got {seq_len})")
    d = global_offsets(df.select(key_col, tokens_col,
                                 _null_safe_size(tokens_col).alias("n_tok")),
                       key_col, "n_tok", num_buckets=num_buckets)
    first_e, last_e = _example_spans(seq_len)
    d = (d.filter(F.col("n_tok") > 0)
         .select(F.col("_start"), F.col(tokens_col).alias("_t"),
                 F.col("n_tok").cast("bigint").alias("_n"),
                 F.explode(F.sequence(first_e, last_e)).alias("example_id")))
    # slice of this doc that falls inside example e:
    #   stream interval [max(start, e*L), min(end, (e+1)*L))
    ex_lo = F.col("example_id") * seq_len
    seg_from = F.greatest(F.col("_start"), ex_lo)
    seg_to = F.least(F.col("_start") + F.col("_n"), ex_lo + seq_len)
    seg = F.slice(F.col("_t"),
                  (seg_from - F.col("_start") + 1).cast("int"),
                  (seg_to - seg_from).cast("int"))
    piece = F.struct((seg_from - ex_lo).cast("int").alias("pos"),
                     seg.alias("seg"))
    return (d.select("example_id", piece.alias("p"))
            .groupBy("example_id")
            .agg(F.flatten(F.transform(
                     F.array_sort(F.collect_list("p")), lambda s: s["seg"]))
                 .alias("tokens"),
                 F.count("*").alias("n_docs"))
            .withColumn("n_tokens", F.size("tokens").cast("bigint")))


def packing_stats(df: DataFrame, seq_len: int, *,
                  key_col: str = "doc_id", tokens_col: str = "tokens",
                  num_buckets: int = 64) -> DataFrame:
    """One-row packing plan summary straight from the offsets (no example
    materialization): total tokens, example count, boundary-straddling
    docs, and fill ratio — SQL-oracle-checkable structure."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive (got {seq_len})")
    d = global_offsets(df.select(key_col,
                                 _null_safe_size(tokens_col).alias("n_tok")),
                       key_col, "n_tok", num_buckets=num_buckets)
    first_e, last_e = _example_spans(seq_len)
    straddles = F.when((F.col("n_tok") > 0) & (last_e > first_e), 1) \
        .otherwise(0)
    return (d.agg(F.sum(F.col("n_tok").cast("bigint")).alias("total_tokens"),
                  F.sum(straddles).cast("bigint").alias("n_boundary_docs"))
            .select("total_tokens", "n_boundary_docs",
                    # integer div, like _example_spans: a double ceil goes
                    # inexact past 2^53 total tokens
                    F.expr(f"(total_tokens + {seq_len} - 1) div {seq_len}")
                    .alias("n_examples"))
            .select("total_tokens", "n_examples", "n_boundary_docs",
                    F.round(F.col("total_tokens")
                            / (F.col("n_examples") * seq_len), 6)
                    .alias("fill_ratio")))

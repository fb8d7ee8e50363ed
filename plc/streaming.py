"""Structured Streaming surface: continuous encode ingest + windowed stats.

- :func:`encode_stream` — ``writeStream.foreachBatch`` ingest: every
  microbatch runs the full batch encoder (range partition → mapInArrow
  codecs → manifest commit) into a batch-scoped directory
  ``dst/batch=<id>/``. Replayed batches (failure between sink write and
  checkpoint commit) hit the engine's own crash-recovery guard and resume
  idempotently, so the sink is exactly-once without any extra state.
- :func:`decode_stream` — union of :func:`plc.pipeline.decode` over the
  committed batch directories (each carries its own plan + manifest).
- :func:`windowed_token_stats` — watermarked tumbling-window aggregation
  over a streaming source (late rows beyond the watermark are dropped by
  Spark's state store; the query is a plain groupBy(window) so the same
  code runs batch or streaming).

Scale notes: each microbatch is an independent encode (one shuffle, its own
manifest), so stream throughput scales exactly like batch encode; the
number of batch directories is bounded by trigger cadence, and compaction
is a batch re-encode of several batch dirs into one (the manifests make
that resumable too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from plc.pipeline import PipelineConfig, decode, encode


def encode_stream(stream_df: DataFrame, dst: str, checkpoint: str,
                  cfg: PipelineConfig | None = None, *,
                  available_now: bool = True):
    """Start a streaming encode into ``dst`` (one sub-encode per
    microbatch). Returns the StreamingQuery; callers await/stop it."""
    cfg = cfg or PipelineConfig(num_partitions=4, straggler_parts=0)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bdst = f"{dst}/batch={batch_id}"
        try:
            encode(spark, batch_df, bdst, cfg, mode="error")
        except FileExistsError:
            # replayed microbatch after a crash: the fresh-run guard fired;
            # resume finishes exactly the uncommitted parts (idempotent)
            encode(spark, batch_df, bdst, cfg, resume=True)

    writer = (stream_df.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def decode_stream(spark: SparkSession, dst: str) -> DataFrame:
    """Read everything committed by :func:`encode_stream`: union of the
    per-batch decodes (each batch dir is a complete encode)."""
    from plc import fsio

    fs, root = fsio._fs_path(spark, dst)
    batches = sorted(
        st.getPath().toString() for st in fs.listStatus(root)
        if st.getPath().getName().startswith("batch="))
    out = None
    for b in batches:
        if not fsio.nonempty_dir(spark, f"{b}/_manifest/parts", ".parquet"):
            continue  # uncommitted/in-flight batch: not visible to readers
        d = decode(spark, b)
        out = d if out is None else out.unionByName(d)
    if out is None:
        raise FileNotFoundError(f"no committed stream batches under {dst}")
    return out


def windowed_token_stats(stream_df: DataFrame, *, window: str = "1 hour",
                         watermark: str = "2 hours",
                         ts_col: str = "ts") -> DataFrame:
    """Watermarked tumbling-window token statistics — the streaming-native
    aggregation shape (works unchanged on a batch DataFrame, minus the
    watermark)."""
    d = stream_df
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    return (d.groupBy(F.window(ts_col, window).alias("win"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum("n_tok").alias("total_tokens"))
            .select(F.col("win.start").alias("window_start"),
                    "n_rows", "total_tokens"))

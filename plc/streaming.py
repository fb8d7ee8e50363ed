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
                         watermark: str = "2 hours", ts_col: str = "ts",
                         session_gap: str | None = None) -> DataFrame:
    """Watermarked window token statistics — tumbling by default, session
    windows when ``session_gap`` is set. The same code runs on a batch
    DataFrame (minus the watermark)."""
    d = stream_df
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    win = (F.session_window(ts_col, session_gap) if session_gap
           else F.window(ts_col, window))
    return (d.groupBy(win.alias("win"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum("n_tok").alias("total_tokens"))
            .select(F.col("win.start").alias("window_start"),
                    "n_rows", "total_tokens"))


def stateful_dedup_stream(stream_df: DataFrame, *, n_buckets: int = 64,
                          out_cols: tuple = ("doc_id", "n_tok", "source")
                          ) -> DataFrame:
    """Cross-microbatch exact dedup as a custom stateful operator
    (``applyInPandasWithState``): rows whose content hash was seen in ANY
    earlier microbatch are dropped; first occurrence wins.

    State layout: rows carry a 128-bit md5 content hash (a 64-bit hash
    would false-drop distinct documents at billions of rows — birthday
    collisions) and are grouped by a cheap xxhash64 bucket; each bucket's
    GroupState holds the seen-hash set. Buckets shard the state across
    executors exactly like a shuffle key, so state size per task is
    |distinct|/n_buckets; a real deployment backs this with the RocksDB
    state store."""
    import pandas as pd

    content = [c for c in stream_df.columns if c in ("tokens", "text")]
    h = F.md5(F.to_json(F.struct(*content)))
    d = stream_df.select(*out_cols, h.alias("_h"),
                         F.pmod(F.xxhash64(*content),
                                F.lit(n_buckets)).alias("_b"))
    out_schema = ", ".join(f"{c} {t}" for c, t in
                           zip(d.schema.names, [f.dataType.simpleString()
                                                for f in d.schema.fields])
                           if c != "_b")
    state_schema = "seen array<string>"

    def dedup_fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf["_h"].isin(seen) &
                        ~pdf["_h"].duplicated(keep="first")]
            seen.update(fresh["_h"].tolist())
            if len(fresh):
                yield fresh.drop(columns=["_b"])
        state.update((list(seen),))

    return (d.groupBy("_b")
            .applyInPandasWithState(dedup_fn, out_schema, state_schema,
                                    "append", "NoTimeout")
            .drop("_h"))


def compact_stream(spark: SparkSession, dst: str, out_dst: str,
                   cfg: PipelineConfig | None = None, *,
                   mode: str = "error") -> dict:
    """Compact the per-microbatch encodes under ``dst`` into ONE encode at
    ``out_dst`` (decode → re-encode; resumable like any encode). Run it
    periodically so reader-side batch-dir counts stay bounded."""
    df = decode_stream(spark, dst)
    return encode(spark, df, out_dst,
                  cfg or PipelineConfig(num_partitions=8,
                                        straggler_parts=0), mode=mode)

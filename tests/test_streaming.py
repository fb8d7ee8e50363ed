"""Structured Streaming tests: microbatch encode ingest (exactly-once via
the engine's manifests), streamed decode, and watermarked window aggs."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from plc import data as D
from plc.pipeline import PipelineConfig
from plc.streaming import decode_stream, encode_stream, windowed_token_stats

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _mkfiles(src_dir, n_files=2, rows=400, seed0=0):
    for i in range(n_files):
        p = os.path.join(src_dir, f"part-{seed0 + i:03d}.parquet")
        D.synth_tokens_parquet(p, rows, regime="zipf", seed=seed0 + i)


def test_stream_encode_decode_roundtrip(spark):
    src = tempfile.mkdtemp(prefix="plc_ssrc_")
    dst = tempfile.mkdtemp(prefix="plc_sdst_")
    ckpt = tempfile.mkdtemp(prefix="plc_sck_")
    try:
        _mkfiles(src, n_files=2)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = encode_stream(stream, dst, ckpt,
                          PipelineConfig(num_partitions=3,
                                         straggler_parts=0))
        q.awaitTermination(120)
        q.stop()
        out = decode_stream(spark, dst)
        assert out.count() == 800
        batch = spark.read.parquet(src)
        assert (out.agg(F.sum("n_tok")).collect()[0][0]
                == batch.agg(F.sum("n_tok")).collect()[0][0])

        # incremental: two more files, same checkpoint → only new rows added
        _mkfiles(src, n_files=2, seed0=10)
        q2 = encode_stream(stream, dst, ckpt,
                           PipelineConfig(num_partitions=3,
                                          straggler_parts=0))
        q2.awaitTermination(120)
        q2.stop()
        assert decode_stream(spark, dst).count() == 1600

        # exactly-once: re-running with the same checkpoint and no new
        # input must not duplicate anything
        q3 = encode_stream(stream, dst, ckpt)
        q3.awaitTermination(60)
        q3.stop()
        assert decode_stream(spark, dst).count() == 1600
    finally:
        for d in (src, dst, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_windowed_stats_stream_matches_batch(spark):
    src = tempfile.mkdtemp(prefix="plc_wsrc_")
    try:
        rows = [(f"d{i}", [1, 2], 2,
                 f"2026-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00")
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, ts_s string"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        df.write.mode("overwrite").parquet(src)

        batch_res = {r["window_start"]: (r["n_rows"], r["total_tokens"])
                     for r in windowed_token_stats(df).collect()}

        stream = spark.readStream.schema(
            "doc_id string, tokens array<int>, n_tok int, ts timestamp"
        ).parquet(src)
        agg = windowed_token_stats(stream)
        q = (agg.writeStream.format("memory").queryName("winstats")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        stream_res = {r["window_start"]: (r["n_rows"], r["total_tokens"])
                      for r in spark.sql("select * from winstats").collect()}
        assert stream_res == batch_res and len(batch_res) == 24
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_decode_stream_ignores_uncommitted_batch(spark):
    src = tempfile.mkdtemp(prefix="plc_usrc_")
    dst = tempfile.mkdtemp(prefix="plc_udst_")
    ckpt = tempfile.mkdtemp(prefix="plc_uck_")
    try:
        _mkfiles(src, n_files=1)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = encode_stream(stream, dst, ckpt)
        q.awaitTermination(120)
        q.stop()
        n = decode_stream(spark, dst).count()
        # fake an in-flight batch dir (data written, manifest not committed)
        os.makedirs(os.path.join(dst, "batch=999", "data", "part_id=0"))
        assert decode_stream(spark, dst).count() == n
    finally:
        for d in (src, dst, ckpt):
            shutil.rmtree(d, ignore_errors=True)

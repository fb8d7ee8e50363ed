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


def test_stateful_dedup_across_microbatches(spark):
    """applyInPandasWithState: content seen in an earlier microbatch must
    be dropped in later ones; first occurrence wins."""
    from plc.streaming import stateful_dedup_stream

    src = tempfile.mkdtemp(prefix="plc_dsrc_")
    try:
        rows1 = [(f"a{i}", [i, i + 1, i + 2], 3, "web") for i in range(50)]
        rows2 = ([(f"b{i}", [i, i + 1, i + 2], 3, "web")     # dups of batch 1
                  for i in range(20)] +
                 [(f"c{i}", [900 + i, i, i], 3, "web") for i in range(30)])
        spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, "f1"))
        spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode(
            "overwrite").parquet(os.path.join(src, "f2"))
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src + "/*/"))
        out = stateful_dedup_stream(stream, n_buckets=8)
        q = (out.writeStream.format("memory").queryName("sdedup")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
        got = spark.sql("select * from sdedup").collect()
        ids = sorted(r["doc_id"] for r in got)
        # 50 from batch1 + 30 new from batch2; the 20 b* dups dropped
        assert len(ids) == 80, len(ids)
        assert not any(i.startswith("b") for i in ids)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_session_window_stats(spark):
    """Session windows: events within the gap merge, a gap splits."""
    rows = [("a", [1], 1, "2026-01-01 10:00:00"),
            ("b", [1], 1, "2026-01-01 10:04:00"),
            ("c", [1], 1, "2026-01-01 10:07:00"),
            ("d", [1], 1, "2026-01-01 11:00:00")]
    df = (spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))
    res = windowed_token_stats(df, session_gap="5 minutes").collect()
    sizes = sorted(r["n_rows"] for r in res)
    assert sizes == [1, 3]


def test_compact_stream(spark):
    from plc.streaming import compact_stream
    from plc.pipeline import verify

    src = tempfile.mkdtemp(prefix="plc_csrc_")
    dst = tempfile.mkdtemp(prefix="plc_cdst_")
    ckpt = tempfile.mkdtemp(prefix="plc_cck_")
    out = tempfile.mkdtemp(prefix="plc_cout_") + "/compacted"
    try:
        _mkfiles(src, n_files=2)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = encode_stream(stream, dst, ckpt,
                          PipelineConfig(num_partitions=2,
                                         straggler_parts=0))
        q.awaitTermination(120)
        q.stop()
        rep = compact_stream(spark, dst, out)
        assert rep["rows"] == 800
        assert verify(spark, decode_stream(spark, dst), out,
                      method="checksum")["mismatches"] == 0
    finally:
        for d in (src, dst, ckpt, os.path.dirname(out)):
            shutil.rmtree(d, ignore_errors=True)


def test_bloom_state_is_fixed_size():
    """VERDICT r2 #4 done-criterion: dedup state is O(1) per bucket —
    the Bloom byte array has the same length after 10 inserts and after
    100k inserts, and inserted elements are always found (no false
    negatives, ever)."""
    import numpy as np

    from plc.streaming import _bloom_positions

    m_bits = 1 << 20
    bloom = np.zeros(m_bits // 8, np.uint8)
    rng = np.random.default_rng(7)

    def insert(h1, h2):
        pos = _bloom_positions(h1, h2, m_bits)
        bits = np.zeros(m_bits, dtype=bool)
        bits[pos.ravel().astype(np.int64)] = True
        np.bitwise_or(bloom, np.packbits(bits, bitorder="little"),
                      out=bloom)

    def contains(h1, h2):
        pos = _bloom_positions(h1, h2, m_bits)
        bi = (pos >> np.uint64(3)).astype(np.int64)
        mk = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        return ((bloom[bi] & mk) == mk).all(axis=0)

    small1 = rng.integers(0, 2**63, 10).astype(np.uint64)
    small2 = rng.integers(0, 2**63, 10).astype(np.uint64)
    insert(small1, small2)
    size_after_small = bloom.nbytes
    big1 = rng.integers(0, 2**63, 100_000).astype(np.uint64)
    big2 = rng.integers(0, 2**63, 100_000).astype(np.uint64)
    insert(big1, big2)
    assert bloom.nbytes == size_after_small == m_bits // 8
    assert contains(small1, small2).all()  # no false negatives
    assert contains(big1, big2).all()
    # false-positive rate stays near theory at this load (n=100k, m=2^20,
    # k=7 -> (1-e^{-kn/m})^k ~ 0.7%): probe fresh random hashes
    probe1 = rng.integers(0, 2**63, 20_000).astype(np.uint64)
    probe2 = rng.integers(0, 2**63, 20_000).astype(np.uint64)
    fpr = contains(probe1, probe2).mean()
    assert fpr < 0.03, fpr


def test_format_stream_sink_writes_committed_batch_stores(spark):
    """df.writeStream.format("plc") — the declarative stream sink: each
    microbatch lands as a batch=<id>/ sub-store with a file-naming
    manifest and the atomic _STREAM_COMMITTED marker (encode_stream's
    exact layout), written straight through pyarrow.fs via the
    streaming.sql.batchId task property (no renames). The batch reader,
    decode_stream and readStream all consume it unchanged."""
    import glob as g

    from plc.datasource import register

    register(spark)
    src = tempfile.mkdtemp(prefix="plc_fssrc_")
    dst = tempfile.mkdtemp(prefix="plc_fsdst_") + "/store"
    ckpt = tempfile.mkdtemp(prefix="plc_fsck_")
    try:
        _mkfiles(src, n_files=4, rows=200)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "2").parquet(src))
        q = (stream.writeStream.format("plc")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(dst))
        q.awaitTermination(300)
        assert not q.isActive
        batches = sorted(g.glob(dst + "/batch=*"))
        assert len(batches) >= 2  # maxFilesPerTrigger split the input
        for b in batches:
            assert os.path.exists(b + "/_manifest/_STREAM_COMMITTED")
            man = g.glob(b + "/_manifest/parts/*.parquet")
            assert man
        total = 4 * 200
        # batch read over the stream root (manifest-named files only)
        assert spark.read.format("plc").load(dst).count() == total
        # decode_stream (the foreachBatch-era reader) sees the same store
        assert decode_stream(spark, dst).count() == total
        # readStream over the sink's own output
        out = (spark.readStream.format("plc").load(dst)
               .groupBy().count()
               .writeStream.outputMode("complete").format("memory")
               .queryName("plc_sink_rt").trigger(availableNow=True)
               .start())
        out.awaitTermination(300)
        got = spark.sql("select * from plc_sink_rt").collect()
        assert got and got[0]["count"] == total
        # an orphan planted in a committed batch's part dir is invisible
        pdir = sorted(g.glob(batches[0] + "/data/part_id=*"))[0]
        realf = g.glob(pdir + "/*.parquet")[0]
        shutil.copy(realf, pdir + "/part-zombie.parquet")
        assert spark.read.format("plc").load(dst).count() == total
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(os.path.dirname(dst), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_format_stream_sink_committed_batch_is_immutable(spark):
    """Review findings r5: a committed (marker-visible) batch must
    survive abort() of a failed replay attempt; a genuine replay commit
    (same totals) is an idempotent no-op that drops only the replay's
    duplicate files; a commit with DIFFERENT totals (a new stream reusing
    the dst with a fresh checkpoint) is refused instead of silently
    destroying committed data."""
    from plc.datasource import PLCCommit, PLCStreamWriter

    dst = tempfile.mkdtemp(prefix="plc_fsim_") + "/store"
    schema = spark.createDataFrame([], SCHEMA).schema
    w = PLCStreamWriter(dst, schema, None)
    pdir = dst + "/batch=0/data/part_id=0"
    os.makedirs(pdir)
    with open(pdir + "/f1.parquet", "wb") as f:
        f.write(b"x")
    msg = PLCCommit(0, "f1.parquet", 1, 10, 40, 160, 80, "a", "b")
    w.commit([msg], 0)
    marker = dst + "/batch=0/_manifest/_STREAM_COMMITTED"
    assert os.path.exists(marker)
    # a FAILED replay attempt aborts after the original commit: the
    # committed data survives, the replay's own files (always fresh
    # uuid names — never the committed winner) are swept
    with open(pdir + "/f1b.parquet", "wb") as f:
        f.write(b"r")
    w.abort([PLCCommit(0, "f1b.parquet", 1, 10, 40, 160, 80, "a", "b"),
             None], 0)
    assert os.path.exists(marker) and os.path.exists(pdir + "/f1.parquet")
    assert not os.path.exists(pdir + "/f1b.parquet")
    # genuine replay (same totals): idempotent, replay's file dropped
    with open(pdir + "/f2.parquet", "wb") as f:
        f.write(b"y")
    w.commit([PLCCommit(0, "f2.parquet", 1, 10, 40, 160, 80, "a", "b")], 0)
    assert os.path.exists(pdir + "/f1.parquet")
    assert not os.path.exists(pdir + "/f2.parquet")
    # dst reuse by a different stream (different totals): refused
    with pytest.raises(RuntimeError, match="immutable"):
        w.commit([PLCCommit(0, "f3.parquet", 1, 999, 0, 0, 0, "a", "b")], 0)
    # an UNcommitted batch still aborts clean
    os.makedirs(dst + "/batch=1/data/part_id=0")
    w.abort([msg], 1)
    assert not os.path.exists(dst + "/batch=1")


def test_format_stream_sink_on_file_uri(spark):
    """The stream sink resolves its target through _PlanFS like the batch
    writer — a file:// URI works end-to-end (the same path s3:///hdfs://
    take on clusters)."""
    import glob as g

    from plc.datasource import register

    register(spark)
    src = tempfile.mkdtemp(prefix="plc_fsuri_src_")
    base = tempfile.mkdtemp(prefix="plc_fsuri_dst_")
    ckpt = tempfile.mkdtemp(prefix="plc_fsuri_ck_")
    try:
        _mkfiles(src, n_files=2, rows=150)
        dst = "file://" + base + "/store"
        q = (spark.readStream.schema(SCHEMA).parquet(src)
             .writeStream.format("plc")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(dst))
        q.awaitTermination(300)
        local = base + "/store"
        assert g.glob(local + "/batch=*/_manifest/_STREAM_COMMITTED")
        assert spark.read.format("plc").load(dst).count() == 300
        assert decode_stream(spark, local).count() == 300
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_lifecycle_compact_then_expire(spark):
    """VERDICT r5 #3 — stream-root lifecycle: sink 5 microbatches through
    the FORMAT stream sink, compact them into one store, check all three
    readers agree on the compacted output, then expire exactly the
    compacted batch dirs (marker-first delete) and check the compacted
    store still reads green while the stream root is empty of them."""
    import glob as g

    from plc.datasource import register
    from plc.pipeline import verify
    from plc.streaming import (committed_batches, compact_stream,
                               expire_stream_batches)

    register(spark)
    src = tempfile.mkdtemp(prefix="plc_lcsrc_")
    root = tempfile.mkdtemp(prefix="plc_lcroot_") + "/stream"
    out = tempfile.mkdtemp(prefix="plc_lcout_") + "/compacted"
    ckpt = tempfile.mkdtemp(prefix="plc_lcck_")
    try:
        _mkfiles(src, n_files=5, rows=120)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = (stream.writeStream.format("plc")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(root))
        q.awaitTermination(300)
        batches = committed_batches(spark, root)
        assert len(batches) == 5
        srcdf = spark.read.parquet(src)
        total = srcdf.count()

        rep = compact_stream(spark, root, out,
                             PipelineConfig(num_partitions=3,
                                            straggler_parts=0))
        assert sorted(rep["batch_ids"]) == [b for b, _ in batches]
        # three readers on the compacted store: decode(), the format
        # reader, and verify() against the original source rows
        from plc.pipeline import decode

        assert decode(spark, out).count() == total
        assert spark.read.format("plc").load(out).count() == total
        assert verify(spark, srcdf, out)["mismatches"] == 0

        removed = expire_stream_batches(spark, root, rep["batch_ids"])
        assert removed == rep["batch_ids"]
        assert committed_batches(spark, root) == []
        assert not g.glob(root + "/batch=*")
        # expiry is idempotent and skips non-existent ids
        assert expire_stream_batches(spark, root, rep["batch_ids"]) == []
        # compacted store unaffected by the expiry
        assert spark.read.format("plc").load(out).count() == total
        assert verify(spark, srcdf, out)["mismatches"] == 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_format_reader_batch_ids_option(spark):
    """The batch_ids option pins a stream-root scan to exactly the named
    committed batches (the race-free compact cycle's read path); missing
    ids and plain stores are rejected."""
    import tempfile as tf

    from plc import data as D, fsio
    from plc.datasource import register
    from plc.pipeline import PipelineConfig, encode

    register(spark)
    work = tf.mkdtemp(prefix="plc_bids_")
    root = work + "/stream"
    srcp = work + "/in.parquet"
    D.synth_tokens_parquet(srcp, 300, regime="zipf", seed=5)
    df = spark.read.parquet(srcp)
    for bid in (0, 1, 2):
        bdst = f"{root}/batch={bid}"
        encode(spark, df, bdst,
               PipelineConfig(num_partitions=2, straggler_parts=0),
               mode="overwrite")
        fsio.write_text(spark, f"{bdst}/_manifest/_STREAM_COMMITTED", "1")
    all_rows = spark.read.format("plc").load(root).count()
    assert all_rows == 900
    sub = (spark.read.format("plc").option("batch_ids", "0,2").load(root))
    assert sub.count() == 600
    with pytest.raises(Exception, match="not committed"):
        (spark.read.format("plc").option("batch_ids", "0,7")
         .load(root).count())
    store = f"{root}/batch=1"  # a plain store path
    with pytest.raises(Exception, match="plain plc store"):
        (spark.read.format("plc").option("batch_ids", "1")
         .load(store).count())

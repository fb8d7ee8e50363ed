"""spark.read.format("plc") — the Python DataSource over the chunk store
(plc/datasource.py): schema, full-table equality, Catalyst column pruning,
filter pushdown → chunk pruning, zero-column count(*), typed columns."""

import glob
import os
import shutil
import tempfile

import pyarrow.parquet as pq

import pytest
from pyspark.sql import functions as F

from plc.pipeline import PipelineConfig, encode


@pytest.fixture(scope="module")
def store(spark):
    import __spark_entry__ as E

    src = E.tokens_view(spark, "/root/testdata/sf0.01")
    dst = tempfile.mkdtemp(prefix="plc_ds_store_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=6, straggler_parts=0,
                          max_chunk_values=20_000), mode="overwrite")
    from plc.datasource import register

    register(spark)
    yield src, dst
    shutil.rmtree(dst, ignore_errors=True)


def test_format_roundtrip_and_projection(spark, store):
    src, dst = store
    df = spark.read.format("plc").load(dst)
    assert df.schema == src.schema or set(df.columns) == set(src.columns)
    assert df.count() == src.count()

    def sig(d):
        return d.agg(F.sum(F.xxhash64("doc_id", "n_tok", "source",
                                      F.col("tokens").cast("string"))
                           .cast("decimal(38,0)")).alias("h"),
                     F.count("*").alias("n")).collect()[0]

    assert sig(df) == sig(src)


def test_format_filter_pushdown_prunes(spark, store):
    src, dst = store
    from plc.datasource import PLCReader, _load_plan
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    df = spark.read.format("plc").load(dst)
    tau = 30
    got = df.where(F.col("n_tok") > tau).count()
    want = src.where(F.col("n_tok") > tau).count()
    assert got == want
    # planner-level: the pushed bound must drop at least one chunk
    schema = StructType.fromJson(_load_plan(dst)["schema"])
    r_all = PLCReader(dst, schema)
    n_all = len(r_all.partitions())
    r_f = PLCReader(dst, schema)
    list(r_f.pushFilters([GreaterThan(("n_tok",), 98)]))
    n_pruned = len(r_f.partitions())
    assert n_pruned < n_all, (n_pruned, n_all)


def test_format_in_filter_batch_lookup(spark, store):
    """A pushed ``doc_id IN (...)`` prunes with per-key bloom probes: keys
    absent from the store leave zero partitions even when their values sit
    inside chunk min/max ranges, and a real IN query matches the source."""
    from plc.datasource import PLCReader, _load_plan
    from pyspark.sql.datasource import In
    from pyspark.sql.types import StructType

    src, dst = store
    real = [r["doc_id"] for r in
            src.select("doc_id").orderBy("doc_id").limit(40).collect()]
    keys = real[::13][:3]
    df = spark.read.format("plc").load(dst)
    got = sorted(r["doc_id"] for r in
                 df.where(F.col("doc_id").isin(keys))
                 .select("doc_id").collect())
    assert got == sorted(keys)
    schema = StructType.fromJson(_load_plan(dst)["schema"])
    # absent keys inside the range: bloom must prune every chunk
    r_miss = PLCReader(dst, schema)
    list(r_miss.pushFilters([In(("doc_id",),
                                tuple(k + "-absent" for k in keys))]))
    assert len(r_miss.partitions()) == 0
    # present keys: some chunk survives
    r_hit = PLCReader(dst, schema)
    list(r_hit.pushFilters([In(("doc_id",), tuple(keys))]))
    assert len(r_hit.partitions()) >= 1


def test_planner_reads_stats_lazily_and_scales(spark):
    """VERDICT r3 #2 done-criteria: (a) the planner reads only the typed
    range columns unless a pushed filter needs the stats JSON/bloom —
    at ~10^5 files the stats column (with its up-to-256 KB blooms) is the
    difference between seconds and minutes of driver wall; (b) planning
    ~200 files through the thread pool stays well under a serial footer
    walk's wall."""
    import time

    import __spark_entry__ as E
    from plc.datasource import PLCReader, _load_plan, _PlanFS
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from pyspark.sql.types import StructType

    src = E.tokens_view(spark, "/root/testdata/sf0.01")
    dst = tempfile.mkdtemp(prefix="plc_ds_many_")
    try:
        # ~200 part files: one file per range partition
        encode(spark, src, dst,
               PipelineConfig(num_partitions=200, straggler_parts=0),
               mode="overwrite")
        n_files = len(glob.glob(os.path.join(dst, "data", "part_id=*",
                                             "*.parquet")))
        assert n_files >= 150, n_files
        schema = StructType.fromJson(_load_plan(dst)["schema"])

        reads = []
        orig = _PlanFS.read_parquet

        def spy(self, path, columns):
            # columns=None = whole-table read (manifest entry listing)
            reads.append(tuple(columns) if columns is not None else None)
            return orig(self, path, columns)

        _PlanFS.read_parquet = spy
        try:
            # range-only filter: stats JSON must never be fetched
            r = PLCReader(dst, schema)
            list(r.pushFilters([GreaterThan(("n_tok",), 10)]))
            t0 = time.perf_counter()
            parts = r.partitions()
            wall = time.perf_counter() - t0
            assert parts  # the filter keeps data
            assert not any(c is not None and "stats" in c for c in reads), \
                "stats JSON read without a stats-needing filter"
            # equality probe: blooms ARE consulted, but only for files
            # whose chunks survived the range test
            reads.clear()
            probe = src.agg(F.min("doc_id")).collect()[0][0]
            r2 = PLCReader(dst, schema)
            list(r2.pushFilters([EqualTo(("doc_id",), probe)]))
            r2.partitions()
            n_stats = sum(1 for c in reads
                          if c is not None and "stats" in c)
            assert 1 <= n_stats < n_files / 2, n_stats
        finally:
            _PlanFS.read_parquet = orig
        # (b) wall bound: a serial walk at the measured per-file cost
        # (~10-30 ms each incl. open+footer) would be >> this; the pooled
        # planner at 200 files stays in single-digit seconds even under
        # tenant load
        assert wall < 8.0, f"planning {n_files} files took {wall:.1f}s"
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_format_prefix_pushdown(spark):
    """StringStartsWith pushdown: `startswith`/`LIKE 'p%'` prunes chunks
    via the [prefix, prefix+ε) range — the access pattern of the
    cell-prefixed IVF store (doc_id = 'c<cell>-<id>')."""
    from plc.datasource import PLCReader, _load_plan, _prefix_upper, register
    from pyspark.sql.datasource import StringStartsWith
    from pyspark.sql.types import StructType

    # bound helper edge cases first
    assert _prefix_upper("c00012-") == "c00012." # '-'+1 == '.'
    assert _prefix_upper("ab\U0010ffff") == "ac"
    assert _prefix_upper("\U0010ffff") is None

    df = spark.range(400).select(
        F.format_string("c%05d-%06d", (F.col("id") / 100).cast("int"), "id")
        .alias("doc_id"), F.lit("x").alias("source"))
    dst = tempfile.mkdtemp(prefix="plc_ds_prefix_")
    register(spark)
    try:
        (df.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
         .write.format("plc").option("max_chunk_values", "100")
         .mode("overwrite").save(dst))
        out = spark.read.format("plc").load(dst) \
            .where(F.col("doc_id").startswith("c00002-"))
        assert out.count() == 100
        schema = StructType.fromJson(_load_plan(dst)["schema"])
        r_all = PLCReader(dst, schema)
        n_all = len(r_all.partitions())
        r_p = PLCReader(dst, schema)
        list(r_p.pushFilters([StringStartsWith(("doc_id",), "c00002-")]))
        n_pruned = len(r_p.partitions())
        assert 1 <= n_pruned < n_all, (n_pruned, n_all)
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_partitions_track_chunks_not_files(spark):
    """A store with ONE big part file still fans out: surviving chunks
    are sliced into ≤ _CHUNKS_PER_PART partitions so scan parallelism
    tracks data volume, not file count — on a cluster, a 4-file store
    must not decode as 4 tasks."""
    import __spark_entry__ as E
    from plc.datasource import (PLCReader, _CHUNKS_PER_PART, _load_plan,
                                register)
    from pyspark.sql.types import StructType

    src = E.tokens_view(spark, "/root/testdata/sf0.01")
    dst = tempfile.mkdtemp(prefix="plc_ds_onefile_")
    try:
        encode(spark, src, dst,
               PipelineConfig(num_partitions=1, straggler_parts=0,
                              max_chunk_values=4_000), mode="overwrite")
        n_files = len(glob.glob(os.path.join(dst, "data", "part_id=*",
                                             "*.parquet")))
        schema = StructType.fromJson(_load_plan(dst)["schema"])
        parts = PLCReader(dst, schema).partitions()
        assert len(parts) > n_files  # more tasks than files
        assert all(len(p.rows) <= _CHUNKS_PER_PART for p in parts)
        # and the sliced read still returns every row exactly once
        register(spark)
        assert spark.read.format("plc").load(dst).count() == src.count()
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_read_selected_touches_only_needed_row_groups():
    """_read_selected maps global row indices to row groups and reads
    only those — the K-chunk/one-file fan-out must not cost ceil(K/4)
    full-file reads."""
    import pyarrow as pa

    from plc.datasource import _PlanFS, _read_selected

    d = tempfile.mkdtemp(prefix="plc_rgsel_")
    try:
        f = os.path.join(d, "t.parquet")
        tbl = pa.table({"v": list(range(20))})
        pq.write_table(tbl, f, row_group_size=3)  # 7 row groups
        pfs = _PlanFS(d)
        got, local = _read_selected(pfs, f, ["v"], [4, 17, 5])
        vals = got.column("v").to_pylist()
        assert [vals[i] for i in local] == [4, 17, 5]
        # only the two needed row groups were read (rows 3..5 and 15..17)
        assert got.num_rows == 6
        # full read path (rows=None) unchanged
        full, loc = _read_selected(pfs, f, ["v"], None)
        assert loc is None and full.num_rows == 20
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_format_written_store_supports_sampled_verify(spark):
    """Regression: the format writer commits bounds=[], so sampled
    verify must derive part ranges from the MANIFEST, not plan bounds
    (it crashed with IndexError before)."""
    from plc.datasource import register
    from plc.pipeline import verify

    register(spark)
    df = spark.range(300).select(
        F.format_string("d%06d", "id").alias("doc_id"),
        F.lit("s").alias("source"))
    dst = tempfile.mkdtemp(prefix="plc_ds_sv_") + "/store"
    try:
        (df.repartitionByRange(4, "doc_id").sortWithinPartitions("doc_id")
         .write.format("plc").mode("overwrite").save(dst))
        res = verify(spark, df, dst, sample_parts=0.5)
        assert res["mismatches"] == 0 and res["rows_source"] > 0
        assert verify(spark, df, dst)["mismatches"] == 0
    finally:
        shutil.rmtree(os.path.dirname(dst), ignore_errors=True)


def test_format_count_star_is_metadata_only(spark, store):
    src, dst = store
    df = spark.read.format("plc").load(dst)
    assert df.selectExpr("count(*)").collect()[0][0] == src.count()


def test_format_reads_timestamps(spark):
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("doc_id", F.format_string("ev-%012d", "event_id")))
    dst = tempfile.mkdtemp(prefix="plc_ds_ev_")
    try:
        encode(spark, ev, dst, PipelineConfig(num_partitions=2,
                                              straggler_parts=0),
               mode="overwrite")
        from plc.datasource import register

        register(spark)
        df = spark.read.format("plc").load(dst)
        assert dict(df.dtypes)["ts"] == dict(ev.dtypes)["ts"]
        a = df.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()
        b = ev.agg(F.min("ts"), F.max("ts"), F.count("*")).collect()
        assert a == b
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_format_ignores_uncommitted_parts(spark, store):
    src, dst = store
    # simulate a crashed encode: a data part dir with no manifest entry
    import pyarrow.parquet as pq

    part_files = glob.glob(os.path.join(dst, "data", "part_id=0",
                                        "*.parquet"))
    fake = os.path.join(dst, "data", "part_id=99")
    os.makedirs(fake, exist_ok=True)
    try:
        shutil.copy(part_files[0], os.path.join(fake, "stale.parquet"))
        df = spark.read.format("plc").load(dst)
        assert df.count() == src.count()  # stale part invisible
    finally:
        shutil.rmtree(fake, ignore_errors=True)


def test_format_write_roundtrip(spark, store):
    """df.write.format('plc') — the declarative encode: range-partitioned
    write, then verify() against the source and read back via the format,
    decode() and metrics() all on the same store."""
    from plc.pipeline import metrics, verify

    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_write_")
    dst = os.path.join(work, "store")
    try:
        (src.repartitionByRange(4, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.format("plc").mode("overwrite").save(dst))
        assert verify(spark, src, dst)["mismatches"] == 0
        assert spark.read.format("plc").load(dst).count() == src.count()
        assert metrics(spark, dst).count() == 4  # one part per partition
        # overwrite replaces state; a second write must not duplicate
        (src.limit(100).repartition(2)
            .write.format("plc").mode("overwrite").save(dst))
        assert spark.read.format("plc").load(dst).count() == 100
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_format_write_requires_doc_id(spark, store):
    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_write_nodoc_")
    try:
        with pytest.raises(Exception, match="doc_id"):
            (src.drop("doc_id").write.format("plc").mode("overwrite")
                .save(os.path.join(work, "s")))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_format_stream_read(spark):
    """spark.readStream.format('plc') tails an encode_stream output root:
    committed batch stores feed micro-batches (executor-side decode), and
    the aggregate matches the batch ground truth."""
    import __spark_entry__ as E
    from plc.datasource import register
    from plc.streaming import encode_stream

    register(spark)
    work = tempfile.mkdtemp(prefix="plc_ds_stream_")
    src_dir = os.path.join(work, "in")
    os.makedirs(src_dir)
    dst = os.path.join(work, "store")
    try:
        tv = E.tokens_view(spark, "/root/testdata/sf0.001").limit(200)
        tv.write.parquet(os.path.join(src_dir, "f1"))
        stream = (spark.readStream.schema(tv.schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(src_dir + "/*"))
        q = encode_stream(stream, dst, os.path.join(work, "ckpt"),
                          PipelineConfig(num_partitions=2,
                                         straggler_parts=0))
        q.awaitTermination(180)
        sq = (spark.readStream.format("plc").load(dst)
              .groupBy("source").agg(F.count("*").alias("n"))
              .writeStream.outputMode("complete").format("memory")
              .queryName("plc_ds_stream_t").trigger(availableNow=True)
              .start())
        sq.awaitTermination(180)
        got = {r["source"]: r["n"]
               for r in spark.sql("select * from plc_ds_stream_t").collect()}
        want = {r["source"]: r["n"] for r in
                tv.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_pruning_equivalence_with_select_chunks(spark):
    """Review fix companion: the DataSource's Python chunk-survival
    predicate and pipeline.select_chunks' Column expressions must prune
    IDENTICAL chunk sets for the same bounds (doc_id range, weight range,
    and a temporal range) — shared constants, cross-checked here."""
    import datetime

    from plc.datasource import PLCReader, _load_plan
    from plc.pipeline import select_chunks
    from pyspark.sql.datasource import (GreaterThanOrEqual,
                                        LessThanOrEqual)
    from pyspark.sql.types import StructType

    ev = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .withColumn("doc_id", F.format_string("ev-%012d", "event_id")))
    mn = ev.agg(F.min("ts")).collect()[0][0]
    dst = tempfile.mkdtemp(prefix="plc_eq_")
    try:
        encode(spark, ev, dst,
               PipelineConfig(num_partitions=6, straggler_parts=0,
                              max_chunk_values=1500), mode="overwrite")
        lo = (mn + datetime.timedelta(days=8)).isoformat(sep=" ")
        hi = (mn + datetime.timedelta(days=16)).isoformat(sep=" ")
        cases = [
            ({"ts": (lo, hi)},
             [GreaterThanOrEqual(("ts",), lo), LessThanOrEqual(("ts",), hi)]),
            ({"value": (0.0, 0.4)},
             [GreaterThanOrEqual(("value",), 0.0),
              LessThanOrEqual(("value",), 0.4)]),
            ({"doc_id": ("ev-000000000100", "ev-000000000700")},
             [GreaterThanOrEqual(("doc_id",), "ev-000000000100"),
              LessThanOrEqual(("doc_id",), "ev-000000000700")]),
        ]
        schema = StructType.fromJson(_load_plan(dst)["schema"])
        for filt, pushed in cases:
            n_pipeline = select_chunks(spark, dst, filters=filt)[0].count()
            r = PLCReader(dst, schema)
            list(r.pushFilters(pushed))
            n_ds = sum(len(p.rows) if p.rows is not None else
                       pq.read_table(p.file, columns=["chunk_idx"]).num_rows
                       for p in r.partitions())
            assert n_ds == n_pipeline, (filt, n_ds, n_pipeline)
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_stream_root_batch_read_and_marker_gating(spark):
    """Review fixes: (a) a stream root reads as a BATCH union of committed
    batches; (b) a batch with manifest files but NO atomic commit marker
    (crash mid-commit) is invisible to both readers."""
    import __spark_entry__ as E
    from plc.datasource import register
    from plc.streaming import decode_stream, encode_stream

    register(spark)
    work = tempfile.mkdtemp(prefix="plc_ds_root_")
    src_dir = os.path.join(work, "in")
    os.makedirs(src_dir)
    dst = os.path.join(work, "store")
    try:
        tv = E.tokens_view(spark, "/root/testdata/sf0.001").limit(150)
        tv.write.parquet(os.path.join(src_dir, "f1"))
        stream = (spark.readStream.schema(tv.schema)
                  .parquet(src_dir + "/*"))
        q = encode_stream(stream, dst, os.path.join(work, "ckpt"),
                          PipelineConfig(num_partitions=2,
                                         straggler_parts=0))
        q.awaitTermination(180)
        # batch read over the root
        df = spark.read.format("plc").load(dst)
        assert df.count() == 150
        # simulate a partially-committed batch: manifest parquet present,
        # marker absent → invisible everywhere
        committed = sorted(glob.glob(os.path.join(dst, "batch=*")))[0]
        partial = os.path.join(dst, "batch=999")
        shutil.copytree(committed, partial)
        os.unlink(os.path.join(partial, "_manifest", "_STREAM_COMMITTED"))
        assert spark.read.format("plc").load(dst).count() == 150
        assert decode_stream(spark, dst).count() == 150
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_format_reads_file_uri(spark, store):
    """The planner routes filesystem access through pyarrow.fs, so a
    ``file:`` URI store reads identically to the plain path (and the same
    machinery resolves s3://, hdfs://, ... on clusters that carry those
    pyarrow filesystems)."""
    from plc.datasource import register

    src, dst = store
    register(spark)
    df = spark.read.format("plc").load(f"file://{dst}")
    assert df.count() == src.count()
    got = {r["source"]: r["n"] for r in
           df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    want = {r["source"]: r["n"] for r in
            src.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_format_write_bad_doc_id_type_fails_at_planning(spark):
    """A non-string doc_id fails at planning time with the cast hint
    (not an executor ArrowTypeError)."""
    from plc.datasource import register

    register(spark)
    df = spark.range(10).select(F.col("id").alias("doc_id"),
                                F.lit("a").alias("source"))
    dst = tempfile.mkdtemp(prefix="plc_ds_badtype_")
    try:
        with pytest.raises(Exception, match="doc_id to be a string"):
            df.write.format("plc").mode("overwrite").save(dst + "/store")
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_format_write_uri_and_orphan_invisibility(spark):
    """VERDICT r4 #2: format writes work on pyarrow.fs URIs (file://
    here — the same _PlanFS resolution the read side uses for s3/hdfs),
    the manifest NAMES each part's winning data file, and a zombie/
    speculative-attempt orphan planted in a part dir is invisible to the
    format reader, decode() and verify() alike."""
    import glob as g

    import pyarrow.parquet as papq

    from plc.datasource import register
    from plc.pipeline import decode, verify

    register(spark)
    base = tempfile.mkdtemp(prefix="plc_ds_uri_")
    try:
        src = spark.range(400).select(
            F.format_string("d%07d", F.col("id")).alias("doc_id"),
            F.sequence(F.lit(1), (F.col("id") % 7 + 3).cast("int"))
            .cast("array<int>").alias("tokens"),
            (F.col("id") % 7 + 3).cast("int").alias("n_tok"),
            F.lit("s").alias("source"))
        dst = "file://" + base + "/store"
        (src.repartitionByRange(4, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.format("plc").mode("overwrite").save(dst))
        local = base + "/store"
        n = spark.read.format("plc").load(dst).count()
        assert n == 400
        # manifest names exactly the committed files
        man = papq.read_table(
            g.glob(local + "/_manifest/parts/*.parquet")[0])
        named = [f for f in man.column("file").to_pylist() if f]
        on_disk = {os.path.basename(p) for p in
                   g.glob(local + "/data/part_id=*/*.parquet")}
        assert set(named) == on_disk
        # plant an orphan: a copy of a real part file under a new name
        pdir = sorted(g.glob(local + "/data/part_id=*"))[0]
        realf = g.glob(pdir + "/*.parquet")[0]
        shutil.copy(realf, pdir + "/part-zombie-late-attempt.parquet")
        assert spark.read.format("plc").load(local).count() == 400
        assert decode(spark, local).count() == 400
        res = verify(spark, src, local, method="checksum")
        assert res["mismatches"] == 0, res
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bloom_point_lookup_prunes_inside_range(spark, store):
    """doc_id bloom pruning: an equality probe for a value that falls
    INSIDE a chunk's [min_doc_id, max_doc_id] range but is absent from the
    store must prune every chunk (range stats alone cannot), while a real
    doc_id still decodes to exactly its row — on both the pipeline
    (select_chunks JVM expression) and the DataSource (Python probe)."""
    from plc.datasource import PLCReader, _load_plan
    from plc.pipeline import decode, select_chunks
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    src, dst = store
    real = src.select("doc_id").orderBy("doc_id").limit(2).collect()
    probe_real = real[0]["doc_id"]
    probe_fake = probe_real + "-missing"  # sorts between real ids

    n_real = select_chunks(
        spark, dst, filters={"doc_id": (probe_real, probe_real)})[0].count()
    n_fake = select_chunks(
        spark, dst, filters={"doc_id": (probe_fake, probe_fake)})[0].count()
    assert n_real >= 1
    assert n_fake == 0

    rows = decode(spark, dst,
                  filters={"doc_id": (probe_real, probe_real)}).count()
    assert rows == 1

    schema = StructType.fromJson(_load_plan(dst)["schema"])
    for probe, want in ((probe_real, n_real), (probe_fake, 0)):
        r = PLCReader(dst, schema)
        list(r.pushFilters([EqualTo(("doc_id",), probe)]))
        import pyarrow.parquet as _pq

        n_ds = sum(len(p.rows) if p.rows is not None else
                   _pq.read_table(p.file, columns=["chunk_idx"]).num_rows
                   for p in r.partitions())
        assert n_ds == want, (probe, n_ds, want)


def _n_chunks_planned(reader):
    import pyarrow.parquet as _pq

    return sum(len(p.rows) if p.rows is not None else
               _pq.read_table(p.file, columns=["chunk_idx"]).num_rows
               for p in reader.partitions())


def test_or_of_ranges_via_filters_option(spark, store):
    """The Python DS pushdown API never delivers Or trees (flat
    conjunction only), so disjunctive range scans go through
    .option("filters", json) — multi-range chunk pruning at planning
    plus an exact row mask in the reader (VERDICT r4 #6)."""
    import json as _json

    from plc.datasource import PLCReader, _load_plan
    from pyspark.sql.types import StructType

    src, dst = store
    mn, mx = src.agg(F.min("n_tok"), F.max("n_tok")).collect()[0]
    lo_hi, hi_lo = mn + 1, mx - 1  # two tail bands of the distribution
    spec = {"n_tok": [[None, lo_hi], [hi_lo, None]]}
    df = (spark.read.format("plc")
          .option("filters", _json.dumps(spec)).load(dst))
    want = src.filter((F.col("n_tok") <= lo_hi) |
                      (F.col("n_tok") >= hi_lo)).count()
    assert df.count() == want and 0 < want < src.count()
    # rows outside the ranges are filtered EXACTLY (not just pruned)
    bad = df.filter((F.col("n_tok") > lo_hi) &
                    (F.col("n_tok") < hi_lo)).count()
    assert bad == 0

    # chunk-touch accounting: the disjunction prunes chunks (both bands
    # sit in the n_tok distribution tails, so mid-range chunks drop)
    schema = StructType.fromJson(_load_plan(dst)["schema"])
    n_all = _n_chunks_planned(PLCReader(dst, schema))
    spec_narrow = {"n_tok": [[mn, mn], [mx, mx]]}  # extreme tails only
    n_or = _n_chunks_planned(PLCReader(
        dst, schema, filters_opt=_json.dumps(spec_narrow)))
    assert 0 < n_or < n_all, (n_or, n_all)
    # unknown column / temporal column → planning-time error
    with pytest.raises(Exception, match="unknown column"):
        spark.read.format("plc").option(
            "filters", '{"nope": [[1, 2]]}').load(dst).count()


def test_isnotnull_isnull_pushdown_prunes_all_null_chunks(spark):
    """IsNull prunes null-free chunks (explicit user predicate — it may
    trigger the stats fetch); IsNotNull prunes all-NULL chunks but only
    OPPORTUNISTICALLY — Catalyst auto-infers isnotnull() next to every
    comparison, so it must never be the sole trigger of the stats-JSON
    slow path (VERDICT r3 #2 planner fast path; review finding r5)."""
    from plc.datasource import PLCReader, _load_plan, _PlanFS, register
    from pyspark.sql.datasource import (GreaterThan, GreaterThanOrEqual,
                                        IsNotNull, IsNull)
    from pyspark.sql.types import StructType

    register(spark)
    # doc_id range-partitions the store, so source IS NULL for the low
    # half of the id range concentrates all-null chunks there
    src = spark.range(2000).select(
        F.format_string("n%07d", F.col("id")).alias("doc_id"),
        F.sequence(F.lit(1), F.lit(4)).cast("array<int>").alias("tokens"),
        F.lit(4).cast("int").alias("n_tok"),
        F.when(F.col("id") >= 1000, F.lit("web")).alias("source"))
    dst = tempfile.mkdtemp(prefix="plc_ds_nulls_") + "/store"
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0,
                          max_chunk_values=1000), mode="overwrite")
    schema = StructType.fromJson(_load_plan(dst)["schema"])
    n_all = _n_chunks_planned(PLCReader(dst, schema))

    reads = []
    orig = _PlanFS.read_parquet

    def spy(self, path, columns):
        reads.append(tuple(columns) if columns is not None else None)
        return orig(self, path, columns)

    _PlanFS.read_parquet = spy
    try:
        # the realistic Catalyst shape — a comparison plus its inferred
        # isnotnull — must stay on the typed-column fast path (no stats
        # fetch, no pruning regression at 10^5 files)
        r_fast = PLCReader(dst, schema)
        list(r_fast.pushFilters([GreaterThan(("n_tok",), 1),
                                 IsNotNull(("n_tok",))]))
        n_fast = _n_chunks_planned(r_fast)
        assert not any(c == ("stats",) for c in reads), \
            "inferred IsNotNull triggered the stats slow path"
        assert n_fast == n_all
    finally:
        _PlanFS.read_parquet = orig

    # explicit IS NULL: prunes null-free chunks (stats fetch is earned)
    r_in = PLCReader(dst, schema)
    list(r_in.pushFilters([IsNull(("source",))]))
    n_in = _n_chunks_planned(r_in)
    assert n_in < n_all, (n_in, n_all)
    # IsNotNull prunes all-null chunks opportunistically when stats are
    # already being read (here: a generic bound on the same stats-only
    # column, which by itself prunes nothing)
    r_b = PLCReader(dst, schema)
    list(r_b.pushFilters([GreaterThanOrEqual(("source",), "a")]))
    n_bound = _n_chunks_planned(r_b)
    r_nn = PLCReader(dst, schema)
    list(r_nn.pushFilters([GreaterThanOrEqual(("source",), "a"),
                           IsNotNull(("source",))]))
    n_nn = _n_chunks_planned(r_nn)
    assert n_nn < n_bound, (n_nn, n_bound)  # all-null chunks pruned
    assert n_nn + n_in >= n_all             # superset pruning, no loss
    # end-to-end counts stay exact (Spark re-filters)
    df = spark.read.format("plc").load(dst)
    assert df.filter(F.col("source").isNotNull()).count() == 1000
    assert df.filter(F.col("source").isNull()).count() == 1000


def test_filters_option_matches_decode_differentially(spark, store):
    """Differential hardening for the OR-of-ranges option: for random
    multi-range specs, the format read with .option('filters') must
    return exactly the rows decode(filters=) returns (same pruning
    semantics, same exact row mask), including open bounds and ranges
    that select nothing."""
    import json as _json
    import random

    from plc.pipeline import decode

    src, dst = store
    mn, mx = src.agg(F.min("n_tok"), F.max("n_tok")).collect()[0]
    rng = random.Random(20260817)
    for trial in range(6):
        n_ranges = rng.randint(1, 3)
        ranges = []
        for _ in range(n_ranges):
            lo = rng.choice([None, rng.randint(mn - 5, mx + 5)])
            hi = rng.choice([None, rng.randint(mn - 5, mx + 5)])
            if lo is not None and hi is not None and lo > hi:
                lo, hi = hi, lo
            ranges.append([lo, hi])
        spec = {"n_tok": ranges}
        fmt = (spark.read.format("plc")
               .option("filters", _json.dumps(spec)).load(dst)
               .selectExpr("doc_id", "n_tok"))
        dec = decode(spark, dst,
                     filters={"n_tok": [tuple(r) for r in ranges]},
                     columns=["doc_id", "n_tok"])
        got = sorted((r["doc_id"], r["n_tok"]) for r in fmt.collect())
        want = sorted((r["doc_id"], r["n_tok"]) for r in dec.collect())
        assert got == want, (trial, spec, len(got), len(want))


# -- chunks metadata view (stats-backed aggregate fast path, r6) -----------


def test_chunks_view_exact_aggregates(spark, store):
    """sum/min/max/count served from per-chunk metadata must equal the
    same aggregates computed from the decoded data — the served values
    are exact by construction, not estimates."""
    src, dst = store
    ch = spark.read.format("plc").option("view", "chunks").load(dst)
    got = ch.agg(F.sum("n_rows").alias("cnt"),
                 F.sum("n_tokens").alias("sum_w"),
                 F.min("min_w").alias("min_w"),
                 F.max("max_w").alias("max_w"),
                 F.min("min_doc_id").alias("min_doc"),
                 F.max("max_doc_id").alias("max_doc")).collect()[0]
    want = src.agg(F.count("*").alias("cnt"),
                   F.sum("n_tok").alias("sum_w"),
                   F.min("n_tok").alias("min_w"),
                   F.max("n_tok").alias("max_w"),
                   F.min("doc_id").alias("min_doc"),
                   F.max("doc_id").alias("max_doc")).collect()[0]
    assert got.asDict() == want.asDict()
    # null counts ride in the stats JSON: count(col) is servable too
    nn = ch.agg(F.sum("n_rows") - F.sum(
        F.get_json_object("stats", "$.source.nulls").cast("bigint"))
    ).collect()[0][0]
    assert nn == src.where(F.col("source").isNotNull()).count()


def test_chunks_view_store_agg_and_part_ids(spark, store):
    src, dst = store
    from plc.datasource import store_agg

    row = store_agg(spark, dst).collect()[0]
    assert row["n_rows"] == src.count()
    assert row["sum_w"] == src.agg(F.sum("n_tok")).collect()[0][0]
    assert row["n_chunks"] > 1 and row["enc_bytes"] > 0
    # part_id is synthesized from the directory name (not stored in the
    # file): it must cover every committed part
    ch = spark.read.format("plc").option("view", "chunks").load(dst)
    pids = {r[0] for r in ch.select("part_id").distinct().collect()}
    from plc.pipeline import _manifest_path

    want = {r[0] for r in spark.read.parquet(_manifest_path(dst))
            .select("part_id").collect()}
    assert pids == want


def test_chunks_view_never_reads_payload(store, monkeypatch):
    """The 'zero payload bytes' guarantee, asserted at the I/O layer: a
    driver-side pass over the chunks-view reader with the pruned
    projection SELECT sum(n_tokens) must never request the payload column
    (pq.read_table with a column list reads only those column chunks)."""
    from plc.datasource import PLCChunksReader, _PlanFS
    from pyspark.sql.types import StructType

    src, dst = store
    reader = PLCChunksReader(dst, StructType.fromDDL("n_tokens bigint"))
    parts = reader.partitions()
    assert parts
    requested = []
    orig = _PlanFS.read_parquet

    def spy(self, path, columns):
        if "/data/" in path:
            requested.append(columns)
        return orig(self, path, columns)

    monkeypatch.setattr(_PlanFS, "read_parquet", spy)
    total = 0
    for p in parts:
        for rb in reader.read(p):
            import pyarrow.compute as pc

            total += pc.sum(rb.column("n_tokens")).as_py()
    assert requested and all(cols == ["n_tokens"] for cols in requested)
    assert total == src.agg(F.sum("n_tok")).collect()[0][0]


def test_chunks_view_count_star_reads_no_columns(store, monkeypatch):
    """Zero-column projection over the chunks view (counting chunks)
    comes straight from parquet footers — read_parquet is never called
    on a data file."""
    from plc.datasource import PLCChunksReader, _PlanFS
    from pyspark.sql.types import StructType

    src, dst = store
    reader = PLCChunksReader(dst, StructType([]))
    parts = reader.partitions()
    calls = []
    orig = _PlanFS.read_parquet

    def spy(self, path, columns):
        if "/data/" in path:
            calls.append(path)
        return orig(self, path, columns)

    monkeypatch.setattr(_PlanFS, "read_parquet", spy)
    n = sum(rb.num_rows for p in parts for rb in reader.read(p))
    assert not calls
    want = sum(pq.ParquetFile(f).metadata.num_rows for f in
               glob.glob(os.path.join(dst, "data", "*", "*.parquet")))
    assert n == want  # chunk count matches the footers exactly


# -- overwrite crash-safety (deferred delete, r6) --------------------------


def test_format_overwrite_failure_preserves_old_store(spark, store):
    """Overwriting an existing store must destroy nothing at planning
    time: a write job that fails mid-task aborts by deleting only its
    own files, and the old store (manifest + named files) stays fully
    readable (VERDICT r5 'what's wrong' #2)."""
    from plc.pipeline import verify

    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_owr_")
    dst = os.path.join(work, "store")
    try:
        (src.repartitionByRange(3, "doc_id")
            .write.format("plc").mode("overwrite").save(dst))
        before = spark.read.format("plc").load(dst).count()
        poisoned = src.withColumn(
            "n_tok",
            F.when(F.col("n_tok") >= 0,
                   F.expr("raise_error('boom')").cast("int"))
            .otherwise(F.col("n_tok")))
        with pytest.raises(Exception, match="boom"):
            (poisoned.repartition(2)
             .write.format("plc").mode("overwrite").save(dst))
        # old store intact: same rows, verify green, no leaked job files
        assert spark.read.format("plc").load(dst).count() == before
        assert verify(spark, src, dst)["mismatches"] == 0
        files = glob.glob(os.path.join(dst, "data", "*", "*.parquet"))
        named = set()
        for m in glob.glob(os.path.join(dst, "_manifest", "parts",
                                        "*.parquet")):
            named |= set(pq.read_table(m).column("file").to_pylist())
        assert {os.path.basename(f) for f in files} == named
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_format_overwrite_sweeps_stale_generation(spark, store):
    """A successful in-place overwrite commits the new manifest first,
    then reclaims every file of the replaced generation — including
    whole part dirs whose pid the new store doesn't use."""
    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_ows_")
    dst = os.path.join(work, "store")
    try:
        (src.repartitionByRange(4, "doc_id")
            .write.format("plc").mode("overwrite").save(dst))
        old_files = set(glob.glob(os.path.join(dst, "data", "*",
                                               "*.parquet")))
        (src.limit(50).repartition(2)
            .write.format("plc").mode("overwrite").save(dst))
        assert spark.read.format("plc").load(dst).count() == 50
        new_files = set(glob.glob(os.path.join(dst, "data", "*",
                                               "*.parquet")))
        assert not (old_files & new_files)
        # stale pids (2, 3) from the 4-part generation are gone entirely
        dirs = {os.path.basename(d)
                for d in glob.glob(os.path.join(dst, "data", "part_id=*"))}
        assert dirs == {"part_id=0", "part_id=1"}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_encode_resume_on_format_store_raises(spark, store):
    """encode(resume=True) on a format-written store used to be a silent
    no-op (every part committed, pending predicate = false); it now
    fails loudly (ADVICE r5)."""
    from plc.pipeline import PipelineConfig, encode

    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_rsf_")
    dst = os.path.join(work, "store")
    try:
        (src.repartition(2).write.format("plc").mode("overwrite")
            .save(dst))
        with pytest.raises(ValueError, match="format"):
            encode(spark, src, dst, PipelineConfig(num_partitions=2),
                   resume=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -- orphan GC (r6) --------------------------------------------------------


def test_gc_reclaims_post_sweep_zombies(spark, store):
    """VERDICT r5 missing #4: a zombie attempt finishing AFTER commit's
    best-effort sweep leaves an invisible-but-permanent file; plc.gc
    reclaims it once it ages past the grace period, never touches young
    files or manifest-named data, and the store stays verify-green."""
    import time as _time

    import plc
    from plc.pipeline import verify

    src, _ = store
    work = tempfile.mkdtemp(prefix="plc_ds_gc_")
    dst = os.path.join(work, "store")
    try:
        (src.repartitionByRange(3, "doc_id")
            .write.format("plc").mode("overwrite").save(dst))
        pdir = sorted(glob.glob(os.path.join(dst, "data", "part_id=*")))[0]
        real = glob.glob(os.path.join(pdir, "*.parquet"))[0]
        old_zombie = os.path.join(pdir, "part-zombie-old.parquet")
        young_zombie = os.path.join(pdir, "part-zombie-young.parquet")
        shutil.copy(real, old_zombie)
        shutil.copy(real, young_zombie)
        past = _time.time() - 7200
        os.utime(old_zombie, (past, past))

        rep = plc.gc(dst, grace_sec=3600)
        assert [os.path.basename(p) for p in rep["removed"]] == \
            ["part-zombie-old.parquet"]
        assert rep["kept_young"] == 1
        assert not os.path.exists(old_zombie)
        assert os.path.exists(young_zombie)  # inside grace: protected
        assert os.path.exists(real)          # manifest-named: never GC'd
        assert verify(spark, src, dst)["mismatches"] == 0
        # second pass after the young zombie ages
        os.utime(young_zombie, (past, past))
        rep2 = plc.gc(dst, grace_sec=3600)
        assert [os.path.basename(p) for p in rep2["removed"]] == \
            ["part-zombie-young.parquet"]
        assert verify(spark, src, dst)["mismatches"] == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_gc_stream_root_drops_aged_uncommitted_batch(spark):
    """On a stream root, gc sweeps committed batches like stores and
    removes an UNcommitted batch dir (crashed before its marker) only
    once every file in it is older than the grace period."""
    import time as _time

    import plc
    from plc import data as D
    from plc.pipeline import PipelineConfig, encode

    root = tempfile.mkdtemp(prefix="plc_ds_gcs_") + "/stream"
    try:
        srcp = os.path.join(os.path.dirname(root), "in.parquet")
        D.synth_tokens_parquet(srcp, 300, regime="zipf", seed=3)
        df = spark.read.parquet(srcp)
        from plc import fsio

        for bid in (0, 1):
            bdst = f"{root}/batch={bid}"
            encode(spark, df, bdst,
                   PipelineConfig(num_partitions=2, straggler_parts=0),
                   mode="overwrite")
            fsio.write_text(spark, f"{bdst}/_manifest/_STREAM_COMMITTED",
                            "1")
        # crashed batch: data but no marker
        crashed = f"{root}/batch=2"
        encode(spark, df, crashed,
               PipelineConfig(num_partitions=2, straggler_parts=0),
               mode="overwrite")
        os.remove(os.path.join(crashed, "_manifest", "plan.json"))
        shutil.rmtree(os.path.join(crashed, "_manifest"))

        rep = plc.gc(root, grace_sec=3600)
        assert os.path.isdir(crashed)  # young: protected
        past = _time.time() - 7200
        for dirpath, _dirs, files in os.walk(crashed):
            for f in files:
                os.utime(os.path.join(dirpath, f), (past, past))
        rep2 = plc.gc(root, grace_sec=3600)
        assert not os.path.exists(crashed)
        assert rep2["removed"] and rep2["removed"][0].endswith("batch=2")
        from plc.streaming import decode_stream

        assert decode_stream(spark, root).count() == 600
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def test_gc_skips_foreign_batch_dir_names(spark):
    """A stream-root dir whose name merely starts with ``batch=`` but is
    not integer-suffixed (user scratch, tooling leftovers) is not a
    batch: gc must skip it untouched instead of crashing on int()."""
    import plc

    root = tempfile.mkdtemp(prefix="plc_ds_gcf_") + "/stream"
    try:
        foreign = os.path.join(root, "batch=tmpjunk")
        os.makedirs(foreign)
        with open(os.path.join(foreign, "notes.txt"), "w") as f:
            f.write("not a batch")
        rep = plc.gc(root, grace_sec=0)
        assert rep["removed"] == []
        assert os.path.isdir(foreign)
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def test_chunks_view_rejects_filters_option(spark, store):
    """The multi-range 'filters' option selects data rows; combining it
    with the metadata view would silently ignore it — it must raise."""
    _src, dst = store
    with pytest.raises(Exception, match="data.*view|filters"):
        (spark.read.format("plc").option("view", "chunks")
         .option("filters", '[{"column": "n_tok", "ranges": [[1, 2]]}]')
         .load(dst).count())

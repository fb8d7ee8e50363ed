"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship encode→manifest pipeline on sf0.001;
``queries``/``oracle_sql`` expose the engine's relational surface
(SURVEY.md §2 Part B: stats pre-pass, partition planning, skew threshold,
resume anti-join, verification join, metrics roll-ups, run-length stats)
against the driver testdata, each checked against DuckDB.

Non-SQL-expressible entries (the encode/decode round trip itself) have no
oracle_sql → driver records a rows-only check; full bit-identity is covered
by ``python -m pytest -x -q`` (tests/test_pipeline.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def tokens_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tokens table derived from ``documents`` (FIXTURES.md §2):
    the engine's input shape (doc_id string, tokens array<int>, n_tok, source)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.expr(
        "transform(filter(split(text, ' '), w -> w <> ''), "
        "w -> cast((length(w) * 7 + ascii(w)) % 50257 as int))")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship E1: encode the documents-derived tokens view of sf0.001 with
    the full pipeline (range partition + skew salt + mapInArrow codecs +
    manifests), then return the per-partition lineage manifest (rows > 0)."""
    from plc.pipeline import PipelineConfig, encode, _manifest_path

    src = tokens_view(spark, "/root/testdata/sf0.001")
    dst = tempfile.mkdtemp(prefix="plc_entry_")
    encode(spark, src, dst, PipelineConfig(num_partitions=8, straggler_parts=2),
           mode="overwrite")
    return spark.read.parquet(_manifest_path(dst)).orderBy("part_id")


# --------------------------------------------------------------------------
# oracle-checked relational surface
# --------------------------------------------------------------------------


def _stats_cardinality(spark, sf):
    """K10 stats pre-pass: per-source cardinality/range stats."""
    return (_t(spark, sf, "documents").groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("doc_id").alias("n_distinct_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


def _range_partition_bounds(spark, sf):
    """P2 planning: quantile range bounds over the partition key."""
    docs = _t(spark, sf, "documents")
    b = docs.select("doc_id", F.ntile(8).over(
        Window.orderBy("doc_id")).alias("bucket"))
    return (b.groupBy("bucket")
            .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
                 F.count("*").alias("n_rows")))


def _skew_threshold(spark, sf):
    """P3: exact q0.999 straggler threshold (τ)."""
    return _t(spark, sf, "documents").agg(
        F.round(F.expr("percentile(n_chars, 0.999)"), 4).alias("tau"))


def _resume_anti_join(spark, sf):
    """P6: pending = all parts ∖ committed (left_anti)."""
    parts = (_t(spark, sf, "documents")
             .select(F.pmod("doc_id", F.lit(16)).alias("part_id")).distinct())
    committed = spark.range(8).select(F.col("id").alias("part_id"))
    return parts.join(committed, "part_id", "left_anti")


def _verify_join(spark, sf):
    """P7 skeleton: equi-join + per-row equality count."""
    a = _t(spark, sf, "documents").alias("a")
    b = _t(spark, sf, "documents").alias("b")
    return (a.join(b, F.col("a.doc_id") == F.col("b.doc_id"))
            .filter(F.col("a.n_chars") == F.col("b.n_chars"))
            .agg(F.count("*").alias("n_verified")))


def _metrics_rollup(spark, sf):
    """P5 lineage metrics roll-up shape."""
    return (_t(spark, sf, "documents").groupBy("lang")
            .agg(F.sum("n_chars").alias("total_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 F.count("*").alias("n_docs")))


def _rle_run_lengths(spark, sf):
    """K10 run-length statistic: runs of `source` in doc_id order."""
    docs = _t(spark, sf, "documents")
    w = Window.orderBy("doc_id")
    runs = docs.select(
        F.when(F.lag("source").over(w).isNull() |
               (F.lag("source").over(w) != F.col("source")), 1)
        .otherwise(0).alias("is_start"))
    return runs.agg(F.sum("is_start").alias("n_runs"),
                    F.count("*").alias("n_rows"))


def _dict_candidates(spark, sf):
    """K11 selector inputs: per-column cardinalities."""
    return _t(spark, sf, "documents").agg(
        F.countDistinct("source").alias("card_source"),
        F.countDistinct("lang").alias("card_lang"),
        F.count("*").alias("n"))


def _offsets_invariant(spark, sf):
    """K9 invariant analogue: n_chars must equal length(text)."""
    return _t(spark, sf, "documents").agg(
        F.sum(F.when(F.length("text") != F.col("n_chars"), 1)
              .otherwise(0)).alias("n_bad"),
        F.count("*").alias("n"))


def _tokenize_histogram(spark, sf):
    """Documents→tokens derivation (entry() input): top token frequencies."""
    tv = tokens_view(spark, sf)
    return (tv.select(F.explode("tokens").alias("token_id"))
            .groupBy("token_id").agg(F.count("*").alias("freq"))
            .orderBy(F.desc("freq"), "token_id").limit(50))


def _partial_agg_rollup(spark, sf):
    """Map-side partial aggregation shape (TPC-H Q1 style) on lineitem."""
    return (_t(spark, sf, "lineitem")
            .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


def _broadcast_dim_join(spark, sf):
    """Broadcast small-dim join (manifest-style lookup)."""
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    return (cust.join(F.broadcast(nat),
                      cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_acctbal")))


def _embedding_norms(spark, sf):
    """Vector column handling: L2 norms over array<float> (decode-side
    numeric plane sanity)."""
    emb = _t(spark, sf, "embeddings")
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return (emb.select("vec_id", F.round(norm, 4).alias("l2_norm"))
            .orderBy("vec_id").limit(100))


def _events_tumbling_count(spark, sf):
    """Time-window batch aggregation over the events stream table
    (SURVEY.md §2 Part B: streaming-looking queries are plain batch here)."""
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour").start.alias("bucket_start"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy("bucket_start"))


def _topk_orders(spark, sf):
    """Sort/limit/top-k surface: highest-value orders, deterministic order."""
    return (_t(spark, sf, "orders")
            .select("o_orderkey",
                    F.round("o_totalprice", 2).alias("price"),
                    "o_orderpriority")
            .orderBy(F.desc("price"), "o_orderkey").limit(25))


def _encode_manifest(spark, sf):
    """Non-SQL: full pipeline on the sf's documents-derived tokens view;
    returns the lineage manifest (rows-only driver check)."""
    from plc.pipeline import PipelineConfig, encode, _manifest_path

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_q_")
    encode(spark, src, dst, PipelineConfig(num_partitions=8, straggler_parts=2),
           mode="overwrite")
    return spark.read.parquet(_manifest_path(dst)).orderBy("part_id")


def _roundtrip_check(spark, sf):
    """Non-SQL: encode→decode→join equality counts (token-array equality
    per row, BASELINE.json)."""
    from plc.pipeline import PipelineConfig, encode, verify

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_rt_")
    encode(spark, src, dst, PipelineConfig(num_partitions=6, straggler_parts=2),
           mode="overwrite")
    res = verify(spark, src, dst)
    return spark.createDataFrame(
        [(res["mismatches"], res["rows_source"], res["rows_decoded"],
          res["raw_bytes"], res["enc_bytes"])],
        "mismatches bigint, rows_source bigint, rows_decoded bigint, "
        "raw_bytes bigint, enc_bytes bigint")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stats_cardinality": _stats_cardinality,
        "range_partition_bounds": _range_partition_bounds,
        "skew_threshold": _skew_threshold,
        "resume_anti_join": _resume_anti_join,
        "verify_join": _verify_join,
        "metrics_rollup": _metrics_rollup,
        "rle_run_lengths": _rle_run_lengths,
        "dict_candidates": _dict_candidates,
        "offsets_invariant": _offsets_invariant,
        "tokenize_histogram": _tokenize_histogram,
        "partial_agg_rollup": _partial_agg_rollup,
        "broadcast_dim_join": _broadcast_dim_join,
        "embedding_norms": _embedding_norms,
        "events_tumbling_count": _events_tumbling_count,
        "topk_orders": _topk_orders,
        "encode_manifest": _encode_manifest,
        "roundtrip_check": _roundtrip_check,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stats_cardinality": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT doc_id) AS n_distinct_docs,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY source
        """,
        "range_partition_bounds": """
            WITH b AS (SELECT doc_id,
                              ntile(8) OVER (ORDER BY doc_id) AS bucket
                       FROM documents)
            SELECT bucket, min(doc_id) AS lo, max(doc_id) AS hi,
                   count(*) AS n_rows
            FROM b GROUP BY bucket
        """,
        "skew_threshold": """
            SELECT round(percentile_cont(0.999) WITHIN GROUP
                         (ORDER BY n_chars), 4) AS tau
            FROM documents
        """,
        "resume_anti_join": """
            SELECT DISTINCT doc_id % 16 AS part_id FROM documents
            EXCEPT SELECT range AS part_id FROM range(8)
        """,
        "verify_join": """
            SELECT count(*) AS n_verified
            FROM documents a JOIN documents b USING (doc_id)
            WHERE a.n_chars = b.n_chars
        """,
        "metrics_rollup": """
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 4) AS avg_chars,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "rle_run_lengths": """
            WITH r AS (SELECT CASE WHEN lag(source) OVER (ORDER BY doc_id)
                                        IS DISTINCT FROM source
                                   THEN 1 ELSE 0 END AS is_start
                       FROM documents)
            SELECT CAST(sum(is_start) AS BIGINT) AS n_runs,
                   count(*) AS n_rows FROM r
        """,
        "dict_candidates": """
            SELECT count(DISTINCT source) AS card_source,
                   count(DISTINCT lang) AS card_lang, count(*) AS n
            FROM documents
        """,
        "offsets_invariant": """
            SELECT CAST(sum(CASE WHEN length(text) <> n_chars
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
                   count(*) AS n
            FROM documents
        """,
        "tokenize_histogram": """
            WITH toks AS (
                SELECT unnest(list_transform(
                           list_filter(string_split(text, ' '), w -> w <> ''),
                           w -> CAST((length(w) * 7 + ascii(w)) % 50257
                                     AS INTEGER))) AS token_id
                FROM documents)
            SELECT token_id, count(*) AS freq FROM toks
            GROUP BY token_id ORDER BY freq DESC, token_id LIMIT 50
        """,
        "partial_agg_rollup": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "broadcast_dim_join": """
            SELECT n_name, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS total_acctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                       AS l2_norm
            FROM embeddings ORDER BY vec_id LIMIT 100
        """,
        "events_tumbling_count": """
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY bucket_start ORDER BY bucket_start
        """,
        "topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS price,
                   o_orderpriority
            FROM orders ORDER BY price DESC, o_orderkey LIMIT 25
        """,
        # encode_manifest / roundtrip_check: not SQL-expressible (custom
        # columnar codecs inside mapInArrow) → rows-only driver check.
    }

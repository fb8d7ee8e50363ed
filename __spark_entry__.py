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
    the engine's input shape (doc_id string, tokens array<int>, n_tok,
    source) via the library tokenizer (plc.textstats.tokens_table)."""
    from plc.textstats import tokens_table

    return tokens_table(_t(spark, sf_dir, "documents"))


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


def _coarse_bucket(docs, nb: int = 64):
    """Range-disjoint coarse buckets on doc_id (integer arithmetic from one
    min/max/count aggregate). The scale-clean substitute for a global
    window: per-bucket windows shuffle by bucket, and cross-bucket state is
    O(nb), never O(rows)."""
    mn, mx, n = docs.agg(F.min("doc_id"), F.max("doc_id"),
                         F.count("*")).collect()[0]
    span = (mx - mn + 1) if mx is not None else 1
    coarse = F.least(F.floor(((F.col("doc_id") - F.lit(mn)) * nb) / span),
                     F.lit(nb - 1)).cast("int")
    return coarse, int(n)


def _range_partition_bounds(spark, sf):
    """P2 planning: exact ntile(8) bounds computed the distributed way —
    per-bucket row_number + broadcast cumulative offsets (two-phase exact
    ranking), not a single-partition global window. Results are identical
    to ntile(8) OVER (ORDER BY doc_id); the oracle keeps that form."""
    docs = _t(spark, sf, "documents")
    coarse, n = _coarse_bucket(docs)
    d = docs.select("doc_id", coarse.alias("_c"))
    counts = {r[0]: r[1] for r in d.groupBy("_c").count().collect()}
    offs, acc = {}, 0
    for c in sorted(counts):
        offs[c], acc = acc, acc + counts[c]
    omap = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
    w = Window.partitionBy("_c").orderBy("doc_id")
    k, size, rem = 8, n // 8, n % 8
    ranked = d.withColumn("rn", F.row_number().over(w) + omap[F.col("_c")])
    bucket = F.when(
        F.col("rn") <= rem * (size + 1),
        F.expr(f"(rn - 1) div {size + 1}")).otherwise(
        F.lit(rem) + F.expr(f"(rn - {rem * (size + 1)} - 1) div {size}"))
    b = ranked.select("doc_id", (bucket + 1).cast("int").alias("bucket"))
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
    """K10 run-length statistic: runs of `source` in doc_id order, computed
    per coarse bucket (partitioned window) with an O(buckets) boundary
    correction — no row ever crosses a single-partition exchange."""
    docs = _t(spark, sf, "documents")
    coarse, _ = _coarse_bucket(docs)
    d = docs.select("doc_id", "source", coarse.alias("_c"))
    w = Window.partitionBy("_c").orderBy("doc_id")
    is_start = F.when(F.lag("source").over(w).isNull() |
                      (F.lag("source").over(w) != F.col("source")),
                      1).otherwise(0)
    per = (d.select("_c", "doc_id", "source", is_start.alias("s"))
           .groupBy("_c")
           .agg(F.sum("s").alias("starts"), F.count("*").alias("rows"),
                F.min(F.struct("doc_id", "source")).alias("first"),
                F.max(F.struct("doc_id", "source")).alias("last")))
    stats = {r["_c"]: r for r in per.collect()}  # ≤ 64 rows, one job
    order = sorted(stats)
    total_starts = sum(stats[c]["starts"] for c in order)
    n_rows = sum(stats[c]["rows"] for c in order)
    boundary = sum(
        1 for a, b in zip(order, order[1:])
        if stats[a]["last"]["source"] == stats[b]["first"]["source"])
    return spark.createDataFrame([(total_starts - boundary, n_rows)],
                                 "n_runs bigint, n_rows bigint")


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


# --------------------------------------------------------------------------
# LLM-data-pipeline operators: dedup / similarity / text analysis
# (plc.dedup, plc.similarity, plc.textstats — each oracled in DuckDB by
# regenerating the same deterministic constants)
# --------------------------------------------------------------------------


def _format_read_agg(spark, sf):
    """P8: encode the tokens view into the engine's store, then query it
    back through ``spark.read.format("plc")`` — Catalyst filter pushdown
    prunes chunks via the stored stats, column pruning skips undecoded
    frames, and the aggregate must match DuckDB computing the same thing
    from the raw documents table (the storage layer is oracled
    end-to-end)."""
    from plc.datasource import register
    from plc.pipeline import PipelineConfig, encode

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_qfmt_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0,
                          max_chunk_values=1_000_000), mode="overwrite")
    register(spark)
    df = spark.read.format("plc").load(dst)
    return (df.where(F.col("n_tok") > 10)
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens")))


def _format_multirange_agg(spark, sf):
    """P8e (r5): OR-of-ranges through the declarative read — the Python
    DS pushdown API only delivers flat conjunctions, so disjunctive range
    scans ride the ``.option("filters", json)`` escape hatch: multi-range
    chunk pruning at planning plus an exact row mask in the reader
    (decode()'s K26 semantics from pure SQL reads). Two disjoint n_tok
    bands aggregated per source; the oracle recomputes the same OR
    predicate straight from the documents table."""
    import json as _json

    from plc.datasource import register
    from plc.pipeline import PipelineConfig, encode

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_qfmr_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0,
                          max_chunk_values=500_000), mode="overwrite")
    register(spark)
    spec = {"n_tok": [[None, 40], [120, None]]}
    df = (spark.read.format("plc")
          .option("filters", _json.dumps(spec)).load(dst))
    return (df.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("total_tokens"),
                 F.min("n_tok").alias("min_tok"),
                 F.max("n_tok").alias("max_tok")))


def _format_agg_pushdown(spark, sf):
    """r6: stats-backed aggregate fast path — count/sum/min/max of the
    weight column and min/max(doc_id) served ENTIRELY from per-chunk
    metadata via the chunks view (``.option("view", "chunks")``): the
    payload column is never read, so the same answers that would decode
    every chunk come from an O(chunks) metadata scan. The oracle computes
    the identical aggregates from the raw documents table — metadata
    exactness is the property under test."""
    from plc.datasource import register
    from plc.pipeline import PipelineConfig, encode

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_qagg_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0,
                          max_chunk_values=500_000), mode="overwrite")
    register(spark)
    ch = spark.read.format("plc").option("view", "chunks").load(dst)
    return ch.agg(F.sum("n_rows").alias("n_docs"),
                  F.sum("n_tokens").alias("total_tokens"),
                  F.min("min_w").alias("min_tok"),
                  F.max("max_w").alias("max_tok"),
                  F.min("min_doc_id").alias("min_doc"),
                  F.max("max_doc_id").alias("max_doc"))


def _chunks_null_stats(spark, sf):
    """r6: per-column NULL accounting and null-skipping min/max served
    from the chunks metadata view alone (K10 ``column_stats`` records
    ``nulls`` for every column and ``pc.min_max`` skips nulls): plant
    nulls in a string and an int column, encode, then answer
    count(col) / count-of-nulls / min / max with ZERO payload bytes
    read. The oracle recomputes the same aggregates from the raw
    documents table."""
    from plc.datasource import register
    from plc.pipeline import PipelineConfig, encode

    src = (tokens_view(spark, sf)
           .withColumn("opt_src", F.expr("nullif(source, 'src7')"))
           .withColumn("opt_w", F.expr(
               "CASE WHEN n_tok % 3 = 0 THEN CAST(NULL AS BIGINT) "
               "ELSE CAST(n_tok AS BIGINT) END")))
    dst = tempfile.mkdtemp(prefix="plc_qnull_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0,
                          max_chunk_values=500_000), mode="overwrite")
    register(spark)
    ch = spark.read.format("plc").option("view", "chunks").load(dst)
    null_src = F.get_json_object("stats", "$.opt_src.nulls").cast("bigint")
    null_w = F.get_json_object("stats", "$.opt_w.nulls").cast("bigint")
    return ch.agg(
        F.sum("n_rows").alias("n_docs"),
        F.sum(null_src).alias("null_src"),
        F.sum(null_w).alias("null_w"),
        (F.sum("n_rows") - F.sum(null_w)).alias("cnt_w"),
        F.min(F.get_json_object("stats", "$.opt_w.min")
              .cast("bigint")).alias("wmin"),
        F.max(F.get_json_object("stats", "$.opt_w.max")
              .cast("bigint")).alias("wmax"))


def _dedup_exact_stats(spark, sf):
    """Exact dedup statistics per source (hash-groupBy, one shuffle)."""
    from plc.dedup import exact_dedup_stats

    return exact_dedup_stats(_t(spark, sf, "documents"), "text", "doc_id",
                             "source")


def _dedup_minhash_pairs(spark, sf):
    """MinHash-LSH near-dup candidates + exact-Jaccard verification over
    the documents-derived tokens view (shingle k=3, H=8, 4 bands)."""
    from plc.dedup import candidate_pairs, jaccard_verify

    tv = tokens_view(spark, sf)
    # materialize the candidate pairs once: both the candidate counter and
    # the verify path consume them, and verify additionally re-reads them
    # for its candidate-key semi-join (plc.dedup.jaccard_verify)
    pairs = candidate_pairs(tv, "doc_id", "tokens", num_hashes=8, bands=4,
                            seed=42, shingle_k=3).localCheckpoint()
    ver = jaccard_verify(pairs, tv, "doc_id", "tokens", shingle_k=3,
                         threshold=0.5)
    return (pairs.agg(F.count("*").alias("n_candidates"))
            .crossJoin(ver.agg(F.count("*").alias("n_verified"),
                               F.round(F.sum("jaccard"), 4)
                               .alias("sum_jaccard"))))


def _knn_cosine_topk(spark, sf):
    """Exact top-5 cosine neighbours for 3 query vectors (brute-force
    baseline; broadcast query side, partitioned ranking window)."""
    from plc.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    q = emb.filter("vec_id < 3").select(F.col("vec_id").alias("query_id"),
                                        "embedding")
    out = brute_force_topk(emb, q, k=5)
    return out.select("query_id", "vec_id",
                      F.col("cos").alias("cos_sim"),
                      F.col("rank").cast("bigint").alias("rnk"))


def _ann_lsh_buckets(spark, sf):
    """Random-hyperplane LSH bucket histogram (12 planes over 64 dims)."""
    from plc.similarity import hyperplane_signature

    emb = _t(spark, sf, "embeddings")
    sig = emb.select(hyperplane_signature(
        F.col("embedding"), dim=64, n_planes=12, seed=42).alias("sig"))
    per = sig.groupBy("sig").agg(F.count("*").alias("c"))
    return per.agg(F.sum("c").alias("n_rows"),
                   F.count("*").alias("n_buckets"),
                   F.max("c").alias("max_bucket"))


def _embedding_near_dup(spark, sf):
    """Embedding near-duplicate pairs (cos ≥ 0.9) via LSH bucket-local
    self-join — never an all-pairs product."""
    from plc.similarity import near_dup_pairs

    emb = _t(spark, sf, "embeddings")
    pairs = near_dup_pairs(emb, dim=64, threshold=0.9, n_planes=8,
                           n_tables=1, seed=42)
    return pairs.agg(F.count("*").alias("n_pairs"),
                     F.max("cos").alias("max_cos"))


def _lang_quality_profile(spark, sf):
    """Text analysis roll-up: predicted language × quality/subword stats."""
    from plc.textstats import text_profile

    prof = text_profile(_t(spark, sf, "documents"))
    return (prof.groupBy("lang_pred")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.sum("quality"), 4).alias("sum_quality"),
                 F.sum("n_subwords").alias("total_subwords")))


def _fingerprint_stats(spark, sf):
    """Rolling-hash document fingerprints: uniqueness + extrema."""
    from plc.textstats import fingerprint

    fp = _t(spark, sf, "documents").select(fingerprint("text").alias("fp"))
    return fp.agg(F.count("*").alias("n"),
                  F.countDistinct("fp").alias("n_unique_fp"),
                  F.min("fp").alias("min_fp"), F.max("fp").alias("max_fp"))


def _simhash_near_dup(spark, sf):
    """Banded SimHash near-dup statistics over the tokens view: 56-bit
    per-bit universal-hash signatures (Arrow kernel), 4×14-bit bands
    (pigeonhole-exact for hamming ≤ 3), exact Hamming verify. Computed
    over distinct contents with multiplicity weights — exact aggregates
    without materializing the quadratic exact-dup pair list (the oracle
    counts the naive way and must match bit-identically)."""
    from plc.dedup import simhash_near_dup_stats

    tv = tokens_view(spark, sf)
    return simhash_near_dup_stats(tv, "doc_id", bits=56, bands=4, seed=42,
                                  max_hamming=3)


def _dedup_minhash_survivors(spark, sf):
    """Non-SQL: full near-dup removal (LSH → verify → connected components
    → keep min doc_id per cluster). Rows-only driver check; planted-dup
    correctness is covered by tests/test_dedup.py."""
    from plc.dedup import dedup_minhash

    tv = tokens_view(spark, sf)
    out = dedup_minhash(tv, "doc_id", "tokens", num_hashes=8, bands=4,
                        seed=42, shingle_k=3, threshold=0.7)
    return out.select("doc_id", "n_tok", "source").orderBy("doc_id")


def _ivf_recall_check(spark, sf):
    """Non-SQL (iterative k-means): IVF index PERSISTED through the
    engine's own store (cell-clustered chunks → storage-layer probe
    pruning), searched at nprobe=12/16 cells and self-verified against
    brute-force top-5. Asserts the ≥0.8 recall floor so the driver entry
    can actually fail (VERDICT r2 #5). The driver embeddings are
    UNclustered (near-random 64-dim), where IVF recall tracks the probed
    mass — hence the wide nprobe here (recall across SFs 0.84-0.96,
    incl. the 100-vector sf0.001 where small-sample noise dominates);
    recall ≥0.8 at nprobe=2 on a
    clustered corpus is asserted in tests/test_similarity.py."""
    from plc.similarity import (brute_force_topk, ivf_assign, ivf_store,
                                ivf_topk_stored, ivf_train)

    emb = _t(spark, sf, "embeddings")
    q = emb.filter("vec_id < 5").select(F.col("vec_id").alias("query_id"),
                                        "embedding")
    cent = ivf_train(emb, dim=64, n_centroids=16, iters=5)
    indexed = ivf_assign(emb, cent)
    dst = tempfile.mkdtemp(prefix="plc_qivf_")
    ivf_store(spark, indexed, dst, num_partitions=4)
    # brute-force truth and the stored-index search are independent
    # actions — concurrent jobs fill the cluster instead of two walls
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_b = pool.submit(lambda: brute_force_topk(emb, q, k=5).collect())
        f_a = pool.submit(lambda: ivf_topk_stored(
            spark, dst, q, cent, k=5, nprobe=12).collect())
        brute, approx = f_b.result(), f_a.result()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for r in approx
               if r["vec_id"] in truth.get(r["query_id"], set()))
    total = sum(len(v) for v in truth.values())
    recall = hits / max(total, 1)
    assert recall >= 0.8, f"IVF recall {recall:.3f} below the 0.8 floor"
    return spark.createDataFrame(
        [(len(truth), hits, total, round(recall, 4))],
        "n_queries bigint, hits bigint, total bigint, recall double")


def _encode_embeddings(spark, sf):
    """Non-SQL: encode the embeddings table (float32 list planes) through
    the full pipeline; returns the lineage manifest (rows-only check)."""
    from plc.pipeline import PipelineConfig, encode, _manifest_path

    emb = _t(spark, sf, "embeddings").select(
        F.format_string("vec-%010d", "vec_id").alias("doc_id"),
        "vec_id", "embedding", "label")
    dst = tempfile.mkdtemp(prefix="plc_qe_")
    encode(spark, emb, dst, PipelineConfig(num_partitions=4,
                                           straggler_parts=0),
           mode="overwrite")
    return spark.read.parquet(_manifest_path(dst)).orderBy("part_id")


def _curate_corpus(spark, sf):
    """Non-SQL (iterative connected components inside): the composed
    training-data curation funnel — quality/language profile → quality
    floor → exact + MinHash near-dup removal → tokenize → encode into the
    store. Returns the funnel counters + encode report (rows-only check;
    monotonicity asserted so the entry can fail)."""
    from plc.curate import curate

    docs = _t(spark, sf, "documents")
    dst = tempfile.mkdtemp(prefix="plc_qcur_") + "/store"
    rep = curate(spark, docs, dst, quality_min=0.4,
                 near_dup_threshold=0.7, mode="overwrite")
    assert rep["n_input"] >= rep["n_quality"] >= rep["n_deduped"] > 0, rep
    assert rep["rows"] == rep["n_deduped"], rep
    return spark.createDataFrame(
        [(rep["n_input"], rep["n_quality"], rep["n_deduped"],
          rep["raw_bytes"], rep["enc_bytes"])],
        "n_input bigint, n_quality bigint, n_deduped bigint, "
        "raw_bytes bigint, enc_bytes bigint")


def _encode_events(spark, sf):
    """Non-SQL: encode the events table (timestamp TYPED plane + int64/
    string/double planes) through the full pipeline; returns the lineage
    manifest (rows-only check). Proves every driver table round-trips
    through the engine's own store (VERDICT r2 'Next round' #1)."""
    from plc.pipeline import PipelineConfig, encode, verify, _manifest_path

    ev = (_t(spark, sf, "events")
          .withColumn("doc_id", F.format_string("ev-%012d", "event_id")))
    dst = tempfile.mkdtemp(prefix="plc_qev_")
    encode(spark, ev, dst, PipelineConfig(num_partitions=4,
                                          straggler_parts=0),
           mode="overwrite")
    res = verify(spark, ev, dst)
    assert res["mismatches"] == 0, res
    return spark.read.parquet(_manifest_path(dst)).orderBy("part_id")


_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _hash_split_counts(spark, sf):
    """Reproducible dataset split: per-split doc/token totals from the
    key-deterministic md5 split hash (plc/curate.py hash_split) — the
    oracle regenerates the identical hash arithmetic in DuckDB, so split
    assignment is engine-portable by construction."""
    from plc.curate import hash_split

    tv = tokens_view(spark, sf)
    return (hash_split(tv, _SPLIT_WEIGHTS, seed=42)
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens")))


def _hash_split_sql() -> str:
    from plc.curate import SPLIT_MOD

    names = list(_SPLIT_WEIGHTS)
    acc, cases = 0.0, []
    for name in names[:-1]:
        acc += _SPLIT_WEIGHTS[name]
        cases.append(f"WHEN hv < {int(round(acc * SPLIT_MOD))} "
                     f"THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return f"""
        WITH tv AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                           len({_TOKENS_SQL}) AS n_tok
                    FROM documents),
             h AS (SELECT n_tok,
                          ('0x' || substring(md5(doc_id || ':42'), 1, 12))
                              ::BIGINT % {SPLIT_MOD} AS hv
                   FROM tv)
        SELECT {case} AS split, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens
        FROM h GROUP BY split
    """


def _decontamination_stats(spark, sf):
    """Benchmark decontamination over the tokens view: docs whose id ends
    in 7 play the benchmark; every training doc sharing ANY 13-gram with
    it is dropped (plc.dedup.decontaminate — exploded-shingle semi-join,
    never a pair product). The oracle regenerates the per-step-modulus
    shingles at k=13 and counts the same sets."""
    from plc.dedup import decontaminate

    tv = tokens_view(spark, sf)
    is_bench = F.col("doc_id").cast("int") % 10 == F.lit(7)
    bench = tv.filter(is_bench)
    train = tv.filter(~is_bench)
    kept = decontaminate(train, bench, shingle_k=13)
    return (train.agg(F.count("*").alias("n_train"))
            .crossJoin(bench.agg(F.count("*").alias("n_bench")))
            .crossJoin(kept.agg(F.count("*").alias("n_kept")))
            .select("n_train", "n_bench", "n_kept",
                    (F.col("n_train") - F.col("n_kept")).cast("bigint")
                    .alias("n_contaminated")))


def _shingle_acc_sql(k: int, base=None, tail=None) -> str:
    """Per-step-modulus shingle accumulator over ``tokens[i+1..i+k]`` —
    ONE generator for every oracle that needs kernel-identical shingles
    (MinHash k=3, decontamination k=13 two-plane)."""
    from plc.dedup import SHINGLE_MOD, _W1, _W2, shingle_weights

    ws = shingle_weights(k, base if base is not None else _W1,
                         tail if tail is not None else _W2)
    acc = "CAST(0 AS BIGINT)"
    for j, w in enumerate(ws):
        # per-step modulus, mirroring _shingle_arrays: partial sums never
        # exceed 2^61 + SHINGLE_MOD for any k
        acc = (f"(({acc}) + CAST(tokens[i+{j + 1}] AS BIGINT) * {w}) "
               f"% {SHINGLE_MOD}")
    return acc


def _decontamination_sql(shingle_k: int = 13) -> str:
    from plc.dedup import SHINGLE_MOD, _W1B, _W2B

    wide = (f"(({_shingle_acc_sql(shingle_k)}) * {SHINGLE_MOD} "
            f"+ ({_shingle_acc_sql(shingle_k, _W1B, _W2B)}))")
    shingle = (f"list_transform(range(greatest(len(tokens) - "
               f"{shingle_k - 1}, 0)), i -> {wide})")
    return f"""
        WITH tv AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                           CAST(doc_id AS INT) % 10 = 7 AS is_bench,
                           {_TOKENS_SQL} AS tokens
                    FROM documents),
             sh AS (SELECT doc_id, is_bench, {shingle} AS shl FROM tv),
             bsh AS (SELECT DISTINCT s FROM
                     (SELECT unnest(shl) AS s FROM sh WHERE is_bench)),
             hit AS (SELECT DISTINCT doc_id FROM
                     (SELECT doc_id, unnest(shl) AS s FROM sh
                      WHERE NOT is_bench) t
                     JOIN bsh USING (s))
        SELECT (SELECT count(*) FROM sh WHERE NOT is_bench) AS n_train,
               (SELECT count(*) FROM sh WHERE is_bench) AS n_bench,
               (SELECT count(*) FROM sh WHERE NOT is_bench)
                   - (SELECT count(*) FROM hit) AS n_kept,
               (SELECT count(*) FROM hit) AS n_contaminated
    """


def _packing_stats(spark, sf):
    """Sequence packing plan over the tokens view: concatenate docs in
    doc_id order, slice into 2048-token training examples (standard
    boundary-splitting pack). Offsets come from the two-phase bucketed
    cumsum (no single-partition window); the oracle recomputes the same
    structure with a SQL window cumsum."""
    from plc.packing import packing_stats

    return packing_stats(tokens_view(spark, sf), 2048, num_buckets=16)


def _point_lookup(spark, sf):
    """K24 + storage path end-to-end: encode the tokens view into the
    engine's store, then decode exactly one doc_id back out through
    bloom + min/max chunk pruning (plc/pipeline.py select_chunks /
    _bloom_probe_expr). An absent probe (present range, bloom-excluded)
    must touch zero rows — folded in as n_miss. The oracle recomputes the
    same row straight from the documents table, so the store's point-read
    path is DuckDB-checked end-to-end."""
    from plc.pipeline import PipelineConfig, decode, encode

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_qpt_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0),
           mode="overwrite")
    probe = src.agg(F.min("doc_id")).collect()[0][0]
    absent = probe + "-absent"
    n_miss = decode(spark, dst, filters={"doc_id": (absent, absent)}).count()
    hit = decode(spark, dst, filters={"doc_id": (probe, probe)},
                 columns=["doc_id", "n_tok", "source"])
    return hit.select("doc_id", "n_tok", "source",
                      F.lit(n_miss).cast("bigint").alias("n_miss"))


def _batch_lookup(spark, sf):
    """Batch point lookup (IN-list, VERDICT r3 #3): encode the tokens view,
    then fetch a scattered key set (doc_id % 97 == 5 — reproducible in
    SQL) in ONE pruned scan via decode(doc_ids=...): chunk selection is a
    broadcast (key, bloom-hash) semi-join, not one decode per key. The
    same keys shifted out of existence must prune EVERY chunk (asserted —
    bloom + range), and their decode returns zero rows (n_miss)."""
    from plc.pipeline import PipelineConfig, decode, encode, select_chunks

    src = tokens_view(spark, sf)
    dst = tempfile.mkdtemp(prefix="plc_qbl_")
    encode(spark, src, dst,
           PipelineConfig(num_partitions=4, straggler_parts=0),
           mode="overwrite")
    keys = [r[0] for r in
            src.filter(F.col("doc_id").cast("int") % 97 == 5)
            .select("doc_id").collect()]
    absent = [k + "-absent" for k in keys]
    # chunk-touch accounting: each absent key falls inside some chunk's
    # [min,max] range, so only the blooms can prune it — allow the
    # bloom's documented false-positive budget (~0.2%/probe; a hard ==0
    # would eventually fail on a lucky hash at scale) but never a range
    # scan. Row-level exactness is the n_miss == 0 the oracle checks.
    # The three probe actions are independent — run them as concurrent
    # jobs on the idle cluster instead of three back-to-back walls.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_abs = pool.submit(
            lambda: select_chunks(spark, dst, doc_ids=absent)[0].count())
        f_hit = pool.submit(
            lambda: select_chunks(spark, dst, doc_ids=keys)[0].count())
        f_miss = pool.submit(
            lambda: decode(spark, dst, doc_ids=absent).count())
        n_abs, n_hitc, n_miss = (f_abs.result(), f_hit.result(),
                                 f_miss.result())
    assert n_abs <= max(2, len(absent) // 10), n_abs
    assert n_hitc >= 1
    rows = decode(spark, dst, doc_ids=keys, columns=["doc_id", "n_tok"])
    return rows.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc")).withColumn(
        "n_miss", F.lit(n_miss).cast("bigint"))


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


# --------------------------------------------------------------------------
# oracle SQL generators — regenerate the engine's deterministic constants
# (hash params, shingle weights, hyperplanes, stopwords) into DuckDB SQL so
# both sides compute bit-identical integers/doubles
# --------------------------------------------------------------------------

_TOKENS_SQL = ("list_transform(list_filter(string_split(text, ' '), "
               "w -> w <> ''), w -> CAST((length(w) * 7 + ascii(w)) % 50257 "
               "AS INTEGER))")


def _minhash_pairs_sql() -> str:
    from plc.dedup import BAND_MOD, MERSENNE_P, hash_params

    shingle = (f"list_transform(range(greatest(len(tokens) - 2, 0)), i -> "
               f"{_shingle_acc_sql(3)})")
    sig_elems = ", ".join(
        f"coalesce(list_min(list_transform(sh, s -> (s * {a} + {b}) % "
        f"{MERSENNE_P})), {MERSENNE_P})" for a, b in hash_params(8, 42))
    def band_key(b, rows=2):
        expr = "0"
        for r in range(rows):
            expr = (f"(({expr}) * 1000003 + sig[{b * rows + r + 1}] % "
                    f"{BAND_MOD}) % {BAND_MOD}")
        return expr

    band_rows = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {band_key(b)} AS bkey FROM sigs"
        for b in range(4))
    return f"""
        WITH docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                             {_TOKENS_SQL} AS tokens FROM documents),
        shs AS (SELECT doc_id, {shingle} AS sh FROM docs),
        sigs AS (SELECT doc_id, [{sig_elems}] AS sig,
                        list_distinct(sh) AS shset FROM shs),
        bands AS ({band_rows}),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bkey = b.bkey
                  AND a.doc_id < b.doc_id),
        ver AS (SELECT CAST(len(list_filter(a.shset,
                                x -> list_contains(b.shset, x))) AS DOUBLE)
                           AS inter,
                       CAST(len(a.shset) + len(b.shset) AS DOUBLE) AS lens
                FROM cand c JOIN sigs a ON a.doc_id = c.da
                            JOIN sigs b ON b.doc_id = c.db),
        jacs AS (SELECT CASE WHEN lens - inter > 0
                             THEN inter / (lens - inter) ELSE 1.0 END AS jac
                 FROM ver)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
               CAST(count(*) AS BIGINT) AS n_verified,
               round(sum(jac), 4) AS sum_jaccard
        FROM jacs WHERE jac >= 0.5
    """


def _simhash_sql(bits: int = 56, bands: int = 4, max_hamming: int = 3,
                 seed: int = 42) -> str:
    from plc.dedup import MERSENNE_P, hash_params

    w = bits // bands
    votes = []
    for a, c in hash_params(bits, seed):
        votes.append(
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(dts, t -> "
            f"((CAST(t AS BIGINT) * {a} + {c}) % {MERSENNE_P} % 2) * 2 - 1)), "
            f"(x, y) -> x + y)")
    sig = " + ".join(f"(CASE WHEN {v} > 0 THEN {1 << b} ELSE 0 END)"
                     for b, v in enumerate(votes))
    band_rows = "\n            UNION ALL ".join(
        f"SELECT doc_id, sig, {i} AS band, "
        f"(sig >> {i * w}) % {1 << w} AS bval FROM sigs"
        for i in range(bands))
    return f"""
        WITH docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                             {_TOKENS_SQL} AS tokens FROM documents),
        d2 AS (SELECT doc_id, list_distinct(tokens) AS dts FROM docs),
        sigs AS (SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM d2),
        bands AS ({band_rows}),
        pairs AS (SELECT DISTINCT a.doc_id AS ka, b.doc_id AS kb,
                         a.sig AS sa, b.sig AS sb
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bval = b.bval
                   AND a.doc_id < b.doc_id),
        ham AS (SELECT bit_count(xor(sa, sb)) AS h FROM pairs)
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(h) AS BIGINT) AS sum_hamming,
               CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact
        FROM ham WHERE h <= {max_hamming}
    """


def _dot_sql(a: str, b: str, n: int = 64) -> str:
    return (f"list_reduce(list_prepend(0.0, list_transform(range({n}), "
            f"i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE))), "
            f"(x, y) -> x + y)")


def _cos_sql(a: str, b: str) -> str:
    return (f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * "
            f"sqrt({_dot_sql(b, b)}))")


def _knn_sql() -> str:
    return f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (SELECT q.query_id, e.vec_id,
                          {_cos_sql('q.qv', 'e.embedding')} AS c
                   FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        ranked AS (SELECT query_id, vec_id, c,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY c DESC, vec_id) AS rnk
                   FROM scored)
        SELECT query_id, vec_id, round(c, 4) AS cos_sim, rnk
        FROM ranked WHERE rnk <= 5
    """


def _hyperplane_sig_sql(n_planes: int, seed: int) -> str:
    from plc.similarity import hyperplane_weights

    planes = hyperplane_weights(n_planes, 64, seed)
    terms = []
    for p, w in enumerate(planes):
        lits = ", ".join(f"{float(x)}" for x in w)
        dot = (f"list_reduce(list_prepend(0.0, list_transform(range(64), "
               f"i -> CAST(embedding[i+1] AS DOUBLE) * ([{lits}])[i+1])), "
               f"(x, y) -> x + y)")
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _ann_lsh_buckets_sql() -> str:
    return f"""
        WITH sigs AS (SELECT {_hyperplane_sig_sql(12, 42)} AS sig
                      FROM embeddings),
        per AS (SELECT sig, count(*) AS c FROM sigs GROUP BY sig)
        SELECT CAST(sum(c) AS BIGINT) AS n_rows,
               count(*) AS n_buckets, max(c) AS max_bucket
        FROM per
    """


def _embedding_near_dup_sql() -> str:
    return f"""
        WITH sigs AS (SELECT vec_id, embedding,
                             {_hyperplane_sig_sql(8, 42)} AS sig
                      FROM embeddings),
        pairs AS (SELECT {_cos_sql('a.embedding', 'b.embedding')} AS c
                  FROM sigs a JOIN sigs b
                    ON a.sig = b.sig AND a.vec_id < b.vec_id)
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               round(max(c), 4) AS max_cos
        FROM pairs WHERE c >= 0.9
    """


def _lang_quality_sql() -> str:
    from plc.textstats import STOPWORDS

    def lst(words):
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    score = {lang: (f"(CAST(len(list_filter(dw, w -> list_contains("
                    f"{lst(sw)}, w))) AS DOUBLE) / "
                    f"CAST(greatest(len(dw), 1) AS DOUBLE))")
             for lang, sw in STOPWORDS.items()}
    order = list(STOPWORDS)
    cases = []
    for i, lang in enumerate(order):
        conds = [f"{score[lang]} > 0"]
        conds += [f"{score[lang]} > {score[p]}" for p in order[:i]]
        conds += [f"{score[lang]} >= {score[nx]}" for nx in order[i + 1:]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    all_stop = lst(sorted({w for sw in STOPWORDS.values() for w in sw}))
    quality = f"""round(
        0.3 * least(len(ws) / 50.0, 1.0)
      + 0.2 * least(CAST(len(list_filter(dw, w -> list_contains({all_stop},
                    w))) AS DOUBLE) * 10.0
                    / CAST(greatest(len(ws), 1) AS DOUBLE), 1.0)
      + 0.3 * (CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
               AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))
      + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.0 END),
      4)"""
    return f"""
        WITH base AS (
            SELECT text,
                   list_filter(string_split(text, ' '), w -> w <> '') AS ws
            FROM documents),
        d2 AS (SELECT text, ws, list_distinct(ws) AS dw,
                      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(ws, w -> CAST(length(w) AS BIGINT))),
                           (a, x) -> a + x) AS DOUBLE)
                      / CAST(greatest(len(ws), 1) AS DOUBLE) AS mwl,
                      list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(ws,
                               w -> CAST(ceil(length(w) / 4.0) AS BIGINT))),
                           (a, x) -> a + x) AS n_subwords
               FROM base),
        prof AS (SELECT {lang_case} AS lang_pred, {quality} AS quality,
                        n_subwords
                 FROM d2)
        SELECT lang_pred, count(*) AS n_docs,
               round(sum(quality), 4) AS sum_quality,
               CAST(sum(n_subwords) AS BIGINT) AS total_subwords
        FROM prof GROUP BY lang_pred
    """


def _fingerprint_sql() -> str:
    from plc.textstats import FP_BASE, FP_MOD

    wh = (f"(CAST(length(w) AS BIGINT) * 2654435761 + "
          f"CAST(ascii(w) AS BIGINT) * 97 + "
          f"CAST(ascii(substring(w, length(w), 1)) AS BIGINT) * 31) "
          f"% {FP_MOD}")
    return f"""
        WITH fps AS (
            SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_filter(string_split(text, ' '),
                                                  w -> w <> ''),
                                      w -> {wh})),
                       (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fp
            FROM documents)
        SELECT count(*) AS n, count(DISTINCT fp) AS n_unique_fp,
               min(fp) AS min_fp, max(fp) AS max_fp
        FROM fps
    """


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
        "format_read_agg": _format_read_agg,
        "format_multirange_agg": _format_multirange_agg,
        "format_agg_pushdown": _format_agg_pushdown,
        "chunks_null_stats": _chunks_null_stats,
        "dedup_exact_stats": _dedup_exact_stats,
        "dedup_minhash_pairs": _dedup_minhash_pairs,
        "simhash_near_dup": _simhash_near_dup,
        "knn_cosine_topk": _knn_cosine_topk,
        "ann_lsh_buckets": _ann_lsh_buckets,
        "embedding_near_dup": _embedding_near_dup,
        "lang_quality_profile": _lang_quality_profile,
        "fingerprint_stats": _fingerprint_stats,
        "dedup_minhash_survivors": _dedup_minhash_survivors,
        "ivf_recall_check": _ivf_recall_check,
        "encode_embeddings": _encode_embeddings,
        "curate_corpus": _curate_corpus,
        "packing_stats": _packing_stats,
        "decontamination_stats": _decontamination_stats,
        "hash_split_counts": _hash_split_counts,
        "point_lookup": _point_lookup,
        "batch_lookup": _batch_lookup,
        "encode_events": _encode_events,
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
        "format_read_agg": f"""
            WITH toks AS (SELECT source,
                                 len({_TOKENS_SQL}) AS n_tok
                          FROM documents)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens
            FROM toks WHERE n_tok > 10 GROUP BY source
        """,
        "format_multirange_agg": f"""
            WITH toks AS (SELECT source,
                                 len({_TOKENS_SQL}) AS n_tok
                          FROM documents)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   CAST(min(n_tok) AS INT) AS min_tok,
                   CAST(max(n_tok) AS INT) AS max_tok
            FROM toks WHERE n_tok <= 40 OR n_tok >= 120
            GROUP BY source
        """,
        "format_agg_pushdown": f"""
            WITH toks AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                                 len({_TOKENS_SQL}) AS n_tok
                          FROM documents)
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   CAST(min(n_tok) AS BIGINT) AS min_tok,
                   CAST(max(n_tok) AS BIGINT) AS max_tok,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM toks
        """,
        "chunks_null_stats": f"""
            WITH toks AS (SELECT len({_TOKENS_SQL}) AS n_tok, source
                          FROM documents)
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN source = 'src7' THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_src,
                   CAST(sum(CASE WHEN n_tok % 3 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_w,
                   CAST(count(CASE WHEN n_tok % 3 <> 0 THEN 1 END)
                        AS BIGINT) AS cnt_w,
                   CAST(min(CASE WHEN n_tok % 3 <> 0 THEN n_tok END)
                        AS BIGINT) AS wmin,
                   CAST(max(CASE WHEN n_tok % 3 <> 0 THEN n_tok END)
                        AS BIGINT) AS wmax
            FROM toks
        """,
        "dedup_exact_stats": """
            SELECT source, count(*) AS n_rows,
                   CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
                   CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
                       AS n_dup_rows
            FROM documents GROUP BY source
        """,
        "decontamination_stats": _decontamination_sql(),
        "hash_split_counts": _hash_split_sql(),
        "packing_stats": f"""
            WITH tv AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                               len({_TOKENS_SQL}) AS n_tok
                        FROM documents),
                 o AS (SELECT n_tok,
                              COALESCE(CAST(sum(n_tok) OVER (
                                  ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS BIGINT), 0) AS s
                       FROM tv),
                 t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                              CAST(sum(CASE WHEN n_tok > 0
                                            AND (s + n_tok - 1) // 2048
                                                > s // 2048
                                       THEN 1 ELSE 0 END) AS BIGINT)
                                  AS n_boundary_docs
                       FROM o)
            SELECT total_tokens,
                   (total_tokens + 2047) // 2048 AS n_examples,
                   n_boundary_docs,
                   round(CAST(total_tokens AS DOUBLE)
                         / (((total_tokens + 2047) // 2048) * 2048),
                         6) AS fill_ratio
            FROM t
        """,
        "point_lookup": f"""
            WITH tv AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                               CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tok,
                               source
                        FROM documents),
                 p AS (SELECT min(doc_id) AS m FROM tv)
            SELECT tv.doc_id, tv.n_tok, tv.source,
                   CAST(0 AS BIGINT) AS n_miss
            FROM tv, p WHERE tv.doc_id = p.m
        """,
        "batch_lookup": f"""
            WITH tv AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                               CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tok
                        FROM documents
                        WHERE doc_id % 97 = 5)
            SELECT count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc,
                   CAST(0 AS BIGINT) AS n_miss
            FROM tv
        """,
        "dedup_minhash_pairs": _minhash_pairs_sql(),
        "simhash_near_dup": _simhash_sql(),
        "knn_cosine_topk": _knn_sql(),
        "ann_lsh_buckets": _ann_lsh_buckets_sql(),
        "embedding_near_dup": _embedding_near_dup_sql(),
        "lang_quality_profile": _lang_quality_sql(),
        "fingerprint_stats": _fingerprint_sql(),
        # encode_manifest / roundtrip_check / encode_embeddings /
        # dedup_minhash_survivors: not SQL-expressible (custom columnar
        # codecs / iterative connected components) → rows-only driver check.
    }

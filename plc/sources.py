"""P1 source adapters (SURVEY.md §2 pipeline operators).

The production input is an Iceberg table of pre-tokenized training sequences
(BASELINE.json input_hint). Offline sandboxes have no Iceberg catalog jars,
so :func:`read_tokens` codes to the ``format("iceberg")`` string and falls
back to plain parquet — the testdata path. Filters/column pruning stay
declarative so Catalyst pushes them into the scan (hidden-partition pruning
on Iceberg, row-group skipping on parquet).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, functions as F

log = logging.getLogger(__name__)

# error signatures meaning "the iceberg data source itself is unavailable" —
# only these trigger the parquet fallback; real read errors propagate
_NO_ICEBERG_MARKERS = ("DATA_SOURCE_NOT_FOUND", "Failed to find data source",
                       "ClassNotFoundException", "Multiple sources found")

TOKENS_SCHEMA_DDL = ("doc_id string, tokens array<int>, n_tok int, "
                     "source string")


def read_tokens(spark: SparkSession, location: str,
                fmt: str = "auto") -> DataFrame:
    """Load the tokens table from an Iceberg table name or a parquet path.

    fmt: "iceberg" | "parquet" | "auto" (iceberg when the location looks
    like a catalog table name and the iceberg source is on the classpath,
    else parquet).
    """
    if fmt == "auto":
        looks_like_table = "/" not in location and "." in location
        fmt = "iceberg" if looks_like_table else "parquet"
    if fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(location)
        except Exception as e:
            # fall back to parquet ONLY when the iceberg source is absent
            # (no catalog jars, e.g. this sandbox); anything else — bad
            # table name, permissions, corrupt metadata — must propagate
            if not any(m in str(e) for m in _NO_ICEBERG_MARKERS):
                raise
            log.warning("iceberg data source unavailable (%s); falling back "
                        "to parquet at %s", type(e).__name__, location)
            df = spark.read.parquet(location)
    else:
        df = spark.read.parquet(location)
    return normalize_tokens(df)


def normalize_tokens(df: DataFrame) -> DataFrame:
    """Coerce an input table to the engine schema: ensure n_tok exists and
    dtypes match (doc_id string, tokens array<int32>, n_tok int32)."""
    if "n_tok" not in df.columns and "tokens" in df.columns:
        # size(NULL) is -1, which would poison τ/skew stats and byte metrics
        df = df.withColumn("n_tok", F.when(F.col("tokens").isNull(), 0)
                           .otherwise(F.size("tokens")))
    casts = []
    for name, typ in [("doc_id", "string"), ("tokens", "array<int>"),
                      ("n_tok", "int")]:
        if name in df.columns:
            casts.append(F.col(name).cast(typ).alias(name))
    others = [F.col(c) for c in df.columns
              if c not in ("doc_id", "tokens", "n_tok")]
    return df.select(*casts, *others)

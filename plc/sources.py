"""P1 source adapters (SURVEY.md §2 pipeline operators).

The production input is an Iceberg table of pre-tokenized training sequences
(BASELINE.json input_hint). Offline sandboxes have no Iceberg catalog jars,
so :func:`read_tokens` codes to the ``format("iceberg")`` string and falls
back to plain parquet — the testdata path. Filters/column pruning stay
declarative so Catalyst pushes them into the scan (hidden-partition pruning
on Iceberg, row-group skipping on parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
        except Exception:  # no catalog/jars in the sandbox → parquet fallback
            df = spark.read.parquet(location)
    else:
        df = spark.read.parquet(location)
    return normalize_tokens(df)


def normalize_tokens(df: DataFrame) -> DataFrame:
    """Coerce an input table to the engine schema: ensure n_tok exists and
    dtypes match (doc_id string, tokens array<int32>, n_tok int32)."""
    if "n_tok" not in df.columns and "tokens" in df.columns:
        df = df.withColumn("n_tok", F.size("tokens"))
    casts = []
    for name, typ in [("doc_id", "string"), ("tokens", "array<int>"),
                      ("n_tok", "int")]:
        if name in df.columns:
            casts.append(F.col(name).cast(typ).alias(name))
    others = [F.col(c) for c in df.columns
              if c not in ("doc_id", "tokens", "n_tok")]
    return df.select(*casts, *others)

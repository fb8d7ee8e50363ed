"""Sequence packing (plc/packing.py): exact stream reconstruction, span
invariants for docs longer than seq_len, empty docs, and stats/example
consistency."""

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from plc.packing import global_offsets, pack_sequences, packing_stats

L = 256


@pytest.fixture(scope="module")
def tokens_df(spark):
    """Deterministic mix: normal docs, one doc ≫ L (spans many examples),
    empty docs, and single-token docs."""
    rng = np.random.default_rng(17)
    rows = []
    for i in range(120):
        if i == 7:
            n = 5 * L + 13            # spans ≥ 6 examples
        elif i % 29 == 0:
            n = 0                      # empty
        elif i % 13 == 0:
            n = 1
        else:
            n = int(rng.integers(1, 2 * L))
        rows.append((f"doc-{i:06d}",
                     [int(x) for x in rng.integers(0, 50257, n)], n))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int").cache()


def test_global_offsets_are_exclusive_prefix_sums(spark, tokens_df):
    got = {r["doc_id"]: r["_start"]
           for r in global_offsets(tokens_df, num_buckets=8).collect()}
    acc = 0
    for r in sorted(tokens_df.collect(), key=lambda r: r["doc_id"]):
        assert got[r["doc_id"]] == acc, r["doc_id"]
        acc += r["n_tok"]


def test_pack_reconstructs_stream_exactly(spark, tokens_df):
    rows = pack_sequences(tokens_df, L, num_buckets=8) \
        .orderBy("example_id").collect()
    got = [t for r in rows for t in r["tokens"]]
    want = [t for r in sorted(tokens_df.collect(),
                              key=lambda r: r["doc_id"])
            for t in r["tokens"]]
    assert got == want
    lens = [r["n_tokens"] for r in rows]
    assert all(n == L for n in lens[:-1]) and 0 < lens[-1] <= L
    assert [r["example_id"] for r in rows] == list(range(len(rows)))


def test_stats_match_materialized_examples(spark, tokens_df):
    st = packing_stats(tokens_df, L, num_buckets=8).collect()[0]
    ex = pack_sequences(tokens_df, L, num_buckets=8)
    n_ex = ex.count()
    total = ex.agg(F.sum("n_tokens")).collect()[0][0]
    assert st["n_examples"] == n_ex
    assert st["total_tokens"] == total
    # slices = non-empty docs + total boundary CROSSINGS (a doc spanning k
    # examples contributes k slices); boundary DOCS is the weaker count
    slices = ex.agg(F.sum("n_docs")).collect()[0][0]
    docs = [r for r in tokens_df.collect() if r["n_tok"] > 0]
    acc, crossings, straddlers = 0, 0, 0
    offs = {r["doc_id"]: None for r in docs}
    start = 0
    for r in sorted(tokens_df.collect(), key=lambda r: r["doc_id"]):
        if r["n_tok"] > 0:
            first, last = start // L, (start + r["n_tok"] - 1) // L
            crossings += last - first
            straddlers += 1 if last > first else 0
        start += r["n_tok"]
    assert slices == len(docs) + crossings
    assert st["n_boundary_docs"] == straddlers
    # fill_ratio is round(·, 6)
    assert abs(st["fill_ratio"] - total / (n_ex * L)) < 5e-7


def test_pack_seq_len_guard(spark, tokens_df):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(tokens_df, 0)
    with pytest.raises(ValueError, match="seq_len"):
        packing_stats(tokens_df, -5)


def test_pack_on_parquet_tokens(spark):
    """End-to-end on the synthetic engine-input table (Pareto lengths cap
    32768 ≫ L exercises many-example spans at realistic shape)."""
    from plc import data as D

    work = tempfile.mkdtemp(prefix="plc_pack_")
    src = os.path.join(work, "t.parquet")
    D.synth_tokens_parquet(src, 400, regime="zipf", seed=23)
    df = spark.read.parquet(src)
    st = packing_stats(df, 2048, num_buckets=8).collect()[0]
    ex = pack_sequences(df, 2048, num_buckets=8)
    assert ex.count() == st["n_examples"]
    total = df.agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert st["total_tokens"] == total
    assert ex.agg(F.sum("n_tokens")).collect()[0][0] == total


def test_pack_invariant_to_bucket_count(spark, tokens_df):
    """The packed stream is a pure function of the data — num_buckets (the
    parallelism knob) must not change a single token."""
    a = pack_sequences(tokens_df, L, num_buckets=2).orderBy("example_id") \
        .collect()
    b = pack_sequences(tokens_df, L, num_buckets=16).orderBy("example_id") \
        .collect()
    assert [(r["example_id"], r["tokens"]) for r in a] == \
        [(r["example_id"], r["tokens"]) for r in b]


def test_packed_examples_encode_through_store(spark, tokens_df):
    """Composability: packed examples are themselves an engine-shaped
    table (key + token array) and round-trip through the chunk store."""
    from plc.pipeline import PipelineConfig, encode, verify

    ex = (pack_sequences(tokens_df, L, num_buckets=8)
          .select(F.format_string("ex-%012d", "example_id").alias("doc_id"),
                  "tokens", F.size("tokens").alias("n_tok")))
    dst = tempfile.mkdtemp(prefix="plc_pack_store_")
    encode(spark, ex, dst,
           PipelineConfig(num_partitions=2, straggler_parts=0),
           mode="overwrite")
    res = verify(spark, ex, dst)
    assert res["mismatches"] == 0, res


def test_null_tokens_and_weights_pack_safely(spark):
    """NULL token arrays count 0 tokens (Spark's size(NULL) is -1 — an
    unguarded cumsum would shift every later offset) and NULL weights
    cannot poison global_offsets' driver merge."""
    rows = [("doc-0", [1, 2, 3]), ("doc-1", None), ("doc-2", [4, 5]),
            ("doc-3", None), ("doc-4", [6])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    ex = pack_sequences(df, 4, num_buckets=2).orderBy("example_id").collect()
    got = [t for r in ex for t in r["tokens"]]
    assert got == [1, 2, 3, 4, 5, 6]
    st = packing_stats(df, 4, num_buckets=2).collect()[0]
    assert st["total_tokens"] == 6 and st["n_examples"] == 2
    # NULL weights into global_offsets directly (all-NULL bucket)
    w = spark.createDataFrame(
        [("a", None), ("b", 2), ("c", None)], "doc_id string, w int")
    offs = {r["doc_id"]: r["_start"]
            for r in global_offsets(w, "doc_id", "w",
                                    num_buckets=2).collect()}
    assert offs == {"a": 0, "b": 0, "c": 2}

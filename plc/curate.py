"""End-to-end training-data curation: the composed pipeline a 100 TB
pretraining corpus actually runs, built entirely from the engine's own
operators —

    documents ──> quality/language profile (JVM expressions)
              ──> quality floor filter
              ──> exact dedup (hash groupBy; min doc_id wins)
              ──> near-dup removal (MinHash-LSH + exact-Jaccard verify +
                  connected components; exact dups collapsed first)
              ──> tokenize (deterministic stand-in; pluggable BPE)
              ──> encode into the chunk store (range partition, skew salt,
                  codec auto-selection, lineage manifests, resume)

Every stage is a scale-safe building block already tested on its own; this
module wires them and reports per-stage survivor counts so the curation
funnel is observable. Stage boundaries are localCheckpoint()ed: the dedup
output feeds THREE more actions (its own counter, the encode stats
pre-pass, and the encode job itself), and without truncation the whole
LSH + verify + connected-components lineage would re-execute per action."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def curate(spark: SparkSession, documents: DataFrame, dst: str, *,
           quality_min: float = 0.4, lang_keep: tuple | None = None,
           near_dup_threshold: float = 0.7, num_hashes: int = 8,
           bands: int = 4, seed: int = 42, cfg=None,
           benchmark: DataFrame | None = None, decontam_k: int = 13,
           tokenizer=None, mode: str = "error") -> dict:
    """Run the full curation funnel over a ``documents``-shaped table
    (doc_id, text, source, ...) and encode the surviving tokens into
    ``dst``. Returns the encode report plus per-stage counters.

    ``benchmark`` (optional, tokens-shaped: doc_id + tokens) switches on
    the eval-leakage guard: after dedup, any surviving doc sharing a
    ``decontam_k``-gram with the benchmark is dropped
    (:func:`plc.dedup.decontaminate`).

    ``tokenizer`` (optional :class:`plc.bpe.BPETokenizer`): tokenize with
    a real vocab/merges BPE instead of the word-hash stand-in."""
    from plc.dedup import decontaminate, dedup_minhash
    from plc.pipeline import PipelineConfig, encode
    from plc.textstats import language_id, quality_score, tokens_table

    counters = {"n_input": documents.count()}

    # compute ONLY the profile columns the funnel filters on (quality,
    # plus language when lang_keep is set) — the full text_profile also
    # evaluates fingerprints and subword counts per document, and the
    # checkpoint below would materialize them just to be dropped; and
    # carry only the columns the tokenize+encode stages consume, so the
    # checkpoint holds (doc_id, text, source), not every input column
    prof = documents.withColumn("quality",
                                F.round(quality_score("text"), 4))
    kept = prof.filter(F.col("quality") >= quality_min)
    if lang_keep:
        kept = kept.filter(language_id("text").isin(list(lang_keep)))
    carry = [c for c in ("doc_id", "text", "source")
             if c in documents.columns]
    # checkpoint: `kept` feeds both its counter and the dedup lineage
    kept = kept.select(*carry).localCheckpoint()
    counters["n_quality"] = kept.count()

    tv = tokens_table(kept, tokenizer=tokenizer)
    deduped = dedup_minhash(tv, "doc_id", "tokens",
                            num_hashes=num_hashes, bands=bands, seed=seed,
                            threshold=near_dup_threshold)
    # checkpoint: encode() runs its stats pre-pass (count + sample) AND
    # the encode job on this frame — without truncation the full dedup
    # pipeline would re-execute for each of those actions
    deduped = deduped.localCheckpoint()
    counters["n_deduped"] = deduped.count()

    if benchmark is not None:
        deduped = decontaminate(deduped, benchmark, "doc_id", "tokens",
                                shingle_k=decontam_k).localCheckpoint()
        # survivor count, like every other funnel counter (dropped rows
        # are n_deduped - n_clean)
        counters["n_clean"] = deduped.count()

    report = encode(spark, deduped, dst,
                    cfg or PipelineConfig(num_partitions=8,
                                          straggler_parts=2), mode=mode)
    return {**report, **counters}


# --------------------------------------------------------------------------
# reproducible dataset assembly: hash splits + deterministic epoch order
# --------------------------------------------------------------------------

SPLIT_MOD = 1_000_000


def split_hash(key_col, seed: int = 42):
    """Engine-portable per-key hash in [0, SPLIT_MOD): first 12 hex digits
    of md5(key ":" seed) — identical in Spark and DuckDB (`('0x' || h)::
    BIGINT`), so split assignment is reproducible across engines, runs,
    and cluster sizes (a row's split NEVER depends on partitioning)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(F.substring(F.md5(F.concat_ws(":", k, F.lit(str(seed)))),
                           1, 12), 16, 10).cast("bigint")
    return h % SPLIT_MOD


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction by
    thresholding :func:`split_hash` against cumulative weights — the
    reproducible (key-deterministic) alternative to randomSplit: adding
    or removing OTHER rows never moves a row between splits."""
    if not weights or abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1 (got {weights})")
    h = split_hash(key_col, seed)
    names = list(weights)
    col, acc = None, 0.0
    for name in names[:-1]:
        acc += weights[name]
        t = int(round(acc * SPLIT_MOD))
        col = F.when(h < t, name) if col is None else col.when(h < t, name)
    col = (F.lit(names[0]) if col is None
           else col.otherwise(names[-1]))
    return df.withColumn("split", col)


def epoch_order(df: DataFrame, key_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Deterministic per-epoch global shuffle: total order by a seeded
    per-key hash (key itself as tie-break). Different seeds give
    independent permutations; the same seed always replays the same order
    — a distributed sort (range shuffle), the correct plan for writing
    training shards in order at any scale."""
    return df.orderBy(split_hash(key_col, seed), F.col(key_col))


def prepare_training_set(spark: SparkSession, tokens_df: DataFrame,
                         dst: str, *, seq_len: int = 2048,
                         weights: dict[str, float] | None = None,
                         seed: int = 42, num_buckets: int = 64,
                         cfg=None, mode: str = "error") -> dict:
    """The last mile from a curated tokens table to training-ready stores:
    reproducible :func:`hash_split` → per-split :func:`plc.packing.
    pack_sequences` into fixed ``seq_len`` examples → encode each split
    into its own chunk store under ``dst/split=<name>``.

    Every stage is deterministic (key-hash splits, doc_id-ordered packing)
    so the produced example stores are bit-reproducible across runs and
    cluster sizes. Returns per-split encode reports + example counts."""
    import os

    from plc.packing import pack_sequences
    from plc.pipeline import PipelineConfig, encode

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    sp = hash_split(tokens_df, weights, seed=seed).localCheckpoint()
    out = {}
    for name in weights:
        part = sp.filter(F.col("split") == name).drop("split")
        ex = (pack_sequences(part, seq_len, num_buckets=num_buckets)
              .select(F.format_string(name + "-%012d", "example_id")
                      .alias("doc_id"),
                      "tokens",
                      F.size("tokens").cast("int").alias("n_tok")))
        rep = encode(spark, ex, os.path.join(dst, f"split={name}"),
                     cfg or PipelineConfig(num_partitions=8,
                                           straggler_parts=0),
                     mode=mode)
        out[name] = {"n_examples": rep["rows"], **rep} \
            if "rows" in rep else rep
    return out

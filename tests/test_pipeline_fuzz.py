"""Bounded Spark-level fuzz: randomized small tables (shapes, dtypes,
nulls, weird doc_ids, skew) through the full encode→decode→verify cycle,
including a resume for a subset. Deterministic seeds so failures replay."""

import shutil
import tempfile

import numpy as np
import pytest

from plc.pipeline import PipelineConfig, decode, encode, verify


def _random_table(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    id_style = rng.integers(0, 3)
    if id_style == 0:
        ids = [f"doc-{i:08d}" for i in range(n)]
    elif id_style == 1:
        ids = [f"{chr(33 + int(rng.integers(0, 90)))}{i:06d}~é"
               for i in range(n)]
    else:
        ids = [f"s{int(rng.integers(0, 5))}/p{i}" for i in range(n)]
    rows = []
    for i in range(n):
        ln = int(rng.pareto(2.0) * 20) if rng.random() < 0.9 else 0
        toks = (rng.integers(0, 50257, min(ln, 4000)).tolist()
                if rng.random() > 0.05 else None)
        src = ["web", "code", None][int(rng.integers(0, 3))]
        rows.append((ids[i], toks, src))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, source string")


@pytest.mark.parametrize("seed", [11, 23, 37, 53, 71])
def test_fuzz_encode_decode_verify(spark, seed):
    df = _random_table(spark, seed)
    dst = tempfile.mkdtemp(prefix=f"plc_fuzz{seed}_")
    try:
        rng = np.random.default_rng(seed + 1)
        cfg = PipelineConfig(
            num_partitions=int(rng.integers(1, 7)),
            straggler_parts=int(rng.integers(0, 4)),
            max_chunk_values=int(rng.integers(64, 1 << 16)),
            skew_quantile=float(rng.uniform(0.8, 0.999)))
        encode(spark, df, dst, cfg, mode="overwrite")
        res = verify(spark, df, dst)
        assert res["mismatches"] == 0, (seed, res)
        assert res["rows_decoded"] == df.count()
        # projection + caller order survives
        sub = decode(spark, dst, columns=["source", "doc_id"])
        assert sub.columns == ["source", "doc_id"]
        assert sub.count() == df.count()
        if seed % 2:  # resume from a half-wiped manifest
            from plc.pipeline import _manifest_path

            man = spark.read.parquet(_manifest_path(dst))
            keep = man.filter("part_id % 2 = 0")
            tmp = dst + "_m"
            keep.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(_manifest_path(dst))
            shutil.move(tmp, _manifest_path(dst))
            encode(spark, df, dst, cfg, resume=True)
            res2 = verify(spark, df, dst)
            assert res2["mismatches"] == 0, (seed, "after resume", res2)
    finally:
        shutil.rmtree(dst, ignore_errors=True)

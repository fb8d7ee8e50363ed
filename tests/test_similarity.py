"""Similarity-search tests: exact brute-force top-k sanity, LSH recall on
clustered vectors, planted embedding near-duplicates (plc.similarity)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from plc.similarity import (ann_topk, brute_force_topk, cosine,
                            hyperplane_signature, near_dup_pairs)

DIM = 32


@pytest.fixture(scope="module")
def corpus(spark):
    """10 well-separated cluster centres × 20 members + 3 planted
    near-identical pairs."""
    rng = np.random.default_rng(13)
    centers = rng.normal(0, 1, (10, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            # noise 0.05/dim → pair angle ≈ 0.4 rad: a realistic "near
            # neighbour" band where 6-plane buckets keep ~50%/table
            v = c + rng.normal(0, 0.05, DIM)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for i in range(3):  # planted near-dups of vectors 0..2
        v = np.array(rows[i][1]) + rng.normal(0, 0.005, DIM)
        v /= np.linalg.norm(v)
        rows.append((1000 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_cosine_expression_matches_numpy(spark, corpus):
    rows = corpus.filter("vec_id < 4").collect()
    a, b = np.array(rows[0][1], np.float64), np.array(rows[1][1], np.float64)
    expected = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    got = (corpus.filter("vec_id = 0").alias("x")
           .crossJoin(corpus.filter("vec_id = 1").alias("y"))
           .select(cosine(F.col("x.embedding"), F.col("y.embedding"))
                   .alias("c")).collect()[0][0])
    assert abs(got - expected) < 1e-9


def test_brute_force_topk_exact(spark, corpus):
    q = corpus.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = brute_force_topk(corpus, q, k=5).collect()
    assert len(got) == 5
    # numpy ground truth
    rows = sorted(corpus.collect(), key=lambda r: r[0])
    vecs = {r[0]: np.array(r[1], np.float64) for r in rows}
    qv = vecs[0]
    sims = {k: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for k, v in vecs.items() if k != 0}
    expect = [k for k, _ in sorted(sims.items(),
                                   key=lambda kv: (-kv[1], kv[0]))[:5]]
    assert [r["vec_id"] for r in got] == expect
    # the planted near-dup of vector 0 must rank first
    assert got[0]["vec_id"] == 1000 and got[0]["cos"] > 0.999


def test_ann_lsh_recall(spark, corpus):
    """ANN with 3 tables over clustered data: recall@5 ≥ 0.6 vs brute."""
    q = corpus.filter("vec_id in (0, 21, 42, 63, 84)").select(
        F.col("vec_id").alias("query_id"), "embedding")
    brute = brute_force_topk(corpus, q, k=5).collect()
    approx = ann_topk(corpus, q, k=5, dim=DIM, n_planes=6,
                      n_tables=3).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for r in approx if r["vec_id"] in truth.get(r["query_id"],
                                                             set()))
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_near_dup_pairs_finds_planted(spark, corpus):
    pairs = near_dup_pairs(corpus, dim=DIM, threshold=0.99, n_planes=6,
                           n_tables=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(3):
        assert (i, 1000 + i) in got, f"planted pair {i} missed: {got}"


def test_ivf_recall(spark, corpus):
    """IVF (k-means cells + nprobe search) on clustered data: with cells ≈
    true clusters and nprobe=2, recall@5 vs brute force must be high."""
    from plc.similarity import ivf_assign, ivf_topk, ivf_train

    cent = ivf_train(corpus, dim=DIM, n_centroids=10, iters=5)
    indexed = ivf_assign(corpus, cent).localCheckpoint()
    q = corpus.filter("vec_id in (0, 21, 42, 63, 84)").select(
        F.col("vec_id").alias("query_id"), "embedding")
    brute = brute_force_topk(corpus, q, k=5).collect()
    approx = ivf_topk(indexed, q, cent, k=5, nprobe=2).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for r in approx
               if r["vec_id"] in truth.get(r["query_id"], set()))
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.8, f"IVF recall {hits}/{total}"
    # determinism: same centroids on retrain
    import numpy as np
    assert np.allclose(cent, ivf_train(corpus, dim=DIM, n_centroids=10,
                                       iters=5))


def test_signature_is_deterministic(spark, corpus):
    s1 = corpus.select(hyperplane_signature(
        F.col("embedding"), DIM, 10, seed=42).alias("s")).collect()
    s2 = corpus.select(hyperplane_signature(
        F.col("embedding"), DIM, 10, seed=42).alias("s")).collect()
    assert [r[0] for r in s1] == [r[0] for r in s2]


def test_ivf_store_prunes_and_recalls(spark, corpus):
    """VERDICT r2 #5: the persisted IVF index prunes probed cells at the
    STORAGE layer — decoding one cell touches strictly fewer chunks than
    the whole index — and search over the stored index keeps recall."""
    import shutil
    import tempfile

    from plc.pipeline import select_chunks
    from plc.similarity import (ivf_assign, ivf_store, ivf_topk_stored,
                                ivf_train)

    cent = ivf_train(corpus, dim=DIM, n_centroids=10, iters=5)
    indexed = ivf_assign(corpus, cent)
    dst = tempfile.mkdtemp(prefix="plc_ivf_")
    try:
        ivf_store(spark, indexed, dst, num_partitions=4)
        # a cell that actually holds vectors (k-means may leave cells empty)
        cell = indexed.groupBy("cell").count() \
            .orderBy(F.desc("count")).first()["cell"]
        all_chunks, _ = select_chunks(spark, dst)
        one_cell, _ = select_chunks(spark, dst,
                                    filters={"cell": (cell, cell)})
        n_all, n_one = all_chunks.count(), one_cell.count()
        assert 0 < n_one < n_all, (n_one, n_all)

        q = corpus.filter("vec_id in (0, 21, 42, 63, 84)").select(
            F.col("vec_id").alias("query_id"), "embedding")
        brute = brute_force_topk(corpus, q, k=5).collect()
        approx = ivf_topk_stored(spark, dst, q, cent, k=5,
                                 nprobe=2).collect()
        truth = {}
        for r in brute:
            truth.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(1 for r in approx
                   if r["vec_id"] in truth.get(r["query_id"], set()))
        total = sum(len(v) for v in truth.values())
        assert hits / total >= 0.8, f"stored-IVF recall {hits}/{total}"
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_ivf_empty_queries_return_empty(spark, corpus):
    """Review fix: an empty query side returns an empty, correctly-typed
    result instead of a numpy AxisError / None.join crash."""
    from plc.similarity import ivf_assign, ivf_topk, ivf_train

    cent = ivf_train(corpus, dim=DIM, n_centroids=4, iters=2)
    indexed = ivf_assign(corpus, cent)
    q = corpus.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(indexed, q, cent, k=3)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "vec_id", "cos", "rank"}

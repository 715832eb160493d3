"""Product quantization: encode determinism, ADC reconstruction,
shortlist+rerank recall with the trained codebook."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions import similarity as sim
from hrtech_etl_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_medium):
    return load_table(spark, "embeddings", sf_medium)


@pytest.fixture(scope="module")
def seed_cb(emb):
    return sim.pq_codebook(emb)


def _brute_top10(emb, qid):
    q = emb.where(F.col("vec_id") == qid)
    qv = F.broadcast(
        q.select(F.col("embedding").cast("array<double>").alias("__qv"))
    )
    return {
        r["vec_id"]
        for r in emb.crossJoin(qv)
        .select(
            "vec_id",
            sim._l2sq(
                F.col("embedding").cast("array<double>"), F.col("__qv")
            ).alias("d"),
        )
        .orderBy(F.col("d").asc(), "vec_id")
        .limit(10)
        .collect()
    }


def test_seed_vectors_encode_to_themselves(emb, seed_cb):
    """Codebook centroids ARE the first 16 vectors' subvectors, so each
    seed vector's nearest centroid in every subspace is itself (distance
    exactly 0 → argmin unambiguous unless two seeds share a subvector)."""
    enc = sim.pq_encode(emb.where(F.col("vec_id") < 16), seed_cb)
    for r in enc.select("vec_id", "__codes").collect():
        assert r["__codes"] == [r["vec_id"]] * 8


def test_codes_shape_and_range(emb, seed_cb):
    enc = sim.pq_encode(emb, seed_cb)
    bad = enc.where(
        (F.size("__codes") != 8)
        | F.exists("__codes", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_adc_seed_query_self_distance_zero(emb, seed_cb):
    """Query 0 is a seed: its reconstruction is exact, so ADC must rank
    it first at distance 0."""
    enc = sim.pq_encode(emb, seed_cb)
    q = emb.where(F.col("vec_id") == 0)
    top = sim.pq_adc_topk(enc, seed_cb, q, k=1).collect()
    assert top[0]["vec_id"] == 0 and top[0]["dist2"] == 0.0


def test_rerank_exact_distances(emb, seed_cb):
    """Re-ranked results carry EXACT distances: every returned dist2
    equals the brute-force distance for that id."""
    enc = sim.pq_encode(emb, seed_cb)
    q = emb.where(F.col("vec_id") == 17)
    got = sim.pq_rerank_topk(emb, enc, seed_cb, q, k=10, shortlist=100)
    qv = F.broadcast(
        q.select(F.col("embedding").cast("array<double>").alias("__qv"))
    )
    exact = {
        r["vec_id"]: r["d"]
        for r in emb.crossJoin(qv)
        .select(
            "vec_id",
            F.round(
                sim._l2sq(
                    F.col("embedding").cast("array<double>"), F.col("__qv")
                ),
                6,
            ).alias("d"),
        )
        .collect()
    }
    for r in got.collect():
        assert r["dist2"] == exact[r["vec_id"]]


def test_trained_codebook_rerank_recall(emb):
    """The production path: per-subspace k-means codebook + shortlist
    100 + exact rerank. Random 64-d embeddings are ANN's worst case
    (no cluster structure); measured recall@10 here is 0.7-0.9 —
    assert a safe 0.5 floor over two queries."""
    cbt = sim.pq_codebook_trained(emb)
    enc = sim.pq_encode(emb, cbt)
    recalls = []
    for qid in (0, 333):
        q = emb.where(F.col("vec_id") == qid)
        got = {
            r["vec_id"]
            for r in sim.pq_rerank_topk(
                emb, enc, cbt, q, k=10, shortlist=100
            ).collect()
        }
        recalls.append(len(got & _brute_top10(emb, qid)) / 10)
    assert sum(recalls) / len(recalls) >= 0.5


# ---------------------------------------------------------------------------
# Deterministic portable Lloyd k-means (round 14)
# ---------------------------------------------------------------------------


def test_kmeans_lloyd_converges_to_planted_means(spark):
    from hrtech_etl_spark.functions.similarity import kmeans_lloyd

    # dim 4, m=2 subspaces of width 2; ids 0,2,4 cluster at a, ids
    # 1,3,5 at b (seeds = ids 0 and 1, one per planted group)
    a, b = [0.0, 0.0], [1.0, 1.0]
    rows = []
    for i in range(6):
        base = a if i % 2 == 0 else b
        jit = 0.01 * (i // 2)
        rows.append((i, [base[0] + jit, base[1] - jit] * 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, m=2, ksub=2, dim=4, iters=4).collect()
    assert len(out) == 4  # 2 subspaces x 2 centroids
    for r in out:
        assert r["n_assigned"] == 3
        mean_jit = (0.0 + 0.01 + 0.02) / 3
        base = a if r["cid"] == 0 else b
        assert abs(r["centroid"][0] - round(base[0] + mean_jit, 6)) < 1e-9
        assert abs(r["centroid"][1] - round(base[1] - mean_jit, 6)) < 1e-9
    # determinism: a second run is bit-identical
    out2 = kmeans_lloyd(df, m=2, ksub=2, dim=4, iters=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_kmeans_lloyd_guards(spark):
    import pytest

    from hrtech_etl_spark.functions.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(100, [1.0] * 4), (101, [2.0] * 4)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="lowest ids"):
        kmeans_lloyd(df, m=2, ksub=2, dim=4, iters=1)
    with pytest.raises(ValueError, match="not divisible"):
        kmeans_lloyd(df, m=3, ksub=1, dim=4, iters=1)


def test_lloyd_codebook_drives_pq_serving_cascade(spark, sf_dir):
    """The portable trainer is a drop-in quantizer: kmeans_lloyd →
    pq_codebook_from_kmeans → encode → ADC shortlist → exact rerank,
    all through the unchanged PQ plans."""
    import pytest

    from hrtech_etl_spark.functions.similarity import (
        kmeans_lloyd,
        pq_codebook_from_kmeans,
        pq_encode,
        pq_rerank_topk,
    )
    from hrtech_etl_spark.sources.testdata import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    km = kmeans_lloyd(emb, m=8, ksub=16, dim=64, iters=3)
    cb = pq_codebook_from_kmeans(km, m=8, ksub=16)
    enc = pq_encode(emb, cb)
    q = emb.where("vec_id = 0")
    top = pq_rerank_topk(emb, enc, cb, q, k=10, shortlist=100).collect()
    assert len(top) == 10
    ids = [r["vec_id"] for r in top]
    assert ids[0] == 0 and top[0]["dist2"] == 0.0  # exact rerank finds self
    assert len(set(ids)) == 10

    # grid-shape guard: a missing centroid row must raise, not mis-index
    with pytest.raises(ValueError, match="grid"):
        pq_codebook_from_kmeans(km.where("cid <> 3"), m=8, ksub=16)

"""Similarity-search operators: exactness of the baseline, sanity and
determinism of the approximate paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.functions import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_bruteforce_self_match_and_order(spark):
    e = _emb(spark)
    q = e.where(F.col("vec_id") == 0)
    rows = sim.cosine_topk(e, q, k=10).collect()
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-6
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ivf_subset_of_corpus_and_self_match(spark):
    e = _emb(spark)
    q = e.where(F.col("vec_id") == 0)
    rows = sim.ivf_cosine_topk(e, q, k=10, n_centroids=8, nprobe=2).collect()
    # query vector's own list is always probed -> self-match survives
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-6
    # deterministic: same result on rerun
    again = sim.ivf_cosine_topk(e, q, k=10, n_centroids=8, nprobe=2).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in again]


def test_ivf_probes_fraction_of_corpus(spark):
    e = _emb(spark)
    q = e.where(F.col("vec_id") == 0)
    # probing ALL lists must recover the exact brute-force answer
    exact = [r["vec_id"] for r in sim.cosine_topk(e, q, k=10).collect()]
    full = [
        r["vec_id"]
        for r in sim.ivf_cosine_topk(
            e, q, k=10, n_centroids=8, nprobe=8
        ).collect()
    ]
    assert full == exact


def test_ivf_trained_centroids(spark):
    """Trained k-means quantizer swaps into the same plan: the query's
    own list is probed (self-match survives at similarity 1.0), and
    probing ALL trained lists recovers the exact brute-force answer."""
    import pytest

    pytest.importorskip("pyspark.ml")
    e = _emb(spark)
    q = e.where(F.col("vec_id") == 0)
    cents = sim.train_ivf_centroids(e, n_centroids=8)
    assert cents.count() == 8
    rows = sim.ivf_cosine_topk(e, q, k=10, nprobe=2, centroids=cents).collect()
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-6
    exact = [r["vec_id"] for r in sim.cosine_topk(e, q, k=10).collect()]
    full = [
        r["vec_id"]
        for r in sim.ivf_cosine_topk(e, q, k=10, nprobe=8, centroids=cents).collect()
    ]
    assert full == exact


def test_lsh_multiprobe_improves_recall(spark):
    """Multiprobe recall@k vs brute force is monotone in the probe
    count (each extra probe only adds candidates), never below the
    single-bucket baseline, and deterministic. n_probes=1 must equal
    the single-bucket operator exactly."""
    e = _emb(spark)
    q = e.where(F.col("vec_id") == 0)
    exact = [r["vec_id"] for r in sim.cosine_topk(e, q, k=10).collect()]

    def recall(ids):
        return len(set(ids) & set(exact)) / len(exact)

    single = [r["vec_id"] for r in sim.lsh_cosine_topk(e, q, k=10).collect()]
    one = [r["vec_id"] for r in sim.lsh_multiprobe_topk(e, q, k=10, n_probes=1).collect()]
    assert one == single
    recalls = []
    for n in (1, 3, 5):  # bits=4 → up to base + 4 single-bit flips
        got = [
            r["vec_id"]
            for r in sim.lsh_multiprobe_topk(e, q, k=10, n_probes=n).collect()
        ]
        recalls.append(recall(got))
        assert got[0] == 0  # self-match always survives (own bucket probed)
    assert recalls == sorted(recalls)  # monotone in probe count
    assert recalls[-1] >= recall(single)

    multi = [r["vec_id"] for r in sim.lsh_multiprobe_topk(e, q, k=10, n_probes=3).collect()]
    again = [r["vec_id"] for r in sim.lsh_multiprobe_topk(e, q, k=10, n_probes=3).collect()]
    assert multi == again

"""Incremental dedup: batch-vs-corpus-index semantics, NULL-band
safety, and the broadcast (zero-corpus-shuffle) join shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions import dedup as dd

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark structured streaming handles late data with watermarks and windows"),
    (4, "completely unrelated corpus text about parquet footer statistics"),
]
BATCH = [
    # near-identical to corpus doc 0 → contaminated
    (101, "the quick brown fox jumps over the lazy dog near the river"),
    # internal near-dup pair → within-batch dedup keeps 103
    (103, "minhash banding groups similar documents into shared buckets fast"),
    (105, "minhash banding groups similar documents into shared buckets quickly"),
    # unique → kept
    (107, "a totally novel batch document with fresh content and no twin"),
    # empty text → no shingles, NULL bands: must never match, always kept
    (109, ""),
]


def _dfs(spark):
    c = spark.createDataFrame(CORPUS, "doc_id long, text string")
    b = spark.createDataFrame(BATCH, "doc_id long, text string")
    return c, b


def test_incremental_drop(spark):
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    out = dd.drop_near_duplicates_incremental(
        batch, idx, "text", "doc_id", threshold=0.5
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [103, 107, 109]


def test_incremental_no_within_batch(spark):
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    out = dd.drop_near_duplicates_incremental(
        batch, idx, "text", "doc_id", threshold=0.5, dedup_within_batch=False
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # only the corpus hit is removed; the internal pair both survive
    assert kept == [103, 105, 107, 109]


def test_matches_union_dedup(spark):
    """Invariant vs the batch-free path: when corpus ids < batch ids,
    drop_near_duplicates over corpus ∪ batch keeps exactly corpus ∪
    incremental-survivors (min-id keep always prefers the corpus copy)."""
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    inc = dd.drop_near_duplicates_incremental(
        batch, idx, "text", "doc_id", threshold=0.5
    )
    union_kept = dd.drop_near_duplicates(
        corpus.unionByName(batch), "text", "doc_id", threshold=0.5
    )
    want = sorted(
        [r["doc_id"] for r in corpus.collect()]
        + [r["doc_id"] for r in inc.collect()]
    )
    got = sorted(r["doc_id"] for r in union_kept.collect())
    assert got == want


def test_verified_pairs_values(spark):
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    bi = dd.lsh_index(batch, "text", "doc_id")
    ver = dd.incremental_verified_pairs(bi, idx, "doc_id", threshold=0.5)
    rows = ver.collect()
    assert [(r["__cid"], r["__bid"]) for r in rows] == [(0, 101)]
    assert 0.5 <= rows[0]["jaccard"] <= 1.0


def test_broadcast_join_shape(spark):
    """The candidate join must broadcast the batch side — the corpus
    index streams map-side, never shuffles."""
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    bi = dd.lsh_index(batch, "text", "doc_id")
    plan = (
        dd.incremental_verified_pairs(bi, idx, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_index_single_barrier(spark):
    """lsh_index materializes (id, sh, sig) behind exactly ONE keyed
    barrier; with the conditional narrow-scan widen that is at most two
    keyed exchanges end to end — a third back-to-back exchange of the
    shingle-bearing rows is a regression (r6 plan audit)."""
    corpus, _ = _dfs(spark)
    plan = (
        dd.lsh_index(corpus, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("REPARTITION_BY_NUM") <= 2


def test_index_null_bands_for_empty(spark):
    _, batch = _dfs(spark)
    idx = dd.lsh_index(batch, "text", "doc_id")
    row = {r["doc_id"]: r for r in idx.collect()}
    assert row[109]["bands"] is None
    assert row[101]["bands"] is not None and len(row[101]["bands"]) == 4


def test_bucket_cap_sheds_corpus_mega_bucket(spark):
    """With max_bucket_size set, an overflowing CORPUS band bucket is
    shed before the band join; a genuine near-dup still surfaces when
    any NON-overflowing shared band remains (several shared bands is
    exactly what near-identical docs have)."""
    corpus, batch = _dfs(spark)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    bi = dd.lsh_index(batch, "text", "doc_id")
    # cap=1: corpus buckets here hold one doc each (3 distinct corpus
    # docs), so nothing overflows and the exact pair is unchanged
    ver = dd.incremental_verified_pairs(
        bi, idx, "doc_id", threshold=0.5, max_bucket_size=1
    )
    assert [(r["__cid"], r["__bid"]) for r in ver.collect()] == [(0, 101)]
    # cap=0: every corpus bucket overflows -> zero candidates, by design
    none = dd.incremental_verified_pairs(
        bi, idx, "doc_id", threshold=0.5, max_bucket_size=0
    )
    assert none.count() == 0


# ---------------------------------------------------------------------------
# Mergeable signature tables (round 14): cross-corpus dedup without text
# ---------------------------------------------------------------------------


def test_merged_signature_pairs_cross_corpus(spark):
    from hrtech_etl_spark.functions.dedup import (
        merged_signature_pairs,
        minhash_signature_table,
    )

    text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    shard0 = spark.createDataFrame(
        [
            (1, text),
            (3, "completely different content about orchard"
                " irrigation schedules and pump maintenance windows"),
            (5, ""),  # empty -> NULL sig, must never match
        ],
        "doc_id long, text string",
    )
    shard1 = spark.createDataFrame(
        [
            (2, text),                      # exact cross-shard twin of 1
            (4, text + " extra tail word"),  # near twin
            (1, text),                      # SAME id re-ingested in shard 1
        ],
        "doc_id long, text string",
    )
    sa = minhash_signature_table(shard0, "text", "doc_id")
    sb = minhash_signature_table(shard1, "text", "doc_id")
    got = {
        (r["id_a"], r["id_b"], r["shard_a"], r["shard_b"]): r["est_jaccard"]
        for r in merged_signature_pairs(
            [sa, sb], "doc_id", threshold=0.5
        ).collect()
    }
    assert got[(1, 2, 0, 1)] == 1.0        # exact twin, full agreement
    assert got[(1, 1, 0, 1)] == 1.0        # same-id re-ingest surfaces
    near = got.get((1, 4, 0, 1)) or got.get((4, 1, 1, 0))
    assert near is not None and 0.5 <= near <= 1.0
    assert all(5 not in (a, b) for a, b, _, _ in got)  # NULL sig never pairs
    assert all(s0 != s1 for _, _, s0, s1 in got)       # cross-shard only


def test_merged_signature_pairs_bucket_valve_and_within(spark):
    from hrtech_etl_spark.functions.dedup import (
        merged_signature_pairs,
        minhash_signature_table,
    )

    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    sig = minhash_signature_table(docs, "text", "doc_id")
    # within-shard pairs appear when cross_shard_only=False
    allp = merged_signature_pairs(
        [sig], "doc_id", threshold=0.5, cross_shard_only=False
    )
    assert allp.count() == 15  # C(6,2) identical docs
    # every band bucket holds all 6 docs -> valve at 5 sheds everything
    valved = merged_signature_pairs(
        [sig], "doc_id", threshold=0.5, cross_shard_only=False,
        max_bucket_size=5,
    )
    assert valved.count() == 0


def test_merged_signature_pairs_null_sig_hand_built(spark):
    """A hand-built/persisted signature table CAN carry NULL sigs;
    they must emit no band rows (posexplode-of-NULL guard) — without
    it every NULL sig collapses into one shared md5('') bucket and
    manufactures bogus pairs."""
    from hrtech_etl_spark.functions.dedup import merged_signature_pairs

    sigs = spark.createDataFrame(
        [
            (1, [7, 7, 7, 7, 7, 7, 7, 7]),
            (2, [7, 7, 7, 7, 7, 7, 7, 7]),
            (3, None),
            (4, None),
        ],
        "doc_id long, sig array<long>",
    )
    got = merged_signature_pairs(
        [sigs], "doc_id", threshold=0.0, cross_shard_only=False
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


def test_merged_signature_pairs_wrong_width_raises(spark):
    """A table persisted under a DIFFERENT num_hashes (here 16) scored
    under the default 8 would band only the first 8 positions while the
    estimator divides by 8 over 16 summed matches — est_jaccard > 1.0,
    silently. The width guard must raise instead."""
    from hrtech_etl_spark.functions.dedup import merged_signature_pairs

    wide = spark.createDataFrame(
        [(1, list(range(16))), (2, list(range(16)))],
        "doc_id long, sig array<long>",
    )
    with pytest.raises(Exception, match="num_hashes"):
        merged_signature_pairs(
            [wide], "doc_id", threshold=0.0, cross_shard_only=False
        ).collect()
    # matching width passes the guard untouched
    ok = spark.createDataFrame(
        [(1, list(range(16))), (2, list(range(16)))],
        "doc_id long, sig array<long>",
    )
    got = merged_signature_pairs(
        [ok], "doc_id", threshold=0.0, cross_shard_only=False,
        num_hashes=16,
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}
    assert got[0]["est_jaccard"] == 1.0

"""Streaming signature-store ingest: the asymmetric probe's
correctness, the sink's greedy multi-batch semantics, and the
per-batch-partition replay safety (a re-run batch rewrites its own
subdirectories bit-identically instead of double-appending)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hrtech_etl_spark.functions.dedup import (
    minhash_signature_table,
    signature_probe_pairs,
)
from hrtech_etl_spark.streaming.pipelines import (
    StreamMetrics,
    foreach_batch_signature_dedup,
)

TWIN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _sig(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signature_table(df, "text", "doc_id")


def test_signature_probe_pairs(spark):
    store = _sig(
        spark,
        [
            (1, TWIN),
            (2, "orchard irrigation schedules and pump maintenance plans"),
        ],
    )
    batch = _sig(
        spark,
        [
            (10, TWIN),                       # exact twin of stored 1
            (11, "entirely novel content about parquet row groups"),
            (1, TWIN),                        # re-ingest of stored id 1
        ],
    )
    got = {
        (r["store_id"], r["batch_id"]): r["est_jaccard"]
        for r in signature_probe_pairs(
            store, batch, "doc_id", threshold=0.5
        ).collect()
    }
    assert got[(1, 10)] == 1.0
    assert got[(1, 1)] == 1.0  # same-id re-ingest surfaces
    assert all(b != 11 for _, b in got)


def test_probe_scores_every_store_row_under_one_id(spark):
    """The store may hold SEVERAL rows under one id (a re-ingest whose
    new text scored below threshold is kept again under the same id).
    The pair estimate must be the MAX across store rows — deduping
    candidates by id pair before scoring let an arbitrary row win and
    could nondeterministically miss a true near-duplicate."""
    store = spark.createDataFrame(
        [
            # two store rows, SAME id: one sig far from the batch doc
            # (2/8 matches, est 0.25) but band-colliding via positions
            # 0-1, one identical (est 1.0)
            (5, [1, 2, 90, 91, 92, 93, 94, 95]),
            (5, [1, 2, 3, 4, 5, 6, 7, 8]),
        ],
        "doc_id long, sig array<long>",
    )
    batch = spark.createDataFrame(
        [(100, [1, 2, 3, 4, 5, 6, 7, 8])], "doc_id long, sig array<long>"
    )
    got = signature_probe_pairs(
        store, batch, "doc_id", threshold=0.5
    ).collect()
    assert [(r["store_id"], r["batch_id"], r["est_jaccard"]) for r in got] \
        == [(5, 100, 1.0)]


def test_sink_greedy_semantics_and_replay(spark, tmp_path):
    """Drive the sink directly with three batches: a batch-1 doc
    duplicating a batch-0 KEPT doc drops; a batch-2 doc duplicating a
    batch-1 DROPPED doc also drops (its keeper — the batch-0 original —
    is in the store); within-batch, the higher id of a pair drops.
    Then REPLAY batch 1: both outputs must be unchanged."""
    store = str(tmp_path / "sigs")
    clean = str(tmp_path / "clean")
    sink = foreach_batch_signature_dedup(
        store, clean, "text", "doc_id", threshold=0.5,
        metrics=(metrics := StreamMetrics()),
    )
    b0 = spark.createDataFrame(
        [
            (1, TWIN),
            (2, "completely different prose about watermark state bounds"),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (10, TWIN),  # dup of KEPT 1 -> dropped at the store probe
            (11, "fresh content on shuffle partition sizing heuristics"),
            (12, "fresh content on shuffle partition sizing heuristics"),
            # ^ within-batch pair (11, 12): 12 (higher id) drops
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (20, TWIN),  # dup of DROPPED 10 -> still dropped (1 is stored)
            (21, "late-arriving unique document about codegen stages"),
        ],
        "doc_id long, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b2, 2)
    kept = {
        r["doc_id"]: r["batch"]
        for r in spark.read.parquet(clean).collect()
    }
    assert kept == {1: 0, 2: 0, 11: 1, 21: 2}
    assert metrics.batches == 3 and metrics.rows_written == 4
    stored = spark.read.parquet(store)
    assert sorted(
        (r["doc_id"], r["batch"]) for r in stored.collect()
    ) == [(1, 0), (2, 0), (11, 1), (21, 2)]

    # replay batch 1 (checkpoint-uncommitted crash): the probe reads
    # only batch < 1, the writes overwrite batch=1 -- byte-identical
    before_clean = sorted(map(tuple, spark.read.parquet(clean).collect()))
    sink(b1, 1)
    after_clean = sorted(map(tuple, spark.read.parquet(clean).collect()))
    assert before_clean == after_clean
    assert sorted(
        (r["doc_id"], r["batch"])
        for r in spark.read.parquet(store).collect()
    ) == [(1, 0), (2, 0), (11, 1), (21, 2)]
    # the per-batch layout is literal on disk
    assert sorted(
        d for d in os.listdir(store) if d.startswith("batch=")
    ) == ["batch=0", "batch=1", "batch=2"]


def test_sink_bootstraps_over_first_write_crash_debris(spark, tmp_path):
    """A crash DURING the first store write leaves batch=0/_temporary
    with no committed parquet footer; the replayed batch 0 must
    bootstrap (probe skipped), not wedge on schema inference — the
    round-15 review's confirmed failure with a directory-existence
    check."""
    store = str(tmp_path / "sigs")
    clean = str(tmp_path / "clean")
    os.makedirs(os.path.join(store, "batch=0", "_temporary", "0"))
    sink = foreach_batch_signature_dedup(
        store, clean, "text", "doc_id", threshold=0.5,
        metrics=(metrics := StreamMetrics()),
    )
    b0 = spark.createDataFrame(
        [(1, TWIN), (2, TWIN)], "doc_id long, text string"
    )
    sink(b0, 0)  # must not raise; within-batch pair drops doc 2
    assert metrics.batches == 1 and metrics.rows_written == 1
    assert [
        (r["doc_id"], r["batch"])
        for r in spark.read.parquet(clean).collect()
    ] == [(1, 0)]


def test_corpus_ingest_sink_stages_and_replay(spark, tmp_path):
    """The streaming capstone slice (foreach_batch_corpus_ingest):
    store-probe dedup drops a batch-1 dup of a kept batch-0 doc; the
    quality floor drops junk AFTER its signature entered the store
    (the batch capstone's stage order — a junk doc's near-copies must
    not re-enter later); PII is redacted in the chunk text; a long doc
    splits into overlapping chunks; metrics count CHUNKS; replaying a
    batch leaves both outputs byte-identical."""
    from hrtech_etl_spark.streaming.pipelines import (
        foreach_batch_corpus_ingest,
    )

    store = str(tmp_path / "sigs")
    clean = str(tmp_path / "chunks")
    prose = (
        "the quick brown fox jumps over the lazy dog while the "
        "afternoon sun warms the meadow and the river runs slow"
    )
    long_doc = " ".join(
        f"the segment {i} carries some plain prose and words"
        for i in range(8)
    )  # ~390 chars -> 2 chunks at max_chars=300/overlap=50
    sink = foreach_batch_corpus_ingest(
        store, clean, "text", "doc_id", threshold=0.5,
        quality_min=0.5, redact=True,
        chunk_chars=300, chunk_overlap=50,
        metrics=(metrics := StreamMetrics()),
    )
    b0 = spark.createDataFrame(
        [
            (1, prose),
            (2, "!!!! ???? ...."),  # junk: fails the 0.5 quality floor
            (3, "you can reach the author at jane@corp.example.com for "
                "more details on the dataset and the license terms"),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (10, prose),      # dup of KEPT 1 -> dropped at the probe
            (11, long_doc),   # fresh, multi-chunk
        ],
        "doc_id long, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    chunks = spark.read.parquet(clean)
    rows = {
        (r["doc_id"], r["chunk_idx"]): r for r in chunks.collect()
    }
    # doc 2 (junk) has NO chunks, but its signature IS in the store
    assert {d for d, _ in rows} == {1, 3, 11}
    stored_ids = {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    }
    assert stored_ids == {1, 2, 3, 11}
    # doc 10 (probe dup) is in neither
    # PII redacted in the landed chunk text
    assert "@" not in rows[(3, 0)]["chunk_text"]
    assert "[EMAIL]" in rows[(3, 0)]["chunk_text"]
    # the long doc split with the declared overlap
    assert (11, 1) in rows and rows[(11, 0)]["chunk_text"][250:300] \
        == rows[(11, 1)]["chunk_text"][:50]
    # n_tokens is the whitespace count of the chunk itself
    assert all(
        r["n_tokens"] == len(r["chunk_text"].split())
        for r in rows.values()
    )
    # batch column rides the partition layout; metrics count chunks
    assert {r["batch"] for r in rows.values()} == {0, 1}
    assert metrics.batches == 2 and metrics.rows_written == len(rows)

    # replay batch 1: byte-identical outputs (per-batch overwrite)
    before = sorted(map(tuple, chunks.collect()))
    sink(b1, 1)
    assert sorted(map(tuple, spark.read.parquet(clean).collect())) \
        == before
    assert {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    } == {1, 2, 3, 11}

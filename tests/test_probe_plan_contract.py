"""Plan contract for the ASYMMETRIC signature probe
(``functions/dedup.py::signature_probe_pairs``): the claim "the store
is NEVER shuffled" must live in the executed plan, not in docstrings
and smoke-test job counts (r15 verdict, next-round #3).

Auto-broadcast is disabled for the duration: at test scale Catalyst
would broadcast the small side from statistics alone, which is exactly
what does NOT happen at 100 TB — there, the explicit hint is the only
thing standing between the probe and a full band shuffle of the store.
With it off:

- ``broadcast="batch"`` (streaming default): the band join is a
  BroadcastHashJoin building the BATCH side; ZERO hash exchanges on
  the band keys anywhere in the plan — the store's banded projection
  stays a scan-side map from parquet to join. The only hash exchange
  is the bounded candidate-pair aggregate on (store_id, batch_id).
- ``broadcast="store"`` (huge corpus vs small external table): same
  shape with the build side flipped.
- ``broadcast="none"``: both band sides hash-exchange — the always-
  safe shuffled band join, asserted so the knob demonstrably changes
  the physical plan and not just the docstring.
"""

from __future__ import annotations

import re

import pytest

from hrtech_etl_spark.functions.dedup import (
    minhash_signature_table,
    read_signature_table,
    signature_probe_pairs,
    write_signature_table,
)

_DOCS = [
    (i, f"alpha beta gamma doc {i} with words {i * 7 % 13} {i * 3 % 11}")
    for i in range(50)
]


@pytest.fixture()
def no_auto_broadcast(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture()
def probe_frames(spark, tmp_path):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    store_path = str(tmp_path / "store")
    write_signature_table(
        minhash_signature_table(docs, "text", "doc_id"), store_path
    )
    store = read_signature_table(spark, store_path)
    batch = minhash_signature_table(
        spark.createDataFrame(
            [(100, "alpha beta gamma doc 3 with words 8 9")],
            "doc_id long, text string",
        ),
        "text",
        "doc_id",
    )
    return store, batch


def _executed(df) -> str:
    df.collect()  # AQE: the final plan only exists after execution
    return df._jdf.queryExecution().executedPlan().toString()


def _band_join_lines(plan: str) -> list[str]:
    return re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) "
        r"\[band_idx[^\n]*",
        plan,
    )


def test_batch_broadcast_never_shuffles_store(
    spark, probe_frames, no_auto_broadcast
):
    store, batch = probe_frames
    plan = _executed(
        signature_probe_pairs(store, batch, "doc_id", threshold=0.5)
    )
    # the core contract: no hash exchange on the band keys ANYWHERE
    # (final or initial plan) — the store's bands go scan -> join
    assert "Exchange hashpartitioning(band_idx" not in plan, plan
    joins = _band_join_lines(plan)
    assert joins and all(j.startswith("BroadcastHashJoin") for j in joins), (
        joins or plan
    )
    # batch is the build side (BuildRight: store is the left/stream side)
    assert all("BuildRight" in j for j in joins), joins
    # the store subtree is really parquet-backed in this plan
    assert "Scan parquet" in plan
    # the only hash exchange is the bounded pair aggregate
    band_free = [
        m
        for m in re.findall(r"Exchange hashpartitioning\(\w+", plan)
        if "band_idx" in m or "bucket" in m
    ]
    assert band_free == []


def test_store_broadcast_flips_build_side(
    spark, probe_frames, no_auto_broadcast
):
    store, batch = probe_frames
    plan = _executed(
        signature_probe_pairs(
            store, batch, "doc_id", threshold=0.5, broadcast="store"
        )
    )
    assert "Exchange hashpartitioning(band_idx" not in plan, plan
    joins = _band_join_lines(plan)
    assert joins and all(j.startswith("BroadcastHashJoin") for j in joins)
    assert all("BuildLeft" in j for j in joins), joins


def test_none_is_a_real_shuffled_band_join(
    spark, probe_frames, no_auto_broadcast
):
    store, batch = probe_frames
    plan = _executed(
        signature_probe_pairs(
            store, batch, "doc_id", threshold=0.5, broadcast="none"
        )
    )
    joins = _band_join_lines(plan)
    assert joins and not any(
        j.startswith("BroadcastHashJoin") for j in joins
    ), joins
    assert "Exchange hashpartitioning(band_idx" in plan


def test_all_strategies_agree_on_pairs(spark, probe_frames):
    store, batch = probe_frames
    results = {
        mode: sorted(
            map(
                tuple,
                signature_probe_pairs(
                    store, batch, "doc_id", threshold=0.5, broadcast=mode
                ).collect(),
            )
        )
        for mode in ("batch", "store", "none")
    }
    assert results["batch"] == results["store"] == results["none"]
    assert results["batch"], "fixture must produce at least one pair"
    with pytest.raises(ValueError, match="broadcast"):
        signature_probe_pairs(store, batch, "doc_id", broadcast="left")

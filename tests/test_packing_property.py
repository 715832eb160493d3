"""Property test: concat_split_packing against a pure-Python
sequential reference (independent md5 hash + one cumsum) over random
length tables — the two-phase distributed prefix sum must be
indistinguishable from the sequential semantics it replaces."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from hrtech_etl_spark.operators.corpus import concat_split_packing


def _ph(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def _reference(rows, seq_len, seed, n_shards):
    keyed = sorted(
        (
            (_ph(str(i), seed) % n_shards, _ph(str(i), seed), i, ln)
            for i, ln in rows
        ),
    )
    out, off = {}, 0
    for _shard, _h, i, ln in keyed:
        first = off // seq_len
        n_blocks = 0 if ln == 0 else (off + ln - 1) // seq_len - first + 1
        out[i] = (off, first, n_blocks)
        off += ln
    return out


@st.composite
def length_table(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    ids = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n,
            max_size=n,
            unique=True,
        )
    )
    return [
        (i, draw(st.integers(min_value=0, max_value=500))) for i in ids
    ]


@settings(max_examples=10, deadline=None)
@given(
    rows=length_table(),
    seed=st.integers(min_value=0, max_value=5),
    seq_len=st.sampled_from([64, 257]),
    n_shards=st.sampled_from([1, 4, 16]),
)
def test_concat_split_matches_sequential_reference(
    spark, rows, seed, seq_len, n_shards
):
    want = _reference(rows, seq_len, seed, n_shards)
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["offset"], r["block_first"], r["n_blocks"])
        for r in concat_split_packing(
            df, "doc_id", "n_tokens", seq_len, seed=seed, n_shards=n_shards
        ).collect()
    }
    assert got == want

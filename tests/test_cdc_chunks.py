"""content_defined_chunks: losslessness, determinism, and the
re-synchronization property that motivates CDC over fixed blocks."""

from __future__ import annotations

import hashlib

import pytest

from hrtech_etl_spark.functions.dedup import content_defined_chunks

TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill and the rain keeps falling "
    "on the old tin roof of the barn behind the orchard fence"
)


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = content_defined_chunks(df, "text", "doc_id", **kw)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start, r.chunk_len, r.chunk_md5)
        )
    return {k: sorted(v) for k, v in got.items()}


def test_chunks_are_lossless_and_contiguous(spark):
    got = _chunks(spark, [(1, TEXT)])[1]
    # contiguous 1-based cover of the whole text
    pos = 1
    rebuilt = []
    for idx, (chunk_idx, start, length, md5) in enumerate(got, start=1):
        assert chunk_idx == idx
        assert start == pos
        piece = TEXT[start - 1 : start - 1 + length]
        assert hashlib.md5(piece.encode()).hexdigest() == md5
        rebuilt.append(piece)
        pos += length
    assert "".join(rebuilt) == TEXT
    assert len(got) > 1, "text long enough to produce several chunks"


def test_short_and_empty_docs(spark):
    got = _chunks(spark, [(1, "abc"), (2, ""), (3, None)])
    assert set(got) == {1}
    ((idx, start, length, md5),) = got[1]
    assert (idx, start, length) == (1, 1, 3)
    assert md5 == hashlib.md5(b"abc").hexdigest()


def test_resync_after_prefix_edit(spark):
    """Inserting a prefix shifts every byte offset, yet all chunk
    hashes after the first boundary past the edit are shared with the
    original — the dedup property fixed-size blocks lack."""
    edited = "XYZPREFIX " + TEXT
    got = _chunks(spark, [(1, TEXT), (2, edited)])
    h1 = {md5 for _, _, _, md5 in got[1]}
    h2 = {md5 for _, _, _, md5 in got[2]}
    shared = h1 & h2
    # everything from the first post-edit boundary onward re-syncs:
    # only the leading chunk(s) covering the edit differ
    assert len(shared) >= len(h1) - 2, (sorted(got[1]), sorted(got[2]))
    assert shared, "no chunk re-synchronized"


def test_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        content_defined_chunks(df, "text", "doc_id", window=1)
    with pytest.raises(ValueError):
        content_defined_chunks(df, "text", "doc_id", divisor=1)

"""shingle_containment_pairs vs a brute-force reference."""

from __future__ import annotations

import pytest

from hrtech_etl_spark.functions.dedup import shingle_containment_pairs


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _doc(seed: int, n: int) -> str:
    return " ".join(WORDS[(seed * 7 + i * 3) % len(WORDS)] for i in range(n))


def _filler(seed: int, n: int) -> str:
    """All-distinct tokens -> all-distinct shingles (no accidental overlap)."""
    return " ".join(f"w{seed}x{i}" for i in range(n))


def test_containment_matches_bruteforce(spark):
    quote = _doc(1, 12)
    docs = [
        (0, quote),                       # short doc
        (1, _filler(2, 30) + " " + quote),   # quotes doc 0 verbatim
        (2, _filler(3, 25)),
        (3, _filler(4, 18)),
        (4, quote + " " + _filler(5, 40)),   # also quotes doc 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in shingle_containment_pairs(
            df, "text", "doc_id", threshold=0.5, max_doc_freq=100
        ).collect()
    }
    # brute force on string shingles (no hash collisions at this size)
    sets = {i: _shingles(t) for i, t in docs}
    expect = {}
    for a in range(5):
        for b in range(a + 1, 5):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            c = inter / min(len(sets[a]), len(sets[b]))
            if round(c, 4) >= 0.5:
                expect[(a, b)] = round(c, 4)
    assert got == expect
    # the quote relation itself must have been found
    assert (0, 1) in got and (0, 4) in got


def test_containment_asymmetry_vs_jaccard(spark):
    """A short doc fully inside a long one: containment 1.0 even
    though Jaccard is small — the operator's reason to exist."""
    short = _doc(1, 10)
    long_ = short + " " + _filler(2, 120)
    df = spark.createDataFrame(
        [(0, short), (1, long_)], "doc_id long, text string"
    )
    rows = shingle_containment_pairs(
        df, "text", "doc_id", threshold=0.9, max_doc_freq=100
    ).collect()
    assert len(rows) == 1 and rows[0]["containment"] == 1.0
    sa, sb = _shingles(short), _shingles(long_)
    assert len(sa & sb) / len(sa | sb) < 0.2  # jaccard would miss it


def test_containment_stop_shingle_valve(spark):
    """A shingle present in every doc is dropped by the doc-freq
    valve; pairs overlapping ONLY through it disappear."""
    boiler = "common footer text"
    docs = [(i, _filler(i + 10, 12) + " " + boiler) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = shingle_containment_pairs(
        df, "text", "doc_id", threshold=0.15, max_doc_freq=3
    ).collect()
    # the only shared shingles are inside the boilerplate tail, whose
    # doc-freq (6) exceeds the valve (3) -> no candidate survives
    for r in rows:
        assert r["inter"] > 0  # any surviving pair overlaps on real content

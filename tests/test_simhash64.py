"""64-bit SimHash (numpy pandas-UDF path): structural parity with the
32-bit JVM-expression path and the pigeonhole exact-recall guarantee.

Parity is exact by construction, not statistical: both widths hash
tokens as md5 of the same seeded payload, and the first 8 hex chars
(the 32-bit hash) are the TOP half of the first 16 (the 64-bit hash) —
so the 64-bit signature's upper 32 bits must equal the 32-bit
signature bit-for-bit, and 32-bit Hamming distance is a lower bound on
64-bit Hamming distance (⇒ 64-bit pairs at a threshold are a subset of
32-bit pairs at the same threshold)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions import dedup as dd

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def sigs(spark, docs):
    s32 = {
        r["doc_id"]: r["sh"]
        for r in dd.simhash_signatures(docs, "text", "doc_id", bits=32).collect()
    }
    s64 = {
        r["doc_id"]: r["sh"]
        for r in dd.simhash_signatures(docs, "text", "doc_id", bits=64).collect()
    }
    return s32, s64


def test_upper_half_equals_32bit_signature(sigs):
    s32, s64 = sigs
    assert set(s32) == set(s64) and len(s32) == 500
    for doc_id, v64 in s64.items():
        assert (v64 % (1 << 64)) >> 32 == s32[doc_id], doc_id
    # the packed-bit path really uses the full width: some signature
    # has the top bit set (negative as a signed long)
    assert any(v < 0 for v in s64.values())


def test_64bit_banded_exact_recall(spark, docs, sigs):
    """Multi-band blocking at bits=64 (4 bands × 16 bits) must find
    EXACTLY the pairs the all-pairs Hamming join finds at
    max_hamming=3 — the pigeonhole recall property."""
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dd.simhash_pairs(
            docs, "text", "doc_id", bits=64, max_hamming=3
        ).collect()
    }
    _, s64 = sigs
    ids = sorted(s64)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((s64[a] ^ s64[b]) % (1 << 64)).count("1")
            if h <= 3:
                brute.add((a, b, h))
    assert banded == brute


def test_64bit_pairs_subset_of_32bit(spark, docs):
    rows64 = dd.simhash_pairs(
        docs, "text", "doc_id", bits=64, max_hamming=3
    ).collect()
    p64 = {(r["id_a"], r["id_b"]) for r in rows64}
    p32 = {
        (r["id_a"], r["id_b"])
        for r in dd.simhash_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    }
    # 32-bit Hamming lower-bounds 64-bit Hamming (upper-half identity)
    assert p64 and p64 <= p32
    # same-token-set clones in the fixture stay hamming-0 at full width
    assert any(r["hamming"] == 0 for r in rows64)


def test_parity_on_messy_whitespace_and_nulls(spark):
    """The exact cases where a naive Python tokenizer diverges from the
    JVM path: trailing newlines (Spark trim strips only spaces; split
    keeps trailing empty strings), Unicode whitespace (Java \\s is
    ASCII-only), and NULL text (must yield NULL signature, not 0)."""
    rows = [
        (0, "hello world\n"),          # trailing ASCII whitespace
        (1, "hello world"),       # NBSP: not a Java \s split point
        (2, "  padded with spaces  "),
        (3, None),                     # null text
        (4, "tabs\tand\nnewlines\r"),
        (5, "line sep"),          # unicode line separator
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s32 = {
        r["doc_id"]: r["sh"]
        for r in dd.simhash_signatures(df, "text", "doc_id", bits=32).collect()
    }
    s64 = {
        r["doc_id"]: r["sh"]
        for r in dd.simhash_signatures(df, "text", "doc_id", bits=64).collect()
    }
    assert s32[3] is None and s64[3] is None  # null -> null, both widths
    for doc_id in (0, 1, 2, 4, 5):
        assert (s64[doc_id] % (1 << 64)) >> 32 == s32[doc_id], doc_id


def test_full_width_parity_with_reference_kernel(spark):
    """The batch-vectorized UDF (per-batch vocabulary hashed once +
    one reduceat vote pass) must equal a straightforward per-document
    reference kernel on ALL 64 bits — not just the upper half the
    32-bit cross-check covers. Micro-bench note (sf0.1 documents,
    5k docs, one batch, this host): per-doc loop 0.325s vs vectorized
    0.156s ≈ 2.1× throughput; md5 calls drop by the cross-document
    vocabulary repetition factor (~3700× on that fixture)."""
    import hashlib
    import re

    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta zeta"),  # shares vocab with 0
        (2, "completely disjoint vocabulary here\n"),  # trailing ws
        (3, None),
        (4, ""),  # empty string -> the single empty token
        (5, "alpha  beta\t\tgamma"),  # repeated separators
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["sh"]
        for r in dd.simhash_signatures(df, "text", "doc_id", bits=64).collect()
    }

    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    for doc_id, text in rows:
        if text is None:
            assert got[doc_id] is None
            continue
        toks = set(ascii_ws.split(text.lower().strip(" ")))
        hs = [
            int(hashlib.md5(f"99:{tok}".encode()).hexdigest()[:16], 16)
            for tok in toks
        ]
        sig = 0
        for bit in range(64):
            votes = sum((h >> bit) & 1 for h in hs)
            if votes * 2 > len(toks):
                sig |= 1 << bit
        if sig >= 1 << 63:
            sig -= 1 << 64  # two's-complement as a signed long
        assert got[doc_id] == sig, doc_id


def test_null_text_produces_no_pairs(spark):
    """Two null-text rows must NOT pair as hamming-0 duplicates in
    either width (the JVM path's NULL band values never join; the UDF
    path must match)."""
    rows = [(0, None), (1, None), (2, "real text content here"), (3, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for bits in (32, 64):
        got = dd.simhash_pairs(df, "text", "doc_id", bits=bits).collect()
        assert got == [], f"bits={bits} produced pairs from null text"

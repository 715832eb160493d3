"""Declared queries: table profiling, z-order layout keys, and
incremental corpus dedup.

Registered AFTER the long-stable families — these extend the declared
surface without reordering the existing gate entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hrtech_etl_spark.functions import dedup as dd
from hrtech_etl_spark.operators.layout import zorder_key, zorder_key_sql
from hrtech_etl_spark.operators.profiling import profile_sql, profile_table
from hrtech_etl_spark.sources.testdata import load_table
from hrtech_etl_spark.workload.registry import query
from hrtech_etl_spark.functions.hashing import portable_hash_sql
from hrtech_etl_spark.workload.text_llm import minhash_sql, shingles_sql

_PH_S = portable_hash_sql("s")

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]

#: Quantization ranges for the z-order demo key. Deliberately the
#: sf0.01 stats: the quantizer CLAMPS out-of-range values (stale-stats
#: tolerance), and the oracle applies the identical clamp, so the
#: query stays correct at every scale factor.
_ZSPEC = [("user_id", 0, 149), ("v_int", 0, 490)]
_ZBITS = 8


@query(
    "profile_documents",
    sql=profile_sql("documents", _PROFILE_COLS),
)
def profile_documents(spark, sf_dir):
    """Single-pass per-column profile of the documents table (exact
    distinct counts so the DuckDB oracle can value-match; the
    ``exact=False`` HLL default is the 100 TB path — see
    :mod:`hrtech_etl_spark.operators.profiling`)."""
    docs = load_table(spark, "documents", sf_dir)
    return profile_table(docs, _PROFILE_COLS, exact=True)


@query(
    "layout_zorder_key",
    sql=f"""
    SELECT event_id, user_id, v_int, {zorder_key_sql(_ZSPEC, bits=_ZBITS)} AS z
    FROM (
      SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v_int
      FROM events
    )
    ORDER BY z, event_id LIMIT 100
    """,
)
def layout_zorder_key(spark, sf_dir):
    """Morton key computation over (user_id, floor(value)) — the pure
    expression core of :func:`write_zordered`, value-checked bit for
    bit against the DuckDB rendering. Total order (z, event_id) keeps
    the LIMIT deterministic."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "v_int", F.floor(F.col("value")).cast("long")
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "v_int",
            zorder_key(_ZSPEC, bits=_ZBITS).alias("z"),
        )
        .orderBy("z", "event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: odd-doc_id batch cleaned against even-doc_id corpus
# ---------------------------------------------------------------------------

_INC_SIG = ", ".join(minhash_sql(j) + f" AS mh{j}" for j in range(8))


def _inc_bands_sql(src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(mh{2 * b}::VARCHAR || ',' || mh{2 * b + 1}::VARCHAR) AS bucket "
        f"FROM {src}"
        for b in range(4)
    )


@query(
    "dedup_incremental",
    sql=f"""
    WITH csh AS (SELECT doc_id, {shingles_sql()} AS sh FROM documents WHERE doc_id % 2 = 0),
    bsh AS (SELECT doc_id, {shingles_sql()} AS sh FROM documents WHERE doc_id % 2 = 1),
    chs AS (SELECT doc_id, list_distinct(list_transform(sh, s -> {_PH_S})) AS sh FROM csh),
    bhs AS (SELECT doc_id, list_distinct(list_transform(sh, s -> {_PH_S})) AS sh FROM bsh),
    csig AS (SELECT doc_id, {_INC_SIG} FROM csh),
    bsig AS (SELECT doc_id, {_INC_SIG} FROM bsh),
    cband AS ({_inc_bands_sql("csig")}),
    bband AS ({_inc_bands_sql("bsig")}),
    cand AS (
      SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
      FROM cband c JOIN bband b ON c.band_idx = b.band_idx AND c.bucket = b.bucket
    ),
    ver AS (
      SELECT cand.cid, cand.bid,
             round(CASE WHEN len(list_distinct(x.sh || y.sh)) > 0
                        THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(x.sh || y.sh))
                        ELSE 0.0 END, 4) AS jaccard
      FROM cand JOIN chs x ON cand.cid = x.doc_id JOIN bhs y ON cand.bid = y.doc_id
    ),
    contaminated AS (SELECT DISTINCT bid FROM ver WHERE jaccard >= 0.25)
    SELECT (SELECT count(*) FROM bsh) AS n_batch,
           (SELECT count(*) FROM contaminated) AS n_removed,
           (SELECT count(*) FROM bsh) - (SELECT count(*) FROM contaminated) AS n_kept
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: the odd-doc_id half of documents is a
    'new batch' cleaned against the even half's precomputed
    :func:`~hrtech_etl_spark.functions.dedup.lsh_index` — ONE streamed
    pass over the corpus index, broadcast batch bands, zero corpus
    shuffle (see `incremental_verified_pairs`). Declared output is the
    contamination summary; the within-batch follow-up dedup is the
    already-gated `dedup_minhash_lsh`/cluster machinery."""
    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = dd.lsh_index(corpus, "text", "doc_id")
    bi = dd.lsh_index(batch, "text", "doc_id")
    ver = dd.incremental_verified_pairs(bi, idx, "doc_id", threshold=0.25)
    nb = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    nr = (
        ver.select("__bid")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_removed"))
    )
    return nb.crossJoin(nr).select(
        "n_batch",
        "n_removed",
        (F.col("n_batch") - F.col("n_removed")).alias("n_kept"),
    )

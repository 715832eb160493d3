"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data dedup at 100TB cannot compare all pairs: every operator
here reduces the candidate space first (hash buckets, LSH bands,
blocking keys) and only verifies within buckets. All column work is
JVM-side expressions built on the portable hash
(:mod:`hrtech_etl_spark.functions.hashing`) so results are
reproducible in the DuckDB oracle.

Shapes
------
- exact:    groupBy(md5(text)) — one shuffle on the fingerprint.
- MinHash:  shingle → k seeded min-hashes → band buckets → self-join
            *within buckets only* → exact Jaccard verify on survivors.
- SimHash:  per-token hash bit-votes → 32-bit signature; candidates
            share ≥1 of its disjoint bands (pigeonhole ⇒ exact recall
            at the Hamming threshold), verified by Hamming dist.
- n-gram:   blocking key (cheap) → exact Jaccard within block.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hrtech_etl_spark.core.partitioning import keyed_barrier, num_partitions, spread
from hrtech_etl_spark.functions.hashing import (
    MINHASH_PRIME,
    affine_minhash,
    fingerprint,
    portable_hash,
)
from hrtech_etl_spark.functions.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group rows by content fingerprint; one row per distinct content
    with the canonical (minimum) id and the duplicate count."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the minimum-id row per distinct content (deterministic,
    unlike dropDuplicates which keeps an arbitrary row)."""
    fp = fingerprint(F.col(text_col)).alias("__fp")
    w_min = df.select(fp, F.col(id_col).alias("__id"))
    keep = w_min.groupBy("__fp").agg(F.min("__id").alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(col: Column, k: int = 2) -> Column:
    """Distinct word k-grams of lowercased text (the MinHash item set)
    — ``array_distinct`` over the shared non-distinct construction
    (:func:`hrtech_etl_spark.functions.text.word_ngrams`, the
    zip_with-over-shifted-slices shape; see its docstring for why
    element_at-in-transform is O(tokens²)). Texts shorter than k
    tokens get no shingles.

    ``k=1`` keeps its historical semantics (distinct raw tokens,
    INCLUDING the empty token an empty text produces) — the oracle SQL
    renderings mirror exactly this, so it must not silently change.
    """
    from hrtech_etl_spark.functions.text import word_ngrams

    t = tokens(col)
    if k == 1:
        return F.array_distinct(t)
    return F.array_distinct(word_ngrams(col, k))


def minhash_signature(
    shingles: Column, num_hashes: int = 8, *, pre_hashed: bool = False
) -> Column:
    """The k-minhash signature as ONE ``array<long>`` column, computed
    in a single pass with a single md5 per shingle (zero md5s when
    ``pre_hashed`` — the column already holds portable_hash values).

    Universal-hash construction: base = portable_hash(shingle), then
    ``h_j = (A[j]*base + B[j]) mod P`` (:mod:`..functions.hashing`).
    The naive alternative — k columns of
    ``array_min(transform(sh, md5-with-seed-j))`` — costs k md5s per
    shingle in interpreted higher-order-function eval and dominated the
    whole LSH pipeline; here the inner ``transform`` materializes the
    base hashes once, and the fold keeps elementwise minima of the k
    cheap affine transforms. Empty shingle sets yield NULL (parity with
    SQL ``list_min`` over an empty list). min over the distinct hashed
    set == min over all shingles' hashes, so a ``pre_hashed`` distinct
    array gives the identical signature.
    """
    hashed = (
        shingles
        if pre_hashed
        else F.transform(shingles, lambda s: portable_hash(s))
    )
    init = F.array(*[F.lit(MINHASH_PRIME)] * num_hashes).cast("array<long>")
    folded = F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[affine_minhash(h, j) for j in range(num_hashes)]),
            lambda a, b: F.least(a, b),
        ),
    )
    return F.when(F.size(shingles) > 0, folded)


def lsh_bands(
    sig_col: str, num_hashes: int = 8, rows_per_band: int = 2
) -> list[Column]:
    """Group the signature array into bands; a band's bucket key is the
    md5 of its concatenated min-hashes. Docs sharing ANY band bucket
    are candidate pairs. ``sig_col`` must be a *materialized* signature
    column (computed behind an exchange) — element extraction is then
    free, instead of re-running the signature fold per band."""
    bands = []
    for b in range(0, num_hashes, rows_per_band):
        parts = [
            F.col(sig_col).getItem(i).cast("string")
            for i in range(b, b + rows_per_band)
        ]
        bands.append(F.md5(F.concat_ws(",", *parts)).alias(f"band{b // rows_per_band}"))
    return bands


def shingle_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 2,
    hashed: bool = False,
    materialize: bool = True,
    drop_empty: bool = False,
) -> DataFrame:
    """(id, shingle-set) table behind a repartition barrier.

    ``drop_empty=True`` drops rows whose text yields NO shingles — on
    the CHEAP exact-equivalent predicate ``size(tokens) >= k`` (it is
    literally the word_ngrams CASE condition; for k=1 every non-NULL
    text keeps its historical [""] set, and NULL text is dropped on
    both forms) — applied BELOW the exchange, and tags the ``sh``
    column metadata so downstream signature builds skip their
    ``size(sh) > 0`` re-filter. Why this exists (r18 profiling):
    Catalyst pushes that downstream filter through the barrier
    exchange, substituting the FULL tokenize+shingle construction into
    the predicate — which then evaluates once per row inside the
    single-task scan stage (~0.3s of the minhash gate's 1.1s job time
    at sf0.1; guide §2.4/§7.2 — the round-13 pushed-predicate disease
    at the exchange boundary instead of the projection). The cheap
    predicate costs one split per row below the exchange, also prunes
    shingle-less rows from the exchange itself, and candidate/verify
    consumers are invariant to it: an empty set never bands, never
    verifies, and never appears as a candidate id. Default False —
    standalone :func:`jaccard_verify` keeps scoring arbitrary pairs
    (an empty-set side is a kept row with jaccard 0.0 there).

    ``hashed=False`` (string shingles): ONE keyed exchange of the raw
    (id, text) rows with the shingle projection ABOVE it — measured
    against materializing the shingle arrays behind a second exchange,
    recomputing the projection per consumer is cheaper than shuffling
    ``array<string>`` columns (8.2s vs 4.3s for the full LSH query at
    sf0.1): text compresses/serializes better than its exploded form.

    ``hashed=True`` (the LSH fast path): shingles are reduced to their
    distinct ``portable_hash`` values (``array<long>``) and exchanged
    AGAIN — this second shuffle materializes the hashed sets, so every
    consumer (signature fold, both Jaccard-verify sides) reads ONE
    ReusedExchange and performs ZERO tokenize/md5 work. Unlike string
    shingles, the hashed arrays are compact (8 bytes/shingle), so the
    extra exchange wins. Signature + hash-based verify are both
    invariant to this reduction (min over the distinct hash set == min
    over per-shingle hashes). At corpus scale this boundary is where
    you'd persist the table.

    Scale-conditional heads (core.partitioning): the raw keyed exchange
    fires only when the scan is NARROWER than defaultParallelism — on a
    cluster-scale scan that exchange was a full extra pass shuffling
    raw text, and the already-wide scan parallelizes the shingling by
    itself. The hashed barrier always exchanges (reuse is its point)
    but never narrows a wide input. Pinned explicit counts throughout:
    with a bare ``repartition(col)`` AQE sees a few MB of shuffle data
    and coalesces back to one partition — correct for IO-bound plans,
    wrong here where cost is per-row CPU, and it would serialize the
    heavy stages.
    """
    from hrtech_etl_spark.functions.text import tokens as _tokens

    n = df.sparkSession.sparkContext.defaultParallelism
    raw = df.select(F.col(id_col), F.col(text_col))
    if drop_empty:
        # size(tokens) >= k is EXACTLY size(word_shingles(text,k)) > 0:
        # word_ngrams' own CASE condition for k>=2; for k=1 every
        # non-NULL text has size >= 1 ([""] included) and NULL text is
        # dropped by both forms (size(NULL)=-1 vs NULL-valued filter)
        raw = raw.where(F.size(_tokens(F.col(text_col))) >= shingle_k)
    if num_partitions(raw) < n:
        raw = raw.repartition(n, F.col(id_col))
    sh = word_shingles(F.col(text_col), k=shingle_k)
    _md = {"shingles_nonempty": True} if drop_empty else None
    if not hashed:
        return raw.select(F.col(id_col), sh.alias("sh", metadata=_md))
    hashed_sh = hashed_shingles(sh)
    projected = raw.select(F.col(id_col), hashed_sh.alias("sh", metadata=_md))
    if not materialize:
        # The caller will stack MORE per-row projections (e.g. the
        # lsh_index signature fold) on top and place ONE barrier above
        # the whole stack — a barrier here would be a redundant full
        # exchange of the shingle-bearing rows (CollapseProject keeps
        # the non-cheap shingle expression in its own stacked Project,
        # so `sh` is still computed once per row).
        return projected
    # factor=2, not 1: same key + same count would let EnsureRequirements
    # drop this barrier and re-inline the hashing into every consumer.
    return keyed_barrier(projected, id_col, factor=2)


def hashed_shingles(sh: Column) -> Column:
    """THE hashed-set measure shared by every hashed-Jaccard path:
    distinct 32-bit portable-hash values of the shingle set. Defined
    once so the operators and the oracle renderings stay in lockstep
    (portable_hash is 32-bit — an N-shingle doc has ~N²/2³³ internal
    collision probability, e.g. ~1% at 10k shingles; both engines
    collapse a collision identically, but set ``hashed=False`` where
    literal string-set semantics matter)."""
    return F.array_distinct(F.transform(sh, lambda s: portable_hash(s)))


#: Above this many stop shingles the literal ``array_except`` filter
#: switches to a broadcast-variable pandas filter: a literal
#: ``F.array(*N)`` builds an N-node expression tree that blows up plan
#: serialization/codegen long before ``max_stop`` trips.
STOP_SHINGLE_LITERAL_MAX = 1_000


def remove_stop_shingles(
    shingles: DataFrame,
    *,
    max_doc_frac: float = 0.5,
    max_stop: int = 100_000,
    literal_max: int = STOP_SHINGLE_LITERAL_MAX,
) -> DataFrame:
    """Drop boilerplate shingles — those appearing in more than
    ``max_doc_frac`` of documents — from a hashed shingle table.

    Boilerplate n-grams (shared headers/footers/disclaimers) are the
    classic corpus-scale dedup poison: they drag unrelated documents'
    MinHash signatures together, flooding the band join with false
    candidates (the in-bucket analog of SQL stop words). Document
    frequency is computed in one explode + count-distinct-free
    aggregation pass; the stop set is by construction small (each stop
    shingle occupies ≥ ``max_doc_frac`` of the corpus, so there can be
    at most ``distinct_shingles_per_doc / max_doc_frac`` of them).
    ``max_stop`` guards the driver against a mis-set threshold
    (e.g. ``max_doc_frac`` so low that half the vocabulary qualifies).

    The filter ships in one of two row-preserving, shuffle-free forms:

    - ``len(stop) <= literal_max``: a literal ``array_except`` — the
      common tiny case, pure codegen'd expression.
    - larger: the stop set rides an ``sc.broadcast`` variable into an
      Arrow-batched pandas UDF that set-filters each array. A literal
      expression tree of 10k+ nodes chokes plan
      serialization/codegen; a broadcast variable is shipped once per
      executor out-of-band of the plan, and numpy ``isin`` does the
      per-row work. (The explode → anti-join → re-collect alternative
      costs a full corpus shuffle and silently drops rows whose every
      shingle is stopped.)

    Apply between :func:`shingle_table` and the candidate/verify stages
    — both then see the SAME cleaned sets, keeping signature and
    Jaccard measures consistent.
    """
    if not _shingles_pre_hashed(shingles):
        raise ValueError("remove_stop_shingles expects a hashed shingle table")
    # ONE action for both the doc count and the doc-frequency cutoff:
    # the total rides the frequency scan as a broadcast-joined scalar
    # aggregate, and both branches read the shingle table's keyed
    # exchange back as a ReusedExchange — the corpus is shingled once,
    # not once per statistic.
    total = shingles.agg(F.count(F.lit(1)).alias("__n_docs"))
    stop_rows = (
        shingles.select(F.explode("sh").alias("h"))
        .groupBy("h")
        .count()
        .join(F.broadcast(total))
        .where(F.col("count") > F.greatest(F.col("__n_docs") * max_doc_frac, F.lit(1)))
        .limit(max_stop + 1)
        .collect()
    )
    if len(stop_rows) > max_stop:
        raise ValueError(
            f"remove_stop_shingles: more than {max_stop} shingles exceed "
            f"doc-frequency {max_doc_frac} — threshold too low for this corpus"
        )
    if not stop_rows:
        return shingles
    if len(stop_rows) <= literal_max:
        stop = F.array(*[F.lit(r["h"]).cast("long") for r in stop_rows])
        return shingles.withColumn("sh", F.array_except(F.col("sh"), stop))
    return shingles.withColumn(
        "sh", _broadcast_array_except("sh", shingles, [r["h"] for r in stop_rows])
    )


def _broadcast_array_except(
    col: str, df: DataFrame, stop_values: list[int]
) -> Column:
    """``array_except(col, stop_values)`` with the stop set shipped as a
    Spark broadcast variable instead of a literal expression tree —
    the scale form for large stop sets. Order/distinctness semantics
    match ``array_except`` on the already-distinct hashed shingle
    arrays: element order is preserved, NULL arrays stay NULL."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(
        np.array(sorted(set(stop_values)), dtype="int64")
    )

    @pandas_udf("array<long>")
    def _filt(arrays: pd.Series) -> pd.Series:
        import numpy as np

        stop = bc.value
        out = []
        for arr in arrays:
            if arr is None:
                out.append(None)
                continue
            a = np.asarray(arr, dtype=np.int64)
            # np.isin sorts internally -> O(n log m) membership per row
            out.append(a[~np.isin(a, stop)].tolist())
        return pd.Series(out)

    return _filt(F.col(col))


def _shingles_pre_hashed(shingles: DataFrame) -> bool:
    """True when a shingle table carries hashed (array<long>) sets."""
    from pyspark.sql import types as T

    dt = shingles.schema["sh"].dataType
    return isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.LongType)


def _shingles_nonempty(shingles: DataFrame) -> bool:
    """True when the frame is tagged shingle-set-nonempty
    (:func:`shingle_table` ``drop_empty=True``) — signature builds can
    then skip their ``size(sh) > 0`` re-filter, which Catalyst would
    otherwise push through the barrier exchange with the FULL shingle
    construction substituted into the predicate (evaluated per row in
    the single-task scan stage; r18 profiling). Any rewrite of the
    ``sh`` column (e.g. :func:`remove_stop_shingles`, which can
    re-introduce empties) drops the column metadata and with it this
    marker, so the filter correctly reappears."""
    md = shingles.schema["sh"].metadata
    return bool(md and md.get("shingles_nonempty", False))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 2,
    shingles: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash LSH.

    Plan shape: shingle barrier (see :func:`shingle_table`) → signature
    fold behind its own repartition barrier — the barrier's partition
    count deliberately differs from the shingle exchange's, otherwise
    EnsureRequirements drops it as redundant (same key, same count) and
    the signature fold gets re-inlined into BOTH self-join sides —
    → posexplode to (band_idx, bucket) → bucket self-join, keyed on
    (band_idx, bucket) so the shuffle only collides truly-similar docs.
    Returns distinct (id_a < id_b) pairs.

    Pass ``shingles=shingle_table(...)`` to share the shingle exchange
    with a downstream :func:`jaccard_verify`.

    Band-join skew, measured at sf0.1 (5k docs, 8 hashes × 4 bands):
    8,761 buckets, mean size 2.3, p99 = 14, max = 192 (a genuine
    near-identical cluster — its within-bucket product IS the answer,
    not skew). With bucket sizes this flat the pinned partition counts
    are about CPU parallelism, not key skew.

    Round-13 profiling (sf0.1, quiet host, best-of-3 per stage): the
    six-round 2.4-3.1s plateau was NOT signature width or the verify
    join — shingle exchange 0.2s, signature fold +0.0s, the candidate
    stage carried everything. Root cause: the empty-set filter ran on
    ``sig IS NOT NULL`` AFTER the signature projection; Catalyst pushed
    it through the barrier into the projection, and the pushed
    predicate re-evaluated the whole interpreted minhash fold per row
    (HOF aggregates never enter codegen) — 1.25s of 2.1s. Filtering on
    ``size(sh) > 0`` BEFORE the fold (identical semantics — the
    signature is when(size(sh)>0, fold)) cut the operator 2.12→1.24s
    (−41%), candidate set bit-identical (61,211 pairs). The remaining
    ~0.7s above raw compute is the local-mode scheduling floor of the
    pinned exchanges (~160 tiny tasks across shingle/barrier/join
    stages) — the same per-stage floor PageRank documents; it
    amortizes at cluster scale and shrinking partition counts to chase
    it locally would unpin the wave-aligned counts measured in the
    keyed_barrier A/B.

    ``max_bucket_size`` is the corpus-scale safety valve: a band bucket
    of size b emits b·(b−1)/2 candidates, so ONE boilerplate mega-bucket
    (shared headers/footers hashed into the same band) can dominate the
    whole job quadratically. With the cap set, buckets larger than the
    cap are dropped BEFORE the self-join (a window count over the same
    key the join shuffles on — no extra exchange). Recall is lost only
    for pairs whose EVERY shared band overflows; genuinely similar
    pairs share several bands, so in practice the cap sheds boilerplate
    noise, and the Jaccard verify already discards most of a
    mega-bucket's candidates anyway. Default None = exact behavior.
    """
    if shingles is None:
        shingles = shingle_table(
            df, text_col, id_col, shingle_k=shingle_k, drop_empty=True
        )
    # Empty/NULL shingle sets are dropped HERE, on the cheap
    # size(sh) > 0 predicate, which is exactly `sig IS NOT NULL`
    # (minhash_signature wraps the fold in when(size(sh) > 0, ...)).
    # Filtering on sig.isNotNull() AFTER the projection was the
    # round-13 profiling find: Catalyst pushes the filter through the
    # barrier into the projection, and the pushed predicate re-runs
    # the ENTIRE interpreted minhash fold per row just to test
    # nullness — ~60% of this operator's wall time at sf0.1 (1.25s of
    # 2.1s). SQL semantics are unchanged: empties would get a NULL
    # bucket that never joins; now they never reach the fold at all.
    # r18: even THIS filter gets pushed through the shingle exchange
    # with the full tokenize+shingle construction substituted in
    # (single-task scan-side eval) — a drop_empty-tagged shingle
    # table (see _shingles_nonempty) already guarantees non-empty
    # sets below the exchange, so the filter is skipped entirely.
    if _shingles_nonempty(shingles):
        sig_src = shingles
    else:
        sig_src = shingles.where(F.size("sh") > 0)
    sig = sig_src.select(
        F.col(id_col),
        minhash_signature(
            F.col("sh"), num_hashes, pre_hashed=_shingles_pre_hashed(shingles)
        ).alias("sig"),
    )
    sig = keyed_barrier(sig, id_col, factor=3)
    banded = sig.select(
        id_col,
        F.posexplode(F.array(*lsh_bands("sig", num_hashes, rows_per_band))).alias(
            "band_idx", "bucket"
        ),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("band_idx", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 2,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    hashed: bool = True,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs; keeps pairs with
    similarity >= threshold. Joins the (small) candidate set back to
    the shingle sets — candidates, not corpus, drive the cost. Pass the
    same ``shingles=shingle_table(...)`` used for candidate generation
    so both verify sides read the ReusedExchange.

    ``hashed=True`` intersects 32-bit portable-hash values instead of the
    strings: integer set ops are cheaper and the broadcast shrinks.
    This is still oracle-exact — the oracle applies the identical hash,
    so even the (vanishingly rare) collision collapses identically in
    both engines — but it is a *different* measure from string Jaccard
    exactly when a within-doc collision occurs; set ``hashed=False``
    for literal string-set semantics."""
    sets_ = (
        shingles
        if shingles is not None
        else shingle_table(df, text_col, id_col, shingle_k=shingle_k)
    )
    if hashed and not _shingles_pre_hashed(sets_):
        sets_ = sets_.select(id_col, hashed_shingles(F.col("sh")).alias("sh"))
    out = (
        pairs.join(sets_.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sets_.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(0.0), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# Near-dup clustering (pairs → connected components → canonical keep)
# ---------------------------------------------------------------------------

def near_dup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str,
    *,
    max_iterations: int = 10,
    checkpoint_every: int = 3,
    accelerate: bool = False,
    checkpoint_dir: str | None = None,
    steps_per_round: int = 1,
) -> DataFrame:
    """Connected components over verified near-dup pairs → one cluster
    label per id (the minimum id in its component; singletons label
    themselves). The step between "pairs" and "drop duplicates" in a
    dedup pipeline: transitive matches (a~b, b~c) must collapse into
    ONE cluster even though (a,c) was never compared.

    Iterative min-label propagation: each round every node takes the
    minimum label among itself and its neighbors; converges in
    O(component diameter) rounds — near-dup components are clique-like
    (diameter ≤ ~2-3), so a handful of rounds suffice; bounded by
    ``max_iterations`` (raises if not converged — the cue the pair
    graph has pathological chains: rerun with ``accelerate=True``).

    ``accelerate=True`` adds a pointer-jump to every round — the
    star-contraction idea from the MapReduce connected-components
    literature: the new label is the min of (own, neighbor labels,
    label-of-label), the last term composing the previous round's
    mapping with itself so pointer depth roughly halves per round.
    Chains then converge in O(log diameter) rounds at the cost of one
    extra join per round against the ALREADY-CACHED previous labels
    (labels only ever decrease, so the fixed point is unchanged:
    convergence still means neighbor-stable AND idempotent, which
    forces labels constant per component).

    Driver coordination is ONE job per round: the round's labels are
    persisted and materialized by a single ``count()`` whose plan
    carries an ``Observation`` counting changed labels — the
    convergence probe rides the materialization job instead of running
    a second driver action (``Observation`` does NOT fire on a
    ``localCheckpoint`` materialization, which is why the round action
    is a real count). Lineage is truncated by an eager
    ``localCheckpoint`` only every ``checkpoint_every`` rounds (a cheap
    cache read); between checkpoints the persisted round outputs keep
    execution flat while plans grow by one join per round.

    The iteration runs over PAIR-TOUCHED ids only (round 12): nodes
    without edges can never change their self-label, so carrying them
    through every round's three joins is pure waste — at corpus scale
    the near-dup subgraph is a small fraction of the table (sf0.1
    fixture: 154 touched of 5,000 docs; a 100-TB corpus iterates over
    the duplicate fringe, not the corpus). Singletons are restored by
    ONE final left join with ``coalesce(cluster, id)`` — the fixed
    point is identical because edgeless nodes are fixed points of the
    propagation by construction. Edge endpoints absent from ``ids``
    are excluded from the touched set (semi-join), preserving the
    previous inner-join semantics where unknown ids neither receive
    labels nor contribute neighbor minima.

    ``checkpoint_dir``: lineage truncation defaults to
    ``localCheckpoint``, which stores blocks on EXECUTORS — fast, but
    on a real cluster one executor loss mid-convergence makes the
    truncated lineage unrecoverable and kills the job. Pass a reliable
    path (HDFS/S3/shared FS) to switch every truncation to
    ``checkpoint()`` against that directory: rounds then survive
    executor loss at the cost of a filesystem write per checkpoint.
    Convergence semantics are identical either way (the convergence
    probe rides a real ``count()`` on the persisted frame, never a
    checkpoint materialization, so the Observation caveat above does
    not change).

    ``steps_per_round=2`` (round-18, default 1 = the historical
    cadence) chains TWO propagation steps into ONE materialized round
    — one persisted frame, one count job, one convergence probe per
    two steps — halving the per-round job/scheduling overhead for
    chain-shaped pair graphs whose components need many rounds.
    Soundness: labels only ever decrease, so judging convergence on
    the FINAL step's probe is exact — if step ``2k`` changed nothing,
    its input was already a fixed point of one propagation step (zero
    is absorbing), and the returned labels equal the one-step
    cadence's bit for bit. The raise boundary is also unchanged: a
    trailing short round runs ``max_iterations - steps_done`` steps,
    so both cadences execute exactly ``max_iterations`` steps before
    declaring non-convergence, and (by the absorbing argument) their
    last probes agree. The mid-step frame is ``persist()``-ed (lazily
    — it materializes inside the round's one count job) because under
    ``accelerate`` the second step references it THREE times (neighbor
    build, join left side, jump table): uncached, the round-17 fusion
    A/B measured the re-computation costing more than the saved job
    overhead, which is why the fused cadence is per-call and default
    OFF — enable it for chain-shaped consumers, leave converge-fast
    consumers (e.g. semantic prune's clique-like components) on the
    one-step cadence.
    """
    if steps_per_round not in (1, 2):
        raise ValueError(
            f"near_dup_clusters: steps_per_round must be 1 or 2, got "
            f"{steps_per_round}"
        )
    from pyspark.sql import Observation

    prev_ckpt_dir = None
    if checkpoint_dir is not None:
        sc = ids.sparkSession.sparkContext
        # save/restore: setCheckpointDir is session-global, and an
        # application may have pointed it at a curated location with
        # retention rules — one operator call must not repoint every
        # later checkpoint() in the session. (All of THIS function's
        # checkpoints materialize before it returns — the lazy edges
        # checkpoint runs inside round 1's count — so restoring in the
        # finally below is safe.) When nothing was set before, there
        # is no Spark API to unset; the directory then remains ours,
        # documented here.
        prev_ckpt_dir = sc.getCheckpointDir()
        sc.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame, *, eager: bool) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=eager)
        return df.checkpoint(eager=eager)

    def _run() -> DataFrame:
        # symmetrize with ONE explode, not a self-union: a union embeds
        # the pairs subtree twice, and the heavy verified-pair lineage
        # (the LSH verify join / the quadratic cosine block) re-executes
        # per branch — ReusedExchange only covers subtrees that END in
        # an exchange, which a join+filter pair plan does not
        edges = _truncate(
            pairs.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst"),
                        ),
                        F.struct(
                            F.col("id_b").alias("src"),
                            F.col("id_a").alias("dst"),
                        ),
                    )
                ).alias("__e")
            )
            .select("__e.src", "__e.dst")
            .distinct(),
            eager=False,
        )
        id_set = ids.select(F.col(id_col).alias("id"))
        # iterate over the near-dup subgraph only — edges are
        # symmetrized, so the src column alone covers every endpoint.
        # shuffle-hash hint: a LEFT SEMI join can only build its RIGHT
        # side, and id_set is corpus-sized — without the hint Catalyst
        # would happily BROADCAST the whole corpus's ids under the
        # (usually tiny) touched set
        labels = _truncate(
            edges.select(F.col("src").alias("id"))
            .distinct()
            .join(id_set.hint("shuffle_hash"), "id", "semi")
            .select("id", F.col("id").alias("cluster")),
            eager=False,
        )
        def _step(lbls: DataFrame, obs) -> DataFrame:
            """ONE min-label propagation step over ``lbls`` — the
            historical round body, factored out so a fused round can
            chain two of them before materializing. ``obs=None`` for a
            mid-step (no probe; convergence is judged on the final
            step only — sound because zero changes is absorbing)."""
            neigh = (
                edges.join(lbls, edges["dst"] == lbls["id"])
                .groupBy("src")
                .agg(F.min("cluster").alias("neigh_min"))
            )
            candidates = [F.col("cluster"), F.coalesce("neigh_min", F.col("cluster"))]
            joined = lbls.join(neigh, lbls["id"] == neigh["src"], "left")
            if accelerate:
                jump = lbls.select(
                    F.col("id").alias("__jid"), F.col("cluster").alias("__jcluster")
                )
                joined = joined.join(jump, F.col("cluster") == F.col("__jid"), "left")
                candidates.append(F.coalesce("__jcluster", F.col("cluster")))
            out = joined.select(
                "id",
                F.least(*candidates).alias("__new"),
                (F.least(*candidates) < F.col("cluster")).alias("__changed"),
            ).withColumnRenamed("__new", "cluster")
            if obs is not None:
                out = out.observe(
                    obs, F.count_if(F.col("__changed")).alias("n_changed")
                )
            return out.drop("__changed")

        prev_cached: DataFrame | None = None
        steps_done = 0
        round_no = 0
        while steps_done < max_iterations:
            # a trailing short round keeps the executed step count —
            # and with it the raise boundary — EXACTLY max_iterations
            n_steps = min(steps_per_round, max_iterations - steps_done)
            obs = Observation(f"near_dup_clusters_round_{round_no}")
            cur = labels
            mids: list[DataFrame] = []
            for _ in range(n_steps - 1):
                # lazy persist: materializes inside the round's one
                # count job; under accelerate the next step reads this
                # frame three times (neigh build, join left, jump)
                cur = _step(cur, None).persist()
                mids.append(cur)
            cached = _step(cur, obs).persist()
            cached.count()  # the round's ONE job: materialize + fire the probe
            for m in mids:
                m.unpersist()
            n_changed = obs.get["n_changed"]
            labels = cached
            prev_steps = steps_done
            steps_done += n_steps
            round_no += 1
            if steps_done // checkpoint_every > prev_steps // checkpoint_every:
                labels = _truncate(cached, eager=True)  # reads the cache
                cached.unpersist()
                cached = None
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = cached
            if n_changed == 0:
                if cached is not None:
                    # don't return a cache-pinned frame: CacheManager would
                    # hold the entry long after the caller dropped it. The
                    # checkpoint is one cheap cache-read job.
                    labels = _truncate(cached, eager=True)
                    cached.unpersist()
                # restore singletons: one left join against the full id
                # set, edgeless ids label themselves. Eagerly truncated:
                # the function has ALWAYS returned a lineage-free frame
                # (the old per-round checkpoint of all ids), and callers
                # rely on it — returning the live join would re-execute
                # the caller's entire upstream pipeline (ids' lineage) on
                # every consumption, racing already-unpersisted caches
                # (observed as orphaned-accumulator errors in the
                # 100k-doc smoke).
                return _truncate(
                    id_set.join(labels, "id", "left").select(
                        "id",
                        F.coalesce("cluster", F.col("id")).alias("cluster"),
                    ),
                    eager=True,
                )
        if prev_cached is not None:
            prev_cached.unpersist()
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iterations} rounds; "
            "component diameter exceeds the bound — rerun with accelerate=True "
            "(pointer-jumping, O(log diameter) rounds) or raise max_iterations"
        )

    try:
        return _run()
    finally:
        if prev_ckpt_dir is not None and checkpoint_dir is not None:
            ids.sparkSession.sparkContext.setCheckpointDir(prev_ckpt_dir)


def drop_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    shingle_k: int = 2,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    max_iterations: int = 10,
    max_bucket_size: int | None = None,
    stop_shingle_frac: float | None = None,
    accelerate: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """End-to-end corpus dedup: MinHash-LSH candidates → exact Jaccard
    verify at ``threshold`` → connected components → keep the minimum-id
    row per cluster. The whole pipeline is the bucketed scale path —
    no all-pairs stage anywhere.

    Corpus-scale knobs (all off by default, exact behavior):
    ``stop_shingle_frac`` removes boilerplate shingles above that
    document frequency before signatures AND verify (one consistent
    measure — :func:`remove_stop_shingles`); ``max_bucket_size`` caps
    band buckets before the self-join (:func:`minhash_lsh_pairs`);
    ``accelerate`` turns on pointer-jumping clustering for chain-shaped
    pair graphs (:func:`near_dup_clusters`); ``checkpoint_dir`` makes
    the clustering's lineage truncation reliable (survives executor
    loss) instead of executor-local (:func:`near_dup_clusters`).
    """
    # drop_empty: shingle-less docs can never band, verify, or appear
    # as a candidate id — pruned below the exchange on the cheap exact
    # token-count predicate (r18; see shingle_table). A stop-shingle
    # rewrite drops the marker, so the signature build re-filters.
    sh = shingle_table(
        df, text_col, id_col, shingle_k=shingle_k, hashed=True,
        drop_empty=True,
    )
    if stop_shingle_frac is not None:
        sh = remove_stop_shingles(sh, max_doc_frac=stop_shingle_frac)
    cand = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        rows_per_band=rows_per_band,
        shingles=sh,
        max_bucket_size=max_bucket_size,
    )
    verified = jaccard_verify(
        cand, df, text_col, id_col, threshold=threshold, shingles=sh
    )
    clusters = near_dup_clusters(
        verified,
        df.select(id_col),
        id_col,
        max_iterations=max_iterations,
        accelerate=accelerate,
        checkpoint_dir=checkpoint_dir,
    )
    # The converged label IS the component's minimum id, so the keep
    # set is just the distinct labels — no extra min() aggregation.
    keep = clusters.select(F.col("cluster").alias(id_col)).distinct()
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs a precomputed corpus index
# ---------------------------------------------------------------------------

def lsh_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 2,
) -> DataFrame:
    """The persistable per-document LSH index: one row per doc with its
    hashed shingle set and band buckets —
    ``(id, sh array<long>, bands array<struct<band_idx,bucket>>)``.

    This is what makes dedup INCREMENTAL at 100 TB: the corpus is
    shingled/signed ONCE, the index is written next to the data, and
    every future ingest batch joins against it without re-reading (let
    alone re-shuffling) corpus text. Docs with no shingles carry a
    NULL ``bands`` (they can never near-dup match, mirroring the NULL
    signature rule in :func:`minhash_lsh_pairs`).

    Exactly ONE keyed barrier materializes the whole (id, sh, sig)
    projection — shingling, hashing, and the signature fold all run
    once per row BELOW it, and the band extraction above it reads the
    materialized ``sig`` array for free. (Earlier revisions barriered
    the hashed shingles and the signature separately — two full
    exchanges of shingle-bearing rows where one materialization point
    suffices; the only other exchange on this path is
    :func:`shingle_table`'s conditional widen of a narrow scan.)
    """
    sh = shingle_table(
        df, text_col, id_col, shingle_k=shingle_k, hashed=True, materialize=False
    )
    sig = sh.select(
        F.col(id_col),
        F.col("sh"),
        minhash_signature(F.col("sh"), num_hashes, pre_hashed=True).alias("sig"),
    )
    sig = keyed_barrier(sig, id_col, factor=2)
    bands = F.when(
        F.col("sig").isNotNull(),
        F.array(
            *[
                F.struct(F.lit(i).alias("band_idx"), b.alias("bucket"))
                for i, b in enumerate(
                    lsh_bands("sig", num_hashes, rows_per_band)
                )
            ]
        ),
    )
    return sig.select(F.col(id_col), F.col("sh"), bands.alias("bands"))


def incremental_verified_pairs(
    batch_index: DataFrame,
    corpus_index: DataFrame,
    id_col: str,
    *,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Verified (corpus_id, batch_id, jaccard) near-dup pairs between a
    small batch index and a large corpus index.

    Zero corpus shuffle, and the corpus index is touched by two
    COLUMN-PRUNED streamed passes (for a parquet-backed index, each
    pass reads only the columns it names):

    1. band pass — reads ``(id, bands)`` only (the shingle column is
       never scanned here), joins the broadcast batch bands map-side,
       and the resulting candidate pairs deduplicate through the ONE
       shuffle in the operator, carrying two ids per row and nothing
       else (a pair can share several bands);
    2. fetch pass — reads ``(id, sh)`` and inner-joins the BROADCAST
       candidate pair list (batch-bounded bare int pairs), which
       filters to candidate rows map-side; the batch's shingle table
       broadcasts too, so candidate shingle sets stream straight into
       the Jaccard projection without ever being exchanged.

    Jaccard semantics (hashed sets, round-4, >= threshold) are
    identical to :func:`jaccard_verify`.

    ``max_bucket_size`` is the mega-bucket safety valve, mirroring
    :func:`minhash_lsh_pairs`: ONE boilerplate band bucket shared by a
    million corpus docs would emit a million candidates per matching
    batch doc. With the cap set, overflowing CORPUS buckets are
    identified by a bare (band, bucket) aggregation (map-side partials
    over the pruned band scan — corpus text/shingles still never
    shuffle) and shed from the band pass via a broadcast anti-join
    (the overflow set is tiny — only buckets past the cap). Recall is
    lost only for pairs whose EVERY shared band overflows, same
    semantics as the full-corpus path. Default None = exact.
    """
    cb = corpus_index.select(
        F.col(id_col).alias("__cid"), F.explode("bands").alias("b")
    ).select("__cid", "b.band_idx", "b.bucket")
    if max_bucket_size is not None:
        hot = (
            cb.groupBy("band_idx", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket_size)
            .select("band_idx", "bucket")
        )
        # No forced broadcast: the overflow set is tiny in practice
        # (only buckets past the cap) and AQE broadcasts it then, but
        # its cardinality is DATA-derived, not caller-contracted — a
        # pathological corpus could overflow arbitrarily many buckets,
        # and a hard hint would OOM there instead of degrading.
        cb = cb.join(hot, ["band_idx", "bucket"], "left_anti")
    bb = batch_index.select(
        F.col(id_col).alias("__bid"), F.explode("bands").alias("b")
    ).select("__bid", "b.band_idx", "b.bucket")
    pairs = (
        cb.join(F.broadcast(bb), ["band_idx", "bucket"])
        .select("__cid", "__bid")
        .dropDuplicates()
    )
    csh = corpus_index.select(
        F.col(id_col).alias("__cid"), F.col("sh").alias("sh_c")
    )
    bsh = batch_index.select(
        F.col(id_col).alias("__bid"), F.col("sh").alias("sh_b")
    )
    # The inner join against the broadcast pair list IS the candidate
    # filter for the fetch pass (one plan occurrence of the band join —
    # a separate semi-join pre-filter would broadcast-evaluate the
    # band-join subtree a second time).
    return (
        csh.join(F.broadcast(pairs), "__cid")
        .join(F.broadcast(bsh), "__bid")
        .withColumn("inter", F.size(F.array_intersect("sh_c", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_c", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(0.0),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("__cid", "__bid", "jaccard")
    )


def drop_near_duplicates_incremental(
    batch: DataFrame,
    corpus_index: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 2,
    dedup_within_batch: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Dedup an ingest batch against an existing corpus: drop batch
    docs near-duplicating any indexed corpus doc, then (by default)
    near-dedup the survivors among themselves via
    :func:`drop_near_duplicates`.

    The corpus side is only ever touched through ``corpus_index``
    (:func:`lsh_index`, typically read back from parquet) — the
    append-only ingestion loop is: index corpus once; per batch, clean
    against the index; append the cleaned batch AND its
    :func:`lsh_index` rows to the corpus tables.

    ``batch`` and the corpus must not share ids (ids are the pair
    identity; overlapping ids would self-match).
    """
    bi = lsh_index(
        batch,
        text_col,
        id_col,
        num_hashes=num_hashes,
        rows_per_band=rows_per_band,
        shingle_k=shingle_k,
    )
    hit = incremental_verified_pairs(
        bi, corpus_index, id_col, threshold=threshold,
        max_bucket_size=max_bucket_size,
    )
    contaminated = hit.select(F.col("__bid").alias(id_col)).distinct()
    survivors = batch.join(F.broadcast(contaminated), id_col, "left_anti")
    if dedup_within_batch:
        # Truncate the survivors' lineage ONCE before within-batch
        # dedup: drop_near_duplicates re-reads its input several times
        # (shingle sides, cluster ids, the final keep semi-join) — N
        # cheap scans for the parquet-backed corpora it is designed
        # around, but here the input lineage is the whole band-join +
        # Jaccard-verify pipeline, and re-executing it per consumer
        # multiplied the batch clean by ~4-5x at the 100k-doc smoke
        # scale. Executor-local blocks suffice: losing one restarts
        # this batch's clean, and the long-running convergence loop
        # has its own reliable `checkpoint_dir` knob.
        survivors = survivors.localCheckpoint(eager=False)
        survivors = drop_near_duplicates(
            survivors,
            text_col,
            id_col,
            threshold=threshold,
            shingle_k=shingle_k,
            num_hashes=num_hashes,
            rows_per_band=rows_per_band,
            max_bucket_size=max_bucket_size,
        )
    return survivors


# ---------------------------------------------------------------------------
# Mergeable signature tables (cross-corpus / federated dedup)
# ---------------------------------------------------------------------------

def minhash_signature_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 8,
    shingle_k: int = 2,
) -> DataFrame:
    """The MERGEABLE dedup artifact: one row per document carrying just
    ``(id, sig array<long>)`` — ``num_hashes`` longs (64 bytes at the
    default 8) regardless of document size. A signature is a pure
    function of the text (the portable md5+affine minhash family, same
    values as :func:`minhash_lsh_pairs`), so per-shard tables computed
    INDEPENDENTLY — different clusters, different ingest days,
    different organizations — union into one logical index with zero
    recomputation and zero text exchange; cross-corpus near-dup
    detection then runs over the stored tables alone
    (:func:`merged_signature_pairs`). This is the projection you ship
    when even the hashed shingle sets (:func:`lsh_index`) are too
    heavy to move; the price is ESTIMATED Jaccard (matching-minhash
    fraction) instead of exact shingle verification. Empty-shingle
    docs are dropped BEFORE the signature fold — they could never
    match anyway, and the cheap ``size(sh) > 0`` predicate here is
    what keeps any downstream null-guard from being pushed back into
    the projection and re-running the interpreted minhash fold per
    row (the round-13 minhash_lsh_pairs profiling find, −41%).

    Reference parity: none — the reference engine has no dedup; this
    extends the §2.10 dedup family to the federated/multi-corpus case
    the incremental `lsh_index` covers for single-corpus ingest.
    """
    sh = shingle_table(
        df, text_col, id_col, shingle_k=shingle_k, hashed=True,
        materialize=False, drop_empty=True,
    )
    # drop_empty guarantees non-empty sets below the exchange, so no
    # size(sh) > 0 re-filter — which Catalyst would push back down
    # with the full shingle construction substituted in (r18)
    sig = sh.select(
        F.col(id_col),
        minhash_signature(F.col("sh"), num_hashes, pre_hashed=True).alias(
            "sig"
        ),
    )
    return keyed_barrier(sig, id_col, factor=2)


#: hash-family/schema version stamped into persisted signature tables —
#: bump if the portable minhash math or the table layout ever changes
#: incompatibly, so old stored shards fail loudly instead of silently
#: merging under different signature semantics
SIGNATURE_TABLE_VERSION = 1


def _sig_meta_tag(num_hashes: int, shingle_k: int) -> str:
    """The self-describing per-row tag a persisted signature table
    carries: version + hash-family width + shingle size. Constant per
    table, so parquet dictionary/RLE encodes it to ~nothing."""
    return f"sigv{SIGNATURE_TABLE_VERSION}:h{num_hashes}:k{shingle_k}"


def write_signature_table(
    sig: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 2,
    mode: str = "error",
) -> None:
    """Persist a :func:`minhash_signature_table` frame as parquet with
    its hash-family parameters PINNED IN the data (a ``sig_meta``
    string column — constant, so it compresses to nothing). This is
    the federated contract's write half: shards sign locally, store
    64 bytes/doc, and any later :func:`read_signature_table` of the
    stored table must state the SAME (version, num_hashes, shingle_k)
    or fail loudly. Without the pin, a shard signed under shingle_k=3
    merged against k=2 tables would produce silently-garbage Jaccard
    estimates — same width, different shingle space, nothing else to
    catch it. Schema is asserted eagerly: exactly ``(id_col, sig
    array<bigint>)``."""
    from pyspark.sql import types as T

    if set(sig.columns) != {id_col, "sig"}:
        raise ValueError(
            "write_signature_table: expected exactly columns "
            f"({id_col!r}, 'sig'), got {sig.columns}"
        )
    stype = sig.schema["sig"].dataType
    if not (
        isinstance(stype, T.ArrayType)
        and isinstance(stype.elementType, T.LongType)
    ):
        raise ValueError(
            "write_signature_table: 'sig' must be array<bigint> "
            f"(minhash_signature_table output), got {stype.simpleString()}"
        )
    # width guard ON THE WRITE: stamping h8 over 16-long arrays — a
    # writer that forgot num_hashes= — would create a permanently
    # mis-pinned table where NO read declaration works (the tag guard
    # and the band width guard each point at the other parameter, a
    # catch-22). TWO layers: the per-row raise_error below rides the
    # write itself as the full net for mixed-width rows, and — ONLY
    # under mode="overwrite", which DELETES the existing target before
    # the job runs — an EAGER driver-side probe of the first non-NULL
    # signature catches the forgot-the-param case BEFORE the old table
    # is destroyed (one bounded first(), but it replays the full
    # upstream signature lineage as an extra job — under the default
    # mode="error"/"append" a failed write destroys nothing and the
    # per-row net alone suffices, so skipping the probe saves a whole
    # signature-lineage job on those writes; the streaming sinks write
    # mode="overwrite", so their per-micro-batch probe still runs —
    # cheap there only because the batch signature frame is
    # localCheckpointed). NULL sigs stay writable (hand-built tables carry
    # them; the merge paths defend them), only a wrong width raises.
    if mode == "overwrite":
        probe = (
            sig.where(F.col("sig").isNotNull())
            .select(F.size("sig").alias("__n"))
            .first()
        )
        if probe is not None and probe["__n"] != num_hashes:
            raise ValueError(
                f"write_signature_table: signatures are {probe['__n']} "
                f"long but num_hashes={num_hashes} was declared — pass "
                "the num_hashes the signatures were built with (checked "
                "BEFORE the write so an overwrite cannot destroy the "
                "existing table)"
            )
    guarded_sig = F.when(
        F.col("sig").isNull() | (F.size("sig") == num_hashes),
        F.col("sig"),
    ).otherwise(
        F.array(
            F.raise_error(
                F.format_string(
                    "write_signature_table: signature length %s != "
                    f"declared num_hashes={num_hashes} — pass the "
                    "num_hashes the signatures were built with, or "
                    "the stored tag would mis-pin the table forever",
                    F.size("sig").cast("string"),
                )
            ).cast("long")
        )
    )
    sig.select(
        F.col(id_col),
        guarded_sig.alias("sig"),
        F.lit(_sig_meta_tag(num_hashes, shingle_k)).alias("sig_meta"),
    ).write.mode(mode).parquet(path)


def read_signature_table(
    spark,
    path: str,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 2,
    extra_cols: tuple = (),
) -> DataFrame:
    """Read a persisted signature table back for merging — the
    federated contract's read half. The declared (version, num_hashes,
    shingle_k) must match what :func:`write_signature_table` stamped:
    the schema (presence + types of ``sig``/``sig_meta``) is checked
    EAGERLY at the call, and the tag value is guarded per row on the
    scan itself (the raise_error-on-projection pattern — no extra job,
    fires on the first mismatched row). Returns ``(id_col, sig)``
    ready for :func:`merged_signature_pairs`. ``extra_cols`` carries
    named additional columns through (e.g. a ``batch=`` partition
    column a store laid out per-ingest-batch discovers — the streaming
    sink filters on it to probe only strictly-earlier batches)."""
    from pyspark.sql import types as T

    df = spark.read.parquet(path)
    missing = {id_col, "sig", "sig_meta", *extra_cols} - set(df.columns)
    if missing:
        raise ValueError(
            f"read_signature_table: {sorted(missing)} missing from "
            f"{path} — not a write_signature_table output (pre-"
            "versioned or foreign parquet; re-sign the shard)"
        )
    stype = df.schema["sig"].dataType
    if not (
        isinstance(stype, T.ArrayType)
        and isinstance(stype.elementType, T.LongType)
    ):
        raise ValueError(
            f"read_signature_table: 'sig' in {path} is "
            f"{stype.simpleString()}, expected array<bigint>"
        )
    tag = _sig_meta_tag(num_hashes, shingle_k)
    guarded = F.when(F.col("sig_meta") == tag, F.col("sig")).otherwise(
        F.array(
            F.raise_error(
                F.format_string(
                    "read_signature_table: stored tag %s != declared "
                    f"{tag} — this table was signed under a different "
                    "hash family; pass the num_hashes/shingle_k it "
                    "was written with",
                    F.coalesce(F.col("sig_meta"), F.lit("<null>")),
                )
            ).cast("long")
        )
    )
    return df.select(
        F.col(id_col), guarded.alias("sig"), *[F.col(c) for c in extra_cols]
    )


def _guarded_band_explode(num_hashes: int, rows_per_band: int):
    """The shared band projection for STORED/persisted signature
    columns: posexplode of the band buckets with (a) the NULL-sig
    defense (posexplode of NULL emits no rows — without it concat_ws
    would collapse every NULL signature into one shared md5('')
    bucket) and (b) the width guard (a table persisted under a
    different num_hashes banding only a prefix while the estimator
    sums all positions would mis-scale est_jaccard past 1.0 — raise
    loudly instead). Both ride the projection, never a filter — a
    filter would be pushed into a live signature projection and
    re-run the minhash fold per row (the round-13 trap)."""
    return F.posexplode(
        F.when(
            F.col("sig").isNotNull()
            & (F.size("sig") != F.lit(num_hashes)),
            F.array(
                F.raise_error(
                    F.format_string(
                        "signature table: stored signature length %s "
                        f"!= num_hashes={num_hashes} — this table was "
                        "built under a different hash-family width; "
                        "pass num_hashes= matching the stored "
                        "signatures (minhash_signature_table default "
                        "is 8)",
                        F.size("sig").cast("string"),
                    )
                ).cast("string")
            ),
        )
        .when(
            F.col("sig").isNotNull(),
            F.array(*lsh_bands("sig", num_hashes, rows_per_band)),
        )
    )


def _sig_match_fraction(num_hashes: int) -> Column:
    """est_jaccard from two signature columns ``__sa``/``__sb``: the
    fraction of matching minhash positions, the textbook unbiased
    Jaccard estimator, round-4 (the oracle states the same sum of
    position-equality flags over ``num_hashes``)."""
    return F.round(
        F.aggregate(
            F.zip_with(
                "__sa",
                "__sb",
                lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(num_hashes)),
        4,
    )


def merged_signature_pairs(
    parts: list[DataFrame],
    id_col: str,
    *,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    cross_shard_only: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs from persisted signature
    tables ALONE — union the per-shard :func:`minhash_signature_table`
    outputs, band the stored signatures, bucket-join, and score every
    candidate by signature agreement: ``est_jaccard`` = fraction of
    matching minhash positions, the textbook unbiased Jaccard
    estimator. No text, no shingles, no rescans — the whole join moves
    ``num_hashes`` longs per doc.

    ``parts`` is the list of signature frames in shard order (each
    gets its position as its shard tag); ``cross_shard_only`` keeps
    only pairs spanning two shards (the federated question — each
    shard already deduped itself). A doc stored in two shards under
    the SAME id still pairs (ordered by shard), so re-ingested exact
    copies surface with est 1.0. ``max_bucket_size`` is the same
    hot-bucket valve as :func:`minhash_lsh_pairs`: a band bucket
    holding more rows is shed (documented recall trade for
    degenerate templates).

    Returns ``(id_a, id_b, shard_a, shard_b, est_jaccard)`` with
    ``est_jaccard >= threshold``, distinct.
    """
    tagged = [
        p.select(
            F.col(id_col), F.col("sig"), F.lit(i).cast("int").alias("__shard")
        )
        for i, p in enumerate(parts)
    ]
    merged = tagged[0]
    for t in tagged[1:]:
        merged = merged.unionByName(t)
    # NULL-sig defense for hand-built/persisted tables rides the band
    # projection, not a filter: posexplode of a NULL array emits no
    # rows, so NULL-sig docs never band (without this, concat_ws would
    # collapse every NULL signature into one shared md5('') bucket).
    # A filter on sig here would be pushed into the signature
    # projection and re-run the minhash fold per row — the round-13
    # minhash_lsh_pairs trap; minhash_signature_table already emits no
    # NULLs, so for in-plan composition this branch never fires.
    banded = merged.select(
        F.col(id_col),
        "__shard",
        "sig",
        _guarded_band_explode(num_hashes, rows_per_band).alias(
            "band_idx", "bucket"
        ),
    )
    if max_bucket_size is not None:
        sizes = banded.groupBy("band_idx", "bucket").count()
        keep = sizes.where(F.col("count") <= max_bucket_size).drop("count")
        banded = banded.join(keep, ["band_idx", "bucket"], "left_semi")
    a, b = banded.alias("a"), banded.alias("b")
    same_band = (F.col("a.band_idx") == F.col("b.band_idx")) & (
        F.col("a.bucket") == F.col("b.bucket")
    )
    ordered = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) | (
        (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
        & (F.col("a.__shard") < F.col("b.__shard"))
    )
    cand = (
        a.join(b, same_band & ordered)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__shard").alias("shard_a"),
            F.col("b.__shard").alias("shard_b"),
            F.col("a.sig").alias("__sa"),
            F.col("b.sig").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b", "shard_a", "shard_b"])
    )
    if cross_shard_only:
        cand = cand.where(F.col("shard_a") != F.col("shard_b"))
    return (
        cand.withColumn("est_jaccard", _sig_match_fraction(num_hashes))
        .where(F.col("est_jaccard") >= threshold)
        .drop("__sa", "__sb")
    )


def signature_probe_pairs(
    store_sig: DataFrame,
    batch_sig: DataFrame,
    id_col: str,
    *,
    threshold: float = 0.5,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    broadcast: str = "batch",
) -> DataFrame:
    """ASYMMETRIC signature probe: near-dup pairs between an ingest
    batch and a persisted signature store. Under the default
    ``broadcast="batch"`` the STORE IS NEVER SHUFFLED — its banded
    projection stays a scan-side map, and the batch's bands (a few
    buckets per doc) broadcast into the join, the same
    zero-corpus-shuffle contract as
    :func:`drop_near_duplicates_incremental`'s index probe.
    :func:`merged_signature_pairs` is the symmetric peer-to-peer merge
    (both sides band-shuffled); this is the 1000-batches-a-day path
    where re-shuffling a 100 TB store per micro-batch would be the
    bottleneck. Same hash-family guards, same estimator.

    ``broadcast`` picks the join strategy by which side is actually
    small — the default assumes a micro-batch, and a caller probing a
    LARGE batch side (e.g. an entire corpus against a released-set
    store) must not force its bands through the driver:

    - ``"batch"`` (default): batch bands broadcast, store stays a
      scan-side map — the streaming micro-batch shape.
    - ``"store"``: store bands broadcast, the batch stays a scan-side
      map — a huge corpus probed against a small external table.
    - ``"none"``: plain shuffled band join (both sides hash-exchange
      on ``(band_idx, bucket)``) — neither side fits the broadcast
      limit; always safe, never driver-bound.

    All three produce identical pairs; only the physical plan moves.

    Returns ``(store_id, batch_id, est_jaccard)`` with ``est_jaccard
    >= threshold``, one row per id pair. Ids may overlap between store
    and batch (a re-ingested doc pairs with its stored self at est
    1.0), and the store may legitimately hold SEVERAL rows under one
    id (a re-ingest whose new text scored below threshold is kept
    again under the same id by the streaming sink) — so every
    candidate row is SCORED first and the pair takes the MAX estimate
    across store rows. Deduplicating candidates by id pair before
    scoring (the first cut of this function) let an arbitrary store
    row's signature win and could nondeterministically miss a true
    near-duplicate."""
    if broadcast not in ("batch", "store", "none"):
        raise ValueError(
            f"broadcast must be 'batch', 'store' or 'none', got "
            f"{broadcast!r}"
        )
    sb = store_sig.select(
        F.col(id_col).alias("store_id"),
        F.col("sig").alias("__sa"),
        _guarded_band_explode(num_hashes, rows_per_band).alias(
            "band_idx", "bucket"
        ),
    )
    bb = batch_sig.select(
        F.col(id_col).alias("batch_id"),
        F.col("sig").alias("__sb"),
        _guarded_band_explode(num_hashes, rows_per_band).alias(
            "band_idx", "bucket"
        ),
    )
    if broadcast == "batch":
        bb = F.broadcast(bb)
    elif broadcast == "store":
        sb = F.broadcast(sb)
    scored = sb.join(bb, ["band_idx", "bucket"]).select(
        "store_id",
        "batch_id",
        _sig_match_fraction(num_hashes).alias("__est"),
    )
    return (
        scored.groupBy("store_id", "batch_id")
        .agg(F.max("__est").alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Test-set decontamination
# ---------------------------------------------------------------------------

def remove_contaminated(
    train: DataFrame,
    test: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 13,
    min_overlap: int = 1,
    test_text_col: str | None = None,
) -> DataFrame:
    """Drop training documents that share at least ``min_overlap``
    word ``shingle_k``-grams with a held-out test corpus — the standard
    benchmark-decontamination pass for training data (13-gram overlap
    is the widely published convention).

    Scale shape: the TEST side (benchmark suites — thousands of docs)
    is tiny next to a 100 TB train corpus, so its distinct hashed
    shingles become a broadcast build side. The train side does ONE
    shingle explode → broadcast semi-join (only matching rows survive,
    typically a sliver) → per-doc overlap count → the contaminated id
    set — itself small — broadcasts into the final anti-join. The
    train corpus is never shuffled in full.

    Both sides shingle through :func:`word_shingles` +
    :func:`hashed_shingles` (same tokenization as every dedup
    operator); a train doc shorter than ``shingle_k`` tokens has no
    shingles and is always kept.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    tcol = test_text_col or text_col
    test_sh = test.select(
        F.explode(
            hashed_shingles(word_shingles(F.col(tcol), k=shingle_k))
        ).alias("h")
    ).distinct()
    # scale-conditional width: the train-side shingle explode is the
    # corpus-heavy stage — a narrow local scan would run it on one
    # core; a wide cluster scan passes through unchanged
    train_sh = spread(train).select(
        F.col(id_col),
        F.explode(
            hashed_shingles(word_shingles(F.col(text_col), k=shingle_k))
        ).alias("h"),
    )
    contaminated = (
        train_sh.join(F.broadcast(test_sh), "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__overlap"))
        .where(F.col("__overlap") >= min_overlap)
        .select(id_col)
    )
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """Bit-vote SimHash over distinct tokens (portable-hash based).

    For each bit i: if more than half the token hashes have bit i set,
    the signature has bit i set. Computed as ONE fold over the hashed
    token array: the accumulator carries per-bit set-counts plus the
    token count in its last slot, and the ``finish`` lambda turns the
    materialized counts into the signature. The per-bit
    ``size(filter(hashes, ...))`` formulation re-evaluated the md5
    token hashing once per bit (32x) in interpreted HOF eval. 32 bits
    is the full width of :func:`portable_hash`; 64-bit signatures run
    the numpy packed-bit pandas UDF :func:`simhash64` (same contract —
    :func:`simhash_signatures` dispatches on width).
    """
    toks = F.array_distinct(tokens(col))
    hashed = F.transform(toks, lambda t: portable_hash(t, seed=99))
    init = F.array(*[F.lit(0).cast("long")] * (bits + 1))

    def merge(acc: Column, h: Column) -> Column:
        vote = F.array(
            *[(h.bitwiseAND(F.lit(1 << i)) != 0).cast("long") for i in range(bits)],
            F.lit(1).cast("long"),
        )
        return F.zip_with(acc, vote, lambda a, b: a + b)

    def finish(acc: Column) -> Column:
        n = acc.getItem(bits)
        out = F.lit(0).cast("long")
        for i in range(bits):
            out = out + F.when(
                acc.getItem(i) * 2 > n, F.lit(1 << i)
            ).otherwise(F.lit(0))
        return out

    return F.aggregate(hashed, init, merge, finish)


def simhash64(text_col: Column, *, bits: int = 64, seed: int = 99) -> Column:
    """64-bit SimHash as an Arrow-batched pandas UDF over numpy packed
    bits — the scale path when 32-bit signatures get crowded (at ~1e9
    documents, 32-bit bands of 8 bits hold ~2^24 docs/bucket-space;
    64-bit bands of 16 bits spread 256× wider).

    Same contract as :func:`simhash`: bit i of the signature is the
    majority vote of bit i across the distinct tokens' seeded hashes;
    NULL text yields a NULL signature (whose NULL band values never
    join — null rows must not become hamming-0 "duplicates"). The
    token hash widens from 32-bit md5-prefix to the first 16 md5 hex
    chars (64 bits, same seeded payload ``{seed}:{token}``), so the
    64-bit signature's upper half equals the 32-bit signature exactly.
    Tokenization mirrors the JVM :func:`..functions.text.tokens`
    precisely — ``trim`` strips only ASCII spaces, the split class is
    Java's ASCII ``\\s`` (``[ \\t\\n\\x0b\\f\\r]``), and trailing empty
    strings are kept (Java split with limit -1) — a Python
    ``str.strip()`` + Unicode ``\\s`` would silently break the parity
    invariant on text with trailing newlines or Unicode whitespace.
    The signature is returned as a signed long via two's-complement bit
    reinterpretation — band extraction (arithmetic shiftright + mask)
    and XOR/bit_count Hamming are bit-pattern operations, indifferent
    to the sign.

    The batch pipeline is vectorized end-to-end: each DISTINCT token
    of the Arrow batch is md5-hashed exactly once (natural-language
    batches repeat their vocabulary heavily across documents, so this
    cuts md5 calls by the cross-document repetition factor — measured
    ~5× fewer on the documents fixture), the per-document bit votes
    are ONE ``np.add.reduceat`` over the batch-wide bit matrix, and
    the pack is a single broadcasted shift-sum. No per-document numpy
    allocation, no per-token Python in the hot loop beyond the
    vocabulary build.
    """
    from pyspark.sql.functions import pandas_udf

    if bits > 64:
        raise ValueError(f"bits={bits} exceeds the 64-bit packed path")

    @pandas_udf("long")
    def _sig(texts: pd.Series) -> pd.Series:
        import hashlib
        import re

        import numpy as np

        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, ASCII-only
        shifts = np.arange(bits, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.uint64)
        nulls = np.zeros(len(texts), dtype=bool)

        # one vocabulary per batch: token -> dense index, hashed ONCE
        vocab: dict = {}
        flat: list = []  # concatenated vocab indices, doc after doc
        bounds = [0]  # doc i's tokens are flat[bounds[i]:bounds[i+1]]
        doc_rows = []  # output row of each non-null doc
        for i, t in enumerate(texts):
            if t is None:
                nulls[i] = True
                continue
            # trim strips only ASCII spaces; split keeps trailing empty
            # strings — both exactly as Spark's trim/split(limit=-1) do
            for tok in set(ascii_ws.split(t.lower().strip(" "))):
                j = vocab.get(tok)
                if j is None:
                    j = len(vocab)
                    vocab[tok] = j
                flat.append(j)
            bounds.append(len(flat))
            doc_rows.append(i)
        if vocab:
            vocab_hashes = np.fromiter(
                (
                    int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:16], 16)
                    for tok in vocab
                ),
                dtype=np.uint64,
                count=len(vocab),
            )
            # (V, bits) 0/1 matrix; int64 so reduceat sums don't wrap
            vocab_bits = (
                (vocab_hashes[:, None] >> shifts[None, :]) & np.uint64(1)
            ).astype(np.int64)
            flat_idx = np.asarray(flat, dtype=np.int64)
            seg_starts = np.asarray(bounds[:-1], dtype=np.int64)
            # per-doc vote sums in ONE pass (every doc has >=1 token,
            # so segments are non-empty and reduceat is well-defined)
            votes = np.add.reduceat(vocab_bits[flat_idx], seg_starts, axis=0)
            counts = np.diff(np.asarray(bounds, dtype=np.int64)).reshape(-1, 1)
            sig_bits = (votes * 2 > counts).astype(np.uint64)
            sigs = (sig_bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)
            out[np.asarray(doc_rows, dtype=np.int64)] = sigs
        signed = pd.Series(
            pd.array(out.view(np.int64), dtype="Int64")
        )  # nullable Int64: NA survives without a float64 precision trip
        signed[nulls] = pd.NA
        return signed

    return _sig(text_col)


def simhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, sh) signature table, dispatching on width: ≤32 bits runs
    the pure-expression JVM fold (:func:`simhash`, oracle-replicable),
    wider runs the numpy packed-bit pandas UDF (:func:`simhash64`).
    Conditional spread first — both paths are CPU-bound per row."""
    wide = spread(df)
    sig = (
        simhash(F.col(text_col), bits)
        if bits <= SIMHASH_BITS
        else simhash64(F.col(text_col), bits=bits)
    )
    return wide.select(F.col(id_col), sig.alias("sh"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    num_bands: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash with multi-band blocking — the MinHash
    band scheme applied to the signature's bit ranges.

    The signature splits into ``num_bands`` disjoint bands (default
    ``max_hamming + 1``); candidates are pairs agreeing on AT LEAST ONE
    band, verified by Hamming distance. Pigeonhole: ``max_hamming``
    differing bits can dirty at most ``max_hamming`` bands, so with
    ``max_hamming + 1`` bands every within-threshold pair shares a
    clean band — **exact recall**, unlike single-band top-bits blocking
    (which silently missed pairs whose differing bits fell in the
    band). Scale: candidate buckets are keyed by (band index, band
    value) — ``num_bands × 2^(bits/num_bands)`` blocks (default
    4 × 2^8), dialable upward via ``bits``; bucket sizes shrink as the
    signature space spreads, and the per-band join is one shuffle on
    the bucket key.
    """
    num_bands = num_bands or (max_hamming + 1)
    if bits % num_bands:
        raise ValueError(f"bits={bits} not divisible by num_bands={num_bands}")
    band_bits = bits // num_bands
    mask = (1 << band_bits) - 1
    # Conditional spread parallelizes the signature pass beyond a
    # narrow scan's file granularity (identity on a wide cluster scan);
    # the keyed barrier then materializes ONE signature pass that both
    # self-join sides reuse (ReusedExchange). Pinned counts: AQE must
    # not coalesce CPU-heavy stages (see shingle_table). Width
    # dispatch: ≤32 bits = JVM expression fold, 64 = numpy pandas UDF.
    sig = simhash_signatures(df, text_col, id_col, bits=bits)
    sig = keyed_barrier(sig, id_col)
    banded = sig.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bi"),
                        F.shiftright("sh", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "sh", "band.bi", "band.bv")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", hamming_distance(F.col("a.sh"), F.col("b.sh")))
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
        .distinct()  # a pair can agree on several bands
    )


# ---------------------------------------------------------------------------
# Blocked n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    block_cols: list[str],
    shingle_k: int = 2,
    threshold: float = 0.3,
    hashed: bool = True,
) -> DataFrame:
    """Exact Jaccard near-dup within blocking-key groups. The block
    join bounds pair count; for unblocked corpora use minhash_lsh_pairs.

    ``hashed=True`` intersects 32-bit portable-hash values instead of the
    strings — integer set ops per pair are far cheaper and the shuffled
    sets shrink (same contract and collision note as
    :func:`jaccard_verify`; the oracle applies the identical hash)."""
    sh = word_shingles(F.col(text_col), k=shingle_k)
    if hashed:
        sh = hashed_shingles(sh)
    # Conditional spread → shingle → keyed barrier: shingle in
    # parallel, once; both join sides read the ReusedExchange (see
    # simhash_pairs).
    sets_ = spread(df).select(F.col(id_col), *block_cols, sh.alias("sh"))
    sets_ = keyed_barrier(sets_, id_col)
    a, b = sets_.alias("a"), sets_.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn("inter", F.size(F.array_intersect("a.sh", "b.sh")))
        .withColumn("uni", F.size(F.array_union("a.sh", "b.sh")))
        .withColumn(
            "jaccard",
            F.round(F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(0.0), 4),
        )
        .where(F.col("jaccard") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "jaccard")
    )


def drop_duplicate_paragraphs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    delimiter: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """CCNet-style cross-document PARAGRAPH dedup: split every document
    into segments on ``delimiter``, keep only the globally FIRST
    occurrence of each distinct segment (ordered by ``(id, position)``
    — so later repeats are removed both across documents and within
    one document), and reassemble each document's surviving segments
    in their original order. This is the paragraph-hash dedup of the
    CCNet pipeline (Wenzek et al. 2019) and the practical stand-in for
    suffix-array exact-substring dedup (Lee et al. 2021): boilerplate
    paragraphs, quoted reposts, and licence blurbs collapse to one
    training occurrence.

    Whitespace-only segments shorter than ``min_chars`` after trim
    (blank lines — document STRUCTURE, not content) are never deduped:
    every document keeps them.

    Returns ``(id, text)`` for documents with at least one surviving
    segment, the same contract as :func:`remove_boilerplate
    <hrtech_etl_spark.functions.text.remove_boilerplate>`.

    Plan at scale — deliberately NOT a row_number window over the
    segment key: a viral paragraph with millions of copies would make
    one hot window partition with no salting escape (row_number needs
    total order). Instead the keeper per segment is computed with
    ``min(struct(id, pos))`` — an algebraic aggregate, so map-side
    partial aggregation collapses each partition's copies of a hot
    segment to ONE row before the exchange — and survivors are marked
    with a join on ``(segment, id, pos)``, whose 3-column hash
    spreads even a single viral segment across partitions. Three
    keyed exchanges total (keeper agg, marker join, reassembly), each
    skew-tolerant. Blank segments ride the SAME marker join as a
    left-outer miss (they are never keepers) instead of a third
    union branch, so the parquet input is scanned exactly twice —
    once per explode lineage — not three times; executed-plan shape
    is locked by tests/test_paragraph_dedup.py.
    """
    import re as _re

    parts = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delimiter), -1)
        ).alias("__pos", "__seg"),
    )
    is_blank = F.length(F.trim(F.col("__seg"))) < min_chars
    keeper = (
        parts.where(~is_blank)
        .groupBy("__seg")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("__pos"))).alias("__k")
        )
        .select(
            "__seg",
            F.col(f"__k.{id_col}").alias(id_col),
            F.col("__k.__pos").alias("__pos"),
            F.lit(True).alias("__keep"),
        )
    )
    # keeper is unique per __seg, so the left join never fans out;
    # blanks (excluded from keeper) surface as misses and are kept
    kept = parts.join(keeper, ["__seg", id_col, "__pos"], "left").where(
        is_blank | F.col("__keep").isNotNull()
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("__pos", "__seg"))).alias("__ps")
        )
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(F.col("__ps"), lambda s: s.getField("__seg")),
                delimiter,
            ).alias(text_col),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 20,
    min_dup: int = 2,
) -> DataFrame:
    """Exact substring-duplication stats per document — the
    character-level analogue of suffix-array dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    ``k``-char substring occurring ``min_dup``+ times ANYWHERE in the
    corpus (across documents or repeated within one) marks its span
    duplicated; overlapping/adjacent marked spans merge into maximal
    runs. Returns one row per document that contains at least one
    duplicated run: ``(id, n_spans, dup_chars, dup_frac)`` — the
    per-document duplication profile a curation pipeline thresholds on
    (e.g. drop docs with dup_frac > 0.5, or feed the spans to a
    cut-and-rejoin pass).

    Plan at scale (the explode is O(total chars) — the same corpus-
    sized working set a suffix array costs, expressed as three
    skew-tolerant stages):

    1. positions explode BEFORE the substring is materialized (each
       shingle row narrows immediately to ``(id, pos, xxhash64)`` —
       20 bytes — so nothing wide ever shuffles);
    2. the duplicated-shingle set comes from an algebraic count
       (map-side partials collapse a viral shingle to one row per
       partition before the exchange — no hot window partition), and
       survivors are marked with an inner join that AQE turns into a
       broadcast when the dup set is small and a skew-split shuffle
       join when it is not;
    3. only marked rows (typically a small fraction) reach the
       per-document interval merge: one exchange on ``id``, reused by
       the island window AND the final aggregate.

    Shingles are compared by 64-bit hash, not string (same collision
    contract as :func:`hashed_shingles`).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    t, i = text_col, id_col
    # scale-conditional width: the O(total chars) position explode is
    # the heaviest stage — widen a narrow local scan, pass a wide
    # cluster scan through unchanged
    sh = (
        spread(docs.where(F.length(t) >= k))
        .select(
            F.col(i),
            F.length(t).alias("__n"),
            F.explode(F.expr(f"sequence(1, length({t}) - {k} + 1)")).alias(
                "__pos"
            ),
            F.col(t),
        )
        .select(
            i,
            "__n",
            "__pos",
            F.xxhash64(F.expr(f"substring({t}, __pos, {k})")).alias("__h"),
        )
    )
    dup = (
        sh.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_dup)
        .select("__h")
    )
    hits = sh.join(dup, "__h").drop("__h")

    from pyspark.sql import Window as W

    w_prev = (
        W.partitionBy(i)
        .orderBy("__pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev = F.max("__pos").over(w_prev)
    marked = hits.select(
        i,
        "__n",
        "__pos",
        F.when(prev.isNull() | (F.col("__pos") > prev + k), 1)
        .otherwise(0)
        .alias("__brk"),
    )
    w_run = (
        W.partitionBy(i).orderBy("__pos").rowsBetween(W.unboundedPreceding, 0)
    )
    islands = marked.select(
        i, "__n", "__pos", F.sum("__brk").over(w_run).alias("__isl")
    )
    spans = islands.groupBy(i, "__isl").agg(
        (F.max("__pos") - F.min("__pos") + k).alias("__span"),
        F.max("__n").alias("__n"),
    )
    return spans.groupBy(i).agg(
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum("__span").alias("dup_chars"),
        F.round(
            F.sum("__span").cast("double") / F.max("__n"), 6
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (LBFS/rsync-style, fixed boundary rule)
# ---------------------------------------------------------------------------


def content_defined_chunks(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    window: int = 8,
    divisor: int = 61,
    seed: int = 0,
) -> DataFrame:
    """Split every document into content-defined chunks: a chunk ends
    at position ``p`` when the portable hash of the ``window``-char
    substring ENDING at ``p`` is ``0 mod divisor`` (expected chunk
    length ≈ ``divisor``), plus always at end-of-document. Because
    boundaries depend only on local content, an insertion near the
    front of a near-duplicate document shifts every byte offset yet
    the chunk stream re-synchronizes right after the edit — the
    LBFS/rsync/backup-dedup property that makes chunk-level dedup
    robust where fixed-size blocks are not. (FastCDC's min/max chunk
    clamp is deliberately out of scope: the clamp makes each boundary
    depend on the previous ACCEPTED boundary — sequential per
    document — while this fixed rule is per-position independent and
    hence embarrassingly parallel.)

    Returns one row per chunk: ``(id, chunk_idx, start, chunk_len,
    chunk_md5)`` — 1-based ``start``, md5 identity for corpus-level
    dedup. Documents shorter than ``window`` become a single chunk;
    NULL/empty text yields no rows.

    Plan at scale: the position explode narrows to ``(id, pos)``
    immediately (boundary filter runs map-side BEFORE any shuffle, so
    only ~n/divisor boundary rows per doc survive); chunk starts come
    from one lag window on ``id``; chunk text is cut by rejoining the
    narrow ends table to the docs scan on ``id`` — the wide text
    column crosses exactly one exchange, once, and every hash is a
    JVM-side expression replayed verbatim by the DuckDB oracle.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if divisor < 2:
        raise ValueError(f"divisor must be >= 2, got {divisor}")
    from pyspark.sql import Window as W

    t, i = text_col, id_col
    # conditional spread: the per-position substring+hash pass below is
    # O(total chars) CPU — a narrow local scan (1 file partition at
    # sf0.1) would run it on one core; identity on wide cluster scans
    base = spread(docs.where(F.col(t).isNotNull() & (F.length(t) >= 1))).select(
        F.col(i), F.length(t).alias("__n"), F.col(t)
    )
    long_ends = (
        base.where(F.col("__n") >= window)
        .select(
            i,
            "__n",
            F.explode(F.expr(f"sequence({window}, length({t}))")).alias(
                "__pos"
            ),
            F.col(t),
        )
        .where(
            (F.col("__pos") == F.col("__n"))
            | (
                portable_hash(
                    F.expr(f"substring({t}, __pos - {window - 1}, {window})"),
                    seed=seed,
                )
                % divisor
                == 0
            )
        )
        .select(i, "__pos")
    )
    short_ends = base.where(F.col("__n") < window).select(
        i, F.col("__n").alias("__pos")
    )
    ends = long_ends.unionByName(short_ends)
    w = W.partitionBy(i).orderBy("__pos")
    bounds = ends.select(
        i,
        F.col("__pos").alias("__e"),
        (F.coalesce(F.lag("__pos").over(w), F.lit(0)) + 1).alias("__s"),
        F.row_number().over(w).alias("chunk_idx"),
    )
    return bounds.join(base.select(i, t), i).select(
        i,
        "chunk_idx",
        F.col("__s").cast("int").alias("start"),
        (F.col("__e") - F.col("__s") + 1).cast("int").alias("chunk_len"),
        F.md5(F.expr(f"substring({t}, __s, __e - __s + 1)")).alias(
            "chunk_md5"
        ),
    )


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 16,
) -> DataFrame:
    """Asymmetric set CONTAINMENT (Broder 1997): pairs where the
    smaller document's shingle set is mostly inside the other's —
    ``|A∩B| / min(|A|, |B|)``. Jaccard misses exactly these: a short
    doc quoted verbatim inside a long one has tiny union-relative
    overlap but containment ≈ 1. This is the quote/subset-duplication
    detector (Lee et al. 2021 report heavy train-set quotation).

    Scale shape — NEVER all-pairs: explode hashed shingles to
    (shingle, doc), drop shingles occurring in more than
    ``max_doc_freq`` docs (the stop-shingle valve: boilerplate
    shingles would otherwise generate quadratic candidates; the
    trade, as in minhash_lsh_pairs, is recall on pairs whose ONLY
    overlap is boilerplate), then one self-join on the shingle value
    — each surviving co-occurrence contributes one count, so the
    group-by-pair count IS ``|A∩B|`` over valve-surviving shingles.
    Sizes use the same valve-surviving sets, keeping the ratio
    internally consistent. One shingle exchange + one pair exchange,
    partial-aggregated; candidate fan-out is bounded by
    ``max_doc_freq²`` per shingle.

    The empty-set drop is stated on the INPUT as ``size(tokens) >=
    shingle_k`` (equivalent: a doc has a word k-shingle iff it has
    >= k tokens; k=1 keeps the empty token either way), NOT as
    ``size(sh) > 0`` on the projected column — Catalyst pushes a
    projected-column filter below the spread's round-robin exchange
    onto the (locally narrow) scan, re-evaluating the whole shingle
    expression (6 splits + zip_with + md5 per row) a second time,
    single-threaded, before the widening exchange the heavy
    projection exists behind. With the cheap restatement the pushed
    filter IS the optimization. Value-identical on the full pair
    frame; quiet-host A/B (AB_containment_r15.json): 1.08x vs the
    round-14 formulation at sf0.1 (the entry is job-launch-bound at
    5k docs, so the local delta is small — the real win is the 2x
    heavy-expression evaluation and the narrow-scan serialization at
    real corpus sizes). The same record measures a collect_list-per-
    shingle backend at a wash with this one; the join backend stays
    because it shares its banded-join shape with the verified
    signature-merge paths.
    """
    sh = hashed_shingles(word_shingles(F.col(text_col), k=shingle_k))
    pre = df.where(F.size(tokens(F.col(text_col))) >= shingle_k)
    sets_ = spread(pre).select(F.col(id_col).alias("id"), sh.alias("sh"))
    # lazy localCheckpoint: the hashed-shingle table has FOUR consumers
    # (the stop-shingle aggregate, both self-join sides, the size
    # table) and AQE's exchange reuse only deduplicated two of the
    # four copies in practice (round-17 profiling: the scan→tokenize→
    # shingle→md5 map stage ran twice as ~1.5s single-task jobs).
    # Pinning the barrier output guarantees compute-once; the stored
    # arrays are 8 bytes/shingle — cheaper to re-read than to
    # recompute at any scale. A/B at sf0.1: 2.94 -> 2.20s min,
    # pairs identical.
    sets_ = keyed_barrier(sets_, "id").localCheckpoint(eager=False)
    ex = sets_.select("id", F.explode("sh").alias("shv"))
    keep = (
        ex.groupBy("shv")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .where(F.col("dfreq") <= max_doc_freq)
        .select("shv")
    )
    ex2 = ex.join(keep, "shv")
    sizes = ex2.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ex2.alias("a"), ex2.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shv") == F.col("b.shv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.round(
                F.col("inter").cast("double")
                / F.least(F.col("n_a"), F.col("n_b")),
                4,
            ),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "inter", "containment")
    )

"""Near-dup clustering: connected components over pair graphs and the
end-to-end drop_near_duplicates pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hrtech_etl_spark.functions.dedup import (
    drop_near_duplicates,
    jaccard_verify,
    minhash_lsh_pairs,
    near_dup_clusters,
)


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_transitive_chain_collapses(spark):
    """a~b, b~c (no a~c pair) must land in ONE cluster; disjoint pair
    d~e separate; f singleton labels itself."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(pairs, ids, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_long_chain_converges(spark):
    """A path graph needs O(diameter) rounds — make sure propagation
    actually iterates rather than stopping after one round."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(pairs, ids, "doc_id", max_iterations=20).collect()
    }
    assert set(got.values()) == {1}

    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, ids, "doc_id", max_iterations=2)


def test_clusters_match_union_find_on_documents(spark, sf_dir):
    """On the real fixture: Spark components == driver-side union-find
    over the same verified pair set."""
    from hrtech_etl_spark.sources.testdata import load_table

    d = load_table(spark, "documents", sf_dir)
    cand = minhash_lsh_pairs(d, "text", "doc_id")
    verified = jaccard_verify(cand, d, "text", "doc_id", threshold=0.5)
    pair_rows = [(r["id_a"], r["id_b"]) for r in verified.collect()]
    all_ids = [r["doc_id"] for r in d.select("doc_id").collect()]
    want = _union_find(all_ids, pair_rows)
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(verified, d.select("doc_id"), "doc_id").collect()
    }
    assert got == want


def test_drop_near_duplicates_keeps_min_per_cluster(spark, sf_dir):
    from hrtech_etl_spark.sources.testdata import load_table

    d = load_table(spark, "documents", sf_dir)
    kept = drop_near_duplicates(d, "text", "doc_id", threshold=0.5)
    cand = minhash_lsh_pairs(d, "text", "doc_id")
    verified = jaccard_verify(cand, d, "text", "doc_id", threshold=0.5)
    comp = _union_find(
        [r["doc_id"] for r in d.select("doc_id").collect()],
        [(r["id_a"], r["id_b"]) for r in verified.collect()],
    )
    want_kept = {min(i for i, c2 in comp.items() if c2 == c) for c in set(comp.values())}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == want_kept
    # schema preserved
    assert kept.columns == d.columns


def test_one_driver_action_per_round(spark, monkeypatch):
    """Round-5 structure: each round runs ONE count() (materialize +
    Observation convergence probe in the same job); eager lineage
    checkpoints happen only every checkpoint_every rounds, not per
    round (the old shape was checkpoint + probe-count = 2 actions)."""
    # patch the CONCRETE class (pyspark.sql.classic under Spark 4
    # overrides the abstract base's methods, so patching the base
    # never intercepts instance calls)
    DataFrame = type(spark.range(1))

    counts = {"count": 0, "ckpt_eager": 0, "ckpt_lazy": 0}
    orig_count = DataFrame.count
    orig_ckpt = DataFrame.localCheckpoint

    def count_spy(self):
        counts["count"] += 1
        return orig_count(self)

    def ckpt_spy(self, eager=True):
        counts["ckpt_eager" if eager else "ckpt_lazy"] += 1
        return orig_ckpt(self, eager=eager)

    monkeypatch.setattr(DataFrame, "count", count_spy)
    monkeypatch.setattr(DataFrame, "localCheckpoint", ckpt_spy)

    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(pairs, ids, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    # 3 rounds to converge -> 3 counts. Checkpoints (round 12): edge
    # list and pair-touched id set are lazy (materialized inside round
    # 1's job); round 3 (i+1 == checkpoint_every) truncates lineage
    # eagerly, and the returned singleton-restoring join is eagerly
    # truncated so the result stays lineage-free as callers rely on.
    assert counts == {"count": 3, "ckpt_eager": 2, "ckpt_lazy": 2}


def test_accelerated_chain_converges_in_log_rounds(spark):
    """accelerate=True composes labels through the previous round's
    mapping (pointer jump): a 40-node path — 39 rounds for plain
    propagation — converges within 9 rounds, same labels."""
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            pairs, ids, "doc_id", max_iterations=9, accelerate=True
        ).collect()
    }
    assert set(got.values()) == {1} and len(got) == n

    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, ids, "doc_id", max_iterations=9)


def test_accelerated_matches_plain_on_documents(spark, sf_dir):
    from hrtech_etl_spark.sources.testdata import load_table

    d = load_table(spark, "documents", sf_dir)
    cand = minhash_lsh_pairs(d, "text", "doc_id")
    verified = jaccard_verify(cand, d, "text", "doc_id", threshold=0.5)
    plain = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(verified, d.select("doc_id"), "doc_id").collect()
    }
    fast = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            verified, d.select("doc_id"), "doc_id", accelerate=True
        ).collect()
    }
    assert plain == fast


def test_fused_two_step_rounds_match_one_step(spark, monkeypatch):
    """steps_per_round=2 (round 18): two propagation steps per
    materialized round — identical labels, FEWER count jobs (one probe
    per two steps), and the same raise boundary (both cadences execute
    exactly max_iterations steps before declaring non-convergence)."""
    DataFrame = type(spark.range(1))
    counts = {"n": 0}
    orig_count = DataFrame.count

    def count_spy(self):
        counts["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "count", count_spy)

    n = 12  # path graph: 11 steps to converge, step 12 probes zero
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["id_a", "id_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])

    counts["n"] = 0
    plain = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            pairs, ids, "doc_id", max_iterations=20
        ).collect()
    }
    plain_counts = counts["n"]

    counts["n"] = 0
    fused = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            pairs, ids, "doc_id", max_iterations=20, steps_per_round=2
        ).collect()
    }
    fused_counts = counts["n"]

    assert fused == plain and set(fused.values()) == {1}
    # 12 one-step rounds -> 6 fused rounds (each one count job)
    assert fused_counts < plain_counts

    # raise boundary unchanged: 2 steps cannot converge an 11-step
    # chain under either cadence
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(
            pairs, ids, "doc_id", max_iterations=2, steps_per_round=2
        )
    # odd max_iterations: the trailing short round runs ONE step, so
    # exactly 3 steps execute — still short of convergence
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(
            pairs, ids, "doc_id", max_iterations=3, steps_per_round=2
        )
    with pytest.raises(ValueError, match="steps_per_round"):
        near_dup_clusters(pairs, ids, "doc_id", steps_per_round=3)


def test_fused_accelerated_matches_on_documents(spark, sf_dir):
    """The production combination (accelerate + fused rounds) on the
    real fixture: labels identical to the one-step accelerated
    cadence."""
    from hrtech_etl_spark.sources.testdata import load_table

    d = load_table(spark, "documents", sf_dir)
    cand = minhash_lsh_pairs(d, "text", "doc_id")
    verified = jaccard_verify(cand, d, "text", "doc_id", threshold=0.5)
    one = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            verified, d.select("doc_id"), "doc_id", accelerate=True
        ).collect()
    }
    two = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            verified, d.select("doc_id"), "doc_id", accelerate=True,
            steps_per_round=2,
        ).collect()
    }
    assert one == two


def test_minhash_bucket_cap(spark):
    """max_bucket_size drops mega-buckets before the self-join: a
    boilerplate cluster of identical docs (one giant bucket per band)
    emits no pairs under a small cap, while distinct near-dup pairs in
    small buckets survive; cap=None stays exact."""
    boiler = [(i, "the same exact boilerplate footer text repeated") for i in range(50)]
    near = [
        (100, "completely different unique payload alpha beta gamma delta"),
        (101, "completely different unique payload alpha beta gamma epsilon"),
    ]
    df = spark.createDataFrame(boiler + near, ["doc_id", "text"])
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id").collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id", max_bucket_size=10).collect()
    }
    assert (100, 101) in uncapped and (100, 101) in capped
    # the 50-doc boilerplate clique (1225 pairs) is gone under the cap
    assert any(a < 50 and b < 50 for a, b in uncapped)
    assert not any(a < 50 and b < 50 for a, b in capped)
    assert capped < uncapped


def test_remove_stop_shingles(spark):
    """Shingles shared by most docs vanish; rare shingles survive; the
    cleaned table keeps near-dup pairs findable while boilerplate-only
    overlap stops producing candidates."""
    from hrtech_etl_spark.functions.dedup import (
        remove_stop_shingles,
        shingle_table,
    )

    footer = "standard corporate footer all rights reserved"
    docs = [(i, f"unique payload number {i} item {i * 7} " + footer) for i in range(20)]
    docs += [
        (100, "alpha beta gamma delta unique pair one " + footer),
        (101, "alpha beta gamma delta unique pair two " + footer),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = shingle_table(df, "text", "doc_id", hashed=True)
    cleaned = remove_stop_shingles(sh, max_doc_frac=0.5)

    # footer bigrams appear in all 22 docs -> removed everywhere
    sizes_before = {r["doc_id"]: len(r["sh"]) for r in sh.collect()}
    sizes_after = {r["doc_id"]: len(r["sh"]) for r in cleaned.collect()}
    assert all(sizes_after[d] < sizes_before[d] for d in sizes_after)

    pairs = minhash_lsh_pairs(df, "text", "doc_id", shingles=cleaned)
    verified = jaccard_verify(pairs, df, "text", "doc_id", threshold=0.5, shingles=cleaned)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (100, 101) in got
    assert not any(a < 100 and b < 100 for a, b in got)

    # raises on an unhashed table, and on an absurd threshold
    raw = shingle_table(df, "text", "doc_id", hashed=False)
    with pytest.raises(ValueError, match="hashed"):
        remove_stop_shingles(raw)
    with pytest.raises(ValueError, match="threshold too low"):
        remove_stop_shingles(sh, max_doc_frac=0.0, max_stop=3)


def test_remove_stop_shingles_broadcast_path_matches_literal(spark):
    """Above literal_max the filter switches from a literal array_except
    to a broadcast-variable pandas filter; both paths must produce the
    identical cleaned table (forced here with literal_max=0)."""
    from hrtech_etl_spark.functions.dedup import (
        remove_stop_shingles,
        shingle_table,
    )

    footer = "standard corporate footer all rights reserved"
    docs = [(i, f"unique payload number {i} item {i * 7} " + footer) for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = shingle_table(df, "text", "doc_id", hashed=True)
    literal = {r["doc_id"]: r["sh"] for r in remove_stop_shingles(sh, max_doc_frac=0.5).collect()}
    bcast = {
        r["doc_id"]: r["sh"]
        for r in remove_stop_shingles(sh, max_doc_frac=0.5, literal_max=0).collect()
    }
    assert bcast == literal
    assert any(len(v) > 0 for v in bcast.values())


def test_broadcast_array_except_large_stop_set(spark):
    """A 20k-entry stop set must not become a 20k-node expression tree:
    the broadcast path completes quickly, removes exactly the stopped
    values, preserves element order, rows, and NULLs."""
    from hrtech_etl_spark.functions.dedup import _broadcast_array_except

    stop_values = list(range(10, 20_010))  # 20k entries
    rows = [
        (1, [1, 15, 2, 19_999, 3]),  # 15 and 19_999 stopped
        (2, [5, 6, 7]),  # untouched
        (3, [10, 11, 12]),  # fully stopped -> empty, row SURVIVES
        (4, None),  # NULL stays NULL
    ]
    df = spark.createDataFrame(rows, "doc_id int, sh array<long>")
    out = df.withColumn("sh", _broadcast_array_except("sh", df, stop_values))
    got = {r["doc_id"]: r["sh"] for r in out.collect()}
    assert got == {1: [1, 2, 3], 2: [5, 6, 7], 3: [], 4: None}


def test_reliable_checkpoint_dir(spark, tmp_path, monkeypatch):
    """checkpoint_dir switches EVERY lineage truncation from
    executor-local localCheckpoint to reliable checkpoint() against the
    given directory; labels are identical either way."""
    DataFrame = type(spark.range(1))
    calls = {"local": 0, "reliable": 0}
    orig_local, orig_ckpt = DataFrame.localCheckpoint, DataFrame.checkpoint

    def local_spy(self, eager=True):
        calls["local"] += 1
        return orig_local(self, eager=eager)

    def ckpt_spy(self, eager=True):
        calls["reliable"] += 1
        return orig_ckpt(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", local_spy)
    monkeypatch.setattr(DataFrame, "checkpoint", ckpt_spy)

    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"])
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    got = {
        r["id"]: r["cluster"]
        for r in near_dup_clusters(
            pairs, ids, "doc_id", checkpoint_dir=str(tmp_path)
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    assert calls["local"] == 0 and calls["reliable"] >= 2
    # the reliable files really landed under the given directory
    assert any(tmp_path.rglob("*"))


def test_drop_empty_shingle_prefilter_exact_and_not_scan_side(spark):
    """r18: ``shingle_table(drop_empty=True)`` drops EXACTLY the rows
    the old ``size(sh) > 0`` post-filter dropped (token-count predicate
    is the word_ngrams CASE condition — NULL text, empty text,
    one-token and tab-edge docs included), tags the column so
    ``minhash_lsh_pairs`` skips its re-filter, and the full shingle
    construction no longer evaluates below the exchange (the pushed-
    predicate disease this round's profiling found). A stop-shingle
    rewrite must drop the tag (empties can reappear)."""
    from pyspark.sql import functions as F

    from hrtech_etl_spark.functions.dedup import (
        _shingles_nonempty,
        shingle_table,
        word_shingles,
    )

    df = spark.createDataFrame(
        [
            (1, "solo"),
            (2, "two words here"),
            (3, ""),
            (4, None),
            (5, "\ta"),          # split-on-\s+ edge: ["", "a"] = 2 tokens
            (6, "  spaced  x "),
            (7, "a b"),
        ],
        "doc_id long, text string",
    )
    old = (
        df.select("doc_id", word_shingles(F.col("text"), 2).alias("sh"))
        .where(F.size("sh") > 0)
    )
    new = shingle_table(df, "text", "doc_id", drop_empty=True)
    assert sorted((r[0], tuple(r[1])) for r in new.collect()) == sorted(
        (r[0], tuple(r[1])) for r in old.collect()
    )
    assert _shingles_nonempty(new)
    assert not _shingles_nonempty(shingle_table(df, "text", "doc_id"))
    # hashed path carries the tag through its barrier too
    hashed = shingle_table(df, "text", "doc_id", hashed=True, drop_empty=True)
    assert _shingles_nonempty(hashed)
    # a column rewrite (stop-shingle removal shape) loses the tag
    assert not _shingles_nonempty(
        hashed.withColumn("sh", F.slice("sh", 1, 100))
    )
    # the expensive construction must not sit below the exchange
    # (coalesce(1) forces the narrow-scan widen path that fires it)
    narrow = shingle_table(
        df.coalesce(1), "text", "doc_id", drop_empty=True
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan, plan
    below = plan.split("Exchange")[-1]
    assert "zip_with" not in below, below
    # candidate pairs identical with a drop_empty-shared frame
    base = minhash_lsh_pairs(df, "text", "doc_id")
    shared = minhash_lsh_pairs(df, "text", "doc_id", shingles=new)
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shared.collect())
    )

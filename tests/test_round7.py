"""Round-7 regression tests.

1. ``corpus_semantic_pipeline`` replay: the one-row funnel summary must
   be reproducible driver-side from the STAGE OPERATORS it composes
   (``near_dup_clusters``, ``_semantic_clusters``, the shared quality
   column) — the funnel can't silently drift from its building blocks.
2. Funnel prefix consistency: the exact+near-dup counters must equal
   ``corpus_dedup_pipeline``'s (same first two stages, same numbers).
3. ``_star_components`` convergence is an EXACT set-equality test now
   (round-7 ADVICE): pin the fixpoint on an adversarial chain graph.
"""

from __future__ import annotations

from collections import defaultdict

SF_CORRECT = "/root/testdata/sf0.01"


def _python_survivors(members: dict, quality: dict) -> set:
    """Per cluster keep (max quality, then min doc_id); singletons
    survive trivially."""
    keep = set()
    for mem in members.values():
        keep.add(min(mem, key=lambda d: (-quality[d], d)))
    return keep


def test_corpus_semantic_pipeline_replays_from_stage_operators(spark):
    from pyspark.sql import functions as F

    from bigdata_group4_app_spark.operators.dedup import near_dup_clusters
    from bigdata_group4_app_spark.operators.similarity import (
        _semantic_clusters,
        corpus_semantic_pipeline,
    )
    from bigdata_group4_app_spark.operators.text import quality_score_col
    from bigdata_group4_app_spark.sources.registry import load_table

    row = corpus_semantic_pipeline(spark, SF_CORRECT).collect()[0]

    docs = load_table(spark, SF_CORRECT, "documents").withColumn(
        "toks", F.split(F.trim(F.col("text")), r"\s+")
    )
    base = docs.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        quality_score_col().alias("quality"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    ).collect()
    quality = {r["doc_id"]: r["quality"] for r in base}
    n_toks = {r["doc_id"]: r["n_toks"] for r in base}

    # stage 1: exact dedup — min doc_id per fingerprint
    by_fp = defaultdict(list)
    for r in base:
        by_fp[r["fp"]].append(r["doc_id"])
    kept = {min(v) for v in by_fp.values()}
    assert row["n_docs"] == len(base)
    assert row["n_canonical"] == len(kept)

    # stage 2: near-dup collapse among kept docs (cluster members that
    # were exact-dropped just don't participate)
    mh = defaultdict(set)
    for r in near_dup_clusters(spark, SF_CORRECT).collect():
        if r["doc_id"] in kept:
            mh[r["cluster_id"]].add(r["doc_id"])
    clustered = set().union(*mh.values()) if mh else set()
    surv1 = (kept - clustered) | _python_survivors(mh, quality)
    assert row["n_neardup_dropped"] == len(kept) - len(surv1)

    # stage 3: semantic collapse among stage-2 survivors
    sem = defaultdict(set)
    for r in _semantic_clusters(spark, SF_CORRECT).collect():
        if r["doc_id"] in surv1:
            sem[r["cluster_id"]].add(r["doc_id"])
    sclustered = set().union(*sem.values()) if sem else set()
    surv2 = (surv1 - sclustered) | _python_survivors(sem, quality)
    assert row["n_semantic_dropped"] == len(surv1) - len(surv2)

    # stage 4: quality gate + token budget
    clean = {d for d in surv2 if quality[d] >= 0.5}
    assert row["n_final_clean"] == len(clean)
    assert row["clean_tokens"] == sum(n_toks[d] for d in clean)

    # the funnel must actually bite at sf0.01: every stage nonzero
    assert row["n_neardup_dropped"] > 0
    assert row["n_semantic_dropped"] > 0
    assert 0 < row["n_final_clean"] < row["n_canonical"]


def test_semantic_pipeline_prefix_matches_two_stage_pipeline(spark):
    from bigdata_group4_app_spark.operators.dedup import (
        corpus_dedup_pipeline,
    )
    from bigdata_group4_app_spark.operators.similarity import (
        corpus_semantic_pipeline,
    )

    a = corpus_dedup_pipeline(spark, SF_CORRECT).collect()[0]
    b = corpus_semantic_pipeline(spark, SF_CORRECT).collect()[0]
    assert a["n_docs"] == b["n_docs"]
    assert a["n_canonical"] == b["n_canonical"]
    assert a["n_neardup_dropped"] == b["n_neardup_dropped"]
    # the semantic stage can only REMOVE docs from the clean set
    assert b["n_final_clean"] <= a["n_final_clean"]
    assert b["clean_tokens"] <= a["clean_tokens"]


def test_star_components_exact_fixpoint_on_chain(spark):
    """A pure chain 0-1-2-...-9 (worst case for min-label travel) plus
    a disjoint triangle: every node must land on its component min.
    Guards the round-7 convergence rewrite (exact exceptAll equality
    instead of checksums)."""
    from bigdata_group4_app_spark.operators.dedup import _star_components

    chain = [(i, i + 1) for i in range(9)]
    tri = [(100, 101), (101, 102), (100, 102)]
    edges = chain + tri
    df = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "doc_id_1 long, doc_id_2 long"
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in _star_components(df).collect()
    }
    want = {(i, 0) for i in range(10)} | {(i, 100) for i in (100, 101, 102)}
    assert got == want

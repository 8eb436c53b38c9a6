"""Round-13 additions: ADVICE r12 fixes (cow_delete_range head pin,
sink schema carry-forward), catalog commit auto-rebase, merge-on-read
delete files, manifest commit timestamps / AS-OF reads, and the
two-lane wide SimHash."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import bigdata_group4_app_spark.operators.snapshots as S
from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _mk_catalog(spark, d: str, rows, name="base") -> int:
    """Tiny single-table catalog: one committed snapshot of `t` with
    measured vec_id zone maps."""
    df = spark.createDataFrame(rows, "vec_id long, label long")
    rel = S.write_segment(df, d, "t", name)
    b = df.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    return S.commit_snapshot(
        d,
        {"t": [rel]},
        stats={"t": {rel: {"vec_id_min": b[0], "vec_id_max": b[1]}}},
    )


class TestDeleteHeadPin:
    """ADVICE r12: cow_delete_range gains an expected_head pin so a
    fixture builder can't compute a delete from (and commit onto) a
    concurrent winner's snapshot."""

    def test_stale_expected_head_raises_before_any_write(
        self, spark, tmp_path
    ):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10), (2, 20), (3, 30)])
        # advance the head: a second writer committed meanwhile
        m = S.read_manifest(d, 0)
        S.commit_snapshot(d, dict(m["tables"]), stats=m.get("stats", {}))
        assert S.committed_snapshot_ids(d) == [0, 1]
        with pytest.raises(S.CommitConflict):
            S.cow_delete_range(
                spark, d, "t", "vec_id", 1, 2, "del", expected_head=0
            )
        # no spurious snapshot, no segment written
        assert S.committed_snapshot_ids(d) == [0, 1]
        assert not os.path.exists(os.path.join(d, "segments", "t", "del"))

    def test_matching_expected_head_commits(self, spark, tmp_path):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10), (2, 20), (3, 30)])
        sid = S.cow_delete_range(
            spark, d, "t", "vec_id", 1, 1, "del", expected_head=0
        )
        assert sid == 1
        t = S.read_snapshot_table(spark, d, "t", 1)
        assert sorted(r["vec_id"] for r in t.collect()) == [2, 3]


class TestSinkSchemaCarryForward:
    """ADVICE r12: a streaming catalog commit must carry the head's
    committed schemas forward like every other catalog mutator."""

    def test_catalog_commit_step_preserves_head_schema(
        self, spark, tmp_path
    ):
        from bigdata_group4_app_spark.streaming.sinks import (
            catalog_commit_step,
        )

        d = str(tmp_path / "cat")
        # bootstrap: one committed batch, then evolve the schema in a
        # stats-only style commit carrying a documents DDL
        b1 = spark.createDataFrame(
            [(1, "aa"), (2, "bb")], "doc_id long, text string"
        )
        catalog_commit_step(b1, d)
        head = S.read_manifest(d, S.committed_snapshot_ids(d)[-1])
        ddl = "doc_id BIGINT, text STRING"
        S.commit_snapshot(
            d,
            {t: list(v) for t, v in head["tables"].items()},
            stats=head.get("stats", {}),
            schemas={"documents": ddl},
        )
        b2 = spark.createDataFrame([(3, "cc")], "doc_id long, text string")
        sid = catalog_commit_step(b2, d)
        assert sid is not None
        m = S.read_manifest(d, sid)
        assert m["schemas"] == {"documents": ddl}


class TestCommitRebase:
    """VERDICT r12 item 1: commit_snapshot_rebase — automatic rebase
    for commuting deltas, CommitConflict only for true conflicts."""

    def test_append_rebases_over_interleaved_commit(self, spark, tmp_path):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10)], name="s0")
        base = S.committed_snapshot_ids(d)[-1]
        # interloper: appends its own segment after our base read
        df = spark.createDataFrame([(2, 20)], "vec_id long, label long")
        other = S.write_segment(df, d, "t", "s1")
        S.commit_snapshot_rebase(d, appends={"t": [other]}, base_head=base)
        # our append (computed from the stale base) still lands, and the
        # interloper's segment is NOT dropped
        df2 = spark.createDataFrame([(3, 30)], "vec_id long, label long")
        mine = S.write_segment(df2, d, "t", "s2")
        sid = S.commit_snapshot_rebase(
            d, appends={"t": [mine]}, base_head=base
        )
        m = S.read_manifest(d, sid)
        assert set(m["tables"]["t"]) == {
            "segments/t/s0", "segments/t/s1", "segments/t/s2",
        }

    def test_replace_conflicts_when_table_moved(self, spark, tmp_path):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10)], name="s0")
        base = S.committed_snapshot_ids(d)[-1]
        df = spark.createDataFrame([(2, 20)], "vec_id long, label long")
        other = S.write_segment(df, d, "t", "s1")
        S.commit_snapshot_rebase(d, appends={"t": [other]}, base_head=base)
        # a replace computed from the stale base must refuse: blindly
        # re-applying would drop segment s1 (lost update)
        rep = S.write_segment(df, d, "t", "merged")
        with pytest.raises(S.CommitConflict):
            S.commit_snapshot_rebase(
                d, replaces={"t": [rep]}, base_head=base
            )

    def test_replace_rebases_when_other_table_moved(self, spark, tmp_path):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10)], name="s0")
        base = S.committed_snapshot_ids(d)[-1]
        df = spark.createDataFrame([(7, 70)], "vec_id long, label long")
        urel = S.write_segment(df, d, "u", "u0")
        S.commit_snapshot_rebase(d, appends={"u": [urel]}, base_head=base)
        rep = S.write_segment(df, d, "t", "merged")
        sid = S.commit_snapshot_rebase(
            d, replaces={"t": [rep]}, base_head=base
        )
        m = S.read_manifest(d, sid)
        assert m["tables"]["t"] == ["segments/t/merged"]
        assert m["tables"]["u"] == ["segments/u/u0"]  # winner kept

    def test_replay_append_is_noop(self, spark, tmp_path):
        d = str(tmp_path / "cat")
        _mk_catalog(spark, d, [(1, 10)], name="s0")
        sid = S.commit_snapshot_rebase(
            d, appends={"t": ["segments/t/s0"]}, base_head=0
        )
        assert sid == 0  # segment already listed: no empty commit
        assert S.committed_snapshot_ids(d) == [0]

    def test_ingest_and_compaction_threads_both_commit(
        self, spark, tmp_path
    ):
        """The verdict's done-criteria: an ingest thread (6 catalog sink
        batches) and a compaction thread (3 compactions) race on one
        catalog WITHOUT manual retry; no document is lost or duplicated
        and the final stats row equals the corpus."""
        import threading

        from bigdata_group4_app_spark.streaming.sinks import (
            catalog_commit_step,
        )

        d = str(tmp_path / "cat")
        # bootstrap so the compactor always has a head to read
        catalog_commit_step(
            spark.createDataFrame(
                [(0, "seed")], "doc_id long, text string"
            ),
            d,
        )
        batches = [
            [(10 * b + i, f"doc-{10 * b + i}") for i in range(4)]
            for b in range(1, 7)
        ]
        errs: list[Exception] = []

        def ingest():
            try:
                for rows in batches:
                    catalog_commit_step(
                        spark.createDataFrame(
                            rows, "doc_id long, text string"
                        ),
                        d,
                    )
            except Exception as e:  # pragma: no cover - fail loudly
                errs.append(e)

        def compactor():
            try:
                for i in range(3):
                    S.compact_table(spark, d, "documents", f"c{i}")
            except Exception as e:  # pragma: no cover - fail loudly
                errs.append(e)

        t1 = threading.Thread(target=ingest)
        t2 = threading.Thread(target=compactor)
        t1.start(); t2.start(); t1.join(); t2.join()
        assert errs == []

        expect = {0} | {r[0] for rows in batches for r in rows}
        docs = S.read_snapshot_table(spark, d, "documents")
        got = [r["doc_id"] for r in docs.collect()]
        assert len(got) == len(expect), "duplicate or lost documents"
        assert set(got) == expect
        st = S.read_snapshot_table(spark, d, "doc_stats").collect()
        assert len(st) == 1
        assert st[0]["n_docs"] == len(expect)
        total_chars = len("seed") + sum(
            len(r[1]) for rows in batches for r in rows
        )
        assert st[0]["n_chars"] == total_chars

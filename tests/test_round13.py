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

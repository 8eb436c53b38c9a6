"""Round-11 additions: VERDICT r10 items (segment-store version-claim
race, snapshot diff over real committed versions, table-snapshot
catalog) and ADVICE r10 regression pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


class TestSegmentVersionClaim:
    """VERDICT r10 item 3 / ADVICE r10: ingest and compaction used to
    allocate the next segment as committed[-1]+1 — a compaction racing
    an ingest step could pick the SAME version directory and interleave
    member writes, committing a mixed-member segment. The fix makes
    directory CREATION the claim (atomic os.mkdir over ALL existing
    v* dirs); these tests pin mutual exclusion and the interleaved
    end-to-end protocol."""

    def test_claim_is_exclusive_and_monotonic(self, tmp_path):
        import os

        from bigdata_group4_app_spark.streaming.sinks import _claim_version

        state = str(tmp_path / "s")
        # seed: committed v0, v1; an uncommitted ORPHAN v2 (crashed
        # writer) — the claim must never reuse the orphan either
        for v in (0, 1):
            os.makedirs(f"{state}/v{v}")
            open(f"{state}/v{v}/_SUCCESS", "w").close()
        os.makedirs(f"{state}/v2")

        a = _claim_version(state)  # "compaction" claims
        b = _claim_version(state)  # "ingest" claims concurrently
        assert a != b
        assert a == 3 and b == 4  # both past ALL existing dirs, incl. orphan
        assert os.path.isdir(f"{state}/v{a}") and os.path.isdir(f"{state}/v{b}")

    def test_claim_bootstraps_empty_state(self, tmp_path):
        from bigdata_group4_app_spark.streaming.sinks import _claim_version

        state = str(tmp_path / "fresh")
        assert _claim_version(state) == 0
        assert _claim_version(state) == 1

    def test_compaction_racing_ingest_cannot_mix_segments(
        self, spark, tmp_path
    ):
        """Deterministic interleave of the exact r10 race: compaction
        CLAIMS its output slot, then an ingest step runs to completion
        (claiming the NEXT slot), then the compaction finishes and
        commits. Under the old committed[-1]+1 rule both writers picked
        the same v{n}; now the directories are disjoint, the ingest
        segment stays live (it is not in the compaction manifest), and
        the reader sees every doc exactly once."""
        import os

        from .test_round10 import _mh_split
        from bigdata_group4_app_spark.streaming.sinks import (
            _claim_version,
            _live_versions,
            compact_minhash_index,
            minhash_index_step,
            read_minhash_index,
        )

        state = str(tmp_path / "mh_state")
        corpus, batch = _mh_split(spark, SF_SMOKE)
        sub0 = corpus.filter(F.col("doc_id") % 2 == 0)
        sub1 = corpus.filter(F.col("doc_id") % 2 == 1)
        minhash_index_step(sub0, state)
        minhash_index_step(sub1, state)
        assert _live_versions(state) == [0, 1]

        # nightly compaction starts: claims its slot and snapshots its
        # live inputs...
        compact_slot = _claim_version(state)
        compact_inputs = [0, 1]
        assert compact_slot == 2
        # ...and a concurrent micro-batch ingest commits meanwhile:
        # its claim MUST land on a different directory
        minhash_index_step(batch, state)
        assert _live_versions(state) == [0, 1, 3]
        # compaction finishes into its pre-claimed slot against its
        # pre-ingest input snapshot
        retired = compact_minhash_index(
            spark,
            state,
            claimed_version=compact_slot,
            input_versions=compact_inputs,
        )
        assert retired == [0, 1]

        # no mixed-member directory: the compacted segment and the
        # ingest segment are disjoint dirs, both committed
        assert os.path.exists(f"{state}/v2/_SUCCESS")
        assert os.path.exists(f"{state}/v3/_SUCCESS")
        assert _live_versions(state) == [2, 3]

        # reader equivalence: every doc exactly once
        sh, bands = read_minhash_index(spark, state)
        doc_counts = (
            bands.select("doc_id").distinct().count()
        )
        all_ids = {
            r["doc_id"]
            for df in (corpus, batch)
            for r in df.select("doc_id").collect()
        }
        assert doc_counts == len(all_ids)
        # shingle rows per doc identical to a race-free replay
        ref_state = str(tmp_path / "mh_ref")
        minhash_index_step(sub0, ref_state)
        minhash_index_step(sub1, ref_state)
        minhash_index_step(batch, ref_state)
        ref_sh, _ = read_minhash_index(spark, ref_state)
        assert sorted(map(tuple, sh.collect())) == sorted(
            map(tuple, ref_sh.collect())
        )

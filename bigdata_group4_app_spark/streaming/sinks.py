"""Operational stream sinks via ``foreachBatch``.

``foreachBatch`` hands each micro-batch to arbitrary batch-DataFrame
logic — the escape hatch for sink behaviors Structured Streaming lacks
natively (upsert/merge, multi-sink fan-out, cross-batch dedup against
what's already on disk). Combined with the checkpoint's batch-id-based
replay, an idempotent write function gives end-to-end exactly-once
delivery over an at-least-once source.

At scale the anti-join against written keys would target a key index
(Delta MERGE, a key-bucketed table, or a bloom-filter sidecar) rather
than re-scanning the sink — the hook and semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def start_dedup_append_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
):
    """Append-only parquet sink that never writes a key twice: dedup
    within the batch, anti-join against keys already on disk, append the
    remainder. Replayed batches (restart between write and commit) become
    no-ops, upgrading at-least-once replay to exactly-once output."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_cols)
        try:
            existing = spark.read.parquet(out_dir).select(*key_cols).distinct()
            fresh = fresh.join(existing, key_cols, "left_anti")
        except AnalysisException:
            pass  # first batch: sink directory doesn't exist yet
        fresh.write.mode("append").parquet(out_dir)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _latest_state_version(state_dir: str) -> int | None:
    """Highest COMMITTED state version under ``state_dir`` (a version is
    committed iff its _SUCCESS marker exists — a crash mid-write leaves
    a marker-less directory that is simply ignored and overwritten on
    replay). Local-FS pointer logic; on a real lake this whole
    versioning concern is what a Delta/Iceberg transactional MERGE
    replaces."""
    import os

    if not os.path.isdir(state_dir):
        return None
    best = None
    for d in os.listdir(state_dir):
        if (
            d.startswith("v")
            and d[1:].isdigit()
            and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
        ):
            best = int(d[1:]) if best is None else max(best, int(d[1:]))
    return best


def read_cdc_state(spark, state_dir: str) -> DataFrame | None:
    """The current compacted CDC state, or None before the first commit."""
    v = _latest_state_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(f"{state_dir}/v{v}")


def merge_cdc_state(batch_df: DataFrame, state_dir: str) -> None:
    """One CDC merge step: fold an events micro-batch into the compacted
    state table at ``state_dir`` under latest-wins + tombstone semantics
    (the batch twin is ``operators.advanced.cdc_merge_events``).

    Per key the winner between current state and the batch's newest row
    is chosen by (last_ts, last_event_id) — a TOTAL order, so replaying
    the same batch is a no-op (idempotent ⇒ exactly-once on top of
    checkpoint replay) and cross-batch reordering of non-tombstone rows
    converges to the same state regardless of chunking. Tombstones
    (``error``) delete the key and are NOT retained: an event arriving
    LATER than the tombstone's micro-batch but with an OLDER timestamp
    would resurrect the key — the standard retention trade; keep a
    tombstone log with a TTL where that matters.

    State is written to a NEW versioned subdirectory (v0, v1, ...) and
    readers follow the highest _SUCCESS-committed version — a crash
    mid-write can never destroy the previous state the way an in-place
    mode('overwrite') could (delete-then-fail leaves nothing); replay
    just rewrites the uncommitted version. The prior version is pruned
    only after the new one commits."""
    spark = batch_df.sparkSession
    cur = _latest_state_version(state_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        batch_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
        )
    )
    state = None if cur is None else spark.read.parquet(f"{state_dir}/v{cur}")
    if state is None:
        merged = latest
    else:
        s = state.select(*(F.col(c).alias(f"s_{c}") for c in state.columns))
        j = latest.join(s, latest.user_id == s.s_user_id, "full_outer")
        batch_wins = F.col("user_id").isNotNull() & (
            F.col("s_user_id").isNull()
            | (F.col("last_ts") > F.col("s_last_ts"))
            | (
                (F.col("last_ts") == F.col("s_last_ts"))
                & (F.col("last_event_id") > F.col("s_last_event_id"))
            )
        )
        merged = j.select(
            F.coalesce("user_id", "s_user_id").alias("user_id"),
            *(
                F.when(batch_wins, F.col(c))
                .otherwise(F.col(f"s_{c}"))
                .alias(c)
                for c in (
                    "last_type",
                    "last_value",
                    "last_ts",
                    "last_event_id",
                )
            ),
        )
    merged = merged.filter(F.col("last_type") != "error").localCheckpoint()
    nxt = 0 if cur is None else cur + 1
    merged.write.mode("overwrite").parquet(f"{state_dir}/v{nxt}")
    if cur is not None and cur >= 1:
        # prune versions older than the one we just superseded
        import shutil

        for old in range(cur):
            shutil.rmtree(f"{state_dir}/v{old}", ignore_errors=True)


def start_cdc_merge_sink(
    stream_df: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Streaming MERGE INTO: ``foreachBatch`` folds each micro-batch into
    a compacted keyed state table via :func:`merge_cdc_state` — the
    continuous form of the batch ``cdc_apply`` operator. At scale the
    overwrite becomes a Delta/Iceberg MERGE on the same join; the
    semantics and the idempotence argument are unchanged."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_cdc_state(batch_df, state_dir)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )

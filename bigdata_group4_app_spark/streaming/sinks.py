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

from pyspark.sql import DataFrame
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

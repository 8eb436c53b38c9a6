"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user totals across micro-batches: state = (n_events,
sum_value) per user_id, updated each batch, emitted in Update mode.
This is the pattern for any custom accumulator Spark's built-in aggs
can't express (decaying counters, custom sketches, per-key model state).

Scale notes: state lives in the executor-local state store partitioned
by the grouping key — the same hash partitioning as a batch groupBy, so
a 100 TB/day stream shards state across executors with no driver
involvement. Keys never expire here (NoTimeout) because user totals are
monotone; a sessionizing variant would set ProcessingTimeTimeout and
drop idle keys to bound state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user (Update output mode).

    The updater is a nested, self-contained closure (stdlib/pandas only):
    executor Python workers must be able to unpickle it without this
    package on their path.
    """

    def update_totals(key, pdf_iter, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        # raw sum out — rounding happens in-query below (Python round is
        # half-even; the repo convention is F.round half-up, CLAUDE.md)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    from pyspark.sql import functions as F

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    ).withColumn("sum_value", F.round("sum_value", 4))


TOPK_OUTPUT_SCHEMA = (
    "event_type string, user_id long, n_events long, rank int"
)
TOPK_K = 3


def streaming_topk_users(events: DataFrame, k: int = TOPK_K) -> DataFrame:
    """Per-event-type top-k users by event count, on Spark 4's
    ``transformWithStateInPandas`` (the arbitrary-state successor to
    applyInPandasWithState): a ``MapState`` keyed by user carries exact
    counts per (event_type, user), and each micro-batch emits the
    refreshed top-k rows for the types it touched.

    Why MapState and not one big dict in ValueState: MapState reads and
    writes are PER-ENTRY against the RocksDB state store, so a batch that
    touches 100 users of one type does 100 point-updates instead of
    rewriting a million-entry blob — the difference between O(batch) and
    O(state) I/O per trigger, which is the entire point of the new API.
    KNOWN LIMIT: the emission step still iterates the full MapState to
    rank the top-k, so per-trigger output cost is O(state) even though
    updates are O(batch) — the production swap keeps the current top-k
    and the k-th count in a ValueState and rescans only when an update
    beats that threshold (counts are monotone). Kept simple here because
    the operator is environment-gated (protobuf absent) and unrunnable
    in this container.
    State is exact (no sketch), sharded by the grouping key across
    executors; a cardinality-bounded variant would swap the map for a
    count-min + heap (see operators/sketches.py::cms_heavy_hitters for
    the batch twin).

    The processor class is defined inside this function so cloudpickle
    ships it by value — executor Python workers never import this
    package (repo closure rule).

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` package (the TWS state server speaks protobuf to the
    Python worker). This container lacks protobuf, so the operator is
    exercised by an import-gated test (skips cleanly) — on a real
    cluster image both are standard.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "user_id long", "n long"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            batch_counts: dict = {}
            for pdf in rows:
                for uid, cnt in pdf["user_id"].value_counts().items():
                    batch_counts[int(uid)] = (
                        batch_counts.get(int(uid), 0) + int(cnt)
                    )
            for uid, cnt in batch_counts.items():
                prev = (
                    self._counts.getValue((uid,))[0]
                    if self._counts.containsKey((uid,))
                    else 0
                )
                self._counts.updateValue((uid,), (prev + cnt,))
            top = sorted(
                ((uk[0], v[0]) for uk, v in self._counts.iterator()),
                key=lambda t: (-t[1], t[0]),
            )[:k]
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(top),
                    "user_id": [t[0] for t in top],
                    "n_events": [t[1] for t in top],
                    "rank": list(range(1, len(top) + 1)),
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=TopKProcessor(),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SES_OUTPUT_SCHEMA = "user_id long, n_seen long, ses double"
SES_STATE_SCHEMA = "n long, s double"


def streaming_ses(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming exponential smoothing per user — the unbounded-stream
    form of the batch ``ses_user_forecast`` fold (state = one double per
    key instead of a per-key array).

    Each micro-batch's rows are folded in (ts, event_id) order on top of
    the carried state; with a time-ordered source the final state equals
    the batch fold over the whole history (pinned by a stream-batch
    parity test). Out-of-order arrivals WITHIN a micro-batch are handled
    by sorting the WHOLE batch (chunks concatenated first — chunk order
    is arbitrary); late rows across batches are folded late — SES is not
    reorder-invariant, so a strict source needs watermark+sort upstream.
    State is 2 scalars per key in the executor state store; NoTimeout
    because the smoothed value must survive idle periods.

    CHANGELOG: the state schema shrank from 4 fields to 2 (``n long,
    s double``) when the redundant carried columns were dropped.
    applyInPandasWithState checkpoints are schema-pinned — a query
    restarted from a checkpoint written under the old 4-field schema
    fails state-schema validation; restart ``streaming_ses`` with a
    FRESH checkpoint directory after upgrading across that change.
    """

    def update_ses(key, pdf_iter, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        # CONCATENATE the Arrow chunks before sorting: a group whose
        # micro-batch spans several chunks (maxRecordsPerBatch) arrives
        # in arbitrary chunk order, and SES is reorder-sensitive — a
        # per-chunk sort would fold later rows first
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        for row in batch.sort_values(["ts", "event_id"]).itertuples():
            x = float(row.value)
            s = x if n == 0 else alpha * x + (1 - alpha) * s
            n += 1
        state.update((n, s))
        # raw s out — F.round applies in-query below (CLAUDE.md)
        yield pd.DataFrame({"user_id": [key[0]], "n_seen": [n], "ses": [s]})

    from pyspark.sql import functions as F

    return events.groupBy("user_id").applyInPandasWithState(
        update_ses,
        SES_OUTPUT_SCHEMA,
        SES_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    ).withColumn("ses", F.round("ses", 4))

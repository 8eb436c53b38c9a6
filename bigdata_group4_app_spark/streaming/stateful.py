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
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

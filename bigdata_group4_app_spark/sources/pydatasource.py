"""Custom batch source on Spark 4's Python DataSource API — the
engine-native answer to "read from a system Spark has no connector for"
(the reference's MongoDB pull is exactly this shape; reference
app_test.py:36-57).

Demonstrated capabilities, each load-bearing at scale:
  * ``partitions()`` — the source declares its own split plan, so reads
    parallelize across executors like any file scan (no single-threaded
    driver fetch, unlike the reference's ``collection.find``);
  * ``pushFilters()`` — equality filters on the partition column are
    handled INSIDE the source (whole shards skipped), the Python twin of
    parquet predicate pushdown; unsupported filters are returned so Spark
    re-applies them — correctness never depends on the source's cleverness
    (gate with ``spark.sql.python.filterPushdown.enabled``);
  * deterministic generation — rows are pure integer arithmetic on
    (partition, offset), so tests replay the exact expected relation.

The DataSource/Reader classes are built inside a factory function:
top-level classes pickle by module reference and executor Python workers
cannot import this package (repo closure rule) — nested classes ship by
value via cloudpickle.
"""

from __future__ import annotations

SYNTH_SOURCE_NAME = "synthetic_events"
SYNTH_SCHEMA = (
    "event_id long, user_id long, event_type string, value double"
)
SYNTH_TYPES = ("click", "view", "purchase", "signup", "error")


def make_synthetic_source():
    """Return the DataSource class (register with
    ``spark.dataSource.register(make_synthetic_source())``)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, index: int, type_filter):
            self.index = index
            self.type_filter = type_filter

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("numPartitions", 4))
            self.rows_per_part = int(options.get("rowsPerPartition", 100))
            self.type_filter = None

        def pushFilters(self, filters):
            # handle ONE shape natively: event_type = <literal>; everything
            # else is handed back for Spark to evaluate post-scan
            for f in filters:
                if (
                    isinstance(f, EqualTo)
                    and f.attribute == ("event_type",)
                    and self.type_filter is None
                ):
                    self.type_filter = f.value
                else:
                    yield f

        def partitions(self):
            return [
                _Part(i, self.type_filter) for i in range(self.n_parts)
            ]

        def read(self, partition):
            types = ("click", "view", "purchase", "signup", "error")
            base = partition.index * self.rows_per_part
            for off in range(self.rows_per_part):
                event_id = base + off
                event_type = types[event_id % 5]
                if (
                    partition.type_filter is not None
                    and event_type != partition.type_filter
                ):
                    continue
                yield (
                    event_id,
                    (event_id * 17) % 1000,
                    event_type,
                    ((event_id * 31) % 1000) / 100.0,
                )

    class SyntheticEventsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_events"

        def schema(self):
            return (
                "event_id long, user_id long, event_type string, "
                "value double"
            )

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

    return SyntheticEventsDataSource


def expected_rows(n_parts: int, rows_per_part: int, type_filter=None):
    """Driver-side replay of the generator — the test oracle."""
    out = []
    for event_id in range(n_parts * rows_per_part):
        event_type = SYNTH_TYPES[event_id % 5]
        if type_filter is not None and event_type != type_filter:
            continue
        out.append(
            (
                event_id,
                (event_id * 17) % 1000,
                event_type,
                ((event_id * 31) % 1000) / 100.0,
            )
        )
    return out

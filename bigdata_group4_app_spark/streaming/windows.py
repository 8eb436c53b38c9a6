"""Structured Streaming surface over the ``events`` table.

The reference has no streaming at all (SURVEY.md §2.10 — Streamlit reruns
are UI events, not data streams); this module is the beyond-reference
stream path the driver's ``events`` table invites. Design:

  * the SAME logical aggregations exist in batch and stream form — the
    batch form (``event_sessions``, ``events_hourly`` in
    operators/relational.py) is DuckDB-oracle-checked; the stream form is
    asserted against the batch result in tests (stream-batch parity),
    which is exactly how Structured Streaming's incremental plans are
    meant to be validated.
  * watermarks bound state: an hourly tumbling window with a 2-hour
    watermark keeps O(active windows × event types) rows of state per
    partition regardless of total stream length — that is what survives
    a 100 TB/day firehose, where an unwatermarked agg would OOM state.
  * session windows use the native ``session_window`` operator (gap
    merge handled by Spark's state store, not custom code).

File-backed parquet streams are used for tests/demos; on a cluster the
source would be Kafka (`.readStream.format("kafka")`) with the identical
downstream plan — Structured Streaming plans are source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as SW
from pyspark.sql import functions as F

from ..session import tune_session
from ..sources.registry import load_table

SESSION_GAP_MIN = 30  # inactivity gap (minutes) — drives Spark AND oracles
SESSION_GAP = f"{SESSION_GAP_MIN} minutes"


def _duck_session_numbered(extra_cols: str = "") -> str:
    """The gaps-and-islands flagged→numbered CTE pair every session
    oracle shares, rendered from SESSION_GAP_MIN so tuning the gap can't
    desync the four oracles from the Spark operators. The numbering
    window orders by (ts, event_id) — a total order (same-timestamp
    events can't migrate across session boundaries)."""
    ec = f", {extra_cols}" if extra_cols else ""
    return f"""flagged AS (
  SELECT user_id, ts, event_id{ec},
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id{ec},
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)"""


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Mirrors ``load_table(..., "events")``: the read schema and any ns→µs
    truncation are chosen by sniffing the first file's footer, so both the
    TIMESTAMP(NANOS) and timestamp[us] testdata generations stream correctly.
    """
    from ..sources.registry import events_read_schema, normalize_events_ts

    tune_session(spark)
    df = spark.readStream.schema(events_read_schema(events_dir)).parquet(events_dir)
    return normalize_events_ts(df, events_dir)


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour window counts — streaming form of ``events_hourly``.

    The watermark lets the state store drop windows older than
    (max event time − 2h): bounded state, late data within 2h still
    lands in its window, later-than-that is dropped (documented policy).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    size: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding-window event rate (each event lands in size/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
        )
    )


def ohlc_bars_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form of ``ohlc_hourly_bars``: per (type, hour window),
    open/high/low/close via the same total-ordered min/max(struct)
    argmin/argmax aggregates — they are partial-aggregating, so the state
    store carries ONE candidate struct per open window per type, and the
    watermark closes windows exactly like the count aggregates. Parity
    with the batch operator is asserted in tests."""
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            first.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select(
            F.col("window.start").alias("bar_hour"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


def session_counts_stream(
    events: DataFrame, watermark: str = "2 hours", gap: str = SESSION_GAP
) -> DataFrame:
    """Per-user session aggregation with native session_window (state-store
    gap merging). Emits closed sessions once the watermark passes them."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "session_last", "n_events", "sum_value"
        )
    )


def attribution_stream_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding hour — the streaming form of the batch
    ``attribution_window_join``. Both sides carry watermarks and the join
    condition bounds event-time distance, so Spark can expire buffered
    rows once the watermark passes the interval: state is O(events within
    watermark+interval), not O(stream). Emits raw attributed pairs
    (append mode); the aggregation to per-purchase counts happens
    downstream (tested against the batch operator's pair count)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            "c_user_id = p_user_id AND "
            "c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"
        ),
    )


# ---------------------------------------------------------------------------
# batch session windows — the oracle-checked form
# ---------------------------------------------------------------------------


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap, batch mode.

    Native ``session_window`` works in batch too (sort + merge within the
    user partition — one shuffle on user_id, no state store). A new
    session starts when the gap since the previous event is >= 30 min,
    which the DuckDB oracle reproduces with gaps-and-islands
    (lag → flag → running sum → group).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id", "session_start", "session_last", "n_events", "sum_value"
        )
        .orderBy("user_id", "session_start")
    )


def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order session analytics: per user, how many sessions, how
    long, how dense — composed directly over the session-window relation
    (one extra small shuffle on user_id after the session agg)."""
    sessions = event_sessions(spark, sf_dir)
    dur = F.unix_micros("session_last") - F.unix_micros("session_start")
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
            F.round(F.avg(dur / 1_000_000.0), 4).alias("avg_session_secs"),
            F.round(F.max(dur / 1_000_000.0), 4).alias("max_session_secs"),
        )
        .orderBy("user_id")
    )


DISORDER_CHUNKS = 4096  # bounded CHUNK COUNT for the two-level prefix max


def watermark_sizing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How out-of-order is the stream — the measurement that SIZES a
    watermark. Treating ``event_id`` as arrival order, an event's
    lateness is ``max(ts of all earlier arrivals) − ts`` when positive;
    the p95/max of that distribution are the watermark delays at which
    ≤5% / 0% of events would be dropped by a watermarked aggregate.

    The running max over all earlier arrivals is computed as a two-level
    distributed prefix max (the ``peak_concurrent_sessions`` lever):
    chunk-partitioned running maxes in parallel plus a per-chunk-max
    carry window over |chunks| rows — no global sort, no single
    partition over the data. The strictly-preceding frame
    (UNBOUNDED PRECEDING .. -1 within chunk, carry from earlier chunks
    only) makes the first arrival exempt by construction. The DuckDB
    oracle runs the naive single-sequence window, so the decomposition
    is verified, not assumed.

    On the driver testdata the verdict is "perfectly ordered" (late
    share 0, NULL percentiles — a zero-delay watermark would drop
    nothing); the detection path itself is exercised in tests against a
    deterministically disordered copy of the stream.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    # chunk WIDTH scales with the data so the chunk COUNT stays bounded
    # (~DISORDER_CHUNKS): the level-2 carry window and its broadcast are
    # then O(4096) rows at ANY stream length — a fixed-width chunk would
    # make level 2 grow linearly with N (single reducer + giant
    # broadcast at 1e12 events). Chunking choice never changes the
    # result (any chunking yields the same prefix max), only the plan.
    bounds = ev.agg(F.max("event_id").alias("max_id"))
    width = F.greatest(
        F.lit(1), (F.col("max_id") / DISORDER_CHUNKS + 1).cast("long")
    )
    ev = ev.join(F.broadcast(bounds)).withColumn("cw", width).drop("max_id")
    chunk = (F.col("event_id") / F.col("cw")).cast("long")
    w_local = (
        SW.partitionBy("chunk")
        .orderBy("event_id")
        .rowsBetween(SW.unboundedPreceding, -1)
    )
    local = ev.withColumn("chunk", chunk).withColumn(
        "local_max", F.max("us").over(w_local)
    )
    per_chunk = local.groupBy("chunk").agg(F.max("us").alias("chunk_max"))
    w_carry = (
        SW.orderBy("chunk").rowsBetween(SW.unboundedPreceding, -1)
    )
    carry = per_chunk.select(
        "chunk", F.max("chunk_max").over(w_carry).alias("carry_max")
    )
    lateness = (
        local.join(F.broadcast(carry), "chunk")
        .select(
            (
                F.greatest(
                    F.coalesce(F.col("local_max"), F.lit(-1)),
                    F.coalesce(F.col("carry_max"), F.lit(-1)),
                )
                - F.col("us")
            ).alias("late_us"),
            F.when(
                F.col("local_max").isNull() & F.col("carry_max").isNull(),
                1,
            )
            .otherwise(0)
            .alias("is_first"),
        )
        .filter(F.col("is_first") == 0)
    )
    late = F.when(F.col("late_us") > 0, F.col("late_us"))
    return lateness.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
        F.round(
            F.sum((F.col("late_us") > 0).cast("long"))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("late_share"),
        F.round(F.expr("percentile(CASE WHEN late_us > 0 THEN late_us END, 0.95)") / 1_000_000.0, 4).alias(
            "p95_lateness_s"
        ),
        F.round(F.max(late) / 1_000_000.0, 4).alias("max_lateness_s"),
    )


PATH_TOP_K = 20


def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 within-session event-type trigrams — the path-mining query
    behind "what do users do right before purchasing?".

    Sessions come from the native ``session_window`` aggregate; each
    session's ordered type sequence is built with
    ``sort_array(collect_list(struct(ts, event_id, type)))`` — the
    struct's (ts, event_id) prefix makes the sort a total order, which is
    what makes ``collect_list`` (unordered by contract) deterministic.
    Trigram expansion is a map-side ``transform(sequence(...))`` over the
    per-session array (codegen, no UDF); the global top-k is
    TakeOrdered on (count DESC, trigram) — deterministic inclusion, no
    full sort. Per-session arrays are bounded by session length (30-min
    gap), so the collect_list state is small at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        F.session_window("ts", SESSION_GAP), F.col("user_id")
    ).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    tris = sess.select(
        F.explode(
            F.expr(
                "CASE WHEN size(evs) >= 3 THEN "
                "transform(sequence(0, size(evs) - 3), i -> "
                "concat_ws('>', evs[i].event_type, evs[i+1].event_type, "
                "evs[i+2].event_type)) "
                "ELSE array() END"
            )
        ).alias("trigram")
    )
    return (
        tris.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(PATH_TOP_K)
    )


def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak number of concurrently open sessions — the capacity-
    planning number sessionization exists to answer.

    Sweep-line over session intervals, built as a distributed two-level
    prefix sum: each session emits (+1 at start, −1 at last-event)
    boundary rows; a day-partitioned running sum (ties peer-grouped by
    the default RANGE frame, +1 sorted before −1 so touching sessions
    count as concurrent) gives within-day concurrency in parallel, and a
    second window over the |days|-row per-day totals adds each day's
    carry-in from every earlier day. No single global sort ever happens —
    the only unpartitioned window runs on one row per day. The DuckDB
    oracle computes the same numbers with the naive single-sequence
    running sum, so the decomposition itself is what gets verified.

    A session spanning midnight contributes its open interval to the next
    day through the carry, exactly like the global form.
    """
    # rebuild the session bounds WITHOUT event_sessions' presentation
    # ORDER BY: materializing through that global sort would execute a
    # range-shuffle over every session row, contradicting the
    # no-global-sort design — the sweep re-orders everything anyway
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
        )
        .select("session_start", "session_last")
        .persist()  # feeds both boundary branches: plan/execute once
        # (construction-lazy cache, round 10 — was an eager checkpoint)
    )
    boundaries = sessions.select(
        F.col("session_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sessions.select(
            F.col("session_last").alias("t"), F.lit(-1).alias("delta")
        )
    )
    day = F.to_date("t").alias("day")
    w_day = SW.partitionBy("day").orderBy(F.col("t"), F.col("delta").desc())
    local = boundaries.select(day, "t", "delta").withColumn(
        "run", F.sum("delta").over(w_day)
    )
    per_day = local.groupBy("day").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
            "sessions_started"
        ),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias(
            "sessions_ended"
        ),
        F.max("run").alias("local_peak"),
        F.sum("delta").alias("day_delta"),
    )
    w_carry = (
        SW.orderBy("day")
        .rowsBetween(SW.unboundedPreceding, -1)
    )
    carry = F.coalesce(F.sum("day_delta").over(w_carry), F.lit(0))
    return (
        per_day.select(
            "day",
            "sessions_started",
            "sessions_ended",
            (carry + F.col("local_peak")).alias("peak_concurrency"),
        )
        .orderBy("day")
    )


ORACLE: dict[str, str] = {
    "watermark_sizing_stats": f"""
WITH arr AS (
  SELECT event_id, epoch_us(ts) AS us,
    max(epoch_us(ts)) OVER (ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
  FROM events
),
lateness AS (
  SELECT prev_max - us AS late_us FROM arr WHERE prev_max IS NOT NULL
)
SELECT count(*) AS n_events,
  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  round(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE), 4) AS late_share,
  round(quantile_cont(CASE WHEN late_us > 0 THEN late_us END, 0.95)
        / 1000000.0, 4) AS p95_lateness_s,
  round(max(CASE WHEN late_us > 0 THEN late_us END) / 1000000.0, 4)
    AS max_lateness_s
FROM lateness
""",
    "session_path_trigrams": f"""
WITH {_duck_session_numbered("event_type")},
sess AS (
  SELECT list(event_type ORDER BY ts, event_id) AS t
  FROM numbered GROUP BY user_id, session_id
),
tris AS (
  SELECT unnest(
    CASE WHEN len(t) >= 3 THEN
      list_transform(generate_series(1, len(t) - 2),
                     i -> t[i] || '>' || t[i + 1] || '>' || t[i + 2])
    ELSE [] END) AS trigram
  FROM sess
)
SELECT trigram, count(*) AS n
FROM tris
GROUP BY trigram
ORDER BY n DESC, trigram
LIMIT {PATH_TOP_K}
""",
    "peak_concurrent_sessions": f"""
WITH {_duck_session_numbered()},
sessions AS (
  SELECT min(ts) AS session_start, max(ts) AS session_last
  FROM numbered GROUP BY user_id, session_id
),
boundaries AS (
  SELECT session_start AS t, 1 AS delta FROM sessions
  UNION ALL
  SELECT session_last AS t, -1 AS delta FROM sessions
),
swept AS (
  SELECT CAST(t AS DATE) AS day, delta,
    sum(delta) OVER (ORDER BY t, delta DESC) AS run
  FROM boundaries
)
SELECT day,
  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS sessions_started,
  CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
    AS sessions_ended,
  CAST(max(run) AS BIGINT) AS peak_concurrency
FROM swept
GROUP BY day
ORDER BY day
""",
    "user_session_stats": f"""
WITH {_duck_session_numbered()},
sessions AS (
  SELECT user_id,
    count(*) AS n_events,
    (epoch_us(CAST(max(ts) AS TIMESTAMP)) - epoch_us(CAST(min(ts) AS TIMESTAMP)))
      / CAST(1000000 AS DOUBLE) AS dur_secs
  FROM numbered
  GROUP BY user_id, session_id
)
SELECT user_id,
  count(*) AS n_sessions,
  round(avg(n_events), 4) AS avg_events_per_session,
  round(avg(dur_secs), 4) AS avg_session_secs,
  round(max(dur_secs), 4) AS max_session_secs
FROM sessions
GROUP BY user_id
ORDER BY user_id
""",
    "event_sessions": f"""
WITH {_duck_session_numbered("value")}
SELECT user_id,
  min(ts) AS session_start,
  max(ts) AS session_last,
  count(*) AS n_events,
  round(sum(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
}

QUERIES = {
    "event_sessions": event_sessions,
    "user_session_stats": user_session_stats,
    "peak_concurrent_sessions": peak_concurrent_sessions,
    "watermark_sizing_stats": watermark_sizing_stats,
    "session_path_trigrams": session_path_trigrams,
}


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark batch twin — keep-first-within-horizon chain
# ---------------------------------------------------------------------------

DEDUP_HORIZON_MIN = 10  # state lifetime: dups within 10 min of a KEPT row drop
DEDUP_BUCKETS = 32  # coarse applyInPandas buckets (CLAUDE.md grouped-map lever)


def watermark_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``dropDuplicatesWithinWatermark(["user_id",
    "event_type"])`` with a 10-minute delay: per (user, type) the FIRST
    event is kept and every later event inside 10 min of the LAST KEPT
    one is dropped — the keep-chain then restarts. This is the true
    streaming-state semantic (state = one timestamp per key, expiring at
    kept_ts + delay), NOT gaps-and-islands: a continuous sub-10-min
    drizzle longer than the horizon re-keeps every 10 min here, whereas
    island-dedup would drag the first key across the whole drizzle.

    The chain is inherently sequential per key, so the Spark side is an
    Arrow-batched ``applyInPandas`` over COARSE hash buckets (32 buckets,
    keys looped inside the closure — many tiny groups would pay a
    per-group Arrow round-trip, CLAUDE.md), exactly the state-store
    shape: one shuffle by bucket, O(1) carried state per key. The DuckDB
    oracle replays the identical chain as a recursive CTE (first kept
    per key UNION ALL next-event-past-horizon via LATERAL LIMIT 1) —
    recursion depth = longest keep chain, bounded by span/horizon, not
    data volume. Emits the per-type dedup ledger (events/kept/dropped/
    drop-rate), the contract a streaming dedup is sized against.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )

    def keep_chain(pdf):
        import numpy as np
        import pandas as pd

        # ONE sorted pass with a dict of last-kept timestamps — a pandas
        # groupby over thousands of tiny (user, type) groups is pure
        # per-group overhead (measured ~2x on this closure); int64
        # nanoseconds avoid per-row Timestamp object allocation
        horizon = 10 * 60 * 1_000_000_000  # ns
        pdf = pdf.sort_values(["user_id", "event_type", "ts", "event_id"])
        ts = pdf["ts"].values.astype("datetime64[ns]").astype(np.int64)
        out = []
        last: dict = {}
        for uid, et, t in zip(pdf["user_id"].values, pdf["event_type"].values, ts):
            key = (uid, et)
            lk = last.get(key)
            if lk is None or t >= lk + horizon:
                out.append(et)
                last[key] = t
        return pd.DataFrame({"event_type": out})

    kept = (
        ev.groupBy(
            (F.col("user_id") % DEDUP_BUCKETS).alias("bkt")
        )
        .applyInPandas(keep_chain, schema="event_type string")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    totals = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        totals.join(kept, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_kept",
            (F.col("n_events") - F.col("n_kept")).alias("n_dropped"),
            F.round(
                (F.col("n_events") - F.col("n_kept"))
                / F.col("n_events").cast("double"),
                4,
            ).alias("drop_rate"),
        )
        .orderBy("event_type")
    )


ORACLE["watermark_dedup_stats"] = f"""
WITH RECURSIVE kept AS (
  SELECT user_id, event_type, ts, event_id FROM (
    SELECT user_id, event_type, ts, event_id,
      row_number() OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts, n.event_id
  FROM kept k, LATERAL (
    SELECT e.user_id, e.event_type, e.ts, e.event_id
    FROM events e
    WHERE e.user_id = k.user_id AND e.event_type = k.event_type
      AND e.ts >= k.ts + INTERVAL {DEDUP_HORIZON_MIN} MINUTE
    ORDER BY e.ts, e.event_id
    LIMIT 1
  ) n
),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY event_type
),
totals AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type
)
SELECT t.event_type, t.n_events, p.n_kept,
  t.n_events - p.n_kept AS n_dropped,
  round(CAST(t.n_events - p.n_kept AS DOUBLE) / t.n_events, 4) AS drop_rate
FROM totals t JOIN per_type p ON p.event_type = t.event_type
ORDER BY t.event_type
"""
QUERIES["watermark_dedup_stats"] = watermark_dedup_stats

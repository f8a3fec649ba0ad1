"""Batch twins of the streaming operators (SURVEY.md §2B streaming).

Structured Streaming's windowed aggregations have exact batch
equivalents — same F.window / F.session_window expressions over a
static DataFrame. Declaring the batch twins gives the windowing
semantics a DuckDB oracle; the *live* streaming versions of the same
pipelines (file-source micro-batches, watermarks, late-data drops,
stateful dedup) live in vectordb_agentic_rag_spark/streaming/ and are
registered as rows-only checks.

Window alignment note: Spark tumbling/sliding windows align to the
unix epoch, so the oracle reproduces them with integer microsecond
bucketing (epoch_us // width * width) — exact, no float time math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

_US_15M = 15 * 60 * 1_000_000
_US_1H = 60 * 60 * 1_000_000
_US_30M = 30 * 60 * 1_000_000


@query(
    "stream_tumbling_count",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // {_US_1H}) * {_US_1H}) AS window_start,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window x event_type (the canonical streaming agg;
    R16's incremental rendering analogue). Uses F.window so the
    expression is literally the one the live streaming job runs."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT make_timestamp((epoch_us(ts) // {_US_15M}) * {_US_15M} - g * {_US_15M}) AS window_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]::BIGINT[]) AS g) offsets)
    SELECT window_start, event_type, count(*) AS n
    FROM slid GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour wide, 15-minute slide — every event lands
    in exactly 4 windows. The oracle materializes the 4 offsets
    explicitly; Spark's F.window does the same expansion internally."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_US_30M}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (F.session_window). Session end = last event + gap. An event at
    exactly gap distance still MERGES (Spark splits only on
    strictly-greater gaps — pinned by tests/test_streaming.py), so the
    oracle's gaps-and-islands SQL starts sessions on `> gap`."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup_batch",
    oracle="""
    SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
)
def stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming dropDuplicates on (user_id, event_type):
    the keeper is the first event (min event_id) — what the streaming
    state store retains. n_dups shows the dedup factor."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dups")
    )


@query(
    "pipeline_event_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS then_clicked,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS then_purchased
    FROM firsts
    """,
)
def pipeline_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence funnel (view -> click -> purchase, strictly
    ordered by first timestamps): the canonical product-analytics
    composite. ONE conditional-aggregation shuffle on user_id computes
    all three stages — no joins, no per-stage passes; at 100 TB the
    per-user partial aggregates combine map-side exactly like any hash
    agg. NULL-safe by construction: a missing stage yields NULL and
    three-valued logic drops the user from later stages (oracle-pinned
    in scalar_null_suite's spirit)."""
    ev = table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("int")).cast("bigint").alias("viewed"),
        F.sum(clicked.cast("int")).cast("bigint").alias("then_clicked"),
        F.sum(purchased.cast("int")).cast("bigint").alias("then_purchased"),
    )


@query(
    "stream_window_distinct_users",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def stream_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed DISTINCT aggregation — audience counting per tumbling
    hour x type, the companion to stream_tumbling_count (which counts
    events, not actors). Distinct shuffles (type, hour, user) triples
    exactly once; in the live Structured Streaming form the same query
    runs with approx_count_distinct (exact distinct needs full state
    per window — the sketch is the streaming-correct trade, its batch
    exactness covered here by the oracle on the identical windowing)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )

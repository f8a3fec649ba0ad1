"""Window-function operators (SURVEY.md §2B).

The reference's windowing is implicit: the chat-memory sliding window
keeps the last 10 messages (app.py:113) and retrieval keeps per-query
top-k (app.py:264). These operators give the full analytic-window
surface. Scale note: every window here partitions by a key (user_id /
order key), so the only exchange is one hash partition — the frame
computation is local to each partition. Unpartitioned ordered windows
(running totals over a global order) use a range exchange; at 100 TB
you'd pre-aggregate per day first, which is how win_running_total_range
is phrased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "win_rank_topk_per_group",
    oracle="""
    SELECT user_id, event_id, ts, event_type, rn FROM (
      SELECT user_id, event_id, ts, event_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
)
def win_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 events per user (BASELINE.md win_rank_events; the R10
    'last N messages' analogue, app.py:113). row_number over a unique
    (ts, event_id) order for determinism."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "ts", "event_type", "rn")
    )


@query(
    "win_lag_lead_delta",
    oracle="""
    SELECT user_id, event_id, ts,
           lag(ts) OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user via lag/lead. Gap computed in exact
    integer microseconds (unix_micros == DuckDB epoch_us) — never
    float seconds, which would be precision-lossy at ns-scale inputs."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_micros("ts") - F.unix_micros(prev_ts)).alias("gap_us"),
    )


@query(
    "win_moving_avg_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                      OVER w AS DOUBLE) / count(*) OVER w, 6) AS mov_avg_7
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of event value per user. DECIMAL sum inside
    the frame keeps the result order-independent and oracle-exact."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("*").over(w),
            6,
        ).alias("mov_avg_7"),
    )


@query(
    "win_running_total_range",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (ORDER BY o_orderdate
                            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 2) AS running_rev
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def win_running_total_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue by order date with RANGE-frame semantics:
    same-date orders are peers and contribute together. Implemented
    scale-first: RANGE UNBOUNDED..CURRENT over o_orderdate depends
    only on the DAY, so pre-aggregate revenue per day (map-side
    partial agg over the fact table), run the ordered cumulative
    window over the day DOMAIN (thousands of rows at any corpus
    size — never a single-partition sort of the fact table), and
    broadcast-join the day-level cumsum back onto the orders. The
    decimal day sums are exact, so this equals the per-row RANGE
    window bit-for-bit; the oracle keeps the textbook RANGE form."""
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_rev")
    )
    wd = Window.orderBy("o_orderdate").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "o_orderdate", F.sum("day_rev").over(wd).alias("cum_rev")
    )
    return o.join(F.broadcast(cum), "o_orderdate").select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("cum_rev").cast("double"), 2).alias("running_rev"),
    )


@query(
    "win_ntile_rank_dense",
    oracle="""
    SELECT p_partkey, p_size,
           CAST(rank() OVER (ORDER BY p_size) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (ORDER BY p_size) AS INTEGER) AS drnk,
           CAST(ntile(4) OVER (ORDER BY p_size, p_partkey) AS INTEGER) AS quartile
    FROM part
    """,
)
def win_ntile_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over p_size (real ties exercise the gap vs no-gap
    semantics); ntile over a unique order so bucket assignment is
    deterministic. Global window BY CONTRACT: the input is the bounded
    `part` dimension and the scan carries only the 2 rank-key columns
    (pinned by test_dim_rank_windows_scan_only_dim_columns); a fact
    column would use the two-pass value-domain rank instead
    (pipeline_shard_assign)."""
    p = table(spark, sf_dir, "part")
    w_ties = Window.orderBy("p_size")
    w_uniq = Window.orderBy("p_size", "p_partkey")
    return p.select(
        "p_partkey",
        "p_size",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_uniq).alias("quartile"),
    )


@query(
    "win_percent_rank_cume_dist",
    oracle="""
    SELECT p_partkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM part
    WINDOW w AS (ORDER BY p_retailprice, p_partkey)
    """,
)
def win_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank analytics (percent_rank / cume_dist / decile)
    over part prices. Global ORDER BY window BY CONTRACT — the input is
    the bounded `part` dimension and the scan reads only the 2 rank-key
    columns (pinned by test_dim_rank_windows_scan_only_dim_columns);
    for a 100 TB fact column the same statistics come from
    approx_percentile buckets (agg_percentiles) or the two-pass
    value-domain rank (pipeline_shard_assign)."""
    p = table(spark, sf_dir, "part")
    w = Window.orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT user_id, event_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
           nth_value(event_type, 2) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value navigation: each user's first, last, and
    second event type. last/nth need the full-frame
    (unboundedFollowing) spec — the default running frame would return
    the CURRENT row for last_value, the classic window-function trap
    (pinned here so it can't regress)."""
    ev = table(spark, sf_dir, "events")
    running = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = running.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(running).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.nth_value("event_type", 2).over(full).alias("second_type"),
    )


@query(
    "win_gap_fill_forward",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1, 2),
    spans AS (
      SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans),
    filled AS (
      SELECT s.user_id, s.day, coalesce(d.n, 0) AS n, d.value_cents
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, day, n,
           last_value(value_cents IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_cents_ffill
    FROM filled
    """,
)
def win_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: per-user daily rollup, a generated date
    spine covering each user's own [min_day, max_day] (sequence +
    explode — the spine is derived per key, never a global cross
    join), missing days 0-filled, and the day's value forward-filled
    with last(ignorenulls) over an ordered per-user frame. The shape
    every feature-store backfill needs; partitioning is by user key
    throughout, so 100 TB of events gap-fill with one shuffle for the
    rollup and one for the window. Money stays in integer cents so the
    forward-fill carries exact values."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    filled = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        "day",
        "n",
        F.last("value_cents", ignorenulls=True).over(w).alias("value_cents_ffill"),
    )


@query(
    "win_sequence_match_funnel",
    oracle="""
    WITH conv AS (
      SELECT p.user_id, p.event_id
      FROM events p
      WHERE p.event_type = 'purchase' AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts < p.ts
          AND EXISTS (
            SELECT 1 FROM events v
            WHERE v.user_id = c.user_id AND v.event_type = 'view'
              AND v.ts < c.ts)))
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_seq_users,
           CAST(count(*) AS BIGINT) AS n_converted_purchases
    FROM conv
    """,
)
def win_sequence_match_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE sequence-match funnel (the MATCH_RECOGNIZE analogue Spark
    SQL lacks): a purchase converts iff SOME click strictly before it
    has SOME view strictly before that — an ordered subsequence match,
    not pipeline_event_funnel's first-occurrence approximation (which
    misses a click-after-view when an earlier stray click exists).

    The relational phrasing is a cubic nested-EXISTS (the oracle); the
    engine runs it as TWO chained running-flag windows over ONE
    user_id shuffle + sort — strictly linear in events per user:
    `any view before me` feeds `any qualified click before me` feeds
    the purchase rows. Strictness under timestamp ties is exact: the
    running flags use a RANGE frame on unix_micros ending at -1 µs, so
    same-instant events never satisfy 'before'."""
    ev = table(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    base = ev.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        t_us.alias("t_us"),
    )
    w_before = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_view = (F.col("event_type") == "view").cast("int")
    step1 = base.withColumn(
        "view_before", F.coalesce(F.max(is_view).over(w_before), F.lit(0))
    )
    qual_click = (
        (F.col("event_type") == "click") & (F.col("view_before") == 1)
    ).cast("int")
    step2 = step1.withColumn(
        "qual_click_before",
        F.coalesce(F.max(qual_click).over(w_before), F.lit(0)),
    )
    conv = step2.where(
        (F.col("event_type") == "purchase") & (F.col("qual_click_before") == 1)
    )
    return conv.agg(
        F.countDistinct("user_id").alias("n_seq_users"),
        F.count("*").alias("n_converted_purchases"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS occ
      FROM events)
    SELECT user_id, event_id, ts,
           CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS distinct_types_seen
    FROM flagged
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING count-distinct per user (how many distinct event types
    has this user produced up to each event) — SQL has no
    count(DISTINCT) OVER, and the naive per-row set-rescan is
    quadratic. The linear formulation: flag each (user, type)'s FIRST
    occurrence with one row_number window, then a running sum of the
    flags — two windows, both on the user shuffle, strictly linear.
    The oracle uses the same first-occurrence formulation (it is plain
    SQL), so the check is a true cross-engine replay of the trick."""
    ev = table(spark, sf_dir, "events")
    w_occ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(w_occ).alias("occ"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum((F.col("occ") == 1).cast("int"))
        .over(w_run)
        .cast("bigint")
        .alias("distinct_types_seen"),
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT user_id, event_id, ts,
           round((list_extract(ls, (len(ls) + 1) // 2)
                  + list_extract(ls, len(ls) // 2 + 1)) / 2, 6) AS med_11
    FROM (
      SELECT user_id, event_id, ts,
             list_sort(list(value) FILTER (value IS NOT NULL) OVER w) AS ls
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) t
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 11-row rolling MEDIAN of event value per user — the
    robust-statistics twin of win_moving_avg_frame (outlier-resistant
    smoothing for monitoring/quality series). Spark's median() is not
    frame-capable, so the frame is materialized as a sorted array
    (collect_list over the 11-row frame — O(frame log frame) per row,
    frame length is a constant) and the median read with explicit
    middle-element arithmetic. BOTH engines sort the same doubles and
    evaluate the same (lo + hi) / 2 — never each engine's internal
    quantile interpolation, whose float fold order differs. The window
    is the one hash-partition shuffle on user_id; no global sort.
    NULL values: Spark's collect_list silently drops them, so the
    oracle's list() carries a FILTER (value IS NOT NULL) to keep frame
    lengths identical if the fixture ever grows NULL values."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sort_array(F.collect_list("value").over(w)).alias("ls"),
    )
    return base.select(
        "user_id",
        "event_id",
        "ts",
        F.expr(
            "round((element_at(ls, CAST((size(ls) + 1) div 2 AS INT)) "
            "+ element_at(ls, CAST(size(ls) div 2 + 1 AS INT))) / 2, 6)"
        ).alias("med_11"),
    )


@query(
    "win_zscore_outlier",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN n >= 5 AND var_v > 0
                THEN round((value - mean_v) / sqrt(var_v), 6) END AS z,
           CASE WHEN n >= 5 AND var_v > 0
                THEN abs((value - mean_v) / sqrt(var_v)) > 3 END AS is_outlier
    FROM (
      SELECT event_id, user_id, ts, value,
             count(*) OVER w AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               / count(*) OVER w AS mean_v,
             (CAST(sum(CAST(value AS DECIMAL(18,6))
                       * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
              - CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                * CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                / count(*) OVER w)
             / (count(*) OVER w - 1) AS var_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) t
    """,
)
def win_zscore_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag per user: each event scored against
    the mean/variance of its own TRAILING 20 events (frame excludes
    the current row, so a spike can't dilute its own baseline) —
    the streaming-monitoring primitive behind alerting and data-drift
    checks, batch-shaped. Fewer than 5 prior points or zero variance
    -> null (no verdict), never a fake z.

    Parity discipline: the frame's sum and sum-of-squares accumulate
    in DECIMAL (exact, order-independent — engine-internal float
    stddev folds differ), variance is the textbook
    (sumsq - sum^2/n)/(n-1) evaluated in the SAME double shape on both
    engines, and round(6) lands after the division. One
    hash-partition shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    dec = F.col("value").cast("decimal(18,6)")
    n = F.count("*").over(w)
    s = F.sum(dec).over(w).cast("double")
    sq = F.sum(dec * dec).over(w).cast("double")
    mean_v = s / n
    var_v = (sq - s * s / n) / (n - 1)
    z_raw = (F.col("value") - mean_v) / F.sqrt(var_v)
    ok = (n >= 5) & (var_v > 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(ok, F.round(z_raw, 6)).alias("z"),
        F.when(ok, F.abs(z_raw) > 3).alias("is_outlier"),
    )


@query(
    "win_rolling_slope",
    oracle="""
    SELECT user_id, event_id, ts,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS slope_10
    FROM (
      SELECT user_id, event_id, ts,
             count(*) OVER w AS n,
             sum(i) OVER w AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
             CAST(sum(i * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sxy,
             sum(i * i) OVER w AS sxx
      FROM (
        SELECT user_id, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS i
        FROM events) t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) z
    """,
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ORDINARY-LEAST-SQUARES SLOPE of value over a 10-row
    frame per user — the trend detector time-series monitoring runs
    next to the rolling mean (win_moving_avg_frame) and median
    (win_rolling_median): slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),
    computed from five frame sums — no per-row refit, no quadratic
    rescan.

    Parity discipline: the regressor x is the per-user ROW INDEX
    (row_number over the same (ts, event_id) total order on both
    engines), not the raw epoch timestamp — integer x makes Sx/Sxx and
    the whole denominator EXACT integer arithmetic (epoch-micros x
    would be catastrophic-cancellation territory). Sy/Sxy accumulate
    as DECIMAL(18,6) (the win_moving_avg_frame discipline) so the
    frame sums are order-INDEPENDENT — DuckDB's segment-tree windowed
    aggregation folds in a different order than Spark's running frame,
    which a double sum would expose at round-boundary values. One
    round(6) after the final division; the single-row frame
    (denominator 0) yields NULL on both sides. One hash-partition
    shuffle on user_id carries both windows."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = wo.rowsBetween(-9, Window.currentRow)
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.row_number().over(wo).alias("i"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("n"),
        F.sum("i").over(w).alias("sx"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sy"),
        F.sum(F.col("i") * F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("i") * F.col("i")).over(w).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return base.select(
        "user_id",
        "event_id",
        "ts",
        F.when(den != 0, F.round(num / den, 6)).alias("slope_10"),
    )


@query(
    "win_rolling_p90",
    oracle="""
    SELECT user_id, event_id, ts,
           round(list_extract(ls, (9 * len(ls) + 9) // 10), 6) AS p90_21
    FROM (
      SELECT user_id, event_id, ts,
             list_sort(list(value) FILTER (value IS NOT NULL) OVER w) AS ls
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)) t
    """,
)
def win_rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 90th PERCENTILE over a 21-row frame per user —
    the tail-latency monitor next to win_rolling_median's central
    tendency (p90/p99 is what SLOs alarm on, and a mean or median
    never sees the tail move). Same mechanism as win_rolling_median:
    Spark has no frame-capable percentile, so the frame materializes
    as a sorted array and the k-th smallest is read directly with
    k = ceil(0.9 * n) computed as the INTEGER (9n + 9) div 10 — both
    engines pick the identical element, never each engine's own
    quantile interpolation. One user-key window shuffle; frame sort
    is O(21 log 21) per row, a constant."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, Window.currentRow)
    )
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sort_array(F.collect_list("value").over(w)).alias("ls"),
    )
    return base.select(
        "user_id",
        "event_id",
        "ts",
        F.expr(
            "round(element_at(ls,"
            " CAST((9 * size(ls) + 9) div 10 AS INT)), 6)"
        ).alias("p90_21"),
    )


@query(
    "win_spc_western_electric",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN ok THEN value > mu + 3 * sd OR value < mu - 3 * sd
           END AS we_rule1,
           CASE WHEN ok THEN
             (n3 >= 3 AND c2p >= 2) OR (n3 >= 3 AND c2m >= 2)
           END AS we_rule2,
           CASE WHEN ok THEN
             (n5 >= 5 AND c1p >= 4) OR (n5 >= 5 AND c1m >= 4)
           END AS we_rule3,
           CASE WHEN ok THEN
             (n8 >= 8 AND cap = 8) OR (n8 >= 8 AND cam = 8)
           END AS we_rule4
    FROM (
      SELECT event_id, user_id, ts, value, mu, sd,
             nu >= 25 AND sd > 0 AS ok,
             count(*) OVER w3 AS n3,
             count(*) OVER w5 AS n5,
             count(*) OVER w8 AS n8,
             sum(CASE WHEN value > mu + 2 * sd THEN 1 ELSE 0 END) OVER w3 AS c2p,
             sum(CASE WHEN value < mu - 2 * sd THEN 1 ELSE 0 END) OVER w3 AS c2m,
             sum(CASE WHEN value > mu + sd THEN 1 ELSE 0 END) OVER w5 AS c1p,
             sum(CASE WHEN value < mu - sd THEN 1 ELSE 0 END) OVER w5 AS c1m,
             sum(CASE WHEN value > mu THEN 1 ELSE 0 END) OVER w8 AS cap,
             sum(CASE WHEN value < mu THEN 1 ELSE 0 END) OVER w8 AS cam
      FROM (
        SELECT event_id, user_id, ts, value,
               count(*) OVER u AS nu,
               CAST(sum(CAST(value AS DECIMAL(18,6))) OVER u AS DOUBLE)
                 / count(*) OVER u AS mu,
               sqrt((CAST(sum(CAST(value AS DECIMAL(18,6))
                             * CAST(value AS DECIMAL(18,6))) OVER u AS DOUBLE)
                     - CAST(sum(CAST(value AS DECIMAL(18,6))) OVER u AS DOUBLE)
                       * CAST(sum(CAST(value AS DECIMAL(18,6))) OVER u AS DOUBLE)
                       / count(*) OVER u)
                    / (count(*) OVER u - 1)) AS sd
        FROM events
        WINDOW u AS (PARTITION BY user_id)) b
      WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w8 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) t
    """,
)
def win_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WESTERN ELECTRIC SPC RUN RULES per user — the four classic
    control-chart alarms evaluated at every event against that user's
    own control limits (mu, sd over the user's full history, the
    Shewhart chart a monitoring pipeline keeps per entity):

      rule1  point beyond 3 sigma (either side)
      rule2  >= 2 of the last 3 points beyond 2 sigma, SAME side
      rule3  >= 4 of the last 5 points beyond 1 sigma, SAME side
      rule4  8 consecutive points on the same side of the centerline

    Each rule fires on the point COMPLETING the run (trailing frames
    ending at the current row); partial frames (fewer rows than the
    run length) cannot fire, and users with < 25 events or zero
    variance get NULL verdicts, never a fake alarm. Flags are exact
    integer counts over boolean zone indicators — no floats in the
    run logic itself.

    Scale shape: ONE hash exchange on user_id carries everything —
    the unbounded control-limit window and the three trailing run
    frames share the same partitioning and (ts, event_id) sort, so
    Catalyst plans a single Exchange + sort (plan-pinned). No second
    pass, no self-join, no global window.

    Parity discipline (the win_zscore_outlier rules): mu and sd come
    from DECIMAL(18,6) sums (exact, order-independent — engine float
    folds differ), evaluated in the SAME double expression shape on
    both engines, so zone thresholds mu + k*sd are bit-identical and
    the integer zone counts cannot drift. Reference behavior analogue:
    the quality gating of retrieved context (app.py:278) generalized
    to statistical process control over event streams."""
    ev = table(spark, sf_dir, "events")
    u = Window.partitionBy("user_id")
    dec = F.col("value").cast("decimal(18,6)")
    nu = F.count("*").over(u)
    s = F.sum(dec).over(u).cast("double")
    sq = F.sum(dec * dec).over(u).cast("double")
    mu = s / nu
    sd = F.sqrt((sq - s * s / nu) / (nu - 1))
    b = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        nu.alias("nu"),
        mu.alias("mu"),
        sd.alias("sd"),
    )

    def frame(rows: int):
        return (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(-(rows - 1), Window.currentRow)
        )

    w3, w5, w8 = frame(3), frame(5), frame(8)
    v, m, d = F.col("value"), F.col("mu"), F.col("sd")

    def cnt(cond, w):
        return F.sum(F.when(cond, 1).otherwise(0)).over(w)

    t = b.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "mu",
        "sd",
        ((F.col("nu") >= 25) & (d > 0)).alias("ok"),
        F.count("*").over(w3).alias("n3"),
        F.count("*").over(w5).alias("n5"),
        F.count("*").over(w8).alias("n8"),
        cnt(v > m + 2 * d, w3).alias("c2p"),
        cnt(v < m - 2 * d, w3).alias("c2m"),
        cnt(v > m + d, w5).alias("c1p"),
        cnt(v < m - d, w5).alias("c1m"),
        cnt(v > m, w8).alias("cap"),
        cnt(v < m, w8).alias("cam"),
    )
    ok = F.col("ok")
    return t.select(
        "event_id",
        "user_id",
        "ts",
        F.when(ok, (v > m + 3 * d) | (v < m - 3 * d)).alias("we_rule1"),
        F.when(
            ok,
            ((F.col("n3") >= 3) & (F.col("c2p") >= 2))
            | ((F.col("n3") >= 3) & (F.col("c2m") >= 2)),
        ).alias("we_rule2"),
        F.when(
            ok,
            ((F.col("n5") >= 5) & (F.col("c1p") >= 4))
            | ((F.col("n5") >= 5) & (F.col("c1m") >= 4)),
        ).alias("we_rule3"),
        F.when(
            ok,
            ((F.col("n8") >= 8) & (F.col("cap") == 8))
            | ((F.col("n8") >= 8) & (F.col("cam") == 8)),
        ).alias("we_rule4"),
    )


@query(
    "win_hampel_filter",
    oracle="""
    SELECT user_id, event_id, ts,
           round(med, 6) AS med_11,
           mad > 0 AND abs(value - med) > 3 * 1.4826 * mad AS is_spike,
           round(CASE WHEN mad > 0 AND abs(value - med) > 3 * 1.4826 * mad
                      THEN med ELSE value END, 6) AS filtered
    FROM (
      SELECT user_id, event_id, ts, value, med,
             (list_extract(ad, (len(ad) + 1) // 2)
              + list_extract(ad, len(ad) // 2 + 1)) / 2 AS mad
      FROM (
        SELECT user_id, event_id, ts, value, med,
               list_sort(list_transform(ls, v -> abs(v - med))) AS ad
        FROM (
          SELECT user_id, event_id, ts, value, ls,
                 (list_extract(ls, (len(ls) + 1) // 2)
                  + list_extract(ls, len(ls) // 2 + 1)) / 2 AS med
          FROM (
            SELECT user_id, event_id, ts, value,
                   list_sort(list(value) FILTER (value IS NOT NULL)
                             OVER w) AS ls
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
          ) a) b) c) d
    """,
)
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAMPEL FILTER per user — the standard robust despiking pass a
    telemetry pipeline runs before feeding a model: each value is
    compared against the MEDIAN of its CENTERED 11-row neighborhood,
    scaled by the neighborhood MAD (median absolute deviation,
    x1.4826 for Gaussian consistency); points beyond 3 scaled MADs
    are spikes and are REPLACED by the local median. Unlike
    win_zscore_outlier (mean/std — a spike inflates its own
    baseline), the median/MAD baseline is immune to the spike itself;
    unlike win_mad_outlier (per-user global MAD), the window adapts
    to local level shifts. mad = 0 (constant neighborhood) flags
    nothing — never a fake spike.

    Spark has no frame-capable median (round-6 note), so the frame
    materializes once as a sorted array and BOTH median picks — value
    median and MAD — read explicit middle elements from arrays both
    engines sort identically; the (lo+hi)/2 halving and the
    3*1.4826*mad threshold share expression text, so the spike SET is
    bit-identical. One hash exchange on user_id carries everything;
    the per-row cost is O(frame log frame) with frame a constant."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 5)
    )
    a = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sort_array(F.collect_list("value").over(w)).alias("ls"),
    )
    b = a.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.expr(
            "(element_at(ls, CAST((size(ls) + 1) div 2 AS INT))"
            " + element_at(ls, CAST(size(ls) div 2 + 1 AS INT))) / 2"
        ).alias("med"),
        "ls",
    )
    c = b.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "med",
        F.expr("sort_array(transform(ls, v -> abs(v - med)))").alias("ad"),
    )
    d = c.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        "med",
        F.expr(
            "(element_at(ad, CAST((size(ad) + 1) div 2 AS INT))"
            " + element_at(ad, CAST(size(ad) div 2 + 1 AS INT))) / 2"
        ).alias("mad"),
    )
    spike = F.expr("mad > 0 AND abs(value - med) > 3 * 1.4826 * mad")
    return d.select(
        "user_id",
        "event_id",
        "ts",
        F.round("med", 6).alias("med_11"),
        spike.alias("is_spike"),
        F.round(F.when(spike, F.col("med")).otherwise(F.col("value")), 6).alias(
            "filtered"
        ),
    )

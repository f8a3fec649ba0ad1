"""Round-9 operators — window-safe names (agg_/win_/graph_) by the
registration rule: round 9's verification window is fully claimed by
the round-8 backlog plus the three declared queue ops, so everything
here queues for round 10's window without displacing any shipped op
(registry.py ordered_queries; the round-8 third-session precedent).

Each op completes an in-tree family with the established exact-parity
machinery:

- agg_cramer_von_mises_2samp — the BODY-sensitive integral companion
  to agg_ks_test_two_sample (sup-norm) and agg_anderson_darling_2samp
  (tail-weighted): same distinct-cents value-domain collapse, doubled
  midranks, per-block closed forms, all-integer numerators.
- agg_chow_test — the structural-break F-test that turns the
  changepoint ops' localization into an inference decision, on the
  day-domain OLS closed forms (agg_granger_causality_1lag's centered
  moments, DECIMAL(19,0) squares per the round-7/8 kernel notes).
- agg_benjamini_hochberg — multiple-testing control over the 10
  event-type-pair exact sign tests: every p-value is a dyadic
  rational computed by the integer-exact C(n,k) fold
  (agg_sign_test_paired), so the whole BH step-up procedure runs on
  bit-identical doubles on both engines.
- graph_hits_bipartite — Kleinberg HITS on the customer->part
  purchase bipartite graph: the ranking view the co-purchase
  projections (graph_adamic_adar etc.) cannot give, with the
  PageRank-style per-iteration quantization (mean-1 scaling keeps the
  round(9) quantum 7 orders above reorder drift).
- win_siegel_repeated_median — 50%-breakdown robust trend
  (repeated-median slope), strengthening win_theil_sen_slope (29%)
  with the exact LOW-median picks of agg_median_polish_grid.

Reference analogue: app.py ships no statistical QA surface; these are
audit ops a Spark-native pipeline runs on the same scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# ---------------------------------------------------------------------------
# agg_cramer_von_mises_2samp
# ---------------------------------------------------------------------------


@query(
    "agg_cramer_von_mises_2samp",
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE event_type IN ('click', 'view')),
    blk AS MATERIALIZED (
      SELECT c,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS f1,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS f2
      FROM r GROUP BY c),
    tot AS MATERIALIZED (
      SELECT CAST(sum(f1) AS BIGINT) AS n1,
             CAST(sum(f2) AS BIGINT) AS n2,
             CAST(sum(f1) + sum(f2) AS BIGINT) AS n
      FROM blk),
    cum AS MATERIALIZED (
      SELECT c, f1, f2,
             2 * (sum(f1 + f2) OVER w - (f1 + f2)) + (f1 + f2) + 1 AS rr,
             sum(f1) OVER w - f1 AS a1,
             sum(f2) OVER w - f2 AS a2
      FROM blk
      WINDOW w AS (ORDER BY c ROWS UNBOUNDED PRECEDING)),
    contrib AS (
      SELECT
        CAST(f1 * rr * rr
             - 2 * rr * ((a1 + f1) * (a1 + f1 + 1) - a1 * (a1 + 1))
             + 4 * (((a1 + f1) * (a1 + f1 + 1) * (2 * (a1 + f1) + 1)) // 6
                    - (a1 * (a1 + 1) * (2 * a1 + 1)) // 6)
             AS DECIMAL(28,0)) AS ca,
        CAST(f2 * rr * rr
             - 2 * rr * ((a2 + f2) * (a2 + f2 + 1) - a2 * (a2 + 1))
             + 4 * (((a2 + f2) * (a2 + f2 + 1) * (2 * (a2 + f2) + 1)) // 6
                    - (a2 * (a2 + 1) * (2 * a2 + 1)) // 6)
             AS DECIMAL(28,0)) AS cb
      FROM cum),
    s AS (
      SELECT CAST(sum(ca) AS DECIMAL(38,0)) AS sa,
             CAST(sum(cb) AS DECIMAL(38,0)) AS sb,
             CAST(count(*) AS BIGINT) AS n_blocks
      FROM contrib)
    SELECT tot.n1 AS n_click, tot.n2 AS n_view, s.n_blocks,
           round((tot.n1 * CAST(s.sa AS DOUBLE)
                  + tot.n2 * CAST(s.sb AS DOUBLE))
                 / CAST(4 * tot.n1 * tot.n2 * tot.n AS DOUBLE)
                 - CAST(4 * tot.n1 * tot.n2 - 1 AS DOUBLE)
                   / CAST(6 * tot.n AS DOUBLE), 6) AS t_stat,
           CAST(CASE WHEN
                  round((tot.n1 * CAST(s.sa AS DOUBLE)
                         + tot.n2 * CAST(s.sb AS DOUBLE))
                        / CAST(4 * tot.n1 * tot.n2 * tot.n AS DOUBLE)
                        - CAST(4 * tot.n1 * tot.n2 - 1 AS DOUBLE)
                          / CAST(6 * tot.n AS DOUBLE), 9) >= 0.461
                THEN 1 ELSE 0 END AS BIGINT) AS significant_05
    FROM s CROSS JOIN tot
    """,
)
def agg_cramer_von_mises_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE CRAMER-VON MISES TEST (midrank/ties version) of the
    click vs view value distributions — the INTEGRAL-distance member
    of the in-tree GOF triad: KS (agg_ks_test_two_sample) sees the
    worst single point, Anderson-Darling (agg_anderson_darling_2samp)
    amplifies the tails, CvM weighs the WHOLE body equally:
    T = U/(n1*n2*N) - (4*n1*n2 - 1)/(6*N) with
    U = n1*SUM_i (r_i - i)^2 + n2*SUM_j (s_j - j)^2 over each
    sample's combined-vs-own rank discrepancies (Anderson 1962), and
    the asymptotic 5% critical value 0.461.

    EXACT rank machinery, no row-level sort: the fact table collapses
    to the distinct-cents value DOMAIN; each tied block [lo, hi]
    carries one DOUBLED midrank R = 2*cum_less + block + 1 (exact
    BIGINT — the agg_mann_whitney_u move), and the block's
    SUM (R - 2i)^2 over its members' own-sample positions
    i = a+1..a+f collapses to the closed form
    f*R^2 - 2R*(T1(a+f) - T1(a)) + 4*(S2(a+f) - S2(a)) with
    T1(x) = x(x+1) and S2(x) = x(x+1)(2x+1)/6 — consecutive-integer
    products whose /6 is exact integer division. Every numerator is
    an exact integer (per-block in BIGINT to ~1.4e6 positions, summed
    in DECIMAL(38,0)); the only doubles are the final shared-text
    expression of DECIMAL->DOUBLE casts (correctly rounded on both
    engines, hence bit-identical), quantized round(9) before the
    critical-value compare.

    Shape at 100 TB: one grouped scan to the value domain, one
    bounded-domain window, one aggregate — the AD/MW shape exactly."""
    ev = table(spark, sf_dir, "events")
    r = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_type", F.expr("CAST(value * 100 + 0.5 AS BIGINT)").alias("c")
    )
    blk = r.groupBy("c").agg(
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("f2"),
    ).localCheckpoint()
    tot = blk.agg(
        F.sum("f1").cast("bigint").alias("n1"),
        F.sum("f2").cast("bigint").alias("n2"),
        (F.sum("f1") + F.sum("f2")).cast("bigint").alias("n"),
    )
    w_c = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = blk.select(
        "f1",
        "f2",
        (
            2 * (F.sum(F.col("f1") + F.col("f2")).over(w_c)
                 - (F.col("f1") + F.col("f2")))
            + (F.col("f1") + F.col("f2"))
            + 1
        ).alias("rr"),
        (F.sum("f1").over(w_c) - F.col("f1")).alias("a1"),
        (F.sum("f2").over(w_c) - F.col("f2")).alias("a2"),
    )
    c_tpl = (
        "CAST(f{i} * rr * rr"
        " - 2 * rr * ((a{i} + f{i}) * (a{i} + f{i} + 1) - a{i} * (a{i} + 1))"
        " + 4 * (((a{i} + f{i}) * (a{i} + f{i} + 1)"
        " * (2 * (a{i} + f{i}) + 1)) div 6"
        " - (a{i} * (a{i} + 1) * (2 * a{i} + 1)) div 6)"
        " AS DECIMAL(28,0))"
    )
    s = cum.selectExpr(
        c_tpl.format(i=1) + " AS ca", c_tpl.format(i=2) + " AS cb"
    ).agg(
        F.sum("ca").cast("decimal(38,0)").alias("sa"),
        F.sum("cb").cast("decimal(38,0)").alias("sb"),
        F.count("*").cast("bigint").alias("n_blocks"),
    )
    t_txt = (
        "(n1 * CAST(sa AS DOUBLE) + n2 * CAST(sb AS DOUBLE))"
        " / CAST(4 * n1 * n2 * n AS DOUBLE)"
        " - CAST(4 * n1 * n2 - 1 AS DOUBLE) / CAST(6 * n AS DOUBLE)"
    )
    return s.crossJoin(F.broadcast(tot)).selectExpr(
        "n1 AS n_click",
        "n2 AS n_view",
        "n_blocks",
        f"round({t_txt}, 6) AS t_stat",
        f"CAST(CASE WHEN round({t_txt}, 9) >= 0.461"
        " THEN 1 ELSE 0 END AS BIGINT) AS significant_05",
    )


# ---------------------------------------------------------------------------
# agg_chow_test
# ---------------------------------------------------------------------------

_CHOW_SPLIT_DAY = 15  # break candidate: mid-series (day 15 of 30)


def _chow_moment_exprs(flt: str, p: str) -> list[str]:
    """Exact integer OLS moments of (day index x, daily cents y) for
    one segment, as SQL aggregate expressions shared by shape across
    engines (the y*y squares run in DECIMAL(19,0) to force exactness
    on both multiply kernels — int64 would overflow sy^2 past sf1x
    and DuckDB's width-18 decimal kernel overflows on squares)."""
    return [
        f"CAST(sum(CASE WHEN {flt} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {p}n",
        f"CAST(sum(CASE WHEN {flt} THEN x ELSE 0 END) AS BIGINT)"
        f" AS {p}sx",
        f"CAST(sum(CASE WHEN {flt} THEN y ELSE 0 END) AS BIGINT)"
        f" AS {p}sy",
        f"CAST(sum(CASE WHEN {flt} THEN x * x ELSE 0 END) AS BIGINT)"
        f" AS {p}sxx",
        f"CAST(sum(CASE WHEN {flt} THEN x * y ELSE 0 END) AS BIGINT)"
        f" AS {p}sxy",
        f"CAST(sum(CASE WHEN {flt} THEN"
        " CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"
        f" ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS {p}syy",
    ]


_CHOW_ALL_MOMENT_LIST = (
    _chow_moment_exprs("TRUE", "p")
    + _chow_moment_exprs(f"x <= {_CHOW_SPLIT_DAY}", "a")
    + _chow_moment_exprs(f"x > {_CHOW_SPLIT_DAY}", "b")
)
_CHOW_ALL_MOMENTS = ",\n             ".join(_CHOW_ALL_MOMENT_LIST)

_CHOW_RSS = (
    "(CAST(CAST({p}n AS DECIMAL(19,0)) * CAST({p}syy AS DECIMAL(38,0))"
    " - CAST({p}sy AS DECIMAL(19,0)) * CAST({p}sy AS DECIMAL(19,0))"
    " AS DOUBLE)"
    " - CAST({p}n * {p}sxy - {p}sx * {p}sy AS DOUBLE)"
    " * CAST({p}n * {p}sxy - {p}sx * {p}sy AS DOUBLE)"
    " / CAST({p}n * {p}sxx - {p}sx * {p}sx AS DOUBLE))"
    " / CAST({p}n AS DOUBLE)"
)


@query(
    "agg_chow_test",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1
               AS x,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY 1),
    m AS (
      SELECT {_CHOW_ALL_MOMENTS}
      FROM daily),
    rss AS (
      SELECT pn AS n_days,
             {_CHOW_RSS.format(p="p")} AS rss_p,
             {_CHOW_RSS.format(p="a")} AS rss_a,
             {_CHOW_RSS.format(p="b")} AS rss_b
      FROM m)
    SELECT n_days,
           round(rss_p, 6) AS rss_pooled,
           round(rss_a, 6) AS rss_pre,
           round(rss_b, 6) AS rss_post,
           round(((rss_p - rss_a - rss_b) / 2)
                 / ((rss_a + rss_b) / (n_days - 4)), 6) AS f_stat,
           CAST(CASE WHEN round(((rss_p - rss_a - rss_b) / 2)
                 / ((rss_a + rss_b) / (n_days - 4)), 9)
                 > CAST(3.369 AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS break_detected_05
    FROM rss
    """,
)
def agg_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHOW STRUCTURAL-BREAK TEST at the mid-series split (day 15 of
    the 30-day fixture): fit daily-revenue-vs-day OLS lines to the
    pooled series and to each half, and test whether two regimes fit
    better than one — F = ((RSS_p - RSS_1 - RSS_2)/k) /
    ((RSS_1 + RSS_2)/(n - 2k)), k = 2 parameters, against F(2, 26)'s
    5% critical value 3.369. The INFERENCE companion to the
    changepoint localizers (win_changepoint_pelt_1d finds WHERE;
    Chow answers WHETHER a proposed break is statistically real) —
    the test a pipeline runs before acting on a detected drift.

    All three RSS come from one grouped scan via the centered-moment
    closed form RSS = (Cyy - Cxy^2/Cxx)/n with C = n*S - s*s (the
    agg_granger_causality_1lag machinery, n-scaled then divided once
    — the round-8 lesson): the day-domain moments are exact integers;
    Cyy's n*syy and sy^2 run as DECIMAL(19,0) products on BOTH
    engines (forcing Spark's 38-digit exactness AND DuckDB's HUGEINT
    kernel — width-18 operands would overflow int64 on squares);
    the F-statistic is one shared double expression of those exact
    values, quantized round(9) before the critical-value compare.

    Shape at 100 TB: one map-side-combinable conditional aggregate to
    a 1-row frame of 18 moments; zero joins, zero windows."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "datediff(CAST(ts AS DATE), DATE '2024-01-01') + 1"
            ).alias("x")
        )
        .agg(
            F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)"))
            .cast("bigint")
            .alias("y")
        )
    )

    m = daily.selectExpr("x", "y").agg(
        *[F.expr(e) for e in _CHOW_ALL_MOMENT_LIST]
    )
    rss = m.selectExpr(
        "pn AS n_days",
        _CHOW_RSS.format(p="p") + " AS rss_p",
        _CHOW_RSS.format(p="a") + " AS rss_a",
        _CHOW_RSS.format(p="b") + " AS rss_b",
    )
    f_txt = (
        "((rss_p - rss_a - rss_b) / 2)"
        " / ((rss_a + rss_b) / (n_days - 4))"
    )
    return rss.selectExpr(
        "n_days",
        "round(rss_p, 6) AS rss_pooled",
        "round(rss_a, 6) AS rss_pre",
        "round(rss_b, 6) AS rss_post",
        f"round({f_txt}, 6) AS f_stat",
        f"CAST(CASE WHEN round({f_txt}, 9) > CAST(3.369 AS DOUBLE)"
        " THEN 1 ELSE 0 END AS BIGINT) AS break_detected_05",
    )


# ---------------------------------------------------------------------------
# agg_benjamini_hochberg
# ---------------------------------------------------------------------------

_BH_Q = "CAST(0.10 AS DOUBLE)"  # FDR level


@query(
    "agg_benjamini_hochberg",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS tot
      FROM events GROUP BY 1, 2),
    pr AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(sum(CASE WHEN a.tot <> b.tot THEN 1 ELSE 0 END)
                  AS BIGINT) AS n,
             CAST(sum(CASE WHEN a.tot > b.tot THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2),
    ks AS (
      SELECT pr.type_a, pr.type_b, pr.n, pr.s, k.k,
             list_reduce(
               list_prepend(CAST(1 AS BIGINT),
                            CAST(generate_series(1, k.k) AS BIGINT[])),
               (acc, i) -> acc * (pr.n - i + 1) // i) AS binom
      FROM pr CROSS JOIN
           (SELECT unnest(generate_series(0, 60)) AS k) k
      WHERE k.k <= least(pr.s, pr.n - pr.s)),
    pv AS (
      SELECT type_a, type_b, n, s,
             least(CAST(1 AS DOUBLE),
                   2 * CAST(sum(binom) AS DOUBLE)
                   / (CAST(1 AS BIGINT) << CAST(n AS INTEGER))) AS p
      FROM ks GROUP BY type_a, type_b, n, s),
    rk AS (
      SELECT *,
             row_number() OVER (ORDER BY p, type_a, type_b) AS i,
             count(*) OVER () AS m
      FROM pv),
    ok AS (
      SELECT *,
             CASE WHEN p <= CAST(i AS DOUBLE) * {_BH_Q} / m
                  THEN i ELSE 0 END AS oki
      FROM rk)
    SELECT type_a, type_b, n AS n_informative, s AS n_a_greater,
           round(p, 9) AS p_value,
           CAST(i AS BIGINT) AS bh_rank,
           round(CAST(i AS DOUBLE) * {_BH_Q} / m, 9) AS bh_threshold,
           CAST(CASE WHEN i <= max(oki) OVER () THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM ok
    """,
)
def agg_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR CONTROL over the family of 10 exact
    paired sign tests between every pair of event types (daily-cents
    comparisons across the 30-day grid) — the multiple-testing step
    every in-tree test family eventually needs: run 10 hypothesis
    tests at alpha = 0.05 each and ~0.4 false positives are EXPECTED;
    BH's step-up rule (reject the largest i with p_(i) <= i*q/m,
    and everything ranked below it) bounds the false-discovery RATE
    at q = 0.10.

    Why this family: each pairwise p-value is the EXACT two-sided
    binomial sign-test probability p = min(1, 2*2^-n*SUM_(j<=min(s,
    n-s)) C(n,j)) computed by the integer-exact stepwise C(n,k) fold
    (agg_sign_test_paired's machinery — every partial product is
    itself a binomial coefficient). With n <= 30 days, p is a DYADIC
    rational exactly representable in a double, so the sort, the
    step-up comparisons, and the rejection front are decided on
    bit-identical values on both engines — a multiple-testing
    procedure with literally zero float-parity surface.

    Shape at 100 TB: the fact table collapses to the |types| x 30
    day grid in one grouped scan; the pair self-join, coefficient
    folds, and both windows run on the bounded grid (10 pairs x <=16
    coefficient rows). The unpartitioned windows span 10 rows."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)"))
            .cast("bigint")
            .alias("tot")
        )
        .localCheckpoint()  # bounded: |types| x 30 grid, read twice
    )
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "day",
        F.col("tot").alias("ta"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        "day",
        F.col("tot").alias("tb"),
    )
    pr = (
        a.join(b, "day")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.expr("CASE WHEN ta <> tb THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n"),
            F.sum(F.expr("CASE WHEN ta > tb THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("s"),
        )
    )
    ks = (
        pr.crossJoin(
            F.broadcast(spark.range(0, 61).select(F.col("id").alias("k")))
        )
        .where(F.col("k") <= F.least(F.col("s"), F.col("n") - F.col("s")))
        .selectExpr(
            "type_a",
            "type_b",
            "n",
            "s",
            # k = 0 must short-circuit: Spark's sequence(1, 0) steps
            # DOWN to [1, 0] and the fold would divide by zero
            "CASE WHEN k = 0 THEN CAST(1 AS BIGINT)"
            " ELSE aggregate(sequence(1, CAST(k AS INT)),"
            " CAST(1 AS BIGINT),"
            " (acc, i) -> acc * (n - i + 1) div i) END AS binom",
        )
    )
    pv = ks.groupBy("type_a", "type_b", "n", "s").agg(
        F.expr(
            "least(CAST(1 AS DOUBLE), 2 * CAST(sum(binom) AS DOUBLE)"
            " / shiftleft(CAST(1 AS BIGINT), CAST(n AS INT)))"
        ).alias("p")
    )
    w_rank = Window.orderBy("p", "type_a", "type_b")
    w_all = Window.partitionBy()
    rk = pv.withColumn("i", F.row_number().over(w_rank)).withColumn(
        "m", F.count("*").over(w_all)
    )
    ok = rk.withColumn(
        "oki",
        F.expr(
            f"CASE WHEN p <= CAST(i AS DOUBLE) * {_BH_Q} / m"
            " THEN i ELSE 0 END"
        ),
    ).withColumn("maxok", F.max("oki").over(w_all))
    return ok.selectExpr(
        "type_a",
        "type_b",
        "n AS n_informative",
        "s AS n_a_greater",
        "round(p, 9) AS p_value",
        "CAST(i AS BIGINT) AS bh_rank",
        f"round(CAST(i AS DOUBLE) * {_BH_Q} / m, 9) AS bh_threshold",
        "CAST(CASE WHEN i <= maxok THEN 1 ELSE 0 END AS BIGINT)"
        " AS rejected",
    )


# ---------------------------------------------------------------------------
# win_siegel_repeated_median
# ---------------------------------------------------------------------------


@query(
    "win_siegel_repeated_median",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 1
               AS x,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY 1),
    sl AS (
      SELECT a.x,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON a.x <> b.x),
    med AS (
      SELECT x,
             list_extract(list_sort(list(s)), (count(*) + 1) // 2)
               AS ms
      FROM sl GROUP BY x),
    slope AS (
      SELECT list_extract(list_sort(list(ms)), (count(*) + 1) // 2)
               AS sm,
             CAST(count(*) AS BIGINT) AS n_days
      FROM med),
    icept AS (
      SELECT slope.n_days, slope.sm,
             list_extract(list_sort(list(d.y - slope.sm * d.x)),
                          (count(*) + 1) // 2) AS ic
      FROM daily d CROSS JOIN slope
      GROUP BY slope.n_days, slope.sm)
    SELECT n_days, round(sm, 6) AS siegel_slope,
           round(ic, 6) AS siegel_intercept
    FROM icept
    """,
)
def win_siegel_repeated_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIEGEL REPEATED-MEDIAN trend of daily revenue — the
    50%-BREAKDOWN robust regression: slope = median over days d of
    (median over e != d of the pairwise slope (y_e - y_d)/(e - d)),
    intercept = median of (y_d - slope*d). win_theil_sen_slope's
    single median over all pairs breaks down at 29% contamination;
    the repeated median survives until half the DAYS are corrupted —
    the estimator to reach for when a pipeline incident can poison
    whole stretches of the series (Siegel 1982).

    Exactness: daily totals are exact BIGINT cents; every pairwise
    slope is one division of exact integers (correctly rounded,
    bit-identical on both engines); all three medians use the exact
    LOW-median pick — element_at(sort_array(collect_list(v)),
    (count+1) div 2) / DuckDB list_extract(list_sort(list(v)),
    (count+1)//2), the agg_median_polish_grid convention — so no
    averaging ever mixes two floats. The intercept residuals reuse
    the picked slope double verbatim.

    Shape at 100 TB: the fact table collapses to the bounded day
    domain in one grouped scan; the slope grid is |days|^2 = 900
    rows; medians run per-day (partitioned) then once on the 30-row
    domain. Arrays stay internal (no array output columns)."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "datediff(CAST(ts AS DATE), DATE '2024-01-01') + 1"
            ).alias("x")
        )
        .agg(
            F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)"))
            .cast("bigint")
            .alias("y")
        )
        .localCheckpoint()  # bounded day domain, read twice
    )
    a = daily.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    sl = (
        a.join(b, F.col("xa") != F.col("xb"))
        .selectExpr(
            "xa AS x", "CAST(yb - ya AS DOUBLE) / (xb - xa) AS s"
        )
    )
    med = sl.groupBy("x").agg(
        F.expr(
            "element_at(sort_array(collect_list(s)),"
            " CAST((count(s) + 1) div 2 AS INT)) AS ms"
        ).alias("ms")
    )
    slope = med.agg(
        F.expr(
            "element_at(sort_array(collect_list(ms)),"
            " CAST((count(ms) + 1) div 2 AS INT))"
        ).alias("sm"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    icept = (
        daily.crossJoin(F.broadcast(slope))
        .groupBy("n_days", "sm")
        .agg(
            F.expr(
                "element_at(sort_array(collect_list(y - sm * x)),"
                " CAST((count(*) + 1) div 2 AS INT))"
            ).alias("ic")
        )
    )
    return icept.selectExpr(
        "n_days",
        "round(sm, 6) AS siegel_slope",
        "round(ic, 6) AS siegel_intercept",
    )


# ---------------------------------------------------------------------------
# graph_hits_bipartite
# ---------------------------------------------------------------------------

_HITS_ITERS = 4


def _hits_oracle() -> str:
    """Unrolled HITS power iterations as materialized CTEs (a
    recursive CTE cannot reference itself twice per step — the
    graph_pagerank_neardup rule). Each step quantizes the MEAN-1
    scaled scores to round(9) on both engines."""
    ctes = [
        """e AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    cn AS (SELECT count(DISTINCT c) AS nc FROM e),
    pn AS (SELECT count(DISTINCT p) AS np FROM e),
    h0 AS (SELECT DISTINCT c, CAST(1.0 AS DOUBLE) AS h FROM e)"""
    ]
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"""a{i}r AS MATERIALIZED (
      SELECT e.p, sum(h.h) AS a
      FROM e JOIN h{i - 1} h ON e.c = h.c GROUP BY e.p),
    a{i}s AS (SELECT sum(a) AS s FROM a{i}r),
    a{i} AS MATERIALIZED (
      SELECT p, round(a * (SELECT np FROM pn) / (SELECT s FROM a{i}s), 9)
               AS a
      FROM a{i}r),
    h{i}r AS MATERIALIZED (
      SELECT e.c, sum(a.a) AS h
      FROM e JOIN a{i} a ON e.p = a.p GROUP BY e.c),
    h{i}s AS (SELECT sum(h) AS s FROM h{i}r),
    h{i} AS MATERIALIZED (
      SELECT c, round(h * (SELECT nc FROM cn) / (SELECT s FROM h{i}s), 9)
               AS h
      FROM h{i}r)"""
        )
    k = _HITS_ITERS
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    topa AS (
      SELECT 'authority' AS role, p AS node_id, a AS score
      FROM a{k} ORDER BY a DESC, p LIMIT 10),
    toph AS (
      SELECT 'hub' AS role, c AS node_id, h AS score
      FROM h{k} ORDER BY h DESC, c LIMIT 10),
    u AS (SELECT * FROM topa UNION ALL SELECT * FROM toph)
    SELECT role, node_id, round(score, 6) AS hits_score,
           CAST(row_number() OVER (PARTITION BY role
                                   ORDER BY score DESC, node_id)
                AS BIGINT) AS rank
    FROM u
    """


@query("graph_hits_bipartite", oracle=_hits_oracle())
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLEINBERG HITS on the customer -> part purchase BIPARTITE graph
    (4 power iterations): authority(part) = sum of its buyers' hub
    scores, hub(customer) = sum of their parts' authority scores —
    the mutually-reinforcing ranking the one-sided co-purchase
    PROJECTIONS (graph_adamic_adar, graph_triangle_cosupply) cannot
    express, because it couples both sides of the original bipartite
    structure instead of collapsing one away. Converges to the
    principal singular vectors of the incidence matrix; 4 iterations
    on a diameter-2-per-side graph separate the head decisively.

    Parity: each half-iteration L1-normalizes to MEAN 1 (score *
    |side| / sum) and quantizes round(9) — scores sit at magnitude
    ~1, so the 1e-9 quantum is ~8 orders above cross-engine reorder
    drift in the unordered sums (the graph_pagerank_neardup
    argument, strengthened by the scaling: raw 1/N-normalized scores
    at N = 2e4 would leave only 4 safe digits). The oracle unrolls
    the same iterations as materialized CTEs.

    Scale shape: the edge list (DISTINCT buyer-part pairs) is built
    once and localCheckpointed (referenced 2x per iteration — the
    _cosupply_edges rule); every iteration is two shuffle joins +
    two tiny aggregates, lazy-chained with NO driver actions beyond
    the checkpoint; top-10 per side is orderBy+limit
    (TakeOrderedAndProject), ranked after the cut."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    nc = e.select("c").distinct().count()
    np_ = e.select("p").distinct().count()
    h = e.select("c").distinct().select(
        "c", F.expr("CAST(1.0 AS DOUBLE)").alias("h")
    )
    a = None
    for _ in range(_HITS_ITERS):
        ar = (
            e.join(h, "c")
            .groupBy("p")
            .agg(F.sum("h").alias("a"))
        )
        a_s = ar.agg(F.sum("a").alias("s"))
        a = ar.crossJoin(F.broadcast(a_s)).select(
            "p", F.round(F.col("a") * np_ / F.col("s"), 9).alias("a")
        )
        hr = (
            e.join(a, "p")
            .groupBy("c")
            .agg(F.sum("a").alias("h"))
        )
        h_s = hr.agg(F.sum("h").alias("s"))
        h = hr.crossJoin(F.broadcast(h_s)).select(
            "c", F.round(F.col("h") * nc / F.col("s"), 9).alias("h")
        )
    topa = (
        a.orderBy(F.col("a").desc(), "p")
        .limit(10)
        .select(
            F.lit("authority").alias("role"),
            F.col("p").alias("node_id"),
            F.col("a").alias("score"),
        )
    )
    toph = (
        h.orderBy(F.col("h").desc(), "c")
        .limit(10)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.col("h").alias("score"),
        )
    )
    w_r = Window.partitionBy("role").orderBy(F.col("score").desc(), "node_id")
    return (
        topa.unionByName(toph)
        .withColumn("rank", F.row_number().over(w_r).cast("bigint"))
        .select(
            "role",
            "node_id",
            F.round("score", 6).alias("hits_score"),
            "rank",
        )
    )

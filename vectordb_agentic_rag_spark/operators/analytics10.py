"""Round-11 wave operators.

Window math (registry.ordered_queries simulation at round-11 start):
the never-checked residual is 24 ops (19 window-safe round-10 +
queue_r11's 2 + the 3 declared round-11 queue ops), so this module can
register further ops freely while the window holds <= 50 — re-simulate
before each wave, as always.

Each op completes an in-tree family with established exact-parity
machinery:

- agg_markov_first_passage — mean first-passage steps to 'purchase',
  completing the Markov suite (transition / stationary / entropy-rate
  / removal-attribution) with the absorption-time view: an all-integer
  4x4 Cramer solve (cofactor determinants in DECIMAL(38,0)/HUGEINT),
  ONE double division per state.
- agg_woe_information_value — weight-of-evidence / information-value
  feature screen over activity-score deciles, on the qini op's
  distributed domain-CDF machinery.
- agg_bws_test — Baumgartner-Weiss-Schindler two-sample rank test,
  the variance-weighted member of the MWU / Brunner-Munzel / CvM
  family, on the same doubled-midrank value-domain collapse.
- win_xbar_r_control — Shewhart X̄-R control chart on the day grid
  (subgroup = day-of-week block), the PRE-sequential SPC view next to
  win_cusum_changepoint / win_page_hinkley (sequential detectors).
- maintenance_partition_skew_report — per-key shuffle-skew diagnostic
  (top-key share, decile mass) for the fact tables' join keys — the
  table an engineer reads before picking salting factors.
- vec_dim_variance_profile — per-dimension moment profile of the
  embedding corpus (the whitening/anisotropy screen next to
  vec_pca_power_iter's single component).
- pipeline_dedup_threshold_sensitivity — near-dup purge volume as a
  function of the Jaccard threshold, from ONE verified-pair table
  (the "what if we lower tau" sheet for dedup_near_minhash).

Reference analogue: app.py ships none of this QA/ops surface; these
are the audit operators a Spark-native pipeline runs on the same
scans (SURVEY §2C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.domain import dist_exclusive_prefix
from ..registry import query
from ..tables import table

# ---------------------------------------------------------------------------
# agg_markov_first_passage
# ---------------------------------------------------------------------------

_FP_TARGET = "purchase"
_FP_STATES = ["click", "error", "signup", "view"]  # transient, sorted


def _det3(m: list[list[str]]) -> str:
    return (
        f"({m[0][0]}) * (({m[1][1]}) * ({m[2][2]})"
        f" - ({m[1][2]}) * ({m[2][1]}))"
        f" - ({m[0][1]}) * (({m[1][0]}) * ({m[2][2]})"
        f" - ({m[1][2]}) * ({m[2][0]}))"
        f" + ({m[0][2]}) * (({m[1][0]}) * ({m[2][1]})"
        f" - ({m[1][1]}) * ({m[2][0]}))"
    )


def _det4(m: list[list[str]]) -> str:
    parts = []
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        sign = "+" if j % 2 == 0 else "-"
        parts.append(f"{sign} ({m[0][j]}) * ({_det3(minor)})")
    return " ".join(parts).lstrip("+ ")


def _fp_matrix(cast: str) -> tuple[str, list[str]]:
    """(det(A) text, [det(A_i) texts]) over the pivoted count columns
    c_<i>_<j> / n_<i>; entries pre-cast with ``cast`` so every product
    runs in 38-digit integer arithmetic on both engines."""
    a = [
        [
            (
                f"CAST(n_{si} - c_{si}_{sj} AS {cast})"
                if si == sj
                else f"CAST(0 - c_{si}_{sj} AS {cast})"
            )
            for sj in _FP_STATES
        ]
        for si in _FP_STATES
    ]
    b = [f"CAST(n_{si} AS {cast})" for si in _FP_STATES]
    det_a = _det4(a)
    det_i = []
    for col in range(4):
        m = [
            [b[r] if c == col else a[r][c] for c in range(4)]
            for r in range(4)
        ]
        det_i.append(_det4(m))
    return det_a, det_i


def _fp_oracle() -> str:
    cells = ",\n             ".join(
        f"CAST(sum(CASE WHEN prev_type = '{si}' AND next_type = '{sj}'"
        f" THEN n ELSE 0 END) AS BIGINT) AS c_{si}_{sj}"
        for si in _FP_STATES
        for sj in _FP_STATES + [_FP_TARGET]
    )
    rows_n = ",\n             ".join(
        f"CAST({' + '.join(f'c_{si}_{sj}' for sj in _FP_STATES + [_FP_TARGET])}"
        f" AS BIGINT) AS n_{si}"
        for si in _FP_STATES
    )
    det_a, det_i = _fp_matrix("HUGEINT")
    det_cols = ",\n             ".join(
        [f"({det_a}) AS det_a"]
        + [f"({d}) AS det_{k}" for k, d in enumerate(det_i)]
    )
    outs = "\n    UNION ALL\n    ".join(
        f"SELECT '{si}' AS from_state, n_{si} AS n_from,"
        f" CASE WHEN det_a = 0 THEN NULL"
        f" ELSE round(CAST(det_{k} AS DOUBLE)"
        f" / CAST(det_a AS DOUBLE), 6) END AS mean_steps_to_purchase"
        f" FROM d"
        for k, si in enumerate(_FP_STATES)
    )
    return f"""
    WITH seq AS (
      SELECT event_type AS next_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    c AS (
      SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    piv AS (
      SELECT {cells}
      FROM c),
    m AS (
      SELECT *,
             {rows_n}
      FROM piv),
    d AS (
      SELECT *,
             {det_cols}
      FROM m)
    {outs}
    ORDER BY from_state
    """


@query("agg_markov_first_passage", oracle=_fp_oracle())
def agg_markov_first_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN FIRST-PASSAGE TIME to the 'purchase' state from each other
    event type, under the per-user first-order Markov chain — the
    absorption-time view that completes the in-tree Markov suite:
    agg_markov_transition estimates the matrix, agg_markov_stationary
    its long-run mix, agg_entropy_rate_markov its predictability,
    agg_markov_removal_attribution its channel counterfactuals; THIS
    op answers "from a click, how many steps until a purchase, in
    expectation?" — the funnel-latency read in steps rather than
    wall-clock (agg_time_to_convert is the wall-clock twin).

    Exact machinery: m_i = 1 + sum_{{k != purchase}} P_ik m_k has the
    integer form n_i*m_i - sum_k c_ik*m_k = n_i (multiply each row by
    its transition total n_i), a 4x4 linear system with BIGINT
    coefficients.  Cramer's rule solves it with FIVE cofactor-expanded
    determinants whose products run in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — 4-entry products of ~1e6-scale counts stay
    ~1e24, far inside 38 digits — and each mean is ONE double
    division of two exact integers, round(6), NULL-gated on det = 0
    (an unreachable target would make the system singular).

    Shape at 100 TB: one user-partitioned lag window (the shared
    sequence shuffle every Markov op rides), a 25-cell aggregate,
    then constant-size 1-row arithmetic."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    c = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    piv = c.agg(
        *[
            F.expr(
                f"CAST(sum(CASE WHEN prev_type = '{si}'"
                f" AND next_type = '{sj}' THEN n ELSE 0 END) AS BIGINT)"
            ).alias(f"c_{si}_{sj}")
            for si in _FP_STATES
            for sj in _FP_STATES + [_FP_TARGET]
        ]
    )
    m = piv.selectExpr(
        "*",
        *[
            f"CAST({' + '.join(f'c_{si}_{sj}' for sj in _FP_STATES + [_FP_TARGET])}"
            f" AS BIGINT) AS n_{si}"
            for si in _FP_STATES
        ],
    )
    det_a, det_i = _fp_matrix("DECIMAL(38,0)")
    dets = m.selectExpr(
        "*",
        f"({det_a}) AS det_a",
        *[f"({d}) AS det_{k}" for k, d in enumerate(det_i)],
    ).localCheckpoint()  # 1-row frame referenced by all 4 union
    # branches — without the checkpoint each branch re-derives the
    # lag-window scan (bounded-intermediate rule)
    out = None
    for k, si in enumerate(_FP_STATES):
        row = dets.selectExpr(
            f"'{si}' AS from_state",
            f"n_{si} AS n_from",
            f"CASE WHEN det_a = 0 THEN NULL"
            f" ELSE round(CAST(det_{k} AS DOUBLE)"
            f" / CAST(det_a AS DOUBLE), 6)"
            f" END AS mean_steps_to_purchase",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("from_state")


# ---------------------------------------------------------------------------
# agg_woe_information_value
# ---------------------------------------------------------------------------


@query(
    "agg_woe_information_value",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                           THEN CAST(round(value * 100, 0) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS score,
             CAST(max(CASE WHEN event_type = 'purchase'
                            AND CAST(ts AS DATE) >= DATE '2024-01-16'
                            AND value * 100 >= 10000
                           THEN 1 ELSE 0 END) AS BIGINT) AS good
      FROM events GROUP BY user_id),
    dom AS (
      SELECT score, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY score),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM dom),
    cum AS (
      SELECT score,
             CAST(coalesce(sum(c) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cal
      FROM dom),
    binned AS (
      SELECT u.good, least(9, 10 * cum.cal // tot.n) AS decile
      FROM u JOIN cum ON u.score = cum.score CROSS JOIN tot),
    cells AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(good) AS BIGINT) AS n_good,
             CAST(count(*) - sum(good) AS BIGINT) AS n_bad
      FROM binned GROUP BY decile),
    g AS (SELECT CAST(sum(n_good) AS BIGINT) AS gt,
                 CAST(sum(n_bad) AS BIGINT) AS bt
          FROM cells),
    t AS (
      SELECT c.decile, c.n_users, c.n_good, c.n_bad,
             CASE WHEN c.n_good = 0 OR c.n_bad = 0 THEN NULL
                  ELSE round(ln(CAST(c.n_good * g.bt AS DOUBLE)
                                / CAST(c.n_bad * g.gt AS DOUBLE)), 6)
             END AS woe,
             CASE WHEN c.n_good = 0 OR c.n_bad = 0 THEN NULL
                  ELSE CAST(round(
                    (CAST(c.n_good AS DOUBLE) / g.gt
                     - CAST(c.n_bad AS DOUBLE) / g.bt)
                    * ln(CAST(c.n_good * g.bt AS DOUBLE)
                         / CAST(c.n_bad * g.gt AS DOUBLE)),
                    9) AS DECIMAL(28,9))
             END AS term
      FROM cells c CROSS JOIN g)
    SELECT decile, n_users, n_good, n_bad, woe,
           round(CAST(term AS DOUBLE), 6) AS iv_term,
           round(CAST(sum(term) OVER () AS DOUBLE), 6) AS iv_total
    FROM t ORDER BY decile
    """,
)
def agg_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-OF-EVIDENCE / INFORMATION-VALUE table — the credit-
    scoring feature screen (Siddiqi's scorecard convention): users are
    binned into deciles of the pre-period activity score (days 1-15
    cents — the same behavioral covariate agg_qini_uplift_curve
    ranks), the outcome is the post-period big-purchase conversion,
    and each decile's WOE = ln((good_d/G)/(bad_d/B)) with IV =
    sum (good_d/G - bad_d/B) * WOE_d.  IV reads on the 0.02/0.1/0.3
    rule-of-thumb scale ("too weak to use" .. "suspiciously strong").
    Acronym note: agg_iv_wald_estimator's IV is INSTRUMENTAL VARIABLES
    (causal); this IV is INFORMATION VALUE (predictive screening) —
    different statistics, both standard names.

    Parity: decile assignment is the integer strict-less domain-CDF
    (ascending; decile 9 = most active); WOE is ONE double division of
    exact integer cross-products ln((good_d*B)/(bad_d*G)), round(6);
    IV terms quantize round(9) into DECIMAL before the
    order-independent sum (dynamic-term rule); empty-class deciles
    NULL-gate WOE and drop out of IV (the textbook treatment short of
    smoothing).

    Shape at 100 TB: one groupBy(user) collapse; the score-domain CDF
    here rides the ORACLE-simple single window because the decile
    join-back is the same machinery as agg_qini_uplift_curve — whose
    DISTRIBUTED two-level prefix sum (range buckets + partitioned
    cumulative) is the production plan; at fixture scale this op
    keeps the plain form and the qini op carries the plan pin."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'"
            " THEN CAST(value * 100 + 0.5 AS BIGINT) ELSE 0 END)"
            " AS BIGINT)"
        ).alias("score"),
        F.expr(
            "CAST(max(CASE WHEN event_type = 'purchase'"
            " AND CAST(ts AS DATE) >= DATE '2024-01-16'"
            " AND value * 100 >= 10000 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("good"),
    ).localCheckpoint()  # user-grain frame referenced by the score
    # domain AND the decile join-back (the qini rule)
    dom = u.groupBy("score").agg(F.count("*").cast("bigint").alias("c"))
    tot = dom.agg(F.sum("c").cast("bigint").alias("n"))
    # distributed exclusive prefix sum over the user-grain score
    # domain (functions/domain.py, ascending here: decile 9 = top)
    cum = dist_exclusive_prefix(dom, [("score", False)], ["c"]).selectExpr(
        "score", "CAST(_pre_c AS BIGINT) AS cal"
    )
    binned = (
        u.join(cum, "score")
        .crossJoin(F.broadcast(tot))
        .selectExpr("good", "least(9, 10 * cal div n) AS decile")
    )
    cells = binned.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("good").cast("bigint").alias("n_good"),
        F.expr("CAST(count(*) - sum(good) AS BIGINT)").alias("n_bad"),
    )
    g = cells.agg(
        F.sum("n_good").cast("bigint").alias("gt"),
        F.sum("n_bad").cast("bigint").alias("bt"),
    )
    t = cells.crossJoin(F.broadcast(g)).selectExpr(
        "decile",
        "n_users",
        "n_good",
        "n_bad",
        "CASE WHEN n_good = 0 OR n_bad = 0 THEN NULL"
        " ELSE round(ln(CAST(n_good * bt AS DOUBLE)"
        " / CAST(n_bad * gt AS DOUBLE)), 6) END AS woe",
        "CASE WHEN n_good = 0 OR n_bad = 0 THEN NULL"
        " ELSE CAST(round((CAST(n_good AS DOUBLE) / gt"
        " - CAST(n_bad AS DOUBLE) / bt)"
        " * ln(CAST(n_good * bt AS DOUBLE)"
        " / CAST(n_bad * gt AS DOUBLE)), 9) AS DECIMAL(28,9))"
        " END AS term",
    )
    w_all = Window.partitionBy()
    return (
        t.select(
            "decile",
            "n_users",
            "n_good",
            "n_bad",
            "woe",
            F.round(F.col("term").cast("double"), 6).alias("iv_term"),
            F.round(F.sum("term").over(w_all).cast("double"), 6).alias(
                "iv_total"
            ),
        )
        .orderBy("decile")
    )

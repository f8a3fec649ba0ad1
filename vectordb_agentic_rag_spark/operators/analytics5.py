"""Round-7 waves 9-12: coreness decomposition, nonparametric trend and
paired tests, funnel/cohort KPIs, curation diversity, split-leakage
reporting, and embedding drift.

graph_core_number extends graph_kcore from membership-at-one-k to the
full coreness map via the h-index fixpoint (Lu et al. 2016, "H-index
and coreness of networks": iterating c_{t+1}(v) = H-index of the
neighbors' c_t converges exactly to the peeling core number — measured
on this fixture: <= 21 rounds at every sf, bit-equal to brute-force
peeling). agg_mann_kendall_trend is the significance test companion to
win_theil_sen_slope's robust slope estimate, run on the day-domain
series like agg_autocorr_daily / agg_durbin_watson_daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .analytics4 import _copurchase_edges

# ---------------------------------------------------------------------------
# graph_core_number
# ---------------------------------------------------------------------------

_CORE_ROUNDS = 32  # measured h-index fixpoint depth <= 21 at every sf


def _core_oracle() -> str:
    """Unrolled h-index rounds (every CTE MATERIALIZED — DuckDB
    inlines per reference and round i feeds round i+1 twice). Extra
    rounds past the fixpoint are identity maps, so the round-32 labels
    equal the converged coreness whenever the iteration converges in
    budget — and the Spark side RAISES if it does not."""
    parts = [
        """os AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    d AS MATERIALIZED (
      SELECT u AS m, v AS n FROM e UNION ALL SELECT v AS m, u AS n FROM e),
    c0 AS MATERIALIZED (
      SELECT m AS n, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY m)"""
    ]
    for i in range(_CORE_ROUNDS):
        parts.append(
            f"""x{i} AS MATERIALIZED (
      SELECT d.m AS n, c{i}.c AS cv,
             row_number() OVER (PARTITION BY d.m
                                ORDER BY c{i}.c DESC, d.n) AS r
      FROM d JOIN c{i} ON d.n = c{i}.n),
    c{i + 1} AS MATERIALIZED (
      SELECT n, CAST(coalesce(max(CASE WHEN cv >= r THEN r END), 0)
                     AS BIGINT) AS c
      FROM x{i} GROUP BY n)"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT n AS part_key, c AS core_number FROM c{_CORE_ROUNDS}"""
    )


@query("graph_core_number", oracle=_core_oracle())
def graph_core_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL CORENESS DECOMPOSITION of the support-2 part co-purchase
    graph: every node's core number (the largest k whose k-core still
    contains it) — the standard graph-density ranking behind
    community cores, influential-spreader selection, and graph
    sparsification (graph_kcore answers membership at ONE k; this is
    the whole map).

    Mechanism: the H-INDEX FIXPOINT (Lu et al. 2016) — start from
    degrees and iterate c(v) <- H-index of neighbors' c until nothing
    changes; the fixpoint is exactly the peeling core number (pinned
    against brute-force peeling in tests). This iteration is the
    distributed-friendly formulation: each round is one edge-label
    join, one per-NODE ranking window (bounded by degree), and one
    hash aggregate — no sequential peel order, so at 100 TB every
    round is three keyed shuffles over the (domain-bounded,
    checkpointed) edge list. Round budget 32 = _CORE_ROUNDS (measured
    fixpoint depth <= 21 on every fixture sf); early exit on the
    first unchanged round (one scalar count per round, the
    graph_kcore discipline), RAISE if the budget is exhausted
    unconverged — which is what makes the fixed-unroll oracle exact.

    Parity: pure integer ranking and counting — no floats."""
    e = _copurchase_edges(spark, sf_dir)
    n_edges = e.count()
    loop_partitions = max(1, min(200, n_edges // 1_000_000 + 1))
    conf = spark.conf
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    conf.set("spark.sql.adaptive.enabled", "false")
    d = e.select(F.col("u").alias("m"), F.col("v").alias("n")).unionAll(
        e.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    converged = False
    try:
        d = d.localCheckpoint()
        c = (
            d.groupBy(F.col("m").alias("n"))
            .agg(F.count("*").cast("bigint").alias("c"))
            .localCheckpoint()
        )
        wr = Window.partitionBy("m").orderBy(F.col("cv").desc(), "n")
        for _ in range(_CORE_ROUNDS):
            x = (
                d.join(c, "n")
                .select("m", "n", F.col("c").alias("cv"))
                .withColumn("r", F.row_number().over(wr))
            )
            nc = (
                x.groupBy(F.col("m").alias("n"))
                .agg(
                    F.coalesce(
                        F.max(F.when(F.col("cv") >= F.col("r"), F.col("r"))),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("c")
                )
                .localCheckpoint()
            )
            changed = (
                nc.join(c.withColumnRenamed("c", "old"), "n")
                .where(F.col("c") != F.col("old"))
                .count()
            )
            c = nc
            if changed == 0:
                converged = True
                break
    finally:
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
    if not converged:
        raise RuntimeError(
            f"h-index coreness not converged after {_CORE_ROUNDS} rounds — "
            "raise the budget for graphs with deeper degeneracy"
        )
    return c.select(F.col("n").alias("part_key"), F.col("c").alias("core_number"))


# ---------------------------------------------------------------------------
# agg_mann_kendall_trend
# ---------------------------------------------------------------------------


@query(
    "agg_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, day,
             CAST(round(CAST(cents AS DOUBLE) / cnt / 100.0, 6)
                  AS DECIMAL(18,6)) AS m
      FROM daily),
    pr AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.m > a.m THEN 1
                           WHEN b.m < a.m THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM s a JOIN s b
        ON a.event_type = b.event_type AND b.day > a.day
      GROUP BY a.event_type),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd FROM s
           GROUP BY event_type),
    ties AS (
      SELECT event_type,
             CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS t
            FROM s GROUP BY event_type, m) z
      WHERE t > 1 GROUP BY event_type),
    v AS (
      SELECT nn.event_type, nn.nd, pr.s_stat, pr.n_pairs,
             (CAST(nn.nd AS DOUBLE) * (nn.nd - 1) * (2 * nn.nd + 5)
              - coalesce(t.tie_term, 0)) / 18.0 AS var_s
      FROM nn JOIN pr ON nn.event_type = pr.event_type
      LEFT JOIN ties t ON nn.event_type = t.event_type)
    SELECT event_type, nd AS n_days, s_stat, n_pairs,
           round(var_s, 6) AS var_s,
           round(CASE WHEN s_stat > 0
                      THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_s)
                      WHEN s_stat < 0
                      THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_s)
                      ELSE 0.0 END, 6) AS z_stat
    FROM v WHERE var_s > 0
    """,
)
def agg_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST on the daily-mean value series per
    event type: S = sum of pairwise sign(later - earlier), its
    tie-corrected variance, and the continuity-corrected z statistic
    — the nonparametric "is there a monotone trend at all?"
    significance test that pairs with win_theil_sen_slope's slope
    ESTIMATE (the two are the classic Mann-Kendall/Sen duo) and with
    agg_autocorr_daily / agg_durbin_watson_daily on the same
    day-domain series.

    Scale shape: the fact table collapses to the DAY x TYPE domain
    once (map-side-combinable exact-cents pre-aggregate); the O(d²)
    pairwise sign sum is a self-join of that bounded domain
    (hundreds of days — never fact rows), and ties come from one
    more domain aggregate.

    Parity: daily means are the shared round(6) DECIMAL quantization,
    so every sign comparison is exact; S, pair counts, and tie terms
    are exact integers; variance and z assemble in shared-text DOUBLE
    (sqrt only), one round(6) each."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.count("*").alias("cnt"),
    )
    s = daily.select(
        "event_type",
        "day",
        F.expr(
            "CAST(round(CAST(cents AS DOUBLE) / cnt / 100.0, 6)"
            " AS DECIMAL(18,6))"
        ).alias("m"),
    ).localCheckpoint()  # domain-bounded; referenced by 3 aggregates
    a = s.select("event_type", F.col("day").alias("da"), F.col("m").alias("ma"))
    b = s.select("event_type", F.col("day").alias("db"), F.col("m").alias("mb"))
    pr = (
        a.join(b, "event_type")
        .where(F.col("db") > F.col("da"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("mb") > F.col("ma"), 1)
                .when(F.col("mb") < F.col("ma"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    nn = s.groupBy("event_type").agg(F.count("*").cast("bigint").alias("nd"))
    ties = (
        s.groupBy("event_type", "m")
        .agg(F.count("*").cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = (
        nn.join(pr, "event_type")
        .join(ties, "event_type", "left")
        .selectExpr(
            "event_type",
            "nd",
            "s_stat",
            "n_pairs",
            "(CAST(nd AS DOUBLE) * (nd - 1) * (2 * nd + 5)"
            " - coalesce(tie_term, 0)) / 18.0 AS var_s",
        )
    )
    return v.where(F.col("var_s") > 0).selectExpr(
        "event_type",
        "nd AS n_days",
        "s_stat",
        "n_pairs",
        "round(var_s, 6) AS var_s",
        "round(CASE WHEN s_stat > 0"
        " THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var_s)"
        " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var_s)"
        " ELSE 0.0 END, 6) AS z_stat",
    )


# ---------------------------------------------------------------------------
# agg_time_to_convert
# ---------------------------------------------------------------------------


@query(
    "agg_time_to_convert",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    fp AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.v_us
      GROUP BY e.user_id)
    SELECT fv.user_id, CAST(fv.v_us AS BIGINT) AS first_view_us,
           CAST(fp.p_us AS BIGINT) AS first_purchase_us,
           CAST((fp.p_us - fv.v_us) // 1000000 AS BIGINT) AS ttc_sec
    FROM fv JOIN fp ON fv.user_id = fp.user_id
    """,
)
def agg_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT per user: the first 'view' and the first
    'purchase' STRICTLY AFTER it, with the latency in whole seconds —
    the funnel-latency table every growth dashboard aggregates
    (win_sequence_match_funnel says WHO converts; this says HOW LONG
    conversion takes). Users who never view or never purchase after
    viewing drop out on both sides.

    Scale shape: two filtered min-aggregates keyed on user_id (the
    second pre-filtered by an equi-join on the first — at 100 TB both
    are one user-key exchange each with map-side partial mins; the
    event_type filters reach the scan).

    Parity: pure integer microsecond arithmetic; the seconds
    conversion is integer floor-division on both engines."""
    ev = table(spark, sf_dir, "events")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("v_us"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(fv, "user_id")
        .where(F.col("p_us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    return fv.join(fp, "user_id").select(
        "user_id",
        F.col("v_us").cast("bigint").alias("first_view_us"),
        F.col("p_us").cast("bigint").alias("first_purchase_us"),
        F.expr("CAST((p_us - v_us) DIV 1000000 AS BIGINT)").alias("ttc_sec"),
    )


# ---------------------------------------------------------------------------
# agg_cohort_overlap
# ---------------------------------------------------------------------------


@query(
    "agg_cohort_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu FROM ut
          GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT i.type_a, i.type_b, na.nu AS n_a, nb.nu AS n_b, i.n_both,
           round(CAST(i.n_both AS DOUBLE)
                 / (na.nu + nb.nu - i.n_both), 6) AS jaccard
    FROM inter i
    JOIN n na ON i.type_a = na.event_type
    JOIN n nb ON i.type_b = nb.event_type
    """,
)
def agg_cohort_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE OVERLAP between event types: for every type pair, the
    user-set intersection and Jaccard similarity — the cohort-overlap
    matrix behind "do purchasers also click?" segmentation questions,
    and the exact-set ground truth that sketch-based overlap
    (agg_hll_sketch_merge) approximates.

    Scale shape: one distinct (type, user) projection (user-key
    shuffle with map-side distinct), then a self-equi-join ON USER —
    each user carries at most |types| rows, so per-key fan-out is
    bounded by type-count squared, never by corpus size; type-level
    counts broadcast back onto the ~|types|² result rows.

    Parity: all counts exact integers; one division, round(6)."""
    ev = table(spark, sf_dir, "events")
    ut = ev.select("event_type", "user_id").distinct()
    n = ut.groupBy("event_type").agg(F.count("*").cast("bigint").alias("nu"))
    a = ut.select(F.col("event_type").alias("type_a"), "user_id")
    b = ut.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(n.select(F.col("event_type").alias("type_a"),
                                 F.col("nu").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(n.select(F.col("event_type").alias("type_b"),
                                 F.col("nu").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# pipeline_split_leakage_pairs
# ---------------------------------------------------------------------------


def _leakage_oracle() -> str:
    from .analytics import _ROLL_DUCK
    from .dedup import _DUCK_NGRAM_PAIRS, _DUCK_SHINGLES

    return f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    pairs AS ({_DUCK_NGRAM_PAIRS}),
    sp AS (
      SELECT doc_id,
             CASE WHEN {_ROLL_DUCK} % 10 = 9 THEN 'val' ELSE 'train' END
               AS split
      FROM documents),
    x AS (
      SELECT CASE WHEN sa.split = 'train' THEN p.doc_a ELSE p.doc_b END
               AS doc_train,
             CASE WHEN sa.split = 'train' THEN p.doc_b ELSE p.doc_a END
               AS doc_val,
             p.jac
      FROM pairs p
      JOIN sp sa ON p.doc_a = sa.doc_id
      JOIN sp sb ON p.doc_b = sb.doc_id
      WHERE sa.split <> sb.split)
    SELECT doc_train, doc_val, jac AS jaccard
    FROM x ORDER BY jac DESC, doc_train, doc_val LIMIT 50
    """


@query("pipeline_split_leakage_pairs", oracle=_leakage_oracle())
def pipeline_split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIR-LEVEL SPLIT-LEAKAGE report: the worst 50 near-duplicate
    pairs that STRADDLE the train/val boundary, oriented (train doc,
    val doc) with their shingle-Jaccard score — the actionable form
    of pipeline_train_val_split's bucket-level leakage COUNT (a count
    says contamination exists; evals need the exact offending pairs
    to purge or re-bucket, because a val doc near-duplicating a train
    doc inflates every benchmark it appears in). Composes the two
    pipelines verbatim: dedup_ngram_jaccard's verified >= 0.2 pairs x
    pipeline_train_val_split's content-hash split.

    Scale shape: the pair list is the prefix-filtered candidate
    pipeline (never all-pairs); the split label is one map-side hash
    per doc joined onto pair endpoints by doc key; top-50 is
    orderBy+limit on the already-round(6) score with id tiebreaks.

    Parity: both inputs reuse the exact CTE text of their parent
    oracles; the orientation CASE and the filter compare exact
    strings."""
    from .analytics import _ROLL_SPARK
    from .dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    sp = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.expr(_ROLL_SPARK) % 10 == 9, F.lit("val"))
        .otherwise("train")
        .alias("split"),
    )
    x = (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .select(
            F.when(F.col("sa") == "train", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("doc_train"),
            F.when(F.col("sa") == "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_val"),
            F.col("jac").alias("jaccard"),
        )
    )
    return x.orderBy(
        F.col("jaccard").desc(), "doc_train", "doc_val"
    ).limit(50)


# ---------------------------------------------------------------------------
# text_mattr_diversity
# ---------------------------------------------------------------------------

_MATTR_W = 50  # window length (tokens); docs shorter than W fall back to TTR


@query(
    "text_mattr_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.tok, t.pos FROM documents, LATERAL (
        SELECT unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos) t),
    wn AS (
      SELECT doc_id, pos,
             CAST(len(list_distinct(list(tok) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_MATTR_W - 1} PRECEDING AND CURRENT ROW)))
               AS BIGINT) AS dw,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_MATTR_W - 1} PRECEDING AND CURRENT ROW) AS fl
      FROM tok),
    agg AS (
      SELECT doc_id, CAST(max(pos) AS BIGINT) AS n_tokens,
             CAST(count(CASE WHEN fl = {_MATTR_W} THEN 1 END) AS BIGINT)
               AS n_windows,
             sum(CASE WHEN fl = {_MATTR_W}
                      THEN CAST(dw AS DECIMAL(10,6)) / {_MATTR_W}
                      ELSE CAST(0 AS DECIMAL(10,6)) END) AS sttr
      FROM wn GROUP BY doc_id),
    fullttr AS (
      SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS dfull
      FROM tok GROUP BY doc_id)
    SELECT a.doc_id, a.n_tokens, a.n_windows,
           round(CASE WHEN a.n_windows > 0
                      THEN CAST(a.sttr AS DOUBLE) / a.n_windows
                      ELSE CAST(f.dfull AS DOUBLE) / a.n_tokens END, 6)
             AS mattr_{_MATTR_W}
    FROM agg a JOIN fullttr f ON a.doc_id = f.doc_id
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR LEXICAL DIVERSITY (Covington & McFall 2010): the mean
    type-token ratio over every complete 50-token sliding window —
    the length-independent vocabulary-richness score that plain TTR
    is not (TTR decays mechanically with document length, so
    comparing docs of different lengths on TTR is a category error;
    Gopher-style quality stacks use windowed diversity for exactly
    this reason). Docs shorter than the window fall back to whole-doc
    TTR, flagged by n_windows = 0.

    Scale shape: one per-DOC ordered window (bounded by doc length)
    materializes each 50-token frame; distinctness is a JVM
    higher-order pass over the constant-size frame; the rollup is one
    keyed aggregate. The whole-doc fallback is a second keyed
    aggregate.

    Parity: window TTRs are EXACT decimals (dw/50 with dw an integer
    — scale 6 holds them exactly), summed order-independently; one
    final division and round(6)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    wf = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_MATTR_W - 1), Window.currentRow)
    )
    wn = tok.select(
        "doc_id",
        "pos",
        F.size(F.array_distinct(F.collect_list("tok").over(wf)))
        .cast("bigint")
        .alias("dw"),
        F.count("*").over(wf).alias("fl"),
    )
    agg = wn.groupBy("doc_id").agg(
        F.max("pos").cast("bigint").alias("n_tokens"),
        F.count(F.when(F.col("fl") == _MATTR_W, 1))
        .cast("bigint")
        .alias("n_windows"),
        F.sum(
            F.when(
                F.col("fl") == _MATTR_W,
                F.expr(f"CAST(dw AS DECIMAL(10,6)) / {_MATTR_W}"),
            ).otherwise(F.expr("CAST(0 AS DECIMAL(10,6))"))
        ).alias("sttr"),
    )
    fullttr = tok.groupBy("doc_id").agg(
        F.countDistinct("tok").cast("bigint").alias("dfull")
    )
    return agg.join(fullttr, "doc_id").selectExpr(
        "doc_id",
        "n_tokens",
        "n_windows",
        "round(CASE WHEN n_windows > 0"
        " THEN CAST(sttr AS DOUBLE) / n_windows"
        f" ELSE CAST(dfull AS DOUBLE) / n_tokens END, 6) AS mattr_{_MATTR_W}",
    )


# ---------------------------------------------------------------------------
# agg_bounce_rate
# ---------------------------------------------------------------------------


@query(
    "agg_bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged),
    sess AS (
      SELECT user_id, sess_no, count(*) AS n_events
      FROM numbered GROUP BY user_id, sess_no)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS bounce_rate
    FROM sess GROUP BY user_id
    """,
)
def agg_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNCE RATE per user: the fraction of the user's sessions
    containing exactly one event — the simplest engagement-quality
    KPI on top of gap-based sessionization, composed directly on
    agg_sessionize_batch's session definition (same 30-minute gap
    rule, same oracle CTE text).

    Scale shape: the sessionize windows and BOTH rollups (session
    event counts, per-user bounce summary) ride the single user_id
    hash exchange — sessionization's optimal one-shuffle shape
    extends through the KPI unchanged.

    Parity: counts exact, one division, round(6)."""
    from .relational import agg_sessionize_batch

    s = agg_sessionize_batch(spark, sf_dir)
    return s.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int"))
        .cast("bigint")
        .alias("n_bounces"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("int")).cast("double")
            / F.count("*"),
            6,
        ).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# vec_centroid_shift_drift
# ---------------------------------------------------------------------------


@query(
    "vec_centroid_shift_drift",
    oracle="""
    WITH dv AS (
      SELECT vec_id % 2 AS half, t.dim, CAST(round(t.val, 6)
             AS DECIMAL(16,6)) AS v
      FROM embeddings, LATERAL (
        SELECT unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS dim) t),
    m AS (
      SELECT half, dim, CAST(sum(v) AS DOUBLE) / count(*) AS mu
      FROM dv GROUP BY half, dim),
    p AS (
      SELECT a.dim, a.mu AS ma, b.mu AS mb
      FROM m a JOIN m b ON a.dim = b.dim AND a.half = 0 AND b.half = 1),
    s AS (
      SELECT
        CAST(sum(CAST(round((ma - mb) * (ma - mb), 9) AS DECIMAL(28,9)))
             AS DOUBLE) AS d2,
        CAST(sum(CAST(round(ma * mb, 9) AS DECIMAL(28,9))) AS DOUBLE) AS dot,
        CAST(sum(CAST(round(ma * ma, 9) AS DECIMAL(28,9))) AS DOUBLE) AS na,
        CAST(sum(CAST(round(mb * mb, 9) AS DECIMAL(28,9))) AS DOUBLE) AS nb
      FROM p),
    n AS (
      SELECT CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM embeddings)
    SELECT n.n_a, n.n_b,
           round(sqrt(s.d2), 6) AS centroid_l2_shift,
           round(s.dot / (sqrt(s.na) * sqrt(s.nb)), 6) AS centroid_cosine
    FROM s CROSS JOIN n
    """,
)
def vec_centroid_shift_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT between two corpus halves (vec_id parity as the
    deterministic stand-in for "last ingest vs this ingest"): the L2
    distance and cosine between the half centroids — the cheapest
    always-on drift monitor for an embedding column (a centroid shift
    means the upstream encoder or corpus mix changed, and every ANN
    index/codebok trained on the old geometry needs revalidation —
    the operational complement to vec_pairwise_cos_hist's geometry
    probe).

    Scale shape: one explode to (half, dim, value) and ONE keyed
    aggregate to 2 x dims rows; everything after runs on the bounded
    DIMENSION domain. Map-side partial sums make the fact pass one
    shuffle of 128 partial rows per partition at any corpus size.

    Parity: components quantize round(6) into exact DECIMAL sums;
    per-dim means divide in shared text; the 64-term dim-domain
    reductions quantize round(9) into DECIMAL; sqrt-only assembly,
    round(6)."""
    emb = table(spark, sf_dir, "embeddings")
    dv = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "half",
        (F.col("dim0") + 1).alias("dim"),
        F.expr("CAST(round(val, 6) AS DECIMAL(16,6))").alias("v"),
    )
    m = dv.groupBy("half", "dim").agg(
        F.expr("CAST(sum(v) AS DOUBLE) / count(*)").alias("mu")
    )
    p = (
        m.where(F.col("half") == 0)
        .select("dim", F.col("mu").alias("ma"))
        .join(
            m.where(F.col("half") == 1).select("dim", F.col("mu").alias("mb")),
            "dim",
        )
    )
    s = p.agg(
        F.expr(
            "CAST(sum(CAST(round((ma - mb) * (ma - mb), 9) AS DECIMAL(28,9)))"
            " AS DOUBLE)"
        ).alias("d2"),
        F.expr(
            "CAST(sum(CAST(round(ma * mb, 9) AS DECIMAL(28,9))) AS DOUBLE)"
        ).alias("dot"),
        F.expr(
            "CAST(sum(CAST(round(ma * ma, 9) AS DECIMAL(28,9))) AS DOUBLE)"
        ).alias("na"),
        F.expr(
            "CAST(sum(CAST(round(mb * mb, 9) AS DECIMAL(28,9))) AS DOUBLE)"
        ).alias("nb"),
    )
    n = emb.agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("int")).cast("bigint").alias("n_a"),
        F.sum((F.col("vec_id") % 2 == 1).cast("int")).cast("bigint").alias("n_b"),
    )
    return s.crossJoin(F.broadcast(n)).selectExpr(
        "n_a",
        "n_b",
        "round(sqrt(d2), 6) AS centroid_l2_shift",
        "round(dot / (sqrt(na) * sqrt(nb)), 6) AS centroid_cosine",
    )


# ---------------------------------------------------------------------------
# agg_two_proportion_ztest
# ---------------------------------------------------------------------------


@query(
    "agg_two_proportion_ztest",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    conv AS (SELECT user_id FROM events WHERE event_type = 'purchase'
             GROUP BY user_id HAVING count(*) >= 12),
    g AS (
      SELECT ut.event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM ut LEFT JOIN conv c ON ut.user_id = c.user_id
      WHERE ut.event_type IN ('view', 'click')
      GROUP BY ut.event_type),
    w AS (
      SELECT max(CASE WHEN event_type = 'view' THEN n END) AS n1,
             max(CASE WHEN event_type = 'view' THEN x END) AS x1,
             max(CASE WHEN event_type = 'click' THEN n END) AS n2,
             max(CASE WHEN event_type = 'click' THEN x END) AS x2
      FROM g)
    SELECT CAST(n1 AS BIGINT) AS n_view, CAST(x1 AS BIGINT) AS conv_view,
           CAST(n2 AS BIGINT) AS n_click, CAST(x2 AS BIGINT) AS conv_click,
           round(CAST(x1 AS DOUBLE) / n1, 6) AS p_view,
           round(CAST(x2 AS DOUBLE) / n2, 6) AS p_click,
           round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)),
                 6) AS z_stat
    FROM w
    """,
)
def agg_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST: do users who VIEW convert (>= 12
    purchase events — the fixture's every user purchases at least
    once, so plain any-purchase conversion is degenerately 1.0 and
    the pooled variance collapses to zero; the threshold was sized
    against the measured purchase-count distribution) at a different
    rate than users who CLICK? The textbook A/B significance test
    (pooled-variance normal approximation) on the cohort sets
    agg_cohort_overlap measures; on this null-by-construction fixture
    the two cohorts nearly coincide, so z correctly lands near 0 —
    the test DETECTING no effect is the honest expected output.

    Scale shape: one distinct (type, user) projection, a LEFT join
    against the distinct converter set keyed on user, one two-group
    aggregate, and a 1-row pivot — the fact table is touched twice,
    both passes map-side-combinable distincts.

    Parity: cohort and conversion counts are exact integers; the
    pooled z assembles in shared-text DOUBLE (sqrt only, decimal
    literals avoided via CAST(1 AS DOUBLE)), round(6)."""
    ev = table(spark, sf_dir, "events")
    ut = (
        ev.select("event_type", "user_id")
        .where(F.col("event_type").isin("view", "click"))
        .distinct()
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("np"))
        .where(F.col("np") >= 12)
        .select("user_id", F.lit(1).alias("cv"))
    )
    g = (
        ut.join(conv, "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.coalesce(F.col("cv"), F.lit(0))).cast("bigint").alias("x"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "view", F.col("x"))).alias("x1"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "click", F.col("x"))).alias("x2"),
    )
    return w.selectExpr(
        "CAST(n1 AS BIGINT) AS n_view",
        "CAST(x1 AS BIGINT) AS conv_view",
        "CAST(n2 AS BIGINT) AS n_click",
        "CAST(x2 AS BIGINT) AS conv_click",
        "round(CAST(x1 AS DOUBLE) / n1, 6) AS p_view",
        "round(CAST(x2 AS DOUBLE) / n2, 6) AS p_click",
        "round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
        " / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        " * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))"
        " * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)), 6) AS z_stat",
    )


# ---------------------------------------------------------------------------
# agg_wilcoxon_signed_rank
# ---------------------------------------------------------------------------


@query(
    "agg_wilcoxon_signed_rank",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             count(*) AS cnt
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
    s AS (
      SELECT event_type, day,
             CAST(round(CAST(cents AS DOUBLE) / cnt / 100.0, 6)
                  AS DECIMAL(18,6)) AS m
      FROM daily),
    d AS (
      SELECT a.day, a.m - b.m AS diff
      FROM s a JOIN s b ON a.day = b.day
        AND a.event_type = 'click' AND b.event_type = 'view'
      WHERE a.m <> b.m),
    v AS (
      SELECT abs(diff) AS av,
             CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS npos,
             CAST(count(*) AS BIGINT) AS ntv
      FROM d GROUP BY abs(diff)),
    r AS (
      SELECT av, npos, ntv,
             CAST(coalesce(sum(ntv) OVER (ORDER BY av
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_less
      FROM v),
    t AS (
      SELECT CAST(sum(npos * (2 * cum_less + ntv + 1)) AS BIGINT) AS two_wp,
             CAST(sum(ntv) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ntv > 1
                           THEN ntv * ntv * ntv - ntv ELSE 0 END)
                  AS BIGINT) AS tie3
      FROM r)
    SELECT n AS n_pairs,
           round(CAST(two_wp AS DOUBLE) / 2, 6) AS w_plus,
           round((CAST(two_wp AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - CAST(tie3 AS DOUBLE) / 48), 6) AS z_stat
    FROM t WHERE n >= 10
    """,
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILCOXON SIGNED-RANK test on PAIRED daily means (click vs view,
    matched by day): rank the absolute differences, sum the ranks of
    positive days, and z-test against the null median-zero — the
    paired nonparametric companion to agg_mann_whitney_u's unpaired
    rank-sum (pairing by day removes the between-day variance both
    series share, which the U test cannot).

    Scale shape: the day-domain collapse, then the mann_whitney
    value-domain rank trick — tied average ranks reconstructed from
    cumulative counts as INTEGERS (2*cum_less + block + 1, keeping 2x
    the rank sum), the one ordered cumulative running over distinct
    |difference| values (bounded domain), zero-differences dropped per
    the standard procedure, tie-corrected variance.

    Parity: differences of round(6) DECIMAL means are exact, so the
    sign/abs grouping and every rank integer match exactly; the z
    assembly is shared-text DOUBLE (sqrt only), one round(6)."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    )
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).cast("date").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.count("*").alias("cnt"),
    )
    s = daily.select(
        "event_type",
        "day",
        F.expr(
            "CAST(round(CAST(cents AS DOUBLE) / cnt / 100.0, 6)"
            " AS DECIMAL(18,6))"
        ).alias("m"),
    )
    d = (
        s.where(F.col("event_type") == "click")
        .select("day", F.col("m").alias("mc"))
        .join(
            s.where(F.col("event_type") == "view").select(
                "day", F.col("m").alias("mv")
            ),
            "day",
        )
        .where(F.col("mc") != F.col("mv"))
        .select((F.col("mc") - F.col("mv")).alias("diff"))
    )
    v = d.groupBy(F.abs(F.col("diff")).alias("av")).agg(
        F.sum((F.col("diff") > 0).cast("int")).cast("bigint").alias("npos"),
        F.count("*").cast("bigint").alias("ntv"),
    )
    wv = Window.orderBy("av").rowsBetween(Window.unboundedPreceding, -1)
    r = v.select(
        "av",
        "npos",
        "ntv",
        F.coalesce(F.sum("ntv").over(wv), F.lit(0))
        .cast("bigint")
        .alias("cum_less"),
    )
    t = r.agg(
        F.sum(F.col("npos") * (2 * F.col("cum_less") + F.col("ntv") + 1))
        .cast("bigint")
        .alias("two_wp"),
        F.sum("ntv").cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("ntv") > 1,
                F.col("ntv") * F.col("ntv") * F.col("ntv") - F.col("ntv"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tie3"),
    )
    return t.where(F.col("n") >= 10).selectExpr(
        "n AS n_pairs",
        "round(CAST(two_wp AS DOUBLE) / 2, 6) AS w_plus",
        "round((CAST(two_wp AS DOUBLE) / 2"
        " - CAST(n AS DOUBLE) * (n + 1) / 4)"
        " / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24"
        " - CAST(tie3 AS DOUBLE) / 48), 6) AS z_stat",
    )


# ---------------------------------------------------------------------------
# win_page_hinkley
# ---------------------------------------------------------------------------

_PH_MU = 50.0  # monitored in-control mean (fixture note: exp(50))
_PH_DELTA = 5.0  # drift magnitude tolerance (binary-exact)
_PH_LAMBDA = 300.0  # alarm threshold (sized: ~half the users alarm)


@query(
    "win_page_hinkley",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, round(value, 6) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    nn AS (SELECT user_id, max(rn) AS n FROM seq GROUP BY user_id),
    st AS (
      SELECT s.user_id, 1 AS i,
             s.x - {_PH_MU} - {_PH_DELTA} AS mt,
             least(0.0, s.x - {_PH_MU} - {_PH_DELTA}) AS mn,
             CASE WHEN (s.x - {_PH_MU} - {_PH_DELTA})
                       - least(0.0, s.x - {_PH_MU} - {_PH_DELTA})
                       > {_PH_LAMBDA} THEN 1 ELSE 0 END AS al
      FROM seq s WHERE s.rn = 1
      UNION ALL
      SELECT st.user_id, st.i + 1,
             st.mt + s.x - {_PH_MU} - {_PH_DELTA},
             least(st.mn, st.mt + s.x - {_PH_MU} - {_PH_DELTA}),
             st.al + CASE WHEN (st.mt + s.x - {_PH_MU} - {_PH_DELTA})
                               - least(st.mn,
                                       st.mt + s.x - {_PH_MU} - {_PH_DELTA})
                               > {_PH_LAMBDA} THEN 1 ELSE 0 END
      FROM st JOIN seq s ON s.user_id = st.user_id AND s.rn = st.i + 1)
    SELECT st.user_id, CAST(nn.n AS BIGINT) AS n_events,
           round(st.mt - st.mn, 6) AS ph_final,
           CAST(st.al AS BIGINT) AS n_alarms,
           CAST(CASE WHEN st.al > 0 THEN 1 ELSE 0 END AS BIGINT) AS alarmed
    FROM st JOIN nn ON st.user_id = nn.user_id AND st.i = nn.n
    """,
)
def win_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-HINKLEY upward-drift detector per user: accumulate
    m_t = sum(x - mu - delta), track its running MINIMUM, and alarm
    whenever m_t - min exceeds lambda — the min-anchored variant of
    CUSUM (win_cusum_changepoint clamps at zero each step; Page-
    Hinkley remembers how far the series has climbed off its lowest
    point, the standard concept-drift trigger in streaming-ML
    monitors). Constants sized against the fixture distribution
    (mu=50 per the events.value note; delta=5, lambda=300 alarms
    roughly half the users — an undiscriminating threshold tests
    nothing).

    Same per-key-bounded sequential-fold shape as win_cusum_
    changepoint: the series folds JVM-side as an (mt, mn, al) STRUCT
    accumulator in one user-key exchange; the oracle steps the
    identical left-associative float ops in a recursive CTE (struct
    list_reduce is broken in DuckDB — the standing note), so the fold
    is bit-exact on both engines and round(6) lands once."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"), "event_id",
                F.round("value", 6).alias("x"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sort_array(F.collect_list("s")).alias("ss"),
        )
    )
    step = f"s.mt + x - {_PH_MU}D - {_PH_DELTA}D"
    fold = F.expr(
        f"""aggregate(
          transform(ss, p -> p.x),
          named_struct('mt', CAST(0.0 AS DOUBLE),
                       'mn', CAST(0.0 AS DOUBLE),
                       'al', CAST(0 AS BIGINT),
                       'k', CAST(0 AS BIGINT)),
          (s, x) -> named_struct(
            'mt', {step},
            'mn', IF(s.k = 0, least(0.0D, {step}),
                     least(s.mn, {step})),
            'al', s.al + IF(({step})
                            - IF(s.k = 0, least(0.0D, {step}),
                                 least(s.mn, {step}))
                            > {_PH_LAMBDA}D,
                            CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
            'k', s.k + 1))"""
    )
    return v.select("user_id", "n_events", fold.alias("st")).select(
        "user_id",
        "n_events",
        F.round(F.col("st.mt") - F.col("st.mn"), 6).alias("ph_final"),
        F.col("st.al").alias("n_alarms"),
        (F.col("st.al") > 0).cast("bigint").alias("alarmed"),
    )


# ---------------------------------------------------------------------------
# pipeline_curriculum_order
# ---------------------------------------------------------------------------


def _curriculum_oracle() -> str:
    from .text import _STOPWORDS

    return f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({_STOPWORDS}, w))) AS stop_hits,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents),
    q AS (
      SELECT doc_id,
             round(0.5 * least(n_tokens / 64.0, 1.0)
                 + 0.25 * (1.0 - CAST(stop_hits AS DOUBLE) / n_tokens)
                 + 0.25 * (CAST(n_distinct AS DOUBLE) / n_tokens), 6)
               AS quality
      FROM t)
    SELECT doc_id, quality,
           CAST(row_number() OVER (ORDER BY quality DESC, doc_id)
                AS BIGINT) AS curriculum_rank
    FROM q
    """


@query("pipeline_curriculum_order", oracle=_curriculum_oracle())
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL CURRICULUM ORDERING: every document's rank under
    (quality DESC, doc_id) — the deterministic ordering a quality-
    curriculum training run feeds its data loader (clean data first;
    anti-curriculum is the same rank read backwards). The quality
    score is text_quality_score's exact formula (0.5*length-saturation
    + 0.25*(1 - stopword-ratio) + 0.25*distinct-ratio — reused by
    IMPORT on the Spark side and by the identical CTE text in the
    oracle).

    Scale shape — the two-pass VALUE-DOMAIN rank, never a global
    row_number over the corpus (pipeline_shard_assign's machinery on
    a float score): round(6) quantization makes the score domain a
    bounded grid (<= ~1.5e6 distinct values at ANY corpus size), so
    (1) per-score counts + an ordered cumulative over the DOMAIN give
    each score its global offset, (2) a PARTITIONED window ranks
    within each score bucket by doc_id, and offset + within-rank
    reproduces the exact total order. The oracle keeps the textbook
    global window.

    Parity: both engines compute the identical rounded score (exact
    integer ratios, shared formula shape), so bucket keys and ranks
    match exactly."""
    from .text import text_quality_score

    q = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    cnt = q.groupBy("quality").agg(F.count("*").alias("c"))
    wd = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = cnt.select(
        "quality",
        F.coalesce(F.sum("c").over(wd), F.lit(0)).cast("bigint").alias("off"),
    )
    wr = Window.partitionBy("quality").orderBy("doc_id")
    return (
        q.join(F.broadcast(off), "quality")
        .select(
            "doc_id",
            "quality",
            (F.col("off") + F.row_number().over(wr))
            .cast("bigint")
            .alias("curriculum_rank"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_weighted_jaccard_rescore
# ---------------------------------------------------------------------------


def _weighted_jac_oracle() -> str:
    from .dedup import _DUCK_NGRAM_PAIRS, _DUCK_SHINGLES

    return f"""
    WITH sh AS ({_DUCK_SHINGLES}),
    pairs AS ({_DUCK_NGRAM_PAIRS}),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sh),
    df AS (
      SELECT t.code, CAST(count(*) AS BIGINT) AS d
      FROM sh, unnest(sh.g) AS t(code) GROUP BY t.code),
    w AS (
      SELECT df.code,
             CAST(round(ln(CAST(nn.n AS DOUBLE) / df.d), 9)
                  AS DECIMAL(28,9)) AS wt
      FROM df CROSS JOIN nn),
    pu AS (
      SELECT p.doc_a, p.doc_b, p.jac, t.code,
             CASE WHEN list_contains(a.g, t.code)
                   AND list_contains(b.g, t.code)
                  THEN 1 ELSE 0 END AS both
      FROM pairs p
      JOIN sh a ON p.doc_a = a.doc_id
      JOIN sh b ON p.doc_b = b.doc_id,
      unnest(list_distinct(a.g || b.g)) AS t(code)),
    sc AS (
      SELECT pu.doc_a, pu.doc_b, max(pu.jac) AS jac,
             sum(CASE WHEN pu.both = 1 THEN w.wt
                      ELSE CAST(0 AS DECIMAL(28,9)) END) AS wi,
             sum(w.wt) AS wu
      FROM pu JOIN w ON pu.code = w.code
      GROUP BY pu.doc_a, pu.doc_b)
    SELECT doc_a, doc_b, jac AS jaccard_unweighted,
           round(CAST(wi AS DOUBLE) / CAST(wu AS DOUBLE), 6)
             AS jaccard_weighted
    FROM sc
    ORDER BY CAST(wi AS DOUBLE) / CAST(wu AS DOUBLE) DESC, doc_a, doc_b
    LIMIT 50
    """


@query("dedup_weighted_jaccard_rescore", oracle=_weighted_jac_oracle())
def dedup_weighted_jaccard_rescore(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IDF-WEIGHTED JACCARD re-scoring of near-dup candidates: every
    dedup_ngram_jaccard pair re-scored as sum(idf of shared shingles)
    / sum(idf of all shingles), top-50 — unweighted Jaccard treats a
    stopword shingle ("a the a") and a rare content shingle as equal
    evidence; idf weighting is how production near-dup scoring
    separates boilerplate overlap from genuinely copied content
    (the same rarity principle the candidate generator already
    exploits via rarity-ordered prefixes). Reported next to the
    unweighted score so the re-ranking is visible.

    Scale shape: candidates come from the prefix-filtered pipeline
    (never all-pairs); shingle document frequencies are one
    vocabulary-keyed aggregate; each pair explodes its bounded
    (<= 2 x doc shingles) union and joins weights BY CODE KEY — a
    keyed shuffle, not a broadcast, because a real corpus's shingle
    vocabulary outgrows any executor. Top-50 via orderBy+limit on the
    exact ratio.

    Parity: idf quantizes round(9) into DECIMAL before the
    order-independent pair sums; both engines then divide the same
    exact decimals (cast to DOUBLE with identical text) and order by
    that ratio with id tiebreaks."""
    from .dedup import _ngram_sets, dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    cs = _ngram_sets(spark, sf_dir).select("doc_id", "cs")
    nn = cs.count()  # bounded scalar: one count of the doc dimension
    df = (
        cs.select(F.explode("cs").alias("code"))
        .groupBy("code")
        .agg(F.count("*").alias("d"))
    )
    w = df.select(
        "code",
        F.expr(
            f"CAST(round(ln(CAST({nn} AS DOUBLE) / d), 9) AS DECIMAL(28,9))"
        ).alias("wt"),
    )
    pu = (
        pairs.join(
            cs.select(F.col("doc_id").alias("doc_a"), F.col("cs").alias("ca")),
            "doc_a",
        )
        .join(
            cs.select(F.col("doc_id").alias("doc_b"), F.col("cs").alias("cb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "jac",
            F.explode(F.array_union("ca", "cb")).alias("code"),
            F.expr(
                "CAST(array_contains(ca, code) AND array_contains(cb, code)"
                " AS INT)"
            ).alias("both"),
        )
    )
    sc = (
        pu.join(w, "code")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("jac").alias("jac"),
            F.sum(
                F.when(F.col("both") == 1, F.col("wt")).otherwise(
                    F.expr("CAST(0 AS DECIMAL(28,9))")
                )
            ).alias("wi"),
            F.sum("wt").alias("wu"),
        )
    )
    ratio = F.expr("CAST(wi AS DOUBLE) / CAST(wu AS DOUBLE)")
    return (
        sc.orderBy(ratio.desc(), "doc_a", "doc_b")
        .limit(50)
        .select(
            "doc_a",
            "doc_b",
            F.col("jac").alias("jaccard_unweighted"),
            F.round(ratio, 6).alias("jaccard_weighted"),
        )
    )


# ---------------------------------------------------------------------------
# graph_truss_decomposition
# ---------------------------------------------------------------------------

_TRUSS_K = 3  # 3-truss: every surviving edge closes >= 1 triangle
_TRUSS_ROUNDS = 8  # measured peeling depth: 1 round at every fixture sf


def _edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical (u < v) edge list via
    ONE wedge self-join (cost = wedge mass) + a semi-probe back into
    the edge list — shared by graph_truss_decomposition and
    graph_truss_number."""
    d = edges.select(F.col("u").alias("m"), F.col("v").alias("n")).unionAll(
        edges.select(F.col("v").alias("m"), F.col("u").alias("n"))
    )
    a = d.select(F.col("m").alias("u"), F.col("n").alias("w"))
    b = d.select(F.col("m").alias("v"), F.col("n").alias("w"))
    return (
        a.join(b, "w")
        .where(F.col("u") < F.col("v"))
        .join(edges, ["u", "v"])
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("sup"))
    )


def _truss_oracle() -> str:
    """Unrolled support-peeling rounds, every CTE MATERIALIZED (the
    DuckDB per-reference-inlining rule). Rounds past the fixpoint are
    identity filters; the Spark side raises if the budget is hit."""
    parts = [
        """os AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)"""
    ]
    for i in range(_TRUSS_ROUNDS):
        parts.append(
            f"""d{i} AS MATERIALIZED (
      SELECT u AS m, v AS n FROM e{i} UNION ALL SELECT v AS m, u AS n FROM e{i}),
    s{i} AS MATERIALIZED (
      SELECT a.m AS u, b.m AS v, CAST(count(*) AS BIGINT) AS sup
      FROM d{i} a JOIN d{i} b ON a.n = b.n AND a.m < b.m
      JOIN e{i} t ON t.u = a.m AND t.v = b.m
      GROUP BY a.m, b.m),
    e{i + 1} AS MATERIALIZED (
      SELECT s.u, s.v FROM s{i} s WHERE s.sup >= {_TRUSS_K - 2})"""
        )
    R = _TRUSS_ROUNDS
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f""",
    df AS MATERIALIZED (
      SELECT u AS m, v AS n FROM e{R} UNION ALL SELECT v AS m, u AS n FROM e{R}),
    sf AS (
      SELECT a.m AS u, b.m AS v, CAST(count(*) AS BIGINT) AS sup
      FROM df a JOIN df b ON a.n = b.n AND a.m < b.m
      JOIN e{R} t ON t.u = a.m AND t.v = b.m
      GROUP BY a.m, b.m)
    SELECT u AS part_u, v AS part_v, sup AS truss_support FROM sf"""
    )


@query("graph_truss_decomposition", oracle=_truss_oracle())
def graph_truss_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-TRUSS (k = _TRUSS_K = 3) of the support-2 part co-purchase
    graph: iteratively delete every edge closing fewer than k-2
    triangles until a fixpoint; survivors with their in-truss
    triangle support form the maximal subgraph where every EDGE is
    triangle-reinforced — the edge-level strengthening of graph_kcore
    (a k-truss is always inside the (k-1)-core, but prunes weakly
    attached edges a node-degree criterion keeps), the standard
    community-backbone extractor (Cohen 2008).

    Scale shape, the graph_kcore loop disciplines applied per EDGE:
    each round computes per-edge triangle support with ONE wedge
    self-join over the checkpointed (domain-bounded) edge list —
    cost = wedge mass, the quantity the analytics2 wedge-mass note
    budgets per support gate — then semi-filters the edge list;
    localCheckpoint truncates lineage per round; edge-count equality
    witnesses the fixpoint (deletion is monotone); the budget of 8
    rounds (measured depth: 1 at every fixture sf) RAISES when
    exhausted, which is what makes the unrolled fixed-round oracle
    exact.

    Parity: pure integer counting; the triangle probe joins on the
    canonical u < v edge orientation identically on both engines."""
    e = _copurchase_edges(spark, sf_dir)
    n_edges = e.count()
    loop_partitions = max(1, min(200, n_edges // 1_000_000 + 1))
    conf = spark.conf
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    conf.set("spark.sql.adaptive.enabled", "false")

    support = _edge_support

    converged = False
    try:
        edges, prev = e.localCheckpoint(), n_edges
        for _ in range(_TRUSS_ROUNDS):
            edges = (
                support(edges)
                .where(F.col("sup") >= _TRUSS_K - 2)
                .select("u", "v")
                .localCheckpoint()
            )
            cur = edges.count()
            if cur == prev:
                converged = True
                break
            prev = cur
        out = support(edges)
    finally:
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
    if not converged:
        raise RuntimeError(
            f"k-truss peeling not converged after {_TRUSS_ROUNDS} rounds — "
            "raise the budget for deeper truss hierarchies"
        )
    return out.select(
        F.col("u").alias("part_u"),
        F.col("v").alias("part_v"),
        F.col("sup").alias("truss_support"),
    )


# ---------------------------------------------------------------------------
# agg_kll_quantile_sketch
# ---------------------------------------------------------------------------

_KLL_BUF = 256  # compactor capacity per level
_KLL_TAUS = (0.1, 0.25, 0.5, 0.75, 0.9)
_KLL_EPS = 0.05  # asserted rank-error floor (measured ~<= 0.01)


def _kll_partition_summary(batches):
    """Deterministic KLL-style compactor over one partition's value
    stream: level i holds items of weight 2^i in a capacity-_KLL_BUF
    buffer; a full buffer sorts and promotes its EVEN ranks (the
    deterministic stand-in for KLL's random offset — reproducibility
    over the last epsilon of accuracy). Memory is
    O(_KLL_BUF * log(n/_KLL_BUF)) regardless of partition size."""
    import pandas as pd

    levels: list[list[float]] = [[]]

    def push(lvl: int, x: float) -> None:
        while len(levels) <= lvl:
            levels.append([])
        levels[lvl].append(x)
        if len(levels[lvl]) >= _KLL_BUF:
            buf = sorted(levels[lvl])
            levels[lvl] = []
            for y in buf[0::2]:
                push(lvl + 1, y)

    for pdf in batches:
        for x in pdf["value"].to_numpy():
            push(0, float(x))
    out = [
        (v, 1 << lvl) for lvl, items in enumerate(levels) for v in items
    ]
    yield pd.DataFrame(out, columns=["v", "w"])


@query("agg_kll_quantile_sketch")  # rows-only BY DESIGN (SURVEY §8):
# the summary's content depends on partitioning and the compactor
# schedule — engine-specific internals no SQL twin can reproduce. The
# in-plan rank-error assert + pytest determinism/error tests are the
# check (the vec_lsh_ann recall-floor pattern).
def agg_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH (KLL-style, Karnin-Lang-Liberty
    2016) over event values: each partition folds its stream through
    fixed-size compactor levels (capacity 256, weights 2^level,
    deterministic even-rank promotion), the per-partition summaries
    union into one bounded weighted sample, and quantile estimates
    read off the weighted CDF — the sketch a 100 TB pipeline ships to
    the driver when agg_exact_quantile_2pass's two full passes are
    too expensive and percentile_approx's opaque internals can't be
    audited. Bounded memory per task, one pass over the data, summary
    size O(parts * 256 * log(n)).

    SELF-CHECK IN-PLAN: each estimate's TRUE rank fraction is
    recomputed against the full dataset (one conditional-aggregation
    pass) and assert_true(|rank - tau| <= 0.05) rides a filter that
    keeps rows unchanged while the bound holds — measured error is
    <= ~0.01; the wide floor survives fixture regeneration (the ANN
    recall-floor discipline). Rows-only by design: the summary
    content depends on partitioning, which no SQL oracle can twin."""
    import pandas as pd  # noqa: F401 — worker-side dependency

    ev = table(spark, sf_dir, "events").select("value")
    summary = ev.mapInPandas(_kll_partition_summary, "v double, w long")
    wcum = Window.orderBy("v", "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the summary is sketch-bounded (parts * 256 * levels rows), so the
    # ordered window runs over the SUMMARY domain, never the data
    cum = summary.select(
        "v", F.sum("w").over(wcum).alias("cw")
    ).crossJoin(
        F.broadcast(summary.agg(F.sum("w").alias("tw")))
    )
    taus = F.explode(
        F.array(*[F.lit(t) for t in _KLL_TAUS])
    ).alias("tau")
    est = (
        cum.select("v", "cw", "tw")
        .crossJoin(F.broadcast(spark.range(1).select(taus)))
        .where(F.col("cw") >= F.col("tau") * F.col("tw"))
        .groupBy("tau")
        .agg(F.min("v").alias("est_value"))
    )
    n_total = ev.count()  # bounded scalar for the self-check pass
    ranks = (
        ev.crossJoin(F.broadcast(est))
        .groupBy("tau", "est_value")
        .agg(
            (F.sum((F.col("value") <= F.col("est_value")).cast("long"))
             / F.lit(float(n_total))).alias("true_rank_frac")
        )
    )
    checked = ranks.where(
        F.expr(
            f"assert_true(abs(true_rank_frac - tau) <= {_KLL_EPS}, "
            "'KLL rank error above floor') IS NULL"
        )
    )
    return checked.select(
        "tau",
        F.round("est_value", 6).alias("est_value"),
        F.round("true_rank_frac", 6).alias("true_rank_frac"),
    )


# ---------------------------------------------------------------------------
# graph_truss_number
# ---------------------------------------------------------------------------

# Budgets cover the ORACLE-CHECKED fixtures with margin: sf0.01 and
# sf0.1 measure max truss 3 and inner peel depth <= 3 (sf0.001's
# deeper hierarchy — truss 5, depth 32 at k=5 — is exercised by the
# pytest through the synthetic-graph helper path, not the oracle).
# Both budgets RAISE on exhaustion, so a regenerated fixture that
# outgrows the unrolled oracle fails loudly, never mismatches.
_TRUSSN_KMAX = 6  # stage budget; fixture max truss number is 3
_TRUSSN_ROUNDS = 8  # inner peel budget per stage; measured depth <= 3


def _trussn_oracle() -> str:
    """Full truss decomposition as unrolled per-stage peeling: for
    k = 3..KMAX, peel support < k-2 for a FIXED number of rounds
    (identity rounds past the fixpoint are harmless no-ops — the Spark
    side RAISES if its convergence budget is hit, so a too-shallow
    unroll can never silently diverge from it), then label the edges
    stage k removed with truss number k-1. Every per-round CTE is
    MATERIALIZED (DuckDB inlines every CTE reference; an unrolled
    iteration without it explodes exponentially — round-7 note)."""
    parts = [
        """os AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    t2 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)"""
    ]
    for k in range(3, _TRUSSN_KMAX + 1):
        prev = f"t{k - 1}"
        for r in range(_TRUSSN_ROUNDS):
            src = prev if r == 0 else f"e{k}_{r - 1}"
            parts.append(
                f"""d{k}_{r} AS MATERIALIZED (
      SELECT u AS m, v AS n FROM {src} UNION ALL SELECT v AS m, u AS n FROM {src}),
    s{k}_{r} AS MATERIALIZED (
      SELECT a.m AS u, b.m AS v, CAST(count(*) AS BIGINT) AS sup
      FROM d{k}_{r} a JOIN d{k}_{r} b ON a.n = b.n AND a.m < b.m
      JOIN {src} t ON t.u = a.m AND t.v = b.m
      GROUP BY a.m, b.m),
    e{k}_{r} AS MATERIALIZED (
      SELECT u, v FROM s{k}_{r} WHERE sup >= {k - 2})"""
            )
        parts.append(
            f"t{k} AS MATERIALIZED (SELECT u, v FROM e{k}_{_TRUSSN_ROUNDS - 1})"
        )
    labels = [
        f"""SELECT u AS part_u, v AS part_v, CAST({k - 1} AS BIGINT) AS truss_number
    FROM (SELECT u, v FROM t{k - 1} EXCEPT SELECT u, v FROM t{k}) x{k}"""
        for k in range(3, _TRUSSN_KMAX + 1)
    ]
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(labels)
    )


@query("graph_truss_number", oracle=_trussn_oracle())
def graph_truss_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL TRUSS DECOMPOSITION of the support-2 part co-purchase
    graph: every edge's TRUSS NUMBER — the maximum k such that the
    edge survives in the k-truss (graph_truss_decomposition extracts
    only the single k=3 shell; this is the edge-level analogue of
    graph_core_number's full coreness map, the complete cohesion
    hierarchy community detection peels from — Cohen 2008, Wang &
    Cheng VLDB'12). An edge with truss number t sits in a subgraph
    where every edge closes >= t-2 triangles; the fixture's hierarchy
    tops out at truss 3 (probed: max 3, inner peel depth <= 3 at
    sf0.01 AND sf0.1).

    Algorithm — staged peeling, each stage the graph_kcore loop
    discipline applied per EDGE: for k = 3, 4, ...: peel edges with
    support < k-2 to a fixpoint (support recomputed per round with
    ONE wedge self-join over the localCheckpoint-ed, domain-bounded
    edge list — _edge_support, cost = wedge mass); edges stage k
    removes carry truss number k-1 (they were in the (k-1)-truss but
    not the k-truss); stop when the edge set empties. Edge-count
    equality witnesses each fixpoint (deletion is monotone); both the
    inner round budget (_TRUSSN_ROUNDS = 8 per stage) and the stage
    budget (k <= _TRUSSN_KMAX = 6) RAISE on exhaustion — wrong-label
    output is impossible, which is what licenses the fixed-round
    unrolled oracle. Shuffle partitions are temporarily sized to the
    edge count and restored in finally (tiny-loop scheduling note).

    Parity: pure integer support counting on the canonical u < v
    orientation; stage k's removed-edge set is an anti-join on both
    engines (EXCEPT in the oracle — edge lists are duplicate-free)."""
    e = _copurchase_edges(spark, sf_dir)
    out = _truss_number_map(
        spark, e, e.count(), kmax=_TRUSSN_KMAX, rounds=_TRUSSN_ROUNDS
    )
    return out.select(
        F.col("u").alias("part_u"),
        F.col("v").alias("part_v"),
        F.col("truss").alias("truss_number"),
    )


def _truss_number_map(
    spark: SparkSession,
    e: DataFrame,
    n_edges: int,
    kmax: int,
    rounds: int,
) -> DataFrame:
    """Staged truss peeling over a canonical (u < v) edge list,
    returning (u, v, truss) with one row per input edge. Budgets
    RAISE on exhaustion (wrong labels impossible); factored out so
    the pytest can drive it on synthetic deep-hierarchy graphs the
    fixtures don't contain."""
    loop_partitions = max(1, min(200, n_edges // 1_000_000 + 1))
    conf = spark.conf
    old_sp = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    conf.set("spark.sql.adaptive.enabled", "false")
    labeled: list[DataFrame] = []
    try:
        edges, cnt = e.localCheckpoint(), n_edges
        for k in range(3, kmax + 1):
            stage_in, converged = edges, False
            for _ in range(rounds):
                nxt = (
                    _edge_support(edges)
                    .where(F.col("sup") >= k - 2)
                    .select("u", "v")
                    .localCheckpoint()
                )
                c = nxt.count()
                if c == cnt:
                    converged = True
                    edges = nxt
                    break
                edges, cnt = nxt, c
            if not converged:
                raise RuntimeError(
                    f"truss stage k={k} not converged in "
                    f"{rounds} rounds — raise the budget"
                )
            labeled.append(
                stage_in.join(edges, ["u", "v"], "left_anti").select(
                    "u", "v", F.lit(k - 1).cast("bigint").alias("truss")
                )
            )
            if cnt == 0:
                break
        if cnt != 0:
            raise RuntimeError(
                f"truss hierarchy deeper than k={kmax} — "
                "raise the stage budget"
            )
        out = labeled[0]
        for part in labeled[1:]:
            out = out.unionAll(part)
        # bounded: one row per input edge
        return out.localCheckpoint()
    finally:
        conf.set("spark.sql.shuffle.partitions", old_sp)
        conf.set("spark.sql.adaptive.enabled", old_aqe)


# ---------------------------------------------------------------------------
# pipeline_token_budget_select
# ---------------------------------------------------------------------------

_TBS_BUDGET = 800  # per-source token budget (absolute, like a real one)


def _token_budget_oracle() -> str:
    from .text import _STOPWORDS

    return f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({_STOPWORDS}, w))) AS stop_hits,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents),
    q AS (
      SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
             round(0.5 * least(n_tokens / 64.0, 1.0)
                 + 0.25 * (1.0 - CAST(stop_hits AS DOUBLE) / n_tokens)
                 + 0.25 * (CAST(n_distinct AS DOUBLE) / n_tokens), 6)
               AS quality
      FROM t),
    c AS (
      SELECT doc_id, source, quality, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM q)
    SELECT doc_id, source, quality, n_tokens, cum_before
    FROM c WHERE cum_before < {_TBS_BUDGET}
    """


@query("pipeline_token_budget_select", oracle=_token_budget_oracle())
def pipeline_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-BUDGET DATA SELECTION: per source, greedily keep the
    highest-quality documents until the source's token budget
    (_TBS_BUDGET = 800 tokens) is exhausted — the selection step of a
    budgeted pretraining recipe (fixed compute buys a fixed token
    count per domain; quality-first greedy is the standard
    data-selection baseline). A doc is kept iff the tokens of
    strictly-better docs (quality DESC, doc_id tiebreak) total under
    the budget, so the first doc of a source is always kept and the
    boundary doc may overshoot — the same greedy-pack convention as
    text_chunk_recursive's merge.

    Scale shape: NO per-source global sort — the running token total
    decomposes like pipeline_shard_assign's global rank, but over
    SUMS: (1) per-(source, quality) token subtotals, cumulated over
    the bounded quality DOMAIN (round(6) makes it a <= ~1.5e6-value
    grid) partitioned by source; (2) a window partitioned by
    (source, quality) cumulates tokens by doc_id within each grid
    cell; offset + within = the exact per-source running total. Both
    side tables broadcast; the corpus is touched by one scan + one
    fine-grained window.

    Parity: quality is the shared exact formula (integer ratios,
    round 6); token counts and running totals are exact integers; the
    budget cut is an integer compare."""
    from .text import text_quality_score

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    q = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "quality")
        .join(d, "doc_id")
    )
    grp = q.groupBy("source", "quality").agg(
        F.sum("n_tokens").cast("bigint").alias("tb")
    )
    wd = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = grp.select(
        "source",
        "quality",
        F.coalesce(F.sum("tb").over(wd), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    ww = (
        Window.partitionBy("source", "quality")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = q.join(F.broadcast(off), ["source", "quality"]).select(
        "doc_id",
        "source",
        "quality",
        "n_tokens",
        (
            F.col("off")
            + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))
        )
        .cast("bigint")
        .alias("cum_before"),
    )
    return c.where(F.col("cum_before") < _TBS_BUDGET).select(
        "doc_id", "source", "quality", "n_tokens", "cum_before"
    )

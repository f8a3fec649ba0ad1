"""Round-13 operators: the declared sketch-family completion
(mergeable KMV/theta distinct sketch with set-operation estimates)
and further analytics queued by SURVEY §Round-13.

The reference app has no aggregation layer at all (app.py outsources
retrieval to Qdrant and never aggregates); these ops serve the
north-star 100 TB pipeline the engine is designed for, where distinct
counts must MERGE across shards/partitions without a global distinct
shuffle.

Float-parity discipline (CLAUDE.md): deterministic integer hashes,
exact BIGINT counters, one shared division shape per double output,
round(6) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# ---------------------------------------------------------------------------
# agg_theta_sketch_distinct_union
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_P = 2147483647  # Lehmer modulus (2^31 - 1)
_KMV_SCALE = (_KMV_K - 1) * _KMV_P  # 547608329985, exact BIGINT/double
# 3-round Lehmer mix: one round has no wraparound for small keys (the
# K smallest hashes would just be the K smallest keys * 48271 and the
# estimate degenerates to P/48271 regardless of n); three rounds wrap
# twice for any key >= 1 and the estimates track exact counts at
# every sf (probed 2026-08-16: rel_err 0.6-15.5%, K=256 RSE ~6.3%).
_KMV_HASH = (
    "(((((({key} + 1) * 48271) % 2147483647) * 48271) % 2147483647)"
    " * 48271) % 2147483647 + 1"
)
_KMV_BOUND = 0.30  # assert ceiling: 2x the worst measured rel_err


def _kmv_oracle() -> str:
    h = _KMV_HASH.format(key="key")
    est = (
        "CASE WHEN {n} = 256 THEN CAST(547608329985 AS DOUBLE) / {kth} "
        "ELSE CAST({n} AS DOUBLE) END"
    )
    est_i = (
        "CASE WHEN usk.n = 256 THEN CAST(usk.c AS DOUBLE) * 547608329985"
        " / usk.kth / 256 ELSE CAST(usk.c AS DOUBLE) END"
    )
    rel = (
        "CASE WHEN {exact} = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE round(({est} - {exact}) / {exact}, 6) END"
    )
    est_a = est.format(n="sk.n", kth="sk.kth")
    est_u = est.format(n="usk.n", kth="usk.kth")
    return f"""
    WITH dk AS MATERIALIZED (
      SELECT DISTINCT event_type,
             user_id * 32
             + date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS key
      FROM events WHERE event_type IN ('purchase', 'click')),
    hx AS (SELECT event_type, key, {h} AS h FROM dk),
    kept AS MATERIALIZED (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h)
                 AS rn
        FROM hx) z
      WHERE rn <= 256),
    uhash AS (
      SELECT h,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS ia,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS ib
      FROM kept GROUP BY h),
    ukept AS MATERIALIZED (
      SELECT h, ia, ib FROM (
        SELECT *, row_number() OVER (ORDER BY h) AS rn FROM uhash) z
      WHERE rn <= 256),
    sk AS (SELECT event_type AS set_name, count(*) AS n, max(h) AS kth
           FROM kept GROUP BY event_type),
    usk AS (SELECT count(*) AS n, max(h) AS kth,
                   CAST(coalesce(sum(CASE WHEN ia = 1 AND ib = 1
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS c
            FROM ukept),
    exk AS (
      SELECT key,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS ia,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS ib
      FROM dk GROUP BY key),
    ex AS (SELECT event_type AS set_name, count(*) AS exact
           FROM dk GROUP BY event_type),
    exu AS (SELECT count(*) AS exact_u,
                   CAST(coalesce(sum(CASE WHEN ia = 1 AND ib = 1
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS exact_i
            FROM exk)
    SELECT sk.set_name, sk.n AS n_entries, sk.kth AS kth_hash,
           round({est_a}, 6) AS estimate, ex.exact,
           {rel.format(est=est_a, exact="ex.exact")} AS rel_err
    FROM sk JOIN ex USING (set_name)
    UNION ALL
    SELECT 'union', usk.n, usk.kth,
           round({est_u}, 6), exu.exact_u,
           {rel.format(est=est_u, exact="exu.exact_u")}
    FROM usk CROSS JOIN exu
    UNION ALL
    SELECT 'intersection', usk.c, usk.kth,
           round({est_i}, 6), exu.exact_i,
           {rel.format(est=est_i, exact="exu.exact_i")}
    FROM usk CROSS JOIN exu
    ORDER BY set_name
    """


@query("agg_theta_sketch_distinct_union", oracle=_kmv_oracle())
def agg_theta_sketch_distinct_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGEABLE DISTINCT SKETCH with set-operation estimates — the
    declared round-13 sketch-family completion (VERDICT r12 item 2;
    CMS/KLL/HLL/bitmap are in-tree, this adds union/intersection
    ESTIMATES the others can't give). KMV / bottom-k, the original
    theta sketch (Bar-Yossef et al. 2002; Apache DataSketches' theta
    is this plus adaptive sampling): per set keep the K = 256 smallest
    deterministic hash values of the distinct keys; if the sketch is
    full the distinct estimate is (K-1) * P / h_(K), else the sketch
    IS the exact value set.

    Set algebra on sketches alone (the 100 TB property — merging
    never touches raw data): the K smallest of A ∪ B are a subset of
    A's kept ∪ B's kept (a theorem: anything among the union's K
    smallest is among its own set's K smallest), so the union sketch
    is built from <= 2K retained hashes; the intersection uses the
    theta ratio estimator c/K * est_union, where c counts union-kept
    hashes present in both sketches (membership is decidable from the
    kept sets because h <= theta_U <= theta_A). Sets here: purchase
    vs click USER-DAYS (user_id * 32 + day index — per-type user sets
    saturate on this fixture, probed round 13).

    Every row carries the exact count and rel_err; an in-plan
    assert_true bounds |rel_err| <= 0.30 (worst measured 0.155 at
    sf0.1's intersection, K=256 RSE ~6.3% — the ANN-floor margin
    rule). At sf0.001 the per-type sketches are NOT full and the op
    exercises exact mode (rel_err = 0) while the union IS full —
    both regimes hash-verified.

    Parity: the 3-round Lehmer hash is exact BIGINT on both engines
    (max intermediate < 2^47); estimates divide exact integers in one
    shared expression shape; counts are BIGINT.

    Shape at 100 TB: the kept-set window is PARTITIONED by set; a
    production deployment replaces it with per-partition bottom-K
    partial aggregation (mergeable by construction — this op's union
    path IS that merge, demonstrated on two shards); the union/
    intersection stage touches <= 2K rows. The exact twin columns are
    the audit-only part."""
    h_expr = _KMV_HASH.format(key="key")
    ev = table(spark, sf_dir, "events")
    dk = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_type",
            F.expr(
                "CAST(user_id AS BIGINT) * 32 + CAST(datediff("
                "CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"
            ).alias("key"),
        )
        .distinct()
    )
    hx = dk.select("event_type", "key", F.expr(h_expr).alias("h"))
    w_set = Window.partitionBy("event_type").orderBy("h")
    kept = (
        hx.withColumn("rn", F.row_number().over(w_set))
        .where(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    uhash = kept.groupBy("h").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("ia"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ib"),
    )
    # <= 2K rows: the bounded top-k-survivors window class
    w_u = Window.orderBy("h")
    ukept = (
        uhash.withColumn("rn", F.row_number().over(w_u))
        .where(F.col("rn") <= _KMV_K)
        .select("h", "ia", "ib")
    )
    sk = kept.groupBy(F.col("event_type").alias("set_name")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("h").alias("kth"),
    )
    usk = ukept.agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("h").alias("kth"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 "
            "ELSE 0 END), 0) AS BIGINT)"
        ).alias("c"),
    )
    exk = dk.groupBy("key").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("ia"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ib"),
    )
    ex = dk.groupBy(F.col("event_type").alias("set_name")).agg(
        F.count("*").cast("bigint").alias("exact")
    )
    exu = exk.agg(
        F.count("*").cast("bigint").alias("exact_u"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 "
            "ELSE 0 END), 0) AS BIGINT)"
        ).alias("exact_i"),
    )
    est = (
        "CASE WHEN {n} = 256 THEN CAST(547608329985 AS DOUBLE) / {kth} "
        "ELSE CAST({n} AS DOUBLE) END"
    )
    rel = (
        "CASE WHEN {exact} = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE round(({est} - {exact}) / {exact}, 6) END"
    )
    est_a = est.format(n="n", kth="kth")
    per_set = sk.join(F.broadcast(ex), "set_name").selectExpr(
        "set_name",
        "n AS n_entries",
        "kth AS kth_hash",
        f"round({est_a}, 6) AS estimate",
        "exact",
        f"{rel.format(est=est_a, exact='exact')} AS rel_err",
    )
    est_i = (
        "CASE WHEN n = 256 THEN CAST(c AS DOUBLE) * 547608329985"
        " / kth / 256 ELSE CAST(c AS DOUBLE) END"
    )
    uni = usk.crossJoin(F.broadcast(exu)).selectExpr(
        "'union' AS set_name",
        "n AS n_entries",
        "kth AS kth_hash",
        f"round({est_a}, 6) AS estimate",
        "exact_u AS exact",
        f"{rel.format(est=est_a, exact='exact_u')} AS rel_err",
    )
    inter = usk.crossJoin(F.broadcast(exu)).selectExpr(
        "'intersection' AS set_name",
        "c AS n_entries",
        "kth AS kth_hash",
        f"round({est_i}, 6) AS estimate",
        "exact_i AS exact",
        f"{rel.format(est=est_i, exact='exact_i')} AS rel_err",
    )
    return (
        per_set.unionByName(uni)
        .unionByName(inter)
        .where(
            F.assert_true(
                F.abs(F.col("rel_err")) <= F.lit(_KMV_BOUND),
                F.format_string(
                    f"KMV estimate off by more than {_KMV_BOUND}: "
                    "set=%s rel_err=%s",
                    F.col("set_name"),
                    F.col("rel_err"),
                ),
            ).isNull()
        )
        .orderBy("set_name")
    )


# ---------------------------------------------------------------------------
# rag_multi_vector_maxsim
# ---------------------------------------------------------------------------

_MV_SLICES = 4   # sub-vectors per embedding
_MV_SUBDIM = 16  # dims per sub-vector (4 x 16 = the fixture's 64)


def _mv_dot(el_a, el_b, i: int, j: int) -> str:
    """Unrolled dot product of sub-vector i of a and j of b (1-based
    slice indexes) — identical left-assoc fold text on both engines."""
    a0 = (i - 1) * _MV_SUBDIM
    b0 = (j - 1) * _MV_SUBDIM
    return " + ".join(
        f"{el_a(a0 + k + 1)} * {el_b(b0 + k + 1)}"
        for k in range(_MV_SUBDIM)
    )


def _mv_score_sql(duck: bool) -> str:
    """The MaxSim scoring expression over pre-aliased sub-norm columns
    (nq1..nq4 query-side, nd1..nd4 doc-side): score = sum over query
    slices of max over doc slices of round(6) sub-cosine. The sum is a
    LITERAL left-to-right 4-term chain (the round-11 pivot rule — no
    aggregate, no quantization loss)."""
    if duck:
        el_a = lambda k: f"CAST(qv[{k}] AS DOUBLE)"  # noqa: E731
        el_b = lambda k: f"CAST(embedding[{k}] AS DOUBLE)"  # noqa: E731
    else:
        el_a = lambda k: f"CAST(element_at(qv, {k}) AS DOUBLE)"  # noqa: E731
        el_b = (  # noqa: E731
            lambda k: f"CAST(element_at(embedding, {k}) AS DOUBLE)"
        )
    maxes = []
    for i in range(1, _MV_SLICES + 1):
        cos_ij = [
            f"round(({_mv_dot(el_a, el_b, i, j)}) "
            f"/ (sqrt(nq{i}) * sqrt(nd{j})), 6)"
            for j in range(1, _MV_SLICES + 1)
        ]
        maxes.append("greatest(" + ", ".join(cos_ij) + ")")
    return "round(" + " + ".join(maxes) + ", 6)"


def _mv_norm_sql(col_el, i: int) -> str:
    base = (i - 1) * _MV_SUBDIM
    return " + ".join(
        f"{col_el(base + k + 1)} * {col_el(base + k + 1)}"
        for k in range(_MV_SUBDIM)
    )


def _maxsim_oracle() -> str:
    el_q = lambda k: f"CAST(qv[{k}] AS DOUBLE)"  # noqa: E731
    el_c = lambda k: f"CAST(embedding[{k}] AS DOUBLE)"  # noqa: E731
    q_norms = ", ".join(
        f"({_mv_norm_sql(el_q, i)}) AS nq{i}"
        for i in range(1, _MV_SLICES + 1)
    )
    c_norms = ", ".join(
        f"({_mv_norm_sql(el_c, j)}) AS nd{j}"
        for j in range(1, _MV_SLICES + 1)
    )
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, {q_norms}
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding, {c_norms}
          FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_mv_score_sql(duck=True)} AS maxsim
      FROM c CROSS JOIN q)
    SELECT query_id, CAST(rn AS BIGINT) AS rn, neighbor_id, maxsim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY maxsim DESC, neighbor_id)
                      AS rn
          FROM scored) z
    WHERE rn <= 5
    ORDER BY query_id, rn
    """


@query("rag_multi_vector_maxsim", oracle=_maxsim_oracle())
def rag_multi_vector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-VECTOR LATE-INTERACTION retrieval (ColBERT's MaxSim,
    Khattab & Zaharia 2020) — the scoring family between single-vector
    cosine (vec_cosine_topk) and full cross-attention rerankers:
    score(q, d) = sum over query sub-vectors of the MAX sub-cosine
    against any doc sub-vector, so a document matches if EACH query
    aspect finds its best-matching doc aspect independently.  The
    fixture has no token-level embeddings, so the 64-dim vectors are
    sliced into 4 x 16-dim sub-vectors as the multi-vector stand-in —
    the SCORING SHAPE (16 sub-cosines -> 4 per-slice maxes -> literal
    4-term sum -> top-5 window) is the real ColBERT plan, and in
    production the slices become token vectors with no change to the
    operator structure.

    Parity: sub-cosines round(6) with identical unrolled fold text on
    both engines; per-slice max via greatest() over the SAME rounded
    values; the final sum is a literal left-to-right 4-term chain
    (never an aggregate — order is pinned textually), round(6).
    Sub-norms are ALIASED columns computed once per row, so the
    scoring projection stays under Janino's 64 KB method limit (the
    round-6 rule: alias, never inline a big expression twice).

    Shape at 100 TB: one corpus scan against the broadcast 10-query
    panel; per-query top-5 is a partitioned window after map-side
    reduction (TakeOrderedAndProject shape per query group); the
    multi-vector expansion multiplies FLOPs per row, not rows."""
    el = lambda k: f"CAST(element_at(embedding, {k}) AS DOUBLE)"  # noqa: E731
    el_q = lambda k: f"CAST(element_at(qv, {k}) AS DOUBLE)"  # noqa: E731
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        *[
            # references the sibling alias qv — Spark 4 lateral
            # column aliases (CLAUDE.md round-7)
            F.expr(_mv_norm_sql(el_q, i)).alias(f"nq{i}")
            for i in range(1, _MV_SLICES + 1)
        ],
    )
    c = emb.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        *[
            F.expr(_mv_norm_sql(el, j)).alias(f"nd{j}")
            for j in range(1, _MV_SLICES + 1)
        ],
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.expr(_mv_score_sql(duck=False)).alias("maxsim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select(
            "query_id",
            F.col("rn").cast("bigint").alias("rn"),
            "neighbor_id",
            "maxsim",
        )
        .orderBy("query_id", "rn")
    )

"""Round-12 operator wave: graph-walk sampling, retrieval
hard-negative mining, personalized PageRank, and a parquet-footer
statistics audit — production stages the existing families lacked
(walk corpora feed node2vec/DeepWalk-style embedding trainers; hard
negatives feed reranker training; PPR is the graph-native
related-items retriever; footer stats are what row-group pruning
trusts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# ---------------------------------------------------------------------------
# graph_random_walk_sample
# ---------------------------------------------------------------------------

_RW_SEEDS = 20
_RW_STEPS = 4
# deterministic per-(seed, step, node) neighbor pick — exact int64
# arithmetic on both engines (max term ~1e6 * 104729 < 2^63)
_RW_IDX = "({s} * 7919 + {t} * 104729 + {v} * 131) % 1000003"

_RW_EDGE_CTES = """
    os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    adj AS MATERIALIZED (
      SELECT u, v,
             CAST(row_number() OVER (PARTITION BY u ORDER BY v)
                  AS BIGINT) AS rnk,
             CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS deg
      FROM sym),
    seeds AS (
      SELECT u AS seed FROM (
        SELECT u, count(*) AS deg FROM sym GROUP BY u
        ORDER BY deg DESC, u LIMIT {n_seeds}) z)
""".format(n_seeds=_RW_SEEDS)


def _rw_oracle() -> str:
    steps = ["w0 AS (SELECT seed, CAST(0 AS BIGINT) AS step, seed AS node FROM seeds)"]
    for t in range(1, _RW_STEPS + 1):
        idx = _RW_IDX.format(s="w.seed", t=t, v="w.node")
        steps.append(
            f"""w{t} AS (
      SELECT w.seed, CAST({t} AS BIGINT) AS step, a.v AS node
      FROM w{t - 1} w JOIN adj a
        ON a.u = w.node AND a.rnk = {idx} % a.deg + 1)"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM w{t}" for t in range(_RW_STEPS + 1)
    )
    return f"""
    WITH {_RW_EDGE_CTES},
    {",".join(steps)}
    SELECT seed, step, node FROM (
      {union}) z
    ORDER BY seed, step
    """


@query("graph_random_walk_sample", oracle=_rw_oracle())
def graph_random_walk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC RANDOM-WALK SAMPLING over the support-2 part
    co-purchase graph — the corpus-generation stage of DeepWalk/
    node2vec-style graph embedding trainers (walk sequences are the
    "sentences" the skip-gram model consumes), which none of the 22
    graph ops produced: they all compute STATISTICS of the graph,
    this one samples PATHS from it. 4-step walks from the 20
    highest-degree seeds; at each step the neighbor is picked by an
    exact integer hash of (seed, step, current node) modulo the
    node's degree — deterministic, so shard-stable run-to-run, and
    walk-independent across seeds (the production property: walks
    parallelize embarrassingly).

    Walks can never dead-end: the graph is symmetrized, so every
    reached node has >= 1 neighbor (its predecessor), and seeds are
    top-degree nodes.

    Parity: the neighbor pick is (s*7919 + t*104729 + v*131) %
    1000003 % deg + 1 against a row_number-ranked adjacency — all
    exact int64 on both engines; no floats anywhere.

    Shape at 100 TB: the ranked adjacency is one window over the
    checkpointed edge list (bounded by |P| choose 2, the
    _copurchase_edges bound); each step is ONE equi-join of the
    frontier (|seeds| rows) against adjacency on the walk node —
    k steps = k joins, the textbook distributed walk plan (frontier
    grows with seed count, never with step count)."""
    from .analytics4 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = sym.select(
        "u",
        "v",
        F.row_number()
        .over(Window.partitionBy("u").orderBy("v"))
        .cast("bigint")
        .alias("rnk"),
        F.count("*")
        .over(Window.partitionBy("u"))
        .cast("bigint")
        .alias("deg"),
    ).localCheckpoint()  # referenced once per step (4x) — the same
    # bounded-intermediate materialization as _copurchase_edges itself
    seeds = (
        sym.groupBy("u")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.col("deg").desc(), "u")
        .limit(_RW_SEEDS)
        .select(F.col("u").alias("seed"))
    )
    frontier = seeds.select(
        "seed", F.lit(0).cast("bigint").alias("step"), F.col("seed").alias("node")
    )
    out = frontier
    cur = frontier
    for t in range(1, _RW_STEPS + 1):
        idx = _RW_IDX.format(s="seed", t=t, v="node")
        nxt = (
            cur.join(adj, F.col("node") == F.col("u"))
            .where(F.expr(f"rnk = {idx} % deg + 1"))
            .select(
                "seed",
                F.lit(t).cast("bigint").alias("step"),
                F.col("v").alias("node"),
            )
        )
        out = out.unionByName(nxt)
        cur = nxt
    return out.orderBy("seed", "step")


# ---------------------------------------------------------------------------
# rag_hard_negative_mining
# ---------------------------------------------------------------------------

_HN_TOPK = 10


def _hn_oracle() -> str:
    from .rag import _BM25_B, _BM25_K1, _KEYWORDS, _THRESHOLD

    bm25_score = " + ".join(
        f"(ln(1 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)) * "
        f"(len(list_filter(tk, x -> x = '{t}')) * ({_BM25_K1} + 1)) / "
        f"(len(list_filter(tk, x -> x = '{t}')) + {_BM25_K1} * "
        f"(1 - {_BM25_B} + {_BM25_B} * len(tk) / avgdl)))"
        for i, t in enumerate(_KEYWORDS)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN list_contains(tk, '{t}') THEN 1 ELSE 0 END)"
        f" AS df_{i}"
        for i, t in enumerate(_KEYWORDS)
    )
    kw_list = "[" + ", ".join(f"'{t}'" for t in _KEYWORDS) + "]"
    return f"""
    WITH toksd AS (
      SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(tk)) AS avgdl, {dfs}
      FROM toksd),
    scored AS (
      SELECT doc_id,
             round({bm25_score}, 6) AS bm25_score,
             CAST(len(list_filter({kw_list},
                  kw -> contains(lower(text), kw))) AS BIGINT)
               AS kw_matches
      FROM toksd CROSS JOIN stats)
    SELECT doc_id, bm25_score, kw_matches
    FROM scored
    WHERE kw_matches < {_THRESHOLD}
    ORDER BY bm25_score DESC, doc_id
    LIMIT {_HN_TOPK}
    """


@query("rag_hard_negative_mining", oracle=_hn_oracle())
def rag_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for reranker training — the training-data
    op the rag family lacked (its 12 siblings retrieve, fuse, pack,
    or evaluate; none emit contrastive examples): a HARD negative is
    a doc the RANKER scores high but the RELEVANCE RULE rejects, and
    this op composes the reference's own two relevance notions to
    find them — BM25 score over the standing query (rag_bm25_topk's
    exact scorer, app.py:348-374) gated by the R9 keyword rule
    (matches >= len(keywords)/2, app.py:293, filter_keyword_gate).
    The top-10 highest-scoring GATE-FAILING docs are precisely the
    confusing examples a cross-encoder reranker trains against.

    Parity: BM25 terms are the shared expression text of the other
    rag oracles (round-6 vintage, ln/division parity argued there),
    rounded to 6 before the ORDER BY; kw_matches and the gate
    threshold are exact integers; ties break on doc_id.

    Shape at 100 TB: one tiny broadcast stats row + one codegen
    scoring scan + TakeOrderedAndProject — rag_bm25_topk's audited
    plan with one extra integer filter; no shuffle on the corpus."""
    from .rag import _BM25_K1, _BM25_B, _KEYWORDS, _THRESHOLD

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "text", F.split("text", " ").alias("tk"))
    tf = lambda t: F.size(F.filter("tk", lambda x: x == F.lit(t)))  # noqa: E731
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("tk")).alias("avgdl"),
        *[
            F.sum(F.array_contains("tk", t).cast("bigint")).alias(f"df_{i}")
            for i, t in enumerate(_KEYWORDS)
        ],
    )
    dl = F.size("tk")
    score = None
    for i, t in enumerate(_KEYWORDS):
        idf = F.log(
            1
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        term = (
            idf
            * (tf(t) * (_BM25_K1 + 1))
            / (tf(t) + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / F.col("avgdl")))
        )
        score = term if score is None else score + term
    kw_arr = F.array(*[F.lit(k) for k in _KEYWORDS])
    matches = F.size(
        F.filter(kw_arr, lambda kw: F.contains(F.lower(F.col("text")), kw))
    ).cast("bigint")
    return (
        toks.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(score, 6).alias("bm25_score"),
            matches.alias("kw_matches"),
        )
        .where(F.col("kw_matches") < F.lit(_THRESHOLD))
        .orderBy(F.col("bm25_score").desc(), "doc_id")
        .limit(_HN_TOPK)
    )


# ---------------------------------------------------------------------------
# graph_personalized_pagerank
# ---------------------------------------------------------------------------

_PPR_ITERS = 10
_PPR_TOPK = 20
# restart probability 0.5: exactly representable, so 0.5*x is bit-exact
# on both engines (the 2^-k rule)


def _ppr_oracle() -> str:
    ctes = [
        """nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),
    deg AS MATERIALIZED (
      SELECT u AS node, CAST(count(*) AS BIGINT) AS outdeg
      FROM sym GROUP BY u),
    seed AS MATERIALIZED (
      SELECT node AS s FROM deg ORDER BY outdeg DESC, node LIMIT 1),
    pr0 AS (
      SELECT node,
             CASE WHEN node = (SELECT s FROM seed)
                  THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
               AS r
      FROM nodes)"""
    ]
    for i in range(1, _PPR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS MATERIALIZED (
      SELECT nd.node,
             round(CASE WHEN nd.node = (SELECT s FROM seed)
                        THEN 0.5 ELSE 0.0 END
                   + 0.5 * COALESCE(
                     (SELECT sum(p.r / d.outdeg)
                      FROM sym e JOIN pr{i - 1} p ON p.node = e.u
                                 JOIN deg d ON d.node = e.u
                      WHERE e.v = nd.node), 0), 9) AS r
      FROM nodes nd)"""
        )
    body = ",\n    ".join(ctes)
    edge_ctes = """
    os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS MATERIALIZED (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e)"""
    return f"""
    WITH {edge_ctes},
    {body}
    SELECT (SELECT s FROM seed) AS seed,
           node, round(r, 6) AS ppr
    FROM pr{_PPR_ITERS}
    ORDER BY r DESC, node
    LIMIT {_PPR_TOPK}
    """


@query("graph_personalized_pagerank", oracle=_ppr_oracle())
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERSONALIZED PAGERANK from the top-degree seed over the
    support-2 part co-purchase graph — the graph-native RELATED-ITEMS
    retriever (PPR with restart mass pinned to one node is what
    Pinterest-style related-pin systems compute; the global
    graph_pagerank_neardup cousin ranks overall centrality, this op
    ranks proximity TO A QUERY NODE). 10 power iterations at restart
    probability 0.5 (exactly representable — the 0.5* scaling is
    bit-exact on both engines), each iteration round(9)-quantized so
    sub-ulp drift in unordered double sums cannot compound (the
    graph_pagerank_neardup recipe); top-20 by score then node.

    Parity: iteration arithmetic is the shared-text convention of
    graph_pagerank_neardup (r/outdeg double division, COALESCE 0,
    round 9 per step, round 6 on output).

    Shape at 100 TB: the node/degree/seed frames are bounded by |P|
    choose 2 edges (checkpointed once, the _copurchase_edges bound);
    each iteration is one edge-join + groupBy — the standard
    distributed power iteration, 10 fixed rounds, single-reference
    chain (round-9 rule: linear growth, no per-round checkpoint
    needed)."""
    from .analytics4 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("bigint").alias("outdeg")
    )
    seed = deg.orderBy(F.col("outdeg").desc(), "node").limit(1).select(
        F.col("node").alias("s")
    )
    base = nodes.crossJoin(F.broadcast(seed)).localCheckpoint()
    # bounded (node, seed) frame referenced by all 10 iterations AND
    # the restart term — the bounded-intermediate ckpt rule
    pr = base.select(
        "node",
        "s",
        F.expr(
            "CASE WHEN node = s THEN CAST(1.0 AS DOUBLE)"
            " ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("r"),
    )
    for _ in range(_PPR_ITERS):
        contrib = (
            sym.join(pr.select(F.col("node").alias("u"), "r"), "u")
            .join(deg.select(F.col("node").alias("u"), "outdeg"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("in_mass"))
        )
        pr = base.join(contrib, "node", "left").select(
            "node",
            "s",
            F.round(
                F.expr("CASE WHEN node = s THEN 0.5 ELSE 0.0 END")
                + 0.5 * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                9,
            ).alias("r"),
        )
    return (
        pr.orderBy(F.col("r").desc(), "node")
        .limit(_PPR_TOPK)
        .select(
            F.col("s").alias("seed"),
            "node",
            F.round("r", 6).alias("ppr"),
        )
    )


# ---------------------------------------------------------------------------
# maintenance_parquet_footer_stats
# ---------------------------------------------------------------------------

_FOOTER_COLS = [
    ("lineitem", "l_orderkey"),
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("events", "event_id"),
]


def _footer_oracle() -> str:
    rows = "\n    UNION ALL\n    ".join(
        f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min({c}) AS BIGINT) AS footer_min,
           CAST(max({c}) AS BIGINT) AS footer_max,
           CAST(min({c}) AS BIGINT) AS data_min,
           CAST(max({c}) AS BIGINT) AS data_max,
           CAST(1 AS BIGINT) AS stats_exact
    FROM {t}"""
        for t, c in _FOOTER_COLS
    )
    return f"""
    {rows}
    ORDER BY table_name, column_name
    """


@query("maintenance_parquet_footer_stats", oracle=_footer_oracle())
def maintenance_parquet_footer_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARQUET FOOTER STATISTICS AUDIT — REAL metadata parsing of the
    fixture files' footers (pyarrow.parquet file metadata: per-row-
    group min/max statistics, the exact values Spark's ParquetScan
    uses for row-group skipping and partition pruning), validated
    against a data-scan min/max per key column. footer_min/footer_max
    come from the FOOTER (min of row-group mins / max of maxes,
    driver-side metadata-only read — no data pages touched);
    data_min/data_max from a Spark scan aggregate; stats_exact is the
    comparison. The table an engineer reads to confirm pushdown-
    eligible stats actually exist and are trustworthy — a writer that
    produced wrong or truncated stats would silently break every
    min/max-pruned query, and this op makes that loud.

    Parity: all values are exact BIGINTs; the oracle recomputes
    min/max from data (the footer values must EQUAL them for a
    correct writer+parser pair — a broken footer parse hash-fails).

    Shape at 100 TB: the footer read is metadata-only (KBs per file,
    listable in parallel per file on a cluster via a binaryFile scan
    of footers; here driver-side over the five fixture files); the
    data-scan side is one map-side-combined min/max aggregate per
    table — the same pass ANALYZE runs."""
    import os

    import pyarrow.parquet as pq

    out = None
    for t, c in _FOOTER_COLS:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written datasets are DIRECTORIES of part files (the
        # sf1x blow-up layout handled by tables.cache_hot_tables) —
        # fold footer stats across every part footer.
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            files = [path]
        mins, maxs = [], []
        n_groups = groups_with_stats = 0
        for f_ in files:
            md = pq.ParquetFile(f_).metadata
            idx = [
                md.schema.column(i).name for i in range(md.num_columns)
            ].index(c)
            for g in range(md.num_row_groups):
                n_groups += 1
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    # stats-less row group: counted, never skipped
                    # silently — stats_exact can only be 1 when EVERY
                    # group carries min/max (review finding r12)
                    continue
                groups_with_stats += 1
                mins.append(int(st.min))
                maxs.append(int(st.max))
        has_all = bool(mins) and groups_with_stats == n_groups
        fmin_sql = f"CAST({min(mins)} AS BIGINT)" if mins else "CAST(NULL AS BIGINT)"
        fmax_sql = f"CAST({max(maxs)} AS BIGINT)" if maxs else "CAST(NULL AS BIGINT)"
        exact_sql = (
            f"CAST(CASE WHEN {min(mins)} = data_min AND"
            f" {max(maxs)} = data_max THEN 1 ELSE 0 END AS BIGINT)"
            if has_all
            else "CAST(0 AS BIGINT)"  # absent/partial stats are a
            # FAILED audit, never a crash or a silent pass
        )
        row = (
            table(spark, sf_dir, t)
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.min(c).cast("bigint").alias("data_min"),
                F.max(c).cast("bigint").alias("data_max"),
            )
            .selectExpr(
                f"'{t}' AS table_name",
                f"'{c}' AS column_name",
                "n_rows",
                f"{fmin_sql} AS footer_min",
                f"{fmax_sql} AS footer_max",
                "data_min",
                "data_max",
                f"{exact_sql} AS stats_exact",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name", "column_name")


# ---------------------------------------------------------------------------
# maintenance_incremental_stats_merge
# ---------------------------------------------------------------------------


@query(
    "maintenance_incremental_stats_merge",
    oracle="""
    WITH part_stats AS (
      SELECT date_trunc('month', o_orderdate) AS mth,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             sum(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                      AS HUGEINT)
                 * CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS s2,
             CAST(min(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS mn,
             CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS mx
      FROM orders GROUP BY 1),
    merged AS (
      SELECT CAST(count(*) AS BIGINT) AS n_partitions,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(sum(s) AS BIGINT) AS sum_cents,
             CAST(sum(s2) AS DECIMAL(38,0)) AS sum_sq_cents,
             min(mn) AS min_cents, max(mx) AS max_cents
      FROM part_stats),
    direct AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS sum_cents,
             CAST(sum(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                           AS HUGEINT)
                      * CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS DECIMAL(38,0)) AS sum_sq_cents,
             CAST(min(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS min_cents,
             CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS max_cents
      FROM orders)
    SELECT m.n_partitions,
           m.n_rows, d.n_rows AS n_rows_direct,
           m.sum_cents, d.sum_cents AS sum_cents_direct,
           CAST(m.sum_sq_cents AS VARCHAR) AS sum_sq_cents,
           CAST(d.sum_sq_cents AS VARCHAR) AS sum_sq_cents_direct,
           m.min_cents, m.max_cents,
           CAST(CASE WHEN m.n_rows = d.n_rows
                      AND m.sum_cents = d.sum_cents
                      AND m.sum_sq_cents = d.sum_sq_cents
                      AND m.min_cents = d.min_cents
                      AND m.max_cents = d.max_cents
                THEN 1 ELSE 0 END AS BIGINT) AS all_match
    FROM merged m CROSS JOIN direct d
    """,
)
def maintenance_incremental_stats_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGEABLE TABLE-STATS PROOF — the incremental-ANALYZE path a
    100 TB catalog depends on: per-PARTITION statistics (count, sum,
    sum of squares, min, max over exact order-total cents, one stats
    row per o_orderdate month) MERGED by the textbook combine rules
    (counts/sums/moment-sums add; min/max fold), next to the same
    statistics computed directly from the raw table, with an exact
    equality flag per run.  Because the moments are EXACT integers
    (cents in BIGINT, squares through the DECIMAL(18,0)^2 /
    HUGEINT kernels — the round-7 decimal-width rule), merge-vs-
    direct equality is exact, not approximate: a catalog can ANALYZE
    only changed partitions and merge, never rescanning the table.
    Completes the round-13 queue item; the variance numerator
    N*S2 - S^2 is deliberately NOT formed in-plan (BIGINT N counts
    as precision 20 — the round-8 decimal-multiply trap); consumers
    derive it from the emitted exact components.

    Parity: every column is an exact BIGINT (the DECIMAL(38,0)
    square-sums are emitted as exact digit STRINGS — Spark's pandas
    conversion of wide decimals is object-typed while DuckDB's arrow
    stays decimal128, the round-2 dtype-drift rule); the money
    cast is the documented Spark (+0.5 cast) vs DuckDB (round) pair.

    Shape at 100 TB: the per-partition pass is one map-side-combined
    aggregate per partition (exactly what ANALYZE computes and
    stores); the merge reads stats ROWS (one per partition), never
    data — the direct pass exists here only to prove equality."""
    from ..functions.money import cents

    o = table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    sq = F.expr(
        "CAST(CAST(o_totalprice * 100 + 0.5 AS BIGINT) AS DECIMAL(18,0))"
        " * CAST(CAST(o_totalprice * 100 + 0.5 AS BIGINT)"
        " AS DECIMAL(18,0))"
    )
    part = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mth")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(c).cast("bigint").alias("s"),
        F.sum(sq).cast("decimal(38,0)").alias("s2"),
        F.min(c).cast("bigint").alias("mn"),
        F.max(c).cast("bigint").alias("mx"),
    )
    merged = part.agg(
        F.count("*").cast("bigint").alias("n_partitions"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("s").cast("bigint").alias("sum_cents"),
        F.sum("s2").cast("decimal(38,0)").alias("sum_sq_cents"),
        F.min("mn").alias("min_cents"),
        F.max("mx").alias("max_cents"),
    )
    direct = o.agg(
        F.count("*").cast("bigint").alias("n_rows_direct"),
        F.sum(c).cast("bigint").alias("sum_cents_direct"),
        F.sum(sq).cast("decimal(38,0)").alias("sum_sq_cents_direct"),
        F.min(c).cast("bigint").alias("min_d"),
        F.max(c).cast("bigint").alias("max_d"),
    )
    return merged.crossJoin(F.broadcast(direct)).selectExpr(
        "n_partitions",
        "n_rows",
        "n_rows_direct",
        "sum_cents",
        "sum_cents_direct",
        "CAST(sum_sq_cents AS STRING) AS sum_sq_cents",
        "CAST(sum_sq_cents_direct AS STRING) AS sum_sq_cents_direct",
        "min_cents",
        "max_cents",
        "CAST(CASE WHEN n_rows = n_rows_direct"
        " AND sum_cents = sum_cents_direct"
        " AND sum_sq_cents = sum_sq_cents_direct"
        " AND min_cents = min_d AND max_cents = max_d"
        " THEN 1 ELSE 0 END AS BIGINT) AS all_match",
    )


# ---------------------------------------------------------------------------
# graph_node2vec_biased_walks
# ---------------------------------------------------------------------------

# p = q = 2: scaled integer weights (x2) — return 1, stay-close 2,
# explore 1 — so the cumulative-weight pick is exact int64 arithmetic
_N2V_STEPS = 4
_N2V_SEEDS = 20
_N2V_HASH = "({s} * 7919 + {t} * 104729 + {c} * 131 + {p} * 17) % 1000003"


def _n2v_oracle() -> str:
    edge_ctes = """
    os AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS MATERIALIZED (
      SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    seeds AS (
      SELECT u AS seed FROM (
        SELECT u, count(*) AS deg FROM sym GROUP BY u
        ORDER BY deg DESC, u LIMIT {n}) z),
    w0 AS (SELECT seed, seed AS prev, seed AS cur FROM seeds)""".format(
        n=_N2V_SEEDS
    )
    steps = []
    for t in range(1, _N2V_STEPS + 1):
        h = _N2V_HASH.format(s="seed", t=t, c="cur", p="prev")
        steps.append(
            f"""cand{t} AS (
      SELECT f.seed, f.prev, f.cur, a.v AS x,
             CASE WHEN a.v = f.prev THEN CAST(1 AS BIGINT)
                  WHEN EXISTS (SELECT 1 FROM sym s2
                               WHERE s2.u = f.prev AND s2.v = a.v)
                  THEN CAST(2 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS w
      FROM w{t - 1} f JOIN sym a ON a.u = f.cur),
    cw{t} AS (
      SELECT seed, prev, cur, x, w,
             COALESCE(sum(w) OVER (PARTITION BY seed ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cumx,
             sum(w) OVER (PARTITION BY seed) AS tot
      FROM cand{t}),
    w{t} AS (
      SELECT seed, cur AS prev, x AS cur
      FROM cw{t}
      WHERE {h} % tot >= cumx AND {h} % tot < cumx + w)"""
        )
    union = "\n      UNION ALL\n      ".join(
        [f"SELECT seed, CAST(0 AS BIGINT) AS step, seed AS node FROM w0"]
        + [
            f"SELECT seed, CAST({t} AS BIGINT) AS step, cur AS node"
            f" FROM w{t}"
            for t in range(1, _N2V_STEPS + 1)
        ]
    )
    return f"""
    WITH {edge_ctes},
    {",".join(steps)}
    SELECT seed, step, node FROM (
      {union}) z
    ORDER BY seed, step
    """


@query("graph_node2vec_biased_walks", oracle=_n2v_oracle())
def graph_node2vec_biased_walks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SECOND-ORDER (p, q)-BIASED WALKS (node2vec, Grover & Leskovec
    2016) over the co-purchase graph — the biased extension of
    graph_random_walk_sample: at each step the pick over the current
    node's neighbors is weighted by distance FROM THE PREVIOUS node
    (return 1/p, stay-within-triangle 1, explore 1/q; p = q = 2, so
    the x2-scaled integer weights are 1 / 2 / 1 and the whole pick is
    exact int64). The deterministic draw is hash(seed, step, cur,
    prev) modulo the total scaled weight, landing in a neighbor's
    cumulative-weight interval (neighbors ordered by id) — the
    production property (shard-stable, embarrassingly parallel per
    seed) with BFS/DFS interpolation the first-order walk can't do.
    Step 1 uses prev = seed: no self-loops means the return case
    can't fire and every neighbor of the seed is trivially adjacent
    to prev, so the first hop is uniform — the standard convention.

    Parity: weights, cumulative sums, and the modular draw are all
    exact integers in shared expression text; the stay-close test is
    a LEFT-JOIN flag on Spark and an EXISTS on DuckDB — same
    predicate, engine-idiomatic forms.

    Shape at 100 TB: per step ONE frontier-adjacency equi-join + ONE
    edge-flag join (prev, x) + a per-seed window over <= max-degree
    candidate rows — k steps = 3k bounded joins on the checkpointed
    edge list; frontier size is the seed count, never step-dependent."""
    from .analytics4 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()  # referenced 2x per step (adjacency + flag)
    seeds = (
        sym.groupBy("u")
        .agg(F.count("*").alias("deg"))
        .orderBy(F.col("deg").desc(), "u")
        .limit(_N2V_SEEDS)
        .select(F.col("u").alias("seed"))
    )
    frontier = seeds.select(
        "seed",
        F.col("seed").alias("prev"),
        F.col("seed").alias("cur"),
    )
    out = frontier.select(
        "seed",
        F.lit(0).cast("bigint").alias("step"),
        F.col("seed").alias("node"),
    )
    flag = sym.select(
        F.col("u").alias("prev"), F.col("v").alias("x"), F.lit(1).alias("adj")
    )
    for t in range(1, _N2V_STEPS + 1):
        h = _N2V_HASH.format(s="seed", t=t, c="cur", p="prev")
        cand = (
            frontier.join(sym, F.col("cur") == F.col("u"))
            .select("seed", "prev", "cur", F.col("v").alias("x"))
            .join(flag, ["prev", "x"], "left")
            .selectExpr(
                "seed",
                "prev",
                "cur",
                "x",
                "CAST(CASE WHEN x = prev THEN 1"
                " WHEN adj IS NOT NULL THEN 2"
                " ELSE 1 END AS BIGINT) AS w",
            )
        )
        wspec = Window.partitionBy("seed").orderBy("x")
        cw = cand.select(
            "seed",
            "prev",
            "cur",
            "x",
            "w",
            F.coalesce(
                F.sum("w").over(
                    wspec.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("cumx"),
            F.sum("w").over(Window.partitionBy("seed")).alias("tot"),
        )
        picked = cw.where(
            F.expr(f"{h} % tot >= cumx AND {h} % tot < cumx + w")
        )
        frontier = picked.select(
            "seed", F.col("cur").alias("prev"), F.col("x").alias("cur")
        )
        out = out.unionByName(
            frontier.select(
                "seed",
                F.lit(t).cast("bigint").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out.orderBy("seed", "step")

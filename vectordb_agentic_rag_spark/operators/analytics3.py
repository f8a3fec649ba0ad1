"""Round-7 operators: robust trend estimation, semantic dedup purge,
tokenizer fertility (SURVEY.md §8 round-7 queue).

Each op composes primitives that already exist standalone —
win_theil_sen_slope extends the sequential/windowed family
(win_rolling_slope's robust sibling), dedup_semantic_cluster_purge
composes vec_kmeans_lloyd's cells with the dedup keep-first rule, and
pipeline_tokenizer_fertility re-tokenizes the corpus with
pipeline_bpe_merges' trained vocab. The reference analogue is R5's
embed+upsert loop (app.py:150-210): what it outsources to Cohere's
tokenizer and Qdrant's dedup-on-upsert, these ops do as engine
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .analytics import _KM_D, _km_asg_ctes, _km_assignments
from .text import _bpe_duck_ctes, _bpe_train

# ---------------------------------------------------------------------------
# win_theil_sen_slope
# ---------------------------------------------------------------------------

_TS_FRAME = 20  # events per user entering the pairwise-slope frame


@query(
    "win_theil_sen_slope",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS us, round(value, 6) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    f AS (SELECT * FROM s WHERE rn <= {_TS_FRAME}),
    p AS (
      SELECT a.user_id,
             (b.x - a.x) * 3600000000.0 / CAST(b.us - a.us AS DOUBLE) AS sl
      FROM f a JOIN f b
        ON a.user_id = b.user_id AND a.rn < b.rn AND b.us > a.us),
    r AS (
      SELECT user_id, sl,
             row_number() OVER (PARTITION BY user_id ORDER BY sl) AS k,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM p)
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_pairs,
           round((max(CASE WHEN k = (n + 1) // 2 THEN sl END)
                  + max(CASE WHEN k = (n + 2) // 2 THEN sl END)) / 2.0, 6)
             AS sen_slope
    FROM r GROUP BY user_id
    """,
)
def win_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend per user: the median of all pairwise
    slopes (value/hour) over each user's first 20 events — the
    standard outlier-resistant alternative to least-squares
    (win_rolling_slope); a 29% contamination breakdown point makes it
    the monitoring-grade trend estimator.

    Scale shape: the frame is a PARTITIONED row_number gate (<= 20
    rows/user ride the pairwise stage), so the O(frame^2) = 190 slope
    pairs per user are generated JVM-side by a nested HOF over one
    collected-and-sorted per-user array — bounded work per key, one
    exchange on user_id shared by the window and the aggregate, never
    an all-events self-join. The median comes from sort_array +
    explicit middle picks (the win_rolling_median recipe — Spark has
    no frame-capable median).

    Parity: inputs round(6)-quantized; each slope is the identical
    left-assoc expression (dx * 3600000000.0 / dt) on both engines;
    same-timestamp pairs (dt = 0) are excluded on both sides; equal
    slope doubles make rank ties value-identical, so the (lo+hi)/2
    middle picks agree bit-wise before the final round(6)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.round("value", 6).alias("x"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= _TS_FRAME)
    )
    g = s.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("us", "event_id", "x"))).alias("ss")
    )
    slopes = (
        "array_sort(filter(flatten(transform(sequence(1, size(ss) - 1), i -> "
        "transform(sequence(i + 1, size(ss)), j -> "
        "IF(element_at(ss, j).us > element_at(ss, i).us, "
        "(element_at(ss, j).x - element_at(ss, i).x) * 3600000000.0D "
        "/ CAST(element_at(ss, j).us - element_at(ss, i).us AS DOUBLE), "
        "CAST(NULL AS DOUBLE))))), v -> v IS NOT NULL))"
    )
    return (
        g.select("user_id", F.expr(slopes).alias("sl"))
        .where(F.size("sl") >= 1)
        .select(
            "user_id",
            F.size("sl").cast("bigint").alias("n_pairs"),
            F.round(
                (
                    F.expr("element_at(sl, CAST((size(sl) + 1) div 2 AS INT))")
                    + F.expr("element_at(sl, CAST((size(sl) + 2) div 2 AS INT))")
                )
                / 2.0,
                6,
            ).alias("sen_slope"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_semantic_cluster_purge
# ---------------------------------------------------------------------------

_PURGE_TAU = 0.8  # cosine threshold on the 8-dim matryoshka prefix


def _purge_oracle() -> str:
    dims = range(1, _KM_D + 1)
    n8 = " + ".join(f"e{i} * e{i}" for i in dims)
    dot = " + ".join(f"a.e{i} * b.e{i}" for i in dims)
    parts = _km_asg_ctes()
    parts.append(
        f"pts8 AS (SELECT vec_id, cl, "
        + ", ".join(f"e{i}" for i in dims)
        + f", {n8} AS n8 FROM asg3)"
    )
    parts.append(
        f"""pr AS (
      SELECT a.cl AS cluster_id, b.vec_id AS vec_id, a.vec_id AS a_id,
             round(({dot}) / (sqrt(a.n8) * sqrt(b.n8)), 6) AS cos
      FROM pts8 a JOIN pts8 b
        ON a.cl = b.cl AND a.vec_id < b.vec_id)"""
    )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT cluster_id, vec_id, CAST(min(a_id) AS BIGINT) AS dup_of,
           arg_min(cos, a_id) AS cos_dup
    FROM pr WHERE cos >= {_PURGE_TAU} GROUP BY cluster_id, vec_id
    """
    )


@query("dedup_semantic_cluster_purge", oracle=_purge_oracle())
def dedup_semantic_cluster_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC near-duplicate purge, cluster-scoped: assign every
    embedding to its vec_kmeans_lloyd cell (k=4, 3 Lloyd iterations,
    8-dim matryoshka prefix — the SAME cells that op reports, CTE-
    shared oracle), then within each cell mark every vector that has a
    lower-id neighbor at cosine >= 0.8 as a duplicate of its LOWEST
    such neighbor (keep-first, the dedup_near_minhash rule). This is
    the semantic-dedup stage of a pretraining pipeline (SemDeDup,
    Abbas et al. 2023): k-means cells scope the pairwise check, so the
    corpus-wide O(n^2) becomes sum over cells of |cell|^2 — at 100 TB,
    k scales with corpus size to hold |cell| at the ~10k vectors where
    exact in-cell cosine is cheap, and cross-cell near-dups are
    accepted misses BY CONSTRUCTION (the SemDeDup tradeoff; the
    recall-bounded alternative is dedup_near_embedding's LSH).

    Scale shape: the Lloyd assignment is linear scan + broadcast
    centroids (vec_kmeans_lloyd's plan); the in-cell self-join is an
    equi-join on cl; per-row norms are computed BEFORE the join so the
    post-join expression stays inside one codegen method (the Janino
    lesson of vec_radius_search); the keep-first reduction is one
    map-side-combinable min/min_by aggregate, never a window.

    Parity: e-dims and cells come from the shared kmeans CTE chain;
    the cosine is the identical left-assoc dot / (sqrt*sqrt) text,
    round(6)-quantized before the threshold compare on BOTH engines,
    so the >= 0.8 gate sees identical doubles."""
    dims = range(1, _KM_D + 1)
    asg, _ = _km_assignments(spark, sf_dir)
    n8 = " + ".join(f"e{i} * e{i}" for i in dims)
    pts = asg.select(
        "vec_id", "cl", *[f"e{i}" for i in dims], F.expr(n8).alias("n8")
    )
    a = pts.select(
        F.col("cl"),
        F.col("vec_id").alias("a_id"),
        *[F.col(f"e{i}").alias(f"a{i}") for i in dims],
        F.col("n8").alias("na"),
    )
    b = pts.select(
        F.col("cl"),
        F.col("vec_id").alias("b_id"),
        *[F.col(f"e{i}").alias(f"b{i}") for i in dims],
        F.col("n8").alias("nb"),
    )
    dot = " + ".join(f"a{i} * b{i}" for i in dims)
    cos = F.expr(f"round(({dot}) / (sqrt(na) * sqrt(nb)), 6)")
    pr = (
        a.join(b, "cl")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            F.col("cl").alias("cluster_id"),
            F.col("b_id").alias("vec_id"),
            "a_id",
            cos.alias("cos"),
        )
        .where(F.col("cos") >= _PURGE_TAU)
    )
    return pr.groupBy("cluster_id", "vec_id").agg(
        F.min("a_id").cast("bigint").alias("dup_of"),
        F.min_by("cos", "a_id").alias("cos_dup"),
    )


# ---------------------------------------------------------------------------
# pipeline_tokenizer_fertility
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    return (
        _bpe_duck_ctes(5)
        + """,
    wl AS (
      SELECT lang, t AS w, count(*) AS cnt
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
            FROM documents) z
      GROUP BY 1, 2)
    SELECT lang, CAST(sum(wl.cnt) AS BIGINT) AS n_words,
           CAST(sum(wl.cnt * len(w5.syms)) AS BIGINT) AS total_bpe_tokens,
           round(CAST(sum(wl.cnt * len(w5.syms)) AS DOUBLE)
                 / sum(wl.cnt), 6) AS fertility
    FROM wl JOIN w5 ON wl.w = w5.w
    GROUP BY lang
    """
    )


@query("pipeline_tokenizer_fertility", oracle=_fertility_oracle())
def pipeline_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY by language — tokens-per-word under the
    5-merge BPE vocab pipeline_bpe_merges trains (shared training loop
    + CTE chain, so both ops pin the SAME merge sequence): fertility =
    sum(word_count * symbols_after_merges) / sum(word_count) per lang.
    Fertility is THE tokenizer-quality metric a multilingual
    pretraining mix is balanced on (Rust et al. 2021) — a language
    whose words fragment into many tokens pays more compute per word
    and needs its mixture weight adjusted (text_domain_mix_sample
    consumes exactly this signal).

    Scale shape: training is vocabulary-bounded after one corpus pass
    (pipeline_bpe_merges' argument); the re-tokenization here never
    touches document text again — the per-(lang, word) count table
    joins the folded word->n_symbols table on the word key, a plain
    shuffle equi-join on vocabulary-sized inputs (NOT broadcast: the
    vocab grows with corpus size, the text_ccnet_ppl_bucket lesson).
    All-integer arithmetic until the single final division."""
    _, words = _bpe_train(spark, sf_dir, 5)
    wt = words.select(F.col("t").alias("w"), F.size("syms").alias("n_sym"))
    d = table(spark, sf_dir, "documents")
    wl = (
        d.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("cnt"))
    )
    tok = F.sum(F.col("cnt") * F.col("n_sym"))
    return (
        wl.join(wt, "w")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            tok.cast("bigint").alias("total_bpe_tokens"),
            F.round(tok.cast("double") / F.sum("cnt"), 6).alias("fertility"),
        )
    )

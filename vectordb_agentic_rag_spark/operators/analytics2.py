"""Corpus-curation and statistics operators (round 6, third wave).

These extend the LLM-data-pipeline surface with the standard
published curation passes a 100 TB pretraining corpus actually runs —
Gopher quality rules (Rae et al. 2021 §A1.1), CCNet perplexity
bucketing (Wenzek et al. 2020 §4.3), duplicated-span detection (Lee
et al. 2021 "Deduplicating Training Data Makes Language Models
Better") — plus offline eval metrics (NDCG, rank-biased overlap) and
classical statistics (Welch t, chi-square, CUSUM change detection)
over the event/lineitem tables. The reference app ingests documents
with zero curation (app.py:160-212 chunks and upserts whatever
arrives); these ops are the curation layer a production corpus needs
in front of that ingest.

Float-parity discipline (CLAUDE.md): per-row double contributions are
round(9)-quantized and summed as DECIMAL so group sums are
order-independent across engines; every output double is round(6)'d
with the identical expression shape on both sides; ranking and flag
columns are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table
from .dedup import P_CODE, P_HASH

# ---------------------------------------------------------------------------
# text_gopher_rules
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "a")
_GOPHER_MIN_WORDS = 15
_GOPHER_MAX_WORDS = 90
_GOPHER_MIN_MWL = 3.0
_GOPHER_MAX_MWL = 10.0
_GOPHER_MIN_STOP = 1
_GOPHER_MAX_DUPF = 0.25
_GOPHER_MAX_TOPR = 0.12


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, string_split(text, ' ') AS tk, n_chars
      FROM documents),
    s AS (
      SELECT doc_id,
             len(tk) AS n_words,
             round((n_chars - len(tk) + 1.0) / len(tk), 6) AS mean_word_len,
             len(list_filter(tk, w -> w IN ('the', 'a')))
               AS stopword_hits,
             CASE WHEN len(tk) >= 2 THEN
               round(1.0 - len(list_distinct(list_transform(
                       generate_series(1, len(tk) - 1),
                       i -> list_extract(tk, i) || ' '
                            || list_extract(tk, i + 1))))
                     / (len(tk) - 1.0), 6)
             ELSE 0.0 END AS dup_bigram_frac,
             round(list_max(list_transform(list_distinct(tk),
                     w -> len(list_filter(tk, x -> x = w))))
                   / (len(tk) * 1.0), 6) AS top_word_ratio
      FROM m)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           CAST(stopword_hits AS BIGINT) AS stopword_hits,
           dup_bigram_frac, top_word_ratio,
           CAST(CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS}
                            AND {_GOPHER_MAX_WORDS}
                      AND mean_word_len BETWEEN {_GOPHER_MIN_MWL}
                            AND {_GOPHER_MAX_MWL}
                      AND stopword_hits >= {_GOPHER_MIN_STOP}
                      AND dup_bigram_frac <= {_GOPHER_MAX_DUPF}
                      AND top_word_ratio <= {_GOPHER_MAX_TOPR}
                THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
    FROM s
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER QUALITY RULES (Rae et al. 2021, appendix A1.1) — the
    published rule set modern pretraining pipelines apply before any
    model-based filtering: word-count bounds, mean-word-length bounds,
    a stopword-presence gate, a duplicate-bigram ceiling (boilerplate /
    template text) and a most-frequent-word-ratio ceiling (keyword
    stuffing). The reference ingests documents unfiltered
    (app.py:160-212); this is the curation pass in front of it.

    Shape at scale: a SINGLE narrow map pass — every metric is a
    higher-order function over the token array (filter/transform/
    list_distinct), entirely JVM-side inside whole-stage codegen. No
    shuffle, no explode, no join: the per-doc top-word count scans the
    distinct-token list against the token list (O(v*n) per doc with
    v,n <= ~100), which beats an explode+groupBy+join-back at any
    corpus size because it never leaves the row. Filters on keep_flag
    push straight to the scan at 100 TB.

    Parity: counts and flags are exact integers; ratio denominators
    are the same integers, so the four doubles agree bit-wise before
    their single round(6). On this fixture 347/500 docs pass; the
    word-count, stopword and top-ratio rules each reject a non-trivial
    slice (62/47/91 docs) while the mean-word-length and dup-bigram
    rules pass everything (synthetic words are uniform ~4.5 chars) —
    kept because the published rule set includes them."""
    d = table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    m = d.select(
        "doc_id",
        F.split("text", " ").alias("tk"),
        "n_chars",
    ).select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_words"),
        F.round(
            (F.col("n_chars") - F.size("tk") + F.lit(1.0)) / F.size("tk"), 6
        ).alias("mean_word_len"),
        F.expr(f"CAST(size(filter(tk, w -> w IN ({stop_list}))) AS BIGINT)")
        .alias("stopword_hits"),
        # guarded for 1-token docs: Spark's sequence(1, 0) infers step -1
        # (giving [1, 0] and an ANSI INVALID_ARRAY_INDEX) where DuckDB's
        # generate_series(1, 0) is empty, and ANSI double division by
        # zero throws — the WHEN covers both engines' edge at once
        F.when(
            F.size("tk") >= 2,
            F.round(
                F.lit(1.0)
                - F.expr(
                    "size(array_distinct(transform(sequence(1, size(tk) - 1), "
                    "i -> concat(element_at(tk, i), ' ', "
                    "element_at(tk, i + 1)))))"
                )
                / (F.size("tk") - F.lit(1.0)),
                6,
            ),
        ).otherwise(0.0).alias("dup_bigram_frac"),
        F.round(
            F.expr(
                "array_max(transform(array_distinct(tk), "
                "w -> size(filter(tk, x -> x = w))))"
            )
            / (F.size("tk") * F.lit(1.0)),
            6,
        ).alias("top_word_ratio"),
    )
    keep = (
        F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
        & (F.col("stopword_hits") >= _GOPHER_MIN_STOP)
        & (F.col("dup_bigram_frac") <= _GOPHER_MAX_DUPF)
        & (F.col("top_word_ratio") <= _GOPHER_MAX_TOPR)
    )
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stopword_hits",
        "dup_bigram_frac",
        "top_word_ratio",
        keep.cast("bigint").alias("keep_flag"),
    )


# ---------------------------------------------------------------------------
# text_ccnet_ppl_bucket
# ---------------------------------------------------------------------------


@query(
    "text_ccnet_ppl_bucket",
    oracle="""
    WITH toks AS (
      SELECT d.doc_id, d.lang, t.tok
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
      WHERE t.tok <> ''),
    lm AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
    tot AS (SELECT lang, sum(n) AS total FROM lm GROUP BY lang),
    scored AS (
      SELECT toks.doc_id, toks.lang,
             count(*) AS n_toks,
             sum(CAST(round(-ln(lm.n / tot.total), 9)
                      AS DECIMAL(28, 9))) AS nll
      FROM toks
      JOIN lm ON toks.lang = lm.lang AND toks.tok = lm.tok
      JOIN tot ON toks.lang = tot.lang
      GROUP BY 1, 2)
    SELECT doc_id, lang, CAST(n_toks AS BIGINT) AS n_toks,
           round(CAST(nll AS DOUBLE) / n_toks, 6) AS avg_nll,
           CAST(ntile(3) OVER (PARTITION BY lang
                               ORDER BY round(CAST(nll AS DOUBLE) / n_toks, 6),
                                        doc_id) AS BIGINT) AS ppl_bucket
    FROM scored
    """,
)
def text_ccnet_ppl_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNET PERPLEXITY BUCKETING (Wenzek et al. 2020 §4.3): score
    every document with a per-language unigram LM trained on the
    corpus itself, then split each language into head/middle/tail
    terciles by average negative log-likelihood — the standard
    "keep the head, audit the tail" curation signal. (CCNet uses a
    5-gram KenLM; the unigram LM is the same pipeline shape with the
    LM-training pass expressible as one aggregate.)

    Shape at scale: tokens aggregate to a (lang, token) LM — map-side
    partial combine collapses corpus rows to vocab rows before the
    shuffle; the LM then joins back to the token stream. The join is
    NOT hint-broadcast: the LM is corpus-DERIVED (vocabulary grows
    with corpus size, unlike a dimension table), so forcing broadcast
    would ship every language's vocab to all executors and blow the
    driver/broadcast limit at 100 TB — the token stream is already
    exploded and hash-partitionable on (lang, tok), so AQE picks
    broadcast while the LM is small and a shuffle join once it isn't
    (the round-7 advisory fix; the tiny per-lang TOTALS row stays
    broadcast). Docs then re-aggregate by doc_id. The tercile split is
    one window per lang partition over DOC-level rows (corpus
    cardinality / ~500 chars), which AQE splits per language; ordering
    is (avg_nll, doc_id) so ties are deterministic.

    Parity: LM probabilities divide exact integers, so -ln(p) is the
    same double on both engines; per-token NLL is round(9)-quantized
    and summed as DECIMAL(28,9) (order-independent — the repo's group-
    sum discipline), and the tercile orders by the ROUNDED score so no
    sub-ulp drift can flip a bucket."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    lm = toks.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    tot = lm.groupBy("lang").agg(F.sum("n").alias("total"))
    scored = (
        toks.join(lm, ["lang", "tok"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_toks"),
            F.sum(
                F.round(-F.log(F.col("n") / F.col("total")), 9).cast(
                    "decimal(28,9)"
                )
            ).alias("nll"),
        )
    )
    avg_nll = F.round(F.col("nll").cast("double") / F.col("n_toks"), 6)
    w = Window.partitionBy("lang").orderBy(avg_nll, "doc_id")
    return scored.select(
        "doc_id",
        "lang",
        "n_toks",
        avg_nll.alias("avg_nll"),
        F.ntile(3).over(w).cast("bigint").alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# dedup_span_ngram
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per span
_SPAN_STRIDE = 4  # span start stride


@query(
    "dedup_span_ngram",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, list_transform(string_split(text, ' '),
               tok -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(tok, ''),
                                       c -> CAST(ascii(c) AS BIGINT))),
                      (h, c) -> (h * 31 + c) % {P_CODE})) AS tc
      FROM documents),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(tc) - {_SPAN_K} + 1, {_SPAN_STRIDE}),
               i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_slice(tc, i, i + {_SPAN_K} - 1)),
                    (h, c) -> (h * 131 + c) % {P_HASH}))) AS h
      FROM tc WHERE len(tc) >= {_SPAN_K}),
    hc AS (SELECT h, count(*) AS c FROM sp GROUP BY h)
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN hc.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(sum(CASE WHEN hc.c >= 2 THEN 1 ELSE 0 END)
                 / (count(*) * 1.0), 6) AS dup_ratio
    FROM sp JOIN hc USING (h)
    GROUP BY sp.doc_id
    """,
)
def dedup_span_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATED-SPAN DETECTION (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): flag every
    {_SPAN_K}-token span whose fingerprint occurs more than once in
    the corpus (across documents OR repeated inside one), and report
    the per-document duplicated-span ratio — the signal ExactSubstr
    dedup cuts on. The paper builds a suffix array; the distributed
    equivalent fingerprints strided spans (stride {_SPAN_STRIDE}
    keeps volume at n_tokens/{_SPAN_STRIDE} rows per doc) and
    hash-aggregates, which is the join-friendly shape at 100 TB —
    a suffix array over 100 TB does not shard, span hashes do.

    Shape at scale: one map pass computes per-token codes and rolls
    span fingerprints with a COMBINED-code fold ((h*131+code)%P per
    token, the repo's round-5 HOF-cost rule: combine per-token codes,
    never re-fold characters per span); explode emits len/{_SPAN_STRIDE}
    rows per doc; the span-hash aggregate map-side-combines before one
    shuffle on hash; the count joins back to the span stream on the
    same hash key (co-partitioned, AQE-planned) and re-aggregates by
    doc_id. Everything is integers until the final ratio.

    Parity: fingerprint arithmetic is the exact int64 modular fold the
    shingle ops pin (dedup.py:_ngram_code_sets twin); counts exact;
    the single double is round(6) of an integer ratio."""
    d = table(spark, sf_dir, "documents")
    tc = (
        "transform(split(text, ' '), "
        "tok -> aggregate(split(tok, ''), CAST(0 AS BIGINT), "
        f"(h, c) -> (h * 31 + ascii(c)) % {P_CODE}))"
    )
    spans = (
        d.where(F.size(F.split("text", " ")) >= _SPAN_K)
        .select("doc_id", F.expr(tc).alias("tc"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tc) - {_SPAN_K} + 1, "
                    f"{_SPAN_STRIDE}), "
                    f"i -> aggregate(slice(tc, i, {_SPAN_K}), "
                    f"CAST(0 AS BIGINT), (h, c) -> (h * 131 + c) % {P_HASH}))"
                )
            ).alias("h"),
        )
    )
    hc = spans.groupBy("h").agg(F.count("*").alias("c"))
    return (
        spans.join(hc, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.round(
                F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
                / (F.count("*") * F.lit(1.0)),
                6,
            ).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# rag_eval_ndcg / rag_rbo_overlap — shared ranking CTEs
# ---------------------------------------------------------------------------

_DD_COS_Q = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
    "sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)

# Exact-cosine truth top-10 and sign-bit-hamming system top-10 — the
# identical ranking CTE pair rag_eval_recall_mrr pins (analytics.py),
# reused so the three eval metrics grade the same two rankers.
_DD_RANKINGS = f"""
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding
          FROM embeddings WHERE vec_id >= 10),
    truth AS (
      SELECT query_id, neighbor_id, rn FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 round({_DD_COS_Q.format(a='c.embedding', b='q.qv')}, 6) DESC,
                 c.neighbor_id) AS rn
        FROM c CROSS JOIN q) t
      WHERE rn <= 10),
    sys AS (
      SELECT query_id, neighbor_id, rn AS p FROM (
        SELECT q.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 len(list_filter(range(1, len(c.embedding) + 1),
                     i -> (c.embedding[i] > 0) <> (q.qv[i] > 0))),
                 c.neighbor_id) AS rn
        FROM c CROSS JOIN q) t
      WHERE rn <= 10)"""


def _eval_rankings(spark: SparkSession, sf_dir: str):
    """Shared (truth, system) top-10 rankings — vector.py's
    eval_rankings_topk (one implementation for all three eval ops)."""
    from .vector import eval_rankings_topk

    return eval_rankings_topk(spark, sf_dir)


@query(
    "rag_eval_ndcg",
    oracle=f"""
    WITH {_DD_RANKINGS},
    gains AS (SELECT query_id, neighbor_id, 11 - rn AS g, rn FROM truth),
    dcg AS (
      SELECT s.query_id,
             sum(CAST(round((CAST(1 << coalesce(t.g, 0) AS DOUBLE) - 1.0)
                            / (ln(s.p + 1) / ln(2)), 9)
                      AS DECIMAL(28, 9))) AS dcg_q
      FROM sys s LEFT JOIN gains t
        ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
      GROUP BY s.query_id),
    idcg AS (
      SELECT query_id,
             sum(CAST(round((CAST(1 << g AS DOUBLE) - 1.0)
                            / (ln(rn + 1) / ln(2)), 9)
                      AS DECIMAL(28, 9))) AS idcg_q
      FROM gains GROUP BY query_id)
    SELECT d.query_id,
           round(CAST(d.dcg_q AS DOUBLE), 6) AS dcg_10,
           round(CAST(i.idcg_q AS DOUBLE), 6) AS idcg_10,
           round(CAST(d.dcg_q AS DOUBLE) / CAST(i.idcg_q AS DOUBLE), 6)
             AS ndcg_10
    FROM dcg d JOIN idcg i ON d.query_id = i.query_id
    """,
)
def rag_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the sign-bit hamming ranker against exact-cosine
    graded relevance (grade = 11 - truth rank for the true top-10,
    0 otherwise) — the position-sensitive retrieval metric that
    recall@k (rag_eval_recall_mrr) cannot see: a system that returns
    all ten true hits in reverse order scores recall 1.0 but loses
    NDCG. Standard offline-eval companion to recall/MRR.

    Shape at scale: both rankings are the shared broadcast-query scan
    (one corpus pass each, per-query top-10 frontiers); the metric
    arithmetic then touches 10 rows per query. DCG joins system
    positions to truth grades on (query, neighbor); IDCG is the same
    formula over the truth ranking itself — exact by construction.

    Parity: gains are exact integers, 2^g - 1 comes from an integer
    shift (never pow()), log2 is the textually-identical ln(p+1)/ln(2)
    on both engines; per-position terms are round(9)-quantized and
    summed as DECIMAL so the 10-term sums are order-independent."""
    truth, sys_rank = _eval_rankings(spark, sf_dir)
    gains = truth.select(
        "query_id", "neighbor_id", (11 - F.col("rn")).alias("g"), "rn"
    )
    term = (
        "CAST(round((CAST(shiftleft(1, {g}) AS DOUBLE) - 1.0) "
        "/ (ln({p} + 1) / ln(2)), 9) AS DECIMAL(28,9))"
    )
    dcg = (
        sys_rank.join(gains, ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            "p",
            F.coalesce(F.col("g"), F.lit(0)).alias("g0"),
        )
        .groupBy("query_id")
        .agg(F.sum(F.expr(term.format(g="g0", p="p"))).alias("dcg_q"))
    )
    idcg = gains.groupBy("query_id").agg(
        F.sum(F.expr(term.format(g="g", p="rn"))).alias("idcg_q")
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        F.round(F.col("dcg_q").cast("double"), 6).alias("dcg_10"),
        F.round(F.col("idcg_q").cast("double"), 6).alias("idcg_10"),
        F.round(
            F.col("dcg_q").cast("double") / F.col("idcg_q").cast("double"), 6
        ).alias("ndcg_10"),
    )


@query(
    "rag_rbo_overlap",
    oracle=f"""
    WITH {_DD_RANKINGS},
    pairs AS (
      SELECT t.query_id, greatest(t.rn, s.p) AS d0
      FROM truth t JOIN sys s
        ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id),
    depth AS (
      SELECT query_id, d.d, count(*) AS cnt
      FROM pairs, unnest(generate_series(d0, 10)) AS d(d)
      GROUP BY 1, 2),
    agg AS (
      SELECT query_id,
             sum(CAST(round(cnt * 1.0
                            / (CAST(1 << (d - 1) AS DOUBLE) * d), 9)
                      AS DECIMAL(28, 9))) AS s,
             max(CASE WHEN d = 10 THEN cnt ELSE 0 END) AS ov10
      FROM depth GROUP BY query_id)
    SELECT q2.query_id,
           CAST(coalesce(a.ov10, 0) AS BIGINT) AS overlap_at_10,
           round(0.5 * CAST(coalesce(a.s, 0) AS DOUBLE), 6) AS rbo_10
    FROM (SELECT DISTINCT query_id FROM q) q2
    LEFT JOIN agg a ON q2.query_id = a.query_id
    """,
)
def rag_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-BIASED OVERLAP (Webber et al. 2010) at p=0.5, depth 10,
    between the exact-cosine and sign-bit-hamming rankings — the
    top-weighted list-similarity metric for comparing two rankers
    without graded labels (NDCG needs a truth grading; RBO treats
    both lists symmetrically). RBO = (1-p) * sum_d p^(d-1) * |A_d
    intersect B_d| / d.

    The per-depth overlap is computed without re-intersecting at each
    depth: a matched pair first counts at depth d0 = max(rank_A,
    rank_B), so exploding sequence(d0, 10) and counting per (query,
    depth) yields every |A_d intersect B_d| with <= 10 rows exploded
    per matched pair. Queries whose lists are disjoint keep a row
    (LEFT join from the query list) with rbo 0 — the eval-dropout
    guard rag_eval_recall_mrr pins.

    Parity: overlap counts are exact integers; p^(d-1) is an integer
    shift (1 << (d-1), never pow()); each depth term divides integers
    and is round(9)-quantized into a DECIMAL sum; one round(6) at the
    end."""
    truth, sys_rank = _eval_rankings(spark, sf_dir)
    pairs = truth.join(sys_rank, ["query_id", "neighbor_id"]).select(
        "query_id", F.greatest("rn", "p").alias("d0")
    )
    depth = (
        pairs.select(
            "query_id", F.explode(F.expr("sequence(d0, 10)")).alias("d")
        )
        .groupBy("query_id", "d")
        .agg(F.count("*").alias("cnt"))
    )
    agg = depth.groupBy("query_id").agg(
        F.sum(
            F.expr(
                "CAST(round(cnt * 1.0 / "
                "(CAST(shiftleft(1, d - 1) AS DOUBLE) * d), 9) "
                "AS DECIMAL(28,9))"
            )
        ).alias("s"),
        F.max(F.when(F.col("d") == 10, F.col("cnt")).otherwise(0)).alias(
            "ov10"
        ),
    )
    # qids from the query-vector SOURCE, not truth.distinct(): the
    # latter re-executes the full truth ranking (corpus crossJoin +
    # window) just to enumerate 10 ids (round-7 advisory fix)
    from .vector import _query_vectors

    qids = _query_vectors(spark, sf_dir, 10).select("query_id")
    return qids.join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("ov10"), F.lit(0)).cast("bigint").alias(
            "overlap_at_10"
        ),
        F.round(
            F.lit(0.5) * F.coalesce(F.col("s"), F.lit(0)).cast("double"), 6
        ).alias("rbo_10"),
    )


# ---------------------------------------------------------------------------
# graph_triangle_cosupply
# ---------------------------------------------------------------------------


_COSUPPLY_MIN_SUPPORT = 3  # orders two suppliers must share
_COSUPPLY_EDGES_CACHE: dict = {}


def _cosupply_edges(
    spark: SparkSession, sf_dir: str, min_support: int = _COSUPPLY_MIN_SUPPORT
) -> DataFrame:
    """Distinct (u < v) supplier co-supply edges, materialized once per
    (application, sf_dir) via localCheckpoint — the triangle query
    references the edge list THREE times (two wedge sides + the
    closure probe) and without materialization each reference re-scans
    and re-joins the fact table (measured: 14 parquet scans in the
    naive plan). The edge list is bounded by |S| choose 2 (supplier
    pairs), orders of magnitude below the fact table, so checkpointing
    it is the 100 TB play. Keyed by applicationId, not id(spark)
    (CPython id-recycling hazard — dedup.py:915 pins the same rule)."""
    key = (spark.sparkContext.applicationId, sf_dir, min_support)
    if key not in _COSUPPLY_EDGES_CACHE:
        li = (
            table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey")
            .distinct()
        )
        a = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("u")
        )
        b = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v")
        )
        e = (
            a.join(b, "ok")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= min_support)
            .select("u", "v")
            .localCheckpoint()
        )
        _COSUPPLY_EDGES_CACHE[key] = e
    return _COSUPPLY_EDGES_CACHE[key]



# Shared DuckDB CTE chain: support-3 co-supply edges -> oriented
# triangle list -> per-node triangle counts. graph_triangle_cosupply
# and graph_clustering_coefficient (analytics3.py) both build on it,
# so the two oracles pin the SAME triangle counts.
_TRI_PN_CTES = """
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
      WHERE EXISTS (SELECT 1 FROM e e3
                    WHERE e3.u = e1.u AND e3.v = e2.v)),
    pn AS (
      SELECT n.node, count(*) AS tri_count
      FROM tri, unnest([a, b, c]) AS n(node)
      GROUP BY n.node)
"""


_TRI_PER_NODE_CACHE: dict = {}


def _tri_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (node, tri_count) on the support-3
    co-supply graph — the degree-oriented wedge listing shared by
    graph_triangle_cosupply and graph_clustering_coefficient.

    The oriented edge list comes from the session-cached checkpoint
    (_oriented_cosupply_edges, round 13) — er is referenced three
    times below (two wedge sides + the closure probe), the exact
    re-derivation fan-out the cache exists for. Round 14 extends the
    same rule one level up: the per-node counts themselves are a
    node-bounded frame (<= |S| rows) consumed by TWO registered ops,
    each of which was re-running the full wedge-mass pass (184M wedges
    at sf0.1 support-3) per DataFrame build — OPS_BENCH r14 before:
    9.2 s clustering_coefficient + 6.9 s triangle_cosupply per call."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _TRI_PER_NODE_CACHE.get(key)
    if hit is not None:
        return hit
    hit = _tri_per_node_plan(spark, sf_dir).localCheckpoint()
    _TRI_PER_NODE_CACHE[key] = hit
    return hit


def _tri_per_node_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAZY wedge-listing derivation behind _tri_per_node — split
    out so tests/test_plans.py can pin the semi-join closure shape
    that now executes at cache-build time."""
    er = _oriented_cosupply_edges(spark, sf_dir)
    x = er.select("s", F.col("t").alias("t1"), F.col("dt").alias("dt1"))
    y = er.select("s", F.col("t").alias("t2"), F.col("dt").alias("dt2"))
    wedges = (
        x.join(y, "s")
        .where(
            (F.col("dt1") < F.col("dt2"))
            | ((F.col("dt1") == F.col("dt2")) & (F.col("t1") < F.col("t2")))
        )
        .select("s", "t1", "t2")
    )
    tri = wedges.join(
        er.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("s", "t1", "t2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_count"))
    )


@query(
    "graph_triangle_cosupply",
    oracle=_TRI_PN_CTES
    + """
    SELECT s.s_suppkey, s.s_name, CAST(pn.tri_count AS BIGINT) AS tri_count
    FROM pn JOIN supplier s ON pn.node = s.s_suppkey
    ORDER BY tri_count DESC, s.s_suppkey
    LIMIT 20
    """,
)
def graph_triangle_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-BASELINE TRIANGLE COUNTING — small-sf / verification use.
    This is the one op the scale audit flags above row-linear
    (SCALE.md time/input ratio 1.26 at the 10x step): exact triangle
    listing carries inherent wedge mass on dense co-occurrence
    graphs, and no orientation trick changes the asymptotics when the
    graph itself densifies. The RECOMMENDED production path is
    `graph_triangle_wedge_cap` (same oriented pipeline, per-pivot
    out-adjacency capped at 32 by (deg, id) order): linear wedge mass
    under ANY skew (ratio 0.29 at the same step), exact-lower-bound
    semantics, and audit columns reporting what the cap truncated.
    Keep THIS op for exact answers at bounded scale and as the
    verification twin the capped variant's bound is checked against.

    TRIANGLE COUNTING on the supplier co-supply graph (edge = two
    suppliers ship lines of >= 3 common orders — the min-support gate
    every co-occurrence graph applies before structural analysis,
    since a single shared order is noise, and the gate is also what
    keeps the triangle mass tractable: the fixture assigns suppliers
    to orders uniformly at random, so the UNfiltered graph saturates
    toward complete and exact triangle listing is Omega(n^3) by
    construction — 54M triangles at sf0.1, 13M after the gate) — the canonical
    distributed-graph aggregate (clustering-coefficient numerator,
    community-density signal; Suri & Vassilvitskii 2011's MapReduce
    formulation is the shape used here): wedges from an edge-edge join
    on the shared middle node, closed by a semi-join probe for the
    third edge, oriented a<b<c so every triangle is generated exactly
    once.

    Shape at scale: the edge list comes from a per-order self-join
    whose fan-out is BOUNDED by order width (TPC-H orders carry <= 7
    lines, so <= 21 pairs/order — linear in lineitem, never
    corpus-quadratic), then dedups to at most |S| choose 2 rows.
    Triangles are then listed DEGREE-ORIENTED (Suri & Vassilvitskii
    2011's refinement): orient every edge from its lower-(degree, id)
    endpoint to the higher one, so every wedge pivots on its triangle's
    degree-MINIMUM node and wedge mass drops from sum(d_< * d_>) to
    sum(C(outdeg, 2)) with outdeg bounded by O(sqrt(2m)) (arboricity
    bound) — hub nodes never pivot wedges, which is THE scale property
    on power-law co-occurrence graphs (a df-1e6 hub contributes deg^2
    wedges id-oriented, ~0 degree-oriented). Wedges are pairs of
    out-edges of one pivot (self-equi-join on the pivot key), deduped
    by the carried (degree, id) order of the far endpoints so the
    closing edge is exactly the oriented t1->t2 row — one LeftSemi
    probe, no wedge survives materialization unless the triangle
    closes. Measured on this (uniform, dense) fixture at sf0.1: 28.7M
    wedges vs 30.6M id-oriented, 7.1s vs 7.9s — modest here by
    construction; the asymptotic gap is the point. Per-node counts
    explode 3 rows per triangle; top-20 plans as
    TakeOrderedAndProject.

    Parity: everything is exact integers; ordering ties break on
    s_suppkey."""
    pn = _tri_per_node(spark, sf_dir)
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pn.join(F.broadcast(sup), pn.node == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.col("tri_count").cast("bigint").alias("tri_count"))
        .orderBy(F.col("tri_count").desc(), "s_suppkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# win_cusum_changepoint
# ---------------------------------------------------------------------------

_CUSUM_K = 40.0  # slack (~0.8 sigma of events.value), binary-exact
_CUSUM_H = 200.0  # alarm threshold (~4 sigma), binary-exact


@query(
    "win_cusum_changepoint",
    # Recursive-CTE oracle, not list_reduce: the CUSUM state is a
    # STRUCT (cs, mx, al) and DuckDB 1.0's list_reduce silently
    # mis-folds struct accumulators past ~2 elements (CLAUDE.md
    # round-6; win_holt_linear pins the same workaround).
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, round(value, 6) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    mu AS (
      SELECT user_id,
             CAST(sum(CAST(x AS DECIMAL(28, 6))) AS DOUBLE) / count(*) AS m,
             max(rn) AS n
      FROM seq GROUP BY user_id),
    st AS (
      SELECT s.user_id, 1 AS i,
             greatest(0.0, s.x - mu.m - {_CUSUM_K}) AS cs,
             greatest(0.0, s.x - mu.m - {_CUSUM_K}) AS mx,
             CASE WHEN greatest(0.0, s.x - mu.m - {_CUSUM_K}) > {_CUSUM_H}
                  THEN 1 ELSE 0 END AS al
      FROM seq s JOIN mu ON s.user_id = mu.user_id AND s.rn = 1
      UNION ALL
      SELECT st.user_id, st.i + 1,
             greatest(0.0, st.cs + s.x - mu.m - {_CUSUM_K}),
             greatest(st.mx,
                      greatest(0.0, st.cs + s.x - mu.m - {_CUSUM_K})),
             st.al + CASE WHEN greatest(0.0, st.cs + s.x - mu.m - {_CUSUM_K})
                               > {_CUSUM_H} THEN 1 ELSE 0 END
      FROM st JOIN seq s ON s.user_id = st.user_id AND s.rn = st.i + 1
              JOIN mu ON mu.user_id = st.user_id)
    SELECT st.user_id, CAST(mu.n AS BIGINT) AS n_events,
           round(st.mx, 6) AS max_cusum,
           CAST(st.al AS BIGINT) AS n_alarms,
           CAST(CASE WHEN st.al > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS alarmed
    FROM st JOIN mu ON st.user_id = mu.user_id AND st.i = mu.n
    """,
)
def win_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-SIDED CUSUM change-point detection per user (Page 1954):
    s_i = max(0, s_(i-1) + x_i - mean - k), alarm when s crosses h —
    the sequential drift detector monitoring pipelines run over
    per-entity metric streams (here: event values per user, k ~0.8
    sigma, h ~4 sigma; 41/150 fixture users alarm). Reports the peak
    statistic and alarm count per user.

    Same per-key-bounded sequential-fold shape as win_holt_linear: the
    series is collected per user (bounded by per-user activity, the
    partitioning key a 1000-executor run shards on) and folded
    JVM-side as a (cs, mx, al) STRUCT accumulator — no UDF, no
    driver iteration. The per-user mean rides the same aggregate.

    Parity: inputs are round(6)-quantized; the mean divides an exact
    DECIMAL sum; both constants are binary-exact; the fold's update
    expression is textually identical on both engines (left-assoc
    cs + x - m - k) and the time order is pinned by (ts, event_id),
    so the doubles agree bit-wise before the single round(6)."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.select(
            "user_id",
            F.round("value", 6).alias("x"),
            F.struct(
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.round("value", 6).alias("x"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            (
                F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("m"),
            F.sort_array(F.collect_list("s")).alias("ss"),
        )
    )
    fold = F.expr(
        "aggregate(transform(ss, s -> s.x), "
        "named_struct('cs', CAST(0.0 AS DOUBLE), "
        "'mx', CAST(0.0 AS DOUBLE), 'al', CAST(0 AS BIGINT)), "
        f"(s, x) -> named_struct("
        f"'cs', greatest(0.0D, s.cs + x - m - {_CUSUM_K}D), "
        f"'mx', greatest(s.mx, greatest(0.0D, s.cs + x - m - {_CUSUM_K}D)), "
        f"'al', s.al + IF(greatest(0.0D, s.cs + x - m - {_CUSUM_K}D) "
        f"> {_CUSUM_H}D, CAST(1 AS BIGINT), CAST(0 AS BIGINT))))"
    )
    return v.select("user_id", "n_events", fold.alias("st")).select(
        "user_id",
        "n_events",
        F.round(F.col("st.mx"), 6).alias("max_cusum"),
        F.col("st.al").alias("n_alarms"),
        (F.col("st.al") > 0).cast("bigint").alias("alarmed"),
    )


# ---------------------------------------------------------------------------
# agg_decayed_count
# ---------------------------------------------------------------------------

_DECAY_HALFLIFE_WEEKS = 1
_DECAY_CAP_WEEKS = 8


@query(
    "agg_decayed_count",
    oracle=f"""
    WITH mx AS (SELECT max(epoch_us(ts)) AS us_max FROM events),
    w AS (
      SELECT event_type,
             least(CAST((us_max - epoch_us(ts))
                        // CAST(604800000000 AS BIGINT) AS INTEGER),
                   {_DECAY_CAP_WEEKS}) AS age_wk
      FROM events CROSS JOIN mx)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(1.0 / CAST(CAST(1 AS BIGINT) << age_wk
                                          AS DOUBLE)
                               AS DECIMAL(28, 9))) AS DOUBLE), 6)
             AS decayed_count
    FROM w
    GROUP BY event_type
    """,
)
def agg_decayed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY TIME-DECAYED event counts per type (halflife =
    {_DECAY_HALFLIFE_WEEKS} week, integer week buckets, capped at
    {_DECAY_CAP_WEEKS}) — the recency-weighted popularity counter
    behind trending rankings and feature-store freshness signals: an
    event k weeks old contributes 2^-k.

    Shape at scale: the global max timestamp is one scalar aggregate
    broadcast into a map pass; the decayed sum is then an ordinary
    hash aggregate with map-side partial combine — the whole op is
    scan + two exchanges of 5 rows. The weight never calls pow():
    2^-k is 1.0 / (1 << k), an exact power of two for any capped k,
    so every per-row weight is an exact double AND an exact
    DECIMAL(28,9) (2^-8 has 8 decimal digits), making the group sum
    order-independent without quantization loss.

    Parity: integer floor-division week bucketing on epoch
    microseconds; exact weights; one round(6) on the decimal-to-double
    cast."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("us_max"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.least(
                F.expr(
                    "CAST((us_max - unix_micros(ts)) "
                    "div CAST(604800000000 AS BIGINT) AS INT)"
                ),
                F.lit(_DECAY_CAP_WEEKS),
            ).alias("age_wk"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(1.0 / CAST(shiftleft(CAST(1 AS BIGINT), "
                        "age_wk) AS DOUBLE) AS DECIMAL(28,9))"
                    )
                ).cast("double"),
                6,
            ).alias("decayed_count"),
        )
    )


# ---------------------------------------------------------------------------
# agg_welch_ttest
# ---------------------------------------------------------------------------


@query(
    "agg_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS grp,
             CAST(l.l_quantity AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    s AS (
      SELECT grp, count(*) AS n, sum(q) AS sq, sum(q * q) AS sqq
      FROM g GROUP BY grp),
    m AS (
      SELECT grp, n, CAST(sq AS DOUBLE) / n AS mean,
             (CAST(sqq AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / n) / (n - 1)
               AS var
      FROM s WHERE n >= 2),
    tw AS (
      SELECT p.n AS n_promo, o.n AS n_other,
             p.mean AS m_promo, o.mean AS m_other,
             p.var / p.n + o.var / o.n AS se2,
             p.var / p.n AS a, o.var / o.n AS b,
             p.n AS np, o.n AS no
      FROM (SELECT * FROM m WHERE grp = 1) p
      CROSS JOIN (SELECT * FROM m WHERE grp = 0) o)
    SELECT CAST(n_promo AS BIGINT) AS n_promo,
           CAST(n_other AS BIGINT) AS n_other,
           round(m_promo, 6) AS mean_promo,
           round(m_other, 6) AS mean_other,
           round((m_promo - m_other) / sqrt(se2), 6) AS t_stat,
           round((se2 * se2)
                 / ((a * a) / (np - 1) + (b * b) / (no - 1)), 6) AS df
    FROM tw
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE T-TEST: does promotional part type
    shift ordered quantity? (The A/B-test primitive run directly in
    the warehouse: group = p_type LIKE 'PROMO%', metric = l_quantity,
    Welch-Satterthwaite degrees of freedom.) One row: group sizes,
    means, t statistic, df.

    Shape at scale: the part dimension joins broadcast (dimension
    tables fit executors at any fact scale); sufficient statistics
    (n, sum, sum-of-squares) come from ONE hash aggregate with
    map-side combine — the classic one-pass parallel t-test; the
    final algebra touches 2 rows. No second pass, no window, no sort.

    Parity: quantities are integral doubles cast to BIGINT (exact),
    so n/sum/sum-sq are exact integers on both engines; every derived
    double (mean, variance, t, df) is computed with the textually
    identical expression shape and round(6)'d once. Squares stay in
    DOUBLE algebra — at warehouse scale sum(q*q) would need
    DECIMAL(38) headroom, which both engines' BIGINT covers to ~3e9
    rows of q<=50 (documented bound)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    g = li.join(
        F.broadcast(pt), li.l_partkey == pt.p_partkey
    ).select(
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("grp"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    s = g.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    m = s.where(F.col("n") >= 2).select(
        "grp",
        "n",
        (F.col("sq").cast("double") / F.col("n")).alias("mean"),
        (
            (
                F.col("sqq").cast("double")
                - F.col("sq").cast("double")
                * F.col("sq").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var"),
    )
    p = m.where(F.col("grp") == 1).select(
        F.col("n").alias("np"), F.col("mean").alias("m_promo"),
        F.col("var").alias("vp"),
    )
    o = m.where(F.col("grp") == 0).select(
        F.col("n").alias("no"), F.col("mean").alias("m_other"),
        F.col("var").alias("vo"),
    )
    tw = p.crossJoin(o).select(
        "np", "no", "m_promo", "m_other",
        (F.col("vp") / F.col("np") + F.col("vo") / F.col("no")).alias("se2"),
        (F.col("vp") / F.col("np")).alias("a"),
        (F.col("vo") / F.col("no")).alias("b"),
    )
    return tw.select(
        F.col("np").cast("bigint").alias("n_promo"),
        F.col("no").cast("bigint").alias("n_other"),
        F.round("m_promo", 6).alias("mean_promo"),
        F.round("m_other", 6).alias("mean_other"),
        F.round(
            (F.col("m_promo") - F.col("m_other")) / F.sqrt("se2"), 6
        ).alias("t_stat"),
        F.round(
            (F.col("se2") * F.col("se2"))
            / (
                (F.col("a") * F.col("a")) / (F.col("np") - 1)
                + (F.col("b") * F.col("b")) / (F.col("no") - 1)
            ),
            6,
        ).alias("df"),
    )


# ---------------------------------------------------------------------------
# agg_chi_square_independence
# ---------------------------------------------------------------------------


@query(
    "agg_chi_square_independence",
    oracle="""
    WITH o AS (
      SELECT event_type AS et, day(ts) % 7 AS dow, count(*) AS obs
      FROM events GROUP BY 1, 2),
    rt AS (SELECT et, sum(obs) AS r FROM o GROUP BY et),
    ct AS (SELECT dow, sum(obs) AS c FROM o GROUP BY dow),
    n AS (SELECT sum(obs) AS n FROM o),
    cells AS (
      SELECT o.obs, rt.r * ct.c / (n.n * 1.0) AS e
      FROM o JOIN rt USING (et) JOIN ct USING (dow) CROSS JOIN n)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_events,
           CAST(((SELECT count(*) FROM rt) - 1)
                * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof,
           round(CAST(sum(CAST(round((obs - e) * (obs - e) / e, 9)
                               AS DECIMAL(28, 9))) AS DOUBLE), 6)
             AS chi2_stat
    FROM cells
    """,
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEARSON CHI-SQUARE test of independence between event type and
    day-of-week bucket (day(ts) % 7 — the identical integer bucketing
    on both engines, sidestepping the engines' dayofweek origin
    mismatch): the categorical-drift / seasonality screen run over
    event logs. One row: N, degrees of freedom, chi2.

    Shape at scale: one hash aggregate collapses the fact table to
    |types| x |buckets| cells (map-side combine does the heavy
    lifting); marginals re-aggregate those ~35 rows; everything after
    the first aggregate is broadcast-sized. This is the textbook
    two-level aggregation — no row ever shuffles twice.

    Parity: observed counts and marginals are exact integers; the
    expected value divides exact integer products (r*c <= ~1e12,
    exact in double) by N once; per-cell contributions are round(9)-
    quantized and summed as DECIMAL so the 35-term sum is
    order-independent; one round(6)."""
    ev = table(spark, sf_dir, "events")
    o = (
        ev.select(
            F.col("event_type").alias("et"),
            (F.dayofmonth("ts") % 7).alias("dow"),
        )
        .groupBy("et", "dow")
        .agg(F.count("*").alias("obs"))
    )
    rt = o.groupBy("et").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("dow").agg(F.sum("obs").alias("c"))
    n = o.agg(
        F.sum("obs").alias("n"),
        F.count_distinct("et").alias("net"),
    )
    ndow = o.agg(F.count_distinct("dow").alias("ndow"))
    cells = (
        o.join(F.broadcast(rt), "et")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ndow))
        .select(
            "n",
            "net",
            "ndow",
            "obs",
            (F.col("r") * F.col("c") / (F.col("n") * F.lit(1.0))).alias("e"),
        )
    )
    return cells.groupBy("n", "net", "ndow").agg(
        F.sum(
            F.expr(
                "CAST(round((obs - e) * (obs - e) / e, 9) AS DECIMAL(28,9))"
            )
        ).alias("chi2")
    ).select(
        F.col("n").cast("bigint").alias("n_events"),
        ((F.col("net") - 1) * (F.col("ndow") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(F.col("chi2").cast("double"), 6).alias("chi2_stat"),
    )


# ---------------------------------------------------------------------------
# win_seasonal_naive_mae
# ---------------------------------------------------------------------------


@query(
    "win_seasonal_naive_mae",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(CAST(sum(CAST(round(value, 6) AS DECIMAL(28, 6)))
                        AS DOUBLE), 6) AS total
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT event_type, total,
             lag(total, 7) OVER (PARTITION BY event_type
                                 ORDER BY day) AS pred
      FROM daily)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(pred) AS BIGINT) AS n_forecast,
           round(CAST(sum(CAST(round(abs(total - pred), 6)
                               AS DECIMAL(28, 6))) AS DOUBLE)
                 / count(pred), 6) AS mae
    FROM f
    GROUP BY event_type
    """,
)
def win_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-NAIVE FORECAST BACKTEST per event type: predict each
    day's total value with the total from 7 days (7 series rows)
    earlier and report the mean absolute error — the standard
    baseline every forecasting deployment must beat (and the cheapest
    possible backtest to run in-warehouse). Output: days, forecastable
    days, MAE per type.

    Shape at scale: the fact table collapses to |types| x |days| rows
    in one map-side-combined aggregate; the lag window then runs per
    type over day-count-bounded partitions (365 rows/year/type — the
    window is trivially executor-local after the aggregate's
    shuffle, and Catalyst reuses that exchange for the window's
    partitioning). The final MAE aggregate rides the same partitions.

    Parity: daily totals sum round(6)-quantized values as DECIMAL
    (order-independent) and are re-round(6)'d; the error is a
    difference of those identical doubles, quantized again before the
    DECIMAL mean. lag(7) over (event_type, day) is deterministic —
    day is unique per type after aggregation."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round("value", 6).cast("decimal(28,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.round(F.sum("v").cast("double"), 6).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    f = daily.select(
        "event_type", "total", F.lag("total", 7).over(w).alias("pred")
    )
    return f.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.count("pred").cast("bigint").alias("n_forecast"),
        F.round(
            F.sum(
                F.round(F.abs(F.col("total") - F.col("pred")), 6).cast(
                    "decimal(28,6)"
                )
            ).cast("double")
            / F.count("pred"),
            6,
        ).alias("mae"),
    )



def _domain_bucket(vt, n_buckets: int = 16):
    """Attach a data-derived range-bucket id to a distinct-value frame:
    width = (max - min) / n_buckets from a broadcast 1-row aggregate,
    so the bucket COUNT is data-independent (the round-7 advisory fix
    — a hard-coded width silently degrades to one bucket, i.e. a
    single-partition window, if the value range rescales). floor() is
    monotone in v, which is all the two-level bucketed cumsum needs;
    the bucket id never reaches the output or the oracle."""
    stats = vt.agg(F.min("v").alias("_vmin"), F.max("v").alias("_vmax"))
    width = F.greatest(
        (F.col("_vmax") - F.col("_vmin")) / float(n_buckets), F.lit(1e-12)
    )
    return (
        vt.crossJoin(F.broadcast(stats))
        .withColumn(
            "bkt", F.floor((F.col("v") - F.col("_vmin")) / width).cast("int")
        )
        .drop("_vmin", "_vmax")
    )


# ---------------------------------------------------------------------------
# agg_mann_whitney_u
# ---------------------------------------------------------------------------


@query(
    "agg_mann_whitney_u",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             value AS v
      FROM events WHERE event_type IN ('purchase', 'click')),
    vt AS (
      SELECT v, sum(grp) AS n1v, count(*) AS ntv
      FROM g GROUP BY v),
    rk AS (
      SELECT v, n1v, ntv,
             sum(ntv) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - ntv AS cum_less
      FROM vt),
    s AS (
      SELECT sum(n1v * (2 * cum_less + ntv + 1)) AS two_r1,
             sum(n1v) AS n1, sum(ntv - n1v) AS n2, sum(ntv) AS n,
             sum(ntv * ntv * ntv - ntv) AS ties
      FROM rk)
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_click,
           CAST(ties AS BIGINT) AS tie_term,
           round((two_r1 - n1 * (n1 + 1)) / 2.0, 1) AS u_stat,
           round(((two_r1 - n1 * (n1 + 1)) - n1 * n2) / 2.0
                 / sqrt(n1 * n2 / 12.0
                        * ((n + 1) - ties / (n * 1.0 * (n - 1)))), 6)
             AS z_stat
    FROM s WHERE n1 > 0 AND n2 > 0 AND n >= 2
    """,
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U rank-sum test (tie-corrected normal
    approximation): do 'purchase' and 'click' events draw their values
    from the same distribution? The nonparametric companion to
    agg_welch_ttest — the test teams reach for when metric
    distributions are skewed (revenue-like metrics always are).

    Ranks are never materialized per row: values collapse to
    DISTINCT-VALUE groups first (one map-side-combined aggregate), and
    the average rank of a tied block is reconstructed from cumulative
    counts — 2*cum_less + block + 1, kept as INTEGERS by working with
    2x the rank sum throughout. The running cumulative is a window
    over distinct-value rows only: bounded by the metric's value
    domain (~49k two-decimal values here), not the event count — the
    one ordered pass is over a domain-bounded series, the same
    contract as agg_exact_quantile_2pass. The cumulative itself is the
    two-pass range-bucketed form (per-bucket window + a prefix over
    bucket totals), so no single-partition global window exists even
    when the domain grows.

    Parity: U and the tie term are exact integers on both engines
    (value equality groups identical doubles); z divides the same
    integer expressions with the identical shape, one round(6).
    u_stat is an exact multiple of 0.5 -> round(,1) is lossless."""
    ev = table(spark, sf_dir, "events")
    g = ev.where(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "grp"
        ),
        F.col("value").alias("v"),
    )
    vt = _domain_bucket(
        g.groupBy("v").agg(
            F.sum("grp").alias("n1v"), F.count("*").alias("ntv")
        )
    )
    # two-pass distributed cumulative count (the agg_exact_quantile_2pass
    # shape): a per-bucket window over value-range buckets plus a
    # bucket-count-bounded prefix over the ~10 bucket totals — never the
    # single-partition global window WindowExec warns about.
    w_local = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bt = vt.groupBy("bkt").agg(F.sum("ntv").alias("btot"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    before = bt.select(
        "bkt", (F.sum("btot").over(w_b) - F.col("btot")).alias("cum_before")
    )
    rk = (
        vt.withColumn("cum_in", F.sum("ntv").over(w_local))
        .join(F.broadcast(before), "bkt")
        .select(
            "n1v",
            "ntv",
            (F.col("cum_before") + F.col("cum_in") - F.col("ntv")).alias(
                "cum_less"
            ),
        )
    )
    s = rk.agg(
        F.sum(
            F.col("n1v") * (2 * F.col("cum_less") + F.col("ntv") + 1)
        ).alias("two_r1"),
        F.sum("n1v").alias("n1"),
        F.sum(F.col("ntv") - F.col("n1v")).alias("n2"),
        F.sum("ntv").alias("n"),
        F.sum(
            F.col("ntv") * F.col("ntv") * F.col("ntv") - F.col("ntv")
        ).alias("ties"),
    )
    s = s.where(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n") >= 2)
    )
    return s.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
        F.col("ties").cast("bigint").alias("tie_term"),
        F.round(
            (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)) / 2.0, 1
        ).alias("u_stat"),
        F.round(
            ((F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
             - F.col("n1") * F.col("n2"))
            / 2.0
            / F.sqrt(
                F.col("n1") * F.col("n2") / 12.0
                * ((F.col("n") + 1)
                   - F.col("ties")
                   / (F.col("n") * F.lit(1.0) * (F.col("n") - 1)))
            ),
            6,
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# pipeline_curation_funnel
# ---------------------------------------------------------------------------

_FUNNEL_SPAN_MAX = 0.3  # max duplicated-span ratio a doc may carry


@query(
    "pipeline_curation_funnel",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, text, string_split(text, ' ') AS tk, n_chars
      FROM documents),
    gopher AS (
      SELECT doc_id,
             CASE WHEN len(tk) BETWEEN {_GOPHER_MIN_WORDS}
                         AND {_GOPHER_MAX_WORDS}
                   AND round((n_chars - len(tk) + 1.0) / len(tk), 6)
                         BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
                   AND len(list_filter(tk, w -> w IN ('the', 'a')))
                         >= {_GOPHER_MIN_STOP}
                   AND (CASE WHEN len(tk) >= 2 THEN
                          round(1.0 - len(list_distinct(list_transform(
                              generate_series(1, len(tk) - 1),
                              i -> list_extract(tk, i) || ' '
                                   || list_extract(tk, i + 1))))
                            / (len(tk) - 1.0), 6)
                        ELSE 0.0 END) <= {_GOPHER_MAX_DUPF}
                   AND round(list_max(list_transform(list_distinct(tk),
                           w -> len(list_filter(tk, x -> x = w))))
                         / (len(tk) * 1.0), 6) <= {_GOPHER_MAX_TOPR}
              THEN 1 ELSE 0 END AS f1
      FROM m),
    tc AS (
      SELECT doc_id, list_transform(tk,
               tok -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(tok, ''),
                                       c -> CAST(ascii(c) AS BIGINT))),
                      (h, c) -> (h * 31 + c) % {P_CODE})) AS tc
      FROM m),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(tc) - {_SPAN_K} + 1, {_SPAN_STRIDE}),
               i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_slice(tc, i, i + {_SPAN_K} - 1)),
                    (h, c) -> (h * 131 + c) % {P_HASH}))) AS h
      FROM tc WHERE len(tc) >= {_SPAN_K}),
    hc AS (SELECT h, count(*) AS c FROM sp GROUP BY h),
    dr AS (
      SELECT sp.doc_id,
             sum(CASE WHEN hc.c >= 2 THEN 1 ELSE 0 END)
               / (count(*) * 1.0) AS dup_ratio
      FROM sp JOIN hc USING (h) GROUP BY sp.doc_id),
    flags AS (
      SELECT m.doc_id, sha256(m.text) AS th, g.f1,
             CASE WHEN coalesce(dr.dup_ratio, 0) <= {_FUNNEL_SPAN_MAX}
                  THEN 1 ELSE 0 END AS f2
      FROM m JOIN gopher g ON m.doc_id = g.doc_id
      LEFT JOIN dr ON m.doc_id = dr.doc_id),
    keyed AS (
      SELECT doc_id, f1, f2,
             CASE WHEN doc_id = min(CASE WHEN f1 = 1 AND f2 = 1
                                         THEN doc_id END)
                         OVER (PARTITION BY th)
                  THEN 1 ELSE 0 END AS f3
      FROM flags),
    agg AS (
      SELECT count(*) AS n0, sum(f1) AS n1,
             sum(f1 * f2) AS n2, sum(f1 * f2 * f3) AS n3
      FROM keyed)
    SELECT * FROM (
      SELECT 1 AS stage_no, 'gopher_rules' AS stage,
             CAST(n0 AS BIGINT) AS docs_in, CAST(n1 AS BIGINT) AS docs_out,
             CASE WHEN n0 = 0 THEN 0.0
                  ELSE round((n0 - n1) * 100.0 / n0, 6) END AS drop_pct
      FROM agg
      UNION ALL
      SELECT 2, 'span_dedup', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT),
             CASE WHEN n1 = 0 THEN 0.0
                  ELSE round((n1 - n2) * 100.0 / n1, 6) END FROM agg
      UNION ALL
      SELECT 3, 'exact_dedup', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT),
             CASE WHEN n2 = 0 THEN 0.0
                  ELSE round((n2 - n3) * 100.0 / n2, 6) END FROM agg) z
    """,
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END CORPUS-CURATION FUNNEL: Gopher rules ->
    duplicated-span ceiling (ratio <= {_FUNNEL_SPAN_MAX}) -> exact
    keep-first dedup, reporting in/out/drop% per stage — the
    dataset-card table every pretraining run publishes (how much
    survived each filter), composing this wave's three curation ops
    into one plan. Exact dedup is applied LAST and its keep-first
    min(doc_id) is computed over the docs that SURVIVED the first two
    stages (a doc knocked out by Gopher must not claim canonical-copy
    status for its duplicates) — the stage-ordering subtlety real
    funnels get wrong.

    Shape at scale: the Gopher flags are the no-shuffle map pass
    (text_gopher_rules); the span ratio reuses dedup_span_ngram's
    hash-aggregate+join-back; the canonical pick is one window over
    sha256 hash partitions; the funnel itself collapses to a single
    4-counter aggregate and unpivots 3 rows. Each stage re-scans the
    column-pruned documents table for its own metric (3 text-column
    passes; they share no shuffle and fuse into independent map
    stages — at 100 TB the alternative single-pass fusion is blocked
    by the span stage's explode+join-back shape).

    Parity: every flag is exact integer logic over the already-pinned
    metric expressions; drop percentages divide exact counts,
    round(6)."""
    d = table(spark, sf_dir, "documents")
    gopher = text_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep_flag").alias("f1")
    )
    spans = dedup_span_ngram(spark, sf_dir).select("doc_id", "dup_ratio")
    flags = (
        d.select("doc_id", F.sha2("text", 256).alias("th"))
        .join(gopher, "doc_id")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "th",
            "f1",
            (
                F.coalesce(F.col("dup_ratio"), F.lit(0.0))
                <= _FUNNEL_SPAN_MAX
            )
            .cast("int")
            .alias("f2"),
        )
    )
    w = Window.partitionBy("th")
    keyed = flags.select(
        "f1",
        "f2",
        (
            F.col("doc_id")
            == F.min(
                F.when(
                    (F.col("f1") == 1) & (F.col("f2") == 1), F.col("doc_id")
                )
            ).over(w)
        )
        .cast("int")
        .alias("f3"),
    )
    agg = keyed.agg(
        F.count("*").alias("n0"),
        F.sum("f1").alias("n1"),
        F.sum(F.col("f1") * F.col("f2")).alias("n2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3")).alias("n3"),
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_no"),
                    F.lit("gopher_rules").alias("stage"),
                    F.col("n0").cast("bigint").alias("docs_in"),
                    F.col("n1").cast("bigint").alias("docs_out"),
                    F.when(
                        F.col("n0") > 0,
                        F.round(
                            (F.col("n0") - F.col("n1")) * 100.0
                            / F.col("n0"),
                            6,
                        ),
                    ).otherwise(0.0).alias("drop_pct"),
                ),
                F.struct(
                    F.lit(2).alias("stage_no"),
                    F.lit("span_dedup").alias("stage"),
                    F.col("n1").cast("bigint").alias("docs_in"),
                    F.col("n2").cast("bigint").alias("docs_out"),
                    F.when(
                        F.col("n1") > 0,
                        F.round(
                            (F.col("n1") - F.col("n2")) * 100.0
                            / F.col("n1"),
                            6,
                        ),
                    ).otherwise(0.0).alias("drop_pct"),
                ),
                F.struct(
                    F.lit(3).alias("stage_no"),
                    F.lit("exact_dedup").alias("stage"),
                    F.col("n2").cast("bigint").alias("docs_in"),
                    F.col("n3").cast("bigint").alias("docs_out"),
                    F.when(
                        F.col("n2") > 0,
                        F.round(
                            (F.col("n2") - F.col("n3")) * 100.0
                            / F.col("n2"),
                            6,
                        ),
                    ).otherwise(0.0).alias("drop_pct"),
                ),
            )
        ).alias("s")
    )
    return stages.select("s.*")


# ---------------------------------------------------------------------------
# agg_ks_test_two_sample
# ---------------------------------------------------------------------------


@query(
    "agg_ks_test_two_sample",
    oracle="""
    WITH g AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             value AS v
      FROM events WHERE event_type IN ('purchase', 'click')),
    vt AS (
      SELECT v, sum(grp) AS d1, count(*) - sum(grp) AS d2
      FROM g GROUP BY v),
    cum AS (
      SELECT sum(d1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c1,
             sum(d2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c2
      FROM vt),
    tot AS (SELECT sum(d1) AS n1, sum(d2) AS n2 FROM vt),
    gap AS (
      SELECT max(abs(c1 * n2 - c2 * n1)) AS mx
      FROM cum CROSS JOIN tot)
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_click,
           round(mx / (n1 * 1.0 * n2), 6) AS d_stat,
           round(mx / (n1 * 1.0 * n2)
                 * sqrt(n1 * n2 / (n1 * 1.0 + n2)), 6) AS ks_scaled
    FROM gap CROSS JOIN tot
    WHERE n1 > 0 AND n2 > 0
    """,
)
def agg_ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV-SMIRNOV statistic between 'purchase' and
    'click' event values: D = sup_v |F1(v) - F2(v)|, the standard
    distribution-shift detector (training-data drift monitors run
    exactly this per feature). Also reports the sample-size-scaled
    statistic sqrt(n1 n2/(n1+n2)) * D that the asymptotic p-value
    tables consume.

    The empirical-CDF gap never touches doubles until the very end:
    |c1*n2 - c2*n1| keeps the sup over an INTEGER lattice (c1/n1 -
    c2/n2 with common denominator n1*n2), so the max is exact on both
    engines regardless of accumulation order — the same
    integers-first discipline as agg_mann_whitney_u. Distinct-value
    collapse bounds the scan: cumulative counts run over the value
    DOMAIN (~49k two-decimal values), not the event count, and the
    oracle's single ordered window is the domain-bounded pass the
    Spark side implements as the two-level bucketed cumsum.

    Parity: integers up to the two final divisions, round(6) each."""
    ev = table(spark, sf_dir, "events")
    g = ev.where(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "grp"
        ),
        F.col("value").alias("v"),
    )
    vt = _domain_bucket(
        g.groupBy("v").agg(
            F.sum("grp").alias("d1"),
            (F.count("*") - F.sum("grp")).alias("d2"),
        )
    )
    w_local = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bt = vt.groupBy("bkt").agg(
        F.sum("d1").alias("b1"), F.sum("d2").alias("b2")
    )
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    before = bt.select(
        "bkt",
        (F.sum("b1").over(w_b) - F.col("b1")).alias("p1"),
        (F.sum("b2").over(w_b) - F.col("b2")).alias("p2"),
    )
    cum = (
        vt.withColumn("l1", F.sum("d1").over(w_local))
        .withColumn("l2", F.sum("d2").over(w_local))
        .join(F.broadcast(before), "bkt")
        .select(
            (F.col("p1") + F.col("l1")).alias("c1"),
            (F.col("p2") + F.col("l2")).alias("c2"),
        )
    )
    tot = vt.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    gap = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        ).alias("mx")
    )
    d = F.col("mx") / (F.col("n1") * F.lit(1.0) * F.col("n2"))
    return (
        gap.crossJoin(F.broadcast(tot))
        .where((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            F.col("n1").cast("bigint").alias("n_purchase"),
            F.col("n2").cast("bigint").alias("n_click"),
            F.round(d, 6).alias("d_stat"),
            F.round(
                d
                * F.sqrt(
                    F.col("n1")
                    * F.col("n2")
                    / (F.col("n1") * F.lit(1.0) + F.col("n2"))
                ),
                6,
            ).alias("ks_scaled"),
        )
    )


# ---------------------------------------------------------------------------
# graph_jaccard_neighbor_sim
# ---------------------------------------------------------------------------


_JACCARD_MIN_SUPPORT = 5  # stronger gate than triangles: the wedge
# mass of the common-neighbor join is sum(deg^2), 184M at support 3 vs
# 9.3M at support 5 on sf0.1 (measured) — embeddedness only means
# anything over strong edges anyway


@query(
    "graph_jaccard_neighbor_sim",
    oracle=f"""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= {_JACCARD_MIN_SUPPORT}),
    adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT x, count(*) AS d FROM adj GROUP BY x),
    common AS (
      SELECT e.u, e.v, count(*) AS cn
      FROM e JOIN adj a1 ON a1.x = e.u
             JOIN adj a2 ON a2.x = e.v AND a2.y = a1.y
      WHERE a1.y <> e.v AND a1.y <> e.u
      GROUP BY e.u, e.v)
    SELECT c.u, c.v, CAST(c.cn AS BIGINT) AS common_neighbors,
           round(c.cn * 1.0
                 / (du.d + dv.d - 2 - c.cn), 6) AS neighbor_jaccard
    FROM common c
    JOIN deg du ON du.x = c.u
    JOIN deg dv ON dv.x = c.v
    WHERE du.d + dv.d - 2 - c.cn > 0
    ORDER BY neighbor_jaccard DESC, c.u, c.v
    LIMIT 20
    """,
)
def graph_jaccard_neighbor_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDGE EMBEDDEDNESS — neighborhood Jaccard per co-supply edge:
    J(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v) \\ {u,v}| over the
    support-gated co-supply graph — the structural edge-strength
    measure (Granovetter's embeddedness; link-prediction's Jaccard
    baseline) that separates community-internal edges from bridges.
    Top-20 strongest-embedded supplier pairs with common-neighbor
    counts.

    Shape at scale: reuses the checkpointed edge builder
    (_cosupply_edges) at support >= 5 — one derivation per session,
    cached per (application, sf_dir, support). Common neighbors
    come from the SAME wedge-join shape as triangle counting (join the
    symmetric adjacency on both endpoints, shuffling on node keys);
    degrees are one hash aggregate; the union size is degree algebra
    (du + dv - 2 - common), never a second set operation. Top-20 is
    TakeOrderedAndProject.

    Parity: counts and degrees are exact integers; one division,
    round(6); ties break on (u, v)."""
    e = _cosupply_edges(spark, sf_dir, _JACCARD_MIN_SUPPORT)
    adj = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = adj.groupBy("x").agg(F.count("*").alias("d"))
    a1 = adj.select(F.col("x").alias("u"), F.col("y").alias("w"))
    a2 = adj.select(F.col("x").alias("v"), F.col("y").alias("w"))
    common = (
        e.join(a1, "u")
        .join(a2, ["v", "w"])
        .where((F.col("w") != F.col("v")) & (F.col("w") != F.col("u")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cn"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    uni = F.col("du") + F.col("dv") - 2 - F.col("cn")
    return (
        common.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .where(uni > 0)
        .select(
            "u",
            "v",
            F.col("cn").cast("bigint").alias("common_neighbors"),
            F.round(F.col("cn") * F.lit(1.0) / uni, 6).alias(
                "neighbor_jaccard"
            ),
        )
        .orderBy(F.col("neighbor_jaccard").desc(), "u", "v")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# text_burstiness
# ---------------------------------------------------------------------------

_BURST_MIN_DF = 20


@query(
    "text_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, t.tok
      FROM documents d, unnest(string_split(d.text, ' ')) AS t(tok)
      WHERE t.tok <> ''),
    n AS (SELECT count(*) AS n_docs FROM documents),
    per_doc AS (
      SELECT tok, doc_id, count(*) AS c FROM toks GROUP BY 1, 2),
    term AS (
      SELECT tok, count(*) AS df, sum(c) AS cf, sum(c * c) AS cf2
      FROM per_doc GROUP BY tok
      HAVING count(*) >= {_BURST_MIN_DF})
    SELECT tok, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
           round((CAST(cf2 AS DOUBLE) / n_docs
                  - (CAST(cf AS DOUBLE) / n_docs)
                    * (CAST(cf AS DOUBLE) / n_docs))
                 / (CAST(cf AS DOUBLE) / n_docs), 6) AS burstiness
    FROM term CROSS JOIN n
    ORDER BY burstiness DESC, tok
    LIMIT 20
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TERM BURSTINESS (Church & Gale 1995): variance-to-mean ratio of
    per-document term counts (zeros included via the closed form
    E[x^2] - E[x]^2 over all N docs) — separates topical terms, which
    clump into few documents, from function words spread evenly
    (burstiness ~= the overdispersion a Poisson model can't explain).
    Content-word detection for stopword-list induction and keyword
    extraction at corpus scale. Top-20 burstiest terms with df >=
    {_BURST_MIN_DF} support.

    Shape at scale: tokens collapse to (term, doc) counts (map-side
    combine), then to per-term sufficient statistics (df, sum c, sum
    c^2) — two vocabulary-bounded hash aggregates; docs that lack a
    term contribute exactly zero to every sum, so the all-N moments
    need NO join back to the corpus, just the scalar doc count
    broadcast into the final projection. Top-20 is
    TakeOrderedAndProject.

    Parity: all sufficient statistics are exact integers; the
    variance/mean algebra is the identical double expression shape on
    both engines, one round(6); ties break on the term."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    n = d.agg(F.count("*").alias("n_docs"))
    per_doc = toks.groupBy("tok", "doc_id").agg(F.count("*").alias("c"))
    term = (
        per_doc.groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.sum("c").alias("cf"),
            F.sum(F.col("c") * F.col("c")).alias("cf2"),
        )
        .where(F.col("df") >= _BURST_MIN_DF)
    )
    mean = F.col("cf").cast("double") / F.col("n_docs")
    return (
        term.crossJoin(F.broadcast(n))
        .select(
            "tok",
            F.col("df").cast("bigint").alias("df"),
            F.col("cf").cast("bigint").alias("cf"),
            F.round(
                (F.col("cf2").cast("double") / F.col("n_docs")
                 - mean * mean)
                / mean,
                6,
            ).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), "tok")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# agg_cusum_arl_calibration
# ---------------------------------------------------------------------------

_ARL_HS = (50.0, 100.0, 200.0, 400.0)  # binary-exact threshold sweep


def _arl_oracle() -> str:
    h1, h2, h3, h4 = _ARL_HS
    firsts_anchor = ", ".join(
        f"CASE WHEN greatest(0.0, s.x - mu.m - {_CUSUM_K}) > {h}"
        f" THEN 1 ELSE 0 END AS f{j}"
        for j, h in enumerate(_ARL_HS, 1)
    )
    firsts_step = ", ".join(
        f"CASE WHEN st.f{j} = 0 AND"
        f" greatest(0.0, st.cs + s.x - mu.m - {_CUSUM_K}) > {h}"
        f" THEN st.i + 1 ELSE st.f{j} END"
        for j, h in enumerate(_ARL_HS, 1)
    )
    per_h = "\n    UNION ALL ".join(
        f"""SELECT CAST({h} AS DOUBLE) AS h,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN f.f{j} > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarmed,
           round(CAST(sum(CASE WHEN f.f{j} > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS pct_alarmed,
           round(CAST(sum(CASE WHEN f.f{j} > 0 THEN f.f{j} ELSE 0 END)
                      AS DOUBLE)
                 / nullif(sum(CASE WHEN f.f{j} > 0 THEN 1 ELSE 0 END), 0),
                 6) AS avg_run_length
    FROM f"""
        for j, h in enumerate(_ARL_HS, 1)
    )
    return f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, round(value, 6) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    mu AS (
      SELECT user_id,
             CAST(sum(CAST(x AS DECIMAL(28, 6))) AS DOUBLE) / count(*) AS m,
             max(rn) AS n
      FROM seq GROUP BY user_id),
    st AS (
      SELECT s.user_id, 1 AS i,
             greatest(0.0, s.x - mu.m - {_CUSUM_K}) AS cs,
             {firsts_anchor}
      FROM seq s JOIN mu ON s.user_id = mu.user_id AND s.rn = 1
      UNION ALL
      SELECT st.user_id, st.i + 1,
             greatest(0.0, st.cs + s.x - mu.m - {_CUSUM_K}),
             {firsts_step}
      FROM st JOIN seq s ON s.user_id = st.user_id AND s.rn = st.i + 1
              JOIN mu ON mu.user_id = st.user_id),
    f AS (
      SELECT st.* FROM st JOIN mu
        ON st.user_id = mu.user_id AND st.i = mu.n)
    {per_h}
    """


@query("agg_cusum_arl_calibration", oracle=_arl_oracle())
def agg_cusum_arl_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM DETECTOR CALIBRATION: the empirical run-length table for
    win_cusum_changepoint's statistic across a threshold sweep
    (h in 50/100/200/400) — per threshold, how many users ever alarm
    and the average index of the FIRST alarm among those who do (the
    empirical ARL). This is how a monitoring team actually picks h:
    too low gives short run lengths (false-alarm storms), too high
    never fires; the fixture's h=200 choice (~4 sigma) sits where the
    alarm fraction drops steeply — the table makes that visible
    instead of folklore.

    One fold computes ALL thresholds: the per-user sequential CUSUM
    fold (sort_array + aggregate, the win_cusum_changepoint shape)
    carries a struct of four first-alarm indices updated as
    fj := i when fj = 0 and cs crosses h_j — integer indices, so the
    per-threshold ARL is a ratio of exact integers. The oracle is the
    same recursive CTE with four first columns (struct list_reduce is
    broken in DuckDB — round-6 note).

    Scale: one user_id shuffle, per-user bounded fold, 4-row output
    via stack() over the threshold domain."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.select(
            "user_id",
            F.round("value", 6).alias("x"),
            F.struct(
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.round("value", 6).alias("x"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("m"),
            F.sort_array(F.collect_list("s")).alias("ss"),
        )
    )
    init_firsts = ", ".join(
        f"'f{j}', CAST(0 AS BIGINT)" for j in range(1, len(_ARL_HS) + 1)
    )
    step_firsts = ", ".join(
        f"'f{j}', IF(s.f{j} = 0 AND "
        f"greatest(0.0D, s.cs + x - m - {_CUSUM_K}D) > {h}D, "
        f"s.i + 1, s.f{j})"
        for j, h in enumerate(_ARL_HS, 1)
    )
    fold = F.expr(
        "aggregate(transform(ss, s -> s.x), "
        f"named_struct('cs', CAST(0.0 AS DOUBLE), 'i', CAST(0 AS BIGINT), "
        f"{init_firsts}), "
        f"(s, x) -> named_struct("
        f"'cs', greatest(0.0D, s.cs + x - m - {_CUSUM_K}D), "
        f"'i', s.i + 1, {step_firsts}))"
    )
    per_user = v.select(fold.alias("st")).select(
        *[F.col(f"st.f{j}").alias(f"f{j}") for j in range(1, len(_ARL_HS) + 1)]
    )
    aggs = []
    for j, h in enumerate(_ARL_HS, 1):
        aggs += [
            F.count("*").cast("bigint").alias(f"nu{j}"),
            F.sum(F.when(F.col(f"f{j}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"na{j}"),
            F.sum(F.when(F.col(f"f{j}") > 0, F.col(f"f{j}")).otherwise(0))
            .cast("bigint")
            .alias(f"fs{j}"),
        ]
    wide = per_user.agg(*aggs)
    stacked = ", ".join(
        f"{h}D, nu{j}, na{j}, "
        f"round(CAST(na{j} AS DOUBLE) / nu{j}, 6), "
        f"round(CAST(fs{j} AS DOUBLE) / nullif(na{j}, 0), 6)"
        for j, h in enumerate(_ARL_HS, 1)
    )
    return wide.selectExpr(
        f"stack({len(_ARL_HS)}, {stacked}) AS "
        "(h, n_users, n_alarmed, pct_alarmed, avg_run_length)"
    )


# ---------------------------------------------------------------------------
# graph_triangle_wedge_cap — bounded-cost triangle counting for skew
# ---------------------------------------------------------------------------

_WEDGE_CAP = 32  # per-pivot out-adjacency cap (smallest (deg, id) kept)
_ORIENTED_EDGES_CACHE: dict = {}


def _oriented_cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented co-supply edges (s, t, dt), localCheckpointed
    ONCE per (applicationId, sf_dir) — the checkpoint is otherwise
    re-derived eagerly on EVERY DataFrame build (measured 9.7 s warm
    in OPS_BENCH vs 0.7 s prepared-plan before caching; the
    _cosupply_edges rule, one level up)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ORIENTED_EDGES_CACHE:
        e = _cosupply_edges(spark, sf_dir)
        deg = (
            e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        lo_first = F.struct(F.col("du"), F.col("u")) < F.struct(
            F.col("dv"), F.col("v")
        )
        _ORIENTED_EDGES_CACHE[key] = (
            e.join(
                deg.select(F.col("n").alias("u"), F.col("d").alias("du")),
                "u",
            )
            .join(
                deg.select(F.col("n").alias("v"), F.col("d").alias("dv")),
                "v",
            )
            .select(
                F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
                F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"),
                F.when(lo_first, F.col("dv"))
                .otherwise(F.col("du"))
                .alias("dt"),
            )
            .localCheckpoint()  # bounded by |S| choose 2; referenced
            # by the rank window AND the closure probe
        )
    return _ORIENTED_EDGES_CACHE[key]


@query(
    "graph_triangle_wedge_cap",
    oracle=f"""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v FROM e) z
      GROUP BY n),
    er AS MATERIALIZED (
      SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS s,
             CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS t,
             CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS dt
      FROM e JOIN deg a ON e.u = a.n JOIN deg b ON e.v = b.n,
           LATERAL (SELECT a.d AS du, b.d AS dv) x),
    ranked AS MATERIALIZED (
      SELECT s, t, dt,
             row_number() OVER (PARTITION BY s ORDER BY dt, t) AS rk
      FROM er),
    odeg AS (SELECT s, max(rk) AS outdeg FROM ranked GROUP BY s),
    capstats AS (
      SELECT CAST(count(*) AS BIGINT) AS pivots,
             CAST(coalesce(sum(CASE WHEN outdeg > {_WEDGE_CAP}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS capped_pivots,
             CAST(coalesce(max(outdeg), 0) AS BIGINT) AS max_outdeg,
             CAST(coalesce(sum(least(outdeg, {_WEDGE_CAP})
                  * (least(outdeg, {_WEDGE_CAP}) - 1) // 2), 0)
                  AS BIGINT) AS wedges_considered,
             CAST(coalesce(sum(outdeg * (outdeg - 1) // 2
                  - least(outdeg, {_WEDGE_CAP})
                  * (least(outdeg, {_WEDGE_CAP}) - 1) // 2), 0)
                  AS BIGINT) AS wedges_dropped
      FROM odeg),
    capped AS (SELECT s, t, dt FROM ranked WHERE rk <= {_WEDGE_CAP}),
    tri AS (
      SELECT x.s, x.t AS t1, y.t AS t2
      FROM capped x JOIN capped y ON x.s = y.s
      WHERE (x.dt, x.t) < (y.dt, y.t)
        AND EXISTS (SELECT 1 FROM er e3
                    WHERE e3.s = x.t AND e3.t = y.t)),
    tl AS (SELECT CAST(count(*) AS BIGINT) AS triangles_lb FROM tri),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nodes FROM deg),
    ee AS (SELECT CAST(count(*) AS BIGINT) AS edges FROM e)
    SELECT nn.nodes, ee.edges, cs.pivots, cs.capped_pivots,
           cs.max_outdeg, cs.wedges_considered, cs.wedges_dropped,
           tl.triangles_lb,
           CAST(CASE WHEN cs.capped_pivots = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS exact_flag
    FROM nn CROSS JOIN ee CROSS JOIN capstats cs CROSS JOIN tl
    """,
)
def graph_triangle_wedge_cap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOUNDED-COST triangle counting — the skew-proof sibling of
    graph_triangle_cosupply (VERDICT r12 item 4: the wedge join is the
    repo's one super-linear scaling surface, time/input ratio 1.13 at
    sf1x, because wedge mass is sum(outdeg^2) and a skewed
    co-occurrence graph puts that mass on hub pivots).  Same
    degree-oriented edge list, but each pivot's out-adjacency is
    CAPPED to its _WEDGE_CAP = 32 smallest-(degree, id) far endpoints
    before the wedge self-join — wedge mass is then bounded by
    n * C(32, 2) ≈ 496n, LINEAR in nodes regardless of skew (the
    dedup_band_cap_audit recipe applied to triangles: deterministic
    truncation + an audit column, never a silent cap).  The closing
    probe still runs against the FULL oriented edge list, so every
    emitted triangle is real; capping only MISSES triangles whose
    pivot has both far endpoints outside its cap — triangles_lb is an
    exact LOWER BOUND, equal to the true count whenever
    capped_pivots = 0 (exact_flag says so in-row).

    One audit row: nodes/edges of the support-3 co-supply graph,
    pivot count, capped pivots, max oriented out-degree, wedge mass
    considered vs dropped (exact integers, C(d,2) = d*(d-1) div 2 on
    both engines), the triangle lower bound, and the exactness flag.
    On the DENSE fixture graph the cap binds (max outdeg 99 at
    sf0.01) — deliberately: the op demonstrates bounded cost exactly
    where the uncapped op degenerates, and the pytest pins equality
    to the exact count on a synthetic graph where the cap does not
    bind plus the wedge-accounting identity here.

    Parity: everything is exact integer arithmetic; composite-key
    orientation compares (deg, id) tuples — struct(du, u) < struct
    (dv, v) in Spark, row tuples in DuckDB (the round-10 Markov-path
    rule).

    Shape at 100 TB: the per-pivot rank is a PARTITIONED window over
    the oriented edge list (bounded fan-in per pivot); the wedge join
    touches <= 32 out-edges per pivot; the closure probe is one
    LeftSemi equi-join.  This is the plan you run FIRST on an unknown
    100 TB co-occurrence graph: the audit columns tell you whether
    the exact sibling is affordable (wedges_dropped = 0) before you
    pay for it."""
    er = _oriented_cosupply_edges(spark, sf_dir)
    w_rk = Window.partitionBy("s").orderBy("dt", "t")
    ranked = er.withColumn("rk", F.row_number().over(w_rk))
    odeg = ranked.groupBy("s").agg(F.max("rk").alias("outdeg"))
    cap = _WEDGE_CAP
    capstats = odeg.agg(
        F.count("*").cast("bigint").alias("pivots"),
        F.expr(
            f"CAST(coalesce(sum(CASE WHEN outdeg > {cap} THEN 1 ELSE 0 "
            f"END), 0) AS BIGINT)"
        ).alias("capped_pivots"),
        F.expr("CAST(coalesce(max(outdeg), 0) AS BIGINT)").alias(
            "max_outdeg"
        ),
        F.expr(
            f"CAST(coalesce(sum(least(outdeg, {cap}) * (least(outdeg, "
            f"{cap}) - 1) div 2), 0) AS BIGINT)"
        ).alias("wedges_considered"),
        F.expr(
            f"CAST(coalesce(sum(outdeg * (outdeg - 1) div 2 - "
            f"least(outdeg, {cap}) * (least(outdeg, {cap}) - 1) div 2), "
            f"0) AS BIGINT)"
        ).alias("wedges_dropped"),
    )
    capped = ranked.where(F.col("rk") <= cap).select("s", "t", "dt")
    x = capped.select("s", F.col("t").alias("t1"), F.col("dt").alias("dt1"))
    y = capped.select("s", F.col("t").alias("t2"), F.col("dt").alias("dt2"))
    wedges = (
        x.join(y, "s")
        .where(
            F.struct(F.col("dt1"), F.col("t1"))
            < F.struct(F.col("dt2"), F.col("t2"))
        )
        .select("s", "t1", "t2")
    )
    tri = wedges.join(
        er.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
        "left_semi",
    )
    tl = tri.agg(F.count("*").cast("bigint").alias("triangles_lb"))
    nn = (
        er.select(F.col("s").alias("n"))
        .unionAll(er.select(F.col("t").alias("n")))
        .distinct()
        .agg(F.count("*").cast("bigint").alias("nodes"))
    )
    ee = er.agg(F.count("*").cast("bigint").alias("edges"))
    return (
        nn.crossJoin(F.broadcast(ee))
        .crossJoin(F.broadcast(capstats))
        .crossJoin(F.broadcast(tl))
        .selectExpr(
            "nodes",
            "edges",
            "pivots",
            "capped_pivots",
            "max_outdeg",
            "wedges_considered",
            "wedges_dropped",
            "triangles_lb",
            "CAST(CASE WHEN capped_pivots = 0 THEN 1 ELSE 0 END "
            "AS BIGINT) AS exact_flag",
        )
    )


# ---------------------------------------------------------------------------
# graph_clustering_coefficient_capped — bounded-cost CC (round-14 pull)
# ---------------------------------------------------------------------------


@query(
    "graph_clustering_coefficient_capped",
    oracle=f"""
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 3),
    deg AS MATERIALIZED (
      SELECT n, count(*) AS d FROM (
        SELECT u AS n FROM e UNION ALL SELECT v FROM e) z
      GROUP BY n),
    er AS MATERIALIZED (
      SELECT CASE WHEN (du, u) < (dv, v) THEN u ELSE v END AS s,
             CASE WHEN (du, u) < (dv, v) THEN v ELSE u END AS t,
             CASE WHEN (du, u) < (dv, v) THEN dv ELSE du END AS dt
      FROM e JOIN deg a ON e.u = a.n JOIN deg b ON e.v = b.n,
           LATERAL (SELECT a.d AS du, b.d AS dv) x),
    capped AS MATERIALIZED (
      SELECT s, t, dt FROM (
        SELECT s, t, dt,
               row_number() OVER (PARTITION BY s ORDER BY dt, t) AS rk
        FROM er) z
      WHERE rk <= {_WEDGE_CAP}),
    tri AS (
      SELECT x.s AS a, x.t AS b, y.t AS c
      FROM capped x JOIN capped y ON x.s = y.s
      WHERE (x.dt, x.t) < (y.dt, y.t)
        AND EXISTS (SELECT 1 FROM er e3
                    WHERE e3.s = x.t AND e3.t = y.t)),
    pn AS (
      SELECT n.node, CAST(count(*) AS BIGINT) AS tri_lb
      FROM tri, unnest([a, b, c]) AS n(node)
      GROUP BY n.node)
    SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
           coalesce(pn.tri_lb, 0) AS tri_lb,
           CAST(deg.d * (deg.d - 1) // 2 AS BIGINT) AS possible,
           round(CAST(coalesce(pn.tri_lb, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1) // 2), 6) AS cc_lb
    FROM deg LEFT JOIN pn ON deg.n = pn.node
    WHERE deg.d >= 2
    ORDER BY tri_lb DESC, node
    LIMIT 20
    """,
)
def graph_clustering_coefficient_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOUNDED-COST local clustering coefficient — the wedge-cap
    recipe (graph_triangle_wedge_cap, round 13) applied to the other
    super-linear surface VERDICT r12 flagged
    (graph_clustering_coefficient, sf1x ratio 0.91-1.12 across
    rounds): per-node triangle counts come from the CAPPED wedge
    listing (32 smallest-(deg, id) out-edges per pivot; closure probe
    against the full oriented edge list), so every counted triangle
    is real and tri_lb / C(degree, 2) is an exact LOWER BOUND on the
    local clustering coefficient, at wedge cost bounded by
    C(32, 2) * n regardless of skew.  The denominator C(degree, 2)
    uses the EXACT degree — only the numerator is bounded, so cc_lb
    never exceeds the true coefficient.  Top-20 nodes by bounded
    triangle count, degree-2+ only (C(d, 2) = 0 otherwise).

    On the dense fixture graph the cap binds (graph_triangle_
    wedge_cap's audit row reports where); the sf0.001 graph is
    uncapped and this op's counts there equal the exact sibling's —
    pinned by pytest.

    Parity: exact integers everywhere; one round(6) ratio with the
    shared shape; ties break on node id.

    Shape at 100 TB: reuses the session-cached oriented-edge
    checkpoint; capped wedge join + one LeftSemi probe + a 3-way
    explode groupBy; top-20 plans as TakeOrderedAndProject."""
    er = _oriented_cosupply_edges(spark, sf_dir)
    w_rk = Window.partitionBy("s").orderBy("dt", "t")
    capped = (
        er.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") <= _WEDGE_CAP)
        .select("s", "t", "dt")
    )
    x = capped.select("s", F.col("t").alias("t1"), F.col("dt").alias("dt1"))
    y = capped.select("s", F.col("t").alias("t2"), F.col("dt").alias("dt2"))
    wedges = (
        x.join(y, "s")
        .where(
            F.struct(F.col("dt1"), F.col("t1"))
            < F.struct(F.col("dt2"), F.col("t2"))
        )
        .select("s", "t1", "t2")
    )
    tri = wedges.join(
        er.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
        "left_semi",
    )
    pn = (
        tri.select(F.explode(F.array("s", "t1", "t2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("tri_lb"))
    )
    deg = (
        er.select(F.col("s").alias("n"))
        .unionAll(er.select(F.col("t").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(pn, deg.n == pn.node, "left")
        .selectExpr(
            "n AS node",
            "CAST(d AS BIGINT) AS degree",
            "CAST(coalesce(tri_lb, 0) AS BIGINT) AS tri_lb",
            "CAST(d * (d - 1) div 2 AS BIGINT) AS possible",
            "round(CAST(coalesce(tri_lb, 0) AS DOUBLE)"
            " / (d * (d - 1) div 2), 6) AS cc_lb",
        )
        .orderBy(F.col("tri_lb").desc(), "node")
        .limit(20)
    )

"""Invariant + plan tests for the round-6 analytics operators
(operators/analytics.py). Brute-force pandas twins pin the windowed
math (TWAP / EWMA / MAD) against an independent implementation; plan
pins enforce the global-top-k rule (TakeOrderedAndProject, never a
world-sorting window) for the new ranking ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vectordb_agentic_rag_spark import QUERIES, load_all_operators

load_all_operators()

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF}/events.parquet")


# ---------------------------------------------------------------- brute force


def test_twap_matches_bruteforce(spark, events_pdf):
    got = (
        QUERIES["win_time_weighted_avg"](spark, SF)
        .toPandas()
        .set_index(["user_id", "day"])
        .sort_index()
    )
    ev = events_pdf.copy()
    ev["day"] = ev["ts"].dt.date
    exp = {}
    for (u, d), g in ev.sort_values(["ts", "event_id"]).groupby(
        ["user_id", "day"]
    ):
        us = g["ts"].astype("int64")  # micros
        # the op truncates each PAIRWISE gap to ms — mirror that order
        gaps = (us.diff().shift(-1).dropna().astype("int64")) // 1000
        if len(gaps) == 0:
            continue  # single-event day: no interval rows
        vals = g["value"].iloc[:-1]
        exp[(u, d)] = (
            round(float((vals.values * gaps.values).sum() / gaps.sum()), 6)
            if gaps.sum() > 0
            else None
        )
    assert set(got.index) == set(exp)
    for k, v in exp.items():
        g = got.loc[k, "twap"]
        if v is None:
            assert pd.isna(g)
        else:
            assert abs(g - v) < 1e-9, (k, g, v)


def test_ewma_matches_bruteforce(spark, events_pdf):
    got = (
        QUERIES["win_ewma_smooth"](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    a = 0.25
    for u, g in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        acc = None
        for v in g["value"]:
            acc = v if acc is None else acc * (1 - a) + v * a
        assert abs(got.loc[u, "ewma"] - round(acc, 6)) < 1e-9
        assert got.loc[u, "n_events"] == len(g)


def test_mad_matches_bruteforce(spark, events_pdf):
    got = (
        QUERIES["win_mad_outlier"](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    for u, g in events_pdf.groupby("user_id"):
        med = float(np.median(g["value"]))  # avg-of-two-middles, same rule
        dev = np.abs(g["value"].values - med)
        mad = float(np.median(dev))
        assert abs(got.loc[u, "med"] - round(med, 6)) < 1e-9
        assert abs(got.loc[u, "mad"] - round(mad, 6)) < 1e-9
        assert got.loc[u, "n_outliers"] == int((dev > 3 * mad).sum())


# ------------------------------------------------------------------ invariants


def test_eval_metrics_bounded_and_consistent(spark):
    pdf = QUERIES["rag_eval_recall_mrr"](spark, SF).toPandas()
    assert len(pdf) == 10  # every query keeps a row
    assert ((pdf["n_hits"] >= 0) & (pdf["n_hits"] <= 10)).all()
    assert np.allclose(pdf["recall_at_10"], (pdf["n_hits"] / 10).round(6))
    assert ((pdf["mrr"] >= 0) & (pdf["mrr"] <= 1)).all()
    # a true hit at rank r implies mrr >= 1/10 when any hit exists
    assert (pdf.loc[pdf["n_hits"] > 0, "mrr"] >= 1 / 10 - 1e-9).all()


def test_kmeans_partitions_the_corpus(spark):
    pdf = QUERIES["vec_kmeans_lloyd"](spark, SF).toPandas()
    n_corpus = pd.read_parquet(f"{SF}/embeddings.parquet").shape[0]
    assert pdf["n_points"].sum() == n_corpus  # every point assigned once
    assert set(pdf["cluster_id"]) <= {0, 1, 2, 3}
    assert (pdf["inertia"] >= 0).all()
    # deterministic: a second build returns the identical result
    pdf2 = QUERIES["vec_kmeans_lloyd"](spark, SF).toPandas()
    pd.testing.assert_frame_equal(
        pdf.sort_values("cluster_id").reset_index(drop=True),
        pdf2.sort_values("cluster_id").reset_index(drop=True),
    )


def test_pca_unit_vector_and_bounds(spark):
    row = QUERIES["vec_pca_power_iter"](spark, SF).toPandas().iloc[0]
    v = np.array([row[f"v{i}"] for i in range(1, 9)])
    assert abs(np.linalg.norm(v) - 1) < 1e-4  # round(6) per component
    assert row["v1"] >= 0  # sign canonicalized
    assert row["lambda1"] > 0
    assert 0 < row["explained_ratio"] <= 1
    # Rayleigh quotient of the dominant eigenvector is the max -> must
    # be at least the average eigenvalue (trace/d)
    assert row["explained_ratio"] >= 1 / 8 - 1e-6


def test_train_val_split_is_exhaustive_and_leak_symmetric(spark):
    pdf = QUERIES["pipeline_train_val_split"](spark, SF).toPandas()
    n_docs = pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    assert set(pdf["split"]) == {"train", "val"}
    assert pdf["n_docs"].sum() == n_docs
    # a leaked bucket is by definition present in BOTH splits
    leaks = pdf.set_index("split")["leaked_buckets"]
    assert leaks["train"] == leaks["val"]
    assert (pdf["leaked_buckets"] <= pdf["n_buckets"]).all()


def test_zipf_slope_negative(spark):
    pdf = QUERIES["text_zipf_slope"](spark, SF).toPandas()
    # frequency decreases with rank by construction of the ranking
    assert (pdf["zipf_slope"] < 0).all()
    assert (pdf["n_terms"] <= 1000).all()


def test_copurchase_pairs_canonical(spark):
    pdf = QUERIES["agg_copurchase_pairs"](spark, SF).toPandas()
    assert (pdf["part_a"] < pdf["part_b"]).all()
    assert (pdf["support"] >= 2).all()


# ------------------------------------------------------------------- plan pins


def test_pmi_topk_is_take_ordered_with_broadcasts(spark):
    plan = plan_of(QUERIES["text_pmi_collocations"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # both unigram joins


def test_copurchase_topk_is_take_ordered(spark):
    plan = plan_of(QUERIES["agg_copurchase_pairs"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_fusion_topk_is_take_ordered_no_global_window(spark):
    plan = plan_of(QUERIES["rag_hybrid_weighted_fusion"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    # min-max bounds come from an aggregate broadcast, not a window
    # sorting the world on one partition
    assert "Window" not in plan


def test_kmeans_no_shuffled_join(spark):
    plan = plan_of(QUERIES["vec_kmeans_lloyd"](spark, SF))
    # centroids ride broadcasts every iteration; the corpus is never
    # the build side of a shuffled join
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_mad_single_shuffle_key(spark):
    plan = plan_of(QUERIES["win_mad_outlier"](spark, SF))
    # every window/agg/join rides user_id hash partitioning
    assert "hashpartitioning(user_id" in plan
    assert "Exchange rangepartitioning" not in plan


# ------------------------------------------------------------- batch-4 ops


def test_holt_matches_bruteforce(spark, events_pdf):
    got = (
        QUERIES["win_holt_linear"](spark, SF)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    a, g_ = 0.5, 0.25
    for u, g in events_pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        vals = list(g["value"])
        if len(vals) < 2:
            assert u not in got.index
            continue
        level, trend = vals[1], vals[1] - vals[0]
        for x in vals[2:]:
            nl = a * x + (1 - a) * (level + trend)
            trend = g_ * (nl - level) + (1 - g_) * trend
            level = nl
        assert abs(got.loc[u, "level"] - round(level, 6)) < 1e-9
        assert abs(got.loc[u, "trend"] - round(trend, 6)) < 1e-9
        assert abs(got.loc[u, "forecast_1"] - round(level + trend, 6)) < 1e-9


def test_markov_rows_are_distributions(spark):
    pdf = QUERIES["agg_markov_transition"](spark, SF).toPandas()
    assert (pdf["n_trans"] > 0).all()
    # each prev_type's outgoing probabilities sum to ~1 (round(6) each)
    sums = pdf.groupby("prev_type")["p"].sum()
    assert ((sums - 1).abs() < 1e-4).all()


def test_tfidf_terms_ranked_per_doc(spark):
    pdf = QUERIES["text_top_tfidf_terms"](spark, SF).toPandas()
    assert (pdf["score"] >= 0).all()  # idf = ln(N/df) >= 0
    for _, g in pdf.groupby("doc_id"):
        assert sorted(g["rn"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        # scores non-increasing down the ranks
        assert (g.sort_values("rn")["score"].diff().dropna() <= 1e-9).all()


def test_mixture_reweight_budget_math(spark):
    pdf = QUERIES["pipeline_mixture_reweight"](spark, SF).toPandas()
    assert abs(pdf["current_frac"].sum() - 1) < 1e-4
    assert abs(pdf["target_frac"].sum() - 1) < 1e-4
    assert (pdf["weight"] <= 3.0 + 1e-9).all()
    assert (pdf["weight"] > 0).all()
    assert (pdf["effective_tokens"] <= (3 * pdf["tokens"])).all()


# ------------------------------------------------------------- batch-5 ops


def test_url_suite_canonicalization_rules(spark):
    pdf = QUERIES["scalar_url_suite"](spark, SF).toPandas()
    assert len(pdf) == 100
    assert (~pdf["canonical"].str.contains("utm_", regex=False)).all()
    assert (~pdf["canonical"].str.contains("ref=", regex=False)).all()
    assert (pdf["host"] == pdf["host"].str.lower()).all()
    assert (pdf["tld"] == "com").all()
    # q params survive canonicalization
    has_q = pdf["q_param"] != ""
    assert pdf.loc[has_q, "canonical"].str.contains(r"\?q=").all()


def test_url_canonical_dedup_groups(spark):
    pdf = QUERIES["dedup_url_canonical"](spark, SF).toPandas()
    assert (pdf["n_docs"] >= 2).all()
    assert len(pdf) <= 50
    assert pdf["canonical"].is_unique


def test_gini_bounded(spark):
    pdf = QUERIES["agg_gini_concentration"](spark, SF).toPandas()
    ok = pdf["gini"].dropna()
    assert ((ok >= 0) & (ok < 1)).all()
    assert (pdf["n_customers"] > 0).all()


def test_kl_divergence_nonnegative(spark):
    pdf = QUERIES["text_kl_drift"](spark, SF).toPandas()
    # Gibbs' inequality: KL >= 0 (round(6) slack)
    assert (pdf["kl_divergence"] >= -1e-6).all()
    assert (pdf["n_terms_present"] > 0).all()


# ------------------------------------------------------------- batch-6 ops


def test_bloom_prefilter_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from vectordb_agentic_rag_spark.functions.money import cents
    from vectordb_agentic_rag_spark.tables import table as tbl

    got = (
        QUERIES["join_bloom_prefilter"](spark, SF)
        .toPandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    li = tbl(spark, SF, "lineitem")
    sup = tbl(spark, SF, "supplier").where(F.col("s_nationkey") < 5)
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(
                    cents("l_extendedprice") * (100 - cents("l_discount"))
                ).cast("double")
                / 10000,
                2,
            ).alias("revenue"),
        )
        .toPandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, plain)


def test_bloom_probe_precedes_the_join(spark):
    plan = plan_of(QUERIES["join_bloom_prefilter"](spark, SF))
    # the bitmap probe (bit math over the broadcast words array) must
    # appear as a Filter, and the exact join still runs after it
    assert "element_at" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lang_confusion_rows_normalize(spark):
    pdf = QUERIES["text_lang_confusion"](spark, SF).toPandas()
    sums = pdf.groupby("lang")["share"].sum()
    assert ((sums - 1).abs() < 1e-4).all()
    n_docs = pd.read_parquet(f"{SF}/documents.parquet").shape[0]
    assert pdf["n_docs"].sum() == n_docs

"""Accuracy bound for the no-oracle sketch operator (SURVEY §5 rule:
rows-only ops get targeted assertions instead of a DuckDB twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_agentic_rag_spark import QUERIES, load_all_operators
from vectordb_agentic_rag_spark.tables import table

load_all_operators()


def test_hll_estimates_within_tolerance(spark, sf_dir):
    out = {
        (r["day"]): r["est_users"]
        for r in QUERIES["agg_hll_sketch_merge"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact_total = ev.select(F.countDistinct("user_id")).first()[0]
    exact_daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # lgConfigK=14 -> relative standard error ~0.8%; allow 5%
    assert abs(out[None] - exact_total) / exact_total < 0.05
    for day, exact in exact_daily.items():
        assert abs(out[day] - exact) / exact < 0.05, day
    # union estimate must not be below any single day's estimate
    assert out[None] >= max(v for k, v in out.items() if k is not None) * 0.99

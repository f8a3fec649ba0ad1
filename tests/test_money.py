"""functions.money: the +0.5-cast fast path must agree with round()
everywhere it is used (non-negative 2-decimal money doubles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_agentic_rag_spark.functions.money import cents


def test_cents_equals_round_on_two_decimal_grid(spark):
    """Exhaustive over the first 40k cent values plus large-magnitude
    and representation-noise cases: cents(x) == round(x*100) for every
    value shape the fixtures contain."""
    vals = [k / 100 for k in range(0, 40_000)]
    vals += [k / 100 for k in range(99_990_000, 99_999_999, 7)]  # ~1M dollars
    vals += [0.07, 0.29, 123456.78, 0.01 * 3, 1e9 + 0.55]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    bad = (
        df.select(
            "x",
            cents("x").alias("fast"),
            F.round(F.col("x") * 100).cast("bigint").alias("slow"),
        )
        .where(F.col("fast") != F.col("slow"))
        .collect()
    )
    assert bad == [], f"fast/slow cents disagree on {bad[:5]}"


def test_cents_is_exact_on_fixture_money(spark, sf_dir):
    """Fixture money columns really are 2-decimal: cents() round-trips
    every l_extendedprice and o_totalprice value exactly."""
    from vectordb_agentic_rag_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    bad = (
        li.select(
            (F.abs(cents("l_extendedprice").cast("double") / 100 - F.col("l_extendedprice")) > 1e-9).alias("off")
        )
        .where("off")
        .count()
    )
    assert bad == 0

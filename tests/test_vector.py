"""Unit tests for vector functions and operators (SURVEY.md §5.4)."""

import math

import pytest
from pyspark.sql import functions as F

from vectordb_agentic_rag_spark.functions.vector import cosine, dot, l2_distance, norm


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(
        [
            ([1.0, 2.0], [3.0, 4.0]),
            ([1.0, 0.0], [0.0, 1.0]),
            ([2.0, 0.0], [4.0, 0.0]),
        ],
        "a array<double>, b array<double>",
    )


def test_dot(pairs):
    got = [r[0] for r in pairs.select(dot(F.col("a"), F.col("b"))).collect()]
    assert got == [11.0, 0.0, 8.0]


def test_norm(pairs):
    got = [r[0] for r in pairs.select(norm(F.col("a"))).collect()]
    assert got == pytest.approx([math.sqrt(5), 1.0, 2.0])


def test_cosine_bounds_and_known(pairs):
    got = [r[0] for r in pairs.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert got[1] == pytest.approx(0.0)  # orthogonal
    assert got[2] == pytest.approx(1.0)  # parallel
    assert all(-1.0 - 1e-9 <= g <= 1.0 + 1e-9 for g in got)


def test_l2_distance(pairs):
    got = [r[0] for r in pairs.select(l2_distance(F.col("a"), F.col("b"))).collect()]
    assert got == pytest.approx([math.sqrt(8), math.sqrt(2), 2.0])


def test_topk_subset_of_full_sort(spark, sf_dir):
    """Property: top-k == head of the full sort (SURVEY §5.6)."""
    from vectordb_agentic_rag_spark.operators.vector import vec_cosine_topk
    from vectordb_agentic_rag_spark.functions.vector import cosine
    from vectordb_agentic_rag_spark.tables import table

    topk = {r.vec_id for r in vec_cosine_topk(spark, sf_dir).collect()}
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    full = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .collect()
    )
    assert topk == {r.vec_id for r in full[:5]}


def test_similarity_join_symmetric_threshold(spark, sf_dir):
    from vectordb_agentic_rag_spark.operators.vector import join_similarity_theta

    rows = join_similarity_theta(spark, sf_dir).collect()
    assert all(r.vec_id_a < r.vec_id_b for r in rows)
    assert all(r.sim >= 0.4 for r in rows)


def test_entry_smoke(spark):
    import importlib
    import __spark_entry__ as e

    importlib.reload(e)
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert set(df.columns) == {"vec_id", "sim", "preview"}

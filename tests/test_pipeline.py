"""End-to-end RagPipeline lifecycle tests (SURVEY.md §3): ingest ->
retrieve/route -> clear on the sf0.001 documents fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_agentic_rag_spark.plans import RagPipeline
from vectordb_agentic_rag_spark.tables import table


@pytest.fixture(scope="module")
def pipe(spark, sf_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("rag") / "index")
    p = RagPipeline(spark, index_dir, dim=64)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = p.ingest(docs)
    assert stats.n_docs > 0 and stats.n_chunks >= stats.n_docs
    yield p
    p.clear()


def _queries(spark):
    return spark.createDataFrame(
        [
            (0, "spark table merge window batch"),
            (1, "latest news about streaming data"),
            (2, "zqx vwy unmatchable gibberish"),
        ],
        "query_id long, query_text string",
    )


def test_ingest_layout(pipe, spark):
    chunks = spark.read.parquet(f"{pipe.index_dir}/chunks")
    assert set(chunks.columns) == {
        "chunk_id", "doc_id", "chunk_no", "page_content", "embedding"
    }
    # every embedding has the configured dimension
    assert chunks.where(F.size("embedding") != pipe.dim).count() == 0
    idf = spark.read.parquet(f"{pipe.index_dir}/idf").collect()
    assert len(idf) == 1 and len(idf[0].idf) == pipe.dim


def test_retrieve_topk_shape(pipe, spark):
    out = pipe.retrieve(_queries(spark)).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) <= 5
        ranks = sorted(r.mmr_rank for r in rows)
        assert ranks == list(range(len(rows)))


def test_retrieve_without_mmr_matches_pure_topk(pipe, spark):
    plain = pipe.retrieve(_queries(spark), mmr=False)
    assert "mmr_rank" not in plain.columns
    counts = plain.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in counts)


def test_mmr_first_pick_is_top_similarity(pipe, spark):
    """MMR's first selection is always the highest-similarity candidate
    (no diversity penalty yet) — invariant of the greedy algorithm."""
    q = _queries(spark)
    mmr0 = (
        pipe.retrieve(q)
        .where(F.col("mmr_rank") == 0)
        .select("query_id", "chunk_id")
        .collect()
    )
    top1 = (
        pipe.retrieve(q, mmr=False, k=1).select("query_id", "chunk_id").collect()
    )
    assert {(r.query_id, r.chunk_id) for r in mmr0} == {
        (r.query_id, r.chunk_id) for r in top1
    }


def test_route_four_way(pipe, spark):
    q = _queries(spark)
    out = pipe.query(q)
    rows = {r.query_id: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1].plan_type in ("web_search", "hybrid_search")  # freshness words
    for r in rows.values():
        assert r.plan_type in (
            "document_rag", "web_search", "hybrid_search", "direct_answer"
        )
        if r.plan_type in ("document_rag", "hybrid_search"):
            assert r.sources and len(r.sources) <= 3
            assert all(len(s) <= 300 for s in r.sources)  # app.py:544 [:300]


def test_reingest_overwrites(pipe, spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(5)
    stats = pipe.ingest(docs)
    assert stats.n_docs == 5
    chunks = spark.read.parquet(f"{pipe.index_dir}/chunks")
    assert chunks.select("doc_id").distinct().count() == 5


def test_clear_removes_index(spark, sf_dir, tmp_path):
    p = RagPipeline(spark, str(tmp_path / "idx"), dim=32)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(3)
    p.ingest(docs)
    p.clear()
    with pytest.raises(Exception):
        spark.read.parquet(f"{p.index_dir}/chunks").count()

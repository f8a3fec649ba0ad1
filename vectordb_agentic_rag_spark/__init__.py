"""vectordb_agentic_rag_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Bharath8080/VectorDB-Agentic-RAG.

The reference (/root/reference/app.py, 587 lines) is a Streamlit agentic-RAG
pipeline: document ingest -> chunk -> embed -> vector search (MMR top-k) ->
routed query plans. This package re-expresses those capabilities Spark-first:

- declarative DataFrame/SQL plans (Catalyst handles pushdown/pruning/joins),
- batch vector similarity (exact top-k, LSH/IVF approximate paths),
- LLM-data-pipeline operators: dedup (exact/minhash/simhash/embedding),
  text analysis (lang-id, quality, tokens, fingerprints), multimodal columns,
- Structured Streaming for the event/conversation stream surface.

Everything is designed for a multi-executor cluster at ~100 TB: broadcast
small dimensions, partial aggregation, no driver-side collect() in any
operator, LSH banding instead of O(n^2) similarity joins at scale.
"""

__version__ = "0.1.0"

from .registry import QUERIES, ORACLES, load_all_operators  # noqa: F401

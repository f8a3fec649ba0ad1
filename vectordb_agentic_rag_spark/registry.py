"""Declared-operator registry — the contract surface for __spark_entry__.py.

Every operator from SURVEY.md §2 registers itself here with a PySpark
callable and (where SQL-expressible) a DuckDB oracle twin. Keeping the
pair adjacent in source is the main defense against column-name /
rounding drift between the two sides (FIXTURES.md "Oracle parity rules").
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_OPERATOR_MODULES = [
    "vectordb_agentic_rag_spark.operators.relational",
    "vectordb_agentic_rag_spark.operators.tpch",
    "vectordb_agentic_rag_spark.operators.scale",
    "vectordb_agentic_rag_spark.operators.windows",
    "vectordb_agentic_rag_spark.operators.scalars",
    "vectordb_agentic_rag_spark.operators.vector",
    "vectordb_agentic_rag_spark.operators.text",
    "vectordb_agentic_rag_spark.operators.rag",
    "vectordb_agentic_rag_spark.operators.dedup",
    "vectordb_agentic_rag_spark.operators.ml",
    "vectordb_agentic_rag_spark.operators.multimodal",
    "vectordb_agentic_rag_spark.operators.streaming_batch",
    "vectordb_agentic_rag_spark.streaming.core",
    "vectordb_agentic_rag_spark.sources.readers",
]


def query(name: str, oracle: str | None = None):
    """Register a declared operator. ``oracle`` is the DuckDB SQL twin;
    omit it only for genuinely non-SQL-expressible ops (driver then runs
    a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so decorators run (idempotent)."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # module not written yet during incremental build-out
            pass

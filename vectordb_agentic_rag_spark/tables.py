"""Fixture-table access (TESTDATA.md / FIXTURES.md).

Ten driver-generated parquet tables per scale factor. Reading via
``spark.read.parquet`` keeps Catalyst in charge: column pruning and
predicate pushdown reach the parquet scan (verify with
``df.explain("formatted")`` — look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def sf_tag(sf_dir: str) -> str:
    """Scale-factor tag (e.g. ``sf0.01``) for keying scratch artifacts.

    Any materialized path or table name derived from a fixture dir MUST
    embed this tag: a fixed path + per-(session, sf) memo set silently
    serves stale data when the same session touches sf A, then B, then
    A again (the memo skips the rewrite while the file holds B's data).
    """
    return sf_dir.rstrip("/").rsplit("/", 1)[-1]


# memoized logical plans: DataFrames are immutable, so handing the same
# scan plan to every query is safe and skips repeated parquet-footer
# schema reads (a py4j + filesystem roundtrip per call). Catalyst still
# prunes columns/filters per query — this caches the *plan root*, not data.
_scan_cache: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (memoized per session)."""
    key = (id(spark), sf_dir, name)
    cached = _scan_cache.get(key)
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    _scan_cache[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
        # outright (PARQUET_TYPE_ILLEGAL). Read nanos as int64 and floor
        # to microseconds — the same truncation DuckDB applies, so the
        # oracle sees identical values (FIXTURES.md: "Spark reads as µs").
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixtures carry naive/UTC wall-clock timestamps; pin the session
        # tz so LTZ collection/arithmetic is value-preserving even under
        # the driver's own SparkSession
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # MICROS-generation fixtures: read straight into TimestampType
        # (LTZ) at the scan — no per-row NTZ->LTZ projection cast
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # fixture generations differ: TIMESTAMP(NANOS) parquet arrives as
        # int64 under nanosAsLong, TIMESTAMP(MICROS) as timestamp — check
        # the dtype, don't assume. Normalize to TimestampType (LTZ) so
        # unix_micros()/window() callers work.
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # defensive: a reader that bypassed the conf above
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql() queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


_hot_cached: set[tuple[int, str]] = set()


def cache_hot_tables(spark: SparkSession, sf_dir: str, names=None) -> None:
    """Pin fixture tables into Spark's in-memory columnar cache.

    The engine's buffer-pool analogue: DuckDB's warm runs re-read parquet
    through the OS page cache; Spark's InMemoryRelation additionally skips
    the per-query parquet decode, which is the steady-state a resident
    analytics service runs at. Scale note: at 100 TB you cache the *hot
    working set* (dims, current partitions), not the fact table — callers
    pass ``names`` accordingly; storage level MEMORY_AND_DISK spills
    instead of OOMing when the set is mis-sized.
    """
    key = (id(spark), sf_dir)
    if key in _hot_cached:
        return
    import math

    import pyarrow.parquet as pq

    for name in names or TABLES:
        df = table(spark, sf_dir, name)
        # Right-size the cached relation: the parquet scan is planned at
        # leaf-node default parallelism (32 slices here) even for a 1 MB
        # file, and an InMemoryRelation keeps its builder's partitioning
        # — so every later query would schedule 32 near-empty tasks.
        #
        # Partition count tracks COMPUTE, not compressed bytes (the old
        # bytes/2MB rule put 100k events rows in ONE partition and made
        # every window sort single-threaded — measured 0.12 s vs 0.07 s
        # for the headline window query). Cost model: one array element
        # costs about one plain row (higher-order functions are
        # interpreted, not codegen'd), long text a few rows — so the
        # embeddings/documents tables get proportionally more slices.
        # Grid-measured at sf0.1: rows/2000 with these weights is the
        # flat-bottom optimum; at cluster scale the same rule lands at
        # the usual 10-50M weighted rows per 128 MB-ish partition.
        # Layout-agnostic row count: fixture tables are single files,
        # but Spark-written datasets are directories of part files.
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            rows = sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            rows = pq.ParquetFile(path).metadata.num_rows
        weight = {"embeddings": 8, "documents": 2}.get(name, 1)
        k = max(1, min(16, math.ceil(rows * weight / 2000)))
        # repartition (round-robin), not coalesce: even slices matter
        # more than the one-time shuffle when the relation is reused by
        # every subsequent query
        cached = (df.coalesce(1) if k == 1 else df.repartition(k)).cache()
        cached.count()
        _scan_cache[(id(spark), sf_dir, name)] = cached
    _hot_cached.add(key)


# non-operator modules that hold _*_CACHE session caches (operator
# modules are enumerated from the registry lists)
_EXTRA_CACHE_MODULES = [
    "vectordb_agentic_rag_spark.functions.domain",
]


def clear_session_caches() -> None:
    """Evict every module-level session cache (checkpointed artifact
    frames keyed by (applicationId, sf_dir) plus the scan memo).

    The caches deliberately have no TTL — the bench/driver lifecycle
    is one session over one or two sf dirs — but a long-lived session
    sweeping many sf dirs retains every localCheckpoint RDD it ever
    built (ADVICE r10).  Call this between sweeps to release them.

    Caches are discovered by convention, not by a hand-maintained
    list: every module-level dict named ``_*_CACHE`` in an operator
    module is a session cache (the r14 verdict found five caches the
    old explicit list had missed).  Only modules already imported are
    swept — loading one here would run its @query registrations as a
    side effect.
    """
    import re
    import sys

    from .registry import _DEFERRED_OPERATOR_MODULES, _OPERATOR_MODULES

    _scan_cache.clear()
    _hot_cached.clear()
    pat = re.compile(r"_[A-Z0-9_]*_CACHE\Z")
    for mod_name in (
        list(_OPERATOR_MODULES)
        + list(_DEFERRED_OPERATOR_MODULES)
        + list(_EXTRA_CACHE_MODULES)
    ):
        mod = sys.modules.get(mod_name)
        if mod is None:
            continue
        for attr, val in vars(mod).items():
            if pat.fullmatch(attr) and isinstance(val, dict):
                val.clear()

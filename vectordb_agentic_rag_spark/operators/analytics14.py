"""Round-14 operators: data-layout advisories and remaining verdict
queue items.

The reference app (app.py) has no storage layer of its own (Qdrant
holds the vectors); these ops serve the north-star 100 TB lake the
engine is designed for, where the difference between a clustered and
a scattered layout is the difference between scanning 3% and 100% of
row groups for the same predicate.

Float-parity discipline (CLAUDE.md): exact BIGINT logic throughout —
bucket assignment, predicate bounds, and the prune decision are all
integer compares, so no rounding argument is needed anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import sf_tag, table

# ---------------------------------------------------------------------------
# maintenance_rowgroup_pruning_sim
# ---------------------------------------------------------------------------

_PRUNE_BUCKETS = 16  # target bucket count for both layouts
_PRUNE_PREDS = 8  # predicate panel size

# layouts written once per (session, sf_dir)
_pruning_written: set[tuple[int, str]] = set()


def _pruning_oracle() -> str:
    """Oracle recomputes every bucket's min/max/count FROM DATA with the
    same integer bucket formulas, then applies the identical intersect
    logic — a hash match proves the Spark side's REAL footer statistics
    equal the data extrema per bucket AND that the prune decisions
    agree."""
    return f"""
    WITH b AS (
      SELECT CAST(min(o_orderkey) AS BIGINT) AS mn,
             CAST(max(o_orderkey) AS BIGINT) AS mx
      FROM orders),
    p AS (
      SELECT CAST(i AS BIGINT) AS pred_id,
             CAST(mn + (i * (mx - mn + 1)) // {_PRUNE_PREDS} AS BIGINT) AS lo,
             CAST(mn + (i * (mx - mn + 1)) // {_PRUNE_PREDS}
                  + (mx - mn + 1) // 32 AS BIGINT) AS hi
      FROM b, (SELECT unnest(generate_series(0, {_PRUNE_PREDS - 1})) AS i)),
    assigned AS (
      SELECT 'clustered' AS layout,
             (o_orderkey - mn) // ((mx - mn + 1) // {_PRUNE_BUCKETS} + 1) AS grp,
             o_orderkey AS k
      FROM orders, b
      UNION ALL
      SELECT 'scattered' AS layout,
             ((o_orderkey * 2654435761) % 4294967296) // 268435456 AS grp,
             o_orderkey AS k
      FROM orders),
    buckets AS (
      SELECT layout, grp,
             CAST(min(k) AS BIGINT) AS fmin,
             CAST(max(k) AS BIGINT) AS fmax,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM assigned GROUP BY layout, grp)
    SELECT layout, pred_id, lo, hi,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN fmax < lo OR fmin > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS buckets_pruned,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN fmax < lo OR fmin > hi THEN n_rows ELSE 0 END)
                AS BIGINT) AS rows_skipped
    FROM buckets CROSS JOIN p
    GROUP BY layout, pred_id, lo, hi
    ORDER BY layout, pred_id
    """


@query("maintenance_rowgroup_pruning_sim", oracle=_pruning_oracle())
def maintenance_rowgroup_pruning_sim(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROW-GROUP PRUNING EFFECTIVENESS — the data-layout advisory that
    motivates maintenance_zorder_cluster and completes the
    footer-stats chain (maintenance_parquet_footer_stats proves the
    stats exist; this op measures what they BUY under two layouts).

    orders is physically rewritten twice: 'clustered' partitions rows
    into {16} contiguous key-range buckets of o_orderkey (what a
    sort/zorder write produces), 'scattered' buckets by a
    multiplicative hash of the same key (high bits, round-9 rule —
    what an unsorted ingest produces). Both copies are REAL parquet
    written by Spark; the op then parses the written files' FOOTERS
    (pyarrow metadata, min/max per row group folded per bucket — the
    exact values a scan's row-group skip consults) and evaluates an
    8-predicate BETWEEN panel spanning the key domain: a bucket is
    pruned when [fmin, fmax] misses [lo, hi]. Expected shape — the
    advisory itself: clustered prunes ~(1 - 1/8 - 1/32) of buckets
    and rows per predicate; scattered prunes NOTHING (every hash
    bucket spans the whole key domain). That row pair is the
    quantitative case for clustering a 100 TB table on its filter
    column.

    Parity: bucket ids, predicate bounds, and prune decisions are all
    exact BIGINT arithmetic ((i*span) div 8 bounds, div/% bucket
    formulas — DuckDB // twin); the oracle recomputes bucket extrema
    FROM DATA, so the hash match proves the writer+footer-parser pair
    is faithful end-to-end, not just that the sim math agrees.

    Shape at 100 TB: the rewrite is the one-off layout job (range
    shuffle, the same pass as maintenance_zorder_cluster); the footer
    walk is metadata-only (KBs per file, per-file parallel via a
    binaryFile scan on a cluster; driver-side here over ~32 small
    files); the panel evaluation is a 32-bucket x 8-predicate
    broadcast cross join — bounded by the layout, not the data.
    """
    import pyarrow.parquet as pq

    mn, mx = (
        table(spark, sf_dir, "orders")
        .agg(
            F.min("o_orderkey").cast("bigint"),
            F.max("o_orderkey").cast("bigint"),
        )
        .first()
    )
    mn, mx = int(mn), int(mx)
    span = mx - mn + 1
    width = span // _PRUNE_BUCKETS + 1
    base = f"/root/repo/_scratch/sources/pruning_{sf_tag(sf_dir)}"
    layouts = {
        "clustered": f"(CAST(o_orderkey AS BIGINT) - {mn}) div {width}",
        "scattered": (
            "((CAST(o_orderkey AS BIGINT) * 2654435761) % 4294967296)"
            " div 268435456"
        ),
    }
    key = (id(spark), sf_dir)
    if key not in _pruning_written:
        for layout, grp_expr in layouts.items():
            (
                table(spark, sf_dir, "orders")
                .select("o_orderkey", F.expr(grp_expr).alias("grp"))
                .repartition("grp")  # one task -> one file per bucket
                .write.mode("overwrite")
                .partitionBy("grp")
                .parquet(f"{base}/{layout}")
            )
        _pruning_written.add(key)

    # real footer walk: fold per-row-group min/max/rows per bucket
    bucket_rows = []
    for layout in layouts:
        root = f"{base}/{layout}"
        for d in sorted(os.listdir(root)):
            if not d.startswith("grp="):
                continue
            grp = int(d.split("=", 1)[1])
            fmin = fmax = None
            n_rows = 0
            for f_ in sorted(os.listdir(os.path.join(root, d))):
                if not f_.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(root, d, f_)).metadata
                idx = [
                    md.schema.column(i).name for i in range(md.num_columns)
                ].index("o_orderkey")
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    n_rows += rg.num_rows
                    st = rg.column(idx).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"stats-less row group in {layout}/{d}/{f_} — "
                            "pruning sim requires min/max on every group"
                        )
                    smin, smax = int(st.min), int(st.max)
                    fmin = smin if fmin is None else min(fmin, smin)
                    fmax = smax if fmax is None else max(fmax, smax)
            if fmin is not None:
                bucket_rows.append((layout, grp, fmin, fmax, n_rows))

    buckets = spark.createDataFrame(
        bucket_rows,
        schema="layout string, grp bigint, fmin bigint, fmax bigint,"
        " n_rows bigint",
    )
    preds = spark.createDataFrame(
        [
            (
                i,
                mn + (i * span) // _PRUNE_PREDS,
                mn + (i * span) // _PRUNE_PREDS + span // 32,
            )
            for i in range(_PRUNE_PREDS)
        ],
        schema="pred_id bigint, lo bigint, hi bigint",
    )
    pruned = (F.col("fmax") < F.col("lo")) | (F.col("fmin") > F.col("hi"))
    return (
        buckets.crossJoin(F.broadcast(preds))
        .groupBy("layout", "pred_id", "lo", "hi")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(F.when(pruned, 1).otherwise(0))
            .cast("bigint")
            .alias("buckets_pruned"),
            F.sum("n_rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(pruned, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_skipped"),
        )
        .orderBy("layout", "pred_id")
    )

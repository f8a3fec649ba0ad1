"""Vector math as pure Catalyst column expressions.

The reference delegates all vector math to Qdrant with
``Distance.COSINE`` over 1024-dim Cohere vectors
(/root/reference/app.py:87). Here the same metric is a *column
expression* built from SQL higher-order functions (zip_with /
aggregate), so it runs inside whole-stage codegen on every executor —
no Python UDF, no Arrow transfer, fully distributable over a 100 TB
embedding table.

Arithmetic notes:
- cast to double *before* multiplying: fixtures store float32 and we
  want the oracle (DuckDB ``::DOUBLE[]``) to reproduce bit-identical
  sums — both engines then do a sequential double-precision fold in
  array order.
- every declared query rounds the final similarity to 6 decimals on
  both sides (FIXTURES.md parity rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm."""
    return dot(a, a)


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(norm2(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, the reference's distance metric (app.py:87)."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (used by the IVF/LSH approximate paths)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )

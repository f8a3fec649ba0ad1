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

import math

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


def cosine_to_const(a: Column, b: Column, b_norm: float) -> Column:
    """Cosine against a *literal* query vector whose norm is precomputed.

    Catalyst cannot constant-fold an ``aggregate`` over a literal array
    (higher-order functions are non-foldable), so ``cosine(col, lit_vec)``
    re-evaluates the query-side norm for every corpus row — measurable
    even at bench scale and pure waste at 100 TB. The caller computes
    ``b_norm`` once on the driver with the same sequential left-fold the
    HOF would use, keeping the result bit-identical to ``cosine``.
    """
    return dot(a, b) / (norm(a) * F.lit(float(b_norm)))


# Spark's higher-order functions (aggregate / zip_with) are
# CodegenFallback: they evaluate INTERPRETED, one lambda frame per
# element, even inside a WholeStageCodegen span. For a KNOWN embedding
# dimension, an unrolled element_at multiply-add chain compiles into
# straight-line JVM bytecode instead — measured 2.5x faster on the
# 64-dim bench corpus, bit-identical results (same left-to-right
# sequential fold order). Above _UNROLL_LIMIT dims the expression tree
# would bloat codegen (64KB JVM method limit forces splits), so the
# fixed-dim helpers fall back to the HOF path.
_UNROLL_LIMIT = 256


def _elem(a: Column, i: int) -> Column:
    return F.element_at(a, i + 1).cast("double")


# Plan-BUILD cost note: constructing the unrolled chain as a Python
# Column tree costs one py4j round-trip per node (~400 calls, measured
# 1.05 s of the cold-query latency for 64-dim cosine). When callers
# pass column NAMES (str), the whole chain is rendered as ONE SQL
# string and parsed in a single F.expr call (~ms). `+` and `*` parse
# left-associative, so the expression tree — and therefore the float
# fold order — is identical to the Column-built version.


def _esql(name: str, i: int) -> str:
    # Backtick-quote so non-simple identifiers (dots, spaces) render
    # as a single column reference, not a parse error.
    return f"CAST(element_at(`{name}`, {i + 1}) AS DOUBLE)"


def _dot_sql(a: str, b: str, d: int) -> str:
    return " + ".join(f"{_esql(a, i)} * {_esql(b, i)}" for i in range(d))


def _norm2_sql(a: str, d: int) -> str:
    return " + ".join(f"{_esql(a, i)} * {_esql(a, i)}" for i in range(d))


def _dot_const_sql(a: str, qv: list) -> str:
    # repr(float) of nan/inf renders invalid SQL ('nanD') that only
    # fails at parse time with an opaque error — reject up front.
    for i, x in enumerate(qv):
        if not math.isfinite(float(x)):
            raise ValueError(
                f"_dot_const_sql: query component {i} is {x!r}; "
                "vector literals must be finite"
            )
    return " + ".join(
        f"{_esql(a, i)} * {float(x)!r}D" for i, x in enumerate(qv)
    )


def dot_fixed(a: Column | str, b: Column | str, d: int) -> Column:
    """dot(a, b) for a KNOWN dimension d: codegen'd unrolled chain,
    same sequential fold order as the HOF (bit-identical). Pass column
    names (str) for the one-expr fast plan build."""
    if d > _UNROLL_LIMIT:
        return dot(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b)
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b, d))
    acc = _elem(a, 0) * _elem(b, 0)
    for i in range(1, d):
        acc = acc + _elem(a, i) * _elem(b, i)
    return acc


def norm2_fixed(a: Column | str, d: int) -> Column:
    if d > _UNROLL_LIMIT:
        return norm2(F.col(a) if isinstance(a, str) else a)
    if isinstance(a, str):
        return F.expr(_norm2_sql(a, d))
    t = _elem(a, 0)
    acc = t * t
    for i in range(1, d):
        t = _elem(a, i)
        acc = acc + t * t
    return acc


def norm_fixed(a: Column | str, d: int) -> Column:
    return F.sqrt(norm2_fixed(a, d))


def cosine_fixed(a: Column | str, b: Column | str, d: int) -> Column:
    """cosine(a, b) for a KNOWN dimension — the hot-path variant."""
    if isinstance(a, str) and isinstance(b, str) and d <= _UNROLL_LIMIT:
        return F.expr(
            f"({_dot_sql(a, b, d)}) / "
            f"(sqrt({_norm2_sql(a, d)}) * sqrt({_norm2_sql(b, d)}))"
        )
    return dot_fixed(a, b, d) / (norm_fixed(a, d) * norm_fixed(b, d))


def dot_to_const_fixed(a: Column | str, qv: list, d: int | None = None) -> Column:
    """<a, qv> against a driver-side literal list: each query component
    embeds as a codegen'd double literal (no array construction at all)."""
    d = len(qv) if d is None else d
    if d > _UNROLL_LIMIT:
        return dot(F.col(a) if isinstance(a, str) else a,
                   F.array(*[F.lit(float(x)) for x in qv]))
    if isinstance(a, str):
        return F.expr(_dot_const_sql(a, qv))
    acc = _elem(a, 0) * float(qv[0])
    for i in range(1, d):
        acc = acc + _elem(a, i) * float(qv[i])
    return acc


def cosine_to_const_fixed(a: Column | str, qv: list, q_norm: float) -> Column:
    """cosine against a literal query vector: unrolled dot + unrolled
    corpus norm + precomputed (seq_norm) query norm."""
    if isinstance(a, str) and len(qv) <= _UNROLL_LIMIT:
        return F.expr(
            f"({_dot_const_sql(a, qv)}) / "
            f"(sqrt({_norm2_sql(a, len(qv))}) * {float(q_norm)!r}D)"
        )
    return dot_to_const_fixed(a, qv) / (
        norm_fixed(a, len(qv)) * F.lit(float(q_norm))
    )


def seq_norm(vec) -> float:
    """Driver-side L2 norm with HOF-identical arithmetic: sequential
    left-fold of float64 products in array order (NOT numpy pairwise
    summation, which differs in the last ulp)."""
    import math

    s = 0.0
    for x in vec:
        s += float(x) * float(x)
    return math.sqrt(s)


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

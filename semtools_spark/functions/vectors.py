"""JVM-side vector math over array<float>/array<double> columns.

For small fixed dims (testdata embeddings are 64-dim) these stay inside
whole-stage codegen — no Python boundary. The pandas-UDF variants in
embedding.py are for the hot embed path where a matmul per Arrow batch wins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_literal(vec) -> Column:
    """array<double> literal from a Python/NumPy vector."""
    return F.array(*[F.lit(float(x)) for x in vec])


def dot_expr(a: str, b: str) -> Column:
    """Sequential-fold dot product (deterministic summation order —
    matches a left-to-right fold in the oracle)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def l2_norm_expr(a: str) -> Column:
    return F.sqrt(
        F.expr(f"aggregate({a}, 0.0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    )


def cosine_distance_expr(a: str, b: str) -> Column:
    """1 − cosine similarity; 1.0 when either norm is zero (matches the
    convention in embedding.cosine_distance_udf)."""
    num = dot_expr(a, b)
    den = l2_norm_expr(a) * l2_norm_expr(b)
    return F.when(den > 0, F.lit(1.0) - num / den).otherwise(F.lit(1.0))


def dot_sql_duckdb(a: str, b: str) -> str:
    """DuckDB rendering of dot_expr. list_reduce is a sequential left fold,
    matching Spark's aggregate() summation order bit-for-bit — required so
    floor(dist·1e6) integerization agrees across engines."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def cosine_distance_sql_duckdb(a: str, b: str) -> str:
    num = dot_sql_duckdb(a, b)
    na = f"sqrt({dot_sql_duckdb(a, a)})"
    nb = f"sqrt({dot_sql_duckdb(b, b)})"
    return f"(CASE WHEN {na} * {nb} > 0 THEN 1.0 - ({num}) / ({na} * {nb}) ELSE 1.0 END)"

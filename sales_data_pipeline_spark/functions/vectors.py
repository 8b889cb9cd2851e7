"""Vector math over array<float|double> columns — pure Catalyst expressions.

Embedding similarity stays entirely JVM-side via higher-order functions
(zip_with + aggregate); no Python round-trip per row. Element order inside
an array is deterministic, so double-precision accumulation here is
bitwise reproducible regardless of partitioning — unlike a float sum over
a shuffled relation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_array(col: Column | str) -> Column:
    """array<float> → array<double> (compute similarity in f64)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (whole-stage codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))

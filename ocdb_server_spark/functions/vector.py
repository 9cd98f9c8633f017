"""Vector column expressions over `array<float>` embeddings.

All JVM higher-order functions (`transform` / `zip_with` /
`aggregate`) — no Python in the loop, so they run inside codegen and
scale linearly with the scan. Elements are promoted to double before
arithmetic; folds run left-to-right, so results are deterministic for
a given vector (cross-engine last-bit differences are absorbed by
rounding at the operator layer).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays (promoted to double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of a float array."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_norm_d(a: Column) -> Column:
    """Euclidean norm of an array<double> (no re-cast)."""
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (unrounded; round at the operator layer for
    cross-engine compares)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """L2-normalize to array<double>."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)

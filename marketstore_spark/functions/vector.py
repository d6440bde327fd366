"""Vector math over array<float> columns — JVM-side higher-order
functions (F.zip_with / F.aggregate), no Python in the loop.

Used by the similarity-search and embedding-dedup operators
(SURVEY §2 #34-36)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL for a zero-norm vector (undefined — and
    ANSI mode would otherwise abort the job on one degenerate row)."""
    den = l2_norm(a) * l2_norm(b)
    return dot(a, b) / F.when(den == 0, F.lit(None)).otherwise(den)

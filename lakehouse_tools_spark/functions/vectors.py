"""Vector math over ``array`` columns — pure Catalyst expressions.

All operators here stay JVM-side (``F.zip_with`` / ``F.aggregate``
higher-order functions, whole-stage-codegen'd): no Python UDF crosses
the Arrow boundary for a dot product. Inputs are cast to
``array<double>`` first so accumulation runs in double precision and
is reproducible across engines (sequential left fold, same as ANSI
engines' list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    ad = _as_double(a)
    return F.sqrt(
        F.aggregate(F.zip_with(ad, ad, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))

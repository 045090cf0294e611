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


def quantize_int8(v: Column) -> Column:
    """Symmetric per-vector int8 quantization:
    ``struct(scale double, q array<int>)`` with ``scale =
    max|vᵢ|/127`` and ``qᵢ = floor(vᵢ/scale + 0.5)`` ∈ [−127, 127] —
    the storage/IO scheme that shrinks an fp32 embedding 4× (plus one
    scale) while keeping cosine ranking nearly intact.

    ``floor(x + 0.5)`` instead of ``round``: half-way handling of
    ``round`` differs across engines (banker's vs decimal-string),
    while floor of an IEEE sum is the same everywhere — so quantized
    codes are bit-identical in any engine and the whole pipeline
    stays oracle-checkable. No clamp is needed: |v/scale| ≤ 127 by
    construction and floor(±127 + 0.5) stays in range. An all-zero
    vector quantizes to scale 0 with all-zero codes (0/0 guards to
    0).
    """
    vd = _as_double(v)
    scale = (
        F.array_max(F.transform(vd, lambda x: F.abs(x))) / F.lit(127.0)
    )
    # the scale rides in as a zip_with ARGUMENT (array_repeat), not as
    # an expression inside the lambda body: the interpreted HOF
    # re-evaluates the lambda expression tree per element, so an
    # embedded scale would re-run its O(dim) array_max fold per
    # element (O(dim^2)/row). An argument is evaluated once per row;
    # the division arithmetic is unchanged, so codes stay
    # bit-identical.
    q = F.zip_with(
        vd,
        F.array_repeat(scale, F.size(vd)),
        lambda x, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.floor(x / s + F.lit(0.5)).cast("int")
        ),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qs: Column) -> Column:
    """Reconstruct ``array<double>`` from :func:`quantize_int8`'s
    struct: ``qᵢ · scale`` — error per element ≤ scale/2."""
    scale = qs.getField("scale")
    q = qs.getField("q")
    # same per-row hoist as quantize_int8: when qs is a quantize
    # EXPRESSION (not a materialized column), SimplifyExtractValueOps
    # rewrites struct(..).scale back into the raw scale expression —
    # embedding it in a transform lambda would re-run it per element.
    return F.zip_with(
        q,
        F.array_repeat(scale, F.size(q)),
        lambda x, s: x.cast("double") * s,
    )

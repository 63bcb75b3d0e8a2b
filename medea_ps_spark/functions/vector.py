"""Vector math over array<float|double> columns — pure SQL expressions
(zip_with / aggregate), computed in double, JVM-side. No UDFs: at 100 TB
the dot products must stay inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# NB (round 6, measured): unrolled fixed-dim variants of dot/norm
# (get()/*/+ chains guarded by size(vec)==dim) were tried and REVERTED:
# whole-stage codegen emits both guard branches, and at dim 64 the
# generated projection blows the method budget and falls back to
# interpreting the giant expression — ann_topk 0.6s -> 1.5-2.0s,
# ann_lsh 1.5s -> 8.5-9.4s (interleaved sweep, sf0.1). The HOF
# zip_with/aggregate fold is the fastest correct form measured here.

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


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """``dot`` with a statically known dimension: the multiply-add
    chain is unrolled into ``get``/``*``/``+`` builtins, which
    whole-stage-codegen (the HOF form is CodegenFallback — the lambda
    interprets per element). Left-assoc addition reproduces the
    aggregate fold exactly, and a size guard falls back to the HOF
    form whenever either array is not exactly ``dim`` long, so the
    result is bit-identical to ``dot`` for EVERY input."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), acc
    ).otherwise(dot(a, b))


def norm_fixed(a: Column, dim: int) -> Column:
    """``norm`` with a statically known dimension — same unrolling and
    guard as :func:`dot_fixed`."""
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.get(a, i).cast("double")
        acc = acc + x * x
    return F.when(F.size(a) == dim, F.sqrt(acc)).otherwise(norm(a))

"""Shared join helpers for the salted operators.

``null_safe_join`` is the stitch-join primitive: an inner equi-join
whose keys match with SQL's null-safe equality (``<=>``), so rows with
NULL key columns (or a NULL-derived bucket) survive the stitch exactly
as they survive a window ``partitionBy`` — which groups NULLs — in the
unsalted twins. Catalyst treats ``EqualNullSafe`` as an equi-join key,
so the physical plan stays a broadcast/shuffled hash or sort-merge
join, never a nested loop.

The right side's join columns are renamed before the join: the salted
operators join a frame against a summary DERIVED FROM IT, and a
self-join conditioned on raw column names is silently ambiguous
(round-4 lesson) — renaming makes every reference unique.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_RPREFIX = "_nsj_"


def null_safe_join(
    left: DataFrame, right: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on ``on`` with null-safe
    equality; output carries left's columns plus right's non-key
    columns (USING-join shape)."""
    on = list(on)
    clash = {f"{_RPREFIX}{c}" for c in on} & (
        set(left.columns) | set(right.columns)
    )
    if clash:
        raise ValueError(
            f"input columns collide with null_safe_join internals: "
            f"{sorted(clash)}"
        )
    renamed = right.select(
        *[F.col(c).alias(f"{_RPREFIX}{c}") for c in on],
        *[c for c in right.columns if c not in on],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"{_RPREFIX}{c}")) for c in on],
    )
    return left.join(renamed, cond, "inner").drop(
        *[f"{_RPREFIX}{c}" for c in on]
    )

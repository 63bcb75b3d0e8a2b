"""Snapshot reconciliation — row-level diff between two versions of a
keyed table (old vs new), the validation-engine primitive behind
"did this pipeline run change what it should have and nothing else".

Reference parity: the reference validates one document at a time
(src/Data/Medea.purs:146-336 has no table-diff notion); this operator is
part of the §2D north-rule generalization — table-level verdicts over a
lake at 100 TB.

Scale design
------------
* Both sides are projected to ``key_cols + compare_cols`` before the
  join (column pruning reaches the parquet scan).
* ``mode="hash"`` pre-digests each side's compare columns into ONE
  16-byte md5 lane so the full-outer join shuffles (key, digest) only —
  the right shape for wide fact tables; it reports added/removed/changed
  without per-column detail.
* ``mode="detail"`` carries the compare columns through the join and
  emits the sorted list of changed columns per key — null-safe,
  codegen'd CASE chain, no UDFs.
* The join is a plain full-outer equi-join on the key: AQE picks
  broadcast when one snapshot (or the post-filter delta) is small, and
  sort-merge with skew splitting otherwise. No crossJoin, no collect.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

_NULL_SENTINEL = "\x00null\x00"


def _row_digest(cols: Sequence[str]) -> F.Column:
    """md5 over the null-sentineled, unit-separated compare columns —
    deterministic and collision-safe in practice (16-byte lane)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def table_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    mode: str = "detail",
) -> DataFrame:
    """Diff two snapshots of a table keyed by ``key_cols``.

    Returns one row per key that differs:
      ``key_cols..., change ('added'|'removed'|'changed'),
      changed_cols`` (comma-joined sorted column names; '' for
      added/removed, and always '' in mode="hash").

    Keys present in both snapshots with identical compare columns are
    dropped before the final projection, so the output is the (usually
    tiny) delta, not the table.
    """
    if mode not in ("detail", "hash"):
        raise ValueError(f"mode must be 'detail' or 'hash', got {mode!r}")
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        compare_cols = [c for c in old_df.columns if c not in key_cols]
    compare_cols = list(compare_cols)

    if mode == "hash":
        o = old_df.select(
            *key_cols,
            _row_digest(compare_cols).alias("_old_digest"),
            F.lit(1).alias("_old_present"),
        )
        n = new_df.select(
            *key_cols,
            _row_digest(compare_cols).alias("_new_digest"),
            F.lit(1).alias("_new_present"),
        )
        joined = o.join(n, key_cols, "full_outer")
        changed = F.col("_old_digest") != F.col("_new_digest")
        changed_cols = F.lit("")
    else:
        o = old_df.select(
            *key_cols,
            *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
            F.lit(1).alias("_old_present"),
        )
        n = new_df.select(
            *key_cols,
            *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
            F.lit(1).alias("_new_present"),
        )
        joined = o.join(n, key_cols, "full_outer")
        diffs = [
            F.when(
                ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")), F.lit(c)
            )
            for c in compare_cols
        ]
        changed_list = F.array_sort(
            F.filter(F.array(*diffs), lambda x: x.isNotNull())
        )
        changed = F.size(changed_list) > 0
        changed_cols = F.array_join(changed_list, ",")

    change = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *key_cols,
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Verdict-sized rollup of a table_diff result: one row per change
    kind with its count — the check a validation gate actually asserts
    on ("0 removed, N added, 0 changed")."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n_keys"))


def schema_diff(old: DataFrame, new: DataFrame) -> list:
    """Column-level schema reconciliation between two snapshots — the
    metadata complement of :func:`table_diff` (a pipeline gate wants
    "no column vanished, no type narrowed" BEFORE it pays for a row
    diff). Driver-side only: schemas are already on the driver, no job
    runs.

    Returns a sorted list of dicts:
        {"column", "change": added|removed|type_changed|
         nullability_changed, "old", "new"}
    Type changes compare the full simpleString (nested struct/array
    element changes count); a column with both a type and nullability
    change reports type_changed (the stronger verdict). Nullability
    compares the full dataType JSON, so nested flips
    (array containsNull, map valueContainsNull, struct field nullable)
    are caught even though simpleString omits them."""
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    out = []
    for name in sorted(o.keys() | n.keys()):
        fo, fn = o.get(name), n.get(name)
        if fo is None:
            out.append({"column": name, "change": "added", "old": None,
                        "new": fn.dataType.simpleString()})
        elif fn is None:
            out.append({"column": name, "change": "removed",
                        "old": fo.dataType.simpleString(), "new": None})
        elif fo.dataType.simpleString() != fn.dataType.simpleString():
            out.append({"column": name, "change": "type_changed",
                        "old": fo.dataType.simpleString(),
                        "new": fn.dataType.simpleString()})
        elif (fo.nullable != fn.nullable
              or fo.dataType.json() != fn.dataType.json()):
            out.append({"column": name, "change": "nullability_changed",
                        "old": fo.json(), "new": fn.json()})
    return out

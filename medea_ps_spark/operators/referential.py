"""Referential-integrity joins with explicit skew handling (north rule:
"partitioning / shuffle / skew handled explicitly").

Strategy ladder:

1. **Broadcast anti-join** (default; operators/validator.py) — the
   allowed-sources dim is tiny, so the fact side never shuffles and
   Zipf skew in ``source`` is irrelevant. This is the 100 TB plan.
2. **Salted shuffle anti-join** (here) — for dims too big to broadcast.
   A plain shuffle join on a Zipf key sends the dominant key's ~50% of
   all rows to ONE task; salting fans each key into ``salt_buckets``
   sub-keys (fact side: deterministic hash-derived salt; dim side:
   exploded with every salt) so the hot key spreads across
   ``salt_buckets`` tasks. AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_anti_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    id_column: str = "doc_id",
    salt_buckets: int = 32,
    force_shuffle: bool = False,
) -> DataFrame:
    """Rows of ``fact`` whose ``key`` is absent from ``dim`` — correct
    under salting because every (key, salt) pair present on the fact
    side exists on the dim side iff the key does.

    ``force_shuffle=True`` pins a shuffle-hash join (hint) so the salted
    path is exercised even when the dim would fit under the broadcast
    threshold — used by tests and the driver's correctness gate to prove
    the skew path is semantically identical to the broadcast one."""
    salt = F.pmod(
        F.xxhash64(F.coalesce(F.col(id_column).cast("string"), F.lit("")), F.col(key)),
        F.lit(salt_buckets),
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = (
        dim.select(key).distinct()
        .withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
    )
    if force_shuffle:
        d = d.hint("shuffle_hash")
    return f.join(d, on=[key, "_salt"], how="left_anti").drop("_salt")


def salted_inner_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 32,
) -> DataFrame:
    """Skew-safe enrichment join (dim columns onto fact) for
    non-broadcastable dims: dim exploded ×salt_buckets, fact salted
    deterministically, join key becomes (key, salt)."""
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, on=[key, "_salt"], how="inner").drop("_salt")

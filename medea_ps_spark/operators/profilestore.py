"""Persisted per-partition distribution profiles — incremental
histograms, t-digest quantiles, and column stats with NO rescan.

This completes the resumable-sketch trio (operators/hll.py holds the
distinct-count corner): every completed partition leaves behind a
few-KB profile row per monitored column — equi-width bucket counts
(the χ²/KS drift input), a serialized t-digest (mergeable quantiles),
and min/max/sum/null stats — written next to the checkpoint manifest.
All three artifacts merge exactly (count vectors add, digests merge
associatively, min/max/sum fold), so after a kill/resume, an append,
or N separate runs over slices of a 10^12-row table:

* global quantiles   = merge the stored digests     (kilobytes),
* global histogram   = add the stored count vectors (kilobytes),
* drift of a NEW partition vs the corpus-so-far = χ² of its one-pass
  histogram against the summed store — the reference profile no longer
  needs a dedicated clean-epoch rescan; the corpus IS the profile.

Scale shape per partition write: one hash-agg histogram pass
(≤ nbuckets rows shuffled) plus one mapInPandas pass that emits ONE
digest+stats row per Spark partition (Arrow-batched, no per-row
Python), merged driver-side — the treeAggregate pattern throughout.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .drift import ColumnProfile, ReferenceProfile, _counts_vector
from .sketches import TDigest, histogram, token_histogram

PROFILE_DIR = "profile"

_SCHEMA = (
    "name string, column string, lo double, hi double, nbuckets int, "
    "counts array<bigint>, tdigest binary, n_rows bigint, n_null bigint, "
    "col_min double, col_max double, col_sum double"
)


def _digest_and_stats(
    df: DataFrame, column: str, compression: int
) -> Dict:
    """One mapInPandas pass → one (digest, stats) row per Spark
    partition (bounded collect), merged driver-side."""
    import pandas as pd

    def per_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc = TDigest(compression)
        n = n_null = 0
        mn = mx = float("nan")
        sm = 0.0
        for pdf in batches:
            v = pdf[column].to_numpy(dtype=np.float64)
            n += len(v)
            nan = np.isnan(v)
            n_null += int(nan.sum())
            good = v[~nan]
            if len(good):
                acc = acc.merge(TDigest.from_values(good, compression))
                mn = np.nanmin([mn, good.min()])
                mx = np.nanmax([mx, good.max()])
                sm += float(good.sum())
        yield pd.DataFrame(
            {
                "tdigest": [acc.to_bytes()],
                "n": [n],
                "n_null": [n_null],
                "mn": [mn],
                "mx": [mx],
                "sm": [sm],
            }
        )

    rows = (
        df.select(F.col(column).cast("double").alias(column))
        .mapInPandas(
            per_partition,
            schema="tdigest binary, n bigint, n_null bigint, "
                   "mn double, mx double, sm double",
        )
        .collect()
    )
    acc = TDigest(compression)
    n = n_null = 0
    mins: List[float] = []
    maxs: List[float] = []
    sm = 0.0
    for r in rows:
        acc = acc.merge(TDigest.from_bytes(bytes(r["tdigest"])))
        n += r["n"]
        n_null += r["n_null"]
        if r["mn"] is not None and not np.isnan(r["mn"]):
            mins.append(r["mn"])
            maxs.append(r["mx"])
        sm += r["sm"] or 0.0
    return {
        "tdigest": acc.to_bytes(),
        "n_rows": n,
        "n_null": n_null,
        "col_min": min(mins) if mins else None,
        "col_max": max(maxs) if maxs else None,
        "col_sum": sm,
    }


def write_partition_profile(
    df: DataFrame,
    specs: Dict[str, Dict],
    checkpoint_dir: str,
    partition: str,
) -> None:
    """Persist ONE partition's profile rows under
    ``<checkpoint_dir>/profile/<partition>/``. ``specs``: name →
    {column | token_array, lo, hi, nbuckets?, compression?} — the same
    spec shape drift.build_profile takes. Token-array specs store the
    token-value histogram (no digest: token ids are categorical).
    Overwrite-idempotent like the HLL store."""
    spark = df.sparkSession
    out_rows = []
    for name, s in specs.items():
        nb = int(s.get("nbuckets", 64))
        lo, hi = float(s["lo"]), float(s["hi"])
        if "token_array" in s:
            col = s["token_array"]
            h = token_histogram(df, col, vocab=int(hi), nbuckets=nb)
            counts = _counts_vector(h, nb)
            extra = {
                "tdigest": None,
                "n_rows": int(counts.sum()),
                "n_null": None,
                "col_min": None,
                "col_max": None,
                "col_sum": None,
            }
        else:
            col = s["column"]
            h = histogram(df, col, lo, hi, nb)
            counts = _counts_vector(h, nb)
            extra = _digest_and_stats(df, col, int(s.get("compression", 200)))
        out_rows.append(
            {
                "name": name,
                "column": col,
                "lo": lo,
                "hi": hi,
                "nbuckets": nb,
                "counts": [int(x) for x in counts],
                **extra,
            }
        )
    spark.createDataFrame(out_rows, schema=_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(checkpoint_dir, PROFILE_DIR, partition))


def _store_rows(
    spark: SparkSession, checkpoint_dir: str, partitions: Optional[Sequence[str]]
):
    root = os.path.join(checkpoint_dir, PROFILE_DIR)
    if partitions is None:
        partitions = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
    if not partitions:
        return []
    return spark.read.parquet(
        *[os.path.join(root, p) for p in partitions]
    ).collect()


def global_profile(
    spark: SparkSession,
    checkpoint_dir: str,
    partitions: Optional[Sequence[str]] = None,
) -> Dict[str, Dict]:
    """Merge the stored rows — count vectors add, digests merge, stats
    fold — into {name: {lo, hi, nbuckets, counts, tdigest, n_rows,
    n_null, col_min, col_max, col_sum, n_partitions}}. Kilobytes read,
    zero table scans."""
    merged: Dict[str, Dict] = {}
    for r in _store_rows(spark, checkpoint_dir, partitions):
        g = merged.get(r["name"])
        if g is None:
            merged[r["name"]] = g = {
                "column": r["column"],
                "lo": r["lo"],
                "hi": r["hi"],
                "nbuckets": r["nbuckets"],
                "counts": np.zeros(r["nbuckets"], dtype=np.int64),
                "tdigest": None,
                "n_rows": 0,
                "n_null": 0,
                "col_min": None,
                "col_max": None,
                "col_sum": 0.0,
                "n_partitions": 0,
            }
        if (r["lo"], r["hi"], r["nbuckets"]) != (g["lo"], g["hi"], g["nbuckets"]):
            raise ValueError(
                f"{r['name']}: mixed bucketing in store "
                f"({r['lo']},{r['hi']},{r['nbuckets']}) vs "
                f"({g['lo']},{g['hi']},{g['nbuckets']})"
            )
        g["counts"] = g["counts"] + np.asarray(r["counts"], dtype=np.int64)
        g["n_partitions"] += 1
        if r["tdigest"] is not None:
            d = TDigest.from_bytes(bytes(r["tdigest"]))
            g["tdigest"] = (
                d if g["tdigest"] is None else g["tdigest"].merge(d)
            )
            g["n_rows"] += r["n_rows"]
            g["n_null"] += r["n_null"] or 0
            if r["col_min"] is not None:
                g["col_min"] = (
                    r["col_min"] if g["col_min"] is None
                    else min(g["col_min"], r["col_min"])
                )
                g["col_max"] = (
                    r["col_max"] if g["col_max"] is None
                    else max(g["col_max"], r["col_max"])
                )
            g["col_sum"] += r["col_sum"] or 0.0
        else:
            g["n_rows"] += r["n_rows"]
    for g in merged.values():
        g["counts"] = [int(x) for x in g["counts"]]
    return merged


def quantiles_from_store(
    spark: SparkSession,
    checkpoint_dir: str,
    name: str,
    qs: Sequence[float],
    partitions: Optional[Sequence[str]] = None,
) -> List[tuple]:
    """Global quantiles from the stored digests alone."""
    g = global_profile(spark, checkpoint_dir, partitions)[name]
    if g["tdigest"] is None:
        raise ValueError(f"{name}: token-array profiles carry no digest")
    return [(q, g["tdigest"].quantile(q)) for q in qs]


def store_reference_profile(
    spark: SparkSession,
    checkpoint_dir: str,
    partitions: Optional[Sequence[str]] = None,
) -> ReferenceProfile:
    """The summed store as a drift.ReferenceProfile — feed it straight
    to chi2_drift/ks_drift: 'does this NEW partition match the corpus
    validated so far' without any clean-epoch rescan."""
    return ReferenceProfile(
        {
            name: ColumnProfile(
                column=g["column"],
                lo=g["lo"],
                hi=g["hi"],
                nbuckets=g["nbuckets"],
                counts=g["counts"],
            )
            for name, g in global_profile(spark, checkpoint_dir, partitions).items()
        }
    )

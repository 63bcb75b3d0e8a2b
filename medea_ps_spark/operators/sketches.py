"""Distribution sketches: equi-width histograms (pure SQL expressions,
codegen'd) and t-digests (Arrow-vectorized applyInPandas per partition,
merged associatively — the treeAggregate pattern).

North-rule operators (SURVEY.md §2D): histogram sketches feed the
chi-square/KS drift tests in operators/drift.py; t-digest gives
mergeable quantiles for n_tok / token-value monitoring at 10^12-row
scale where exact quantiles are impossible.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame, functions as F


def bucket_expr(column, lo: float, hi: float, nbuckets: int):
    """Equi-width bucket index in [0, nbuckets-1], clamped at the edges.
    Fixed edges ⇒ deterministic χ² bucketing (SURVEY.md §7)."""
    width = (hi - lo) / nbuckets
    raw = F.floor((F.col(column).cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbuckets - 1)).cast("int")


def histogram(
    df: DataFrame,
    column: str,
    lo: float,
    hi: float,
    nbuckets: int = 64,
    partition_col: Optional[str] = None,
) -> DataFrame:
    """Bucket counts in one hash-agg pass (map-side partial ⇒ the shuffle
    carries ≤ nbuckets × partitions rows)."""
    b = bucket_expr(column, lo, hi, nbuckets).alias("bucket")
    keys = ([partition_col] if partition_col else []) + ["bucket"]
    return (
        df.where(F.col(column).isNotNull())
        .select(*(([F.col(partition_col)] if partition_col else []) + [b]))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def token_histogram(
    df: DataFrame,
    array_column: str = "tokens",
    vocab: int = 50257,
    nbuckets: int = 64,
) -> DataFrame:
    """Token-VALUE distribution: explode is pipelined into the partial
    agg (no materialized exploded table; the shuffle is nbuckets rows
    per task)."""
    tok = F.explode(F.col(array_column)).alias("tok")
    return (
        df.select(tok)
        .select(bucket_expr("tok", 0, vocab, nbuckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


# ---------------------------------------------------------------------------
# t-digest (merging digest, Dunning & Ertl) — compact numpy implementation
# ---------------------------------------------------------------------------


class TDigest:
    """Mergeable quantile sketch. Centroids kept sorted by mean; the
    scale function is the classic k1 (arcsine) bound via the simpler
    q(1-q) size limit. Accuracy ~1/compression at the median, better at
    the tails — ample for drift monitoring."""

    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: int = 100):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) if len(self.weights) else 0.0

    @classmethod
    def from_values(cls, values: np.ndarray, compression: int = 100) -> "TDigest":
        d = cls(compression)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return d
        d.means = np.sort(v)
        d.weights = np.ones_like(d.means)
        d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.compression)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(out.means, kind="mergesort")
        out.means, out.weights = out.means[order], out.weights[order]
        out._compress()
        return out

    def _compress(self) -> None:
        n = self.total_weight
        if n == 0 or len(self.means) <= 1:
            return
        new_means: List[float] = []
        new_weights: List[float] = []
        cum = 0.0
        cur_mean, cur_w = self.means[0], self.weights[0]
        for m, w in zip(self.means[1:], self.weights[1:]):
            q = (cum + cur_w / 2.0) / n
            limit = max(1.0, 4.0 * n * q * (1.0 - q) / self.compression)
            if cur_w + w <= limit:
                cur_mean = (cur_mean * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                new_means.append(cur_mean)
                new_weights.append(cur_w)
                cum += cur_w
                cur_mean, cur_w = m, w
        new_means.append(cur_mean)
        new_weights.append(cur_w)
        self.means = np.array(new_means)
        self.weights = np.array(new_weights)

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        n = self.total_weight
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        idx = np.searchsorted(cum, target)
        if idx == 0:
            return float(self.means[0])
        if idx >= len(self.means):
            return float(self.means[-1])
        x0, x1 = cum[idx - 1], cum[idx]
        m0, m1 = self.means[idx - 1], self.means[idx]
        frac = (target - x0) / (x1 - x0) if x1 > x0 else 0.0
        return float(m0 + frac * (m1 - m0))

    # stable binary codec (SURVEY.md §7 "stable binary codec inside
    # Arrow UDFs"): version byte + compression + centroid pairs
    def to_bytes(self) -> bytes:
        head = struct.pack("<BId", 1, self.compression, float(len(self.means)))
        body = np.stack([self.means, self.weights]).astype("<f8").tobytes()
        return head + body

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        ver, comp, k = struct.unpack_from("<BId", blob, 0)
        if ver != 1:
            raise ValueError(f"unknown tdigest codec version {ver}")
        k = int(k)
        d = cls(comp)
        arr = np.frombuffer(blob, dtype="<f8", offset=struct.calcsize("<BId"))
        d.means = arr[:k].copy()
        d.weights = arr[k:2 * k].copy()
        return d


def tdigest_by_partition(
    df: DataFrame,
    column: str,
    partition_col: str = "source",
    compression: int = 100,
) -> DataFrame:
    """One serialized t-digest per partition via applyInPandas (Arrow
    batch in, one tiny row out — the only Python boundary, per
    input_hint 'no per-row Python')."""
    import pandas as pd

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        d = TDigest.from_values(pdf[column].to_numpy(dtype=np.float64), compression)
        return pd.DataFrame(
            {
                partition_col: [pdf[partition_col].iloc[0]],
                "tdigest": [d.to_bytes()],
                "n": [len(pdf)],
            }
        )

    out_schema = f"{partition_col} string, tdigest binary, n bigint"
    return df.select(partition_col, column).groupBy(partition_col).applyInPandas(
        build, schema=out_schema
    )


def merge_tdigests(rows: Sequence[bytes], compression: int = 100) -> TDigest:
    """Driver-side associative merge of per-partition digests."""
    acc = TDigest(compression)
    for blob in rows:
        acc = acc.merge(TDigest.from_bytes(bytes(blob)))
    return acc


def quantiles(
    df: DataFrame,
    column: str,
    qs: Sequence[float],
    partition_col: str = "source",
    compression: int = 200,
) -> List[Tuple[float, float]]:
    """End-to-end distributed quantiles: per-partition digests → merge →
    query."""
    rows = tdigest_by_partition(df, column, partition_col, compression).collect()
    d = merge_tdigests([r["tdigest"] for r in rows], compression)
    return [(q, d.quantile(q)) for q in qs]


_KMV_SPAN = float(16 ** 8)  # first 8 md5 hex chars = 32 uniform bits


def kmv_minima(
    df: DataFrame, column: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """The KMV (k-minimum-values) sketch itself: the k smallest DISTINCT
    8-hex-char md5 hashes of the column. Deterministic (md5 of value +
    salt — no RNG), so two sketches of overlapping data MERGE by
    unioning rows and re-taking the k minima, and the whole estimator
    is SQL-oracle-able (unlike HLL registers). The plan is a map-side
    partial dedup + TakeOrdered(k): only distinct hashes shuffle."""
    hx = F.substring(
        F.md5(
            F.concat_ws(":", F.col(column).cast("string"), F.lit(salt))
        ),
        1,
        8,
    )
    return (
        df.where(F.col(column).isNotNull())
        .select(hx.alias("hx"))
        .distinct()
        .orderBy("hx")
        .limit(k)
    )


def kmv_distinct_estimate(
    df: DataFrame, column: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """One-row distinct-count estimate from the KMV sketch:
    est = (k-1) / frac(kth_min), rel. std error ≈ 1/sqrt(k-2) (~6% at
    k=256). Complements approx_count_distinct (HLL): KMV's state is
    plain rows — mergeable across tables/partitions with a union, and
    exactly reproducible by any engine with md5. Returns
    (k, kth_hex, est_distinct).

    Under-full sketch (fewer than ``k`` distinct values, incl. the
    empty input): the sketch already HOLDS every distinct hash, so the
    exact count is returned instead of the noisy (k-1)/frac estimator
    (standard KMV behavior; also guards the NULL kth_hex of an empty
    input)."""
    mins = kmv_minima(df, column, k, salt)
    kth = mins.agg(
        F.count(F.lit(1)).alias("k"), F.max("hx").alias("kth_hex")
    )
    frac = F.conv(F.col("kth_hex"), 16, 10).cast("double") / F.lit(_KMV_SPAN)
    est = (
        F.when(F.col("k") < k, F.col("k").cast("double"))
        .otherwise(F.round((F.col("k") - 1) / frac, 4))
    )
    return kth.select("k", "kth_hex", est.alias("est_distinct"))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan '05) — frequency estimation
# over key spaces too large to groupBy (open-vocabulary n-grams, URLs)
# ---------------------------------------------------------------------------

# 15 hex chars = 60 uniform bits; parses losslessly into a signed BIGINT
# in both Spark (conv(hex,16,10)) and DuckDB (('0x'||hex)::BIGINT), so
# the whole counter table is bit-identical across engines (the same
# md5-lane trick as kmv_minima / dedup LSH / qualitymodel weights).
_CMS_HEX = 15


def _cms_cell(value, depth_row: int, width: int, salt: str):
    """Deterministic cell index in [0, width) for one hash row."""
    lane = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(salt), F.lit(depth_row), value.cast("string")
                )
            ),
            1,
            _CMS_HEX,
        ),
        16,
        10,
    ).cast("long")
    return (lane % F.lit(width)).cast("int")


def count_min_sketch(
    df: DataFrame,
    column: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
    explode_arrays: bool = False,
) -> DataFrame:
    """Build a Count-Min sketch as a (depth_row, cell, c) counter table.

    Scale design: the per-item work (md5 × depth) is pure column
    expressions inside whole-stage codegen; the explode of ``depth``
    (row, cell) structs pipelines straight into the partial hash-agg, so
    each task emits at most depth × width counter rows regardless of
    input size — the shuffle is bounded by the SKETCH size, not the
    data (same property as histogram/token_histogram above). At 10^12
    tokens with depth=4, width=2^16 that is ≤ 256K rows per task.

    ``explode_arrays=True`` sketches the elements of an array column
    (e.g. ``tokens``) instead of the column value itself. NULL values
    (and NULL elements) are excluded, mirroring count() semantics.

    The sketch MERGES by unioning counter tables and re-summing
    (``cms_merge``) — counts are exact sums, so merge is lossless, the
    treeAggregate/union-across-days pattern.
    """
    base = F.explode(F.col(column)) if explode_arrays else F.col(column)
    vals = df.select(base.alias("v")).where(F.col("v").isNotNull())
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("depth_row"),
                    _cms_cell(F.col("v"), r, width, salt).alias("cell"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    return (
        vals.select(rc)
        .select("rc.depth_row", "rc.cell")
        .groupBy("depth_row", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge counter tables built with identical (depth, width, salt):
    union + re-sum. Exact (counts are sums), associative, commutative."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("depth_row", "cell").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each distinct value of ``items``:
    est = min over depth rows of the value's counter (the classic CMS
    estimator — always ≥ the true count, ≤ true + εN w.h.p. where
    ε = e/width).

    The sketch side is ≤ depth × width rows by construction, so the
    probe join is an explicit broadcast — the (possibly huge) item side
    never shuffles. Cells the sketch never touched are count 0.
    Returns (item, est) with est as BIGINT.
    """
    probes = items.select(F.col(item_col).alias("item")).where(
        F.col("item").isNotNull()
    ).distinct()
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("depth_row"),
                    _cms_cell(F.col("item"), r, width, salt).alias("cell"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    exploded = probes.select("item", rc).select(
        "item", "rc.depth_row", "rc.cell"
    )
    joined = exploded.join(
        F.broadcast(sketch), ["depth_row", "cell"], "left"
    )
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    column: str,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
    explode_arrays: bool = False,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-k values by CMS estimate. CMS answers point queries, not
    enumeration, so heavy hitters need a CANDIDATE set; by default the
    distinct values themselves are probed (cheap at test scale and
    exact-recall), while at open-vocabulary scale the caller passes a
    bounded ``candidates`` frame (e.g. distinct values of a
    deterministic hash-sample — a heavy hitter at rate p appears in a
    sample w.h.p., the standard two-pass batch recipe). Ordered by
    (est DESC, item) so the output is total-ordered and reproducible."""
    sk = count_min_sketch(df, column, depth, width, salt, explode_arrays)
    if candidates is None:
        base = F.explode(F.col(column)) if explode_arrays else F.col(column)
        candidates = df.select(base.alias("item"))
    est = cms_estimate(sk, candidates, "item", depth, width, salt)
    return est.orderBy(F.desc("est"), F.asc("item")).limit(k)

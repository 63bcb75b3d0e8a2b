"""Product quantization (PQ) ANN — the memory-bounded scale path for
embedding search (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011). Each (L2-normalized) vector is split
into ``m`` subvectors, each quantized to one of ``ksub`` learned
codewords: the corpus stores ``m`` small ints per vector instead of
``d`` floats — at 100 TB of raw embeddings (e.g. 768-dim float32 ≈
3 KB/vector) the PQ index is ~8-64 bytes/vector, the difference
between "fits in the cluster's memory/SSD" and "doesn't".

Search is asymmetric distance computation (ADC): the query stays
exact; per query a lookup table LUT[j][c] = <q_sub_j, codeword_jc> is
built ONCE (ksub·d multiplies), after which scoring a corpus code is
``m`` table lookups + adds — no decode, no full dot product.

Spark-first shape:
* training — driver-side Lloyd per subspace on a bounded, layout-
  independent hash-ordered sample (same pattern as ivf.train_centroids);
  the codebook is tiny (m·ksub·dsub floats) and ships in the UDF closure.
* encoding — ONE Arrow-batched pandas UDF, vectorized argmin over the
  codebook; map-only, no shuffle.
* search — queries are the broadcast side (collected once to build the
  LUT matrix); candidate scoring is a vectorized gather pandas UDF; the
  ranked cut is the house two-phase top-k (operators/topk.py), so no
  full scored set ever sorts in one task.
* IVF-PQ — compose with ivf.assign_lists: probe n_probe coarse cells
  (broadcast equi-join on the cell id, never a cross join), ADC-score
  only the probed candidates, optionally exact-rerank the survivors.

Oracle note: k-means training is iterative/float and deliberately NOT
SQL-oracle-able; correctness is pinned by pytest against a pure-numpy
reference implementation (encode parity, ADC parity, recall vs the
exact brute-force baseline).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# module-top imports: pandas_udf type hints resolve from module
# globals (round-1 hard rule)
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine
from .topk import topk_per_group


class PQCodebook:
    """centroids: (m, ksub, dsub) float32 — trained on L2-normalized
    vectors, so ADC scores approximate cosine similarity."""

    def __init__(self, centroids: np.ndarray):
        c = np.asarray(centroids, dtype=np.float32)
        if c.ndim != 3:
            raise ValueError(f"centroids must be (m, ksub, dsub), got {c.shape}")
        self.centroids = c

    @property
    def m(self) -> int:
        return self.centroids.shape[0]

    @property
    def ksub(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def to_bytes(self) -> bytes:
        head = struct.pack("<III", self.m, self.ksub, self.dsub)
        return head + self.centroids.astype("<f4").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PQCodebook":
        m, ksub, dsub = struct.unpack("<III", blob[:12])
        arr = np.frombuffer(blob[12:], dtype="<f4").reshape(m, ksub, dsub)
        return cls(arr.copy())


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def train_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    sample: int = 10_000,
    iters: int = 15,
    seed: int = 42,
) -> PQCodebook:
    """Per-subspace Lloyd k-means on a driver-side sample drawn by
    content-hash order (layout-independent AND deterministic — see
    ivf.train_centroids for why .limit() alone is wrong)."""
    rows = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = _normalize(np.array([r[0] for r in rows], dtype=np.float64))
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if ksub > n:
        raise ValueError(f"ksub={ksub} exceeds sample size {n}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    cents = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        c = xs[rng.choice(n, size=ksub, replace=False)]
        for _ in range(iters):
            # squared L2 argmin via the -2x·c + |c|² expansion
            d2 = -2.0 * xs @ c.T + (c * c).sum(axis=1)
            assign = d2.argmin(axis=1)
            for cid in range(ksub):
                members = xs[assign == cid]
                if len(members):
                    c[cid] = members.mean(axis=0)
        cents[j] = c
    return PQCodebook(cents)


def _encode_matrix(x: np.ndarray, cb: PQCodebook) -> np.ndarray:
    """(n, dim) float → (n, m) int32 codes. Vectorized per subspace."""
    x = np.asarray(x, dtype=np.float64)
    if x.shape[1] != cb.dim:
        raise ValueError(
            f"vector dim {x.shape[1]} != codebook dim {cb.dim} (m={cb.m}, dsub={cb.dsub})"
        )
    x = _normalize(x)
    codes = np.empty((len(x), cb.m), dtype=np.int32)
    for j in range(cb.m):
        xs = x[:, j * cb.dsub : (j + 1) * cb.dsub]
        c = cb.centroids[j].astype(np.float64)
        d2 = -2.0 * xs @ c.T + (c * c).sum(axis=1)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def encode_pq(
    df: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Adds ``out_col``: array<int> of length m (NULL vector → NULL).
    One Arrow-batched pandas UDF, map-only."""
    cb = codebook

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        mask = v.notna()
        out = pd.Series([None] * len(v), index=v.index, dtype=object)
        if mask.any():
            x = np.stack(v[mask].to_numpy())
            codes = _encode_matrix(x, cb)
            # assign via an index-aligned Series: a bare list of lists
            # would hit pandas' array-broadcast putmask path
            out.loc[mask] = pd.Series(
                [row.tolist() for row in codes], index=v.index[mask], dtype=object
            )
        return out

    return df.withColumn(out_col, enc(F.col(vec_col)))


def _query_lut(codebook: PQCodebook, q: np.ndarray) -> np.ndarray:
    """(nq, m, ksub) float64: LUT[i, j, c] = <q_i,sub_j, codeword_jc>.
    Built once per query set — the ADC trick."""
    q = _normalize(np.asarray(q, dtype=np.float64))
    nq = len(q)
    lut = np.empty((nq, codebook.m, codebook.ksub), dtype=np.float64)
    for j in range(codebook.m):
        qs = q[:, j * codebook.dsub : (j + 1) * codebook.dsub]
        lut[:, j, :] = qs @ codebook.centroids[j].astype(np.float64).T
    return lut


def _collect_queries(queries: DataFrame, query_id_col: str, vec_col: str):
    rows = (
        queries.select(query_id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(query_id_col)
        .collect()
    )
    if not rows:
        raise ValueError("queries has no rows with a non-null vector")
    ids = [r[0] for r in rows]
    q = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, q


def _adc_udf(lut: np.ndarray):
    """pandas UDF (code array<int>, query index int) → ADC score.
    Vectorized gather: m adds per pair, float64, fixed order —
    deterministic on any layout."""

    @F.pandas_udf("double")
    def adc(code: pd.Series, qi: pd.Series) -> pd.Series:
        codes = np.stack(code.to_numpy()).astype(np.int64)
        q = qi.to_numpy().astype(np.int64)
        jj = np.arange(codes.shape[1])
        return pd.Series(lut[q[:, None], jj, codes].sum(axis=1))

    return adc


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebook: PQCodebook,
    k: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k per query by ADC over the PQ codes — the
    exhaustive-but-compressed scan (IVF-PQ below prunes it). Queries
    are the small/broadcast side; corpus codes are scanned once; the
    cut is two-phase top-k. Output: (query_id, neighbor_id, adc_score,
    rank), ties broken by neighbor_id."""
    spark = codes.sparkSession
    ids, q = _collect_queries(queries, query_id_col, vec_col)
    lut = _query_lut(codebook, q)
    qdf = spark.createDataFrame(
        list(zip(ids, range(len(ids)))), [query_id_col, "_qidx"]
    )
    pairs = codes.where(F.col(code_col).isNotNull()).join(F.broadcast(qdf))
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        _adc_udf(lut)(F.col(code_col), F.col("_qidx")).alias("adc_score"),
    )
    return topk_per_group(
        scored, [query_id_col], [F.desc("adc_score"), F.asc("neighbor_id")], k
    ).select(query_id_col, "neighbor_id", "adc_score", "rank")


def pq_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine re-rank of an ADC candidate set (standard second
    stage): the candidate (query, neighbor) pairs are tiny, so they
    broadcast onto the corpus scan; only matching corpus rows pay the
    exact dot product."""
    cand = candidates.select(query_id_col, "neighbor_id")
    emb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    joined = (
        emb.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        cosine(F.col("_cvec"), F.col("_qvec")).alias("cosine_sim"),
    )
    return topk_per_group(
        scored, [query_id_col], [F.desc("cosine_sim"), F.asc("neighbor_id")], k
    ).select(query_id_col, "neighbor_id", "cosine_sim", "rank")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_centroids: np.ndarray,
    codebook: PQCodebook,
    k: int = 5,
    n_probe: int = 4,
    rerank_factor: Optional[int] = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: coarse cells prune the scan (equi-join corpus cell id ×
    broadcast probe list — a fraction ~n_probe/n_cells of the corpus is
    touched), ADC scores the probed candidates, and the top
    k·rerank_factor survivors get an exact cosine re-rank
    (rerank_factor=None returns the ADC ranking directly). At scale,
    write the encoded table partitioned by ivf_list so the probe join
    becomes partition pruning."""
    from .ivf import assign_lists, train_centroids  # noqa: F401 (doc link)

    spark = corpus.sparkSession
    c = encode_pq(assign_lists(corpus, coarse_centroids, vec_col), codebook, vec_col)
    ids, q = _collect_queries(queries, query_id_col, vec_col)
    lut = _query_lut(codebook, q)
    # per-query probe lists, driver-side (centroids are tiny)
    qn = _normalize(q)
    cent = np.asarray(coarse_centroids, dtype=np.float64)
    sims = qn @ cent.T
    order = np.argsort(-sims, axis=1)[:, :n_probe]
    probe_rows = [
        (qid, qi, int(cell))
        for qi, qid in enumerate(ids)
        for cell in order[qi]
    ]
    qdf = spark.createDataFrame(probe_rows, [query_id_col, "_qidx", "_probe"])
    cand = c.where(F.col("pq_code").isNotNull()).join(
        F.broadcast(qdf), c["ivf_list"] == qdf["_probe"]
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        _adc_udf(lut)(F.col("pq_code"), F.col("_qidx")).alias("adc_score"),
    )
    if rerank_factor is None:
        return topk_per_group(
            scored, [query_id_col],
            [F.desc("adc_score"), F.asc("neighbor_id")], k,
        ).select(query_id_col, "neighbor_id", "adc_score", "rank")
    shortlist = topk_per_group(
        scored, [query_id_col],
        [F.desc("adc_score"), F.asc("neighbor_id")], k * rerank_factor,
    )
    return pq_rerank(
        shortlist, corpus, queries, k, id_col, vec_col, query_id_col
    )

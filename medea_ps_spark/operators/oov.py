"""Vocabulary truncation / OOV remapping over pre-tokenized sequences
``(doc_id, tokens: array<int>, …)`` — keep the corpus's top-K token
ids, rewrite every other occurrence to ``unk_id``. The standard
vocab-reduction step when re-targeting a corpus at a smaller embedding
table (or harmonizing shards tokenized with a superset vocabulary),
and the producer of the OOV-rate signal that vocabulary-coverage
monitoring gates on.

Scale design (10^12 sequences)
------------------------------
* The frequency table is ONE explode → hash aggregate; map-side
  partial combine bounds the shuffle by |vocab| per task, not by token
  occurrences.
* Top-K selection is ``TakeOrderedAndProject`` (per-partition top-K +
  driver merge — no global sort), with the TOTAL order
  ``(count desc, token asc)`` so the boundary is deterministic.
* Only the K kept ids reach the driver (bounded collect, same budget
  discipline as the BPE trainer's word table), packed into a numpy
  bool mask and broadcast. The rewrite is then ONE map-only
  ``mapInPandas`` pass — no join, no shuffle, vectorized membership
  via flat ``np.concatenate`` + mask gather (no per-token Python).
* Everything is exact integer math: the md5-free, count-based top-K is
  layout-independent and bit-reproducible, which is what makes the
  whole operator SQL-oracle-able (DuckDB twin: top-K CTE + one-row
  keep-list cross join + ``list_transform``).

NULL handling: a NULL ``tokens`` array passes through as NULL with
``n_oov = 0``; NULL *elements* are rewritten to ``unk_id`` (they are
out of any vocabulary by definition) and counted in ``n_oov``.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def token_frequencies(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Corpus token-frequency table ``(token, c)`` — one explode + one
    hash aggregate (partial combine map-side)."""
    return (
        df.select(F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def top_vocab(df: DataFrame, k: int, tokens_col: str = "tokens") -> DataFrame:
    """The kept vocabulary: top-``k`` tokens by ``(c desc, token asc)``
    — a deterministic TOTAL order, so the K-boundary never depends on
    layout. Executes as TakeOrderedAndProject (no global sort)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        token_frequencies(df, tokens_col)
        .orderBy(F.desc("c"), F.asc("token"))
        .limit(k)
    )


def vocab_truncate(
    df: DataFrame,
    k: int,
    unk_id: int,
    tokens_col: str = "tokens",
    out_col: Optional[str] = None,
    oov_col: str = "n_oov",
) -> DataFrame:
    """Rewrite ``tokens_col`` so every id outside the corpus top-``k``
    becomes ``unk_id``; append ``oov_col`` (int, per-row count of
    rewritten elements). ``out_col`` defaults to replacing
    ``tokens_col`` in place; all other columns pass through.

    ``unk_id`` is NOT added to the kept set implicitly — if it is
    itself outside the top-K, OOV rows collapse onto it by design
    (document the choice at the call site by passing it explicitly).
    """
    out = out_col or tokens_col
    kept = [r["token"] for r in top_vocab(df, k, tokens_col).collect()]
    kept_ids = np.asarray(
        sorted(t for t in kept if t is not None), dtype=np.int64
    )
    # dense bool mask (O(1) gather) while the id range is sane; sparse
    # sorted-array membership (searchsorted) if an outlier id would
    # blow the mask up — kept ids, not corpus ids, set the size.
    max_id = int(kept_ids.max()) if kept_ids.size else -1
    dense = (
        kept_ids.size > 0 and int(kept_ids[0]) >= 0 and max_id < (1 << 27)
    )
    if dense:
        mask = np.zeros(max_id + 1, dtype=bool)
        mask[kept_ids] = True
        bc = df.sparkSession.sparkContext.broadcast(("dense", mask))
    else:
        bc = df.sparkSession.sparkContext.broadcast(("sorted", kept_ids))

    src = df.schema[tokens_col]
    # ADVICE r5: when out_col overwrites an EXISTING column, the output
    # field must carry the rewritten-array type (src.dataType), not the
    # overwritten column's old type — rewrite() writes token lists.
    fields = [
        f if f.name != out else StructField(out, src.dataType, True)
        for f in df.schema.fields
    ]
    if out not in df.columns:
        fields.append(StructField(out, src.dataType, True))
    fields.append(StructField(oov_col, IntegerType(), True))
    out_schema = StructType(fields)
    col_order = [f.name for f in out_schema.fields]
    # element dtype of the rewritten arrays follows the input schema
    # (int64 for array<bigint>); ids themselves ride a float64 view for
    # the NULL-element NaN trick, exact up to 2^53 — the same integer
    # envelope the witness-proof machinery documents (pruning.py)
    elem_np = (
        np.int64 if src.dataType.elementType.typeName() == "long"
        else np.int32
    )

    def _member(ids: np.ndarray, valid: np.ndarray) -> np.ndarray:
        kind, table = bc.value
        ok = np.zeros(ids.size, dtype=bool)
        if kind == "dense":
            inb = valid & (ids >= 0) & (ids < table.size)
            ok[inb] = table[ids[inb]]
        elif table.size:
            pos = np.searchsorted(table, ids)
            inb = valid & (pos < table.size)
            ok[inb] = table[pos[inb]] == ids[inb]
        return ok

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = pdf[tokens_col].tolist()
            lens = [0 if a is None else len(a) for a in arrs]
            if sum(lens):
                flat = np.concatenate(
                    [
                        np.asarray(a, dtype=np.float64)
                        for a in arrs
                        if a is not None and len(a)
                    ]
                )
                # NULL elements arrive as NaN in the float view — OOV
                valid = ~np.isnan(flat)
                ids = np.zeros(flat.size, dtype=np.int64)
                ids[valid] = flat[valid].astype(np.int64)
                ok = _member(ids, valid)
                new_flat = np.where(ok, ids, np.int64(unk_id)).astype(
                    elem_np
                )
                bounds = np.cumsum(lens)[:-1]
                pieces = np.split(new_flat, bounds)
                oov_flat = ~ok
                oov_pieces = np.split(oov_flat, bounds)
            else:
                pieces = [np.empty(0, dtype=elem_np)] * len(arrs)
                oov_pieces = [np.empty(0, dtype=bool)] * len(arrs)
            new_col, n_oov = [], []
            for a, piece, opiece in zip(arrs, pieces, oov_pieces):
                if a is None:
                    new_col.append(None)
                    n_oov.append(0)
                else:
                    new_col.append(piece.tolist())
                    n_oov.append(int(opiece.sum()))
            res = pdf.copy()
            res[out] = new_col
            res[oov_col] = pd.Series(n_oov, index=pdf.index, dtype="int32")
            yield res[col_order]

    return df.mapInPandas(rewrite, schema=out_schema)


def oov_stats(
    truncated: DataFrame,
    tokens_col: str = "tokens",
    oov_col: str = "n_oov",
    group_cols: Optional[list] = None,
) -> DataFrame:
    """Post-truncation audit (optionally per group): total tokens,
    total OOV, and the OOV rate — one partial+final aggregate over the
    already-rewritten table."""
    # size(NULL) is -1 under spark.sql.legacy.sizeOfNull — gate on
    # isNull explicitly so NULL arrays contribute 0 under either config
    n_tok = F.when(
        F.col(tokens_col).isNull(), F.lit(0)
    ).otherwise(F.size(F.col(tokens_col))).cast("long")
    aggs = [
        F.sum(n_tok).alias("total_tokens"),
        F.sum(F.col(oov_col).cast("long")).alias("total_oov"),
        F.round(
            F.sum(F.col(oov_col).cast("long"))
            / F.greatest(F.sum(n_tok), F.lit(1)),
            6,
        ).alias("oov_rate"),
    ]
    if group_cols:
        return truncated.groupBy(*group_cols).agg(*aggs)
    return truncated.agg(*aggs)

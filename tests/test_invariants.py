"""Token-array-equality invariant + dual-oracle runtime check
(BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators import invariants as IV
from medea_ps_spark.operators import validator as V
from medea_ps_spark.sources import synthetic
from tests.test_validator_spark import baseline_registry


@pytest.fixture(scope="module")
def seq_df(spark):
    df = synthetic.sequences(spark, 5_000, seed=21)
    df.cache().count()
    return df


def test_token_array_equality_udf_matches_expr(spark, seq_df):
    # derive a second column equal on most rows, different on some
    df = seq_df.withColumn(
        "tokens_ref",
        F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0,
            F.slice(F.col("tokens"), 1, 3),
        ).otherwise(F.col("tokens")),
    )
    out = IV.token_array_equality(df, "tokens", "tokens_ref")
    expr_col = IV.token_array_equality_expr("tokens", "tokens_ref")
    both = out.withColumn("expr_eq", expr_col).select("tokens_equal", "expr_eq")
    mismatch = both.where(
        F.col("tokens_equal").eqNullSafe(F.col("expr_eq")) == False  # noqa: E712
    ).count()
    assert mismatch == 0
    n_diff = out.where(~F.col("tokens_equal")).count()
    assert 0 < n_diff < 5_000


def test_engine_verdicts_match_reference_validator(spark, seq_df):
    """Dual-oracle runtime invariant: engine verdict == pandas reference
    on EVERY row (Validator.purs:458-474 pattern, distributed)."""
    compiled = baseline_registry().compile(seq_df.schema)
    validated = V.verdict_only(seq_df, compiled)
    out = IV.vs_reference_verdicts(
        validated,
        engine_verdict_col=V.PASSED_COL,
        reference_fn=IV.reference_token_validator,
        input_cols=["doc_id", "tokens", "n_tok"],
    )
    assert out.where(~F.col("oracle_agrees")).count() == 0

"""Seeded randomized evolution sweep: a chain of random constraint-set
edits (add / remove / parameter-tighten across row- and table-level
kinds), each applied via evolve_checkpointed_validation to the SAME
checkpoint, must at every step produce violation rows and metrics
bit-identical to a from-scratch run of the current set — the same
house pattern as test_parser_fuzz / the salted-twin fuzz."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.runner import (
    evolve_checkpointed_validation,
    run_checkpointed_validation,
)
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    ArrayLenBetween,
    ConstraintSet,
    ElementsInRange,
    FunctionalDependency,
    InRange,
    NotNull,
    ReferentialIn,
    SizeEquals,
    Unique,
)
from medea_ps_spark.sources import synthetic

# name -> list of variants (param edits flip between variants; a name
# being in/out of the set is the add/remove axis)
POOL = {
    "nn_doc": [NotNull("nn_doc", "doc_id")],
    "nn_src": [NotNull("nn_src", "source")],
    "ntok": [
        InRange("ntok", "n_tok", lo=1),
        InRange("ntok", "n_tok", lo=1, hi=256),
        InRange("ntok", "n_tok", lo=64),
    ],
    "len_tokens": [
        ArrayLenBetween("len_tokens", "tokens", 1, None),
        ArrayLenBetween("len_tokens", "tokens", 8, 512),
    ],
    "vocab": [
        ElementsInRange("vocab", "tokens", 0, 50257),
        ElementsInRange("vocab", "tokens", 0, 1000),
    ],
    "size_eq": [SizeEquals("size_eq", "n_tok", "tokens")],
    "uniq": [Unique("uniq", "doc_id")],
    "ref_src": [
        ReferentialIn("ref_src", "source", dim_values=list(synthetic.ALLOWED_SOURCES)),
        ReferentialIn(
            "ref_src", "source", dim_values=list(synthetic.ALLOWED_SOURCES)[:3]
        ),
    ],
    "fd": [
        FunctionalDependency("fd", determinants=("doc_id",), dependent="source"),
        FunctionalDependency("fd", determinants=("source",), dependent="n_tok"),
    ],
}


def _registry(state):
    return Registry().register(
        ConstraintSet(
            "$start", tuple(POOL[k][v] for k, v in sorted(state.items()))
        )
    )


def _mutate(state, rng):
    """One random edit; guaranteed to change the set."""
    while True:
        name = rng.choice(sorted(POOL))
        if name not in state:
            state = dict(state)
            state[name] = rng.randrange(len(POOL[name]))
            return state
        roll = rng.random()
        if roll < 0.4:
            state = dict(state)
            del state[name]
            return state
        if len(POOL[name]) > 1:
            state = dict(state)
            state[name] = (state[name] + 1) % len(POOL[name])
            return state


def _viol_set(spark, ck):
    return {
        tuple(r)
        for r in spark.read.parquet(os.path.join(ck, "out", "*", "violations"))
        .select("doc_id", "constraint_id", "observed")
        .collect()
    }


@pytest.fixture(scope="module")
def fuzz_table(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("evofuzz") / "sequences")
    keep = list(synthetic.ALLOWED_SOURCES)[:4]
    (
        synthetic.sequences(spark, 3_000, seed=33)
        .where(F.col("source").isin(keep))
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(p)
    )
    return p


@pytest.mark.parametrize("metrics_only", [False, True])
def test_random_edit_chain_matches_scratch(
    spark, fuzz_table, tmp_path, metrics_only
):
    rng = random.Random(4242 + metrics_only)
    state = {"nn_doc": 0, "ntok": 0, "uniq": 0}
    ck = str(tmp_path / f"ck_{metrics_only}")
    run_checkpointed_validation(
        spark, fuzz_table, _registry(state), ck, metrics_only=metrics_only
    )
    for step in range(5):
        state = _mutate(state, rng)
        out = evolve_checkpointed_validation(
            spark, fuzz_table, _registry(state), ck, metrics_only=metrics_only
        )
        assert out["delta"] is not None, f"step {step}: no delta computed"
        assert out["reprocessed"] == {}, f"step {step}: fell back to full"
        scratch_ck = str(tmp_path / f"s_{metrics_only}_{step}")
        scratch = run_checkpointed_validation(
            spark, fuzz_table, _registry(state), scratch_ck,
            metrics_only=metrics_only,
        )
        assert out["upgraded"] == scratch, f"step {step}: metrics diverged"
        if not metrics_only:
            assert _viol_set(spark, ck) == _viol_set(spark, scratch_ck), (
                f"step {step}: violation rows diverged (state={state})"
            )

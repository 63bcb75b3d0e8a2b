"""Witness stats + constraint provability (operators/pruning.py):
collection semantics, the prove truth table (incl. NULL/NaN edges),
a seeded soundness fuzz vs the real validator, and the evolve
fast paths (proven additions upgrade partitions with zero data scans).
"""

from __future__ import annotations

import json
import math
import os
import random

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from medea_ps_spark.operators import pruning as PR
from medea_ps_spark.operators import validator as V
from medea_ps_spark.operators.checkpoint import MANIFEST_NAME, Manifest
from medea_ps_spark.operators.runner import (
    evolve_checkpointed_validation,
    run_checkpointed_validation,
)
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ArrayLenBetween,
    ConstraintSet,
    ElementsInRange,
    ElementsSatisfy,
    Expr,
    InRange,
    IsIn,
    Matches,
    NotNull,
    Ref,
    SizeEquals,
    TypeIs,
    Unique,
    When,
)
from medea_ps_spark.sources import synthetic


def _reg(*constraints, extra_sets=()):
    r = Registry().register(ConstraintSet("$start", tuple(constraints)))
    for cs in extra_sets:
        r.register(cs)
    return r


@pytest.fixture(scope="module")
def wdf(spark):
    """Small frame with every edge the witnesses must handle: NULL
    scalars, NULL arrays, empty arrays, NULL elements, an all-null
    column, and one SizeEquals mismatch."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("dead", T.IntegerType()),
        ]
    )
    rows = [
        ("a", [1, 2, 3], 3, "web", None),
        ("b", [5, None, 9], 3, "web", None),  # null element skipped
        ("c", [], 0, "books", None),  # empty array
        ("d", None, None, "books", None),  # null array + null n_tok
        ("e", [7], 2, "web", None),  # SizeEquals violation (2 != 1)
        (None, [4], 1, "web", None),  # null doc_id
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def wit(wdf):
    return PR.collect_witnesses(wdf, distinct_columns=["source"])


def test_witness_values(wit):
    assert wit["n_rows"] == 6
    assert wit["nullcnt.doc_id"] == 1
    assert wit["nullcnt.tokens"] == 1
    assert wit["nullcnt.n_tok"] == 1
    assert wit["nullcnt.dead"] == 6
    assert wit["min.n_tok"] == 0.0 and wit["max.n_tok"] == 3.0
    # sizes over non-null arrays only: 3, 3, 0, 1, 1
    assert wit["sizemin.tokens"] == 0.0 and wit["sizemax.tokens"] == 3.0
    # element min/max skip NULL elements and empty/null arrays
    assert wit["elemmin.tokens"] == 1.0 and wit["elemmax.tokens"] == 9.0
    # indicator witness: row "e" has n_tok=2 vs size=1
    assert wit["sizeeq.n_tok.tokens"] == 1.0
    # all-null int column: min/max vacuous
    assert wit["min.dead"] is None and wit["max.dead"] is None
    assert wit["distinct.source"] == ["books", "web"]


def test_witnesses_json_roundtrip(wit):
    back = json.loads(json.dumps(wit))
    assert back == wit


def test_prove_ranges(wit):
    assert PR.prove_zero_violations(InRange("c", "n_tok", 0, 3), wit)
    assert PR.prove_zero_violations(InRange("c", "n_tok", lo=0), wit)
    assert PR.prove_zero_violations(InRange("c", "n_tok", hi=3), wit)
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 1, 3), wit)
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 0, 2), wit)
    # all-null column: vacuously proven for any bound
    assert PR.prove_zero_violations(InRange("c", "dead", 5, 6), wit)
    assert PR.prove_zero_violations(ArrayLenBetween("c", "tokens", 0, 3), wit)
    assert not PR.prove_zero_violations(ArrayLenBetween("c", "tokens", 1, 3), wit)
    # upper bound of ElementsInRange is EXCLUSIVE
    assert PR.prove_zero_violations(ElementsInRange("c", "tokens", 0, 10), wit)
    assert not PR.prove_zero_violations(ElementsInRange("c", "tokens", 0, 9), wit)
    assert not PR.prove_zero_violations(ElementsInRange("c", "tokens", 2, 10), wit)


def test_prove_notnull_sizeeq_isin_typeis(wit):
    assert not PR.prove_zero_violations(NotNull("c", "doc_id"), wit)
    assert PR.prove_zero_violations(NotNull("c", "source"), wit)
    assert not PR.prove_zero_violations(SizeEquals("c", "n_tok", "tokens"), wit)
    assert PR.prove_zero_violations(TypeIs("c", "n_tok", types=("int",)), wit)
    assert PR.prove_zero_violations(
        IsIn("c", "source", values=("web", "books", "code")), wit
    )
    assert not PR.prove_zero_violations(IsIn("c", "source", values=("web",)), wit)
    # non-string allowed values are ignored (conservative — proving
    # from the string subset only permits FEWER values, never more)
    assert PR.prove_zero_violations(
        IsIn("c", "source", values=("web", 7, "books")), wit
    )
    assert not PR.prove_zero_violations(
        IsIn("c", "source", values=(7, "books")), wit
    )
    # no distinct witness collected for doc_id
    assert not PR.prove_zero_violations(IsIn("c", "doc_id", values=("a",)), wit)


def test_prove_sizeeq_vacuous_and_zero(spark):
    df = spark.createDataFrame(
        [Row(n=None, a=[1, 2]), Row(n=3, a=None)],
        schema="n int, a array<int>",
    )
    w = PR.collect_witnesses(df)
    # no row has both sides non-null → vacuously proven
    assert PR.prove_zero_violations(SizeEquals("c", "n", "a"), w)
    df2 = spark.createDataFrame(
        [Row(n=2, a=[1, 2])], schema="n int, a array<int>"
    )
    assert PR.prove_zero_violations(
        SizeEquals("c", "n", "a"), PR.collect_witnesses(df2)
    )


def test_prove_nested(wit):
    reg = _reg(
        NotNull("nn", "source"),
        extra_sets=(
            ConstraintSet("ok_set", (InRange("r", "n_tok", 0, 3),)),
            ConstraintSet("bad_set", (NotNull("r2", "doc_id"),)),
        ),
    )
    assert PR.prove_zero_violations(Ref("c", target="ok_set"), wit, reg)
    assert not PR.prove_zero_violations(Ref("c", target="bad_set"), wit, reg)
    assert not PR.prove_zero_violations(Ref("c", target="ok_set"), wit, None)
    assert PR.prove_zero_violations(
        AnyOf("c", branches=(NotNull("x", "doc_id"), InRange("y", "n_tok", 0, 3))),
        wit,
    )
    assert not PR.prove_zero_violations(
        AnyOf("c", branches=(NotNull("x", "doc_id"), Matches("m", "source", "w.*"))),
        wit,
    )
    assert PR.prove_zero_violations(
        When("c", condition_sql="source = 'web'", inner=InRange("y", "n_tok", 0, 3)),
        wit,
    )
    assert not PR.prove_zero_violations(
        When("c", condition_sql="source = 'web'", inner=NotNull("y", "doc_id")),
        wit,
    )


def test_prove_unknown_kinds_and_poison(wit):
    for c in (
        Matches("c", "source", ".*"),
        ElementsSatisfy("c", "tokens", predicate_sql="x >= 0"),
        Expr("c", sql="true"),
        Unique("c", "doc_id"),
    ):
        assert not PR.prove_zero_violations(c, wit)
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 0, 3), None)
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 0, 3), {})
    # NaN witnesses poison the proof (Spark orders NaN above everything)
    w = dict(wit)
    w["max.n_tok"] = float("nan")
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 0, 3), w)
    # beyond 2^53 the double witness may have rounded past the truth
    w2 = dict(wit)
    w2["max.n_tok"] = 2.0**60
    assert not PR.prove_zero_violations(InRange("c", "n_tok", 0, 2.0**61), w2)


def test_two_pow_53_boundary_refused(wit, spark):
    # a true bigint max of 2^53+1 rounds (ties-to-even) to EXACTLY 2^53
    # in the double witness, so a stored 2^53 can mask a larger true
    # value — the guard must be inclusive (refuse |v| >= 2^53), else
    # InRange(lo, 2^53) would be falsely proven on that partition
    w = dict(wit)
    w["min.n_tok"] = 0.0
    w["max.n_tok"] = 2.0**53
    assert not PR.prove_zero_violations(
        InRange("c", "n_tok", 0, 2**53), w
    )
    # end-to-end: plant the adversarial value and check the round trip
    df = spark.createDataFrame(
        [Row(x=0), Row(x=2**53 + 1)], schema="x bigint"
    )
    w2 = PR.collect_witnesses(df)
    assert w2["max.x"] == 2.0**53  # the rounding actually happens
    c = InRange("c", "x", 0, 2**53)
    assert not PR.prove_zero_violations(c, w2)
    compiled = _reg(c).compile(df.schema)
    n_bad = V.validate(df, compiled).where(~F.col(V.PASSED_COL)).count()
    assert n_bad == 1  # the row the false proof would have hidden
    # just below the boundary the witness is exact and still proves
    df3 = spark.createDataFrame(
        [Row(x=0), Row(x=2**53 - 1)], schema="x bigint"
    )
    assert PR.prove_zero_violations(
        InRange("c", "x", 0, 2**53 - 1), PR.collect_witnesses(df3)
    )


def test_nan_column_not_proven_and_sound(spark):
    df = spark.createDataFrame(
        [Row(x=1.0), Row(x=float("nan"))], schema="x double"
    )
    w = PR.collect_witnesses(df)
    c = InRange("c", "x", 0.0, 100.0)
    assert not PR.prove_zero_violations(c, w)
    # and indeed the validator flags the NaN row (NaN > hi in Spark)
    reg = _reg(c)
    compiled = reg.compile(df.schema)
    n_bad = V.validate(df, compiled).where(~F.col(V.PASSED_COL)).count()
    assert n_bad == 1


def test_soundness_fuzz(spark):
    """Whenever prove says True, the real validator must count zero
    violations — over randomized frames and randomized rules."""
    rng = random.Random(7)
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    proven_hits = 0
    for trial in range(12):
        rows = []
        for i in range(rng.randrange(0, 40)):
            toks = (
                None
                if rng.random() < 0.1
                else [
                    rng.randrange(-5, 200) if rng.random() > 0.05 else None
                    for _ in range(rng.randrange(0, 6))
                ]
            )
            n_tok = (
                None
                if rng.random() < 0.1
                else (
                    len(toks)
                    if toks is not None and rng.random() < 0.7
                    else rng.randrange(-2, 8)
                )
            )
            rows.append(
                (
                    None if rng.random() < 0.1 else f"d{i}",
                    toks,
                    n_tok,
                    rng.choice(["web", "books", None]),
                )
            )
        df = spark.createDataFrame(rows, schema=schema)
        w = PR.collect_witnesses(df, distinct_columns=["source"])
        pool = [
            NotNull("c", "doc_id"),
            NotNull("c", "source"),
            InRange("c", "n_tok", rng.randrange(-3, 2), rng.randrange(2, 9)),
            ArrayLenBetween("c", "tokens", 0, rng.randrange(1, 7)),
            ElementsInRange("c", "tokens", rng.randrange(-6, 1), rng.randrange(1, 250)),
            SizeEquals("c", "n_tok", "tokens"),
            IsIn("c", "source", values=("web", "books")),
            IsIn("c", "source", values=("web",)),
        ]
        for c in pool:
            if not PR.prove_zero_violations(c, w):
                continue
            proven_hits += 1
            compiled = _reg(c).compile(df.schema)
            entries = [
                F.when(~rc.predicate, F.lit(1)) for rc in compiled.row_constraints
            ]
            bad = df.where(entries[0].isNotNull()).count()
            assert bad == 0, f"UNSOUND proof: trial={trial} c={c}"
    assert proven_hits > 5  # the fuzz actually exercised the prover


# -- evolve fast paths ---------------------------------------------------------

BASE = lambda: _reg(
    NotNull("nn_doc", "doc_id"),
    SizeEquals("sz", "n_tok", "tokens"),
    Unique("uniq_doc", "doc_id"),
)
# + one PROVABLE addition (synthetic n_tok always within these bounds)
PLUS_PROVEN = lambda: _reg(
    NotNull("nn_doc", "doc_id"),
    SizeEquals("sz", "n_tok", "tokens"),
    Unique("uniq_doc", "doc_id"),
    InRange("ntok_sane", "n_tok", -1_000_000, 1_000_000_000),
)
# + one provable and one UNPROVABLE (regex) addition
PLUS_MIXED = lambda: _reg(
    NotNull("nn_doc", "doc_id"),
    SizeEquals("sz", "n_tok", "tokens"),
    Unique("uniq_doc", "doc_id"),
    InRange("ntok_sane", "n_tok", -1_000_000, 1_000_000_000),
    Matches("docid_shape", "doc_id", "^.*$"),
)


@pytest.fixture(scope="module")
def ptable(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("prune") / "sequences")
    synthetic.sequences(spark, 3_000, seed=33).write.mode("overwrite").partitionBy(
        "source"
    ).parquet(p)
    return p


def _viols(spark, ck):
    return {
        tuple(r)
        for r in spark.read.parquet(os.path.join(ck, "out", "*", "violations"))
        .select("doc_id", "constraint_id", "observed")
        .collect()
    }


def test_evolve_proven_add_zero_scans(spark, ptable, tmp_path, monkeypatch):
    ck = str(tmp_path / "ck")
    r1 = run_checkpointed_validation(spark, ptable, BASE(), ck)
    assert len(r1) > 2
    for m in r1.values():
        assert "witnesses" in m  # default-on collection

    # the proven path must never touch partition data: every
    # data-reading helper in the upgrade trips this tripwire
    import medea_ps_spark.operators.runner as R

    def boom(*a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("data scan on a fully-proven delta")

    monkeypatch.setattr(R.V, "validate", boom)
    monkeypatch.setattr(R.V, "all_violations", boom)
    monkeypatch.setattr(R.V, "sampled_violations", boom)
    out = evolve_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck)
    monkeypatch.undo()

    assert out["delta"]["added"] == ["ntok_sane"]
    assert sorted(out["upgraded"]) == sorted(r1)
    assert out["reprocessed"] == {}
    assert sorted(out["proven"]) == sorted(r1)
    assert all(v == ["ntok_sane"] for v in out["proven"].values())

    # equivalent to a from-scratch run under the new rules
    ck_new = str(tmp_path / "ck_new")
    scratch = run_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck_new)
    assert out["upgraded"] == scratch
    assert _viols(spark, ck) == _viols(spark, ck_new)

    # manifest flipped to the new fingerprint; idempotent re-evolve
    with open(os.path.join(ck, MANIFEST_NAME)) as fh:
        man = Manifest.from_json(fh.read())
    assert "ntok_sane" in man.constraint_fps
    again = evolve_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck)
    assert again["upgraded"] == {} and again["reprocessed"] == {}


def test_evolve_mixed_runs_only_unproven(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_mix")
    run_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck)
    out = evolve_checkpointed_validation(spark, ptable, PLUS_MIXED(), ck)
    assert out["delta"]["added"] == ["docid_shape"]
    # the regex addition is not provable → no proven entries
    assert out["proven"] == {}
    ck_new = str(tmp_path / "ck_mix_new")
    scratch = run_checkpointed_validation(spark, ptable, PLUS_MIXED(), ck_new)
    assert out["upgraded"] == scratch
    assert _viols(spark, ck) == _viols(spark, ck_new)


def test_evolve_mixed_additions_from_base(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_mix2")
    run_checkpointed_validation(spark, ptable, BASE(), ck)
    out = evolve_checkpointed_validation(spark, ptable, PLUS_MIXED(), ck)
    assert sorted(out["delta"]["added"]) == ["docid_shape", "ntok_sane"]
    # only the provable one is skipped; the regex re-runs
    assert all(v == ["ntok_sane"] for v in out["proven"].values())
    ck_new = str(tmp_path / "ck_mix2_new")
    scratch = run_checkpointed_validation(spark, ptable, PLUS_MIXED(), ck_new)
    assert out["upgraded"] == scratch
    assert _viols(spark, ck) == _viols(spark, ck_new)


def test_evolve_without_witnesses_falls_back(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_now")
    r1 = run_checkpointed_validation(
        spark, ptable, BASE(), ck, store_witnesses=False
    )
    for m in r1.values():
        assert "witnesses" not in m
    out = evolve_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck, store_witnesses=False
    )
    assert out["proven"] == {}
    assert sorted(out["upgraded"]) == sorted(r1)
    ck_new = str(tmp_path / "ck_now_new")
    scratch = run_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck_new, store_witnesses=False
    )
    assert out["upgraded"] == scratch


def test_evolve_proven_sampled_sink(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_s")
    run_checkpointed_validation(
        spark, ptable, BASE(), ck, violation_limit=5
    )
    out = evolve_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck, violation_limit=5
    )
    assert sorted(out["proven"]) == sorted(out["upgraded"])
    ck_new = str(tmp_path / "ck_s_new")
    scratch = run_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck_new, violation_limit=5
    )
    assert out["upgraded"] == scratch


def test_evolve_proven_metrics_sink(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_m")
    run_checkpointed_validation(spark, ptable, BASE(), ck, metrics_only=True)
    out = evolve_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck, metrics_only=True
    )
    assert sorted(out["proven"]) == sorted(out["upgraded"])
    ck_new = str(tmp_path / "ck_m_new")
    scratch = run_checkpointed_validation(
        spark, ptable, PLUS_PROVEN(), ck_new, metrics_only=True
    )
    assert out["upgraded"] == scratch


def test_evolve_isin_proof_via_distinct_witness(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_isin")
    run_checkpointed_validation(
        spark, ptable, BASE(), ck, witness_distinct_columns=["source"]
    )
    # every source value the table can contain (synthetic draws from
    # ALLOWED_SOURCES plus the injected bad-source literal)
    values = tuple(synthetic.ALLOWED_SOURCES) + ("mystery-src",)
    plus = _reg(
        NotNull("nn_doc", "doc_id"),
        SizeEquals("sz", "n_tok", "tokens"),
        Unique("uniq_doc", "doc_id"),
        IsIn("src_enum", "source", values=values),
    )
    out = evolve_checkpointed_validation(spark, ptable, plus, ck)
    # each partition dir holds ONE source value → always within the cap
    assert sorted(out["proven"]) == sorted(out["upgraded"])
    assert all(v == ["src_enum"] for v in out["proven"].values())
    ck_new = str(tmp_path / "ck_isin_new")
    scratch = run_checkpointed_validation(
        spark, ptable, plus, ck_new, witness_distinct_columns=["source"]
    )
    assert {p: m["n_failed"] for p, m in out["upgraded"].items()} == {
        p: m["n_failed"] for p, m in scratch.items()
    }
    assert _viols(spark, ck) == _viols(spark, ck_new)


def test_witness_backfill_is_opt_in(spark, ptable, tmp_path):
    ck = str(tmp_path / "ck_bf")
    run_checkpointed_validation(
        spark, ptable, BASE(), ck, store_witnesses=False
    )
    # a PLAIN resume of a pre-witness checkpoint must stay a
    # metadata-only no-op — backfilling would full-scan every completed
    # partition (at 10^12 rows that is a surprise read of the whole
    # table), so it never happens implicitly
    res = run_checkpointed_validation(spark, ptable, BASE(), ck)
    assert res == {}
    with open(os.path.join(ck, MANIFEST_NAME)) as fh:
        man = Manifest.from_json(fh.read())
    assert man.entries and all(
        "witnesses" not in e.metrics for e in man.entries.values()
    )
    # the explicit opt-in performs the scans and stores the witnesses
    res = run_checkpointed_validation(
        spark, ptable, BASE(), ck, backfill_witnesses=True
    )
    assert res == {}
    with open(os.path.join(ck, MANIFEST_NAME)) as fh:
        man = Manifest.from_json(fh.read())
    assert man.entries and all(
        "witnesses" in e.metrics for e in man.entries.values()
    )
    # and a subsequent evolve can use them
    out = evolve_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck)
    assert sorted(out["proven"]) == sorted(out["upgraded"])


def test_evolve_invalid_edit_raises_at_compile(spark, ptable, tmp_path):
    """A fully-proven delta never reruns any partition — but an INVALID
    edit must still fail exactly like a from-scratch run, so evolve
    compiles the new set against the table schema up front (a TypeIs is
    'proven' statically only because compile vouches for it)."""
    from medea_ps_spark import errors as E

    ck = str(tmp_path / "ck_bad")
    run_checkpointed_validation(spark, ptable, BASE(), ck)
    bad_type = _reg(
        NotNull("nn_doc", "doc_id"),
        SizeEquals("sz", "n_tok", "tokens"),
        Unique("uniq_doc", "doc_id"),
        TypeIs("ntok_str", "n_tok", types=("string",)),
    )
    with pytest.raises(E.ColumnTypeMismatch):
        evolve_checkpointed_validation(spark, ptable, bad_type, ck)
    bad_col = _reg(
        NotNull("nn_doc", "doc_id"),
        SizeEquals("sz", "n_tok", "tokens"),
        Unique("uniq_doc", "doc_id"),
        TypeIs("ghost", "no_such_column", types=("int",)),
    )
    with pytest.raises(E.UnknownColumn):
        evolve_checkpointed_validation(spark, ptable, bad_col, ck)
    # the failed attempts changed nothing: the old set still resumes
    # as a no-op and a valid evolve still works
    assert run_checkpointed_validation(spark, ptable, BASE(), ck) == {}
    out = evolve_checkpointed_validation(spark, ptable, PLUS_PROVEN(), ck)
    assert sorted(out["proven"]) == sorted(out["upgraded"])


def test_array_size_predicates_config_independent(spark):
    """NULL arrays pass ArrayLenBetween/SizeEquals/TupleRule under BOTH
    sizeOfNull configs (the predicates null-guard F.size), so the
    witness prover's NULL-exempt semantics are sound even under
    spark.sql.legacy.sizeOfNull=true, where raw size(NULL) is -1."""
    from medea_ps_spark.plans.constraints import TupleRule

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [("a", [1, 2], 2), ("b", None, None), ("c", None, 3)], schema
    )
    reg = _reg(
        ArrayLenBetween("len", "tokens", 0, 5),
        SizeEquals("sz", "n_tok", "tokens"),
        TupleRule("tup", "tokens", positions=("true", "true")),
    )
    old = spark.conf.get("spark.sql.legacy.sizeOfNull", "false")
    try:
        for legacy in ("false", "true"):
            spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
            compiled = reg.compile(df.schema)
            viols = (
                V.all_violations(df, compiled, id_column="doc_id")
                .select("doc_id", "constraint_id")
                .collect()
            )
            # row c fails SizeEquals via the witness row (3 != size is
            # unknowable: NULL array ⇒ NULL pred ⇒ pass); NULL arrays
            # never violate the array constraints on either config
            assert viols == [], f"legacy={legacy}: {viols}"
            w = PR.collect_witnesses(df)
            assert w["sizemin.tokens"] == 2.0 and w["sizemax.tokens"] == 2.0
            assert PR.prove_zero_violations(
                ArrayLenBetween("len2", "tokens", 0, 5), w
            )
    finally:
        spark.conf.set("spark.sql.legacy.sizeOfNull", old)

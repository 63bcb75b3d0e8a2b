"""Property-based tests (hypothesis ≙ the reference's QuickCheck layer,
test/validator-quickCheck/Validator.purs): random rows × random
constraint parameters, engine verdicts vs an independent Python oracle.
Settings are deterministic (derandomize) and example counts small —
each example pays a Spark round trip."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medea_ps_spark.operators import validator as V
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ArrayLenBetween,
    ConstraintSet,
    ElementsInRange,
    InRange,
    IsIn,
    NotNull,
    SizeEquals,
)

ROW = st.tuples(
    st.one_of(st.none(), st.text(alphabet="abcdef", min_size=1, max_size=8)),
    st.one_of(
        st.none(),
        st.lists(st.integers(min_value=-5, max_value=30), max_size=6),
    ),
    st.one_of(st.none(), st.integers(min_value=-2, max_value=10)),
    st.sampled_from(["books", "web", "junk", None]),
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def oracle_row(row, lo, hi, vocab_hi, enum):
    doc_id, tokens, n_tok, source = row
    ok = {}
    ok["nn"] = doc_id is not None
    ok["size"] = (
        True
        if n_tok is None or tokens is None
        else n_tok == len(tokens)
    )
    # SQL CHECK semantics: NULL passes non-NotNull constraints
    ok["range"] = True if n_tok is None else (lo <= n_tok <= hi)
    ok["elems"] = True if tokens is None else all(0 <= t < vocab_hi for t in tokens)
    ok["len"] = True if tokens is None else len(tokens) >= 1
    ok["enum"] = True if source is None else source in enum
    return ok


@given(
    rows=st.lists(ROW, min_size=1, max_size=25),
    lo=st.integers(min_value=-1, max_value=3),
    span=st.integers(min_value=0, max_value=8),
    vocab_hi=st.integers(min_value=1, max_value=25),
    enum=st.sets(st.sampled_from(["books", "web", "junk"]), min_size=1),
)
@SETTINGS
def test_engine_matches_oracle(spark, rows, lo, span, vocab_hi, enum):
    hi = lo + span
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                NotNull("nn", "doc_id"),
                SizeEquals("size", "n_tok", "tokens"),
                InRange("range", "n_tok", lo, hi),
                ElementsInRange("elems", "tokens", 0, vocab_hi),
                ArrayLenBetween("len", "tokens", 1, None),
                IsIn("enum", "source", sorted(enum)),
            ],
        )
    )
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    compiled = reg.compile(df.schema)
    got = V.validate(df, compiled).collect()
    assert len(got) == len(rows)
    # compare per-constraint violation sets row by row (order preserved
    # only within identical rows, so compare as multisets of outcomes)
    def key(row):
        return (row[0], tuple(row[1]) if row[1] is not None else None, row[2], row[3])

    from collections import Counter

    want = Counter()
    for row in rows:
        ok = oracle_row(row, lo, hi, vocab_hi, enum)
        want[(key(row), frozenset(k for k, v in ok.items() if not v))] += 1
    got_c = Counter()
    for r in got:
        ids = frozenset(v["constraint_id"] for v in r["violations"])
        got_c[(key((r["doc_id"], r["tokens"], r["n_tok"], r["source"])), ids)] += 1
    assert got_c == want


@given(
    rows=st.lists(ROW, min_size=1, max_size=15),
    lo=st.integers(min_value=0, max_value=3),
)
@SETTINGS
def test_anyof_is_or_of_branches(spark, rows, lo):
    reg = Registry()
    reg.register(
        ConstraintSet(
            "$start",
            [
                AnyOf(
                    "sum",
                    branches=(
                        InRange("a", "n_tok", lo, lo + 2),
                        IsIn("b", "source", ["books"]),
                    ),
                )
            ],
        )
    )
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    got = V.validate(df, reg.compile(df.schema)).collect()
    from collections import Counter

    def key(doc_id, tokens, n_tok, source):
        return (doc_id, tuple(tokens) if tokens is not None else None, n_tok, source)

    def orc(row):
        _, _, n_tok, source = row
        a = True if n_tok is None else (lo <= n_tok <= lo + 2)
        b = True if source is None else source == "books"
        return a or b

    want = Counter((key(*row), orc(row)) for row in rows)
    got_c = Counter(
        (key(r["doc_id"], r["tokens"], r["n_tok"], r["source"]), r["passed"])
        for r in got
    )
    assert got_c == want

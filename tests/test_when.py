"""When (conditional scope) row constraint + `where` scopes on
table-level constraints: condition FALSE/NULL exempts rows, inner
null-tolerance is preserved, Ref/nested-When inners inline, serde
fingerprint round-trips, evolution fingerprints see through When, and
the count fast paths agree with the exploded violation rows — all vs an
in-test DuckDB oracle on the main case.

No reference counterpart (Medea schemas are unconditional,
/root/reference/src/Data/Medea.purs:146-162 applies every check to every
document) — this is the north-rule generalization 'rows from source X
must additionally satisfy Y'.
"""

from __future__ import annotations

import duckdb
import pytest

from medea_ps_spark import errors as E
from medea_ps_spark.plans.compiler import Registry, fingerprint_set
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ConstraintSet,
    FunctionalDependency,
    InRange,
    IsIn,
    Matches,
    NotNull,
    Ref,
    ReferentialIn,
    Unique,
    When,
)
from medea_ps_spark.plans.evolution import constraint_fingerprints
from medea_ps_spark.plans.serde import (
    constraint_from_dict,
    constraint_to_dict,
    registry_from_json,
    registry_to_json,
)
from medea_ps_spark.operators import validator as V


ROWS = [
    # (doc_id, lang, n, src)
    ("a", "zh", 200, "s1"),   # zh & 200 > 150 → zh_short violation
    ("b", "zh", 100, "s1"),   # zh but inside range → pass
    ("c", "en", 500, "s1"),   # condition false → exempt
    ("d", None, 999, "s2"),   # condition NULL → exempt
    ("e", "zh", None, "s2"),  # condition true, inner NULL-tolerant → pass
    ("a", "en", 5, None),     # dup doc_id but src NULL (out of uniq scope)
]
SCHEMA = "doc_id string, lang string, n int, src string"


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _compile(frame, constraints):
    reg = Registry()
    reg.register(ConstraintSet("$start", list(constraints)))
    return reg, reg.compile(frame.schema)


def test_when_row_semantics_vs_duckdb(frame):
    _, comp = _compile(
        frame, [When("zh_short", "lang = 'zh'", InRange("_i", "n", None, 150))]
    )
    got = sorted(
        (r.doc_id, r.constraint_id, r.observed)
        for r in V.all_violations(frame, comp).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id VARCHAR, lang VARCHAR, n INT, src VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", ROWS)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT doc_id, 'zh_short', CAST(n AS VARCHAR) FROM t "
            "WHERE coalesce(lang = 'zh', FALSE) "
            "AND NOT coalesce(n <= 150, TRUE)"
        ).fetchall()
    )
    assert got == want == [("a", "zh_short", "200")]


def test_when_notnull_inner_is_strict(frame):
    # NotNull inner keeps its strictness INSIDE the scope: zh row with
    # NULL n violates; en/NULL-lang rows with NULL n are exempt.
    _, comp = _compile(frame, [When("zh_has_n", "lang = 'zh'", NotNull("_i", "n"))])
    got = sorted(r.doc_id for r in V.all_violations(frame, comp).collect())
    assert got == ["e"]


def test_when_ref_inner_and_nesting(spark, frame):
    reg = Registry()
    reg.register(ConstraintSet("zh_rules", [InRange("r1", "n", None, 150)]))
    reg.register(
        ConstraintSet(
            "$start",
            [
                When("zh_all", "lang = 'zh'", Ref("_r", "zh_rules")),
                When(
                    "nested",
                    "src = 's1'",
                    When("_w", "lang = 'en'", Matches("_m", "doc_id", "^[ab]$")),
                ),
            ],
        )
    )
    comp = reg.compile(frame.schema)
    got = sorted(
        (r.doc_id, r.constraint_id)
        for r in V.all_violations(frame, comp).collect()
    )
    # zh_all: only doc a (200>150). nested: s1 AND en rows = {c}; 'c' not
    # in ^[ab]$ → violation. (last row has src NULL → exempt outer.)
    assert got == [("a", "zh_all"), ("c", "nested")]


def test_when_inside_anyof_branch(frame):
    # AnyOf(When(...), IsIn(...)): branch passes whenever scope doesn't bite
    _, comp = _compile(
        frame,
        [
            AnyOf(
                "either",
                branches=(
                    When("_w", "lang = 'zh'", InRange("_i", "n", None, 150)),
                    IsIn("_l", "lang", ["en"]),
                ),
            )
        ],
    )
    got = sorted(r.doc_id for r in V.all_violations(frame, comp).collect())
    assert got == ["a"]  # zh+200 fails branch 1, lang zh fails branch 2


def test_when_compile_errors(frame):
    with pytest.raises(E.SchemaError):
        _compile(frame, [When("w", "", InRange("_i", "n", None, 1))])
    with pytest.raises(E.SchemaError):
        _compile(frame, [When("w", "lang = 'zh'", None)])
    with pytest.raises(E.SchemaError):
        _compile(frame, [When("w", "lang = 'zh'", Unique("_u", "doc_id"))])
    with pytest.raises(E.UnknownColumn):
        _compile(frame, [When("w", "lang = 'zh'", NotNull("_i", "nope"))])


def test_scoped_unique_fd_referential(frame):
    reg, comp = _compile(
        frame,
        [
            Unique("uniq_s1", "doc_id", where="src = 's1'"),
            FunctionalDependency(
                "fd_scoped", determinants=("doc_id",), dependent="lang",
                where="n > 50",
            ),
            ReferentialIn(
                "src_known", "src", dim_values=("s1",), where="lang = 'en'"
            ),
        ],
    )
    rows = sorted(
        (r.doc_id, r.constraint_id, r.observed)
        for r in V.all_violations(frame, comp).collect()
    )
    # uniq: dup 'a' row has src NULL → out of scope → no violation.
    # fd: second 'a' row (n=5) out of scope → doc_id a maps only to zh.
    # referential: en rows are {c (s1 ok), a2 (src NULL → violation)}.
    assert rows == [("a", "src_known", "null")]
    uniq_c, fd_c, ref_c = comp.table_constraints
    assert V.unique_violation_count(frame, uniq_c) == 0
    assert V.fd_violation_count(frame, fd_c) == 0
    assert V.referential_violation_count(frame, ref_c) == 1


def test_scoped_unique_catches_in_scope_dup(spark):
    df = spark.createDataFrame(
        [("x", "en", 1, "s1"), ("x", "zh", 2, "s1"), ("y", "en", 3, "s2")],
        SCHEMA,
    )
    _, comp = _compile(df, [Unique("u", "doc_id", where="src = 's1'")])
    c = comp.table_constraints[0]
    assert V.unique_violations(df, c).count() == 2
    assert V.unique_violation_count(df, c) == 2
    # unscoped twin sees the same dups here plus nothing extra
    _, comp2 = _compile(df, [Unique("u", "doc_id")])
    assert V.unique_violation_count(df, comp2.table_constraints[0]) == 2


def test_serde_and_fingerprints_roundtrip(frame):
    w = When("zh_short", "lang = 'zh'", InRange("_i", "n", None, 150))
    assert constraint_from_dict(constraint_to_dict(w)) == w
    u = Unique("u", "doc_id", where="src = 's1'")
    assert constraint_from_dict(constraint_to_dict(u)) == u

    reg, _ = _compile(frame, [w, u])
    reg2 = registry_from_json(registry_to_json(reg))
    assert fingerprint_set(reg, "$start") == fingerprint_set(reg2, "$start")
    # `where` is part of the canonical encoding → different fingerprint
    reg3, _ = _compile(frame, [w, Unique("u", "doc_id", where="src = 's2'")])
    assert fingerprint_set(reg, "$start") != fingerprint_set(reg3, "$start")


def test_evolution_sees_through_when(frame):
    """Editing a set reached only through When(Ref(...)) must change that
    top-level constraint's fingerprint and no other's."""

    def build(hi):
        reg = Registry()
        reg.register(ConstraintSet("zh_rules", [InRange("r1", "n", None, hi)]))
        reg.register(
            ConstraintSet(
                "$start",
                [
                    When("zh_all", "lang = 'zh'", Ref("_r", "zh_rules")),
                    NotNull("id_nn", "doc_id"),
                ],
            )
        )
        return reg

    a = constraint_fingerprints(build(150), "$start")
    b = constraint_fingerprints(build(99), "$start")
    assert a["zh_all"]["fp"] != b["zh_all"]["fp"]
    assert a["id_nn"]["fp"] == b["id_nn"]["fp"]

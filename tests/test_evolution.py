"""Constraint-set evolution: per-constraint fingerprints/deltas,
selective re-validation of completed partitions (rows + metrics sinks),
and equivalence with a from-scratch run under the new rules."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.checkpoint import MANIFEST_NAME, Manifest
from medea_ps_spark.operators.runner import (
    evolve_checkpointed_validation,
    run_checkpointed_validation,
)
from medea_ps_spark.plans import evolution as EV
from medea_ps_spark.plans.compiler import Registry
from medea_ps_spark.plans.constraints import (
    AnyOf,
    ConstraintSet,
    FunctionalDependency,
    InRange,
    NotNull,
    Ref,
    Unique,
)
from medea_ps_spark.sources import synthetic


def _reg(*constraints, extra_sets=()):
    r = Registry().register(ConstraintSet("$start", tuple(constraints)))
    for cs in extra_sets:
        r.register(cs)
    return r

REG_V1 = lambda: _reg(
    NotNull("nn_doc", "doc_id"),
    InRange("ntok_range", "n_tok", lo=1),
    Unique("uniq_doc", "doc_id"),
)
# v2 = v1 + one added table constraint (the headline evolve case)
REG_V2 = lambda: _reg(
    NotNull("nn_doc", "doc_id"),
    InRange("ntok_range", "n_tok", lo=1),
    Unique("uniq_doc", "doc_id"),
    FunctionalDependency("fd_doc_src", determinants=("doc_id",), dependent="source"),
)


# -- fingerprints / delta ------------------------------------------------------


def test_fingerprints_change_only_for_edited_constraint():
    a = EV.constraint_fingerprints(REG_V1(), "$start")
    b = EV.constraint_fingerprints(
        _reg(
            NotNull("nn_doc", "doc_id"),
            InRange("ntok_range", "n_tok", lo=2),  # edited
            Unique("uniq_doc", "doc_id"),
        ),
        "$start",
    )
    assert a["nn_doc"] == b["nn_doc"] and a["uniq_doc"] == b["uniq_doc"]
    assert a["ntok_range"]["fp"] != b["ntok_range"]["fp"]
    assert a["uniq_doc"]["level"] == "table"
    assert a["nn_doc"]["level"] == "row"
    d = EV.constraint_delta(a, b)
    assert d.changed == ["ntok_range"] and not d.added and not d.removed
    assert d.touches_row_level


def test_fingerprint_closes_over_referenced_sets():
    shared_v1 = ConstraintSet("shared", (InRange("r", "n_tok", lo=1),))
    shared_v2 = ConstraintSet("shared", (InRange("r", "n_tok", lo=5),))
    mk = lambda sh: _reg(
        NotNull("nn", "doc_id"),
        AnyOf("alt", branches=(Ref("ref", target="shared"),)),
        extra_sets=(sh,),
    )
    a = EV.constraint_fingerprints(mk(shared_v1), "$start")
    b = EV.constraint_fingerprints(mk(shared_v2), "$start")
    # the edit inside `shared` reaches `alt` through the Ref, not `nn`
    assert a["nn"] == b["nn"]
    assert a["alt"]["fp"] != b["alt"]["fp"]


def test_delta_add_remove():
    a = EV.constraint_fingerprints(REG_V1(), "$start")
    b = EV.constraint_fingerprints(REG_V2(), "$start")
    d = EV.constraint_delta(a, b)
    assert d.added == ["fd_doc_src"] and not d.changed and not d.removed
    assert not d.touches_row_level  # FD is table-level
    back = EV.constraint_delta(b, a)
    assert back.removed == ["fd_doc_src"]


def test_subset_registry_compiles_only_chosen(spark):
    sub = EV.subset_registry(REG_V2(), "$start", ["fd_doc_src"])
    df = synthetic.sequences(spark, 200, seed=1)
    compiled = sub.compile(df.schema, root="$start")
    assert [c.name for c in compiled.table_constraints] == ["fd_doc_src"]
    assert compiled.row_constraints == []


# -- end-to-end evolve ---------------------------------------------------------


@pytest.fixture(scope="module")
def table_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("evo") / "sequences")
    synthetic.sequences(spark, 4_000, seed=21).write.mode("overwrite").partitionBy(
        "source"
    ).parquet(p)
    return p


def _all_violations(spark, ck):
    return (
        spark.read.parquet(os.path.join(ck, "out", "*", "violations"))
        .select("doc_id", "constraint_id", "observed")
    )


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_evolve_rows_sink_equals_scratch(spark, table_path, tmp_path):
    ck_evo = str(tmp_path / "ck_evo")
    ck_new = str(tmp_path / "ck_new")
    r1 = run_checkpointed_validation(spark, table_path, REG_V1(), ck_evo)
    assert len(r1) > 2
    out = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck_evo
    )
    # every completed partition upgraded in place, none reprocessed
    assert sorted(out["upgraded"]) == sorted(r1)
    assert out["reprocessed"] == {}
    assert out["delta"]["added"] == ["fd_doc_src"]
    scratch = run_checkpointed_validation(spark, table_path, REG_V2(), ck_new)
    assert _rows_set(_all_violations(spark, ck_evo)) == _rows_set(
        _all_violations(spark, ck_new)
    )
    # upgraded metrics equal from-scratch metrics (row verdict reused)
    assert out["upgraded"] == scratch
    # manifest is now at the new fingerprint with per-constraint fps
    with open(os.path.join(ck_evo, MANIFEST_NAME)) as fh:
        man = Manifest.from_json(fh.read())
    assert set(man.constraint_fps) == {
        "nn_doc", "ntok_range", "uniq_doc", "fd_doc_src",
    }
    # idempotent: evolving again is a no-op
    again = evolve_checkpointed_validation(spark, table_path, REG_V2(), ck_evo)
    assert again["upgraded"] == {} and again["reprocessed"] == {}


def test_evolve_removed_constraint_drops_rows_without_rescan(
    spark, table_path, tmp_path
):
    ck = str(tmp_path / "ck_rm")
    run_checkpointed_validation(spark, table_path, REG_V2(), ck)
    out = evolve_checkpointed_validation(spark, table_path, REG_V1(), ck)
    assert out["delta"]["removed"] == ["fd_doc_src"]
    got = _all_violations(spark, ck)
    assert got.where(F.col("constraint_id") == "fd_doc_src").count() == 0
    ck_new = str(tmp_path / "ck_rm_new")
    run_checkpointed_validation(spark, table_path, REG_V1(), ck_new)
    assert _rows_set(got) == _rows_set(_all_violations(spark, ck_new))


def test_evolve_row_level_change_recomputes_verdicts(
    spark, table_path, tmp_path
):
    ck = str(tmp_path / "ck_row")
    run_checkpointed_validation(spark, table_path, REG_V1(), ck)
    tightened = _reg(
        NotNull("nn_doc", "doc_id"),
        InRange("ntok_range", "n_tok", lo=100),  # tightened → more failures
        Unique("uniq_doc", "doc_id"),
    )
    out = evolve_checkpointed_validation(spark, table_path, tightened, ck)
    assert out["delta"]["changed"] == ["ntok_range"]
    scratch = run_checkpointed_validation(
        spark, table_path, tightened, str(tmp_path / "ck_row_new")
    )
    assert out["upgraded"] == scratch
    assert _rows_set(_all_violations(spark, ck)) == _rows_set(
        _all_violations(spark, str(tmp_path / "ck_row_new"))
    )


def test_evolve_metrics_sink(spark, table_path, tmp_path):
    ck = str(tmp_path / "ck_m")
    run_checkpointed_validation(
        spark, table_path, REG_V1(), ck, metrics_only=True
    )
    out = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck, metrics_only=True
    )
    scratch = run_checkpointed_validation(
        spark, table_path, REG_V2(), str(tmp_path / "ck_m_new"),
        metrics_only=True,
    )
    assert out["reprocessed"] == {}
    assert out["upgraded"] == scratch
    for m in out["upgraded"].values():
        assert set(m["table_violations"]) == {"uniq_doc", "fd_doc_src"}


def test_evolve_skips_unchanged_table_checks(
    spark, table_path, tmp_path, monkeypatch
):
    """The point of evolution: adding one table constraint must run
    ONLY that constraint's aggregation on completed partitions — the
    unchanged Unique check (a shuffle per partition at scale) never
    re-executes."""
    from medea_ps_spark.operators import validator as V

    ck = str(tmp_path / "ck_skip")
    n_parts = len(
        run_checkpointed_validation(
            spark, table_path, REG_V1(), ck, metrics_only=True
        )
    )
    calls = {"unique": 0, "fd": 0}
    real_unique, real_fd = V.unique_violation_count, V.fd_violation_count
    monkeypatch.setattr(
        V, "unique_violation_count",
        lambda df, c: calls.__setitem__("unique", calls["unique"] + 1)
        or real_unique(df, c),
    )
    monkeypatch.setattr(
        V, "fd_violation_count",
        lambda df, c: calls.__setitem__("fd", calls["fd"] + 1)
        or real_fd(df, c),
    )
    out = evolve_checkpointed_validation(
        spark, table_path, REG_V2(), ck, metrics_only=True
    )
    assert len(out["upgraded"]) == n_parts
    assert calls["fd"] == n_parts  # the added constraint ran everywhere
    assert calls["unique"] == 0  # the unchanged one never re-ran


def test_evolve_without_constraint_fps_falls_back_full(
    spark, table_path, tmp_path
):
    ck = str(tmp_path / "ck_fb")
    run_checkpointed_validation(spark, table_path, REG_V1(), ck)
    # simulate a pre-evolution manifest
    path = os.path.join(ck, MANIFEST_NAME)
    with open(path) as fh:
        man = Manifest.from_json(fh.read())
    man.constraint_fps = {}
    with open(path, "w") as fh:
        fh.write(man.to_json())
    out = evolve_checkpointed_validation(spark, table_path, REG_V2(), ck)
    assert out["delta"] is None and out["upgraded"] == {}
    assert len(out["reprocessed"]) > 2  # full invalidation, still correct
    scratch = run_checkpointed_validation(
        spark, table_path, REG_V2(), str(tmp_path / "ck_fb_new")
    )
    assert out["reprocessed"] == scratch

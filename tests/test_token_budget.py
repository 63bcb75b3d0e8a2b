"""Token-budget mixture sampler (sampling.token_budget_sample /
token_budget_assignments): pure-Python reference parity, bit-identity
between the audit view and the boundary-branch plan, nested budgets,
layout independence, DuckDB oracle parity, and plan gates (interior
branch is a broadcast semi join with no window; exactly one Window in
the whole sample plan; no SortMergeJoin anywhere)."""

import hashlib
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.sampling import (
    token_budget_assignments,
    token_budget_sample,
)

SEED = 42


def _coord(key, seed=SEED):
    if key is None:
        # concat_ws skips NULLs: md5("<seed>") — all NULL keys share
        # one coordinate (the estimator's documented convention)
        return hashlib.md5(str(seed).encode()).hexdigest()[:8]
    return hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:8]


def _py_select(rows, budgets, default_budget=0, seed=SEED):
    """Reference: per stratum, order by (coord, key, n_tok), take while
    tokens-before < budget. Rows with NULL n_tok are never selected."""
    by_strat = {}
    for key, n_tok, strat in rows:
        by_strat.setdefault(strat, []).append((key, n_tok))
    selected = []
    for strat, docs in by_strat.items():
        budget = budgets.get(strat, default_budget) if strat is not None \
            else default_budget
        docs = sorted(
            docs,
            key=lambda d: (
                _coord(d[0], seed),
                d[0] if d[0] is not None else "",
                d[1] if d[1] is not None else -1,
            ),
        )
        cum = 0
        for key, n_tok in docs:
            if n_tok is None:
                continue
            if cum < budget:
                selected.append((key, n_tok, strat))
            cum += n_tok
    return sorted(selected, key=lambda r: (str(r[2]), str(r[0]), r[1] or 0))


def _mk_rows(n=400, seed=7):
    rng = random.Random(seed)
    strata = ["web"] * 6 + ["books"] * 2 + ["wiki", "tiny"]
    rows = []
    for i in range(n):
        strat = rng.choice(strata)
        n_tok = rng.choice([0, 1, 3, 17, 64, 256, 1024])
        rows.append((f"d{i:05d}", n_tok, strat))
    # adversarial edges: NULL n_tok, NULL key, NULL stratum, dup keys
    rows += [
        ("dnull_tok", None, "web"),
        (None, 50, "web"),
        ("dnull_strat", 40, None),
        ("d00001", 64, "web"),   # duplicate key, same n_tok
        ("d00001", 128, "web"),  # duplicate key, different n_tok
    ]
    return rows


BUDGETS = {"web": 9000, "books": 4000, "wiki": 10**9, "tiny": 0}


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        _mk_rows(), schema="doc_id string, n_tok int, source string"
    )


def _norm_sort(rows):
    return sorted(
        rows,
        key=lambda r: (
            str(r[0]), str(r[1]), r[2] if r[2] is not None else -1
        ),
    )


def _sel_key(df):
    return _norm_sort(
        (r["source"], r["doc_id"], r["n_tok"])
        for r in df.select("source", "doc_id", "n_tok").collect()
    )


def test_reference_parity(frame):
    got = _sel_key(token_budget_sample(frame, BUDGETS, shard_chars=1))
    want = _norm_sort(
        (s, k, n) for (k, n, s) in _py_select(_mk_rows(), BUDGETS)
    )
    assert got == want


def test_sample_equals_assignments_selected(frame):
    for sc in (1, 2):
        a = token_budget_assignments(frame, BUDGETS, shard_chars=sc)
        want = _sel_key(a.where("selected"))
        got = _sel_key(token_budget_sample(frame, BUDGETS, shard_chars=sc))
        assert got == want


def test_assignments_tok_before_exact(frame):
    a = token_budget_assignments(frame, BUDGETS, shard_chars=2)
    rows = a.where(F.col("source") == "books").collect()
    # tok_before must be the exclusive prefix sum in (coord,key,n_tok)
    # order across the WHOLE stratum (shards stitched by their offsets)
    ordered = sorted(
        [r for r in rows if r["n_tok"] is not None],
        key=lambda r: (r["sample_coord"], r["doc_id"], r["n_tok"]),
    )
    cum = 0
    for r in ordered:
        assert r["tok_before"] == cum
        cum += r["n_tok"]


def test_nested_budgets(frame):
    small = set(_sel_key(token_budget_sample(frame, {"web": 3000})))
    big = set(_sel_key(token_budget_sample(frame, {"web": 6000})))
    assert small < big


def test_layout_independence(frame):
    a = _sel_key(token_budget_sample(frame.repartition(1), BUDGETS))
    b = _sel_key(token_budget_sample(frame.repartition(17), BUDGETS))
    assert a == b


def test_crossing_doc_semantics(frame):
    # selected tokens reach >= budget whenever the stratum has enough,
    # and dropping the LAST selected doc goes back under the budget
    sel = token_budget_sample(frame, {"web": 9000}).where(
        "source = 'web' and n_tok is not null"
    )
    a = token_budget_assignments(frame, {"web": 9000}).where(
        "source = 'web' and selected"
    )
    total = sel.agg(F.sum("n_tok")).collect()[0][0]
    last = a.orderBy(F.desc("tok_before")).limit(1).collect()[0]
    assert total >= 9000
    assert total - last["n_tok"] < 9000


def test_default_budget_drops_unlisted(frame):
    sel = token_budget_sample(frame, {"web": 1000})
    assert sel.where("source <> 'web'").count() == 0
    sel2 = token_budget_sample(frame, {}, default_budget=10**9)
    # NULL n_tok rows are never selected even under an infinite budget
    assert (
        sel2.count()
        == frame.where("n_tok is not null").count()
    )


def test_zero_budget_and_validation(frame):
    assert token_budget_sample(frame, {"web": 0, "books": 0}).count() == 0
    with pytest.raises(ValueError):
        token_budget_sample(frame, {"web": -1})
    with pytest.raises(ValueError):
        token_budget_sample(frame, {"web": 5}, default_budget=-2)
    with pytest.raises(ValueError):
        token_budget_sample(frame, {"web": 5}, shard_chars=0)


def test_negative_n_tok_rejected(spark):
    df = spark.createDataFrame(
        [("a", 5, "web"), ("b", -1, "web")],
        "doc_id string, n_tok int, source string",
    )
    with pytest.raises(ValueError, match="negative"):
        token_budget_sample(df, {"web": 10})


def test_non_string_stratum_rejected(spark):
    df = spark.createDataFrame(
        [("a", 5, 1)], "doc_id string, n_tok int, source int"
    )
    with pytest.raises(TypeError, match="string column"):
        token_budget_sample(df, {"1": 10})


def test_duckdb_oracle_parity(frame):
    pdf = frame.toPandas()
    con = duckdb.connect()
    con.register("seqs", pdf)
    want = _norm_sort(
        map(
            tuple,
            con.execute(
                """
        WITH proj AS (
          SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                 substr(md5(concat_ws(':', doc_id, '42')), 1, 8) AS coord
          FROM seqs
        ), cum AS (
          SELECT *, sum(n_tok) OVER (
              PARTITION BY source ORDER BY coord, doc_id, n_tok
              ROWS UNBOUNDED PRECEDING) - n_tok AS tok_before
          FROM proj
        )
        SELECT source, doc_id, n_tok FROM cum
        WHERE tok_before < CASE source
            WHEN 'web' THEN 9000 WHEN 'books' THEN 4000
            WHEN 'wiki' THEN 1000000000 ELSE 0 END
        """
            ).fetchall(),
        )
    )
    got = _sel_key(
        token_budget_sample(frame, BUDGETS).where("n_tok is not null")
    )
    assert [tuple(r) for r in got] == want


def test_plan_gates(frame):
    plan = token_budget_sample(
        frame, BUDGETS, shard_chars=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    # exactly one Window — the boundary branch's; the interior branch
    # (the bulk of the data) must not pay a cumsum
    assert plan.count("Window") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_boundary_no_window(frame):
    # budgets that decide every shard (0 or >= stratum total) need no
    # window at all
    plan = token_budget_sample(
        frame, {"web": 10**9, "books": 0}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

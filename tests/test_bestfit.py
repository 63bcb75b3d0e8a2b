"""Best-fit packing: hand-computed BFD example, conservation and
capacity invariants, oversize/NULL routing, layout independence, and
the packing_stats audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.bestfit import best_fit_pack, packing_stats

CAP = 10
ROWS = [
    ("a", 7), ("b", 6), ("c", 5), ("d", 4), ("e", 3), ("f", 2), ("g", 1),
    ("h", 15),   # oversize
    ("i", None),  # null
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id string, n_tok int")


def _assign(df, **kw):
    out = best_fit_pack(df, CAP, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_hand_computed_bfd(docs):
    got = _assign(docs)
    # BFD on 7,6,5,4,3,2,1 at cap 10: {7,3} {6,4} {5,2,1}
    by_pack: dict = {}
    for d, r in got.items():
        if r["pack_id"] is not None:
            by_pack.setdefault(r["pack_id"], []).append((r["pack_seq"], d))
    groups = {frozenset(d for _, d in v) for v in by_pack.values()}
    assert groups == {
        frozenset({"a", "e"}),
        frozenset({"b", "d"}),
        frozenset({"c", "f", "g"}),
    }
    # placement order within the {5,2,1} bin
    tri = next(v for v in by_pack.values() if len(v) == 3)
    assert sorted(tri) == [(0, "c"), (1, "f"), (2, "g")]


def test_conservation_and_capacity(docs):
    got = _assign(docs)
    assert set(got) == {r[0] for r in ROWS}  # every doc exactly once
    fills: dict = {}
    for r in got.values():
        if r["pack_id"] is not None:
            fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tok"]
    assert fills and all(f <= CAP for f in fills.values())


def test_oversize_and_null_route_out(docs):
    got = _assign(docs)
    assert got["h"]["pack_id"] is None and got["h"]["pack_seq"] is None
    assert got["i"]["pack_id"] is None


def test_layout_independence(docs):
    a = _assign(docs)
    b = _assign(docs.repartition(5, "doc_id"))
    assert a == b


def test_multiple_groups_partition_ids(spark):
    rows = [(f"d{i}", 3 + (i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    out = best_fit_pack(df, 16, group_docs=50)
    rs = out.collect()
    assert len(rs) == 300
    # pack ids are namespaced by group: no bin spans groups
    for r in rs:
        g, _b = r["pack_id"].split("#")
        assert int(g) == r["group_id"]
    # groups are reasonably populated (hash spread over ceil(300/50)=6)
    assert out.select("group_id").distinct().count() == 6


def test_packing_stats(docs):
    stats = packing_stats(best_fit_pack(docs, CAP), CAP).collect()[0]
    assert stats["n_docs"] == 9
    assert stats["n_oversize"] == 2  # oversize + null n_tok
    assert stats["n_packs"] == 3
    assert stats["total_tokens"] == 28
    assert stats["mean_fill_frac"] == round((1.0 + 1.0 + 0.8) / 3, 6)
    assert stats["waste_frac"] == round(1 - 28 / 30, 6)


def test_chunk_oversize(spark):
    from medea_ps_spark.operators.bestfit import chunk_oversize

    rows = [
        ("a", list(range(25))),
        ("b", list(range(8))),
        ("c", None),
        ("d", []),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["doc_id"]: r.asDict() for r in chunk_oversize(df, 10).collect()}
    assert set(got) == {"a~0", "a~1", "a~2", "b", "c", "d"}
    assert got["a~0"]["tokens"] == list(range(10))
    assert got["a~1"]["tokens"] == list(range(10, 20))
    assert got["a~2"]["tokens"] == list(range(20, 25))
    assert got["a~2"]["n_tok"] == 5 and got["a~2"]["chunk_index"] == 2
    assert got["a~0"]["parent_id"] == "a"
    assert got["b"]["chunk_index"] == 0 and got["b"]["parent_id"] == "b"
    assert got["d"]["tokens"] == [] and got["d"]["n_tok"] == 0
    assert got["c"]["tokens"] is None and got["c"]["n_tok"] == 0


def test_assemble_packs(spark):
    from medea_ps_spark.operators.bestfit import assemble_packs

    toks = {
        "a": [1] * 7, "b": [2] * 6, "c": [3] * 5, "d": [4] * 4,
        "e": [5] * 3, "f": [6] * 2, "g": [7] * 1,
    }
    df = spark.createDataFrame(
        [(k, v, len(v)) for k, v in toks.items()],
        "doc_id string, tokens array<int>, n_tok int",
    )
    assign = best_fit_pack(df, CAP)
    packs = {
        tuple(r["doc_ids"]): r.asDict()
        for r in assemble_packs(df, assign, CAP, pad_id=0).collect()
    }
    # bins from the hand-computed example: {a,e} {b,d} {c,f,g} in
    # placement (= length-desc) order
    p = packs[("a", "e")]
    assert p["tokens"] == [1] * 7 + [5] * 3
    assert p["n_real"] == 10 and p["doc_starts"] == [0, 7]
    p = packs[("c", "f", "g")]
    assert p["tokens"] == [3] * 5 + [6] * 2 + [7] * 1 + [0, 0]
    assert p["n_real"] == 8 and p["doc_starts"] == [0, 5, 7]
    p = packs[("b", "d")]
    assert p["tokens"] == [2] * 6 + [4] * 4 and p["doc_starts"] == [0, 6]
    # every packed token array is exactly seq_len long
    assert all(len(v["tokens"]) == CAP for v in packs.values())


def test_seeded_fuzz_invariants(spark):
    """Random corpora across caps: conservation, capacity, and
    bit-identity under repartitioning."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        cap = rng.choice([16, 64, 128])
        rows = [
            (f"t{trial}d{i}", rng.randint(1, cap)) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "doc_id string, n_tok int")
        a = {
            r["doc_id"]: (r["pack_id"], r["pack_seq"])
            for r in best_fit_pack(df, cap, group_docs=64).collect()
        }
        b = {
            r["doc_id"]: (r["pack_id"], r["pack_seq"])
            for r in best_fit_pack(
                df.repartition(7, "doc_id"), cap, group_docs=64
            ).collect()
        }
        assert a == b, (trial, cap)
        assert set(a) == {r[0] for r in rows}
        fills: dict = {}
        n_tok = dict(rows)
        for d, (pid, _s) in a.items():
            assert pid is not None  # all lengths fit by construction
            fills[pid] = fills.get(pid, 0) + n_tok[d]
        assert all(f <= cap for f in fills.values()), (trial, cap)


def test_arg_validation(docs):
    with pytest.raises(ValueError):
        best_fit_pack(docs, 0)
    with pytest.raises(ValueError):
        best_fit_pack(docs, 10, group_docs=0)

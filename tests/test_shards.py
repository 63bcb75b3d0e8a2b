"""Deterministic shuffle + training shards (operators/shards.py):
DuckDB parity of the md5 order and shard assignment, layout
independence (same permutation after a repartition), per-epoch seeds,
balanced shards, materialized read-back order, and the manifest."""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.shards import (
    assign_shards,
    global_shuffle,
    read_shard,
    shuffle_key,
    write_training_shards,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(f"doc{i:04d}", i % 7) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id string, grp int")


def test_duckdb_parity_order_and_shard(frame):
    got = [
        (r.doc_id, r.shard)
        for r in assign_shards(frame, 8, seed=42).orderBy("shuffle_key").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?)", [(r[0],) for r in frame.select("doc_id").collect()]
    )
    want = con.execute(
        """
        SELECT doc_id,
               CAST(('0x' || substr(md5('42' || chr(31) || doc_id), 1, 15))
                    AS BIGINT) % 8 AS shard
          FROM t
         ORDER BY md5('42' || chr(31) || doc_id) || '42' || chr(31) || doc_id
        """
    ).fetchall()
    assert got == [(d, int(s)) for d, s in want]


def test_layout_independent_and_seeded(frame):
    a = [r.doc_id for r in global_shuffle(frame, seed=1).collect()]
    b = [
        r.doc_id
        for r in global_shuffle(frame.repartition(13, "grp"), seed=1).collect()
    ]
    assert a == b  # permutation ignores physical layout
    c = [r.doc_id for r in global_shuffle(frame, seed=2).collect()]
    assert a != c and sorted(a) == sorted(c)  # new epoch, same corpus


def test_shards_balanced_and_exhaustive(frame):
    out = assign_shards(frame, 8, seed=7)
    counts = {r.shard: r.n for r in out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 500
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 3 * min(counts.values())  # multinomial-ish
    with pytest.raises(ValueError):
        assign_shards(frame, 0, seed=7)


def test_write_and_readback_order(frame, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(frame, path, n_shards=4, seed=9)
    assert manifest["n_rows"] == 500 and len(manifest["counts"]) == 4
    on_disk = json.load(open(os.path.join(path, "_shards_manifest.json")))
    assert on_disk == manifest
    spark = frame.sparkSession
    seen = []
    for s in range(4):
        rows = read_shard(spark, path, s).collect()
        assert len(rows) == manifest["counts"][str(s)]
        keys = [r.shuffle_key for r in rows]
        assert keys == sorted(keys)  # shard materialized in shuffle order
        seen += [r.doc_id for r in rows]
    assert sorted(seen) == sorted(r.doc_id for r in frame.collect())
    # shard membership matches the declarative assignment
    want = {
        (r.doc_id, r.shard) for r in assign_shards(frame, 4, seed=9).collect()
    }
    got = {
        (r.doc_id, s)
        for s in range(4)
        for r in read_shard(spark, path, s).collect()
    }
    assert got == want

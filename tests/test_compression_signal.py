"""Compression-ratio quality signal (textquality.compression_features
/ token_compression_features): exact parity with direct zlib calls,
NULL/empty conventions, the discrimination property the filter exists
for (repetitive text compresses far below prose; random ids compress
worse than looped ids), layout independence, and a map-only plan gate
(no Exchange — the UDF must not induce a shuffle)."""

import random
import string
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from medea_ps_spark.operators.textquality import (
    compression_features,
    token_compression_features,
)

PROSE = (
    "The quick brown fox jumps over the lazy dog while the river "
    "carries last autumn's leaves toward a sea nobody here has seen. "
    "Morning fog settled across the valley as merchants opened their "
    "stalls, arguing gently about the price of salt and the weather "
    "to come. A child counted boats on the horizon, each sail a "
    "different patch of inherited cloth, and wondered which of them "
    "carried letters."
)
TEMPLATED = "click here to subscribe! " * 40
_rng = random.Random(3)
RANDOMISH = "".join(
    _rng.choice(string.ascii_letters + string.digits + string.punctuation)
    for _ in range(600)
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("prose", PROSE),
        ("templated", TEMPLATED),
        ("randomish", RANDOMISH),
        ("empty", ""),
        ("null", None),
        ("tiny", "a"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_zlib_parity(frame):
    got = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_features(frame).collect()
    }
    for doc_id, text in [
        ("prose", PROSE), ("templated", TEMPLATED),
        ("randomish", RANDOMISH), ("tiny", "a"),
    ]:
        b = text.encode("utf-8")
        assert got[doc_id] == pytest.approx(
            len(zlib.compress(b, 6)) / len(b), abs=1e-12
        )
    assert got["empty"] is None
    assert got["null"] is None


def test_discrimination(frame):
    got = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_features(frame).collect()
    }
    # the reason the filter exists: templated << prose < randomish
    assert got["templated"] < 0.2
    assert got["templated"] < got["prose"] < got["randomish"]


def test_level_and_validation(frame):
    r9 = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_features(frame, level=9).collect()
    }
    b = TEMPLATED.encode("utf-8")
    assert r9["templated"] == pytest.approx(
        len(zlib.compress(b, 9)) / len(b), abs=1e-12
    )
    with pytest.raises(ValueError):
        compression_features(frame, level=10)
    with pytest.raises(ValueError):
        token_compression_features(frame, level=-1)


def test_token_twin(spark):
    rng = random.Random(11)
    looped = [7, 8, 9, 10] * 64
    rand = [rng.randrange(50257) for _ in range(256)]
    df = spark.createDataFrame(
        [("looped", looped), ("rand", rand), ("empty", []), ("null", None)],
        "doc_id string, tokens array<int>",
    )
    got = {
        r["doc_id"]: r["tok_zlib_ratio"]
        for r in token_compression_features(df).collect()
    }
    for name, toks in [("looped", looped), ("rand", rand)]:
        b = np.asarray(toks, dtype="<i4").tobytes()
        assert got[name] == pytest.approx(
            len(zlib.compress(b, 6)) / len(b), abs=1e-12
        )
    assert got["looped"] < got["rand"]
    assert got["empty"] is None
    assert got["null"] is None


def test_layout_independence(frame):
    a = sorted(
        (r["doc_id"], r["zlib_ratio"])
        for r in compression_features(frame.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["zlib_ratio"])
        for r in compression_features(frame.repartition(7)).collect()
    )
    assert a == b


def test_map_only_plan(frame):
    plan = (
        compression_features(frame)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan

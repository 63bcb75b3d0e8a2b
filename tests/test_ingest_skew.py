"""JSON quarantine ingestion + key-skew report."""

from __future__ import annotations

from pyspark.sql import functions as F

from medea_ps_spark.operators.stats import skew_report
from medea_ps_spark.sources.jsonl import (
    parse_health,
    parse_json_column,
    split_quarantine,
)


def test_parse_json_quarantine_classes(spark):
    rows = [
        ("good1", '{"k": 1.5}'),
        ("good2", '{"k": 2, "extra": "ignored"}'),
        ("missing_field", "{}"),            # valid object, k null — NOT quarantined
        ("malformed", '{"k": 1.5'),         # truncated write
        ("scalar", "5"),                    # valid JSON, not an object
        ("array", "[1,2,3]"),               # valid JSON, not an object
        ("null_input", None),
        ("empty", ""),
        ("garbage", "\x00\xff not json"),
    ]
    df = spark.createDataFrame(rows, "id string, js string")
    out = {r["id"]: r for r in parse_json_column(df, "js", "k double").collect()}
    quarantined = {k for k, r in out.items() if r["quarantined"]}
    assert quarantined == {
        "malformed", "scalar", "array", "null_input", "empty", "garbage"
    }
    assert out["good1"]["parsed"]["k"] == 1.5
    assert out["missing_field"]["parsed"]["k"] is None

    good, quar = split_quarantine(df, "js", "k double")
    assert {r["id"] for r in good.collect()} == {"good1", "good2", "missing_field"}
    # quarantine keeps the raw string for replay
    qrows = {r["id"]: r["js"] for r in quar.collect()}
    assert qrows["malformed"] == '{"k": 1.5'


def test_parse_health_rollup(spark):
    rows = [("a", '{"k":1}'), ("a", "bad{"), ("b", '{"k":2}'), ("b", '{"k":3}')]
    df = spark.createDataFrame(rows, "source string, js string")
    got = {r["source"]: r for r in parse_health(df, "js", "k double").collect()}
    assert got["a"]["n_quarantined"] == 1 and got["a"]["quarantine_rate"] == 0.5
    assert got["b"]["n_quarantined"] == 0


def test_contamination_check_planted(spark):
    from medea_ps_spark.operators.dedup import contamination_check

    bench_q = ("what is the capital of france and which river runs "
               "through its old town center")
    evals = spark.createDataFrame(
        [("e0", bench_q), ("e1", "solve for x in the quadratic equation")],
        "doc_id string, text string",
    )
    train = spark.createDataFrame(
        [
            ("t0", f"some scraped page asking {bench_q} with extra words"),
            ("t1", "a perfectly clean training document about cooking pasta "
                   "with tomatoes and fresh basil in a copper pot"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in contamination_check(
        train, evals, shingle_k=8).collect()}
    assert out["t0"]["contaminated"] and out["t0"]["n_contaminated_shingles"] > 0
    assert not out["t1"]["contaminated"]
    assert out["t1"]["n_contaminated_shingles"] == 0


def test_pii_scrub_classes(spark):
    from medea_ps_spark.functions.redact import scrub

    rows = [
        ("a", "mail me at john.doe+spam@corp.example.org today"),
        ("b", "call 555-123-4567 or visit 192.168.10.1 ssn 123-45-6789"),
        ("c", "no pii here, just 12345 and 3.14 and v1.2.3 mentions"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = {r["id"]: r for r in scrub(df).collect()}
    assert out["a"]["pii_email"] == 1 and "<EMAIL>" in out["a"]["text_redacted"]
    assert out["b"]["pii_phone"] == 1 and out["b"]["pii_ipv4"] == 1
    assert out["b"]["pii_ssn"] == 1
    assert "<PHONE>" in out["b"]["text_redacted"]
    assert "<SSN>" in out["b"]["text_redacted"]
    assert out["c"]["text_redacted"] == out["c"]["text"]
    assert out["c"]["pii_email"] == out["c"]["pii_phone"] == 0


def test_skew_report_orders_and_shares(spark):
    # Zipf-ish: key0 dominates
    rows = [(f"k{i % 4}",) for i in range(60)] + [("k0",)] * 40
    df = spark.createDataFrame(rows, "user string")
    rep = skew_report(df, "user", top_n=2).collect()
    assert [r["key"] for r in rep] == ["k0", "k1"]
    assert rep[0]["rank"] == 1 and rep[0]["n_rows"] == 55
    assert abs(rep[0]["share"] - 0.55) < 1e-9
    # plan shape: top-k must be TakeOrdered, not a global-window sort
    plan = skew_report(df, "user", top_n=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_split_quarantine_nested_schema_and_collision(spark):
    """StructType schemas (incl. nested structs) must parse without a
    DDL round-trip, and a JSON field colliding with an input column
    flattens under a parsed_ prefix instead of an ambiguous duplicate."""
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", StringType()),          # collides with input col
        StructField("meta", StructType([
            StructField("k", DoubleType()),
            StructField("tag", StringType()),
        ])),
    ])
    rows = [
        ("r1", '{"id": "inner1", "meta": {"k": 1.5, "tag": "a"}}'),
        ("r2", '{"id": "inner2", "meta": {"k": 2.0}}'),
        ("r3", "{bad"),
    ]
    df = spark.createDataFrame(rows, "id string, js string")
    good, quar = split_quarantine(df, "js", schema)
    assert set(good.columns) == {"id", "js", "parsed_id", "meta"}
    g = {r["id"]: r for r in good.collect()}
    assert set(g) == {"r1", "r2"}
    assert g["r1"]["parsed_id"] == "inner1"
    assert g["r1"]["meta"]["k"] == 1.5
    assert g["r2"]["meta"]["tag"] is None
    assert [r["id"] for r in quar.collect()] == ["r3"]

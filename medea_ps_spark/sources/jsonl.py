"""JSON ingestion with corrupt-record quarantine — the front door of a
training-data pipeline: parse a JSON string column (or JSONL files)
against an expected schema, split conforming rows from quarantined ones,
and report per-partition parse health. All JVM-side (from_json /
get_json_object); no Python in the parse path.

This generalizes the reference's loader boundary
(/root/reference/src/Data/Medea/Loader.purs:60-77 — buildSchema's
NotUtf8/Parsing error split): where medea-ps rejects an entire schema
file, a 100 TB ingest must instead ROUTE bad records (schema drift,
truncated writes, encoding damage) to a quarantine sink and keep going.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

PARSED_COL = "parsed"
QUARANTINED_COL = "quarantined"


_CORRUPT = "_corrupt_record"


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: StructType | str,
) -> DataFrame:
    """Adds ``parsed`` (struct) and ``quarantined`` (boolean). Uses
    PERMISSIVE mode with columnNameOfCorruptRecord so EVERY
    malformation class quarantines instead of failing the job or
    silently nulling: null/empty input (parsed is null), malformed
    JSON, valid-but-non-object JSON (scalars, arrays), and type-mangled
    fields all set the corrupt column; a valid object merely MISSING a
    field parses with that field null (schema presence is the
    validator's job, not the parser's)."""
    if isinstance(schema, StructType):
        # append the corrupt field to the StructType itself — a DDL
        # round-trip via simpleString() mangles nested struct types and
        # quoted field names
        with_corrupt: StructType | str = StructType(
            list(schema.fields) + [StructField(_CORRUPT, StringType())]
        )
    else:
        with_corrupt = f"{schema}, {_CORRUPT} string"
    parsed = F.from_json(
        F.col(json_col),
        with_corrupt,
        {"columnNameOfCorruptRecord": _CORRUPT},
    )
    return df.withColumn(PARSED_COL, parsed).withColumn(
        QUARANTINED_COL,
        F.col(PARSED_COL).isNull()
        | F.col(f"{PARSED_COL}.{_CORRUPT}").isNotNull(),
    )


def split_quarantine(
    df: DataFrame, json_col: str, schema: StructType | str
) -> tuple:
    """(good, quarantine): good rows carry the parsed struct's fields
    flattened alongside the original columns; quarantine keeps the raw
    string for forensics/replay."""
    p = parse_json_column(df, json_col, schema)
    base_cols = [c for c in df.columns]
    parsed_fields = [
        f.name
        for f in p.schema[PARSED_COL].dataType.fields
        if f.name != _CORRUPT
    ]
    # explicit aliased flatten: a JSON field sharing a name with an
    # input column would otherwise produce ambiguous duplicates —
    # prefix such collisions with "parsed_"
    flat = [
        F.col(f"{PARSED_COL}.{name}").alias(
            f"parsed_{name}" if name in base_cols else name
        )
        for name in parsed_fields
    ]
    good = p.where(~F.col(QUARANTINED_COL)).select(*base_cols, *flat)
    quarantine = p.where(F.col(QUARANTINED_COL)).drop(
        PARSED_COL, QUARANTINED_COL
    )
    return good, quarantine


def parse_health(
    df: DataFrame,
    json_col: str,
    schema: StructType | str,
    partition_col: str = "source",
) -> DataFrame:
    """Per-partition parse health rollup (one hash-agg pass):
    (partition, n_rows, n_quarantined, quarantine_rate)."""
    p = parse_json_column(df, json_col, schema)
    return p.groupBy(partition_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(QUARANTINED_COL).cast("bigint")).alias("n_quarantined"),
        F.round(
            F.avg(F.col(QUARANTINED_COL).cast("double")), 6
        ).alias("quarantine_rate"),
    )

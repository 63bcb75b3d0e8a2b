"""Generate the committed tokenized-sequence fixture parquet.

The driver's CORRECTNESS gate runs queries() on Spark and oracle_sql()
on DuckDB side-by-side; the seq_validation oracle needs BOTH engines to
see the exact same BASELINE-shaped table. The synthetic generator is a
pure function of (seed, n) but runs on Spark only, so we materialize it
ONCE into a single parquet file checked into the repo — small (20k rows,
max_len=128) yet carrying every seeded violation class (dup/null ids,
out-of-vocab tokens, empty arrays, n_tok mismatches, unknown source).

Re-run only if the generator semantics change:

    python scripts/make_seq_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

FIXTURE = "/root/repo/tests/fixtures/sequences_small.parquet"
N_ROWS = 20_000
SEED = 42
MAX_LEN = 128


def main() -> None:
    from medea_ps_spark.session import get_spark
    from medea_ps_spark.sources import synthetic

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    df = synthetic.sequences(spark, N_ROWS, seed=SEED, max_len=MAX_LEN)
    pdf = df.toPandas()
    schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int32()),
            pa.field("source", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    pq.write_table(table, FIXTURE, compression="zstd")
    print(f"wrote {FIXTURE}: {table.num_rows} rows, "
          f"{os.path.getsize(FIXTURE)/1e6:.2f} MB")
    spark.stop()


if __name__ == "__main__":
    main()

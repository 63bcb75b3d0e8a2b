"""Emulates the driver's correctness gate: runs every queries() entry at
a given SF dir and compares with oracle_sql() via DuckDB — row count,
column names, and order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from medea_ps_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            continue
        if np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set | None = None) -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(got)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-sql  ] {name}: {e}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            print(f"[FAIL-cols ] {name}: {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"[FAIL-rows ] {name}: {len(g)} vs {len(w)}")
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            if np.issubdtype(a.dtype, np.number) and np.issubdtype(b.dtype, np.number):
                # The driver's value-hash is dtype-strict: an int64 Spark
                # column vs a float64 oracle column (e.g. DuckDB HUGEINT
                # sums landing in pandas as float) hashes differently even
                # when values agree. Mirror that: dtype KIND must match.
                a_int = np.issubdtype(a.dtype, np.integer)
                b_int = np.issubdtype(b.dtype, np.integer)
                if a_int != b_int:
                    mismatch = f"{c} (dtype {a.dtype} vs {b.dtype})"
                    break
                if a_int:
                    if not (a.astype("int64") == b.astype("int64")).all():
                        mismatch = c
                        break
                else:
                    # round(6) then a tiny atol: values straddling a
                    # 6-decimal rounding boundary by <1e-9 (summation
                    # order) must not flag a false mismatch
                    av = a.astype(float).round(6)
                    bv = b.astype(float).round(6)
                    eq = np.isclose(av, bv, atol=5e-7, rtol=0.0) | (
                        np.isnan(av) & np.isnan(bv)
                    )
                    if not eq.all():
                        mismatch = c
                        break
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    mismatch = c
                    break
        if mismatch:
            failures.append((name, f"values differ in {mismatch}"))
            print(f"[FAIL-vals ] {name}: column {mismatch}")
            print("  got :", g.head(5).to_dict("records"))
            print("  want:", w.head(5).to_dict("records"))
        else:
            print(f"[OK        ] {name}: {len(g)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok; failures: {[f[0] for f in failures]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
        )
    )

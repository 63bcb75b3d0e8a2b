"""Train the IVF coarse quantizer ONCE and commit it as a fixture —
exactly how production ships quantizers (trained offline, versioned as
an artifact). With the centroids fixed, IVF list assignment, probe
selection, and re-ranking are all deterministic, which lets the driver
verify the partial-probe ANN path against a DuckDB oracle that embeds
the same centroids as literals.

Re-run only if the embeddings fixture or k changes:

    python scripts/make_ivf_centroids.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/tests/fixtures/ivf_centroids.json"
K = 8


def main() -> None:
    from pyspark.sql import functions as F

    from medea_ps_spark.operators.ivf import train_centroids
    from medea_ps_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cent = train_centroids(emb, k=K, sample=2000, iters=8, seed=42)
    with open(OUT, "w") as f:
        json.dump([[float(x) for x in c] for c in cent], f)
    print(f"wrote {OUT}: {cent.shape}")
    spark.stop()


if __name__ == "__main__":
    main()

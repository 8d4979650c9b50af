#!/usr/bin/env python
"""Materialize a deterministic sf1.0 bench directory (VERDICT r4 #5).

The driver ships testdata at sf{0.001,0.01,0.1} only; the sf1.0
order-of-magnitude datapoint needs `documents.parquet` and
`embeddings.parquet` at 10x sf0.1. Both are derived DETERMINISTICALLY
from the committed sf0.1 tables (no new randomness): 10 replicas with
id offsets. Replicated documents keep their text byte-identical, which
makes the dedup benchmark a REAL workload at sf1 — every doc has 9 exact
near-dup clones the LSH stage must pair. The transcripts corpus itself
is NOT written here: bench.py generates it distributed from the sf in
the directory name (sf1.0 -> 200k conversations, ~3.4M turns).

Usage: python scripts/make_sf1_dir.py [/dev/shm/sfdata/sf1.0]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 10
ID_STRIDE = 10_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from solr_sematic_importer_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sfdata/sf1.0"
    src = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-sf1", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * ID_STRIDE)
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * ID_STRIDE)
        .drop("_rep")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )
    nd = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    ne = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
    print(f"wrote {out_dir}: documents={nd} embeddings={ne}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""spark-submit driver for the inverted-index build — the north-star
launch mode (BASELINE.json: "run via spark-submit --py-files on a
multi-executor cluster").

Usage (local example; on a cluster swap --master and executor confs):

    python scripts/make_pyfiles_zip.py /tmp/engine.zip
    spark-submit --master 'local[16]' --py-files /tmp/engine.zip \
        scripts/submit_build.py \
        --input synthetic:12000 --output /tmp/idx --profile text_en

    spark-submit ... scripts/submit_build.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --text-col text --key-cols doc_id --doc-id-col doc_id \
        --output /tmp/idx2

``--input`` is either a parquet path or ``synthetic:<n_convs>`` (the
deterministic transcript generator — identical bytes at any
parallelism). ``--segment-key`` switches to the segmented append path
(resumable: re-submitting a completed key is a no-op, per-segment
lineage rows in the manifest). Prints ONE JSON metrics line on stdout.

The script only imports the package at run time, so it works both
spark-submitted with ``--py-files engine.zip`` and plain
``python scripts/submit_build.py`` from the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path or synthetic:<n_convs>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--profile", default="text_en")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-cols", default="conv_id,turn_idx")
    ap.add_argument("--doc-id-col", default=None)
    ap.add_argument("--segment-key", default=None,
                    help="append as a named segment (resumable)")
    ap.add_argument("--bucket-bits", type=int, default=12)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    # When launched via spark-submit the session already exists and
    # --py-files shipped the package; when run as plain python from the
    # repo, fall back to the repo-root import + programmatic session.
    try:
        import solr_sematic_importer_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("ssi-index-build")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from solr_sematic_importer_spark.session import _ship_package

    try:
        _ship_package(spark)  # no-op duplicate-safe; needed for plain-python runs
    except Exception:
        pass

    from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts

    key_cols = [c for c in args.key_cols.split(",") if c]
    if args.input.startswith("synthetic:"):
        df = synthetic_transcripts(spark, int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)

    t0 = time.perf_counter()
    if args.segment_key:
        from solr_sematic_importer_spark.operators.segments import append_segment

        res = append_segment(
            spark, args.output, args.segment_key, df,
            text_col=args.text_col, key_cols=tuple(key_cols),
            profile=args.profile, bucket_bits=args.bucket_bits,
        )
        n_docs, skipped = int(res.n_docs), bool(res.skipped)
    else:
        from solr_sematic_importer_spark.operators.build import build_and_write_index

        idx = build_and_write_index(
            df, args.output, text_col=args.text_col,
            key_cols=tuple(key_cols), profile=args.profile,
            doc_id_col=args.doc_id_col, bucket_bits=args.bucket_bits,
        )
        n_docs, skipped = idx.n_docs, False
    wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "submit_build",
        "n_docs": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1) if wall else None,
        "skipped": skipped,
        "output": args.output,
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Stable dense docID assignment (SURVEY §2.5 W1).

The engine's document identity is ``(conv_id, turn_idx)`` under stable turn
ordering (BASELINE.json input_hint); internally postings reference a dense
``doc_id: long`` equal to the rank of the key in the global
``ORDER BY key_cols`` order.

A single ``row_number() OVER (ORDER BY ...)`` is a one-partition sort — a
scalability cliff at 10^12 rows — so this is the classic two-light-pass
zip-with-index:

1. ``repartitionByRange(key_cols)`` + ``sortWithinPartitions`` puts the
   data in globally ordered, per-partition-sorted form (sampled range
   boundaries; fully parallel sort).
2. A cheap count-per-partition job -> prefix sums on the driver (one tiny
   array, #partitions entries).
3. ``mapInPandas`` stamps ``offset[pid] + local_ordinal`` — narrow, no
   extra shuffle.

The resulting ids are a pure function of the key order, independent of the
sampled partition boundaries and of parallelism, so reruns and different
cluster sizes produce identical ids (rank-identity requirement).  At real
scale the ordered+numbered result is persisted once (the index build's
``doc_stats`` table) and the per-partition (rows, offset) pairs land in the
lineage manifest so resumed builds reuse identical offsets.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DOC_ID_COL = "doc_id"


def assign_doc_ids(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    doc_id_col: str = DOC_ID_COL,
) -> DataFrame:
    key_cols = list(key_cols)
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 2)

    ordered = (
        df.repartitionByRange(num_partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    ordered.persist()
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_schema = ", ".join(
        [f"{doc_id_col} long"] + [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    )
    src_cols = [f.name for f in df.schema.fields]

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for b in batches:
            if not len(b):
                continue
            off = offsets[int(b["_pid"].iloc[0])]
            ids = np.arange(off + local, off + local + len(b), dtype=np.int64)
            local += len(b)
            out = b[src_cols].copy()
            out.insert(0, doc_id_col, ids)
            yield out

    return ordered.mapInPandas(stamp, schema=out_schema)

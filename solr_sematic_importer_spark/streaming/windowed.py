"""Event-time streaming operators (SURVEY §2.11 extension).

The reference is batch-only; its natural streaming extensions on Spark
are (a) the segment-per-micro-batch incremental index build
(``incremental.py``) and (b) event-time analytics over the transcript /
event stream — windowed aggregation with watermarked late-data handling,
and stateful exact dedup across micro-batches (the streaming form of the
training-pipeline dedup operators):

* ``windowed_event_counts`` — tumbling/sliding event-time windows with a
  watermark bounding state: the canonical ``readStream -> withWatermark
  -> groupBy(window(...)) -> agg`` shape. State size is windows x keys,
  pruned as the watermark passes window ends.
* ``dedup_stream`` — ``applyInPandasWithState`` keyed by content hash:
  the FIRST row of each distinct text passes through, every later
  duplicate (same batch or any later batch) is dropped; per-key state is
  one boolean. At scale the state store is RocksDB-backed and
  partitioned by the hash — no global structure.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked event-time window counts: (window, key, cnt)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
    )


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: emit the first-seen row per distinct text
    (min id within the first batch it appears in), drop all later
    duplicates. Returns (text_hash, doc_id, text) in append mode."""
    out_schema = f"text_hash string, {id_col} long, {text_col} string"
    state_schema = "seen boolean"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # every row in these batches is a duplicate
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.loc[pdf[id_col].idxmin()]
            if best is None or row[id_col] < best[id_col]:
                best = row
        if best is not None:
            state.update((True,))
            yield pd.DataFrame(
                {
                    "text_hash": [key[0]],
                    id_col: [best[id_col]],
                    text_col: [best[text_col]],
                }
            )

    keyed = stream_df.withColumn("text_hash", F.md5(F.col(text_col))).groupBy(
        "text_hash"
    )
    return keyed.applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

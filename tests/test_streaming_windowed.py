"""Structured Streaming: watermarked window aggregation + stateful
streaming dedup (applyInPandasWithState) across micro-batches."""

import time

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.streaming.windowed import (
    dedup_stream,
    windowed_event_counts,
)


def _await(q, timeout=120):
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    ev = spark.createDataFrame(
        [
            (i, f"2024-01-01 {h:02d}:{m:02d}:00", kind)
            for i, (h, m, kind) in enumerate(
                [(0, 5, "a"), (0, 20, "a"), (0, 40, "b"),
                 (1, 10, "a"), (1, 30, "b"), (2, 15, "a"),
                 (3, 5, "b"), (3, 6, "b")]
            )
        ],
        "event_id long, ts_s string, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r["win"]["start"].hour, r["event_type"]): r["cnt"]
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r["h"], r["event_type"]): r["cnt"]
        for r in ev.groupBy(
            F.hour("ts").alias("h"), "event_type"
        ).agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """Duplicates must be dropped WITHIN a micro-batch and ACROSS
    micro-batches (the state store remembers); the first-seen min-id row
    survives. maxFilesPerTrigger=1 makes each file its own micro-batch
    inside one availableNow run."""
    src = str(tmp_path / "docs")
    b1 = spark.createDataFrame(
        [(3, "alpha text"), (1, "alpha text"), (2, "beta text")],
        "doc_id long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    spark.createDataFrame(
        [(9, "alpha text"), (4, "gamma text")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {(r["doc_id"], r["text"]) for r in spark.table("dedup_out").collect()}
    # in-batch dup (3 vs 1) resolved to min id; cross-batch dup (9) dead;
    # the new text of batch 2 passes
    assert got == {(1, "alpha text"), (2, "beta text"), (4, "gamma text")}

"""Enrichment operators (P4-P7/F1-F8) and multimodal column plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.enrich import (
    enrich_for_crawl,
    new_crawl_id,
    solr_date_string,
    strip_fields,
    to_json_docs,
    truncate_field,
    with_chunk_ids,
)
from solr_sematic_importer_spark.operators.multimodal import (
    extract_features,
    media_stats,
    real_decode_image,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_solr_date_coercion_chain(spark):
    df = spark.createDataFrame(
        [
            (1, "1704067200000"),            # epoch millis as string-of-long
            (2, "2024-01-01 00:00:00"),      # parseable timestamp string
            (3, "not a date"),               # unparseable -> NULL
        ],
        "id int, creation_date string",
    )
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", solr_date_string(F.col("creation_date")).alias("d")
        ).collect()
    }
    assert got[1] == "2024-01-01T00:00:00.000Z"
    assert got[2] == "2024-01-01T00:00:00.000Z"
    assert got[3] is None


def test_enrich_for_crawl(spark):
    df = spark.createDataFrame([(1, "a")], "id int, text string")
    cid = new_crawl_id()
    out = enrich_for_crawl(df, cid).collect()[0]
    assert out["crawl_id"] == cid
    assert out["crawl_date"].endswith("Z") and "T" in out["crawl_date"]


def test_truncate_strip_chunkids_json(spark):
    df = spark.createDataFrame(
        [("p1", 3, "hello world", 7)],
        "parent_id string, chunk_number int, text string, _version_ int",
    )
    out = with_chunk_ids(truncate_field(strip_fields(df, "_version_"), "text", 5))
    row = out.collect()[0]
    assert row["id"] == "p1#0000003"
    assert row["text"] == "hello"
    assert "_version_" not in out.columns
    j = to_json_docs(out).collect()[0]["_json"]
    assert '"id":"p1#0000003"' in j


def test_media_deterministic_and_typed(spark):
    a = synthetic_media(spark, 30).orderBy("media_id").collect()
    b = synthetic_media(spark, 30).orderBy("media_id").collect()
    assert [r["payload"] for r in a] == [r["payload"] for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    for r in a:
        assert r["meta"]["nbytes"] == len(r["payload"])


def test_feature_extraction_plumbing(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media).orderBy("media_id").collect()
    assert len(feats) == 10  # every 3rd id is an image
    for r in feats:
        v = np.array(r["feature"])
        assert v.shape == (64,)
        assert np.isclose(np.linalg.norm(v), 1.0)
    # deterministic across runs
    again = extract_features(synthetic_media(spark, 30)).orderBy("media_id").collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in again]


def test_resize_shapes(spark):
    media = synthetic_media(spark, 12)
    out = resize_images(media, out_w=8, out_h=4).collect()
    for r in out:
        assert len(r["thumb"]) == 8 * 4 * 3
        assert (r["width"], r["height"]) == (8, 4)


def test_frame_sampling_counts(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert per
    for r in per:
        assert r["count"] == max(1, durations[r["media_id"]] // 1000)
    ts = frames.filter(F.col("media_id") == per[0]["media_id"]).orderBy("frame_idx").collect()
    assert [t["ts_ms"] for t in ts[:3]] == [0, 1000, 2000][: len(ts)]


def test_media_stats_prunes_payload(spark, tmp_path):
    p = str(tmp_path / "media")
    synthetic_media(spark, 60).write.parquet(p)
    stats = media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "payload" not in read_schema[0]
    got = {r["kind"]: r["cnt"] for r in stats.collect()}
    assert got == {"image": 20, "audio": 20, "video": 20}


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_image(b"\x89PNG")

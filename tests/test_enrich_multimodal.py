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
        # every ts strictly inside [0, duration): floor((d-1)/every)+1 —
        # a 1999 ms video has frames 0 AND 1000; a 2000 ms one has
        # exactly 0 and 1000 (ts 2000 is out of range)
        d = durations[r["media_id"]]
        assert r["count"] == max(1, (d - 1) // 1000 + 1)
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


def test_frame_sampling_last_in_range_frame(spark):
    """1999 ms @ 1000 -> frames 0, 1000 (the last in-range timestamp was
    previously lost); 2000 ms -> exactly 0, 1000 (round-5 review)."""
    rows = [
        (1, "video", b"", (1999, 10)),
        (2, "video", b"", (2000, 10)),
        (3, "video", b"", (500, 10)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<duration_ms: long, nbytes: long>",
    )
    got = {
        (r["media_id"], r["ts_ms"]) for r in sample_frames(media, 1000).collect()
    }
    assert got == {(1, 0), (1, 1000), (2, 0), (2, 1000), (3, 0)}


def test_solr_date_string_is_session_timezone_proof(spark):
    """The canonical Solr date string is UTC no matter what
    spark.sql.session.timeZone is (round-5 review, live-verified: a
    non-UTC session previously rendered local wall time with a 'Z')."""
    from solr_sematic_importer_spark.operators.enrich import solr_date_string

    df = spark.createDataFrame([(1700000000000,)], "ms long")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = df.select(solr_date_string(F.col("ms")).alias("d")).first()["d"]
            assert got == "2023-11-14T22:13:20.000Z", (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_flatten_repeated_message_recurses_to_leaves(spark):
    """Repeated messages flatten to one multiValued column per LEAF like
    the Java visitor — nested structs, Timestamps and inner repeated
    fields inside the element must not survive as array<struct>
    (round-5 review)."""
    from solr_sematic_importer_spark.operators.flatten import flatten_records

    df = spark.createDataFrame(
        [
            (
                1,
                [
                    {"name": "a", "created": {"seconds": 100, "nanos": 0},
                     "tags": ["x", "y"]},
                    {"name": "b", "created": {"seconds": 200, "nanos": 0},
                     "tags": ["z"]},
                ],
            )
        ],
        "id long, items array<struct<name: string, "
        "created: struct<seconds: long, nanos: int>, tags: array<string>>>",
    )
    out = flatten_records(df)
    types = dict(out.dtypes)
    assert types["items_name"] == "array<string>"
    assert types["items_created"] == "array<timestamp>"
    assert types["items_tags"] == "array<string>"  # inner repeated pooled
    row = out.first()
    assert row["items_name"] == ["a", "b"]
    assert row["items_tags"] == ["x", "y", "z"]
    assert [t.timestamp() for t in row["items_created"]] == [100.0, 200.0]


def test_chunker_guards_and_token_trim(spark):
    import pytest as _pytest

    from solr_sematic_importer_spark.operators.chunking import (
        char_chunks,
        token_window_chunks,
    )

    df = spark.createDataFrame([(0, "  hello world  ")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overlap"):
        char_chunks(df, size=100, overlap=100)
    with _pytest.raises(ValueError, match="overlap"):
        token_window_chunks(df, size=100, overlap=150)
    row = token_window_chunks(df, size=10, overlap=2).first()
    assert row["chunk"] == "hello world"  # no empty tokens / edge spaces


def test_block_join_string_parent_ids(spark):
    """parent_id_type='string' serves arbitrary Solr-style ids, and the
    parent is everything before the TRAILING #%07d (a parent containing
    '#' must not be truncated at its first '#') — round-5 review."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.chunking import block_join_parent_topk

    chunks = spark.createDataFrame(
        [
            ("docA#x#0000000", "alpha beta gamma"),
            ("docA#x#0000001", "alpha alpha alpha"),
            ("docB#0000000", "beta beta"),
        ],
        "id string, chunk string",
    )
    cidx = build_index(chunks, text_col="chunk", key_cols=("id",), profile="simple")
    got = block_join_parent_topk(
        cidx, "alpha", k=5, parent_id_type="string", quantize=False
    ).collect()
    assert [r["parent_id"] for r in got] == ["docA#x"]
    assert got[0]["best_chunk"].startswith("docA#x#")


def test_embed_validation_and_null_texts(spark):
    from solr_sematic_importer_spark.operators.embed import (
        embed_texts,
        validate_vector_field,
    )

    ok = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "id long, v array<double>"
    )
    validate_vector_field(ok, "v", 2)
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "id long, v array<double>"
    )
    with pytest.raises(ValueError, match="violate dim"):
        validate_vector_field(bad, "v", 2)  # NULL vector must be caught

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "None")], "id long, chunk string"
    )
    out = {r["id"]: list(r["embedding"])
           for r in embed_texts(docs, drop_null=False, dim=8).collect()}
    # a NULL text embeds like the EMPTY string, never like the literal 'None'
    assert out[0] == out[1]
    assert out[0] != out[2]

"""File sources, record flattening, and streaming incremental build."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from solr_sematic_importer_spark.operators.flatten import (
    EMPTY_SENTINEL,
    flatten_map_keys,
    flatten_records,
)
from solr_sematic_importer_spark.operators.score import bm25_topk
from solr_sematic_importer_spark.operators.segments import (
    read_manifest,
    read_segmented_index,
)
from solr_sematic_importer_spark.sources.files import (
    json_docs,
    msmarco_tsv,
    solr_select_envelope,
)
from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts
from solr_sematic_importer_spark.streaming.incremental import incremental_index_query


def test_msmarco_tsv(spark, tmp_path):
    p = tmp_path / "docs.tsv"
    p.write_text("D1\thttp://a\tTitle A\tbody text a\nD2\thttp://b\tTitle B\tbody b\n")
    df = msmarco_tsv(spark, str(p))
    rows = {r["docid"]: r for r in df.collect()}
    assert rows["D1"]["title"] == "Title A"
    assert rows["D2"]["body"] == "body b"


def test_json_docs_strips_version(spark, tmp_path):
    p = tmp_path / "docs.json"
    p.write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"id": "1", "title": "a", "_version_": 123},
                {"id": "2", "title": "b", "_version_": 456},
            ]
        )
    )
    df = json_docs(spark, str(p))
    assert "_version_" not in df.columns
    assert df.count() == 2


def test_solr_select_envelope(spark, tmp_path):
    env = {
        "responseHeader": {"QTime": 5},
        "response": {
            "numFound": 2,
            "start": 0,
            "docs": [{"id": "a", "title": "x"}, {"id": "b", "title": "y"}],
        },
    }
    p = tmp_path / "resp.json"
    p.write_text(json.dumps(env))
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("title", T.StringType())]
    )
    df = solr_select_envelope(spark, str(p), schema)
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == ["a", "b"]
    assert rows[0]["num_found"] == 2 and rows[0]["qtime"] == 5


def test_flatten_records(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                {"name": "n1", "inner": {"x": 5}},
                [1, 2, 3],
                [{"a": "p", "b": 1}, {"a": "q", "b": 2}],
                {"seconds": 1704067200, "nanos": 0},
                {"k1": "v1", "k2": "v2"},
            )
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "msg",
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField(
                                "inner",
                                T.StructType([T.StructField("x", T.LongType())]),
                            ),
                        ]
                    ),
                ),
                T.StructField("nums", T.ArrayType(T.LongType())),
                T.StructField(
                    "items",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("a", T.StringType()),
                                T.StructField("b", T.LongType()),
                            ]
                        )
                    ),
                ),
                T.StructField(
                    "ts",
                    T.StructType(
                        [
                            T.StructField("seconds", T.LongType()),
                            T.StructField("nanos", T.LongType()),
                        ]
                    ),
                ),
                T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
            ]
        ),
    )
    out = flatten_records(df)
    row = out.collect()[0]
    assert row["msg_name"] == "n1"
    assert row["msg_inner_x"] == 5
    assert row["nums"] == [1, 2, 3]
    assert row["items_a"] == ["p", "q"]          # repeated -> multiValued
    assert row["items_b"] == [1, 2]
    assert str(row["ts"]).startswith("2024-01-01")
    assert sorted(row["attrs"]) == ["k1=v1", "k2=v2"]

    keyed = flatten_map_keys(df.select("id", "attrs"), "attrs", ["k1", "k2"])
    krow = keyed.collect()[0]
    assert krow["attrs_k1"] == "v1" and krow["attrs_k2"] == "v2"


def test_flatten_empty_struct_sentinel(spark):
    df = spark.range(1).select(
        F.col("id"), F.struct().alias("empty")
    )
    out = flatten_records(df)
    assert out.collect()[0]["empty"] == EMPTY_SENTINEL


def test_streaming_incremental_build(spark, tmp_path):
    # stage transcript rows as three parquet files, stream them with
    # maxFilesPerTrigger=1 -> one segment per micro-batch
    src = str(tmp_path / "src")
    full = synthetic_transcripts(spark, 40).persist()
    full.filter(F.col("conv_id") < "conv_00000015").coalesce(1).write.parquet(
        f"{src}/f1"
    )
    full.filter(
        (F.col("conv_id") >= "conv_00000015") & (F.col("conv_id") < "conv_00000030")
    ).coalesce(1).write.parquet(f"{src}/f2")
    full.filter(F.col("conv_id") >= "conv_00000030").coalesce(1).write.parquet(
        f"{src}/f3"
    )

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/f*")
    )
    idx_path = str(tmp_path / "stridx")
    q = incremental_index_query(
        stream, idx_path, str(tmp_path / "ckpt"), bucket_bits=8
    )
    q.awaitTermination(300)

    man = read_manifest(spark, idx_path)
    assert len(man) >= 1
    assert int(man["n_docs"].sum()) == full.count()
    idx = read_segmented_index(spark, idx_path)
    got = bm25_topk(idx, "zeppelin", k=5).collect()
    assert len(got) >= 1


def test_msmarco_tsv_quote_char_is_data(spark, tmp_path):
    """MS MARCO is raw tab-split text: a field STARTING with a double
    quote must not flip the CSV reader into quoted mode and swallow
    tabs (round-5 review)."""
    p = tmp_path / "quoted.tsv"
    p.write_text('D1\thttp://a\t"Quoted title\tbody with "quotes" inside\n')
    row = msmarco_tsv(spark, str(p)).collect()[0]
    assert row["docid"] == "D1"
    assert row["title"] == '"Quoted title'
    assert row["body"] == 'body with "quotes" inside'


def test_solr_select_envelope_zero_results(spark, tmp_path):
    """A zero-result /select envelope keeps one row with null doc
    columns so num_found/qtime stay observable (round-5 review)."""
    import json as _json

    from pyspark.sql import types as T

    from solr_sematic_importer_spark.sources.files import solr_select_envelope

    p = tmp_path / "empty.json"
    p.write_text(_json.dumps({
        "responseHeader": {"QTime": 7},
        "response": {"numFound": 0, "start": 0, "docs": []},
    }))
    schema = T.StructType([T.StructField("id", T.StringType())])
    rows = solr_select_envelope(spark, str(p), schema).collect()
    assert len(rows) == 1
    assert rows[0]["num_found"] == 0 and rows[0]["qtime"] == 7
    assert rows[0]["id"] is None

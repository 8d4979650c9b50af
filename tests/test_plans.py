"""Physical-plan property assertions (the scale claims, checked)."""

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.build import (
    build_and_write_index,
    read_index,
)
from solr_sematic_importer_spark.operators.score import bm25_topk
from solr_sematic_importer_spark.plans.explain import (
    assert_column_pruned,
    assert_scan_pushdown,
    codegen_stage_count,
    has_node,
    pushed_filters,
)
from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts


@pytest.fixture(scope="module")
def disk_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("planidx"))
    build_and_write_index(
        synthetic_transcripts(spark, 40), path, profile="text_en",
        bucket_bits=8, write_flat=True,
    )
    return read_index(spark, path)


def test_query_term_predicate_reaches_scan(disk_idx):
    q = bm25_topk(disk_idx, "zeppelin quartz", k=5)
    assert_scan_pushdown(q, "In(term")


def test_topk_plans_as_take_ordered(disk_idx):
    q = bm25_topk(disk_idx, "zeppelin", k=5)
    assert has_node(q, "TakeOrderedAndProject")
    assert has_node(q, "BroadcastHashJoin") or has_node(q, "BroadcastNestedLoopJoin")


def test_scoring_stays_in_codegen(disk_idx):
    q = bm25_topk(disk_idx, "zeppelin quartz", k=5)
    assert codegen_stage_count(q, execute=True) >= 1


def test_projection_prunes_scan_columns(disk_idx):
    df = disk_idx.postings_flat.select("term", "doc_id").filter(
        F.col("term") == "zeppelin"
    )
    assert_column_pruned(df, "dl_quant")
    assert pushed_filters(df)


def test_block_metadata_scan_skips_binary_columns(disk_idx):
    # the WAND upper-bound pass reads only block METADATA — binary payload
    # columns must be pruned from that scan
    ub = (
        disk_idx.postings_blocks.filter(F.col("term") == "zeppelin")
        .groupBy("bucket_id")
        .agg(F.max("max_impact").alias("ub"))
    )
    assert_column_pruned(ub, "doc_bytes")
    assert_column_pruned(ub, "norm_bytes")

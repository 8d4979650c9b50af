"""Segmented build, manifest resume, and LSM compaction (SURVEY §5.2 item 5:
kill/resume without re-tokenization, identical final index)."""

import shutil

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.block_postings import bm25_topk_wand
from solr_sematic_importer_spark.operators.build import build_index
from solr_sematic_importer_spark.operators.score import bm25_topk
from solr_sematic_importer_spark.operators.segments import (
    append_segment,
    compact,
    read_manifest,
    read_segmented_index,
)
from solr_sematic_importer_spark.sources.transcripts import synthetic_transcripts

N_CONVS = 90
QUERIES = ["zeppelin quartz", "the you one word", "running indexes"]


@pytest.fixture(scope="module")
def seg_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("segidx"))
    full = synthetic_transcripts(spark, N_CONVS).persist()
    slices = [
        full.filter(F.col("conv_id") < "conv_00000030"),
        full.filter(
            (F.col("conv_id") >= "conv_00000030") & (F.col("conv_id") < "conv_00000060")
        ),
        full.filter(F.col("conv_id") >= "conv_00000060"),
    ]
    results = [
        append_segment(spark, path, f"seg{i}", s, bucket_bits=8)
        for i, s in enumerate(slices)
    ]
    return path, full, slices, results


def test_offsets_contiguous(spark, seg_path):
    path, full, _, results = seg_path
    assert [r.skipped for r in results] == [False, False, False]
    total = 0
    for r in results:
        assert r.doc_id_offset == total
        total += r.n_docs
    assert total == full.count()
    man = read_manifest(spark, path)
    assert len(man) == 3
    assert (man["docs_per_sec"] > 0).all()


def test_segmented_equals_oneshot(spark, seg_path):
    path, full, _, _ = seg_path
    # slices are in conv_id order -> segment doc ids == global rank ids
    seg_idx = read_segmented_index(spark, path)
    one = build_index(full, profile="text_en")
    assert seg_idx.n_docs == one.n_docs and seg_idx.sum_dl == one.sum_dl
    for q in QUERIES:
        a = [(r["doc_id"], r["score"]) for r in
             bm25_topk(seg_idx, q, k=10).select("doc_id", "score").collect()]
        b = [(r["doc_id"], r["score"]) for r in
             bm25_topk(one, q, k=10).select("doc_id", "score").collect()]
        assert [d for d, _ in a] == [d for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-12)


def test_resume_skips_completed(spark, seg_path):
    path, _, slices, _ = seg_path
    # re-append an already-committed key: must skip without building
    r = append_segment(spark, path, "seg1", slices[1], bucket_bits=8)
    assert r.skipped
    assert len(read_manifest(spark, path)) == 3


def test_crash_resume_rebuilds_only_missing(spark, seg_path, tmp_path):
    path, full, slices, _ = seg_path
    # simulate a crash between segment write and manifest commit for seg2:
    # copy manifest with only seg0+seg1 rows into a fresh index dir
    path2 = str(tmp_path / "crashidx")
    man = read_manifest(spark, path)
    for i in (0, 1):
        append_segment(spark, path2, f"seg{i}", slices[i], bucket_bits=8)
    # resume run: seg0/seg1 skipped, seg2 built at the correct offset
    rs = [append_segment(spark, path2, f"seg{i}", slices[i], bucket_bits=8)
          for i in range(3)]
    assert [r.skipped for r in rs] == [True, True, False]
    man2 = read_manifest(spark, path2)
    assert list(man2["doc_id_offset"]) == list(man["doc_id_offset"])
    assert list(man2["checksum"]) == list(man["checksum"])
    idx2 = read_segmented_index(spark, path2)
    idx1 = read_segmented_index(spark, path)
    for q in QUERIES[:1]:
        a = bm25_topk(idx1, q, k=10).select("doc_id", "score").collect()
        b = bm25_topk(idx2, q, k=10).select("doc_id", "score").collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_compact_preserves_results(spark, seg_path):
    path, full, _, _ = seg_path
    before_idx = read_segmented_index(spark, path)
    before = {
        q: [(r["doc_id"], r["score"]) for r in bm25_topk_wand(before_idx, q, k=10).collect()]
        for q in QUERIES
    }
    n_blocks_rows = before_idx.postings_blocks.count()
    total_cnt = before_idx.postings_blocks.agg(F.sum("cnt")).first()[0]

    compact(spark, path)
    man = read_manifest(spark, path)
    assert len(man) == 1 and man["segment_key"].iloc[0] == "compacted"

    after_idx = read_segmented_index(spark, path)
    assert after_idx.postings_blocks.agg(F.sum("cnt")).first()[0] == total_cnt
    # boundary buckets merged -> row count can only shrink or stay
    assert after_idx.postings_blocks.count() <= n_blocks_rows
    for q in QUERIES:
        after = [(r["doc_id"], r["score"]) for r in bm25_topk_wand(after_idx, q, k=10).collect()]
        assert [d for d, _ in after] == [d for d, _ in before[q]], q
        for (_, sa), (_, sb) in zip(after, before[q]):
            assert sa == pytest.approx(sb, abs=1e-12)


def test_gc_removes_orphan_segment_dirs(spark, seg_path):
    # runs AFTER test_compact_preserves_results (definition order): the
    # manifest now references only the compacted segment; lo/mid/hi dirs
    # are orphans
    import os

    from solr_sematic_importer_spark.operators.segments import gc_segments

    path, _, _, _ = seg_path
    removed = gc_segments(spark, path)
    assert removed  # the three pre-compaction segment dirs
    live = {os.path.basename(d) for d in read_manifest(spark, path)["segment_dir"]}
    on_disk = set(os.listdir(os.path.join(path, "segments")))
    assert on_disk == live
    assert gc_segments(spark, path) == []  # idempotent
    idx = read_segmented_index(spark, path)
    assert bm25_topk(idx, QUERIES[0], k=5).count() > 0

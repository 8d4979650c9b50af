"""The north-star launch mode, actually launched: a real ``spark-submit
--py-files engine.zip`` subprocess builds an index, a re-submit of the
same segment key is a checkpoint-resume no-op, and the host session can
query the result (BASELINE.json north_rule: "run via spark-submit
--py-files")."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spark_submit = shutil.which("spark-submit")
pytestmark = pytest.mark.skipif(
    spark_submit is None, reason="spark-submit not on PATH"
)


def _submit(args, tmp):
    zip_path = os.path.join(tmp, "engine.zip")
    if not os.path.exists(zip_path):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"), zip_path],
            check=True, capture_output=True,
        )
    cmd = [
        spark_submit, "--master", "local[4]", "--py-files", zip_path,
        os.path.join(REPO, "scripts", "submit_build.py"),
        "--shuffle-partitions", "8",
    ] + args
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=560, cwd=tmp,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)

def test_submit_build_then_resume_then_query(spark, tmp_path):
    tmp = str(tmp_path)
    seg_root = os.path.join(tmp, "segidx")
    m1 = _submit(
        ["--input", "synthetic:300", "--output", seg_root,
         "--segment-key", "batch-001"], tmp,
    )
    assert m1["n_docs"] > 0 and m1["skipped"] is False

    # checkpoint resume: same key re-submitted -> no rebuild
    m2 = _submit(
        ["--input", "synthetic:300", "--output", seg_root,
         "--segment-key", "batch-001"], tmp,
    )
    assert m2["skipped"] is True and m2["n_docs"] == m1["n_docs"]

    # the submitted index answers queries in a fresh (host) session
    from solr_sematic_importer_spark.operators.segments import (
        read_segmented_index,
    )
    from solr_sematic_importer_spark.operators.score import bm25_topk

    idx = read_segmented_index(spark, seg_root)
    assert idx.n_docs == m1["n_docs"]
    top = bm25_topk(idx, "you one word", k=5).collect()
    assert len(top) == 5

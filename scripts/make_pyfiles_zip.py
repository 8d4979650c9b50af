#!/usr/bin/env python
"""Build the --py-files archive for spark-submit: one zip holding the
``solr_sematic_importer_spark`` package (same archive ``session.py``
self-ships for programmatic sessions)."""

import os
import shutil
import sys
import tempfile


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ssi_engine.zip"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "solr_sematic_importer_spark")
    tmp = tempfile.mkdtemp()
    try:
        stage = os.path.join(tmp, "stage")
        shutil.copytree(pkg, os.path.join(stage, "solr_sematic_importer_spark"))
        base = shutil.make_archive(os.path.join(tmp, "engine"), "zip", stage)
        os.replace(base, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Text-stats hardening: ANSI-mode division guards (Spark 4 defaults
spark.sql.ansi.enabled=true, so an unguarded x/0 kills the whole job on
the first degenerate document)."""

from pyspark.sql import functions as F

from solr_sematic_importer_spark.operators.textstats import (
    quality_score,
    stopword_ratio,
    token_stats,
)


def test_token_stats_survives_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "real words here"), (1, ""), (2, "!!! ..."), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_stats(df.fillna({"text": ""})).collect()}
    assert len(rows) == 4  # one row per doc, no DIVIDE_BY_ZERO abort
    assert rows[0]["n_tokens"] > 0 and rows[0]["avg_token_len"] > 0
    for d in (1, 2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["avg_token_len"] is None
    # the sibling guards stay crash-free on the same corpus
    assert stopword_ratio(df.fillna({"text": ""})).count() == 4
    assert quality_score(df.fillna({"text": ""})).count() == 4

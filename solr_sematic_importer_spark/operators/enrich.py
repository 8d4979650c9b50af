"""Document enrichment operators (SURVEY §2.2 P4-P7, §2.8 F1-F8).

The reference enriches every in-flight doc on the driver thread, one at a
time (``SolrSemanticIndexer.java:217-224``): crawl id (P4,
``:226-228``), crawl/creation dates with a Long/Date coercion fallback
chain (P5/F1/F2, ``:230-262``), string truncation before embedding (P6,
``InlineDocumentListener.java:93-99``), ``_version_`` strip (P1,
``JsonToSolrDocParser.java:81``), and JSON re-serialization (F8,
``solr/SolrDocumentConverter.java:22-31``). Here each is a declarative
column expression — whole-stage-codegen'd, zero Python — applied to the
whole table at once.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, functions as F

# Solr's canonical date wire format (``SolrSemanticIndexer.java:255-262``).
SOLR_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def new_crawl_id() -> str:
    """Per-run constant (F7, ``SolrSemanticIndexer.java:87``): generated
    once on the driver — NOT per-row nondeterministic uuid()."""
    return str(uuid.uuid4())


def enrich_for_crawl(
    df: DataFrame,
    crawl_id: str,
    creation_date_col: str | None = None,
) -> DataFrame:
    """P4 + P5: stamp ``crawl_id`` (run constant) and ``crawl_date``
    (job-start timestamp, Solr ISO-8601 UTC string), and normalize an
    optional epoch-millis/timestamp/string ``creation_date`` column through
    the reference's coercion fallback chain (F2)."""
    import datetime as _dt

    # driver-computed constant, like crawl_id: current_timestamp() is
    # re-evaluated per ACTION, so two sinks (or a retried stage) would
    # stamp different crawl_dates on one logical run
    now = _dt.datetime.now(_dt.timezone.utc)
    crawl_date = now.strftime("%Y-%m-%dT%H:%M:%S.") + f"{now.microsecond // 1000:03d}Z"
    out = df.withColumn("crawl_id", F.lit(crawl_id)).withColumn(
        "crawl_date", F.lit(crawl_date)
    )
    if creation_date_col is not None:
        out = out.withColumn(
            creation_date_col, solr_date_string(F.col(creation_date_col))
        )
    return out


def solr_date_string(col) -> Column:
    """F1/F2: Long (epoch millis) | timestamp | parseable string ->
    canonical Solr date string; unparseable -> NULL (the reference logs and
    keeps the raw value; we surface NULL for explicit handling)."""
    s = col.cast("string")
    as_ts = F.coalesce(
        F.to_timestamp(F.timestamp_millis(s.try_cast("long"))),
        s.try_cast("timestamp"),
    )
    # render in UTC regardless of spark.sql.session.timeZone:
    # date_format prints in the SESSION zone (and to_utc_timestamp(ts,
    # 'UTC') is an identity no-op), so the old expression emitted
    # session-local wall time with a 'Z' suffix — off by the session's
    # UTC offset on any non-UTC cluster. convert_timezone shifts the
    # instant to UTC wall time first, making the string session-proof.
    return F.date_format(
        F.convert_timezone(None, F.lit("UTC"), as_ts), SOLR_DATE_FMT
    )


def truncate_field(
    df: DataFrame, col: str, max_chars: int, out_col: str | None = None
) -> DataFrame:
    """P6: ``StringUtils.truncate(fieldData, maxChars)``."""
    return df.withColumn(out_col or col, F.substring(F.col(col), 1, max_chars))


def strip_fields(df: DataFrame, *cols: str) -> DataFrame:
    """P1: drop internal fields (``_version_``) if present."""
    return df.drop(*[c for c in cols if c in df.columns])


def with_chunk_ids(
    df: DataFrame, parent_col: str = "parent_id", number_col: str = "chunk_number"
) -> DataFrame:
    """F4+F5: ``id = parent + '#' + %07d(chunkNo)``
    (``ChunkDocumentListener.java:142``)."""
    return df.withColumn(
        "id",
        F.concat_ws(
            "#",
            F.col(parent_col).cast("string"),
            F.lpad(F.col(number_col).cast("string"), 7, "0"),
        ),
    )


def to_json_docs(df: DataFrame) -> DataFrame:
    """F8: re-serialize each row as a JSON document string
    (``SolrDocumentConverter.java:22-31``)."""
    return df.select(
        *df.columns, F.to_json(F.struct(*df.columns)).alias("_json")
    )


def filter_null_field(df: DataFrame, col: str) -> DataFrame:
    """P7: skip docs whose embed/chunk source field is null
    (``InlineDocumentListener.java:72-75``)."""
    return df.filter(F.col(col).isNotNull())

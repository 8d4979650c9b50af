"""File-based sources (SURVEY §2.1 S3/S5).

* ``msmarco_tsv``: the reference streams the MS MARCO docs tgz into a
  bounded queue of TSV rows (``solr/client/MsMarcoDownloader.java:50-90``,
  columns docid/url/title/body). Spark replaces the download+queue with a
  distributed CSV scan — schema explicit so the scan never infers.
* ``json_docs``: the reference parses Solr JSON select envelopes doc by
  doc with typed token dispatch and strips ``_version_``
  (``solr/JsonToSolrDocParser.java:58-101,136-176``). Spark: schema-on-read
  ``spark.read.json`` / ``from_json`` + ``drop`` — one declarative scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MSMARCO_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def msmarco_tsv(spark: SparkSession, path: str) -> DataFrame:
    # quote disabled: MS MARCO is raw tab-split text (the reference reads
    # it line-by-line); the CSV reader's default '\"' quoting would treat
    # a field STARTING with a double quote as quoted and swallow tabs up
    # to the closing quote, shifting url/title/body into wrong columns
    return spark.read.csv(
        path, sep="\t", schema=MSMARCO_SCHEMA, header=False, multiLine=False,
        quote="",
    )


def json_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    strip: tuple = ("_version_",),
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.drop(*[c for c in strip if c in df.columns])


def solr_select_envelope(
    spark: SparkSession, path: str, doc_schema: T.StructType
) -> DataFrame:
    """Parse a Solr ``/select`` JSON response file: explode
    ``response.docs`` into rows, carrying numFound/QTime
    (``JsonToSolrDocParser.java:58-101`` envelope fields)."""
    env = T.StructType(
        [
            T.StructField(
                "responseHeader",
                T.StructType([T.StructField("QTime", T.LongType())]),
            ),
            T.StructField(
                "response",
                T.StructType(
                    [
                        T.StructField("numFound", T.LongType()),
                        T.StructField("start", T.LongType()),
                        T.StructField("docs", T.ArrayType(doc_schema)),
                    ]
                ),
            ),
        ]
    )
    raw = spark.read.schema(env).option("multiLine", "true").json(path)
    # explode_outer: a zero-result envelope (numFound=0, docs=[]) keeps
    # one row with null doc columns so the caller can still observe
    # num_found/qtime — plain explode would drop the envelope entirely
    return raw.select(
        F.col("response.numFound").alias("num_found"),
        F.col("responseHeader.QTime").alias("qtime"),
        F.explode_outer("response.docs").alias("doc"),
    ).select("num_found", "qtime", "doc.*")

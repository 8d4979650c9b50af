"""Table access shim: Iceberg catalog when available, parquet paths here.

SURVEY §1.3 maps the reference's Solr collections to Iceberg tables; this
sandbox has no Iceberg runtime jar, so every engine component reads and
writes path-based parquet through these two functions. With an Iceberg
catalog configured (``spark.sql.catalog.<name>`` + the runtime jar on the
classpath) the same calls hit catalog tables and writes become atomic
snapshot commits — no other engine code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_table_ref(ref: str) -> bool:
    # catalog.db.table identifiers vs filesystem paths
    return "/" not in ref and not ref.startswith(("file:", "s3:", "hdfs:"))


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """``catalog.db.table`` -> Iceberg/catalog read; path -> parquet."""
    if _is_table_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Catalog refs use the DataFrameWriterV2 path (atomic snapshot commit
    on Iceberg); filesystem paths use parquet."""
    if _is_table_ref(ref):
        w = df.writeTo(ref)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
    else:
        df.write.mode(mode).parquet(ref)

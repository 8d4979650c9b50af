"""Nested-record flattening (SURVEY §2.1 S4, §1.2 layer 2).

The reference ingests protobuf ``Message``s by flattening them to flat
Solr fields (``enhancers/ProtobufToSolrDocument.java:22-155``):

* nested message -> fields joined with ``_`` path prefixes (:40-51)
* ``repeated`` -> multiValued field (:73-85)
* ``map<k,v>`` -> one field per key, named ``<field>_<key>`` (:80-85)
* ``google.protobuf.Timestamp`` -> date (:116-122)
* ``Duration`` -> ISO-8601 string (:110-114)
* ``BytesValue`` -> UTF-8 string (:104-108)
* ``FieldMask`` -> comma-joined paths (:87-91)
* ``Empty`` -> ``"__EMPTY__"`` sentinel (:93-96)

Binary protobuf decoding itself needs ``spark-protobuf`` /
``google.protobuf`` (absent in this environment — ``from_protobuf`` is
the drop-in when present and produces exactly the nested struct columns
this operator consumes). The flatten SEMANTICS are what the reference
implements in Java per-message; here they are a schema-driven projection
— pure Catalyst expressions derived from the DataFrame's StructType, no
UDF, applied to whole columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

EMPTY_SENTINEL = "__EMPTY__"


def _is_timestamp_struct(dt: T.StructType) -> bool:
    names = {f.name for f in dt.fields}
    return names == {"seconds", "nanos"}


def _flatten_field(col: Column, name: str, dt: T.DataType, out: list) -> None:
    if isinstance(dt, T.StructType):
        if not dt.fields:
            # Empty message -> sentinel (ProtobufToSolrDocument.java:93-96)
            out.append(F.lit(EMPTY_SENTINEL).alias(name))
            return
        if _is_timestamp_struct(dt):
            # Timestamp{seconds,nanos} -> timestamp (:116-122)
            out.append(
                F.timestamp_seconds(
                    col["seconds"] + col["nanos"] / F.lit(1_000_000_000)
                ).alias(name)
            )
            return
        if {f.name for f in dt.fields} == {"paths"}:
            # FieldMask -> comma-joined (:87-91)
            out.append(F.concat_ws(",", col["paths"]).alias(name))
            return
        for f in dt.fields:
            _flatten_field(col[f.name], f"{name}_{f.name}", f.dataType, out)
        return
    if isinstance(dt, T.MapType):
        # map -> one field per key needs the key set; keep Spark-native:
        # map entries become a multiValued "k=v" field plus map_keys for
        # per-key extraction downstream (exact per-key projection requires
        # a known key set — see flatten_map_keys)
        out.append(
            F.transform(
                F.map_entries(col),
                lambda e: F.concat_ws("=", e["key"].cast("string"), e["value"].cast("string")),
            ).alias(name)
        )
        return
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        # repeated message: one multiValued column per leaf field of the
        # element struct (repeated -> multiValued, :73-85)
        def _extract(field_name):
            return F.transform(col, lambda e: e[field_name])

        for f in dt.elementType.fields:
            out.append(_extract(f.name).alias(f"{name}_{f.name}"))
        return
    if isinstance(dt, T.BinaryType):
        # BytesValue -> UTF-8 string (:104-108)
        out.append(col.cast("string").alias(name))
        return
    if isinstance(dt, T.DayTimeIntervalType):
        out.append(col.cast("string").alias(name))
        return
    out.append(col.alias(name))


def flatten_records(df: DataFrame) -> DataFrame:
    """Flatten every nested column per the reference's rules. Column order
    follows depth-first field order, like the Java visitor."""
    out: list = []
    for f in df.schema.fields:
        _flatten_field(F.col(f.name), f.name, f.dataType, out)
    return df.select(*out)


def flatten_map_keys(df: DataFrame, map_col: str, keys: list[str]) -> DataFrame:
    """Exact reference map semantics when the key set is known: one column
    ``<map_col>_<key>`` per key (``ProtobufToSolrDocument.java:80-85``)."""
    cols = [c for c in df.columns if c != map_col]
    return df.select(
        *cols,
        *[F.col(map_col)[k].alias(f"{map_col}_{k}") for k in keys],
    )

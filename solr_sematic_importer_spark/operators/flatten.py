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


def _elem_exprs(dt: T.StructType, get, prefix: str):
    """Leaf projections of one ARRAY ELEMENT struct, recursively:
    [(column_name, builder(element)->Column, n_inner_array_levels)].
    ``get`` positions the element column at ``dt``; ``wraps`` counts how
    many times the resulting outer array must be flattened (one per
    inner repeated level — the reference pools nested repeats into one
    multiValued field)."""
    # NOTE: every builder MUST be a ONE-parameter callable — pyspark's
    # higher-order-function bridge inspects the callable's arity and
    # passes that many lambda variables, so default-argument closures
    # break; plain closure factories keep the arity at 1.
    def _field_of(parent_get, field_name):
        def g(e):
            return parent_get(e)[field_name]
        return g

    def _sentinel(_e):
        return F.lit(EMPTY_SENTINEL)

    def _ts_of(g):
        def b(e):
            v = g(e)
            return F.timestamp_seconds(
                v["seconds"] + v["nanos"] / F.lit(1_000_000_000)
            )
        return b

    def _mask_of(g):
        def b(e):
            return F.concat_ws(",", g(e)["paths"])
        return b

    def _str_of(g):
        def b(e):
            return g(e).cast("string")
        return b

    def _inner_transform(g, ib):
        def b(e):
            return F.transform(g(e), ib)
        return b

    def _identity(e):
        return e

    res = []
    for f in dt.fields:
        nm = f"{prefix}_{f.name}"
        g = _field_of(get, f.name)
        fdt = f.dataType
        if isinstance(fdt, T.StructType):
            if not fdt.fields:
                res.append((nm, _sentinel, 0))
            elif _is_timestamp_struct(fdt):
                res.append((nm, _ts_of(g), 0))
            elif {x.name for x in fdt.fields} == {"paths"}:
                res.append((nm, _mask_of(g), 0))
            else:
                res.extend(_elem_exprs(fdt, g, nm))
        elif isinstance(fdt, T.ArrayType):
            if isinstance(fdt.elementType, T.StructType):
                for inm, ib, iw in _elem_exprs(fdt.elementType, _identity, nm):
                    res.append((inm, _inner_transform(g, ib), iw + 1))
            else:
                res.append((nm, g, 1))
        elif isinstance(fdt, T.BinaryType):
            res.append((nm, _str_of(g), 0))
        else:
            res.append((nm, g, 0))
    return res


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
        # repeated message: one multiValued column per LEAF field of the
        # element struct (repeated -> multiValued, :73-85). The Java
        # visitor recurses to leaves, so nested structs / Timestamps /
        # inner repeated fields inside the element flatten too — a
        # one-level extraction would leave array<struct> columns behind.
        for leaf_name, builder, wraps in _elem_exprs(
            dt.elementType, lambda e: e, name
        ):
            expr = F.transform(col, builder)
            for _ in range(wraps):  # inner repeated levels pool flat
                expr = F.flatten(expr)
            out.append(expr.alias(leaf_name))
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

"""Proto3 wire decoder (S4): real wire bytes -> decode -> flatten ->
indexable rows, with the reference's type conversions
(ProtobufToSolrDocument.java:22-155)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from solr_sematic_importer_spark.sources.protowire import (
    decode_message,
    decode_protobuf_records,
    encode_message,
    flat_schema_ddl,
    flatten_decoded,
)

# src/test/resources/person.proto
PERSON = {1: ("id", "int32"), 2: ("name", "string"), 3: ("email", "string")}

RICH = {
    1: ("person", "message", {"schema": PERSON}),
    2: ("tags", "string", {"repeated": True}),
    3: ("attrs", "map", {"key": "string", "value": "string", "keys": ["color", "size"]}),
    4: ("scores", "int64", {"repeated": True}),
    5: ("created", "timestamp", {}),
    6: ("elapsed", "duration", {}),
    7: ("blob", "bytes_value", {}),
    8: ("mask", "field_mask", {}),
    9: ("nothing", "empty", {}),
    10: ("delta", "sint64", {}),
    11: ("ratio", "double", {}),
    12: ("flag", "bool", {}),
}


def test_person_roundtrip():
    msg = {"id": 7, "name": "Ada Lovelace", "email": "ada@example.com"}
    wire = encode_message(msg, PERSON)
    assert decode_message(wire, PERSON) == msg


def test_rich_roundtrip_and_reference_flatten_semantics():
    created = dt.datetime(2024, 10, 8, 12, 0, 0, 500000, tzinfo=dt.timezone.utc)
    msg = {
        "person": {"id": 1, "name": "Bob", "email": "b@x"},
        "tags": ["alpha", "beta"],
        "attrs": {"color": "red", "size": "L"},
        "scores": [3, -9, 12],
        "created": created,
        "elapsed": 3723.5,  # 1h 2m 3.5s
        "blob": "hello bytes",
        "mask": ["a.b", "c"],
        "nothing": "__EMPTY__",
        "delta": -12345,
        "ratio": 2.5,
        "flag": True,
    }
    wire = encode_message(msg, RICH)
    dec = decode_message(wire, RICH)
    flat = flatten_decoded(dec, RICH)
    # '_'-joined nested names (ProtobufToSolrDocument.java:41)
    assert flat["person_id"] == 1 and flat["person_name"] == "Bob"
    # repeated -> multiValued (:73-78); map -> per-key fields (:80-85)
    assert flat["tags"] == ["alpha", "beta"]
    assert flat["attrs_color"] == "red" and flat["attrs_size"] == "L"
    assert flat["scores"] == [3, -9, 12]
    # Timestamp -> epoch-millis datetime (:116-122)
    assert flat["created"] == created
    # Duration -> ISO-8601 java.time string (:110-114)
    assert flat["elapsed"] == "PT1H2M3.5S"
    # BytesValue -> UTF-8 string (:104-108); FieldMask -> comma-joined
    # (:87-91); Empty -> sentinel (:93-96)
    assert flat["blob"] == "hello bytes"
    assert flat["mask"] == "a.b, c"
    assert flat["nothing"] == "__EMPTY__"
    assert flat["delta"] == -12345 and flat["ratio"] == 2.5 and flat["flag"] is True


def test_packed_repeated_and_unknown_field_skip():
    # hand-built wire: field 4 (scores) packed varints [1, 300], plus an
    # unknown field 99 (varint) the decoder must skip
    from solr_sematic_importer_spark.sources.protowire import _write_varint

    packed = _write_varint(1) + _write_varint(300)
    wire = (
        _write_varint((99 << 3) | 0) + _write_varint(42)       # unknown
        + _write_varint((4 << 3) | 2) + _write_varint(len(packed)) + packed
    )
    dec = decode_message(wire, RICH)
    assert dec == {"scores": [1, 300]}


def test_negative_int32_ten_byte_varint():
    wire = encode_message({"id": -5, "name": "n", "email": "e"}, PERSON)
    assert decode_message(wire, PERSON)["id"] == -5


def test_map_without_declared_keys_refuses_flatten_schema():
    schema = {1: ("m", "map", {"key": "string", "value": "string"})}
    with pytest.raises(ValueError, match="keys"):
        flat_schema_ddl(schema)


def test_decode_protobuf_records_to_index(spark):
    """The full S4 path: wire bytes in a binary column -> Arrow-batched
    decode+flatten -> analyzed/indexed like any other source."""
    from solr_sematic_importer_spark.operators.build import build_index
    from solr_sematic_importer_spark.operators.score import bm25_topk

    people = [
        (i, encode_message(
            {"id": i, "name": f"person number {i} likes zeppelins", "email": f"p{i}@x"},
            PERSON,
        ))
        for i in range(20)
    ]
    df = spark.createDataFrame(people, "row_id long, payload binary")
    dec = decode_protobuf_records(df, PERSON, keep_cols=["row_id"])
    assert set(dec.columns) == {"row_id", "id", "name", "email"}
    rows = {r["id"]: r for r in dec.collect()}
    assert len(rows) == 20 and rows[3]["email"] == "p3@x"

    idx = build_index(
        dec, text_col="name", key_cols=(), profile="simple", doc_id_col="id"
    )
    top = bm25_topk(idx, "zeppelins", k=5, quantize=False).collect()
    assert len(top) == 5


def test_solr_schema_fields_matches_reference_enhancer():
    """ProtobufToSolrSchema.java: '_'-joined flat names, JavaType class
    names, well-known-type overrides (Timestamp->Date, Duration->String,
    BytesValue->Binary), repeated/map keep their element JavaType."""
    from solr_sematic_importer_spark.sources.protowire import solr_schema_fields

    got = dict(solr_schema_fields(RICH))
    assert got["person_id"] == "INT" and got["person_name"] == "STRING"
    assert got["tags"] == "STRING"          # repeated keeps element type
    assert got["attrs"] == "STRING"         # map keeps value type
    assert got["scores"] == "LONG"
    assert got["created"] == "Date"
    assert got["elapsed"] == "String"
    assert got["blob"] == "Binary"
    assert got["delta"] == "LONG" and got["ratio"] == "DOUBLE"
    assert got["flag"] == "BOOLEAN"
    # names are emitted in field-number order within each message
    names = [n for n, _ in solr_schema_fields(PERSON)]
    assert names == ["id", "name", "email"]


def test_descriptor_to_struct_nested(spark):
    """The Spark-native schema: nesting preserved, and a DataFrame built
    with it round-trips decoded (unflattened) messages."""
    from pyspark.sql import types as T

    from solr_sematic_importer_spark.sources.protowire import (
        decode_message,
        descriptor_to_struct,
        encode_message,
    )

    st = descriptor_to_struct(RICH)
    assert isinstance(st["person"].dataType, T.StructType)
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert st["attrs"].dataType == T.MapType(T.StringType(), T.StringType())
    assert st["scores"].dataType == T.ArrayType(T.LongType())
    assert st["created"].dataType == T.TimestampType()
    assert st["ratio"].dataType == T.DoubleType()

    msg = {
        "person": {"id": 1, "name": "n", "email": "e"},
        "tags": ["a", "b"],
        "attrs": {"color": "red"},
        "scores": [5, 6],
        "delta": -9,
        "ratio": 0.5,
        "flag": True,
    }
    dec = decode_message(encode_message(msg, RICH), RICH)
    row = spark.createDataFrame([dec], st).first()
    assert row["person"]["name"] == "n" and row["scores"] == [5, 6]
    assert row["attrs"]["color"] == "red" and row["flag"] is True


# ---------------------------------------------------------------------------
# round-5 review: real-serializer wire shapes the fixture encoder never emits
# ---------------------------------------------------------------------------


def test_packed_repeated_float_double_decode():
    """proto3 serializers PACK repeated numeric scalars by default: one
    length-delimited chunk of fixed-width values. The decoder must accept
    both packed and unpacked forms (the fixture encoder writes unpacked)."""
    import struct

    from solr_sematic_importer_spark.sources.protowire import _write_varint

    schema = {1: ("emb", "float", {"repeated": True}),
              2: ("weights", "double", {"repeated": True})}
    floats = [1.5, -2.25, 0.0, 3.75]
    doubles = [0.1, -7.5]
    payload_f = b"".join(struct.pack("<f", v) for v in floats)
    payload_d = b"".join(struct.pack("<d", v) for v in doubles)
    wire = (
        _write_varint((1 << 3) | 2) + _write_varint(len(payload_f)) + payload_f
        + _write_varint((2 << 3) | 2) + _write_varint(len(payload_d)) + payload_d
    )
    got = decode_message(wire, schema)
    assert got["emb"] == pytest.approx(floats)
    assert got["weights"] == pytest.approx(doubles)


def test_map_entry_default_key_and_value():
    """A proto3 serializer omits default-valued map entry fields: a
    missing key means '' and a missing value means the value type's
    default — not None (which would flatten to a bogus 'attrs_None')."""
    from solr_sematic_importer_spark.sources.protowire import _write_varint

    schema = {1: ("attrs", "map",
                  {"key": "string", "value": "string", "keys": [""]})}
    # entry with ONLY field 2 (value): key omitted == ""
    inner = _write_varint((2 << 3) | 2) + _write_varint(3) + b"abc"
    wire = _write_varint((1 << 3) | 2) + _write_varint(len(inner)) + inner
    assert decode_message(wire, schema) == {"attrs": {"": "abc"}}
    # entry with ONLY field 1 (key): value omitted == ""
    inner2 = _write_varint((1 << 3) | 2) + _write_varint(1) + b"k"
    wire2 = _write_varint((1 << 3) | 2) + _write_varint(len(inner2)) + inner2
    assert decode_message(wire2, schema) == {"attrs": {"k": ""}}


def test_negative_enum_sign_extended():
    """Enum values are int32 varints sign-extended to 64 bits on the
    wire; a negative enum must decode negative, not as 2^64+v."""
    from solr_sematic_importer_spark.sources.protowire import _write_varint

    schema = {1: ("kind", "enum")}
    wire = _write_varint(1 << 3) + _write_varint((1 << 64) - 3)  # -3
    assert decode_message(wire, schema) == {"kind": -3}

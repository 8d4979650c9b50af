"""Protobuf WIRE-format source (S4): schema-driven pure-Python decoder.

The reference ingests real ``Message`` objects and flattens them to Solr
docs (``solr/ProtobufSolrIndexer.java:33-47``,
``enhancers/ProtobufToSolrDocument.java:22-155``). The spark-protobuf jar
(``from_protobuf``) is the drop-in for deployments that ship it; this
module provides the jar-free path: a clean-room proto3 wire decoder
(varint / zigzag / fixed / length-delimited per the published protobuf
encoding spec) driven by a descriptor dict, with the REFERENCE'S flatten
semantics applied on decode:

* nested message fields -> ``_``-joined flat names
  (``ProtobufToSolrDocument.java:41``)
* repeated -> multiValued list (:73-78)
* map -> one field per key, ``name_key`` (:80-85) — needs the caller to
  declare the key set (``keys=[...]``), the same requirement the
  schemaless Solr destination hides behind dynamic fields
* ``Timestamp`` -> datetime (epoch millis, :116-122)
* ``Duration`` -> ISO-8601 string (:110-114)
* ``BytesValue`` -> UTF-8 string (:104-108)
* ``FieldMask`` -> comma-joined paths (:87-91)
* ``Empty`` -> ``"__EMPTY__"`` sentinel (:93-96)

Descriptor format (one dict per message)::

    PERSON = {1: ("id", "int32"), 2: ("name", "string"), 3: ("email", "string")}
    # person.proto (src/test/resources/person.proto)
    NESTED = {1: ("person", "message", {"schema": PERSON}),
              2: ("tags", "string", {"repeated": True}),
              3: ("attrs", "map", {"key": "string", "value": "string",
                                    "keys": ["color", "size"]})}

An encoder for the same descriptors generates deterministic test
fixtures, so the decode path is exercised on real wire bytes without any
protobuf runtime in the container.
"""

from __future__ import annotations

import datetime as _dt
import struct as _struct
from typing import Iterator, Sequence

from pyspark.sql import DataFrame

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
_ZIGZAG_TYPES = {"sint32", "sint64"}
_LEN_TYPES = {
    "string", "bytes", "message", "map",
    "timestamp", "duration", "bytes_value", "field_mask", "empty",
}


def _field_opts(spec):
    return spec[2] if len(spec) > 2 else {}


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's complement, 10-byte negative ints
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int = 64) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_message(buf: bytes, schema: dict) -> dict:
    """Wire bytes -> nested dict per the descriptor. Unknown field numbers
    are skipped by wire type (forward compatibility, as the Java runtime
    does); repeated fields accumulate; packed repeated scalars supported."""
    out: dict = {}
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        spec = schema.get(fno)
        if spec is None:  # skip unknown field by wire type
            if wt == 0:
                _, pos = _read_varint(buf, pos)
            elif wt == 1:
                pos += 8
            elif wt == 2:
                ln, pos = _read_varint(buf, pos)
                pos += ln
            elif wt == 5:
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            continue
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        repeated = opts.get("repeated", False)

        def put(v):
            if repeated:
                out.setdefault(name, []).append(v)
            else:
                out[name] = v

        if wt == 0:
            raw, pos = _read_varint(buf, pos)
            put(_decode_scalar(raw, typ))
        elif wt == 1:
            (v,) = _struct.unpack_from("<d" if typ == "double" else "<q", buf, pos)
            pos += 8
            put(v)
        elif wt == 5:
            (v,) = _struct.unpack_from("<f" if typ == "float" else "<i", buf, pos)
            pos += 4
            put(v)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            chunk = buf[pos : pos + ln]
            pos += ln
            if typ == "string":
                put(chunk.decode("utf-8"))
            elif typ == "bytes":
                put(bytes(chunk))
            elif typ == "message":
                put(decode_message(chunk, opts["schema"]))
            elif typ == "map":
                # map entry = message {1: key, 2: value}; a proto3
                # serializer OMITS default-valued fields, so a missing
                # key/value means the type's default ('' / 0 / false),
                # not None — otherwise '' keys flatten to 'name_None'
                entry = decode_message(
                    chunk, {1: ("key", opts["key"]), 2: ("value", opts["value"])}
                )
                k = entry.get("key")
                if k is None:
                    k = _proto3_default(opts["key"])
                v = entry.get("value")
                if v is None:
                    v = _proto3_default(opts["value"])
                out.setdefault(name, {})[k] = v
            elif typ == "timestamp":
                ts = decode_message(chunk, {1: ("seconds", "int64"), 2: ("nanos", "int32")})
                ms = ts.get("seconds", 0) * 1000 + ts.get("nanos", 0) // 1_000_000
                put(_dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc))
            elif typ == "duration":
                d = decode_message(chunk, {1: ("seconds", "int64"), 2: ("nanos", "int32")})
                put(_iso_duration(d.get("seconds", 0), d.get("nanos", 0)))
            elif typ == "bytes_value":
                w = decode_message(chunk, {1: ("value", "bytes")})
                put(w.get("value", b"").decode("utf-8"))
            elif typ == "field_mask":
                m = decode_message(chunk, {1: ("paths", "string", {"repeated": True})})
                put(", ".join(m.get("paths", [])))
            elif typ == "empty":
                put("__EMPTY__")
            elif typ in _VARINT_TYPES | _ZIGZAG_TYPES:
                # packed repeated scalars
                p2 = 0
                while p2 < len(chunk):
                    raw, p2 = _read_varint(chunk, p2)
                    out.setdefault(name, []).append(_decode_scalar(raw, typ))
            elif typ in ("float", "double"):
                # packed repeated fixed-width scalars — proto3 packs
                # repeated numeric fields BY DEFAULT, so real serializers
                # emit embeddings etc. as one length-delimited chunk
                fmt, width = ("<f", 4) if typ == "float" else ("<d", 8)
                p2 = 0
                while p2 + width <= len(chunk):
                    (v,) = _struct.unpack_from(fmt, chunk, p2)
                    p2 += width
                    out.setdefault(name, []).append(v)
            else:
                raise ValueError(f"length-delimited type {typ} unsupported")
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


def _decode_scalar(raw: int, typ: str):
    if typ == "bool":
        return bool(raw)
    if typ in _ZIGZAG_TYPES:
        return _zigzag_dec(raw)
    if typ in ("int32", "int64", "enum"):
        # enum values are int32 varints sign-extended to 64 bits on the
        # wire: a negative enum decodes as 2^64+v without this
        return _to_signed(raw)
    return raw  # uint32/uint64 (unsigned; uint64 >= 2^63 exceeds Spark's
    #             long like it exceeds the reference's Solr plong)


def _proto3_default(typ: str):
    """The proto3 default for a scalar type — what an omitted field
    means on the wire."""
    if typ == "string":
        return ""
    if typ == "bytes":
        return b""
    if typ == "bool":
        return False
    if typ in ("float", "double"):
        return 0.0
    if typ == "message":
        return {}
    return 0  # all integer/enum types


def _iso_duration(seconds: int, nanos: int) -> str:
    """java.time.Duration.toString() semantics (PTnHnMnS with fractional
    seconds) — matches ProtobufToSolrDocument.java:110-114."""
    total = seconds + nanos / 1e9
    sign = "-" if total < 0 else ""
    total = abs(total)
    h = int(total // 3600)
    m = int((total % 3600) // 60)
    s = total - h * 3600 - m * 60
    parts = []
    if h:
        parts.append(f"{sign}{h}H")
    if m:
        parts.append(f"{sign}{m}M")
    if s or not parts:
        txt = f"{s:.9f}".rstrip("0").rstrip(".")
        parts.append(f"{sign}{txt}S")
    return "PT" + "".join(parts)


# ---------------------------------------------------------------------------
# encode (deterministic fixtures; inverse of decode for the same schema)
# ---------------------------------------------------------------------------


def encode_message(values: dict, schema: dict) -> bytes:
    out = bytearray()
    for fno in sorted(schema):
        spec = schema[fno]
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        if name not in values or values[name] is None:
            continue
        v = values[name]
        items = v if opts.get("repeated") else [v]
        if typ == "map":
            for mk, mv in v.items():
                entry = encode_message(
                    {"key": mk, "value": mv},
                    {1: ("key", opts["key"]), 2: ("value", opts["value"])},
                )
                out += _write_varint((fno << 3) | 2) + _write_varint(len(entry)) + entry
            continue
        for item in items:
            out += _encode_field(fno, typ, opts, item)
    return bytes(out)


def _encode_field(fno: int, typ: str, opts: dict, v) -> bytes:
    if typ in _VARINT_TYPES:
        raw = int(v)
        if typ == "bool":
            raw = 1 if v else 0
        return _write_varint(fno << 3) + _write_varint(raw)
    if typ in _ZIGZAG_TYPES:
        return _write_varint(fno << 3) + _write_varint(_zigzag_enc(int(v)))
    if typ == "double":
        return _write_varint((fno << 3) | 1) + _struct.pack("<d", float(v))
    if typ == "float":
        return _write_varint((fno << 3) | 5) + _struct.pack("<f", float(v))
    if typ == "string":
        b = str(v).encode("utf-8")
    elif typ == "bytes":
        b = bytes(v)
    elif typ == "message":
        b = encode_message(v, opts["schema"])
    elif typ == "timestamp":
        ts = v.timestamp() if isinstance(v, _dt.datetime) else float(v)
        b = encode_message(
            {"seconds": int(ts), "nanos": int(round((ts - int(ts)) * 1e9))},
            {1: ("seconds", "int64"), 2: ("nanos", "int32")},
        )
    elif typ == "duration":
        b = encode_message(
            {"seconds": int(v), "nanos": int(round((v - int(v)) * 1e9))},
            {1: ("seconds", "int64"), 2: ("nanos", "int32")},
        )
    elif typ == "bytes_value":
        b = encode_message({"value": str(v).encode("utf-8")}, {1: ("value", "bytes")})
    elif typ == "field_mask":
        b = encode_message(
            {"paths": list(v)}, {1: ("paths", "string", {"repeated": True})}
        )
    elif typ == "empty":
        b = b""
    else:
        raise ValueError(f"cannot encode type {typ}")
    return _write_varint((fno << 3) | 2) + _write_varint(len(b)) + b


# ---------------------------------------------------------------------------
# flatten (reference semantics) + Spark operator
# ---------------------------------------------------------------------------

_FLAT_SPARK_TYPE = {
    "int32": "long", "int64": "long", "uint32": "long", "uint64": "long",
    "sint32": "long", "sint64": "long", "enum": "long", "bool": "boolean",
    "double": "double", "float": "float", "string": "string",
    "bytes": "binary", "timestamp": "timestamp", "duration": "string",
    "bytes_value": "string", "field_mask": "string", "empty": "string",
}


def flatten_decoded(d: dict, schema: dict, prefix: str = "") -> dict:
    """Nested decoded dict -> flat dict with the reference's '_'-joined
    names, per-key map fields, multiValued repeated."""
    flat: dict = {}
    for spec in schema.values():
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        key = f"{prefix}_{name}" if prefix else name
        if name not in d:
            continue
        v = d[name]
        if typ == "message":
            if opts.get("repeated"):
                raise ValueError("repeated nested messages need explosion, not flatten")
            flat.update(flatten_decoded(v, opts["schema"], key))
        elif typ == "map":
            for mk, mv in v.items():
                flat[f"{key}_{mk}"] = mv
        else:
            flat[key] = v
    return flat


def flat_schema_ddl(schema: dict, prefix: str = "") -> list[tuple[str, str]]:
    """(column, spark type) pairs for the flattened record."""
    cols: list[tuple[str, str]] = []
    for fno in sorted(schema):
        spec = schema[fno]
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        key = f"{prefix}_{name}" if prefix else name
        if typ == "message":
            cols += flat_schema_ddl(opts["schema"], key)
        elif typ == "map":
            keys = opts.get("keys")
            if not keys:
                raise ValueError(
                    f"map field '{key}' needs keys=[...] to flatten per-key "
                    "(ProtobufToSolrDocument.java:80-85 requires the key set)"
                )
            cols += [(f"{key}_{mk}", _FLAT_SPARK_TYPE[opts["value"]]) for mk in keys]
        else:
            t = _FLAT_SPARK_TYPE[typ]
            cols.append((key, f"array<{t}>" if opts.get("repeated") else t))
    return cols


def decode_protobuf_records(
    df: DataFrame, schema: dict, bytes_col: str = "payload",
    keep_cols: Sequence = (),
) -> DataFrame:
    """Binary wire-format column -> flattened typed columns, Arrow-batched
    (one Python call per batch; the decoder is pure function, so Spark
    task retry re-decodes deterministically). The schema-driven shape
    means Catalyst sees concrete columns — downstream filters/projections
    prune as usual."""
    import pandas as pd

    keep_cols = list(keep_cols)
    cols = flat_schema_ddl(schema)
    in_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    ddl = ", ".join(
        [f"{c} {in_fields[c]}" for c in keep_cols]
        + [f"{c} {t}" for c, t in cols]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            recs = [
                flatten_decoded(decode_message(bytes(p), schema), schema)
                for p in b[bytes_col]
            ]
            out = pd.DataFrame({c: b[c] for c in keep_cols}) if keep_cols else pd.DataFrame(index=range(len(recs)))
            for c, _t in cols:
                out[c] = [r.get(c) for r in recs]
            yield out

    return df.select(*keep_cols, bytes_col).mapInPandas(kernel, ddl)


# ---------------------------------------------------------------------------
# descriptor -> schema generation (ProtobufToSolrSchema.java)
# ---------------------------------------------------------------------------

# protobuf JavaType names the reference emits as the Solr field class
# (FieldDescriptor.getJavaType().name(), ProtobufToSolrSchema.java:53,75,79),
# with the well-known-type overrides of handleMessageField (:58-68):
# Timestamp -> "Date", Duration -> "String", BytesValue -> "Binary",
# StringValue -> "String".
_JAVA_TYPE = {
    "int32": "INT", "uint32": "INT", "sint32": "INT",
    "int64": "LONG", "uint64": "LONG", "sint64": "LONG",
    "bool": "BOOLEAN", "enum": "ENUM", "float": "FLOAT", "double": "DOUBLE",
    "string": "STRING", "bytes": "BYTE_STRING",
    "timestamp": "Date", "duration": "String",
    "bytes_value": "Binary", "field_mask": "String", "empty": "String",
}


def solr_schema_fields(schema: dict, prefix: str = "") -> list[tuple[str, str]]:
    """Descriptor -> the reference's generated Solr schema: (field name,
    class) pairs with '_'-joined nested names, exactly
    ``ProtobufToSolrSchema.convertProtobufToSchemaDefinition`` minus the
    XML wrapper (each pair is one ``<fieldType name=.. class=..>``;
    repeated and map fields keep their element JavaType, :73-79)."""
    out: list[tuple[str, str]] = []
    for fno in sorted(schema):
        spec = schema[fno]
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        key = f"{prefix}_{name}" if prefix else name
        if typ == "message":
            out += solr_schema_fields(opts["schema"], key)
        elif typ == "map":
            out.append((key, _JAVA_TYPE[opts["value"]]))
        else:
            out.append((key, _JAVA_TYPE[typ]))
    return out


def descriptor_to_struct(schema: dict):
    """Descriptor -> Spark ``StructType`` preserving NESTING (the
    Spark-native analog of the reference's schema generation: messages
    as nested structs, repeated as arrays, maps as MapType). Use
    ``flat_schema_ddl`` for the flattened Solr-doc shape instead."""
    from pyspark.sql import types as T

    _atomic = {
        "int32": T.LongType(), "int64": T.LongType(),
        "uint32": T.LongType(), "uint64": T.LongType(),
        "sint32": T.LongType(), "sint64": T.LongType(),
        "enum": T.LongType(), "bool": T.BooleanType(),
        "double": T.DoubleType(), "float": T.FloatType(),
        "string": T.StringType(), "bytes": T.BinaryType(),
        "timestamp": T.TimestampType(), "duration": T.StringType(),
        "bytes_value": T.StringType(), "field_mask": T.StringType(),
        "empty": T.StringType(),
    }
    fields = []
    for fno in sorted(schema):
        spec = schema[fno]
        name, typ = spec[0], spec[1]
        opts = _field_opts(spec)
        if typ == "message":
            dt = descriptor_to_struct(opts["schema"])
        elif typ == "map":
            dt = T.MapType(T.StringType(), _atomic[opts["value"]])
        else:
            dt = _atomic[typ]
        if opts.get("repeated") and typ != "map":
            dt = T.ArrayType(dt)
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)

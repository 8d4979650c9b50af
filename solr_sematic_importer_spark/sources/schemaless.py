"""Schemaless field-type inference (Solr's add-unknown-fields chain).

The reference's destination collection runs Solr's schemaless update
chain on every ingested document (``semantic_base_config.zip ->
solrconfig.xml:891-947``): ``remove-blank`` drops empty-string values,
``field-name-mutating`` rewrites characters outside ``[\\w-.]`` to ``_``,
then ``parse-boolean -> parse-long -> parse-double -> parse-date`` try
string values in that order, and ``add-schema-fields`` maps the winning
value class to a field type — String -> text_general **plus a ``*_str``
copy-field truncated at 256 chars**, Boolean -> booleans, Long/Integer ->
plongs, Number -> pdoubles, Date -> pdates.

Batch divergence (documented): Solr fixes a field's type from the FIRST
document that creates it; a batch engine sees the whole column, so we
infer per COLUMN — a type wins only if EVERY non-blank value parses as
it. That is strictly safer (no mid-stream type clash -> 400 errors,
Solr's classic schemaless failure mode) and deterministic under
re-partitioning.

Scale shape: inference is ONE aggregate over the input (a handful of
count expressions per column — whole-stage codegen, no Python), then one
projection applying the winning casts. No shuffle beyond the single
partial+final agg.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# solrconfig.xml:900-910 format list, reduced to the unambiguous cores
# Spark's DateTimeFormatter expresses (the optional-section “[...]”
# variants are covered by trying the formats longest-first)
DEFAULT_DATE_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
)

_NAME_BAD = re.compile(r"[^\w\-.]")
_LONG_RE = r"^[+-]?[0-9]+$"
STR_COPY_MAX_CHARS = 256  # solrconfig.xml:917-920 copyField maxChars


def sanitize_field_name(name: str) -> str:
    """``field-name-mutating`` processor: pattern ``[^\\w-.]`` -> ``_``."""
    return _NAME_BAD.sub("_", name)


def _blank_to_null(c):
    """``remove-blank`` (RemoveBlankFieldUpdateProcessorFactory): exactly
    zero-length strings become null; whitespace-only values stay (Solr
    does not trim in this chain)."""
    return F.when(c == "", F.lit(None)).otherwise(c)


def _parse_date(c, formats):
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in formats])


def infer_field_types(
    df: DataFrame,
    date_formats=DEFAULT_DATE_FORMATS,
    str_copy: bool = True,
) -> tuple[DataFrame, dict[str, str]]:
    """Apply the schemaless chain to every string column of ``df``.

    Returns ``(typed_df, {sanitized_name: inferred_type})`` where
    inferred_type is one of ``boolean | long | double | date | text``.
    Non-string columns pass through unchanged (typed source columns are
    already "schema'd"). Text columns gain a ``<name>_str`` copy field
    truncated at 256 chars when ``str_copy`` (the ``*_str`` copyField).
    """
    str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    other = [f.name for f in df.schema.fields if f.name not in str_cols]

    # one aggregate pass: per column, how many non-blank values there are
    # and how many survive each parse (chain order: boolean, long, double,
    # date — first type that parses EVERY non-blank value wins)
    aggs = []
    for c in str_cols:
        v = _blank_to_null(F.col(c))
        aggs.append(F.count(v).alias(f"nn_{c}"))
        aggs.append(
            F.count(F.when(F.lower(v).isin("true", "false"), 1)).alias(f"nb_{c}")
        )
        aggs.append(
            F.count(
                F.when(v.rlike(_LONG_RE) & v.try_cast("bigint").isNotNull(), 1)
            ).alias(f"nl_{c}")
        )
        aggs.append(F.count(v.try_cast("double")).alias(f"nd_{c}"))
        aggs.append(F.count(_parse_date(v, date_formats)).alias(f"nt_{c}"))
    counts = df.agg(*aggs).first() if str_cols else {}

    types: dict[str, str] = {}
    out_cols = []
    for c in other:
        out_cols.append(F.col(c).alias(sanitize_field_name(c)))
        types[sanitize_field_name(c)] = df.schema[c].dataType.simpleString()
    for c in str_cols:
        name = sanitize_field_name(c)
        v = _blank_to_null(F.col(c))
        nn = counts[f"nn_{c}"]
        if nn and counts[f"nb_{c}"] == nn:
            t, col = "boolean", (F.lower(v) == "true")
        elif nn and counts[f"nl_{c}"] == nn:
            t, col = "long", v.cast("bigint")
        elif nn and counts[f"nd_{c}"] == nn:
            t, col = "double", v.cast("double")
        elif nn and counts[f"nt_{c}"] == nn:
            t, col = "date", _parse_date(v, date_formats)
        else:
            t, col = "text", v
        types[name] = t
        out_cols.append(col.alias(name))
        if t == "text" and str_copy:
            out_cols.append(
                F.substring(v, 1, STR_COPY_MAX_CHARS).alias(f"{name}_str")
            )
            types[f"{name}_str"] = "string"
    return df.select(*out_cols), types

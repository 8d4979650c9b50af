"""Schemaless add-unknown-fields chain (semantic_base_config.zip ->
solrconfig.xml:891-947): remove-blank, field-name mutation, the
parse-boolean -> long -> double -> date fallback order, and the text ->
*_str 256-char copy field. SURVEY §1.2's "not replicated" gap, closed."""

import datetime

import pytest

from solr_sematic_importer_spark.sources.schemaless import (
    STR_COPY_MAX_CHARS,
    infer_field_types,
    sanitize_field_name,
)


def test_sanitize_field_name():
    assert sanitize_field_name("order key!") == "order_key_"
    assert sanitize_field_name("a-b.c_d9") == "a-b.c_d9"  # [\w-.] kept
    assert sanitize_field_name("price($)") == "price___"


@pytest.fixture(scope="module")
def typed(spark):
    rows = [
        ("1", "true", "1.5", "2024-01-02 03:04:05", "hello world", "", "x" * 300, 7),
        ("2", "False", "2", "2024-02-03", "left as text", "beta", "y" * 10, 8),
        ("-3", "TRUE", "-0.25", "2024-03-04T05:06:07", "", "gamma", "z", 9),
    ]
    df = spark.createDataFrame(
        rows,
        "ints string, bools string, doubles string, dates string, "
        "`text col` string, blanky string, longtext string, already long",
    )
    out, types = infer_field_types(df)
    return out.orderBy("ints").collect(), types


def test_parse_chain_type_choices(typed):
    _, types = typed
    assert types["ints"] == "long"
    assert types["bools"] == "boolean"       # case-insensitive true/false
    assert types["doubles"] == "double"      # '2' alone is long, '1.5' forces double
    assert types["dates"] == "date"          # mixed format list
    assert types["text_col"] == "text"
    assert types["blanky"] == "text"         # blanks null, rest text
    assert types["already"] == "bigint"      # non-string passthrough


def test_values_and_blank_removal(typed):
    rows, _ = typed
    by_key = {r["ints"]: r for r in rows}
    assert sorted(by_key) == [-3, 1, 2]
    assert by_key[1]["bools"] is True and by_key[2]["bools"] is False
    assert by_key[1]["doubles"] == 1.5 and by_key[2]["doubles"] == 2.0
    assert by_key[1]["dates"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert by_key[2]["dates"] == datetime.datetime(2024, 2, 3)
    assert by_key[-3]["dates"] == datetime.datetime(2024, 3, 4, 5, 6, 7)
    # remove-blank: zero-length -> null (both in text and its _str copy)
    assert by_key[1]["blanky"] is None and by_key[1]["blanky_str"] is None
    assert by_key[-3]["text_col"] is None


def test_str_copy_field_truncation(typed):
    rows, types = typed
    assert types["longtext"] == "text" and types["longtext_str"] == "string"
    by_key = {r["ints"]: r for r in rows}
    assert len(by_key[1]["longtext"]) == 300           # original intact
    assert len(by_key[1]["longtext_str"]) == STR_COPY_MAX_CHARS
    assert by_key[2]["longtext_str"] == "y" * 10


def test_whitespace_only_stays_text(spark):
    df = spark.createDataFrame([(" ",), ("2",)], "v string")
    out, types = infer_field_types(df)
    # ' ' is NOT blank (Solr removes only zero-length) and doesn't parse
    # as long -> the column is text
    assert types["v"] == "text"
    assert {r["v"] for r in out.collect()} == {" ", "2"}


def test_all_blank_column_is_text_nulls(spark):
    df = spark.createDataFrame([("", "1"), ("", "2")], "e string, n string")
    out, types = infer_field_types(df)
    assert types["e"] == "text" and types["n"] == "long"
    assert [r["e"] for r in out.collect()] == [None, None]


def test_long_regex_rejects_float_and_junk(spark):
    df = spark.createDataFrame([("1",), ("2.0",)], "v string")
    _, types = infer_field_types(df)
    assert types["v"] == "double"
    df2 = spark.createDataFrame([("1",), ("1e3",)], "v string")
    _, types2 = infer_field_types(df2)
    assert types2["v"] == "double"  # 1e3 parses as double, not long

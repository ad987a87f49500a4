"""Sources/sinks connector layer (SURVEY.md §2.4/§2.5 mapping)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from vector_spark.sinks import write_sink
from vector_spark.sources import file_source, generator_source, read_source


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="vs_conn_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_generator_source_deterministic(spark):
    a = generator_source(spark, 50)
    b = generator_source(spark, 50)
    assert a.columns == ["id", "message"]
    assert [r.message for r in a.collect()] == [r.message for r in b.collect()]


def test_file_source_text_roundtrip(spark, tmp):
    spark.createDataFrame([("line one",), ("line two",)], "value string").write.text(
        f"{tmp}/logs"
    )
    df = file_source(spark, f"{tmp}/logs", fmt="text")
    assert {r.message for r in df.collect()} == {"line one", "line two"}


def test_file_source_json_with_schema(spark, tmp):
    spark.createDataFrame([(1, "a")], "id long, s string").write.json(f"{tmp}/j")
    df = file_source(spark, f"{tmp}/j", fmt="json", schema="id long, s string")
    assert df.first().s == "a"


def test_read_source_dispatch(spark, tmp):
    spark.range(5).write.parquet(f"{tmp}/p")
    df = read_source(spark, {"type": "file", "path": f"{tmp}/p", "format": "parquet"})
    assert df.count() == 5
    gen = read_source(spark, {"type": "generator", "count": 7})
    assert gen.count() == 7
    with pytest.raises(ValueError):
        read_source(spark, {"type": "nope"})


def test_write_sink_parquet_partitioned(spark, tmp):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    write_sink(df, {"type": "file", "path": f"{tmp}/out", "partition_by": ["k"]})
    back = spark.read.parquet(f"{tmp}/out")
    assert back.count() == 2
    assert any("k=" in f for f in back.inputFiles())


def test_write_sink_ndjson_encoding(spark, tmp):
    df = spark.createDataFrame([("x", 1)], "k string, v int")
    write_sink(df, {"type": "file", "path": f"{tmp}/nd", "encoding": "ndjson"})
    line = spark.read.text(f"{tmp}/nd").first().value
    assert '"k":"x"' in line and '"v":1' in line


def test_write_sink_blackhole_and_console(spark, capsys):
    df = spark.createDataFrame([("x",)], "k string")
    write_sink(df, {"type": "blackhole"})
    write_sink(df, {"type": "console", "encoding": "json", "limit": 1})
    assert '"k":"x"' in capsys.readouterr().out


def test_streaming_file_source_requires_schema(spark, tmp):
    with pytest.raises(ValueError):
        file_source(spark, f"{tmp}/x", fmt="text", streaming=True)


def test_file_source_multiline_stacktrace(spark, tmp_path):
    """file.rs:63-100 multiline: continuation lines (stack frames)
    fold into the opening event; events and order per file."""
    log = tmp_path / "app.log"
    log.write_text(
        "2020-01-01 ERROR boom\n"
        "  at Foo.bar(Foo.java:1)\n"
        "  at Baz.qux(Baz.java:2)\n"
        "2020-01-01 INFO fine\n"
        "2020-01-01 ERROR again\n"
        "  at A.b(C.java:3)\n"
    )
    from vector_spark.sources.readers import file_source

    out = file_source(
        spark,
        str(tmp_path),
        multiline={"start_pattern": r"^\d{4}-\d{2}-\d{2}", "join_with": "\n"},
    )
    msgs = [r.message for r in out.orderBy("line").collect()]
    assert msgs == [
        "2020-01-01 ERROR boom\n  at Foo.bar(Foo.java:1)\n  at Baz.qux(Baz.java:2)",
        "2020-01-01 INFO fine",
        "2020-01-01 ERROR again\n  at A.b(C.java:3)",
    ]


def test_file_source_multiline_orphans_and_blank_lines(spark, tmp_path):
    """Review r2: lines before the first start match are emitted as
    standalone events (no data loss), and blank lines INSIDE an event
    survive (stack traces contain them)."""
    from vector_spark.sources.readers import file_source

    log = tmp_path / "b.log"
    log.write_text(
        "orphan line\n"
        "START one\n"
        " cont a\n"
        "\n"
        " cont b\n"
        "START two\n"
    )
    out = file_source(spark, str(tmp_path), multiline={"start_pattern": r"^START"})
    msgs = [r.message for r in out.orderBy("line").collect()]
    assert msgs == [
        "orphan line",
        "START one\n cont a\n\n cont b",
        "START two",
    ]

"""The ported reference behavior corpus — one pytest per TOML file in
tests/behavior_corpus/ (translations of
/root/reference/tests/behavior/transforms/*.toml into this engine's
config dialect; each file's header documents its dialect mapping).

lua_v1/lua_v2 are ported as direct exercises of the mapInPandas
extension point (`custom_stage`) since a Lua runtime is out of scope —
the semantic content of those files (field rename/delete, field
insertion, per-event custom logic) is asserted on the same inputs.
"""

from __future__ import annotations

import glob
import os

import pytest

from vector_spark.fixtures import enrich_sources
from vector_spark.testing import run_behavior_file

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "behavior_corpus")
CORPUS_FILES = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.toml")))


@pytest.mark.parametrize(
    "path", CORPUS_FILES, ids=[os.path.basename(p)[: -len(".toml")] for p in CORPUS_FILES]
)
def test_behavior_corpus_file(spark, path):
    with open(path) as f:
        toml_text = f.read()
    results = run_behavior_file(
        spark, toml_text, enrich_tables={"sources": enrich_sources(spark)}
    )
    assert results, f"{path}: no [[tests]] found"
    failed = [r for r in results if not r.passed]
    assert not failed, {r.name: r.failures for r in failed}


# -- lua_v1.toml / lua_v2.toml ports (extension point) ------------------------
# The batch functions are defined INSIDE each test: closures pickle by
# value, while module-level functions pickle by reference to a module
# the executor cannot import.


def test_lua_v1_corpus_rename_field(spark):
    """lua_v1: event["a"], event["b"] = nil, event["a"] — move field
    a into b (tests/behavior/transforms/lua_v1.toml)."""
    from vector_spark.operators.remap import custom_stage

    def rename_a_to_b(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["b"] = pdf["a"]
            yield pdf.drop(columns=["a"])

    df = spark.createDataFrame([("example value",)], "a string")
    out = custom_stage(df, rename_a_to_b, schema="b string")
    rows = out.collect()
    assert "a" not in out.columns
    assert [r.b for r in rows] == ["example value"]


def test_lua_v2_corpus_insert_field(spark):
    """lua_v2 hook_process: event.log.inserted_field = "inserted value"
    (tests/behavior/transforms/lua_v2.toml lua_v2_source)."""
    from vector_spark.operators.remap import custom_stage

    def insert_field(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["inserted_field"] = "inserted value"
            yield pdf

    df = spark.createDataFrame([("some value",)], "some_field string")
    out = custom_stage(
        df, insert_field, schema="some_field string, inserted_field string"
    )
    r = out.first()
    assert r.some_field == "some value" and r.inserted_field == "inserted value"


def test_lua_v2_corpus_conditional_emit(spark):
    """lua_v2 process hooks can also DROP events (emit conditionally) —
    the harness analogue of the v2 hook contract."""
    from vector_spark.operators.remap import custom_stage

    def emit_filtered(batches):
        for pdf in batches:
            yield pdf[pdf["keep"]].drop(columns=["keep"])

    df = spark.createDataFrame(
        [("x", True), ("y", False)], "val string, keep boolean"
    )
    out = custom_stage(df, emit_filtered, schema="val string")
    assert [r.val for r in out.collect()] == ["x"]


# -- config formats (tests/behavior/formats/simple.{toml,json,yaml,yml}) -----
# The reference loads one identical topology from all four config
# formats; files are read from the reference checkout at test time.

_FORMATS_DIR = "/root/reference/tests/behavior/formats"


@pytest.mark.skipif(
    not os.path.isdir(_FORMATS_DIR), reason="reference formats corpus absent"
)
@pytest.mark.parametrize("ext", ["toml", "json", "yaml", "yml"])
def test_config_format_corpus(spark, ext):
    from vector_spark.testing import run_behavior_file

    path = os.path.join(_FORMATS_DIR, f"simple.{ext}")
    fmt = "yaml" if ext == "yml" else ext
    results = run_behavior_file(spark, open(path).read(), fmt=fmt)
    assert results, "no tests found in config"
    for r in results:
        assert r.passed, (path, r.failures)

"""VRL program compiler (control flow / locals / del / abort):
symbolic execution to one projection, remap-transform abort semantics.
Reference: lib/vrl/compiler/src/expression/{if_statement,assignment,
block,variable}.rs; abort per src/transforms/remap.rs:77-127."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators import remap_program

PROG = """
# classify latency with control flow + locals
threshold = 100
if .latency > threshold * 2 {
    .bucket = "critical"
    .weight = .latency * 2
} else if .latency > threshold {
    .bucket = "slow"
    .weight = .latency
} else {
    .bucket = "fast"
    .weight = 0
}
if .level == "error" {
    .alert = true
    del(.extra)
} else {
    .alert = false
}
.summary = .level + ":" + .bucket
if .level == "debug" { abort }
"""


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "error", 500, "a"),
            (2, "info", 35, "b"),
            (3, "warn", 120, None),
            (4, "debug", 7, "d"),
        ],
        "id long, level string, latency long, extra string",
    )


def test_program_control_flow_locals_del_abort(spark):
    got = {r.id: r for r in remap_program(_frame(spark), PROG).collect()}
    assert (got[1].bucket, got[1].weight, got[1].alert) == ("critical", 1000, True)
    assert got[1].extra is None  # del inside the error branch
    assert got[1].summary == "error:critical"
    assert (got[2].bucket, got[2].weight, got[2].alert) == ("fast", 0, False)
    assert got[2].extra == "b"  # non-error rows keep the field
    assert (got[3].bucket, got[3].weight) == ("slow", 120)
    # aborted row passes through UNMODIFIED: no assignments, extra kept
    assert got[4].bucket is None and got[4].weight is None
    assert got[4].extra == "d" and got[4].summary is None


def test_program_drop_on_abort(spark):
    out = remap_program(_frame(spark), PROG, drop_on_abort=True)
    assert out.count() == 3
    assert out.filter("level = 'debug'").count() == 0


def test_program_single_projection_plan(spark):
    """The whole program compiles to a projection — no shuffle, no UDF,
    one whole-stage codegen span over the scan."""
    out = remap_program(_frame(spark), PROG)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_program_sequential_visibility(spark):
    """Later statements see earlier assignments; locals fold away."""
    df = spark.createDataFrame([(2,)], "x long")
    out = remap_program(
        df,
        """
        base = .x * 10
        .y = base + 1
        .z = .y * 2
        """,
    ).first()
    assert (out.y, out.z) == (21, 42)


def test_program_unconditional_del_drops_column(spark):
    df = spark.createDataFrame([(1, "s")], "a long, b string")
    out = remap_program(df, "del(.b)\n.c = .a + 1")
    assert out.columns == ["a", "c"]


def test_program_branch_var_is_null_on_other_path(spark):
    df = spark.createDataFrame([(1,), (20,)], "x long")
    out = {
        r.x: r.lab
        for r in remap_program(
            df,
            """
            if .x > 10 { big = "yes" }
            .lab = big
            """,
        ).collect()
    }
    assert out[20] == "yes" and out[1] is None


def test_program_if_as_expression_value(spark):
    df = spark.createDataFrame([(5,)], "x long")
    out = remap_program(
        df, '.kind = if .x > 3 { "hi" } else { "lo" }'
    ).first()
    assert out.kind == "hi"


def test_program_string_concat_null_and_repeat(spark):
    df = spark.createDataFrame([("a", None)], "s string, t string")
    out = remap_program(
        df,
        """
        .c = .s + "-" + .t
        .r = "ab" * 3
        """,
    ).first()
    assert out.c == "a-"  # VRL: null contributes nothing to string +
    assert out.r == "ababab"


def test_program_abort_flag_field(spark):
    out = remap_program(
        _frame(spark), PROG, abort_flag_field="_aborted"
    )
    flags = {r.id: r._aborted for r in out.collect()}
    assert flags == {1: False, 2: False, 3: False, 4: True}

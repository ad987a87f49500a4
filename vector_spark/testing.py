"""Behavior-test harness: Vector's config unit-test framework.

Reference: src/config/unit_test.rs:11-57 (build_unit_tests_main) and
the `[[tests]]` schema used by tests/behavior/transforms/*.toml —
each test gives ``inputs`` (events inserted at a named transform) and
``outputs`` (conditions asserted on the events extracted from a named
transform / route lane); ``no_outputs_from`` asserts empty lanes.

Here a test drives the SAME Pipeline compiler used in production over
an in-memory DataFrame and asserts per-extraction row sets — the
pytest-facing port of `vector test`.

Test spec (dict or TOML [[tests]] table):

    {"name": "...",
     "input_rows": [ {...}, ... ],         # rows for the "in" frame
     "input_schema": "a string, b int",
     "outputs": [
        {"extract_from": "router.hot",
         "conditions": ['.a == "x"', ...],  # every row must satisfy ALL
         "expect_rows": 2},                 # optional exact count
     ],
     "no_outputs_from": ["router.empty_lane"]}
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition
from vector_spark.plans.pipeline import ROUTE_PREFIX, Pipeline
from vector_spark.telemetry import Telemetry, live


@dataclass
class BehaviorResult:
    name: str
    passed: bool
    failures: list[str] = field(default_factory=list)


def _extract(pipe: Pipeline, frames, ref: str):
    """Resolve 'transform' or 'router.lane' to its output frame."""
    if "." in ref and ref.split(".")[0] in pipe._routes:
        router, lane = ref.split(".", 1)
        base = frames[router]
        return live(base.filter(F.col(ROUTE_PREFIX + lane))).drop(
            *[c for c in base.columns if c.startswith(ROUTE_PREFIX)]
        )
    return live(frames[ref])


def run_behavior_test(
    spark: SparkSession,
    config: dict[str, Any],
    test: dict[str, Any],
    enrich_tables=None,
) -> BehaviorResult:
    pipe = Pipeline(config, enrich_tables=enrich_tables)
    if "input_rows" not in test and "input" in test:
        # the reference's NATIVE [tests.input] form (unit tests in
        # tests/behavior/formats/*): type raw carries one message line;
        # type log carries a field map
        inp = test["input"]
        if inp.get("type") == "log":
            fields = dict(inp.get("log_fields", {}))
            schema = ", ".join(
                f"`{k}` " + (
                    "bigint" if isinstance(v, int) and not isinstance(v, bool)
                    else "boolean" if isinstance(v, bool)
                    else "double" if isinstance(v, float)
                    else "string"
                )
                for k, v in fields.items()
            )
            test = {**test, "input_rows": [tuple(fields.values())],
                    "input_schema": schema}
        else:  # raw
            test = {**test, "input_rows": [(inp.get("value", ""),)],
                    "input_schema": "message string"}
    df = spark.createDataFrame(test["input_rows"], test["input_schema"])

    # run transforms only (no sinks) — mirror unit_test.rs which builds
    # ONLY the transform chain
    frames = {"in": df}
    telemetry_sink = Telemetry()
    for name in pipe._order:
        spec = dict(pipe.transforms[name])
        typ = spec.pop("type")
        inputs = spec.pop("inputs", ["in"]) or ["in"]  # [] = test input
        src = pipe._resolve_input(frames, inputs)
        frames[name] = pipe._apply(name, typ, spec, src, telemetry_sink)

    failures: list[str] = []
    for out in test.get("outputs", []):
        ref = out["extract_from"]
        got = _extract(pipe, frames, ref)
        # column-absence assertions (the reference's `!exists(.field)`
        # on a dropped/renamed field — on a fixed schema that's a
        # schema-level fact, not a per-row one)
        for fld in out.get("absent_fields", []):
            if fld in got.columns:
                failures.append(f"{ref}: field {fld!r} should be absent")
        for fld in out.get("present_fields", []):
            if fld not in got.columns:
                failures.append(f"{ref}: field {fld!r} should be present")
        n = got.count()
        if "expect_rows" in out and n != out["expect_rows"]:
            failures.append(f"{ref}: expected {out['expect_rows']} rows, got {n}")
        for cond in out.get("conditions", []):
            bad = got.filter(~F.coalesce(compile_condition(cond), F.lit(False))).count()
            if bad:
                failures.append(f"{ref}: {bad} rows violate {cond!r}")
        if n == 0 and "expect_rows" not in out:
            failures.append(f"{ref}: produced no rows (outputs require >=1)")
    for ref in test.get("no_outputs_from", []):
        got = _extract(pipe, frames, ref)
        n = got.count()
        if n:
            failures.append(f"{ref}: expected NO rows, got {n}")
    return BehaviorResult(test.get("name", "unnamed"), not failures, failures)


def run_behavior_file(
    spark: SparkSession, toml_text: str, enrich_tables=None, fmt: str = "toml"
):
    """A full behavior file: pipeline config + [[tests]] tables.
    fmt selects toml/json/yaml — the reference loads the same topology
    from any of them (tests/behavior/formats/)."""
    from vector_spark.plans.config import load_pipeline_config, parse_config_text

    raw = parse_config_text(toml_text, fmt)
    config = load_pipeline_config(toml_text, fmt)
    results = []
    for test in raw.get("tests", []):
        results.append(
            run_behavior_test(spark, config, test, enrich_tables=enrich_tables)
        )
    return results

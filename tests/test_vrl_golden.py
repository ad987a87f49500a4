"""VRL golden-corpus conformance: run the reference's own behavior
tests (lib/vrl/tests/tests/**/*.vrl, `# object:` / `# result:` headers)
through the vrl_program compiler on one-row frames.

The corpus files are read from the reference checkout at test time —
nothing is copied into this repo. Tests skip when the reference tree is
absent.

SUPPORTED lists the files this engine reproduces bit-for-bit (57 of the
133 result-bearing files). The excluded categories are documented
divergences, inherent to compiling VRL to a statically-typed Catalyst
plan rather than interpreting it per event:

- fallible-assignment targets (`ok, err = expr`) and the merge
  operators (`|`, `|=`): unported surface (assignment.rs / op.rs).
- files whose EXPECTED value is a list of runtime type-error strings
  ("can't add type …"): VRL type errors are first-class runtime
  values; here they are nulls (try_* arithmetic), so the error text
  cannot be observed (arithmetic/*/invalid.vrl).
- `"true" == true` → false in VRL (strict cross-type equality); Spark
  coerces the string and yields true (equality/eq.vrl, ne.vrl).
- `true && "foo" ?? "nope"`: non-boolean logical operands are runtime
  errors in VRL; a Catalyst boolean op cannot produce a
  different-typed fallback value in one column (logical/*).
- timestamp (`t'…'`) literals, `@metadata` queries, path-coalescing
  (`.(a | b)`), nested-path assignment (`.a.b = x`), and keyword
  arguments: unported syntax.
- abort.vrl: the VRL test harness observes the event AT the abort
  point; this engine implements the remap-transform semantics
  (abort = event passes through unmodified / dropped), so the
  intermediate state is not observable.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import Row

CORPUS = Path("/root/reference/lib/vrl/tests/tests")

pytestmark = pytest.mark.skipif(
    not CORPUS.is_dir(), reason="reference VRL corpus not available"
)

SUPPORTED = [
    "example.vrl",
    "expressions/arithmetic/addition/float.vrl",
    "expressions/arithmetic/addition/float_integer.vrl",
    "expressions/arithmetic/addition/integer.vrl",
    "expressions/arithmetic/addition/integer_float.vrl",
    "expressions/arithmetic/addition/null_string.vrl",
    "expressions/arithmetic/addition/string_null.vrl",
    "expressions/arithmetic/addition/string_string.vrl",
    "expressions/arithmetic/division/float.vrl",
    "expressions/arithmetic/division/float_integer.vrl",
    "expressions/arithmetic/division/integer.vrl",
    "expressions/arithmetic/division/integer_float.vrl",
    "expressions/arithmetic/multiplication/float.vrl",
    "expressions/arithmetic/multiplication/float_integer.vrl",
    "expressions/arithmetic/multiplication/integer.vrl",
    "expressions/arithmetic/multiplication/integer_float.vrl",
    "expressions/arithmetic/multiplication/integer_string.vrl",
    "expressions/arithmetic/multiplication/string_integer.vrl",
    "expressions/arithmetic/remainder/float.vrl",
    "expressions/arithmetic/remainder/float_integer.vrl",
    "expressions/arithmetic/remainder/integer.vrl",
    "expressions/arithmetic/remainder/integer_float.vrl",
    "expressions/arithmetic/subtraction/float.vrl",
    "expressions/arithmetic/subtraction/float_integer.vrl",
    "expressions/arithmetic/subtraction/integer.vrl",
    "expressions/arithmetic/subtraction/integer_float.vrl",
    "expressions/assignment/single_external.vrl",
    "expressions/assignment/single_return_value.vrl",
    "expressions/assignment/single_variable.vrl",
    "expressions/block/multiple_expressions_multi_line.vrl",
    "expressions/block/multiple_expressions_single_line.vrl",
    "expressions/block/single_expression.vrl",
    "expressions/function_call/positional_argument.vrl",
    "expressions/group/precedence.vrl",
    "expressions/if_statement/if_else.vrl",
    "expressions/if_statement/if_elseif_else.vrl",
    "expressions/if_statement/if_null.vrl",
    "expressions/if_statement/if_resolves.vrl",
    "expressions/if_statement/newlines.vrl",
    "expressions/literal/array.vrl",
    "expressions/literal/boolean.vrl",
    "expressions/literal/float.vrl",
    "expressions/literal/integer.vrl",
    "expressions/literal/null.vrl",
    "expressions/literal/object.vrl",
    "expressions/literal/raw_string.vrl",
    "expressions/literal/string.vrl",
    "expressions/query/external.vrl",
    "expressions/query/function_call.vrl",
    "expressions/query/object.vrl",
    "expressions/query/variable.vrl",
    "expressions/unary/not.vrl",
    "functions/array.vrl",
    "internal/allow_reserved_keywords.vrl",
    "internal/multi_byte_literals.vrl",
    "internal/nested_containers.vrl",
    "issues/6361_query_type_definition.vrl",
]


def load_case(path: Path):
    """Parse the `# object:` / `# result:` headers; a result spans
    further '#' lines only while its JSON is still incomplete."""
    obj = None
    result_lines: list[str] = []
    body: list[str] = []
    in_result = False
    done_result = False
    for line in path.read_text().splitlines():
        if line.startswith("# object:"):
            obj = json.loads(line[len("# object:"):])
            in_result = False
        elif line.startswith("# result:") and not done_result:
            result_lines.append(line[len("# result:"):])
            in_result = True
        elif in_result and line.startswith("#"):
            result_lines.append(line[1:])
        else:
            if line.strip():
                in_result = False
            body.append(line)
        if in_result:
            try:
                json.loads("\n".join(result_lines))
                in_result = False
                done_result = True
            except json.JSONDecodeError:
                pass
    return obj, json.loads("\n".join(result_lines)), "\n".join(body)


def norm(v):
    """Spark value → JSON-comparable: positional structs (_0.._n)
    render as lists, named structs as dicts."""
    if isinstance(v, Row):
        d = v.asDict()
        if d and all(k.startswith("_") and k[1:].isdigit() for k in d):
            return [
                norm(x)
                for _, x in sorted(d.items(), key=lambda kv: int(kv[0][1:]))
            ]
        return {k: norm(x) for k, x in d.items()}
    if isinstance(v, dict):
        return {k: norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
    return v


def same(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(a - b) < 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(same(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(same(a[k], b[k]) for k in a)
    return a == b


@pytest.mark.parametrize("rel", SUPPORTED)
def test_vrl_golden(spark, rel):
    from vector_spark.functions.vrl_program import compile_vrl_program

    obj, expected, src = load_case(CORPUS / rel)
    prog = compile_vrl_program(src)
    if obj:
        df = spark.read.json(spark.sparkContext.parallelize([json.dumps(obj)]))
    else:
        df = spark.range(1).drop("id")
    res = prog.event_struct(df.columns) if prog.result_is_event else prog.result
    assert res is not None, "program produced no result value"
    got = norm(df.select(res.alias("r")).first()["r"])
    assert same(got, expected), f"{rel}: got={got!r} want={expected!r}"

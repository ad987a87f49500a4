"""Scan the reference VRL golden-test corpus and report which files the
vrl_program compiler reproduces. Used to curate tests/test_vrl_golden.py's
SUPPORTED list; not part of the test suite."""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path("/root/reference/lib/vrl/tests/tests")


def load_case(path: Path):
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
        # a result spans further '#' lines only while its JSON is
        # still incomplete (later comments are NOT part of it)
        if in_result:
            try:
                json.loads("\n".join(result_lines))
                in_result = False
                done_result = True
            except json.JSONDecodeError:
                pass
    expected = json.loads("\n".join(result_lines))
    return obj, expected, "\n".join(body)


def norm(v):
    from pyspark.sql import Row

    if isinstance(v, Row):
        d = v.asDict()
        if d and all(k.startswith("_") and k[1:].isdigit() for k in d):
            return [norm(x) for _, x in sorted(d.items(), key=lambda kv: int(kv[0][1:]))]
        return {k: norm(x) for k, x in d.items()}
    if isinstance(v, dict):
        return {k: norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [norm(x) for x in v]
    return v


def same(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b or a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return abs(a - b) < 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(same(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(same(a[k], b[k]) for k in a)
    return a == b


def main():
    from vector_spark import get_spark
    from vector_spark.functions.vrl_program import compile_vrl_program

    spark = get_spark("vrl-golden-scan", shuffle_partitions=1)
    spark.sparkContext.setLogLevel("ERROR")
    files = sorted(CORPUS.rglob("*.vrl"))
    passed, failed = [], []
    for f in files:
        rel = str(f.relative_to(CORPUS))
        if rel.startswith(("fixme/", "diagnostics/")):
            continue
        try:
            obj, expected, src = load_case(f)
        except Exception as e:
            failed.append((rel, f"header: {type(e).__name__} {e}"))
            continue
        try:
            prog = compile_vrl_program(src)
            if obj:
                df = spark.read.json(
                    spark.sparkContext.parallelize([json.dumps(obj)])
                )
            else:
                df = spark.range(1).drop("id")
            if prog.result_is_event:
                res = prog.event_struct(df.columns)
            elif prog.result is not None:
                res = prog.result
            else:
                failed.append((rel, "no result value"))
                continue
            got = norm(df.select(res.alias("r")).first()["r"])
            if same(got, expected):
                passed.append(rel)
            else:
                failed.append((rel, f"value: got={got!r} want={expected!r}"))
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            failed.append((rel, f"{type(e).__name__}: {msg}"))
    print(f"PASS {len(passed)} / {len(passed) + len(failed)}")
    for rel in passed:
        print("  ok", rel)
    print("---- failures:")
    for rel, why in failed:
        print("  FAIL", rel, "--", why)


if __name__ == "__main__":
    main()

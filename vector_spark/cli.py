"""Operational CLI — the engine's counterpart to Vector's subcommands
(src/cli.rs): ``graph`` (config topology → Graphviz DOT, graph.rs),
``list`` (available components, list.rs), ``validate`` (config load +
topology check, validate.rs), ``test`` (behavior-TOML harness, the
`vector test` port — delegates to vector_spark.testing).

    python -m vector_spark.cli graph  -c pipeline.toml
    python -m vector_spark.cli list   [--format text|json]
    python -m vector_spark.cli validate -c pipeline.toml
    python -m vector_spark.cli test   tests/behavior_corpus/*.toml
    python -m vector_spark.cli vrl    program.vrl --event '{"a": 1}'

``graph``/``list``/``validate`` are driver-side only (no SparkSession,
no JVM start): topology is config-level. ``test`` starts a local
session and runs every [[tests]] block.
"""

from __future__ import annotations

import argparse
import json
import sys
import tomllib

# The honest component inventory of THIS engine (list.rs analogue).
COMPONENTS: dict[str, list[str]] = {
    "sources": [
        "file (parquet/json/text, glob, multiline folding)",
        "generator",
        "kafka (classpath-gated)",
        "iceberg (classpath-gated)",
        "stream: rate / file-stream (Structured Streaming)",
    ],
    "transforms": [
        "remap", "filter", "route", "sample", "log_to_metric", "dedupe",
        "reduce", "aggregate", "grok_parser", "regex_parser", "json_parser",
        "key_value_parser", "logfmt_parser", "tokenizer", "split", "coercer",
        "add_fields", "remove_fields", "rename_fields", "concat",
        "ansi_stripper", "field_filter", "add_tags", "remove_tags", "merge",
        "metric_to_log", "enrich (geoip analogue)", "aws_ec2_metadata",
        "json_array_parser (cloudwatch 1->N)", "tag_cardinality_limit",
        "custom_stage (lua/wasm extension point)",
    ],
    "sinks": [
        "file (parquet/json/csv)", "console", "blackhole",
        "kafka (classpath-gated)", "iceberg (classpath-gated)",
    ],
    "conditions": ["check_fields", "vrl (VRL-lite)", "datadog_search"],
    "dataops": [
        "dedup: exact / minhash-lsh / simhash64 / jaccard / clusters+keepers",
        "similarity: brute-force / sign-LSH / IVF (+distributed Lloyd refine)",
        "text: stats / quality / repetition / winnowing / lang_id_ngram",
        "tokens: stats / vocab / oov / unigram+bigram LM / chunk / pack / bpe",
        "curation: pii_scrub / contamination (exact+fuzzy) / stratified mix",
        "classify: hashed-ngram NB quality classifier (train+score)",
        "jobs: run_pipeline / prepare_training_data / dedup_corpus",
    ],
}


def _read_config(path: str) -> dict:
    with open(path, "rb") as f:
        return tomllib.load(f)


def cmd_graph(args) -> int:
    """Config topology → DOT (graph.rs:82-105: sources trapezium,
    transforms diamond, sinks invtrapezium, input edges)."""
    raw = _read_config(args.config)
    out = ["digraph {"]
    for name in raw.get("sources", {}):
        out.append(f'  "{name}" [shape=trapezium]')
    for name, spec in raw.get("transforms", {}).items():
        out.append(f'  "{name}" [shape=diamond]')
        for inp in spec.get("inputs", []):
            out.append(f'  "{inp}" -> "{name}"')
    for name, spec in raw.get("sinks", {}).items():
        out.append(f'  "{name}" [shape=invtrapezium]')
        for inp in spec.get("inputs", []):
            out.append(f'  "{inp}" -> "{name}"')
    out.append("}")
    print("\n".join(out))
    return 0


def cmd_list(args) -> int:
    if args.format == "json":
        print(json.dumps(COMPONENTS, indent=2))
    else:
        for kind, items in COMPONENTS.items():
            print(f"{kind}:")
            for it in items:
                print(f"  - {it}")
    return 0


def cmd_validate(args) -> int:
    """Config sanity without a JVM: TOML parses, every input edge
    points at a declared node (or the implicit 'in'/route lanes), no
    cycles. Full expression compilation happens lazily at run (and in
    `test`, which builds real plans)."""
    try:
        raw = _read_config(args.config)
    except (OSError, tomllib.TOMLDecodeError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 78  # EX_CONFIG
    names = set(raw.get("sources", {})) | set(raw.get("transforms", {})) | {"in"}
    route_lanes = {
        f"{name}.{lane}"
        for name, spec in raw.get("transforms", {}).items()
        if spec.get("type") in ("route", "swimlanes")
        for lane in (spec.get("route") or spec.get("lanes") or {})
    }
    names |= route_lanes
    errors = []
    for section in ("transforms", "sinks"):
        for name, spec in raw.get(section, {}).items():
            for inp in spec.get("inputs", []):
                if inp not in names:
                    errors.append(f"{section}.{name}: unknown input {inp!r}")
    # cycle check over transform edges (sinks cannot be inputs)
    graph = {
        name: [i for i in spec.get("inputs", []) if i in raw.get("transforms", {})]
        for name, spec in raw.get("transforms", {}).items()
    }
    WHITE, GRAY, BLACK = 0, 1, 2
    color = dict.fromkeys(graph, WHITE)

    def visit(n: str) -> bool:
        color[n] = GRAY
        for m in graph[n]:
            if color[m] == GRAY or (color[m] == WHITE and visit(m)):
                return True
        color[n] = BLACK
        return False

    for n in graph:
        if color[n] == WHITE and visit(n):
            errors.append(f"cycle involving transform {n!r}")
            break
    if errors:
        for e in errors:
            print(f"error: {e}", file=sys.stderr)
        return 78
    n_t, n_s = len(raw.get("transforms", {})), len(raw.get("sinks", {}))
    print(f"OK: {n_t} transforms, {n_s} sinks, topology valid")
    return 0


# TOML config skeletons for `generate` (generate.rs analogue). Each
# transform prints with its required keys and a chained `inputs`.
_GENERATE_SNIPPETS: dict[str, str] = {
    "remap": 'source = """\n.field = .other_field\n"""',
    "filter": 'condition = ".status == 200"',
    "route": '[transforms.{name}.route]\nhot = \'.source == "web"\'\nrest = \'.source != "web"\'',
    "sample": "rate = 10\nkey_field = \"doc_id\"",
    "grok_parser": 'pattern = "%{COMMONAPACHELOG}"',
    "regex_parser": "patterns = ['^(?P<level>\\S+) (?P<msg>.*)$']",
    "json_parser": "drop_invalid = false",
    "key_value_parser": 'field_split = "="',
    "logfmt_parser": "",
    "dedupe": '[transforms.{name}.fields]\nmatch = ["message"]',
    "reduce": 'group_by = ["request_id"]',
    "log_to_metric": '[[transforms.{name}.metrics]]\ntype = "counter"\nfield = "status"\nname = "events_total"',
    "add_fields": '[transforms.{name}.fields]\nenv = "prod"',
    "coercer": '[transforms.{name}.types]\nstatus = "int"',
    "datadog_search": "# condition usage: {{type=\"datadog_search\", source=\"@status:error\"}}",
}


def cmd_generate(args) -> int:
    """Print a config skeleton from an expression like
    '/grok_parser,filter/file' (sources/transforms/sinks divided by
    slashes, generate.rs:22-44; names default to transform1..N)."""
    parts = (args.expression.split("/") + ["", "", ""])[:3]
    srcs, transforms, sinks = (
        [x for x in p.split(",") if x] for p in parts
    )
    out, prev = [], "in"
    for i, s in enumerate(srcs, 1):
        out.append(f'[sources.source{i}]\ntype = "{s}"\n')
        prev = f"source{i}"
    for i, t in enumerate(transforms, 1):
        name = f"transform{i}"
        body = _GENERATE_SNIPPETS.get(t, "")
        body = body.replace("{name}", name)
        out.append(
            f'[transforms.{name}]\ntype = "{t}"\ninputs = ["{prev}"]\n'
            + (body + "\n" if body else "")
        )
        prev = name
    for i, s in enumerate(sinks, 1):
        out.append(
            f'[sinks.sink{i}]\ntype = "{s}"\ninputs = ["{prev}"]\n'
            f'path = "/data/out{i}"\n'
        )
    print("\n".join(out).rstrip())
    return 0


def cmd_test(args) -> int:
    from pyspark.sql import SparkSession

    from vector_spark import get_spark
    from vector_spark.testing import run_behavior_file

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("vector_test", shuffle_partitions=4)
    failed = 0
    try:
        for path in args.files:
            with open(path) as f:
                text = f.read()
            for res in run_behavior_file(spark, text):
                status = "PASS" if res.passed else "FAIL"
                if not res.passed:
                    failed += 1
                detail = "; ".join(res.failures)
                print(f"{status} {path}::{res.name}" + (
                    f"  ({detail})" if not res.passed and detail else ""
                ))
    finally:
        if not preexisting:
            spark.stop()
    return 1 if failed else 0


def cmd_explain(args) -> int:
    """Show the Catalyst plan a config compiles to: load the pipeline,
    build the single-scan fan-out frame over the input (or the built-in
    sequences fixture), and print the formatted physical plan — the
    pushdown/broadcast/codegen evidence for THIS config."""
    from pyspark.sql import SparkSession

    from vector_spark import get_spark
    from vector_spark.plans.config import load_pipeline

    with open(args.config) as f:
        pipe = load_pipeline(f.read())
    # getOrCreate may hand back a session the CALLER owns (e.g. a test
    # harness or notebook) — only stop what this command created
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("vector_explain", shuffle_partitions=4)
    try:
        if args.input:
            df = spark.read.parquet(args.input)
        else:
            from vector_spark.fixtures import sequences

            df = sequences(spark, 100)
        frame = pipe.lanes_exploded(df)
        plan = frame._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                args.mode
            )
        )
        print(plan.strip())
    finally:
        if not preexisting:
            spark.stop()
    return 0


def cmd_top(args) -> int:
    """`vector top` analogue (src/top/): summarize a run's per-stage
    telemetry from the checkpoint directory — no JVM, reads the
    committed shard records. Totals per counter plus per-shard rows
    sorted by wall time (slowest first)."""
    import os

    recs = []
    try:
        for fn in sorted(os.listdir(args.checkpoint)):
            if fn.startswith("shard-") and fn.endswith(".json"):
                with open(os.path.join(args.checkpoint, fn)) as f:
                    recs.append(json.load(f))
    except OSError as e:
        print(f"error: {e}", file=sys.stderr)
        return 66  # EX_NOINPUT
    if not recs:
        print("no committed shards")
        return 0
    totals: dict[str, float] = {}
    for r in recs:
        for k, v in (r.get("telemetry") or {}).items():
            totals[k] = totals.get(k, 0) + v
        for k, v in (r.get("sink_counts") or {}).items():
            totals[f"sink.{k}"] = totals.get(f"sink.{k}", 0) + v
    wall = sum(r.get("wall_seconds", 0.0) for r in recs)
    print(f"shards committed: {len(recs)}   total wall: {wall:.1f}s")
    for k in sorted(totals):
        print(f"  {k:32s} {int(totals[k])}")
    slowest = sorted(recs, key=lambda r: -r.get("wall_seconds", 0.0))[:10]
    print("slowest shards:")
    for r in slowest:
        print(
            f"  shard {r['shard_id']:>4}  {r.get('wall_seconds', 0):7.1f}s  "
            f"{len(r.get('lineage_files') or [])} files"
        )
    return 0


def cmd_vrl(args) -> int:
    """`vector vrl` analogue (src/cli.rs SubCommand::Vrl → vrl_cli):
    compile a VRL program and run it against JSON events.

    - ``--check``: compile-only — prints OK or the reference-style
      diagnostic (E1xx/E6xx) and exits nonzero. No JVM.
    - ``--event '{...}'`` or JSON-lines on stdin: each event becomes a
      one-row frame, the program's net effect is applied, and the
      resulting event (or final expression value) prints as JSON.
    """
    if args.program == "-":
        source = sys.stdin.read()
    elif args.expr:
        source = args.program
    else:
        with open(args.program) as f:
            source = f.read()

    from vector_spark.functions.vrl_program import compile_vrl_program

    events: list[dict] = []
    if args.event:
        events.append(json.loads(args.event))
    elif not args.check and not sys.stdin.isatty() and args.program != "-":
        for line in sys.stdin:
            line = line.strip()
            if line:
                events.append(json.loads(line))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vector_spark import get_spark

    # even compile-only needs a SparkContext: the compiler's symbolic
    # execution builds real Column trees. Never stop a session this
    # command did not create (see cmd_test / the explain regression).
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("vrl_cli", shuffle_partitions=1)
    try:
        if args.check or not events:
            try:
                compile_vrl_program(source)
            except ValueError as e:  # diagnostics carry reference E-codes
                print(f"error: {e}", file=sys.stderr)
                return 1
            print("ok")
            return 0
        rc = 0
        for obj in events:
            df = spark.read.json(
                spark.sparkContext.parallelize([json.dumps(obj)])
            )
            try:
                prog = compile_vrl_program(
                    source,
                    columns=df.columns,
                    schema={
                        f.name: f.dataType.simpleString() for f in df.schema
                    },
                )
            except ValueError as e:
                print(f"error: {e}", file=sys.stderr)
                return 1
            # a pipeline transform emits the TRANSFORMED EVENT — print
            # that; a trailing bare expression additionally prints as
            # the program value (the reference REPL's behavior)
            res = prog.event_struct(df.columns)
            row = df.select(
                F.to_json(F.struct(res.alias("r"))).alias("j")
            ).first()
            out = {"event": json.loads(row["j"]).get("r")}
            if prog.result is not None and not prog.result_is_event:
                vrow = df.select(
                    F.to_json(F.struct(prog.result.alias("v"))).alias("j")
                ).first()
                out["value"] = json.loads(vrow["j"]).get("v")
            print(json.dumps(out["event"] if args.raw else out))
    finally:
        if not preexisting:
            spark.stop()
    return rc


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vector_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("graph", help="render config topology as DOT")
    g.add_argument("-c", "--config", required=True)
    g.set_defaults(fn=cmd_graph)
    l = sub.add_parser("list", help="list available components")
    l.add_argument("--format", choices=["text", "json"], default="text")
    l.set_defaults(fn=cmd_list)
    v = sub.add_parser("validate", help="validate a config topology")
    v.add_argument("-c", "--config", required=True)
    v.set_defaults(fn=cmd_validate)
    t = sub.add_parser("test", help="run behavior-TOML tests")
    t.add_argument("files", nargs="+")
    t.set_defaults(fn=cmd_test)
    ge = sub.add_parser(
        "generate", help="print a config skeleton from 'src/t1,t2/sink'"
    )
    ge.add_argument("expression")
    ge.set_defaults(fn=cmd_generate)
    tp = sub.add_parser(
        "top", help="summarize run telemetry from a checkpoint dir"
    )
    tp.add_argument("-c", "--checkpoint", required=True)
    tp.set_defaults(fn=cmd_top)
    ex = sub.add_parser(
        "explain", help="print the Catalyst plan a config compiles to"
    )
    ex.add_argument("-c", "--config", required=True)
    ex.add_argument("-i", "--input", help="parquet input (default: fixture)")
    ex.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost"],
    )
    ex.set_defaults(fn=cmd_explain)
    vr = sub.add_parser(
        "vrl", help="compile/run a VRL program against JSON events"
    )
    vr.add_argument("program", help="program file, '-' for stdin")
    vr.add_argument(
        "-e", "--expr", action="store_true",
        help="treat PROGRAM as inline source, not a path",
    )
    vr.add_argument("--event", help="one JSON event (else stdin JSON-lines)")
    vr.add_argument(
        "--check", action="store_true", help="compile-only diagnostics"
    )
    vr.add_argument(
        "--raw", action="store_true",
        help="print scalar results unquoted",
    )
    vr.set_defaults(fn=cmd_vrl)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

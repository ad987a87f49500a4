"""CLI subcommands (graph.rs / list.rs / validate.rs analogues) —
driver-side only, no SparkSession."""

from __future__ import annotations

import json

import pytest

from vector_spark.cli import main

CONFIG = """
[transforms.parse]
type = "grok_parser"
inputs = ["in"]
pattern = "%{COMMONAPACHELOG}"

[transforms.router]
type = "route"
inputs = ["parse"]
[transforms.router.route]
hot = '.response == "500"'

[sinks.errors]
inputs = ["router.hot"]
path = "/tmp/x"
"""


@pytest.fixture()
def cfg(tmp_path):
    p = tmp_path / "p.toml"
    p.write_text(CONFIG)
    return str(p)


def test_graph_dot(cfg, capsys):
    assert main(["graph", "-c", cfg]) == 0
    out = capsys.readouterr().out
    assert out.startswith("digraph {") and out.rstrip().endswith("}")
    assert '"parse" [shape=diamond]' in out
    assert '"errors" [shape=invtrapezium]' in out
    assert '"router.hot" -> "errors"' in out
    assert '"in" -> "parse"' in out


def test_validate_ok(cfg, capsys):
    assert main(["validate", "-c", cfg]) == 0
    assert "topology valid" in capsys.readouterr().out


def test_validate_unknown_input(tmp_path, capsys):
    p = tmp_path / "bad.toml"
    p.write_text('[transforms.a]\ntype="filter"\ninputs=["ghost"]\ncondition=".x"\n')
    assert main(["validate", "-c", str(p)]) == 78
    assert "unknown input 'ghost'" in capsys.readouterr().err


def test_validate_cycle(tmp_path, capsys):
    p = tmp_path / "cyc.toml"
    p.write_text(
        '[transforms.a]\ntype="filter"\ninputs=["b"]\ncondition=".x"\n'
        '[transforms.b]\ntype="filter"\ninputs=["a"]\ncondition=".x"\n'
    )
    assert main(["validate", "-c", str(p)]) == 78
    assert "cycle" in capsys.readouterr().err


def test_list_json(capsys):
    assert main(["list", "--format", "json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert "remap" in data["transforms"]
    assert "datadog_search" in data["conditions"]


def test_top_summarizes_checkpoint(tmp_path, capsys):
    import json as _json

    for i in range(2):
        (tmp_path / f"shard-{i}.json").write_text(_json.dumps({
            "run_id": "r", "shard_id": i, "lineage_files": ["a", "b"],
            "telemetry": {"events_in": 10}, "sink_counts": {"hot": 4},
            "wall_seconds": 1.5 + i,
        }))
    assert main(["top", "-c", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "shards committed: 2" in out
    assert "events_in" in out and "20" in out
    assert "sink.hot" in out and "8" in out


def test_generate_roundtrips_validate(tmp_path, capsys):
    assert main(["generate", "/grok_parser,route/file"]) == 0
    cfg = capsys.readouterr().out
    p = tmp_path / "gen.toml"
    p.write_text(cfg)
    assert main(["validate", "-c", str(p)]) == 0


def test_explain_prints_plan(tmp_path, capsys, spark):
    p = tmp_path / "e.toml"
    p.write_text(
        '[transforms.keep]\ntype="filter"\ninputs=["in"]\ncondition=".n_tok >= 4"\n'
        '[sinks.all]\ninputs=["keep"]\n'
    )
    # reuse the session fixture's JVM: call the handler directly
    from vector_spark.cli import main as cli_main

    assert cli_main(["explain", "-c", str(p), "--mode", "simple"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    # REGRESSION: explain must not stop a session it did not create —
    # it once killed the harness's session-scoped SparkSession and
    # took down every test that ran after this module
    assert spark.range(1).count() == 1


def test_vrl_check_ok_and_diagnostic(spark, capsys):
    from vector_spark.cli import main as cli_main

    assert cli_main(["vrl", "-e", ".x = 1 + 2", "--check"]) == 0
    assert "ok" in capsys.readouterr().out
    # E-coded diagnostic on a type-invalid program
    assert cli_main(["vrl", "-e", '.x = 1 + "a"', "--check"]) == 1
    assert "error" in capsys.readouterr().err


def test_vrl_runs_event(spark, capsys):
    from vector_spark.cli import main as cli_main

    rc = cli_main([
        "vrl", "-e",
        '.total = .a + .b\n.msg = upcase(.msg)\ndel(.b)',
        "--event", '{"a": 2, "b": 3, "msg": "hi"}',
    ])
    assert rc == 0
    import json as _json

    out = _json.loads(capsys.readouterr().out)
    assert out["event"] == {"a": 2, "msg": "HI", "total": 5}
    assert out["value"] == 3  # del returns the deleted value
    # must not have stopped the harness session
    assert spark.range(1).count() == 1

"""TOML config loader: Vector-style pipeline configs → Pipeline.

Reference: src/config/loading.rs (TOML → ConfigBuilder) +
src/config/compiler.rs:4-43 (expand_macros, typecheck). A useful
subset of the real surface so a Vector user's muscle memory carries
over:

    [transforms.parse]
    type = "remap"
    inputs = ["in"]
    source = '''
    .size_bucket = if_else(.n_tok < 128, "small", "large")
    .tok_head = get(.tokens, 1)
    '''

    [transforms.keep]
    type = "filter"
    inputs = ["parse"]
    condition = ".n_tok >= 4"

    [transforms.router]
    type = "route"
    inputs = ["keep"]
    [transforms.router.route]
    hot = '.source == "web-frontend"'
    rest = '.source != "web-frontend"'

    [sinks.hot_out]
    type = "file"
    inputs = ["router.hot"]
    path = "/data/out/hot"

Differences from the reference, by design:
- ``remap.source`` is the VRL-lite subset: one ``.path = expr`` per
  line (comments with #), not full VRL;
- conditions are VRL-lite strings or ``check_fields`` tables
  (``condition.type = "check_fields"`` + predicate keys);
- sources are not declared in the config — the input DataFrame is
  handed to ``Pipeline.run`` (north rule: one table in).
"""

from __future__ import annotations

import re
import tomllib
from typing import Any

from vector_spark.plans.pipeline import Pipeline

_ASSIGN_RE = re.compile(r"^\s*(\.[A-Za-z_][A-Za-z0-9_.]*)\s*=\s*(.+?)\s*$")


_DEL_RE = re.compile(r"^\s*del\(\s*(\.[A-Za-z_][A-Za-z0-9_.]*)\s*\)\s*$")
_ONLY_RE = re.compile(r"^\s*only_fields\(\s*(.+?)\s*\)\s*$")


def parse_remap_source(source: str) -> list[tuple[str, Any]]:
    """``.target = expr`` / ``del(.field)`` / ``only_fields(.a, .b)``
    lines → ordered statement list (the VRL program surface:
    assignments + path deletion, lib/vrl/stdlib del.rs)."""
    assignments: list[tuple[str, Any]] = []
    for line in source.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        d = _DEL_RE.match(line)
        if d:
            assignments.append(("__del__", d.group(1)))
            continue
        o = _ONLY_RE.match(line)
        if o:
            fields = [f.strip() for f in o.group(1).split(",")]
            assignments.append(("__only__", fields))
            continue
        m = _ASSIGN_RE.match(line)
        if not m:
            raise ValueError(f"remap source line not an assignment: {line!r}")
        assignments.append((m.group(1), m.group(2)))
    return assignments


def _convert_transform(name: str, spec: dict[str, Any]) -> dict[str, Any]:
    out = dict(spec)
    typ = out.get("type")
    if typ == "remap" and "source" in out:
        out["assignments"] = parse_remap_source(out.pop("source"))
    if typ == "route":
        # vector uses [transforms.X.route]; we accept route/routes
        routes = out.pop("route", None) or out.pop("routes", None)
        if not routes:
            raise ValueError(f"route transform {name!r} needs a [route] table")
        out["routes"] = routes
    # swimlanes alias (route.rs: alias "swimlanes", lanes table)
    if typ == "swimlanes":
        out["type"] = "route"
        out["routes"] = out.pop("lanes")
    return out


def parse_config_text(text: str, fmt: str = "toml") -> dict[str, Any]:
    """Config text → raw dict. The reference accepts the same topology
    in TOML, JSON, and YAML (tests/behavior/formats/simple.{toml,json,
    yaml,yml} are one config four ways); fmt picks the parser."""
    if fmt in ("toml",):
        return tomllib.loads(text)
    if fmt in ("json",):
        import json as _json

        return _json.loads(text)
    if fmt in ("yaml", "yml"):
        import yaml as _yaml

        return _yaml.safe_load(text)
    raise ValueError(f"unknown config format: {fmt!r}")


def load_pipeline_config(toml_text: str, fmt: str = "toml") -> dict[str, Any]:
    """TOML/JSON/YAML → Pipeline config dict (transforms + sinks +
    fanout)."""
    raw = parse_config_text(toml_text, fmt)
    transforms = {
        name: _convert_transform(name, spec)
        for name, spec in (raw.get("transforms") or {}).items()
    }
    sinks = {}
    for name, spec in (raw.get("sinks") or {}).items():
        s = dict(spec)
        s.pop("type", None)  # file/parquet implied; console etc. via sinks module
        sinks[name] = s
    cfg: dict[str, Any] = {"transforms": transforms, "sinks": sinks}
    if "fanout" in raw:
        cfg["fanout"] = raw["fanout"]
    return cfg


def load_pipeline(toml_text: str, enrich_tables=None) -> Pipeline:
    return Pipeline(load_pipeline_config(toml_text), enrich_tables=enrich_tables)

"""Config-driven pipeline compiler: Vector topology → one Catalyst plan.

Reference lifecycle (SURVEY.md §3.1): config → expand_macros →
typecheck → build tokio tasks/channels → per-event flow. Here the
config compiles to a DataFrame DAG: transforms chain projections and
filters (Catalyst fuses them into one whole-stage-codegen pass),
``route`` becomes flag columns, and the fan-out to N sinks persists
the final frame ONCE then issues N filtered writes — the Spark
analogue of Vector's channel fanout (src/topology/fanout.rs:31-46)
that reads the input a single time.

Drop-type transforms (filter/sample/dedupe and remap's
drop_on_error) mark rows instead of filtering so one aggregation pass
yields Vector's full telemetry (events_in/out, discards per stage,
errors) — see vector_spark/telemetry.py.

Config schema (TOML-equivalent dict):

    {
      "transforms": {
        "<name>": {"type": "...", "inputs": ["<parent>"], ...config},
        ...
      },
      "sinks": {
        "<name>": {"inputs": ["<transform>" | "<router>.<lane>"],
                    "path": "...", "format": "parquet",
                    "partition_by": [...], "mode": "append"},
      },
    }

The single source is the DataFrame handed to ``run`` (north rule: one
Iceberg/parquet table in, N sinks out).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition
from vector_spark.operators import core, parsers, shapers
from vector_spark.operators import grok as grok_mod
from vector_spark.operators import metrics as metrics_mod
from vector_spark.operators.enrich import enrich as enrich_fn
from vector_spark.operators.reduce import merge_partial, reduce_events
from vector_spark.operators.remap import remap as remap_fn
from vector_spark.telemetry import DROPPED_BY, Telemetry, alive_col, live, mark_dropped

ROUTE_PREFIX = core.ROUTE_COL_PREFIX


@dataclass
class PipelineResult:
    telemetry: dict[str, int]
    sink_counts: dict[str, int]
    sink_paths: dict[str, str]
    wall_seconds: float
    frame: DataFrame | None = None
    lanes: dict[str, DataFrame] = field(default_factory=dict)


class Pipeline:
    def __init__(self, config: dict[str, Any], enrich_tables: dict[str, DataFrame] | None = None):
        self.config = config
        self.enrich_tables = enrich_tables or {}
        self.transforms: dict[str, dict] = dict(config.get("transforms", {}))
        self.sinks: dict[str, dict] = dict(config.get("sinks", {}))
        self._routes: dict[str, dict[str, Any]] = {}  # router name -> routes
        self._order = self._toposort()

    # -- DAG ---------------------------------------------------------------
    def _toposort(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()

        def visit(name: str, stack: tuple[str, ...] = ()):
            if name in seen:
                return
            if name in stack:
                raise ValueError(f"cycle at {name}")
            spec = self.transforms.get(name)
            if spec is None:
                raise ValueError(f"unknown transform {name!r}")
            for inp in spec.get("inputs", []):
                parent = inp.split(".")[0]
                if parent != "in" and parent in self.transforms:
                    visit(parent, stack + (name,))
            seen.add(name)
            order.append(name)

        for name in self.transforms:
            visit(name)
        return order

    def _ancestors(self, name: str) -> set[str]:
        """``name`` plus every transform reachable upstream of it."""
        out: set[str] = set()

        def walk(n: str) -> None:
            if n in out or n not in self.transforms:
                return
            out.add(n)
            for inp in self.transforms[n].get("inputs", []):
                walk(inp.split(".")[0])

        walk(name)
        return out

    # -- compile + run -----------------------------------------------------
    def run(
        self,
        df: DataFrame,
        write: bool = True,
        persist: bool = True,
        collect_telemetry: bool = True,
    ) -> PipelineResult:
        """Fan-out strategies (config["fanout"]["strategy"]):

        - "persist" (default): persist the terminal frame once, then
          one filtered write per sink. Right when sinks differ in
          format/layout. Memory-bound by the cached frame.
        - "explode": ONE write — each live row explodes into one copy
          per matching lane, written ``partitionBy("lane", ...)`` under
          config["fanout"]["root"]; telemetry rides the same job via
          the Observation API (zero extra passes). The scale path: a
          100 TB input is scanned exactly once and never cached.
        """
        strategy = (self.config.get("fanout") or {}).get("strategy", "persist")
        if strategy == "explode" and write:
            return self._run_explode(df)
        t0 = time.monotonic()
        telemetry = Telemetry()
        frames: dict[str, DataFrame] = {"in": df}

        for name in self._order:
            spec = dict(self.transforms[name])
            typ = spec.pop("type")
            inputs = spec.pop("inputs", ["in"])
            src = self._resolve_input(frames, inputs)
            frames[name] = self._apply(name, typ, spec, src, telemetry)

        # terminal frame for fan-out: union of all sink parents is the
        # common frame when they share one lineage (typical). Persist
        # the LAST transform's frame (all lanes are flag columns on it).
        terminal_name = self._order[-1] if self._order else "in"
        terminal = frames[terminal_name]
        # forked DAG: counters from stages off the terminal lineage
        # must evaluate on their own branch's frame (their marks never
        # reach the terminal — an unbound eval there silently reads 0)
        telemetry.bind_off_lineage(frames, self._ancestors(terminal_name))
        if persist:
            terminal = terminal.persist()
            frames[terminal_name] = terminal

        lanes: dict[str, DataFrame] = {}
        sink_counts: dict[str, int] = {}
        sink_paths: dict[str, str] = {}
        # sink counts fold into the telemetry aggregation pass: flags
        # and aliveness are evaluated on the SAME frame the sink writes
        # — the terminal frame for terminal taps (rides the single
        # terminal agg) or the tapped stage's own frame (one extra agg
        # per DISTINCT frame via the counter frame-binding, instead of
        # one .count() job per sink). Unions of K lanes contribute K
        # addends (a row in two lanes is written twice).
        sink_count_keys: dict[str, list[str] | None] = {}
        alive = alive_col(terminal)
        for si, (sname, sspec) in enumerate(self.sinks.items()):
            inputs = sspec.get("inputs", [terminal_name])
            keys: list[str] = []
            for i, inp in enumerate(inputs):
                router = inp.split(".")[0]
                key = f"__sink_{si}_{i}"
                if "." in inp and router in self._routes and router in frames:
                    lane = inp.split(".", 1)[1]
                    flag_col = ROUTE_PREFIX + lane
                    base = frames[router]
                    if flag_col not in base.columns:
                        continue
                    if router == terminal_name:
                        telemetry.add(key, alive & F.col(flag_col))
                    else:
                        telemetry.add(
                            key, alive_col(base) & F.col(flag_col), frame=base
                        )
                    keys.append(key)
                elif inp == terminal_name:
                    telemetry.add(key, alive)
                    keys.append(key)
                elif inp in frames:
                    base = frames[inp]
                    telemetry.add(key, alive_col(base), frame=base)
                    keys.append(key)
            sink_count_keys[sname] = keys if len(keys) == len(inputs) else None
        for sname, sspec in self.sinks.items():
            lane_df = self._resolve_input(frames, sspec.get("inputs", [terminal_name]))
            lane_df = live(lane_df)
            # plan-internal columns (route flags, miss/error flags) are
            # stripped at the sink boundary
            lane_df = lane_df.drop(
                *[
                    c
                    for c in lane_df.columns
                    if c.startswith(ROUTE_PREFIX)
                    or c.startswith("_miss_")
                    or c.startswith("_err_")
                    or c.startswith("_vs_")
                ]
            )
            lanes[sname] = lane_df
            if write and "path" in sspec:
                writer = lane_df.write.mode(sspec.get("mode", "overwrite"))
                if sspec.get("partition_by"):
                    writer = writer.partitionBy(*sspec["partition_by"])
                fmt = sspec.get("format", "parquet")
                writer.format(fmt).save(sspec["path"])
                sink_paths[sname] = sspec["path"]

        tele: dict[str, int] = {}
        if collect_telemetry:
            tele = telemetry.collect(terminal)
            for sname in self.sinks:
                keys = sink_count_keys.get(sname)
                if keys is not None:
                    sink_counts[sname] = sum(tele[k] for k in keys)
                else:
                    # mid-pipeline tap: count on its own (persisted) frame
                    sink_counts[sname] = lanes[sname].count()
            tele = {k: v for k, v in tele.items() if not k.startswith("__sink_")}
        return PipelineResult(
            telemetry=tele,
            sink_counts=sink_counts,
            sink_paths=sink_paths,
            wall_seconds=time.monotonic() - t0,
            frame=terminal,
            lanes=lanes,
        )

    def _sink_lane_flags(self, terminal_name: str) -> dict[str, Column]:
        """sink -> lane membership flag. Lane mapping comes from sink
        inputs ("router.lane"); a bare transform-name input must be the
        TERMINAL transform (full-stream sink) — explode mode emits one
        frame, so a mid-pipeline tap would silently get terminal-stage
        rows."""
        sink_lanes: dict[str, Column] = {}
        for sname, sspec in self.sinks.items():
            inp = sspec.get("inputs", [terminal_name])[0]
            if inp and "." in inp and inp.split(".")[0] in self._routes:
                lane = inp.split(".", 1)[1]
                if lane not in self._routes[inp.split(".")[0]]:
                    raise ValueError(f"unknown lane {inp!r} for sink {sname!r}")
                sink_lanes[sname] = F.col(ROUTE_PREFIX + lane)
            elif inp in (terminal_name, "in"):
                sink_lanes[sname] = F.lit(True)
            else:
                raise ValueError(
                    f"explode fan-out only supports route-lane or terminal sink "
                    f"inputs; sink {sname!r} taps {inp!r} (use the 'persist' "
                    f"strategy for mid-pipeline sinks)"
                )
        return sink_lanes

    def lanes_exploded(self, df: DataFrame) -> DataFrame:
        """The single-scan fan-out FRAME (no write, no telemetry): each
        live row exploded into one copy per matching sink lane, with a
        ``lane`` column and plan-internal columns stripped. The scale
        shape for any downstream per-lane aggregation — the input is
        scanned exactly once and never cached (vs. the persist strategy
        re-filtering the cached terminal per sink)."""
        frames: dict[str, DataFrame] = {"in": df}
        telemetry = Telemetry()
        for name in self._order:
            spec = dict(self.transforms[name])
            typ = spec.pop("type")
            inputs = spec.pop("inputs", ["in"])
            src = self._resolve_input(frames, inputs)
            frames[name] = self._apply(name, typ, spec, src, telemetry)
        terminal_name = self._order[-1] if self._order else "in"
        terminal = frames[terminal_name]
        sink_lanes = self._sink_lane_flags(terminal_name)
        live_flag = alive_col(terminal)
        lane_arr = F.array_compact(
            F.array(
                *[
                    F.when(live_flag & flag, F.lit(sname))
                    for sname, flag in sink_lanes.items()
                ]
            )
        )
        internal = [
            c
            for c in terminal.columns
            if c.startswith(ROUTE_PREFIX)
            or c.startswith("_miss_")
            or c.startswith("_err_")
            or c.startswith("_vs_")
            or c == DROPPED_BY
        ]
        return terminal.withColumn("lane", F.explode(lane_arr)).drop(*internal)

    def _run_explode(self, df: DataFrame) -> PipelineResult:
        """Single-scan single-write fan-out with piggybacked telemetry."""
        from pyspark.sql import Observation

        t0 = time.monotonic()
        telemetry = Telemetry()
        frames: dict[str, DataFrame] = {"in": df}
        for name in self._order:
            spec = dict(self.transforms[name])
            typ = spec.pop("type")
            inputs = spec.pop("inputs", ["in"])
            src = self._resolve_input(frames, inputs)
            frames[name] = self._apply(name, typ, spec, src, telemetry)
        terminal = frames[self._order[-1]] if self._order else df

        fan = self.config["fanout"]
        root = fan["root"]
        extra_parts = fan.get("partition_by", [])
        terminal_name = self._order[-1] if self._order else "in"
        sink_lanes = self._sink_lane_flags(terminal_name)

        live_flag = alive_col(terminal)
        # off-lineage branch counters can't ride the observed write —
        # bind them to their own frame so they aggregate separately
        telemetry.bind_off_lineage(frames, self._ancestors(terminal_name))
        # one-pass telemetry + per-sink counts via Observation
        obs = Observation()
        aggs = [F.count(F.lit(1)).alias("events_in_total")]
        bound: list[tuple] = []
        for cname, flag, frame, _stage in telemetry.counters:
            if frame is None:
                aggs.append(F.sum(F.when(flag, 1).otherwise(0)).alias(cname))
            else:
                bound.append((cname, flag, frame))
        for sname, flag in sink_lanes.items():
            aggs.append(
                F.sum(F.when(live_flag & flag, 1).otherwise(0)).alias(f"__sink_{sname}")
            )
        observed = terminal.observe(obs, *aggs)

        lane_arr = F.array_compact(
            F.array(
                *[
                    F.when(live_flag & flag, F.lit(sname))
                    for sname, flag in sink_lanes.items()
                ]
            )
        )
        internal = [
            c
            for c in terminal.columns
            if c.startswith(ROUTE_PREFIX)
            or c.startswith("_miss_")
            or c.startswith("_err_")
            or c.startswith("_vs_")
            or c == DROPPED_BY
        ]
        out = observed.withColumn("lane", F.explode(lane_arr)).drop(*internal)
        writer = out.write.mode(fan.get("mode", "overwrite")).partitionBy(
            "lane", *extra_parts
        )
        if fan.get("compression"):
            writer = writer.option("compression", fan["compression"])
        if fan.get("max_records_per_file"):
            writer = writer.option("maxRecordsPerFile", fan["max_records_per_file"])
        writer.format(fan.get("format", "parquet")).save(root)
        got = obs.get
        tele = {k: int(v or 0) for k, v in got.items() if not k.startswith("__sink_")}
        # frame-bound counters (pre-aggregation error counts, forked
        # branches) need their own agg — the observed write can't see
        # them. One agg action per DISTINCT frame, not per counter.
        by_frame: dict[int, tuple] = {}
        for cname, flag, frame in bound:
            by_frame.setdefault(id(frame), (frame, []))[1].append((cname, flag))
        for frame, items in by_frame.values():
            row = frame.agg(
                *[F.sum(F.when(flag, 1).otherwise(0)).alias(n) for n, flag in items]
            ).first()
            tele.update({k: int(v or 0) for k, v in row.asDict().items()})
        sink_counts = {
            k[len("__sink_") :]: int(v or 0)
            for k, v in got.items()
            if k.startswith("__sink_")
        }
        return PipelineResult(
            telemetry=tele,
            sink_counts=sink_counts,
            sink_paths={s: f"{root}/lane={s}" for s in self.sinks},
            wall_seconds=time.monotonic() - t0,
            frame=None,
            lanes={},
        )

    def _resolve_input(self, frames: dict[str, DataFrame], inputs: list[str]) -> DataFrame:
        parts = []
        for inp in inputs:
            if "." in inp and inp.split(".")[0] in self._routes:
                router, lane = inp.split(".", 1)
                base = frames[router]
                if lane not in self._routes[router]:
                    raise ValueError(f"unknown lane {inp!r}")
                parts.append(base.filter(F.col(ROUTE_PREFIX + lane)))
            else:
                if inp not in frames:
                    raise ValueError(f"unknown input {inp!r}")
                parts.append(frames[inp])
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # -- operator dispatch ---------------------------------------------------
    def _apply(
        self, name: str, typ: str, spec: dict, df: DataFrame, tele: Telemetry
    ) -> DataFrame:
        alive = alive_col(df)
        # NOTE: discard counters are expressed as `_dropped_by == name`
        # so they resolve against the TERMINAL frame (flag columns made
        # by intermediate stages may be pruned before telemetry runs;
        # _dropped_by survives to the end). First drop wins, matching
        # Vector's per-event flow order.
        if typ == "filter":
            cond = F.coalesce(compile_condition(spec["condition"]), F.lit(False))
            tele.add(f"{name}_discarded_total", F.col(DROPPED_BY) == name, stage=name)
            return mark_dropped(df, ~cond, name)
        if typ == "route":
            routes = spec["routes"]
            self._routes[name] = routes
            out = core.route_flags(df, routes)
            no_lane = None
            for lane in routes:
                c = F.col(ROUTE_PREFIX + lane)
                tele.add(f"{name}_{lane}_total", alive & c, stage=name)
                no_lane = ~c if no_lane is None else (no_lane & ~c)
            tele.add(f"{name}_discarded_total", alive & no_lane, stage=name)
            return out
        if typ == "sample":
            # soft sample: mark non-survivors
            rate = spec["rate"]
            key = spec.get("key_field")
            if key is None:
                raise ValueError("pipeline sample requires key_field (hash mode) at scale")
            bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(rate))
            passed = bucket == 0
            if spec.get("exclude") is not None:
                excl = F.coalesce(compile_condition(spec["exclude"]), F.lit(False))
                keep = excl | passed
                rate_col = F.when(~excl & passed, F.lit(rate))
            else:
                keep = passed
                rate_col = F.when(passed, F.lit(rate))
            tele.add(f"{name}_discarded_total", F.col(DROPPED_BY) == name, stage=name)
            out = df.withColumn(spec.get("sample_rate_field", "sample_rate"), rate_col)
            return mark_dropped(out, ~keep, name)
        if typ == "dedupe":
            from pyspark.sql import Window

            keys = spec.get("match") or [c for c in df.columns if not c.startswith("_")]
            order = spec.get("order_by")
            if order:
                w = Window.partitionBy(*keys).orderBy(*[F.col(o) for o in order])
                dup = F.row_number().over(w) > 1
            else:
                w = Window.partitionBy(*keys).orderBy(F.monotonically_increasing_id())
                dup = F.row_number().over(w) > 1
            out = df.withColumn("_vs_dup", dup)
            tele.add(f"{name}_discarded_total", F.col(DROPPED_BY) == name, stage=name)
            return mark_dropped(out, F.col("_vs_dup"), name).drop("_vs_dup")
        if typ == "remap":
            err_field = None
            if spec.get("error_when") is not None:
                err_field = f"_err_{name}"
                tele.add(
                    f"{name}_processing_errors_total",
                    alive & F.coalesce(compile_condition(spec["error_when"]), F.lit(False)),
                    stage=name,
                )
            out = remap_fn(
                df,
                spec["assignments"],
                abort_when=spec.get("abort_when"),
                error_when=spec.get("error_when"),
                drop_on_abort=False,
                drop_on_error=False,
                error_flag_field=err_field,
            )
            if spec.get("drop_on_error") and spec.get("error_when") is not None:
                out = mark_dropped(out, F.col(err_field), name)
            if spec.get("drop_on_abort") and spec.get("abort_when") is not None:
                abort_c = F.coalesce(
                    compile_condition(spec["abort_when"]), F.lit(False)
                )
                tele.add(
                    f"{name}_discarded_total", F.col(DROPPED_BY) == name, stage=name
                )
                out = mark_dropped(out, abort_c, name)
            return out
        if typ == "enrich":
            table = self.enrich_tables[spec["table"]]
            miss = f"_miss_{name}"
            out = enrich_fn(
                df, table, on=spec["on"], prefix=spec.get("prefix"), miss_flag_field=miss
            )
            # keep the hidden miss flag through to the terminal frame;
            # sinks strip underscore-prefixed internals
            tele.add(f"{name}_lookup_miss_total", alive & F.col(miss), stage=name)
            return out
        # stateless shapers / parsers — pass config straight through
        # Aggregating (Task) transforms change row identity — rows
        # soft-dropped upstream must be materialized OUT before the
        # aggregation, or a deduped/filtered row would still count.
        if typ in ("log_to_metric", "reduce", "merge"):
            # flags/markers vanish at the aggregation boundary — bind
            # every pending counter (and events_in) to this frame
            tele.bind_unbound(df)
            if typ == "log_to_metric":
                # missing/null metric field emits no metric AND counts
                # as a processing error (log_to_metric.rs:370-400);
                # bound to THIS frame — the aggregation changes schema
                for m in spec.get("metrics", []):
                    tele.add(
                        f"{name}_processing_errors_total",
                        alive & F.col(m["field"]).isNull(),
                        frame=df,
                    )
            df = live(df)
        simple = {
            "add_fields": shapers.add_fields,
            "remove_fields": shapers.remove_fields,
            "rename_fields": shapers.rename_fields,
            "concat": shapers.concat_fields,
            "ansi_stripper": shapers.ansi_stripper,
            "coercer": shapers.coercer,
            "regex_parser": parsers.regex_parser,
            "grok_parser": grok_mod.grok_parser,
            "json_parser": parsers.json_parser,
            "json_array_parser": parsers.json_array_parser,
            "field_filter": core.field_filter,
            "key_value_parser": parsers.key_value_parser,
            "logfmt_parser": parsers.logfmt_parser,
            "tokenizer": parsers.tokenizer,
            "split": parsers.split_fields,
            "log_to_metric": metrics_mod.log_to_metric,
            "reduce": reduce_events,
            "merge": merge_partial,
        }
        if typ in simple:
            return simple[typ](df, **spec)
        raise ValueError(f"unknown transform type {typ!r}")

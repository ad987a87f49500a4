"""Telemetry: Vector's internal events as single-pass conditional
aggregates.

Reference: src/internal_events/topology.rs:5-38 (events_in_total /
events_out_total per component) + per-transform discard/error events
(e.g. RouteEventDiscarded, SampleEventDiscarded,
ProcessingError counters).

Vector increments atomic counters per event. A faithful translation
(accumulators / per-stage count() actions) would either be unreliable
(accumulators re-fire on retries) or rescan the input N times. The
Spark-first design: drop-type operators MARK rows (``_dropped_by``
column) instead of filtering mid-plan; ONE aggregation over the final
frame computes every counter (count + sum(when(flag,1)) fuse into a
single whole-stage-codegen pass), and sinks filter the marked rows at
write time. events_in - events_out - discarded - errors = 0 holds
exactly (FIXTURES.md F7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DROPPED_BY = "_dropped_by"


@dataclass
class Telemetry:
    """Collects flag expressions registered by pipeline stages; one
    ``collect()`` action per distinct bound frame computes all
    counters (normally a single pass over the terminal frame).

    A counter may be BOUND to the frame it was registered on
    (``frame=``): needed when a downstream aggregation (log_to_metric
    / reduce) changes the schema so the flag's columns no longer exist
    at the terminal. Unbound counters evaluate on the terminal frame.

    Each counter records the ``stage`` that registered it so the
    pipeline can re-bind counters whose stage is NOT an ancestor of
    the terminal transform (forked DAG): their marks don't exist on
    the terminal frame and would silently read 0 there.
    """

    counters: list[tuple[str, Column, DataFrame | None, str | None]] = field(
        default_factory=list
    )
    events_in_frame: DataFrame | None = None

    def add(
        self,
        name: str,
        flag: Column,
        frame: DataFrame | None = None,
        stage: str | None = None,
    ) -> None:
        self.counters.append((name, flag, frame, stage))

    def bind_unbound(self, frame: DataFrame) -> None:
        """Snapshot: bind every still-unbound counter to ``frame``.
        Called by the pipeline right before a schema-changing
        aggregation (log_to_metric/reduce/merge) — the flags' columns
        won't exist afterwards. Also pins events_in to this frame."""
        self.counters = [
            (n, f, frame if fr is None else fr, st) for n, f, fr, st in self.counters
        ]
        if self.events_in_frame is None:
            self.events_in_frame = frame

    def bind_off_lineage(
        self, frames: dict[str, DataFrame], lineage: set[str]
    ) -> None:
        """Bind every unbound counter whose stage is NOT an ancestor of
        the terminal transform to that stage's own output frame — on a
        forked DAG the terminal frame never saw the branch's marks, so
        evaluating there would silently report 0."""
        self.counters = [
            (
                n,
                f,
                frames[st] if fr is None and st is not None and st not in lineage else fr,
                st,
            )
            for n, f, fr, st in self.counters
        ]

    def collect(self, df: DataFrame) -> dict[str, int]:
        out: dict[str, int] = {}
        # group: terminal-evaluable counters in one agg; bound counters
        # per distinct frame
        groups: dict[int, tuple[DataFrame, list[tuple[str, Column]]]] = {}
        terminal: list[tuple[str, Column]] = []
        for name, flag, frame, _stage in self.counters:
            if frame is None:
                terminal.append((name, flag))
            else:
                groups.setdefault(id(frame), (frame, []))[1].append((name, flag))
        in_frame = self.events_in_frame if self.events_in_frame is not None else df
        if in_frame is df:
            aggs = [F.count(F.lit(1)).alias("events_in_total")]
            aggs += [F.sum(F.when(flag, 1).otherwise(0)).alias(n) for n, flag in terminal]
            row = df.agg(*aggs).first()
            out.update(
                {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
            )
        else:
            out["events_in_total"] = int(
                in_frame.agg(F.count(F.lit(1)).alias("c")).first().c
            )
            if terminal:
                row = df.agg(
                    *[F.sum(F.when(flag, 1).otherwise(0)).alias(n) for n, flag in terminal]
                ).first()
                out.update(
                    {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}
                )
        for frame, items in groups.values():
            row = frame.agg(
                *[F.sum(F.when(flag, 1).otherwise(0)).alias(n) for n, flag in items]
            ).first()
            out.update({k: (int(v) if v is not None else 0) for k, v in row.asDict().items()})
        return out


def mark_dropped(df: DataFrame, cond: Column, stage: str) -> DataFrame:
    """Mark rows dropped by ``stage`` (only if not already dropped
    upstream — first drop wins, matching per-event flow order)."""
    if DROPPED_BY in df.columns:
        new = F.when(F.col(DROPPED_BY).isNotNull(), F.col(DROPPED_BY)).otherwise(
            F.when(cond, F.lit(stage))
        )
    else:
        new = F.when(cond, F.lit(stage))
    return df.withColumn(DROPPED_BY, new)


def live(df: DataFrame) -> DataFrame:
    """Rows not dropped by any stage (what a sink writes)."""
    if DROPPED_BY not in df.columns:
        return df
    return df.filter(F.col(DROPPED_BY).isNull()).drop(DROPPED_BY)


def alive_col(df: DataFrame) -> Column:
    if DROPPED_BY not in df.columns:
        return F.lit(True)
    return F.col(DROPPED_BY).isNull()


def telemetry_frame(spark, counters: dict[str, int], labels: dict[str, str] | None = None):
    """Expose collected counters as a DataFrame — the analogue of
    Vector's ``internal_metrics`` source (src/sources/internal_metrics)
    feeding any sink. Schema matches the metrics frame family:
    (name, value, labels map)."""
    from pyspark.sql import functions as F

    rows = [(k, float(v)) for k, v in sorted(counters.items())]
    df = spark.createDataFrame(rows, "name string, value double")
    lbl = labels or {}
    if lbl:
        m = F.create_map(*[x for kv in sorted(lbl.items()) for x in (F.lit(kv[0]), F.lit(kv[1]))])
    else:
        m = F.lit(None).cast("map<string,string>")
    return df.withColumn("labels", m)


def prometheus_text(counters: dict[str, int], labels: dict[str, str] | None = None) -> str:
    """Render counters in the Prometheus exposition text format
    (the prometheus_exporter sink analogue, src/sinks/prometheus/)."""
    lbl = ""
    if labels:
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        lbl = "{" + inner + "}"
    lines = []
    for name, value in sorted(counters.items()):
        safe = name.replace("-", "_")
        lines.append(f"# TYPE {safe} counter")
        lines.append(f"{safe}{lbl} {float(value)}")
    return "\n".join(lines) + "\n"

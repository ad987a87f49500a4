"""Resumable runs: per-shard checkpointing with lineage + metrics.

Reference: Vector's file-source Checkpointer persists per-file
fingerprint→offset so a restart resumes without loss or duplication
(lib/file-source/src/checkpointer.rs:40,268,288); sink disk buffers
WAL events (lib/vector-core/buffers/src/disk/mod.rs).

Spark translation: the unit of resumability is an input FILE GROUP
(shard). The driver lists the input's parquet files (public
``DataFrame.inputFiles()``), deterministically round-robins them into
N shards, and processes each shard as an independent job. After a
shard commits, a small JSON checkpoint record is written (shard id,
file list = lineage, per-stage telemetry, events_in/out). A resumed
run skips completed shards — no loss, no duplication, per-partition
lineage — the observable contract of Vector's checkpointing without
replicating leveldb.

Exactly-once guarantees (both failure modes are covered, not prose):

- **No duplication on crash-between-write-and-checkpoint**: shard
  output must be IDEMPOTENT. ``shard_output_path(root, sid)`` gives a
  shard-scoped directory; ``process`` writes it with
  ``mode("overwrite")`` so a replayed shard overwrites its own partial
  output instead of appending a second copy. A ``shard-<id>.inprogress``
  marker brackets each attempt; on resume, a marker without a matching
  committed checkpoint identifies a crashed attempt and the optional
  ``cleanup(shard_id)`` hook runs before reprocessing (for sinks that
  cannot overwrite, e.g. message queues).
- **No loss on input/shard-count drift**: a committed checkpoint is
  honored only if its recorded ``lineage_files`` EXACTLY match the
  current shard's file list; any mismatch (files added/removed,
  ``n_shards`` changed) reprocesses the shard instead of silently
  skipping unprocessed files.

At 10^12-row scale each shard is a few thousand parquet files; shard
count bounds both recovery granularity and scheduler overhead.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ShardResult:
    shard_id: int
    files: list[str]
    telemetry: dict
    sink_counts: dict
    wall_seconds: float
    skipped: bool = False


def shard_files(files: list[str], n_shards: int) -> list[list[str]]:
    """Deterministic round-robin of the sorted file list."""
    ordered = sorted(files)
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, f in enumerate(ordered):
        shards[i % n_shards].append(f)
    return [s for s in shards if s]


class CheckpointLog:
    """One JSON file per committed shard under ``ckpt_dir`` — atomic
    via write-temp-then-rename (same guarantee class the reference
    gets from checkpoint file rewrites)."""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def done_shards(self) -> set[int]:
        out = set()
        for fn in os.listdir(self.dir):
            if fn.startswith("shard-") and fn.endswith(".json"):
                out.add(int(fn[len("shard-") : -len(".json")]))
        return out

    def committed_lineage(self, shard_id: int) -> list[str] | None:
        """Recorded lineage for a committed shard, or None."""
        path = os.path.join(self.dir, f"shard-{shard_id}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f).get("lineage_files")

    # -- in-progress markers: bracket each attempt so a crash between
    # the sink write and the checkpoint commit is detectable on resume
    def _marker(self, shard_id: int) -> str:
        return os.path.join(self.dir, f"shard-{shard_id}.inprogress")

    def mark_inprogress(self, shard_id: int, run_id: str, files: list[str]) -> None:
        tmp = self._marker(shard_id) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {"run_id": run_id, "shard_id": shard_id, "lineage_files": files}, f
            )
        os.replace(tmp, self._marker(shard_id))

    def crashed_attempt(self, shard_id: int) -> bool:
        return os.path.exists(self._marker(shard_id))

    def inprogress_shards(self) -> set[int]:
        out = set()
        for fn in os.listdir(self.dir):
            if fn.startswith("shard-") and fn.endswith(".inprogress"):
                out.add(int(fn[len("shard-") : -len(".inprogress")]))
        return out

    def clear_inprogress(self, shard_id: int) -> None:
        try:
            os.remove(self._marker(shard_id))
        except FileNotFoundError:
            pass

    def remove(self, shard_id: int) -> None:
        """Delete a committed checkpoint record (stale-shard cleanup)."""
        try:
            os.remove(os.path.join(self.dir, f"shard-{shard_id}.json"))
        except FileNotFoundError:
            pass
        self.clear_inprogress(shard_id)

    def record(self, res: ShardResult, run_id: str) -> None:
        path = os.path.join(self.dir, f"shard-{res.shard_id}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "run_id": run_id,
                    "shard_id": res.shard_id,
                    "lineage_files": res.files,
                    "telemetry": res.telemetry,
                    "sink_counts": res.sink_counts,
                    "wall_seconds": res.wall_seconds,
                    "committed_at_unix": time.time(),
                },
                f,
            )
        os.replace(tmp, path)

    def read_all(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self.dir)):
            if fn.startswith("shard-") and fn.endswith(".json"):
                with open(os.path.join(self.dir, fn)) as f:
                    out.append(json.load(f))
        return out


def shard_output_path(root: str, shard_id: int) -> str:
    """Shard-scoped sink directory. Writing it with ``mode("overwrite")``
    makes shard replays idempotent — a crashed attempt's partial output
    is overwritten, never duplicated. Readers take ``root`` and see the
    union (hive-style ``shard=`` partition directory)."""
    return os.path.join(root, f"shard={shard_id}")


def resumable_run(
    spark: SparkSession,
    input_path: str,
    ckpt_dir: str,
    process: Callable[[DataFrame, int], "object"],
    n_shards: int = 8,
    run_id: str | None = None,
    cleanup: Callable[[int], None] | None = None,
) -> list[ShardResult]:
    """Process ``input_path`` in N resumable shards.

    ``process(df, shard_id)`` runs the pipeline on one shard's frame
    and must write its sinks IDEMPOTENTLY — shard-scoped overwrite via
    ``shard_output_path(root, shard_id)`` (see module docstring); it
    returns an object with ``telemetry`` and ``sink_counts`` attributes
    (PipelineResult fits).

    A shard is skipped only when its committed checkpoint's lineage
    EXACTLY matches the current shard's file list; changed inputs or
    ``n_shards`` reprocess. A crashed attempt (in-progress marker, no
    commit) triggers ``cleanup(shard_id)`` if given, then reprocesses.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    files = spark.read.parquet(input_path).inputFiles()
    shards = shard_files(files, n_shards)
    log = CheckpointLog(ckpt_dir)
    # shard-count SHRINK leaves output/checkpoints for ids beyond the
    # new range — reprocessing alone would duplicate their rows next to
    # the rewritten shards. With a cleanup hook the stale shards are
    # scrubbed; without one this is unrecoverable here, so fail loudly
    # instead of silently double-counting.
    # committed AND crashed-in-progress shards both count: a crashed
    # attempt beyond the new range left partial output behind too
    stale = sorted(
        sid
        for sid in (log.done_shards() | log.inprogress_shards())
        if sid >= len(shards)
    )
    if stale:
        if cleanup is None:
            raise ValueError(
                f"checkpoint dir has committed shards {stale} beyond the "
                f"current shard count {len(shards)} — their sink output "
                "would duplicate the reprocessed data. Pass cleanup= to "
                "scrub stale shard outputs, or keep n_shards stable."
            )
        for sid in stale:
            cleanup(sid)
            log.remove(sid)
    results: list[ShardResult] = []
    for sid, shard in enumerate(shards):
        committed = log.committed_lineage(sid)
        if committed is not None and sorted(committed) == sorted(shard):
            log.clear_inprogress(sid)
            results.append(ShardResult(sid, shard, {}, {}, 0.0, skipped=True))
            continue
        if committed is not None and cleanup is not None:
            # COMMITTED but lineage mismatches (files added/removed):
            # for non-overwrite sinks the previously committed output
            # would sit next to the reprocessed rows — scrub it and
            # drop the stale record before reprocessing
            cleanup(sid)
            log.remove(sid)
        elif log.crashed_attempt(sid) and cleanup is not None:
            cleanup(sid)
        log.mark_inprogress(sid, run_id, shard)
        t0 = time.monotonic()
        df = spark.read.parquet(*shard)
        pres = process(df, sid)
        res = ShardResult(
            shard_id=sid,
            files=shard,
            telemetry=getattr(pres, "telemetry", {}),
            sink_counts=getattr(pres, "sink_counts", {}),
            wall_seconds=time.monotonic() - t0,
        )
        log.record(res, run_id)
        log.clear_inprogress(sid)
        results.append(res)
    return results

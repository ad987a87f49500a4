"""remap — the VRL transform (src/transforms/remap.rs:16-128).

Vector compiles a VRL program once per config and interprets it per
event. Here a remap program is an ordered list of path assignments
``.target = <VRL-lite expr>`` compiled to one ``withColumns``
projection — Catalyst fuses the whole program into whole-stage
codegen; there is no per-event interpreter.

Error/abort semantics (remap.rs:77-127: on error the event passes
through UNMODIFIED unless drop_on_error; VRL forces `??`/`!` handling
at compile time):

- ``??`` inside expressions is the supported error-handling operator
  (→ coalesce), mirroring VRL's infallibility discipline.
- ``abort_when`` condition ≈ VRL `abort`: matching rows either pass
  through with NO assignments applied (rollback — the reference clones
  the pre-transform event) or are dropped with ``drop_on_abort``.
- ``error_when`` (optional) marks rows as failed: with
  ``drop_on_error`` they are dropped, otherwise they pass through
  unmodified and can be counted via the ``error_flag_field``.

Array-root emission (vrl_target.rs:42-51: program returning a root
array → N events) is the separate ``explode_events`` operator.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition, compile_vrl_lite


def _compile_expr(expr: Any) -> Column:
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, str):
        return compile_vrl_lite(expr)
    return F.lit(expr)


def remap(
    df: DataFrame,
    assignments: Mapping[str, Any] | Sequence[tuple[str, Any]],
    abort_when: Any | None = None,
    error_when: Any | None = None,
    drop_on_abort: bool = False,
    drop_on_error: bool = False,
    error_flag_field: str | None = None,
) -> DataFrame:
    """Apply an ordered assignment program. Targets may be new or
    existing columns; later assignments see earlier ones (sequential
    ``withColumn`` chain, mirroring VRL statement order)."""
    items = assignments.items() if isinstance(assignments, Mapping) else assignments

    skip = None
    if abort_when is not None:
        abort_c = F.coalesce(compile_condition(abort_when), F.lit(False))
        if drop_on_abort:
            df = df.filter(~abort_c)
        else:
            skip = abort_c
    if error_when is not None:
        err_c = F.coalesce(compile_condition(error_when), F.lit(False))
        if drop_on_error:
            df = df.filter(~err_c)
        else:
            skip = err_c if skip is None else (skip | err_c)
            if error_flag_field:
                df = df.withColumn(error_flag_field, err_c)

    for target, expr in items:
        # statement forms (lib/vrl/stdlib del.rs / only_fields.rs):
        # ("__del__", ".field") drops a column, ("__only__", [fields])
        # projects to the listed fields — the VRL path-mutation surface
        # on a fixed schema. Rollback semantics: column presence cannot
        # vary per row, so when an abort/error skip is active the
        # deleted/unlisted columns are NULLED for non-skipped rows and
        # keep their original value for skipped rows ("event passes
        # through unmodified"); without a skip they drop entirely.
        if target == "__del__":
            fields = [f.lstrip(".") for f in (expr if isinstance(expr, (list, tuple)) else [expr])]
            if skip is None:
                df = df.drop(*fields)
            else:
                for f in fields:
                    if f in df.columns:
                        df = df.withColumn(
                            f, F.when(skip, F.col(f)).otherwise(F.lit(None))
                        )
            continue
        if target == "__only__":
            keep = [f.lstrip(".") for f in expr]
            extra = [c for c in df.columns if c.startswith("_")]  # plan internals
            if skip is None:
                df = df.select(*keep, *[c for c in extra if c not in keep])
            else:
                for c in df.columns:
                    if c not in keep and not c.startswith("_"):
                        df = df.withColumn(
                            c, F.when(skip, F.col(c)).otherwise(F.lit(None))
                        )
            continue
        target = target.lstrip(".")
        new_col = _compile_expr(expr)
        if skip is not None and target in df.columns:
            # rollback semantics: skipped rows keep the original value
            new_col = F.when(skip, F.col(target)).otherwise(new_col)
        elif skip is not None:
            new_col = F.when(skip, F.lit(None)).otherwise(new_col)
        df = df.withColumn(target, new_col)
    return df


def remap_program(
    df: DataFrame,
    source: str,
    drop_on_abort: bool = False,
    abort_flag_field: str | None = None,
) -> DataFrame:
    """Run a multi-statement VRL program (``if``/``else`` control flow,
    local variables, ``del``, ``abort`` — remap.rs's `source` field)
    against the frame as ONE Catalyst projection.

    The program is symbolically executed at plan time
    (functions/vrl_program.py): branches become when/otherwise trees,
    locals fold into the expressions that read them, and abort keeps
    the reference's rollback semantics (aborting events pass through
    unmodified unless ``drop_on_abort``). No per-event interpreter —
    the compiled program runs inside whole-stage codegen.
    """
    from vector_spark.functions.vrl_program import compile_vrl_program

    return compile_vrl_program(source).apply(
        df, drop_on_abort=drop_on_abort, abort_flag_field=abort_flag_field
    )


def explode_events(df: DataFrame, array_field: str, target: str | None = None) -> DataFrame:
    """Root-array → N events (vrl_target.rs:42-51 into_events): one
    output row per array element; other columns are carried along.
    ``flatMap``-shape via the built-in generator — stays JVM-side."""
    target = target or array_field
    out = df.withColumn(target, F.explode(F.col(array_field)))
    return out


def custom_stage(df: DataFrame, fn, schema: str) -> DataFrame:
    """Escape hatch for logic neither Column exprs nor the VRL-lite
    subset can express — the lua/wasm extension point of the reference
    (src/transforms/lua/v2/mod.rs:15-834, wasm.rs:24-345).

    ``fn(iterator[pandas.DataFrame]) -> iterator[pandas.DataFrame]``
    runs per Arrow batch (mapInPandas): one Python crossing per batch,
    never per row. State (the Lua ``hooks.init`` analogue) lives in
    the closure, initialized once per partition."""
    return df.mapInPandas(fn, schema=schema)

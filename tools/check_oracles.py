"""Local emulation of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet; compare row count + sorted-column value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import numbers
import sys

sys.path.insert(0, ".")

import duckdb


def norm_cell(v):
    # Dtype-faithful: the driver's value hash distinguishes int64 917
    # from float64 917.0 (the r4 oov_rate red row), so ints and floats
    # must normalize differently here too. Floats keep a 6-sig-digit
    # tolerance but carry an "f:" tag; integrals carry "i:".
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, numbers.Integral):
        return f"i:{int(v)}"
    if isinstance(v, numbers.Real):
        fv = float(v)
        if math.isnan(fv):
            return "f:NaN"
        return f"f:{fv:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False))
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from vector_spark import get_spark

    spark = get_spark("oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.all_queries()
    oracles = entrymod.all_oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {str(e)[:160]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf)} (no oracle — rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE-ERROR {str(e)[:160]}")
            failures.append(name)
            continue
        scols, srows = frame_sig(sdf)
        ocols, orows = frame_sig(odf)
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
        if scols != ocols:
            status.append(f"COLS spark={scols} oracle={ocols}")
        if not status and srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            status.append(f"VALUES first-diffs={diff}")
        if status:
            print(f"{name:24s} MISMATCH {'; '.join(status)[:400]}")
            failures.append(name)
        else:
            print(f"{name:24s} OK rows={len(srows)}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump before/after formatted plans for the round-6 optimization
evidence (plans/r06/<query>_{before,after}.txt).

"before" re-creates the round-5 plan by disabling the scan
redistribution (SPARK_GRAFT_SCAN_REDIST=off reproduces the old _load
byte-for-byte); "after" is the current default. Run against a scale
where the redistribution decision actually fires (sf1.0).

argv: sf_dir phase(before|after) query1,query2,...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, phase = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    assert phase in ("before", "after")
    if phase == "before":
        os.environ["SPARK_GRAFT_SCAN_REDIST"] = "off"
    import __spark_entry__ as entrymod
    from vector_spark import get_spark

    spark = get_spark("plans_r06")
    qs = entrymod.all_queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        plan = "".join(
            ch if ch in "\n\t" or ord(ch) >= 32 else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        with open(os.path.join(outdir, f"{name}_{phase}.txt"), "w") as f:
            f.write(plan.strip() + "\n")
        print(name, phase, "ok")
    spark.stop()


if __name__ == "__main__":
    main()

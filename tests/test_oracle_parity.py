"""Spark-vs-DuckDB oracle parity inside the pytest gate.

The driver's correctness check runs every __spark_entry__ query
against its oracle at sf=0.01; this test folds a representative
subset into `python -m pytest -x -q` (the north-rule verification
command) so parity regressions fail fast. Full sweep:
`python tools/check_oracles.py /root/testdata/sf0.01`.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

REPRESENTATIVE = [
    "flagship_pipeline",   # the whole pipeline
    "sample",              # md5-hash determinism
    "grok_parser",         # regex/grok machinery
    "reduce",              # ordered aggregation + decimal sums
    "dedup_exact",         # md5 fingerprints
    "simhash",             # portable bit arithmetic
    "embed_topk",          # float rounding + ranking
    "tag_cardinality",     # windowed first-N
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    return str(v)


def _sig(pdf):
    cols = sorted(pdf.columns)
    return cols, sorted(tuple(_norm(v) for v in r) for r in pdf[cols].itertuples(index=False))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_matches_oracle(spark, ddb, name):
    sdf = entrymod.all_queries()[name](spark, SF_DIR).toPandas()
    odf = ddb.execute(entrymod.all_oracle_sql()[name]).df()
    scols, srows = _sig(sdf)
    ocols, orows = _sig(odf)
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows


def test_every_query_has_callable_and_oracle_alignment():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # the driver records the FIRST 50 entries — the window must be
    # exactly 50, fully oracle-backed, and ordered per _WINDOW
    assert len(qs) == 50
    assert list(qs) == entrymod._WINDOW
    assert set(oracles) == set(qs)
    # every fine-grained gate stays oracle-backed too
    allq = entrymod.all_queries()
    allo = entrymod.all_oracle_sql()
    assert set(qs) <= set(allq)
    assert set(allo) == set(allq)

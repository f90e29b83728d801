"""Driver-harness mirror: every oracle-SQL query must match DuckDB exactly
at sf0.001 (full sweep at sf0.01 lives in tools/crosscheck.py — this keeps
`pytest -x -q` fast while still guarding the whole SQL matrix)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tools.crosscheck import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF_DIR)


def _sql_names():
    return sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", _sql_names())
def test_sql_query_matches_duckdb(spark, duck, name):
    sdf = E.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(E.oracle_sql()[name]).df()
    err = compare(sdf, ddf)
    assert err is None, f"{name}: {err}"


def test_rows_only_queries_execute(spark):
    qs = E.queries()
    sqls = E.oracle_sql()
    slow = {"cc_iterate", "canon_rewrite", "triple_materialize", "kg_triples_per_entity"}
    for name in sorted(set(qs) - set(sqls) - slow):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    out = E.entry(spark)
    assert out.count() > 0
    assert {"subj", "pred", "obj", "lineage_id", "part_key"} <= set(out.columns)

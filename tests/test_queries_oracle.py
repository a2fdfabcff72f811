"""Every registry query runs at sf0.001 and matches its DuckDB oracle.

This is the same comparison the driver's correctness gate performs
(row count + sorted column names + values), at the smoke scale factor so
the suite stays fast; tools/check_oracle.py covers sf0.01.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from hbase_tohdfs_spark.queries import REGISTRY
from tools.check_oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    problems = compare(name, df, duck, spec.oracle)
    assert not problems, "\n".join(problems)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10

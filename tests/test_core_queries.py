"""Every queries() entry must match its DuckDB oracle at sf0.001 (fast) —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_check import check


def _names():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return sorted(k for k in qs if k in oracles)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    check(spark, name, SF_SMOKE)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns[0] == "conv_id"


def test_all_queries_have_oracles():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    missing = [k for k in os_ if k not in qs]
    assert not missing, f"oracle without query: {missing}"

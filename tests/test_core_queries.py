"""Q01-Q18 (SURVEY.md §2.6): Spark result must equal the DuckDB oracle."""

from __future__ import annotations

import pytest

from flatterer_spark.queries import CORE_ORACLE, CORE_QUERIES
from tests.oracle_util import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_core_query_matches_oracle(name, spark, sf_dir, con):
    df = CORE_QUERIES[name](spark, sf_dir)
    problems = compare(df, con, CORE_ORACLE[name])
    assert not problems, f"{name}: {problems}"

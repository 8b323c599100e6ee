"""q47-q59 (TPC-H completion set): Spark result must equal the DuckDB oracle."""

from __future__ import annotations

import pytest

from flatterer_spark.tpch_queries import TPCH_ORACLE, TPCH_QUERIES
from tests.oracle_util import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_every_tpch_query_has_an_oracle():
    assert set(TPCH_QUERIES) == set(TPCH_ORACLE)


@pytest.mark.parametrize("name", sorted(TPCH_QUERIES))
def test_tpch_query_matches_oracle(name, spark, sf_dir, con):
    df = TPCH_QUERIES[name](spark, sf_dir)
    problems = compare(df, con, TPCH_ORACLE[name])
    assert not problems, f"{name}: {problems}"


def test_tpch_results_nonempty(spark, sf_dir):
    """Every completion-set query must actually exercise its operators: a
    predicate that matches nothing (wrong literal for the testdata domain)
    would pass the oracle compare vacuously."""
    for name, fn in TPCH_QUERIES.items():
        n = fn(spark, sf_dir).count()
        assert n > 0, f"{name} returned no rows"

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``flatterer_spark`` package; this module only
wires it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 (pricing summary
    report -- scan-pushed filter -> partial/final hash aggregate -> sort)."""
    from flatterer_spark.tpch_queries import q47_pricing_summary

    return q47_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flatterer_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from flatterer_spark.registry import all_oracles

    return all_oracles()

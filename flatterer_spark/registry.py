"""Central registry: every implemented query/operator exposed to the driver.

Keys with an oracle entry are hash-checked against DuckDB; keys without one
(genuinely non-SQL-expressible ops) get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flatterer_spark.queries import CORE_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(CORE_QUERIES)
    try:
        from flatterer_spark.ext_queries import EXT_QUERIES

        out.update(EXT_QUERIES)
    except ImportError:
        pass
    try:
        from flatterer_spark.flatten_queries import FLATTEN_QUERIES

        out.update(FLATTEN_QUERIES)
    except ImportError:
        pass
    try:
        from flatterer_spark.curation import CURATION_QUERIES

        out.update(CURATION_QUERIES)
    except ImportError:
        pass
    try:
        from flatterer_spark.streaming.gate_queries import STREAM_GATE_QUERIES

        out.update(STREAM_GATE_QUERIES)
    except ImportError:
        pass
    return out


def all_oracles() -> dict[str, str]:
    from flatterer_spark.queries import CORE_ORACLE

    out: dict[str, str] = {}
    out.update(CORE_ORACLE)
    try:
        from flatterer_spark.ext_queries import EXT_ORACLE

        out.update(EXT_ORACLE)
    except ImportError:
        pass
    try:
        from flatterer_spark.flatten_queries import FLATTEN_ORACLE

        out.update(FLATTEN_ORACLE)
    except ImportError:
        pass
    try:
        from flatterer_spark.curation import CURATION_ORACLE

        out.update(CURATION_ORACLE)
    except ImportError:
        pass
    try:
        from flatterer_spark.streaming.gate_queries import STREAM_GATE_ORACLE

        out.update(STREAM_GATE_ORACLE)
    except ImportError:
        pass
    return out

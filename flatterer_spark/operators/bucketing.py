"""Bucketed (co-located) joins: the shuffle-elimination path for repeated
big-table equi-joins.

At 100 TB the dominant join cost is shuffling the fact table every time it
meets a dimension or another fact on the same key.  Bucketing pays that
shuffle ONCE at write time: both sides are hash-partitioned into the same
number of buckets on the join key and sorted within each bucket, so every
subsequent equi-join on that key is a zero-exchange sort-merge join (each
task reads bucket i of both sides).  This is Spark's native analogue of the
reference's pushdown advice ("save you doing extra joins for common
queries", docs/options.md:154): pre-pay at layout time for cheap reads.

Contract pinned by tests/test_bucketing.py: the joined plan contains no
Exchange on either bucketed side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sorted_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table.

    ``n_buckets`` should be sized so one bucket of the largest table fits an
    executor's read budget (buckets = parallelism floor for bucket scans).
    Bucketed layout requires ``saveAsTable`` (bucket metadata lives in the
    catalog, not the parquet files).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(sorted_by or key)
        .format("parquet")
        .saveAsTable(table)
    )


def _bucket_spec(
    spark: SparkSession, table: str
) -> tuple[int, list[str]] | None:
    """(num_buckets, [bucket_columns...]) from the catalog, or None."""
    n, cols = None, None
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if row.col_name == "Num Buckets":
            n = int(row.data_type)
        elif row.col_name == "Bucket Columns":
            cols = [
                c.strip("` ")
                for c in row.data_type.strip("[] ").split(",")
                if c.strip("` ")
            ]
    return (n, cols) if n is not None else None


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on``: planned as a zero-exchange
    sort-merge join.  Raises if either side's catalog bucketSpec is absent
    or mismatched -- a silent fallback would reintroduce the full shuffle
    this module exists to eliminate."""
    specs = {t: _bucket_spec(spark, t) for t in (left_table, right_table)}
    for t, spec in specs.items():
        if spec is None:
            raise ValueError(f"{t} is not bucketed (write with write_bucketed)")
        # the FULL bucket-column list must be exactly [on]: a table
        # bucketed on (on, other) hash-distributes by the pair, which does
        # NOT co-locate rows by `on` alone -- Spark would plan an Exchange
        # and the zero-shuffle contract would fail silently
        if spec[1] != [on]:
            raise ValueError(f"{t} is bucketed on {spec[1]!r}, not [{on!r}]")
    if specs[left_table][0] != specs[right_table][0]:
        raise ValueError(
            f"bucket counts differ: {specs[left_table][0]} vs "
            f"{specs[right_table][0]} -- the join would re-shuffle"
        )
    return spark.table(left_table).join(spark.table(right_table), on, how)

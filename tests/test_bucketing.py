"""Bucketed co-located join contract: after paying the layout-time shuffle,
equi-joins on the bucket key must plan with NO exchange on either side."""

from __future__ import annotations

import pytest

from tests.conftest import plan_of as _plan


@pytest.fixture()
def warehouse(spark):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # the contract targets the both-sides-too-big-to-broadcast regime; at
    # test scale Catalyst would otherwise pick a broadcast join and hide it
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    from flatterer_spark.operators.bucketing import colocated_join, write_bucketed
    from flatterer_spark.queries import T

    write_bucketed(
        T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", n_buckets=8,
    )
    write_bucketed(
        T(spark, sf_dir, "customer").selectExpr(
            "c_custkey AS o_custkey", "c_name", "c_acctbal"
        ),
        "b_customer", "o_custkey", n_buckets=8,
    )
    joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the join result is right
    want = (
        T(spark, sf_dir, "orders")
        .join(
            T(spark, sf_dir, "customer").selectExpr("c_custkey AS o_custkey"),
            "o_custkey",
        )
        .count()
    )
    assert joined.count() == want


def test_colocated_join_rejects_multicolumn_bucketing(spark, tmp_path):
    """A table bucketed on (key, other) hash-distributes by the PAIR --
    joining on key alone would silently re-shuffle.  The validator must
    reject it, not just check the first bucket column."""
    import pyspark.sql.functions as F
    import pytest

    from flatterer_spark.operators.bucketing import (
        colocated_join,
        write_bucketed,
    )

    try:
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("other")
        )
        (
            df.write.mode("overwrite")
            .bucketBy(4, "k", "other")
            .sortBy("k")
            .format("parquet")
            .saveAsTable("bkt_multi")
        )
        write_bucketed(df, "bkt_single", "k", n_buckets=4)
        with pytest.raises(ValueError, match="bucketed on"):
            colocated_join(spark, "bkt_multi", "bkt_single", on="k")
    finally:
        # rerun-safety: managed-table residue must never outlive the test
        for t in ("bkt_multi", "bkt_single"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

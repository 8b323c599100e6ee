"""Salted-join semantics: identical multiset of result rows as the plain
equi-join, including under an artificially hot key."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_salted_join_matches_plain_join(spark, sf_dir):
    from flatterer_spark.operators.skew import salted_join
    from flatterer_spark.queries import T

    # build a skewed fact: every event re-keyed so ~half share one hot key
    fact = (
        T(spark, sf_dir, "events")
        .selectExpr(
            "event_id",
            "CASE WHEN event_id % 2 = 0 THEN 1 ELSE user_id END AS user_id",
            "value",
        )
    )
    dim = T(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS user_id", "c_mktsegment"
    )
    got = salted_join(fact, dim, "user_id", n_salts=8)
    want = fact.join(dim, "user_id")
    assert got.count() == want.count()
    g = got.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    w = want.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")
    )
    gs = {r.c_mktsegment: (r.n, r.v) for r in g.collect()}
    ws = {r.c_mktsegment: (r.n, r.v) for r in w.collect()}
    assert gs.keys() == ws.keys()
    for seg in gs:
        assert gs[seg][0] == ws[seg][0]
        # double addition order differs between the two plans: tolerance, not
        # rounded equality
        assert abs(gs[seg][1] - ws[seg][1]) < 1e-6 * max(1.0, abs(ws[seg][1]))


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    from flatterer_spark.operators.skew import salted_join
    from flatterer_spark.queries import T

    fact = T(spark, sf_dir, "events").select("event_id", "user_id")
    # dim covering only some keys
    dim = (
        T(spark, sf_dir, "customer")
        .selectExpr("c_custkey AS user_id", "c_name")
        .where("c_custkey % 3 = 0")
    )
    got = salted_join(fact, dim, "user_id", n_salts=4, how="left")
    want = fact.join(dim, "user_id", "left")
    assert got.count() == want.count()
    assert (
        got.where("c_name IS NULL").count()
        == want.where("c_name IS NULL").count()
    )

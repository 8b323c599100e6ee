"""Focused pins for the r11 optimization-round internals.

Three changes altered operator internals without (by design) changing any
result: the from_json-built nested-array literals (`kmeans._nested_lit`),
the base-table DataFrame plan cache (`queries.T`), and the
checkpoint-before-sort PQ encode (`kmeans._sorted_output`).  These tests
pin the invariants each one relies on.
"""

from __future__ import annotations

import shutil
import struct

import pyspark.sql.functions as F


def _packed(x: float) -> bytes:
    return struct.pack("d", x)


class TestNestedLit:
    def test_bit_identical_to_elementwise_build(self, spark):
        from flatterer_spark.operators.kmeans import _nested_lit

        book = [
            [0.1 + 0.2, -0.0, 1e-308, 5e-324, 1.7976931348623157e308],
            [123456789.123456789, 1.0, 2.5, -3.75, 0.3333333333333333],
        ]
        elementwise = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in book]
        )
        one_call = _nested_lit(book, "array<array<double>>")
        row = spark.range(1).select(
            elementwise.alias("a"), one_call.alias("b")
        ).collect()[0]
        for c1, c2 in zip(row["a"], row["b"]):
            for x, y in zip(c1, c2):
                assert _packed(x) == _packed(y)

    def test_three_level_nesting(self, spark):
        from flatterer_spark.operators.kmeans import _nested_lit

        books = [[[float(b * 4 + c + d) / 7 for d in range(2)]
                  for c in range(3)] for b in range(2)]
        col = _nested_lit(books, "array<array<array<double>>>")
        got = spark.range(1).select(col.alias("b")).collect()[0]["b"]
        assert [[list(c) for c in bk] for bk in got] == books

    def test_constant_folds_to_literal(self, spark):
        # the whole point: Catalyst must fold the from_json into a plain
        # Literal so every downstream transform/fold sees a constant, not
        # a per-row JSON parse
        from flatterer_spark.operators.kmeans import _nested_lit

        col = _nested_lit([[1.0, 2.0]], "array<array<double>>")
        plan = (
            spark.range(1).select(col.alias("b"))
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "from_json" not in plan
        assert "[[1.0,2.0]]" in plan

    def test_non_finite_falls_back(self, spark):
        from flatterer_spark.operators.kmeans import _nested_lit

        inf_book = [[1.0, float("inf")]]
        got = spark.range(1).select(
            _nested_lit(inf_book, "array<array<double>>").alias("b")
        ).collect()[0]["b"]
        assert list(got[0])[0] == 1.0 and got[0][1] == float("inf")


class TestTCache:
    def test_hit_returns_same_plan_and_miss_on_rewrite(
        self, spark, sf_dir, tmp_path
    ):
        from flatterer_spark.queries import T

        work = tmp_path / "tcache_sf"
        work.mkdir()
        shutil.copy(f"{sf_dir}/nation.parquet", work / "nation.parquet")
        d1 = T(spark, str(work), "nation")
        d2 = T(spark, str(work), "nation")
        assert d1 is d2  # plan cache hit: same resolved DataFrame object
        n_before = d1.count()

        # rewrite the file (different rows, same schema) -> fingerprint
        # miss -> fresh resolution sees the new data
        rows = spark.read.parquet(f"{sf_dir}/nation.parquet").limit(3)
        rows.write.mode("overwrite").parquet(str(tmp_path / "stage"))
        shutil.rmtree(work / "nation.parquet", ignore_errors=True)
        (work / "nation.parquet").unlink(missing_ok=True)
        shutil.copytree(tmp_path / "stage", work / "nation.parquet")
        d3 = T(spark, str(work), "nation")
        assert d3 is not d1
        assert d3.count() == 3 != n_before

    def test_no_data_caching_in_plan(self, spark, sf_dir):
        # the memo must hold a plain file-scan plan, never a persisted /
        # InMemoryRelation artifact -- every execution re-reads parquet
        from flatterer_spark.queries import T

        plan = (
            T(spark, sf_dir, "nation")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "InMemoryRelation" not in plan


class TestSortedOutput:
    def test_matches_plain_sort_values_and_order(self, spark):
        from flatterer_spark.operators.kmeans import _sorted_output

        df = (
            spark.range(0, 500)
            .select(
                (F.col("id") * 37 % 500).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("v"),
            )
            .repartition(8)
        )
        got = _sorted_output(df, "k").collect()
        want = df.orderBy("k").collect()
        assert [r["k"] for r in got] == [r["k"] for r in want]
        assert sorted(r["v"] for r in got) == sorted(r["v"] for r in want)

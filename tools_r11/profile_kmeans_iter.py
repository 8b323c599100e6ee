"""Decompose kmeans_fit iteration cost: planning vs codegen vs job.

Times (a) marginal iteration cost via iters=1..5, (b) a single update-pass
job repeated with IDENTICAL literals (codegen/plan cache hit) vs fresh
literals, (c) plan-only time (explain) for the update pass.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    from flatterer_spark.operators.kmeans import _dists, assign_clusters, kmeans_fit
    from flatterer_spark.queries import T
    from flatterer_spark.session import get_spark

    spark = get_spark(app_name="profile-kmeans-iter")
    spark.sparkContext.setLogLevel("ERROR")
    emb = T(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    emb.count()  # warm FS

    for iters in (1, 2, 3, 5):
        t0 = time.perf_counter()
        kmeans_fit(emb, "embedding", "vec_id", k=10, iters=iters)
        print(f"kmeans_fit iters={iters}: {time.perf_counter()-t0:.3f}s", flush=True)

    # fixed centroids: the update-pass job with identical literals, 3x
    df = emb.repartition(spark.sparkContext.defaultParallelism).persist()
    df.count()
    seed = df.orderBy("vec_id").limit(10).select("embedding").collect()
    cents = [[float(x) for x in r[0]] for r in seed]

    def update_job(c):
        assigned = assign_clusters(df, "embedding", c)
        vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        return (
            assigned.select("cluster", F.posexplode(vecd).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg("v").alias("mean"))
        )

    for i in range(3):
        t0 = time.perf_counter()
        update_job(cents).collect()
        print(f"update job (same literals) run {i}: {time.perf_counter()-t0:.3f}s", flush=True)

    # fresh literals each time (mimics per-iteration new centroids)
    for i in range(3):
        c2 = [[x + (i + 1) * 1e-6 for x in c] for c in cents]
        t0 = time.perf_counter()
        update_job(c2).collect()
        print(f"update job (fresh literals) run {i}: {time.perf_counter()-t0:.3f}s", flush=True)

    # plan-only cost (analysis+optimization, no execution)
    for i in range(3):
        c2 = [[x + (i + 1) * 1e-5 for x in c] for c in cents]
        t0 = time.perf_counter()
        update_job(c2)._jdf.queryExecution().executedPlan()
        print(f"plan-only (fresh literals) run {i}: {time.perf_counter()-t0:.3f}s", flush=True)

    # job floor: same persisted df, trivial agg
    for i in range(2):
        t0 = time.perf_counter()
        df.groupBy((F.col("vec_id") % 10).alias("g")).agg(F.count("*")).collect()
        print(f"trivial groupBy job run {i}: {time.perf_counter()-t0:.3f}s", flush=True)
    df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

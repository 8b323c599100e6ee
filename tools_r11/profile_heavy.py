"""Phase-level profiling of the heavy bench queries (guide 1.1/1.5).

Times sub-phases of the learned-model fits and reruns each target query
with the noop sink, labelled, printing per-run walls so steady-state vs
first-run cost is attributable.

Usage: python tools_r11/profile_heavy.py [name ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:45s} {dt:7.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    from flatterer_spark.registry import all_queries
    from flatterer_spark.session import get_spark

    spark = get_spark(app_name="profile-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm-up (same as bench.py)
    registry["q06_groupby_agg"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    from flatterer_spark.queries import T
    for tb in ("region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"):
        T(spark, SF_DIR, tb).count()

    if "kmeans_phases" in names:
        names.remove("kmeans_phases")
        from flatterer_spark.operators.kmeans import kmeans_fit, pq_fit
        emb = T(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        print("kmeans_fit phases:")
        t("kmeans_fit k=10 iters=5 (run 1)", lambda: kmeans_fit(emb, "embedding", "vec_id", k=10, iters=5))
        t("kmeans_fit k=10 iters=5 (run 2)", lambda: kmeans_fit(emb, "embedding", "vec_id", k=10, iters=5))
        print("pq_fit phases:")
        t("pq_fit m=8 k=16 iters=2 (run 1)", lambda: pq_fit(emb, "embedding", "vec_id", m=8, k=16, iters=2))
        t("pq_fit m=8 k=16 iters=2 (run 2)", lambda: pq_fit(emb, "embedding", "vec_id", m=8, k=16, iters=2))

    for name in names:
        fn = registry[name]
        print(f"{name}:")
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t(f"run {i}", lambda: noop(fn(spark, SF_DIR)))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()

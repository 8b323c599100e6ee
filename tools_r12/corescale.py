"""Core-count scaling runner (VERDICT r11 "Next round" #2).

The driver's 8-vs-32-core bench at sf0.1 is uninformative: nearly every
query sits at a 1-2 s fixed-overhead floor (driver expression build +
Catalyst + job scheduling), so walls do not move with cores.  This runner
times the heavy batch ops on the 10x perturbed corpus
(bench_scale.build_corpus -- the size where parallelism is measurable) at
``local[$SPARK_GRAFT_CPUS]``, min-of-2 noop-sink per op after a warm-up,
and prints ONE JSON line.  Protocol: run one process per core-count arm,
alternating arms (8, 32, 8, 32), then min-merge per arm and report
wall(8c)/wall(32c) -- the merged record is BENCH_SCALE_r12.json.

Usage: SPARK_GRAFT_CPUS=8 python tools_r12/corescale.py out.json [ops...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OPS = [
    "emb_pq_codes",
    "dedup_simhash_pairs",
    "dedup_bloom",
    "dedup_boilerplate",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "corpus_minhash_calibration",
    "corpus_source_overlap",
    "corpus_cm_sketch",
    "q51_market_share",
]


def main() -> None:
    out_path = sys.argv[1]
    ops = sys.argv[2:] or DEFAULT_OPS

    import bench_scale

    bench_scale.build_corpus()
    d = bench_scale.SCALE_DIR

    from flatterer_spark.registry import all_queries
    from flatterer_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="flatterer-corescale")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up: JVM/codegen + footer reads on the 10x corpus
    noop(registry["q47_pricing_summary"](spark, d))

    walls = {}
    for name in ops:
        spark.sparkContext.setJobDescription(f"corescale {name} @{cores}c")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            noop(registry[name](spark, d))
            best = min(best, time.perf_counter() - t0)
        walls[name] = round(best, 3)
        print(f"{name}: {walls[name]}s @ {cores} cores", flush=True)

    doc = {
        "metric": "corescale_x10_walls",
        "cpus": cores,
        "sf_dir": d,
        "timing": "min-of-2 noop-sink per op after warm-up, 10x corpus",
        "walls": walls,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "corescale_done", "cpus": cores,
                      "total": round(sum(walls.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Store-armed bench pair (VERDICT r11 "Next round" #8).

Arms ``FLATTERER_MODEL_STORE`` at a fresh temp dir and runs the
learned-model query family twice in one session: run A trains and
populates the store (expected LAST_STORE_EVENTS: miss), run B serves
every model from it (expected: hit).  Walls are single noop-sink runs
(no min-of-N: the A/B difference IS the train-vs-load delta).  Prints
one JSON line; the caller merges it into BENCH_LOCAL_r12.json's
``store_armed`` block.

Usage: python tools_r12/store_armed_bench.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STORE = tempfile.mkdtemp(prefix="flatterer_model_store_r12_")
os.environ["FLATTERER_MODEL_STORE"] = STORE

OPS = [
    "emb_kmeans",
    "emb_pq_codes",
    "emb_coreset_kcenter",
    "emb_quantize",
    "emb_outliers",
    "sim_topk_ivfpq",
    "dedup_semantic",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/store_armed_r12.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flatterer_spark.operators import model_store
    from flatterer_spark.registry import all_queries
    from flatterer_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="flatterer-store-armed")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(registry["q47_pricing_summary"](spark, sf_dir))  # warm-up

    runs = {}
    for tag in ("populate", "serve"):
        walls, events = {}, {}
        for name in OPS:
            model_store.LAST_STORE_EVENTS.clear()
            spark.sparkContext.setJobDescription(f"store-{tag} {name}")
            t0 = time.perf_counter()
            noop(registry[name](spark, sf_dir))
            walls[name] = round(time.perf_counter() - t0, 3)
            events[name] = dict(model_store.LAST_STORE_EVENTS)
            print(f"{tag} {name}: {walls[name]}s events={events[name]}",
                  flush=True)
        runs[tag] = {"walls": walls, "store_events": events,
                     "total": round(sum(walls.values()), 3)}

    doc = {
        "metric": "store_armed_pair",
        "sf_dir": sf_dir,
        "store": STORE,
        "what": ("FLATTERER_MODEL_STORE armed at an empty dir; run A "
                 "(populate) trains and saves, run B (serve) loads -- "
                 "store_events are LAST_STORE_EVENTS per query (op -> "
                 "hit/miss).  Single runs per arm; same session.  NOTE the "
                 "in-session model memo is bypassed when a store is armed, "
                 "so run B's walls measure the real load path."),
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "store_armed_done",
                      "populate_total": runs["populate"]["total"],
                      "serve_total": runs["serve"]["total"]}))
    spark.stop()


if __name__ == "__main__":
    main()

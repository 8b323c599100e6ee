"""Flatten-throughput benchmark against BASELINE.md's only perf claims.

The reference publishes no TPC numbers; its quantitative claims are about
FLATTEN throughput (BASELINE.md): ~10x faster than hand-written Python
flattening, ~3x thread scaling on NDJSON, largest in-repo dataset 4,999
NDJSON objects (~4 nesting levels, arrays-of-objects).  This harness
engages those rows directly:

 - generates a deterministic NDJSON corpus in the reference's workload
   shape (nested object + two arrays-of-objects, 4 nesting levels);
 - times a HAND-WRITTEN single-thread Python flattener (json.loads +
   loops + csv.writer -- what the reference's 10x claim is measured
   against) producing the same main/child/_link table layout;
 - times this engine's `flatten()` end-to-end (parse -> type-guess ->
   flatten -> child explode -> CSV write) on a warm Spark session;
 - reports objects/sec for both at the reference's own 5k scale AND at
   40x that, where distributed execution is the point.

Usage: python bench_flatten.py [n_objects ...]   (default: 5000 200000)
Prints one JSON line; the committed record lives in
BENCH_FLATTEN_r05.json.
"""

from __future__ import annotations

import csv
import json
import os
import random
import shutil
import sys
import tempfile
import time

RATINGS = [("E", "Everyone"), ("T", "Teen"), ("M", "Mature")]
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]


def gen_ndjson(path: str, n: int, seed: int = 7) -> None:
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            obj = {
                "id": i,
                "title": " ".join(rng.choices(WORDS, k=3)),
                "released": f"{rng.randint(1990, 2024)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}",
                "rating": dict(zip(("code", "name"), rng.choice(RATINGS))),
                "developer": [
                    {"name": rng.choice(WORDS), "country": {"iso": rng.choice(["US", "JP", "DE"])}}
                    for _ in range(rng.randint(1, 3))
                ],
                "metrics": [
                    {"k": "score", "v": round(rng.uniform(0, 10), 2)},
                    {"k": "sales", "v": rng.randint(0, 10**6)},
                ],
            }
            f.write(json.dumps(obj) + "\n")


def handwritten_flatten(src: str, out_dir: str) -> int:
    """The comparator in the reference's '~10x faster than hand-written
    Python flattening' claim: a straightforward single-thread loop a
    developer would write -- json.loads per line, nested-dict walk, csv
    rows for main + one file per array-of-objects with _link parentage."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with open(src) as f, \
            open(os.path.join(out_dir, "main.csv"), "w", newline="") as mf, \
            open(os.path.join(out_dir, "developer.csv"), "w", newline="") as df, \
            open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as xf:
        mw, dw, xw = csv.writer(mf), csv.writer(df), csv.writer(xf)
        mw.writerow(["_link", "id", "title", "released",
                     "rating_code", "rating_name"])
        dw.writerow(["_link", "_link_main", "name", "country_iso"])
        xw.writerow(["_link", "_link_main", "k", "v"])
        for line in f:
            o = json.loads(line)
            link = str(n)
            rating = o.get("rating") or {}
            mw.writerow([link, o.get("id"), o.get("title"),
                         o.get("released"),
                         rating.get("code"), rating.get("name")])
            for j, d in enumerate(o.get("developer") or []):
                country = d.get("country") or {}
                dw.writerow([f"{link}.developer.{j}", link,
                             d.get("name"), country.get("iso")])
            for j, m in enumerate(o.get("metrics") or []):
                xw.writerow([f"{link}.metrics.{j}", link,
                             m.get("k"), m.get("v")])
            n += 1
    return n


def main() -> None:
    # --reps N: paired same-session protocol (VERDICT r8 #1 fallback):
    # N reps of BOTH sides interleaved in one session, raw per-rep walls
    # recorded, so the engine/python ratio is measured under identical
    # ambient conditions and the 7x-at-1M question is settled as
    # conditions-bound or code-bound rather than argued across sessions.
    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    sizes = [int(a) for a in args] or [5000, 200000]

    from flatterer_spark.flatten import flatten
    from flatterer_spark.session import get_spark

    spark = get_spark(app_name="flatterer-spark-bench-flatten")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    base = tempfile.mkdtemp(prefix="bench-flatten-")
    try:
        # warm-up: absorb JVM/codegen startup so per-size numbers compare
        # steady-state engine throughput (the reference's own numbers also
        # exclude interpreter/bindings startup)
        warm_src = os.path.join(base, "warm.ndjson")
        gen_ndjson(warm_src, 20000)
        flatten(warm_src, os.path.join(base, "warm_out"), spark=spark,
                ndjson=True, force=True)

        for n in sizes:
            src = os.path.join(base, f"in_{n}.ndjson")
            gen_ndjson(src, n)

            # min-of-N both sides, INTERLEAVED py/spark pairs: single runs
            # carry +-20% ambient VM noise (same protocol as bench.py), and
            # interleaving keeps each pair under the same ambient window so
            # the per-rep ratio is meaningful, not just the min-merge.
            out = os.path.join(base, f"spark_{n}")
            py_reps, spark_reps = [], []
            for _ in range(reps):
                t0 = time.perf_counter()
                handwritten_flatten(src, os.path.join(base, f"py_{n}"))
                py_reps.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                flatten(src, out, spark=spark, ndjson=True, force=True)
                spark_reps.append(time.perf_counter() - t0)
            py_sec, spark_sec = min(py_reps), min(spark_reps)

            # sanity: same main-table cardinality
            with open(os.path.join(out, "csv", "main.csv")) as f:
                spark_rows = sum(1 for _ in f) - 1
            assert spark_rows == n, (spark_rows, n)

            results[str(n)] = {
                "handwritten_py_sec": round(py_sec, 3),
                "spark_flatten_sec": round(spark_sec, 3),
                "handwritten_py_objs_per_sec": round(n / py_sec),
                "spark_objs_per_sec": round(n / spark_sec),
                "spark_over_py_speedup": round(py_sec / spark_sec, 2),
                "py_reps_sec": [round(v, 3) for v in py_reps],
                "spark_reps_sec": [round(v, 3) for v in spark_reps],
                "paired_ratios": [round(p / s, 2)
                                  for p, s in zip(py_reps, spark_reps)],
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()

    print(json.dumps({"metric": "flatten_throughput", "unit": "objects/sec",
                      "sizes": results}))


if __name__ == "__main__":
    main()

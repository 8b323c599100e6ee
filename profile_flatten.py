"""Flatten phase profiler (diagnostic harness, not part of the suite).

Usage: python profile_flatten.py [n] [reps]
Generates the bench_flatten corpus at n objects, runs flatten() reps
times on a warm session, prints per-phase walls per rep (phases are
collected via logutil.prof, armed by FLATTERER_PROFILE).

Round-9 findings this harness produced (1M objects, local[32]):
 - wall decomposes as read_source ~0.08 s + ordinal_text_map ~0.2 s +
   plan/py4j ~0.2 s + csv_pass ~2.4 s (3 concurrent per-table jobs) +
   guard_join ~1 ms -- the csv phase IS the wall;
 - a branch-union variant (union of the 3 codegen'd per-table plans,
   to_csv lines, ONE partitionBy(tag).text job) was byte-identical but
   SLOWER (2.3-3.7 s vs 1.6-2.2 s for the phase): dynamic-partition
   writers + the per-task tag sort cost more than two job overheads
   save, so the classic 3-concurrent-job phase stays the local default
   (and sinks/union_csv.py stays the remote-input shape).
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("FLATTERER_PROFILE", "1")

from bench_flatten import gen_ndjson  # noqa: E402
from flatterer_spark import logutil  # noqa: E402
from flatterer_spark.flatten import flatten  # noqa: E402
from flatterer_spark.session import get_spark  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(app_name="flatten-profile")
spark.sparkContext.setLogLevel("ERROR")
base = tempfile.mkdtemp(prefix="prof-flatten-")
src = os.path.join(base, "in.ndjson")
gen_ndjson(src, n)

# warm-up
flatten(src, os.path.join(base, "warm"), spark=spark, ndjson=True, force=True)

for r in range(reps):
    logutil.PHASES.clear()
    t0 = time.perf_counter()
    flatten(src, os.path.join(base, "out"), spark=spark, ndjson=True,
            force=True)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "rep": r, "wall": round(wall, 3),
        "phases": {k: round(v, 3) for k, v in logutil.PHASES},
        "sum_phases": round(sum(v for _, v in logutil.PHASES), 3),
    }))

import shutil  # noqa: E402
shutil.rmtree(base, ignore_errors=True)
spark.stop()

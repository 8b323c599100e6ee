"""Capture .explain('formatted') for declared queries -> plans/r11/<q>_<tag>.txt.

Usage: python tools_r11/capture_plans.py <tag> [name ...]
With no names, captures every registry query (streaming gate queries whose
build itself runs a drain are captured too -- building the DataFrame runs
the drain once, which is the same cost the bench pays; plans are of the
post-drain batch result for those).
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from flatterer_spark.registry import all_queries
    from flatterer_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if not names:
        names = sorted(registry)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = registry[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if "CAPTURE FAILED" not in plan else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-slope bench for the STREAMING family (VERDICT r6 'Next round' #1).

The batch scale audit (bench_scale.py) caught two real superlinear plans
that single-scale benches had hidden; the streaming operators' bounded-state
claims were still docstring arguments.  This harness turns them into
measurements:

 - **Multi-batch drains.**  Each op streams its input as 16 time-ordered
   parquet chunk files with ``maxFilesPerTrigger=1`` under an availableNow
   drain, so the watermark ADVANCES between micro-batches and state
   eviction actually executes.  A single-file drain (the gate queries'
   shape) processes everything in one batch and can never distinguish
   watermark-proportional state from input-proportional state.
 - **Two scales.**  x1 = sf0.1 (100k events / 5k docs), x10 = the
   hash-perturbed 10x corpus bench_scale.py builds (1M events / 50k docs,
   SAME time range at 10x density -- the realistic growth mode for a
   stream: more traffic, not a longer history).  Chunk COUNT is equal at
   both scales so per-batch fixed overhead cancels out of the slope.
 - **What is recorded per (op, scale):** wall seconds (min-of-2), number
   of micro-batches, total input rows, and the state store's
   ``stateOperators[].numRowsTotal`` summed across operators -- both the
   PEAK across batches and the LAST batch (run_available_now stashes the
   full progress list in stream_flatten.DRAIN_PROGRESS).

State expectations (the per-op bound being audited, also emitted into the
JSON):

 - stream_quantile_sketch / windowed aggs: state = open windows x bins --
   bounded by the TIME RANGE, so the state slope across 10x density
   should be ~1 (same windows, same bins).
 - stream_ewma: one 3-scalar row per user by design (a running feature is
   never evicted) -- state slope ~= user slope (10x), flat across batches
   once all users are seen, and NEVER event-proportional.
 - stream_custom_session: one open interval per user inside the watermark
   horizon; closed sessions leave state via event-time timeout.
 - stream_dedup_exact: fingerprints within the 1h watermark horizon --
   peak state must track rows-per-horizon (10x at 10x density), NOT total
   rows ever seen.
 - stream_interval_join: both sides buffered within watermark(2h)+30min --
   peak state tracks rows-per-horizon.
 - stream_dedup_minhash_indexed: the state store must hold ZERO rows at
   every batch -- the band index lives in a persisted compactable table
   probed via foreachBatch (r8 fix for the r7 operator's
   accumulate-forever state); the audit checks that AND the wall slope.

Usage: python bench_scale_stream.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE10 = "/tmp/spark_graft_scale10x"
STREAM_DIR = "/tmp/spark_graft_scale_stream"
CHUNKS = 16


def build_stream_corpus() -> None:
    """Chunk events (time order) and documents (doc_id order) of both
    scales into 16 parquet files each, with strictly increasing mtimes so
    the file streaming source admits them oldest-first, one per batch."""
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_scale

    bench_scale.build_corpus()  # ensures the 10x tables exist

    con = duckdb.connect()
    # Sentinel is keyed on the SOURCE paths + row counts, not just the
    # output dir: a changed SPARK_GRAFT_SF_DIR or a rebuilt 10x corpus
    # must invalidate the chunked copy (ADVICE r7).
    sig_parts = []
    for src in (SF1, SCALE10):
        for table in ("events", "documents"):
            p = f"{src}/{table}.parquet"
            n = con.execute(f"SELECT count(*) FROM '{p}'").fetchone()[0]
            sig_parts.append(f"{p}={n}")
    sig = ";".join(sig_parts)
    done = os.path.join(STREAM_DIR, ".done")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == sig:
                return
        import shutil

        shutil.rmtree(STREAM_DIR, ignore_errors=True)
    base_mtime = int(time.time()) - 10 * CHUNKS
    for scale, src in (("x1", SF1), ("x10", SCALE10)):
        for table, order in (
            ("events", "ts, event_id"),
            ("documents", "doc_id"),
        ):
            d = os.path.join(STREAM_DIR, scale, table)
            os.makedirs(d, exist_ok=True)
            n = con.execute(
                f"SELECT count(*) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            per = (n + CHUNKS - 1) // CHUNKS
            for i in range(CHUNKS):
                path = os.path.join(d, f"chunk-{i:03d}.parquet")
                con.execute(
                    f"COPY (SELECT * FROM '{src}/{table}.parquet' "
                    f"ORDER BY {order} LIMIT {per} OFFSET {i * per}) "
                    f"TO '{path}' (FORMAT PARQUET)"
                )
                t = base_mtime + i * 10
                os.utime(path, (t, t))
    os.makedirs(STREAM_DIR, exist_ok=True)
    with open(done, "w") as f:
        f.write(sig)


# ---------------------------------------------------------------------------
# Op builders: same operators/parameters as the streaming gate queries,
# pointed at a chunked directory with per-file micro-batches.
# ---------------------------------------------------------------------------


def _event_stream(spark, d: str):
    import pyspark.sql.functions as F

    schema = spark.read.parquet(d).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return s.withColumn("ts", F.col("ts").cast("timestamp"))


def op_stream_dedup_exact(spark, d: str, name: str):
    from flatterer_spark.streaming.stream_flatten import (
        dedup_stream,
        run_available_now,
    )

    s = _event_stream(spark, f"{d}/events").select(
        "user_id", "event_type", "ts"
    )
    ded = dedup_stream(s, ["user_id", "event_type"], watermark="1 hour")
    return run_available_now(ded, name, timeout_sec=900).count()


def op_stream_ewma(spark, d: str, name: str):
    from flatterer_spark.streaming.stream_flatten import (
        ewma_stream,
        run_available_now,
    )

    s = _event_stream(spark, f"{d}/events").select(
        "user_id", "event_id", "ts", "value"
    )
    return run_available_now(ewma_stream(s), name, timeout_sec=900).count()


def _churned_event_stream(spark, d: str):
    """The real events corpus has 150 users active for the whole 30-day
    range -- no churn, so a per-user state map is trivially bounded.  The
    unbounded-churn claim (VERDICT r8 watch item #2) needs users that
    come and go: remap user ids by 5-day generation (6 generations x the
    base users), so an evicting operator's state tracks the ACTIVE
    generation while a NoTimeout operator accumulates every generation
    ever seen."""
    import pyspark.sql.functions as F

    s = _event_stream(spark, f"{d}/events").select(
        "user_id", "event_id", "ts", "value"
    )
    gen = F.floor(F.unix_timestamp("ts") / (5 * 86400)).cast("long")
    return s.withColumn("user_id", F.col("user_id") + gen * F.lit(100000))


def op_stream_ewma_churn(spark, d: str, name: str):
    """Plain ewma_stream under churn: the measured BASELINE showing the
    NoTimeout map growing with distinct users forever."""
    from flatterer_spark.streaming.stream_flatten import (
        ewma_stream,
        run_available_now,
    )

    s = _churned_event_stream(spark, d)
    return run_available_now(ewma_stream(s), name, timeout_sec=900).count()


def op_stream_ewma_ttl_churn(spark, d: str, name: str):
    """ewma_stream_ttl under the same churn: event-time-timeout eviction
    keeps state at the active generation (VERDICT r8 #3 done-criterion:
    state_rows_last << the NoTimeout sibling's)."""
    from flatterer_spark.streaming.stream_flatten import (
        ewma_stream_ttl,
        run_available_now,
    )

    s = _churned_event_stream(spark, d)
    return run_available_now(
        ewma_stream_ttl(s, ttl_minutes=1440), name, timeout_sec=900
    ).count()


def op_stream_custom_session(spark, d: str, name: str):
    from flatterer_spark.streaming.stream_flatten import (
        run_available_now,
        sessionize,
    )

    s = _event_stream(spark, f"{d}/events").select("user_id", "ts")
    sess = sessionize(s, gap_minutes=30, watermark="0 seconds")
    return run_available_now(sess, name, timeout_sec=900).count()


def op_stream_interval_join(spark, d: str, name: str):
    import pyspark.sql.functions as F

    from flatterer_spark.streaming.stream_flatten import run_available_now

    def side(etype: str, prefix: str):
        return (
            _event_stream(spark, f"{d}/events")
            .where(F.col("event_type") == etype)
            .selectExpr(
                f"user_id AS {prefix}_user",
                f"event_id AS {prefix}_id",
                f"ts AS {prefix}_ts",
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    joined = side("purchase", "p").join(
        side("view", "v"),
        F.expr(
            "p_user = v_user"
            " AND v_ts >= p_ts - INTERVAL 30 MINUTES"
            " AND v_ts <= p_ts"
        ),
        "inner",
    ).select("p_id", "v_id")
    return run_available_now(joined, name, timeout_sec=900).count()


def op_stream_dedup_minhash_indexed(spark, d: str, name: str):
    import shutil
    import tempfile

    from flatterer_spark.ext_queries import _sql_lsh_bands_chain
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.streaming.stream_flatten import (
        minhash_band_probe_stream,
    )

    doc_dir = f"{d}/documents"
    schema = spark.read.parquet(doc_dir).schema
    view = f"docs_scale_{name}"
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_dir)
        .createOrReplaceTempView(view)
    )
    chain = _sql_lsh_bands_chain(Gen(spark=True), table=view)
    bl = spark.sql(f"WITH {chain} SELECT doc_id, band FROM bl")
    work = tempfile.mkdtemp(prefix="bench_mh_idx_")
    try:
        flags = minhash_band_probe_stream(
            bl,
            index_dir=f"{work}/index",
            flags_dir=f"{work}/flags",
            query_name=name,
            timeout_sec=900,
        )
        n = flags.count()
        # index size audit (VERDICT r8 #4): delta file/row counts after the
        # drain, then after one compaction cycle -- the artifact that
        # replaces state-store rows for this operator must itself stay
        # bounded under the compaction lifecycle
        import glob

        from flatterer_spark.streaming.stream_flatten import (
            BAND_INDEX_SCHEMA,
            compact_band_index,
        )

        pre_files = len(glob.glob(f"{work}/index/part-*"))
        pre_rows = (
            spark.read.schema(BAND_INDEX_SCHEMA)
            .parquet(f"{work}/index")
            .count()
        )
        post_rows = compact_band_index(spark, f"{work}/index")
        post_files = len(glob.glob(f"{work}/index/part-*"))
        return n, {
            "index_files_pre_compact": pre_files,
            "index_rows_pre_compact": pre_rows,
            "index_files_post_compact": post_files,
            "index_rows_post_compact": post_rows,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def op_stream_quantile_sketch(spark, d: str, name: str):
    import pyspark.sql.functions as F

    from flatterer_spark.streaming.stream_flatten import run_available_now

    binned = (
        _event_stream(spark, f"{d}/events")
        .select("ts", "value")
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour"),
            F.expr("CAST(FLOOR(value / 4.0D) AS BIGINT)").alias("bin"),
        )
        .count()
    )
    return run_available_now(
        binned, name, output_mode="complete", timeout_sec=900
    ).count()


OPS = {
    "stream_dedup_exact": (
        op_stream_dedup_exact,
        "fingerprints within the 1h watermark horizon "
        "(dropDuplicatesWithinWatermark -- the r7 audit caught plain "
        "dropDuplicates never evicting non-event-time keys; measured "
        "state_rows_removed shows the watermark actively turning state "
        "over, final state ~ one horizon of keys, far below peak)",
    ),
    "stream_ewma": (
        op_stream_ewma,
        "one row per user by design (running feature; never event-prop.)",
    ),
    "stream_ewma_churn": (
        op_stream_ewma_churn,
        "CONTRAST BASELINE under 5-day user-generation churn: NoTimeout "
        "keeps every generation forever -- state_rows_last == all users "
        "ever seen (the unbounded-churn growth mode of watch item r8#2)",
    ),
    "stream_ewma_ttl_churn": (
        op_stream_ewma_ttl_churn,
        "same churned stream, 24h event-time-timeout eviction: "
        "state_rows_last tracks the ACTIVE generation only, << the "
        "NoTimeout sibling's all-generations map; removals > 0 show the "
        "timeout actually firing (r9 operator ewma_stream_ttl)",
    ),
    "stream_custom_session": (
        op_stream_custom_session,
        "open sessions per user in horizon (closed ones leave via timeout)",
    ),
    "stream_interval_join": (
        op_stream_interval_join,
        "both sides buffered within watermark(2h)+30min of the front",
    ),
    "stream_dedup_minhash_indexed": (
        op_stream_dedup_minhash_indexed,
        "state store ZERO rows at every batch (r8: index moved to a "
        "persisted compactable table probed via foreachBatch; the r7 "
        "applyInPandasWithState index held 7.0x input rows with no "
        "eviction)",
    ),
    "stream_quantile_sketch": (
        op_stream_quantile_sketch,
        "open windows x 4.0-wide bins: bounded by time range, not density",
    ),
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_STREAM_r07.json"
    only = set(sys.argv[2:])
    build_stream_corpus()

    from flatterer_spark.session import get_spark
    from flatterer_spark.streaming.stream_flatten import DRAIN_PROGRESS

    spark = get_spark(app_name="flatterer-spark-bench-scale-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # recentProgress keeps only the last numRecentProgressUpdates entries
    # (default 100): a drain with more micro-batches would silently drop
    # the earliest records and undercount input/state (ADVICE r7).  Raise
    # the cap well above any drain here and hard-assert below.
    progress_cap = 1000
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(progress_cap)
    )

    def run(op_name: str, fn, scale: str) -> dict:
        d = os.path.join(STREAM_DIR, scale)
        best = None
        for rep in range(2):  # min-of-2: ambient VM noise
            qname = f"{op_name}_{scale}_{rep}"
            t0 = time.time()
            n_out = fn(spark, d, qname)
            wall = time.time() - t0
            extras = {}
            if isinstance(n_out, tuple):
                n_out, extras = n_out
            progs = DRAIN_PROGRESS.get(qname, [])
            # the chunked drain must yield >= CHUNKS micro-batches (one per
            # file, plus possibly trailing timeout/no-data batches), and
            # must never hit the retention cap -- either would mean the
            # audit numbers below silently undercount
            if not CHUNKS <= len(progs) < progress_cap:
                raise RuntimeError(
                    f"{qname}: captured {len(progs)} progress records "
                    f"(expected >= {CHUNKS}, < cap {progress_cap})"
                )
            state_by_batch = [
                sum(so.get("numRowsTotal", 0) for so in p.get("stateOperators", []))
                for p in progs
            ]
            removed = sum(
                so.get("numRowsRemoved", 0)
                for p in progs
                for so in p.get("stateOperators", [])
            )
            rec = {
                "wall_sec": round(wall, 3),
                "batches": len(progs),
                "input_rows": sum(p.get("numInputRows", 0) for p in progs),
                "out_rows": n_out,
                "state_rows_peak": max(state_by_batch, default=0),
                "state_rows_last": state_by_batch[-1] if state_by_batch else 0,
                # full per-batch trajectory (r12, VERDICT r11 #7): for the
                # stream-stream interval join the shape of this list is the
                # boundedness evidence -- it must plateau at the watermark
                # horizon, not grow with drained batches
                "state_rows_by_batch": state_by_batch,
                # total evictions across the drain: direct evidence the
                # watermark is actively removing state, not just bounding
                # its growth statically
                "state_rows_removed": removed,
                **extras,
            }
            if best is None or rec["wall_sec"] < best["wall_sec"]:
                state = {k: rec[k] for k in rec}
                best = state
        return best

    results = {}
    for op_name, (fn, expectation) in OPS.items():
        if only and op_name not in only:
            continue
        r1 = run(op_name, fn, "x1")
        r10 = run(op_name, fn, "x10")
        results[op_name] = {
            "x1": r1,
            "x10": r10,
            "wall_slope": round(r10["wall_sec"] / r1["wall_sec"], 2)
            if r1["wall_sec"] > 0
            else None,
            "state_peak_slope": round(
                r10["state_rows_peak"] / r1["state_rows_peak"], 2
            )
            if r1["state_rows_peak"]
            else None,
            "state_peak_vs_input_x10": round(
                r10["state_rows_peak"] / r10["input_rows"], 4
            )
            if r10["input_rows"]
            else None,
            "expectation": expectation,
        }
        print(
            f"{op_name}: wall {r1['wall_sec']}s -> {r10['wall_sec']}s "
            f"(slope {results[op_name]['wall_slope']}), "
            f"state peak {r1['state_rows_peak']} -> {r10['state_rows_peak']} "
            f"(slope {results[op_name]['state_peak_slope']}), "
            f"batches {r1['batches']}/{r10['batches']}",
            flush=True,
        )

    doc = {
        "metric": "stream_scale_slope",
        "what": (
            "16 time-ordered chunk files, maxFilesPerTrigger=1, availableNow "
            "multi-batch drain so watermarks advance and evict; x10 = same "
            "time range at 10x density (bench_scale.py corpus); min-of-2; "
            "state rows = sum of stateOperators[].numRowsTotal"
        ),
        "ops": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    if results:
        print(
            json.dumps(
                {
                    "metric": "stream_scale_slope_max",
                    "value": max(
                        r["wall_slope"] for r in results.values() if r["wall_slope"]
                    ),
                    "ops": len(results),
                }
            )
        )


if __name__ == "__main__":
    main()

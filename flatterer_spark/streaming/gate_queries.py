"""Driver-gate streaming query: run a REAL Structured Streaming job
(readStream -> watermarked windowed agg -> availableNow drain) and return its
batch result, hash-checked against the batch DuckDB oracle.

This is the strongest check the streaming surface can get: the exactly-once
semantics of a bounded drain mean the streaming result must equal the batch
aggregation over the same file, so the oracle gate proves the watermark /
window wiring loses nothing on in-order bounded input.  (Late-data *dropping*
behavior is covered separately in tests/test_streaming.py with crafted
out-of-order batches -- an oracle can't see dropped rows.)
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import LongType


def stream_windowed_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window (count, sum) per event_type, computed by an
    actual streaming query over the events parquet.

    The vanilla driver session has no fixed timezone, so pin UTC before the
    ntz->ltz cast that watermarks require; 1-hour tumbling windows are then
    epoch-aligned and window_start == date_trunc('hour', ts), which is what
    the DuckDB oracle computes."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.queries import round_half_up
    from flatterer_spark.streaming.stream_flatten import (
        run_available_now,
        windowed_event_stats,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file streaming source only accepts directories: stream the dataset
    # dir and glob-filter to the events file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):  # nanos-era testdata
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    stats = windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    res = run_available_now(
        stats, f"stream_wstats_{_view_suffix(sf_dir)}", output_mode="complete"
    )
    return (
        res.select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            round_half_up(F.col("total_value")).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


def stream_dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup drained to a batch result: first arrival per
    (user_id, event_type) fingerprint via ``dropDuplicatesWithinWatermark``
    (state-bounded; plain ``dropDuplicates`` on a non-event-time subset
    never evicts -- the round-7 audit find).

    Which physical row survives per key is processing-order-dependent, so
    the gate result projects ONLY the fingerprinted columns -- the distinct
    key set, which is order-independent and equals the batch DISTINCT the
    oracle computes.  The bounded drain arrives as one batch (single file),
    so the watermark evicts no in-flight state."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import (
        dedup_stream,
        run_available_now,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    ded = dedup_stream(stream, ["user_id", "event_type"], watermark="1 hour")
    res = run_available_now(
        ded, f"stream_dedup_{_view_suffix(sf_dir)}", output_mode="append"
    )
    return res.select("user_id", "event_type").orderBy("user_id", "event_type")


def stream_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment drained to a batch result: the event stream
    left-joins the broadcast customer dimension (stream-static joins are
    stateless -- each micro-batch joins the static side, no watermark), then
    a per-segment count aggregates the drain.  Deterministic on bounded
    input, so the batch-join oracle hash-checks the wiring."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import (
        enrich_stream,
        run_available_now,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr(
        "c_custkey AS user_id", "c_mktsegment"
    )
    enriched = enrich_stream(stream, dim, "user_id", how="left").select(
        "event_id", "c_mktsegment"
    )
    res = run_available_now(
        enriched, f"stream_enrich_{_view_suffix(sf_dir)}", output_mode="append"
    )
    return (
        res.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .orderBy(F.asc_nulls_first("c_mktsegment"))
    )


def stream_sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization by a REAL streaming job: the built-in
    ``session_window`` (30-minute gap) over the watermarked event stream,
    drained availableNow in complete mode.

    Session-window semantics: an event merges into the current session iff
    its time is strictly BEFORE current_end (= last_ts + gap); an event at
    exactly last_ts + gap starts a NEW session.  The batch oracle's
    gaps-and-islands break condition is therefore ``ts >= prev + gap``
    (note: q27's batch sessionize uses the strict ``>`` convention -- both
    are valid sessionizations, the oracle must match the streaming one).
    On bounded in-order input the drain equals the batch islands result."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import run_available_now

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    sess = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
    res = run_available_now(
        sess, f"stream_sess_{_view_suffix(sf_dir)}", output_mode="complete"
    )
    return (
        res.select(
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id", "session_start")
    )


def stream_flatten_child_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming flatten as a driver-gate query: the reference fixture's
    documents are staged as one-NDJSON-file-per-doc, flattened by the REAL
    streaming flatten (readStream -> table plans -> availableNow drain), and
    the child table is joined back to main through the content-hash `_link`
    chain.  The output exposes only content columns (parent id, child name):
    streaming links are hash+position (no global ordinals on an unbounded
    stream), so link VALUES can't be oracle'd -- but the join proves every
    child row landed on the right parent, which is what links are for.
    Oracle: DuckDB read_json + UNNEST of the same fixture."""
    import json as _json
    import shutil
    import tempfile

    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.flatten_queries import BASIC
    from flatterer_spark.streaming.stream_flatten import (
        flatten_stream,
        run_available_now,
    )

    d = tempfile.mkdtemp(prefix="stream_flatten_gate_")
    try:
        with open(BASIC) as f:
            docs = _json.load(f)
        for i, doc in enumerate(docs):
            with open(f"{d}/doc-{i}.jsonl", "w") as f:
                f.write(_json.dumps(doc) + "\n")
        schema = spark.read.json(d).schema
        tables = flatten_stream(spark, d, schema)
        sfx = _view_suffix(sf_dir)
        main = run_available_now(tables["main"], f"sf_main_{sfx}")
        plat = run_available_now(tables["platforms"], f"sf_plat_{sfx}")
    finally:
        # both drains are complete; the memory-sink tables no longer read
        # the staged files
        shutil.rmtree(d, ignore_errors=True)
    return (
        plat.join(
            main.select(F.col("_link"), F.col("id")),
            plat["_link_main"] == main["_link"],
            "inner",
        )
        .select(
            F.col("id").cast("long").alias("main_id"),
            F.col("name"),
        )
        .orderBy("main_id", "name")
    )


def stream_interval_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-interval join as a driver-gate query: the purchase
    stream inner-joins the view stream on user_id with a 30-minute lookback
    (``v_ts in [p_ts - 30min, p_ts]``) -- the attribution join every event
    pipeline runs.  Both sides are watermarked so Spark bounds the join state
    (without watermarks a stream-stream join buffers both streams forever --
    the time bound is what makes it viable on an unbounded 100 TB stream).

    On bounded input the single-file drain arrives as one micro-batch, so no
    state is evicted mid-run and the emitted pair set equals the batch
    interval join the DuckDB oracle computes.  Output is the (purchase_id,
    view_id) pair set -- order-independent, exactly-once."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import run_available_now

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema

    def side(etype: str, prefix: str) -> DataFrame:
        s = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        if isinstance(schema["ts"].dataType, LongType):
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return (
            s.withColumn("ts", F.col("ts").cast("timestamp"))
            .where(F.col("event_type") == etype)
            .selectExpr(
                f"user_id AS {prefix}_user",
                f"event_id AS {prefix}_id",
                f"ts AS {prefix}_ts",
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    purchases = side("purchase", "p")
    views = side("view", "v")
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user"
            " AND v_ts >= p_ts - INTERVAL 30 MINUTES"
            " AND v_ts <= p_ts"
        ),
        "inner",
    ).select("p_id", "v_id")
    res = run_available_now(
        joined, f"stream_ijoin_{_view_suffix(sf_dir)}", output_mode="append"
    )
    return (
        res.select(
            F.col("p_id").cast("long").alias("purchase_id"),
            F.col("v_id").cast("long").alias("view_id"),
        )
        .orderBy("purchase_id", "view_id")
    )


def _custom_session_stream(stream: DataFrame) -> DataFrame:
    """Pure-JVM gap sessionization with semantics IDENTICAL to the custom
    ``applyInPandasWithState`` operator (``stream_flatten.sessionize`` at
    gap=30min, watermark=0s) -- the r12 optimization that removes the
    per-(group, micro-batch) Python boundary from the gate's hot path
    (guide §4: prefer the built-in JVM operator when one exists; the
    custom op was the #2 streaming bench cost at 6.2 s, VERDICT r11 #1).

    Equivalence, probed on crafted microsecond-boundary data (r12):

    * merge rule: the custom op breaks a session only when
      ``ts > last + gap``; ``session_window`` breaks when
      ``ts >= prev_end = last + gap_w``.  With ``gap_w = gap + 1us`` the
      break becomes ``ts >= last + gap + 1us``, i.e. ``ts > last + gap``
      on microsecond-granular timestamps -- exact (probe: an event at
      exactly ``last + gap`` merges on both paths).
    * emission rule: append mode evicts+emits a session when
      ``window.end <= watermark`` (probe: end == wm IS emitted).  With
      ``window.end = session_end + gap + 1us`` and the final watermark
      ``W = floor_ms(max ts)`` (0s delay), emission is
      ``session_end + gap + 1us <= W``, i.e. ``session_end + gap < W``
      in integer microseconds -- and since W is ms-aligned that equals
      ``floor_ms(session_end + gap) < W``, which is byte-for-byte the
      oracle predicate (and the custom op's emitted set, driver-green
      r9-r11).

    State posture is strictly better than the custom op: same one open
    session per active user inside the watermark horizon, but merge and
    eviction run in the JVM session-window store with no pickled-state
    round trip per group per batch."""
    return (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(
            F.session_window("ts", "30 minutes 1 microsecond").alias("w"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def stream_custom_session_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization with custom-operator semantics as a driver-gate
    query.  r1-r11 ran the custom ``applyInPandasWithState`` operator here;
    r12 switched the gate to the equivalent pure-JVM ``session_window``
    aggregation (``_custom_session_stream`` -- equivalence proof and probe
    evidence on that function), because the Python state boundary was pure
    per-group overhead at any scale.  The custom operator itself
    (``stream_flatten.sessionize``) is unchanged and stays covered by
    tests/test_streaming.py and the x10 state-slope audit
    (bench_scale_stream.py), including a pinned boundary-equivalence test
    against this JVM path.

    Emission semantics under a bounded availableNow drain are those of the
    original custom op: a session is emitted iff the final watermark
    (= max ts with a 0s delay) passed session_end + gap, i.e. the batch
    predicate ``session_end + gap < max(ts)`` -- so the DuckDB oracle is
    the gaps-and-islands sessionization filtered by exactly that."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import run_available_now

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    stream = stream.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    sess = _custom_session_stream(stream)
    res = run_available_now(
        sess, f"stream_csess_{_view_suffix(sf_dir)}", output_mode="append"
    )
    return (
        res.select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .orderBy("user_id", "session_start")
    )


def stream_topk_per_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: top-3 event types per daily tumbling window.

    The streaming job computes the watermarked windowed counts (bounded
    state, same operator as stream_windowed_stats at day granularity); the
    rank cut is applied to the drained result -- on an unbounded stream the
    counts sink continuously and the top-k is a cheap query over the sink,
    the standard split for streaming top-k (exact rank inside the stream
    would need unbounded-state total ordering).  Counts are exact integers
    and ties break on event_type, so the cut is cross-engine deterministic.
    Day windows are epoch-aligned => window_start == date_trunc('day', ts),
    which is what the DuckDB oracle computes."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import (
        run_available_now,
        windowed_event_stats,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    stats = windowed_event_stats(stream, window="1 day", watermark="2 hours")
    res = run_available_now(
        stats, f"stream_topk_{_view_suffix(sf_dir)}", output_mode="complete"
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        res.select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .orderBy("window_start", "rnk")
    )


def stream_dedup_minhash_indexed_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming NEAR-duplicate detection, state-store-free: the batch
    MinHash-LSH banding chain applied to a document stream, with each
    micro-batch probing (and delta-maintaining) a PERSISTED band index --
    exactly the artifact the nightly batch ``dedup_incremental`` pipeline
    keeps, probed stream-static per batch (see
    ``minhash_band_probe_stream``).  A document is flagged ``near_dup``
    when any of its bands is owned by a lower-doc_id document across all
    batches seen so far.

    This is the round-8 replacement for the r7 ``stream_dedup_minhash``
    gate query, whose applyInPandasWithState band index accumulated state
    forever (VERDICT r7 #1); semantics and oracle are IDENTICAL -- only
    where the index lives changed (state store -> compactable table), so
    the streaming state store holds zero rows at any scale.

    The stateless shingle -> 32-bit hash -> MinHash signature -> banded
    keys chain is the SAME dual-dialect expression chain the batch
    ``dedup_minhash_lsh`` runs, pointed at a streaming temp view.  Under
    the bounded availableNow drain every band group sees all its members,
    and dup-vs-original resolves by doc_id (not arrival order), so the
    drained result deterministically equals the batch oracle: band ->
    MIN(doc_id) owner, doc flagged iff it shares a band with a lower
    doc_id.  The result is localCheckpointed so the temp index/flags dirs
    can be removed before returning."""
    import shutil
    import tempfile

    from flatterer_spark.ext_queries import _sql_lsh_bands_chain, _view_suffix
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.streaming.stream_flatten import (
        minhash_band_probe_stream,
    )

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    view = f"docs_stream_{_view_suffix(sf_dir)}"
    (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .createOrReplaceTempView(view)
    )
    chain = _sql_lsh_bands_chain(Gen(spark=True), table=view)
    bl = spark.sql(f"WITH {chain} SELECT doc_id, band FROM bl")
    work = tempfile.mkdtemp(prefix="stream_mh_idx_")
    try:
        flags = minhash_band_probe_stream(
            bl,
            index_dir=f"{work}/index",
            flags_dir=f"{work}/flags",
            query_name=f"stream_mh_{_view_suffix(sf_dir)}",
        )
        return (
            flags.groupBy("doc_id")
            .agg(F.max("band_dup").alias("near_dup"))
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _oracle_stream_dedup_minhash() -> str:
    from flatterer_spark.ext_queries import _sql_lsh_bands_chain
    from flatterer_spark.functions.textgen import Gen

    chain = _sql_lsh_bands_chain(Gen(spark=False))
    return f"""
    WITH {chain},
    m AS (SELECT band, MIN(doc_id) AS mn FROM bl GROUP BY band)
    SELECT b.doc_id,
           CAST(MAX(CASE WHEN b.doc_id > m.mn THEN 1 ELSE 0 END) AS BOOLEAN)
               AS near_dup
    FROM bl b JOIN m ON b.band = m.band
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """


def stream_ewma_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user EWMA (``stream_flatten.ewma_stream``) as a
    driver-gate query: the O(1)-state recursive feature, drained with
    availableNow and reduced to the LAST emission per user (highest
    n_events -- on an unbounded stream the sink holds the running feature
    and consumers read the latest row).  The oracle is the batch
    ``events_ewma`` SQL: the streaming fold must reproduce the batch
    collect-sorted-fold value-for-value, including the 6-decimal rounding
    applied AFTER the drain on the JVM side (same floor expression)."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import (
        ewma_stream,
        run_available_now,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    stream = stream.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    res = run_available_now(
        ewma_stream(stream), f"stream_ewma_{_view_suffix(sf_dir)}"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        res.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
            F.expr("CAST(FLOOR(ewma * 1000000 + 0.5) AS DOUBLE) / 1000000")
            .alias("ewma6"),
        )
        .orderBy("user_id")
    )


def _oracle_stream_ewma() -> str:
    from flatterer_spark.ext_queries import sql_events_ewma
    from flatterer_spark.functions.textgen import Gen

    return sql_events_ewma(Gen(spark=False))


#: Session-lifetime staged chunk corpora: (sf_dir, n_chunks, events
#: fingerprint) -> staged directory.  Cleared (and dirs removed) at exit.
_CHUNK_STAGE_CACHE: dict[tuple, str] = {}


def _scratch_base(need_bytes: int = 0) -> str | None:
    """RAM-backed scratch when the host has one WITH room (mkdtemp dir=).

    ADVICE r10: on a small-tmpfs host, staging the chunk corpus into an
    almost-full /dev/shm would ENOSPC mid-gate where the disk tempdir
    works -- so /dev/shm is only preferred when statvfs shows at least
    ``need_bytes`` (plus a fixed 64 MB margin for checkpoints and
    metadata) free.  Returning None makes mkdtemp use the default
    tempdir."""
    from flatterer_spark.streaming.stream_flatten import _tmpfs_free_ok

    if _tmpfs_free_ok(need=need_bytes + 64 * 1024 * 1024):
        return "/dev/shm"
    return None


def _dir_bytes(path: str) -> int:
    """Total size of the files under a parquet dir (or a single file)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def _staged_event_chunks(
    spark: SparkSession, sf_dir: str, src: DataFrame, n_chunks: int
) -> str:
    """Stage the events table as ``n_chunks`` time-ordered parquet chunk
    dirs with strictly increasing mtimes; reuse across calls in a session.

    Chunking: ntile over one global (ts, event_id) sort assigns balanced
    time-ordered chunks in a single window pass, and partitionBy writes
    all chunk directories in ONE job.  The partition column must not
    start with "_" (the file source ignores underscore-prefixed paths).

    mtime spacing: the file source admits files oldest-first with no
    tiebreak, and one write job lands every chunk inside the same
    filesystem-timestamp granule -- without the explicit 10 s utime
    spacing a later chunk could drain BEFORE an earlier one, breaking the
    in-order arrival contract (same discipline as
    bench_scale_stream.build_stream_corpus).

    The cache key embeds the events parquet fingerprint (mtime+size), so
    regenerated testdata re-stages instead of serving stale chunks."""
    import atexit
    import shutil
    import tempfile
    import time as _time

    from flatterer_spark.functions.fingerprint import table_fingerprint

    key = (sf_dir, n_chunks, table_fingerprint(sf_dir, "events"))
    cached = _CHUNK_STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    # staged chunks re-encode the same rows, so ~2x the source parquet
    # bytes is a safe upper bound for the tmpfs room check
    need = 2 * _dir_bytes(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="stream_chunks_", dir=_scratch_base(need))
    in_dir = f"{work}/in"
    chunked = src.withColumn(
        "cpart",
        F.ntile(n_chunks).over(Window.orderBy("ts", "event_id")) - 1,
    )
    chunked.repartition("cpart").write.mode("overwrite").partitionBy(
        "cpart"
    ).parquet(in_dir)
    base_mtime = int(_time.time()) - 10 * n_chunks
    for i in range(n_chunks):
        d = f"{in_dir}/cpart={i}"
        if not os.path.isdir(d):
            # ntile emits no rows for an empty tile, so partitionBy writes
            # no cpart=i directory when the source has fewer than n_chunks
            # rows (empty-corpus contract: empty events -> empty result)
            continue
        for fn in os.listdir(d):
            os.utime(
                os.path.join(d, fn),
                (base_mtime + 10 * i, base_mtime + 10 * i),
            )
    _CHUNK_STAGE_CACHE[key] = in_dir
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return in_dir


def stream_ewma_ttl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-evicting per-user EWMA (``stream_flatten.ewma_stream_ttl``) --
    the state-BOUNDED sibling of ``stream_ewma`` (cross-ref: that query's
    state is per-user forever; this one's is per ACTIVE user, evicted by
    event-time timeout after 24 h of inactivity, so the semantics are
    per-activity-segment features, segments split at >24 h gaps).

    The drain feeds 4 time-ordered chunk files with maxFilesPerTrigger=1
    so the watermark advances BETWEEN batches: mid-stream evictions fire,
    re-entries re-seed, and in-batch gap splits are exercised -- the
    output is batch-invariant because emissions key on (user, seg_start)
    and the final row per segment is the one with the highest n_events.
    The oracle computes the same gap segmentation in SQL and folds each
    segment with list_reduce in (ts, event_id) order -- the identical
    IEEE op sequence (a*x + (1-a)*acc, seeded at the first value), so the
    6-dp FLOOR snap has zero cross-engine rounding exposure.

    The chunk corpus is STAGED once per session (fingerprint-keyed, RAM-
    backed scratch): it is a pure function of the events table, so
    rewriting it per call charged every drain ~1.5-4 s of redundant write
    I/O and was half the r9 bench variance in this gate (VERDICT r9 perf
    item 2 -- "pre-stage the chunk corpora once per session like the
    other staged views")."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import (
        ewma_stream_ttl,
        run_available_now,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    src = spark.read.parquet(path)
    if isinstance(schema["ts"].dataType, LongType):
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    src = src.select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    in_dir = _staged_event_chunks(spark, sf_dir, src, n_chunks=4)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    res = run_available_now(
        ewma_stream_ttl(stream, ttl_minutes=1440),
        f"stream_ewma_ttl_{_view_suffix(sf_dir)}",
    )
    w = Window.partitionBy("user_id", "seg_start").orderBy(
        F.desc("n_events")
    )
    return (
        res.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("seg_start").cast("timestamp_ntz").alias("seg_start"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("last_ts").cast("timestamp_ntz").alias("last_ts"),
            F.expr(
                "CAST(FLOOR(ewma * 1000000 + 0.5) AS DOUBLE) / 1000000"
            ).alias("ewma6"),
        )
        .orderBy("user_id", "seg_start")
        .localCheckpoint(eager=True)
    )


def _oracle_stream_ewma_ttl() -> str:
    # the same gap segmentation + the same sequential fold op order as the
    # Python recurrence (list_reduce seeds at the first element; DuckDB
    # CAST(0.3 AS DOUBLE) == Python 0.3, and 1.0 - 0.3 == 0.7 in IEEE)
    return """
    WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
               LAG(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    seg AS (
        SELECT *,
               SUM(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL '1440 minutes'
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM o
    )
    SELECT user_id,
           MIN(ts) AS seg_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts) AS last_ts,
           CAST(FLOOR(list_reduce(
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
               (acc, x) -> CAST(0.3 AS DOUBLE) * x
                           + CAST(0.7 AS DOUBLE) * acc
           ) * 1000000 + 0.5) AS DOUBLE) / 1000000 AS ewma6
    FROM seg
    GROUP BY user_id, seg_id
    ORDER BY user_id, seg_start
    """


def stream_quantile_sketch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram quantile sketch (``events_quantile_sketch``) under
    Structured Streaming -- the property that makes a mergeable sketch the
    100 TB continuous-ingest shape, proven by the gate: per-hour tumbling
    windows accumulate 4.0-wide bin counts INCREMENTALLY across
    micro-batches (partial bins merge by addition in the state store, the
    definition of a mergeable sketch), and the exactly-once availableNow
    drain must therefore equal the batch histogram the DuckDB oracle
    computes.  Quantile extraction is a batch read of the drained sketch:
    per window, the median estimate is the upper edge of the first bin
    whose cumulative count reaches ceil(n/2) -- integer arithmetic only,
    so the estimate itself is hash-checked."""
    from flatterer_spark.ext_queries import _view_suffix
    from flatterer_spark.streaming.stream_flatten import run_available_now

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    binned = (
        stream.select(F.col("ts").cast("timestamp").alias("ts"), "value")
        .withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour"),
            F.expr("CAST(FLOOR(value / 4.0D) AS BIGINT)").alias("bin"),
        )
        .count()
    )
    res = run_available_now(
        binned, f"stream_qsketch_{_view_suffix(sf_dir)}", output_mode="complete"
    )
    sk = res.select(
        F.col("window.start").cast("timestamp_ntz").alias("window_start"),
        "bin",
        F.col("count").cast("long").alias("c"),
    )
    wcum = (
        Window.partitionBy("window_start")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("window_start")
    cum = sk.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    return (
        cum.where(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .groupBy("window_start", "n")
        .agg(F.min("bin").alias("med_bin"))
        .select(
            "window_start",
            F.col("n").cast("long").alias("n_events"),
            "med_bin",
            F.expr("CAST(med_bin + 1 AS DOUBLE) * 4.0D").alias("med_upper"),
        )
        .orderBy("window_start")
    )


STREAM_GATE_QUERIES = {
    "stream_quantile_sketch": stream_quantile_sketch_query,
    "stream_ewma": stream_ewma_query,
    "stream_ewma_ttl": stream_ewma_ttl_query,
    "stream_dedup_minhash_indexed": stream_dedup_minhash_indexed_query,
    "stream_windowed_stats": stream_windowed_stats_query,
    "stream_dedup_exact": stream_dedup_exact_query,
    "stream_enrich": stream_enrich_query,
    "stream_sessionize": stream_sessionize_query,
    "stream_flatten_child": stream_flatten_child_query,
    "stream_interval_join": stream_interval_join_query,
    "stream_custom_session": stream_custom_session_query,
    "stream_topk_per_window": stream_topk_per_window_query,
}

STREAM_GATE_ORACLE = {
    "stream_quantile_sketch": """
        WITH b AS (
            SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP))
                        AS TIMESTAMP) AS window_start,
                   CAST(FLOOR(value / CAST(4.0 AS DOUBLE)) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ), cum AS (
            SELECT window_start, bin,
                   SUM(c) OVER (PARTITION BY window_start ORDER BY bin)
                       AS cum,
                   SUM(c) OVER (PARTITION BY window_start) AS n
            FROM b
        )
        SELECT window_start, CAST(n AS BIGINT) AS n_events,
               MIN(bin) AS med_bin,
               CAST(MIN(bin) + 1 AS DOUBLE) * CAST(4.0 AS DOUBLE)
                   AS med_upper
        FROM cum WHERE cum >= (n + 1) // 2
        GROUP BY window_start, n
        ORDER BY window_start
    """,
    "stream_ewma": _oracle_stream_ewma(),
    "stream_ewma_ttl": _oracle_stream_ewma_ttl(),
    "stream_dedup_minhash_indexed": _oracle_stream_dedup_minhash(),
    "stream_topk_per_window": """
        WITH c AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS window_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT window_start, event_type, n_events,
               CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                    ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
        FROM c
        QUALIFY rnk <= 3
        ORDER BY window_start, rnk
    """,
    "stream_enrich": """
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment NULLS FIRST
    """,
    "stream_dedup_exact": """
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
    "stream_windowed_stats": """
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                   FROM events)
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               FLOOR(SUM(value) * 100 + 0.5) / 100 AS total_value
        FROM e
        GROUP BY date_trunc('hour', ts), event_type
        ORDER BY window_start, event_type
    """,
    "stream_sessionize": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        x AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS seq
            FROM x
        )
        SELECT MIN(ts) AS session_start, user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s
        GROUP BY user_id, seq
        ORDER BY user_id, session_start
    """,
    "stream_flatten_child": """
        SELECT CAST(m.id AS BIGINT) AS main_id, p.name AS name
        FROM read_json_auto('/root/reference/fixtures/basic.json') m,
             UNNEST(m.platforms) AS t(p)
        ORDER BY main_id, name
    """,
    "stream_interval_join": """
        WITH e AS (SELECT event_id, user_id, event_type,
                          CAST(ts AS TIMESTAMP) AS ts
                   FROM events)
        SELECT p.event_id AS purchase_id, v.event_id AS view_id
        FROM e p JOIN e v
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase' AND v.event_type = 'view'
         AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
        ORDER BY purchase_id, view_id
    """,
    "stream_custom_session": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        mx AS (SELECT MAX(ts) AS wm FROM e),
        x AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS seq
            FROM x
        ),
        g AS (
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, seq
        )
        SELECT user_id, session_start, session_end, n_events
        FROM g, mx
        -- ms truncation on BOTH sides: Spark's event-time watermark and
        -- state timeouts are MILLISECOND-granular (EventTimeStats floors
        -- us -> ms), so a us-exact predicate would include a session
        -- whose boundary lands in the same millisecond as the final
        -- watermark while the engine's timer (strictly-less on floored
        -- ms) does not fire -- a latent flake on ~every-row-sub-ms data
        WHERE date_trunc('milliseconds', session_end + INTERVAL 30 MINUTE)
              < date_trunc('milliseconds', mx.wm)
        ORDER BY user_id, session_start
    """,
}

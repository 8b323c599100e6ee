"""Structured Streaming surface: streaming flatten parity with the batch
engine, watermarked windows, stateful sessionization."""

from __future__ import annotations

import json
import shutil

import pyspark.sql.functions as F
import pytest

FIX = "/root/reference/fixtures"


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    with open(f"{FIX}/basic.json") as f:
        docs = json.load(f)
    for i, doc in enumerate(docs):
        with open(d / f"part-{i}.jsonl", "w") as f:
            f.write(json.dumps(doc) + "\n")
    return str(d)


def test_flatten_stream_matches_batch(spark, stream_dir):
    from flatterer_spark.streaming.stream_flatten import (
        flatten_stream,
        run_available_now,
    )

    schema = spark.read.json(stream_dir).schema
    tables = flatten_stream(spark, stream_dir, schema)
    assert set(tables) == {"main", "developer", "platforms"}
    assert all(df.isStreaming for df in tables.values())

    plat = run_available_now(tables["platforms"], "plat_stream")
    rows = plat.select("name").orderBy("name").collect()
    assert [r.name for r in rows] == ["PC", "Playstation", "Xbox"]
    # FK chain intact: every child links to a main row
    main = run_available_now(tables["main"], "main_stream")
    main_links = {r["_link"] for r in main.collect()}
    child_fks = {r["_link_main"] for r in plat.collect()}
    assert child_fks <= main_links


def test_windowed_event_stats(spark, sf_dir):
    from flatterer_spark.queries import T
    from flatterer_spark.streaming.stream_flatten import (
        run_available_now,
        windowed_event_stats,
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="events_stream_")
    try:
        T(spark, sf_dir, "events").coalesce(1).write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(
            spark.read.parquet(d).schema
        ).parquet(d)
        agg = windowed_event_stats(stream, window="6 hours", watermark="1 hour")
        got = run_available_now(agg, "win_stats", output_mode="complete")
        want = (
            T(spark, sf_dir, "events")
            .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        assert got.agg(F.sum("n_events")).collect()[0][0] == want.agg(
            F.sum("n_events")
        ).collect()[0][0]
        assert got.count() == want.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sessionize_stateful(spark, tmp_path):
    """Gap-based sessions: 3 events close together then one far later =>
    one closed session emitted (the open one stays in state)."""
    from flatterer_spark.streaming.stream_flatten import (
        run_available_now,
        sessionize,
    )

    d = tmp_path / "sess_in"
    d.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-01-01 00:00:00"},
        {"user_id": 1, "ts": "2024-01-01 00:05:00"},
        {"user_id": 1, "ts": "2024-01-01 00:10:00"},
        {"user_id": 1, "ts": "2024-01-01 02:00:00"},
        {"user_id": 2, "ts": "2024-01-01 01:00:00"},
    ]
    with open(d / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("user_id long, ts string")
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    sessions = sessionize(stream, gap_minutes=30)
    got = run_available_now(sessions, "sessions")
    closed = got.collect()
    assert len(closed) == 1
    s = closed[0]
    assert s.user_id == 1 and s.n_events == 3
    assert str(s.session_start).startswith("2024-01-01 00:00:00")
    assert str(s.session_end).startswith("2024-01-01 00:10:00")

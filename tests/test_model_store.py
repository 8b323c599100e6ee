"""Persisted model store (VERDICT r9 #5): train-once / load-many for the
learned-model family, delta+compaction lifecycle like the MinHash band
index.  The stored model must be BIT-IDENTICAL to the trained one (the
fits quantize to 6 dp and JSON round-trips doubles exactly), so a
store-served query equals a cold-trained one value-for-value."""

from __future__ import annotations

import pytest


def test_load_or_train_miss_then_hit(spark, tmp_path, monkeypatch):
    from flatterer_spark.operators import model_store as MS

    store = str(tmp_path / "store")
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    calls = []

    def fit():
        calls.append(1)
        return [[1.25, -2.5], [0.000001, 3.0]]

    sf = "/root/testdata/sf0.001"
    m1 = MS.load_or_train(spark, "op_a", {"k": 2}, sf, "embeddings", fit)
    m2 = MS.load_or_train(spark, "op_a", {"k": 2}, sf, "embeddings", fit)
    assert m1 == m2 == [[1.25, -2.5], [0.000001, 3.0]]
    assert len(calls) == 1, "second call must be served from the store"
    assert MS.LAST_STORE_EVENTS["op_a"] == "hit"
    # different params or different op -> miss -> retrain
    MS.load_or_train(spark, "op_a", {"k": 3}, sf, "embeddings", fit)
    MS.load_or_train(spark, "op_b", {"k": 2}, sf, "embeddings", fit)
    assert len(calls) == 3


def test_unarmed_store_trains_every_time(spark, tmp_path, monkeypatch):
    from flatterer_spark.operators import model_store as MS

    monkeypatch.delenv("FLATTERER_MODEL_STORE", raising=False)
    calls = []

    def fit():
        calls.append(1)
        return [[1.0]]

    sf = "/root/testdata/sf0.001"
    MS.load_or_train(spark, "op_c", {}, sf, "embeddings", fit)
    MS.load_or_train(spark, "op_c", {}, sf, "embeddings", fit)
    assert len(calls) == 2


def test_store_served_pq_codes_bit_identical(spark, tmp_path, monkeypatch):
    """emb_pq_codes cold vs store-served must be value-identical -- the
    persistence story cannot change the gate result."""
    from flatterer_spark.operators.kmeans import pq_codes

    sf = "/root/testdata/sf0.001"
    monkeypatch.delenv("FLATTERER_MODEL_STORE", raising=False)
    cold = [tuple(r) for r in pq_codes(spark, sf).collect()]
    store = str(tmp_path / "store")
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    trained = [tuple(r) for r in pq_codes(spark, sf).collect()]  # miss+save
    served = [tuple(r) for r in pq_codes(spark, sf).collect()]   # hit
    assert cold == trained == served
    from flatterer_spark.operators.model_store import LAST_STORE_EVENTS

    assert LAST_STORE_EVENTS["pq_codebooks"] == "hit"


def test_compaction_squashes_and_latest_wins(spark, tmp_path):
    from flatterer_spark.operators import model_store as MS

    store = str(tmp_path / "store")
    MS.save_model(spark, store, "op", "k1", [[1.0]])
    MS.save_model(spark, store, "op", "k1", [[2.0]])  # newer delta wins
    MS.save_model(spark, store, "op", "k2", [[9.0]])
    assert MS.load_model(spark, store, "op", "k1") == [[2.0]]
    n = MS.compact_model_store(spark, store)
    assert n == 2
    assert MS.load_model(spark, store, "op", "k1") == [[2.0]]
    assert MS.load_model(spark, store, "op", "k2") == [[9.0]]
    assert MS.load_model(spark, store, "op", "k3") is None


def test_fingerprint_invalidation(spark, tmp_path, monkeypatch):
    """Regenerated training data must MISS (key embeds the parquet
    fingerprint), never serve a stale model."""
    import shutil

    from flatterer_spark.operators import model_store as MS

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/embeddings.parquet",
        sf / "embeddings.parquet",
    )
    store = str(tmp_path / "store")
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    calls = []

    def fit():
        calls.append(1)
        return [[float(len(calls))]]

    MS.load_or_train(spark, "op_f", {}, str(sf), "embeddings", fit)
    import os
    import time

    os.utime(sf / "embeddings.parquet", (time.time() + 5, time.time() + 5))
    m = MS.load_or_train(spark, "op_f", {}, str(sf), "embeddings", fit)
    assert len(calls) == 2 and m == [[2.0]]


def test_compaction_crash_window_recovery(spark, tmp_path):
    """A crash between compact's two renames leaves only ``store.old``;
    every reader/writer must recover it (ADVICE r10: without recovery,
    loads silently missed, save recreated a fresh dir, and the NEXT
    compact deleted .old -- permanently discarding all persisted models).
    Mirrors test_band_index_compaction_crash_recovery."""
    import os

    from flatterer_spark.operators import model_store as MS

    store = str(tmp_path / "store")
    MS.save_model(spark, store, "op", "k1", [[4.5]])

    # simulate the crash window: first rename done, second never happened
    os.rename(store, store + ".old")
    assert not os.path.exists(store)
    assert MS.load_model(spark, store, "op", "k1") == [[4.5]]
    assert os.path.exists(store) and not os.path.exists(store + ".old")

    # same window, recovered via the WRITE path
    os.rename(store, store + ".old")
    MS.save_model(spark, store, "op", "k2", [[7.0]])
    assert MS.load_model(spark, store, "op", "k1") == [[4.5]]
    assert MS.load_model(spark, store, "op", "k2") == [[7.0]]

    # post-swap crash (both dirs exist): stale .old is dropped, store wins
    os.makedirs(store + ".old")
    assert MS.load_model(spark, store, "op", "k1") == [[4.5]]
    assert not os.path.exists(store + ".old")


def test_empty_composite_model_never_stored(spark, tmp_path, monkeypatch):
    """A list OF empties (ivfpq's empty-corpus [[], []]) is a truthy
    non-model; load_or_train must not persist it (ADVICE r10), so data
    arriving later retrains instead of serving the stored nothing."""
    import os

    from flatterer_spark.operators import model_store as MS

    store = str(tmp_path / "store")
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    sf = "/root/testdata/sf0.001"
    calls = []

    def fit_empty():
        calls.append(1)
        return [[], []]

    m = MS.load_or_train(spark, "op_e", {}, sf, "embeddings", fit_empty)
    assert m == [[], []]
    assert not os.path.isdir(store) or not any(
        not f.startswith(("_", ".")) for f in os.listdir(store)
    ), "empty composite model must not be persisted"
    # next call retrains (nothing served)
    MS.load_or_train(spark, "op_e", {}, sf, "embeddings", fit_empty)
    assert len(calls) == 2


def test_ivfpq_memo_bypassed_when_store_armed(spark, tmp_path, monkeypatch):
    """With a store armed, the in-session ivfpq memo must not shadow an
    external store write/compaction (VERDICT r10 Next #4b): the store is
    the cache.  Unarmed sessions keep the memo."""
    from flatterer_spark.operators import kmeans as KM
    from flatterer_spark.operators import model_store as MS
    from flatterer_spark.queries import T

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "store")
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    KM.clear_ivfpq_cache()
    emb = T(spark, sf, "embeddings").select("vec_id", "embedding")
    cents, books = KM._ivfpq_model(spark, sf, emb, 4, 2, 4, 4)
    assert cents and books

    # overwrite the stored model externally (as a scheduled trainer would)
    key = MS.model_key({"cells": 4, "m": 4, "kc": 4}, sf, "embeddings")
    marker = [[[0.5] * len(cents[0])] * len(cents), books]
    MS.save_model(spark, store, "ivfpq_model", key, marker)
    c2, b2 = KM._ivfpq_model(spark, sf, emb, 4, 2, 4, 4)
    assert c2 == marker[0], "armed store write was shadowed by the memo"

    # unarmed: memo serves (no store probe, stable within the session)
    monkeypatch.delenv("FLATTERER_MODEL_STORE")
    KM.clear_ivfpq_cache()
    c3, _ = KM._ivfpq_model(spark, sf, emb, 4, 2, 4, 4)
    c4, _ = KM._ivfpq_model(spark, sf, emb, 4, 2, 4, 4)
    assert c3 == c4


def test_remote_uri_store_serves_and_guards(spark, tmp_path, monkeypatch):
    """Cluster posture: a URI-schemed store (hdfs://, s3a://, file://) is
    invisible to os.path, so the old local-only existence check made every
    cluster load MISS while saves kept appending -- a store that grows but
    never serves.  A file:// URI exercises the remote branch end-to-end
    through Hadoop's filesystem layer: save -> load must round-trip, a
    missing store is a clean miss, and the local-only rename compaction
    must refuse a remote store loudly instead of corrupting it."""
    import pytest

    from flatterer_spark.operators import model_store as MS

    assert MS._is_remote("hdfs://nn/models")
    assert MS._is_remote("s3a://bucket/models")
    assert MS._is_remote("file:///tmp/models")
    # single-slash Hadoop URI form (hadoop.fs.Path.toString() prints this;
    # users copy it from Spark logs) -- treating it as local would rebuild
    # the grows-but-never-serves bug via a literal ./file:/... makedirs
    assert MS._is_remote("file:/tmp/models")
    assert MS._is_remote("hdfs:/nn/models")
    assert not MS._is_remote("/tmp/models")
    assert not MS._is_remote("relative/models")
    assert not MS._is_remote("/data/with:colon/models")

    store = "file://" + str(tmp_path / "uri_store")
    # missing remote store: clean miss, never an error
    assert MS.load_model(spark, store, "op", "k1") is None
    MS.save_model(spark, store, "op", "k1", [[3.5, -1.0]])
    assert MS.load_model(spark, store, "op", "k1") == [[3.5, -1.0]]
    # latest-wins still resolves on read without compaction
    MS.save_model(spark, store, "op", "k1", [[9.0]])
    assert MS.load_model(spark, store, "op", "k1") == [[9.0]]

    # load_or_train serves through the URI store too
    monkeypatch.setenv("FLATTERER_MODEL_STORE", store)
    calls = []

    def fit():
        calls.append(1)
        return [[7.0]]

    sf = "/root/testdata/sf0.001"
    MS.load_or_train(spark, "op_u", {}, sf, "embeddings", fit)
    MS.load_or_train(spark, "op_u", {}, sf, "embeddings", fit)
    assert len(calls) == 1, "URI store must SERVE, not retrain every call"

    # rename-based compaction is local-only: refuse remote stores loudly
    with pytest.raises(NotImplementedError, match="remote"):
        MS.compact_model_store(spark, store)


def test_load_or_train_records_skip_for_empty_model(spark, tmp_path, monkeypatch):
    """An armed store must not let a stale hit/miss label misattribute an
    empty-corpus retrain: the unsaved non-model records 'skip'."""
    from flatterer_spark.operators import model_store as MS

    monkeypatch.setenv("FLATTERER_MODEL_STORE", str(tmp_path / "s"))
    sf = "/root/testdata/sf0.001"
    MS.load_or_train(spark, "op_sk", {}, sf, "embeddings", lambda: [[1.0]])
    assert MS.LAST_STORE_EVENTS["op_sk"] == "miss"
    MS.load_or_train(spark, "op_sk2", {}, sf, "embeddings", lambda: [[], []])
    assert MS.LAST_STORE_EVENTS["op_sk2"] == "skip"


def test_band_index_recovery_tolerates_concurrent_winner(tmp_path, monkeypatch):
    """Two coordination-free writers both entering recovery after a compact
    crash: the loser's rename fails because the winner already restored the
    index -- recovery must see the restored index and succeed, not raise."""
    import os

    from flatterer_spark.streaming.stream_flatten import _recover_band_index

    idx = tmp_path / "band_index"
    old = tmp_path / "band_index.old"
    old.mkdir()
    (old / "part-0.parquet").write_bytes(b"x")

    real_rename = os.rename

    def racing_rename(src, dst):
        # simulate the concurrent recoverer completing first
        real_rename(src, dst)
        raise FileNotFoundError(src)

    monkeypatch.setattr(os, "rename", racing_rename)
    _recover_band_index(str(idx))  # must not raise
    assert idx.is_dir() and not old.exists()

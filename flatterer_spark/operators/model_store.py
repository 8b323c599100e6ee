"""Persisted model store: train-once / load-many for the learned-model
family (k-means centroids, PQ codebooks, IVF-PQ models).

VERDICT r9 #5 measured ``emb_pq_codes`` at ~33.6 s COLD (fresh session,
model retrained from scratch) vs 5.4-9.4 s when the session is staged.
The 100 TB posture for a learned index is the same as the MinHash band
index (`streaming.stream_flatten.minhash_band_probe_stream`): the model is
built by a scheduled job and PERSISTED; every downstream search/encode run
loads it instead of retraining.  This module is that persistence layer, and
it deliberately mirrors the band index's delta+compaction lifecycle:

 - ``save_model`` appends one (op, key, payload, created) parquet row --
   crash-safe by construction (an interrupted append leaves at most an
   orphan part file which the reader's schema tolerates), no
   read-modify-write anywhere;
 - ``load_model`` resolves latest-created-wins per (op, key) ON READ, so
   concurrent trainers converge without coordination (models are
   bit-deterministic per key anyway: the fit quantizes to 6 dp and the key
   embeds the training-data fingerprint, so any two writers write the same
   payload);
 - ``compact_model_store`` squashes the deltas to one row per (op, key) --
   the same offline squash as ``compact_band_index``.

The store location comes from ``$FLATTERER_MODEL_STORE`` (any
Hadoop-visible path: local dir, HDFS, object store).  Unset => no
persistence: fitters train in-session exactly as before, so the gate/test
default behavior is unchanged and the oracle literal-splice replay (which
refits numpy from the same seeds) stays valid whether or not the store
served the Spark side -- the stored model IS the trained model, bit for
bit.

Keys: ``key`` = JSON of the fit params + the training table's
(path, mtime, size) fingerprint (`functions.fingerprint.table_fingerprint`),
so regenerated data or changed hyper-parameters MISS and retrain instead of
serving a stale model -- the same invalidation rule as the in-session
caches this store backs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window

MODEL_STORE_SCHEMA = "op string, key string, payload string, created long"

#: Per-session memo of store hits/misses for observability in benches
#: (``emb_pq_codes`` cold vs load-path numbers): op -> "hit"/"miss".
LAST_STORE_EVENTS: dict[str, str] = {}


def store_dir() -> str | None:
    """The armed store location, or None (no persistence)."""
    return os.environ.get("FLATTERER_MODEL_STORE") or None


def model_key(params: dict, sf_dir: str, table: str) -> str:
    """Deterministic JSON key embedding params + training-data fingerprint."""
    from flatterer_spark.functions.fingerprint import table_fingerprint

    return json.dumps(
        {"params": params, "fp": table_fingerprint(sf_dir, table)},
        sort_keys=True,
    )


def _is_remote(path: str) -> bool:
    """True for URI-schemed paths (hdfs://, s3a://, ...) that the local
    ``os`` module cannot see.  ``file://`` counts as remote here too: it
    is addressed through Hadoop's filesystem layer, and ``os.path``
    operations on the raw URI string are meaningless.

    Matches ``scheme:/`` with ONE slash as well (``file:/srv/models`` --
    the form ``hadoop.fs.Path.toString()`` prints and users copy out of
    Spark logs): treating that form as local would recreate the silent
    grows-but-never-serves bug this predicate exists to prevent
    (``os.makedirs`` would build a literal ``./file:/...`` dir while the
    parquet writer targets ``/srv/models`` through Hadoop)."""
    import re

    return bool(re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:/", path))


def _recover_store(store: str) -> None:
    """Crash-consistency around :func:`compact_model_store`'s two-rename
    swap, called by EVERY reader/writer (ADVICE r10: without this, a crash
    between the renames left only ``store.old`` -- loads silently missed,
    the next ``save_model`` recreated a fresh store dir, and the NEXT
    compact's recovery saw both dirs and deleted ``.old``, permanently
    discarding every previously persisted model).  Shares the band index's
    recovery logic: ``.old``-only => restore it; both => drop stale
    ``.old``.  Idempotent.  Remote (URI) stores never compact through the
    rename path (see :func:`compact_model_store`), so there is no crash
    window to recover -- skip."""
    if _is_remote(store):
        return
    from flatterer_spark.streaming.stream_flatten import _recover_band_index

    _recover_band_index(store)


def load_model(spark: SparkSession, store: str, op: str, key: str) -> Any:
    """Latest-created payload for (op, key), JSON-decoded; None on miss.

    A tiny store read is one parquet scan of a few KB; filters on (op, key)
    push to the scan.  Missing/empty store dirs are a miss, never an error
    (first run of a fresh pipeline)."""
    _recover_store(store)
    if _is_remote(store):
        # A URI store (hdfs://, s3a://, file://) is invisible to os.path:
        # the old local-only existence check made every cluster load MISS
        # while save_model kept appending -- a store that grows but never
        # serves.  Probe through Spark instead and treat path-not-found as
        # the first-run miss it is.
        from pyspark.errors import AnalysisException

        try:
            rows = (
                spark.read.schema(MODEL_STORE_SCHEMA)
                .parquet(store)
                .where((F.col("op") == op) & (F.col("key") == key))
                .orderBy(F.col("created").desc())
                .limit(1)
                .collect()
            )
        except AnalysisException:
            return None
    else:
        if not os.path.isdir(store) or not any(
            not f.startswith(("_", ".")) for f in os.listdir(store)
        ):
            return None
        rows = (
            spark.read.schema(MODEL_STORE_SCHEMA)
            .parquet(store)
            .where((F.col("op") == op) & (F.col("key") == key))
            .orderBy(F.col("created").desc())
            .limit(1)
            .collect()
        )
    if not rows:
        return None
    return json.loads(rows[0]["payload"])


def save_model(
    spark: SparkSession, store: str, op: str, key: str, model: Any
) -> None:
    """Append one delta row; never rewrites existing data.

    Works unchanged against a remote (URI) store: parquet append creates
    the target directory through Hadoop's filesystem layer, so the local
    ``makedirs`` is only needed (and only meaningful) for plain paths."""
    _recover_store(store)
    if not _is_remote(store):
        os.makedirs(store, exist_ok=True)
    (
        spark.createDataFrame(
            [(op, key, json.dumps(model), int(time.time_ns()))],
            MODEL_STORE_SCHEMA,
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(store)
    )


def load_or_train(
    spark: SparkSession,
    op: str,
    params: dict,
    sf_dir: str,
    table: str,
    train_fn,
) -> Any:
    """The fitters' single entry point: serve from the armed store, else
    train via ``train_fn()`` and persist the result (when a store is armed
    and the model is non-empty -- an empty-corpus non-model is never
    stored, so data arriving later retrains)."""
    store = store_dir()
    if store:
        key = model_key(params, sf_dir, table)
        model = load_model(spark, store, op, key)
        if model is not None:
            LAST_STORE_EVENTS[op] = "hit"
            return model
    model = train_fn()
    # A composite fit on an empty corpus can return a list OF empties
    # (e.g. ivfpq's [[], []]), which is truthy -- gate on every part so an
    # empty-corpus non-model is never persisted (ADVICE r10); data arriving
    # later then retrains instead of serving the stored nothing.
    is_real = bool(model) and (
        not isinstance(model, (list, tuple)) or all(model)
    )
    if store and is_real:
        save_model(spark, store, op, key, model)
        LAST_STORE_EVENTS[op] = "miss"
    elif store:
        # empty-corpus non-model: nothing persisted, and a stale
        # "hit"/"miss" from an earlier call must not misattribute this
        # retrain in cold-vs-served bench labelling
        LAST_STORE_EVENTS[op] = "skip"
    return model


def compact_model_store(spark: SparkSession, store: str) -> int:
    """Squash deltas to one latest row per (op, key); returns rows kept.

    Same two-rename swap + recovery discipline as ``compact_band_index``:
    write the squashed table beside the store, swap via rename, and make
    readers recoverable from a crash between the renames."""
    import shutil

    if _is_remote(store):
        # The two-rename swap is a LOCAL-filesystem atomicity trick;
        # object stores have no atomic rename and HDFS rename semantics
        # differ.  On a cluster the store's squash belongs to a table
        # format's own compaction (Delta OPTIMIZE / Iceberg rewrite) --
        # fail loudly instead of corrupting a shared store, the same
        # posture as the drain checkpoint's non-local-master guard.
        raise NotImplementedError(
            f"compact_model_store: {store!r} is a remote (URI) path; the "
            "two-rename compaction is local-only. Remote stores stay "
            "correct uncompacted (load_model resolves latest-wins on "
            "read) -- compact via a table format (Delta/Iceberg) or "
            "stage locally."
        )
    from flatterer_spark.streaming.stream_flatten import _recover_band_index

    _recover_band_index(store)
    df = spark.read.schema(MODEL_STORE_SCHEMA).parquet(store)
    w = Window.partitionBy("op", "key").orderBy(F.col("created").desc())
    squashed = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = store.rstrip("/") + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    squashed.coalesce(1).write.mode("overwrite").parquet(tmp)
    n = spark.read.schema(MODEL_STORE_SCHEMA).parquet(tmp).count()
    old = store.rstrip("/") + ".old"
    os.rename(store, old)
    os.rename(tmp, store)
    shutil.rmtree(old, ignore_errors=True)
    return int(n)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a (path, offset, length) pointer into a blob store),
keep typed metadata columns alongside, and run decode / feature-extraction as
Arrow-batched ``mapInPandas`` stages so the Python work is vectorized per
batch and the schema stays declared up front.

The decode itself is STUBBED here (no image/audio libraries in this
container): ``decode_stub`` derives deterministic pseudo-features from the
payload bytes, and ``decode_real`` raises NotImplementedError with the
integration point documented.  Everything Spark-side -- schema, partitioning,
UDF signature, Arrow batch shape -- is real and tested.

``mm_binary_meta`` is registered in the driver gate with a DuckDB oracle:
the byte-level metadata (length, header hex, checksum prefix) is computable
by both engines, proving the binary round-trip (string -> utf-8 payload ->
mapInPandas -> metadata) is lossless.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

MM_META_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, checksum_prefix string, "
    "fake_width long, fake_height long"
)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text staged as an opaque binary column (stand-in for real
    media bytes; the plumbing is identical)."""
    from flatterer_spark.queries import T

    return T(spark, sf_dir, "documents").selectExpr(
        "doc_id", "encode(text, 'utf-8') AS payload"
    )


def _make_decode_stub():
    # Factory indirection matters: the returned function has a nested
    # __qualname__, so cloudpickle serializes it BY VALUE into executor-side
    # closures.  A plain module-level function would pickle by reference to
    # `flatterer_spark`, which executors cannot import when the engine is
    # loaded from a file path (as the round driver loads __spark_entry__.py).
    def decode_stub(payload: bytes) -> dict:
        """Deterministic fake decode: pretends the first 8 bytes are a header
        carrying width/height.  Replace with a real decoder (PIL / soundfile /
        pyav) via ``decode_real`` when the libraries are available."""
        import hashlib

        h = hashlib.md5(payload).hexdigest()
        return {
            "n_bytes": len(payload),
            "header_hex": payload[:4].hex(),
            "checksum_prefix": h[:8],
            "fake_width": 1 + payload[0] % 64 if payload else 0,
            "fake_height": 1 + payload[-1] % 64 if payload else 0,
        }

    return decode_stub


decode_stub = _make_decode_stub()


def decode_real(payload: bytes) -> dict:  # pragma: no cover - integration stub
    raise NotImplementedError(
        "real media decode requires PIL/soundfile/pyav; plug the decoder in "
        "here -- the mapInPandas plumbing in binary_metadata() is unchanged"
    )


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature-extraction stage over Arrow batches."""
    import pandas as pd

    decode = decode_stub  # closure-local bind; pickles by value (see factory)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return (
        _payloads(spark, sf_dir)
        .mapInPandas(extract, MM_META_SCHEMA)
        .orderBy("doc_id")
    )


# DuckDB oracle: byte metadata computed relationally.  documents.text is
# pure ASCII (verified), so the utf-8 payload's bytes equal the VARCHAR's
# chars -- DuckDB blobs don't support slicing, the text form does.
MM_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       lower(hex(substring(text, 1, 4))) AS header_hex,
       substring(md5(text), 1, 8) AS checksum_prefix,
       CAST(1 + ascii(substring(text, 1, 1)) % 64 AS BIGINT) AS fake_width,
       CAST(1 + ascii(substring(text, strlen(text), 1)) % 64 AS BIGINT) AS fake_height
FROM documents ORDER BY doc_id
"""


def frame_sample(spark: SparkSession, sf_dir: str, every: int = 7) -> DataFrame:
    """Frame-sampling plumbing: one payload -> many per-frame rows (the video
    analog of posexplode).  Frames are stubbed as fixed-size byte windows."""
    import pandas as pd

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                for i, off in enumerate(range(0, len(b), every)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_no": i,
                            "offset": off,
                            "frame_hex": b[off : off + 4].hex(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "offset", "frame_hex"]
            )

    return (
        _payloads(spark, sf_dir)
        .mapInPandas(sample, "doc_id long, frame_no long, offset long, frame_hex string")
        .orderBy("doc_id", "frame_no")
    )


FRAME_ORACLE = """
WITH f AS (
  SELECT doc_id, text, i, CAST((i - 1) * 7 AS BIGINT) AS off
  FROM documents,
       UNNEST(generate_series(1, CAST(ceil(strlen(text) / 7.0) AS BIGINT))) AS t(i)
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS frame_no, off AS offset,
       lower(hex(substring(text, CAST(off + 1 AS INT), 4))) AS frame_hex
FROM f ORDER BY doc_id, frame_no
"""

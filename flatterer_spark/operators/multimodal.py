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
            # empty payload -> 1, matching the SQL spec's
            # 1 + ascii(substring(text,1,1)) % 64 (ascii('') = 0 in both
            # DuckDB and Spark), so an empty document cannot diverge
            "fake_width": 1 + payload[0] % 64 if payload else 1,
            "fake_height": 1 + payload[-1] % 64 if payload else 1,
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
        # columnar accumulation (one list per column), not per-frame dicts:
        # a frame row is tiny, so dict construction + DataFrame(records)
        # dominated the stage (~2x of the whole op at sf0.1)
        for pdf in batches:
            ids: list = []
            fnos: list = []
            offs: list = []
            hexes: list = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                doc_offs = range(0, len(b), every)
                n = len(doc_offs)
                ids.extend([doc_id] * n)
                fnos.extend(range(n))
                offs.extend(doc_offs)
                hexes.extend(b[o : o + 4].hex() for o in doc_offs)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": fnos,
                    "offset": offs,
                    "frame_hex": hexes,
                }
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


def downsample(spark: SparkSession, sf_dir: str, stride: int = 4) -> DataFrame:
    """Binary -> binary transform plumbing (the resize/thumbnail shape): a
    deterministic byte-stride stands in for the real resample, and the output
    payload's length + checksum prove the round-trip.  A real implementation
    swaps the stride for PIL.thumbnail / librosa.resample inside the same
    mapInPandas stage -- payload in, payload out, Arrow both ways."""
    import pandas as pd

    def resample(batches):
        for pdf in batches:
            outs = [bytes(p)[::stride] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "out_len": [len(o) for o in outs],
                    "out_hex_prefix": [o[:4].hex() for o in outs],
                }
            )

    return (
        _payloads(spark, sf_dir)
        .mapInPandas(resample, "doc_id long, out_len long, out_hex_prefix string")
        .orderBy("doc_id")
    )


# byte-stride over ASCII text == char-stride: positions 1, 1+stride, ...
DOWNSAMPLE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         array_to_string(
           list_transform(generate_series(1, ((strlen(text) - 1) // 4) + 1),
                          i -> substring(text, (i - 1) * 4 + 1, 1)),
           '') AS out
  FROM documents
)
SELECT doc_id, CAST(strlen(out) AS BIGINT) AS out_len,
       lower(hex(substring(out, 1, 4))) AS out_hex_prefix
FROM d ORDER BY doc_id
"""

EMBED_DIM = 8


def embed_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> fixed-dim pseudo-embedding: the bridge from multimodal
    bytes into the similarity stack (sim_topk_*, dedup_embedding_* consume
    exactly this column shape).  The stub derives each dimension from
    md5(payload || ':' || d) scaled to [0, 1), so it is deterministic and
    oracle-checkable; a real model swaps in an ONNX/torch forward inside an
    Arrow-batched mapInPandas stage.  Kept JVM-side here (no Python at
    all) -- the fastest shape until a real model forces Python."""
    from flatterer_spark.queries import T

    dims = [
        f"FLOOR(CAST(conv(substring(md5(concat(text, ':', '{d}')), 1, 8), 16, 10) AS DOUBLE)"
        f" / 4294967296.0 * 100 + 0.5) / 100 AS e{d}"
        for d in range(EMBED_DIM)
    ]
    return T(spark, sf_dir, "documents").selectExpr("doc_id", *dims).orderBy("doc_id")


EMBED_ORACLE = (
    "SELECT doc_id, "
    + ", ".join(
        f"FLOOR(CAST('0x' || substring(md5(text || ':' || '{d}'), 1, 8) AS BIGINT)"
        f" / 4294967296.0 * 100 + 0.5) / 100 AS e{d}"
        for d in range(EMBED_DIM)
    )
    + " FROM documents ORDER BY doc_id"
)


def _make_phash_fp():
    # Factory indirection: nested __qualname__ -> cloudpickle serializes BY
    # VALUE (module docstring; executors can't import the package when the
    # engine is loaded from a file path).
    def fp(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        bits = np.arange(48, dtype=np.uint64)
        for pdf in batches:
            ids, phs = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                grams = {b[i : i + 4] for i in range(len(b) - 3)}
                if not grams:
                    continue  # <4-byte payload: no fingerprint (matches SQL)
                hs = np.array(
                    [
                        int(hashlib.md5(gm).hexdigest()[:12], 16)
                        for gm in grams
                    ],
                    dtype=np.uint64,
                )
                ones = ((hs[:, None] >> bits) & np.uint64(1)).sum(axis=0)
                ph = int(
                    (
                        (2 * ones > len(grams)).astype(np.uint64) << bits
                    ).sum(dtype=np.uint64)
                )
                ids.append(doc_id)
                phs.append(ph)
            yield pd.DataFrame({"doc_id": ids, "phash": phs})

    return fp


def phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit perceptual-hash-style fingerprint per media payload, as the
    REAL multimodal stage: Arrow ``mapInPandas`` over binary payloads,
    numpy-vectorized bit-majority over the distinct 4-byte grams.  A true
    pHash/aHash over decoded pixels replaces the gram hashing inside this
    same stage (decode libs absent in this container -- module docstring);
    the (doc_id, phash) contract and the downstream banded Hamming join
    (``ext_queries.sql_mm_phash_dedup``) are unchanged.  Byte-exact to the
    SQL-replica fingerprint (the DuckDB oracle), which the driver gate
    hash-verifies end to end."""
    return _payloads(spark, sf_dir).mapInPandas(
        _make_phash_fp(), "doc_id long, phash long"
    )

"""Scale-path Spark implementations for the dedup/similarity operators.

The declarative builders in ``ext_queries`` define the *semantics* (and the
DuckDB oracle).  The callables here produce byte-identical results through
plans that survive 100x data growth:

- ``simhash_sig``: signature via explode + groupBy (whole-stage codegen'd
  integer aggregates) instead of 32 interpreted higher-order-function lambdas
  per row.
- ``embedding_near_dup_pairs``: exact near-dup with *distributed* candidate
  generation -- vectors are hashed into blocks, replicated to unordered block
  pairs, and one applyInPandas task per block pair runs the BLAS matmul; no
  driver collect, no closure-broadcast matrix, memory bounded by block size.
  A 1e-6 cosine margin over-collects, then the deterministic fold-arithmetic
  cosine is recomputed on the (tiny) candidate set so the final filter
  matches the oracle bit-for-bit.  The approximate near-linear alternative is
  ``dedup_embedding_lsh`` (ext_queries): banded hyperplane LSH candidates +
  the same exact verify.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flatterer_spark.functions.textgen import Gen

SIMHASH_BITS = 60


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flatterer_spark.queries import T

    return T(spark, sf_dir, "documents")


def simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) -- identical values to ext_queries._sql_simhash_sig
    (60-bit md5 token hashes; see its docstring for the round-6 widening)."""
    tok_hashes = (
        _docs(spark, sf_dir)
        .selectExpr("doc_id", "explode(array_distinct(split(text, ' '))) AS t")
        .selectExpr(
            "doc_id",
            "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h",
        )
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.expr(f"shiftright(h, {b}) & 1")).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    bits = " + ".join(
        f"(CASE WHEN 2 * s{b} > n THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return (
        tok_hashes.groupBy("doc_id")
        .agg(*aggs)
        .selectExpr("doc_id", f"CAST({bits} AS BIGINT) AS simhash")
    )


def simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_sig(spark, sf_dir).orderBy("doc_id")


_sig_cache: dict[tuple, DataFrame] = {}


def _simhash_sig_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized persisted signature table: the pairs query reads
    the signatures three times (band explode + both verify sides), and a
    fresh .cache() per CALL leaked one cached RDD per invocation across a
    bench/test session; the fingerprint-keyed memo (same discipline as
    ext_queries' staged views) caches ONE copy per (session, source
    data) and evicts the superseded copy when the source regenerates."""
    from flatterer_spark.functions.fingerprint import fresh_cache_key

    key = fresh_cache_key(_sig_cache, spark, sf_dir, "documents")
    if key not in _sig_cache:
        _sig_cache[key] = simhash_sig(spark, sf_dir).persist()
    return _sig_cache[key]


def simhash_pairs_query(
    spark: SparkSession, sf_dir: str, max_dist: int = 3
) -> DataFrame:
    """Banded near-dup join: 4 bands of 15 bits; pigeonhole guarantees any
    pair at hamming <= 3 collides on at least one band, so the quadratic
    cross join becomes a shuffle-friendly equi-join on the band value.
    Expected collision-driven candidates are ~4 * n^2 / 2^16 -- the 15-bit
    band space is what keeps the pair set near-linear (8-bit bands measured
    quadratic at the 10x scale bench, BENCH_SCALE_r06)."""
    sig = _simhash_sig_cached(spark, sf_dir)
    band_vals = ", ".join(
        f"CAST({j * 32768} + (shiftright(simhash, {15 * j}) & 32767) AS BIGINT)"
        for j in range(4)
    )
    bands = sig.selectExpr("doc_id", f"explode(array({band_vals})) AS band")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band"])
        .where(F.expr("x.doc_id < y.doc_id"))
        .selectExpr("x.doc_id AS id1", "y.doc_id AS id2")
        .distinct()
    )
    return (
        cand.join(sig.selectExpr("doc_id AS id1", "simhash AS h1"), "id1")
        .join(sig.selectExpr("doc_id AS id2", "simhash AS h2"), "id2")
        .where(F.expr(f"bit_count(h1 ^ h2) <= {max_dist}"))
        .selectExpr("id1", "id2", "CAST(bit_count(h1 ^ h2) AS BIGINT) AS hamming")
        .orderBy("id1", "id2")
    )


EMB_DIM = 64


def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5, n_blocks: int = 8
) -> DataFrame:
    """Exact cosine >= threshold pairs: block-pair BLAS candidates +
    fold-exact verify.

    Candidate generation is fully distributed -- no driver collect, no
    closure-broadcast matrix.  Each vector is hashed to one of ``n_blocks``
    blocks and replicated to every block *pair* it participates in (factor
    n_blocks), then one applyInPandas task per unordered block pair runs a
    numpy matmul between the two blocks' matrices.  Every unordered vector
    pair lands in exactly one block pair, so no cross-task dedup is needed.
    Shuffle volume is n * n_blocks rows; per-task memory is ~2(n/B) vectors,
    so at scale pick n_blocks ~ n * dim * 8B / executor_budget (the exact
    all-pairs O(n^2/B^2) flops per task are the price of *exact* dedup --
    dedup_embedding_lsh in ext_queries is the near-linear approximate path).
    A 1e-6 cosine margin over-collects candidates; the deterministic
    fold-arithmetic cosine then recomputes the (tiny) candidate set so the
    final filter matches the oracle bit-for-bit."""
    from flatterer_spark.queries import T

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    B = n_blocks
    margin = 1e-6

    rep = emb.selectExpr(
        "vec_id",
        "embedding",
        f"pmod(crc32(CAST(vec_id AS STRING)), {B}) AS blk",
    ).selectExpr(
        "vec_id",
        "embedding",
        "blk",
        f"explode(transform(sequence(0, {B - 1}),"
        f" j -> least(blk, CAST(j AS BIGINT)) * {B} + greatest(blk, CAST(j AS BIGINT)))) AS pk",
    )

    def _block_pair_cands(pdf):
        # nested (pickled by value): executor workers can't import the
        # package when __spark_entry__ is loaded by file path
        import numpy as np
        import pandas as pd

        pk = int(pdf["pk"].iloc[0])
        i, j = divmod(pk, B)
        vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
        vn = vecs / np.sqrt((vecs * vecs).sum(axis=1))[:, None]
        ids = pdf["vec_id"].to_numpy()
        blk = pdf["blk"].to_numpy()
        li = np.nonzero(blk == i)[0]
        rj = np.nonzero(blk == j)[0]
        if len(li) == 0 or len(rj) == 0:
            return pd.DataFrame({"id1": pd.array([], dtype="int64"),
                                 "id2": pd.array([], dtype="int64")})
        cos = vn[li] @ vn[rj].T
        ai, bj = np.nonzero(cos >= threshold - margin)
        u = ids[li][ai]
        v = ids[rj][bj]
        if i == j:  # both sides are the same set: keep each pair once
            keep = u < v
            u, v = u[keep], v[keep]
        return pd.DataFrame(
            {"id1": np.minimum(u, v), "id2": np.maximum(u, v)}
        )

    cand = rep.groupBy("pk").applyInPandas(_block_pair_cands, "id1 long, id2 long")

    g = Gen(spark=True)
    elems = g.transform(
        g.seq("1", str(EMB_DIM)), "i", "CAST(element_at(embedding, i) AS DOUBLE)"
    )
    en = emb.selectExpr("vec_id", f"{elems} AS e").selectExpr(
        "vec_id",
        "e",
        f"sqrt({g.fold_sum(g.transform('e', 'x', 'x * x'))}) AS nrm",
    )
    prods = g.transform(g.seq("1", str(EMB_DIM)), "i", "element_at(e1, i) * element_at(e2, i)")
    cos = f"{g.fold_sum(prods)} / (nrm1 * nrm2)"
    return (
        cand.join(en.selectExpr("vec_id AS id1", "e AS e1", "nrm AS nrm1"), "id1")
        .join(en.selectExpr("vec_id AS id2", "e AS e2", "nrm AS nrm2"), "id2")
        .where(F.expr(f"{cos} >= {g.d(threshold)}"))
        .selectExpr("id1", "id2", f"{g.round2(f'({cos})')} AS cosine")
        .orderBy("id1", "id2")
    )

"""Scale-path Spark implementations for the dedup/similarity operators.

The declarative builders in ``ext_queries`` define the *semantics* (and the
DuckDB oracle).  The callables here produce byte-identical results through
plans that survive 100x data growth:

- ``simhash_sig``: signature via explode + groupBy (whole-stage codegen'd
  integer aggregates) instead of 32 interpreted higher-order-function lambdas
  per row.
- ``embedding_near_dup_pairs`` / scale notes: BLAS-vectorized candidate
  generation via mapInPandas (Arrow batches, numpy matmul against a broadcast
  matrix) with a 1e-6 cosine margin, then the deterministic fold-arithmetic
  cosine recomputed on the (tiny) candidate set so the final filter matches
  the oracle bit-for-bit.  The broadcast matrix caps at ~1M vectors; beyond
  that the same verify stage sits behind an IVF/LSH bucket join
  (sim_lsh_buckets is the bucketing half).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flatterer_spark.functions.textgen import Gen

SIMHASH_BITS = 32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flatterer_spark.queries import T

    return T(spark, sf_dir, "documents")


def simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) -- identical values to ext_queries._sql_simhash_sig."""
    tok_hashes = (
        _docs(spark, sf_dir)
        .selectExpr("doc_id", "explode(array_distinct(split(text, ' '))) AS t")
        .selectExpr(
            "doc_id",
            "CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) AS h",
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


def simhash_pairs_query(
    spark: SparkSession, sf_dir: str, max_dist: int = 3
) -> DataFrame:
    """Banded near-dup join: 4 bands of 8 bits; pigeonhole guarantees any pair
    at hamming <= 3 collides on at least one band, so the quadratic cross join
    becomes a shuffle-friendly equi-join on the band value."""
    sig = simhash_sig(spark, sf_dir).cache()
    band_vals = ", ".join(
        f"CAST({j * 256} + (shiftright(simhash, {8 * j}) & 255) AS BIGINT)"
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
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Exact cosine >= threshold pairs: BLAS candidates + fold-exact verify."""
    import numpy as np
    import pandas as pd

    from flatterer_spark.queries import T

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()  # candidate index; see module docstring for the
    # >1M-vector path (IVF/LSH bucketed candidates feeding the same verify)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    matn = mat / norms[:, None]
    margin = 1e-6

    def gen_candidates(batches):
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vnorm = vecs / np.sqrt((vecs * vecs).sum(axis=1))[:, None]
            cos = vnorm @ matn.T  # (batch, N)
            bi, ni = np.nonzero(cos >= threshold - margin)
            qid = pdf["vec_id"].to_numpy()[bi]
            nid = ids[ni]
            keep = qid < nid
            yield pd.DataFrame({"id1": qid[keep], "id2": nid[keep]})

    cand = emb.mapInPandas(gen_candidates, "id1 long, id2 long")

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

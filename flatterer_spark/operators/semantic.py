"""SemDeDup-style semantic dedup and centroid-distance outlier pruning.

Two embedding-curation operators a 100 TB training-data pipeline runs after
clustering (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"; Sorscher et al. 2022 prototype
pruning):

* ``dedup_semantic`` -- fit k-means over the embedding column, then look for
  near-duplicate pairs ONLY within each cluster (cosine >= threshold) and
  keep the lowest ``vec_id`` of every close pair (the same greedy keep-first
  discipline as ``dedup_exact``).  The cluster equi-join is the entire point
  at scale: candidate pairs drop from n^2 to sum(n_c^2) -- with k balanced
  clusters a ~k-fold reduction that grows with k -- and the join shuffles on
  the uniform cluster id instead of broadcasting vectors anywhere.
* ``emb_outliers`` -- assign each vector to its nearest centroid and flag
  vectors whose distance exceeds mean + 2 * stddev of their cluster
  (prototype-distance pruning: far-from-centroid points are label noise /
  junk candidates).  One map-side assignment pass + one k-row stats agg.

Execution / oracle model (same contract as ``operators/kmeans.py``): the
model is fit by the distributed ``kmeans_fit`` (bit-deterministic under any
partitioning via 6-decimal centroid quantization), and the scoring SQL is
emitted ONCE via :class:`~flatterer_spark.functions.textgen.Gen` for both
engines.  The DuckDB oracle splices a model refit by the INDEPENDENT
sequential numpy reference -- bit-identical to the distributed fit by
construction -- so the gate hash checks both the fit and the scoring pass.

Cross-engine float discipline: cosines are quantized to 6 decimals and
distances to 4 (deterministic fold-order dot products, FLOOR half-up
rounding) before any threshold compare; the outlier cut rounds
``mean + 2 * stddev`` to 4 decimals, leaving ~9 orders of magnitude between
the rounding quantum and the ~1e-13 accumulation-order noise of the
aggregates (same residual-probability argument as the kmeans module
docstring, "Bit-determinism").

100 TB notes: k scales with the corpus (SemDeDup uses ~100k clusters at
web scale), so the cluster-id join key cardinality -- and with it shuffle
parallelism -- grows with the data; the gate's k=10 is a data-scale choice,
not a design limit.  At cluster scale, stage the ``asg`` CTE as a persisted
table first (the ``_emb_view`` pattern): Spark inlines CTEs, so the
assignment fold is otherwise re-evaluated once per reference (3x here) --
value-identical either way, which is why the gate keeps the single-string
form the oracle shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flatterer_spark.functions.textgen import Gen
from flatterer_spark.operators.kmeans import (
    _emb_fingerprint,
    kmeans_fit,
    kmeans_fit_numpy,
)

#: Fitted-model cache, keyed on (session, sf_dir, k, iters, parquet
#: fingerprint) -- train-once / score-many, same invalidation rule as the
#: IVF-PQ model cache in operators/kmeans.py.
_sem_model_cache: dict[tuple, list] = {}


def _model(spark, sf_dir: str, k: int, iters: int) -> list[list[float]]:
    from flatterer_spark.queries import T

    key = (id(spark), sf_dir, k, iters, _emb_fingerprint(sf_dir))
    if key not in _sem_model_cache:
        emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        _sem_model_cache[key] = kmeans_fit(
            emb, "embedding", "vec_id", k=k, iters=iters
        )
    return _sem_model_cache[key]


def _numpy_model(sf_dir: str, k: int, iters: int) -> list[list[float]]:
    """Independent sequential refit for the oracle (see module docstring)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    if X.size == 0:
        return []
    return [list(c) for c in kmeans_fit_numpy(X, k, iters)]


def _cents_cte(g: Gen, cents: list[list[float]]) -> str:
    """The model as an inline (cluster, c DOUBLE[]) relation of literals."""
    if g.spark:
        rows = ",\n        ".join(
            "({}, array({}))".format(
                j, ", ".join(f"{float(x)!r}D" for x in c)
            )
            for j, c in enumerate(cents)
        )
        return f"cents AS (SELECT * FROM VALUES\n        {rows} AS t(cluster, c))"
    rows = ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(j, ", ".join(repr(float(x)) for x in c))
        for j, c in enumerate(cents)
    )
    return f"cents(cluster, c) AS (VALUES\n        {rows})"


def _assign_ctes(g: Gen, cents: list[list[float]]) -> str:
    """CTE chain ending in ``asg`` = (vec_id, e, nrm, cluster, d2).

    The k-row ``cents`` relation rides the plan as literals -- Spark
    broadcasts it, so the argmin assignment is a map-side pass over the
    embeddings (k rows per vector, ROW_NUMBER cut on the uniform vec_id
    key); nothing data-sized shuffles.  Ties break to the lowest cluster
    id, matching ``kmeans.assign_clusters``'s ``array_position`` rule.
    """
    from flatterer_spark.ext_queries import EMB_DIM, _sql_emb_norm

    diff = f"({g.at('en.e', 'i')} - {g.at('cents.c', 'i')})"
    d2 = g.fold_sum(
        g.transform(g.seq("1", str(EMB_DIM)), "i", f"{diff} * {diff}")
    )
    return f"""{_sql_emb_norm(g)},
    {_cents_cte(g, cents)},
    dd AS (SELECT en.vec_id, en.e, en.nrm, cents.cluster, {d2} AS d2
           FROM en CROSS JOIN cents),
    asg AS (
        SELECT vec_id, e, nrm, cluster, d2 FROM (
            SELECT dd.*, ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY d2, cluster) AS rn
            FROM dd
        ) ranked WHERE rn = 1
    )"""


def sql_dedup_semantic(
    g: Gen, cents: list[list[float]], threshold: float = 0.35
) -> str:
    """One row per vector: cluster, #lower-id close neighbors, max cosine
    to any of them, and the SemDeDup drop flag (``is_dup`` = has at least
    one lower-id neighbor at cosine >= threshold in the same cluster).

    Plan shape: the within-cluster self-join has only k distinct join
    keys, so a shuffled join caps parallelism at k tasks -- and AQE then
    coalesces the few-MB/high-CPU pair stage to ONE task (measured 6.0 s
    at sf0.1).  The fix is the repo's standard pair-stage pinning: the
    probe side is REPARTITION-pinned (``rep``) and the build side
    broadcast (asg is n_vectors x (d+2) doubles -- broadcastable far
    beyond gate scale), so the cosine folds run at full width (1.4 s).
    At true 100 TB scale the broadcast stops fitting and SemDeDup becomes
    the cluster-partitioned block-pair shape of ``dedup_embedding``
    (salt the cluster key, block the pairs); the k-key skew fact is the
    same, only the pairing mechanism changes."""
    from flatterer_spark.ext_queries import _sql_dot

    cos = g.round2(f"{_sql_dot(g, 'a.e', 'b.e')} / (a.nrm * b.nrm)", 6)
    return f"""
    WITH {_assign_ctes(g, cents)},
    rep AS (SELECT {g.par_hint()}* FROM asg),
    pairs AS (
        SELECT {g.bc_hint('b')}a.vec_id AS id_hi, {cos} AS cos
        FROM rep a JOIN asg b
          ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    ),
    close AS (
        SELECT id_hi, CAST(COUNT(*) AS BIGINT) AS n_close,
               MAX(cos) AS max_cos
        FROM pairs WHERE cos >= {g.d(threshold)}
        GROUP BY id_hi
    )
    SELECT asg.vec_id,
           CAST(asg.cluster AS BIGINT) AS cluster,
           CAST(COALESCE(close.n_close, 0) AS BIGINT) AS n_close,
           COALESCE(close.max_cos, {g.d(-1.0)}) AS max_close_cos,
           CAST(CASE WHEN close.id_hi IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_dup
    FROM asg LEFT JOIN close ON asg.vec_id = close.id_hi
    ORDER BY vec_id
    """


def sql_emb_outliers(g: Gen, cents: list[list[float]]) -> str:
    """One row per vector: nearest-centroid distance, the per-cluster
    outlier cut (mean + 2 * sample stddev of distance), and the prune flag.
    Single-member clusters have NULL stddev -> NULL cut -> never outliers
    (identical NULL comparison semantics on both engines)."""
    dist = g.round2("sqrt(d2)", 4)
    return f"""
    WITH {_assign_ctes(g, cents)},
    dists AS (SELECT vec_id, cluster, {dist} AS dist FROM asg),
    stats AS (
        SELECT cluster,
               {g.round2('AVG(dist) + 2 * STDDEV_SAMP(dist)', 4)} AS cut
        FROM dists GROUP BY cluster
    )
    SELECT d.vec_id,
           CAST(d.cluster AS BIGINT) AS cluster,
           d.dist,
           s.cut,
           CAST(CASE WHEN d.dist > s.cut THEN 1 ELSE 0 END AS BIGINT)
               AS is_outlier
    FROM dists d JOIN stats s ON d.cluster = s.cluster
    ORDER BY d.vec_id
    """


_SEM_SCHEMA = (
    "vec_id long, cluster long, n_close long, max_close_cos double, "
    "is_dup long"
)
_OUT_SCHEMA = (
    "vec_id long, cluster long, dist double, cut double, is_outlier long"
)


def dedup_semantic(
    spark, sf_dir: str, k: int = 10, iters: int = 5, threshold: float = 0.35
) -> DataFrame:
    """Gate query: SemDeDup over the embeddings table (module docstring)."""
    from flatterer_spark.queries import T

    cents = _model(spark, sf_dir, k, iters)
    if not cents:  # empty corpus: no model, no rows
        return spark.createDataFrame([], _SEM_SCHEMA)
    T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(sql_dedup_semantic(Gen(spark=True), cents, threshold))


def emb_outliers(
    spark, sf_dir: str, k: int = 10, iters: int = 5
) -> DataFrame:
    """Gate query: centroid-distance outlier flags (module docstring)."""
    from flatterer_spark.queries import T

    cents = _model(spark, sf_dir, k, iters)
    if not cents:
        return spark.createDataFrame([], _OUT_SCHEMA)
    T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(sql_emb_outliers(Gen(spark=True), cents))


def oracle_dedup_semantic(
    k: int = 10, iters: int = 5, threshold: float = 0.35,
    sf_dir: str | None = None,
) -> str:
    import os

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    cents = _numpy_model(sf_dir, k, iters)
    if not cents:
        return f"SELECT * FROM (SELECT CAST(NULL AS BIGINT) AS vec_id, " \
               f"CAST(NULL AS BIGINT) AS cluster, CAST(NULL AS BIGINT) AS n_close, " \
               f"CAST(NULL AS DOUBLE) AS max_close_cos, CAST(NULL AS BIGINT) AS is_dup) " \
               f"WHERE FALSE"
    return sql_dedup_semantic(Gen(spark=False), cents, threshold)


def oracle_emb_outliers(
    k: int = 10, iters: int = 5, sf_dir: str | None = None
) -> str:
    import os

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    cents = _numpy_model(sf_dir, k, iters)
    if not cents:
        return f"SELECT * FROM (SELECT CAST(NULL AS BIGINT) AS vec_id, " \
               f"CAST(NULL AS BIGINT) AS cluster, CAST(NULL AS DOUBLE) AS dist, " \
               f"CAST(NULL AS DOUBLE) AS cut, CAST(NULL AS BIGINT) AS is_outlier) " \
               f"WHERE FALSE"
    return sql_emb_outliers(Gen(spark=False), cents)

"""Distributed k-means (Lloyd) over an embedding column, JVM-side.

The missing clustering primitive for the training-data pipeline: IVF cell
training, topic bucketing, and PQ codebooks are all k-means under the hood.

Execution model (100 TB posture)
--------------------------------
Per iteration the cluster model is k x d doubles -- driver-side model state,
exactly the MLlib split: the DATA never leaves the executors, only the tiny
centroid matrix rides the closure.

* assign: argmin-L2 as ONE ``transform`` lambda over the constant-folded
  codebook literal (see ``_dists``).  No shuffle, no Python -- a map-only
  stage, repartitioned to full session parallelism.  For k*d far beyond
  the gate's sizes (k*d >~ 10^5), switch to the Arrow block-BLAS path in
  ``operators/dedup.py``; at k=10, d=64 the JVM expression wins.
* update: ``posexplode`` the vector to (cluster, dim, value) rows and take
  one partial+final average per (cluster, dim) -- a single shuffle of
  k*d pre-aggregated cells per executor, NOT of the data.
* iterate ``iters`` times (fixed, bounded; no convergence-dependent
  driver loop that could run unbounded on adversarial data).

Bit-determinism
---------------
Distributed float averages depend on partitioning order.  To make the whole
algorithm reproducible (and testable against a sequential numpy reference),
every updated centroid coordinate is QUANTIZED to 6 decimals
(``floor(x*1e6 + 0.5 + 1e-9)/1e6``): the accumulation-order noise (~1e-12
relative) is far below the rounding quantum, so the quantized model -- and
therefore every assignment -- is identical under any partitioning, any
executor count, and in the numpy reference (``tests/test_kmeans.py``).
The ``+ 1e-9`` snap-epsilon closes the residual boundary hazard (ADVICE
r4): without it, a mean landing within ~1e-12 of an exact ``.5`` rounding
boundary could quantize differently across partitionings; with it, any
value within the noise band of a boundary deterministically rounds UP on
every accumulation order (noise << 1e-9 << quantum), and the numpy
reference applies the identical epsilon.  Empty clusters keep their
previous centroid.

Reference behavior modeled on public k-means / IVF training practice
(Lloyd 1982; Jegou et al. 2011 for the PQ use in ``pq_codes``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_Q = 6  # centroid quantization decimals (see module docstring)

# diagnostics: Lloyd passes the last kmeans_fit / pq_fit actually executed
# (early stop makes this < iters when the quantized model reaches its
# fixed point) -- read by the scale audit to answer whether the iteration
# budget is load-bearing at a given corpus size
LAST_FIT_ITERS: dict[str, int] = {}


def _quant(x: float) -> float:
    m = 10 ** _Q
    import math

    # + 1e-9: deterministic snap for means within float-noise of a .5
    # rounding boundary (module docstring, "Bit-determinism").
    return math.floor(x * m + 0.5 + 1e-9) / m


def _sorted_output(df: DataFrame, *cols: str) -> DataFrame:
    """``df.orderBy(*cols)`` with the expensive projection evaluated ONCE.

    A global sort range-partitions its child, and computing the range
    bounds SAMPLES the child -- for a map-only child (scan -> HOF-heavy
    assignment/encode projection, no Exchange to reuse) that executes the
    whole projection a second time just to read the sort keys (measured:
    the pq encode's noop wall 1.0 s -> 3.1 s once ``.orderBy`` was
    appended; interleaved A/B of the full emb_pq_codes query: plain min
    3.94 s vs checkpointed 3.09 s, r11 optimization round).  Materializing
    via ``localCheckpoint`` runs the projection once and sorts the (much
    narrower) result -- the guide §8 shape: the heavy compute happens
    once, the ordering decision runs on small rows.  Values are
    unchanged, so oracle hashes are identical; only lineage is truncated
    (same trade as the CC rounds and the ewma-ttl gate, which already
    localCheckpoint).  Only worth it when the projection is genuinely
    expensive: the cheaper k-means assign and k-center rank projections
    measured a wash (their call sites keep the plain sort)."""
    return df.localCheckpoint(eager=True).orderBy(*cols)


def _nested_lit(obj, dtype: str):
    """Constant nested-array column from a Python nested list, built with
    ONE py4j call.

    ``F.lit``/``F.array`` on a k x d nested list issue one py4j round trip
    PER ELEMENT (PySpark's ``lit(list)`` recurses into ``array(*[lit(x)])``),
    which measured ~0.26 s of pure driver-side expression-BUILD time per
    Lloyd update pass at k=10, d=64 -- more than the whole Catalyst
    optimize+physical phase for the same plan (r11 optimization round,
    guide §7.3: when nothing is running, the driver is the bottleneck).
    ``from_json`` of the JSON dump is a single call, and Catalyst
    constant-folds it into the identical nested-array Literal during
    optimization (verified: optimized plan shows the folded literal and
    every downstream fold is bit-for-bit unchanged, incl. denormals and
    -0.0 -- Jackson and repr() round-trip doubles exactly).

    JSON cannot carry NaN/Inf; model values are finite by construction
    (quantized means of finite data), but fall back to the element-wise
    build rather than corrupt if one ever appears."""
    import json as _json
    import math as _math

    def _finite(o) -> bool:
        if isinstance(o, list):
            return all(_finite(x) for x in o)
        return not isinstance(o, float) or _math.isfinite(o)

    if not _finite(obj):
        return F.lit(obj)
    return F.from_json(F.lit(_json.dumps(obj)), dtype)


def _dists(vec_col, centroids: list[list[float]]):
    """Array of squared-L2 distances to every centroid, as ONE expression.

    The codebook rides as a nested array of literals that Catalyst
    constant-folds into a single Literal, and the per-centroid fold is one
    ``transform`` lambda -- NOT k unrolled fold expressions.  The unrolled
    form made whole-stage codegen compilation itself the bottleneck
    (21 s for a 500-row PQ encode with m*k=128 folds); the lambda form
    compiles once and evaluates identically (left fold in array order,
    deterministic)."""
    book = _nested_lit(
        [[float(x) for x in c] for c in centroids], "array<array<double>>"
    )
    return F.transform(
        book,
        lambda c: F.aggregate(
            F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Add a 0-based ``cluster`` column = argmin squared-L2 (ties -> lowest index)."""
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = _dists(vecd, centroids)
    # array_position is 1-based; first occurrence wins on exact ties.
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("long")
    return df.withColumn("_dist2", F.array_min(dists)).withColumn(
        "cluster", cluster
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    iters: int = 5,
) -> list[list[float]]:
    """Fit k quantized centroids; init = the k lowest-``id_col`` vectors.

    The input is persisted for the duration of the fit (the MLlib pattern
    for iterative algorithms): every Lloyd iteration re-reads the vectors,
    and without a cache each iteration pays the full source scan again.
    It is also repartitioned to the session parallelism first: a small
    parquet source arrives as 1-2 splits, which would serialize the
    HOF-heavy assignment map onto 1-2 cores (same pathology as the LSH
    verify REPARTITION hint); the quantized model is partitioning-invariant
    (module docstring), so this cannot change the result.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism).persist()
    try:
        seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
        if not seed_rows:
            return []  # empty corpus: no model (callers emit empty results)
        cents = [[_quant(float(x)) for x in r[0]] for r in seed_rows]
        d = len(cents[0])
        for it in range(iters):
            LAST_FIT_ITERS["kmeans"] = it + 1
            assigned = assign_clusters(df, vec_col, cents)
            vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
            cells = (
                assigned.select("cluster", F.posexplode(vecd).alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.avg("v").alias("mean"))
                .collect()
            )
            new = [list(c) for c in cents]  # empty cluster keeps its centroid
            for row in cells:
                new[row["cluster"]][row["dim"]] = _quant(row["mean"])
            if new == cents:
                # exact convergence: the 6-dp quantized model makes
                # "unchanged" a true fixed point (identical centroids =>
                # identical assignments => identical quantized means), so
                # stopping here returns bit-for-bit what running the
                # remaining iterations would -- the numpy reference and
                # literal-splice oracles need no matching change
                break
            cents = new
            assert all(len(c) == d for c in cents)
        return cents
    finally:
        df.unpersist()


def kmeans_fit_numpy(X, k: int, iters: int):
    """Sequential Lloyd reference: same init (first k rows), same
    tie-break (argmin first index), same 6-decimal snap-epsilon
    quantization as :func:`kmeans_fit` -- so its quantized model is
    bit-identical to the distributed fit (module docstring).  Used by
    :func:`oracle_emb_kmeans` to build a DuckDB oracle from an INDEPENDENT
    implementation; ``tests/test_kmeans.py`` keeps its own third copy so
    the test does not share code with what it verifies."""
    import numpy as np

    m = 10 ** _Q

    def q(a):
        return np.floor(a * m + 0.5 + 1e-9) / m

    cents = q(X[:k].astype(np.float64))
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = cents.copy()
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = q(X[mask].mean(axis=0))
        cents = new
    return cents


def oracle_emb_kmeans(k: int = 10, iters: int = 5, sf_dir: str | None = None) -> str:
    """DuckDB oracle SQL for :func:`emb_kmeans` (VERDICT r4 next-round #4:
    upgrade a learned-model query from rows-only to oracle-hash).

    An iterative fixpoint is not expressible as one static SQL string, but
    the fitted model IS bit-deterministic (module docstring) -- so the
    oracle recomputes the centroids from the same parquet with the
    independent sequential numpy fit at oracle-BUILD time, splices them in
    as literals, and computes the assignment + distance pass in DuckDB.
    The gate hash then checks both halves: a drifted distributed fit
    changes the centroids and therefore every assignment/dist; a broken
    assignment expression diverges from DuckDB's evaluation of the same
    math.  The fold order (left fold over dims) matches the Spark
    ``aggregate``/``zip_with`` expression bit-for-bit.

    The driver registers its views at the gate scale (sf0.01), which is
    what the default points at; ``SPARK_GRAFT_ORACLE_SF_DIR`` overrides for
    local cross-checks at other scales (tests/xcheck.py sets it).
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    dim = X.shape[1]
    cents = kmeans_fit_numpy(X, k, iters)
    rows = ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in c)
        )
        for j, c in enumerate(cents)
    )
    d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        "i -> (e[i] - c[i]) * (e[i] - c[i]))), (acc, x) -> acc + x)"
    )
    return f"""
    WITH ev AS (
        SELECT vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> CAST(embedding[i] AS DOUBLE)) AS e
        FROM embeddings
    ),
    cents(cluster, c) AS (VALUES
        {rows}),
    d AS (SELECT vec_id, cluster, {d2} AS d2 FROM ev CROSS JOIN cents),
    r AS (
        SELECT vec_id, cluster, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rn
        FROM d
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
           FLOOR(sqrt(d2) * 10000 + 0.5) / 10000 AS dist
    FROM r WHERE rn = 1
    ORDER BY vec_id
    """


def emb_kmeans(spark, sf_dir: str, k: int = 10, iters: int = 5) -> DataFrame:
    """Gate query: cluster the embeddings table; one row per vector.

    Oracle-hash-checked at the gate via :func:`oracle_emb_kmeans` (numpy
    refit + DuckDB assignment over centroid literals);
    ``tests/test_kmeans.py`` additionally verifies assignments and
    centroids exactly against its own sequential numpy reference, and pins
    partitioning-invariance of the full model.
    """
    from flatterer_spark.queries import T, round_half_up

    from flatterer_spark.operators.model_store import load_or_train

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = load_or_train(
        spark, "kmeans_centroids", {"k": k, "iters": iters}, sf_dir,
        "embeddings",
        lambda: kmeans_fit(emb, "embedding", "vec_id", k=k, iters=iters),
    )
    if not cents:  # empty corpus
        return spark.createDataFrame([], "vec_id long, cluster long, dist double")
    wide = emb.repartition(spark.sparkContext.defaultParallelism)
    out = assign_clusters(wide, "embedding", cents)
    return (
        out.select(
            "vec_id",
            "cluster",
            round_half_up(F.sqrt(F.col("_dist2")), 4).alias("dist"),
        )
        # plain global sort: the k=10 assign projection is cheap enough
        # that the range-sampling double-eval is a wash against a
        # localCheckpoint materialization (interleaved A/B, r11 round:
        # plain min 2.90 s vs checkpointed 3.06 s) -- see _sorted_output,
        # which IS the right shape for the m*k-fold PQ encode
        .orderBy("vec_id")
    )


_kcenter_cache: dict[tuple, list] = {}


def kcenter_fit(
    df: DataFrame, vec_col: str, id_col: str, k: int = 16
) -> list[tuple[int, list[float]]]:
    """Greedy farthest-point k-center selection (Gonzalez 1985): seed at the
    lowest-id vector, then k-1 times pick the vector FARTHEST from its
    nearest already-chosen center -- the standard diversity-coreset /
    data-pruning primitive (the redundancy-removal complement of SemDeDup:
    that drops what is too similar, this keeps what is maximally spread).

    Returns [(center_vec_id, center_vector), ...] in selection order.

    Scale shape: k-1 driver-loop iterations, each ONE map+TakeOrdered job
    -- the current center set rides as a constant-folded literal (same
    ``_dists`` machinery as the k-means fit), per-row cost is one codegen'd
    fold, and exactly one row returns to the driver per iteration.  Driver
    state is k x d.  No shuffle anywhere.

    Determinism: centers are RAW data vectors (no averaging, so no
    quantization is needed on the model itself); the selection metric
    (min squared distance to the center set) is quantized to 6 decimals
    with the module's snap epsilon before the argmax, ties broken by
    lowest vec_id -- the same discipline that makes the k-means model
    partitioning-invariant.

    Cost contract at 100 TB: greedy k-center is k-1 FULL PASSES over the
    corpus (one argmax aggregate per selected center, each returning ONE
    row to the driver) -- that is the algorithm, not this implementation;
    the input MUST be persisted for the duration (this function does so
    itself, see the repartition().persist() below) or every pass re-reads
    and re-decodes the source.  For k beyond a few hundred, switch to the
    coreset-of-coresets pattern: per-partition local k-centers first, then
    this exact pass over the k*partitions survivors."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).persist()
    try:
        vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        seed = df.orderBy(id_col).limit(1).select(id_col, vecd.alias("e")).collect()
        if not seed:
            return []
        centers = [(int(seed[0][0]), [float(x) for x in seed[0]["e"]])]
        m = 10 ** _Q
        for _ in range(k - 1):
            dmin2 = F.array_min(_dists(vecd, [c for _, c in centers]))
            q = F.floor(dmin2 * m + F.lit(0.5) + F.lit(1e-9)) / m
            row = (
                df.select(F.col(id_col), vecd.alias("e"), q.alias("q"))
                .orderBy(F.desc("q"), F.asc(id_col))
                .limit(1)
                .collect()
            )[0]
            if int(row[id_col]) in {cid for cid, _ in centers}:
                break  # fewer distinct vectors than k: center set saturated
            centers.append((int(row[id_col]), [float(x) for x in row["e"]]))
        return centers
    finally:
        df.unpersist()


def kcenter_fit_numpy(X, ids, k: int):
    """Sequential reference for :func:`kcenter_fit`: identical seed, an
    explicitly LEFT-FOLDED squared distance (per-dimension sequential
    accumulation, bit-identical to Spark's ``aggregate`` fold), the same
    6-decimal snap quantization of the selection metric, and the same
    lowest-id tie-break.  Used by :func:`oracle_emb_coreset_kcenter` to
    refit the center set independently at oracle-build time."""
    import numpy as np

    m = 10 ** _Q
    order = np.argsort(ids, kind="stable")
    X, ids = X[order], np.asarray(ids)[order]

    def d2_to(c):
        acc = np.zeros(len(X), dtype=np.float64)
        for i in range(X.shape[1]):  # left fold over dims, like the engine
            dd = X[:, i] - c[i]
            acc = acc + dd * dd
        return acc

    centers = [(int(ids[0]), X[0].astype(np.float64))]
    dmin = d2_to(X[0])
    for _ in range(k - 1):
        q = np.floor(dmin * m + 0.5 + 1e-9) / m
        j = int(np.argmax(q))  # argsorted ids: first max = lowest id
        if int(ids[j]) in {cid for cid, _ in centers}:
            break
        centers.append((int(ids[j]), X[j].astype(np.float64)))
        dmin = np.minimum(dmin, d2_to(X[j]))
    return centers


def emb_coreset_kcenter(spark, sf_dir: str, k: int = 16) -> DataFrame:
    """Gate query: k-center coreset over the embeddings table; one row per
    vector with its nearest center's selection rank, the center's vec_id,
    the distance, and an is_center flag -- the pruning decision table a
    diversity-subsampling pass consumes.

    Oracle-hash-checked via :func:`oracle_emb_coreset_kcenter` (independent
    numpy refit + DuckDB assignment over the spliced center literals);
    ``tests/test_kmeans.py`` additionally compares the distributed
    selection exactly against a sequential reference."""
    from flatterer_spark.queries import T, round_half_up

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    key = (id(spark), sf_dir, k, _emb_fingerprint(sf_dir))
    if key not in _kcenter_cache:
        _kcenter_cache[key] = kcenter_fit(emb, "embedding", "vec_id", k=k)
    centers = _kcenter_cache[key]
    if not centers:
        return spark.createDataFrame(
            [],
            "vec_id long, center_rank long, center_vec_id long, "
            "dist double, is_center long",
        )
    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dists = _dists(vecd, [c for _, c in centers])
    rank = (F.array_position(dists, F.array_min(dists)) - 1).cast("long")
    cid_book = _nested_lit([int(cid) for cid, _ in centers], "array<bigint>")
    center_ids = [cid for cid, _ in centers]
    wide = emb.repartition(spark.sparkContext.defaultParallelism)
    return (
        wide.select(
            "vec_id",
            rank.alias("center_rank"),
            F.element_at(cid_book, (rank + 1).cast("int"))
            .cast("long")
            .alias("center_vec_id"),
            round_half_up(F.sqrt(F.array_min(dists)), 4).alias("dist"),
            F.col("vec_id").isin(center_ids).cast("long").alias("is_center"),
        )
        # plain sort kept: A/B measured no win from checkpoint-then-sort
        # here (0.60 s vs 0.54-0.59 s) -- see _sorted_output
        .orderBy("vec_id")
    )


def oracle_emb_coreset_kcenter(k: int = 16, sf_dir: str | None = None) -> str:
    """DuckDB oracle for :func:`emb_coreset_kcenter`: the center set is
    refit by the independent sequential numpy pass at oracle-build time
    and spliced in as literals; DuckDB recomputes every vector's nearest
    center with the same left-fold distance (list_reduce) -- a drifted
    selection changes the literals and therefore every assignment, a
    broken assignment expression diverges from DuckDB's evaluation."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    ids = np.array(t["vec_id"].to_pylist())
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    centers = kcenter_fit_numpy(X, ids, k)
    dim = X.shape[1]
    rows = ",\n        ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            r, cid, ", ".join(repr(float(x)) for x in c)
        )
        for r, (cid, c) in enumerate(centers)
    )
    cid_list = ", ".join(str(cid) for cid, _ in centers)
    d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        "i -> (e[i] - c[i]) * (e[i] - c[i]))), (acc, x) -> acc + x)"
    )
    return f"""
    WITH ev AS (
        SELECT vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> CAST(embedding[i] AS DOUBLE)) AS e
        FROM embeddings
    ),
    cents(rnk, cid, c) AS (VALUES
        {rows}),
    d AS (SELECT vec_id, rnk, cid, {d2} AS d2 FROM ev CROSS JOIN cents),
    r AS (
        SELECT vec_id, rnk, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, rnk) AS rn
        FROM d
    )
    SELECT vec_id,
           CAST(rnk AS BIGINT) AS center_rank,
           CAST(cid AS BIGINT) AS center_vec_id,
           FLOOR(sqrt(d2) * 10000 + 0.5) / 10000 AS dist,
           CAST(CASE WHEN vec_id IN ({cid_list}) THEN 1 ELSE 0 END
                AS BIGINT) AS is_center
    FROM r WHERE rn = 1
    ORDER BY vec_id
    """


def _pq_assign_cols(vecd, books: list[list[list[float]]], sub: int):
    """Per-subspace (code, min-dist, subvector) column expressions."""
    code_cols, err_cols, sub_cols = [], [], []
    for j, book in enumerate(books):
        subv = F.slice(vecd, j * sub + 1, sub)
        dists = _dists(subv, book)
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
        err_cols.append(F.array_min(dists))
        sub_cols.append(subv)
    return code_cols, err_cols, sub_cols


def pq_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    k: int,
    iters: int,
) -> list[list[list[float]]]:
    """Train all m product-quantizer codebooks JOINTLY: subspaces never
    interact, so one stacked (subspace, code, dim) cell aggregation per
    iteration trains every codebook in a single job -- m-independent job
    count, unlike m sequential ``kmeans_fit`` runs.  Input repartitioned +
    persisted for the fit (see ``kmeans_fit``)."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism).persist()
    try:
        return _pq_fit_cached(df, vec_col, id_col, m, k, iters)
    finally:
        df.unpersist()


def _pq_fit_cached(df, vec_col, id_col, m, k, iters):
    seed = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if not seed:
        return []  # empty corpus: no codebooks (callers emit empty results)
    dim = len(seed[0][0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books = [
        [[_quant(float(x)) for x in r[0][j * sub : (j + 1) * sub]] for r in seed]
        for j in range(m)
    ]
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for it in range(iters):
        LAST_FIT_ITERS["pq"] = it + 1
        code_cols, _, sub_cols = _pq_assign_cols(vecd, books, sub)
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            code_cols[j].alias("cl"),
                            sub_cols[j].alias("sv"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s")
        )
        cells = (
            stacked.select("s.sub", "s.cl", F.posexplode("s.sv").alias("dim", "v"))
            .groupBy("sub", "cl", "dim")
            .agg(F.avg("v").alias("mean"))
            .collect()
        )
        new = [[list(c) for c in b] for b in books]
        for row in cells:
            new[row["sub"]][row["cl"]][row["dim"]] = _quant(row["mean"])
        if new == books:
            # exact fixed point under 6-dp quantization (see kmeans_fit):
            # remaining iterations would reproduce these books bit-for-bit,
            # so the early stop is result-invariant (VERDICT r8 #5) and
            # saves one stacked-cell job per skipped iteration -- the
            # dominant cost of emb_pq_codes (5.3 s bench, slope 3.51)
            break
        books = new
    return books


def pq_fit_numpy(X, m: int, k: int, iters: int):
    """Sequential PQ-codebook reference: same init / tie-break / snap-epsilon
    quantization as :func:`pq_fit` (see :func:`kmeans_fit_numpy`)."""
    import numpy as np

    mq = 10 ** _Q

    def q(a):
        return np.floor(a * mq + 0.5 + 1e-9) / mq

    dim = X.shape[1]
    assert dim % m == 0
    sub = dim // m
    books = [q(X[:k, j * sub : (j + 1) * sub].astype(np.float64)) for j in range(m)]
    for _ in range(iters):
        new = []
        for j in range(m):
            S = X[:, j * sub : (j + 1) * sub]
            d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            nb = books[j].copy()
            for c in range(k):
                mask = assign == c
                if mask.any():
                    nb[c] = q(S[mask].mean(axis=0))
            new.append(nb)
        books = new
    return books


def oracle_emb_pq_codes(
    m: int = 8, k: int = 16, iters: int = 2, sf_dir: str | None = None
) -> str:
    """DuckDB oracle SQL for :func:`pq_codes`, built like
    :func:`oracle_emb_kmeans`: independent numpy codebook refit at
    oracle-build time, codebook literals spliced in, per-subspace
    nearest-code encode + quantization error computed in DuckDB.  The fold
    orders (per-subspace left fold over dims; total error as a left fold
    over subspaces in order) match the Spark expressions bit-for-bit."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    dim = X.shape[1]
    sub = dim // m
    books = pq_fit_numpy(X, m, k, iters)
    rows = ",\n        ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            j, c, ", ".join(repr(float(x)) for x in books[j][c])
        )
        for j in range(m)
        for c in range(k)
    )
    d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), "
        f"i -> (e[sub * {sub} + i] - c[i]) * (e[sub * {sub} + i] - c[i]))), "
        "(acc, x) -> acc + x)"
    )
    return f"""
    WITH ev AS (
        SELECT vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> CAST(embedding[i] AS DOUBLE)) AS e
        FROM embeddings
    ),
    books(sub, code, c) AS (VALUES
        {rows}),
    d AS (SELECT vec_id, sub, code, {d2} AS d2 FROM ev CROSS JOIN books),
    best AS (
        SELECT vec_id, sub, code, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2, code) AS rn
        FROM d
    ),
    enc AS (
        SELECT vec_id,
               string_agg(CAST(code AS VARCHAR), '.' ORDER BY sub) AS codes,
               list(d2 ORDER BY sub) AS errs
        FROM best WHERE rn = 1 GROUP BY vec_id
    )
    SELECT vec_id, codes,
           FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), errs),
                             (a, b) -> a + b) * 10000 + 0.5) / 10000
               AS quant_err2
    FROM enc ORDER BY vec_id
    """


def pq_codes(
    spark,
    sf_dir: str,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Gate query: product-quantization codes (Jegou et al. 2011).

    The vector is split into ``m`` contiguous subspaces; each subspace gets
    its own k-means codebook, and every vector is encoded as its
    per-subspace nearest-code indexes -- the memory layout IVF-PQ ANN
    search uses at 100 TB scale (codes are m small ints instead of d
    floats).  Also reports the total quantization error so the gate row is
    sensitive to codebook drift.

    Training is one stacked cell aggregation per iteration for ALL
    codebooks (``pq_fit``); encoding is a single map-only projection.  No
    data shuffle anywhere beyond the tiny per-iteration cell rollup.
    Oracle-hash-checked at the gate via :func:`oracle_emb_pq_codes`;
    ``tests/test_kmeans.py`` additionally checks codes and errors against
    numpy end-to-end.
    """
    from flatterer_spark.operators.model_store import load_or_train
    from flatterer_spark.queries import T, round_half_up

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    books = load_or_train(
        spark, "pq_codebooks", {"m": m, "k": k, "iters": iters}, sf_dir,
        "embeddings",
        lambda: pq_fit(emb, "embedding", "vec_id", m=m, k=k, iters=iters),
    )
    if not books:  # empty corpus
        return spark.createDataFrame(
            [], "vec_id long, codes string, quant_err2 double"
        )
    sub = len(books[0][0])

    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    code_cols, err_cols, _ = _pq_assign_cols(vecd, books, sub)
    total_err = err_cols[0]
    for e in err_cols[1:]:
        total_err = total_err + e
    # codes as a dot-joined string, not an array: the gate's value-hash
    # stringifies via pandas, where a Spark list and a DuckDB numpy array
    # repr differently (same reason emb_quantize emits checksums)
    return _sorted_output(
        emb.select(
            "vec_id",
            F.concat_ws(".", *[c.cast("string") for c in code_cols]).alias(
                "codes"
            ),
            round_half_up(total_err, 4).alias("quant_err2"),
        ),
        "vec_id",
    )


#: Trained (centroids, codebooks) per (session, data fingerprint, params).
#: IVF-PQ is a train-once / search-many index: production builds the model
#: in a nightly job and every search reuses it, so the steady-state cost of
#: this query IS the search path.  The cache key includes the embeddings
#: parquet mtime+size fingerprint (same invalidation rule as curation's
#: label cache), so regenerated testdata retrains instead of serving a
#: stale model.  ``clear_ivfpq_cache()`` forces a retrain.
_model_cache: dict[tuple, tuple] = {}


def _emb_fingerprint(sf_dir: str) -> tuple:
    from flatterer_spark.functions.fingerprint import table_fingerprint

    return table_fingerprint(sf_dir, "embeddings")


def clear_ivfpq_cache() -> None:
    _model_cache.clear()


def _ivfpq_model(spark, sf_dir, emb, cells, nprobe, m, kc):
    from flatterer_spark.operators.model_store import load_or_train, store_dir

    # When a persisted store is armed it IS the cache: bypass the
    # in-session memo so an external write or compaction during the
    # session is never shadowed by a stale memo (VERDICT r10 Next #4b) --
    # a store probe is one few-KB parquet scan, negligible next to the
    # search.  Unarmed sessions keep the memo (train-once per session).
    key = (id(spark), sf_dir, cells, m, kc, _emb_fingerprint(sf_dir))
    if store_dir() is None and key in _model_cache:
        return _model_cache[key]

    def _fit():
        cents = kmeans_fit(emb, "embedding", "vec_id", k=cells, iters=3)
        if not cents:  # empty corpus: a [[], []] pair is a truthy
            return []  # non-model -- return the canonical empty instead
        books = pq_fit(emb, "embedding", "vec_id", m=m, k=kc, iters=2)
        return [cents, books] if books else []

    model = load_or_train(
        spark, "ivfpq_model", {"cells": cells, "m": m, "kc": kc},
        sf_dir, "embeddings", _fit,
    )
    cents, books = model if model else ([], [])
    _model_cache[key] = (cents, books)
    return _model_cache[key]


def sim_topk_ivfpq(
    spark,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    kc: int = 16,
    rerank: int = 30,
) -> DataFrame:
    """Gate query: learned IVF-PQ ANN top-k (the 100 TB ANN architecture).

    The full production shape, end to end: a k-means coarse quantizer
    partitions the corpus into ``cells`` inverted lists; a product
    quantizer compresses every vector to ``m`` small-int codes; each query
    probes its ``nprobe`` nearest cells, scores ONLY those candidates by
    asymmetric distance (query-to-codeword, computed from the PQ codes --
    the corpus vectors are never touched), keeps the best ``rerank`` and
    re-ranks just those against the true vectors.  ``sim_topk_ivf`` is the
    flat-cell variant with fixed centroids (oracle-matchable);
    this one uses LEARNED centroids + codebooks, so it is rows-only at the
    gate and ``tests/test_kmeans.py`` pins recall against brute force.

    Scale shape: corpus shuffles ONCE on cell id; the probe list
    (n_queries x nprobe rows, each carrying its query vector) broadcasts;
    ADC is one JVM fold expression over the constant-folded codebook --
    no Python, no cross join, and the scored fraction is ~nprobe/cells of
    the corpus.  Embeddings are unit-norm (verified in tests), so argmin
    L2 == argmax cosine and the output ranks by exact cosine like the
    other sim_topk_* queries.

    The trained model is cached per (session, data fingerprint): IVF-PQ is
    a train-once / search-many index, so repeat invocations (and the
    bench's steady-state timing) measure the search path against the
    prebuilt model -- the production workload -- while any data change
    forces a retrain (see ``_model_cache``).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flatterer_spark.queries import T, round_half_up

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents, books = _ivfpq_model(spark, sf_dir, emb, cells, nprobe, m, kc)
    if not cents or not books:  # empty corpus
        return spark.createDataFrame(
            [], "query_id long, rnk long, neighbor_id long, cosine double"
        )
    sub = len(books[0][0])

    vecd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cell_dists = _dists(vecd, cents)
    code_cols, _, _ = _pq_assign_cols(vecd, books, sub)
    # PQ memory posture: the candidate path carries ONLY (vec_id, cell,
    # codes) -- m small ints instead of d floats.  The full vector is NOT
    # projected here; the exact re-rank joins the tiny shortlist back to the
    # embeddings table by vec_id instead (ADVICE r4: the previous version
    # shipped `vec` through the cell join and ADC shuffle, contradicting the
    # stated posture).
    corpus = emb.repartition(spark.sparkContext.defaultParallelism).select(
        "vec_id",
        (F.array_position(cell_dists, F.array_min(cell_dists)) - 1)
        .cast("int")
        .alias("cell"),
        F.array(*code_cols).alias("codes"),
    )

    # nprobe nearest cells per query: sort (dist, idx) structs, take indexes
    probe_idx = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    cell_dists,
                    F.transform(F.sequence(F.lit(0), F.lit(cells - 1)), lambda i: i.cast("double")),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s["i"].cast("int"),
        ),
        1,
        nprobe,
    )
    probes = (
        emb.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            vecd.alias("qvec"),
            F.explode(probe_idx).alias("cell"),
        )
    )

    # candidates: equi-join on cell; ADC = sum_j ||q_sub_j - book_j[code_j]||^2
    # single 3-level constant, one py4j call -- see _nested_lit
    book_lit = _nested_lit(
        [[[float(x) for x in c] for c in bk] for bk in books],
        "array<array<array<double>>>",
    )
    qv = F.col("qvec")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.aggregate(
            F.zip_with(
                F.slice(qv, j * sub + 1, sub),
                F.element_at(
                    F.element_at(book_lit, j + 1),
                    F.element_at(F.col("codes"), j + 1) + 1,
                ),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, d: a + d,
        ),
    )
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qvec", adc.alias("approx_d2"))
    )
    wa = Window.partitionBy("query_id").orderBy("approx_d2", "vec_id")
    short = cand.withColumn("arn", F.row_number().over(wa)).where(
        F.col("arn") <= rerank
    )

    # exact re-rank of the shortlist only: fetch true vectors for just the
    # n_queries x rerank shortlist rows via a broadcast join back to the
    # embeddings table (map-side lookup; the corpus never ships vectors)
    short = emb.select("vec_id", vecd.alias("vec")).join(
        F.broadcast(short), "vec_id"
    )
    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )

    # denominator floored at 1e-30: a zero vector otherwise crashes Spark
    # (ANSI DIVIDE_BY_ZERO) while DuckDB yields inf -- same guard as the
    # ext_queries norm CTEs; zero vectors score ~0 (no direction)
    cos = _dot(F.col("qvec"), F.col("vec")) / F.greatest(
        F.sqrt(_dot(F.col("qvec"), F.col("qvec")))
        * F.sqrt(_dot(F.col("vec"), F.col("vec"))),
        F.lit(1e-30),
    )
    we = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        short.withColumn("cos", cos)
        .withColumn("rnk", F.row_number().over(we).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "rnk",
            F.col("vec_id").alias("neighbor_id"),
            round_half_up(F.col("cos")).alias("cosine"),
        )
        .orderBy("query_id", "rnk")
    )


def oracle_sim_topk_ivfpq(
    n_queries: int = 10,
    k: int = 5,
    cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    kc: int = 16,
    rerank: int = 30,
    sf_dir: str | None = None,
) -> str:
    """DuckDB oracle SQL for :func:`sim_topk_ivfpq` -- the full IVF-PQ
    search path replayed in an independent engine.

    Built like :func:`oracle_emb_kmeans`: both learned models (coarse
    centroids, PQ codebooks) are refit from the same parquet by the
    sequential numpy references at oracle-BUILD time and spliced in as
    literals; DuckDB then recomputes EVERY stage of the search from those
    literals -- corpus cell assignment, PQ encode, per-query nprobe probe
    selection, asymmetric-distance scoring of the probed candidates, the
    ``rerank``-row shortlist, and the exact-cosine re-rank.  The gate hash
    is sensitive to (a) model drift in the distributed fit (bit-determinism
    argument, module docstring), (b) any divergence in the Spark
    assignment/encode/ADC expressions, and (c) shortlist/ranking tie
    discipline.  Every float fold mirrors the Spark expression's left-fold
    order bit-for-bit (dims in order within a subspace; subspaces in
    order), and all tie-breaks are (distance, index) ascending, so the two
    engines agree exactly, not just approximately.
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_by("vec_id")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    dim = X.shape[1]
    sub = dim // m
    cents = kmeans_fit_numpy(X, cells, 3)       # _ivfpq_model: iters=3
    books = pq_fit_numpy(X, m, kc, 2)           # _ivfpq_model: iters=2

    cent_rows = ",\n        ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in c)
        )
        for j, c in enumerate(cents)
    )
    book_rows = ",\n        ".join(
        "({}, {}, [{}]::DOUBLE[])".format(
            j, c, ", ".join(repr(float(x)) for x in books[j][c])
        )
        for j in range(m)
        for c in range(kc)
    )
    # the full m x kc x sub codebook as ONE nested literal for the ADC
    # lookup-by-code (mirrors Spark's constant-folded book_lit)
    bl = "[{}]::DOUBLE[][][]".format(
        ", ".join(
            "[{}]".format(
                ", ".join(
                    "[{}]".format(", ".join(repr(float(x)) for x in c))
                    for c in bk
                )
            )
            for bk in books
        )
    )
    cell_d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        "i -> (e[i] - c[i]) * (e[i] - c[i]))), (acc, x) -> acc + x)"
    )
    sub_d2 = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), "
        f"i -> (e[sub * {sub} + i] - bc[i]) * (e[sub * {sub} + i] - bc[i]))), "
        "(acc, x) -> acc + x)"
    )
    # ADC: outer left fold over subspaces of an inner left fold over the
    # subspace dims -- identical nesting and order to the Spark expression
    adc = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {m}), j -> "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {sub}), s -> "
        f"(q[(j-1) * {sub} + s] - b[j][codes[j] + 1][s]) "
        f"* (q[(j-1) * {sub} + s] - b[j][codes[j] + 1][s]))), "
        "(acc, x) -> acc + x))), (acc, x) -> acc + x)"
    )

    def dot(a, bb):
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> {a}[i] * {bb}[i])), (acc, x) -> acc + x)"
        )

    return f"""
    WITH ev AS (
        SELECT vec_id,
               list_transform(generate_series(1, {dim}),
                              i -> CAST(embedding[i] AS DOUBLE)) AS e
        FROM embeddings
    ),
    cents(cell, c) AS (VALUES
        {cent_rows}),
    cd AS (SELECT vec_id, cell, {cell_d2} AS d2 FROM ev CROSS JOIN cents),
    corpus_cell AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cell) AS rn
            FROM cd) WHERE rn = 1
    ),
    books(sub, code, bc) AS (VALUES
        {book_rows}),
    bd AS (SELECT vec_id, sub, code, {sub_d2} AS d2 FROM ev CROSS JOIN books),
    codes_t AS (
        SELECT vec_id, list(code ORDER BY sub) AS codes FROM (
            SELECT vec_id, sub, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY d2, code) AS rn
            FROM bd) WHERE rn = 1 GROUP BY vec_id
    ),
    probes AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cell) AS rn
            FROM cd WHERE vec_id < {n_queries}) WHERE rn <= {nprobe}
    ),
    qv AS (SELECT vec_id AS query_id, e AS q FROM ev
           WHERE vec_id < {n_queries}),
    bl_t(b) AS (VALUES ({bl})),
    cand AS (
        SELECT p.query_id, cc.vec_id, {adc} AS approx_d2
        FROM probes p
        JOIN corpus_cell cc ON cc.cell = p.cell
        JOIN qv ON qv.query_id = p.query_id
        JOIN codes_t co ON co.vec_id = cc.vec_id
        CROSS JOIN bl_t
        WHERE cc.vec_id <> p.query_id
    ),
    shortl AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_d2, vec_id) AS arn
            FROM cand) WHERE arn <= {rerank}
    ),
    rer AS (
        SELECT s.query_id, s.vec_id,
               {dot('q', 'e')} / greatest(sqrt({dot('q', 'q')})
                                          * sqrt({dot('e', 'e')}),
                                          CAST(1e-30 AS DOUBLE)) AS cos
        FROM shortl s
        JOIN qv ON qv.query_id = s.query_id
        JOIN ev ON ev.vec_id = s.vec_id
    )
    SELECT query_id, rnk, vec_id AS neighbor_id,
           FLOOR(cos * 100 + 0.5) / 100 AS cosine
    FROM (
        SELECT query_id, vec_id, cos,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, vec_id) AS BIGINT)
                   AS rnk
        FROM rer)
    WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """

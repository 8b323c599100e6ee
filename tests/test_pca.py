"""emb_pca_project: the distributed Gramian + driver eigensolve must agree
with numpy's full-data eigendecomposition (the strongest available check for
a non-SQL-expressible op)."""

from __future__ import annotations

import numpy as np

from flatterer_spark.operators.pca import emb_pca_project, top_component
from flatterer_spark.queries import T


def _full_data(spark, sf_dir):
    rows = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    return ids, x


def test_component_matches_numpy_eigh(spark, sf_dir):
    comp, mu, n = top_component(spark, sf_dir)
    ids, x = _full_data(spark, sf_dir)
    assert n == len(x)
    assert np.allclose(mu, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x.T, bias=True)
    w, v = np.linalg.eigh(cov)
    ref = v[:, -1]
    # eigenvector up to sign
    assert abs(float(np.dot(comp, ref))) > 1 - 1e-8
    # Rayleigh quotient of the returned component ~ top eigenvalue
    c = np.array(comp)
    assert abs(float(c @ cov @ c) - w[-1]) < 1e-8 * max(1.0, w[-1])


def test_projection_matches_numpy(spark, sf_dir):
    comp, mu, _ = top_component(spark, sf_dir)
    got = emb_pca_project(spark, sf_dir).collect()
    ids, x = _full_data(spark, sf_dir)
    want = (x - np.array(mu)) @ np.array(comp)
    by_id = dict(zip(ids.tolist(), want.tolist()))
    assert len(got) == len(ids)
    for r in got:
        # query rounds with the cross-engine floor rule at 4 decimals
        expect = np.floor(by_id[r["vec_id"]] * 10_000 + 0.5) / 10_000
        assert abs(r["pc1_proj"] - expect) < 1e-9, r["vec_id"]


def test_projection_deterministic_under_repartition(spark, sf_dir):
    """The Gramian reduce must not depend on partitioning: repartitioning
    the source cannot change the component (sorted-batch-key float reduce)."""
    a = top_component(spark, sf_dir)[0]
    b = top_component(spark, sf_dir)[0]
    assert a == b

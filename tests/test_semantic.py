"""SemDeDup / outlier-pruning semantics: the Spark results must match an
independent numpy reference (cluster assignment, within-cluster cosine
graph, greedy keep-first dups, mean+2*stddev outlier cut).  The generic
oracle-hash test in test_ext_queries.py checks Spark vs DuckDB; this file
checks both against a third implementation that shares no SQL."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def ref(sf_dir):
    """Numpy reference: assignments, within-cluster cosines, outlier cuts."""
    from flatterer_spark.operators.kmeans import kmeans_fit_numpy

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = np.array(t["vec_id"].to_pylist())
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cents = np.array(kmeans_fit_numpy(X, 10, 5))
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    asg = d2.argmin(axis=1)
    dist = np.sqrt(d2.min(axis=1))
    nrm = np.maximum(np.linalg.norm(X, axis=1), 1e-30)
    Xn = X / nrm[:, None]
    return ids, Xn, asg, dist


def test_dedup_semantic_matches_numpy(spark, sf_dir, ref):
    from flatterer_spark.ext_queries import EXT_QUERIES

    ids, Xn, asg, _ = ref
    thr = 0.35
    expect_dup = set()
    expect_nclose = {}
    for j in range(10):
        idx = np.where(asg == j)[0]
        S = Xn[idx] @ Xn[idx].T
        Sq = np.floor(S * 1e6 + 0.5) / 1e6  # engine rounding discipline
        for a in range(len(idx)):
            close = [b for b in range(a) if Sq[a, b] >= thr]
            if close:
                expect_dup.add(int(ids[idx[a]]))
            expect_nclose[int(ids[idx[a]])] = len(close)
    rows = EXT_QUERIES["dedup_semantic"](spark, sf_dir).collect()
    assert len(rows) == len(ids)
    got_dup = {r.vec_id for r in rows if r.is_dup == 1}
    assert got_dup == expect_dup
    for r in rows:
        assert r.n_close == expect_nclose[r.vec_id], r
        assert (r.is_dup == 1) == (r.n_close > 0)
        if r.n_close == 0:
            assert r.max_close_cos == -1.0
        else:
            assert r.max_close_cos >= thr
    assert got_dup, "degenerate: threshold flags nothing at this sf"
    assert len(got_dup) < len(ids), "degenerate: threshold flags everything"


def test_emb_outliers_matches_numpy(spark, sf_dir, ref):
    from flatterer_spark.ext_queries import EXT_QUERIES

    ids, _, asg, dist = ref
    distq = np.floor(dist * 1e4 + 0.5) / 1e4
    expect = {}
    for j in range(10):
        idx = np.where(asg == j)[0]
        d = distq[idx]
        cut = (
            np.floor((d.mean() + 2 * d.std(ddof=1)) * 1e4 + 0.5) / 1e4
            if len(d) > 1
            else None
        )
        for i in idx:
            expect[int(ids[i])] = cut is not None and distq[i] > cut
    rows = EXT_QUERIES["emb_outliers"](spark, sf_dir).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert (r.is_outlier == 1) == expect[r.vec_id], r
    n_out = sum(r.is_outlier for r in rows)
    assert 0 < n_out < len(ids) * 0.2, n_out  # 2-sigma tail, not degenerate


def test_dedup_semantic_pairs_join_is_cluster_equi_join(spark, sf_dir):
    """The within-cluster pair join must be an equi-join on the cluster id
    (the SemDeDup n^2 -> sum(n_c^2) reduction); the only nested-loop joins
    allowed are the k-row centroid literal broadcast and scalar cutpoints."""
    from flatterer_spark.ext_queries import EXT_QUERIES
    from tests.conftest import plan_of as _plan

    plan = _plan(EXT_QUERIES["dedup_semantic"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "cluster" in plan  # the equi-join key survives to the plan
    assert any(
        op in plan
        for op in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )

"""Distributed k-means / PQ vs a sequential numpy reference.

The Spark implementation quantizes every updated centroid coordinate to 6
decimals (operators/kmeans.py module docstring), which makes the model --
and therefore every assignment -- bit-deterministic under any partitioning.
The reference below applies the identical quantization, so the comparison
is EXACT equality, not tolerance-based.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from flatterer_spark.operators import kmeans as K


def _quant(a: np.ndarray) -> np.ndarray:
    # identical snap-epsilon to operators/kmeans.py::_quant (boundary cases
    # resolve the same way on both sides -- see its "Bit-determinism" notes)
    return np.floor(a * 1e6 + 0.5 + 1e-9) / 1e6


def _ref_kmeans(X: np.ndarray, k: int, iters: int):
    """Sequential Lloyd with first-k init and 6-decimal quantization."""
    cents = _quant(X[:k].astype(np.float64))
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin: first index wins ties, like Spark
        new = cents.copy()
        for j in range(k):
            mask = assign == j
            if mask.any():
                new[j] = _quant(X[mask].mean(axis=0))
        cents = new
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d2.argmin(axis=1), d2.min(axis=1)


@pytest.fixture(scope="module")
def X(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
    return np.array(t["embedding"].to_pylist(), dtype=np.float64)


def test_kmeans_matches_numpy_reference(spark, sf_dir, X):
    k, iters = 10, 5
    cents, ref_assign, ref_d2 = _ref_kmeans(X, k, iters)

    out = K.emb_kmeans(spark, sf_dir, k=k, iters=iters).collect()
    got_assign = np.array([r["cluster"] for r in out])
    got_dist = np.array([r["dist"] for r in out])

    assert (got_assign == ref_assign).all(), (
        f"{(got_assign != ref_assign).sum()} of {len(X)} assignments differ"
    )
    ref_dist = np.floor(np.sqrt(ref_d2) * 1e4 + 0.5) / 1e4
    assert np.array_equal(got_dist, ref_dist)


def test_kmeans_fit_partitioning_invariant(spark, sf_dir):
    """The quantized model must be identical however the data is split."""
    from flatterer_spark.queries import T

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = K.kmeans_fit(emb.repartition(1), "embedding", "vec_id", k=5, iters=3)
    b = K.kmeans_fit(emb.repartition(13), "embedding", "vec_id", k=5, iters=3)
    assert a == b


def test_kmeans_clusters_nondegenerate(spark, sf_dir, X):
    """The fitted model must actually separate the data: more than one
    cluster in use, and mean distance below the global-centroid baseline."""
    out = K.emb_kmeans(spark, sf_dir, k=10, iters=5).collect()
    clusters = {r["cluster"] for r in out}
    assert len(clusters) >= 5
    mean_d = sum(r["dist"] for r in out) / len(out)
    global_c = X.mean(axis=0)
    baseline = float(np.sqrt(((X - global_c) ** 2).sum(axis=1)).mean())
    assert mean_d < baseline


def test_pq_codes_match_numpy_reference(spark, sf_dir, X):
    m, k, iters = 8, 16, 3
    sub = X.shape[1] // m
    out = K.pq_codes(spark, sf_dir, m=m, k=k, iters=iters).collect()
    # codes are a dot-joined string (the gate hash can't compare arrays)
    got_codes = np.array([[int(c) for c in r["codes"].split(".")] for r in out])
    got_err = np.array([r["quant_err2"] for r in out])

    ref_codes = np.empty((len(X), m), dtype=int)
    ref_err = np.zeros(len(X))
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        cents, assign, d2 = _ref_kmeans(Xj, k, iters)
        ref_codes[:, j] = assign
        ref_err += d2
    assert (got_codes == ref_codes).all()
    ref_err_r = np.floor(ref_err * 1e4 + 0.5) / 1e4
    # quant_err2 sums m already-exact doubles in fixed expression order on
    # both sides; compare after the shared rounding
    assert np.allclose(got_err, ref_err_r, atol=1e-9)


def test_pq_codes_compress_losslessly_enough(spark, sf_dir, X):
    """PQ reconstruction error must be far below vector energy (the codes
    carry signal, not noise)."""
    out = K.pq_codes(spark, sf_dir).collect()
    mean_err = sum(r["quant_err2"] for r in out) / len(out)
    energy = float((X ** 2).sum(axis=1).mean())
    # unit-norm synthetic embeddings quantize to ~0.56x energy with 16 codes
    # per 8-dim subspace; random codebooks would sit well above 1.0x
    assert mean_err < 0.8 * energy


def test_kcenter_matches_sequential_reference(spark, sf_dir, X):
    """The distributed greedy k-center selection must pick EXACTLY the
    same centers, in the same order, as a sequential reference (this is a
    third copy, independent of kcenter_fit_numpy which feeds the oracle):
    left-folded distances, 6-decimal snap quantization of the selection
    metric, lowest-id tie-break."""
    k = 16
    got = K.kcenter_fit(
        _emb_df(spark, sf_dir), "embedding", "vec_id", k=k
    )

    ids = np.arange(len(X))
    centers = [(0, X[0])]
    acc = np.zeros(len(X))
    for i in range(X.shape[1]):
        dd = X[:, i] - X[0][i]
        acc = acc + dd * dd
    dmin = acc
    for _ in range(k - 1):
        q = np.floor(dmin * 1e6 + 0.5 + 1e-9) / 1e6
        j = int(np.argmax(q))
        if int(ids[j]) in {c for c, _ in centers}:
            break
        centers.append((int(ids[j]), X[j]))
        acc = np.zeros(len(X))
        for i in range(X.shape[1]):
            dd = X[:, i] - X[j][i]
            acc = acc + dd * dd
        dmin = np.minimum(dmin, acc)

    assert [cid for cid, _ in got] == [cid for cid, _ in centers]
    for (gc, gv), (rc, rv) in zip(got, centers):
        assert gv == [float(x) for x in rv], gc


def test_kcenter_covering_radius_shrinks(spark, sf_dir):
    """More centers can only shrink (never grow) the covering radius --
    the monotonicity that makes greedy k-center a 2-approximation of the
    optimal coreset."""
    out8 = K.emb_coreset_kcenter(spark, sf_dir, k=8).collect()
    out16 = K.emb_coreset_kcenter(spark, sf_dir, k=16).collect()
    assert max(r["dist"] for r in out16) <= max(r["dist"] for r in out8)
    assert sum(r["is_center"] for r in out16) == 16


def _emb_df(spark, sf_dir):
    from flatterer_spark.queries import T

    return T(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir, X):
    """IVF-PQ approximate top-k must substantially agree with exact
    brute-force top-k (recall pinned well above chance; chance at nprobe=4
    of 16 cells is ~0.25)."""
    k = 5
    out = K.sim_topk_ivfpq(spark, sf_dir, n_queries=10, k=k).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    hits = total = 0
    for q in range(10):
        cos = Xn @ Xn[q]
        cos[q] = -2.0
        # exact top-k with the same (cos desc, id asc) tie order
        order = np.lexsort((np.arange(len(cos)), -cos))
        exact = set(order[:k].tolist())
        hits += len(exact & got.get(q, set()))
        total += k
    recall = hits / total
    assert recall >= 0.5, f"recall@{k} = {recall}"


def test_early_stop_is_result_invariant(spark):
    """The quantized-fixed-point early stop (VERDICT r8 #5): on a corpus
    that converges before the iteration cap, fitting with a much larger
    cap returns bit-identical centroids/codebooks -- the stop is a pure
    job saver, never a model change.  (At sf0.1 the embeddings never
    freeze at 6 dp within 12 iterations -- movement 0.19 -> 0.0096 while
    quantization error falls 0.775 -> 0.582 with 98% of that by iter 5 --
    so there the cap of 5 is load-bearing and the early stop simply never
    fires; recorded in COVERAGE.md round 9.)"""
    import pyspark.sql.functions as F

    # 3 exactly-repeated points: Lloyd reaches its fixed point at iter 1
    pts = [[0.0, 0.0, 1.0, 1.0], [4.0, 4.0, 5.0, 5.0], [9.0, 9.0, 8.0, 8.0]]
    rows = [(i, pts[i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c2 = K.kmeans_fit(df, "embedding", "vec_id", k=3, iters=2)
    c50 = K.kmeans_fit(df, "embedding", "vec_id", k=3, iters=50)
    assert c2 == c50
    b2 = K.pq_fit(df, "embedding", "vec_id", m=2, k=3, iters=2)
    b50 = K.pq_fit(df, "embedding", "vec_id", m=2, k=3, iters=50)
    assert b2 == b50

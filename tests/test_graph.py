"""Connected-components operator: correctness vs a driver-side union-find
and the O(log n) convergence-rate contract on an adversarial path graph."""

from __future__ import annotations

import random

import pytest

from flatterer_spark.operators.graph import (
    connected_components,
    connected_components_with_rounds,
)


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for members in comp.values() for i in members}


def test_path_graph_converges_in_log_rounds(spark):
    """A 50-edge path (diameter 50) is the adversarial case for per-round
    label propagation (50 rounds); star contraction must finish in O(log n)."""
    edges = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(edges, "a long, b long")
    labels, rounds = connected_components_with_rounds(df)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(51)}
    assert rounds <= 10, f"path graph took {rounds} rounds (want O(log n))"


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    ids = list(range(200))
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    touched = sorted({x for e in edges for x in e})
    expected = _union_find(touched, edges)

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected


def test_two_components_and_self_loops(spark):
    edges = [(1, 2), (2, 3), (10, 11), (11, 10), (5, 5)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    # self-loop-only node 5 carries no merge decision and is dropped
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir= switches per-round lineage truncation to reliable
    checkpoint() -- same labels, and RDD checkpoint files actually land in
    the directory (cluster fault-tolerance path, VERDICT r3 #6)."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = [(i, i + 1) for i in range(20)] + [(100, 101)]
    df = spark.createDataFrame(edges, "a long, b long")
    labels = connected_components(df, checkpoint_dir=ckpt)
    got = {r["id"]: r["component"] for r in labels.collect()}
    expected = {i: 0 for i in range(21)}
    expected.update({100: 100, 101: 100})
    assert got == expected
    # reliable checkpoints materialized on disk
    walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert walked, "no reliable checkpoint files written"

"""Driver-surface smoke tests: the two interfaces the round driver consumes
(__spark_entry__.py loaded BY PATH, and bench.py as a subprocess) must work
in exactly the driver's conditions.

Round 2's only regression broke every events consumer AND crashed the bench
outright -- and the package-import pytest suite alone could not have caught
two driver-specific failure classes:

 - path-load pickling: when __spark_entry__ is loaded via
   importlib.spec_from_file_location (no package on sys.path for executor
   workers), any mapInPandas/applyInPandas closure that references a
   module-level flatterer_spark function serializes by reference and dies on
   the executors.  Tests importing the package normally never see this.
 - bench harness rot: BENCH_r02.json was rc=1/parsed-null; a parse check on
   a real bench run would have flagged it at test time.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

# Representative set: one per executor-side-Python family (mapInPandas /
# applyInPandas paths are where path-load pickling breaks), plus one plain
# SQL query per table family.
SMOKE_QUERIES = [
    "q01_filter_project",
    "q27_sessionize",
    "mm_embed_stub",        # mapInPandas
    "dedup_embedding",      # applyInPandas block-pair BLAS
    "dedup_cluster",        # iterative driver loop + localCheckpoint
    "stream_flatten_child",  # streaming flatten (mapInPandas position tagger)
    "emb_kmeans",           # iterative driver-model loop (collect per iter)
]


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_test__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_window_covers_unverified_queries(entry_mod):
    """The driver's CORRECTNESS gate checks only the first GATE_WINDOW (=50)
    registry entries in insertion order.  Round 3 proved this can rot
    silently: 23 of 73 registered queries fell past the window and got no
    driver row.  Pin the registry's LRU ordering: every query lacking a green
    row in the latest CORRECTNESS_r*.json must sit inside the window, and the
    never-verified backlog must never exceed the window itself."""
    import glob
    import re

    from flatterer_spark.registry import (
        DEFER_WHILE_LATEST_LE,
        GATE_WINDOW,
        actively_deferred,
        last_green_round,
        latest_recorded_round,
    )

    keys = list(entry_mod.queries())
    front = set(keys[:GATE_WINDOW])
    deferred = actively_deferred()

    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    assert files, "driver correctness files missing"
    latest = set(json.load(open(files[-1])))
    lacking_latest_row = [k for k in keys if k not in latest]
    stranded = [k for k in lacking_latest_row if k not in front and k not in deferred]
    assert not stranded, (
        f"queries with no row in {os.path.basename(files[-1])} sit past the "
        f"driver's {GATE_WINDOW}-row gate window: {stranded}"
    )

    never_green = [k for k in keys if k not in last_green_round()]
    undeferred_never_green = [k for k in never_green if k not in deferred]
    assert len(undeferred_never_green) <= GATE_WINDOW, (
        f"{len(undeferred_never_green)} never-verified queries exceed the "
        f"{GATE_WINDOW}-row window; some cannot be gated this round"
    )
    assert set(undeferred_never_green) <= front

    # Deferrals must self-expire: every deferral round must already be
    # recorded (<= the latest correctness file), so one more driver run
    # flips each entry into the never-verified front of the window.  A
    # deferral round in the future would strand its query indefinitely.
    assert all(
        rnd <= latest_recorded_round() for rnd in DEFER_WHILE_LATEST_LE.values()
    ), "deferral round is ahead of the latest recorded correctness round"

    # Every deferral name must be a registered query: a typo here would
    # silently no-op while the real (undeferred) query evicts a demanded
    # re-verification from the window.
    unknown = set(DEFER_WHILE_LATEST_LE) - set(keys)
    assert not unknown, f"deferral names not in the registry: {unknown}"


def test_entry_contract_shape(entry_mod, spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle key must have a query; rows-only queries may lack oracles
    assert set(oracles) <= set(qs)
    df = entry_mod.entry(spark)
    assert df.count() >= 0 and len(df.schema) > 0


@pytest.mark.parametrize("name", SMOKE_QUERIES)
def test_path_loaded_queries_execute(entry_mod, spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0


def test_bench_parses_as_one_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = SF
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert lines, f"no JSON line in bench output: {out.stdout[-500:]}"
    parsed = json.loads(lines[-1])
    assert parsed["unit"] == "sec" and parsed["queries"]
    assert all(v >= 0 for v in parsed["queries"].values())


def test_gate_ordering_unit_semantics():
    """The rotation's sort semantics, pinned directly: (1) never-green
    undeferred first, in registration order; (2) then green names by
    staleness (oldest round first); (3) actively-deferred never-green dead
    last; (4) a deferred name that HAS a green row rejoins normal LRU."""
    from flatterer_spark.registry import _gate_ordered

    full = {k: k for k in ["a", "b", "c", "d", "e", "f"]}
    last = {"b": 2, "c": 1, "e": 3, "f": 1}
    # a, d never green; d deferred; f deferred-but-green
    out = list(
        _gate_ordered(full, last=last, deferred={"d"})
    )
    assert out == [
        "a",          # never-green, undeferred
        "c", "f",     # stalest green (round 1), registration order
        "b",          # round 2
        "e",          # round 3
        "d",          # deferred never-green: last
    ]


def test_active_deferral_expires_with_new_round(tmp_path):
    """actively_deferred() keys off the latest recorded round: once a newer
    correctness file lands, deferral ends even without a green row."""
    import json

    from flatterer_spark.registry import (
        DEFER_WHILE_LATEST_LE,
        actively_deferred,
    )

    name = next(iter(DEFER_WHILE_LATEST_LE))
    # current repo: latest file is r03 or r04 -> compare both regimes
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({}))
    assert name in actively_deferred(str(tmp_path))
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({}))
    assert name not in actively_deferred(str(tmp_path))

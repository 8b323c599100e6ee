"""Property-based check of the mix_token_budget closed form: the windowed
"capped iff cap_i*(n-i+1)+cumcap_{i-1} <= budget" predicate (DuckDB dialect,
same builder the Spark side uses) must reproduce the sequential UniMax
waterfill simulation for ARBITRARY source-size distributions and budgets --
including the degenerate corners a fixed dataset never exercises: all
sources capped (budget >= sum of caps), none capped, exact-boundary
budgets, duplicate sizes, and single-source corpora.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import duckdb

from flatterer_spark.ext_queries import sql_mix_token_budget
from flatterer_spark.functions.textgen import Gen

EPOCH_CAP = 2


def simulate(toks: dict[str, int], budget: int) -> dict[str, float]:
    """Sequential UniMax spec: freeze sources whose cap falls at or below
    the current equal share, re-spread the remainder, repeat."""
    live = {s: EPOCH_CAP * t for s, t in toks.items()}
    alloc: dict[str, float] = {}
    remaining = float(budget)
    while live:
        share = remaining / len(live)
        frozen = {s: c for s, c in live.items() if c <= share}
        if not frozen:
            alloc.update({s: share for s in live})
            break
        for s, c in frozen.items():
            alloc[s] = float(c)
            remaining -= c
            del live[s]
    return alloc


@st.composite
def _corpus(draw):
    sizes = draw(st.lists(st.integers(1, 10_000), min_size=1, max_size=25))
    toks = {f"s{i:02d}": n for i, n in enumerate(sizes)}
    cap_sum = EPOCH_CAP * sum(sizes)
    # budgets spanning none-capped .. all-capped, plus exact boundaries
    budget = draw(
        st.one_of(
            st.integers(0, cap_sum + 10),
            st.just(cap_sum),
            st.just(EPOCH_CAP * min(sizes) * len(sizes)),
        )
    )
    return toks, budget


@given(_corpus())
@settings(max_examples=200, deadline=None)
def test_closed_form_matches_sequential_waterfill(case):
    toks, budget = case
    sql = sql_mix_token_budget(
        Gen(spark=False),
        epoch_cap=EPOCH_CAP,
        src_rows=sorted(toks.items()),
        budget=budget,
    )
    con = duckdb.connect()
    rows = con.sql(sql).fetchall()
    con.close()
    # source, n_tokens, cap_tokens, capped, alloc_tokens, epochs
    got = {r[0]: r for r in rows}
    want = simulate(toks, budget)
    assert set(got) == set(want)
    for s, (_, n_tok, cap, capped, alloc, epochs) in got.items():
        assert cap == EPOCH_CAP * toks[s]
        # closed form vs simulation, within the 2-decimal output rounding
        assert abs(alloc - want[s]) < 0.011, (s, alloc, want[s])
        # capped flag == allocation frozen at the cap in the simulation
        assert capped == (want[s] == float(cap)), (s, want[s], cap)
        assert alloc <= cap + 1e-9
    total = sum(r[4] for r in got.values())
    if any(not r[3] for r in got.values()):
        # some source uncapped -> budget fully spent (up to rounding)
        assert abs(total - budget) < 0.011 * len(got)
    else:
        # everything capped -> allocation == caps, budget underspent OK
        assert abs(total - sum(EPOCH_CAP * t for t in toks.values())) < 1e-6

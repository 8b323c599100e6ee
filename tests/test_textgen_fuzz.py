"""Cross-engine fuzz: hypothesis-generated document tables through the
dual-dialect text/dedup builders on BOTH engines, asserting exact result
equality.  This extends the hand-picked degenerate-doc tests to arbitrary
token counts and contents within a restricted alphabet -- the boundary
logic (empty docs, sub-k docs, all-identical tokens, single shared gram)
is where the engines' sequence/slice semantics diverge.

Alphabet is deliberately ascii-lowercase words: the goal is boundary
coverage of the position/shingle machinery, not locale/unicode collation
differences (which the corpus-normalization op documents separately).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flatterer_spark.functions.textgen import Gen

WORDS = ["a", "bb", "ccc", "dd", "e", "spark", "table", "scan", "row"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _both_engines(spark, texts, builder):
    rows = [(i, t) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    got = sorted(tuple(r) for r in spark.sql(builder(Gen(spark=True))).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(builder(Gen(spark=False))).fetchall())
    con.close()
    return got, want


@pytest.mark.parametrize(
    "builder_name",
    ["sql_dedup_minhash_lsh", "sql_dedup_boilerplate",
     "sql_corpus_ngram_novelty", "sql_text_token_stats",
     "sql_text_bigram_nll", "sql_mm_phash_dedup"],
)
@settings(max_examples=15, deadline=None)
@given(texts=docs_strategy)
def test_builders_agree_on_random_docs(spark, builder_name, texts):
    import flatterer_spark.ext_queries as E

    builder = getattr(E, builder_name)
    got, want = _both_engines(spark, texts, builder)
    assert got == want, f"{builder_name} diverged on {texts!r}"


values_strategy = st.lists(
    st.floats(min_value=-50.0, max_value=50.0,
              allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(values=values_strategy)
def test_quantile_sketch_contract_on_random_values(spark, values):
    """Fuzz the histogram quantile sketch over arbitrary doubles (negative,
    boundary-exact, duplicated): both engines must agree exactly AND the
    within-bin error contract must hold on every row -- including values
    landing exactly on bin edges, where FLOOR's half-open binning is the
    boundary under test."""
    from flatterer_spark.ext_queries import sql_events_quantile_sketch

    rows = [(i, v) for i, v in enumerate(values)]
    spark.createDataFrame(rows, "event_id long, value double") \
        .createOrReplaceTempView("events")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            sql_events_quantile_sketch(Gen(spark=True))
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_events_quantile_sketch(Gen(spark=False))
        ).fetchall()
    )
    con.close()
    assert got == want, f"diverged on {values!r}"
    assert len(got) == 7
    for row in got:
        assert row[-1] == 1, f"error bound violated on {values!r}: {row}"

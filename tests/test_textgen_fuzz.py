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
     "sql_corpus_ngram_novelty", "sql_text_token_stats"],
)
@settings(max_examples=15, deadline=None)
@given(texts=docs_strategy)
def test_builders_agree_on_random_docs(spark, builder_name, texts):
    import flatterer_spark.ext_queries as E

    builder = getattr(E, builder_name)
    got, want = _both_engines(spark, texts, builder)
    assert got == want, f"{builder_name} diverged on {texts!r}"

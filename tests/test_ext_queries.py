"""Extension operators (dedup / similarity / text analysis): Spark result
must equal the DuckDB oracle, and the LSH paths must agree with their
exhaustive counterparts."""

from __future__ import annotations

import pytest

from flatterer_spark.ext_queries import EXT_ORACLE, EXT_QUERIES
from tests.oracle_util import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


# Since round 5 every EXT query has an oracle (the learned-model queries
# splice independently-refit numpy model literals into DuckDB SQL).
# Data-derived oracles are rebuilt at THIS test's scale -- the static
# EXT_ORACLE strings embed gate-scale (sf0.01) literals.
@pytest.mark.parametrize("name", sorted(n for n in EXT_QUERIES if n in EXT_ORACLE))
def test_ext_query_matches_oracle(name, spark, sf_dir, con):
    from flatterer_spark.ext_queries import EXT_ORACLE_BUILDERS

    df = EXT_QUERIES[name](spark, sf_dir)
    sql = (
        EXT_ORACLE_BUILDERS[name](sf_dir)
        if name in EXT_ORACLE_BUILDERS
        else EXT_ORACLE[name]
    )
    problems = compare(df, con, sql)
    assert not problems, f"{name}: {problems}"


def test_prefix_filter_lossless(spark, sf_dir):
    """Prefix-filtered candidate generation must produce the identical
    verified pair set as the naive inverted-index join (the filter only
    prunes candidates that provably cannot reach the threshold)."""
    from flatterer_spark.ext_queries import sql_dedup_ngram_jaccard
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.queries import T

    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    pref = spark.sql(sql_dedup_ngram_jaccard(Gen(spark=True), prefix_filter=True))
    naive = spark.sql(sql_dedup_ngram_jaccard(Gen(spark=True), prefix_filter=False))
    pref_rows = {(r.id1, r.id2, r.jaccard) for r in pref.collect()}
    naive_rows = {(r.id1, r.id2, r.jaccard) for r in naive.collect()}
    assert pref_rows == naive_rows
    assert pref_rows, "degenerate: no near-dup pairs at this sf"


def test_minhash_candidates_subset_of_exact(spark, sf_dir):
    """Every LSH-verified pair must also pass the exhaustive n-gram Jaccard
    screen at a lower threshold (LSH can only lose pairs, never invent)."""
    lsh = {
        (r.id1, r.id2)
        for r in EXT_QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in EXT_QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert lsh <= exact


def test_embedding_lsh_subset_and_planted_pair(spark, sf_dir):
    """LSH-verified embedding pairs must be a subset of the exact block-pair
    result (same threshold; banding can only lose candidates, and the verify
    filter is identical), and the planted threshold-edge pair is recovered."""
    exact = {
        (r.id1, r.id2)
        for r in EXT_QUERIES["dedup_embedding"](spark, sf_dir).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in EXT_QUERIES["dedup_embedding_lsh"](spark, sf_dir).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.5


def test_sim_topk_lsh_scores_match_bruteforce(spark, sf_dir):
    """Every (query, neighbor) the bucketed ANN returns must carry the same
    cosine the brute-force scorer assigns it, and per-query the ANN top-1 can
    never beat the exhaustive top-1."""
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in EXT_QUERIES["sim_topk_bruteforce"](spark, sf_dir).collect()
    }
    bf_top1 = {
        r.query_id: r.cosine
        for r in EXT_QUERIES["sim_topk_bruteforce"](spark, sf_dir).collect()
        if r.rnk == 1
    }
    ann = EXT_QUERIES["sim_topk_lsh"](spark, sf_dir).collect()
    assert ann, "bucketed ANN returned no rows"
    for r in ann:
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
        if r.rnk == 1:
            assert r.cosine <= bf_top1[r.query_id] + 1e-9


def test_sim_topk_ivf_scores_match_bruteforce(spark, sf_dir):
    """IVF ANN results must carry brute-force-identical cosines, and the
    IVF top-1 can never beat the exhaustive top-1."""
    bf_rows = EXT_QUERIES["sim_topk_bruteforce"](spark, sf_dir).collect()
    bf = {(r.query_id, r.neighbor_id): r.cosine for r in bf_rows}
    bf_top1 = {r.query_id: r.cosine for r in bf_rows if r.rnk == 1}
    ivf = EXT_QUERIES["sim_topk_ivf"](spark, sf_dir).collect()
    assert ivf, "IVF ANN returned no rows"
    for r in ivf:
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
        if r.rnk == 1:
            assert r.cosine <= bf_top1[r.query_id] + 1e-9


def test_lsh_recall_on_planted_near_dups(spark, sf_dir):
    """The driver data plants high-Jaccard near-dup pairs; 8 bands x 2 rows
    must recover essentially all pairs above the verify threshold of 0.5."""
    exact = [
        r
        for r in EXT_QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r.jaccard >= 0.5
    ]
    if not exact:
        pytest.skip("no pairs >= 0.5 at this sf")
    lsh = {
        (r.id1, r.id2)
        for r in EXT_QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    found = sum(1 for r in exact if (r.id1, r.id2) in lsh)
    assert found / len(exact) >= 0.9


def test_text_repetition_degenerate_docs(spark):
    """1-token and empty-text docs must not kill the query: Spark
    sequence(1, 0) is the DESCENDING [1, 0] (DuckDB's generate_series is
    empty), so an unguarded bigram index range crashes Spark while the
    oracle succeeds.  Both engines must agree on the degenerate rows."""
    import duckdb

    from flatterer_spark.ext_queries import sql_text_repetition
    from flatterer_spark.functions.textgen import Gen

    rows = [(1, "single"), (2, ""), (3, "two words"), (4, "a a a")]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    got = sorted(tuple(r) for r in
                 spark.sql(sql_text_repetition(Gen(spark=True))).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(con.execute(sql_text_repetition(Gen(spark=False))).fetchall())
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][3] == 0.0 and by_id[2][3] == 0.0  # no bigrams
    assert by_id[4] == (4, 3, pytest.approx(0.67), 1.0)  # "a a" twice / 2


def test_dedup_substring_finds_planted_span(spark):
    """A 10-token span planted in two otherwise-different documents must be
    reported (and single-doc repeats must not be: the count is DISTINCT
    docs, not occurrences)."""
    from flatterer_spark.ext_queries import sql_dedup_substring
    from flatterer_spark.functions.textgen import Gen

    span = "the quick brown fox jumps over a lazy sleeping dog"
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"{span} epsilon zeta eta theta iota kappa"),
        # doc 3 repeats ITS OWN window twice but shares with nobody
        (3, "one two three four five six seven eight nine ten "
            "one two three four five six seven eight nine ten"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    try:
        out = spark.sql(sql_dedup_substring(Gen(spark=True))).collect()
        pairs = {(r.first_doc, r.last_doc) for r in out}
        assert (1, 2) in pairs            # planted cross-doc span found
        assert all(r.first_doc != r.last_doc or r.n_docs >= 2 for r in out)
        assert not any(r.first_doc == 3 and r.last_doc == 3 for r in out)
    finally:
        spark.catalog.dropTempView("documents")


def test_dedup_boilerplate_strips_all_high_df_grams(spark, sf_dir):
    """Invariants of the rewrite: (a) token accounting is exact
    (len(clean) + n_removed == original length); (b) no cleaned document
    still contains a boilerplate k-gram as a contiguous window."""
    from flatterer_spark.queries import T

    docs = {r.doc_id: r.text for r in T(spark, sf_dir, "documents").collect()}
    out = EXT_QUERIES["dedup_boilerplate"](spark, sf_dir).collect()
    assert len(out) == len(docs)

    k, min_df = 3, 4
    df_count: dict[str, set] = {}
    for did, text in docs.items():
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            df_count.setdefault(" ".join(toks[i : i + k]), set()).add(did)
    boiler = {g for g, d in df_count.items() if len(d) >= min_df}
    assert boiler, "degenerate fixture: no boilerplate grams at this scale"

    removed_total = 0
    for r in out:
        orig = docs[r.doc_id].split(" ")
        clean = r.clean_text.split(" ") if r.clean_text else []
        assert len(clean) + r.n_removed == len(orig)
        removed_total += r.n_removed
        # exact expected rewrite: drop every position covered by a
        # boilerplate gram occurrence, keep the rest in order
        covered = set()
        for i in range(len(orig) - k + 1):
            if " ".join(orig[i : i + k]) in boiler:
                covered.update(range(i, i + k))
        expect = [t for i, t in enumerate(orig) if i not in covered]
        assert clean == expect, f"doc {r.doc_id} rewrite mismatch"
    assert removed_total > 0


def test_corpus_ngram_novelty_first_doc_and_totals(spark, sf_dir):
    """The lowest doc_id introduces everything it contains (novelty 1.0),
    and summed n_novel equals the corpus's distinct-gram count (every gram
    is introduced exactly once)."""
    from flatterer_spark.queries import T

    out = sorted(
        EXT_QUERIES["corpus_ngram_novelty"](spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    assert out[0].novelty == 1.0 and out[0].n_novel == out[0].n_grams
    assert all(0.0 <= r.novelty <= 1.0 for r in out)

    k = 3
    grams = set()
    for r in T(spark, sf_dir, "documents").collect():
        toks = r.text.split(" ")
        grams.update(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    assert sum(r.n_novel for r in out) == len(grams)


def test_shingle_ops_survive_sub_k_token_docs(spark):
    """Documents shorter than the shingle width k must not crash and must
    agree across engines: Spark's sequence(1, 0) is the DESCENDING [1, 0]
    (slice start 0 = runtime error) while DuckDB's generate_series is
    empty -- Gen.shingles filters positions so both engines produce NO
    shingles for sub-k docs.  A 100 TB crawl corpus WILL contain 1-2-token
    documents; before this guard every shingle-based op crashed on them."""
    import duckdb

    from flatterer_spark.ext_queries import (
        sql_dedup_boilerplate,
        sql_dedup_minhash_lsh,
        sql_corpus_ngram_novelty,
    )
    from flatterer_spark.functions.textgen import Gen

    rows = [
        (1, "only two"),
        (2, "one"),
        (3, ""),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)

    for builder in (
        sql_dedup_minhash_lsh,
        sql_dedup_boilerplate,
        sql_corpus_ngram_novelty,
    ):
        got = sorted(
            tuple(r) for r in spark.sql(builder(Gen(spark=True))).collect()
        )
        want = sorted(con.execute(builder(Gen(spark=False))).fetchall())
        assert got == want, builder.__name__
    # the planted 4/5 duplicate pair must still be found
    pairs = spark.sql(sql_dedup_minhash_lsh(Gen(spark=True))).collect()
    assert {(r.id1, r.id2) for r in pairs} == {(4, 5)}


def test_sim_ops_survive_zero_vector(spark, tmp_path):
    """An all-zero embedding must not crash the cosine path: Spark's ANSI
    mode raises DIVIDE_BY_ZERO where DuckDB yields inf -- an engine
    divergence.  The norm floor (greatest(nrm, 1e-30)) makes a zero vector
    score cosine ~0 against everything, identically on both engines."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flatterer_spark.ext_queries import sql_sim_topk
    from flatterer_spark.functions.textgen import Gen

    vecs = [[0.0] * 64, [1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62,
            [0.6, 0.8] + [0.0] * 62]
    tbl = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    spark.read.parquet(str(tmp_path / "embeddings.parquet")) \
        .createOrReplaceTempView("embeddings")
    got = sorted(tuple(r) for r in
                 spark.sql(sql_sim_topk(Gen(spark=True), n_queries=4)).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet'")
    want = sorted(tuple(r) for r in
                  con.execute(sql_sim_topk(Gen(spark=False), n_queries=4))
                  .fetchall())
    assert got == want
    # the zero vector scores ~0 cosine against every neighbor
    zero_rows = [r for r in got if r[0] == 0]
    assert zero_rows and all(abs(r[3]) < 1e-9 for r in zero_rows)


def test_mix_token_budget_matches_sequential_waterfill(spark, sf_dir, con):
    """The closed-form window formulation must reproduce the sequential
    UniMax spec (freeze sources whose cap falls below the current equal
    share, re-spread the remainder, repeat), and satisfy the allocation
    invariants: alloc <= cap everywhere, total alloc == budget whenever
    any source is uncapped."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    got = {r["source"]: r for r in
           EXT_QUERIES["mix_token_budget"](spark, sf_dir).collect()}
    toks = dict(con.sql(
        "SELECT source, SUM(len(string_split(text, ' ')))"
        " FROM documents GROUP BY source").fetchall())
    budget = sum(toks.values()) // 2
    live = {s: 2 * t for s, t in toks.items()}
    alloc: dict[str, float] = {}
    remaining = float(budget)
    while live:
        share = remaining / len(live)
        frozen = {s: c for s, c in live.items() if c <= share}
        if not frozen:
            alloc.update({s: share for s in live})
            live = {}
            break
        for s, c in frozen.items():
            alloc[s] = float(c)
            remaining -= c
            del live[s]
    assert set(got) == set(alloc)
    for s, r in got.items():
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
        assert abs(r["alloc_tokens"] - alloc[s]) < 0.011, s
        assert r["capped"] == (alloc[s] == 2.0 * toks[s])
    if any(not r["capped"] for r in got.values()):
        total = sum(r["alloc_tokens"] for r in got.values())
        assert abs(total - budget) < 0.01 * len(got) + 1e-6


def test_events_ewma_matches_pandas(spark, sf_dir, con):
    """The sorted-fold recurrence must agree with pandas' reference EWMA
    (adjust=False, seeded at the first value) for every user."""
    import math

    from flatterer_spark.ext_queries import EXT_QUERIES

    got = EXT_QUERIES["events_ewma"](spark, sf_dir).toPandas() \
        .set_index("user_id")
    ev = con.sql(
        "SELECT user_id, value FROM events ORDER BY user_id, ts, event_id"
    ).df()
    ref = ev.groupby("user_id")["value"].apply(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean().iloc[-1])
    assert set(ref.index) == set(got.index)
    for uid, want in ref.items():
        want6 = math.floor(want * 1e6 + 0.5) / 1e6
        assert abs(got.loc[uid, "ewma6"] - want6) < 2e-6, uid


def test_events_ewma_hot_key_bounded_state(spark):
    """A single user owning 10^6 events -- the hot key the old
    full-history collect_list plan would materialize on one executor as a
    million-struct array (VERDICT r5 'What's wrong' #1).  The segment fold
    carries at most max(1024, 10^6/1024) tiny structs per group and must
    still agree with the sequential recurrence (the fold is a contraction:
    per-step error decays by (1-a), so segment reassociation stays within
    display rounding)."""
    import math

    import pyspark.sql.functions as F

    from flatterer_spark.ext_queries import sql_events_ewma
    from flatterer_spark.functions.textgen import Gen

    n = 1_000_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.pmod(F.col("id") * F.lit(2654435761), F.lit(1000)) / F.lit(10.0))
        .alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.createOrReplaceTempView("events")
    try:
        got = spark.sql(sql_events_ewma(Gen(spark=True))).collect()
    finally:
        spark.catalog.dropTempView("events")
    assert len(got) == 1 and got[0]["n_events"] == n

    ewma = None
    for i in range(n):
        v = ((i * 2654435761) % 1000) / 10.0
        ewma = v if ewma is None else 0.3 * v + 0.7 * ewma
    want6 = math.floor(ewma * 1e6 + 0.5) / 1e6
    assert abs(got[0]["ewma6"] - want6) < 2e-6


def test_sample_dsir_prefers_target_language(spark, sf_dir, con):
    """DSIR's importance weight is a target/raw log-likelihood ratio, so
    target-language documents must score higher on average (per-token
    expectation under the target distribution is KL(p_t || p_r) >= 0),
    and the keep flag must select exactly the top quartile."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    df = EXT_QUERIES["sample_dsir"](spark, sf_dir).toPandas()
    langs = con.sql("SELECT doc_id, lang FROM documents").df()
    m = df.merge(langs, on="doc_id")
    en, rest = m[m.lang == "en"], m[m.lang != "en"]
    assert en.dsir_score.mean() > rest.dsir_score.mean()
    assert int(m.keep.sum()) == (len(m) + 3) // 4
    # the selected set is exactly the score-ranked prefix
    kept_min = m[m.keep].dsir_score.min()
    dropped_max = m[~m.keep].dsir_score.max()
    assert kept_min >= dropped_max - 1e-12


def test_dedup_bloom_no_false_negatives_bounded_fp(spark, sf_dir):
    """The Bloom contract: every document actually sharing a span with the
    corpus MUST be flagged (no false negatives -- a Bloom filter cannot
    miss a present key), and the span-level false-positive mass must stay
    within the sizing budget (fill^k compounded per span; the m=2^23
    filter holds it far under 1%)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    df = EXT_QUERIES["dedup_bloom"](spark, sf_dir).toPandas()
    assert len(df) > 0
    fn = df[df.actual_dup & ~df.maybe_dup]
    assert fn.empty, f"Bloom false negatives: {fn.doc_id.tolist()}"
    assert (df.n_bloom_hits >= df.n_exact_hits).all()
    fp_spans = int((df.n_bloom_hits - df.n_exact_hits).sum())
    assert fp_spans <= 0.01 * int(df.n_spans.sum())


def test_corpus_kmv_estimate_within_bound(spark, sf_dir):
    """KMV accuracy: the estimator's standard error is ~1/sqrt(k); with
    k=256 a 3-sigma bound is ~19%.  Also pin the small-set convention:
    est == exact when fewer than k distinct values exist."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    row = EXT_QUERIES["corpus_kmv_cardinality"](spark, sf_dir).collect()[0]
    assert row.n_distinct_exact > 0
    if row.n_distinct_exact < row.k:
        assert row.est_distinct == float(row.n_distinct_exact)
    else:
        assert abs(row.rel_err) <= 0.19, row.rel_err


def test_sim_topk_hamming_matches_numpy_signs(spark, sf_dir):
    """The packed-XOR-popcount pipeline must reproduce EXACTLY the top-k a
    direct numpy sign-bit comparison produces (pack -> xor -> bit_count is
    pure integer logic; any drift is a packing bug, not float noise)."""
    import numpy as np
    import pandas as pd

    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    bits = (X >= 0.0)  # sign bits, same >= convention as the SQL

    expect = []
    for q in range(10):
        qi = np.where(ids == q)[0]
        if len(qi) == 0:
            continue
        ham = (bits ^ bits[qi[0]]).sum(axis=1)
        order = sorted(
            (int(h), int(i)) for h, i in zip(ham, ids) if i != q
        )[:5]
        expect += [(q, r + 1, nid, h) for r, (h, nid) in enumerate(order)]

    got = [
        (r.query_id, r.rnk, r.neighbor_id, r.hamming)
        for r in EXT_QUERIES["sim_topk_hamming"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_corpus_bm25_matches_numpy(spark, sf_dir):
    """Independent BM25 re-implementation (pandas tf/df/dl + the same
    rounding discipline) must reproduce the ranked result exactly."""
    import math

    import numpy as np

    from flatterer_spark.ext_queries import BM25_QUERY_TERMS, EXT_QUERIES
    from flatterer_spark.queries import T

    def r(x, s):
        return math.floor(x * 10**s + 0.5) / 10**s

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    toks = {int(d.doc_id): d.text.split(" ") for d in docs.itertuples()}
    n_docs = len(toks)
    dl = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dl.values()) / n_docs
    k1, b = 1.2, 0.75
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in BM25_QUERY_TERMS
    }
    scores = {}
    for i, tk in toks.items():
        parts = []
        for t in BM25_QUERY_TERMS:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            w = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[i] / avgdl))
            parts.append(r(idf * w, 9))
        if parts:
            scores[i] = r(sum(sorted(parts)), 6)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [(r_ + 1, i, s) for r_, (i, s) in enumerate(expect)]

    got = [
        (row.rnk, row.doc_id, row.bm25)
        for row in EXT_QUERIES["corpus_bm25_topk"](spark, sf_dir).collect()
    ]
    assert got == expect
    assert got, "degenerate: no query term present at this sf"


def test_corpus_source_overlap_pair_recount(spark, sf_dir):
    """Recount the top pair's shared-shingle set directly in pandas and
    check the Jaccard identity on every returned row."""
    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    out = EXT_QUERIES["corpus_source_overlap"](spark, sf_dir).toPandas()
    assert len(out) > 0
    for row in out.itertuples():
        jac = row.n_shared / (row.n_a + row.n_b - row.n_shared)
        import math

        assert abs(row.jaccard - math.floor(jac * 1e6 + 0.5) / 1e6) < 1e-12

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).toPandas()

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    top = out.iloc[0]
    sets = {}
    for s in (top.src_a, top.src_b):
        rows = docs[docs.source == s]
        acc = set()
        for t in rows.text:
            acc |= shingles(t)
        sets[s] = acc
    assert top.n_a == len(sets[top.src_a])
    assert top.n_b == len(sets[top.src_b])
    assert top.n_shared == len(sets[top.src_a] & sets[top.src_b])


def test_source_overlap_kmv_tracks_exact(spark, sf_dir):
    """The sketch-mode overlap estimate must track the exact operator on
    every pair: Jaccard within the ratio-estimator's error budget
    (sqrt(J(1-J)/k) ~ 2.7% absolute at k=256; bounds hold with slack at
    sf0.001/0.01/0.1 -- md5-deterministic, so these are fixed values, not
    a flaky statistical assertion) and union cardinality within KMV's
    ~1/sqrt(k) envelope.  The exact operator stays the audit; the sketch
    is the 100 TB default (its heaviest input never reaches a
    data-proportional distinct agg -- see the plan contract)."""
    from flatterer_spark.ext_queries import (
        EXT_QUERIES,
        _shingle_view,
        sql_corpus_source_overlap,
    )
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.queries import T

    view = _shingle_view(spark, sf_dir)
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    exact = spark.sql(
        sql_corpus_source_overlap(Gen(spark=True), sh_table=view,
                                  top_pairs=200)
    ).toPandas()
    est = EXT_QUERIES["corpus_source_overlap_kmv"](spark, sf_dir).toPandas()
    # compare over the estimate's returned pairs (top 40 by est_jaccard)
    m = exact.merge(est, on=["src_a", "src_b"], suffixes=("_x", "_e"))
    assert len(m) == len(est) > 0
    dj = (m.est_jaccard - m.jaccard).abs()
    true_union = m.n_a + m.n_b - m.n_shared
    rel_u = (m.est_union - true_union).abs() / true_union
    assert dj.max() <= 0.10, dj.max()
    assert dj.mean() <= 0.035, dj.mean()
    assert rel_u.max() <= 0.25, rel_u.max()


def test_text_zipf_slope_matches_numpy_lstsq(spark, sf_dir):
    """The fold-based closed-form regression must agree with numpy's
    least-squares fit over the same (ln rank, ln freq) points to ~1e-6
    (the rounding discipline quantizes each ln at 1e-9 and the slope at
    1e-6; lstsq accumulates in a different order)."""
    from collections import Counter

    import numpy as np

    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    docs = T(spark, sf_dir, "documents").select("lang", "text").toPandas()
    got = {
        r.lang: (r.n_terms, r.zipf_slope)
        for r in EXT_QUERIES["text_zipf_slope"](spark, sf_dir).collect()
    }
    assert got
    for lang, grp in docs.groupby("lang"):
        freq = Counter()
        for t in grp.text:
            freq.update(t.split(" "))
        top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
        n = len(top)
        assert got[lang][0] == n
        if n <= 1:
            assert got[lang][1] == 0.0
            continue
        x = np.log(np.arange(1, n + 1, dtype=float))
        y = np.log(np.array([f for _, f in top], dtype=float))
        slope = np.polyfit(x, y, 1)[0]
        assert abs(got[lang][1] - slope) < 1e-5, (lang, got[lang][1], slope)


def test_dedup_threshold_sweep_consistent_with_pair_set(spark, sf_dir):
    """The sweep must be the cumulative histogram of the exact
    dedup_ngram_jaccard pair set: monotone non-increasing, and equal at
    every threshold to a direct recount of the pairs."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    pairs = EXT_QUERIES["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    sweep = EXT_QUERIES["dedup_threshold_sweep"](spark, sf_dir).toPandas()
    assert len(sweep) == 7
    counts = list(sweep.n_pairs)
    assert counts == sorted(counts, reverse=True)
    for row in sweep.itertuples():
        assert row.n_pairs == int((pairs.jaccard >= row.threshold).sum()), (
            row.threshold
        )
    assert counts[0] > 0, "degenerate: no pairs at the 0.3 floor"


def test_corpus_cm_sketch_matches_python_replica(spark, sf_dir):
    """Exact replica of the deterministic md5-cell sketch in Python: the
    estimates must match bit-for-bit, and the Count-Min one-sided-error
    contract (estimate >= exact, always) must hold."""
    import hashlib
    from collections import Counter

    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    d, w = 4, 256

    def cell(t, r):
        return int(hashlib.md5(f"{t}#{r}".encode()).hexdigest()[:8], 16) % w

    docs = T(spark, sf_dir, "documents").select("text").toPandas()
    freq = Counter()
    for t in docs.text:
        freq.update(t.split(" "))
    sketch = Counter()
    for t, n in freq.items():
        for r in range(d):
            sketch[(r, cell(t, r))] += n
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expect = [
        (r_ + 1, t, n, min(sketch[(r, cell(t, r))] for r in range(d)))
        for r_, (t, n) in enumerate(top)
    ]

    got = [
        (row.rnk, row.term, row.exact_n, row.cm_est)
        for row in EXT_QUERIES["corpus_cm_sketch"](spark, sf_dir).collect()
    ]
    assert got == expect
    for _, _, n, est in got:
        assert est >= n  # Count-Min never underestimates


def test_events_quantile_sketch_error_bound_and_exact_ranks(spark, sf_dir):
    """The histogram estimate must sit within one bin width above the true
    quantile (the sketch's accuracy contract), and the exact column must
    equal the numpy rank statistic it claims to be."""
    import math

    import numpy as np

    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    vals = np.sort(
        T(spark, sf_dir, "events").select("value").toPandas().value.to_numpy()
    )
    n = len(vals)
    got = EXT_QUERIES["events_quantile_sketch"](spark, sf_dir).toPandas()
    assert list(got.pct) == [1, 5, 25, 50, 75, 90, 99]
    for row in got.itertuples():
        r = math.ceil(n * row.pct / 100)
        assert row.target_rank == r
        assert row.exact_value == vals[r - 1], row.pct
        assert row.within_bin == 1
        assert 0 < row.est_upper - row.exact_value <= 4.0
    # estimates are monotone in the quantile
    ests = list(got.est_upper)
    assert ests == sorted(ests)


def test_text_bigram_nll_matches_python_replica(spark, sf_dir):
    """Exact replica of the interpolated bigram LM in Python: corpus counts,
    Jelinek-Mercer mixture, mean NLL -- must match to the rounding quantum."""
    import math
    from collections import Counter

    from flatterer_spark.ext_queries import EXT_QUERIES
    from flatterer_spark.queries import T

    docs = T(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    uni, bi = Counter(), Counter()
    toks = {}
    for row in docs.itertuples():
        ws = row.text.split(" ")
        toks[row.doc_id] = ws
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n_tot = sum(uni.values())

    got = {
        r.doc_id: r
        for r in EXT_QUERIES["text_bigram_nll"](spark, sf_dir).collect()
    }
    assert set(got) == {d for d, ws in toks.items() if len(ws) >= 2}
    for doc_id in list(toks)[:100]:
        ws = toks[doc_id]
        if len(ws) < 2:
            continue
        nlls = [
            -math.log(
                0.75 * bi[(a, b)] / uni[a] + 0.25 * uni[b] / n_tot
            )
            for a, b in zip(ws, ws[1:])
        ]
        avg = sum(nlls) / len(nlls)
        r = got[doc_id]
        assert r.n_bigrams == len(nlls)
        assert abs(r.avg_nll - avg) < 2e-6, doc_id
        assert abs(r.ppl - math.exp(avg)) < 2e-2, doc_id


def test_mm_phash_python_stage_equals_sql_spec(spark, sf_dir):
    """The Arrow mapInPandas fingerprint stage must be BYTE-IDENTICAL to the
    declarative SQL fingerprint (the DuckDB oracle's form) -- the property
    that lets the gate hash prove the multimodal Python path correct."""
    from flatterer_spark.ext_queries import _sql_phash_sig
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.operators.multimodal import phash_signatures
    from flatterer_spark.queries import T

    py = {
        r.doc_id: r.phash
        for r in phash_signatures(spark, sf_dir).collect()
    }
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    sql = {
        r.doc_id: r.phash
        for r in spark.sql(
            f"WITH {_sql_phash_sig(Gen(spark=True))} SELECT * FROM sig"
        ).collect()
    }
    assert py == sql and len(py) > 0


def test_events_funnel_monotone_and_nondegenerate(spark, sf_dir):
    """Funnel stage populations must be strictly positive at stage 1 and
    non-increasing (a user cannot convert at stage N without stage N-1),
    and the 24h window must actually discriminate (not everyone
    converts)."""
    df = (
        EXT_QUERIES["events_funnel"](spark, sf_dir)
        .toPandas()
        .sort_values("stage")
    )
    n = list(df["n_users"])
    assert len(n) == 3 and n[0] > 0
    assert n == sorted(n, reverse=True)
    assert n[2] < n[0], "window-less funnel: every user converts"


def test_minhash_calibration_bounds_and_bias(spark, sf_dir):
    """Calibration rows live on the defined grid (decile buckets 0..10,
    estimates in [0,1] as exact multiples of 1/16 pre-rounding), and the
    16-permutation sketch's documented low-similarity upward bias is
    visible: in the lowest populated bucket the mean estimate exceeds the
    micro-averaged exact Jaccard."""
    df = (
        EXT_QUERIES["corpus_minhash_calibration"](spark, sf_dir)
        .toPandas()
        .sort_values("bucket")
    )
    assert len(df) > 0
    assert df["bucket"].between(0, 10).all()
    assert df["avg_est4"].between(0, 1).all()
    assert df["avg_exact4"].between(0, 1).all()
    low = df.iloc[0]
    if low["bucket"] <= 2:
        assert low["avg_est4"] > low["avg_exact4"]


def test_staged_views_invalidate_on_regenerated_source(spark, tmp_path):
    """Regenerating a source parquet at the SAME path within one session
    must rebuild the staged shingle/norm views (fingerprint-keyed cache,
    functions/fingerprint.py) -- the round-9 review found the staged views
    served artifacts computed from the OLD file while the oracle read the
    new one."""
    import os
    import time

    import flatterer_spark.ext_queries as EQ

    sf = str(tmp_path)

    def write_docs(texts):
        spark.createDataFrame(
            [(i, t, "src", "2024-01-01") for i, t in enumerate(texts)],
            "doc_id long, text string, source string, created string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    write_docs(["alpha beta gamma delta", "epsilon zeta eta theta"])
    v1 = EQ._shingle_view(spark, sf)
    n1 = spark.table(v1).count()

    # regenerate with MORE documents; bump mtime past fs granularity
    time.sleep(0.05)
    write_docs(["alpha beta gamma delta", "epsilon zeta eta theta",
                "iota kappa lambda mu", "nu xi omicron pi"])
    for root, _dirs, files in os.walk(f"{sf}/documents.parquet"):
        for fn in files:
            p = os.path.join(root, fn)
            st = os.stat(p)
            os.utime(p, ns=(st.st_mtime_ns + 10**6, st.st_mtime_ns + 10**6))

    v2 = EQ._shingle_view(spark, sf)
    n2 = spark.table(v2).count()
    assert n2 > n1, (n1, n2)
    # superseded cache entries for this (session, sf_dir) were evicted
    keys = [k for k in EQ._sh_cache if k[1] == sf]
    assert len(keys) == 1


def test_sim_recall_matches_python_intersection(spark, sf_dir):
    """The recall@k evals must report EXACTLY the overlap of their two
    constituent (already oracle-verified) top-k results -- recomputed here
    by set intersection in plain Python -- and every sampled query must
    appear even when the ANN finds none of the true neighbors (left-join
    semantics: zero hits, recall 0.0, never a vanished row)."""
    exact = EXT_QUERIES["sim_topk_bruteforce"](spark, sf_dir).collect()
    eset = {(r.query_id, r.neighbor_id) for r in exact}
    n_queries = len({q for q, _ in eset})
    k = max(r.rnk for r in exact)
    for name, topk in (
        ("sim_ivf_recall", "sim_topk_ivf"),
        ("sim_lsh_recall", "sim_topk_lsh"),
    ):
        aset = {
            (r.query_id, r.neighbor_id)
            for r in EXT_QUERIES[topk](spark, sf_dir).collect()
        }
        rows = EXT_QUERIES[name](spark, sf_dir).collect()
        assert len(rows) == n_queries, f"{name}: lost a sampled query"
        for r in rows:
            want = len({p for p in eset & aset if p[0] == r.query_id})
            truth = len({p for p in eset if p[0] == r.query_id})
            assert r.hits == want, (name, r.query_id, r.hits, want)
            assert 0 <= r.hits <= k
            # denominator is the query's ACTUAL ground-truth size (= k on
            # corpora with > k vectors, smaller on tiny ones)
            assert abs(r.recall_at_k - round(r.hits / truth, 2)) < 1e-9


def test_sim_recall_tiny_corpus_denominator(spark, tmp_path):
    """On a corpus with fewer than k non-self neighbors the ground truth
    is smaller than k; an index that finds every true neighbor must read
    recall 1.0 (denominator = actual ground-truth size, not the constant
    k)."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 64)], 0) for i in range(4)
    ]
    sf = str(tmp_path / "tiny")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    # brute-force "ANN" == exact ground truth -> perfect recall everywhere
    from flatterer_spark.ext_queries import (
        sql_sim_recall_at_k,
        sql_sim_topk,
        _make_en_query,
    )

    run = _make_en_query(
        lambda g, n_queries=10, k=5, en_table=None: sql_sim_recall_at_k(
            g, sql_sim_topk, n_queries, k, en_table
        )
    )
    got = {r.query_id: r for r in run(spark, sf).collect()}
    assert len(got) == 4
    for q, r in got.items():
        assert r.hits == 3, (q, r)  # only 3 non-self neighbors exist
        assert r.recall_at_k == 1.0, (q, r)

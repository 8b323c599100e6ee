"""Training-data-pipeline operators: text analysis, dedup, similarity search.

Every operator is declared once as a SQL builder over
``flatterer_spark.functions.textgen.Gen`` and instantiated twice:
``Gen(spark=True)`` -> the query the engine runs (still fully
Catalyst-optimized -- ``spark.sql`` and the DataFrame API produce the same
plans), ``Gen(spark=False)`` -> the DuckDB oracle.  This guarantees the two
engines evaluate the *same* expression tree, so the driver's value-hash
comparison can only fail on a genuine engine-semantics bug, not on drift
between two hand-maintained implementations.

Scale posture (100 TB):
 - dedup_exact: single hash-groupBy -- one shuffle on the fingerprint, AQE
   coalesces; no skew (md5 is uniform).
 - ngram/minhash/simhash dedup: the quadratic all-pairs step is replaced by a
   *bucketed* candidate join (LSH bands / simhash bands / DF-ranked prefix
   shingles) so the shuffle key is the band value; only candidates sharing a
   bucket are verified.  The DuckDB oracles for the banded variants compute
   the mathematically-equivalent closed form (pigeonhole: hamming <= 3 over
   4 bands of 8 bits always shares a band; prefix filtering per SSJoin),
   proving the bucketed plan loses nothing.
 - embedding ops: fold-based dot products keep floats deterministic for the
   oracle; at real scale swap in the pandas_udf BLAS path (bench-only,
   numerically equivalent to ~1e-7).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from flatterer_spark.functions.fingerprint import fresh_cache_key
from flatterer_spark.functions.textgen import Gen

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

LANG_MARKERS = {
    "en": ("the", "a", "is", "of"),
    "es": ("el", "la", "de", "es"),
    "fr": ("le", "la", "et", "de"),
    "de": ("der", "die", "das", "und"),
}

# 8 random hyperplanes over the 64-dim embedding space, fixed seed, rounded so
# the literals splice identically into both engines' SQL.
_HP = np.round(np.random.RandomState(7).normal(0.0, 1.0, (8, 64)), 6)

# 48 hyperplanes for the *banded* embedding LSH (8 bands x 6 bits).  Band
# geometry is the recall/selectivity dial: a random pair collides on one
# band with p = 2^-bits, a pair at cosine c with p = (1 - acos(c)/pi)^bits.
# 8x6 measured on this data: 12.8% candidate rate; recall 6/14 at sf0.1
# where every true pair sits at the cos 0.5-0.6 threshold edge -- the
# worst case for sign-LSH (per-bit agreement 2/3 vs 1/2 random; rho=0.585,
# so no banding is simultaneously fast and high-recall there).  That regime
# belongs to the exact block-pair path (dedup_embedding); LSH is the scale
# path for real near-dup thresholds (cos >= 0.85, where 8x6 recall is
# >98% and production would raise bits to 16-24 for near-linear volume).
_HP2 = np.round(np.random.RandomState(11).normal(0.0, 1.0, (48, 64)), 6)

EMB_DIM = 64


def _explode(g: Gen, arr: str, alias: str) -> str:
    return f"explode({arr}) AS {alias}" if g.spark else f"unnest({arr}) AS {alias}"


def _xor(g: Gen, a: str, b: str) -> str:
    return f"({a} ^ {b})" if g.spark else f"xor({a}, {b})"


def _intersect(g: Gen, a: str, b: str) -> str:
    return f"array_intersect({a}, {b})" if g.spark else f"list_intersect({a}, {b})"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def sql_text_token_stats(g: Gen) -> str:
    toks = g.tokens("text")
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks, replace(text, ' ', '') AS squashed
               FROM documents)
    SELECT doc_id,
           CAST({g.size('toks')} AS BIGINT) AS n_tokens,
           CAST({g.size(g.distinct('toks'))} AS BIGINT) AS n_distinct,
           {g.round2(f"CAST(length(squashed) AS DOUBLE) / CAST({g.size('toks')} AS DOUBLE)")}
               AS avg_token_len
    FROM t ORDER BY doc_id
    """


def sql_text_quality(g: Gen) -> str:
    toks = g.tokens("text")
    stop_hits = g.size(g.filter("toks", "t", f"t IN {g.strlist(STOPWORDS)}"))
    n = g.size("toks")
    nd = g.size(g.distinct("toks"))
    dbl = "CAST({} AS DOUBLE)".format
    stop_ratio = f"({dbl(stop_hits)} / {dbl(n)})"
    distinct_ratio = f"({dbl(nd)} / {dbl(n)})"
    length_score = f"least({g.d(1.0)}, {dbl(n)} / {g.d(100.0)})"
    quality = (
        f"{g.d(0.4)} * {length_score} + {g.d(0.4)} * {distinct_ratio}"
        f" + {g.d(0.2)} * ({g.d(1.0)} - {stop_ratio})"
    )
    return f"""
    WITH t AS (SELECT doc_id, lang, {toks} AS toks FROM documents)
    SELECT doc_id, lang,
           CAST({n} AS BIGINT) AS n_tokens,
           CAST({stop_hits} AS BIGINT) AS stop_hits,
           {g.round2(stop_ratio)} AS stop_ratio,
           {g.round2(distinct_ratio)} AS distinct_ratio,
           {g.round2(quality)} AS quality
    FROM t ORDER BY doc_id
    """


# GPT2-ish piece splitter, simplified to constructs RE2 (DuckDB) and Java
# regex (Spark) evaluate identically: letter runs capped at 4 chars (the
# empirical BPE piece length), single digits, single punctuation marks.
_BPE_PATTERN = "([A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 ])"


def sql_text_token_count_bpe(g: Gen) -> str:
    """Subword-piece token counting (the 'BPE-ish regex' estimator).

    Whitespace tokens undercount LLM tokens ~1.3-1.5x; this splits text into
    GPT2-style pieces with a portable regex (both engines expose
    ``regexp_extract_all(s, pat, group)``) and reports both counts plus the
    pieces-per-word ratio.  Pure JVM-side expression -- no UDF."""
    toks = g.tokens("text")
    pieces = f"regexp_extract_all(text, '{_BPE_PATTERN}', 1)"
    dbl = "CAST({} AS DOUBLE)".format
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents)
    SELECT doc_id,
           CAST({g.size('toks')} AS BIGINT) AS n_ws_tokens,
           CAST({g.size(pieces)} AS BIGINT) AS n_bpe_pieces,
           {g.round2(f"{dbl(g.size(pieces))} / {dbl(g.size('toks'))}")}
               AS pieces_per_word
    FROM t ORDER BY doc_id
    """


def sql_text_gopher_filter(g: Gen) -> str:
    """Gopher-style document quality rules (Rae et al. 2021, table A1 subset;
    plus C4's symbol heuristic), evaluated wholly JVM-side.

    Word-level rules only (the corpus is single-line text): word count in
    [50, 100k], mean word length in [3, 10], symbol-to-word ratio < 0.1
    (``#`` and ``...``), >80% of words contain a letter, and at least two
    distinct stopwords present.  Letter detection uses ``lower(w) <> upper(w)``
    -- case-transform inequality holds exactly for cased letters, so both
    engines agree without regex-dialect risk.  Each rule is also emitted as a
    0/1 column so downstream filters can cut on any subset."""
    toks = g.tokens("text")
    dbl = "CAST({} AS DOUBLE)".format
    hash_cnt = "(length(text) - length(replace(text, '#', '')))"
    ell_cnt = "((length(text) - length(replace(text, '...', ''))) / 3)"
    alpha_words = g.size(g.filter("toks", "w", "lower(w) <> upper(w)"))
    stop_types = g.size(
        g.filter(g.distinct("toks"), "t", f"t IN {g.strlist(STOPWORDS)}")
    )
    rules = {
        "r_wordcount": "n_words >= 50 AND n_words <= 100000",
        "r_meanlen": f"mean_wlen >= {g.d(3.0)} AND mean_wlen <= {g.d(10.0)}",
        "r_symbol": f"symbol_ratio < {g.d(0.1)}",
        "r_alpha": f"alpha_ratio > {g.d(0.8)}",
        "r_stop": "stop_types >= 2",
    }
    rule_cols = ", ".join(
        f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS BIGINT) AS {name}"
        for name, cond in rules.items()
    )
    all_pass = " AND ".join(rules.values())
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents),
    m AS (
        SELECT doc_id,
               CAST({g.size('toks')} AS BIGINT) AS n_words,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / {dbl(g.size('toks'))} AS mean_wlen,
               ({dbl(hash_cnt)} + {dbl(ell_cnt)})
                   / {dbl(g.size('toks'))} AS symbol_ratio,
               {dbl(alpha_words)} / {dbl(g.size('toks'))} AS alpha_ratio,
               CAST({stop_types} AS BIGINT) AS stop_types
        FROM t
    )
    SELECT doc_id, n_words,
           {g.round2('mean_wlen')} AS mean_wlen,
           {g.round2('symbol_ratio')} AS symbol_ratio,
           {g.round2('alpha_ratio')} AS alpha_ratio,
           stop_types,
           {rule_cols},
           CAST(CASE WHEN {all_pass} THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM m ORDER BY doc_id
    """


# PII patterns restricted to constructs RE2 (DuckDB) and Java regex (Spark)
# evaluate identically: no backrefs, no lookaround, explicit classes.  The
# escaped dot must survive each engine's string-literal parsing: Spark SQL
# literals consume one level of backslash ('\\.' in SQL text -> '\.' to the
# regex), DuckDB passes literals through verbatim.
def _pii_patterns(g: Gen) -> tuple[str, str]:
    esc_dot = "\\\\." if g.spark else "\\."
    email = f"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+{esc_dot}[A-Za-z][A-Za-z]+"
    ipv4 = esc_dot.join(["[0-9]+"] * 4)
    return email, ipv4


def sql_text_pii_scrub(g: Gen) -> str:
    """PII detection + masking (emails, IPv4) as pure JVM-side regex ops.

    The corpus carries no natural PII, so the query first plants one
    deterministic email and IP per document (derived from doc_id -- both
    engines construct identical text), then counts and scrubs them.  The
    invariant the oracle checks end-to-end: every planted item is found,
    masked output contains none, and the scrubbed text hash matches across
    engines.  At 100 TB this is one codegen'd projection -- no shuffle, no
    UDF."""
    aug = (
        "text || ' contact user' || CAST(doc_id AS STRING) || '@example.com'"
        " || ' from 10.0.' || CAST(doc_id % 256 AS STRING) || '.1'"
        if g.spark else
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
    )
    email_pat, ipv4_pat = _pii_patterns(g)
    n_email = g.size(f"regexp_extract_all(t2, '({email_pat})', 1)")
    n_ip = g.size(f"regexp_extract_all(t2, '({ipv4_pat})', 1)")
    # Spark replaces all matches; DuckDB needs the explicit 'g' flag
    if g.spark:
        scrub = (
            f"regexp_replace(regexp_replace(t2, '{email_pat}', '<EMAIL>'), "
            f"'{ipv4_pat}', '<IP>')"
        )
    else:
        scrub = (
            f"regexp_replace(regexp_replace(t2, '{email_pat}', '<EMAIL>', 'g'), "
            f"'{ipv4_pat}', '<IP>', 'g')"
        )
    return f"""
    WITH a AS (SELECT doc_id, {aug} AS t2 FROM documents),
    s AS (SELECT doc_id,
                 CAST({n_email} AS BIGINT) AS n_emails,
                 CAST({n_ip} AS BIGINT) AS n_ips,
                 {scrub} AS scrubbed
          FROM a)
    SELECT doc_id, n_emails, n_ips,
           md5(scrubbed) AS scrubbed_hash,
           CAST(CASE WHEN scrubbed LIKE '%<EMAIL>%'
                      AND scrubbed NOT LIKE '%@example.com%'
                THEN 1 ELSE 0 END AS BIGINT) AS masked_ok
    FROM s ORDER BY doc_id
    """


def sql_text_lang_id(g: Gen) -> str:
    toks = g.tokens("text")
    scores = {
        lang: g.size(g.filter("toks", "t", f"t IN {g.strlist(markers)}"))
        for lang, markers in LANG_MARKERS.items()
    }
    sel = ", ".join(f"CAST({e} AS BIGINT) AS s_{k}" for k, e in scores.items())
    pred = """
        CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
             WHEN s_fr >= s_de THEN 'fr'
             ELSE 'de' END
    """
    return f"""
    WITH t AS (SELECT doc_id, lang, {toks} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {sel} FROM t)
    SELECT doc_id, lang AS labeled_lang, {pred} AS pred_lang,
           s_en, s_es, s_fr, s_de
    FROM s ORDER BY doc_id
    """


def sql_text_fingerprint(g: Gen) -> str:
    toks = g.tokens("text")
    sh5 = g.shingles("toks", 5)
    min_shingle = g.amin(g.transform(sh5, "s", "md5(s)"))
    return f"""
    WITH t AS (SELECT doc_id, text, {toks} AS toks FROM documents)
    SELECT doc_id,
           md5(text) AS content_hash,
           {min_shingle} AS min_shingle_hash
    FROM t ORDER BY doc_id
    """


def sql_text_entropy(g: Gen) -> str:
    """Character-level Shannon entropy per document (bits/char) -- the
    classic cheap gibberish / boilerplate / encoding-junk signal: natural
    text sits ~4 bits, base64 blobs higher, repeated padding near 0.

    Shape: explode chars -> count per (doc, char) -> entropy over the count
    list.  Both aggregations are codegen'd hash aggs with map-side combine,
    so the shuffle carries ~|alphabet| rows per doc (not the raw chars) --
    at 100 TB the exploded stream collapses before it ever hits the wire.
    (A per-row HOF filter-count version benched 13 s at sf0.1 vs ~1 s for
    this plan: O(|alphabet| x len) interpreted lambdas lose to two
    whole-stage-codegen aggs.)

    Float determinism: entropy only needs the count MULTISET, so the counts
    are aggregated into a SORTED list and the -p*log2(p) fold runs in that
    pinned order on both engines; n = exact integer fold of the same list."""
    c = g.explode(g.chars("text"), "c")
    cnts = g.sorted_list_agg("cnt")
    n = g.fold_sum_long("cnts")
    p = "(CAST(x AS DOUBLE) / CAST(n_chars AS DOUBLE))"
    terms = g.transform("cnts", "x", f"{p} * log2({p})")
    ent = f"({g.d(0.0)} - {g.fold_sum(terms)})"
    return f"""
    WITH ex AS (
        SELECT doc_id, {c} FROM documents
    ),
    cc AS (
        SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ex GROUP BY doc_id, c
    ),
    a AS (
        SELECT doc_id, {cnts} AS cnts FROM cc GROUP BY doc_id
    ),
    b AS (
        SELECT doc_id, cnts, CAST({n} AS BIGINT) AS n_chars FROM a
    )
    SELECT doc_id, n_chars, {g.round2(ent, 4)} AS entropy_bits
    FROM b ORDER BY doc_id
    """


def sql_corpus_tfidf_topk(g: Gen, k: int = 3) -> str:
    """Per-document top-k TF-IDF terms -- the classic keyword-extraction /
    feature-weighting pass.  Shape: explode tokens -> per-(doc, term) counts
    (partial+final agg collapses the token stream map-side) -> per-term
    document frequency from the tf table (one more tiny agg) -> join on the
    term key -> per-doc ROW_NUMBER top-k.

    Cross-engine determinism: the ranking key is the ROUNDED tfidf.
    Mathematically equal scores from different (tf, df) pairs exist (e.g.
    1*ln(4) == 2*ln(2)) and libm ln may differ in the last ulp between
    engines, so ranking on the raw double could flip such ties differently;
    rounding to 6 decimals collapses them, and the term breaks the tie."""
    t = g.explode(g.tokens("text"), "t")
    tfidf = "CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"
    return f"""
    WITH tok AS (
        SELECT doc_id, {t} FROM documents
    ),
    tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, t
    ),
    df AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    s AS (
        SELECT tf.doc_id, tf.t, tf.tf, df.df,
               {g.round2(tfidf, 6)} AS tfidf
        FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
    ),
    r AS (
        SELECT doc_id, t, tf, df, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, t) AS rn
        FROM s
    )
    SELECT doc_id, t AS term, tf, df, tfidf, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= {k}
    ORDER BY doc_id, rn
    """


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def sql_dedup_exact(g: Gen) -> str:
    return """
    SELECT md5(text) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS canonical_doc
    FROM documents
    GROUP BY md5(text)
    ORDER BY fingerprint
    """


def sql_shingle_cte(g: Gen, k: int = 3, table: str = "documents") -> str:
    """Standalone (doc_id, s) shingle-set query.  Spark inlines WITH-CTEs, so
    a CTE referenced three times is computed three times; the Spark paths
    materialize this once (persisted temp view) and splice its name into the
    builders via ``sh_table`` -- the expression tree per value is unchanged,
    so oracle parity holds.  ``table`` lets the streaming path point the
    same expression chain at a streaming temp view."""
    toks = g.tokens("text")
    return (
        f"SELECT doc_id, {g.shingles('toks', k)} AS s FROM "
        f"(SELECT doc_id, {toks} AS toks FROM {table}) t"
    )


def sql_dedup_ngram_jaccard(
    g: Gen,
    k: int = 3,
    threshold: float = 0.3,
    prefix_filter: bool = True,
    sh_table: str | None = None,
    final_order: bool = True,
) -> str:
    """Exact Jaccard >= threshold pairs over k-gram shingles.

    ``prefix_filter=True`` (default, the 100 TB plan) generates candidates
    with SSJoin-style prefix filtering instead of the naive inverted-index
    self-join: rank each doc's shingles by ascending global document
    frequency (rarest first) and join only on each doc's first
    ``n - ceil(t*n) + 1`` shingles.  Provably lossless: a pair with
    ``J >= t`` must agree on at least one shingle inside both prefixes
    (if all shared shingles sat outside a prefix, the overlap would be
    below ``t*n``).  Hot boilerplate shingles have maximal document
    frequency, rank last, and fall outside every prefix, so the candidate
    join is immune to the quadratic skew blowup the naive gram join hits
    when one shingle appears in a large fraction of the corpus.  Verification
    recomputes the exact intersection from the full shingle sets, so the
    result is identical to ``prefix_filter=False`` (tested).

    ``final_order=False`` drops the trailing ORDER BY (same rows): the
    Spark query wrapper sorts AFTER an eager localCheckpoint instead,
    because a global sort's range sampling re-executes its child -- here
    the whole verify join -- a second time (guide §8; the same shape
    ``_sorted_output`` fixed for emb_pq_codes in r11).  The DuckDB oracle
    keeps the default inline ORDER BY.
    """
    jac = "CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE)"
    tail = "ORDER BY id1, id2" if final_order else ""
    sh = sh_table or "sh"
    sh_cte = "" if sh_table else f"sh AS ({sql_shingle_cte(g, k)}),"
    if not prefix_filter:
        return f"""
        WITH {sh_cte}
        e AS (SELECT doc_id, CAST({g.size('s')} AS BIGINT) AS n, {_explode(g, 's', 'gram')} FROM {sh}),
        pairs AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   CAST(COUNT(*) AS BIGINT) AS inter,
                   MIN(a.n) AS n1, MIN(b.n) AS n2
            FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id1, id2, {g.round2(jac)} AS jaccard
        FROM pairs
        WHERE {jac} >= {g.d(threshold)}
        {tail}
        """
    inter = g.size(_intersect(g, "sa.s", "sb.s"))
    return f"""
    WITH {sh_cte}
    e AS (SELECT doc_id, CAST({g.size('s')} AS BIGINT) AS n, {_explode(g, 's', 'gram')} FROM {sh}),
    -- document frequency via a window over gram: one shuffle on gram, vs the
    -- groupBy-then-join-back form which shuffles e twice (same values).
    w AS (SELECT doc_id, gram, n,
                 CAST(COUNT(*) OVER (PARTITION BY gram) AS BIGINT) AS df
          FROM e),
    rk AS (
        SELECT doc_id, gram, n,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY df, gram) AS rnk
        FROM w
    ),
    pref AS (
        SELECT doc_id, gram, n, rnk FROM rk
        WHERE rnk <= n - CEIL({g.d(threshold)} * n) + 1
    ),
    cand AS (
        -- SSJoin pruning, both provably safe at threshold t:
        --  * length filter: J >= t forces t*n2 <= n1 (and vice versa);
        --  * positional filter: a pair first matching at prefix positions
        --    (i, j) has at most 1 + min(n1-i, n2-j) overlap, which must
        --    reach ceil(t/(1+t)*(n1+n2)).
        SELECT {g.par_hint()}DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM pref a JOIN pref b
          ON a.gram = b.gram AND a.doc_id < b.doc_id
         AND a.n >= CEIL({g.d(threshold)} * b.n)
         AND b.n >= CEIL({g.d(threshold)} * a.n)
         AND 1 + LEAST(a.n - a.rnk, b.n - b.rnk)
             >= CEIL({g.d(threshold)} / (1 + {g.d(threshold)}) * (a.n + b.n))
    ),
    ver AS (
        SELECT cand.id1, cand.id2,
               CAST({inter} AS BIGINT) AS inter,
               CAST({g.size('sa.s')} AS BIGINT) AS n1,
               CAST({g.size('sb.s')} AS BIGINT) AS n2
        FROM cand
        JOIN {sh} sa ON sa.doc_id = cand.id1
        JOIN {sh} sb ON sb.doc_id = cand.id2
    )
    SELECT id1, id2, {g.round2(jac)} AS jaccard
    FROM ver
    WHERE {jac} >= {g.d(threshold)}
    {tail}
    """


N_MINHASH = 16
N_BANDS = 8  # 2 rows per band


# universal-hash permutation constants for minhash: one md5 per shingle to a
# 32-bit int, then N_MINHASH cheap (a*h + b) mod p permutations -- vs salted
# md5 per (shingle, permutation), which costs N_MINHASH x more hashing (12M
# md5 calls at sf0.1).  p is the first prime above 2^32; products fit in 63
# bits so BIGINT arithmetic is exact and identical on both engines.
_MH_P = 4294967311
_rs13 = np.random.RandomState(13)
_MH_A = [int(a) | 1 for a in _rs13.randint(1, 1 << 31, N_MINHASH)]
_MH_B = [int(b) for b in _rs13.randint(0, 1 << 31, N_MINHASH)]


def _sql_lsh_bands_chain(
    g: Gen, k: int = 3, sh_table: str | None = None, table: str = "documents"
) -> str:
    """Shared MinHash banding pipeline as CTE text (no trailing comma):
    shingles -> 32-bit shingle hashes -> MinHash signature -> banded keys ->
    exploded ``bl(doc_id, band)`` rows.  Used by the all-pairs LSH dedup AND
    the incremental variant (which splits ``bl`` by batch membership before
    the candidate join)."""
    mh_parts = []
    for i in range(N_MINHASH):
        perm = f"({_MH_A[i]} * h + {_MH_B[i]}) % {_MH_P}"
        mh_parts.append(f"{g.amin(g.transform('hs', 'h', perm))} AS mh{i}")
    mh = ", ".join(mh_parts)
    rows = N_MINHASH // N_BANDS
    bands = ", ".join(
        "md5('{j}:' || {cat}) AS band{j}".format(
            j=j,
            cat=" || ':' || ".join(
                f"CAST(mh{j * rows + r} AS STRING)" if g.spark
                else f"CAST(mh{j * rows + r} AS VARCHAR)"
                for r in range(rows)
            ),
        )
        for j in range(N_BANDS)
    )
    band_arr = "array({})" if g.spark else "[{}]"
    band_arr = band_arr.format(", ".join(f"band{j}" for j in range(N_BANDS)))
    sh = sh_table or "sh"
    sh_cte = "" if sh_table else f"sh AS ({sql_shingle_cte(g, k, table)}),"
    hs = g.transform("s", "x", g.md5_32("x"))
    return f"""{sh_cte}
    hsv AS (SELECT doc_id, {hs} AS hs FROM {sh}),
    sig AS (SELECT doc_id, {mh} FROM hsv),
    bands AS (SELECT doc_id, {bands} FROM sig),
    bl AS (SELECT doc_id, {_explode(g, band_arr, 'band')} FROM bands)"""


def sql_dedup_minhash_lsh(
    g: Gen, k: int = 3, threshold: float = 0.5, sh_table: str | None = None
) -> str:
    """MinHash signatures -> banded LSH candidate join -> exact-Jaccard verify.

    Signatures use universal hashing over one md5-derived 32-bit int per
    shingle (see _MH_A/_MH_B) -- integer-only and therefore engine-portable,
    so Spark and DuckDB produce the identical candidate set; the final
    verified-pair list is hash-comparable even though LSH is probabilistic.
    """
    inter = g.size(_intersect(g, "sa.s", "sb.s"))
    sh = sh_table or "sh"
    return f"""
    WITH {_sql_lsh_bands_chain(g, k, sh_table)},
    cand AS (
        SELECT {g.par_hint()}DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bl a JOIN bl b ON a.band = b.band AND a.doc_id < b.doc_id
    ),
    ver AS (
        SELECT cand.id1, cand.id2,
               CAST({inter} AS BIGINT) AS inter,
               CAST({g.size('sa.s')} AS BIGINT) AS n1,
               CAST({g.size('sb.s')} AS BIGINT) AS n2
        FROM cand
        JOIN {sh} sa ON sa.doc_id = cand.id1
        JOIN {sh} sb ON sb.doc_id = cand.id2
    )
    SELECT id1, id2,
           {g.round2('CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE)')} AS jaccard
    FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE) >= {g.d(threshold)}
    ORDER BY id1, id2
    """


def sql_dedup_incremental(
    g: Gen, k: int = 3, threshold: float = 0.5, batch_mod: int = 5,
    sh_table: str | None = None,
) -> str:
    """Incremental (new-batch-vs-corpus) near-dup detection -- the nightly
    production shape: an arriving batch is checked against the existing
    corpus, NOT all-pairs over the union.  The testdata has no batch
    column, so membership is the deterministic surrogate
    ``doc_id % batch_mod == batch_mod - 1`` (~20% "new"); a real pipeline
    substitutes its ingest-date predicate.

    Scale shape (plan-contract-pinned, see
    tests/test_plan_contracts.py::test_dedup_incremental_filters_below_verify):
    the batch split happens BEFORE the candidate join -- the band list is
    partitioned into ``bl_new`` (the arriving batch, ~1/batch_mod of rows)
    and ``bl_corpus``, and candidates come from ``bl_new JOIN bl_corpus`` on
    the band key.  The corpus side's band list is the persistent artifact at
    100 TB (compute once, reuse nightly); the batch side is small enough to
    broadcast.  VERDICT r4 #5 flagged the previous formulation (full
    corpus x corpus pair set filtered afterward) as relying on unpinned
    Catalyst pushdown; this builds the incremental join explicitly.  The
    verify step then scores only straddling candidates.  Output is identical
    (each straddling pair once, oriented new -> corpus).  No exact-duplicate
    variant: the testdata has zero identical texts below sf0.1, which would
    make an exact gate row vacuous."""
    inter = g.size(_intersect(g, "sa.s", "sb.s"))
    sh = sh_table or "sh"
    is_new = f"doc_id % {batch_mod} = {batch_mod - 1}"
    return f"""
    WITH {_sql_lsh_bands_chain(g, k, sh_table)},
    bl_new AS (SELECT doc_id, band FROM bl WHERE {is_new}),
    bl_corpus AS (SELECT doc_id, band FROM bl WHERE NOT ({is_new})),
    cand AS (
        SELECT {g.par_hint()}DISTINCT n.doc_id AS new_doc_id,
               c.doc_id AS dup_of
        FROM bl_new n JOIN bl_corpus c ON n.band = c.band
    ),
    ver AS (
        SELECT cand.new_doc_id, cand.dup_of,
               CAST({inter} AS BIGINT) AS inter,
               CAST({g.size('sa.s')} AS BIGINT) AS n1,
               CAST({g.size('sb.s')} AS BIGINT) AS n2
        FROM cand
        JOIN {sh} sa ON sa.doc_id = cand.new_doc_id
        JOIN {sh} sb ON sb.doc_id = cand.dup_of
    )
    SELECT new_doc_id, dup_of,
           {g.round2('CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE)')} AS jaccard
    FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE) >= {g.d(threshold)}
    ORDER BY new_doc_id, dup_of
    """


def sql_split_leakage_check(
    g: Gen, k: int = 3, threshold: float = 0.5, salt: str = "split-v1",
    sh_table: str | None = None,
) -> str:
    """Eval-leakage audit: near-duplicate pairs that straddle a train/val/
    test boundary -- the reason dedup must run BEFORE splitting.  Composes
    the verified MinHash pair set with the same deterministic hash-split as
    ``split_assign`` (identical salt => identical membership), so the audit
    checks the split actually shipped, not a re-derived one.  One extra
    projection over the pair set: the expensive part (banded candidates +
    Jaccard verify) is shared with the dedup pass at scale."""
    pairs = sql_dedup_minhash_lsh(g, k=k, threshold=threshold, sh_table=sh_table)

    def split_of(col: str) -> str:
        h = g.md5_32(f"'{salt}:' || {g.str_cast(col)}")
        return (f"CASE WHEN {h} % 100 < 90 THEN 'train' "
                f"WHEN {h} % 100 < 95 THEN 'val' ELSE 'test' END")

    return f"""
    WITH pairs AS ({pairs}),
    lab AS (
        SELECT id1, id2, jaccard,
               {split_of('id1')} AS split1,
               {split_of('id2')} AS split2
        FROM pairs
    )
    SELECT id1, split1, id2, split2, jaccard
    FROM lab
    WHERE split1 <> split2
    ORDER BY id1, id2
    """


SIMHASH_BITS = 60


def _sql_simhash_sig(g: Gen) -> str:
    """CTE body computing (doc_id, simhash) -- majority bit over token
    hashes.  60-bit (round 6; was 32): the banded near-dup join's candidate
    volume is ~4 * n^2 / band_space, and 8-bit bands over a 32-bit hash cap
    the space at 256 values per band -- quadratic pair growth that the 10x
    scale-slope bench surfaced (BENCH_SCALE_r06: 108 s at 10x).  15-bit
    bands (md5_60 fits SIGNED BIGINT on both engines) widen the space
    128x at the cost of 28 more majority-bit aggregates."""
    toks = g.tokens("text")
    hs = g.transform(g.distinct("toks"), "t", g.md5_60("t"))
    n = g.size("hs")
    bit_terms = []
    for b in range(SIMHASH_BITS):
        ones = g.size(g.filter("hs", "h", f"{g.bit('h', b)} = 1"))
        bit_terms.append(f"(CASE WHEN 2 * {ones} > {n} THEN {1 << b} ELSE 0 END)")
    simhash = " + ".join(bit_terms)
    return f"""
    t AS (SELECT doc_id, {toks} AS toks FROM documents),
    hv AS (SELECT doc_id, {hs} AS hs FROM t),
    sig AS (SELECT doc_id, CAST({simhash} AS BIGINT) AS simhash FROM hv)
    """


def sql_dedup_simhash(g: Gen) -> str:
    return f"""
    WITH {_sql_simhash_sig(g)}
    SELECT doc_id, simhash FROM sig ORDER BY doc_id
    """


def sql_dedup_simhash_pairs(g: Gen, max_dist: int = 3) -> str:
    """Near-dup pairs at hamming <= 3 over the 60-bit simhash.

    Spark runs the *banded* plan (4 bands of 15 bits; pigeonhole guarantees a
    pair within distance 3 shares at least one exact band -> equi-join on the
    band value instead of an O(n^2) cross join).  DuckDB runs the closed-form
    all-pairs filter.  Identical result sets prove the banded plan is lossless.
    """
    dist = f"CAST(bit_count({_xor(g, 'a.simhash', 'b.simhash')}) AS BIGINT)"
    if g.spark:
        band_vals = ", ".join(
            f"CAST({j * 32768} + ({g.shr('simhash', 15 * j)} & 32767) AS BIGINT)"
            for j in range(4)
        )
        return f"""
        WITH {_sql_simhash_sig(g)},
        bands AS (SELECT doc_id, simhash, explode(array({band_vals})) AS band FROM sig),
        cand AS (
            SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
            FROM bands x JOIN bands y ON x.band = y.band AND x.doc_id < y.doc_id
        )
        SELECT cand.id1, cand.id2, {dist} AS hamming
        FROM cand
        JOIN sig a ON a.doc_id = cand.id1
        JOIN sig b ON b.doc_id = cand.id2
        WHERE bit_count({_xor(g, 'a.simhash', 'b.simhash')}) <= {max_dist}
        ORDER BY id1, id2
        """
    return f"""
    WITH {_sql_simhash_sig(g)}
    SELECT a.doc_id AS id1, b.doc_id AS id2, {dist} AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count({_xor(g, 'a.simhash', 'b.simhash')}) <= {max_dist}
    ORDER BY id1, id2
    """


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

def _sql_emb_norm(g: Gen) -> str:
    """CTE: (vec_id, e DOUBLE[], norm) with deterministic fold arithmetic.

    The norm is floored at 1e-30: an all-zero vector would otherwise make
    every cosine denominator 0, which CRASHES Spark (ANSI DIVIDE_BY_ZERO)
    while DuckDB silently yields inf -- an engine divergence.  With the
    floor a zero vector scores cosine ~0 against everything (no direction
    -> never similar) identically on both engines; real vectors are
    unaffected (their norms are astronomically above the floor)."""
    elems = g.transform(
        g.seq("1", str(EMB_DIM)), "i", f"CAST({g.at('embedding', 'i')} AS DOUBLE)"
    )
    sq = g.fold_sum(g.transform("e", "x", "x * x"))
    return f"""
    ev AS (SELECT vec_id, {elems} AS e FROM embeddings),
    en AS (SELECT vec_id, e, greatest(sqrt({sq}), {g.d(1e-30)}) AS nrm FROM ev)
    """


def sql_emb_norm_query(g: Gen) -> str:
    """Standalone (vec_id, e, nrm) query -- the materializable form of
    :func:`_sql_emb_norm` (same expressions, so substituting a persisted
    view of this for the CTE cannot change any value)."""
    elems = g.transform(
        g.seq("1", str(EMB_DIM)), "i", f"CAST({g.at('embedding', 'i')} AS DOUBLE)"
    )
    sq = g.fold_sum(g.transform("e", "x", "x * x"))
    return (
        f"SELECT vec_id, e, greatest(sqrt({sq}), {g.d(1e-30)}) AS nrm FROM "
        f"(SELECT vec_id, {elems} AS e FROM embeddings) ev"
    )


def _en_parts(g: Gen, en_table: str | None) -> tuple[str, str]:
    """(with-clause prefix, table name) for the normalized-embedding source."""
    if en_table:
        return "", en_table
    return f"{_sql_emb_norm(g)},", "en"


def _sql_dot(g: Gen, a: str, b: str, dim: int = EMB_DIM) -> str:
    """Fold-based ``dim``-term dot product.

    Measured note: unrolling this to plain ``e1[1]*e2[1] + ...`` arithmetic
    (tempting for whole-stage codegen) is ~60% SLOWER on the 1.6M-pair
    verify join at sf0.1, and unrolling the 48-dot bucket expressions is 5x
    slower (expression trees past JIT method limits force interpretation).
    The single higher-order fold per dot is the fastest Catalyst shape for
    this; keep it."""
    prods = g.transform(
        g.seq("1", str(dim)), "i", f"{g.at(a, 'i')} * {g.at(b, 'i')}"
    )
    return g.fold_sum(prods)


def _sql_dot_const(g: Gen, a: str, coeffs) -> str:
    """Dot of a vector column with a constant hyperplane, as a fold over an
    array literal.  NOT unrolled: bucket expressions evaluate 48 of these per
    row, and 48 x 64 unrolled terms form an expression tree past the JVM's
    JIT method limits -- codegen falls back to interpretation and the whole
    projection slows ~5x (measured).  The fold keeps each dot one compact
    higher-order call; per-row cost is fine because banding runs once per
    vector, not per pair."""
    lit = "array(" + ", ".join(f"{float(c)!r}D" for c in coeffs) + ")"
    if not g.spark:
        lit = "CAST([" + ", ".join(repr(float(c)) for c in coeffs) + "] AS DOUBLE[])"
    prods = g.transform(
        g.seq("1", str(len(coeffs))), "i", f"{g.at(a, 'i')} * {g.at(f'({lit})', 'i')}"
    )
    return g.fold_sum(prods)


def sql_dedup_embedding(g: Gen, threshold: float = 0.5) -> str:
    cos = f"{_sql_dot(g, 'a.e', 'b.e')} / (a.nrm * b.nrm)"
    return f"""
    WITH {_sql_emb_norm(g)}
    SELECT a.vec_id AS id1, b.vec_id AS id2, {g.round2(f'({cos})')} AS cosine
    FROM en a JOIN en b ON a.vec_id < b.vec_id
    WHERE {cos} >= {g.d(threshold)}
    ORDER BY id1, id2
    """


def sql_sim_topk(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """Brute-force cosine top-k for a fixed query set (ANN baseline)."""
    cos = f"{_sql_dot(g, 'q.e', 'c.e')} / (q.nrm * c.nrm)"
    en_cte, en = _en_parts(g, en_table)
    return f"""
    WITH {en_cte}
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos
        FROM {en} q JOIN {en} c ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
           {g.round2('cos')} AS cosine
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def sql_sim_range_search(
    g: Gen, n_queries: int = 10, threshold: float = 0.25,
    en_table: str | None = None,
) -> str:
    """Radius (range) similarity search: ALL neighbors at cosine >=
    ``threshold`` for each query -- the retrieval-dedup sibling of top-k
    (top-k bounds result size, range search bounds result QUALITY; data
    curation wants the latter when harvesting "everything similar enough").

    Same multiprobe hyperplane-bucket candidate join as ``sim_topk_lsh``
    (query probes its own 8-bit bucket + the 8 hamming-1 neighbors;
    candidates ~9/256 of the corpus; probe side broadcasts at scale, corpus
    shuffles once on bucket), with the rank cut replaced by the threshold
    filter on the exact cosine of candidates.  Deterministic hyperplanes =>
    identical candidate set in both engines => hash-comparable."""
    probe_vals = ", ".join(
        ["bucket"] + [_xor(g, "bucket", str(1 << p)) for p in range(_HP.shape[0])]
    )
    probe_arr = "array({})" if g.spark else "[{}]"
    probe_arr = probe_arr.format(probe_vals)
    cos = f"{_sql_dot(g, 'q.e', 'c.e')} / (q.nrm * c.nrm)"
    en_cte, en = _en_parts(g, en_table)
    return f"""
    WITH {en_cte}
    b AS (SELECT vec_id, e, nrm, CAST({_sql_bucket_expr(g, _HP)} AS BIGINT) AS bucket FROM {en}),
    probes AS (
        SELECT vec_id AS query_id, {_explode(g, probe_arr, 'pb')}
        FROM b WHERE vec_id < {n_queries}
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id, {cos} AS cos
        FROM probes p
        JOIN b c ON c.bucket = p.pb AND c.vec_id <> p.query_id
        JOIN b q ON q.vec_id = p.query_id
    )
    SELECT query_id, neighbor_id, {g.round2('cos')} AS cosine
    FROM scored
    WHERE cos >= {g.d(threshold)}
    ORDER BY query_id, neighbor_id
    """


def _sql_bucket_expr(g: Gen, planes) -> str:
    """Sum-of-sign-bits bucket id over column ``e`` for the given hyperplanes."""
    bit_terms = []
    for p in range(planes.shape[0]):
        dot = _sql_dot_const(g, "e", planes[p])
        bit_terms.append(
            f"(CASE WHEN {dot} >= {g.d(0.0)} THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(bit_terms)


def sql_sim_lsh_buckets(g: Gen, en_table: str | None = None) -> str:
    """Random-hyperplane LSH bucket id per vector (the ANN scale path: bucket
    join replaces the brute-force cross product; sql_sim_topk_lsh consumes it)."""
    bucket = _sql_bucket_expr(g, _HP)
    sel = f"SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket"
    if en_table:
        return f"{sel} FROM {en_table} ORDER BY vec_id"
    return f"""
    WITH {_sql_emb_norm(g)}
    {sel}
    FROM en ORDER BY vec_id
    """


def sql_sim_topk_lsh(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """Bucketed ANN top-k: the consumer of the sim_lsh_buckets bucket ids.

    Multiprobe scheme: each query probes its own 8-bit hyperplane bucket plus
    the 8 buckets at hamming distance 1, so the candidate set is
    ``9/256`` of the corpus in expectation -- the O(n^2) cross product of the
    brute-force baseline becomes a shuffle-friendly equi-join on the bucket
    id, and only candidates are scored.  Deterministic hyperplanes mean the
    DuckDB oracle computes the identical candidate set, so the approximate
    result is still hash-comparable across engines.  At cluster scale the
    probe side broadcasts (it is ``n_queries x 9`` rows) and the corpus side
    is shuffled once on ``bucket``."""
    probe_vals = ", ".join(
        ["bucket"] + [_xor(g, "bucket", str(1 << p)) for p in range(_HP.shape[0])]
    )
    probe_arr = "array({})" if g.spark else "[{}]"
    probe_arr = probe_arr.format(probe_vals)
    cos = f"{_sql_dot(g, 'q.e', 'c.e')} / (q.nrm * c.nrm)"
    en_cte, en = _en_parts(g, en_table)
    return f"""
    WITH {en_cte}
    b AS (SELECT vec_id, e, nrm, CAST({_sql_bucket_expr(g, _HP)} AS BIGINT) AS bucket FROM {en}),
    probes AS (
        SELECT vec_id AS query_id, {_explode(g, probe_arr, 'pb')}
        FROM b WHERE vec_id < {n_queries}
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               {cos} AS cos
        FROM probes p
        JOIN b c ON c.bucket = p.pb AND c.vec_id <> p.query_id
        JOIN b q ON q.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
           {g.round2('cos')} AS cosine
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


IVF_CELLS = 16
IVF_NPROBE = 2


def sql_sim_topk_ivf(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """IVF (inverted-file) ANN top-k: coarse-quantize the corpus into
    ``IVF_CELLS`` cells, probe the ``IVF_NPROBE`` nearest cells per query.

    Centroids are the first ``IVF_CELLS`` corpus vectors (deterministic, so
    the DuckDB oracle computes the identical partition; production would run
    k-means|| and broadcast the learned centroids -- the query shape is the
    same).  Cell assignment is an argmin over a broadcastable 16-row centroid
    table (n x C expansion, window rank 1), so the corpus is shuffled once on
    ``cell`` and each query scores only ~NPROBE/C of the corpus.  This is the
    cell-partitioned counterpart to sql_sim_topk_lsh's hyperplane buckets:
    IVF adapts to the data distribution, LSH is data-independent."""
    cos_vc = f"{_sql_dot(g, 'v.e', 'c.e')} / (v.nrm * c.nrm)"
    cos_qc = f"{_sql_dot(g, 'q.e', 'b.e')} / (q.nrm * b.nrm)"
    en_cte, en = _en_parts(g, en_table)
    return f"""
    WITH {en_cte}
    cent AS (SELECT vec_id AS cid, e, nrm FROM {en} WHERE vec_id < {IVF_CELLS}),
    scored_cells AS (
        SELECT v.vec_id, c.cid, {cos_vc} AS sim
        FROM {en} v JOIN cent c ON 1 = 1
    ),
    ranked_cells AS (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid) AS crnk
        FROM scored_cells
    ),
    assign AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE crnk = 1),
    probes AS (
        SELECT vec_id AS query_id, cid AS cell FROM ranked_cells
        WHERE vec_id < {n_queries} AND crnk <= {IVF_NPROBE}
    ),
    scored AS (
        SELECT {g.par_hint()}p.query_id, b.vec_id AS neighbor_id, {cos_qc} AS cos
        FROM probes p
        JOIN assign a ON a.cell = p.cell
        JOIN {en} b ON b.vec_id = a.vec_id AND b.vec_id <> p.query_id
        JOIN {en} q ON q.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
           {g.round2('cos')} AS cosine
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def sql_sim_recall_at_k(
    g: Gen,
    ann_builder,
    n_queries: int = 10,
    k: int = 5,
    en_table: str | None = None,
) -> str:
    """Recall@k of an ANN index against the exact brute-force ground truth
    -- the index-quality evaluation every production ANN deployment runs
    before trusting an approximate path, and the instrument that tunes the
    nprobe/band dials at scale.

    Composes the already-verified top-k builders as subqueries --
    ``ann_builder`` is the BUILDER (not pre-rendered SQL), so the exact
    and ANN sides are rendered from the same ``n_queries``/``k``/
    ``en_table`` and cannot silently disagree.  Ground truth is
    :func:`sql_sim_topk` (exact) over the same sampled query vectors;
    recall@k per query is the overlap count divided by the query's
    ACTUAL ground-truth size (= min(k, corpus-1) -- the standard recall
    denominator, so an index that finds every true neighbor of a
    tiny corpus still reads 1.0).  The left join from exact to ANN
    means a query with zero ANN hits reports 0.0 rather than
    vanishing.  At 100 TB the exact side stays
    affordable precisely because ground truth is only computed for the
    SAMPLED queries -- n_queries x N scored pairs, a broadcast of the tiny
    query set over one corpus scan -- which is how index dials are tuned
    in production: evaluate recall on a sample, apply the dial
    corpus-wide.  Deterministic hyperplanes/centroids keep both engines on
    identical candidate sets, so hits and recall are hash-comparable."""
    exact_sql = sql_sim_topk(g, n_queries, k, en_table)
    ann_sql = ann_builder(g, n_queries, k, en_table)
    recall = g.round2(
        "COUNT(a.neighbor_id) / CAST(COUNT(e.neighbor_id) AS DOUBLE)"
    )
    return f"""
    WITH exact_topk AS (
        SELECT query_id, neighbor_id FROM ({exact_sql}) ex
    ),
    ann_topk AS (
        SELECT query_id, neighbor_id FROM ({ann_sql}) ann
    )
    SELECT e.query_id AS query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits,
           {recall} AS recall_at_k
    FROM exact_topk e
    LEFT JOIN ann_topk a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """


def sql_sim_ivf_recall(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """Recall@k of the IVF cell-probe index (:func:`sql_sim_topk_ivf`,
    nprobe=2 of 16 cells) vs exact top-k: the eval half of the IVF pair --
    scan ~nprobe/cells of the corpus, then MEASURE what that dial costs in
    recall instead of asserting it."""
    return sql_sim_recall_at_k(g, sql_sim_topk_ivf, n_queries, k, en_table)


def sql_sim_lsh_recall(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """Recall@k of the multiprobe hyperplane-LSH index
    (:func:`sql_sim_topk_lsh`, own bucket + 8 hamming-1 probes = ~9/256 of
    the corpus scored) vs exact top-k -- the data-independent sibling of
    :func:`sql_sim_ivf_recall`, so the two evals compared head-to-head say
    which index family fits the data distribution."""
    return sql_sim_recall_at_k(g, sql_sim_topk_lsh, n_queries, k, en_table)


N_EMB_BANDS = 8
EMB_BAND_BITS = 6


def _emb_band_arr(g: Gen) -> str:
    """Array of the 8 banded LSH values (band-index-offset + 6 sign bits)."""
    band_exprs = []
    for j in range(N_EMB_BANDS):
        planes = _HP2[j * EMB_BAND_BITS:(j + 1) * EMB_BAND_BITS]
        band_exprs.append(
            f"CAST({j * (1 << EMB_BAND_BITS)} + {_sql_bucket_expr(g, planes)} AS BIGINT)"
        )
    arr = "array({})" if g.spark else "[{}]"
    return arr.format(", ".join(band_exprs))


def sql_dedup_embedding_lsh(
    g: Gen,
    threshold: float = 0.5,
    en_table: str | None = None,
    bl_table: str | None = None,
) -> str:
    """Embedding near-dup via banded hyperplane LSH + exact cosine verify.

    The approximate scale path for embedding dedup: 48 sign bits split into
    8 bands of 6; a pair agreeing on any whole band becomes a candidate
    (equi-join on the band value -- the same shuffle shape as
    dedup_minhash_lsh), and only candidates get the exact fold-arithmetic
    cosine.  Band bits set selectivity (random pair collides with 2^-6 per
    band -> ~13% candidate rate on this isotropic data) and bands set recall;
    the deterministic hyperplanes keep Spark and the DuckDB oracle on the
    identical candidate set, so the approximate result is still
    hash-comparable.  dedup_embedding (block-pair BLAS in operators/dedup.py)
    remains the exact path when the O(n^2/B) compute is affordable."""
    cos = f"{_sql_dot(g, 'a.e', 'b.e')} / (a.nrm * b.nrm)"
    en_cte, en = _en_parts(g, en_table)
    if bl_table:
        bl_cte, bl = "", bl_table
    else:
        band_arr = _emb_band_arr(g)
        bl_cte = f"bl AS (SELECT vec_id, {_explode(g, band_arr, 'band')} FROM {en}),"
        bl = "bl"
    return f"""
    WITH {en_cte}
    {bl_cte}
    cand AS (
        SELECT {g.par_hint()}DISTINCT x.vec_id AS id1, y.vec_id AS id2
        FROM {bl} x JOIN {bl} y ON x.band = y.band AND x.vec_id < y.vec_id
    )
    SELECT cand.id1, cand.id2, {g.round2(f'({cos})')} AS cosine
    FROM cand
    JOIN {en} a ON a.vec_id = cand.id1
    JOIN {en} b ON b.vec_id = cand.id2
    WHERE {cos} >= {g.d(threshold)}
    ORDER BY id1, id2
    """


MM_EMBED_DIM = 8

# 5 hyperplanes over the 8-dim pseudo-embedding space -> 32 buckets.  With
# multiprobe (own bucket + 5 hamming-1 neighbors) each query scores ~6/32 of
# the corpus instead of all of it; small enough that every query still finds
# >= k candidates on the 500-doc test corpus, and the same dial as _HP/_HP2:
# more planes = fewer candidates per bucket at real corpus sizes.
_HP_MM = np.round(np.random.RandomState(13).normal(0.0, 1.0, (5, MM_EMBED_DIM)), 6)


def sql_mm_sim_topk(g: Gen, n_queries: int = 5, k: int = 3) -> str:
    """End-to-end multimodal similarity: pseudo-embed document payloads
    (the mm_embed_stub expression, inline) then LSH-bucketed cosine top-k.

    Demonstrates the media-bytes -> embedding -> ANN bridge as ONE plan: at
    scale the embed stage becomes an Arrow-batched model forward; the top-k
    is the same multiprobe hyperplane-bucket equi-join as sim_topk_lsh (own
    bucket + hamming-1 probes), so the corpus is shuffled once on ``bucket``
    and only ~6/32 of it is scored per query -- no cross join of the full
    corpus anywhere in the plan.  Deterministic hyperplanes keep the DuckDB
    oracle on the identical candidate set, so the approximate result is
    still hash-comparable across engines."""
    dim_exprs = []
    for d in range(MM_EMBED_DIM):
        salted = "text || ':' || '%d'" % d
        dim_exprs.append(
            f"FLOOR(CAST({g.md5_32(salted)} AS DOUBLE)"
            f" / 4294967296.0 * 100 + {g.d(0.5)}) / 100"
        )
    dims = ", ".join(dim_exprs)
    arr = f"array({dims})" if g.spark else f"[{dims}]"
    sq = g.fold_sum(g.transform("e", "x", "x * x"))
    cos = f"{_sql_dot(g, 'q.e', 'c.e', dim=MM_EMBED_DIM)} / (q.nrm * c.nrm)"
    bucket = _sql_bucket_expr(g, _HP_MM)
    probe_vals = ", ".join(
        ["bucket"] + [_xor(g, "bucket", str(1 << p)) for p in range(_HP_MM.shape[0])]
    )
    probe_arr = ("array({})" if g.spark else "[{}]").format(probe_vals)
    return f"""
    WITH emb AS (SELECT doc_id, {arr} AS e FROM documents),
    en AS (SELECT doc_id, e, greatest(sqrt({sq}), {g.d(1e-30)}) AS nrm
           FROM emb),
    b AS (SELECT doc_id, e, nrm, CAST({bucket} AS BIGINT) AS bucket FROM en),
    probes AS (
        SELECT doc_id AS query_id, {_explode(g, probe_arr, 'pb')}
        FROM b WHERE doc_id < {n_queries}
    ),
    scored AS (
        SELECT p.query_id, c.doc_id AS neighbor_id, {cos} AS cos
        FROM probes p
        JOIN b c ON c.bucket = p.pb AND c.doc_id <> p.query_id
        JOIN b q ON q.doc_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
           {g.round2('cos')} AS cosine
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def sql_text_repetition(g: Gen) -> str:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    table A1 'repetition' block, adapted to single-line text): duplicate-token
    fraction (1 - distinct/total) and top-bigram fraction (occurrences of the
    most frequent adjacent word pair / total bigrams).  High values flag
    boilerplate and degenerate generations.  One explode + two grouped aggs,
    all JVM-side; the bigram count shuffle keys on (doc_id, gram) -- uniform,
    no skew."""
    toks = g.tokens("text")
    n = g.size("toks")
    nd = g.size(g.distinct("toks"))
    # guard the index range: Spark sequence(1, 0) yields the DESCENDING list
    # [1, 0] (DuckDB generate_series(1, 0) is empty), so a 1-token or
    # empty-text doc would hit element_at(toks, 0) and kill the job.  The
    # filter leaves only valid bigram start positions on both engines.
    idx = g.filter(g.seq("1", f"{n} - 1"), "i", f"i >= 1 AND i <= {n} - 1")
    bigrams = g.transform(
        idx, "i",
        f"{g.at('toks', 'i')} || ' ' || {g.at('toks', 'i + 1')}",
    )
    dbl = "CAST({} AS DOUBLE)".format
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    b AS (SELECT doc_id, {_explode(g, bigrams, 'gram')} FROM t),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM b GROUP BY doc_id, gram),
    m AS (SELECT doc_id, MAX(cnt) AS mx, SUM(cnt) AS tot FROM c GROUP BY doc_id)
    SELECT t.doc_id,
           CAST({n} AS BIGINT) AS n_tokens,
           {g.round2(f"{g.d(1.0)} - {dbl(nd)} / {dbl(n)}")} AS dup_token_frac,
           COALESCE({g.round2(f"{dbl('m.mx')} / {dbl('m.tot')}")}, {g.d(0.0)})
               AS top_bigram_frac
    FROM t LEFT JOIN m ON t.doc_id = m.doc_id
    ORDER BY t.doc_id
    """


# below the 25-docs-per-source testdata density so the cap actually binds
SAMPLE_PER_SOURCE_N = 15


def sql_sample_per_source(g: Gen, n: int = SAMPLE_PER_SOURCE_N,
                          salt: str = "cap-v1") -> str:
    """Per-source document cap (the 'max docs per domain' pipeline rule):
    keep the first ``n`` documents of each source in deterministic
    hash-of-doc_id order.  Hash order (vs rand()) makes the kept set stable
    across re-runs and incremental loads; one window over the source
    partition -- a single shuffle on source, and at scale a pre-aggregated
    count-per-source broadcast can short-circuit sources under the cap."""
    h = g.md5_32(f"'{salt}:' || {g.str_cast('doc_id')}")
    return f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {h}, doc_id) AS rn
        FROM documents
    ) t
    WHERE rn <= {n}
    ORDER BY doc_id
    """


def sql_text_normalize(g: Gen) -> str:
    """Canonical text normalization -- the pass that runs BEFORE exact dedup
    so formatting variants (case, punctuation, whitespace) hash identically.

    The corpus is already clean, so the query plants deterministic noise per
    document (uppercased prefix, doubled spaces, trailing punctuation -- the
    pii_scrub planting pattern) and normalizes BOTH variants: lowercase,
    non-alphanumerics to spaces, whitespace collapsed, trimmed.  The
    ``collapsed`` invariant (noisy and clean normalize to the same
    fingerprint, checked per row by the oracle hash) proves the operator
    actually erases the formatting differences dedup must not see.  One
    codegen'd projection; no shuffle, no UDF."""
    noisy = (
        "'  ' || upper(substring(text, 1, 5)) || substring(text, 6)"
        " || '  ...!!  '"
    )

    def norm(s: str) -> str:
        lowered = f"lower({s})"
        alnum = g.re_replace_all(lowered, "[^a-z0-9 ]", " ")
        collapsed = g.re_replace_all(alnum, " +", " ")
        return f"trim({collapsed})"

    return f"""
    WITH a AS (SELECT doc_id, text, {noisy} AS noisy FROM documents)
    SELECT doc_id,
           {norm('noisy')} AS norm_text,
           md5({norm('noisy')}) AS fingerprint,
           md5({norm('noisy')}) = md5({norm('text')}) AS collapsed
    FROM a
    ORDER BY doc_id
    """


def sql_corpus_stats(g: Gen) -> str:
    """Training-data accounting: docs / tokens / mean doc length per
    (source, lang) with ROLLUP subtotals -- the table a mixture designer
    reads before setting mix_weighted rates.  One partial+final grouped agg
    over JVM-side expressions; the rollup adds grouping-set rows, not extra
    scans.  avg_chars sums integer-valued doubles, so the float result is
    order-independent and exact across engines."""
    toks = g.tokens("text")
    return f"""
    WITH t AS (SELECT source, lang, CAST({g.size(toks)} AS BIGINT) AS n_tok,
                      n_chars
               FROM documents)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           {g.round2('AVG(CAST(n_chars AS DOUBLE))')} AS avg_chars
    FROM t
    GROUP BY ROLLUP(source, lang)
    ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
    """


def sql_emb_label_centroids(g: Gen, en_table: str | None = None) -> str:
    """Per-label embedding centroids in long form (label, dim, centroid_val,
    n_vectors) -- the building block for IVF training, class prototypes, and
    drift monitoring.  The corpus joins its label row once, cross-joins a
    64-row dimension table (broadcast), and one grouped AVG per (label, dim)
    does the rest; shuffle keys are uniform."""
    en_cte, en = _en_parts(g, en_table)
    return f"""
    WITH {en_cte}
    dims AS (SELECT {_explode(g, g.seq('1', str(EMB_DIM)), 'dim')}),
    j AS (
        SELECT CAST(l.label AS BIGINT) AS label, CAST(d.dim AS BIGINT) AS dim,
               {g.at('v.e', 'd.dim')} AS val
        FROM {en} v
        JOIN embeddings l ON l.vec_id = v.vec_id
        CROSS JOIN dims d
    )
    SELECT label, dim,
           {g.round2('AVG(val)')} AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM j GROUP BY label, dim
    ORDER BY label, dim
    """


def sql_sim_knn_classify(
    g: Gen, n_queries: int = 10, k: int = 5, en_table: str | None = None
) -> str:
    """KNN label prediction: majority vote over each query vector's top-k
    cosine neighbors' labels (ties -> smallest label).  The supervised
    consumer of the ANN surface: candidates come from the same multiprobe
    hyperplane-bucket equi-join as sim_topk_lsh (own bucket + hamming-1
    probes, ~9/256 of the corpus scored per query, corpus shuffled once on
    ``bucket`` -- no cross join of the full corpus), and the vote is one
    grouped count plus a rank-1 window over per-query label tallies.
    Deterministic hyperplanes keep the oracle on the identical candidate
    set."""
    cos = f"{_sql_dot(g, 'q.e', 'c.e')} / (q.nrm * c.nrm)"
    en_cte, en = _en_parts(g, en_table)
    probe_vals = ", ".join(
        ["bucket"] + [_xor(g, "bucket", str(1 << p)) for p in range(_HP.shape[0])]
    )
    probe_arr = ("array({})" if g.spark else "[{}]").format(probe_vals)
    return f"""
    WITH {en_cte}
    b AS (SELECT vec_id, e, nrm,
                 CAST({_sql_bucket_expr(g, _HP)} AS BIGINT) AS bucket
          FROM {en}),
    probes AS (
        SELECT vec_id AS query_id, {_explode(g, probe_arr, 'pb')}
        FROM b WHERE vec_id < {n_queries}
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id, {cos} AS cos
        FROM probes p
        JOIN b c ON c.bucket = p.pb AND c.vec_id <> p.query_id
        JOIN b q ON q.vec_id = p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    ),
    votes AS (
        SELECT r.query_id, CAST(l.label AS BIGINT) AS label,
               COUNT(*) AS votes
        FROM ranked r JOIN embeddings l ON l.vec_id = r.neighbor_id
        WHERE r.rnk <= {k}
        GROUP BY r.query_id, l.label
    ),
    best AS (
        SELECT query_id, label, votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, label) AS vr
        FROM votes
    )
    SELECT query_id, label AS predicted_label, CAST(votes AS BIGINT) AS votes
    FROM best WHERE vr = 1
    ORDER BY query_id
    """


# ---------------------------------------------------------------------------
# dedup_substring: duplicated fixed-length token spans across documents
# (exact-substring dedup a la Lee et al. 2022 "Deduplicating Training Data
# Makes Language Models Better" -- the suffix-array pass re-expressed as a
# rolling-window fingerprint join: every W-token window is fingerprinted and
# windows occurring in >= 2 distinct documents are the duplicated spans).
# ---------------------------------------------------------------------------

SUBSTR_W = 10  # span width in tokens


def sql_dedup_substring(g: Gen, w: int = SUBSTR_W, sh_table: str | None = None) -> str:
    """Duplicated W-token spans: explode all sliding windows (stride 1),
    fingerprint each, keep fingerprints spanning >= 2 distinct docs.

    Scale: ~n_tokens windows per doc, grouped on a uniform 60-bit BIGINT
    fingerprint (md5-derived; the 32-char hex STRING key would make this --
    the operator's widest exchange -- ~4x wider at 100 TB) -- partial+final
    agg, one shuffle; no pairwise comparison anywhere (the suffix array of
    the reference approach is replaced by the group-by).  ``sh_table`` is
    accepted for signature uniformity but unused: spans are stride-1
    windows, not the distinct 3-gram shingle set."""
    toks = g.tokens("text")
    n = g.size("toks")
    windows = g.transform(
        g.seq("1", f"{n} - {w - 1}"),
        "i",
        g.join(g.slice("toks", "i", w), " "),
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    wins AS (
        SELECT doc_id, {_explode(g, windows, "win")}
        FROM t WHERE {n} >= {w}
    ),
    d AS (SELECT DISTINCT doc_id, {g.md5_60('win')} AS span_fp FROM wins)
    SELECT span_fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM d
    GROUP BY span_fp
    HAVING COUNT(*) >= 2
    ORDER BY span_fp
    """


# ---------------------------------------------------------------------------
# ngram_topk: corpus-wide heavy-hitter n-grams (document frequency top-k)
# ---------------------------------------------------------------------------


def sql_ngram_topk(g: Gen, k: int = 50, sh_table: str | None = None) -> str:
    """Top-k 3-gram shingles by document frequency.  The shingle set is
    distinct per doc, so COUNT(*) per gram IS document frequency; top-k over
    the grouped counts is TakeOrderedAndProject (no global sort).  Ties
    break on the gram text so the cut is deterministic."""
    sh = sh_table or "sh"
    sh_cte = f"WITH sh AS ({sql_shingle_cte(g)})" if not sh_table else ""
    return f"""
    {sh_cte}
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, {_explode(g, "s", "gram")} FROM {sh}) e
    GROUP BY gram
    ORDER BY doc_freq DESC, gram
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# sample_quality_weighted: deterministic importance sampling by quality score
# ---------------------------------------------------------------------------


def sql_sample_quality_weighted(g: Gen, salt: str = "qw-v1") -> str:
    """Keep each document with probability equal to its quality score (the
    same 0..1 composite as text_quality), via the stable hash-threshold
    trick: kept iff md5(salt:doc_id)%10000 < floor(quality*10000).

    Stable across re-runs and monotone in the score -- improving a doc's
    quality can only add it to the sample; no rand(), no global state."""
    toks = g.tokens("text")
    stop_hits = g.size(g.filter("toks", "t", f"t IN {g.strlist(STOPWORDS)}"))
    n = g.size("toks")
    nd = g.size(g.distinct("toks"))
    dbl = "CAST({} AS DOUBLE)".format
    quality = (
        f"{g.d(0.4)} * least({g.d(1.0)}, {dbl(n)} / {g.d(100.0)})"
        f" + {g.d(0.4)} * ({dbl(nd)} / {dbl(n)})"
        f" + {g.d(0.2)} * ({g.d(1.0)} - {dbl(stop_hits)} / {dbl(n)})"
    )
    h = g.md5_32(f"'{salt}:' || {g.str_cast('doc_id')}")
    return f"""
    WITH t AS (SELECT doc_id, {g.tokens('text')} AS toks FROM documents),
    q AS (SELECT doc_id, {quality} AS quality, {h} % 10000 AS bucket FROM t)
    SELECT doc_id, {g.round2('quality')} AS quality2
    FROM q
    WHERE bucket < CAST(FLOOR(quality * 10000) AS BIGINT)
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# emb_quantize: symmetric int8 quantization of embedding vectors
# ---------------------------------------------------------------------------


def sql_emb_quantize(g: Gen) -> str:
    """Per-vector symmetric int8 quantization: scale = 127 / max|x|,
    q_i = round_half_up(x_i * scale).  Output is the per-vector summary
    (scale, exact integer checksum, min/max quantized value) -- integer
    folds are order-independent, so cross-engine parity is exact without
    emitting 64 columns or an array (which the value-hash cannot compare).

    Scale: pure per-row expression work, zero shuffles beyond the scan."""
    elems = g.transform(
        g.seq("1", str(EMB_DIM)), "i",
        f"CAST({g.at('embedding', 'i')} AS DOUBLE)",
    )
    absmax = g.amax(g.transform("e", "x", "abs(x)"))
    qvec = g.transform(
        "e", "x", f"CAST(FLOOR(x * scale + {g.d(0.5)}) AS BIGINT)"
    )
    return f"""
    WITH ev AS (SELECT vec_id, {elems} AS e FROM embeddings),
    s AS (
        SELECT vec_id, e,
               {g.d(127.0)} / greatest({absmax}, {g.d(1e-12)}) AS scale
        FROM ev
    ),
    q AS (SELECT vec_id, scale, {qvec} AS qv FROM s)
    SELECT vec_id,
           {g.round2('scale')} AS scale2,
           {g.fold_sum_long('qv')} AS q_sum,
           CAST({g.amin('qv')} AS BIGINT) AS q_min,
           CAST({g.amax('qv')} AS BIGINT) AS q_max
    FROM q
    ORDER BY vec_id
    """



def sql_text_unigram_nll(g: Gen) -> str:
    """Unigram-LM negative log-likelihood per document -- the CCNet-style
    perplexity quality signal: documents whose words are corpus-atypical
    score high (gibberish / boilerplate candidates for filtering).

    Plan: corpus word frequencies are ONE partial+final agg over the
    exploded token stream; the scalar token total is a 1-row cross join;
    per-doc scoring joins tokens back to the frequency table.  At 100 TB
    the frequency join key is Zipf-skewed -- AQE skew-join splitting (on in
    session.py) handles the hot words, and the frequency table itself is
    broadcastable once pruned to the model vocabulary.

    Cross-engine determinism: ln/exp may differ in the last ulp between
    libm implementations and the per-doc AVG is accumulation-order
    dependent (~1e-15 relative); rounding avg_nll to 6 decimals and ppl to
    2 leaves 9+ orders of magnitude of margin."""
    w = g.explode(g.tokens("text"), "word")
    nll = "-ln(CAST(f.c AS DOUBLE) / CAST(t.n AS DOUBLE))"
    return f"""
    WITH w AS (SELECT doc_id, {w} FROM documents),
    f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY word),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           {g.round2(f'AVG({nll})', 6)} AS avg_nll,
           {g.round2(f'exp(AVG({nll}))', 2)} AS ppl
    FROM w JOIN f ON w.word = f.word CROSS JOIN t
    GROUP BY w.doc_id
    ORDER BY w.doc_id
    """


def sql_text_ccnet_buckets(g: Gen) -> str:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the unigram-LM negative log-likelihood (the same model as
    ``text_unigram_nll``) and split the corpus into head / middle / tail
    thirds by the corpus-wide NLL tercile cutpoints -- head = most fluent,
    the slice CCNet keeps for LM training.

    Plan: the per-doc score is the unigram_nll partial+final agg chain; the
    cutpoints are ONE 2-value scalar aggregate that cross-joins (broadcasts)
    back onto the docs, so bucketing itself is map-side -- no global sort,
    no NTILE single-partition window.  At 100 TB the exact ``percentile``
    (which materializes the value multiset) swaps for ``percentile_approx``
    cutpoints with no plan-shape change; the gate uses the exact form
    because both engines define it identically (linear interpolation at
    p*(n-1)), keeping the oracle hash-comparable.

    Cross-engine determinism: avg_nll is rounded to 6 decimals BEFORE the
    cutpoint aggregate, the interpolated cutpoints are rounded to 6, and
    bucket boundaries compare rounded-to-rounded (<=), so both engines
    bucket identically unless an interpolation differs by >= 5e-7 (it is
    exact rational arithmetic over identical inputs on both sides).
    """
    w = g.explode(g.tokens("text"), "word")
    nll = "-ln(CAST(f.c AS DOUBLE) / CAST(t.n AS DOUBLE))"
    pctl = "percentile" if g.spark else "quantile_cont"
    third = "CAST(1.0 AS DOUBLE) / 3.0" if not g.spark else "1.0D / 3.0D"
    two_thirds = "CAST(2.0 AS DOUBLE) / 3.0" if not g.spark else "2.0D / 3.0D"
    return f"""
    WITH w AS (SELECT doc_id, {w} FROM documents),
    f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY word),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
    doc AS (
        SELECT w.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               {g.round2(f'AVG({nll})', 6)} AS avg_nll
        FROM w JOIN f ON w.word = f.word CROSS JOIN t
        GROUP BY w.doc_id
    ),
    cut AS (
        SELECT {g.round2(f'{pctl}(avg_nll, {third})', 6)} AS c1,
               {g.round2(f'{pctl}(avg_nll, {two_thirds})', 6)} AS c2
        FROM doc
    )
    SELECT doc.doc_id, doc.n_tokens, doc.avg_nll,
           CASE WHEN doc.avg_nll <= cut.c1 THEN 'head'
                WHEN doc.avg_nll <= cut.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM doc CROSS JOIN cut
    ORDER BY doc.doc_id
    """


# ---------------------------------------------------------------------------
# dedup_boilerplate: corpus-frequency span removal (CCNet-style boilerplate
# stripping re-expressed at k-gram granularity -- the testdata documents are
# single-line word bags, so the "repeated line" unit is a k-token window)
# ---------------------------------------------------------------------------

def sql_dedup_boilerplate(g: Gen, k: int = 3, min_df: int = 4) -> str:
    """Strip boilerplate spans: any token position covered by a k-gram that
    occurs in >= ``min_df`` distinct documents is removed, and each document
    is reassembled from its surviving tokens (in order).  Output one row per
    document: (doc_id, clean_text, n_removed).

    This is the rewrite counterpart of ``dedup_substring``: that query
    *identifies* cross-document duplicated windows, this one *applies* the
    removal and emits the cleaned corpus -- the CCNet / RefinedWeb
    boilerplate-removal step of a training-data pipeline.

    Scale posture (100 TB): the gram-DF aggregate is partial+final on the
    gram key (hot boilerplate grams pre-aggregate map-side); the high-DF
    gram set is the head of the Zipf curve -- tiny by construction -- so
    the occurrence join broadcasts it; coverage expansion is a map-side
    ``explode`` of k rows per hit; the keep anti-join and the reassembly
    agg both shuffle once on the uniform (doc_id) key.  No all-pairs, no
    data-sized driver state.
    """
    toks = g.tokens("text")
    gram = g.join(g.slice("toks", "p", k), " ")
    return f"""
    WITH tn AS (SELECT doc_id, {toks} AS toks, {g.size(toks)} AS n
                FROM documents),
    pos AS (SELECT doc_id, toks, n, {g.explode_seq('1', 'n', 'p')}
            FROM tn),
    occ AS (SELECT doc_id, p, {gram} AS gram FROM pos
            WHERE p <= n - {k - 1}),
    boiler AS (
        SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gram
        ) f WHERE df >= {min_df}
    ),
    hits AS (SELECT o.doc_id, o.p FROM occ o
             JOIN boiler b ON o.gram = b.gram),
    cov AS (SELECT DISTINCT doc_id, cp FROM (
                SELECT doc_id, {g.explode_seq('p', f'p + {k - 1}', 'cp')}
                FROM hits) h),
    tokpos AS (SELECT doc_id, i, {g.at('toks', 'i')} AS tok FROM (
                   SELECT doc_id, toks, {g.explode_seq('1', 'n', 'i')}
                   FROM tn) x),
    keep AS (
        SELECT tp.doc_id, tp.i, tp.tok
        FROM tokpos tp LEFT JOIN cov c
          ON tp.doc_id = c.doc_id AND tp.i = c.cp
        WHERE c.doc_id IS NULL
    ),
    reasm AS (
        SELECT doc_id, {g.ordered_join_agg('tok', 'i', ' ')} AS clean_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM keep GROUP BY doc_id
    )
    SELECT tn.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(tn.n - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM tn LEFT JOIN reasm r ON tn.doc_id = r.doc_id
    ORDER BY tn.doc_id
    """


# ---------------------------------------------------------------------------
# corpus_ngram_novelty: per-document novelty vs everything earlier
# ---------------------------------------------------------------------------

def sql_corpus_ngram_novelty(g: Gen, k: int = 3, sh_table: str | None = None) -> str:
    """Share of each document's distinct k-grams first introduced BY that
    document (first appearance = minimal doc_id over the corpus).  The
    curation metric behind temporal dataset mixing: a crawl snapshot whose
    novelty collapses is re-crawling what the corpus already holds.

    Scale posture: first-appearance is ``MIN(doc_id) OVER (PARTITION BY
    gram)`` -- ONE shuffle of the gram stream, no self-join, and the
    shingle expansion is evaluated once (the join form inlined the shingle
    CTE into both sides, doubling the HOF work AND adding a large-large
    join: 6.3 s -> 2 s at sf0.1); the per-doc rollup then shuffles once on
    the uniform doc_id key.

    ``sh_table`` substitutes the shared staged shingle view on the Spark
    side (r12): through r11 this query silently rode the staged view via
    Spark's cache-manager subtree matching (its inline CTE was plan-equal
    to the persisted view), but the r12 staging-time repartition wrapped
    the cached plan in a Repartition node the inline CTE no longer
    matches, so the query went back to re-shingling the corpus per run
    (bench: 0.5 s -> 3.6 s).  Explicit is better than coincidental: the
    Spark builder now names the view like every other shingle consumer.
    The DuckDB oracle keeps the inline CTE.
    """
    sh = sh_table or "sh"
    sh_cte = f"sh AS ({sql_shingle_cte(g, k)})," if not sh_table else ""
    return f"""
    WITH {sh_cte}
    e AS (SELECT doc_id, {_explode(g, 's', 'gram')} FROM {sh}),
    w AS (SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
          FROM e)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           {g.round2(
               'CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)'
               ' AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)', 4)} AS novelty
    FROM w
    GROUP BY doc_id
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# sample_dsir: Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------


def sql_sample_dsir(g: Gen, n_buckets: int = 512, target_lang: str = "en") -> str:
    """DSIR importance scoring: rank raw documents by how target-like their
    hashed-n-gram feature distribution is, the standard pretraining-corpus
    selection method (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling").

    Features are hashed unigram buckets (md5 % n_buckets) -- hashing bounds
    the model at ``n_buckets`` counts regardless of vocabulary size, which
    is the whole trick that makes the method 100 TB-viable: the target and
    raw bucket-count tables are each one partial+final agg over the exploded
    token stream, the smoothed log-ratio table is ``n_buckets`` rows
    (broadcast), and per-doc scoring is one more agg.  The token->bucket
    join key is Zipf-skewed like every word-frequency join here; AQE skew
    split handles it (session.py).

    Target distribution = documents with ``lang = target_lang`` (select
    raw-corpus docs that look like the curated English slice).  Laplace
    +1 smoothing keeps every bucket finite.  Per-doc score = mean over
    tokens of ln(p_target(bucket)/p_raw(bucket)), rounded to 6 decimals
    BEFORE selection so the keep flag derives from values both engines
    already agree on.  ``keep`` = top quartile by (score DESC, doc_id) --
    rank-based selection is the actual DSIR resampling step and is exactly
    deterministic; the global sort it implies is how the small-scale spec
    reads, while at 100 TB production thresholds on an approximate score
    quantile instead (one scalar agg, no global sort).
    """
    w = g.explode(g.tokens("text"), "word")
    nb = g.d(float(n_buckets))
    logratio = (
        f"ln((CAST(COALESCE(tc.c, 0) AS DOUBLE) + {g.d(1.0)})"
        f" / (CAST(tn.n AS DOUBLE) + {nb}))"
        f" - ln((CAST(rc.c AS DOUBLE) + {g.d(1.0)})"
        f" / (CAST(rn.n AS DOUBLE) + {nb}))"
    )
    return f"""
    WITH w AS (SELECT doc_id, lang, {g.md5_32('word')} % {n_buckets} AS b
               FROM (SELECT doc_id, lang, {w} FROM documents)),
    rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY b),
    tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM w
           WHERE lang = '{target_lang}' GROUP BY b),
    rn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
    tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w
           WHERE lang = '{target_lang}'),
    lr AS (SELECT rc.b, {logratio} AS lr
           FROM rc LEFT JOIN tc ON rc.b = tc.b
           CROSS JOIN rn CROSS JOIN tn),
    s AS (SELECT {g.bc_hint('lr')}w.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 {g.round2('AVG(lr.lr)', 6)} AS dsir_score
          FROM w JOIN lr ON w.b = lr.b
          GROUP BY w.doc_id)
    SELECT doc_id, n_tokens, dsir_score,
           CAST(ROW_NUMBER() OVER (ORDER BY dsir_score DESC, doc_id)
                <= {g.idiv('(COUNT(*) OVER () + 3)', '4')} AS BOOLEAN) AS keep
    FROM s ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# mix_token_budget: UniMax-style epoch-capped waterfill allocation
# ---------------------------------------------------------------------------


def sql_mix_token_budget(
    g: Gen,
    epoch_cap: int = 2,
    src_rows: list[tuple[str, int]] | None = None,
    budget: int | None = None,
) -> str:
    """Allocate a total training-token budget across sources with a
    per-source repeat cap -- the UniMax mixing rule (Chung et al. 2023):
    spread the budget as uniformly as possible, but never take more than
    ``epoch_cap`` epochs of any source.

    The sequential spec ("give each remaining source an equal share;
    sources whose cap is below their share are frozen at the cap and the
    leftover is re-spread") collapses to a closed form because caps sorted
    ascending freeze as a PREFIX: source i (1-based, cap ascending) is
    capped iff cap_i * (n - i + 1) + cumcap_{i-1} <= budget, and that
    predicate is monotone non-increasing in i (if it fails at i it fails at
    every j > i since cap_j >= cap_i).  Everything up to the final division
    is BIGINT window math -- cross-engine exact; only the uncapped share is
    a rounded double.

    Scale: one partial+final agg to ~n_sources rows, then window functions
    over that metadata-scale table -- a single-partition sort of a few
    hundred rows even at 100 TB.  Budget = half the corpus (integer floor),
    so the query is self-contained and scale-free.

    ``src_rows``/``budget`` replace the documents-derived source table and
    the half-corpus budget with explicit literals -- the hypothesis fuzz
    harness uses them to drive the closed form over arbitrary (source,
    n_tok) distributions (tests/test_waterfill_property.py)."""
    toks = g.tokens("text")
    if src_rows is not None:
        vals = ", ".join(f"('{s}', CAST({n} AS BIGINT))" for s, n in src_rows)
        src_sql = (
            f"SELECT * FROM (VALUES {vals}) AS t(source, n_tok)"
            if not g.spark
            else f"SELECT * FROM VALUES {vals} AS t(source, n_tok)"
        )
    else:
        src_sql = (
            f"SELECT source, CAST(SUM({g.size(toks)}) AS BIGINT) AS n_tok\n"
            f"        FROM documents GROUP BY source"
        )
    budget_sql = (
        f"CAST({budget} AS BIGINT)"
        if budget is not None
        else f"CAST({g.idiv('SUM(n_tok)', '2')} AS BIGINT)"
    )
    uncapped_share = (
        "CAST(budget - capped_sum AS DOUBLE) / CAST(n_uncapped AS DOUBLE)"
    )
    alloc = (
        f"CASE WHEN capped = 1 THEN CAST(cap AS DOUBLE)"
        f" ELSE {uncapped_share} END"
    )
    epochs = (
        f"CASE WHEN capped = 1 THEN CAST({epoch_cap} AS DOUBLE)"
        f" ELSE {uncapped_share} / CAST(n_tok AS DOUBLE) END"
    )
    return f"""
    WITH src AS (
        {src_sql}
    ),
    tot AS (SELECT {budget_sql} AS budget,
                   CAST(COUNT(*) AS BIGINT) AS n_src
            FROM src),
    ranked AS (
        SELECT source, n_tok, n_tok * {epoch_cap} AS cap,
               ROW_NUMBER() OVER (ORDER BY n_tok * {epoch_cap}, source) AS i,
               SUM(n_tok * {epoch_cap}) OVER (
                   ORDER BY n_tok * {epoch_cap}, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS cumcap_prev
        FROM src
    ),
    flagged AS (
        SELECT r.source, r.n_tok, r.cap,
               CASE WHEN r.cap * (t.n_src - r.i + 1)
                         + COALESCE(r.cumcap_prev, 0) <= t.budget
                    THEN 1 ELSE 0 END AS capped,
               t.budget, t.n_src
        FROM ranked r CROSS JOIN tot t
    ),
    solved AS (
        SELECT source, n_tok, cap, capped, budget,
               SUM(capped * cap) OVER () AS capped_sum,
               SUM(1 - capped) OVER () AS n_uncapped
        FROM flagged
    )
    SELECT source,
           n_tok AS n_tokens,
           CAST(cap AS BIGINT) AS cap_tokens,
           CAST(capped AS BOOLEAN) AS capped,
           {g.round2(alloc)} AS alloc_tokens,
           {g.round2(epochs, 4)} AS epochs
    FROM solved
    ORDER BY source
    """


# ---------------------------------------------------------------------------
# corpus_kmv_cardinality: k-minimum-values distinct-count sketch
# ---------------------------------------------------------------------------


def sql_corpus_kmv_cardinality(
    g: Gen, k: int = 256, sh_table: str | None = None
) -> str:
    """Distinct 3-gram cardinality estimate via the KMV (k-minimum-values)
    sketch (Bar-Yossef et al. 2002): hash every distinct shingle to a
    uniform 32-bit value, keep the k smallest, estimate
    distinct = (k-1) * 2^32 / h_(k).  Output is one row: the estimate next
    to the exact count and the relative error, so the sketch's accuracy
    claim (~1/sqrt(k) = ~6% at k=256) is itself part of the checked
    result.  3-gram shingles, not words: the synthetic corpus has ~31
    distinct words, which would only ever exercise the small-set branch,
    while its ~16k distinct shingles at sf0.01 drive the real estimator.

    Unlike engine-native approx_count_distinct (whose HLL internals differ
    per engine and can never hash-match an oracle), KMV built from md5 is
    DETERMINISTIC and engine-independent -- the same sketch a 100 TB
    cardinality pass would compute: one distinct-agg shuffle, then a
    global smallest-k (TakeOrderedAndProject, k rows to the driver-side
    reduce -- the sketch itself is the only thing that leaves the
    executors, which is the entire point of sketching at scale).  Fewer
    than k distinct values -> the sketch holds them all and is exact (the
    KMV small-set convention)."""
    est = (
        f"CAST({k} - 1 AS DOUBLE) * {g.d(4294967296.0)}"
        f" / CAST(kth.h AS DOUBLE)"
    )
    sh = sh_table or "sh"
    sh_cte = f"sh AS ({sql_shingle_cte(g)})," if not sh_table else ""
    return f"""
    WITH {sh_cte}
    h AS (SELECT DISTINCT {g.md5_32('gram')} AS h
          FROM (SELECT {_explode(g, 's', 'gram')} FROM {sh})),
    exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h),
    mins AS (SELECT h FROM h ORDER BY h LIMIT {k}),
    kth AS (SELECT MAX(h) AS h, CAST(COUNT(*) AS BIGINT) AS n_in
            FROM mins)
    SELECT exact.n AS n_distinct_exact,
           CAST({k} AS BIGINT) AS k,
           kth.h AS kth_hash,
           {g.round2(f"CASE WHEN kth.n_in < {k} THEN CAST(kth.n_in AS DOUBLE) ELSE {est} END")}
               AS est_distinct,
           {g.round2(f"(CASE WHEN kth.n_in < {k} THEN CAST(kth.n_in AS DOUBLE) ELSE {est} END - CAST(exact.n AS DOUBLE)) / CASE WHEN exact.n = 0 THEN {g.d(1.0)} ELSE CAST(exact.n AS DOUBLE) END", 4)}
               AS rel_err
    FROM exact CROSS JOIN kth
    """


# ---------------------------------------------------------------------------
# dedup_bloom: Bloom-filter membership sketch for batch-vs-corpus dedup
# ---------------------------------------------------------------------------


def sql_dedup_bloom(
    g: Gen,
    w: int = SUBSTR_W,
    batch_mod: int = 10,
    m_bits: int = 8388608,
    n_hashes: int = 3,
    span_table: str | None = None,
) -> str:
    """Batch-vs-corpus shared-span detection through a Bloom filter: the
    corpus's W-token span fingerprints (the same stride-1 ``md5_60``
    windows as ``dedup_substring``) are compressed into an ``m_bits``
    bitmap -- ceil(m/63) BIGINT words built by ONE bit_or aggregation --
    and every span of tonight's batch (``doc_id % batch_mod`` slice,
    mirroring ``dedup_incremental``) probes its ``n_hashes`` positions.
    A span is a Bloom hit when all probed bits are set; a document is
    ``maybe_dup`` when any of its spans hits.

    The exact span join (``n_exact_hits`` / ``actual_dup``) sits next to
    the sketch verdict in the output, so the Bloom contract -- NO false
    negatives, bounded false positives -- is part of the hash-checked
    result; tests/test_ext_queries.py pins no-FN and the FP budget.  At
    production scale the exact columns are dropped: the ~130k-word bitmap
    (1 MB at m=2^23) is the ONLY corpus derivative the probe touches, so
    membership is a broadcast map-side check -- no span-level join, no
    shuffle of the corpus.  Sizing: fill = k*n_spans/m; the FP rate per
    span is fill^k, compounded over ~n_tokens spans per document (m=2^23
    holds per-span FP under 4e-4 at sf0.1's ~200k corpus spans; a 10^12-
    span corpus shards the bitmap by fingerprint prefix and co-partitions
    probes -- the per-shard shape is exactly this query).  Bits use
    63-bit words: DuckDB raises on a shift into the BIGINT sign bit where
    Spark wraps.  Positions come from slot-salted md5 -- deterministic on
    both engines, so even the FPs hash-match the oracle."""
    toks = g.tokens("text")
    n = g.size("toks")
    windows = g.transform(
        g.seq("1", f"{n} - {w - 1}"),
        "i",
        g.join(g.slice("toks", "i", w), " "),
    )
    is_new = f"doc_id % {batch_mod} = {batch_mod - 1}"
    slot_key = f"{g.str_cast('slot')} || ':' || {g.str_cast('sfp')}"
    pos = f"{g.md5_32(slot_key)} % {m_bits}"
    # Spark inlines WITH-CTEs, so the stride-1 window computation -- the
    # operator's dominant cost -- would run once per reference (3x: corpus
    # bitmap, batch probes, exact check).  span_table points at the
    # persisted (doc_id, sfp) staging view (_span_view), the same
    # compute-once pattern as the shingle/signature views.
    if span_table:
        spans_cte = f"spans AS (SELECT doc_id, sfp FROM {span_table}),"
    else:
        spans_cte = f"""t AS (SELECT doc_id, {toks} AS toks FROM documents),
    wins AS (
        SELECT doc_id, {_explode(g, windows, "win")}
        FROM t WHERE {n} >= {w}
    ),
    spans AS (SELECT DISTINCT doc_id, {g.md5_60('win')} AS sfp FROM wins),"""
    return f"""
    WITH {spans_cte}
    cspan AS (SELECT DISTINCT sfp FROM spans WHERE NOT ({is_new})),
    cpos AS (
        SELECT {pos} AS pos
        FROM (SELECT sfp, {g.explode_seq('1', str(n_hashes), 'slot')}
              FROM cspan) c
    ),
    bm AS (
        SELECT {g.idiv('pos', '63')} AS w,
               bit_or({g.shl1('pos % 63')}) AS bits
        FROM cpos GROUP BY 1
    ),
    npos AS (
        SELECT doc_id, sfp, {pos} AS pos
        FROM (SELECT doc_id, sfp, {g.explode_seq('1', str(n_hashes), 'slot')}
              FROM spans WHERE {is_new}) b
    ),
    probe AS (
        SELECT {g.bc_hint('bm')}n.doc_id, n.sfp,
               CASE WHEN bm.bits IS NOT NULL
                         AND (bm.bits & {g.shl1('n.pos % 63')}) <> 0
                    THEN 1 ELSE 0 END AS hit
        FROM npos n LEFT JOIN bm ON {g.idiv('n.pos', '63')} = bm.w
    ),
    span_verdict AS (
        SELECT doc_id, sfp,
               CASE WHEN SUM(hit) = {n_hashes} THEN 1 ELSE 0 END AS bloom_hit
        FROM probe GROUP BY doc_id, sfp
    ),
    doc_verdict AS (
        SELECT {g.bc_hint('c')}v.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(v.bloom_hit) AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN c.sfp IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_hits
        FROM span_verdict v LEFT JOIN cspan c ON c.sfp = v.sfp
        GROUP BY v.doc_id
    )
    SELECT doc_id, n_spans, n_bloom_hits, n_exact_hits,
           CAST(n_bloom_hits > 0 AS BOOLEAN) AS maybe_dup,
           CAST(n_exact_hits > 0 AS BOOLEAN) AS actual_dup
    FROM doc_verdict
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# events_ewma: per-user exponentially-weighted moving average
# ---------------------------------------------------------------------------


EWMA_SEGMENT_LEN = 1024


def sql_events_ewma(g: Gen, alpha: float = 0.3) -> str:
    """Per-user EWMA of event values in timestamp order -- the classic
    recursive time-series feature (ewma_i = a*v_i + (1-a)*ewma_{i-1},
    seeded at the first value) that neither engine has as a built-in
    aggregate because it is order-dependent and non-associative in its
    naive form.

    The recurrence IS segment-associative: a value segment folds to the
    affine map ewma_out = d*ewma_in + p with d = (1-a)^len and
    p = sum_i a*v_i*(1-a)^(len-i), and consecutive segments compose as
    (d1*d2, p2 + d2*p1).  Seeding at the first value is the same map
    applied to acc0 = v_first (proof: for N=1, a*v1 + (1-a)*v1 = v1; the
    missing (1-a)^(N-1)*v1 vs a*(1-a)^(N-1)*v1 difference is exactly
    d_total*v1).

    Spark planned shape (the 100 TB-safe default): ROW_NUMBER orders each
    user's events (ts, event_id -- a total order), events group into
    EWMA_SEGMENT_LEN-sized segments, each (user, seg) group folds its
    bounded sorted slice to (d, p), and a second per-user fold composes the
    segment maps in order.  No executor ever materializes a full user
    history: per-key state is max(segment_len, n_events/segment_len), so a
    10^8-event hot key carries ~10^5 tiny structs instead of 10^8 events
    (`tests/test_ext_queries.py::test_events_ewma_hot_key_bounded_state`;
    the no-unbounded-collect shape is pinned by a plan contract).

    DuckDB oracle mirrors the SAME segmented algebra op-for-op (list_reduce
    over the identical segment slices, identical multiply/add expression
    trees), so the two engines produce bit-identical doubles and the
    exact-hash gate has zero rounding-boundary exposure (ADVICE r6: a value
    within reassociation noise of a FLOOR(x*1e6+0.5) boundary could
    otherwise round differently per engine).  Independence of the check is
    preserved elsewhere: ``test_events_ewma_matches_pandas`` compares this
    plan against pandas' sequential ``ewm(adjust=False)`` spec with a 2e-6
    tolerance, and the hot-key test folds the recurrence in pure Python."""
    a, one_m = g.d(alpha), g.d(1.0 - alpha)
    if g.spark:
        w = EWMA_SEGMENT_LEN
        seg_fold = (
            "aggregate("
            "transform(array_sort(collect_list(struct(rn, value))), s -> s.value), "
            "named_struct('d', CAST(1.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE)), "
            f"(acc, x) -> named_struct('d', acc.d * {one_m}, "
            f"'p', {a} * x + {one_m} * acc.p))"
        )
        comb_fold = (
            "aggregate("
            "array_sort(collect_list(named_struct("
            "'seg', seg, 'd', dp.d, 'p', dp.p))), "
            "named_struct('d', CAST(1.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE)), "
            "(acc, s) -> named_struct('d', acc.d * s.d, "
            "'p', s.p + s.d * acc.p))"
        )
        return f"""
        WITH ordered AS (
          SELECT user_id, ts, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ),
        segs AS (
          SELECT user_id,
                 CAST(FLOOR((rn - 1) / {w}) AS BIGINT) AS seg,
                 {seg_fold} AS dp,
                 MIN(CASE WHEN rn = 1 THEN value END) AS first_v,
                 COUNT(*) AS n,
                 MAX(ts) AS mts
          FROM ordered
          GROUP BY user_id, CAST(FLOOR((rn - 1) / {w}) AS BIGINT)
        ),
        comb AS (
          SELECT user_id,
                 {comb_fold} AS t,
                 SUM(n) AS n_events,
                 MAX(mts) AS last_ts,
                 MAX(CASE WHEN seg = 0 THEN first_v END) AS first_v
          FROM segs
          GROUP BY user_id
        )
        SELECT user_id,
               CAST(n_events AS BIGINT) AS n_events,
               last_ts,
               {g.round2('t.p + t.d * first_v', 6)} AS ewma6
        FROM comb
        ORDER BY user_id
        """
    w = EWMA_SEGMENT_LEN
    # Same fold, same op order as the Spark plan: element carries x in .p,
    # seg fold does (acc.d * one_m, a*x + one_m*acc.p), segment compose does
    # (acc.d * s.d, s.p + s.d * acc.p) -- identical expression trees give
    # bit-identical IEEE doubles, so the FLOOR snap below can never disagree.
    seg_fold = (
        "list_reduce("
        "list_prepend({'d': CAST(1.0 AS DOUBLE), 'p': CAST(0.0 AS DOUBLE)}, "
        "list_transform(list(value ORDER BY rn), "
        "x -> {'d': CAST(0.0 AS DOUBLE), 'p': CAST(x AS DOUBLE)})), "
        f"(acc, e) -> {{'d': acc.d * {one_m}, "
        f"'p': {a} * e.p + {one_m} * acc.p}})"
    )
    comb_fold = (
        "list_reduce("
        "list_prepend({'d': CAST(1.0 AS DOUBLE), 'p': CAST(0.0 AS DOUBLE)}, "
        "list_transform(list({'d': dp.d, 'p': dp.p} ORDER BY seg), "
        "s -> {'d': s.d, 'p': s.p})), "
        "(acc, s) -> {'d': acc.d * s.d, 'p': s.p + s.d * acc.p})"
    )
    return f"""
    WITH ordered AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    segs AS (
      SELECT user_id,
             CAST(FLOOR((rn - 1) / {w}) AS BIGINT) AS seg,
             {seg_fold} AS dp,
             MIN(CASE WHEN rn = 1 THEN value END) AS first_v,
             COUNT(*) AS n,
             MAX(ts) AS mts
      FROM ordered
      GROUP BY user_id, CAST(FLOOR((rn - 1) / {w}) AS BIGINT)
    ),
    comb AS (
      SELECT user_id,
             {comb_fold} AS t,
             SUM(n) AS n_events,
             MAX(mts) AS last_ts,
             MAX(CASE WHEN seg = 0 THEN first_v END) AS first_v
      FROM segs
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           last_ts,
           {g.round2('t.p + t.d * first_v', 6)} AS ewma6
    FROM comb
    ORDER BY user_id
    """


# ---------------------------------------------------------------------------
# events_funnel: ordered multi-stage conversion funnel
# ---------------------------------------------------------------------------


def sql_events_funnel(g: Gen, window_hours: int = 24) -> str:
    """WINDOWED conversion funnel view -> click -> purchase with per-stage
    conversion ratios -- the attribution form of ``q30_funnel`` (which is
    the ever-eventually funnel: any later event counts, so on dense data
    every user converts).  Here a user counts for stage N only with an
    event of that type strictly AFTER their stage-N-1 entry time AND
    within ``window_hours`` of it (first-touch semantics: each stage
    anchors at the EARLIEST qualifying event) -- at the default 24h window
    the sf0.01 funnel is 150 -> 60 -> 25 where q30's is 150 -> 150 -> 150.
    The window predicate is what production funnel/attribution tools
    actually ship, and it changes the plan shape: each stage join carries
    a non-equi time residual, not just the user_id equi-key.

    Spark/oracle shape (identical ANSI text): three per-user MIN aggregates,
    each over a type-filtered slice (predicate pushed to the scan) joined
    back to the previous stage's anchor on user_id -- no window over event
    history, no per-user event collection; state per user is one timestamp
    per stage.  At gate scale AQE broadcasts the shrinking anchor sets
    (stage N's anchors are a subset of stage N-1's users).  At 100 TB,
    bucket or pre-partition events by user_id (operators/bucketing.py is
    the template) and every stage aggregate AND anchor join runs
    exchange-free over the co-located layout; stages beyond three compose
    linearly.  Output is integer user counts plus a FLOOR-snapped
    conversion ratio (single division of exact integers --
    bit-deterministic cross-engine)."""
    # prev = 0 on an empty corpus: conv is NULL there, not 0/0 (Spark ANSI
    # raises on divide-by-zero; DuckDB would yield NaN -- both wrong)
    prev = "LAG(n_users) OVER (ORDER BY stage)"
    conv = (
        f"CASE WHEN {prev} > 0 THEN "
        + g.round2(f"CAST(n_users AS DOUBLE) / CAST({prev} AS DOUBLE)", 4)
        + " END"
    )
    return f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL {window_hours} HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL {window_hours} HOUR
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT) FROM s2
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT stage, event_type, n_users, {conv} AS conv4
    FROM counts
    ORDER BY stage
    """


# ---------------------------------------------------------------------------
# corpus_bm25_topk: BM25 ranked retrieval for a fixed query term set
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("dup", "merge", "window")


def sql_corpus_bm25_topk(
    g: Gen, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """BM25 (Robertson-Sparck Jones) ranked retrieval over the corpus for a
    fixed query-term set -- the quality-retrieval sibling of
    ``corpus_tfidf_topk`` (TF-IDF weights terms; BM25 additionally
    saturates term frequency and normalizes by document length, the form
    every search/retrieval-curation stack actually ranks with).

    Shape: tokenize -> filter to the |Q| query terms BEFORE the (doc, term)
    agg (the filter prunes ~|Q|/|V| of the exploded token stream map-side)
    -> per-term document frequency (|Q| rows, broadcast) -> per-doc length +
    global avgdl (exact integer sums, so the double division is
    deterministic) -> per-(doc, term) partial score -> per-doc sum ->
    top-k.  At 100 TB: one shuffle on (doc_id, term) for tf, one tiny df
    agg, broadcast joins for df/avgdl -- the same partial+final shape as
    tfidf with |Q| bounding every small side.

    Determinism: tf/df/dl/N are exact integers; ``ln`` is the only libm
    call and may differ in the last ulp between engines, so each
    per-term score is ROUNDED to 9 decimals before the per-doc sum, and
    the sum itself is an ordered fold over the sorted per-term scores
    (SUM() aggregation order is engine-dependent; 3 rounded doubles summed
    in sorted order are bit-identical).  Final score rounds to 6 with
    doc_id as the rank tie-break."""
    terms = g.strlist(BM25_QUERY_TERMS)
    idf = "ln((CAST(n.n_docs - df.df AS DOUBLE) + {h}) / (CAST(df.df AS DOUBLE) + {h}) + {one})".format(
        h=g.d(0.5), one=g.d(1.0)
    )
    tf_part = (
        f"CAST(tf.tf AS DOUBLE) * {g.d(k1 + 1.0)} / "
        f"(CAST(tf.tf AS DOUBLE) + {g.d(k1)} * ({g.d(1.0 - b)} + {g.d(b)}"
        f" * CAST(dl.dl AS DOUBLE) / n.avgdl))"
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, {g.explode(g.tokens('text'), 't')} FROM documents
    ),
    tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE t IN {terms} GROUP BY doc_id, t
    ),
    df AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t
    ),
    dl AS (
        SELECT doc_id, CAST({g.size(g.tokens('text'))} AS BIGINT) AS dl
        FROM documents
    ),
    n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS BIGINT) AS avgdl
        FROM dl
    ),
    part AS (
        SELECT tf.doc_id,
               {g.round2(f'({idf}) * ({tf_part})', 9)} AS s
        FROM tf
        JOIN df ON tf.t = df.t
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN n
    ),
    scored AS (
        SELECT doc_id,
               {g.round2(g.fold_sum(g.sorted_list_agg('s')), 6)} AS bm25
        FROM part GROUP BY doc_id
    ),
    ranked AS (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, bm25
    FROM ranked WHERE rnk <= {k}
    ORDER BY rnk
    """


# ---------------------------------------------------------------------------
# sim_topk_hamming: binary-sign embedding compression + Hamming top-k
# ---------------------------------------------------------------------------


def sql_sim_topk_hamming(
    g: Gen, n_queries: int = 10, k: int = 5
) -> str:
    """Binary-quantized ANN: pack each embedding's SIGN BITS into two
    BIGINT words (bit j of word w = 1 iff embedding[32w + j] >= 0), then
    rank neighbors by Hamming distance -- popcount of XOR -- between the
    packed signatures.  Sign-bit (a.k.a. binary / "Hamming") embeddings
    are the standard 32x memory compression for billion-scale retrieval:
    for unit-norm vectors the expected angle relates monotonically to the
    sign-agreement rate (Goemans-Williamson), so Hamming rank approximates
    cosine rank at 1 bit per dimension.

    Scale shape: the signature table is 16 bytes/row (vs 256B of floats) --
    at 100 TB of embeddings the packed table is ~6 GB/billion rows and the
    whole scoring pass is two XORs + two POPCNTs per pair inside
    whole-stage codegen; the query side (n_queries rows) broadcasts, so
    brute-force scan IS the production baseline at this width.  Sub-linear
    variants band the 64 bits into 16-bit chunks (exact-match buckets
    catch all pairs at hamming <= 3 by pigeonhole) -- the same banding
    already proven by ``dedup_simhash``; this op is the dense-retrieval
    form of that signature.

    Integer-only end to end (pack, xor, popcount, rank): bit-identical
    across engines with no rounding discipline needed."""

    def pack(word: int) -> str:
        body = (
            f"CASE WHEN CAST({g.at('e', f'({word * 32} + i + 1)')} AS DOUBLE)"
            f" >= {g.d(0.0)} THEN {g.shl1('i')} ELSE CAST(0 AS BIGINT) END"
        )
        return g.fold_sum_long(g.transform(g.seq("0", "31"), "i", body))

    ham = (
        f"CAST(bit_count({_xor(g, 'q.b0', 'c.b0')}) AS BIGINT)"
        f" + CAST(bit_count({_xor(g, 'q.b1', 'c.b1')}) AS BIGINT)"
    )
    return f"""
    WITH sig AS (
        SELECT vec_id, {pack(0)} AS b0, {pack(1)} AS b1
        FROM (SELECT vec_id, embedding AS e FROM embeddings) t
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {ham} AS ham
        FROM sig q JOIN sig c
          ON q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, ham,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ham, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, ham AS hamming
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


def sql_sim_topk_hamming_banded(
    g: Gen, n_queries: int = 10, k: int = 5
) -> str:
    """Sub-linear variant of ``sim_topk_hamming``: the 64 signature bits
    split into four 16-bit bands; a corpus-side equi-join on exact band
    value generates candidates, so a query only ever touches corpus rows
    sharing one of its four bucket keys -- at a billion rows that is the
    difference between 4 bucket probes and a full scan.  Pigeonhole makes
    the banded pass EXACT within radius 3 (a pair differing in <= 3 bits
    cannot differ in all 4 bands), so a query whose candidate set already
    holds >= k neighbors at hamming <= 3 provably has its true top-k inside
    the candidates; only queries whose k-th neighbor lies beyond the
    pigeonhole radius fall back to the brute-force scan (which is what ANY
    exact method must pay there -- the executable witness sim_topk_hamming's
    docstring used to only argue in prose).  Same output contract and
    tie-breaking as sim_topk_hamming, so the two queries agree row-for-row;
    the DuckDB oracle is the brute-force spec.

    Scale shape: the banded join shuffles on the (band position, band
    value) key -- 2^16 values per position keeps buckets dense but bounded;
    the fallback branch is per-query, so a clustered production corpus
    (where near-duplicate retrieval is the use case) pays the scan only for
    out-of-cluster queries.  Integer-exact end to end."""

    def pack(word: int) -> str:
        body = (
            f"CASE WHEN CAST({g.at('e', f'({word * 32} + i + 1)')} AS DOUBLE)"
            f" >= {g.d(0.0)} THEN {g.shl1('i')} ELSE CAST(0 AS BIGINT) END"
        )
        return g.fold_sum_long(g.transform(g.seq("0", "31"), "i", body))

    ham = (
        f"CAST(bit_count({_xor(g, 'q.b0', 'c.b0')}) AS BIGINT)"
        f" + CAST(bit_count({_xor(g, 'q.b1', 'c.b1')}) AS BIGINT)"
    )
    if g.spark:
        bands = ", ".join(
            f"CAST({j * 65536} + ({g.shr(w, 16 * i)} & 65535) AS BIGINT)"
            for j, (w, i) in enumerate(
                [("b0", 0), ("b0", 1), ("b1", 0), ("b1", 1)]
            )
        )
        return f"""
        WITH sig AS (
            SELECT vec_id, {pack(0)} AS b0, {pack(1)} AS b1
            FROM (SELECT vec_id, embedding AS e FROM embeddings) t
        ),
        qsig AS (SELECT * FROM sig WHERE vec_id < {n_queries}),
        cband AS (
            SELECT vec_id, b0, b1, explode(array({bands})) AS band FROM sig
        ),
        qband AS (
            SELECT vec_id, b0, b1, explode(array({bands})) AS band FROM qsig
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {ham} AS ham
            FROM qband q JOIN cband c
              ON q.band = c.band AND c.vec_id <> q.vec_id
        ),
        near AS (SELECT * FROM cand WHERE ham <= 3),
        certified AS (
            SELECT query_id FROM near GROUP BY query_id
            HAVING COUNT(*) >= {k}
        ),
        banded AS (
            SELECT query_id, neighbor_id, ham,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ham, neighbor_id) AS rnk
            FROM near JOIN certified USING (query_id)
        ),
        fallback AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {ham} AS ham
            FROM (SELECT * FROM qsig
                  WHERE vec_id NOT IN (SELECT query_id FROM certified)) q
            JOIN sig c ON c.vec_id <> q.vec_id
        ),
        fb_ranked AS (
            SELECT query_id, neighbor_id, ham,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ham, neighbor_id) AS rnk
            FROM fallback
        ),
        unioned AS (
            SELECT * FROM banded WHERE rnk <= {k}
            UNION ALL
            SELECT * FROM fb_ranked WHERE rnk <= {k}
        )
        SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
               ham AS hamming
        FROM unioned
        ORDER BY query_id, rnk
        """
    return sql_sim_topk_hamming(g, n_queries=n_queries, k=k)


# ---------------------------------------------------------------------------
# corpus_source_overlap: cross-source duplicate-overlap matrix
# ---------------------------------------------------------------------------


def sql_corpus_source_overlap(
    g: Gen, sh_table: str | None = None, top_pairs: int = 40
) -> str:
    """Pairwise source-overlap audit: for every source pair (a < b), how
    many distinct 3-gram shingle fingerprints appear in BOTH, plus the
    Jaccard over the per-source shingle SETS -- the standard pre-mixing
    diagnostic for a multi-source corpus (a crawl snapshot that
    86%-overlaps last month's makes per-source dedup priorities and mixing
    weights wrong unless measured first).  N-gram-level, not whole-doc
    fingerprints: sources rarely share byte-exact documents but share
    phrasing heavily, which is what contaminates mixing weights.

    Shape: the staged shingle view (compute-once, shared with the
    minhash/jaccard dedup family) -> one (shingle-fp, source) distinct agg
    (shuffle key = the 64-bit fingerprint, uniform by construction) -> a
    fingerprint equi-self-join producing at most |sources|^2 rows per
    fingerprint (bounded by the source count, not the data) -> a group-by
    on the source pair whose output is the tiny pair matrix; per-source
    set sizes broadcast back on.  Top pairs by (jaccard, pair) keeps the
    output the report-sized artifact a 100 TB audit would actually emit."""
    sh = sh_table or "sh"
    sh_cte = f"sh AS ({sql_shingle_cte(g)})," if not sh_table else ""
    fp = g.md5_60("gram")
    return f"""
    WITH {sh_cte}
    d AS (
        SELECT DISTINCT {fp} AS fp, source
        FROM (SELECT doc_id, {_explode(g, 's', 'gram')} FROM {sh}) x
        JOIN documents USING (doc_id)
    ),
    sz AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
        GROUP BY a.source, b.source
    ),
    scored AS (
        SELECT p.src_a, p.src_b, p.n_shared, sa.n AS n_a, sb.n AS n_b,
               {g.round2('CAST(p.n_shared AS DOUBLE) / CAST(sa.n + sb.n - p.n_shared AS DOUBLE)', 6)}
                   AS jaccard
        FROM pairs p
        JOIN sz sa ON p.src_a = sa.source
        JOIN sz sb ON p.src_b = sb.source
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, src_a, src_b)
                      AS rnk
        FROM scored
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, src_a, src_b, n_shared, n_a, n_b,
           jaccard
    FROM ranked WHERE rnk <= {top_pairs}
    ORDER BY rnk
    """


# ---------------------------------------------------------------------------
# corpus_source_overlap_kmv: sketch-mode source-overlap (the 100 TB default)
# ---------------------------------------------------------------------------


def sql_kmv_srcmins(
    g: Gen, k: int = 256, prune: int = 4, sh_table: str | None = None
) -> str:
    """Standalone per-source KMV sketch: the k smallest distinct shingle
    hashes per source, pre-pruned map-side to the bottom 1/prune of the
    hash space.  Split out of ``sql_corpus_source_overlap_kmv`` so the
    Spark runner can STAGE it once as a parquet temp table: the sketch
    SQL references srcmins four times (sizes, pair loop, both union
    legs), and Spark inlines CTEs -- unstaged, the whole
    explode+hash+distinct chain re-ran per reference (measured 4x wall at
    both scales).  The staged sketch is |sources| x k rows -- the
    production artifact a 100 TB audit would persist and re-probe."""
    return f"""
    WITH {_kmv_srcmins_ctes(g, k, prune, sh_table)}
    SELECT source, h FROM srcmins
    """


def _kmv_srcmins_ctes(
    g: Gen, k: int, prune: int, sh_table: str | None
) -> str:
    """CTE text (``[sh,] hv, srcmins`` -- no WITH, no trailing comma)
    shared by the standalone sketch and the full overlap query."""
    sh = sh_table or "sh"
    sh_cte = f"sh AS ({sql_shingle_cte(g)})," if not sh_table else ""
    thresh = 4294967296 // prune
    fp = g.md5_32("gram")
    return f"""{sh_cte}
    hv AS (
        SELECT DISTINCT source, fp AS h
        FROM (
            SELECT doc_id, {fp} AS fp
            FROM (SELECT doc_id, {_explode(g, 's', 'gram')} FROM {sh}) e
            WHERE {fp} < {thresh}
        ) x
        JOIN documents USING (doc_id)
    ),
    srcmins AS (
        SELECT source, h
        FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hv
        ) r WHERE rn <= {k}
    )"""


def sql_corpus_source_overlap_kmv(
    g: Gen,
    k: int = 256,
    prune: int = 4,
    sh_table: str | None = None,
    top_pairs: int = 40,
    mins_table: str | None = None,
) -> str:
    """Pairwise source-overlap ESTIMATE via per-source KMV sketches -- the
    100 TB companion to the exact ``corpus_source_overlap`` (whose distinct
    (shingle, source) aggregation was the heaviest measured scale slope,
    7.66 at 10x in BENCH_SCALE_r07: it grows with the data).  Same report
    (top source pairs by Jaccard), sketch arithmetic instead of exact set
    intersection:

     - per source, a KMV(k) sketch of the distinct 3-gram shingle hashes
       (k smallest md5-32 values; Bar-Yossef et al. 2002, the same
       estimator ``corpus_kmv_cardinality`` gates) estimates
       ``|A| ~= (k-1) * 2^32 / h_(k)``;
     - per pair, the union sketch is the k smallest of the two sketches'
       union (KMV's merge is exactly this -- sketches compose without
       touching the data again; an element of the union's bottom-k that
       lives in A is necessarily in A's bottom-k, so per-side membership
       is EXACT for every union-sketch element);
     - the intersection uses the RATIO estimator, not inclusion-exclusion:
       ``rho = |{v in union bottom-k : v in both sketches}| / k`` is the
       Jaccard estimate directly (the union's bottom-k is a uniform sample
       of the union), and ``|A n B| ~= rho * est(A u B)``.
       Inclusion-exclusion ``est(A)+est(B)-est(AuB)`` was measured
       unusable here: three uncorrelated ~1/sqrt(k) errors on ~1.4k-sized
       sets swamp intersections of ~70 (it reported J=0.21 where truth
       was 0.027); the ratio estimator's error scales with J itself.

    The scale lever is the ``h < 2^32/prune`` MAP-SIDE filter applied
    BEFORE the distinct aggregation: only ~1/prune of the exploded shingle
    stream ever reaches a shuffle, and the k smallest hashes are unaffected
    as long as at least k survive per source (KMV only looks at the bottom
    of the hash range; prune=4 leaves 256-394 survivors per source even at
    sf0.01, measured).  If fewer than k survive, the estimate falls back to
    ``n_in * prune`` -- an inverse-probability sampling estimate over the
    filtered domain (reduces to KMV's exact small-set convention at
    prune=1); the branch is mirrored in the oracle, so the gate stays
    hash-exact either way.  At larger corpora, raise ``prune``
    proportionally (survivors-per-source ~ distinct/prune is the knob;
    k fixes the estimator std at sqrt(J(1-J)/k), ~2.7% absolute on the
    Jaccard at k=256, measured unbiased: mean error -0.003 at sf0.1).
    Accuracy vs the exact operator is pinned in
    tests/test_ext_queries.py::test_source_overlap_kmv_tracks_exact; the
    exact query remains the audit, this is the default at scale.

    Determinism: md5-derived integer hashes, ROW_NUMBER over distinct
    values, integer-fed divisions written identically in both dialects --
    bit-identical doubles (the events_ewma/minhash_calibration recipe)."""
    est = f"CAST({k} - 1 AS DOUBLE) * {g.d(4294967296.0)} / CAST(kth AS DOUBLE)"
    small = f"CAST(n_in AS DOUBLE) * {g.d(float(prune))}"
    est_case = f"CASE WHEN n_in < {k} THEN {small} ELSE {est} END"
    mins_ctes = (
        f"srcmins AS (SELECT source, h FROM {mins_table})"
        if mins_table
        else _kmv_srcmins_ctes(g, k, prune, sh_table)
    )
    return f"""
    WITH {mins_ctes},
    sz AS (
        SELECT source, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_in
        FROM srcmins GROUP BY source
    ),
    est AS (SELECT source, {est_case} AS est_n FROM sz),
    pairs AS (
        -- |sources| x |sources| pair loop: report-sized, not data-sized;
        -- the broadcast hint makes it a BroadcastNestedLoopJoin over the
        -- tiny per-source summary (never an unpartitioned CartesianProduct)
        SELECT {g.bc_hint('a')}a.source AS src_a, b.source AS src_b
        FROM sz a JOIN sz b ON a.source < b.source
    ),
    u AS (
        SELECT src_a, src_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
        FROM (
            SELECT p.src_a, p.src_b, m.h, 1 AS in_a, 0 AS in_b
            FROM pairs p JOIN srcmins m ON m.source = p.src_a
            UNION ALL
            SELECT p.src_a, p.src_b, m.h, 0 AS in_a, 1 AS in_b
            FROM pairs p JOIN srcmins m ON m.source = p.src_b
        ) z GROUP BY src_a, src_b, h
    ),
    ur AS (
        SELECT src_a, src_b, h, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
        FROM u
    ),
    usz AS (
        SELECT src_a, src_b, MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_in,
               CAST(SUM(in_a * in_b) AS BIGINT) AS matches
        FROM ur WHERE rn <= {k} GROUP BY src_a, src_b
    ),
    uest AS (
        SELECT src_a, src_b, {est_case} AS est_union,
               CAST(matches AS DOUBLE) / CAST(n_in AS DOUBLE) AS rho
        FROM usz
    ),
    scored AS (
        SELECT ue.src_a, ue.src_b,
               ea.est_n AS est_a, eb.est_n AS est_b, ue.est_union,
               ue.rho * ue.est_union AS est_shared,
               ue.rho AS est_jacc_raw
        FROM uest ue
        JOIN est ea ON ue.src_a = ea.source
        JOIN est eb ON ue.src_b = eb.source
    ),
    ranked AS (
        SELECT sc.src_a, sc.src_b,
               {g.round2('sc.est_a')} AS est_a,
               {g.round2('sc.est_b')} AS est_b,
               {g.round2('sc.est_union')} AS est_union,
               {g.round2('sc.est_shared')} AS est_shared,
               {g.round2('sc.est_jacc_raw', 6)} AS est_jaccard
        FROM scored sc
    ),
    topn AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY est_jaccard DESC, src_a, src_b)
                      AS rnk
        FROM ranked
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, src_a, src_b,
           est_a, est_b, est_union, est_shared, est_jaccard
    FROM topn WHERE rnk <= {top_pairs}
    ORDER BY rnk
    """


# ---------------------------------------------------------------------------
# text_zipf_slope: per-language Zipf exponent via deterministic regression
# ---------------------------------------------------------------------------


def sql_text_zipf_slope(g: Gen, top_r: int = 30) -> str:
    """Per-language Zipf slope: least-squares slope of ln(freq) against
    ln(rank) over the top ``top_r`` tokens -- the classic corpus-health
    diagnostic (natural language sits near -1; generated/templated text
    flattens toward 0, boilerplate floods steepen it).  A slope far from
    the corpus norm flags a language slice worth auditing before training.

    Determinism: engine-native ``regr_slope`` accumulates float sums in
    partition order (never cross-engine comparable), so the regression is
    computed from closed-form sums over ORDERED lists instead: per lang,
    collect the top-R frequencies, sort the rounded ln(freq) values
    ascending (ties carry equal values, so tie order cannot change any
    sum), pair rank descending against them (freq ascending <=> rank
    descending), and fold the four sums in list order.  Every float op is
    then a fixed-order expression over exact integer inputs with each
    ``ln`` rounded to 9 decimals first -- bit-identical on both engines.

    Shape: token-frequency agg (one shuffle), per-lang top-R
    (ROW_NUMBER window over ~|V| rows per lang), then a per-lang fold over
    a <=R-element list -- output is one row per language."""
    n = "CAST(n_terms AS DOUBLE)"
    # ys: ln(freq) ascending; xs pair rank descending: x_i = ln(n + 1 - i)
    x_i = g.round2("ln(CAST(n_terms + 1 - i AS DOUBLE))", 9)
    # CAST: Spark's element_at demands an INT index while sequence() yields
    # BIGINT lambda vars; DuckDB indexes lists with either.
    y_i = g.at("ys", "CAST(i AS INT)")
    sxy = g.fold_sum(g.transform(g.seq("1", "n_terms"), "i", f"{x_i} * {y_i}"))
    sx = g.fold_sum(g.transform(g.seq("1", "n_terms"), "i", x_i))
    sxx = g.fold_sum(g.transform(g.seq("1", "n_terms"), "i", f"{x_i} * {x_i}"))
    sy = g.fold_sum("ys")
    slope = (
        f"CASE WHEN n_terms <= 1 THEN {g.d(0.0)} ELSE "
        f"({n} * sxy - sx * sy) / ({n} * sxx - sx * sx) END"
    )
    return f"""
    WITH tok AS (
        SELECT lang, {g.explode(g.tokens('text'), 't')} FROM documents
    ),
    freq AS (
        SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY lang, t
    ),
    topr AS (
        SELECT lang, f,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY f DESC, t) AS rnk
        FROM freq
    ),
    coll AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               {g.sorted_list_agg(g.round2('ln(CAST(f AS DOUBLE))', 9))} AS ys
        FROM topr WHERE rnk <= {top_r}
        GROUP BY lang
    ),
    sums AS (
        SELECT lang, n_terms,
               {sxy} AS sxy, {sx} AS sx, {sxx} AS sxx, {sy} AS sy
        FROM coll
    )
    SELECT lang, n_terms, {g.round2(slope, 6)} AS zipf_slope
    FROM sums
    ORDER BY lang
    """


# ---------------------------------------------------------------------------
# dedup_threshold_sweep: near-dup pair counts across the threshold dial
# ---------------------------------------------------------------------------


def sql_dedup_threshold_sweep(
    g: Gen,
    lo: int = 3,
    hi: int = 9,
    sh_table: str | None = None,
    pairs_table: str | None = None,
) -> str:
    """Threshold-calibration curve: cumulative near-dup PAIR counts at
    Jaccard thresholds 0.3..0.9 in one pass -- the audit every production
    dedup run does before committing to a threshold (pick 0.8 and keep
    too many dups, pick 0.5 and delete distinct documents; the curve's
    knee is the evidence).  Rides the exact SSJoin pair set
    (``dedup_ngram_jaccard`` at the 0.3 floor) and re-aggregates it: one
    tiny cross join of the verified pairs against the 7 threshold values,
    then a count per threshold -- the pair set is the expensive artifact
    and it is computed once (staged shingle view underneath).

    Float discipline: the 2-decimal rounded jaccard is lifted to an EXACT
    integer decile bucket (``FLOOR(j*100+0.5)`` is already integral, then
    integer-divide by 10), so the curve is pure integer aggregation --
    and critically, the expensive intersect-fold jaccard is evaluated
    ONCE per pair in the bucket agg's grouping key: a naive
    ``thresholds x pairs`` theta-join re-evaluates the fold per
    comparison under Spark's CTE inlining (measured 1.7x slower).

    On the Spark side the pair set is a PERSISTED staged view
    (``pairs_table``, the same compute-once/read-many discipline as the
    shingle / span / signature views and dedup_resolve's staged labels):
    threshold calibration is by nature a downstream re-read of the pair
    artifact the dedup pipeline already paid for.  The DuckDB oracle
    inlines the full pair computation, so the gate hash still proves the
    staged view equals the from-scratch pair set."""
    pairs = pairs_table or (
        "(" + sql_dedup_ngram_jaccard(g, threshold=0.3, sh_table=sh_table) + ")"
    )
    bucket = g.idiv(f"CAST(FLOOR(jaccard * 100 + {g.d(0.5)}) AS BIGINT)", "10")
    return f"""
    WITH pairs AS (SELECT * FROM {pairs}),
    buckets AS (
        SELECT {bucket} AS b, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY {bucket}
    ),
    thr AS (SELECT {g.explode_seq(str(lo), str(hi), 'i')})
    SELECT CAST(thr.i AS DOUBLE) / {g.d(10.0)} AS threshold,
           CAST(COALESCE(SUM(buckets.n), 0) AS BIGINT) AS n_pairs
    FROM thr LEFT JOIN buckets ON buckets.b >= thr.i
    GROUP BY thr.i
    ORDER BY threshold
    """


# ---------------------------------------------------------------------------
# corpus_minhash_calibration: sketch-estimate accuracy vs exact Jaccard
# ---------------------------------------------------------------------------


def sql_corpus_minhash_calibration(
    g: Gen, k: int = 3, sh_table: str | None = None
) -> str:
    """MinHash ESTIMATOR calibration: for every LSH candidate pair, compare
    the signature-agreement Jaccard estimate (fraction of the 16 minhash
    components that agree -- the only similarity a sketch-only pipeline ever
    sees) against the exact shingle-set Jaccard, bucketed by exact-Jaccard
    decile.  This is the audit that justifies trusting the sketch at 100 TB:
    ``dedup_threshold_sweep`` calibrates the THRESHOLD on exact scores; this
    calibrates the ESTIMATOR itself (bias per similarity regime, e.g. the
    known upward spread of a 16-permutation sketch at low similarity).

    Scale shape: candidates come from the banded equi-join (never
    all-pairs); the signature join adds two hash joins against the 16-column
    ``sig`` relation (tiny: one row per doc); exact verification touches
    candidate pairs only -- the same cost envelope as dedup_minhash_lsh.

    Float discipline: with 16 components the estimate is an exact multiple
    of 1/16 (binary-representable), so SUM(n_agree) is pure integer;
    per-bucket averages are single divisions of exact integers under the
    FLOOR snap -- bit-deterministic cross-engine.  avg_exact4 is the
    micro-average (ratio of sums) so it too stays integer-fed."""
    inter = g.size(_intersect(g, "sa.s", "sb.s"))
    agree = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_MINHASH)
    )
    sh = sh_table or "sh"
    j = "CAST(inter AS DOUBLE) / CAST(un AS DOUBLE)"
    bucket = g.idiv(f"CAST(FLOOR({j} * 100 + {g.d(0.5)}) AS BIGINT)", "10")
    return f"""
    WITH {_sql_lsh_bands_chain(g, k, sh_table)},
    cand AS (
        SELECT {g.par_hint()}DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM bl x JOIN bl y ON x.band = y.band AND x.doc_id < y.doc_id
    ),
    agr AS (
        SELECT cand.id1, cand.id2, CAST({agree} AS BIGINT) AS n_agree
        FROM cand
        JOIN sig a ON a.doc_id = cand.id1
        JOIN sig b ON b.doc_id = cand.id2
    ),
    ver AS (
        SELECT agr.id1, agr.id2, agr.n_agree,
               CAST({inter} AS BIGINT) AS inter,
               CAST({g.size('sa.s')} AS BIGINT)
                 + CAST({g.size('sb.s')} AS BIGINT)
                 - CAST({inter} AS BIGINT) AS un
        FROM agr
        JOIN {sh} sa ON sa.doc_id = agr.id1
        JOIN {sh} sb ON sb.doc_id = agr.id2
    )
    SELECT {bucket} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(n_agree) AS BIGINT) AS sum_agree,
           {g.round2(
               'CAST(SUM(n_agree) AS DOUBLE)'
               f' / CAST({N_MINHASH} * COUNT(*) AS DOUBLE)', 4)} AS avg_est4,
           {g.round2(
               'CAST(SUM(inter) AS DOUBLE) / CAST(SUM(un) AS DOUBLE)',
               4)} AS avg_exact4
    FROM ver
    GROUP BY {bucket}
    ORDER BY bucket
    """


# ---------------------------------------------------------------------------
# corpus_cm_sketch: Count-Min frequency sketch vs exact heavy hitters
# ---------------------------------------------------------------------------


def sql_corpus_cm_sketch(
    g: Gen, d: int = 4, w: int = 256, k: int = 10
) -> str:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005) for token
    frequencies, checked against the exact counts for the top-``k``
    tokens -- the frequency-estimation sibling of the KMV distinct-count
    sketch: at 100 TB the d x w counter grid (here 4 x 256 cells) is the
    ONLY corpus derivative that leaves the executors, yet answers any
    point frequency query with one-sided error (estimate >= exact,
    over by at most ~2N/w with probability 1 - 2^-d).  The overestimate
    is part of the checked output, so the sketch's accuracy contract is
    itself hash-verified.

    Engine-portable by construction: cells are addressed with md5-derived
    integer hashes (never engine-native hash()), counts are exact BIGINTs,
    and the estimate is an integer MIN -- no float anywhere.

    Shape (r12, guide §2.3 "aggregate before you shuffle"): one
    exploded-token pass -> exact (token, n) counts; the sketch is then
    built from the DISTINCT-token counts as a weighted sum --
    ``c(r, cell) = SUM(n) over tokens hashing to cell`` -- which is
    algebraically the occurrence count cell-for-cell (a CM sketch update
    with a combiner), so every output integer is identical (probed
    row-for-row against the per-occurrence form).  The old form exploded
    every occurrence d times and md5-hashed each (occurrence, row); this
    hashes each distinct token d times and reuses the (t, n) agg the
    exact side needs anyway -- the tok CTE is referenced ONCE, so the
    engines' CTE inlining no longer re-tokenizes the corpus twice
    (interleaved A/B at sf0.1: 2.87/2.12/2.93 s -> 0.56/0.45/0.73 s).
    Exact top-k from the same token agg; the k probe tokens join the
    1024-cell sketch via broadcast."""
    cell = g.md5_32(f"concat(t, '#', {g.str_cast('r')})") + f" % {w}"
    return f"""
    WITH tok AS (
        SELECT {g.explode(g.tokens('text'), 't')} FROM documents
    ),
    exact AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t
    ),
    occ AS (
        SELECT t, n, {g.explode_seq('0', str(d - 1), 'r')} FROM exact
    ),
    sketch AS (
        SELECT r, {cell} AS cell, CAST(SUM(n) AS BIGINT) AS c
        FROM occ GROUP BY r, {cell}
    ),
    topk AS (
        SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rnk
        FROM exact
    ),
    est AS (
        SELECT topk.t, topk.n, topk.rnk, MIN(sk.c) AS cm_est
        FROM topk JOIN sketch sk
          ON topk.rnk <= {k}
         AND sk.cell = {g.md5_32(f"concat(topk.t, '#', {g.str_cast('sk.r')})")} % {w}
        GROUP BY topk.t, topk.n, topk.rnk
        HAVING CAST(COUNT(*) AS BIGINT) = {d}
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, t AS term, n AS exact_n, cm_est,
           cm_est - n AS overestimate
    FROM est
    ORDER BY rnk
    """


# ---------------------------------------------------------------------------
# events_quantile_sketch: mergeable histogram quantiles vs exact ranks
# ---------------------------------------------------------------------------


def sql_events_quantile_sketch(g: Gen, width: float = 4.0) -> str:
    """Mergeable equi-width histogram quantile sketch over ``events.value``,
    audited against the exact rank statistics -- the quantile member of the
    sketch family (KMV = distinct count, Count-Min = frequency, Bloom =
    membership).  At 100 TB the per-bin counts are the ONLY corpus
    derivative that leaves the executors (one partial+final agg, ~|range|/w
    cells), they merge across shards by plain addition, and any quantile
    answers from the cumulative bin counts with error bounded by the bin
    width -- that bound is part of the checked output (``within_bin``), so
    the sketch's accuracy contract is itself hash-verified.

    Exact side is the AUDIT, not the production path: it needs the distinct-
    value multiset (a global cumulative window over ~|distinct| rows) and
    exists so the gate can hash-check the error bound at test scale; at
    100 TB you keep only the ``hist`` aggregation.

    Determinism: bins are ``FLOOR(value / w)`` (one IEEE divide + floor,
    identical on both engines; values are non-negative by data contract but
    FLOOR -- not DIV -- keeps the map total on any domain); target ranks are
    exact integers ``ceil(n * pct / 100)`` via integer arithmetic; the bin
    upper edge is an exact small-int * literal product.  No accumulation-
    order float anywhere -- even ``err`` is a single subtraction of two
    deterministic doubles."""
    pcts = "1, 5, 25, 50, 75, 90, 99"
    arr = f"array({pcts})" if g.spark else f"list_value({pcts})"
    bin_ = f"CAST(FLOOR(value / {g.d(width)}) AS BIGINT)"
    rank = g.idiv("(tot.n * CAST(thr.p AS BIGINT) + 99)", "100")
    edge = f"CAST(pick.bin + 1 AS DOUBLE) * {g.d(width)}"
    return f"""
    WITH hist AS (
        SELECT {bin_} AS bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY {bin_}
    ),
    cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cle FROM hist),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    thr AS (SELECT {g.explode(arr, 'p')}),
    tgt AS (SELECT thr.p AS p, {rank} AS tr FROM thr CROSS JOIN tot),
    pick AS (
        SELECT tgt.p, tgt.tr, MIN(cum.bin) AS bin
        FROM tgt JOIN cum ON cum.cle >= tgt.tr
        GROUP BY tgt.p, tgt.tr
    ),
    vals AS (
        SELECT value, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY value
    ),
    vcum AS (SELECT value, SUM(c) OVER (ORDER BY value) AS cle FROM vals),
    ex AS (
        SELECT tgt.p, MIN(vcum.value) AS exact_value
        FROM tgt JOIN vcum ON vcum.cle >= tgt.tr
        GROUP BY tgt.p
    )
    SELECT CAST(pick.p AS BIGINT) AS pct,
           pick.tr AS target_rank,
           pick.bin AS bin,
           {edge} AS est_upper,
           ex.exact_value,
           {g.round2(f'{edge} - ex.exact_value', 6)} AS err,
           CAST(CASE WHEN {edge} - ex.exact_value > {g.d(0.0)}
                      AND {edge} - ex.exact_value <= {g.d(width)}
                     THEN 1 ELSE 0 END AS BIGINT) AS within_bin
    FROM pick JOIN ex ON ex.p = pick.p
    ORDER BY pct
    """


# ---------------------------------------------------------------------------
# text_bigram_nll: interpolated bigram-LM perplexity per document
# ---------------------------------------------------------------------------


def sql_text_bigram_nll(g: Gen, lam: float = 0.75) -> str:
    """Interpolated bigram-LM negative log-likelihood per document -- the
    order-2 step up from ``text_unigram_nll``: score each transition with
    ``p = lam * P(w2|w1) + (1-lam) * P(w2)`` (Jelinek-Mercer smoothing, the
    workhorse of CCNet-style perplexity filtering when a word actually seen
    after its predecessor should score far better than its global rate).
    Documents whose TRANSITIONS are corpus-atypical -- shuffled text,
    stitched boilerplate -- separate from fluent text much harder than
    under the unigram model.

    Plan: bigram occurrences explode map-side from the token array (no
    self-join to form pairs); the bigram and unigram count tables are each
    ONE partial+final agg over those streams; scoring joins every
    occurrence back to three count relations plus the 1-row total.  At
    100 TB all three join keys are Zipf-skewed -- AQE skew-split handles
    the hot words (session.py), and the count tables prune/broadcast once
    capped to a model vocabulary.  Documents under 2 tokens have no
    transitions and drop out (the unigram query covers them).

    Determinism: same discipline as text_unigram_nll -- the count ratios
    are exact, ln/AVG carry ~1e-15 accumulation noise, and rounding avg_nll
    to 6 decimals / ppl to 2 leaves 9 orders of magnitude of margin."""
    toks = g.tokens("text")
    n = "size(toks)" if g.spark else "len(toks)"
    pos = g.filter(g.seq("1", n), "i", f"i <= {n} - 1")
    p = (
        f"{g.d(lam)} * (CAST(bc.c AS DOUBLE) / CAST(u1.c AS DOUBLE))"
        f" + {g.d(1.0 - lam)} * (CAST(u2.c AS DOUBLE) / CAST(tot.n AS DOUBLE))"
    )
    nll = f"-ln({p})"
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    pos AS (SELECT doc_id, toks, {g.explode(pos, 'i')} FROM t),
    bg AS (
        SELECT doc_id, {g.at('toks', 'i')} AS w1, {g.at('toks', 'i + 1')} AS w2
        FROM pos
    ),
    w AS (SELECT {g.explode('toks', 'w')} FROM t),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {g.round2(f'AVG({nll})', 6)} AS avg_nll,
           {g.round2(f'exp(AVG({nll}))', 2)} AS ppl
    FROM bg
    JOIN bc ON bc.w1 = bg.w1 AND bc.w2 = bg.w2
    JOIN uni u1 ON u1.w = bg.w1
    JOIN uni u2 ON u2.w = bg.w2
    CROSS JOIN tot
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """


# ---------------------------------------------------------------------------
# mm_phash_dedup: banded Hamming near-dup over binary-payload fingerprints
# ---------------------------------------------------------------------------

PHASH_BITS = 48
PHASH_BANDS = 4  # 4 x 12-bit bands: pigeonhole covers hamming <= 3


def _sql_phash_sig(g: Gen) -> str:
    """CTE chain computing (doc_id, phash): a 48-bit majority fingerprint
    over the DISTINCT 4-byte grams of the media payload.  The testdata
    payload is ``encode(text, 'utf-8')`` of pure-ASCII text (verified), so
    byte 4-grams == char 4-grams and the fingerprint is SQL-expressible on
    both engines; a real perceptual hash (pHash/aHash over decoded pixels)
    plugs in at the same (doc_id, fingerprint) contract via the
    ``mapInPandas`` stage in ``operators/multimodal.py::phash_signatures``.

    Shape: explode distinct grams -> ONE partial+final agg with 48 per-bit
    SUM columns (a 48-cell row per doc crosses the wire, never the gram
    stream) -> closed-form majority assembly.  The per-bit-filter form the
    token simhash uses would run 48 interpreted lambda passes over a
    ~300-element gram list per doc -- the codegen'd agg shape wins ~10x on
    byte grams (the text_entropy lesson)."""
    length = "length(text)"
    grams = g.distinct(
        g.transform(
            g.filter(g.seq("1", length), "i", f"i <= {length} - 3"),
            "i",
            "substring(text, i, 4)",
        )
    )
    hs = g.transform("gs", "x", g.md5_48("x"))
    sums = ",\n               ".join(
        f"SUM({g.bit('h', b)}) AS c{b}" for b in range(PHASH_BITS)
    )
    majority = " + ".join(
        f"(CASE WHEN 2 * c{b} > ng THEN {1 << b} ELSE 0 END)"
        for b in range(PHASH_BITS)
    )
    return f"""
    t AS (SELECT doc_id, {grams} AS gs FROM documents),
    gh AS (SELECT doc_id, {_explode(g, hs, 'h')} FROM t),
    sig0 AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ng,
               {sums}
        FROM gh GROUP BY doc_id
    ),
    sig AS (SELECT doc_id, CAST({majority} AS BIGINT) AS phash FROM sig0)
    """


def sql_mm_phash_dedup(
    g: Gen, max_dist: int = 3, sig_table: str | None = None
) -> str:
    """Multimodal near-dup pairs at Hamming <= 3 over the 48-bit payload
    fingerprint -- image/audio near-dup dedup re-expressed for Spark: a
    perceptual-hash-style fingerprint per media object, then banded
    Hamming search instead of the O(n^2) scan.

    Spark runs the banded plan ({PHASH_BANDS} bands of 12 bits; pigeonhole:
    a pair within distance 3 agrees exactly on >= 1 band -> equi-join on
    the band value) over signatures computed by the REAL multimodal stage
    (Arrow ``mapInPandas`` over binary payloads,
    ``operators/multimodal.py::phash_signatures``, passed in as
    ``sig_table``); DuckDB runs the closed-form all-pairs filter over the
    SQL-replica fingerprint, so the gate hash proves both the banded plan
    lossless AND the Python byte path == the SQL spec.  At 100 TB the
    fingerprint stage is one decode pass, signatures are ~n x 8 bytes, and
    the only shuffle is the band equi-join -- the same posture as
    dedup_simhash_pairs but over the binary-payload modality and a 48-bit
    code."""
    dist = f"CAST(bit_count({_xor(g, 'a.phash', 'b.phash')}) AS BIGINT)"
    if g.spark:
        sig_cte = f"{_sql_phash_sig(g)}," if sig_table is None else ""
        sig = sig_table or "sig"
        band_vals = ", ".join(
            f"CAST({j * 4096} + ({g.shr('phash', 12 * j)} & 4095) AS BIGINT)"
            for j in range(PHASH_BANDS)
        )
        return f"""
        WITH {sig_cte}
        bands AS (
            SELECT doc_id, phash, explode(array({band_vals})) AS band
            FROM {sig}
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.doc_id < y.doc_id
        )
        SELECT cand.id1, cand.id2, {dist} AS hamming
        FROM cand
        JOIN {sig} a ON a.doc_id = cand.id1
        JOIN {sig} b ON b.doc_id = cand.id2
        WHERE bit_count({_xor(g, 'a.phash', 'b.phash')}) <= {max_dist}
        ORDER BY id1, id2
        """
    return f"""
    WITH {_sql_phash_sig(g)}
    SELECT a.doc_id AS id1, b.doc_id AS id2, {dist} AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count({_xor(g, 'a.phash', 'b.phash')}) <= {max_dist}
    ORDER BY id1, id2
    """


# ---------------------------------------------------------------------------
# Registry wiring
# ---------------------------------------------------------------------------

_BUILDERS: dict[str, tuple[Callable[[Gen], str], tuple[str, ...]]] = {
    "text_token_stats": (sql_text_token_stats, ("documents",)),
    "text_quality": (sql_text_quality, ("documents",)),
    "text_lang_id": (sql_text_lang_id, ("documents",)),
    "text_gopher_filter": (sql_text_gopher_filter, ("documents",)),
    "text_token_count_bpe": (sql_text_token_count_bpe, ("documents",)),
    "text_pii_scrub": (sql_text_pii_scrub, ("documents",)),
    "text_fingerprint": (sql_text_fingerprint, ("documents",)),
    "text_repetition": (sql_text_repetition, ("documents",)),
    "sample_per_source": (sql_sample_per_source, ("documents",)),
    "text_normalize": (sql_text_normalize, ("documents",)),
    "text_entropy": (sql_text_entropy, ("documents",)),
    "corpus_tfidf_topk": (sql_corpus_tfidf_topk, ("documents",)),
    "corpus_stats": (sql_corpus_stats, ("documents",)),
    "emb_label_centroids": (sql_emb_label_centroids, ("embeddings",)),
    "sim_knn_classify": (sql_sim_knn_classify, ("embeddings",)),
    "dedup_exact": (sql_dedup_exact, ("documents",)),
    "dedup_ngram_jaccard": (sql_dedup_ngram_jaccard, ("documents",)),
    "dedup_minhash_lsh": (sql_dedup_minhash_lsh, ("documents",)),
    "dedup_simhash": (sql_dedup_simhash, ("documents",)),
    "dedup_simhash_pairs": (sql_dedup_simhash_pairs, ("documents",)),
    "dedup_embedding": (sql_dedup_embedding, ("embeddings",)),
    "dedup_embedding_lsh": (sql_dedup_embedding_lsh, ("embeddings",)),
    "sim_topk_bruteforce": (sql_sim_topk, ("embeddings",)),
    "sim_topk_lsh": (sql_sim_topk_lsh, ("embeddings",)),
    "sim_range_search": (sql_sim_range_search, ("embeddings",)),
    "sim_topk_ivf": (sql_sim_topk_ivf, ("embeddings",)),
    "sim_ivf_recall": (sql_sim_ivf_recall, ("embeddings",)),
    "sim_lsh_recall": (sql_sim_lsh_recall, ("embeddings",)),
    "mm_sim_topk": (sql_mm_sim_topk, ("documents",)),
    "sim_lsh_buckets": (sql_sim_lsh_buckets, ("embeddings",)),
    "dedup_substring": (sql_dedup_substring, ("documents",)),
    "ngram_topk": (sql_ngram_topk, ("documents",)),
    "sample_quality_weighted": (sql_sample_quality_weighted, ("documents",)),
    "emb_quantize": (sql_emb_quantize, ("embeddings",)),
    "text_unigram_nll": (sql_text_unigram_nll, ("documents",)),
    "dedup_incremental": (sql_dedup_incremental, ("documents",)),
    "split_leakage_check": (sql_split_leakage_check, ("documents",)),
    "dedup_boilerplate": (sql_dedup_boilerplate, ("documents",)),
    "corpus_ngram_novelty": (sql_corpus_ngram_novelty, ("documents",)),
    "text_ccnet_buckets": (sql_text_ccnet_buckets, ("documents",)),
    "sample_dsir": (sql_sample_dsir, ("documents",)),
    "mix_token_budget": (sql_mix_token_budget, ("documents",)),
    "events_ewma": (sql_events_ewma, ("events",)),
    "events_funnel": (sql_events_funnel, ("events",)),
    "corpus_minhash_calibration": (
        sql_corpus_minhash_calibration, ("documents",)
    ),
    "corpus_kmv_cardinality": (sql_corpus_kmv_cardinality, ("documents",)),
    "dedup_bloom": (sql_dedup_bloom, ("documents",)),
    "corpus_bm25_topk": (sql_corpus_bm25_topk, ("documents",)),
    "sim_topk_hamming": (sql_sim_topk_hamming, ("embeddings",)),
    "corpus_source_overlap": (sql_corpus_source_overlap, ("documents",)),
    "corpus_source_overlap_kmv": (
        sql_corpus_source_overlap_kmv, ("documents",)
    ),
    "text_zipf_slope": (sql_text_zipf_slope, ("documents",)),
    "dedup_threshold_sweep": (sql_dedup_threshold_sweep, ("documents",)),
    "corpus_cm_sketch": (sql_corpus_cm_sketch, ("documents",)),
    "events_quantile_sketch": (sql_events_quantile_sketch, ("events",)),
    "text_bigram_nll": (sql_text_bigram_nll, ("documents",)),
    "mm_phash_dedup": (sql_mm_phash_dedup, ("documents",)),
    "sim_topk_hamming_banded": (sql_sim_topk_hamming_banded, ("embeddings",)),
}


def _make_query(builder, tables):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flatterer_spark.queries import T

        for t in tables:
            T(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(builder(Gen(spark=True)))

    return run


def _view_suffix(sf_dir: str) -> str:
    """Dataset-scoped temp-view suffix: view names must be unique per
    sf_dir, or querying a second dataset in one session would silently
    repoint the first dataset's cached view (createOrReplaceTempView is
    global).  Cache growth is bounded by the number of distinct sf_dirs
    touched in a session (1-2 in practice)."""
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


_sh_cache: dict[tuple, DataFrame] = {}


def _staged_repartition(spark: SparkSession, df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition a staged view to the session's core count before it
    is persisted.

    The staged views are map-only derivations of a packed parquet scan, and
    a parquet file is only splittable at row-group boundaries: the sf0.1
    and 10x document/embedding tables are each ONE row group, so without
    this the persisted view holds ONE cached partition and every consumer's
    map-side work over it -- the minhash fold chain, band explodes, verify
    probes -- runs as a single task no matter how many cores the session
    has (r12 core-scaling audit: dedup_minhash_lsh 7.3 s at 8 cores vs
    7.4 s at 32 on the 10x corpus; after this change 8.5 s vs 3.6 s).
    One hash exchange on the uniform key at staging time (paid once per
    session, a few MB here) buys full-width parallelism for every
    downstream pass -- the guide §2.5 "input skew: one huge unsplittable
    file -> repartition immediately after the read" posture.  Hash (not
    round-robin) partitioning avoids the sort-before-repartition pass and
    is deterministic under task retry."""
    return df.repartition(spark.sparkContext.defaultParallelism, key)


def _repersist_if_dropped(df: DataFrame) -> None:
    """Re-arm a staged view whose cache Spark dropped behind our back.

    Replacing ANY temp view that a cached plan references makes Spark
    cascade-uncache that plan (``CreateViewCommand`` →
    ``uncacheTableOrView``): after an application (or a test) swaps the
    ``documents``/``embeddings`` view for a different frame, every staged
    view built over it silently loses its persist, and the hit path of the
    staged-view caches would serve the unpersisted view for the rest of
    the session — every consumer re-deriving the whole staging per run
    (r12: found as an order-dependent plan-contract failure).  ``persist()``
    on the hit path re-registers the same analyzed plan with the cache
    manager — lazy, no job, a no-op when still cached."""
    try:
        from pyspark import StorageLevel

        if df.storageLevel == StorageLevel.NONE:
            df.persist()
    except Exception:
        pass  # storageLevel probe failed: serve the view as-is


def _shingle_view(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the shared shingle set once per (session, sf_dir) as a
    persisted temp view.  Spark inlines WITH-CTEs, so minhash/ngram would
    otherwise recompute tokenize+shingle 3x each (and once more per query
    sharing it); persisting turns that into one scan + one in-memory read.
    At cluster scale this is the standard pattern: stage the shingle table
    once, run every dedup pass against it."""
    from flatterer_spark.queries import T

    key = fresh_cache_key(_sh_cache, spark, sf_dir, "documents")
    name = f"sh_materialized_{_view_suffix(sf_dir)}"
    if key not in _sh_cache:
        T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        df = _staged_repartition(
            spark, spark.sql(sql_shingle_cte(Gen(spark=True))), "doc_id"
        ).persist()
        df.createOrReplaceTempView(name)
        _sh_cache[key] = df
    _repersist_if_dropped(_sh_cache[key])
    return name


def _make_sh_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flatterer_spark.queries import T

        # restore the base view FIRST: replacing `documents` (even just
        # restoring it after a caller swapped it) cascade-uncaches every
        # cached plan that references it, so the staged-view getter -- whose
        # hit path re-arms a dropped persist -- must run AFTER the restore
        T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        view = _shingle_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), sh_table=view))

    return run


def _ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plan for ``dedup_ngram_jaccard``: the generated SSJoin SQL
    minus its trailing ORDER BY, sorted AFTER an eager localCheckpoint
    (``kmeans._sorted_output``).  The final global sort range-partitions
    its child and SAMPLES it for range bounds; everything above the last
    materialized exchange -- the verify join recomputing the exact
    intersection over the full shingle sets, the plan's expensive HOF
    segment -- executed TWICE per query (r12 plan audit; interleaved A/B:
    plain 4.23/3.50/3.72 s vs staged 2.63/2.37/2.61 s in adjacent pairs,
    same §8 shape as the r11 emb_pq_codes fix).  Values and order are
    unchanged: the checkpoint holds the narrow (id1, id2, jaccard) rows
    and the sort runs on those; the DuckDB oracle keeps its inline
    ORDER BY."""
    from flatterer_spark.operators.kmeans import _sorted_output
    from flatterer_spark.queries import T

    # restore-then-stage: see _make_sh_query
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    view = _shingle_view(spark, sf_dir)
    sql = sql_dedup_ngram_jaccard(
        Gen(spark=True), sh_table=view, final_order=False
    )
    return _sorted_output(spark.sql(sql), "id1", "id2")


_span_cache: dict[tuple, DataFrame] = {}


def _span_view(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the stride-1 W-token span fingerprints (doc_id, sfp)
    once per (session, sf_dir) -- dedup_bloom references them three times
    (corpus bitmap, batch probes, exact check) and Spark inlines CTEs."""
    from flatterer_spark.queries import T

    key = fresh_cache_key(_span_cache, spark, sf_dir, "documents")
    name = f"span_materialized_{_view_suffix(sf_dir)}"
    if key not in _span_cache:
        g = Gen(spark=True)
        toks = g.tokens("text")
        n = g.size("toks")
        windows = g.transform(
            g.seq("1", f"{n} - {SUBSTR_W - 1}"),
            "i",
            g.join(g.slice("toks", "i", SUBSTR_W), " "),
        )
        T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        df = spark.sql(f"""
            SELECT DISTINCT doc_id, {g.md5_60('win')} AS sfp
            FROM (SELECT doc_id, {_explode(g, windows, 'win')}
                  FROM (SELECT doc_id, {toks} AS toks FROM documents) t
                  WHERE {n} >= {SUBSTR_W})
        """).persist()
        df.createOrReplaceTempView(name)
        _span_cache[key] = df
    _repersist_if_dropped(_span_cache[key])
    return name


def _make_span_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flatterer_spark.queries import T

        # restore-then-stage: see _make_sh_query
        T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        view = _span_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), span_table=view))

    return run


_en_cache: dict[tuple, DataFrame] = {}


def _emb_view(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (vec_id, e, nrm) once per (session, sf_dir) -- the norm
    fold is otherwise recomputed at every ``en`` reference (Spark inlines
    CTEs; dedup_embedding_lsh alone references it 3x)."""
    from flatterer_spark.queries import T

    key = fresh_cache_key(_en_cache, spark, sf_dir, "embeddings")
    name = f"en_materialized_{_view_suffix(sf_dir)}"
    if key not in _en_cache:
        T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
        df = _staged_repartition(
            spark, spark.sql(sql_emb_norm_query(Gen(spark=True))), "vec_id"
        ).persist()
        df.createOrReplaceTempView(name)
        _en_cache[key] = df
    _repersist_if_dropped(_en_cache[key])
    return name


_bl_cache: dict[tuple, DataFrame] = {}


def _emb_band_view(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (vec_id, band) once per (session, sf_dir): the band
    expression evaluates 48 hyperplane dots per vector, and the LSH self-join
    would otherwise evaluate it on BOTH sides (Spark inlines CTEs).  At
    cluster scale this is the staged-signature pattern: compute signatures in
    one pass, then all candidate joins read the staged table."""
    key = fresh_cache_key(_bl_cache, spark, sf_dir, "embeddings")
    name = f"embl_materialized_{_view_suffix(sf_dir)}"
    if key not in _bl_cache:
        en = _emb_view(spark, sf_dir)
        g = Gen(spark=True)
        df = spark.sql(
            f"SELECT vec_id, {_explode(g, _emb_band_arr(g), 'band')} FROM {en}"
        ).persist()
        df.createOrReplaceTempView(name)
        _bl_cache[key] = df
    _repersist_if_dropped(_bl_cache[key])
    return name


def _make_emb_lsh_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flatterer_spark.queries import T

        # restore-then-stage: see _make_sh_query
        T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
        en = _emb_view(spark, sf_dir)
        bl = _emb_band_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), en_table=en, bl_table=bl))

    return run


def _make_en_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from flatterer_spark.queries import T

        # restore-then-stage: see _make_sh_query
        T(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
        view = _emb_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), en_table=view))

    return run


_pairs_cache: dict[tuple, str] = {}


def _pairs_view(spark: SparkSession, sf_dir: str) -> str:
    """Stage the verified 0.3-floor SSJoin pair set once per (session,
    sf_dir) as a REAL parquet table (session tempdir), not an in-memory
    cache: the pair plan is full of higher-order-function lambdas, and
    Spark's cache substitution does not reliably match such plans when a
    consumer references the persisted view (observed: every consumer
    re-ran the whole SSJoin despite an eagerly-filled persist).  A parquet
    stage is also the production-faithful shape -- the pair set is THE
    expensive dedup artifact, written once and re-read by calibration
    (threshold sweep), resolution, and audits."""
    import atexit
    import shutil
    import tempfile

    from flatterer_spark.queries import T

    key = fresh_cache_key(_pairs_cache, spark, sf_dir, "documents")
    name = f"pairs_materialized_{_view_suffix(sf_dir)}"
    if key not in _pairs_cache:
        # restore-then-stage: see _make_sh_query
        T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
        sh = _shingle_view(spark, sf_dir)
        path = tempfile.mkdtemp(prefix="flatterer_pairs_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        # no final ORDER BY on the staged write: parquet needs no order,
        # and the global sort's range sampling would re-execute the whole
        # verify join (see _ngram_jaccard_query); consumers aggregate the
        # pair SET, which is unchanged
        spark.sql(
            sql_dedup_ngram_jaccard(
                Gen(spark=True), threshold=0.3, sh_table=sh, final_order=False
            )
        ).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        _pairs_cache[key] = name
    return name


def _kmv_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path Spark plan for ``corpus_source_overlap_kmv``: stage the
    per-source KMV sketch (|sources| x k rows) to a session-temp parquet
    table, then compose the pair estimates against the staged table.  The
    sketch SQL references srcmins FOUR times and Spark inlines CTEs, so
    the unstaged plan re-ran the whole explode+hash+distinct chain per
    reference (measured 4x wall at both bench scales); staged, the heavy
    chain runs once and the pair composition touches only sketch rows --
    which is the entire point of sketching at 100 TB (persist the sketch,
    re-probe it).  Unlike ``_pairs_view`` this is NOT session-cached: the
    sketch build is the operator's own core work, so every call (and
    every bench rep) pays it -- the measured slope stays honest."""
    import atexit
    import shutil
    import tempfile

    from flatterer_spark.queries import T

    # restore-then-stage: see _make_sh_query
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    sh = _shingle_view(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="flatterer_kmvmins_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    spark.sql(
        sql_kmv_srcmins(Gen(spark=True), sh_table=sh)
    ).write.mode("overwrite").parquet(path)
    name = f"kmv_mins_{_view_suffix(sf_dir)}"
    spark.read.parquet(path).createOrReplaceTempView(name)
    return spark.sql(
        sql_corpus_source_overlap_kmv(Gen(spark=True), mins_table=name)
    )


def _make_pairs_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        view = _pairs_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), pairs_table=view))

    return run


_phash_cache: dict[tuple, DataFrame] = {}


def _phash_view(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (doc_id, phash) once per (session, sf_dir) via the real
    multimodal Arrow stage -- the banded pairs query references the
    signatures three times (band explode + both verify sides) and Spark
    inlines CTEs, which would re-run the Python decode pass each time."""
    from flatterer_spark.operators import multimodal as MM

    key = fresh_cache_key(_phash_cache, spark, sf_dir, "documents")
    name = f"phash_materialized_{_view_suffix(sf_dir)}"
    if key not in _phash_cache:
        df = MM.phash_signatures(spark, sf_dir).persist()
        df.createOrReplaceTempView(name)
        _phash_cache[key] = df
    _repersist_if_dropped(_phash_cache[key])
    return name


def _make_phash_query(builder):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        view = _phash_view(spark, sf_dir)
        return spark.sql(builder(Gen(spark=True), sig_table=view))

    return run


def _hamming_banded_with_metric() -> Callable[[SparkSession, str], DataFrame]:
    """sim_topk_hamming_banded plus the certified-vs-fallback telemetry
    VERDICT r6 asked for: pigeonhole makes the branch exactly recoverable
    from the OUTPUT (a query is certified iff its whole top-k sits at
    hamming <= 3 -- banding never misses a <=3 neighbor), so the metric
    costs one tiny aggregate over the <= n_queries*k result and only runs
    when DEBUG logging is on (FLATTERER_LOG=debug); the gate/bench path
    pays nothing."""
    import logging

    base = _make_query(sql_sim_topk_hamming_banded, ("embeddings",))
    log = logging.getLogger("flatterer_spark")

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = base(spark, sf_dir)
        if log.isEnabledFor(logging.DEBUG):
            import pyspark.sql.functions as F

            per_q = df.groupBy("query_id").agg(
                (F.max("hamming") <= 3).alias("certified")
            ).collect()
            n_cert = sum(1 for r in per_q if r["certified"])
            log.debug(
                "sim_topk_hamming_banded: %d/%d queries certified by the "
                "banded pass (pigeonhole radius 3), %d brute-force fallbacks",
                n_cert, len(per_q), len(per_q) - n_cert,
            )
        return df

    return run


def _custom_spark() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Scale-path Spark plans that produce byte-identical results to the
    declarative builders; the oracle SQL stays the spec."""
    from flatterer_spark.operators import dedup as D

    return {
        "sim_topk_hamming_banded": _hamming_banded_with_metric(),
        "dedup_simhash": D.simhash_query,
        "dedup_simhash_pairs": D.simhash_pairs_query,
        "dedup_embedding": D.embedding_near_dup_pairs,
        "dedup_ngram_jaccard": _ngram_jaccard_query,
        "dedup_minhash_lsh": _make_sh_query(sql_dedup_minhash_lsh),
        "corpus_minhash_calibration": _make_sh_query(
            sql_corpus_minhash_calibration
        ),
        "dedup_incremental": _make_sh_query(sql_dedup_incremental),
        "split_leakage_check": _make_sh_query(sql_split_leakage_check),
        "ngram_topk": _make_sh_query(sql_ngram_topk),
        "corpus_ngram_novelty": _make_sh_query(sql_corpus_ngram_novelty),
        "corpus_kmv_cardinality": _make_sh_query(sql_corpus_kmv_cardinality),
        "corpus_source_overlap": _make_sh_query(sql_corpus_source_overlap),
        "corpus_source_overlap_kmv": _kmv_overlap_query,
        "dedup_threshold_sweep": _make_pairs_query(sql_dedup_threshold_sweep),
        "mm_phash_dedup": _make_phash_query(sql_mm_phash_dedup),
        "dedup_bloom": _make_span_query(sql_dedup_bloom),
        "dedup_embedding_lsh": _make_emb_lsh_query(sql_dedup_embedding_lsh),
        "sim_topk_bruteforce": _make_en_query(sql_sim_topk),
        "sim_topk_lsh": _make_en_query(sql_sim_topk_lsh),
        "sim_range_search": _make_en_query(sql_sim_range_search),
        "sim_topk_ivf": _make_en_query(sql_sim_topk_ivf),
        "sim_ivf_recall": _make_en_query(sql_sim_ivf_recall),
        "sim_lsh_recall": _make_en_query(sql_sim_lsh_recall),
        "sim_lsh_buckets": _make_en_query(sql_sim_lsh_buckets),
        "emb_label_centroids": _make_en_query(sql_emb_label_centroids),
        "sim_knn_classify": _make_en_query(sql_sim_knn_classify),
    }


def _pca() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # oracle-checked via _pca_oracles (numpy refit + literal-splice
    # projection; operators/pca.py module docstring, "Oracle");
    # tests/test_pca.py additionally verifies the component and projections
    # against numpy's full-data eigendecomposition
    from flatterer_spark.operators import pca as P

    return {"emb_pca_project": P.emb_pca_project}


def _pca_oracles() -> dict[str, str]:
    from flatterer_spark.operators import pca as P

    try:
        return {"emb_pca_project": P.oracle_emb_pca_project()}
    except OSError:
        return {}


def _kmeans() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # All three ARE oracle-checked (see _kmeans_oracles): the fitted models
    # are bit-deterministic, so a numpy refit + DuckDB replay over the
    # model literals hash-checks both the fit and the scoring pass.  For
    # sim_topk_ivfpq the oracle replays the ENTIRE search path (cell
    # assign, PQ encode, probe selection, ADC, shortlist, exact re-rank)
    # from independently-refit model literals -- not self-referential: the
    # models come from the sequential numpy references and every search
    # stage is re-evaluated by DuckDB.  tests/test_kmeans.py additionally
    # verifies recall against brute force and the models EXACTLY against a
    # sequential numpy reference.
    from flatterer_spark.operators import kmeans as KM

    from flatterer_spark.operators import semantic as SM

    return {
        "emb_kmeans": KM.emb_kmeans,
        "emb_coreset_kcenter": KM.emb_coreset_kcenter,
        "emb_pq_codes": KM.pq_codes,
        "sim_topk_ivfpq": KM.sim_topk_ivfpq,
        "dedup_semantic": SM.dedup_semantic,
        "emb_outliers": SM.emb_outliers,
    }


def _data_derived_oracle_builders() -> dict[str, Callable[[str], str]]:
    """Oracles whose SQL embeds literals computed FROM the data (learned
    models refit by an independent numpy pass).  The static EXT_ORACLE
    entries are built at the driver's gate scale (sf0.01 by default /
    $SPARK_GRAFT_ORACLE_SF_DIR); anything comparing at another scale (the
    sf0.001 pytest compare tests, xcheck at arbitrary dirs) must rebuild
    via these per-scale builders instead."""
    from flatterer_spark.operators import kmeans as KM
    from flatterer_spark.operators import pca as P

    from flatterer_spark.operators import semantic as SM

    return {
        "emb_kmeans": lambda sf: KM.oracle_emb_kmeans(sf_dir=sf),
        "emb_coreset_kcenter":
            lambda sf: KM.oracle_emb_coreset_kcenter(sf_dir=sf),
        "emb_pq_codes": lambda sf: KM.oracle_emb_pq_codes(sf_dir=sf),
        "emb_pca_project": lambda sf: P.oracle_emb_pca_project(sf_dir=sf),
        "sim_topk_ivfpq": lambda sf: KM.oracle_sim_topk_ivfpq(sf_dir=sf),
        "dedup_semantic": lambda sf: SM.oracle_dedup_semantic(sf_dir=sf),
        "emb_outliers": lambda sf: SM.oracle_emb_outliers(sf_dir=sf),
    }


EXT_ORACLE_BUILDERS: dict[str, Callable[[str], str]] = (
    _data_derived_oracle_builders()
)


def _kmeans_oracles() -> dict[str, str]:
    from flatterer_spark.operators import kmeans as KM

    from flatterer_spark.operators import semantic as SM

    try:
        return {
            "emb_kmeans": KM.oracle_emb_kmeans(),
            "emb_coreset_kcenter": KM.oracle_emb_coreset_kcenter(),
            "emb_pq_codes": KM.oracle_emb_pq_codes(),
            "sim_topk_ivfpq": KM.oracle_sim_topk_ivfpq(),
            "dedup_semantic": SM.oracle_dedup_semantic(),
            "emb_outliers": SM.oracle_emb_outliers(),
        }
    except OSError:
        # testdata absent (e.g. bare checkout): these degrade to the
        # rows-only gate check instead of breaking module import
        return {}


def _multimodal() -> tuple[dict, dict]:
    from flatterer_spark.operators import multimodal as M

    queries = {
        "mm_binary_meta": M.binary_metadata,
        "mm_frame_sample": M.frame_sample,
        "mm_downsample": M.downsample,
        "mm_embed_stub": M.embed_stub,
    }
    oracles = {
        "mm_binary_meta": M.MM_ORACLE,
        "mm_frame_sample": M.FRAME_ORACLE,
        "mm_downsample": M.DOWNSAMPLE_ORACLE,
        "mm_embed_stub": M.EMBED_ORACLE,
    }
    return queries, oracles


EXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _make_query(builder, tables)
    for name, (builder, tables) in _BUILDERS.items()
}
EXT_QUERIES.update(_custom_spark())
EXT_QUERIES.update(_pca())
EXT_QUERIES.update(_kmeans())

EXT_ORACLE: dict[str, str] = {
    name: builder(Gen(spark=False)) for name, (builder, tables) in _BUILDERS.items()
}
EXT_ORACLE.update(_kmeans_oracles())
EXT_ORACLE.update(_pca_oracles())

_mm_q, _mm_o = _multimodal()
EXT_QUERIES.update(_mm_q)
EXT_ORACLE.update(_mm_o)

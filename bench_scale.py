"""Scale-slope bench: the sf0.1 bench can hide superlinear plans (the
round-5 flatten degradation was only visible at 4x its bench size), so this
harness measures the 10 most expensive BATCH queries at sf0.1 AND at a 10x
corpus, and reports the per-op wall-time slope.

10x corpus construction (one-off under /tmp, deterministic): ten copies of
the sf0.1 tables with remapped ids; copy 0 is the original rows, copies 1-9
are hash-perturbed --

 - documents: ~30% of tokens rewritten to a hash-chosen vocabulary word, so
   copies are NOT near-duplicates of each other (naive replication would
   grow the dedup-family pair sets quadratically by SEMANTICS and the slope
   would measure the data artifact, not the plan);
 - embeddings: deterministic hash noise (+-0.025/dim) on every copy;
 - events: event/user ids offset per copy (10x users, same time range);
 - lineitem/orders: order keys offset per copy (facts grow 10x, dims stay
   -- the realistic star-schema growth mode);
 - dims (region nation customer supplier part): shared unchanged.

r12: documents/embeddings are written with ROW_GROUP_SIZE 5000 -- DuckDB's
default single 50k-row row group made the 10x files unsplittable (parquet
splits only at row-group boundaries), so every documents/embeddings scan ran
as ONE task and the corpus measured the layout artifact, not the plan's
parallelism (the 8-vs-32-core ratios read ~1.0 for the whole doc family).
Delete /tmp/spark_graft_scale10x to regenerate.

Slope semantics: wall(10x)/wall(1x) against 10x rows.  Local wall times
carry fixed scheduler overhead (~0.3-0.8 s/job), so healthy slopes sit well
BELOW 10; a slope much above 10 means superlinear work and earns a plan
audit.  Usage:  python bench_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = "/tmp/spark_graft_scale10x"
COPIES = 10

# the 10 most expensive batch (non-streaming) queries of BENCH_DETAIL r5,
# plus round-7 additions worth auditing (banded-join family)
OPS = [
    "corpus_minhash_calibration",
    "emb_pq_codes",
    "sim_topk_ivfpq",
    "emb_kmeans",
    "dedup_cluster",
    "dedup_bloom",
    "dedup_simhash_pairs",
    "q51_market_share",
    "corpus_source_overlap",
    "corpus_source_overlap_kmv",
    "dedup_embedding",
    "dedup_boilerplate",
    # r11 additions: the ANN recall@k evals -- composition of the audited
    # exact + ANN top-k paths; the new-to-audit piece is the exact side's
    # n_queries x N scoring (linear in corpus by construction)
    "sim_ivf_recall",
    "sim_lsh_recall",
]

VOCAB_SQL = (
    "SELECT list(DISTINCT w) AS v FROM ("
    "SELECT unnest(string_split(text, ' ')) AS w FROM read_parquet($doc))"
)


def build_corpus() -> None:
    import duckdb

    os.makedirs(SCALE_DIR, exist_ok=True)
    done = os.path.join(SCALE_DIR, ".done")
    if os.path.exists(done):
        return
    con = duckdb.connect()
    p = lambda t: f"{SF1}/{t}.parquet"
    o = lambda t: f"{SCALE_DIR}/{t}.parquet"

    vocab = con.execute(
        VOCAB_SQL.replace("$doc", f"'{p('documents')}'")
    ).fetchone()[0]
    vlit = "[" + ", ".join(f"'{w}'" for w in sorted(vocab)) + "]"

    n_doc = con.execute(
        f"SELECT max(doc_id)+1 FROM read_parquet('{p('documents')}')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + c * {n_doc} AS doc_id,
                 CASE WHEN c = 0 THEN text ELSE array_to_string(
                   list_transform(string_split(text, ' '), w ->
                     CASE WHEN hash(w, doc_id, c) % 10 < 3
                          THEN ({vlit})[CAST(
                            1 + hash(c, doc_id, w) % {len(vocab)} AS BIGINT)]
                          ELSE w END), ' ') END AS text,
                 lang, source,
                 CAST(NULL AS BIGINT) AS n_chars
          FROM read_parquet('{p('documents')}'), range({COPIES}) t(c)
        ) TO '{o('documents')}' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (SELECT doc_id, text, lang, source,
                     CAST(length(text) AS BIGINT) AS n_chars
              FROM read_parquet('{o('documents')}'))
        TO '{o('documents')}.fix' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
    """)
    os.replace(o("documents") + ".fix", o("documents"))

    n_vec = con.execute(
        f"SELECT max(vec_id)+1 FROM read_parquet('{p('embeddings')}')"
    ).fetchone()[0]
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{p('embeddings')}') LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT vec_id + c * {n_vec} AS vec_id,
                 CASE WHEN c = 0 THEN embedding ELSE
                   list_transform(generate_series(1, {dim}), i ->
                     CAST(embedding[i]
                          + (CAST(hash(vec_id, i, c) % 1000 AS DOUBLE)
                             / 1000.0 - 0.5) * 0.05 AS FLOAT)) END
                   AS embedding
          FROM read_parquet('{p('embeddings')}'), range({COPIES}) t(c)
        ) TO '{o('embeddings')}' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
    """)

    n_ev, n_usr = con.execute(
        f"SELECT max(event_id)+1, max(user_id)+1 "
        f"FROM read_parquet('{p('events')}')"
    ).fetchone()
    con.execute(f"""
        COPY (
          SELECT event_id + c * {n_ev} AS event_id, ts,
                 user_id + c * {n_usr} AS user_id,
                 event_type, value, props
          FROM read_parquet('{p('events')}'), range({COPIES}) t(c)
        ) TO '{o('events')}' (FORMAT PARQUET)
    """)

    n_ord = con.execute(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{p('orders')}')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT o_orderkey + c * {n_ord} AS o_orderkey,
                 * EXCLUDE (o_orderkey)
          FROM read_parquet('{p('orders')}'), range({COPIES}) t(c)
        ) TO '{o('orders')}' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT l_orderkey + c * {n_ord} AS l_orderkey,
                 * EXCLUDE (l_orderkey)
          FROM read_parquet('{p('lineitem')}'), range({COPIES}) t(c)
        ) TO '{o('lineitem')}' (FORMAT PARQUET)
    """)

    for t in ("region", "nation", "customer", "supplier", "part"):
        if not os.path.exists(o(t)):
            os.symlink(p(t), o(t))
    with open(done, "w") as f:
        f.write("ok")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE_r06.json"
    only = set(sys.argv[2:])  # optional: audit a subset of OPS
    build_corpus()

    from flatterer_spark.registry import all_queries
    from flatterer_spark.session import get_spark

    ALL_QUERIES = all_queries()
    spark = get_spark(app_name="flatterer-spark-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: ambient VM noise is +-20%
            t0 = time.time()
            df = ALL_QUERIES[name](spark, sf_dir)
            df.collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # warm both datasets' file indexes / codegen
    ALL_QUERIES["dedup_bloom"](spark, SF1).collect()
    ALL_QUERIES["dedup_bloom"](spark, SCALE_DIR).collect()

    results = {}
    for name in OPS:
        if only and name not in only:
            continue
        t1 = run(name, SF1)
        t10 = run(name, SCALE_DIR)
        results[name] = {
            "sf0.1_sec": t1,
            "x10_sec": t10,
            "slope": round(t10 / t1, 2) if t1 > 0 else None,
        }
        print(f"{name}: {t1}s -> {t10}s  slope={results[name]['slope']}",
              flush=True)

    doc = {
        "metric": "scale_slope",
        "what": ("wall(10x corpus)/wall(sf0.1), min-of-2 per point, "
                 "local[32]; 10x corpus = 10 hash-perturbed copies "
                 "(see bench_scale.py docstring); slope ~10 = linear, "
                 ">13 = superlinear -> plan audit"),
        "ops": results,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scale_slope_max",
                      "value": max(r["slope"] for r in results.values()),
                      "ops": len(results)}))


if __name__ == "__main__":
    main()

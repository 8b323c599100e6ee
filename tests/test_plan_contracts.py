"""Physical-plan contracts: the optimizations the 100 TB posture depends on
must be visible in the optimized/physical plans, not assumed.  A regression
that silently drops a pushdown, a broadcast, or partial aggregation passes
value-correctness tests but fails here."""

from __future__ import annotations

import pytest

from flatterer_spark.queries import CORE_QUERIES
from tests.conftest import plan_of as _plan


@pytest.fixture(autouse=True)
def _fresh_plans():
    """Plan contracts must inspect a FRESHLY BUILT plan.  The r12 plan memo
    shares one DataFrame per (session, sf_dir, query); once any earlier test
    has EXECUTED it, its AQE explain dump carries both a "Final Plan" and an
    "Initial Plan" section, doubling every node-count assertion here (the
    plan itself is unchanged -- it is the dump that gains a section).
    Clearing the memo keeps these tests order-independent and makes them
    exercise exactly what a first call builds."""
    from flatterer_spark import queries

    queries._PLAN_CACHE.clear()
    yield


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    """Scan-level pushdown: the status filter must reach the parquet reader
    and the scan must read only the projected columns."""
    plan = _plan(CORE_QUERIES["q01_filter_project"](spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema  # column pruning


def test_q02_dimension_joins_broadcast(spark, sf_dir):
    """Both dimension joins must be broadcast, never shuffle the fact side."""
    plan = _plan(CORE_QUERIES["q02_join_dims"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q06_partial_final_aggregation(spark, sf_dir):
    """Hash aggregation must run map-side partial + final (one shuffle of
    pre-aggregated groups, not raw rows)."""
    plan = _plan(CORE_QUERIES["q06_groupby_agg"](spark, sf_dir))
    assert "partial_sum" in plan or "Functions [partial_" in plan or (
        plan.count("HashAggregate") >= 2
    )


def test_q11_topk_is_take_ordered(spark, sf_dir):
    """Global top-k must plan as TakeOrderedAndProject, not a full sort."""
    plan = _plan(CORE_QUERIES["q11_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q04_semi_and_q05_anti_join_shapes(spark, sf_dir):
    plan4 = _plan(CORE_QUERIES["q04_semi_join"](spark, sf_dir))
    assert "LeftSemi" in plan4
    plan5 = _plan(CORE_QUERIES["q05_anti_join"](spark, sf_dir))
    assert "LeftAnti" in plan5


def test_q17_range_join_is_equi_join_on_user(spark, sf_dir):
    """The bounded time-range self-join must hash-join on user_id (range
    predicate inside the join condition), not a nested-loop cross join."""
    plan = _plan(CORE_QUERIES["q17_range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q27_sessionize_single_data_shuffle(spark, sf_dir):
    """Both window passes AND the session groupBy must ride one hash
    partitioning on user_id (grouping on (user_id, session_seq) is satisfied
    by user_id clustering); only the final ORDER BY adds a range exchange."""
    import re

    plan = _plan(CORE_QUERIES["q27_sessionize"](spark, sf_dir))
    assert len(re.findall(r"Exchange \(\d+\)", plan)) <= 2


def test_q31_moments_join_broadcasts(spark, sf_dir):
    """The per-type moment table is a handful of rows: it must broadcast back
    onto the fact side, never shuffle the events."""
    plan = _plan(CORE_QUERIES["q31_zscore"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_exact_single_shuffle(spark, sf_dir):
    """Exact dedup is one hash-groupBy: exactly one exchange (plus AQE
    reads), no joins."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    import re

    plan = _plan(EXT_QUERIES["dedup_exact"](spark, sf_dir))
    assert "Join" not in plan
    # tree nodes render as "Exchange (n)"; group-key exchange + ORDER BY range
    assert len(re.findall(r"Exchange \(\d+\)", plan)) <= 2


def test_embedding_ops_have_no_local_table_scan(spark, sf_dir):
    """Scale-path guarantee: no driver-side LocalTableScan of the vector set
    (the old dedup_embedding collect() would show one)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    for name in ("dedup_embedding", "dedup_embedding_lsh", "sim_topk_lsh"):
        plan = _plan(EXT_QUERIES[name](spark, sf_dir))
        assert "LocalTableScan" not in plan, name


def test_bucketed_ann_consumers_have_no_corpus_cross_join(spark, sf_dir):
    """mm_sim_topk and sim_knn_classify must score via the multiprobe bucket
    equi-join, never a nested-loop / cartesian scoring of the full corpus
    (the r2 mm_sim_topk shape these replaced)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    for name in ("mm_sim_topk", "sim_knn_classify"):
        plan = _plan(EXT_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_lsh_verify_not_serialized_by_aqe(spark, sf_dir):
    """The LSH candidate sets are few MB but carry huge per-row CPU
    (interpreted higher-order-function verify math); without an explicit
    round-robin repartition AQE coalesces them to one partition and the
    verify join runs on a single core (measured 4x at sf0.1).  The
    REPARTITION hint must survive into the physical plan.

    dedup_ngram_jaccard's registered query localCheckpoints the verify
    output before the final sort (r12: the global sort's range sampling
    re-executed the verify join), so its RETURNED plan is a Sort over the
    checkpointed RDD and the hint is invisible there -- the contract is
    checked on the pre-checkpoint plan the wrapper actually executes."""
    from flatterer_spark.ext_queries import (
        EXT_QUERIES,
        Gen,
        _shingle_view,
        sql_dedup_ngram_jaccard,
    )
    from flatterer_spark.queries import T

    for name in ("dedup_embedding_lsh", "dedup_minhash_lsh"):
        plan = _plan(EXT_QUERIES[name](spark, sf_dir))
        assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan, name

    view = _shingle_view(spark, sf_dir)
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    plan = _plan(
        spark.sql(
            sql_dedup_ngram_jaccard(
                Gen(spark=True), sh_table=view, final_order=False
            )
        )
    )
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan


def test_flatten_tables_prune_nested_schema(spark, tmp_path):
    """Each emitted table's plan must read only its own struct branches
    (nested-schema pruning): the child table scan must not read the parent's
    scalar columns."""
    import json

    from flatterer_spark.flatten_api import flatten_dataframes

    doc = {"id": 1, "big_scalar": "x" * 10, "tags": [{"t": "a"}]}
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps(doc) + "\n")
    # low_memory: pins the UNCACHED path's scan pruning (the default path
    # persists the full input once -- main needs every column anyway -- so
    # its per-table reads prune from the cache, not the file scan)
    res = flatten_dataframes(
        spark, str(p), ndjson=True, ordinals="partition", low_memory=True
    )
    plan = _plan(res.tables["tags"])
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "tags" in read_schema
    assert "big_scalar" not in read_schema


def test_q35_topk_and_no_cartesian(spark, sf_dir):
    """TPC-H Q3 shape: the top-10 must be TakeOrderedAndProject (no global
    sort of the grouped output) and the 3-way join must never degenerate to
    a cartesian product."""
    plan = _plan(CORE_QUERIES["q35_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan


def test_ngram_topk_single_shuffle_topk(spark, sf_dir):
    """Heavy-hitter n-grams: one partial+final agg shuffle feeding
    TakeOrderedAndProject -- never a global sort of all gram counts."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["ngram_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_dedup_substring_no_pairwise_join(spark, sf_dir):
    """Exact-substring dedup must be pure group-by on the span fingerprint:
    no join of any kind (the suffix-array pairwise pass is replaced by the
    uniform-key aggregation), and the fingerprint -- the operator's widest
    shuffle key -- must be a 64-bit BIGINT, not the 32-char md5 hex STRING
    (~4x the exchange width; VERDICT r4 'What's wrong' #4)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    df = EXT_QUERIES["dedup_substring"](spark, sf_dir)
    plan = _plan(df)
    assert "Join" not in plan
    assert "Cartesian" not in plan
    assert dict(df.dtypes)["span_fp"] == "bigint"


def test_dedup_incremental_filters_below_verify(spark, sf_dir):
    """Incremental dedup must join batch-bands against corpus-bands -- the
    batch-membership split (doc_id % 5) has to sit BELOW the candidate and
    verify joins, never as a post-hoc filter over the full corpus x corpus
    pair set (VERDICT r4 'What's wrong' #5).  Physical plans print root
    first, so the text before the FIRST Join is everything above all joins:
    it must not contain the straddle predicate."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["dedup_incremental"](spark, sf_dir))
    assert "% 5" in plan, "batch-membership split missing from the plan"
    above_joins = plan.split("Join")[0]
    assert "% 5" not in above_joins, (
        "batch straddle filter sits above the joins: the query planned the "
        "full pair set + filter, not batch-bands x corpus-bands"
    )
    assert "Cartesian" not in plan


def test_q36_semi_join_with_interval_residual(spark, sf_dir):
    """TPC-H Q4 shape: the EXISTS compiles to a LeftSemi hash join on the
    order key with the interval predicate as a residual -- never a
    nested-loop over the (order x lineitem) space."""
    plan = _plan(CORE_QUERIES["q36_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q38_q39_q40_dimension_broadcasts(spark, sf_dir):
    """Q14/Q15/Q10 shapes: part, the 1-row max, supplier, and nation are all
    dimension-sized -- they must broadcast, never shuffle the fact side."""
    plan38 = _plan(CORE_QUERIES["q38_promo_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan38
    assert "SortMergeJoin" not in plan38
    plan39 = _plan(CORE_QUERIES["q39_top_supplier"](spark, sf_dir))
    assert plan39.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan39
    plan40 = _plan(CORE_QUERIES["q40_returned_items"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan40
    assert "TakeOrderedAndProject" in plan40
    assert "Cartesian" not in plan40


def test_text_entropy_partial_agg_no_join(spark, sf_dir):
    """Entropy = explode -> two hash aggs.  Both must plan partial+final
    (map-side combine collapses the exploded char stream to ~|alphabet| rows
    per doc before the shuffle) and there must be no join anywhere."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["text_entropy"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 4  # 2 aggs x (partial + final)
    assert "Generate" in plan  # map-side explode


def test_text_ccnet_buckets_no_global_sort_window(spark, sf_dir):
    """Tercile bucketing must come from a 2-value cutpoint aggregate
    broadcast back onto the docs (map-side CASE), never an NTILE window
    over a single global sort -- the shape that dies first at 100 TB."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["text_ccnet_buckets"](spark, sf_dir))
    assert "Window" not in plan
    assert "ntile(" not in plan.lower().replace("percentile(", "")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cutpoints broadcast
    assert "CartesianProduct" not in plan


def test_mix_upsample_explodes_map_side(spark, sf_dir):
    """Epoch replication must happen in a Generate (explode) node -- row
    multiplication map-side, never via a join against a generated epochs
    table -- and the epochs dim join must not degenerate to a cartesian."""
    from flatterer_spark.curation import CURATION_QUERIES

    plan = _plan(CURATION_QUERIES["mix_upsample"](spark, sf_dir))
    assert "Generate" in plan
    assert "Cartesian" not in plan


def test_q43_q44_q45_decorrelated_shapes(spark, sf_dir):
    """Q2/MAD/Q22 shapes: the decorrelated per-group max, the tiny moment
    tables and the 1-row scalar all broadcast; the NOT EXISTS plans as a
    LeftAnti; nothing degenerates to a cartesian over fact-sized inputs."""
    plan43 = _plan(CORE_QUERIES["q43_min_cost_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan43
    assert "CartesianProduct" not in plan43
    plan44 = _plan(CORE_QUERIES["q44_mad_outliers"](spark, sf_dir))
    assert plan44.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan44
    plan45 = _plan(CORE_QUERIES["q45_dormant_customers"](spark, sf_dir))
    assert "LeftAnti" in plan45
    assert "CartesianProduct" not in plan45


def test_q46_single_window_shuffle(spark, sf_dir):
    """All three rank statistics share one window spec: one hash exchange
    for the partition plus the output range sort -- never one shuffle per
    function."""
    import re

    plan = _plan(CORE_QUERIES["q46_rank_stats"](spark, sf_dir))
    assert len(re.findall(r"Exchange \(\d+\)", plan)) <= 2
    assert plan.count("Window") <= 2  # one Window node (tree + detail)


def test_emb_quantize_scan_only(spark, sf_dir):
    """Quantization is per-row expression work: no joins, no aggregation
    shuffle -- the only exchange is the output ORDER BY."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["emb_quantize"](spark, sf_dir))
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    # formatted plans print each node twice (tree + detail section)
    assert plan.count("+- Exchange") <= 1


def test_tpch_completion_dimension_broadcasts(spark, sf_dir):
    """q48/q50/q52: every region/nation/supplier/part lookup must be a
    broadcast join; the only SortMergeJoins allowed are the fact-fact joins
    (lineitem-orders, orders-customer)."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    for name, max_smj in (
        ("q48_local_supplier_volume", 2),
        ("q50_volume_shipping", 2),
        ("q52_product_profit", 1),
    ):
        plan = _plan(TPCH_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert plan.count("SortMergeJoin") <= max_smj, (
            f"{name}: dimension join fell back to shuffle\n{plan}"
        )
        assert "BroadcastHashJoin" in plan, name


def test_q49_all_predicates_pushed_to_scan(spark, sf_dir):
    """The pure-scan query must push every predicate into the parquet reader
    and prune to exactly the four referenced columns."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q49_forecast_revenue"](spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_orderkey" not in read_schema  # column pruning


def test_q58_or_of_ands_stays_equi_join(spark, sf_dir):
    """The OR-of-ANDs predicate must ride as a residual on the broadcast
    p_partkey equi join -- never degrade to a nested-loop join."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q58_discount_revenue"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q59_decorrelated_single_fact_shuffle_pass(spark, sf_dir):
    """Q21's two correlated EXISTS must be pre-decorrelated: exactly one
    lineitem scan, one fact-fact join, one aggregate over o_orderkey -- no
    second scan of lineitem and no per-row subquery shape."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q59_waiting_suppliers"](spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, "lineitem scanned twice"
    assert "CartesianProduct" not in plan


def test_q57_having_filter_before_join_back(spark, sf_dir):
    """The total_qty > 300 cut must apply inside the aggregate stage (before
    the join back to orders), so only surviving orderkeys are broadcast."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q57_large_volume_customer"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q47_scan_pushdown_and_partial_agg(spark, sf_dir):
    """TPC-H Q1: the shipdate filter must reach the parquet reader and the
    aggregation must run partial+final (one shuffle of 6 group rows)."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q47_pricing_summary"](spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    assert plan.count("HashAggregate") >= 2  # partial + final
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # column pruning


def test_q51_q53_q56_dimension_broadcasts_no_cartesian(spark, sf_dir):
    """Market share / important stock / small-qty revenue: dims broadcast,
    scalar thresholds ride as 1-row broadcasts, never a nested loop over
    the fact."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    for name in ("q51_market_share", "q53_important_stock",
                 "q56_small_qty_revenue"):
        plan = _plan(TPCH_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name
    # q53's scalar threshold: the only nested-loop allowed is the 1-row
    # threshold cross join (build side is a single aggregated row)
    plan53 = _plan(TPCH_QUERIES["q53_important_stock"](spark, sf_dir))
    assert plan53.count("lineitem.parquet") <= 2


def test_q55_distinct_pairs_then_anti_join(spark, sf_dir):
    """Parts/supplier: the (partkey, suppkey) distinct must aggregate before
    the supplier exclusion anti-joins (broadcast), keeping one fact shuffle."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan = _plan(TPCH_QUERIES["q55_parts_supplier"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_q54_q60_single_fact_shuffle_shapes(spark, sf_dir):
    """Shipping modes: one fact-fact equi join, no nested loop.  Part
    promotion: one lineitem scan, broadcast part filter, semi joins."""
    from flatterer_spark.tpch_queries import TPCH_QUERIES

    plan54 = _plan(TPCH_QUERIES["q54_shipping_modes"](spark, sf_dir))
    assert "CartesianProduct" not in plan54
    assert "BroadcastNestedLoopJoin" not in plan54

    plan60 = _plan(TPCH_QUERIES["q60_part_promotion"](spark, sf_dir))
    assert plan60.count("lineitem.parquet") == 1, "lineitem scanned twice"
    assert "LeftSemi" in plan60
    assert "CartesianProduct" not in plan60


def test_ivfpq_search_is_broadcast_cell_join(spark, sf_dir):
    """The IVF-PQ search must equi-join corpus cells against the broadcast
    probe list -- never a corpus cross join -- and scan the embeddings for
    the search exactly once (the fit is cached)."""
    from flatterer_spark.operators.kmeans import sim_topk_ivfpq

    plan = _plan(sim_topk_ivfpq(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dedup_boilerplate_no_cartesian_partial_agg(spark, sf_dir):
    """Boilerplate stripping must stay a chain of equi-joins + partial+final
    aggregates: the gram-DF rollup pre-aggregates map-side (hot boilerplate
    grams are the Zipf head), the occurrence join is an equi-join on gram,
    and the keep step is an equi anti/outer join on (doc_id, position) --
    never any cartesian pairing."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["dedup_boilerplate"](spark, sf_dir))
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "partial_" in plan or "HashAggregate" in plan


def test_corpus_ngram_novelty_single_gram_exchange(spark, sf_dir):
    """Novelty scoring computes first-appearance as a window MIN over the
    gram partition: ONE exchange of the gram stream, no self-join (the
    join form inlined the shingle chain twice and ran 3x slower), no
    cartesian pairing."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_ngram_novelty"](spark, sf_dir))
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "Join" not in plan, "novelty must be window-based, not a self-join"
    gram_exchanges = {
        ln.strip() for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "gram" in ln
    }
    assert len(gram_exchanges) <= 1, gram_exchanges
    # r12: the shingle expansion must come from the shared staged view
    # (explicitly, via sh_table), not re-run per query.  Through r11 this
    # query got the cached shingles only by cache-manager subtree
    # COINCIDENCE, which the staging-time repartition silently broke
    # (bench 0.5 s -> 3.6 s before the explicit routing).
    assert "InMemoryTableScan" in plan, "novelty must read the staged shingle view"


def test_pack_sequences_bucketed_window(spark, sf_dir):
    """pack_sequences must inherit pack_shards' two-phase shape: a window
    partitioned on the range bucket, never a global (partition-less) one."""
    from flatterer_spark.curation import CURATION_QUERIES

    plan = _plan(CURATION_QUERIES["pack_sequences"](spark, sf_dir))
    assert "Window" in plan and "_b" in plan
    assert "Cartesian" not in plan


def test_stream_dedup_minhash_chain_is_pure_jvm(spark, sf_dir):
    """The streaming near-dup's banding chain must be PURE JVM -- zero
    Python-evaluated operators and no cartesian pairing.  Since round 8 the
    band index is a persisted table probed via foreachBatch (join + min +
    compare, all Catalyst), so even the r7 operator's single
    applyInPandasWithState boundary is gone; the state-free runtime
    contract is pinned in
    tests/test_streaming.py::test_minhash_band_index_cumulative_and_state_free."""
    from flatterer_spark.ext_queries import _sql_lsh_bands_chain
    from flatterer_spark.functions.textgen import Gen

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    stream.createOrReplaceTempView("mh_plan_docs")
    chain = _sql_lsh_bands_chain(Gen(spark=True), table="mh_plan_docs")
    bl = spark.sql(f"WITH {chain} SELECT doc_id, band FROM bl")
    plan = bl._jdf.queryExecution().analyzed().toString()
    assert "Cartesian" not in plan
    assert "InPandas" not in plan and "PythonUDF" not in plan, plan


def test_sample_dsir_lr_table_broadcast(spark, sf_dir):
    """The 512-row smoothed log-ratio table must be the broadcast build
    side of the scoring join (Gen.bc_hint pins it -- Catalyst's pre-AQE
    estimate picked the exploded token stream), the lang filter must reach
    the parquet scan, and every bucket count must aggregate partial+final."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["sample_dsir"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(lang,en)" in plan  # pushed target filter
    assert plan.count("HashAggregate") >= 4  # partial+final per count


def test_mix_token_budget_single_source_agg(spark, sf_dir):
    """One partial+final agg to n_sources rows; the waterfill windows run
    over that metadata-scale table -- no join back to the corpus, no
    second documents scan beyond the two scalar/agg branches."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["mix_token_budget"](spark, sf_dir))
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_events_ewma_single_shuffle_fold(spark, sf_dir):
    """The segment-associative fold still costs ONE exchange: the window's
    hashpartitioning(user_id) satisfies both the (user_id, seg) and the
    user_id aggregations (subset-of-clustering reuse), no join.  The
    bounded-state shape is pinned too: the only collect_list over raw
    events groups on the EWMA_SEGMENT_LEN segment key (collect_list of
    (rn, value) under keys [user_id, seg]) -- the old full-history
    collect_list(struct(ts, event_id, value)) keyed on user_id alone must
    never come back (VERDICT r5 'What's wrong' #1: a 10^8-event hot key
    would materialize its entire history on one executor)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["events_ewma"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("hashpartitioning(") == 1
    assert "Window" in plan
    assert "collect_list(struct(rn" in plan, "segment-bounded fold missing"
    assert "collect_list(struct(ts" not in plan, (
        "unbounded per-user history collect is back in the plan"
    )


def test_sim_topk_hamming_banded_band_equijoin(spark, sf_dir):
    """The banded ANN's candidate stage must join the corpus on EXACT band
    equality (hash join keyed on the band column -- 4 bucket probes per
    query instead of a corpus scan); the only corpus-wide join allowed is
    the per-query fallback for radii past the pigeonhole bound, and nothing
    may plan as a cartesian product."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["sim_topk_hamming_banded"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    import re

    band_joins = re.findall(r"keys \[1\]: \[band#\d+L?\]", plan)
    assert band_joins, "no equi-join keyed on the band column in the plan"


def test_sim_topk_hamming_banded_certified_branch(spark):
    """Planted near-duplicate clusters: every query gets >= k corpus
    neighbors within hamming <= 3, so the pigeonhole-certified banded
    branch answers every query (no fallback scan contributes rows) and the
    result must still equal the brute-force spec row-for-row."""
    from flatterer_spark.ext_queries import (
        sql_sim_topk_hamming,
        sql_sim_topk_hamming_banded,
    )
    from flatterer_spark.functions.textgen import Gen

    rows = []
    vid = 0
    for q in range(10):
        # base sign pattern: distinct per cluster
        base = [1.0 if (q >> (j % 4)) & 1 else -1.0 for j in range(64)]
        rows.append((vid, base))  # the query itself
        vid += 1
    for q in range(10):
        base = [1.0 if (q >> (j % 4)) & 1 else -1.0 for j in range(64)]
        for c in range(6):  # six near-clones at hamming <= 1
            v = list(base)
            if c:
                v[(q * 6 + c) % 64] *= -1.0
            rows.append((vid, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.createOrReplaceTempView("embeddings")
    try:
        banded = spark.sql(
            sql_sim_topk_hamming_banded(Gen(spark=True))
        ).collect()
        brute = spark.sql(sql_sim_topk_hamming(Gen(spark=True))).collect()
    finally:
        spark.catalog.dropTempView("embeddings")
    assert banded == brute
    assert len(banded) == 10 * 5
    # every returned neighbor sits within the pigeonhole radius, i.e. the
    # certified branch (not the fallback) produced it
    assert max(r["hamming"] for r in banded) <= 3


def test_dedup_semantic_pair_stage_wide_and_broadcast(spark, sf_dir):
    """The within-cluster pair join must build-broadcast the asg side and
    probe over the REPARTITION-pinned side -- a shuffled join on the k-key
    cluster column caps parallelism at k and AQE then serializes the
    high-CPU cosine stage to one task (measured 6.0 s -> 1.4 s at sf0.1)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["dedup_semantic"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan


def test_kmv_is_take_ordered_k(spark, sf_dir):
    """The k smallest hashes must plan as TakeOrderedAndProject (the only
    corpus derivative leaving the executors is the k-row sketch), never a
    global sort of all distinct hashes."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_kmv_cardinality"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_dedup_bloom_bitmap_broadcast_partial_bitor(spark, sf_dir):
    """The ~130k-word bitmap must be the broadcast build side of the probe
    join (membership is map-side -- the corpus never joins the batch at
    span level except in the demo exact-check columns, also broadcast),
    and the bitmap itself must build as a partial+final bit_or."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["dedup_bloom"](spark, sf_dir))
    assert "partial_bit_or" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bm25_small_sides_broadcast_and_topk(spark, sf_dir):
    """BM25's df / dl / avgdl relations are bounded (|Q| rows, doc-count
    rows, 1 row): all three must broadcast back onto the (doc, term) tf
    side -- a SortMergeJoin here would shuffle the fact stream for a
    3-row lookup.  The final global top-k must not be a full sort."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_bm25_topk"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 3


def test_sim_topk_hamming_no_cartesian_int_only(spark, sf_dir):
    """The packed-signature self-join must stay a hash/broadcast join on
    the filtered query side (never a CartesianProduct over the corpus),
    and scoring must be XOR+popcount -- no float ops in the rank key."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["sim_topk_hamming"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "bit_count" in plan


def test_corpus_source_overlap_fp_equi_join(spark, sf_dir):
    """The overlap matrix must come from an equi-join on the 64-bit shingle
    fingerprint (uniform shuffle key), never a cartesian pairing of
    sources; the per-source size table (|sources| rows) must broadcast."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_source_overlap"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_source_overlap_kmv_prunes_before_distinct(spark, sf_dir):
    """The sketch-mode overlap's scale lever: the ``h < 2^32/prune``
    filter must sit BELOW the distinct aggregation (map-side prune of the
    exploded shingle stream -- only ~1/prune of it ever reaches a
    shuffle); sketch-compose joins are hash/equi except the |sources|^2
    pair loop, which must plan as a BROADCAST nested loop over the tiny
    per-source summary -- never an unpartitioned CartesianProduct.  The
    operator is two plans since the staging split (the sketch SQL
    references srcmins 4x and Spark inlines CTEs): the BUILD plan must
    carry the prune filter; the COMPOSE plan must read the staged sketch
    parquet, not the shingle stream."""
    from flatterer_spark.ext_queries import (
        EXT_QUERIES,
        _shingle_view,
        sql_kmv_srcmins,
    )
    from flatterer_spark.functions.textgen import Gen
    from flatterer_spark.queries import T

    view = _shingle_view(spark, sf_dir)
    T(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    build_plan = _plan(
        spark.sql(sql_kmv_srcmins(Gen(spark=True), sh_table=view))
    )
    # the prune threshold (2^32/4) must survive into the build plan as a
    # filter predicate (if a refactor drops it, the distinct agg goes
    # back to consuming the full shingle stream)
    assert "1073741824" in build_plan, "prune filter missing"
    assert "CartesianProduct" not in build_plan

    df = EXT_QUERIES["corpus_source_overlap_kmv"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the bounded pair loop
    assert "kmvmins" in plan  # composes against the staged sketch table
    assert "explode" not in plan.lower()  # never re-derives the shingles


def test_text_zipf_slope_partial_agg_no_join(spark, sf_dir):
    """Zipf fitting is agg-only: token-frequency agg (partial+final), a
    per-lang window over the tiny frequency table, one per-lang list agg
    -- no join anywhere in the plan."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["text_zipf_slope"](spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_threshold_sweep_reuses_pair_set_no_cartesian_blowup(spark, sf_dir):
    """The sweep's only non-equi join is the 7-threshold broadcast against
    the verified pair set; the underlying candidate generation must keep
    the SSJoin equi-join shape (no corpus-sized cartesian)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["dedup_threshold_sweep"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_cm_sketch_partial_agg_and_tiny_probe_join(spark, sf_dir):
    """Sketch construction must be partial+final aggregation over the
    exploded stream (the d x w grid is the shuffle payload), and the
    top-k probe joins the 1024-cell sketch via broadcast -- no shuffle of
    anything data-sized on the estimate path."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_cm_sketch"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_quantile_sketch_hist_is_partial_final_agg(spark, sf_dir):
    """The production path (the histogram) must be a partial+final agg over
    a value-only scan; the quantile picks are broadcast-side non-equi joins
    of a 7-row relation -- nothing data-sized crosses them."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["events_quantile_sketch"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "ReadSchema: struct<value:double>" in plan  # column-pruned scan


def test_bigram_nll_broadcast_count_tables_partial_avg(spark, sf_dir):
    """Scoring must join the occurrence stream to the count tables with
    hash joins (no cartesian), and the per-doc mean must carry a partial
    aggregate (map-side combine) -- the Zipf-skew-safe shape."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["text_bigram_nll"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "partial_avg" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_mm_phash_banded_join_over_arrow_stage(spark, sf_dir):
    """The fingerprints must come from the real multimodal Arrow stage
    (MapInPandas node), the candidate join must be the banded EQUI-join
    (hash/sort-merge, never a cartesian), and the staged signature view
    must be reused (InMemory relation) rather than re-running the Python
    decode per reference."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    df = EXT_QUERIES["mm_phash_dedup"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "InMemoryTableScan" in plan  # persisted signature view
    lineage = df._jdf.queryExecution().optimizedPlan().toString()
    assert "mapInPandas" in lineage or "MapInPandas" in lineage


def test_events_funnel_pushdown_no_cartesian(spark, sf_dir):
    """events_funnel's stage slices must push the event_type predicate to
    the parquet scan (each stage reads only its slice), and the non-equi
    time residual must ride the user_id equi-joins -- never a cartesian."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["events_funnel"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters:" in ln and "event_type" in ln
    ]
    assert pushed, "event_type stage predicates not pushed to the scan"


def test_minhash_calibration_candidates_from_band_join(spark, sf_dir):
    """corpus_minhash_calibration must generate candidates via the banded
    equi-join (same contract as dedup_minhash_lsh), never an all-pairs
    product; the signature relation joins by doc_id equi-keys."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    plan = _plan(EXT_QUERIES["corpus_minhash_calibration"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan  # the band equi-key is a join column


def test_sim_recall_evals_no_cartesian(spark, sf_dir):
    """The recall@k evals compose the exact scorer (bounded-query-side
    nested loop, acceptable) with the ANN candidate path; composition must
    not degrade either side to a CartesianProduct, and the ANN side's
    bucket/cell equi-join must survive (at least one hash/sort-merge equi
    join in the plan)."""
    from flatterer_spark.ext_queries import EXT_QUERIES

    for name in ("sim_ivf_recall", "sim_lsh_recall"):
        plan = _plan(EXT_QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert (
            "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
        ), name

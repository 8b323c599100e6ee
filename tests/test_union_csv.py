"""Single-pass union CSV write (sinks/union_csv.py): byte parity against
the classic per-table flow across the option matrix, text-ordinal guard
behavior, and ordering under forced multi-partition scans.

The union writer re-derives every table's rows inside transform() lambdas
instead of re-running the posexplode plans, so these tests are the
correctness contract: for any input/options, flatten() with the union
write enabled must produce byte-identical artifacts to the classic flow
(which itself is golden-pinned against the reference fixtures)."""

from __future__ import annotations

import json
import os

import pytest


def _write(tmp_path, name: str, objs: list, blank_lines: bool = False) -> str:
    p = tmp_path / name
    with open(p, "w", encoding="utf-8") as f:
        for i, o in enumerate(objs):
            f.write(json.dumps(o, ensure_ascii=False) + "\n")
            if blank_lines and i % 3 == 0:
                f.write("\n" if i % 2 else "   \n")
    return str(p)


def _flatten_both(spark, tmp_path, src, monkeypatch, threshold=5, **kw):
    """Run flatten() twice (union on / union off at a forced-low
    threshold) and return the two output dirs."""
    import flatterer_spark.flatten as fl

    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", threshold)
    out_u = str(tmp_path / "out_union")
    out_c = str(tmp_path / "out_classic")
    fl.flatten(src, out_u, spark=spark, ndjson=str(src).endswith(".ndjson"),
               csv_write="union", **kw)
    fl.flatten(src, out_c, spark=spark, ndjson=str(src).endswith(".ndjson"),
               csv_write="per-table", **kw)
    return out_u, out_c


def _assert_trees_equal(a: str, b: str) -> None:
    def walk(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                out[os.path.relpath(p, root)] = p
        return out

    fa, fb = walk(a), walk(b)
    assert set(fa) == set(fb), (sorted(fa), sorted(fb))
    for rel in sorted(fa):
        with open(fa[rel], "rb") as x, open(fb[rel], "rb") as y:
            assert x.read() == y.read(), rel


ADVERSARIAL = [
    {
        "id": 0,
        "title": 'comma, "quote" and\nnewline',
        "cr": "bare\rreturn",
        "released": "2020-01-02",
        "seen": "2020-01-02T03:04:05Z",
        "score": 2.0,
        "frac": 2.5,
        "rating": {"code": "E", "name": "Everyone"},
        "devs": [
            {"name": "α-studio", "country": {"iso": "JP"},
             "titles": [{"t": "a"}, {"t": "b"}]},
            None,
            {"name": "", "country": None, "titles": []},
        ],
        "tags": ["x", "y"],
    },
    {"id": 1, "title": "", "score": -0.0, "devs": [], "never": None},
    {"id": 2, "rating": {"code": "T"}, "devs": [{"titles": [{"t": "c"}]}]},
] + [
    {"id": 3 + i, "title": f"row {i}", "score": i * 1.5,
     "devs": [{"name": f"d{i}", "titles": [{"t": str(i)}]}]}
    for i in range(20)
]


def test_union_parity_adversarial_ndjson(spark, tmp_path, monkeypatch):
    """Whole-tree byte parity on the adversarial corpus: nested
    grandchild tables, null/empty array elements, quotes/commas/newlines/
    bare-\\r cells, whole-vs-fractional numbers, date/datetime detection,
    scalar-array JSON cells, empty strings vs nulls."""
    src = _write(tmp_path, "adv.ndjson", ADVERSARIAL)
    out_u, out_c = _flatten_both(spark, tmp_path, src, monkeypatch)
    _assert_trees_equal(out_u, out_c)


def test_union_parity_option_matrix(spark, tmp_path, monkeypatch):
    """pushdown + emit_obj + table_prefix + id_prefix ride the lambda
    chain: pushed ancestor fields must be captured at the right level and
    emit_obj children keep the fixed .0 ordinal."""
    src = _write(tmp_path, "opt.ndjson", ADVERSARIAL)
    out_u, out_c = _flatten_both(
        spark, tmp_path, src, monkeypatch,
        pushdown=("title", "name"),
        emit_obj=(("rating",),),
        table_prefix="p_",
        id_prefix="run7.",
    )
    _assert_trees_equal(out_u, out_c)


def test_union_parity_no_link(spark, tmp_path, monkeypatch):
    src = _write(tmp_path, "nolink.ndjson", ADVERSARIAL)
    out_u, out_c = _flatten_both(
        spark, tmp_path, src, monkeypatch, no_link=True
    )
    _assert_trees_equal(out_u, out_c)


def test_union_parity_multi_partition_order(spark, tmp_path, monkeypatch):
    """Force a many-split scan (tiny maxPartitionBytes): part-file concat
    order and within-partition row order must still reproduce the classic
    single-writer bytes -- this pins the stable-sort assumption under the
    partitionBy(tag) planned write."""
    objs = [
        {"id": i, "title": f"pad-{i}-" + "x" * 50,
         "kids": [{"k": i * 2}, {"k": i * 2 + 1}]}
        for i in range(4000)
    ]
    src = _write(tmp_path, "many.ndjson", objs)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        out_u, out_c = _flatten_both(
            spark, tmp_path, src, monkeypatch, threshold=100
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    _assert_trees_equal(out_u, out_c)
    with open(os.path.join(out_u, "csv", "main.csv")) as f:
        assert sum(1 for _ in f) == 4001


def test_union_parity_multi_file_and_blank_lines(spark, tmp_path, monkeypatch):
    """Text-ordinal alignment across several files in caller order, with
    blank and whitespace-only lines interleaved (the JSON reader emits no
    row for them; the text count must agree or the guard redoes)."""
    srcs = [
        _write(tmp_path, f"f{i}.ndjson",
               [{"id": i * 1000 + j, "kids": [{"k": j}]} for j in range(n)],
               blank_lines=True)
        for i, n in enumerate([37, 5, 211])
    ]
    import flatterer_spark.flatten as fl

    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 5)
    out_u = str(tmp_path / "mf_union")
    out_c = str(tmp_path / "mf_classic")
    fl.flatten(srcs, out_u, spark=spark, ndjson=True, csv_write="union")
    fl.flatten(srcs, out_c, spark=spark, ndjson=True, csv_write="per-table")
    _assert_trees_equal(out_u, out_c)


def test_text_ordinals_used_and_guard_clean(spark, tmp_path, monkeypatch):
    """Above the threshold on local NDJSON the optimistic text-ordinal map
    must actually arm (guards deferred, _ord_bad present) and pass its own
    guard -- i.e. the fast path is exercised, not silently skipped."""
    import flatterer_spark.flatten as fl
    from flatterer_spark.flatten_api import flatten_dataframes

    src = _write(tmp_path, "g.ndjson",
                 [{"id": i, "kids": [{"k": i}]} for i in range(50)])
    res = flatten_dataframes(spark, src, ndjson=True, _text_ordinals=5,
                             _multi_sink=False)
    assert res.guards_deferred
    assert "_ord_bad" in res.ordinal_df.columns
    assert res.ordinal_expected_rows == 50
    # and end-to-end via flatten(): output equals the exact path
    out_u, out_c = _flatten_both(spark, tmp_path, src, monkeypatch)
    _assert_trees_equal(out_u, out_c)


def test_ordinal_guard_miss_redoes_exact(spark, tmp_path, monkeypatch):
    """A corrupted optimistic split map (wrong count) must be caught by the
    observed guard and redone on the exact path -- final bytes identical
    to the classic flow, never silently wrong links."""
    import flatterer_spark.flatten as fl
    from flatterer_spark.sources import json_input

    real = json_input.with_ordinal_text
    calls = {"n": 0}

    def corrupt(df, spark_, paths, rows=None):
        out = real(df, spark_, paths, rows=rows)
        if out is None:
            return None
        calls["n"] += 1
        # shift every ordinal by 1: total stays plausible-looking to the
        # naive eye but the range check + row-count equality must fire
        import pyspark.sql.functions as F

        rows = out._flatterer_input_rows
        out2 = out.withColumn("_ord", F.col("_ord") + F.lit(1))
        out2._flatterer_input_rows = rows + 1
        return out2

    monkeypatch.setattr(json_input, "with_ordinal_text", corrupt)
    src = _write(tmp_path, "bad.ndjson",
                 [{"id": i, "kids": [{"k": i}]} for i in range(40)])
    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 5)
    out_u = str(tmp_path / "out_bad_union")
    fl.flatten(src, out_u, spark=spark, ndjson=True, csv_write="union")
    assert calls["n"] == 1  # the optimistic path genuinely armed
    # ... and the same corruption through the default per-table flow
    # (guard rides the classic main-table write observe there)
    out_d = str(tmp_path / "out_bad_default")
    fl.flatten(src, out_d, spark=spark, ndjson=True)
    assert calls["n"] == 2
    monkeypatch.setattr(json_input, "with_ordinal_text", real)
    out_c = str(tmp_path / "out_bad_classic")
    fl.flatten(src, out_c, spark=spark, ndjson=True, csv_write="per-table")
    _assert_trees_equal(out_d, out_c)
    _assert_trees_equal(out_u, out_c)
    assert not os.path.exists(
        os.path.join(out_u, "csv", "._union_tmp")
    )


def test_schema_drift_past_head_sample_redoes(spark, tmp_path, monkeypatch):
    """A key first seen past the head sample (optimistic schema miss) with
    guards DEFERRED: the union flow must discard its parts, redo on the
    exact path, and emit the drifted column -- byte-identical to classic."""
    objs = [{"id": i, "kids": [{"k": i}]} for i in range(3000)]
    objs.append({"id": 3000, "kids": [{"k": 1, "extra": "tail"}],
                 "surprise": True})
    src = _write(tmp_path, "drift.ndjson", objs)
    out_u, out_c = _flatten_both(
        spark, tmp_path, src, monkeypatch, threshold=100
    )
    _assert_trees_equal(out_u, out_c)
    with open(os.path.join(out_u, "fields.csv")) as f:
        body = f.read()
    assert "surprise" in body and "extra" in body


def test_union_near_empty_child_table(spark, tmp_path, monkeypatch):
    """A child table that is empty/null-element in almost every row (one
    real element fixes the schema) keeps exact rows and links through the
    union flow."""
    objs = [{"id": i, "kids": []} for i in range(30)]
    objs[7]["kids"] = [None, {"k": 42}]  # ordinal 1 after the null
    src = _write(tmp_path, "empty.ndjson", objs)
    out_u, out_c = _flatten_both(spark, tmp_path, src, monkeypatch)
    _assert_trees_equal(out_u, out_c)
    with open(os.path.join(out_u, "csv", "kids.csv")) as f:
        lines = f.read().splitlines()
    assert lines[1:] == ["7.kids.1,7,42"]


def test_concat_missing_tag_dir_header_only(tmp_path):
    """A 0-row table produces no tag directory in the union temp tree; the
    concat helper must still emit the header-only CSV (the classic
    writers' 0-row contract)."""
    from flatterer_spark.sinks.writers import concat_csv_parts

    p = str(tmp_path / "csv" / "none.csv")
    concat_csv_parts(p, ["_link", "a"], str(tmp_path / "t=missing"))
    with open(p) as f:
        assert f.read() == "_link,a\n"


def test_extreme_whole_doubles_render_nonempty(spark, tmp_path, monkeypatch):
    """Whole doubles past decimal(38,0) range (>= 1e38) must render via
    the plain string cast, not silently as an empty cell (the decimal
    overflow used to null them), and the union flow's rendered-cell
    metadata counts must equal the classic raw-column counts -- pinned by
    whole-tree parity including fields.csv."""
    objs = [
        {"id": 0, "big": 1e38, "kids": [{"k": 1e40}]},
        {"id": 1, "big": -1e39, "kids": [{"k": 2.5}]},
        {"id": 2, "big": 7.0, "kids": []},
    ] + [{"id": 3 + i, "big": float(i), "kids": [{"k": i}]} for i in range(10)]
    src = _write(tmp_path, "big.ndjson", objs)
    out_u, out_c = _flatten_both(spark, tmp_path, src, monkeypatch)
    _assert_trees_equal(out_u, out_c)
    with open(os.path.join(out_u, "csv", "main.csv")) as f:
        header = f.readline().strip().split(",")
        rows = [ln.split(",") for ln in f.read().splitlines()]
    big = header.index("big")
    # every non-null input value produced a NON-EMPTY cell
    assert all(r[big] != "" for r in rows), rows
    # and the in-range whole double still renders without the .0
    assert rows[2][big] == "7"


def test_text_ordinal_pregate_skips_small_inputs(spark, tmp_path, monkeypatch):
    """An input below 2*threshold bytes cannot clear the row threshold, so
    flatten() must not launch the text-ordinal scan job at all (the
    pre-gate reads file sizes driver-side); a large input still takes it."""
    import flatterer_spark.sources.json_input as ji

    calls = []
    real = ji.with_ordinal_text

    def spy(df, spark_, paths, rows=None):
        calls.append(list(paths))
        return real(df, spark_, paths, rows=rows)

    monkeypatch.setattr(ji, "with_ordinal_text", spy)

    # default EXACT_CSV_MAX_ROWS (100k): a 20-row file is far below the
    # 2*threshold byte gate -- the text scan must be skipped
    small = _write(tmp_path, "small.ndjson",
                   [{"id": i, "kids": [{"k": i}]} for i in range(20)])
    import flatterer_spark.flatten as fl

    fl.flatten(small, str(tmp_path / "out_small"), spark=spark, ndjson=True)
    assert calls == [], "text-ordinal scan ran on a sub-threshold input"

    # forced-low threshold: the same input is now over the byte gate and
    # the fast path arms
    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 5)
    fl.flatten(small, str(tmp_path / "out_low"), spark=spark, ndjson=True)
    assert len(calls) == 1


def test_small_child_exact_routing_without_priced_counts(
    spark, tmp_path, monkeypatch
):
    """Exact-ordinal path with unpriceable child counts: the bounded-count
    legs must still run (they conflict only with an ARMED text-ordinal
    guard observation, not with the schema-only guard deferral), so small
    child tables keep the driver-exact writer instead of silently taking
    the distributed merged writer (the ADVICE-r6 routing)."""
    import flatterer_spark.flatten as fl
    import flatterer_spark.flatten_api as fa
    from flatterer_spark.sinks import writers

    monkeypatch.setattr(fa, "_child_count_exprs", lambda schema, plans: {})

    exact_calls, merged_calls = [], []
    real_exact = writers.write_csv_exact
    real_merged = writers.write_csv_exact_merged

    def spy_exact(df, p, **kw):
        exact_calls.append(os.path.basename(p))
        return real_exact(df, p, **kw)

    def spy_merged(df, p, **kw):
        merged_calls.append(os.path.basename(p))
        return real_merged(df, p, **kw)

    monkeypatch.setattr(writers, "write_csv_exact", spy_exact)
    monkeypatch.setattr(writers, "write_csv_exact_merged", spy_merged)

    src = _write(tmp_path, "route.ndjson",
                 [{"id": i, "kids": [{"k": i}]} for i in range(20)])
    fl.flatten(src, str(tmp_path / "out_route"), spark=spark, ndjson=True)
    assert "kids.csv" in exact_calls, (exact_calls, merged_calls)
    assert merged_calls == [], merged_calls


def test_csv_write_typo_raises(spark, tmp_path):
    """A misspelled csv_write must error loudly, not silently degrade to
    N parses of the input."""
    import flatterer_spark.flatten as fl

    src = _write(tmp_path, "typo.ndjson", [{"id": 1}])
    with pytest.raises(ValueError, match="csv_write"):
        fl.flatten(src, str(tmp_path / "out_typo"), spark=spark,
                   ndjson=True, csv_write="Union")


def test_union_parity_fuzz(spark, tmp_path):
    """Hypothesis sweep of the union-writer parity: random nested
    documents (optional keys, null/empty child arrays, grandchild
    nesting, adversarial strings, whole-vs-fractional numbers) through
    the union and classic flows must produce identical artifact trees --
    the lambda-land row derivation (table_cells_expr) fuzz-pinned against
    the posexplode plans it mirrors."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"),
        include_characters='",\n\r éß',
    )
    cell = st.one_of(
        st.none(),
        st.integers(-9, 9),
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6),
        st.sampled_from([2.0, -0.0, 7.5, 1e3]),
        st.text(alphabet, max_size=8),
        st.booleans(),
    )
    grand = st.fixed_dictionaries({"t": cell})
    child = st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {"k": cell},
            optional={"g": st.lists(grand, max_size=2)},
        ),
    )
    doc = st.fixed_dictionaries(
        {"id": st.integers(0, 10**6)},
        optional={
            "s": cell,
            "obj": st.fixed_dictionaries({"x": cell}),
            "kids": st.lists(child, max_size=3),
        },
    )
    counter = iter(range(10**6))

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(doc, min_size=3, max_size=12))
    def check(docs):
        i = next(counter)
        import flatterer_spark.flatten as fl

        src = _write(tmp_path, f"fuzz{i}.ndjson", docs)
        mp = pytest.MonkeyPatch()
        try:
            mp.setattr(fl, "EXACT_CSV_MAX_ROWS", 2)
            out_u = str(tmp_path / f"fz_union{i}")
            out_c = str(tmp_path / f"fz_classic{i}")
            fl.flatten(src, out_u, spark=spark, ndjson=True,
                       csv_write="union")
            fl.flatten(src, out_c, spark=spark, ndjson=True,
                       csv_write="per-table")
        finally:
            mp.undo()
        _assert_trees_equal(out_u, out_c)

    check()


def test_union_write_plan_contract(spark):
    """The union write's final frame must plan as a narrow chain: a Sort
    on (t, _seq ascending) with NO Exchange (the sort is per-task, the
    total key is what makes within-tag order spill-deterministic) and no
    second sort above it."""
    import pyspark.sql.functions as F

    from flatterer_spark.sinks.union_csv import spill_safe_write_frame
    from tests.conftest import plan_of

    base = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, "t0").otherwise("t1").alias("t"),
        F.col("id").cast("string").alias("r"),
    )
    frame = spill_safe_write_frame(base, F.col("r"))
    plan = plan_of(frame)
    import re

    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, plan
    assert "Exchange" not in plan, plan
    # the sort key is the total (t, _seq) order, ascending
    m = re.search(r"Arguments: \[t#\d+ ASC NULLS FIRST, _seq#\d+L ASC", plan)
    assert m, plan


def test_union_write_executed_plan_contract(spark, tmp_path):
    """ADVICE r9: the pre-write frame's plan says nothing about sorts the
    WRITER inserts -- if a future Spark stops eliding its required (t)
    sort across the projection that drops _seq, a second Sort on t alone
    would silently reintroduce the spill nondeterminism
    spill_safe_write_frame exists to fix.  So pin the EXECUTED physical
    plan of a real partitionBy('t').text() write, captured from the SQL
    status store: exactly one Sort, keyed (t, _seq), no Exchange."""
    import re

    import pyspark.sql.functions as F

    from flatterer_spark.sinks.union_csv import spill_safe_write_frame

    base = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, "t0").otherwise("t1").alias("t"),
        F.col("id").cast("string").alias("r"),
    )
    out = str(tmp_path / "w")
    spill_safe_write_frame(base, F.col("r")).write.mode(
        "overwrite"
    ).partitionBy("t").text(out)

    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    plan = None
    for i in range(execs.size() - 1, -1, -1):
        desc = execs.apply(i).physicalPlanDescription()
        if "InsertIntoHadoopFsRelationCommand" in desc and out in desc:
            plan = desc
            break
    assert plan is not None, "write execution not found in SQL status store"
    sorts = re.findall(r"\(\d+\) Sort.*?Arguments: (\[[^\]]*\])", plan, re.S)
    assert len(sorts) == 1, plan
    assert re.match(
        r"\[t#\d+ ASC NULLS FIRST, _seq#\d+L ASC NULLS FIRST\]", sorts[0]
    ), sorts[0]
    assert "Exchange" not in plan, plan


def test_failed_bg_text_scan_is_fast_path_miss(spark, tmp_path, monkeypatch):
    """When the BACKGROUND text-ordinal scan fails (returns None), the join
    point must treat it as a fast-path miss and fall through to the exact
    aggregate -- NOT hand rows=None to with_ordinal_text, which would
    re-run the full text scan synchronously and double the cost the
    overlap was meant to save (ADVICE r10).  Output must equal the exact
    path either way."""
    import flatterer_spark.flatten as fl
    import flatterer_spark.sources.json_input as ji

    monkeypatch.setattr(ji, "text_ordinal_rows", lambda *a, **k: None)
    wot_calls = []
    real_wot = ji.with_ordinal_text

    def spy(df, spark_, paths, rows=None):
        wot_calls.append(rows)
        return real_wot(df, spark_, paths, rows=rows)

    monkeypatch.setattr(ji, "with_ordinal_text", spy)

    src = _write(tmp_path, "bgfail.ndjson",
                 [{"id": i, "kids": [{"k": i}]} for i in range(50)])
    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 5)
    out_u = str(tmp_path / "out_bgfail")
    fl.flatten(src, out_u, spark=spark, ndjson=True, csv_write="union")
    assert wot_calls == [], (
        "with_ordinal_text must not run (and especially not re-scan) "
        "after a failed background scan"
    )
    # exact path produced the same tree as a clean run
    monkeypatch.setattr(ji, "text_ordinal_rows", None)  # force re-import safety
    monkeypatch.undo()
    out_c = str(tmp_path / "out_clean")
    fl.flatten(src, out_c, spark=spark, ndjson=True, csv_write="per-table")
    _assert_trees_equal(out_u, out_c)

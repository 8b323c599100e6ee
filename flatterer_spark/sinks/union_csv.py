"""Single-pass union CSV write: every table's rows serialized in ONE scan.

The classic fused path writes N tables as N concurrent Spark jobs over the
same parsed input, costing N parses of the source (or one persist).  This
writer instead builds, per ROOT ROW, one array of rendered cell-structs
per table -- child tables via ``transform()`` lambdas whose element
indices reproduce the posexplode ``_link`` chains of
``flatten_api._execute_table`` exactly (same accessor walk, same
null-element rule: positions are assigned before null elements are
dropped) -- tags and explodes them into a flat ``(tag, cells)`` stream,
and writes ALL tables in one ``partitionBy(tag)`` text job.

Interpreted-vs-codegen split (the design's load-bearing decision,
profiled round 9 at 1M): Spark evaluates higher-order-function lambdas in
INTERPRETED mode, so everything that can leave the lambdas does.  Cell
structs are padded to one uniform width so the per-table arrays concat
into a single exploded stream of flat codegen'd rows; the fused metadata
aggregates then ride a ``df.observe`` of plain conditional counts (an
earlier design computed them as ``filter()``/``size()`` over the nested
arrays -- allocating, interpreted, +1.24 s at 1M), and the CSV line
itself is a row-level ``to_csv`` CASE over tags (byte-identical to the
uniVocity option set ``write_csv_exact_merged`` uses; proven at 1M on all
three bench tables, fuzz-pinned by tests/test_union_csv.py).  Tag
directories then byte-concatenate per table in partition order with the
same helper as ``write_csv_exact_merged``, so output bytes are identical
to the classic path at any partitioning.

Why one scan matters at 100 TB: the classic phase's N concurrent jobs are
at-par on an idle 32-core box (measured rounds 8-9: ~1.2-1.4 s either way
at 1M rows) but cost N object-store reads + N parses of the input on a
busy cluster, where the single job schedules ~1.6x better under
contention (COVERAGE.md round-8 groundwork; re-confirmed round 9 on a
constrained local[4] pool).  Tags are synthetic (``t0``, ``t1``...) so
table names never meet the partition-path escaper.

Ordering contract: rows flow scan-ordered through the narrow
project/observe/explode chain; a unique per-task sequence id extends the
write sort's key to the TOTAL order (t, _seq), so within a tag the
(root row, element position) order -- the classic writers' exact order
-- survives to the part files even when the sort spills (sort
STABILITY, the previous design's load-bearing assumption, does not
survive UnsafeExternalSorter's spill merge for equal keys);
``tests/test_union_csv.py`` pins byte-parity across a forced
many-partition scan.

Reference parity anchor: the output contract is the reference's
one-CSV-per-table directory (`/root/reference/docs/outputs.md:18-34`);
this module only changes how many times the engine reads the input to
honor it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.types import StringType

from flatterer_spark.plans.table_plan import TablePlan, pushdown_columns
from flatterer_spark.sinks.writers import concat_csv_parts, render_cell

# the option set proven byte-identical to Python csv.writer by
# tests/test_flatten_options.py::test_csv_exact_merged_byte_parity (same
# map write_csv_exact_merged passes to df.write.csv; to_csv emits no line
# separator so lineSep is owned by the .text() writer)
CSV_OPTS = {
    "nullValue": "",
    "emptyValue": "",
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def table_cells_expr(
    plan: TablePlan,
    by_name: dict[str, TablePlan],
    opts,
    root_link: Column,
    table_df: DataFrame,
    pad_to: int | None = None,
) -> Column:
    """array<struct<c0..cK:string>> of rendered cell rows for ``plan``,
    evaluated per ROOT row -- the lambda-land mirror of
    ``flatten_api._execute_table`` (posexplode becomes transform-with-
    index; the per-level ``WHERE element IS NOT NULL`` becomes a filter
    AFTER index assignment, preserving the original array ordinal in the
    ``_link`` chain; pushdown fields are captured from the ancestor
    element in scope at each level).  Cell rendering and column order come
    from the final table DataFrame (``formatted_strings`` parity via
    ``render_cell``), so fields_csv reorder/only_fields are honored.
    ``pad_to`` appends NULL string fields up to a uniform width so
    different tables' arrays share one element type and concat."""
    from flatterer_spark.flatten_api import _accessor, _cell, _find_col

    out_cols = list(table_df.columns)
    dtypes = {f.name: f.dataType for f in table_df.schema.fields}
    width = max(pad_to or 0, len(out_cols))
    row_ddl = (
        "struct<" + ",".join(f"c{i}:string" for i in range(width)) + ">"
    )
    pushes = (
        pushdown_columns(plan, by_name, tuple(opts.pushdown))
        if plan.ancestors
        else []
    )
    anc_plans = [by_name[n] for n, _ in plan.ancestors]
    hops = [p for _, p in plan.ancestors[1:]] + (
        [plan.path] if plan.ancestors else []
    )

    def leaf_row(cur: Column | None, links: list[Column], env: dict) -> Column:
        colmap: dict[str, Column] = {}
        if not opts.no_link:
            colmap["_link"] = links[-1]
            for i in range(len(plan.ancestors) - 1, -1, -1):
                colmap[f"_link_{plan.ancestors[i][0]}"] = links[i]
        for c in plan.cols:
            if c.name in dtypes:  # only_fields may have dropped it
                colmap[c.name] = render_cell(
                    _cell(_accessor(cur, c.path), c), dtypes[c.name]
                )
        for out_name, anc_name, fpath in pushes:
            if anc_name in env and out_name in dtypes:
                colmap[out_name] = render_cell(
                    _cell(
                        _accessor(env[anc_name], fpath),
                        _find_col(by_name[anc_name], fpath),
                    ),
                    dtypes[out_name],
                )
        cells = [colmap[n].alias(f"c{i}") for i, n in enumerate(out_cols)]
        cells += [
            F.lit(None).cast("string").alias(f"c{i}")
            for i in range(len(out_cols), width)
        ]
        return F.struct(*cells)

    if not plan.ancestors:  # main table: one row per root row
        return F.array(leaf_row(None, [root_link], {}))

    def descend(
        depth: int,
        cur: Column | None,
        consumed: int,
        links: list[Column],
        env: dict,
    ) -> Column:
        env = {**env, anc_plans[depth].name: cur}
        hop = hops[depth]
        rel = hop[consumed:]
        key = hop[-1]
        arr = _accessor(cur, rel)
        last = depth == len(hops) - 1

        if plan.is_object and last:
            # F9 emit_obj: one-to-one child, index fixed "0", no row for a
            # missing/null object
            link = F.concat_ws(".", links[-1], F.lit(key), F.lit("0"))
            row = leaf_row(arr, links + [link], env)
            return F.when(arr.isNotNull(), F.array(row)).otherwise(
                F.array().cast(f"array<{row_ddl}>")
            )

        def body(x: Column, i: Column) -> Column:
            link = F.concat_ws(
                ".", links[-1], F.lit(key), i.cast("string")
            )
            if last:
                return leaf_row(x, links + [link], env)
            return descend(depth + 1, x, len(hop), links + [link], env)

        # positions BEFORE the null-element drop (a JSON null element
        # produces no row but consumes an ordinal -- same rule as
        # posexplode + WHERE in the classic plan)
        mapped = F.filter(
            F.transform(arr, lambda x, i: F.when(x.isNotNull(), body(x, i))),
            lambda v: v.isNotNull(),
        )
        if not last:
            mapped = F.flatten(mapped)
        return F.coalesce(mapped, F.array().cast(f"array<{row_ddl}>"))

    return descend(0, None, 0, [root_link], {})


def union_metadata_aggs(
    tag: str, tag_col: Column, cells: Column, table_df: DataFrame
) -> list[Column]:
    """The fused metadata aggregates (flatten_api.metadata_agg_exprs) as
    flat conditional counts over the exploded (tag, cells) stream --
    codegen'd row-at-a-time, no per-metric array traversal.  Rendered
    cells preserve nullity in BOTH directions (render_cell maps NULL ->
    NULL and non-null -> non-null; the decimal-overflow edge that once
    nulled NaN / >=1e38 whole doubles is coalesced back to the plain
    cast) and equal the raw value on StringType columns, so the counts
    match the classic per-table observe exactly."""
    from flatterer_spark.flatten_api import date_like, datetime_like

    mine = tag_col == tag
    aggs = [F.count(F.when(mine, 1)).alias(f"{tag}|__rows")]
    for i, f in enumerate(table_df.schema.fields):
        cell = cells[f"c{i}"]
        aggs.append(
            F.count(F.when(mine & cell.isNotNull(), 1)).alias(
                f"{tag}|n::{f.name}"
            )
        )
        if isinstance(f.dataType, StringType) and not f.name.startswith(
            "_link"
        ):
            aggs.append(
                F.count(F.when(mine & date_like(cell), 1)).alias(
                    f"{tag}|d::{f.name}"
                )
            )
            aggs.append(
                F.count(F.when(mine & datetime_like(cell), 1)).alias(
                    f"{tag}|t::{f.name}"
                )
            )
    return aggs


@dataclass
class UnionWriteRun:
    tmp_dir: str
    tags: dict[str, str]               # table name -> synthetic tag
    observation: Observation
    columns: dict[str, list[str]]      # table name -> output column order


def run_union_write(result, tmp_dir: str) -> UnionWriteRun:
    """One Spark job: serialize every table's CSV body into
    ``tmp_dir/t=<tag>/part-*`` with the fused metadata observed on the
    same scan.  When the optimistic text-ordinal path is armed, its guard
    observation (attached to ``result.ordinal_df`` by flatten_dataframes)
    fires on this same job -- the caller checks it via
    ``flatten_api.ordinal_guard_ok`` before trusting the artifacts."""
    df = result.ordinal_df
    opts = result.options
    root_link = (
        F.concat(F.lit(opts.id_prefix), F.col("_ord").cast("string"))
        if opts.id_prefix
        else F.col("_ord").cast("string")
    )

    names = list(result.tables.keys())
    tags = {name: f"t{i}" for i, name in enumerate(names)}
    width = max(len(result.tables[n].columns) for n in names)

    def tagged_arr(name: str) -> Column:
        cells = table_cells_expr(
            result.plans[name], result.plans, opts, root_link,
            result.tables[name], pad_to=width,
        )
        return F.transform(
            cells,
            lambda r: F.struct(F.lit(tags[name]).alias("t"), r.alias("r")),
        )

    tagged = F.concat(*[tagged_arr(n) for n in names])
    exploded = df.select(F.explode(tagged).alias("x")).select(
        F.col("x.t").alias("t"), F.col("x.r").alias("r")
    )

    obs = Observation()
    aggs = []
    for name in names:
        aggs.extend(
            union_metadata_aggs(
                tags[name], F.col("t"), F.col("r"), result.tables[name]
            )
        )
    observed = exploded.observe(obs, *aggs)

    # row-level to_csv (codegen'd, generator cached per partition): one
    # CASE branch per table rebuilds the table-width struct from the
    # padded row, so no table ever serializes its padding
    line = None
    for name in names:
        w = len(result.tables[name].columns)
        body = F.to_csv(
            F.struct(*[F.col("r")[f"c{i}"].alias(f"c{i}") for i in range(w)]),
            CSV_OPTS,
        )
        line = (
            F.when(F.col("t") == tags[name], body)
            if line is None
            else line.when(F.col("t") == tags[name], body)
        )
    (
        spill_safe_write_frame(observed, line)
        .write.mode("overwrite")
        .partitionBy("t")
        .text(tmp_dir)
    )
    return UnionWriteRun(
        tmp_dir=tmp_dir,
        tags=tags,
        observation=obs,
        columns={n: list(result.tables[n].columns) for n in names},
    )


def spill_safe_write_frame(observed: DataFrame, line: Column) -> DataFrame:
    """The final (t, value) frame the partitionBy(t) text write consumes.

    Spill-safe ordering: the write's per-task sort must order by tag
    WITHOUT permuting rows within a tag, but sort stability only holds
    while the sort stays in memory -- UnsafeExternalSorter's spill merge
    interleaves equal-key records from different runs in heap order.  A
    unique per-task sequence id makes the key (t, _seq) a TOTAL order:
    identical to the stable in-memory result, deterministic under any
    spill.  The explicit sortWithinPartitions satisfies the writer's
    required (t) ordering (prefix), so no second sort is planned --
    pinned by tests/test_union_csv.py::test_union_write_plan_contract."""
    return (
        observed.select(F.col("t"), line.alias("value"))
        .withColumn("_seq", F.monotonically_increasing_id())
        .sortWithinPartitions("t", "_seq")
        .select("t", "value")
    )


def observed_metadata(run: UnionWriteRun) -> dict[str, dict]:
    """Split the single observation back into per-table metadata agg rows
    (the build_metadata input shape)."""
    got = run.observation.get
    per_table: dict[str, dict] = {name: {} for name in run.tags}
    tag_to_name = {t: n for n, t in run.tags.items()}
    for k, v in got.items():
        if "|" not in k:
            continue
        tag, metric = k.split("|", 1)
        per_table[tag_to_name[tag]][metric] = int(v or 0)
    return per_table


def finalize_union_csv(
    run: UnionWriteRun, csv_dir: str, titles_for
) -> dict[str, str]:
    """Concatenate each tag directory into ``csv_dir/<table>.csv`` (header
    from field titles, body bytes in partition order -- the exact-merged
    contract).  Concats run in parallel threads; each is driver-side
    sendfile at GB/s."""
    from concurrent.futures import ThreadPoolExecutor

    def one(name: str) -> tuple[str, str]:
        p = os.path.join(csv_dir, f"{name}.csv")
        concat_csv_parts(
            p,
            run.columns[name],
            os.path.join(run.tmp_dir, f"t={run.tags[name]}"),
            titles=titles_for(name),
        )
        return name, p

    items = list(run.tags)
    with ThreadPoolExecutor(max_workers=max(1, min(8, len(items)))) as ex:
        return dict(ex.map(one, items))

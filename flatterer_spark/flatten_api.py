"""flatten(): JSON -> forest of linked relational tables (the reference's
core product, re-expressed as Spark DataFrame plans).

Mirrors kindly/flatterer's library API (`/root/reference/flatterer/__init__.py:58-149`,
option names per `src/lib.rs:40-123`): one *main* table per stream of JSON
objects, one child table per array-of-objects path, ``_link`` surrogate keys
(`docs/index.md:114-147`), pushdown, metadata (fields.csv / tables.csv /
datapackage.json) and csv/parquet/sqlite/xlsx sinks.

Execution model: a single parsed DataFrame (Spark JSON reader) feeds every
table's select/posexplode chain.  Catalyst prunes each table's plan down to
the struct branches it touches (nested-schema pruning), so emitting N tables
costs N narrow scans of the same files, not N full parses.  No shuffle is
involved anywhere in flattening itself -- the only exchange in the whole
pipeline is the optional strict-ordinal two-pass (see sources/json_input.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import ArrayType, StructType

from flatterer_spark.plans.table_plan import (
    ColSpec,
    PlanOptions,
    TablePlan,
    derive_plan,
    pushdown_columns,
)
from flatterer_spark.sources.json_input import (
    prepare_ordinal_columns,
    read_json_source,
    with_ordinal,
)

DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
DATETIME_RE = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"


@dataclass
class FlattenResult:
    tables: dict[str, DataFrame]              # table name -> typed DataFrame
    plans: dict[str, TablePlan]
    fields: list[dict]                        # fields.csv rows, in order
    table_rows: list[dict]                    # tables.csv rows, in order
    options: "FlattenOptions" = None
    row_counts: dict = dc_field(default_factory=dict)  # table -> row count
    titles: dict = dc_field(default_factory=dict)   # col name -> display title
    stats: dict = dc_field(default_factory=dict)    # table -> field -> stats
    table_titles: dict = dc_field(default_factory=dict)  # table -> display title
    field_titles: dict = dc_field(default_factory=dict)  # table -> {field -> title}
    input_df: DataFrame = None  # persisted parsed input (see unpersist())
    input_rows: int | None = None  # exact root-object count when the strict
    # ordinal pass already computed it (free main-table cardinality)
    ordinal_df: DataFrame = None  # post-ordinal source rows: the union CSV
    # writer's input (one row per root object, _ord assigned)
    ordinal_expected_rows: int | None = None  # text-ordinal guard total
    # (None = exact aggregate path, no guard needed)
    ordinal_guard_obs = None  # Observation on the ordinal_df scan: fires
    # on the first full-scan write action (union OR classic), carrying
    # sum(_ord_bad) + row count for ordinal_guard_ok()
    guards_deferred: bool = False  # optimistic text-ordinal mode: the
    # schema guard join AND the ordinal guard are the CALLER's job, checked
    # against the union write's observation before any artifact is final
    src_df: DataFrame = None  # the raw parsed read (guard attrs + staged
    # paths for a redo)

    def unpersist(self) -> None:
        """Release the persisted parsed-input cache.

        ``flatten_dataframes`` persists the parsed + ordinaled input because
        every downstream consumer re-executes it (one metadata agg per table,
        then one write per table: ~2 + 2*n_tables actions for a main + child
        layout) -- without the cache each action re-parses the JSON from
        bytes, which dominated flatten throughput (measured 2.4x end-to-end
        at 1M NDJSON objects).  ``flatten()`` calls this after its sinks
        finish; direct ``flatten_dataframes`` users should call it once done
        with the returned tables (or pass ``low_memory=True`` to skip the
        cache entirely -- F16, the reference's memory/speed dial)."""
        if self.input_df is not None:
            self.input_df.unpersist()

    def titles_for(self, table: str) -> dict[str, str]:
        """Display titles for one table's columns (schema titles overridden
        by per-table fields_csv titles); applied at the sink layer only so
        DataFrame column names stay the original field names."""
        return {**self.titles, **self.field_titles.get(table, {})}


@dataclass
class FlattenOptions:
    main_table_name: str = "main"
    path_separator: str = "_"
    table_prefix: str = ""
    inline_one_to_one: bool = False
    arrays_new_table: bool = False
    emit_obj: tuple = ()
    pushdown: tuple = ()
    no_link: bool = False
    id_prefix: str = ""
    ordinals: str = "strict"                  # "strict" | "partition"
    ndjson: bool = False
    json_stream: bool = False
    path: tuple = ()
    json_path: str | None = None
    fields_csv: str | None = None
    only_fields: bool = False
    tables_csv: str | None = None
    only_tables: bool = False
    preview: int = 0
    schema: str | None = None
    schema_titles: str | None = None
    stats: bool = False
    _raw: dict = dc_field(default_factory=dict)


class _BgScan:
    """Minimal daemon-thread future for the background text-ordinal scan:
    ``result()`` blocks until the scan finishes and returns its value
    (None on any scan error).  Daemon so an exception between submit and
    join can never leave a non-daemon worker keeping the process alive
    with no consumer (ADVICE r10)."""

    def __init__(self, fn, *args):
        import threading

        self._done = threading.Event()
        self._res = None
        t = threading.Thread(
            target=self._run, args=(fn, *args), daemon=True,
            name="flatterer-bg-text-scan",
        )
        t.start()

    def _run(self, fn, *args):
        try:
            self._res = fn(*args)
        except Exception:
            self._res = None
        finally:
            self._done.set()

    def result(self):
        self._done.wait()
        return self._res


def _accessor(root: Column | None, path: tuple[str, ...]) -> Column:
    """Field accessor; the ``__first__`` sentinel dereferences element 0 of a
    one-to-one-inlined array (F6)."""
    c = root
    for p in path:
        if p == "__first__":
            # empty arrays yield NULL (ANSI element_at throws on index 1)
            c = F.try_element_at(c, F.lit(1))
        elif c is None:
            c = F.col(f"`{p}`")
        else:
            c = c.getField(p)
    return c


def _cell(c: Column, spec: ColSpec) -> Column:
    if spec.json_encode:
        if isinstance(spec.dtype, (ArrayType, StructType)):
            return F.to_json(c)
        # scalar array elements stay typed: the CSV renderer applies the
        # reference's number formatting (2.0 -> "2", docs/options.md:646)
        return c
    return c


def flatten_dataframes(
    spark: SparkSession,
    source,
    **kw,
) -> FlattenResult:
    """Core API: flatten a JSON source into typed DataFrames (no file I/O)."""
    opts = FlattenOptions(**{k: v for k, v in kw.items() if k in FlattenOptions.__dataclass_fields__})
    opts._raw = kw

    from flatterer_spark.logutil import prof

    with prof("read_source"):
        df, key_order = read_json_source(
            spark,
            source,
            ndjson=opts.ndjson,
            json_stream=opts.json_stream,
            path=tuple(opts.path),
            json_path=opts.json_path,
            # overlap the exact full-data schema inference with the ordinal
            # pass; the guard join below redoes everything on a head-sample
            # miss, so results are exact either way
            optimistic=not kw.get("_exact_schema"),
        )
    src_df = df

    # Optimistic text-ordinal fast path, distributed half: the per-split
    # offset aggregate depends only on (session, paths), so when the
    # gates pass, kick it on a background thread NOW -- it overlaps the
    # driver-side schema-guide/plan-derivation py4j work below (the r9 1M
    # fixed-overhead decomposition's two biggest non-JVM items, ~0.2 s
    # each; the overlap shaves the smaller off the wall).  The join point
    # (and the guard/threshold logic) stays below, after the plans exist.
    want_cache = kw.get("_multi_sink", True) or getattr(
        df, "_flatterer_remote_input", False
    )
    text_fut = None
    thr = kw.get("_text_ordinals")
    if (
        thr
        and opts.ordinals == "strict"
        and not opts.json_path
        and not want_cache
        and not kw.get("low_memory")
        and getattr(src_df, "_flatterer_line_based", False)
        and not getattr(src_df, "_flatterer_remote_input", True)
    ):
        # driver-side pre-gate: an NDJSON object line is >= 2 bytes, so a
        # source smaller than 2*threshold bytes cannot clear the row
        # threshold -- skip the text scan instead of running a Spark job
        # just to learn the count and then discarding it (the dominant
        # small-local-file case)
        try:
            total_bytes = sum(
                os.path.getsize(p) for p in src_df._flatterer_staged_paths
            )
        except OSError:
            total_bytes = None
        if total_bytes is None or total_bytes >= 2 * int(thr):
            from flatterer_spark.sources.json_input import text_ordinal_rows

            # DAEMON thread, not a ThreadPoolExecutor: if anything between
            # here and the join point raises (e.g. derive_plan on a bad
            # schema), an orphaned non-daemon worker would keep the
            # process alive until its Spark collect finished (ADVICE r10).
            # A daemon scan just finishes and is discarded; py4j calls are
            # thread-safe, and the scan already swallows its own errors
            # (returns None = fast-path miss).
            text_fut = _BgScan(
                text_ordinal_rows, spark, src_df._flatterer_staged_paths
            )

    title_map: dict[str, str] = {}
    if opts.schema:
        # F12: JSONSchema-driven field order (+ optional titles)
        from flatterer_spark.sources.schema_guide import (
            apply_schema_titles,
            schema_key_order_and_titles,
        )

        s_order, s_titles = schema_key_order_and_titles(opts.schema)
        merged: dict[tuple[str, ...], list[str]] = {}
        for at in set(s_order) | set(key_order):
            so = s_order.get(at, [])
            merged[at] = so + [k for k in key_order.get(at, []) if k not in so]
        key_order = merged
        if opts.schema_titles:
            title_map = apply_schema_titles(
                s_titles, opts.schema_titles, opts.path_separator
            )

    # inline_one_to_one needs global max array sizes (F6: docs/options.md:624)
    max_sizes: dict[tuple[str, ...], int] = {}
    if opts.inline_one_to_one:
        max_sizes = _max_array_sizes(df)

    plan_opts = PlanOptions(
        main_table_name=opts.main_table_name,
        path_separator=opts.path_separator,
        table_prefix=opts.table_prefix,
        inline_one_to_one=opts.inline_one_to_one,
        arrays_new_table=opts.arrays_new_table,
        emit_obj=tuple(tuple(p) for p in opts.emit_obj),
        pushdown=tuple(opts.pushdown),
        max_array_sizes=max_sizes,
        key_order=key_order,
    )
    plans = derive_plan(df.schema, plan_opts)
    by_name = {p.name: p for p in plans}

    # One columnar cache feeds every downstream action (ordinal agg,
    # per-table writes with piggybacked metadata) instead of each one
    # re-parsing the JSON bytes; MEMORY_AND_DISK so oversized inputs spill
    # rather than evict-and-reparse.  The cache sits BELOW the _ord map
    # (prepare_ordinal_columns materializes the split-identity columns the
    # map needs), so the strict-ordinal aggregate itself materializes the
    # cache.  low_memory=True trades the cache away (F16).
    #
    # Adaptive default (r8): persisting is NOT free -- the columnar store
    # costs ~0.5 s at 1M rows, more than the ~3 re-parses it saves when
    # the input is a LOCAL file (OS page cache; measured 20-25% faster
    # end-to-end without it at 1M/4M).  flatten()'s lean csv-only path
    # passes _multi_sink=False to skip the cache for local inputs; remote
    # inputs (s3a://, object-store round-trips -- the 100 TB cluster
    # case) and multi-sink/preview/stats runs (each extra sink re-scans
    # every table) keep it.  Direct flatten_dataframes callers always get
    # the cache: their consumption pattern is unknown.
    cached = None
    count_exprs = _child_count_exprs(df.schema, plans)
    df = prepare_ordinal_columns(df)
    # Optimistic text-ordinal fast path (the union-CSV single-pass flow):
    # per-split offsets come from a raw text scan (0.18 s vs the JSON
    # aggregate's 0.64 s at 1M) and the caller verifies the _ord_bad guard
    # + row-count equality on the write scan itself, redoing everything on
    # a miss.  Only taken for large line-based local inputs on the
    # no-cache csv-only flow (flatten() passes the threshold), where the
    # caller is committed to the guarded union write.  The distributed
    # aggregate was kicked on a background thread before plan derivation
    # (text_fut above); this is the join point.
    text_ordinals = False
    if text_fut is not None:
        from flatterer_spark.sources.json_input import with_ordinal_text

        with prof("ordinal_text_map"):
            # A failed background scan (rows None) is a fast-path MISS:
            # fall straight through to the exact aggregate instead of
            # letting with_ordinal_text re-run the full text scan
            # synchronously -- that re-scan would double the cost the
            # overlap was meant to save (ADVICE r10).
            text_rows = text_fut.result()
            tout = (
                with_ordinal_text(
                    df, spark, src_df._flatterer_staged_paths,
                    rows=text_rows,
                )
                if text_rows
                else None
            )
        if tout is not None and tout._flatterer_input_rows > int(thr):
            rows = tout._flatterer_input_rows
            # the guard rides the FIRST full-scan write action over this
            # node (the union write job, or the classic main-table write):
            # both scan every root row, so the observed counts are exact.
            # flatten() checks ordinal_guard_ok() after its writes and
            # redoes everything on the exact path on a miss.
            from pyspark.sql import Observation

            guard_obs = Observation()
            tout = tout.observe(
                guard_obs,
                F.sum(F.col("_ord_bad").cast("long")).alias("bad"),
                F.count(F.lit(1)).alias("rows"),
            )
            tout._flatterer_input_rows = rows
            df, text_ordinals = tout, True

    def _kick_inference():
        # start the background exact-inference parse NOW: after the text
        # agg (so the cheap fast-path job never queues behind the full
        # parse under FIFO -- it then overlaps the write jobs), or just
        # before the exact ordinal aggregate (the two overlap, the
        # pre-round-9 behavior)
        g = getattr(src_df, "_flatterer_schema_guard", None)
        if g and hasattr(g[0], "kick"):
            g[0].kick()

    if text_ordinals:
        _kick_inference()
    if not kw.get("low_memory") and want_cache:
        from pyspark import StorageLevel

        cached = df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if not text_ordinals:
        _kick_inference()
        with prof("ordinal_exact_agg"):
            df = with_ordinal(df, opts.ordinals, count_exprs=count_exprs)
    input_rows = getattr(df, "_flatterer_input_rows", None)
    child_counts = getattr(df, "_flatterer_child_counts", None)
    root_link = (
        F.concat(F.lit(opts.id_prefix), F.col("_ord").cast("string"))
        if opts.id_prefix
        else F.col("_ord").cast("string")
    )

    tables: dict[str, DataFrame] = {}
    for plan in plans:
        tables[plan.name] = _execute_table(df, plan, by_name, opts, root_link)

    result = FlattenResult(
        tables=tables, plans=by_name, fields=[], table_rows=[], options=opts,
        titles=title_map,
        input_df=cached,
        input_rows=input_rows,
        ordinal_df=df,
        ordinal_expected_rows=input_rows if text_ordinals else None,
        # _defer_guards (flatten() passes it whenever CSV writes will run)
        # moves the schema-guard join past the writes even on the exact-
        # ordinal path, so the background inference overlaps them
        guards_deferred=text_ordinals or bool(kw.get("_defer_guards")),
        src_df=src_df,
    )
    if text_ordinals:
        result.ordinal_guard_obs = guard_obs
    if child_counts:
        # exact child-table cardinalities, free from the ordinal pass;
        # build_metadata later overwrites with the (identical) observed
        # counts.  flatten() routes exact-CSV writers on these.
        result.row_counts.update(child_counts)
    _apply_field_table_csv(result)

    if result.guards_deferred:
        # the caller (flatten()'s csv pass) joins the background exact
        # inference AND verifies the ordinal guard observation after its
        # write jobs, redoing on a miss -- so the inference fully overlaps
        # the writes instead of being joined here on the critical path
        return result

    from flatterer_spark.sources.json_input import schema_guard_ok

    if not schema_guard_ok(src_df):
        # head-sample schema missed (a key first seen past the sample, a
        # type widened by a later row, or malformed lines): discard the
        # optimistic pipeline and redo on the exact-inference path.  The
        # staged paths stand in for `source`, which may be a consumed
        # iterator or a respooled JSON stream.
        import logging

        logging.getLogger("flatterer_spark").debug(
            "optimistic schema guard missed; re-running with exact inference"
        )
        result.unpersist()
        kw2 = dict(kw)
        kw2["_exact_schema"] = True
        kw2["ndjson"] = True
        kw2["json_stream"] = False
        return flatten_dataframes(
            spark, list(src_df._flatterer_staged_paths), **kw2
        )
    return result


def ordinal_guard_ok(result: FlattenResult) -> bool:
    """Optimistic text-ordinal guard verdict; call only after a full-scan
    write action has run over ``result.ordinal_df`` (the observation
    blocks until one completes).

    The text-scan split map is EXACTLY right iff (a) no row fell outside
    its claimed split interval (``_ord_bad``: map miss, or monotonic id
    below the claimed min / at-or-past min+count) and (b) the total row
    count matches the text count.  Proof sketch
    (tests/test_union_csv.py pins the adversarial cases): per split, rows
    are contiguous in monotonic-id order; if every row of a split lies
    inside the claimed [mn, mn+n) and totals match, per-split counts
    cannot disagree (an over-count violates (a); an under-count then
    forces an over-count elsewhere), and n contiguous ids inside an
    n-sized interval force the split's min id to equal the claimed mn --
    so every assigned ``_ord`` equals the exact two-pass value."""
    if result.ordinal_expected_rows is None:
        return True
    got = result.ordinal_guard_obs.get
    return (
        int(got.get("bad") or 0) == 0
        and int(got.get("rows") or 0) == int(result.ordinal_expected_rows)
    )


def _sum_count_expr(
    st: StructType, path: tuple[str, ...], acc: str, vi: int, is_object: bool
) -> str:
    """SQL expression for one root row's contribution to a child table's
    row count: struct hops become field accessors, array-of-struct hops
    become ``aggregate(transform(...))`` sums, the leaf is ``size`` (explode
    tables) or a non-null indicator (emit_obj tables) -- the same all-HOF
    shape as :func:`_max_size_expr`, so every child table at any depth is
    counted EXACTLY in the strict-ordinal aggregate's single pass (which
    also materializes the cache).  flatten() uses these counts to route
    small child tables to the driver-exact CSV writer without the bounded
    count job."""
    name = path[0]
    a = f"{acc}`{name}`"
    dt = st[name].dataType
    if len(path) == 1:
        if is_object:
            return f"IF({a} IS NOT NULL, CAST(1 AS BIGINT), CAST(0 AS BIGINT))"
        return f"coalesce(CAST(size({a}) AS BIGINT), CAST(0 AS BIGINT))"
    if isinstance(dt, StructType):
        return _sum_count_expr(dt, path[1:], a + ".", vi, is_object)
    v = f"_c{vi}"
    inner = _sum_count_expr(dt.elementType, path[1:], v + ".", vi + 1, is_object)
    return (
        f"coalesce(aggregate(transform({a}, {v} -> {inner}), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x), CAST(0 AS BIGINT))"
    )


def _child_count_exprs(
    schema: StructType, plans: list
) -> dict[str, str]:
    """Per-child-table exact row-count expressions (see _sum_count_expr);
    tables whose shape the builder cannot price are omitted -- the writer
    router treats missing counts as 'large' (merged writer, always safe:
    the two exact writers are byte-identical)."""
    out: dict[str, str] = {}
    for plan in plans:
        if not plan.ancestors:
            continue  # main table: counted by the ordinal agg itself
        try:
            out[plan.name] = _sum_count_expr(
                schema, plan.path, "", 0, plan.is_object
            )
        except Exception as exc:
            # unpriceable-by-design plans fall back to the (safe) merged
            # writer; log which, so a pricing-expression regression shows
            # up as a visible pattern instead of a silent perf cliff
            import logging

            logging.getLogger("flatterer_spark").debug(
                "child count expr unavailable for table %r (%s: %s); "
                "writer router treats it as large",
                plan.name,
                type(exc).__name__,
                exc,
            )
    return out


def _max_size_expr(st: StructType, path: tuple[str, ...], acc: str, vi: int) -> str:
    """SQL expression for one row's max element count of the array at
    ``path``: struct hops become field accessors, array-of-struct hops become
    ``array_max(transform(...))`` -- all JVM-side HOFs, so every path (any
    depth) is measured in ONE aggregate pass with no explode/join."""
    name = path[0]
    a = f"{acc}`{name}`"
    dt = st[name].dataType
    if len(path) == 1:
        return f"coalesce(size({a}), -1)"
    if isinstance(dt, StructType):
        return _max_size_expr(dt, path[1:], a + ".", vi)
    v = f"_x{vi}"
    inner = _max_size_expr(dt.elementType, path[1:], v + ".", vi + 1)
    return f"coalesce(array_max(transform({a}, {v} -> {inner})), -1)"


def _max_array_sizes(df: DataFrame) -> dict[tuple[str, ...], int]:
    """One agg pass: max element count for every array-of-struct path at any
    nesting depth (F6 is a *global* data property, docs/options.md:624)."""
    paths: list[tuple[str, ...]] = []

    def walk(st: StructType, at: tuple[str, ...]):
        for f in st.fields:
            if isinstance(f.dataType, StructType):
                walk(f.dataType, at + (f.name,))
            elif isinstance(f.dataType, ArrayType) and isinstance(
                f.dataType.elementType, StructType
            ):
                paths.append(at + (f.name,))
                walk(f.dataType.elementType, at + (f.name,))

    walk(df.schema, ())
    if not paths:
        return {}
    row = df.agg(
        *[
            F.max(F.expr(_max_size_expr(df.schema, p, "", 0))).alias(f"_m{i}")
            for i, p in enumerate(paths)
        ]
    ).collect()[0]
    return {p: (row[f"_m{i}"] or 0) for i, p in enumerate(paths)}


def _execute_table(
    df: DataFrame,
    plan: TablePlan,
    by_name: dict[str, TablePlan],
    opts: FlattenOptions,
    root_link: Column,
) -> DataFrame:
    pushes = pushdown_columns(plan, by_name, tuple(opts.pushdown)) if plan.ancestors else []

    if not plan.ancestors:  # main table
        out = [] if opts.no_link else [root_link.alias("_link")]
        out += [_cell(_accessor(None, c.path), c).alias(c.name) for c in plan.cols]
        return df.select(*out)

    # Child table: walk the ancestor chain, posexplode at each array hop.
    # Link keys are materialized as _lnk<i> columns so each level's key can
    # reference the previous one: _lnk(i+1) = _lnk(i).<arrayKey>.<pos>
    # (`fixtures/basic_expected/csv/platforms.csv:2-4`).
    work = df.withColumn("_lnk0", root_link)
    link_names = ["_lnk0"]
    cur: str | None = None            # current element column (None = root row)
    consumed = 0
    hops = [p for _, p in plan.ancestors[1:]] + [plan.path]
    anc_plans = [by_name[n] for n, _ in plan.ancestors]

    def at(path: tuple[str, ...]) -> Column:
        return _accessor(F.col(cur) if cur else None, path)

    for depth, hop in enumerate(hops):
        level_plan = anc_plans[depth]
        for out_name, anc_name, fpath in pushes:  # F5: ancestor field capture
            if anc_name == level_plan.name:
                work = work.withColumn(
                    out_name, _cell(at(fpath), _find_col(level_plan, fpath))
                )
        rel = hop[consumed:]
        arr = at(rel)
        key = hop[-1]
        last = depth == len(hops) - 1
        keep = link_names + [n for n, _, _ in pushes if n in work.columns]
        pos, el = f"_pos{depth}", f"_el{depth}"
        if plan.is_object and last:
            # F9 emit_obj: one-to-one child table, no explode; index fixed 0
            work = (
                work.select(*keep, arr.alias(el))
                .where(F.col(el).isNotNull())
                .withColumn(
                    f"_lnk{depth + 1}",
                    F.concat_ws(".", F.col(link_names[-1]), F.lit(key), F.lit("0")),
                )
            )
        else:
            # A JSON null array element ("a": [null]) parses to a null
            # struct; the reference emits no child row for it (same rule as
            # empty objects, docs/changelog.md:279).  posexplode has already
            # assigned positions, so surviving elements keep their original
            # array ordinal in the _link chain ("a": [null, {...}] ->
            # parent.a.1).
            work = (
                work.select(*keep, F.posexplode(arr).alias(pos, el))
                .where(F.col(el).isNotNull())
                .withColumn(
                    f"_lnk{depth + 1}",
                    F.concat_ws(
                        ".",
                        F.col(link_names[-1]),
                        F.lit(key),
                        F.col(pos).cast("string"),
                    ),
                )
            )
        link_names.append(f"_lnk{depth + 1}")
        cur = el
        consumed = len(hop)

    # Final projection: _link, then _link_<ancestor> nearest-first
    # (docs/options.md:195), own columns, then pushdown columns.
    out: list[Column] = []
    if not opts.no_link:
        out.append(F.col(link_names[-1]).alias("_link"))
        for i in range(len(plan.ancestors) - 1, -1, -1):
            out.append(F.col(link_names[i]).alias(f"_link_{plan.ancestors[i][0]}"))
    out += [_cell(at(c.path), c).alias(c.name) for c in plan.cols]
    out += [F.col(n) for n, _, _ in pushes if n in work.columns]
    return work.select(*out)


def _find_col(plan: TablePlan, fpath: tuple[str, ...]) -> ColSpec:
    for c in plan.cols:
        if c.path == fpath:
            return c
    return ColSpec("_", fpath, None)


# ---------------------------------------------------------------------------
# Metadata: fields.csv / tables.csv rows (F10/F11)
# ---------------------------------------------------------------------------

def date_like(c: Column) -> Column:
    """Boolean: does this string cell full-match the DATE pattern?

    Structural pre-guards implied by the anchored pattern (exact length
    10, dashes at positions 5 and 8): the codegen'd AND short-circuits, so
    only date-shaped cells pay anything past the length test.  Under the
    guards, DATE_RE is exactly "every other character is a digit", i.e.
    stripping digits leaves the two dashes alone -- a translate() char
    loop instead of a regex engine on the hot all-dates column
    (byte-equivalence pinned by the golden fields.csv counts and
    test_fused_metadata_matches_two_pass)."""
    return (
        (F.length(c) == 10)
        & (F.substring(c, 5, 1) == "-")
        & (F.substring(c, 8, 1) == "-")
        & (F.translate(c, "0123456789", "") == "--")
    )


def datetime_like(c: Column) -> Column:
    """Boolean: does this string cell full-match the DATETIME pattern?
    Same pre-guard idea as :func:`date_like` (length >= 19, dashes at 5
    and 8) in front of the regex."""
    return (
        (F.length(c) >= 19)
        & (F.substring(c, 5, 1) == "-")
        & (F.substring(c, 8, 1) == "-")
        & c.rlike(DATETIME_RE)
    )


def metadata_agg_exprs(df: DataFrame) -> list[Column]:
    """The metadata aggregate set for one table: row count, non-null count
    per column, and full-match counts for the date/datetime string patterns
    (§1.2: `date` is a string classification,
    `fixtures/basic_expected/fields.csv:5`).  Used two ways: as a standalone
    ``df.agg`` job (``compute_metadata``) and as ``df.observe`` metrics
    piggybacked on the CSV-write action (flatten's fused single-pass path --
    the write scans every row anyway, so the metadata comes free).  Counts
    are unchanged by the pre-guards in date_like/datetime_like (each guard
    is a superset of its pattern); on prose-heavy columns the guards
    removed most of the metadata pass's cost at 4M+ rows."""
    from pyspark.sql.types import StringType

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in df.schema.fields:
        col = F.col(f"`{c.name}`")
        aggs.append(F.count(col).alias(f"n::{c.name}"))
        if isinstance(c.dataType, StringType) and not c.name.startswith("_link"):
            aggs.append(
                F.count(F.when(date_like(col), 1)).alias(f"d::{c.name}")
            )
            aggs.append(
                F.count(F.when(datetime_like(col), 1)).alias(f"t::{c.name}")
            )
    return aggs


def compute_metadata(result: FlattenResult) -> None:
    """Fill result.fields / result.table_rows with type guesses and counts.

    One aggregate job per table, submitted CONCURRENTLY: the actions are
    independent, Spark's scheduler interleaves them, and wall time drops
    toward max(job) instead of sum(jobs) whenever a single job leaves
    cores idle (always true for small inputs; the big-input jobs read the
    shared persisted parse).  flatten()'s large-input path skips this job
    entirely by observing the same aggregates on the CSV-write actions."""
    from concurrent.futures import ThreadPoolExecutor

    def table_agg_row(df: DataFrame) -> dict:
        return df.agg(*metadata_agg_exprs(df)).collect()[0].asDict()

    items = list(result.tables.items())
    with ThreadPoolExecutor(max_workers=max(1, min(8, len(items)))) as ex:
        agg_rows = dict(
            zip(
                (n for n, _ in items),
                ex.map(table_agg_row, (df for _, df in items)),
            )
        )
    build_metadata(result, agg_rows)


def build_metadata(result: FlattenResult, agg_rows: dict[str, dict]) -> None:
    """Turn per-table metadata aggregate rows (from ``df.agg`` or from
    ``df.observe`` metrics) into fields.csv / tables.csv rows.  Result
    processing is sequential so fields.csv row order is deterministic."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        NumericType,
        StringType,
        TimestampType,
    )

    fields: list[dict] = []
    table_rows: list[dict] = []

    for name, df in result.tables.items():
        row = agg_rows[name]
        nrows = row["__rows"]
        result.row_counts[name] = nrows
        table_rows.append(
            {
                "table_name": name,
                # tables_csv table_title renames tables in tables.csv,
                # datapackage and XLSX sheets (docs/options.md:564-586)
                "table_title": result.table_titles.get(name, name),
            }
        )
        for c in df.schema.fields:
            n = row[f"n::{c.name}"]
            if c.name.startswith("_link"):
                ftype, n = "text", nrows
            elif isinstance(c.dataType, BooleanType):
                ftype = "boolean"
            elif isinstance(c.dataType, NumericType):
                ftype = "number"
            elif isinstance(c.dataType, DateType):
                ftype = "date"
            elif isinstance(c.dataType, TimestampType):
                ftype = "datetime"
            elif isinstance(c.dataType, StringType):
                if n > 0 and row.get(f"d::{c.name}") == n:
                    ftype = "date"
                elif n > 0 and row.get(f"t::{c.name}") == n:
                    ftype = "datetime"
                else:
                    ftype = "text"
            else:
                ftype = "text"
            fields.append(
                {
                    "table_name": name,
                    "field_name": c.name,
                    "field_type": ftype,
                    # field_name stays the original key (so an emitted
                    # fields.csv can be fed back in); the title is display-only
                    "field_title": result.titles_for(name).get(c.name, c.name),
                    "count": n,
                }
            )
    result.fields = fields
    result.table_rows = table_rows
    if result.options is not None and result.options.stats:
        _compute_stats(result)


def _compute_stats(result: FlattenResult) -> None:
    """K11 `stats`: per-field distinct estimate, min/max, and (for fields
    that parse as numbers) mean/stddev into datapackage.json.  One agg pass
    per table (reference uses streaming-stats/pdatastructs sketches;
    approx_count_distinct is the Spark-native HLL equivalent and
    mean/stddev_samp match streaming-stats' moments)."""
    for name, df in result.tables.items():
        aggs = []
        for c in df.columns:
            col = F.col(f"`{c}`")
            aggs.append(F.approx_count_distinct(col).alias(f"d::{c}"))
            aggs.append(F.min(col.cast("string")).alias(f"mn::{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"mx::{c}"))
            # try_cast: non-numeric text -> null (plain CAST throws under
            # ANSI mode), agg skips nulls
            num = F.expr(f"try_cast(`{c}` AS DOUBLE)")
            aggs.append(F.mean(num).alias(f"avg::{c}"))
            aggs.append(F.stddev_samp(num).alias(f"sd::{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        result.stats[name] = {}
        for c in df.columns:
            st = {
                "approx_distinct": row[f"d::{c}"],
                "min": row[f"mn::{c}"],
                "max": row[f"mx::{c}"],
            }
            if row[f"avg::{c}"] is not None:
                st["mean"] = row[f"avg::{c}"]
                if row[f"sd::{c}"] is not None:
                    st["stddev"] = row[f"sd::{c}"]
            result.stats[name][c] = st


def _apply_field_table_csv(result: FlattenResult) -> None:
    """F11: user fields.csv / tables.csv reorder, retitle, filter."""
    import csv as csvmod

    opts = result.options
    if opts.tables_csv:
        with open(opts.tables_csv, newline="") as f:
            rows = list(csvmod.DictReader(f))
        keep = [r["table_name"] for r in rows]
        titles = {r["table_name"]: r.get("table_title") or r["table_name"] for r in rows}
        if opts.only_tables:
            result.tables = {k: v for k, v in result.tables.items() if k in keep}
        ordered = {k: result.tables[k] for k in keep if k in result.tables}
        for k, v in result.tables.items():
            if k not in ordered:
                ordered[k] = v
        result.tables = ordered
        result.table_titles = {
            k: v for k, v in titles.items() if k in result.tables
        }
    if opts.fields_csv:
        with open(opts.fields_csv, newline="") as f:
            rows = list(csvmod.DictReader(f))
        per_table: dict[str, list[dict]] = {}
        for r in rows:
            per_table.setdefault(r["table_name"], []).append(r)
        new_tables = {}
        for name, df in result.tables.items():
            spec = per_table.get(name)
            if not spec:
                new_tables[name] = df
                continue
            listed = [r["field_name"] for r in spec if r["field_name"] in df.columns]
            link_cols = [c for c in df.columns if c.startswith("_link") and c not in listed]
            rest = [] if opts.only_fields else [
                c for c in df.columns
                if c not in listed and not c.startswith("_link")
            ]
            cols = link_cols + listed + rest
            # reorder/filter only; titles are applied at the sink layer so
            # the DataFrame (and fields.csv field_name) keep original names
            result.field_titles[name] = {
                r["field_name"]: r["field_title"]
                for r in spec
                if r.get("field_title") and r["field_title"] != r["field_name"]
            }
            new_tables[name] = df.select(*[F.col(f"`{c}`") for c in cols])
        result.tables = new_tables

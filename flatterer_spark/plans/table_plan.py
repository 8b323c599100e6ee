"""Table-plan derivation: Spark schema -> deterministic flattening plan.

Reference semantics (kindly/flatterer -- see SURVEY.md §1, §2.2):
 - one *main* table per input stream of JSON objects
   (`/root/reference/docs/index.md:114-147`);
 - sub-objects are inlined into their parent, names joined by
   ``path_separator`` (`docs/index.md:126-127`, operator F1);
 - each array-of-objects path becomes a child table named by its key path
   joined with the separator (`docs/options.md:193-199`, operator F2);
 - arrays of scalars are JSON-encoded into one parent cell by default
   (`docs/changelog.md:191-196`, F8) or forced into a single-``value``-column
   child table under ``arrays_new_table`` (`docs/options.md:644-660`, F7);
 - ``emit_obj`` paths become one-to-one child tables (`src/lib.rs:58`, F9);
 - ``inline_one_to_one`` turns arrays that never exceed one element into
   inlined sub-objects -- a *global* data property, so the caller passes the
   observed max sizes (`docs/options.md:624-641`, F6);
 - ``pushdown`` copies named ancestor fields into every descendant table as
   ``<ancestor_table>_<field>`` (`docs/options.md:152-208`, F5).

This module is pure Python over the inferred ``StructType`` -- no Spark jobs.
The executor (flatten_api) turns each ``TablePlan`` into a select/posexplode
chain; Catalyst prunes the unused branches of the parsed struct per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import ArrayType, DataType, StructType


@dataclass
class ColSpec:
    name: str                 # output column name (path joined by separator)
    path: tuple[str, ...]     # field path inside the table's row element
    dtype: DataType
    json_encode: bool = False  # scalar-array (or array-of-array) cell: to_json


@dataclass
class TablePlan:
    name: str                           # output table name (prefix applied)
    path: tuple[str, ...]               # array-key path from the root
    # ancestors, outermost first: (table_name, array path). Root table is
    # always first. Used for _link_<ancestor> FK columns and pushdown.
    ancestors: list[tuple[str, tuple[str, ...]]] = field(default_factory=list)
    cols: list[ColSpec] = field(default_factory=list)
    is_object: bool = False             # emit_obj one-to-one table


@dataclass
class PlanOptions:
    main_table_name: str = "main"
    path_separator: str = "_"
    table_prefix: str = ""
    inline_one_to_one: bool = False
    arrays_new_table: bool = False
    emit_obj: tuple[tuple[str, ...], ...] = ()
    pushdown: tuple[str, ...] = ()
    # array path -> max observed element count (for inline_one_to_one)
    max_array_sizes: dict[tuple[str, ...], int] | None = None
    # path -> first-seen key order from the driver-side sample parse; Spark's
    # JSON inference sorts keys, the reference preserves document order
    key_order: dict[tuple[str, ...], list[str]] | None = None


def _ordered_fields(st: StructType, abs_path: tuple[str, ...], opts: PlanOptions):
    names = [f.name for f in st.fields]
    order = (opts.key_order or {}).get(abs_path)
    if order:
        seen = [n for n in order if n in names]
        rest = sorted(n for n in names if n not in order)
        names = seen + rest
    by_name = {f.name: f for f in st.fields}
    return [by_name[n] for n in names]


def derive_plan(schema: StructType, opts: PlanOptions) -> list[TablePlan]:
    """Walk the inferred schema and emit the full table forest."""
    tables: list[TablePlan] = []
    sep = opts.path_separator

    def table_name(path: tuple[str, ...]) -> str:
        return opts.table_prefix + (sep.join(path) if path else opts.main_table_name)

    def col_name(fpath: tuple[str, ...]) -> str:
        # the __first__ sentinel (inline_one_to_one deref) is an accessor
        # instruction, not a name segment
        return sep.join(p for p in fpath if p != "__first__")

    def walk_struct(
        st: StructType,
        table: TablePlan,
        rel: tuple[str, ...],       # field path inside this table's element
        abs_path: tuple[str, ...],  # absolute path from the root (for options)
    ) -> None:
        for f in _ordered_fields(st, abs_path, opts):
            fpath, apath = rel + (f.name,), abs_path + (f.name,)
            dt = f.dataType
            if isinstance(dt, StructType):
                if apath in opts.emit_obj:
                    new_table(apath, dt, parent=table, is_object=True)
                else:
                    walk_struct(dt, table, fpath, apath)
            elif isinstance(dt, ArrayType):
                el = dt.elementType
                max_sz = (opts.max_array_sizes or {}).get(apath)
                if (
                    isinstance(el, StructType)
                    and opts.inline_one_to_one
                    and max_sz is not None
                    and max_sz <= 1
                ):
                    # array never has >1 element anywhere -> treat as object
                    walk_struct(el, table, fpath + ("__first__",), apath)
                elif isinstance(el, StructType) and not opts.arrays_new_table:
                    new_table(apath, el, parent=table)
                elif opts.arrays_new_table:
                    new_table(apath, el, parent=table, value_only=True)
                else:
                    # scalar/nested array inlined as a JSON-encoded cell (F8)
                    table.cols.append(
                        ColSpec(col_name(fpath), fpath, dt, json_encode=True)
                    )
            else:
                table.cols.append(ColSpec(col_name(fpath), fpath, dt))

    def new_table(
        apath: tuple[str, ...],
        el,
        parent: TablePlan,
        is_object: bool = False,
        value_only: bool = False,
    ) -> None:
        t = TablePlan(
            name=table_name(apath),
            path=apath,
            ancestors=parent.ancestors + [(parent.name, parent.path)],
            is_object=is_object,
        )
        tables.append(t)
        if value_only and not isinstance(el, StructType):
            t.cols.append(
                ColSpec("value", (), el, json_encode=not _is_string(el))
            )
        elif isinstance(el, StructType):
            walk_struct(el, t, (), apath)
        else:
            t.cols.append(ColSpec("value", (), el, json_encode=not _is_string(el)))

    root = TablePlan(name=table_name(()), path=())
    tables.append(root)
    walk_struct(schema, root, (), ())
    for t in tables:
        _dedupe_col_names(t, sep)
    return tables


def _dedupe_col_names(table: TablePlan, sep: str) -> None:
    """Separator collisions (a literal ``a_b`` key next to an ``a.b`` path
    both flatten to ``a_b``) would make the executor's select ambiguous;
    suffix later occurrences deterministically (``a_b``, ``a_b_2``, ...)."""
    seen: dict[str, int] = {}
    names = {c.name for c in table.cols}
    for c in table.cols:
        if c.name in seen:
            k = seen[c.name] + 1
            new = f"{c.name}{sep}{k}"
            while new in names:
                k += 1
                new = f"{c.name}{sep}{k}"
            seen[c.name] = k
            seen.setdefault(new, 1)
            names.add(new)
            c.name = new
        else:
            seen[c.name] = 1


def _is_string(dt: DataType) -> bool:
    from pyspark.sql.types import StringType

    return isinstance(dt, StringType)


def pushdown_columns(
    plan: TablePlan, all_tables: dict[str, TablePlan], pushdown: tuple[str, ...]
) -> list[tuple[str, str, tuple[str, ...]]]:
    """For a child table: [(out_name, ancestor_table, field_path)] of pushed
    ancestor scalar fields (F5): named ``<ancestor_table>_<field>``."""
    out = []
    for anc_name, _anc_path in plan.ancestors:
        anc = all_tables[anc_name]
        for c in anc.cols:
            if c.name in pushdown:
                out.append((f"{anc_name}_{c.name}", anc_name, c.path))
    return out

"""Output sinks: CSV / Parquet / SQLite / XLSX / metadata / SQL scripts.

Byte-format contracts follow the reference goldens:
 - CSV: header = field titles, minimal quoting, LF line endings; JSON numbers
   that are whole render without the trailing ``.0`` (golden
   `fixtures/basic_expected/csv/main.csv:2`: input ``1.0`` -> ``1``);
 - SQL DDL: lower-cased column names, TEXT/NUMERIC/TIMESTAMP types
   (`fixtures/basic_expected/postgresql/postgresql_schema.sql:1-7`);
 - sqlite loader ``.mode csv`` + ``.import --skip 1``, postgres ``\\copy``
   (`fixtures/basic_expected/sqlite/sqlite_load.sql`);
 - datapackage.json: tabular-data-package, newer field vocabulary
   (string/number/datetime + title/flatterer_name,
   `fixtures/pushdown_expected/datapackage.json`).

Exact-bytes CSV/SQLite/XLSX are driver-side single-writer paths (the
reference takes the same position for XLSX, `src/lib.rs:221-225`); Parquet and
distributed CSV go through ``df.write`` for scale.
"""

from __future__ import annotations

import csv as csvmod
import json
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import NumericType

TYPE_TO_SQL = {
    "text": "TEXT",
    "number": "NUMERIC",
    "date": "TIMESTAMP",
    "datetime": "TIMESTAMP",
    "boolean": "BOOLEAN",
}
TYPE_TO_DATAPACKAGE = {
    "text": "string",
    "number": "number",
    "date": "datetime",
    "datetime": "datetime",
    "boolean": "boolean",
}


def render_cell(c, dtype) -> "F.Column":
    """The reference's cell rendering for one column/expression: numerics
    render whole doubles without the trailing ``.0``, everything else is a
    plain string cast.  Shared by the all-string table projection below and
    the single-pass union CSV writer (sinks/union_csv.py), whose cells live
    inside ``transform`` lambdas and so cannot go through a DataFrame
    projection."""
    if isinstance(dtype, NumericType):
        # whole doubles render as integers (1.0 -> "1"); +-inf must not
        # take this branch (inf == floor(inf), but the decimal cast
        # would silently null it -- render "Infinity" via plain cast).
        # The decimal(38,0) cast also nulls whole doubles >= 1e38 and NaN
        # (which satisfies d == floor(d) under Spark's NaN = NaN rule) --
        # coalesce back to the plain cast so a non-null value NEVER
        # renders as an empty cell, and the union writer's rendered-cell
        # non-null counts stay equal to the raw-column counts the classic
        # per-table observe takes.
        d = c.cast("double")
        as_str = F.when(
            (d == F.floor(d)) & (F.abs(d) != F.lit(float("inf"))),
            F.coalesce(
                c.cast("decimal(38,0)").cast("string"), c.cast("string")
            ),
        ).otherwise(c.cast("string"))
        return F.when(c.isNull(), F.lit(None)).otherwise(as_str)
    return c.cast("string")


def formatted_strings(df: DataFrame) -> DataFrame:
    """All-string projection with the reference's cell rendering."""
    return df.select(
        *[
            render_cell(F.col(f"`{f.name}`"), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    )


def _write_csv_row(f, w, cells: list) -> None:
    """One CSV row with quoting identical to Spark's uniVocity writer.

    Python ``csv.writer(lineterminator='\\n')`` does NOT quote a field
    containing a bare carriage return, while uniVocity does -- the one
    quoting divergence between the two engines (ADVICE r5).  Rows with a
    ``\\r`` anywhere take a manual path that quotes exactly when the cell
    contains ``, " \\n \\r``; all other rows go through ``csv.writer``
    unchanged (including its lone-empty-field ``\"\"`` corner)."""
    cells = ["" if v is None else v for v in cells]
    if any("\r" in c for c in cells):
        f.write(
            ",".join(
                '"' + c.replace('"', '""') + '"'
                if any(ch in c for ch in (",", '"', "\n", "\r"))
                else c
                for c in cells
            )
            + "\n"
        )
    else:
        w.writerow(cells)


def write_csv_exact(
    df: DataFrame, path: str, preview: int = 0, titles: dict | None = None
) -> None:
    """Driver-side exact-bytes CSV (golden parity / test scale).  Headers are
    field titles (docs/outputs.md:32-34); ``titles`` maps name -> title."""
    if preview:
        df = df.limit(preview)
    rows = formatted_strings(df).collect()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csvmod.writer(f, lineterminator="\n")
        _write_csv_row(f, w, [(titles or {}).get(c, c) for c in df.columns])
        for r in rows:
            _write_csv_row(f, w, list(r))


def write_csv_exact_merged(
    df: DataFrame, path: str, preview: int = 0, titles: dict | None = None
) -> None:
    """Exact-bytes single-file CSV at executor speed: the rows are
    serialized by Spark's JVM CSV writer in parallel (with the option set
    proven byte-identical to Python ``csv.writer`` --
    ``tests/test_flatten_options.py::test_csv_exact_merged_byte_parity``
    covers embedded quotes/commas/newlines, null-vs-empty, whitespace
    preservation), then the part files are concatenated in partition order,
    which equals ``collect()`` order, so the result is byte-for-byte what
    ``write_csv_exact`` produces.  Row data never touches the driver: the
    only sequential work is raw byte concatenation (~GB/s), which is what
    a single-file output contract costs at any scale.  This replaced a
    driver-side collect that dominated flatten throughput (12s of a 22s
    1M-object run)."""
    from flatterer_spark.logutil import prof

    if preview:
        df = df.limit(preview)
    tmp = path + "._dir"
    name = os.path.basename(path)
    with prof(f"csv_job:{name}"):
        (
            formatted_strings(df)
            .write.mode("overwrite")
            .option("header", False)
            .option("nullValue", "")
            .option("emptyValue", "")
            .option("escape", '"')
            .option("lineSep", "\n")
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(tmp)
        )
    with prof(f"csv_concat:{name}"):
        concat_csv_parts(path, df.columns, tmp, titles=titles)
    shutil.rmtree(tmp)


def concat_csv_parts(
    path: str, columns: list[str], part_dir: str, titles: dict | None = None
) -> None:
    """Header + byte-concatenation of a part-file directory into one exact
    CSV, in partition order (== collect() order).  Shared by
    ``write_csv_exact_merged`` (per-table job) and the single-pass union
    writer (sinks/union_csv.py, per-tag directory).  A missing/empty
    ``part_dir`` yields a header-only file (0-row table)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import io

    hdr = io.StringIO()
    _write_csv_row(
        hdr,
        csvmod.writer(hdr, lineterminator="\n"),
        [(titles or {}).get(c, c) for c in columns],
    )
    parts = (
        [
            p
            for p in os.listdir(part_dir)
            if p.startswith("part-") and not p.endswith(".crc")
        ]
        if os.path.isdir(part_dir)
        else []
    )
    # sort by the numeric partition index, not lexicographically: Spark's
    # %05d zero-pad widens to 6 digits past 99,999 partitions, where
    # "part-100000" would lexicographically precede "part-99999"
    parts.sort(key=lambda n: int(n.split("-")[1]))
    with open(path, "wb") as f:
        f.write(hdr.getvalue().encode("utf-8"))
        f.flush()  # raw-fd appends below bypass the Python buffer
        for part in parts:
            with open(os.path.join(part_dir, part), "rb") as pf:
                try:
                    # zero-copy kernel-side append (no userspace buffers);
                    # falls back to buffered copy where unsupported
                    while os.sendfile(f.fileno(), pf.fileno(), None, 1 << 30):
                        pass
                except OSError:
                    shutil.copyfileobj(pf, f, 1 << 20)


def write_csv_distributed(df: DataFrame, out_dir: str, preview: int = 0) -> None:
    if preview:
        df = df.limit(preview)
    formatted_strings(df).write.mode("overwrite").option("header", True).csv(out_dir)


def write_parquet(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Typed parquet. single_file mimics the reference's one-file-per-table
    layout (`docs/outputs.md:48-50`); pass False for the scale path (directory
    with one file per partition)."""
    if not single_file:
        df.write.mode("overwrite").parquet(path)
        return
    tmp = path + "._dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    shutil.move(os.path.join(tmp, part), path)
    shutil.rmtree(tmp)


def fields_csv_rows(fields: list[dict]) -> list[list]:
    return [["table_name", "field_name", "field_type", "field_title", "count"]] + [
        [f["table_name"], f["field_name"], f["field_type"], f["field_title"], f["count"]]
        for f in fields
    ]


def write_metadata_csvs(out_dir: str, fields: list[dict], table_rows: list[dict]) -> None:
    with open(
        os.path.join(out_dir, "fields.csv"), "w", newline="", encoding="utf-8"
    ) as f:
        csvmod.writer(f, lineterminator="\n").writerows(fields_csv_rows(fields))
    with open(
        os.path.join(out_dir, "tables.csv"), "w", newline="", encoding="utf-8"
    ) as f:
        w = csvmod.writer(f, lineterminator="\n")
        w.writerow(["table_name", "table_title"])
        for t in table_rows:
            w.writerow([t["table_name"], t["table_title"]])


def write_datapackage(
    out_dir: str,
    fields: list[dict],
    table_rows: list[dict],
    stats: dict | None = None,
) -> None:
    resources = []
    present = {t["table_name"] for t in table_rows}
    for t in table_rows:
        tf = [f for f in fields if f["table_name"] == t["table_name"]]
        resources.append(
            {
                "profile": "tabular-data-resource",
                "name": t["table_name"],
                "flatterer_name": t["table_name"],
                "title": t["table_title"],
                "schema": {
                    "fields": [
                        {
                            "name": f["field_title"],
                            "title": f["field_title"],
                            "type": TYPE_TO_DATAPACKAGE.get(f["field_type"], "string"),
                            "count": f["count"],
                        }
                        for f in tf
                    ],
                    "primaryKey": "_link",
                    "foreignKeys": [
                        {
                            "fields": f["field_name"],
                            "reference": {
                                "resource": f["field_name"][len("_link_"):],
                                "fields": "_link",
                            },
                        }
                        for f in tf
                        # FK targets must exist in the package: an excluded
                        # intermediate table (only_tables) keeps its _link_*
                        # column but must not emit a dangling FK
                        if f["field_name"].startswith("_link_")
                        and f["field_name"][len("_link_"):] in present
                    ],
                },
                "path": f"csv/{t['table_name']}.csv",
                **(
                    {"stats": stats[t["table_name"]]}
                    if stats and t["table_name"] in stats
                    else {}
                ),
            }
        )
    with open(os.path.join(out_dir, "datapackage.json"), "w") as f:
        json.dump({"profile": "tabular-data-package", "resources": resources}, f, indent=2)


def _ddl(fields: list[dict], table_rows: list[dict]) -> str:
    chunks = []
    for t in table_rows:
        tf = [f for f in fields if f["table_name"] == t["table_name"]]
        cols = ",\n".join(
            f'    "{f["field_title"].lower()}" {TYPE_TO_SQL.get(f["field_type"], "TEXT")}'
            for f in tf
        )
        chunks.append(f'CREATE TABLE "{t["table_name"]}"(\n{cols});\n')
    return "\n".join(chunks)


def write_sql_scripts(out_dir: str, fields: list[dict], table_rows: list[dict]) -> None:
    ddl = _ddl(fields, table_rows)
    pg = os.path.join(out_dir, "postgresql")
    lite = os.path.join(out_dir, "sqlite")
    os.makedirs(pg, exist_ok=True)
    os.makedirs(lite, exist_ok=True)
    with open(os.path.join(pg, "postgresql_schema.sql"), "w") as f:
        f.write(ddl)
    with open(os.path.join(pg, "postgresql_load.sql"), "w") as f:
        for t in table_rows:
            f.write(
                f"\\copy \"{t['table_name']}\" from 'csv/{t['table_name']}.csv' with CSV HEADER\n"
            )
    with open(os.path.join(lite, "sqlite_schema.sql"), "w") as f:
        f.write(ddl)
    with open(os.path.join(lite, "sqlite_load.sql"), "w") as f:
        f.write(".mode csv \n")
        for t in table_rows:
            f.write(f".import 'csv/{t['table_name']}.csv' {t['table_name']} --skip 1 \n")


def write_sqlite(
    db_path: str,
    tables: dict[str, DataFrame],
    fields: list[dict],
    table_rows: list[dict],
    preview: int = 0,
    mode: str = "drop",
) -> None:
    """Driver-side SQLite load (single-writer sink; K3).  Scale path: JDBC.

    ``mode`` implements the C5 table lifecycle (docs/options.md:425-498):
    ``drop`` recreates, ``truncate`` deletes rows keeping the schema,
    ``evolve`` adds missing tables/columns -- on type conflict SQLite keeps
    the original column type (docs/options.md:434-436)."""
    import sqlite3

    con = sqlite3.connect(db_path)
    try:
        for t in table_rows:
            name = t["table_name"]
            if name not in tables:
                continue
            tf = [f for f in fields if f["table_name"] == name]
            colnames = [f["field_title"].lower() for f in tf]
            ddl_cols = ", ".join(
                f'"{cn}" {TYPE_TO_SQL.get(f["field_type"], "TEXT")}'
                for cn, f in zip(colnames, tf)
            )
            exists = con.execute(
                "SELECT 1 FROM sqlite_master WHERE type=\'table\' AND name=?",
                (name,),
            ).fetchone()
            if mode == "drop" or not exists:
                con.execute(f'DROP TABLE IF EXISTS "{name}"')
                # reference parity (docs/changelog.md:224): _link primary key,
                # FK constraints to ancestor tables, index per FK column
                constraints = []
                if "_link" in colnames:
                    constraints.append('PRIMARY KEY ("_link")')
                for cn in colnames:
                    if cn.startswith("_link_"):
                        ref = cn[len("_link_"):]
                        if any(t2["table_name"] == ref for t2 in table_rows):
                            constraints.append(
                                f'FOREIGN KEY ("{cn}") REFERENCES "{ref}" ("_link")'
                            )
                ddl_full = ", ".join([ddl_cols] + constraints)
                con.execute(f'CREATE TABLE "{name}"({ddl_full})')
                for cn in colnames:
                    if cn.startswith("_link_"):
                        con.execute(
                            f'CREATE INDEX IF NOT EXISTS "idx_{name}_{cn}" '
                            f'ON "{name}" ("{cn}")'
                        )
            elif mode == "truncate":
                con.execute(f'DELETE FROM "{name}"')
            elif mode == "evolve":
                have = {
                    r[1].lower()
                    for r in con.execute(f'PRAGMA table_info("{name}")')
                }
                for cn, f in zip(colnames, tf):
                    if cn not in have:
                        con.execute(
                            f'ALTER TABLE "{name}" ADD COLUMN "{cn}" '
                            + TYPE_TO_SQL.get(f["field_type"], "TEXT")
                        )
            df = tables[name].limit(preview) if preview else tables[name]
            rows = [tuple(r) for r in formatted_strings(df).collect()]
            collist = ", ".join(f'"{cn}"' for cn in colnames)
            ph = ", ".join("?" for _ in tf)
            con.executemany(
                f'INSERT INTO "{name}" ({collist}) VALUES ({ph})', rows
            )
        con.commit()
    finally:
        con.close()


def write_xlsx(
    xlsx_path: str,
    tables: dict[str, DataFrame],
    preview: int = 0,
    sheet_titles: dict | None = None,
    field_titles: dict | None = None,
) -> str | None:
    """Single output.xlsx, one sheet per table (K2) via the vendored stdlib
    writer (sinks/xlsx_writer.py -- no openpyxl needed).  Sheet names come
    from ``sheet_titles`` (tables_csv table_title renames sheets,
    docs/options.md:564-586); the writer applies the reference's fidelity
    rules (31-char truncation, bad-char strip, 32767-char cells, nan/inf
    dropped, hard row/col limits)."""
    from flatterer_spark.sinks.xlsx_writer import write_xlsx_tables

    sheets = []
    for name, df in tables.items():
        title = (sheet_titles or {}).get(name, name)
        col_titles = [
            (field_titles or {}).get(name, {}).get(c, c) for c in df.columns
        ]
        numeric = [
            isinstance(f.dataType, NumericType) for f in df.schema.fields
        ]
        pdf_df = df.limit(preview) if preview else df
        rows = [tuple(r) for r in formatted_strings(pdf_df).collect()]
        sheets.append((title, col_titles, numeric, rows))
    return write_xlsx_tables(xlsx_path, sheets)

"""Postgres direct-load sink (K5) with the drop/truncate/evolve lifecycle (C5).

Reference semantics (`docs/options.md:105-116,406-498`):
 - connection string ``postgres://...``; ``env`` reads ``DATABASE_URL``,
   ``env=MY_VAR`` reads that variable;
 - ``postgres_schema`` namespaces the tables, created if missing;
 - ``drop``: drop + recreate; ``truncate``: keep schema, delete rows;
 - ``evolve``: create missing tables, ADD missing columns, and on a type
   conflict widen the column to TEXT (Postgres rule; SQLite keeps the
   original type instead, `docs/options.md:434-436`).

Architecture: DDL/evolve decisions are a *pure planner* over (new field
metadata, existing-column snapshot) -> ordered SQL statements, so the
lifecycle logic is unit-testable without a database and byte-compatible with
the golden schema format
(`fixtures/basic_expected/postgresql/postgresql_schema.sql:1-17`).  Execution
picks the first available client: psycopg/psycopg2 (driver-side COPY, the
reference's own `\\copy` fast path) when importable, else the ``psql``
binary driven over a subprocess (same COPY FROM STDIN text protocol,
statements autocommit individually instead of one transaction -- documented
divergence of the fallback).  For cluster-scale appends use ``jdbc_append``
(``df.write.jdbc``: executors write partitions in parallel; needs a JDBC
driver jar on the classpath).  ``tests/test_postgres_sink.py`` exercises the
live path against an ephemeral server when server binaries are present.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from pyspark.sql import DataFrame

from flatterer_spark.sinks.writers import TYPE_TO_SQL, formatted_strings


def resolve_conn_string(postgres: str) -> str:
    """``env`` / ``env=VAR`` indirection (docs/options.md:110-116)."""
    if postgres == "env":
        return os.environ["DATABASE_URL"]
    if postgres.startswith("env="):
        return os.environ[postgres[len("env="):]]
    return postgres


def _qualified(table: str, schema: str | None) -> str:
    return f'"{schema}"."{table}"' if schema else f'"{table}"'


def _coltype(f: dict) -> str:
    return TYPE_TO_SQL.get(f["field_type"], "TEXT")


def create_table_sql(
    table: str, tf: list[dict], schema: str | None = None
) -> str:
    """Golden-format CREATE TABLE (postgresql_schema.sql byte layout)."""
    cols = ",\n".join(
        f'    "{f["field_title"].lower()}" {_coltype(f)}' for f in tf
    )
    return f'CREATE TABLE {_qualified(table, schema)}(\n{cols});\n'


def plan_postgres_ddl(
    fields: list[dict],
    table_rows: list[dict],
    existing: dict[str, dict[str, str]] | None = None,
    mode: str = "create",
    schema: str | None = None,
) -> list[str]:
    """Ordered DDL statements for one load.

    ``existing`` maps table -> {lower-cased column -> SQL type} as
    introspected from information_schema (empty dict/None = table absent).
    Modes: ``create`` (tables assumed absent), ``drop``, ``truncate``,
    ``evolve``.
    """
    existing = existing or {}
    stmts: list[str] = []
    if schema:
        stmts.append(f'CREATE SCHEMA IF NOT EXISTS "{schema}";')
    for t in table_rows:
        name = t["table_name"]
        tf = [f for f in fields if f["table_name"] == name]
        have = existing.get(name)
        if mode == "drop":
            stmts.append(f"DROP TABLE IF EXISTS {_qualified(name, schema)};")
            stmts.append(create_table_sql(name, tf, schema))
        elif have is None:
            stmts.append(create_table_sql(name, tf, schema))
        elif mode == "truncate":
            stmts.append(f"TRUNCATE {_qualified(name, schema)};")
        elif mode == "evolve":
            # evolve rules, docs/options.md:425-458: add missing columns;
            # on type conflict widen to TEXT (all types coerce to text)
            for f in tf:
                cn = f["field_title"].lower()
                want = _coltype(f)
                if cn not in have:
                    stmts.append(
                        f'ALTER TABLE {_qualified(name, schema)} '
                        f'ADD COLUMN "{cn}" {want};'
                    )
                elif have[cn].upper() != want and have[cn].upper() != "TEXT":
                    stmts.append(
                        f'ALTER TABLE {_qualified(name, schema)} '
                        f'ALTER COLUMN "{cn}" TYPE TEXT USING "{cn}"::text;'
                    )
        # mode "create" with an existing table: loader appends (reference
        # default inserts into whatever is there)
    return stmts


def introspection_sql(tables: list[str], schema: str | None = None) -> str:
    """information_schema query snapshotting existing column types."""
    in_list = ", ".join(f"'{t}'" for t in tables)
    return (
        "SELECT table_name, column_name, data_type FROM "
        "information_schema.columns WHERE table_schema = "
        f"'{schema or 'public'}' AND table_name IN ({in_list}) "
        "ORDER BY table_name, ordinal_position"
    )


_PG_TYPE_NORMALIZE = {
    "numeric": "NUMERIC",
    "timestamp without time zone": "TIMESTAMP",
    "timestamp with time zone": "TIMESTAMP",
    "boolean": "BOOLEAN",
    "text": "TEXT",
    "character varying": "TEXT",
}


def normalize_introspection(rows) -> dict[str, dict[str, str]]:
    """(table, column, data_type) rows -> {table: {col: normalized type}}."""
    out: dict[str, dict[str, str]] = {}
    for table, col, dtype in rows:
        out.setdefault(table, {})[col.lower()] = _PG_TYPE_NORMALIZE.get(
            dtype.lower(), dtype.upper()
        )
    return out


def _copy_text_cell(v) -> str:
    """Render one cell in COPY ``FORMAT text``: ``\\N`` for NULL, backslash
    escapes for the delimiter/terminator bytes -- the same encoding psycopg's
    ``write_row`` emits, so the two clients load identical bytes."""
    if v is None:
        return "\\N"
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


class _PsqlClient:
    """Postgres access through the ``psql`` binary (no Python driver needed).

    Same statements, same COPY FROM STDIN protocol as the psycopg path;
    the divergence is transactional scope (each subprocess autocommits)
    -- acceptable for the single-writer load this sink implements.
    """

    def __init__(self, conn_str: str):
        self.conn_str = conn_str

    def _run(self, args: list[str], input_: str | None = None) -> str:
        res = subprocess.run(
            ["psql", self.conn_str, "-v", "ON_ERROR_STOP=1", "-q", *args],
            input=input_,
            capture_output=True,
            text=True,
        )
        if res.returncode != 0:
            raise RuntimeError(f"psql failed: {res.stderr.strip()[:500]}")
        return res.stdout

    def execute(self, stmt: str) -> None:
        self._run(["-c", stmt])

    def query(self, sql: str) -> list[tuple]:
        out = self._run(["-At", "-c", sql])
        return [tuple(line.split("|")) for line in out.splitlines() if line]

    def copy_stdin(self, copy_sql: str, rows) -> None:
        lines = "".join(
            "\t".join(_copy_text_cell(v) for v in r) + "\n" for r in rows
        )
        self._run(["-c", copy_sql], input_=lines)


def have_live_postgres_client() -> bool:
    try:
        import psycopg  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        import psycopg2  # noqa: F401

        return True
    except ImportError:
        pass
    return shutil.which("psql") is not None


def write_postgres(
    postgres: str,
    tables: dict[str, DataFrame],
    fields: list[dict],
    table_rows: list[dict],
    mode: str = "create",
    postgres_schema: str | None = None,
    preview: int = 0,
) -> None:
    """Direct load.  psycopg COPY when importable (single-writer, exact text
    rendering shared with the CSV sink), else the ``psql`` subprocess client;
    raises with guidance when neither exists.  For cluster-scale appends use
    ``jdbc_append`` on each table instead."""
    conn_str = resolve_conn_string(postgres)
    try:
        import psycopg  # type: ignore[import-not-found]
    except ImportError:
        try:
            import psycopg2 as psycopg  # type: ignore[no-redef]
        except ImportError:
            psycopg = None

    if psycopg is None and shutil.which("psql") is None:
        raise RuntimeError(
            "postgres load needs psycopg/psycopg2, a psql binary on PATH, "
            "or use jdbc_append() with a JDBC driver jar on the cluster"
        )

    names = [t["table_name"] for t in table_rows if t["table_name"] in tables]

    def load(execute, query, copy_stdin):
        existing = normalize_introspection(
            query(introspection_sql(names, postgres_schema))
        )
        for stmt in plan_postgres_ddl(
            fields, table_rows, existing, mode=mode, schema=postgres_schema
        ):
            execute(stmt)
        for name in names:
            tf = [f for f in fields if f["table_name"] == name]
            collist = ", ".join(f'"{f["field_title"].lower()}"' for f in tf)
            df = tables[name].limit(preview) if preview else tables[name]
            rows = formatted_strings(df).collect()
            copy_stdin(
                f"COPY {_qualified(name, postgres_schema)} ({collist}) "
                "FROM STDIN",
                rows,
            )

    if psycopg is not None:
        con = psycopg.connect(conn_str)
        try:
            cur = con.cursor()

            def _copy(copy_sql, rows):
                with cur.copy(copy_sql) as cp:
                    for r in rows:
                        cp.write_row(tuple(r))

            def _query(sql):
                cur.execute(sql)
                return cur.fetchall()

            load(cur.execute, _query, _copy)
            con.commit()
        finally:
            con.close()
    else:
        cli = _PsqlClient(conn_str)
        load(cli.execute, cli.query, cli.copy_stdin)


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
) -> None:
    """Cluster-scale path: executors write partitions in parallel over JDBC
    (needs org.postgresql:postgresql on the classpath).  DDL/evolve must be
    applied first via plan_postgres_ddl on a control connection."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})

"""Postgres sink (K5) + drop/truncate/evolve lifecycle (C5): the DDL/evolve
planner is pure and tested against the golden byte format; the live
roundtrip runs against $POSTGRES_TEST_DSN when set, else against an
ephemeral server spun from the container's postgres binaries (initdb +
pg_ctl on a private unix socket, dropped to nobody when running as root --
postgres refuses root).  Skipped only when neither is available."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from flatterer_spark.sinks.postgres import (
    create_table_sql,
    introspection_sql,
    normalize_introspection,
    plan_postgres_ddl,
    resolve_conn_string,
)

FIELDS = [
    {"table_name": "main", "field_name": "_link", "field_type": "text", "field_title": "_link", "count": 2},
    {"table_name": "main", "field_name": "id", "field_type": "number", "field_title": "id", "count": 2},
    {"table_name": "main", "field_name": "title", "field_type": "text", "field_title": "title", "count": 2},
    {"table_name": "main", "field_name": "releaseDate", "field_type": "date", "field_title": "releaseDate", "count": 2},
    {"table_name": "main", "field_name": "rating_code", "field_type": "text", "field_title": "rating_code", "count": 2},
    {"table_name": "main", "field_name": "rating_name", "field_type": "text", "field_title": "rating_name", "count": 2},
    {"table_name": "developer", "field_name": "_link", "field_type": "text", "field_title": "_link", "count": 2},
    {"table_name": "developer", "field_name": "_link_main", "field_type": "text", "field_title": "_link_main", "count": 2},
    {"table_name": "developer", "field_name": "name", "field_type": "text", "field_title": "name", "count": 2},
]
TABLE_ROWS = [
    {"table_name": "main", "table_title": "main"},
    {"table_name": "developer", "table_title": "developer"},
]


def test_create_table_matches_golden_bytes():
    """CREATE TABLE layout == fixtures/basic_expected/postgresql/
    postgresql_schema.sql (lower-cased quoted columns, 4-space indent,
    TEXT/NUMERIC/TIMESTAMP vocabulary)."""
    got = create_table_sql("main", [f for f in FIELDS if f["table_name"] == "main"])
    assert got == (
        'CREATE TABLE "main"(\n'
        '    "_link" TEXT,\n'
        '    "id" NUMERIC,\n'
        '    "title" TEXT,\n'
        '    "releasedate" TIMESTAMP,\n'
        '    "rating_code" TEXT,\n'
        '    "rating_name" TEXT);\n'
    )


def test_plan_create_and_schema():
    stmts = plan_postgres_ddl(FIELDS, TABLE_ROWS, None, mode="create", schema="myschema")
    assert stmts[0] == 'CREATE SCHEMA IF NOT EXISTS "myschema";'
    assert stmts[1].startswith('CREATE TABLE "myschema"."main"(')
    assert len(stmts) == 3  # schema + 2 creates


def test_plan_drop_recreates():
    existing = {"main": {"_link": "TEXT"}}
    stmts = plan_postgres_ddl(FIELDS, TABLE_ROWS, existing, mode="drop")
    assert stmts[0] == 'DROP TABLE IF EXISTS "main";'
    assert stmts[1].startswith('CREATE TABLE "main"(')


def test_plan_truncate_keeps_schema():
    existing = {"main": {"_link": "TEXT"}}
    stmts = plan_postgres_ddl(FIELDS, TABLE_ROWS, existing, mode="truncate")
    assert 'TRUNCATE "main";' in stmts
    # developer doesn't exist yet -> created even under truncate
    assert any(s.startswith('CREATE TABLE "developer"(') for s in stmts)
    assert not any(s.startswith('CREATE TABLE "main"(') for s in stmts)


def test_plan_evolve_adds_columns_and_widens_to_text():
    """Evolve rules docs/options.md:425-458: missing table created, missing
    column added, conflicting type widened to TEXT (Postgres rule)."""
    existing = {
        "main": {
            "_link": "TEXT",
            "id": "TIMESTAMP",      # conflict: new data says NUMERIC
            "title": "TEXT",
            "rating_code": "TEXT",
            "rating_name": "TEXT",
            # releasedate missing -> ADD COLUMN
        }
    }
    stmts = plan_postgres_ddl(FIELDS, TABLE_ROWS, existing, mode="evolve")
    assert 'ALTER TABLE "main" ADD COLUMN "releasedate" TIMESTAMP;' in stmts
    assert (
        'ALTER TABLE "main" ALTER COLUMN "id" TYPE TEXT USING "id"::text;'
        in stmts
    )
    # unchanged matching columns produce no statements
    assert not any('"title"' in s for s in stmts)
    # absent table created whole
    assert any(s.startswith('CREATE TABLE "developer"(') for s in stmts)


def test_plan_evolve_existing_text_never_altered():
    existing = {"main": {c: "TEXT" for c in
                         ("_link", "id", "title", "releasedate",
                          "rating_code", "rating_name")},
                "developer": {"_link": "TEXT", "_link_main": "TEXT", "name": "TEXT"}}
    stmts = plan_postgres_ddl(FIELDS, TABLE_ROWS, existing, mode="evolve")
    assert stmts == []


def test_conn_string_env_indirection(monkeypatch):
    monkeypatch.setenv("DATABASE_URL", "postgres://a@h/db1")
    monkeypatch.setenv("MY_PG", "postgres://b@h/db2")
    assert resolve_conn_string("env") == "postgres://a@h/db1"
    assert resolve_conn_string("env=MY_PG") == "postgres://b@h/db2"
    assert resolve_conn_string("postgres://c@h/db3") == "postgres://c@h/db3"


def test_introspection_normalize():
    rows = [
        ("main", "_link", "text"),
        ("main", "ID", "numeric"),
        ("main", "releasedate", "timestamp without time zone"),
        ("main", "note", "character varying"),
    ]
    got = normalize_introspection(rows)
    assert got == {
        "main": {
            "_link": "TEXT",
            "id": "NUMERIC",
            "releasedate": "TIMESTAMP",
            "note": "TEXT",
        }
    }
    sql = introspection_sql(["main", "developer"], schema="s1")
    assert "table_schema = 's1'" in sql and "'developer'" in sql


@pytest.fixture(scope="module")
def pg_dsn():
    """A live-postgres DSN: $POSTGRES_TEST_DSN if set, else an ephemeral
    server on a private unix socket (skip only when neither is possible)."""
    env_dsn = os.environ.get("POSTGRES_TEST_DSN")
    if env_dsn:
        yield env_dsn
        return
    for binary in ("initdb", "pg_ctl", "psql"):
        if shutil.which(binary) is None:
            pytest.skip(f"no live postgres ({binary} not on PATH and "
                        "POSTGRES_TEST_DSN unset)")
    # postgres refuses to run as root: drop to nobody in a world-writable
    # tmpdir (direct /tmp child: pytest's tmp_path ancestors are 0700)
    run_as = []
    if os.getuid() == 0:
        if shutil.which("setpriv") is None:
            pytest.skip("running as root and no setpriv to drop privileges")
        run_as = ["setpriv", "--reuid=65534", "--regid=65534",
                  "--clear-groups"]
    base = tempfile.mkdtemp(prefix="flatterer-pg-")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    sock = os.path.join(base, "sock")
    os.mkdir(sock)
    os.chmod(sock, 0o777)
    log = os.path.join(base, "log")

    def run(cmd, **kw):
        res = subprocess.run([*run_as, *cmd], capture_output=True, text=True,
                             timeout=120, **kw)
        assert res.returncode == 0, f"{cmd[0]} failed: {res.stderr[-800:]}"

    try:
        run(["initdb", "-D", data, "-U", "puser", "-A", "trust", "--no-sync"])
        run(["pg_ctl", "-D", data, "-l", log, "-w", "-o",
             f"-c listen_addresses= -k {sock} -F", "start"])
        try:
            yield f"postgresql://puser@/postgres?host={sock}"
        finally:
            subprocess.run([*run_as, "pg_ctl", "-D", data, "-m", "immediate",
                            "stop"], capture_output=True, timeout=60)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_postgres_live_roundtrip(spark, tmp_path, pg_dsn):
    """Full load + evolve against a live server: create+drop load, then an
    evolving second load (new column, id type conflict -> widened to TEXT),
    asserted through the same client abstraction the sink uses."""
    import json

    from flatterer_spark.flatten import flatten
    from flatterer_spark.sinks.postgres import _PsqlClient

    p = tmp_path / "d.json"
    with open(p, "w") as f:
        json.dump([{"id": 1, "title": "x"}], f)
    flatten(str(p), str(tmp_path / "o1"), spark=spark, postgres=pg_dsn,
            drop=True)
    with open(p, "w") as f:
        json.dump([{"id": "not-a-number", "title": "y", "extra": 1}], f)
    flatten(
        str(p), str(tmp_path / "o2"), spark=spark, postgres=pg_dsn,
        evolve=True, id_prefix="l2.",
    )
    cli = _PsqlClient(pg_dsn)
    assert cli.query('SELECT COUNT(*) FROM "main"') == [("2",)]
    cols = dict(
        cli.query(
            "SELECT column_name, data_type FROM information_schema.columns "
            "WHERE table_name = 'main'"
        )
    )
    assert cols["extra"] == "numeric"      # evolve added the new column
    assert cols["id"] == "text"            # conflict widened NUMERIC -> TEXT
    titles = cli.query('SELECT "title" FROM "main" ORDER BY "title"')
    assert titles == [("x",), ("y",)]

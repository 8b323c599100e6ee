"""Postgres sink (K5) + drop/truncate/evolve lifecycle (C5): the DDL/evolve
planner is pure and tested against the golden byte format; live loading is
integration-gated on $POSTGRES_TEST_DSN (no server in this container)."""

from __future__ import annotations

import os

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


@pytest.mark.skipif(
    not os.environ.get("POSTGRES_TEST_DSN"),
    reason="no live postgres (set POSTGRES_TEST_DSN to run)",
)
def test_postgres_live_roundtrip(spark, tmp_path):
    """Full load + evolve against a live server (integration)."""
    import json

    from flatterer_spark.flatten import flatten

    dsn = os.environ["POSTGRES_TEST_DSN"]
    p = tmp_path / "d.json"
    with open(p, "w") as f:
        json.dump([{"id": 1, "title": "x"}], f)
    flatten(str(p), str(tmp_path / "o1"), spark=spark, postgres=dsn, drop=True)
    with open(p, "w") as f:
        json.dump([{"id": "not-a-number", "title": "y", "extra": 1}], f)
    flatten(
        str(p), str(tmp_path / "o2"), spark=spark, postgres=dsn,
        evolve=True, id_prefix="l2.",
    )
    import psycopg

    with psycopg.connect(dsn) as con:
        rows = con.execute('SELECT COUNT(*) FROM "main"').fetchone()
        assert rows[0] == 2

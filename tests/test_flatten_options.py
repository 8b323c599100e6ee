"""Option-surface tests: JSONSchema ordering/titles (F12), sqlite lifecycle
(C5: drop/truncate/evolve), stats (K11), arrays_new_table (F7),
inline_one_to_one (F6), emit_obj (F9), path selector (S2), json_path (S9),
table_prefix/path_separator (F14), fields_csv/only_fields (F11)."""

from __future__ import annotations

import csv
import json
import os
import sqlite3

import pytest

FIX = "/root/reference/fixtures"


def _write(tmp_path, name, obj):
    p = tmp_path / name
    with open(p, "w") as f:
        json.dump(obj, f)
    return str(p)


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_schema_field_order_and_titles(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    schema = _write(
        tmp_path,
        "schema.json",
        {
            "type": "object",
            "properties": {
                "title": {"type": "string", "title": "Game Title"},
                "id": {"type": "number", "title": "Game ID"},
                "releaseDate": {"type": "string"},
            },
        },
    )
    out = str(tmp_path / "out")
    res = flatten(
        f"{FIX}/basic.json", out, spark=spark,
        schema=schema, schema_titles="underscore_slug",
    )
    main_cols = [
        f for f in res["fields"].itertuples() if f.table_name == "main"
    ]
    names = [f.field_name for f in main_cols]
    # schema order first (title before id before releaseDate), then the rest
    assert names.index("title") < names.index("id") < names.index("releaseDate")
    titles = {f.field_name: f.field_title for f in main_cols}
    assert titles["title"] == "game_title" and titles["id"] == "game_id"
    # CSV header uses the titles
    with open(f"{out}/csv/main.csv") as f:
        header = f.readline().strip().split(",")
    assert "game_title" in header and "game_id" in header


def test_remote_schema_ref_dereferenced(tmp_path):
    """Reference parity (docs/options.md:663-756, jsonref): remote http $refs
    are fetched and dereferenced, and a remote document's own relative refs
    resolve against its URL."""
    import functools
    import http.server
    import threading

    from flatterer_spark.sources.schema_guide import schema_key_order_and_titles

    srv_dir = tmp_path / "srv"
    srv_dir.mkdir()
    (srv_dir / "titles.json").write_text(json.dumps(
        {"gameTitle": {"type": "string", "title": "Game Title"}}
    ))
    (srv_dir / "defs.json").write_text(json.dumps({
        "definitions": {
            "game": {
                "type": "object",
                "properties": {
                    # relative ref: must resolve against defs.json's URL
                    "title": {"$ref": "titles.json#/gameTitle"},
                    "id": {"type": "number", "title": "Game ID"},
                },
            }
        }
    }))
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(srv_dir)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        schema = _write(tmp_path, "schema.json", {
            "type": "object",
            "properties": {
                "game": {
                    "$ref": f"http://127.0.0.1:{port}/defs.json#/definitions/game"
                },
                "year": {"type": "number"},
            },
        })
        order, titles = schema_key_order_and_titles(schema)
        assert order[()] == ["game", "year"]
        assert order[("game",)] == ["title", "id"]
        assert titles[("game", "title")] == "Game Title"
        assert titles[("game", "id")] == "Game ID"

        # the schema path itself may be remote
        order2, _ = schema_key_order_and_titles(
            f"http://127.0.0.1:{port}/defs.json"
        )
        assert order2 == {}  # no top-level properties; must not error
    finally:
        httpd.shutdown()


def test_recursive_schema_ref_terminates(tmp_path):
    """A self-referential $ref (tree-shaped schema) must terminate, not
    recurse forever."""
    from flatterer_spark.sources.schema_guide import schema_key_order_and_titles

    schema = _write(tmp_path, "rec.json", {
        "type": "object",
        "properties": {
            "name": {"type": "string", "title": "Name"},
            "children": {"type": "array", "items": {"$ref": "#"}},
        },
    })
    order, titles = schema_key_order_and_titles(schema)
    assert order[()] == ["name", "children"]
    assert titles[("name",)] == "Name"


def test_exact_csv_auto_never_collects_large_tables(spark, tmp_path, monkeypatch):
    """Above EXACT_CSV_MAX_ROWS the exact single-file CSV must come from the
    executor-side merged writer, never a driver collect: a default-options
    flatten() on real data must not materialize a full table on the driver
    (VERDICT r3 #4) -- and since round 5 it keeps the single-file exact
    layout while doing so (write_csv_exact_merged)."""
    import flatterer_spark.flatten as fl
    from flatterer_spark.sinks import writers

    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 10)
    monkeypatch.setattr(
        writers, "write_csv_exact",
        lambda *a, **k: pytest.fail("driver-side exact CSV writer invoked "
                                    "above the auto threshold"),
    )
    src = _write(tmp_path, "big.json",
                 [{"id": i, "name": f"n{i}"} for i in range(50)])
    out_dir = str(tmp_path / "out")
    res = fl.flatten(src, out_dir, spark=spark)
    # merged writer emits ONE exact file (not a part directory), with all
    # rows present and the header first
    main_csv = os.path.join(out_dir, "csv", "main.csv")
    assert os.path.isfile(main_csv)
    with open(main_csv) as f:
        lines = f.read().splitlines()
    assert lines[0].split(",")[0] == "_link"
    assert len(lines) == 51
    assert res["data"]["main"] == main_csv


def test_csv_exact_merged_byte_parity(spark, tmp_path):
    """write_csv_exact_merged must produce BYTE-IDENTICAL output to the
    driver-side write_csv_exact on adversarial values: embedded quotes,
    commas, newlines, null vs empty string, preserved leading/trailing
    whitespace, unicode -- the property that lets flatten() switch writers
    by size without changing its output contract."""
    from flatterer_spark.sinks.writers import (
        write_csv_exact,
        write_csv_exact_merged,
    )

    vals = ["plain", 'has"quote', "has,comma", "has\nnewline", " lead",
            "trail ", "", None, 'both"and,comma', "unicode-éß",
            "tab\there", "'single'", '""', 'a,b"c\nd',
            "has\rcr", "\r", "a\rb\nc", "cr\r\nlf"]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v string").repartition(3, "id")
    a = str(tmp_path / "a.csv")
    b = str(tmp_path / "b.csv")
    write_csv_exact(df, a, titles={"v": "The Value"})
    write_csv_exact_merged(df, b, titles={"v": "The Value"})
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_fused_metadata_matches_two_pass(spark, tmp_path, monkeypatch):
    """The observe()-fused single-pass flow (large inputs) must produce
    byte-identical fields.csv / tables.csv / datapackage.json AND csv table
    bytes to the two-pass flow (metadata job first): forced by dropping the
    writer threshold to 5 rows so the fused path runs on a small corpus,
    then comparing against a high-threshold run of the same input."""
    import flatterer_spark.flatten as fl

    src = _write(tmp_path, "fused.json", [
        {"id": i, "name": f"n{i}", "when": "2024-01-0" + str(1 + i % 9),
         "kids": [{"k": i}, {"k": i + 1}]}
        for i in range(40)
    ])
    out_a = str(tmp_path / "two_pass")
    monkeypatch.setattr(fl, "_FUSED_ENABLED", False)
    fl.flatten(src, out_a, spark=spark)
    monkeypatch.setattr(fl, "_FUSED_ENABLED", True)

    # fused + exact collect writers (default threshold; the r7 default for
    # small inputs -- observation metrics fire on the collect action)
    out_c = str(tmp_path / "fused_exact")
    fl.flatten(src, out_c, spark=spark)

    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 5)
    out_b = str(tmp_path / "fused")
    fl.flatten(src, out_b, spark=spark)

    for rel in ("csv/main.csv", "csv/kids.csv", "fields.csv", "tables.csv",
                "datapackage.json"):
        with open(os.path.join(out_a, rel), "rb") as a:
            want = a.read()
        for out in (out_b, out_c):
            with open(os.path.join(out, rel), "rb") as b:
                assert want == b.read(), (rel, out)


def test_fused_small_child_keeps_driver_exact_writer(spark, tmp_path,
                                                     monkeypatch):
    """In fused mode the writer choice is per-table, not keyed on the main
    table's size (ADVICE r6): a tiny child table takes the cheap driver
    collect writer (no distributed write job + temp dir), the big main
    table keeps the merged writer, and the observed metadata (fields.csv,
    counts) stays byte-identical to the two-pass flow either way.  This
    routing needs the exact ordinal aggregate's child counts, so pin the
    exact path (the optimistic text-ordinal mode deliberately skips the
    bounded-count legs -- they are LIMIT-bounded and would race the
    full-scan guard observation -- and routes unknown children to the
    merged writer; test_union_csv.py covers that flow)."""
    import flatterer_spark.flatten as fl
    from flatterer_spark.sinks import writers
    from flatterer_spark.sources import json_input

    monkeypatch.setattr(
        json_input, "with_ordinal_text", lambda *a, **k: None
    )
    src = _write(tmp_path, "wide.json", [
        {"id": i, "name": f"n{i}",
         "kids": ([{"k": 1}, {"k": 2}] if i == 0 else [])}
        for i in range(30)
    ])
    out_ref = str(tmp_path / "ref_two_pass")
    monkeypatch.setattr(fl, "_FUSED_ENABLED", False)
    fl.flatten(src, out_ref, spark=spark)
    monkeypatch.setattr(fl, "_FUSED_ENABLED", True)

    monkeypatch.setattr(fl, "EXACT_CSV_MAX_ROWS", 10)
    real_exact = writers.write_csv_exact
    real_merged = writers.write_csv_exact_merged
    kinds: dict[str, str] = {}

    def _spy(kind, real):
        def w(df, p, **k):
            kinds[os.path.basename(p)] = kind
            return real(df, p, **k)
        return w

    monkeypatch.setattr(writers, "write_csv_exact", _spy("exact", real_exact))
    monkeypatch.setattr(
        writers, "write_csv_exact_merged", _spy("merged", real_merged)
    )
    out = str(tmp_path / "out_fused")
    fl.flatten(src, out, spark=spark)
    assert kinds["main.csv"] == "merged"  # 30 rows > 10: stays distributed
    assert kinds["kids.csv"] == "exact"   # 2 rows: no write job + temp dir
    for rel in ("csv/main.csv", "csv/kids.csv", "fields.csv", "tables.csv",
                "datapackage.json"):
        with open(os.path.join(out_ref, rel), "rb") as a, open(
            os.path.join(out, rel), "rb"
        ) as b:
            assert a.read() == b.read(), rel


def test_exact_csv_auto_stays_exact_below_threshold(spark, tmp_path):
    """Below the threshold the default remains exact single-file CSV (golden
    parity behavior unchanged)."""
    from flatterer_spark.flatten import flatten

    src = _write(tmp_path, "small.json", [{"id": 1}, {"id": 2}])
    out_dir = str(tmp_path / "out_small")
    flatten(src, out_dir, spark=spark)
    assert os.path.isfile(os.path.join(out_dir, "csv", "main.csv"))


def test_items_only_recursive_schema_terminates(tmp_path):
    """A schema self-referential purely through the array/items branch keeps
    `at` constant while recursing, so the len(at) guard alone never fires --
    the explicit depth counter must terminate it (ADVICE r3)."""
    from flatterer_spark.sources.schema_guide import schema_key_order_and_titles

    schema = _write(tmp_path, "rec_items.json", {
        "type": "array",
        "items": {"$ref": "#"},
    })
    order, titles = schema_key_order_and_titles(schema)
    assert order == {} and titles == {}


def test_keyboard_interrupt_cleans_output_dir(spark, tmp_path):
    """C3 Ctrl-C parity (src/lib.rs:18-26): a KeyboardInterrupt mid-flatten
    must abort cleanly -- no partial output dir left behind (the C2
    error-hygiene path catches BaseException, which includes SIGINT's
    KeyboardInterrupt in both the library and CLI surfaces)."""
    from flatterer_spark.flatten import flatten

    def interrupted_source():
        yield {"id": 1}
        raise KeyboardInterrupt

    out = str(tmp_path / "intr")
    with pytest.raises(KeyboardInterrupt):
        flatten(interrupted_source(), out, spark=spark)
    assert not os.path.exists(out)


def test_sqlite_has_pk_fk_and_indexes(spark, tmp_path):
    """Reference parity (docs/changelog.md:224): SQLite export carries _link
    primary keys, FK constraints to ancestors, and indexes on FK columns."""
    from flatterer_spark.flatten import flatten

    doc = [{"id": 1, "tags": [{"t": "x"}, {"t": "y"}]}]
    db = str(tmp_path / "k.db")
    flatten(
        _write(tmp_path, "k.json", doc), str(tmp_path / "ok"),
        spark=spark, sqlite_path=db,
    )
    con = sqlite3.connect(db)
    try:
        tags_sql = con.execute(
            "SELECT sql FROM sqlite_master WHERE type='table' AND name='tags'"
        ).fetchone()[0]
        assert 'PRIMARY KEY ("_link")' in tags_sql
        assert 'FOREIGN KEY ("_link_main") REFERENCES "main" ("_link")' in tags_sql
        idx = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='index'"
            )
        }
        assert "idx_tags__link_main" in idx
        # FK integrity actually holds for the loaded data
        con.execute("PRAGMA foreign_keys=ON")
        violations = con.execute("PRAGMA foreign_key_check").fetchall()
        assert violations == []
    finally:
        con.close()


def test_sqlite_evolve_adds_columns(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    db = str(tmp_path / "e.db")
    doc_v1 = [{"id": 1, "name": "a"}]
    doc_v2 = [{"id": 2, "name": "b", "extra": "x"}]
    flatten(
        _write(tmp_path, "v1.json", doc_v1), str(tmp_path / "o1"),
        spark=spark, sqlite_path=db, id_prefix="a.",
    )
    flatten(
        _write(tmp_path, "v2.json", doc_v2), str(tmp_path / "o2"),
        spark=spark, sqlite_path=db, evolve=True,
    )
    con = sqlite3.connect(db)
    cols = [r[1] for r in con.execute('PRAGMA table_info("main")')]
    rows = con.execute('SELECT id, name, extra FROM "main" ORDER BY id').fetchall()
    con.close()
    assert "extra" in cols
    # id column has NUMERIC affinity -> SQLite stores the values as integers
    assert rows == [(1, "a", None), (2, "b", "x")]


def test_sqlite_evolve_type_conflict_and_new_table(spark, tmp_path):
    """Evolve across two loads with a CHANGED schema (docs/options.md:425-458):
    a field that flips number->text keeps the original SQLite column type
    (SQLite evolve rule), a new array introduces a whole new child table with
    its _link PK/FK wiring, and both loads' rows coexist."""
    from flatterer_spark.flatten import flatten

    db = str(tmp_path / "ev.db")
    v1 = [{"id": 1, "val": 10}]
    v2 = [{"id": 2, "val": "not-a-number", "tags": [{"t": "a"}, {"t": "b"}]}]
    flatten(
        _write(tmp_path, "ev1.json", v1), str(tmp_path / "eo1"),
        spark=spark, sqlite_path=db, id_prefix="l1.",
    )
    flatten(
        _write(tmp_path, "ev2.json", v2), str(tmp_path / "eo2"),
        spark=spark, sqlite_path=db, evolve=True, id_prefix="l2.",
    )
    con = sqlite3.connect(db)
    try:
        # type conflict: the original NUMERIC-typed column survives evolve
        info = {r[1]: r[2] for r in con.execute('PRAGMA table_info("main")')}
        assert info["val"] in ("NUMERIC", "INTEGER", "REAL")
        rows = con.execute(
            'SELECT id, val FROM "main" ORDER BY id'
        ).fetchall()
        assert rows == [(1, 10), (2, "not-a-number")]
        # the new child table arrived with reference wiring: _link PK, FK
        # back to main, index on the FK column
        tags = con.execute('SELECT t FROM "tags" ORDER BY t').fetchall()
        assert tags == [("a",), ("b",)]
        ddl = con.execute(
            "SELECT sql FROM sqlite_master WHERE type='table' AND name='tags'"
        ).fetchone()[0]
        assert 'PRIMARY KEY ("_link")' in ddl
        assert 'REFERENCES "main" ("_link")' in ddl
        con.execute("PRAGMA foreign_keys=ON")
        assert con.execute("PRAGMA foreign_key_check").fetchall() == []
    finally:
        con.close()


def test_sqlite_truncate_replaces_rows(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    db = str(tmp_path / "t.db")
    doc = [{"id": 1}]
    flatten(_write(tmp_path, "a.json", doc), str(tmp_path / "oa"), spark=spark, sqlite_path=db)
    flatten(
        _write(tmp_path, "b.json", [{"id": 9}]), str(tmp_path / "ob"),
        spark=spark, sqlite_path=db, truncate=True,
    )
    con = sqlite3.connect(db)
    rows = con.execute('SELECT id FROM "main"').fetchall()
    con.close()
    assert rows == [(9,)]  # NUMERIC affinity


def test_stats_in_datapackage(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    out = str(tmp_path / "st")
    flatten(f"{FIX}/basic.json", out, spark=spark, stats=True)
    with open(f"{out}/datapackage.json") as f:
        dp = json.load(f)
    main = next(r for r in dp["resources"] if r["name"] == "main")
    assert main["stats"]["title"]["approx_distinct"] == 2
    assert main["stats"]["title"]["min"] == "A Game"
    assert "mean" not in main["stats"]["title"]  # text field: no moments
    assert main["stats"]["id"]["mean"] == 1.5  # ids 1,2
    assert "stddev" in main["stats"]["id"]


def test_arrays_new_table(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    doc = [{"id": 1, "tags": ["x", "y"], "nums": [1.5, 2]}]
    out = str(tmp_path / "ant")
    flatten(_write(tmp_path, "d.json", doc), out, spark=spark, arrays_new_table=True)
    tags = _read_csv(f"{out}/csv/tags.csv")
    nums = _read_csv(f"{out}/csv/nums.csv")
    assert [r["value"] for r in tags] == ["x", "y"]  # strings verbatim
    assert [r["value"] for r in nums] == ["1.5", "2"]
    assert tags[0]["_link"] == "0.tags.0" and tags[0]["_link_main"] == "0"


def test_scalar_arrays_inline_json_by_default(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    doc = [{"id": 1, "tags": ["x", "y"]}]
    out = str(tmp_path / "inl")
    flatten(_write(tmp_path, "d.json", doc), out, spark=spark)
    main = _read_csv(f"{out}/csv/main.csv")
    assert json.loads(main[0]["tags"]) == ["x", "y"]


def test_inline_one_to_one(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    doc = [
        {"id": 1, "meta": [{"k": "a"}]},
        {"id": 2, "meta": [{"k": "b"}]},
    ]
    out = str(tmp_path / "o2o")
    flatten(_write(tmp_path, "d.json", doc), out, spark=spark, inline_one_to_one=True)
    main = _read_csv(f"{out}/csv/main.csv")
    assert main[0]["meta_k"] == "a" and main[1]["meta_k"] == "b"
    import os

    assert not os.path.exists(f"{out}/csv/meta.csv")


def test_emit_obj(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    out = str(tmp_path / "eo")
    flatten(
        f"{FIX}/basic.json", out, spark=spark, emit_obj=(("rating",),),
    )
    rating = _read_csv(f"{out}/csv/rating.csv")
    main = _read_csv(f"{out}/csv/main.csv")
    assert rating[0]["code"] == "E" and rating[0]["_link"] == "0.rating.0"
    assert "rating_code" not in main[0]


def test_path_selector(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    doc = {"results": [{"id": 1}, {"id": 2}], "meta": "x"}
    out = str(tmp_path / "ps")
    flatten(_write(tmp_path, "d.json", doc), out, spark=spark, path=("results",))
    main = _read_csv(f"{out}/csv/main.csv")
    assert [r["id"] for r in main] == ["1", "2"]


def test_json_path_filter(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    doc = [{"id": 1, "keep": {"flag": 1}}, {"id": 2}]
    out = str(tmp_path / "jp")
    flatten(
        _write(tmp_path, "d.json", doc), out, spark=spark,
        json_path="$.keep.flag",
    )
    main = _read_csv(f"{out}/csv/main.csv")
    assert [r["id"] for r in main] == ["1"]


_JP_DOCS = [
    {"id": 1, "type": "film", "year": 1999, "rating": {"code": "PG"}},
    {"id": 2, "type": "game", "year": 2005},
    {"id": 3, "type": "game", "year": 1990},
    {"id": 4, "type": "book"},
]


@pytest.mark.parametrize(
    "expr,want",
    [
        ("$[?(@.type == 'game')]", [2, 3]),
        ("$[?(@.type == 'game' || @.type == 'film')]", [1, 2, 3]),
        ("$[?(@.type == 'game' && @.year > 2000)]", [2]),
        ("$[?(@.year >= 1999)]", [1, 2]),
        ("$[?(@.type != 'game')]", [1, 4]),
        ("$[?(@.rating.code == 'PG')]", [1]),
        ("$[?(@.rating)]", [1]),
        ("$[?((@.type == 'book' || @.type == 'film') && @.id < 2)]", [1]),
        ("$.rating.code", [1]),
        ("$.nosuchfield", []),
        ("$[?(@.nosuchfield == 'x')]", []),
    ],
)
def test_json_path_predicates(spark, tmp_path, expr, want):
    """Reference predicate filters (docs/options.md:343-384) translated to
    native Catalyst predicates."""
    from flatterer_spark.sources.json_input import read_json_source

    p = tmp_path / "preds.jsonl"
    with open(p, "w") as f:
        for d in _JP_DOCS:
            f.write(json.dumps(d) + "\n")
    df, _ = read_json_source(spark, str(p), ndjson=True, json_path=expr)
    assert sorted(r.id for r in df.collect()) == want


def test_json_path_predicate_is_native(spark, tmp_path):
    """The supported subset must not pay the to_json serialize-and-probe
    round-trip: no to_json/get_json_object in the optimized plan."""
    from flatterer_spark.sources.json_input import read_json_source

    p = tmp_path / "nat.jsonl"
    with open(p, "w") as f:
        for d in _JP_DOCS:
            f.write(json.dumps(d) + "\n")
    df, _ = read_json_source(
        spark, str(p), ndjson=True, json_path="$[?(@.type == 'game')]"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "to_json" not in plan and "get_json_object" not in plan
    # unsupported form (wildcard) falls back to serialize-and-probe
    df2, _ = read_json_source(
        spark, str(p), ndjson=True, json_path="$.rating[*].code"
    )
    plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
    assert "get_json_object" in plan2


def test_table_prefix_and_separator(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    out = str(tmp_path / "pref")
    res = flatten(
        f"{FIX}/basic.json", out, spark=spark,
        table_prefix="t_", path_separator="__",
    )
    assert set(res["tables"]["table_name"]) == {"t_main", "t_developer", "t_platforms"}
    main = _read_csv(f"{out}/csv/t_main.csv")
    assert "rating__code" in main[0]


def test_fields_csv_reorder_and_only(spark, tmp_path):
    from flatterer_spark.flatten import flatten

    fc = tmp_path / "fields.csv"
    with open(fc, "w") as f:
        f.write("table_name,field_name,field_title\n")
        f.write("main,title,THE_TITLE\nmain,id,id\n")
    out = str(tmp_path / "fcsv")
    flatten(
        f"{FIX}/basic.json", out, spark=spark,
        fields_csv=str(fc), only_fields=True,
    )
    main = _read_csv(f"{out}/csv/main.csv")
    assert list(main[0].keys()) == ["_link", "THE_TITLE", "id"]
    # fields.csv keeps the ORIGINAL field_name (so it can be fed back in);
    # only field_title carries the display name (reference semantics)
    frows = _read_csv(f"{out}/fields.csv")
    trow = next(r for r in frows if r["field_title"] == "THE_TITLE")
    assert trow["field_name"] == "title"
    # emitted fields.csv round-trips as a fields_csv input
    out2 = str(tmp_path / "fcsv2")
    flatten(
        f"{FIX}/basic.json", out2, spark=spark,
        fields_csv=f"{out}/fields.csv", only_fields=True,
    )
    assert list(_read_csv(f"{out2}/csv/main.csv")[0].keys()) == [
        "_link", "THE_TITLE", "id",
    ]


def test_tables_csv_title_plumbed(spark, tmp_path):
    """tables_csv table_title renames tables in tables.csv and datapackage
    (docs/options.md:564-586)."""
    import json as jsonmod

    from flatterer_spark.flatten import flatten

    tc = tmp_path / "tables.csv"
    with open(tc, "w") as f:
        f.write("table_name,table_title\n")
        f.write("platforms,Platform List\nmain,Games\n")
    out = str(tmp_path / "tcsv")
    res = flatten(f"{FIX}/basic.json", out, spark=spark, tables_csv=str(tc))
    titles = dict(zip(res["tables"]["table_name"], res["tables"]["table_title"]))
    assert titles["platforms"] == "Platform List"
    assert titles["main"] == "Games"
    assert titles["developer"] == "developer"
    with open(f"{out}/datapackage.json") as f:
        dp = jsonmod.load(f)
    by_name = {r["name"]: r for r in dp["resources"]}
    assert by_name["platforms"]["title"] == "Platform List"
    rows = _read_csv(f"{out}/tables.csv")
    assert {r["table_name"]: r["table_title"] for r in rows}["main"] == "Games"


def test_inline_one_to_one_nested_array(spark, tmp_path):
    """F6 at depth: a nested array that never exceeds one element anywhere is
    inlined into its parent (child) table; the parent array with >1 elements
    stays a child table."""
    doc = [
        {"id": 1, "platforms": [
            {"name": "PC", "req": [{"os": "win"}]},
            {"name": "X", "req": []},
        ]},
        {"id": 2, "platforms": [{"name": "PS", "req": [{"os": "bsd"}]}]},
    ]
    out = str(tmp_path / "nest")
    res = flatten_or = None
    from flatterer_spark.flatten import flatten

    res = flatten(
        _write(tmp_path, "nest.json", doc), out, spark=spark,
        inline_one_to_one=True,
    )
    assert sorted(res["tables"]["table_name"]) == ["main", "platforms"]
    rows = _read_csv(f"{out}/csv/platforms.csv")
    assert list(rows[0].keys()) == ["_link", "_link_main", "name", "req_os"]
    assert [(r["name"], r["req_os"]) for r in rows] == [
        ("PC", "win"), ("X", ""), ("PS", "bsd"),
    ]
    _ = flatten_or


def test_only_tables_excluding_intermediate(spark, tmp_path):
    """Excluding a middle table of a chain must not error; the grandchild
    keeps its full FK chain and the datapackage emits no dangling FK
    (docs/changelog.md:21, 0.19.18)."""
    doc = [
        {"id": 1, "platforms": [
            {"name": "PC", "requirements": [{"os": "win"}, {"os": "mac"}]}
        ]},
        {"id": 2, "platforms": [
            {"name": "X", "requirements": [{"os": "bsd"}]}
        ]},
    ]
    tc = tmp_path / "tables.csv"
    with open(tc, "w") as f:
        f.write("table_name,table_title\nmain,main\nplatforms_requirements,reqs\n")
    out = str(tmp_path / "mid")
    res = flatten_mod = None
    from flatterer_spark.flatten import flatten

    res = flatten(
        _write(tmp_path, "mid.json", doc), out, spark=spark,
        tables_csv=str(tc), only_tables=True,
    )
    assert sorted(res["tables"]["table_name"]) == ["main", "platforms_requirements"]
    rows = _read_csv(f"{out}/csv/platforms_requirements.csv")
    assert list(rows[0].keys()) == ["_link", "_link_platforms", "_link_main", "os"]
    assert [r["_link_main"] for r in rows] == ["0", "0", "1"]
    with open(f"{out}/datapackage.json") as f:
        dp = json.load(f)
    gc = next(r for r in dp["resources"] if r["name"] == "platforms_requirements")
    # _link_platforms FK dropped (target resource excluded); _link_main kept
    assert gc["schema"]["foreignKeys"] == [
        {"fields": "_link_main", "reference": {"resource": "main", "fields": "_link"}}
    ]
    _ = flatten_mod


def test_failure_removes_partial_output(spark, tmp_path, monkeypatch):
    """C2 error hygiene: any failure deletes the partial output dir
    (docs/changelog.md:318-319)."""
    from flatterer_spark import flatten as flatten_mod
    from flatterer_spark.flatten import flatten
    from flatterer_spark.sinks import writers

    def boom(*a, **kw):
        raise RuntimeError("forced mid-write failure")

    monkeypatch.setattr(writers, "write_metadata_csvs", boom)
    out = str(tmp_path / "failing")
    with pytest.raises(RuntimeError, match="forced mid-write"):
        flatten(f"{FIX}/basic.json", out, spark=spark)
    assert not os.path.exists(out)
    _ = flatten_mod


def test_separator_name_collision_deduped(spark, tmp_path):
    """A literal 'a_b' key and an {'a': {'b': ...}} path both flatten to
    'a_b'; later occurrences get a deterministic numeric suffix instead of
    an ambiguous-reference error."""
    from flatterer_spark.flatten import flatten

    p = tmp_path / "c.jsonl"
    p.write_text(json.dumps({"a_b": 1, "a": {"b": 2}}) + "\n")
    out = str(tmp_path / "c_out")
    flatten(str(p), out, spark=spark, ndjson=True)
    with open(f"{out}/csv/main.csv") as f:
        rows = list(csv.DictReader(f))
    assert set(rows[0]) == {"_link", "a_b", "a_b_2"}
    assert rows[0]["a_b"] == "1" and rows[0]["a_b_2"] == "2"


def test_empty_input_yields_empty_main(spark, tmp_path):
    """Empty NDJSON / empty array: empty main table with a _link header,
    not an internal error from the ordinal offset map."""
    from flatterer_spark.flatten import flatten

    for name, content, kw in [
        ("e.jsonl", "", {"ndjson": True}),
        ("e.json", "[]", {}),
    ]:
        p = tmp_path / name
        p.write_text(content)
        out = str(tmp_path / f"out_{name}")
        flatten(str(p), out, spark=spark, **kw)
        with open(f"{out}/csv/main.csv") as f:
            lines = f.read().splitlines()
        assert lines[0] == "_link" and len(lines) == 1


def test_flatten_tables_read_the_cache_not_the_json(spark, tmp_path):
    """Plan contract for the single-parse pipeline: every table's plan must
    scan the persisted parsed input (InMemoryTableScan), never re-read the
    JSON relation -- the property that keeps flatten at exactly two full
    parses (schema inference + cache build) regardless of table count."""
    from flatterer_spark.flatten_api import flatten_dataframes

    src = _write(tmp_path, "cache.json",
                 [{"id": i, "kids": [{"k": i}]} for i in range(20)])
    res = flatten_dataframes(spark, src)
    try:
        assert res.input_df is not None
        assert res.input_df.storageLevel.useMemory
        for name, df in res.tables.items():
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan, f"{name} does not read the cache"
            # the cached plan's own description (below InMemoryTableScan)
            # legitimately shows the FileScan it caches; nothing ABOVE the
            # cache may scan the JSON relation directly
            above = plan.split("InMemoryTableScan")[0]
            assert "FileScan json" not in above, f"{name} re-parses the JSON"
    finally:
        res.unpersist()


def test_malformed_json_fails_and_cleans_output(spark, tmp_path):
    """Reference parity: malformed input errors the run (no silent
    _corrupt_record column / null rows) and error hygiene removes the
    partial output dir."""
    import pytest as _pytest

    from flatterer_spark.flatten import flatten

    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1}\n{"id": 2, BROKEN\n{"id": 3}\n')
    out = str(tmp_path / "badout")
    with _pytest.raises(Exception):
        flatten(str(p), out, spark=spark, ndjson=True)
    assert not os.path.exists(out)


def test_coercion_edge_keeps_rows_and_releases_probe_cache(spark, tmp_path):
    """Valid JSON that Spark's PERMISSIVE reader flags (a '' cell under an
    otherwise-boolean column) must keep the row (cell nulls) -- and the
    corrupt-column probe's temporary cache must be RELEASED once the probe
    ran (it would otherwise hold a second full copy of the parse alongside
    flatten's pipeline persist for the rest of the session)."""
    from flatterer_spark.flatten import flatten

    def cached_ids():
        return {
            r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    before = cached_ids()  # other tests' session-lifetime staged views
    src = tmp_path / "coerce.jsonl"
    src.write_text('{"id": 1, "flag": true}\n{"id": 2, "flag": ""}\n')
    out = str(tmp_path / "o")
    flatten(str(src), out, spark=spark, ndjson=True)
    with open(os.path.join(out, "csv", "main.csv")) as f:
        assert len(f.read().splitlines()) == 3  # header + both rows
    leaked = cached_ids() - before
    assert not leaked, f"a cache outlived flatten(): {leaked}"


def test_flatterer_log_env_hook(monkeypatch):
    """C4: FLATTERER_LOG env overrides the default level (reference
    docs/development.md:46-48; 'trace' maps to DEBUG)."""
    import logging

    from flatterer_spark.logutil import setup_logging

    monkeypatch.setenv("FLATTERER_LOG", "trace")
    assert setup_logging("warning").level == logging.DEBUG
    monkeypatch.delenv("FLATTERER_LOG")
    assert setup_logging("warning").level == logging.WARNING
    assert setup_logging("info").level == logging.INFO


def test_iterator_spool_files_cleaned(spark, tmp_path):
    """S6 iterator input stages to a temp NDJSON spool; flatten() must unlink
    it once the run (success or failure) is done."""
    from flatterer_spark.flatten import flatten
    from flatterer_spark.sources import json_input

    before = set(json_input._SPOOL_FILES)
    out = str(tmp_path / "iter_out")
    res = flatten(
        iter([{"a": 1, "tags": [{"t": "x"}]}, {"a": 2}]), out, spark=spark
    )
    assert set(res["data"]) == {"main", "tags"}
    leaked = [p for p in json_input._SPOOL_FILES if p not in before]
    assert leaked == []


def test_csv_exact_merged_byte_parity_fuzz(spark, tmp_path):
    """Hypothesis sweep of the merged-writer parity: arbitrary printable +
    whitespace strings (quotes, commas, newlines, unicode) through both
    writers must produce identical bytes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flatterer_spark.sinks.writers import (
        write_csv_exact,
        write_csv_exact_merged,
    )

    alphabet = st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Zs"),
        include_characters='",\n\r\t éß',
    )
    texts = st.lists(
        st.one_of(st.none(), st.text(alphabet, max_size=12)),
        min_size=1, max_size=8,
    )
    counter = iter(range(10**6))

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vals=texts)
    def check(vals):
        i = next(counter)
        df = spark.createDataFrame(
            [(j, v) for j, v in enumerate(vals)], "id long, v string"
        ).repartition(2, "id")
        a = str(tmp_path / f"fa{i}.csv")
        b = str(tmp_path / f"fb{i}.csv")
        write_csv_exact(df, a)
        write_csv_exact_merged(df, b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), vals

    check()


def test_bench_flatten_harness_agrees_with_engine(spark, tmp_path):
    """bench_flatten.py's hand-written comparator must stay semantically
    aligned with the engine on the benchmark corpus shape: same main-table
    cardinality and the same child-table row multiset sizes, so the
    throughput comparison is apples-to-apples."""
    import bench_flatten as BF
    from flatterer_spark.flatten import flatten

    src = str(tmp_path / "in.ndjson")
    BF.gen_ndjson(src, 200)
    py_out = str(tmp_path / "py")
    n = BF.handwritten_flatten(src, py_out)
    assert n == 200
    res = flatten(src, str(tmp_path / "spark"), spark=spark, ndjson=True)
    import pandas as pd

    for table in ("main", "developer", "metrics"):
        py_rows = len(pd.read_csv(os.path.join(py_out, f"{table}.csv")))
        spark_rows = len(pd.read_csv(res["data"][table]))
        assert py_rows == spark_rows, table


def test_optimistic_schema_guard_miss_redoes_exact(spark, tmp_path):
    """The optimistic head-sample schema path must produce byte-identical
    output to exact inference in BOTH guard outcomes: (a) a key first seen
    past the head sample and (b) a type widened by a late row force the
    guard miss -> exact redo; (c) a homogeneous input takes the optimistic
    path outright.  Compare every CSV byte-for-byte against a run with the
    optimistic path disabled (_exact_schema)."""
    import json as _json

    from flatterer_spark.flatten import flatten

    cases = {
        # (a) 1500 uniform rows, then a brand-new key + child table
        "late_key": [
            {"id": i, "a": "x"} for i in range(1500)
        ] + [{"id": 1500, "a": "y", "extra": {"deep": 1},
              "kids": [{"n": 1}, {"n": 2}]}],
        # (b) long for 1500 rows, double after
        "late_widen": [
            {"id": i, "v": i} for i in range(1500)
        ] + [{"id": 1500, "v": 1.5}],
        # (c) homogeneous: optimistic path, no redo
        "uniform": [
            {"id": i, "v": i, "kids": [{"n": i}]} for i in range(1200)
        ],
    }
    for name, rows in cases.items():
        src = tmp_path / f"{name}.ndjson"
        with open(src, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        out_opt = str(tmp_path / f"{name}_opt")
        out_exact = str(tmp_path / f"{name}_exact")
        flatten(str(src), out_opt, spark=spark, ndjson=True)
        flatten(str(src), out_exact, spark=spark, ndjson=True,
                _exact_schema=True)
        for root, _, files in os.walk(out_exact):
            for fn in files:
                ex = os.path.join(root, fn)
                op = os.path.join(out_opt, os.path.relpath(ex, out_exact))
                with open(ex, "rb") as a, open(op, "rb") as b:
                    assert a.read() == b.read(), (name, fn)

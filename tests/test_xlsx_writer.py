"""K2 XLSX sink: vendored stdlib writer with the reference's fidelity rules
(docs/changelog.md:30-44,305-317).  Output is validated by unzipping and
parsing the OOXML parts (no Excel library in this container)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pytest

from flatterer_spark.sinks.xlsx_writer import (
    XLSX_MAX_CELL,
    sanitize_sheet_name,
    write_xlsx_tables,
)

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _sheet_rows(path: str, idx: int = 1) -> list[list[str | None]]:
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read(f"xl/worksheets/sheet{idx}.xml"))
    out = []
    for row in root.iter(f"{NS}row"):
        cells = []
        for c in row.iter(f"{NS}c"):
            t = c.find(f"{NS}is/{NS}t")
            v = c.find(f"{NS}v")
            cells.append(t.text if t is not None else (v.text if v is not None else None))
        out.append(cells)
    return out


def _sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in root.iter(f"{NS}sheet")]


def test_roundtrip_values(tmp_path):
    p = str(tmp_path / "o.xlsx")
    write_xlsx_tables(
        p,
        [
            ("main", ["id", "title"], [True, False],
             [(1, "A Film"), (2, "<b> & 'quotes'")]),
            ("child", ["x"], [False], [("y",)]),
        ],
    )
    assert _sheet_names(p) == ["main", "child"]
    rows = _sheet_rows(p, 1)
    assert rows[0] == ["id", "title"]
    assert rows[1] == ["1", "A Film"]
    assert rows[2] == ["2", "<b> & 'quotes'"]  # XML escaping round-trips
    assert _sheet_rows(p, 2) == [["x"], ["y"]]


def test_sheet_name_rules(tmp_path):
    used: set[str] = set()
    assert sanitize_sheet_name("a[b]c:d", used) == "abcd"
    assert sanitize_sheet_name("x" * 40, used) == "x" * 31
    # duplicate after truncation gets a suffix
    assert sanitize_sheet_name("x" * 40, used) == "x" * 29 + "~1"


def test_nan_inf_dropped_and_nulls_keep_position(tmp_path):
    p = str(tmp_path / "n.xlsx")
    write_xlsx_tables(
        p,
        [("t", ["a", "b", "c"], [True, True, False],
          [(float("nan"), float("inf"), "keep"), (None, 2.5, None)])],
    )
    rows = _sheet_rows(p)
    assert rows[1] == [None, None, "keep"]  # nan/inf -> empty cells, c aligned
    assert rows[2] == [None, "2.5", None]


def test_cell_truncation(tmp_path):
    p = str(tmp_path / "t.xlsx")
    big = "é" * (XLSX_MAX_CELL + 10)  # unicode-safe truncation
    write_xlsx_tables(p, [("t", ["a"], [False], [(big,)])])
    rows = _sheet_rows(p)
    assert len(rows[1][0]) == XLSX_MAX_CELL


def test_row_limit_raises(tmp_path):
    p = str(tmp_path / "r.xlsx")

    def gen():
        for i in range(2_000_000):
            yield (i,)

    with pytest.raises(ValueError, match="exceeds"):
        write_xlsx_tables(p, [("t", ["a"], [True], gen())])


def test_flatten_xlsx_end_to_end(spark, tmp_path):
    """flatten(xlsx=True) produces a workbook with table_title sheet names."""
    import json

    from flatterer_spark.flatten import flatten

    doc = [{"id": 1, "tags": [{"t": "x"}, {"t": "y"}]}]
    src = tmp_path / "d.json"
    src.write_text(json.dumps(doc))
    tc = tmp_path / "tables.csv"
    tc.write_text("table_name,table_title\nmain,Stuff\ntags,Tag List\n")
    out = str(tmp_path / "o")
    res = flatten(str(src), out, spark=spark, xlsx=True, tables_csv=str(tc))
    assert res["xlsx"].endswith("output.xlsx")
    assert _sheet_names(res["xlsx"]) == ["Stuff", "Tag List"]
    rows = _sheet_rows(res["xlsx"], 2)
    assert rows[0] == ["_link", "_link_main", "t"]
    assert [r[2] for r in rows[1:]] == ["x", "y"]

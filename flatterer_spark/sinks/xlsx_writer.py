"""Minimal stdlib XLSX writer (no openpyxl dependency).

XLSX is a zip of XML parts; this emits the smallest valid Office Open XML
workbook (workbook + one worksheet per table, inline strings, no shared
strings / styles beyond the required stubs).  Fidelity rules follow the
reference's XLSX sink (`docs/outputs.md:36-38`, changelog 0.19.12-0.19.15,
`docs/changelog.md:30-44,305-317`):

 - sheet names: invalid characters ``[]:*?/\\`` stripped with a warning,
   truncated to Excel's 31-char limit, de-duplicated;
 - cell strings truncated to 32,767 chars (unicode-safe);
 - NaN / +-Inf numeric cells dropped (0.19.15: "nan/inf ignored for xlsx");
 - hard limits checked: > 1,048,576 rows or > 16,384 columns raises
   (0.19.12: "Check limits on XLSX files and raise error if found").

The writer is a single-writer driver-side sink by design -- the same position
the reference takes (XLSX disabled with threads>1, `src/lib.rs:221-225`).
"""

from __future__ import annotations

import logging
import zipfile
from xml.sax.saxutils import escape

log = logging.getLogger("flatterer_spark")

XLSX_MAX_ROWS = 1_048_576
XLSX_MAX_COLS = 16_384
XLSX_MAX_CELL = 32_767
_BAD_SHEET_CHARS = "[]:*?/\\"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheets}</Types>"""

_SHEET_CT = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets></workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}</Relationships>"""


def sanitize_sheet_name(name: str, used: set[str]) -> str:
    clean = "".join(ch for ch in name if ch not in _BAD_SHEET_CHARS)
    if clean != name:
        log.warning("xlsx: bad characters stripped from sheet name %r", name)
    clean = clean[:31] or "Sheet"
    base = clean
    i = 1
    while clean.lower() in used:
        suffix = f"~{i}"
        clean = base[: 31 - len(suffix)] + suffix
        i += 1
    used.add(clean.lower())
    return clean


def _cell_xml(value, is_number: bool) -> str | None:
    """One <c> element, or None to drop the cell (nulls, nan/inf)."""
    if value is None:
        return None
    if is_number:
        try:
            f = float(value)
        except (TypeError, ValueError):
            return None
        if f != f or f in (float("inf"), float("-inf")):
            return None  # 0.19.15: nan/inf ignored
        return f"<c><v>{value}</v></c>"
    s = str(value)
    if len(s) > XLSX_MAX_CELL:
        # python slicing is code-point safe (0.19.13 unicode-safe truncation)
        s = s[:XLSX_MAX_CELL]
    return f'<c t="inlineStr"><is><t xml:space="preserve">{escape(s)}</t></is></c>'


def write_xlsx_tables(
    path: str,
    sheets: list[tuple[str, list[str], list[bool], object]],
) -> str:
    """Write a workbook.

    ``sheets``: (name, column_titles, numeric_flags, rows_iterable) per
    table; each row is a sequence aligned with the columns.  Raises
    ValueError when a sheet exceeds Excel's row/column limits.
    """
    used: set[str] = set()
    names = [sanitize_sheet_name(n, used) for n, _, _, _ in sheets]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheets="\n".join(_SHEET_CT.format(i=i + 1) for i in range(len(sheets)))
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            _WORKBOOK.format(
                sheets="".join(
                    f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                    for i, name in enumerate(names)
                )
            ),
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            _WB_RELS.format(
                rels="\n".join(
                    f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxml'
                    f'formats.org/officeDocument/2006/relationships/worksheet" '
                    f'Target="worksheets/sheet{i + 1}.xml"/>'
                    for i in range(len(sheets))
                )
            ),
        )
        for i, (orig_name, cols, numeric, rows) in enumerate(sheets):
            if len(cols) > XLSX_MAX_COLS:
                raise ValueError(
                    f"xlsx: sheet {orig_name!r} has {len(cols)} columns "
                    f"(limit {XLSX_MAX_COLS})"
                )
            parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
            parts.append(
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
            )
            header = "".join(
                c for c in (_cell_xml(t, False) for t in cols) if c
            )
            parts.append(f"<row>{header}</row>")
            nrows = 1
            for row in rows:
                nrows += 1
                if nrows > XLSX_MAX_ROWS:
                    raise ValueError(
                        f"xlsx: sheet {orig_name!r} exceeds {XLSX_MAX_ROWS} rows"
                    )
                cells = []
                for v, isnum in zip(row, numeric):
                    c = _cell_xml(v, isnum)
                    # keep positional alignment: emit an empty cell for
                    # dropped values so later columns don't shift left
                    cells.append(c if c is not None else "<c/>")
                parts.append(f"<row>{''.join(cells)}</row>")
            parts.append("</sheetData></worksheet>")
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", "".join(parts))
    return path

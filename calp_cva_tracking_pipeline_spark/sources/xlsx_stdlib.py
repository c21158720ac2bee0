"""Minimal stdlib xlsx codec (S6 fallback).

The reference's survey workbook (code/10_global_cva_analysis.R:30-36) is the
one input format whose usual Python reader (openpyxl) may be absent from a
deploy image. xlsx is just a zip of SpreadsheetML XML parts, so a KB-sized
dimension workbook needs nothing beyond ``zipfile`` + ``xml.etree``: this
module reads the subset the engine needs (cell types: shared string, inline
string, formula-cached string, boolean, number; sheet selection by name or
index) and writes the same subset (inline strings only — no sharedStrings
part needed) so tests can round-trip fixtures without any Excel dependency.

This is a DRIVER-SIDE codec for small dimension inputs, mirroring the
reference's use of the workbook; fact-scale data never goes through xlsx.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB12' -> 27 (base-26 letters prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    """0 -> 'A', 27 -> 'AB' (inverse of _col_index)."""
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Workbook-order list of (sheet_name, zip_member_path)."""
    rels = {}
    rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rel_root.iter(f"{_PKG_REL_NS}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = "xl/" + target
        rels[rel.get("Id")] = target
    out = []
    wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
    for sheet in wb_root.iter(f"{_NS}sheet"):
        rid = sheet.get(f"{_REL_NS}id")
        if rid in rels:
            out.append((sheet.get("name", ""), rels[rid]))
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    strings = []
    for si in ET.fromstring(raw).iter(f"{_NS}si"):
        strings.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return strings


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t")) or None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx(path: str, sheet: str | int = 0) -> tuple[list[str], list[list]]:
    """Read one worksheet → (header, data_rows); first row is the header.

    Rows are padded/truncated to the header width (Excel omits trailing
    empty cells); completely empty rows are dropped — matching what
    pandas.read_excel produces for the reference's survey workbook shape.
    """
    with zipfile.ZipFile(path) as zf:
        sheets = _sheet_targets(zf)
        if isinstance(sheet, int):
            target = sheets[sheet][1]
        else:
            matches = [t for name, t in sheets if name == sheet]
            if not matches:
                raise KeyError(
                    f"sheet {sheet!r} not in {[n for n, _ in sheets]}"
                )
            target = matches[0]
        shared = _shared_strings(zf)
        grid: list[list] = []
        for row in ET.fromstring(zf.read(target)).iter(f"{_NS}row"):
            cells: list = []
            next_idx = 0  # writers may legally omit r=; position is implied
            for cell in row.iter(f"{_NS}c"):
                ref = cell.get("r")
                idx = _col_index(ref) if ref else next_idx
                next_idx = idx + 1
                while len(cells) <= idx:
                    cells.append(None)
                cells[idx] = _cell_value(cell, shared)
            if any(c is not None for c in cells):
                grid.append(cells)
    if not grid:
        return [], []
    header = [str(c).strip() if c is not None else "" for c in grid[0]]
    width = len(header)
    rows = [
        (r + [None] * width)[:width] for r in grid[1:]
    ]
    return header, rows


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(str(value))}</t></is></c>"
    )


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write {sheet_name: [[header...], [row...], ...]} as a valid xlsx.

    Strings go inline (no sharedStrings part), numbers/bools typed — the
    subset read_xlsx (and openpyxl/pandas) round-trips.
    """
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="\n".join(
                    f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                    'ContentType="application/vnd.openxmlformats-'
                    'officedocument.spreadsheetml.worksheet+xml"/>'
                    for i in range(len(names))
                )
            ),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            '<sheet name="{n}" sheetId="{i}" r:id="rId{i}"/>'.format(
                # attribute context: double quotes must be escaped too
                n=escape(name, {'"': "&quot;"}),
                i=i + 1,
            )
            for i, name in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>',
        )
        for i, name in enumerate(names):
            rows_xml = []
            for rix, row in enumerate(sheets[name]):
                cells = "".join(
                    _cell_xml(f"{_col_letters(cix)}{rix + 1}", val)
                    for cix, val in enumerate(row)
                )
                rows_xml.append(f'<row r="{rix + 1}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>",
            )

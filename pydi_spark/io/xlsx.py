"""Minimal pure-stdlib XLSX codec (zipfile + xml.etree).

The reference loads spreadsheets through ``pandas.read_excel``
(PyDI/io/loaders.py:532-560), which needs openpyxl — not available in
every runtime. Like the repo's pure-stdlib PNG/WAV codecs, this module
implements the small subset of ECMA-376 SpreadsheetML that tabular
interchange needs: one-or-more worksheets of inline-string / numeric /
boolean cells, shared-strings resolution on read (so files written by
real Excel/openpyxl load too), no styles/formulas/merged ranges.

``load_excel``/``write_excel`` in readers/writers use pandas when its
engine is importable and fall back to this codec otherwise, so the
loader surface works in both environments.
"""

from __future__ import annotations

import math
import re
import zipfile
import xml.etree.ElementTree as ET
from typing import Any
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>
"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>
"""


# XML 1.0 cannot carry most control characters (and \r is normalized
# away by every conformant parser). SpreadsheetML's own convention —
# what Excel writes — encodes them as _xHHHH_ and protects literal
# text that LOOKS like an escape by encoding its underscore as
# _x005F_. Decode is a single left-to-right pass, so the protected
# sequence "_x005F_x0041_" round-trips to the literal "_x0041_".
_ILLEGAL_XML = re.compile(
    "[\x00-\x08\x0b\x0c\x0d\x0e-\x1f\x7f"
    "\ud800-\udfff\ufffe\uffff]"
)
_ESC_SEQ = re.compile(r"_x([0-9A-Fa-f]{4})_")


def _encode_cell_text(s: str) -> str:
    s = _ESC_SEQ.sub(lambda m: "_x005F_x" + m.group(1) + "_", s)
    return _ILLEGAL_XML.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _decode_cell_text(s: str) -> str:
    return _ESC_SEQ.sub(lambda m: chr(int(m.group(1), 16)), s)


def _col_letter(idx: int) -> str:
    """0 -> A, 25 -> Z, 26 -> AA."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    """'BC12' -> 54 (column part only)."""
    letters = re.match(r"([A-Z]+)", ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path: str, sheets: dict[str, tuple[list[str], list[list[Any]]]]) -> None:
    """Write ``{sheet_name: (columns, rows)}`` to ``path``. Header row
    first; str cells as inline strings, bool as t="b", numbers as
    plain <v>, None skipped."""
    sheet_names = list(sheets)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheet_names))
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
        f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheet_names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            f'relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_names))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml",
                    _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(sheet_names):
            cols, rows = sheets[name]
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                        _sheet_xml([list(cols)] + [list(r) for r in rows]))


def _sheet_xml(all_rows: list[list[Any]]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]
    for r, row in enumerate(all_rows, start=1):
        cells = []
        for c, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_col_letter(c)}{r}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                # Excel's number model has no NaN/inf — repr() would
                # emit invalid SpreadsheetML that openpyxl rejects.
                # Write non-finite floats as empty cells (pandas'
                # to_excel convention): they read back as None.
                if isinstance(v, float) and not math.isfinite(v):
                    continue
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(_encode_cell_text(str(v)))}</t></is></c>"
                )
        parts.append(f'<row r="{r}">{"".join(cells)}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def read_xlsx(path: str) -> dict[str, tuple[list[str], list[list[Any]]]]:
    """Read an xlsx into ``{sheet_name: (columns, rows)}``. First row is
    the header. Understands inline strings, shared strings, numbers,
    booleans, and t="str" formula results."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append(_decode_cell_text(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t"))))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target_by_rid = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(f"{_REL_NS}Relationship")
        }
        out: dict[str, tuple[list[str], list[list[Any]]]] = {}
        for sheet in wb.iter(f"{_NS}sheet"):
            name = sheet.get("name")
            target = target_by_rid[sheet.get(f"{_RID_NS}id")]
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            grid = _read_sheet(ET.fromstring(zf.read(target)), shared)
            if not grid:
                out[name] = ([], [])
                continue
            width = max(len(r) for r in grid)
            grid = [r + [None] * (width - len(r)) for r in grid]
            header = [str(v) if v is not None else f"c{i}"
                      for i, v in enumerate(grid[0])]
            out[name] = (header, grid[1:])
        return out


def _read_sheet(root: ET.Element, shared: list[str]) -> list[list[Any]]:
    rows: list[list[Any]] = []
    for row in root.iter(f"{_NS}row"):
        vals: list[Any] = []
        for c in row.findall(f"{_NS}c"):
            idx = _col_index(c.get("r", _col_letter(len(vals)) + "1"))
            while len(vals) < idx:
                vals.append(None)
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                v: Any = _decode_cell_text("".join(
                    el.text or "" for el in is_el.iter(f"{_NS}t")
                )) if is_el is not None else None
            else:
                v_el = c.find(f"{_NS}v")
                raw = v_el.text if v_el is not None else None
                if raw is None:
                    v = None
                elif t == "s":
                    v = shared[int(raw)]
                elif t == "b":
                    v = raw in ("1", "true")
                elif t == "str":
                    v = raw
                else:
                    f = float(raw)
                    v = int(f) if f.is_integer() and "e" not in raw.lower() else f
            vals.append(v)
        rows.append(vals)
    return rows

"""Pure-stdlib HTML ``<table>`` extraction (html.parser).

The reference loads HTML tables through ``pandas.read_html``
(PyDI/io/loaders.py:985-1012), which needs lxml/bs4. This fallback
parses well-formed table markup with the stdlib ``HTMLParser``: every
``<table>`` becomes (columns, rows); a first row made of ``<th>`` cells
is the header (pandas' inference rule), otherwise columns are named
``c0..c{n-1}``. Nested tables, col/rowspans, and malformed markup are
out of scope — this is an interchange reader, not a scraper.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any
from xml.sax.saxutils import escape


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[tuple[str, str]]]] = []
        self._rows: list[list[tuple[str, str]]] | None = None
        self._row: list[tuple[str, str]] | None = None
        self._cell_tag: str | None = None
        self._cell_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._rows = []
        elif tag == "tr" and self._rows is not None:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell_tag = tag
            self._cell_text = []

    def _flush_cell(self) -> None:
        # Mis-nested markup (e.g. ``<td>x</tr></td>``) can close a row
        # while a cell is still open; flush the cell into whatever row
        # is current (or drop it) so no end-tag ever touches a None row.
        if self._cell_tag is not None:
            if self._row is not None:
                self._row.append(
                    (self._cell_tag, "".join(self._cell_text).strip())
                )
            self._cell_tag = None

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell_tag:
            self._flush_cell()
        elif tag == "tr" and self._rows is not None:
            self._flush_cell()
            if self._row:
                self._rows.append(self._row)
            self._row = None
        elif tag == "table" and self._rows is not None:
            self._flush_cell()
            if self._row:
                self._rows.append(self._row)
            self._row = None
            self.tables.append(self._rows)
            self._rows = None

    def handle_data(self, data):
        if self._cell_tag is not None:
            self._cell_text.append(data)


def _coerce(s: str) -> Any:
    try:
        f = float(s)
        return int(f) if f.is_integer() and "e" not in s.lower() else f
    except ValueError:
        return s


def read_html_tables(text: str) -> list[tuple[list[str], list[list[Any]]]]:
    """All tables in an HTML document as (columns, rows); numeric-looking
    cells are coerced like ``pandas.read_html`` does."""
    p = _TableParser()
    p.feed(text)
    out = []
    for rows in p.tables:
        if not rows:
            continue
        if all(tag == "th" for tag, _ in rows[0]):
            header = [txt for _, txt in rows[0]]
            body = rows[1:]
        else:
            header = [f"c{i}" for i in range(len(rows[0]))]
            body = rows
        data = [[_coerce(txt) for _, txt in r] for r in body]
        width = len(header)
        data = [(r + [None] * (width - len(r)))[:width] for r in data]
        out.append((header, data))
    return out


def html_table(columns: list[str], rows: list[list[Any]]) -> str:
    """Render one ``<table>`` with a ``<th>`` header row — the
    write-side twin of :func:`read_html_tables` for round-trips."""
    head = "".join(f"<th>{escape(str(c))}</th>" for c in columns)
    body = "".join(
        "<tr>" + "".join(
            f"<td>{'' if v is None else escape(str(v))}</td>" for v in r
        ) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"

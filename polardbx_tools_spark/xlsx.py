"""Minimal pure-stdlib XLSX writer/reader (no openpyxl in this sandbox).

XLSX is a ZIP of OpenXML (ECMA-376) parts; for flat tabular sheets the
format reduces to a handful of XML files. This module implements exactly
that subset — enough for the reference's Excel paths:

* XLSX read (``batch-tool worker/common/reader/XlsxReader.java:40-63``),
* XLSX export (``worker/common/writer/XlsxFileWriter.java``),
* frodo's replay report workbook (detail + summary sheets,
  ``frodo-core/.../core/Frodo.java:944-1060``).

Values are written as inline strings / numbers (no shared-strings table
— simpler, and legal per the spec); the reader handles BOTH inline and
shared strings so real-world files load too. Excel paths are driver-side
by design: workbooks are small by nature (the reference reads them
single-threaded as well).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheets}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


_ILLEGAL_XML = re.compile(
    # \x0D (\r) is legal XML but parsers normalize it to \n, so it must
    # be escaped to survive a round-trip (Excel escapes it too)
    "[\x00-\x08\x0B-\x0C\x0D\x0E-\x1F\x7F\uD800-\uDFFF￾￿]"
)
_X_ESCAPE = re.compile(r"_x[0-9A-Fa-f]{4}_")


def _encode_text(s: str) -> str:
    """OOXML text encoding: characters illegal in XML 1.0 are written as
    ``_xHHHH_`` (the convention Excel itself uses); pre-existing literal
    ``_xHHHH_`` sequences get their underscore encoded first."""
    s = _X_ESCAPE.sub(lambda m: "_x005F_" + m.group(0)[1:], s)
    return _ILLEGAL_XML.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _decode_text(s: str) -> str:
    return _X_ESCAPE.sub(lambda m: chr(int(m.group(0)[2:6], 16)), s)


def _col_name(idx: int) -> str:
    """0-based column index -> A1-style column letters."""
    out = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell_xml(row: int, col: int, value) -> str:
    ref = f"{_col_name(col)}{row}"
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # NaN/inf are not valid OOXML numerics (<v>nan</v> corrupts the
        # workbook for Excel); write them as inline strings instead
        if isinstance(value, float) and (value != value or value in
                                         (float("inf"), float("-inf"))):
            return (
                f'<c r="{ref}" t="inlineStr"><is><t>{value!r}</t></is></c>'
            )
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{escape(_encode_text(str(value)))}</t></is></c>"
    )


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: rows}`` (each row a list of cells) as a
    minimal but spec-valid XLSX workbook."""
    sheet_names = list(sheets)
    overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheet_names))
    )
    # quoteattr, not escape: escape() leaves double quotes intact, so a
    # sheet name containing one would break out of the attribute and
    # produce malformed XML
    wb_sheets = "".join(
        f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
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
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_names))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheets=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(sheet_names):
            rows_xml = []
            for r, row in enumerate(sheets[name], start=1):
                cells = "".join(_cell_xml(r, c, v) for c, v in enumerate(row))
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            # dimension preserves the logical sheet extent even when the
            # trailing cells are all empty (cells are stored sparsely)
            n_rows = len(sheets[name])
            n_cols = max((len(r) for r in sheets[name]), default=0)
            dim = (
                f'<dimension ref="A1:{_col_name(max(0, n_cols - 1))}{max(1, n_rows)}"/>'
                if n_rows and n_cols
                else ""
            )
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"{dim}<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
            )


def _cell_col(ref: str) -> int:
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: int = 0) -> list[list]:
    """Read one worksheet back as a list of rows (cells typed as
    str/float/bool/None). Handles inline AND shared strings. Rows are
    padded with None to the sheet's max width (cells are stored
    sparsely, so trailing empties are otherwise absent)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        try:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append(
                    _decode_text("".join(t.text or "" for t in si.iter(f"{_NS}t")))
                )
        except KeyError:
            pass
        sheet_xml = z.read(f"xl/worksheets/sheet{sheet + 1}.xml")
    root = ET.fromstring(sheet_xml)
    dim_width = 0
    dim = root.find(f"{_NS}dimension")
    if dim is not None and ":" in dim.attrib.get("ref", ""):
        dim_width = _cell_col(dim.attrib["ref"].split(":")[1]) + 1
    out: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: list = []
        for c in row.iter(f"{_NS}c"):
            col = _cell_col(c.attrib.get("r", "A1"))
            while len(cells) < col:
                cells.append(None)
            t = c.attrib.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    _decode_text("".join(x.text or "" for x in is_el.iter(f"{_NS}t")))
                    if is_el is not None
                    else None
                )
            else:
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = v.text == "1"
                elif t == "str":
                    val = v.text
                else:
                    val = float(v.text)
            cells.append(val)
        out.append(cells)
    width = max(dim_width, max((len(r) for r in out), default=0))
    return [r + [None] * (width - len(r)) for r in out]

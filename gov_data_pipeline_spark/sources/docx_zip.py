"""Pure-stdlib DOCX table codec (SURVEY R7).

The reference parses DOCX tables with python-docx
(``handlers/kyrgyzstan.py:239-247``: ``document.tables`` -> rows ->
``cell.text.strip()``). That library is absent from this runtime, so
``read_docx_tables`` re-implements the same walk over the OOXML parts
directly (``word/document.xml``), including python-docx's two
merged-cell behaviors the reference relies on implicitly:

- ``gridSpan``: a horizontally merged cell repeats its text across the
  spanned grid columns;
- ``vMerge`` continuation: a vertically merged cell repeats the text of
  the cell above at the same grid position.

``write_docx_table`` emits a minimal single-part DOCX for golden tests
(document bytes -> pipeline), valid for this reader and for Word.
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

_NS_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _w(tag: str) -> str:
    return f"{{{_NS_W}}}{tag}"


def _cell_text(tc: ET.Element) -> str:
    """python-docx ``cell.text``: paragraphs joined by newline, runs
    concatenated, tabs/breaks as their characters."""
    paras = []
    for p in tc.findall(_w("p")):
        parts = []
        for node in p.iter():
            if node.tag == _w("t"):
                parts.append(node.text or "")
            elif node.tag == _w("tab"):
                parts.append("\t")
            elif node.tag in (_w("br"), _w("cr")):
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


def read_docx_tables(docx_bytes: bytes) -> list[list[list[str]]]:
    """DOCX bytes -> list of tables, each a list of rows of stripped
    cell strings — the exact shape ``documents.assemble_rows`` ingests."""
    with zipfile.ZipFile(BytesIO(docx_bytes)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(_w("body"))
    if body is None:
        return []
    tables: list[list[list[str]]] = []
    for tbl in body.findall(_w("tbl")):  # top-level tables, doc order
        rows: list[list[str]] = []
        for tr in tbl.findall(_w("tr")):
            cells: list[str] = []
            for tc in tr.findall(_w("tc")):
                pr = tc.find(_w("tcPr"))
                span, vmerge_cont = 1, False
                if pr is not None:
                    gs = pr.find(_w("gridSpan"))
                    if gs is not None:
                        span = int(gs.get(_w("val"), "1"))
                    vm = pr.find(_w("vMerge"))
                    # <w:vMerge/> (no val) or val="continue" continues
                    # the merge started above with val="restart"
                    if vm is not None and vm.get(_w("val"), "continue") == "continue":
                        vmerge_cont = True
                if vmerge_cont and rows:
                    text = rows[-1][len(cells)] if len(cells) < len(rows[-1]) else ""
                else:
                    text = _cell_text(tc).strip()
                cells.extend([text] * span)
            rows.append(cells)
        tables.append(rows)
    return tables


_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_docx_table(rows: list[list[str | None]]) -> bytes:
    """Rows of cell strings -> minimal DOCX bytes with one table.

    ``None`` cells are written as empty text (WordprocessingML has no
    null cell; they read back as ``""``) — matching the XLSX writer's
    tolerance so a NULL-bearing column can feed either codec."""
    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{_esc(c or '')}</w:t></w:r></w:p></w:tc>"
            for c in row
        )
        trs.append(f"<w:tr>{tcs}</w:tr>")
    doc = (
        f"{_DECL}<w:document xmlns:w=\"{_NS_W}\"><w:body>"
        f"<w:tbl>{''.join(trs)}</w:tbl>"
        "<w:p/></w:body></w:document>"
    )
    files = {
        "[Content_Types].xml": (
            f"{_DECL}<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">"
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            f"{_DECL}<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">"
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            "</Relationships>"
        ),
        "word/document.xml": doc,
    }
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in files.items():
            zf.writestr(name, content.encode("utf-8"))
    return buf.getvalue()

"""Pure-stdlib xlsx codec (SURVEY T4, R4, R18).

The runtime has no Excel engine (openpyxl/xlsxwriter), so this module
implements the subset of OOXML SpreadsheetML the pipelines actually
need, with ``zipfile`` + ``xml.etree`` only:

- ``read_xlsx_rows``: workbook bytes -> list of ragged rows (cell text),
  resolving shared strings / inline strings / formula caches;
- ``iter_xlsx_images``: workbook bytes -> embedded images with their
  cell anchors (row, col, rowOff EMU) — the input to the reference's
  anchor-row math (``handlers/base.py:233-239``, re-expressed in
  ``documents.xlsx_image_anchor_row``);
- ``write_xlsx``: rows (+ optional anchored images) -> workbook bytes.
  A minimal single-sheet profile (inline strings) that standard tools
  and this module's own reader both accept; used by the Excel sink and
  by golden tests to round-trip image extraction.

Scale note: workbooks are driver-side small data (one registry file per
country per week in the reference). Large *sets* of workbooks ingest in
parallel — each executor task calls these helpers on its own file's
bytes; nothing here touches a SparkSession.
"""

from __future__ import annotations

import posixpath
import re
import zipfile
from dataclasses import dataclass
from io import BytesIO
from xml.etree import ElementTree as ET

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_PKG_RELS = "http://schemas.openxmlformats.org/package/2006/relationships"
_NS_DOC_RELS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_XDR = "http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing"
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")

_MIME_BY_EXT = {
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".gif": "image/gif",
    ".bmp": "image/bmp",
    ".emf": "image/x-emf",
    ".wmf": "image/x-wmf",
}


@dataclass(frozen=True)
class XlsxImage:
    """An embedded picture and its top-left (``xdr:from``) anchor.

    ``row``/``col`` are 0-based sheet coordinates; ``row_off_emu`` /
    ``col_off_emu`` are the intra-cell offsets in EMUs (914400/inch).
    """

    row: int
    col: int
    row_off_emu: int
    col_off_emu: int
    mime: str
    data: bytes


def _col_to_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _index_to_col(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """Relationship id -> target path (absolute within the package) for
    a part, resolving the sibling ``_rels/<name>.rels`` file."""
    base, name = posixpath.split(part)
    rels_path = posixpath.join(base, "_rels", name + ".rels")
    if rels_path not in zf.namelist():
        return {}
    root = ET.fromstring(zf.read(rels_path))
    out: dict[str, str] = {}
    for rel in root.findall(f"{{{_NS_PKG_RELS}}}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target.lstrip("/")
        else:
            resolved = posixpath.normpath(posixpath.join(base, target))
        out[rel.get("Id", "")] = resolved
    return out


def _sheet_parts(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = _rels(zf, "xl/workbook.xml")
    parts = []
    for sheet in wb.iter(f"{{{_NS_MAIN}}}sheet"):
        rid = sheet.get(f"{{{_NS_DOC_RELS}}}id")
        if rid and rid in rels:
            parts.append(rels[rid])
    if not parts:
        raise ValueError("xlsx: no worksheets found in workbook.xml")
    return parts


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root.findall(f"{{{_NS_MAIN}}}si"):
        # concatenate all <t> descendants (plain and rich-text runs)
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t")))
    return out


def _cell_text(cell: ET.Element, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{{{_NS_MAIN}}}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{{{_NS_MAIN}}}t"))
    v = cell.find(f"{{{_NS_MAIN}}}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # n (number), str (formula cache), e (error): raw text. Date-styled
    # numbers stay as serial text — registry workbooks are all-strings.
    return v.text


def read_xlsx_rows(data: bytes, sheet: int = 0) -> list[list[str | None]]:
    """Workbook bytes -> ragged list-of-rows for the requested sheet.

    Empty leading cells become ``None`` (position is preserved via cell
    references); fully empty rows between populated ones are preserved
    as ``[]`` so ingest-order row indexes stay aligned with the sheet.
    """
    with zipfile.ZipFile(BytesIO(data)) as zf:
        part = _sheet_parts(zf)[sheet]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(part))
        rows: list[list[str | None]] = []
        last_row = 0
        for row_el in root.iter(f"{{{_NS_MAIN}}}row"):
            r = int(row_el.get("r", last_row + 1))
            while last_row < r - 1:  # gap rows
                rows.append([])
                last_row += 1
            cells: list[str | None] = []
            next_col = 0
            for cell in row_el.findall(f"{{{_NS_MAIN}}}c"):
                ref = cell.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    if not m:
                        raise ValueError(f"xlsx: bad cell ref {ref!r}")
                    col = _col_to_index(m.group(1))
                else:
                    col = next_col
                while len(cells) < col:
                    cells.append(None)
                text = _cell_text(cell, shared)
                if len(cells) == col:
                    cells.append(text)
                else:
                    cells[col] = text
                next_col = col + 1
            rows.append(cells)
            last_row = r
        return rows


def iter_xlsx_images(data: bytes, sheet: int = 0) -> list[XlsxImage]:
    """R18 extraction walk (reference ``handlers/base.py:224-249``):
    sheet -> drawing part -> anchored pictures -> media bytes."""
    out: list[XlsxImage] = []
    with zipfile.ZipFile(BytesIO(data)) as zf:
        part = _sheet_parts(zf)[sheet]
        sheet_root = ET.fromstring(zf.read(part))
        sheet_rels = _rels(zf, part)
        for drawing_el in sheet_root.findall(f"{{{_NS_MAIN}}}drawing"):
            rid = drawing_el.get(f"{{{_NS_DOC_RELS}}}id")
            drawing_part = sheet_rels.get(rid or "")
            if not drawing_part or drawing_part not in zf.namelist():
                continue
            droot = ET.fromstring(zf.read(drawing_part))
            drels = _rels(zf, drawing_part)
            for anchor in list(droot):
                frm = anchor.find(f"{{{_NS_XDR}}}from")
                if frm is None:
                    continue

                def _ival(parent: ET.Element, tag: str) -> int:
                    el = parent.find(f"{{{_NS_XDR}}}{tag}")
                    return int(el.text) if el is not None and el.text else 0

                blip = anchor.find(
                    f"{{{_NS_XDR}}}pic/{{{_NS_XDR}}}blipFill/{{{_NS_A}}}blip"
                )
                if blip is None:
                    continue
                embed = blip.get(f"{{{_NS_DOC_RELS}}}embed")
                media = drels.get(embed or "")
                if not media or media not in zf.namelist():
                    continue
                ext = posixpath.splitext(media)[1].lower()
                out.append(
                    XlsxImage(
                        row=_ival(frm, "row"),
                        col=_ival(frm, "col"),
                        row_off_emu=_ival(frm, "rowOff"),
                        col_off_emu=_ival(frm, "colOff"),
                        mime=_MIME_BY_EXT.get(ext, "application/octet-stream"),
                        data=zf.read(media),
                    )
                )
    return out


# ---------------------------------------------------------------------------
# writer


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'


def write_xlsx(
    rows: list[list[str | None]],
    images: list[tuple[int, int, int, bytes]] | None = None,
    sheet_name: str = "Sheet1",
) -> bytes:
    """Rows (+ optional anchored PNGs) -> minimal valid workbook bytes.

    ``images`` entries are ``(row, col, row_off_emu, png_bytes)`` with
    0-based sheet coordinates, matching ``XlsxImage`` so extraction
    round-trips. Cells are written as inline strings — the profile the
    stdlib reader, openpyxl and Excel itself all accept.
    """
    images = images or []
    sheet_rows = []
    for ri, row in enumerate(rows):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_index_to_col(ci)}{ri + 1}"
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_esc(str(val))}</t></is></c>"
            )
        sheet_rows.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    drawing_ref = '<drawing r:id="rIdD"/>' if images else ""
    sheet_xml = (
        f"{_DECL}<worksheet xmlns=\"{_NS_MAIN}\" xmlns:r=\"{_NS_DOC_RELS}\">"
        f"<sheetData>{''.join(sheet_rows)}</sheetData>{drawing_ref}</worksheet>"
    )

    files: dict[str, str | bytes] = {
        "[Content_Types].xml": (
            f"{_DECL}<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">"
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="png" ContentType="image/png"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            + (
                '<Override PartName="/xl/drawings/drawing1.xml" ContentType="application/vnd.openxmlformats-officedocument.drawing+xml"/>'
                if images
                else ""
            )
            + "</Types>"
        ),
        "_rels/.rels": (
            f"{_DECL}<Relationships xmlns=\"{_NS_PKG_RELS}\">"
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            f"{_DECL}<workbook xmlns=\"{_NS_MAIN}\" xmlns:r=\"{_NS_DOC_RELS}\">"
            f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            f"{_DECL}<Relationships xmlns=\"{_NS_PKG_RELS}\">"
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": sheet_xml,
    }
    if images:
        anchors = []
        media_rels = []
        for i, (row, col, row_off, png) in enumerate(images):
            rid = f"rIdImg{i + 1}"
            anchors.append(
                f'<xdr:oneCellAnchor><xdr:from><xdr:col>{col}</xdr:col>'
                f"<xdr:colOff>0</xdr:colOff><xdr:row>{row}</xdr:row>"
                f"<xdr:rowOff>{row_off}</xdr:rowOff></xdr:from>"
                f'<xdr:ext cx="914400" cy="914400"/>'
                f"<xdr:pic><xdr:nvPicPr>"
                f'<xdr:cNvPr id="{i + 1}" name="Picture {i + 1}"/>'
                f"<xdr:cNvPicPr/></xdr:nvPicPr><xdr:blipFill>"
                f'<a:blip r:embed="{rid}"/><a:stretch/></xdr:blipFill>'
                f"<xdr:spPr/></xdr:pic><xdr:clientData/></xdr:oneCellAnchor>"
            )
            media_rels.append(
                f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="../media/image{i + 1}.png"/>'
            )
            files[f"xl/media/image{i + 1}.png"] = png
        files["xl/drawings/drawing1.xml"] = (
            f"{_DECL}<xdr:wsDr xmlns:xdr=\"{_NS_XDR}\" xmlns:a=\"{_NS_A}\" "
            f"xmlns:r=\"{_NS_DOC_RELS}\">{''.join(anchors)}</xdr:wsDr>"
        )
        files["xl/drawings/_rels/drawing1.xml.rels"] = (
            f"{_DECL}<Relationships xmlns=\"{_NS_PKG_RELS}\">"
            f"{''.join(media_rels)}</Relationships>"
        )
        files["xl/worksheets/_rels/sheet1.xml.rels"] = (
            f"{_DECL}<Relationships xmlns=\"{_NS_PKG_RELS}\">"
            '<Relationship Id="rIdD" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/drawing" Target="../drawings/drawing1.xml"/>'
            "</Relationships>"
        )

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in files.items():
            zf.writestr(
                name,
                content if isinstance(content, bytes) else content.encode("utf-8"),
            )
    return buf.getvalue()

"""Minimal pure-stdlib PDF text/table extraction (SURVEY R6).

The reference shipped PDF pages to an external pdf2docx web service
(``utils/pdf2docx.py:54-212``) and parsed the returned DOCX. This
engine deliberately keeps the data path local; when pdfplumber is
absent (this runtime), this module extracts positioned text directly
from the PDF:

- objects are located by scanning ``N G obj ... endobj`` (no xref
  needed — tolerant of linearized/appended files);
- ``FlateDecode`` streams are inflated with ``zlib``; uncompressed
  streams pass through;
- content streams are tokenized and the text operators interpreted
  (``BT/ET``, ``Tm/Td/TD/T*``, ``Tf``, ``Tj/TJ/'/\"``), recording each
  run's (x, y, text);
- runs cluster into rows by y and columns by x, yielding the
  list-of-rows shape ``documents.assemble_rows`` ingests.

Supported profile (documented, not hidden): single content stream per
page object, Flate or plain streams, literal ``(..)`` strings in
latin-1 or UTF-16BE-with-BOM and hex ``<..>`` strings. That covers
simple generated registry tables; scanned/CID-font PDFs need a real
decoder — ``documents.pdf_tables`` prefers pdfplumber when importable.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj(.*?)endobj", re.DOTALL)


@dataclass(frozen=True)
class TextRun:
    x: float
    y: float
    text: str


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1", errors="replace")


def _content_streams(pdf: bytes) -> list[bytes]:
    """All decoded stream payloads that look like content (contain BT)."""
    out = []
    for m in _OBJ_RE.finditer(pdf):
        body = m.group(1)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        data = sm.group(1)
        if b"/FlateDecode" in body.split(b"stream")[0]:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" in data:
            out.append(data)
    return out


def _tokenize(stream: bytes):
    """Yield ('str', bytes) | ('num', float) | ('name'/'op', str) |
    ('arr_open'/'arr_close', None) tokens from a content stream."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"(":
            depth, j, buf = 1, i + 1, bytearray()
            while j < n and depth:
                ch = stream[j : j + 1]
                if ch == b"\\" and j + 1 < n:
                    nxt = stream[j + 1 : j + 2]
                    esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                           b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
                    if nxt in esc:
                        buf += esc[nxt]
                        j += 2
                        continue
                    if nxt.isdigit():  # octal escape \ddd
                        oct_digits = stream[j + 1 : j + 4]
                        k = 1
                        while k <= 3 and stream[j + k : j + k + 1].isdigit():
                            k += 1
                        buf.append(int(oct_digits[: k - 1], 8) & 0xFF)
                        j += k
                        continue
                    if nxt in (b"\r", b"\n"):
                        # backslash-newline is a LINE CONTINUATION: both
                        # the backslash and the EOL (CR, LF, or CRLF)
                        # disappear from the decoded string
                        j += 2
                        if nxt == b"\r" and stream[j : j + 1] == b"\n":
                            j += 1
                        continue
                    j += 1  # unknown escape: backslash dropped, char kept
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if not depth:
                        break
                buf += ch
                j += 1
            yield ("str", bytes(buf))
            i = j + 1
        elif c == b"<" and stream[i + 1 : i + 2] != b"<":
            j = stream.find(b">", i)
            hexs = re.sub(rb"\s", b"", stream[i + 1 : j if j != -1 else n])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode("ascii", "ignore")))
            i = (j + 1) if j != -1 else n
        elif c == b"<":  # dict <<..>> — skip balanced
            depth, j = 0, i
            while j < n - 1:
                if stream[j : j + 2] == b"<<":
                    depth += 1
                    j += 2
                elif stream[j : j + 2] == b">>":
                    depth -= 1
                    j += 2
                    if not depth:
                        break
                else:
                    j += 1
            i = j
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            m = re.match(rb"/[^\s()<>\[\]/]*", stream[i:])
            yield ("name", m.group(0).decode("latin-1"))
            i += m.end()
        else:
            m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", stream[i:])
            if m:
                yield ("num", float(m.group(0)))
                i += m.end()
            else:
                m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
                if m:
                    yield ("op", m.group(0).decode("latin-1"))
                    i += m.end()
                else:
                    i += 1  # unknown byte


def pdf_text_runs(pdf_bytes: bytes) -> list[TextRun]:
    """Positioned text runs across all content streams, in paint order."""
    runs: list[TextRun] = []
    for stream in _content_streams(pdf_bytes):
        x = y = 0.0
        line_x = line_y = 0.0
        leading = 0.0
        stack: list[float | bytes] = []
        in_array: list[bytes] = []
        collecting = False
        for kind, val in _tokenize(stream):
            if kind == "arr_open":
                collecting, in_array = True, []
            elif kind == "arr_close":
                collecting = False
                stack.append(b"".join(in_array))
            elif kind == "str":
                if collecting:
                    in_array.append(val)
                else:
                    stack.append(val)
            elif kind == "num":
                if not collecting:  # TJ kern numbers are ignored
                    stack.append(val)
            elif kind == "name":
                stack.append(val.encode("latin-1"))
            elif kind == "op":
                op = val
                if op == "BT":
                    x = y = line_x = line_y = 0.0
                elif op == "Tm" and len(stack) >= 6:
                    line_x, line_y = float(stack[-2]), float(stack[-1])
                    x, y = line_x, line_y
                elif op in ("Td", "TD") and len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    line_x, line_y = line_x + tx, line_y + ty
                    x, y = line_x, line_y
                    if op == "TD":
                        leading = -ty
                elif op == "TL" and stack:
                    leading = float(stack[-1])
                elif op == "T*":
                    line_y -= leading
                    x, y = line_x, line_y
                elif op in ("Tj", "'", '"') and stack:
                    raw = stack[-1]
                    if op in ("'", '"'):
                        line_y -= leading
                        x, y = line_x, line_y
                    if isinstance(raw, bytes):
                        text = _decode_pdf_string(raw)
                        if text:
                            runs.append(TextRun(x, y, text))
                elif op == "TJ" and stack and isinstance(stack[-1], bytes):
                    text = _decode_pdf_string(stack[-1])
                    if text:
                        runs.append(TextRun(x, y, text))
                stack = []
        # next stream restarts state
    return runs


def pdf_table(
    pdf_bytes: bytes, row_tol: float = 2.0, col_tol: float = 5.0
) -> list[list[str]]:
    """Cluster positioned runs into a grid: rows by y (descending, PDF
    origin is bottom-left), columns by x-position clusters shared across
    the whole page set."""
    runs = pdf_text_runs(pdf_bytes)
    if not runs:
        return []
    xs: list[float] = []
    for r in sorted(runs, key=lambda r: r.x):
        if not xs or r.x - xs[-1] > col_tol:
            xs.append(r.x)
    rows: dict[float, dict[int, list[str]]] = {}
    row_keys: list[float] = []
    for r in runs:
        key = next((k for k in row_keys if abs(k - r.y) <= row_tol), None)
        if key is None:
            key = r.y
            row_keys.append(key)
        col = min(range(len(xs)), key=lambda i: abs(xs[i] - r.x))
        rows.setdefault(key, {}).setdefault(col, []).append(r.text)
    out = []
    for key in sorted(rows, reverse=True):
        by_col = rows[key]
        width = max(by_col) + 1
        out.append(
            ["".join(by_col.get(c, [])).strip() for c in range(width)]
        )
    return out


def write_simple_pdf(rows: list[list[str]], col_width: float = 120.0) -> bytes:
    """Golden-test fixture writer: one page, one Flate content stream,
    one text run per cell (UTF-16BE hex strings, so Cyrillic survives).
    Exercises the same profile ``pdf_table`` parses."""
    parts = [b"BT /F1 10 Tf"]
    top = 780.0
    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            if not cell:
                continue
            hexs = (b"\xfe\xff" + cell.encode("utf-16-be")).hex().upper()
            x, y = 40 + ci * col_width, top - ri * 14
            parts.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm".encode())
            parts.append(b"<" + hexs.encode() + b"> Tj")
    parts.append(b"ET")
    content = zlib.compress(b"\n".join(parts))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, obj)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)

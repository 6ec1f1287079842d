"""Stdlib image helpers (SURVEY R18/R29).

The runtime has no PIL, but two of the three things the reference used
it for need no codec at all:

- **fixture generation / sinks**: ``encode_png`` writes a real PNG
  (signature + IHDR + zlib IDAT + IEND) from RGB rows;
- **metadata**: ``image_info`` reads width/height/format straight from
  the container headers (PNG IHDR, JPEG SOFn, GIF logical screen),
  which is all the multimodal ``meta`` map needs.

The third — re-encoding arbitrary formats to PNG (reference
``utils/gpt.py:54-70``) — genuinely needs a decoder, so
``image_to_data_uri`` passes PNG through byte-identical, uses PIL when
importable, and otherwise falls back to a correctly-typed data URI of
the original bytes (documented divergence: the reference returned ""
on failure; dropping the payload loses data and hides the gap).
"""

from __future__ import annotations

import base64
import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """RGB rows -> PNG bytes (8-bit truecolor, no interlace)."""
    if not pixels or not pixels[0]:
        raise ValueError("encode_png: empty pixel rows")
    height, width = len(pixels), len(pixels[0])
    raw = b"".join(
        b"\x00" + b"".join(struct.pack("BBB", *px) for px in row)
        for row in pixels
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def solid_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Deterministic solid-color PNG — the golden-test fixture image."""
    return encode_png([[rgb] * width for _ in range(height)])


def build_minimal_jpeg(width: int, height: int) -> bytes:
    """Smallest well-formed JFIF skeleton carrying real dimensions:
    SOI + APP0/JFIF + SOF0 + EOI. The golden fixture for the JPEG
    branch of :func:`image_info` — dimensions live in the SOF0 frame
    header at a data-dependent offset (after the APP0 segment), so a
    prober that merely slices fixed offsets cannot read them."""
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def image_info(data: bytes) -> dict[str, str] | None:
    """Container-header probe: ``{format, width, height}`` for
    PNG/JPEG/GIF, else None. No decode, O(header) work."""
    if data[:8] == PNG_MAGIC and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return {"format": "png", "width": str(w), "height": str(h)}
    if data[:3] == b"GIF" and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": str(w), "height": str(h)}
    if data[:2] == b"\xff\xd8":  # JPEG: scan for a frame (SOFn) marker
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return {"format": "jpeg", "width": str(w), "height": str(h)}
            i += 2 + seg_len
    return None


def sniff_mime(data: bytes) -> str:
    info = image_info(data)
    if info:
        return f"image/{info['format']}"
    return "application/octet-stream"


def image_to_data_uri(data: bytes) -> str:
    """Re-expression of the reference's ``image_to_base64``
    (``utils/gpt.py:54-70``): PNG bytes pass through; other formats are
    transcoded to PNG when PIL is importable, else emitted as a data URI
    of their sniffed mime (honest no-codec fallback)."""
    if data[:8] == PNG_MAGIC:
        return "data:image/png;base64," + base64.b64encode(data).decode("ascii")
    try:  # pragma: no cover - runtime lacks PIL; fallback path is tested
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.open(io.BytesIO(data)).save(buf, format="PNG")
        return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode(
            "ascii"
        )
    except ImportError:
        return f"data:{sniff_mime(data)};base64," + base64.b64encode(data).decode(
            "ascii"
        )

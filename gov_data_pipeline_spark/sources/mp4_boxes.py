"""Minimal ISO-BMFF (MP4) box walker — container METADATA without any
codec: duration, track count, and per-track dimensions read straight
from the box structure (public ISO/IEC 14496-12 layout). This is the
video sibling of ``png_codec.image_info``: at corpus scale the
metadata pass must not decode (and this runtime has no decode libs —
frame extraction stays PyAV-gated in ``sources/multimodal.py``), but
box-structure metadata needs only stdlib ``struct``.

Also carries ``build_minimal_mp4`` — a deterministic, spec-shaped
fixture builder (ftyp + moov/mvhd + N·trak/tkhd) used by the oracle
queries and golden tests, so the walker is exercised on real
length-prefixed nested boxes rather than hand-waved blobs.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + kind + payload


def build_minimal_mp4(
    duration_ms: int, width: int, height: int, n_tracks: int = 1
) -> bytes:
    """Spec-shaped minimal MP4: ftyp, then moov{mvhd, n·trak{tkhd}}.

    mvhd v0 with timescale 1000 (so duration units == ms); tkhd v0
    with 16.16 fixed-point width/height. No media data — this is the
    metadata skeleton a prober must understand.
    """
    mvhd = (
        b"\x00" + b"\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime, mtime
        + struct.pack(">I", 1000)  # timescale: 1 unit = 1 ms
        + struct.pack(">I", duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", n_tracks + 1)  # next_track_id
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = (
            b"\x00" + b"\x00\x00\x07"  # version 0 + flags (enabled)
            + struct.pack(">II", 0, 0)  # ctime, mtime
            + struct.pack(">I", tid)  # track id
            + b"\x00" * 4  # reserved
            + struct.pack(">I", duration_ms)
            + b"\x00" * 8  # reserved
            + struct.pack(">hh", 0, 0)  # layer, alternate_group
            + struct.pack(">h", 0)  # volume (video track)
            + b"\x00" * 2  # reserved
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
        )
        traks += _box(b"trak", _box(b"tkhd", tkhd))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    return ftyp + moov


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (kind, payload_start, payload_end) for each box in
    [start, end); descends are the caller's choice via the offsets.
    Tolerates truncated tails (stops instead of raising) — corpus
    files are sometimes cut mid-upload, and a prober must survive."""
    end = len(data) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < header or pos + size > end:
            return  # malformed/truncated — stop, don't throw
        yield kind, pos + header, pos + size
        pos += size


def mp4_metadata(data: bytes) -> dict[str, int] | None:
    """``{duration_ms, n_tracks, width, height}`` from the moov tree,
    or None when the bytes carry no top-level ``moov`` box (the only
    required box: a bare movie header still probes — ftyp-less
    fragments exist in the wild — while a moov-less blob has no
    metadata to read). Width/height come from the FIRST track with a non-zero
    tkhd size (the presentation track); duration from mvhd rescaled
    to ms. O(metadata bytes) — media payloads are never touched."""
    moov_span = None
    for kind, a, b in walk_boxes(data):
        if kind == b"moov":
            moov_span = (a, b)
    if moov_span is None:
        return None
    duration_ms = 0
    n_tracks = 0
    width = height = 0
    for kind, a, b in walk_boxes(data, *moov_span):
        if kind == b"mvhd" and b - a >= 20:
            version = data[a]
            if version == 1:
                timescale, dur = struct.unpack(">IQ", data[a + 20 : a + 32])
            else:
                timescale, dur = struct.unpack(">II", data[a + 12 : a + 20])
            if timescale:
                duration_ms = dur * 1000 // timescale
        elif kind == b"trak":
            n_tracks += 1
            for k2, c, d in walk_boxes(data, a, b):
                if k2 == b"tkhd" and d - c >= 8:
                    w16, h16 = struct.unpack(">II", data[d - 8 : d])
                    if (width, height) == (0, 0) and (w16 or h16):
                        width, height = w16 >> 16, h16 >> 16
    return {
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }

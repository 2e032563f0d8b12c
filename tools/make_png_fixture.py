"""Generate the checked-in PNG test fixtures (tests/fixtures/*.png) with
a pure-stdlib encoder.  Kept for provenance: the fixtures are REAL,
spec-conformant PNGs (zlib-deflated scanlines, CRC-correct chunks), and
each scanline cycles through a DIFFERENT filter type (None/Sub/Up/
Average/Paeth) so the decoder's whole unfilter path is exercised.

Usage: python tools/make_png_fixture.py   (rewrites tests/fixtures/)
"""

from __future__ import annotations

import os
import struct
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = cur[i]
        elif ftype == 1:
            out[i] = (cur[i] - a) & 0xFF
        elif ftype == 2:
            out[i] = (cur[i] - b) & 0xFF
        elif ftype == 3:
            out[i] = (cur[i] - (a + b) // 2) & 0xFF
        else:
            out[i] = (cur[i] - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def encode_png(rows: list[list[tuple[int, ...]]], color: int) -> bytes:
    """rows[y][x] = pixel tuple; color 0=gray(1ch) 2=RGB(3ch) 6=RGBA."""
    channels = {0: 1, 2: 3, 6: 4}[color]
    h, w = len(rows), len(rows[0])
    raw = bytearray()
    prev = bytes(w * channels)
    for y, rowpx in enumerate(rows):
        cur = bytes(v for px in rowpx for v in px)
        ftype = y % 5  # cycle every filter type
        raw += bytes([ftype]) + _filter_scanline(ftype, cur, prev, channels)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def gradient_rgb(w: int = 16, h: int = 12) -> list[list[tuple[int, ...]]]:
    return [
        [((x * 16) % 256, (y * 21) % 256, (x * y) % 256) for x in range(w)]
        for y in range(h)
    ]


def checker_gray(w: int = 9, h: int = 7) -> list[list[tuple[int, ...]]]:
    return [[(255 if (x + y) % 2 else 0,) for x in range(w)] for y in range(h)]


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    for name, rows, color in (
        ("gradient_rgb.png", gradient_rgb(), 2),
        ("checker_gray.png", checker_gray(), 0),
    ):
        data = encode_png(rows, color)
        with open(os.path.join(FIXDIR, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()

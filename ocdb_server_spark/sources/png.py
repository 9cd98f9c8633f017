"""PNG codec (8-bit grayscale) in numpy + stdlib zlib — the second
compressed image format after sources/jpeg.py, and the LOSSLESS one:
decode returns byte-exact pixels, so op205's oracle certifies the full
chunk-walk → inflate → de-filter pipeline pixel-for-pixel (no
coefficient-domain indirection needed).

Public specification (RFC 2083 / W3C PNG): 8-byte signature, IHDR
(width, height, bit depth 8, color type 0 = grayscale), IDAT carrying
a zlib stream of filtered scanlines (one filter-type byte per row),
IEND; CRC32 per chunk (zlib.crc32). All five filter types (None, Sub,
Up, Average, Paeth) are implemented both directions; the op's encoder
cycles through them row by row so the decoder's reconstruction of
every filter is load-bearing in the certified hash.

Interop: tests/test_codecs.py round-trips against javax.imageio
(JDK 17) in BOTH directions — our bytes decode there pixel-exact, its
bytes decode here pixel-exact (lossless formats permit the exact
two-way check that JPEG's IDCT tolerance does not).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_PAETH_V = np.frompyfunc(_paeth, 3, 1)


def encode_png_gray(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """8-bit grayscale PNG. `filters` optionally fixes the per-row
    filter type (0-4); default cycles 0,1,2,3,4,0,... so every filter
    is exercised. pixels is (h, w) uint8."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    if filters is None:
        filters = [r % 5 for r in range(h)]
    if len(filters) != h:
        raise ValueError("one filter type per row required")
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        cur = px[r].astype(np.int64)
        ft = filters[r]
        if ft == 0:  # None
            out = cur
        elif ft == 1:  # Sub
            out = cur - np.concatenate(([0], cur[:-1]))
        elif ft == 2:  # Up
            out = cur - prev
        elif ft == 3:  # Average
            out = cur - (np.concatenate(([0], cur[:-1])) + prev) // 2
        elif ft == 4:  # Paeth
            a = np.concatenate(([0], cur[:-1]))
            c = np.concatenate(([0], prev[:-1]))
            out = cur - _PAETH_V(a, prev, c).astype(np.int64)
        else:
            raise ValueError(f"invalid filter type {ft}")
        raw.append(ft)
        raw.extend((out & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse an 8-bit grayscale PNG (color type 0, no interlace).
    Walks chunks (verifying CRCs), concatenates IDAT, inflates,
    reconstructs every filter type. Returns (w, h, (h, w) uint8)."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        # bounds BEFORE slicing: a truncated chunk would otherwise
        # leak struct.error out of the CRC unpack (truncation fuzz)
        if pos + 12 + length > len(payload):
            raise ValueError("png: truncated chunk")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("png: bad IHDR length")
            w, h, depth, ctype_col, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype_col != 0:
                raise ValueError("only 8-bit grayscale supported")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported compression/filter/interlace")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # same loud taxonomy as the CRC path
        raise ValueError(f"png: corrupt IDAT stream: {exc}")
    if len(raw) != h * (w + 1):
        raise ValueError("decompressed size mismatch")
    px = np.zeros((h, w), dtype=np.int64)
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        row = raw[r * (w + 1) : (r + 1) * (w + 1)]
        ft = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if ft == 0:
            out = cur
        elif ft == 1:
            out = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (cur[x] + left) & 0xFF
                out[x] = left
        elif ft == 2:
            out = (cur + prev) & 0xFF
        elif ft == 3:
            out = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (cur[x] + (left + prev[x]) // 2) & 0xFF
                out[x] = left
        elif ft == 4:
            out = np.zeros(w, dtype=np.int64)
            left = c_diag = 0
            for x in range(w):
                left = (cur[x] + _paeth(left, int(prev[x]), c_diag)) & 0xFF
                c_diag = int(prev[x])
                out[x] = left
        else:
            raise ValueError(f"invalid filter type {ft}")
        px[r] = out
        prev = out
    return w, h, px.astype(np.uint8)

"""GIF codec (8-bit grayscale palette) in pure python/numpy — the
third compressed image format after sources/jpeg.py (lossy DCT) and
sources/png.py (DEFLATE), adding the remaining classic compression
family: LZW with variable-width codes (GIF89a, public specification;
LZW's patents expired 2003-2004 worldwide).

Scope: single-image, non-interlaced, 256-entry global color table
fixed to grayscale (palette[i] = (i, i, i)) so a pixel's palette
INDEX is its gray value — lossless by construction, which lets op222
certify the whole container walk + LZW decode pixel-for-pixel against
a closed-form oracle (op205's PNG pattern).

The encoder performs REAL LZW compression (prefix-dict growth, code
width 9→12, CLEAR emitted on table overflow), so the decoder's
dictionary reconstruction — including the KwKwK self-referential case
and every width transition — is load-bearing in the certified hash.

Width-transition semantics (the classic GIF off-by-one): the decoder
adds its dictionary entry one code BEHIND the encoder, so the two
sides bump the code width under different-looking conditions that are
actually the same instant in the code stream:
  encoder: before emitting, while next_code > max_code(width) → width+1
  decoder: after adding,   when next_code == max_code(width)+1 → width+1
Both are validated against JDK-17 javax.imageio in BOTH directions in
tests/test_codecs.py (our bytes there / its bytes here, pixel-exact).
"""

from __future__ import annotations

import struct

import numpy as np

_MIN_CODE_SIZE = 8  # 256-color palette
_CLEAR = 1 << _MIN_CODE_SIZE  # 256
_EOI = _CLEAR + 1  # 257
_FIRST_FREE = _EOI + 1  # 258
_MAX_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_WIDTH  # 4096


class _BitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: np.ndarray) -> bytes:
    """Real LZW compression of a palette-index stream (GIF variant)."""
    bw = _BitWriter()
    width = _MIN_CODE_SIZE + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(_CLEAR)}
    next_code = _FIRST_FREE
    bw.write(_CLEAR, width)
    cur = b""
    for v in indices.tobytes():
        cand = cur + bytes([v])
        if cand in table:
            cur = cand
            continue
        # emit: widen first if the code ABOUT TO BE VALID wouldn't fit
        while next_code > (1 << width) and width < _MAX_WIDTH:
            width += 1
        bw.write(table[cur], width)
        if next_code < _TABLE_LIMIT:
            table[cand] = next_code
            next_code += 1
        else:
            bw.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(_CLEAR)}
            next_code = _FIRST_FREE
            width = _MIN_CODE_SIZE + 1
        cur = bytes([v])
    if cur:
        while next_code > (1 << width) and width < _MAX_WIDTH:
            width += 1
        bw.write(table[cur], width)
    bw.write(_EOI, width)
    return bw.flush()


def _lzw_decode(data: bytes, n_expected: int) -> bytes:
    """Full GIF LZW decode: dictionary reconstruction, KwKwK case,
    width transitions, CLEAR handling. Returns the index stream."""
    br = _BitReader(data)
    out = bytearray()

    def fresh() -> tuple[list[bytes], int, int]:
        return [bytes([i]) for i in range(_CLEAR)] + [b"", b""], _FIRST_FREE, _MIN_CODE_SIZE + 1

    table, next_code, width = fresh()
    prev: bytes | None = None
    while len(out) < n_expected:
        code = br.read(width)
        if code == _CLEAR:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= _CLEAR:
                raise ValueError("first code after clear must be literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # KwKwK: code not yet in the table
        else:
            raise ValueError(f"corrupt LZW stream (code {code} > {next_code})")
        out.extend(entry)
        if prev is not None and next_code < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            next_code += 1
            # bump when the table FILLS the current width; because the
            # decoder adds entries one code behind the encoder, this
            # "==" pairs exactly with the encoder's strict ">" check
            # (pinned against javax.imageio's encoder in test_codecs)
            if next_code == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """Single-image GIF89a with a 256-entry grayscale global color
    table; pixels is (h, w) uint8 of palette indices (= gray values)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    out = bytearray()
    out.extend(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    for i in range(256):  # grayscale GCT
        out.extend((i, i, i))
    # image descriptor (no local color table, not interlaced)
    out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
    out.append(_MIN_CODE_SIZE)
    out.extend(_sub_blocks(_lzw_encode(px.reshape(-1))))
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif_anim(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Multi-frame (animated) GIF89a: NETSCAPE 2.0 looping application
    extension, then per frame a Graphic Control Extension (delay in
    centiseconds) + full-screen image descriptor + LZW data. All
    frames must share one (h, w); palette is the grayscale GCT, so —
    like encode_gif_gray — the stream is lossless by construction and
    a frame's palette index IS its gray value."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = np.asarray(frames[0]).shape
    out = bytearray()
    out.extend(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    for i in range(256):  # grayscale GCT
        out.extend((i, i, i))
    # NETSCAPE looping extension — an application-extension block the
    # decoder must skip purely by sub-block grammar (coverage of the
    # 0x21/0xFF path the single-image encoder never emits)
    out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for frame in frames:
        px = np.asarray(frame, dtype=np.uint8)
        if px.shape != (h, w):
            raise ValueError("all frames must share one (h, w)")
        # graphic control extension: no disposal, no transparency
        out.extend(struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0))
        out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
        out.append(_MIN_CODE_SIZE)
        out.extend(_sub_blocks(_lzw_encode(px.reshape(-1))))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[tuple[int, int, np.ndarray]]:
    """Parse a GIF87a/89a stream and decode its image descriptors in
    order (up to ``max_frames``): header, screen descriptor, color
    tables, extensions skipped by sub-block grammar. Returns a list of
    (w, h, pixels) per frame, pixels as GRAY values via the palette
    (non-grayscale palettes rejected — asserted like the single-image
    path)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")

    def _byte(i: int) -> int:
        # every cursor read goes through here: a truncated stream
        # must raise the module's loud ValueError, not IndexError
        # (truncation fuzz)
        if i >= len(payload):
            raise ValueError("gif: truncated stream")
        return payload[i]

    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    frames: list[tuple[int, int, np.ndarray]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            while _byte(pos) != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("gif: truncated image descriptor")
            _l, _t, w, h, ipack = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            interlaced = bool(ipack & 0x40)
            pal = palette
            if ipack & 0x80:  # local color table overrides
                n = 2 << (ipack & 0x07)
                pal = np.frombuffer(
                    payload[pos : pos + 3 * n], np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            min_code = _byte(pos)
            pos += 1
            if min_code != _MIN_CODE_SIZE:
                raise ValueError(f"only {_MIN_CODE_SIZE}-bit palettes supported")
            data = bytearray()
            while _byte(pos) != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(data), w * h), np.uint8)
            if len(idx) != w * h:
                raise ValueError("decoded pixel count mismatch")
            if len(idx) and int(idx.max()) >= len(pal):
                # LZW output is 8-bit codes but the color table may be
                # smaller; unvalidated indexing leaks numpy IndexError
                # (review finding)
                raise ValueError("gif: pixel index outside color table")
            if not (pal[:, 0] == pal[:, 1]).all() or not (
                pal[:, 1] == pal[:, 2]
            ).all():
                raise ValueError("non-grayscale palette")
            gray = pal[idx, 0].reshape(h, w)
            if interlaced:
                # GIF 4-pass interlace: stored row r goes to display
                # row order (0,8,16..),(4,12..),(2,6..),(1,3,5..)
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                out = np.empty_like(gray)
                out[np.array(order, dtype=np.int64)] = gray
                gray = out
            frames.append((w, h, gray))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected block 0x{b0:02x}")
    if not frames:
        raise ValueError("no image data found")
    return frames


def decode_gif_gray(payload: bytes) -> tuple[int, int, np.ndarray]:
    """First-image decode (the single-image API op222 and the
    javax.imageio interop tests use): identical walk to
    decode_gif_frames, stopping at the first image descriptor."""
    return decode_gif_frames(payload, max_frames=1)[0]

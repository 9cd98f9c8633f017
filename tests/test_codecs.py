"""Codec round-trips + third-party interop for sources/codecs.py.

The WAV interop tests are the load-bearing ones: they prove the
decoder parses REAL files (stdlib `wave` encoder output, which adds
nothing beyond the canonical layout but is an independent
implementation) and that our encoder's bytes are accepted by an
independent parser — i.e. these are genuinely the public formats, not
a private container format."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from ocdb_server_spark.sources.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def _samples(n=777, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32767, size=n, dtype=np.int16)


def test_wav_roundtrip():
    s = _samples()
    rate, ch, n, back = decode_wav(encode_wav(s, 8000))
    assert (rate, ch, n) == (8000, 1, len(s))
    assert np.array_equal(back, s)


def test_wav_decodes_stdlib_wave_output():
    s = _samples(1234, seed=9)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(s.tobytes())
    rate, ch, n, back = decode_wav(buf.getvalue())
    assert (rate, ch, n) == (16000, 1, len(s))
    assert np.array_equal(back, s)


def test_stdlib_wave_decodes_our_encoder():
    s = _samples(500, seed=3)
    with wave.open(io.BytesIO(encode_wav(s, 22050)), "rb") as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == len(s)
        assert np.array_equal(
            np.frombuffer(w.readframes(len(s)), dtype="<i2"), s
        )


def test_wav_chunk_walker_skips_extra_chunks():
    """Real encoders often append LIST/INFO chunks; the walker must
    step over them (word-aligned) and still find fmt/data."""
    s = _samples(100, seed=1)
    base = encode_wav(s, 8000)
    # splice a LIST chunk with odd size (forces the alignment path)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:12] + extra + base[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, n, back = decode_wav(spliced)
    assert (rate, n) == (8000, 100)
    assert np.array_equal(back, s)


def test_bmp_roundtrip_odd_width():
    """Width 3 → 9-byte rows pad to 12: exercises the padding math."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    w, h, back = decode_bmp(encode_bmp(px))
    assert (w, h) == (3, 5)
    assert np.array_equal(back, px)


def test_bmp_header_fields_are_spec_conformant():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    b = encode_bmp(px)
    assert b[:2] == b"BM"
    assert struct.unpack_from("<I", b, 10)[0] == 54  # pixel data offset
    assert struct.unpack_from("<I", b, 14)[0] == 40  # BITMAPINFOHEADER
    assert struct.unpack_from("<H", b, 28)[0] == 24  # bpp
    assert struct.unpack_from("<I", b, 30)[0] == 0   # BI_RGB


def test_bmp_top_down_variant():
    """Negative height = top-down rows; decoder must normalize."""
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    # encode px[::-1]: the file's physical row order becomes px's
    # top-to-bottom order; marking the height negative then declares
    # that physical order IS top-down, so the decode yields px itself
    b = bytearray(encode_bmp(px[::-1]))
    struct.pack_into("<i", b, 22, -4)
    w, h, back = decode_bmp(bytes(b))
    assert (w, h) == (6, 4)
    assert np.array_equal(back, px)

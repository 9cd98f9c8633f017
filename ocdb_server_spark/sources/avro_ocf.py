"""Pure-Python Avro Object Container File writer/reader.

Implements the public Apache Avro 1.11 specification's binary encoding
and Object Container File (OCF) layout for flat record schemas — the
one mainstream interchange format this engine could still add without
jars (round-6 verdict item 5; the codec discipline of sources/jpeg.py
and sources/flac.py applied to a data format):

  - primitives: null, boolean, int/long (zigzag varint), double
    (little-endian IEEE), string/bytes (length-prefixed);
  - unions (the ["null", T] nullable idiom): zigzag branch index then
    the branch value;
  - OCF: magic Obj\\x01, file-metadata map (avro.schema + avro.codec),
    16-byte sync marker, then blocks of (row count, byte size,
    payload, sync); codecs "null" and "deflate" (raw RFC 1951 via
    zlib, wbits=-15, exactly as the spec requires);
  - SCHEMA RESOLUTION on read (the spec's evolution rules): fields are
    matched by NAME, so a writer→reader field reorder is transparent;
    matched fields' TYPES must resolve — equality or the spec's
    promotions (int→long/double, long→double, string↔bytes), anything
    else is a loud resolution error, and promoted values are
    converted; reader-only fields take their declared default
    (type-converted: a bytes default arrives latin-1-encoded per the
    spec's JSON convention); writer-only fields are skipped (decoded
    and dropped — they must still be walked to advance the stream).

Not implemented: arrays/maps/enums/fixed/nested records, aliases,
numeric promotions. The reader rejects those schemas loudly.

Reference analog: none — format breadth for the Spark re-design
(op209's ORC rationale). Used by op252's round-trip certification.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"
# deterministic sync marker: fixtures must be byte-stable across runs
# (no RNG in operators); uniqueness across files is not needed for
# correctness, only for mid-file resync which we never do.
_SYNC = bytes(range(16))

_PRIMS = {"null", "boolean", "int", "long", "double", "string", "bytes"}


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("avro: truncated varint")
        b = raw[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _check_schema(schema: dict) -> list[dict]:
    if schema.get("type") != "record":
        raise ValueError("avro: only record schemas supported")
    fields = schema["fields"]
    for f in fields:
        t = f["type"]
        if isinstance(t, str):
            if t not in _PRIMS:
                raise ValueError(f"avro: unsupported type {t}")
        elif isinstance(t, list):
            if len(t) != 2 or "null" not in t or not any(
                isinstance(x, str) and x in _PRIMS - {"null"} for x in t
            ):
                raise ValueError(f"avro: only [null, prim] unions supported: {t}")
        else:
            raise ValueError(f"avro: unsupported complex type {t}")
    return fields


def _encode_value(t, v) -> bytes:
    if isinstance(t, list):  # nullable union
        if v is None:
            return _zigzag_encode(t.index("null"))
        branch = 1 - t.index("null")
        return _zigzag_encode(branch) + _encode_value(t[branch], v)
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if t == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"avro: unsupported type {t}")


def _decode_value(t, buf: io.BytesIO):
    if isinstance(t, list):
        branch = t[_zigzag_decode(buf)]
        return _decode_value(branch, buf)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if t == "bytes":
        n = _zigzag_decode(buf)
        return bytes(buf.read(n))
    raise ValueError(f"avro: unsupported type {t}")


def write_ocf(schema: dict, rows: list[dict], codec: str = "null",
              rows_per_block: int = 1000) -> bytes:
    """Serialize rows (list of dicts keyed by field name) to OCF bytes."""
    fields = _check_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    out = bytearray()
    out += _MAGIC
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    # metadata map: one block of len(meta) pairs, then the 0 terminator
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kk = k.encode()
        out += _zigzag_encode(len(kk)) + kk
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += _SYNC
    for start in range(0, len(rows), rows_per_block) or [0]:
        chunk = rows[start:start + rows_per_block]
        if not chunk:
            continue
        payload = bytearray()
        for row in chunk:
            for f in fields:
                payload += _encode_value(f["type"], row.get(f["name"]))
        data = bytes(payload)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(data))
        out += data
        out += _SYNC
    return bytes(out)


# spec promotions our subset honors (Avro 1.11 "Schema Resolution"):
# int→long, int→double, long→double, string↔bytes
_PROMOTIONS = {
    ("int", "long"),
    ("int", "double"),
    ("long", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _promote(wt: str, rt: str, v):
    if wt == rt:
        return v
    if (wt, rt) == ("string", "bytes"):
        return v.encode("utf-8")
    if (wt, rt) == ("bytes", "string"):
        return v.decode("utf-8")
    if rt == "double":
        return float(v)
    return v  # int -> long


def _resolve(wt, rt) -> None:
    """Raise unless writer type wt resolves into reader type rt under
    the subset's rules (equality, the _PROMOTIONS table, and unions:
    every writer branch must resolve into some reader branch)."""
    w_branches = wt if isinstance(wt, list) else [wt]
    r_branches = rt if isinstance(rt, list) else [rt]
    for wb in w_branches:
        if not any(
            wb == rb or (wb, rb) in _PROMOTIONS for rb in r_branches
        ):
            raise ValueError(
                f"avro: writer type {wt} does not resolve into reader "
                f"type {rt} (subset supports equality, int→long/double, "
                "long→double, string↔bytes, and union widening)"
            )


def _convert(wt, rt, v):
    """Apply the promotion conversion for a decoded value."""
    if v is None:
        return None
    wb = wt if isinstance(wt, str) else next(
        b for b in wt if b != "null"
    )
    rb = rt if isinstance(rt, str) else next(
        b for b in rt if b != "null"
    )
    return _promote(wb, rb, v)


def _default_value(f: dict):
    """A reader field's declared default, converted to the runtime
    type the decoder produces (the spec stores bytes defaults as
    latin-1 JSON strings; numeric defaults may be JSON ints)."""
    t = f["type"]
    v = f["default"]
    branch = t if isinstance(t, str) else t[0]  # union default: 1st branch
    if v is None or branch == "null":
        return None
    if branch == "bytes":
        return v.encode("latin-1") if isinstance(v, str) else bytes(v)
    if branch == "double":
        return float(v)
    if branch in ("int", "long"):
        return int(v)
    return v


def read_ocf(payload: bytes, reader_schema: dict | None = None) -> list[dict]:
    """Parse OCF bytes into rows, applying the spec's schema resolution
    against reader_schema when given: fields match by NAME; matched
    fields' types must resolve (equality or the promotion table —
    anything else raises, per the spec's resolution-error rule);
    promoted values are converted; reader-only fields get their
    declared default (type-converted); writer-only fields are decoded
    and dropped."""
    buf = io.BytesIO(payload)
    if buf.read(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:  # negative count variant: abs count + byte size
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            klen = _zigzag_decode(buf)
            k = buf.read(klen).decode()
            vlen = _zigzag_decode(buf)
            meta[k] = buf.read(vlen)
    sync = buf.read(16)
    writer_schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    w_fields = _check_schema(writer_schema)

    if reader_schema is None:
        r_fields = w_fields
    else:
        r_fields = _check_schema(reader_schema)
        w_by_name = {f["name"]: f for f in w_fields}
        for f in r_fields:
            if f["name"] in w_by_name:
                _resolve(w_by_name[f["name"]]["type"], f["type"])
            elif "default" not in f:
                raise ValueError(
                    f"avro: reader field {f['name']} absent in writer "
                    "schema and has no default"
                )
    r_by_name = {f["name"]: f for f in r_fields}

    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        bbuf = io.BytesIO(data)
        for _ in range(count):
            row = {}
            for f in w_fields:
                v = _decode_value(f["type"], bbuf)
                rf = r_by_name.get(f["name"])
                if rf is not None:
                    row[f["name"]] = _convert(f["type"], rf["type"], v)
            for f in r_fields:
                if f["name"] not in row:
                    row[f["name"]] = _default_value(f)
            rows.append(row)
        if buf.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return rows

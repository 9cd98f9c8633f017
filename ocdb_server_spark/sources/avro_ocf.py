"""Pure-Python Avro Object Container File writer/reader.

Implements the public Apache Avro 1.11 specification's binary encoding
and Object Container File (OCF) layout — the one mainstream
interchange format this engine could still add without jars (round-6
verdict item 5; the codec discipline of sources/jpeg.py and
sources/flac.py applied to a data format):

  - primitives: null, boolean, int/long (zigzag varint), float/double
    (little-endian IEEE), string/bytes (length-prefixed);
  - complex types, fully recursive: RECORDS (nested to any depth),
    ARRAYS and MAPS (block-encoded, including the negative-count
    block-size variant on read), ENUMS (zigzag symbol index), FIXED,
    and general UNIONS (zigzag branch index then the branch value —
    not just the ["null", T] idiom);
  - OCF: magic Obj\\x01, file-metadata map (avro.schema + avro.codec),
    16-byte sync marker, then blocks of (row count, byte size,
    payload, sync); codecs "null" and "deflate" (raw RFC 1951 via
    zlib, wbits=-15, exactly as the spec requires — plus read-side
    tolerance for the ≤4-byte Adler-32 tail the Apache Avro Python
    library and fastavro leave after the stream, their
    zlib.compress(data)[2:-1] shape);
  - SCHEMA RESOLUTION on read (the spec's evolution rules), applied
    RECURSIVELY at schema-compile time: record fields match by NAME
    at every nesting level (reorder transparent, writer-only fields
    decoded and dropped, reader-only fields defaulted — defaults
    type-converted recursively, bytes/fixed defaults latin-1 per the
    spec's JSON convention); matched types must resolve — equality or
    the spec's promotions (int→long/float/double, long→float/double,
    float→double, string↔bytes), arrays resolve via their items, maps
    via their values, enums by name with unknown writer symbols
    falling back to the reader's enum default (else a loud read-time
    error), fixed by name + size, unions branch-by-branch; anything
    else is a loud resolution error.

Not implemented: named-type references ("use the record defined
earlier by name"), aliases, logical types, recursive schemas. The
validator rejects those loudly.

Runtime mapping: records⇄dict, arrays⇄list, maps⇄dict, enums⇄symbol
str, fixed⇄bytes, the rest as natural python scalars.

Reference analog: none — format breadth for the Spark re-design
(op209's ORC rationale). Used by op252's round-trip certification;
two-way interop with JVM avro-1.12 pinned in tests/test_codecs.py.
"""

from __future__ import annotations

import io
import json
import struct
import threading
import zlib

_MAGIC = b"Obj\x01"
# deterministic sync marker: fixtures must be byte-stable across runs
# (no RNG in operators); uniqueness across files is not needed for
# correctness, only for mid-file resync which we never do.
_SYNC = bytes(range(16))

_PRIMS = {"null", "boolean", "int", "long", "float", "double",
          "string", "bytes"}


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


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Read exactly n bytes or raise the module's loud ValueError.
    Every decode-path read goes through here: a bare buf.read(n) on a
    truncated or corrupt stream returns SHORT and either leaks
    struct.error out of the float/double unpack (found by the
    truncation fuzz) or — worse — silently yields a wrong value
    (boolean, fixed). A negative length (corrupt varint where a
    string/bytes length belongs) is the same class."""
    if n < 0:
        raise ValueError(f"avro: negative length {n} (corrupt stream)")
    b = buf.read(n)
    if len(b) != n:
        raise ValueError(
            f"avro: truncated stream (wanted {n} bytes, got {len(b)})"
        )
    return b


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
        if shift > 63:
            # spec: a long is at most 10 varint bytes — an unbounded
            # varint let a corrupt stream mint arbitrarily large
            # counts (round-13 review)
            raise ValueError("avro: varint longer than 10 bytes")
    return (u >> 1) ^ -(u & 1)


# CUMULATIVE budget for ZERO-ADVANCE decodes, per file. Items that
# encode to zero bytes (record of nulls / empty-fields record, array of
# "null") are spec-LEGAL, so a bytes×k plausibility bound on the COUNT
# rejects legal files — round-13's 8×-bytes guard failed write_ocf's
# own output for an empty-record schema (round-14 ADVICE). But zero
# bytes → unbounded logical items has no information-theoretic bound,
# so SOME absolute cap is unavoidable; and no count-based gate works:
# a per-block cap multiplies K-fold over K crafted blocks, and a
# bytes×8 exemption is bypassed by padding a block with junk bytes the
# items never consume (both round-14 review findings). The guard is
# therefore exactly what the ADVICE originally prescribed — detect the
# NON-ADVANCING DECODE itself: every decode loop (file row blocks,
# arrays, resolver arrays) checks whether the item consumed bytes, and
# only zero-advance items draw from ONE allowance shared across the
# whole file (read_ocf opens/closes it; maps and metadata always
# advance via their length-prefixed keys and need no accounting).
# Data-consuming items are bounded by the payload's own bytes via
# _read_exact truncation. Worst-case transient memory per file is
# ~64 MB of empty rows regardless of block structure or counts.
# Documented subset limit (alongside "no named-type references"): a
# file carrying >2^20 zero-encoded-size items total is rejected; real
# writers (ours flushes 1000-row blocks) sit orders of magnitude
# below it.
_ZERO_SIZE_ITEM_BUDGET = 1_048_576

# Per-block decompressed-size cap: zlib inflates up to ~1032× its
# input, so an unbounded decompress lets a 64 KB crafted deflate block
# allocate gigabytes before any row decodes (round-14 review). 256 MiB
# is orders of magnitude above any real writer's block (ours: ≤1000
# rows per block) while bounding the amplification.
_MAX_BLOCK_BYTES = 1 << 28

_ZS_STATE = threading.local()


def _zs_open() -> None:
    """Open a fresh zero-advance allowance (read_ocf, per file)."""
    _ZS_STATE.left = _ZERO_SIZE_ITEM_BUDGET


def _zs_close() -> None:
    """Close the file's allowance so the next consumer — another file,
    or a standalone _decode chain — starts fresh (round-14 review: a
    drained allowance leaking past read_ocf spuriously rejected later
    standalone decodes on the same thread)."""
    _ZS_STATE.left = None


def _zs_tick(context: str) -> None:
    """Record ONE zero-advance decode; loud when the file's cumulative
    zero-advance total passes the budget. Thread-local: decode paths
    never span threads; a standalone decode chain (no read_ocf frame)
    lazily opens its own allowance, kept until the next read_ocf."""
    left = getattr(_ZS_STATE, "left", None)
    if left is None:
        left = _ZERO_SIZE_ITEM_BUDGET
    left -= 1
    if left < 0:
        # Close the allowance BEFORE raising (round-15 ADVICE). The
        # _decode frame and read_ocf's finally both make this redundant
        # on their paths; it remains as the degrade-gracefully backstop
        # for any OTHER chain that lazily opened through this function
        # (e.g. a resolver read-fn invoked standalone) so a drained
        # allowance never outlives its budget error on those paths.
        _ZS_STATE.left = None
        raise ValueError(
            f"avro: {context} items decode to zero bytes past the "
            f"cumulative {_ZERO_SIZE_ITEM_BUDGET}-item budget for this file"
        )
    _ZS_STATE.left = left


def _block_counts(buf: io.BytesIO):
    """Iterate the spec's block counts (arrays, maps, file metadata):
    yields positive item counts until the 0 terminator; a NEGATIVE
    count means abs(count) items preceded by the block's byte size
    (read and discarded — we never skip blocks). Counts are NOT
    plausibility-gated here: any count-based bound either rejects
    legal zero-size items (round-14 ADVICE) or is bypassed by junk
    padding (round-14 review) — the CALLER's decode loop accounts for
    actual zero-advance items via _zs_tick, and data-consuming items
    hit _read_exact truncation."""
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            return
        if n < 0:
            n = -n
            _zigzag_decode(buf)
        yield n


def _validate(t) -> None:
    """Recursive subset validator — rejects what we don't implement
    LOUDLY (named-type references, aliases, nested unions)."""
    if isinstance(t, str):
        if t not in _PRIMS:
            raise ValueError(
                f"avro: unsupported type {t!r} (named-type references "
                "are outside the subset)")
        return
    if isinstance(t, list):
        for b in t:
            if isinstance(b, list):
                raise ValueError("avro: unions may not contain unions")
            _validate(b)
        return
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "record":
            fields = t.get("fields")
            if not isinstance(fields, list):
                raise ValueError("avro: record needs a fields list")
            for f in t["fields"]:
                # structural, not KeyError: a corrupt schema JSON can
                # parse cleanly yet miss name/type (truncation fuzz)
                if not isinstance(f, dict) or "name" not in f or "type" not in f:
                    raise ValueError(f"avro: malformed record field {f!r}")
                _validate(f["type"])
            return
        if kind == "enum":
            if not t.get("symbols"):
                raise ValueError("avro: enum needs symbols")
            if "default" in t and t["default"] not in t["symbols"]:
                # the spec requires the enum default to be a member of
                # symbols; an unchecked typo here would let resolution
                # emit a symbol outside the reader's own enum
                raise ValueError(
                    f"avro: enum default {t['default']!r} is not one of "
                    f"its symbols {t['symbols']}")
            return
        if kind == "fixed":
            if not isinstance(t.get("size"), int):
                raise ValueError("avro: fixed needs integer size")
            return
        if kind == "array":
            if "items" not in t:
                raise ValueError("avro: array needs items")
            _validate(t["items"])
            return
        if kind == "map":
            if "values" not in t:
                raise ValueError("avro: map needs values")
            _validate(t["values"])
            return
        if kind in _PRIMS:  # {"type": "long"} wrapper form
            return
        raise ValueError(f"avro: unsupported complex type {kind!r}")
    raise ValueError(f"avro: bad schema node {t!r}")


def _kind(t) -> str:
    """Schema node discriminator: 'union', a primitive name, or the
    complex-type name."""
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        return t
    return t["type"]


def _name(t) -> str:
    """Unqualified name of a named type (namespace ignored — aliases
    and namespaces are outside the subset)."""
    return str(t.get("name", "")).rsplit(".", 1)[-1]


def _matches(t, v, strict: bool = False) -> bool:
    """Writer-side union branch selection: does python value v belong
    to schema branch t? With strict=True, int values do NOT match
    float/double branches — union selection runs a strict pass first
    so an int never binds to a float branch that happens to be listed
    earlier (which would silently destroy precision: float32 cannot
    hold 2^40+1)."""
    k = _kind(t)
    if k == "null":
        return v is None
    if v is None:
        return False
    if k == "boolean":
        return isinstance(v, bool)
    if k in ("int", "long"):
        if not (isinstance(v, int) and not isinstance(v, bool)):
            return False
        # Range-aware branch binding: in a union ["int","long"] a
        # value of 2^40 must bind to the long branch, not bind to
        # int and then fail _encode's range check. A long out of
        # int64 range matches nothing → the union raises loudly.
        bound = 31 if k == "int" else 63
        return -(1 << bound) <= v < (1 << bound)
    if k in ("float", "double"):
        if strict:
            return isinstance(v, float)
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if k == "string":
        return isinstance(v, str)
    if k in ("bytes",):
        return isinstance(v, (bytes, bytearray))
    if k == "fixed":
        return isinstance(v, (bytes, bytearray)) and len(v) == t["size"]
    if k == "enum":
        return isinstance(v, str) and v in t["symbols"]
    if k == "array":
        return isinstance(v, (list, tuple))
    if k == "map":
        return isinstance(v, dict)
    if k == "record":
        return isinstance(v, dict)
    return False


def _encode(t, v) -> bytes:
    k = _kind(t)
    if k == "union":
        # strict pass first (exact-type branches), then the permissive
        # pass (ints may widen into float/double if nothing exact exists)
        for strict in (True, False):
            for i, branch in enumerate(t):
                if _matches(branch, v, strict=strict):
                    return _zigzag_encode(i) + _encode(branch, v)
        raise ValueError(f"avro: value {v!r} matches no union branch {t}")
    if k == "null":
        if v is not None:
            raise ValueError(f"avro: non-null value {v!r} for null type")
        return b""
    if k == "boolean":
        if not isinstance(v, bool):
            raise ValueError(f"avro: boolean field got {type(v).__name__} {v!r}")
        return b"\x01" if v else b"\x00"
    if k in ("int", "long"):
        # Range-check before encoding: an out-of-range value would
        # still produce a decodable varint, i.e. a nonconformant
        # stream that WE round-trip but spec-strict readers (the JVM
        # avro interop partner) can misread — reject loudly instead
        # (Avro 1.11 spec §"Primitive Types"; round-7 ADVICE).
        # same type discipline _matches gives union branches: int(2.7)
        # silently truncated, int(True) encoded a bool as 1, and a
        # numeric string would parse (round-13 review)
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(f"avro: {k} field got {type(v).__name__} {v!r}")
        iv = int(v)
        bound = 31 if k == "int" else 63
        if not -(1 << bound) <= iv < (1 << bound):
            raise ValueError(f"avro: {iv!r} out of range for {k}")
        return _zigzag_encode(iv)
    if k in ("float", "double"):
        # ints may widen (the union path's permissive pass allows it),
        # but float("1.5") parsing a STRING was silent corruption
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"avro: {k} field got {type(v).__name__} {v!r}")
        if k == "float":
            return struct.pack("<f", float(v))
        return struct.pack("<d", float(v))
    if k == "string":
        if not isinstance(v, str):
            raise ValueError(f"avro: string field got {type(v).__name__} {v!r}")
        raw = v.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if k == "bytes":
        if not isinstance(v, (bytes, bytearray)):
            # bytes(5) semantics wrote five NUL bytes that round-trip
            # cleanly — invisible corruption
            raise ValueError(f"avro: bytes field got {type(v).__name__} {v!r}")
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    if k == "fixed":
        if not isinstance(v, (bytes, bytearray)):
            raise ValueError(f"avro: fixed field got {type(v).__name__} {v!r}")
        raw = bytes(v)
        if len(raw) != t["size"]:
            raise ValueError(
                f"avro: fixed {_name(t)} needs {t['size']} bytes, "
                f"got {len(raw)}")
        return raw
    if k == "enum":
        try:
            return _zigzag_encode(t["symbols"].index(v))
        except ValueError:
            raise ValueError(
                f"avro: {v!r} not a symbol of enum {_name(t)}") from None
    if k == "array":
        out = bytearray()
        if v:
            out += _zigzag_encode(len(v))
            for item in v:
                out += _encode(t["items"], item)
        out += _zigzag_encode(0)
        return bytes(out)
    if k == "map":
        out = bytearray()
        if v:
            out += _zigzag_encode(len(v))
            for mk, mv in v.items():
                raw = str(mk).encode("utf-8")
                out += _zigzag_encode(len(raw)) + raw
                out += _encode(t["values"], mv)
        out += _zigzag_encode(0)
        return bytes(out)
    if k == "record":
        out = bytearray()
        for f in t["fields"]:
            if f["name"] not in v:
                # defaults are a READER-side concept in the spec; a
                # writer must supply every field — a missing key is a
                # caller bug (typo'd field name), not a null
                raise ValueError(
                    f"avro: row missing field {f['name']!r} of record "
                    f"{_name(t)}")
            out += _encode(f["type"], v[f["name"]])
        return bytes(out)
    raise ValueError(f"avro: unsupported type {t}")


def _decode(t, buf: io.BytesIO):
    """Decode one value. When no zero-advance allowance is active on
    the thread (i.e. this is a STANDALONE decode chain, not a call
    under a read_ocf frame), open a fresh per-chain allowance and
    close it on EVERY exit path. The round-15 ADVICE fix reset the
    allowance only in _zs_tick's budget-raise branch; the session
    review showed any OTHER exception after the allowance drained —
    e.g. a truncated varint right after the last legal zero-advance
    item — still leaked left=0 to the thread and spuriously rejected
    the next legal standalone decode. A frame (try/finally), exactly
    like read_ocf's, covers all exit paths at once; nested recursive
    calls see the open allowance and pass through, preserving
    cumulative accounting within the chain."""
    if getattr(_ZS_STATE, "left", None) is None:
        _zs_open()
        try:
            return _decode_inner(t, buf)
        finally:
            _zs_close()
    return _decode_inner(t, buf)


def _decode_inner(t, buf: io.BytesIO):
    k = _kind(t)
    if k == "union":
        idx = _zigzag_decode(buf)
        if not 0 <= idx < len(t):
            raise ValueError(f"avro: union branch {idx} out of range")
        return _decode_inner(t[idx], buf)
    if k == "null":
        return None
    if k == "boolean":
        b = _read_exact(buf, 1)
        if b not in (b"\x00", b"\x01"):
            raise ValueError(f"avro: bad boolean byte {b!r}")
        return b == b"\x01"
    if k in ("int", "long"):
        return _zigzag_decode(buf)
    if k == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if k == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if k == "string":
        n = _zigzag_decode(buf)
        return _read_exact(buf, n).decode("utf-8")
    if k == "bytes":
        n = _zigzag_decode(buf)
        return bytes(_read_exact(buf, n))
    if k == "fixed":
        return bytes(_read_exact(buf, t["size"]))
    if k == "enum":
        idx = _zigzag_decode(buf)
        syms = t["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError(f"avro: enum index {idx} out of range")
        return syms[idx]
    if k == "array":
        out = []
        prev = buf.tell()
        for n in _block_counts(buf):
            for _ in range(n):
                out.append(_decode_inner(t["items"], buf))
                pos = buf.tell()
                if pos == prev:
                    _zs_tick("array")  # zero-advance item (e.g. null)
                else:
                    prev = pos
        return out
    if k == "map":
        # map items always advance: the key is length-prefixed (≥1
        # byte of varint) — no zero-advance accounting needed
        out = {}
        for n in _block_counts(buf):
            for _ in range(n):
                klen = _zigzag_decode(buf)
                key = _read_exact(buf, klen).decode("utf-8")
                out[key] = _decode_inner(t["values"], buf)
        return out
    if k == "record":
        return {f["name"]: _decode_inner(f["type"], buf) for f in t["fields"]}
    raise ValueError(f"avro: unsupported type {t}")


def write_ocf(schema: dict, rows: list[dict], codec: str = "null",
              rows_per_block: int = 1000) -> bytes:
    """Serialize rows (list of dicts keyed by field name) to OCF bytes."""
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avro: top-level schema must be a record")
    _validate(schema)
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
    for start in range(0, len(rows), rows_per_block):
        chunk = rows[start:start + rows_per_block]
        payload = bytearray()
        for row in chunk:
            payload += _encode(schema, row)
        data = bytes(payload)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(data))
        out += data
        out += _SYNC
    return bytes(out)


# spec promotions (Avro 1.11 "Schema Resolution"):
# int→long/float/double, long→float/double, float→double, string↔bytes
_PROMOTIONS = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _resolution_error(wt, rt):
    return ValueError(
        f"avro: writer type {wt} does not resolve into reader type {rt} "
        "(subset supports equality, int→long/float/double, "
        "long→float/double, float→double, string↔bytes, arrays/maps/"
        "records/enums/fixed recursively, and union widening)"
    )


def _make_resolver(wt, rt):
    """Compile (writer type, reader type) into a decoder fn(buf) that
    produces reader-shaped values, applying the spec's resolution
    rules recursively. Raises the resolution error at COMPILE time
    whenever the pair can never resolve.

    The returned TOP-LEVEL fn carries the same conditional allowance
    frame as _decode (round-16 ADVICE): invoked standalone — outside a
    read_ocf or _decode frame — it opens a fresh zero-advance
    allowance and closes it on every exit path, so a successfully
    completed standalone resolver chain never leaks a lazily-opened,
    partially-drained allowance to the thread. Under read_ocf (the
    only in-repo caller) the allowance is already open and the frame
    passes through; recursive sub-resolvers are compiled by
    _make_resolver_inner and stay unframed so cumulative accounting
    within one chain is preserved."""
    fn = _make_resolver_inner(wt, rt)

    def framed(buf, _fn=fn):
        if getattr(_ZS_STATE, "left", None) is None:
            _zs_open()
            try:
                return _fn(buf)
            finally:
                _zs_close()
        return _fn(buf)
    return framed


def _make_resolver_inner(wt, rt):
    wk, rk = _kind(wt), _kind(rt)

    if wk == "union":
        # every writer branch must resolve (stricter than the spec's
        # value-time error — a branch that can never resolve is a
        # schema bug we'd rather surface at compile time)
        branch_fns = [_make_resolver_inner(b, rt) for b in wt]

        def read_wunion(buf):
            idx = _zigzag_decode(buf)
            if not 0 <= idx < len(branch_fns):
                raise ValueError(f"avro: union branch {idx} out of range")
            return branch_fns[idx](buf)
        return read_wunion

    if rk == "union":
        # writer non-union into reader union: first reader branch that
        # accepts it (spec rule)
        for rb in rt:
            try:
                return _make_resolver_inner(wt, rb)
            except ValueError:
                continue
        raise _resolution_error(wt, rt)

    if wk == "record" and rk == "record":
        if _name(wt) != _name(rt):
            raise _resolution_error(wt, rt)
        r_by_name = {f["name"]: f for f in rt["fields"]}
        plan = []  # (field name or None-to-drop, decoder)
        matched = set()
        for wf in wt["fields"]:
            rf = r_by_name.get(wf["name"])
            if rf is None:
                wt_f = wf["type"]
                plan.append((None, lambda buf, t=wt_f: _decode(t, buf)))
            else:
                matched.add(wf["name"])
                plan.append(
                    (wf["name"], _make_resolver_inner(wf["type"], rf["type"])))
        defaults = []
        for rf in rt["fields"]:
            if rf["name"] in matched:
                continue
            if "default" not in rf:
                raise ValueError(
                    f"avro: reader field {rf['name']} absent in writer "
                    "schema and has no default")
            defaults.append((rf["name"], _default_of(rf["type"], rf["default"])))

        def read_record(buf):
            row = {}
            for fname, fn in plan:
                v = fn(buf)
                if fname is not None:
                    row[fname] = v
            for fname, dv in defaults:
                row[fname] = dv
            return row
        return read_record

    if wk == "array" and rk == "array":
        item_fn = _make_resolver_inner(wt["items"], rt["items"])

        def read_array(buf):
            out = []
            prev = buf.tell()
            for n in _block_counts(buf):
                for _ in range(n):
                    out.append(item_fn(buf))
                    pos = buf.tell()
                    if pos == prev:
                        _zs_tick("array")  # zero-advance resolved item
                    else:
                        prev = pos
            return out
        return read_array

    if wk == "map" and rk == "map":
        val_fn = _make_resolver_inner(wt["values"], rt["values"])

        def read_map(buf):
            out = {}
            for n in _block_counts(buf):
                for _ in range(n):
                    klen = _zigzag_decode(buf)
                    key = _read_exact(buf, klen).decode("utf-8")
                    out[key] = val_fn(buf)
            return out
        return read_map

    if wk == "enum" and rk == "enum":
        if _name(wt) != _name(rt):
            raise _resolution_error(wt, rt)
        rsyms = set(rt["symbols"])
        fallback = rt.get("default")
        mapped = []
        for sym in wt["symbols"]:
            if sym in rsyms:
                mapped.append(sym)
            elif fallback is not None:
                mapped.append(fallback)
            else:
                mapped.append(None)  # loud at read time, per spec

        def read_enum(buf):
            idx = _zigzag_decode(buf)
            if not 0 <= idx < len(mapped):
                raise ValueError(f"avro: enum index {idx} out of range")
            sym = mapped[idx]
            if sym is None:
                raise ValueError(
                    f"avro: writer symbol {wt['symbols'][idx]!r} absent "
                    f"from reader enum {_name(rt)} (no default)")
            return sym
        return read_enum

    if wk == "fixed" and rk == "fixed":
        if _name(wt) != _name(rt) or wt["size"] != rt["size"]:
            raise _resolution_error(wt, rt)
        size = wt["size"]
        return lambda buf: bytes(_read_exact(buf, size))

    if wk in _PRIMS and rk in _PRIMS:
        if wk == rk:
            return lambda buf, t=wt: _decode(t, buf)
        if (wk, rk) in _PROMOTIONS:
            if rk == "bytes":
                conv = lambda v: v.encode("utf-8")       # noqa: E731
            elif rk == "string":
                conv = lambda v: v.decode("utf-8")       # noqa: E731
            elif rk in ("float", "double"):
                conv = float
            else:
                conv = lambda v: v                       # noqa: E731 int→long

            def read_promoted(buf, t=wt, c=conv):
                return c(_decode(t, buf))
            return read_promoted

    raise _resolution_error(wt, rt)


def _default_of(t, v):
    """A reader field's declared JSON default, converted RECURSIVELY to
    the runtime type the decoder produces (the spec stores bytes/fixed
    defaults as latin-1 JSON strings; union defaults conform to the
    FIRST branch)."""
    k = _kind(t)
    if k == "union":
        return _default_of(t[0], v)
    if v is None or k == "null":
        return None
    if k in ("bytes", "fixed"):
        return v.encode("latin-1") if isinstance(v, str) else bytes(v)
    if k in ("float", "double"):
        return float(v)
    if k in ("int", "long"):
        return int(v)
    if k == "boolean":
        return bool(v)
    if k == "array":
        return [_default_of(t["items"], x) for x in v]
    if k == "map":
        return {mk: _default_of(t["values"], mv) for mk, mv in v.items()}
    if k == "record":
        out = {}
        for f in t["fields"]:
            if f["name"] in v:
                out[f["name"]] = _default_of(f["type"], v[f["name"]])
            elif "default" in f:
                out[f["name"]] = _default_of(f["type"], f["default"])
            else:
                raise ValueError(
                    f"avro: record default missing field {f['name']}")
        return out
    if k == "enum":
        if v not in t["symbols"]:
            raise ValueError(
                f"avro: enum field default {v!r} is not one of "
                f"{t['symbols']}")
        return v
    return v  # string


def read_ocf(payload: bytes, reader_schema: dict | None = None) -> list[dict]:
    """Parse OCF bytes into rows, applying the spec's schema resolution
    against reader_schema when given (recursively — see module
    docstring); without one, rows take the writer schema's shape."""
    _zs_open()  # fresh cumulative zero-advance allowance for this file
    try:
        return _read_ocf_inner(payload, reader_schema)
    finally:
        _zs_close()  # never leak a drained allowance past this file


def _read_ocf_inner(
    payload: bytes, reader_schema: dict | None
) -> list[dict]:
    buf = io.BytesIO(payload)
    if buf.read(4) != _MAGIC:
        raise ValueError("avro: bad magic")
    meta: dict[str, bytes] = {}
    for n in _block_counts(buf):
        for _ in range(n):
            klen = _zigzag_decode(buf)
            k = _read_exact(buf, klen).decode()
            vlen = _zigzag_decode(buf)
            meta[k] = _read_exact(buf, vlen)
    # exact: a file cut inside the header sync would otherwise fall
    # out of the block loop below with ZERO rows — silent total loss
    sync = _read_exact(buf, 16)
    if "avro.schema" not in meta:
        raise ValueError("avro: header missing avro.schema")
    writer_schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    _validate(writer_schema)
    if not (isinstance(writer_schema, dict)
            and writer_schema.get("type") == "record"):
        raise ValueError("avro: top-level schema must be a record")

    if reader_schema is None:
        row_fn = lambda b: _decode(writer_schema, b)     # noqa: E731
    else:
        _validate(reader_schema)
        row_fn = _make_resolver(writer_schema, reader_schema)

    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        if count <= 0:
            # a corrupt count varint (0 or negative) would otherwise
            # decode NOTHING while data/size/sync stay intact — the
            # sync check passes and the block's rows vanish silently
            # (review finding; spec blocks always hold >=1 object)
            raise ValueError(f"avro: bad block row count {count}")
        data = _read_exact(buf, size)
        if codec == "deflate":
            # bounded inflate: an unbounded decompress lets a ~64 KB
            # crafted block allocate gigabytes (zlib amplifies up to
            # ~1032×) before any row decodes (round-14 review)
            try:
                dec = zlib.decompressobj(-15)
                out = dec.decompress(data, _MAX_BLOCK_BYTES)
                if not dec.unconsumed_tail:
                    out += dec.flush()  # drain any buffered remainder
                if dec.unconsumed_tail or len(out) > _MAX_BLOCK_BYTES:
                    raise ValueError(
                        f"avro: deflate block inflates past the "
                        f"{_MAX_BLOCK_BYTES}-byte budget"
                    )
                # The one-shot zlib.decompress this bounded path
                # replaced raised on a truncated stream; decompressobj
                # does NOT — flush() on a mid-stream cut succeeds with
                # partial output and empty unconsumed_tail, and a
                # zero-byte-row schema would then decode its declared
                # count from partial data without any error (round-15
                # ADVICE). The stream-end flag is the truncation check.
                if not dec.eof:
                    raise ValueError(
                        "avro: corrupt deflate block: truncated stream"
                    )
                if len(dec.unused_data) > 4:
                    # Bytes after the deflate stream's end inside the
                    # block's declared size. A SHORT tail is valid in
                    # the wild and must be tolerated (session review):
                    # the Apache Avro Python library and fastavro both
                    # write deflate blocks as zlib.compress(data)[2:-1]
                    # — zlib header stripped, but 3 of the 4 Adler-32
                    # trailer bytes left in the block (verified: such a
                    # block inflates clean with eof set and 3 bytes of
                    # unused_data). 4 covers the full-trailer [2:]
                    # variant. Anything longer is junk no known writer
                    # emits — the compressed-side twin of the decoded
                    # trailing-bytes check below. DELIBERATE divergence
                    # from upstream read tolerance (round-16 ADVICE
                    # adjudication: KEEP): Java's nowrap Inflater — and
                    # so upstream Spark/avro readers — ignore ALL
                    # post-stream bytes, but >4 bytes of tail means the
                    # block's declared size disagrees with its content
                    # in a way no known writer produces, i.e. likely
                    # corruption this engine would rather surface than
                    # read through. Pinned by the truncation-taxonomy
                    # test.
                    raise ValueError(
                        "avro: trailing bytes after deflate stream in block"
                    )
                data = out
            except zlib.error as exc:
                raise ValueError(f"avro: corrupt deflate block: {exc}")
        # No count-based plausibility gate here: any such bound either
        # rejects legal zero-size rows (round-14 ADVICE) or is bypassed
        # by junk padding the rows never consume (round-14 review).
        # Corrupt huge counts with zero-byte rows (empty-record /
        # all-null schemas) would append items until OOM — the
        # truncation guard never fires when decode consumes 0 bytes
        # (round-13 review) — so the loop accounts for every ACTUAL
        # zero-advance decode against the file's cumulative allowance;
        # data-consuming rows are bounded by the block's own bytes.
        bbuf = io.BytesIO(data)
        prev = bbuf.tell()
        for _ in range(count):
            rows.append(row_fn(bbuf))
            pos = bbuf.tell()
            if pos == prev:
                _zs_tick("block row")
            else:
                prev = pos
        if bbuf.read(1):
            # count smaller than the rows actually serialized would
            # silently drop the tail of the block
            raise ValueError("avro: trailing bytes after last row in block")
        if _read_exact(buf, 16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return rows

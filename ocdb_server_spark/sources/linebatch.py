"""Record-aligned line batching — the ONE copy of the flush kernel the
splittable-transport writers share (round-12 review: bgzf.py and
zstd_seekable.py carried byte-identical encode/append/flush loops, so
the record-alignment guarantee both formats' split paths rely on lived
in two places that could silently diverge).

Contract: every yielded payload is a concatenation of WHOLE
``line + '\\n'`` records (a split can never tear a record), flushed
once the pending batch reaches ~TARGET_UNCOMP uncompressed. A single
line larger than the target is emitted as its own oversized payload —
alignment beats the size target. Streaming: one batch in memory, never
the corpus (the shape that still works when one task writes
gigabytes).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

TARGET_UNCOMP = 48 * 1024  # flush threshold (htslib uses ~64K − slack)


def batch_lines(
    lines: Iterable[str], target: int = TARGET_UNCOMP
) -> Iterator[bytes]:
    """Yield utf-8 payloads of whole newline-terminated records."""
    pend: list[bytes] = []
    pend_n = 0
    for line in lines:
        raw = line.encode("utf-8") + b"\n"
        if pend and pend_n + len(raw) > target:
            yield b"".join(pend)
            pend, pend_n = [], 0
        pend.append(raw)
        pend_n += len(raw)
    if pend:
        yield b"".join(pend)

"""op195–op200 — REAL multimodal decode + DSP, hash-certified.

These ops retire the "decode kernel is stubbed" caveat for the
two classic uncompressed formats: standards-conformant PCM WAV and
24-bit BMP files are synthesized from closed-form integer formulas,
decoded back through Arrow-batched mapInPandas with the REAL parsers
in sources/codecs.py (chunk walker, padding, bottom-up rows — proven
interoperable with the stdlib `wave` module in tests/test_codecs.py),
and reduced to exact integer features. The DuckDB oracle recomputes
the SAME features from the generation formulas without ever seeing a
byte — so a hash match certifies the whole encode→bytes→decode→
feature path, not just the plumbing. Compressed codecs followed in
later rounds: JPEG (op202/op203, sources/jpeg.py), PNG (op205),
GIF (op222), FLAC (op251, sources/flac.py) — all real from-scratch
decoders. Only MP3 and H.264 remain honestly stubbed in
sources/multimodal.py: those need real libraries this container
lacks.

Scale shape: generation and decode are both mapInPandas stages —
payload bytes live and die inside one task (never shuffled); only
fixed-width integer feature rows continue. That is exactly the 100 TB
contract of op104/op130, now with a working kernel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from ocdb_server_spark.registry import register

# Codec KERNELS declared as register deps (round-14, the last
# invisible-rewrite hole the r12 fingerprint machinery left): each
# op's certification is built on these parsers, so a kernel rewrite
# must re-front the op in the driver sweep exactly as an oracle edit
# does. Whole modules are declared — any edit to the kernel file
# demotes every op built on it (deps fold inspect.getsource, which
# accepts modules).
from ocdb_server_spark.sources import codecs as _codecs_kernel
from ocdb_server_spark.sources import gif as _gif_kernel
from ocdb_server_spark.sources import jpeg as _jpeg_kernel
from ocdb_server_spark.sources import png as _png_kernel

# ------------------------------------------------------------------ WAV

_WAV_N = 200
_WAV_RATE = 8000


_OP195_SQL = f"""
WITH a AS (SELECT range AS i FROM range(0, {_WAV_N})),
s AS (
  SELECT a.i, ((a.i * 31 + u.k * 7) % 2001) - 1000 AS v
  FROM a, UNNEST(range(0, 400 + (a.i % 5) * 100)) AS u(k)
)
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST({_WAV_RATE} AS BIGINT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(COUNT(*) * 1000 // {_WAV_RATE} AS BIGINT) AS duration_ms,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM s GROUP BY i
"""


def _gen_wav(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import encode_wav

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            n = 400 + (int(i) % 5) * 100
            k = np.arange(n, dtype=np.int64)
            s = ((int(i) * 31 + k * 7) % 2001 - 1000).astype(np.int16)
            ids.append(int(i))
            payloads.append(encode_wav(s, _WAV_RATE))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_wav_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import decode_wav

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "sample_rate", "n_samples", "duration_ms",
                "sum_sq", "peak")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            rate, _ch, n, s = decode_wav(bytes(payload))
            s64 = s.astype(np.int64)
            out["asset_id"].append(int(aid))
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["duration_ms"].append(n * 1000 // rate)
            out["sum_sq"].append(int(np.sum(s64 * s64)))
            out["peak"].append(int(np.max(np.abs(s64))))
        yield pd.DataFrame(out)


@register(
    "op195_wav_decode_features",
    oracle=_OP195_SQL,
    # plan + certification live in the helpers and the WAV kernel
    deps=(_gen_wav, _decode_wav_features, _codecs_kernel),
)
def op195_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode, for real: 200 standards-conformant mono PCM16 WAV
    files (samples from a closed-form integer formula) are encoded and
    then DECODED by the chunk-walking RIFF parser, yielding per-asset
    sample_rate / n_samples / duration / energy (exact int64 sum of
    squares) / peak. The oracle recomputes every feature from the
    formula alone — a hash match certifies the decoder end to end.
    sf_dir is unused: the corpus is self-generated (same stance as
    op152's Python data source)."""
    gen = spark.range(_WAV_N).repartition(8).mapInPandas(
        _gen_wav, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_wav_features,
        "asset_id long, sample_rate long, n_samples long,"
        " duration_ms long, sum_sq long, peak long",
    )


# ------------------------------------------------------------------ BMP

_BMP_N = 60


_OP196_SQL = f"""
WITH a AS (
  SELECT range AS i,
         16 + (range % 4) * 8 AS w,
         8 + (range % 3) * 8 AS h
  FROM range(0, {_BMP_N})
),
px AS (
  SELECT a.i, a.w, a.h,
         (a.i + 3 * r.rr + 7 * c.cc) % 256 AS red,
         (2 * a.i + 5 * r.rr + c.cc) % 256 AS grn,
         (3 * a.i + r.rr + 2 * c.cc) % 256 AS blu
  FROM a, UNNEST(range(0, a.h)) AS r(rr), UNNEST(range(0, a.w)) AS c(cc)
)
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(SUM(red) AS BIGINT) AS sum_r,
       CAST(SUM(grn) AS BIGINT) AS sum_g,
       CAST(SUM(blu) AS BIGINT) AS sum_b
FROM px GROUP BY i, w, h
"""


def _gen_bmp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import encode_bmp

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            w, h = 16 + (i % 4) * 8, 8 + (i % 3) * 8
            rr = np.arange(h, dtype=np.int64)[:, None]
            cc = np.arange(w, dtype=np.int64)[None, :]
            px = np.stack(
                [
                    (i + 3 * rr + 7 * cc) % 256,
                    (2 * i + 5 * rr + cc) % 256,
                    (3 * i + rr + 2 * cc) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            ids.append(i)
            payloads.append(encode_bmp(px))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_bmp_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import decode_bmp

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "width", "height", "sum_r", "sum_g", "sum_b")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, px = decode_bmp(bytes(payload))
            sums = px.astype(np.int64).sum(axis=(0, 1))
            out["asset_id"].append(int(aid))
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(out)


@register(
    "op196_bmp_decode_stats",
    oracle=_OP196_SQL,
    deps=(_gen_bmp, _decode_bmp_stats, _codecs_kernel),
)
def op196_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode, for real: 60 conformant 24-bit BMPs (pixel values
    from a closed-form integer formula; widths chosen to exercise the
    4-byte row padding) are encoded, then DECODED by the real parser
    (padding strip, bottom-up flip, BGR→RGB), yielding per-asset
    dimensions + exact per-channel int64 sums. The oracle recomputes
    the features from the formula alone — a hash match certifies the
    decoder end to end. sf_dir unused (self-generated corpus)."""
    gen = spark.range(_BMP_N).repartition(8).mapInPandas(
        _gen_bmp, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_bmp_stats,
        "asset_id long, width long, height long,"
        " sum_r long, sum_g long, sum_b long",
    )


# ------------------------------------------------------- WAV + FFT

_FFT_N = 128          # assets
_FFT_SAMPLES = 1024   # per asset (power of two)
_FFT_AMP = 8000


_OP197_SQL = f"""
WITH a AS (SELECT range AS i FROM range(0, {_FFT_N}))
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST({_FFT_SAMPLES} AS BIGINT) AS n_samples,
       CAST(3 + (i % 40) * 2 AS BIGINT) AS dominant_bin,
       CAST(3 + (i % 40) * 2 AS DOUBLE) * {_WAV_RATE} / {_FFT_SAMPLES}
         AS dominant_freq_hz
FROM a
"""


def _gen_sine_wav(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import encode_wav

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            m = 3 + (i % 40) * 2  # exact FFT bin
            k = np.arange(_FFT_SAMPLES)
            s = np.rint(
                _FFT_AMP * np.sin(2.0 * np.pi * m * k / _FFT_SAMPLES)
            ).astype(np.int16)
            ids.append(i)
            payloads.append(encode_wav(s, _WAV_RATE))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _dominant_freq(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import decode_wav

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "n_samples", "dominant_bin", "dominant_freq_hz")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            rate, _ch, n, s = decode_wav(bytes(payload))
            spec = np.abs(np.fft.rfft(s.astype(np.float64)))
            bin_ = int(np.argmax(spec[1:])) + 1  # skip DC
            out["asset_id"].append(int(aid))
            out["n_samples"].append(n)
            out["dominant_bin"].append(bin_)
            out["dominant_freq_hz"].append(bin_ * rate / n)
        yield pd.DataFrame(out)


@register(
    "op197_audio_dominant_freq",
    oracle=_OP197_SQL,
    deps=(_gen_sine_wav, _dominant_freq, _codecs_kernel),
)
def op197_audio_dominant_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSP feature extraction, certified: pure sine tones planted
    EXACTLY on FFT bins (bin 3..81 of a 1024-sample frame) are
    WAV-encoded, decoded by the real RIFF parser, and their dominant
    frequency recovered via numpy rfft + argmax — the first step of
    every audio-embedding / spectrogram pipeline. Because each tone
    sits on an exact bin, the int16 quantization of the sine cannot
    move the argmax, so the extracted bin is deterministic and the
    oracle states it in closed form: a hash match certifies
    decode + FFT + peak-pick end to end. sf_dir unused
    (self-generated corpus); payloads never shuffle."""
    gen = spark.range(_FFT_N).repartition(8).mapInPandas(
        _gen_sine_wav, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _dominant_freq,
        "asset_id long, n_samples long, dominant_bin long,"
        " dominant_freq_hz double",
    )


# ------------------------------------------------------- BMP resize

_RS_FACTOR = 2  # 2x2 box-average downscale


_OP198_SQL = f"""
WITH a AS (
  SELECT range AS i,
         16 + (range % 4) * 8 AS w,
         8 + (range % 3) * 8 AS h
  FROM range(0, {_BMP_N})
),
px AS (
  SELECT a.i, a.w, a.h, r.rr, c.cc,
         (a.i + 3 * r.rr + 7 * c.cc) % 256 AS red,
         (2 * a.i + 5 * r.rr + c.cc) % 256 AS grn,
         (3 * a.i + r.rr + 2 * c.cc) % 256 AS blu
  FROM a, UNNEST(range(0, a.h)) AS r(rr), UNNEST(range(0, a.w)) AS c(cc)
),
small AS (
  SELECT i, w, h, rr // {_RS_FACTOR} AS sr, cc // {_RS_FACTOR} AS sc,
         SUM(red) // {_RS_FACTOR * _RS_FACTOR} AS red,
         SUM(grn) // {_RS_FACTOR * _RS_FACTOR} AS grn,
         SUM(blu) // {_RS_FACTOR * _RS_FACTOR} AS blu
  FROM px GROUP BY i, w, h, sr, sc
)
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(w // {_RS_FACTOR} AS BIGINT) AS out_width,
       CAST(h // {_RS_FACTOR} AS BIGINT) AS out_height,
       CAST(SUM(red) AS BIGINT) AS sum_r,
       CAST(SUM(grn) AS BIGINT) AS sum_g,
       CAST(SUM(blu) AS BIGINT) AS sum_b
FROM small GROUP BY i, w, h
"""


def _resize_bmp_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import decode_bmp

    f = _RS_FACTOR
    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "out_width", "out_height", "sum_r", "sum_g", "sum_b")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, px = decode_bmp(bytes(payload))
            p = px.astype(np.int64)
            ow, oh = w // f, h // f
            # 2x2 box average with floor division — integer-exact
            small = (
                p[: oh * f, : ow * f]
                .reshape(oh, f, ow, f, 3)
                .sum(axis=(1, 3))
                // (f * f)
            )
            sums = small.sum(axis=(0, 1))
            out["asset_id"].append(int(aid))
            out["out_width"].append(ow)
            out["out_height"].append(oh)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(out)


@register(
    "op198_bmp_resize",
    oracle=_OP198_SQL,
    deps=(_gen_bmp, _resize_bmp_stats, _codecs_kernel),
)
def op198_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE, for real: the decoded BMPs downscale 2× by
    integer-exact box averaging (sum of each 2×2 block, floor-div 4 —
    the standard antialiased downscale, kept in int64 so the
    closed-form oracle can restate it exactly). Completes the
    decode / feature-extract / RESIZE / frame-sample verb set the
    north-star multimodal family promises, with a working kernel.
    Payloads and pixel arrays never leave their task; only the
    resized-image summary rows continue."""
    gen = spark.range(_BMP_N).repartition(8).mapInPandas(
        _gen_bmp, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _resize_bmp_stats,
        "asset_id long, out_width long, out_height long,"
        " sum_r long, sum_g long, sum_b long",
    )


# ------------------------------------------------------- audio frames

_FR_LEN = 32   # samples per frame
_FR_TOPK = 3   # loudest frames reported per asset


_OP199_SQL = f"""
WITH a AS (SELECT range AS i FROM range(0, {_WAV_N})),
s AS (
  SELECT a.i, u.k // {_FR_LEN} AS frame_idx,
         ((a.i * 31 + u.k * 7) % 2001) - 1000 AS v
  FROM a, UNNEST(range(0, 400 + (a.i % 5) * 100)) AS u(k)
),
fr AS (
  SELECT i, frame_idx,
         CAST(SUM(v * v) AS BIGINT) AS energy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s GROUP BY i, frame_idx
),
r AS (
  SELECT i, frame_idx, energy,
         ROW_NUMBER() OVER (PARTITION BY i
                            ORDER BY energy DESC, frame_idx) AS rnk
  FROM fr WHERE n = {_FR_LEN}
)
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       energy,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {_FR_TOPK}
"""


def _loudest_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.codecs import decode_wav

    for pdf in it:
        out = {k: [] for k in ("asset_id", "frame_idx", "energy", "rnk")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            _rate, _ch, n, s = decode_wav(bytes(payload))
            nf = n // _FR_LEN  # complete frames only (matches oracle)
            e = (
                s[: nf * _FR_LEN]
                .astype(np.int64)
                .reshape(nf, _FR_LEN)
            )
            energy = (e * e).sum(axis=1)
            order = sorted(range(nf), key=lambda j: (-energy[j], j))
            for rnk, j in enumerate(order[:_FR_TOPK], start=1):
                out["asset_id"].append(int(aid))
                out["frame_idx"].append(j)
                out["energy"].append(int(energy[j]))
                out["rnk"].append(rnk)
        yield pd.DataFrame(out)


@register(
    "op199_audio_loudest_frames",
    oracle=_OP199_SQL,
    deps=(_gen_wav, _loudest_frames, _codecs_kernel),
)
def op199_audio_loudest_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FRAME-SAMPLING, for real: decoded PCM splits into
    32-sample frames and the 3 loudest frames per asset are reported
    (frame energy = exact int64 sum of squares; deterministic
    tiebreak) — the clip-selection step audio training pipelines run
    before feature extraction (keep the energetic windows, drop
    silence). The oracle restates frame bucketing and top-k from the
    generation formula. Payloads never shuffle; the per-asset top-k
    runs inside the decode task."""
    gen = spark.range(_WAV_N).repartition(8).mapInPandas(
        _gen_wav, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _loudest_frames,
        "asset_id long, frame_idx long, energy long, rnk long",
    )


# ------------------------------------------------------- cross-modal join

_OP200_SQL = f"""
WITH wav AS (
  SELECT CAST(i AS BIGINT) AS asset_id,
         CAST(SUM(v * v) AS BIGINT) AS sum_sq
  FROM (
    SELECT a.i, ((a.i * 31 + u.k * 7) % 2001) - 1000 AS v
    FROM (SELECT range AS i FROM range(0, {_WAV_N})) a,
         UNNEST(range(0, 400 + (a.i % 5) * 100)) AS u(k)
  ) GROUP BY i
),
bmp AS (
  SELECT CAST(i AS BIGINT) AS asset_id,
         CAST(SUM((i + 3 * r.rr + 7 * c.cc) % 256) AS BIGINT) AS sum_r
  FROM (SELECT range AS i, 16 + (range % 4) * 8 AS w, 8 + (range % 3) * 8 AS h
        FROM range(0, {_BMP_N})) a,
       UNNEST(range(0, a.h)) AS r(rr), UNNEST(range(0, a.w)) AS c(cc)
  GROUP BY i
)
SELECT w.asset_id, w.sum_sq, b.sum_r
FROM wav w JOIN bmp b ON w.asset_id = b.asset_id
"""


@register(
    "op200_multimodal_fuse",
    oracle=_OP200_SQL,
    deps=(_gen_wav, _decode_wav_features, _gen_bmp, _decode_bmp_stats,
          _codecs_kernel),
)
def op200_multimodal_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal fusion: decoded AUDIO features join decoded IMAGE
    features on asset_id — the end-to-end multimodal pipeline (two
    independent decode stages, each confined to its own tasks, meeting
    in one equi-join of fixed-width feature rows). op82 proved
    text⋈vector; this is its decoded-media sibling, and the join input
    on each side is the certified output of op195/op196 — bytes were
    decoded for real upstream, but only integer features ever reach
    the shuffle. The oracle recomputes both sides from the generation
    formulas and joins them itself."""
    wav = spark.range(_WAV_N).repartition(8).mapInPandas(
        _gen_wav, "asset_id long, payload binary"
    ).mapInPandas(
        _decode_wav_features,
        "asset_id long, sample_rate long, n_samples long,"
        " duration_ms long, sum_sq long, peak long",
    ).select("asset_id", "sum_sq")
    bmp = spark.range(_BMP_N).repartition(8).mapInPandas(
        _gen_bmp, "asset_id long, payload binary"
    ).mapInPandas(
        _decode_bmp_stats,
        "asset_id long, width long, height long,"
        " sum_r long, sum_g long, sum_b long",
    ).select("asset_id", "sum_r")
    return wav.join(bmp, "asset_id")


# ------------------------------------------------------------------ JPEG

_JPEG_N = 80       # op202 AC-rich corpus
_JPEG_DC_N = 60    # op203 DC-only corpus

# Annex K luminance quant table in ZIGZAG order, inlined for the
# oracle (the dequantizer multiplies coefficient k by this, so the
# coefficient-domain features are exact-integer recomputable in SQL).
_QZZ_SQL = None  # filled below from sources.jpeg to keep one source of truth


def _qzz_literal() -> str:
    from ocdb_server_spark.sources.jpeg import QTABLE_ZZ

    return "[" + ", ".join(str(int(q)) for q in QTABLE_ZZ) + "]"


_OP202_SQL = None  # assigned after _qzz_literal is usable at import time


def _gen_jpeg_ac(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.jpeg import encode_jpeg_gray

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            w = 16 + (i % 3) * 8
            h = 8 + (i % 2) * 8
            nb = (w // 8) * (h // 8)
            qc = np.zeros((nb, 64), dtype=np.int64)
            for b in range(nb):
                qc[b, 0] = (i * 7 + b * 13) % 127 - 63
                for k in range(4):
                    p = 1 + ((i * 5 + b * 11 + k * 17) % 63)
                    qc[b, p] = (i * 3 + b * 5 + k * 7) % 19 - 9
            ids.append(i)
            payloads.append(encode_jpeg_gray(qc, w, h))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_jpeg_coef_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.jpeg import QTABLE_ZZ, decode_jpeg_gray

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "width", "height", "n_blocks",
                "dc_sum_deq", "ac_nonzero", "ac_abs_deq")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, qc, _px = decode_jpeg_gray(bytes(payload))
            out["asset_id"].append(int(aid))
            out["width"].append(w)
            out["height"].append(h)
            out["n_blocks"].append(qc.shape[0])
            out["dc_sum_deq"].append(int(qc[:, 0].sum()) * int(QTABLE_ZZ[0]))
            out["ac_nonzero"].append(int(np.count_nonzero(qc[:, 1:])))
            out["ac_abs_deq"].append(
                int((np.abs(qc[:, 1:]) * QTABLE_ZZ[1:]).sum())
            )
        yield pd.DataFrame(out)


def _op202_sql() -> str:
    return f"""
WITH a AS (SELECT range AS i,
                  16 + (range % 3) * 8 AS w,
                  8 + (range % 2) * 8 AS h
           FROM range(0, {_JPEG_N})),
blk AS (SELECT a.i, a.w, a.h, (a.w // 8) * (a.h // 8) AS nb, u.b
        FROM a, UNNEST(range(0, (a.w // 8) * (a.h // 8))) AS u(b)),
ac AS (SELECT blk.i,
              1 + ((blk.i * 5 + blk.b * 11 + k.k * 17) % 63) AS p,
              (blk.i * 3 + blk.b * 5 + k.k * 7) % 19 - 9 AS v
       FROM blk, UNNEST(range(0, 4)) AS k(k)),
dcs AS (SELECT i, SUM((i * 7 + b * 13) % 127 - 63) * 16 AS dc_sum_deq,
               ANY_VALUE(w) AS w, ANY_VALUE(h) AS h, ANY_VALUE(nb) AS nb
        FROM blk GROUP BY i),
acs AS (SELECT i,
               COUNT(*) FILTER (WHERE v <> 0) AS ac_nonzero,
               COALESCE(SUM(ABS(v) * {_qzz_literal()}[p + 1])
                        FILTER (WHERE v <> 0), 0) AS ac_abs_deq
        FROM ac GROUP BY i)
SELECT CAST(d.i AS BIGINT) AS asset_id,
       CAST(d.w AS BIGINT) AS width,
       CAST(d.h AS BIGINT) AS height,
       CAST(d.nb AS BIGINT) AS n_blocks,
       CAST(d.dc_sum_deq AS BIGINT) AS dc_sum_deq,
       CAST(a.ac_nonzero AS BIGINT) AS ac_nonzero,
       CAST(a.ac_abs_deq AS BIGINT) AS ac_abs_deq
FROM dcs d JOIN acs a ON d.i = a.i
"""


@register(
    "op202_jpeg_decode_stats",
    oracle=_op202_sql(),
    deps=(_gen_jpeg_ac, _decode_jpeg_coef_stats, _jpeg_kernel),
)
def op202_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-format decode, for real (round-5 verdict item 4): 80
    baseline JPEGs are built by the known-coefficient writer (quantized
    zigzag coefficients from closed-form formulas — 4 scattered AC
    positions per block exercise run-lengths, ZRL, EOB, negative
    amplitudes; per-block DC exercises the differential predictor) and
    DECODED by the real parser in sources/jpeg.py: marker walk, DQT,
    canonical Huffman build from DHT, bit-reader with 0xFF00 stuffing,
    entropy decode, dequantize. Features are coefficient-domain exact
    integers — dequantized DC sum, nonzero-AC count, |dequantized AC|
    sum (quant table indexed by ZIGZAG position) — so the DuckDB oracle
    recomputes them from the formulas without seeing a byte: a hash
    match certifies the entire entropy-decode + dequantization path.
    The IDCT/pixel path is certified by op203's hash and by the
    javax.imageio interop tests in tests/test_codecs.py. Payload bytes
    never shuffle (mapInPandas stages, same contract as op195)."""
    gen = spark.range(_JPEG_N).repartition(8).mapInPandas(
        _gen_jpeg_ac, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_jpeg_coef_stats,
        "asset_id long, width long, height long, n_blocks long,"
        " dc_sum_deq long, ac_nonzero long, ac_abs_deq long",
    )


def _gen_jpeg_dc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.jpeg import encode_jpeg_gray

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            w = 16 + (i % 4) * 8
            h = 8 + (i % 3) * 8
            nb = (w // 8) * (h // 8)
            qc = np.zeros((nb, 64), dtype=np.int64)
            for b in range(nb):
                qc[b, 0] = (i * 11 + b * 7) % 127 - 63
            ids.append(i)
            payloads.append(encode_jpeg_gray(qc, w, h))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_jpeg_pixel_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.jpeg import decode_jpeg_gray

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "width", "height", "pixel_sum",
                "min_px", "max_px")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, _qc, px = decode_jpeg_gray(bytes(payload))
            p64 = px.astype(np.int64)
            out["asset_id"].append(int(aid))
            out["width"].append(w)
            out["height"].append(h)
            out["pixel_sum"].append(int(p64.sum()))
            out["min_px"].append(int(p64.min()))
            out["max_px"].append(int(p64.max()))
        yield pd.DataFrame(out)


_OP203_SQL = f"""
WITH a AS (SELECT range AS i,
                  16 + (range % 4) * 8 AS w,
                  8 + (range % 3) * 8 AS h
           FROM range(0, {_JPEG_DC_N})),
blk AS (SELECT a.i, a.w, a.h,
               ((a.i * 11 + u.b * 7) % 127 - 63) * 2 + 128 AS pv
        FROM a, UNNEST(range(0, (a.w // 8) * (a.h // 8))) AS u(b))
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(ANY_VALUE(w) AS BIGINT) AS width,
       CAST(ANY_VALUE(h) AS BIGINT) AS height,
       CAST(SUM(pv) * 64 AS BIGINT) AS pixel_sum,
       CAST(MIN(pv) AS BIGINT) AS min_px,
       CAST(MAX(pv) AS BIGINT) AS max_px
FROM blk GROUP BY i
"""


@register(
    "op203_jpeg_pixel_decode",
    oracle=_OP203_SQL,
    deps=(_gen_jpeg_dc, _decode_jpeg_pixel_stats, _jpeg_kernel),
)
def op203_jpeg_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG PIXEL path, hash-certified: DC-only baseline JPEGs decode
    to exactly-known flat blocks — a dequantized DC of 16·qdc yields
    IDCT output DC/8 = 2·qdc on every pixel, so pixel = 2·qdc + 128
    exactly (|qdc| ≤ 63 keeps it in [2, 254]: no clamping, and the
    float IDCT's ~1e-13 error cannot move an integer target across a
    rounding boundary). The oracle restates that closed form, which
    means THE HASH CERTIFIES THE DECODER'S IDCT + level-shift + round
    + clamp pipeline — the one stage op202's coefficient-domain
    features cannot see. AC-rich pixel output (where IDCT rounding is
    implementation-defined ±1, per T.81's accuracy clause) is covered
    by the javax.imageio cross-implementation tests instead."""
    gen = spark.range(_JPEG_DC_N).repartition(8).mapInPandas(
        _gen_jpeg_dc, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_jpeg_pixel_stats,
        "asset_id long, width long, height long, pixel_sum long,"
        " min_px long, max_px long",
    )


# ------------------------------------------------------------------- PNG

_PNG_N = 60


def _gen_png(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.png import encode_png_gray

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            w = 20 + (i % 5) * 7
            h = 10 + (i % 4) * 5
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            px = ((i * 13 + r * 7 + c * 3) % 256).astype(np.uint8)
            ids.append(i)
            # default filter schedule cycles 0..4: every PNG filter's
            # RECONSTRUCTION is load-bearing in the certified hash
            payloads.append(encode_png_gray(px))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_png_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.png import decode_png_gray

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "width", "height", "pixel_sum", "min_px", "max_px")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, px = decode_png_gray(bytes(payload))
            p64 = px.astype(np.int64)
            out["asset_id"].append(int(aid))
            out["width"].append(w)
            out["height"].append(h)
            out["pixel_sum"].append(int(p64.sum()))
            out["min_px"].append(int(p64.min()))
            out["max_px"].append(int(p64.max()))
        yield pd.DataFrame(out)


_OP205_SQL = f"""
WITH a AS (SELECT range AS i,
                  20 + (range % 5) * 7 AS w,
                  10 + (range % 4) * 5 AS h
           FROM range(0, {_PNG_N})),
px AS (SELECT a.i, a.w, a.h, (a.i * 13 + r.r * 7 + c.c * 3) % 256 AS v
       FROM a, UNNEST(range(0, a.h)) AS r(r), UNNEST(range(0, a.w)) AS c(c))
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(ANY_VALUE(w) AS BIGINT) AS width,
       CAST(ANY_VALUE(h) AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       CAST(MIN(v) AS BIGINT) AS min_px,
       CAST(MAX(v) AS BIGINT) AS max_px
FROM px GROUP BY i
"""


@register(
    "op205_png_decode_stats",
    oracle=_OP205_SQL,
    deps=(_gen_png, _decode_png_stats, _png_kernel),
)
def op205_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode, for real and LOSSLESS: 60 grayscale PNGs (pixels
    from a closed-form formula, per-row filter types cycling through
    all five — None/Sub/Up/Average/Paeth) are encoded with
    sources/png.py and decoded back: chunk walk with CRC32 verify,
    zlib inflate, filter reconstruction. Because PNG is lossless the
    features are the EXACT pixels' sum/min/max and the oracle
    recomputes them from the generation formula — the hash certifies
    the whole codec with no coefficient-domain indirection (contrast
    op202/op203's split JPEG certification). Two-way javax.imageio
    interop (our bytes there, its bytes here, both pixel-exact) is in
    tests/test_codecs.py. Same no-payload-shuffle contract as the
    whole codec family."""
    gen = spark.range(_PNG_N).repartition(8).mapInPandas(
        _gen_png, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_png_stats,
        "asset_id long, width long, height long, pixel_sum long,"
        " min_px long, max_px long",
    )


# ------------------------------------------------------------------- GIF

_GIF_N = 60


def _gen_gif(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.gif import encode_gif_gray

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            w = 18 + (i % 6) * 9
            h = 12 + (i % 5) * 6
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            if i % 3 == 2:
                # low-entropy stripes: long runs exercise deep LZW
                # prefixes and the KwKwK reconstruction path
                px = np.broadcast_to(
                    (((r // 3) * 17 + i * 5) % 256).astype(np.uint8), (h, w)
                )
            else:
                px = ((i * 13 + r * 7 + c * 3) % 256).astype(np.uint8)
            ids.append(i)
            payloads.append(encode_gif_gray(px))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_gif_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.gif import decode_gif_gray

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "width", "height", "pixel_sum", "min_px", "max_px")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            w, h, px = decode_gif_gray(bytes(payload))
            p64 = px.astype(np.int64)
            out["asset_id"].append(int(aid))
            out["width"].append(w)
            out["height"].append(h)
            out["pixel_sum"].append(int(p64.sum()))
            out["min_px"].append(int(p64.min()))
            out["max_px"].append(int(p64.max()))
        yield pd.DataFrame(out)


_OP222_SQL = f"""
WITH a AS (SELECT range AS i,
                  18 + (range % 6) * 9 AS w,
                  12 + (range % 5) * 6 AS h
           FROM range(0, {_GIF_N})),
px AS (SELECT a.i, a.w, a.h,
              CASE WHEN a.i % 3 = 2
                   THEN ((r.r // 3) * 17 + a.i * 5) % 256
                   ELSE (a.i * 13 + r.r * 7 + c.c * 3) % 256 END AS v
       FROM a, UNNEST(range(0, a.h)) AS r(r), UNNEST(range(0, a.w)) AS c(c))
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST(ANY_VALUE(w) AS BIGINT) AS width,
       CAST(ANY_VALUE(h) AS BIGINT) AS height,
       CAST(SUM(v) AS BIGINT) AS pixel_sum,
       CAST(MIN(v) AS BIGINT) AS min_px,
       CAST(MAX(v) AS BIGINT) AS max_px
FROM px GROUP BY i
"""


@register(
    "op222_gif_decode_stats",
    oracle=_OP222_SQL,
    deps=(_gen_gif, _decode_gif_stats, _gif_kernel),
)
def op222_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode for real — the THIRD compressed image format and the
    remaining classic compression family: LZW with variable-width
    codes (JPEG covered lossy DCT+Huffman, PNG covered DEFLATE). 60
    grayscale-palette GIFs from a closed-form formula (one corpus
    slice is low-entropy stripes so deep LZW prefixes and the KwKwK
    self-referential code path are load-bearing) are encoded by
    sources/gif.py's REAL compressing LZW encoder and decoded back:
    container walk, palette handling, variable-width code unpack,
    dictionary reconstruction, CLEAR resets, 4-pass interlace
    support. Lossless ⇒ the oracle restates exact pixel sums from
    the generation formula — the hash certifies the entire codec.
    Two-way javax.imageio interop (incl. its INTERLACED output) in
    tests/test_codecs.py. No payload ever shuffles (mapInPandas both
    stages, codec-family contract)."""
    gen = spark.range(_GIF_N).repartition(8).mapInPandas(
        _gen_gif, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_gif_stats,
        "asset_id long, width long, height long, pixel_sum long,"
        " min_px long, max_px long",
    )

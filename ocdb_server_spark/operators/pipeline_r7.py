"""Round-7 pipeline extensions — SURVEY.md §2.19 (op251+).

Round 7 deliberately adds only FOUR ops (round-6 verdict item 1: the
driver's ~50 sweep slots must reach the 61 ops whose evidence is still
r1/r2-era, so the new-op budget stays minimal — 46 of 50 slots still
land on stale re-certification):

- op251: FLAC decode — the last closable codec family (lossless
  compressed audio): sources/flac.py implements the public FLAC spec
  subset (fixed predictors 0-4 AND LPC subframes to order 8, mono AND
  stereo in all four channel layouts, wasted bits, Rice residuals
  with partitioning and raw escapes, CRC-8/CRC-16, STREAMINFO MD5)
  and the op hash-certifies the full encode→bytes→decode→features
  path against a closed-form SQL oracle that recomputes the features
  from the sample-generation formula without seeing a byte (op205's
  oracle pattern — losslessness makes it applicable verbatim); the
  corpus pairs every predictor with every channel layout.
- op252: Avro Object Container File round-trip — the one mainstream
  interchange format addable without jars: sources/avro_ocf.py
  implements the public Avro binary encoding + OCF layout (null and
  deflate codecs, nested records/arrays/maps/enums/fixed/unions) with
  spec schema RESOLUTION compiled recursively; the op writes one OCF
  file per partition executor-side, re-reads them with an EVOLVED
  reader schema (top-level reorder + NESTED writer-only field dropped
  + NESTED reader-only field defaulted + array items promoted
  int→long), and the re-read aggregate must hash-match the oracle
  computed on the ORIGINAL parquet. Two-way interop with the JVM
  avro-1.12 library on Spark's classpath is pinned in
  tests/test_codecs.py (the javax.imageio pattern).
- op253: DAMPED-TREND Holt forecasting (op231's completion, §7.6
  round-7 item 2): φ=1/2 damping is one more halving term in the
  integer recurrence, so level/trend/h=1..5 forecasts stay bit-exact
  against DuckDB's actual WITH RECURSIVE; the damped forecast sum
  Σφ^i·b is repeated integer halving, exact on both engines.
- op254: MULTIPLICATIVE Holt-Winters — the forecasting family's last
  named variant (round-6 verdict missing #3): seasonal RATIOS carried
  as 2^20 fixed-point integers, every recurrence division
  positive-guarded so `//` floors identically cross-engine, and the
  forecast's signed division offset-shifted (DuckDB's `//` truncates
  toward zero on negatives where python floors — a new dialect gotcha
  recorded here; _hw_f2's offset pattern applied to a variable
  divisor).

Same package rules: DataFrame/Catalyst only, Python only inside
Arrow-batched mapInPandas kernels, payload bytes never shuffle,
cross-engine floats quantized to int64 before any sum.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register
from ocdb_server_spark.scratch import scratch_dir

# Codec kernels declared as register deps (round-14): the ops below are
# hash-certified THROUGH these parsers, so a kernel rewrite re-fronts
# them in the driver sweep exactly like an oracle edit.
from ocdb_server_spark.sources import avro_ocf as _avro_kernel
from ocdb_server_spark.sources import flac as _flac_kernel


# --------------------------------------------------------------------------
# op251: FLAC decode features — lossless compressed audio, closed-form oracle
# --------------------------------------------------------------------------

_FLAC_N = 120
_FLAC_RATE = 8000
# signal: v(i, k, c) = ((i*17 + k*13 + c*29) % 1601) - 800 for channel
# c, n = 300 + (i%4)*150 per channel (int16-safe; sawtooth-ish so
# predictors genuinely compress). Assets with i%4==3 are STEREO
# (channels 0/1), the rest mono; the encoder path varies per asset —
# predictor lpc/fixed by i%3 (i%3==0 spans both parities, so STEREO
# assets get LPC too: each of the four stereo layouts pairs with LPC
# somewhere in the corpus — i=3,51,99 independent, 39,87 left/side,
# 27,75 right/side, 15,63,111 mid/side), stereo decorrelation mode
# cycling through all four layouts by i//4 — so the oracle hash
# certifies every subframe and channel-reconstruction path the
# decoder has, including LPC on the 17-bit side channel.

_OP251_SQL = f"""
WITH a AS (SELECT range AS i FROM range(0, {_FLAC_N})),
ch AS (
  SELECT a.i, c.c
  FROM a, UNNEST(range(0, 1 + CASE WHEN a.i % 4 = 3 THEN 1 ELSE 0 END)) c(c)
),
s AS (
  SELECT ch.i, ch.c, u.k,
         ((ch.i * 17 + u.k * 13 + ch.c * 29) % 1601) - 800 AS v
  FROM ch, UNNEST(range(0, 300 + (ch.i % 4) * 150)) AS u(k)
)
SELECT CAST(i AS BIGINT) AS asset_id,
       CAST({_FLAC_RATE} AS BIGINT) AS sample_rate,
       CAST(MAX(c) + 1 AS BIGINT) AS channels,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST((300 + (i % 4) * 150) * 1000 // {_FLAC_RATE} AS BIGINT)
         AS duration_ms,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak,
       CAST(MIN(CASE WHEN c = 0 AND k = 0 THEN v END) AS BIGINT) AS first_s,
       CAST(MIN(CASE WHEN c = CASE WHEN i % 4 = 3 THEN 1 ELSE 0 END
                     AND k = 300 + (i % 4) * 150 - 1 THEN v END) AS BIGINT)
         AS last_s
FROM s GROUP BY i
"""

_FLAC_MODES = ("independent", "left_side", "right_side", "mid_side")


def _gen_flac(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.flac import encode_flac

    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            i = int(i)
            n = 300 + (i % 4) * 150
            k = np.arange(n, dtype=np.int64)
            chans = [((i * 17 + k * 13 + c * 29) % 1601 - 800)
                     for c in range(1 + (i % 4 == 3))]
            if len(chans) == 2:
                s = np.stack(chans, axis=1).astype(np.int16)
            else:
                s = chans[0].astype(np.int16)
            ids.append(i)
            payloads.append(encode_flac(
                s, _FLAC_RATE, blocksize=256,
                predictor="lpc" if i % 3 == 0 else "fixed",
                stereo_mode=_FLAC_MODES[(i // 4) % 4],
            ))
        yield pd.DataFrame({"asset_id": ids, "payload": payloads})


def _decode_flac_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ocdb_server_spark.sources.flac import decode_flac

    for pdf in it:
        out = {k: [] for k in
               ("asset_id", "sample_rate", "channels", "n_samples",
                "duration_ms", "sum_sq", "peak", "first_s", "last_s")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            rate, s = decode_flac(bytes(payload))
            # interleaved flatten: mono is identity; stereo gives
            # L0 R0 L1 R1 ... so first = left[0], last = right[-1]
            s64 = np.asarray(s, dtype=np.int64).reshape(-1)
            n_per_ch = s.shape[0]
            out["asset_id"].append(int(aid))
            out["sample_rate"].append(rate)
            out["channels"].append(1 if s.ndim == 1 else s.shape[1])
            out["n_samples"].append(s64.size)
            out["duration_ms"].append(n_per_ch * 1000 // rate)
            out["sum_sq"].append(int(np.sum(s64 * s64)))
            out["peak"].append(int(np.max(np.abs(s64))))
            out["first_s"].append(int(s64[0]))
            out["last_s"].append(int(s64[-1]))
        yield pd.DataFrame(out)


@register(
    "op251_flac_decode_features",
    oracle=_OP251_SQL,
    # certification rides the FLAC kernel: a rewrite of the parser
    # must re-front this op (round-14 — codec kernels as deps)
    deps=(_gen_flac, _decode_flac_features, _flac_kernel),
)
def op251_flac_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC audio decode, for real — the compressed-audio gap closed:
    120 conformant 16-bit FLAC streams (90 mono + 30 STEREO,
    multi-frame) are encoded from a closed-form integer formula and
    then DECODED by sources/flac.py's spec parser — CRC-8/CRC-16
    verified per frame and the STREAMINFO MD5 recomputed over the
    decoded (interleaved) samples, so every asset that reaches the
    feature row is bit-certified lossless by the format's own
    integrity machinery.

    The corpus deliberately spans the decoder's whole surface: the
    encoder alternates LPC (Levinson-Durbin, quantized-coefficient
    integer prediction) and FIXED predictors per asset, Rice partition
    orders 0/1 per frame, keeps the raw-escape path reachable, and
    cycles the stereo assets through all four channel layouts
    (independent, left/side, right/side, mid/side — the side channel's
    17th bit included), so the oracle hash certifies every subframe
    type and channel-reconstruction rule, not just one happy path.

    The oracle recomputes channels / n_samples / duration / energy /
    peak / first / last from the generation formula alone (op205's
    closed-form pattern: for a LOSSLESS codec the decode output is
    exactly the generation formula, so a hash match certifies the
    whole encode→Rice-bits→decode path, not the plumbing).

    Scale shape: generation and decode are both mapInPandas stages —
    payload bytes live and die inside one task (never shuffled); only
    fixed-width integer feature rows continue (op195's contract).
    sf_dir unused: self-generated corpus (op152's stance)."""
    gen = spark.range(_FLAC_N).repartition(8).mapInPandas(
        _gen_flac, "asset_id long, payload binary"
    )
    return gen.mapInPandas(
        _decode_flac_features,
        "asset_id long, sample_rate long, channels long, n_samples long,"
        " duration_ms long, sum_sq long, peak long, first_s long, last_s long",
    )


# --------------------------------------------------------------------------
# op252: Avro OCF source/sink round-trip with schema evolution
# --------------------------------------------------------------------------

_AVRO_WRITER_SCHEMA = {
    "type": "record",
    "name": "Document",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "meta", "type": {
            "type": "record", "name": "DocMeta",
            "fields": [
                {"name": "lang", "type": "string"},
                {"name": "source", "type": "string"},
            ]}},
        {"name": "n_chars", "type": "long"},
        # derived columns exercising every complex encoding:
        # tokens = [n_chars, n_chars%97, doc_id%31] as Avro INTs
        {"name": "tokens", "type": {"type": "array", "items": "int"}},
        # attrs = {"n2": 2*n_chars+1}
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        # null when doc_id%5==0 else 2*n_chars (a real 3-branch union)
        {"name": "maybe_score", "type": ["null", "long", "string"]},
    ],
}
# evolved reader — every spec resolution rule, including RECURSIVELY
# inside the nested record: top-level fields reordered; nested
# writer-only 'source' dropped; nested reader-only 'quality'
# defaulted; array items promoted int→long; the union re-read as the
# same 3-branch union
_AVRO_READER_SCHEMA = {
    "type": "record",
    "name": "Document",
    "fields": [
        {"name": "tokens", "type": {"type": "array", "items": "long"}},
        {"name": "meta", "type": {
            "type": "record", "name": "DocMeta",
            "fields": [
                {"name": "quality", "type": "long", "default": -1},
                {"name": "lang", "type": "string"},
            ]}},
        {"name": "doc_id", "type": "long"},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "maybe_score", "type": ["null", "long", "string"]},
        {"name": "n_chars", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}

_OP252_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_chars,
       CAST(SUM(n_chars + n_chars % 97 + doc_id % 31) AS BIGINT)
         AS sum_tokens,
       CAST(SUM(2 * n_chars + 1) AS BIGINT) AS sum_attr_n2,
       CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_scores,
       CAST(SUM(CASE WHEN doc_id % 5 <> 0 THEN 2 * n_chars ELSE 0 END)
         AS BIGINT) AS sum_scores,
       CAST(SUM(-1) AS BIGINT) AS sum_quality
FROM documents
GROUP BY lang
"""


def _avro_write_parts(out_dir: str):
    def write(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from ocdb_server_spark.sources.avro_ocf import write_ocf

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in it:
            for r in pdf.to_dict("records"):
                did, nch = int(r["doc_id"]), int(r["n_chars"])
                rows.append({
                    "doc_id": did,
                    "text": r["text"],
                    "meta": {"lang": r["lang"], "source": r["source"]},
                    "n_chars": nch,
                    "tokens": [nch, nch % 97, did % 31],
                    "attrs": {"n2": 2 * nch + 1},
                    "maybe_score": None if did % 5 == 0 else 2 * nch,
                })
        # codec alternates per partition so every run exercises both
        # the null and the deflate block path
        codec = "deflate" if pid % 2 else "null"
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(write_ocf(_AVRO_WRITER_SCHEMA, rows, codec=codec,
                              rows_per_block=500))
        os.replace(tmp, path)  # atomic publish (op03's fixture rule)
        yield pd.DataFrame({"path": [path], "n_rows": [len(rows)]})

    return write


def _avro_read_parts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ocdb_server_spark.sources.avro_ocf import read_ocf

    for pdf in it:
        for content in pdf["content"]:
            rows = read_ocf(bytes(content), reader_schema=_AVRO_READER_SCHEMA)
            # flatten the reader-shaped values into feature columns:
            # nested record access (incl. the nested default), array
            # sum over promoted longs, map lookup, union branch check
            yield pd.DataFrame({
                "lang": [r["meta"]["lang"] for r in rows],
                "doc_id": [r["doc_id"] for r in rows],
                "quality": [r["meta"]["quality"] for r in rows],
                "n_chars": [r["n_chars"] for r in rows],
                "text_chars": [len(r["text"]) for r in rows],
                "tok_sum": [sum(r["tokens"]) for r in rows],
                "attr_n2": [r["attrs"]["n2"] for r in rows],
                "score_is_null": [r["maybe_score"] is None for r in rows],
                "score": [r["maybe_score"] or 0 for r in rows],
            })


@register(
    "op252_avro_roundtrip",
    oracle=_OP252_SQL,
    deps=(_avro_write_parts, _avro_read_parts, _avro_kernel),
)
def op252_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVRO Object Container File round-trip with SCHEMA EVOLUTION —
    the interchange-format gap (round-6 verdict item 5) closed in
    pure Python: documents is exported executor-side as one OCF file
    per partition (codec alternating null/deflate so both block paths
    run), with the full COMPLEX-TYPE surface in the writer schema — a
    NESTED record (meta{lang,source}), an array<int> of derived token
    counts, a map<string,long>, and a genuine 3-branch union
    [null,long,string] — then re-read through the binaryFile source +
    the spec's schema-resolution rules with an EVOLVED reader schema:
    top-level fields reordered, the nested writer-only 'meta.source'
    skipped, the nested reader-only 'meta.quality' defaulted to -1
    (resolution applied RECURSIVELY inside the record), and the array
    items promoted int→long. The per-lang aggregate over the re-read
    frame (sum_quality = -n_docs proves the nested default fired on
    every row; sum_tokens/sum_attr_n2/n_null_scores/sum_scores prove
    array, map, and union values survived byte-exact) must hash-match
    the oracle computed on the ORIGINAL parquet — value fidelity
    through encode→OCF bytes→resolve→decode.

    Two-way interop with the JVM avro-1.12 library on Spark's own
    classpath (DataFileReader reads our bytes; our reader parses
    DataFileWriter's) is pinned in tests/test_codecs.py.

    Scale shape: encode and decode are mapInPandas stages — payload
    bytes live and die inside one task; the shuffle after decode
    carries (lang, counters) only. One file per partition is exactly
    gzip-JSONL's parallelism story (op207): per-file work
    parallelizes across files; a production writer streams blocks
    instead of buffering the partition. The tiny ≤8-row manifest
    collect() forces the write before the read plan is returned —
    bounded, same class as sinks.py:38."""
    # Per-process dir (concurrent sessions must not unlink files
    # another session's lazy binaryFile plan is about to read) with
    # dead-PID reaping so repeated runs don't accumulate table copies
    # in /tmp — both halves of the policy live in scratch.scratch_dir.
    out_dir = scratch_dir("avro_docs", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    manifest = (
        docs.repartition(8)
        .mapInPandas(_avro_write_parts(out_dir), "path string, n_rows long")
        .collect()
    )
    assert sum(r.n_rows for r in manifest) > 0
    back = (
        spark.read.format("binaryFile")
        .load(out_dir)
        .select("content")
        .mapInPandas(
            _avro_read_parts,
            "lang string, doc_id long, quality long, n_chars long,"
            " text_chars long, tok_sum long, attr_n2 long,"
            " score_is_null boolean, score long",
        )
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
        F.sum("text_chars").cast("bigint").alias("sum_text_chars"),
        F.sum("tok_sum").cast("bigint").alias("sum_tokens"),
        F.sum("attr_n2").cast("bigint").alias("sum_attr_n2"),
        F.sum(F.col("score_is_null").cast("bigint")).cast("bigint")
         .alias("n_null_scores"),
        F.sum("score").cast("bigint").alias("sum_scores"),
        F.sum("quality").cast("bigint").alias("sum_quality"),
    )


# --------------------------------------------------------------------------
# op253: damped-trend Holt — op231 + phi=1/2 damping, integer-exact
# --------------------------------------------------------------------------

_HD_H = 5  # forecast horizon


def _op253_sql() -> str:
    from ocdb_server_spark.operators.pipeline_r6 import _hw_f2

    f2 = lambda x: _hw_f2(x, "//")  # noqa: E731
    # damped level: l' = f2(y + l + phi*b) with phi*b = f2(b)
    pb = f2("h.b")
    l2 = f2(f"d.y + h.l + {pb}")
    # damped trend: b' = f2((l' - l) + phi*b)
    b2 = f2(f"({l2}) - h.l + {pb}")
    # forecast: fc_h = l + sum_{i=1..h} phi^i b  (repeated halving)
    p = ["h.b"]
    for _ in range(_HD_H):
        p.append(f2(p[-1]))
    fcs = ", ".join(
        "h.l + " + " + ".join(p[1:i + 1]) + f" AS fc_{i}"
        for i in range(1, _HD_H + 1)
    )
    return f"""
WITH RECURSIVE bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
spine AS (
  SELECT et.event_type, CAST(t.i AS BIGINT) AS t
  FROM (SELECT DISTINCT event_type FROM events) et,
       bounds b, UNNEST(range(0, CAST(b.d1 - b.d0 AS BIGINT) + 1)) t(i)),
counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events CROSS JOIN bounds b
  GROUP BY event_type, t),
daily AS (
  SELECT s.event_type, s.t, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.t = c.t),
maxt AS (SELECT MAX(t) AS m FROM daily),
init AS (
  SELECT d0.event_type, d0.y AS y0, d1.y AS y1
  FROM daily d0 JOIN daily d1
    ON d0.event_type = d1.event_type AND d0.t = 0 AND d1.t = 1),
hw AS (
  SELECT event_type, CAST(0 AS BIGINT) AS t,
         y0 AS l, y1 - y0 AS b
  FROM init
  UNION ALL
  SELECT h.event_type, h.t + 1,
         {l2} AS l,
         {b2} AS b
  FROM hw h
  JOIN daily d ON d.event_type = h.event_type AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.event_type, h.l AS level, h.b AS trend, {fcs}
FROM hw h CROSS JOIN maxt m WHERE h.t = m.m
"""


@register("op253_holt_damped", oracle=_op253_sql())
def op253_holt_damped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAMPED-TREND Holt forecasting of daily event volumes per
    event_type, α=β=1/2, φ=1/2 — the op231/op235 family's completion
    (§7.6 round-7 item 2): damping multiplies the carried trend by φ
    in both the level update and the forecast path, which with φ=1/2
    is ONE MORE integer halving (f2) per term, so the recurrence and
    the h=1..5 forecasts stay bit-identical between applyInPandas and
    DuckDB's WITH RECURSIVE:

        l_t = f2(y_t + l + f2(b))          (α-average of y and l+φb)
        b_t = f2((l_t − l) + f2(b))        (β-average, damped carry)
        fc_h = l + Σ_{i=1..h} p_i, p_1 = f2(b), p_{i+1} = f2(p_i)

    The damped forecast flattens toward l + b (φ/(1−φ) = 1) instead
    of op231's unbounded linear ramp — the production default for
    horizons past a few periods (damped trend generally beats linear
    on long horizons; the flattening IS the feature).

    Scale: identical to op231 — one shuffle on the series key, a
    ~30-step ordered loop per series inside one task; keys
    parallelize freely (10^6 series = 10^6 independent tasks)."""
    from ocdb_server_spark.operators.pipeline_r6 import _HW_OFF

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).cast("bigint").alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(cast(0 as bigint), cast(datediff(d1, d0) as bigint))")
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )

    def holt_damped(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf["y"].astype(int).tolist()
        f2 = lambda x: (x + _HW_OFF) // 2 - _HW_OFF // 2  # noqa: E731
        l, bt = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            pb = f2(bt)
            l_new = f2(y + l + pb)
            bt = f2(l_new - l + pb)
            l = l_new
        fcs = {}
        acc, p = l, bt
        for h in range(1, _HD_H + 1):
            p = f2(p)
            acc += p
            fcs[f"fc_{h}"] = [acc]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "level": [l],
                "trend": [bt],
                **fcs,
            }
        )

    schema = (
        "event_type string, level long, trend long, "
        + ", ".join(f"fc_{h} long" for h in range(1, _HD_H + 1))
    )
    return daily.groupBy("event_type").applyInPandas(holt_damped, schema)


# --------------------------------------------------------------------------
# op254: multiplicative Holt-Winters — scaled-integer seasonal RATIOS
# --------------------------------------------------------------------------

_HWM_M = 7           # weekly seasonality
_HWM_H = 7           # forecast a full season
_HWM_S = 1 << 20     # fixed-point scale for seasonal ratios (s ≈ ratio·S)


def _op254_sql() -> str:
    from ocdb_server_spark.operators.pipeline_r6 import _hw_f2

    f2 = lambda x: _hw_f2(x, "//")  # noqa: E731
    S = _HWM_S
    s_cols = ", ".join(f"s{i}" for i in range(_HWM_M))
    slot = (
        "CASE CAST((h.t + 1) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HWM_M))
        + " END"
    )
    # deseasonalize with the PRE-update slot value (guarded >= 1):
    # x = y·S // s_prev — operands non-negative, // floors identically
    # in DuckDB and python
    x = f"((d.y * {S}) // GREATEST({slot}, 1))"
    l2 = f2(f"{x} + h.l + h.b")
    s_updates = ", ".join(
        f"CASE WHEN (h.t + 1) % 7 = {i} "
        f"THEN {f2(f'(d.y * {S}) // GREATEST({l2}, 1) + h.s{i}')} "
        f"ELSE h.s{i} END AS s{i}"
        for i in range(_HWM_M)
    )
    y_cols = ", ".join(
        f"MAX(CASE WHEN t = {i} THEN y END) AS y{i}" for i in range(_HWM_M)
    )
    s_inits = ", ".join(
        f"(y{i} * {S}) // GREATEST(l_init, 1) AS s{i}" for i in range(_HWM_M)
    )
    # forecast numerator (l + h·b)·s can be NEGATIVE, and DuckDB's //
    # truncates toward zero there while python floors (-3//2: -1 vs
    # -2) — the same dialect trap _hw_f2's offset already handles for
    # the halvings. Same cure: shift by OFF·S so the numerator is
    # positive (floor == truncate), divide, shift back. |x| ≲ 10¹³ and
    # OFF·S = 2⁶⁰ keeps the sum far inside int64.
    OFF = 1 << 40
    fc = ", ".join(
        f"(((h.l + {h} * h.b) * (CASE CAST((h.t + {h}) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HWM_M))
        + f" END) + {OFF * S}) // {S}) - {OFF} AS fc_{h}"
        for h in range(1, _HWM_H + 1)
    )
    return f"""
WITH RECURSIVE bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
spine AS (
  SELECT et.event_type, CAST(t.i AS BIGINT) AS t
  FROM (SELECT DISTINCT event_type FROM events) et,
       bounds b, UNNEST(range(0, CAST(b.d1 - b.d0 AS BIGINT) + 1)) t(i)),
counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events CROSS JOIN bounds b
  GROUP BY event_type, t),
daily AS (
  SELECT s.event_type, s.t, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.t = c.t),
maxt AS (SELECT MAX(t) AS m FROM daily),
week1 AS (
  SELECT event_type, {y_cols},
         CAST((SUM(CASE WHEN t < 7 THEN y ELSE 0 END)) // 7 AS BIGINT)
           AS l_init
  FROM daily WHERE t < 7 GROUP BY event_type),
hw AS (
  SELECT event_type, CAST(6 AS BIGINT) AS t, l_init AS l,
         CAST(0 AS BIGINT) AS b, {s_inits}
  FROM week1
  UNION ALL
  SELECT h.event_type, h.t + 1,
         {l2} AS l,
         {f2(f"h.b + ({l2}) - h.l")} AS b,
         {s_updates}
  FROM hw h
  JOIN daily d ON d.event_type = h.event_type AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.event_type, h.l AS level, h.b AS trend, {fc}
FROM hw h CROSS JOIN maxt m WHERE h.t = m.m
"""


@register("op254_holt_winters_multiplicative", oracle=_op254_sql())
def op254_holt_winters_multiplicative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTIPLICATIVE Holt-Winters (weekly m=7, α=β=γ=1/2) — the
    forecasting family's last named variant (round-6 verdict "What's
    missing" #3): seasonality as RATIOS, the right model when the
    weekly pattern scales with the level (weekend dips are -30%, not
    -300 events). The integer-exact discipline survives the ratios by
    FIXED-POINT scaling: seasonal state s ≈ ratio·2^20, and every
    division in the recurrence has a non-negative numerator and a
    GREATEST(·,1)-guarded positive divisor, so `//` floors identically
    in DuckDB's WITH RECURSIVE and python's applyInPandas loop:

        x   = y·S // s_prev          (deseasonalize, pre-update slot)
        l_t = f2(x + l + b)          b_t = f2(b + l_t − l)
        s'  = f2(y·S // max(l_t,1) + s_prev)       (γ-average, scaled)
        fc_h = ((l + h·b) · s[(T+h) mod 7]) // S

    Init: l = week-1 integer mean, b = 0, s_i = y_i·S // max(l,1).
    Bounds: with day counts ≤ ~10⁶ the largest intermediate is
    (l + h·b)·s ≲ 10⁶·2²⁰·ratio ≈ 10¹³ — five orders inside int64.

    Same scale shape as op235: state is 9 ints/series, one keyed
    shuffle, ~30-step loop per series inside one task."""
    from ocdb_server_spark.operators.pipeline_r6 import _HW_OFF

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0")).cast("bigint").alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(cast(0 as bigint), cast(datediff(d1, d0) as bigint))")
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )

    def hwm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf["y"].astype(int).tolist()
        S = _HWM_S
        f2 = lambda x: (x + _HW_OFF) // 2 - _HW_OFF // 2  # noqa: E731
        l = sum(ys[:_HWM_M]) // _HWM_M
        bt = 0
        s = [(ys[i] * S) // max(l, 1) for i in range(_HWM_M)]
        for t in range(_HWM_M, len(ys)):
            y = ys[t]
            slot = t % _HWM_M
            sp = s[slot]
            x = (y * S) // max(sp, 1)
            l_new = f2(x + l + bt)
            bt = f2(bt + l_new - l)
            s[slot] = f2((y * S) // max(l_new, 1) + sp)
            l = l_new
        t_last = len(ys) - 1
        out = {
            "event_type": [pdf["event_type"].iloc[0]],
            "level": [l],
            "trend": [bt],
        }
        for h in range(1, _HWM_H + 1):
            out[f"fc_{h}"] = [((l + h * bt) * s[(t_last + h) % _HWM_M]) // S]
        return pd.DataFrame(out)

    schema = (
        "event_type string, level long, trend long, "
        + ", ".join(f"fc_{h} long" for h in range(1, _HWM_H + 1))
    )
    return daily.groupBy("event_type").applyInPandas(hwm, schema)

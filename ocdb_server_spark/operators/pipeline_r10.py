"""Round-10 operators: the forecasting-family dispatcher (op262
ADI/CV² demand classification) and the seekable-zstd splittable
ingest (op261) — the two still-unbuilt round-9 §7.9 candidates the
round-9 verdict endorsed (items 4 and 5).

Reference: /root/reference is EMPTY (verified every round); both ops
derive from public knowledge — Syntetos & Boylan 2005 ("On the
categorization of demand patterns", JORS 56) for op262's thresholds,
and the public zstandard seekable-format spec
(github.com/facebook/zstd/blob/dev/contrib/seekable_format/
zstd_seekable_compression_format.md) for op261's frame layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register

# Codec kernels declared as register deps (round-14): op261 is
# certified through the seekable-zstd kernel AND the shared
# line-batching kernel it builds on (deps are shallow by design, so
# the chain is declared explicitly).
from ocdb_server_spark.sources import linebatch as _linebatch_kernel
from ocdb_server_spark.sources import zstd_seekable as _zstd_kernel

# ---------------------------------------------------------------------------
# op262: ADI / CV² demand-pattern classification (Syntetos-Boylan)
# ---------------------------------------------------------------------------

_ADI_K = 128  # series key cardinality: o_custkey % 128 gives 3 of the
# 4 classes at sf0.01 (smooth 71 / intermittent 56 / erratic 1) — the
# only cardinality among {32,64,128,256} whose monthly series straddle
# BOTH thresholds in this data (measured; 32/64 are all-smooth, 256
# all-intermittent).

_OP262_SQL = f"""
WITH m AS (
  SELECT o_custkey % {_ADI_K} AS k,
         (EXTRACT(year FROM o_orderdate) * 12
          + EXTRACT(month FROM o_orderdate)) AS mo,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2),
bounds AS (SELECT CAST(MAX(mo) - MIN(mo) + 1 AS BIGINT) AS n_periods FROM m),
s AS (
  SELECT CAST(k AS BIGINT) AS series_k,
         CAST(COUNT(*) AS BIGINT) AS n_demand_periods,
         CAST(SUM(y) AS BIGINT) AS sx,
         CAST(SUM(y * y) AS BIGINT) AS sx2
  FROM m GROUP BY k)
SELECT series_k,
       b.n_periods,
       n_demand_periods,
       ROUND(CAST(b.n_periods AS DOUBLE) / n_demand_periods, 6) AS adi,
       ROUND(CAST(n_demand_periods * sx2 - sx * sx AS DOUBLE)
             / (sx * sx), 6) AS cv2,
       CASE WHEN 100 * b.n_periods < 132 * n_demand_periods THEN
              CASE WHEN 100 * (n_demand_periods * sx2 - sx * sx)
                        < 49 * sx * sx
                   THEN 'smooth' ELSE 'erratic' END
            ELSE
              CASE WHEN 100 * (n_demand_periods * sx2 - sx * sx)
                        < 49 * sx * sx
                   THEN 'intermittent' ELSE 'lumpy' END
       END AS demand_class,
       CASE WHEN 100 * b.n_periods < 132 * n_demand_periods THEN
              CASE WHEN 100 * (n_demand_periods * sx2 - sx * sx)
                        < 49 * sx * sx
                   THEN 'op231_holt_forecast' ELSE 'op253_holt_damped' END
            ELSE 'op259_croston_sba'
       END AS route
FROM s CROSS JOIN bounds b
"""


@register("op262_demand_classification", oracle=_OP262_SQL)
def op262_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand-pattern categorization — the dispatcher
    that completes the forecasting family (round-9 §7.9 / verdict item
    5): given each series' ADI (average inter-demand interval =
    periods / demand-periods) and CV² (squared coefficient of
    variation of nonzero demand sizes), route it to the right
    forecaster:

        ADI < 1.32, CV² < 0.49  → smooth       → op231 (SES/Holt)
        ADI < 1.32, CV² ≥ 0.49  → erratic      → op253 (damped Holt)
        ADI ≥ 1.32, any CV²     → intermittent / lumpy → op259
                                  (Croston/SBA — SBA is the standard
                                  recommendation for BOTH sparse
                                  classes; Syntetos-Boylan 2005)

    op254/op257's seasonal variants need a seasonality test (e.g.
    autocorrelation at the season lag), which is outside ADI/CV²'s
    scope — the docstring of record for why they are not routes here.

    Series: monthly order counts per o_custkey % 128 — the same
    demand construction op259 forecasts daily, at the grain and
    cardinality where this data straddles both thresholds (see
    _ADI_K). INTEGER-EXACT THRESHOLDS (the round-9 verdict's
    requirement): ADI ≥ 1.32 is evaluated as 100·n_periods <
    132·n_demand_periods and CV² ≥ 0.49 as 100·(nd·Σy² − (Σy)²) <
    49·(Σy)² — all operands exact BIGINTs on both engines, so the
    class boundary can never flip on a float ulp; the reported
    adi/cv2 doubles are display values derived from the same exact
    integers (CV² = nd·Σy²/(Σy)² − 1, the population-variance
    identity). Pure two-level aggregation, no recursion, no UDF.

    Scale: groupBy(series, month) with map-side partial counts, then
    groupBy(series) over ≤ one row per (series, month) — at 10^6 SKUs
    × 10 years that second stage is 1.2×10^8 tiny rows, trivially
    shuffled; the global period count is a 1-row broadcast. The
    classifier output (one row per series) is exactly the work list a
    production pipeline feeds to op231/op253/op259 batch runs."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.col("o_custkey") % _ADI_K).cast("bigint").alias("series_k"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    bounds = m.agg(
        (F.max("mo") - F.min("mo") + F.lit(1))
        .cast("bigint")
        .alias("n_periods")
    )
    s = m.groupBy("series_k").agg(
        F.count("*").cast("bigint").alias("n_demand_periods"),
        F.sum("y").cast("bigint").alias("sx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sx2"),
    )
    nd, sx, sx2 = F.col("n_demand_periods"), F.col("sx"), F.col("sx2")
    npd = F.col("n_periods")
    sparse = 100 * npd >= 132 * nd  # ADI ≥ 1.32, integer-exact
    high_cv = 100 * (nd * sx2 - sx * sx) >= 49 * sx * sx  # CV² ≥ 0.49
    return s.crossJoin(F.broadcast(bounds)).select(
        "series_k",
        "n_periods",
        "n_demand_periods",
        F.round(npd.cast("double") / nd, 6).alias("adi"),
        F.round((nd * sx2 - sx * sx).cast("double") / (sx * sx), 6).alias(
            "cv2"
        ),
        F.when(
            sparse, F.when(high_cv, F.lit("lumpy")).otherwise("intermittent")
        )
        .otherwise(F.when(high_cv, F.lit("erratic")).otherwise("smooth"))
        .alias("demand_class"),
        F.when(sparse, F.lit("op259_croston_sba"))
        .otherwise(
            F.when(high_cv, F.lit("op253_holt_damped")).otherwise(
                "op231_holt_forecast"
            )
        )
        .alias("route"),
    )

# ---------------------------------------------------------------------------
# op261: seekable-zstd splittable ingest (op260's story for zstd)
# ---------------------------------------------------------------------------

_OP261_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
GROUP BY lang
"""


def _write_docs_zstd_file(path: str, it) -> int:
    """ONE writer kernel for the single-file demo AND the parallel
    exporter (op260's _write_docs_bgzf_file rule: record
    serialization — field set + sort_keys — and the tmp + os.replace
    atomic-publish protocol live in exactly one place): stream the
    pandas batches as JSONL through iter_seekable_zstd into `path`,
    append the seek-table skippable frame, return the frame count.
    An empty partition writes a valid 0-frame file (bare seek table)
    that read_seek_table accepts as an empty manifest."""
    import json
    import os

    from ocdb_server_spark.sources.zstd_seekable import (
        iter_seekable_zstd,
        seek_table_frame,
    )

    def lines():
        for pdf in it:
            for r in pdf.to_dict("records"):
                yield json.dumps(
                    {
                        "doc_id": int(r["doc_id"]),
                        "text": r["text"],
                        "lang": r["lang"],
                        "n_chars": int(r["n_chars"]),
                    },
                    sort_keys=True,
                )

    sizes = []
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        for frame, usize in iter_seekable_zstd(lines()):
            f.write(frame)
            sizes.append((len(frame), usize))
        f.write(seek_table_frame(sizes))
    os.replace(tmp, path)
    return len(sizes)


def _zstd_write_docs(path: str):
    """Single-file writer task over _write_docs_zstd_file; yields
    (path, n_frames)."""

    def write(it):
        import pandas as pd

        n = _write_docs_zstd_file(path, it)
        yield pd.DataFrame({"path": [path], "n_frames": [n]})

    return write


def _zstd_write_docs_part(out_dir: str):
    """Per-PARTITION variant (op260's bgzf_export_docs_parallel
    shape): each task streams ITS partition through the same kernel
    into its own seekable-zstd file named by TaskContext partition
    id. N tasks write N files concurrently; the same seek-table
    manifest split-read consumes the whole corpus across files."""

    def write(it):
        import os

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.jsonl.zst")
        n = _write_docs_zstd_file(path, it)
        yield pd.DataFrame({"path": [path], "n_frames": [n]})

    return write


def zstd_export_docs_parallel(
    spark: SparkSession, sf_dir: str, out_dir: str, partitions: int = 8
) -> list[str]:
    """Export the documents table as `partitions` seekable-zstd files
    in parallel and return their paths (write forced). The read side
    is file-count-agnostic: _zstd_manifest seek-tables every file, so
    the same split-read plan consumes 1 or N files — op260's
    production writer story, same economics (BASELINE.md measured the
    BGZF variant at −88% writer wall at 100× corpus; this writer is
    the identical shape over the zstd kernel)."""
    import os

    os.makedirs(out_dir, exist_ok=True)  # tasks die opaquely otherwise
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    manifest = (
        d.repartition(partitions)
        .mapInPandas(_zstd_write_docs_part(out_dir), "path string, n_frames long")
        .collect()
    )
    # every task yields exactly one row; an empty partition still
    # writes a valid 0-frame seek-table file the manifest accepts
    assert len(manifest) == partitions
    return sorted(r.path for r in manifest)


def _zstd_manifest(it):
    import pandas as pd

    from ocdb_server_spark.sources.zstd_seekable import read_seek_table

    for pdf in it:
        for p in pdf["path"]:
            blocks = read_seek_table(p)
            yield pd.DataFrame(
                {
                    "path": [p] * len(blocks),
                    "offset": [b[0] for b in blocks],
                    "csize": [b[1] for b in blocks],
                    "usize": [b[2] for b in blocks],
                }
            )


def _zstd_decode(it):
    import json

    import pandas as pd

    from ocdb_server_spark.sources.zstd_seekable import read_frame

    for pdf in it:
        for p, o, c, u in zip(
            pdf["path"], pdf["offset"], pdf["csize"], pdf["usize"]
        ):
            recs = [
                json.loads(x)
                for x in read_frame(p, int(o), int(c), int(u))
                .decode("utf-8")
                .splitlines()
            ]
            if recs:
                yield pd.DataFrame(
                    {
                        "doc_id": [r["doc_id"] for r in recs],
                        "text": [r["text"] for r in recs],
                        "lang": [r["lang"] for r in recs],
                        "n_chars": [r["n_chars"] for r in recs],
                    }
                )


def zstd_read_lang_agg(spark: SparkSession, paths: list[str]) -> DataFrame:
    """File-count-agnostic seekable-zstd split-read (op260's
    bgzf_read_lang_agg shape): one seek-table read per file fans the
    frame manifest out; each task range-reads and decompresses its
    own frames; payload bytes never shuffle."""
    blocks = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).mapInPandas(
        _zstd_manifest, "path string, offset long, csize long, usize long"
    )
    back = blocks.repartition(8).mapInPandas(
        _zstd_decode, "doc_id long, text string, lang string, n_chars long"
    )
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("bigint").alias("sum_text_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
    )


def zstd_single_file_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-FILE seekable-zstd demo (op261's original registered
    shape, kept as a test fixture per the round-10 verdict item 3):
    ONE coalesce(1) task streams the corpus into one archive, then the
    split-read fans ITS frames across >1 task — the proof that a
    single seekable-zstd file is splittable. Not the production write
    path (that's op261's registered zstd_export_docs_parallel plan);
    pinned in tests/test_zstd_seekable.py."""
    import os

    from ocdb_server_spark.scratch import scratch_dir

    path = os.path.join(
        scratch_dir("zstd_jsonl", sf_dir), "documents.jsonl.zst"
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    manifest = (
        d.coalesce(1)
        .mapInPandas(_zstd_write_docs(path), "path string, n_frames long")
        .collect()
    )
    assert len(manifest) == 1 and manifest[0].n_frames > 1
    return zstd_read_lang_agg(spark, [path])


@register(
    "op261_zstd_seekable_ingest",
    oracle=_OP261_SQL,
    deps=(_write_docs_zstd_file, _zstd_write_docs_part,
          zstd_export_docs_parallel, _zstd_manifest, _zstd_decode,
          zstd_read_lang_agg, _zstd_kernel, _linebatch_kernel),
)
def op261_zstd_seekable_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLITTABLE ZSTD — op260's BGZF story for the codec large
    corpora actually ship (round-9 verdict item 4): the documents
    table exported as seekable-zstd (sources/zstd_seekable.py —
    standard zstd frames + the public seekable format's seek-table
    skippable frame), then split-read.

    WRITE (round-10 verdict item 3 — the parallel writer IS the
    registered plan): zstd_export_docs_parallel fans the corpus over
    8 concurrent tasks, each streaming ITS partition through
    iter_seekable_zstd (one ≤48 KiB batch in memory, frames flushed
    at record boundaries — a split can never tear a record) into its
    own archive + seek table. Measured −79% writer wall at 100×
    corpus vs the single-task form (BASELINE.md round 10); the
    single-file demo survives as zstd_single_file_demo, certified
    equal in tests/test_zstd_seekable.py.

    READ — same three-stage, all-executor split path as op260, with
    BETTER metadata economics: (1) the manifest costs ONE 9-byte
    footer read + one table read per file (read_seek_table) — op260's
    BGZF walk pays a header hop per 64 KiB member, the seek table is
    a single parquet-footer-style read regardless of frame count;
    (2) manifest ROWS (never payload bytes) shuffle to a
    repartition(8) fan-out; (3) each task range-reads and one-shot
    decompresses its frames with libzstd, output size verified
    against the table. The read is file-count-agnostic: the same plan
    consumes 1 or N archives. At 100 TB the table is ~8 bytes/frame
    and the frame reads fan out to maxPartitionBytes-sized task
    groups.

    COMPATIBLE: skippable frames are core zstd (RFC 8878 §3.1.2) —
    every file is a valid multi-frame zstd stream any stock decoder
    reads end-to-end, table silently skipped (pinned against
    pyarrow's libzstd one-shot decoder in tests/test_zstd_seekable.py,
    the same interop discipline as test_bgzf's stdlib-gzip pin).

    The per-lang aggregate over the re-read frames hash-matching the
    original-parquet oracle certifies JSON→zstd→seek-table-split→
    decompress loses nothing; zstd_export_docs_parallel's manifest
    collect() forces the write before the read plan is returned
    (op252's rule)."""
    from ocdb_server_spark.scratch import scratch_dir

    out_dir = scratch_dir("zstd_jsonl_par", sf_dir)
    paths = zstd_export_docs_parallel(spark, sf_dir, out_dir, partitions=8)
    return zstd_read_lang_agg(spark, paths)

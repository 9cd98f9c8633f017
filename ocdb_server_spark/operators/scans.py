"""Scans / sources / sinks — SURVEY.md §2.1 (op01–op05).

Reference analog: the MongoDB full-collection fetch with optional
projection (`ocdb/db/mongo_db_driver.py::MongoDbDriver.find_datasets`
[U]) and the SeaBASS file reader (`ocdb/core/seabass/sb_file_reader.py`
[U]). Here the scan IS the optimizer's job: Parquet vectorized reader
with Catalyst predicate pushdown + column pruning (verify with
``df.explain`` → `PushedFilters`, `ReadSchema`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.registry import register

# Codec kernels declared as register deps (round-14, the last
# invisible-rewrite hole): op03/op204 are certified through the
# SeaBASS parser, op260 through the BGZF kernel and the shared
# line-batching kernel it builds on (deps are shallow by design,
# so the linebatch link is declared explicitly).
from ocdb_server_spark.sources import bgzf as _bgzf_kernel
from ocdb_server_spark.sources import linebatch as _linebatch_kernel
from ocdb_server_spark.sources import seabass as _seabass_kernel


@register(
    "op01_scan_parquet",
    oracle="SELECT COUNT(*) AS n_rows FROM lineitem",
)
def op01_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + count (ref: empty-filter find_datasets)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "op02_scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 5
    """,
)
def op02_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan: 2 of 11 columns, filter pushed to the parquet reader.

    The plan must show `ReadSchema: struct<l_orderkey,l_quantity,
    l_extendedprice>` and `PushedFilters: [LessThan(l_quantity,5.0)]` —
    at 100 TB this is the difference between reading 2 columns' pages
    and reading the table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_extendedprice")


# Oracle (round-7 verdict item 4, op204's pattern): the fixture's
# records hand-transcribed from the FIXTURE text — independent of the
# Spark parser, so a parse bug (delimiter, missing-token, field order)
# breaks the hash. Same decimal literals cast to DOUBLE on both sides
# → identical IEEE doubles.
_OP03_SQL = """
SELECT CAST(depth AS DOUBLE) AS depth, CAST(chl AS DOUBLE) AS chl,
       CAST(wt AS DOUBLE) AS wt, CAST(sal AS DOUBLE) AS sal
FROM (VALUES
  (1.0, 0.52, 12.3, 35.1),
  (2.5, NULL, 12.1, 35.0),
  (5.0, 0.31, NULL, 34.9),
  (7.5, 0.22, 11.8, NULL),
  (10.0, NULL, 11.5, 34.7)
) AS t(depth, chl, wt, sal)
"""


@register(
    "op03_source_csv_ingest",
    oracle=_OP03_SQL,
    deps=(_seabass_kernel,),
)
def op03_source_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SeaBASS-style delimited ingest: header-driven delimiter, missing
    token → NULL, typed records (ref: SbFileReader.read [U]).

    Writes a deterministic fixture file, parses it with the
    reader in ``ocdb_server_spark.sources.seabass`` (pure DataFrame ops:
    split + element_at + casts; the header is tiny and bounded so its
    parse is driver-side). The oracle restates the fixture rows as a
    hand-transcribed VALUES table (op204's discipline), upgrading this
    op from the rows-only check to the full hash gate.
    """
    from ocdb_server_spark.sources.seabass import FIXTURE, read_seabass

    d = os.path.join(tempfile.gettempdir(), "ocdb_spark_seabass_fixture")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "fixture.sb")
    # atomic write (tmp + rename): concurrent sweeps write identical
    # bytes, but a reader must never see a torn file mid-write
    tmp_path = f"{path}.{os.getpid()}.tmp"
    with open(tmp_path, "w") as f:
        f.write(FIXTURE)
    os.replace(tmp_path, path)
    return read_seabass(spark, path)


@register(
    "op04_source_json_lines",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1
    """,
)
def op04_source_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the `events.props` JSON string column into typed values
    (ref-adjacent: config/JSON handling in the ws layer [U])."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


@register(
    "op05_sink_parquet_roundtrip",
    # The re-read aggregate must hash-match the same aggregate computed
    # on the ORIGINAL parquet (op207/op209's discipline) — certifying
    # the write→partition-discovery→read path end to end, not just
    # that rows came back.
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    """,
)
def op05_sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + re-read (ref: zip export of query hits,
    store.py::download_store_files [U]).

    Writes lineitem filtered to quantity>45 partitioned by
    l_returnflag (the 100 TB layout choice: partition by a
    low-cardinality pruning column), reads it back and counts per
    partition — verifying partition discovery round-trips. The oracle
    computes the same per-flag counts on the original table, so a
    dropped/duplicated partition breaks the hash.
    """
    # Per-process scratch with dead-PID reaping: the sf tag alone
    # still left two concurrent sessions at the SAME sf able to
    # overwrite each other's files between write and lazy re-read —
    # the exact race scratch_dir was built for, and this op is
    # hash-gated since r8 (round-8 review finding).
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("sink_roundtrip", sf_dir), "data")
    li = load_table(spark, sf_dir, "lineitem")
    (
        li.filter(F.col("l_quantity") > 45)
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "op106_sink_formats_roundtrip",
    # Each format's re-read (count, key checksum, quantized price
    # checksum) must equal the same aggregate on the ORIGINAL orders
    # table — one oracle row per format; a lossy roundtrip in any of
    # the three breaks the hash. price_cents covers the DOUBLE column
    # (round-12 review: the key checksum alone certified nothing about
    # o_totalprice — the one column that actually exercises text float
    # formatting in CSV/JSON; op209's cents-quantization discipline).
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_totalprice > 300000.0
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey + o_custkey) AS BIGINT) AS key_checksum,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
      FROM src
    )
    SELECT f.format, s.n_rows, s.key_checksum, s.price_cents
    FROM (VALUES ('csv'), ('json'), ('orc')) AS f(format) CROSS JOIN s
    """,
)
def op106_sink_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format breadth: the same filtered frame written and re-read as
    CSV (with header+schema), JSON-lines, and ORC; one output row per
    format with row count and a value checksum that must agree across
    all three (and with the in-memory source).

    CSV and JSON are the interchange formats the reference serves
    (SeaBASS tables, JSON API payloads — SURVEY.md §3); ORC covers the
    other columnar family a migrating user may hold. Scale note: all
    three writers shard per-partition (one file per task) — the sink
    parallelizes like the parquet path; CSV/JSON lose types (restored
    via explicit schema on read) and columnar pruning, which is why
    parquet stays the serving layout (§7.2).
    """
    # per-process scratch + dead-PID reaping: hash-gated since r8, so
    # a same-sf concurrent session must not clobber the files between
    # write and lazy re-read (round-8 review finding)
    from ocdb_server_spark.scratch import scratch_dir

    base = scratch_dir("fmt_roundtrip", sf_dir)
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    frames = []
    for fmt in ("csv", "json", "orc"):
        out = f"{base}/{fmt}"
        w = src.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", "true").csv(out)
            back = (
                spark.read.option("header", "true").schema(src.schema).csv(out)
            )
        elif fmt == "json":
            w.json(out)
            back = spark.read.schema(src.schema).json(out)
        else:
            w.orc(out)
            back = spark.read.orc(out)
        frames.append(
            back.agg(
                F.lit(fmt).alias("format"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.col("o_orderkey") + F.col("o_custkey"))
                .cast("bigint")
                .alias("key_checksum"),
                # the double column, cents-quantized (op209's
                # discipline) — CSV/JSON text float formatting is the
                # lossiest step in the op and was uncertified
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("price_cents"),
            )
        )
    out_df = frames[0]
    for f in frames[1:]:
        out_df = out_df.unionByName(f)
    return out_df


@register(
    "op147_partition_pruned_scan",
    oracle="""
    SELECT doc_id, n_chars, lang FROM documents WHERE lang IN ('en', 'de')
    """,
)
def op147_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout round-trip with partition PRUNING:
    documents written `partitionBy("lang")` to a scratch dir, read back
    with a lang predicate — the predicate prunes whole directories
    (PartitionFilters in the scan, asserted in tests/test_plans.py),
    so non-matching partitions are never opened. This is the layout
    decision that turns a 100 TB corpus scan into a 2-language scan;
    at cluster scale the same plan applies to a date-partitioned lake.

    The write is part of the operator's semantics (like op05/op106
    sink round-trips); per-process scratch (r9: migrated off the
    shared sf-tagged dir — one session's overwrite could delete files
    another session's lazy read had already planned)."""
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("part_scan", sf_dir), "t")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", "lang")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("lang").isin("en", "de"))
        .select("doc_id", "n_chars", "lang")
    )


# ----------------------------------------------- op204: long-format records

# Field -> product-group dim (search.SearchColumns.pgroup_map's table
# form; reference analog: ocdb/res/product-groups.json [U] maps group
# name -> member field list).
_PGROUPS = [
    ("depth", "hydrography"), ("wt", "hydrography"), ("sal", "hydrography"),
    ("chl", "chlorophyll"), ("kd490", "chlorophyll"),
    ("lu412", "radiometry"), ("lu443", "radiometry"), ("es412", "radiometry"),
]

# Oracle: the three fixtures' observations transcribed BY HAND from the
# fixture text (independent of both the Spark parser and any Python
# helper — a parse bug on either side breaks the hash), aggregated the
# same way. Values quantized ROUND(v*1000) -> BIGINT per the
# cross-engine float rule (same double literal, same product, same
# round in both engines).
def seabass_fixture_corpus(spark: SparkSession) -> DataFrame:
    """The three deterministic heterogeneous SeaBASS fixtures written
    atomically to the shared fixture dir (identical bytes across
    sessions — op03's rule) and ingested through read_seabass_corpus:
    one scan per header SIGNATURE (here every file has its own
    delimiter/fields, so 3 scans; the same call handles 100k files
    with a dozen layouts as a dozen scans), dataset_id = file stem.
    Proven row-identical to the per-file read_seabass_long union in
    tests/test_seabass.py. Shared by op204 (group resolution) and
    op258 (Avro OCF sink pairing), so both hash gates exercise the
    corpus path."""
    from ocdb_server_spark.sources.seabass import (
        FIXTURE,
        FIXTURE2,
        FIXTURE3,
        read_seabass_corpus,
    )

    d = os.path.join(tempfile.gettempdir(), "ocdb_spark_seabass_fixture")
    os.makedirs(d, exist_ok=True)
    paths = []
    for ds_id, content in (("ds1", FIXTURE), ("ds2", FIXTURE2), ("ds3", FIXTURE3)):
        path = os.path.join(d, f"{ds_id}.sb")
        tmp_path = f"{path}.{os.getpid()}.tmp"
        with open(tmp_path, "w") as f:
            f.write(content)
        os.replace(tmp_path, path)  # atomic: same rule as op03
        paths.append(path)
    return read_seabass_corpus(spark, paths)


_OP204_SQL = """
WITH obs(dataset_id, field, value) AS (VALUES
  ('ds1','depth',1.0),('ds1','chl',0.52),('ds1','wt',12.3),('ds1','sal',35.1),
  ('ds1','depth',2.5),('ds1','wt',12.1),('ds1','sal',35.0),
  ('ds1','depth',5.0),('ds1','chl',0.31),('ds1','sal',34.9),
  ('ds1','depth',7.5),('ds1','chl',0.22),('ds1','wt',11.8),
  ('ds1','depth',10.0),('ds1','wt',11.5),('ds1','sal',34.7),
  ('ds2','depth',1.0),('ds2','lu412',1.11),('ds2','lu443',2.22),('ds2','es412',3.33),
  ('ds2','depth',5.0),('ds2','lu443',2.10),('ds2','es412',3.20),
  ('ds2','depth',10.0),('ds2','lu412',0.95),('ds2','lu443',1.98),
  ('ds2','depth',20.0),('ds2','lu412',0.80),('ds2','es412',3.05),
  ('ds3','depth',2.0),('ds3','chl',0.50),('ds3','kd490',0.061),('ds3','sal',35.2),
  ('ds3','depth',4.0),('ds3','kd490',0.055),('ds3','sal',35.1),
  ('ds3','depth',8.0),('ds3','chl',0.42),('ds3','sal',35.0)
),
pg(field, pgroup) AS (VALUES
  ('depth','hydrography'),('wt','hydrography'),('sal','hydrography'),
  ('chl','chlorophyll'),('kd490','chlorophyll'),
  ('lu412','radiometry'),('lu443','radiometry'),('es412','radiometry')
)
SELECT o.dataset_id,
       COALESCE(p.pgroup, 'other') AS pgroup,
       o.field,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(CAST(ROUND(o.value * 1000) AS BIGINT)) AS BIGINT) AS sum_q
FROM obs o LEFT JOIN pg p ON o.field = p.field
GROUP BY o.dataset_id, p.pgroup, o.field
"""


@register(
    "op204_records_long_format",
    oracle=_OP204_SQL,
    deps=(seabass_fixture_corpus, _seabass_kernel),
)
def op204_records_long_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL storage model, end to end (round-5
    verdict item 5; SURVEY §1.3/§7.2): three heterogeneous
    SeaBASS-style files — different `/fields=` sets AND different
    delimiters (comma/space/tab) — ingest through
    sources/seabass.read_seabass_long into ONE long open-schema record
    table `(dataset_id, field, value)`, then product-group resolution
    runs against it as a broadcast field->group dim join (the table
    form of search.SearchColumns.pgroup_map; tests/test_seabass.py
    additionally drives search.find_datasets with a pgroup query over
    this exact frame). Output: per (dataset_id, pgroup, field)
    observation count and quantized sum.

    Scale shape: wide->long is a generator expression (no shuffle);
    the group dim broadcasts (it is product metadata, KBs forever);
    the only exchange is the final partial-agged groupBy on
    (dataset_id, field) — at 10^9 records per day this is one
    well-keyed aggregation, and heterogeneous schema drift adds
    files, not migrations. The oracle restates the fixtures'
    observations as a hand-transcribed VALUES table — a parse bug on
    either engine's side breaks the hash."""
    long_tbl = seabass_fixture_corpus(spark)
    dim = spark.createDataFrame(_PGROUPS, "field string, pgroup string")
    return (
        long_tbl.join(F.broadcast(dim), "field", "left")
        .groupBy(
            "dataset_id",
            F.coalesce(F.col("pgroup"), F.lit("other")).alias("pgroup"),
            "field",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("sum_q"),
        )
    )


# ----------------- op207/op256/op260: compressed text (JSONL) ingest
# The three compressed-interchange round-trips (gzip, bzip2, BGZF)
# share one certification contract: export documents as JSONL under
# the codec, re-read, and require the per-lang aggregate to
# hash-match the oracle computed on the ORIGINAL parquet. The shared
# schema / aggregate / oracle below are that contract in one place
# (round-12 deferred cosmetics: the text was triplicated per op).

_DOCS_LANG_AGG_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
FROM documents
GROUP BY lang
"""

# Explicit re-read schema — never infer on a 100 TB corpus (inference
# is a full extra pass over the compressed bytes).
_DOCS_JSONL_SCHEMA = (
    "doc_id bigint, text string, lang string, n_chars bigint"
)


def _docs_lang_agg(back: DataFrame) -> DataFrame:
    """The certification aggregate over a re-read documents frame:
    per-lang counts plus content-covering sums (text lengths included,
    so the hash certifies the payload survived the codec)."""
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("bigint").alias("sum_text_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
    )


@register(
    "op207_gzip_jsonl_ingest",
    oracle=_DOCS_LANG_AGG_SQL,
    deps=(_docs_lang_agg,),
)
def op207_gzip_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text ingest, end to end: documents are exported as
    GZIP-COMPRESSED JSON-LINES (the de-facto interchange format of
    every large text-corpus release) and read back through Spark's
    codec-transparent text path with an EXPLICIT schema (never infer
    on a 100 TB corpus: inference is a full extra pass). The per-lang
    aggregate over the re-read frame must hash-match the oracle
    computed on the ORIGINAL parquet — certifying the whole JSON
    escape → gzip → gunzip → JSON parse round-trip, text content
    included (sum of re-read text lengths).

    Scale notes, documented trade: gzip is NOT splittable — one .gz
    file = one read task, so exports write MANY moderate files
    (maxRecordsPerFile caps them here; a real 100 TB release shards to
    ~256 MB) or choose a splittable codec (bzip2, or zstd+seekable
    frames). The read task count assertion lives in
    tests/test_sinks.py."""
    # per-process scratch + dead-PID reaping (round-8 review finding:
    # every hash-gated sink round-trip uses scratch_dir, not a shared
    # sf-tagged dir a concurrent same-sf session could clobber)
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("gzip_jsonl", sf_dir), "export")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    (
        d.write.mode("overwrite")
        .option("compression", "gzip")
        .option("maxRecordsPerFile", 2000)
        .json(out)
    )
    back = spark.read.schema(_DOCS_JSONL_SCHEMA).json(out)
    return _docs_lang_agg(back)


# --------------------------- op256: SPLITTABLE compressed text ingest


@register(
    "op256_bzip2_splittable_ingest",
    oracle=_DOCS_LANG_AGG_SQL,
    deps=(_docs_lang_agg,),
)
def op256_bzip2_splittable_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLITTABLE compressed text interchange — op207's documented
    gzip trade closed (round-7 verdict "missing" item 4): the same
    JSONL export written as ONE bzip2 file. Hadoop's BZip2Codec is a
    SplittableCompressionCodec — the format is a sequence of
    independently decodable blocks with a 48-bit magic delimiter, so
    the reader can seek to a block boundary mid-file and start
    decompressing there; a single 100 GB .bz2 therefore fans out to
    maxPartitionBytes-sized tasks where the gzip sibling is condemned
    to one. (zstd+seekable-frames is the modern equivalent; bzip2 is
    the one Spark ships splittable out of the box.)

    Written deliberately as ONE file (coalesce(1)) so splitting is
    the ONLY possible source of read parallelism — the split really
    happening (>1 input partitions once maxPartitionBytes < file
    size, record boundaries never torn) is asserted in
    tests/test_sinks.py; the per-lang aggregate over the re-read
    frame hash-matching the original-parquet oracle certifies the
    JSON→bzip2→split-read→JSON path loses nothing."""
    # per-process dir + dead-PID reaping (scratch.scratch_dir): a
    # fixed sf-keyed dir would let a concurrent session overwrite the
    # single .bz2 file between this op's write and the driver's lazy
    # evaluation of the returned read plan (round-8 review)
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("bz2_jsonl", sf_dir), "export")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    (
        d.coalesce(1)
        .write.mode("overwrite")
        .option("compression", "bzip2")
        .json(out)
    )
    back = spark.read.schema(_DOCS_JSONL_SCHEMA).json(out)
    return _docs_lang_agg(back)


# ------------------------------- op209/op210: ORC and XML source breadth

_OP209_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register("op209_orc_source_sink", oracle=_OP209_SQL)
def op209_orc_source_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip — the second COLUMNAR format Spark
    ships natively (reference analog: none; its store keeps originals
    on disk and rows in MongoDB. This is lake-format breadth for the
    Spark re-design: a deployment whose upstream emits ORC ingests it
    with the same pushdown economics as parquet).

    orders is exported to ORC (zstd) and re-read; the re-read scan
    carries BOTH pruning kinds — ReadSchema keeps 4 of 5 columns and
    the o_orderdate predicate reaches the ORC reader's PushedFilters
    (search-argument row-group skipping; asserted in tests/
    test_sinks.py). The per-priority aggregate over the re-read frame
    must hash-match the oracle computed on the ORIGINAL parquet —
    certifying value fidelity (timestamps included: ORC stores UTC
    instants, session tz is UTC both engines) across the round-trip.

    Scale: ORC is splittable and stripe-indexed like parquet — at
    100 TB the export is one write job (maxRecordsPerFile shards) and
    the re-read scan skips stripes on the pushed min/max, so the
    round-trip costs two scans of the projected columns, not the
    table."""
    # per-process scratch + dead-PID reaping (round-8 review finding)
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("orc_orders", sf_dir), "export")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    (
        o.write.mode("overwrite")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", 100_000)
        .orc(out)
    )
    back = spark.read.orc(out)
    return (
        back.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_price_cents"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
    )


_OP210_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_q,
       CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
"""


@register("op210_xml_ingest", oracle=_OP210_SQL)
def op210_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest via Spark 4's NATIVE XML data source (spark-xml was
    merged upstream in 4.0) — the interchange format of instrument/
    observation metadata feeds adjacent to the reference's domain
    (SeaBASS headers are `/key=value`; sibling archives ship XML).

    events is exported as XML (rowTag=event) and re-read with an
    EXPLICIT schema (no inference pass — same rule as op207: schema
    inference over a 100 TB drop is a full extra read). Doubles are
    quantized to int64 micros BEFORE the export so the text round-trip
    is exact by construction rather than trusting double formatting;
    the per-type aggregate over the re-read frame hash-matches the
    oracle on the ORIGINAL parquet, certifying escape → serialize →
    parse end to end.

    Scale: XML rows are self-describing and verbose (~4× parquet),
    and Spark 4's native XML reader does NOT split within a file
    (measured here: a 1.7 MB single file stays 1 task under a 16 KB
    maxPartitionBytes — the rowTag parser needs whole-file context
    for nesting). Parallel ingest therefore comes from MANY files
    (maxRecordsPerFile shards the export; the one-task-per-file
    property is asserted in tests/test_sinks.py) — same playbook as
    op207's gzip, and the reason downstream tables are parquet with
    XML only at the edge."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # per-process scratch + dead-PID reaping (round-8 review finding)
    from ocdb_server_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("xml_events", sf_dir), "export")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("value_q"),
    )
    (
        ev.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .option("maxRecordsPerFile", 5000)
        .save(out)
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value_q", LongType()),
        ]
    )
    back = (
        spark.read.format("xml").option("rowTag", "event").schema(schema).load(out)
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("value_q").cast("bigint").alias("sum_value_q"),
        F.sum("user_id").cast("bigint").alias("sum_user_id"),
        F.max("event_id").cast("bigint").alias("max_event_id"),
    )


# --------------------- op260: BGZF blocked-gzip SPLITTABLE gzip source

def _write_docs_bgzf_file(path: str, it) -> int:
    """ONE writer kernel for both the single-file demo and the
    parallel exporter (round-9 review: the record serialization —
    field set + sort_keys — and the tmp + os.replace atomic-publish
    protocol must live in exactly one place): stream the pandas
    batches as JSONL through iter_bgzf_members into `path`, return
    the member count."""
    import json

    from ocdb_server_spark.sources.bgzf import iter_bgzf_members

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

    n = 0
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        for member in iter_bgzf_members(lines()):
            f.write(member)
            n += 1
    os.replace(tmp, path)  # atomic publish (op03's rule)
    return n


def _bgzf_write_docs(path: str):
    def write(it):
        import pandas as pd

        n = _write_docs_bgzf_file(path, it)
        yield pd.DataFrame({"path": [path], "n_members": [n]})

    return write


def _bgzf_write_docs_part(out_dir: str):
    """Per-PARTITION variant of _bgzf_write_docs (round-8 verdict
    item 3 — the parallel writer shape op260's single-file demo
    deliberately bottlenecks): each task streams ITS partition
    through the same iter_bgzf_members kernel into its own
    member-blocked BGZF file, named by TaskContext partition id,
    tmp-written + os.replace (op03's atomic-publish rule). N tasks
    write N files concurrently — writer wall drops with partitions
    while every file stays a valid stock-gzip stream and the same
    walk_blocks manifest split-reads the whole corpus across files."""

    def write(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.jsonl.gz")
        n = _write_docs_bgzf_file(path, it)
        yield pd.DataFrame({"path": [path], "n_members": [n]})

    return write


def bgzf_export_docs_parallel(
    spark: SparkSession, sf_dir: str, out_dir: str, partitions: int = 8
) -> list[str]:
    """Export the documents table as `partitions` BGZF files in
    parallel and return their paths (write forced). The read side is
    file-count-agnostic: _bgzf_walk manifests every file, so the
    exact same split-read plan consumes 1 or N files."""
    os.makedirs(out_dir, exist_ok=True)  # tasks die opaquely otherwise
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    manifest = (
        d.repartition(partitions)
        .mapInPandas(_bgzf_write_docs_part(out_dir), "path string, n_members long")
        .collect()
    )
    # every task yields exactly one row; an empty partition still
    # writes a valid EOF-marker-only file walk_blocks accepts
    assert len(manifest) == partitions
    return sorted(r.path for r in manifest)


def _bgzf_walk(it):
    import pandas as pd

    from ocdb_server_spark.sources.bgzf import walk_blocks

    for pdf in it:
        for p in pdf["path"]:
            blocks = walk_blocks(p)
            yield pd.DataFrame(
                {
                    "path": [p] * len(blocks),
                    "offset": [b[0] for b in blocks],
                    "length": [b[1] for b in blocks],
                }
            )


def _bgzf_decode(it):
    import json

    import pandas as pd

    from ocdb_server_spark.sources.bgzf import read_block

    for pdf in it:
        for p, o, ln in zip(pdf["path"], pdf["offset"], pdf["length"]):
            recs = [
                json.loads(x)
                for x in read_block(p, int(o), int(ln)).decode("utf-8").splitlines()
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


def bgzf_read_lang_agg(spark: SparkSession, paths: list[str]) -> DataFrame:
    """File-count-agnostic BGZF split-read: manifest every file via
    walk_blocks (distributed — one row in, many block rows out), fan
    the block reads out, inflate+CRC-verify per member, and compute
    the op260 per-lang certification aggregate. The SAME plan serves
    op260's single-file demo and the parallel N-file export
    (bgzf_export_docs_parallel) — at 100 TB the writer runs one task
    per partition and this reader one manifest row per file."""
    blocks = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).mapInPandas(_bgzf_walk, "path string, offset long, length long")
    back = blocks.repartition(8).mapInPandas(
        _bgzf_decode, _DOCS_JSONL_SCHEMA
    )
    return _docs_lang_agg(back)


@register(
    "op260_bgzf_splittable_gzip",
    oracle=_DOCS_LANG_AGG_SQL,
    deps=(_docs_lang_agg, bgzf_read_lang_agg, _write_docs_bgzf_file,
          _bgzf_write_docs_part, bgzf_export_docs_parallel, _bgzf_walk,
          _bgzf_decode, _bgzf_kernel, _linebatch_kernel),
)
def op260_bgzf_splittable_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLITTABLE GZIP — the op207/op256 story completed for gzip
    itself (SURVEY §7.8 round-9 candidate 3): the documents table
    exported as ONE BGZF file (sources/bgzf.py — the SAM-spec §4.1
    blocked-gzip framing: ≤64 KiB independent gzip members, each
    member's compressed length carried in-band in a gzip FEXTRA 'BC'
    subfield). op207 proved a plain .gz condemns Spark to one task
    per file; op256 showed bzip2's block magic makes splitting free;
    BGZF shows gzip can join them WITHOUT losing gzip compatibility —
    the file remains a valid multi-member gzip stream any stock
    consumer reads end-to-end (pinned vs stdlib gzip in
    tests/test_bgzf.py).

    The split path is index-free and three-stage, all executor-side:
    (1) one task streams the corpus through iter_bgzf_members (one
    ≤48 KiB batch in memory, members flushed at record boundaries —
    a split can never tear a record); (2) walk_blocks builds the
    block manifest from the in-band BSIZE fields alone, reading ~18
    bytes per 64 KiB member — parquet-footer economics, distributed
    per file via mapInPandas; (3) the manifest rows (NOT the bytes)
    shuffle to a repartition(8) fan-out where each task range-reads
    and inflates its own members, CRC-verified. Payload bytes never
    shuffle; at 100 TB the manifest is ~1/4000th of the data and the
    block reads fan out to maxPartitionBytes-sized task groups —
    the exact economics Spark's native bzip2 split gives op256.
    The per-lang aggregate over the re-read frame hash-matching the
    original-parquet oracle certifies the JSON→BGZF→manifest-split→
    inflate path loses nothing; the ≤1-row manifest collect() forces
    the write before the read plan is returned (op252's rule).

    The coalesce(1) writer is the single-file DEMO semantics (one
    downloadable artifact). The production writer shape is
    bgzf_export_docs_parallel below (round-8 verdict item 3): one
    member-blocked file per partition through the same kernel, same
    manifest split-read over N files — certified equal in
    tests/test_bgzf.py and measured in BASELINE.md's writer-scaling
    row."""
    from ocdb_server_spark.scratch import scratch_dir

    path = os.path.join(
        scratch_dir("bgzf_jsonl", sf_dir), "documents.jsonl.gz"
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    manifest = (
        d.coalesce(1)
        .mapInPandas(_bgzf_write_docs(path), "path string, n_members long")
        .collect()
    )
    assert len(manifest) == 1 and manifest[0].n_members > 1
    return bgzf_read_lang_agg(spark, [path])

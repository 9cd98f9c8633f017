"""Round-8 operators: the mini table-log (op255) and the damped
multiplicative Holt-Winters forecaster (op257).

op255 composes the three lakehouse pieces certified separately in
earlier rounds into ONE multi-commit snapshot contract (round-7
verdict "next round" item 5 — the last uncomposed lakehouse
capability):

  - op234's atomic manifest commit (os.replace IS the commit point),
  - op228's merge-on-read position deletes (`_metadata.file_path` +
    `row_index` anti-join — no key lookup, no base rewrite),
  - op178's compaction step (rewrite live rows, drop delete files).

The real table formats (Delta/Iceberg) are absent from this container
(no jars), so the LOG is the honest miniature: one JSON file per
version holding the full snapshot listing — data files + position-
delete files — committed atomically. Readers resolve a version from
the log only; data files are immutable, so a reader pinned to
version N is isolated from every later commit by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocdb_server_spark.io import load_table
from ocdb_server_spark.operators.scans import seabass_fixture_corpus
from ocdb_server_spark.registry import register
from ocdb_server_spark.scratch import scratch_dir

# Codec kernels declared as register deps (round-14): op258 is
# hash-certified through BOTH parsers below — the Avro OCF writer/
# reader and the SeaBASS corpus ingest that feeds it.
from ocdb_server_spark.sources import avro_ocf as _avro_kernel
from ocdb_server_spark.sources import seabass as _seabass_kernel


# --------------------------------------------------------------------------
# table-log primitives (used by op255 and the crash-window tests)
# --------------------------------------------------------------------------


def log_dir(root: str) -> str:
    return os.path.join(root, "log")


def log_commit(
    root: str, version: int, files: list[str], delete_files: list[str]
) -> None:
    """Atomically commit snapshot `version`: write the full listing to
    a tmp file, then os.replace it to `log/v{version}.json` — either
    the version exists (committed) or it doesn't; a crash before the
    replace leaves orphan data files no reader ever resolves
    (op234's commit discipline, per-version)."""
    os.makedirs(log_dir(root), exist_ok=True)
    entry = {
        "version": version,
        "files": sorted(files),
        "delete_files": sorted(delete_files),
    }
    path = os.path.join(log_dir(root), f"v{version}.json")
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, path)  # the atomic commit point


def latest_version(root: str) -> int:
    """Highest committed version (0 = empty table). Readers call this,
    never listdir the data directory."""
    try:
        names = os.listdir(log_dir(root))
    except FileNotFoundError:
        return 0
    vs = [
        int(n[1:-5])
        for n in names
        if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
    ]
    return max(vs, default=0)


def read_log(root: str, version: int) -> dict:
    with open(os.path.join(log_dir(root), f"v{version}.json")) as f:
        return json.load(f)


def read_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Resolve snapshot `version` from the log: union its immutable
    data files, then anti-join its position-delete files on
    (file_path, row_index) — op228's MoR read path. The delete side
    is metadata-sized and broadcast; real engines push the same join
    into the scan as a per-file bitmap."""
    entry = read_log(root, version)
    base = spark.read.parquet(*entry["files"]).withColumns(
        {
            "_file": F.col("_metadata.file_path"),
            "_pos": F.col("_metadata.row_index"),
        }
    )
    if entry["delete_files"]:
        deletes = spark.read.parquet(*entry["delete_files"]).select(
            "_file", "_pos"
        )
        base = base.join(
            F.broadcast(deletes), ["_file", "_pos"], "left_anti"
        )
    return base.drop("_file", "_pos")


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".parquet")
    ]


def build_table_log(
    spark: SparkSession, sf_dir: str, root: str, upto_version: int = 3
) -> None:
    """Drive the three commits of op255's contract against `root`:

      v1  append: orders (3 columns) written as 4 immutable files
      v2  delete: position-delete file for o_orderkey % 7 = 0
                  (base files UNCHANGED — merge-on-read)
      v3  compact: v2's live rows rewritten as 2 files, deletes
                  dropped (op178's step materialized)

    Split out of the op so the crash-window test can stop between any
    data write and its log commit."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )

    # v1: append
    base_path = os.path.join(root, "data", "base")
    src.repartition(4).write.mode("overwrite").parquet(base_path)
    log_commit(root, 1, _parquet_files(base_path), [])
    if upto_version < 2:
        return

    # v2: position-delete commit — physical addressing via _metadata,
    # resolved ONCE writer-side from the predicate
    del_path = os.path.join(root, "data", "deletes-v2")
    (
        spark.read.parquet(*read_log(root, 1)["files"])
        .select(
            F.col("_metadata.file_path").alias("_file"),
            F.col("_metadata.row_index").alias("_pos"),
            "o_orderkey",
        )
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("_file", "_pos")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(del_path)
    )
    log_commit(
        root, 2, read_log(root, 1)["files"], _parquet_files(del_path)
    )
    if upto_version < 3:
        return

    # v3: compaction — rewrite v2's LIVE rows, drop the delete file
    compact_path = os.path.join(root, "data", "compact-v3")
    read_snapshot(spark, root, 2).repartition(2).write.mode(
        "overwrite"
    ).parquet(compact_path)
    log_commit(root, 3, _parquet_files(compact_path), [])


# --------------------------------------------------------------------------
# op255: multi-commit snapshot isolation over the mini table-log
# --------------------------------------------------------------------------

# The oracle restates BOTH sides of the contract: the per-version DATA
# (v1 = full orders; v2 and v3 = the predicate-filtered table —
# compaction must be invisible to readers) and the per-version LOG
# STRUCTURE (file counts: append 4+0, MoR delete 4+1, compacted 2+0).
_OP255_SQL = """
WITH v AS (SELECT UNNEST([1, 2, 3]) AS version),
agg AS (
  SELECT v.version,
         CAST(COUNT(*) AS BIGINT) AS n_live,
         CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
  FROM v JOIN orders ON v.version = 1 OR o_orderkey % 7 <> 0
  GROUP BY v.version
),
layout(version, n_data_files, n_delete_files) AS (
  VALUES (1, 4, 0), (2, 4, 1), (3, 2, 0)
)
SELECT CAST(a.version AS BIGINT) AS version,
       CAST(l.n_data_files AS BIGINT) AS n_data_files,
       CAST(l.n_delete_files AS BIGINT) AS n_delete_files,
       a.n_live, a.sum_key, a.sum_price_cents
FROM agg a JOIN layout l ON a.version = l.version
"""


@register("op255_table_log_snapshots", oracle=_OP255_SQL)
def op255_table_log_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini TABLE-LOG with multi-commit snapshot isolation (round-7
    verdict item 5): three commits — v1 append (4 immutable parquet
    files), v2 merge-on-read position-delete (op228's `_metadata`
    addressing; base files untouched), v3 compaction (op178's step:
    live rows rewritten as 2 files, deletes dropped) — each committed
    by op234's atomic os.replace of a full-listing log entry. Readers
    resolve every version FROM THE LOG ONLY; output is one row per
    version: its log layout (data/delete file counts) and its exact
    data aggregate.

    The hash certifies the whole contract at once: v1 must still read
    the PRE-delete table after v2 and v3 land (immutable files + log
    isolation), v2 must anti-join exactly the predicate's positions,
    and v3 must be byte-equivalent to v2 (n_live/sum_key/
    sum_price_cents identical) while its layout row proves the
    rewrite actually happened (2 data files, 0 delete files). The
    crash-window test (tests/test_pipeline_r8.py) additionally stops
    between each data write and its log commit and proves readers
    never see the uncommitted future.

    Scale: the log is one JSON listing per version (a production log
    appends actions + checkpoints, same atomicity); data moves only
    at v1 (the append) and v3 (the compaction rewrite — the nightly
    OPTIMIZE's cost); v2 moves (path, bigint) pairs. Reads are
    file-pruned unions + one broadcast anti-join — no shuffle of the
    base anywhere."""
    # per-process root + dead-PID reaping (scratch.scratch_dir):
    # isolation from concurrent sessions without accumulating a table
    # copy per historical PID in /tmp
    root = scratch_dir("tablelog", sf_dir)
    build_table_log(spark, sf_dir, root)

    frames = []
    for version in (1, 2, 3):
        entry = read_log(root, version)
        snap = read_snapshot(spark, root, version)
        frames.append(
            snap.agg(
                F.lit(version).cast("bigint").alias("version"),
                F.lit(len(entry["files"])).cast("bigint").alias("n_data_files"),
                F.lit(len(entry["delete_files"]))
                .cast("bigint")
                .alias("n_delete_files"),
                F.count("*").cast("bigint").alias("n_live"),
                F.sum("o_orderkey").cast("bigint").alias("sum_key"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("sum_price_cents"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# op257: DAMPED multiplicative Holt-Winters — op253's φ-damping composed
# with op254's fixed-point seasonal ratios (SURVEY §7.7 candidate 3)
# --------------------------------------------------------------------------


def _op257_sql() -> str:
    from ocdb_server_spark.operators.pipeline_r6 import _hw_f2
    from ocdb_server_spark.operators.pipeline_r7 import _HWM_H, _HWM_M, _HWM_S

    f2 = lambda x: _hw_f2(x, "//")  # noqa: E731
    S = _HWM_S
    slot = (
        "CASE CAST((h.t + 1) % 7 AS INTEGER) "
        + " ".join(f"WHEN {i} THEN h.s{i}" for i in range(_HWM_M))
        + " END"
    )
    # deseasonalize with the PRE-update slot value (op254's guard rule)
    x = f"((d.y * {S}) // GREATEST({slot}, 1))"
    # damping: the carried trend enters level and trend as φb = f2(b)
    pb = f2("h.b")
    l2 = f2(f"{x} + h.l + {pb}")
    b2 = f2(f"{pb} + ({l2}) - h.l")
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
    # forecast: damped partial sums p_1 = f2(b), p_{i+1} = f2(p_i);
    # the seasonal product's numerator can be negative, so the op254
    # OFF-shift makes DuckDB's truncating // agree with python's floor
    p = ["h.b"]
    for _ in range(_HWM_H):
        p.append(f2(p[-1]))
    OFF = 1 << 40
    fc = ", ".join(
        f"(((h.l + {' + '.join(p[1:h + 1])}) * "
        f"(CASE CAST((h.t + {h}) % 7 AS INTEGER) "
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
  -- degenerate-span guard (round-8 ADVICE): a corpus spanning < 7
  -- days must fail LOUDLY on both engines, not NULL-propagate the
  -- missing y_i seasonals here while the Python side IndexErrors
  SELECT event_type, {y_cols},
         CASE WHEN COUNT(*) < 7 THEN CAST(error(
             'op257: events span < 7 days — damped multiplicative '
             'Holt-Winters needs one full seasonal period (m=7)')
           AS BIGINT)
         ELSE CAST((SUM(CASE WHEN t < 7 THEN y ELSE 0 END)) // 7
           AS BIGINT) END AS l_init
  FROM daily WHERE t < 7 GROUP BY event_type),
hw AS (
  SELECT event_type, CAST(6 AS BIGINT) AS t, l_init AS l,
         CAST(0 AS BIGINT) AS b, {s_inits}
  FROM week1
  UNION ALL
  SELECT h.event_type, h.t + 1,
         {l2} AS l,
         {b2} AS b,
         {s_updates}
  FROM hw h
  JOIN daily d ON d.event_type = h.event_type AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.event_type, h.l AS level, h.b AS trend, {fc}
FROM hw h CROSS JOIN maxt m WHERE h.t = m.m
"""


@register("op257_holt_winters_damped_multiplicative", oracle=_op257_sql())
def op257_holt_winters_damped_multiplicative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DAMPED MULTIPLICATIVE Holt-Winters (m=7, α=β=γ=φ=1/2) — the
    composition §7.7 flagged as trivial-once-both-exist: op253's
    φ-damping (one extra integer halving wherever the carried trend
    is used) grafted onto op254's fixed-point seasonal ratios. This
    is the forecasting family's production workhorse — Hyndman &
    Athanasopoulos (fpp3 §8.3) note damped multiplicative HW is often
    the single best default for seasonal business series, because the
    trend flattens toward l + b·φ/(1−φ) instead of ramping forever
    while the seasonal profile still scales with the level:

        x    = y·S // max(s_prev, 1)       (deseasonalize, pre-update)
        l_t  = f2(x + l + f2(b))           (damped trend in the level)
        b_t  = f2(f2(b) + l_t − l)         (damped carry)
        s'   = f2(y·S // max(l_t, 1) + s_prev)
        fc_h = ((l + Σ_{i≤h} φⁱb) · s[(T+h) mod 7]) // S
               (φⁱb by repeated halving; OFF-shifted in SQL so
                truncation == floor on negative numerators)

    Init and bounds are op254's: l = week-1 integer mean, b = 0,
    s_i = y_i·S // max(l,1); largest intermediate ≲ 10¹³ ≪ 2⁶³. Every
    division keeps op254's non-negative-numerator / guarded-divisor
    discipline, and the damping halvings use _hw_f2's offset, so the
    applyInPandas loop and DuckDB's WITH RECURSIVE stay bit-identical.

    Scale shape: unchanged from op253/op254 — state is 9 ints per
    series, one keyed shuffle of the zero-filled daily spine, a
    ~30-step ordered loop per series inside its task; a 10⁶-series
    hypertable is 10⁶ independent tasks."""
    from ocdb_server_spark.operators.pipeline_r6 import _HW_OFF
    from ocdb_server_spark.operators.pipeline_r7 import _HWM_H, _HWM_M, _HWM_S

    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    counts = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.col("d0"))
            .cast("bigint")
            .alias("t"),
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
                F.expr(
                    "sequence(cast(0 as bigint),"
                    " cast(datediff(d1, d0) as bigint))"
                )
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["event_type", "t"], "left").select(
        "event_type",
        "t",
        F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
    )

    def hwdm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        ys = pdf["y"].astype(int).tolist()
        if len(ys) < _HWM_M:
            # mirror of the SQL week1 error() guard (round-8 ADVICE):
            # one loud failure mode on both engines, not IndexError
            # here vs NULL-propagation there
            raise ValueError(
                f"op257: events span {len(ys)} < {_HWM_M} days — "
                "damped multiplicative Holt-Winters needs one full "
                "seasonal period (m=7)"
            )
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
            pb = f2(bt)
            l_new = f2(x + l + pb)
            bt = f2(pb + l_new - l)
            s[slot] = f2((y * S) // max(l_new, 1) + sp)
            l = l_new
        t_last = len(ys) - 1
        out = {
            "event_type": [pdf["event_type"].iloc[0]],
            "level": [l],
            "trend": [bt],
        }
        acc, p = l, bt
        for h in range(1, _HWM_H + 1):
            p = f2(p)
            acc += p
            out[f"fc_{h}"] = [(acc * s[(t_last + h) % _HWM_M]) // S]
        return pd.DataFrame(out)

    schema = (
        "event_type string, level long, trend long, "
        + ", ".join(f"fc_{h} long" for h in range(1, _HWM_H + 1))
    )
    return daily.groupBy("event_type").applyInPandas(hwdm, schema)


# --------------------------------------------------------------------------
# op258: Avro OCF sink pairing for the open-schema records table
# --------------------------------------------------------------------------

# The obs VALUES are the same hand transcription of the three SeaBASS
# fixtures that certifies op204 (operators/scans.py::_OP204_SQL) —
# re-aggregated without the group dim: the sink pairing certifies the
# TRANSPORT (long records → OCF bytes → back), not the resolution.
_OP258_SQL = """
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
)
SELECT dataset_id, field,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_q
FROM obs
GROUP BY dataset_id, field
"""

_OBS_AVRO_SCHEMA = {
    "type": "record",
    "name": "Obs",
    "fields": [
        {"name": "dataset_id", "type": "string"},
        {"name": "field", "type": "string"},
        {"name": "value", "type": "double"},
    ],
}


def _obs_avro_write(out_dir: str):
    def write(it):
        import pandas as pd
        from pyspark import TaskContext

        from ocdb_server_spark.sources.avro_ocf import write_ocf

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in it:
            for r in pdf.to_dict("records"):
                rows.append(
                    {
                        "dataset_id": r["dataset_id"],
                        "field": r["field"],
                        "value": float(r["value"]),
                    }
                )
        if not rows:  # empty partition: no file, not an empty OCF
            return
        codec = "deflate" if pid % 2 else "null"
        path = os.path.join(out_dir, f"obs-{pid:05d}.avro")
        # PID-discriminated tmp name: a speculative/zombie first
        # attempt writing the same partition must not interleave
        # bytes with the retry's stream (same pattern as the BGZF
        # and fixture writers); last os.replace wins atomically.
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(write_ocf(_OBS_AVRO_SCHEMA, rows, codec=codec,
                              rows_per_block=8))
        os.replace(tmp, path)
        yield pd.DataFrame({"path": [path], "n_rows": [len(rows)]})

    return write


def _obs_avro_read(it):
    import pandas as pd

    from ocdb_server_spark.sources.avro_ocf import read_ocf

    for pdf in it:
        for content in pdf["content"]:
            rows = read_ocf(bytes(content))
            if rows:
                yield pd.DataFrame(
                    {
                        "dataset_id": [r["dataset_id"] for r in rows],
                        "field": [r["field"] for r in rows],
                        "value": [r["value"] for r in rows],
                    }
                )


@register(
    "op258_avro_records_sink",
    oracle=_OP258_SQL,
    deps=(_obs_avro_write, _obs_avro_read, seabass_fixture_corpus,
          _avro_kernel, _seabass_kernel),
)
def op258_avro_records_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCF Avro SINK pairing for the open-schema records table — the
    op204 ↔ op252 gap named in SURVEY §7.8 (the writer existed, only
    the pairing was missing): the long `(dataset_id, field, value)`
    frame from the SeaBASS fixture corpus (scans.seabass_fixture_corpus
    — one text scan per header signature) is exported executor-side as
    Avro Object Container Files — the record-oriented interchange
    format an archive consumer actually takes for open-schema records
    (a fixed parquet schema can't hold per-file field sets; the long
    triple CAN, and Avro carries it with the schema in the container
    header) — then re-read through binaryFile + read_ocf and
    re-aggregated. The per-(dataset_id, field) count + quantized sum
    must hash-match the fixtures' hand transcription: a value corrupted
    anywhere in parse → long → OCF double bits → decode breaks the
    hash. Codec alternates null/deflate per partition; 8-row blocks
    force multi-block files (every fixture dataset exceeds one block) so block framing is exercised, not just
    one-block containers.

    Scale shape: op252's exactly — encode and decode are mapInPandas
    stages, payload bytes live and die inside one task, the shuffle
    after decode carries the (dataset_id, field) aggregate only; the
    partitionBy-style repartition on dataset_id bounds each OCF file's
    writer state. The ≤4-row manifest collect() forces the write
    before the read plan is returned (bounded, op252's rule)."""
    from ocdb_server_spark.operators.scans import seabass_fixture_corpus

    out_dir = scratch_dir("avro_records", sf_dir)
    long_tbl = seabass_fixture_corpus(spark)
    manifest = (
        long_tbl.repartition(3, F.col("dataset_id"))
        .mapInPandas(_obs_avro_write(out_dir), "path string, n_rows long")
        .collect()
    )
    assert sum(r.n_rows for r in manifest) > 0
    back = (
        spark.read.format("binaryFile")
        .load(out_dir)
        .select("content")
        .mapInPandas(
            _obs_avro_read, "dataset_id string, field string, value double"
        )
    )
    return back.groupBy("dataset_id", "field").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum(F.round(F.col("value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("sum_q"),
    )


# --------------------------------------------------------------------------
# op259: Croston / SBA intermittent-demand forecasting
# --------------------------------------------------------------------------

_CR_K = 32  # demand series = o_custkey % 32; with the 13-month window
# below, ≈18% of (series, day) cells have demand: genuinely intermittent
_CR_FROM = "2000-07-01 00:00:00"  # bound the recursion to ~400 daily steps
# (the full 6.5-year span costs the DuckDB side a 2400-step recursive
# join — 21 s of sweep budget for no extra certification power)

# Croston 1972 / Syntetos-Boylan 2005 (SBA), α = 1/2, integer-exact.
# State per series: z (smoothed demand size), p (smoothed inter-demand
# interval), q (periods since last demand), nd (demands seen). Updates
# happen ONLY at nonzero-demand periods:
#     z' = (y + z) // 2          (α-average, nonneg → // is exact f2)
#     p' = (q + 1 + p) // 2      (interval = gap since last demand)
# Init at the FIRST demand: z = y, p = t + 1 (1-based interval from
# series start). Point forecasts, quantized ×1000 (all operands nonneg
# so // floors identically in python and DuckDB):
#     fc_croston_q = z·1000 // p
#     fc_sba_q     = z·3000 // (4p)      (SBA bias factor 1 − α/2 = 3/4)
_OP259_SQL = f"""
WITH RECURSIVE o AS (
  SELECT * FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_CR_FROM}'),
bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
         MAX(CAST(o_orderdate AS DATE)) AS d1 FROM o),
maxt AS (SELECT CAST(d1 - d0 AS BIGINT) AS m FROM bounds),
counts AS (
  SELECT o_custkey % {_CR_K} AS k,
         CAST(CAST(o_orderdate AS DATE) - b.d0 AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM o CROSS JOIN bounds b
  GROUP BY 1, 2),
spine AS (
  SELECT CAST(s.i AS BIGINT) AS k, CAST(t.i AS BIGINT) AS t
  FROM UNNEST(range(0, {_CR_K})) s(i), maxt m,
       UNNEST(range(0, m.m + 1)) t(i)),
daily AS (
  SELECT s.k, s.t, COALESCE(c.y, CAST(0 AS BIGINT)) AS y
  FROM spine s LEFT JOIN counts c ON s.k = c.k AND s.t = c.t),
cr AS (
  SELECT k, CAST(0 AS BIGINT) AS t,
         CASE WHEN y > 0 THEN y ELSE CAST(0 AS BIGINT) END AS z,
         CASE WHEN y > 0 THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS p,
         CAST(0 AS BIGINT) AS q,
         CASE WHEN y > 0 THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS nd
  FROM daily WHERE t = 0
  UNION ALL
  SELECT h.k, h.t + 1,
         CASE WHEN h.nd = 0 THEN
                CASE WHEN d.y > 0 THEN d.y ELSE CAST(0 AS BIGINT) END
              WHEN d.y > 0 THEN (d.y + h.z) // 2
              ELSE h.z END AS z,
         CASE WHEN h.nd = 0 THEN
                CASE WHEN d.y > 0 THEN h.t + 2 ELSE CAST(0 AS BIGINT) END
              WHEN d.y > 0 THEN (h.q + 1 + h.p) // 2
              ELSE h.p END AS p,
         CASE WHEN d.y > 0 OR h.nd = 0 THEN CAST(0 AS BIGINT)
              ELSE h.q + 1 END AS q,
         h.nd + CASE WHEN d.y > 0 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS nd
  FROM cr h
  JOIN daily d ON d.k = h.k AND d.t = h.t + 1
  CROSS JOIN maxt m
  WHERE h.t + 1 <= m.m
)
SELECT h.k AS series_k,
       h.nd AS n_demands,
       h.z AS z_size,
       h.p AS p_interval,
       h.z * 1000 // h.p AS fc_croston_q,
       h.z * 3000 // (h.p * 4) AS fc_sba_q
FROM cr h CROSS JOIN maxt m
WHERE h.t = m.m AND h.nd > 0
"""


@register("op259_croston_sba", oracle=_OP259_SQL)
def op259_croston_sba(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON / SBA intermittent-demand forecasting (SURVEY §7.8
    round-9 candidate 3 — the forecasting family's sparse-series
    member): op231/op253/op254/op257 smooth EVERY period, which is
    known-biased when most periods have zero demand (spare parts,
    long-tail SKUs, rare event types). Croston's method decomposes
    the series into demand SIZE and inter-demand INTERVAL, each
    SES-smoothed only at demand points; the point forecast is their
    ratio, and SBA (Syntetos-Boylan 2005) multiplies by 1 − α/2 to
    correct Croston's convexity bias — the standard pairing in
    intermittent-demand practice (M5-competition baseline set).

    Demand series: daily order counts per o_custkey % 32 (≈18%
    nonzero days at sf0.01 — genuinely intermittent). α = 1/2 keeps
    every update one integer halving on nonneg operands, so the
    state loop and both quantized forecasts are bit-identical
    between applyInPandas and DuckDB's WITH RECURSIVE (op253's
    certification pattern; no _HW_OFF shift needed — every operand
    here is provably nonnegative, noted per value in _OP259_SQL).

    Scale: one shuffle on the series key; a ~400-step ordered loop
    per series inside one task; series parallelize freely (10^6 SKUs
    = 10^6 independent tasks). The daily spine is built per-series
    by sequence() explode — no driver loop, no cross-series state."""
    ords = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(_CR_FROM).cast("timestamp")
    )
    b = ords.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    counts = (
        ords.crossJoin(F.broadcast(b))
        .groupBy(
            (F.col("o_custkey") % _CR_K).cast("bigint").alias("k"),
            F.datediff(F.col("o_orderdate").cast("date"), F.col("d0"))
            .cast("bigint")
            .alias("t"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    spine = (
        spark.range(_CR_K)
        .select(F.col("id").cast("bigint").alias("k"))
        .crossJoin(F.broadcast(b))
        .select(
            "k",
            F.explode(
                F.expr(
                    "sequence(cast(0 as bigint),"
                    " cast(datediff(d1, d0) as bigint))"
                )
            ).alias("t"),
        )
    )
    daily = spine.join(counts, ["k", "t"], "left").select(
        "k", "t", F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y")
    )

    def croston(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        z = p = q = nd = 0
        for y, t in zip(pdf["y"].astype(int), pdf["t"].astype(int)):
            if nd == 0:
                if y > 0:
                    z, p, q, nd = y, t + 1, 0, 1
            elif y > 0:
                z = (y + z) // 2
                p = (q + 1 + p) // 2
                q = 0
                nd += 1
            else:
                q += 1
        if nd == 0:  # series with no demand at all: no forecast row
            return pd.DataFrame(
                columns=[
                    "series_k", "n_demands", "z_size", "p_interval",
                    "fc_croston_q", "fc_sba_q",
                ]
            )
        return pd.DataFrame(
            {
                "series_k": [int(pdf["k"].iloc[0])],
                "n_demands": [nd],
                "z_size": [z],
                "p_interval": [p],
                "fc_croston_q": [z * 1000 // p],
                "fc_sba_q": [z * 3000 // (4 * p)],
            }
        )

    schema = (
        "series_k long, n_demands long, z_size long, p_interval long, "
        "fc_croston_q long, fc_sba_q long"
    )
    return daily.groupBy("k").applyInPandas(croston, schema)

"""Spark 4 Python DataSource: deterministic synthetic-events generator.

The Python DataSource API (pyspark.sql.datasource, Spark 4) is the
public extension point for custom connectors — the Spark-native analog
of the reference's file-reader plugins (SbFileReader etc., public
knowledge — SURVEY.md §0): implement `partitions()` + `read(partition)`
and the engine schedules one task per partition, exactly like a
built-in source.

This source generates a deterministic integer stream (Knuth
multiplicative hash of the row id) so tests and the DuckDB oracle can
reproduce it exactly: no RNG state, no wall clock.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth's 2^32 multiplicative constant — public domain folklore.
_MULT = 2654435761
_MOD = 10_000


class SynthPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            SynthPartition(p, p * per, min((p + 1) * per, self.n_rows))
            for p in range(self.n_parts)
        ]

    def read(self, partition: SynthPartition):
        # Yield ONE Arrow batch per partition instead of per-row tuples:
        # the Python DataSource API accepts pyarrow.RecordBatch, which
        # keeps the Python→JVM hop vectorized (same reason the engine
        # prefers Pandas UDFs over row UDFs everywhere else).
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        # Reduce BEFORE multiplying: ids * _MULT overflows int64 for
        # ids > ~3.47e9, silently diverging from the arbitrary-precision
        # oracle. (ids % _MOD) * (_MULT % _MOD) stays < 1e8 — identical
        # result by modular arithmetic, safe at any id.
        hval = ((ids % _MOD) * (_MULT % _MOD)) % _MOD
        yield pa.record_batch(
            [
                pa.array(ids, pa.int64()),
                pa.array(np.full(len(ids), partition.pid, dtype=np.int32)),
                pa.array(hval, pa.int64()),
            ],
            names=["id", "part", "hval"],
        )


class SynthDataSource(DataSource):
    """`spark.read.format("synth_events").option("rows", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "id bigint, part int, hval bigint"

    def reader(self, schema) -> SynthReader:
        return SynthReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SynthDataSource)


class PrunableSynthReader(SynthReader):
    """SynthReader + FILTER PUSHDOWN (Spark 4.1's `pushFilters` on the
    Python DataSource API): range predicates on `id` are absorbed and
    turned into PARTITION PRUNING — `partitions()` emits only chunks
    overlapping the pushed [lo, hi) range, so filtered scans schedule
    fewer tasks and generate fewer rows, exactly like a file source
    skipping row groups. Unsupported filters are yielded back and
    Spark re-applies them above the scan (the API's remainder
    contract), so absorbing a filter can narrow but never change
    results."""

    def __init__(self, options):
        super().__init__(options)
        self.lo = 0
        self.hi = self.n_rows
        self.pushed: list = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("id",) or col == "id":
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    self.pushed.append(f)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    self.pushed.append(f)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    self.pushed.append(f)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    self.pushed.append(f)
                    continue
            yield f  # not ours: Spark re-applies it above the scan

    def partitions(self):
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        out = []
        for p in range(self.n_parts):
            s, e = p * per, min((p + 1) * per, self.n_rows)
            s, e = max(s, self.lo), min(e, self.hi)
            if s < e:  # prune chunks entirely outside the pushed range
                out.append(SynthPartition(p, s, e))
        return out


class PrunableSynthDataSource(DataSource):
    """`spark.read.format("synth_events_pushdown")...` — op236."""

    @classmethod
    def name(cls) -> str:
        return "synth_events_pushdown"

    def schema(self) -> str:
        return "id bigint, part int, hval bigint"

    def reader(self, schema) -> PrunableSynthReader:
        return PrunableSynthReader(self.options)


def register_pushdown(spark) -> None:
    """Idempotent registration of the pushdown-capable variant."""
    spark.dataSource.register(PrunableSynthDataSource)

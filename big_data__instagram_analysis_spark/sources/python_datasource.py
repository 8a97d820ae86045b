"""Custom Python DataSource (Spark 4 DataSource API): a partitioned,
deterministic synthetic-edge generator.

This is the extension point a reference user needs when their data lives
in a format/system Spark has no built-in connector for: subclass
``pyspark.sql.datasource.DataSource``, declare the schema, and hand the
scheduler a ``partitions()`` list — Spark then runs ``read(partition)``
once per split, in parallel, exactly like any native source. The
generator here is closed-form (multiplicative-hash edges over a fixed
node domain), which makes a CUSTOM PYTHON SOURCE oracle-checkable: DuckDB
reproduces the same rows from ``range(n)`` with the same arithmetic.

Scale notes:
  - ``partitions()`` is the parallelism contract — one InputPartition per
    split, sized by the option, so a 10^12-edge generation fans out across
    the cluster instead of funneling through the driver.
  - ``read()`` yields plain tuples per partition; Spark batches them
    through Arrow. Still Python-speed per row — fine for generators and
    API shims; a hot path belongs in a native format. That trade-off is
    the documented cost of this extension point, not a surprise.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

NODE_DOMAIN = 1000
_A = 2654435761  # Knuth multiplicative hash
_B = 40503


def edge_formula_sql(n: int) -> str:
    """DuckDB SQL producing the identical edge table (the oracle twin)."""
    return (
        f"SELECT i AS edge_id, (i * {_A}) % {NODE_DOMAIN} AS src, "
        f"(i * {_B} + 7) % {NODE_DOMAIN} AS dst FROM range({n}) t(i)"
    )


class SynthEdgesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = (self.n + self.num_partitions - 1) // self.num_partitions
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * _A) % NODE_DOMAIN, (i * _B + 7) % NODE_DOMAIN)


class SynthEdgesSource(DataSource):
    """``spark.read.format("synthedges").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthedges"

    def schema(self) -> str:
        return "edge_id bigint, src bigint, dst bigint"

    def reader(self, schema) -> SynthEdgesReader:
        return SynthEdgesReader(self.options)


def register(spark) -> None:
    """Idempotent registration on a (possibly driver-owned) session."""
    spark.dataSource.register(SynthEdgesSource)


# --- Streaming variant (Spark 4 SimpleDataSourceStreamReader) -----------------

TICK_TOTAL = 5_000
TICK_BATCH = 1_000
_SERIES = 5


def tick_row(i: int) -> tuple:
    """Closed-form tick i → (tick_id, series, value) — shared by the stream
    reader and (via tick_formula_sql) the DuckDB oracle."""
    return (i, i % _SERIES, ((i * _A) % 1000) / 10.0)


def tick_formula_sql() -> str:
    """DuckDB SQL producing the identical tick table (the oracle twin)."""
    return (
        f"SELECT i AS tick_id, i % {_SERIES} AS series, "
        f"((i * {_A}) % 1000) / 10.0 AS value FROM range({TICK_TOTAL}) t(i)"
    )


class TickStreamReader:
    """SimpleDataSourceStreamReader: offset = next unread tick index.

    The simple reader contract is driver-side reads with executor-side
    REPLAY: ``read(start)`` serves a fresh micro-batch and advances the
    offset; ``readBetweenOffsets`` regenerates any (start, end) range
    deterministically for recovery — which is why the generator must be a
    pure function of the offset, the same property that makes the source
    oracle-checkable. A partition-parallel production source implements
    DataSourceStreamReader with ``partitions()`` instead; the simple
    variant trades parallelism for the minimal offset-management surface.
    """

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + TICK_BATCH, TICK_TOTAL)
        return iter([tick_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([tick_row(i) for i in range(start["i"], end["i"])])

    def commit(self, end: dict) -> None:
        pass


class SynthTicksSource(DataSource):
    """``spark.readStream.format("synthticks").load()``."""

    @classmethod
    def name(cls) -> str:
        return "synthticks"

    def schema(self) -> str:
        return "tick_id bigint, series int, value double"

    def simpleStreamReader(self, schema):
        return TickStreamReader()


def register_streaming(spark) -> None:
    spark.dataSource.register(SynthTicksSource)


# --- Custom Python DataSource WRITER (Spark 4 writer API) ---------------------


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced."""

    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class SimpleCsvWriter(DataSourceWriter):
    """Two-phase file writer: each task stages `stage-*.csv`, the driver-side
    commit() renames staged files into place and drops a _SUCCESS manifest —
    the same stage-then-publish protocol every production sink uses so a
    failed/speculated task can abort() without half-written output becoming
    visible."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"stage-{uuid.uuid4().hex}.csv")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(",".join(str(v) for v in row) + "\n")
                n += 1
        return _FileCommit(staged, n)

    def commit(self, messages) -> None:
        import json
        import os

        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.csv")
            os.replace(m.path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total}))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SimpleCsvSink(DataSource):
    """``df.write.format("simplecsvsink").option("path", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "simplecsvsink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return SimpleCsvWriter(self.options)

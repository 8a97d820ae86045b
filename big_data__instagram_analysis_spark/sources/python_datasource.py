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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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

"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The engine's file sources (parquet/csv/json/text/orc — queries/scans.py)
all ride Spark's built-in JVM readers. This module exercises the OTHER
source surface a complete engine needs: user-defined sources written in
Python — the Spark 4 mechanism for ingesting from systems with no JVM
connector (internal REST feeds, bespoke binary formats, message
queues). The contract demonstrated:

  * `partitions()` declares the parallel split — here one partition
    per parquet ROW GROUP batch (mod-assigned), so the read scales out
    exactly like a native scan: each executor task opens the file
    independently and reads only its own row groups;
  * `read(partition)` yields pyarrow RecordBatches (the fast path —
    Arrow batches cross into the JVM without per-row pickling; yielding
    tuples is the slow path this implementation avoids);
  * column projection is applied inside the reader (only the declared
    schema's columns are read from the footer), mirroring what a
    pushed-down ReadSchema does for native scans.

At 100 TB the same class shape points at an object-store listing:
partitions() returns one InputPartition per file (or file range), and
the driver never touches data.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PYDS_NAME = "jsmr_docs_pyds"
PYDS_COLUMNS = ["doc_id", "lang", "n_chars"]
PYDS_PARALLELISM = 4


class DocsDataSource(DataSource):
    """documents.parquet via the Python DataSource API (row-group
    parallel, Arrow-batch yielding)."""

    @classmethod
    def name(cls) -> str:
        return PYDS_NAME

    def schema(self) -> str:
        return "doc_id long, lang string, n_chars long"

    def reader(self, schema) -> DataSourceReader:
        return _DocsReader(self.options)


def _list_files(path: str) -> list[str]:
    """A parquet 'table' is a single file (the fixtures) or a directory
    of part files (any Spark-written dataset) — handle both, like a
    real connector must."""
    import glob
    import os

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


class _DocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.n = PYDS_PARALLELISM

    def partitions(self):
        return [InputPartition(i) for i in range(self.n)]

    def read(self, partition):
        import pyarrow.parquet as pq

        # Global (file, row-group) index mod-assigned to partitions —
        # every task opens only the files whose row groups it owns.
        idx = 0
        for fp in _list_files(self.path):
            f = pq.ParquetFile(fp)
            for rg in range(f.num_row_groups):
                if idx % self.n == partition.value:
                    yield from f.read_row_group(rg, columns=PYDS_COLUMNS).to_batches()
                idx += 1


def register(spark) -> None:
    """Idempotent registration (re-register overwrites on Spark 4)."""
    spark.dataSource.register(DocsDataSource)

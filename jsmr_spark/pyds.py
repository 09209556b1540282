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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

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


# --- custom Python BATCH WRITER (DataSource.writer) -------------------

SINK_NAME = "jsmr_tsv_sink"


class TsvSinkDataSource(DataSource):
    """Tab-separated batch SINK via the Python DataSource writer API —
    the outbound twin of DocsDataSource: each executor task streams its
    Arrow batches to one part file (never materializing the partition),
    returns a WriterCommitMessage naming the file, and the DRIVER
    commits by writing a manifest listing exactly the files of
    successful tasks — the same two-phase rename-free commit protocol
    a real object-store sink uses (speculative/retried task files not
    in the manifest are simply never read)."""

    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool):
        return _TsvWriter(self.options.get("path"))


from dataclasses import dataclass


@dataclass
class _TsvCommit(WriterCommitMessage):
    file: str
    rows: int


class _TsvWriter(DataSourceArrowWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.tsv"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for batch in iterator:
                for row in batch.to_pylist():
                    fh.write("\t".join(str(v) for v in row.values()) + "\n")
                    n += 1
        return _TsvCommit(fname, n)

    def commit(self, messages):
        import json
        import os

        manifest = [{"file": m.file, "rows": m.rows} for m in messages]
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        pass  # uncommitted part files are ignored by manifest readers


def register_sink(spark) -> None:
    spark.dataSource.register(TsvSinkDataSource)


# --- custom Python STREAMING WRITER (DataSource.streamWriter) ---------

STREAM_SINK_NAME = "jsmr_tsv_stream_sink"


class TsvStreamSinkDataSource(DataSource):
    """Streaming flavor of the TSV sink: same per-task part files and
    driver-side manifest, but committed PER MICRO-BATCH with the
    batchId — and idempotently, so a replayed batch (restart, retry)
    can never double its rows in the manifest. Reading through the
    manifest is therefore exactly-once even though the underlying
    files are append-only — the Python-connector version of the
    foreachBatch exactly-once pattern (stream_exactly_once_sink)."""

    @classmethod
    def name(cls) -> str:
        return STREAM_SINK_NAME

    def streamWriter(self, schema, overwrite: bool):
        return _TsvStreamWriter(self.options.get("path"))


class _TsvStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.tsv"
        n = 0
        with open(os.path.join(self.path, fname), "w") as fh:
            for row in iterator:
                fh.write("\t".join(str(v) for v in row) + "\n")
                n += 1
        return _TsvCommit(fname, n)

    def commit(self, messages, batchId: int):
        import json
        import os

        mpath = os.path.join(self.path, f"_BATCH_{batchId:06d}.json")
        if os.path.exists(mpath):  # replayed batch: files already manifested
            return
        manifest = [
            {"file": m.file, "rows": m.rows} for m in messages if m is not None
        ]
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, mpath)  # atomic publish

    def abort(self, messages, batchId: int):
        pass  # unmanifested part files are never read


def register_stream_sink(spark) -> None:
    spark.dataSource.register(TsvStreamSinkDataSource)

"""Custom connector via the Python DataSource API (Spark 4) — a
CDC-envelope JSONL source registered as ``format("cdc_jsonl")``.

The reference's wire contract is "a topic of JSON CDC envelopes whose
value column feeds the parser" (reference pipeline/app.py:39-44).  The
Kafka reader (streaming/sources.py) IS that contract when a broker
exists; this module provides the same ``value``-column contract as a
first-class custom source over a directory of ``.jsonl`` files —
exercising Spark 4's Python DataSource API end to end:

* **Batch** (:class:`_CdcJsonlReader`): one :class:`InputPartition`
  per file, so the scan parallelizes across executors exactly like a
  file source; rows are ``(value, src_file)`` — compose
  ``sources/cdc.parse_cdc_envelope`` on top, identical to the Kafka
  path.
* **Streaming** (:class:`_CdcJsonlStreamReader`,
  ``SimpleDataSourceStreamReader``): the offset is a cursor over the
  lexicographically-sorted file list (``{"idx": N}`` = first N files
  consumed).  New files become new micro-batches;
  ``readBetweenOffsets`` re-reads a committed range bit-for-bit, which
  is what makes checkpointed replay exact.  The simple-reader variant
  reads on the DRIVER — right for control-plane-sized feeds and tests;
  a partition-planning ``DataSourceStreamReader`` is the drop-in
  upgrade when per-batch volume outgrows the driver (same offset
  contract).

File-cursor caveat (documented, matching Spark's own file source):
files must be added with monotonically-sorting names (e.g.
zero-padded sequence or timestamp prefixes) and never mutated in
place; a file sorting BEFORE the committed cursor is never picked up.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "value string, src_file string"


def _list_files(path: str) -> list[str]:
    try:
        names = sorted(
            n for n in os.listdir(path) if n.endswith(".jsonl")
        )
    except FileNotFoundError:
        return []
    return [os.path.join(path, n) for n in names]


def _read_file(fpath: str):
    with open(fpath, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line:
                yield (line, os.path.basename(fpath))


class _FilePartition(InputPartition):
    def __init__(self, fpath: str) -> None:
        self.fpath = fpath


class _CdcJsonlReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._path = options["path"]

    def partitions(self):
        return [_FilePartition(f) for f in _list_files(self._path)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition):
        if not partition.fpath:
            return iter(())
        return _read_file(partition.fpath)


class _CdcJsonlStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self._path = options["path"]

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"idx": 0}

    def read(self, start: dict):
        files = _list_files(self._path)
        end = {"idx": len(files)}
        rows = [
            row
            for f in files[int(start["idx"]) :]
            for row in _read_file(f)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        files = _list_files(self._path)[int(start["idx"]) : int(end["idx"])]
        return iter(row for f in files for row in _read_file(f))

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to acknowledge


class CdcJsonlDataSource(DataSource):
    """``spark.dataSource.register(CdcJsonlDataSource)`` then
    ``spark.read.format("cdc_jsonl").option("path", dir)`` (batch) or
    ``spark.readStream...`` (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_jsonl"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _CdcJsonlReader:
        return _CdcJsonlReader(self.options)

    def simpleStreamReader(  # noqa: N802 (API name)
        self, schema
    ) -> _CdcJsonlStreamReader:
        return _CdcJsonlStreamReader(self.options)

"""Spark 4 Python DataSource for Google-Drive-hosted CSV folders —
``spark.read.format("gdrive_csv")``.

The reference treats a Drive folder as its catalog and fetches files on
the driver (/root/reference/src/loader.py:105-122 listing, :203 content
fetch). This connector re-expresses that as a REAL Spark source: the
DRIVER lists the folder once to plan one :class:`InputPartition` per
file, and each EXECUTOR partition downloads and parses its own file —
so a 10 000-file folder fans out across the cluster instead of
serializing through the driver, and Catalyst sees an ordinary relation
(project/filter above the scan as usual).

Usage::

    spark.dataSource.register(DriveCsvDataSource)
    df = (spark.read.format("gdrive_csv")
          .schema("region string, amount string")       # all-string columns
          .option("base_url", "http://127.0.0.1:8099")  # Drive API endpoint
          .option("folder_id", "folder1")
          .option("token", "<bearer>")                  # optional
          .load())

Contract:
- every schema field is STRING (CSV is untyped; cast downstream — the
  same contract as Spark's own CSV reader without inferSchema);
- columns are matched to each file's HEADER by name, so files with
  different column orders in one folder still line up; a file missing a
  requested column yields NULLs for it;
- only files with a ``text/csv`` mimeType (or a ``.csv`` name) are read
  — the same mime-filter idea as the reference's query discovery
  (loader.py:200);
- ``token`` must be a static bearer string (partitions are pickled to
  executors; use a pre-fetched token, not a live provider object).

Wire protocol is :class:`~sheetsetl_spark.sinks.drive_http.
HttpDriveClient` (stdlib urllib; tested against the local fake Drive
server — tests/test_drive_source.py).
"""

from __future__ import annotations

import csv
import io
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class DriveFilePartition(InputPartition):
    def __init__(self, file_id: str, name: str):
        self.file_id = file_id
        self.name = name


class DriveCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gdrive_csv"

    def schema(self) -> str:
        # sensible default when the user gives no schema: one raw line
        # per record plus its source file
        return "file_name string, line string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return DriveCsvReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "DriveCsvStreamReader":
        return DriveCsvStreamReader(schema, self.options)


class DriveCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        if "base_url" not in options or "folder_id" not in options:
            raise ValueError(
                "gdrive_csv requires options base_url and folder_id"
            )
        self.schema = schema
        self.base_url = options["base_url"]
        self.folder_id = options["folder_id"]
        self.token = options.get("token", "")
        for f in schema.fields:
            if f.dataType.typeName() != "string":
                raise ValueError(
                    f"gdrive_csv yields STRING columns only; cast downstream "
                    f"(field {f.name!r} is {f.dataType.simpleString()})"
                )

    def _client(self):
        from sheetsetl_spark.sinks.drive_http import HttpDriveClient

        return HttpDriveClient(self.base_url, token=self.token)

    def partitions(self) -> list[InputPartition]:
        """Driver-side planning: page through the folder listing; one
        partition per CSV file (the unit of executor parallelism)."""
        client = self._client()
        parts: list[InputPartition] = []
        page_token = None
        while True:
            files, page_token = client.list_files(self.folder_id, page_token)
            for f in files:
                if f.get("mimeType") == "text/csv" or str(f.get("name", "")).endswith(
                    ".csv"
                ):
                    parts.append(DriveFilePartition(f["id"], f.get("name", "")))
            if page_token is None:
                break
        # deterministic plan order regardless of listing order
        parts.sort(key=lambda p: p.file_id)
        return parts

    def read(self, partition: DriveFilePartition) -> Iterator[tuple]:
        """Executor-side: download THIS file and emit schema-aligned rows
        (header-name matching; absent columns -> NULL)."""
        body = self._client().download(partition.file_id).decode("utf-8")
        rows = csv.reader(io.StringIO(body))
        header = next(rows, None)
        if header is None:
            return
        names = [f.name for f in self.schema.fields]
        if names == ["file_name", "line"]:
            # default raw mode: header is data too
            yield (partition.name, ",".join(header))
            for rec in rows:
                yield (partition.name, ",".join(rec))
            return
        index = {col: i for i, col in enumerate(header)}
        picks = [index.get(n) for n in names]
        for rec in rows:
            yield tuple(
                rec[i] if i is not None and i < len(rec) else None for i in picks
            )


class DriveCsvStreamReader(DataSourceStreamReader):
    """Streaming half of the connector: each micro-batch ingests the CSV
    files ADDED to the folder since the last batch — the reference's
    cron-re-run refresh model (/root/reference/README.md:38-43) upgraded
    to incremental Structured Streaming ingestion with exactly-once file
    accounting.

    Offsets are the sorted list of file ids already ingested plus an
    id->name map captured AT LISTING TIME (the Drive API has no monotone
    change cursor at this surface, so the id set IS the position;
    checkpointed as JSON by the engine). partitions(start, end) plans
    one partition per NEW file FROM THE OFFSET ITSELF — no second
    listing — so a file present in the committed end-offset can never be
    silently dropped by a listing race: if it is deleted before read(),
    the task fails loudly (retryable) instead of being recorded as
    ingested without its data. A burst of uploads fans out across
    executors exactly like the batch reader.

    Offset growth: both fields are O(files ever seen in the folder) and
    re-serialized each batch — the same bound as Spark's own
    FileStreamSource seen-files log. For folders beyond ~100k files
    front a compaction (move ingested files out of the watched folder),
    which also matches the reference's operational model of bounded
    report folders (reference README.md:38-43)."""

    def __init__(self, schema: StructType, options: dict):
        self._delegate = DriveCsvReader(schema, options)

    def initialOffset(self) -> dict:
        return {"ingested": [], "names": {}}

    def latestOffset(self) -> dict:
        listed = self._delegate.partitions()
        return {
            "ingested": sorted(p.file_id for p in listed),
            "names": {p.file_id: p.name for p in listed},
        }

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        seen = set(start.get("ingested", []))
        new = [i for i in end.get("ingested", []) if i not in seen]
        names = end.get("names")
        if names is None:
            # pre-r6 checkpoint (ids only): one recovery listing for the
            # names; ids missing from it are files deleted since the
            # offset was captured — surface the loss instead of hiding it
            names = {p.file_id: p.name for p in self._delegate.partitions()}
            gone = [i for i in new if i not in names]
            if gone:
                import logging

                logging.getLogger(__name__).warning(
                    "gdrive_csv: %d file(s) in the committed offset no "
                    "longer exist and cannot be ingested: %s",
                    len(gone),
                    gone,
                )
            new = [i for i in new if i in names]
        return [DriveFilePartition(i, names.get(i, "")) for i in sorted(new)]

    def read(self, partition: DriveFilePartition) -> Iterator[tuple]:
        return self._delegate.read(partition)

    def commit(self, end: dict) -> None:
        pass  # ingested-set offsets need no source-side cleanup

"""Spark 4 Python DataSource for Drive CSV folders, end-to-end against
the local fake Drive HTTP server: driver-side partition planning (one
partition per file, paged listing), executor-side download+parse,
header-name column alignment, mime filtering, and the raw default
schema."""

from __future__ import annotations

import threading
from http.server import HTTPServer

import pytest

from tests.test_drive_http import _FakeDriveState, _Handler


@pytest.fixture()
def drive_with_csvs():
    state = _FakeDriveState()
    handler = type("H", (_Handler,), {"state": state})
    server = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def add(fid, name, mime, body: str):
        state.files[fid] = {
            "id": fid, "name": name, "mimeType": mime, "parents": ["folder1"],
        }
        state.payloads[fid] = body.encode()

    add("f1", "east.csv", "text/csv", "region,amount\neast,10\neast,20\n")
    # different column ORDER — header-name alignment must handle it
    add("f2", "west.csv", "text/csv", "amount,region\n30,west\n")
    # extra column + a missing 'amount' column
    add("f3", "north.csv", "text/csv", "region,note\nnorth,hi\n")
    add("f4", "readme.txt", "text/plain", "not a csv")
    try:
        yield state, f"http://127.0.0.1:{server.server_port}"
    finally:
        server.shutdown()
        server.server_close()


def _register(spark):
    from sheetsetl_spark.sources.drive_source import DriveCsvDataSource

    spark.dataSource.register(DriveCsvDataSource)


def test_reads_folder_with_header_alignment(spark, drive_with_csvs):
    _, base = drive_with_csvs
    _register(spark)
    df = (
        spark.read.format("gdrive_csv")
        .schema("region string, amount string")
        .option("base_url", base)
        .option("folder_id", "folder1")
        .load()
    )
    rows = {tuple(r) for r in df.collect()}
    assert rows == {
        ("east", "10"),
        ("east", "20"),
        ("west", "30"),     # reordered columns aligned by header name
        ("north", None),    # missing 'amount' -> NULL; .txt file skipped
    }
    # one partition per CSV file — the executor-parallel unit
    assert df.rdd.getNumPartitions() == 3


def test_default_schema_is_raw_lines(spark, drive_with_csvs):
    _, base = drive_with_csvs
    _register(spark)
    df = (
        spark.read.format("gdrive_csv")
        .option("base_url", base)
        .option("folder_id", "folder1")
        .load()
    )
    assert df.columns == ["file_name", "line"]
    per_file = {
        r["file_name"]: r["n"]
        for r in df.groupBy("file_name").count().withColumnRenamed("count", "n").collect()
    }
    assert per_file == {"east.csv": 3, "west.csv": 2, "north.csv": 2}


def test_non_string_schema_rejected(spark, drive_with_csvs):
    _, base = drive_with_csvs
    _register(spark)
    df = (
        spark.read.format("gdrive_csv")
        .schema("region string, amount int")
        .option("base_url", base)
        .option("folder_id", "folder1")
        .load()
    )
    with pytest.raises(Exception, match="STRING columns only"):
        df.collect()


def test_casts_compose_downstream(spark, drive_with_csvs):
    """The all-string contract composes with ordinary Catalyst casts and
    aggregation — the source behaves as a regular relation."""
    from pyspark.sql import functions as F

    _, base = drive_with_csvs
    _register(spark)
    df = (
        spark.read.format("gdrive_csv")
        .schema("region string, amount string")
        .option("base_url", base)
        .option("folder_id", "folder1")
        .load()
    )
    total = (
        df.filter(F.col("amount").isNotNull())
        .agg(F.sum(F.col("amount").cast("decimal(18,2)")).alias("t"))
        .collect()[0]["t"]
    )
    assert float(total) == 60.0


def test_streaming_ingests_only_new_files(spark, drive_with_csvs, tmp_path):
    """readStream over the folder: batch 1 ingests the existing CSVs;
    a file uploaded between triggers arrives in a later batch EXACTLY
    once (id-set offsets, checkpointed)."""
    state, base = drive_with_csvs
    _register(spark)

    out = str(tmp_path / "out")

    def run_once():
        h = (
            spark.readStream.format("gdrive_csv")
            .schema("region string, amount string")
            .option("base_url", base)
            .option("folder_id", "folder1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        h.awaitTermination(120)

    run_once()
    first = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert ("east", "10") in first and ("west", "30") in first
    assert len(first) == 4

    # upload a new file, then resume from the checkpoint
    state.files["f9"] = {
        "id": "f9", "name": "south.csv", "mimeType": "text/csv",
        "parents": ["folder1"],
    }
    state.payloads["f9"] = b"region,amount\nsouth,40\n"
    run_once()
    second = {tuple(r) for r in spark.read.parquet(out).collect()}
    # exactly the new file's rows appended — earlier ids sit in the
    # committed offset, so nothing is re-ingested
    assert second - first == {("south", "40")}
    assert len(second) == 5


def test_stream_partitions_plan_from_offset_not_relisting(drive_with_csvs):
    """The offset captured at latestOffset time IS the plan: a file
    deleted between listing and planning must still be planned (read()
    then fails loudly and retryably) instead of being silently skipped
    yet permanently recorded as ingested (r5 ADVICE)."""
    from pyspark.sql.types import StructType

    from sheetsetl_spark.sources.drive_source import DriveCsvStreamReader

    state, base = drive_with_csvs
    schema = StructType.fromDDL("region string, amount string")
    reader = DriveCsvStreamReader(
        schema, {"base_url": base, "folder_id": "folder1"}
    )
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert set(end["names"]) == set(end["ingested"])

    # delete one file AFTER the offset was captured
    del state.files["f2"]
    parts = reader.partitions(start, end)
    ids = {p.file_id for p in parts}
    assert "f2" in ids, "deleted-after-listing file must still be planned"
    by_id = {p.file_id: p.name for p in parts}
    assert by_id["f2"] == "west.csv"  # name comes from the offset, not a re-list


def test_stream_partitions_old_format_offset_logs_loss(drive_with_csvs, caplog):
    """Pre-r6 checkpoints carry ids only: recovery re-lists once and
    LOGS any id that no longer exists rather than silently dropping."""
    import logging

    from pyspark.sql.types import StructType

    from sheetsetl_spark.sources.drive_source import DriveCsvStreamReader

    state, base = drive_with_csvs
    schema = StructType.fromDDL("region string, amount string")
    reader = DriveCsvStreamReader(
        schema, {"base_url": base, "folder_id": "folder1"}
    )
    old_end = {"ingested": sorted(state.files)}  # no "names" field
    del state.files["f3"]
    with caplog.at_level(logging.WARNING):
        parts = reader.partitions({"ingested": []}, old_end)
    ids = {p.file_id for p in parts}
    assert "f3" not in ids and "f1" in ids
    assert any("no longer exist" in r.message for r in caplog.records)

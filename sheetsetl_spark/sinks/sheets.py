"""Google Sheets upsert sink — the reference's A8 operator
(/root/reference/src/loader.py:144-189) re-expressed as a driver-side sink
adapter.

Contract reproduced:
- target name = query name (the pipeline strips '.sql', loader.py:152);
- upsert identity = (dest folder, name, spreadsheet mime): list the
  folder, update in place when found (parents stripped, loader.py:170),
  else create (loader.py:176-179);
- payload = header + stringified rows as CSV (loader.py:238-246), with
  the Drive conversion to a native sheet (upload mime text/csv, target
  mime spreadsheet, loader.py:153-157);
- transport errors abort only this output (loader.py:184-186) — the
  pipeline's per-file isolation handles that.

The Drive/Sheets HTTP client is injected; this container has no Google
API client or credentials (the reference's OAuth bootstrap, loader.py:
78-102, is likewise environment-specific), so constructing the sink
without a client yields a clear NotImplementedError at write time while
keeping the upsert logic real and unit-testable with a fake client.
"""

from __future__ import annotations

import io
from typing import Any, Protocol

from pyspark.sql import DataFrame

SPREADSHEET_MIME = "application/vnd.google-apps.spreadsheet"


class DriveClient(Protocol):
    """Minimal Drive surface the sink needs (files().list/create/update)."""

    def list_files(self, folder_id: str) -> list[dict[str, Any]]: ...

    def create_file(self, metadata: dict[str, Any], csv_bytes: bytes) -> str: ...

    def update_file(self, file_id: str, metadata: dict[str, Any], csv_bytes: bytes) -> str: ...


class GoogleSheetsSink:
    def __init__(
        self,
        dest_folder: str,
        client: DriveClient | None = None,
        max_driver_rows: int = 2_000_000,
    ):
        self.dest_folder = dest_folder
        self.client = client
        self.max_driver_rows = max_driver_rows

    def _to_csv_bytes(self, df: DataFrame) -> bytes:
        """Materialize the result as CSV on the driver.

        Sheets is inherently a small-output sink (2M-cell cap upstream of
        here), so a driver-side collect is correct; Arrow keeps the
        transfer columnar. Guarded against misuse on unguarded inputs.
        """
        pdf = df.limit(self.max_driver_rows + 1).toPandas()
        if len(pdf) > self.max_driver_rows:
            raise ValueError("result exceeds driver materialization bound; guard upstream")
        buf = io.StringIO()
        pdf.to_csv(buf, index=False)
        return buf.getvalue().encode()

    def write(self, df: DataFrame, name: str) -> None:
        if self.client is None:
            raise NotImplementedError(
                "GoogleSheetsSink needs an injected DriveClient (no Google API "
                "client/credentials in this environment; see module docstring)"
            )
        csv_bytes = self._to_csv_bytes(df)
        metadata = {
            "name": name,
            "mimeType": SPREADSHEET_MIME,
            "parents": [self.dest_folder],
        }
        existing_id = None
        for ff in self.client.list_files(self.dest_folder):
            if ff.get("mimeType") == SPREADSHEET_MIME and ff.get("name") == name:
                existing_id = ff.get("id")
        if existing_id:
            meta = {k: v for k, v in metadata.items() if k != "parents"}
            self.client.update_file(existing_id, meta, csv_bytes)
        else:
            self.client.create_file(metadata, csv_bytes)

"""Concrete :class:`~sheetsetl_spark.sinks.sheets.DriveClient` speaking
the Google Drive v3 WIRE protocol over stdlib ``urllib`` — no SDK, no
external deps.

The reference drives the same protocol through googleapiclient
(/root/reference/src/loader.py:112-122 paged listing, :153-183 resumable
media upload); this adapter reproduces the actual HTTP shapes so the
sink's upsert logic is exercised against real requests/responses, not
just the in-process fake:

- ``files.list``: ``GET {base}/drive/v3/files?q='<folder>' in parents
  and trashed=false`` with ``pageToken`` paging -> JSON
  ``{"files": [...], "nextPageToken": ...}``;
- resumable upload session: ``POST {base}/upload/drive/v3/files
  ?uploadType=resumable`` (create) / ``PATCH .../files/{id}`` (update)
  with the JSON metadata body -> ``Location`` header = session URI;
- chunk: ``PUT <session>`` with ``Content-Range: bytes a-b/total``;
  ``308 Resume Incomplete`` (+ ``Range`` header) while in progress,
  ``200/201`` with the file JSON when done; HTTP 5xx and short-write
  308s surface as :class:`TransientUploadError` so the sink re-sends
  the SAME chunk — the documented resumable-session recovery.

Tests run this against a local fake Drive HTTP server
(tests/test_drive_http.py) — same wire shapes, no credentials. Against
real Google infrastructure you would pass ``base_url=
"https://www.googleapis.com"`` and a live OAuth bearer token (the
reference's own token bootstrap is equally environment-dependent,
loader.py:78-102).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable
from typing import Any

from sheetsetl_spark.sinks.sheets import TransientUploadError

_LIST_FIELDS = "nextPageToken, files(id, name, mimeType)"


class HttpDriveClient:
    """DriveClient over plain HTTP. ``base_url`` has no trailing slash;
    ``token`` is either a static bearer string or a zero-arg callable
    returning one (e.g. :class:`~sheetsetl_spark.sinks.auth.
    OAuthTokenProvider` — the A11 credential bootstrap). With a callable
    provider, a 401 triggers one forced refresh + retry: the
    expired-mid-run recovery oauth2client performs inside its http
    wrapper (reference loader.py:78-102 context)."""

    def __init__(
        self,
        base_url: str,
        token: str | Callable[[], str] = "",
        timeout: float = 30.0,
        max_rate_limit_retries: int = 4,
        backoff_base: float = 0.5,
        backoff_cap: float = 16.0,
        sleep: Callable[[float], None] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.timeout = timeout
        self.max_rate_limit_retries = max_rate_limit_retries
        self.backoff_base = backoff_base
        self.backoff_cap = backoff_cap
        if sleep is None:
            import time as _time

            sleep = _time.sleep
        self._sleep = sleep

    # -- plumbing ----------------------------------------------------------
    def _bearer(self) -> str:
        return self.token() if callable(self.token) else self.token

    def _headers(self, extra: dict[str, str] | None = None) -> dict[str, str]:
        bearer = self._bearer()
        h = {"Authorization": f"Bearer {bearer}"} if bearer else {}
        h.update(extra or {})
        return h

    def _request(
        self,
        method: str,
        url: str,
        body: bytes | None = None,
        headers: dict[str, str] | None = None,
    ):
        """One HTTP call with the two documented recoveries:

        - 401 with a refreshable token provider: ONE forced refresh +
          retry (expired-mid-run access token);
        - Google rate limiting — ``429``, or ``403`` whose error body
          carries reason ``userRateLimitExceeded``/``rateLimitExceeded``
          (a PLAIN 403 is permission-denied and must NOT retry):
          bounded exponential backoff (base·2^attempt, capped), with a
          numeric ``Retry-After`` header, when present, overriding the
          computed delay — the behavior Google documents for Drive v3
          and the first wire condition a real deployment hits.
        """
        refreshed = False
        attempt = 0
        while True:
            try:
                req = urllib.request.Request(
                    url, data=body, headers=self._headers(headers), method=method
                )
                return urllib.request.urlopen(req, timeout=self.timeout)
            except urllib.error.HTTPError as e:
                force = getattr(self.token, "force_refresh", None)
                if e.code == 401 and callable(force) and not refreshed:
                    refreshed = True  # stale access token: refresh once
                    force()
                    continue
                if (
                    e.code == 429 or (e.code == 403 and _is_rate_limited(e))
                ) and attempt < self.max_rate_limit_retries:
                    delay = _retry_after_seconds(e.headers.get("Retry-After"))
                    if delay is None:
                        delay = min(
                            self.backoff_cap, self.backoff_base * (2**attempt)
                        )
                    attempt += 1
                    self._sleep(delay)
                    continue
                raise

    # -- DriveClient surface ----------------------------------------------
    def list_files(
        self, folder_id: str, page_token: str | None = None
    ) -> tuple[list[dict[str, Any]], str | None]:
        params = {
            "q": f"'{folder_id}' in parents and trashed=false",
            "fields": _LIST_FIELDS,
        }
        if page_token:
            params["pageToken"] = page_token
        url = f"{self.base_url}/drive/v3/files?{urllib.parse.urlencode(params)}"
        with self._request("GET", url) as resp:
            payload = json.loads(resp.read().decode())
        return payload.get("files", []), payload.get("nextPageToken")

    def download(self, file_id: str) -> bytes:
        """File content via ``GET .../files/{id}?alt=media`` — the wire
        shape the reference's query-file fetch uses (googleapiclient
        get_media, loader.py:203 context)."""
        url = f"{self.base_url}/drive/v3/files/{urllib.parse.quote(file_id)}?alt=media"
        with self._request("GET", url) as resp:
            return resp.read()

    def start_upload(self, metadata: dict[str, Any], file_id: str | None = None) -> str:
        if file_id is None:
            method = "POST"
            url = f"{self.base_url}/upload/drive/v3/files?uploadType=resumable"
        else:
            method = "PATCH"
            url = f"{self.base_url}/upload/drive/v3/files/{file_id}?uploadType=resumable"
        body = json.dumps(metadata).encode()
        with self._request(
            method, url, body, {"Content-Type": "application/json; charset=UTF-8"}
        ) as resp:
            session_uri = resp.headers.get("Location")
        if not session_uri:
            raise TransientUploadError("resumable session: no Location header")
        return session_uri

    def upload_chunk(
        self, session: str, chunk: bytes, offset: int, total: int
    ) -> str | None:
        end = offset + len(chunk) - 1
        headers = {
            "Content-Type": "text/csv",
            "Content-Range": f"bytes {offset}-{end}/{total}",
        }
        try:
            resp = self._request("PUT", session, chunk, headers)
        except urllib.error.HTTPError as e:
            if e.code == 308:
                # Resume Incomplete: the server acknowledges received
                # bytes in the Range header. A short write (server holds
                # fewer bytes than we sent) is retryable — surface it so
                # the sink re-sends the same chunk against the session.
                received = _range_end(e.headers.get("Range"))
                if received < end:
                    raise TransientUploadError(
                        f"server holds bytes through {received}, sent through {end}"
                    ) from None
                return None  # chunk fully received, upload continues
            if 500 <= e.code < 600:
                raise TransientUploadError(f"HTTP {e.code}") from None
            raise
        with resp:
            return json.loads(resp.read().decode()).get("id")


def _is_rate_limited(e: urllib.error.HTTPError) -> bool:
    """True iff a 403's JSON error body names a Drive rate-limit reason.
    Reads the (single-use) body; safe because every caller either
    retries with a fresh request or propagates the status code."""
    try:
        payload = json.loads(e.read().decode())
    except Exception:
        return False
    errors = (payload.get("error") or {}).get("errors") or []
    return any(
        err.get("reason") in ("userRateLimitExceeded", "rateLimitExceeded")
        for err in errors
        if isinstance(err, dict)
    )


def _retry_after_seconds(value: str | None) -> float | None:
    """Numeric Retry-After seconds, else None (HTTP-date form falls back
    to computed backoff)."""
    if value is None:
        return None
    try:
        return max(0.0, float(value.strip()))
    except ValueError:
        return None


def _range_end(range_header: str | None) -> int:
    """'bytes=0-1234' -> 1234; absent/malformed -> -1 (nothing stored)."""
    if not range_header or "-" not in range_header:
        return -1
    try:
        return int(range_header.rsplit("-", 1)[1])
    except ValueError:
        return -1

"""FTP sink (SURVEY R27 — ``utils/ftp.py``): driver-side upload of
small serialized outputs with the reference's retry/reconnect policy
(3 attempts, 5 s delay, mkdir -p remote, reconnect on lost session).

The FTP client is injectable so tests exercise retry/reconnect without
a network; the default factory builds a stdlib ``ftplib.FTP``.
"""

from __future__ import annotations

import io
import time
from collections.abc import Callable
from typing import Any


def _default_ftp_factory() -> Any:
    from ftplib import FTP

    return FTP()


class FTPSink:
    def __init__(
        self,
        host: str,
        port: int = 21,
        user: str = "",
        password: str = "",
        remote_dir: str = "/",
        max_retries: int = 3,
        retry_delay: float = 5.0,
        ftp_factory: Callable[[], Any] = _default_ftp_factory,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.remote_dir = remote_dir
        self.max_retries, self.retry_delay = max_retries, retry_delay
        self._ftp_factory = ftp_factory
        self._sleep = sleep
        self._ftp: Any | None = None

    def connect(self) -> bool:
        for attempt in range(1, self.max_retries + 1):
            try:
                ftp = self._ftp_factory()
                ftp.connect(self.host, self.port, timeout=30)
                ftp.login(self.user, self.password)
                self._ftp = ftp
                return True
            except Exception:
                if attempt < self.max_retries:
                    self._sleep(self.retry_delay)
        return False

    def _ensure(self) -> Any:
        if self._ftp is None:
            if not self.connect():
                raise ConnectionError("FTP: could not (re)connect")
        return self._ftp

    def _mkdirs_and_enter(self, ftp: Any, path: str) -> None:
        """cd into ``path`` from the login root, creating segments as
        needed. One segment at a time, each cwd/mkd relative to the
        directory just entered — cumulative relative paths (as in the
        reference, utils/ftp.py:64-71) resolve wrongly once the first
        cwd succeeds.

        Always rewinds to the root first: the session's cwd persists
        across ``upload_bytes`` calls, so entering ``remote_dir``
        relative to wherever the last upload left us would nest
        ``remote_dir/remote_dir/...`` on every subsequent upload.
        """
        ftp.cwd("/")
        for part in path.strip("/").split("/"):
            if not part:
                continue
            try:
                ftp.cwd(part)
            except Exception:
                ftp.mkd(part)
                ftp.cwd(part)

    def upload_bytes(self, file_bytes: bytes, file_name: str) -> None:
        """Upload into remote_dir, creating it if needed. On a failed
        transfer the cached session is dropped and one reconnect+retry
        is attempted (lost-session recovery); the second failure
        propagates."""
        for attempt in (1, 2):
            ftp = self._ensure()
            try:
                self._mkdirs_and_enter(ftp, self.remote_dir)
                ftp.storbinary(f"STOR {file_name}", io.BytesIO(file_bytes))
                return
            except Exception:
                # drop the (possibly dead) session; retry once fresh
                try:
                    ftp.quit()
                except Exception:
                    pass
                self._ftp = None
                if attempt == 2:
                    raise

    def close(self) -> None:
        if self._ftp is not None:
            self._ftp.quit()
            self._ftp = None

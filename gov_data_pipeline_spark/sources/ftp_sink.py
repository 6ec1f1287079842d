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

    def _mkdirs(self, ftp: Any, path: str) -> None:
        current = ""
        for part in path.strip("/").split("/"):
            current = f"{current}/{part}" if current else part
            try:
                ftp.cwd(current)
            except Exception:
                ftp.mkd(current)
                ftp.cwd(current)

    def upload_bytes(self, file_bytes: bytes, file_name: str) -> None:
        ftp = self._ensure()
        remote_path = f"{self.remote_dir.rstrip('/')}/{file_name}"
        self._mkdirs(ftp, self.remote_dir)
        ftp.storbinary(f"STOR {remote_path}", io.BytesIO(file_bytes))

    def close(self) -> None:
        if self._ftp is not None:
            self._ftp.quit()
            self._ftp = None

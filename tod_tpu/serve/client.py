"""Blocking TCP client for the path protocol (the RoboRIO side).

The reference has no client fixture (SURVEY.md §4: "The TCP protocol is testable
with any client; no fixture exists") — this one exists for tests, tooling, and
as a reference implementation of the robot-controller side.
"""

from __future__ import annotations

import socket

from tod_tpu.core.types import Path


class PathClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 8080, timeout: float = 5.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)

    def new_path(self) -> bool:
        """Send NewPath; returns True on the b"OK" ack."""
        self.sock.sendall(b"NewPath")
        return self.sock.recv(2) == b"OK"

    def get_path(self) -> Path:
        """Send GetPath; reads the full serialized Path.

        The wire format has no length prefix (src/path.rs:17-21) — the reply is
        8 bytes of timestamp plus 8 bytes per direction; we read until the
        server would block, relying on each reply being written in one piece.
        """
        self.sock.sendall(b"GetPath")
        data = self.sock.recv(8)
        while len(data) < 8:
            chunk = self.sock.recv(8 - len(data))
            if not chunk:
                raise ConnectionError("short read on GetPath header")
            data += chunk
        self.sock.settimeout(0.2)
        try:
            while True:
                chunk = self.sock.recv(65536)
                if not chunk:
                    break
                data += chunk
        except TimeoutError:
            pass
        finally:
            self.sock.settimeout(5.0)
        return Path.deserialize(data)

    def get_path_v2(self) -> Path:
        """Length-prefixed variant (server extension ``GetPth2``): exact
        framing, no read-timeout heuristics."""
        self.sock.sendall(b"GetPth2")
        hdr = self._read_exactly(4)
        n = int.from_bytes(hdr, "big")
        return Path.deserialize(self._read_exactly(n))

    def _read_exactly(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise ConnectionError("short read")
            data += chunk
        return data

    def close(self) -> None:
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

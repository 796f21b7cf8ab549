"""Adversarial-input robustness: the externally-reachable parsers.

The path server listens on a socket a robot LAN can reach, and `.todx`
artifacts are files a deployment copies around — both must fail CLEANLY on
malformed input (drop/raise), never hang, crash, or silently misparse.
The reference's only behavior here was "log RequestError and drop"
(src/path.rs:173-176); this gates the same property systematically.
"""

import io
import socket
import struct
import time

import numpy as np
import pytest

from tod_tpu import deploy
from tod_tpu.core.config import ServerConfig
from tod_tpu.core.types import Path
from tod_tpu.serve.server import PathStore, run_in_thread, stop_thread_server


@pytest.fixture()
def server():
    store = PathStore()
    store.set(Path(created=1700000099.0, directions=[(1.0, 0.5), (2.0, -0.5)]))
    t, srv = run_in_thread(store, ServerConfig(port=0))
    yield store, srv
    stop_thread_server(srv)
    t.join(timeout=5)


class TestServerFuzz:
    def _conn(self, srv):
        return socket.create_connection(("127.0.0.1", srv.port), timeout=5)

    def test_random_garbage_commands_always_dropped(self, server):
        """Any 7 bytes that aren't a known command: connection severed, no
        reply, server stays healthy."""
        _, srv = server
        rng = np.random.default_rng(0)
        for _ in range(20):
            s = self._conn(srv)
            s.sendall(bytes(rng.integers(0, 256, 7, dtype=np.uint8)))
            assert s.recv(1024) == b""
            s.close()
        # still serving real commands afterwards
        s = self._conn(srv)
        s.sendall(b"GetPath")
        data = s.recv(4096)
        assert struct.unpack(">Q", data[:8])[0] == 1700000099
        s.close()

    def test_partial_command_then_disconnect(self, server):
        """Clients sending 1..6 bytes then vanishing never wedge the server."""
        _, srv = server
        for n in range(1, 7):
            s = self._conn(srv)
            s.sendall(b"GetPath"[:n])
            s.close()
        time.sleep(0.2)
        s = self._conn(srv)
        s.sendall(b"NewPath")
        assert s.recv(2) == b"OK"
        s.close()

    def test_slow_loris_single_bytes(self, server):
        """A command dribbled one byte at a time still parses (readexactly
        reassembles); the server does not treat the split as garbage."""
        _, srv = server
        s = self._conn(srv)
        for b in b"GetPath":
            s.sendall(bytes([b]))
            time.sleep(0.01)
        data = s.recv(4096)
        assert struct.unpack(">Q", data[:8])[0] == 1700000099
        s.close()

    def test_oversized_flood_does_not_crash(self, server):
        """A client shoving junk far past one command length: the server
        reads 7-byte frames, hits garbage, drops — no unbounded buffering."""
        _, srv = server
        s = self._conn(srv)
        try:
            s.sendall(b"NewPath" + b"\x00" * 4096)
        except OSError:
            pass  # server may sever mid-send once garbage is seen
        s.close()
        time.sleep(0.2)
        s = self._conn(srv)
        s.sendall(b"GetPath")
        assert len(s.recv(4096)) >= 8
        s.close()


class TestPathDeserializeFuzz:
    def test_random_payloads_never_crash(self):
        """Path.deserialize on random bytes: either a Path or ValueError —
        no other exception type, no hang."""
        rng = np.random.default_rng(1)
        for n in list(range(0, 24)) + [64, 1000, 4096]:
            buf = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                p = Path.deserialize(buf)
                assert isinstance(p.directions, list)
            except ValueError:
                pass

    def test_roundtrip_random_paths(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            dirs = [
                (float(rng.normal()), float(rng.normal()))
                for _ in range(int(rng.integers(0, 50)))
            ]
            p = Path(created=float(rng.integers(1, 2**31)), directions=dirs)
            q = Path.deserialize(p.serialize())
            assert int(q.created) == int(p.created)
            np.testing.assert_allclose(
                np.asarray(q.directions, np.float32).reshape(-1, 2) if q.directions else np.zeros((0, 2)),
                np.asarray(dirs, np.float32).reshape(-1, 2) if dirs else np.zeros((0, 2)),
                rtol=1e-6,
            )


class TestArtifactHeaderFuzz:
    def test_bad_magic_variants_rejected(self, tmp_path):
        for junk in (b"", b"TODX", b"TODX2\n", b"\x00" * 32):
            p = tmp_path / "junk.todx"
            p.write_bytes(junk)
            with pytest.raises(ValueError, match="not a TODX artifact"):
                deploy.read_meta(str(p))

    def test_truncated_or_corrupt_header_raises_cleanly(self, tmp_path):
        rng = np.random.default_rng(3)
        for i in range(10):
            p = tmp_path / f"c{i}.todx"
            # plausible magic + absurd length or garbage JSON
            hlen = int(rng.integers(0, 1 << 20))
            body = bytes(rng.integers(0, 256, int(rng.integers(0, 64)), dtype=np.uint8))
            p.write_bytes(b"TODX1\n" + struct.pack("<Q", hlen) + body)
            with pytest.raises((ValueError, EOFError, MemoryError, Exception)):
                deploy.read_meta(str(p))

    def test_header_length_is_bounded_reads(self, tmp_path):
        """A header length of 2^60 must not attempt a 2^60-byte read that
        dies on allocation — read_meta should fail fast."""
        p = tmp_path / "huge.todx"
        p.write_bytes(b"TODX1\n" + struct.pack("<Q", 1 << 60) + b"{}")
        t0 = time.monotonic()
        with pytest.raises(Exception):
            deploy.read_meta(str(p))
        assert time.monotonic() - t0 < 5.0

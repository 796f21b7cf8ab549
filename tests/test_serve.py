"""TCP protocol tests: byte-exactness of the NewPath/GetPath wire format
(SURVEY.md §4: loopback test incl. the 7-byte read and BE serialization)."""

import socket
import struct
import time

import pytest

from tod_tpu.core.config import ServerConfig
from tod_tpu.core.types import Path
from tod_tpu.serve.client import PathClient
from tod_tpu.serve.server import PathStore, run_in_thread, stop_thread_server


@pytest.fixture()
def server():
    store = PathStore()
    # port 0 → ephemeral, avoids collisions with the reference's literal 8080
    t, srv = run_in_thread(store, ServerConfig(port=0))
    yield store, srv
    stop_thread_server(srv)
    t.join(timeout=5)


class TestWireFormat:
    def test_serialize_layout(self):
        p = Path(created=1700000000.7, directions=[(1.5, 0.25), (2.0, -1.0)])
        raw = p.serialize()
        assert raw[:8] == struct.pack(">Q", 1700000000)
        assert raw[8:16] == struct.pack(">ff", 1.5, 0.25)
        assert raw[16:24] == struct.pack(">ff", 2.0, -1.0)
        back = Path.deserialize(raw)
        assert back.created == 1700000000.0
        assert back.directions == [(1.5, 0.25), (2.0, -1.0)]

    def test_malformed_payload_rejected(self):
        with pytest.raises(ValueError):
            Path.deserialize(b"\x00" * 13)


class TestServer:
    def test_getpath_roundtrip(self, server):
        store, srv = server
        store.set(Path(created=1700000001.0, directions=[(3.0, 0.5)]))
        with PathClient(port=srv.port) as c:
            p = c.get_path()
        assert p.created == 1700000001.0
        assert p.directions == [(3.0, 0.5)]

    def test_newpath_resets_and_acks(self, server):
        store, srv = server
        store.set(Path(created=1.0, directions=[(9.0, 9.0)]))
        with PathClient(port=srv.port) as c:
            assert c.new_path()
        assert store.get().directions == []
        assert store.get().created > 1.0

    def test_raw_bytes_exact(self, server):
        store, srv = server
        store.set(Path(created=1700000002.0, directions=[(1.0, 2.0)]))
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"GetPath")
        time.sleep(0.1)
        data = s.recv(1024)
        assert data == struct.pack(">Q", 1700000002) + struct.pack(">ff", 1.0, 2.0)
        s.close()

    def test_unknown_command_drops_connection(self, server):
        _, srv = server
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"BadCmd!")
        time.sleep(0.1)
        assert s.recv(16) == b""  # server closed it
        s.close()

    def test_pipelined_commands_one_connection(self, server):
        store, srv = server
        store.set(Path(created=1700000003.0, directions=[]))
        with PathClient(port=srv.port) as c:
            p1 = c.get_path()
            assert c.new_path()
            p2 = c.get_path()
        assert p1.created == 1700000003.0
        assert p2.created >= time.time() - 60

    def test_concurrent_connections(self, server):
        store, srv = server
        store.set(Path(created=1700000004.0, directions=[(1.0, 0.0)]))
        clients = [PathClient(port=srv.port) for _ in range(5)]
        try:
            for c in clients:
                assert c.get_path().created == 1700000004.0
        finally:
            for c in clients:
                c.close()

    def test_getstat_metrics(self):
        store = PathStore()
        store.set(
            Path(created=time.time() - 3.0, directions=[(1.0, 0.0)], truncated=True)
        )
        t, srv = run_in_thread(
            store, ServerConfig(port=0), stats_fn=lambda: {"fps": 42.0}
        )
        try:
            with PathClient(port=srv.port) as c:
                c.get_path()
                stats = c.get_stats()
            assert stats["requests"]["GetPath"] == 1
            assert stats["requests"]["GetStat"] == 1
            assert stats["path_len"] == 1
            assert stats["path_truncated"] is True  # step-cap flag on the wire
            assert 2.0 < stats["path_age_s"] < 60.0
            assert stats["pipeline"] == {"fps": 42.0}
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_getstat_survives_broken_stats_fn(self):
        store = PathStore()

        def boom():
            raise ValueError("meter exploded")

        t, srv = run_in_thread(store, ServerConfig(port=0), stats_fn=boom)
        try:
            with PathClient(port=srv.port) as c:
                stats = c.get_stats()
                assert "pipeline_error" in stats
                # server still serves the path protocol afterwards
                assert c.get_path().directions == []
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_reconnect_after_server_restart(self, server):
        # robot-side recovery: the vision process restarts mid-match and the
        # polling client must ride it out (retries>0 → reconnect + retry)
        store, srv = server
        store.set(Path(created=1700000006.0, directions=[(1.0, 0.0)]))
        port = srv.port
        c = PathClient(port=port, retries=3, backoff=0.05)
        assert c.get_path().created == 1700000006.0
        stop_thread_server(srv)
        time.sleep(0.1)
        store2 = PathStore()
        store2.set(Path(created=1700000007.0, directions=[(2.0, 0.5)]))
        t2, srv2 = run_in_thread(store2, ServerConfig(port=port))
        try:
            p = c.get_path_v2()  # old socket is dead → reconnect kicks in
            assert p.created == 1700000007.0
            assert p.directions == [(2.0, 0.5)]
        finally:
            c.close()
            stop_thread_server(srv2)
            t2.join(timeout=5)

    def test_connect_backoff_initially_down(self):
        # grab an ephemeral port, leave it closed, start the server shortly
        # after the client begins its connect-retry loop
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        store = PathStore()
        store.set(Path(created=1700000008.0, directions=[]))
        import threading

        holder = {}

        def start_late():
            time.sleep(0.3)
            holder["t"], holder["srv"] = run_in_thread(store, ServerConfig(port=port))

        threading.Thread(target=start_late, daemon=True).start()
        c = PathClient(port=port, retries=8, backoff=0.1)
        try:
            assert c.get_path().created == 1700000008.0
        finally:
            c.close()
            if "srv" in holder:
                stop_thread_server(holder["srv"])
                holder["t"].join(timeout=5)

    def test_failfast_without_retries(self):
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()
        with pytest.raises(OSError):
            PathClient(port=port)  # retries=0 → old fail-fast behavior

    def test_v2_length_prefixed(self, server):
        store, srv = server
        store.set(Path(created=1700000005.0, directions=[(1.0, 2.0), (3.0, 4.0)]))
        with PathClient(port=srv.port) as c:
            p = c.get_path_v2()
        assert p.created == 1700000005.0
        assert p.directions == [(1.0, 2.0), (3.0, 4.0)]
        # raw framing: u32 BE length then payload
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"GetPth2")
        time.sleep(0.1)
        data = s.recv(1024)
        n = int.from_bytes(data[:4], "big")
        assert n == 8 + 2 * 8 and len(data) == 4 + n
        s.close()


def _make_self_signed(tmp_path, cn="tod-vision-host"):
    """Self-signed cert/key pair for TLS tests (cryptography lib)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]), critical=False
        )
        .sign(key, hashes.SHA256())
    )
    cert_p = tmp_path / f"{cn}.pem"
    key_p = tmp_path / f"{cn}.key"
    cert_p.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_p.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_p), str(key_p)


class TestHardening:
    """Opt-in auth + TLS (ServerConfig hardening knobs — extensions beyond
    the reference, which trusted the robot LAN; docs/roadmap 'serving
    hardening')."""

    def test_auth_happy_path(self):
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0, auth_token="s3cret"))
        try:
            store.set(Path(created=1700000011.0, directions=[(1.0, 0.0)]))
            with PathClient(port=srv.port, auth_token="s3cret") as c:
                p = c.get_path()
                assert p.created == 1700000011.0
                assert c.new_path()
            assert srv.counters["AuthTok"] == 1
            assert srv.counters["unauthorized"] == 0
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_auth_rejects_wrong_token_and_unauthenticated(self):
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0, auth_token="s3cret"))
        try:
            # wrong token → connection dropped at the handshake
            with pytest.raises(OSError):
                PathClient(port=srv.port, auth_token="wrong")
            # no handshake at all → first command drops the connection
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            s.sendall(b"GetPath")
            assert s.recv(1024) == b""  # server severed it, no reply
            s.close()
            assert srv.counters["unauthorized"] == 2
            assert srv.counters["GetPath"] == 0
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_auth_oversized_token_dropped(self):
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0, auth_token="s3cret"))
        try:
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            s.sendall(b"AuthTok" + (1 << 20).to_bytes(4, "big"))
            assert s.recv(1024) == b""  # dropped before reading 1 MiB
            s.close()
            assert srv.counters["unauthorized"] == 1
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_wrong_token_fails_fast_despite_retries(self):
        """Auth rejection is deterministic misconfiguration, not transport
        flapping: a client built with retries must NOT spin reconnect/backoff
        cycles (each would inflate the server's unauthorized counter)."""
        from tod_tpu.serve.client import AuthError

        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0, auth_token="s3cret"))
        try:
            t0 = time.monotonic()
            with pytest.raises(AuthError):
                PathClient(port=srv.port, auth_token="wrong", retries=4, backoff=0.3)
            assert time.monotonic() - t0 < 1.0  # no backoff sleeps happened
            assert srv.counters["unauthorized"] == 1  # exactly one attempt
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_half_handshake_disconnect_is_quiet(self):
        """A client vanishing mid-AuthTok (port scanner) must not raise an
        unhandled exception in the connection task."""
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0, auth_token="s3cret"))
        try:
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
            s.sendall(b"AuthTok")  # then vanish before the length prefix
            s.close()
            time.sleep(0.3)
            # server still healthy: a proper handshake works afterwards
            with PathClient(port=srv.port, auth_token="s3cret") as c:
                assert c.new_path()
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_failed_server_start_raises(self):
        """run_in_thread must surface a startup failure (port already bound)
        instead of returning a dead server discovered later via unrelated
        connection-refused errors."""
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0))
        try:
            with pytest.raises(RuntimeError, match="failed to start"):
                run_in_thread(store, ServerConfig(port=srv.port))
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_auth_client_against_no_auth_server(self):
        """Rolling hardening rollout: clients get their token configured
        before the server does.  A no-auth server must accept the AuthTok
        handshake as a no-op (reply OK) — not drop the connection."""
        store = PathStore()
        t, srv = run_in_thread(store, ServerConfig(port=0))  # auth OFF
        try:
            store.set(Path(created=1700000013.0, directions=[(2.0, 0.5)]))
            with PathClient(port=srv.port, auth_token="s3cret") as c:
                p = c.get_path()
                assert p.created == 1700000013.0
                assert c.new_path()
            assert srv.counters["unauthorized"] == 0
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_default_config_keeps_wire_parity(self, server):
        """auth off (the default) → the raw 7-byte protocol is untouched."""
        store, srv = server
        store.set(Path(created=1700000012.0, directions=[]))
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(b"GetPath")
        data = s.recv(1024)
        assert struct.unpack(">Q", data[:8])[0] == 1700000012
        s.close()

    def test_tls_roundtrip_and_plaintext_rejected(self, tmp_path):
        cert, key = _make_self_signed(tmp_path)
        store = PathStore()
        t, srv = run_in_thread(
            store, ServerConfig(port=0, tls_cert=cert, tls_key=key)
        )
        try:
            store.set(Path(created=1700000013.0, directions=[(2.0, 0.5)]))
            with PathClient(port=srv.port, tls_ca=cert) as c:
                p = c.get_path_v2()
            assert p.created == 1700000013.0
            assert p.directions == [(2.0, 0.5)]
            # a plaintext client can't speak to a TLS endpoint
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
            s.sendall(b"GetPath")
            s.settimeout(2)
            try:
                got = s.recv(1024)
            except TimeoutError:
                got = b""
            # whatever comes back, it is a TLS alert/close — never a path
            assert not got[:8] == struct.pack(">Q", 1700000013)
            s.close()
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

    def test_tls_plus_auth_compose(self, tmp_path):
        cert, key = _make_self_signed(tmp_path, cn="composed")
        store = PathStore()
        t, srv = run_in_thread(
            store,
            ServerConfig(port=0, tls_cert=cert, tls_key=key, auth_token="tok"),
        )
        try:
            store.set(Path(created=1700000014.0, directions=[]))
            with PathClient(port=srv.port, tls_ca=cert, auth_token="tok") as c:
                assert c.get_path().created == 1700000014.0
                assert c.get_stats()["requests"]["AuthTok"] == 1
        finally:
            stop_thread_server(srv)
            t.join(timeout=5)

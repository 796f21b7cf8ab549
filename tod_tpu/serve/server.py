"""TCP path server: byte-compatible NewPath/GetPath control plane.

Replaces ``handle_path_request`` (src/path.rs:132-180) with asyncio.  Wire
protocol, unchanged:

- client sends exactly 7 ASCII bytes: ``b"NewPath"`` or ``b"GetPath"``
- ``NewPath`` → server resets the stored path to empty (stamped now) and
  replies ``b"OK"`` (src/path.rs:153-166)
- ``GetPath`` → server replies the serialized path: 8-byte big-endian unix
  seconds then two big-endian f32s per direction (src/path.rs:17-21,167-172)
- anything else → logged, connection dropped (src/path.rs:173-176)

Connections are served concurrently (one task per connection, the tokio
``spawn`` analog); multiple commands may be pipelined on one connection.
"""

from __future__ import annotations

import asyncio
import json
import logging
import threading
import time

from tod_tpu.core.config import ServerConfig
from tod_tpu.core.types import Path

log = logging.getLogger(__name__)


class PathStore:
    """Thread-safe holder of the current Path (the Arc<Mutex<Path>> analog,
    src/main.rs:47-54).  The planner thread swaps in new paths; the server
    reads them."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._path = Path(created=time.time(), directions=[])

    def get(self) -> Path:
        with self._lock:
            return self._path

    def set(self, path: Path) -> None:
        with self._lock:
            self._path = path

    def reset(self) -> Path:
        fresh = Path(created=time.time(), directions=[])
        self.set(fresh)
        return fresh


class PathServer:
    """``stats_fn`` (optional) supplies live pipeline metrics merged into the
    ``GetStat`` reply (e.g. the Engine's FPS meter / stage timers)."""

    def __init__(
        self,
        store: PathStore,
        cfg: ServerConfig | None = None,
        stats_fn=None,
        stream_stores: "list[PathStore] | None" = None,
    ) -> None:
        self.store = store
        # multi-stream serving (runtime/multistream.py): one store per camera
        # stream, addressed over the wire by the GetPthN/NewPthN commands.
        # The legacy single-store commands keep serving ``store`` (by
        # convention stream 0 when the caller passes stream_stores[0] here).
        self.stream_stores = stream_stores
        self.cfg = cfg or ServerConfig()
        self.stats_fn = stats_fn
        self._started = time.time()
        self.counters = {
            "NewPath": 0, "GetPath": 0, "GetPth2": 0, "GetStat": 0,
            "GetPthN": 0, "NewPthN": 0,
            "AuthTok": 0, "unauthorized": 0, "errors": 0,
        }
        self._server: asyncio.AbstractServer | None = None
        # live connections, so stop() can actually sever them — otherwise a
        # "stopped" server keeps answering pipelined clients stuck in
        # readexactly() and wait_closed() never completes
        self._writers: set[asyncio.StreamWriter] = set()

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        peer = writer.get_extra_info("peername")
        self._writers.add(writer)
        authed = self.cfg.auth_token is None  # auth off → every conn trusted
        try:
            while True:
                try:
                    buf = await reader.readexactly(7)
                except asyncio.IncompleteReadError:
                    return  # socket closed (the Ok(0) branch, src/path.rs:144)
                if buf == b"AuthTok":
                    # hardening extension: u32-BE length + token bytes; must
                    # precede any command when ServerConfig.auth_token is set
                    self.counters["AuthTok"] += 1
                    try:
                        n = int.from_bytes(await reader.readexactly(4), "big")
                        if n > 1024:
                            self.counters["unauthorized"] += 1
                            log.error(
                                "AuthTok length %d exceeds bound; dropping %s", n, peer
                            )
                            return
                        token = await reader.readexactly(n)
                    except asyncio.IncompleteReadError:
                        # client (or port scanner) vanished mid-handshake —
                        # drop quietly, same as a closed socket on a command
                        return
                    import hmac

                    if self.cfg.auth_token is None:
                        # auth off: accept the handshake as a no-op so clients
                        # configured with a token interoperate with a server
                        # that trusts every connection anyway (rolling
                        # hardening rollouts configure clients first)
                        writer.write(b"OK")
                        await writer.drain()
                    elif hmac.compare_digest(token, self.cfg.auth_token.encode()):
                        authed = True
                        writer.write(b"OK")
                        await writer.drain()
                    else:
                        self.counters["unauthorized"] += 1
                        log.error("bad auth token from %s; dropping", peer)
                        return
                elif not authed:
                    self.counters["unauthorized"] += 1
                    log.error("unauthenticated %r from %s; dropping", buf, peer)
                    return
                elif buf == b"NewPath":
                    self.counters["NewPath"] += 1
                    self.store.reset()
                    writer.write(b"OK")
                    await writer.drain()
                elif buf == b"GetPath":
                    self.counters["GetPath"] += 1
                    writer.write(self.store.get().serialize())
                    await writer.drain()
                elif buf == b"GetPth2":
                    # v2 extension (not in the reference): same payload,
                    # prefixed with a u32 BE byte length so clients can frame
                    # replies without read-timeout heuristics
                    self.counters["GetPth2"] += 1
                    payload = self.store.get().serialize()
                    writer.write(len(payload).to_bytes(4, "big") + payload)
                    await writer.drain()
                elif buf in (b"GetPthN", b"NewPthN"):
                    # multi-stream extension: 7-byte command + u32 BE stream
                    # index.  GetPthN → length-prefixed serialized path of
                    # that stream (GetPth2 framing); NewPthN → reset that
                    # stream's path, reply OK.  Out-of-range / no multi-stream
                    # registry → RequestError semantics (log + drop), matching
                    # the reference's unknown-command policy (src/path.rs:173-176).
                    cmd = buf.decode()
                    try:
                        idx = int.from_bytes(await reader.readexactly(4), "big")
                    except asyncio.IncompleteReadError:
                        return
                    stores = self.stream_stores
                    if stores is None or not (0 <= idx < len(stores)):
                        self.counters["errors"] += 1
                        log.error(
                            "RequestError(%s stream %d of %s)", cmd, idx,
                            "none" if stores is None else len(stores),
                        )
                        return
                    self.counters[cmd] += 1
                    if cmd == "NewPthN":
                        stores[idx].reset()
                        writer.write(b"OK")
                    else:
                        payload = stores[idx].get().serialize()
                        writer.write(len(payload).to_bytes(4, "big") + payload)
                    await writer.drain()
                elif buf == b"GetStat":
                    # observability extension: length-prefixed JSON of server
                    # counters + path staleness + live pipeline metrics
                    self.counters["GetStat"] += 1
                    payload = json.dumps(self.stats()).encode()
                    writer.write(len(payload).to_bytes(4, "big") + payload)
                    await writer.drain()
                else:
                    self.counters["errors"] += 1
                    log.error("RequestError(%r is not a request)", buf)
                    return
        except (ConnectionResetError, BrokenPipeError) as e:
            log.error("failed to read/write socket; err = %r", e)
        finally:
            self._writers.discard(writer)
            try:
                writer.close()
                await writer.wait_closed()
            except (ConnectionResetError, BrokenPipeError, OSError):
                pass
            del peer

    def stats(self) -> dict:
        path = self.store.get()
        out = {
            "uptime_s": time.time() - self._started,
            "requests": dict(self.counters),
            "path_age_s": time.time() - path.created,
            "path_len": len(path.directions),
            # device path-walk step cap hit (PlannerConfig.max_path_steps):
            # the wire Path can't carry the flag, so it surfaces here
            "path_truncated": bool(getattr(path, "truncated", False)),
        }
        if self.stream_stores is not None:
            out["streams"] = [
                {
                    "path_age_s": time.time() - p.created,
                    "path_len": len(p.directions),
                    "path_truncated": bool(getattr(p, "truncated", False)),
                }
                for p in (s.get() for s in self.stream_stores)
            ]
        if self.stats_fn is not None:
            try:
                out["pipeline"] = self.stats_fn()
            except Exception as e:  # metrics must never take the server down
                out["pipeline_error"] = repr(e)
        return out

    def _ssl_context(self):
        """Server-side SSLContext from ServerConfig, or None (plaintext)."""
        if not self.cfg.tls_cert:
            return None
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(self.cfg.tls_cert, self.cfg.tls_key)
        if self.cfg.tls_client_ca:
            ctx.verify_mode = ssl.CERT_REQUIRED  # mutual TLS
            ctx.load_verify_locations(self.cfg.tls_client_ca)
        return ctx

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle, self.cfg.host, self.cfg.port, ssl=self._ssl_context()
        )

    @property
    def port(self) -> int:
        assert self._server is not None
        return self._server.sockets[0].getsockname()[1]

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            for w in list(self._writers):
                w.close()  # unblocks handlers parked in readexactly()
            await self._server.wait_closed()
            self._server = None


def run_in_thread(
    store: PathStore,
    cfg: ServerConfig | None = None,
    stats_fn=None,
    stream_stores: "list[PathStore] | None" = None,
):
    """Start the server on a daemon thread with its own event loop; returns
    ``(thread, server)`` or raises if the server fails to start — the runtime
    uses this so the TPU loop and the control plane stay independent (the
    reference's tokio task split, src/main.rs:56-61)."""
    server = PathServer(store, cfg, stats_fn=stats_fn, stream_stores=stream_stores)
    ready = threading.Event()
    loop_holder: dict = {}

    def _run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        loop_holder["loop"] = loop
        try:
            loop.run_until_complete(server.start())
        except BaseException as e:  # surfaced to the caller below
            loop_holder["error"] = e
            loop.close()
            return
        finally:
            ready.set()
        try:
            loop.run_forever()
        finally:
            loop.run_until_complete(server.stop())
            loop.close()

    t = threading.Thread(target=_run, daemon=True, name="tod-path-server")
    t.start()
    # a silent timeout or startup failure (port in use, bad TLS paths) must
    # not hand back a dead server the caller only discovers via unrelated
    # connection-refused errors later
    if not ready.wait(timeout=10):
        raise RuntimeError("path server did not start within 10s")
    if "error" in loop_holder:
        raise RuntimeError(
            f"path server failed to start: {loop_holder['error']!r}"
        ) from loop_holder["error"]
    server._loop = loop_holder.get("loop")  # type: ignore[attr-defined]
    return t, server


def stop_thread_server(server: PathServer) -> None:
    loop = getattr(server, "_loop", None)
    if loop is not None and not loop.is_closed():
        try:
            loop.call_soon_threadsafe(loop.stop)
        except RuntimeError:
            pass  # loop closed between the check and the call — already down

"""TCP network engine: listeners, outbound connectors, output fan-out.

Asyncio analog of the reference's epoll service registry (net_io.c:735-1120):
- output services hold a set of connected clients and broadcast writers'
  accumulated buffers with flush-by-size/interval (net_io.c:1466-1580)
- input services run a per-connection deframer feeding decoded messages
  into the application callback
- outbound connectors reconnect with exponential backoff
  (serviceConnect, net_io.c:527-691)
"""

from __future__ import annotations

import asyncio
import logging
from typing import Awaitable, Callable, Optional

log = logging.getLogger("readsb_tpu.net")


class OutputService:
    """A listen port whose clients all receive the same byte stream.

    Slow-client shedding: a client whose kernel send buffer stays above
    `max_backlog` bytes for longer than `shed_after` seconds is
    disconnected — the analog of the reference's latency-based rejection
    (net_io.c:1345-1465).  Without it one stalled TCP consumer grows the
    process's buffered output without bound.
    """

    def __init__(
        self,
        name: str,
        flush_bytes: int = 1200,
        flush_interval: float = 0.05,
        max_backlog: int = 4 * 1024 * 1024,
        shed_after: float = 15.0,
    ):
        self.name = name
        self.clients: set[asyncio.StreamWriter] = set()
        self._buf = bytearray()
        self.flush_bytes = flush_bytes
        self.flush_interval = flush_interval
        self.max_backlog = max_backlog
        self.shed_after = shed_after
        self._lagging: dict[int, float] = {}  # id(writer) -> since
        self.clients_shed = 0
        self._flusher: Optional[asyncio.Task] = None

    def send(self, data: bytes) -> None:
        if not self.clients:
            return
        self._buf += data
        if len(self._buf) >= self.flush_bytes:
            self.flush()

    def _shed(self, w, reason: str) -> None:
        import time as _t  # local to keep the hot path import-free

        self.clients.discard(w)
        self._lagging.pop(id(w), None)
        self.clients_shed += 1
        log.warning("%s: shedding client (%s)", self.name, reason)
        try:
            w.close()
        except Exception:
            pass

    def flush(self) -> None:
        if not self._buf:
            return
        data = bytes(self._buf)
        self._buf.clear()
        import time as _t

        now = _t.time()
        for w in list(self.clients):
            try:
                transport = getattr(w, "transport", None)
                backlog = transport.get_write_buffer_size() if transport else 0
                if backlog > self.max_backlog:
                    since = self._lagging.setdefault(id(w), now)
                    if now - since > self.shed_after:
                        self._shed(w, f"{backlog} bytes backlogged")
                        continue
                else:
                    self._lagging.pop(id(w), None)
                w.write(data)
            except Exception:
                self.clients.discard(w)
                self._lagging.pop(id(w), None)

    async def run_flusher(self) -> None:
        # no per-client drain(): awaiting one slow client would stall the
        # shared flusher; backlog shedding in flush() handles laggards
        while True:
            await asyncio.sleep(self.flush_interval)
            self.flush()

    async def handle_client(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self.clients.add(writer)
        peer = writer.get_extra_info("peername")
        log.info("%s: client %s connected (%d)", self.name, peer, len(self.clients))
        try:
            while True:
                data = await reader.read(4096)
                if not data:
                    break
                # ignore inbound data on pure output ports (beast command
                # bytes handled by the app when it cares)
        except Exception:
            pass
        finally:
            self.clients.discard(writer)
            try:
                writer.close()
            except Exception:
                pass


class InputService:
    """A listen port whose connections feed a deframer into a callback."""

    def __init__(self, name: str, connection_factory: Callable[[], "InputConnection"]):
        self.name = name
        self.connection_factory = connection_factory

    async def handle_client(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        conn = self.connection_factory()
        peer = writer.get_extra_info("peername")
        log.info("%s: feeder %s connected", self.name, peer)
        try:
            while True:
                data = await reader.read(65536)
                if not data:
                    break
                await conn.feed(data)
        except Exception as e:
            log.debug("%s: feeder %s error: %s", self.name, peer, e)
        finally:
            conn.close()
            try:
                writer.close()
            except Exception:
                pass


class InputConnection:
    """Base class: override feed() to parse and dispatch."""

    async def feed(self, data: bytes) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class Connector:
    """Outbound connection with reconnect/backoff (net_connector)."""

    def __init__(
        self,
        host: str,
        port: int,
        *,
        on_connect: Optional[Callable[[asyncio.StreamWriter], Awaitable[None]]] = None,
        input_factory: Optional[Callable[[], InputConnection]] = None,
        output: Optional[OutputService] = None,
        reconnect_delay: float = 30.0,
    ):
        self.host = host
        self.port = port
        self.on_connect = on_connect
        self.input_factory = input_factory
        self.output = output
        self.reconnect_delay = reconnect_delay

    async def run(self) -> None:
        backoff = 1.0
        while True:
            try:
                reader, writer = await asyncio.open_connection(self.host, self.port)
                log.info("connector %s:%d up", self.host, self.port)
                backoff = 1.0
                if self.on_connect:
                    await self.on_connect(writer)
                if self.output is not None:
                    self.output.clients.add(writer)
                conn = self.input_factory() if self.input_factory else None
                try:
                    while True:
                        data = await reader.read(65536)
                        if not data:
                            break
                        if conn:
                            await conn.feed(data)
                finally:
                    if self.output is not None:
                        self.output.clients.discard(writer)
                    if conn:
                        conn.close()
                    writer.close()
            except OSError as e:
                log.debug("connector %s:%d: %s", self.host, self.port, e)
            await asyncio.sleep(min(backoff, self.reconnect_delay))
            backoff *= 2


class NetEngine:
    def __init__(self):
        self.outputs: dict[str, OutputService] = {}
        self.servers: list[asyncio.AbstractServer] = []
        self.tasks: list[asyncio.Task] = []
        self.connectors: list[Connector] = []

    def add_output(self, name: str, **kw) -> OutputService:
        svc = self.outputs.setdefault(name, OutputService(name, **kw))
        return svc

    async def listen_output(self, svc: OutputService, port: int, host: str = "0.0.0.0"):
        server = await asyncio.start_server(svc.handle_client, host, port)
        self.servers.append(server)
        self.tasks.append(asyncio.ensure_future(svc.run_flusher()))
        log.info("%s: listening on %s:%d", svc.name, host, port)

    async def listen_input(self, svc: InputService, port: int, host: str = "0.0.0.0"):
        server = await asyncio.start_server(svc.handle_client, host, port)
        self.servers.append(server)
        log.info("%s: listening on %s:%d", svc.name, host, port)

    def add_connector(self, c: Connector) -> None:
        self.connectors.append(c)
        self.tasks.append(asyncio.ensure_future(c.run()))

    async def close(self) -> None:
        for t in self.tasks:
            t.cancel()
        for s in self.servers:
            s.close()
        # force-close lingering client connections (their read loops would
        # otherwise keep wait_closed blocked forever on py3.12)
        for svc in self.outputs.values():
            for w in list(svc.clients):
                try:
                    w.close()
                except Exception:
                    pass
            svc.clients.clear()
        for s in self.servers:
            try:
                await asyncio.wait_for(s.wait_closed(), timeout=1.0)
            except Exception:
                pass

"""UDP log input as a PySpark Python Data Source (streaming).

The reference's udplogreceiver / syslogreceiver-over-UDP
(/root/reference/receiver/... via pkg/stanza udp input) binds a datagram
socket and emits one entry per datagram. Spark has no built-in UDP
source; PySpark 4's Python Data Source API is the engine-native way to
add one: a SimpleDataSourceStreamReader runs on the DRIVER (one listener,
exactly like the collector process), hands each micro-batch the datagrams
received since the last trigger, and downstream stages (syslog parse,
enrich, route) run distributed as usual.

Delivery semantics: UDP is lossy by nature — the source is at-most-once
for datagrams the kernel drops, and exactly-once from the socket onward
WITHIN a driver process: a bounded replay buffer serves
`readBetweenOffsets` so a failed batch replays identical rows. Across a
driver restart the in-memory buffer is gone — an uncommitted batch
replays empty (data received before the crash is lost, exactly like the
collector's udp input: no acks, best-effort) and `read` resyncs its
sequence counter from the checkpointed offset so post-restart datagrams
land on fresh offsets.

Usage:
    spark.dataSource.register(UdpLogDataSource)
    df = (spark.readStream.format("udplog")
          .option("host", "127.0.0.1").option("port", "5140")
          .load())            # schema: body string, remote string
"""

from __future__ import annotations

import socket

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType(
    [StructField("body", StringType()), StructField("remote", StringType())]
)


class UdpLogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", "5140"))
        # batch collection knobs: stop draining when the socket goes idle
        # for idle_ms, or at max_batch datagrams, whichever first
        self.idle_ms = int(options.get("idle_ms", "200"))
        self.max_batch = int(options.get("max_batch", "10000"))
        self.replay_limit = int(options.get("replay_buffer", "100000"))
        self.encoding = options.get("encoding", "utf-8")
        self._sock: socket.socket | None = None
        self._replay: list[tuple[int, tuple[str, str]]] = []
        self._next_seq = 0

    def _socket(self) -> socket.socket:
        if self._sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((self.host, self.port))
            s.settimeout(self.idle_ms / 1000.0)
            self._sock = s
        return self._sock

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        # resync after a restart-from-checkpoint: a fresh reader starts at
        # seq 0, but the checkpointed offset may be far ahead — new
        # datagrams must never be assigned seqs inside the committed range
        # (they would be silently dropped as already-processed)
        if start.get("seq", 0) > self._next_seq:
            self._next_seq = start["seq"]
        sock = self._socket()
        rows: list[tuple[str, str]] = []
        while len(rows) < self.max_batch:
            try:
                data, addr = sock.recvfrom(65535)
            except socket.timeout:
                break
            body = data.decode(self.encoding, errors="replace")
            rows.append((body, f"{addr[0]}:{addr[1]}"))
        for r in rows:
            self._replay.append((self._next_seq, r))
            self._next_seq += 1
        if len(self._replay) > self.replay_limit:
            self._replay = self._replay[-self.replay_limit :]
        return iter(rows), {"seq": self._next_seq}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        return iter(r for seq, r in self._replay if lo <= seq < hi)

    def commit(self, end: dict) -> None:
        # committed datagrams can leave the replay buffer
        lo = end["seq"]
        self._replay = [(s, r) for s, r in self._replay if s >= lo]


class UdpLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "udplog"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):  # noqa: ARG002 (fixed schema)
        return UdpLogStreamReader(self.options)


def udp_syslog_source(spark, host: str = "127.0.0.1", port: int = 5140):
    """readStream over the udplog source with the shared syslog parser
    chain applied — the UDP twin of readers.syslog_socket_source."""
    from ..operators import parsers

    spark.dataSource.register(UdpLogDataSource)
    raw = (
        spark.readStream.format("udplog")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
    return parsers.syslog_parser(raw, protocol="rfc5424", parse_from="body")

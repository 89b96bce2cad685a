"""UDP syslog streaming source — the reference's actual ingress
(`main.go:29-35,38,67-88`) as a Spark 4 Python DataSource.

Register once per session, then:

    spark.dataSource.register(UdpSyslogDataSource)
    raw = (spark.readStream.format("syslog-udp")
           .option("port", "5514").load())          # schema: raw, device

Design notes (and deliberate parity with the reference):
- The socket is bound and drained on the DRIVER via
  ``SimpleDataSourceStreamReader`` — UDP is a low-volume control stream
  here exactly as in the reference (a single goroutine reads the socket,
  `main.go:78-88`); the heavy lifting (parse, store, query) happens on
  executors after the micro-batch boundary.  For high-throughput
  production ingest the documented path is a syslog→Kafka relay and
  Spark's Kafka source (SURVEY §2.1 S1).
- Datagram buffer is 40 960 bytes (`main.go:38`); per-batch drain is
  capped at 10 000 datagrams — the reference's channel capacity
  (`main.go:21,64`) — so a burst cannot produce an unbounded micro-batch.
- Between ``read()`` calls datagrams accumulate in the OS socket buffer
  (SO_RCVBUF), the analogue of the reference's buffered channel.
- Delivery is at-most-once, exactly like the reference (UDP + dropped
  batches, `lib/cacheManage.go:60-62`): ``readBetweenOffsets`` (failure
  replay) cannot re-read lost datagrams and returns nothing.
- Device is the peer address formatted ``ip:port`` — including the source
  port, faithfully mirroring Go's ``UDPAddr.String()``
  (`lib/lopParse.go:36,75`).
"""

from __future__ import annotations

import socket
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

MAX_DATAGRAM_BYTES = 40_960  # `main.go:38`
MAX_BATCH_DATAGRAMS = 10_000  # BufferLimit, `main.go:21`
DEFAULT_PORT = 514  # `main.go:29-35`


class UdpSyslogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.port = int(options.get("port", DEFAULT_PORT))
        self.host = options.get("host", "0.0.0.0")
        self.sock: socket.socket | None = None
        self.count = 0  # monotone datagram counter = offset

    def _ensure_socket(self) -> socket.socket:
        if self.sock is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            # OS buffer stands in for the reference's cap-10000 channel
            try:
                s.setsockopt(
                    socket.SOL_SOCKET, socket.SO_RCVBUF,
                    MAX_BATCH_DATAGRAMS * 1024,
                )
            except OSError:
                pass
            s.bind((self.host, self.port))
            s.setblocking(False)
            self.sock = s
        return self.sock

    def initialOffset(self) -> dict:
        return {"count": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        """Drain whatever datagrams are waiting (≤ cap), non-blocking —
        the 'whatever arrived in the trigger window' micro-batch semantics
        of the reference's 2 s ticker (`lib/cacheManage.go:24-28`)."""
        s = self._ensure_socket()
        rows: list[tuple[str, str]] = []
        while len(rows) < MAX_BATCH_DATAGRAMS:
            try:
                data, addr = s.recvfrom(MAX_DATAGRAM_BYTES)
            except BlockingIOError:
                break
            raw = data.decode("utf-8", errors="replace").rstrip("\n")
            device = f"{addr[0]}:{addr[1]}"  # UDPAddr.String() form
            rows.append((raw, device))
        self.count += len(rows)
        return iter(rows), {"count": self.count}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # UDP datagrams are gone once read: replay yields nothing.
        # At-most-once — the reference's guarantee (`lib/cacheManage.go:60-62`).
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class UdpSyslogDataSource(DataSource):
    """``spark.readStream.format("syslog-udp")`` — options: host, port."""

    @classmethod
    def name(cls) -> str:
        return "syslog-udp"

    def schema(self) -> str:
        return "raw string, device string"

    # NB: do NOT override streamReader() — the runtime probes it and falls
    # back to simpleStreamReader() only on the base PySparkNotImplementedError.
    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return UdpSyslogStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(UdpSyslogDataSource)


def udp_lines_stream(spark, host: str = "0.0.0.0", port: int = DEFAULT_PORT):
    """readStream over the UDP source with the (raw, device) contract the
    parse pipeline expects."""
    register(spark)
    return (
        spark.readStream.format("syslog-udp")
        .option("host", host)
        .option("port", str(port))
        .load()
    )

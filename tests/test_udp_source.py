"""End-to-end test of the UDP syslog DataSource: send real datagrams,
run a streaming query, assert parsed results — the Spark-native version
of the reference's `nc -u` smoke test (README.md:118-128)."""

from __future__ import annotations

import socket
import time

from syslog_handler_with_clickhouse_spark.sources.udp import udp_lines_stream
from syslog_handler_with_clickhouse_spark.streaming.ingest import parsed_stream

PORT = 15514

MESSAGES = [
    b"firewall,error,forward dropped packet",
    b"system,info router rebooted",
    b"vpn,weird,x tunnel up",
]


def test_udp_ingest_end_to_end(spark):
    stream = parsed_stream(udp_lines_stream(spark, host="127.0.0.1", port=PORT))
    q = (
        stream.writeStream.format("memory")
        .queryName("udp_logs")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for the first (empty) batch so the socket is bound
        deadline = time.time() + 60
        while q.lastProgress is None and time.time() < deadline:
            time.sleep(0.5)

        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for m in MESSAGES:
            tx.sendto(m, ("127.0.0.1", PORT))
        tx.close()

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("udp_logs").count() >= len(MESSAGES):
                break
            time.sleep(0.5)
        rows = spark.table("udp_logs").collect()
    finally:
        q.stop()

    assert len(rows) == len(MESSAGES)
    by_msg = {r.Message: r for r in rows}
    err = by_msg.get("dropped packet")
    assert err is not None and err.Severity == 3
    assert err.Categories == ["firewall", "forward"]
    weird = by_msg.get("tunnel up")
    assert weird is not None and weird.Severity == 6
    assert weird.Categories == ["vpn", "x", "weird"]
    # device is the sender's ip:port (UDPAddr.String() form)
    assert all(r.Device.startswith("127.0.0.1:") for r in rows)

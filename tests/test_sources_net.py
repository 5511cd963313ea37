"""Loopback tests for the network ingress/egress adapters
(src/sources/socket/, src/sources/http.rs, src/sources/syslog.rs,
src/sinks/socket.rs, src/sinks/http.rs). Everything runs against
real sockets on 127.0.0.1 — no mocks."""

from __future__ import annotations

import socket
import time

import pytest
from pyspark.sql import functions as F

from vector_spark.sources_net import (
    HttpListener,
    TcpListener,
    UdpListener,
    http_sink,
    socket_sink,
    syslog_tcp_source,
)

SYSLOG = (
    "<165>1 2023-10-11T22:14:15.003Z host01 appd 1234 ID47 "
    "- An application event"
)


def _send_tcp(port: int, payload: bytes) -> None:
    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        s.sendall(payload)


def test_tcp_listener_frames_per_connection(spark):
    """Two connections, octet-counted frames: one row per connection,
    framing explodes distributed, peer port rides every frame
    (tcp.rs host_key/port_key semantics)."""
    from vector_spark.sources import frame_octet_counting

    with TcpListener() as lst:
        msg_a, msg_b = "hello syslog", "second frame"
        _send_tcp(lst.port, f"{len(msg_a)} {msg_a}{len(msg_b)} {msg_b}".encode())
        _send_tcp(lst.port, b"7 conn two")  # 7 bytes: "conn tw" + "o" tail dropped
        time.sleep(0.3)
    raw = lst.to_df(spark)
    assert raw.count() == 2
    assert set(raw.columns) >= {"conn_id", "host", "port", "content", "source_type"}
    framed = frame_octet_counting(
        raw.withColumn("content", F.col("content").cast("string"))
    )
    got = {r.frame for r in framed.collect()}
    assert got == {"hello syslog", "second frame", "conn tw"}
    # every frame still carries its connection's peer address
    assert framed.filter(F.col("host") == "127.0.0.1").count() == 3


def test_tcp_listener_lands_to_dir(spark, tmp_path):
    """Landing-zone mode: one raw file per connection, the shape a
    streaming file source tails at cluster scale."""
    with TcpListener() as lst:
        _send_tcp(lst.port, b"line1\nline2\n")
        _send_tcp(lst.port, b"line3\n")
        time.sleep(0.3)
    out = str(tmp_path / "land")
    assert lst.land_to_dir(out) == 2
    df = spark.read.format("text").load(out)
    assert {r.value for r in df.collect()} == {"line1", "line2", "line3"}


def test_udp_listener_datagram_per_frame(spark):
    """mode: udp — each datagram is one frame (udp.rs decodes each
    recv buffer independently)."""
    with UdpListener() as lst:
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for m in (b"dg one", b"dg two", b"dg three"):
            c.sendto(m, ("127.0.0.1", lst.port))
        c.close()
        deadline = time.time() + 5
        while len(lst._rows) < 3 and time.time() < deadline:
            time.sleep(0.05)
    df = lst.to_df(spark)
    assert {bytes(r.frame).decode() for r in df.collect()} == {
        "dg one", "dg two", "dg three"
    }


def test_syslog_tcp_source(spark):
    """Composed syslog source: TCP + RFC6587 octet counting + RFC5424
    parse (syslog.rs)."""
    framed = f"{len(SYSLOG)} {SYSLOG}".encode()
    with TcpListener() as lst:
        _send_tcp(lst.port, framed * 2)
        _send_tcp(lst.port, framed)
        time.sleep(0.3)
    out = syslog_tcp_source(spark, lst)
    rows = out.collect()
    assert len(rows) == 3
    r = rows[0]
    assert (r.facility, r.severity) == (20, 5)  # pri 165 = 20*8 + 5
    assert r.hostname == "host01" and r.appname == "appd"
    assert r.message == "An application event"


def test_http_listener_path_and_headers(spark):
    """SimpleHttpSource semantics: strict_path 404s mismatches, the
    requested path is stamped, configured headers are captured
    (http.rs:87-101,291)."""
    import urllib.error
    import urllib.request

    with HttpListener(path="/ingest", strict_path=True,
                      headers=["X-Tenant"]) as lst:
        url = f"http://127.0.0.1:{lst.port}"
        req = urllib.request.Request(
            url + "/ingest", data=b'{"a":1}\n{"a":2}',
            headers={"X-Tenant": "acme"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
        # query strings ride along in self.path; strict matching is on
        # the path COMPONENT (http.rs:87-95 matches /ingest?x=1)
        req_q = urllib.request.Request(
            url + "/ingest?source=web", data=b'{"a":3}',
            headers={"X-Tenant": "acme"}, method="POST",
        )
        with urllib.request.urlopen(req_q, timeout=10) as resp:
            assert resp.status == 200
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                urllib.request.Request(
                    url + "/other", data=b"x", method="POST"
                ),
                timeout=10,
            )
        assert ei.value.code == 404
    df = lst.to_df(spark)
    rows = sorted(df.collect(), key=lambda r: bytes(r.content))
    assert len(rows) == 2
    assert rows[0].path == "/ingest"
    # the PATH component is stamped (warp FullPath has no query)
    assert rows[1].path == "/ingest"
    assert rows[0].headers == {"x-tenant": "acme"}
    assert bytes(rows[0].content) == b'{"a":1}\n{"a":2}'
    assert bytes(rows[1].content) == b'{"a":3}'


def test_http_sink_roundtrip(spark):
    """http sink -> http source loopback: newline-framed batches land
    intact; delivered count == input rows (EventsSent)."""
    df = spark.range(10).select(
        F.concat(F.lit('{"i":'), F.col("id"), F.lit("}")).alias("line")
    )
    with HttpListener(path="/in", strict_path=True) as lst:
        sent = http_sink(
            df, f"http://127.0.0.1:{lst.port}/in", batch_size=4
        )
        assert sent == 10
        time.sleep(0.2)
    got = lst.to_df(spark)
    bodies = b"".join(bytes(r.content) for r in got.collect())
    lines = sorted(bodies.decode().strip().split("\n"))
    assert lines == sorted('{"i":%d}' % i for i in range(10))
    # batch_size=4 over partitioned input: every request <= 4 events
    for r in got.collect():
        assert len(bytes(r.content).strip().split(b"\n")) <= 4


def test_socket_sink_roundtrip(spark):
    """socket sink -> TcpListener loopback: newline-framed writes,
    per-partition connections, delivered count exact."""
    df = spark.range(8).select(
        F.concat(F.lit("ev-"), F.col("id")).alias("line")
    ).repartition(2)
    with TcpListener() as lst:
        sent = socket_sink(df, "127.0.0.1", lst.port)
        assert sent == 8
        time.sleep(0.3)
    raw = lst.to_df(spark)
    assert raw.count() == 2  # one connection per partition
    lines = []
    for r in raw.collect():
        lines += bytes(r.content).decode().strip().split("\n")
    assert sorted(lines) == sorted(f"ev-{i}" for i in range(8))


def test_config_socket_source_front_door(spark):
    """Reference config spelling: `type = "socket"` with framing +
    decoding blocks, drained through a listener passed to
    run_config(listeners=...)."""
    from vector_spark.config import run_config

    cfg = """
[sources.in]
type = "socket"
mode = "tcp"
address = "127.0.0.1:0"
framing.method = "newline_delimited"
decoding.codec = "json"
decoding.schema = "svc string, n int"

[transforms.big]
type = "filter"
inputs = ["in"]
condition.type = "check_fields"
condition."n.gt" = 1

[sinks.out]
type = "memory"
inputs = ["big"]
"""
    with TcpListener() as lst:
        _send_tcp(
            lst.port,
            b'{"svc":"a","n":1}\n{"svc":"b","n":2}\n{"svc":"c","n":3}\n',
        )
        time.sleep(0.3)
    res = run_config(spark, cfg, listeners={"in": lst})
    rows = sorted((r.svc, r.n) for r in res["out"].collect())
    assert rows == [("b", 2), ("c", 3)]


def test_config_syslog_source_front_door(spark):
    """`type = "syslog"` = socket + octet-counting + RFC5424 parse
    (src/sources/syslog.rs), through the config front door."""
    from vector_spark.config import run_config

    cfg = """
[sources.logs]
type = "syslog"
mode = "tcp"
address = "127.0.0.1:0"

[sinks.out]
type = "memory"
inputs = ["logs"]
"""
    with TcpListener() as lst:
        _send_tcp(lst.port, f"{len(SYSLOG)} {SYSLOG}".encode())
        time.sleep(0.3)
    res = run_config(spark, cfg, listeners={"logs": lst})
    rows = res["out"].collect()
    assert len(rows) == 1
    assert rows[0].appname == "appd" and rows[0].severity == 5


def test_socket_lines_stream(spark, tmp_path):
    """Spark's native socket streaming source against a loopback line
    server (the reference's tcp + newline_delimited case, direction
    inverted: Spark connects, we listen)."""
    from vector_spark.sources_net import socket_lines_stream

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    import threading

    def _serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"alpha\nbeta\ngamma\n")
            time.sleep(2.0)  # keep open so the source reads all lines

    t = threading.Thread(target=_serve, daemon=True)
    t.start()
    stream = socket_lines_stream(spark, "127.0.0.1", port)
    name = "socket_lines_t"
    q = (
        stream.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline:
            if spark.table(name).count() >= 3:
                break
            time.sleep(0.2)
        got = {r.value for r in spark.table(name).collect()}
        assert got == {"alpha", "beta", "gamma"}
    finally:
        q.stop()
        srv.close()
        t.join(timeout=5)

"""Network ingress listeners and socket/HTTP sinks.

Reference surfaces: `src/sources/socket/{mod,tcp,udp}.rs` (byte-stream
listeners with framing + host_key/port_key peer stamping),
`src/sources/syslog.rs` (socket + RFC6587 octet-counting framing +
syslog parse), `src/sources/http.rs` (SimpleHttpSource: POST body
decode, path/strict_path routing, header capture, path_key stamping),
`src/sinks/socket.rs` and `src/sinks/http.rs` (framed encoded writes,
one connection per stream, size-batched HTTP requests).

Spark has no long-lived server role inside a job: the idiomatic
cluster shape is "listeners land to files/Kafka, Spark tails the
landing zone" (SURVEY §2.5). These adapters make that edge real and
testable instead of leaving it a documented hand-wave:

* ``TcpListener`` / ``UdpListener`` / ``HttpListener`` — bounded
  driver-side ingress that drains connections / datagrams / requests
  into either a DataFrame (one row per connection, so the framing
  decoders parallelize across connections exactly as the reference
  runs one decoder per connection) or a landing directory that a
  streaming file source tails. At cluster scale you run one listener
  per ingress node, they all land to the same directory/topic, and
  the Spark job below them never changes.
* ``socket_lines_stream`` — Spark's native ``socket`` streaming
  source for the most common `mode: tcp` + newline-framing case
  (note the inversion: Spark's source CONNECTS to a host:port while
  the reference LISTENS; the byte protocol is identical).
* ``socket_sink`` / ``http_sink`` — per-partition connections write
  framed payloads (the reference's one-connection-per-stream sink
  model); non-2xx / connection errors raise so Spark's task retry
  supplies the reference's at-least-once retry semantics. Both
  return the delivered-event count (EventsSent telemetry).
"""

from __future__ import annotations

import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "TcpListener",
    "UdpListener",
    "HttpListener",
    "socket_lines_stream",
    "socket_sink",
    "http_sink",
    "syslog_tcp_source",
]


class TcpListener:
    """Bounded `socket` source, `mode: tcp` (socket/tcp.rs): accept
    connections, read each to EOF, keep (conn_id, peer host/port,
    raw bytes). One DataFrame row per connection — downstream framing
    (frame_octet_counting / frame_character_delimited /
    frame_length_delimited) then explodes frames DISTRIBUTED, which
    is the reference's decoder-per-connection parallelism
    (tcp.rs:153-196). Peer address rides every frame via the
    host/port columns (host_key/port_key, tcp.rs:182-191)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_length: int | None = None):
        self.host, self.port = host, port
        self.max_length = max_length
        self._rows: list[tuple] = []
        self._lock = threading.Lock()
        self._threads: list[threading.Thread] = []
        self._srv: socket.socket | None = None
        self._accept_thread: threading.Thread | None = None
        self._stopping = threading.Event()

    def start(self) -> "TcpListener":
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(64)
        self.port = srv.getsockname()[1]
        self._srv = srv

        def _drain(conn: socket.socket, cid: int, peer):
            chunks = []
            with conn:
                while True:
                    b = conn.recv(65536)
                    if not b:
                        break
                    chunks.append(b)
            buf = b"".join(chunks)
            # no stream-level truncation: the reference's max_length
            # caps individual FRAMES (oversized frames are discarded
            # by the framing decoder) — cutting the connection byte
            # stream here would silently drop the rest of the
            # connection and corrupt the frame at the cut. Pass
            # self.max_length to the frame_* stage instead.
            with self._lock:
                self._rows.append((cid, peer[0], peer[1], buf))

        def _accept():
            cid = 0
            while not self._stopping.is_set():
                try:
                    conn, peer = srv.accept()
                except OSError:
                    break  # listening socket closed by stop()
                t = threading.Thread(
                    target=_drain, args=(conn, cid, peer), daemon=True
                )
                t.start()
                self._threads.append(t)
                cid += 1

        self._accept_thread = threading.Thread(target=_accept, daemon=True)
        self._accept_thread.start()
        return self

    def stop(self) -> None:
        self._stopping.set()
        if self._srv is not None:
            self._srv.close()
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5)
        for t in self._threads:
            t.join(timeout=5)

    def to_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("conn_id", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("port", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ])
        with self._lock:
            rows = list(self._rows)
        return spark.createDataFrame(rows, schema).withColumn(
            "source_type", F.lit("socket")
        )

    def land_to_dir(self, out_dir: str) -> int:
        """Landing-zone mode: one raw file per connection for a
        streaming file source to tail (the cluster-scale shape)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        with self._lock:
            rows = list(self._rows)
        for cid, _h, _p, buf in rows:
            with open(os.path.join(out_dir, f"conn-{cid:06d}.bin"), "wb") as f:
                f.write(buf)
        return len(rows)

    def __enter__(self) -> "TcpListener":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class UdpListener:
    """Bounded `socket` source, `mode: udp` (socket/udp.rs): every
    datagram is one independent frame (no framing layer; udp.rs
    decodes each recv buffer on its own), truncated at max_length."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 max_length: int = 102400):
        self.host, self.port = host, port
        self.max_length = max_length
        self._rows: list[tuple] = []
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "UdpListener":
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind((self.host, self.port))
        self.port = sock.getsockname()[1]
        self._sock = sock

        def _recv():
            i = 0
            while True:
                try:
                    buf, peer = sock.recvfrom(65536)
                except OSError:
                    break  # closed by stop()
                self._rows.append(
                    (i, peer[0], peer[1], buf[: self.max_length])
                )
                i += 1

        self._thread = threading.Thread(target=_recv, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._sock is not None:
            self._sock.close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def to_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("datagram_id", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("port", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ])
        return spark.createDataFrame(list(self._rows), schema).withColumn(
            "source_type", F.lit("socket")
        )

    def __enter__(self) -> "UdpListener":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class _HttpStore:
    def __init__(self):
        self.rows: list[tuple] = []
        self.lock = threading.Lock()


class HttpListener:
    """Bounded `http` source (src/sources/http.rs SimpleHttpSource):
    accept POST bodies; `path` + `strict_path` route matching (404 on
    mismatch, http.rs:87-93); requested path stamped under path_key
    (http.rs:99-101,192); configured header names captured
    (http.rs:70-74,291). Body bytes stay opaque — decode downstream
    with decode_frame, exactly like the reference's decoding.codec."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 path: str = "", strict_path: bool = True,
                 headers: list[str] | None = None):
        self.host, self.port = host, port
        self.path, self.strict_path = path, strict_path
        self.headers = [h.lower() for h in (headers or [])]
        self._store = _HttpStore()
        self._srv: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "HttpListener":
        store, cfg = self._store, self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (stdlib casing)
                # match on the PATH component only: self.path carries
                # the query string too (stdlib), while the reference's
                # warp path filter matches /ingest?source=web against
                # path=/ingest (src/sources/http.rs:85-95)
                req_path = self.path.split("?", 1)[0]
                ok = (
                    req_path == cfg.path
                    if cfg.strict_path
                    else req_path.startswith(cfg.path)
                ) or cfg.path == ""
                if not ok:
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                kept = {
                    h: self.headers.get(h) for h in cfg.headers
                    if self.headers.get(h) is not None
                }
                with store.lock:
                    # stamp the path COMPONENT (the reference's warp
                    # FullPath carries no query string), so downstream
                    # path equality filters/groupBys see '/ingest',
                    # not '/ingest?source=web'
                    store.rows.append((req_path, kept, bytes(body)))
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # silence stderr
                pass

        srv = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = srv.server_address[1]
        self._srv = srv
        self._thread = threading.Thread(
            target=srv.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def to_df(self, spark: SparkSession, path_key: str = "path") -> DataFrame:
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField(path_key, T.StringType()),
            T.StructField(
                "headers", T.MapType(T.StringType(), T.StringType())
            ),
            T.StructField("content", T.BinaryType()),
        ])
        with self._store.lock:
            rows = list(self._store.rows)
        return spark.createDataFrame(rows, schema).withColumn(
            "source_type", F.lit("http")
        )

    def __enter__(self) -> "HttpListener":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def socket_lines_stream(
    spark: SparkSession, host: str, port: int
) -> DataFrame:
    """Streaming `socket` source via Spark's built-in socket format:
    newline-framed UTF-8 lines as a `value` column. Covers the
    reference's default tcp + newline_delimited framing; for other
    framings use TcpListener + frame_* (the batch edge) or land to a
    directory and tail it."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def socket_sink(
    df: DataFrame,
    host: str,
    port: int,
    col: str = "line",
    delimiter: str = "\n",
) -> int:
    """`socket` sink, `mode: tcp` (src/sinks/socket.rs): write
    delimiter-framed encoded payloads. One connection per partition
    (the reference holds one connection per sink stream; per-task
    connections are the distributed analogue). Connection errors
    raise, so Spark's task retry supplies reconnect-and-resend.
    Returns events written (EventsSent)."""
    target = (host, port)
    delim = delimiter.encode()

    def _send(pdfs):
        import pandas as pd

        sock = socket.create_connection(target, timeout=30)
        n = 0
        with sock:
            for pdf in pdfs:
                for v in pdf[col]:
                    payload = v if isinstance(v, bytes) else str(v).encode()
                    sock.sendall(payload + delim)
                    n += 1
        yield pd.DataFrame({"sent": [n]})

    out = df.select(col).mapInPandas(_send, "sent long")
    return int(out.agg(F.sum("sent")).first()[0] or 0)


def http_sink(
    df: DataFrame,
    url: str,
    col: str = "line",
    batch_size: int = 1000,
    method: str = "POST",
    headers: dict[str, str] | None = None,
    content_type: str = "application/x-ndjson",
) -> int:
    """`http` sink (src/sinks/http.rs): newline-framed batches of up
    to batch_size events per request (BatchConfig), POSTed with the
    configured headers. A non-2xx response raises, so Spark's task
    retry is the reference's retry tower. Returns events delivered."""
    hdrs = dict(headers or {})
    hdrs.setdefault("Content-Type", content_type)

    def _post(pdfs):
        import urllib.request

        import pandas as pd

        n = 0
        buf: list[bytes] = []

        def flush():
            nonlocal n
            if not buf:
                return
            body = b"\n".join(buf) + b"\n"
            req = urllib.request.Request(
                url, data=body, method=method, headers=hdrs
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                if not (200 <= resp.status < 300):
                    raise RuntimeError(f"http sink: status {resp.status}")
            n += len(buf)
            buf.clear()

        for pdf in pdfs:
            for v in pdf[col]:
                buf.append(v if isinstance(v, bytes) else str(v).encode())
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame({"sent": [n]})

    out = df.select(col).mapInPandas(_post, "sent long")
    return int(out.agg(F.sum("sent")).first()[0] or 0)


def syslog_tcp_source(spark: SparkSession, listener: TcpListener) -> DataFrame:
    """`syslog` source, `mode: tcp` (src/sources/syslog.rs): TCP
    listener + RFC6587 octet-counting framing (with the reference's
    newline fallback for non-conforming lines) + RFC5424 parse.
    Framing/parse run distributed across connections."""
    from vector_spark.sources import frame_octet_counting, parse_syslog

    # keep content BINARY: a cast to string replaces non-UTF-8 bytes,
    # desynchronizing the RFC6587 octet counts; the framing UDF
    # handles bytes directly
    raw = listener.to_df(spark)
    framed = frame_octet_counting(raw)
    return parse_syslog(framed, line_col="frame")

"""Worked push-sink example: the reference's WebSocket broadcast tier
(api/server.js:166-193 — every connected client receives the full
latest-per-symbol snapshot after each ETL cycle) as a JSON-lines-over-
TCP server wired to ``run_ingest_stream(push_fn=...)``.

The engine side deliberately exposes delivery as a ``push_fn``
callback (SURVEY.md §2.8 scopes socket lifecycle out of the engine);
this example closes the loop a user of the reference expects: a
process that serves the live snapshot to any number of subscribers.

Run it:

    python examples/push_socket_server.py /tmp/raw_dir

then feed parquet batch files into /tmp/raw_dir and subscribe with::

    nc 127.0.0.1 8765

Every micro-batch, each subscriber receives one line::

    {"type": "latest_crypto_update", "data": [{"symbol": ..., ...}]}

— the same envelope the reference's WebSocket tier sends
(api/server.js:182).
"""

from __future__ import annotations

import json
import socket
import threading


class SnapshotBroadcastServer:
    """Minimal fan-out server: accepts TCP clients and broadcasts
    each pushed snapshot to all of them as one JSON line.  Mirrors
    the reference's ``wss.clients.forEach(... client.send(...))``
    loop (api/server.js:181-186) including its drop-on-error
    handling: a dead client is discarded, never blocks the rest.

    ``push`` is intentionally signature-compatible with the
    ``push_fn`` hook of run_ingest_stream / run_feed_stream."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen()
        self.address = self._srv.getsockname()
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._closing = False
        self._acceptor = threading.Thread(target=self._accept_loop, daemon=True)
        self._acceptor.start()

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return  # listener closed
            with self._lock:
                self._clients.append(conn)

    def push(self, rows: list) -> None:
        """Broadcast one snapshot (list of pyspark Rows) to every
        connected client; reference envelope, one JSON line."""
        payload = {
            "type": "latest_crypto_update",
            "data": [
                {**r.asDict(), "timestamp": str(r["timestamp"])} for r in rows
            ],
        }
        line = (json.dumps(payload) + "\n").encode()
        with self._lock:
            alive = []
            for c in self._clients:
                try:
                    c.sendall(line)
                    alive.append(c)
                except OSError:
                    c.close()  # dead subscriber: drop, keep broadcasting
            self._clients = alive

    def close(self) -> None:
        self._closing = True
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients = []
        self._srv.close()


def main() -> None:
    import sys

    from crypto_price_tracker_with_etl_dashboard_spark.session import get_spark
    from crypto_price_tracker_with_etl_dashboard_spark.streaming import run_ingest_stream

    raw_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crypto_raw"
    table = sys.argv[2] if len(sys.argv) > 2 else "/tmp/crypto_prices"
    ckpt = sys.argv[3] if len(sys.argv) > 3 else "/tmp/crypto_ckpt"

    server = SnapshotBroadcastServer(port=8765)
    print(f"snapshot server listening on {server.address}")
    spark = get_spark("push-sink-example")
    query = run_ingest_stream(
        spark, raw_dir, table, ckpt, push_fn=server.push, trigger_seconds=300
    )
    try:
        query.awaitTermination()
    finally:
        server.close()


if __name__ == "__main__":
    main()

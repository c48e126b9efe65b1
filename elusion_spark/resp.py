"""Minimal dependency-free Redis client (RESP2 over a TCP socket).

The Redis wire protocol is a few dozen lines of framing — redis-py adds
pooling/cluster/pubsub machinery this cache does not need.  This client
covers exactly the command surface ``ElusionRedisCache`` uses (GET,
SETEX, DEL, PING) against any standard Redis server, binary-safe in
both directions (values are Arrow IPC byte streams).

Reference parity note: features/redis.rs:1-80 likewise speaks to a
stock Redis endpoint; only the transport library differs.
"""

from __future__ import annotations

import socket


class RespError(RuntimeError):
    """Server-reported error reply (RESP '-' frame)."""


class RespClient:
    """One blocking connection, RESP2 framing.  Not thread-safe — the
    cache serializes access (driver-side, one lookup per query)."""

    def __init__(self, host: str = "localhost", port: int = 6379,
                 timeout: float = 5.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = self._sock.makefile("rb")

    # ------------------------------------------------------------ framing

    def execute(self, *args: str | bytes | int):
        """Send one command as a RESP array of bulk strings and return the
        parsed reply (bytes for bulk strings, int, None for nil;
        raises RespError on '-' replies)."""
        out = [b"*%d\r\n" % len(args)]
        for a in args:
            if isinstance(a, int):
                a = str(a).encode()
            elif isinstance(a, str):
                a = a.encode()
            out.append(b"$%d\r\n%s\r\n" % (len(a), a))
        self._sock.sendall(b"".join(out))
        return self._read_reply()

    def _read_reply(self):
        line = self._buf.readline()
        if not line:
            raise ConnectionError("redis connection closed mid-reply")
        kind, rest = line[:1], line[1:-2]
        if kind == b"+":
            return rest
        if kind == b"-":
            raise RespError(rest.decode(errors="replace"))
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n == -1:
                return None
            data = self._buf.read(n + 2)  # payload + trailing CRLF
            if len(data) != n + 2:
                raise ConnectionError("short bulk-string read")
            return data[:-2]
        if kind == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise RespError(f"unknown RESP type byte {kind!r}")

    # ----------------------------------------------------------- commands

    def ping(self) -> bool:
        return self.execute("PING") == b"PONG"

    def get(self, key: str):
        return self.execute("GET", key)

    def setex(self, key: str, ttl: int, value: bytes):
        return self.execute("SETEX", key, ttl, value)

    def delete(self, *keys: str) -> int:
        return self.execute("DEL", *keys)

    def close(self) -> None:
        try:
            self._buf.close()
        finally:
            self._sock.close()

"""Minimal dependency-free MySQL client (protocol v10, text protocol).

Backs ``from_mysql`` when no JDBC driver jar is on the classpath — the
reference ingests MySQL driver-side over one sqlx connection too
(features/mysql.rs), so a stdlib socket client is the faithful parity
move.  The DISTRIBUTED path (partitioned parallel JDBC read) still
requires the jar.

Implements: v10 handshake, ``mysql_native_password`` and the
``caching_sha2_password`` fast path (full auth needs TLS/RSA and raises
a clear error), auth-switch, COM_QUERY with text-protocol decoding of
the common column types.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import socket
import struct
from decimal import Decimal

CLIENT_CONNECT_WITH_DB = 0x8
CLIENT_PROTOCOL_41 = 0x200
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000


class MySqlError(RuntimeError):
    def __init__(self, code: int, message: str):
        self.code = code
        super().__init__(f"MySQL error {code}: {message}")


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """SHA1(pass) XOR SHA1(nonce + SHA1(SHA1(pass))) — the 4.1 auth."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    return _xor(h1, hashlib.sha1(nonce + h2).digest())


def caching_sha2_scramble(password: str, nonce: bytes) -> bytes:
    """XOR(SHA256(pass), SHA256(SHA256(SHA256(pass)) + nonce))."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    return _xor(h1, hashlib.sha256(h2 + nonce).digest())


def _lenenc(buf: bytes, off: int) -> tuple[int | None, int]:
    """Parse a length-encoded integer; returns (value, new_offset).
    0xFB encodes SQL NULL in row data (returned as None)."""
    first = buf[off]
    if first < 0xFB:
        return first, off + 1
    if first == 0xFB:
        return None, off + 1
    if first == 0xFC:
        return struct.unpack("<H", buf[off + 1:off + 3])[0], off + 3
    if first == 0xFD:
        return int.from_bytes(buf[off + 1:off + 4], "little"), off + 4
    return struct.unpack("<Q", buf[off + 1:off + 9])[0], off + 9


def _lenenc_str(buf: bytes, off: int) -> tuple[bytes | None, int]:
    n, off = _lenenc(buf, off)
    if n is None:
        return None, off
    return buf[off:off + n], off + n


class MySqlClient:
    def __init__(self, host: str, port: int = 3306, user: str = "root",
                 password: str = "", database: str | None = None,
                 timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = self._sock.makefile("rb")
        self._seq = 0
        self._user = user
        self._password = password
        self._handshake(database)

    # --------------------------------------------------------- framing

    def _read_packet(self) -> bytes:
        # a logical packet >= 16MB-1 is split: length 0xFFFFFF means a
        # continuation follows (terminated by the first shorter frame)
        payload = b""
        while True:
            head = self._buf.read(4)
            if len(head) != 4:
                raise ConnectionError("mysql connection closed mid-packet")
            ln = int.from_bytes(head[:3], "little")
            self._seq = (head[3] + 1) % 256
            part = self._buf.read(ln)
            if len(part) != ln:
                raise ConnectionError("short mysql packet read")
            payload += part
            if ln < 0xFFFFFF:
                break
        if payload[:1] == b"\xff":
            (code,) = struct.unpack("<H", payload[1:3])
            msg = payload[9:] if payload[3:4] == b"#" else payload[3:]
            raise MySqlError(code, msg.decode("utf-8", "replace"))
        return payload

    def _send_packet(self, payload: bytes) -> None:
        self._sock.sendall(len(payload).to_bytes(3, "little")
                           + bytes([self._seq]) + payload)
        self._seq = (self._seq + 1) % 256

    # ------------------------------------------------------- handshake

    def _handshake(self, database: str | None) -> None:
        greet = self._read_packet()
        if greet[0] != 10:
            raise MySqlError(0, f"unsupported protocol version {greet[0]}")
        off = 1
        off = greet.index(b"\x00", off) + 1          # server version
        off += 4                                      # thread id
        nonce = greet[off:off + 8]
        off += 8 + 1                                  # auth part1 + filler
        off += 2 + 1 + 2 + 2                          # caps lo, charset, status, caps hi
        auth_len = greet[off]
        off += 1 + 10                                 # auth len + reserved
        part2 = greet[off:off + max(13, auth_len - 8)]
        off += len(part2)
        nonce += part2.rstrip(b"\x00")[:12]           # 20-byte scramble
        plugin = greet[off:].split(b"\x00")[0].decode() or \
            "mysql_native_password"

        caps = (CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
                | CLIENT_PLUGIN_AUTH)
        if database:
            caps |= CLIENT_CONNECT_WITH_DB
        auth = self._auth_response(plugin, nonce)
        body = (struct.pack("<IIB", caps, 1 << 24, 33) + b"\x00" * 23
                + self._user.encode() + b"\x00"
                + bytes([len(auth)]) + auth
                + ((database.encode() + b"\x00") if database else b"")
                + plugin.encode() + b"\x00")
        self._send_packet(body)
        self._auth_loop(plugin, nonce)

    def _auth_response(self, plugin: str, nonce: bytes) -> bytes:
        if plugin == "mysql_native_password":
            return native_password_scramble(self._password, nonce)
        if plugin == "caching_sha2_password":
            return caching_sha2_scramble(self._password, nonce)
        raise MySqlError(0, f"unsupported auth plugin {plugin!r} "
                            "(use mysql_native_password or "
                            "caching_sha2_password)")

    def _auth_loop(self, plugin: str, nonce: bytes) -> None:
        while True:
            pkt = self._read_packet()
            if pkt[:1] == b"\x00":          # OK — authenticated
                return
            if pkt[:1] == b"\xfe":          # AuthSwitchRequest
                plugin = pkt[1:].split(b"\x00")[0].decode()
                nonce = pkt[1:].split(b"\x00", 1)[1].rstrip(b"\x00")
                self._send_packet(self._auth_response(plugin, nonce))
            elif pkt[:1] == b"\x01":        # AuthMoreData
                if pkt[1:2] == b"\x03":     # caching_sha2 fast-auth OK
                    continue                # OK packet follows
                raise MySqlError(
                    0, "caching_sha2_password full authentication "
                       "requested — needs TLS or RSA key exchange; "
                       "either connect once with a cached client, use "
                       "mysql_native_password, or add the JDBC jar")
            else:
                raise MySqlError(0, f"unexpected auth packet {pkt[:1]!r}")

    # ----------------------------------------------------------- query

    def query(self, sql: str
              ) -> tuple[list[tuple[str, int, int]], list[tuple]]:
        """COM_QUERY; returns ([(name, type_code, flags)], rows) for the
        first result set, text-protocol values decoded by column type."""
        self._seq = 0
        self._send_packet(b"\x03" + sql.encode())
        first = self._read_packet()
        if first[:1] == b"\x00":            # OK — no result set (DML)
            return [], []
        ncols, _ = _lenenc(first, 0)
        cols: list[tuple[str, int, int]] = []
        for _ in range(ncols):
            c = self._read_packet()
            off = 0
            for _ in range(4):              # catalog, schema, table, org_table
                _s, off = _lenenc_str(c, off)
            name, off = _lenenc_str(c, off)
            _orig, off = _lenenc_str(c, off)
            off += 1 + 2 + 4                # 0x0c marker, charset, length
            type_code = c[off]
            (flags,) = struct.unpack("<H", c[off + 1:off + 3])
            cols.append((name.decode(), type_code, flags))
        pkt = self._read_packet()
        if pkt[:1] == b"\xfe" and len(pkt) < 9:   # EOF after columns
            pkt = self._read_packet()
        rows: list[tuple] = []
        while not (pkt[:1] in (b"\xfe", b"\x00") and len(pkt) < 9):
            off = 0
            vals = []
            for name, type_code, flags in cols:
                raw, off = _lenenc_str(pkt, off)
                vals.append(None if raw is None
                            else _decode(raw, type_code))
            rows.append(tuple(vals))
            pkt = self._read_packet()
        return cols, rows

    def close(self) -> None:
        try:
            self._seq = 0
            self._send_packet(b"\x01")      # COM_QUIT
        except OSError:
            pass
        try:
            self._buf.close()
        finally:
            self._sock.close()


# ---------------------------------------------------------- text decoding

_INT_TYPES = {0x01, 0x02, 0x03, 0x08, 0x09}
_FLOAT_TYPES = {0x04, 0x05}
_DECIMAL_TYPES = {0x00, 0xF6}
_DATE = 0x0A
_DATETIME_TYPES = {0x07, 0x0C}
_TIME = 0x0B


def _decode(raw: bytes, type_code: int):
    text = raw.decode("utf-8", "replace")
    if type_code in _INT_TYPES:
        return int(text)
    if type_code in _FLOAT_TYPES:
        return float(text)
    if type_code in _DECIMAL_TYPES:
        # mysql.rs maps DECIMAL to f64, same as the postgres NUMERIC rule
        return float(Decimal(text))
    if type_code == _DATE:
        return _dt.date.fromisoformat(text)
    if type_code in _DATETIME_TYPES:
        return _dt.datetime.fromisoformat(text.replace(" ", "T", 1))
    return text


def spark_type_for_mysql(type_code: int, flags: int) -> str:
    if type_code in (0x01, 0x02, 0x09):
        return "int"
    if type_code == 0x03:
        return "bigint" if flags & 0x20 else "int"   # unsigned INT -> bigint
    if type_code == 0x08:
        return "bigint"
    if type_code == 0x04:
        return "float"
    if type_code == 0x05 or type_code in _DECIMAL_TYPES:
        return "double"
    if type_code == _DATE:
        return "date"
    if type_code in _DATETIME_TYPES:
        return "timestamp"
    return "string"


def parse_mysql_url(conn: str) -> dict:
    """jdbc:mysql://host:port/db?user=u&password=p and
    mysql://u:p@host:port/db both normalize to connection kwargs."""
    import re

    m = re.match(
        r"^(?:jdbc:)?mysql://"
        r"(?:(?P<user>[^:@/]+)(?::(?P<password>[^@/]*))?@)?"
        r"(?P<host>[^:/?#]+)(?::(?P<port>\d+))?"
        r"(?:/(?P<database>[^?#]*))?"
        r"(?:\?(?P<query>.*))?$", conn.strip())
    if not m:
        raise ValueError(f"unrecognized mysql connection string: {conn!r}")
    d = m.groupdict()
    params = {}
    for pair in (d.pop("query") or "").split("&"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            params[k.lower()] = v
    return {
        "host": d["host"],
        "port": int(d["port"] or params.get("port") or 3306),
        "user": d["user"] or params.get("user") or "root",
        "password": d["password"] or params.get("password") or "",
        "database": d["database"] or params.get("dbname") or None,
    }

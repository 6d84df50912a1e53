#!/usr/bin/env python3
"""Independent ClickHouse-native-protocol client, python stdlib only.

Usage: ch_wire_probe.py <port> <sql> [<sql> ...]

Implements the client half of the native TCP protocol (Hello/Ping/Query,
uncompressed Data blocks) from the wire format alone — no code shared
with the Scala server, so a passing run is evidence the server speaks
the actual ClickHouse framing rather than a self-consistent dialect
(the sandbox ships no clickhouse-client binary; driven by ChWireSpec).
Compression=0 keeps LZ4+CityHash out of scope here — the compressed
frames are separately pinned against reference golden bytes in
ChCompressionSpec.

Prints one JSON line: {"results": [{"columns": [...], "types": [...],
"rows": [[...]]} | {"error": ...}, ...]}.
"""
import json
import socket
import struct
import sys

REVISION = 54429


class Conn:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.buf = b""

    def read(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise EOFError("server closed connection")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def send(self, b):
        self.sock.sendall(b)


def wvarint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def wstr(s):
    b = s.encode("utf-8")
    return wvarint(len(b)) + b


def rvarint(conn):
    shift, val = 0, 0
    while True:
        b = conn.read(1)[0]
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val
        shift += 7


def rstr(conn):
    return conn.read(rvarint(conn)).decode("utf-8")


def hello(conn):
    conn.send(
        wvarint(0) + wstr("py-probe") + wvarint(2026) + wvarint(8)
        + wvarint(REVISION) + wstr("") + wstr("default") + wstr("")
    )
    code = rvarint(conn)
    if code != 0:
        raise ValueError(f"expected ServerHello(0), got {code}")
    name = rstr(conn)
    rvarint(conn), rvarint(conn), rvarint(conn)  # maj, min, revision
    rstr(conn)  # timezone
    rstr(conn)  # display name
    rvarint(conn)  # patch
    return name


def ping(conn):
    conn.send(wvarint(4))
    return rvarint(conn) == 4


def read_value(conn, t):
    if t.startswith("Nullable("):
        raise AssertionError("null map handled at column level")
    if t in ("Int8", "UInt8"):
        v = conn.read(1)[0]
        return v - 256 if t == "Int8" and v > 127 else v
    if t in ("Int16", "UInt16", "Date"):
        v = struct.unpack("<H", conn.read(2))[0]
        if t == "Int16" and v > 0x7FFF:
            v -= 1 << 16
        return v
    if t in ("Int32", "UInt32", "DateTime") or t.startswith("DateTime("):
        v = struct.unpack("<I", conn.read(4))[0]
        if t == "Int32" and v > 0x7FFFFFFF:
            v -= 1 << 32
        return v
    if t in ("Int64", "UInt64"):
        v = struct.unpack("<Q", conn.read(8))[0]
        if t == "Int64" and v > 0x7FFFFFFFFFFFFFFF:
            v -= 1 << 64
        return v
    if t == "Float32":
        return struct.unpack("<f", conn.read(4))[0]
    if t == "Float64":
        return struct.unpack("<d", conn.read(8))[0]
    if t == "String" or t.startswith("FixedString("):
        if t == "String":
            return conn.read(rvarint(conn)).decode("utf-8")
        n = int(t[len("FixedString("):-1])
        return conn.read(n).decode("utf-8")
    raise ValueError(f"probe does not decode type {t}")


def read_block(conn):
    rstr(conn)  # temporary table name
    # block info: (1, overflow u8), (2, bucket i32), 0 terminator
    assert rvarint(conn) == 1
    conn.read(1)
    assert rvarint(conn) == 2
    conn.read(4)
    assert rvarint(conn) == 0
    ncols, nrows = rvarint(conn), rvarint(conn)
    names, types, cols = [], [], []
    for _ in range(ncols):
        names.append(rstr(conn))
        t = rstr(conn)
        types.append(t)
        nulls = [0] * nrows
        base = t
        if t.startswith("Nullable("):
            base = t[len("Nullable("):-1]
            nulls = list(conn.read(nrows))
        vals = [read_value(conn, base) for _ in range(nrows)]
        cols.append([None if nulls[i] else vals[i] for i in range(nrows)])
    rows = [[cols[c][r] for c in range(ncols)] for r in range(nrows)]
    return names, types, rows


def query(conn, sql):
    pkt = (
        wvarint(1) + wstr("py-probe-q")
        # client info (query kind, initial user/query/address, iface,
        # os user/hostname/client name, version, proto, quota, patch)
        + wvarint(1) + wstr("") + wstr("") + wstr("")
        + wvarint(1) + wstr("probe") + wstr("localhost") + wstr("py-probe")
        + wvarint(2026) + wvarint(8) + wvarint(REVISION)
        + wstr("") + wvarint(0)
        + wstr("")      # settings terminator
        + wvarint(2)    # stage: complete
        + wvarint(0)    # compression: off
        + wstr(sql)
    )
    conn.send(pkt)
    names, types, rows = [], [], []
    while True:
        code = rvarint(conn)
        if code == 1:  # Data
            n, t, r = read_block(conn)
            if n:
                names, types = n, t
            rows.extend(r)
        elif code == 3:  # Progress
            for _ in range(5):
                rvarint(conn)
        elif code == 5:  # EndOfStream
            return {"columns": names, "types": types, "rows": rows}
        elif code == 2:  # Exception
            err = struct.unpack("<i", conn.read(4))[0]
            name = rstr(conn)
            msg = rstr(conn)
            rstr(conn)
            rvarint(conn)
            return {"error": err, "name": name, "message": msg}
        else:
            raise ValueError(f"unexpected server packet {code}")


def main():
    port = int(sys.argv[1])
    conn = Conn(port)
    hello(conn)
    if not ping(conn):
        raise ValueError("ping failed")
    print(json.dumps({"results": [query(conn, sql) for sql in sys.argv[2:]]}))


if __name__ == "__main__":
    main()

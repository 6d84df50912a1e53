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


def read_lowcardinality(conn, inner, nrows):
    """Dict-block framing: u64 keys version (=1, always), then — rows
    permitting — u64 flags (additional-keys | need-update | key width),
    u64 dict size + dict entries, u64 row count + index codes."""
    ver = struct.unpack("<Q", conn.read(8))[0]
    assert ver == 1, f"LC keys version {ver}"
    if not nrows:
        return []
    flags = struct.unpack("<Q", conn.read(8))[0]
    assert flags & 0x0200, "additional-keys flag required"
    assert not flags & 0x0100, "global dictionaries unsupported"
    width = flags & 0x0F
    assert width in (0, 1, 2, 3), f"LC key width {width}"
    nullable = inner.startswith("Nullable(")
    base = inner[len("Nullable("):-1] if nullable else inner
    ndict = struct.unpack("<Q", conn.read(8))[0]
    dictv = [read_value(conn, base) for _ in range(ndict)]
    nkeys = struct.unpack("<Q", conn.read(8))[0]
    assert nkeys == nrows, f"LC rows {nkeys} != block rows {nrows}"
    size = 1 << width
    fmt = {1: "<B", 2: "<H", 4: "<I", 8: "<Q"}[size]
    codes = [struct.unpack(fmt, conn.read(size))[0] for _ in range(nrows)]
    return [None if (nullable and c == 0) else dictv[c] for c in codes]


def encode_lowcardinality(inner, vals):
    """Inverse of read_lowcardinality, built independently from the wire
    format description."""
    out = struct.pack("<Q", 1)  # keys serialization version
    if not vals:
        return out
    nullable = inner.startswith("Nullable(")
    base = inner[len("Nullable("):-1] if nullable else inner
    dictv, index = ([None], {None: 0}) if nullable else ([], {})
    codes = []
    for v in vals:
        if v not in index:
            index[v] = len(dictv)
            dictv.append(v)
        codes.append(index[v])
    width = 0 if len(dictv) <= 256 else 1 if len(dictv) <= 65536 else 2
    out += struct.pack("<Q", 0x0200 | 0x0400 | width)
    out += struct.pack("<Q", len(dictv))
    for d in dictv:
        out += encode_value(base, "" if d is None else d)
    out += struct.pack("<Q", len(vals))
    fmt = {0: "<B", 1: "<H", 2: "<I"}[width]
    out += b"".join(struct.pack(fmt, c) for c in codes)
    return out


def encode_value(t, v):
    if t == "Int32":
        return struct.pack("<i", 0 if v is None else int(v))
    if t == "Int64":
        return struct.pack("<q", 0 if v is None else int(v))
    if t == "Float64":
        return struct.pack("<d", 0.0 if v is None else float(v))
    if t == "String":
        b = ("" if v is None else str(v)).encode("utf-8")
        return wvarint(len(b)) + b
    raise ValueError(f"probe does not encode type {t}")


def encode_column(t, vals):
    if t.startswith("LowCardinality("):
        return encode_lowcardinality(t[len("LowCardinality("):-1], vals)
    body = b""
    base = t
    if t.startswith("Nullable("):
        base = t[len("Nullable("):-1]
        body += bytes(1 if v is None else 0 for v in vals)
    return body + b"".join(encode_value(base, v) for v in vals)


def data_block_packet(names, types, rows):
    body = wvarint(1) + b"\x00" + wvarint(2) + struct.pack("<i", -1) + wvarint(0)
    body += wvarint(len(names)) + wvarint(len(rows))
    for c, (name, t) in enumerate(zip(names, types)):
        body += wstr(name) + wstr(t)
        body += encode_column(t, [r[c] for r in rows])
    return wvarint(2) + wstr("") + body  # ClientData


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
        if t.startswith("LowCardinality("):
            cols.append(read_lowcardinality(
                conn, t[len("LowCardinality("):-1], nrows))
            continue
        nulls = [0] * nrows
        base = t
        if t.startswith("Nullable("):
            base = t[len("Nullable("):-1]
            nulls = list(conn.read(nrows))
        vals = [read_value(conn, base) for _ in range(nrows)]
        cols.append([None if nulls[i] else vals[i] for i in range(nrows)])
    rows = [[cols[c][r] for c in range(ncols)] for r in range(nrows)]
    return names, types, rows


def send_query_packet(conn, sql):
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


def read_exception(conn):
    err = struct.unpack("<i", conn.read(4))[0]
    name = rstr(conn)
    msg = rstr(conn)
    rstr(conn)
    rvarint(conn)
    return {"error": err, "name": name, "message": msg}


def insert_stream(conn, sql, rows):
    """Client-streamed INSERT: query, header block, Data blocks framed per
    the header's declared types (incl. LowCardinality dict blocks), empty
    terminator, EndOfStream."""
    send_query_packet(conn, sql)
    names, types = None, None
    while names is None:
        code = rvarint(conn)
        if code == 1:  # Data: the table-structure header
            names, types, _ = read_block(conn)
        elif code == 3:  # Progress
            for _ in range(5):
                rvarint(conn)
        elif code == 2:  # Exception
            return read_exception(conn)
        else:
            raise ValueError(f"unexpected server packet {code} before header")
    conn.send(data_block_packet(names, types, rows))
    conn.send(data_block_packet(names, types, []))
    while True:
        code = rvarint(conn)
        if code == 5:  # EndOfStream
            return {"inserted": len(rows), "header_types": types}
        if code == 3:
            for _ in range(5):
                rvarint(conn)
        elif code == 2:
            return read_exception(conn)
        else:
            raise ValueError(f"unexpected server packet {code} after INSERT")


def query(conn, sql):
    # "<insert-sql> :: <json rows>" streams Data blocks instead
    if " :: " in sql:
        head, rows_json = sql.split(" :: ", 1)
        return insert_stream(conn, head, json.loads(rows_json))
    send_query_packet(conn, sql)
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

#!/usr/bin/env python3
"""Independent ClickHouse-native-protocol client, python stdlib only.

Usage: ch_wire_probe.py <port> <sql> [<sql> ...]

Implements the client half of the native TCP protocol (Hello/Ping/Query,
uncompressed Data blocks) from the wire format alone — no code shared
with the Scala server, so a passing run is evidence the server speaks
the actual ClickHouse framing rather than a self-consistent dialect
(the sandbox ships no clickhouse-client binary; driven by ChWireSpec).
With --compress, the probe speaks the LZ4+CityHash128 compressed-frame
transport in BOTH directions (pure-python CityHash 1.0.2 + LZ4 block
codec below, written from the published formats) — this drives the
server's compressed SELECT and compressed client-streamed INSERT paths
end-to-end. A "CANCEL_AFTER_FIRST :: <sql>" pseudo-statement sends a
mid-stream Cancel packet after the first Data block of a SELECT and
expects the server to cut the stream with EndOfStream (CH's Ctrl+C
contract). Without --compress, frames stay off as before (the frame
bytes themselves are also pinned against reference golden bytes in
ChCompressionSpec).

Prints one JSON line: {"results": [{"columns": [...], "types": [...],
"rows": [[...]]} | {"error": ...}, ...]}.
"""
import json
import socket
import struct
import sys

REVISION = 54429
COMPRESS = False

# ---- CityHash128 v1.0.2 (public domain algorithm; the revision the CH
# wire pinned for frame checksums) -------------------------------------
_M = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_K3 = 0xC949D7C7509E6557
_KMUL = 0x9DDFEA08EB382D69


def _rot(v, s):
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M


def _rot1(v, s):
    return ((v >> s) | (v << (64 - s))) & _M


def _smix(v):
    return v ^ (v >> 47)


def _h16(u, v):
    a = ((u ^ v) * _KMUL) & _M
    a ^= a >> 47
    b = ((v ^ a) * _KMUL) & _M
    b ^= b >> 47
    return (b * _KMUL) & _M


def _f64(s, o):
    return int.from_bytes(s[o:o + 8], "little")


def _f32(s, o):
    return int.from_bytes(s[o:o + 4], "little")


def _h0to16(s, o, n):
    if n > 8:
        a, b = _f64(s, o), _f64(s, o + n - 8)
        return _h16(a, _rot1((b + n) & _M, n)) ^ b
    if n >= 4:
        return _h16((n + (_f32(s, o) << 3)) & _M, _f32(s, o + n - 4))
    if n > 0:
        a, b, c = s[o], s[o + (n >> 1)], s[o + n - 1]
        y = (a + (b << 8)) & _M
        z = (n + (c << 2)) & _M
        return (_smix((y * _K2) & _M ^ (z * _K3) & _M) * _K2) & _M
    return _K2


def _citymurmur(s, o, n, lo, hi):
    a, b, c, d = lo, hi, 0, 0
    l = n - 16
    if l <= 0:
        a = (_smix((a * _K1) & _M) * _K1) & _M
        c = ((b * _K1) + _h0to16(s, o, n)) & _M
        d = _smix((a + (_f64(s, o) if n >= 8 else c)) & _M)
    else:
        c = _h16((_f64(s, o + n - 8) + _K1) & _M, a)
        d = _h16((b + n) & _M, (c + _f64(s, o + n - 16)) & _M)
        a = (a + d) & _M
        p = o
        while l > 0:
            a ^= (_smix((_f64(s, p) * _K1) & _M) * _K1) & _M
            a = (a * _K1) & _M
            b ^= a
            c ^= (_smix((_f64(s, p + 8) * _K1) & _M) * _K1) & _M
            c = (c * _K1) & _M
            d ^= c
            p += 16
            l -= 16
    a = _h16(a, c)
    b = _h16(d, b)
    return a ^ b, _h16(b, a)


def _weak32(w, x, y, z, a, b):
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def _weak32b(s, o, a, b):
    return _weak32(_f64(s, o), _f64(s, o + 8), _f64(s, o + 16),
                   _f64(s, o + 24), a, b)


def _city128_seed(s, o, n, lo, hi):
    if n < 128:
        return _citymurmur(s, o, n, lo, hi)
    x, y = lo, hi
    z = (n * _K1) & _M
    v1 = (_rot(y ^ _K1, 49) * _K1 + _f64(s, o)) & _M
    v2 = (_rot(v1, 42) * _K1 + _f64(s, o + 8)) & _M
    w1 = (_rot((y + z) & _M, 35) * _K1 + x) & _M
    w2 = (_rot((x + _f64(s, o + 88)) & _M, 53) * _K1) & _M
    while n >= 128:
        for _ in range(2):
            x = (_rot((x + y + v1 + _f64(s, o + 16)) & _M, 37) * _K1) & _M
            y = (_rot((y + v2 + _f64(s, o + 48)) & _M, 42) * _K1) & _M
            x ^= w2
            y ^= v1
            z = _rot(z ^ w1, 33)
            v1, v2 = _weak32b(s, o, (v2 * _K1) & _M, (x + w1) & _M)
            w1, w2 = _weak32b(s, o + 32, (z + w2) & _M, y)
            z, x = x, z
            o += 64
        n -= 128
    y = (y + _rot(w1, 37) * _K0 + z) & _M
    x = (x + _rot((v1 + z) & _M, 49) * _K0) & _M
    t = 0
    while t < n:
        t += 32
        y = (_rot((y - x) & _M, 42) * _K0 + v2) & _M
        w1 = (w1 + _f64(s, o + n - t + 16)) & _M
        x = (_rot(x, 49) * _K0 + w1) & _M
        w1 = (w1 + v1) & _M
        v1, v2 = _weak32b(s, o + n - t, v1, v2)
    x = _h16(x, v1)
    y = _h16(y, w2)
    return (_h16((x + v2) & _M, w1) + y) & _M, _h16((x + w2) & _M, (y + v2) & _M)


def cityhash128(s):
    n = len(s)
    if n >= 16:
        return _city128_seed(s, 16, n - 16, _f64(s, 0) ^ _K3, _f64(s, 8))
    if n >= 8:
        return _city128_seed(b"", 0, 0,
                             _f64(s, 0) ^ ((n * _K0) & _M),
                             _f64(s, n - 8) ^ _K1)
    return _city128_seed(s, 0, n, _K0, _K1)


# ---- LZ4 block codec (bare blocks, the CH frame payload) ---------------
def lz4_decompress(src, dsz):
    out = bytearray()
    i = 0
    while i < len(src):
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= len(src):
            break  # final literals-only sequence
        off = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - off
        for j in range(mlen):  # overlapping copies must go byte-by-byte
            out.append(out[start + j])
    assert len(out) == dsz, f"lz4: {len(out)} != declared {dsz}"
    return bytes(out)


def lz4_compress(raw):
    """A single literals-only sequence — always a valid final sequence,
    so any input encodes (as its own bytes, uncompressed-inside-LZ4)."""
    n = len(raw)
    out = bytearray([min(n, 15) << 4])
    if n >= 15:
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += raw
    return bytes(out)


def write_frame(raw):
    blk = lz4_compress(raw)
    body = bytes([0x82]) + struct.pack("<II", 9 + len(blk), len(raw)) + blk
    lo, hi = cityhash128(body)
    return struct.pack("<QQ", lo, hi) + body


def read_frame(conn):
    hdr = conn.read(16 + 9)
    lo, hi = struct.unpack("<QQ", hdr[:16])
    assert hdr[16] == 0x82, f"compression method {hdr[16]:#x}"
    csz, dsz = struct.unpack("<II", hdr[17:25])
    comp = conn.read(csz - 9)
    alo, ahi = cityhash128(hdr[16:] + comp)
    assert (alo, ahi) == (lo, hi), "server frame checksum mismatch"
    return lz4_decompress(comp, dsz)


class Buf:
    """conn-shaped reader over a decompressed frame body."""

    def __init__(self, b):
        self.b = b
        self.i = 0

    def read(self, n):
        r = self.b[self.i:self.i + n]
        self.i += n
        assert len(r) == n, "frame body underrun"
        return r


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
    if t.startswith("DateTime64("):
        # Int64 ticks at 10^-precision seconds; returned raw so the caller
        # asserts exact tick values (r17 compressed-transport canary)
        return struct.unpack("<q", conn.read(8))[0]
    raise ValueError(f"probe does not decode type {t}")


def split_args(s):
    """Split a type-parameter list on top-level commas (string-aware)."""
    out, depth, cur, instr = [], 0, "", False
    for ch in s:
        if ch == "'":
            instr = not instr
        if not instr:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append(cur.strip())
                cur = ""
                continue
        cur += ch
    if cur.strip():
        out.append(cur.strip())
    return out


def parse_enum(t):
    """Enum8('low' = 1, 'high' = 2) -> (byte width, {code: name})."""
    width = 1 if t.startswith("Enum8(") else 2
    body = t[t.index("(") + 1:-1]
    m = {}
    for part in split_args(body):
        name, val = part.rsplit("=", 1)
        m[int(val.strip())] = name.strip().strip("'")
    return width, m


def read_column(conn, t, nrows):
    """One full column of any supported type (recursive: Array offsets +
    flattened inner, Map as offsets + keys column + values column, Tuple
    as element columns in order, Enum as base ints mapped to names,
    Nullable as a null map before the base column)."""
    if t.startswith("LowCardinality("):
        return read_lowcardinality(conn, t[len("LowCardinality("):-1], nrows)
    if t.startswith("Array("):
        return read_array_column(conn, t[len("Array("):-1], nrows)
    if t.startswith("Map("):
        k, v = split_args(t[len("Map("):-1])
        offs = [struct.unpack("<Q", conn.read(8))[0] for _ in range(nrows)]
        total = offs[-1] if nrows else 0
        keys = read_column(conn, k, total)
        vals = read_column(conn, v, total)
        out, prev = [], 0
        for o in offs:
            out.append({keys[i]: vals[i] for i in range(prev, o)})
            prev = o
        return out
    if t.startswith("Tuple("):
        fields = split_args(t[len("Tuple("):-1])
        ftypes = []
        for f in fields:
            parts = f.split(None, 1)
            # named field: "x Int64" (a bare ident, no parens, then a type)
            if len(parts) == 2 and "(" not in parts[0]:
                ftypes.append(parts[1].strip())
            else:
                ftypes.append(f)
        colsf = [read_column(conn, ft, nrows) for ft in ftypes]
        return [[c[r] for c in colsf] for r in range(nrows)]
    if t.startswith("Enum8(") or t.startswith("Enum16("):
        width, m = parse_enum(t)
        fmt = "<b" if width == 1 else "<h"
        return [m[struct.unpack(fmt, conn.read(width))[0]]
                for _ in range(nrows)]
    nulls = [0] * nrows
    base = t
    if t.startswith("Nullable("):
        base = t[len("Nullable("):-1]
        nulls = list(conn.read(nrows))
    if base.startswith("Enum8(") or base.startswith("Enum16("):
        width, m = parse_enum(base)
        fmt = "<b" if width == 1 else "<h"
        vals = [struct.unpack(fmt, conn.read(width))[0] for _ in range(nrows)]
        return [None if nulls[i] else m[vals[i]] for i in range(nrows)]
    vals = [read_value(conn, base) for _ in range(nrows)]
    return [None if nulls[i] else vals[i] for i in range(nrows)]


def read_array_column(conn, inner, nrows):
    """Array(T) native framing: cumulative UInt64 offsets per row, then
    the flattened inner column (read recursively — nested arrays, maps,
    tuples and Nullable bases all route through read_column)."""
    offs = [struct.unpack("<Q", conn.read(8))[0] for _ in range(nrows)]
    total = offs[-1] if nrows else 0
    flat = read_column(conn, inner, total)
    out, prev = [], 0
    for o in offs:
        out.append(flat[prev:o])
        prev = o
    return out


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
    if COMPRESS:
        body = write_frame(body)
    return wvarint(2) + wstr("") + body  # ClientData


def read_block(conn):
    rstr(conn)  # temporary table name (always uncompressed)
    if COMPRESS:
        conn = Buf(read_frame(conn))
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
        cols.append(read_column(conn, t, nrows))
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
        + wvarint(1 if COMPRESS else 0)
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


def cancel_stream(conn, sql):
    """Mid-stream Cancel: read the first non-empty Data block of a
    streaming SELECT, send the Cancel packet, expect the server to cut
    the stream and answer EndOfStream (the Ctrl+C contract)."""
    send_query_packet(conn, sql)
    rows, blocks, sent = 0, 0, False
    while True:
        code = rvarint(conn)
        if code == 1:
            _, _, r = read_block(conn)
            rows += len(r)
            if r:
                blocks += 1
                if not sent:
                    conn.send(wvarint(3))  # Client.Cancel
                    sent = True
        elif code == 3:
            for _ in range(5):
                rvarint(conn)
        elif code == 5:
            return {"cancelled": sent, "rows_before_eos": rows,
                    "data_blocks": blocks}
        elif code == 2:
            return read_exception(conn)
        else:
            raise ValueError(f"unexpected server packet {code}")


def query(conn, sql):
    if sql.startswith("CANCEL_AFTER_FIRST :: "):
        return cancel_stream(conn, sql[len("CANCEL_AFTER_FIRST :: "):])
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
    global COMPRESS
    args = sys.argv[1:]
    if "--compress" in args:
        COMPRESS = True
        args.remove("--compress")
    port = int(args[0])
    sys.argv[1:] = args
    conn = Conn(port)
    hello(conn)
    if not ping(conn):
        raise ValueError("ping failed")
    print(json.dumps({"results": [query(conn, sql) for sql in args[1:]],
                      "compressed": COMPRESS}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Independent MySQL-text-protocol client, python stdlib only.

Usage: mysql_wire_probe.py <port> <sql> [<sql> ...]

Implements the client half of HandshakeV10/HandshakeResponse41 and
COM_QUERY text resultsets from the protocol documents alone — it shares
no code with the Scala server, so a passing run is evidence the server
speaks the actual wire format, not merely that encoder and decoder share
a bug (the sandbox has no real mysql client binary; this is the closest
independent check available, driven by MysqlWireSpec).

Prints one JSON line: {"results": [{"columns": [...], "rows": [[...]]}
| {"ok": true} | {"error": ...}, ...]}.
"""
import json
import socket
import struct
import sys
import zlib

CLIENT_COMPRESS = 0x00000020
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000

MIN_COMPRESS = 50


class Conn:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.buf = b""
        self.compress = False  # engaged after auth when CLIENT_COMPRESS
        self.cseq = 0
        self.inner = b""  # decompressed inner packet stream

    def enable_compress(self):
        self.compress = True
        self.cseq = 0
        self.inner = b""

    def read_packet(self):
        if not self.compress:
            hdr = self._read(4)
            (length,) = struct.unpack("<I", hdr[:3] + b"\x00")
            seq = hdr[3]
            return seq, self._read(length)
        while len(self.inner) < 4:
            self._read_envelope()
        (length,) = struct.unpack("<I", self.inner[:3] + b"\x00")
        seq = self.inner[3]
        while len(self.inner) < 4 + length:
            self._read_envelope()
        payload = self.inner[4:4 + length]
        self.inner = self.inner[4 + length:]
        return seq, payload

    def _read_envelope(self):
        """One compressed envelope: u24 clen, u8 seq, u24 ulen, payload
        (zlib when ulen > 0, raw when 0)."""
        h = self._read(7)
        clen = h[0] | (h[1] << 8) | (h[2] << 16)
        self.cseq = h[3] + 1
        ulen = h[4] | (h[5] << 8) | (h[6] << 16)
        payload = self._read(clen)
        if ulen:
            payload = zlib.decompress(payload)
            assert len(payload) == ulen, "bad uncompressed length"
        self.inner += payload

    def write_packet(self, seq, payload):
        pkt = struct.pack("<I", len(payload))[:3] + bytes([seq]) + payload
        if not self.compress:
            self.sock.sendall(pkt)
            return
        # a new command resets the compressed sequence (MySQL contract)
        if seq == 0:
            self.cseq = 0
        if len(pkt) >= MIN_COMPRESS:
            comp = zlib.compress(pkt)
            hdr = struct.pack("<I", len(comp))[:3] + bytes([self.cseq]) \
                + struct.pack("<I", len(pkt))[:3]
            self.sock.sendall(hdr + comp)
        else:
            hdr = struct.pack("<I", len(pkt))[:3] + bytes([self.cseq]) \
                + b"\x00\x00\x00"
            self.sock.sendall(hdr + pkt)
        self.cseq += 1

    def _read(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise EOFError("server closed connection")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def lenenc_int(b, pos):
    first = b[pos]
    if first < 0xFB:
        return first, pos + 1
    if first == 0xFC:
        return struct.unpack_from("<H", b, pos + 1)[0], pos + 3
    if first == 0xFD:
        return struct.unpack("<I", b[pos + 1:pos + 4] + b"\x00")[0], pos + 4
    if first == 0xFE:
        return struct.unpack_from("<Q", b, pos + 1)[0], pos + 9
    raise ValueError(f"bad lenenc prefix 0x{first:02x}")


def lenenc_str(b, pos):
    if b[pos] == 0xFB:  # NULL cell
        return None, pos + 1
    n, pos = lenenc_int(b, pos)
    return b[pos:pos + n].decode("utf-8"), pos + n


def is_eof(p):
    return len(p) < 9 and p[0] == 0xFE


def handshake(conn, compress=False):
    seq, greeting = conn.read_packet()
    if greeting[0] != 10:
        raise ValueError(f"unexpected protocol version {greeting[0]}")
    # server must advertise CLIENT_COMPRESS before the client may use it
    caps_lo = struct.unpack_from("<H", greeting,
                                 greeting.index(b"\x00", 1) + 1 + 4 + 9)[0]
    if compress and not (caps_lo & CLIENT_COMPRESS):
        raise ValueError("server did not advertise CLIENT_COMPRESS")
    caps = CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
    if compress:
        caps |= CLIENT_COMPRESS
    # HandshakeResponse41: caps, max packet, charset, 23 reserved,
    # user NUL, lenenc auth (empty)
    resp = (
        struct.pack("<I", caps)
        + struct.pack("<I", 1 << 24)
        + bytes([33])
        + b"\x00" * 23
        + b"probe\x00"
        + b"\x00"  # lenenc 0: empty auth response
    )
    conn.write_packet(seq + 1, resp)
    _, ok = conn.read_packet()
    if ok[0] != 0x00:
        raise ValueError(f"auth not OK: 0x{ok[0]:02x}")
    if compress:
        conn.enable_compress()


def query(conn, sql):
    conn.write_packet(0, b"\x03" + sql.encode("utf-8"))
    _, first = conn.read_packet()
    if first[0] == 0x00:
        return {"ok": True}
    if first[0] == 0xFF:
        errno = struct.unpack_from("<H", first, 1)[0]
        return {"error": errno, "message": first[9:].decode("utf-8", "replace")}
    ncols, _ = lenenc_int(first, 0)
    columns = []
    for _i in range(ncols):
        _, coldef = conn.read_packet()
        pos = 0
        fields = []
        for _j in range(5):  # catalog, schema, table, org_table, name
            s, pos = lenenc_str(coldef, pos)
            fields.append(s)
        columns.append(fields[4])
    _, eof1 = conn.read_packet()
    if not is_eof(eof1):
        raise ValueError("expected EOF after column definitions")
    rows = []
    while True:
        _, p = conn.read_packet()
        if is_eof(p):
            break
        pos, row = 0, []
        for _i in range(ncols):
            cell, pos = lenenc_str(p, pos)
            row.append(cell)
        rows.append(row)
    return {"columns": columns, "rows": rows}


MYSQL_TYPE_LONGLONG = 0x08
MYSQL_TYPE_DOUBLE = 0x05
MYSQL_TYPE_VAR_STRING = 0xFD
MYSQL_TYPE_DATE = 0x0A
MYSQL_TYPE_NULL = 0x06


def _bind(value):
    """(type, flags, payload) for one python param."""
    if value is None:
        return MYSQL_TYPE_NULL, 0, b""
    if isinstance(value, bool):
        raise TypeError("bool params not supported by the probe")
    if isinstance(value, int):
        return MYSQL_TYPE_LONGLONG, 0, struct.pack("<q", value)
    if isinstance(value, float):
        return MYSQL_TYPE_DOUBLE, 0, struct.pack("<d", value)
    if isinstance(value, tuple) and len(value) == 3:  # (y, m, d) date
        y, m, d = value
        return MYSQL_TYPE_DATE, 0, bytes([4]) + struct.pack("<H", y) + bytes([m, d])
    b = str(value).encode("utf-8")
    assert len(b) < 251
    return MYSQL_TYPE_VAR_STRING, 0, bytes([len(b)]) + b


def _read_binary_row(p, ncols, types):
    assert p[0] == 0x00, f"binary row header 0x{p[0]:02x}"
    nbm = (ncols + 7 + 2) // 8
    bitmap = p[1:1 + nbm]
    pos = 1 + nbm
    row = []
    for i in range(ncols):
        bit = i + 2
        if bitmap[bit // 8] & (1 << (bit % 8)):
            row.append(None)
            continue
        t = types[i]
        if t == 0x08:
            row.append(struct.unpack_from("<q", p, pos)[0]); pos += 8
        elif t == 0x03:
            row.append(struct.unpack_from("<i", p, pos)[0]); pos += 4
        elif t == 0x02:
            row.append(struct.unpack_from("<h", p, pos)[0]); pos += 2
        elif t == 0x01:
            row.append(struct.unpack_from("<b", p, pos)[0]); pos += 1
        elif t == 0x05:
            row.append(struct.unpack_from("<d", p, pos)[0]); pos += 8
        elif t == 0x04:
            row.append(struct.unpack_from("<f", p, pos)[0]); pos += 4
        elif t == 0x0A:
            n = p[pos]; pos += 1
            if n == 0:
                row.append("0000-00-00")
            else:
                y = struct.unpack_from("<H", p, pos)[0]
                row.append(f"{y:04d}-{p[pos+2]:02d}-{p[pos+3]:02d}")
                pos += n
        elif t == 0x0C:
            n = p[pos]; pos += 1
            y = struct.unpack_from("<H", p, pos)[0]
            mo, d = p[pos + 2], p[pos + 3]
            h = mi = s = 0
            us = 0
            if n >= 7:
                h, mi, s = p[pos + 4], p[pos + 5], p[pos + 6]
            if n >= 11:
                us = struct.unpack_from("<I", p, pos + 7)[0]
            cell = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
            row.append(cell + (f".{us:06d}" if us else ""))
            pos += n
        else:  # lenenc string (varchar, decimal, ...)
            cell, pos = lenenc_str(p, pos)
            row.append(cell)
    return row


def prepared(conn, sql, params):
    """COM_STMT_PREPARE / EXECUTE / CLOSE round trip; binary resultset."""
    conn.write_packet(0, b"\x16" + sql.encode("utf-8"))
    _, ok = conn.read_packet()
    if ok[0] == 0xFF:
        return {"error": struct.unpack_from("<H", ok, 1)[0],
                "message": ok[9:].decode("utf-8", "replace")}
    stmt_id = struct.unpack_from("<I", ok, 1)[0]
    ncols_prep = struct.unpack_from("<H", ok, 5)[0]
    nparams = struct.unpack_from("<H", ok, 7)[0]
    for _ in range(nparams):
        conn.read_packet()  # param definitions
    if nparams:
        _, eof = conn.read_packet()
        assert is_eof(eof)
    for _ in range(ncols_prep):
        conn.read_packet()
    if ncols_prep:
        _, eof = conn.read_packet()
        assert is_eof(eof)
    if nparams != len(params):
        return {"error": -1, "message": f"server counted {nparams} params"}

    def execute(send_types):
        body = b"\x17" + struct.pack("<I", stmt_id) + b"\x00" + struct.pack("<I", 1)
        if nparams:
            bitmap = bytearray((nparams + 7) // 8)
            binds = [_bind(v) for v in params]
            for i, (_t, _f, payload) in enumerate(binds):
                if params[i] is None:
                    bitmap[i // 8] |= 1 << (i % 8)
            body += bytes(bitmap)
            if send_types:
                body += b"\x01"
                for t, f, _payload in binds:
                    body += bytes([t, f])
            else:
                body += b"\x00"  # types cached server-side from execute #1
            for i, (_t, _f, payload) in enumerate(binds):
                if params[i] is not None:
                    body += payload
        conn.write_packet(0, body)

    execute(send_types=True)
    _, first = conn.read_packet()
    if first[0] == 0x00 and len(first) < 9:
        return {"ok": True}
    if first[0] == 0xFF:
        return {"error": struct.unpack_from("<H", first, 1)[0],
                "message": first[9:].decode("utf-8", "replace")}
    ncols, _ = lenenc_int(first, 0)
    columns, types = [], []
    for _i in range(ncols):
        _, coldef = conn.read_packet()
        pos = 0
        fields = []
        for _j in range(5):
            s, pos = lenenc_str(coldef, pos)
            fields.append(s)
        # name, then lenenc(0x0c), charset u16, length u32, then TYPE
        _, pos = lenenc_str(coldef, pos)  # org_name
        pos += 1 + 2 + 4  # lenenc-0x0c byte, charset, display length
        types.append(coldef[pos])
        columns.append(fields[4])
    _, eof1 = conn.read_packet()
    assert is_eof(eof1), "expected EOF after column definitions"
    rows = []
    while True:
        _, p = conn.read_packet()
        if is_eof(p):
            break
        rows.append(_read_binary_row(p, ncols, types))

    # re-execute WITHOUT re-sending types: the server must have cached
    # them from execute #1 (drivers only bind types once)
    execute(send_types=False)
    _, first2 = conn.read_packet()
    rows2 = None
    if first2[0] not in (0x00, 0xFF) or len(first2) >= 9:
        ncols2, _ = lenenc_int(first2, 0)
        for _i in range(ncols2):
            conn.read_packet()
        _, eof = conn.read_packet()
        assert is_eof(eof)
        rows2 = []
        while True:
            _, p = conn.read_packet()
            if is_eof(p):
                break
            rows2.append(_read_binary_row(p, ncols2, types))
    # COM_STMT_CLOSE (no response)
    conn.write_packet(0, b"\x19" + struct.pack("<I", stmt_id))
    return {"columns": columns, "rows": rows, "reexec_equal": rows2 == rows}


def main():
    args = sys.argv[1:]
    compress = "--compress" in args
    if compress:
        args.remove("--compress")
    port = int(args[0])
    conn = Conn(port)
    handshake(conn, compress=compress)
    if len(args) > 1 and args[1] == "--mixed":
        # ONE connection mixing text and prepared statements (r19 canary:
        # prepared + rich types over the compressed transport in one
        # session). "P:<sql>|<kind:param>..." runs prepared; anything else
        # runs as a text COM_QUERY.
        results = []
        for a in args[2:]:
            if a.startswith("P:"):
                parts = a[2:].split("|")
                params = []
                for pr in parts[1:]:
                    kind, _, v = pr.partition(":")
                    params.append(None if kind == "null" else
                                  int(v) if kind == "int" else
                                  float(v) if kind == "float" else v)
                results.append(prepared(conn, parts[0], params))
            else:
                results.append(query(conn, a))
        print(json.dumps({"results": results, "compressed": compress}))
        return
    if len(args) > 1 and args[1] == "--prepared":
        # args[2] = sql with ?s, args[3:] = params (int:/float:/str:/null)
        sql = args[2]
        params = []
        for a in args[3:]:
            kind, _, v = a.partition(":")
            params.append(None if kind == "null" else
                          int(v) if kind == "int" else
                          float(v) if kind == "float" else
                          tuple(int(x) for x in v.split("-")) if kind == "date"
                          else v)
        print(json.dumps({"results": [prepared(conn, sql, params)],
                          "compressed": compress}))
        return
    print(json.dumps({"results": [query(conn, sql) for sql in args[1:]],
                      "compressed": compress}))


if __name__ == "__main__":
    main()

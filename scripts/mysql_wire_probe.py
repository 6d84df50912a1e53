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

CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000


class Conn:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.buf = b""

    def read_packet(self):
        hdr = self._read(4)
        (length,) = struct.unpack("<I", hdr[:3] + b"\x00")
        seq = hdr[3]
        return seq, self._read(length)

    def write_packet(self, seq, payload):
        self.sock.sendall(struct.pack("<I", len(payload))[:3] + bytes([seq]) + payload)

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


def handshake(conn):
    seq, greeting = conn.read_packet()
    if greeting[0] != 10:
        raise ValueError(f"unexpected protocol version {greeting[0]}")
    # HandshakeResponse41: caps, max packet, charset, 23 reserved,
    # user NUL, lenenc auth (empty)
    resp = (
        struct.pack("<I", CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION)
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


def main():
    port = int(sys.argv[1])
    conn = Conn(port)
    handshake(conn)
    print(json.dumps({"results": [query(conn, sql) for sql in sys.argv[2:]]}))


if __name__ == "__main__":
    main()

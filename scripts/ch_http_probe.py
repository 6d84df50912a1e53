#!/usr/bin/env python3
"""Independent ClickHouse-HTTP-interface probe, python stdlib only.

Usage: ch_http_probe.py <port>

Exercises the documented HTTP surface exactly as a curl user would:
/ping, query-in-URL, query-in-body, the INSERT statement-in-URL +
payload-in-body idiom, JSON/JSONEachRow/TSV formats, and the error
shape. Prints HTTP_PROBE_OK on success (driven by ChHttpSpec).
"""
import json
import sys
import urllib.parse
import urllib.request


def call(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = body.encode() if body is not None else None
    req = urllib.request.Request(url, data=data)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def q(sql):
    return "/?query=" + urllib.parse.quote(sql)


def main():
    port = int(sys.argv[1])
    st, body = call(port, "/ping")
    assert (st, body) == (200, "Ok.\n"), (st, body)

    st, body = call(port, q("SELECT 1 AS one, 'a\\tb' AS s"))
    assert st == 200 and body == "1\ta\\tb\n", (st, repr(body))

    # INSERT: statement in URL, CSV payload in body
    call(port, q("DROP TABLE IF EXISTS http_probe_t"))
    st, _ = call(port, q("CREATE TABLE http_probe_t(a Int64, s String)"))
    assert st == 200
    st, _ = call(port, q("INSERT INTO http_probe_t FORMAT CSV"),
                 body="1,x\n2,y\n")
    assert st == 200
    st, body = call(port, "/", body="SELECT CAST(sum(a) AS BIGINT) AS s "
                                    "FROM http_probe_t FORMAT JSON")
    assert st == 200, body
    doc = json.loads(body)
    assert doc["rows"] == 1 and doc["data"][0]["s"] == 3, doc
    assert doc["meta"][0]["name"] == "s", doc

    st, body = call(port, q("SELECT a FROM http_probe_t "
                            "ORDER BY a FORMAT JSONEachRow"))
    assert st == 200 and [json.loads(l)["a"] for l in body.splitlines()] == \
        [1, 2], body

    st, body = call(port, q("SELECT broken FROM http_probe_t"))
    assert st == 500 and body.startswith("Code: "), (st, body)

    # operability headers: exact summary when buffered, timezone, query id
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/?wait_end_of_query=1&query_id=probe-7&"
        + urllib.parse.urlencode({"query":
            "SELECT a FROM http_probe_t ORDER BY a"}))
    with urllib.request.urlopen(req) as resp:
        summary = json.loads(resp.headers["X-ClickHouse-Summary"])
        assert summary["result_rows"] == "2", summary
        assert int(summary["elapsed_ns"]) > 0, summary
        assert resp.headers["X-ClickHouse-Query-Id"] == "probe-7"
        assert resp.headers["X-ClickHouse-Timezone"] == "UTC"
        assert resp.read().decode() == "1\n2\n"

    call(port, q("DROP TABLE http_probe_t"))
    print("HTTP_PROBE_OK")


if __name__ == "__main__":
    main()

package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

import org.scalatest.funsuite.AnyFunSuite

import graft.server.ChHttpServer

/** The ClickHouse HTTP interface: /ping, query-in-URL and query-in-body,
  * the INSERT big-data idiom (statement in the URL, payload in the body),
  * output formats (TSV[WithNames[AndTypes]], CSV, JSON envelope,
  * JSONEachRow, Values), the database selector, and CH-style error
  * surfaces. Driven by java.net.http here and by the independent
  * python-stdlib probe (scripts/ch_http_probe.py) below.
  */
class ChHttpSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def withServer(f: (ChHttpServer, Int) => Unit): Unit = {
    val s = new ChHttpServer(spark).start()
    try f(s, s.boundPort) finally s.stop()
  }

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, pathQ: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathQ")).GET().build(),
      BodyHandlers.ofString())

  private def post(port: Int, pathQ: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathQ"))
      .POST(BodyPublishers.ofString(body)).build(),
      BodyHandlers.ofString())

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  test("/ping and bare GET / answer Ok.") {
    withServer { (_, p) =>
      assert(get(p, "/ping").body() === "Ok.\n")
      assert(get(p, "/").body() === "Ok.\n")
    }
  }

  test("query in the URL; TSV default; WithNames/AndTypes; JSON envelope; " +
    "JSONEachRow; CSV; Values") {
    withServer { (_, p) =>
      val r = get(p, s"/?query=${enc("SELECT 1 AS a, 'x' AS b")}")
      assert(r.statusCode() === 200)
      assert(r.body() === "1\tx\n")
      assert(r.headers().firstValue("X-ClickHouse-Format").get ===
        "TabSeparated")
      assert(get(p, s"/?query=${enc(
        "SELECT 1 AS a FORMAT TSVWithNames")}").body() === "a\n1\n")
      val andTypes = get(p, s"/?query=${enc(
        "SELECT CAST(1 AS INT) AS a FORMAT TabSeparatedWithNamesAndTypes")}")
        .body()
      assert(andTypes.startsWith("a\n") && andTypes.endsWith("\n1\n"),
        andTypes)
      val json = get(p, s"/?query=${enc(
        "SELECT 2 AS n, NULL AS z FORMAT JSON")}").body()
      assert(json.contains(""""meta":"""), json)
      assert(json.contains(""""n": 2""") && json.contains(""""z": null"""))
      assert(json.contains(""""rows": 1"""), json)
      assert(get(p, s"/?query=${enc("SELECT 1 AS a, 'x,y' AS b")}" +
        "&default_format=CSV").body() === "1,\"x,y\"\n")
      assert(get(p, s"/?query=${enc(
        "SELECT 1 AS a, 'x' AS b FORMAT JSONEachRow")}").body() ===
        """{"a":1,"b":"x"}""" + "\n")
      assert(get(p, s"/?query=${enc(
        "SELECT 1 AS a, 'it''s' AS b FORMAT Values")}").body() ===
        "(1,'it''s')\n")
    }
  }

  test("X-ClickHouse-Summary / -Timezone / default_format: buffered " +
    "(wait_end_of_query=1) summaries carry exact result counters, " +
    "streamed ones the partial zeros; default_format loses to inline " +
    "FORMAT") {
    withServer { (_, p) =>
      // buffered: exact result_rows/result_bytes
      val r = get(p, "/?wait_end_of_query=1&query=" +
        enc("SELECT number FROM numbers(5)"))
      assert(r.statusCode() === 200)
      val sum = r.headers().firstValue("X-ClickHouse-Summary").get
      assert(sum.contains(""""result_rows":"5""""), sum)
      assert(sum.contains(s""""result_bytes":"${r.body().length}""""), sum)
      assert(sum.contains(""""elapsed_ns":""""), sum)
      assert(r.headers().firstValue("X-ClickHouse-Timezone").get === "UTC")
      assert(r.headers().firstValue("X-ClickHouse-Query-Id").isPresent)
      // streamed: the summary header exists with partial (zero) counters
      val s2 = get(p, "/?query=" + enc("SELECT number FROM numbers(5)"))
        .headers().firstValue("X-ClickHouse-Summary").get
      assert(s2.contains(""""result_rows":"0""""), s2)
      // an explicit query_id echoes back
      val qid = get(p, "/?query_id=my-qid-42&query=" + enc("SELECT 1"))
        .headers().firstValue("X-ClickHouse-Query-Id").get
      assert(qid === "my-qid-42")
      // default_format applies, and an inline FORMAT beats it
      val df1 = get(p, "/?default_format=JSONEachRow&query=" +
        enc("SELECT 7 AS x"))
      assert(df1.body().trim === """{"x":7}""", df1.body())
      assert(df1.headers().firstValue("X-ClickHouse-Format").get ===
        "JSONEachRow")
      val df2 = get(p, "/?default_format=JSONEachRow&query=" +
        enc("SELECT 7 AS x FORMAT CSV"))
      assert(df2.body().trim === "7", df2.body())
    }
  }

  test("query in the POST body; INSERT with URL statement + body payload " +
    "(the curl --data-binary idiom); database parameter") {
    withServer { (_, p) =>
      assert(post(p, "/", "SELECT 21 * 2 AS v").body() === "42\n")
      post(p, s"/?query=${enc("DROP TABLE IF EXISTS http_t")}", "")
      post(p, s"/?query=${enc("CREATE TABLE http_t(a Int64, s String)")}", "")
      val ins = post(p, s"/?query=${enc(
        "INSERT INTO http_t FORMAT CSV")}", "1,aa\n2,bb\n3,cc\n")
      assert(ins.statusCode() === 200, ins.body())
      assert(post(p, "/",
        "SELECT CAST(sum(a) AS BIGINT) AS s, count(*) AS n FROM http_t")
        .body() === "6\t3\n")
      // database selector
      post(p, s"/?query=${enc("CREATE DATABASE IF NOT EXISTS http_db")}", "")
      post(p, s"/?query=${enc("DROP TABLE IF EXISTS t2")}&database=http_db", "")
      post(p, s"/?query=${enc("CREATE TABLE t2(x Int64)")}&database=http_db", "")
      post(p, s"/?query=${enc("INSERT INTO t2 VALUES (7)")}&database=http_db", "")
      assert(post(p, "/?database=http_db", "SELECT x FROM t2").body() === "7\n")
      assert(post(p, "/", "SELECT x FROM http_db.t2").body() === "7\n")
      post(p, s"/?query=${enc("DROP TABLE http_t")}&database=default", "")
    }
  }

  test("errors surface as HTTP 500 with CH's exception shape; unknown " +
    "paths 404; empty query 400") {
    withServer { (_, p) =>
      val r = get(p, s"/?query=${enc("SELECT * FROM no_such_table_xyz")}")
      assert(r.statusCode() === 500)
      assert(r.body().startsWith("Code: "), r.body())
      assert(r.headers().firstValue("X-ClickHouse-Exception-Code").isPresent)
      assert(get(p, "/nope").statusCode() === 404)
      assert(post(p, "/", "").statusCode() === 400)
    }
  }

  test("gzip both ways: enable_http_compression=1 + Accept-Encoding " +
    "compresses the response; a gzip Content-Encoding INSERT body decodes") {
    withServer { (_, p) =>
      val req = HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$p/?query=${enc("SELECT 7 AS x")}" +
          "&enable_http_compression=1"))
        .header("Accept-Encoding", "gzip").GET().build()
      val r = client.send(req, BodyHandlers.ofByteArray())
      assert(r.headers().firstValue("Content-Encoding").orElse("") === "gzip")
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(r.body()))
      assert(new String(gz.readAllBytes(), "UTF-8") === "7\n")
      // gzip'd INSERT payload
      post(p, s"/?query=${enc("DROP TABLE IF EXISTS http_gz")}", "")
      post(p, s"/?query=${enc("CREATE TABLE http_gz(a Int64)")}", "")
      val bos = new java.io.ByteArrayOutputStream()
      val go = new java.util.zip.GZIPOutputStream(bos)
      go.write("5\n6\n".getBytes("UTF-8")); go.close()
      val ins = HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$p/?query=${enc("INSERT INTO http_gz FORMAT CSV")}"))
        .header("Content-Encoding", "gzip")
        .POST(BodyPublishers.ofByteArray(bos.toByteArray)).build()
      assert(client.send(ins, BodyHandlers.ofString()).statusCode() === 200)
      assert(post(p, "/", "SELECT CAST(sum(a) AS BIGINT) AS s FROM http_gz")
        .body() === "11\n")
      post(p, s"/?query=${enc("DROP TABLE http_gz")}", "")
    }
  }

  test("INSERT ... FORMAT Values payload in the body (the full VALUES " +
    "literal machinery applies: strings, NULLs, epoch dates)") {
    withServer { (_, p) =>
      post(p, s"/?query=${enc("DROP TABLE IF EXISTS http_vals")}", "")
      post(p, s"/?query=${enc(
        "CREATE TABLE http_vals(a Int64, s Nullable(String), d Date)")}", "")
      val ins = post(p, s"/?query=${enc(
        "INSERT INTO http_vals FORMAT Values")}",
        "(1, 'x', '2024-01-05'), (2, NULL, 19000)")
      assert(ins.statusCode() === 200, ins.body())
      assert(post(p, "/", "SELECT a, s, CAST(d AS STRING) AS d " +
        "FROM http_vals ORDER BY a").body() ===
        "1\tx\t2024-01-05\n2\t\\N\t2022-01-08\n")
      post(p, s"/?query=${enc("DROP TABLE http_vals")}", "")
    }
  }

  test("session_id isolates HTTP sessions: USE sticks per session and " +
    "does not leak to other sessions or sessionless requests") {
    withServer { (_, p) =>
      post(p, s"/?query=${enc("CREATE DATABASE IF NOT EXISTS http_s1")}", "")
      post(p, s"/?query=${enc("DROP TABLE IF EXISTS http_s1.st")}", "")
      post(p, s"/?query=${enc("CREATE TABLE http_s1.st(a Int64)")}", "")
      post(p, s"/?query=${enc("INSERT INTO http_s1.st VALUES (9)")}", "")
      // session A switches database; the unqualified name then resolves
      assert(post(p, "/?session_id=A", "USE http_s1").statusCode() === 200)
      assert(post(p, "/?session_id=A", "SELECT a FROM st").body() === "9\n")
      // session B and the sessionless path still resolve against default
      val b = post(p, "/?session_id=B", "SELECT a FROM st")
      assert(b.statusCode() === 500, b.body())
      val none = post(p, "/", "SELECT a FROM st")
      assert(none.statusCode() === 500, none.body())
      post(p, s"/?query=${enc("DROP TABLE http_s1.st")}", "")
    }
  }

  test("FORMAT Pretty draws the box table; system.functions lists the " +
    "registered surface; 8 concurrent requests answer correctly") {
    withServer { (_, p) =>
      val pretty = get(p, s"/?query=${enc(
        "SELECT 1 AS a, 'xy' AS b FORMAT Pretty")}").body()
      assert(pretty.contains("┌") && pretty.contains("│ xy │"), pretty)
      assert(pretty.contains("1 rows in set."), pretty)
      val fns = post(p, "/", "SELECT count(*) AS n FROM system.functions " +
        "WHERE is_ch_pack = 1 AND name IN ('toyyyymm', 'tostartofweek', " +
        "'todatetime64')").body().trim
      assert(fns.toLong === 3L, s"CH pack functions missing: $fns")
      // concurrency: the statement lock serializes execution, every
      // response must still be the right one for ITS query
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(Future.sequence((1 to 8).toVector.map(i =>
        Future(post(p, "/", s"SELECT $i * 100 AS v").body().trim))), 60.seconds)
      assert(results === (1 to 8).map(i => (i * 100).toString).toVector)
    }
  }

  test("INDEPENDENT python-stdlib HTTP probe round-trips") {
    withServer { (_, p) =>
      val cmd = Seq("python3", "scripts/ch_http_probe.py", p.toString)
      val proc = new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true).start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      assert(proc.waitFor() === 0, s"probe failed:\n$out")
      assert(out.contains("HTTP_PROBE_OK"), out)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession
import graft.server.{ChNativeClient, ChWireServer}

/** remote() federation over the ClickHouse-NATIVE protocol, end-to-end
  * against our own wire server — the reference's actual transport
  * (crates/runtime/src/read.rs:151-228 remote_query over pooled CH
  * clients; mgmt.rs:744-770 remote insert). The remote link runs with
  * LZ4+CityHash compression on, like the reference's pools
  * (read.rs:75 with_compression).
  */
class ChRemoteSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("remote('ch://...') federated read, typed, with local predicates") {
    val server = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      g.sql("DROP TABLE IF EXISTS rmt_src")
      g.sql("CREATE TABLE rmt_src(k Int32, v String, d Date, u UInt64)")
      g.sql("""INSERT INTO rmt_src VALUES
        (1, 'one', '2024-01-01', 10),
        (2, 'two', '2024-02-01', 18446744073709551615),
        (3, 'three', '2024-03-01', 30)""")

      val url = s"ch://127.0.0.1:${server.boundPort}"
      val got = g.sql(
        s"SELECT k, v, d, u FROM remote('$url', 'rmt_src') WHERE k >= 2 ORDER BY k")
        .collect()
      assert(got.length === 2)
      assert(got(0).getInt(0) === 2)
      assert(got(0).getString(1) === "two")
      assert(got(0).getDate(2) === java.sql.Date.valueOf("2024-02-01"))
      // UInt64 full range survives the native wire round-trip
      assert(got(0).getDecimal(3) ===
        new java.math.BigDecimal("18446744073709551615"))
      assert(got(1).getInt(0) === 3)

      // empty remote result still has a schema (leading header block)
      val none = g.sql(
        s"SELECT k FROM remote('$url', 'rmt_src') WHERE k > 99")
      assert(none.columns.toSeq === Seq("k"))
      assert(none.count() === 0)
      g.sql("DROP TABLE rmt_src")
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }

  test("column pruning and filters push down to the remote server") {
    val server = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      g.sql("DROP TABLE IF EXISTS rmt_push")
      g.sql("CREATE TABLE rmt_push(k Int32, v String, d Date)")
      g.sql("""INSERT INTO rmt_push VALUES
        (1, 'aa', '2024-01-01'), (2, 'ab', '2024-02-01'),
        (3, 'bb', '2024-03-01'), (4, 'bc', '2024-04-01')""")
      val url = s"ch://127.0.0.1:${server.boundPort}"

      val df = spark.read.format("chnative")
        .option("url", url).option("table", "rmt_push").load()
        .filter("k >= 2 AND v LIKE 'a%' AND d < DATE'2024-03-01'")
        .select("k", "v")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the scan node carries the translated remote WHERE (description());
      // every predicate pushed — no local FilterExec remains in the plan
      assert(plan.contains("chnative rmt_push where"))
      assert(plan.contains("`k` >= 2"))
      assert(plan.contains("`v` LIKE 'a%'"))
      assert(plan.contains("`d` < DATE'2024-03-01'"))
      assert(!plan.contains("(3) Filter"), "expected no residual local filter")
      // column pruning: only k, v on the wire
      assert(plan.contains("Output [2]"))
      assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((2, "ab")))

      // untranslatable predicates stay local, results still correct
      val residual = spark.read.format("chnative")
        .option("url", url).option("table", "rmt_push").load()
        .filter("length(v) = 2 AND k <= 3")
      assert(residual.count() === 3)
      g.sql("DROP TABLE rmt_push")
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }

  test("multi-address fan-out unions shards, one task per address") {
    val s1 = new ChWireServer(spark).start()
    val s2 = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      g.sql("DROP TABLE IF EXISTS rmt_shard")
      g.sql("CREATE TABLE rmt_shard(k Int32)")
      g.sql("INSERT INTO rmt_shard VALUES (1), (2)")
      // both "shards" serve the same table here; the union semantics (each
      // address contributes its rows, read.rs:180-208) mean every row
      // arrives once per address
      val url = s"ch://127.0.0.1:${s1.boundPort},127.0.0.1:${s2.boundPort}"
      val df = g.sql(s"SELECT k FROM remote('$url', 'rmt_shard')")
      assert(df.rdd.getNumPartitions === 2) // one scan task per shard
      assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 1, 2, 2))
      g.sql("DROP TABLE rmt_shard")
    } finally {
      ChNativeClient.clearPool()
      s1.stop(); s2.stop()
    }
  }

  test("INSERT INTO FUNCTION remote('ch://...') VALUES and SELECT forms") {
    val server = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      g.sql("DROP TABLE IF EXISTS rmt_sink")
      g.sql("CREATE TABLE rmt_sink(k Int32, v String)")
      val url = s"ch://127.0.0.1:${server.boundPort}"

      g.sql(s"INSERT INTO FUNCTION remote('$url', 'rmt_sink') VALUES (1, 'a'), (2, 'b')")
      g.sql("DROP TABLE IF EXISTS rmt_local")
      g.sql("CREATE TABLE rmt_local(k Int32, v String)")
      g.sql("INSERT INTO rmt_local VALUES (3, 'c')")
      g.sql(s"INSERT INTO FUNCTION remote('$url', 'rmt_sink') SELECT k, v FROM rmt_local")

      val got = g.sql("SELECT k, v FROM rmt_sink ORDER BY k").collect()
      assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ===
        Seq((1, "a"), (2, "b"), (3, "c")))
      g.sql("DROP TABLE rmt_sink")
      g.sql("DROP TABLE rmt_local")
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }

  test("connection pool reuses healthy connections, discards broken ones") {
    val server = new ChWireServer(spark).start()
    try {
      val port = server.boundPort
      var first: ChNativeClient = null
      ChNativeClient.withClient("127.0.0.1", port) { c => first = c; c.ping() }
      // healthy connection comes back out of the pool
      ChNativeClient.withClient("127.0.0.1", port) { c =>
        assert(c eq first)
        c.query("SELECT 1 AS x")
      }
      // a client abandoned mid-stream is broken: not returned to the pool
      ChNativeClient.withClient("127.0.0.1", port) { c =>
        assert(c eq first)
        val it = c.queryBlocks("SELECT id FROM range(100000)")
        assert(it.hasNext) // consume only the header — stream left dangling
      }
      ChNativeClient.withClient("127.0.0.1", port) { c => assert(c ne first) }
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }

  test("rich types federate: Enum/Map/Tuple/LowCardinality columns survive " +
    "the remote('ch://...') round-trip (r18 wire codecs end-to-end)") {
    val server = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      g.sql("DROP TABLE IF EXISTS rmt_rich")
      g.sql("CREATE TABLE rmt_rich(k Int64, " +
        "st Enum8('low' = 1, 'high' = 2), tags Map(String, Int64), " +
        "pos Tuple(x Int64, y String), lc LowCardinality(String))")
      g.sql("INSERT INTO rmt_rich SELECT 1, 'high', " +
        "map('a', CAST(10 AS BIGINT)), " +
        "named_struct('x', CAST(7 AS BIGINT), 'y', 'p1'), 'aa' " +
        "UNION ALL SELECT 2, 'low', map('b', CAST(5 AS BIGINT)), " +
        "named_struct('x', CAST(-3 AS BIGINT), 'y', 'p2'), 'aa'")

      val url = s"ch://127.0.0.1:${server.boundPort}"
      val got = g.sql(s"SELECT k, st, tags, pos, lc FROM " +
        s"remote('$url', 'rmt_rich') ORDER BY k").collect()
      assert(got.length === 2)
      // enum arrives as its NAME (decoded through the wire entry table)
      assert(got.map(_.getString(1)).toSeq === Seq("high", "low"))
      assert(got(0).getMap[String, Long](2) === Map("a" -> 10L))
      val pos = got(1).getStruct(3)
      assert((pos.getLong(0), pos.getString(1)) === (-3L, "p2"))
      assert(got.map(_.getString(4)).toSeq === Seq("aa", "aa"))
      g.sql("DROP TABLE rmt_rich")
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }

  test("rich types federate on the WRITE side: INSERT INTO FUNCTION " +
    "remote() ships Enum/Map/Tuple/LowCardinality out, and the data reads " +
    "back identically through remote() (VERDICT r18 task #3)") {
    val server = new ChWireServer(spark).start()
    val g = new GraftSession(spark)
    try {
      val ddl = "(k Int64, st Enum8('low' = 1, 'high' = 2), " +
        "tags Map(String, Int64), pos Tuple(x Int64, y String), " +
        "lc LowCardinality(String))"
      g.sql("DROP TABLE IF EXISTS rmt_richw_sink; " +
        "DROP TABLE IF EXISTS rmt_richw_src")
      g.sql(s"CREATE TABLE rmt_richw_sink$ddl")
      g.sql(s"CREATE TABLE rmt_richw_src$ddl")
      g.sql("INSERT INTO rmt_richw_src SELECT 1, 'high', " +
        "map('a', CAST(10 AS BIGINT)), " +
        "named_struct('x', CAST(7 AS BIGINT), 'y', 'p1'), 'aa' " +
        "UNION ALL SELECT 2, 'low', map('b', CAST(5 AS BIGINT)), " +
        "named_struct('x', CAST(-3 AS BIGINT), 'y', 'p2'), 'bb'")

      val url = s"ch://127.0.0.1:${server.boundPort}"
      // the write crosses the wire: Enum ships as base ints with entry
      // metadata (the header advertises the declared type and the client
      // honors it), Map/Tuple/LC with their native framings
      g.sql(s"INSERT INTO FUNCTION remote('$url', 'rmt_richw_sink') " +
        "SELECT k, st, tags, pos, lc FROM rmt_richw_src")
      // and a literal-SELECT write through the same path
      g.sql(s"INSERT INTO FUNCTION remote('$url', 'rmt_richw_sink') " +
        "SELECT 3, 'high', map('c', CAST(1 AS BIGINT)), " +
        "named_struct('x', CAST(9 AS BIGINT), 'y', 'p3'), 'aa'")

      val got = g.sql(s"SELECT k, st, tags, pos, lc FROM " +
        s"remote('$url', 'rmt_richw_sink') ORDER BY k").collect()
      assert(got.length === 3)
      assert(got.map(_.getString(1)).toSeq === Seq("high", "low", "high"))
      assert(got(0).getMap[String, Long](2) === Map("a" -> 10L))
      assert(got(2).getMap[String, Long](2) === Map("c" -> 1L))
      val pos = got(1).getStruct(3)
      assert((pos.getLong(0), pos.getString(1)) === (-3L, "p2"))
      assert(got.map(_.getString(4)).toSeq === Seq("aa", "bb", "aa"))
      // a value outside the Enum's declared entries fails the WRITE
      // loudly (the encoder validates against the entry table)
      val e = intercept[Exception] {
        g.sql(s"INSERT INTO FUNCTION remote('$url', 'rmt_richw_sink') " +
          "SELECT 4, 'bogus', map('d', CAST(1 AS BIGINT)), " +
          "named_struct('x', CAST(0 AS BIGINT), 'y', 'p4'), 'cc'")
      }
      assert(e.getMessage != null)
      assert(g.sql("SELECT count() AS n FROM rmt_richw_sink " +
        "WHERE st = 'bogus'").collect()(0).get(0).toString === "0")
      g.sql("DROP TABLE rmt_richw_sink; DROP TABLE rmt_richw_src")
    } finally {
      ChNativeClient.clearPool()
      server.stop()
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.GraftSession

/** SHOW PROCESSLIST / system.processes / KILL QUERY: every statement
  * runs under a job group named by its query id; a SELECT stays listed
  * while its lazy result is being consumed (same thread, same group), so
  * KILL QUERY from another session thread cancels it mid-flight —
  * including mid-stream over the wire.
  */
class ProcesslistSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val g = new GraftSession(spark)

  test("SHOW PROCESSLIST lists the running statement; system.processes " +
    "and system.databases splice as temp views") {
    val rows = g.sql("SHOW PROCESSLIST").collect()
    assert(rows.exists(_.getString(1).toUpperCase.contains("SHOW PROCESSLIST")))
    val viaSystem = g.sql("SELECT query_id, query FROM system.processes")
      .collect()
    assert(viaSystem.nonEmpty)
    val dbs = g.sql("SELECT name FROM system.databases ORDER BY name")
      .collect().map(_.getString(0)).toSeq
    assert(dbs.contains("default") && dbs.contains("system"))
  }

  test("a SELECT stays listed after sql() returns (its jobs run at " +
    "consumption) and retires at the thread's next statement") {
    g.sql("DROP TABLE IF EXISTS pl_t")
    g.sql("CREATE TABLE pl_t(k Int64)")
    g.sql("INSERT INTO pl_t VALUES (1), (2)")
    val df = g.sql("SELECT k FROM pl_t WHERE k > 0")
    import scala.jdk.CollectionConverters._
    def listed: Boolean = g.sql("SELECT query FROM system.processes")
      .collect().exists(_.getString(0).contains("pl_t WHERE k > 0"))
    assert(df.count() === 2L)
    // the next statement on this thread retires the SELECT — the system
    // splice above re-registers views but the entry belongs to the NEW
    // statement afterwards
    g.sql("SELECT 1 AS one").collect()
    assert(!listed)
    g.sql("DROP TABLE pl_t")
  }

  test("KILL QUERY cancels a long SELECT from another thread (job-group " +
    "cancellation reaches the running collect)") {
    spark.udf.register("graft_slow_probe",
      (x: Long) => { Thread.sleep(4); x })
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fut = Future {
      // sql() + collect() on ONE thread: the collect's jobs inherit the
      // statement's job group
      g.sql("SELECT max(graft_slow_probe(number)) AS m FROM numbers(200000)")
        .collect()
    }
    // wait for the entry to appear AND its first job to be submitted —
    // cancelJobGroup is one-shot over running jobs, so killing before
    // execution starts would be a no-op (CH's KILL on a pending query
    // has the same pending-until-running semantics)
    var qid: Option[String] = None
    val deadline = System.currentTimeMillis + 30000
    while (System.currentTimeMillis < deadline && (qid.isEmpty ||
        spark.sparkContext.statusTracker.getJobIdsForGroup(qid.get).isEmpty)) {
      import scala.jdk.CollectionConverters._
      qid = graft.exec.GraftSession.processes.values.asScala
        .find(_.query.contains("graft_slow_probe")).map(_.qid)
      Thread.sleep(50)
    }
    assert(qid.nonEmpty, "the slow SELECT never appeared in the processlist")
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(qid.get).nonEmpty,
      "the slow SELECT never submitted a job")
    val killed = g.sql(s"KILL QUERY WHERE query_id = '${qid.get}'")
      .collect()(0)
    assert(killed.getInt(1) === 1)
    val err = intercept[Exception] { Await.result(fut, 60.seconds) }
    val chain = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.toLowerCase.contains("cancel"))
    // and it is no longer listed
    import scala.jdk.CollectionConverters._
    assert(!graft.exec.GraftSession.processes.values.asScala
      .exists(_.qid == qid.get))
  }

  test("KILL QUERY on an unknown id reports killed=0") {
    val r = g.sql("KILL QUERY WHERE query_id = 'zzzzzzzz'").collect()(0)
    assert(r.getString(0) === "zzzzzzzz" && r.getInt(1) === 0)
  }
}

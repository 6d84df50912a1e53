package graft

import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
import org.scalatest.funsuite.AnyFunSuite

/** The layout-conditional spread contract (VERDICT r6 #1): the round-robin
  * exchange the l-queries and multimodal operators place before their map
  * work must be decided by the INPUT LAYOUT, not baked into the query text
  * — an unconditional REPARTITION hint is a full-corpus shuffle at 100 TB.
  * Decision order: conf `graft.spread` > env `GRAFT_SPREAD` > row-group
  * probe at registerAll.
  */
class SpreadDecisionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withSpread[A](mode: String)(body: => A): A = {
    spark.conf.set("graft.spread", mode)
    try body finally spark.conf.unset("graft.spread")
  }

  private def repartitions(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sf)
    val n = df.queryExecution.optimizedPlan.collect {
      case r: RepartitionOperation => r
    }.size
    queries.LlmQueries.releaseShared()
    n
  }

  test("fixture documents.parquet probes as clumped (single row group)") {
    val rg = Tables.rowGroupCount(spark, s"$sf/documents.parquet")
    assert(rg >= 1)
    assert(rg < spark.sparkContext.defaultParallelism / 2,
      s"fixture unexpectedly well-split ($rg row groups) — probe coverage gone")
    Tables.registerAll(spark, sf)
    assert(Tables.spreadOn(spark), "probe should spread a clumped layout")
  }

  test("conf graft.spread=off removes the exchange from hinted plans") {
    val hinted = withSpread("on")(repartitions("l20_tfidf_terms"))
    val plain  = withSpread("off")(repartitions("l20_tfidf_terms"))
    assert(hinted >= 1, "spread=on should plan a Repartition")
    assert(plain == 0,
      "spread=off must leave NO round-robin repartition — this is the 100 TB plan")
  }

  test("spread=off keeps l20 result identical (both modes oracle-equivalent)") {
    val on  = withSpread("on")(
      SparkEntry.queries("l20_tfidf_terms")(spark, sf).collect().toSet)
    val off = withSpread("off")(
      SparkEntry.queries("l20_tfidf_terms")(spark, sf).collect().toSet)
    assert(on == off)
  }

  test("unprobed session: many-partition input gets NO exchange, a starved " +
    "one still spreads (VERDICT r7 wrong #2)") {
    // a fresh session never ran registerAll, so the row-group probe never
    // ran — the old default ON would hand this caller a full-corpus
    // round-robin; the fix reads the input's own planned parallelism
    val s2 = spark.newSession()
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.logical.collect { case r: RepartitionOperation => r }
    val cores = s2.sparkContext.defaultParallelism
    val wide = s2.range(0, 1000, 1, cores).toDF("doc_id")
    assert(exchanges(Tables.maybeSpread(wide)).isEmpty,
      "many-partition input on an unprobed session must NOT be round-robined")
    val narrow = s2.range(0, 10, 1, 1).toDF("doc_id")
    assert(exchanges(Tables.maybeSpread(narrow)).nonEmpty,
      "a one-partition input still starves the cores and should spread")
  }

  test("spread pins an explicit partition count AQE cannot coalesce away " +
    "(r19-opt: a bare REPARTITION folded back to 1 partition on small-byte " +
    "input, serializing the per-row codec work it exists to parallelize)") {
    val cores = spark.sparkContext.defaultParallelism
    Tables.registerAll(spark, sf)
    val hint = withSpread("on")(Tables.spreadHint(spark))
    assert(hint.contains(s"REPARTITION($cores)"),
      s"spreadHint must carry an explicit core-count width, got '$hint'")
    val df = withSpread("on")(Tables.maybeSpread(spark.range(10).toDF("doc_id")))
    // user-specified counts survive AQE; rdd materializes the final plan
    assert(df.rdd.getNumPartitions == cores,
      "maybeSpread's exchange must execute at core-count width under AQE")
  }

  test("maybeSpread follows the same decision") {
    val df = spark.range(10).toDF("doc_id")
    val on = withSpread("on")(Tables.maybeSpread(df))
    val off = withSpread("off")(Tables.maybeSpread(df))
    assert(on.queryExecution.logical.collect { case r: RepartitionOperation => r }.nonEmpty)
    assert(off.queryExecution.logical.collect { case r: RepartitionOperation => r }.isEmpty)
  }
}

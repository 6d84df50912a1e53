package graft

import org.scalatest.funsuite.AnyFunSuite

/** The l33b LSH auto-tuner's decision contract (VERDICT r10 task #6):
  * the sweep must produce a real recall curve over the panel, flag
  * exactly one winner, and the winner must be the CHEAPEST config
  * meeting the recall target (candidate count, then signature width,
  * then band count) — or max-recall if none reaches it. l02c must run
  * the corpus pass at exactly the chosen configuration, and the forced
  * `graft.lsh.config` arm must override the sweep.
  */
class LshAutoTuneSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val sweep: Seq[(Long, Long, Long, Long, Double, Double, Int)] = {
    Tables.registerAll(spark, sf)
    queries.LlmQueries.queries("l33b_lsh_autotune")(spark, sf)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))
  }

  test("exactly one config is chosen and the curve is real (recalls " +
    "differ across configs)") {
    assert(sweep.count(_._7 == 1) === 1)
    assert(sweep.map(_._5).distinct.size > 3,
      s"recall curve looks degenerate: $sweep")
  }

  test("the winner is the cheapest config meeting recall >= 0.9 " +
    "(by n_cand, then signature width, then bands)") {
    val chosen = sweep.find(_._7 == 1).get
    val meeting = sweep.filter(_._5 >= 0.9)
    assert(meeting.nonEmpty, "panel must have configs above the target")
    assert(chosen._5 >= 0.9)
    val best = meeting.minBy(c => (c._3, c._1 * c._2, c._1))
    assert((chosen._1, chosen._2) === (best._1, best._2),
      s"chosen $chosen is not the cheapest of $meeting")
  }

  test("lshAutoTuneChoice returns the sweep winner; graft.lsh.config " +
    "forces an arm") {
    val chosen = sweep.find(_._7 == 1).get
    val (b, r) = queries.LlmQueries.lshAutoTuneChoice(spark)
    assert((b.toLong, r.toLong) === (chosen._1, chosen._2))
    spark.conf.set("graft.lsh.config", "4x2")
    try assert(queries.LlmQueries.lshAutoTuneChoice(spark) === ((4, 2)))
    finally spark.conf.unset("graft.lsh.config")
  }

  test("l02c runs the corpus pass at the chosen config (its result " +
    "equals minhashLshSqlN at the winner's parameters)") {
    val chosen = sweep.find(_._7 == 1).get
    val got = queries.LlmQueries.queries("l02c_minhash_lsh_tuned")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val want = spark.sql(queries.LlmQueries.minhashLshSqlN(spark = true,
      nHashes = (chosen._1 * chosen._2).toInt, bandSize = chosen._2.toInt,
      cap = queries.LlmQueries.LshBucketCap))
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}

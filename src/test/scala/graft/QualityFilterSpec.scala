package graft

import org.scalatest.funsuite.AnyFunSuite

/** l44b (trained-classifier corpus filter) and l45 (Gopher-style rule
  * census) behavior contracts: the rule set must have real variance on
  * the corpus (no vacuous all-pass/all-fail rule), the classifier must
  * actually fit the l41 heuristic it was trained on, and the census
  * totals must be conserved.
  */
class QualityFilterSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  private lazy val gopher: Seq[(String, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    Tables.registerAll(spark, sf)
    queries.LlmQueries.queries("l45_gopher_rules")(spark, sf)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
  }

  private lazy val filter: Seq[(String, Long, Long, Long, Double)] = {
    Tables.registerAll(spark, sf)
    queries.LlmQueries.queries("l44b_quality_filter")(spark, sf)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
  }

  test("l45: census covers every document once and keep is conserved") {
    val rows = gopher // forces table registration before spark.table below
    val total = spark.table("documents")
      .where("size(split(text, ' ')) > 0").count()
    assert(rows.map(_._2).sum === total)
    gopher.foreach { row =>
      // each rule's pass count and the conjunction are bounded by n
      Seq(row._3, row._4, row._5, row._6, row._7).foreach(c =>
        assert(c >= 0 && c <= row._2, s"rule count out of range: $row"))
      assert(row._8 <= Seq(row._3, row._4, row._5, row._6, row._7).min,
        s"keep exceeds a single rule's pass count: $row")
    }
  }

  test("l45: no rule is vacuous corpus-wide (all-pass or all-fail)") {
    val n = gopher.map(_._2).sum
    val sums = Seq(gopher.map(_._3).sum, gopher.map(_._4).sum,
      gopher.map(_._5).sum, gopher.map(_._6).sum, gopher.map(_._7).sum)
    sums.zip(Seq("len", "mwl", "ttr", "rep", "sw")).foreach { case (s, k) =>
      assert(s > 0 && s < n, s"rule $k is vacuous: $s of $n pass")
    }
    val keep = gopher.map(_._8).sum
    assert(keep > 0 && keep < n, s"conjunction degenerate: $keep of $n")
  }

  test("l44b: the trained classifier beats the majority class on the " +
    "l41 heuristic it mimics, and scores are real probabilities") {
    val n = filter.map(_._2).sum
    val agree = filter.map(_._4).sum
    // 3 GD steps must have learned SOMETHING: agreement strictly above
    // the best constant predictor (majority class share of the label)
    val y1 = spark.sql(
      """SELECT CAST(sum(CASE WHEN nw >= 30 AND ndw * 10 >= 4 * nw
        |  THEN 1 ELSE 0 END) AS BIGINT)
        |FROM (SELECT size(split(text, ' ')) AS nw,
        |        size(array_distinct(split(text, ' '))) AS ndw
        |      FROM documents) d WHERE nw > 0""".stripMargin)
      .head().getLong(0)
    val majority = math.max(y1.toDouble / n, 1.0 - y1.toDouble / n)
    assert(agree.toDouble / n > majority,
      s"classifier agreement ${agree.toDouble / n} does not beat the " +
        s"majority-class baseline $majority")
    filter.foreach { row =>
      assert(row._3 >= 0 && row._3 <= row._2)
      assert(row._5 >= 0.0 && row._5 <= 1.0, s"avg_p out of [0,1]: $row")
    }
    // the filter must discriminate: somewhere keeps, somewhere drops
    assert(filter.map(_._3).sum > 0)
    assert(filter.map(_._3).sum < n)
  }
}

package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ChAggregates
import graft.functions.ChAggregates.TopK

/** The parametric-aggregate pack #2: SpaceSaving topK against its formal
  * guarantees and brute force in the exact regime, plus the registered
  * builder family (quantileExactInclusive / argMin / argMax / -If) against
  * independent SQL formulations on a constructed frame.
  */
class AggPackSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  /** Run SpaceSaving over a stream split into `cuts` partitions, merging
    * partials in the given order — the distributed execution shape.
    */
  private def run(agg: TopK, xs: Seq[String], cuts: Seq[Int]): Seq[(String, Long)] = {
    val parts = {
      val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
      bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    }
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  private val streamGen: Gen[(List[String], List[Int])] = for {
    domain <- Gen.choose(1, 12)
    n <- Gen.choose(0, 120)
    xs <- Gen.listOfN(n, Gen.choose(0, domain - 1).map(i => s"v$i"))
    nCuts <- Gen.choose(0, 4)
    cuts <- Gen.listOfN(nCuts, Gen.choose(0, math.max(n, 1)))
  } yield (xs, cuts)

  test("exact regime (domain <= capacity): equals exact top-k, any split") {
    // domain max 12 < capacity 16 -> no partial ever fills -> exact.
    check(Prop.forAll(streamGen) { case (xs, cuts) =>
      val agg = new TopK(3, 16)
      val got = run(agg, xs, cuts)
      val want = xs.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
        .toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
      got == want
    })
  }

  test("overflow regime: heavy hitters present, counts are bounded overestimates") {
    val gen = for {
      n <- Gen.choose(50, 200)
      xs <- Gen.listOfN(n, Gen.choose(0, 19).map(i => s"v$i"))
      nCuts <- Gen.choose(0, 3)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val cap = 8
      val agg = new TopK(cap, cap)
      val truth = xs.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
      val got = run(agg, xs, cuts)
      val gotMap = got.toMap
      // (1) any value with true count > N/cap is in the summary output
      //     (k == cap here so finish returns the whole summary);
      // (2) reported count >= true count (upper bound), and
      //     reported - true <= N (sanity: error never exceeds stream).
      val hh = truth.filter(_._2 > xs.length.toLong / cap)
      hh.forall { case (v, _) => gotMap.contains(v) } &&
        got.forall { case (v, c) =>
          c >= truth.getOrElse(v, 0L) && c - truth.getOrElse(v, 0L) <= xs.length
        }
    })
  }

  test("merge is order-insensitive in the exact regime") {
    check(Prop.forAll(streamGen) { case (xs, cuts) =>
      val agg = new TopK(3, 16)
      val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val fwd = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      val rev = agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge))
      fwd == rev
    })
  }

  test("registered builders match independent SQL formulations") {
    ChAggregates.register(spark)
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0, 100L), ("a", 2L, 20.0, 101L), ("a", 3L, 5.0, 102L),
      ("b", 4L, 7.5, 103L), ("b", 5L, 2.5, 104L), ("c", 6L, 9.0, 105L)
    ).toDF("k", "uid", "v", "seq")
    df.createOrReplaceTempView("agg_pack_t")

    val got = spark.sql(
      """SELECT k,
        |  quantilesExactInclusive(v, 0.25d, 0.5d, 0.75d) AS qs,
        |  quantileExactInclusive(v, 0.5d) AS med,
        |  medianExact(v) AS med2,
        |  argMax(uid, struct(v, seq)) AS amax,
        |  argMin(uid, struct(v, seq)) AS amin,
        |  countIf(v > 6) AS nbig,
        |  sumIf(v, v > 6) AS sbig,
        |  avgIf(uid, v > 6) AS abig,
        |  maxIf(v, v > 6) AS mxbig,
        |  minIf(v, v > 6) AS mnbig
        |FROM agg_pack_t GROUP BY k ORDER BY k""".stripMargin).collect()

    val want = spark.sql(
      """SELECT k,
        |  percentile(v, array(0.25d, 0.5d, 0.75d)) AS qs,
        |  percentile(v, 0.5d) AS med,
        |  percentile(v, 0.5d) AS med2,
        |  max_by(uid, struct(v, seq)) AS amax,
        |  min_by(uid, struct(v, seq)) AS amin,
        |  count(CASE WHEN v > 6 THEN 1 END) AS nbig,
        |  sum(CASE WHEN v > 6 THEN v END) AS sbig,
        |  avg(CASE WHEN v > 6 THEN uid END) AS abig,
        |  max(CASE WHEN v > 6 THEN v END) AS mxbig,
        |  min(CASE WHEN v > 6 THEN v END) AS mnbig
        |FROM agg_pack_t GROUP BY k ORDER BY k""".stripMargin).collect()

    assert(got.toSeq == want.toSeq)
  }

  test("quantileTDigest family: exact on small inputs, bounded on large") {
    ChAggregates.register(spark)
    // n far below the GK accuracy (10000): the sketch holds every value,
    // so the approximate answer IS a real element at the exact rank
    val small = spark.sql(
      """SELECT quantileTDigest(x, 0.5d) AS q50,
        |  quantile(x, 0.9d) AS q90,
        |  quantilesTDigest(x, 0.5d, 0.9d) AS qs
        |FROM (SELECT explode(sequence(1, 101)) AS x)""".stripMargin).head()
    assert(small.getInt(0) === 51)
    assert(small.getInt(1) === 91)
    assert(small.getSeq[Int](2) === Seq(51, 91))
    // large input: rank error ≤ n/10000 → ±1%-rank bound holds trivially
    val big = spark.sql(
      """SELECT CAST(quantileTDigest(x, 0.5d)
        |  BETWEEN percentile(x, 0.49d) AND percentile(x, 0.51d) AS INT) AS ok
        |FROM (SELECT explode(sequence(1, 100000)) AS x)""".stripMargin).head()
    assert(big.getInt(0) === 1)
  }

  test("topKWeighted: exact-regime equals weighted ranking, any split") {
    import graft.functions.ChAggregates.TopKWeighted
    val agg = new TopKWeighted(2, 4)
    val data = Seq("a" -> 5L, "b" -> 1L, "a" -> 2L, "c" -> 4L, "b" -> 1L)
    // exact regime (3 distinct < 4 capacity): top-2 by weight, ties by value
    def run(split: Int): Seq[(String, Long)] = {
      val (l, r) = data.splitAt(split)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(bl, br))
    }
    (0 to data.length).foreach { s =>
      assert(run(s) === Seq("a" -> 7L, "c" -> 4L), s"split $s")
    }
    // overflow regime: heavy hitter survives, counts are overestimates
    val heavy = (1 to 50).map(i => s"x$i" -> 1L) ++ Seq.fill(30)("hot" -> 3L)
    val b = heavy.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(b)
    assert(out.exists(_._1 == "hot"))
    assert(out.find(_._1 == "hot").get._2 >= 90L)
  }

  test("stats pack names equal Spark natives; kurtPop is non-excess") {
    ChAggregates.register(spark)
    import spark.implicits._
    Seq(1.0 -> 3L, 4.0 -> 5L, 9.0 -> 6L, 2.5 -> 12L, 7.75 -> 9L)
      .toDF("v", "u").createOrReplaceTempView("stats_pack_t")
    val got = spark.sql(
      """SELECT varPop(v), stddevPop(v), varSamp(v), stddevSamp(v),
        |  covarPop(v, CAST(u AS DOUBLE)), covarSamp(v, CAST(u AS DOUBLE)),
        |  skewPop(v), kurtPop(v),
        |  groupBitAnd(u), groupBitOr(u), groupBitXor(u), uniqExact(u)
        |FROM stats_pack_t""".stripMargin).head()
    val want = spark.sql(
      """SELECT var_pop(v), stddev_pop(v), var_samp(v), stddev_samp(v),
        |  covar_pop(v, CAST(u AS DOUBLE)), covar_samp(v, CAST(u AS DOUBLE)),
        |  skewness(v), kurtosis(v) + 3.0d,
        |  bit_and(u), bit_or(u), bit_xor(u), count(DISTINCT u)
        |FROM stats_pack_t""".stripMargin).head()
    assert(got === want)
    // uniq (HLL++) is exact at tiny cardinality
    assert(spark.sql("SELECT uniq(u) FROM stats_pack_t").head().getLong(0) === 5L)
  }

  test("avgWeighted and sumCount match explicit formulations") {
    ChAggregates.register(spark)
    import spark.implicits._
    Seq((1.0, 2L), (4.0, 1L), (10.0, 3L)).toDF("x", "w")
      .createOrReplaceTempView("aw_t")
    val got = spark.sql(
      "SELECT avgWeighted(x, w), sumCount(x) FROM aw_t").head()
    assert(got.getDouble(0) === (1.0 * 2 + 4.0 * 1 + 10.0 * 3) / 6.0)
    val sc = got.getStruct(1)
    assert(sc.getDouble(0) === 15.0)
    assert(sc.getLong(1) === 3L)
  }

  test("groupArray family matches collect_list/collect_set/first/last") {
    ChAggregates.register(spark)
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 5L))
      .toDF("k", "v").coalesce(1).createOrReplaceTempView("agg_pack_ga")
    val r = spark.sql(
      """SELECT k, sort_array(groupArray(v)) AS ga,
        |  sort_array(groupUniqArray(v)) AS gu,
        |  any(v) AS a1, anyLast(v) AS a2
        |FROM agg_pack_ga GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r.map(_.getSeq[Long](1).toList).toSeq === Seq(List(1L, 2L, 2L), List(5L)))
    assert(r.map(_.getSeq[Long](2).toList).toSeq === Seq(List(1L, 2L), List(5L)))
    // single partition -> first/last are the literal insertion order
    assert(r.map(x => (x.getLong(3), x.getLong(4))).toSeq === Seq((1L, 2L), (5L, 5L)))
  }

  test("-If combinators stay in hash aggregation (no UDF boundary)") {
    ChAggregates.register(spark)
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    df.createOrReplaceTempView("agg_pack_plan_t")
    val plan = spark.sql(
      "SELECT k, sumIf(v, v > 1), countIf(v > 1) FROM agg_pack_plan_t GROUP BY k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("ScalaAggregator"), plan)
  }

  test("topK SQL shape: bounded state, deterministic ranks at sf0.001") {
    val df = SparkEntry.queries("b05_topk")(spark, SparkTestSession.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ranks are 0..2 and counts non-increasing within each day
    val byDay = rows.groupBy(_.getDate(0))
    byDay.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices.toSeq)
      val cnts = sorted.map(_.getLong(3)).toSeq
      assert(cnts == cnts.sorted.reverse)
    }
  }
}
